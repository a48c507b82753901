package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.kg._

/** One-off scaling probe: KG pipeline throughput at two core counts.
  * Usage: runMain graft.tools.ScalingProbe <nfiles> <cores1,cores2,...>
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val coreSets = args(1).split(",").map(_.toInt)
    val corpusDir = s"/tmp/graft_bench_corpus_$n"

    // materialize the deterministic corpus once (generation excluded)
    if (!new java.io.File(corpusDir).exists()) {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate()
      import s.implicits._
      s.range(n).repartition(64)
        .mapPartitions(_.map(i => graft.fixtures.CorpusGen.genFile(i.toInt, n)))
        .toDF().write.mode("overwrite").parquet(corpusDir)
      s.stop()
    }

    for (c <- coreSets) {
      val s = SparkSession.builder().master(s"local[$c]")
        .config("spark.sql.shuffle.partitions", c.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      import s.implicits._
      s.sparkContext.setLogLevel("WARN")
      val dict = KgPipeline.dictDataset(s)
      val fnAliases = Extract.broadcastFnAliases(s, dict)
      val links = s.createDataset(Canonicalize.linkMap(dict).collect().toSeq)
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        val hashed = s.read.parquet(corpusDir)
          .withColumn("file_sha", sha2(col("content"), 256))
          .select("repo", "path", "commit", "lang", "content", "file_sha")
          .as[HashedFile]
        val rels = Extract.scoredRelations(hashed, fnAliases)
        val cnt = Canonicalize.toTriples(rels, links).count()
        val dt = (System.nanoTime() - t0) / 1e9
        (cnt, dt)
      }
      val best = times.map(_._2).min
      println(f"[probe] cores=$c triples=${times.head._1} best=${best}%.2fs thr=${times.head._1 / best}%.0f/s all=${times.map(t => f"${t._2}%.2f").mkString(",")}")
      s.stop()
    }
  }
}
