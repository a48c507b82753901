package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.kg._

/** One-off scaling probe over the SAME fused DAG Bench times
  * (Extract.canonicalTriples). Usage:
  *   runMain graft.tools.ScalingProbe <nfiles> <cores[:shufflePartitions],...> [runs]
  * cores[:shufflePartitions[:maxPartMB]] — e.g. 8:8:16 reads with
  * 16 MB scan splits. Optional 4th arg: corpus dir override (e.g. the
  * skew-clustered corpus).
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val n = args(0).toInt
    val configs = args(1).split(",").map { spec =>
      spec.split(":") match {
        case Array(c) => (c.toInt, c.toInt, 128)
        case Array(c, p) => (c.toInt, p.toInt, 128)
        case Array(c, p, m) => (c.toInt, p.toInt, m.toInt)
      }
    }
    val runs = if (args.length > 2) args(2).toInt else 2
    val corpusDir = if (args.length > 3) args(3) else s"/tmp/graft_bench_corpus_$n"

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

    for ((c, p, m) <- configs) {
      val s = SparkSession.builder().master(s"local[$c]")
        .config("spark.sql.shuffle.partitions", p.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", (m * 1024L * 1024L).toString)
        .config("spark.ui.enabled", "false").getOrCreate()
      import s.implicits._
      s.sparkContext.setLogLevel("WARN")
      val dict = KgPipeline.dictDataset(s)
      val fnAliases = Extract.broadcastFnAliases(s, dict)
      val canon = Canonicalize.broadcastLinkMap(s, dict)
      var cnt = 0L
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val hashed = s.read.parquet(corpusDir)
          .withColumn("file_sha", sha2(col("content"), 256))
          .select("repo", "path", "commit", "lang", "content", "file_sha")
          .as[HashedFile]
        cnt = Extract.canonicalTriples(hashed, fnAliases, canon).count()
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      println(f"[probe] cores=$c shuffle=$p maxPart=${m}MB triples=$cnt best=$best%.2fs " +
        f"thr=${cnt / best}%.0f/s all=${times.map(t => f"$t%.2f").mkString(",")}")
      s.stop()
    }
  }
}
