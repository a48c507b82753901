package graft.kg

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Full KG-construction DAG (BASELINE.json:6; SURVEY §3.2):
  *
  *   corpus → sha256 invariant → [resume anti-join vs manifest]
  *     → fused mention-scan + pair-gen + classify (narrow, broadcast dict)
  *     → canonicalize (LSH + connected components + broadcast link joins)
  *     → distinct triples → salted repartition → partitioned write
  *     → per-bucket lineage manifest
  *
  * Scale posture: the only shuffles are (1) triple dedup, (2) the salted
  * repartition feeding the partitioned write, (3) the tiny dictionary-side
  * CC loop. The 100KB `content` column never crosses a shuffle — it dies
  * inside the narrow flatMap (SURVEY §7.4(4)).
  */
final case class KgConfig(
    triplesDir: String,
    manifestDir: String,
    runId: String,
    nBuckets: Int = 16,
    writeSalt: Int = 8)

final case class KgResult(triplesWritten: Long, bucketsCommitted: Int, wallMs: Long)

object KgPipeline {

  def dictDataset(spark: SparkSession): Dataset[DictEntry] = {
    import spark.implicits._
    graft.fixtures.Vocab.dictRows
      .map { case (n, id, c, k) => DictEntry(n, id, c, k) }.toDS()
  }

  /** Run (or resume) the pipeline. `onlyBuckets` restricts processing to a
    * bucket subset — used by tests to simulate a crash mid-run.
    * Returns the number of triples written this invocation.
    */
  def run(spark: SparkSession, corpus: DataFrame, dict: Dataset[DictEntry],
          cfg: KgConfig, onlyBuckets: Option[Set[Int]] = None): KgResult = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")

    val hashed = TableIO.withInvariants(corpus, cfg.nBuckets)

    // resume: skip committed buckets (SURVEY S5/J4)
    val done = Manifest.committedBuckets(spark, cfg.manifestDir, cfg.runId, "triples")
    val doneSet = done.collect().map(_.getInt(0)).toSet
    val allTodo = (0 until cfg.nBuckets).filterNot(doneSet).toSet
    val todoBuckets = onlyBuckets.map(_ intersect allTodo).getOrElse(allTodo)
    if (todoBuckets.isEmpty)
      return KgResult(0L, doneSet.size, System.currentTimeMillis() - t0)

    val todo = hashed
      .filter(col("bucket").isin(todoBuckets.toSeq: _*))
      .select("repo", "path", "commit", "lang", "content", "file_sha")
      .as[HashedFile]

    // stages 1–4 fused per file: mention scan + pair-gen + classify +
    // broadcast-map canonicalization in ONE narrow flatMap; the global
    // triple dedup is the only corpus-proportional shuffle before write
    val fnAliases = Extract.broadcastFnAliases(spark, dict)
    val canonB = Canonicalize.broadcastLinkMap(spark, dict)
    val triples = Extract.canonicalTriples(todo, fnAliases, canonB).toDF()
      .withColumn("bucket",
        pmod(xxhash64(col("fileSha")), lit(cfg.nBuckets)).cast("int"))

    // partitioned-write hygiene (SURVEY §4.4(4)): repartition on the
    // partition columns + salt so hot preds don't serialize one task
    val out = triples.repartition(
      col("bucket"), col("pred"),
      pmod(xxhash64(col("fileSha")), lit(cfg.writeSalt)))
    out.write.mode("overwrite").partitionBy("bucket", "pred")
      .parquet(cfg.triplesDir)

    // lineage from what actually landed on disk (SURVEY A7/S5)
    val written = spark.read.parquet(cfg.triplesDir)
      .filter(col("bucket").isin(todoBuckets.toSeq: _*))
    val stats = Manifest.bucketStats(written)
    val allTodoDf = todoBuckets.toSeq.sorted.toDF("bucket")
    val fullStats = allTodoDf.join(stats, Seq("bucket"), "left")
      .na.fill(0L, Seq("rowCount", "contentDigest"))
    val nWritten = fullStats.agg(sum("rowCount")).first().getLong(0)
    Manifest.write(spark, cfg.manifestDir, cfg.runId, "triples",
      fullStats, attempt = 1, startedAtMs = t0,
      wallMs = System.currentTimeMillis() - t0)
    KgResult(nWritten, doneSet.size + todoBuckets.size,
      System.currentTimeMillis() - t0)
  }
}
