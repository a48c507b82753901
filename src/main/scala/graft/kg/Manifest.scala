package graft.kg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.XorDigest

/** Per-partition lineage + checkpointed resumability (BASELINE.json:6,14;
  * SURVEY S5/A7). The manifest is an append-only parquet table; a bucket
  * is COMMITTED once its manifest row (status='committed') exists. Resume
  * = anti-join the corpus against committed buckets; the triple writer
  * uses dynamic partition overwrite so a half-written (uncommitted)
  * bucket is idempotently rewritten on the next attempt.
  */
object Manifest {

  /** Per-bucket lineage rows for a triple DataFrame: row count + a
    * commutative xor digest of the full triple identity (order- and
    * partitioning-invariant).
    */
  def bucketStats(triples: DataFrame): DataFrame =
    triples
      .withColumn("rowHash",
        xxhash64(col("subj"), col("pred"), col("obj"), col("repo"),
          col("path"), col("commit"), col("fileSha")))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("rowCount"), XorDigest(col("rowHash")).as("contentDigest"))

  def write(spark: SparkSession, manifestDir: String, runId: String, stage: String,
            stats: DataFrame, attempt: Int, startedAtMs: Long, wallMs: Long): Unit = {
    stats.select(
        lit(runId).as("runId"), lit(stage).as("stage"),
        col("bucket").cast("int").as("bucket"),
        col("rowCount").cast("long"), col("contentDigest").cast("long"),
        lit("committed").as("status"), lit(attempt).as("attempt"),
        to_timestamp(lit(startedAtMs / 1000.0)).as("startedAt"),
        lit(wallMs).as("wallMs"))
      .coalesce(1)
      .write.mode("append").parquet(manifestDir)
  }

  /** Buckets already committed for (runId, stage) — small; broadcast by
    * the caller's anti-join.
    */
  def committedBuckets(spark: SparkSession, manifestDir: String,
                       runId: String, stage: String): DataFrame = {
    val empty = spark.range(0).select(col("id").cast("int").as("bucket"))
    // Hadoop FileSystem, not java.io.File: the manifest dir may live on
    // any supported filesystem (HDFS/S3A/local) in production
    val p = new org.apache.hadoop.fs.Path(manifestDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) empty
    else spark.read.parquet(manifestDir)
      .filter(col("runId") === runId && col("stage") === stage &&
        col("status") === "committed")
      .select(col("bucket")).distinct()
  }
}
