package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.kg._

/** Structured Streaming stretch (SURVEY §2.9 — post-parity optional):
  * incremental corpus ingest. The reference is strictly batch; the north
  * rule asks for batch-with-resume, which the manifest covers. This module
  * adds the streaming-native variant for continuously-arriving corpora:
  *
  *   readStream(parquet dir) → Trigger.AvailableNow (drain backlog, stop)
  *   → foreachBatch: fused extract+canonicalize → triples written to a
  *     batch-keyed partition (overwrite ⇒ idempotent under batch replay,
  *     the standard exactly-once foreachBatch pattern).
  *
  * Spark's streaming checkpoint tracks which input files were consumed,
  * so a rerun processes only newly arrived corpus files — the streaming
  * analogue of the manifest's bucket resume.
  */
object IncrementalIngest {

  def run(spark: SparkSession, corpusDir: String, outDir: String,
          checkpointDir: String): Unit = {
    import spark.implicits._
    val dict = KgPipeline.dictDataset(spark)
    val fnAliases = Extract.broadcastFnAliases(spark, dict)
    val canonB = Canonicalize.broadcastLinkMap(spark, dict)

    val stream = spark.readStream
      .schema(TableIO.corpusSchema)
      .option("maxFilesPerTrigger", 4)
      .parquet(corpusDir)

    val q = stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val hashed = TableIO.withInvariants(batch, 1)
          .select("repo", "path", "commit", "lang", "content", "file_sha")
          .as[HashedFile]
        Extract.canonicalTriples(hashed, fnAliases, canonB)
          .write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId")
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming exact dedup with CUSTOM STATE (SURVEY §2.9 surface:
    * `KeyValueGroupedDataset.flatMapGroupsWithState`): documents arrive
    * continuously; the first doc_id seen per content sha is emitted, every
    * later duplicate is suppressed — keep-first semantics across batches,
    * carried by per-key state in the streaming state store (checkpointed,
    * so resume preserves dedup decisions). The batch analogue is
    * `dedup_exact` (groupBy sha, min doc_id); the streaming version trades
    * the global min for first-arrival-wins, the only meaning "min" can
    * have over an unbounded stream.
    */
  def streamingExactDedup(spark: SparkSession, docsDir: String, outDir: String,
                          checkpointDir: String): Unit = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text", org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(schema).parquet(docsDir)
      .select(sha2(col("text"), 256).as("sha"), col("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sha: String, rows: Iterator[(String, Long)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single((sha, rows.map(_._2).min)) // min within first batch
          }
      }
      .toDF("sha", "keep_id")
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
  }

  /** Streaming SESSIONIZATION (round 6): the streaming-native
    * counterpart of the batch `sessionize` key, via Spark's built-in
    * `session_window` — gap-merged per-user sessions maintained in the
    * streaming state store and finalized (emitted, Append mode) once
    * the watermark passes a session's end (last event + gap). Batch
    * boundary semantics differ by one edge: `session_window` merges an
    * event while gap < gapDuration (strict; the window end is
    * exclusive), the batch key chains while gap ≤ threshold —
    * indistinguishable on real micro-resolution timestamps. State per
    * open session is one (start, end, count, sum) tuple per user —
    * high-cardinality key, bounded state, the same 100 TB posture as
    * the batch plan's one user-keyed exchange.
    */
  def sessionWindows(spark: SparkSession, eventsDir: String, outDir: String,
                     checkpointDir: String, gap: String = "30 minutes"): Unit = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(schema).parquet(eventsDir)
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000000).cast("long")).as("value_micro"))
      .select(col("user_id"),
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("n_events"), col("value_micro"))
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
  }

  /** Watermarked tumbling-window aggregation over an event stream
    * (readStream → withWatermark → window → count), drained with
    * AvailableNow. Demonstrates the streaming agg surface; equivalent to
    * the batch `groupBy(window(...))` (asserted in StreamingSpec).
    */
  def windowedEventCounts(spark: SparkSession, eventsDir: String,
                          outDir: String, checkpointDir: String): Unit = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("props", org.apache.spark.sql.types.StringType)))
    val q = spark.readStream.schema(schema).parquet(eventsDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      .writeStream
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()
    q.awaitTermination()
  }
}
