package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.t

/** Event-log operators (round 6): gap-based sessionization — the
  * canonical clickstream/interaction-log primitive a training-data
  * pipeline runs to turn raw event streams into conversation/session
  * units. Deterministic and integer-exact end to end:
  * timestamps are compared in unix MICROseconds (both engines read the
  * same parquet int64), the session break is an integer threshold, and
  * the per-session value sum is per-row fixed-point micros summed as
  * BIGINT — float addition order never matters (same idiom as
  * graph_pagerank's millionths).
  */
object EventQueries {

  /** 8-hour inactivity gap, in microseconds. Sized to the synthetic
    * events table (median per-user inter-event gap ≈ 7.3 h at sf0.01)
    * so roughly half the gaps chain and half break — a web pipeline
    * would use ~30 min.
    */
  private val GapUs = 28800000000L

  val entries: Map[String, Q] = Map(

    // Sessionization: per-user inactivity-gap session ids, then one
    // aggregate row per session. Scale shape: both windows and the
    // final groupBy key on user_id — a HIGH-cardinality key (users),
    // never the handful-of-values mix-dimension trap; per-task work is
    // bounded by a single user's history. (At 100 TB the residual skew
    // risk is a bot user with millions of events — production would
    // segment the window key to (user_id, day) and stitch boundaries,
    // the same cap discipline as the LSH hot buckets.)
    "sessionize" -> Q.withOracle(
      """WITH e AS (
        |  SELECT user_id, event_id, ts, value,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER
        |      (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |  FROM events),
        |f AS (SELECT *, CASE WHEN gap_us IS NULL OR gap_us > 28800000000
        |                     THEN 1 ELSE 0 END AS brk FROM e),
        |s AS (SELECT *, CAST(sum(brk) OVER (PARTITION BY user_id
        |        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |        AS session_idx FROM f)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
        |  CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT)
        |    AS value_micro
        |FROM s GROUP BY 1, 2""".stripMargin)(
      (s, d) => {
        val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
        // ts is TIMESTAMP_NTZ in the parquet; every graft session pins
        // spark.sql.session.timeZone=UTC, so the NTZ→TIMESTAMP cast is
        // the identity on the stored micros — exactly DuckDB's
        // epoch_us() on the same naive value
        val us = unix_micros(col("ts").cast("timestamp"))
        // both window functions share one partition key + sort order, so
        // Catalyst plans ONE exchange + one sort for the whole chain
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"), col("value"),
            (us - lag(us, 1).over(byUser)).as("gap_us"))
          .withColumn("brk",
            when(col("gap_us").isNull || col("gap_us") > GapUs, 1).otherwise(0))
          .withColumn("session_idx", sum(col("brk")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_idx")
          .agg(count(lit(1)).as("n_events"),
            min(us).as("start_us"),
            max(us).as("end_us"),
            sum(round(col("value") * 1000000).cast("long")).as("value_micro"))
      })
  )
}
