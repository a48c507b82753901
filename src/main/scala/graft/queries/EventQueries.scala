package graft.queries

import org.apache.spark.sql.DataFrame
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
      }),

    // Ordered funnel (view → click → purchase): per user, the first
    // view, the first click strictly AFTER that view, the first
    // purchase strictly AFTER that click — the product-analytics
    // primitive. Declarative 3-stage form instead of a per-user state
    // machine: each stage is one map-side-combined conditional min over
    // the events scan plus one join keyed on user_id — ALL stages share
    // the high-cardinality user key (exchange-reusable, no
    // mix-dimension hot task; per-stage state is one BIGINT per user).
    // Integer-exact: all comparisons on unix micros.
    "funnel_steps" -> Q.withOracle(
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |s1 AS (SELECT user_id, min(us) AS t1_us FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(us) AS t2_us FROM e JOIN s1 USING (user_id)
        |       WHERE event_type = 'click' AND us > t1_us GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(us) AS t3_us FROM e JOIN s2 USING (user_id)
        |       WHERE event_type = 'purchase' AND us > t2_us GROUP BY 1)
        |SELECT u.user_id, t1_us, t2_us, t3_us,
        |  CASE WHEN t3_us IS NOT NULL THEN 3 WHEN t2_us IS NOT NULL THEN 2
        |       WHEN t1_us IS NOT NULL THEN 1 ELSE 0 END AS depth
        |FROM (SELECT DISTINCT user_id FROM e) u
        |LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
        |LEFT JOIN s3 USING (user_id)""".stripMargin)(
      (s, d) => {
        val us = unix_micros(col("ts").cast("timestamp"))
        val e = t(s, d, "events")
          .select(col("user_id"), col("event_type"), us.as("us"))
        def stage(ev: String, prev: DataFrame, prevCol: String,
                  out: String): DataFrame =
          e.filter(col("event_type") === ev)
            .join(prev.select("user_id", prevCol), "user_id")
            .filter(col("us") > col(prevCol))
            .groupBy("user_id").agg(min("us").as(out))
        val s1 = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min("us").as("t1_us"))
        val s2 = stage("click", s1, "t1_us", "t2_us")
        val s3 = stage("purchase", s2, "t2_us", "t3_us")
        e.select("user_id").distinct()
          .join(s1, Seq("user_id"), "left")
          .join(s2, Seq("user_id"), "left")
          .join(s3, Seq("user_id"), "left")
          .withColumn("depth",
            when(col("t3_us").isNotNull, 3).when(col("t2_us").isNotNull, 2)
              .when(col("t1_us").isNotNull, 1).otherwise(0))
      }),

    // Weekly cohort retention: cohort = epoch-week of a user's FIRST
    // event; cell (cohort_week, week_offset) counts distinct users
    // active that many weeks later — the growth-analytics matrix.
    // Shape: one groupBy(user) min, one user-keyed join of the
    // per-user first timestamp back onto the events scan, one exact
    // two-phase countDistinct over the tiny (cohort, offset) grid.
    // Integer week arithmetic (`div` on micros) — no date/tz parsing
    // to disagree on.
    "cohort_retention" -> Q.withOracle(
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
        |f AS (SELECT user_id, min(us) AS first_us FROM e GROUP BY 1),
        |j AS (SELECT e.user_id, f.first_us // 604800000000 AS cohort_week,
        |        (e.us - f.first_us) // 604800000000 AS week_offset
        |      FROM e JOIN f USING (user_id))
        |SELECT cohort_week, week_offset, count(DISTINCT user_id) AS n_users
        |FROM j GROUP BY 1, 2""".stripMargin)(
      (s, d) => {
        val us = unix_micros(col("ts").cast("timestamp"))
        val e = t(s, d, "events").select(col("user_id"), us.as("us"))
        val f = e.groupBy("user_id").agg(min("us").as("first_us"))
        e.join(f, "user_id")
          .select(expr("first_us div 604800000000").as("cohort_week"),
            expr("(us - first_us) div 604800000000").as("week_offset"),
            col("user_id"))
          .groupBy("cohort_week", "week_offset")
          .agg(countDistinct("user_id").as("n_users"))
      })
  )
}
