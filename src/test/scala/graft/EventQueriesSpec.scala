package graft

/** Contract tests for the round-6 sessionization operator: session
  * semantics against a local brute-force recompute (the oracle proves
  * engine-equivalence; this proves the gap rule itself), plus the
  * one-exchange plan shape the 100 TB story depends on.
  */
class EventQueriesSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"
  private val GapUs = 28800000000L
  private def q = queries.EventQueries.entries("sessionize").fn(spark, d)

  test("sessionize: matches a local gap-rule recompute; totals conserved") {
    import spark.implicits._
    val got = q.as[(Long, Long, Long, Long, Long, Long)].collect().toSet

    val events = spark.read.parquet(s"$d/events.parquet")
      .selectExpr("user_id", "event_id",
        "unix_micros(cast(ts AS timestamp)) AS us", "value")
      .as[(Long, Long, Long, Double)].collect()
    val expect = events.groupBy(_._1).flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._3, e._2))
      var idx = 0L
      var prev = Long.MinValue
      val tagged = sorted.map { e =>
        if (prev == Long.MinValue || e._3 - prev > GapUs) idx += 1
        prev = e._3
        (idx, e)
      }
      tagged.groupBy(_._1).map { case (sid, ss) =>
        val us = ss.map(_._2._3)
        (uid, sid, ss.length.toLong, us.min, us.max,
          ss.map(e => math.round(e._2._4 * 1000000)).sum)
      }
    }.toSet
    assert(got == expect)
    // conservation: every event lands in exactly one session
    assert(got.toSeq.map(_._3).sum == events.length.toLong)
    // the gap rule must actually split somewhere AND chain somewhere
    assert(got.exists(_._3 > 1), "some session must chain >1 event")
    val perUser = got.groupBy(_._1).view.mapValues(_.size)
    assert(perUser.values.exists(_ > 1), "some user must have >1 session")
  }

  test("sessionize: lag + running-sum + final agg reuse ONE exchange") {
    // all three steps key on user_id with the same sort — Catalyst must
    // plan a single shuffle for the whole chain (plus the scan)
    val plan = q.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
