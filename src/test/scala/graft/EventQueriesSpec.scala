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

  private lazy val rawEvents = {
    import spark.implicits._
    spark.read.parquet(s"$d/events.parquet")
      .selectExpr("user_id", "event_type",
        "unix_micros(cast(ts AS timestamp)) AS us")
      .as[(Long, String, Long)].collect()
  }

  test("funnel_steps: matches a local ordered-scan recompute") {
    import spark.implicits._
    val got = queries.EventQueries.entries("funnel_steps").fn(spark, d)
      .as[(Long, Option[Long], Option[Long], Option[Long], Int)]
      .collect().toSet

    val expect = rawEvents.groupBy(_._1).map { case (uid, evs) =>
      def firstAfter(ev: String, after: Long): Option[Long] = {
        val ts = evs.collect { case (_, e, us) if e == ev && us > after => us }
        if (ts.isEmpty) None else Some(ts.min)
      }
      val t1 = firstAfter("view", Long.MinValue)
      val t2 = t1.flatMap(firstAfter("click", _))
      val t3 = t2.flatMap(firstAfter("purchase", _))
      val depth = if (t3.isDefined) 3 else if (t2.isDefined) 2
        else if (t1.isDefined) 1 else 0
      (uid, t1, t2, t3, depth)
    }.toSet
    assert(got == expect)
    // ordering must bite: strict "after" means t1 < t2 < t3 wherever defined
    assert(got.forall { case (_, t1, t2, t3, _) =>
      t1.zip(t2).forall { case (a, b) => a < b } &&
        t2.zip(t3).forall { case (a, b) => a < b } })
    // the funnel must actually narrow on this corpus
    val byDepth = got.groupBy(_._5).view.mapValues(_.size).toMap
    assert(byDepth.getOrElse(3, 0) > 0, "someone completes the funnel")
  }

  test("cohort_retention: conserves users; offset-0 row per cohort") {
    import spark.implicits._
    val got = queries.EventQueries.entries("cohort_retention").fn(spark, d)
      .as[(Long, Long, Long)].collect()

    val wk = 604800000000L
    val expect = {
      val first = rawEvents.groupBy(_._1).view
        .mapValues(_.map(_._3).min).toMap
      rawEvents.map { case (uid, _, us) =>
        (first(uid) / wk, (us - first(uid)) / wk, uid)
      }.distinct.groupBy(c => (c._1, c._2)).map { case ((cw, off), cells) =>
        (cw, off, cells.length.toLong)
      }.toSet
    }
    assert(got.toSet == expect)
    // every cohort has an offset-0 cell counting exactly its members
    val cohortSize = rawEvents.groupBy(_._1).view.mapValues(_.map(_._3).min)
      .toMap.groupBy(_._2 / wk).view.mapValues(_.size.toLong).toMap
    val zero = got.filter(_._2 == 0L).map(r => r._1 -> r._3).toMap
    assert(zero == cohortSize)
  }

  test("sessionize: lag + running-sum + final agg reuse ONE exchange") {
    // all three steps key on user_id with the same sort — Catalyst must
    // plan a single shuffle for the whole chain (plus the scan)
    val plan = q.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected 1 exchange, got $exchanges:\n$plan")
  }
}
