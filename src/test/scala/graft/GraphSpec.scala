package graft

/** Contract tests for the round-5 graph analytics: beyond the DuckDB
  * oracle (engine-equivalence), each key is checked against an
  * INDEPENDENT single-threaded local recompute of the same algorithm —
  * the strongest non-circular evidence available for graph semantics.
  */
class GraphSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = queries.GraphQueries.entries(name).fn(spark, d)

  /** Local recompute of the capped co-purchase edge set (src < dst). */
  private lazy val localEdges: Set[(Long, Long)] = {
    import spark.implicits._
    val op: Map[Long, Set[Long]] = spark.read.parquet(s"$d/lineitem.parquet")
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect()
      .toSet[(Long, Long)].groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    op.values.flatMap { grp =>
      val parts = grp.toSeq.sorted.take(10)
      for (a <- parts; b <- parts if a < b) yield (a, b)
    }.toSet
  }

  private lazy val adj: Map[Long, Set[Long]] = {
    val sym = localEdges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    sym.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
  }

  test("graph_degree: matches local adjacency; sum = 2|E|") {
    import spark.implicits._
    val got = q("graph_degree").as[(Long, Long)].collect().toMap
    assert(got == adj.map { case (k, v) => k -> v.size.toLong })
    assert(got.values.sum == 2L * localEdges.size)
  }

  test("graph_kcore: matches a local peel; sf0.001 empties in 3 rounds") {
    import spark.implicits._
    // sf0.001 (k=80 > max degree after a few peels): the whole graph
    // peels away — assert the measured round count and the empty core,
    // then do the REAL semantic check at sf0.01 where 1841 nodes survive
    val (core0, rounds0) = queries.GraphQueries.kcorePeel(
      sym(spark.createDataset(localEdges.toSeq).toDF("src", "dst")), 80)
    assert(core0.count() == 0 && rounds0 == 3)

    val d01 = "/root/testdata/sf0.01"
    val got = queries.GraphQueries.entries("graph_kcore").fn(spark, d01)
      .as[(Long, Long)].collect().toMap

    // independent local peel at sf0.01
    val op: Map[Long, Set[Long]] = spark.read.parquet(s"$d01/lineitem.parquet")
      .select("l_orderkey", "l_partkey").as[(Long, Long)].collect()
      .toSet[(Long, Long)].groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val e01 = op.values.flatMap { grp =>
      val parts = grp.toSeq.sorted.take(10)
      for (a <- parts; b <- parts if a < b) yield (a, b)
    }.toSet
    var edges = e01.flatMap { case (a, b) => Set((a, b), (b, a)) }
    var done = false
    while (!done) {
      val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
      val keep = deg.filter(_._2 >= 80).keySet
      val next = edges.filter { case (a, b) => keep(a) && keep(b) }
      if (next == edges) done = true else edges = next
    }
    val expect = edges.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    assert(got == expect)
    assert(got.nonEmpty && got.values.forall(_ >= 80),
      "every surviving node keeps >= k in-core neighbors")
  }

  private def sym(e0: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions._
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  test("graph_pagerank: matches a single-threaded integer fixed-point recompute") {
    import spark.implicits._
    val got = q("graph_pagerank").as[(Long, Long)].collect().toMap
    val deg = adj.map { case (k, v) => k -> v.size.toLong }
    var pr: Map[Long, Long] = deg.map { case (k, _) => k -> 1000000L }
    for (_ <- 1 to queries.GraphQueries.PrIters) {
      val share = pr.map { case (n, v) => n -> v / deg(n) }
      pr = adj.map { case (n, nbrs) =>
        n -> (150000L + 85L * nbrs.iterator.map(share).sum / 100L)
      }
    }
    assert(got == pr, s"pagerank mismatch on ${got.size} nodes")
    // the graph is skewed, so ranks must actually spread
    assert(got.values.max > got.values.min + 100000L, "degenerate ranks")
  }

  test("pagerankConverged: 3-iteration pin equals the oracled unroll; loop self-terminates") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e0 = spark.createDataset(localEdges.toSeq).toDF("src", "dst")
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    // tol = -1 can never be reached (delta >= 0), so exactly maxIters
    // iterations run — pinning the loop to the hash-verified unrolled key
    val (pinned, pinnedIters) = queries.GraphQueries.pagerankConverged(
      sym, tol = -1L, maxIters = queries.GraphQueries.PrIters)
    assert(pinnedIters == queries.GraphQueries.PrIters)
    val unrolled = q("graph_pagerank").as[(Long, Long)].collect().toMap
    assert(pinned.as[(Long, Long)].collect().toMap == unrolled)
    // open-ended run: must self-terminate well before the cap, and one
    // further fixed-point step must stay inside the tolerance band
    val tol = 2000L
    val (conv, iters) = queries.GraphQueries.pagerankConverged(sym, tol = tol, maxIters = 100)
    assert(iters < 100, s"did not converge ($iters iterations)")
    // one step BEYOND the stopping point must stay inside the tolerance
    // band (iterations are deterministic, so the tol=-1 re-run at
    // maxIters=iters reproduces conv's values exactly)
    val (atStop, _) = queries.GraphQueries.pagerankConverged(sym, tol = -1L, maxIters = iters)
    val (oneMore, _) = queries.GraphQueries.pagerankConverged(sym, tol = -1L, maxIters = iters + 1)
    val s = atStop.as[(Long, Long)].collect().toMap
    assert(s == conv.as[(Long, Long)].collect().toMap)
    val m = oneMore.as[(Long, Long)].collect().toMap
    assert(s.keySet == m.keySet)
    assert(s.keys.map(k => math.abs(s(k) - m(k))).max <= tol)
  }

  test("graph_pagerank_converged: nation-graph loop runs exactly PrConvIters " +
    "iterations, matching the oracle's unroll depth") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e0 = queries.GraphQueries.nationEdges(spark, d)
    val sym = e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
    val (pr, iters) = queries.GraphQueries.pagerankConverged(sym, tol = 1000L, maxIters = 50)
    assert(iters == queries.GraphQueries.PrConvIters,
      s"loop took $iters iterations; the oracle unrolls ${queries.GraphQueries.PrConvIters}")
    // the key's own result equals the loop's (same code path, smoke)
    val viaKey = q("graph_pagerank_converged").as[(Int, Long)].collect().toMap
    assert(viaKey == pr.as[(Int, Long)].collect().toMap && viaKey.size == 25)
    // exact-stopping evidence: the delta checked at iteration iters-1
    // (|pr_{iters-1} - pr_{iters-2}|) was still ABOVE tol — the loop
    // could not have stopped one iteration earlier
    val (atPrev, _) = queries.GraphQueries.pagerankConverged(sym, tol = -1L, maxIters = iters - 1)
    val (atPrev2, _) = queries.GraphQueries.pagerankConverged(sym, tol = -1L, maxIters = iters - 2)
    val p1 = atPrev.as[(Int, Long)].collect().toMap
    val p2 = atPrev2.as[(Int, Long)].collect().toMap
    assert(p1.keys.map(k => math.abs(p1(k) - p2(k))).max > 1000L,
      "loop should not have converged one iteration earlier")
  }

  test("graph_triangles: per-node counts sum to 3x the global triangle count") {
    import spark.implicits._
    val got = q("graph_triangles").as[(Long, Long)].collect().toMap
    // local: for each oriented edge (x,y), triangles via common z > y
    var perNode = Map.empty[Long, Long].withDefaultValue(0L)
    var global = 0L
    for ((x, y) <- localEdges; z <- adj(x) intersect adj(y) if z > y) {
      global += 1
      perNode = perNode.updated(x, perNode(x) + 1)
        .updated(y, perNode(y) + 1).updated(z, perNode(z) + 1)
    }
    assert(global > 0, "tiny-sf graph must contain triangles")
    assert(got.values.sum == 3L * global)
    assert(got == perNode.filter(_._2 > 0))
  }
}
