package graft

import org.apache.spark.sql.DataFrame

/** ANN quality properties over the driver testdata (read-only). */
class AnnSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  private def neighbors(df: DataFrame): Map[Long, Set[Long]] = {
    import spark.implicits._
    df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
  }

  test("embed-cosine dedup: IVF-cluster blocking, not quadratic hot-label") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dim = 16
    val rng = new scala.util.Random(7)
    def unit(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    // 8 seed centroids (one-hot) + 200 vectors under ONE hot label —
    // the round-2 label-blocked plan would self-join all C(200,2) pairs
    val seeds = (0 until 8).map(i =>
      (i.toLong, Array.tabulate(dim)(j => if (j == i) 1f else 0f), "seed"))
    val noise = (8 until 198).map(i =>
      (i.toLong, unit(Array.fill(dim)(rng.nextGaussian().toFloat)), "hot"))
    // planted near-dup pair, both nearest centroid 0
    val a = unit(Array.tabulate(dim)(j => if (j == 0) 1f else 0.01f))
    val b = unit(Array.tabulate(dim)(j => if (j == 0) 1f else 0.011f))
    val emb = (seeds ++ noise ++ Seq((200L, a, "hot"), (201L, b, "hot")))
      .toDF("vec_id", "embedding", "label")
    val pairs = queries.DedupQueries.embedCosinePairs(emb, threshold = 0.9)
    val got = pairs.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got.contains((200L, 201L)), s"planted near-dup missed: $got")
    // the self-join equi-key is the cluster id; label never joins
    val joins = pairs.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.nonEmpty)
    val joinKeyNames = joins.flatMap(_.condition).flatMap(_.references.map(_.name))
    assert(joinKeyNames.exists(_ == "cluster"), s"join keys: $joinKeyNames")
    assert(!joinKeyNames.contains("label"), s"label in join keys: $joinKeyNames")
  }

  test("ivfAssign k is a real granularity knob: k=64 bounds the hot-cluster population") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // planted fixture: 2048 vectors over 64 distinct directions (i % 64),
    // each with a small secondary component. The first 64 vectors are the
    // direction representatives, so at k=64 every direction has its own
    // centroid; at k=8 the 56 uncovered directions' mass has nowhere to
    // go and piles onto a few clusters (mostly the tiebreak winner) —
    // the degenerate hot cluster the knob exists to split.
    val dim = 64
    val n = 2048
    def unit(v: Array[Float]): Array[Float] = {
      val nn = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / nn)
    }
    val emb = (0 until n).map { i =>
      val d = i % 64
      val p = (i * 7 + 3) % 64
      (i.toLong, unit(Array.tabulate(dim)(j =>
        (if (j == d) 1f else 0f) + (if (j == p) 0.05f else 0f))))
    }.toDF("vec_id", "embedding")
    def clusterSizes(k: Int): Seq[Long] = {
      val asg = queries.DedupQueries.ivfAssign(
        queries.DedupQueries.withNorm(emb), k)
      asg.groupBy("cluster").count().select("count").as[Long].collect().toSeq
    }
    val sizes64 = clusterSizes(64)
    val sizes8 = clusterSizes(8)
    val max64 = sizes64.max
    val max8 = sizes8.max
    val pairs64 = sizes64.map(c => c * (c - 1) / 2).sum
    val pairs8 = sizes8.map(c => c * (c - 1) / 2).sum
    info(s"max cluster k=64: $max64 (of ${n / 64} ideal), k=8: $max8; " +
      s"candidate pairs k=64: $pairs64, k=8: $pairs8")
    // declared bound: at k=64 no cluster exceeds 2x the balanced share,
    // so pair-generation cost is O(n * n/k) — the sub-quadratic claim
    assert(max64 <= 2L * n / 64, s"hot cluster at k=64: $max64")
    assert(pairs64 <= n.toLong * (2L * n / 64), s"pair count at k=64: $pairs64")
    // the knob is real: raising k from 8 to 64 collapses the hot cluster
    assert(max8 >= 4 * max64, s"expected a hot cluster at k=8: $max8 vs $max64")
    assert(pairs8 > 4 * pairs64)
  }

  test("Lloyd-iterated IVF recall@10 >= fixed-centroid IVF recall@10") {
    val truth = neighbors(SparkEntry.queries("simsearch_bruteforce")(spark, d))
    val fixed = neighbors(SparkEntry.queries("simsearch_ivf")(spark, d))
    val lloyd = neighbors(queries.DedupQueries.ivfLloyd(spark, d))
    def recall(got: Map[Long, Set[Long]]): Double =
      truth.keys.toSeq.map { q =>
        got.getOrElse(q, Set.empty).intersect(truth(q)).size.toDouble / truth(q).size
      }.sum / truth.size
    val rFixed = recall(fixed)
    val rLloyd = recall(lloyd)
    info(s"recall@10: fixed=$rFixed lloyd=$rLloyd")
    assert(rLloyd >= rFixed,
      s"Lloyd iterations must not hurt recall: lloyd=$rLloyd fixed=$rFixed")
    assert(rLloyd > 0.0)
  }
}
