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
