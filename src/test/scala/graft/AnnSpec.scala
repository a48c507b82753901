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
