package graft

/** Contract tests for the round-5 repetition-ratio quality gate: the
  * oracle proves engine-equivalence; this proves the gate semantics
  * against a local brute-force recompute and asserts the zero-shuffle
  * plan shape the 100 TB story depends on.
  */
class TextOpsSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"
  private def q = queries.TextQueries.entries("text_repetition").fn(spark, d)

  test("text_repetition: matches brute-force top-word count; no Exchange") {
    import spark.implicits._
    val got = q.as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expect = docs.map { case (id, t) =>
      val w = t.split(" ")
      id -> (w.groupBy(identity).values.map(_.length.toLong).max, w.length.toLong)
    }.filter { case (_, (m, n)) => m * 10 >= n }.toMap
    assert(got == expect, s"gate mismatch: ${got.size} vs ${expect.size} docs")
    assert(expect.nonEmpty, "tiny-sf corpus must trip the gate somewhere")
    // per-row higher-order counting — the whole plan is scan+project+filter
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"),
      "repetition gate must not shuffle")
  }
}
