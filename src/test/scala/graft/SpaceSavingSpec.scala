package graft

import org.apache.spark.sql.functions._
import graft.functions.SpaceSaving

/** SpaceSaving sketch contracts: exactness when capacity ≥ distinct
  * keys (the regime the oracled `agg_heavyhitters` key runs in), the
  * Metwally '05 N/k overestimate bound under capacity pressure, and
  * both across real partition merges.
  */
class SpaceSavingSpec extends SparkTestBase {

  /** Deterministic skewed stream: term i appears 2^(9-i) times for
    * i = 0..9 (1023 rows, top term = 512 of them).
    */
  private def skewed: Seq[String] =
    (0 until 10).flatMap(i => Seq.fill(1 << (9 - i))(s"t$i"))

  private def run(k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    skewed.toDF("term").repartition(parts)
      .agg(SpaceSaving(k)(col("term")).as("m"))
      .select(explode(col("m")))
      .as[(String, Long)].collect().toMap
  }

  private val truth: Map[String, Long] =
    skewed.groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }

  test("capacity >= distinct: exact counts under any partitioning") {
    for (parts <- Seq(1, 7, 32)) {
      assert(run(k = 16, parts) == truth, s"parts=$parts")
    }
  }

  test("capacity < distinct: every estimate within N/k of truth; heavy hitters kept") {
    val n = skewed.length.toLong
    for (parts <- Seq(1, 7)) {
      val est = run(k = 4, parts)
      assert(est.size <= 4)
      // the two dominant terms (512 + 256 of 1023 rows) must survive
      assert(est.contains("t0") && est.contains("t1"), s"parts=$parts: $est")
      // SpaceSaving overestimates, never undercounts a kept item's true
      // frequency by construction; the overestimate is bounded by N/k
      // per partition-summary (merges sum the per-summary bounds, so
      // allow parts * N/k across the merge)
      est.foreach { case (t, c) =>
        val tru = truth.getOrElse(t, 0L)
        assert(c >= tru, s"undercount of $t: $c < $tru")
        assert(c - tru <= parts * n / 4, s"overestimate of $t: $c vs $tru")
      }
    }
  }
}
