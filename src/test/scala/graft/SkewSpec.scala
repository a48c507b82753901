package graft

import org.apache.spark.sql.functions._
import graft.kg.Skew
import graft.fixtures.CorpusGen

/** Skew-handling tests on the mega-repo fixture (repo 0 ≈ 50% of rows;
  * SURVEY §7.4(3)).
  */
class SkewSpec extends SparkTestBase {

  test("two-pass salting: hot key detected, result equals plain groupBy") {
    import spark.implicits._
    val corpus = CorpusGen.corpus(600).toDF()
    val hot = Skew.hotKeys(corpus, "repo", threshold = 100L)
    assert(hot == Set("org/mega-0"), s"hot=$hot")

    val salted = Skew.saltedCount(corpus, "repo", hot, k = 8,
        col("path"), col("commit"))
      .as[(String, Long)].collect().toMap
    val plain = corpus.groupBy("repo").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(salted == plain)
  }

  test("salt spreads the hot key across buckets, leaves cold keys intact") {
    import spark.implicits._
    val corpus = CorpusGen.corpus(600).toDF()
    val hot = Skew.hotKeys(corpus, "repo", 100L)
    val salted = Skew.withAdaptiveSalt(corpus, "repo", hot, 8, col("path"))
    val megaSalts = salted.filter(col("repo") === "org/mega-0")
      .select("salt").distinct().count()
    val coldSalts = salted.filter(col("repo") =!= "org/mega-0")
      .select("salt").distinct().as[Long].collect().toSet
    assert(megaSalts >= 6, s"mega repo only spread over $megaSalts salts")
    assert(coldSalts == Set(0L))
  }

  test("salting is deterministic across invocations") {
    import spark.implicits._
    val corpus = CorpusGen.corpus(300).toDF()
    val hot = Skew.hotKeys(corpus, "repo", 50L)
    def snapshot() = Skew.withAdaptiveSalt(corpus, "repo", hot, 8, col("path"))
      .select("repo", "path", "salt")
      .as[(String, String, Long)].collect().toSet
    assert(snapshot() == snapshot())
  }
}
