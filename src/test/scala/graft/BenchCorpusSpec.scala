package graft

/** Regression spec for Bench.materializeCorpora's cache-validity rule:
  * the uniform corpus is reusable only when its `_SUCCESS` marker
  * exists — a bare dir-exists() check once let a run killed mid-write
  * leave a partial corpus that every later run (and the skew corpus
  * derived from it) silently reused.
  */
class BenchCorpusSpec extends SparkTestBase {

  // an nFiles value no other code path uses, so /tmp dirs are ours
  private val n = 37
  private val corpusDir = new java.io.File(s"/tmp/graft_bench_corpus_$n")
  private val skewDir = new java.io.File(s"/tmp/graft_bench_corpus_skew_$n")

  private def rmrf(d: java.io.File): Unit = {
    Option(d.listFiles()).foreach(_.foreach(rmrf))
    d.delete()
  }

  test("fresh build writes _SUCCESS and a partial dir triggers a rebuild") {
    rmrf(corpusDir); rmrf(skewDir)
    try {
      Bench.materializeCorpora(spark, n)
      assert(new java.io.File(corpusDir, "_SUCCESS").exists())
      assert(spark.read.parquet(corpusDir.getPath).count() === n)

      // simulate the mid-write kill: drop the marker and all but one
      // part file — a dir-exists() check would reuse this truncated dir
      new java.io.File(corpusDir, "_SUCCESS").delete()
      val parts = corpusDir.listFiles().filter(_.getName.endsWith(".parquet"))
      parts.drop(1).foreach(_.delete())
      assert(spark.read.parquet(corpusDir.getPath).count() < n)

      Bench.materializeCorpora(spark, n)
      assert(new java.io.File(corpusDir, "_SUCCESS").exists())
      assert(spark.read.parquet(corpusDir.getPath).count() === n)
      // the skew corpus is derived from the rebuilt input, same rows
      assert(spark.read.parquet(skewDir.getPath).count() === n)
    } finally { rmrf(corpusDir); rmrf(skewDir) }
  }
}
