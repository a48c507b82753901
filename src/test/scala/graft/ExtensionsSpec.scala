package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Fingerprint64

/** SparkSessionExtensions integration: the native functions resolve in a
  * session created with spark.sql.extensions, and literals constant-fold
  * at optimization time.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("extensions inject SQL functions; literals constant-fold") {
    // isolated session so the injected extensions actually apply
    // (getOrCreate would otherwise hand back the suite's shared session).
    // NOTE: `spark.sql.extensions` is a STATIC conf read from the
    // SparkContext — on the suite's pre-existing context it cannot take
    // effect, so the test injects through Builder.withExtensions, which
    // runs the exact same GraftExtensions.apply the conf path loads
    // (spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions).
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new graft.functions.GraftExtensions()(_))
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val df = spark.sql(
        "SELECT fingerprint64('abc') AS fp, vec_dot(array(1.0F,2.0F), array(3.0F,4.0F)) AS d")
      val row = df.first()
      assert(row.getLong(0) == Fingerprint64.fnv("abc".getBytes("UTF-8")))
      assert(row.getDouble(1) == 11.0)
      // foldable ⇒ the optimizer reduces the call to a literal
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("fingerprint64"),
        s"constant folding did not fire:\n$optimized")
      assert(spark.sql("SELECT rolling_min_hash64('abcdefghijklmnopqrstuv')").first().getLong(0) ==
        graft.functions.RollingMinHash64.rollingMin("abcdefghijklmnopqrstuv".getBytes("UTF-8")))
    } finally {
      // do not stop(): the SparkContext is shared with the whole suite;
      // just detach this session so other suites build their own
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
