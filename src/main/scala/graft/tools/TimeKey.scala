package graft.tools

import org.apache.spark.sql.SparkSession

/** Times individual SparkEntry query keys — the per-key iteration loop
  * Bench's full protocol is too heavy for. Mirrors Bench's part-1
  * timing semantics exactly (same session config, `fn(...).count()`
  * wall time, min-of-N reported alongside all samples). Run:
  *   sbt 'runMain graft.tools.TimeKey <sfDir> <reps> <key> [<key> ...]'
  */
object TimeKey {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: TimeKey <sfDir> <reps> <key>...")
    val sfDir = args(0)
    val reps = args(1).toInt
    val keys = args.drop(2).toSeq
    // default matches Bench part 1 (local[4]) so unqualified runs are
    // comparable to recorded suite numbers; override via SPARK_GRAFT_CPUS
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (k <- keys) {
      val fn = graft.SparkEntry.queries.getOrElse(k,
        sys.error(s"unknown key $k; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timekey] $k min=${ts.min}%.3f samples=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
