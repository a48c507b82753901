package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for named SparkEntry keys into
  * plans/r07/<key>_<suffix>.txt — the round-7 optimization evidence
  * trail (before/after plan shapes). For iterative keys (CC, k-core,
  * converged PageRank) building the DataFrame runs the loop, so the
  * captured plan is the final round's shape — same caveat as
  * ExplainDump. Usage:
  *   sbt 'runMain graft.tools.PlanR07 <suffix> <sfDir> <key> [<key> ...]'
  */
object PlanR07 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanR07 <suffix> <sfDir> <key>...")
    val suffix = args(0)
    val sfDir = args(1)
    val keys = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get("plans/r07"))
    for (k <- keys) {
      val df = graft.SparkEntry.queries(k)(spark, sfDir)
      val s = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val capped = if (s.length <= 60000) s
        else s.take(60000) + s"\n... [truncated ${s.length - 60000} chars]\n"
      Files.writeString(Paths.get(s"plans/r07/${k}_$suffix.txt"),
        s"# $k ($suffix) — sfDir=$sfDir, explain(formatted)\n" + capped)
      println(s"[planr07] wrote plans/r07/${k}_$suffix.txt (${s.length} chars)")
    }
    spark.stop()
  }
}
