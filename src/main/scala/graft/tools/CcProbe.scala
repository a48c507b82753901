package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Instrumented breakdown of the cc_components key: edge-build time,
  * per-round star-contraction time, round count. Usage:
  *   sbt 'runMain graft.tools.CcProbe <sfDir> [cores]'
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cores = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def now() = System.nanoTime()
    val t0 = now()
    // the production edge build, shared with the cc_components key
    val edges = graft.queries.KgQueries.eventChainEdges(spark, sfDir)
      .localCheckpoint()
    val nEdges = edges.count()
    println(f"[ccprobe] edge build+checkpoint: ${(now() - t0) / 1e9}%.2fs, $nEdges edges")

    // job/stage telemetry for the CC run, attributed from outside —
    // no instrumentation inside Canonicalize
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int)]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int)]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(), j.stageInfos.size))
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        // jobs started before the listener attached have no entry — skip
        Option(starts.remove(j.jobId)).foreach { case (s, nst) =>
          jobs.add((j.jobId, System.nanoTime() - s, nst))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // A/B: optional conf overrides for the CC run; NOT restored — the
    // session is stopped right after, nothing else runs under them
    val aqe = sys.env.get("CCPROBE_AQE")
    val parts = sys.env.get("CCPROBE_PARTS")
    aqe.foreach(v => spark.conf.set("spark.sql.adaptive.enabled", v))
    parts.foreach(v => spark.conf.set("spark.sql.shuffle.partitions", v))
    val t1 = now()
    val res = graft.kg.Canonicalize.connectedComponents(edges)
    val n = res.count()
    val total = (now() - t1) / 1e9
    // the listener bus is asynchronous: the final job's onJobEnd may
    // still be queued when count() returns. waitUntilEmpty is
    // private[spark], so drain by polling until the recorded job count
    // is stable across two samples (bounded at ~2 s)
    var seen = -1
    var stable = 0
    var polls = 0
    while (stable < 2 && polls < 10) {
      Thread.sleep(200)
      val cur = jobs.size()
      if (cur == seen) stable += 1 else { stable = 0; seen = cur }
      polls += 1
    }
    spark.sparkContext.removeSparkListener(listener)
    println(f"[ccprobe] CC total: $total%.2fs, $n nodes (aqe=${aqe.getOrElse("default")} parts=${parts.getOrElse("default")})")
    import scala.jdk.CollectionConverters._
    val js = jobs.asScala.toSeq.sortBy(_._1)
    println(f"[ccprobe] jobs=${js.size} stages=${js.map(_._3).sum} " +
      f"jobSecs=${js.map(_._2 / 1e9).map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
