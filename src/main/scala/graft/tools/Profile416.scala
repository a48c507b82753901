package graft.tools

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.kg._

/** Profiler for the saturated-geometry gap (round-2 verdict "Missing #2"):
  * why does the full DAG reach only ~0.7 of its own embarrassingly-
  * parallel calibration at local[4]→local[16]?
  *
  * Runs three jobs at each geometry — (a) full DAG (flatMap + dedup
  * shuffle), (b) extract-only (the same flatMap, no shuffle), (c) the
  * sha256 calibration — and reports wall time plus task-metric totals
  * (executor run time, JVM GC time, shuffle write/fetch time, deserialize
  * time) from a stage-completion listener. Findings land in
  * BENCH/PROFILE_4_16.md.
  *
  * Usage: runMain graft.tools.Profile416 [nfiles] [runs] [cores,cores,...]
  */
object Profile416 {

  final class MetricSink extends SparkListener {
    val run = new AtomicLong; val gc = new AtomicLong
    val shufWrite = new AtomicLong; val shufFetch = new AtomicLong
    val deser = new AtomicLong; val cpu = new AtomicLong
    def reset(): Unit = Seq(run, gc, shufWrite, shufFetch, deser, cpu).foreach(_.set(0))
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        run.addAndGet(m.executorRunTime)
        gc.addAndGet(m.jvmGCTime)
        cpu.addAndGet(m.executorCpuTime / 1000000L)
        shufWrite.addAndGet(m.shuffleWriteMetrics.writeTime / 1000000L)
        shufFetch.addAndGet(m.shuffleReadMetrics.fetchWaitTime)
        deser.addAndGet(m.executorDeserializeTime)
      }
    }
    def report(label: String, wall: Double): String =
      f"$label%-14s wall=$wall%7.2fs run=${run.get / 1000.0}%8.1fs " +
        f"cpu=${cpu.get / 1000.0}%8.1fs gc=${gc.get / 1000.0}%6.1fs " +
        f"(${100.0 * gc.get / math.max(1, run.get)}%4.1f%% of run) " +
        f"shufW=${shufWrite.get / 1000.0}%5.1fs fetch=${shufFetch.get / 1000.0}%5.1fs " +
        f"deser=${deser.get / 1000.0}%5.1fs"
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 400000
    val runs = if (args.length > 1) args(1).toInt else 2
    val coresList = if (args.length > 2) args(2).split(",").toSeq.map(_.toInt)
                    else Seq(4, 16)
    val corpusDir = s"/tmp/graft_bench_corpus_$n"
    if (!new java.io.File(corpusDir).exists()) {
      val s = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate()
      import s.implicits._
      s.range(n).repartition(64)
        .mapPartitions(_.map(i => graft.fixtures.CorpusGen.genFile(i.toInt, n)))
        .toDF().write.mode("overwrite").parquet(corpusDir)
      s.stop()
    }

    for (cores <- coresList) {
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false").getOrCreate()
      import s.implicits._
      s.sparkContext.setLogLevel("WARN")
      val sink = new MetricSink
      s.sparkContext.addSparkListener(sink)
      val dict = KgPipeline.dictDataset(s)
      val fnAliases = Extract.broadcastFnAliases(s, dict)
      val canonB = Canonicalize.broadcastLinkMap(s, dict)

      def hashed = s.read.parquet(corpusDir)
        .withColumn("file_sha", sha2(col("content"), 256))
        .select("repo", "path", "commit", "lang", "content", "file_sha")
        .as[HashedFile]

      def timed(label: String)(job: => Unit): Unit = {
        var best = Double.MaxValue
        (1 to runs).foreach { _ =>
          sink.reset()
          val t0 = System.nanoTime()
          job
          // capture wall BEFORE the listener-drain sleep: the 300 ms
          // drain is measurement plumbing, not job time (it was a fixed
          // ~7% bias on the ~4 s calibration jobs)
          val elapsed = (System.nanoTime() - t0) / 1e9
          Thread.sleep(300)
          best = math.min(best, elapsed)
          println("[profile] " + sink.report(s"$label@$cores", elapsed))
        }
        println(f"[profile] $label@$cores best=$best%.3f s over $runs runs")
      }

      timed("warmup") { Extract.canonicalTriples(hashed, fnAliases, canonB).count() }
      timed("full_dag") { Extract.canonicalTriples(hashed, fnAliases, canonB).count() }
      timed("extract_only") { Extract.scoredRelations(hashed, fnAliases).count() }
      timed("scan_sha_only") {
        hashed.select(count(col("file_sha"))).head()
      }
      timed("calib") {
        s.range(400000).mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("SHA-256")
          val buf = new Array[Byte](1500)
          it.map { i =>
            java.util.Arrays.fill(buf, (i % 251).toByte)
            var k = 0; var acc = 0L
            while (k < 16) { md.reset(); acc ^= md.digest(buf)(0); k += 1 }
            acc
          }
        }(org.apache.spark.sql.Encoders.scalaLong).count()
      }
      s.stop()
    }
  }
}
