package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg._

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Part 1 — operator suite: times every SparkEntry query (count) at
  * `local[$SPARK_GRAFT_CPUS]` on $SPARK_GRAFT_SF_DIR (regression
  * tracking per BASELINE.md).
  *
  * Part 2 — KG scaling (BASELINE.json:2: ≥0.8 throughput scaling
  * efficiency from N to 4N): the full extract→canonicalize→dedup DAG
  * over a pre-materialized deterministic corpus, run at local[4] (N)
  * and local[16] (4N) — both within the host's 16 PHYSICAL cores, so
  * thread 4N gets 4× the silicon of thread N, exactly like 4× the
  * executors would (local[8]→local[32] would compare 8 physical cores
  * against 16 physical + SMT siblings ≈ 2.4× silicon — a hardware
  * artifact, not a pipeline property; see BASELINE.md). Runs alternate
  * between the two configs; min-of-runs filters the sandbox's
  * steal-time noise. Throughput = triples emitted / sec;
  * efficiency = (thr@16/thr@4)/4.
  *
  * Prints ONE JSON line: {"metric","value","unit","queries",...,"sf"}.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One timed pipeline run over the corpus. Dictionary artifacts
    * (function-alias broadcast + canonical link map) are corpus-
    * independent per-cluster setup — prepared once per session by the
    * caller, amortized over every batch exactly as a production
    * deployment would (BASELINE.json:6 "broadcast dictionaries").
    */
  private def kgTriples(s: SparkSession, corpusDir: String,
                        fnAliases: org.apache.spark.broadcast.Broadcast[Set[String]],
                        canon: org.apache.spark.broadcast.Broadcast[Map[String, String]]): Long = {
    import s.implicits._
    val hashed = s.read.parquet(corpusDir)
      .withColumn("file_sha", sha2(col("content"), 256))
      .select("repo", "path", "commit", "lang", "content", "file_sha")
      .as[HashedFile]
    Extract.canonicalTriples(hashed, fnAliases, canon).count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.1)

    // ---- part 1: operator suite ----
    // two passes, min-of-2 per key: the first pass pays JIT/page-cache
    // warmup, the min filters it out. Failures are recorded per key (a
    // throwing query must NOT masquerade as a fast timing).
    val suiteSpark = session(cpus)
    val keys = SparkEntry.queries.toSeq.sortBy(_._1)
    def onePass(): Seq[(String, (Double, Boolean))] = keys.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(suiteSpark, sfDir).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      name -> ((System.nanoTime() - t0) / 1e9, ok)
    }
    val pass1 = onePass().toMap
    val pass2 = onePass().toMap
    val results = keys.map { case (name, _) =>
      val (tA, okA) = pass1(name)
      val (tB, okB) = pass2(name)
      val ok = okA && okB
      // failed keys get a -1 sentinel in the flat map (never a plausible time)
      name -> (if (ok) math.min(tA, tB) else -1.0, ok)
    }

    // ---- part 2: KG throughput scaling (N=4 vs 4N=16 cores) ----
    val nFiles = math.max(8000, (sf * 4000000).toInt)
    val corpusDir = s"/tmp/graft_bench_corpus_$nFiles"
    if (!new java.io.File(corpusDir).exists()) {
      import suiteSpark.implicits._
      suiteSpark.range(nFiles).repartition(64)
        .mapPartitions(_.map(i => fixtures.CorpusGen.genFile(i.toInt, nFiles)))
        .toDF().write.mode("overwrite").parquet(corpusDir)
    }
    suiteSpark.stop()

    def bestTime(cores: Int, runs: Int): (Long, Double) = {
      val s = session(cores)
      import s.implicits._
      // per-cluster dictionary setup, outside the timed region
      val dict = KgPipeline.dictDataset(s)
      val fnAliases = Extract.broadcastFnAliases(s, dict)
      val canonB = Canonicalize.broadcastLinkMap(s, dict)
      var triples = 0L
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        triples = kgTriples(s, corpusDir, fnAliases, canonB)
        (System.nanoTime() - t0) / 1e9
      }
      s.stop()
      (triples, times.min)
    }
    // hardware-ceiling calibration: an embarrassingly parallel job (per-
    // row sha256 over fixed bytes — zero shuffle, zero skew, nothing to
    // serialize) measures what 4→16 threads is WORTH on this host. The
    // VM boosts clocks at low occupancy (turbo/SMT/steal), so even
    // perfect code scales < 4×; real 4-vs-16-executor clusters run at
    // equal clocks. kg_scaling_efficiency_normalized = raw / ceiling.
    def calibTime(cores: Int, runs: Int): Double = {
      val s = session(cores)
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        s.range(400000).mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("SHA-256")
          val buf = new Array[Byte](1500)
          it.map { i =>
            java.util.Arrays.fill(buf, (i % 251).toByte)
            var k = 0
            var acc = 0L
            while (k < 4) { md.reset(); acc ^= md.digest(buf)(0); k += 1 }
            acc
          }
        }(org.apache.spark.sql.Encoders.scalaLong).count()
        (System.nanoTime() - t0) / 1e9
      }
      s.stop()
      times.min
    }

    bestTime(16, 2) // JIT/page-cache warmup, discarded
    // The sandbox shows multi-minute steal-time windows that can inflate
    // one config's wall time 2×. Estimator: measure (t16, t4, c16, c4)
    // within each round and report the MEDIAN per-round raw efficiency —
    // an unbiased location estimate (max-of-rounds is upward-biased on
    // noisy ratios and could pass the 0.8 gate on noise alone). Every
    // round's tuple is emitted so the distribution itself is judgeable.
    // The hardware-ceiling calibration (what 4→16 threads is WORTH on
    // this clock-boosting SMT host) is reported as CONTEXT only — no
    // capped "normalized" headline.
    var nTriples = 0L
    var t16 = Double.MaxValue
    var t4 = Double.MaxValue
    case class Round(t4: Double, t16: Double, c4: Double, c16: Double) {
      def eff: Double = (t4 / t16) / 4.0
      def ceil: Double = (c4 / c16) / 4.0
    }
    val rounds = (1 to 4).map { _ =>
      val (n1, a) = bestTime(16, 2); nTriples = n1
      val (_, b) = bestTime(4, 2)
      val c16r = calibTime(16, 2)
      val c4r = calibTime(4, 2)
      t16 = math.min(t16, a); t4 = math.min(t4, b)
      Round(b, a, c4r, c16r)
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val thr16 = nTriples / t16
    val thr4 = nTriples / t4
    val effMedian = median(rounds.map(_.eff))
    val ceilMedian = median(rounds.map(_.ceil))

    // ---- emit one JSON line ----
    def f(d: Double): String =
      if (d.isNaN || d.isInfinite) "null"
      else String.format(java.util.Locale.ROOT, "%.6f", Double.box(d))
    val extra = Seq(
      "kg_bench_files" -> nFiles.toDouble, "kg_bench_triples" -> nTriples.toDouble,
      "kg_sec_at_n4" -> t4, "kg_sec_at_n16" -> t16,
      "kg_thr_at_n4" -> thr4, "kg_thr_at_n16" -> thr16,
      "kg_scaling_efficiency" -> effMedian,
      "kg_scaling_efficiency_min" -> rounds.map(_.eff).min,
      "kg_scaling_efficiency_max" -> rounds.map(_.eff).max,
      "hw_ceiling_efficiency_median" -> ceilMedian)
    val qs = (results.map { case (k, (t, _)) => k -> t } ++ extra)
      .map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val detail = results.map { case (k, (t, ok)) =>
      "\"" + k + "\":{\"time\":" + f(t) + ",\"ok\":" + ok + "}"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, (_, false)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val roundsJson = rounds.map(r =>
      s"""{"t4":${f(r.t4)},"t16":${f(r.t16)},"c4":${f(r.c4)},"c16":${f(r.c16)},""" +
        s""""eff":${f(r.eff)},"ceil":${f(r.ceil)}}""").mkString("[", ",", "]")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec",""" +
      s""""queries":$qs,"queries_detail":$detail,"failed_queries":$failed,""" +
      s""""scaling_rounds":$roundsJson,"sf":"$sfDir"}""")
  }
}
