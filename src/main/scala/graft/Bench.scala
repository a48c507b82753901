package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kg._

/** Benchmark main (driver-run per round → BENCH_r{N}.json).
  *
  * Part 1 — operator suite: times every SparkEntry query (count) at
  * `local[$SPARK_GRAFT_CPUS]` on $SPARK_GRAFT_SF_DIR (regression
  * tracking per BENCH/BASELINE.md).
  *
  * Part 2 — KG throughput scaling (BASELINE.json:2: ≥0.8 efficiency from
  * N to 4N): the full extract→canonicalize→dedup DAG over a
  * pre-materialized deterministic corpus. PRE-REGISTERED round-3 protocol
  * (BENCH/BASELINE.md §"Scaling protocol", committed before this run):
  *
  *  - Headline geometry local[2]→local[8] (both far below the host's 16
  *    physical cores, so the VM's occupancy-dependent clocks hit them
  *    equally — like 2 vs 8 real executors at fixed clocks).
  *  - 9 rounds. Within a round, configs INTERLEAVE at slot grain
  *    (8,2, 8,2, 8,2): a multi-minute steal window therefore hits both
  *    sides of the ratio, not just one. Per side: min over 3 slots × 2
  *    runs each (the in-session second run sheds session-local warmup —
  *    see `slot`).
  *  - Every slot also times an embarrassingly-parallel sha256 calibration
  *    job inside the SAME session — the round's hardware ceiling.
  *  - Per-round raw efficiency eff_r = t2/(4·t8); pre-registered
  *    SECONDARY normalized efficiency neff_r = eff_r / ceil_r where
  *    ceil_r = c2/(4·c8) from the round's OWN calibration pair (both jobs
  *    face the same host conditions, so the ratio cancels exogenous clock
  *    or steal effects that degrade both).
  *  - Headline = MEDIAN of the 9 raw efficiencies; the normalized median
  *    is reported alongside, with every round's full tuple emitted in
  *    `scaling_rounds` so the distribution is judgeable. No capping, no
  *    post-hoc round filtering.
  *  - A skew block (`scaling_rounds_skew`, 3 rounds, min-of-2 slots) runs
  *    the same estimator over the same files CLUSTERED BY REPO on disk
  *    (the ~50%-hot mega-repo becomes contiguous input splits) —
  *    demonstrating the gate survives input-split skew.
  *  - Context block: the saturated local[4]→local[16] geometry (2
  *    rounds), where even the zero-shuffle calibration reaches only ~0.6
  *    of perfect 4× (16 threads saturate all physical cores, which then
  *    clock lower) — a hardware property, reported with its own ceiling.
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
      // 4 MB scan splits: (a) the uniform corpus' 64 files otherwise pack
      // into ~5 fat partitions at local[2] (maxSplit = min(cap,
      // max(openCost, bytes/cores))), starving 2 threads with a long
      // tail; (b) the skew corpus clusters ~50% of all bytes into one
      // hot file of ~6 row groups (~6 MB compressed each) — splits must
      // align 1:1 with row groups (the minimum read unit; a group goes
      // to the split holding its midpoint), else one split packs several
      // groups and a single task carries a makespan-dominating share of
      // the hot repo (measured: 16 MB splits → 3 groups in one task →
      // skew eff 0.47)
      .config("spark.sql.files.maxPartitionBytes", (4 * 1024 * 1024).toString)
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

  /** Hardware-ceiling calibration: an embarrassingly parallel job (per-
    * row sha256 over fixed bytes — zero shuffle, zero skew, nothing to
    * serialize) measures what N→4N threads is WORTH on this host right
    * now. Sized at ~32 CPU-seconds (~16 s wall at local[2], ~4.4 s at
    * local[8]) so the ~0.4 s/job scheduler overhead biases the measured
    * ceiling by ≤7% — round-2's ~0.3 s calibration at local[8] was
    * overhead- and noise-dominated. The pipeline job carries the same
    * per-job overhead, so the eff/ceil ratio cancels most of the
    * residual (≈3% — disclosed in BENCH/BASELINE.md).
    */
  private def calibRun(s: SparkSession): Double = {
    val t0 = System.nanoTime()
    s.range(400000).mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      val buf = new Array[Byte](1500)
      it.map { i =>
        java.util.Arrays.fill(buf, (i % 251).toByte)
        var k = 0
        var acc = 0L
        while (k < 64) { md.reset(); acc ^= md.digest(buf)(0); k += 1 }
        acc
      }
    }(org.apache.spark.sql.Encoders.scalaLong).count()
    (System.nanoTime() - t0) / 1e9
  }

  /** One interleave slot: fresh session at `cores`, per-cluster dict
    * setup (untimed), TWO timed pipeline runs (min-of-2 — a fresh
    * session's first run pays ~0.5–5 s of session-local warmup
    * [FileIndex, codegen class loading, AQE stats]; measured directly
    * with ScalingProbe: local[8] run1 10.9 s vs run2 6.5 s. A fixed
    * penalty distorts the short side of the ratio far more than the
    * long side, so single-run slots bias eff DOWN), ONE timed
    * calibration run in the same session (same host conditions; the
    * calibration job shows no session-warmup sensitivity), session
    * stopped.
    */
  private def slot(cores: Int, corpusDir: String,
                   withCalib: Boolean): (Long, Double, Double) = {
    val s = session(cores)
    val dict = KgPipeline.dictDataset(s)
    val fnAliases = Extract.broadcastFnAliases(s, dict)
    val canonB = Canonicalize.broadcastLinkMap(s, dict)
    var triples = 0L
    val t = (1 to 2).map { _ =>
      val t0 = System.nanoTime()
      triples = kgTriples(s, corpusDir, fnAliases, canonB)
      (System.nanoTime() - t0) / 1e9
    }.min
    val c = if (withCalib) calibRun(s) else Double.NaN
    s.stop()
    (triples, t, c)
  }

  case class Round(tLow: Double, tHigh: Double, cLow: Double, cHigh: Double) {
    def eff: Double = (tLow / tHigh) / 4.0
    def ceil: Double = (cLow / cHigh) / 4.0
    def neff: Double = eff / ceil
  }

  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2) else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
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

    // ---- part 2: KG throughput scaling ----
    val nFiles = math.max(8000, (sf * 4000000).toInt)
    val corpusDir = s"/tmp/graft_bench_corpus_$nFiles"
    val skewDir = s"/tmp/graft_bench_corpus_skew_$nFiles"
    if (!new java.io.File(corpusDir).exists()) {
      import suiteSpark.implicits._
      suiteSpark.range(nFiles).repartition(64)
        .mapPartitions(_.map(i => fixtures.CorpusGen.genFile(i.toInt, nFiles)))
        .toDF().write.mode("overwrite").parquet(corpusDir)
    }
    if (!new java.io.File(skewDir).exists()) {
      // same files, CLUSTERED BY REPO on disk: the mega-repo (~50% of all
      // rows, CorpusGen.repoOf) collapses into ONE hot file — the
      // input-skew shape a crawl of real repositories produces. The
      // parquet writer's memory-estimate flush yields ~6 row groups
      // (~6 MB compressed / ~34k rows each) for the hot file at this
      // content size; the 4 MB maxPartitionBytes in `session` puts each
      // group in its own scan split, so the hot repo parallelizes at
      // row-group grain.
      suiteSpark.read.parquet(corpusDir)
        .repartition(col("repo"))
        .write.mode("overwrite").parquet(skewDir)
    }
    suiteSpark.stop()

    var nTriples = 0L
    /** One estimator round: slots interleave (high, low) × reps so a
      * steal window lands on both configs; min-of-reps per side.
      */
    def round(low: Int, high: Int, dir: String, reps: Int,
              withCalib: Boolean): Round = {
      var tLo, tHi, cLo, cHi = Double.MaxValue
      for (_ <- 1 to reps) {
        val (n1, a, ca) = slot(high, dir, withCalib); nTriples = n1
        val (_, b, cb) = slot(low, dir, withCalib)
        tHi = math.min(tHi, a); tLo = math.min(tLo, b)
        if (withCalib) { cHi = math.min(cHi, ca); cLo = math.min(cLo, cb) }
      }
      Round(tLo, tHi, if (withCalib) cLo else Double.NaN,
        if (withCalib) cHi else Double.NaN)
    }

    // warmup (JIT + page cache for the corpus), discarded
    slot(8, corpusDir, withCalib = false)
    slot(2, corpusDir, withCalib = false)

    // headline: 9 rounds, 2→8, interleaved min-of-3, with calibration
    val rounds28 = (1 to 9).map(_ => round(2, 8, corpusDir, 3, withCalib = true))
    val t2 = rounds28.map(_.tLow).min
    val t8 = rounds28.map(_.tHigh).min
    // skew block: 3 rounds over the repo-clustered corpus (one A/B slot
    // pair per round; each slot is already min-of-2 runs)
    val roundsSkew = (1 to 3).map(_ => round(2, 8, skewDir, 1, withCalib = false))
    // context: saturated 4→16 geometry, 2 rounds
    val rounds416 = (1 to 2).map(_ => round(4, 16, corpusDir, 1, withCalib = true))
    val t4 = rounds416.map(_.tLow).min
    val t16 = rounds416.map(_.tHigh).min

    // ---- emit one JSON line ----
    def f(d: Double): String =
      if (d.isNaN || d.isInfinite) "null"
      else String.format(java.util.Locale.ROOT, "%.6f", Double.box(d))
    val extra = Seq(
      "kg_bench_files" -> nFiles.toDouble, "kg_bench_triples" -> nTriples.toDouble,
      "kg_sec_at_n2" -> t2, "kg_sec_at_n8" -> t8,
      "kg_thr_at_n2" -> nTriples / t2, "kg_thr_at_n8" -> nTriples / t8,
      "kg_sec_at_n4" -> t4, "kg_sec_at_n16" -> t16,
      "kg_thr_at_n4" -> nTriples / t4, "kg_thr_at_n16" -> nTriples / t16,
      // headline: median raw efficiency at the equal-clock 2→8 geometry
      "kg_scaling_efficiency" -> median(rounds28.map(_.eff)),
      "kg_scaling_efficiency_min" -> rounds28.map(_.eff).min,
      "kg_scaling_efficiency_max" -> rounds28.map(_.eff).max,
      // pre-registered secondary: per-round eff normalized by the round's
      // own calibration ceiling (BENCH/BASELINE.md §"Scaling protocol")
      "kg_scaling_efficiency_normalized" -> median(rounds28.map(_.neff)),
      "hw_ceiling_efficiency_median" -> median(rounds28.map(_.ceil)),
      // skew block: same estimator, repo-clustered input
      "kg_scaling_efficiency_skew" -> median(roundsSkew.map(_.eff)),
      // context: the saturated 4→16 geometry and its hardware ceiling
      "kg_scaling_efficiency_4_16" -> median(rounds416.map(_.eff)),
      "hw_ceiling_efficiency_4_16" -> median(rounds416.map(_.ceil)))
    val qs = (results.map { case (k, (t, _)) => k -> t } ++ extra)
      .map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val detail = results.map { case (k, (t, ok)) =>
      "\"" + k + "\":{\"time\":" + f(t) + ",\"ok\":" + ok + "}"
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, (_, false)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    def roundsJson(rs: Seq[Round], lo: Int, hi: Int, calib: Boolean): String = rs.map { r =>
      val base = s"""{"t$lo":${f(r.tLow)},"t$hi":${f(r.tHigh)},"eff":${f(r.eff)}"""
      if (calib)
        base + s""","c$lo":${f(r.cLow)},"c$hi":${f(r.cHigh)},""" +
          s""""ceil":${f(r.ceil)},"neff":${f(r.neff)}}"""
      else base + "}"
    }.mkString("[", ",", "]")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec",""" +
      s""""queries":$qs,"queries_detail":$detail,"failed_queries":$failed,""" +
      s""""scaling_rounds":${roundsJson(rounds28, 2, 8, calib = true)},""" +
      s""""scaling_rounds_skew":${roundsJson(roundsSkew, 2, 8, calib = false)},""" +
      s""""scaling_rounds_4_16":${roundsJson(rounds416, 4, 16, calib = true)},"sf":"$sfDir"}""")
  }
}
