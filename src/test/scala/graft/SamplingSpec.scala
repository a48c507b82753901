package graft

/** Semantic properties of the sampling/mixing/packing keys (round 5) —
  * the oracle gate proves engine-equivalence; these prove the
  * operators' CONTRACTS: reproducibility, the quota cap, and the bin
  * budget.
  */
class SamplingSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"
  private def q(name: String) = queries.SamplingQueries.entries(name).fn(spark, d)

  test("sample_hash: deterministic across runs, rate near 40/256, pushes to scan") {
    import spark.implicits._
    val a = q("sample_hash").as[(Long, String, Long)].collect().toSet
    val b = q("sample_hash").as[(Long, String, Long)].collect().toSet
    assert(a == b, "hash sampling must be rerun-stable")
    val total = spark.read.parquet(s"$d/documents.parquet").count()
    val rate = a.size.toDouble / total
    // 40/256 ≈ 0.156; sha256 is uniform, allow wide slack at tiny sf
    assert(rate > 0.05 && rate < 0.30, s"rate $rate far from 40/256")
    // the filter is a pure per-row predicate — no Exchange in the plan
    val hasExchange = q("sample_hash").queryExecution.executedPlan.toString
      .contains("Exchange")
    assert(!hasExchange, "hash sampling must not shuffle")
  }

  test("mix_quota: no source exceeds the cap; selection is hash-ranked") {
    import spark.implicits._
    val rows = q("mix_quota").as[(String, Long, Int)].collect()
    val bySrc = rows.groupBy(_._1)
    assert(bySrc.values.forall(_.length <= 10), "quota cap violated")
    // ranks within a source are 1..n with no gaps
    bySrc.values.foreach { g =>
      assert(g.map(_._3).sorted.toSeq == (1 to g.length), s"rank gap in $g")
    }
  }

  test("sample_stratified: en is downsampled hardest (rate en < de, zh); no shuffle") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val total = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = q("sample_stratified").as[(Long, String)].collect()
      .groupBy(_._2).view.mapValues(_.length.toLong).toMap
    def rate(l: String) = kept.getOrElse(l, 0L).toDouble / total(l)
    // thresholds 0x20/0x40/0x80 = 12.5% / 25% / 50%; wide slack at tiny sf
    assert(rate("en") < rate("de") && rate("en") < rate("zh"),
      s"en must be downsampled hardest: ${total.keys.map(l => l -> rate(l))}")
    assert(!q("sample_stratified").queryExecution.executedPlan.toString
      .contains("Exchange"), "stratified sampling must not shuffle")
  }

  test("mix_temperature: quota = min(n, floor(sqrt(n)*8)) per language, hash-ranked") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val n = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val rows = q("mix_temperature").as[(String, Long, Int)].collect()
    rows.groupBy(_._1).foreach { case (lang, g) =>
      val quota = math.min(n(lang), math.floor(math.sqrt(n(lang).toDouble) * 8).toLong)
      assert(g.length == quota, s"$lang: got ${g.length}, quota $quota")
      assert(g.map(_._3).sorted.toSeq == (1 to g.length), s"rank gap in $lang")
    }
    // tail boost: the kept FRACTION of a rare language exceeds a common one's
    val de = rows.count(_._1 == "de").toDouble / n("de")
    val en = rows.count(_._1 == "en").toDouble / n("en")
    assert(de > en, s"temperature must flatten the mix (de $de vs en $en)")
  }

  test("mix keys: histogram prune is exact (equals the naive window) and " +
    "the rank window runs over the pruned set") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.SparkPlan
    def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case _ => p +: p.children.flatMap(allNodes)
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    // naive recompute of mix_quota: full window over the corpus
    val wNaive = Window.partitionBy("source")
      .orderBy(sha2(col("doc_id").cast("string"), 256), col("doc_id"))
    val naive = docs.withColumn("rk", row_number().over(wNaive))
      .filter(col("rk") <= 10).select("source", "doc_id", "rk")
      .collect().map(_.toSeq).toSet
    val pruned = q("mix_quota").collect().map(_.toSeq).toSet
    assert(pruned == naive, "histogram prune must be byte-identical to the naive window")
    for (key <- Seq("mix_quota", "mix_temperature")) {
      val df = q(key)
      df.count() // finalize AQE
      // the row_number window that produces rk must sit ABOVE a filter
      // on the histogram cut (pfx <= cut_pfx), i.e. its input is the
      // quota-scale survivor set, not the corpus
      val rankWindows = allNodes(df.queryExecution.executedPlan)
        .collect { case w: WindowExec if w.output.exists(_.name == "rk") => w }
      assert(rankWindows.nonEmpty, s"$key: no rank window in plan")
      rankWindows.foreach { w =>
        val below = allNodes(w.child).map(_.toString).mkString("\n")
        assert(below.contains("cut_pfx"),
          s"$key: rank window input is not the pruned survivor set:\n$below")
      }
    }
  }

  test("sample_split: total partition, disjoint, stable under corpus growth, no shuffle") {
    import spark.implicits._
    val rows = q("sample_split").as[(Long, String, String)].collect()
    val total = spark.read.parquet(s"$d/documents.parquet").count()
    assert(rows.length == total, "split must assign EVERY doc")
    assert(rows.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    val byId = rows.map(r => r._1 -> r._3).toMap
    assert(byId.size == total, "one label per doc")
    // growth-stability: the label is a pure function of the doc's own id,
    // so recomputing on any SUBSET reproduces the same labels
    val sub = q("sample_split").filter("doc_id % 2 = 0")
      .as[(Long, String, String)].collect()
    assert(sub.forall { case (id, _, s) => byId(id) == s })
    // rough rates: test and val each ~10/256, train the rest
    val frac = rows.groupBy(_._3).view.mapValues(_.length.toDouble / total).toMap
    assert(frac("train") > 0.85 && frac.getOrElse("test", 0.0) < 0.12)
    assert(!q("sample_split").queryExecution.executedPlan.toString
      .contains("Exchange"), "split assignment must not shuffle")
  }

  test("decontam_ngram: every flagged doc shares a 3-gram with the eval slice; eval excluded") {
    import spark.implicits._
    val flagged = q("decontam_ngram").as[(Long, Long)].collect()
    assert(flagged.nonEmpty, "tiny-sf corpus must have contaminated docs")
    assert(flagged.forall(_._1 % 97 != 0), "eval docs must not flag themselves")
    assert(flagged.forall(_._2 >= 1))
    // recompute one doc's grams locally and verify the overlap is real
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def grams(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val evalGrams = docs.collect { case (id, t) if id % 97 == 0 => grams(t) }
      .foldLeft(Set.empty[String])(_ ++ _)
    val (sampleId, nHit) = flagged.minBy(_._1)
    assert(grams(docs(sampleId)).count(evalGrams.contains) == nHit,
      s"doc $sampleId: local recompute disagrees with n_hit=$nHit")
  }

  test("pack_chunks: bins respect the budget up to one overflowing doc") {
    import spark.implicits._
    val rows = q("pack_chunks").as[(String, Long, Long, Long)].collect()
    val maxDoc = rows.map(_._3).max
    rows.groupBy(r => (r._1, r._4)).foreach { case (bin, docs) =>
      val sz = docs.map(_._3).sum
      // a doc is placed in the bin where its PREFIX starts, so a bin can
      // exceed the budget only by the tail of its last doc
      assert(sz < 1000 + maxDoc, s"bin $bin holds $sz chars")
    }
    // bins are contiguous per source starting at 0
    rows.groupBy(_._1).values.foreach { g =>
      val bins = g.map(_._4).distinct.sorted.toSeq
      assert(bins.head == 0L && bins == (bins.head to bins.last),
        s"non-contiguous bins $bins")
    }
  }
}
