package graft

/** Contract tests for the round-5 repetition-ratio quality gate: the
  * oracle proves engine-equivalence; this proves the gate semantics
  * against a local brute-force recompute and asserts the zero-shuffle
  * plan shape the 100 TB story depends on.
  */
class TextOpsSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"
  private def q = queries.TextQueries.entries("text_repetition").fn(spark, d)
  private def tq(name: String) = queries.TextQueries.entries(name).fn(spark, d)

  private lazy val docs = {
    import spark.implicits._
    spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
  }

  test("text_repetition: matches brute-force top-word count; no Exchange") {
    import spark.implicits._
    val got = q.as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val docs = spark.read.parquet(s"$d/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expect = docs.map { case (id, t) =>
      val w = t.split(" ")
      id -> (w.groupBy(identity).values.map(_.length.toLong).max, w.length.toLong)
    }.filter { case (_, (m, n)) => m * 10 >= n }.toMap
    assert(got == expect, s"gate mismatch: ${got.size} vs ${expect.size} docs")
    assert(expect.nonEmpty, "tiny-sf corpus must trip the gate somewhere")
    // per-row higher-order counting — the whole plan is scan+project+filter
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"),
      "repetition gate must not shuffle")
  }

  test("text_inverted_index: df exact, postings = 100 smallest doc ids") {
    import spark.implicits._
    // sf0.01: 500 docs over a 31-word vocab, so common terms have
    // df ≈ 450 — the only sf where the posting cap is actually exercised
    val d01 = "/root/testdata/sf0.01"
    val got = queries.TextQueries.entries("text_inverted_index").fn(spark, d01)
      .as[(String, Long, Seq[Long])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val docs01 = spark.read.parquet(s"$d01/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expect = docs01
      .flatMap { case (id, t) => t.split(" ", -1).distinct.map(_ -> id) }
      .groupBy(_._1).map { case (term, occ) =>
        val ids = occ.map(_._2).distinct.sorted
        term -> (ids.length.toLong, ids.take(100).toSeq)
      }
    assert(got == expect)
    // the combiner cap must be exercised: some term has df > 100, and
    // its postings list is exactly 100 long while df stays exact
    val capped = got.filter(_._2._1 > 100)
    assert(capped.nonEmpty, "tiny-sf corpus must have a term with df > 100")
    assert(capped.values.forall(_._2.length == 100))
    // the 100 TB contract: the row_number<=100 filter must run as a
    // PARTIAL WindowGroupLimit below the exchange, so a stopword's
    // corpus-sized posting list never crosses one task
    val plan = queries.TextQueries.entries("text_inverted_index")
      .fn(spark, d01).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"expected a Partial WindowGroupLimit:\n$plan")
  }

  test("text_inverted_index_str: stringified twin equals the array key; " +
    "posting cap keeps the Partial WindowGroupLimit") {
    import spark.implicits._
    val d01 = "/root/testdata/sf0.01"
    val arr = queries.TextQueries.entries("text_inverted_index").fn(spark, d01)
      .as[(String, Long, Seq[Long])].collect()
      .map(r => (r._1, r._2, r._3.mkString(","))).toSet
    val str = queries.TextQueries.entries("text_inverted_index_str")
      .fn(spark, d01).as[(String, Long, String)].collect().toSet
    assert(str == arr)
    val plan = queries.TextQueries.entries("text_inverted_index_str")
      .fn(spark, d01).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit") && plan.contains("Partial"),
      s"expected a Partial WindowGroupLimit:\n$plan")
  }

  test("text_chunk_overlap: stride-4 width-6 windows; full word coverage") {
    import spark.implicits._
    val got = tq("text_chunk_overlap").as[(Long, Long, String, Long)]
      .collect().toSet
    val expect = docs.flatMap { case (id, t) =>
      val ws = t.split(" ", -1)
      (0 until ws.length by 4).zipWithIndex.map { case (start, idx) =>
        val chunk = ws.slice(start, start + 6)
        (id, idx.toLong, chunk.mkString(" "), chunk.length.toLong)
      }
    }.toSet
    assert(got == expect)
    // overlap rule: stride < width, so chunk k shares its last 2 words
    // with chunk k+1's first 2 (except truncated tails)
    val full = got.filter(_._4 == 6)
    assert(full.nonEmpty && got.exists(_._4 < 6),
      "corpus must exercise both full and truncated-tail chunks")
  }

  test("dedup_incremental: batch survivors have no bag-key twin in corpus") {
    import spark.implicits._
    val got = queries.DedupQueries.entries("dedup_incremental").fn(spark, d)
      .as[(Long, String)].collect().map(r => r._1 -> r._2).toMap
    val normKey = (t: String) => t.split(" ", -1).distinct.sorted.mkString(" ")
    val corpusKeys = docs.filter(_._1 % 10 != 7).map(x => normKey(x._2)).toSet
    val expect = docs.filter(_._1 % 10 == 7)
      .filter(x => !corpusKeys(normKey(x._2))).map(_._1).toSet
    assert(got.keySet == expect)
    val batchSize = docs.count(_._1 % 10 == 7)
    assert(got.size < batchSize, "some batch doc must be a corpus near-dup")
  }

  test("text_unigram_logprob: matches a local unigram model recompute") {
    import spark.implicits._
    val got = tq("text_unigram_logprob").as[(Long, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val allWords = docs.flatMap(_._2.split(" ", -1))
    val cnt = allWords.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tot = allWords.length.toDouble
    val expect = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      id -> (ws.length.toLong,
        ws.map(w => math.round(math.log(cnt(w) / tot) * 1000000)).sum)
    }.toMap
    assert(got == expect)
    // log-probs are strictly negative and rarer-word docs score lower
    assert(got.values.forall(_._2 < 0))
  }

  test("text_bm25: matches a local recompute (fixed-point micro sum)") {
    import spark.implicits._
    val got = tq("text_bm25").as[(Long, Long)].collect().toMap
    val queryTerms = Set("spark", "dup", "merge")
    val dls = docs.map { case (id, t) => id -> t.split(" ", -1).length.toLong }.toMap
    val n = docs.length.toLong
    val sumdl = dls.values.sum.toDouble
    val tf = docs.flatMap { case (id, t) =>
      t.split(" ", -1).filter(queryTerms).groupBy(identity)
        .map { case (w, ws) => (id, w, ws.length.toLong) }
    }
    val df = tf.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val expect = tf.groupBy(_._1).map { case (id, ts) =>
      id -> ts.map { case (_, term, f) =>
        val idf = math.log((n - df(term) + 0.5) / (df(term) + 0.5) + 1.0)
        val denom = f + 1.2 * (0.25 + 0.75 * dls(id) / (sumdl / n))
        math.round(idf * (f * 2.2) / denom * 1000000)
      }.sum
    }
    assert(got == expect)
    // rare term must out-score common terms for comparable tf: the doc
    // set containing 'dup' should include a top scorer
    assert(expect.nonEmpty && expect.values.max > 0)
  }

  test("text_pii_redact: matches a local regex recompute; no Exchange") {
    import spark.implicits._
    val q = tq("text_pii_redact")
    val got = q.as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    def sha256hex(s: String): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z][a-z]+".r
    val phoneRe = "555-[0-9][0-9][0-9][0-9]".r
    val expect = docs.map { case (id, t) =>
      val email = "u" + sha256hex(t).take(6) + "@ex.com "
      val pii = t + " " + email * (id % 3).toInt +
        (if (id % 2 == 0) "call 555-" + f"${id % 10000}%04d" else "")
      val red = phoneRe.replaceAllIn(
        emailRe.replaceAllIn(pii, "<EMAIL>"), "<PHONE>")
      id -> (emailRe.findAllIn(pii).size, phoneRe.findAllIn(pii).size, red)
    }.toMap
    assert(got == expect)
    // counts genuinely vary — the oracle is not a vacuous zero-match pass
    assert(got.values.map(_._1).toSet == Set(0, 1, 2))
    assert(got.values.map(_._2).toSet == Set(0, 1))
    assert(!q.queryExecution.executedPlan.toString.contains("Exchange"),
      "PII redaction is per-row — must not shuffle")
  }

  test("kg_cooccur_pmi: matches a local recompute; stats joins broadcast") {
    import spark.implicits._
    val q = queries.KgQueries.entries("kg_cooccur_pmi").fn(spark, d)
    val got = q.as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    val sets = docs.map { case (id, t) => id -> t.split(" ", -1).distinct }
    val n = sets.map(_._1).distinct.length.toLong
    val dfc = sets.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val expect = sets
      .flatMap { case (_, ws) =>
        for (a <- ws; b <- ws if a < b) yield (a, b)
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .filter(_._2 >= 5)
      .map { case ((w1, w2), c12) =>
        val pmi = math.log(n.toDouble * c12 / (dfc(w1) * dfc(w2).toDouble))
        (w1, w2) -> (c12, BigDecimal(pmi * 1000000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
    assert(got == expect)
    assert(got.nonEmpty, "support floor must keep some pairs at tiny sf")
    // doc-frequency and corpus-stat joins must broadcast (vocab-sized)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "PMI stats joins must broadcast")
  }

  test("kg_cooccur_pmi_cap: top-16 cap binds and matches a local recompute") {
    import spark.implicits._
    val q = queries.KgQueries.entries("kg_cooccur_pmi_cap").fn(spark, d)
    val got = q.as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // capped universe: per doc, top-16 terms by (tf desc, word asc)
    val sets = docs.map { case (id, t) =>
      val top = t.split(" ", -1).groupBy(identity).view
        .mapValues(_.length).toSeq
        .sortBy { case (w, f) => (-f, w) }.take(16).map(_._1)
      id -> top
    }
    assert(docs.exists(_._2.split(" ", -1).distinct.length > 16),
      "fixture must contain a doc where the cap actually prunes")
    val n = sets.length.toLong
    val dfc = sets.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val expect = sets
      .flatMap { case (_, ws) => for (a <- ws; b <- ws if a < b) yield (a, b) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
      .filter(_._2 >= 5)
      .map { case ((w1, w2), c12) =>
        val pmi = math.log(n.toDouble * c12 / (dfc(w1) * dfc(w2).toDouble))
        (w1, w2) -> (c12, BigDecimal(pmi * 1000000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      }
    assert(got == expect)
    // the cap is not an identity pass: pair support can only shrink
    val uncapped = queries.KgQueries.entries("kg_cooccur_pmi").fn(spark, d)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got.keySet.forall(k => got(k)._1 <= uncapped.getOrElse(k, 0L)),
      "capped pair support must never exceed uncapped")
    assert(got.size < uncapped.size, "cap must prune some pairs at vocab 31")
    // the rank filter must ride WindowGroupLimit (partial below the
    // exchange) — the property that bounds pair-gen on huge-vocab docs
    assert(q.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "top-16 cap must plan as a WindowGroupLimit")
  }
}
