package graft

import graft.functions.AhoCorasick

/** Aho-Corasick automaton unit properties (pure driver-side). */
class AhoCorasickSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("finds all occurrences including overlapping patterns") {
    val ac = AhoCorasick.build(Seq("he", "she", "his", "hers"))
    val got = ac.findAll("ushers", wholeWord = false)
      .map { case (pid, s) => (ac.patterns(pid), s) }.toSet
    assert(got == Set(("she", 1), ("he", 2), ("hers", 2)))
  }

  test("whole-word mode matches token semantics exactly") {
    val ac = AhoCorasick.build(Seq("a", "table", "tab"))
    val text = "a table on a tab not atable or tab_x"
    val got = ac.findAll(text).map { case (pid, s) => (ac.patterns(pid), s) }
    // "atable"/"tab_x" must not match; counts equal token equality
    val tokens = text.split(" ")
    def tokCount(w: String) = tokens.count(_ == w)
    val byPat = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(byPat == Map("a" -> tokCount("a"), "table" -> tokCount("table"),
      "tab" -> tokCount("tab")))
    // offsets point at real occurrences
    got.foreach { case (w, s) => assert(text.substring(s, s + w.length) == w) }
  }

  test("non-Latin-1 text never aliases into a false match; patterns rejected") {
    // U+0101 masked mod 256 would collide with U+0001 — the sentinel
    // class must keep out-of-range chars from ever completing a match
    val m = '\u0101'
    val ac = AhoCorasick.build(Seq("ab", "a"))
    val text = s"${m}b a$m \u0001b ab"
    val got = ac.findAll(text, wholeWord = false)
      .map { case (pid, s) => (ac.patterns(pid), s) }.toSet
    assert(got == Set(("a", 3), ("a", 9), ("ab", 9)), got.toString)
    // patterns above U+00FF violate the Latin-1 contract loudly
    intercept[IllegalArgumentException] { AhoCorasick.build(Seq(s"${m}b")) }
  }

  test("matches a brute-force scan on random word-salad text") {
    val rng = new scala.util.Random(5)
    val vocab = Vector("key", "agg", "row", "scan", "slow", "fast", "table", "value")
    val text = (0 until 500).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
    val pats = Seq("key", "scan", "table", "value", "fast")
    val ac = AhoCorasick.build(pats)
    val got = pats.map(p => p ->
      ac.findAll(text).count { case (pid, _) => ac.patterns(pid) == p }).toMap
    val want = pats.map(p => p -> text.split(" ").count(_ == p)).toMap
    assert(got == want)
  }
}
