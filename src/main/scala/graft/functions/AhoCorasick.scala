package graft.functions

/** Aho–Corasick multi-pattern string automaton (Aho & Corasick 1975,
  * public knowledge) for gazetteer scanning: find every occurrence of any
  * of N patterns in one pass over the text, O(text + matches), instead of
  * N regex passes. Built once on the driver, broadcast to executors
  * (flat int arrays — cheap to serialize, cache-friendly to run).
  *
  * Alphabet contract: the dense goto tables index chars 0x00–0xFF, so
  * `build` REJECTS patterns containing chars above U+00FF (Latin-1).
  * Text chars above U+00FF map to a dedicated sentinel class (index 256)
  * that can never match a pattern char — so non-Latin-1 TEXT scans
  * correctly (no mod-256 aliasing false matches), only PATTERNS are
  * restricted.
  *
  * `wholeWord = true` accepts a match only when both neighbors are
  * non-alphanumeric (token semantics over space-separated text — keeps
  * the operator exactly reproducible by a token-equality oracle).
  */
final class AhoCorasick private (
    goto_ : Array[Array[Int]], // node -> (char -> node), dense over byte alphabet
    fail: Array[Int],
    out: Array[List[Int]], // node -> pattern ids ending here
    val patterns: Array[String]) extends Serializable {

  /** All matches as (patternId, startOffset) — endOffset = start +
    * patterns(id).length.
    */
  def findAll(text: String, wholeWord: Boolean = true): List[(Int, Int)] = {
    var node = 0
    var i = 0
    val n = text.length
    val acc = List.newBuilder[(Int, Int)]
    def isWord(c: Char): Boolean = Character.isLetterOrDigit(c) || c == '_'
    while (i < n) {
      val ch = text.charAt(i)
      val c = if (ch > 0xff) AhoCorasick.Sentinel else ch.toInt
      node = goto_(node)(c)
      var o = out(node)
      while (o.nonEmpty) {
        val pid = o.head
        val start = i + 1 - patterns(pid).length
        val okLeft = !wholeWord || start == 0 || !isWord(text.charAt(start - 1))
        val okRight = !wholeWord || i + 1 == n || !isWord(text.charAt(i + 1))
        if (okLeft && okRight) acc += ((pid, start))
        o = o.tail
      }
      i += 1
    }
    acc.result()
  }
}

object AhoCorasick {

  /** Alphabet index reserved for text chars above U+00FF — never present
    * in any pattern, so it always transitions through failure links and
    * can never complete a match.
    */
  val Sentinel = 256
  private val AlphabetSize = 257

  /** Build the automaton (trie + BFS failure links, outputs merged along
    * failure chains; goto made total so the scan loop is branch-free).
    * Patterns must be Latin-1 (chars ≤ U+00FF) — see class doc.
    */
  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty), "patterns must be non-empty")
    require(patterns.forall(_.forall(_ <= 0xff)),
      "patterns must be Latin-1 (chars <= U+00FF); offending: " +
        patterns.filter(_.exists(_ > 0xff)).take(3).mkString(", "))
    val pats = patterns.toArray
    // trie
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Int, Int])
    val outs = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    for ((p, pid) <- pats.zipWithIndex) {
      var node = 0
      for (ch <- p) {
        val c = ch.toInt // <= 0xff by the require above
        node = children(node).getOrElseUpdate(c, {
          children += scala.collection.mutable.Map.empty[Int, Int]
          outs += List.empty[Int]
          children.size - 1
        })
      }
      outs(node) = pid :: outs(node)
    }
    val size = children.size
    val fail = new Array[Int](size)
    val goto_ = Array.tabulate(size)(n =>
      Array.fill(AlphabetSize)(-1))
    children(0).foreach { case (c, n) => goto_(0)(c) = n }
    for (c <- 0 until AlphabetSize) if (goto_(0)(c) < 0) goto_(0)(c) = 0
    // BFS: failure links + total goto + output merge
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).values.foreach { n => fail(n) = 0; queue += n }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outs(u) = outs(u) ++ outs(fail(u))
      for (c <- 0 until AlphabetSize) {
        val v = children(u).getOrElse(c, -1)
        if (v >= 0) {
          fail(v) = goto_(fail(u))(c)
          goto_(u)(c) = v
          queue += v
        } else {
          goto_(u)(c) = goto_(fail(u))(c)
        }
      }
    }
    new AhoCorasick(goto_, fail, outs.toArray.map(_.sorted), pats)
  }
}
