package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.Vocab
import graft.oracle.Oracle

/** Guards the SPEC.md §4 decidability guarantee: no two norms of
  * DIFFERENT entities are within levenshtein 1 — so alias clusters are
  * exactly entities, for both the engine's LSH+CC path and the oracle's
  * exhaustive union-find.
  */
class VocabSpec extends AnyFunSuite {

  test("cross-entity norm pairs all have levenshtein >= 2") {
    val byNorm = Vocab.dictRows.groupBy(_._1)
    // a norm must not belong to two entities
    byNorm.foreach { case (n, rows) =>
      assert(rows.map(_._2).distinct.size == 1, s"norm '$n' is ambiguous")
    }
    val norms = Vocab.dictRows.map(r => (r._1, r._2)).distinct
    var violations = List.empty[(String, String)]
    for (i <- norms.indices; j <- (i + 1) until norms.size) {
      val (a, ea) = norms(i); val (b, eb) = norms(j)
      if (ea != eb && math.abs(a.length - b.length) <= 1 &&
          Oracle.levenshtein(a, b) <= 1)
        violations ::= (a, b)
    }
    assert(violations.isEmpty, s"cross-entity lev<=1 pairs: $violations")
  }

  test("alias clusters resolve to their own canonical") {
    val canon = Oracle.canonicalMap(Vocab.dictRows)
    Vocab.dictRows.foreach { case (norm, _, canonical, _) =>
      assert(canon(norm) == canonical,
        s"norm '$norm' resolved to '${canon(norm)}', expected '$canonical'")
    }
  }

  test("generated corpus is deterministic") {
    val a = graft.fixtures.CorpusGen.corpus(60)
    val b = graft.fixtures.CorpusGen.corpus(60)
    assert(a == b)
    assert(a.map(f => s"${f.repo}/${f.path}").distinct.size == 60)
  }
}
