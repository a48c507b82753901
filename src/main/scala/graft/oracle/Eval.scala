package graft.oracle

import Oracle.GTriple

/** Cluster-aware fuzzy evaluation (the reference's eval semantics): a
  * predicted triple matches a gold triple when the two agree after
  * mapping every symbol through its name-normalized alias CLUSTER — so a
  * system that emits a different alias of the right entity is still
  * correct, while a wrong entity never matches. Exact set-compare after
  * canonicalization (the e2e gate) is the strict special case; this
  * tolerates alias-level divergence between systems that canonicalize
  * differently (or not at all).
  */
object Eval {

  /** Map a symbol to its cluster representative: normalize, then follow
    * the norm→canonical cluster map; symbols outside the dictionary
    * represent themselves (normalized).
    */
  def clusterKey(sym: String, canon: Map[String, String]): String = {
    val n = Oracle.norm(sym)
    canon.getOrElse(n, n)
  }

  private def keyed(ts: Iterable[GTriple], canon: Map[String, String]): Set[(String, String, String, String, String, String, String)] =
    ts.map(t => (clusterKey(t.subj, canon), t.pred, clusterKey(t.obj, canon),
      t.repo, t.path, t.commit, t.fileSha)).toSet

  /** Cluster-aware precision/recall. `canon` is the alias-cluster map
    * (Oracle.canonicalMap over the same dictionary both systems used).
    */
  def clusterPR(predicted: Iterable[GTriple], gold: Iterable[GTriple],
                canon: Map[String, String]): (Double, Double) = {
    val p = keyed(predicted, canon)
    val g = keyed(gold, canon)
    val tp = (p intersect g).size.toDouble
    val precision = if (p.isEmpty) 0.0 else tp / p.size
    val recall = if (g.isEmpty) 0.0 else tp / g.size
    (precision, recall)
  }
}
