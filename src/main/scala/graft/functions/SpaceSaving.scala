package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi 2005)
  * as a typed Aggregator: the "what are the hot keys" primitive that at
  * 100 TB replaces a full groupBy when only the top of the frequency
  * distribution matters (hot-key detection for salting, stopword
  * discovery, skew diagnostics). Capacity-k summary per partition,
  * merged with the mergeable-summaries rule (Agarwal et al. 2012):
  * absence from a full side contributes that side's min count, so kept
  * estimates stay upper bounds across merges; the union is then
  * trimmed to the top k.
  *
  * Guarantees, as tested:
  *  - capacity ≥ distinct(keys): NO eviction can occur on update or
  *    merge, every path is plain counting, the result is EXACT and
  *    deterministic under any partitioning — which is what puts the
  *    `agg_heavyhitters` query key under a bit-exact DuckDB oracle
  *    (31-word vocab, k = 64).
  *  - capacity < distinct: single-pass SpaceSaving bounds the
  *    overestimate of any item by N/k (Metwally '05 Thm 1); the
  *    property spec asserts the bound empirically on a skewed stream
  *    including across-partition merges.
  *
  * State is a term → (count, err) map; eviction picks the minimum
  * (count, term) slot so ties never make the result partition-order
  * dependent.
  */
object SpaceSaving {

  type Slots = Map[String, (Long, Long)]

  def aggregator(k: Int): Aggregator[String, Slots, Map[String, Long]] =
    new Aggregator[String, Slots, Map[String, Long]] {
      override def zero: Slots = Map.empty

      override def reduce(b: Slots, term: String): Slots =
        b.get(term) match {
          case Some((c, e)) => b.updated(term, (c + 1, e))
          case None if b.size < k => b.updated(term, (1L, 0L))
          case None =>
            // evict the min-count slot (term asc tie-break: determinism);
            // the newcomer inherits the evicted count as its error floor
            val (mt, (mc, _)) = b.minBy { case (t, (c, _)) => (c, t) }
            (b - mt).updated(term, (mc + 1, mc))
        }

      override def merge(b1: Slots, b2: Slots): Slots = {
        // mergeable-summaries rule (Agarwal et al. 2012): a FULL side
        // can have absorbed an absent term into its min slot, so
        // absence from a full side contributes that side's min count
        // (as both estimate and error); absence from a non-full side
        // means a true zero there. Kept estimates therefore remain
        // UPPER bounds across merges, and trimming the union to top-k
        // leaves kept items' counts untouched.
        val m1 = if (b1.size >= k) b1.valuesIterator.map(_._1).min else 0L
        val m2 = if (b2.size >= k) b2.valuesIterator.map(_._1).min else 0L
        val u = (b1.keySet ++ b2.keySet).iterator.map { t =>
          val (c1, e1) = b1.getOrElse(t, (m1, m1))
          val (c2, e2) = b2.getOrElse(t, (m2, m2))
          t -> (c1 + c2, e1 + e2)
        }.toMap
        if (u.size <= k) u
        else u.toSeq.sortBy { case (t, (c, _)) => (-c, t) }.take(k).toMap
      }

      override def finish(r: Slots): Map[String, Long] =
        r.map { case (t, (c, _)) => t -> c }

      override def bufferEncoder: Encoder[Slots] = Encoders.kryo[Slots]
      override def outputEncoder: Encoder[Map[String, Long]] =
        ExpressionEncoder[Map[String, Long]]()
    }

  /** space_saving(k)(col): heavy-hitters estimate map over a string
    * column.
    */
  def fn(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udaf(aggregator(k))

  def apply(k: Int)(c: Column): Column = fn(k)(c)
}
