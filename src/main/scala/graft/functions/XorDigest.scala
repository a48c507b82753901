package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Commutative content digest (SURVEY A7/T4): xor-fold of 64-bit hashes.
  * Xor is commutative + associative, so the digest is invariant under row
  * order AND partitioning — the property that makes N-core and 4N-core
  * runs byte-comparable (BASELINE.json:2) and lineage digests stable
  * across resumes (BASELINE.json:6).
  *
  * Registered as a UDAF over a pre-hashed Long column (pair with
  * `xxhash64(...)`); DuckDB oracle surrogate: `bit_xor(...)`.
  */
object XorDigest {
  private val agg: Aggregator[java.lang.Long, Long, Long] =
    new Aggregator[java.lang.Long, Long, Long] {
      override def zero: Long = 0L
      override def reduce(b: Long, a: java.lang.Long): Long =
        if (a == null) b else b ^ a.longValue()
      override def merge(b1: Long, b2: Long): Long = b1 ^ b2
      override def finish(r: Long): Long = r
      override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  /** xor_digest(col): commutative xor-fold aggregate of a Long column. */
  val fn: org.apache.spark.sql.expressions.UserDefinedFunction = udaf(agg)

  def apply(c: Column): Column = fn(c)
}
