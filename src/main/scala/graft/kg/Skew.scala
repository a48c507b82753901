package graft.kg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for mega-repo hot keys (BASELINE.json:6,14 "salted
  * repartitioning"; SURVEY §4.3): a cheap first pass counts rows per key
  * (map-side-combined, tiny result), the driver broadcasts the hot-key
  * set, and only hot keys receive a deterministic salt — cold keys keep
  * salt 0 so their groups are never split unnecessarily. AQE skew-join
  * splitting complements this at runtime for joins.
  */
object Skew {

  /** Pass 1: keys whose row count exceeds `threshold`. */
  def hotKeys(df: DataFrame, key: String, threshold: Long): Set[String] =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .filter(col("n") > threshold)
      .select(col(key).cast("string"))
      .collect().map(_.getString(0)).toSet

  /** Pass 2: add a deterministic salt column — pmod(xxhash64(tiebreak), k)
    * for hot keys, 0 for the rest. `tiebreak` must be stable row identity
    * (never rand(): determinism under parallelism, SURVEY §4.3).
    */
  def withAdaptiveSalt(df: DataFrame, key: String, hot: Set[String],
                       k: Int, tiebreak: Column*): DataFrame = {
    val saltExpr =
      if (hot.isEmpty) lit(0L)
      else when(col(key).cast("string").isin(hot.toSeq: _*),
        pmod(xxhash64(tiebreak: _*), lit(k.toLong))).otherwise(lit(0L))
    df.withColumn("salt", saltExpr)
  }

  /** Salted two-phase count: groupBy(key, salt) partial → groupBy(key)
    * final. Result identical to a plain groupBy(key).count(); the hot
    * key's partial work is spread over k reducers.
    */
  def saltedCount(df: DataFrame, key: String, hot: Set[String], k: Int,
                  tiebreak: Column*): DataFrame =
    withAdaptiveSalt(df, key, hot, k, tiebreak: _*)
      .groupBy(col(key), col("salt")).agg(count(lit(1)).as("partial"))
      .groupBy(col(key)).agg(sum(col("partial")).as("n"))
}
