package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bucketed candidate-pair generation with a deterministic hot-bucket cap
  * (SURVEY J7; the scale guard every LSH bucket self-join needs).
  *
  * A bucket self-join is quadratic in the bucket size: one
  * 10⁶-copy boilerplate cluster would put 10¹² candidate pairs in a
  * single bucket. Buckets with at most `cap` members emit all C(n,2)
  * pairs; larger buckets emit only the rank-adjacent CHAIN (n-1 pairs,
  * members ordered by id) — preserving intra-bucket connectivity (what
  * connected-components consumers need) while bounding the candidate
  * count linearly in the bucket size. The cap decision and the chain are
  * pure integer logic over a total order, so the construction is
  * deterministic, partitioning-invariant, and exactly reproducible in
  * ANSI SQL (the oracled queries mirror it in DuckDB).
  */
object Lsh {

  /** Self-join `buckets` on `keyCols` with the hot-bucket cap.
    *
    * Output: one row per candidate pair with columns
    * `a_<idCol>, b_<idCol>` (ordered `a < b`) and `a_<c>, b_<c>` for each
    * carry column, distinct across buckets.
    */
  def cappedSelfJoinPairs(buckets: DataFrame, keyCols: Seq[String],
                          idCol: String, cap: Int,
                          carryCols: Seq[String] = Nil): DataFrame = {
    require(cap >= 2, s"cap must be >= 2, got $cap")
    val keyExprs = keyCols.map(col)
    val wRank = Window.partitionBy(keyExprs: _*).orderBy(col(idCol))
    val wBucket = Window.partitionBy(keyExprs: _*)
    val r = buckets
      .select((keyCols :+ idCol) ++ carryCols map col: _*)
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wBucket))
    val keyEq = keyCols.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
    // equi-join on the bucket key; the cap branch is a post-join filter
    // (rank-adjacency implies a.id < b.id because rn is ordered by id)
    val cond = keyEq && (
      (col("a.n") <= cap && col(s"a.$idCol") < col(s"b.$idCol")) ||
        (col("a.n") > cap && col("b.rn") === col("a.rn") + 1))
    val out = Seq(col(s"a.$idCol").as(s"a_$idCol"), col(s"b.$idCol").as(s"b_$idCol")) ++
      carryCols.flatMap(c => Seq(col(s"a.$c").as(s"a_$c"), col(s"b.$c").as(s"b_$c")))
    r.as("a").join(r.as("b"), cond)
      .select(out: _*)
      .distinct()
  }

  /** Dictionary-norm buckets (alias LSH): generous cap — the dictionary
    * is broadcast-scale by contract, the cap only guards against a
    * degenerate vocabulary collapsing into one bucket.
    */
  val DictBucketCap = 1000

  /** Document MinHash buckets: boilerplate clusters routinely exceed this
    * at corpus scale; the chain keeps every cluster member reachable.
    */
  val DocBucketCap = 128

  /** ANN probe lists: max bucket members scanned per query bucket. */
  val AnnBucketCap = 256
}
