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
    val out = Seq(col(s"a.$idCol").as(s"a_$idCol"), col(s"b.$idCol").as(s"b_$idCol")) ++
      carryCols.flatMap(c => Seq(col(s"a.$c").as(s"a_$c"), col(s"b.$c").as(s"b_$c")))
    val keyEq = keyCols.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
    // Two joins so the cap bounds JOIN COST, not just output size:
    // a post-join rank filter would still materialize C(n,2) matches for
    // a hot bucket inside the join. Small buckets: plain key equi-join.
    // Big buckets: rank-adjacency is part of the EQUI-JOIN key
    // ((key, rn+1) = (key, rn)) — linear matches by construction.
    // (rank-adjacency implies a.id < b.id because rn is ordered by id.)
    val small = r.where(col("n") <= cap)
    val smallPairs = small.as("a").join(small.as("b"),
      keyEq && col(s"a.$idCol") < col(s"b.$idCol"))
    val big = r.where(col("n") > cap)
    val bigPairs = big.withColumn("rn_next", col("rn") + 1).as("a")
      .join(big.as("b"), keyEq && col("a.rn_next") === col("b.rn"))
    smallPairs.select(out: _*)
      .unionAll(bigPairs.select(out: _*))
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
