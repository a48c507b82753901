package graft

import org.apache.spark.sql.Row

/** Determinism properties for the round-4 full-DAG oracle key
  * (kg_triples_counts): the compared output — including the
  * round(max(score), 6) column — must be invariant to shuffle
  * partitioning, because the driver hash-compares it against DuckDB and
  * a partitioning-sensitive aggregate would pass or fail by luck.
  * Complements the DuckDB oracle (which fixes the VALUES) by fixing the
  * INVariance.
  */
class KgCountsSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  private def runWithShufflePartitions(n: Int): Set[Row] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      SparkEntry.queries("kg_triples_counts")(spark, d).collect().toSet
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("kg_triples_counts is invariant to shuffle partitioning (1 vs 13)") {
    val a = runWithShufflePartitions(1)
    val b = runWithShufflePartitions(13)
    assert(a.nonEmpty)
    assert(a == b, s"partitioning changed the result: ${(a diff b).take(3)} vs ${(b diff a).take(3)}")
  }

  test("kg_triples_counts exercises every stage: all preds present, call scores non-trivial, canonicalization merges words") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("kg_triples_counts")(spark, d).cache()
    val preds = df.select("pred").distinct().collect().map(_.getString(0)).toSet
    assert(preds == Set("imports", "defines_function", "calls"), s"preds: $preds")
    // the logistic scorer's output must appear (not only score-1 rows),
    // and the >=0.5 keep-gate must actually bite (sf0.001 has 85 docs
    // with pad >= 38 whose sn-call is dropped)
    val callScores = df.filter(col("pred") === "calls")
      .select("max_score").distinct().count()
    assert(callScores > 5, s"expected a spread of logistic scores, got $callScores distinct")
    val minScore = df.agg(min("max_score")).head().getDouble(0)
    assert(minScore >= 0.5, f"keep-gate violated: $minScore%.6f")
    // canonicalization is non-trivial: some obj is not a raw corpus word
    // mapped to itself (i.e. the min-word-per-length link map actually
    // rewrote something) — detectable as fewer distinct objs than words
    val objs = df.filter(col("pred") === "imports")
      .select("obj").distinct().count()
    assert(objs >= 1 && objs <= 31, s"imports objs after canonicalization: $objs")
    df.unpersist()
    ()
  }
}
