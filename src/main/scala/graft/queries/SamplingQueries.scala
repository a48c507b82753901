package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.t

/** Training-data sampling & mixing operators (round 5) — the selection
  * stage a large-scale pretraining pipeline runs AFTER dedup/quality
  * filtering and BEFORE tokenization: reproducible subsampling, data-mix
  * quota capping per source, and sequence packing. All three are
  * deterministic pure functions of the input (no rand()), which is what
  * makes them re-runnable over a 100 TB corpus — a backfill or a
  * partial re-crawl reproduces byte-identical selections — and makes
  * them DuckDB-oracle-able under the driver's rows+schema+hash gate.
  *
  * Both engines compute sha256 as lowercase hex, so hex-string
  * comparison and hex-string ORDER BY are identical (same trick the
  * simhash keys rely on; ASCII ordering == byte ordering here).
  */
object SamplingQueries {

  private val shaId = "sha256(CAST(doc_id AS VARCHAR))"

  val entries: Map[String, Q] = Map(

    // Reproducible Bernoulli sampling keyed on a STABLE id hash — the
    // web-scale idiom (rand() is non-reproducible across reruns and
    // executors; hash-threshold sampling is a pure per-row filter that
    // pushes down to the scan and needs no shuffle at any corpus size).
    // First 2 hex chars < '28' keeps 0x00..0x27 = 40/256 ≈ 15.6%.
    "sample_hash" -> Q.withOracle(
      s"""SELECT doc_id, lang, n_chars FROM documents
        |WHERE substr($shaId, 1, 2) < '28'""".stripMargin)(
      (s, d) => t(s, d, "documents")
        .filter(substring(sha2(col("doc_id").cast("string"), 256), 1, 2) < "28")
        .select("doc_id", "lang", "n_chars")),

    // Data-mix quota: cap every source's contribution at 10 docs,
    // chosen by deterministic hash priority (not "first 10" — arrival
    // order is a crawl artifact; hash order is an unbiased shuffle that
    // is still reproducible). The window partitions by source, so at
    // 100 TB the shuffle key is the mix dimension itself — per-source
    // groups are processed independently and a hot source costs only
    // its own top-k, not a global sort.
    "mix_quota" -> Q.withOracle(
      s"""SELECT source, doc_id, rk FROM (
        |  SELECT source, doc_id,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY $shaId, doc_id) AS rk
        |  FROM documents) WHERE rk <= 10""".stripMargin)(
      (s, d) => {
        val w = Window.partitionBy("source")
          .orderBy(sha2(col("doc_id").cast("string"), 256), col("doc_id"))
        t(s, d, "documents")
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
          .select("source", "doc_id", "rk")
      }),

    // Sequence packing: assign docs to fixed-budget bins (1000 chars —
    // stand-in for the token budget of a training sequence) by running
    // per-source cumulative size; bin = floor((cumsum − own)/budget),
    // i.e. a doc starts a new bin when the budget is exhausted. Packing
    // within the source partition is the scale path (a global pack
    // would be a single-partition sort; production packs within shards
    // exactly like this). Integer cumsum is exact in double far beyond
    // any real partition size, so floor(x/1000.0) is bit-identical in
    // both engines.
    "pack_chunks" -> Q.withOracle(
      """SELECT source, doc_id, n_chars,
        |       CAST(floor((sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars)
        |         / 1000.0) AS BIGINT) AS bin
        |FROM documents""".stripMargin)(
      (s, d) => {
        val w = Window.partitionBy("source").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, d, "documents")
          .withColumn("bin",
            floor((sum(col("n_chars")).over(w) - col("n_chars")) / 1000.0)
              .cast("bigint"))
          .select("source", "doc_id", "n_chars", "bin")
      })
  )
}
