package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.kg.{Canonicalize, Extract, HashedFile, KgPipeline}
import Tables.{corpus, t}

/** KG-pipeline operator demonstrations (SURVEY §2.8 typed ops + S2).
  * These run the engine's own stages over the deterministic synthetic
  * corpus scaled to the testdata sf; semantics are not DuckDB-expressible
  * (no-oracle — covered by the unit/property/golden layers instead).
  */
object KgQueries {

  private def hashedCorpus(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    corpus(s, d)
      .withColumn("file_sha", sha2(col("content"), 256))
      .as[HashedFile]
  }

  val entries: Map[String, Q] = Map(

    // S2: reference-format JSON ingest — to_json/from_json round trip
    // with an explicit schema (never inference-on-trust); oracle is the
    // identity projection
    "json_ingest" -> Q.withOracle(
      "SELECT doc_id, lang, n_chars FROM documents")(
      (s, d) => {
        val schema = StructType(Seq(
          StructField("doc_id", LongType), StructField("lang", StringType),
          StructField("n_chars", LongType)))
        t(s, d, "documents")
          .select(to_json(struct(col("doc_id"), col("lang"), col("n_chars"))).as("j"))
          .select(from_json(col("j"), schema).as("r"))
          .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
            col("r.n_chars").as("n_chars"))
      }),

    // T1: broadcast-dictionary mention scanner (typed flatMap UDTF-style)
    "udtf_mentions" -> Q.noOracle((s, d) => {
      val dict = KgPipeline.dictDataset(s)
      Extract.mentions(hashedCorpus(s, d), Extract.broadcastFnAliases(s, dict)).toDF()
    }),

    // full stage-1..4 DAG to canonicalized triples (bench headline)
    "kg_triples" -> Q.noOracle((s, d) => {
      val dict = KgPipeline.dictDataset(s)
      val rels = Extract.scoredRelations(hashedCorpus(s, d),
        Extract.broadcastFnAliases(s, dict))
      Canonicalize.toTriples(rels, Canonicalize.linkMap(dict)).toDF()
    }),

    // J7: MinHash-LSH blocking over dictionary aliases
    "join_lsh_block" -> Q.noOracle((s, d) =>
      Canonicalize.lshEdges(KgPipeline.dictDataset(s))),

    // T6: connected components over the alias similarity graph
    "cc_unionfind" -> Q.noOracle((s, d) =>
      Canonicalize.connectedComponents(
        Canonicalize.aliasEdges(KgPipeline.dictDataset(s))))
  )
}
