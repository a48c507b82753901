package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.kg.{Canonicalize, Extract, HashedFile, JsonIngest, KgPipeline}
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

    // S2 (full): reference-format NESTED JSON ingest (SURVEY §1.1) —
    // BioRelEx-shaped records (entities[].names{name→{mentions:[[s,e]]}})
    // built deterministically from `documents`, parsed with the explicit
    // nested schema, normalized to one row per mention span. The oracle
    // computes the flattened rows directly from the same base table.
    "json_ingest_nested" -> Q.withOracle(
      """WITH b AS (SELECT doc_id, string_split(text, ' ')[1] AS w1,
        |                  string_split(text, ' ')[-1] AS wn, n_chars AS nc
        |           FROM documents)
        |SELECT doc_id, 0 AS entity_idx, 'term' AS label, w1 AS name,
        |       TRUE AS is_mentioned, 0 AS m_start, strlen(w1) AS m_end
        |FROM b
        |UNION ALL
        |SELECT doc_id, 1, 'term', wn, TRUE, nc - strlen(wn), nc
        |FROM b WHERE wn <> w1""".stripMargin)(
      (s, d) => JsonIngest.mentionRows(
        JsonIngest.parse(JsonIngest.syntheticJson(t(s, d, "documents")), "j"))),

    // S2: interaction normalization — positional participant indices out
    // of the nested record into first-class rows
    "json_ingest_interactions" -> Q.withOracle(
      """WITH b AS (SELECT doc_id, string_split(text, ' ')[1] AS w1,
        |                  string_split(text, ' ')[-1] AS wn, n_chars AS nc
        |           FROM documents)
        |SELECT doc_id, 0 AS p1, 1 AS p2, 'cooccur' AS itype,
        |       CAST(nc % 2 AS INTEGER) AS ilabel
        |FROM b WHERE wn <> w1""".stripMargin)(
      (s, d) => JsonIngest.interactionRows(
        JsonIngest.parse(JsonIngest.syntheticJson(t(s, d, "documents")), "j"))),

    // O4 over extractor outputs (the reference's multi-system merge): three
    // rule extractors emit (source, mentions, word) triples — first word,
    // last word, min distinct word — and the 2-of-3 vote keeps a triple
    // iff at least two systems agree. Fully oracled.
    "setop_vote_triples" -> Q.withOracle(
      """WITH e1 AS (SELECT DISTINCT source AS subj, 'mentions' AS pred,
        |                   string_split(text, ' ')[1] AS obj FROM documents),
        |e2 AS (SELECT DISTINCT source, 'mentions',
        |              string_split(text, ' ')[-1] FROM documents),
        |e3 AS (SELECT DISTINCT source, 'mentions',
        |              list_sort(list_distinct(string_split(text, ' ')))[1] FROM documents),
        |u AS (SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3)
        |SELECT subj, pred, obj, count(*) AS n_votes
        |FROM u GROUP BY subj, pred, obj HAVING count(*) >= 2""".stripMargin)(
      (s, d) => {
        val docs = t(s, d, "documents")
        def sys(obj: org.apache.spark.sql.Column) =
          docs.select(col("source").as("subj"), lit("mentions").as("pred"),
            obj.as("obj")).distinct()
        val e1 = sys(element_at(split(col("text"), " "), 1))
        val e2 = sys(element_at(split(col("text"), " "), -1))
        val e3 = sys(element_at(array_sort(array_distinct(split(col("text"), " "))), 1))
        e1.unionAll(e2).unionAll(e3)
          .groupBy("subj", "pred", "obj")
          .agg(count(lit(1)).as("n_votes"))
          .filter(col("n_votes") >= 2)
      }),

    // T1: broadcast-dictionary mention scanner (typed flatMap UDTF-style)
    "udtf_mentions" -> Q.noOracle((s, d) => {
      val dict = KgPipeline.dictDataset(s)
      Extract.mentions(hashedCorpus(s, d), Extract.broadcastFnAliases(s, dict)).toDF()
    }),

    // T1 via the custom Catalyst operator (MentionScanPlan → strategy →
    // MentionScanExec): same semantics as udtf_mentions without the
    // object-serialization fences — PlanSpec asserts result equality
    "mention_scan_plan" -> Q.noOracle((s, d) => {
      val dict = KgPipeline.dictDataset(s)
      graft.plans.MentionScan.scan(hashedCorpus(s, d),
        Extract.broadcastFnAliases(s, dict))
    }),

    // full stage-1..4 DAG to canonicalized triples (bench headline)
    "kg_triples" -> Q.noOracle((s, d) => {
      val dict = KgPipeline.dictDataset(s)
      val rels = Extract.scoredRelations(hashedCorpus(s, d),
        Extract.broadcastFnAliases(s, dict))
      Canonicalize.toTriples(rels, Canonicalize.linkMap(dict)).toDF()
    }),

    // T1 at gazetteer scale: Aho-Corasick multi-pattern scan — ONE pass
    // over each document for the whole broadcast lexicon (vs N regex
    // passes), whole-word matching so the token-equality oracle is exact.
    // Lexicon = the 40 lexicographically-first distinct words of docs
    // 0..19 (deterministic in both engines).
    "gazetteer_scan" -> Q.withOracle(
      """WITH lex AS (
        |  SELECT w FROM (SELECT unnest(string_split(text, ' ')) AS w
        |                 FROM documents WHERE doc_id < 20)
        |  GROUP BY w ORDER BY w LIMIT 40),
        |cnt AS (
        |  SELECT d.doc_id, l.w AS word,
        |         len(list_filter(string_split(d.text, ' '), x -> x = l.w)) AS n_matches
        |  FROM documents d CROSS JOIN lex l)
        |SELECT doc_id, word, n_matches FROM cnt WHERE n_matches > 0""".stripMargin)(
      (s, d) => {
        import s.implicits._
        val docs = t(s, d, "documents")
        val lex = docs.filter(col("doc_id") < 20)
          .select(explode(split(col("text"), " ")).as("w"))
          .distinct().orderBy("w").limit(40).as[String].collect().toSeq
        val bc = s.sparkContext.broadcast(graft.functions.AhoCorasick.build(lex))
        docs.select(col("doc_id"), col("text")).as[(Long, String)]
          .mapPartitions { it =>
            val ac = bc.value
            it.flatMap { case (id, text) =>
              ac.findAll(text).groupBy(_._1).iterator.map { case (pid, ms) =>
                (id, ac.patterns(pid), ms.size.toLong)
              }
            }
          }.toDF("doc_id", "word", "n_matches")
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
