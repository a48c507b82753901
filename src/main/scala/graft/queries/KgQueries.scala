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

  /** A corpus of synthetic python files built COLUMN-WISE from the
    * `documents` table (import first word, import last word, def first
    * word) — DuckDB can compute the expected mentions directly from the
    * same words, which puts the REAL mention scanner (regex line scan,
    * char offsets, norm) under the driver's rows+schema+hash gate
    * instead of only golden tests.
    */
  private def docCodeCorpus(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    val w1 = element_at(split(col("text"), " "), 1)
    val wn = element_at(split(col("text"), " "), -1)
    t(s, d, "documents").select(
      col("doc_id").cast("string").as("repo"),
      concat(lit("doc/"), col("doc_id")).as("path"),
      col("source").as("commit"),
      lit("python").as("lang"),
      concat(lit("import "), w1, lit("\nimport "), wn,
        lit("\n\ndef "), w1, lit("(a, b):\n    pass\n")).as("content"))
      .withColumn("file_sha", sha2(col("content"), 256))
      .as[HashedFile]
  }

  /** Oracle for the mention-count keys: the scanner must find exactly
    * the import/def identifiers the content was built from.
    */
  private val mentionCountsSql =
    """WITH b AS (SELECT doc_id, string_split(text, ' ')[1] AS w1,
      |                  string_split(text, ' ')[-1] AS wn FROM documents),
      |m AS (SELECT doc_id, 'import' AS kind, w1 AS norm FROM b
      |      UNION ALL SELECT doc_id, 'import', wn FROM b
      |      UNION ALL SELECT doc_id, 'def', w1 FROM b)
      |SELECT doc_id, kind, norm, count(*) AS n
      |FROM m GROUP BY doc_id, kind, norm""".stripMargin

  private def mentionCounts(mentions: org.apache.spark.sql.DataFrame) =
    mentions.groupBy(col("repo").cast("bigint").as("doc_id"),
        col("kind"), col("norm"))
      .agg(count(lit(1)).as("n"))

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

    // T1 oracled (round 3): the REAL mention scanner (Extract.scanFile
    // regexes via the typed flatMap) over code built column-wise from
    // `documents`, reduced to per-(doc, kind, norm) counts — exactly
    // reproducible in DuckDB from the same words. Flips the KG extract
    // stage itself onto the rows+schema+hash gate.
    "udtf_mentions_counts" -> Q.withOracle(mentionCountsSql)((s, d) =>
      mentionCounts(Extract.mentions(docCodeCorpus(s, d),
        s.sparkContext.broadcast(Set.empty[String])).toDF())),

    // same gate through the CUSTOM CATALYST OPERATOR path
    // (MentionScanPlan → strategy → MentionScanExec): identical oracle,
    // so the custom physical node itself is hash-verified, not just
    // equality-tested against the flatMap in PlanSpec.
    "mention_scan_counts" -> Q.withOracle(mentionCountsSql)((s, d) =>
      mentionCounts(graft.plans.MentionScan.scan(docCodeCorpus(s, d),
        s.sparkContext.broadcast(Set.empty[String])))),

    // J7: MinHash-LSH blocking over dictionary aliases
    "join_lsh_block" -> Q.noOracle((s, d) =>
      Canonicalize.lshEdges(KgPipeline.dictDataset(s))),

    // T6: connected components over the alias similarity graph. The edge
    // set is MinHash-LSH-derived (not SQL-expressible), so this key stays
    // no-oracle — the ALGORITHM is oracled by cc_components below.
    "cc_unionfind" -> Q.noOracle((s, d) =>
      Canonicalize.connectedComponents(
        Canonicalize.aliasEdges(KgPipeline.dictDataset(s)))),

    // T6 oracled (round 3): the SAME distributed star-contraction CC
    // (Canonicalize.connectedComponents) over a DuckDB-expressible edge
    // set — per-user event chains (consecutive event_ids) — verified
    // against a DuckDB RECURSIVE min-label propagation. Multi-component
    // by construction (one component per user); node ids are
    // fixed-width-padded so string order == numeric order in both
    // engines.
    "cc_components" -> Q.withOracle(
      """WITH RECURSIVE
        |ev AS (SELECT user_id, event_id,
        |              'e' || lpad(CAST(event_id AS VARCHAR), 10, '0') AS node
        |       FROM events),
        |ch AS (SELECT node,
        |              lag(node) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
        |       FROM ev),
        |e0 AS (SELECT prev AS src, node AS dst FROM ch WHERE prev IS NOT NULL),
        |e AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
        |n AS (SELECT DISTINCT src AS node FROM e),
        |walk(node, comp) AS (
        |  SELECT node, node AS comp FROM n
        |  UNION
        |  SELECT e.src AS node, w.comp FROM e JOIN walk w ON w.node = e.dst)
        |SELECT node, min(comp) AS comp FROM walk GROUP BY node""".stripMargin)(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("event_id")
        val ev = t(s, d, "events").select(col("user_id"), col("event_id"),
          concat(lit("e"), lpad(col("event_id").cast("string"), 10, "0")).as("node"))
        val edges = ev.withColumn("prev", lag(col("node"), 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("prev").as("src"), col("node").as("dst"))
        Canonicalize.connectedComponents(edges)
      })
  )
}
