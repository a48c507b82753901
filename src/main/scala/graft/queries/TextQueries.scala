package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.FingerprintFunctions
import Tables.t

/** Training-data-pipeline text operators: language-ID heuristic, quality
  * scoring, token counting, document fingerprinting, and the multimodal
  * binary-column plumbing stub. Classification gates are integer-exact so
  * the DuckDB oracles reproduce them bit-for-bit.
  */
object TextQueries {

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is",
    "on", "for", "with")
  private val swList = Stopwords.map(w => s"'$w'").mkString(", ")

  val entries: Map[String, Q] = Map(

    // language ID: stopword-hit n-gram heuristic; gate is integer
    // (100*hits > 3*tokens), bit-identical across engines
    "text_langid" -> Q.withOracle(
      s"""SELECT doc_id, lang,
         |  CASE WHEN 100 * len(list_filter(string_split(text, ' '),
         |                                  w -> w IN ($swList)))
         |          > 3 * len(string_split(text, ' '))
         |       THEN 'en' ELSE 'other' END AS pred_lang
         |FROM documents""".stripMargin)(
      (s, d) => {
        val words = split(col("text"), " ")
        val hits = size(filter(words, w => w.isin(Stopwords: _*)))
        t(s, d, "documents").select(col("doc_id"), col("lang"),
          when(lit(100) * hits > lit(3) * size(words), "en")
            .otherwise("other").as("pred_lang"))
      }),

    // quality scoring: integer features + integer rule
    "text_quality" -> Q.withOracle(
      s"""SELECT doc_id,
         |  len(string_split(text, ' ')) AS n_tokens,
         |  length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct,
         |  (length(text) BETWEEN 50 AND 100000
         |   AND 100 * len(list_filter(string_split(text, ' '), w -> w IN ($swList)))
         |       >= 2 * len(string_split(text, ' '))) AS quality_ok
         |FROM documents""".stripMargin)(
      (s, d) => {
        val words = split(col("text"), " ")
        val hits = size(filter(words, w => w.isin(Stopwords: _*)))
        t(s, d, "documents").select(col("doc_id"),
          size(words).as("n_tokens"),
          (length(col("text")) -
            length(regexp_replace(col("text"), "[.,;:!?]", ""))).as("n_punct"),
          (length(col("text")).between(50, 100000) &&
            lit(100) * hits >= lit(2) * size(words)).as("quality_ok"))
      }),

    // token counting: whitespace tokens + BPE-ish regex tokens
    "text_tokencount" -> Q.withOracle(
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS n_bpe_tokens
        |FROM documents""".stripMargin)(
      (s, d) => t(s, d, "documents").select(col("doc_id"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        size(regexp_extract_all(col("text"),
          lit("([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ])"), lit(1))).as("n_bpe_tokens"))),

    // repetition-ratio quality gate (the Gopher-rule family): flag docs
    // whose single most frequent word carries ≥ 10% of the tokens.
    // Spark side stays ZERO-SHUFFLE — a typed per-partition pass with a
    // per-row HashMap word count, O(len) per row (round 6: the previous
    // HOF form counted each distinct word by re-filtering the array —
    // O(distinct×len) per row, a straggler/OOM hazard on a
    // 100k-unique-token document) — vs the oracle's equivalent
    // two-level group-by; the integer cross-multiplied gate
    // (max*10 >= n) avoids any float division, so both engines agree
    // bit-exactly. split(" ", -1) keeps trailing empties, matching
    // DuckDB string_split and Spark's SQL split.
    "text_repetition" -> Q.withOracle(
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |           FROM documents),
        |c AS (SELECT doc_id, word, count(*) AS cnt FROM w GROUP BY 1, 2)
        |SELECT doc_id, max(cnt) AS max_cnt, CAST(sum(cnt) AS BIGINT) AS n_words
        |FROM c GROUP BY 1
        |HAVING max(cnt) * 10 >= CAST(sum(cnt) AS BIGINT)""".stripMargin)(
      (s, d) => {
        import s.implicits._
        t(s, d, "documents").select(col("doc_id"), col("text"))
          .as[(Long, String)]
          .mapPartitions(_.flatMap { case (id, text) =>
            val counts = new java.util.HashMap[String, Long]()
            var maxCnt = 0L
            var n = 0L
            text.split(" ", -1).foreach { w =>
              val c = counts.getOrDefault(w, 0L) + 1L
              counts.put(w, c)
              if (c > maxCnt) maxCnt = c
              n += 1
            }
            // the gate itself runs inside the pass — flagged docs only
            if (maxCnt * 10 >= n) Iterator.single((id, maxCnt, n))
            else Iterator.empty
          })
          .toDF("doc_id", "max_cnt", "n_words")
      }),

    // document fingerprinting via the native Catalyst expressions
    // (fingerprint64 = FNV content hash; rolling_min_hash64 = winnowing
    // rolling hash) — no DuckDB equivalent, covered by unit tests
    "text_fingerprint" -> Q.noOracle((s, d) => {
      FingerprintFunctions.register(s)
      t(s, d, "documents").select(col("doc_id"),
        expr("fingerprint64(text)").as("fp"),
        expr("rolling_min_hash64(text)").as("winnow"))
    }),

    // multimodal plumbing stub: treat content as an opaque binary column
    // and run a batched typed "decode" returning typed metadata. The
    // decode itself is a deterministic FAKE (no media libs in this
    // sandbox — clearly-marked stub); the Spark-side plumbing (binary
    // column, typed mapPartitions batch, fixed output schema) is real.
    "multimodal_stub" -> Q.withOracle(
      """SELECT doc_id, strlen(text) % 640 + 1 AS width,
        |       (strlen(text) // 640) % 480 + 1 AS height,
        |       strlen(text) AS n_bytes
        |FROM documents""".stripMargin)(
      (s, d) => {
        import s.implicits._
        t(s, d, "documents")
          .select(col("doc_id"), encode(col("text"), "UTF-8").as("data"))
          .as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, data) =>
            // STUB decode: deterministic fake dimensions from byte length.
            // A real deployment plugs an image/audio decoder in here; the
            // batch shape and schema stay identical.
            val n = data.length.toLong
            (id, n % 640 + 1, (n / 640) % 480 + 1, n)
          }).toDF("doc_id", "width", "height", "n_bytes")
      })
  )
}
