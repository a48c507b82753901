package graft.queries

import org.apache.spark.sql.functions._
import Tables.t

/** SURVEY §2.7 scalar-function demonstrations (string / regex / array /
  * map / json / math / datetime) over `documents` and `events`, each with
  * a DuckDB oracle. Predicates that gate row membership are kept
  * integer-exact; floats only ever appear as display values.
  */
object FunctionQueries {

  val entries: Map[String, Q] = Map(

    // F1: normalization — lower/trim/strip non [a-z ]
    "fn_string_norm" -> Q.withOracle(
      """SELECT doc_id,
        |       trim(regexp_replace(lower(substr(text, 1, 60)), '[^a-z ]', '', 'g')) AS norm_prefix
        |FROM documents""".stripMargin)(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          trim(regexp_replace(lower(substring(col("text"), 1, 60)),
            "[^a-z ]", "")).as("norm_prefix"))),

    // F2: regex extraction — token count per doc
    "fn_regex_extract" -> Q.withOracle(
      "SELECT doc_id, len(regexp_extract_all(text, '[a-z]+')) AS n_words FROM documents")(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("([a-z]+)"), lit(1))).as("n_words"))),

    // F3: split + explode — word frequencies (words of length >= 5)
    "fn_split_explode" -> Q.withOracle(
      """SELECT w, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |WHERE length(w) >= 5 GROUP BY w""".stripMargin)(
      (s, d) => t(s, d, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 5)
        .groupBy("w").agg(count(lit(1)).as("n"))),

    // F4: edit distance
    "fn_levenshtein" -> Q.withOracle(
      """SELECT c_mktsegment, levenshtein(c_mktsegment, 'BUILDING') AS dist,
        |       count(*) AS n
        |FROM customer GROUP BY c_mktsegment""".stripMargin)(
      (s, d) => t(s, d, "customer")
        .groupBy(col("c_mktsegment"),
          levenshtein(col("c_mktsegment"), lit("BUILDING")).as("dist"))
        .agg(count(lit(1)).as("n"))),

    // F5: hashing — sha256 per row (the BASELINE.json:15 invariant fn)
    "fn_sha2" -> Q.withOracle(
      "SELECT doc_id, sha256(text) AS sha FROM documents")(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"), sha2(col("text"), 256).as("sha"))),

    // F6: array ops — distinct size + membership
    "fn_array_ops" -> Q.withOracle(
      """SELECT doc_id,
        |       len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |       list_contains(string_split(text, ' '), 'spark') AS has_spark
        |FROM documents""".stripMargin)(
      (s, d) => t(s, d, "documents")
        .select(col("doc_id"),
          size(array_distinct(split(col("text"), " "))).as("n_distinct"),
          array_contains(split(col("text"), " "), "spark").as("has_spark"))),

    // F7: map ops — per-user feature map, then key lookup
    "fn_map_ops" -> Q.withOracle(
      """SELECT user_id,
        |       CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END), 0) AS BIGINT) AS clicks
        |FROM events GROUP BY user_id""".stripMargin)(
      (s, d) => t(s, d, "events")
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
        .groupBy("user_id")
        .agg(map_from_entries(collect_list(struct(col("event_type"), col("c")))).as("m"))
        .select(col("user_id"),
          coalesce(try_element_at(col("m"), lit("click")), lit(0L)).as("clicks"))),

    // F8: JSON extraction from the props column
    "fn_json" -> Q.withOracle(
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin)(
      (s, d) => t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))),

    // F9: math — logistic score fusion (round(6) display; both engines
    // evaluate the same double expression on identical inputs)
    "fn_math_score" -> Q.withOracle(
      """SELECT l_orderkey, l_linenumber,
        |       round(1.0 / (1.0 + exp(-(2.0 - 10.0 * l_discount))), 6) AS score
        |FROM lineitem WHERE l_returnflag = 'A'""".stripMargin)(
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_returnflag") === "A")
        .select(col("l_orderkey"), col("l_linenumber"),
          round(lit(1.0) / (lit(1.0) + exp(-(lit(2.0) - lit(10.0) * col("l_discount")))), 6)
            .as("score"))),

    // F10: datetime — day/hour bucketing
    "fn_datetime" -> Q.withOracle(
      """SELECT CAST(ts AS DATE) AS day, hour(ts) AS hr, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin)(
      (s, d) => t(s, d, "events")
        .groupBy(to_date(col("ts")).as("day"), hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("n")))
  )
}
