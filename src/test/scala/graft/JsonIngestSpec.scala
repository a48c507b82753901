package graft

import org.apache.spark.sql.functions._
import graft.kg.JsonIngest

/** Nested reference-format JSON ingest (SURVEY §1.1, S2). */
class JsonIngestSpec extends SparkTestBase {

  // handwritten BioRelEx-shaped record: two entities (one with two names,
  // one name carrying two mention spans), one interaction with positional
  // participant indices
  private val fixture =
    """{"id": 7, "text": "RAD51 binds BRCA2 and RAD51 again",
      | "entities": [
      |  {"label": "protein", "is_state": false, "grounding": "P1",
      |   "names": {"RAD51": {"is_mentioned": true, "mentions": [[0,5],[22,27]]},
      |             "rad-51": {"is_mentioned": false, "mentions": []}}},
      |  {"label": "protein", "is_state": false, "grounding": "P2",
      |   "names": {"BRCA2": {"is_mentioned": true, "mentions": [[12,17]]}}}],
      | "interactions": [
      |  {"participants": [0, 1], "type": "bind", "label": 1, "implicit": false}]}"""
      .stripMargin.replace("\n", " ")

  test("handwritten nested record → exact mention rows") {
    import spark.implicits._
    val parsed = JsonIngest.parse(Seq(fixture).toDF("j"), "j")
    val got = JsonIngest.mentionRows(parsed)
      .as[(Long, Int, String, String, Boolean, Int, Int)].collect().toSet
    assert(got == Set(
      (7L, 0, "protein", "RAD51", true, 0, 5),
      (7L, 0, "protein", "RAD51", true, 22, 27),
      (7L, 1, "protein", "BRCA2", true, 12, 17)))
    // char-span invariant: text.substring(start, end) == name
    val text = parsed.select("text").as[String].first()
    got.foreach { case (_, _, _, name, _, s, e) =>
      assert(text.substring(s, e) == name)
    }
  }

  test("handwritten nested record → exact interaction rows") {
    import spark.implicits._
    val parsed = JsonIngest.parse(Seq(fixture).toDF("j"), "j")
    val got = JsonIngest.interactionRows(parsed)
      .as[(Long, Int, Int, String, Int)].collect().toList
    assert(got == List((7L, 0, 1, "bind", 1)))
  }

  test("synthetic fixture round-trips through the nested schema") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", 16L),
      (2L, "solo solo", 9L) // first word == last word → one entity, no interaction
    ).toDF("doc_id", "text", "n_chars")
    val parsed = JsonIngest.parse(JsonIngest.syntheticJson(docs), "j")
    val mentions = JsonIngest.mentionRows(parsed)
      .as[(Long, Int, String, String, Boolean, Int, Int)].collect().toSet
    assert(mentions == Set(
      (1L, 0, "term", "alpha", true, 0, 5),
      (1L, 1, "term", "gamma", true, 11, 16),
      (2L, 0, "term", "solo", true, 0, 4)))
    val interactions = JsonIngest.interactionRows(parsed)
      .as[(Long, Int, Int, String, Int)].collect().toList
    assert(interactions == List((1L, 0, 1, "cooccur", 0)))
  }

  test("export → parse → flatten round-trips the normalized rows exactly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", 16L),
      (2L, "solo solo", 9L),
      (3L, "delta epsilon zeta", 18L)
    ).toDF("doc_id", "text", "n_chars")
    val parsed = JsonIngest.parse(JsonIngest.syntheticJson(docs), "j")
    val m0 = JsonIngest.mentionRows(parsed)
    val i0 = JsonIngest.interactionRows(parsed)
    val exported = JsonIngest.exportJson(m0, i0,
      docs.select(col("doc_id"), col("text")))
    val reparsed = JsonIngest.parse(exported, "j")
    def mset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(mset(JsonIngest.mentionRows(reparsed)) == mset(m0))
    assert(mset(JsonIngest.interactionRows(reparsed)) == mset(i0))
    // and it round-trips under different partitioning (sort_array makes
    // the nested arrays deterministic)
    val exported7 = JsonIngest.exportJson(m0.repartition(7), i0.repartition(3),
      docs.select(col("doc_id"), col("text")))
    assert(exported.as[String].collect().sorted.toSeq ==
      exported7.as[String].collect().sorted.toSeq)
  }

  test("malformed records yield null parse, not garbage rows") {
    import spark.implicits._
    val parsed = JsonIngest.parse(Seq("""{"id": "not json""").toDF("j"), "j")
    assert(JsonIngest.mentionRows(parsed).count() == 0)
    assert(JsonIngest.interactionRows(parsed).count() == 0)
  }
}
