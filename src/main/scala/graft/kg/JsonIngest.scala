package graft.kg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reference-format nested JSON ingest (SURVEY §1.1, S2).
  *
  * The reference's canonical record is a BioRelEx-style annotated
  * document: `entities[].names{name → {is_mentioned, mentions:[[s,e]]}}`
  * plus `interactions[].participants` holding positional indices into the
  * entity list. Ingest parses that shape with an EXPLICIT schema
  * (`from_json`, never inference-on-trust) and immediately normalizes the
  * nesting away: one row per mention span, one row per interaction, with
  * real keys instead of positional indexing.
  */
object JsonIngest {

  /** Explicit reference-record schema (SURVEY §1.1 table). */
  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("text", StringType),
    StructField("entities", ArrayType(StructType(Seq(
      StructField("label", StringType),
      StructField("is_state", BooleanType),
      StructField("grounding", StringType),
      StructField("names", MapType(StringType, StructType(Seq(
        StructField("is_mentioned", BooleanType),
        StructField("mentions", ArrayType(ArrayType(IntegerType))))))))))),
    StructField("interactions", ArrayType(StructType(Seq(
      StructField("participants", ArrayType(IntegerType)),
      StructField("type", StringType),
      StructField("label", IntegerType),
      StructField("implicit", BooleanType)))))))

  /** Parse a column of reference-format JSON strings. */
  def parse(df: DataFrame, jsonCol: String): DataFrame =
    df.select(from_json(col(jsonCol), schema).as("r")).select("r.*")

  /** Normalize parsed records to one row per mention span:
    * (doc_id, entity_idx, label, name, is_mentioned, m_start, m_end).
    * Three explodes — entity array (positional index kept as entity_idx
    * because interactions reference it), names map, mention span list.
    */
  def mentionRows(parsed: DataFrame): DataFrame =
    parsed
      .select(col("id").as("doc_id"),
        posexplode(col("entities")).as(Seq("entity_idx", "ent")))
      .select(col("doc_id"), col("entity_idx"), col("ent.label").as("label"),
        explode(col("ent.names")).as(Seq("name", "info")))
      .select(col("doc_id"), col("entity_idx"), col("label"), col("name"),
        col("info.is_mentioned").as("is_mentioned"),
        explode(col("info.mentions")).as("span"))
      .select(col("doc_id"), col("entity_idx"), col("label"), col("name"),
        col("is_mentioned"),
        element_at(col("span"), 1).as("m_start"),
        element_at(col("span"), 2).as("m_end"))

  /** Normalize parsed records to one row per interaction, resolving the
    * positional participant indices: (doc_id, p1, p2, itype, ilabel).
    */
  def interactionRows(parsed: DataFrame): DataFrame =
    parsed
      .select(col("id").as("doc_id"), explode(col("interactions")).as("ix"))
      .select(col("doc_id"),
        element_at(col("ix.participants"), 1).as("p1"),
        element_at(col("ix.participants"), 2).as("p2"),
        col("ix.type").as("itype"),
        col("ix.label").as("ilabel"))

  /** EXPORT the normalized rows back to the reference's nested record
    * shape (the inverse of mentionRows/interactionRows): group mention
    * spans under their name, names under their entity index, entities and
    * interactions under the document. Arrays are sort_array'd so the
    * output is deterministic under any partitioning; the round-trip
    * (export → parse → flatten) reproduces the input rows exactly
    * (JsonIngestSpec).
    *
    * mentions: (doc_id, entity_idx, label, name, is_mentioned, m_start, m_end)
    * interactions: (doc_id, p1, p2, itype, ilabel)
    * returns one reference-format JSON string per doc_id.
    */
  def exportJson(mentions: DataFrame, interactions: DataFrame,
                 texts: DataFrame): DataFrame = {
    val names = mentions
      .groupBy("doc_id", "entity_idx", "label", "name", "is_mentioned")
      .agg(sort_array(collect_list(array(col("m_start"), col("m_end"))))
        .as("mentions"))
    val entities = names
      .groupBy("doc_id", "entity_idx", "label")
      .agg(map_from_entries(sort_array(collect_list(struct(col("name"),
        struct(col("is_mentioned"), col("mentions")))))).as("names"))
      .groupBy("doc_id")
      // array_sort with a comparator: sort_array cannot order structs
      // containing maps
      .agg(collect_list(struct(col("entity_idx"), col("label"), col("names")))
        .as("ents0"))
      .select(col("doc_id"),
        expr("array_sort(ents0, (l, r) -> l.entity_idx - r.entity_idx)").as("ents"))
      .select(col("doc_id"),
        expr("transform(ents, e -> struct(e.label as label, false as is_state, " +
          "cast(null as string) as grounding, e.names as names))").as("entities"))
    val ixs = interactions
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("p1"), col("p2"), col("itype"),
        col("ilabel")))).as("ixs"))
      .select(col("doc_id"),
        expr("transform(ixs, i -> struct(array(i.p1, i.p2) as participants, " +
          "i.itype as type, i.ilabel as label, false as implicit))")
          .as("interactions"))
    texts.select(col("doc_id"), col("text"))
      .join(entities, Seq("doc_id"), "left")
      .join(ixs, Seq("doc_id"), "left")
      .select(to_json(struct(col("doc_id").as("id"), col("text"),
        col("entities"), col("interactions"))).as("j"))
  }

  /** Deterministic reference-format JSON fixture built from the driver's
    * `documents` table (used by the oracled ingest queries): entity 0 =
    * first word mentioned at the text start, entity 1 = last word at the
    * text end (only when it differs from the first — map keys must be
    * unique), one binary interaction between them.
    */
  def syntheticJson(docs: DataFrame): DataFrame = {
    val w1 = element_at(split(col("text"), " "), 1)
    val wn = element_at(split(col("text"), " "), -1)
    val ent0 = struct(
      lit("term").as("label"), lit(false).as("is_state"),
      concat(lit("g:"), w1).as("grounding"),
      map(w1, struct(lit(true).as("is_mentioned"),
        array(array(lit(0), length(w1))).as("mentions"))).as("names"))
    val ent1 = struct(
      lit("term").as("label"), lit(false).as("is_state"),
      concat(lit("g:"), wn).as("grounding"),
      map(wn, struct(lit(true).as("is_mentioned"),
        array(array((col("n_chars") - length(wn)).cast("int"),
          col("n_chars").cast("int"))).as("mentions"))).as("names"))
    val interaction = struct(
      array(lit(0), lit(1)).as("participants"), lit("cooccur").as("type"),
      (col("n_chars") % 2).cast("int").as("label"), lit(false).as("implicit"))
    val entities = when(w1 =!= wn, array(ent0, ent1)).otherwise(array(ent0))
    val interactions = when(w1 =!= wn, array(interaction))
      .otherwise(array().cast(schema("interactions").dataType))
    docs.select(to_json(struct(
      col("doc_id").as("id"), col("text"),
      entities.as("entities"), interactions.as("interactions"))).as("j"))
  }
}
