package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String
import graft.kg.{Extract, HashedFile, Mention}

/** Whole-operator mention scanning as a first-class Catalyst citizen
  * (SURVEY §4.3 escape hatch (c): custom LogicalPlan + SparkStrategy +
  * SparkPlan, the tier above a typed flatMap when the operator should be
  * visible to the planner).
  *
  * Semantics are EXACTLY `Extract.mentions` (same `scanFile`, same
  * broadcast dictionary — asserted by PlanSpec); what the custom node
  * buys over the Dataset flatMap:
  *   - no DeserializeToObject/SerializeFromObject fences — the exec reads
  *     child `InternalRow`s and emits `UnsafeRow`s via one projection,
  *     so column pruning above/below stays visible to the optimizer;
  *   - the operator appears by NAME in `explain()` (`MentionScanExec`),
  *     making plan audits and regression diffs meaningful;
  *   - a planner seam: alternative physical scans (e.g. an Aho-Corasick
  *     automaton for multi-word gazetteers) can be chosen by strategy
  *     without touching call sites.
  */
case class MentionScanPlan(child: LogicalPlan, fnAliases: Broadcast[Set[String]],
                           output: Seq[Attribute] = MentionScan.outputAttrs)
    extends UnaryNode {
  // output is a CONSTRUCTOR parameter: attribute ids must survive
  // Catalyst's copy-based tree transformations (a val would mint fresh
  // exprIds on every copy and break resolution of operators above)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  // the scan consumes exactly the HashedFile columns — declaring them as
  // references keeps column pruning from dropping them out of the child
  // (while still letting it prune anything else)
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      child.output.filter(a => MentionScan.requiredChildCols.contains(a.name)))
  override protected def withNewChildInternal(newChild: LogicalPlan): MentionScanPlan =
    copy(child = newChild)
}

/** Plans MentionScanPlan → MentionScanExec; injected via
  * `GraftExtensions` (spark.sql.extensions) and ensured idempotently by
  * `MentionScan.scan` through `spark.experimental.extraStrategies` for
  * sessions created without the conf.
  */
object MentionScanStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p @ MentionScanPlan(child, b, out) =>
      MentionScanExec(planLater(child), b, out) :: Nil
    case _ => Nil
  }
}

case class MentionScanExec(child: SparkPlan, fnAliases: Broadcast[Set[String]],
                           output: Seq[Attribute])
    extends UnaryExecNode {

  // first-class SQLMetrics (north rule: per-partition lineage + METRICS):
  // visible in the Spark UI / explain like any built-in operator's
  override lazy val metrics = Map(
    "numFiles" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of files scanned"),
    "numMentions" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of mentions emitted"))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    def ord(name: String): Int = {
      val i = childOutput.indexWhere(_.name == name)
      require(i >= 0, s"MentionScan child must provide column '$name' " +
        s"(got ${childOutput.map(_.name).mkString(", ")})")
      i
    }
    val (iRepo, iPath, iCommit, iLang, iContent, iSha) =
      (ord("repo"), ord("path"), ord("commit"), ord("lang"), ord("content"), ord("file_sha"))
    val schema = MentionScan.schema
    val bc = fnAliases
    val filesMetric = longMetric("numFiles")
    val mentionsMetric = longMetric("numMentions")
    child.execute().mapPartitions { rows =>
      val proj = UnsafeProjection.create(schema)
      val dict = bc.value
      rows.flatMap { row =>
        filesMetric += 1
        val f = HashedFile(
          row.getUTF8String(iRepo).toString,
          row.getUTF8String(iPath).toString,
          row.getUTF8String(iCommit).toString,
          row.getUTF8String(iLang).toString,
          row.getUTF8String(iContent).toString,
          row.getUTF8String(iSha).toString)
        Extract.scanFile(f, dict).iterator.map { m =>
          mentionsMetric += 1
          proj(new GenericInternalRow(Array[Any](
            UTF8String.fromString(m.fileSha), UTF8String.fromString(m.repo),
            UTF8String.fromString(m.path), UTF8String.fromString(m.commit),
            UTF8String.fromString(m.lang), UTF8String.fromString(m.surface),
            UTF8String.fromString(m.norm), UTF8String.fromString(m.kind),
            m.line, m.start, m.end)))
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): MentionScanExec =
    copy(child = newChild)
}

object MentionScan {
  /** Output schema = the Mention case class (stable field order). */
  val schema: StructType = Encoders.product[Mention].schema

  /** Child columns the exec reads (HashedFile shape). */
  val requiredChildCols: Set[String] =
    Set("repo", "path", "commit", "lang", "content", "file_sha")

  def outputAttrs: Seq[Attribute] =
    schema.map(f => AttributeReference(f.name, f.dataType, f.nullable)())

  /** Corpus → mentions through the custom plan node. Idempotently
    * registers the strategy on the session (covers sessions built
    * without spark.sql.extensions=graft.functions.GraftExtensions).
    */
  def scan(corpus: Dataset[HashedFile], fnAliases: Broadcast[Set[String]]): DataFrame = {
    val spark = corpus.sparkSession
    ensureStrategy(spark)
    GraftColumnBridge.ofRows(spark,
      MentionScanPlan(GraftColumnBridge.logicalPlan(corpus), fnAliases))
  }

  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(MentionScanStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ MentionScanStrategy
}
