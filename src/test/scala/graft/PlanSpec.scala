package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.{Exchange, BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.{SparkPlan, QueryExecution}

/** Physical-plan discipline tests (SURVEY §4.4, §7.4(4)): the 100KB
  * `content` column must never cross a shuffle; narrow scans must push
  * filters and prune columns; small-dim joins must broadcast.
  */
class PlanSpec extends SparkTestBase {

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan =
    df.queryExecution.executedPlan

  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
    case _ => p +: p.children.flatMap(allNodes)
  }

  test("KG plan: content column never crosses a shuffle exchange") {
    import spark.implicits._
    val corpus = graft.fixtures.CorpusGen.corpus(60).toDF()
    val dict = graft.kg.KgPipeline.dictDataset(spark)
    val hashed = corpus.withColumn("file_sha", sha2(col("content"), 256))
      .select("repo", "path", "commit", "lang", "content", "file_sha")
      .as[graft.kg.HashedFile]
    val rels = graft.kg.Extract.scoredRelations(hashed,
      graft.kg.Extract.broadcastFnAliases(spark, dict))
    val triples = graft.kg.Canonicalize.toTriples(rels,
      graft.kg.Canonicalize.linkMap(dict))
    triples.count() // finalize AQE plan
    val shuffles = allNodes(executed(triples.toDF()))
      .collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.nonEmpty, "expected at least the dedup shuffle")
    shuffles.foreach { ex =>
      val cols = ex.child.output.map(_.name.toLowerCase)
      assert(!cols.contains("content"),
        s"content crosses a shuffle: ${cols.mkString(",")}")
    }
  }

  test("scan_parquet pushes filter and prunes columns") {
    val df = SparkEntry.queries("scan_parquet")(spark, "/root/testdata/sf0.001")
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    val s = scan.toString
    assert(s.contains("PushedFilters") &&
      (s.contains("GreaterThanOrEqual(n_chars,100)") || s.contains("n_chars")),
      s"filter not pushed:\n$s")
    assert(!s.contains("text"), s"text column not pruned from scan:\n$s")
  }

  test("join_broadcast actually broadcasts the dimension side") {
    val df = SparkEntry.queries("join_broadcast")(spark, "/root/testdata/sf0.001")
    df.count()
    val bc = allNodes(df.queryExecution.executedPlan)
      .collect { case e: BroadcastExchangeLike => e }
    assert(bc.nonEmpty, "expected a broadcast exchange")
  }

  test("entry smoke: flagship produces rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("join_bloom_prune: bloom pre-filter sits below the exact semi-join") {
    val df = SparkEntry.queries("join_bloom_prune")(spark, "/root/testdata/sf0.001")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing:\n$plan")
    // the pre-filter feeds the semi-join (exactness comes from the join)
    assert(allNodes(executed(df)).exists(_.nodeName.contains("BroadcastHashJoin")))
    // round 3: the bloom rides a SCALAR SUBQUERY, never a plan literal —
    // no BinaryType literal may appear anywhere in the plan (at 10⁹ build
    // keys a literal bloom is MBs inside every serialized plan fragment)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val binLits = allNodes(executed(df)).flatMap(_.expressions).flatMap(_.collect {
      case l: Literal if l.dataType == BinaryType => l
    })
    assert(binLits.isEmpty, s"driver-materialized bloom literal in plan: ${binLits.size}")
    assert(plan.toLowerCase.contains("subquery"), s"expected scalar subquery:\n$plan")
  }

  test("dedup_incremental: corpus side carries the batch-keyed bloom " +
    "pre-filter below the exact anti-join") {
    val df = SparkEntry.queries("dedup_incremental")(spark, "/root/testdata/sf0.001")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom probe missing:\n$plan")
    // same discipline as join_bloom_prune: the bloom rides a scalar
    // subquery, never a driver-materialized binary literal
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    val binLits = allNodes(executed(df)).flatMap(_.expressions).flatMap(_.collect {
      case l: Literal if l.dataType == BinaryType => l
    })
    assert(binLits.isEmpty, s"driver-materialized bloom literal in plan: ${binLits.size}")
  }

  test("pred-partitioned triple sink: read-back prunes partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val dir = java.nio.file.Files.createTempDirectory("graft_trip_prune").toString
    val io = new graft.kg.LocalParquetIO("/nonexistent", s"$dir/triples")
    val triples = SparkEntry.entry(spark)
      .withColumn("bucket", pmod(xxhash64(col("fileSha")), lit(4)).cast("int"))
    io.writeTriples(triples, org.apache.spark.sql.SaveMode.Overwrite)
    val preds = io.readTriples(spark).select("pred").distinct().count()
    assert(preds >= 3, s"fixture too small: $preds preds")
    val rb = io.readTriples(spark).filter(col("pred") === "imports")
    rb.count()
    val scan = allNodes(executed(rb)).collectFirst { case f: FileSourceScanExec => f }.get
    assert(scan.partitionFilters.exists(_.references.map(_.name).exists(_ == "pred")),
      s"pred not in PartitionFilters: ${scan.partitionFilters}")
    // only the pred=imports directories are read (one per bucket)
    val dirsRead = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).map(_.getPath.getParent.toString).distinct
    assert(dirsRead.nonEmpty && dirsRead.forall(_.contains("pred=imports")),
      s"scan reads non-pruned partitions: $dirsRead")
  }

  test("MentionScan custom plan: equals typed flatMap, no object fences") {
    import spark.implicits._
    val corpus = graft.fixtures.CorpusGen.corpus(60).toDF()
      .withColumn("file_sha", sha2(col("content"), 256))
      .as[graft.kg.HashedFile]
    val dict = graft.kg.KgPipeline.dictDataset(spark)
    val bc = graft.kg.Extract.broadcastFnAliases(spark, dict)
    val viaPlan = graft.plans.MentionScan.scan(corpus, bc)
    val viaFlatMap = graft.kg.Extract.mentions(corpus, bc).toDF()
    assert(viaPlan.schema == viaFlatMap.schema)
    val a = viaPlan.collect().map(_.toSeq).toSet
    val b = viaFlatMap.collect().map(_.toSeq).toSet
    assert(a == b && a.nonEmpty)
    // the operator is a named physical node, with no serialization fences
    val nodes = allNodes(executed(viaPlan)).map(_.nodeName)
    assert(nodes.exists(_.contains("MentionScan")), nodes.mkString(","))
    assert(!nodes.exists(n => n.contains("DeserializeToObject") ||
      n.contains("SerializeFromObject")), nodes.mkString(","))
    // column pruning through the custom node: projecting two columns
    // still plans (output schema is fixed, child scan stays columnar)
    assert(viaPlan.select("norm", "kind").distinct().count() > 0)
  }
}
