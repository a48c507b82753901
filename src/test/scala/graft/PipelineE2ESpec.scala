package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.kg._
import graft.fixtures.{CorpusGen, Vocab}
import graft.oracle.Oracle

/** End-to-end golden P/R gate (SURVEY §5.2 layer 4; BASELINE.json:2):
  * engine triples vs the independent single-threaded oracle on the
  * deterministic tiny corpus. Plus: sha256 invariant, partitioning
  * invariance, and manifest-based resume.
  */
class PipelineE2ESpec extends SparkTestBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def corpusDf(n: Int) = {
    import spark.implicits._
    CorpusGen.corpus(n).toDF()
  }

  private def tripleKey = Seq("subj", "pred", "obj", "repo", "path", "commit", "fileSha")

  private def runPipeline(n: Int, dir: String,
                          onlyBuckets: Option[Set[Int]] = None): KgResult = {
    val cfg = KgConfig(s"$dir/triples", s"$dir/manifest", runId = "r1")
    KgPipeline.run(spark, corpusDf(n), KgPipeline.dictDataset(spark), cfg, onlyBuckets)
  }

  private def readTriples(dir: String): Set[Seq[String]] = {
    spark.read.parquet(s"$dir/triples")
      .select(tripleKey.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf)).toSet
  }

  test("e2e golden P/R == 1.0 on the tiny corpus") {
    val dir = tmp("kg-e2e")
    val res = runPipeline(CorpusGen.TinyFiles, dir)
    assert(res.triplesWritten > 0)
    val got = readTriples(dir)
    val want = Oracle.triples(CorpusGen.corpus(CorpusGen.TinyFiles), Vocab.dictRows)
      .map(t => Seq(t.subj, t.pred, t.obj, t.repo, t.path, t.commit, t.fileSha))
    val tp = (got intersect want).size.toDouble
    val precision = if (got.isEmpty) 0.0 else tp / got.size
    val recall = if (want.isEmpty) 0.0 else tp / want.size
    info(f"precision=$precision%.4f recall=$recall%.4f (${got.size} pred, ${want.size} gold)")
    assert(precision >= 0.95 && recall >= 0.95,
      s"P/R gate failed: p=$precision r=$recall; " +
        s"spurious=${(got -- want).take(3)} missed=${(want -- got).take(3)}")
    assert(precision == 1.0 && recall == 1.0, "deterministic spec ⇒ expect exactly 1.0")
  }

  test("golden P/R == 1.0 on the 3000-file small corpus (in-memory DAG)") {
    import spark.implicits._
    val n = CorpusGen.SmallFiles
    val corpus = spark.range(n)
      .mapPartitions(_.map(i => CorpusGen.genFile(i.toInt, n))).toDF()
    val dict = KgPipeline.dictDataset(spark)
    val hashed = TableIO.withInvariants(corpus, 1)
      .select("repo", "path", "commit", "lang", "content", "file_sha")
      .as[HashedFile]
    val got = Extract.canonicalTriples(hashed,
        Extract.broadcastFnAliases(spark, dict),
        Canonicalize.broadcastLinkMap(spark, dict))
      .collect().map(t => Seq(t.subj, t.pred, t.obj, t.repo, t.path, t.commit, t.fileSha))
      .toSet
    val want = Oracle.triples(CorpusGen.corpus(n), Vocab.dictRows)
      .map(t => Seq(t.subj, t.pred, t.obj, t.repo, t.path, t.commit, t.fileSha))
    assert(got.size == want.size && got == want,
      s"small-corpus divergence: spurious=${(got -- want).take(2)} missed=${(want -- got).take(2)}")
  }

  test("per-row sha256 invariant holds for 100% of corpus rows") {
    import spark.implicits._
    val hashed = TableIO.withInvariants(corpusDf(CorpusGen.TinyFiles), 16)
    val rows = hashed.select($"content", $"file_sha").as[(String, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (content, sha) =>
      assert(sha == Oracle.sha256Hex(content))
    }
  }

  test("output is invariant under parallelism (repartition 1 vs 13)") {
    val d1 = tmp("kg-p1"); val d2 = tmp("kg-p13")
    val cfg1 = KgConfig(s"$d1/triples", s"$d1/manifest", "r1")
    val cfg2 = KgConfig(s"$d2/triples", s"$d2/manifest", "r1")
    val dict = KgPipeline.dictDataset(spark)
    KgPipeline.run(spark, corpusDf(CorpusGen.TinyFiles).repartition(1), dict, cfg1)
    KgPipeline.run(spark, corpusDf(CorpusGen.TinyFiles).repartition(13), dict, cfg2)
    assert(readTriples(d1) == readTriples(d2))
    // lineage digests must match too (commutative xor ⇒ order-invariant)
    val m1 = spark.read.parquet(s"$d1/manifest")
      .select("bucket", "rowCount", "contentDigest").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val m2 = spark.read.parquet(s"$d2/manifest")
      .select("bucket", "rowCount", "contentDigest").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(m1 == m2)
  }

  test("resume: crash at half the buckets, rerun → identical output, no reprocess") {
    val full = tmp("kg-full"); val resumed = tmp("kg-resume")
    // uninterrupted run
    runPipeline(CorpusGen.TinyFiles, full)
    // interrupted run: only buckets 0..7 commit, then "crash"
    runPipeline(CorpusGen.TinyFiles, resumed, onlyBuckets = Some((0 until 8).toSet))
    val manifestAfterCrash = spark.read.parquet(s"$resumed/manifest")
      .select("bucket").collect().map(_.getInt(0)).toSet
    assert(manifestAfterCrash == (0 until 8).toSet)
    // resume completes the rest
    val res2 = runPipeline(CorpusGen.TinyFiles, resumed)
    assert(res2.bucketsCommitted == 16)
    assert(readTriples(resumed) == readTriples(full))
    // no committed bucket reprocessed: manifest has exactly one row per bucket
    val counts = spark.read.parquet(s"$resumed/manifest")
      .groupBy("bucket").count().collect().map(_.getLong(1)).toSet
    assert(counts == Set(1L))
    // third run is a no-op
    val res3 = runPipeline(CorpusGen.TinyFiles, resumed)
    assert(res3.triplesWritten == 0L)
  }
}
