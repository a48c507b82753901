package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Rebuild the bench scaling corpora via the exact Bench code path and
  * print each skew file's row-group layout — the skew block's
  * parallelism lives in that layout (see Bench.materializeCorpora).
  * Usage: runMain graft.tools.SkewBuild [nFiles=400000]
  */
object SkewBuild {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 400000
    // mirror Bench's suiteSpark geometry (SPARK_GRAFT_CPUS, default 4):
    // repartition(col("repo")) emits one file per shuffle partition, so
    // a different partition count would print a layout the benchmark
    // never reads
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val (corpusDir, skewDir) = graft.Bench.materializeCorpora(s, n)
    val conf = s.sparkContext.hadoopConfiguration
    for (dir <- Seq(corpusDir, skewDir)) {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      val groups = files.map { f =>
        val r = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf))
        try (r.getRowGroups.size, r.getRecordCount) finally r.close()
      }
      println(s"[skewbuild] $dir: ${files.length} files, " +
        s"${groups.map(_._1).sum} row groups (max/file ${groups.map(_._1).max}), " +
        s"${groups.map(_._2).sum} rows")
    }
    s.stop()
  }
}
