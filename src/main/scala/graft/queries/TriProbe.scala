package graft.queries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Scratch probe: wedge count vs closing-wedge count (round-7 bloom sizing). */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e0 = GraphQueries.coEdges(spark, args(0)).localCheckpoint()
    val w = e0.alias("a").join(e0.alias("b"), col("a.dst") === col("b.src"))
      .select(col("a.src").as("x"), col("a.dst").as("y"), col("b.dst").as("z"))
    val nw = w.count()
    val nt = w.join(e0.alias("c"), col("x") === col("c.src") && col("z") === col("c.dst"), "left_semi").count()
    println(s"[triprobe] wedges=$nw closing=$nt rate=${nt.toDouble / nw}")
    spark.stop()
  }
}
