import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch scaling probe (not part of the driver contract): replicate the
  * sf0.1 corpus Nx with shifted ids and time the dedup family, to measure
  * the scaling exponent of LSH-bounded vs blocked-quadratic verification.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    def corpus(n: Int): DataFrame =
      (0 until n).map(i => base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"))).reduce(_ union _)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    for (n <- Seq(1, 2, 4)) {
      val c = corpus(n).persist(); c.count()
      time(s"minhash x$n") {
        graft.ops.Dedup.minhashDedup(c, "doc_id", "text", 0.8).count()
      }
      time(s"ngram x$n") {
        graft.ops.Dedup.ngramJaccardPairs(c, "doc_id", "text", Seq("lang", "source"), 0.8).count()
      }
      c.unpersist()
    }
    spark.stop()
  }
}
