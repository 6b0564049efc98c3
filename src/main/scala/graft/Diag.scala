package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val d = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"), col("lang"), col("source"))
    val c = d.union(d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), concat(col("text"), lit(" zzz")).as("text"), col("lang"), col("source")))
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(s"$label: ${(System.nanoTime()-t0)/1e9}"); r
    }
    time("warm")(c.count())
    val base = c.select(col("doc_id").as("id"), ops.Dedup.sortedTokenSet(col("text")).as("toks"), col("lang"), col("source"))
    time("tokenize-only")(base.write.format("noop").mode("overwrite").save())
    val joined = base.as("a").join(base.as("b"),
      col("a.lang") === col("b.lang") && col("a.source") === col("b.source") && col("a.id") < col("b.id"))
    time("pairs-count")(println("pairs=" + joined.count()))
    val jac = joined.withColumn("jaccard", round(ops.Dedup.jaccardSortedSets(col("a.toks"), col("b.toks")), 6))
      .filter(col("jaccard") >= 0.8)
    time("full")(println("hits=" + jac.count()))
    jac.explain()
    spark.stop()
  }
}
