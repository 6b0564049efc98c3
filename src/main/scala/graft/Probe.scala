package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Targeted A/B measurement harness for the optimization rounds —
  * committed deliberately alongside [[Explain]] as measurement tooling
  * (guide §1): edit the `variants` list to the pipeline stages under
  * study, run with SPARK_GRAFT_SF_DIR/SPARK_GRAFT_REPEAT. Not an engine
  * path; the shipped variants are whatever the last investigation
  * probed.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_REPEAT", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-probe")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())

    val d = Tables.load(spark, sfDir, "documents")
    val toks = col("__toks")
    def tokdf() = d.select(filter(split(lower(col("text")), "\\s+"),
      t => length(t) > 0).as("__toks"))
    def grams() = tokdf().select(
      when(size(toks) >= 5,
        array_distinct(transform(sequence(lit(1), size(toks) - 5 + 1),
          i => concat_ws(" ", slice(toks, i, lit(5))))))
        .otherwise(array().cast(ArrayType(StringType))).as("gs"))
    def explcount() = grams().select(explode(col("gs")).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
    def full() = explcount().orderBy(col("n_docs").desc, col("ngram").asc).limit(20)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "toks" -> (() => tokdf()),
      "grams" -> (() => grams()),
      "expl_count" -> (() => explcount()),
      "topk_full" -> (() => full())
    )

    variants.foreach { case (name, fn) =>
      val times = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        fn().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = times(times.length / 2)
      println(f"[probe] $name%-14s med=$med%.3f all=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
