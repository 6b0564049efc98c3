package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loaders for the driver's deterministic parquet tables (TESTDATA.md).
  *
  * At cluster scale these reads are plain distributed parquet scans: Catalyst
  * handles split planning, column pruning, and predicate pushdown; nothing
  * here collects to the driver.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // Normalize events.ts to a microsecond TimestampType whatever the
    // store delivered: legacy TIMESTAMP(NANOS) files arrive as a nanos
    // long under spark.sql.legacy.parquet.nanosAsLong; current files are
    // TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ (the
    // session timezone is pinned to UTC so the cast keeps the micros).
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        // integral DIV, not double '/': a double quotient near an integer
        // boundary can round UP before the cast truncates, off-by-one µs
        df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Register every table as a temp view named after the file. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
