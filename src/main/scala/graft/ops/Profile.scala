package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** ANALYZE-style column profiling: per-column row/null/distinct counts and
  * min/max — the statistics a catalog keeps for cost-based planning, and
  * the first report a data owner runs on a new 100 TB table.
  *
  * One aggregation job computes every column's metrics (Spark expands
  * multiple exact count-distincts into a single Expand + partial-agg pass
  * — no per-column rescans), then the single wide row unpivots into one
  * row per column. Min/max are rendered as strings so heterogeneous
  * column types stack into one frame; only pass columns whose string
  * rendering is engine-stable (integers, strings — not doubles).
  */
object Profile {

  /** Embedding-column hygiene report — the first check an embedding
    * pipeline runs before indexing a new batch: per group, how many
    * vectors have the wrong dimension, contain NaN, or are all-zero
    * (un-normalizable), plus the mean L2 norm (a drifting norm flags an
    * encoder change). One map-side projection then one partial-agg
    * shuffle; the mean accumulates floor(norm * 1e6) LONGS (exact,
    * order-independent — safe under AQE replanning and any partitioning),
    * divided back once.
    */
  def embeddingHygiene(df: DataFrame, groupCol: String, vecCol: String,
                       expectedDim: Int): DataFrame = {
    val v = col(vecCol)
    val norm2 = aggregate(v, lit(0.0), (a, x) => a + x * x)
    df.select(col(groupCol), size(v).as("__dim"), norm2.as("__n2"),
        exists(v, x => isnan(x)).as("__nan"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__dim") =!= expectedDim, 1L).otherwise(0L)).as("n_bad_dim"),
        sum(when(col("__nan"), 1L).otherwise(0L)).as("n_nan"),
        sum(when(!col("__nan") && col("__n2") === 0.0, 1L).otherwise(0L))
          .as("n_zero"),
        sum(when(col("__nan"), lit(0L))
          .otherwise(floor(sqrt(col("__n2")) * lit(1e6) + lit(0.5))
            .cast(LongType))).as("__nq"))
      .withColumn("avg_norm",
        round(col("__nq").cast(DoubleType) / lit(1e6) /
          (col("n") - col("n_nan")).cast(DoubleType), 6))
      .drop("__nq")
  }

  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableProfile needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"tableProfile: no such columns $missing")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast(StringType).as(s"__mn_$c"),
        max(col(c)).cast(StringType).as(s"__mx_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val stacked = explode(array(cols.map(c =>
      struct(lit(c).as("column_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value"))): _*))
    wide.select(stacked.as("p")).select("p.*")
  }
}
