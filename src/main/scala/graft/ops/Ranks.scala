package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed global ranking.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY moves the entire
  * input to ONE partition (Spark warns exactly this) — fatal at cluster
  * scale. The scalable equivalent: a range-partitioned distributed sort,
  * then per-partition indices shifted by the preceding partitions' row
  * counts. `zipWithIndex` runs the count pass as a separate job, but the
  * sort's shuffle files are reused, so both passes see identical partition
  * bounds and every partition is processed in parallel.
  */
object Ranks {

  /** `df` plus a global 1-based `rankName` long column in `sortCols` order.
    * Total order should be made strict (tiebreak on a unique key) for a
    * deterministic result.
    */
  def withGlobalRowNumber(df: DataFrame, rankName: String,
                          sortCols: Column*): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
    val schema = sorted.schema.add(rankName, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(indexed, schema)
  }
}
