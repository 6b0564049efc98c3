package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Distributed global ranking.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY moves the entire
  * input to ONE partition (Spark warns exactly this) — fatal at cluster
  * scale. The scalable equivalent: a range-partitioned distributed sort,
  * then per-partition indices shifted by the preceding partitions' row
  * counts. Everything stays in the DataFrame API (codegen + Tungsten + AQE
  * throughout — no RDD[Row] detour): the intra-partition index comes from
  * `monotonically_increasing_id` evaluated AFTER the sort (partition id in
  * the high bits, in-partition record number in the low 33), and the
  * per-partition offsets ride along as one tiny array literal.
  */
object Ranks {

  private val LocalMask = (1L << 33) - 1

  /** `df` plus a global 1-based `rankName` long column in `sortCols` order.
    * Total order should be made strict (tiebreak on a unique key) for a
    * deterministic result.
    *
    * The sorted+indexed frame is MATERIALIZED once (eager localCheckpoint)
    * before the count pass: the counts and the ranked projection must see
    * the same partition bounds and the same per-partition ids, and range
    * bound sampling over a shuffle-fed input is not re-execution-stable —
    * two independent executions could diverge and silently corrupt ranks
    * (the zipWithIndex predecessor was immune by sharing one RDD; this
    * keeps that property while staying in Tungsten). The count pass itself
    * returns ONE row per partition to the driver (model state).
    */
  def withGlobalRowNumber(df: DataFrame, rankName: String,
                          sortCols: Column*): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint()
    val counts = sorted
      .groupBy(shiftright(col("__mid"), 33).as("__pid"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxPid = counts.keys.foldLeft(0L)(math.max)
    val offsets = new Array[Long](maxPid.toInt + 1)
    var acc = 0L
    (0L to maxPid).foreach { p =>
      offsets(p.toInt) = acc; acc += counts.getOrElse(p, 0L)
    }
    // rank = preceding partitions' rows + in-partition index + 1, all
    // codegen'd column math against the broadcast-as-literal offset table
    sorted
      .withColumn(rankName,
        element_at(lit(offsets),
          (shiftright(col("__mid"), 33) + 1).cast(IntegerType))
          + col("__mid").bitwiseAND(lit(LocalMask)) + lit(1L))
      .drop("__mid")
  }

  /** `df` plus a global RUNNING SUM (`sumName`, long) of `valueCol` in
    * `sortCols` order — the distributed prefix sum, same architecture as
    * [[withGlobalRowNumber]]: range-sort once, per-partition TOTALS come
    * back as one row per partition (model state) and re-enter as a
    * prefix-offset array literal; the within-partition running sum is a
    * window keyed on the PHYSICAL partition id, so its state is bounded
    * by one partition's rows and no single-partition global window ever
    * exists. Costs the sort exchange plus one partition-id-keyed window
    * exchange; `valueCol` must be integral (cast to long).
    *
    * This is the primitive under budget-bounded selection ("take the
    * best documents until the token budget is spent") — see
    * [[selectWithinBudget]].
    */
  def withRunningSum(df: DataFrame, sumName: String, valueCol: Column,
                     sortCols: Column*): DataFrame = {
    val sorted = df.orderBy(sortCols: _*)
      .withColumn("__v", valueCol.cast(org.apache.spark.sql.types.LongType))
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint()
    val sums = sorted
      .groupBy(shiftright(col("__mid"), 33).as("__pid"))
      .agg(sum(col("__v")).as("__s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxPid = sums.keys.foldLeft(0L)(math.max)
    val offsets = new Array[Long](maxPid.toInt + 1)
    var acc = 0L
    (0L to maxPid).foreach { p =>
      offsets(p.toInt) = acc; acc += sums.getOrElse(p, 0L)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shiftright(col("__mid"), 33))
      .orderBy(col("__mid"))
    sorted
      .withColumn(sumName,
        element_at(lit(offsets),
          (shiftright(col("__mid"), 33) + 1).cast(IntegerType))
          + sum(col("__v")).over(w))
      .drop("__mid", "__v")
  }

  /** Budget-bounded greedy selection: the best rows by `qualityCols`
    * order whose cumulative `tokens` stay within `budget` — the "fill
    * the training-token budget with the highest-quality documents" step
    * of a curation pipeline, as one distributed prefix sum + a map-side
    * cut. Make the order strict (tiebreak on a unique id) for a
    * deterministic selection.
    */
  def selectWithinBudget(df: DataFrame, tokens: Column, budget: Long,
                         qualityCols: Column*): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    withRunningSum(df, "cum_tokens", tokens, qualityCols: _*)
      .filter(col("cum_tokens") <= budget)
  }

  /** PER-GROUP budget-bounded selection ("no domain contributes more
    * than B tokens" — the per-source cap the public curation recipes
    * apply so one crawl domain cannot dominate the mixture): within each
    * `groupCol` key, the best rows by `qualityCols` whose cumulative
    * `tokens` fit `budgetPerGroup`. Unlike the global form this needs no
    * offset machinery — the running sum is a plain KEY-PARTITIONED
    * window (state bounded per group, shuffles once on the group key),
    * so it scales as any keyed aggregation does; skewed groups fall
    * under the same AQE skew handling as every keyed op here.
    */
  def selectWithinBudgetBy(df: DataFrame, groupCol: Column, tokens: Column,
                           budgetPerGroup: Long,
                           qualityCols: Column*): DataFrame = {
    require(budgetPerGroup >= 0,
      s"budgetPerGroup must be non-negative, got $budgetPerGroup")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(qualityCols: _*)
    df.withColumn("cum_tokens",
        sum(tokens.cast(org.apache.spark.sql.types.LongType)).over(w))
      .filter(col("cum_tokens") <= budgetPerGroup)
  }
}
