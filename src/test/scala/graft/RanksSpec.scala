package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Ranks

class RanksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("withGlobalRowNumber assigns the exact total order across partitions") {
    import spark.implicits._
    val df = spark.range(0, 1000).select(
      (col("id") * 37 % 1000).as("k"), col("id"))
      .repartition(8)
    val ranked = Ranks.withGlobalRowNumber(df, "rn", col("k").asc, col("id").asc)
    val rows = ranked.orderBy("rn").collect()
    assert(rows.length == 1000)
    // rank i holds the i-th smallest k (k is a permutation of 0..999)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Long]("rn") == i + 1L)
      assert(r.getAs[Long]("k") == i.toLong)
    }
  }

  test("property: ranks are a permutation of 1..n under any partitioning and skew") {
    import spark.implicits._
    // partition counts bracketing the session's shuffle.partitions (32),
    // including the degenerate 1 and a count above the row count of the
    // smallest frame — empty partitions must not corrupt offsets
    for (parts <- Seq(1, 3, 8, 32, 64); skewed <- Seq(false, true)) {
      val n = 557 // prime: never divides evenly into any partition count
      val base =
        if (skewed)
          // one dominant key (~80% of rows) + unique tail; ties broken by id
          spark.range(0, n).select(
            when(col("id") % 5 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
            col("id"))
        else
          spark.range(0, n).select((col("id") * 193 % n).as("k"), col("id"))
      val ranked = Ranks.withGlobalRowNumber(base.repartition(parts), "rn",
        col("k").asc, col("id").asc)
      val rns = ranked.select("rn").collect().map(_.getLong(0)).sorted
      assert(rns.toSeq == (1L to n).toSeq,
        s"parts=$parts skewed=$skewed: ranks not a permutation of 1..$n")
      // and the order is the requested total order
      val ordered = ranked.orderBy("rn")
        .select("k", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(ordered.toSeq == ordered.toSeq.sorted,
        s"parts=$parts skewed=$skewed: rank order != sort order")
    }
  }

  test("property: ranks survive a shuffle-fed input under AQE coalescing") {
    import spark.implicits._
    // the hazard VERDICT flagged: AQE may coalesce the shuffle feeding
    // the sort, so partition bounds exist only at runtime — the eager
    // localCheckpoint must freeze ONE set of bounds for both the count
    // pass and the ranked projection
    val n = 2000L
    val agg = spark.range(0, n * 3)
      .select((col("id") % n).as("k"))
      .groupBy("k").count() // shuffle + AQE coalesce feeds the rank
    val ranked = Ranks.withGlobalRowNumber(agg, "rn",
      col("count").desc, col("k").asc)
    val rns = ranked.select("rn").collect().map(_.getLong(0)).sorted
    assert(rns.toSeq == (1L to n).toSeq)
  }

  test("property: running sum matches the local prefix sum under any partitioning") {
    import spark.implicits._
    for (parts <- Seq(1, 3, 8, 32)) {
      val n = 557
      val base = spark.range(0, n).select(
        (col("id") * 193 % n).as("k"), (col("id") % 37 + 1).as("v"), col("id"))
      val summed = Ranks.withRunningSum(base.repartition(parts), "cum",
        col("v"), col("k").asc, col("id").asc)
        .orderBy(col("k").asc, col("id").asc)
        .select("v", "cum").collect().map(r => (r.getLong(0), r.getLong(1)))
      // the cumulative column IS the local scan of v in the same order
      var acc = 0L
      summed.foreach { case (v, cum) =>
        acc += v
        assert(cum === acc, s"parts=$parts: prefix sum diverged at $acc")
      }
    }
  }

  test("property: running sum survives a shuffle-fed input under AQE coalescing") {
    import spark.implicits._
    // same hazard class as the rank test above: AQE may coalesce the
    // shuffle feeding the sort, so the eager localCheckpoint must
    // freeze ONE set of partition bounds for both the totals pass and
    // the windowed projection
    val n = 2000L
    val agg = spark.range(0, n * 3)
      .select((col("id") % n).as("k"))
      .groupBy("k").count() // shuffle + AQE coalesce feeds the prefix sum
    val summed = Ranks.withRunningSum(agg, "cum",
      col("count"), col("count").desc, col("k").asc)
      .orderBy(col("count").desc, col("k").asc)
      .select("count", "cum").collect().map(r => (r.getLong(0), r.getLong(1)))
    var acc = 0L
    summed.foreach { case (v, cum) => acc += v; assert(cum === acc) }
    assert(acc === n * 3)
  }

  test("selectWithinBudget takes the best-first prefix that fits, deterministically") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 5L), (2L, 9L, 7L), (3L, 8L, 4L), (4L, 7L, 100L), (5L, 6L, 1L)
    ).toDF("id", "q", "tok")
    // greedy by quality: 5 + 7 + 4 = 16 fits in 20; adding 100 busts —
    // and the cut is a PREFIX cut (4 blocks even though 5 would fit)
    val got = Ranks.selectWithinBudget(df.repartition(3), col("tok"), 20L,
      col("q").desc, col("id").asc)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L, 3L))
    // zero budget selects nothing; full budget selects everything
    assert(Ranks.selectWithinBudget(df, col("tok"), 0L,
      col("q").desc).count() === 0L)
    assert(Ranks.selectWithinBudget(df, col("tok"), 1000L,
      col("q").desc).count() === 5L)
  }

  test("fuseRRF carries no unpartitioned window (single-partition bottleneck)") {
    val p = SparkEntry.queries("rrf_fusion")(spark, TestSpark.sfDir)
    p.collect() // AQE: finalize the plan
    val plan = p.queryExecution.executedPlan.toString
    // a ranking window with an empty partition spec prints as
    // "windowspecdefinition(<sort>, ...)" with no partition expressions;
    // the rewrite must leave no Window operator at all in the fused plan
    assert(!plan.contains("WindowExec") && !plan.contains("Window "), plan)
  }
}
