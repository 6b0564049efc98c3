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
