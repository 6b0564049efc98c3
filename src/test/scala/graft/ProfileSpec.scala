package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Profile

class ProfileSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tableProfile reports rows, nulls, distincts, min/max per column") {
    val df = Seq(
      (1L, Some("a"), 10L), (2L, Some("b"), 20L),
      (3L, None, 10L), (4L, Some("a"), 30L))
      .toDF("id", "tag", "v")
    val got = Profile.tableProfile(df, Seq("id", "tag", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("tag") == ((4L, 1L, 2L, "a", "b")))
    assert(got("v") == ((4L, 0L, 3L, "10", "30")))
  }

  test("tableProfile is one aggregation job, not one scan per column") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "tag")
    val plan = Profile.tableProfile(df, Seq("id", "tag"))
      .queryExecution.executedPlan.toString
    // multiple exact count-distincts compile to Expand over a single scan
    assert(plan.contains("Expand"), plan)
    assert(!plan.contains("Union"), plan)
  }

  test("tableProfile rejects unknown columns eagerly") {
    val df = Seq((1L, "a")).toDF("id", "tag")
    val e = intercept[IllegalArgumentException] {
      Profile.tableProfile(df, Seq("id", "nope"))
    }
    assert(e.getMessage.contains("nope"))
  }
}
