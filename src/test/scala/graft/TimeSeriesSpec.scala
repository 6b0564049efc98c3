package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TimeSeries

class TimeSeriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("asofJoin picks the latest right row at-or-before each left ts, per key") {
    import spark.implicits._
    val clicks = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 20L, 50L))
      .toDF("event_id", "user_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val buys = Seq((100L, 10L, 100L), (101L, 10L, 200L), (102L, 99L, 1L))
      .toDF("p_id", "user_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val out = TimeSeries.asofJoin(clicks, buys, "user_id", "ts", Seq("p_id"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(r.fieldIndex("asof_p_id"))) None else Some(r.getLong(r.fieldIndex("asof_p_id"))))).toMap
    // click 1 at t=100: purchase 100 at the SAME ts matches (inclusive);
    // click 2 at t=205: purchase 101 (t=200) is latest; click 3: user 20
    // has no purchases -> null
    assert(out == Map(1L -> Some(100L), 2L -> Some(101L), 3L -> None))
  }

  test("sessionAgg merges events within the gap and splits beyond it") {
    import spark.implicits._
    val e = Seq((1L, 0L), (1L, 1000L), (1L, 10000L), (2L, 0L))
      .toDF("user_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    // gap of 2ms: events at 0 and 1000us merge; 10000us starts a new session
    val out = TimeSeries.sessionAgg(e, "user_id", "ts", "2 milliseconds")
      .select(col("user_id"), col("n_events"), col("span_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L, 1000L), (1L, 1L, 0L), (2L, 1L, 0L)))
  }
}
