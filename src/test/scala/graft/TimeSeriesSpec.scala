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

  test("asofJoin carries all payload columns from the SAME right row, even through NULLs") {
    import spark.implicits._
    val lefts = Seq((1L, 10L, 300L)).toDF("event_id", "user_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    // latest right row (t=200) has note=NULL; an earlier row (t=100) has a
    // note. A per-column carry would stitch (tag@200, note@100); the
    // correct answer is the latest row wholesale: (tagB, NULL).
    val rights = Seq((100L, 10L, 100L, Some("nA"), "tagA"),
                     (101L, 10L, 200L, None,       "tagB"))
      .toDF("p_id", "user_id", "t", "note", "tag")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val r = TimeSeries.asofJoin(lefts, rights, "user_id", "ts",
        Seq("p_id", "note", "tag"), tiebreakCol = Some("p_id"))
      .select("asof_p_id", "asof_note", "asof_tag").collect().head
    assert(r.getLong(0) == 101L)
    assert(r.isNullAt(1), "note must be the latest row's NULL, not an older row's value")
    assert(r.getString(2) == "tagB")
  }

  test("asofJoin breaks (key, ts) ties deterministically by the largest tiebreak") {
    import spark.implicits._
    val lefts = Seq((1L, 10L, 100L)).toDF("event_id", "user_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val rights = Seq((7L, 10L, 100L), (9L, 10L, 100L), (8L, 10L, 100L))
      .toDF("p_id", "user_id", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val picked = TimeSeries.asofJoin(lefts, rights, "user_id", "ts",
        Seq("p_id"), tiebreakCol = Some("p_id"))
      .select("asof_p_id").collect().head.getLong(0)
    assert(picked == 9L)
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
