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

  test("dailyRobustZScore flags the spike a classic z-score masks") {
    import spark.implicits._
    // 9 quiet days (8..12 events) + one 1000-event incident day: the
    // spike inflates mean AND stddev enough to keep its own z under ~3,
    // while median/MAD don't move
    val counts = Seq(8, 9, 10, 11, 12, 9, 10, 11, 10, 1000)
    val rows = counts.zipWithIndex.flatMap { case (n, d) =>
      (0 until n).map(i => ("a", 86400000000L * d + i))
    }
    val df = rows.toDF("k", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val robust = TimeSeries.dailyRobustZScore(df, "k", "ts")
      .filter(col("n_events") === 1000).head().getDouble(3)
    val classic = TimeSeries.dailyZScore(df, "k", "ts")
      .filter(col("n_events") === 1000).head().getDouble(3)
    assert(robust > 100, s"MAD score too tame: $robust")
    assert(classic < 5, s"expected the z-score to mask the spike: $classic")
    // constant keys yield NULL, not ±inf
    val const = (0 until 5).flatMap(d => (0 until 7).map(i => ("c", 86400000000L * d + i)))
      .toDF("k", "t").withColumn("ts", timestamp_micros(col("t"))).drop("t")
    assert(TimeSeries.dailyRobustZScore(const, "k", "ts")
      .collect().forall(_.isNullAt(3)))
  }

  test("intervalJoin matches [start, end) exactly, once per pair, across chunk shapes") {
    import spark.implicits._
    val H = 3600000000L // 1h in us
    // points at: interval start (in), interval end (OUT — half-open),
    // mid-interval, far outside; intervals: sub-bucket, exactly one
    // bucket, spanning 3 buckets, overlapping another (point 5 in both),
    // and an empty interval (matches nothing)
    val points = Seq((1L, 0L), (2L, 10 * H), (3L, 10 * H + H / 2), (4L, 99 * H),
        (5L, 20 * H + 1))
      .toDF("pid", "t").withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val intervals = Seq(
        (100L, 0L, H / 4),            // sub-bucket: contains point 1 (at start)
        (101L, 9 * H, 10 * H),        // point 2 at end -> excluded
        (102L, 10 * H, 13 * H),       // 3 buckets: points 2 (start) and 3
        (103L, 20 * H, 21 * H),       // overlaps 104: point 5 in both
        (104L, 19 * H, 22 * H),
        (105L, 50 * H, 50 * H))       // empty
      .toDF("iid", "s", "e")
      .withColumn("start_ts", timestamp_micros(col("s")))
      .withColumn("end_ts", timestamp_micros(col("e"))).drop("s", "e")
    val out = TimeSeries.intervalJoin(points, "ts", intervals,
        "start_ts", "end_ts", Seq("iid"), bucket = "1 hour")
      .select("pid", "iv_iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length, "pair emitted more than once")
    assert(out.toSet == Set((1L, 100L), (2L, 102L), (3L, 102L),
      (5L, 103L), (5L, 104L)))
  }

  test("intervalJoin plans as a hash equi-join, not a nested loop") {
    import spark.implicits._
    val points = Seq((1L, 0L)).toDF("pid", "t")
      .withColumn("ts", timestamp_micros(col("t"))).drop("t")
    val intervals = Seq((100L, 0L, 1L))
      .toDF("iid", "s", "e")
      .withColumn("start_ts", timestamp_micros(col("s")))
      .withColumn("end_ts", timestamp_micros(col("e"))).drop("s", "e")
    val plan = TimeSeries.intervalJoin(points, "ts", intervals,
        "start_ts", "end_ts", Seq("iid"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range predicate fell back to a nested loop:\n$plan")
  }
}
