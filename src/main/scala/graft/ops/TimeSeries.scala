package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType, StringType, StructType}

/** Time-series operators: sessionization and as-of joins — the two shapes
  * event pipelines always need and plain SQL joins express badly.
  */
object TimeSeries {

  /** Per-key session aggregation: events within `gap` of the previous
    * event merge into one session (Spark's native session_window — state
    * merges map-side, one shuffle on the grouping key; in streaming the
    * same expression runs incrementally with watermark eviction).
    */
  def sessionAgg(df: DataFrame, keyCol: String, tsCol: String,
                 gap: String, watermark: Option[String] = None): DataFrame =
    watermark.fold(df)(w => df.withWatermark(tsCol, w))
      .groupBy(col(keyCol), session_window(col(tsCol), gap).as("__w"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(tsCol)).as("__first"),
        max(col(tsCol)).as("__last"))
      .select(col(keyCol),
        col("__first").as("session_start"),
        col("n_events"),
        (unix_micros(col("__last")) - unix_micros(col("__first"))).as("span_us"))

  /** As-of join: for every left row, the single latest right row with
    * `right.ts <= left.ts` within the same key (inclusive). No native
    * Spark operator exists; the scalable composition is union + one
    * ranking window per key — O(n log n) distributed sort, NO row
    * explosion (a naive range join is quadratic per key):
    * tag left 1 / right 0, sort (key, ts, side, tiebreak) so a right row
    * at the exact left ts sorts first, and carry the last non-null right
    * payload forward with last_value(ignoreNulls) over
    * rows-unbounded-preceding.
    *
    * All `rightCols` are packed into ONE struct and carried together, so
    * the output always reflects a single right row — per-column carries
    * would stitch values from different right rows whenever a payload
    * column is NULL in the latest row but set in an earlier one.
    *
    * `tiebreakCol` (a right-side column, ideally a unique id) makes the
    * carried row deterministic when several right rows share (key, ts):
    * the one with the LARGEST tiebreak value wins. Without it, ties are
    * broken arbitrarily (matching engines that leave this unspecified).
    *
    * `rightCols` are carried from the right side (null when no match —
    * left-outer semantics).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, rightCols: Seq[String],
               tiebreakCol: Option[String] = None): DataFrame = {
    val leftCols = left.columns.toSeq
    val payloadType = StructType(rightCols.map(c => right.schema(c)))
    val tbType = tiebreakCol.map(c => right.schema(c).dataType).getOrElse(IntegerType)
    val lTagged = left
      .withColumn("__side", lit(1))
      .select(Seq(col(keyCol), col(tsCol), col("__side"),
        lit(null).cast(tbType).as("__tb"),
        lit(null).cast(payloadType).as("__r")) ++
        leftCols.filter(c => c != keyCol && c != tsCol).map(col): _*)
    val rTagged = right
      .withColumn("__side", lit(0))
      .select(Seq(col(keyCol), col(tsCol), col("__side"),
        tiebreakCol.map(col).getOrElse(lit(0)).cast(tbType).as("__tb"),
        struct(rightCols.map(c => col(c).as(c)): _*).as("__r")) ++
        leftCols.filter(c => c != keyCol && c != tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // nulls_first keeps left rows (null __tb) ordered purely by __side;
    // among tied right rows the largest tiebreak sorts last and is the
    // value last(ignoreNulls) carries.
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc, col("__tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightCols.map(c => col("__r").getField(c).as(s"asof_$c")): _*)
  }

  /** Per-key daily volume anomaly score: each (key, day)'s event count as
    * a z-score against that key's own daily distribution — the ops-health
    * lens over an event stream (a spiking z flags an incident or a bot).
    * The variance comes from EXACT integer moments (n, Σx, Σx² of the
    * daily counts are long sums — order-independent, engine-identical),
    * composed into sample variance (Σx² − (Σx)²/n)/(n−1) with one pinned
    * float op order, so the score is bit-reproducible anywhere. Two
    * partial-agg shuffles (day counts, per-key moments — the second over
    * key cardinality only); the moments broadcast back.
    */
  def dailyZScore(df: DataFrame, keyCol: String, tsCol: String,
                  roundTo: Int = 6): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val moments = daily.groupBy(col(keyCol)).agg(
      count(lit(1)).as("__n"),
      sum(col("n_events")).as("__s"),
      sum(col("n_events") * col("n_events")).as("__s2"))
    val n = col("__n").cast(org.apache.spark.sql.types.DoubleType)
    val mean = col("__s").cast(org.apache.spark.sql.types.DoubleType) / n
    val variance = (col("__s2").cast(org.apache.spark.sql.types.DoubleType) -
      col("__s").cast(org.apache.spark.sql.types.DoubleType) * col("__s").cast(org.apache.spark.sql.types.DoubleType) / n) /
      (n - lit(1.0))
    daily.join(broadcast(moments), keyCol)
      .withColumn("z",
        when(col("__n") > 1 && variance > 0,
          round((col("n_events").cast(org.apache.spark.sql.types.DoubleType) - mean) /
            sqrt(variance), roundTo)))
      .select(col(keyCol), col("day"), col("n_events"), col("z"))
  }

  /** ROBUST daily anomaly score: (x − median) / (1.4826·MAD) — the
    * median/MAD twin of [[dailyZScore]] that a real incident can't
    * poison (one 100× spike day inflates the mean AND the stddev enough
    * to mask itself from a z-score; the medians don't move). Exact
    * percentile is safe here because the per-key group is the key's DAY
    * COUNT (~30–365 rows), not the corpus — bounded regardless of data
    * scale; the two median frames are model-sized (a row per key) and
    * broadcast back. Integer day-counts make every median k or k+0.5 —
    * exactly representable — so the one pinned float chain at the end is
    * engine-bit-identical. Zero MAD (a perfectly constant key) yields
    * NULL rather than ±∞.
    */
  def dailyRobustZScore(df: DataFrame, keyCol: String, tsCol: String,
                        roundTo: Int = 6): DataFrame = {
    val daily = df.groupBy(col(keyCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val med = daily.groupBy(col(keyCol))
      .agg(expr("percentile(n_events, 0.5)").as("__med"))
    val dev = daily.join(broadcast(med), Seq(keyCol))
      .withColumn("__dev", abs(col("n_events") - col("__med")))
    val mad = dev.groupBy(col(keyCol))
      .agg(expr("percentile(__dev, 0.5)").as("__mad"))
    dev.join(broadcast(mad), Seq(keyCol))
      .select(col(keyCol), col("day"), col("n_events"),
        when(col("__mad") > 0,
          round((col("n_events") - col("__med")) / (lit(1.4826) * col("__mad")),
            roundTo)).as("robust_z"))
  }

  /** Rolling window aggregate per key: sum + count of `valueCol` over the
    * last `window` rows ordered by (`tsCol`, `tieCol`). The value
    * accumulates in exact DECIMAL, so the running sums are
    * order-independent and engine-portable (the user_stats_final money
    * rule applied to a ROWS frame); one shuffle on the key, the frame
    * walk is a single pass per partition.
    */
  def rollingSum(df: DataFrame, keyCol: String, tsCol: String,
                 tieCol: String, valueCol: String, window: Int): DataFrame = {
    require(window >= 1, s"rollingSum needs window >= 1, got $window")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
      .rowsBetween(-(window - 1), 0)
    df.select(col(tieCol), col(keyCol),
      sum(col(valueCol).cast(DecimalType(18, 4))).over(w)
        .cast(StringType).as("roll_sum"),
      count(lit(1)).over(w).as("n"))
  }

  /** Keyless point-in-interval join: every `points` row whose `tsCol`
    * falls in `[startCol, endCol)` of an `intervals` row — with NO equi
    * key to hash on. Spark's native plan for a pure range predicate is
    * BroadcastNestedLoopJoin (every point compared against every
    * interval, O(N·M)); this rewrite buckets time into `bucket`-sized
    * chunks and turns the range predicate into an ordinary hash EQUI
    * join on the chunk id: each interval explodes into the chunks it
    * covers (≤ len/bucket + 1 rows, bounded by the interval length),
    * each point maps to exactly ONE chunk, and the containment filter
    * runs only within a chunk. Work is Σ_b |points_b|·|chunks_b| — the
    * nested loop's N·M never materializes, and the shuffle is a plain
    * equi-join AQE can skew-split when one time chunk runs hot. Because
    * a point lives in exactly one chunk, each matching (point, interval)
    * pair meets exactly once — no dedup pass. Pick `bucket` near the
    * typical interval length: much smaller multiplies the interval
    * explosion, much larger widens the per-chunk candidate set.
    *
    * Output: all `points` columns plus each requested interval column
    * prefixed `iv_` (collision-proof when both sides share names).
    * Interval bounds are half-open `[start, end)`; empty or inverted
    * intervals match nothing.
    */
  def intervalJoin(points: DataFrame, tsCol: String,
                   intervals: DataFrame, startCol: String, endCol: String,
                   intervalCols: Seq[String],
                   bucket: String = "1 hour"): DataFrame = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(bucket))
    require(iv.months == 0, s"bucket '$bucket' uses months; pass a fixed-length bucket")
    val bUs = iv.days * 86400000000L + iv.microseconds
    require(bUs > 0, s"bucket '$bucket' must be positive")
    // floor-division chunk id ((us - floorMod(us, b)) / b) — correct on
    // pre-epoch timestamps too, and pure long arithmetic (no double
    // rounding at epoch-micro scale)
    def chunkOf(us: Column): Column =
      ((us - pmod(us, lit(bUs))) / lit(bUs)).cast(org.apache.spark.sql.types.LongType)
    val p = points
      .withColumn("__pt_us", unix_micros(col(tsCol)))
      .withColumn("__chunk", chunkOf(col("__pt_us")))
    val i = intervals
      .withColumn("__s_us", unix_micros(col(startCol)))
      .withColumn("__e_us", unix_micros(col(endCol)))
      .filter(col("__e_us") > col("__s_us"))
      .withColumn("__chunk",
        explode(sequence(chunkOf(col("__s_us")), chunkOf(col("__e_us") - 1))))
    p.as("p").join(i.as("i"),
        col("p.__chunk") === col("i.__chunk") &&
          col("p.__pt_us") >= col("i.__s_us") &&
          col("p.__pt_us") < col("i.__e_us"))
      .select(points.columns.toSeq.map(c => col(s"p.$c")) ++
        intervalCols.map(c => col(s"i.$c").as(s"iv_$c")): _*)
  }
}
