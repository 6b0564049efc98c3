package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Per-user accumulated state for [[EventsStream.runningUserStats]]. */
final case class UserState(n: Long, total: Double)
/** Per-batch emitted update of a user's running totals. */
final case class UserUpdate(user_id: Long, n: Long, total: Double)
/** Per-user gap-profile state for [[EventsStream.runningUserGaps]]:
  * last seen event time plus running (count, sum, max) of gaps, all in
  * exact integer microseconds. `lastT = Long.MinValue` = no event yet.
  */
final case class GapState(lastT: Long, n: Long, sum: Long, mx: Long)
/** Per-batch emitted update of a user's gap profile. */
final case class GapUpdate(user_id: Long, n_gaps: Long, sum_gap_us: Long,
                           max_gap_us: Long)

/** Structured Streaming surface over the `events` table.
  *
  * The reference is bounded-only by construction
  * (/root/reference/src/table.rs:245-250 declares Boundedness::Bounded);
  * this module is the scale-out extension (SURVEY.md §7.1 M6): the same
  * windowed aggregation expressed once, runnable bounded (batch) or
  * unbounded (stream with watermark), per Structured Streaming's unified
  * model.
  */
object EventsStream {

  /** events schema as stored (parquet TIMESTAMP(MICROS, isAdjustedToUTC
    * =false) → TIMESTAMP_NTZ).
    */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Normalize `ts` to a microsecond TimestampType whatever form the
    * store delivered: raw nanos long (legacy TIMESTAMP(NANOS) files under
    * nanosAsLong — integral DIV, double division rounds up across integer
    * boundaries at epoch-nano scale), TIMESTAMP_NTZ (current files; the
    * session timezone is pinned to UTC so the cast preserves the stored
    * micros bit-for-bit), or already a timestamp.
    */
  def normalize(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** The shared transform: tumbling 1-hour window per event_type with
    * count/sum. Watermark bounds state: late data beyond 2 hours is
    * dropped and closed windows are evicted — mandatory for unbounded
    * state at production scale.
    */
  def windowedAgg(events: DataFrame): DataFrame =
    normalize(events)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast(StringType).as("sum_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Unbounded source: file-stream over a directory of events parquet.
    * The declared schema must match the files' PHYSICAL ts type: current
    * generations store TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ), legacy
    * ones TIMESTAMP(NANOS) (reads as raw nanos longs under the session's
    * nanosAsLong flag). One batch footer peek at stream-definition time
    * picks the matching variant, and [[normalize]] dispatches on whatever
    * type flowed in — so both file generations stream, matching the batch
    * path (Tables.load). A directory MIXING generations must be migrated
    * first: a file-stream declares exactly one schema.
    */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val tsType = spark.read.parquet(dir).schema("ts").dataType
    val schema = StructType(eventsSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
  }

  /** Start the streaming query into an in-memory sink (for tests/demo);
    * production would write a Delta/parquet sink with checkpointing in
    * append mode. Complete mode here so finite test data emits all windows
    * (append would hold the tail window open awaiting watermark advance).
    */
  def startToMemory(spark: SparkSession, dir: String,
                    queryName: String): StreamingQuery =
    windowedAgg(readEventsStream(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Bounded (batch) form of the same aggregation — oracle-checkable. */
  def windowedAggBatch(spark: SparkSession, sfDir: String): DataFrame =
    windowedAgg(spark.read.parquet(s"$sfDir/events.parquet"))

  /** ONLINE per-host crawl-budget cap: admit the first `k` documents per
    * canonical host ON THE INGEST STREAM, drop the rest — the streaming
    * counterpart of [[graft.ops.Url.capPerHost]] (which draws a seeded
    * committee over a finished corpus; an unbounded ingest must decide
    * per arrival, so first-k-wins is the online policy). State is ONE
    * counter per host via flatMapGroupsWithState; within a micro-batch
    * admission is id-ordered so replays are deterministic. Emits the
    * admitted (host, id) rows in append mode.
    */
  def cappedHostAdmissions(df: org.apache.spark.sql.DataFrame,
                           idCol: String, urlCol: String,
                           k: Int): Dataset[(String, Long)] = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(graft.ops.Url.hostOf(col(urlCol)).as("host"),
        col(idCol).cast(LongType).as("id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout) {
        (host: String, rows: Iterator[(String, Long)],
         state: org.apache.spark.sql.streaming.GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val room = math.max(0L, k - admitted).toInt
          val keep = rows.map(_._2).toSeq.sorted.take(room)
          state.update(admitted + keep.length)
          keep.iterator.map(id => (host, id))
      }
  }

  /** Custom streaming state: per-user running (count, sum) via
    * mapGroupsWithState. State is partitioned by key across executors and
    * checkpointable; each micro-batch folds its rows into the key's state
    * and emits the updated totals (update output mode).
    */
  def runningUserStats(events: DataFrame): Dataset[UserUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast(LongType), col("value").cast(DoubleType))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Double)],
         state: org.apache.spark.sql.streaming.GroupState[UserState]) =>
          var (n, total) = state.getOption
            .map(s => (s.n, s.total)).getOrElse((0L, 0.0))
          rows.foreach { case (_, v) => n += 1; total += v }
          state.update(UserState(n, total))
          UserUpdate(uid, n, total)
      }
  }

  /** The lead_lag gate's per-user gap profile as CUSTOM STREAMING STATE:
    * one GapState per user folds each micro-batch's events (sorted by
    * event time within the batch) onto the last seen timestamp, emitting
    * the running (count, sum, max) of inter-event gaps in exact integer
    * microseconds — so the final state equals the batch window-function
    * computation bit for bit (the aggregates are insensitive to the order
    * of equal timestamps: a tie contributes gap 0 either way).
    *
    * Arrival contract: per-key event-time-ordered ACROSS micro-batches
    * (a time-ordered replayable log); within a batch any order is fine.
    * State is one fixed-size record per user, partitioned by key.
    */
  def runningUserGaps(events: DataFrame): Dataset[GapUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    normalize(events)
      .select(col("user_id").cast(LongType), unix_micros(col("ts")))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[GapState]) =>
          var st = state.getOption.getOrElse(GapState(Long.MinValue, 0L, 0L, 0L))
          rows.map(_._2).toSeq.sorted.foreach { t =>
            if (st.lastT == Long.MinValue) st = st.copy(lastT = t)
            else {
              val g = t - st.lastT
              st = GapState(t, st.n + 1, st.sum + g, math.max(st.mx, g))
            }
          }
          state.update(st)
          GapUpdate(uid, st.n, st.sum, st.mx)
      }
  }

  /** Streaming deduplication: drop repeated (user_id, props) events within
    * the watermark horizon — the unbounded form of exact dedup. State is
    * bounded by the watermark: older keys are evicted, which is the only
    * viable contract for endless streams.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    normalize(events)
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "props")

  /** Bounded, oracle-checkable form of [[dedupedEvents]]'s contract:
    * events with the same (user_id, props) whose inter-arrival gaps stay
    * under the horizon collapse to their FIRST occurrence (reported with
    * the count of duplicates dropped). Expressed with `session_window` —
    * the same incremental operator sessionization uses under a watermark —
    * so this exact plan also runs unbounded with state eviction.
    */
  def dedupWithinHorizonBatch(events: DataFrame,
                              horizon: String = "2 hours"): DataFrame =
    normalize(events)
      .groupBy(col("user_id"), col("props"),
        session_window(col("ts"), horizon).as("__w"))
      .agg(min(col("ts")).as("__first"), count(lit(1)).as("n_dups"))
      .select(col("user_id"), col("props"),
        unix_micros(col("__first")).as("kept_ts_us"), col("n_dups"))

  /** [[dedupWithinHorizonBatch]] over the stored events table (raw nanos
    * ts, like [[windowedAggBatch]]).
    */
  def dedupWithinHorizonFromDir(spark: SparkSession, sfDir: String): DataFrame =
    dedupWithinHorizonBatch(spark.read.parquet(s"$sfDir/events.parquet"))

  /** Start the stateful running-stats stream into a memory sink. */
  def startRunningStats(spark: SparkSession, dir: String,
                        queryName: String): StreamingQuery =
    runningUserStats(readEventsStream(spark, dir))
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()

  /** Stream-stream INTERVAL JOIN (the fourth pillar of the Structured
    * Streaming surface beside windowed aggs, custom state, and watermark
    * dedup): event-time purchase attribution — each `purchase` joins the
    * SAME user's `click` events with `c.ts` in `[p.ts - horizon, p.ts]`.
    * Both sides carry a watermark, so join state (buffered unmatched
    * rows) is evicted once the other side's event time passes the
    * horizon — the only viable contract for two endless streams. Emits
    * matched (purchase_id, user_id, p_ts, click_id) pairs in append
    * mode. At scale this is ONE co-partitioned shuffle of both streams
    * on user_id; state per key is bounded by horizon x rate.
    */
  def attributedPairs(purchases: DataFrame, clicks: DataFrame,
                      horizon: String = "30 minutes",
                      watermarkDelay: String = null): DataFrame = {
    val delay = Option(watermarkDelay).getOrElse(watermarkDelayFor(horizon))
    val p = normalize(purchases).filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        col("user_id"), col("ts").as("p_ts"))
      .withWatermark("p_ts", delay)
    val c = normalize(clicks).filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", delay)
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $horizon"))
      .select(col("purchase_id"), col("user_id"), col("p_ts"), col("click_id"))
  }

  /** Watermark delay for a given join horizon: horizon + 30 min lateness
    * slack. The lateness bound must COVER the match window — a fixed
    * delay narrower than `horizon` would silently drop late-but-in-horizon
    * clicks. Month-bearing intervals are calendar-dependent and have no
    * fixed second count; callers using them must pass `watermarkDelay`
    * explicitly.
    */
  def watermarkDelayFor(horizon: String): String = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(horizon))
    require(iv.months == 0,
      s"horizon '$horizon' uses months; pass watermarkDelay explicitly")
    val horizonSecs = iv.days * 86400L + iv.microseconds / 1000000L
    s"${horizonSecs + 1800} seconds"
  }

  /** Bounded, oracle-checkable form of the attribution: the SAME join,
    * aggregated per purchase (click count + earliest click id). The
    * streaming pair form above runs unbounded; this gate-shaped form
    * proves the join semantics against the SQL oracle.
    */
  def attributedPurchasesBatch(events: DataFrame,
                               horizon: String = "30 minutes"): DataFrame =
    attributedPairs(events, events, horizon)
      .groupBy(col("purchase_id"), col("user_id"))
      .agg(count(lit(1)).as("n_clicks"),
        min(col("click_id")).as("first_click"))
}
