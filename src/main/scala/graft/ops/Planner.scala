package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cardinality-planned filtered vector search — the query-planner behavior
  * of the reference's backend (Qdrant): a search with a payload filter is
  * answered either by PRE-filtering (resolve the filter through the payload
  * index, exact-score only the matching points) or by POST-filtering (ANN
  * over the vector index, drop non-matching hits), and the plan is chosen
  * from the filter's ESTIMATED CARDINALITY against a full-scan threshold.
  * The reference crate itself declares-and-ignores filter exprs
  * (`/root/reference/src/table.rs:174`); the planner is the behavior a
  * user of the backend relies on when they attach a filter to V_SEARCH.
  *
  * Spark-first shape:
  *  - the payload index is postings `(value, id)` written
  *    `partitionBy(value)` — a filter's value list partition-prunes to its
  *    own files (asserted in PlannerSpec), the keyword-index analog of the
  *    IVF cluster layout;
  *  - the stats table (value -> row count) is MODEL state: one row per
  *    distinct keyword value, collected once at build (bounded like the
  *    centroid table — a keyword field's vocabulary, not the corpus);
  *  - the pre-filter path serves straight from the index when it COVERS
  *    the vector column (scan work = the filter's matching rows, zero
  *    corpus touch); an id-only index instead broadcasts the resolved id
  *    set into the exact rerank while it is broadcast-sized
  *    (`broadcastLimit`), falling back to a shuffled semi-join above it —
  *    at 100 TB a 0.1% filter is still millions of ids;
  *  - the post-filter path is [[Ann.searchIvfStored]]'s statically pruned
  *    cluster scan with the row predicate applied inside the probed
  *    clusters, over-fetching nothing (the filter runs before top-k).
  */
object Planner {

  /** Keyword payload index over one field: value-partitioned postings and
    * the collected per-value counts. `total` is the indexed corpus size
    * (every row carries exactly one value of a keyword field; rows with a
    * NULL field value are indexed under the sentinel they cast to — build
    * from a non-null field or normalize first). `covering` lists extra
    * corpus columns the postings carry: a COVERING index (vector column
    * included) lets the pre-filter path serve entirely from its own
    * value-pruned partitions — scan work exactly proportional to the
    * filter's matching rows, zero corpus touch — at the storage cost of
    * duplicating those columns (the classic covering-index trade; the
    * id-only form pays a corpus semi-join instead).
    */
  final case class PayloadIndex(postings: DataFrame, stats: Seq[(Long, Long)],
                                covering: Seq[String] = Nil) {
    lazy val total: Long = stats.map(_._2).sum
    private lazy val byValue = stats.toMap

    /** Estimated rows matching `value IN (values)` — exact for an index
      * covering every row, an upper bound once deletes lag compaction.
      */
    def estimate(values: Seq[Long]): Long =
      values.distinct.map(v => byValue.getOrElse(v, 0L)).sum

    /** Estimated rows matching `value BETWEEN lo AND hi` (inclusive) —
      * the integer-index RANGE condition; same stats, same exactness.
      */
    def estimateRange(lo: Long, hi: Long): Long =
      stats.collect { case (v, n) if v >= lo && v <= hi => n }.sum
  }

  /** Build the payload index: one shuffle (the partitioned write), one
    * model-sized collect (per-value counts). An ingest-time batch job —
    * serving never rebuilds it.
    */
  def buildPayloadIndex(df: DataFrame, idCol: String, value: Column,
                        covering: Seq[String] = Nil): PayloadIndex = {
    val dir = java.nio.file.Files.createTempDirectory("graft-payload-idx").toString
    writePayloadIndex(df, idCol, value, covering, dir)
    readPayloadIndex(df.sparkSession, dir, covering)
  }

  /** Write postings `partitionBy(value)` to `dir`. `mode = "append"` is
    * the INCREMENTAL maintenance path (the payload-index analog of
    * [[Ann.assignToCentroids]]): new points' files land only in their
    * own value directories — existing files are never rewritten, so
    * ingest keeps the index current without a rebuild; rebuild only to
    * compact small files, not for correctness (PlannerSpec pins
    * append == rebuild for both stats and search results).
    */
  def writePayloadIndex(df: DataFrame, idCol: String, value: Column,
                        covering: Seq[String], dir: String,
                        mode: String = "overwrite"): Unit =
    df.select(value.cast(LongType).as("value") +:
        col(idCol).as("id") +: covering.map(col): _*)
      .write.mode(mode).partitionBy("value").parquet(dir)

  /** Read a stored index back: postings (partition column normalized to
    * long — type inference reads small value directories as INTEGER; the
    * cast unwraps inside partition filters so value-pruning survives) +
    * freshly collected stats. Called once per maintenance cycle, not per
    * query.
    */
  def readPayloadIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                       covering: Seq[String] = Nil): PayloadIndex = {
    val postings = spark.read.parquet(dir)
      .withColumn("value", col("value").cast(LongType))
    val stats = postings.groupBy(col("value")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sortBy(_._1)
    PayloadIndex(postings, stats, covering)
  }

  /** The dispatch decision, exposed so callers (and specs) can see WHY a
    * plan was chosen: pre-filter iff the estimate is within
    * `fullScanThreshold` of the corpus (qdrant's `full_scan_threshold`
    * dial, expressed as a fraction rather than an absolute point count).
    */
  final case class PlanChoice(prefilter: Boolean, estimate: Long, total: Long)

  def choose(idx: PayloadIndex, values: Seq[Long],
             fullScanThreshold: Double): PlanChoice = {
    require(fullScanThreshold > 0 && fullScanThreshold <= 1,
      s"fullScanThreshold must be a fraction in (0, 1], got $fullScanThreshold")
    val est = idx.estimate(values)
    PlanChoice(est <= fullScanThreshold * idx.total, est, idx.total)
  }

  /** Filtered top-k with cardinality-based plan selection. `stored` /
    * `centroids` are the [[Ann.searchIvfStored]] serving layout (cluster-
    * partitioned corpus); `rowPredicate` must be the row-level equivalent
    * of `value IN (values)` over the indexed field (the post-filter path
    * applies it to corpus rows; the pre-filter path resolves the same set
    * through the postings).
    *
    * Pre-filter results are EXACT over the filtered set; post-filter
    * results carry IVF's nprobe recall like every ANN answer (nprobe =
    * nlist makes them exact too — PlannerSpec pins the two paths equal
    * there).
    */
  def searchFilteredPlanned(stored: DataFrame, centroids: DataFrame,
                            idx: PayloadIndex, idCol: String, vecCol: String,
                            values: Seq[Long], rowPredicate: Column,
                            query: Column, k: Int, nprobe: Int,
                            fullScanThreshold: Double = 0.2,
                            broadcastLimit: Long = 100000L,
                            metric: String = "cosine",
                            roundTo: Int = 6): DataFrame =
    serve(stored, centroids, idx, idCol, vecCol,
      col("value").isin(values: _*), choose(idx, values, fullScanThreshold),
      rowPredicate, query, k, nprobe, broadcastLimit, metric, roundTo)

  /** The RANGE form of the filter (the integer payload index's
    * `value BETWEEN lo AND hi` condition): same plan dispatch, same
    * serving arms — a range predicate on the postings' partition column
    * prunes statically just like the literal IN.
    */
  def searchFilteredRange(stored: DataFrame, centroids: DataFrame,
                          idx: PayloadIndex, idCol: String, vecCol: String,
                          lo: Long, hi: Long, rowPredicate: Column,
                          query: Column, k: Int, nprobe: Int,
                          fullScanThreshold: Double = 0.2,
                          broadcastLimit: Long = 100000L,
                          metric: String = "cosine",
                          roundTo: Int = 6): DataFrame = {
    require(fullScanThreshold > 0 && fullScanThreshold <= 1,
      s"fullScanThreshold must be a fraction in (0, 1], got $fullScanThreshold")
    val est = idx.estimateRange(lo, hi)
    serve(stored, centroids, idx, idCol, vecCol,
      col("value") >= lo && col("value") <= hi,
      PlanChoice(est <= fullScanThreshold * idx.total, est, idx.total),
      rowPredicate, query, k, nprobe, broadcastLimit, metric, roundTo)
  }

  private def serve(stored: DataFrame, centroids: DataFrame,
                    idx: PayloadIndex, idCol: String, vecCol: String,
                    postingsPred: Column, c: PlanChoice,
                    rowPredicate: Column, query: Column, k: Int, nprobe: Int,
                    broadcastLimit: Long, metric: String,
                    roundTo: Int): DataFrame = {
    if (c.prefilter && idx.covering.contains(vecCol)) {
      // covering index: the filter's value partitions ARE the candidate
      // set — scan only them (static pruning, PlannerSpec), score, top-k.
      // Zero joins, zero corpus touch: scan work = matching rows.
      idx.postings.filter(postingsPred)
        .select(col("id"),
          round(Search.similarity(col(vecCol), query, metric), roundTo).as("score"))
        .orderBy(col("score").desc, col("id").asc)
        .limit(k)
    } else if (c.prefilter) {
      // id-only index: resolve ids through the value-pruned postings,
      // exact-score only those rows. Broadcast the id set while it is
      // small; beyond broadcastLimit a shuffled semi-join keeps both
      // sides distributed (left_semi either way).
      val ids = idx.postings.filter(postingsPred)
        .select(col("id"))
      val idFrame = if (c.estimate <= broadcastLimit) broadcast(ids) else ids
      stored.join(idFrame, stored(idCol) === idFrame("id"), "left_semi")
        .select(col(idCol).as("id"),
          round(Search.similarity(col(vecCol), query, metric), roundTo).as("score"))
        .orderBy(col("score").desc, col("id").asc)
        .limit(k)
    } else {
      // loose: the statically partition-pruned IVF scan with the predicate
      // applied inside the probed clusters (filter BEFORE top-k, so k
      // survivors are returned, not k hits minus filter casualties)
      val probed = Ann.probedClusters(centroids, query, nprobe)
      stored.filter(col("cluster").isin(probed: _*))
        .filter(rowPredicate)
        .select(col(idCol).as("id"),
          round(Search.similarity(col(vecCol), query, metric), roundTo).as("score"))
        .orderBy(col("score").desc, col("id").asc)
        .limit(k)
    }
  }
}
