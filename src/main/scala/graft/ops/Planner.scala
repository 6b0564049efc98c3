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
    * serving never rebuilds it. `dir` is the index location; when empty a
    * temp directory is created and registered for deletion on JVM exit
    * (the demo/test convenience — production callers pass an explicit
    * path, the artifact is meant to outlive the job).
    */
  def buildPayloadIndex(df: DataFrame, idCol: String, value: Column,
                        covering: Seq[String] = Nil,
                        dir: String = ""): PayloadIndex = {
    val target =
      if (dir.nonEmpty) dir
      else {
        val tmp = java.nio.file.Files.createTempDirectory("graft-payload-idx")
        Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(tmp.toFile)))
        tmp.toString
      }
    writePayloadIndex(df, idCol, value, covering, target)
    readPayloadIndex(df.sparkSession, target, covering)
  }

  private def deleteTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteTree)
    f.delete(): Unit
  }

  /** Write postings `partitionBy(value)` to `dir`. `mode = "append"` is
    * the INCREMENTAL maintenance path (the payload-index analog of
    * [[Ann.assignToCentroids]]): new points' files land only in their
    * own value directories — existing files are never rewritten, so
    * ingest keeps the index current without a rebuild; when small files
    * accumulate, [[compactPayloadIndex]] rewrites the touched partitions
    * in place — never needed for correctness (PlannerSpec pins
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
      .collect().map { r =>
        // a NULL indexed value lands in __HIVE_DEFAULT_PARTITION__ and
        // reads back as null; silently unboxing it would merge those rows
        // into value 0's cardinality — fail loudly instead (index a
        // non-null field or normalize before writePayloadIndex)
        require(!r.isNullAt(0),
          s"payload index at $dir has null-valued postings " +
            "(__HIVE_DEFAULT_PARTITION__): the indexed field is nullable " +
            "— normalize or filter nulls before writePayloadIndex")
        (r.getLong(0), r.getLong(1))
      }.toSeq.sortBy(_._1)
    PayloadIndex(postings, stats, covering)
  }

  /** COMPACTION — the other half of the incremental-maintenance cycle:
    * [[writePayloadIndex]]`(mode = "append")` lands each ingest batch as
    * new files inside the touched value directories, so a hot partition
    * accumulates one small file per batch. Compaction rewrites a value
    * partition's accumulated files into ONE file with identical contents
    * — stats and search results are unchanged (PlannerSpec pins both)
    * and the per-partition file count returns to 1. `values` restricts
    * the pass to the named partitions (the maintenance-cycle form:
    * compact only what ingest touched); empty compacts every partition
    * that has more than one file. The vocabulary loop is model-sized
    * (one keyword field's distinct values); each rewrite reads only its
    * own partition directory. The file swap is a local-filesystem move
    * here — on a real cluster that step is the table format's atomic
    * commit (the DSv2 sink's overwrite does it transactionally).
    */
  def compactPayloadIndex(spark: org.apache.spark.sql.SparkSession,
                          dir: String, values: Seq[Long] = Nil): Unit = {
    import java.io.File
    def parquetFiles(d: File): Array[File] =
      Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val partDirs = Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("value="))
      .filter(f => values.isEmpty ||
        values.contains(f.getName.stripPrefix("value=").toLong))
      .filter(f => parquetFiles(f).length > 1)
    partDirs.foreach { part =>
      val tmp = new File(part.getParentFile, "." + part.getName + ".compact")
      deleteTree(tmp)
      // partition-dir read: schema excludes the value column (it lives in
      // the directory name), so the rewritten file drops straight back in
      spark.read.parquet(part.toString).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val compacted = parquetFiles(tmp)
      require(compacted.length == 1,
        s"expected one compacted file in $tmp, found ${compacted.length}")
      Option(part.listFiles()).getOrElse(Array.empty)
        .filter(_.isFile).foreach(f => f.delete(): Unit)
      val dest = new File(part, compacted.head.getName)
      require(compacted.head.renameTo(dest), s"rename to $dest failed")
      deleteTree(tmp)
    }
  }

  /** The dispatch decision, exposed so callers (and specs) can see WHY a
    * plan was chosen: pre-filter iff the estimate is within
    * `fullScanThreshold` of the corpus (qdrant's `full_scan_threshold`
    * dial, expressed as a fraction rather than an absolute point count).
    */
  /** KEYWORD payload index — the string-valued sibling of [[PayloadIndex]]
    * (the backend's most common index type: `field_schema: "keyword"`).
    * Same layout (postings `partitionBy(value)`, per-value counts as
    * model state — a keyword field's vocabulary), same plan dispatch,
    * same serving arms. Values must be non-null AND non-empty: parquet's
    * Hive-style partition encoding folds BOTH into the default partition,
    * and [[readKeywordIndex]] fails loudly when it finds one (normalize
    * or filter before writing). Arbitrary other characters are safe —
    * the partition codec percent-escapes them and decodes on read.
    */
  final case class KeywordIndex(postings: DataFrame, stats: Seq[(String, Long)],
                                covering: Seq[String] = Nil) {
    lazy val total: Long = stats.map(_._2).sum
    private lazy val byValue = stats.toMap
    /** Estimated rows matching `value IN (values)` — exact while the
      * index covers every row.
      */
    def estimate(values: Seq[String]): Long =
      values.distinct.map(v => byValue.getOrElse(v, 0L)).sum
  }

  def buildKeywordIndex(df: DataFrame, idCol: String, value: Column,
                        covering: Seq[String] = Nil,
                        dir: String = ""): KeywordIndex = {
    val target =
      if (dir.nonEmpty) dir
      else {
        val tmp = java.nio.file.Files.createTempDirectory("graft-keyword-idx")
        Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(tmp.toFile)))
        tmp.toString
      }
    writeKeywordIndex(df, idCol, value, covering, target)
    readKeywordIndex(df.sparkSession, target, covering)
  }

  /** Same write contract as [[writePayloadIndex]]: `mode = "append"` is
    * incremental maintenance, [[compactPayloadIndex]] rewrites
    * accumulated delta files (it walks `value=` partition directories —
    * the layout is identical, so it serves both index kinds).
    */
  def writeKeywordIndex(df: DataFrame, idCol: String, value: Column,
                        covering: Seq[String], dir: String,
                        mode: String = "overwrite"): Unit =
    df.select(value.cast(StringType).as("value") +:
        col(idCol).as("id") +: covering.map(col): _*)
      .write.mode(mode).partitionBy("value").parquet(dir)

  def readKeywordIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
                       covering: Seq[String] = Nil): KeywordIndex = {
    // cast unwraps partition-type inference (an all-numeric keyword
    // vocabulary would infer int) while keeping value-pruning intact
    val postings = spark.read.parquet(dir)
      .withColumn("value", col("value").cast(StringType))
    val stats = postings.groupBy(col("value")).agg(count(lit(1)).as("n"))
      .collect().map { r =>
        require(!r.isNullAt(0),
          s"keyword index at $dir has null/empty-valued postings " +
            "(__HIVE_DEFAULT_PARTITION__): keyword values must be non-null " +
            "and non-empty — normalize or filter before writeKeywordIndex")
        (r.getString(0), r.getLong(1))
      }.toSeq.sortBy(_._1)
    KeywordIndex(postings, stats, covering)
  }

  def chooseKeyword(idx: KeywordIndex, values: Seq[String],
                    fullScanThreshold: Double): PlanChoice = {
    require(fullScanThreshold > 0 && fullScanThreshold <= 1,
      s"fullScanThreshold must be a fraction in (0, 1], got $fullScanThreshold")
    val est = idx.estimate(values)
    PlanChoice(est <= fullScanThreshold * idx.total, est, idx.total)
  }

  /** Keyword-filtered top-k: identical plan dispatch and serving arms as
    * [[searchFilteredPlanned]], over the string-valued index.
    */
  def searchFilteredKeyword(stored: DataFrame, centroids: DataFrame,
                            idx: KeywordIndex, idCol: String, vecCol: String,
                            values: Seq[String], rowPredicate: Column,
                            query: Column, k: Int, nprobe: Int,
                            fullScanThreshold: Double = 0.2,
                            broadcastLimit: Long = 100000L,
                            metric: String = "cosine",
                            roundTo: Int = 6): DataFrame =
    serve(stored, centroids, idx.postings, idx.covering, idCol, vecCol,
      col("value").isin(values: _*),
      chooseKeyword(idx, values, fullScanThreshold),
      rowPredicate, query, k, nprobe, broadcastLimit, metric, roundTo)

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
    serve(stored, centroids, idx.postings, idx.covering, idCol, vecCol,
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
    serve(stored, centroids, idx.postings, idx.covering, idCol, vecCol,
      col("value") >= lo && col("value") <= hi,
      PlanChoice(est <= fullScanThreshold * idx.total, est, idx.total),
      rowPredicate, query, k, nprobe, broadcastLimit, metric, roundTo)
  }

  /** Multi-index plan: which arm, and which index DRIVES the pre-filter
    * intersection. qdrant keeps several payload indexes and estimates
    * each condition's cardinality; the intersection's upper bound is the
    * MINIMUM estimate, so the pre-filter arm is viable whenever the
    * cheapest index alone is selective enough — the other condition only
    * shrinks the set further.
    */
  final case class MultiPlanChoice(prefilter: Boolean, driveFirst: Boolean,
                                   estA: Long, estB: Long, total: Long)

  def chooseMulti(idxA: PayloadIndex, valuesA: Seq[Long],
                  idxB: PayloadIndex, valuesB: Seq[Long],
                  fullScanThreshold: Double): MultiPlanChoice = {
    require(fullScanThreshold > 0 && fullScanThreshold <= 1,
      s"fullScanThreshold must be a fraction in (0, 1], got $fullScanThreshold")
    val estA = idxA.estimate(valuesA)
    val estB = idxB.estimate(valuesB)
    MultiPlanChoice(
      math.min(estA, estB) <= fullScanThreshold * idxA.total,
      estA <= estB, estA, estB, idxA.total)
  }

  /** Filtered top-k under a conjunction of TWO indexed conditions
    * (`valueA IN valuesA AND valueB IN valuesB`), the multi-payload-index
    * query qdrant plans by intersecting candidate sets. Pre-filter arm:
    * both posting reads are value-pruned, the CHEAPER one drives (scans
    * its matching partitions), the other resolves to an id set that
    * semi-joins it — broadcast while small, shuffled beyond
    * `broadcastLimit`. With a covering driver the corpus is never
    * touched: scan work = driver's matching rows + the residual id read.
    * Post-filter arm (both conditions unselective): the probed IVF scan
    * with BOTH row predicates applied before ranking. `rowPredicateA/B`
    * must be the row-level equivalents of the two value conditions.
    */
  def searchFilteredMulti(stored: DataFrame, centroids: DataFrame,
                          idxA: PayloadIndex, valuesA: Seq[Long],
                          rowPredicateA: Column,
                          idxB: PayloadIndex, valuesB: Seq[Long],
                          rowPredicateB: Column,
                          idCol: String, vecCol: String,
                          query: Column, k: Int, nprobe: Int,
                          fullScanThreshold: Double = 0.2,
                          broadcastLimit: Long = 100000L,
                          metric: String = "cosine",
                          roundTo: Int = 6): DataFrame = {
    val c = chooseMulti(idxA, valuesA, idxB, valuesB, fullScanThreshold)
    if (c.prefilter) {
      val (drive, driveVals, resid, residVals, residEst) =
        if (c.driveFirst) (idxA, valuesA, idxB, valuesB, c.estB)
        else (idxB, valuesB, idxA, valuesA, c.estA)
      val residIds = resid.postings
        .filter(col("value").isin(residVals: _*)).select(col("id"))
      val residFrame =
        if (residEst <= broadcastLimit) broadcast(residIds) else residIds
      val driven = drive.postings
        .filter(col("value").isin(driveVals: _*))
        .join(residFrame, Seq("id"), "left_semi")
      if (drive.covering.contains(vecCol))
        driven
          .select(col("id"),
            round(Search.similarity(col(vecCol), query, metric), roundTo).as("score"))
          .orderBy(col("score").desc, col("id").asc)
          .limit(k)
      else {
        val ids = driven.select(col("id"))
        val idFrame = if (math.min(c.estA, c.estB) <= broadcastLimit)
          broadcast(ids) else ids
        stored.join(idFrame, stored(idCol) === idFrame("id"), "left_semi")
          .select(col(idCol).as("id"),
            round(Search.similarity(col(vecCol), query, metric), roundTo).as("score"))
          .orderBy(col("score").desc, col("id").asc)
          .limit(k)
      }
    } else {
      val probed = Ann.probedClusters(centroids, query, nprobe)
      stored.filter(col("cluster").isin(probed: _*))
        .filter(rowPredicateA && rowPredicateB)
        .select(col(idCol).as("id"),
          round(Search.similarity(col(vecCol), query, metric), roundTo).as("score"))
        .orderBy(col("score").desc, col("id").asc)
        .limit(k)
    }
  }

  private def serve(stored: DataFrame, centroids: DataFrame,
                    postings: DataFrame, covering: Seq[String],
                    idCol: String, vecCol: String,
                    postingsPred: Column, c: PlanChoice,
                    rowPredicate: Column, query: Column, k: Int, nprobe: Int,
                    broadcastLimit: Long, metric: String,
                    roundTo: Int): DataFrame = {
    if (c.prefilter && covering.contains(vecCol)) {
      // covering index: the filter's value partitions ARE the candidate
      // set — scan only them (static pruning, PlannerSpec), score, top-k.
      // Zero joins, zero corpus touch: scan work = matching rows.
      postings.filter(postingsPred)
        .select(col("id"),
          round(Search.similarity(col(vecCol), query, metric), roundTo).as("score"))
        .orderBy(col("score").desc, col("id").asc)
        .limit(k)
    } else if (c.prefilter) {
      // id-only index: resolve ids through the value-pruned postings,
      // exact-score only those rows. Broadcast the id set while it is
      // small; beyond broadcastLimit a shuffled semi-join keeps both
      // sides distributed (left_semi either way).
      val ids = postings.filter(postingsPred)
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
