package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data cleaning pipeline composing the individual
  * operators: annotate -> exact-dedup -> near-dedup -> quality filter.
  *
  * Shape at scale: one map-side annotation pass (all text analysis columns
  * in a single projection), one fingerprint groupBy (exact dedup), one
  * LSH-bounded candidate join (near dedup), one filter. Nothing quadratic,
  * nothing driver-side; every stage is a DataFrame the caller can persist,
  * checkpoint, or write between stages.
  */
object Pipeline {

  final case class CleanStats(input: Long, afterExact: Long,
                              afterNear: Long, afterQuality: Long)

  /** Annotate every document with the text-analysis columns (one
    * projection, codegen'd).
    */
  def annotate(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)))
      .withColumn("stopword_ratio", round(TextAnalysis.stopwordRatio(col(textCol)), 6))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .withColumn("fingerprint", TextAnalysis.fingerprint(col(textCol)))

  /** Corpus snapshot DIFF — the dataset-versioning primitive ("what
    * changed between crawl N-1 and crawl N"): each side reduces to
    * (id, content fingerprint) map-side, ONE full-outer id join decides
    * added / removed / changed / unchanged per document. At 100 TB the
    * join carries two longs per doc (never text), and with both
    * snapshots bucketed by id it is co-located. Fingerprint equality
    * stands in for content equality (the standard dataset-diff trade;
    * both engines hash identically, so the verdicts agree bit-for-bit).
    */
  def corpusDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    import graft.functions.fingerprint64
    val o = oldDf.select(col(idCol), fingerprint64(col(textCol)).as("__fpo"))
    val n = newDf.select(col(idCol), fingerprint64(col(textCol)).as("__fpn"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__fpo").isNull, lit("added"))
          .when(col("__fpn").isNull, lit("removed"))
          .when(col("__fpo") =!= col("__fpn"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Keep one representative per exact-duplicate group (smallest id).
    * ONE exchange (rows hash-partitioned by fingerprint) + a frameless
    * min window + filter — the keeper-aggregate + id semi-join form
    * moved the same rows by id AND the (fingerprint, id) pairs by
    * fingerprint; this moves the rows once (probed 2x faster at sf0.1,
    * same survivor set: id == min(id) over the fingerprint group).
    */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.fingerprint64
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))
    df.withColumn("__fp", fingerprint64(col(textCol)))
      .withColumn("__mn", min(col(idCol)).over(w))
      .filter(col(idCol) === col("__mn"))
      .drop("__fp", "__mn")
  }

  /** Drop the higher-id member of every verified near-duplicate pair. */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
                         threshold: Double): DataFrame = {
    val losers = Dedup.minhashDedup(df, idCol, textCol, threshold)
      .select(col("b_id").as(idCol)).distinct()
    df.join(losers, Seq(idCol), "left_anti")
  }

  /** Keep exactly ONE representative (the min id) per near-duplicate
    * CLUSTER — the transitive form of [[dropNearDuplicates]]: over the
    * same LSH-verified pairs, a chain a~b~c keeps only a, even though
    * (a, c) was never itself a verified pair. Costs the connected-
    * components propagation on top of the pair join
    * (Dedup.dedupClustersMinhash — iteration state scales with the pair
    * list, not the corpus).
    */
  def dropNearDuplicateClusters(df: DataFrame, idCol: String, textCol: String,
                                threshold: Double): DataFrame =
    survivorsFromClusters(df, idCol,
      Dedup.dedupClustersMinhash(df, idCol, textCol, threshold))

  /** Survivor selection from PRECOMPUTED cluster labels — the form a
    * production pipeline runs: cluster labeling is one offline batch
    * stage whose output (id, component) its consumers read (this
    * selection, leakage-safe splits, contrastive pair-gen), so the CC
    * propagation is paid once per ingest, not once per consumer. Keeps
    * the min-id representative (the label) of every cluster.
    */
  def survivorsFromClusters(df: DataFrame, idCol: String,
                            clusters: DataFrame): DataFrame = {
    val reps = clusters.filter(col("id") === col("component"))
      .select(col("id").as(idCol))
    df.join(reps, Seq(idCol), "left_semi")
  }

  /** Full pipeline: returns the cleaned, annotated corpus. */
  def cleanCorpus(df: DataFrame, idCol: String, textCol: String,
                  nearDupThreshold: Double = 0.9,
                  minQuality: Double = 0.1): DataFrame = {
    val exact = dropExactDuplicates(df, idCol, textCol)
    val near = dropNearDuplicates(exact, idCol, textCol, nearDupThreshold)
    annotate(near, idCol, textCol).filter(col("quality") >= minQuality)
  }

  /** Rendezvous (highest-random-weight) shard assignment: shard(row) =
    * argmax over shards of md5(id # shard). Unlike the mod-N assignment
    * ([[graft.SparkEntry]]'s shard_export), growing N -> N+1 moves only
    * ~1/(N+1) of the rows (the ones the NEW shard wins) — the property
    * that makes resharding a 100 TB dataset an incremental copy instead
    * of a full reshuffle. Pure map-side arithmetic until one
    * partial-aggregating argmax per row; deterministic on any engine
    * (md5 hex compares bytewise in both).
    */
  def rendezvousAssign(df: DataFrame, idCol: String, nShards: Int,
                       out: String = "shard"): DataFrame = {
    require(nShards >= 1)
    df.withColumn("__i", explode(sequence(lit(0), lit(nShards - 1))))
      .withColumn("__h", md5(concat(col(idCol).cast("string"), lit("#"),
        col("__i").cast("string"))))
      .groupBy(df.columns.map(col): _*)
      .agg(max_by(col("__i"), col("__h")).cast("int").as(out))
  }

  /** 2-D PARETO FRONT (skyline) selection per group: keep rows no other
    * row STRICTLY dominates — ∃A with cost_A < cost_B AND value_A >
    * value_B kills B ("a shorter doc with higher quality exists"). The
    * data-selection lens when two objectives trade off (quality vs
    * token budget): the survivors ARE the efficient frontier a
    * budget-constrained selector walks. One numeric-RANGE window — max
    * value over strictly-lower cost — replaces the naive quadratic
    * dominance self-join: O(n log n) sort per group, no pair
    * materialization, AQE-splittable like any window. `costCol` must be
    * numeric (RANGE frame); ties in cost see only strictly cheaper rows,
    * which is exactly strict dominance.
    */
  def paretoFront(df: DataFrame, groupCols: Seq[String], costCol: String,
                  valueCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(col(costCol).asc)
      .rangeBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("__mv", max(col(valueCol)).over(w))
      .filter(col("__mv").isNull || col("__mv") <= col(valueCol))
      .drop("__mv")
  }
}
