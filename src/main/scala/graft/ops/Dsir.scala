package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions._

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling" — the public hashed-ngram
  * recipe): score every raw document by the log importance weight
  * log p_target(x) − log p_raw(x) under two bag-of-hashed-ngram unigram
  * models, one fit on a small TARGET corpus (the distribution you want
  * more of) and one on the RAW pool. High-weight documents look like the
  * target; resampling/thresholding on the weight is the selection step
  * (compose with [[Search.weightedSample]] / top-N).
  *
  * Spark-first shape: features are hashed unigrams + bigrams from the
  * ONE-pass [[graft.functions.word_shingle_hashes]] kernel folded into
  * `buckets` (fixed model dimension, the paper's trick — model size is
  * `buckets`, not vocabulary size). Each model is a bucket-count
  * aggregate (model state, ≤ buckets rows, broadcast into scoring); the
  * corpus is touched by exactly one feature pass + one partial-agg
  * shuffle per model, and scoring is a broadcast join + per-doc fold.
  * Weights sum in feature-position order (the engine's deterministic
  * float-sum convention), rounded at the end — value-checked against
  * the DuckDB mirror that re-derives the hash, the models, and the fold
  * (DuckMirror.dsirSql).
  */
object Dsir {

  /** A document's hashed feature-bucket sequence: unigram buckets in
    * token order, then bigram buckets in position order —
    * `floorMod(hash64, buckets)` over the shingle kernel's hashes.
    */
  def featureBuckets(text: Column, buckets: Int): Column =
    concat(
      transform(word_shingle_hashes(text, 1), h => pmod(h, lit(buckets.toLong))),
      transform(word_shingle_hashes(text, 2), h => pmod(h, lit(buckets.toLong))))

  /** Score `raw`'s documents against a `target` corpus: returns
    * (idCol, n_features, logratio) with logratio = Σ_features
    * [ln p̂_t(b) − ln p̂_r(b)] under add-`alpha` smoothed bucket models,
    * rounded to 6dp. Documents with no tokens carry no evidence and are
    * absent from the output (the caller decides their fate).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, buckets: Int,
                        alpha: Double = 0.5): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    def feats(d: DataFrame) = d.select(col(idCol),
      posexplode(featureBuckets(col(textCol), buckets)).as(Seq("pos", "b")))
    val rawF = feats(raw)
    val tgtF = feats(target)
    val rawM = rawF.groupBy(col("b")).agg(count(lit(1)).as("rc"))
    val tgtM = tgtF.groupBy(col("b")).agg(count(lit(1)).as("tc"))
    // totals are model state (two scalars); the smoothed denominators are
    // computed HERE in one double expression each and inlined as
    // literals, so the oracle divides by the bit-identical doubles
    val rDen = rawF.count().toDouble + alpha * buckets
    val tDen = tgtF.count().toDouble + alpha * buckets
    val wtab = rawM.join(tgtM, Seq("b"), "full_outer")
      .select(col("b"),
        (log((coalesce(col("tc"), lit(0L)).cast(DoubleType) + alpha) / tDen) -
          log((coalesce(col("rc"), lit(0L)).cast(DoubleType) + alpha) / rDen))
          .as("w"))
    rawF.join(broadcast(wtab), Seq("b"))
      .groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("pos"), col("w")))).as("__lw"))
      .select(col(idCol),
        size(col("__lw")).as("n_features"),
        round(aggregate(col("__lw"), lit(0.0), (acc, x) => acc + x("w")), 6)
          .as("logratio"))
  }
}
