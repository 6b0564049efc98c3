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
    // pmod_array: compiled elementwise floorMod — the transform HOF
    // interpreted its pmod lambda per hash (identical values; pmod ==
    // floorMod for a positive modulus)
    concat(
      pmod_array(word_shingle_hashes(text, 1), buckets.toLong),
      pmod_array(word_shingle_hashes(text, 2), buckets.toLong))

  /** Score `raw`'s documents against a `target` corpus: returns
    * (idCol, n_features, logratio) with logratio = Σ_features
    * [ln p̂_t(b) − ln p̂_r(b)] under add-`alpha` smoothed bucket models,
    * rounded to 6dp. Documents with no tokens carry no evidence and are
    * absent from the output (the caller decides their fate).
    *
    * Execution shape: each model is ONE feature pass + one partial-agg
    * shuffle of ≤ buckets keys, collected to the driver (bounded model
    * state — the model IS ≤ `buckets` counts by construction). Feature
    * totals fall out of the models (Σ counts), so no separate count
    * jobs run. The per-bucket ln-ratio weights are computed once on the
    * driver with StrictMath.log — bit-identical to the engine's `log`
    * codegen, same double sequence as the previous per-bucket SQL
    * expression — and shipped as one array<double> literal; scoring is
    * then a single MAP-SIDE pass over raw (no explode, no join, no
    * per-doc collect_list shuffle): fold the position-ordered feature
    * array through the weight table, which is the same
    * feature-position-order float sum as before.
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
                        textCol: String, buckets: Int,
                        alpha: Double = 0.5): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // bucket-count model: Array[Long] of length `buckets` (absent = 0)
    def model(d: DataFrame): Array[Long] = {
      val m = new Array[Long](buckets)
      d.select(explode(featureBuckets(col(textCol), buckets)).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("c"))
        .collect().foreach { r =>
          val b = r.getLong(0)
          // featureBuckets pmods into [0, buckets) — fail loudly if a
          // future feature-kernel change breaks that contract (r19 ADVICE)
          require(b >= 0 && b < buckets,
            s"feature bucket $b outside [0, $buckets) — featureBuckets " +
              "must pmod into the model range")
          m(b.toInt) = r.getLong(1)
        }
      m
    }
    val rawM = model(raw)
    val tgtM = model(target)
    // totals = Σ model counts (what the feature-row count used to be);
    // smoothed denominators in one double expression each, as before
    val rDen = rawM.sum.toDouble + alpha * buckets
    val tDen = tgtM.sum.toDouble + alpha * buckets
    // per-bucket weight, identical IEEE op sequence to the former SQL
    // expression: (count.toDouble + alpha) / den, ln via StrictMath
    // (Spark's own log codegen), then the difference
    val w = Array.tabulate(buckets) { b =>
      StrictMath.log((tgtM(b).toDouble + alpha) / tDen) -
        StrictMath.log((rawM(b).toDouble + alpha) / rDen)
    }
    raw.select(col(idCol), featureBuckets(col(textCol), buckets).as("__fb"))
      .where(col("__fb").isNotNull && size(col("__fb")) > 0)
      .select(col(idCol),
        size(col("__fb")).as("n_features"),
        // weighted_bucket_sum: the identical left-assoc IEEE fold the
        // interpreted aggregate-HOF + element_at-literal form computed,
        // in one compiled kernel call per doc
        round(weighted_bucket_sum(col("__fb"), w), 6).as("logratio"))
  }
}
