package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Supervised document classification for pipeline curation — the
  * "quality / domain classifier" stage of a training-data pipeline
  * (DCLM / FineWeb-style: a cheap linear classifier trained on labeled
  * seed data routes or filters the raw pool; the public fastText recipe
  * is exactly a linear model over hashed n-gram features).
  *
  * Multinomial Naive Bayes over the same hashed unigram+bigram feature
  * space as [[Dsir]] ([[Dsir.featureBuckets]] — ONE
  * `word_shingle_hashes` kernel pass per corpus, folded into a fixed
  * `buckets` dimension so model size is `buckets * classes`, never
  * vocabulary-sized). Spark-first cost shape:
  *
  *   - TRAIN (offline, like every stored index here): one feature pass
  *     + one partial-aggregating (bucket, class) groupBy; everything
  *     downstream of that ≤ buckets*classes rows — token totals and doc
  *     priors are derived from the counts table / a no-explode doc agg,
  *     so the corpus is read exactly once.
  *   - CLASSIFY (the serving path): one feature pass over the scored
  *     corpus, a BROADCAST join against the (bucket -> per-class weight
  *     ARRAY) table — one joined row per FEATURE, not per
  *     feature*class — one per-doc partial agg folding the arrays, and
  *     a map-side argmax over the class array. No window, nothing ever
  *     shuffles wider than (doc, classes-array).
  *
  * Float determinism (the oracle contract): each class's feature
  * weights fold in feature-position order (the element-wise array fold
  * adds every class's weight in the same sequence a per-class fold
  * would); the class prior adds LAST; totals round to 6dp before the
  * argmax; ties break to the first class in ascending name order —
  * bit-reproducible in any engine (DuckMirror.nbSql).
  */
object Classify {

  /** A trained model: `classes` ascending, parallel `priors` (ln of doc
    * frequency), the (bucket, per-class weight array) table — model
    * state, ≤ `buckets` rows, broadcast into classification — and the
    * `buckets` modulus the features were hashed into (classification
    * must fold with the same modulus).
    */
  final case class NbModel(classes: Seq[String], priors: Seq[Double],
                           weights: DataFrame, buckets: Int)

  private def feats(d: DataFrame, keep: Seq[Column], textCol: String,
                    buckets: Int) = d.select(
    keep :+ posexplode(Dsir.featureBuckets(col(textCol), buckets))
      .as(Seq("pos", "b")): _*)

  /** Fit the model on `labeled` (`labelCol` string classes) with
    * add-`alpha` smoothing: ln p̂(b|c) = ln((count(b,c) + alpha) /
    * (tokens_c + alpha*buckets)) for EVERY observed bucket x class
    * (absent pairs smooth to the floor — unseen-feature evidence counts
    * against a class), priors ln(docs_c / docs).
    */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
            buckets: Int, alpha: Double = 0.5): NbModel = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val trF = feats(labeled, Seq(col(labelCol).as("__cls")), textCol, buckets)
    // the ONE corpus-sized aggregation; everything below is model-sized
    val counts = trF.groupBy(col("b"), col("__cls"))
      .agg(count(lit(1)).as("c")).localCheckpoint()
    val tokenTotals = counts.groupBy(col("__cls")).agg(sum(col("c")).as("tn"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // priors over ALL training docs (empty docs still count) — a
    // no-explode aggregate over the labeled frame
    val docCounts = labeled.groupBy(col(labelCol)).agg(count(lit(1)).as("dc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq.sortBy(_._1)
    val nDocs = docCounts.map(_._2).sum.toDouble
    val classes = docCounts.map(_._1)
    val priors = docCounts.map { case (_, dc) => math.log(dc.toDouble / nDocs) }
    // per-class smoothed denominators inline as exact double literals,
    // so the oracle divides by the bit-identical values
    val dens = classes.map(c =>
      tokenTotals.getOrElse(c, 0L).toDouble + alpha * buckets)
    val ws = array(classes.zip(dens).map { case (c, den) =>
      log((coalesce(max(when(col("__cls") === c, col("c"))), lit(0L))
        .cast(DoubleType) + alpha) / lit(den))
    }: _*)
    NbModel(classes, priors, counts.groupBy(col("b")).agg(ws.as("ws")), buckets)
  }

  /** Classify `score` under `model`: (idCol, pred, score) — the argmax
    * class per document and its rounded log-posterior Σ ln p̂(b|c) +
    * ln p̂(c). Documents with no tokens (or none of the model's buckets)
    * carry no evidence and are absent from the output.
    */
  def classify(score: DataFrame, model: NbModel, idCol: String,
               textCol: String): DataFrame = {
    val n = model.classes.length
    val priorsLit = array(model.priors.map(lit(_)): _*)
    val classesLit = array(model.classes.map(lit(_)): _*)
    val scF = feats(score, Seq(col(idCol)), textCol, model.buckets)
    scF.join(broadcast(model.weights), Seq("b"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("pos"), col("ws"))).as("__lw"))
      .select(col(idCol),
        // pos_ordered_vec_sum: the identical position-ordered
        // elementwise fold (same IEEE adds per class) in one compiled
        // kernel call — the array_sort comparator and the nested
        // aggregate/zip_with lambdas all interpreted per element
        zip_with(
          graft.functions.pos_ordered_vec_sum(col("__lw")),
          priorsLit, (s, p) => round(s + p, 6)).as("__tot"))
      .select(col(idCol),
        element_at(classesLit,
          array_position(col("__tot"), array_max(col("__tot"))).cast(IntegerType))
          .as("pred"),
        array_max(col("__tot")).as("score"))
  }

  /** MAP-SIDE classification: the weight table COLLECTS to the driver
    * (model state — ≤ buckets rows of class-weight arrays) and re-enters
    * as a dense codegen reference table, so scoring is a single codegen projection: no
    * join, no aggregation, NO SHUFFLE — which means it runs unchanged on
    * an unbounded Structured-Streaming ingest (StreamingSpec proves
    * stream == batch prediction-for-prediction). Bit-identical to
    * [[classify]]: features fold in the same position order (absent
    * buckets filter out exactly as the inner join drops them), the prior
    * adds last, 6dp round, first-max argmax.
    */
  def classifyMapSide(score: DataFrame, model: NbModel, idCol: String,
                      textCol: String): DataFrame = {
    val n = model.classes.length
    val weights: Map[Long, Seq[Double]] = model.weights.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // DENSE weight table as a codegen REFERENCE OBJECT (double[][], null
    // row = bucket the model never saw): bucket_vec_sum skips unseen
    // buckets and elementwise-adds the rest in feature-position order —
    // the identical IEEE sequence as the former filter-HOF +
    // aggregate/zip_with lambda stack (which interpreted element_at into
    // a 512-entry array LITERAL per feature), in one compiled kernel
    // call per doc. n_matched > 0 == the old size(filtered fb) > 0 drop.
    val wArr2d: Array[Array[Double]] = Array.tabulate(model.buckets)(b =>
      weights.get(b.toLong).map(_.toArray).orNull)
    val priorsLit = array(model.priors.map(lit(_)): _*)
    val classesLit = array(model.classes.map(lit(_)): _*)
    score.select(col(idCol),
        graft.functions.bucket_vec_sum(
          Dsir.featureBuckets(col(textCol), model.buckets), wArr2d, n)
          .as("__bv"))
      .filter(col("__bv.n_matched") > 0)
      .select(col(idCol),
        zip_with(col("__bv.sums"),
          priorsLit, (s, p) => round(s + p, 6)).as("__tot"))
      .select(col(idCol),
        element_at(classesLit,
          array_position(col("__tot"), array_max(col("__tot"))).cast(IntegerType))
          .as("pred"),
        array_max(col("__tot")).as("score"))
  }

  /** One-shot convenience: fit on `train` and classify `score`. */
  def naiveBayes(train: DataFrame, score: DataFrame, idCol: String,
                 textCol: String, labelCol: String, buckets: Int,
                 alpha: Double = 0.5): DataFrame =
    classify(score, this.train(train, textCol, labelCol, buckets, alpha),
      idCol, textCol)
}
