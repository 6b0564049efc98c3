package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
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
  *   - TRAIN: one feature pass + one partial-aggregating groupBy per
  *     (bucket, class) — the model is a ≤ buckets*classes row table plus
  *     per-class scalars (token totals, doc priors), all model state.
  *   - SCORE: one feature pass over the scored corpus, a BROADCAST join
  *     against the weight table, one (doc, class) partial agg, and a
  *     per-doc window over `classes` rows for the argmax. The corpus
  *     never shuffles by anything wider than (doc_id, class).
  *
  * Float determinism (the oracle contract): per-(doc, class) feature
  * weights fold in feature-position order; the class prior adds LAST;
  * the total rounds to 6dp before the argmax, ties broken by class name
  * ascending — bit-reproducible in any engine (DuckMirror.nbSql).
  */
object Classify {

  /** Train on `train` (labeled: `labelCol` string classes) and classify
    * `score`: returns (idCol, pred, score) — the argmax class per scored
    * document and its rounded log-posterior Σ ln p̂(b|c) + ln p̂(c).
    * Add-`alpha` smoothing over the bucketed feature space; documents
    * with no tokens carry no evidence and are absent from the output.
    */
  def naiveBayes(train: DataFrame, score: DataFrame, idCol: String,
                 textCol: String, labelCol: String, buckets: Int,
                 alpha: Double = 0.5): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val spark = train.sparkSession

    def feats(d: DataFrame, keep: Seq[String]) = d.select(
      keep.map(col) :+
        posexplode(Dsir.featureBuckets(col(textCol), buckets))
          .as(Seq("pos", "b")): _*)

    val trF = feats(train, Seq(labelCol)).withColumnRenamed(labelCol, "__cls")

    // model state: per-class token totals (smoothed denominators) and
    // per-class doc counts (priors over ALL training docs, empty included)
    val tokenTotals = trF.groupBy(col("__cls")).agg(count(lit(1)).as("tn"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val docCounts = train.groupBy(col(labelCol)).agg(count(lit(1)).as("dc"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).sortBy(_._1)
    val nDocs = docCounts.map(_._2).sum.toDouble
    // the per-class scalars inline as exact double literals, so the
    // oracle divides/adds the bit-identical values
    val classRows = docCounts.map { case (c, dc) =>
      Row(c, tokenTotals.getOrElse(c, 0L).toDouble + alpha * buckets,
        math.log(dc.toDouble / nDocs))
    }
    val classDf = spark.createDataFrame(
      spark.sparkContext.parallelize(classRows, 1),
      StructType(Seq(StructField("__cls", StringType),
        StructField("__den", DoubleType), StructField("__prior", DoubleType))))

    // weight table: EVERY observed bucket x EVERY class (absent pairs
    // smooth to alpha/den — the cross join is what makes unseen-feature
    // evidence count against a class)
    val counts = trF.groupBy(col("b"), col("__cls")).agg(count(lit(1)).as("c"))
    val wtab = counts.select("b").distinct()
      .crossJoin(broadcast(classDf))
      .join(counts, Seq("b", "__cls"), "left")
      .select(col("b"), col("__cls"), col("__prior"),
        log((coalesce(col("c"), lit(0L)).cast(DoubleType) + alpha) / col("__den"))
          .as("w"))

    val scF = feats(score, Seq(idCol))
    scF.join(broadcast(wtab), Seq("b"))
      .groupBy(col(idCol), col("__cls"))
      .agg(array_sort(collect_list(struct(col("pos"), col("w")))).as("__lw"),
        first(col("__prior")).as("__prior"))
      .select(col(idCol), col("__cls"),
        round(aggregate(col("__lw"), lit(0.0), (acc, x) => acc + x("w")) +
          col("__prior"), 6).as("score"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("score").desc, col("__cls").asc)))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("__cls").as("pred"), col("score"))
  }
}
