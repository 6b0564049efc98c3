package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Vector-search operator compositions (SURVEY.md §2.C).
  *
  * Each helper is a declarative DataFrame composition: scoring happens
  * map-side inside whole-stage codegen (native expressions), top-k compiles
  * to Spark's `TakeOrderedAndProject` (per-partition heap + driver merge of
  * k rows — no full sort, no shuffle of the corpus), and id->vector lookups
  * broadcast the tiny side. All of it scales linearly with corpus partitions
  * on a real cluster.
  */
object Search {

  /** Metric-parameterized similarity (higher = better): cosine | dot |
    * euclid (negated distance so ORDER BY DESC is uniform).
    */
  def similarity(vec: Column, query: Column, metric: String): Column =
    metric.toLowerCase match {
      case "cosine" => v_cosine(vec, query)
      case "dot"    => v_dot(vec, query)
      case "euclid" | "euclidean" | "l2" => -v_euclid(vec, query)
      case "manhattan" | "l1" => -v_manhattan(vec, query)
      case m => throw new IllegalArgumentException(s"unknown metric '$m'")
    }

  /** V_SEARCH core: score `vecCol` against `query`, return top-k.
    * Deterministic: ties broken by `idCol` ascending; score rounded to
    * `roundTo` decimals BEFORE ranking so the oracle orders identically.
    */
  def topK(df: DataFrame, vecCol: Column, query: Column, k: Int,
           metric: String = "cosine", idCol: Column = col("id"),
           scoreName: String = "score", roundTo: Int = 6): DataFrame = {
    df.withColumn(scoreName, round(similarity(vecCol, query, metric), roundTo))
      .orderBy(col(scoreName).desc, idCol.asc)
      .limit(k)
  }

  /** V_SEARCH('id') by-point-id form: look the query vector up in the
    * collection itself (broadcast 1-row join), score everything else.
    */
  def topKById(df: DataFrame, vecColName: String, queryId: String, k: Int,
               metric: String = "cosine", roundTo: Int = 6): DataFrame = {
    val q = df.filter(col("id") === lit(queryId))
      .select(col(vecColName).as("__qvec"))
    val scored = df.filter(col("id") =!= lit(queryId)).crossJoin(broadcast(q))
    topK(scored, col(vecColName), col("__qvec"), k, metric, roundTo = roundTo)
      .drop("__qvec")
  }

  /** Element-wise centroid of the vectors of `ids` (1-row DataFrame,
    * array<double>). Uses the native v_avg aggregate: each partition folds
    * its vectors into one (sums, count) buffer map-side — no explode, no
    * per-dimension shuffle rows.
    */
  private def centroid(df: DataFrame, vecColName: String, ids: Seq[String],
                       outName: String): DataFrame =
    df.filter(col("id").isin(ids: _*))
      .agg(v_avg(col(vecColName)).as(outName))

  /** V_RECOMMEND([pos_ids], [neg_ids]): Qdrant's `average_vector` recommend
    * strategy — composite query = avg(positives) - avg(negatives) (no
    * negatives = positives centroid alone), then dense top-k. Spec shape:
    * /root/reference/tests/bin/tests.sql:83-114.
    *
    * The example centroids resolve EAGERLY (one tiny v_avg job each —
    * model state, like a query-vector lookup), so a positive/negative id
    * list matching nothing raises immediately with a clear message
    * instead of producing NULL scores, and the corpus pass carries the
    * composite as a literal — no lookup join at all.
    */
  def recommend(df: DataFrame, vecColName: String, posIds: Seq[String],
                negIds: Seq[String], k: Int, metric: String = "cosine",
                roundTo: Int = 6): DataFrame = {
    require(posIds.nonEmpty, "V_RECOMMEND needs at least one positive example")
    def centroidOf(ids: Seq[String], what: String): Seq[Double] = {
      val row = centroid(df, vecColName, ids, "c").head()
      require(!row.isNullAt(0),
        s"V_RECOMMEND: no $what example points found among [${ids.mkString(",")}]")
      row.getSeq[Double](0)
    }
    val posC = centroidOf(posIds, "positive")
    val qv =
      if (negIds.isEmpty) posC
      else {
        val negC = centroidOf(negIds, "negative")
        require(posC.length == negC.length,
          s"V_RECOMMEND: positive (dim ${posC.length}) and negative (dim " +
            s"${negC.length}) centroids disagree — example vectors must share one dimension")
        posC.zip(negC).map { case (p, n) => p - n }
      }
    val excluded = posIds ++ negIds
    topK(df.filter(!col("id").isin(excluded: _*)), col(vecColName), vec(qv),
      k, metric, roundTo = roundTo)
  }

  /** V_RECOMMEND vector-literal form (tests.sql:97-105): the caller
    * supplies example VECTORS, not point ids, so there is no lookup join
    * at all — the composite average_vector query (avg(pos) - avg(neg)) is
    * computed driver-side over the handful of literal examples and
    * broadcast as one literal column; scoring is a single map-side pass
    * over the corpus.
    */
  def recommendVectors(df: DataFrame, vecColName: String,
                       posVecs: Seq[Seq[Double]], negVecs: Seq[Seq[Double]],
                       k: Int, metric: String = "cosine",
                       roundTo: Int = 6): DataFrame = {
    require(posVecs.nonEmpty, "V_RECOMMEND needs at least one positive example")
    val dim = posVecs.head.length
    require((posVecs ++ negVecs).forall(_.length == dim),
      "all example vectors must share one dimension")
    def avg(vs: Seq[Seq[Double]], i: Int): Double = vs.map(_(i)).sum / vs.length
    val qv = (0 until dim).map { i =>
      if (negVecs.isEmpty) avg(posVecs, i)
      else avg(posVecs, i) - avg(negVecs, i)
    }
    topK(df, col(vecColName), vec(qv), k, metric, roundTo = roundTo)
  }

  /** V_RECOMMEND best_score strategy (the reference backend's alternative
    * to average_vector): score = max over positive examples of sim(v, p)
    * minus max over negative examples of sim(v, n); candidates scoring
    * closer to a negative than to any positive rank below everything that
    * doesn't. All example vectors broadcast; scoring stays map-side.
    */
  def recommendBestScore(df: DataFrame, vecColName: String,
                         posIds: Seq[String], negIds: Seq[String], k: Int,
                         metric: String = "cosine", roundTo: Int = 6): DataFrame = {
    require(posIds.nonEmpty, "V_RECOMMEND(best_score) needs at least one positive example")
    // resolve the example vectors eagerly (a handful of rows of model
    // state): missing ids raise clearly, and the scoring pass carries
    // them as literals — one map-side projection, zero joins
    val all = (posIds ++ negIds).distinct
    val found = df.filter(col("id").isin(all: _*))
      .select(col("id"),
        col(vecColName).cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val missing = all.filterNot(found.contains)
    require(missing.isEmpty,
      s"V_RECOMMEND(best_score): example points not found: [${missing.mkString(",")}]")
    val posBest = posIds.map(id => similarity(col(vecColName), vec(found(id)), metric))
      .reduce((a, b) => greatest(a, b))
    val negBest = negIds.map(id => similarity(col(vecColName), vec(found(id)), metric))
      .reduceOption((a, b) => greatest(a, b))
    val score = negBest.fold(posBest)(n => posBest - n)
    df.filter(!col("id").isin(all: _*))
      .withColumn("score", round(score, roundTo))
      .select(col("id"), col("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** V_RECOMMEND sum_scores strategy (the third strategy of the backend's
    * recommend API, alongside average_vector and best_score): score =
    * sum over positive examples of sim(v, p) minus sum over negative
    * examples of sim(v, n) — every example pulls, unlike best_score's
    * winner-take-all. Example vectors resolve eagerly to literals
    * (model state); scoring is one map-side projection, zero joins.
    */
  def recommendSumScores(df: DataFrame, vecColName: String,
                         posIds: Seq[String], negIds: Seq[String], k: Int,
                         metric: String = "cosine", roundTo: Int = 6): DataFrame = {
    require(posIds.nonEmpty, "V_RECOMMEND(sum_scores) needs at least one positive example")
    val all = (posIds ++ negIds).distinct
    val found = df.filter(col("id").isin(all: _*))
      .select(col("id"),
        col(vecColName).cast(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType)))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val missing = all.filterNot(found.contains)
    require(missing.isEmpty,
      s"V_RECOMMEND(sum_scores): example points not found: [${missing.mkString(",")}]")
    val posSum = posIds.map(id => similarity(col(vecColName), vec(found(id)), metric))
      .reduce((a, b) => a + b)
    val negSum = negIds.map(id => similarity(col(vecColName), vec(found(id)), metric))
      .reduceOption((a, b) => a + b)
    val score = negSum.fold(posSum)(n => posSum - n)
    df.filter(!col("id").isin(all: _*))
      .withColumn("score", round(score, roundTo))
      .select(col("id"), col("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** V_DISCOVER([target_id], [(ctx_id, weight), ...]): target-plus-context
    * scoring — score = sim(v, target) + sum_i w_i * sim(v, ctx_i). The
    * reference declares the call shape only (tests.sql:121-137, roadmap);
    * these semantics are a documented choice: a linear context-preference
    * blend. Context vectors are broadcast.
    */
  def discover(df: DataFrame, vecColName: String, targetId: String,
               context: Seq[(String, Double)], k: Int,
               metric: String = "cosine", roundTo: Int = 6): DataFrame = {
    val ctxIds = context.map(_._1)
    val tgt = df.filter(col("id") === lit(targetId)).select(col(vecColName).as("__t"))
    val base = df.filter(col("id") =!= lit(targetId) && !col("id").isin(ctxIds: _*))
    // one 1-row broadcast per context vector; the whole score is a map-side
    // column fold — no explode, no re-aggregation shuffle
    val withVecs = context.zipWithIndex.foldLeft(base.crossJoin(broadcast(tgt))) {
      case (acc, ((cid, _), i)) =>
        acc.crossJoin(broadcast(
          df.filter(col("id") === lit(cid)).select(col(vecColName).as(s"__c$i"))))
    }
    val score = context.zipWithIndex.foldLeft(
      similarity(col(vecColName), col("__t"), metric)) {
      case (acc, ((_, w), i)) =>
        acc + lit(w) * similarity(col(vecColName), col(s"__c$i"), metric)
    }
    withVecs.withColumn("score", round(score, roundTo))
      .select(col("id"), col("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Distribution-based score fusion (the reference host's `dbsf` option
    * beside RRF): each branch's scores are normalized to
    * (score - (mean - 3sd)) / (6sd) using that branch's own distribution,
    * then summed (absent-in-branch contributes 0). The moments are
    * computed over EXACT micro-integer scores (branch scores arrive
    * 6dp-rounded, so floor(s*1e6+0.5) is lossless): integer sums are
    * order-independent, which makes the fused output identical on any
    * partitioning — a double avg/stddev would not be. The 1-row stats
    * frame broadcasts per branch.
    */
  def fuseDBSF(branches: Seq[DataFrame], k: Int, roundTo: Int = 6): DataFrame = {
    require(branches.nonEmpty, "fuseDBSF needs at least one branch")
    val normed = branches.zipWithIndex.map { case (b, i) =>
      val micro = b.select(col("id"),
        floor(col("score") * 1e6 + lit(0.5)).cast("long").as("__si"))
      val stats = micro.agg(
        sum(col("__si")).as("__s1"),
        sum(col("__si") * col("__si")).as("__s2"),
        count(lit(1)).as("__n"))
      val mean = col("__s1").cast("double") / col("__n")
      val ex2 = col("__s2").cast("double") / col("__n")
      val sd = sqrt(ex2 - mean * mean)
      micro.crossJoin(broadcast(stats))
        .select(col("id"),
          ((col("__si").cast("double") - mean + lit(3.0) * sd) /
            (lit(6.0) * sd)).as(s"__z$i"))
    }
    val joined = normed.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val fused = normed.indices.map(i => coalesce(col(s"__z$i"), lit(0.0)))
      .reduce(_ + _)
    joined.withColumn("fused_score", round(fused, roundTo))
      .select(col("id"), col("fused_score"))
      .orderBy(col("fused_score").desc, col("id").asc)
      .limit(k)
  }

  /** Matryoshka (MRL) two-stage search: candidates scored on the first
    * `prefixDim` dimensions from a PREFIX frame materialized once at
    * ingest (at scale a stored column — reading 1/4 of the vector bytes
    * is the point), exact full-dimension rerank over the `candidateK`
    * winners via broadcast id fetch. Ties broken by id at both stages, so
    * the result is deterministic at any recall level.
    */
  def matryoshkaSearch(prefix: DataFrame, full: DataFrame,
                       idCol: String, vecCol: String, prefixCol: String,
                       query: Seq[Double], prefixDim: Int, k: Int,
                       candidateK: Int): DataFrame = {
    require(prefixDim >= 1 && k >= 1 && k <= candidateK,
      s"matryoshkaSearch needs prefixDim >= 1 and 1 <= k <= candidateK, got prefixDim=$prefixDim k=$k candidateK=$candidateK")
    val q = full.sparkSession.range(1).select(vec(query).as("__qv"))
    val qp = broadcast(q.select(slice(col("__qv"), 1, prefixDim).as("__qp")))
    val cands = prefix.select(col(idCol), col(prefixCol))
      .crossJoin(qp)
      .withColumn("__ps", v_dot(col(prefixCol), col("__qp")))
      .orderBy(col("__ps").desc, col(idCol).asc)
      .limit(candidateK)
      .select(col(idCol))
    full.select(col(idCol), col(vecCol))
      .join(broadcast(cands), Seq(idCol))
      .crossJoin(broadcast(q))
      .withColumn("score", v_dot(col(vecCol), col("__qv")))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** Maximal-marginal-relevance diversified top-k: greedily pick the
    * candidate maximizing lambda*rel - (1-lambda)*max(sim to already
    * selected). The candidate page and the candidateK^2 sim matrix are
    * computed by the ENGINE kernels (one TakeOrdered scan + one broadcast
    * self-join over candidateK rows — the corpus is never touched again);
    * only the greedy selection over that k-bounded model state runs on
    * the driver, so the loop cost is O(candidateK * k) comparisons on
    * already-computed doubles. First pick = highest relevance; ties at
    * every step break by id. The oracle re-derives the same selection as
    * an unrolled CTE chain ([[graft.DuckMirror.mmrSql]]).
    */
  def mmrSelect(df: DataFrame, idCol: String, vecColName: String,
                query: Seq[Double], k: Int, candidateK: Int,
                lambda: Double, metric: String = "cosine",
                roundTo: Int = 6): DataFrame = {
    require(k >= 1 && k <= candidateK && lambda >= 0 && lambda <= 1,
      s"mmrSelect needs 1 <= k <= candidateK and lambda in [0,1], got k=$k candidateK=$candidateK lambda=$lambda")
    val spark = df.sparkSession
    val cand = df
      .select(col(idCol).as("id"), col(vecColName).as("__v"))
      .crossJoin(broadcast(spark.range(1).select(vec(query).as("__qv"))))
      .withColumn("rel", round(similarity(col("__v"), col("__qv"), metric), roundTo))
      .orderBy(col("rel").desc, col("id").asc)
      .limit(candidateK)
      .select(col("id"), col("__v"), col("rel"))
      .cache()
    val rels = cand.select("id", "rel").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val sims = cand.as("a").crossJoin(broadcast(cand.as("b")))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        similarity(col("a.__v"), col("b.__v"), metric).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    cand.unpersist()
    val remaining = scala.collection.mutable.SortedSet.empty[String] ++ rels.keys
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Double)]
    while (picked.length < k && remaining.nonEmpty) {
      var bestId: String = null
      var bestScore = Double.NegativeInfinity
      for (c <- remaining) { // SortedSet: ascending id, so ties keep the first
        val score =
          if (picked.isEmpty) rels(c)
          else lambda * rels(c) -
            (1 - lambda) * picked.iterator.map(p => sims((c, p._2))).max
        if (score > bestScore) { bestScore = score; bestId = c }
      }
      picked += ((picked.length + 1, bestId, BigDecimal(bestScore)
        .setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble))
      remaining -= bestId
    }
    import spark.implicits._
    picked.toSeq.toDF("rank", "id", "mmr")
  }

  /** Context search — the target-less half of the discovery API: each
    * (positive, negative) pair contributes min(0, sim(pos) - sim(neg)),
    * so a point "inside" every pair's positive half-space scores 0 (the
    * maximum) and each violated pair subtracts its margin. Same plan
    * shape as [[discover]]: one 1-row broadcast per context vector, the
    * score a map-side column fold, top-k via TakeOrderedAndProject.
    */
  def contextSearch(df: DataFrame, vecColName: String,
                    pairs: Seq[(String, String)], k: Int,
                    metric: String = "cosine", roundTo: Int = 6): DataFrame = {
    val ctxIds = pairs.flatMap(p => Seq(p._1, p._2))
    val base = df.filter(!col("id").isin(ctxIds: _*))
    val withVecs = pairs.zipWithIndex.foldLeft(base) {
      case (acc, ((pid, nid), i)) =>
        acc.crossJoin(broadcast(
            df.filter(col("id") === lit(pid)).select(col(vecColName).as(s"__p$i"))))
          .crossJoin(broadcast(
            df.filter(col("id") === lit(nid)).select(col(vecColName).as(s"__n$i"))))
    }
    val score = pairs.indices.foldLeft(lit(0.0)) { (acc, i) =>
      acc + least(lit(0.0),
        similarity(col(vecColName), col(s"__p$i"), metric) -
          similarity(col(vecColName), col(s"__n$i"), metric))
    }
    withVecs.withColumn("score", round(score, roundTo))
      .select(col("id"), col("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** V_FUSION RRF: reciprocal-rank fusion of N scored branches
    * (id, score_i). rank_i = dense rank by score desc (id tiebreak),
    * fused = sum over branches present of 1/(rrfK + rank_i); ids missing
    * from a branch contribute 0 (tests.sql:174-196).
    */
  def fuseRRF(branches: Seq[DataFrame], k: Int, rrfK: Int = 60,
              roundTo: Int = 6): DataFrame = {
    val ranked = branches.zipWithIndex.map { case (b, i) =>
      // distributed global rank — an unpartitioned ranking window would
      // drag every branch to a single partition (see Ranks scaladoc)
      Ranks.withGlobalRowNumber(b.select(col("id"), col("score")), "__rn",
          col("score").desc, col("id").asc)
        .select(col("id"), (lit(1.0) / (lit(rrfK) + col("__rn"))).as(s"rr_$i"))
    }
    val joined = ranked.reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val fused = ranked.indices
      .map(i => coalesce(col(s"rr_$i"), lit(0.0)))
      .reduce(_ + _)
    joined.withColumn("fused_score", round(fused, roundTo))
      .select(col("id"), col("fused_score"))
      .orderBy(col("fused_score").desc, col("id").asc)
      .limit(k)
  }

  /** Prefetch/rerank (tests.sql:144-168): broad candidate fetch by
    * `prefetchMetric` (limit `prefetchK`), then rerank the survivors with
    * `rerankScore` and keep `k`. The prefetch output is small, so the rerank
    * stage is cheap regardless of corpus size.
    */
  def prefetchRerank(df: DataFrame, vecCol: Column, query: Column,
                     prefetchK: Int, k: Int,
                     prefetchMetric: String = "cosine",
                     rerank: (DataFrame) => DataFrame,
                     roundTo: Int = 6): DataFrame = {
    val candidates = topK(df, vecCol, query, prefetchK, prefetchMetric,
      scoreName = "prefetch_score", roundTo = roundTo)
    rerank(candidates)
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }

  /** Batch search (tests.sql:327-344): per-query top-k for a (small) table
    * of query vectors — broadcast the queries, score every (corpus, query)
    * pair map-side, then per-query top-k via ranking window partitioned by
    * query id (shuffles only |corpus| * |queries| scored ROWS of (qid, id,
    * score) — no vectors move).
    */
  def batchTopK(corpus: DataFrame, vecCol: Column,
                queries: DataFrame, queryIdCol: String, queryVecCol: String,
                k: Int, metric: String = "cosine", roundTo: Int = 6): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("score", round(similarity(vecCol, col(queryVecCol), metric), roundTo))
      .select(col(queryIdCol).as("query_id"), col("id"), col("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("id").asc)
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
      .orderBy(col("query_id").asc, col("score").desc, col("id").asc)
  }

  /** V_RANDOM sampling: deterministic via seed (tests.sql:310-320).
    * Orders by md5(id || seed) — a data-derived pseudo-random permutation.
    * Unlike `rand(seed)` (seeded per PARTITION INDEX, so the sample changes
    * whenever the partition layout does), this reproduces the exact same
    * sample on any cluster size, any retry, and in any other engine;
    * executes as TakeOrderedAndProject (per-partition heap of n, no sort).
    */
  def randomSample(df: DataFrame, n: Int, seed: Long): DataFrame =
    df.orderBy(md5(concat(col("id").cast("string"), lit(seed.toString))),
      col("id")).limit(n)

  /** Cluster-balanced (diversity) sample: `k` rows PER cluster by the
    * engine-stable md5 permutation — the same coarse quantizer that
    * serves IVF search doubles as the diversity blocker, so the sample
    * spreads across the embedding space instead of following density
    * (the companion move to SemDeDup: dedup removes within-cluster
    * redundancy, this CAPS each region's contribution). A keyed window:
    * state bounded per cluster, one shuffle on the cluster key; the
    * md5 draw is layout/engine/rerun-stable like [[randomSample]].
    */
  def clusterBalancedSample(clustered: DataFrame, idCol: String,
                            clusterCol: String, k: Int,
                            seed: Long): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    clustered.withColumn("__rn", row_number().over(
        Window.partitionBy(col(clusterCol)).orderBy(
          md5(concat(col(idCol).cast("string"), lit(seed.toString))),
          col(idCol))))
      .filter(col("__rn") <= k).drop("__rn")
  }

  /** Facet counts over a payload key (the reference host's facet API:
    * top-N distinct values of a payload field by match count, under an
    * optional filter already applied to `df`). One partial-aggregating
    * groupBy + a TakeOrdered of N (count desc, value asc) — no full sort;
    * at 100 TB the map-side combine means the shuffle carries one row per
    * (partition, value), not per point.
    */
  def facet(df: DataFrame, payloadCol: Column, key: String, topN: Int): DataFrame = {
    require(topN >= 1, s"facet needs topN >= 1, got $topN")
    df.select(get_json_object(payloadCol, s"$$.$key").as("value"))
      .filter(col("value").isNotNull)
      .groupBy(col("value"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("value").asc)
      .limit(topN)
  }

  /** Distance matrix (the reference host's search-matrix API): take a
    * deterministic sample of `sampleN` points (same md5 permutation as
    * [[randomSample]]), and for each return its `perPoint` nearest
    * neighbours WITHIN the sample by `metric`, ties broken by neighbour
    * id. The sample is tiny by construction, so both sides of the pairwise
    * join broadcast — the corpus is scanned once (TakeOrdered for the
    * sample) and the O(sampleN^2) score happens on one executor's worth of
    * rows regardless of corpus size.
    */
  def distanceMatrix(df: DataFrame, idCol: String, vecCol: String,
                     sampleN: Int, perPoint: Int, seed: Long,
                     metric: String = "dot"): DataFrame = {
    val s = randomSample(df.select(col(idCol), col(vecCol)), sampleN, seed)
    val a = s.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = s.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("__score").desc, col("id_b").asc)
    a.join(broadcast(b), col("id_a") =!= col("id_b"))
      .withColumn("__score", similarity(col("__va"), col("__vb"), metric))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= perPoint)
      .select(col("id_a"), col("id_b"), round(col("__score"), 6).as("score"))
  }

  /** The OFFSETS output shape of the backend's distance-matrix API (its
    * second wire format next to pairs): each end of a pair reported as
    * the point's POSITION in the sampled-ids list (the md5 permutation
    * draw order [[randomSample]] uses) instead of the id itself — the
    * form a client feeds straight into a dense matrix. Same sample, same
    * top-`perPoint` pairs as [[distanceMatrix]]; the rank attaches with
    * one window over the model-sized sample.
    */
  def distanceMatrixOffsets(df: DataFrame, idCol: String, vecCol: String,
                            sampleN: Int, perPoint: Int, seed: Long,
                            metric: String = "dot"): DataFrame = {
    val ranked = randomSample(df.select(col(idCol)), sampleN, seed)
      .withColumn("__off", row_number().over(Window.orderBy(
        md5(concat(col(idCol).cast("string"), lit(seed.toString))),
        col(idCol))) - 1)
    val pairs = distanceMatrix(df, idCol, vecCol, sampleN, perPoint, seed, metric)
    pairs
      .join(broadcast(ranked.select(col(idCol).as("id_a"), col("__off").as("off_row"))), "id_a")
      .join(broadcast(ranked.select(col(idCol).as("id_b"), col("__off").as("off_col"))), "id_b")
      .select(col("off_row").cast(org.apache.spark.sql.types.LongType),
        col("off_col").cast(org.apache.spark.sql.types.LongType),
        col("score"))
  }

  /** Order-by scroll (the reference host's order_by scroll API): one page
    * of `df` ordered by (`orderCol`, `idCol`), starting strictly after the
    * keyset `(afterValue, afterId)`. The keyset predicate is a map-side
    * filter and the page a TakeOrderedAndProject — no OFFSET re-scan of
    * skipped rows, the same pagination posture as the id-keyset scroll.
    */
  def scrollByField(df: DataFrame, orderCol: Column, idCol: Column,
                    afterValue: Column, afterId: Column, n: Int,
                    descending: Boolean = false): DataFrame =
    if (descending)
      // the backend's order_by direction=desc: the keyset moves DOWN the
      // value order; ids still tiebreak ascending within an equal value
      df.filter(orderCol < afterValue ||
          (orderCol === afterValue && idCol > afterId))
        .orderBy(orderCol.desc, idCol.asc)
        .limit(n)
    else
      df.filter(orderCol > afterValue ||
          (orderCol === afterValue && idCol > afterId))
        .orderBy(orderCol.asc, idCol.asc)
        .limit(n)

  /** Deterministic WEIGHTED (importance) sampling: keep each row with
    * probability proportional to `weightCol` (scaled so the max-weight
    * row is kept with probability `maxRate`), decided by the same
    * data-derived md5 permutation as [[stratifiedSample]] — a map-side
    * filter after one broadcast max, reproducible on any layout or
    * engine. The quality-weighted downsampling step of training-data
    * pipelines ("keep good documents more often") without per-partition
    * RNG.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: Column,
                     maxRate: Double, seed: Long): DataFrame = {
    require(maxRate > 0 && maxRate <= 1, s"maxRate in (0,1], got $maxRate")
    val mx = df.agg(max(weightCol).cast("double").as("__wmax"))
    val bucket = conv(substring(
      md5(concat(col(idCol).cast("string"), lit(seed.toString))), 1, 15),
      16, 10).cast("long")
    df.crossJoin(broadcast(mx))
      .filter(bucket < floor(
        weightCol.cast("double") / col("__wmax") * lit(maxRate) *
          lit((1L << 60).toDouble)).cast("long"))
      .drop("__wmax")
  }

  /** Deterministic stratified sampling: keep ~`fraction` of the rows of
    * every stratum, chosen by a data-derived md5 permutation — a pure
    * map-side FILTER (no shuffle, no per-group state), reproducible on any
    * cluster layout or engine, unlike `df.stat.sampleBy` (per-partition
    * RNG). The per-stratum rate is exact in expectation and concentrates
    * as strata grow; training pipelines use this shape for per-source
    * quota sampling.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fraction: Double, seed: Long): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    // first 15 hex digits = 60 uniform bits; threshold in that space
    val bucket = conv(substring(
      md5(concat(col(strataCol), lit("|"), col(idCol).cast("string"),
        lit(seed.toString))), 1, 15), 16, 10).cast("long")
    df.filter(bucket < lit((fraction * (1L << 60)).toLong))
  }

  /** Fixed-QUOTA per-stratum sample: exactly min(n, |stratum|) rows per
    * stratum, chosen by the engine-stable md5 permutation — the
    * balanced-training-set builder ([[stratifiedSample]]'s fraction
    * keeps group skew; a quota equalizes it). One shuffle on the stratum
    * key; the per-stratum order is the window's ordinary partition sort.
    * When quota << stratum size at extreme scale, pre-filter with a
    * coarse [[stratifiedSample]] threshold to bound the sorted set — the
    * result is identical as long as the retained fraction safely exceeds
    * the quota.
    */
  def quotaSample(df: DataFrame, idCol: String, strataCol: String,
                  n: Int, seed: Long): DataFrame = {
    require(n >= 1, s"quota must be >= 1, got $n")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(concat(col(idCol).cast("string"), lit(seed.toString))).asc,
        col(idCol).asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Contrastive training-pair generation: turn verified near-duplicate
    * pairs (the dedup pipeline's output) into (anchor, other, label)
    * rows — each pair yields a POSITIVE, and each anchor draws a
    * deterministic NEGATIVE from a small md5-ordered corpus sample
    * (broadcast as a literal array; the in-batch-negatives pattern).
    * The negative choice is a pure function of (anchor, seed) — same
    * pairs on any layout, any engine, any rerun — and degenerate draws
    * (the anchor itself, or its positive partner) are filtered rather
    * than re-drawn, keeping the arithmetic oracle-exact. Map-side after
    * one model-sized sample collect; the pair frame never reshuffles.
    */
  def contrastivePairs(pairs: DataFrame, corpus: DataFrame, idCol: String,
                       sampleSize: Int, seed: Long): DataFrame = {
    require(sampleSize > 0)
    val sample = corpus
      .orderBy(md5(concat(col(idCol).cast("string"), lit(seed.toString))),
        col(idCol))
      .limit(sampleSize)
      .select(col(idCol)).collect().map(_.getAs[Number](0).longValue())
    require(sample.length == sampleSize,
      s"corpus holds only ${sample.length} ids; asked for $sampleSize")
    val sLit = array(sample.toIndexedSeq.map(v => lit(v)): _*)
    val idx = (conv(substring(md5(concat(lit("neg|"),
        col("a_id").cast("string"), lit(seed.toString))), 1, 15), 16, 10)
      .cast("long") % sampleSize).cast("int")
    // ONE pass over the (expensive) pair frame: each pair row explodes
    // into its positive and its drawn negative — a union of two branches
    // would re-evaluate the whole upstream verify pipeline per branch.
    // distinct() collapses repeated negatives only: positives are unique
    // pairs, and a pos/neg tuple can never collide (labels differ).
    pairs
      .select(col("a_id").as("anchor"), col("b_id"),
        element_at(sLit, idx + 1).as("__negid"))
      .select(col("anchor"), col("b_id"), explode(array(
        struct(col("b_id").as("other"), lit("pos").as("label")),
        struct(col("__negid").as("other"), lit("neg").as("label")))).as("e"))
      .filter(col("e.label") === "pos" ||
        (col("e.other") =!= col("anchor") && col("e.other") =!= col("b_id")))
      .select(col("anchor"), col("e.other").as("other"),
        col("e.label").as("label"))
      .distinct()
  }

  /** Rebalance a corpus toward a TARGET source mixture — the data-mixing
    * step of a training pipeline (e.g. "30% web, 25% code, 5% forums"
    * regardless of the crawl's natural proportions). Per-source acceptance
    * rates derive from target weight over natural proportion, scaled so
    * the most-upweighted source keeps everything (pure downsampling — no
    * row duplication); sources absent from `targets` are dropped. The
    * accept decision is the same engine-stable md5 permutation as
    * [[stratifiedSample]] (domain-separated), so the mixture is exactly
    * reproducible on any cluster layout or engine. One model-sized
    * aggregate (source counts) feeds the thresholds; the filter itself is
    * pure map-side.
    */
  def mixSources(df: DataFrame, idCol: String, sourceCol: String,
                 targets: Seq[(String, Double)], seed: Long): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "target weights must be positive")
    require(targets.map(_._1).distinct.size == targets.size,
      "a source may appear only once in the target mixture")
    val counts = df.groupBy(col(sourceCol)).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val ratios = targets.collect { case (src, w) if counts.contains(src) =>
      src -> w / (counts(src) / total) }
    require(ratios.nonEmpty, "no target source present in the data")
    val maxRatio = ratios.map(_._2).max
    val thresholds = ratios.map { case (src, r) =>
      src -> ((r / maxRatio) * (1L << 60)).toLong }
    val bucket = conv(substring(
      md5(concat(col(sourceCol), lit("|mix|"), col(idCol).cast("string"),
        lit(seed.toString))), 1, 15), 16, 10).cast("long")
    // per-source threshold as a literal when-chain (bounded by the source
    // vocabulary — model state); untargeted sources fall through to -1,
    // which no 60-bit bucket is below
    val thr = thresholds.foldLeft(lit(-1L): Column) { case (acc, (src, t)) =>
      when(col(sourceCol) === src, lit(t)).otherwise(acc) }
    df.filter(bucket < thr)
  }

  /** Temperature-scaled source mixing at T = 2: each source's quota is
    * proportional to sqrt(count) (the up-weight-the-tail rule multilingual
    * corpora use), with EXACT integer quotas — sqrt weights quantized to
    * micro-integers (floor(sqrt(n) * 1e6), one IEEE op each, engine
    * stable), summed exactly, and quota_s = k * w_s div total. Rows are
    * chosen per source by the md5 permutation with an id tiebreak, so the
    * selected set is a pure function of (data, k, seed).
    *
    * Shape: one partial-aggregating count, a broadcast quota join, and a
    * per-source row_number window (one shuffle). The window is exact-k
    * (manifest-grade); when approximate rates suffice at extreme scale,
    * the threshold-filter form ([[mixSources]]) avoids the window
    * entirely.
    */
  def temperatureSample(df: DataFrame, idCol: String, sourceCol: String,
                        k: Int, seed: Long): DataFrame = {
    require(k >= 1, s"temperatureSample needs k >= 1, got $k")
    import org.apache.spark.sql.expressions.Window
    val weights = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("__n"))
      .select(col(sourceCol),
        floor(sqrt(col("__n").cast("double")) * lit(1e6)).cast("long")
          .as("__ssq"))
    val tot = weights.agg(sum(col("__ssq")).as("__tot"))
    val quotas = weights.crossJoin(broadcast(tot))
      .select(col(sourceCol), expr(s"($k * __ssq) div __tot").as("__quota"))
    val rn = row_number().over(Window.partitionBy(col(sourceCol))
      .orderBy(md5(concat(lit("temp|"), col(idCol).cast("string"),
        lit(seed.toString))), col(idCol)))
    df.withColumn("__rn", rn)
      .join(broadcast(quotas), sourceCol)
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }

  /** Cumulative 60-bit thresholds for [[assignSplit]] — exposed so an
    * external oracle can reproduce the exact boundaries.
    */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[Long] =
    splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(c => (c * (1L << 60)).toLong)

  /** Deterministic train/val/test split assignment: each row's split is a
    * pure function of (id, seed) via the md5 permutation — the same row
    * lands in the same split on any cluster layout, any engine, any rerun
    * (the property dataset governance needs; `rand()` re-rolls per
    * partition layout). A pure map-side projection, no shuffle.
    */
  def assignSplit(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)], seed: Long): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0) &&
      math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must be positive and sum to 1")
    // "split|" domain separator: without it this would be the exact
    // permutation randomSample uses, and a sample drawn with the same
    // seed would correlate perfectly with the split boundaries
    val bucket = conv(substring(
      md5(concat(lit("split|"), col(idCol).cast("string"), lit(seed.toString))),
      1, 15), 16, 10).cast("long")
    val thresholds = splitThresholds(splits)
    val chained = splits.init.zip(thresholds.init).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), thr)) =>
        Some(acc.fold(when(bucket < lit(thr), lit(name)))(
          _.when(bucket < lit(thr), lit(name))))
    }
    df.withColumn("split",
      chained.fold(lit(splits.last._1))(_.otherwise(lit(splits.last._1))))
  }

  /** LEAKAGE-SAFE split assignment: the split is a pure function of a
    * GROUP key (near-dup cluster label, url host, author id, ...) rather
    * than the row id, so every member of a group lands in the SAME split.
    * This is why dedup clustering runs before splitting in a training
    * pipeline: splitting near-duplicates across train/test leaks test
    * content into training and inflates eval. Same md5 permutation and
    * thresholds as [[assignSplit]] — map-side, no shuffle; the group
    * column must be engine-stable (a [[Dedup.connectedComponents]] label
    * is: min id of the cluster).
    */
  def assignSplitByGroup(df: DataFrame, groupCol: String,
                         splits: Seq[(String, Double)], seed: Long): DataFrame =
    assignSplit(df, groupCol, splits, seed)

  /** Sparse search with the IDF modifier — the reference backend's
    * `Modifier::Idf` on a sparse field: each query term's value is scaled
    * by idf(t) = ln((N - n(t) + 0.5) / (n(t) + 0.5) + 1) (BM25's idf),
    * where n(t) is the stored field's document frequency of index t, and
    * scoring is then the plain sparse dot product. Rare terms dominate;
    * a term present in every document contributes ~nothing.
    *
    * Scale shape: the df counts resolve with ONE aggregation restricted
    * to the QUERY's terms (explode + filter + groupBy), collected bounded
    * by the query's term count — index-statistics state, like the
    * centroid table, not a corpus pass per term. The idf factors are
    * quantized to 1e-6 (`floor(x*1e6 + 0.5)` — pure IEEE arithmetic, the
    * vq6 recipe) so an engine re-deriving them (the DuckDB mirror) lands
    * on bit-identical scaled query values; scoring reuses the codegen
    * [[graft.functions.v_sparse_dot]] kernel unchanged.
    */
  def sparseIdfSearch(df: DataFrame, idCol: String, idxCol: String,
                      valCol: String, qIdx: Seq[Int], qVal: Seq[Double],
                      k: Int, roundTo: Int = 6): DataFrame = {
    require(qIdx.length == qVal.length, "query indices/values length mismatch")
    val n = df.count()
    val dfCounts = df.select(explode(col(idxCol)).as("t"))
      .filter(col("t").isin(qIdx: _*))
      .groupBy(col("t")).agg(count(lit(1)).as("nt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val scaled = qIdx.zip(qVal).map { case (t, v) =>
      val nt = dfCounts.getOrElse(t, 0L).toDouble
      v * q6(math.log((n - nt + 0.5) / (nt + 0.5) + 1))
    }
    df.select(col(idCol).as("id"),
        round(v_sparse_dot(col(idxCol), col(valCol),
          typedLit(qIdx), typedLit(scaled)), roundTo).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }
}
