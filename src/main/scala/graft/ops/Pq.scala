package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions._

/** Product quantization (PQ) for embedding columns — the compression tier
  * below int8 scalar quantization ([[Quant]]).
  *
  * The dim-D vector splits into `m` subvectors of dim/m coordinates; each
  * subspace trains its own `ksub`-centroid codebook (the SAME seeded,
  * DECIMAL-quantized Lloyd's as the IVF coarse quantizer —
  * [[Ann.fitCentroids]] — so codebooks are bit-reproducible cross-engine);
  * a vector's code is the m-tuple of nearest-centroid ids, m bytes when
  * ksub <= 256. At dim=64, m=4 that is 64 floats -> 4 bytes per row — 64x
  * less scan bandwidth than full precision, 16x less than int8 codes,
  * which is what makes a 100 TB embedding column servable from warm
  * storage.
  *
  * Serving is asymmetric-distance computation (ADC): the query builds an
  * m x ksub lookup table of exact subspace dots against the codebooks
  * (model-sized driver work — it never touches data), and each row's
  * approximate score is m array lookups + (m-1) adds, all codegen — no
  * per-row vector arithmetic at all. An exact-dot rerank over the
  * candidateK survivors restores exact ordering, the same
  * margin-over-approximation contract as [[Quant.searchStoredCodes]].
  *
  * The reference's backend exposes quantization as collection config
  * (`/root/reference/tests/bin/config.yaml:217-219` — the storage-side
  * compression knob its HNSW index reads through); this is that surface
  * re-expressed as Spark-native batch ops over a stored codes table, the
  * compression tier the int8 path ([[Quant]]) opens.
  */
object Pq {

  /** Trained PQ model: `codebooks(mi)(c)` is the dim/m-coordinate centroid
    * `c` of subspace `mi`. Model state (m * ksub * dim/m doubles = dim *
    * ksub), driver-resident and broadcast into plans as literals — the
    * same "bounded model, not data" contract as the IVF centroid table.
    */
  final case class PqModel(dim: Int, m: Int, ksub: Int,
                           codebooks: IndexedSeq[IndexedSeq[IndexedSeq[Double]]]) {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub: Int = dim / m
  }

  /** Train one codebook per subspace over df(idCol, vecCol). Each
    * subspace runs the shared seeded Lloyd's ([[Ann.fitCentroids]]) on the
    * sliced corpus; the md5(id||seed) init keys on the UNSLICED row id, so
    * every subspace seeds from the same rows — which is what lets one
    * oracle chain per subspace re-derive the whole model.
    */
  def fit(df: DataFrame, idCol: String, vecCol: String, dim: Int, m: Int,
          ksub: Int, maxIter: Int, seed: Long): PqModel = {
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    require(ksub >= 1 && ksub <= 256,
      s"ksub $ksub outside [1, 256] — a code must fit one byte")
    val sub = dim / m
    val books = (0 until m).map { mi =>
      val sliced = df.select(col(idCol),
        slice(col(vecCol), mi * sub + 1, sub).as("__sv"))
      Ann.fitCentroids(sliced, idCol, "__sv", ksub, maxIter, seed)
        .map(_.toIndexedSeq).toIndexedSeq
    }
    PqModel(dim, m, ksub, books)
  }

  /** Encode each row's vector as its m-tuple of nearest-centroid ids
    * (`pcode` array<int>, values 0-based). Pure map-side argmin per
    * subspace over codebook literals — the ingest step; production writes
    * (id, pcode) as the codes table and the full-precision column goes to
    * cold storage.
    */
  def encode(df: DataFrame, vecCol: String, model: PqModel): DataFrame = {
    val codeCols = (0 until model.m).map { mi =>
      val sv = slice(col(vecCol), mi * model.sub + 1, model.sub)
      val ds = array(model.codebooks(mi).map(c => v_euclid(sv, vec(c))): _*)
      (array_position(ds, array_min(ds)) - 1).cast(IntegerType)
    }
    df.withColumn("pcode", array(codeCols: _*))
  }

  /** The ADC lookup table for `query`: `tab(mi)(c)` = exact dot of the
    * query's mi-th slice against codebook centroid c, accumulated in the
    * kernels' sequential order (bit-identical to the oracle's list_reduce).
    */
  def adcTable(model: PqModel, query: Seq[Double]): IndexedSeq[IndexedSeq[Double]] =
    (0 until model.m).map { mi =>
      val q = query.slice(mi * model.sub, (mi + 1) * model.sub)
      model.codebooks(mi).map { c =>
        var s = 0.0
        var j = 0
        while (j < c.length) { s += c(j) * q(j); j += 1 }
        s
      }
    }

  /** Approximate dot of a coded row against the query: m table lookups
    * summed left-to-right (the fold order both engines share). The table
    * enters the plan as array literals — no join, no shuffle, no per-row
    * vector math.
    */
  def approxScore(model: PqModel, query: Seq[Double],
                  codeCol: Column = col("pcode")): Column = {
    val tab = adcTable(model, query)
    (0 until model.m).map(mi =>
      element_at(vec(tab(mi)), element_at(codeCol, mi + 1) + 1)).reduce(_ + _)
  }

  /** PQ serving over STORED codes: candidate stage scans ONLY the codes
    * table (id, pcode) — at dim=64/m=4 that is 64x less bandwidth than the
    * vector column — ranks by ADC score, keeps `candidateK`; the rerank
    * fetches full-precision vectors for just those ids via a broadcast
    * semi-join and ranks by exact dot. Same shape as the int8 path
    * ([[Quant.searchStoredCodes]]), coarser approximation, bigger margin
    * advised.
    */
  def searchPqStored(codes: DataFrame, full: DataFrame, idCol: String,
                     vecCol: String, model: PqModel, query: Seq[Double],
                     k: Int, candidateK: Int, roundTo: Int = 6): DataFrame = {
    val cands = codes
      .select(col(idCol), approxScore(model, query).as("__approx"))
      .orderBy(col("__approx").desc, col(idCol).asc)
      .limit(candidateK)
      .select(col(idCol))
    full.select(col(idCol), col(vecCol))
      .join(broadcast(cands), Seq(idCol))
      .withColumn("score", round(v_dot(col(vecCol), vec(query)), roundTo))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol).as("id"), col("score"))
  }

  /** Residuals of a clustered corpus against its coarse centroids:
    * `__res` = vector - centroid[cluster], the quantity textbook IVF-PQ
    * quantizes (residuals are smaller and better-centered than raw
    * vectors, so the same codebook budget buys less quantization error).
    * The centroid table enters as a 2-D array literal (model state);
    * the subtraction is a codegen zip_with — map-side, streams unbounded.
    */
  def residuals(clustered: DataFrame, centroids: DataFrame,
                vecCol: String): DataFrame = {
    val cents = centroids.orderBy(col("cluster"))
      .select(col("centroid").cast(ArrayType(DoubleType)))
      .collect().map(_.getSeq[Double](0))
    val lit2d = array(cents.toIndexedSeq.map(c => vec(c)): _*)
    clustered.withColumn("__res",
      zip_with(col(vecCol), element_at(lit2d, col("cluster") + 1),
        (a, b) => a - b))
  }

  /** Residual IVF-PQ serving: with residual codebooks, a row's
    * approximate dot is dot(q, centroid[cluster]) — one per-cluster
    * literal, driver-computed over the probed set — plus the standard
    * ADC sum over the residual codebooks (the tables still dot RAW query
    * slices: dot(q, cent + recon) = dot(q, cent) + sum_m dot(q_m,
    * book_m[code_m])). Same pruned-files cost shape as
    * [[searchIvfPqStored]], better approximation per code byte.
    */
  def searchIvfPqResidual(codes: DataFrame, centroids: DataFrame,
                          full: DataFrame, idCol: String, vecCol: String,
                          model: PqModel, query: Seq[Double], k: Int,
                          nprobe: Int, candidateK: Int,
                          roundTo: Int = 6): DataFrame = {
    val probed = Ann.probedClusters(centroids, vec(query), nprobe)
    val centMap = centroids.orderBy(col("cluster"))
      .select(col("cluster"), col("centroid").cast(ArrayType(DoubleType)))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    def cdot(c: Int): Double = {
      val cent = centMap(c)
      var s = 0.0
      var j = 0
      while (j < cent.length) { s += query(j) * cent(j); j += 1 }
      s
    }
    val cdotCol = probed.foldLeft(lit(0.0): Column)((acc, c) =>
      when(col("cluster") === c, lit(cdot(c))).otherwise(acc))
    val cands = codes.filter(col("cluster").isin(probed: _*))
      .select(col(idCol),
        (cdotCol + approxScore(model, query)).as("__approx"))
      .orderBy(col("__approx").desc, col(idCol).asc)
      .limit(candidateK)
      .select(col(idCol))
    full.filter(col("cluster").isin(probed: _*))
      .select(col(idCol), col(vecCol))
      .join(broadcast(cands), Seq(idCol))
      .withColumn("score", round(v_dot(col(vecCol), vec(query)), roundTo))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol).as("id"), col("score"))
  }

  /** IVF-PQ — the standard production ANN stack, composed from this
    * module and the IVF coarse quantizer: `codes` is the PQ codes table
    * tagged with the coarse cluster and written `partitionBy("cluster")`,
    * so a query reads nprobe/nlist of the FILES and each file holds
    * m-byte codes instead of vectors (the two cost levers multiply:
    * nprobe/nlist x dim*4/m bytes). Probe selection is the bounded
    * centroid-table resolve ([[Ann.probedClusters]]); candidates rank by
    * ADC inside the probed clusters only; the exact-dot rerank reads the
    * equally-pruned full-precision store for just the candidate ids.
    */
  def searchIvfPqStored(codes: DataFrame, centroids: DataFrame,
                        full: DataFrame, idCol: String, vecCol: String,
                        model: PqModel, query: Seq[Double], k: Int,
                        nprobe: Int, candidateK: Int,
                        roundTo: Int = 6): DataFrame = {
    val probed = Ann.probedClusters(centroids, vec(query), nprobe)
    val cands = codes.filter(col("cluster").isin(probed: _*))
      .select(col(idCol), approxScore(model, query).as("__approx"))
      .orderBy(col("__approx").desc, col(idCol).asc)
      .limit(candidateK)
      .select(col(idCol))
    full.filter(col("cluster").isin(probed: _*))
      .select(col(idCol), col(vecCol))
      .join(broadcast(cands), Seq(idCol))
      .withColumn("score", round(v_dot(col(vecCol), vec(query)), roundTo))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol).as("id"), col("score"))
  }
}
