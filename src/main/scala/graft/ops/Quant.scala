package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions._

/** Scalar (int8) quantization for embedding columns.
  *
  * At 100 TB the embedding column IS the dataset: symmetric per-vector
  * int8 quantization cuts storage and scan bandwidth 4x and keeps
  * similarity search usable (dot(a8, b8) * scaleA * scaleB approximates
  * dot(a, b); the rank order degrades gracefully). All column math here is
  * codegen'd built-ins; the quantized form is (array<tinyint>, float
  * scale) so parquet stores packed bytes.
  *
  * Typical pipeline: quantize once at ingest, run candidate search on the
  * int8 column, re-rank the top candidates with the full-precision
  * vectors (kept on cold storage or fetched by id).
  */
object Quant {

  /** Per-vector symmetric quantization: scale = max|x| / 127, code_i =
    * round(x_i / scale). Zero vectors get scale 0 and all-zero codes.
    * One native pass (QuantizeI8) — the HOF composition interpreted two
    * lambda chains per row.
    */
  def quantize(vecCol: Column): (Column, Column) = {
    val q = quantize_i8(vecCol)
    (q.getField("codes"), q.getField("scale"))
  }

  /** Add `{out}_codes` (array<tinyint>) and `{out}_scale` (float). */
  def quantizeColumn(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.withColumn("__q8", quantize_i8(col(vecCol)))
      .withColumn(s"${out}_codes", col("__q8.codes"))
      .withColumn(s"${out}_scale", col("__q8.scale"))
      .drop("__q8")

  /** Reconstruct an approximate float vector from (codes, scale). */
  def dequantize(codes: Column, scale: Column): Column =
    transform(codes, c => (c.cast(FloatType) * scale))

  /** Approximate dot product in the quantized domain:
    * dot(codesA, codesB) * scaleA * scaleB. The int8 dot runs through the
    * same codegen DotProduct kernel (bytes widen exactly to double).
    */
  def dotQuantized(codesA: Column, scaleA: Column,
                   codesB: Column, scaleB: Column): Column =
    v_dot_i8(codesA, codesB) * scaleA.cast(DoubleType) * scaleB.cast(DoubleType)

  /** Quantized-domain top-k with full-precision re-rank over STORED codes:
    * `quantized` holds (idCol, codesCol, scaleCol) produced once at ingest
    * by [[quantizeColumn]] (and persisted — parquet, a checkpoint, a
    * cache); `full` holds the full-precision vectors.
    *
    * The candidate stage scans ONLY the quantized frame (4x less scan
    * bandwidth at 100 TB — the entire point of quantizing), compiles to
    * TakeOrderedAndProject over a map-side int8 dot. The rerank stage then
    * fetches full-precision vectors for just the candidateK winners via a
    * broadcast semi-join on id — the full-precision column is never
    * touched in the candidate pass.
    */
  def searchStoredCodes(quantized: DataFrame, full: DataFrame,
                        idCol: String, vecCol: String,
                        codesCol: String, scaleCol: String,
                        query: Seq[Double], k: Int, candidateK: Int): DataFrame = {
    val q = quantized.sparkSession.range(1).select(vec(query).as("__qv"))
    val (qCodes, qScale) = quantize(col("__qv"))
    val qq = broadcast(q.select(qCodes.as("__qc"), qScale.as("__qs")))
    val cands = quantized.select(col(idCol), col(codesCol), col(scaleCol))
      .crossJoin(qq)
      .withColumn("__approx", dotQuantized(
        col(codesCol), col(scaleCol), col("__qc"), col("__qs")))
      .orderBy(col("__approx").desc, col(idCol).asc)
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

  /** Convenience form that quantizes inline (one frame in, no stored
    * codes). Fine for exploration; the serving path at scale is
    * [[searchStoredCodes]] over codes quantized once at ingest — inline
    * quantization re-reads the full-precision column the codes exist to
    * avoid.
    */
  def searchWithRerank(df: DataFrame, idCol: String, vecCol: String,
                       query: Seq[Double], k: Int, candidateK: Int): DataFrame =
    searchStoredCodes(
      quantizeColumn(df, vecCol, "__v"), df, idCol, vecCol,
      "__v_codes", "__v_scale", query, k, candidateK)

  // ---- binary quantization (1 bit/dim) ------------------------------------

  /** Add `{out}_bits` (array<bigint> packed sign bits) — the 1-bit tier
    * below int8: 32x less scan bandwidth than float32. Run once at ingest
    * and persist, like [[quantizeColumn]].
    */
  def packSignColumn(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.withColumn(s"${out}_bits", pack_sign_bits(col(vecCol)))

  /** Binary-quantized candidate search + full-precision rerank over STORED
    * packed bits: candidates are the `candidateK` lowest Hamming distances
    * (popcount-xor over the packed words — ties broken by id so the result
    * is deterministic for any recall level), reranked by exact dot against
    * the full-precision frame. Same two-stage shape as
    * [[searchStoredCodes]]: the candidate scan touches ONLY the bit column
    * (1/32 of the bytes), the rerank fetches `candidateK` rows by id via a
    * broadcast semi-join.
    */
  def searchStoredBits(bits: DataFrame, full: DataFrame,
                       idCol: String, vecCol: String, bitsCol: String,
                       query: Seq[Double], k: Int, candidateK: Int): DataFrame = {
    require(k >= 1 && k <= candidateK,
      s"searchStoredBits needs 1 <= k <= candidateK, got k=$k candidateK=$candidateK")
    val q = bits.sparkSession.range(1).select(vec(query).as("__qv"))
    val qq = broadcast(q.select(pack_sign_bits(col("__qv")).as("__qb")))
    val cands = bits.select(col(idCol), col(bitsCol))
      .crossJoin(qq)
      .withColumn("__ham", v_hamming(col(bitsCol), col("__qb")))
      .orderBy(col("__ham").asc, col(idCol).asc)
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

  /** Three-tier cascade — the oversample-and-rescore serving pattern:
    * 1-bit Hamming candidates (`candidateK`, scans 1/32 of the bytes) ->
    * int8 approximate-dot cut (`midK`, 1/4 of the bytes, touches only the
    * candidateK winners) -> exact full-precision top-k (touches only the
    * midK winners). Each stage reads ITS OWN stored artifact and fetches
    * the next stage's rows by broadcast id semi-join, so per-query bytes
    * shrink geometrically while every stage stays deterministic (id
    * tiebreaks). The driver gate mirrors ALL THREE stages in DuckDB —
    * including the int8 scale/round arithmetic — so the cascade is
    * value-pinned, not margin-assumed.
    */
  def cascadeSearch(bits: DataFrame, quantized: DataFrame, full: DataFrame,
                    idCol: String, vecCol: String, bitsCol: String,
                    codesCol: String, scaleCol: String,
                    query: Seq[Double], k: Int, midK: Int,
                    candidateK: Int): DataFrame = {
    require(k >= 1 && k <= midK && midK <= candidateK,
      s"cascadeSearch needs 1 <= k <= midK <= candidateK, got k=$k midK=$midK candidateK=$candidateK")
    val q = bits.sparkSession.range(1).select(vec(query).as("__qv"))
    val qb = broadcast(q.select(pack_sign_bits(col("__qv")).as("__qb")))
    val (qCodes, qScale) = quantize(col("__qv"))
    val qq = broadcast(q.select(qCodes.as("__qc"), qScale.as("__qs")))
    val c1 = bits.select(col(idCol), col(bitsCol))
      .crossJoin(qb)
      .withColumn("__ham", v_hamming(col(bitsCol), col("__qb")))
      .orderBy(col("__ham").asc, col(idCol).asc)
      .limit(candidateK)
      .select(col(idCol))
    val c2 = quantized.select(col(idCol), col(codesCol), col(scaleCol))
      .join(broadcast(c1), Seq(idCol))
      .crossJoin(qq)
      .withColumn("__approx", dotQuantized(
        col(codesCol), col(scaleCol), col("__qc"), col("__qs")))
      .orderBy(col("__approx").desc, col(idCol).asc)
      .limit(midK)
      .select(col(idCol))
    full.select(col(idCol), col(vecCol))
      .join(broadcast(c2), Seq(idCol))
      .crossJoin(broadcast(q))
      .withColumn("score", v_dot(col(vecCol), col("__qv")))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  // -- corpus-calibrated (quantile-clipped) scalar quantization ------------
  //
  // The backend's scalar quantization with its `quantile` dial: ONE affine
  // int8 mapping for the whole collection, bounds taken at the corpus-wide
  // [1-q, q] component quantiles so a handful of outlier components don't
  // blow up everyone's resolution (per-vector max-abs — `quantize` above —
  // gives outlier VECTORS their own scale but spends half the code range
  // on them when outliers sit inside otherwise-normal vectors). Codes
  // decode as x̂ = s·c + m (s = (hi-lo)/255, m = lo + 128s), so the
  // approximate dot needs each vector's CODE SUM next to its codes —
  // precomputed at ingest, the standard trick:
  //   dot(x̂, ŷ) = s²·Σcx·cy + s·m·(Σcx + Σcy) + d·m².
  // Calibration is model state (two q6-quantized doubles from one exact
  // percentile aggregation) — any engine re-deriving it (the DuckDB
  // oracle does) lands on bit-identical codes.

  final case class I8Calibration(lo: Double, hi: Double) {
    require(hi > lo, s"degenerate calibration [$lo, $hi]")
    val scale: Double = (hi - lo) / 255.0
    /** Decoded value of code 0 (the affine midpoint). */
    val zero: Double = lo + 128.0 * scale

    /** Driver-side code of one component — the exact mirror of the
      * ingest column expression (same clip/floor arithmetic).
      */
    def codeOf(x: Double): Int =
      (math.floor((math.min(math.max(x, lo), hi) - lo) / scale + 0.5) - 128).toInt
  }

  private def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  /** Corpus-wide calibration at `quantile` (e.g. 0.99 clips the top and
    * bottom 1% of component values). Exact percentile — deterministic on
    * any layout — with bounds q6-quantized (`floor(x*1e6 + 0.5)`) so
    * re-derivations agree bit-for-bit.
    *
    * BOUNDED-CORPUS path: Spark's exact percentile buffers every exploded
    * component per aggregation (n·dim doubles), which is the oracle's
    * price — only the exact quantile is re-derivable bit-identically by
    * another engine. Calibrate on a bounded sample (a quantile is
    * estimated well from a fraction of a large corpus), or use
    * [[calibrateApprox]] when the calibration pass itself must scan an
    * unbounded corpus.
    */
  def calibrate(df: DataFrame, vecCol: String,
                quantile: Double = 0.99): I8Calibration = {
    require(quantile > 0.5 && quantile < 1.0,
      s"quantile must be in (0.5, 1), got $quantile")
    val r = df
      .select(explode(col(vecCol).cast(ArrayType(DoubleType))).as("x"))
      .agg(expr(s"percentile(x, ${1 - quantile})").as("lo"),
        expr(s"percentile(x, $quantile)").as("hi"))
      .head()
    I8Calibration(q6(r.getDouble(0)), q6(r.getDouble(1)))
  }

  /** UNBOUNDED-corpus calibration: approx_percentile's bounded sketch
    * (KLL-style, memory ~accuracy, never n·dim) instead of the exact
    * buffer. The returned bounds are within 1/accuracy rank error of the
    * exact ones — quantization clipping is insensitive at that scale —
    * but NOT bit-identical across engines, so gates that hash-match a
    * DuckDB re-derivation must keep using [[calibrate]] (on a bounded
    * sample); this is the production ingest path at 100 TB.
    */
  def calibrateApprox(df: DataFrame, vecCol: String,
                      quantile: Double = 0.99,
                      accuracy: Int = 10000): I8Calibration = {
    require(quantile > 0.5 && quantile < 1.0,
      s"quantile must be in (0.5, 1), got $quantile")
    val r = df
      .select(explode(col(vecCol).cast(ArrayType(DoubleType))).as("x"))
      .agg(percentile_approx(col("x"), lit(1 - quantile), lit(accuracy)).as("lo"),
        percentile_approx(col("x"), lit(quantile), lit(accuracy)).as("hi"))
      .head()
    I8Calibration(q6(r.getDouble(0)), q6(r.getDouble(1)))
  }

  /** Ingest: add `{out}_codes` (array<tinyint>, calibrated affine codes)
    * and `{out}_csum` (code sum — the precomputed term of the approximate
    * dot). The HOFs run once at ingest; serving reads stored columns.
    */
  def quantizeColumnCalibrated(df: DataFrame, vecCol: String, out: String,
                               cal: I8Calibration): DataFrame = {
    val codes = transform(col(vecCol).cast(ArrayType(DoubleType)),
      x => (floor((least(greatest(x, lit(cal.lo)), lit(cal.hi)) - lit(cal.lo))
        / lit(cal.scale) + lit(0.5)) - lit(128)).cast(ByteType))
    df.withColumn(s"${out}_codes", codes)
      .withColumn(s"${out}_csum",
        aggregate(col(s"${out}_codes"), lit(0L), (a, c) => a + c))
  }

  /** Calibrated-domain top-k + full-precision rerank over STORED codes:
    * the candidate stage scans only (codes, csum) — 4x less bandwidth AND
    * a shared scale (no per-row scale multiply); the approximate dot is
    * the codegen int8 kernel plus scalar affine terms. candidateK is the
    * recall margin, as in [[searchStoredCodes]].
    */
  def searchCalibrated(codes: DataFrame, full: DataFrame,
                       idCol: String, vecCol: String,
                       codesCol: String, csumCol: String,
                       cal: I8Calibration, dim: Int,
                       query: Seq[Double], k: Int, candidateK: Int): DataFrame = {
    val qCodes = query.map(cal.codeOf)
    val qSum = qCodes.map(_.toLong).sum
    val s2 = cal.scale * cal.scale
    val sm = cal.scale * cal.zero
    val mm = dim * cal.zero * cal.zero
    // ((dot·s²) + (sm·(csum + qsum))) + mm — the oracle renders the SAME
    // parenthesization so the double arithmetic is bit-identical
    val approx = v_dot_i8(col(codesCol), typedLit(qCodes.map(_.toByte))) * lit(s2) +
      lit(sm) * (col(csumCol) + lit(qSum)).cast(DoubleType) + lit(mm)
    val cands = codes.select(col(idCol), col(codesCol), col(csumCol))
      .withColumn("__approx", approx)
      .orderBy(col("__approx").desc, col(idCol).asc)
      .limit(candidateK)
      .select(col(idCol))
    val q = codes.sparkSession.range(1).select(vec(query).as("__qv"))
    full.select(col(idCol), col(vecCol))
      .join(broadcast(cands), Seq(idCol))
      .crossJoin(broadcast(q))
      .withColumn("score", v_dot(col(vecCol), col("__qv")))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** splitmix64 finalizer — the deterministic, engine-independent source
    * of the projection signs (computed driver-side only; executors see
    * literals).
    */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** The ±1 entry of the seeded sign matrix at (output j, input i). */
  def projectionSign(seed: Long, j: Int, i: Int): Double =
    if ((mix64(seed * 1000003L + j.toLong * 7919L + i.toLong) & 1L) == 0L) 1.0 else -1.0

  /** Johnson–Lindenstrauss sign random projection: out_j =
    * (Σ_i v_i · s_ji) / √outDim with s_ji ∈ {±1} seeded — the
    * dimensionality-reduction step that makes downstream ANN/clustering
    * cheaper (pairwise distances preserved within (1±ε) w.h.p. for
    * outDim ~ log n / ε², Achlioptas 2001's database-friendly variant).
    * The projection MATRIX is model state inlined as ±1.0 literals: the
    * whole op is one map-side codegen'd projection — no shuffle, no
    * broadcast, nothing to fit in memory but the row. Term order is the
    * pinned left-to-right fold (((v₁s₁ + v₂s₂) + v₃s₃)…)·scale + 0.0, so
    * any engine replaying the same order reproduces it bit-for-bit (the
    * trailing + 0.0 flushes −0.0). O(inDim·outDim) multiply-adds per row
    * — at 100 TB this beats a dense matmul library call because it fuses
    * into the scan's whole-stage-codegen pass with zero data movement.
    */
  def projectColumn(df: DataFrame, vecCol: String, out: String,
                    inDim: Int, outDim: Int, seed: Long = 42L): DataFrame = {
    require(inDim >= 1 && outDim >= 1, s"bad dims $inDim -> $outDim")
    df.withColumn(out, org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.SignProjection(
        org.apache.spark.sql.graftbridge.Bridge.expression(
          col(vecCol).cast(ArrayType(DoubleType))),
        inDim, outDim, seed)))
  }

  /** The UNROLLED expression-tree form of [[projectColumn]] — O(inDim ×
    * outDim) `element_at` nodes, kept ONLY as the bit-exactness witness
    * for the fused kernel (QuantSpec pins kernel == fold on the corpus):
    * at production dims (1024→256 = 262k nodes) Catalyst analysis and
    * Janino choke on this shape, which is why the kernel replaced it.
    */
  private[graft] def projectColumnUnrolled(df: DataFrame, vecCol: String,
                                           out: String, inDim: Int,
                                           outDim: Int,
                                           seed: Long = 42L): DataFrame = {
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val comps = (0 until outDim).map { j =>
      (0 until inDim).map { i =>
        element_at(col("__pv"), i + 1) * lit(projectionSign(seed, j, i))
      }.reduce(_ + _) * lit(scale) + lit(0.0)
    }
    df.withColumn("__pv", col(vecCol).cast(ArrayType(DoubleType)))
      .withColumn(out, array(comps: _*))
      .drop("__pv")
  }
}
