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

  /** Quantized-domain top-k with full-precision re-rank: search the int8
    * column for `candidateK` candidates, then re-score only those with the
    * exact kernel and keep `k`. The full-precision vectors of only
    * candidateK rows are ever touched in the second stage.
    */
  def searchWithRerank(df: DataFrame, idCol: String, vecCol: String,
                       query: Seq[Double], k: Int, candidateK: Int): DataFrame = {
    val q = df.sparkSession.range(1).select(vec(query).as("__qv"))
    val (qCodes, qScale) = quantize(col("__qv"))
    val qq = broadcast(q.select(qCodes.as("__qc"), qScale.as("__qs"), col("__qv")))
    val quantized = quantizeColumn(df, vecCol, "__v")
    quantized.crossJoin(qq)
      .withColumn("__approx", dotQuantized(
        col("__v_codes"), col("__v_scale"), col("__qc"), col("__qs")))
      .orderBy(col("__approx").desc, col(idCol).asc)
      .limit(candidateK)
      .withColumn("score", v_dot(col(vecCol), col("__qv")))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }
}
