package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.collections.Collections
import graft.ops.{Ann, Quant}
import graft.functions._

class QuantSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Collections.homogeneous(spark, TestSpark.sfDir)
    .select("id", "vector")

  test("quantize/dequantize round-trip error is bounded by scale/2") {
    val q = Quant.quantizeColumn(corpus, "vector", "q")
      .withColumn("back", Quant.dequantize(col("q_codes"), col("q_scale")))
      .withColumn("maxerr", array_max(
        zip_with(col("vector"), col("back"), (a, b) => abs(a - b))))
      .select("maxerr", "q_scale")
    q.collect().foreach { r =>
      assert(r.getFloat(0) <= r.getFloat(1) * 0.5f + 1e-6f)
    }
  }

  test("codes stay within int8 and zero vectors are handled") {
    val df = Seq(Seq(0f, 0f, 0f), Seq(1f, -127f, 63.5f)).toDF("vector")
    val q = Quant.quantizeColumn(df, "vector", "q").collect()
    assert(q(0).getSeq[Byte](1).forall(_ == 0))
    assert(q(1).getSeq[Byte](1).forall(b => b >= -127 && b <= 127))
  }

  test("quantized top-k with rerank recovers the exact dot top-k") {
    val qvec = corpus.filter(col("id") === "0")
      .select(col("vector").cast("array<double>")).head().getSeq[Double](0)
    val exact = Ann.bruteForce(corpus, "id", "vector", vec(qvec), 10, "dot")
      .select("id").as[String].collect().toSet
    val got = Quant.searchWithRerank(corpus, "id", "vector", qvec,
      k = 10, candidateK = 50).select("id").as[String].collect().toSet
    // candidateK=50 margin lets the exact re-rank recover the true top-10
    val recall = (exact intersect got).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }
}
