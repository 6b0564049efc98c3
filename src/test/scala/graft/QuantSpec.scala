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

  test("pack_sign_bits + v_hamming equals the float-domain sign-mismatch count") {
    // the packed-word popcount must reproduce counting dims where the
    // signs disagree — the property the bq oracle relies on
    val got = corpus.as("a").crossJoin(corpus.as("b"))
      .filter(col("a.id") < col("b.id")).limit(200)
      .select(
        v_hamming(pack_sign_bits(col("a.vector")),
                  pack_sign_bits(col("b.vector"))).as("ham"),
        aggregate(
          zip_with(col("a.vector"), col("b.vector"),
            (x, y) => ((x > 0f) =!= (y > 0f)).cast("int")),
          lit(0), (acc, v) => acc + v).as("direct"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getInt(0) == r.getInt(1), r))
  }

  test("pack_sign_bits packs ceil(n/64) words; hamming with self is 0") {
    val df = Seq(
      Seq.fill(64)(1f), Seq.fill(65)(-1f), Seq(0f, 1f, -2f)).toDF("vector")
    val rows = df.select(size(pack_sign_bits(col("vector"))).as("w"),
      v_hamming(pack_sign_bits(col("vector")), pack_sign_bits(col("vector"))).as("h"))
      .collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 1))
    assert(rows.forall(_.getInt(1) == 0))
    // zero is NOT a set bit (x > 0 strictly): the 3-dim vector packs 0b010
    val word = df.filter(size(col("vector")) === 3)
      .select(pack_sign_bits(col("vector"))).head().getSeq[Long](0)
    assert(word == Seq(2L))
  }

  test("binary-quantized search matches the hamming-candidate + rerank composition") {
    val qvec = corpus.filter(col("id") === "0")
      .select(col("vector").cast("array<double>")).head().getSeq[Double](0)
    val bits = Quant.packSignColumn(corpus, "vector", "v1")
      .select("id", "v1_bits")
    val got = Quant.searchStoredBits(bits, corpus, "id", "vector", "v1_bits",
      qvec, k = 10, candidateK = 50).collect()
    assert(got.length == 10)
    // scores are exact full-precision dots (the rerank stage), descending
    val scores = got.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("calibrated quantization: quantile clip bounds, code mirror, outlier robustness") {
    // corpus of well-behaved components plus ONE vector with a huge
    // outlier component: per-vector max-abs quantization collapses that
    // vector's resolution to ~max/127; quantile calibration clips the
    // outlier and keeps 255 levels for the normal range
    val dim = 8
    val rows = (0 until 100).map { i =>
      (i.toString, (0 until dim).map(d => math.sin(i * dim + d)).toSeq)
    } :+ ("out", Seq.fill(dim)(0.1).updated(0, 1000.0))
    val df = rows.toDF("id", "vector")
    val cal = Quant.calibrate(df, "vector", quantile = 0.99)
    // the 99% quantile ignores the single 1000.0 (1 of 808 components)
    assert(cal.hi < 2.0, s"outlier leaked into calibration: $cal")
    assert(cal.lo > -2.0, cal.toString)
    // column codes == the driver-side mirror arithmetic
    val coded = Quant.quantizeColumnCalibrated(df, "vector", "c", cal)
    val sample = coded.filter(col("id") === "3")
      .select(col("vector"), col("c_codes"), col("c_csum")).head()
    val vs = sample.getSeq[Double](0)
    val cs = sample.getSeq[Byte](1)
    vs.zip(cs).foreach { case (x, c) =>
      assert(c.toInt === cal.codeOf(x), s"x=$x")
    }
    assert(sample.getLong(2) === cs.map(_.toLong).sum)
    // clip boundaries land on the code range ends
    assert(cal.codeOf(cal.lo) === -128 && cal.codeOf(cal.hi - 1e-12) >= 126)
    assert(cal.codeOf(-1e18) === -128 && cal.codeOf(1e18) === 127)
    // full-margin search == exact brute-force ranking (the margin contract)
    val q = rows(5)._2
    val got = Quant.searchCalibrated(coded.select("id", "c_codes", "c_csum"),
      df, "id", "vector", "c_codes", "c_csum", cal, dim, q,
      k = 5, candidateK = rows.length).collect().map(_.getString(0)).toSeq
    val exact = Ann.bruteForce(
      df.withColumn("vector", col("vector").cast("array<double>")),
      "id", "vector", vec(q), k = 5, metric = "dot")
      .collect().map(_.getString(0)).toSeq
    assert(got === exact)
  }

  test("calibrateApprox tracks the exact calibration within sketch tolerance") {
    val c = corpus.withColumn("vector", col("vector").cast("array<double>"))
    val exact = Quant.calibrate(c, "vector", quantile = 0.99)
    val approx = Quant.calibrateApprox(c, "vector", quantile = 0.99)
    // at accuracy=10000 over ~128k components the rank error is tiny, so
    // the clip bounds agree to well under the distribution's spread
    val spread = exact.hi - exact.lo
    assert(math.abs(approx.lo - exact.lo) < 0.05 * spread,
      s"lo drift: $approx vs $exact")
    assert(math.abs(approx.hi - exact.hi) < 0.05 * spread,
      s"hi drift: $approx vs $exact")
    // and the resulting codes agree on almost every component (only
    // values inside the tiny bound gap can code differently)
    val ce = Quant.quantizeColumnCalibrated(c, "vector", "e", exact)
    val ca = Quant.quantizeColumnCalibrated(c, "vector", "a", approx)
    val joined = ce.select("id", "e_codes")
      .join(ca.select("id", "a_codes"), "id")
      .select(explode(zip_with(col("e_codes"), col("a_codes"),
        (x, y) => abs(x.cast("int") - y.cast("int")))).as("d"))
    val maxD = joined.agg(max(col("d"))).head().getInt(0)
    assert(maxD <= 2, s"approx calibration shifted codes by $maxD levels")
  }

  test("projectColumn preserves pairwise distances within JL tolerance") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .limit(40)
    val p = Quant.projectColumn(e, "embedding", "proj", inDim = 64, outDim = 16)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"), col("proj"))
    val dists = p.as("a").join(p.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(
        sqrt(aggregate(zip_with(col("a.v"), col("b.v"),
          (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)).as("d"),
        sqrt(aggregate(zip_with(col("a.proj"), col("b.proj"),
          (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)).as("pd"))
      .filter(col("d") > 0)
      .select((col("pd") / col("d")).as("ratio"))
      .agg(min("ratio"), max("ratio")).head()
    // outDim 16 is a coarse sketch: ratios stay in a broad but bounded
    // band around 1 (the point is "distances survive", not precision)
    assert(dists.getDouble(0) > 0.3 && dists.getDouble(1) < 2.0,
      s"JL ratios out of band: $dists")
  }

  test("fused SignProjection kernel is bit-identical to the unrolled fold form") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings").limit(64)
    def bits(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
      df.select(col("vec_id"), col("proj")).collect().map(r =>
        r.getLong(0) -> r.getSeq[Double](1).map(
          java.lang.Double.doubleToRawLongBits)).toMap
    val kernel = bits(Quant.projectColumn(e, "embedding", "proj", 64, 16))
    val fold = bits(Quant.projectColumnUnrolled(e, "embedding", "proj", 64, 16))
    assert(kernel === fold)
    // expression count is independent of dims: production 1024->256 would
    // be 262k nodes in the fold form; the kernel is ONE node whatever the
    // dims (the sign matrix rides as a codegen reference object)
    val big = Quant.projectColumn(e, "embedding", "proj", 64, 256)
    val exprStr = big.queryExecution.analyzed.expressions.mkString(";")
    assert(exprStr.contains("sign_projection"))
    assert(!exprStr.contains("element_at"))
    assert(big.select(size(col("proj"))).head().getInt(0) === 256)
  }

  test("projectColumn plans map-side: no exchange, stays in codegen") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val plan = Quant.projectColumn(e, "embedding", "proj", inDim = 64, outDim = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"projection shuffled:\n$plan")
    // "*(n)" prefixes mark whole-stage-codegen'd operators in toString
    assert(plan.startsWith("*("), s"projection fell out of codegen:\n$plan")
  }
}
