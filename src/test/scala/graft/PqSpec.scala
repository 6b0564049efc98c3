package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Ann, Pq}

/** Product-quantization semantics: code/ADC consistency and the
  * margin-recovers-exact-top-k contract (the e2e pipeline itself is
  * value-oracled by the ann_pq gate).
  */
class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def corpus = {
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    emb.select(col("vec_id").cast(StringType).as("id"),
      col("embedding").cast(ArrayType(DoubleType)).as("vector"))
  }

  private lazy val model =
    Pq.fit(corpus, "id", "vector", dim = 64, m = 4, ksub = 16,
      maxIter = 1, seed = 42L)

  test("codebooks have the declared shape and encode is deterministic") {
    assert(model.codebooks.length == 4)
    assert(model.codebooks.forall(_.length == 16))
    assert(model.codebooks.forall(_.forall(_.length == 16)))
    val a = Pq.encode(corpus, "vector", model)
      .select("id", "pcode").collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    val b = Pq.encode(corpus, "vector", model)
      .select("id", "pcode").collect().map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    assert(a == b)
    assert(a.values.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 16)))
  }

  test("ADC score equals the dot of the reconstructed centroid concat") {
    val q = corpus.filter(col("id") === "11")
      .select(col("vector")).head().getSeq[Double](0)
    val rows = Pq.encode(corpus, "vector", model)
      .select(col("id"), col("pcode"),
        Pq.approxScore(model, q).as("approx"))
      .collect()
    rows.foreach { r =>
      val code = r.getSeq[Int](1)
      val recon = (0 until 4).flatMap(mi => model.codebooks(mi)(code(mi)))
      val exact = recon.zip(q).map { case (a, b) => a * b }.sum
      assert(math.abs(exact - r.getDouble(2)) < 1e-9,
        s"id=${r.getString(0)} approx=${r.getDouble(2)} recon-dot=$exact")
    }
  }

  test("candidateK = corpus size recovers the exact dot top-k") {
    val q = corpus.filter(col("id") === "7")
      .select(col("vector")).head().getSeq[Double](0)
    val n = corpus.count().toInt
    val codes = Pq.encode(corpus, "vector", model).select("id", "pcode")
    val got = Pq.searchPqStored(codes, corpus, "id", "vector", model, q,
      k = 10, candidateK = n)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // round-before-rank like searchPqStored, so tiebreaks agree exactly
    val want = corpus
      .select(col("id"),
        round(graft.functions.v_dot(col("vector"), graft.functions.vec(q)), 6)
          .as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == want)
  }
}
