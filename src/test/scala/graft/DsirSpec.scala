package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dsir

/** DSIR importance weights: feature shape and the selection property —
  * raw documents resembling the target corpus must outscore those that
  * don't.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("featureBuckets = unigrams + bigrams, all within [0, buckets)") {
    val r = Seq("one two three").toDF("t")
      .select(Dsir.featureBuckets(col("t"), 97)).head().getSeq[Long](0)
    assert(r.length === 3 + 2)
    assert(r.forall(b => b >= 0 && b < 97))
    // single-token text: one unigram, no bigram
    val one = Seq("solo").toDF("t")
      .select(Dsir.featureBuckets(col("t"), 97)).head().getSeq[Long](0)
    assert(one.length === 1)
  }

  test("raw docs that share the target's vocabulary outscore those that don't") {
    val target = (0 until 20)
      .map(i => (1000L + i, s"medical clinical trial dosage patient cohort $i"))
      .toDF("doc_id", "text")
    val raw = ((0 until 20).map(i =>
        (i.toLong, s"medical patient dosage report $i")) ++
      (20 until 40).map(i =>
        (i.toLong, s"football transfer window goal score $i")))
      .toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text",
        buckets = 4096)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val medical = (0 until 20).map(i => w(i.toLong))
    val football = (20 until 40).map(i => w(i.toLong))
    // every target-like doc beats every off-domain doc
    assert(medical.min > football.max,
      s"medical min ${medical.min} vs football max ${football.max}")
  }

  test("a doc with no tokens carries no evidence and is absent") {
    val target = Seq((100L, "alpha beta")).toDF("doc_id", "text")
    val raw = Seq((1L, "alpha beta gamma"), (2L, "   ")).toDF("doc_id", "text")
    val out = Dsir.importanceWeights(raw, target, "doc_id", "text", buckets = 64)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSeq === Seq(1L))
  }
}
