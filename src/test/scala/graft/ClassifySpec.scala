package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Classify

/** Naive Bayes classifier semantics: class recovery on separable
  * vocabulary, prior behavior, empty-doc handling, determinism.
  */
class ClassifySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Seq(
    (1L, "apple banana apple fruit sweet", "food"),
    (2L, "banana fruit apple tasty", "food"),
    (3L, "orange fruit sweet apple", "food"),
    (4L, "engine wheel brake motor", "car"),
    (5L, "brake engine gear wheel fast", "car"),
    (6L, "motor gear engine wheel", "car")
  ).toDF("doc_id", "text", "label")

  test("recovers the training classes on separable vocabulary") {
    val out = Classify.naiveBayes(corpus, corpus, "doc_id", "text", "label",
      buckets = 256).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "food", 2L -> "food", 3L -> "food",
      4L -> "car", 5L -> "car", 6L -> "car"))
  }

  test("held-out docs classify by vocabulary overlap") {
    val test = Seq((10L, "sweet banana apple", "?"),
      (11L, "fast engine brake", "?")).toDF("doc_id", "text", "label")
    val out = Classify.naiveBayes(corpus, test, "doc_id", "text", "label",
      buckets = 256).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(10L -> "food", 11L -> "car"))
  }

  test("empty documents carry no evidence and are absent") {
    val test = Seq((20L, "", "?"), (21L, "   ", "?"), (22L, "apple", "?"))
      .toDF("doc_id", "text", "label")
    val out = Classify.naiveBayes(corpus, test, "doc_id", "text", "label",
      buckets = 256).collect()
    assert(out.map(_.getLong(0)).toSet === Set(22L))
  }

  test("one row per scored document, scores are finite log-posteriors") {
    val out = Classify.naiveBayes(corpus, corpus, "doc_id", "text", "label",
      buckets = 64).collect()
    assert(out.length === 6)
    assert(out.map(_.getLong(0)).distinct.length === 6)
    out.foreach { r =>
      val s = r.getDouble(2)
      assert(!s.isNaN && !s.isInfinite && s < 0.0) // log of probabilities
    }
  }

  test("skewed priors break vocabulary ties toward the majority class") {
    // 'shared' appears equally in both classes; a doc of only shared
    // tokens must fall to the prior, which favors the 3:1 majority
    val skewed = Seq(
      (1L, "shared alpha", "big"), (2L, "shared beta", "big"),
      (3L, "shared gamma", "big"), (4L, "shared delta", "small")
    ).toDF("doc_id", "text", "label")
    val test = Seq((9L, "shared", "?")).toDF("doc_id", "text", "label")
    val out = Classify.naiveBayes(skewed, test, "doc_id", "text", "label",
      buckets = 4096).collect()
    assert(out.head.getString(1) === "big")
  }

  test("rejects a non-positive bucket count") {
    intercept[IllegalArgumentException] {
      Classify.naiveBayes(corpus, corpus, "doc_id", "text", "label", buckets = 0)
    }
  }

  test("deterministic across repartitioned input") {
    val a = Classify.naiveBayes(corpus.repartition(7), corpus.repartition(5),
      "doc_id", "text", "label", buckets = 128)
      .orderBy(col("doc_id")).collect().toSeq
    val b = Classify.naiveBayes(corpus, corpus,
      "doc_id", "text", "label", buckets = 128)
      .orderBy(col("doc_id")).collect().toSeq
    assert(a === b)
  }
}
