package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tokenCount counts whitespace tokens") {
    val r = Seq("one two  three\tfour").toDF("t")
      .select(TextAnalysis.tokenCount(col("t"))).head().getInt(0)
    assert(r === 4)
  }

  test("stopwordRatio and punctRatio bounds") {
    val df = Seq(
      "the the the",            // all stopwords
      "spark flink trino",      // none
      "!!! ???").toDF("t")
      .select(
        TextAnalysis.stopwordRatio(col("t")).as("s"),
        TextAnalysis.punctRatio(col("t")).as("p"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) === 1.0)
    assert(rows(1).getDouble(0) === 0.0)
    assert(rows(2).getDouble(1) > 0.5)
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    }
  }

  test("qualityScore in [0,1]; natural text scores above garbage") {
    val df = Seq(
      ("good", ("the quick brown fox is on the hill and it runs to the river " * 5)),
      ("bad", "@@## $$%% ^^&&"))
      .toDF("k", "t")
      .select(col("k"), TextAnalysis.qualityScore(col("t")).as("q"))
    val m = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("good") > m("bad"))
    assert(m.values.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("langId recognizes clear function-word profiles") {
    val df = Seq(
      ("en", "the cat and the dog is in that house for now with food"),
      ("de", "der hund und die katze ist nicht ein problem mit uns"),
      ("es", "el perro y la casa que es una maravilla para todos los dias"),
      ("fr", "le chien est dans une maison pour les amis des bois"),
      ("und", "xyzzy quux plugh"))
      .toDF("expected", "t")
      .select(col("expected"), TextAnalysis.langId(col("t")).as("got"))
    df.collect().foreach(r => assert(r.getString(1) === r.getString(0),
      s"lang mismatch for ${r.getString(0)}"))
  }

  test("analyze produces the full projection on real documents") {
    val out = TextAnalysis.analyze(
      Tables.load(spark, TestSpark.sfDir, "documents"), "doc_id", "text")
    assert(out.columns.toSeq === Seq("id", "n_tokens", "stopword_ratio",
      "quality", "lang_pred", "fingerprint"))
    assert(out.count() === 500)
    assert(out.filter(col("fingerprint").isNull).count() === 0)
  }
}
