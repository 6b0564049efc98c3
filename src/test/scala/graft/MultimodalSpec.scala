package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("synthetic media table has the binary + metadata schema") {
    val df = Multimodal.syntheticMediaTable(spark, TestSpark.sfDir)
    assert(df.schema("media").dataType.typeName === "binary")
    assert(df.count() === 500)
  }

  test("feature extraction: partition-wise, deterministic, fixed dim") {
    val a = Multimodal.featuresOf(spark, TestSpark.sfDir, dim = 16)
    val b = Multimodal.featuresOf(spark, TestSpark.sfDir, dim = 16)
    val fa = a.select("id", "features").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    val fb = b.select("id", "features").collect()
      .map(r => r.getString(0) -> r.getSeq[Float](1)).toMap
    assert(fa === fb)
    assert(fa.values.forall(_.length === 16))
  }

  test("nBytes equals UTF-8 payload length") {
    val media = Multimodal.syntheticMediaTable(spark, TestSpark.sfDir)
      .select(col("id"), length(col("media")).cast("int").as("expected"))
    val feats = Multimodal.featuresOf(spark, TestSpark.sfDir)
      .select(col("id"), col("nBytes"))
    assert(feats.join(media, "id")
      .filter(col("nBytes") =!= col("expected")).count() === 0)
  }

  test("extraction plan has no shuffle (map-side only)") {
    val plan = Multimodal.featuresOf(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
