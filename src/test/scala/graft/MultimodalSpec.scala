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

  test("decoder seam: fake stub and a real UTF-8 decoder run the same path") {
    // both instances flow through the identical extractFeatures plumbing;
    // only the injected kernel differs
    val fake = Multimodal.featuresOf(spark, TestSpark.sfDir, dim = 8,
      decoder = Multimodal.FakeDecoder)
    val real = Multimodal.featuresOf(spark, TestSpark.sfDir, dim = 8,
      decoder = Multimodal.Utf8HistogramDecoder)
    assert(fake.count() === 500 && real.count() === 500)
    // the real decoder actually interprets the payload: a histogram over
    // the UTF-8 text sums to the character count, dimension by dimension
    val row = Multimodal.syntheticMediaTable(spark, TestSpark.sfDir)
      .filter(col("id") === "0").select(col("media")).head()
    val text = new String(row.getAs[Array[Byte]](0),
      java.nio.charset.StandardCharsets.UTF_8)
    val hist = real.filter(col("id") === "0")
      .select(col("features")).head().getSeq[Float](0)
    assert(hist.sum.toInt === text.length)
    val expected = new Array[Float](8)
    text.foreach(c => expected(c % 8) += 1.0f)
    assert(hist === expected.toSeq)
    // and the two kernels genuinely differ on the same payload
    val fhist = fake.filter(col("id") === "0")
      .select(col("features")).head().getSeq[Float](0)
    assert(fhist !== hist)
  }

  test("extraction plan has no shuffle (map-side only)") {
    val plan = Multimodal.featuresOf(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("frame sampling: 1-to-N explode bounded by duration and maxFrames, no shuffle") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow("a", Array.fill[Byte](100)(1), "fake/v", 64, 48, 3500L), // 3 frames
      Multimodal.MediaRow("b", Array.fill[Byte](10)(2), "fake/v", 64, 48, 99999L), // capped at 8
      Multimodal.MediaRow("c", Array.fill[Byte](7)(3), "fake/v", 64, 48, 10L))     // min 1
      .toDS()
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L, maxFrames = 8)
    val byId = frames.collect().groupBy(_.id)
    assert(byId("a").length === 3)
    assert(byId("a").map(_.ts_ms).sorted.toSeq === Seq(0L, 1000L, 2000L))
    assert(byId("a").forall(_.frame.length === 33)) // 100 / 3
    assert(byId("b").length === 8)
    assert(byId("b").forall(_.frame.length === 1))  // 10 / 8
    assert(byId("c").length === 1)
    assert(byId("c").head.frame.length === 7)
    assert(!frames.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("resize: metadata updates and payload scales with the pixel ratio") {
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow("a", Array.fill[Byte](1000)(1), "fake/i", 100, 100, 0L),
      Multimodal.MediaRow("z", Array.fill[Byte](10)(1), "fake/i", 0, 0, 0L)) // degenerate
      .toDS()
    val out = Multimodal.resize(media, 50, 50).collect().map(r => r.id -> r).toMap
    assert(out("a").width === 50 && out("a").height === 50)
    assert(out("a").media.length === 250) // 1000 * (50*50)/(100*100)
    assert(out("z").media.length === 0)   // unknown source pixels -> empty stub
  }

  test("dedupFrames collapses byte-identical frames across media rows") {
    import graft.multimodal.Multimodal
    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow("a", "hello world bytes here".getBytes("UTF-8"),
        "fake", 0, 0, 2000L),
      // exact copy under another id: every frame collides
      Multimodal.MediaRow("b", "hello world bytes here".getBytes("UTF-8"),
        "fake", 0, 0, 2000L),
      Multimodal.MediaRow("c", "completely different payload".getBytes("UTF-8"),
        "fake", 0, 0, 2000L)
    ).toDS()
    val out = Multimodal.dedupFrames(Multimodal.sampleFrames(media))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // a and b yield identical frames (2 each): two fp groups of n=2, keeper a
    val dups = out.filter(_._2 == 2L)
    assert(dups.length === 2 && dups.forall(_._3 == "a"))
    // c's frames are singletons
    assert(out.filter(_._2 == 1L).forall(_._3 == "c"))
  }
}
