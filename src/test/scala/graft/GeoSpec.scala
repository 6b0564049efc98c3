package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Geo

class GeoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // unit square (0,0)-(10,10) as (lat, lon) vertices
  private val square = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))

  test("pointInPolygon: classic containment cases on a square") {
    val pts = Seq(
      (5.0, 5.0, true),    // center
      (-1.0, 5.0, false),  // below
      (11.0, 5.0, false),  // above
      (5.0, -0.1, false),  // left
      (5.0, 10.1, false),  // right
      (9.9, 9.9, true),    // near corner, inside
      (5.0, 20.0, false))  // far right on ray line
    val got = pts.toDF("lat", "lon", "expected")
      .withColumn("got", Geo.pointInPolygon(col("lat"), col("lon"), square))
      .collect()
    got.foreach(r => assert(r.getBoolean(3) == r.getBoolean(2), r))
  }

  test("pointInPolygon handles concave polygons") {
    // an L-shape: the notch (7, 7) is OUTSIDE though the bounding box
    // contains it
    val ell = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 5.0), (5.0, 5.0),
      (5.0, 10.0), (0.0, 10.0))
    val got = Seq((2.0, 2.0), (7.0, 7.0), (7.0, 2.0), (2.0, 7.0))
      .toDF("lat", "lon")
      .withColumn("in", Geo.pointInPolygon(col("lat"), col("lon"), ell))
      .collect().map(r => ((r.getDouble(0), r.getDouble(1)), r.getBoolean(2))).toMap
    assert(got((2.0, 2.0)) && got((7.0, 2.0)) && got((2.0, 7.0)))
    assert(!got((7.0, 7.0)))
  }

  test("inBoundingBox is inclusive on all four bounds") {
    val got = Seq((10.0, 20.0), (40.0, 60.0), (25.0, 40.0), (9.9, 40.0), (25.0, 60.1))
      .toDF("lat", "lon")
      .withColumn("in", Geo.inBoundingBox(col("lat"), col("lon"), 10, 40, 20, 60))
      .collect().map(_.getBoolean(2)).toSeq
    assert(got == Seq(true, true, true, false, false))
  }

  test("polygonSql renders one crossing term per edge from the same vertices") {
    val sql = Geo.polygonSql("lat", "lon", square)
    assert("CAST\\(\\(\\(".r.findAllIn(sql).length == 4, sql)
    assert(sql.endsWith("% 2 = 1"), sql)
  }

  test("geo cell: column and driver cell arithmetic agree, covers contain the box") {
    // deterministic pseudo-random points across (and beyond) the globe —
    // includes out-of-range lat (the clamp path)
    val pts = (0 until 500).map { i =>
      (((i * 37) % 260) - 100.0, ((i * 53) % 400) - 200.0)
    }
    val bits = 4
    val colCells = pts.toDF("lat", "lon")
      .withColumn("cell", Geo.cellCol(col("lat"), col("lon"), bits))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
    pts.foreach { case (la, lo) =>
      assert(colCells((la, lo)) === Geo.cellOf(la, lo, bits), s"($la, $lo)")
    }
    // cover containment: every point INSIDE the box has its cell in the
    // box's cover (the property pruning correctness rests on)
    val (s0, n0, w0, e0) = (10.0, 40.0, 20.0, 60.0)
    val cover = Geo.coverCells(s0, n0, w0, e0, bits).toSet
    pts.filter { case (la, lo) => la >= s0 && la <= n0 && lo >= w0 && lo <= e0 }
      .foreach { case (la, lo) =>
        assert(cover.contains(Geo.cellOf(la, lo, bits)), s"($la, $lo)")
      }
  }

  test("geo cell layout: box query partition-prunes and equals the plain filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-geo-spec").toString
    val pts = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
      .select(col("event_id"),
        col("user_id").cast("double").as("lat"),
        (col("event_id") % 180).cast("double").as("lon"))
    Geo.writeCellLayout(pts, "lat", "lon", bits = 4, dir)
    val layout = Geo.readCellLayout(spark, dir)
    val res = Geo.searchBox(layout, "lat", "lon", 10, 40, 20, 60, bits = 4)
    res.collect()
    val p = res.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(p).isDefined, p)
    // pruned result == the plain full-scan filter
    val expected = pts.filter(Geo.inBoundingBox(col("lat"), col("lon"), 10, 40, 20, 60))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val got = res.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === expected)
    // and the scan touches only cover-cell partitions
    val cover = Geo.coverCells(10, 40, 20, 60, bits = 4).toSet
    val touched = res.select("cell").distinct().collect().map(_.getLong(0)).toSet
    assert(touched.subsetOf(cover), s"touched $touched not in cover $cover")
  }

  test("antimeridian box (west > east): membership wraps, cover is the two arcs' union") {
    val bits = 4
    val (s0, n0, w0, e0) = (-30.0, 30.0, 150.0, -150.0) // crosses 180
    // membership: the wrap form equals the OR of the two plain arcs
    val pts = (0 until 500).map { i =>
      (((i * 37) % 160) - 80.0, ((i * 53) % 360) - 180.0)
    }
    val df = pts.toDF("lat", "lon")
    val wrapped = df.filter(Geo.inBoundingBox(col("lat"), col("lon"), s0, n0, w0, e0))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val arcs = df.filter(
      Geo.inBoundingBox(col("lat"), col("lon"), s0, n0, w0, 180.0) ||
        Geo.inBoundingBox(col("lat"), col("lon"), s0, n0, -180.0, e0))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    assert(wrapped === arcs)
    assert(wrapped.exists(_._2 > 150) && wrapped.exists(_._2 < -150),
      "test box failed to catch points on both sides of the antimeridian")
    // cover containment still holds for the wrapped box
    val cover = Geo.coverCells(s0, n0, w0, e0, bits).toSet
    wrapped.foreach { case (la, lo) =>
      assert(cover.contains(Geo.cellOf(la, lo, bits)), s"($la, $lo)")
    }
    // and the cover is the union of the arcs' covers, no more
    assert(cover === (Geo.coverCells(s0, n0, w0, 180.0, bits).toSet ++
      Geo.coverCells(s0, n0, -180.0, e0, bits).toSet))
  }

  test("antimeridian box query over the stored layout equals the plain wrap filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-geo-am").toString
    val pts = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
      .select(col("event_id"),
        (((col("event_id") * 37) % 160) - 80).cast("double").as("lat"),
        ((col("event_id") % 360) - 180).cast("double").as("lon"))
    Geo.writeCellLayout(pts, "lat", "lon", bits = 4, dir)
    val layout = Geo.readCellLayout(spark, dir)
    val res = Geo.searchBox(layout, "lat", "lon", -30, 30, 150, -150, bits = 4)
    val expected = pts
      .filter(Geo.inBoundingBox(col("lat"), col("lon"), -30, 30, 150, -150))
      .select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    val got = res.select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === expected && got.nonEmpty)
  }
}
