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
}
