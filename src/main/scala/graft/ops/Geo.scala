package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo filter primitives of the reference host's filter surface (the
  * geo_bounding_box / geo_polygon conditions alongside the geo_radius the
  * haversine kernel serves): pure column compositions — every comparison
  * stays inside whole-stage codegen, and because the arithmetic is plain
  * IEEE double ops the DuckDB oracle reproduces it bit-for-bit (the
  * polygon SQL is GENERATED from the same vertex list, see
  * [[polygonSql]]).
  */
object Geo {

  /** lat in [south, north] AND lon in [west, east] (simple box; no
    * antimeridian wrap). Inclusive bounds, matching a BETWEEN.
    */
  def inBoundingBox(lat: Column, lon: Column,
                    south: Double, north: Double,
                    west: Double, east: Double): Column =
    lat >= south && lat <= north && lon >= west && lon <= east

  /** Ray-casting point-in-polygon: cast a ray to +infinity longitude and
    * count edge crossings; odd = inside. `poly` is (lat, lon) vertices in
    * order (closed implicitly). Points exactly on an edge are
    * half-open-convention dependent — callers choose vertices off the
    * data grid. The per-edge test and the fold order are mirrored exactly
    * by [[polygonSql]].
    */
  def pointInPolygon(lat: Column, lon: Column,
                     poly: Seq[(Double, Double)]): Column = {
    require(poly.length >= 3, "polygon needs >= 3 vertices")
    val n = poly.length
    val crossings = (0 until n).map { i =>
      val (y1, x1) = poly(i)
      val (y2, x2) = poly((i + 1) % n)
      ((lit(y1) > lat) =!= (lit(y2) > lat)) &&
        (lon < lit(x2 - x1) * (lat - lit(y1)) / lit(y2 - y1) + lit(x1))
    }
    crossings.map(_.cast("int")).reduce(_ + _) % 2 === 1
  }

  /** DuckDB boolean SQL for the SAME ray cast over `latExpr`/`lonExpr`:
    * per-edge literals rendered from the identical doubles ((x2-x1)
    * pre-computed driver-side in both engines), crossings summed
    * left-associatively like the column reduce.
    */
  def polygonSql(latExpr: String, lonExpr: String,
                 poly: Seq[(Double, Double)]): String = {
    def d(v: Double): String = java.lang.Double.toString(v)
    val n = poly.length
    val terms = (0 until n).map { i =>
      val (y1, x1) = poly(i)
      val (y2, x2) = poly((i + 1) % n)
      s"CAST(((${d(y1)} > $latExpr) <> (${d(y2)} > $latExpr)) AND " +
        s"($lonExpr < ${d(x2 - x1)} * ($latExpr - ${d(y1)}) / ${d(y2 - y1)} + ${d(x1)}) AS INTEGER)"
    }
    s"(${terms.mkString(" + ")}) % 2 = 1"
  }
}
