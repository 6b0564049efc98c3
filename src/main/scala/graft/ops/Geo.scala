package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
  /** Box membership. `west > east` is the ANTIMERIDIAN-crossing box (the
    * backend's geo_bounding_box wrap convention: left lon > right lon):
    * the longitude condition becomes the OR of the two arcs.
    */
  def inBoundingBox(lat: Column, lon: Column,
                    south: Double, north: Double,
                    west: Double, east: Double): Column = {
    val lonIn =
      if (west <= east) lon >= west && lon <= east
      else lon >= west || lon <= east
    lat >= south && lat <= north && lonIn
  }

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

  // -- geo cell index (the backend's geo payload index, Spark-first) -------
  //
  // A geohash-equivalent integer cell: lat/lon quantized to 2^bits rows/
  // columns of the [-90,90]x[-180,180] grid, Morton-interleaved
  // (Layout.zorderKey — lat bits odd, lon bits even). Points written
  // partitionBy(cell) make a bounding-box query a STATIC partition-pruned
  // scan: the box's cover cells enumerate driver-side (model-sized, like
  // probed IVF clusters), the literal IN prunes to their files, and the
  // exact box predicate runs only inside them. Out-of-range coordinates
  // clamp to the boundary cells; the exact predicate inside the cover
  // removes them whenever a box reaches those cells.

  private def cellIndex1D(v: Double, offset: Double, extent: Double,
                          bits: Int): Long = {
    val c = math.floor((v + offset) / extent * (1L << bits)).toLong
    math.min(math.max(c, 0L), (1L << bits) - 1)
  }

  /** Driver-side cell of one (lat, lon) — the EXACT mirror of [[cellCol]]
    * (same IEEE expression order), used to enumerate box covers.
    */
  def cellOf(lat: Double, lon: Double, bits: Int): Long =
    morton(cellIndex1D(lat, 90.0, 180.0, bits),
      cellIndex1D(lon, 180.0, 360.0, bits), bits)

  private def morton(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
    }.reduce(_ | _)

  /** Column form of the cell id (the ingest-side expression): identical
    * arithmetic to [[cellOf]], composed from [[Layout.zorderKey]].
    */
  def cellCol(lat: Column, lon: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 15, s"cellCol needs 1 <= bits <= 15, got $bits")
    val max = lit((1L << bits) - 1)
    def idx(v: Column, offset: Double, extent: Double): Column =
      least(greatest(
        floor((v + lit(offset)) / lit(extent) * lit(1L << bits)).cast("long"),
        lit(0L)), max)
    Layout.zorderKey(idx(lat, 90.0, 180.0), idx(lon, 180.0, 360.0), bits)
  }

  /** All cells whose grid rectangle intersects the box — the cover a box
    * query prunes to. Cell index is monotone in each coordinate, so the
    * cover is the cross product of the two 1-D index ranges: every point
    * inside the box maps into it (GeoSpec pins this against random
    * points). Size is bounded by resolution: at bits=b a box spanning
    * fractions fx/fy of the grid covers ~(fx·2^b)·(fy·2^b) cells.
    */
  def coverCells(south: Double, north: Double, west: Double, east: Double,
                 bits: Int): Seq[Long] = {
    require(south <= north, "empty box")
    if (west > east)
      // antimeridian crossing: the union of the two arcs' covers — each
      // arc is an ordinary west <= east box, so correctness reduces to
      // the pinned single-arc property
      (coverCells(south, north, west, 180.0, bits) ++
        coverCells(south, north, -180.0, east, bits)).distinct.sorted
    else {
      val la0 = cellIndex1D(south, 90.0, 180.0, bits)
      val la1 = cellIndex1D(north, 90.0, 180.0, bits)
      val lo0 = cellIndex1D(west, 180.0, 360.0, bits)
      val lo1 = cellIndex1D(east, 180.0, 360.0, bits)
      (for (la <- la0 to la1; lo <- lo0 to lo1) yield morton(la, lo, bits)).sorted
    }
  }

  /** Write the geo-cell layout: rows partitioned by cell (the stored geo
    * index — an ingest-time batch job, ONE shuffle on the cell key).
    */
  def writeCellLayout(df: DataFrame, latCol: String, lonCol: String,
                      bits: Int, dir: String): Unit =
    df.withColumn("cell", cellCol(col(latCol), col(lonCol), bits))
      .write.mode("overwrite").partitionBy("cell").parquet(dir)

  /** Read the layout back with the partition column normalized to long
    * (partition-type inference parses small cell directories as INTEGER;
    * the cast unwraps inside partition filters, so pruning survives).
    */
  def readCellLayout(spark: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame =
    spark.read.parquet(dir)
      .withColumn("cell", col("cell").cast(org.apache.spark.sql.types.LongType))

  /** Box query over the stored layout: literal cover-cell IN (static
    * partition pruning — GeoSpec asserts the scan touches only cover
    * files) + the exact box predicate inside.
    */
  def searchBox(layout: DataFrame, latCol: String, lonCol: String,
                south: Double, north: Double, west: Double, east: Double,
                bits: Int): DataFrame = {
    val cover = coverCells(south, north, west, east, bits)
    layout.filter(col("cell").isin(cover: _*))
      .filter(inBoundingBox(col(latCol), col(lonCol), south, north, west, east))
  }
}
