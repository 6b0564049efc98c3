package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Layout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("zorderKey matches a reference Morton implementation") {
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map { i =>
        (((x >> i) & 1L) << (2 * i + 1)) | (((y >> i) & 1L) << (2 * i))
      }.reduce(_ | _)
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zorderKey(col("x"), col("y"), 4).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == morton(r.getLong(0), r.getLong(1), 4),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
    // the 4-bit key is a bijection on the 16x16 grid
    assert(got.map(_.getLong(2)).distinct.length == 256)
  }

  test("epochShuffle: per-epoch positions are permutations, epochs differ, layout-stable") {
    val ids = (1L to 200L).toDF("id")
    val out = Layout.epochShuffle(ids, "id", epochs = 2, salt = "t")
      .collect().map(r => (r.getInt(1), r.getLong(0), r.getLong(2)))
    val byEpoch = out.groupBy(_._1)
    assert(byEpoch.keySet === Set(0, 1))
    byEpoch.values.foreach { rows =>
      assert(rows.map(_._3).sorted.toSeq === (1L to 200L))
      assert(rows.map(_._2).distinct.length === 200)
    }
    // the two epochs are different permutations (md5 keyed on epoch)
    val e0 = byEpoch(0).sortBy(_._3).map(_._2).toSeq
    val e1 = byEpoch(1).sortBy(_._3).map(_._2).toSeq
    assert(e0 !== e1)
    // positions don't depend on the input partitioning
    val again = Layout.epochShuffle(ids.repartition(7), "id", 2, "t")
      .filter(col("epoch") === 0).collect()
      .sortBy(_.getLong(2)).map(_.getLong(0)).toSeq
    assert(again === e0)
  }

  test("interleaveBySource: each full round holds every source exactly once") {
    val df = (for (s <- 0 until 4; i <- 0 until 30)
      yield (s * 100L + i, s"s$s")).toDF("id", "src")
    val out = Layout.interleaveBySource(df, "id", "src", salt = "t").collect()
    assert(out.map(_.getAs[Long]("pos")).sorted.toSeq === (1L to 120L))
    // rnd r occupies positions (r-1)*4+1 .. r*4 and holds all 4 sources
    out.groupBy(_.getAs[Long]("rnd")).foreach { case (r, rows) =>
      assert(rows.map(_.getAs[String]("src")).distinct.length === 4, s"round $r")
      assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq ===
        ((r - 1) * 4 + 1 to r * 4).toSeq, s"round $r")
    }
    // uneven sources: the short source drops out of later rounds only
    val uneven = (for (s <- 0 until 3; i <- 0 until (if (s == 2) 5 else 20))
      yield (s * 100L + i, s"s$s")).toDF("id", "src")
    val got = Layout.interleaveBySource(uneven, "id", "src", "t").collect()
    val lastShort = got.filter(_.getAs[String]("src") == "s2")
      .map(_.getAs[Long]("rnd")).max
    assert(lastShort === 5L)
    assert(got.map(_.getAs[Long]("pos")).sorted.toSeq === (1L to 45L))
  }

  test("zorderSql emits the same key via DuckDB-compatible integer ops (Spark-evaluated)") {
    // Spark parses the same operator set (>>, &, <<, |), so evaluating the
    // generated SQL string in Spark pins the two emitters to one bit spec
    val sql = Layout.zorderSql("x", "y", 4)
    val df = (for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y))
      .toDF("x", "y")
      .select(Layout.zorderKey(col("x"), col("y"), 4).as("a"),
        expr(sql).as("b"))
    assert(df.filter(col("a") =!= col("b")).count() == 0)
  }

  test("z-order buckets bound BOTH dimensions; a linear sort bounds only one") {
    // 64x64 grid, 16 buckets of 256 rows each
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    def avgBboxArea(bucketed: org.apache.spark.sql.DataFrame): Double = {
      val rows = bucketed.groupBy("bucket")
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"))
        .collect().map(_.getLong(1))
      rows.sum.toDouble / rows.length
    }
    val z = grid.select(col("x"), col("y"),
      shiftright(Layout.zorderKey(col("x"), col("y"), 6), 8).as("bucket"))
    val linear = grid.select(col("x"), col("y"),
      floor((col("x") * 64 + col("y")) / 256).as("bucket"))
    val zArea = avgBboxArea(z)
    val linArea = avgBboxArea(linear)
    // z buckets are exact 16x16 tiles (area 256); row-major slabs are
    // 4x64 strips (area 256) — equal here, but range queries on y prune
    // z-buckets and not slabs; assert the y-extent difference directly
    val zYext = z.groupBy("bucket").agg((max("y") - min("y") + 1).as("e"))
      .agg(avg("e")).head().getDouble(0)
    val linYext = linear.groupBy("bucket").agg((max("y") - min("y") + 1).as("e"))
      .agg(avg("e")).head().getDouble(0)
    assert(zArea <= linArea + 1e-9)
    assert(zYext * 3 < linYext,
      s"z-order y-extent $zYext should be far under row-major $linYext")
  }

  test("zorderLayout produces disjoint, sorted zkey ranges per partition") {
    val grid = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val laid = Layout.zorderLayout(grid, "x", "y", bits = 5, numPartitions = 4)
    assert(laid.rdd.getNumPartitions == 4)
    import org.apache.spark.sql.Row
    val perPart = laid.rdd.mapPartitionsWithIndex { (i, it) =>
      val zs = it.map(_.asInstanceOf[Row].getLong(2)).toSeq
      if (zs.isEmpty) Iterator.empty
      else Iterator((i, zs.size, zs.min, zs.max, zs == zs.sorted))
    }.collect().sortBy(_._1)
    assert(perPart.map(_._2).sum == 32 * 32)
    perPart.foreach { case (i, _, _, _, sorted) =>
      assert(sorted, s"partition $i not sorted by zkey")
    }
    // file ranges are disjoint — the min/max pruning contract
    perPart.sliding(2).foreach {
      case Array(a, b) => assert(a._4 < b._3,
        s"partitions ${a._1} and ${b._1} overlap in zkey")
      case _ =>
    }
  }
}
