package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.collections._
import graft.sources._

/** The BULK arm of online sidecar maintenance: an upsert batch that —
  * together with the inc volume absorbed since the last seal — rivals
  * the corpus reseals the sidecar offline-style instead of paying a
  * touched-partition state load per batch. A corpus-sized reload
  * trickled through `upsert` (the resync shape) therefore reseals on a
  * geometric schedule and lands SEALED, enforcing the "bulk loads seal
  * offline" policy by cost rule instead of trusting callers.
  */
class BulkMaintainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val denseDesc = CollectionDescriptor("d",
    Seq(DenseField("vector", 2)), named = false)

  private def dense(i: Int): Point = {
    val a = i * 0.021
    Point(f"p$i%05d", Some(s"""{"g":${i % 3}}"""),
      dense = Map("vector" ->
        Array(math.cos(a).toFloat, math.sin(a).toFloat)))
  }

  private def denseDf(ids: Range) = {
    import spark.implicits._
    ids.map { i =>
      val p = dense(i)
      (p.id, p.payload.orNull, p.dense("vector"))
    }.toDF("id", "payload", "vector")
  }

  /** Reload `total` new points in `page`-sized batches; returns
    * (reseals, incremental inserts) summed across the COW chain.
    */
  private def reload(st0: ParquetCollectionStore, from: Int, total: Int,
                     page: Int,
                     inc: ParquetCollectionStore => Long): (Long, Long) = {
    var cur = st0
    var reseals = 0L
    var incs = 0L
    (from until (from + total)).grouped(page).foreach { chunk =>
      val pre = cur
      cur = cur.appended("d", chunk.map(dense).toIndexedSeq)
      reseals += pre.bulkReseals.get()
      incs += inc(pre)
    }
    (reseals, incs)
  }

  test("hnsw: a corpus-sized reload reseals geometrically and lands sealed") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bulk-h").toString
    val df = denseDf(0 until 20)
    ParquetCollectionStore.write(df, dir, numFiles = 1, withLog = true)
    ParquetCollectionStore.writeHnswSidecar(df, dir, field = "vector",
      m = 4, efConstruction = 16, numSegments = 2)
    val st = new ParquetCollectionStore(dir, "d", denseDesc, hnswEf = 1024)
    val (reseals, incs) = reload(st, 100, 210, 30, _.hnswIncInserts.get())
    // the geometric schedule: several pages sealed, the rest absorbed —
    // NOT one state load per page, and NOT a pure trickle either
    assert(reseals >= 2L, s"only $reseals reseals — the bulk arm slept")
    assert(incs < 210L, s"$incs incremental inserts — every page trickled")
    // the final layout is sealed + current: a fresh open serves the
    // graph exactly (vs brute) with a bounded file count per segment
    val served = new ParquetCollectionStore(dir, "d", denseDesc,
      hnswEf = 4096)
    val brute = new ParquetCollectionStore(dir, "d", denseDesc)
    val spec = SearchSpec("vector", Array(0.8, 0.6), "cosine", 8)
    assert(served.searchPoints("d", spec, withPayload = false, Nil)
      .map(p => (p._1.id, p._2)) ===
      brute.searchPoints("d", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
    val incFiles = (0 until 2).map { seg =>
      Option(new java.io.File(s"$dir/_hnsw/points/seg=$seg").listFiles())
        .getOrElse(Array.empty)
        .count(f => f.getName.startsWith("inc-"))
    }.sum
    assert(incFiles <= 2 * ParquetCollectionStore.incCompactThreshold,
      s"$incFiles inc files survived the reload — no seal happened")
  }

  test("hnsw: hotspot churn in ONE segment consolidates that partition (per-partition dial)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bulk-hot").toString
    val df = denseDf(0 until 400)
    ParquetCollectionStore.write(df, dir, numFiles = 1, withLog = true)
    ParquetCollectionStore.writeHnswSidecar(df, dir, field = "vector",
      m = 4, efConstruction = 16, numSegments = 2)
    // pure-insert churn AIMED at segment 0 only (ids filtered by the
    // build's own seeded segment hash): the corpus-fraction arm cannot
    // see the skew (150-200 inserts on a 400-point corpus stay under
    // its dial), the 8-file LSM dial is never reached (4 batches), yet
    // the segment absorbs ~its own size — the per-partition counter
    // must consolidate it, not trickle
    val seg0 = Iterator.from(1000)
      .filter(i => graft.ops.HnswSegment.segOf(f"p$i%05d", 2, 42L) == 0)
      .take(200).toVector
    var cur = new ParquetCollectionStore(dir, "d", denseDesc,
      hnswEf = 1024)
    var hot = 0L
    var corpusReseals = 0L
    seg0.grouped(50).foreach { chunk =>
      val pre = cur
      cur = cur.appended("d", chunk.map(dense).toIndexedSeq)
      hot += pre.hotspotConsolidations.get()
      corpusReseals += pre.bulkReseals.get()
    }
    assert(hot >= 1L, "the per-partition hotspot dial never fired")
    assert(corpusReseals === 0L,
      "the corpus-fraction arm tripped — the case no longer isolates " +
        "the per-partition dial")
    // the consolidated partition's counter reset (geometric schedule)
    val parts = ParquetCollectionStore.readPartCounters(
      new java.io.File(s"$dir/_hnsw/absorbed_parts.txt"))
    assert(parts.getOrElse("0", 0L) < 200L)
    // and the serve over the final state stays exact
    val served = new ParquetCollectionStore(dir, "d", denseDesc,
      hnswEf = 4096)
    val brute = new ParquetCollectionStore(dir, "d", denseDesc)
    val spec = SearchSpec("vector", Array(0.8, 0.6), "cosine", 8)
    assert(served.searchPoints("d", spec, withPayload = false, Nil)
      .map(p => (p._1.id, p._2)) ===
      brute.searchPoints("d", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
  }

  test("ivf: hotspot churn in ONE cluster consolidates that partition") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val dir = java.nio.file.Files.createTempDirectory("graft-bulk-ihot").toString
    val df = denseDf(0 until 400)
    ParquetCollectionStore.write(df, dir, numFiles = 1, withLog = true)
    val idx = graft.ops.Ann.buildIvf(
      df.withColumn("vector", col("vector").cast(ArrayType(DoubleType))),
      "id", "vector", nlist = 2, maxIter = 0)
    ParquetCollectionStore.writeIvfSidecar(
      idx.clustered.select("id", "payload", "vector", "cluster"),
      idx.centroids, dir, field = "vector")
    idx.clustered.unpersist(): Unit
    var cur = new ParquetCollectionStore(dir, "d", denseDesc, ivfNprobe = 2)
    // every insert carries (almost) one centroid's own vector: all of
    // the churn assigns to ONE cluster while the corpus dial sleeps
    val cent = idx.centroids.orderBy(col("cluster"))
      .collect().head.getSeq[Double](1).toArray
    var hot = 0L
    var corpusReseals = 0L
    (0 until 4).foreach { b =>
      val pre = cur
      val pts = (0 until 50).map { j =>
        Point(f"h$b%02d$j%03d", Some("""{"g":0}"""),
          dense = Map("vector" -> cent.map(_.toFloat)))
      }
      cur = cur.appended("d", pts.toIndexedSeq)
      hot += pre.hotspotConsolidations.get()
      corpusReseals += pre.bulkReseals.get()
    }
    assert(hot >= 1L, "the per-cluster hotspot dial never fired")
    assert(corpusReseals === 0L)
    // probed serve exact over the final state
    val served = new ParquetCollectionStore(dir, "d", denseDesc,
      ivfNprobe = 2)
    val brute = new ParquetCollectionStore(dir, "d", denseDesc)
    val spec = SearchSpec("vector", Array(0.2, 0.95), "cosine", 6)
    assert(served.searchPoints("d", spec, withPayload = false, Nil)
      .map(p => (p._1.id, p._2)) ===
      brute.searchPoints("d", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
  }

  test("ivf: the bulk arm reseals (refit + reassignment) instead of trickling") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val dir = java.nio.file.Files.createTempDirectory("graft-bulk-i").toString
    val df = denseDf(0 until 20)
    ParquetCollectionStore.write(df, dir, numFiles = 1, withLog = true)
    val idx = graft.ops.Ann.buildIvf(
      df.withColumn("vector", col("vector").cast(ArrayType(DoubleType))),
      "id", "vector", nlist = 2, maxIter = 0)
    ParquetCollectionStore.writeIvfSidecar(
      idx.clustered.select("id", "payload", "vector", "cluster"),
      idx.centroids, dir, field = "vector")
    idx.clustered.unpersist(): Unit
    val st = new ParquetCollectionStore(dir, "d", denseDesc, ivfNprobe = 2)
    val (reseals, _) = reload(st, 200, 90, 30, _.ivfIncInserts.get())
    assert(reseals >= 1L)
    // nprobe = nlist: the probed serve is exact over the final state
    val served = new ParquetCollectionStore(dir, "d", denseDesc,
      ivfNprobe = 2)
    val brute = new ParquetCollectionStore(dir, "d", denseDesc)
    val spec = SearchSpec("vector", Array(0.2, 0.95), "cosine", 6)
    assert(served.searchPoints("d", spec, withPayload = false, Nil)
      .map(p => (p._1.id, p._2)) ===
      brute.searchPoints("d", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
  }

  test("payload index: the bulk arm reseals the key's value partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bulk-p").toString
    val df = denseDf(0 until 20)
    ParquetCollectionStore.write(df, dir, numFiles = 1, withLog = true)
    ParquetCollectionStore.writePayloadSidecar(df, dir, key = "g",
      kind = "int")
    val st = new ParquetCollectionStore(dir, "d", denseDesc)
    val (reseals, _) = reload(st, 400, 90, 30, _.pidxIncInserts.get())
    assert(reseals >= 1L)
    val served = new ParquetCollectionStore(dir, "d", denseDesc)
    val brute = new ParquetCollectionStore(dir, "d", denseDesc)
    val pf = PayloadFilter(Seq(PayloadCondition("g", "eq", "1")), Nil, None)
    val spec = SearchSpec("vector", Array(0.5, 0.8), "cosine", 7)
    assert(served.searchPointsFiltered("d", spec, withPayload = false,
      Nil, pf).map(p => (p._1.id, p._2)) ===
      brute.searchPointsFiltered("d", spec, withPayload = false, Nil, pf)
        .map(p => (p._1.id, p._2)))
  }

  test("the dial disables the arm: frac <= 0 trickles every page") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bulk-0").toString
    val df = denseDf(0 until 20)
    ParquetCollectionStore.write(df, dir, numFiles = 1, withLog = true)
    ParquetCollectionStore.writeHnswSidecar(df, dir, field = "vector",
      m = 4, efConstruction = 16, numSegments = 2)
    sys.props("graft.bulkMaintainFraction") = "0"
    try {
      val st = new ParquetCollectionStore(dir, "d", denseDesc,
        hnswEf = 1024)
      val (reseals, incs) = reload(st, 700, 90, 30,
        _.hnswIncInserts.get())
      assert(reseals === 0L)
      assert(incs === 90L) // every point absorbed incrementally
    } finally sys.props.remove("graft.bulkMaintainFraction"): Unit
  }
}
