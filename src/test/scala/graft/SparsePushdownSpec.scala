package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.collections._
import graft.sources._

/** Pushed SPARSE top-k through the connector: the scan ships the
  * (indices, values) query to the store, every backend scores with the
  * same sorted-merge fold as the `v_sparse_dot` kernel, and the parquet
  * store's postings sidecar serves it bucket-pruned.
  */
class SparsePushdownSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val desc = CollectionDescriptor("sp", Seq(SparseField("kw")))

  // deterministic sparse corpus: point i carries dims {i%5, i%5+5, 17}
  // with values derived from i — overlaps with the query vary per point
  private def mkPoints(n: Int): IndexedSeq[Point] =
    (0 until n).map { i =>
      val dims = Array(i % 5, (i % 5) + 5, 17)
      val vals = Array(1.0f + i * 0.25f, 0.5f, 0.125f * (i % 4))
      Point(i.toString, Some(s"""{"i":$i}"""),
        sparse = Map("kw" -> ((dims, vals))))
    }

  private val qIdx = Array(2, 7, 17)
  private val qVal = Array(2.0, 1.5, 4.0)

  private def expected(n: Int, k: Int): Seq[(String, Double)] =
    mkPoints(n).flatMap { p =>
      val (di, dv) = p.sparse("kw")
      SearchSpec.scoreSparse(di, dv, qIdx, qVal).map(s => (p.id, s))
    }.sortWith { case ((ia, sa), (ib, sb)) =>
      if (sa != sb) sa > sb else ia < ib // id tiebreak, string order
    }.take(k).toSeq

  private def searchVia(storeName: String, k: Int = 5) =
    spark.read.format("graft.sources.CollectionDataSource")
      .option("store", storeName).option("collection", "sp")
      .option("search.field", "kw")
      .option("search.sparseIndices", qIdx.mkString(","))
      .option("search.vector", qVal.mkString(","))
      .option("search.k", k.toString)
      .load().select("id", "_score").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq

  test("connector sparse search scores with the kernel fold; plan shows the sparse spec") {
    CollectionStores.register("sp_mem",
      InMemoryCollectionStore.single("sp", desc, mkPoints(20)))
    assert(searchVia("sp_mem") === expected(20, 5))
    val df = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "sp_mem").option("collection", "sp")
      .option("search.field", "kw")
      .option("search.sparseIndices", qIdx.mkString(","))
      .option("search.vector", qVal.mkString(","))
      .option("search.k", "5").load()
    assert(df.queryExecution.executedPlan.toString.contains("sparse_dot"))
    // no shared dim -> no result row (inverted-index semantics)
    CollectionStores.register("sp_mem2", InMemoryCollectionStore.single(
      "sp", desc, IndexedSeq(Point("99", None,
        sparse = Map("kw" -> ((Array(40), Array(1.0f))))))))
    assert(searchVia("sp_mem2").isEmpty)
  }

  test("sparse search over the wire: the {indices, values} query object round-trips") {
    CollectionStores.register("sp_rest_inner",
      InMemoryCollectionStore.single("sp", desc, mkPoints(20)))
    val srv = new CollectionHttpServer("sp_rest_inner").start()
    try {
      CollectionStores.register("sp_rest",
        new RestCollectionStore(srv.baseUrl))
      assert(searchVia("sp_rest") === expected(20, 5))
    } finally srv.stop()
  }

  test("parquet store: sparse columns decode; postings sidecar serves bucket-pruned") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-sparse").toString
    val rows = mkPoints(20).map { p =>
      val (di, dv) = p.sparse("kw")
      (p.id, p.payload.orNull, di.toSeq, dv.toSeq)
    }
    val df = rows.toDF("id", "payload", "kw_indices", "kw_values")
    ParquetCollectionStore.write(df, dir, numFiles = 2)
    // brute: base-heap sparse scoring over decoded sparse columns
    val brute = new ParquetCollectionStore(dir, "sp", desc)
    CollectionStores.register("sp_pq_brute", brute)
    assert(searchVia("sp_pq_brute") === expected(20, 5))
    // sidecar: bucket-pruned postings serve, same scores
    ParquetCollectionStore.writeSparseSidecar(df, dir, "kw", nBuckets = 8)
    val served = new ParquetCollectionStore(dir, "sp", desc)
    CollectionStores.register("sp_pq_sparse", served)
    assert(searchVia("sp_pq_sparse") === expected(20, 5))
    // query dims {2,7,17} -> buckets {2%8=2, 7, 17%8=1}: three bucket
    // partitions read (one co-located file each), primaries opened only
    // for the winners' fetch
    assert(served.sparseFilesOpened.get() === 3L)
    assert(served.filesOpened.get() <= 2L)
    // a filtered sparse search falls back to the exact filtered pass
    val pf = PayloadFilter(Seq(PayloadCondition("i", "gte", "10")), Nil, None)
    val got = served.searchPointsFiltered("sp",
      SearchSpec("kw", qVal, "dot", 5, sparseIndices = Some(qIdx)),
      withPayload = false, vectorFields = Nil, pfilter = pf)
    val want = expected(20, 20).filter(_._1.toInt >= 10).take(5)
    assert(got.map(p => (p._1.id, p._2)) === want)
  }

  test("incremental sparse maintenance: churn absorbs into the dim buckets, serves with an empty tail") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-spinc").toString
    val rows = mkPoints(20).map { p =>
      val (di, dv) = p.sparse("kw")
      (p.id, p.payload.orNull, di.toSeq, dv.toSeq)
    }
    val df = rows.toDF("id", "payload", "kw_indices", "kw_values")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeSparseSidecar(df, dir, "kw", nBuckets = 8)
    val spec = SearchSpec("kw", qVal, "dot", 10, sparseIndices = Some(qIdx))
    // the row-path oracle over the CURRENT primaries, whatever the
    // postings do
    def want(): Seq[(String, Double)] = {
      val st = new ParquetCollectionStore(dir, "sp", desc)
      st.queryPoints("sp", 0L, st.pointCount("sp"), withPayload = false,
        Seq("kw"), None)
        .flatMap(p => p.sparse.get("kw").flatMap { case (di, dv) =>
          SearchSpec.scoreSparse(di, dv, qIdx, qVal).map(s => (p.id, s))
        }).toSeq
        .sortWith { case ((ia, sa), (ib, sb)) =>
          if (sa != sb) sa > sb else ia < ib
        }.take(10)
    }
    def got(st: ParquetCollectionStore): Seq[(String, Double)] =
      st.searchPoints("sp", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2))
    val store = new ParquetCollectionStore(dir, "sp", desc)
    // INSERTS absorb: new postings land in their dim buckets, the tail
    // stays empty, the page is exact
    val adds = (0 until 8).map(i => Point(s"5$i", None,
      sparse = Map("kw" -> ((Array(2, 17), Array(10f + i, 5f)))))).toIndexedSeq
    val m1 = store.appended("sp", adds)
    assert(store.sparseIncInserts.get() === 8L)
    assert(new java.io.File(s"$dir/_sparse/inserted.txt").isFile)
    assert(got(m1) === want())
    assert(m1.sparseTailRescored.get() === 0L)
    assert(got(m1).count(_._1.startsWith("5")) >= 8)
    // an UPDATE moves dims across buckets: the old postings consolidate
    // out of their buckets, the new ones append
    val m2 = m1.appended("sp", IndexedSeq(Point("3", None,
      sparse = Map("kw" -> ((Array(17), Array(50f)))))))
    assert(got(m2) === want())
    assert(m2.sparseTailRescored.get() === 0L)
    // a DELETE tombstones id -> dims; the serve drops flagged ids
    val winner = got(m2).head._1
    val m3 = m2.removed("sp", Set(winner))
    assert(new java.io.File(s"$dir/_sparse/dead.txt").isFile)
    assert(!got(m3).map(_._1).contains(winner))
    assert(got(m3) === want())
    assert(m3.sparseTailRescored.get() === 0L)
    // RESURRECTION consolidates the flagged dims' buckets and clears
    val m4 = m3.appended("sp", IndexedSeq(Point(winner, None,
      sparse = Map("kw" -> ((Array(7), Array(99f)))))))
    assert(!new java.io.File(s"$dir/_sparse/dead.txt").isFile)
    assert(got(m4) === want())
    assert(got(m4).head._1 === winner)
    // MASS delete past the flag cap consolidates instead
    sys.props("graft.test.deadFlagMax") = "4"
    try {
      val m5 = m4.removed("sp", (0 until 10).map(_.toString).toSet)
      assert(!new java.io.File(s"$dir/_sparse/dead.txt").isFile)
      assert(got(m5) === want())
    } finally sys.props.remove("graft.test.deadFlagMax"): Unit
    // OPTIMIZE reseals and resets
    ParquetCollectionStore.optimize(spark, dir)
    assert(!new java.io.File(s"$dir/_sparse/inserted.txt").isFile)
    assert(got(new ParquetCollectionStore(dir, "sp", desc)) === want())
  }

  test("sparse sidecar freshness: COW mutations overlay the postings until rebuild") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-spfresh").toString
    val rows = mkPoints(20).map { p =>
      val (di, dv) = p.sparse("kw")
      (p.id, p.payload.orNull, di.toSeq, dv.toSeq)
    }
    val df = rows.toDF("id", "payload", "kw_indices", "kw_values")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeSparseSidecar(df, dir, "kw", nBuckets = 8)
    val spec = SearchSpec("kw", qVal, "dot", 5, sparseIndices = Some(qIdx))
    val store = new ParquetCollectionStore(dir, "sp", desc)
    val baseline = store.searchPoints("sp", spec,
      withPayload = false, vectorFields = Nil)
    val topId = baseline.head._1.id
    // a dominant new point + the old winner deleted, NO rebuild: the
    // postings-served page must reflect both from the log tail
    val mutated = store.appended("sp", IndexedSeq(Point("98", None,
        sparse = Map("kw" -> ((Array(2, 7), Array(100f, 100f)))))))
      .removed("sp", Set(topId))
    val after = mutated.searchPoints("sp", spec,
      withPayload = false, vectorFields = Nil)
    assert(after.head._1.id === "98")
    assert(after.map(_._1.id) ===
      "98" +: baseline.map(_._1.id).filterNot(_ == topId).take(4))
    assert(mutated.sparseFilesOpened.get() > 0L)   // the postings served
  }
}
