package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.collections._
import graft.sources._

/** Indexed MULTI-VECTOR (MaxSim) search: candidates from the
  * pooled-key per-segment graphs, exact MaxSim rescore of the margin —
  * the backend's multivector HNSW + MaxSim comparator
  * (/root/reference/tests/e2e.rs:142-147) at the store seam, replacing
  * the engine-side brute MaxSim scan late-interaction corpora can't
  * afford.
  */
class MultiIndexedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 8
  private val desc = CollectionDescriptor("m",
    Seq(MultiField("mv", dim)), named = false)

  /** point i: 2 vectors — a seeded gaussian and its reverse. */
  private def vecs(i: Int): Array[Array[Float]] = {
    val r = new java.util.Random(i * 104729L)
    val a = Array.fill(dim)(r.nextGaussian().toFloat)
    Array(a, a.reverse)
  }

  private def mkDir(n: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-multiidx").toString
    val df = (0 until n)
      .map(i => (f"$i%04d", s"""{"g":${i % 3}}""", vecs(i).map(_.toSeq).toSeq))
      .toDF("id", "payload", "mv")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeMultiHnswSidecar(df, dir, field = "mv",
      multiColumn = "mv", m = 8, efConstruction = 32, numSegments = 2)
    dir
  }

  private def mspec(q: Array[Array[Double]], k: Int = 5) = {
    val pooled = SearchSpec.meanPool(q.map(_.map(_.toFloat))).get
    SearchSpec("mv", pooled, "dot", k, multiQuery = Some(q))
  }

  private def page(st: ParquetCollectionStore, q: Array[Array[Double]],
                   k: Int = 5) =
    st.searchPoints("m", mspec(q, k), withPayload = false, Nil)
      .map(p => (p._1.id, p._2))

  test("pooled-candidate walk + exact MaxSim rescore equals the brute MaxSim path") {
    val dir = mkDir(200)
    val q = vecs(9001).map(_.map(_.toDouble))
    val served = new ParquetCollectionStore(dir, "m", desc, hnswEf = 4096,
      hnswCandidateK = 200) // margin >= corpus: exact by construction
    val brute = new ParquetCollectionStore(dir, "m", desc)
    assert(page(served, q) === page(brute, q))
    // the serve was INDEX-shaped: graphs walked, primaries never open
    // (the rescore fetch reads the segment partitions)
    assert(served.hnswSegmentsLoaded.get() === 2L)
    assert(served.filesOpened.get() === 0L)
    // a PRUNED margin keeps ANN semantics: a full page whose scores are
    // TRUE MaxSim values (candidates limited, rescore exact) — every
    // returned (id, score) matches the brute score for that id
    val pruned = new ParquetCollectionStore(dir, "m", desc, hnswEf = 4096,
      hnswCandidateK = 32)
    val prunedPage = page(pruned, q)
    assert(prunedPage.size === 5)
    val bruteAll = page(brute, q, k = 200).toMap
    prunedPage.foreach { case (id, s) => assert(bruteAll(id) === s) }
    // and the page head survives pruning (the margin covers the top)
    assert(prunedPage.head === page(brute, q).head)
  }

  test("maintenance absorbs churn into the pooled graphs (insert, delete, update)") {
    val dir = mkDir(80)
    val q = vecs(7777).map(_.map(_.toDouble))
    val st = new ParquetCollectionStore(dir, "m", desc, hnswEf = 4096,
      hnswCandidateK = 100)
    // INSERT a guaranteed winner: the query's own set SCALED UP (dot
    // MaxSim is norm-sensitive — a 3x copy tops every cross pair)
    val m1 = st.appended("m", IndexedSeq(Point("winner", Some("""{"g":1}"""),
      multi = Map("mv" -> q.map(_.map(x => (x * 3).toFloat))))))
    assert(st.hnswIncInserts.get() === 1L) // pooled insert absorbed
    val got1 = page(m1, q)
    assert(got1.head._1 === "winner")
    assert(m1.hnswTailRescored.get() === 0L) // empty overlay tail
    assert(got1 === page(new ParquetCollectionStore(dir, "m", desc), q))
    // DELETE it: tombstoned out of the beam
    val m2 = m1.removed("m", Set("winner"))
    val got2 = page(m2, q)
    assert(!got2.exists(_._1 == "winner"))
    assert(got2 === page(new ParquetCollectionStore(dir, "m", desc), q))
    // UPDATE an existing id into the winner slot: its segment
    // consolidates, the fresh pooled key re-inserts
    val m3 = m2.appended("m", IndexedSeq(Point("0007", Some("""{"g":0}"""),
      multi = Map("mv" -> q.map(_.map(x => (x * 2.5).toFloat))))))
    val got3 = page(m3, q)
    assert(got3.head._1 === "0007")
    assert(got3 === page(new ParquetCollectionStore(dir, "m", desc), q))
    // the optimizer reseals the POOLED graph from the primaries (the
    // multi kind dispatches to the multi builder, not the dense one)
    ParquetCollectionStore.optimize(spark, dir)
    val opt = new ParquetCollectionStore(dir, "m", desc, hnswEf = 4096,
      hnswCandidateK = 100)
    assert(page(opt, q) === got3)
    assert(opt.filesOpened.get() === 0L)
  }

  test("filtered pooled serve: the cost-based arms, both exact vs the brute filtered MaxSim path") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-multiidxf").toString
    // 2,600 points: g in {0,1} matches ~1,733 — past the micro-arm dial
    // (max(4*window, widenedEf, 1024)) so the accepting WALK runs;
    // g = 2 matches ~867 — under it, the exact micro path
    val df = (0 until 2600)
      .map(i => (f"$i%04d", s"""{"g":${i % 3}}""", vecs(i).map(_.toSeq).toSeq))
      .toDF("id", "payload", "mv")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeMultiHnswSidecar(df, dir, field = "mv",
      multiColumn = "mv", m = 8, efConstruction = 32, numSegments = 2)
    ParquetCollectionStore.writePayloadSidecar(
      df.select(col("id"), col("payload")), dir, key = "g", kind = "int")
    val q = vecs(31337).map(_.map(_.toDouble))
    // candidateK past the corpus: every matched node is a candidate, so
    // the walk arm is exact too (the gate-scale contract)
    val st = new ParquetCollectionStore(dir, "m", desc, hnswEf = 600,
      hnswCandidateK = 4096)
    val brute = new ParquetCollectionStore(dir, "m", desc)
    def fpage(s0: ParquetCollectionStore, pf: PayloadFilter) =
      s0.searchPointsFiltered("m", mspec(q, 10), withPayload = false, Nil, pf)
        .map(p => (p._1.id, p._2))
    val wide = PayloadFilter(
      Seq(PayloadCondition("g", "match_any", "0|1")), Nil, None)
    assert(fpage(st, wide) === fpage(brute, wide))
    assert(st.hnswFilteredWalkServes.get() === 1L)
    assert(st.hnswFilteredExactServes.get() === 0L)
    // no codes tier in this fixture: the walk rode the full-precision
    // pooled keys (both segments loaded)
    assert(st.hnswSegmentsLoaded.get() === 2L)
    val narrow = PayloadFilter(
      Seq(PayloadCondition("g", "match_any", "2")), Nil, None)
    assert(fpage(st, narrow) === fpage(brute, narrow))
    assert(st.hnswFilteredExactServes.get() === 1L)
    assert(st.hnswFilteredWalkServes.get() === 1L)
    // the primaries never opened for either arm
    assert(st.filesOpened.get() === 0L)
  }

  test("the pooled codes tier: int8 walk + exact MaxSim rescore, resident bytes shrink >4x") {
    import spark.implicits._
    // dim 64 so the bytes claim is the dense tier's shape: 8 B/dim
    // pooled doubles vs 1 B/dim codes + 12 B/vector = ~6.7x
    val bigDim = 64
    def bvecs(i: Int): Array[Array[Float]] = {
      val r = new java.util.Random(i * 15485863L)
      val a = Array.fill(bigDim)(r.nextGaussian().toFloat)
      Array(a, a.reverse)
    }
    val bdesc = CollectionDescriptor("m",
      Seq(MultiField("mv", bigDim)), named = false)
    val dir = java.nio.file.Files.createTempDirectory("graft-multiidxq").toString
    val df = (0 until 300)
      .map(i => (f"$i%04d", s"""{"g":${i % 3}}""", bvecs(i).map(_.toSeq).toSeq))
      .toDF("id", "payload", "mv")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeMultiHnswSidecar(df, dir, field = "mv",
      multiColumn = "mv", m = 8, efConstruction = 32, numSegments = 2)
    ParquetCollectionStore.writeMultiHnswQuantizedSidecar(df, dir,
      multiColumn = "mv")
    val q = bvecs(9001).map(_.map(_.toDouble))
    def bpage(st: ParquetCollectionStore) = {
      val pooled = SearchSpec.meanPool(q.map(_.map(_.toFloat))).get
      st.searchPoints("m",
          SearchSpec("mv", pooled, "dot", 5, multiQuery = Some(q)),
          withPayload = false, Nil)
        .map(p => (p._1.id, p._2))
    }
    val quant = new ParquetCollectionStore(dir, "m", bdesc, hnswEf = 4096,
      hnswCandidateK = 300) // margin >= corpus: exact by construction
    val full = new ParquetCollectionStore(dir, "m", bdesc, hnswEf = 4096)
    val brute = new ParquetCollectionStore(dir, "m", bdesc)
    assert(bpage(quant) === bpage(brute))
    bpage(full) // load the full-precision tier for the bytes comparison
    // served from the QUANTIZED pooled tier: codes cache resident, the
    // full-precision pooled cache never loads, primaries never open
    assert(quant.hnswQuantServes.get() === 1L)
    assert(quant.hnswQuantSegmentsLoaded.get() === 2L)
    assert(quant.hnswSegmentsLoaded.get() === 0L)
    assert(quant.filesOpened.get() === 0L)
    val fullBytes = full.hnswResidentBytes
    val quantBytes = quant.hnswResidentBytes
    assert(fullBytes > 0L && quantBytes > 0L)
    assert(quantBytes * 4 < fullBytes,
      s"quant=$quantBytes full=$fullBytes — the pooled tier is not smaller")
  }

  test("filtered + codes: the accepting walk rides the int8 pooled keys") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-multiidxfq").toString
    val df = (0 until 2600)
      .map(i => (f"$i%04d", s"""{"g":${i % 3}}""", vecs(i).map(_.toSeq).toSeq))
      .toDF("id", "payload", "mv")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeMultiHnswSidecar(df, dir, field = "mv",
      multiColumn = "mv", m = 8, efConstruction = 32, numSegments = 2)
    ParquetCollectionStore.writeMultiHnswQuantizedSidecar(df, dir,
      multiColumn = "mv")
    ParquetCollectionStore.writePayloadSidecar(
      df.select(col("id"), col("payload")), dir, key = "g", kind = "int")
    val q = vecs(271828).map(_.map(_.toDouble))
    val st = new ParquetCollectionStore(dir, "m", desc, hnswEf = 600,
      hnswCandidateK = 4096)
    val brute = new ParquetCollectionStore(dir, "m", desc)
    val wide = PayloadFilter(
      Seq(PayloadCondition("g", "match_any", "0|1")), Nil, None)
    def fpage(s0: ParquetCollectionStore) =
      s0.searchPointsFiltered("m", mspec(q, 10), withPayload = false, Nil,
        wide).map(p => (p._1.id, p._2))
    assert(fpage(st) === fpage(brute))
    // the walk arm ran QUANTIZED: full pooled cache never loaded
    assert(st.hnswFilteredWalkServes.get() === 1L)
    assert(st.hnswQuantServes.get() === 1L)
    assert(st.hnswSegmentsLoaded.get() === 0L)
    assert(st.filesOpened.get() === 0L)
  }

  test("maintenance keeps the pooled codes tier in lockstep with the graphs") {
    val dir = mkDir(120)
    import spark.implicits._
    // lay the codes tier over the sealed fixture (mkDir builds the
    // graph; quantize the same frame)
    val df = (0 until 120)
      .map(i => (f"$i%04d", s"""{"g":${i % 3}}""", vecs(i).map(_.toSeq).toSeq))
      .toDF("id", "payload", "mv")
    ParquetCollectionStore.writeMultiHnswQuantizedSidecar(df, dir,
      multiColumn = "mv")
    val q = vecs(8888).map(_.map(_.toDouble))
    val st = new ParquetCollectionStore(dir, "m", desc, hnswEf = 4096,
      hnswCandidateK = 200)
    // INSERT a guaranteed winner: the absorbed codes row must carry it
    // into the int8 walk (no overlay tail, no brute leg)
    val m1 = st.appended("m", IndexedSeq(Point("winner", Some("""{"g":1}"""),
      multi = Map("mv" -> q.map(_.map(x => (x * 3).toFloat))))))
    val got1 = page(m1, q)
    assert(got1.head._1 === "winner")
    assert(m1.hnswTailRescored.get() === 0L) // empty overlay tail
    assert(m1.hnswQuantServes.get() === 1L)
    assert(got1 === page(new ParquetCollectionStore(dir, "m", desc), q))
    // DELETE: the tombstone bars it from the code walk's beam
    val m2 = m1.removed("m", Set("winner"))
    val got2 = page(m2, q)
    assert(!got2.exists(_._1 == "winner"))
    assert(got2 === page(new ParquetCollectionStore(dir, "m", desc), q))
    // UPDATE an existing id into the winner slot: its segment (points,
    // edges, codes) consolidates; the fresh pooled key re-inserts
    val m3 = m2.appended("m", IndexedSeq(Point("0007", Some("""{"g":0}"""),
      multi = Map("mv" -> q.map(_.map(x => (x * 2.5).toFloat))))))
    val got3 = page(m3, q)
    assert(got3.head._1 === "0007")
    assert(got3 === page(new ParquetCollectionStore(dir, "m", desc), q))
    // the optimizer reseals pooled graph AND codes; the rebuilt tier
    // serves with no surviving inc- files
    ParquetCollectionStore.optimize(spark, dir)
    val opt = new ParquetCollectionStore(dir, "m", desc, hnswEf = 4096,
      hnswCandidateK = 200)
    assert(page(opt, q) === got3)
    assert(opt.hnswQuantServes.get() === 1L)
    assert(opt.filesOpened.get() === 0L)
    val incCodes = (0 until 2).map { seg =>
      Option(new java.io.File(s"$dir/_hnsw/codes/seg=$seg").listFiles())
        .getOrElse(Array.empty).count(_.getName.startsWith("inc-"))
    }.sum
    assert(incCodes === 0)
  }

  test("the connector pushes the multi query; empty-set points never rank") {
    import spark.implicits._
    val rows = (0 until 30)
      .map(i => (f"$i%04d", s"""{"g":0}""", vecs(i).map(_.toSeq).toSeq)) :+
      (("empty", """{"g":0}""", Seq.empty[Seq[Float]]))
    val df = rows.toDF("id", "payload", "mv")
    CollectionStores.register("multi_push_mem",
      InMemoryCollectionStore.fromRows(df, "m", desc))
    val q = vecs(4242).map(_.map(_.toDouble))
    val mv = q.map(_.map(java.lang.Double.toString).mkString(","))
      .mkString(";")
    val got = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "multi_push_mem").option("collection", "m")
      .option("search.field", "mv")
      .option("search.multiVector", mv)
      .option("search.k", "5")
      .load().select("id", "_score").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    // oracle: the engine-side MaxSim kernel over the same rows (the
    // brute store path scores an EMPTY set 0.0, exactly the kernel)
    import graft.functions.v_maxsim
    import org.apache.spark.sql.functions.{col, typedLit}
    val expected = df
      .withColumn("s", v_maxsim(col("mv"),
        typedLit(q.map(_.toSeq).toSeq)))
      .orderBy(col("s").desc, col("id").asc).limit(5)
      .collect().map(r => (r.getString(0), r.getAs[Double]("s"))).toSeq
    assert(got === expected)
    // the plan names the pushed MaxSim query
    val plan = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "multi_push_mem").option("collection", "m")
      .option("search.field", "mv")
      .option("search.multiVector", mv)
      .option("search.k", "5").load()
      .queryExecution.executedPlan.toString
    assert(plan.contains("maxsim_dot"), plan)
  }

  test("multi queries round-trip BOTH wires (the MaxSim rows ship, not just the pooled key)") {
    // a corpus where pooled-dense scoring DIVERGES from MaxSim: point
    // "anti" = [w, -w] pools to ~zero (a dropped row set would bury it)
    // but MaxSim scores it highest — a wire that silently dense-scored
    // the pooled key would fail this, not pass by luck
    val w = Array.fill(dim)(2.0f)
    val pts = (0 until 20).map(i => Point(f"$i%04d", Some("""{"g":0}"""),
      multi = Map("mv" -> vecs(i)))) :+
      Point("anti", Some("""{"g":1}"""),
        multi = Map("mv" -> Array(w, w.map(x => -x))))
    val mem = InMemoryCollectionStore.single("m", desc, pts.toIndexedSeq
      .sortBy(_.id))
    CollectionStores.register("multi_wire_mem", mem)
    val q = Array(Array.fill(dim)(1.0)) // dot(w, q) = 2*dim, tops MaxSim
    val spec = mspec(q, k = 3)
    val expected = mem.searchPoints("m", spec, withPayload = false, Nil)
      .map(p => (p._1.id, p._2))
    assert(expected.head._1 === "anti") // the divergence is real
    val rest = new CollectionHttpServer("multi_wire_mem").start()
    try {
      val rc = new RestCollectionStore(rest.baseUrl)
      assert(rc.searchPoints("m", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)) === expected)
    } finally rest.stop()
    val grpc = new CollectionGrpcServer("multi_wire_mem").start()
    try {
      val gc = new GrpcCollectionStore(grpc.host, grpc.port)
      assert(gc.searchPoints("m", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)) === expected)
    } finally grpc.stop()
  }
}
