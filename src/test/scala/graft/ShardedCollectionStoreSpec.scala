package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.collections._
import graft.sources._

/** Scatter-gather serving: the sharded wrapper must be OBSERVATIONALLY
  * EQUAL to the unsharded store on every read (top-k merge, counts,
  * facets, scrolls), route writes per-id by the rendezvous hash
  * (bit-identical to the DataFrame assignment), and expose an
  * append-only global CDC log over the members' logs.
  */
class ShardedCollectionStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val desc = CollectionDescriptor("c",
    Seq(DenseField("vector", 2)), named = false)

  private def mkPoints(n: Int): IndexedSeq[Point] =
    (0 until n).map { i =>
      Point(f"$i%03d",
        Some(s"""{"g":${i % 4},"v":"t${i % 7}"}"""),
        dense = Map("vector" ->
          Array(math.cos(i * 0.37).toFloat, math.sin(i * 0.37).toFloat)))
    }

  private def sharded(pts: IndexedSeq[Point], n: Int): ShardedCollectionStore =
    new ShardedCollectionStore((0 until n).map { i =>
      InMemoryCollectionStore.single("c", desc, pts.filter(p =>
        ShardedCollectionStore.assignShard(p.id, n) == i))
    })

  test("assignShard is bit-identical to Pipeline.rendezvousAssign") {
    import spark.implicits._
    val ids = (0 until 200).map(i => s"id_$i") ++ Seq("", "0", "ß", "日本")
    val df = ids.toDF("id")
    for (n <- Seq(1, 3, 5, 8)) {
      val fromDf = graft.ops.Pipeline.rendezvousAssign(df, "id", n)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      ids.foreach { id =>
        assert(ShardedCollectionStore.assignShard(id, n) === fromDf(id),
          s"id=$id n=$n")
      }
    }
  }

  test("shard-page merge == unsharded top-k (metrics, offset, threshold, filter)") {
    val pts = mkPoints(120)
    val flat = InMemoryCollectionStore.single("c", desc, pts)
    val sh = sharded(pts, 4)
    val queries = Seq(Array(1.0, 0.0), Array(-0.3, 0.8), Array(0.6, 0.6))
    for {
      q <- queries
      metric <- Seq("cosine", "dot", "euclid")
      offset <- Seq(0, 3)
    } {
      val spec = SearchSpec("vector", q, metric, 7, offset = offset)
      val a = flat.searchPoints("c", spec, withPayload = false, Nil)
      val b = sh.searchPoints("c", spec, withPayload = false, Nil)
      assert(b.map(p => (p._1.id, p._2)) === a.map(p => (p._1.id, p._2)),
        s"metric=$metric offset=$offset q=${q.mkString(",")}")
    }
    // threshold + payload filter compose identically
    val pf = PayloadFilter(Seq(PayloadCondition("g", "eq", "2")), Nil, None)
    val spec = SearchSpec("vector", Array(1.0, 0.0), "cosine", 5,
      scoreThreshold = Some(-0.5))
    val a = flat.searchPointsFiltered("c", spec, withPayload = true, Nil, pf)
    val b = sh.searchPointsFiltered("c", spec, withPayload = true, Nil, pf)
    assert(b.map(p => (p._1.id, p._1.payload, p._2)) ===
      a.map(p => (p._1.id, p._1.payload, p._2)))
  }

  test("counts sum, facets merge exactly, scrolls window per shard") {
    val pts = mkPoints(90)
    val flat = InMemoryCollectionStore.single("c", desc, pts)
    val sh = sharded(pts, 3)
    assert(sh.pointCount("c") === flat.pointCount("c"))
    val pf = PayloadFilter(Seq(PayloadCondition("g", "gte", "1")), Nil, None)
    assert(sh.countMatchingFiltered("c", pfilter = pf) ===
      flat.countMatchingFiltered("c", pfilter = pf))
    assert(sh.facetCounts("c", "v", 4) === flat.facetCounts("c", "v", 4))
    // facet EXACTNESS under the cut: full merge, not per-shard top-N
    assert(sh.facetCounts("c", "v", 100).map(_._2).sum === 90L)
    // FILTERED facets (qdrant's facet-with-filter form) thread the same
    // threshold merge: page calls AND targeted passes carry the filter
    val ffpf = PayloadFilter(Seq(PayloadCondition("g", "gte", "2")), Nil, None)
    assert(sh.facetCounts("c", "v", 4, ffpf) ===
      flat.facetCounts("c", "v", 4, ffpf))
    assert(sh.facetCountsFor("c", "v", Set("t0", "t3"), ffpf) ===
      flat.facetCountsFor("c", "v", Set("t0", "t3"), ffpf))
    // positional windows cover the corpus exactly once, id-filter routed
    val n = sh.pointCount("c")
    val windows = Seq((0L, 20L), (20L, 55L), (55L, n))
    val paged = windows.flatMap { case (a, b) =>
      sh.queryPoints("c", a, b, withPayload = false, Nil, None).map(_.id)
    }
    assert(paged.size === 90)
    assert(paged.toSet === pts.map(_.id).toSet)
    // id-set fetch touches ONLY the owning shards
    val sh2 = sharded(pts, 3)
    val someIds = Set("001", "002", "017")
    val owners = someIds.map(ShardedCollectionStore.assignShard(_, 3))
    val got = sh2.queryPoints("c", 0L, n, withPayload = false, Nil, None,
      idFilter = Some(someIds)).map(_.id).toSet
    assert(got === someIds)
    sh2.shards.zipWithIndex.foreach { case (s, i) =>
      val touched = s.asInstanceOf[InMemoryCollectionStore].pointsTouched.get()
      if (owners(i)) assert(touched > 0L, s"owner shard $i untouched")
      else assert(touched === 0L, s"non-owner shard $i touched $touched")
    }
  }

  test("per-shard scan volume is the shard's slice, never the corpus") {
    val pts = mkPoints(120)
    val sh = sharded(pts, 4)
    sh.queryPoints("c", 0L, 120L, withPayload = false, Nil, None)
      .foreach(_ => ())
    val touched = sh.shards.map(
      _.asInstanceOf[InMemoryCollectionStore].pointsTouched.get())
    assert(touched.sum === 120L, s"total touched $touched")
    touched.zip(sh.shards.map(_.pointCount("c"))).foreach { case (t, own) =>
      assert(t === own, "a shard scanned beyond its own slice")
    }
  }

  test("writes route per-id; global CDC log is append-only and replays per-id in order") {
    val sh = new ShardedCollectionStore((0 until 3).map { _ =>
      InMemoryCollectionStore.single("c", desc, IndexedSeq.empty)
    })
    val pts = mkPoints(30)
    sh.upsertPoints("c", pts)
    assert(sh.pointCount("c") === 30L)
    // placement: every point is on exactly its rendezvous shard
    sh.shards.zipWithIndex.foreach { case (s, i) =>
      val ids = s.queryPoints("c", 0L, s.pointCount("c"),
        withPayload = false, Nil, None).map(_.id).toSet
      assert(ids.forall(ShardedCollectionStore.assignShard(_, 3) == i))
    }
    val sizeAfterIngest = sh.logSize("c")
    assert(sizeAfterIngest === 30L)
    // a second batch: re-upsert one id, delete another — positions of
    // the first 30 entries must NOT move (append-only journal)
    val firstBatch = sh.logEntries("c", 0L, 30L)
      .map(e => (e.seq, e.op, e.point.id)).toIndexedSeq
    sh.upsertPoints("c", IndexedSeq(
      pts(5).copy(payload = Some("""{"rev":2}"""))))
    sh.deletePoints("c", Set("011"))
    assert(sh.pointCount("c") === 29L)
    assert(sh.logEntries("c", 0L, 30L)
      .map(e => (e.seq, e.op, e.point.id)).toIndexedSeq === firstBatch)
    val tail = sh.logEntries("c", 30L, sh.logSize("c")).toIndexedSeq
    assert(tail.map(e => (e.op, e.point.id)) ===
      IndexedSeq((LogOps.Upsert, "005"), (LogOps.Delete, "011")))
    // per-id causal order: id 005's upserts replay ingest -> revision
    val id5 = sh.logEntries("c", 0L, sh.logSize("c"))
      .filter(_.point.id == "005").toIndexedSeq
    assert(id5.map(_.op) === IndexedSeq(LogOps.Upsert, LogOps.Upsert))
    assert(id5.last.point.payload === Some("""{"rev":2}"""))
    // seq values are the global enumeration, gap-free
    val all = sh.logEntries("c", 0L, sh.logSize("c")).map(_.seq).toIndexedSeq
    assert(all === (0L until sh.logSize("c")))
  }

  test("distributed BM25: merged partials rank exactly like the unsharded store") {
    val pts = (0 until 40).map { i =>
      Point(f"$i%03d",
        Some(s"""{"body":"tok${i % 3} tok${i % 5} word$i extra${i % 2}"}"""),
        Map.empty)
    }
    val tdesc = CollectionDescriptor("c", Seq.empty)
    val flat = InMemoryCollectionStore.single("c", tdesc, pts)
    val sh = new ShardedCollectionStore((0 until 3).map { i =>
      InMemoryCollectionStore.single("c", tdesc, pts.filter(p =>
        ShardedCollectionStore.assignShard(p.id, 3) == i))
    })
    val terms = Seq("tok1", "tok2", "extra0")
    assert(sh.searchTextRanked("c", "body", terms, 8) ===
      flat.searchTextRanked("c", "body", terms, 8))
    // the partials themselves merge exactly: sums and disjoint unions
    val fp = flat.textRankPartials("c", "body", terms)
    val sp = sh.textRankPartials("c", "body", terms)
    assert((sp.n, sp.totalLen) === ((fp.n, fp.totalLen)))
    assert(sp.dfs.toSeq === fp.dfs.toSeq)
    assert(sp.docs.map(d => (d._1, d._2.toSeq, d._3)).sortBy(_._1) ===
      fp.docs.map(d => (d._1, d._2.toSeq, d._3)).sortBy(_._1))
    // parquet members with their OWN postings sidecars: each shard reads
    // only the query terms' token buckets of ITS slice, primaries closed
    import spark.implicits._
    val df = pts.map(p => (p.id, p.payload.get)).toDF("id", "payload")
    val pqMembers = (0 until 3).map { i =>
      val own = df.filter(col("id").isin(pts.map(_.id).filter(id =>
        ShardedCollectionStore.assignShard(id, 3) == i): _*))
      val d = java.nio.file.Files
        .createTempDirectory(s"graft-shtr-spec$i").toString
      ParquetCollectionStore.write(own, d, numFiles = 2)
      ParquetCollectionStore.writeTextSidecar(own, d, key = "body",
        nBuckets = 8)
      new ParquetCollectionStore(d, "c", tdesc)
    }
    val pqSh = new ShardedCollectionStore(pqMembers)
    assert(pqSh.searchTextRanked("c", "body", terms, 8) ===
      flat.searchTextRanked("c", "body", terms, 8))
    // TWO-PHASE reads the query buckets twice per shard (stats, then
    // the globally-ranked local page) — the price of a k-bounded ship
    val buckets = terms
      .map(t => java.lang.Math.floorMod(t.hashCode, 8)).distinct.size
    pqMembers.zipWithIndex.foreach { case (m, i) =>
      assert(m.textFilesOpened.get() <= 2L * buckets,
        s"shard $i read beyond the query buckets: ${m.textFilesOpened.get()}")
      assert(m.filesOpened.get() === 0L, s"shard $i opened primaries")
    }
  }

  test("two-phase BM25 ships at most shards*k rows under a deliberately common term") {
    // every doc carries "common"; the one-phase partials seam would ship
    // the WHOLE corpus slice to the merge point — the two-phase rank
    // must ship stats (a few longs) + at most k rows per shard
    val pts = (0 until 60).map { i =>
      Point(f"$i%03d",
        Some(s"""{"body":"common filler$i ${if (i % 7 == 0) "rare" else s"w$i"}"}"""),
        Map.empty)
    }
    val tdesc = CollectionDescriptor("c", Seq.empty)
    val flat = InMemoryCollectionStore.single("c", tdesc, pts)

    /** Counting delegate: observes the seam calls the wrapper makes. */
    final class CountingStore(inner: InMemoryCollectionStore) extends CollectionStore {
      val partialsCalls = new java.util.concurrent.atomic.AtomicLong(0L)
      val topkRowsShipped = new java.util.concurrent.atomic.AtomicLong(0L)
      override def collectionInfo(c: String) = inner.collectionInfo(c)
      override def collectionNames = inner.collectionNames
      override def pointCount(c: String) = inner.pointCount(c)
      override def queryPoints(c: String, from: Long, until: Long,
                               withPayload: Boolean, vf: Seq[String],
                               limit: Option[Int],
                               idFilter: Option[Set[String]],
                               idLower: Option[String]) =
        inner.queryPoints(c, from, until, withPayload, vf, limit,
          idFilter, idLower)
      override def textRankPartials(c: String, key: String,
                                    terms: Seq[String]): TextRankPartials = {
        partialsCalls.incrementAndGet()
        inner.textRankPartials(c, key, terms)
      }
      override def textRankStats(c: String, key: String,
                                 terms: Seq[String]): TextRankStats =
        inner.textRankStats(c, key, terms)
      override def textRankTopK(c: String, key: String, terms: Seq[String],
                                k: Int, global: TextRankStats, k1: Double,
                                b: Double): Seq[(String, Double)] = {
        val page = inner.textRankTopK(c, key, terms, k, global, k1, b)
        topkRowsShipped.addAndGet(page.size.toLong)
        page
      }
    }
    val counters = (0 until 3).map { i =>
      new CountingStore(InMemoryCollectionStore.single("c", tdesc,
        pts.filter(p => ShardedCollectionStore.assignShard(p.id, 3) == i)))
    }
    val sh = new ShardedCollectionStore(counters.toIndexedSeq)
    val terms = Seq("common", "rare")
    val k = 5
    // exact: equals the unsharded rank (score AND order)
    assert(sh.searchTextRanked("c", "body", terms, k) ===
      flat.searchTextRanked("c", "body", terms, k))
    // bounded: the merge saw <= shards*k candidate rows, and the
    // unbounded partials seam was never involved
    assert(counters.map(_.topkRowsShipped.get()).sum <= 3L * k,
      s"shipped ${counters.map(_.topkRowsShipped.get())}")
    assert(counters.forall(_.partialsCalls.get() === 0L),
      "ranked serve fell back to the unbounded partials seam")
  }

  test("threshold facet merge is exact on adversarial distributions and bounded on skewed ones") {
    // counting delegate: observes the page limits the wrapper asks for
    // and the rows that come back over the member seam
    final class FacetProbe(inner: InMemoryCollectionStore) extends CollectionStore {
      val maxLimitAsked = new java.util.concurrent.atomic.AtomicLong(0L)
      val rowsShipped = new java.util.concurrent.atomic.AtomicLong(0L)
      val targetedValues = new java.util.concurrent.atomic.AtomicLong(0L)
      override def collectionInfo(c: String) = inner.collectionInfo(c)
      override def collectionNames = inner.collectionNames
      override def pointCount(c: String) = inner.pointCount(c)
      override def queryPoints(c: String, from: Long, until: Long,
                               withPayload: Boolean, vf: Seq[String],
                               limit: Option[Int],
                               idFilter: Option[Set[String]],
                               idLower: Option[String]) =
        inner.queryPoints(c, from, until, withPayload, vf, limit,
          idFilter, idLower)
      override def facetCounts(c: String, key: String, limit: Int,
                               pfilter: PayloadFilter) = {
        maxLimitAsked.updateAndGet(m => math.max(m, limit.toLong))
        val page = inner.facetCounts(c, key, limit, pfilter)
        rowsShipped.addAndGet(page.size.toLong)
        page
      }
      override def facetCountsFor(c: String, key: String,
                                  values: Set[String],
                                  pfilter: PayloadFilter) = {
        targetedValues.addAndGet(values.size.toLong)
        val found = inner.facetCountsFor(c, key, values, pfilter)
        rowsShipped.addAndGet(found.size.toLong)
        found
      }
    }
    val tdesc = CollectionDescriptor("c", Seq.empty)
    def build(valueOfIdx: Int => String, n: Int): (InMemoryCollectionStore, IndexedSeq[FacetProbe]) = {
      val pts = (0 until n).map(i =>
        Point(f"$i%05d", Some(s"""{"v":"${valueOfIdx(i)}"}"""), Map.empty))
      val flat = InMemoryCollectionStore.single("c", tdesc, pts)
      val probes = (0 until 3).map { s =>
        new FacetProbe(InMemoryCollectionStore.single("c", tdesc,
          pts.filter(p => ShardedCollectionStore.assignShard(p.id, 3) == s)))
      }
      (flat, probes)
    }
    // ADVERSARIAL 1: a value placing mid-tail in EVERY shard but topping
    // globally — 40 distinct decoys (above the first page size) with
    // counts 2..4, one value "X" with count 60 spread across shards
    val dist1: Int => String = i =>
      if (i < 60) "X" else s"decoy${(i - 60) % 40}"
    val (flat1, probes1) = build(dist1, 60 + 120)
    val sh1 = new ShardedCollectionStore(probes1.toIndexedSeq)
    for (limit <- Seq(1, 2, 5, 40, 100))
      assert(sh1.facetCounts("c", "v", limit) ===
        flat1.facetCounts("c", "v", limit), s"limit=$limit")
    // ADVERSARIAL 2: all counts EQUAL (the threshold never certifies
    // early — worst case degenerates to full pages, still exact)
    val (flat2, probes2) = build(i => s"eq${i % 50}", 200)
    val sh2 = new ShardedCollectionStore(probes2.toIndexedSeq)
    for (limit <- Seq(3, 50))
      assert(sh2.facetCounts("c", "v", limit) ===
        flat2.facetCounts("c", "v", limit), s"limit=$limit")
    // SKEWED: dominant head values over a LARGE distinct tail — one
    // round certifies, so the merge volume stays O(shards·4·limit),
    // independent of the 400-value tail (the full-histogram merge would
    // ship all of it)
    val dist3: Int => String = i =>
      if (i % 3 != 2) s"head${i % 3}" else s"tail${i / 3 % 400}"
    val (flat3, probes3) = build(dist3, 1500)
    val sh3 = new ShardedCollectionStore(probes3.toIndexedSeq)
    assert(sh3.facetCounts("c", "v", 2) === flat3.facetCounts("c", "v", 2))
    probes3.foreach { p =>
      assert(p.maxLimitAsked.get() <= 16L, // max(4*limit, 16) first page
        s"page limit grew: ${p.maxLimitAsked.get()}")
      assert(p.rowsShipped.get() <= 16L + 16L,
        s"merge volume not bounded: ${p.rowsShipped.get()}")
    }
    // the distinct count per shard is far above what crossed the seam
    assert(flat3.facetCounts("c", "v", 10000).size > 300)
    // targeted pass exactness: facetCountsFor sums across shards
    assert(sh1.facetCountsFor("c", "v", Set("X", "decoy0", "absent")) ===
      Map("X" -> 60L, "decoy0" -> flat1.facetCountsFor("c", "v",
        Set("decoy0"))("decoy0")))
  }

  test("bounded facet merge: certified page == exact merge; uncertified page carries a sound error bound") {
    val tdesc = CollectionDescriptor("c", Seq.empty)
    def build(valueOfIdx: Int => String, n: Int) = {
      val pts = (0 until n).map(i =>
        Point(f"$i%05d", Some(s"""{"v":"${valueOfIdx(i)}"}"""), Map.empty))
      val flat = InMemoryCollectionStore.single("c", tdesc, pts)
      val sh = new ShardedCollectionStore((0 until 3).map { s =>
        InMemoryCollectionStore.single("c", tdesc, pts.filter(p =>
          ShardedCollectionStore.assignShard(p.id, 3) == s))
      })
      (flat, sh)
    }
    // SKEWED head over a long tail: round 1 certifies, the bounded call
    // is exactly the exact merge with a zero error bound
    val (flat1, sh1) = build(i =>
      if (i % 3 != 2) s"head${i % 3}" else s"tail${i / 3 % 400}", 1500)
    val p1 = sh1.facetCountsBounded("c", "v", 2, maxRounds = 1)
    assert(p1.certified && p1.maxError === 0L)
    assert(p1.counts === flat1.facetCounts("c", "v", 2))
    // NEAR-UNIFORM (300 values, count 2 each): one round cannot certify —
    // the bounded page must still be EXACT per returned value and its
    // maxError must bound every value it left out
    val (flat2, sh2) = build(i => s"eq${i % 300}", 600)
    val p2 = sh2.facetCountsBounded("c", "v", 3, maxRounds = 1)
    assert(!p2.certified && p2.maxError > 0L)
    val exact = flat2.facetCounts("c", "v", Int.MaxValue).toMap
    p2.counts.foreach { case (v, n) => assert(exact(v) === n, s"value $v") }
    val returned = p2.counts.map(_._1).toSet
    exact.foreach { case (v, n) =>
      if (!returned(v))
        assert(n <= p2.maxError, s"missing value $v count $n > bound ${p2.maxError}")
    }
    // the unbounded merge on the same adversarial key still terminates
    // exactly (page growth degrades to the full-histogram fallback
    // instead of looping at the cap)
    assert(sh2.facetCounts("c", "v", 3) === flat2.facetCounts("c", "v", 3))
    // arity guard on the two-phase text rank: stats not aligned to the
    // terms must refuse cleanly, never index past the idf array
    val e = intercept[IllegalArgumentException] {
      sh2.textRankTopK("c", "v", Seq("a", "b"), 5,
        TextRankStats(10L, 100L, Array(1L)))
    }
    assert(e.getMessage.contains("dfs"), e.getMessage)
  }

  test("a log-less member disables the global log in EITHER member order") {
    import spark.implicits._
    val pts = mkPoints(20)
    def loglessMember(own: IndexedSeq[Point]): ParquetCollectionStore = {
      val d = java.nio.file.Files
        .createTempDirectory("graft-shard-nolog").toString
      val df = own.map(p => (p.id, p.payload.orNull, p.dense("vector")))
        .toDF("id", "payload", "vector")
      ParquetCollectionStore.write(df, d, numFiles = 1) // NO log dir
      new ParquetCollectionStore(d, "c", desc)
    }
    def loggedMember(own: IndexedSeq[Point]): InMemoryCollectionStore =
      InMemoryCollectionStore.single("c", desc, own)
    val own0 = pts.filter(p => ShardedCollectionStore.assignShard(p.id, 2) == 0)
    val own1 = pts.filter(p => ShardedCollectionStore.assignShard(p.id, 2) == 1)
    // order A: log-less first; order B: logged first (the seeding bug
    // was order-dependent — a log-less member AFTER a logged one left a
    // partial journal whose mutations then threw)
    val orders = Seq(
      (IndexedSeq(loglessMember(own0), loggedMember(own1)), 1),
      (IndexedSeq[CollectionStore](loggedMember(own0), loglessMember(own1)), 0))
    orders.foreach { case (ms, loggedShard) =>
      val sh = new ShardedCollectionStore(ms.toIndexedSeq)
      intercept[UnsupportedOperationException](sh.logSize("c"))
      intercept[UnsupportedOperationException](sh.logStart("c"))
      // mutations routed to the LOGGED member still work — journaling is
      // skipped (the seeding bug made EVERY mutation throw when a logged
      // member preceded a log-less one)
      val fresh = (100 until 200).map { i =>
        Point(f"$i%03d", Some("""{"g":0,"v":"t0"}"""),
          dense = Map("vector" -> Array(1f, 0f)))
      }
      val owned = fresh.filter(p =>
        ShardedCollectionStore.assignShard(p.id, 2) == loggedShard).take(3)
      assert(owned.nonEmpty, "fixture needs ids owned by the logged shard")
      sh.upsertPoints("c", owned)
      assert(sh.pointCount("c") === 20L + owned.size)
      sh.deletePoints("c", Set(owned.head.id))
      assert(sh.pointCount("c") === 19L + owned.size)
      intercept[UnsupportedOperationException](sh.logSize("c"))
    }
  }

  test("journals are keyed per collection; members may serve several") {
    val descA = CollectionDescriptor("a", Seq(DenseField("vector", 2)),
      named = false)
    val descB = CollectionDescriptor("b", Seq(DenseField("vector", 2)),
      named = false)
    val ptsA = mkPoints(12)
    val ptsB = mkPoints(20).map(p => p.copy(id = s"b${p.id}"))
    def member(i: Int): InMemoryCollectionStore =
      new InMemoryCollectionStore(
        Map("a" -> descA, "b" -> descB),
        Map(
          "a" -> ptsA.filter(p =>
            ShardedCollectionStore.assignShard(p.id, 2) == i),
          "b" -> ptsB.filter(p =>
            ShardedCollectionStore.assignShard(p.id, 2) == i)))
    val sh = new ShardedCollectionStore(IndexedSeq(member(0), member(1)))
    // each collection's journal covers ITS ingest only
    assert(sh.logSize("a") === 12L)
    assert(sh.logSize("b") === 20L)
    assert(sh.logEntries("a", 0L, 12L).map(_.point.id).toSet ===
      ptsA.map(_.id).toSet)
    assert(sh.logEntries("b", 0L, 20L).map(_.point.id).toSet ===
      ptsB.map(_.id).toSet)
    // a mutation in one collection never moves the other's positions
    val bBefore = sh.logEntries("b", 0L, 20L)
      .map(e => (e.seq, e.point.id)).toIndexedSeq
    sh.upsertPoints("a", IndexedSeq(
      ptsA(3).copy(payload = Some("""{"rev":2}"""))))
    assert(sh.logSize("a") === 13L)
    assert(sh.logSize("b") === 20L)
    assert(sh.logEntries("b", 0L, 20L)
      .map(e => (e.seq, e.point.id)).toIndexedSeq === bBefore)
  }

  test("collectionInfo falls back across members") {
    val descX = CollectionDescriptor("x", Seq(DenseField("vector", 2)),
      named = false)
    val m0 = InMemoryCollectionStore.single("x", descX, IndexedSeq.empty)
    val m1 = InMemoryCollectionStore.single("c", desc, IndexedSeq.empty)
    val sh = new ShardedCollectionStore(IndexedSeq(m0, m1))
    // "c" is absent from the FIRST member yet served by the second
    assert(sh.collectionInfo("c").name === "c")
    assert(sh.collectionInfo("x").name === "x")
    intercept[IllegalArgumentException](sh.collectionInfo("nope"))
  }

  test("logStart lands INSIDE a partially compacted member segment") {
    val pts = mkPoints(30)
    val members = (0 until 3).map { i =>
      InMemoryCollectionStore.single("c", desc, pts.filter(p =>
        ShardedCollectionStore.assignShard(p.id, 3) == i))
    }
    // compact member 1 into the MIDDLE of its (only) seeded segment
    val m1Size = members(1).logSize("c")
    assert(m1Size > 2L, "fixture needs a few points on shard 1")
    val cut = m1Size / 2
    val sh = new ShardedCollectionStore(IndexedSeq(
      members(0), members(1).compacted("c", cut), members(2)))
    // shard 1's segment starts after shard 0's: the replayable start is
    // globalStart + cut, NOT the segment end (the overshoot bug)
    val m0Size = members(0).logSize("c")
    assert(sh.logStart("c") === m0Size + cut)
    // everything from logStart replays; the dropped prefix fails loudly
    val replayed = sh.logEntries("c", sh.logStart("c"), sh.logSize("c"))
      .map(_.point.id).toIndexedSeq
    assert(replayed.nonEmpty)
    intercept[IllegalStateException](
      sh.logEntries("c", sh.logStart("c") - 1, sh.logSize("c"))
        .foreach(_ => ()))
  }

  test("live reshard N->N+1: only displaced ids move, reads equal before/after, journal is append-only") {
    val pts = mkPoints(120)
    val flat = InMemoryCollectionStore.single("c", desc, pts)
    val sh = sharded(pts, 3)
    val spec = SearchSpec("vector", Array(0.7, -0.2), "cosine", 9)
    val before = sh.searchPoints("c", spec, withPayload = true, Nil)
      .map(p => (p._1.id, p._2))
    val logBefore = sh.logSize("c")
    val prefix = sh.logEntries("c", 0L, logBefore)
      .map(e => (e.seq, e.op, e.point.id)).toIndexedSeq
    // the ids rendezvous will displace: argmax under 4 landed on the new index
    val expectedMoves = pts.map(_.id)
      .filter(id => ShardedCollectionStore.assignShard(id, 4) == 3)
    assert(expectedMoves.nonEmpty && expectedMoves.size < pts.size / 2,
      s"fixture: ${expectedMoves.size} moves of ${pts.size}")
    sh.reshard(Seq(InMemoryCollectionStore.single("c", desc, IndexedSeq.empty)))
    assert(sh.shardCount === 4)
    // ONLY the displaced ids moved, all to the new member
    assert(sh.shards(3).pointCount("c") === expectedMoves.size.toLong)
    sh.shards.zipWithIndex.foreach { case (s, i) =>
      val ids = s.queryPoints("c", 0L, s.pointCount("c"),
        withPayload = false, Nil, None).map(_.id).toSet
      assert(ids.forall(ShardedCollectionStore.assignShard(_, 4) == i),
        s"placement invariant broken on shard $i")
    }
    // moved fraction ~ 1/(N+1)
    val frac = expectedMoves.size.toDouble / pts.size
    assert(frac > 0.10 && frac < 0.45, s"moved fraction $frac")
    // reads are EQUAL to the unsharded store after the reshard
    val after = sh.searchPoints("c", spec, withPayload = true, Nil)
      .map(p => (p._1.id, p._2))
    assert(after === before)
    assert(after === flat.searchPoints("c", spec, withPayload = true, Nil)
      .map(p => (p._1.id, p._2)))
    assert(sh.pointCount("c") === 120L)
    assert(sh.facetCounts("c", "v", 7) === flat.facetCounts("c", "v", 7))
    // id lookups route to the NEW owner
    val movedId = expectedMoves.head
    assert(sh.queryPoints("c", 0L, 120L, withPayload = false, Nil, None,
      idFilter = Some(Set(movedId))).map(_.id).toSeq === Seq(movedId))
    // journal continuity: pre-reshard positions untouched; the migration
    // appended one delete + one upsert per moved id, delete FIRST
    assert(sh.logSize("c") === logBefore + 2L * expectedMoves.size)
    assert(sh.logEntries("c", 0L, logBefore)
      .map(e => (e.seq, e.op, e.point.id)).toIndexedSeq === prefix)
    val tail = sh.logEntries("c", logBefore, sh.logSize("c")).toIndexedSeq
    assert(tail.count(_.op == LogOps.Delete) === expectedMoves.size)
    assert(tail.count(_.op == LogOps.Upsert) === expectedMoves.size)
    expectedMoves.foreach { id =>
      val ops = tail.filter(_.point.id == id).map(_.op)
      assert(ops === IndexedSeq(LogOps.Delete, LogOps.Upsert),
        s"id $id migration replay order: $ops")
    }
    // CDC replay of the FULL log reconstructs the exact final state
    val replayed = scala.collection.mutable.HashMap.empty[String, Option[String]]
    sh.logEntries("c", 0L, sh.logSize("c")).foreach { e =>
      if (e.op == LogOps.Delete) replayed.remove(e.point.id)
      else replayed.update(e.point.id, e.point.payload)
    }
    assert(replayed.size === 120)
    assert(replayed.keySet === pts.map(_.id).toSet)
    // a second reshard composes (N=4 -> 5) with a TINY migration batch
    // — multi-batch migration must be invisible too
    sh.reshard(Seq(InMemoryCollectionStore.single("c", desc, IndexedSeq.empty)),
      migrationBatch = 7)
    assert(sh.shardCount === 5)
    assert(sh.searchPoints("c", spec, withPayload = true, Nil)
      .map(p => (p._1.id, p._2)) === before)
    sh.shards.zipWithIndex.foreach { case (s, i) =>
      val ids = s.queryPoints("c", 0L, s.pointCount("c"),
        withPayload = false, Nil, None).map(_.id).toSet
      assert(ids.forall(ShardedCollectionStore.assignShard(_, 5) == i),
        s"placement invariant broken on shard $i after paged reshard")
    }
    // full-log replay still reconstructs the exact state
    val replayed5 = scala.collection.mutable.HashMap.empty[String, Boolean]
    sh.logEntries("c", 0L, sh.logSize("c")).foreach { e =>
      if (e.op == LogOps.Delete) replayed5.remove(e.point.id)
      else replayed5.update(e.point.id, true)
    }
    assert(replayed5.keySet === pts.map(_.id).toSet)
    // guards: non-empty and non-serving members refuse
    intercept[IllegalArgumentException] {
      sh.reshard(Seq(InMemoryCollectionStore.single("c", desc, mkPoints(3))))
    }
    intercept[IllegalArgumentException] {
      sh.reshard(Seq(InMemoryCollectionStore.single("other",
        CollectionDescriptor("other", Seq.empty), IndexedSeq.empty)))
    }
  }

  test("staged reshard under CONCURRENT mutation: post-state equals the serial result, every point readable mid-migration") {
    val pts = mkPoints(120)
    // ids rendezvous displaces under 3 -> 4 (their new owner is index 3)
    val movers = pts.map(_.id)
      .filter(id => ShardedCollectionStore.assignShard(id, 4) == 3)
    assert(movers.size >= 2, s"fixture: ${movers.size} movers")
    // the mid-flight mutations: a BRAND-NEW leaver id (dual-write path),
    // a re-upsert of a mover, a delete of a mover, and a non-mover edit
    val newLeaver = (500 to 999).map(_.toString)
      .find(id => ShardedCollectionStore.assignShard(id, 4) == 3).get
    val newPt = Point(newLeaver, Some("""{"g":1,"v":"t5"}"""),
      dense = Map("vector" -> Array(0.3f, 0.7f)))
    val reupPt = Point(movers.head, Some("""{"rev":2}"""),
      dense = Map("vector" -> Array(0.9f, -0.1f)))
    val delId = movers(1)
    val nonMover = pts.map(_.id)
      .find(id => ShardedCollectionStore.assignShard(id, 4) ==
        ShardedCollectionStore.assignShard(id, 3) &&
        id != movers.head && id != delId).get
    val nonMoverPt = Point(nonMover, Some("""{"rev":3}"""),
      dense = Map("vector" -> Array(-0.5f, 0.5f)))
    def stateOf(s: ShardedCollectionStore): Seq[(String, Option[String], Seq[Float])] =
      s.queryPoints("c", 0L, s.pointCount("c"), withPayload = true,
        Seq("vector"), None)
        .map(p => (p.id, p.payload, p.dense("vector").toSeq))
        .toSeq.sortBy(_._1)
    // SERIAL oracle: same mutations applied write-quiesced, then reshard
    val serial = {
      val s = sharded(pts, 3)
      s.upsertPoints("c", Seq(newPt, reupPt, nonMoverPt))
      s.deletePoints("c", Set(delId))
      s.reshard(Seq(InMemoryCollectionStore.single("c", desc, IndexedSeq.empty)))
      stateOf(s)
    }
    // CONCURRENT: the same mutations injected BETWEEN migration batches
    // through the deterministic seam, with mid-flight read assertions
    val sh = sharded(pts, 3)
    var batches = 0
    sh.reshard(
      Seq(InMemoryCollectionStore.single("c", desc, IndexedSeq.empty)),
      migrationBatch = 5,
      onBatchMigrated = (_, _) => {
        batches += 1
        // keyed on the GLOBAL batch count — the per-shard index restarts
        // at 0 for every old shard, and each mutation must inject once
        if (batches == 1) {
          sh.upsertPoints("c", Seq(newPt))
          // read-your-write mid-migration: the dual-written leaver is
          // immediately visible through routed reads, exactly once
          val got = sh.queryPoints("c", 0L, sh.pointCount("c"),
            withPayload = true, Nil, None,
            idFilter = Some(Set(newLeaver))).toSeq
          assert(got.map(_.id) === Seq(newLeaver))
          assert(got.head.payload === newPt.payload)
          // global count is exact despite the dual copy
          assert(sh.countMatching("c") === 121L)
        }
        if (batches == 2) {
          sh.upsertPoints("c", Seq(reupPt, nonMoverPt))
          sh.deletePoints("c", Set(delId))
          // deleted mid-migration: gone from BOTH owners immediately
          assert(sh.queryPoints("c", 0L, sh.pointCount("c"),
            withPayload = false, Nil, None,
            idFilter = Some(Set(delId))).isEmpty)
          // a mid-migration search never returns duplicate ids
          val ids = sh.searchPoints("c",
            SearchSpec("vector", Array(0.7, -0.2), "cosine", 20),
            withPayload = false, Nil).map(_._1.id)
          assert(ids.distinct === ids)
        }
      })
    assert(batches >= 2, s"fixture must exercise multiple batches: $batches")
    // POST-STATE equality with the serial result
    assert(stateOf(sh) === serial)
    assert(sh.shardCount === 4)
    // placement invariant on every shard (no residual dual copies)
    sh.shards.zipWithIndex.foreach { case (s, i) =>
      val ids = s.queryPoints("c", 0L, s.pointCount("c"),
        withPayload = false, Nil, None).map(_.id).toSet
      assert(ids.forall(ShardedCollectionStore.assignShard(_, 4) == i),
        s"placement invariant broken on shard $i")
    }
    // CDC replay of the FULL journal reconstructs the exact final state
    val replayed = scala.collection.mutable.HashMap.empty[String, Option[String]]
    sh.logEntries("c", 0L, sh.logSize("c")).foreach { e =>
      if (e.op == LogOps.Delete) replayed.remove(e.point.id)
      else replayed.update(e.point.id, e.point.payload)
    }
    assert(replayed.keySet === stateOf(sh).map(_._1).toSet)
    assert(replayed(newLeaver) === newPt.payload)
    assert(replayed(movers.head) === reupPt.payload)
    assert(replayed(nonMover) === nonMoverPt.payload)
  }

  test("a failed reshard leaves the store fully serveable; resumeReshard completes the migration") {
    val pts = mkPoints(80)
    val sh = sharded(pts, 2)
    intercept[RuntimeException] {
      sh.reshard(
        Seq(InMemoryCollectionStore.single("c", desc, IndexedSeq.empty)),
        migrationBatch = 5,
        onBatchMigrated = (_, b) =>
          if (b == 1) throw new RuntimeException("injected fault"))
    }
    // the transition stays PUBLISHED: every point readable, count exact,
    // searches clean — the cluster is degraded in placement, not service
    assert(sh.countMatching("c") === 80L)
    assert(sh.queryPoints("c", 0L, sh.pointCount("c"),
      withPayload = false, Nil, None).map(_.id).toSet ===
      pts.map(_.id).toSet)
    val spec = SearchSpec("vector", Array(0.6, 0.4), "cosine", 9)
    val midIds = sh.searchPoints("c", spec, withPayload = false, Nil)
      .map(_._1.id)
    assert(midIds.distinct === midIds)
    // writes still land mid-failure (dual-written when they're leavers)
    sh.upsertPoints("c", Seq(Point("900", Some("""{"g":0,"v":"t0"}"""),
      dense = Map("vector" -> Array(1f, 0f)))))
    assert(sh.countMatching("c") === 81L)
    // a fresh reshard refuses while the window is open; resume finishes
    intercept[IllegalArgumentException] {
      sh.reshard(Seq(InMemoryCollectionStore.single("c", desc, IndexedSeq.empty)))
    }
    sh.resumeReshard(migrationBatch = 5)
    assert(sh.shardCount === 3)
    assert(sh.countMatching("c") === 81L)
    sh.shards.zipWithIndex.foreach { case (s, i) =>
      val ids = s.queryPoints("c", 0L, s.pointCount("c"),
        withPayload = false, Nil, None).map(_.id).toSet
      assert(ids.forall(ShardedCollectionStore.assignShard(_, 3) == i),
        s"placement invariant broken on shard $i after resume")
    }
    // journal replay == final state
    val replayed = scala.collection.mutable.HashSet.empty[String]
    sh.logEntries("c", 0L, sh.logSize("c")).foreach { e =>
      if (e.op == LogOps.Delete) replayed.remove(e.point.id)
      else replayed.add(e.point.id)
    }
    assert(replayed.toSet === pts.map(_.id).toSet + "900")
  }

  test("keyed wire topology end-to-end: keyed seams above AND below the scatter-gather; unkeyed rejects at each") {
    val pts = mkPoints(40)
    val flat = InMemoryCollectionStore.single("c", desc, pts)
    val key = "spec-topology-key"
    // member nodes: keyed binary servers fronting the rendezvous slices
    val memberServers = (0 until 3).map { i =>
      val name = s"sh_keyed_member_$i"
      CollectionStores.register(name, InMemoryCollectionStore.single("c",
        desc, pts.filter(p => ShardedCollectionStore.assignShard(p.id, 3) == i)))
      new CollectionGrpcServer(name, apiKey = Some(key)).start()
    }
    val outer = {
      val memberClients = memberServers.map(srv =>
        new GrpcCollectionStore(srv.host, srv.port, apiKey = Some(key)))
      CollectionStores.register("sh_keyed_backend",
        new ShardedCollectionStore(memberClients.toIndexedSeq))
      new CollectionGrpcServer("sh_keyed_backend", apiKey = Some(key)).start()
    }
    try {
      val cl = new GrpcCollectionStore(outer.host, outer.port,
        apiKey = Some(key))
      // reads traverse BOTH keyed seams and equal the unsharded store
      val spec = SearchSpec("vector", Array(0.8, 0.3), "cosine", 7)
      assert(cl.searchPoints("c", spec, withPayload = true, Nil)
        .map(p => (p._1.id, p._2)) ===
        flat.searchPoints("c", spec, withPayload = true, Nil)
          .map(p => (p._1.id, p._2)))
      assert(cl.pointCount("c") === 40L)
      // writes route through the full topology: outer wire -> sharded
      // routing -> member wires
      cl.upsertPoints("c", Seq(Point("950", Some("""{"g":1,"v":"t1"}"""),
        dense = Map("vector" -> Array(0.1f, 0.9f)))))
      assert(cl.pointCount("c") === 41L)
      val owner = ShardedCollectionStore.assignShard("950", 3)
      assert(CollectionStores.get(s"sh_keyed_member_$owner")
        .pointCount("c") ===
        pts.count(p => ShardedCollectionStore.assignShard(p.id, 3) == owner)
          .toLong + 1L)
      // unkeyed at the OUTER seam: refused before any routing
      val unkeyedOuter = new GrpcCollectionStore(outer.host, outer.port)
      intercept[SecurityException] { unkeyedOuter.pointCount("c") }
      // unkeyed at a MEMBER seam: refused too (defense in depth — a
      // caller who bypasses the front door still hits a locked node)
      val unkeyedMember = new GrpcCollectionStore(
        memberServers.head.host, memberServers.head.port)
      intercept[SecurityException] { unkeyedMember.pointCount("c") }
    } finally {
      outer.stop()
      memberServers.foreach(_.stop())
    }
  }

  test("reshard onto a WIRE member; snapshot of a sharded collection restores exactly") {
    val pts = mkPoints(60)
    val flat = InMemoryCollectionStore.single("c", desc, pts)
    val sh = sharded(pts, 2)
    // the new node lives behind the binary wire — the production grow
    // path: provision the collection on the node, then reshard onto its
    // client; migration upserts route through RemoteCollectionClient
    CollectionStores.register("sh_grow_node",
      InMemoryCollectionStore.single("c", desc, IndexedSeq.empty))
    val nodeSrv = new CollectionGrpcServer("sh_grow_node").start()
    try {
      val nodeClient = new GrpcCollectionStore(nodeSrv.host, nodeSrv.port)
      sh.reshard(Seq(nodeClient))
      assert(sh.shardCount === 3)
      val expectedMoves = pts.map(_.id)
        .filter(id => ShardedCollectionStore.assignShard(id, 3) == 2)
      // the displaced ids landed on the REMOTE node (read back through
      // the registry — the server applied the routed upserts there)
      assert(CollectionStores.get("sh_grow_node").pointCount("c") ===
        expectedMoves.size.toLong)
      assert(nodeClient.pointCount("c") === expectedMoves.size.toLong)
      val spec = SearchSpec("vector", Array(0.2, 0.9), "cosine", 8)
      assert(sh.searchPoints("c", spec, withPayload = true, Nil)
        .map(p => (p._1.id, p._2)) ===
        flat.searchPoints("c", spec, withPayload = true, Nil)
          .map(p => (p._1.id, p._2)))
      // SNAPSHOT the sharded collection (the store-interface read walks
      // all shards, wire member included) and restore: exact round trip
      CollectionStores.register("sh_snap_src", sh)
      val path = java.nio.file.Files
        .createTempDirectory("graft-sh-snap").toString
      graft.collections.Snapshot.create(spark, "sh_snap_src", "c", path)
      val restored = graft.collections.Snapshot.restore(
        spark, path, "sh_snap_dst", "c2")
      assert(restored.count() === 60L)
      val got = restored.select("id", "payload").collect()
        .map(r => (r.getString(0), r.getString(1))).sortBy(_._1).toSeq
      val want = pts.map(p => (p.id, p.payload.orNull)).sortBy(_._1)
      assert(got === want)
    } finally nodeSrv.stop()
  }

  test("global compaction delegates to member-local positions; logStart reports the cut exactly") {
    val pts = mkPoints(40)
    val sh = sharded(pts, 3)
    // grow the journal past the ingest: a revision and a delete
    sh.upsertPoints("c", IndexedSeq(
      pts(7).copy(payload = Some("""{"rev":2}"""))))
    sh.deletePoints("c", Set("011"))
    val head = sh.logSize("c")
    assert(head === 42L)
    val cut = 25L
    val retained = sh.logEntries("c", cut, head)
      .map(e => (e.seq, e.op, e.point.id)).toIndexedSeq
    sh.compact("c", cut)
    // the cut is exact — the partial-segment mapping lands INSIDE the
    // member segment the cut bisects
    assert(sh.logStart("c") === cut)
    assert(sh.logSize("c") === head)
    // retained entries replay with unchanged positions; the dropped
    // prefix fails loudly
    assert(sh.logEntries("c", cut, head)
      .map(e => (e.seq, e.op, e.point.id)).toIndexedSeq === retained)
    intercept[IllegalStateException](
      sh.logEntries("c", cut - 1, head).foreach(_ => ()))
    // reads are untouched by compaction
    assert(sh.pointCount("c") === 39L)
    val spec = SearchSpec("vector", Array(0.4, 0.6), "cosine", 6)
    val flatAfter = {
      val f0 = InMemoryCollectionStore.single("c", desc, pts)
      f0.appended("c", IndexedSeq(pts(7).copy(payload = Some("""{"rev":2}"""))))
        .removed("c", Set("011"))
    }
    assert(sh.searchPoints("c", spec, withPayload = true, Nil)
      .map(p => (p._1.id, p._1.payload, p._2)) ===
      flatAfter.searchPoints("c", spec, withPayload = true, Nil)
        .map(p => (p._1.id, p._1.payload, p._2)))
    // compacting past the head refuses
    intercept[IllegalArgumentException](sh.compact("c", head + 1))
  }

  test("optimizeMembers reseals every parquet member's sidecars; reads and journal positions survive") {
    import spark.implicits._
    val pts = mkPoints(40)
    def frameOf(ps: IndexedSeq[Point]) =
      ps.map(p => (p.id, p.payload.orNull, p.dense("vector")))
        .toDF("id", "payload", "vector")
    val members = (0 until 2).map { i =>
      val own = pts.filter(p => ShardedCollectionStore.assignShard(p.id, 2) == i)
      val d = java.nio.file.Files
        .createTempDirectory(s"graft-shard-opt$i").toString
      ParquetCollectionStore.write(frameOf(own), d, numFiles = 2,
        withLog = true)
      ParquetCollectionStore.writePayloadSidecar(
        frameOf(own), d, key = "g", kind = "int")
      new ParquetCollectionStore(d, "c", desc)
    }
    val sh = new ShardedCollectionStore(members)
    // mutate AFTER the indexes sealed: the sidecars now carry a dirty tail
    sh.upsertPoints("c", IndexedSeq(
      Point("900", Some("""{"g":2,"v":"t9"}"""),
        dense = Map("vector" -> Array(0.5f, 0.5f)))))
    sh.deletePoints("c", Set("004"))
    val logHead = sh.logSize("c")
    val pf = PayloadFilter(Seq(PayloadCondition("g", "eq", "2")), Nil, None)
    val wantCount = sh.countMatchingFiltered("c", pfilter = pf)
    val spec = SearchSpec("vector", Array(0.9, 0.1), "cosine", 5)
    val wantPage = sh.searchPointsFiltered("c", spec, withPayload = true,
      Nil, pf).map(p => (p._1.id, p._1.payload, p._2))
    // one call closes the freshness loop on EVERY parquet member
    sh.optimizeMembers(spark)
    assert(sh.countMatchingFiltered("c", pfilter = pf) === wantCount)
    assert(sh.searchPointsFiltered("c", spec, withPayload = true, Nil, pf)
      .map(p => (p._1.id, p._1.payload, p._2)) === wantPage)
    // journal positions preserved: optimize never writes the log
    assert(sh.logSize("c") === logHead)
    assert(sh.logEntries("c", 0L, logHead).size.toLong === logHead)
    // the swapped-in members are FRESH instances on the same dirs with
    // resealed sidecars (empty overlay tails)
    sh.shards.foreach { m =>
      assert(m.isInstanceOf[ParquetCollectionStore])
      assert(!members.contains(m), "member not swapped after optimize")
    }
  }

  test("sharded over parquet members: search and mutation parity with one store") {
    val pts = mkPoints(40)
    def dirFor(tag: String) =
      java.nio.file.Files.createTempDirectory(s"graft-shard-$tag").toString
    import spark.implicits._
    def frameOf(ps: IndexedSeq[Point]) =
      ps.map(p => (p.id, p.payload.orNull, p.dense("vector")))
        .toDF("id", "payload", "vector")
    val members = (0 until 2).map { i =>
      val own = pts.filter(p => ShardedCollectionStore.assignShard(p.id, 2) == i)
      val d = dirFor(s"m$i")
      ParquetCollectionStore.write(frameOf(own), d, numFiles = 2, withLog = true)
      new ParquetCollectionStore(d, "c", desc)
    }
    val sh = new ShardedCollectionStore(members)
    val flat = InMemoryCollectionStore.single("c", desc, pts)
    val spec = SearchSpec("vector", Array(0.9, 0.1), "cosine", 6)
    assert(sh.searchPoints("c", spec, withPayload = true, Nil)
      .map(p => (p._1.id, p._2)) ===
      flat.searchPoints("c", spec, withPayload = true, Nil)
        .map(p => (p._1.id, p._2)))
    // COW members are swapped on mutation, reads see the new state
    sh.deletePoints("c", Set("003"))
    assert(sh.pointCount("c") === 39L)
    assert(sh.queryPoints("c", 0L, 39L, withPayload = false, Nil, None,
      idFilter = Some(Set("003"))).isEmpty)
    // the delete journaled onto the global log after the ingest prefix
    val last = sh.logEntries("c", sh.logSize("c") - 1, sh.logSize("c")).next()
    assert((last.op, last.point.id) === ((LogOps.Delete, "003")))
  }
}
