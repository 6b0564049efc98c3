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
    val buckets = terms
      .map(t => java.lang.Math.floorMod(t.hashCode, 8)).distinct.size
    pqMembers.zipWithIndex.foreach { case (m, i) =>
      assert(m.textFilesOpened.get() <= buckets.toLong,
        s"shard $i read beyond the query buckets: ${m.textFilesOpened.get()}")
      assert(m.filesOpened.get() === 0L, s"shard $i opened primaries")
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
