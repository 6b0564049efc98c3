package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.collections._
import graft.sources._

/** Replica-set semantics at the store seam: write-all / read-one,
  * sticky failover on transport errors only, dead-marking on failed
  * writes, resync recovery, and composition under the sharded wrapper
  * (placement × replication).
  */
class ReplicatedCollectionStoreSpec extends AnyFunSuite {

  private val desc =
    CollectionDescriptor("c", Seq(DenseField("v", 2)), named = false)

  private def pt(id: String, x: Float, g: Int = 0) = Point(
    id, payload = Some(s"""{"g":$g}"""),
    dense = Map("v" -> Array(x, 1f - x)))

  private def mem(pts: Point*): InMemoryCollectionStore =
    InMemoryCollectionStore.single("c", desc, pts.toIndexedSeq.sortBy(_.id))

  private def ids(s: CollectionStore): Seq[String] =
    s.queryPoints("c", 0L, s.pointCount("c"), withPayload = true,
      Seq("v"), None).map(_.id).toSeq

  /** A replica whose transport can be broken per direction — reads
    * and/or writes throw IOException like a down node's socket.
    */
  private final class FlakyReplica(var mem: InMemoryCollectionStore,
                                   var failReads: Boolean = false,
                                   var failWrites: Boolean = false)
      extends CollectionStore with RemoteCollectionClient {
    private def r[T](f: CollectionStore => T): T = {
      if (failReads) throw new java.io.IOException("replica down")
      f(mem)
    }
    override def collectionInfo(c: String): CollectionDescriptor =
      r(_.collectionInfo(c))
    override def pointCount(c: String): Long = r(_.pointCount(c))
    override def queryPoints(c: String, from: Long, until: Long,
                             withPayload: Boolean,
                             vectorFields: Seq[String],
                             limit: Option[Int],
                             idFilter: Option[Set[String]] = None,
                             idLower: Option[String] = None): Iterator[Point] =
      r(_.queryPoints(c, from, until, withPayload, vectorFields, limit,
        idFilter, idLower))
    override def searchPointsFiltered(c: String, spec: SearchSpec,
                                      withPayload: Boolean,
                                      vectorFields: Seq[String],
                                      pfilter: PayloadFilter): Seq[(Point, Double)] =
      r(_.searchPointsFiltered(c, spec, withPayload, vectorFields, pfilter))
    override def collectionNames: Seq[String] = r(_.collectionNames)
    override def logSize(c: String): Long = r(_.logSize(c))
    override def logStart(c: String): Long = r(_.logStart(c))
    override def logEntries(c: String, from: Long,
                            until: Long): Iterator[LogEntry] =
      r(_.logEntries(c, from, until))
    private def w(): Unit =
      if (failWrites) throw new java.io.IOException("replica down")
    override def upsertPoints(c: String, pts: Seq[Point]): Unit = {
      w(); mem = mem.appended(c, pts.sortBy(_.id).toIndexedSeq)
    }
    override def deletePoints(c: String, ids: Set[String]): Unit = {
      w(); mem = mem.removed(c, ids)
    }
    override def truncate(c: String): Unit = { w(); mem = mem.truncated(c) }
    override def compact(c: String, upTo: Long): Unit =
      throw new UnsupportedOperationException("no log")
  }

  /** A replica that rejects a read with a SEMANTIC error — failover on
    * it would mask a caller bug.
    */
  private final class GrumpyReplica(inner: InMemoryCollectionStore)
      extends CollectionStore {
    override def collectionInfo(c: String): CollectionDescriptor =
      inner.collectionInfo(c)
    override def pointCount(c: String): Long = inner.pointCount(c)
    override def queryPoints(c: String, from: Long, until: Long,
                             withPayload: Boolean,
                             vectorFields: Seq[String],
                             limit: Option[Int],
                             idFilter: Option[Set[String]] = None,
                             idLower: Option[String] = None): Iterator[Point] =
      inner.queryPoints(c, from, until, withPayload, vectorFields, limit,
        idFilter, idLower)
    override def searchPointsFiltered(c: String, spec: SearchSpec,
                                      withPayload: Boolean,
                                      vectorFields: Seq[String],
                                      pfilter: PayloadFilter): Seq[(Point, Double)] =
      throw new IllegalArgumentException("bad request")
  }

  private val spec2 = SearchSpec("v", Array(1.0, 0.0), "cosine", 2)

  test("write-all / read-one: a write lands on every replica; reads serve from one") {
    val rs = new ReplicatedCollectionStore(IndexedSeq(mem(), mem()))
    rs.upsertPoints("c", Seq(pt("1", 0.9f), pt("2", 0.5f), pt("3", 0.1f)))
    rs.deletePoints("c", Set("3"))
    assert(rs.pointCount("c") === 2L)
    // each replica holds the full state independently
    rs.replicas.foreach(r => assert(ids(r) === Seq("1", "2")))
    val got = rs.searchPoints("c", spec2, withPayload = true, Seq("v"))
    assert(got.map(_._1.id) === Seq("1", "2"))
    assert(rs.readFailovers.get() === 0L)
    // lifecycle write: compact fans to every replica's own journal
    val head = rs.logSize("c")
    rs.compact("c", head)
    rs.replicas.foreach(r => assert(r.logStart("c") === head))
  }

  test("writeAll fans out: a 3-replica write costs ~the slowest member, not the sum") {
    // a replica whose writes take a fixed wall-clock delay (a wire
    // member's round trip); serialized applies would cost 3x it
    final class SlowReplica(var mem: InMemoryCollectionStore,
                            delayMs: Long)
        extends CollectionStore with RemoteCollectionClient {
      override def collectionInfo(c: String): CollectionDescriptor =
        mem.collectionInfo(c)
      override def pointCount(c: String): Long = mem.pointCount(c)
      override def queryPoints(c: String, from: Long, until: Long,
                               withPayload: Boolean,
                               vectorFields: Seq[String],
                               limit: Option[Int],
                               idFilter: Option[Set[String]] = None,
                               idLower: Option[String] = None): Iterator[Point] =
        mem.queryPoints(c, from, until, withPayload, vectorFields, limit,
          idFilter, idLower)
      override def upsertPoints(c: String, pts: Seq[Point]): Unit = {
        Thread.sleep(delayMs)
        mem = mem.appended(c, pts.sortBy(_.id).toIndexedSeq)
      }
      override def deletePoints(c: String, ids: Set[String]): Unit =
        mem = mem.removed(c, ids)
      override def truncate(c: String): Unit = mem = mem.truncated(c)
      override def compact(c: String, upTo: Long): Unit =
        throw new UnsupportedOperationException("no log")
    }
    val delay = 250L
    val members = IndexedSeq.fill(3)(new SlowReplica(mem(), delay))
    val rs = new ReplicatedCollectionStore(
      members)
    val t0 = System.nanoTime()
    rs.upsertPoints("c", Seq(pt("1", 0.9f), pt("2", 0.5f)))
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    // concurrent applies: well under the 3x-delay serialized cost (the
    // 2x bound leaves slack for pool scheduling)
    assert(elapsedMs < 2 * delay,
      s"3-replica write took ${elapsedMs}ms — the applies serialized")
    // and the write still landed on EVERY replica
    members.foreach(r => assert(ids(r) === Seq("1", "2")))
    assert(rs.pointCount("c") === 2L)
  }

  test("suspect marks survive concurrent reads (atomic flag flips)") {
    val down = new FlakyReplica(mem(pt("1", 0.9f)), failReads = true)
    val up = mem(pt("1", 0.9f))
    val rs = new ReplicatedCollectionStore(IndexedSeq(down, up))
    // hammer reads from many threads while the broken replica fails:
    // with atomic flags the suspicion set by one thread is never lost
    // by another's read-modify-write, so after the warm-up burst the
    // rotation skips the broken replica — failovers stay bounded by the
    // burst width, not the total read count
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val total = 400
    val tasks = (0 until total).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = rs.pointCount("c")
      })
    }
    tasks.foreach(t => assert(t.get() === 1L))
    pool.shutdown()
    // every read answered; the broken replica was probed at most once
    // per concurrently-racing thread (8), not once per read (400)
    assert(rs.readFailovers.get() <= 16L,
      s"${rs.readFailovers.get()} failovers — suspect marks were lost")
  }

  test("read failover: a transport failure moves the sticky preference; one probe, not one per query") {
    val down = new FlakyReplica(mem(pt("1", 0.9f)), failReads = true)
    val up = mem(pt("1", 0.9f))
    val rs = new ReplicatedCollectionStore(IndexedSeq(down, up))
    assert(rs.searchPoints("c", spec2, withPayload = false, Nil)
      .map(_._1.id) === Seq("1"))
    assert(rs.readFailovers.get() === 1L)
    // preference moved: the next read goes straight to the healthy one
    assert(rs.pointCount("c") === 1L)
    assert(rs.readFailovers.get() === 1L)
    // a whole-set outage surfaces as an error, not a hang or empty page
    down.failReads = true
    val rsAllDown = new ReplicatedCollectionStore(IndexedSeq(
      new FlakyReplica(mem(pt("1", 0.9f)), failReads = true)))
    intercept[IllegalStateException] { rsAllDown.pointCount("c") }
  }

  test("semantic errors never fail over") {
    val rs = new ReplicatedCollectionStore(IndexedSeq(
      new GrumpyReplica(mem(pt("1", 0.9f))), mem(pt("1", 0.9f))))
    intercept[IllegalArgumentException] {
      rs.searchPoints("c", spec2, withPayload = false, Nil)
    }
    assert(rs.readFailovers.get() === 0L)
  }

  test("failed write marks the replica dead; resync copies state back and re-activates") {
    val flaky = new FlakyReplica(mem(pt("1", 0.9f)))
    val rs = new ReplicatedCollectionStore(
      IndexedSeq(flaky, mem(pt("1", 0.9f))), resyncBatch = 2)
    flaky.failWrites = true
    // the write survives on the healthy replica; the broken one is dead
    rs.upsertPoints("c", Seq(pt("2", 0.5f), pt("4", 0.3f), pt("5", 0.2f)))
    assert(rs.deadMarks.get() === 1L)
    assert(rs.alive === IndexedSeq(false, true))
    // dead replicas serve no reads — even when their transport heals,
    // they are stale until resynced
    flaky.failWrites = false
    flaky.failReads = false
    assert(rs.pointCount("c") === 4L)
    // further writes skip the dead replica (it would diverge silently)
    rs.deletePoints("c", Set("4"))
    assert(ids(flaky.mem) === Seq("1"))
    // RESYNC: truncate + paged re-upsert from the alive replica
    // (resyncBatch=2 forces multiple pages), then back in rotation
    rs.resyncReplica("c", 0)
    assert(rs.alive === IndexedSeq(true, true))
    assert(ids(rs.replicas(0)) === Seq("1", "2", "5"))
    assert(ids(rs.replicas(0)) === ids(rs.replicas(1)))
    // a whole-set write outage throws
    val rs2 = new ReplicatedCollectionStore(IndexedSeq(
      new FlakyReplica(mem(), failWrites = true)))
    intercept[IllegalStateException] { rs2.upsertPoints("c", Seq(pt("9", 0.1f))) }
  }

  test("reads distribute round-robin across alive replicas — N replicas buy N x read throughput") {
    val rs = new ReplicatedCollectionStore(IndexedSeq(
      mem(pt("1", 0.9f)), mem(pt("1", 0.9f)), mem(pt("1", 0.9f))))
    (1 to 9).foreach(_ => assert(rs.pointCount("c") === 1L))
    assert(rs.readsServed.map(_.get()) === IndexedSeq(3L, 3L, 3L))
    // a suspect replica leaves the rotation after ONE failed probe and
    // the remaining replicas absorb its share
    val down = new FlakyReplica(mem(pt("1", 0.9f)), failReads = true)
    val rs2 = new ReplicatedCollectionStore(IndexedSeq(
      down, mem(pt("1", 0.9f)), mem(pt("1", 0.9f))))
    (1 to 6).foreach(_ => assert(rs2.pointCount("c") === 1L))
    assert(rs2.readFailovers.get() === 1L)
    assert(rs2.readsServed(0).get() === 0L)
    assert(rs2.readsServed(1).get() + rs2.readsServed(2).get() === 6L)
    // the suspect HEALS: once every non-suspect fails, the re-probe
    // finds it back and it rejoins the rotation
    down.failReads = false
    val healedOnly = new FlakyReplica(mem(pt("1", 0.9f)), failReads = true)
    val rs3 = new ReplicatedCollectionStore(IndexedSeq(healedOnly))
    intercept[IllegalStateException] { rs3.pointCount("c") }
    healedOnly.failReads = false
    assert(rs3.pointCount("c") === 1L) // suspect re-probed, healed
  }

  test("read_consistency quorum masks a stale replica; ties fall to the rotation's first answer") {
    val full = Seq(pt("1", 0.9f), pt("2", 0.5f), pt("3", 0.1f))
    val stale = new ReplicatedCollectionStore(IndexedSeq(
      mem(full.take(2): _*), // stale: missing point 3
      mem(full: _*), mem(full: _*)), readConsistency = 3)
    // every read gathers all three answers; the stale minority loses
    (1 to 6).foreach(_ => assert(stale.pointCount("c") === 3L))
    val got = stale.searchPoints("c",
      SearchSpec("v", Array(0.0, 1.0), "cosine", 3), withPayload = true,
      Seq("v"))
    assert(got.map(_._1.id) === Seq("3", "2", "1"))
    // readConsistency=1 on the same set DOES surface the stale answer
    // on its rotation turn — the dial is what masks divergence
    val loose = new ReplicatedCollectionStore(IndexedSeq(
      mem(full.take(2): _*), mem(full: _*), mem(full: _*)))
    val counts = (1 to 6).map(_ => loose.pointCount("c"))
    assert(counts.contains(2L) && counts.contains(3L))
  }

  test("partial semantic write: appliers commit, the rejecting replica is dead-marked, the error still surfaces") {
    /* replica 1 rejects upserts semantically while replica 0 applies */
    final class Rejecting(var mem: InMemoryCollectionStore)
        extends CollectionStore with RemoteCollectionClient {
      override def collectionInfo(c: String): CollectionDescriptor =
        mem.collectionInfo(c)
      override def pointCount(c: String): Long = mem.pointCount(c)
      override def queryPoints(c: String, from: Long, until: Long,
                               withPayload: Boolean,
                               vectorFields: Seq[String],
                               limit: Option[Int],
                               idFilter: Option[Set[String]] = None,
                               idLower: Option[String] = None): Iterator[Point] =
        mem.queryPoints(c, from, until, withPayload, vectorFields, limit,
          idFilter, idLower)
      override def upsertPoints(c: String, pts: Seq[Point]): Unit =
        throw new IllegalArgumentException("schema rejected")
      override def deletePoints(c: String, ids: Set[String]): Unit =
        throw new IllegalArgumentException("schema rejected")
      override def truncate(c: String): Unit =
        throw new IllegalArgumentException("schema rejected")
      override def compact(c: String, upTo: Long): Unit = ()
    }
    val rej = new Rejecting(mem(pt("1", 0.9f)))
    val rs = new ReplicatedCollectionStore(IndexedSeq(
      mem(pt("1", 0.9f)), rej))
    intercept[IllegalArgumentException] {
      rs.upsertPoints("c", Seq(pt("2", 0.5f)))
    }
    // the applied state COMMITTED (never silently dropped) and the
    // diverged rejector left rotation
    assert(rs.alive === IndexedSeq(true, false))
    assert(rs.deadMarks.get() === 1L)
    assert(ids(rs.replicas(0)) === Seq("1", "2"))
    assert(rs.pointCount("c") === 2L)
    // a UNIFORM semantic rejection (no replica applied) rethrows with
    // NO dead-marks — the caller-bug case, state untouched
    val rs2 = new ReplicatedCollectionStore(IndexedSeq(
      new Rejecting(mem(pt("1", 0.9f))), new Rejecting(mem(pt("1", 0.9f)))))
    intercept[IllegalArgumentException] {
      rs2.upsertPoints("c", Seq(pt("2", 0.5f)))
    }
    assert(rs2.alive === IndexedSeq(true, true))
    assert(rs2.deadMarks.get() === 0L)
  }

  test("resync copies EVERY collection back — a replica re-enters rotation only fully synced") {
    val descB = CollectionDescriptor("d", Seq(DenseField("v", 2)),
      named = false)
    def multi() = new InMemoryCollectionStore(
      Map("c" -> desc, "d" -> descB),
      Map("c" -> IndexedSeq(pt("1", 0.9f)), "d" -> IndexedSeq(pt("9", 0.2f))))
    val broken = new FlakyReplica(multi())
    val set = new ReplicatedCollectionStore(
      IndexedSeq(broken, multi()), resyncBatch = 1)
    broken.failWrites = true
    set.upsertPoints("c", Seq(pt("2", 0.5f))) // replica 0 dead-marked
    assert(set.alive === IndexedSeq(false, true))
    broken.failWrites = false
    set.upsertPoints("d", Seq(pt("8", 0.4f))) // dead replica skipped
    // the OLD single-collection signature must still resync everything:
    // re-activating on one collection's copy alone would serve stale 'd'
    set.resyncReplica("c", 0)
    assert(set.alive === IndexedSeq(true, true))
    val r0 = broken.mem
    assert(r0.queryPoints("c", 0L, r0.pointCount("c"), withPayload = false,
      Nil, None).map(_.id).toSeq === Seq("1", "2"))
    assert(r0.queryPoints("d", 0L, r0.pointCount("d"), withPayload = false,
      Nil, None).map(_.id).toSeq === Seq("8", "9"))
  }

  test("CDC journal binds to one lineage: in-sync failover resumes, a resynced lineage fails loudly") {
    def logged() = mem(pt("1", 0.9f))
    val a = new FlakyReplica(logged())
    val rs = new ReplicatedCollectionStore(IndexedSeq(a, logged()))
    rs.upsertPoints("c", Seq(pt("2", 0.5f)))
    // bind: first journal read follows ONE replica
    val size0 = rs.logSize("c")
    assert(size0 === 2L)
    // in-sync failover: the bound replica's transport breaks; the peer
    // carries the SAME lineage (epoch 0) — the reader resumes seamlessly
    a.failReads = true
    assert(rs.logSize("c") === 2L)
    assert(rs.logEntries("c", 0L, 2L).map(_.point.id).toSeq
      === Seq("1", "2"))
    a.failReads = false
    // RESYNC rewrites replica 0's journal lineage; a reader bound to it
    // must fail loudly, not silently mix journals
    val b = new FlakyReplica(logged())
    val rs2 = new ReplicatedCollectionStore(IndexedSeq(b, logged()))
    rs2.upsertPoints("c", Seq(pt("2", 0.5f)))
    assert(rs2.logSize("c") === 2L) // binds to replica 0
    b.failWrites = true
    rs2.upsertPoints("c", Seq(pt("3", 0.1f))) // replica 0 dead-marked
    b.failWrites = false
    rs2.resyncReplica(0) // fresh epoch on replica 0 — lineage rewritten
    val e = intercept[IllegalStateException] { rs2.logSize("c") }
    assert(e.getMessage.contains("journal lineage changed"))
    // a reader bound to a SURVIVING lineage keeps working after the
    // resync of the OTHER replica
    val c0 = new FlakyReplica(logged())
    val rs3 = new ReplicatedCollectionStore(IndexedSeq(logged(), c0))
    rs3.upsertPoints("c", Seq(pt("2", 0.5f)))
    assert(rs3.logSize("c") === 2L) // binds to replica 0 (alive, epoch 0)
    c0.failWrites = true
    rs3.upsertPoints("c", Seq(pt("3", 0.1f)))
    c0.failWrites = false
    rs3.resyncReplica(1)
    assert(rs3.logSize("c") === 3L) // bound lineage untouched
    // and if the bound replica NOW dies, the only peer is a rewritten
    // lineage — the reader must NOT silently follow it
    val e2 = {
      val d0 = new FlakyReplica(logged())
      val rs4 = new ReplicatedCollectionStore(IndexedSeq(d0, logged()))
      rs4.upsertPoints("c", Seq(pt("2", 0.5f)))
      assert(rs4.logSize("c") === 2L) // bound to replica 0
      // replica 1 gets resynced (fresh lineage)...
      val dm = rs4.replicas(1)
      rs4.resyncReplica(1)
      // ...then the bound replica breaks
      d0.failReads = true
      intercept[IllegalStateException] { rs4.logSize("c") }
    }
    assert(e2.getMessage.contains("journal lineage"))
  }

  test("live reshard over replica-set members: migration write-alls, a broken replica never blocks it, replicas stay in sync") {
    val pts = (0 until 90).map(i => pt(f"$i%03d", (i % 9) / 9.0f, i % 4))
    def rset(own: Seq[Point], broken: Boolean) =
      new ReplicatedCollectionStore(IndexedSeq(
        if (broken) new FlakyReplica(mem(own: _*), failReads = true)
        else mem(own: _*),
        mem(own: _*)))
    val byShard2 = pts.groupBy(p =>
      ShardedCollectionStore.assignShard(p.id, 2))
    // shard 0 carries a read-broken replica THROUGHOUT the migration:
    // the leaver-id pass and the batch fetches must fail over, the
    // routed delete+upsert must write-all
    val sh = new ShardedCollectionStore(IndexedSeq(
      rset(byShard2.getOrElse(0, Nil), broken = true),
      rset(byShard2.getOrElse(1, Nil), broken = false)))
    val flat = mem(pts: _*)
    val spec9 = SearchSpec("v", Array(1.0, 0.1), "cosine", 9)
    val before = sh.searchPoints("c", spec9, withPayload = false, Nil)
      .map(t => (t._1.id, t._2))
    sh.reshard(Seq(rset(Nil, broken = false)))
    assert(sh.shardCount === 3)
    // placement invariant per shard, and BOTH replicas of each shard
    // hold identical post-migration state (write-all reached them both)
    sh.shards.zipWithIndex.foreach { case (s, i) =>
      val r = s.asInstanceOf[ReplicatedCollectionStore]
      val idSets = r.replicas.map {
        case f: FlakyReplica => ids(f.mem).toSet
        case o => ids(o).toSet
      }
      assert(idSets.distinct.size === 1, s"replicas diverged on shard $i")
      assert(idSets.head.forall(
        ShardedCollectionStore.assignShard(_, 3) == i),
        s"placement invariant broken on shard $i")
    }
    val after = sh.searchPoints("c", spec9, withPayload = false, Nil)
      .map(t => (t._1.id, t._2))
    assert(after === before)
    assert(after === flat.searchPoints("c", spec9, withPayload = false, Nil)
      .map(t => (t._1.id, t._2)))
    assert(sh.pointCount("c") === 90L)
  }

  test("cluster-wide optimize reaches replica sets (fans to alive replicas, skips dead)") {
    val flaky = new FlakyReplica(mem(pt("1", 0.9f)))
    val rset = new ReplicatedCollectionStore(
      IndexedSeq(flaky, mem(pt("1", 0.9f))))
    flaky.failWrites = true
    rset.upsertPoints("c", Seq(pt("2", 0.5f))) // marks replica 0 dead
    assert(rset.alive === IndexedSeq(false, true))
    val sh = new ShardedCollectionStore(IndexedSeq(rset))
    // before the StoreOptimize arm, this hit the remote-client trait's
    // refusing default and threw; now it fans to the alive replicas
    // (a no-op for in-memory ones) and serving continues
    sh.optimizeMembers(TestSpark.spark)
    assert(sh.pointCount("c") === 2L)
    assert(rset.alive === IndexedSeq(false, true)) // dead stays dead
  }

  test("sharded composition: replica sets as shard members — placement x replication") {
    val shard0 = new ReplicatedCollectionStore(IndexedSeq(
      new FlakyReplica(mem(), failReads = true), mem()))
    val shard1 = new ReplicatedCollectionStore(IndexedSeq(mem(), mem()))
    val sh = new ShardedCollectionStore(IndexedSeq(shard0, shard1))
    val pts = (1 to 12).map(i => pt(i.toString, i / 12.0f))
    sh.upsertPoints("c", pts)
    // every point lands on BOTH replicas of its owning shard
    assert(shard1.replicas.map(r => ids(r).toSet).distinct.size === 1)
    // reads through the topology survive shard0's broken replica
    assert(sh.pointCount("c") === 12L)
    assert(shard0.readFailovers.get() >= 1L)
    val got = sh.searchPoints("c", SearchSpec("v", Array(1.0, 0.0),
      "cosine", 12), withPayload = false, Nil)
    assert(got.map(_._1.id).toSet === pts.map(_.id).toSet)
  }

  test("DEEP nesting writes do not starve the scatter pool (caller-runs on nested fan-outs)") {
    // replicated-of-sharded-of-replicated: the outer write-all fans on
    // the shared pool, the inner sharded routing and the innermost
    // write-alls would ALSO submit-and-block on the same fixed pool —
    // with enough concurrent writers every worker could end up waiting
    // on a task no free worker exists to run (permanent deadlock). The
    // caller-runs fallback makes nested fan-outs run inline; this
    // hammers the shape with more writers than pool threads and must
    // complete with every point on every innermost replica.
    def innermost() = new ReplicatedCollectionStore(
      IndexedSeq(mem(), mem()))
    val towers = (0 until 6).map { _ =>
      val sh = new ShardedCollectionStore(
        IndexedSeq(innermost(), innermost()))
      new ReplicatedCollectionStore(IndexedSeq(sh))
    }
    val threads = towers.zipWithIndex.map { case (t, i) =>
      new Thread(() => {
        (0 until 4).foreach { b =>
          t.upsertPoints("c",
            (0 until 8).map(j => pt(s"w$i-$b-$j", (j + 1) / 8.0f)))
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    assert(threads.forall(!_.isAlive), "a nested write deadlocked")
    towers.zipWithIndex.foreach { case (t, i) =>
      assert(t.pointCount("c") === 32L, s"tower $i lost writes")
      // every innermost replica holds the full slice of its shard
      t.replicas.head.asInstanceOf[ShardedCollectionStore].shards
        .foreach { s0 =>
          val rs = s0.asInstanceOf[ReplicatedCollectionStore].replicas
          assert(rs.map(r => ids(r).toSet).distinct.size === 1)
        }
    }
  }
}
