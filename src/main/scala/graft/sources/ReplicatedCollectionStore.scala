package graft.sources

import java.util.concurrent.atomic.AtomicLong

import graft.collections.CollectionDescriptor

/** qdrant's REPLICA-SET model at the store seam (the backend's
  * `replication_factor`: every shard is a set of interchangeable
  * replicas — /root/reference/tests/bin/config.yaml keys the backend's
  * collection config; replication is the availability half the sharded
  * wrapper's placement half composes with).
  *
  * Semantics — write-all / distributed read, with an explicit replica
  * lifecycle, the published replica-state machine (Active/Dead/resync):
  *
  *   - READS distribute ROUND-ROBIN over alive replicas, so N replicas
  *     buy ~N× read throughput (the point of replicating a hot
  *     collection). A TRANSPORT failure (IOException family —
  *     connection refused, reset, EOF) fails over to the next alive
  *     replica and marks the broken one SUSPECT: the rotation skips it
  *     (one failed probe per outage, not one per query) until every
  *     non-suspect candidate fails — then suspects are re-probed, so a
  *     healed transport re-enters rotation by itself. Semantic errors
  *     (bad arguments, unknown collections) never fail over — they
  *     would be identical on every replica and hiding them masks caller
  *     bugs.
  *   - READ CONSISTENCY (`readConsistency = N`, the backend's
  *     `read_consistency` dial): point/search/count/facet reads gather
  *     answers from N distinct alive replicas and return the MAJORITY
  *     value (ties → the rotation's first answer), so a stale replica
  *     that somehow re-entered rotation is outvoted instead of served.
  *     Gathering degrades to however many alive replicas exist (the
  *     set's answer beats no answer). Paging/iterator reads
  *     (`queryPoints`, `logEntries`) stay read-one — a quorum over
  *     unbounded streams would buffer them whole.
  *   - WRITES apply to EVERY alive replica (write-all). A replica whose
  *     write fails on TRANSPORT is marked DEAD: it stops serving reads
  *     and receiving writes — it is STALE by construction — until
  *     [[resyncReplica]] copies the current state back from an alive
  *     replica and re-activates it (the backend's snapshot-transfer
  *     recovery). A SEMANTIC rejection is classified after the loop:
  *     if NO replica applied, the error simply rethrows (state
  *     untouched — the caller-bug case); if some replicas applied and
  *     others rejected, the appliers' state COMMITS, the rejecting
  *     replicas are dead-marked (they diverged), and the error then
  *     rethrows — partial application is never silently dropped.
  *     The write succeeds if at least one replica applied it.
  *   - LIFECYCLE verbs (compact/optimize/snapshot) fan to alive
  *     replicas; truncate is a write (all alive).
  *
  * CDC: the journal surface (`logSize`/`logStart`/`logEntries`) BINDS
  * to one replica on first use and follows it (never round-robins —
  * in-sync replicas carry identical journals, but a RESYNCED replica's
  * journal is a truncate+bulk rewrite). Every resync stamps the target
  * with a fresh journal EPOCH; if the bound replica is resynced under
  * a reader, or fails with no same-epoch alive replica to move to, the
  * journal read throws [[IllegalStateException]] — a streaming reader
  * either resumes exactly-once (same-lineage failover) or fails loudly,
  * never silently mixes journals.
  *
  * Composition: the wrapper IS a [[RemoteCollectionClient]], so it sits
  * anywhere a sharded member sits — `ShardedCollectionStore(replicated
  * members)` is the full production topology (placement × replication)
  * with zero extra wiring (`applyUpsert` dispatches on the trait).
  *
  * Scale shape: replication multiplies WRITE work by the replica count
  * (inherent to write-all) but write LATENCY is one replica's cost —
  * the per-replica applies fan out concurrently over the shared
  * scatter pool (max, not sum; wire round trips overlap). Read
  * THROUGHPUT multiplies by the alive count, read latency stays at one
  * replica's cost (quorum reads pay N answers for divergence masking —
  * the dial is per-store).
  * Failover adds one failed probe per down replica per outage. Resync
  * streams every collection once in `resyncBatch`-sized pages —
  * O(batch) points resident, never the corpus.
  *
  * Freshness iterators: failover covers the CALL; a transport failure
  * MID-STREAM (while the caller drains a `queryPoints` iterator)
  * propagates — the page-level retry belongs to the caller that owns
  * the paging loop.
  *
  * Consistency: writes are serialized (one writer at a time through the
  * wrapper) but a concurrent READ can land between a write's
  * per-replica applies — two reads racing one write may observe
  * different replicas mid-apply (eventual read consistency, the
  * backend's default `read_consistency` level; raise the dial to mask
  * it). Once the write returns, every alive replica holds it.
  */
final class ReplicatedCollectionStore(
    initial: IndexedSeq[CollectionStore],
    resyncBatch: Int = 4096,
    readConsistency: Int = 1)
    extends CollectionStore with RemoteCollectionClient {
  require(initial.nonEmpty, "a replica set needs at least one replica")
  require(resyncBatch > 0, s"resyncBatch must be positive, got $resyncBatch")
  require(readConsistency >= 1 && readConsistency <= initial.length,
    s"readConsistency must be in [1, ${initial.length}], got $readConsistency")

  // COW members: in-memory/parquet replicas return NEW stores from
  // mutations (the sharded wrapper's member discipline) — the array is
  // the single published view
  @volatile private var reps: IndexedSeq[CollectionStore] = initial
  @volatile private var aliveFlags: IndexedSeq[Boolean] =
    initial.map(_ => true)
  // read-side suspicion: a replica whose READ transport failed is
  // skipped by the rotation until every non-suspect candidate fails
  // (self-healing re-probe) or a resync clears it. An ATOMIC array, not
  // a copied-on-write Seq: unsynchronized read paths flip these flags
  // concurrently, and a lost update would violate the documented
  // one-failed-probe-per-outage property (or clear another thread's
  // fresh suspicion).
  private val suspectFlags =
    new java.util.concurrent.atomic.AtomicIntegerArray(initial.length)
  private def suspect(i: Int): Boolean = suspectFlags.get(i) == 1
  private val rotation = new AtomicLong(0L)

  // journal lineage: all original replicas share epoch 0 (identical
  // journals — every routed write in the same order); each resync
  // stamps a UNIQUE epoch (its journal was rewritten)
  @volatile private var journalEpochs: IndexedSeq[Long] =
    initial.map(_ => 0L)
  private val epochCounter = new AtomicLong(0L)
  @volatile private var cdcBound: Int = -1
  @volatile private var cdcBoundEpoch: Long = 0L

  /** Read calls that failed over past a broken replica (specs). */
  val readFailovers = new AtomicLong(0L)

  /** Replicas marked dead by a failed write (specs). */
  val deadMarks = new AtomicLong(0L)

  /** Reads served per replica (specs — proves rotation distributes). */
  val readsServed: IndexedSeq[AtomicLong] = initial.map(_ => new AtomicLong(0L))

  /** Alive flags, replica-indexed (specs/operators). */
  def alive: IndexedSeq[Boolean] = aliveFlags

  /** The current replica stores (specs — e.g. comparing post-resync
    * state replica by replica).
    */
  def replicas: IndexedSeq[CollectionStore] = reps

  /** Transport failures fail over; anything else is the caller's. */
  private def recoverable(e: Throwable): Boolean = e match {
    case _: java.io.IOException => true
    case _: java.io.UncheckedIOException => true
    case _ if e.getCause != null && e.getCause != e =>
      recoverable(e.getCause)
    case _ => false
  }

  private def attempt[T](rs: IndexedSeq[CollectionStore], idx: Int,
                         f: CollectionStore => T): Option[T] =
    try {
      val out = f(rs(idx))
      readsServed(idx).incrementAndGet(): Unit
      suspectFlags.set(idx, 0)
      Some(out)
    } catch {
      case e: Throwable if recoverable(e) =>
        readFailovers.incrementAndGet(): Unit
        suspectFlags.set(idx, 1)
        lastReadError = e
        None
    }

  // last transport error observed by a read path (error context only)
  @volatile private var lastReadError: Throwable = null

  private def readOne[T](f: CollectionStore => T): T = {
    val rs = reps
    val ok = aliveFlags
    val n = rs.length
    val start = (rotation.getAndIncrement() % n).toInt
    // snapshot the suspicion ONCE so both passes partition the same view
    // (a concurrent flip cannot make a replica probed twice or skipped
    // in both passes)
    val sus = IndexedSeq.tabulate(n)(suspect)
    var i = 0
    while (i < n) { // pass 1: alive, not suspect, rotation order
      val idx = (start + i) % n
      if (ok(idx) && !sus(idx)) attempt(rs, idx, f) match {
        case Some(v) => return v
        case None =>
      }
      i += 1
    }
    i = 0
    while (i < n) { // pass 2: re-probe suspects (heal or confirm)
      val idx = (start + i) % n
      if (ok(idx) && sus(idx)) attempt(rs, idx, f) match {
        case Some(v) => return v
        case None =>
      }
      i += 1
    }
    throw new IllegalStateException(
      s"no alive replica could serve the read (${n} replicas)",
      lastReadError)
  }

  /** Arrays compare by reference — canonicalize to Seqs so two
    * replicas' equal answers GROUP equal under the quorum vote.
    */
  private def canonical(v: Any): Any = v match {
    case a: Array[_] => a.toSeq.map(canonical)
    case s: Seq[_] => s.map(canonical)
    case m: Map[_, _] =>
      m.map { case (k, x) => (canonical(k), canonical(x)) }
    case p: Point => (p.id, p.payload, canonical(p.dense),
      canonical(p.sparse), canonical(p.multi))
    case (a, b) => (canonical(a), canonical(b))
    case o: Option[_] => o.map(canonical)
    case other => other
  }

  /** Quorum read: gather `readConsistency` answers from distinct alive
    * replicas (non-suspects first, rotation order), majority by value.
    */
  private def readN[T](f: CollectionStore => T): T = {
    if (readConsistency <= 1) return readOne(f)
    val rs = reps
    val ok = aliveFlags
    val n = rs.length
    val sus = IndexedSeq.tabulate(n)(suspect)
    val start = (rotation.getAndIncrement() % n).toInt
    val order = (0 until n).map(i => (start + i) % n)
    val candidates = order.filter(i => ok(i) && !sus(i)) ++
      order.filter(i => ok(i) && sus(i))
    val answers = scala.collection.mutable.ArrayBuffer.empty[T]
    val it = candidates.iterator
    while (answers.size < readConsistency && it.hasNext) {
      attempt(rs, it.next(), f).foreach(answers += _)
    }
    if (answers.isEmpty)
      throw new IllegalStateException(
        s"no alive replica could serve the read (${n} replicas)",
        lastReadError)
    // majority by canonical value; ties -> the earliest-gathered group
    // (the rotation's first healthy answer)
    answers.zipWithIndex.groupBy(t => canonical(t._1)).values
      .minBy(g => (-g.size, g.map(_._2).min))
      .minBy(_._2)._1
  }

  /** Apply `f` to every alive replica — CONCURRENTLY, over the shared
    * scatter pool (the sharded wrapper's fan-out discipline): write
    * latency is the MAX of the member applies, not their sum — for wire
    * replicas this parallelizes the network round trips the topology
    * probe measured as exactly r× serialized cost. Writes stay
    * serialized THROUGH the wrapper (one writer at a time — the
    * synchronized publish of the COW member array); only the
    * per-replica applies of ONE write overlap. Transport failures mark
    * the replica DEAD and the write continues; semantic rejections are
    * classified AFTER the fan-in (see class docs). Throws if NO replica
    * applied.
    */
  private def writeAll(f: CollectionStore => CollectionStore): Unit =
    synchronized {
      var rs = reps
      var ok = aliveFlags
      val n = rs.length
      val results = new Array[Either[Throwable, CollectionStore]](n)
      val live = (0 until n).filter(ok(_))
      if (live.length <= 1 || ShardedCollectionStore.onScatterThread) {
        // no fan-out to pay for (single replica) — or the caller IS a
        // scatter-pool worker (this wrapper is a member of an outer
        // fan-out): submit-and-blocking on the pool we occupy can
        // exhaust it and deadlock permanently under nested topologies,
        // so apply sequentially on the caller thread instead
        live.foreach { i =>
          results(i) = try Right(f(rs(i)))
          catch { case e: Throwable => Left(e) }
        }
      } else {
        val tasks = live.map { i =>
          ShardedCollectionStore.scatterPool.submit(
            new java.util.concurrent.Callable[Unit] {
              def call(): Unit =
                results(i) = try Right(f(rs(i)))
                catch { case e: Throwable => Left(e) }
            })
        }
        tasks.foreach(_.get())
      }
      var applied = 0
      var transportLast: Throwable = null
      var semanticFirst: Throwable = null
      var semanticIdx: List[Int] = Nil
      var i = 0
      while (i < n) {
        if (ok(i)) results(i) match {
          case Right(s) =>
            rs = rs.updated(i, s)
            applied += 1
          case Left(e) if recoverable(e) =>
            ok = ok.updated(i, false)
            deadMarks.incrementAndGet(): Unit
            transportLast = e
          case Left(e) =>
            if (semanticFirst == null) semanticFirst = e
            semanticIdx ::= i
        }
        i += 1
      }
      if (applied > 0 && semanticIdx.nonEmpty) {
        // replicas that rejected a write their peers applied are
        // DIVERGED — stale by construction, dead until resync
        semanticIdx.foreach { j =>
          ok = ok.updated(j, false)
          deadMarks.incrementAndGet(): Unit
        }
      }
      reps = rs
      aliveFlags = ok
      if (applied == 0) {
        if (semanticFirst != null) throw semanticFirst
        throw new IllegalStateException(
          "write applied to no replica — the whole set is down",
          transportLast)
      }
      if (semanticFirst != null) throw semanticFirst
    }

  /** Copy the CURRENT state of EVERY collection onto replica `i` from
    * the first alive replica and re-activate it: per collection,
    * truncate then re-upsert the corpus in `resyncBatch`-sized pages —
    * the backend's snapshot-transfer recovery. A replica re-enters
    * rotation only FULLY synced (a dead replica of a multi-collection
    * store missed writes to every collection, not just one). The
    * resynced replica's journals restart (truncate + bulk), so it is
    * stamped with a fresh journal epoch — CDC readers bound to another
    * lineage never silently follow it (see class docs).
    */
  def resyncReplica(i: Int): Unit = synchronized {
    require(i >= 0 && i < reps.length, s"no replica $i")
    val srcIdx = (0 until reps.length)
      .find(j => j != i && aliveFlags(j))
      .getOrElse(throw new IllegalStateException(
        "no alive source replica to resync from"))
    val src = reps(srcIdx)
    var target = reps(i)
    src.collectionNames.foreach { collection =>
      target = ShardedCollectionStore.applyTruncate(target, collection)
      val total = src.pointCount(collection)
      var from = 0L
      while (from < total) {
        val until = math.min(from + resyncBatch, total)
        val page = src.queryPoints(collection, from, until,
          withPayload = true,
          vectorFields = src.collectionInfo(collection).fields.map(_.name),
          limit = None).toIndexedSeq
        if (page.nonEmpty)
          target = ShardedCollectionStore.applyUpsert(target, collection,
            page)
        from = until
      }
    }
    reps = reps.updated(i, target)
    aliveFlags = aliveFlags.updated(i, true)
    suspectFlags.set(i, 0)
    journalEpochs = journalEpochs.updated(i, epochCounter.incrementAndGet())
  }

  /** Legacy signature — a replica re-enters rotation only fully
    * synced, so this resyncs EVERY collection regardless of which one
    * the caller named (the single-collection form re-activated a
    * replica that was stale for its OTHER collections).
    */
  def resyncReplica(collection: String, i: Int): Unit = resyncReplica(i)

  /** Journal read bound to ONE replica's lineage (see class docs):
    * binds on first use, follows the bound replica, fails over only to
    * an alive replica of the SAME journal epoch, and throws when the
    * lineage the reader follows was rewritten (resync) with no
    * same-epoch survivor.
    */
  private def journalRead[T](f: CollectionStore => T): T = synchronized {
    val rs = reps
    val ok = aliveFlags
    if (cdcBound < 0) {
      val idx = (0 until rs.length).find(ok(_)).getOrElse(
        throw new IllegalStateException(
          s"no alive replica could serve the journal (${rs.length} replicas)"))
      cdcBound = idx
      cdcBoundEpoch = journalEpochs(idx)
    }
    if (journalEpochs(cdcBound) != cdcBoundEpoch)
      throw new IllegalStateException(
        s"journal lineage changed: replica $cdcBound was resynced under " +
          "a CDC reader (its journal is a truncate+bulk rewrite); " +
          "restart the stream from a fresh snapshot")
    if (ok(cdcBound)) {
      try {
        val out = f(rs(cdcBound))
        readsServed(cdcBound).incrementAndGet(): Unit
        return out
      } catch {
        case e: Throwable if recoverable(e) =>
          readFailovers.incrementAndGet(): Unit
          lastReadError = e
      }
    }
    // the bound replica is dead or broken: move the binding, but ONLY
    // onto the same journal lineage — an in-sync peer resumes the
    // reader exactly-once; a resynced peer would silently rewind it
    (0 until rs.length).find(j => j != cdcBound && ok(j) &&
        journalEpochs(j) == cdcBoundEpoch) match {
      case Some(j) =>
        cdcBound = j
        val out = f(rs(j))
        readsServed(j).incrementAndGet(): Unit
        out
      case None =>
        throw new IllegalStateException(
          s"no alive replica carries the journal lineage the CDC reader " +
            "follows (resync rewrote it); restart the stream from a " +
            "fresh snapshot", lastReadError)
    }
  }

  // ------------------------------------------------------------ reads --

  override def collectionInfo(c: String): CollectionDescriptor =
    readOne(_.collectionInfo(c))
  override def pointCount(c: String): Long = readN(_.pointCount(c))
  override def collectionNames: Seq[String] = readOne(_.collectionNames)

  override def queryPoints(c: String, from: Long, until: Long,
                           withPayload: Boolean, vectorFields: Seq[String],
                           limit: Option[Int],
                           idFilter: Option[Set[String]] = None,
                           idLower: Option[String] = None): Iterator[Point] =
    readOne(_.queryPoints(c, from, until, withPayload, vectorFields, limit,
      idFilter, idLower))

  override def queryPointsFiltered(c: String, from: Long, until: Long,
                                   withPayload: Boolean,
                                   vectorFields: Seq[String],
                                   limit: Option[Int],
                                   idFilter: Option[Set[String]] = None,
                                   idLower: Option[String] = None,
                                   pfilter: PayloadFilter = PayloadFilter.Empty): Iterator[Point] =
    readOne(_.queryPointsFiltered(c, from, until, withPayload, vectorFields,
      limit, idFilter, idLower, pfilter))

  override def countMatching(c: String,
                             idFilter: Option[Set[String]] = None,
                             idLower: Option[String] = None): Long =
    readN(_.countMatching(c, idFilter, idLower))

  override def countMatchingFiltered(c: String,
                                     idFilter: Option[Set[String]] = None,
                                     idLower: Option[String] = None,
                                     pfilter: PayloadFilter = PayloadFilter.Empty): Long =
    readN(_.countMatchingFiltered(c, idFilter, idLower, pfilter))

  override def searchPoints(c: String, spec: SearchSpec,
                            withPayload: Boolean,
                            vectorFields: Seq[String]): Seq[(Point, Double)] =
    readN(_.searchPoints(c, spec, withPayload, vectorFields))

  override def searchPointsFiltered(c: String, spec: SearchSpec,
                                    withPayload: Boolean,
                                    vectorFields: Seq[String],
                                    pfilter: PayloadFilter): Seq[(Point, Double)] =
    readN(_.searchPointsFiltered(c, spec, withPayload, vectorFields,
      pfilter))

  override def facetCounts(c: String, key: String, limit: Int,
                           pfilter: PayloadFilter = PayloadFilter.Empty): Seq[(String, Long)] =
    readN(_.facetCounts(c, key, limit, pfilter))

  override def facetCountsFor(c: String, key: String, values: Set[String],
                              pfilter: PayloadFilter = PayloadFilter.Empty): Map[String, Long] =
    readN(_.facetCountsFor(c, key, values, pfilter))

  override def searchTextRanked(c: String, key: String, terms: Seq[String],
                                k: Int, k1: Double = 1.2,
                                b: Double = 0.75): Seq[(String, Double)] =
    readN(_.searchTextRanked(c, key, terms, k, k1, b))

  override def textRankPartials(c: String, key: String,
                                terms: Seq[String]): TextRankPartials =
    readOne(_.textRankPartials(c, key, terms))

  override def textRankStats(c: String, key: String,
                             terms: Seq[String]): TextRankStats =
    readOne(_.textRankStats(c, key, terms))

  override def textRankTopK(c: String, key: String, terms: Seq[String],
                            k: Int, global: TextRankStats,
                            k1: Double = 1.2,
                            b: Double = 0.75): Seq[(String, Double)] =
    readOne(_.textRankTopK(c, key, terms, k, global, k1, b))

  override def logSize(c: String): Long = journalRead(_.logSize(c))
  override def logStart(c: String): Long = journalRead(_.logStart(c))
  override def logEntries(c: String, from: Long,
                          until: Long): Iterator[LogEntry] =
    journalRead(_.logEntries(c, from, until))

  // ----------------------------------------------------------- writes --

  override def upsertPoints(c: String, pts: Seq[Point]): Unit =
    writeAll(s => ShardedCollectionStore.applyUpsert(s, c,
      pts.toIndexedSeq))

  override def deletePoints(c: String, ids: Set[String]): Unit =
    writeAll(s => ShardedCollectionStore.applyDelete(s, c, ids))

  override def truncate(c: String): Unit =
    writeAll(s => ShardedCollectionStore.applyTruncate(s, c))

  override def compact(c: String, upTo: Long): Unit =
    writeAll { s =>
      s match {
        case r: RemoteCollectionClient => r.compact(c, upTo); r
        case p: ParquetCollectionStore => p.compacted(c, upTo)
        case m: InMemoryCollectionStore => m.compacted(c, upTo)
        case other => throw new UnsupportedOperationException(
          s"replica ${other.getClass.getName} keeps no compactable log")
      }
    }

  /** Optimize every alive replica (each reseals its OWN sidecars; wire
    * replicas receive the verb). Needs the service Spark session for
    * local lakehouse replicas — the same contract as
    * [[ShardedCollectionStore.optimizeMembers]].
    */
  def optimizeReplicas(spark: org.apache.spark.sql.SparkSession,
                       ivfMaxIter: Int = 0): Unit = synchronized {
    reps = reps.zipWithIndex.map { case (s, i) =>
      if (aliveFlags(i)) StoreOptimize(s, spark, ivfMaxIter) else s
    }
  }
}
