package graft.sources

import java.util.concurrent.atomic.AtomicLong

import graft.collections.CollectionDescriptor

/** qdrant's REPLICA-SET model at the store seam (the backend's
  * `replication_factor`: every shard is a set of interchangeable
  * replicas — /root/reference/tests/bin/config.yaml keys the backend's
  * collection config; replication is the availability half the sharded
  * wrapper's placement half composes with).
  *
  * Semantics — write-all / read-one, with an explicit replica
  * lifecycle, the published replica-state machine (Active/Dead/resync):
  *
  *   - READS serve from ONE alive replica. The preferred index is
  *     sticky; a TRANSPORT failure (IOException family — connection
  *     refused, reset, EOF) fails over to the next alive replica and
  *     moves the preference there, so a down node costs one probe once,
  *     not per query. Semantic errors (bad arguments, unknown
  *     collections) never fail over — they would be identical on every
  *     replica and hiding them masks caller bugs.
  *   - WRITES apply to EVERY alive replica (write-all). A replica whose
  *     write fails is marked DEAD: it stops serving reads and receiving
  *     writes — it is STALE by construction — until [[resyncReplica]]
  *     copies the current state back from an alive replica and
  *     re-activates it (the backend's snapshot-transfer recovery).
  *     The write succeeds if at least one replica applied it.
  *   - LIFECYCLE verbs (compact/optimize/snapshot) fan to alive
  *     replicas; truncate is a write (all alive).
  *
  * Composition: the wrapper IS a [[RemoteCollectionClient]], so it sits
  * anywhere a sharded member sits — `ShardedCollectionStore(replicated
  * members)` is the full production topology (placement × replication)
  * with zero extra wiring (`applyUpsert` dispatches on the trait).
  *
  * Scale shape: replication multiplies WRITE work by the replica count
  * (inherent to write-all) and leaves read latency at one replica's
  * cost. Failover adds one failed probe per down replica per
  * preference move. Resync streams the corpus once in
  * `resyncBatch`-sized pages — O(batch) points resident, never the
  * corpus.
  *
  * CDC caveat: the journal surface (`logSize`/`logEntries`) serves from
  * the preferred alive replica. In-sync replicas carry identical
  * journals (same routed writes in the same order); a RESYNCED replica
  * carries a truncate+bulk journal instead (the transfer reset its
  * local history, exactly like the backend's snapshot recovery) — CDC
  * readers should follow one replica's journal, not mix them.
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
  * backend's default `read_consistency` level). Once the write returns,
  * every alive replica holds it.
  */
final class ReplicatedCollectionStore(
    initial: IndexedSeq[CollectionStore],
    resyncBatch: Int = 4096)
    extends CollectionStore with RemoteCollectionClient {
  require(initial.nonEmpty, "a replica set needs at least one replica")
  require(resyncBatch > 0, s"resyncBatch must be positive, got $resyncBatch")

  // COW members: in-memory/parquet replicas return NEW stores from
  // mutations (the sharded wrapper's member discipline) — the array is
  // the single published view
  @volatile private var reps: IndexedSeq[CollectionStore] = initial
  @volatile private var aliveFlags: IndexedSeq[Boolean] =
    initial.map(_ => true)
  @volatile private var preferred: Int = 0

  /** Read calls that failed over past a broken replica (specs). */
  val readFailovers = new AtomicLong(0L)

  /** Replicas marked dead by a failed write (specs). */
  val deadMarks = new AtomicLong(0L)

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

  private def readOne[T](f: CollectionStore => T): T = {
    val rs = reps
    val ok = aliveFlags
    val n = rs.length
    val start = preferred
    var i = 0
    var last: Throwable = null
    while (i < n) {
      val idx = (start + i) % n
      if (ok(idx)) {
        try {
          val out = f(rs(idx))
          if (idx != start) preferred = idx
          return out
        } catch {
          case e: Throwable if recoverable(e) =>
            readFailovers.incrementAndGet(): Unit
            last = e
        }
      }
      i += 1
    }
    throw new IllegalStateException(
      s"no alive replica could serve the read (${n} replicas)", last)
  }

  /** Apply `f` to every alive replica; a transport failure marks that
    * replica DEAD and the write continues. Throws if NO replica
    * applied.
    */
  private def writeAll(f: CollectionStore => CollectionStore): Unit =
    synchronized {
      var rs = reps
      var ok = aliveFlags
      var applied = 0
      var last: Throwable = null
      var i = 0
      while (i < rs.length) {
        if (ok(i)) {
          try {
            rs = rs.updated(i, f(rs(i)))
            applied += 1
          } catch {
            case e: Throwable if recoverable(e) =>
              ok = ok.updated(i, false)
              deadMarks.incrementAndGet(): Unit
              last = e
          }
        }
        i += 1
      }
      reps = rs
      aliveFlags = ok
      if (applied == 0)
        throw new IllegalStateException(
          "write applied to no replica — the whole set is down", last)
    }

  /** Copy the CURRENT state onto replica `i` from the preferred alive
    * replica and re-activate it: truncate, then re-upsert the corpus in
    * `resyncBatch`-sized pages — the backend's snapshot-transfer
    * recovery. The resynced replica's journal restarts (truncate +
    * bulk), see the CDC caveat above.
    */
  def resyncReplica(collection: String, i: Int): Unit = synchronized {
    require(i >= 0 && i < reps.length, s"no replica $i")
    val srcIdx = (preferred until preferred + reps.length)
      .map(_ % reps.length)
      .find(j => j != i && aliveFlags(j))
      .getOrElse(throw new IllegalStateException(
        "no alive source replica to resync from"))
    val src = reps(srcIdx)
    var target = ShardedCollectionStore.applyTruncate(reps(i), collection)
    val total = src.pointCount(collection)
    var from = 0L
    while (from < total) {
      val until = math.min(from + resyncBatch, total)
      val page = src.queryPoints(collection, from, until,
        withPayload = true,
        vectorFields = src.collectionInfo(collection).fields.map(_.name),
        limit = None).toIndexedSeq
      if (page.nonEmpty)
        target = ShardedCollectionStore.applyUpsert(target, collection, page)
      from = until
    }
    reps = reps.updated(i, target)
    aliveFlags = aliveFlags.updated(i, true)
  }

  // ------------------------------------------------------------ reads --

  override def collectionInfo(c: String): CollectionDescriptor =
    readOne(_.collectionInfo(c))
  override def pointCount(c: String): Long = readOne(_.pointCount(c))
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
    readOne(_.countMatching(c, idFilter, idLower))

  override def countMatchingFiltered(c: String,
                                     idFilter: Option[Set[String]] = None,
                                     idLower: Option[String] = None,
                                     pfilter: PayloadFilter = PayloadFilter.Empty): Long =
    readOne(_.countMatchingFiltered(c, idFilter, idLower, pfilter))

  override def searchPoints(c: String, spec: SearchSpec,
                            withPayload: Boolean,
                            vectorFields: Seq[String]): Seq[(Point, Double)] =
    readOne(_.searchPoints(c, spec, withPayload, vectorFields))

  override def searchPointsFiltered(c: String, spec: SearchSpec,
                                    withPayload: Boolean,
                                    vectorFields: Seq[String],
                                    pfilter: PayloadFilter): Seq[(Point, Double)] =
    readOne(_.searchPointsFiltered(c, spec, withPayload, vectorFields,
      pfilter))

  override def facetCounts(c: String, key: String, limit: Int,
                           pfilter: PayloadFilter = PayloadFilter.Empty): Seq[(String, Long)] =
    readOne(_.facetCounts(c, key, limit, pfilter))

  override def facetCountsFor(c: String, key: String, values: Set[String],
                              pfilter: PayloadFilter = PayloadFilter.Empty): Map[String, Long] =
    readOne(_.facetCountsFor(c, key, values, pfilter))

  override def searchTextRanked(c: String, key: String, terms: Seq[String],
                                k: Int, k1: Double = 1.2,
                                b: Double = 0.75): Seq[(String, Double)] =
    readOne(_.searchTextRanked(c, key, terms, k, k1, b))

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

  override def logSize(c: String): Long = readOne(_.logSize(c))
  override def logStart(c: String): Long = readOne(_.logStart(c))
  override def logEntries(c: String, from: Long,
                          until: Long): Iterator[LogEntry] =
    readOne(_.logEntries(c, from, until))

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
