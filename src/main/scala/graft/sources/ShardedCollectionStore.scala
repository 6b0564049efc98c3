package graft.sources

import graft.collections.CollectionDescriptor

/** SCATTER-GATHER serving over N member stores — the distribution layer
  * the reference delegates to its backend's sharded cluster (the crate's
  * scan points at one node, /root/reference/src/table.rs:82-86; the
  * backend itself shards collections and merges per-shard result pages).
  * Here the same architecture over any mix of [[CollectionStore]]
  * backends: in-memory, parquet-lakehouse, or wire clients — one shard
  * may be a [[GrpcCollectionStore]] dialing a remote node while another
  * is a local [[ParquetCollectionStore]]; the wrapper neither knows nor
  * cares.
  *
  * PLACEMENT INVARIANT: point `id` lives on shard [[shardOf]]`(id)` —
  * rendezvous (highest-random-weight) hashing, the scalar twin of
  * [[graft.ops.Pipeline.rendezvousAssign]] (bit-identical assignment, so
  * a corpus sharded by the DataFrame op serves correctly here, and
  * growing N -> N+1 moves only ~1/(N+1) of the points). Writes through
  * this store route by that hash; stores seeded externally must have
  * been placed the same way ([[ShardedCollectionStore.assignShard]] is
  * the seeding-side helper).
  *
  * Query semantics are provably those of the unsharded store:
  *  - scroll/scan: global enumeration = shard 0's points, then shard
  *    1's, ... — a positional window [from, until) maps through prefix
  *    sums to AT MOST the overlapping shards, each serving its LOCAL
  *    window positionally, so per-shard scan volume is its own slice
  *    (corpus/N under balanced placement), never the whole corpus.
  *  - id-set fetch: each id ships ONLY to its owning shard (the
  *    placement invariant makes this a routing decision, not a filter) —
  *    a point lookup touches 1 shard however many exist.
  *  - pushed top-k: fan out `k + offset` to every shard, merge the
  *    per-shard pages best-first (score order, id tiebreak — the exact
  *    comparator of [[CollectionStore.searchPointsFiltered]]), drop
  *    `offset`, cut to `k`. Equal to the unsharded result because each
  *    shard's local top-(k+offset) is a superset of its members of the
  *    global top-(k+offset) (pinned in ShardedCollectionStoreSpec).
  *  - counts sum; facets merge per-shard EXACT histograms by value then
  *    cut to the limit (a per-shard top-`limit` could miss a value
  *    placing in every shard but topping none).
  *  - CDC: the global log is the journal of routed mutation batches —
  *    each batch appends its per-shard segments (shard order within a
  *    batch), so global positions are immutable under appends and an
  *    id's entries replay in their shard-local (= per-id causal) order.
  */
final class ShardedCollectionStore(shards0: IndexedSeq[CollectionStore])
    extends CollectionStore with RemoteCollectionClient {
  require(shards0.nonEmpty, "sharded store needs at least one shard")

  import ShardedCollectionStore.ShardSeg

  /** Current member stores (COW members like the parquet/in-memory
    * backends are REPLACED on mutation; volatile publishes the swap to
    * concurrently reading executors in local mode).
    */
  @volatile private var members: IndexedSeq[CollectionStore] = shards0

  /** The routed-mutation journal: global log order = these segments in
    * append order. Seeded from the members' EXISTING logs (concatenation
    * in shard order — the pre-wrap ingest), then one run of segments per
    * routed batch. Immutable prefix: appends only.
    */
  @volatile private var journal: IndexedSeq[ShardSeg] = {
    val segs = IndexedSeq.newBuilder[ShardSeg]
    var g = 0L
    shards0.zipWithIndex.foreach { case (s, i) =>
      val n = try {
        s.collectionNames.headOption.map(c => s.logSize(c)).getOrElse(0L)
      } catch { case _: UnsupportedOperationException => -1L }
      if (n > 0L) { segs += ShardSeg(i, 0L, n, g); g += n }
      else if (n < 0L) segs.clear() // any log-less member: no global log
    }
    segs.result()
  }

  def shardCount: Int = members.length

  /** Snapshot of the member stores (counter inspection in specs/probes). */
  def shards: IndexedSeq[CollectionStore] = members

  /** Owning shard of `id` — rendezvous hash, bit-identical to
    * [[graft.ops.Pipeline.rendezvousAssign]]: argmax over shards of
    * md5(s"$id#$i") compared as lowercase hex strings (ASCII order =
    * Spark's string order on hex).
    */
  def shardOf(id: String): Int = ShardedCollectionStore.assignShard(id, members.length)

  /** Fan a per-member call out CONCURRENTLY (the real scatter-gather:
    * shards are independent stores/nodes, so fan-out latency is the
    * slowest shard, not the sum — the property the single-JVM probe
    * cannot show serially). Results return in member order, so every
    * merge stays deterministic; failures rethrow their cause. One
    * member short-circuits to a direct call.
    */
  private def fanOut[T](ms: IndexedSeq[CollectionStore])(
      f: CollectionStore => T): IndexedSeq[T] =
    if (ms.length == 1) IndexedSeq(f(ms.head))
    else {
      val fs = ms.map(m => ShardedCollectionStore.scatterPool.submit(
        new java.util.concurrent.Callable[T] { def call(): T = f(m) }))
      fs.map(fut =>
        try fut.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        })
    }

  // ---------------------------------------------------------------- reads

  override def collectionInfo(collection: String): CollectionDescriptor =
    members.head.collectionInfo(collection)

  override def collectionNames: Seq[String] =
    members.flatMap(_.collectionNames).distinct

  override def pointCount(collection: String): Long =
    members.map(_.pointCount(collection)).sum

  /** Per-shard slices of the GLOBAL positional window [from, until):
    * (shard, localFrom, localUntil) for exactly the overlapping shards.
    */
  private def windowSlices(collection: String, from: Long, until: Long,
                           ms: IndexedSeq[CollectionStore]): Seq[(Int, Long, Long)] = {
    val out = Seq.newBuilder[(Int, Long, Long)]
    var base = 0L
    var i = 0
    while (i < ms.length && base < until) {
      val n = ms(i).pointCount(collection)
      val lo = math.max(from - base, 0L)
      val hi = math.min(until - base, n)
      if (lo < hi) out += ((i, lo, hi))
      base += n
      i += 1
    }
    out.result()
  }

  /** Route an id set to its owning shards — the placement invariant as a
    * read optimization: shard i receives ONLY the ids it owns (None for
    * shards owning none, which are then skipped entirely).
    */
  private def routeIds(ids: Set[String], n: Int): Map[Int, Set[String]] =
    ids.groupBy(id => ShardedCollectionStore.assignShard(id, n))

  override def queryPoints(collection: String, from: Long, until: Long,
                           withPayload: Boolean, vectorFields: Seq[String],
                           limit: Option[Int],
                           idFilter: Option[Set[String]] = None,
                           idLower: Option[String] = None): Iterator[Point] = {
    val ms = members
    val routed = idFilter.map(routeIds(_, ms.length))
    val slices = windowSlices(collection, from, until, ms)
    val its = slices.iterator.flatMap { case (i, lo, hi) =>
      val shardIds = routed.map(_.getOrElse(i, Set.empty[String]))
      if (shardIds.exists(_.isEmpty)) Iterator.empty
      else ms(i).queryPoints(collection, lo, hi, withPayload, vectorFields,
        limit, shardIds, idLower)
    }
    limit.fold(its)(n => its.take(n))
  }

  override def queryPointsFiltered(collection: String, from: Long, until: Long,
                                   withPayload: Boolean, vectorFields: Seq[String],
                                   limit: Option[Int],
                                   idFilter: Option[Set[String]] = None,
                                   idLower: Option[String] = None,
                                   pfilter: PayloadFilter = PayloadFilter.Empty): Iterator[Point] = {
    if (pfilter.isEmpty)
      return queryPoints(collection, from, until, withPayload, vectorFields,
        limit, idFilter, idLower)
    val ms = members
    val routed = idFilter.map(routeIds(_, ms.length))
    val slices = windowSlices(collection, from, until, ms)
    val its = slices.iterator.flatMap { case (i, lo, hi) =>
      val shardIds = routed.map(_.getOrElse(i, Set.empty[String]))
      if (shardIds.exists(_.isEmpty)) Iterator.empty
      else ms(i).queryPointsFiltered(collection, lo, hi, withPayload,
        vectorFields, limit, shardIds, idLower, pfilter)
    }
    limit.fold(its)(n => its.take(n))
  }

  override def countMatching(collection: String,
                             idFilter: Option[Set[String]] = None,
                             idLower: Option[String] = None): Long = {
    val ms = members
    idFilter match {
      case Some(ids) =>
        routeIds(ids, ms.length).iterator.map { case (i, own) =>
          ms(i).countMatching(collection, Some(own), idLower)
        }.sum
      case None =>
        fanOut(ms)(_.countMatching(collection, None, idLower)).sum
    }
  }

  override def countMatchingFiltered(collection: String,
                                     idFilter: Option[Set[String]] = None,
                                     idLower: Option[String] = None,
                                     pfilter: PayloadFilter = PayloadFilter.Empty): Long = {
    if (pfilter.isEmpty) return countMatching(collection, idFilter, idLower)
    val ms = members
    idFilter match {
      case Some(ids) =>
        routeIds(ids, ms.length).iterator.map { case (i, own) =>
          ms(i).countMatchingFiltered(collection, Some(own), idLower, pfilter)
        }.sum
      case None =>
        fanOut(ms)(_.countMatchingFiltered(collection, None, idLower,
          pfilter)).sum
    }
  }

  override def searchPoints(collection: String, spec: SearchSpec,
                            withPayload: Boolean,
                            vectorFields: Seq[String]): Seq[(Point, Double)] =
    searchPointsFiltered(collection, spec, withPayload, vectorFields,
      PayloadFilter.Empty)

  override def searchPointsFiltered(collection: String, spec: SearchSpec,
                                    withPayload: Boolean,
                                    vectorFields: Seq[String],
                                    pfilter: PayloadFilter): Seq[(Point, Double)] = {
    val ms = members
    // each shard answers its LOCAL page of depth k+offset from position 0
    // (the global offset cannot be split — a shard doesn't know how many
    // better points other shards hold); merge-sort the pages, then apply
    // offset and cut. Shard pages are score-sorted already, but a plain
    // global sort of N small pages is the same O(Nk log Nk) and simpler.
    val deep = spec.copy(k = spec.k + spec.offset, offset = 0)
    val pages = fanOut(ms)(_.searchPointsFiltered(collection, deep,
      withPayload, vectorFields, pfilter))
    val desc = SearchSpec.descending(spec.metric)
    val merged = pages.flatten.sortWith { case ((pa, sa), (pb, sb)) =>
      if (sa != sb) { if (desc) sa > sb else sa < sb }
      else SparkStringOrder.lt(pa.id, pb.id)
    }
    merged.slice(spec.offset, spec.offset + spec.k)
  }

  /** DISTRIBUTED BM25: each shard ships its mergeable partials (served
    * from its own postings sidecar when it has one — the per-shard read
    * is the query terms' token buckets of that shard's slice), the
    * wrapper sums stats/dfs and concatenates candidate rows (an id
    * lives on one shard), and the trait's partials -> rank composition
    * produces the EXACT global rank — provably equal to the unsharded
    * serve because every input to the scorer is a sum or disjoint union.
    */
  override def textRankPartials(collection: String, key: String,
                                terms: Seq[String]): TextRankPartials = {
    val parts = fanOut(members)(_.textRankPartials(collection, key, terms))
    val dfs = new Array[Long](terms.length)
    parts.foreach { p =>
      var i = 0
      while (i < dfs.length) { dfs(i) += p.dfs(i); i += 1 }
    }
    TextRankPartials(parts.map(_.n).sum, parts.map(_.totalLen).sum, dfs,
      parts.flatMap(_.docs))
  }

  override def facetCounts(collection: String, key: String,
                           limit: Int): Seq[(String, Long)] = {
    require(limit > 0, s"facet limit must be positive, got $limit")
    // EXACT merge needs full per-shard histograms: a value in every
    // shard's tail can still top the global cut
    val merged = scala.collection.mutable.HashMap.empty[String, Long]
    fanOut(members)(_.facetCounts(collection, key, Int.MaxValue))
      .foreach(_.foreach {
        case (v, n) => merged.update(v, merged.getOrElse(v, 0L) + n)
      })
    merged.toSeq.sortWith { case ((v1, n1), (v2, n2)) =>
      if (n1 != n2) n1 > n2 else SparkStringOrder.lt(v1, v2)
    }.take(limit)
  }

  // ------------------------------------------------------------ mutations

  /** Route `pts` by owning shard and apply each shard's sub-batch
    * through whatever mutation surface the member speaks (COW members
    * are replaced; wire clients ship the batch). One journal run per
    * call — shard order within the batch — so CDC positions are
    * append-only. Synchronized: the registry's RMW serializes connector
    * commits per store NAME, but direct callers must be safe too.
    */
  override def upsertPoints(collection: String, pts: Seq[Point]): Unit =
    synchronized {
      val ms = members
      val byShard = pts.groupBy(p => ShardedCollectionStore.assignShard(p.id, ms.length))
      applyRouted(collection, ms, byShard.view.mapValues(ps =>
        (s: CollectionStore) => ShardedCollectionStore.applyUpsert(
          s, collection, ps.toIndexedSeq)).toMap)
    }

  override def deletePoints(collection: String, ids: Set[String]): Unit =
    synchronized {
      val ms = members
      val byShard = routeIds(ids, ms.length)
      applyRouted(collection, ms, byShard.view.mapValues(own =>
        (s: CollectionStore) => ShardedCollectionStore.applyDelete(
          s, collection, own)).toMap)
    }

  override def truncate(collection: String): Unit = synchronized {
    val ms = members
    applyRouted(collection, ms,
      ms.indices.map(i => i -> ((s: CollectionStore) =>
        ShardedCollectionStore.applyTruncate(s, collection))).toMap)
  }

  /** Apply per-shard mutation thunks in shard order, swap in the
    * resulting members, and journal each shard's log growth (measured
    * before/after — robust to member-side batch dedup).
    */
  private def applyRouted(collection: String, ms: IndexedSeq[CollectionStore],
                          thunks: Map[Int, CollectionStore => CollectionStore]): Unit = {
    val next = ms.toArray
    val segs = IndexedSeq.newBuilder[ShardSeg]
    var g = journal.lastOption.map(s => s.globalStart + s.count).getOrElse(0L)
    val logged = journal.nonEmpty || ms.forall(s =>
      try { s.collectionNames.headOption.foreach(c => s.logSize(c)); true }
      catch { case _: UnsupportedOperationException => false })
    thunks.toSeq.sortBy(_._1).foreach { case (i, f) =>
      val before = if (logged) ms(i).logSize(collection) else 0L
      next(i) = f(ms(i))
      if (logged) {
        val after = next(i).logSize(collection)
        if (after > before) {
          segs += ShardSeg(i, before, after - before, g)
          g += after - before
        }
      }
    }
    members = next.toIndexedSeq
    if (logged) journal = journal ++ segs.result()
  }

  // ------------------------------------------------------------------ CDC

  private def requireJournal(): IndexedSeq[ShardSeg] = {
    val j = journal
    if (j.isEmpty && members.forall(s =>
      try { s.collectionNames.headOption.foreach(c => s.logSize(c)); false }
      catch { case _: UnsupportedOperationException => true }))
      throw new UnsupportedOperationException(
        "sharded members keep no change log; streaming reads unsupported")
    j
  }

  override def logSize(collection: String): Long = {
    val j = requireJournal()
    j.lastOption.map(s => s.globalStart + s.count).getOrElse(0L)
  }

  /** Global replayable start: past the last journal prefix any member
    * has compacted away (position mapping is immutable, so a compacted
    * member simply truncates the replayable global prefix).
    */
  override def logStart(collection: String): Long = {
    val j = requireJournal()
    val starts = members.map(_.logStart(collection))
    j.reverseIterator.find(s => s.localStart < starts(s.shard))
      .map(s => s.globalStart + s.count).getOrElse(0L)
  }

  override def logEntries(collection: String, from: Long,
                          until: Long): Iterator[LogEntry] = {
    val j = requireJournal()
    val ms = members
    j.iterator
      .filter(s => s.globalStart + s.count > from && s.globalStart < until)
      .flatMap { s =>
        val lo = math.max(from - s.globalStart, 0L)
        val hi = math.min(until - s.globalStart, s.count)
        ms(s.shard)
          .logEntries(collection, s.localStart + lo, s.localStart + hi)
          .zipWithIndex
          .map { case (e, k) => e.copy(seq = s.globalStart + lo + k) }
      }
  }
}

object ShardedCollectionStore {
  /** Shared scatter pool: daemon threads (serving infrastructure must
    * never pin the JVM), sized to the host — fan-outs from many wrapper
    * instances multiplex over it.
    */
  private[sources] lazy val scatterPool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(
      math.max(4, Runtime.getRuntime.availableProcessors() / 2),
      (r: Runnable) => {
        val t = new Thread(r, "graft-scatter"); t.setDaemon(true); t
      })

  /** One journaled run of a shard's log: `count` entries at local
    * positions [localStart, localStart+count) occupy global positions
    * [globalStart, globalStart+count).
    */
  final case class ShardSeg(shard: Int, localStart: Long, count: Long,
                            globalStart: Long)

  /** Rendezvous assignment — the scalar twin of
    * [[graft.ops.Pipeline.rendezvousAssign]] (argmax of md5(s"$id#$i")
    * hex, compared as Spark compares strings; hex is ASCII so bytewise
    * and lexicographic agree). Pinned bit-identical in the spec.
    */
  def assignShard(id: String, nShards: Int): Int = {
    require(nShards >= 1)
    var best = 0
    var bestHash = ""
    var i = 0
    while (i < nShards) {
      val h = md5Hex(s"$id#$i")
      if (i == 0 || h.compareTo(bestHash) > 0) { best = i; bestHash = h }
      i += 1
    }
    best
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    d.foreach { b =>
      sb.append(Character.forDigit((b >> 4) & 0xf, 16))
      sb.append(Character.forDigit(b & 0xf, 16)): Unit
    }
    sb.toString
  }

  /** Apply one shard's upsert sub-batch through whatever surface the
    * member speaks (COW members return their replacement).
    */
  private[sources] def applyUpsert(s: CollectionStore, collection: String,
                                   pts: IndexedSeq[Point]): CollectionStore =
    s match {
      case r: RemoteCollectionClient =>
        r.upsertPoints(collection, pts.sortBy(_.id)); r
      case m: InMemoryCollectionStore => m.appended(collection, pts.sortBy(_.id))
      case p: ParquetCollectionStore => p.appended(collection, pts.sortBy(_.id))
      case other => throw new UnsupportedOperationException(
        s"shard ${other.getClass.getName} does not accept upserts")
    }

  private[sources] def applyDelete(s: CollectionStore, collection: String,
                                   ids: Set[String]): CollectionStore =
    s match {
      case r: RemoteCollectionClient => r.deletePoints(collection, ids); r
      case m: InMemoryCollectionStore => m.removed(collection, ids)
      case p: ParquetCollectionStore => p.removed(collection, ids)
      case other => throw new UnsupportedOperationException(
        s"shard ${other.getClass.getName} does not accept deletes")
    }

  private[sources] def applyTruncate(s: CollectionStore,
                                     collection: String): CollectionStore =
    s match {
      case r: RemoteCollectionClient => r.truncate(collection); r
      case m: InMemoryCollectionStore => m.truncated(collection)
      case p: ParquetCollectionStore => p.truncated(collection)
      case other => throw new UnsupportedOperationException(
        s"shard ${other.getClass.getName} does not accept truncates")
    }
}
