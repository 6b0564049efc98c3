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
  *  - counts sum; facets are EXACT with BOUNDED merge volume via the
  *    threshold two-phase merge (per-shard top-m pages whose last count
  *    bounds every unseen value, targeted second passes for contenders
  *    a page missed, certification against the summed cut-offs) — a
  *    naive per-shard top-`limit` could miss a value placing in every
  *    shard but topping none; full histograms would make the merge
  *    O(distinct values).
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

  /** True when ANY member keeps no change log for a collection it
    * serves — then the sharded store keeps no global log either
    * (independent of member order: one log-less member makes replay of
    * the full history impossible, so routed mutations skip journaling
    * and the streaming face refuses).
    */
  @volatile private var logless: Boolean =
    shards0.exists { s =>
      s.collectionNames.exists { c =>
        try { s.logSize(c); false }
        catch { case _: UnsupportedOperationException => true }
      }
    }

  /** The routed-mutation journal, PER COLLECTION (members may serve
    * several collections, each with its own log — conflating them would
    * corrupt global positions): global log order = the collection's
    * segments in append order. Seeded from the members' EXISTING logs
    * (concatenation in shard order — the pre-wrap ingest), then one run
    * of segments per routed batch. Immutable prefix: appends only.
    */
  @volatile private var journals: Map[String, IndexedSeq[ShardSeg]] =
    if (logless) Map.empty
    else {
      shards0.flatMap(_.collectionNames).distinct.map { c =>
        val segs = IndexedSeq.newBuilder[ShardSeg]
        var g = 0L
        shards0.zipWithIndex.foreach { case (s, i) =>
          val n = if (s.collectionNames.contains(c)) s.logSize(c) else 0L
          if (n > 0L) { segs += ShardSeg(i, 0L, n, g); g += n }
        }
        c -> segs.result()
      }.toMap
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
      f: CollectionStore => T): IndexedSeq[T] = scatter(ms)(f)

  private def scatter[A, T](items: IndexedSeq[A])(f: A => T): IndexedSeq[T] =
    if (items.isEmpty) IndexedSeq.empty
    else if (items.length == 1) IndexedSeq(f(items.head))
    else {
      val fs = items.map(a => ShardedCollectionStore.scatterPool.submit(
        new java.util.concurrent.Callable[T] { def call(): T = f(a) }))
      fs.map(fut =>
        try fut.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        })
    }

  // ---------------------------------------------------------------- reads

  /** First member able to describe the collection wins — a collection
    * may be absent from (or indescribable by) the first shard yet served
    * by others; only when EVERY member fails does the lookup fail, with
    * the first failure as the cause.
    */
  override def collectionInfo(collection: String): CollectionDescriptor = {
    val ms = members
    var firstFailure: Throwable = null
    var i = 0
    while (i < ms.length) {
      try return ms(i).collectionInfo(collection)
      catch {
        case e: Exception => if (firstFailure == null) firstFailure = e
      }
      i += 1
    }
    throw firstFailure
  }

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

  /** Mergeable BM25 partials — exact but UNBOUNDED (one candidate row
    * per matching doc ships to the merge point): kept for callers that
    * need the raw partials; the ranked serve below uses the two-phase
    * protocol instead, whose ship volume is bounded by k.
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

  /** Global corpus stats: per-shard stats SUM (disjoint placement). */
  override def textRankStats(collection: String, key: String,
                             terms: Seq[String]): TextRankStats =
    fanOut(members)(_.textRankStats(collection, key, terms))
      .reduce(_ merged _)

  /** TWO-PHASE DISTRIBUTED BM25 — the ship volume is bounded by k,
    * not by how common the query terms are:
    *
    *  1. exchange GLOBAL stats: every shard returns (n, Σdl, dfs) — a
    *     few dozen bytes — and the wrapper sums them;
    *  2. every shard ranks ITS candidates with the global stats (the
    *     scorer takes them as parameters — same arithmetic bit for
    *     bit) and returns only its local top-k.
    *
    * The merge sees at most shards·k rows. Exact: a doc's score
    * depends on the global stats and its own (tf, dl) alone, so each
    * shard's local top-k under global stats contains every member of
    * the global top-k it owns; the merge comparator is the rank's own
    * (score desc, id asc).
    */
  override def searchTextRanked(collection: String, key: String,
                                terms: Seq[String], k: Int,
                                k1: Double = 1.2,
                                b: Double = 0.75): Seq[(String, Double)] = {
    TextRank.validate(terms, k)
    val global = textRankStats(collection, key, terms)
    val pages = fanOut(members)(
      _.textRankTopK(collection, key, terms, k, global, k1, b))
    pages.flatten.sortWith { case ((ia, sa), (ib, sb)) =>
      if (sa != sb) sa > sb else SparkStringOrder.lt(ia, ib)
    }.take(k)
  }

  /** Phase 2 against the WHOLE sharded corpus (this store as one shard
    * of a larger federation): per-member phase-2 pages under the
    * caller's global stats merge to this store's top-k.
    */
  override def textRankTopK(collection: String, key: String,
                            terms: Seq[String], k: Int,
                            global: TextRankStats, k1: Double = 1.2,
                            b: Double = 0.75): Seq[(String, Double)] = {
    TextRank.validate(terms, k)
    val pages = fanOut(members)(
      _.textRankTopK(collection, key, terms, k, global, k1, b))
    pages.flatten.sortWith { case ((ia, sa), (ib, sb)) =>
      if (sa != sb) sa > sb else SparkStringOrder.lt(ia, ib)
    }.take(k)
  }

  /** EXACT sharded facets with BOUNDED merge volume — the threshold
    * (Fagin-style) two-phase merge, instead of pulling full per-shard
    * histograms (O(distinct values) at the merge point, a scale-killer
    * for high-cardinality keys):
    *
    *  1. each shard returns its top-`m` page (m = a small multiple of
    *     `limit`); a value absent from an unexhausted shard's page is
    *     bounded above by that page's LAST count (the shard's cut-off);
    *  2. candidates whose upper bound reaches the provisional cut get a
    *     TARGETED exact count ([[CollectionStore.facetCountsFor]]) from
    *     exactly the shards whose pages missed them;
    *  3. the answer is certified when no unseen value can reach it:
    *     Σ cut-offs < the limit-th result count (strict — an unseen
    *     value tying the cut could still win the value-asc tiebreak);
    *     otherwise the page size quadruples and the round repeats
    *     (worst case = the old full-histogram merge, e.g. a key whose
    *     counts are all equal).
    *
    * Exactness: every returned value's count is a full-coverage sum
    * (page hits + targeted passes); an excluded candidate's true count
    * is < the certification threshold L ≤ the limit-th result count,
    * and an unseen value's is ≤ Σ cut-offs < it — neither can displace
    * a result row even on ties. Merge volume is O(shards·m + targeted
    * values), independent of the key's distinct-value count.
    */
  override def facetCounts(collection: String, key: String, limit: Int,
                           pfilter: PayloadFilter = PayloadFilter.Empty): Seq[(String, Long)] = {
    require(limit > 0, s"facet limit must be positive, got $limit")
    val ms = members
    if (ms.length == 1)
      return ms.head.facetCounts(collection, key, limit, pfilter)
    var m = math.max(limit * 4, 16)
    while (true) {
      val pages = fanOut(ms)(_.facetCounts(collection, key, m, pfilter))
      val cutoffs = pages.map(p => if (p.size < m) 0L else p.last._2)
      val lower = scala.collection.mutable.HashMap.empty[String, Long]
      val seenBy = scala.collection.mutable.HashMap
        .empty[String, scala.collection.mutable.BitSet]
      pages.zipWithIndex.foreach { case (p, i) =>
        p.foreach { case (v, n) =>
          lower.update(v, lower.getOrElse(v, 0L) + n)
          seenBy.getOrElseUpdate(v, scala.collection.mutable.BitSet.empty) += i
        }
      }
      // provisional cut L = the limit-th largest lower bound (0 when
      // fewer candidates) — every candidate with lower >= L is resolved
      // below, so the final limit-th exact count is >= L
      val lowersDesc = lower.valuesIterator.toArray.sortWith(_ > _)
      val cutL = if (lowersDesc.length >= limit) lowersDesc(limit - 1) else 0L
      // candidates a missing shard could still lift over the cut: ask
      // exactly those shards for exactly those values
      val unresolved = lower.keysIterator.filter { v =>
        val seen = seenBy(v)
        val slack = ms.indices.iterator
          .filter(i => !seen(i) && cutoffs(i) > 0L).map(cutoffs).sum
        slack > 0L && lower(v) + slack >= cutL
      }.toSet
      val asks: IndexedSeq[(Int, Set[String])] = ms.indices.iterator.map {
        i => i -> unresolved.filter(v => !seenBy(v)(i) && cutoffs(i) > 0L)
      }.filter(_._2.nonEmpty).toIndexedSeq
      scatter(asks) { case (i, vals) =>
        ms(i).facetCountsFor(collection, key, vals, pfilter)
      }.foreach(_.foreach { case (v, n) =>
        lower.update(v, lower.getOrElse(v, 0L) + n)
      })
      // resolved candidates now carry exact counts: page hits + targeted
      // passes cover every shard that could hold them
      val resolved = lower.keysIterator.filter { v =>
        val seen = seenBy(v)
        unresolved(v) ||
          ms.indices.forall(i => seen(i) || cutoffs(i) == 0L)
      }.toSeq
      val result = resolved.map(v => (v, lower(v))).sortWith {
        case ((v1, n1), (v2, n2)) =>
          if (n1 != n2) n1 > n2 else SparkStringOrder.lt(v1, v2)
      }.take(limit)
      val slackTotal = cutoffs.sum
      val certified =
        if (result.size < limit) slackTotal == 0L
        else slackTotal < result.last._2
      if (certified) return result
      m = math.min(m.toLong * 4L, Int.MaxValue.toLong / 2L).toInt
    }
    throw new IllegalStateException("unreachable")
  }

  /** Targeted exact counts across shards: disjoint placement makes the
    * per-member sums exact.
    */
  override def facetCountsFor(collection: String, key: String,
                              values: Set[String],
                              pfilter: PayloadFilter = PayloadFilter.Empty): Map[String, Long] = {
    if (values.isEmpty) return Map.empty
    val merged = scala.collection.mutable.HashMap.empty[String, Long]
    fanOut(members)(_.facetCountsFor(collection, key, values, pfilter))
      .foreach(_.foreach { case (v, n) =>
        merged.update(v, merged.getOrElse(v, 0L) + n)
      })
    merged.toMap
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
    val journal = journals.getOrElse(collection, IndexedSeq.empty)
    var g = journal.lastOption.map(s => s.globalStart + s.count).getOrElse(0L)
    val logged = !logless
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
    if (logged)
      journals = journals.updated(collection, journal ++ segs.result())
  }

  // -------------------------------------------------------------- reshard

  /** LIVE RESHARD — grow the cluster by APPENDING `added` members and
    * migrate EXACTLY the displaced points. This is the payoff of
    * rendezvous placement: under highest-random-weight hashing an id's
    * owner changes N -> N+M only if one of the APPENDED indices now wins
    * its argmax, so ~M/(N+M) of the corpus moves and every move targets
    * a new member — no old-to-old churn (asserted per migrated id).
    *
    * Mechanics per collection: each old shard scans ITS slice (reads
    * are owner-local — corpus/N per shard, the usual scatter shape),
    * keeps the ids whose argmax under the grown count left it, and the
    * migration applies as a routed DELETE (old owner) + UPSERT (new
    * owner) run, journaled in shard order — deletes take earlier global
    * positions than the upserts, so a moved id replays delete -> upsert
    * and CDC readers reconstruct the exact post-reshard state; all
    * pre-reshard positions are untouched (append-only journal).
    *
    * The membership swap is one volatile publish AFTER every migration
    * batch is computed: concurrent readers see wholly-old or wholly-new
    * placement, never a mix. Shrinking is deliberately unsupported —
    * journal segments reference member indices, so removing a member
    * would orphan its replay history; drain-and-rebuild is the path
    * down.
    *
    * Added members must serve every collection of the cluster and start
    * EMPTY (their slice of the placement domain is exactly the migrated
    * ids). Adding a log-less member makes the whole store log-less —
    * the global journal is dropped, matching the constructor's rule.
    */
  def reshard(added: Seq[CollectionStore],
              migrationBatch: Int = 65536): Unit = synchronized {
    require(added.nonEmpty, "reshard needs at least one added member")
    require(migrationBatch > 0,
      s"migration batch must be positive, got $migrationBatch")
    val old = members
    val nOld = old.length
    val nNew = nOld + added.length
    val cols = old.flatMap(_.collectionNames).distinct
    added.foreach { s =>
      cols.foreach { c =>
        require(s.collectionNames.contains(c),
          s"added member must serve '$c' (provision the collection first)")
        require(s.pointCount(c) == 0L,
          s"added member already holds points of '$c' — seed members " +
            "empty; placement assigns them their slice")
      }
    }
    val addedLogless = added.exists { s =>
      s.collectionNames.exists { c =>
        try { s.logSize(c); false }
        catch { case _: UnsupportedOperationException => true }
      }
    }
    val logged = !logless && !addedLogless
    val next = (old ++ added).toArray
    var nextJournals = journals
    cols.foreach { c =>
      val fields = collectionInfo(c).fields.map(_.name)
      val journal = nextJournals.getOrElse(c, IndexedSeq.empty)
      var g = journal.lastOption
        .map(s => s.globalStart + s.count).getOrElse(0L)
      val segs = IndexedSeq.newBuilder[ShardSeg]
      def applyOn(i: Int, f: CollectionStore => CollectionStore): Unit = {
        val before = if (logged) next(i).logSize(c) else 0L
        next(i) = f(next(i))
        if (logged) {
          val after = next(i).logSize(c)
          if (after > before) {
            segs += ShardSeg(i, before, after - before, g)
            g += after - before
          }
        }
      }
      // STREAMED migration, one old shard at a time, in two phases per
      // shard. Phase A: ONE ids-only streaming pass over the
      // still-unmutated member collects the leaver ids (no reliance on
      // enumeration order, no mutation racing the scan — correct for
      // sorted and unsorted members alike; memory is O(displaced ids)
      // strings, never points). Phase B: the ids migrate in
      // `migrationBatch` groups — each group's points fetch via the
      // routed idFilter (an id-stats-pruned read on the lakehouse
      // backend), upsert to their new owners, and delete from the old
      // one, so at most one batch of full points is ever materialized.
      // Within a batch the delete journals first (earlier global
      // positions than the upserts), so a moved id replays
      // delete -> upsert and CDC reconstructs the exact final state.
      old.indices.foreach { i =>
        if (old(i).collectionNames.contains(c)) {
          val s0 = next(i)
          val moverIds = s0.queryPoints(c, 0L, s0.pointCount(c),
              withPayload = false, Nil, None)
            .map(_.id)
            .filter(id => ShardedCollectionStore.assignShard(id, nNew) != i)
            .toIndexedSeq
          moverIds.grouped(migrationBatch).foreach { batchIds =>
            val movers = next(i).queryPoints(c, 0L, next(i).pointCount(c),
              withPayload = true, fields, None,
              idFilter = Some(batchIds.toSet)).toIndexedSeq
            applyOn(i, st => ShardedCollectionStore.applyDelete(
              st, c, batchIds.toSet))
            // every move MUST target an appended index (the rendezvous
            // no-old-to-old-churn law)
            movers.groupBy(p =>
                ShardedCollectionStore.assignShard(p.id, nNew))
              .toSeq.sortBy(_._1).foreach { case (j, pts) =>
                require(j >= nOld,
                  s"displaced id remapped to existing shard $j — rendezvous invariant violated")
                applyOn(j, st => ShardedCollectionStore.applyUpsert(
                  st, c, pts))
              }
          }
        }
      }
      if (logged)
        nextJournals = nextJournals.updated(c, journal ++ segs.result())
    }
    members = next.toIndexedSeq
    if (logged) journals = nextJournals
    else { logless = true; journals = Map.empty }
  }

  // -------------------------------------------------------- lifecycle

  /** Compact the GLOBAL log up to position `upTo` (exclusive),
    * delegated per member: the journal maps the global prefix [0,
    * upTo) to each shard's local prefix, each capable member compacts
    * its own log (COW swap — parquet/in-memory — or one wire call),
    * and retained positions are untouched, so [[logStart]] afterwards
    * reports exactly `upTo` (partial segments land INSIDE their
    * segment) and checkpointed CDC readers past `upTo` are undisturbed.
    */
  override def compact(collection: String, upTo: Long): Unit = synchronized {
    val j = requireJournal(collection)
    val head = j.lastOption.map(s => s.globalStart + s.count).getOrElse(0L)
    require(upTo <= head,
      s"cannot compact '$collection' past its log head ($head), got $upTo")
    if (upTo <= 0L) return
    val ms = members
    val localUpTo = Array.fill(ms.length)(0L)
    j.iterator.takeWhile(_.globalStart < upTo).foreach { s =>
      val n = math.min(s.count, upTo - s.globalStart)
      localUpTo(s.shard) = math.max(localUpTo(s.shard), s.localStart + n)
    }
    members = ms.zipWithIndex.map { case (m, i) =>
      if (localUpTo(i) <= 0L) m
      else m match {
        case mem: InMemoryCollectionStore => mem.compacted(collection, localUpTo(i))
        case p: ParquetCollectionStore => p.compacted(collection, localUpTo(i))
        case r: RemoteCollectionClient => r.compact(collection, localUpTo(i)); m
        case other => throw new UnsupportedOperationException(
          s"shard ${other.getClass.getName} cannot compact its log")
      }
    }
  }

  /** Delegate the OPTIMIZER through the wrapper: every parquet member
    * rebuilds its sidecars from its COW-current primaries and reseals
    * them at its current log head — the freshness loop closed
    * cluster-wide in one call. In-memory members carry no sidecars and
    * pass through; wire members pass through untouched (the remote
    * service owns its files — trigger its optimizer there). Journal
    * positions are preserved: optimize never writes the log.
    */
  def optimizeMembers(spark: org.apache.spark.sql.SparkSession,
                      ivfMaxIter: Int = 0): Unit = synchronized {
    members = members.map {
      case p: ParquetCollectionStore => p.optimized(spark, ivfMaxIter)
      case other => other
    }
  }

  // ------------------------------------------------------------------ CDC

  private def requireJournal(collection: String): IndexedSeq[ShardSeg] = {
    if (logless)
      throw new UnsupportedOperationException(
        "sharded members keep no change log; streaming reads unsupported")
    journals.getOrElse(collection, IndexedSeq.empty)
  }

  override def logSize(collection: String): Long = {
    val j = requireJournal(collection)
    j.lastOption.map(s => s.globalStart + s.count).getOrElse(0L)
  }

  /** Global replayable start: past the last journal prefix any member
    * has compacted away (position mapping is immutable, so a compacted
    * member simply truncates the replayable global prefix). A member
    * compacted into the MIDDLE of one of its segments truncates that
    * segment partially — the replayable start lands inside it, not past
    * it, so no still-replayable entry is reported gone.
    */
  override def logStart(collection: String): Long = {
    val j = requireJournal(collection)
    val starts = members.map(m =>
      if (m.collectionNames.contains(collection)) m.logStart(collection)
      else 0L)
    j.reverseIterator.find(s => s.localStart < starts(s.shard)).map { s =>
      val memberStart = starts(s.shard)
      if (memberStart < s.localStart + s.count)
        s.globalStart + (memberStart - s.localStart)
      else s.globalStart + s.count
    }.getOrElse(0L)
  }

  override def logEntries(collection: String, from: Long,
                          until: Long): Iterator[LogEntry] = {
    val j = requireJournal(collection)
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
