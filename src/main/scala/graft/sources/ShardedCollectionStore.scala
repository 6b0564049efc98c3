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

  /** Active reshard window, if any: published at migration START (the
    * member list already holds the added members), cleared by the final
    * catch-up publish. While set, id routing consults BOTH placements
    * (a moving point may be on its old or its new owner — reads dedup
    * at every merge point) and routed writes DUAL-WRITE leaver ids so
    * a concurrent reader always sees the fresh copy.
    */
  @volatile private var transition: Option[ShardedCollectionStore.Transition] = None

  /** Leaver ids (old owner != new owner) upserted through the wrapper
    * while a reshard is active, per collection — exactly the ids whose
    * OLD-owner copy the final catch-up pass must migrate/clean. Guarded
    * by `this` (all mutators are synchronized); bounded by the ids
    * mutated during one migration, never points.
    */
  private var pendingTouched: Map[String, Set[String]] = Map.empty

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
    // CALLER-RUNS fallback: a fan-out issued FROM a scatter-pool thread
    // (nested wrapper topologies — replicated-of-sharded-of-…) must not
    // submit-and-block on the same fixed-size pool; enough nested
    // levels would park every worker waiting on tasks nothing is left
    // to run (permanent deadlock). Sequential on the nested level costs
    // only that level's parallelism — the outermost fan-out still
    // overlaps the members.
    else if (ShardedCollectionStore.onScatterThread) items.map(f)
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
    * shards owning none, which are then skipped entirely). During a LIVE
    * RESHARD an id routes to BOTH its old and its new owner when they
    * differ (the migration may or may not have moved it yet — asking
    * both is what keeps every point readable mid-migration; merge points
    * dedup by id).
    */
  private def routeIds(ids: Set[String], n: Int): Map[Int, Set[String]] =
    transition match {
      case Some(t) =>
        val m = scala.collection.mutable.HashMap.empty[Int, Set[String]]
        ids.foreach { id =>
          val o = ShardedCollectionStore.assignShard(id, t.nOld)
          val nw = ShardedCollectionStore.assignShard(id, t.nNew)
          m.update(o, m.getOrElse(o, Set.empty[String]) + id)
          if (nw != o) m.update(nw, m.getOrElse(nw, Set.empty[String]) + id)
        }
        m.toMap
      case None =>
        ids.groupBy(id => ShardedCollectionStore.assignShard(id, n))
    }

  /** Id-dedup for read paths while a reshard is live: a moving point is
    * momentarily on both owners (the migration upserts to the new owner
    * BEFORE deleting from the old, so it is never invisible) — keep the
    * first copy in iteration order (old members precede added ones, and
    * dual-writes keep both copies identical, so either is the fresh
    * state). No-op — and zero-allocation — outside a migration.
    */
  private def dedupIfMigrating(it: Iterator[Point]): Iterator[Point] =
    if (transition.isEmpty) it
    else {
      val seen = scala.collection.mutable.HashSet.empty[String]
      it.filter(p => seen.add(p.id))
    }

  override def queryPoints(collection: String, from: Long, until: Long,
                           withPayload: Boolean, vectorFields: Seq[String],
                           limit: Option[Int],
                           idFilter: Option[Set[String]] = None,
                           idLower: Option[String] = None): Iterator[Point] = {
    val ms = members
    val routed = idFilter.map(routeIds(_, ms.length))
    val slices = windowSlices(collection, from, until, ms)
    val its = dedupIfMigrating(slices.iterator.flatMap { case (i, lo, hi) =>
      val shardIds = routed.map(_.getOrElse(i, Set.empty[String]))
      if (shardIds.exists(_.isEmpty)) Iterator.empty
      else ms(i).queryPoints(collection, lo, hi, withPayload, vectorFields,
        limit, shardIds, idLower)
    })
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
    val its = dedupIfMigrating(slices.iterator.flatMap { case (i, lo, hi) =>
      val shardIds = routed.map(_.getOrElse(i, Set.empty[String]))
      if (shardIds.exists(_.isEmpty)) Iterator.empty
      else ms(i).queryPointsFiltered(collection, lo, hi, withPayload,
        vectorFields, limit, shardIds, idLower, pfilter)
    })
    limit.fold(its)(n => its.take(n))
  }

  override def countMatching(collection: String,
                             idFilter: Option[Set[String]] = None,
                             idLower: Option[String] = None): Long = {
    val ms = members
    idFilter match {
      case Some(ids) if transition.nonEmpty =>
        // migration window: an id asked of both owners must count ONCE —
        // count the DISTINCT ids found (ids-only fetch, no payload or
        // vectors cross a member seam)
        queryPoints(collection, 0L, pointCount(collection),
          withPayload = false, Nil, None, Some(ids), idLower)
          .map(_.id).toSet.size.toLong
      case Some(ids) =>
        routeIds(ids, ms.length).iterator.map { case (i, own) =>
          ms(i).countMatching(collection, Some(own), idLower)
        }.sum
      case None =>
        fanOut(ms)(_.countMatching(collection, None, idLower)).sum -
          dualCopyCount(collection, idLower, PayloadFilter.Empty)
    }
  }

  override def countMatchingFiltered(collection: String,
                                     idFilter: Option[Set[String]] = None,
                                     idLower: Option[String] = None,
                                     pfilter: PayloadFilter = PayloadFilter.Empty): Long = {
    if (pfilter.isEmpty) return countMatching(collection, idFilter, idLower)
    val ms = members
    idFilter match {
      case Some(ids) if transition.nonEmpty =>
        queryPointsFiltered(collection, 0L, pointCount(collection),
          withPayload = false, Nil, None, Some(ids), idLower, pfilter)
          .map(_.id).toSet.size.toLong
      case Some(ids) =>
        routeIds(ids, ms.length).iterator.map { case (i, own) =>
          ms(i).countMatchingFiltered(collection, Some(own), idLower, pfilter)
        }.sum
      case None =>
        fanOut(ms)(_.countMatchingFiltered(collection, None, idLower,
          pfilter)).sum - dualCopyCount(collection, idLower, pfilter)
    }
  }

  /** Global-count correction while a reshard is live: a dual-written
    * leaver id (fresh copy on BOTH owners until the catch-up pass
    * cleans the old one) would sum twice. The duplicates are exactly
    * the pending-touched ids still present on their OLD owner — a
    * targeted routed count, O(touched ids), zero when no migration is
    * live. (A count racing one in-flight migration batch can still
    * momentarily over-count by < batch — the same raciness any
    * concurrent mutation has; it self-heals when the batch's old-owner
    * delete lands.)
    */
  private def dualCopyCount(collection: String, idLower: Option[String],
                            pfilter: PayloadFilter): Long =
    transition match {
      case None => 0L
      case Some(t) =>
        val touched = synchronized {
          pendingTouched.getOrElse(collection, Set.empty)
        }
        if (touched.isEmpty) 0L
        else {
          val ms = members
          touched.groupBy(id =>
            ShardedCollectionStore.assignShard(id, t.nOld))
            .iterator.map { case (o, own) =>
              if (pfilter.isEmpty)
                ms(o).countMatching(collection, Some(own), idLower)
              else
                ms(o).countMatchingFiltered(collection, Some(own), idLower,
                  pfilter)
            }.sum
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
    val merged0 = pages.flatten.sortWith { case ((pa, sa), (pb, sb)) =>
      if (sa != sb) { if (desc) sa > sb else sa < sb }
      else SparkStringOrder.lt(pa.id, pb.id)
    }
    // during a live reshard a moving point may appear in two shards'
    // pages (identical copies — dual-write keeps them equal); keep one
    val merged =
      if (transition.isEmpty) merged0
      else {
        val seen = scala.collection.mutable.HashSet.empty[String]
        merged0.filter { case (p, _) => seen.add(p.id) }
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
    TextRank.validateStats(terms, global)
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
      val (result, slack) = facetRound(ms, collection, key, limit, m, pfilter)
      val certified =
        if (result.size < limit) slack == 0L
        else slack < result.last._2
      if (certified) return result
      // page-size growth, quadrupling toward the cap; AT the cap a
      // near-uniform key can never certify, so the next (final) round
      // degrades to the full-histogram merge — m = Int.MaxValue makes
      // every page exhaust its shard (all cut-offs 0, certification
      // unconditional) instead of re-issuing identical capped pages
      // forever
      m = if (m >= Int.MaxValue / 2) Int.MaxValue
          else math.min(m.toLong * 4L, Int.MaxValue.toLong / 2L).toInt
    }
    throw new IllegalStateException("unreachable")
  }

  /** BOUNDED facet merge — the priced escape hatch for the threshold
    * merge's pathological key (near-uniform counts force the exact path
    * to degrade to full per-shard histograms): run at most `maxRounds`
    * threshold rounds and return what is PROVEN by then, with the
    * certification slack exposed as an error bound instead of spent.
    *
    * The returned counts are EXACT for every returned value (the round
    * resolves its candidates with full-coverage sums before ranking);
    * `maxError` = Σ unexhausted-shard cut-offs of the last round — an
    * upper bound on the true count of any value NOT returned, so a
    * caller knows no missing value can exceed it. `certified = true`
    * means the result equals [[facetCounts]] exactly (no unseen value
    * can reach the cut); merge volume is O(shards·m + targeted values)
    * per round, never the full histogram.
    */
  def facetCountsBounded(collection: String, key: String, limit: Int,
                         maxRounds: Int,
                         pfilter: PayloadFilter = PayloadFilter.Empty): ShardedCollectionStore.FacetPage = {
    require(limit > 0, s"facet limit must be positive, got $limit")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val ms = members
    if (ms.length == 1)
      return ShardedCollectionStore.FacetPage(
        ms.head.facetCounts(collection, key, limit, pfilter), 0L,
        certified = true)
    var m = math.max(limit * 4, 16)
    var round = 0
    while (true) {
      round += 1
      val (result, slack) = facetRound(ms, collection, key, limit, m, pfilter)
      val certified =
        if (result.size < limit) slack == 0L
        else slack < result.last._2
      if (certified)
        return ShardedCollectionStore.FacetPage(result, 0L, certified = true)
      if (round >= maxRounds)
        return ShardedCollectionStore.FacetPage(result, slack, certified = false)
      m = if (m >= Int.MaxValue / 2) Int.MaxValue
          else math.min(m.toLong * 4L, Int.MaxValue.toLong / 2L).toInt
    }
    throw new IllegalStateException("unreachable")
  }

  /** One threshold-merge round at page size `m`: per-shard top-m pages,
    * targeted second passes for candidates a page missed, resolved
    * candidates ranked. Returns (provisional result, Σ cut-offs) — the
    * caller decides certification (strict: an unseen value tying the
    * limit-th count could still win the value-asc tiebreak).
    */
  private def facetRound(ms: IndexedSeq[CollectionStore], collection: String,
                         key: String, limit: Int, m: Int,
                         pfilter: PayloadFilter): (Seq[(String, Long)], Long) = {
    {
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
      (result, cutoffs.sum)
    }
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
      transition match {
        case None =>
          val byShard = pts.groupBy(p =>
            ShardedCollectionStore.assignShard(p.id, ms.length))
          applyRouted(collection, ms, byShard.view.mapValues(ps =>
            (s: CollectionStore) => ShardedCollectionStore.applyUpsert(
              s, collection, ps.toIndexedSeq)).toMap)
        case Some(t) =>
          // LIVE MIGRATION: DUAL-WRITE leaver ids to BOTH owners — a
          // concurrent reader (old fan-out slice or new routing) always
          // finds the fresh copy whatever the migration has done with
          // the id so far; the catch-up pass removes the old copy at
          // publish. Non-leavers route normally (one owner).
          val byShard = scala.collection.mutable.HashMap
            .empty[Int, Vector[Point]]
          val touched = Set.newBuilder[String]
          pts.foreach { p =>
            val o = ShardedCollectionStore.assignShard(p.id, t.nOld)
            val n = ShardedCollectionStore.assignShard(p.id, t.nNew)
            byShard.update(o, byShard.getOrElse(o, Vector.empty) :+ p)
            if (n != o) {
              byShard.update(n, byShard.getOrElse(n, Vector.empty) :+ p)
              touched += p.id
            }
          }
          pendingTouched = pendingTouched.updated(collection,
            pendingTouched.getOrElse(collection, Set.empty) ++
              touched.result())
          applyRouted(collection, ms, byShard.view.mapValues(ps =>
            (s: CollectionStore) => ShardedCollectionStore.applyUpsert(
              s, collection, ps.toIndexedSeq)).toMap.toMap)
      }
    }

  override def deletePoints(collection: String, ids: Set[String]): Unit =
    synchronized {
      val ms = members
      // routeIds already answers BOTH owners during a migration — a
      // delete must land wherever the copy might be (old, new, or both)
      val byShard = routeIds(ids, ms.length)
      applyRouted(collection, ms, byShard.view.mapValues(own =>
        (s: CollectionStore) => ShardedCollectionStore.applyDelete(
          s, collection, own)).toMap)
    }

  override def truncate(collection: String): Unit = synchronized {
    val ms = members
    pendingTouched -= collection // nothing left for a catch-up to clean
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
    * migrate EXACTLY the displaced points, WITHOUT blocking concurrent
    * reads or writes for the duration. This is the payoff of rendezvous
    * placement: under highest-random-weight hashing an id's owner
    * changes N -> N+M only if one of the APPENDED indices now wins its
    * argmax, so ~M/(N+M) of the corpus moves and every move targets a
    * new member — no old-to-old churn (asserted per migrated id).
    *
    * STAGED under concurrent mutation (the write-availability contract:
    * at 100 TB a migration takes hours — routed writes must not wait):
    *
    *  - Phase 0 (brief lock): validate, publish the GROWN member list
    *    and the transition window. From here reads fan out over added
    *    members too, id routing asks BOTH placements for a moving id,
    *    and routed upserts DUAL-WRITE leaver ids (old + new owner) so a
    *    reader always finds the fresh copy; deletes land on both.
    *  - Phase A (no lock): each old shard scans ITS slice ids-only and
    *    keeps the leavers (memory O(displaced ids), never points).
    *  - Phase B (short lock PER BATCH): `migrationBatch` ids fetch via
    *    the routed idFilter, PHYSICALLY upsert to their new owners
    *    FIRST and delete from the old owner SECOND (a lock-free reader
    *    never finds the point missing — at worst it sees both copies,
    *    deduped at every merge point), while the JOURNAL records
    *    delete -> upsert (replay must end with the point in place).
    *    Writes interleave between batches — they take the same lock.
    *  - Phase C (final lock): the catch-up — ids upserted during the
    *    migration (recorded per collection) re-migrate through the same
    *    batch mechanics, cleaning their dual-written old copies; then
    *    one publish clears the transition. Post-state equals the
    *    serial (write-quiesced) reshard exactly.
    *
    * CDC: per moved id the journal replays delete -> upsert(final
    * state); dual-writes replay as the same point twice (idempotent);
    * all pre-reshard positions are untouched (append-only journal).
    *
    * FAILURE mid-migration leaves the transition PUBLISHED: every point
    * stays readable (dual routing) and writable (dual-write), completed
    * batches are journaled, and [[resumeReshard]] finishes the job by
    * re-scanning for remaining leavers — it finds only what the failed
    * run did not move. Shrinking is deliberately unsupported — journal
    * segments reference member indices, so removing a member would
    * orphan its replay history; drain-and-rebuild is the path down.
    *
    * Added members must serve every collection of the cluster and start
    * EMPTY (their slice of the placement domain is exactly the migrated
    * ids). Adding a log-less member makes the whole store log-less —
    * the global journal is dropped, matching the constructor's rule.
    *
    * `onBatchMigrated(collection, batchIndex)` fires after each batch
    * OUTSIDE the lock — the deterministic seam concurrency specs drive
    * mutations through (production callers leave the default no-op).
    */
  def reshard(added: Seq[CollectionStore],
              migrationBatch: Int = 65536,
              onBatchMigrated: (String, Int) => Unit = (_, _) => ()): Unit = {
    require(added.nonEmpty, "reshard needs at least one added member")
    require(migrationBatch > 0,
      s"migration batch must be positive, got $migrationBatch")
    synchronized {
      require(transition.isEmpty,
        "a reshard is already in progress — resumeReshard() completes it")
      val old = members
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
      if (!logless && addedLogless) { logless = true; journals = Map.empty }
      pendingTouched = Map.empty
      transition = Some(ShardedCollectionStore.Transition(
        old.length, old.length + added.length))
      members = old ++ added
    }
    completeMigration(migrationBatch, onBatchMigrated)
  }

  /** Finish a migration whose [[reshard]] call failed mid-way: the
    * transition is still published (reads and writes were never
    * degraded), so re-scan each old shard for the leavers the failed
    * run did not move and complete the same staged protocol. Idempotent
    * over completed batches — already-moved ids are no longer on their
    * old owner and are simply not collected again.
    */
  def resumeReshard(migrationBatch: Int = 65536,
                    onBatchMigrated: (String, Int) => Unit = (_, _) => ()): Unit = {
    synchronized {
      require(transition.nonEmpty,
        "no reshard in progress — nothing to resume")
    }
    completeMigration(migrationBatch, onBatchMigrated)
  }

  private def completeMigration(migrationBatch: Int,
                                onBatchMigrated: (String, Int) => Unit): Unit = {
    val t = transition.get
    val nOld = t.nOld
    val cols = members.take(nOld).flatMap(_.collectionNames).distinct
    cols.foreach { c =>
      val fields = collectionInfo(c).fields.map(_.name)
      // Phase A, lock-free: one ids-only streaming pass per old shard
      // over the volatile-current member (no reliance on enumeration
      // order; ids upserted after the scan are caught by Phase C).
      (0 until nOld).foreach { i =>
        if (members(i).collectionNames.contains(c)) {
          val s0 = members(i)
          val moverIds = s0.queryPoints(c, 0L, s0.pointCount(c),
              withPayload = false, Nil, None)
            .map(_.id)
            .filter(id =>
              ShardedCollectionStore.assignShard(id, t.nNew) != i)
            .toIndexedSeq
          // Phase B: one short lock per batch — writes interleave
          // between batches, never wait out the migration
          var batchIdx = 0
          moverIds.grouped(migrationBatch).foreach { batchIds =>
            synchronized { migrateBatch(c, fields, i, batchIds.toSet, t) }
            onBatchMigrated(c, batchIdx)
            batchIdx += 1
          }
        }
      }
    }
    // Phase C, one final lock: catch up ids mutated mid-migration (the
    // dual-written leavers), then publish the end of the window
    synchronized {
      cols.foreach { c =>
        val touched = pendingTouched.getOrElse(c, Set.empty)
        if (touched.nonEmpty) {
          val fields = collectionInfo(c).fields.map(_.name)
          touched.groupBy(id =>
            ShardedCollectionStore.assignShard(id, t.nOld))
            .toSeq.sortBy(_._1).foreach { case (o, ids) =>
              ids.grouped(migrationBatch).foreach(g =>
                migrateBatch(c, fields, o, g.toSet, t))
            }
        }
      }
      pendingTouched = Map.empty
      transition = None
    }
  }

  /** One migration batch under the caller-held lock: fetch the batch
    * ids still present on old shard `i`, PHYSICALLY upsert them to
    * their new owners FIRST and delete from `i` SECOND (lock-free
    * readers never lose the point), while the JOURNAL records the
    * delete at the earlier global positions (replay per moved id is
    * delete -> upsert(final state)). Ids the batch no longer finds on
    * `i` (deleted or already moved) are skipped — `removed` journals
    * only hits.
    */
  private def migrateBatch(c: String, fields: Seq[String], i: Int,
                           batchIds: Set[String],
                           t: ShardedCollectionStore.Transition): Unit = {
    val next = members.toArray
    val logged = !logless
    val movers = next(i).queryPoints(c, 0L, next(i).pointCount(c),
      withPayload = true, fields, None,
      idFilter = Some(batchIds)).toIndexedSeq
    if (movers.isEmpty) return
    val presentIds = movers.map(_.id).toSet
    // physical: upserts first (new owners), tracking per-member log
    // growth for the journal
    val upsertSegs = IndexedSeq.newBuilder[(Int, Long, Long)]
    movers.groupBy(p => ShardedCollectionStore.assignShard(p.id, t.nNew))
      .toSeq.sortBy(_._1).foreach { case (j, pts) =>
        // every move MUST target an appended index (the rendezvous
        // no-old-to-old-churn law)
        require(j >= t.nOld,
          s"displaced id remapped to existing shard $j — rendezvous invariant violated")
        val before = if (logged) next(j).logSize(c) else 0L
        next(j) = ShardedCollectionStore.applyUpsert(next(j), c, pts)
        if (logged) {
          val after = next(j).logSize(c)
          if (after > before) upsertSegs += ((j, before, after - before))
        }
        // publish the upserted copy BEFORE the old-owner delete lands —
        // a lock-free reader mid-batch sees both copies, never neither
        members = next.toIndexedSeq
      }
    // physical: delete from the old owner second
    val delBefore = if (logged) next(i).logSize(c) else 0L
    next(i) = ShardedCollectionStore.applyDelete(next(i), c, presentIds)
    val delCount =
      if (logged) next(i).logSize(c) - delBefore else 0L
    members = next.toIndexedSeq
    // journal: delete first, upserts second — sequential global
    // positions appended under the lock (concurrent writes appended
    // their own runs before or after this batch, never inside it)
    if (logged) {
      val journal = journals.getOrElse(c, IndexedSeq.empty)
      var g = journal.lastOption
        .map(s => s.globalStart + s.count).getOrElse(0L)
      val segs = IndexedSeq.newBuilder[ShardSeg]
      if (delCount > 0L) {
        segs += ShardSeg(i, delBefore, delCount, g)
        g += delCount
      }
      upsertSegs.result().foreach { case (j, localStart, n) =>
        segs += ShardSeg(j, localStart, n, g)
        g += n
      }
      journals = journals.updated(c, journal ++ segs.result())
    }
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
    * them at its current log head; every WIRE member receives the
    * optimize verb and its service rebuilds remotely (the remote
    * service owns its files — the verb triggers its optimizer there) —
    * the freshness loop closed cluster-wide in one call, wire members
    * included. In-memory members carry no sidecars and pass through.
    * Journal positions are preserved: optimize never writes the log.
    * Concurrent scatter, like every fan-out: the wall-clock cost is the
    * slowest member's rebuild, not the sum.
    */
  def optimizeMembers(spark: org.apache.spark.sql.SparkSession,
                      ivfMaxIter: Int = 0): Unit = synchronized {
    members = fanOut(members) {
      case p: ParquetCollectionStore => p.optimized(spark, ivfMaxIter)
      case sh: ShardedCollectionStore => sh.optimizeMembers(spark, ivfMaxIter); sh
      // before the wire-client arm: the replica wrapper IS one, but its
      // verb fans to every ALIVE replica rather than the refusing default
      case rep: ReplicatedCollectionStore =>
        rep.optimizeReplicas(spark, ivfMaxIter); rep
      case r: RemoteCollectionClient => r.optimize(ivfMaxIter); r
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

  /** Is the current thread a scatter-pool worker? Nested fan-outs
    * (wrapper-of-wrapper topologies) check this and run caller-inline
    * instead of submit-and-blocking on the pool they occupy — the
    * fixed-size pool otherwise deadlocks when every worker waits on a
    * task no free worker exists to run.
    */
  private[sources] def onScatterThread: Boolean =
    Thread.currentThread().getName.startsWith("graft-scatter")

  /** One journaled run of a shard's log: `count` entries at local
    * positions [localStart, localStart+count) occupy global positions
    * [globalStart, globalStart+count).
    */
  final case class ShardSeg(shard: Int, localStart: Long, count: Long,
                            globalStart: Long)

  /** An active reshard window: the member list already holds nNew
    * members; ids route by BOTH placements until the final publish.
    */
  private[sources] final case class Transition(nOld: Int, nNew: Int)

  /** A bounded facet merge's result: exact `counts` for every returned
    * value, `maxError` bounding any value NOT returned (Σ unexhausted
    * per-shard cut-offs of the final round — 0 when certified), and
    * whether the page equals the exact merge.
    */
  final case class FacetPage(counts: Seq[(String, Long)], maxError: Long,
                             certified: Boolean)

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
