package graft.sources

import graft.collections.CollectionDescriptor

/** Collection ALIASES — the backend's zero-downtime indirection (Qdrant's
  * alias API: production readers address an alias; a reindex builds a new
  * collection out-of-band, then one atomic alias update flips every
  * reader to it — the pattern its docs prescribe for embedding-model
  * upgrades). Re-expressed at the `CollectionStore` seam as a wrapper
  * that works over ANY store implementation (in-memory, parquet, wire):
  * every call resolves the collection name through the alias map ONCE
  * (aliases point at collections, not at other aliases — same
  * single-level rule as the backend), and the swap is an atomic
  * [[CollectionStores.update]] replacing the wrapper, so concurrent
  * readers see either wholly-old or wholly-new resolution, never a mix.
  */
final class AliasedCollectionStore(
    val inner: CollectionStore,
    val aliases: Map[String, String]) extends CollectionStore {

  require(aliases.valuesIterator.forall(t => !aliases.contains(t)),
    s"aliases must point at collections, not at other aliases: $aliases")

  private def r(collection: String): String =
    aliases.getOrElse(collection, collection)

  override def collectionInfo(collection: String): CollectionDescriptor =
    inner.collectionInfo(r(collection))
  override def pointCount(collection: String): Long =
    inner.pointCount(r(collection))
  /** Aliases are listable names: SHOW TABLES through the catalog sees
    * them next to the concrete collections, exactly like the backend's
    * alias listing.
    */
  override def collectionNames: Seq[String] =
    (inner.collectionNames ++ aliases.keys).distinct.sorted
  override def queryPoints(collection: String, from: Long, until: Long,
                           withPayload: Boolean, vectorFields: Seq[String],
                           limit: Option[Int],
                           idFilter: Option[Set[String]] = None,
                           idLower: Option[String] = None): Iterator[Point] =
    inner.queryPoints(r(collection), from, until, withPayload, vectorFields,
      limit, idFilter, idLower)
  override def searchPoints(collection: String, spec: SearchSpec,
                            withPayload: Boolean,
                            vectorFields: Seq[String]): Seq[(Point, Double)] =
    inner.searchPoints(r(collection), spec, withPayload, vectorFields)
  // the filtered variants delegate too, so an inner store's server-side
  // filter evaluation (e.g. the wire client's) survives aliasing
  override def queryPointsFiltered(collection: String, from: Long, until: Long,
                                   withPayload: Boolean, vectorFields: Seq[String],
                                   limit: Option[Int],
                                   idFilter: Option[Set[String]] = None,
                                   idLower: Option[String] = None,
                                   pfilter: PayloadFilter = PayloadFilter.Empty): Iterator[Point] =
    inner.queryPointsFiltered(r(collection), from, until, withPayload,
      vectorFields, limit, idFilter, idLower, pfilter)
  override def countMatching(collection: String,
                             idFilter: Option[Set[String]] = None,
                             idLower: Option[String] = None): Long =
    inner.countMatching(r(collection), idFilter, idLower)
  override def countMatchingFiltered(collection: String,
                                     idFilter: Option[Set[String]] = None,
                                     idLower: Option[String] = None,
                                     pfilter: PayloadFilter = PayloadFilter.Empty): Long =
    inner.countMatchingFiltered(r(collection), idFilter, idLower, pfilter)
  override def searchPointsFiltered(collection: String, spec: SearchSpec,
                                    withPayload: Boolean,
                                    vectorFields: Seq[String],
                                    pfilter: PayloadFilter): Seq[(Point, Double)] =
    inner.searchPointsFiltered(r(collection), spec, withPayload, vectorFields,
      pfilter)
  override def facetCounts(collection: String, key: String, limit: Int,
                           pfilter: PayloadFilter = PayloadFilter.Empty): Seq[(String, Long)] =
    inner.facetCounts(r(collection), key, limit, pfilter)
  override def facetCountsFor(collection: String, key: String,
                              values: Set[String],
                              pfilter: PayloadFilter = PayloadFilter.Empty): Map[String, Long] =
    inner.facetCountsFor(r(collection), key, values, pfilter)
  override def textRankPartials(collection: String, key: String,
                                terms: Seq[String]): TextRankPartials =
    inner.textRankPartials(r(collection), key, terms)
  override def textRankStats(collection: String, key: String,
                             terms: Seq[String]): TextRankStats =
    inner.textRankStats(r(collection), key, terms)
  override def textRankTopK(collection: String, key: String,
                            terms: Seq[String], k: Int,
                            global: TextRankStats, k1: Double = 1.2,
                            b: Double = 0.75): Seq[(String, Double)] =
    inner.textRankTopK(r(collection), key, terms, k, global, k1, b)
  override def searchTextRanked(collection: String, key: String,
                                terms: Seq[String], k: Int,
                                k1: Double = 1.2,
                                b: Double = 0.75): Seq[(String, Double)] =
    inner.searchTextRanked(r(collection), key, terms, k, k1, b)
  override def logSize(collection: String): Long = inner.logSize(r(collection))
  override def logStart(collection: String): Long = inner.logStart(r(collection))
  override def logEntries(collection: String, from: Long,
                          until: Long): Iterator[LogEntry] =
    inner.logEntries(r(collection), from, until)
}

object AliasedCollectionStore {

  /** One alias action (the backend's `update_aliases` request carries a
    * list of these, applied as one atomic batch).
    */
  sealed trait AliasAction
  final case class CreateAlias(alias: String, collection: String) extends AliasAction
  final case class DeleteAlias(alias: String) extends AliasAction

  /** Apply `actions` to registered store `storeName` ATOMICALLY: deletes
    * and (re)creations land as one wrapper swap — a reader either sees
    * the full old alias map or the full new one. Creating an alias that
    * exists re-points it (the backend's swap idiom is delete+create in
    * one batch; plain re-create does the same here).
    */
  def updateAliases(storeName: String, actions: Seq[AliasAction]): Unit =
    CollectionStores.update(storeName) { s =>
      val (inner, current) = s match {
        case a: AliasedCollectionStore => (a.inner, a.aliases)
        case other => (other, Map.empty[String, String])
      }
      // existence checks against enumerable stores (a store that cannot
      // list collections reports none — then the wrapper's own
      // single-level rule is the only enforceable invariant)
      val names = inner.collectionNames.toSet
      val next = actions.foldLeft(current) {
        case (m, CreateAlias(a, c)) =>
          if (names.nonEmpty) {
            require(names.contains(c),
              s"alias '$a' targets unknown collection '$c'")
            require(!names.contains(a),
              s"'$a' is a collection name; aliases may not shadow collections")
          }
          m.updated(a, c)
        case (m, DeleteAlias(a)) => m - a
      }
      if (next.isEmpty) inner else new AliasedCollectionStore(inner, next)
    }

  /** The alias map of registered store `storeName` (empty when none). */
  def listAliases(storeName: String): Map[String, String] =
    CollectionStores.get(storeName) match {
      case a: AliasedCollectionStore => a.aliases
      case _ => Map.empty
    }

  /** Resolve `collection` through `store`'s alias map (identity for
    * un-wrapped stores): MUTATING paths must write to the TARGET
    * collection so a write through an alias lands exactly where a read
    * through it looks — the backend's writes-through-alias contract.
    */
  def resolve(store: CollectionStore, collection: String): String =
    store match {
      case a: AliasedCollectionStore => a.aliases.getOrElse(collection, collection)
      case _ => collection
    }

  /** Is `name` an alias on `store`? (DDL guards: a collection may not be
    * created under, or dropped via, an alias name.)
    */
  def isAlias(store: CollectionStore, name: String): Boolean = store match {
    case a: AliasedCollectionStore => a.aliases.contains(name)
    case _ => false
  }

  /** Alias-preserving mutation: apply `f` to the UNDERLYING store
    * (unwrapping one alias layer, rewrapping with the same alias map) —
    * every registry-mutating path goes through this so an aliased store
    * accepts the same writes its bare inner store does.
    */
  def mapInner(store: CollectionStore)
              (f: CollectionStore => CollectionStore): CollectionStore =
    store match {
      case a: AliasedCollectionStore =>
        new AliasedCollectionStore(f(a.inner), a.aliases)
      case other => f(other)
    }
}
