package graft.sources

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.collections.CollectionDescriptor

/** A Spark `TableCatalog` over a registered [[CollectionStore]] — the
  * Spark-native form of the reference's "register each collection as a
  * table in the SessionContext" surface (A1,
  * /root/reference/src/table.rs:84-146), upgraded from per-table
  * registration calls to a CATALOG: configure once,
  * {{{
  * spark.sql.catalog.graft_cat       = graft.sources.CollectionCatalog
  * spark.sql.catalog.graft_cat.store = myStore
  * }}}
  * and every collection the store serves is addressable as
  * `graft_cat.<collection>` in SQL — `SHOW TABLES IN graft_cat`,
  * `SELECT ... FROM graft_cat.embeddings`, `INSERT INTO`, and
  * `CREATE TABLE graft_cat.c2 (id STRING, payload STRING, ...)` (the
  * descriptor is recovered from the declared schema,
  * [[CollectionDescriptor.fromSchema]]). All reads/writes resolve to the
  * same [[CollectionTable]] the path-based API uses, so pushdown,
  * statistics, and the write path are identical.
  *
  * Collections live in the catalog's single flat namespace (the
  * reference's client likewise has no nested namespaces).
  */
class CollectionCatalog extends TableCatalog with SupportsNamespaces {
  private var catalogName: String = _
  private var storeName: String = _
  private var partitions: Int = 4

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    storeName = Option(options.get("store")).getOrElse(
      throw new IllegalArgumentException(
        s"catalog '$name' needs spark.sql.catalog.$name.store=<registered store name>"))
    partitions = math.max(1, options.getInt("partitions", 4))
  }

  override def name(): String = catalogName

  private def store: CollectionStore = CollectionStores.get(storeName)

  private def requireFlat(namespace: Array[String]): Unit =
    if (namespace.nonEmpty) throw new NoSuchNamespaceException(namespace)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireFlat(namespace)
    store.collectionNames.map(Identifier.of(Array.empty[String], _)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().isEmpty && store.collectionNames.contains(ident.name())

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident))
      throw new NoSuchTableException(ident.namespace().toSeq :+ ident.name())
    new CollectionTable(storeName, ident.name(), partitions)
  }

  override def createTable(ident: Identifier, schema: StructType,
                           transforms: Array[Transform],
                           properties: java.util.Map[String, String]): Table = {
    requireFlat(ident.namespace())
    if (transforms.nonEmpty)
      throw new UnsupportedOperationException(
        "collection stores manage their own layout; PARTITIONED BY is not supported")
    val desc = CollectionDescriptor.fromSchema(ident.name(), schema)
    // Existence check INSIDE the atomic update closure: a check outside it
    // is check-then-act — two concurrent CREATEs of the same name could
    // both pass and the loser's (empty) collection would be silently
    // replaced instead of raising TableAlreadyExistsException.
    CollectionStores.update(storeName) {
      case mem: InMemoryCollectionStore =>
        if (mem.collectionNames.contains(ident.name()))
          throw new TableAlreadyExistsException(
            ident.namespace().toSeq :+ ident.name())
        mem.withCollection(ident.name(), desc)
      case other => throw new UnsupportedOperationException(
        s"store ${other.getClass.getName} does not accept local DDL")
    }
    new CollectionTable(storeName, ident.name(), partitions)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (ident.namespace().nonEmpty) return false
    // Same atomicity rule as createTable: decide existence and mutate in
    // one computeIfPresent step so concurrent DROPs report exactly one
    // `true`.
    var dropped = false
    CollectionStores.update(storeName) {
      case mem: InMemoryCollectionStore =>
        if (!mem.collectionNames.contains(ident.name())) { dropped = false; mem }
        else { dropped = true; mem.withoutCollection(ident.name()) }
      case other => throw new UnsupportedOperationException(
        s"store ${other.getClass.getName} does not accept local DDL")
    }
    dropped
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "collection field configs are immutable once created")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "collection stores do not support rename")

  // -- SupportsNamespaces: the single flat (root) namespace ----------------
  // `SHOW NAMESPACES IN <cat>` / `USE <cat>` resolve without error; the
  // root is the only namespace, matching the store's flat collection space.

  override def listNamespaces(): Array[Array[String]] = Array.empty

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    requireFlat(namespace)
    Array.empty
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty

  override def loadNamespaceMetadata(
      namespace: Array[String]): java.util.Map[String, String] = {
    requireFlat(namespace)
    java.util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: java.util.Map[String, String]): Unit =
    throw new UnsupportedOperationException(
      "collection stores have a single flat namespace")

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "collection stores have a single flat namespace")

  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "collection stores have a single flat namespace")
}
