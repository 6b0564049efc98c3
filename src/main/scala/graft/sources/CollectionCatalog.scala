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
    CollectionStores.get(storeName) match {
      // REMOTE DDL: the wire client ships the config and the SERVICE owns
      // the atomic existence check — plain SQL `CREATE TABLE` against a
      // remote backend, the same path its native clients use
      case rest: RestCollectionStore =>
        try rest.createCollection(desc)
        catch {
          case _: IllegalStateException =>
            throw new TableAlreadyExistsException(
              ident.namespace().toSeq :+ ident.name())
        }
      case _ =>
        CollectionStores.update(storeName) { s0 =>
          // an alias name already resolves for readers — CREATE under it
          // is an existence conflict, same as a concrete collection
          if (AliasedCollectionStore.isAlias(s0, ident.name()))
            throw new TableAlreadyExistsException(
              ident.namespace().toSeq :+ ident.name())
          AliasedCollectionStore.mapInner(s0) {
            case mem: InMemoryCollectionStore =>
              if (mem.collectionNames.contains(ident.name()))
                throw new TableAlreadyExistsException(
                  ident.namespace().toSeq :+ ident.name())
              mem.withCollection(ident.name(), desc)
            case other => throw new UnsupportedOperationException(
              s"store ${other.getClass.getName} does not accept local DDL")
          }
        }
    }
    new CollectionTable(storeName, ident.name(), partitions)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (ident.namespace().nonEmpty) return false
    // Same atomicity rule as createTable: decide existence and mutate in
    // one computeIfPresent step so concurrent DROPs report exactly one
    // `true`.
    var dropped = false
    CollectionStores.get(storeName) match {
      case rest: RestCollectionStore =>
        dropped = rest.deleteCollection(ident.name())
      case _ =>
        CollectionStores.update(storeName) { s0 =>
          // DROP via an alias is rejected (delete the alias instead) —
          // silently dropping the target would strand every other alias
          if (AliasedCollectionStore.isAlias(s0, ident.name()))
            throw new UnsupportedOperationException(
              s"'${ident.name()}' is an alias; remove the alias or drop its target")
          AliasedCollectionStore.mapInner(s0) {
            case mem: InMemoryCollectionStore =>
              if (!mem.collectionNames.contains(ident.name())) { dropped = false; mem }
              else { dropped = true; mem.withoutCollection(ident.name()) }
            case other => throw new UnsupportedOperationException(
              s"store ${other.getClass.getName} does not accept local DDL")
          }
        }
    }
    dropped
  }

  /** ALTER TABLE ... ADD COLUMNS — the one schema evolution a collection
    * supports: appending NEW vector fields. Existing points simply lack
    * the field and decode as NULL (the standing heterogeneity rule), so
    * no data rewrite happens — this is a descriptor-only change, which is
    * exactly why it is safe at any scale. Everything else (drop, rename,
    * type change, repositioning) would silently change the meaning of
    * stored points and is rejected.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    requireFlat(ident.namespace())
    val adds = changes.map {
      case a: TableChange.AddColumn =>
        if (a.fieldNames().length != 1)
          throw new UnsupportedOperationException(
            "collection schemas have no nested columns")
        if (a.position() != null)
          throw new UnsupportedOperationException(
            "new collection fields always append (FIRST/AFTER not supported)")
        org.apache.spark.sql.types.StructField(
          a.fieldNames()(0), a.dataType(), nullable = true)
      case other => throw new UnsupportedOperationException(
        s"collections only support ADD COLUMNS (new vector fields); got $other")
    }
    // validate the additions through the same schema->descriptor rules as
    // CREATE TABLE: a minimal (id, payload, <adds>) schema must parse
    val newFields = CollectionDescriptor.fromSchema(ident.name(),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.StringType, nullable = true)) ++ adds)).fields
    CollectionStores.update(storeName) {
      case mem: InMemoryCollectionStore =>
        if (!mem.collectionNames.contains(ident.name()))
          throw new NoSuchTableException(ident.namespace().toSeq :+ ident.name())
        val old = mem.collectionInfo(ident.name())
        if (!old.named)
          throw new UnsupportedOperationException(
            "an unnamed single-vector collection cannot gain fields")
        val taken = old.schema.fieldNames.toSet
        val newPhysical = CollectionDescriptor(ident.name(), newFields)
          .schema.fieldNames.drop(2) // id, payload
        val clash = newPhysical.filter(taken.contains) ++
          newFields.map(_.name).filter(f => old.fields.exists(_.name == f))
        if (clash.nonEmpty)
          throw new IllegalArgumentException(
            s"column(s) ${clash.distinct.mkString(", ")} already exist in '${ident.name()}'")
        mem.withFieldConfig(ident.name(), old.copy(fields = old.fields ++ newFields))
      case other => throw new UnsupportedOperationException(
        s"store ${other.getClass.getName} does not accept local DDL")
    }
    new CollectionTable(storeName, ident.name(), partitions)
  }

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
