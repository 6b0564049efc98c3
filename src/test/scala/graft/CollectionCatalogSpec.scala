package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.collections._
import graft.sources._

/** The TableCatalog surface: collections addressed as `<catalog>.<name>`
  * in SQL, DDL mapped onto the store (CREATE TABLE derives the field
  * config from the declared schema, DROP TABLE removes the collection),
  * and reads resolving to the same CollectionTable as the path API.
  */
class CollectionCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val desc = CollectionDescriptor("c", Seq(
    DenseField("text_embedding", 2),
    SparseField("keywords")))

  private def freshCatalog(): Unit = {
    CollectionStores.register("cat_store", InMemoryCollectionStore.single(
      "points", desc.copy(name = "points"),
      (0 until 10).map(i => Point(i.toString, Some(s"""{"i": $i}"""),
        dense = Map("text_embedding" -> Array(i.toFloat, 0f))))))
    spark.conf.set("spark.sql.catalog.cat_test",
      "graft.sources.CollectionCatalog")
    spark.conf.set("spark.sql.catalog.cat_test.store", "cat_store")
  }

  test("SELECT through the catalog resolves the collection with pushdown intact") {
    freshCatalog()
    val out = spark.sql(
      "SELECT id, payload FROM cat_test.points WHERE id > '7' ORDER BY id")
    assert(out.collect().map(_.getString(0)).toSeq === Seq("8", "9"))
    // the keyset predicate reached the store scan, not a post-scan filter
    // (inspected on the sort-free form — the ORDER BY's exchange wraps
    // the executed plan in AQE, hiding the scan node from collectFirst)
    val scan = spark.sql("SELECT id FROM cat_test.points WHERE id > '7'")
      .queryExecution.executedPlan.collectFirst {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.asInstanceOf[CollectionScan]
      }.get
    assert(scan.description().contains("idLower=7"), scan.description())
  }

  test("SHOW TABLES lists the store's collections") {
    freshCatalog()
    val names = spark.sql("SHOW TABLES IN cat_test")
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(names === Set("points"))
  }

  test("the flat root namespace resolves: USE, SHOW NAMESPACES, DESCRIBE") {
    freshCatalog()
    // SHOW NAMESPACES needs SupportsNamespaces; the store's collection
    // space is flat, so the root is the only namespace
    assert(spark.sql("SHOW NAMESPACES IN cat_test").collect().isEmpty)
    spark.sql("USE cat_test")
    try {
      assert(spark.sql("SELECT count(*) AS n FROM points").head().getLong(0) === 10L)
      val cols = spark.sql("DESCRIBE TABLE cat_test.points")
        .select("col_name").collect().map(_.getString(0)).toSet
      assert(cols.contains("id") && cols.contains("text_embedding"))
    } finally spark.sql("USE spark_catalog.default")
  }

  test("CREATE TABLE derives the descriptor from the declared schema; INSERT round-trips") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS cat_test.fresh")
    spark.sql(
      """CREATE TABLE cat_test.fresh (
        |  id STRING NOT NULL, payload STRING,
        |  image_embedding ARRAY<FLOAT>,
        |  tags_indices ARRAY<INT>, tags_values ARRAY<FLOAT>)""".stripMargin)
    val store = CollectionStores.get("cat_store")
    assert(store.collectionInfo("fresh") === CollectionDescriptor("fresh", Seq(
      DenseField("image_embedding", 0), SparseField("tags"))))
    spark.sql(
      """INSERT INTO cat_test.fresh VALUES
        |  ('a', '{"x":1}', array(CAST(1.5 AS FLOAT), CAST(2.5 AS FLOAT)), array(3), array(CAST(0.5 AS FLOAT))),
        |  ('b', NULL, NULL, NULL, NULL)""".stripMargin)
    val back = spark.sql("SELECT * FROM cat_test.fresh ORDER BY id").collect()
    assert(back.length === 2)
    assert(back(0).getSeq[Float](2) === Seq(1.5f, 2.5f))
    assert(back(0).getSeq[Int](3) === Seq(3))
    assert(back(1).isNullAt(1) && back(1).isNullAt(2) && back(1).isNullAt(3))
    // DROP removes the collection from the store
    assert(spark.sql("DROP TABLE cat_test.fresh") != null)
    assert(!CollectionStores.get("cat_store").collectionNames.contains("fresh"))
  }

  test("ALTER TABLE ADD COLUMNS appends fields; destructive changes reject") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS cat_test.evolve")
    spark.sql("CREATE TABLE cat_test.evolve (id STRING, payload STRING, emb ARRAY<FLOAT>)")
    spark.sql("INSERT INTO cat_test.evolve VALUES ('a', NULL, array(CAST(1.0 AS FLOAT)))")
    // append a dense field AND a sparse pair in one ALTER
    spark.sql(
      """ALTER TABLE cat_test.evolve
        |ADD COLUMNS (emb2 ARRAY<FLOAT>, tg_indices ARRAY<INT>, tg_values ARRAY<FLOAT>)""".stripMargin)
    assert(CollectionStores.get("cat_store").collectionInfo("evolve").fields ===
      Seq(DenseField("emb", 0), DenseField("emb2", 0), SparseField("tg")))
    // pre-alter rows decode the new fields as NULL; post-alter rows carry them
    spark.sql(
      """INSERT INTO cat_test.evolve VALUES
        |  ('b', NULL, array(CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT)),
        |   array(1), array(CAST(0.5 AS FLOAT)))""".stripMargin)
    val back = spark.sql("SELECT * FROM cat_test.evolve ORDER BY id").collect()
    assert(back(0).isNullAt(3) && back(0).isNullAt(4) && back(0).isNullAt(5))
    assert(back(1).getSeq[Float](3) === Seq(3.0f))
    assert(back(1).getSeq[Int](4) === Seq(1))
    // duplicate names, drops, and renames are rejected
    assert(intercept[Exception](
      spark.sql("ALTER TABLE cat_test.evolve ADD COLUMNS (emb ARRAY<FLOAT>)"))
      .getMessage.toLowerCase.contains("exist"))
    intercept[Exception](spark.sql("ALTER TABLE cat_test.evolve DROP COLUMN emb"))
    intercept[Exception](spark.sql("ALTER TABLE cat_test.evolve RENAME COLUMN emb TO e"))
    spark.sql("DROP TABLE cat_test.evolve")
  }

  test("a single dense column named `vector` infers the UNNAMED collection") {
    val d = CollectionDescriptor.fromSchema("u",
      Collections.homogeneousDescriptor.schema)
    assert(d === Collections.homogeneousDescriptor.copy(name = "u",
      fields = Seq(DenseField("vector", 0))))
    assert(!d.named)
    // and the round trip through schema() is stable
    assert(CollectionDescriptor.fromSchema("u", d.schema) === d)
  }

  test("fromSchema rejects non-collection shapes") {
    intercept[IllegalArgumentException] {
      CollectionDescriptor.fromSchema("bad",
        org.apache.spark.sql.types.StructType.fromDDL("id STRING, v ARRAY<FLOAT>"))
    }
    intercept[IllegalArgumentException] {
      CollectionDescriptor.fromSchema("bad",
        org.apache.spark.sql.types.StructType.fromDDL(
          "id STRING, payload STRING, v ARRAY<DOUBLE>"))
    }
    // a sparse values half that is not ARRAY<FLOAT> must be rejected, not
    // silently coerced — the store round-trips floats, so the reported
    // table schema would diverge from the declared DDL
    val e = intercept[IllegalArgumentException] {
      CollectionDescriptor.fromSchema("bad",
        org.apache.spark.sql.types.StructType.fromDDL(
          "id STRING, payload STRING, tags_indices ARRAY<INT>, tags_values ARRAY<DOUBLE>"))
    }
    assert(e.getMessage.contains("ARRAY<FLOAT>"), e.getMessage)
    intercept[IllegalArgumentException] {
      CollectionDescriptor.fromSchema("bad",
        org.apache.spark.sql.types.StructType.fromDDL(
          "id STRING, payload STRING, tags_indices ARRAY<INT>, tags_values ARRAY<STRING>"))
    }
    ()
  }

  test("concurrent CREATE/DROP of the same name are atomic: exactly one wins") {
    freshCatalog()
    val cat = new CollectionCatalog
    cat.initialize("cat_test", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Collections.singletonMap("store", "cat_store")))
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array.empty[String], "race")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id STRING, payload STRING, v ARRAY<FLOAT>")
    // two threads race createTable; the existence check lives inside the
    // store's atomic update, so exactly one succeeds and the other gets
    // TableAlreadyExistsException (check-then-act outside the closure
    // would let both pass and the second silently replace the first)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    try {
      val gate = new CountDownLatch(1)
      val attempts = (0 until 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          override def call(): Boolean = {
            gate.await()
            try { cat.createTable(ident, schema,
              Array.empty[org.apache.spark.sql.connector.expressions.Transform],
              java.util.Collections.emptyMap[String, String]()); true }
            catch {
              case _: org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException => false
            }
          }
        })
      }
      gate.countDown()
      val created = attempts.count(_.get(30, TimeUnit.SECONDS))
      assert(created === 1, s"expected exactly 1 winning CREATE, got $created")
      // same contract for DROP: exactly one caller observes `true`
      val gate2 = new CountDownLatch(1)
      val drops = (0 until 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Boolean] {
          override def call(): Boolean = { gate2.await(); cat.dropTable(ident) }
        })
      }
      gate2.countDown()
      val dropped = drops.count(_.get(30, TimeUnit.SECONDS))
      assert(dropped === 1, s"expected exactly 1 winning DROP, got $dropped")
      assert(!CollectionStores.get("cat_store").collectionNames.contains("race"))
    } finally pool.shutdownNow()
  }

  test("CTAS derives the collection from the SELECT; a failed create leaves nothing") {
    freshCatalog()
    spark.sql("DROP TABLE IF EXISTS cat_test.copy")
    spark.sql(
      """CREATE TABLE cat_test.copy AS
        |SELECT id, payload, text_embedding, keywords_indices, keywords_values
        |FROM cat_test.points WHERE id < '5'""".stripMargin)
    assert(spark.sql("SELECT count(*) AS n FROM cat_test.copy").head().getLong(0) === 5L)
    assert(CollectionStores.get("cat_store").collectionInfo("copy").fields ===
      Seq(DenseField("text_embedding", 0), SparseField("keywords")))
    spark.sql("DROP TABLE cat_test.copy")
    // a SELECT that is not collection-shaped (no payload column) fails at
    // createTable and must leave no table behind
    intercept[Exception] {
      spark.sql("CREATE TABLE cat_test.bad AS SELECT id, text_embedding FROM cat_test.points")
    }
    assert(!CollectionStores.get("cat_store").collectionNames.contains("bad"))
  }

  test("DELETE FROM deletes by id through the store; other predicates decline") {
    freshCatalog()
    spark.sql("DELETE FROM cat_test.points WHERE id IN ('1', '2')")
    val store = CollectionStores.get("cat_store")
    assert(store.pointCount("points") === 8)
    // the change log recorded the deletes as tombstones (CDC-visible)
    assert(store.logSize("points") === 12)
    // a predicate the id path declines falls back to the GROUP-BASED
    // rewrite (SupportsRowLevelOperations): the row with payload {"i": 5}
    // goes, nothing else — never a wrong-row delete
    spark.sql("DELETE FROM cat_test.points WHERE payload LIKE '%5%'")
    assert(CollectionStores.get("cat_store").pointCount("points") === 7)
    assert(!spark.sql("SELECT id FROM cat_test.points")
      .collect().map(_.getString(0)).contains("5"))
    // no WHERE = truncate
    spark.sql("DELETE FROM cat_test.points")
    assert(CollectionStores.get("cat_store").pointCount("points") === 0)
    // TRUNCATE TABLE rides SupportsDeleteV2's default truncateTable()
    freshCatalog()
    spark.sql("TRUNCATE TABLE cat_test.points")
    assert(CollectionStores.get("cat_store").pointCount("points") === 0)
    // truncation is tombstoned like any delete: the log replays it
    assert(CollectionStores.get("cat_store").logSize("points") === 20)
  }

  test("UPDATE rewrites atomically and logs the CDC diff") {
    freshCatalog()
    spark.sql("""UPDATE cat_test.points SET payload = '{"u":1}' WHERE id = '3'""")
    val store = CollectionStores.get("cat_store")
    assert(store.pointCount("points") === 10)
    val p3 = store.queryPoints("points", 0, 100, withPayload = true,
      Seq.empty, None, idFilter = Some(Set("3"))).next()
    assert(p3.payload === Some("""{"u":1}"""))
    // the copy-on-write rewrite logs its diff: 10 seal upserts + 10
    // rewrite upserts (whole-collection group), 0 tombstones — a CDC
    // consumer replaying the log converges to the updated contents
    assert(store.logSize("points") === 20)
    val ops = store.logEntries("points", 0, 20).toSeq
    assert(ops.count(_.op == graft.sources.LogOps.Upsert) === 20)
    assert(ops.filter(_.seq >= 10).count(e =>
      e.point.id == "3" && e.point.payload.contains("""{"u":1}""")) === 1)
  }

  test("unknown table raises AnalysisException, not a store error") {
    freshCatalog()
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT * FROM cat_test.nope").collect()
    }
    assert(e.getMessage.toLowerCase.contains("nope"), e.getMessage)
  }

  test("distributeById declares clustering + ordering on the write (sharded-backend routing)") {
    val table = new CollectionTable("cat_store", "points", 2)
    def writeFor(opts: java.util.Map[String, String]) = {
      val info = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
        override def queryId(): String = "q-dist-test"
        override def schema(): org.apache.spark.sql.types.StructType =
          desc.copy(name = "points").schema
        override def options(): org.apache.spark.sql.util.CaseInsensitiveStringMap =
          new org.apache.spark.sql.util.CaseInsensitiveStringMap(opts)
      }
      table.newWriteBuilder(info).build()
        .asInstanceOf[org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering]
    }
    freshCatalog()
    val plain = writeFor(java.util.Collections.emptyMap())
    assert(plain.requiredDistribution() ===
      org.apache.spark.sql.connector.distributions.Distributions.unspecified())
    assert(plain.requiredOrdering().isEmpty)
    val dist = writeFor(java.util.Collections.singletonMap("distributeById", "true"))
    assert(dist.requiredDistribution().toString.contains("id"),
      dist.requiredDistribution().toString)
    assert(dist.requiredOrdering().length === 1)
    assert(dist.requiredOrdering().head.toString.toLowerCase.contains("asc"),
      dist.requiredOrdering().head.toString)
    // behavioral: a distributed write still round-trips exactly
    import spark.implicits._
    val src = (20 until 30).map(i => (i.toString, s"""{"i": $i}""",
        Seq(i.toFloat, 1f), null: Seq[Int], null: Seq[Float]))
      .toDF("id", "payload", "text_embedding", "keywords_indices", "keywords_values")
      .repartition(4)
    src.write.format("graft.sources.CollectionDataSource")
      .option("store", "cat_store").option("collection", "points")
      .option("distributeById", "true")
      .mode("append").save()
    val back = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "cat_store").option("collection", "points").load()
    assert(back.count() === 20)
    assert(back.filter(col("id") === "25").head().getString(1) === """{"i": 25}""")
  }
}
