package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.scalatest.funsuite.AnyFunSuite
import graft.collections._
import graft.sources._

/** DSv2 connector parity with the reference scan (SURVEY.md §2.A A1-A6):
  * schema inference from the store's collection config, projection pushdown
  * narrowing the remote fetch (VectorSelector analog), limit pushdown, and
  * NULL-for-absent-field decode — partitioned N ways.
  */
class CollectionDataSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val desc = CollectionDescriptor("c", Seq(
    DenseField("text_embedding", 2),
    MultiField("multi", 2),
    SparseField("keywords")))

  private def mkPoints(n: Int): IndexedSeq[Point] =
    (0 until n).map { i =>
      Point(
        id = i.toString,
        payload = if (i % 4 == 0) None else Some(s"""{"i": $i}"""),
        dense = if (i % 3 != 2) Map("text_embedding" -> Array(i.toFloat, i + 0.5f)) else Map.empty,
        multi = if (i % 3 == 0) Map("multi" -> Array(Array(1f, 2f), Array(3f, 4f))) else Map.empty,
        sparse = if (i % 2 == 0) Map("keywords" -> (Array(1, 5), Array(0.1f, 0.9f))) else Map.empty)
    }

  private def readDf(partitions: Int = 3) = {
    CollectionStores.register("t1",
      InMemoryCollectionStore.single("c", desc, mkPoints(20)))
    spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "t1").option("collection", "c")
      .option("partitions", partitions.toString).load()
  }

  private def scanOf(df: org.apache.spark.sql.DataFrame): CollectionScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[CollectionScan]
    }.get

  test("A1: schema inferred from collection config") {
    val df = readDf()
    assert(df.schema === desc.schema)
  }

  test("A2/A6: full scan decodes all rows with NULL for absent fields") {
    val df = readDf()
    assert(df.count() === 20)
    val r = df.orderBy(col("id").cast("int")).collect()
    assert(r(0).getString(0) === "0")
    assert(r(0).isNullAt(1))                        // payload absent -> NULL
    assert(!r(1).isNullAt(1))
    assert(r(2).isNullAt(df.schema.fieldIndex("text_embedding")))  // i%3==2
    assert(r(1).isNullAt(df.schema.fieldIndex("multi")))
    assert(r(1).isNullAt(df.schema.fieldIndex("keywords_indices")))
    assert(r(2).getSeq[Int](df.schema.fieldIndex("keywords_indices")) === Seq(1, 5))
  }

  test("A3: projection pushdown narrows the remote fetch spec") {
    val df = readDf().select("id", "keywords_values")
    val scan = scanOf(df)
    assert(scan.fetchSpec === FetchSpec(withPayload = false, Seq("keywords")))
    assert(scan.readSchema().fieldNames.toSeq === Seq("id", "keywords_values"))
    // id-only projection fetches no vectors at all
    val scan2 = scanOf(readDf().select("id"))
    assert(scan2.fetchSpec === FetchSpec(withPayload = false, Seq.empty))
    assert(df.count() === 20)
  }

  test("A4: limit pushdown reaches the scan and bounds partition planning") {
    val df = readDf(partitions = 3).limit(4)
    val scan = scanOf(df)
    assert(scan.description().contains("limit=Some(4)"))
    // only the first 4 points are planned across partitions
    assert(scan.planInputPartitions()
      .map(_.asInstanceOf[CollectionInputPartition])
      .map(p => p.until - p.from).sum === 4)
    assert(df.count() === 4)
  }

  test("A5: id equality/IN filters push to the store; other predicates stay post-scan") {
    val df = readDf().filter(col("id").isin("3", "7", "11")).select("id", "payload")
    val scan = scanOf(df)
    assert(scan.description().contains("idFilter={11,3,7}"), scan.description())
    assert(df.count() === 3)
    val eq = readDf().filter(col("id") === "5").select("id")
    assert(scanOf(eq).description().contains("idFilter={5}"), scanOf(eq).description())
    assert(eq.collect().map(_.getString(0)).toSeq === Seq("5"))
    // conjunction of two pushed id predicates intersects
    val both = readDf().filter(col("id").isin("3", "7") && col("id") === "7").select("id")
    assert(scanOf(both).description().contains("idFilter={7}"), scanOf(both).description())
    assert(both.collect().map(_.getString(0)).toSeq === Seq("7"))
    // a non-id predicate is NOT pushed and still filters correctly
    val post = readDf().filter(col("payload").isNotNull && col("id").isin("3", "4"))
    assert(scanOf(post).description().contains("idFilter={3,4}"))
    assert(post.select("id").collect().map(_.getString(0)).sorted.toSeq === Seq("3"))
  }

  test("A5: keyset scroll `id > last` pushes to the store scan") {
    val df = readDf().filter(col("id") > "15").select("id")
    val scan = scanOf(df)
    assert(scan.description().contains("idLower=15"), scan.description())
    // the predicate is accepted as EXACT — no residual post-scan Filter
    // node remains; rows outside the bound never leave the store
    assert(!df.queryExecution.executedPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.FilterExec]),
      df.queryExecution.executedPlan.toString)
    // lexicographic page over string ids: "16".."19" then "2".."9"
    assert(df.collect().map(_.getString(0)).sorted.toSeq ===
      Seq("16", "17", "18", "19", "2", "3", "4", "5", "6", "7", "8", "9"))
    // conjunction of two keyset bounds keeps the tightest
    val both = readDf().filter(col("id") > "15" && col("id") > "17").select("id")
    assert(scanOf(both).description().contains("idLower=17"),
      scanOf(both).description())
    // keyset + id-IN compose: both push, both apply
    val mixed = readDf().filter(col("id") > "15" && col("id").isin("16", "3"))
    assert(scanOf(mixed).description().contains("idLower=15"))
    assert(scanOf(mixed).description().contains("idFilter={16,3}"))
    assert(mixed.select("id").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("16", "3"))
  }

  test("keyset bound compares like Spark (UTF-8 bytes), not Java (UTF-16 units)") {
    // U+1F600 encodes as 4-byte UTF-8 (F0 9F 98 80) > U+E000 (EE 80 80),
    // but its UTF-16 surrogate D83D < E000 — Java ordering would wrongly
    // drop the row, and with no residual filter Spark would never catch it
    val pts = IndexedSeq(Point("😀", Some("{}")), Point("b", Some("{}")))
    CollectionStores.register("t9", InMemoryCollectionStore.single("c", desc, pts))
    val df = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "t9").option("collection", "c").load()
      .filter(col("id") > "\uE000").select("id")
    assert(df.collect().map(_.getString(0)).toSeq === Seq("😀"))
  }

  test("reported statistics let Catalyst broadcast a small collection in a join") {
    import spark.implicits._
    val df = readDf().select("id", "payload")
    // without SupportsReportStatistics a DSv2 relation defaults to an
    // enormous size estimate and this join would sort-merge; the store's
    // 20-point count must put it under the broadcast threshold
    val big = spark.range(0, 10000).select(col("id").cast("string").as("id"))
    val joined = big.join(df, "id")
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("COUNT(*) pushes down to a store metadata hit - no points shipped") {
    val df = readDf().agg(count(lit(1)).as("n"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("CollectionCountScan"), p)
    assert(df.head().getLong(0) === 20L)
    // a count over PUSHED id filters is ALSO complete-pushed — the
    // filtered-count scan walks the narrowed id slice store-side
    val filtered = readDf().filter(col("id").isin("3", "7")).agg(count(lit(1)))
    val fp = filtered.queryExecution.executedPlan.toString
    assert(fp.contains("CollectionFilteredCountScan"), fp)
    assert(filtered.head().getLong(0) === 2L)
    // keyset form: id > '15' matches 16..19 plus '2'..'9' lexicographically
    val keyset = readDf().filter(col("id") > "15").agg(count(lit(1)))
    val kp = keyset.queryExecution.executedPlan.toString
    assert(kp.contains("CollectionFilteredCountScan"), kp)
    assert(keyset.head().getLong(0) ===
      (0 until 20).map(_.toString).count(_ > "15").toLong)
    // a missing id counts 0, and a NON-pushed predicate (payload) still
    // declines complete pushdown — Spark aggregates the scanned rows
    assert(readDf().filter(col("id").isin("3", "nope")).agg(count(lit(1)))
      .head().getLong(0) === 1L)
    val residual = readDf().filter(col("payload").isNotNull).agg(count(lit(1)))
    assert(!residual.queryExecution.executedPlan.toString
      .contains("CollectionFilteredCountScan"))
    // the in-memory store's index-aware count: keyset tail and id-set
    // membership answer WITHOUT materializing points
    val store = CollectionStores.get("t1")
      .asInstanceOf[InMemoryCollectionStore]
    val before = store.pointsTouched.get()
    assert(store.countMatching("c", idLower = Some("15")) ===
      (0 until 20).map(_.toString).count(_ > "15").toLong)
    assert(store.countMatching("c",
      Some(Set("3", "7", "nope")), Some("5")) === 1L)
    assert(store.pointsTouched.get() === before)
  }

  test("keyset + limit together: the store pages BEFORE limiting") {
    // the 3 matching ids ("7","8","9" lexicographically > "6") sit past
    // the first raw points: a limit-capped raw slice would miss them all
    val df = readDf(partitions = 3).filter(col("id") > "6").limit(3)
    assert(df.select("id").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("7", "8", "9"))
  }

  test("filter + limit together: the store filters BEFORE limiting") {
    // ids 18,19 sit at the END of the raw point range: a limit-capped raw
    // slice would miss them
    val df = readDf(partitions = 3).filter(col("id").isin("18", "19")).limit(2)
    assert(df.select("id").collect().map(_.getString(0)).sorted.toSeq === Seq("18", "19"))
  }

  test("fromRows ingests executor-side and round-trips exactly") {
    import spark.implicits._
    val src = (0 until 12).map(i =>
      (i.toString, if (i % 4 == 0) null else s"""{"i": $i}""",
        if (i % 3 != 2) Seq(i.toFloat, i + 0.5f) else null))
      .toDF("id", "payload", "text_embedding")
      .repartition(4) // ingest arrives from several partitions
    val d2 = CollectionDescriptor("c2", Seq(DenseField("text_embedding", 2)))
    CollectionStores.register("t3", InMemoryCollectionStore.fromRows(src, "c2", d2))
    val back = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "t3").option("collection", "c2").load()
    assert(back.count() === 12)
    val r = back.orderBy(col("id").cast("int")).collect()
    assert(r(0).isNullAt(1))          // null payload preserved
    assert(r(2).isNullAt(2))          // absent dense field -> NULL
    assert(r(1).getSeq[Float](2) === Seq(1f, 1.5f))
  }

  test("A12: DSv2 append write commits points into the store atomically") {
    CollectionStores.register("t4",
      InMemoryCollectionStore.single("c", desc, mkPoints(5)))
    val toAdd = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row("100", """{"i": 100}""",
          Seq(1.5f, 2.5f), null, Seq(2, 3), Seq(0.2f, 0.3f)),
        org.apache.spark.sql.Row("101", null,
          null, Seq(Seq(9f, 8f)), null, null)), 2),
      desc.schema)
    toAdd.write.format("graft.sources.CollectionDataSource")
      .option("store", "t4").option("collection", "c")
      .mode("append").save()
    val back = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "t4").option("collection", "c").load()
    assert(back.count() === 7)
    val r100 = back.filter(col("id") === "100").collect().head
    assert(r100.getString(1) === """{"i": 100}""")
    assert(r100.getSeq[Float](back.schema.fieldIndex("text_embedding")) === Seq(1.5f, 2.5f))
    assert(r100.getSeq[Int](back.schema.fieldIndex("keywords_indices")) === Seq(2, 3))
    val r101 = back.filter(col("id") === "101").collect().head
    assert(r101.isNullAt(1))
    assert(r101.isNullAt(back.schema.fieldIndex("text_embedding")))
    assert(r101.getSeq[scala.collection.Seq[Float]](back.schema.fieldIndex("multi"))
      .map(_.toSeq) === Seq(Seq(9f, 8f)))
    // an unknown extra column is rejected before any write happens
    val bad = intercept[Exception] {
      back.withColumn("zzz", lit(1))
        .write.format("graft.sources.CollectionDataSource")
        .option("store", "t4").option("collection", "c")
        .mode("append").save()
    }
    assert(bad.getMessage.toLowerCase.contains("data columns") ||
      bad.getMessage.contains("zzz"), bad.getMessage)
  }

  test("A12: writing an existing id upserts (replaces) instead of duplicating") {
    CollectionStores.register("t5",
      InMemoryCollectionStore.single("c", desc, mkPoints(4)))
    val replace = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row("2", """{"replaced": true}""",
          null, null, null, null)), 1),
      desc.schema)
    replace.write.format("graft.sources.CollectionDataSource")
      .option("store", "t5").option("collection", "c")
      .mode("append").save()
    val back = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "t5").option("collection", "c").load()
    assert(back.count() === 4) // replaced, not appended
    val r2 = back.filter(col("id") === "2").collect()
    assert(r2.length === 1)
    assert(r2.head.getString(1) === """{"replaced": true}""")
  }

  test("A12-streaming: writeStream upserts each micro-batch epoch atomically") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    CollectionStores.register("t6",
      InMemoryCollectionStore.single("c", desc, mkPoints(3)))
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[
      (String, String, Seq[Float], Seq[Seq[Float]], Seq[Int], Seq[Float])]
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sink-ckpt").toString
    val q = ms.toDF()
      .toDF("id", "payload", "text_embedding", "multi",
        "keywords_indices", "keywords_values")
      .writeStream.format("graft.sources.CollectionDataSource")
      .option("store", "t6").option("collection", "c")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      // epoch 1: one new point
      ms.addData(("100", """{"i": 100}""", Seq(1f, 2f), null, null, null))
      q.processAllAvailable()
      def back = spark.read.format("graft.sources.CollectionDataSource")
        .option("store", "t6").option("collection", "c").load()
      assert(back.count() === 4)
      // epoch 2: upsert id 100 + one more point — both visible, no dup
      ms.addData(
        ("100", """{"i": 200}""", Seq(3f, 4f), null, null, null),
        ("101", null, null, null, Seq(1), Seq(0.5f)))
      q.processAllAvailable()
      assert(back.count() === 5)
      assert(back.filter(col("id") === "100").head().getString(1) === """{"i": 200}""")
    } finally q.stop()
  }

  test("a replayed streaming epoch neither duplicates the table nor the upsert log") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    CollectionStores.register("t8",
      InMemoryCollectionStore.single("c", desc, IndexedSeq.empty))
    val table = new CollectionTable("t8", "c", 2)
    val info = new org.apache.spark.sql.connector.write.LogicalWriteInfo {
      override def queryId(): String = "q-replay-test"
      override def schema(): org.apache.spark.sql.types.StructType = desc.schema
      override def options(): org.apache.spark.sql.util.CaseInsensitiveStringMap =
        new org.apache.spark.sql.util.CaseInsensitiveStringMap(
          java.util.Collections.emptyMap())
    }
    // simulate Spark's at-least-once window: the SAME epoch is written and
    // committed twice (driver died after sink commit, before checkpoint)
    def runEpoch(): Unit = {
      val sw = table.newWriteBuilder(info).build().toStreaming
      val w = sw.createStreamingWriterFactory(null).createWriter(0, 0L, 7L)
      w.write(InternalRow.fromSeq(Seq(
        UTF8String.fromString("e7"), null, null, null, null, null)))
      val msg = w.commit()
      sw.commit(7L, Array(msg))
    }
    runEpoch()
    runEpoch()
    val store = CollectionStores.get("t8")
    assert(store.pointCount("c") === 1)
    // the CDC log must hold the upsert ONCE — a duplicate here would
    // stream the epoch twice to every downstream consumer
    assert(store.logSize("c") === 1)
  }

  test("deletes tombstone the change log; the plain stream refuses, the cdc face replays") {
    CollectionStores.register("tdel",
      InMemoryCollectionStore.single("c", desc, mkPoints(5)))
    CollectionStores.update("tdel") {
      case m: InMemoryCollectionStore => m.removed("c", Set("1", "3", "nope"))
      case o => o
    }
    val store = CollectionStores.get("tdel")
    // deleting an absent id ("nope") is a no-op: 2 points removed, 2
    // tombstones logged after the 5 seal-time upserts
    assert(store.pointCount("c") === 3)
    assert(store.logSize("c") === 7)
    // the cdc face replays the full history, deletes included
    val log = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "tdel").option("collection", "c")
      .option("cdc", "true").load()
    assert(log.count() === 7)
    assert(log.filter(col("_op") === "delete")
      .select("id").collect().map(_.getString(0)).toSet === Set("1", "3"))
    // tombstones carry only the id
    assert(log.filter(col("_op") === "delete")
      .collect().forall(r => r.isNullAt(r.fieldIndex("payload"))))
    // _seq is the log position: tombstones sit past the upsert prefix
    assert(log.filter(col("_op") === "delete")
      .select("_seq").collect().map(_.getLong(0)).sorted.toSeq === Seq(5L, 6L))
    // the point-shaped stream has no way to represent a delete — it must
    // fail loudly, not resurrect or silently skip the id
    val ckpt = java.nio.file.Files.createTempDirectory("graft-tdel-ckpt").toString
    val q = spark.readStream.format("graft.sources.CollectionDataSource")
      .option("store", "tdel").option("collection", "c").load()
      .writeStream.format("memory").queryName("tdel_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.processAllAvailable()
      throw q.exception.getOrElse(fail("plain stream accepted a tombstoned log"))
    }
    q.stop()
    assert(e.getMessage.contains("cdc=true"), e.getMessage)
  }

  test("cdc write with _seq applies delete-then-reupsert in exact log order") {
    import org.apache.spark.sql.Row
    CollectionStores.register("tseq",
      InMemoryCollectionStore.single("c", desc, IndexedSeq.empty))
    val schema = CdcSchema.of(desc)
    // rows deliberately OUT of arrival order: only the _seq sort can
    // produce upsert(0) -> delete(1) -> upsert(2) = point alive with the
    // final payload (the upserts-first fallback would delete it)
    val rows = java.util.Arrays.asList(
      Row("delete", 1L, "a", null, null, null, null, null),
      Row("upsert", 2L, "a", """{"v":2}""", null, null, null, null),
      Row("upsert", 0L, "a", """{"v":0}""", null, null, null, null))
    spark.createDataFrame(rows, schema)
      .write.format("graft.sources.CollectionDataSource")
      .option("store", "tseq").option("collection", "c").option("cdc", "true")
      .mode("append").save()
    val store = CollectionStores.get("tseq")
    assert(store.pointCount("c") === 1)
    val back = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "tseq").option("collection", "c").load()
    assert(back.select("payload").head().getString(0) === """{"v":2}""")
    // a cdc frame WITHOUT _seq is rejected (Spark's byName resolution
    // demands the full cdc schema — no silent arrival-order applies)
    val noSeq = org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(_.name == "_seq"))
    val rows2 = java.util.Arrays.asList(
      Row("upsert", "b", """{"v":1}""", null, null, null, null),
      Row("delete", "b", null, null, null, null, null))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.createDataFrame(rows2, noSeq)
        .write.format("graft.sources.CollectionDataSource")
        .option("store", "tseq").option("collection", "c").option("cdc", "true")
        .mode("append").save()
    }
    // and a plain (non-cdc) write refuses op columns outright
    intercept[Exception] {
      spark.createDataFrame(rows2, noSeq)
        .write.format("graft.sources.CollectionDataSource")
        .option("store", "tseq").option("collection", "c")
        .mode("append").save()
    }
    assert(CollectionStores.get("tseq").pointCount("c") === 1) // still just "a"
  }

  test("cdc batch read prunes columns like any scan") {
    CollectionStores.register("cdcprune",
      InMemoryCollectionStore.single("c", desc, mkPoints(5)))
    val df = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "cdcprune").option("collection", "c")
      .option("cdc", "true").load()
      .select("_op", "id")
    assert(df.collect().length === 5)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.get
    assert(scan.readSchema().fieldNames.toSeq === Seq("_op", "id"),
      scan.readSchema().catalogString)
  }

  test("asOfSeq reads the collection as of any change-log position") {
    CollectionStores.register("ttv",
      InMemoryCollectionStore.single("c", desc, mkPoints(4)))
    // history past the seal: delete 1, then re-upsert it with new payload
    CollectionStores.update("ttv") {
      case m: InMemoryCollectionStore => m.removed("c", Set("1"))
      case o => o
    }
    CollectionStores.update("ttv") {
      case m: InMemoryCollectionStore =>
        m.appended("c", IndexedSeq(Point("1", Some("""{"new":1}"""))))
      case o => o
    }
    def readAt(seq: Long) = spark.read
      .format("graft.sources.CollectionDataSource")
      .option("store", "ttv").option("collection", "c")
      .option("asOfSeq", seq.toString).load()
      .select("id", "payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    // log: 4 seal upserts, tombstone(1), re-upsert(1) — 6 entries
    assert(readAt(2).keySet === Set("0", "1"))        // mid-seal prefix
    assert(readAt(4).keySet === Set("0", "1", "2", "3"))
    assert(readAt(5).keySet === Set("0", "2", "3"))   // after the delete
    val now = readAt(6)
    assert(now.keySet === Set("0", "1", "2", "3"))
    assert(now("1") === Some("""{"new":1}"""))        // the re-upsert won
    // and the time-travel read matches the live read at the log head
    val live = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "ttv").option("collection", "c").load()
      .select("id", "payload").collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(now === live)
  }

  test("log compaction: positions preserved, snapshot serves history, pre-base fails loudly") {
    CollectionStores.register("tcomp",
      InMemoryCollectionStore.single("c", desc, mkPoints(4)))
    CollectionStores.update("tcomp") {
      case m: InMemoryCollectionStore => m.removed("c", Set("1"))
      case o => o
    }
    // log: 4 seal upserts + tombstone(1) = positions 0..4; compact to 5
    CollectionStores.update("tcomp") {
      case m: InMemoryCollectionStore => m.compacted("c", 5L)
      case o => o
    }
    CollectionStores.update("tcomp") {
      case m: InMemoryCollectionStore =>
        m.appended("c", IndexedSeq(Point("9", Some("""{"late":1}"""))))
      case o => o
    }
    val store = CollectionStores.get("tcomp").asInstanceOf[InMemoryCollectionStore]
    // global positions survive compaction: head = 6, start = 5
    assert(store.logSize("c") === 6)
    assert(store.logStart("c") === 5)
    val tail = store.logEntries("c", 5, 6).toSeq
    assert(tail.map(_.seq) === Seq(5L))
    assert(tail.head.point.id === "9")
    // dropped positions refuse loudly (no silent partial replay)
    intercept[IllegalStateException] { store.logEntries("c", 0, 6).toSeq }
    // time travel: at the compaction point the snapshot serves the state
    assert(store.stateAt("c", 5L).map(_.id) === Seq("0", "2", "3"))
    assert(store.stateAt("c", 6L).map(_.id) === Seq("0", "2", "3", "9"))
    intercept[IllegalStateException] { store.stateAt("c", 4L) }
    // a FRESH streaming read starts at the compaction point and sees
    // exactly the retained tail
    val ckpt = java.nio.file.Files.createTempDirectory("graft-comp-ckpt").toString
    val q = spark.readStream.format("graft.sources.CollectionDataSource")
      .option("store", "tcomp").option("collection", "c")
      .option("cdc", "true").load()
      .select("_op", "_seq", "id")
      .writeStream.format("memory").queryName("comp_out")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("comp_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(rows === Seq(("upsert", 5L, "9")))
  }

  test("CDC stream over a replica set: in-sync failover resumes exactly-once, a resynced lineage fails the stream loudly") {
    // a replica whose read transport can be cut (the down-node socket)
    final class Flip(var mem: InMemoryCollectionStore)
        extends CollectionStore with RemoteCollectionClient {
      @volatile var down: Boolean = false
      private def r[T](f: CollectionStore => T): T = {
        if (down) throw new java.io.IOException("replica down")
        f(mem)
      }
      override def collectionInfo(c: String) = r(_.collectionInfo(c))
      override def pointCount(c: String): Long = r(_.pointCount(c))
      override def collectionNames: Seq[String] = r(_.collectionNames)
      override def queryPoints(c: String, from: Long, until: Long,
                               withPayload: Boolean,
                               vectorFields: Seq[String],
                               limit: Option[Int],
                               idFilter: Option[Set[String]] = None,
                               idLower: Option[String] = None): Iterator[Point] =
        r(_.queryPoints(c, from, until, withPayload, vectorFields, limit,
          idFilter, idLower))
      override def logSize(c: String): Long = r(_.logSize(c))
      override def logStart(c: String): Long = r(_.logStart(c))
      override def logEntries(c: String, from: Long,
                              until: Long): Iterator[LogEntry] =
        r(_.logEntries(c, from, until))
      override def upsertPoints(c: String, pts: Seq[Point]): Unit =
        mem = mem.appended(c, pts.sortBy(_.id).toIndexedSeq)
      override def deletePoints(c: String, ids: Set[String]): Unit =
        mem = mem.removed(c, ids)
      override def truncate(c: String): Unit = mem = mem.truncated(c)
      override def compact(c: String, upTo: Long): Unit =
        mem = mem.compacted(c, upTo)
    }
    val a = new Flip(InMemoryCollectionStore.single("c", desc, mkPoints(3)))
    val b = new Flip(InMemoryCollectionStore.single("c", desc, mkPoints(3)))
    val rs = new ReplicatedCollectionStore(IndexedSeq(a, b))
    CollectionStores.register("repl_cdc_t", rs)
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-replcdc-ckpt").toString
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def run(): Option[org.apache.spark.sql.streaming.StreamingQueryException] = {
      val q = spark.readStream.format("graft.sources.CollectionDataSource")
        .option("store", "repl_cdc_t").option("collection", "c").load()
        .select("id")
        .writeStream
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => got.add(r.getString(0)): Unit)
        }
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .outputMode("append").start()
      try q.processAllAvailable() catch { case _: Throwable => () }
      val err = q.exception
      q.stop()
      err
    }
    assert(run().isEmpty)
    assert(got.size === 3)
    // the reader is bound to replica 0's journal; cut it between runs —
    // replica 1 carries the SAME lineage (every routed write, same
    // order), so the restarted stream resumes EXACTLY-ONCE from the
    // checkpoint, no duplicates, no gaps
    rs.upsertPoints("c", Seq(Point("50", Some("""{"i": 50}"""),
      dense = Map("text_embedding" -> Array(5f, 5.5f)))))
    a.down = true
    assert(run().isEmpty)
    val ids = {
      val it = got.iterator(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    assert(ids.sorted === Seq("0", "1", "2", "50"))
    // resync the now-bound replica (1): its journal is a truncate+bulk
    // rewrite — a checkpointed reader following it would silently
    // rewind, so the stream must FAIL with the documented error instead
    a.down = false
    rs.resyncReplica(1)
    a.down = true // and the old lineage is unreachable
    val err = run()
    assert(err.isDefined, "the stream must fail on a rewritten journal lineage")
    assert(err.get.toString.contains("journal lineage") ||
      String.valueOf(err.get.getCause).contains("journal lineage"))
  }

  test("streaming read replays the upsert log and streams new batch writes") {
    CollectionStores.register("t7",
      InMemoryCollectionStore.single("c", desc, mkPoints(3)))
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ckpt").toString
    val q = spark.readStream.format("graft.sources.CollectionDataSource")
      .option("store", "t7").option("collection", "c").load()
      .select("id", "payload")
      .writeStream.format("memory").queryName("cdc_out")
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // initial contents replay as the log prefix
      assert(spark.table("cdc_out").count() === 3)
      // a batch write lands as the next micro-batch — including the
      // re-upsert of an existing id (CDC semantics: the CHANGE streams,
      // even though the table still holds one row for id 1)
      val toAdd = spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(
          org.apache.spark.sql.Row("50", """{"i": 50}""", null, null, null, null),
          org.apache.spark.sql.Row("1", """{"i": -1}""", null, null, null, null)), 1),
        desc.schema)
      toAdd.write.format("graft.sources.CollectionDataSource")
        .option("store", "t7").option("collection", "c")
        .mode("append").save()
      q.processAllAvailable()
      val out = spark.table("cdc_out").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(out.length === 5)
      assert(out.contains(("50", """{"i": 50}""")))
      assert(out.contains(("1", """{"i": -1}""")))
      // the store itself holds the upserted state, not a duplicate
      val table = spark.read.format("graft.sources.CollectionDataSource")
        .option("store", "t7").option("collection", "c").load()
      assert(table.count() === 4)
    } finally q.stop()
  }

  test("runtime (join-driven) id filtering reaches the store scan") {
    val df = readDf().select("id", "payload")
    // the filtered small side joins on the scan's declared filter
    // attribute — Spark evaluates it first (reusing its broadcast) and
    // hands the scan the matching ids before partitions are planned.
    // The probe must come from a SOURCE (not a local relation, which
    // constant-folds its filter away — DPP requires a selective Filter
    // node on the filtering side to fire)
    val probe = Tables.load(spark, TestSpark.sfDir, "documents")
      .filter(col("doc_id") < 5)
      .select(col("doc_id").cast("string").as("id"))
    val joined = df.join(probe, "id")
    joined.collect()
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression"), s"no runtime filter injected:\n$p")
    assert(joined.select("id").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("0", "1", "2", "3", "4"))
  }

  test("SQL-only surface: CREATE TEMPORARY VIEW USING the connector") {
    CollectionStores.register("t10",
      InMemoryCollectionStore.single("c", desc, mkPoints(10)))
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW sql_collection
        |USING graft.sources.CollectionDataSource
        |OPTIONS (store 't10', collection 'c', partitions '2')""".stripMargin)
    val out = spark.sql(
      "SELECT id FROM sql_collection WHERE id > '7' ORDER BY id")
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("8", "9"))
    // pushdown works through the SQL path too
    val scan = scanOf(spark.sql("SELECT id FROM sql_collection WHERE id > '7'"))
    assert(scan.description().contains("idLower=7"), scan.description())
  }

  test("keyset seek touches O(page) points, not the skipped prefix") {
    // sealed through the DSv2 commit path (`appended` re-seals id-sorted),
    // so the keyset bound is served as a binary-search SEEK: a page deep
    // into the corpus materializes exactly `page` points from the index —
    // the "flat page cost however deep the scroll goes" claim, measured
    val store = InMemoryCollectionStore.single("c", desc, IndexedSeq.empty)
      .appended("c", (0 until 10000).map(i => Point(f"$i%05d", None)))
    val page = store.queryPoints("c", 0, 10000, withPayload = false, Nil,
      limit = Some(10), idLower = Some("07000")).toSeq
    assert(page.map(_.id) === (7001 to 7010).map(i => f"$i%05d"))
    assert(store.pointsTouched.get() === 10L)
    // through the connector (partitioned 4 ways, each partition seeks
    // within its range): still O(partitions x page), nowhere near the
    // 7000-point prefix a scan-and-discard would touch
    CollectionStores.register("t11", store)
    store.pointsTouched.set(0L)
    val df = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "t11").option("collection", "c")
      .option("partitions", "4").load()
      .filter(col("id") > "07000").select("id").limit(10)
    assert(df.collect().length === 10)
    assert(store.pointsTouched.get() <= 40L, store.pointsTouched.get())
    // an UNSORTED (single-built, arbitrary order) store still answers
    // keyset queries correctly via the filter fallback
    val unsorted = new InMemoryCollectionStore(
      Map("c" -> desc), Map("c" -> IndexedSeq(
        Point("b", None), Point("a", None), Point("c", None))))
    assert(unsorted.queryPoints("c", 0, 3, withPayload = false, Nil, None,
      idLower = Some("a")).map(_.id).toSeq.sorted === Seq("b", "c"))
  }

  test("pushed id-filter cardinality reaches join planning: point lookups broadcast") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // threshold low enough that the FULL 200-point estimate exceeds it
      // while a 3-id point lookup stays far under — the broadcast decision
      // is then driven purely by the reported statistics
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
      CollectionStores.register("t12", InMemoryCollectionStore.single("c", desc,
        (0 until 200).map(i => Point(i.toString, Some(s"""{"i": $i}""")))))
      def coll = spark.read.format("graft.sources.CollectionDataSource")
        .option("store", "t12").option("collection", "c").load()
        .select("id", "payload")
      val fact = spark.range(0, 100000).select(col("id").cast("string").as("id"))
      // control: the unfiltered 200-row estimate is above threshold
      val unfiltered = fact.join(coll, "id")
      assert(!unfiltered.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        unfiltered.queryExecution.executedPlan.toString)
      // a pushed id IN (3 ids) reports 3 rows -> the scan side broadcasts
      val lookup = fact.join(coll.filter(col("id").isin("3", "7", "11")), "id")
      val p = lookup.queryExecution.executedPlan.toString
      assert(p.contains("BroadcastHashJoin"), p)
      assert(lookup.select("id").collect().map(_.getString(0)).sorted.toSeq ===
        Seq("11", "3", "7"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("SELECT COUNT(*), COUNT(*) returns correct results (single-column count scan)") {
    CollectionStores.register("t13",
      InMemoryCollectionStore.single("c", desc, mkPoints(20)))
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW count_collection
        |USING graft.sources.CollectionDataSource
        |OPTIONS (store 't13', collection 'c')""".stripMargin)
    // the count scan emits ONE column, so a multi-CountStar aggregation
    // must not claim complete pushdown (Spark asserts the scan's column
    // count against the pushed Aggregation) — correct values either way
    val r = spark.sql(
      "SELECT COUNT(*) AS a, COUNT(*) AS b, COUNT(*) + 1 AS c FROM count_collection")
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((20L, 20L, 21L)))
  }

  test("epoch replay guard: structured keys cannot collide, replays are refused") {
    // '/'-containing names must not alias each other's guards (a joined
    // string key would make ("a/b","c",q) and ("a","b/c",q) one entry)
    assert(CommittedEpochs.markIfNew("a/b", "c", "q-collide", 5L))
    assert(CommittedEpochs.markIfNew("a", "b/c", "q-collide", 5L))
    // same query key: a replayed (<=) epoch is refused, a later one admitted
    assert(!CommittedEpochs.markIfNew("a/b", "c", "q-collide", 5L))
    assert(!CommittedEpochs.markIfNew("a/b", "c", "q-collide", 4L))
    assert(CommittedEpochs.markIfNew("a/b", "c", "q-collide", 6L))
  }

  test("streaming read refuses pushed filters it would silently drop") {
    // the shared ScanBuilder accepts id filters as EXACT (no residual);
    // the CDC path does not apply them, so it must fail loudly rather
    // than return unfiltered rows if Spark ever pushes before streaming
    val b = new CollectionScanBuilder("t1", "c", desc, 2)
    b.pushFilters(Array(org.apache.spark.sql.sources.GreaterThan("id", "5")))
    val scan = b.build().asInstanceOf[CollectionScan]
    intercept[UnsupportedOperationException] {
      scan.toMicroBatchStream("/tmp/unused")
    }
    ()
  }

  test("admission control: maxRowsPerBatch drains a backlog as bounded epochs") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    // unit level: the admitted end offset is capped at start + maxRows
    val stream = new CollectionMicroBatchStream("t14", "c", desc, desc.schema, 2,
      maxRowsPerBatch = Some(10L))
    CollectionStores.register("t14", InMemoryCollectionStore.single("c", desc, IndexedSeq.empty)
      .appended("c", (0 until 97).map(i => Point(f"$i%03d", None))))
    assert(stream.getDefaultReadLimit === ReadLimit.maxRows(10L))
    assert(stream.latestOffset(LogOffset(0L), ReadLimit.maxRows(10L)) === LogOffset(10L))
    assert(stream.latestOffset(LogOffset(90L), ReadLimit.maxRows(10L)) === LogOffset(97L))
    assert(stream.reportLatestOffset() === LogOffset(97L))
    // end to end: a 97-entry log replays under AvailableNow as a SEQUENCE
    // of <=10-row epochs totalling the log — the bounded-epoch form an
    // unbounded backlog needs at scale
    val ckpt = java.nio.file.Files.createTempDirectory("graft-admission-ckpt").toString
    val q = spark.readStream.format("graft.sources.CollectionDataSource")
      .option("store", "t14").option("collection", "c")
      .option("maxRowsPerBatch", "10").load()
      .select("id")
      .writeStream.format("memory").queryName("capped_out")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("capped_out").count() === 97)
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length === 10, batches.map(_.numInputRows).mkString(","))
      assert(batches.forall(_.numInputRows <= 10))
      assert(batches.map(_.numInputRows).sum === 97)
    } finally q.stop()
  }

  test("search-shaped queries narrow the store fetch to the searched field") {
    // the dsv2_hetero_search / dsv2_sparse_search gate shapes: even with
    // an isNotNull filter referencing the column, the store ships only
    // the ONE logical field being scored (plus id), never the siblings
    val dense = readDf().filter(col("text_embedding").isNotNull)
      .select("id", "text_embedding")
    assert(scanOf(dense).fetchSpec ===
      FetchSpec(withPayload = false, Seq("text_embedding")))
    val sparse = readDf().filter(col("keywords_indices").isNotNull)
      .select("id", "keywords_indices", "keywords_values")
    assert(scanOf(sparse).fetchSpec ===
      FetchSpec(withPayload = false, Seq("keywords")))
  }

  test("scan is partitioned N ways (vs the reference's single partition)") {
    val df = readDf(partitions = 5)
    assert(df.rdd.getNumPartitions === 5)
    assert(df.count() === 20)
  }

  test("unnamed collection exposes `vector` and decodes it") {
    val udesc = CollectionDescriptor("u", Seq(DenseField("v", 2)), named = false)
    val pts = (0 until 6).map(i =>
      Point(i.toString, Some("{}"), dense = Map("vector" -> Array(i.toFloat, 0f))))
    CollectionStores.register("t2", InMemoryCollectionStore.single("u", udesc, pts))
    val df = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "t2").option("collection", "u").load()
    assert(df.schema.fieldNames.toSeq === Seq("id", "payload", "vector"))
    assert(df.filter(col("vector").isNull).count() === 0)
    assert(df.select(element_at(col("vector"), 1)).orderBy(col("id").cast("int"))
      .collect().map(_.getFloat(0)).toSeq === Seq(0f, 1f, 2f, 3f, 4f, 5f))
  }

  private def searchDf(metric: String, k: Int) = {
    CollectionStores.register("ts",
      InMemoryCollectionStore.single("c", desc, mkPoints(20)))
    spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "ts").option("collection", "c")
      .option("search.field", "text_embedding")
      .option("search.vector", "1.0,0.0")
      .option("search.metric", metric).option("search.k", k.toString).load()
  }

  private def searchScanOf(df: org.apache.spark.sql.DataFrame): CollectionSearchScan =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.asInstanceOf[CollectionSearchScan]
    }.get

  test("pushed top-k search: the scan serves scored points best-first") {
    // dot against (1,0) scores i for point i; i%3==2 lacks the field and
    // cannot rank (NULL-field contract) -> 19,18,16,15,13
    val dot = searchDf("dot", 5).select("id", "_score").collect()
    assert(dot.map(_.getString(0)).toSeq === Seq("19", "18", "16", "15", "13"))
    assert(dot.map(_.getDouble(1)).toSeq === Seq(19.0, 18.0, 16.0, 15.0, 13.0))
    // euclid ranks smallest distance first
    val eu = searchDf("euclid", 3).select("id", "_score").collect()
    assert(eu.map(_.getString(0)).toSeq === Seq("0", "1", "3"))
  }

  test("pushed top-k search: LIMIT tightens k store-side, projection narrows the fetch") {
    val lim = searchDf("dot", 10).limit(2)
    val scan = searchScanOf(lim)
    assert(scan.description().contains("k=2"), scan.description())
    assert(lim.count() === 2)
    // id + _score projection ships NO vectors from the store
    val pruned = searchDf("dot", 4).select("id", "_score")
    val scan2 = searchScanOf(pruned)
    assert(scan2.fetchSpec === FetchSpec(withPayload = false, Seq.empty))
    assert(scan2.readSchema().fieldNames.toSeq === Seq("id", "_score"))
    // statistics report k rows so joins against search results broadcast
    assert(scan2.estimateStatistics().numRows().getAsLong === 4L)
  }

  private lazy val pqFixture: (String, ParquetCollectionStore) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-store").toString
    ParquetCollectionStore.write(
      Collections.homogeneous(spark, TestSpark.sfDir), dir, numFiles = 4)
    (dir, new ParquetCollectionStore(dir, "embeddings",
      Collections.homogeneousDescriptor))
  }

  test("parquet-backed store: connector round-trip equals the collection frame") {
    val (_, store) = pqFixture
    CollectionStores.register("pq_spec", store)
    val df = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "pq_spec").option("collection", "embeddings")
      .option("partitions", "4").load()
    val got = df.select("id", "payload", "vector").collect()
      .map(r => (r.getString(0), r.getString(1), r.getSeq[Float](2)))
      .sortBy(_._1)
    val want = Collections.homogeneous(spark, TestSpark.sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getSeq[Float](2)))
      .sortBy(_._1)
    assert(got.length === want.length)
    assert(got.toSeq === want.toSeq)
  }

  test("parquet store: row windows open only overlapping files, keyset bound skips by footer stats") {
    val (_, store) = pqFixture
    val n = store.pointCount("embeddings")
    assert(n > 0)
    // a narrow window deep in the sequence touches at most 2 of 4 files
    // (2 only when it straddles a range boundary) and as many row groups
    store.filesOpened.set(0); store.rowGroupsRead.set(0)
    val mid = n / 2
    val got = store.queryPoints("embeddings", mid, mid + 5, withPayload = true,
      Seq("vector"), None).toList
    assert(got.length === 5)
    assert(store.filesOpened.get() <= 2, s"opened ${store.filesOpened.get()}")
    assert(store.rowGroupsRead.get() <= 2)
    // keyset bound at the global max id: every file's footer max proves
    // it empty — zero IO
    // ids are ASCII digits, where Java string order == UTF-8 byte order
    val globalMax = store.queryPoints("embeddings", 0, n, false, Nil, None)
      .map(_.id).max
    store.filesOpened.set(0)
    val none = store.queryPoints("embeddings", 0, n, false, Nil, None,
      None, Some(globalMax)).toList
    assert(none.isEmpty)
    assert(store.filesOpened.get() === 0,
      s"keyset-skippable files were opened: ${store.filesOpened.get()}")
    // narrowing: payload not requested -> not decoded
    val bare = store.queryPoints("embeddings", 0, 3, withPayload = false,
      Nil, None).toList
    assert(bare.nonEmpty)
    assert(bare.forall(p => p.payload.isEmpty && p.dense.isEmpty))
  }

  test("parquet store: no change log, streaming read fails loudly") {
    val (_, store) = pqFixture
    val e = intercept[UnsupportedOperationException] {
      store.logSize("embeddings")
    }
    assert(e.getMessage.contains("no change log"))
  }

  test("pushed top-k over the parquet-backed store equals above-the-scan scoring") {
    val (_, store) = pqFixture
    CollectionStores.register("pq_spec_topk", store)
    val frame = Collections.homogeneous(spark, TestSpark.sfDir)
      .withColumn("vector", col("vector").cast("array<double>"))
    val q = frame.filter(col("id") === "3")
      .select(col("vector")).head().getSeq[Double](0)
    val df = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "pq_spec_topk").option("collection", "embeddings")
      .option("search.field", "vector")
      .option("search.vector", q.map(_.toString).mkString(","))
      .option("search.metric", "dot").option("search.k", "5")
      .load().select("id", "_score")
    val got = df.collect().map(_.getString(0)).toSeq
    val want = graft.ops.Ann.bruteForce(frame, "id", "vector",
      graft.functions.vec(q), k = 5, metric = "dot")
      .collect().map(_.getString(0)).toSeq
    assert(got === want)
  }

  @volatile private var pqIvfDir: String = _ // set once by pqIvfFixture

  private lazy val pqIvfFixture: (graft.ops.Ann.IvfIndex, ParquetCollectionStore) = {
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-ivf-spec").toString
    pqIvfDir = dir
    val frame = Collections.homogeneous(spark, TestSpark.sfDir)
    val frameD = frame.withColumn("vector", col("vector").cast("array<double>"))
    val idx = graft.ops.Ann.buildIvf(frameD, "id", "vector",
      nlist = 8, maxIter = 0)
    ParquetCollectionStore.write(frame, dir, numFiles = 4)
    ParquetCollectionStore.writeIvfSidecar(
      idx.clustered.select("id", "payload", "vector", "cluster"),
      idx.centroids, dir, field = "vector")
    ParquetCollectionStore.writePayloadSidecar(
      frame.select("id", "payload", "vector"), dir,
      key = "label", kind = "int")
    (idx, new ParquetCollectionStore(dir, "embeddings",
      Collections.homogeneousDescriptor, ivfNprobe = 2))
  }

  /** Driver-side replication of the probed exact top-k: nearest-2
    * centroids by euclid (ties on cluster asc), raw-score ranking inside
    * the probed clusters via the SAME SearchSpec.score arithmetic the
    * store runs — independent of every engine serving path.
    */
  private def ivfExpected(idx: graft.ops.Ann.IvfIndex, q: Array[Double],
                          k: Int, pred: String => Boolean = _ => true): Seq[String] = {
    val cents = idx.centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
    def euclid(a: Array[Double]) =
      math.sqrt(a.zip(q).map { case (x, y) => (x - y) * (x - y) }.sum)
    val probed = cents.sortBy { case (c, v) => (euclid(v), c) }
      .take(2).map(_._1).toSet
    idx.clustered.select("id", "vector", "cluster").collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toArray, r.getInt(2)))
      .filter(t => probed(t._3) && pred(t._1))
      .map { case (id, v, _) =>
        (id, SearchSpec.score("cosine", v.map(_.toFloat), q).get)
      }
      .sortWith { case ((ia, sa), (ib, sb)) =>
        // ASCII-digit ids: Scala string order == Spark UTF-8 byte order
        if (sa != sb) sa > sb else ia < ib }
      .take(k).map(_._1).toSeq
  }

  test("IVF sidecar: pushed top-k is probe-pruned — primary files untouched, nprobe clusters read") {
    val (idx, store) = pqIvfFixture
    CollectionStores.register("pq_ivf_spec", store)
    val q = Collections.homogeneous(spark, TestSpark.sfDir)
      .filter(col("id") === "3")
      .select(col("vector").cast("array<double>")).head().getSeq[Double](0)
      .toArray
    val got = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "pq_ivf_spec").option("collection", "embeddings")
      .option("search.field", "vector")
      .option("search.vector", q.map(_.toString).mkString(","))
      .option("search.metric", "cosine").option("search.k", "5")
      .load().select("id").collect().map(_.getString(0)).toSeq
    assert(got === ivfExpected(idx, q, k = 5))
    // the scale contract: the PRIMARY corpus files were never opened —
    // the query read the model-sized centroid store plus exactly the
    // nprobe probed cluster partitions
    assert(store.filesOpened.get() === 0L)
    assert(store.ivfClustersTouched.size === 2)
  }

  test("IVF sidecar: payload filter composes inside the probed pass; nprobe=0 store falls back to brute force") {
    val (idx, store) = pqIvfFixture
    CollectionStores.register("pq_ivf_spec_f", store)
    val q = Collections.homogeneous(spark, TestSpark.sfDir)
      .filter(col("id") === "7")
      .select(col("vector").cast("array<double>")).head().getSeq[Double](0)
      .toArray
    def search(storeName: String, extra: Map[String, String] = Map.empty) = {
      val r = spark.read.format("graft.sources.CollectionDataSource")
        .option("store", storeName).option("collection", "embeddings")
        .option("search.field", "vector")
        .option("search.vector", q.map(_.toString).mkString(","))
        .option("search.metric", "cosine").option("search.k", "5")
      extra.foldLeft(r) { case (b, (k, v)) => b.option(k, v) }
        .load().select("id").collect().map(_.getString(0)).toSeq
    }
    // filtered probed search: the filter restricts BEFORE ranking, inside
    // the probed clusters — true top-k of the matching probed subset
    val labels = Collections.homogeneous(spark, TestSpark.sfDir)
      .select(col("id"),
        graft.functions.json_get_int(col("payload"), "label").as("l"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotF = search("pq_ivf_spec_f", Map("filter" -> "label:gte:2"))
    assert(gotF === ivfExpected(idx, q, k = 5, pred = id => labels(id) >= 2L))
    // same directory opened WITHOUT nprobe: the sidecar is inert and the
    // pushed search brute-forces the primary files (exact global top-k)
    val (dir, _) = pqFixture
    val brute = new ParquetCollectionStore(dir, "embeddings",
      Collections.homogeneousDescriptor)
    CollectionStores.register("pq_ivf_spec_b", brute)
    val gotB = search("pq_ivf_spec_b")
    val frameD = Collections.homogeneous(spark, TestSpark.sfDir)
      .withColumn("vector", col("vector").cast("array<double>"))
    val want = graft.ops.Ann.bruteForce(frameD, "id", "vector",
      graft.functions.vec(q.toSeq), k = 5, metric = "cosine")
      .collect().map(_.getString(0)).toSeq
    assert(gotB === want)
    assert(brute.filesOpened.get() > 0L)
  }

  test("quantized IVF sidecar: int8 candidates from codes files, exact rerank — equals full-precision probed serve") {
    val (idx, _) = pqIvfFixture
    val dir = pqIvfDir
    ParquetCollectionStore.writeIvfQuantizedSidecar(
      idx.clustered.select("id", "vector", "cluster"), dir)
    val q = Collections.homogeneous(spark, TestSpark.sfDir)
      .filter(col("id") === "7")
      .select(col("vector").cast("array<double>")).head().getSeq[Double](0)
      .toArray
    def searchOn(storeName: String, st: ParquetCollectionStore): Seq[(String, Double)] = {
      CollectionStores.register(storeName, st)
      spark.read.format("graft.sources.CollectionDataSource")
        .option("store", storeName).option("collection", "embeddings")
        .option("search.field", "vector")
        .option("search.vector", q.map(_.toString).mkString(","))
        .option("search.metric", "dot").option("search.k", "6")
        .load().select("id", "_score").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toSeq
    }
    // full-precision probed serve = the oracle for the quantized tier
    val fullSt = new ParquetCollectionStore(dir, "embeddings",
      Collections.homogeneousDescriptor, ivfNprobe = 2)
    val want = searchOn("pq_q8_full", fullSt)
    val qSt = new ParquetCollectionStore(dir, "embeddings",
      Collections.homogeneousDescriptor, ivfNprobe = 2, ivfCandidateK = 60)
    val got = searchOn("pq_q8_spec", qSt)
    assert(got === want)
    // candidate stage read the codes files; primaries never opened; the
    // rerank touched only the probed clusters
    assert(qSt.codesFilesOpened.get() > 0L)
    assert(qSt.filesOpened.get() === 0L)
    assert(qSt.ivfClustersTouched.size <= 2)
    // full-precision store never touched codes
    assert(fullSt.codesFilesOpened.get() === 0L)
    // margin degenerating to k still returns k rows (weaker guarantee,
    // same shape); a non-dot metric falls back to full precision
    val tiny = new ParquetCollectionStore(dir, "embeddings",
      Collections.homogeneousDescriptor, ivfNprobe = 2, ivfCandidateK = 6)
    assert(searchOn("pq_q8_tiny", tiny).size === 6)
    val cosSt = new ParquetCollectionStore(dir, "embeddings",
      Collections.homogeneousDescriptor, ivfNprobe = 2, ivfCandidateK = 60)
    CollectionStores.register("pq_q8_cos", cosSt)
    spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "pq_q8_cos").option("collection", "embeddings")
      .option("search.field", "vector")
      .option("search.vector", q.map(_.toString).mkString(","))
      .option("search.metric", "cosine").option("search.k", "6")
      .load().collect()
    assert(cosSt.codesFilesOpened.get() === 0L)
  }

  test("quantized tier x payload filter: equals the unquantized filtered arm at full candidateK, primaries closed") {
    val (idx, _) = pqIvfFixture
    val dir = pqIvfDir
    ParquetCollectionStore.writeIvfQuantizedSidecar(
      idx.clustered.select("id", "vector", "cluster"), dir)
    val q = Collections.homogeneous(spark, TestSpark.sfDir)
      .filter(col("id") === "7")
      .select(col("vector").cast("array<double>")).head().getSeq[Double](0)
      .toArray
    val spec = SearchSpec("vector", q, "dot", 5)
    val pf = PayloadFilter(Seq(PayloadCondition("label", "gte", "3")), Nil, None)
    // the unquantized filtered probed arm is the semantics oracle
    val fullSt = new ParquetCollectionStore(dir, "embeddings",
      Collections.homogeneousDescriptor, ivfNprobe = 2)
    val want = fullSt.searchPointsFiltered("embeddings", spec,
      withPayload = true, vectorFields = Nil, pfilter = pf)
      .map(p => (p._1.id, p._1.payload, p._2))
    // full candidate margin: the pre-filter candidate cut covers every
    // probed row, so the filtered page is EXACTLY the unquantized arm's
    val qSt = new ParquetCollectionStore(dir, "embeddings",
      Collections.homogeneousDescriptor, ivfNprobe = 2,
      ivfCandidateK = 1000000)
    val got = qSt.searchPointsFiltered("embeddings", spec,
      withPayload = true, vectorFields = Nil, pfilter = pf)
      .map(p => (p._1.id, p._1.payload, p._2))
    assert(got === want)
    assert(got.nonEmpty)
    // the candidate stage read codes files; primaries stayed closed
    // (the rerank fetch reads the probed CLUSTER partitions only)
    assert(qSt.codesFilesOpened.get() > 0L)
    assert(qSt.filesOpened.get() === 0L)
    // a MODEST margin (covers the unfiltered page window, NOT the probed
    // clusters' rows) must not take the quantized arm under a filter:
    // the pre-filter candidate cut could starve a selective filter, so
    // the store falls through to the exact full-precision filtered serve
    // — identical rows, zero codes reads for the filtered query
    val modest = new ParquetCollectionStore(dir, "embeddings",
      Collections.homogeneousDescriptor, ivfNprobe = 2, ivfCandidateK = 60)
    val viaModest = modest.searchPointsFiltered("embeddings", spec,
      withPayload = true, vectorFields = Nil, pfilter = pf)
      .map(p => (p._1.id, p._1.payload, p._2))
    assert(viaModest === want)
    assert(modest.codesFilesOpened.get() === 0L,
      "modest candidate margin took the quantized arm under a filter")
    // the same margin still serves the UNFILTERED query from the codes
    modest.searchPoints("embeddings", spec, withPayload = false, Nil): Unit
    assert(modest.codesFilesOpened.get() > 0L)
  }

  test("facets serve from the payload index: footer-only, exact, dirty-tail and unindexed-key fallback") {
    val (_, _) = pqIvfFixture // lays the label int index under pqIvfDir
    val st = new ParquetCollectionStore(pqIvfDir, "embeddings",
      Collections.homogeneousDescriptor)
    // expected histogram straight from the corpus frame (the facet
    // surface's semantics: scalar values rendered, count desc, value asc)
    val frame = Collections.homogeneous(spark, TestSpark.sfDir)
    val full = frame
      .select(graft.functions.json_get_int(col("payload"), "label").as("l"))
      .groupBy("l").count().collect()
      .map(r => (r.getLong(0).toString, r.getLong(1)))
      .sortWith { case ((v1, n1), (v2, n2)) =>
        if (n1 != n2) n1 > n2 else v1 < v2 }.toSeq
    val expected = full.take(5)
    assert(st.facetCounts("embeddings", "label", 5) === expected)
    // footer-only: zero corpus bytes decoded
    assert(st.filesOpened.get() === 0L)
    // targeted per-value counts (the sharded threshold merge's second
    // pass) are footer-only too; absent values omitted
    val all = full.toMap
    assert(st.facetCountsFor("embeddings", "label", Set("3", "7", "ghost")) ===
      Map("3" -> all("3"), "7" -> all("7")))
    assert(st.filesOpened.get() === 0L)
    // an UNINDEXED key falls back to the exact payload pass
    assert(st.facetCounts("embeddings", "nope", 3) === Seq.empty)
    assert(st.filesOpened.get() > 0L)
    // a DIRTY tail falls back to the payload pass and reflects the
    // mutation (never a silently stale footer count)
    val d = java.nio.file.Files
      .createTempDirectory("graft-pq-facet-fresh").toString
    val df = frame.select("id", "payload", "vector")
    ParquetCollectionStore.write(df, d, numFiles = 2, withLog = true)
    ParquetCollectionStore.writePayloadSidecar(df, d, key = "label",
      kind = "int")
    val sealed0 = new ParquetCollectionStore(d, "embeddings",
      Collections.homogeneousDescriptor)
    assert(sealed0.facetCounts("embeddings", "label", 3) ===
      expected.take(3))
    val mutated = sealed0.appended("embeddings", IndexedSeq(
      Point("990000", Some("""{"label":3}"""),
        dense = Map("vector" -> Array.fill(64)(0.1f)))))
    val after = mutated.facetCounts("embeddings", "label", 10).toMap
    assert(after("3") === all("3") + 1L)
  }

  test("payload-index sidecar: selective filtered search serves from value partitions — exact, primary and IVF untouched") {
    val (_, store) = pqIvfFixture
    CollectionStores.register("pq_pidx_spec", store)
    val q = Collections.homogeneous(spark, TestSpark.sfDir)
      .filter(col("id") === "11")
      .select(col("vector").cast("array<double>")).head().getSeq[Double](0)
      .toArray
    val frame = Collections.homogeneous(spark, TestSpark.sfDir)
    val rows = frame.select(col("id"),
        col("vector").cast("array<double>"),
        graft.functions.json_get_int(col("payload"), "label").as("l"))
      .collect()
      .map(r => (r.getString(0), r.getSeq[Double](1).toArray, r.getLong(2)))
    // EXACT filtered top-k over the whole corpus (the pre-filter arm is
    // not approximate): every label==3 row ranked, raw scores, id ties
    val expected = rows.filter(_._3 == 3L)
      .map { case (id, v, _) =>
        (id, SearchSpec.score("cosine", v.map(_.toFloat), q).get) }
      .sortWith { case ((ia, sa), (ib, sb)) =>
        if (sa != sb) sa > sb else ia < ib }
      .take(5).map(_._1).toSeq
    val clustersBefore = store.ivfClustersTouched.size
    val got = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "pq_pidx_spec").option("collection", "embeddings")
      .option("filter", "label:eq:3")
      .option("search.field", "vector")
      .option("search.vector", q.map(_.toString).mkString(","))
      .option("search.metric", "cosine").option("search.k", "5")
      .load().select("id").collect().map(_.getString(0)).toSeq
    assert(got === expected)
    assert(store.filesOpened.get() === 0L)                      // primary
    assert(store.ivfClustersTouched.size === clustersBefore)    // no probe
    assert(store.payloadValuesTouched === Seq("3"))             // ONE value
    // unselective servable condition (label >= 0 matches everything):
    // the 20% dial rejects the pre-filter arm and the IVF probe serves
    val gotAll = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "pq_pidx_spec").option("collection", "embeddings")
      .option("filter", "label:gte:0")
      .option("search.field", "vector")
      .option("search.vector", q.map(_.toString).mkString(","))
      .option("search.metric", "cosine").option("search.k", "5")
      .load().select("id").collect().map(_.getString(0)).toSeq
    assert(gotAll === ivfExpected(pqIvfFixture._1, q, k = 5))
    assert(store.payloadValuesTouched === Seq("3"))             // unchanged
    // filtered COUNT serves from the index too — no dial, exact, and
    // the primary files stay closed
    val f = PayloadFilter(Seq(PayloadCondition("label", "eq", "3")), Nil, None)
    assert(store.countMatchingFiltered("embeddings", None, None, f)
      === rows.count(_._3 == 3L).toLong)
    assert(store.filesOpened.get() === 0L)
    // the fully-index-served count is a FOOTER sum: no value partition's
    // data opened beyond what the earlier search already read
    assert(store.payloadValuesTouched === Seq("3"))
    // a residual clause (must_not) forces the per-point walk — still
    // pruned to the matching partitions, still exact
    val fr = PayloadFilter(Seq(PayloadCondition("label", "eq", "3")),
      Seq(PayloadCondition("label", "eq", "99")), None)
    assert(store.countMatchingFiltered("embeddings", None, None, fr)
      === rows.count(_._3 == 3L).toLong)
  }

  test("payload-index sidecar: keyword kind — typed eq and match_any prune by string value") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pidx-kw").toString
    val df = Seq(
      ("1", """{"source":"web"}"""),
      ("2", """{"source":"books"}"""),
      ("3", """{"source":"web"}"""),
      ("4", """{"source":"wiki"}"""),
      ("5", """{"source":"3"}"""),     // numeric-LOOKING string value
      ("6", """{"other":1}""")         // no source: dropped from the index
    ).toDF("id", "payload")
    ParquetCollectionStore.write(df, dir, numFiles = 2)
    ParquetCollectionStore.writePayloadSidecar(df, dir,
      key = "source", kind = "keyword")
    val store = new ParquetCollectionStore(dir, "kw",
      graft.collections.CollectionDescriptor("kw", Seq()))
    def cnt(must: Seq[PayloadCondition]) =
      store.countMatchingFiltered("kw", None, None,
        PayloadFilter(must, Nil, None))
    assert(cnt(Seq(PayloadCondition("source", "eq", "web"))) === 2L)
    // typed eq: a numeric-parsing probe NEVER matches a string value —
    // partition selection must apply the same rule the row path does
    assert(cnt(Seq(PayloadCondition("source", "eq", "3"))) === 0L)
    assert(cnt(Seq(PayloadCondition("source", "match_any", "web|wiki"))) === 3L)
    // every count above is index-carried: footer sums only, no data read
    assert(store.filesOpened.get() === 0L)
    assert(store.payloadValuesTouched === Nil)
  }

  test("payload-index sidecar: mixed JSON types under one key partition by type — no coercion holes") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pidx-mixed").toString
    // the ADVICE round-11 hole: numbers and numeric-LOOKING strings
    // coexisting under one key must never cross-contaminate partitions
    val df = Seq(
      ("1", """{"label":3}"""),        // JSON number
      ("2", """{"label":"3"}"""),      // JSON string, numeric-looking
      ("3", """{"label":3}"""),
      ("4", """{"label":"x"}"""),
      ("5", """{"label":3.5}"""),      // JSON float
      ("6", """{"label":true}""")      // JSON bool
    ).toDF("id", "payload")
    ParquetCollectionStore.write(df, dir, numFiles = 2)
    ParquetCollectionStore.writePayloadSidecar(df, dir,
      key = "label", kind = "int")
    val store = new ParquetCollectionStore(dir, "mx",
      graft.collections.CollectionDescriptor("mx", Seq()))
    def cnt(c: PayloadCondition) =
      store.countMatchingFiltered("mx", None, None, PayloadFilter(Seq(c), Nil, None))
    // numeric eq hits ONLY the number rows; string eq would previously
    // have been absorbed into the same coerced partition
    assert(cnt(PayloadCondition("label", "eq", "3")) === 2L)
    // range spans number AND float rows, never the string "3"
    assert(cnt(PayloadCondition("label", "gte", "3")) === 3L)
    assert(cnt(PayloadCondition("label", "eq", "x")) === 1L)
    assert(cnt(PayloadCondition("label", "eq", "true")) === 1L)
    assert(cnt(PayloadCondition("label", "match_any", "3|x")) === 3L)
    // all of the above are footer-only: the index answers, no data read
    assert(store.filesOpened.get() === 0L)
    // ... and each count equals the row-path walk (one semantics)
    val byWalk = new ParquetCollectionStore(dir, "mx",
      graft.collections.CollectionDescriptor("mx", Seq()))
    // hide the sidecar from the walk by filtering through the base trait
    def walk(c: PayloadCondition): Long = {
      val pf = PayloadFilter(Seq(c), Nil, None)
      byWalk.queryPointsFiltered("mx", 0L, byWalk.pointCount("mx"),
        withPayload = false, Nil, None, pfilter = pf).size.toLong
    }
    assert(walk(PayloadCondition("label", "eq", "3")) === 2L)
    assert(walk(PayloadCondition("label", "gte", "3")) === 3L)
  }

  test("payload-index sidecar: non-covering index never serves the pre-filter search arm") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pidx-cover").toString
    val desc = graft.collections.CollectionDescriptor("cv",
      Seq(graft.collections.DenseField("vector", 2)), named = false)
    val df = Seq(
      ("1", """{"g":1}""", Array(1.0f, 0.0f)),
      ("2", """{"g":1}""", Array(0.9f, 0.1f)),
      ("3", """{"g":2}""", Array(0.0f, 1.0f)),
      ("4", """{"g":2}""", Array(0.1f, 0.9f)),
      ("5", """{"g":2}""", Array(0.2f, 0.8f)),
      ("6", """{"g":3}""", Array(0.5f, 0.5f)),
      ("7", """{"g":3}""", Array(0.6f, 0.4f)),
      ("8", """{"g":3}""", Array(0.7f, 0.3f)),
      ("9", """{"g":3}""", Array(0.8f, 0.2f)),
      ("10", """{"g":3}""", Array(0.85f, 0.15f))
    ).toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 2)
    // a COUNT-ONLY sidecar: id + payload, no vector column
    ParquetCollectionStore.writePayloadSidecar(df.select("id", "payload"),
      dir, key = "g", kind = "int")
    val store = new ParquetCollectionStore(dir, "cv", desc)
    val pf = PayloadFilter(Seq(PayloadCondition("g", "eq", "1")), Nil, None)
    // counts still serve from the index (no vectors needed)...
    assert(store.countMatchingFiltered("cv", None, None, pf) === 2L)
    // ...but a filtered SEARCH must NOT serve from the vector-less
    // partitions (it would return empty/short) — it falls through to the
    // full pass and returns the true filtered top-k
    val got = store.searchPointsFiltered("cv",
      SearchSpec("vector", Array(1.0, 0.0), "cosine", 2),
      withPayload = false, vectorFields = Nil, pfilter = pf)
    assert(got.map(_._1.id) === Seq("1", "2"))
    assert(store.payloadValuesTouched.isEmpty ||
      store.filesOpened.get() > 0) // served by the full pass, not the index
  }

  test("payload-index sidecars: one per key — a multi-key filter plans the cheapest arm") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pidx-multi").toString
    val desc = graft.collections.CollectionDescriptor("mk",
      Seq(graft.collections.DenseField("vector", 2)), named = false)
    // g: 2 rows of 1, 8 rows of 2 — src: 1 row "rare", 9 rows "bulk"
    val rows = (1 to 10).map { i =>
      val g = if (i <= 2) 1 else 2
      val src = if (i == 5) "rare" else "bulk"
      (i.toString, s"""{"g":$g,"src":"$src"}""",
        Array(1.0f - i * 0.05f, i * 0.05f))
    }
    val df = rows.toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 2)
    ParquetCollectionStore.writePayloadSidecar(df, dir, key = "g", kind = "int")
    ParquetCollectionStore.writePayloadSidecar(df, dir, key = "src", kind = "keyword")
    val store = new ParquetCollectionStore(dir, "mk", desc)
    assert(store.payloadIndexKeys === Seq("g", "src"))
    val spec = SearchSpec("vector", Array(1.0, 0.0), "cosine", 3)
    // both keys indexed, g=1 (2 rows) cheaper than src=bulk (9 rows):
    // the g arm is the access path, src re-evaluated residually in it
    val f1 = PayloadFilter(Seq(PayloadCondition("g", "eq", "1"),
      PayloadCondition("src", "eq", "bulk")), Nil, None)
    val got1 = store.searchPointsFiltered("mk", spec,
      withPayload = false, vectorFields = Nil, pfilter = f1)
    assert(got1.map(_._1.id) === Seq("1", "2"))
    assert(store.payloadValuesTouched("g") === Seq("1"))
    assert(store.payloadValuesTouched("src") === Nil)
    assert(store.filesOpened.get() === 0L)        // primaries never opened
    // reversed selectivity: g>=1 matches everything (over the 20% dial),
    // src=rare is 1 row — the src arm serves, g applies residually
    val f2 = PayloadFilter(Seq(PayloadCondition("g", "gte", "1"),
      PayloadCondition("src", "eq", "rare")), Nil, None)
    val got2 = store.searchPointsFiltered("mk", spec,
      withPayload = false, vectorFields = Nil, pfilter = f2)
    assert(got2.map(_._1.id) === Seq("5"))
    // keyword partitions are keyed by the TYPE-TAGGED raw JSON value
    assert(store.payloadValuesTouched("src") === Seq("\"rare\""))
    assert(store.filesOpened.get() === 0L)
    // same-key conditions INTERSECT partitions before any read:
    // g>=1 AND g<=1 reads only the g=1 partition's footer
    val fr = PayloadFilter(Seq(PayloadCondition("g", "gte", "1"),
      PayloadCondition("g", "lte", "1")), Nil, None)
    assert(store.countMatchingFiltered("mk", None, None, fr) === 2L)
    // a multi-key count has no single index carrying every clause →
    // the cheapest arm walks with the other key residual, still exact
    // and still pruned to the arm's partitions
    val fc = PayloadFilter(Seq(PayloadCondition("g", "eq", "2"),
      PayloadCondition("src", "eq", "rare")), Nil, None)
    assert(store.countMatchingFiltered("mk", None, None, fc) === 1L)
    assert(store.filesOpened.get() === 0L)
  }

  test("sidecar freshness: COW mutations overlay the log tail — exact results, no rebuild") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-fresh").toString
    val desc = graft.collections.CollectionDescriptor("fr",
      Seq(graft.collections.DenseField("vector", 2)), named = false)
    // 10 points fanning from (1,0); g = i%5 (2 rows per value, at the
    // 20% prefilter dial)
    val df = (1 to 10).map { i =>
      (i.toString, s"""{"g":${i % 5}}""",
        Array(1.0f - i * 0.05f, i * 0.05f))
    }.toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writePayloadSidecar(df, dir, key = "g", kind = "int")
    // manual cluster split (1..5 | 6..10); query (1,0) probes cluster 0
    val clustered = df.withColumn("cluster",
      when(col("id").cast("int") <= 5, 0).otherwise(1))
    val centroids = Seq((0, Array(0.9f, 0.15f)), (1, Array(0.6f, 0.4f)))
      .toDF("cluster", "centroid")
    ParquetCollectionStore.writeIvfSidecar(clustered, centroids, dir,
      field = "vector")
    val store = new ParquetCollectionStore(dir, "fr", desc, ivfNprobe = 1)
    val spec = SearchSpec("vector", Array(1.0, 0.0), "cosine", 3)
    assert(store.searchPointsFiltered("fr", spec, withPayload = false,
      vectorFields = Nil, pfilter = PayloadFilter.Empty)
      .map(_._1.id) === Seq("1", "2", "3"))
    // mutate WITHOUT rebuilding the sidecars: a new best point, an
    // update that demotes a former winner, a delete of another
    val store2 = store.appended("fr", IndexedSeq(
        Point("0", Some("""{"g":3}"""),
          dense = Map("vector" -> Array(1.0f, 0.001f))),   // new global best
        Point("2", Some("""{"g":1}"""),
          dense = Map("vector" -> Array(0.0f, 1.0f)))))    // demoted
      .removed("fr", Set("3"))
    // probed serve stays EXACT: masked ids drop (window widened), the
    // tail's upserts merge in-memory — "0" wins without being in any
    // cluster partition, "2"/"3" vanish, "4" backfills the page
    val after = store2.searchPointsFiltered("fr", spec, withPayload = false,
      vectorFields = Nil, pfilter = PayloadFilter.Empty)
    assert(after.map(_._1.id) === Seq("0", "1", "4"))
    assert(store2.filesOpened.get() === 0L)       // primaries never opened
    // pre-filter arm freshness: g=3 partition holds {3, 8}; 3 is masked,
    // the tail's "0" (g=3) joins, exact filtered top-2
    val pf = PayloadFilter(Seq(PayloadCondition("g", "eq", "3")), Nil, None)
    val filtered = store2.searchPointsFiltered("fr", spec.copy(k = 2),
      withPayload = false, vectorFields = Nil, pfilter = pf)
    assert(filtered.map(_._1.id) === Seq("0", "8"))
    assert(store2.payloadValuesTouched("g") === Seq("3"))
    assert(store2.filesOpened.get() === 0L)
    // filtered COUNTS stay FOOTER-served under churn (round 16): the
    // payload index absorbed the mutations — the new "0" sits in its
    // value partition, the deleted "3" is a per-partition tombstone the
    // footer sum subtracts — so not a byte of point data decodes
    assert(store2.countMatchingFiltered("fr", None, None, pf) === 2L)
    assert(store2.filesOpened.get() === 0L)
    // park BOTH maintained families' watermarks to exercise the legacy
    // OVERLAY path — the tail masks the absorbed copies too (over-fresh
    // partitions are safe: masked ids are re-scored from the tail
    // regardless), so the page is STILL exact, and a stale-index count
    // falls back to the COW-current primaries
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/_ivf/inserted.txt"))
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/_pidx/k_g/inserted.txt"))
    val parkedCount = new ParquetCollectionStore(dir, "fr", desc)
    assert(parkedCount.countMatchingFiltered("fr", None, None, pf) === 2L)
    assert(parkedCount.filesOpened.get() > 0L) // stale index: primaries
    val parked = new ParquetCollectionStore(dir, "fr", desc, ivfNprobe = 1)
    assert(parked.searchPointsFiltered("fr", spec, withPayload = false,
      vectorFields = Nil, pfilter = PayloadFilter.Empty)
      .map(_._1.id) === Seq("0", "1", "4"))
    assert(parked.filesOpened.get() === 0L)
    // compacting the log PAST a PARKED freshness point disables the
    // sidecar (the tail it needs is gone) — serving falls back to the
    // fresh primaries, never to silently stale index partitions
    val store3 = parked.compacted("fr", parked.logSize("fr"))
    val opened = store3.filesOpened.get()
    assert(store3.searchPointsFiltered("fr", spec, withPayload = false,
      vectorFields = Nil, pfilter = PayloadFilter.Empty)
      .map(_._1.id) === Seq("0", "1", "4"))
    assert(store3.filesOpened.get() > opened)     // base pass, primaries read
  }

  test("payload-index sidecar: datetime kind — range bounds prune by parsed instant") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pidx-dt").toString
    val df = Seq(
      ("1", """{"ts":"2024-01-15T00:00:00Z"}"""),
      ("2", """{"ts":"2024-03-01T12:30:00Z"}"""),
      ("3", """{"ts":"2024-06-30"}"""),          // plain date: midnight UTC
      ("4", """{"ts":"2024-12-01T00:00:00Z"}"""),
      ("5", """{"ts":"not a date"}"""),          // unparseable: never matches
      ("6", """{"other":1}""")                   // no ts: dropped from index
    ).toDF("id", "payload")
    ParquetCollectionStore.write(df, dir, numFiles = 2)
    ParquetCollectionStore.writePayloadSidecar(df, dir,
      key = "ts", kind = "datetime")
    val store = new ParquetCollectionStore(dir, "dt",
      graft.collections.CollectionDescriptor("dt", Seq()))
    def cnt(must: Seq[PayloadCondition]) =
      store.countMatchingFiltered("dt", None, None,
        PayloadFilter(must, Nil, None))
    // half-open range across the partitions: parsed-instant comparison,
    // footer-only (the index carries both clauses)
    assert(cnt(Seq(PayloadCondition("ts", "dt_gte", "2024-03-01T00:00:00Z"),
      PayloadCondition("ts", "dt_lt", "2024-12-01T00:00:00Z"))) === 2L)
    assert(cnt(Seq(PayloadCondition("ts", "dt_gt", "2024-06-30T00:00:00Z"))) === 1L)
    // boundary: the plain date parses to midnight, gte includes it
    assert(cnt(Seq(PayloadCondition("ts", "dt_gte", "2024-06-30"))) === 2L)
    assert(store.filesOpened.get() === 0L)
    // parity with the row path, unparseable and absent excluded alike
    val pf = PayloadFilter(
      Seq(PayloadCondition("ts", "dt_lt", "2025-01-01")), Nil, None)
    assert(cnt(pf.must) === 4L)
    assert(store.queryPointsFiltered("dt", 0L, store.pointCount("dt"),
      withPayload = false, Nil, None, pfilter = pf).size === 4)
  }

  test("geo-cell sidecar: geo conditions prune to cover cells — exact, primaries closed") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gidx").toString
    val desc = graft.collections.CollectionDescriptor("ge",
      Seq(graft.collections.DenseField("vector", 2)), named = false)
    // a dense far cluster (never in any query's cover — the bulk the
    // index exists to skip) + 8 scattered points in/near the queries
    val rows = (0 until 48).map { i =>
      val (la, lo) =
        if (i < 40) (60.0 + (i % 10) * 0.5, 100.0 + (i / 10) * 0.5)
        else (-20.0 + (i - 40) * 8.0, -50.0 + (i - 40) * 12.0)
      (i.toString, s"""{"loc":{"lat":$la,"lon":$lo},"g":${i % 3}}""",
        Array(1.0f - i * 0.02f, i * 0.02f))
    } :+ (("99", """{"g":1}""", Array(0.5f, 0.5f)))  // no loc: never matches
    val df = rows.toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 2)
    ParquetCollectionStore.writeGeoSidecar(df, dir, key = "loc", bits = 4)
    val store = new ParquetCollectionStore(dir, "ge", desc)
    val spec = SearchSpec("vector", Array(1.0, 0.0), "cosine", 5)
    def walkIds(cond: PayloadCondition): Seq[String] = {
      val brute = new ParquetCollectionStore(dir, "ge", desc)
      brute.searchPointsFiltered("ge", spec, withPayload = false,
        vectorFields = Nil,
        pfilter = PayloadFilter(Seq(cond), Nil, None)).map(_._1.id)
    }
    // box: pruned serve == the row-path walk, primaries never opened
    val box = PayloadCondition("loc", "geo_box", "40,-60,-20,40")
    val gotBox = store.searchPointsFiltered("ge", spec, withPayload = false,
      vectorFields = Nil, pfilter = PayloadFilter(Seq(box), Nil, None))
      .map(_._1.id)
    assert(gotBox === walkIds(box))
    assert(gotBox.nonEmpty)
    assert(store.filesOpened.get() === 0L)
    assert(store.geoCellsTouched.nonEmpty)
    // the far cluster's cells were never read — genuinely pruned
    val clusterCell = graft.ops.Geo.cellOf(60.0, 100.0, bits = 4)
    assert(!store.geoCellsTouched.contains(clusterCell))
    // radius and polygon: the bounding-box cover is a superset, the
    // exact predicate re-evaluates inside — results equal the walk
    val rad = PayloadCondition("loc", "geo_radius", "0,0,3000000")
    assert(store.searchPointsFiltered("ge", spec, withPayload = false,
      vectorFields = Nil, pfilter = PayloadFilter(Seq(rad), Nil, None))
      .map(_._1.id) === walkIds(rad))
    val poly = PayloadCondition("loc", "geo_polygon",
      "-30,-80,50,-80,50,60,-30,60")
    assert(store.searchPointsFiltered("ge", spec, withPayload = false,
      vectorFields = Nil, pfilter = PayloadFilter(Seq(poly), Nil, None))
      .map(_._1.id) === walkIds(poly))
    assert(store.filesOpened.get() === 0L)
    // counts walk only the cover partitions with the full filter — a
    // compound must (geo + scalar residual) stays exact
    val pf = PayloadFilter(Seq(box, PayloadCondition("g", "eq", "1")),
      Nil, None)
    val expected = new ParquetCollectionStore(dir, "ge", desc)
      .countMatchingFiltered("ge", None, None, pf)
    assert(store.countMatchingFiltered("ge", None, None, pf) === expected)
    assert(store.filesOpened.get() === 0L)
    // a count-only (non-covering) geo index never serves the search arm
    val dir2 = java.nio.file.Files.createTempDirectory("graft-gidx2").toString
    ParquetCollectionStore.write(df, dir2, numFiles = 2)
    ParquetCollectionStore.writeGeoSidecar(df.select("id", "payload"),
      dir2, key = "loc", bits = 4)
    val st2 = new ParquetCollectionStore(dir2, "ge", desc)
    assert(st2.searchPointsFiltered("ge", spec, withPayload = false,
      vectorFields = Nil, pfilter = PayloadFilter(Seq(box), Nil, None))
      .map(_._1.id) === gotBox)
    assert(st2.filesOpened.get() > 0L)            // the full pass served
  }

  test("text sidecar: match_text/phrase serve from token postings + id-stats-pruned fetch") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tidx").toString
    val desc = graft.collections.CollectionDescriptor("tx",
      Seq(graft.collections.DenseField("vector", 2)), named = false)
    // ids zero-padded so the ranged layout's id stats are tight; a rare
    // token pair lives in ONE file's range
    val rows = (0 until 40).map { i =>
      val words =
        if (i == 7) "alpha beta gamma"
        else if (i == 9) "gamma beta alpha"      // bag matches, order differs
        else if (i % 3 == 0) s"alpha w$i filler"
        else s"noise w$i other"
      (f"$i%03d", s"""{"body":"$words"}""",
        Array(1.0f - i * 0.02f, i * 0.02f))
    }
    val df = rows.toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 4)
    ParquetCollectionStore.writeTextSidecar(df, dir, key = "body")
    val store = new ParquetCollectionStore(dir, "tx", desc)
    val spec = SearchSpec("vector", Array(1.0, 0.0), "cosine", 5)
    def served(cond: PayloadCondition) =
      store.searchPointsFiltered("tx", spec, withPayload = false,
        vectorFields = Nil, pfilter = PayloadFilter(Seq(cond), Nil, None))
        .map(_._1.id)
    // match_text: the token intersection IS the matching set; the
    // candidate fetch is id-stats PRUNED — ids 007/009 live in the first
    // of 4 ranged files, the other 3 never open
    val mt = PayloadCondition("body", "match_text", "beta alpha")
    assert(served(mt) === Seq("007", "009"))
    assert(store.filesOpened.get() === 1L)
    // phrase: candidates shared, consecutive-order re-checked per point
    val ph = PayloadCondition("body", "phrase", "alpha beta")
    assert(served(ph) === Seq("007"))
    assert(store.filesOpened.get() === 2L)        // one more pruned fetch
    assert(store.textFilesOpened.get() > 0L)
    // pruned count equals the row-path walk, residual conditions compose
    val brute = new ParquetCollectionStore(dir, "tx", desc)
    val pf = PayloadFilter(Seq(mt), Nil, None)
    assert(store.countMatchingFiltered("tx", None, None, pf) ===
      brute.queryPointsFiltered("tx", 0L, brute.pointCount("tx"),
        withPayload = false, Nil, None, pfilter = pf).size.toLong)
    // an unknown token's intersection is empty — zero candidates, zero
    // primary reads, still exact
    val before = store.filesOpened.get()
    assert(served(PayloadCondition("body", "match_text", "alpha zzz")) === Nil)
    assert(store.filesOpened.get() === before)
  }

  test("named-field IVF sidecar: subset index serves probe-pruned, absent-field rows never matter") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-nivf").toString
    val desc = graft.collections.CollectionDescriptor("nv", Seq(
      graft.collections.DenseField("a_vec", 2),
      graft.collections.DenseField("b_vec", 2)))
    // a_vec populated on even ids only; b_vec on all (the named-subset
    // shape); manual clusters split a_vec's subset left/right
    val rows = (0 until 20).map { i =>
      (f"$i%03d", s"""{"i":$i}""",
        if (i % 2 == 0) Array(1.0f - i * 0.04f, i * 0.04f) else null,
        Array(0.5f, 0.5f))
    }
    val df = rows.toDF("id", "payload", "a_vec", "b_vec")
    ParquetCollectionStore.write(df, dir, numFiles = 2)
    val clustered = df.filter(col("a_vec").isNotNull)
      .withColumn("cluster", when(col("id") < "010", 0).otherwise(1))
    val centroids = Seq((0, Array(0.95f, 0.1f)), (1, Array(0.5f, 0.45f)))
      .toDF("cluster", "centroid")
    ParquetCollectionStore.writeIvfSidecar(clustered.select(
        "id", "payload", "a_vec", "cluster"),
      centroids, dir, field = "a_vec", vectorColumn = "a_vec")
    val store = new ParquetCollectionStore(dir, "nv", desc, ivfNprobe = 1)
    // query near (1, 0) probes cluster 0 (ids 000..008 even) only
    val got = store.searchPoints("nv",
      SearchSpec("a_vec", Array(1.0, 0.0), "cosine", 3),
      withPayload = false, vectorFields = Nil)
    assert(got.map(_._1.id) === Seq("000", "002", "004"))
    assert(store.ivfClustersTouched === Seq("0"))  // probe-pruned
    assert(store.filesOpened.get() === 0L)         // primaries closed
    // a search on the OTHER named field ignores the a_vec sidecar and
    // serves the full pass over all rows
    val other = store.searchPoints("nv",
      SearchSpec("b_vec", Array(1.0, 1.0), "cosine", 2),
      withPayload = false, vectorFields = Nil)
    assert(other.map(_._1.id) === Seq("000", "001"))
    assert(store.filesOpened.get() > 0L)
  }

  test("insertion-order HNSW sidecar: graph-walked top-k, primaries closed, freshness overlay, optimizer reseals") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-store").toString
    val desc = graft.collections.CollectionDescriptor("h",
      Seq(graft.collections.DenseField("vector", 2)), named = false)
    val df = (1 to 40).map { i =>
      val a = i * 0.15
      (f"$i%03d", s"""{"g":${i % 4}}""",
        Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }.toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeHnswSidecar(df, dir, field = "vector",
      m = 4, efConstruction = 16, numSegments = 2)
    val store = new ParquetCollectionStore(dir, "h", desc, hnswEf = 32)
    val spec0 = SearchSpec("vector", Array(1.0, 0.2), "cosine", 5)
    val got = store.searchPoints("h", spec0, withPayload = true, Nil)
    // graph-walked: primaries never open, both segment graphs resident
    assert(store.filesOpened.get() === 0L)
    assert(store.hnswSegmentsLoaded.get() === 2L)
    assert(got.forall(_._1.payload.nonEmpty)) // winner fetch carries payload
    // equals the exact base path at this generous ef (identical scores:
    // the walk and the base heap share the cosine arithmetic)
    val brute = new ParquetCollectionStore(dir, "h", desc)
    assert(got.map(p => (p._1.id, p._2)) ===
      brute.searchPoints("h", spec0, withPayload = true, Nil)
        .map(p => (p._1.id, p._2)))
    // FRESHNESS overlay: a better new point upserts, the old winner
    // deletes — the sidecar serve must reflect both with NO rebuild
    val winner = got.head._1.id
    val mutated = store
      .appended("h", IndexedSeq(Point("500", Some("""{"g":1}"""),
        dense = Map("vector" -> Array(1.0f, 0.2f)))))
      .removed("h", Set(winner))
    val got2 = mutated.searchPoints("h", spec0, withPayload = false, Nil)
    assert(got2.head._1.id === "500")
    assert(!got2.map(_._1.id).contains(winner))
    val brute2 = new ParquetCollectionStore(dir, "h", desc)
    assert(got2.map(p => (p._1.id, p._2)) ===
      brute2.searchPoints("h", spec0, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
    // OPTIMIZE reseals the graph from the COW-current primaries at the
    // log head (the meta records the build dials): same page, walked
    // again with an empty tail, primaries still closed
    ParquetCollectionStore.optimize(spark, dir)
    val opt = new ParquetCollectionStore(dir, "h", desc, hnswEf = 32)
    val got3 = opt.searchPoints("h", spec0, withPayload = false, Nil)
    assert(got3.map(p => (p._1.id, p._2)) ===
      got2.map(p => (p._1.id, p._2)))
    assert(opt.filesOpened.get() === 0L)
    // a filter with NO payload index behind it cannot resolve an
    // acceptance set — it falls through to the exact filtered paths
    val pf = PayloadFilter(Seq(PayloadCondition("g", "eq", "1")), Nil, None)
    assert(opt.searchPointsFiltered("h", spec0, withPayload = false, Nil, pf)
      .map(p => (p._1.id, p._2)) ===
      new ParquetCollectionStore(dir, "h", desc)
        .searchPointsFiltered("h", spec0, withPayload = false, Nil, pf)
        .map(p => (p._1.id, p._2)))
  }

  test("filtered HNSW: index-resolved acceptance set, cardinality planner arms, freshness, fall-through") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hnswf").toString
    val desc = graft.collections.CollectionDescriptor("h",
      Seq(graft.collections.DenseField("vector", 2)), named = false)
    // 2,000 points so a 3/4 filter (1,500 matched) crosses the
    // micro-path dial (max(4·window, 1024)) and exercises the WALK arm
    val df = (1 to 2000).map { i =>
      val a = i * 0.003
      (f"$i%04d", s"""{"g":${i % 4}}""",
        Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }.toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeHnswSidecar(df, dir, field = "vector",
      m = 4, efConstruction = 16, numSegments = 2)
    // COUNT-ONLY label index (id+payload only): the pre-filter arm
    // cannot serve it, so the graph serve's own planner owns the filter
    ParquetCollectionStore.writePayloadSidecar(df.select("id", "payload"),
      dir, key = "g", kind = "int")
    // ef sized so the broad filter's WIDENED beam (ef·total/matched =
    // 1000·2000/1500 = 1334) stays below the matched set (1500) — the
    // cost-based planner keeps the walk arm — while still exceeding the
    // segment size (~1000), so the walk is exhaustive over its
    // reachable component and exactness is assertable, not hoped-for
    val store = new ParquetCollectionStore(dir, "h", desc, hnswEf = 1000)
    val brute = new ParquetCollectionStore(dir, "h", desc)
    val spec0 = SearchSpec("vector", Array(1.0, 0.2), "cosine", 5)
    def both(st: ParquetCollectionStore, b: ParquetCollectionStore,
             pf: PayloadFilter): Unit = {
      assert(st.searchPointsFiltered("h", spec0, withPayload = false, Nil, pf)
        .map(p => (p._1.id, p._2)) ===
        b.searchPointsFiltered("h", spec0, withPayload = false, Nil, pf)
          .map(p => (p._1.id, p._2)))
    }
    // NARROW first (g=2, 500 matched <= 1024): the exact micro-path —
    // the graph never loads, primaries never open
    both(store, brute, PayloadFilter(
      Seq(PayloadCondition("g", "eq", "2")), Nil, None))
    assert(store.hnswFilteredExactServes.get() === 1L)
    assert(store.hnswFilteredWalkServes.get() === 0L)
    assert(store.hnswSegmentsLoaded.get() === 0L)
    assert(store.filesOpened.get() === 0L)
    // BROAD (g>=1, 1,500 matched > 1024): the accepting walk — every
    // node navigates, only matching ids enter the beam; exact at this ef
    both(store, brute, PayloadFilter(
      Seq(PayloadCondition("g", "gte", "1")), Nil, None))
    assert(store.hnswFilteredWalkServes.get() === 1L)
    assert(store.hnswSegmentsLoaded.get() === 2L)
    assert(store.filesOpened.get() === 0L)
    // COST CROSSOVER: the same broad filter under a GENEROUS ef flips
    // to the exact micro-arm — the widened beam (4096·2000/1500 ≈ 5462)
    // would visit more nodes than the 1,500-id matched set holds, so
    // exact-scoring the acceptance set is the cheaper plan (and exact
    // outright). Counter-asserted: no walk, no graph load.
    val storeGen = new ParquetCollectionStore(dir, "h", desc, hnswEf = 4096)
    both(storeGen, brute, PayloadFilter(
      Seq(PayloadCondition("g", "gte", "1")), Nil, None))
    assert(storeGen.hnswFilteredExactServes.get() === 1L)
    assert(storeGen.hnswFilteredWalkServes.get() === 0L)
    assert(storeGen.hnswSegmentsLoaded.get() === 0L)
    // FRESHNESS: a new best-matching point upserts, the current winner
    // deletes — acceptance set, walk page, and tail must compose with
    // no rebuild (matched ids as-of build, masked ids re-scored from
    // the log tail under the CURRENT filter)
    val pfB = PayloadFilter(Seq(PayloadCondition("g", "gte", "1")), Nil, None)
    val winner = store.searchPointsFiltered("h", spec0, withPayload = false,
      Nil, pfB).head._1.id
    val mutated = store
      .appended("h", IndexedSeq(Point("9500", Some("""{"g":3}"""),
        dense = Map("vector" -> Array(1.0f, 0.2f)))))
      .removed("h", Set(winner))
    val bruteM = new ParquetCollectionStore(dir, "h", desc)
    val got = mutated.searchPointsFiltered("h", spec0, withPayload = false,
      Nil, pfB)
    assert(got.head._1.id === "9500")
    assert(!got.map(_._1.id).contains(winner))
    assert(got.map(p => (p._1.id, p._2)) ===
      bruteM.searchPointsFiltered("h", spec0, withPayload = false, Nil, pfB)
        .map(p => (p._1.id, p._2)))
    // a payload mutation that flips filter membership: the upserted
    // point's NEW payload decides (g=0 fails g>=1 even though the old
    // indexed copy passed)
    val flipped = mutated.appended("h", IndexedSeq(Point("9500",
      Some("""{"g":0}"""), dense = Map("vector" -> Array(1.0f, 0.2f)))))
    assert(!flipped.searchPointsFiltered("h", spec0, withPayload = false,
      Nil, pfB).map(_._1.id).contains("9500"))
    // NOT-index-resolvable shapes fall through to the exact scan arms:
    // mustNot, and a must condition with no index behind it
    val before = store.filesOpened.get()
    both(store, brute, PayloadFilter(Nil,
      Seq(PayloadCondition("g", "eq", "0")), None))
    both(store, brute, PayloadFilter(
      Seq(PayloadCondition("missing", "eq", "1")), Nil, None))
    assert(store.filesOpened.get() > before)
  }

  test("incremental HNSW insert: new-id batches absorb into the graphs, serve with an empty tail, match a rebuild") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-hnswinc").toString
    val desc = graft.collections.CollectionDescriptor("h",
      Seq(graft.collections.DenseField("vector", 2)), named = false)
    val df = (1 to 2000).map { i =>
      val a = i * 0.003
      (f"$i%04d", s"""{"g":${i % 4}}""",
        Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }.toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeHnswSidecar(df, dir, field = "vector",
      m = 4, efConstruction = 16, numSegments = 2)
    val store = new ParquetCollectionStore(dir, "h", desc, hnswEf = 4096)
    val spec0 = SearchSpec("vector", Array(1.0, 0.2), "cosine", 10)
    // NEW ids with vectors hugging the query direction: absorbed points
    // must WIN the post-upsert search, which proves the graph serves
    // them (a stale graph would miss them entirely at empty tail)
    val qa = math.atan2(0.2, 1.0)
    val adds = (1 to 8).map { i =>
      val a = qa + i * 2e-4
      Point(f"95$i%02d", Some(s"""{"g":${i % 4}}"""),
        dense = Map("vector" ->
          Array(math.cos(a).toFloat, math.sin(a).toFloat)))
    }.toIndexedSeq
    val mutated = store.appended("h", adds)
    assert(store.hnswIncInserts.get() === 8L)
    assert(new java.io.File(s"$dir/_hnsw/inserted.txt").isFile)
    val got = mutated.searchPoints("h", spec0, withPayload = false, Nil)
    // graph-served end to end: no tail brute-rescore, primaries closed
    assert(mutated.hnswTailRescored.get() === 0L)
    assert(mutated.filesOpened.get() === 0L)
    assert(mutated.hnswSegmentsLoaded.get() > 0L)
    val brute = new ParquetCollectionStore(dir, "h", desc)
    assert(got.map(p => (p._1.id, p._2)) ===
      brute.searchPoints("h", spec0, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
    assert(got.map(_._1.id).count(_.startsWith("95")) === 8)
    // insert-then-search ≡ rebuild-then-search at an HONEST ef (16,
    // not exhaustive): recall@10 of the incrementally grown graph must
    // match the offline rebuild's on the same final corpus
    val dir2 = java.nio.file.Files.createTempDirectory("graft-hnswinc2").toString
    val addsDf = adds.map(p => (p.id, p.payload.get,
      p.dense("vector"))).toDF("id", "payload", "vector")
    val full = df.union(addsDf)
    ParquetCollectionStore.write(full, dir2, numFiles = 2)
    ParquetCollectionStore.writeHnswSidecar(full, dir2, field = "vector",
      m = 4, efConstruction = 16, numSegments = 2)
    val bruteIds = brute.searchPoints("h", spec0, withPayload = false, Nil)
      .map(_._1.id).toSet
    def recall(st: ParquetCollectionStore): Int =
      st.searchPoints("h", spec0, withPayload = false, Nil)
        .map(_._1.id).count(bruteIds)
    val incR = recall(new ParquetCollectionStore(dir, "h", desc, hnswEf = 16))
    val rebR = recall(new ParquetCollectionStore(dir2, "h", desc, hnswEf = 16))
    assert(incR >= rebR - 1,
      s"incrementally grown graph recall $incR/10 fell behind rebuild $rebR/10")
    assert(incR >= 7, s"recall@10 at ef=16 collapsed: $incR/10")
    // an UPDATE absorbs too: the old node leaves the segment (its
    // edges consolidated away — a stale neighborhood must not route
    // the fresh vector), the new version re-inserts, the watermark
    // advances, and the serve keeps an EMPTY tail. "0001" moves to the
    // opposite side of the circle — equality vs brute proves the graph
    // reflects the NEW vector, not the indexed-at-build copy
    val insBefore = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_hnsw/inserted.txt"))).trim.toLong
    val upd = mutated.appended("h", IndexedSeq(Point("0001",
      Some("""{"g":1}"""), dense = Map("vector" -> Array(-1.0f, 0.0f)))))
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/_hnsw/inserted.txt"))).trim.toLong
      > insBefore)
    val gotU = upd.searchPoints("h", spec0, withPayload = false, Nil)
    assert(upd.hnswTailRescored.get() === 0L)
    assert(gotU.map(p => (p._1.id, p._2)) ===
      new ParquetCollectionStore(dir, "h", desc)
        .searchPoints("h", spec0, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
    // a follow-on NEW-id batch keeps absorbing (the chain never broke)
    val qa2 = qa + 1e-5
    val upd2 = upd.appended("h", IndexedSeq(Point("9600", Some("""{"g":0}"""),
      dense = Map("vector" ->
        Array(math.cos(qa2).toFloat, math.sin(qa2).toFloat)))))
    assert(upd.hnswIncInserts.get() === 1L)
    val gotP = upd2.searchPoints("h", spec0, withPayload = false, Nil)
    assert(upd2.hnswTailRescored.get() === 0L)
    assert(gotP.map(_._1.id).contains("9600"))
    assert(gotP.map(p => (p._1.id, p._2)) ===
      new ParquetCollectionStore(dir, "h", desc)
        .searchPoints("h", spec0, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
    // a DELETE absorbs as an O(batch) TOMBSTONE (the backend's
    // deleted-flags model): the ghost keeps navigating but never
    // enters a result beam — no segment rewrite, tail stays empty,
    // page re-ranks exactly
    val winner = gotP.head._1.id
    val del = upd2.removed("h", Set(winner))
    val deadFile = new java.io.File(s"$dir/_hnsw/dead.txt")
    assert(deadFile.isFile)
    assert(new String(java.nio.file.Files.readAllBytes(deadFile.toPath))
      .contains(winner))
    val gotD = del.searchPoints("h", spec0, withPayload = false, Nil)
    assert(del.hnswTailRescored.get() === 0L)
    assert(!gotD.map(_._1.id).contains(winner))
    assert(gotD.map(p => (p._1.id, p._2)) ===
      new ParquetCollectionStore(dir, "h", desc)
        .searchPoints("h", spec0, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
    // RESURRECTION: re-upserting a tombstoned id consolidates the dead
    // copy out of its segment (same id must not collide), clears the
    // flag, and the fresh node serves again
    val res = del.appended("h", IndexedSeq(Point(winner, Some("""{"g":0}"""),
      dense = Map("vector" ->
        Array(math.cos(qa2 + 1e-6).toFloat, math.sin(qa2 + 1e-6).toFloat)))))
    assert(!deadFile.isFile)
    val gotR = res.searchPoints("h", spec0, withPayload = false, Nil)
    assert(res.hnswTailRescored.get() === 0L)
    assert(gotR.map(_._1.id).contains(winner))
    assert(gotR.map(p => (p._1.id, p._2)) ===
      new ParquetCollectionStore(dir, "h", desc)
        .searchPoints("h", spec0, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
    // OPTIMIZE reseals: the rebuilt graph re-absorbs everything, the
    // insert watermark resets, and absorption is live again
    ParquetCollectionStore.optimize(spark, dir)
    assert(!new java.io.File(s"$dir/_hnsw/inserted.txt").isFile)
    val opt = new ParquetCollectionStore(dir, "h", desc, hnswEf = 4096)
    val opt2 = opt.appended("h", IndexedSeq(Point("9700", Some("""{"g":0}"""),
      dense = Map("vector" ->
        Array(math.cos(qa2).toFloat, math.sin(qa2).toFloat)))))
    assert(opt.hnswIncInserts.get() === 1L)
    val gotO = opt2.searchPoints("h", spec0, withPayload = false, Nil)
    assert(opt2.hnswTailRescored.get() === 0L)
    assert(gotO.map(_._1.id).contains("9700"))
    assert(gotO.map(p => (p._1.id, p._2)) ===
      new ParquetCollectionStore(dir, "h", desc)
        .searchPoints("h", spec0, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
  }

  test("incremental IVF maintenance: mutations absorb into the cluster partitions, serve with an empty tail") {
    import spark.implicits._
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfinc").toString
    val desc = graft.collections.CollectionDescriptor("h",
      Seq(graft.collections.DenseField("vector", 2)), named = false)
    val df = (1 to 2000).map { i =>
      val a = i * 0.003
      (f"$i%04d", s"""{"g":${i % 4}}""",
        Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }.toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    val idx = graft.ops.Ann.buildIvf(
      df.withColumn("vector", col("vector").cast(ArrayType(DoubleType))),
      "id", "vector", nlist = 4, maxIter = 0)
    ParquetCollectionStore.writeIvfSidecar(
      idx.clustered.select("id", "payload", "vector", "cluster"),
      idx.centroids, dir, field = "vector")
    ParquetCollectionStore.writeIvfQuantizedSidecar(
      idx.clustered.select(col("id"), col("vector"), col("cluster")), dir)
    idx.clustered.unpersist(): Unit
    val store = new ParquetCollectionStore(dir, "h", desc, ivfNprobe = 4,
      ivfCandidateK = 4096)
    val spec0 = SearchSpec("vector", Array(1.0, 0.2), "cosine", 10)
    val qa = math.atan2(0.2, 1.0)
    val adds = (1 to 8).map { i =>
      val a = qa + i * 2e-4
      Point(f"95$i%02d", Some(s"""{"g":${i % 4}}"""),
        dense = Map("vector" ->
          Array(math.cos(a).toFloat, math.sin(a).toFloat)))
    }.toIndexedSeq
    val mutated = store.appended("h", adds)
    assert(store.ivfIncInserts.get() === 8L)
    assert(new java.io.File(s"$dir/_ivf/inserted.txt").isFile)
    def brute() = new ParquetCollectionStore(dir, "h", desc)
    def eq(st: ParquetCollectionStore, sp: SearchSpec): Unit =
      assert(st.searchPoints("h", sp, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)) ===
        brute().searchPoints("h", sp, withPayload = false, Nil)
          .map(p => (p._1.id, p._2)))
    // nprobe = nlist probes every cluster: exact regardless of
    // assignment — and the tail leg never runs (graph-of-clusters is
    // CURRENT). Primaries stay closed (clusters serve the page).
    eq(mutated, spec0)
    assert(mutated.ivfTailRescored.get() === 0L)
    assert(mutated.filesOpened.get() === 0L)
    // the QUANTIZED tier absorbed too: dot-metric candidates come from
    // the codes files (inc files included) at a full-coverage margin,
    // exact rerank — equality with brute force
    val specDot = SearchSpec("vector", Array(1.0, 0.2), "dot", 10)
    eq(mutated, specDot)
    assert(mutated.codesFilesOpened.get() > 0L)
    // assignment == the probe rule: with nprobe=1, a query AT an
    // inserted point finds that point (it lives in the one probed
    // cluster — self-consistency of assignment and probe)
    val one = new ParquetCollectionStore(dir, "h", desc, ivfNprobe = 1)
    adds.take(3).foreach { p =>
      val q = p.dense("vector").map(_.toDouble)
      val got = one.searchPoints("h", SearchSpec("vector", q, "cosine", 1),
        withPayload = false, Nil)
      assert(got.head._1.id === p.id, s"assignment/probe disagree on ${p.id}")
    }
    // an UPDATE consolidates the old copy out of its cluster and
    // re-assigns the new vector — exact at empty tail
    val upd = mutated.appended("h", IndexedSeq(Point("0001",
      Some("""{"g":1}"""), dense = Map("vector" -> Array(-1.0f, 0.0f)))))
    assert(mutated.ivfIncInserts.get() === 1L)
    eq(upd, spec0)
    assert(upd.ivfTailRescored.get() === 0L)
    // a DELETE tombstones (O(batch)): flagged rows never rank, the
    // quantized margin is immune, the tail stays empty
    val winner = upd.searchPoints("h", spec0, withPayload = false, Nil)
      .head._1.id
    val del = upd.removed("h", Set(winner))
    assert(new java.io.File(s"$dir/_ivf/dead.txt").isFile)
    val gotD = del.searchPoints("h", spec0, withPayload = false, Nil)
    assert(del.ivfTailRescored.get() === 0L)
    assert(!gotD.map(_._1.id).contains(winner))
    eq(del, spec0)
    eq(del, specDot)
    // RESURRECTION clears the flag and consolidates the dead copy out
    val res = del.appended("h", IndexedSeq(Point(winner, Some("""{"g":0}"""),
      dense = Map("vector" ->
        Array(math.cos(qa + 1e-6).toFloat, math.sin(qa + 1e-6).toFloat)))))
    assert(!new java.io.File(s"$dir/_ivf/dead.txt").isFile)
    eq(res, spec0)
    // OPTIMIZE reseals and resets; absorption is live again
    ParquetCollectionStore.optimize(spark, dir, ivfMaxIter = 0)
    assert(!new java.io.File(s"$dir/_ivf/inserted.txt").isFile)
    val opt = new ParquetCollectionStore(dir, "h", desc, ivfNprobe = 4)
    val opt2 = opt.appended("h", IndexedSeq(Point("9700", Some("""{"g":0}"""),
      dense = Map("vector" ->
        Array(math.cos(qa + 2e-6).toFloat, math.sin(qa + 2e-6).toFloat)))))
    assert(opt.ivfIncInserts.get() === 1L)
    eq(opt2, spec0)
    assert(opt2.ivfTailRescored.get() === 0L)
  }

  test("incremental payload-index maintenance: filtered serves, footer counts, and facets stay index-served under churn") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-pidxinc").toString
    val desc = graft.collections.CollectionDescriptor("h",
      Seq(graft.collections.DenseField("vector", 2)), named = false)
    val df = (1 to 2000).map { i =>
      val a = i * 0.003
      (f"$i%04d", s"""{"g":${i % 8}}""",
        Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }.toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writePayloadSidecar(df, dir, key = "g",
      kind = "int")
    val store = new ParquetCollectionStore(dir, "h", desc)
    val pf3 = PayloadFilter(Seq(PayloadCondition("g", "eq", "3")), Nil, None)
    val pf1 = PayloadFilter(Seq(PayloadCondition("g", "eq", "1")), Nil, None)
    val q = Array(1.0, 0.2)
    val spec0 = SearchSpec("vector", q, "cosine", 10)
    // the row-path oracle: a filtered scan scored by hand, the exact
    // answer whatever the index does
    def brute(pf: PayloadFilter): Seq[(String, Double)] = {
      val fresh = new ParquetCollectionStore(dir, "h", desc)
      fresh.queryPointsFiltered("h", 0L, fresh.pointCount("h"),
        withPayload = false, Seq("vector"), None, pfilter = pf)
        .flatMap(p => p.dense.get("vector")
          .flatMap(v => SearchSpec.score("cosine", v, q))
          .map(s => (p.id, s))).toSeq
        .sortWith { case ((ia, sa), (ib, sb)) =>
          if (sa != sb) sa > sb else ia < ib // ASCII ids: JVM == UTF8 order
        }.take(10)
    }
    def served(st: ParquetCollectionStore, pf: PayloadFilter): Seq[(String, Double)] =
      st.searchPointsFiltered("h", spec0, withPayload = false, Nil, pf)
        .map(p => (p._1.id, p._2))
    def bruteCount(pf: PayloadFilter): Long = {
      val fresh = new ParquetCollectionStore(dir, "h", desc)
      fresh.queryPointsFiltered("h", 0L, fresh.pointCount("h"),
        withPayload = false, Nil, None, pfilter = pf).size.toLong
    }
    assert(store.countMatchingFiltered("h", None, None, pf3) === 250L)
    assert(store.filesOpened.get() === 0L)
    // INSERTS absorb into their value partition
    val adds = (1 to 8).map { i =>
      val a = math.atan2(0.2, 1.0) + i * 2e-4
      Point(f"95$i%02d", Some("""{"g":3}"""),
        dense = Map("vector" ->
          Array(math.cos(a).toFloat, math.sin(a).toFloat)))
    }.toIndexedSeq
    val mutated = store.appended("h", adds)
    assert(store.pidxIncInserts.get() === 8L)
    assert(new java.io.File(s"$dir/_pidx/k_g/inserted.txt").isFile)
    assert(mutated.countMatchingFiltered("h", None, None, pf3) === 258L)
    assert(mutated.filesOpened.get() === 0L) // footer count UNDER CHURN
    assert(served(mutated, pf3) === brute(pf3))
    assert(served(mutated, pf3).count(_._1.startsWith("95")) === 8)
    // an UPDATE moves its value partition (g=1 -> g=3)
    val upd = mutated.appended("h", IndexedSeq(Point("0001",
      Some("""{"g":3}"""), dense = Map("vector" ->
        Array(math.cos(0.003).toFloat, math.sin(0.003).toFloat)))))
    assert(upd.countMatchingFiltered("h", None, None, pf3) === 259L)
    assert(upd.countMatchingFiltered("h", None, None, pf1) === 249L)
    assert(upd.filesOpened.get() === 0L)
    assert(served(upd, pf3) === brute(pf3))
    // a DELETE tombstones (value, id): footer counts subtract the flag,
    // facets stay index-served with live counts
    val del = upd.removed("h", Set("0003")) // g = 3
    assert(new java.io.File(s"$dir/_pidx/k_g/dead.txt").isFile)
    assert(del.countMatchingFiltered("h", None, None, pf3) === 258L)
    assert(del.filesOpened.get() === 0L)
    assert(served(del, pf3) === brute(pf3))
    assert(!served(del, pf3).map(_._1).contains("0003"))
    val facets = del.facetCounts("h", "g", 10).toMap
    assert(facets("3") === 258L)
    assert(facets("1") === 249L)
    assert(del.filesOpened.get() === 0L)
    // RESURRECTION clears the flag and consolidates the dead copy out
    val res = del.appended("h", IndexedSeq(Point("0003",
      Some("""{"g":0}"""), dense = Map("vector" ->
        Array(math.cos(0.009).toFloat, math.sin(0.009).toFloat)))))
    assert(!new java.io.File(s"$dir/_pidx/k_g/dead.txt").isFile)
    assert(res.countMatchingFiltered("h", None, None, pf3) === 258L)
    assert(res.countMatchingFiltered("h", None, None,
      PayloadFilter(Seq(PayloadCondition("g", "eq", "0")), Nil, None))
      === bruteCount(PayloadFilter(Seq(PayloadCondition("g", "eq", "0")),
        Nil, None)))
    // MASS delete past the flag cap consolidates — no flag file, counts
    // still footer-exact
    sys.props("graft.test.deadFlagMax") = "16"
    try {
      val massIds = (100 to 199).map(i => f"$i%04d").toSet
      val mass = res.removed("h", massIds)
      assert(!new java.io.File(s"$dir/_pidx/k_g/dead.txt").isFile)
      assert(mass.countMatchingFiltered("h", None, None, pf3)
        === bruteCount(pf3))
      assert(mass.filesOpened.get() === 0L)
      assert(served(mass, pf3) === brute(pf3))
    } finally sys.props.remove("graft.test.deadFlagMax"): Unit
    // OPTIMIZE reseals and resets the watermark
    ParquetCollectionStore.optimize(spark, dir)
    assert(!new java.io.File(s"$dir/_pidx/k_g/inserted.txt").isFile)
    val opt = new ParquetCollectionStore(dir, "h", desc)
    assert(opt.countMatchingFiltered("h", None, None, pf3)
      === bruteCount(pf3))
    assert(served(opt, pf3) === brute(pf3))
  }

  test("online-maintenance compaction bounds inc-file counts under frequent tiny batches") {
    import spark.implicits._
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val dir = java.nio.file.Files.createTempDirectory("graft-lsm").toString
    val desc = graft.collections.CollectionDescriptor("h",
      Seq(graft.collections.DenseField("vector", 2)), named = false)
    val df = (1 to 200).map { i =>
      val a = i * 0.03
      (f"$i%04d", s"""{"g":${i % 4}}""",
        Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }.toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 1, withLog = true)
    ParquetCollectionStore.writeHnswSidecar(df, dir, field = "vector",
      m = 4, efConstruction = 16, numSegments = 1)
    val idx = graft.ops.Ann.buildIvf(
      df.withColumn("vector", col("vector").cast(ArrayType(DoubleType))),
      "id", "vector", nlist = 2, maxIter = 0)
    ParquetCollectionStore.writeIvfSidecar(
      idx.clustered.select("id", "payload", "vector", "cluster"),
      idx.centroids, dir, field = "vector")
    idx.clustered.unpersist(): Unit
    var st = new ParquetCollectionStore(dir, "h", desc, hnswEf = 1024,
      ivfNprobe = 2)
    (1 to 24).foreach { i =>
      val a = i * 0.01
      st = st.appended("h", IndexedSeq(Point(f"z$i%03d",
        Some(s"""{"g":${i % 4}}"""),
        dense = Map("vector" ->
          Array(math.cos(a).toFloat, math.sin(a).toFloat)))))
    }
    def files(p: String): Int =
      Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
    val cap = ParquetCollectionStore.incCompactThreshold + 1
    // 24 single-point batches, but every partition stays under the
    // level-0 cap: the 8th accumulated file triggers a merge
    assert(files(s"$dir/_hnsw/points/seg=0") <= cap)
    assert(files(s"$dir/_hnsw/edges/seg=0") <= cap)
    Seq(0, 1).foreach { c =>
      assert(files(s"$dir/_ivf/points/cluster=$c") <= cap,
        s"cluster $c file count unbounded")
    }
    // and the consolidated state serves exactly — both families,
    // empty tails
    val spec0 = SearchSpec("vector", Array(1.0, 0.2), "cosine", 10)
    val brute = new ParquetCollectionStore(dir, "h", desc)
    assert(st.searchPoints("h", spec0, withPayload = false, Nil)
      .map(p => (p._1.id, p._2)) ===
      brute.searchPoints("h", spec0, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
    assert(st.hnswTailRescored.get() === 0L)
    val ivfOnly = new ParquetCollectionStore(dir, "h", desc, ivfNprobe = 2)
    assert(ivfOnly.searchPoints("h", spec0, withPayload = false, Nil)
      .map(p => (p._1.id, p._2)) ===
      brute.searchPoints("h", spec0, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
    assert(ivfOnly.ivfTailRescored.get() === 0L)
    // MASS DELETE past the flag cap: deletes consolidate out of their
    // partitions instead of tombstoning — dead.txt stays model-sized
    // by construction (a truncate must never leave a corpus-sized flag
    // file), and the post-churn serve is exact with an empty tail
    sys.props("graft.test.deadFlagMax") = "16"
    try {
      val massIds = (1 to 100).map(i => f"$i%04d").toSet
      val mass = st.removed("h", massIds)
      assert(!new java.io.File(s"$dir/_hnsw/dead.txt").isFile)
      assert(!new java.io.File(s"$dir/_ivf/dead.txt").isFile)
      val bruteM = new ParquetCollectionStore(dir, "h", desc)
      val gotM = mass.searchPoints("h", spec0, withPayload = false, Nil)
      assert(mass.hnswTailRescored.get() === 0L)
      assert(gotM.map(_._1.id).forall(id => !massIds(id)))
      assert(gotM.map(p => (p._1.id, p._2)) ===
        bruteM.searchPoints("h", spec0, withPayload = false, Nil)
          .map(p => (p._1.id, p._2)))
      // ...and a small delete under the cap still tombstones (O(batch))
      val small = mass.removed("h", Set(gotM.head._1.id))
      assert(new java.io.File(s"$dir/_hnsw/dead.txt").isFile)
    } finally sys.props.remove("graft.test.deadFlagMax"): Unit
  }

  test("HnswSegment.segOf equals the engine-side segCol for every id") {
    import spark.implicits._
    val ids = (0 until 500).map(i => s"id-$i-${i * 37}")
    val got = ids.toDF("id")
      .select(col("id"),
        graft.ops.HnswSegment.segCol(col("id"), 7, 42L).as("s"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    ids.foreach { id =>
      assert(graft.ops.HnswSegment.segOf(id, 7, 42L) === got(id))
    }
  }

  test("optimizer: rebuilt sidecars re-absorb the tail — index-pruned serving returns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-opt").toString
    val desc = graft.collections.CollectionDescriptor("op",
      Seq(graft.collections.DenseField("vector", 2)), named = false)
    val df = (1 to 10).map { i =>
      (i.toString, s"""{"g":${i % 5},"body":"tokg${i % 5} w$i"}""",
        Array(1.0f - i * 0.05f, i * 0.05f))
    }.toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writePayloadSidecar(df, dir, key = "g", kind = "int")
    ParquetCollectionStore.writeTextSidecar(df, dir, key = "body")
    val clustered = df.withColumn("cluster",
      when(col("id").cast("int") <= 5, 0).otherwise(1))
    val centroids = Seq((0, Array(0.9f, 0.15f)), (1, Array(0.6f, 0.4f)))
      .toDF("cluster", "centroid")
    ParquetCollectionStore.writeIvfSidecar(clustered, centroids, dir,
      field = "vector")
    val store = new ParquetCollectionStore(dir, "op", desc, ivfNprobe = 1)
      .appended("op", IndexedSeq(
        Point("0", Some("""{"g":3}"""),
          dense = Map("vector" -> Array(1.0f, 0.001f)))))
      .removed("op", Set("3"))
    // optimize rebuilds every sidecar from the current primaries, sealed
    // at the current head: the reopened store's tail is EMPTY
    ParquetCollectionStore.optimize(spark, dir, ivfMaxIter = 0)
    val opt = new ParquetCollectionStore(dir, "op", desc, ivfNprobe = 2)
    val spec = SearchSpec("vector", Array(1.0, 0.0), "cosine", 3)
    // the upserted "0" now serves from a CLUSTER partition (nprobe=2 of
    // the refit covers both), the deleted "3" is simply absent
    assert(opt.searchPointsFiltered("op", spec, withPayload = false,
      vectorFields = Nil, pfilter = PayloadFilter.Empty)
      .map(_._1.id) === Seq("0", "1", "2"))
    assert(opt.filesOpened.get() === 0L)          // primaries stay closed
    // the pre-filter arm serves "0" from the rebuilt g=3 value partition
    val pf = PayloadFilter(Seq(PayloadCondition("g", "eq", "3")), Nil, None)
    assert(opt.searchPointsFiltered("op", spec.copy(k = 2),
      withPayload = false, vectorFields = Nil, pfilter = pf)
      .map(_._1.id) === Seq("0", "8"))
    assert(opt.payloadValuesTouched("g") === Seq("3"))
    assert(opt.filesOpened.get() === 0L)
    // counts are footer-only again: the index carries the clause and the
    // tail is empty, so not a byte of point data is decoded
    assert(opt.countMatchingFiltered("op", None, None, pf) === 2L)
    assert(opt.filesOpened.get() === 0L)
    // the TEXT sidecar was rebuilt too: the deleted "3" left its
    // postings, the count serves from the fresh intersection (the
    // upserted "0" has no body, so only "8" carries tokg3 now)
    val tf = PayloadFilter(Seq(
      PayloadCondition("body", "match_text", "tokg3")), Nil, None)
    assert(opt.countMatchingFiltered("op", None, None, tf) === 1L)
    assert(opt.textFilesOpened.get() > 0L)
    assert(store ne opt)                          // reopen discipline
  }

  test("ranked full-text serving: sidecar path == one-pass default, token-bucket reads only, mutations absorb") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-textrank").toString
    val tdesc = graft.collections.CollectionDescriptor("tr", Seq.empty)
    val df = Seq(
      ("01", """{"body":"alpha beta gamma alpha"}"""),
      ("02", """{"body":"beta beta delta"}"""),
      ("03", """{"body":"alpha epsilon"}"""),
      ("04", """{"body":"zeta eta theta iota"}"""),
      ("05", """{"other":"alpha beta"}"""),   // no body: dl 0, counts in N
      ("06", """{"body":"beta alpha beta"}""")
    ).toDF("id", "payload")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeTextSidecar(df, dir, key = "body",
      nBuckets = 8)
    val st = new ParquetCollectionStore(dir, "tr", tdesc)
    val got = st.searchTextRanked("tr", "body", Seq("alpha", "beta"), 5)
    // the sidecar path read ONLY the two query terms' buckets and never
    // touched a primary file
    val buckets = Seq("alpha", "beta")
      .map(t => java.lang.Math.floorMod(t.hashCode, 8)).distinct.size
    assert(st.textFilesOpened.get() === buckets.toLong)
    assert(st.filesOpened.get() === 0L)
    // ... and equals the trait's one-pass default over the same points
    val want = {
      val pts = st.queryPoints("tr", 0L, st.pointCount("tr"),
        withPayload = true, Nil, None).toIndexedSeq
      InMemoryCollectionStore.single("tr", tdesc, pts)
        .searchTextRanked("tr", "body", Seq("alpha", "beta"), 5)
    }
    assert(got === want)
    assert(got.size === 4)              // docs 04/05 carry no query term
    // scores monotone non-increasing, rounded to 4dp
    assert(got.map(_._2) === got.map(_._2).sorted.reverse)
    got.foreach { case (_, s) =>
      assert(s === java.math.BigDecimal.valueOf(s)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue())
    }
    // a MUTATION now ABSORBS (round-17 text maintenance): the postings
    // and live stats advance, the sidecar keeps serving the CURRENT
    // state with an empty tail — primaries stay closed
    val st2 = st.appended("tr", IndexedSeq(
      Point("07", Some("""{"body":"alpha alpha alpha"}"""), Map.empty)))
    assert(st.tidxIncInserts.get() === 1L)
    val fresh = st2.searchTextRanked("tr", "body", Seq("alpha", "beta"), 5)
    assert(fresh.map(_._1).contains("07"))
    assert(st2.filesOpened.get() === 0L) // absorbed, not fallen back
    // ... and still equals the exact one-pass default over live points
    assert(fresh === {
      val pts = st2.queryPoints("tr", 0L, st2.pointCount("tr"),
        withPayload = true, Nil, None).toIndexedSeq
      InMemoryCollectionStore.single("tr", tdesc, pts)
        .searchTextRanked("tr", "body", Seq("alpha", "beta"), 5)
    })
    // the CONNECTOR face: textrank.* options produce the ranked scan
    CollectionStores.register("tr_store", st)
    val viaScan = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "tr_store").option("collection", "tr")
      .option("textrank.key", "body")
      .option("textrank.terms", "alpha,beta")
      .option("textrank.k", "5")
      .load().collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(viaScan === got)
  }

  test("optimizer: named-field IVF sidecar refits over rows carrying the field only") {
    import spark.implicits._
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val dir = java.nio.file.Files.createTempDirectory("graft-opt-named").toString
    val ndesc = CollectionDescriptor("onv", Seq(
      DenseField("a_vec", 2), DenseField("b_vec", 2)), named = true)
    // a_vec populated on EVEN ids only (subset-populated named field);
    // b_vec everywhere — the refit must skip the null-a_vec rows
    val df = (0 until 12).map { i =>
      val a = if (i % 2 == 0)
        Array((10 - i) * 0.1f, i * 0.1f) else null
      (f"$i%03d", s"""{"g":${i % 3}}""", a, Array(1.0f, i * 0.01f))
    }.toDF("id", "payload", "a_vec", "b_vec")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    val sub = df.filter(col("a_vec").isNotNull)
      .select(col("id"), col("payload"),
        col("a_vec").cast(ArrayType(DoubleType)).as("a_vec"), col("b_vec"))
    val idx = graft.ops.Ann.buildIvf(sub, "id", "a_vec", nlist = 2, maxIter = 0)
    ParquetCollectionStore.writeIvfSidecar(
      idx.clustered.select("id", "payload", "a_vec", "b_vec", "cluster"),
      idx.centroids, dir, field = "a_vec", vectorColumn = "a_vec")
    // mutate, then optimize: the named-field refit over the primaries
    // must not seed from a null vector or emit null-cluster partitions
    new ParquetCollectionStore(dir, "onv", ndesc)
      .removed("onv", Set("002")): Unit
    ParquetCollectionStore.optimize(spark, dir, ivfMaxIter = 0)
    val clusterDirs = Option(
      new java.io.File(s"$dir/_ivf/points").listFiles()).get
      .filter(_.isDirectory).map(_.getName)
    assert(!clusterDirs.exists(_.contains("HIVE_DEFAULT")),
      s"null clusters written: ${clusterDirs.mkString(",")}")
    // the rebuilt sidecar serves the named search: exact top-3 over the
    // surviving a_vec rows (nprobe covers both clusters => exact)
    val opt = new ParquetCollectionStore(dir, "onv", ndesc, ivfNprobe = 2)
    val got = opt.searchPoints("onv",
      SearchSpec("a_vec", Array(1.0, 0.0), "cosine", 3),
      withPayload = false, vectorFields = Nil).map(_._1.id)
    assert(got === Seq("000", "004", "006"))  // 002 deleted, odds absent
    assert(opt.filesOpened.get() === 0L)      // serves from the sidecar
  }

  test("payload filter: must conditions narrow the scan store-side, decisively") {
    CollectionStores.register("tpf",
      InMemoryCollectionStore.single("c", desc, mkPoints(20)))
    def read(f: String) = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "tpf").option("collection", "c")
      .option("filter", f).load()
    // range conjunction; i%4==0 points carry NO payload -> excluded (8)
    assert(read("i:gte:5;i:lt:12").select("id").collect().map(_.getString(0)).toSet
      === Set("5", "6", "7", "9", "10", "11"))
    assert(read("i:eq:7").select("id").collect().map(_.getString(0)).toSeq === Seq("7"))
    assert(read("zzz:eq:1").count() === 0)         // absent key matches nothing
    assert(read("i:eq:notanumber").count() === 0)  // typed match: number vs string
    // the plan carries the pushed conditions
    assert(read("i:gte:5").queryExecution.executedPlan.toString
      .contains("filter=[i gte 5]"))
    // COUNT(*) composes into the filtered count scan: one row crosses
    val cdf = read("i:gte:5;i:lt:12").agg(count(lit(1)))
    assert(cdf.head().getLong(0) === 6L)
    assert(cdf.queryExecution.executedPlan.toString
      .contains("CollectionFilteredCountScan"))
    // seam narrowing: evaluation needs payload internally, but the
    // caller's narrowed fetch is still honored on the way out
    val store = CollectionStores.get("tpf")
    val pf = PayloadFilter.mustAll(Seq(
      PayloadCondition("i", "gte", "5"), PayloadCondition("i", "lt", "12")))
    val pts = store.queryPointsFiltered("c", 0, 20, withPayload = false,
      Nil, None, pfilter = pf).toSeq
    assert(pts.map(_.id).toSet === Set("5", "6", "7", "9", "10", "11"))
    assert(pts.forall(_.payload.isEmpty))
    // filter-then-limit, like the id vocabulary
    assert(store.queryPointsFiltered("c", 0, 20, withPayload = false,
      Nil, Some(3), pfilter = pf).map(_.id).toSeq === Seq("5", "6", "7"))
    // condition-string contract
    intercept[IllegalArgumentException](PayloadCondition.parseList("i:like:5"))
    intercept[IllegalArgumentException](PayloadCondition.parseList("noop"))
    assert(PayloadCondition.parseList("a:eq:x:y").head.value === "x:y")
    // the CDC face refuses payload filters loudly (tombstones carry none)
    intercept[UnsupportedOperationException] {
      spark.read.format("graft.sources.CollectionDataSource")
        .option("store", "tpf").option("collection", "c")
        .option("cdc", "true").option("filter", "i:eq:1").load().collect()
    }
  }

  test("condition vocabulary: quoted string probes, escaping, geo_polygon") {
    import graft.sources.{PayloadCondition => PC}
    def hit(c: PayloadCondition, payload: String): Boolean =
      c.matches(Point("x", Some(payload)))
    // QUOTED probe: string equality on a numeric-looking keyword — the
    // expressiveness hole the unquoted typed-eq rule leaves
    assert(hit(PC("k", "eq", "\"3\""), """{"k":"3"}"""))
    assert(!hit(PC("k", "eq", "\"3\""), """{"k":3}"""))     // never numbers
    assert(!hit(PC("k", "eq", "3"), """{"k":"3"}"""))       // unquoted: typed
    assert(hit(PC("k", "eq", "3"), """{"k":3}"""))
    assert(hit(PC("k", "eq", "\"true\""), """{"k":"true"}"""))
    assert(!hit(PC("k", "eq", "\"true\""), """{"k":true}"""))
    // quoted match_any alternative is string-typed per element
    assert(hit(PC("k", "match_any", "\"2\"|x"), """{"k":"2"}"""))
    assert(!hit(PC("k", "match_any", "\"2\"|x"), """{"k":2}"""))
    assert(hit(PC("k", "match_any", "2|x"), """{"k":2}"""))
    // ESCAPING: reserved chars in values round-trip through the option
    // encoding (serialize escapes, parse splits on unescaped only)
    val weird = PC("k", "eq", "a;b|c&d\\e")
    val parsed = PC.parseList(PC.serializeList(Seq(weird, PC("j", "eq", "z"))))
    assert(parsed.size === 2)
    assert(hit(parsed(0), """{"k":"a;b|c&d\\e"}"""))
    assert(!hit(parsed(0), """{"k":"a"}"""))
    // escaped '|' inside a match_any alternative is literal
    val alts = PC.parseList("k:match_any:a\\|b|c")
    assert(alts.size === 1)
    assert(hit(alts(0), """{"k":"a|b"}"""))
    assert(hit(alts(0), """{"k":"c"}"""))
    assert(!hit(alts(0), """{"k":"a"}"""))
    // geo_polygon: ray-cast containment, same arithmetic as the engine op
    val tri = PC("loc", "geo_polygon", "0,0,10,0,0,10")
    assert(hit(tri, """{"loc":{"lat":2.0,"lon":2.0}}"""))
    assert(!hit(tri, """{"loc":{"lat":8.0,"lon":8.0}}"""))
    assert(!hit(tri, """{"loc":{"lat":-1.0,"lon":2.0}}"""))
    intercept[IllegalArgumentException] {
      PC("loc", "geo_polygon", "0,0,10,0").matches(Point("x", None))
    }
  }

  test("condition vocabulary: empty, isnull, match_any, match_text") {
    def c(key: String, op: String, v: String) = PayloadCondition(key, op, v)
    def pt(payload: Option[String]) = Point("x", payload)
    // IsEmpty: no payload, unparseable payload, absent key, null, []
    assert(c("k", "empty", "").matches(pt(None)))
    assert(c("k", "empty", "").matches(pt(Some("not json"))))
    assert(c("k", "empty", "").matches(pt(Some("""{"other": 1}"""))))
    assert(c("k", "empty", "").matches(pt(Some("""{"k": null}"""))))
    assert(c("k", "empty", "").matches(pt(Some("""{"k": []}"""))))
    assert(!c("k", "empty", "").matches(pt(Some("""{"k": 0}"""))))
    assert(!c("k", "empty", "").matches(pt(Some("""{"k": [1]}"""))))
    // IsNull is stricter: the key must be PRESENT with a null value
    assert(c("k", "isnull", "").matches(pt(Some("""{"k": null}"""))))
    assert(!c("k", "isnull", "").matches(pt(None)))
    assert(!c("k", "isnull", "").matches(pt(Some("""{"other": 1}"""))))
    // MatchAny: typed per alternative — numeric matches numeric,
    // keyword matches keyword, never across
    assert(c("k", "match_any", "2|5|x").matches(pt(Some("""{"k": 5}"""))))
    assert(c("k", "match_any", "2|5|x").matches(pt(Some("""{"k": "x"}"""))))
    assert(!c("k", "match_any", "2|5|x").matches(pt(Some("""{"k": "2"}"""))))
    assert(!c("k", "match_any", "2|5|x").matches(pt(Some("""{"k": 7}"""))))
    // MatchText: every query token must appear among the field's tokens
    val doc = pt(Some("""{"t": "Fast vector scan over batch data"}"""))
    assert(c("t", "match_text", "vector batch").matches(doc))
    assert(c("t", "match_text", "FAST data").matches(doc))  // case-folded
    assert(!c("t", "match_text", "vector missing").matches(doc))
    assert(!c("t", "match_text", "vec").matches(doc))       // token, not substring
    assert(!c("t", "match_text", "vector").matches(pt(Some("""{"t": 3}"""))))
  }

  test("condition vocabulary: values_count, has_vector, datetime, phrase, geo, nested") {
    def c(key: String, op: String, v: String) = PayloadCondition(key, op, v)
    def pt(payload: Option[String]) = Point("x", payload)
    // ValuesCount: array length; a present scalar counts 1; an empty
    // array counts 0; a missing/null key matches NOTHING (not 0)
    assert(c("k", "values_count", "gte:2").matches(pt(Some("""{"k": [1, 2]}"""))))
    assert(!c("k", "values_count", "gte:2").matches(pt(Some("""{"k": [1]}"""))))
    assert(c("k", "values_count", "eq:1").matches(pt(Some("""{"k": "solo"}"""))))
    assert(c("k", "values_count", "lt:1").matches(pt(Some("""{"k": []}"""))))
    assert(!c("k", "values_count", "lte:5").matches(pt(Some("""{"other": 1}"""))))
    assert(!c("k", "values_count", "lte:5").matches(pt(None)))
    intercept[IllegalArgumentException](c("k", "values_count", "between:2"))
    // HasVector: presence of the named vector field, any vector kind
    val vp = Point("1", None, dense = Map("a" -> Array(1f)),
      sparse = Map("s" -> (Array(0), Array(1f))))
    assert(c("a", "has_vector", "").matches(vp))
    assert(c("s", "has_vector", "").matches(vp))
    assert(!c("b", "has_vector", "").matches(vp))
    // Datetime: offset / local / date-only forms all parse; an
    // unparseable payload value matches nothing; a bad bound fails fast
    assert(c("t", "dt_gte", "2024-01-10").matches(pt(Some("""{"t": "2024-01-10T00:00:00"}"""))))
    assert(c("t", "dt_lt", "2024-01-10T00:00:01").matches(pt(Some("""{"t": "2024-01-10T00:00:00.999999"}"""))))
    assert(c("t", "dt_gt", "2024-01-09T23:00:00+00:00").matches(pt(Some("""{"t": "2024-01-10T00:00:00"}"""))))
    assert(!c("t", "dt_gte", "2024-01-10").matches(pt(Some("""{"t": "not a date"}"""))))
    intercept[IllegalArgumentException](c("t", "dt_gte", "bogus"))
    // Phrase: consecutive, ordered, case-folded tokens
    val doc = pt(Some("""{"t": "Fast vector scan over batch data"}"""))
    assert(c("t", "phrase", "vector scan").matches(doc))
    assert(c("t", "phrase", "FAST Vector").matches(doc))
    assert(!c("t", "phrase", "vector batch").matches(doc))
    assert(!c("t", "phrase", "scan vector").matches(doc))
    // Geo radius + box, including the antimeridian wrap and a
    // missing-member location (matches nothing, decisively)
    val paris = pt(Some("""{"loc": {"lat": 48.8566, "lon": 2.3522}}"""))
    assert(c("loc", "geo_radius", "48.8, 2.3, 50000").matches(paris))
    assert(!c("loc", "geo_radius", "40.7, -74.0, 50000").matches(paris))
    assert(!c("loc", "geo_radius", "48.8,2.3,50000")
      .matches(pt(Some("""{"loc": {"lat": 48.8}}"""))))
    assert(c("loc", "geo_box", "50,0,40,10").matches(paris))
    val fiji = pt(Some("""{"loc": {"lat": -17.7, "lon": 178.0}}"""))
    assert(c("loc", "geo_box", "0,170,-30,-170").matches(fiji))
    assert(!c("loc", "geo_box", "0,-170,-30,170").matches(fiji))
    intercept[IllegalArgumentException](c("loc", "geo_radius", "1,2"))
    // Nested: ALL sub-conditions must hold on the SAME element
    val items = pt(Some("""{"items": [{"tag": "a", "n": 1}, {"tag": "b", "n": 9}]}"""))
    assert(c("items", "nested", "tag|eq|b&n|gte|5").matches(items))
    assert(!c("items", "nested", "tag|eq|a&n|gte|5").matches(items))
    assert(!c("items", "nested", "tag|eq|c").matches(items))
    assert(!c("items", "nested", "tag|eq|a").matches(pt(Some("""{"items": 3}"""))))
    intercept[IllegalArgumentException](c("items", "nested", "tag|match_any|a"))
    intercept[IllegalArgumentException](c("items", "nested", ""))
  }

  test("has_vector filter widens the internal fetch; caller narrowing restored") {
    CollectionStores.register("thv",
      InMemoryCollectionStore.single("c", desc, mkPoints(12)))
    // projection asks for NO vectors; the filter still sees presence
    val df = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "thv").option("collection", "c")
      .option("filter", "text_embedding:has_vector:")
      .load().select("id")
    assert(df.collect().map(_.getString(0)).toSet ===
      (0 until 12).filter(_ % 3 != 2).map(_.toString).toSet)
    // and the store-level contract: widened internally, stripped out
    val pts = CollectionStores.get("thv").queryPointsFiltered(
      "c", 0, 12, withPayload = false, Nil, None,
      pfilter = PayloadFilter.mustAll(Seq(
        PayloadCondition("text_embedding", "has_vector", "")))).toSeq
    assert(pts.nonEmpty && pts.forall(p =>
      p.dense.isEmpty && p.multi.isEmpty && p.sparse.isEmpty))
  }

  test("filter object: must_not and min_should compose with must") {
    CollectionStores.register("tbf",
      InMemoryCollectionStore.single("c", desc, mkPoints(20)))
    def read(opts: (String, String)*) =
      opts.foldLeft(spark.read.format("graft.sources.CollectionDataSource")
        .option("store", "tbf").option("collection", "c")) {
        case (r, (k, v)) => r.option(k, v)
      }.load()
    // payload-carrying i in 0..11: {1,2,3,5,6,7,9,10,11}; must_not drops 7,
    // min_should(1 of: lte 2, gte 10) keeps {1,2,10,11}
    val df = read("filter" -> "i:lt:12", "filter.not" -> "i:eq:7",
      "filter.minShould" -> "1|i:lte:2;i:gte:10")
    assert(df.select("id").collect().map(_.getString(0)).toSet ===
      Set("1", "2", "10", "11"))
    // the full boolean filter shows in the plan
    assert(df.queryExecution.executedPlan.toString.contains("NOT i eq 7"))
    assert(df.queryExecution.executedPlan.toString.contains("1 of ("))
    // must_not ALONE admits absent-payload points — the backend's
    // negation convention (points WITHOUT the matching value pass)
    assert(read("filter.not" -> "i:lt:100").select("id")
      .collect().map(_.getString(0)).toSet === Set("0", "4", "8", "12", "16"))
    // min_should bounds guard
    intercept[IllegalArgumentException](PayloadFilter(
      minShould = Some((3, Seq(PayloadCondition("i", "eq", "1"))))))
    // COUNT(*) composes with the full object too
    assert(read("filter.not" -> "i:lt:100").agg(count(lit(1)))
      .head().getLong(0) === 5L)
  }

  test("filtered search is the true top-k of the MATCHING subset (pre-filter)") {
    CollectionStores.register("tfs",
      InMemoryCollectionStore.single("c", desc, mkPoints(20)))
    val store = CollectionStores.get("tfs")
    val spec = SearchSpec("text_embedding", Array(1.0, 0.0), "cosine", 3)
    val global = store.searchPoints("c", spec, withPayload = false, Nil).map(_._1.id)
    assert(global === Seq("19", "18", "16"))
    val filtered = store.searchPointsFiltered("c", spec, withPayload = false,
      Nil, PayloadFilter.mustAll(Seq(PayloadCondition("i", "lte", "9"))))
      .map(_._1.id)
    // DISJOINT from the global page: post-filtering it would return nothing
    assert(filtered === Seq("9", "7", "6"))
    // same through the connector: filter + search options ride together
    val df = spark.read.format("graft.sources.CollectionDataSource")
      .option("store", "tfs").option("collection", "c")
      .option("search.field", "text_embedding").option("search.vector", "1.0,0.0")
      .option("search.metric", "cosine").option("search.k", "3")
      .option("filter", "i:lte:9").load()
    assert(df.select("id").collect().map(_.getString(0)).toSeq === Seq("9", "7", "6"))
    assert(df.queryExecution.executedPlan.toString.contains("filter=[i lte 9]"))
  }
}
