package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.collections._

/** Collection data model: schema inference rules (SURVEY.md §1.2), NULL
  * semantics for absent fields, and Catalyst pushdown behavior over the
  * collection views (the §2.A A3/A4 parity: projection + limit reach the
  * parquet scan).
  */
class CollectionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("descriptor schema follows the reference inference rules") {
    val d = CollectionDescriptor("c", Seq(
      DenseField("text_embedding", 3),
      MultiField("multi", 2),
      SparseField("keywords")))
    val s = d.schema
    assert(s.fieldNames.toSeq === Seq("id", "payload", "text_embedding",
      "multi", "keywords_indices", "keywords_values"))
    assert(!s("id").nullable)                       // id non-null
    assert(s("payload").nullable)
    assert(s("text_embedding").dataType === ArrayType(FloatType))
    assert(s("multi").dataType === ArrayType(ArrayType(FloatType)))
    assert(s("keywords_indices").dataType === ArrayType(IntegerType))
    assert(s("keywords_values").dataType === ArrayType(FloatType))
    assert(s.drop(2).forall(_.nullable))            // all vector fields nullable
  }

  test("unnamed collection exposes the single dense field as `vector`") {
    val d = CollectionDescriptor("c", Seq(DenseField("anything", 3)), named = false)
    assert(d.schema.fieldNames.toSeq === Seq("id", "payload", "vector"))
  }

  test("physicalColumns expands sparse fields to the two-column convention") {
    val d = Collections.heterogeneousDescriptor
    assert(d.physicalColumns(Seq("id", "keywords")) ===
      Seq("id", "keywords_indices", "keywords_values"))
    assert(d.physicalColumns(Seq("text_embedding")) === Seq("text_embedding"))
  }

  test("homogeneous view: id non-null string, vector float array") {
    val df = Collections.homogeneous(spark, TestSpark.sfDir)
    assert(df.schema("id").dataType === StringType)
    assert(df.schema("vector").dataType === ArrayType(FloatType, containsNull = true))
    assert(df.filter(col("id").isNull).count() === 0)
    assert(df.count() === 500)
  }

  test("heterogeneous view: absent fields are NULL, never empty lists") {
    val df = Collections.heterogeneous(spark, TestSpark.sfDir)
    // vec_id % 3 == 1 rows: no keywords, no multi, no audio
    val m1 = df.filter(col("id").cast(LongType) % 3 === 1)
    assert(m1.filter(col("keywords_indices").isNotNull).count() === 0)
    assert(m1.filter(col("multi_embeddings").isNotNull).count() === 0)
    assert(m1.filter(col("text_embedding").isNull).count() === 0)
    // populated sparse rows: indices and values line up
    val m0 = df.filter(col("id").cast(LongType) % 3 === 0)
      .select(size(col("keywords_indices")).as("ni"), size(col("keywords_values")).as("nv"))
    assert(m0.filter(col("ni") =!= col("nv")).count() === 0)
    // and never the empty-list-instead-of-null degenerate
    assert(df.filter(size(col("text_embedding")) === 0).count() === 0)
  }

  test("projection is pruned to the parquet scan (ReadSchema)") {
    val df = Collections.homogeneous(spark, TestSpark.sfDir).select("id")
    val plan = df.queryExecution.executedPlan.toString
    // only vec_id should be read from parquet, not embedding/label
    assert(plan.contains("ReadSchema: struct<vec_id:bigint>"),
      s"embedding/label not pruned from scan:\n$plan")
  }

  test("filter is pushed down to the parquet scan (PushedFilters)") {
    val df = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .filter(col("vec_id") === 7).select("vec_id", "label")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(vec_id), EqualTo(vec_id,7)]"),
      s"missing pushdown:\n$plan")
  }

  test("multi_vector_from_flat splits evenly or yields NULL") {
    import spark.implicits._
    import graft.functions.multi_vector_from_flat
    val df = Seq(
      (Seq(1f, 2f, 3f, 4f, 5f, 6f), 2),
      (Seq(1f, 2f, 3f, 4f, 5f), 2)).toDF("flat", "n")
      .select(multi_vector_from_flat(col("flat"), col("n")).as("m"))
    val rows = df.collect()
    assert(rows(0).getSeq[Seq[Float]](0) === Seq(Seq(1f, 2f, 3f), Seq(4f, 5f, 6f)))
    assert(rows(1).isNullAt(0))   // 5 % 2 != 0 -> NULL (reference errors)
    // STRICT mode: the reference's error semantics opt-in — an
    // indivisible length FAILS the job instead of thinning the column;
    // divisible rows still split identically
    val strictOk = Seq((Seq(1f, 2f, 3f, 4f), 2)).toDF("flat", "n")
      .select(multi_vector_from_flat(col("flat"), col("n"), strict = true))
      .collect()
    assert(strictOk(0).getSeq[Seq[Float]](0) === Seq(Seq(1f, 2f), Seq(3f, 4f)))
    val e = intercept[Exception] {
      Seq((Seq(1f, 2f, 3f, 4f, 5f), 2)).toDF("flat", "n")
        .select(multi_vector_from_flat(col("flat"), col("n"), strict = true))
        .collect()
    }
    assert(e.getMessage.contains("not divisible") ||
      Option(e.getCause).exists(_.getMessage.contains("not divisible")))
  }

  test("writeCollection/readCollection round-trips schema and NULLs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val src = Collections.heterogeneous(spark, TestSpark.sfDir)
    Collections.writeCollection(src, dir)
    val back = Collections.readCollection(spark, dir)
    // parquet re-read widens containsNull; compare types modulo nullability
    assert(back.schema.map(f => (f.name, f.dataType.simpleString)) ===
      src.schema.map(f => (f.name, f.dataType.simpleString)))
    assert(back.count() === src.count())
    assert(back.filter(col("audio_embedding").isNull).count() ===
      src.filter(col("audio_embedding").isNull).count())
  }

  test("limit becomes CollectLimit/GlobalLimit (no full materialization)") {
    val df = Collections.homogeneous(spark, TestSpark.sfDir).limit(3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("CollectLimit") || plan.contains("GlobalLimit"), plan)
    assert(df.count() === 3)
  }

  test("snapshot/restore round-trips points AND config the schema can't carry") {
    import graft.sources._
    val src = Collections.heterogeneous(spark, TestSpark.sfDir).limit(30)
    CollectionStores.register("snap_spec_src", InMemoryCollectionStore.fromRows(
      src, "hetero", Collections.heterogeneousDescriptor))
    val path = java.nio.file.Files.createTempDirectory("graft-snap-spec").toString
    Snapshot.create(spark, "snap_spec_src", "hetero", path)
    val restored = Snapshot.restore(spark, path, "snap_spec_dst", "hetero2")

    // descriptor survives EXACTLY — including the per-field metrics that
    // fromSchema-style inference would default to cosine
    val desc = CollectionStores.get("snap_spec_dst").collectionInfo("hetero2")
    assert(desc.fields === Collections.heterogeneousDescriptor.fields)
    assert(desc.name === "hetero2" && desc.named)
    assert(desc.fields.collect { case DenseField(n, _, m) => n -> m }
      .toMap.apply("image_embedding") === "dot")

    // every point, every field round-trips (NULL absences included)
    val a = src.orderBy("id").collect().map(_.toString).toSeq
    val b = restored.select(src.columns.map(col): _*)
      .orderBy("id").collect().map(_.toString).toSeq
    assert(a === b)

    // the manifest parser rejects corrupt field lines
    intercept[IllegalArgumentException] {
      Snapshot.parseManifest("name=x\nnamed=true\nfield=weird|a|b|c", "x")
    }
  }

  test("storage snapshot carries the index sidecars: the restored store's FIRST search is graph-served") {
    import graft.sources._
    import spark.implicits._
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft-snapidx-src").toString
    val desc = CollectionDescriptor("d", Seq(DenseField("vector", 2)),
      named = false)
    val df = (1 to 40).map { i =>
      val a = i * 0.15
      (f"$i%03d", s"""{"g":${i % 4}}""",
        Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }.toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, srcDir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeHnswSidecar(df, srcDir, field = "vector",
      m = 4, efConstruction = 16, numSegments = 2)
    // CHURN that the online maintenance absorbs — the snapshot must
    // carry the absorbed state (inc files, watermark, tombstones)
    val churned = new ParquetCollectionStore(srcDir, "d", desc,
        hnswEf = 256)
      .appended("d", IndexedSeq(Point("500", Some("""{"g":1}"""),
        dense = Map("vector" -> Array(1.0f, 0.2f)))))
      .removed("d", Set("003"))
    CollectionStores.register("snapidx_spec_src", churned)
    val path = java.nio.file.Files
      .createTempDirectory("graft-snapidx").toString
    Snapshot.createStorage("snapidx_spec_src", "d", path)
    val dstDir = java.nio.file.Files
      .createTempDirectory("graft-snapidx-dst").toString + "/store"
    Snapshot.restoreStorage(spark, path, "snapidx_spec_dst", "d", dstDir,
      hnswEf = 256)
    val restored = CollectionStores.get("snapidx_spec_dst")
      .asInstanceOf[ParquetCollectionStore]
    val spec0 = SearchSpec("vector", Array(1.0, 0.2), "cosine", 5)
    val got = restored.searchPoints("d", spec0, withPayload = true, Nil)
    // the serve came from the RESTORED sidecar: graphs resident,
    // primaries never opened, no rebuild ran — and the churn is visible
    assert(restored.hnswSegmentsLoaded.get() === 2L)
    assert(restored.filesOpened.get() === 0L)
    assert(got.head._1.id === "500")
    assert(!got.exists(_._1.id == "003"))
    // exactness: equals brute force over the restored primaries
    val brute = new ParquetCollectionStore(dstDir, "d", desc)
    assert(got.map(p => (p._1.id, p._2)) ===
      brute.searchPoints("d", spec0, withPayload = true, Nil)
        .map(p => (p._1.id, p._2)))
    // the changelog restored too: CDC positions survive the hop
    assert(restored.logSize("d") === churned.logSize("d"))
    // non-parquet stores reject the storage form loudly
    CollectionStores.register("snapidx_mem",
      InMemoryCollectionStore.single("d", desc,
        IndexedSeq(Point("1", None,
          dense = Map("vector" -> Array(1.0f, 0.0f))))))
    intercept[IllegalArgumentException] {
      Snapshot.createStorage("snapidx_mem", "d", path)
    }
  }
}
