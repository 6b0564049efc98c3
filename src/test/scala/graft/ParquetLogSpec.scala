package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.collections._
import graft.sources._

/** The parquet store's change-log sidecar: initial-ingest segments, COW
  * upsert/delete batches, segment-pruned tail replay, compaction
  * (snapshot = the primaries themselves + retained tail at original
  * global positions), and the connector's streaming read / batch write
  * running unchanged over the lakehouse backend.
  */
class ParquetLogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-pqlog-$tag").toString

  private def frame = Collections.homogeneous(spark, TestSpark.sfDir)
    .select("id", "payload", "vector")

  private def store(dir: String) = new ParquetCollectionStore(
    dir, "embeddings", Collections.homogeneousDescriptor)

  private def mkStore(tag: String): (String, ParquetCollectionStore) = {
    val dir = freshDir(tag)
    ParquetCollectionStore.write(frame, dir, numFiles = 4, withLog = true)
    (dir, store(dir))
  }

  test("withLog ingest: the log replays as exactly the sealed collection") {
    val (_, st) = mkStore("ingest")
    val n = st.pointCount("embeddings")
    assert(st.logStart("embeddings") === 0L)
    assert(st.logSize("embeddings") === n)
    val entries = st.logEntries("embeddings", 0L, n).toIndexedSeq
    assert(entries.size.toLong === n)
    assert(entries.forall(_.op == LogOps.Upsert))
    // positions are the enumeration order, entries ARE the points
    assert(entries.map(_.seq) === (0L until n))
    val replayIds = entries.map(_.point.id)
    val storedIds = st.queryPoints("embeddings", 0L, n, withPayload = false,
      Nil, None).map(_.id).toIndexedSeq
    assert(replayIds === storedIds)
    // entries carry payload + vector bytes (the full upsert)
    assert(entries.forall(e => e.point.payload.nonEmpty &&
      e.point.dense.get("vector").exists(_.nonEmpty)))
    // a TAIL window decodes only tail entries (segment files are
    // position-named; non-overlapping ones are never opened)
    val tail = st.logEntries("embeddings", n - 3, n).toIndexedSeq
    assert(tail.map(_.seq) === ((n - 3) until n))
  }

  test("COW upsert: replaces by id, inserts sorted, rewrites only touched files, logs one segment") {
    val (dir, st0) = mkStore("upsert")
    val n = st0.pointCount("embeddings")
    val files = Option(new java.io.File(dir).listFiles()).get
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.length === 4)
    val before = files.map(f => f.getName -> f.length()).toMap
    // replace point "0" (first range) and insert a brand-new max id
    val p0 = st0.queryPoints("embeddings", 0L, n, withPayload = true,
      Seq("vector"), None, idFilter = Some(Set("0"))).next()
    val replaced = p0.copy(payload = Some("""{"rewritten":true}"""))
    val zMax = Point("zzz_new", Some("""{"fresh":1}"""),
      Map("vector" -> p0.dense("vector")))
    val st1 = st0.appended("embeddings", IndexedSeq(replaced, zMax))
    assert(st1.pointCount("embeddings") === n + 1)
    val got = st1.queryPoints("embeddings", 0L, n + 1, withPayload = true,
      Seq("vector"), None, idFilter = Some(Set("0", "zzz_new"))).toList
    assert(got.map(_.id).toSet === Set("0", "zzz_new"))
    assert(got.find(_.id == "0").get.payload === Some("""{"rewritten":true}"""))
    // COW granularity: the two touched ranges rewrote; at least one of
    // the middle files is byte-identical untouched
    val after = Option(new java.io.File(dir).listFiles()).get
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.length()).toMap
    assert(after.keySet === before.keySet)
    assert(before.count { case (k, v) => after(k) == v } >= 2,
      s"expected untouched middle files, before=$before after=$after")
    // the batch sealed as one segment at [n, n+2)
    assert(st1.logSize("embeddings") === n + 2)
    val seg = st1.logEntries("embeddings", n, n + 2).toIndexedSeq
    assert(seg.map(e => (e.op, e.point.id)) ===
      IndexedSeq((LogOps.Upsert, "0"), (LogOps.Upsert, "zzz_new")))
  }

  test("COW delete: drops ids, logs tombstones, then compaction keeps the tail at original positions") {
    val (_, st0) = mkStore("delete")
    val n = st0.pointCount("embeddings")
    val st1 = st0.removed("embeddings", Set("3", "13", "23"))
    assert(st1.pointCount("embeddings") === n - 3)
    assert(st1.queryPoints("embeddings", 0L, n, withPayload = false, Nil,
      None, idFilter = Some(Set("3", "13", "23"))).isEmpty)
    val tomb = st1.logEntries("embeddings", n, n + 3).toIndexedSeq
    assert(tomb.forall(_.op == LogOps.Delete))
    assert(tomb.map(_.point.id).sorted === IndexedSeq("13", "23", "3"))
    // compact away the ingest prefix: tail survives at original seqs
    val st2 = st1.compacted("embeddings", n)
    assert(st2.logStart("embeddings") === n)
    assert(st2.logSize("embeddings") === n + 3)
    val kept = st2.logEntries("embeddings", n, n + 3).toIndexedSeq
    assert(kept.map(_.seq) === (n until n + 3))
    assert(kept.map(e => (e.op, e.point.id)) === tomb.map(e => (e.op, e.point.id)))
    // replay into the dropped range fails LOUDLY
    val e = intercept[IllegalStateException] {
      st2.logEntries("embeddings", 0L, n)
    }
    assert(e.getMessage.contains("compacted away"))
    // primaries are the checkpoint: state unchanged by compaction
    assert(st2.pointCount("embeddings") === n - 3)
    // compacting mid-segment splits it: the retained suffix replays
    val st3 = st1.compacted("embeddings", n + 1)
    assert(st3.logStart("embeddings") === n + 1)
    val suffix = st3.logEntries("embeddings", n + 1, n + 3).toIndexedSeq
    assert(suffix.map(_.seq) === (n + 1 until n + 3))
    assert(suffix.map(_.point.id) === tomb.drop(1).map(_.point.id))
  }

  test("connector: streaming read (AvailableNow) replays the parquet log; batch DSv2 write commits COW") {
    val (_, st) = mkStore("conn")
    CollectionStores.register("pqlog_stream", st)
    val ckpt = freshDir("ckpt")
    val sink = s"pqlog_out_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("graft.sources.CollectionDataSource")
      .option("store", "pqlog_stream").option("collection", "embeddings")
      .option("partitions", "4").load()
      .select(col("id"), col("payload"))
      .writeStream.format("memory").queryName(sink)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table(sink).collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    val want = frame.select("id", "payload").collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(streamed.toSeq === want.toSeq)

    // batch write INTO an empty parquet collection through the connector
    val dstDir = freshDir("dst")
    ParquetCollectionStore.initEmpty(dstDir)
    CollectionStores.register("pqlog_dst", store(dstDir))
    frame.write.format("graft.sources.CollectionDataSource")
      .option("store", "pqlog_dst").option("collection", "embeddings")
      .mode("append").save()
    val dst = CollectionStores.get("pqlog_dst")
    assert(dst.pointCount("embeddings") === frame.count())
    // ... and the write is itself CDC-replayable from the dst log
    assert(dst.logSize("embeddings") === frame.count())
  }

  test("heterogeneous COW: all three vector kinds survive mutation and changelog replay") {
    val dir = freshDir("hetero")
    val het = Collections.heterogeneous(spark, TestSpark.sfDir)
    ParquetCollectionStore.write(het, dir, numFiles = 2, withLog = true)
    val st0 = new ParquetCollectionStore(dir, "hetero",
      Collections.heterogeneousDescriptor)
    val n = st0.pointCount("hetero")
    val fields = Collections.heterogeneousDescriptor.fields.map(_.name)
    // upsert a point carrying dense + multi + sparse at once
    val p = Point("zz_new", Some("""{"k":1}"""),
      dense = Map("text_embedding" -> Array(1f, 2f, 3f)),
      multi = Map("multi_embeddings" -> Array(Array(1f, 0f), Array(0f, 1f))),
      sparse = Map("keywords" -> ((Array(2, 9), Array(0.5f, 0.25f)))))
    val st1 = st0.appended("hetero", IndexedSeq(p))
    assert(st1.pointCount("hetero") === n + 1)
    val got = st1.queryPoints("hetero", 0L, n + 1, withPayload = true,
      fields, None, idFilter = Some(Set("zz_new"))).next()
    assert(got.dense("text_embedding").toSeq === Seq(1f, 2f, 3f))
    assert(got.multi("multi_embeddings").map(_.toSeq).toSeq ===
      Seq(Seq(1f, 0f), Seq(0f, 1f)))
    assert(got.sparse("keywords")._1.toSeq === Seq(2, 9))
    assert(got.sparse("keywords")._2.toSeq === Seq(0.5f, 0.25f))
    // a PRE-EXISTING point in the rewritten file keeps every kind intact
    // (the COW re-seal round-trips columns it did not touch)
    val before = st0.queryPoints("hetero", 0L, n, withPayload = true,
      fields, None).map(q => q.id ->
        (q.dense.view.mapValues(_.toSeq).toMap,
         q.multi.view.mapValues(_.map(_.toSeq).toSeq).toMap,
         q.sparse.view.mapValues(v => (v._1.toSeq, v._2.toSeq)).toMap,
         q.payload)).toMap
    val after = st1.queryPoints("hetero", 0L, n + 1, withPayload = true,
      fields, None).filter(_.id != "zz_new").map(q => q.id ->
        (q.dense.view.mapValues(_.toSeq).toMap,
         q.multi.view.mapValues(_.map(_.toSeq).toSeq).toMap,
         q.sparse.view.mapValues(v => (v._1.toSeq, v._2.toSeq)).toMap,
         q.payload)).toMap
    assert(after === before)
    // the changelog entry carries the full multi/sparse point too
    val entry = st1.logEntries("hetero", n, n + 1).next()
    assert(entry.point.multi("multi_embeddings").map(_.toSeq).toSeq ===
      Seq(Seq(1f, 0f), Seq(0f, 1f)))
    assert(entry.point.sparse("keywords")._1.toSeq === Seq(2, 9))
    // delete it again: tombstone appended, state restored — and the
    // DELETE rewrite must round-trip EVERY vector kind of the kept rows
    // in the touched file (not just dense): after === before, fully
    val st2 = st1.removed("hetero", Set("zz_new"))
    assert(st2.pointCount("hetero") === n)
    val afterDelete = st2.queryPoints("hetero", 0L, n, withPayload = true,
      fields, None).map(q => q.id ->
        (q.dense.view.mapValues(_.toSeq).toMap,
         q.multi.view.mapValues(_.map(_.toSeq).toSeq).toMap,
         q.sparse.view.mapValues(v => (v._1.toSeq, v._2.toSeq)).toMap,
         q.payload)).toMap
    assert(afterDelete === before)
    // and a delete of a PRE-EXISTING id (forces a kept-rows rewrite of
    // an original file) preserves the other rows' multi/sparse columns
    val victim = before.keys.min
    val st3 = st2.removed("hetero", Set(victim))
    assert(st3.pointCount("hetero") === n - 1)
    val afterVictim = st3.queryPoints("hetero", 0L, n, withPayload = true,
      fields, None).map(q => q.id ->
        (q.dense.view.mapValues(_.toSeq).toMap,
         q.multi.view.mapValues(_.map(_.toSeq).toSeq).toMap,
         q.sparse.view.mapValues(v => (v._1.toSeq, v._2.toSeq)).toMap,
         q.payload)).toMap
    assert(afterVictim === (before - victim))
  }

  test("store without _log: streaming surface still fails loudly, mutations refused") {
    val dir = freshDir("nolog")
    ParquetCollectionStore.write(frame, dir, numFiles = 2)
    val st = store(dir)
    val e = intercept[UnsupportedOperationException] { st.logSize("embeddings") }
    assert(e.getMessage.contains("no change log"))
    val m = intercept[IllegalArgumentException] {
      st.appended("embeddings", IndexedSeq(Point("x", None, Map.empty)))
    }
    assert(m.getMessage.contains("_log"))
  }
}
