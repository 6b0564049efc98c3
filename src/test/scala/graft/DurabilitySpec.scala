package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.collections._
import graft.sources._

/** Crash-safety of the sidecar maintenance artifacts: flag files must
  * survive delimiter-hostile ids, torn watermark writes must park (not
  * crash) every subsequent open, and a consolidation interrupted
  * mid-rewrite must retire the sidecar (exact brute serve) instead of
  * serving silently incomplete partitions. The backend these semantics
  * mirror treats its index as disposable-but-never-wrong state: recovery
  * degrades to the exact path and the optimizer reseals
  * (/root/reference/tests/bin/config.yaml:169-191 indexing thresholds).
  */
class DurabilitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val denseDesc = CollectionDescriptor("d",
    Seq(DenseField("vector", 2)), named = false)
  private val sparseDesc = CollectionDescriptor("sp", Seq(SparseField("kw")))

  /** Ids that would corrupt a naive delimiter-separated flag file. */
  private val hostile = Seq("a\tb", "c\nd", "e%25f", "plain")

  private def denseDir(ids: Seq[String]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dur").toString
    val df = ids.zipWithIndex.map { case (id, i) =>
      val a = (i + 1) * 0.4
      (id, s"""{"g":${i % 2}}""",
        Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }.toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 1, withLog = true)
    ParquetCollectionStore.writeHnswSidecar(df, dir, field = "vector",
      m = 4, efConstruction = 16, numSegments = 2)
    dir
  }

  test("escapeFlag/unescapeFlag round-trip the flag metacharacters") {
    val cases = hostile ++ Seq("", "%", "%0", "%09", "\t\n\r%", "x%09y",
      "trailing\t", "\nleading", "mixed\t%\nnewline\r")
    cases.foreach { s =>
      val e = ParquetCollectionStore.escapeFlag(s)
      assert(!e.contains('\t') && !e.contains('\n') && !e.contains('\r'))
      assert(ParquetCollectionStore.unescapeFlag(e) === s)
    }
  }

  test("a legacy un-escaped flag line decodes verbatim instead of crashing the open") {
    // pre-escaping dead.txt lines may carry a literal '%' NOT followed
    // by two hex digits — the tolerant read emits those characters
    // as-is (same discipline as torn-watermark reads), never throws
    val legacy = Seq("%", "a%", "a%2", "50%-off", "%zz", "%%25", "%-5x")
    legacy.foreach { s =>
      val got = ParquetCollectionStore.unescapeFlag(s)
      assert(got.length >= s.count(_ != '%'), s)
    }
    assert(ParquetCollectionStore.unescapeFlag("50%-off") === "50%-off")
    assert(ParquetCollectionStore.unescapeFlag("a%2") === "a%2")
    assert(ParquetCollectionStore.unescapeFlag("%zz") === "%zz")
    // signed "hex" is NOT an escape — only two hex digits decode
    assert(ParquetCollectionStore.unescapeFlag("%-5x") === "%-5x")
    // real escapes still decode beside legacy residue
    assert(ParquetCollectionStore.unescapeFlag("%2550%-off") === "%50%-off")
  }

  test("a bulk reseal interrupted mid-overwrite parks the marker (exact serve, no stale claim)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-durrs").toString
    val df = (0 until 40).map { i =>
      val a = (i + 1) * 0.17
      (f"$i%03d", s"""{"g":${i % 2}}""",
        Array(math.cos(a).toFloat, math.sin(a).toFloat))
    }.toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 1, withLog = true)
    ParquetCollectionStore.writeSparseSidecar(
      df.selectExpr("id", "array(0, 1) as kw_indices",
        "array(cast(1.0 as float), cast(2.0 as float)) as kw_values"),
      dir, field = "kw")
    val marker = new java.io.File(s"$dir/_sparse/meta.txt")
    assert(marker.isFile)
    // a reseal that dies mid-overwrite: the parked marker stays parked
    intercept[RuntimeException] {
      ParquetCollectionStore.parkedReseal(marker) {
        throw new RuntimeException("crash mid-overwrite")
      }
    }
    assert(!marker.isFile, "the marker must not claim currency")
    assert(new java.io.File(s"$dir/_sparse/meta.txt.parked").isFile)
    // a completed reseal consumes the parked copy and leaves the fresh
    // marker the work wrote
    java.nio.file.Files.move(
      new java.io.File(s"$dir/_sparse/meta.txt.parked").toPath,
      marker.toPath): Unit
    ParquetCollectionStore.parkedReseal(marker) {
      ParquetCollectionStore.writeSparseSidecar(
        df.selectExpr("id", "array(0, 1) as kw_indices",
          "array(cast(1.0 as float), cast(2.0 as float)) as kw_values"),
        dir, field = "kw")
    }
    assert(marker.isFile)
    assert(!new java.io.File(s"$dir/_sparse/meta.txt.parked").isFile)
  }

  test("atomicWriteText replaces content and leaves no temp file") {
    val p = java.nio.file.Files.createTempDirectory("graft-awt")
      .resolve("w.txt")
    ParquetCollectionStore.atomicWriteText(p, "1")
    ParquetCollectionStore.atomicWriteText(p, "22")
    assert(new String(java.nio.file.Files.readAllBytes(p)) === "22")
    assert(!java.nio.file.Files.exists(
      p.resolveSibling(p.getFileName.toString + ".inflight")))
  }

  test("HNSW tombstone flags survive ids carrying tabs and newlines") {
    val extra = (1 to 30).map(i => f"id$i%03d")
    val dir = denseDir(hostile ++ extra)
    val st = new ParquetCollectionStore(dir, "d", denseDesc, hnswEf = 128)
    val doomed = Set("a\tb", "c\nd")
    val m = st.removed("d", doomed)
    // flags round-trip: a FRESH open parses the dead file and the serve
    // excludes exactly the flagged ids (the old format split one
    // newline-carrying flag into two garbage lines)
    val served = new ParquetCollectionStore(dir, "d", denseDesc,
      hnswEf = 128)
    val spec = SearchSpec("vector", Array(1.0, 0.3), "cosine",
      hostile.size + extra.size)
    val got = served.searchPoints("d", spec, withPayload = false, Nil)
    assert(!got.exists(p => doomed(p._1.id)))
    val brute = new ParquetCollectionStore(dir, "d", denseDesc)
    assert(got.map(p => (p._1.id, p._2)) ===
      brute.searchPoints("d", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
    // a SECOND mutation re-reads the flag file on the maintenance path
    // (the resurrection check) — must not throw on the escaped ids
    val m2 = m.appended("d", IndexedSeq(Point("a\tb", Some("""{"g":1}"""),
      dense = Map("vector" -> Array(0.9f, 0.1f)))))
    val back = new ParquetCollectionStore(dir, "d", denseDesc, hnswEf = 128)
      .searchPoints("d", spec, withPayload = false, Nil)
    assert(back.exists(_._1.id == "a\tb"))
    assert(!back.exists(_._1.id == "c\nd"))
    assert(m2.pointCount("d") === (hostile.size + extra.size - 1).toLong)
  }

  test("a zero-dim sparse tombstone no longer corrupts the flag file") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-dursp").toString
    val rows = (0 until 10).map { i =>
      (i.toString, s"""{"i":$i}""",
        Seq(i % 3, 7), Seq(1.0f + i, 0.5f))
    } :+ (("empty", """{"i":-1}""", Seq.empty[Int], Seq.empty[Float]))
    val df = rows.toDF("id", "payload", "kw_indices", "kw_values")
    ParquetCollectionStore.write(df, dir, numFiles = 1, withLog = true)
    ParquetCollectionStore.writeSparseSidecar(df, dir, "kw", nBuckets = 4)
    val st = new ParquetCollectionStore(dir, "sp", sparseDesc)
    // deleting the zero-dim point writes a flag with NO dims — the old
    // reader crashed every subsequent open on the tab-less line
    val m = st.removed("sp", Set("empty"))
    val served = new ParquetCollectionStore(dir, "sp", sparseDesc)
    val got = served.searchPoints("sp",
      SearchSpec("kw", Array(2.0, 1.5), "dot", 5,
        sparseIndices = Some(Array(1, 7))),
      withPayload = false, Nil)
    assert(got.nonEmpty && !got.exists(_._1.id == "empty"))
    // and the NEXT mutation reads the flag file back without throwing
    val m2 = m.appended("sp", IndexedSeq(Point("new",
      Some("""{"i":99}"""),
      sparse = Map("kw" -> ((Array(1), Array(3.0f)))))))
    assert(m2.pointCount("sp") === 11L)
  }

  test("a torn (empty) watermark parks the sidecar tail instead of crashing opens") {
    val dir = denseDir((1 to 20).map(i => f"p$i%03d"))
    val st = new ParquetCollectionStore(dir, "d", denseDesc, hnswEf = 128)
    val m = st.appended("d", IndexedSeq(Point("q999", Some("""{"g":1}"""),
      dense = Map("vector" -> Array(0.95f, 0.2f)))))
    assert(m.pointCount("d") === 21L)
    // simulate the crash window: the truncating write died after
    // truncate, before content — inserted.txt is empty
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/_hnsw/inserted.txt"),
      Array.emptyByteArray): Unit
    val reopened = new ParquetCollectionStore(dir, "d", denseDesc,
      hnswEf = 128)
    val spec = SearchSpec("vector", Array(1.0, 0.2), "cosine", 5)
    // the unparseable watermark reads as absent: the sidecar serves at
    // its BUILD position and the overlay tail re-covers the upsert —
    // exact results, no NumberFormatException
    val got = reopened.searchPoints("d", spec, withPayload = false, Nil)
    val brute = new ParquetCollectionStore(dir, "d", denseDesc)
    assert(got.map(p => (p._1.id, p._2)) ===
      brute.searchPoints("d", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
    assert(got.exists(_._1.id == "q999"))
  }

  test("a parked marker (crash mid-consolidation) retires the sidecar, serves exact") {
    val dir = denseDir((1 to 20).map(i => f"r$i%03d"))
    // simulate a crash inside withParkedMarker: the marker stays parked
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/_hnsw/field.txt"),
      java.nio.file.Paths.get(s"$dir/_hnsw/field.txt.parked")): Unit
    val st = new ParquetCollectionStore(dir, "d", denseDesc, hnswEf = 128)
    val spec = SearchSpec("vector", Array(1.0, 0.2), "cosine", 5)
    val got = st.searchPoints("d", spec, withPayload = false, Nil)
    val brute = new ParquetCollectionStore(dir, "d", denseDesc)
    assert(got.map(p => (p._1.id, p._2)) ===
      brute.searchPoints("d", spec, withPayload = false, Nil)
        .map(p => (p._1.id, p._2)))
    // the serve fell back to the exact primaries (no graph resident)
    assert(st.hnswSegmentsLoaded.get() === 0L)
    assert(st.filesOpened.get() > 0L)
    // the optimizer rewrites the marker and the graph serves again —
    // but only from the REBUILT meta, so re-park then optimize
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$dir/_hnsw/field.txt.parked"),
      java.nio.file.Paths.get(s"$dir/_hnsw/field.txt")): Unit
    ParquetCollectionStore.optimize(spark, dir)
    val resealed = new ParquetCollectionStore(dir, "d", denseDesc,
      hnswEf = 128)
    val got2 = resealed.searchPoints("d", spec, withPayload = false, Nil)
    assert(got2.map(p => (p._1.id, p._2)) ===
      got.map(p => (p._1.id, p._2)))
    assert(resealed.filesOpened.get() === 0L) // graph-served again
  }
}
