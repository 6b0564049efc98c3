package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.collections._
import graft.sources._

/** The quantized HNSW serving tier: the per-segment graph walk runs
  * over int8 codes (~8x fewer resident vector bytes — the backend's
  * quantized-in-RAM memory configuration, qdrant's
  * `quantization_config` under HNSW with rescore), and an exact
  * rescore of only the candidate margin recovers the full-precision
  * page. Maintenance keeps the codes tier in lockstep with the graphs.
  */
class QuantizedHnswSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dim = 64
  private val desc = CollectionDescriptor("q",
    Seq(DenseField("vector", dim)), named = false)

  private def vec(i: Int): Array[Float] = {
    val r = new java.util.Random(i * 7919L)
    Array.fill(dim)(r.nextGaussian().toFloat)
  }

  private def mkDir(n: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-qhnsw").toString
    val df = (0 until n)
      .map(i => (f"$i%04d", s"""{"g":${i % 3}}""", vec(i)))
      .toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeHnswSidecar(df, dir, field = "vector",
      m = 8, efConstruction = 32, numSegments = 2)
    ParquetCollectionStore.writeHnswQuantizedSidecar(df, dir)
    dir
  }

  private def page(st: ParquetCollectionStore, q: Array[Double],
                   metric: String = "cosine", k: Int = 10) =
    st.searchPoints("q", SearchSpec("vector", q, metric, k),
      withPayload = false, Nil).map(p => (p._1.id, p._2))

  test("int8 walk + margin rescore equals the full-precision serve; resident bytes shrink >4x") {
    val dir = mkDir(300)
    val q = vec(9001).map(_.toDouble)
    val full = new ParquetCollectionStore(dir, "q", desc, hnswEf = 4096)
    val quant = new ParquetCollectionStore(dir, "q", desc, hnswEf = 4096,
      hnswCandidateK = 50)
    val got = page(quant, q)
    assert(got === page(full, q))
    // served from the QUANTIZED tier: codes cache resident, the
    // full-precision vector cache never loads, primaries never open
    assert(quant.hnswQuantServes.get() === 1L)
    assert(quant.hnswQuantSegmentsLoaded.get() === 2L)
    assert(quant.hnswSegmentsLoaded.get() === 0L)
    assert(quant.filesOpened.get() === 0L)
    // the memory claim: resident vector bytes shrink by > 4x (dim 64:
    // 8 B/dim doubles vs 1 B/dim codes + 12 B/vector overhead = 6.7x)
    val fullBytes = full.hnswResidentBytes
    val quantBytes = quant.hnswResidentBytes
    assert(fullBytes > 0L && quantBytes > 0L)
    assert(quantBytes * 4 < fullBytes,
      s"quant=$quantBytes full=$fullBytes — the tier is not smaller")
    // degenerate zero query under cosine: both arms return empty
    assert(page(quant, Array.fill(dim)(0.0)) === Nil)
  }

  test("the RAM claim holds under filters: the filtered walk arm rides the codes too") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-qhnswf").toString
    // 2,600 points, filter g in {0,1} matches ~1,733 — past the exact
    // micro-arm dial (max(4*window, widenedEf, 1024)), so the WALK arm
    // runs; with the codes tier + candidateK it must walk QUANTIZED
    val df = (0 until 2600)
      .map(i => (f"$i%04d", s"""{"g":${i % 3}}""", vec(i)))
      .toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeHnswSidecar(df, dir, field = "vector",
      m = 8, efConstruction = 32, numSegments = 2)
    ParquetCollectionStore.writeHnswQuantizedSidecar(df, dir)
    ParquetCollectionStore.writePayloadSidecar(
      df.select(col("id"), col("payload")), dir, key = "g", kind = "int")
    val q = vec(31337).map(_.toDouble)
    val quant = new ParquetCollectionStore(dir, "q", desc, hnswEf = 600,
      hnswCandidateK = 100)
    val pf = PayloadFilter(
      Seq(PayloadCondition("g", "match_any", "0|1")), Nil, None)
    val spec = SearchSpec("vector", q, "cosine", 10)
    val got = quant.searchPointsFiltered("q", spec, withPayload = false,
      Nil, pf)
    // the walk arm ran, quantized, and the full vectors never loaded
    assert(quant.hnswFilteredWalkServes.get() === 1L)
    assert(quant.hnswFilteredExactServes.get() === 0L)
    assert(quant.hnswQuantServes.get() === 1L)
    assert(quant.hnswSegmentsLoaded.get() === 0L)
    // ANN semantics with TRUE scores: full page, every (id, score)
    // matches the exact filtered brute score, every id passes the filter
    val brute = new ParquetCollectionStore(dir, "q", desc)
    val bruteAll = brute.searchPointsFiltered("q",
      spec.copy(k = 2600), withPayload = false, Nil, pf)
      .map(p => (p._1.id, p._2)).toMap
    assert(got.size === 10)
    got.foreach { case (p, s) => assert(bruteAll(p.id) === s) }
  }

  test("a dot-metric graph serves quantized too (scales rescale the int domain)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-qhnswd").toString
    val df = (0 until 200)
      .map(i => (f"$i%04d", s"""{"g":${i % 3}}""", vec(i)))
      .toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeHnswSidecar(df, dir, field = "vector",
      m = 8, efConstruction = 32, numSegments = 2, metric = "dot")
    ParquetCollectionStore.writeHnswQuantizedSidecar(df, dir)
    val q = vec(7777).map(_.toDouble)
    val quant = new ParquetCollectionStore(dir, "q", desc, hnswEf = 4096,
      hnswCandidateK = 50)
    val full = new ParquetCollectionStore(dir, "q", desc, hnswEf = 4096)
    assert(page(quant, q, "dot") === page(full, q, "dot"))
    assert(quant.hnswQuantServes.get() === 1L)
    assert(quant.hnswSegmentsLoaded.get() === 0L)
  }

  test("maintenance keeps the codes tier in lockstep: insert absorbs, delete tombstones, update consolidates") {
    val dir = mkDir(120)
    val q = vec(8888).map(_.toDouble)
    val st = new ParquetCollectionStore(dir, "q", desc, hnswEf = 4096,
      hnswCandidateK = 50)
    // INSERT a point engineered to win: the absorbed codes row must
    // carry it into the walk (no overlay tail, no brute leg)
    val m1 = st.appended("q", IndexedSeq(
      Point("winner", Some("""{"g":1}"""),
        dense = Map("vector" -> q.map(_.toFloat)))))
    val got1 = page(m1, q)
    assert(got1.head._1 === "winner")
    assert(m1.hnswTailRescored.get() === 0L) // empty overlay tail
    assert(m1.hnswQuantServes.get() === 1L)
    val brute1 = new ParquetCollectionStore(dir, "q", desc)
    assert(got1 === page(brute1, q))
    // DELETE it: the tombstone bars it from the code walk's beam
    val m2 = m1.removed("q", Set("winner"))
    val got2 = page(m2, q)
    assert(!got2.exists(_._1 == "winner"))
    assert(got2 === page(new ParquetCollectionStore(dir, "q", desc), q))
    // UPDATE an existing id: its segment (points, edges, codes)
    // consolidates; the fresh vector ranks where brute puts it
    val m3 = m2.appended("q", IndexedSeq(
      Point("0005", Some("""{"g":2}"""),
        dense = Map("vector" -> q.map(x => (x * 0.9).toFloat)))))
    val got3 = page(m3, q)
    assert(got3.head._1 === "0005")
    assert(got3 === page(new ParquetCollectionStore(dir, "q", desc), q))
    // the optimizer reseals graph AND codes; the rebuilt tier serves
    ParquetCollectionStore.optimize(spark, dir)
    val opt = new ParquetCollectionStore(dir, "q", desc, hnswEf = 4096,
      hnswCandidateK = 50)
    assert(page(opt, q) === got3)
    assert(opt.hnswQuantServes.get() === 1L)
    assert(opt.filesOpened.get() === 0L)
    // rebuilt codes: no inc- files survive the reseal
    val incCodes = (0 until 2).map { seg =>
      Option(new java.io.File(s"$dir/_hnsw/codes/seg=$seg").listFiles())
        .getOrElse(Array.empty).count(_.getName.startsWith("inc-"))
    }.sum
    assert(incCodes === 0)
  }
}
