package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.collections._
import graft.sources._

/** Incremental maintenance of the FIFTH and SIXTH sidecar families —
  * text postings (match_text/phrase candidates AND the BM25 ranked
  * serve, live corpus stats included) and geo cells — so every index
  * family a parquet store serves from stays index-served under churn
  * between optimizes.
  */
class TextGeoMaintainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ----------------------------------------------------------- text --

  private val tdesc = CollectionDescriptor("tr", Seq.empty)

  private def textDir(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tmx").toString
    val df = Seq(
      ("01", """{"body":"alpha beta gamma alpha"}"""),
      ("02", """{"body":"beta beta delta"}"""),
      ("03", """{"body":"alpha epsilon"}"""),
      ("04", """{"body":"zeta eta theta iota"}"""),
      ("05", """{"other":"alpha beta"}"""), // no body: dl 0, counts in N
      ("06", """{"body":"beta alpha beta"}""")
    ).toDF("id", "payload")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeTextSidecar(df, dir, key = "body",
      nBuckets = 8)
    dir
  }

  /** The trait's exact one-pass rank over the store's CURRENT points. */
  private def bruteRank(st: ParquetCollectionStore,
                        terms: Seq[String]): Seq[(String, Double)] = {
    val pts = st.queryPoints("tr", 0L, st.pointCount("tr"),
      withPayload = true, Nil, None).toIndexedSeq
    InMemoryCollectionStore.single("tr", tdesc, pts)
      .searchTextRanked("tr", "body", terms, 5)
  }

  test("text maintenance: inserts, a token-moving update, a delete, and a resurrection all absorb; BM25 stays bucket-served with LIVE stats") {
    val dir = textDir()
    val st = new ParquetCollectionStore(dir, "tr", tdesc)
    // INSERT: absorbed into the token buckets (counter), the ranked
    // serve stays sidecar-served (primaries closed) and EXACT — the
    // live stats (N 6 -> 7, sigma dl grows) must move with the corpus
    val m1 = st.appended("tr", IndexedSeq(
      Point("07", Some("""{"body":"alpha alpha alpha"}"""))))
    assert(st.tidxIncInserts.get() === 1L)
    val got1 = m1.searchTextRanked("tr", "body", Seq("alpha", "beta"), 5)
    assert(m1.filesOpened.get() === 0L) // never fell back to primaries
    assert(m1.textFilesOpened.get() > 0L)
    assert(got1 === bruteRank(m1, Seq("alpha", "beta")))
    assert(got1.map(_._1).contains("07"))
    // UPDATE id 02 from beta/delta tokens to alpha tokens: the old
    // tokens' buckets consolidate, the new rows land, ranks follow
    val m2 = m1.appended("tr", IndexedSeq(
      Point("02", Some("""{"body":"alpha alpha"}"""))))
    val got2 = m2.searchTextRanked("tr", "body", Seq("beta"), 5)
    assert(m2.filesOpened.get() === 0L)
    assert(got2 === bruteRank(m2, Seq("beta")))
    assert(!got2.map(_._1).contains("02")) // no beta tokens anymore
    // DELETE 06: tombstoned — never ranks, stats subtract (N and dl)
    val m3 = m2.removed("tr", Set("06"))
    val got3 = m3.searchTextRanked("tr", "body", Seq("beta"), 5)
    assert(m3.filesOpened.get() === 0L)
    assert(got3 === bruteRank(m3, Seq("beta")))
    assert(!got3.map(_._1).contains("06"))
    // match_text candidates + filtered COUNT stay index-served too
    val pf = PayloadFilter(
      Seq(PayloadCondition("body", "match_text", "alpha")), Nil, None)
    assert(m3.countMatchingFiltered("tr", pfilter = pf) ===
      m3.queryPoints("tr", 0L, m3.pointCount("tr"), withPayload = true,
        Nil, None).count(p => pf.matches(p)).toLong)
    // RESURRECTION: re-upsert the tombstoned id with new text — the
    // flag's buckets consolidate the dead copy out first
    val m4 = m3.appended("tr", IndexedSeq(
      Point("06", Some("""{"body":"beta beta beta beta"}"""))))
    val got4 = m4.searchTextRanked("tr", "body", Seq("beta"), 5)
    assert(m4.filesOpened.get() === 0L)
    assert(got4 === bruteRank(m4, Seq("beta")))
    assert(got4.head._1 === "06") // tf 4 tops the beta rank
    // the OPTIMIZER reseals: stats fold back into the meta, the
    // override clears, ranks unchanged
    ParquetCollectionStore.optimize(spark, dir)
    val opt = new ParquetCollectionStore(dir, "tr", tdesc)
    assert(opt.searchTextRanked("tr", "body", Seq("beta"), 5) === got4)
    assert(!new java.io.File(s"$dir/_tidx/stats.txt").isFile)
    assert(!new java.io.File(s"$dir/_tidx/inserted.txt").isFile)
  }

  // ------------------------------------------------------------ geo --

  private val gdesc = CollectionDescriptor("g",
    Seq(DenseField("vector", 2)), named = false)

  private def pt(id: String, lat: Double, lon: Double,
                 x: Float = 0.5f): Point =
    Point(id, Some(s"""{"loc":{"lat":$lat,"lon":$lon}}"""),
      dense = Map("vector" -> Array(x, 1f - x)))

  private def geoDir(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-gmx").toString
    val df = (0 until 40).map { i =>
      val lat = -30.0 + (i % 8) * 10.0
      val lon = -100.0 + (i / 8) * 40.0
      (f"$i%03d", s"""{"loc":{"lat":$lat,"lon":$lon}}""",
        Array(0.1f * (i % 10), 1f - 0.1f * (i % 10)))
    }.toDF("id", "payload", "vector")
    ParquetCollectionStore.write(df, dir, numFiles = 2, withLog = true)
    ParquetCollectionStore.writeGeoSidecar(df, dir, key = "loc", bits = 4)
    dir
  }

  // a NARROW box (lat -5..15, lon -70..-50): ~2 of 40 grid points match
  // — under the 20% selectivity dial, so the cell-pruned arm serves
  private val box = PayloadFilter(
    Seq(PayloadCondition("loc", "geo_box", "15,-70,-5,-50")), Nil, None)
  private val gspec = SearchSpec("vector", Array(0.6, 0.4), "cosine", 8)

  private def bruteGeo(dir: String) =
    new ParquetCollectionStore(dir, "g", gdesc)
      .searchPointsFiltered("g", gspec, withPayload = false, Nil, box)
      .map(p => (p._1.id, p._2))

  test("geo maintenance: inserts land in their cells, updates move cells, deletes tombstone; serve and count stay cell-pruned") {
    val dir = geoDir()
    val st = new ParquetCollectionStore(dir, "g", gdesc)
    // INSERT inside the box — absorbed into its cell
    val m1 = st.appended("g", IndexedSeq(pt("new1", 5.0, -55.0, 0.6f)))
    assert(st.gidxIncInserts.get() === 1L)
    val got1 = m1.searchPointsFiltered("g", gspec, withPayload = false,
      Nil, box).map(p => (p._1.id, p._2))
    assert(m1.filesOpened.get() === 0L) // covering cells, no primaries
    assert(got1 === bruteGeo(dir))
    assert(got1.map(_._1).contains("new1"))
    // UPDATE: move 011 (lat 0, lon -60 — inside the box) far outside
    // (cell changes) — the old cell consolidates, the search loses it
    val m2 = m1.appended("g", IndexedSeq(pt("011", 60.0, 160.0)))
    val got2 = m2.searchPointsFiltered("g", gspec, withPayload = false,
      Nil, box).map(p => (p._1.id, p._2))
    assert(got2 === bruteGeo(dir))
    assert(!got2.map(_._1).contains("011"))
    // DELETE 012 (lat 10, lon -60 — inside the box): tombstoned out of
    // serve AND count
    val m3 = m2.removed("g", Set("012"))
    val got3 = m3.searchPointsFiltered("g", gspec, withPayload = false,
      Nil, box).map(p => (p._1.id, p._2))
    assert(got3 === bruteGeo(dir))
    assert(!got3.map(_._1).contains("012"))
    assert(m3.countMatchingFiltered("g", pfilter = box) ===
      new ParquetCollectionStore(dir, "g", gdesc)
        .queryPoints("g", 0L, m3.pointCount("g"), withPayload = true,
          Nil, None).count(p => box.matches(p)).toLong)
    // RESURRECTION: the dead copy's cell consolidates before re-insert
    val m4 = m3.appended("g", IndexedSeq(pt("012", 6.0, -55.0, 0.61f)))
    val got4 = m4.searchPointsFiltered("g", gspec, withPayload = false,
      Nil, box).map(p => (p._1.id, p._2))
    assert(got4 === bruteGeo(dir))
    assert(got4.map(_._1).contains("012"))
    // optimize reseals the cell layout; serve unchanged
    ParquetCollectionStore.optimize(spark, dir)
    val opt = new ParquetCollectionStore(dir, "g", gdesc)
    assert(opt.searchPointsFiltered("g", gspec, withPayload = false,
      Nil, box).map(p => (p._1.id, p._2)) === got4)
  }
}
