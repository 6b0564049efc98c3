package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.collections.Collections
import graft.functions._
import graft.ops.Search

class SearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def homD = Collections.homogeneous(spark, TestSpark.sfDir)
    .withColumn("vector", col("vector").cast("array<double>"))

  test("topK matches brute-force driver-side ranking") {
    val q = homD.filter(col("id") === "0").head().getSeq[Double](2)
    val got = Search.topK(homD.filter(col("id") =!= "0"), col("vector"),
      vec(q), k = 5).select("id").as[String].collect().toSeq
    // brute force on the driver
    val all = homD.filter(col("id") =!= "0")
      .select("id", "vector").collect()
      .map { r =>
        val v = r.getSeq[Double](1)
        val dot = v.zip(q).map { case (a, b) => a * b }.sum
        val sim = dot / (math.sqrt(v.map(x => x * x).sum) * math.sqrt(q.map(x => x * x).sum))
        (r.getString(0), BigDecimal(sim).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val expected = all.sortBy { case (id, s) => (-s, id) }.take(5).map(_._1).toSeq
    assert(got === expected)
  }

  test("topKById excludes the query point and scores against its vector") {
    val r = Search.topKById(homD.select("id", "vector"), "vector", "0", 10)
    val ids = r.select("id").as[String].collect()
    assert(!ids.contains("0"))
    assert(ids.length === 10)
  }

  test("recommend centroid math: avg(pos) - avg(neg)") {
    val df = Seq(
      ("0", Seq(1.0, 0.0)), ("1", Seq(0.0, 1.0)),   // pos
      ("2", Seq(1.0, 1.0)),                          // neg
      ("3", Seq(0.25, -0.25)), ("4", Seq(-1.0, 1.0))) // corpus
      .toDF("id", "vector")
    val out = Search.recommend(df, "vector", Seq("0", "1"), Seq("2"), k = 2,
      metric = "dot").select("id", "score")
    val m = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // centroid = avg(pos) - avg(neg) = (0.5,0.5) - (1,1) = (-0.5,-0.5)
    assert(math.abs(m("3") - (0.25 * -0.5 + -0.25 * -0.5)) < 1e-9)
    assert(math.abs(m("4") - (-1.0 * -0.5 + 1.0 * -0.5)) < 1e-9)
    assert(!m.contains("0") && !m.contains("2"))
  }

  test("recommend raises clearly when example ids match nothing (tests.sql:394-398)") {
    val df = Seq(("3", Seq(0.25, -0.25))).toDF("id", "vector")
    val ex = intercept[IllegalArgumentException] {
      Search.recommend(df, "vector", Seq("nope"), Seq.empty, k = 1)
    }
    assert(ex.getMessage.contains("no positive example points found"))
    val ex2 = intercept[IllegalArgumentException] {
      Search.recommendBestScore(df, "vector", Seq("3"), Seq("missing"), k = 1)
    }
    assert(ex2.getMessage.contains("not found"))
    // positives-only (NULL negatives in the corpus shape) works
    val ok = Search.recommend(
      Seq(("3", Seq(1.0, 0.0)), ("4", Seq(0.0, 1.0))).toDF("id", "vector"),
      "vector", Seq("3"), Seq.empty, k = 1, metric = "dot")
      .select("id", "score").collect()
    assert(ok.head.getString(0) === "4")
  }

  test("recommendVectors: literal examples, no lookup join, avg(pos) - avg(neg)") {
    val df = Seq(
      ("3", Seq(0.25, -0.25)), ("4", Seq(-1.0, 1.0))) // corpus only — no example ids
      .toDF("id", "vector")
    val out = Search.recommendVectors(df, "vector",
      posVecs = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)), negVecs = Seq(Seq(1.0, 1.0)),
      k = 2, metric = "dot")
    val m = out.select("id", "score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // composite = (0.5, 0.5) - (1, 1) = (-0.5, -0.5)
    assert(math.abs(m("3") - (0.25 * -0.5 + -0.25 * -0.5)) < 1e-9)
    assert(math.abs(m("4") - (-1.0 * -0.5 + 1.0 * -0.5)) < 1e-9)
    // and the plan has no join at all — the query is a literal
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"literal recommend must not join:\n$plan")
  }

  test("fuseRRF: reciprocal ranks summed, missing branch contributes 0") {
    val b1 = Seq(("a", 0.9), ("b", 0.8)).toDF("id", "score")
    val b2 = Seq(("b", 0.7), ("c", 0.6)).toDF("id", "score")
    val out = Search.fuseRRF(Seq(b1, b2), k = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("a") - 1.0 / 61) < 1e-6)
    assert(math.abs(out("b") - (1.0 / 62 + 1.0 / 61)) < 1e-6)
    assert(math.abs(out("c") - 1.0 / 62) < 1e-6)
  }

  test("batchTopK returns exactly k per query") {
    val corpus = homD.select("id", "vector")
    val queries = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .filter(col("vec_id").isin(0, 1))
      .select(col("vec_id").cast("string").as("query_id"),
        col("embedding").cast("array<double>").as("qvec"))
    val out = Search.batchTopK(corpus, col("vector"), queries, "query_id", "qvec", 3)
    val counts = out.groupBy("query_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("0" -> 3L, "1" -> 3L))
  }

  test("assignSplit: deterministic, layout-independent, weights roughly honored") {
    val df = spark.range(0, 2000).selectExpr("cast(id as string) as id")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val a = Search.assignSplit(df.repartition(7), "id", splits, 42L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val b = Search.assignSplit(df.repartition(3), "id", splits, 42L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(a === b) // partition layout cannot move a row between splits
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") - 1600) < 120)
    assert(math.abs(counts("val") - 200) < 80)
    assert(math.abs(counts("test") - 200) < 80)
    // no shuffle: a pure map-side projection
    val plan = Search.assignSplit(df, "id", splits, 42L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("assignSplitByGroup: no group straddles a split; id-keyed split would") {
    // groups of 3 consecutive ids — the shape of near-dup clusters
    val df = spark.range(0, 3000)
      .selectExpr("id", "id div 3 as component")
    val splits = Seq(("train", 0.8), ("val", 0.1), ("test", 0.1))
    val byGroup = Search.assignSplitByGroup(df, "component", splits, 42L)
    // leakage-safety: every group maps to exactly one split
    val perGroup = byGroup.groupBy("component")
      .agg(countDistinct("split").as("k"))
      .agg(max("k")).head().getLong(0)
    assert(perGroup === 1L)
    // the property is NOT vacuous: the id-keyed split DOES straddle groups
    val naive = Search.assignSplit(df, "id", splits, 42L)
    val naivePerGroup = naive.groupBy("component")
      .agg(countDistinct("split").as("k"))
      .agg(max("k")).head().getLong(0)
    assert(naivePerGroup > 1L)
  }

  test("randomSample is deterministic under a fixed seed") {
    val a = Search.randomSample(homD, 10, 42L).select("id").as[String].collect().toSeq
    val b = Search.randomSample(homD, 10, 42L).select("id").as[String].collect().toSeq
    assert(a === b)
    assert(a.length === 10)
  }

  test("saltedJoin equals the plain join") {
    val o = Tables.load(spark, TestSpark.sfDir, "orders")
    val c = Tables.load(spark, TestSpark.sfDir, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = o.join(c, Seq("o_custkey"))
      .groupBy("o_custkey").count()
    val salted = graft.ops.Skew.saltedJoin(o, c, "o_custkey", saltFactor = 8)
      .groupBy("o_custkey").count()
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(plain).count() === 0)
  }

  test("topK plan is TakeOrderedAndProject (no global sort)") {
    val q = Seq.fill(64)(0.1)
    val plan = Search.topK(homD, col("vector"), vec(q), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("mixSources: most-upweighted source keeps all, others scale, rest drop") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val targets = Seq("src0" -> 0.4, "src1" -> 0.1)
    val out = Search.mixSources(docs, "doc_id", "source", targets, seed = 7L)
    val bySrc = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val natural = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // only targeted sources survive
    assert(bySrc.keySet.subsetOf(targets.map(_._1).toSet))
    // uniform natural counts: src0 has 4x src1's weight, so src0 keeps
    // everything (rate 1.0) and src1 keeps ~1/4
    assert(bySrc("src0") == natural("src0"))
    val frac = bySrc.getOrElse("src1", 0L).toDouble / natural("src1")
    assert(frac > 0.1 && frac < 0.45, s"src1 kept $frac")
    // deterministic under the same seed
    val again = Search.mixSources(docs, "doc_id", "source", targets, seed = 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("fuseDBSF is layout-independent and favors the branch-agreed id") {
    import graft.ops.Search
    val b1 = Seq(("a", 0.9), ("b", 0.8), ("c", 0.1)).toDF("id", "score")
    val b2 = Seq(("a", 0.7), ("c", 0.6), ("d", 0.2)).toDF("id", "score")
    val fused = Search.fuseDBSF(Seq(b1, b2), k = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    // "a" tops both branches' distributions -> highest fused z
    assert(fused.head._1 == "a", fused)
    assert(fused.map(_._1).toSet == Set("a", "b", "c", "d"))
    // exact-integer moments: identical values under a different layout
    val fused2 = Search.fuseDBSF(
      Seq(b1.repartition(7), b2.repartition(3)), k = 4)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(fused2 == fused)
  }

  test("matryoshkaSearch reranks prefix candidates with full-precision scores") {
    import graft.ops.Search
    val q = homD.filter(col("id") === "0").head().getSeq[Double](2)
    val prefix = homD.select(col("id"), slice(col("vector"), 1, 16).as("v16"))
    val got = Search.matryoshkaSearch(
      prefix.filter(col("id") =!= "0"), homD.filter(col("id") =!= "0"),
      "id", "vector", "v16", q, prefixDim = 16, k = 10, candidateK = 100)
    val rows = got.collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
    // equals the independently-composed two-stage reference: prefix-dot
    // top-100 ids, exact-dot top-10 among them (no recall assumption —
    // on uniform vectors a 16-dim prefix is a weak proxy by design)
    val candIds = homD.filter(col("id") =!= "0")
      .select(col("id"),
        v_dot(slice(col("vector"), 1, 16), vec(q.take(16))).as("ps"))
      .orderBy(col("ps").desc, col("id").asc).limit(100)
      .select("id").as[String].collect().toSet
    val expect = graft.ops.Ann.bruteForce(
        homD.filter(col("id").isin(candIds.toSeq: _*)), "id", "vector",
        vec(q), 10, "dot")
      .select("id").as[String].collect().toSeq
    assert(rows.map(_.getString(0)).toSeq == expect)
  }

  test("mmrSelect demotes near-duplicates that plain top-k would keep") {
    import graft.ops.Search
    // b is an almost-copy of a; c is orthogonal-ish but still relevant
    val df = Seq(
      ("a", Seq(1.0, 0.0, 0.0)),
      ("b", Seq(0.999, 0.001, 0.0)),
      ("c", Seq(0.5, 0.85, 0.0))).toDF("id", "vector")
    val q = Seq(1.0, 0.05, 0.0)
    val plain = Search.topK(df, col("vector"), vec(q), 2).select("id")
      .as[String].collect().toSeq
    assert(plain.toSet == Set("a", "b")) // relevance alone keeps the duplicate
    val mmr = Search.mmrSelect(df, "id", "vector", q,
      k = 2, candidateK = 3, lambda = 0.5)
    val got = mmr.collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(got == Seq((1, plain.head), (2, "c")), got.mkString(","))
    // ranks are 1..k in selection order
    assert(mmr.columns.toSeq == Seq("rank", "id", "mmr"))
  }

  test("new operators reject malformed arguments eagerly") {
    import graft.ops.{Quant, Search, TimeSeries}
    val df = Seq(("a", Seq(1f))).toDF("id", "vector")
    intercept[IllegalArgumentException] {
      Quant.searchStoredBits(df, df, "id", "vector", "b", Seq(1.0), k = 20, candidateK = 10) }
    intercept[IllegalArgumentException] {
      Quant.cascadeSearch(df, df, df, "id", "vector", "b", "c", "s",
        Seq(1.0), k = 10, midK = 5, candidateK = 20) }
    intercept[IllegalArgumentException] {
      Search.matryoshkaSearch(df, df, "id", "vector", "p", Seq(1.0), 0, 10, 20) }
    intercept[IllegalArgumentException] { Search.fuseDBSF(Seq.empty, k = 5) }
    intercept[IllegalArgumentException] {
      Search.facet(df, col("id"), "k", topN = 0) }
    intercept[IllegalArgumentException] {
      TimeSeries.rollingSum(df, "id", "id", "id", "id", window = 0) }
    intercept[IllegalArgumentException] {
      graft.ops.Geo.pointInPolygon(col("id"), col("id"), Seq((0.0, 0.0))) }
  }

  test("facet counts the payload values, most frequent first") {
    val df = Seq("a", "a", "a", "b", "b", "c")
      .map(v => s"""{"k":"$v"}""").toDF("payload")
    val got = Search.facet(df, col("payload"), "k", topN = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 3L), ("b", 2L)))
    // rows whose payload lacks the key don't contribute a NULL facet
    val miss = Seq("""{"k":"a"}""", """{"other":1}""").toDF("payload")
    assert(Search.facet(miss, col("payload"), "k", 10).count() == 1)
  }

  test("distanceMatrix returns perPoint neighbours per sampled id, symmetric pairs scored equally") {
    val m = Search.distanceMatrix(homD, "id", "vector",
      sampleN = 10, perPoint = 3, seed = 42)
    val rows = m.collect()
    assert(rows.length == 30) // 10 sampled points x 3 neighbours
    val perA = rows.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(perA.values.forall(_ == 3) && perA.size == 10)
    // dot is symmetric: where both directions survived the top-3 cut the
    // scores must agree
    val byPair = rows.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    byPair.foreach { case ((a, b), s) =>
      byPair.get((b, a)).foreach(s2 => assert(s2 == s, s"($a,$b)")) }
    // the sampled-side join broadcasts (no shuffle of the corpus)
    val plan = m.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
  }

  test("scrollByField pages strictly after the (value, id) keyset in (value, id) order") {
    val df = Seq((3, "a"), (1, "b"), (1, "c"), (2, "a"), (1, "a"))
      .toDF("v", "id")
    val page = Search.scrollByField(df, col("v"), col("id"),
      lit(1), lit("b"), n = 3)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
    assert(page == Seq((1, "c"), (2, "a"), (3, "a")))
  }

  test("temperatureSample takes exact sqrt-proportional quotas, stable under repartition") {
    // sources of size 400, 100, 25: sqrt weights 20:10:5 -> quotas of
    // k=70 are 40, 20, 10 exactly (micro-integer sqrt is exact on squares)
    val rows = (1 to 400).map(i => (i.toLong, "big")) ++
      (1001 to 1100).map(i => (i.toLong, "mid")) ++
      (2001 to 2025).map(i => (i.toLong, "small"))
    val df = rows.toDF("id", "src")
    val got = Search.temperatureSample(df, "id", "src", k = 70, seed = 7L)
    val bySrc = got.groupBy("src").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc == Map("big" -> 40L, "mid" -> 20L, "small" -> 10L), bySrc)
    val a = got.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Search.temperatureSample(df.repartition(13), "id", "src",
      k = 70, seed = 7L).select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b, "selection must be layout-independent")
    // changing the seed changes the picks (permutation actually used)
    val c = Search.temperatureSample(df, "id", "src", k = 70, seed = 8L)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a != c)
  }

  test("sparseIdfSearch: ubiquitous terms are discounted, rare terms rank") {
    // term 1 appears in EVERY doc -> idf(nt=4,n=4) = ln(0.5/4.5 + 1) ~
    // 0.105; term 2 in two of four -> idf = ln 2 ~ 0.693. Doc d puts 5.0
    // on the ubiquitous term: PLAIN sparse dot would rank it first
    // (5.0 > a's 2.0), idf demotes it below a's rare-term hit
    // (5 * 0.105 = 0.53 < 0.105 + 0.693 = 0.80).
    val rows = Seq(
      ("a", Seq(1, 2), Seq(1.0, 1.0)),
      ("b", Seq(1, 2), Seq(1.0, 0.5)),
      ("c", Seq(1, 3), Seq(1.0, 1.0)),
      ("d", Seq(1), Seq(5.0)))
    val df = rows.toDF("id", "ki", "kv")
    val got = Search.sparseIdfSearch(df, "id", "ki", "kv",
      qIdx = Seq(1, 2), qVal = Seq(1.0, 1.0), k = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(got.map(_._1).toSeq === Seq("a", "d", "b", "c"), got.toSeq)
    // the exact quantized arithmetic (idf factors floor-quantized at 1e-6
    // before scaling — the oracle-mirrorable recipe)
    def q6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val idfCommon = q6(math.log((4 - 4 + 0.5) / (4 + 0.5) + 1))
    val idfRare = q6(math.log((4 - 2 + 0.5) / (2 + 0.5) + 1))
    val byId = got.toMap
    assert(math.abs(byId("a") - (idfCommon + idfRare)) < 2e-6, byId("a"))
    assert(math.abs(byId("d") - 5.0 * idfCommon) < 2e-6, byId("d"))
    assert(math.abs(byId("b") - (idfCommon + 0.5 * idfRare)) < 2e-6)
    assert(math.abs(byId("c") - idfCommon) < 2e-6)
  }

  test("clusterBalancedSample caps each cluster at k, deterministically") {
    import graft.ops.Search
    val df = (0 until 40).map(i => (i.toLong, i % 3)).toDF("id", "cluster")
    val a = Search.clusterBalancedSample(df.repartition(7), "id", "cluster",
      k = 4, seed = 9L).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val b = Search.clusterBalancedSample(df, "id", "cluster",
      k = 4, seed = 9L).collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(a === b)                                  // layout-stable
    assert(a.groupBy(_._2).forall(_._2.size == 4))   // exactly k per cluster
    val more = Search.clusterBalancedSample(df, "id", "cluster",
      k = 100, seed = 9L).count()
    assert(more === 40L)                             // k past size = whole cluster
  }

  test("quotaSample takes exactly min(n, stratum size) per stratum, deterministically") {
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("lang"))
    val sizes = d.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Search.quotaSample(d, "doc_id", "lang", n = 40, seed = 1L)
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == sizes.map { case (l, c) => l -> math.min(40L, c) })
    // pure function of (id, seed): a rerun picks the same rows
    val a = Search.quotaSample(d, "doc_id", "lang", 40, 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Search.quotaSample(d.orderBy(col("doc_id").desc), "doc_id", "lang", 40, 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }
}
