package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.collections.Collections
import graft.functions._
import graft.ops.Ann

class AnnSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = Collections.homogeneous(spark, TestSpark.sfDir)
    .withColumn("vector", col("vector").cast("array<double>"))
    .select("id", "vector")

  private def queryVec: Seq[Double] =
    corpus.filter(col("id") === "0").head().getSeq[Double](1)

  test("IVF with all clusters probed equals brute force") {
    val idx = Ann.buildIvf(corpus, "id", "vector", nlist = 4)
    val exact = Ann.bruteForce(corpus, "id", "vector", vec(queryVec), k = 10)
      .select("id").as[String].collect().toSeq
    val ivfAll = idx.search(vec(queryVec), k = 10, nprobe = 4)
      .select("id").as[String].collect().toSeq
    assert(ivfAll === exact)
  }

  test("IVF with partial probes keeps reasonable recall") {
    val idx = Ann.buildIvf(corpus, "id", "vector", nlist = 8)
    val exact = Ann.bruteForce(corpus, "id", "vector", vec(queryVec), k = 10)
      .select("id").as[String].collect().toSet
    val approx = idx.search(vec(queryVec), k = 10, nprobe = 3)
      .select("id").as[String].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall $recall too low")
  }

  test("IVF search scans only probed clusters") {
    val idx = Ann.buildIvf(corpus, "id", "vector", nlist = 8)
    val probedRows = idx.clustered
      .join(idx.centroids
        .withColumn("cdist", v_euclid(col("centroid"), vec(queryVec)))
        .orderBy(col("cdist")).limit(2).select("cluster"), Seq("cluster"))
      .count()
    assert(probedRows < corpus.count())
  }

  test("lshBuckets is deterministic and distributes") {
    val a = Ann.lshBuckets(corpus, "vector", dim = 64, nbits = 8)
      .select("id", "bucket").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = Ann.lshBuckets(corpus, "vector", dim = 64, nbits = 8)
      .select("id", "bucket").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.values.toSet.size > 1)
  }

  test("searchLsh: candidates rerank to a high-recall top-k vs brute force") {
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val corpus = Collections.homogeneous(spark, TestSpark.sfDir)
      .filter(col("id") =!= "3")
    val lsh = Ann.searchLsh(corpus, "id", "vector", q, k = 10)
      .collect().map(_.getString(0)).toSet
    val brute = Ann.bruteForce(corpus, "id", "vector",
        graft.functions.vec(q), k = 50, metric = "cosine")
      .collect().map(_.getString(0)).toSet
    assert(lsh.size == 10)
    // banding with 4x4 bits keeps near neighbors: the LSH top-10 sits
    // inside the exact top-50
    assert((lsh -- brute).isEmpty, s"LSH returned far points: ${lsh -- brute}")
  }

  test("buildKnnGraph: adjacency bounded by m, sims exact, neighbors band-proposed") {
    import org.apache.spark.sql.functions._
    val corpus = Collections.homogeneous(spark, TestSpark.sfDir)
      .select(col("id"), col("vector"))
    val adj = Ann.buildKnnGraph(corpus, "id", "vector", dim = 64, m = 4)
    val perSrc = adj.groupBy("src").count().collect().map(_.getLong(1))
    assert(perSrc.nonEmpty && perSrc.forall(_ <= 4))
    // stored sims equal a fresh exact computation for a sample edge
    val e = adj.orderBy(col("src"), col("nbr")).head()
    val (src, nbr, sim) = (e.getString(0), e.getString(1), e.getDouble(2))
    val fresh = corpus.filter(col("id") === src).as("a")
      .crossJoin(corpus.filter(col("id") === nbr).as("b"))
      .select(round(graft.functions.v_cosine(col("a.vector"), col("b.vector")), 6))
      .head().getDouble(0)
    assert(sim == fresh)
  }

  test("searchKnnGraph: one-hop beam at least matches entries-only rerank") {
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val corpus = Collections.homogeneous(spark, TestSpark.sfDir)
      .select(col("id"), col("vector"))
    val sigs = Ann.lshBuckets(corpus, "vector", 64, nbits = 16)
      .filter(col("id") =!= "3")
    val adj = Ann.buildKnnGraph(corpus, "id", "vector", dim = 64, m = 8)
    val graphTop = Ann.searchKnnGraph(adj, sigs, "id", "vector", q,
      k = 5, entryK = 3).collect().map(r => r.getString(0) -> r.getDouble(1))
    val entriesOnly = Ann.searchLshStored(sigs, "id", "vector", q, k = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(graphTop.length == 5)
    // the beam contains the entry points' pool, so the graph top-3 scores
    // dominate (>=) the entries' scores pointwise
    graphTop.take(3).zip(entriesOnly).foreach { case ((_, g), (_, s)) =>
      assert(g >= s, s"graph beam lost score: $g < $s")
    }
    // and the expansion genuinely widened the candidate set beyond the
    // 3 entries (5 results need >= 5 candidates)
    assert(graphTop.map(_._1).toSet.size == 5)
  }

  test("beam-pruned deep serving: visited bounded, results are a valid top-k subset") {
    import org.apache.spark.sql.functions._
    val q = queryVec
    val base = corpus.filter(col("id") =!= "0")
    val sigs = Ann.lshBuckets(base, "vector", 64, nbits = 16)
    val adj = Ann.buildKnnGraph(base, "id", "vector", dim = 64, m = 8)
    val beamTop = Ann.searchKnnGraph(adj, sigs, "id", "vector", q,
      k = 10, entryK = 3, hops = 3, beam = 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    // visited <= entryK + beam*hops = 15, so at most 15 results exist and
    // each carries the exact rounded cosine (spot-check one)
    assert(beamTop.length <= 15 && beamTop.nonEmpty)
    val unpruned = Ann.searchKnnGraph(adj, sigs, "id", "vector", q,
      k = 10, entryK = 3, hops = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // the pruned walk only visits nodes the unpruned union also reaches,
    // with identical exact scores where both rank them
    beamTop.foreach { case (id, s) =>
      unpruned.get(id).foreach(u => assert(u === s, s"score drift at $id"))
    }
    // scores are sorted descending with id tiebreak (serving contract)
    assert(beamTop.map(_._2).toSeq === beamTop.map(_._2).sorted.reverse.toSeq)
  }

  test("entryLayer + exactKnnGraph: seeded sample, exact top-m adjacency, layered serve is a valid scored top-k") {
    val sample = Ann.entryLayer(corpus, "id", "vector", sampleN = 32)
    assert(sample.count() === 32L)
    // the sample is exactly the 32 smallest seeded hashes — deterministic
    val want = corpus.select(col("id"),
        md5(concat(col("id"), lit("#hnsw42"))).as("h"))
      .orderBy(col("h"), col("id")).limit(32)
      .select("id").as[String].collect().toSet
    assert(sample.select("id").as[String].collect().toSet === want)
    // exact adjacency: each node's rows are its TRUE top-m by cosine
    val uadj = Ann.exactKnnGraph(sample, "id", "v", m = 3)
    val bySrc = uadj.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .groupBy(_._1)
    assert(bySrc.values.forall(_.length <= 3))
    val sampleVecs = sample.collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    val (src, _, simLast) = bySrc.head._2.minBy(_._3)
    val worstKept = simLast
    val dropped = sampleVecs.keys.filterNot(k =>
      k == src || bySrc(src).exists(_._2 == k))
    assert(dropped.forall(d =>
      cos(sampleVecs(src), sampleVecs(d)) <= worstKept + 1e-9),
      "a dropped neighbor outranks a kept one")
    // the layered serve returns k rows, best-first, from the base graph
    val adj = Ann.buildKnnGraph(corpus, "id", "vector", dim = 64, m = 8)
    val sigs = Ann.lshBuckets(corpus, "vector", 64, nbits = 16)
    val got = Ann.searchKnnGraphLayered(adj, uadj, sample,
      sigs.filter(col("id") =!= "0"), "id", "vector", queryVec,
      k = 5, entryE = 2, hops = 2, beam = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.length === 5)
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
    assert(!got.map(_._1).contains("0"))
    // misuse guard: a layer past the cap refuses BEFORE the crossJoin —
    // quadratic adjacency is for model-sized sampled layers only; the
    // explicit maxRows raise is the priced escape hatch
    val e = intercept[IllegalArgumentException] {
      Ann.exactKnnGraph(corpus, "id", "vector", m = 3, maxRows = 16L)
    }
    assert(e.getMessage.contains("quadratic"), e.getMessage)
    assert(Ann.exactKnnGraph(sample, "id", "v", m = 3,
      maxRows = 64L).count() > 0L)
    // the documented opt-in path at its extreme must not overflow the
    // pre-count's limit() into a negative argument: maxRows past
    // Int.MaxValue skips the bounded count entirely
    assert(Ann.exactKnnGraph(sample, "id", "v", m = 3,
      maxRows = Long.MaxValue).count() > 0L)
  }

  test("insertion-order HNSW: deterministic seeded build, bounded adjacency, real hierarchy, exact serve at generous ef") {
    val m = 6
    val edges = Ann.buildHnsw(corpus, "id", "vector", m = m,
      efConstruction = 32, numSegments = 3)
    val rows = edges.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3)))
    // DETERMINISM: the whole build is seeded (segment hash, insertion
    // permutation, level draw) — a rebuild reproduces the graph exactly
    val rows2 = Ann.buildHnsw(corpus, "id", "vector", m = m,
      efConstruction = 32, numSegments = 3).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3)))
    assert(rows.sorted.toSeq === rows2.sorted.toSeq)
    // BOUNDED adjacency: per (node, level) at most mMax neighbors
    // (2m at level 0, m above), and a REAL hierarchy exists (the
    // geometric draw put some nodes above level 0)
    val perNode = rows.groupBy(r => (r._1, r._2, r._3)).values
    assert(perNode.forall(g =>
      g.length <= (if (g.head._2 == 0) 2 * m else m)),
      "adjacency exceeded mMax")
    assert(rows.exists(_._2 > 0), "no upper layers drawn")
    // level-L edges connect only nodes whose draw reaches L
    rows.filter(_._2 > 0).foreach { case (_, lvl, src, nbr) =>
      assert(graft.ops.HnswSegment.levelOf(src, m, 42L) >= lvl, s"$src@$lvl")
      assert(graft.ops.HnswSegment.levelOf(nbr, m, 42L) >= lvl, s"$nbr@$lvl")
    }
    // SERVE: at a generous efSearch each segment's beam recovers its
    // true top-k, so the merged page equals brute force exactly
    val got = Ann.searchHnsw(corpus, edges, "id", "vector", queryVec,
      k = 10, efSearch = 64, numSegments = 3)
      .select("id").as[String].collect().toSeq
    val exact = Ann.bruteForce(corpus, "id", "vector", vec(queryVec), k = 10)
      .select("id").as[String].collect().toSeq
    assert(got === exact)
    // guards
    intercept[IllegalArgumentException] {
      Ann.buildHnsw(corpus, "id", "vector", m = 1)
    }
    intercept[IllegalArgumentException] {
      Ann.searchHnsw(corpus, edges, "id", "vector", queryVec, k = 10,
        efSearch = 5)
    }
  }

  test("HNSW segment walk: accept predicate filters the beam, undirected traversal keeps pruned-in nodes reachable") {
    // one sequential segment, adversarial manifold: a thin circle chain
    // where the bidirectional mMax prune is known to orphan nodes from
    // a DIRECTED walk (the undirected-traversal regression fixture)
    val pts = (1 to 1200).map { i =>
      val a = i * 0.005
      (f"$i%04d", Array(math.cos(a), math.sin(a)))
    }
    val edges = graft.ops.HnswSegment
      .build(pts, 4, 16, 42L).toIndexedSeq
    val q = Array(1.0, 0.2)
    def brute(acc: String => Boolean): Seq[(String, Double)] =
      pts.filter(t => acc(t._1)).map { case (id, v) =>
        val s = (v(0) * q(0) + v(1) * q(1)) /
          (math.sqrt(v(0) * v(0) + v(1) * v(1)) * math.hypot(q(0), q(1)))
        (id, s)
      }.sortBy(t => (-t._2, t._1)).take(10)
    // UNFILTERED at exhaustive ef: every node must be reachable — the
    // directed-orphan bug returned a strict subset here
    val un = graft.ops.HnswSegment.search(pts, edges, q, 10, 2048, 42L)
    assert(un.map(_._1) === brute(_ => true).map(_._1))
    // FILTERED: only accepted ids in the page, equal to the filtered
    // brute force at exhaustive ef; rejected nodes still navigate
    val acc = pts.map(_._1).filter(_.toInt % 4 >= 1).toSet
    val fl = graft.ops.HnswSegment.search(pts, edges, q, 10, 2048, 42L,
      accept = acc)
    assert(fl.forall(t => acc(t._1)))
    assert(fl.map(_._1) === brute(acc).map(_._1))
    // a filter with NO acceptable reachable node returns empty, not junk
    assert(graft.ops.HnswSegment.search(pts, edges, q, 10, 64, 42L,
      accept = _ => false) === Nil)
  }

  test("drift statistic: undrifted batch ~1, shifted batch trips the re-fit dial") {
    val c = corpus
    val idx = Ann.buildIvf(c, "id", "vector", nlist = 4, maxIter = 3)
    val buildQ = Ann.assignmentDistanceQuantiles(c, "vector", idx.centroids)
    val same = Ann.driftStatistic(c, "vector", idx.centroids, buildQ)
    assert(same.maxRatio < 1.05 && !same.shouldRefit(),
      s"undrifted ratios not ~1: ${same.ratios}")
    val drifted = c.select(col("id"),
      transform(col("vector"), x => x + lit(1.5)).as("vector"))
    val rep = Ann.driftStatistic(drifted, "vector", idx.centroids, buildQ)
    assert(rep.shouldRefit(), s"shift +1.5/dim not detected: ${rep.ratios}")
    assert(rep.ratios.forall(_ > 1.0))
  }

  test("recallAtK: probing every cluster scores exactly 1.0; partial probes within (0,1]") {
    val idx = Ann.buildIvf(corpus, "id", "vector", nlist = 4)
    val queries = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .filter(col("vec_id") % 100 === 5)
      .select(col("vec_id"), col("embedding").cast("array<double>")).collect()
      .map(r => r.getAs[Number](0).intValue() -> r.getSeq[Double](1)).toSeq
    val full = Ann.recallAtK(idx.clustered, idx.centroids, corpus, "id", "vector",
        queries, k = 10, nprobe = 4)
      .collect().map(_.getDouble(1))
    assert(full.nonEmpty && full.forall(_ == 1.0), full.toSeq.toString)
    val partial = Ann.recallAtK(idx.clustered, idx.centroids, corpus, "id", "vector",
        queries, k = 10, nprobe = 1)
      .collect().map(_.getDouble(1))
    assert(partial.forall(r => r > 0.0 && r <= 1.0))
  }

  test("centroidDrift: identical snapshots score 1.0; a shifted class drops") {
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select(col("label"), col("embedding").cast("array<double>").as("v"))
    val same = Ann.centroidDrift(e, e, "label", "v")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(same.values.forall(_ == 1.0), s"self-drift != 1: $same")
    // shift ONLY label 3's vectors by +2 in every dim in snapshot B
    val shifted = e.withColumn("v",
      when(col("label") === 3, transform(col("v"), x => x + lit(2.0)))
        .otherwise(col("v")))
    val d = Ann.centroidDrift(e, shifted, "label", "v")
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(d(3) < 0.999, s"shifted class not flagged: ${d(3)}")
    assert(d.filterNot(_._1 == 3).values.forall(_ == 1.0),
      s"unshifted classes moved: $d")
  }
}
