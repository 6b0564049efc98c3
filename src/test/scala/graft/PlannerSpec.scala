package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.collections.Collections
import graft.functions._
import graft.ops.{Ann, Planner}

/** Cardinality-planned filtered search: dispatch decisions, partition
  * pruning of the payload postings, the broadcast/shuffle id-join flip,
  * and pre/post-filter path agreement at nprobe = nlist.
  */
class PlannerSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = Collections.homogeneous(spark, TestSpark.sfDir)
    .withColumn("vector", col("vector").cast("array<double>"))

  private lazy val setup: (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame, Planner.PayloadIndex) = {
    val idx = Ann.buildIvf(corpus, "id", "vector", nlist = 4)
    val dir = Files.createTempDirectory("graft-planner-ivf").toString
    idx.clustered.write.mode("overwrite").partitionBy("cluster").parquet(dir)
    val stored = spark.read.parquet(dir)
    val pidx = Planner.buildPayloadIndex(corpus, "id",
      json_get_int(col("payload"), "label"))
    (stored, idx.centroids, pidx)
  }

  private def queryVec: Seq[Double] =
    corpus.filter(col("id") === "0").head().getSeq[Double](2)

  test("payload index stats cover the corpus and estimate exactly") {
    val (_, _, pidx) = setup
    assert(pidx.total === corpus.count())
    val expected = corpus
      .groupBy(json_get_int(col("payload"), "label").as("v")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(pidx.stats.toMap === expected)
    assert(pidx.estimate(Seq(3L)) === expected(3L))
    // duplicate values in the filter list must not double-count
    assert(pidx.estimate(Seq(3L, 3L)) === expected(3L))
    assert(pidx.estimate(Seq(99L)) === 0L)
  }

  test("datetime (epoch-day) index: range scan partition-prunes and counts match the base table") {
    val events = Tables.load(spark, TestSpark.sfDir, "events")
    val didx = Planner.buildPayloadIndex(events, "event_id",
      datediff(col("ts").cast("date"), lit("1970-01-01").cast("date")))
    val pruned = didx.postings.filter(col("value").between(19732L, 19736L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*value".r.findFirstIn(plan).isDefined, plan)
    val fromIndex = pruned.groupBy("value").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromBase = events
      .filter(col("ts") >= to_timestamp(lit("2024-01-10 00:00:00")) &&
        col("ts") < to_timestamp(lit("2024-01-15 00:00:00")))
      .groupBy(datediff(col("ts").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"))
      .count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromIndex === fromBase)
    // estimateRange agrees with the served slice
    assert(didx.estimateRange(19732L, 19736L) === fromBase.values.sum)
  }

  test("dispatch flips on estimated cardinality vs full-scan threshold") {
    val (_, _, pidx) = setup
    // one label of ten (~10%) is under a 20% threshold -> pre-filter
    assert(Planner.choose(pidx, Seq(7L), 0.2).prefilter)
    // five labels (~50%) exceed it -> post-filter
    assert(!Planner.choose(pidx, Seq(0L, 1L, 2L, 3L, 4L), 0.2).prefilter)
    // the SAME filter flips with the dial
    assert(Planner.choose(pidx, Seq(0L, 1L, 2L, 3L, 4L), 0.6).prefilter)
    intercept[IllegalArgumentException] { Planner.choose(pidx, Seq(1L), 0.0) }
  }

  test("multi-index: cheaper index drives the intersection; arm flips with the min cardinality") {
    val (stored, cents, pidx) = setup
    // second index on a different key (id mod 7), covering like the first
    val midx = Planner.buildPayloadIndex(corpus, "id",
      pmod(col("id").cast("long"), lit(7L)), covering = Seq("vector"))
    // ~10% (label) vs ~14% (mod7): label drives; min est under the dial
    val c = Planner.chooseMulti(pidx, Seq(7L), midx, Seq(2L), 0.2)
    assert(c.prefilter && c.driveFirst)
    assert(c.estA === pidx.estimate(Seq(7L)))
    // swap argument order: the OTHER index drives now
    assert(!Planner.chooseMulti(midx, Seq(2L), pidx, Seq(7L), 0.2).driveFirst)
    // one unselective condition does not kill the arm — the MIN decides
    assert(Planner.chooseMulti(pidx, Seq(7L),
      midx, Seq(0L, 1L, 2L, 3L, 4L, 5L), 0.2).prefilter)
    // both unselective -> post-filter
    assert(!Planner.chooseMulti(pidx, (0L to 8L), midx,
      (0L to 5L), 0.2).prefilter)
    // the served result is EXACT over the conjunction
    val predA = json_get_int(col("payload"), "label") === 7L
    val predB = pmod(col("id").cast("long"), lit(7L)) === 2L
    val res = Planner.searchFilteredMulti(stored, cents,
      pidx, Seq(7L), predA, midx, Seq(2L), predB,
      "id", "vector", vec(queryVec), k = 10, nprobe = 4)
    val exact = Ann.bruteForce(
      corpus.filter(predA && predB), "id", "vector",
      vec(queryVec), k = 10, metric = "cosine")
    assert(res.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      exact.collect().map(r =>
        (r.getString(0), math.rint(r.getDouble(1) * 1e6) / 1e6)).toSeq)
    // both posting reads partition-prune; the residual set broadcasts
    val plan = res.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*value".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // post-filter arm agrees with brute at nprobe = nlist (exact there)
    val post = Planner.searchFilteredMulti(stored, cents,
      pidx, (0L to 8L), json_get_int(col("payload"), "label") <= 8L,
      midx, (0L to 5L), pmod(col("id").cast("long"), lit(7L)) <= 5L,
      "id", "vector", vec(queryVec), k = 10, nprobe = 4)
    val postExact = Ann.bruteForce(
      corpus.filter(json_get_int(col("payload"), "label") <= 8L &&
        pmod(col("id").cast("long"), lit(7L)) <= 5L),
      "id", "vector", vec(queryVec), k = 10, metric = "cosine")
    assert(post.collect().map(_.getString(0)).toSeq ===
      postExact.collect().map(_.getString(0)).toSeq)
  }

  test("pre-filter path: postings scan partition-prunes to the filter values") {
    val (stored, cents, pidx) = setup
    val pruned = pidx.postings.filter(col("value").isin(1L, 2L))
    val p = pruned.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [value"), p)
    assert(pruned.select("value").distinct().collect()
      .map(_.getLong(0)).toSet.subsetOf(Set(1L, 2L)))
    // and the planned search (selective filter) broadcasts the id set
    val res = Planner.searchFilteredPlanned(stored, cents, pidx,
      "id", "vector", Seq(7L),
      json_get_int(col("payload"), "label") === 7L,
      vec(queryVec), k = 10, nprobe = 4)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the broadcast is the PLANNER's decision (estimate <= broadcastLimit
    // -> explicit hint), not a size-statistics accident
    assert(res.queryExecution.analyzed.toString.contains("ResolvedHint"))
    // exact over the filtered set: equals brute force on the filtered corpus
    val exact = Ann.bruteForce(
      corpus.filter(json_get_int(col("payload"), "label") === 7L),
      "id", "vector", vec(queryVec), k = 10)
      .collect().map(_.getString(0)).toSeq
    assert(res.collect().map(_.getString(0)).toSeq === exact)
  }

  test("pre-filter id join drops the broadcast hint above broadcastLimit") {
    val (stored, cents, pidx) = setup
    val res = Planner.searchFilteredPlanned(stored, cents, pidx,
      "id", "vector", Seq(7L),
      json_get_int(col("payload"), "label") === 7L,
      vec(queryVec), k = 10, nprobe = 4, broadcastLimit = 1L)
    // above the limit the planner must NOT force a broadcast — the id
    // frame joins under whatever strategy size statistics/AQE pick (a
    // test-scale id set still broadcasts from observed size, so the
    // assertable planner artifact is the absent hint, not the join node)
    assert(!res.queryExecution.analyzed.toString.contains("ResolvedHint"))
    // same answer either way
    val hinted = Planner.searchFilteredPlanned(stored, cents, pidx,
      "id", "vector", Seq(7L),
      json_get_int(col("payload"), "label") === 7L,
      vec(queryVec), k = 10, nprobe = 4)
    assert(res.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      hinted.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq)
  }

  test("covering index: pre-filter serves from its own value partitions only") {
    val (stored, cents, pidx) = setup
    val cidx = Planner.buildPayloadIndex(corpus, "id",
      json_get_int(col("payload"), "label"), covering = Seq("vector"))
    val res = Planner.searchFilteredPlanned(stored, cents, cidx,
      "id", "vector", Seq(7L),
      json_get_int(col("payload"), "label") === 7L,
      vec(queryVec), k = 10, nprobe = 4)
    res.collect()
    val plan = res.queryExecution.executedPlan
    val ps = plan.toString
    // no join at all, and the scan statically prunes to the filter value
    assert(!ps.contains("Join"), ps)
    assert("PartitionFilters: \\[[^\\]]*value".r.findFirstIn(ps).isDefined, ps)
    // scan work is EXACTLY the filter's matching rows — the covering
    // index's contract (the id-only form instead scans the corpus for
    // its semi-join)
    val scanned = plan.collectLeaves()
      .map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
    val matching = corpus
      .filter(json_get_int(col("payload"), "label") === 7L).count()
    assert(scanned === matching, s"scanned $scanned vs matching $matching")
    // and the answer is the id-only path's exact result
    val viaJoin = Planner.searchFilteredPlanned(stored, cents, pidx,
      "id", "vector", Seq(7L),
      json_get_int(col("payload"), "label") === 7L,
      vec(queryVec), k = 10, nprobe = 4)
    assert(res.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      viaJoin.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq)
  }

  test("range condition: estimate exact, postings range-prune, result exact") {
    val (stored, cents, pidx) = setup
    val expected = corpus
      .filter(json_get_int(col("payload"), "label").between(3L, 5L)).count()
    assert(pidx.estimateRange(3L, 5L) === expected)
    assert(pidx.estimateRange(100L, 200L) === 0L)
    // range predicate on the partition column prunes statically
    val pruned = pidx.postings.filter(col("value") >= 3L && col("value") <= 5L)
    val p = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*value".r.findFirstIn(p).isDefined, p)
    // the planned range search (selective) returns the exact filtered top-k
    val res = Planner.searchFilteredRange(stored, cents, pidx,
      "id", "vector", lo = 7L, hi = 7L,
      json_get_int(col("payload"), "label") === 7L,
      vec(queryVec), k = 10, nprobe = 4)
    val exact = graft.ops.Ann.bruteForce(
      corpus.filter(json_get_int(col("payload"), "label") === 7L),
      "id", "vector", vec(queryVec), k = 10)
      .collect().map(_.getString(0)).toSeq
    assert(res.collect().map(_.getString(0)).toSeq === exact)
  }

  test("incremental append: touched value partitions gain files, untouched don't, results equal a rebuild") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-pidx-append").toString
    val valueOf = json_get_int(col("payload"), "label")
    val n = corpus.count()
    val cut = n / 2
    val base = corpus.filter(col("id").cast("long") < cut)
    val delta = corpus.filter(col("id").cast("long") >= cut &&
      valueOf.isin(7L, 8L))
    assert(delta.count() > 0, s"empty delta at corpus size $n")
    Planner.writePayloadIndex(base, "id", valueOf, Seq("vector"), dir)
    def files(v: Long): Int =
      Paths.get(dir, s"value=$v").toFile.listFiles()
        .count(_.getName.endsWith(".parquet"))
    val before3 = files(3L)
    val before7 = files(7L)
    Planner.writePayloadIndex(delta, "id", valueOf, Seq("vector"), dir,
      mode = "append")
    // append touched ONLY the delta's value directories
    assert(files(3L) === before3, "untouched partition gained files")
    assert(files(7L) > before7, "appended partition did not grow")
    // stats and search over the appended index == a from-scratch rebuild
    val appended = Planner.readPayloadIndex(spark, dir, Seq("vector"))
    val rebuilt = Planner.buildPayloadIndex(base.unionByName(delta), "id",
      valueOf, Seq("vector"))
    assert(appended.stats === rebuilt.stats)
    val (stored, cents, _) = setup
    def top(i: Planner.PayloadIndex) =
      Planner.searchFilteredPlanned(stored, cents, i, "id", "vector",
        Seq(7L), valueOf === 7L, vec(queryVec), k = 10, nprobe = 4)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(top(appended) === top(rebuilt))
  }

  test("compaction: per-partition file count returns to 1, stats and search results unchanged") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-pidx-compact").toString
    val valueOf = json_get_int(col("payload"), "label")
    val n = corpus.count()
    val cut = n / 2
    val base = corpus.filter(col("id").cast("long") < cut)
    val delta = corpus.filter(col("id").cast("long") >= cut)
    Planner.writePayloadIndex(base, "id", valueOf, Seq("vector"), dir)
    Planner.writePayloadIndex(delta, "id", valueOf, Seq("vector"), dir,
      mode = "append")
    def files(v: Long): Int =
      Paths.get(dir, s"value=$v").toFile.listFiles()
        .count(_.getName.endsWith(".parquet"))
    val vals = Planner.readPayloadIndex(spark, dir, Seq("vector"))
      .stats.map(_._1)
    assert(vals.exists(files(_) > 1), "append produced no multi-file partition")
    val before = Planner.readPayloadIndex(spark, dir, Seq("vector"))
    val (stored, cents, _) = setup
    def top(i: Planner.PayloadIndex) =
      Planner.searchFilteredPlanned(stored, cents, i, "id", "vector",
        Seq(7L), valueOf === 7L, vec(queryVec), k = 10, nprobe = 4)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val topBefore = top(before)
    Planner.compactPayloadIndex(spark, dir)
    // every value partition is back to one file, contents identical
    vals.foreach(v => assert(files(v) === 1, s"value=$v not compacted"))
    val after = Planner.readPayloadIndex(spark, dir, Seq("vector"))
    assert(after.stats === before.stats)
    assert(top(after) === topBefore)
    // a second pass is a no-op (nothing left above one file)
    Planner.compactPayloadIndex(spark, dir)
    assert(Planner.readPayloadIndex(spark, dir, Seq("vector")).stats === before.stats)
  }

  test("compaction restricted to named values touches only those partitions") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft-pidx-compact2").toString
    val valueOf = json_get_int(col("payload"), "label")
    val n = corpus.count()
    val cut = n / 2
    Planner.writePayloadIndex(corpus.filter(col("id").cast("long") < cut),
      "id", valueOf, Nil, dir)
    Planner.writePayloadIndex(corpus.filter(col("id").cast("long") >= cut),
      "id", valueOf, Nil, dir, mode = "append")
    def files(v: Long): Int =
      Paths.get(dir, s"value=$v").toFile.listFiles()
        .count(_.getName.endsWith(".parquet"))
    val before3 = files(3L)
    assume(before3 > 1 && files(7L) > 1)
    Planner.compactPayloadIndex(spark, dir, values = Seq(7L))
    assert(files(7L) === 1, "named partition not compacted")
    assert(files(3L) === before3, "unnamed partition was touched")
  }

  test("readPayloadIndex fails loudly on null-valued postings") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-pidx-null").toString
    // every third row's label nulled: those land in the hive default
    // partition and must be rejected at read, not folded into value 0
    val nullable = when(col("id").cast("long") % 3 === 0, lit(null))
      .otherwise(json_get_int(col("payload"), "label"))
    Planner.writePayloadIndex(corpus, "id", nullable, Nil, dir)
    val e = intercept[IllegalArgumentException] {
      Planner.readPayloadIndex(spark, dir)
    }
    assert(e.getMessage.contains("null-valued postings"))
  }

  test("keyword index: stats, dispatch, covering pre-filter pruned by string value") {
    val (stored, cents, _) = setup
    val kw = concat(lit("L"), json_get_str(col("payload"), "label"))
    val kidx = Planner.buildKeywordIndex(corpus, "id", kw,
      covering = Seq("vector"))
    // vocabulary stats: one row per distinct keyword, exact estimates
    val expected = corpus.groupBy(kw.as("v")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(kidx.stats.toMap === expected)
    assert(kidx.total === corpus.count())
    assert(kidx.estimate(Seq("L3", "L3")) === expected("L3"))
    assert(kidx.estimate(Seq("nope")) === 0L)
    assert(Planner.chooseKeyword(kidx, Seq("L7"), 0.2).prefilter)
    assert(!Planner.chooseKeyword(kidx,
      Seq("L0", "L1", "L2", "L3", "L4"), 0.2).prefilter)
    // covering pre-filter: result equals the brute-force filtered top-k,
    // and the postings scan partition-prunes on the STRING value
    val q = queryVec
    val res = Planner.searchFilteredKeyword(stored, cents, kidx, "id",
      "vector", Seq("L3"), kw === "L3", vec(q), k = 5, nprobe = 4)
    val p = res.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*value".r.findFirstIn(p).isDefined, p)
    val brute = corpus.filter(kw === "L3")
      .select(col("id"), round(v_cosine(col("vector"), vec(q)), 6).as("score"))
      .orderBy(col("score").desc, col("id").asc).limit(5)
    assert(res.collect().toSeq === brute.collect().toSeq)
  }

  test("keyword index round-trips escaped values and rejects empty/null ones") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft-kidx-esc").toString
    val df = Seq(("1", "a b/c"), ("2", "a b/c"), ("3", "x=y"))
      .toDF("id", "kw")
    Planner.writeKeywordIndex(df, "id", col("kw"), Nil, dir)
    val idx = Planner.readKeywordIndex(spark, dir)
    // hive partition escaping (space, slash, equals) decodes back exactly
    assert(idx.stats === Seq(("a b/c", 2L), ("x=y", 1L)))
    val dir2 = Files.createTempDirectory("graft-kidx-null").toString
    Planner.writeKeywordIndex(
      Seq(("1", "ok"), ("2", "")).toDF("id", "kw"), "id", col("kw"), Nil, dir2)
    val e = intercept[IllegalArgumentException] {
      Planner.readKeywordIndex(spark, dir2)
    }
    assert(e.getMessage.contains("null/empty"))
  }

  test("post-filter path equals pre-filter exactly when every cluster is probed") {
    val (stored, cents, pidx) = setup
    val values = Seq(0L, 1L, 2L, 3L, 4L)
    val pred = json_get_int(col("payload"), "label").isin(values: _*)
    val post = Planner.searchFilteredPlanned(stored, cents, pidx,
      "id", "vector", values, pred, vec(queryVec), k = 10, nprobe = 4,
      fullScanThreshold = 0.2)
    // dispatch went post-filter (asserted above); with nprobe = nlist the
    // pruned scan covers the corpus, so the answer is the exact filtered top-k
    val pre = Planner.searchFilteredPlanned(stored, cents, pidx,
      "id", "vector", values, pred, vec(queryVec), k = 10, nprobe = 4,
      fullScanThreshold = 0.6)
    assert(post.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      pre.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq)
    // and the post-filter scan partition-prunes when probing fewer clusters
    val probedOne = Planner.searchFilteredPlanned(stored, cents, pidx,
      "id", "vector", values, pred, vec(queryVec), k = 10, nprobe = 1,
      fullScanThreshold = 0.2)
    val p = probedOne.queryExecution.executedPlan.toString
    // single-probe pruning prints as [isnotnull(cluster#n), (cluster#n = c)]
    assert("PartitionFilters: \\[[^\\]]*cluster".r.findFirstIn(p).isDefined, p)
  }
}
