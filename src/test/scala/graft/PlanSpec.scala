package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions for the headline queries — the local
  * stand-in for "would this survive a 1000-executor cluster": searches must
  * broadcast the query side and take-ordered rather than sort; aggregates
  * must partial-aggregate before the exchange; small-dim joins must
  * broadcast.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("cosine_topk: broadcast query vector + TakeOrderedAndProject, no sort") {
    val p = plan("cosine_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("SortExec"), p)
  }

  test("dsv2_topk_pushdown: the scan IS the scored query - no sort or score project above it") {
    val p = plan("dsv2_topk_pushdown")
    // the scan node carries the pushed query (metric, field, k)
    assert(p.contains("CollectionSearchScan"), p)
    assert(p.contains("search=cosine(vector, dim=64, k=12)"), p)
    // top-k executed store-side: nothing above the scan sorts or ranks
    assert(!p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortExec"), p)
    // no full-collection decode: the only vector column read is the
    // scored field inside the scan; the output projection is id + score
    assert(!p.contains("v_cosine"), p)
  }

  test("datetime_range_agg: ts range reaches the parquet scan as pushed filters") {
    val p = plan("datetime_range_agg")
    assert(p.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts") ||
      "PushedFilters: \\[[^\\]]*ts".r.findFirstIn(p).isDefined, p)
    assert(p.contains("HashAggregate"), p)
  }

  test("epoch_shuffle / interleave_sources: distributed range sort, no single-partition exchange") {
    Seq("epoch_shuffle", "interleave_sources").foreach { q =>
      val p = plan(q)
      assert(!p.contains("Exchange SinglePartition"), s"$q:\n$p")
      assert(p.contains("rangepartitioning") || p.contains("RangePartitioning"),
        s"$q:\n$p")
      assert(!p.contains("Window"), s"$q:\n$p")
    }
  }

  test("novelty_score: partial aggregation on both shuffles, no cartesian") {
    // at test scale the df table broadcasts (it is small there); at
    // corpus scale both sides hash-exchange on __h and ReuseExchange
    // dedups the identical shingle-pass subtrees — what must hold at
    // EVERY scale: partial aggs before each exchange, no cartesian
    val p = plan("novelty_score")
    assert(p.contains("partial_count"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("nb_classify: the model joins broadcast, nothing sort-merges") {
    val p = plan("nb_classify")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("dedup_url: canonical key aggregates partially before the exchange") {
    val p = plan("dedup_url")
    assert(p.contains("HashAggregate"), p)
    // map-side combine on the canonical key: a partial-mode aggregate
    // appears BELOW the shuffle
    val ex = p.indexOf("Exchange")
    val agg = p.indexOf("HashAggregate")
    assert(ex >= 0 && agg >= 0, p)
    assert(!p.contains("SortAggregate"), p)
  }

  test("dsv2_search_page: offset and threshold ride the pushed query, nothing re-filters above") {
    val p = plan("dsv2_search_page")
    assert(p.contains("CollectionSearchScan"), p)
    assert(p.contains("search=cosine(vector, dim=64, k=6), offset=4, threshold=0.25"), p)
    // pagination + cut are store-side: no sort, rank, or score filter above
    assert(!p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("SortExec"), p)
    assert(!p.contains("FilterExec"), p)
  }

  test("q1_agg: partial aggregation before the shuffle") {
    val p = plan("q1_agg")
    // two HashAggregates (partial + final) around one Exchange
    assert(count(p, "HashAggregate") >= 2, p)
    assert(p.contains("Exchange"), p)
  }

  test("join3_agg: dimension joins are broadcast, not shuffled") {
    val p = plan("join3_agg")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("batch_search: queries broadcast; single shuffle for per-query ranking") {
    val p = plan("batch_search")
    assert(p.contains("BroadcastExchange"), p)
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }

  test("scan_projection reads only the projected columns") {
    val p = plan("scan_projection")
    assert(p.contains("ReadSchema: struct<vec_id:bigint,label:int>"), p)
  }

  test("vector kernels run inside whole-stage codegen") {
    val df = SparkEntry.queries("cosine_topk")(spark, TestSpark.sfDir)
    df.collect() // materialize so AQE finalizes the plan (markers only then)
    val p = df.queryExecution.executedPlan.toString
    // the scoring project must sit under a WholeStageCodegen span
    assert(p.contains("*("), p) // codegen stage marker
    assert("\\*\\(\\d+\\)".r.findAllIn(p).size >= 1)
  }

  test("discover is fully map-side: broadcasts only, no shuffle exchange") {
    val p = plan("discover")
    assert(p.contains("BroadcastExchange"), p)
    assert(!p.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$p")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("quantized_search: candidate stage reads stored codes, full vectors only in rerank") {
    val p = plan("quantized_search")
    // the candidate pass scans the materialized codes frame (an RDD scan —
    // no file read), so exactly ONE parquet scan exists in the whole plan:
    // the rerank-side fetch of full-precision vectors by candidate id
    assert(count(p, "Scan parquet") == 1, s"expected 1 parquet scan:\n$p")
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      s"stored-codes scan missing:\n$p")
    // the candidate-id fetch joins broadcast — the corpus never shuffles
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("ann_pq: candidate stage reads stored codes only, ADC is pure lookups") {
    val p = plan("ann_pq")
    // candidate pass scans the materialized (id, pcode) frame — exactly
    // ONE parquet scan in the plan: the rerank-side vector fetch
    assert(count(p, "Scan parquet") == 1, s"expected 1 parquet scan:\n$p")
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      s"stored-codes scan missing:\n$p")
    // ADC scoring is table lookups — no vector kernel over the codes scan
    assert(!p.contains("v_dot_i8"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("dedup_exact shuffles fingerprints, not texts") {
    val p = plan("dedup_exact")
    // text column must not survive past the partial aggregate into the
    // exchange: the aggregate groups on the 64-bit fp with min(id)
    assert(p.contains("fingerprint64"), p)
    assert(count(p, "HashAggregate") >= 2, p)
  }

  test("ann_lsh: serves stored signatures - no per-row v_dot, zero shuffles") {
    val df = SparkEntry.queries("ann_lsh")(spark, TestSpark.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    // the query plan reads the ingest-materialized (id, vector, bucket)
    // frame — it must compute NO hyperplane dot over the corpus (that
    // happened once at ingest) and touch no parquet file at all
    assert(!p.contains("v_dot"), s"per-query signature recompute:\n$p")
    assert(p.contains("Scan ExistingRDD"), s"stored-signature scan missing:\n$p")
    assert(count(p, "Scan parquet") == 0, s"expected 0 parquet scans:\n$p")
  }

  test("scroll_keyset: the page predicate is pushed to the parquet scan") {
    val df = SparkEntry.queries("scroll_keyset")(spark, TestSpark.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // keyset scroll only beats offset scroll if `key > last` prunes at the
    // source — the scan must carry the GreaterThan, not re-filter rows
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,29)]"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("asof_join: one partitioned window over one exchange, no row explosion") {
    val df = SparkEntry.queries("asof_join")(spark, TestSpark.sfDir)
    df.collect()
    // the AQE plan string repeats under "== Initial Plan ==" — count the
    // final plan only
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(count(p, "Window") >= 1, p)
    // exactly one hash exchange (on the key) feeds the sort+window
    assert(count(p, "Exchange hashpartitioning") == 1, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("skew_join: salted path really shuffles (hint defeats dim broadcast)") {
    val df = SparkEntry.queries("skew_join")(spark, TestSpark.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"), p)
    assert(p.contains("__salt"), p)
  }

  test("group_search: vectors never shuffle - score map-side, rank per label") {
    val df = SparkEntry.queries("group_search")(spark, TestSpark.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"), p)
    // the only hash exchange carries (label, id, score) rows, not vectors
    val exch = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).mkString
    assert(!exch.contains("vector") && !exch.contains("embedding"), exch)
  }

  test("stratified_sample: a pure map-side filter - no shuffle at all") {
    val df = SparkEntry.queries("stratified_sample")(spark, TestSpark.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange"), p)
  }

  test("ann_ivf_probe: probed-cluster filter is a broadcast join, corpus never shuffles") {
    val df = SparkEntry.queries("ann_ivf_probe")(spark, TestSpark.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("ann_ivf_bucketed: joinless serving - pruned partition scan + take-ordered") {
    val df = SparkEntry.queries("ann_ivf_bucketed")(spark, TestSpark.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // probe selection resolved driver-side from the model-sized centroid
    // table: the served plan has NO join at all — a literal partition
    // filter on the stored layout plus top-k
    assert(p.contains("PartitionFilters: [cluster"), p)
    assert(!p.contains("Join"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("ann_ivf_quantized: BOTH stage reads partition-prune; rerank joins broadcast") {
    val df = SparkEntry.queries("ann_ivf_quantized")(spark, TestSpark.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // candidate scan (int8 codes) AND rerank scan (full vectors) each
    // carry the probed-cluster partition filter — the query touches
    // nprobe/nlist of the files in both layouts
    assert(count(p, "PartitionFilters: [cluster") == 2, p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(count(p, "TakeOrderedAndProject") == 2, p)
  }

  test("ann_ivfpq: codes AND rerank scans partition-prune to the probed clusters") {
    val df = SparkEntry.queries("ann_ivfpq")(spark, TestSpark.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // PQ-codes scan and full-precision rerank scan each carry the
    // probed-cluster partition filter — nprobe/nlist of the files in both
    // layouts, and the candidate files hold m-byte codes, not vectors
    assert(count(p, "PartitionFilters: [cluster") == 2, p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(count(p, "TakeOrderedAndProject") == 2, p)
  }

  test("dedup_embedding_lsh: corpus vectors never shuffle - candidates broadcast into verify") {
    val df = SparkEntry.queries("dedup_embedding_lsh")(spark, TestSpark.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // verification joins the (small) candidate pair set against the
    // corpus: AQE must broadcast the candidate side, never sort-merge
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // the only hash exchange is the banded-bucket groupBy, carrying
    // (id, band, bandkey) rows — embedding vectors stay map-side
    val exch = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).mkString
    assert(!exch.contains("a_v") && !exch.contains("b_v"), exch)
  }

  test("dedup_semantic: pairs meet on the cluster key; no cartesian anywhere") {
    val df = SparkEntry.queries("dedup_semantic")(spark, TestSpark.sfDir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the within-cluster pair join is keyed (hash) on cluster — the
    // SemDeDup contract: the all-pairs join never materializes
    assert(p.contains("cluster"), p)
    // keyed join only (broadcast-hash or shuffle-hash/sort-merge on the
    // key are all fine at scale); what must NEVER appear is an unkeyed
    // pair product
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("bq_search: candidate stage is take-ordered over packed bits; rerank joins broadcast") {
    val p = plan("bq_search")
    // two TakeOrdered stages (hamming page, exact rerank), no global sort
    assert(count(p, "TakeOrderedAndProject") >= 2, p)
    assert(!p.contains("SortExec"), p)
    // candidate ids flow into the full-precision fetch as a broadcast
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("cascade_rerank: three take-ordered tiers, id fetches broadcast, no shuffle of the corpus") {
    val p = plan("cascade_rerank")
    // hamming page -> int8 cut -> exact top-k
    assert(count(p, "TakeOrderedAndProject") >= 3, p)
    assert(count(p, "BroadcastHashJoin") >= 2, p)
    assert(!p.contains("SortMergeJoin") && !p.contains("SortExec"), p)
    // no hash exchange carries vector payloads — candidate id sets move,
    // vectors are fetched in place
    val exch = p.linesIterator.filter(_.contains("Exchange hashpartitioning")).mkString
    assert(!exch.contains("vector"), exch)
  }

  test("ann_ivfbq: bit scan AND rerank scan both partition-prune to the probed clusters") {
    val p = plan("ann_ivfbq")
    assert(count(p, "PartitionFilters: [cluster") == 2, p)
    assert(!p.contains("SortExec"), p)
  }

  test("facet_counts: partial aggregation before the exchange, top-N take-ordered") {
    val p = plan("facet_counts")
    assert(count(p, "HashAggregate") >= 2, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("matryoshka_search: prefix candidates take-ordered, full vectors only in rerank") {
    val p = plan("matryoshka_search")
    assert(count(p, "TakeOrderedAndProject") >= 2, p)
    assert(!p.contains("SortExec"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p)
  }

  test("map-side quality signals: no shuffle at all (entropy, flags, lines, NFC)") {
    for (q <- Seq("char_entropy", "flagged_terms", "line_rules",
        "line_dedup_doc", "nfc_normalize", "strip_accents",
        "decontam_verdicts")) {
      val p = plan(q)
      assert(!p.contains("Exchange"), s"$q shuffles:\n$p")
    }
  }

  test("url_host_cap: exactly one exchange - the host-keyed window") {
    val p = plan("url_host_cap")
    assert(count(p, "Exchange") == 1, p)
    assert(!p.contains("BroadcastExchange"), p)
  }

  test("neardup_ingest: probe side never sort-merges; token sets move once") {
    val p = plan("neardup_ingest")
    // the (band, bandkey) candidate join may hash or broadcast at this
    // size; what must NEVER appear is a cartesian of probe x index
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("embedding_hygiene: partial aggregation before the one exchange") {
    val p = plan("embedding_hygiene")
    assert(count(p, "HashAggregate") >= 2, p)
    assert(count(p, "Exchange") == 1, p)
  }
}
