package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-layout techniques for shuffle elimination at scale: bucketed
  * co-located joins and partition-pruned IVF cluster reads.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    val o = Tables.load(spark, TestSpark.sfDir, "orders")
    val c = Tables.load(spark, TestSpark.sfDir, "customer")
    o.write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    c.withColumnRenamed("c_custkey", "o_custkey")
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("customer_b")

    // disable broadcast so the join would otherwise shuffle both sides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val j = spark.table("orders_b").join(spark.table("customer_b"), "o_custkey")
      j.collect()
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      // bucket co-location: no shuffle exchange on either side
      assert(!p.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$p")
      assert(j.count() === Tables.load(spark, TestSpark.sfDir, "orders").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("IVF clustered corpus written partitioned prunes unprobed clusters") {
    import graft.functions._
    val corpus = graft.collections.Collections.homogeneous(spark, TestSpark.sfDir)
      .withColumn("vector", col("vector").cast("array<double>"))
      .select("id", "vector")
    val idx = graft.ops.Ann.buildIvf(corpus, "id", "vector", nlist = 4)
    val dir = Files.createTempDirectory("graft-ivf").toString
    idx.clustered.write.mode("overwrite").partitionBy("cluster").parquet(dir)

    val stored = spark.read.parquet(dir).filter(col("cluster").isin(0, 1))
    val p = stored.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [cluster"), p)
    // pruned read only touches the probed clusters' files
    val clusters = stored.select("cluster").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(clusters.subsetOf(Set(0, 1)))
  }

  test("searchIvfStored serving path partition-prunes to the probed clusters") {
    import graft.functions._
    val corpus = graft.collections.Collections.homogeneous(spark, TestSpark.sfDir)
      .withColumn("vector", col("vector").cast("array<double>"))
      .select("id", "vector")
    val idx = graft.ops.Ann.buildIvf(corpus, "id", "vector", nlist = 4)
    val dir = Files.createTempDirectory("graft-ivf-serve").toString
    idx.clustered.write.mode("overwrite").partitionBy("cluster").parquet(dir)
    val stored = spark.read.parquet(dir)

    val q = corpus.filter(col("id") === "0")
      .select(col("vector")).head().getSeq[Double](0)
    val res = graft.ops.Ann.searchIvfStored(stored, idx.centroids,
      "id", "vector", vec(q), k = 5, nprobe = 2)
    // the literal IN from probe selection must reach the scan as a static
    // partition filter — the serving read touches 2 of 4 clusters' files
    val p = res.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [cluster"), p)
    // and the pruned path returns the exact top-k of the probed clusters:
    // cross-check against the unpruned index search (same probe set)
    val expected = idx.search(vec(q), k = 5, nprobe = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val got = res.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === expected)
  }

  test("batched IVF serving: ONE pruned scan, per-query results match the single path") {
    import graft.functions._
    val corpus = graft.collections.Collections.homogeneous(spark, TestSpark.sfDir)
      .withColumn("vector", col("vector").cast("array<double>"))
      .select("id", "vector")
    val idx = graft.ops.Ann.buildIvf(corpus, "id", "vector", nlist = 4)
    val dir = Files.createTempDirectory("graft-ivf-batch").toString
    idx.clustered.write.mode("overwrite").partitionBy("cluster").parquet(dir)
    val stored = spark.read.parquet(dir)

    val queries = Seq("0", "9").zipWithIndex.map { case (id, qi) =>
      qi -> corpus.filter(col("id") === id)
        .select(col("vector")).head().getSeq[Double](0)
    }
    val res = graft.ops.Ann.searchIvfStoredBatch(stored, idx.centroids,
      "id", "vector", queries, k = 5, nprobe = 2)
    val rows = res.collect()
    // AQE's toString prints the Final AND Initial plans; count scans in
    // the final plan only
    val p = res.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // the union of probed clusters reaches the scan as ONE static
    // partition filter...
    assert(p.contains("PartitionFilters: [cluster"), p)
    // ...and there is exactly ONE scan of the clustered store — the whole
    // point of batching (N queries do not pay N corpus passes)
    assert("FileScan parquet".r.findAllMatchIn(p).length === 1, p)
    // per query, the batch answer IS the single-query pruned answer
    queries.foreach { case (qi, q) =>
      val single = graft.ops.Ann.searchIvfStored(stored, idx.centroids,
        "id", "vector", vec(q), k = 5, nprobe = 2)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
      val batch = rows.filter(_.getInt(0) == qi)
        .map(r => (r.getString(1), r.getDouble(2))).toSeq
      assert(batch === single, s"query $qi")
    }
  }

  test("per-band LSH index partition-prunes to the query's band keys") {
    import graft.functions._
    val corpus = graft.collections.Collections.homogeneous(spark, TestSpark.sfDir)
      .withColumn("vector", col("vector").cast("array<double>"))
      .select("id", "vector")
    val sigs = graft.ops.Ann.lshBuckets(corpus, "vector", 64, nbits = 16)
    val dir = Files.createTempDirectory("graft-lsh-band-spec").toString
    graft.ops.Ann.lshBandIndex(sigs.select("id", "bucket"), "id", nbits = 16)
      .write.mode("overwrite").partitionBy("band", "bandkey").parquet(dir)
    val bandIndex = spark.read.parquet(dir)

    val q = corpus.filter(col("id") === "7")
      .select(col("vector")).head().getSeq[Double](0)
    val res = graft.ops.Ann.searchLshStoredPartitioned(bandIndex, sigs,
      "id", "vector", q, k = 5)
    // the driver-computed band keys must reach the index read as static
    // partition filters — the query touches its 4 (band, bandkey)
    // partitions, never the full signature table
    val p = res.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*band""".r.findFirstIn(p).isDefined, p)
    // and the pruned layout serves the SAME result as the scan-filter
    // form over the same signatures
    val expected = graft.ops.Ann.searchLshStored(sigs, "id", "vector", q, k = 5)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val got = res.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === expected)
  }

  test("multiprobe LSH: Hamming-1 keys stay partition lookups, never worse per rank") {
    import graft.functions._
    val corpus = graft.collections.Collections.homogeneous(spark, TestSpark.sfDir)
      .withColumn("vector", col("vector").cast("array<double>"))
      .select("id", "vector")
    val sigs = graft.ops.Ann.lshBuckets(corpus, "vector", 64, nbits = 16)
    val dir = Files.createTempDirectory("graft-lsh-mp-spec").toString
    graft.ops.Ann.lshBandIndex(sigs.select("id", "bucket"), "id", nbits = 16)
      .write.mode("overwrite").partitionBy("band", "bandkey").parquet(dir)
    val bandIndex = spark.read.parquet(dir)

    val q = corpus.filter(col("id") === "11")
      .select(col("vector")).head().getSeq[Double](0)
    val multi = graft.ops.Ann.searchLshStoredMultiprobe(bandIndex, sigs,
      "id", "vector", q, k = 5)
    val p = multi.queryExecution.executedPlan.toString
    assert("""PartitionFilters: \[[^\]]*band""".r.findFirstIn(p).isDefined, p)
    // the multiprobe candidate set contains the single-probe set, so the
    // top-k score at every rank is >= the single-probe score at that rank
    val single = graft.ops.Ann.searchLshStoredPartitioned(bandIndex, sigs,
      "id", "vector", q, k = 5).collect().map(_.getDouble(1))
    val wide = multi.collect().map(_.getDouble(1))
    assert(wide.length >= single.length)
    single.zip(wide).foreach { case (s, w) => assert(w >= s, s"$w < $s") }
  }

  test("inverted index: query terms partition-prune to their hash buckets") {
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val dir = Files.createTempDirectory("graft-text-index-spec").toString
    graft.ops.TextIndex.buildPostings(docs, "doc_id", "text", nBuckets = 32)
      .write.mode("overwrite").partitionBy("tb").parquet(dir)
    val postings = spark.read.parquet(dir)
    val (n, avglen) = graft.ops.TextIndex.corpusStats(docs, "doc_id", "text")

    val terms = Seq("window", "batch", "scan")
    val res = graft.ops.TextIndex.searchPostings(postings, n, avglen,
      terms, k = 15, nBuckets = 32)
    // the literal tb IN (...) must reach the read as a partition filter —
    // the query touches its terms' bucket directories, not the whole index
    val p = res.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [tb"), p)
    // and the pruned serving path reproduces the full-scan scorer exactly
    val expected = graft.ops.TextAnalysis.bm25(docs, "doc_id", "text", terms)
      .filter(col("bm25") > 0.0)
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(15)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val got = res.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
  }

  test("tokenizer config: word split, length bounds, stopwords, prefix expansion") {
    import graft.ops.TextIndex
    import spark.implicits._
    val df = Seq((1L, "The quick-BROWN fox!! a to valley value tables")).toDF("id", "text")
    val cfg = TextIndex.TokenizerConfig(tokenizer = "word", lowercase = true,
      minTokenLen = 3, maxTokenLen = 5, stopwords = Seq("fox"))
    val toks = df.select(TextIndex.tokensWith(col("text"), cfg)).head().getSeq[String](0)
    // a/to drop by min, valley/tables by max, fox by stopword; case folds
    assert(toks === Seq("the", "quick", "brown", "value"))

    // prefix: expansion capped at maxTokenLen — a LONG token still serves
    // prefix queries up to depth 4 instead of being dropped
    val pcfg = TextIndex.TokenizerConfig(tokenizer = "prefix",
      minTokenLen = 2, maxTokenLen = 4)
    val ptoks = df.select(TextIndex.tokensWith(lit("Brown a"), pcfg)).head().getSeq[String](0)
    assert(ptoks === Seq("br", "bro", "brow"))

    // query-term normalization mirrors the per-token rules and fails
    // LOUDLY on terms the index can never contain
    assert(TextIndex.normalizeTerms(Seq("Quick"), cfg) === Seq("quick"))
    intercept[IllegalArgumentException](TextIndex.normalizeTerms(Seq("fox"), cfg))
    intercept[IllegalArgumentException](TextIndex.normalizeTerms(Seq("ab"), cfg))
    intercept[IllegalArgumentException](TextIndex.normalizeTerms(Seq("toolong"), pcfg))
  }

  test("prefix index: prefix query is an exact pruned term lookup matching the LIKE scan") {
    import graft.ops.TextIndex
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val dir = Files.createTempDirectory("graft-text-prefix-spec").toString
    val cfg = TextIndex.TokenizerConfig(tokenizer = "prefix", lowercase = true,
      minTokenLen = 3, maxTokenLen = 5)
    TextIndex.buildPostings(docs, "doc_id", "text", nBuckets = 32, cfg = cfg)
      .write.mode("overwrite").partitionBy("tb").parquet(dir)
    val postings = spark.read.parquet(dir)
    val term = "val"
    val res = postings
      .filter(col("tb") === TextIndex.termBucket(lit(term), 32) && col("term") === term)
      .select(col("doc_id"), col("tf"))
    val p = res.queryExecution.executedPlan.toString
    // the bucket expression constant-folds to a literal equality that
    // reaches the read as a partition filter
    assert("PartitionFilters: \\[[^\\]]*tb#".r.findFirstIn(p).isDefined, p)
    val got = res.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // oracle form: tf = tokens EXTENDING the prefix, from a raw LIKE scan
    val expected = docs
      .select(col("doc_id"),
        size(filter(TextIndex.tokens(col("text")), t => t.like("val%")))
          .cast("long").as("tf"))
      .filter(col("tf") > 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expected)
  }

  test("sparse inverted index: query dims partition-prune; scores equal the kernel scan") {
    import graft.functions._
    val e = Tables.load(spark, TestSpark.sfDir, "embeddings")
    val sparse = e.select(col("vec_id").cast("string").as("id"),
      filter(transform(col("embedding"), (x, i) => struct(i.as("i"), x.as("x"))),
        s => s("x") > lit(0f)).as("__s"))
      .select(col("id"),
        transform(col("__s"), s => s("i").cast("int")).as("ki"),
        transform(col("__s"), s => s("x").cast("double")).as("kv"))
    val dir = Files.createTempDirectory("graft-sparse-idx-spec").toString
    graft.ops.SparseIndex.buildPostings(sparse, "id", "ki", "kv", nBuckets = 16)
      .write.mode("overwrite").partitionBy("db").parquet(dir)
    val postings = spark.read.parquet(dir)

    val q = sparse.filter(col("id") === "3").select("ki", "kv").head()
    val (qi, qv) = (q.getSeq[Int](0), q.getSeq[Double](1))
    val res = graft.ops.SparseIndex.searchPostings(postings, qi, qv,
      k = 10, nBuckets = 16, excludeId = Some("3"))
    // the literal db IN (...) must reach the read as a partition filter
    val p = res.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [db"), p)
    // index serving is EXACT: equals the brute-force sorted-merge kernel
    val expected = sparse.filter(col("id") =!= "3")
      .withColumn("score", round(v_sparse_dot(col("ki"), col("kv"),
        typedLit(qi), typedLit(qv)), 6))
      .filter(col("score") > 0.0)
      .select("id", "score")
      .orderBy(col("score").desc, col("id").asc).limit(10)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val got = res.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === expected)
  }

  test("tenant layout: a tenant's search partition-prunes to that tenant's files") {
    import graft.functions._
    val corpus = graft.collections.Collections.homogeneous(spark, TestSpark.sfDir)
      .select(col("id"), col("vector"),
        concat(lit("t"), json_get_int(col("payload"), "label")).as("tenant"))
    val dir = Files.createTempDirectory("graft-tenant-spec").toString
    graft.ops.Tenant.writeLayout(corpus, "tenant", dir)
    val layout = graft.ops.Tenant.readLayout(spark, dir)

    // partition-value inference must keep the column a string
    assert(layout.schema("tenant").dataType.typeName == "string")

    val q = corpus.filter(col("id") === "0")
      .select(col("vector").cast("array<double>")).head().getSeq[Double](0)
    val res = graft.ops.Tenant.searchTenant(
      layout, "tenant", "t1", "id", "vector", vec(q), k = 5)
    val p = res.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [") && p.contains("tenant"), p)

    // the pruned result equals the unpartitioned filter + topK
    val expected = graft.ops.Search.topK(
        corpus.filter(col("tenant") === "t1"), col("vector"), vec(q), k = 5)
      .select("id", "score").collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val got = res.collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === expected)

    // per-tenant cost scales with the tenant, not the collection: the
    // scan's data size is the one tenant's slice
    val rows = res.queryExecution.executedPlan.collectLeaves()
      .map(_.metrics.get("numOutputRows").map(_.value).getOrElse(0L)).sum
    val tenantRows = corpus.filter(col("tenant") === "t1").count()
    assert(rows <= tenantRows, s"scan read $rows rows, tenant has $tenantRows")
  }
}
