package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Dedup
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming windowed agg equals the batch form of the same transform") {
    // stage a directory containing only events.parquet (file-stream source)
    val dir = Files.createTempDirectory("graft-stream")
    Files.copy(
      Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = EventsStream.startToMemory(spark, dir.toString, "stream_out")
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("stream_out")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = EventsStream.windowedAggBatch(spark, TestSpark.sfDir)
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("legacy nanos-long ts files stream: declared schema follows the files' physical type") {
    // stage a LEGACY-generation directory: ts as raw nanos longs (the
    // shape TIMESTAMP(NANOS) files take under nanosAsLong), which the
    // TIMESTAMP_NTZ-hardcoded schema used to reject at source planning
    val dir = Files.createTempDirectory("graft-stream-legacy")
    val legacy = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
      .withColumn("ts",
        (unix_micros(col("ts").cast("timestamp")) * 1000L).cast("long"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    legacy.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    val q = EventsStream.startToMemory(spark, dir.toString, "stream_legacy")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_legacy")
      .orderBy("window_start", "event_type").collect().toSeq
    val batch = EventsStream.windowedAggBatch(spark, TestSpark.sfDir)
      .orderBy("window_start", "event_type").collect().toSeq
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming IVF maintenance: streamed points get the batch assignment") {
    import org.apache.spark.sql.types._
    // index built offline (batch); NEW points then stream in and are
    // tagged with their serving cluster by the same map-side argmin —
    // incremental maintenance, no rebuild, no extra shuffle
    val corpus = graft.collections.Collections.homogeneous(spark, TestSpark.sfDir)
      .withColumn("vector", col("vector").cast(ArrayType(DoubleType)))
      .select("id", "vector")
    val idx = graft.ops.Ann.buildIvf(corpus, "id", "vector", nlist = 4, maxIter = 0)
    val dir = Files.createTempDirectory("graft-ivf-maint")
    Files.copy(
      Paths.get(s"${TestSpark.sfDir}/embeddings.parquet"),
      dir.resolve("embeddings.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType)),
      StructField("label", LongType)))
    val streamed = spark.readStream.schema(embSchema).parquet(dir.toString)
      .select(col("vec_id").cast(StringType).as("id"),
        col("embedding").cast(ArrayType(DoubleType)).as("vector"))
    val q = graft.ops.Ann.assignToCentroids(streamed, "vector", idx.centroids)
      .select("id", "cluster")
      .writeStream.outputMode("append")
      .format("memory").queryName("maint_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val got = m(spark.table("maint_out"))
    val expected = m(idx.clustered.select(col("id"), col("cluster")))
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("streaming quality filtering: the Gopher verdicts match batch") {
    import org.apache.spark.sql.types._
    // the cleaning pipeline's quality gate is map-side, so the same
    // transform filters an unbounded ingest stream verdict-for-verdict
    val dir = Files.createTempDirectory("graft-gopher-stream")
    Files.copy(
      Paths.get(s"${TestSpark.sfDir}/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val streamed = spark.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id"), col("text"))
    val q = graft.ops.TextAnalysis.gopherFilter(streamed, "doc_id", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("gopher_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    def m(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val got = m(spark.table("gopher_out"))
    val expected = m(graft.ops.TextAnalysis.gopherFilter(docs, "doc_id", "text"))
    assert(got === expected)
    assert(got.nonEmpty && got.values.exists(identity))
  }

  test("streaming host cap: first k per host admitted across micro-batches") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    // two hosts, 20 docs each, arriving over two ordered files — the
    // crawl-budget decision must be made per arrival, with state carrying
    // the admitted count across micro-batches
    val src = Files.createTempDirectory("graft-hostcap-stream")
    def urlOf(i: Long) =
      s"https://${if (i % 2 == 0) "big.com" else "small.org"}/p/$i"
    val all = (0L until 40L).map(i => (i, urlOf(i)))
    all.filter(_._1 < 20).toDF("id", "url").repartition(1)
      .write.parquet(src.toString + "/f=1")
    all.filter(_._1 >= 20).toDF("id", "url").repartition(1)
      .write.parquet(src.toString + "/f=2")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("url", StringType)))
    val streamed = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(src.toString + "/f=*")
    val q = EventsStream.cappedHostAdmissions(streamed, "id", "url", k = 7)
      .toDF("host", "id")
      .writeStream.outputMode("append")
      .format("memory").queryName("hostcap_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("hostcap_out")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val byHost = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exactly k admitted per host, and they are the FIRST arrivals
    assert(byHost("big.com") === (0L until 14L by 2).toSet)
    assert(byHost("small.org") === (1L until 15L by 2).toSet)
    assert(got.length === 14)
  }

  test("streaming near-dup check: stream-static index probe matches batch pairs") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    // the banded MinHash index is a static ingest artifact; an unbounded
    // stream of new docs probes it with a stream-static join — the
    // first-write-wins dedup decision made AT INGEST
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
    val index = Dedup.minhashBandIndex(d, "doc_id", "text").localCheckpoint()
    val incoming = d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(col("text"), lit(" zzz")).as("text"))
    val src = Files.createTempDirectory("graft-neardup-stream")
    incoming.repartition(2).write.mode("overwrite").parquet(src.toString)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val streamed = spark.readStream.schema(schema).parquet(src.toString)
    val q = Dedup.nearDupsAgainstIndex(streamed, "doc_id", "text", index,
        threshold = 0.8)
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_stream_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("in_id", "hit_id", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = pairs(spark.table("neardup_stream_out"))
    val expected = pairs(Dedup.nearDupsAgainstIndex(incoming, "doc_id",
      "text", index, threshold = 0.8))
    assert(got === expected)
    // every planted variant finds its source doc in the index
    assert(expected.map(_._1).size === incoming.count())
  }

  test("streaming ingest decontamination: verdicts match the batch semi-join") {
    import org.apache.spark.sql.types._
    // the benchmark shingle set is bounded model state compiled into a
    // map-side arrays_overlap, so decontamination runs AT INGEST on the
    // unbounded stream — no join, no state
    val dir = Files.createTempDirectory("graft-decontam-stream")
    Files.copy(
      Paths.get(s"${TestSpark.sfDir}/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val d = Tables.load(spark, TestSpark.sfDir, "documents")
    val bench = d.filter(col("doc_id") % 97 === 0)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val streamed = spark.readStream.schema(schema).parquet(dir.toString)
      .filter(col("doc_id") % 97 =!= 0)
    val q = graft.ops.TextAnalysis.decontamVerdicts(streamed, "doc_id", "text",
        bench, "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("decontam_stream_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("decontam_stream_out")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // batch truth from the broadcast semi-join form
    val contaminated = graft.ops.TextAnalysis.contaminatedDocs(
        d.filter(col("doc_id") % 97 =!= 0), "doc_id", "text", bench, "text")
      .collect().map(_.getLong(0)).toSet
    val corpusIds = d.filter(col("doc_id") % 97 =!= 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.keySet === corpusIds)
    assert(got.filter(_._2).keySet === contaminated)
    assert(contaminated.nonEmpty && got.exists(!_._2))
  }

  test("streaming URL dedup: canonicalize is map-side, first fetch per key survives") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    // URL canonicalization is one codegen projection, so the web
    // pipeline's first dedup pass runs on the ingest stream itself:
    // canonical key + dropDuplicates keyed state = first-crawled-wins
    val src = Files.createTempDirectory("graft-url-stream")
    val raws = Seq(
      (1L, "https://WWW.Example.com/a?b=2&a=1"),
      (2L, "https://example.com:443/a/?a=1&b=2&utm_campaign=z"),
      (3L, "https://example.com/a?a=1&b=2#frag"),
      (4L, "https://example.com/b?a=1&b=2"),
      (5L, "https://other.example.com/b"))
    raws.toDF("id", "url").repartition(1)
      .write.mode("overwrite").parquet(src.toString)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("url", StringType)))
    val streamed = spark.readStream.schema(schema).parquet(src.toString)
      .withColumn("canon", graft.ops.Url.canonicalizeUrl(col("url")))
      .dropDuplicates("canon")
    val q = streamed.writeStream.outputMode("append")
      .format("memory").queryName("url_dedup_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val kept = spark.table("url_dedup_out")
      .select("canon").collect().map(_.getString(0)).toSet
    // one survivor per canonical key, same key set as the batch dedup
    val batch = graft.ops.Url.dedupByUrl(raws.toDF("id", "url"), "id", "url")
      .select("url").collect().map(_.getString(0)).toSet
    assert(kept === batch)
    assert(kept.size === 3)
  }

  test("streaming classification: streamed docs get the batch NB predictions") {
    import org.apache.spark.sql.types._
    // the model trains OFFLINE (batch); map-side serving is one codegen
    // projection, so the SAME classifier labels an unbounded ingest
    // stream prediction-for-prediction
    val dir = Files.createTempDirectory("graft-nb-stream")
    Files.copy(
      Paths.get(s"${TestSpark.sfDir}/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
    val model = graft.ops.Classify.train(docs, "text", "lang", buckets = 256)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val streamed = spark.readStream.schema(schema).parquet(dir.toString)
    val q = graft.ops.Classify.classifyMapSide(streamed, model, "doc_id", "text")
      .writeStream.outputMode("append")
      .format("memory").queryName("nb_stream_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    def m(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "pred", "score").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    val got = m(spark.table("nb_stream_out"))
    val expected = m(graft.ops.Classify.classify(docs, model, "doc_id", "text"))
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("streaming BPE encode: streamed docs get the batch subword counts") {
    import org.apache.spark.sql.types._
    // the merge table is trained OFFLINE (batch — the model a tokenizer
    // ships); encode is a literal fold with no shuffle, so the same
    // expression tokenizes an unbounded ingest stream count-for-count
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val (merges, _) = graft.ops.Bpe.trainMerges(docs, "text", numMerges = 4)
    val dir = Files.createTempDirectory("graft-bpe-stream")
    Files.copy(
      Paths.get(s"${TestSpark.sfDir}/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val streamed = spark.readStream.schema(schema).parquet(dir.toString)
      .select(col("doc_id"), col("text"))
    val q = graft.ops.Bpe.subwordCountTrained(streamed, "text", merges, "n")
      .select("doc_id", "n")
      .writeStream.outputMode("append")
      .format("memory").queryName("bpe_stream_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("bpe_stream_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = graft.ops.Bpe
      .subwordCountTrained(docs, "text", merges, "n")
      .select("doc_id", "n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("streaming PQ ingest: streamed points get the batch codes") {
    import org.apache.spark.sql.types._
    // codebooks trained offline (batch); NEW points then stream in and
    // are encoded by the same map-side per-subspace argmin — ingest-time
    // quantization runs unbounded, no rebuild, no shuffle
    val corpus = graft.collections.Collections.homogeneous(spark, TestSpark.sfDir)
      .withColumn("vector", col("vector").cast(ArrayType(DoubleType)))
      .select("id", "vector")
    val model = graft.ops.Pq.fit(corpus, "id", "vector", dim = 64, m = 4,
      ksub = 8, maxIter = 0, seed = 42L)
    val dir = Files.createTempDirectory("graft-pq-ingest")
    Files.copy(
      Paths.get(s"${TestSpark.sfDir}/embeddings.parquet"),
      dir.resolve("embeddings.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType)),
      StructField("label", LongType)))
    val streamed = spark.readStream.schema(embSchema).parquet(dir.toString)
      .select(col("vec_id").cast(StringType).as("id"),
        col("embedding").cast(ArrayType(DoubleType)).as("vector"))
    val q = graft.ops.Pq.encode(streamed, "vector", model)
      .select("id", "pcode")
      .writeStream.outputMode("append")
      .format("memory").queryName("pq_ingest_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getSeq[Int](1)).toMap
    val got = m(spark.table("pq_ingest_out"))
    val expected = m(graft.ops.Pq.encode(corpus, "vector", model)
      .select("id", "pcode"))
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("inverted index maintains incrementally: streamed segments == batch build") {
    import org.apache.spark.sql.types._
    // two disjoint doc cohorts arrive as separate micro-batches; each
    // batch writes its own postings SEGMENT (Lucene-style) plus mergeable
    // stats — query-time results over the union of segments must equal a
    // from-scratch batch build over the whole corpus
    val docs = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val shifted = docs.select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    val inDir = Files.createTempDirectory("graft-tidx-in")
    docs.coalesce(1).write.mode("append").parquet(inDir.toString)
    shifted.coalesce(1).write.mode("append").parquet(inDir.toString)
    val segBase = Files.createTempDirectory("graft-tidx-segs")
    val stats = scala.collection.concurrent.TrieMap.empty[Long, (Long, Long)]
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir.toString)
      .writeStream.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.ops.TextIndex.buildPostings(batch, "doc_id", "text", nBuckets = 32)
          .write.mode("overwrite").partitionBy("tb")
          .parquet(s"$segBase/seg$id")
        stats.put(id, graft.ops.TextIndex.segmentStats(batch, "doc_id", "text"))
        ()
      }.start()
    q.processAllAvailable()
    q.stop()
    assert(stats.size >= 2, s"expected >= 2 micro-batches, got ${stats.size}")
    // each segment is its own partitioned table root; the serving frame
    // is their union (pruning applies per branch)
    val segs = stats.keys.toSeq.sorted
      .map(id => spark.read.parquet(s"$segBase/seg$id"))
      .reduce(_ unionByName _)
    val (n, avglen) = graft.ops.TextIndex.mergedStats(stats.values.toSeq)
    val terms = Seq("window", "batch", "scan")
    val got = graft.ops.TextIndex.searchPostings(segs, n, avglen, terms,
      k = 15, nBuckets = 32)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val all = docs.union(shifted)
    val (bn, bavg) = graft.ops.TextIndex.corpusStats(all, "doc_id", "text")
    assert((bn, bavg) === ((n, avglen)))
    val want = graft.ops.TextIndex.searchPostings(
      graft.ops.TextIndex.buildPostings(all, "doc_id", "text", nBuckets = 32),
      bn, bavg, terms, k = 15, nBuckets = 32)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === want)
  }

  test("stream-stream interval join emits exactly the batch join's pairs") {
    val dir = Files.createTempDirectory("graft-stream-join")
    Files.copy(
      Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    // two INDEPENDENT file streams of the same source — the purchase and
    // click sides buffer and match under their own watermarks
    val q = EventsStream.attributedPairs(
        EventsStream.readEventsStream(spark, dir.toString),
        EventsStream.readEventsStream(spark, dir.toString))
      .writeStream.outputMode("append")
      .format("memory").queryName("join_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val raw = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val streamed = pairs(spark.table("join_out"))
    val batch = pairs(EventsStream.attributedPairs(raw, raw))
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("interval-join watermark delay covers the horizon (derived, not fixed)") {
    // the lateness bound must be >= the match window: a fixed 1-hour delay
    // under a 2-hour horizon silently drops late-but-in-horizon clicks
    assert(EventsStream.watermarkDelayFor("30 minutes") === "3600 seconds")
    assert(EventsStream.watermarkDelayFor("2 hours") === "9000 seconds")
    assert(EventsStream.watermarkDelayFor("3 days") === s"${3 * 86400 + 1800} seconds")
    intercept[IllegalArgumentException] {
      EventsStream.watermarkDelayFor("1 month")
    }
    // and the derived delay actually reaches BOTH EventTimeWatermark nodes —
    // inspected on a STREAMING frame (never started): the analyzer
    // eliminates watermark nodes from batch plans, so a batch frame shows
    // none regardless of what attributedPairs set
    val dir = Files.createTempDirectory("graft-wm-plan")
    Files.copy(
      Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val s = EventsStream.readEventsStream(spark, dir.toString)
    val delays = EventsStream.attributedPairs(s, s, horizon = "2 hours")
      .queryExecution.analyzed.collect {
        case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark =>
          e.delay.microseconds / 1000000L
      }
    assert(delays === Seq(9000L, 9000L), delays)
  }

  test("streaming dedup emits at most one event per (user_id, props) in horizon") {
    val dir = Files.createTempDirectory("graft-stream3")
    Files.copy(
      Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = EventsStream.dedupedEvents(
        EventsStream.readEventsStream(spark, dir.toString))
      .writeStream.outputMode("append").format("memory")
      .queryName("deduped_events")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("deduped_events")
    val batchDistinct = Tables.load(spark, TestSpark.sfDir, "events")
      .select("user_id", "props").distinct().count()
    assert(out.count() > 0)
    assert(out.count() <= batchDistinct)
    // no duplicate (user_id, props) pair in the output
    assert(out.groupBy("user_id", "props").count()
      .filter(col("count") > 1).count() === 0)
  }

  test("bounded dedup-within-horizon keeps the first of a burst, re-emits past the horizon") {
    import spark.implicits._
    val h = 7200L * 1000000 // 2h in micros
    val e = Seq(
      (1L, 0L, 10L, "a"),            // kept: first of burst
      (2L, 1000L, 10L, "a"),         // dropped: same key, inside horizon
      (3L, h / 2, 10L, "a"),         // dropped: still chained inside session
      (4L, h / 2 + h + 1000000L, 10L, "a"), // kept: gap > horizon since last
      (5L, 500L, 10L, "b"),          // kept: different props
      (6L, 800L, 11L, "a"))          // kept: different user
      .map { case (id, us, uid, p) => (id, us * 1000, uid, p) } // raw nanos
      .toDF("event_id", "ts", "user_id", "props")
    val out = EventsStream.dedupWithinHorizonBatch(e)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(out === Set(
      (10L, "a", 0L, 3L),
      (10L, "a", h / 2 + h + 1000000L, 1L),
      (10L, "b", 500L, 1L),
      (11L, "a", 800L, 1L)))
  }

  test("stateful running user stats converge to the batch aggregate") {
    val dir = Files.createTempDirectory("graft-stream2")
    Files.copy(
      Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val q = EventsStream.startRunningStats(spark, dir.toString, "user_stats")
    q.processAllAvailable()
    q.stop()

    // last emitted update per user == batch totals
    import org.apache.spark.sql.expressions.Window
    val last = spark.table("user_stats")
    val batch = Tables.load(spark, TestSpark.sfDir, "events")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
    val joined = last.as("s").join(batch.as("b"), "user_id")
      .filter(col("s.n") =!= col("b.n") ||
        abs(col("s.total") - col("b.total")) > 1e-6)
    assert(joined.count() === 0)
    assert(last.count() > 0)
  }

  test("streaming sessionization equals the batch form of the same transform") {
    val dir = Files.createTempDirectory("graft-stream4")
    Files.copy(
      Paths.get(s"${TestSpark.sfDir}/events.parquet"),
      dir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val q = graft.ops.TimeSeries.sessionAgg(
        EventsStream.normalize(EventsStream.readEventsStream(spark, dir.toString)),
        "user_id", "ts", "24 hours", watermark = Some("48 hours"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("sessions_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions_out")
      .orderBy("user_id", "session_start").collect().toSeq
    val batch = graft.ops.TimeSeries.sessionAgg(
        Tables.load(spark, TestSpark.sfDir, "events"), "user_id", "ts", "24 hours")
      .orderBy("user_id", "session_start").collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed === batch)
  }

  test("streaming label centroids converge to the batch DECIMAL means") {
    import org.apache.spark.sql.types._
    // the groupCentroids aggregate runs incrementally (DECIMAL partial
    // sums merge associatively in update state); after a full pass the
    // complete-mode table equals the batch frame EXACTLY — the
    // order-independence claim proven under micro-batched arrival
    // write the corpus as 4 files so maxFilesPerTrigger=1 forces FOUR
    // micro-batches — partial DECIMAL states really merge across batches
    val dir = Files.createTempDirectory("graft-centroid-stream")
    Tables.load(spark, TestSpark.sfDir, "embeddings")
      .select("vec_id", "embedding", "label")
      .repartition(4).write.mode("overwrite").parquet(dir.toString)
    val embSchema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val streamed = spark.readStream.schema(embSchema)
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)
      .select(col("label").cast(LongType).as("label"),
        col("embedding").cast(ArrayType(DoubleType)).as("v"))
    val q = graft.ops.Ann.groupCentroids(streamed, "label", "v")
      .writeStream.outputMode("complete")
      .format("memory").queryName("centroid_stream_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val got = m(spark.table("centroid_stream_out"))
    val expected = m(graft.ops.Ann.groupCentroids(
      Tables.load(spark, TestSpark.sfDir, "embeddings")
        .select(col("label").cast(LongType).as("label"),
          col("embedding").cast(ArrayType(DoubleType)).as("v")),
      "label", "v"))
    assert(got.nonEmpty)
    assert(got === expected)
  }

  test("streaming per-user gap profile equals the batch window computation") {
    // events written as FOUR ts-range files; maxFilesPerTrigger=1 replays
    // them as four time-ordered micro-batches (file source processes in
    // path order; repartitionByRange puts ascending ts ranges in ascending
    // part files) — the arrival contract runningUserGaps documents
    val dir = Files.createTempDirectory("graft-gap-stream")
    // write each quartile as its own append (staggered mtimes): the file
    // source orders by modification time, not part-file name
    // quantile-split on an epoch-micros shadow column so the written
    // part files keep the store's own ts type (eventsSchema must match)
    val raw = spark.read.parquet(s"${TestSpark.sfDir}/events.parquet")
      .withColumn("__t", unix_micros(col("ts").cast(
        org.apache.spark.sql.types.TimestampType)))
    val cuts = raw.stat.approxQuantile("__t", Array(0.25, 0.5, 0.75), 0.0)
    val bounds = (Long.MinValue +: cuts.map(_.toLong)) :+ Long.MaxValue
    bounds.sliding(2).foreach {
      case Array(lo, hi) =>
        raw.filter(col("__t") > lo && col("__t") <= hi).drop("__t")
          .coalesce(1).write.mode("append").parquet(dir.toString)
        Thread.sleep(1100)
      case _ =>
    }
    val streamed = graft.streaming.EventsStream.runningUserGaps(
      graft.streaming.EventsStream.normalize(
        spark.readStream.schema(graft.streaming.EventsStream.eventsSchema)
          .option("maxFilesPerTrigger", "1").parquet(dir.toString)))
    val q = streamed.toDF()
      .writeStream.outputMode("update")
      .format("memory").queryName("gap_stream_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    // final state per user = the update with the most gaps (monotone)
    val got = spark.table("gap_stream_out").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).maxBy(_._1) }
      .filter(_._2._1 > 0L)
    val expected = SparkEntry.queries("lead_lag")(spark, TestSpark.sfDir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got.nonEmpty)
    assert(got === expected)
  }
}
