import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch scaling probe (not part of the driver contract): replicate the
  * sf0.1 corpus Nx with shifted ids and time the dedup family, to measure
  * the scaling exponent of LSH-bounded vs blocked-quadratic verification.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    def corpus(n: Int): DataFrame =
      (0 until n).map(i => base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("text"), col("lang"), col("source"))).reduce(_ union _)
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.1f s ($n rows)")
    }
    for (n <- Seq(1, 2, 4)) {
      val c = corpus(n).persist(); c.count()
      time(s"minhash x$n") {
        graft.ops.Dedup.minhashDedup(c, "doc_id", "text", 0.8).count()
      }
      time(s"ngram x$n") {
        graft.ops.Dedup.ngramJaccardPairs(c, "doc_id", "text", Seq("lang", "source"), 0.8).count()
      }
      time(s"repetition x$n") {
        graft.ops.TextAnalysis.repetitionRatio(c, "doc_id", "text").count()
      }
      time(s"decontam x$n") {
        graft.ops.TextAnalysis.contaminatedDocs(
          c.filter(col("doc_id") % 97 =!= 0), "doc_id", "text",
          c.filter(col("doc_id") % 97 === 0), "text").count()
      }
      c.unpersist()
    }
    // 8x/16x flatness sweep (recorded in BASELINE.md): dedup_clusters'
    // ROUND COUNT must stay ~log(component diameter) as replication
    // densifies every component (replicas are exact copies, so components
    // grow wider, not deeper), and the LSH band filter must keep constant
    // selectivity (identical vectors replicate into the same buckets)
    for (n <- Seq(1, 2, 4, 8, 16)) {
      val c = corpus(n).persist(); c.count()
      time(s"dedup_clusters x$n") {
        val rows = graft.ops.Dedup.dedupClusters(c, "doc_id", "text",
          Seq("lang", "source"), 0.8).count()
        println(s"[probe] clusters x$n rounds=${graft.ops.Dedup.lastCcRounds}")
        rows
      }
      // the scale-true composition: LSH-bounded edges feeding the same
      // CC loop — pair volume must track the LSH bucket design (linear-ish
      // in the planted-dup density), not the blocking-key quadratic
      time(s"dedup_clusters_minhash x$n") {
        val rows = graft.ops.Dedup.dedupClustersMinhash(c, "doc_id", "text", 0.8).count()
        println(s"[probe] clusters_minhash x$n rounds=${graft.ops.Dedup.lastCcRounds}")
        rows
      }
      c.unpersist()
    }
    val hom = graft.collections.Collections.homogeneous(spark, "/root/testdata/sf0.1")
      .select(col("id"), col("vector"))
    val qv = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .filter(col("vec_id") === 3)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    def homN(n: Int): DataFrame =
      (0 until n).map(i =>
        hom.select(concat(col("id"), lit(s"_$i")).as("id"), col("vector")))
        .reduce(_ union _)
    for (n <- Seq(1, 2, 4, 8, 16)) {
      val h = homN(n).persist(); val total = h.count()
      time(s"lsh_candidates x$n") {
        val cand = graft.ops.Ann.lshBuckets(h, "vector", qv.length, 16)
          .filter(graft.ops.Ann.lshBandMatch(qv)).count()
        println(f"[probe] lsh x$n selectivity=${cand.toDouble / total}%.4f ($cand of $total)")
        cand
      }
      h.unpersist()
    }
    // embedding near-dup pair volume under LSH banding: replicas land in
    // the same buckets, so verified pair count should grow with planted
    // duplicate density (quadratic in replication WITHIN a bucket family),
    // while wall time tracks bucket volume, not corpus^2
    for (n <- Seq(1, 2, 4)) {
      val h = homN(n)
        .select(col("id"), col("vector").cast("array<double>").as("v"))
        .persist()
      h.count()
      time(s"embedding_lsh_pairs x$n") {
        graft.ops.Dedup.embeddingNearDupLsh(h, "id", "v", threshold = 0.999).count()
      }
      h.unpersist()
    }
    // events-based probe: watermark-dedup bounded form over replicated events
    val ev = spark.read.parquet("/root/testdata/sf0.1/events.parquet")
    def events(n: Int): DataFrame =
      (0 until n).map(i => ev.select(col("event_id"),
        col("ts"), (col("user_id") + lit(i * 10000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))).reduce(_ union _)
    for (n <- Seq(1, 2, 4)) {
      val e = events(n).persist(); e.count()
      time(s"stream_dedup x$n") {
        graft.streaming.EventsStream.dedupWithinHorizonBatch(e).count()
      }
      e.unpersist()
    }
    spark.stop()
  }
}
