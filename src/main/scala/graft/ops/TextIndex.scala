package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Inverted text index — the serving-path counterpart of
  * [[TextAnalysis.bm25]] (the heavy form behind the reference's
  * MATCH_TEXT full-text surface,
  * `/root/reference/tests/bin/tests.sql:209-214`).
  *
  * bm25() computes relevance by scanning every document per query; that is
  * the right plan exactly once. A retrieval workload builds the index ONCE
  * at ingest: postings (term, doc_id, tf, dl) with the document length
  * denormalized into the row (Lucene's norm-in-posting layout — scoring
  * never joins a doc-stats table), written `partitionBy(tb)` where tb is a
  * hash bucket of the term. A query's literal term buckets then
  * partition-prune the index read to |terms| bucket directories — at
  * 100 TB the difference between touching the whole index and the few
  * buckets the query terms hash into. Term buckets (not raw terms) keep
  * the partition count bounded by `nBuckets` regardless of vocabulary
  * size.
  *
  * Scoring over the pruned postings reproduces bm25() exactly: per-term
  * document frequencies aggregate from the pruned rows themselves (a
  * term's postings are unique per doc, so the pruned df IS the corpus df),
  * corpus-level N/avglen are two numbers captured at ingest, and the
  * per-term score sum uses the same left-to-right fold — absent terms
  * contribute an exact 0.0, so candidate scores equal full-scan scores
  * bit for bit.
  */
object TextIndex {

  /** The shared tokenizer: case-folded whitespace split, empties dropped —
    * the same convention as TextAnalysis (and the DuckDB oracles).
    */
  def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "\\s+"), t => length(t) > 0)

  /** Configurable tokenizer — the backend's full-text index parameters
    * (`TextIndexParams`: tokenizer type, `lowercase`, `min_token_len` /
    * `max_token_len`, stopwords; reference surface MATCH_TEXT,
    * `/root/reference/tests/bin/tests.sql:209-214`). The default is
    * exactly [[tokens]], so config-built indexes and the legacy path
    * share every downstream shape.
    *
    * Tokenizers: `whitespace` splits on runs of whitespace; `word`
    * splits on runs of non-alphanumerics (Unicode classes, so the same
    * RE2 pattern runs verbatim in the oracle); `prefix` is `word`
    * followed by expansion of each token into its prefixes of length
    * `minTokenLen..min(len, maxTokenLen)` — the index form that serves
    * prefix queries by EXACT term equality (still partition-prunable by
    * term bucket; a LIKE scan never happens at query time).
    */
  case class TokenizerConfig(
      tokenizer: String = "whitespace",
      lowercase: Boolean = true,
      minTokenLen: Int = 1,
      maxTokenLen: Int = Int.MaxValue,
      stopwords: Seq[String] = Nil) {
    require(Set("whitespace", "word", "prefix")(tokenizer),
      s"unknown tokenizer: $tokenizer")
    require(minTokenLen >= 1 && maxTokenLen >= minTokenLen,
      s"bad token length bounds [$minTokenLen, $maxTokenLen]")
  }

  /** The word-tokenizer split pattern — shared verbatim with the DuckDB
    * oracle (RE2 understands the same Unicode classes).
    */
  val WordSplit = "[^\\p{L}\\p{N}]+"

  /** Tokenize under `cfg`. All filtering is map-side column logic inside
    * whole-stage codegen — the config never changes the plan shape, only
    * the lambda bodies.
    */
  def tokensWith(textCol: Column, cfg: TokenizerConfig): Column = {
    val isPrefix = cfg.tokenizer == "prefix"
    val cased = if (cfg.lowercase) lower(textCol) else textCol
    val base = split(cased, if (cfg.tokenizer == "whitespace") "\\s+" else WordSplit)
    // the max bound DROPS over-long tokens for word/whitespace, but for
    // prefix it caps EXPANSION DEPTH (the backend convention — a long
    // token still serves prefix queries up to max_token_len chars)
    val bounded = filter(base, t =>
      length(t) >= cfg.minTokenLen &&
        (if (isPrefix) lit(true) else length(t) <= cfg.maxTokenLen))
    val kept =
      if (cfg.stopwords.isEmpty) bounded
      else filter(bounded, t => !t.isin(cfg.stopwords: _*))
    if (!isPrefix) kept
    else flatten(transform(kept, t =>
      transform(
        sequence(lit(cfg.minTokenLen),
          least(length(t), lit(cfg.maxTokenLen))),
        n => substring(t, lit(1), n))))
  }

  /** Normalize QUERY terms under the same config the index was built
    * with — the driver-side mirror of [[tokensWith]]'s per-token rules
    * (a query term is already one token; the split never applies). A
    * term the index could never contain (too short/long before prefix
    * expansion bounds, a stopword) is a caller error, loudly.
    */
  def normalizeTerms(terms: Seq[String], cfg: TokenizerConfig): Seq[String] = {
    val out = terms.map(t => if (cfg.lowercase) t.toLowerCase else t)
    out.foreach { t =>
      // under `prefix` the same bound holds for a different reason: the
      // index stores prefixes of length minTokenLen..maxTokenLen, so a
      // longer query term has no posting rows to match
      require(t.length >= cfg.minTokenLen && t.length <= cfg.maxTokenLen,
        s"query term '$t' outside the index's token length bounds " +
          s"[${cfg.minTokenLen}, ${cfg.maxTokenLen}]")
      require(!cfg.stopwords.contains(t),
        s"query term '$t' is a stopword of the index config — it has no postings")
    }
    out
  }

  /** Term bucket of a term column: the partition key of the index layout.
    * xxhash64 is layout-internal (never compared against an oracle — it
    * only decides FILE placement), so the fastest stable hash wins.
    */
  def termBucket(termCol: Column, nBuckets: Int): Column =
    pmod(xxhash64(termCol), lit(nBuckets.toLong)).cast(IntegerType)

  /** Build the postings table: one row per (term, doc) with tf and the
    * denormalized doc length. One tokenize pass, one explode, one
    * partial-agg'd groupBy — O(tokens) work, shuffled on (term, doc).
    */
  def buildPostings(df: DataFrame, idCol: String, textCol: String,
                    nBuckets: Int,
                    cfg: TokenizerConfig = TokenizerConfig()): DataFrame =
    df.select(col(idCol).as("doc_id"), tokensWith(col(textCol), cfg).as("__toks"))
      .withColumn("dl", size(col("__toks")).cast(LongType))
      .select(col("doc_id"), col("dl"), explode(col("__toks")).as("term"))
      .groupBy(col("term"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("tb", termBucket(col("term"), nBuckets))

  /** Corpus stats captured at ingest: (N docs, mean token count). Token
    * counts are integers, so the double mean is exact and
    * order-independent in any engine.
    */
  def corpusStats(df: DataFrame, idCol: String, textCol: String,
                  cfg: TokenizerConfig = TokenizerConfig()): (Long, Double) = {
    val r = df.select(size(tokensWith(col(textCol), cfg)).cast(LongType).as("dl"))
      .agg(count(lit(1)).as("n"), avg(col("dl")).as("avglen")).head()
    (r.getLong(0), r.getDouble(1))
  }

  /** Per-segment stats that MERGE — the incremental-maintenance form of
    * [[corpusStats]]: (doc count, total token count). Both are exact
    * integers, so segments written by independent ingest batches
    * (Lucene-style) recombine without error: merged avglen =
    * sum(tokens) / sum(docs), bit-equal to a from-scratch corpusStats.
    * Postings themselves are per-(term, doc) rows, so a doc's postings
    * live wholly in its arrival segment and the query-time df aggregate
    * over all segments IS the corpus df — nothing to reconcile.
    */
  def segmentStats(df: DataFrame, idCol: String, textCol: String): (Long, Long) = {
    val r = df.select(size(tokens(col(textCol))).cast(LongType).as("dl"))
      .agg(count(lit(1)).as("n"), sum(col("dl")).as("t")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Fold segment stats into the (N, avglen) the scorer takes. */
  def mergedStats(segs: Seq[(Long, Long)]): (Long, Double) = {
    val n = segs.map(_._1).sum
    require(n > 0, "no documents indexed")
    (n, segs.map(_._2).sum.toDouble / n)
  }

  /** Serve a term query from the stored index: literal (tb, term)
    * predicates prune the read to the query terms' buckets, per-doc tf
    * pivots out of the pruned postings, dfs aggregate from the same rows,
    * and the BM25 sum matches [[TextAnalysis.bm25]] term for term.
    */
  def searchPostings(postings: DataFrame, n: Long, avglen: Double,
                     terms: Seq[String], k: Int, nBuckets: Int,
                     k1: Double = 1.2, b: Double = 0.75,
                     roundTo: Int = 4): DataFrame = {
    require(terms.nonEmpty, "query needs at least one term")
    require(terms.distinct == terms,
      s"duplicate query terms would double-count their score contribution: $terms")
    val spark = postings.sparkSession
    // the query terms' buckets — same hash the ingest used; model-sized
    // driver work (one row over |terms| literals)
    val tbs = spark.range(1)
      .select(terms.map(t => termBucket(lit(t), nBuckets)): _*)
      .head().toSeq.map(_.asInstanceOf[Int]).distinct
    val pruned = postings
      .filter(col("tb").isin(tbs: _*) && col("term").isin(terms: _*))
    val dfRow = broadcast(pruned.agg(
      sum(when(col("term") === terms.head, 1L).otherwise(0L)).as("__df0"),
      terms.indices.tail.map(i =>
        sum(when(col("term") === terms(i), 1L).otherwise(0L)).as(s"__df$i")): _*))
    val perDoc = pruned.groupBy(col("doc_id"), col("dl"))
      .agg(max(when(col("term") === terms.head, col("tf"))).as("__tf0"),
        terms.indices.tail.map(i =>
          max(when(col("term") === terms(i), col("tf"))).as(s"__tf$i")): _*)
    val score = terms.indices.map { i =>
      val tf = coalesce(col(s"__tf$i"), lit(0L)).cast(DoubleType)
      val idf = log(lit(1.0) +
        (lit(n.toDouble) - col(s"__df$i") + lit(0.5)) / (col(s"__df$i") + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast(DoubleType) / lit(avglen)))
    }.reduce(_ + _)
    perDoc.crossJoin(dfRow)
      .select(col("doc_id"), round(score, roundTo).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Positional phrase match — the indexed counterpart of the
    * regexp-scan `match_phrase`: tokenize once (whitespace split, case
    * fold; empty tokens KEEP their position so adjacency means adjacency
    * in the raw split), keep only the phrase's terms (at scale these
    * come out of positional postings, so the join inputs are term-pruned
    * slivers of the corpus), and count adjacency chains with one
    * equi-join per consecutive term pair on (doc, position).
    */
  def phraseMatch(df: DataFrame, idCol: String, textCol: String,
                  phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseMatch needs at least one term")
    val toks = df.select(col(idCol),
      posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("pos", "tok")))
    val first = toks.filter(col("tok") === phrase.head)
      .select(col(idCol), col("pos"))
    val chained = phrase.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (term, i)) =>
        acc.join(
          toks.filter(col("tok") === term)
            .select(col(idCol), (col("pos") - i).as("pos")),
          Seq(idCol, "pos"))
    }
    chained.groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
  }
}
