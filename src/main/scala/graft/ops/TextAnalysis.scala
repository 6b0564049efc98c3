package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language identification, fingerprinting. All pure
  * column expressions — map-side, codegen'd, no shuffle.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Lowercased whitespace tokens with empties removed — array_remove is
    * codegen'd, where the filter-HOF form (`filter(..., t => length(t) >
    * 0)`) interprets its lambda per element (HOFs are CodegenFallback).
    * Identical result: tokens are non-null, and length(t) > 0 <=> t != "".
    */
  private[ops] def cleanTokens(text: Column): Column =
    array_remove(tokens(text), "")

  /** Sliding token-window CHUNKING — the RAG/pretraining document
    * splitter: each document becomes ceil((n-window)/stride)+1 chunks of
    * `window` whitespace tokens starting every `stride` tokens (the
    * last chunk runs to the document end; a document shorter than one
    * window is one chunk; an empty document yields none). Output: one
    * row per chunk — (idCol, chunk_idx, chunk text re-joined with single
    * spaces, n_tokens). Pure map-side HOFs (split -> per-start slice ->
    * explode): no shuffle, the chunk explosion is the only row growth —
    * at 100 TB this runs at scan speed and the downstream embed/pack
    * stages key on (doc, chunk_idx). Case is PRESERVED (chunks feed
    * models; the case-folding convention belongs to matching, not
    * splitting).
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     window: Int, stride: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got $stride (window $window)")
    // one compiled pass per document (graft.functions.ChunkWindows): the
    // former transform(sequence)/slice/array_join chain interpreted its
    // lambda per CHUNK — same windows, same single-space rejoin, same
    // (chunk_idx, chunk, n_tokens) ints, same 0/1-chunk edge cases
    df.select(col(idCol),
        explode(chunk_windows(col(textCol), window, stride)).as("__c"))
      .select(col(idCol), col("__c.chunk_idx").as("chunk_idx"),
        col("__c.chunk").as("chunk"), col("__c.n_tokens").as("n_tokens"))
  }

  /** Whitespace token count (non-empty tokens). */
  def tokenCount(text: Column): Column = tokenCountOf(stats(text))

  /** BPE-ish subword count approximation: words plus punctuation clusters
    * counted separately (regexp token model). */
  def subwordCount(text: Column): Column =
    size(array_remove(split(lower(text), "[^a-z0-9]+"), "")) +
      size(array_remove(split(text, "[a-z0-9\\s]+"), ""))

  private val stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** Profile 0 = stopwords; 1..4 = language profiles (see [[langProfiles]]).
    * All per-document metrics derive from ONE [[graft.functions.TextStats]]
    * kernel pass via the `...Of(stats)` forms; the text-Column forms below
    * are conveniences that inline a stats call.
    */
  def stats(text: Column): Column = text_stats(text, allProfiles)

  def tokenCountOf(st: Column): Column = st.getField("n_tokens")

  def stopwordRatioOf(st: Column): Column = {
    val n = st.getField("n_tokens")
    when(n > 0, st.getField("occ").getItem(0).cast(DoubleType) / n.cast(DoubleType))
      .otherwise(lit(0.0))
  }

  def punctRatioOf(st: Column): Column = {
    val total = st.getField("n_chars")
    when(total > 0, st.getField("n_punct").cast(DoubleType) / total.cast(DoubleType))
      .otherwise(lit(0.0))
  }

  def qualityScoreOf(st: Column): Column = {
    val n = tokenCountOf(st).cast(DoubleType)
    val lengthScore = least(n / lit(50.0), lit(1.0))
    val stopScore = least(stopwordRatioOf(st) * lit(5.0), lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punctRatioOf(st) * lit(3.0), lit(0.0))
    round(lengthScore * (lit(0.5) + lit(0.5) * stopScore) * punctPenalty, 6)
  }

  def langIdOf(st: Column): Column = {
    val scores = langProfiles.zipWithIndex.map { case ((lang, _), i) =>
      lang -> st.getField("dist").getItem(i + 1)
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Fraction of tokens that are stopwords (signal of natural language). */
  def stopwordRatio(text: Column): Column = stopwordRatioOf(stats(text))

  /** Fraction of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column = punctRatioOf(stats(text))

  /** Composite quality score in [0,1]: length sweet-spot * (1 - punct
    * excess) * stopword presence. A heuristic quality prior in the spirit
    * of C4/Gopher text-quality rules.
    */
  def qualityScore(text: Column): Column = qualityScoreOf(stats(text))

  /** Language-ID profiles: characteristic high-frequency function words.
    * Deterministic argmax with fixed precedence (en > de > es > fr > unknown).
    */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "es" -> Seq("el", "la", "que", "de", "los", "es", "una", "para"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour"))

  private def allProfiles: Seq[Seq[String]] = stopwords +: langProfiles.map(_._2)

  /** N-gram/function-word language heuristic: score per language = count of
    * profile words present (distinct), predict the max (ties resolved by
    * profile order), 'und' (unknown) when no profile word occurs.
    */
  def langId(text: Column): Column = langIdOf(stats(text))

  /** Stable 64-bit document fingerprint (native rolling-hash expression). */
  def fingerprint(text: Column): Column = fingerprint64(text)

  /** BM25 relevance of every document against a fixed term list.
    *
    * Per-term tf comes from ONE TextStats pass (each query term is its own
    * single-word profile, so occ[i] = tf of term i); document frequencies
    * and average length are a one-row aggregate broadcast back over the
    * corpus — two map-side passes and one tiny shuffle, no explode of the
    * token stream. Standard BM25: idf = ln(1 + (N - df + .5)/(df + .5)),
    * tf-part = tf (k1+1) / (tf + k1 (1 - b + b len/avglen)).
    */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           roundTo: Int = 4): DataFrame = {
    val profiles = terms.map(Seq(_))
    val st = df.select(col(idCol), text_stats(col(textCol), profiles).as("__st"))
      .select(Seq(col(idCol), col("__st").getField("n_tokens").as("__len")) ++
        terms.indices.map(i => col("__st").getField("occ").getItem(i).as(s"__tf$i")): _*)
    val aggCols = Seq(count(lit(1)).as("__n"), avg(col("__len")).as("__avglen")) ++
      terms.indices.map(i =>
        sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)).as(s"__df$i"))
    val stats = st.agg(aggCols.head, aggCols.tail: _*)
    val scored = st.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i").cast(DoubleType)
      val idf = log(lit(1.0) +
        (col("__n").cast(DoubleType) - col(s"__df$i") + lit(0.5)) / (col(s"__df$i") + lit(0.5)))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__len").cast(DoubleType) / col("__avglen")))
    }.reduce(_ + _)
    scored.select(col(idCol), round(score, roundTo).as("bm25"))
  }

  /** Flagged-wordlist filter — the blocklist-vocabulary stage of the
    * public web pipelines (RefinedWeb/C4 drop or downweight pages whose
    * flagged-term density crosses a threshold; the list itself is policy,
    * supplied by the caller). The list rides the ONE TextStats kernel
    * pass as a profile (<= 64 words, matched case-folded), so the filter
    * is a free rider on the stats scan: occurrences, distinct flagged
    * terms, density, and the keep verdict per doc — map-side, no shuffle,
    * streams unbounded.
    */
  def flaggedTermFilter(df: DataFrame, idCol: String, textCol: String,
                        flagged: Seq[String],
                        maxRatio: Double = 0.05): DataFrame = {
    require(flagged.nonEmpty && flagged.length <= 64,
      s"flaggedTermFilter needs 1..64 words, got ${flagged.length}")
    val st = text_stats(col(textCol), Seq(flagged))
    df.select(col(idCol), st.as("__st"))
      .select(col(idCol),
        col("__st").getField("n_tokens").cast(LongType).as("n_tokens"),
        col("__st").getField("occ").getItem(0).cast(LongType).as("flagged_occ"),
        col("__st").getField("dist").getItem(0).cast(LongType).as("flagged_distinct"))
      .withColumn("flagged_ratio",
        when(col("n_tokens") > 0,
          round(col("flagged_occ").cast(DoubleType) /
            col("n_tokens").cast(DoubleType), 6)).otherwise(lit(0.0)))
      .withColumn("keep", col("flagged_ratio") <= maxRatio)
  }

  /** Curriculum-style stratification: bin every row by where its metric
    * falls among the corpus percentile boundaries `probs` (bin 0 = lowest
    * stratum, probs.length = top). ONE exact-percentile aggregate yields
    * the boundaries — model state (|probs| doubles), collected once and
    * inlined as literals — then bin assignment is a pure map-side CASE:
    * no global sort, no window, no second shuffle. At 100 TB the
    * boundary step swaps to percentile_approx with the binning path
    * unchanged. Boundaries are rounded (6 dp default) before comparison
    * so any engine re-deriving them lands on the same cut values — the
    * same convention the scoring gates use for rank boundaries. A NULL
    * metric is excluded from the boundary estimate (percentile skips
    * nulls) and falls through every `<=` into the TOP bin — filter nulls
    * first if that is not the intent.
    */
  def percentileBins(df: DataFrame, metricCol: String, probs: Seq[Double],
                     roundTo: Int = 6): DataFrame = {
    require(probs.nonEmpty && probs == probs.sorted && probs.forall(p => p > 0 && p < 1))
    val cuts = df
      .agg(expr(s"percentile($metricCol, array(${probs.mkString(", ")}))").as("c"))
      .head().getSeq[Double](0)
      .map(c => new java.math.BigDecimal(c)
        .setScale(roundTo, java.math.RoundingMode.HALF_UP).doubleValue)
    val bin = cuts.zipWithIndex.reverse
      .foldLeft(lit(cuts.length): Column) { case (acc, (c, i)) =>
        when(col(metricCol) <= lit(c), lit(i)).otherwise(acc)
      }
    df.withColumn("bin", bin.cast(IntegerType))
  }

  /** Per-document repetition signal (the Gopher-style duplicate-n-gram
    * rule): fraction of word `width`-shingles that are repeats of an
    * earlier shingle in the same document — 1 - distinct/total, 0 for
    * docs shorter than the shingle width. ONE native ShingleKernel pass
    * per doc, pure map-side (no shuffle at all): the filter
    * `rep_ratio > threshold` is how training pipelines drop
    * boilerplate/spam at scale.
    */
  /** Shingle array with NULL text as zero shingles (size(NULL) would be
    * -1 under the legacy sizeOfNull default and diverge from the oracle).
    * Shared by [[repetitionRatio]] and [[gopherFilter]] — the rounding
    * and guards must stay bit-identical between them.
    */
  private def shingles(textCol: Column, width: Int): Column =
    coalesce(word_shingle_hashes(textCol, width),
      array().cast(ArrayType(LongType)))

  /** 1 - distinct/total over a (possibly empty) shingle array, 6dp. */
  private def repRatioOf(sh: Column): Column =
    when(size(sh) > 0,
      round(lit(1.0) - size(array_distinct(sh)).cast(DoubleType) / size(sh), 6))
      .otherwise(lit(0.0))

  def repetitionRatio(df: DataFrame, idCol: String, textCol: String,
                      width: Int = 3): DataFrame =
    df.select(col(idCol), shingles(col(textCol), width).as("__sh"))
      .select(col(idCol),
        size(col("__sh")).as("n_shingles"),
        size(array_distinct(col("__sh"))).as("n_distinct"),
        repRatioOf(col("__sh")).as("rep_ratio"))

  /** Character-level Shannon entropy per document — the compressibility
    * proxy of the public quality-signal suites (Dolma/RedPajama ship a
    * compression-ratio signal for the same purpose: near-zero-entropy
    * text is padding/repetition, near-maximal is mojibake or binary
    * noise; natural language sits in a band). Pure column algebra, one
    * map-side pass: per distinct character (sorted, so the float SUM
    * order is engine-pinned) count occurrences and fold -Σ p ln p;
    * O(len · alphabet) comparisons per doc inside codegen, no shuffle.
    * Empty documents carry NULL (no distribution to measure).
    */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    // the native one-pass kernel (graft.functions.CharEntropyKernel):
    // sorted-code-point run fold, the identical IEEE op order as the
    // oracle's sorted run-length reduce. The pure-column formulation
    // (per-char substr array + array_sort + single-referencing aggregate
    // fold) is semantically equal but allocates a string per character —
    // measured 3.1 s -> 0.1 s at sf0.1 — and its nested-HOF variants
    // re-inline the sort per lambda element (O(n^3), a measured hang).
    // + 0.0 flushes IEEE negative zero (constant-symbol docs yield -0.0
    // from the negated sum on both engines; repr-sensitive compares care)
    df.select(col(idCol), length(col(textCol)).as("n"),
      when(length(col(textCol)) > 0,
        round(graft.functions.char_entropy(col(textCol)), 6) + lit(0.0))
        .as("entropy"))

  /** Document NOVELTY: per document, the fraction of its DISTINCT word
    * `width`-shingles that appear in NO other document — the inverse
    * signal of boilerplate (high = unique content, low = templated or
    * copied; the rare-n-gram lens on memorization risk). Cost shape:
    * one ShingleKernel pass, explode of per-doc distinct hashes, one
    * partial-aggregating groupBy on the 64-bit hash for document
    * frequencies, one (hash, id)-longs join back, one per-doc agg — the
    * text itself never shuffles. Documents with fewer than `width`
    * tokens have no shingles and are absent from the output.
    */
  def noveltyScore(df: DataFrame, idCol: String, textCol: String,
                   width: Int = 3): DataFrame = {
    val perDoc = df.select(col(idCol),
      explode(array_distinct(shingles(col(textCol), width))).as("__h"))
    val dfreq = perDoc.groupBy(col("__h")).agg(count(lit(1)).as("__df"))
    perDoc.join(dfreq, "__h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_distinct"),
        sum(when(col("__df") === 1, lit(1L)).otherwise(lit(0L))).as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast(DoubleType) / col("n_distinct"), 6))
  }

  /** Benchmark decontamination: corpus documents sharing ANY word
    * `width`-shingle with the benchmark set — the n-gram-overlap rule used
    * to scrub eval data out of training corpora. The exploded rows carry
    * only 64-bit shingle hashes (one per (doc, shingle)); the benchmark side is
    * distinct-hashed and BROADCAST (benchmarks are tiny next to a 100 TB
    * corpus), so the corpus never shuffles: explode, broadcast-semi-join,
    * distinct doc ids.
    */
  def contaminatedDocs(corpus: DataFrame, idCol: String, textCol: String,
                       benchmark: DataFrame, benchTextCol: String,
                       width: Int = 3): DataFrame = {
    val bh = benchmark
      .select(explode(word_shingle_hashes(col(benchTextCol), width)).as("__h"))
      .distinct()
    corpus
      .select(col(idCol), explode(word_shingle_hashes(col(textCol), width)).as("__h"))
      .join(broadcast(bh), Seq("__h"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** Map-side decontamination VERDICTS — the ingest-time form: the
    * benchmark's distinct shingle hashes collect ONCE into a sorted
    * array literal (bounded model state, the same class as centroids /
    * NB weights — eval benchmarks are model-sized next to a training
    * corpus) and every document's verdict is one arrays_overlap against
    * it. No join, no aggregation, no keyed state — so the IDENTICAL
    * expression filters an unbounded ingest stream in append mode
    * (StreamingSpec proves verdict parity with [[contaminatedDocs]]).
    * Returns (id, contaminated) for EVERY corpus doc. When the benchmark
    * outgrows a comfortable literal, [[contaminatedDocsBloom]]'s
    * bit-array is the constant-size fallback.
    */
  def decontamVerdicts(corpus: DataFrame, idCol: String, textCol: String,
                       benchmark: DataFrame, benchTextCol: String,
                       width: Int = 3): DataFrame = {
    val hashes: Array[Long] = benchmark
      .select(explode(word_shingle_hashes(col(benchTextCol), width)).as("__h"))
      .distinct().orderBy(col("__h"))
      .collect().map(_.getLong(0))
    corpus.select(col(idCol),
      arrays_overlap(word_shingle_hashes(col(textCol), width),
        typedlit(hashes)).as("contaminated"))
  }

  /** Bloom-PREFILTERED decontamination — the shape [[contaminatedDocs]]
    * takes when the benchmark side outgrows a comfortable broadcast hash
    * set: the benchmark's distinct shingle hashes fold into a fixed-size
    * bit array (bits/8 bytes of driver model state — KILOBYTES however
    * large the benchmark grows) whose literal compiles into a pure
    * map-side may-contain test on every corpus shingle; only surviving
    * (doc, hash) rows enter the exact broadcast semi-join, which removes
    * the bloom's false positives. The final result is EXACTLY the exact
    * path's (the gate shares decontam's oracle) — the bloom only thins
    * the join input, by ~(1 - m_set/bits)^probes for random shingles.
    * Probe positions are disjoint bit slices of the already-mixed 64-bit
    * shingle hash (no multiplies — safe under ANSI overflow semantics);
    * `nProbes * log2(bits) <= 64` must hold.
    */
  def contaminatedDocsBloom(corpus: DataFrame, idCol: String, textCol: String,
                            benchmark: DataFrame, benchTextCol: String,
                            width: Int = 3, bits: Int = 1 << 16,
                            nProbes: Int = 4): DataFrame = {
    require(bits >= 64 && (bits & (bits - 1)) == 0, s"bits must be a power of two >= 64, got $bits")
    val sliceWidth = java.lang.Long.numberOfTrailingZeros(bits.toLong)
    require(nProbes * sliceWidth <= 64,
      s"$nProbes probes x $sliceWidth-bit slices exceed the 64-bit hash")
    def probe(h: Column, i: Int): Column =
      shiftrightunsigned(h, i * sliceWidth).bitwiseAND(lit(bits - 1L))
    val bh = benchmark
      .select(explode(word_shingle_hashes(col(benchTextCol), width)).as("__h"))
      .distinct()
    // fold the benchmark hashes into the bit array: one bit_or shuffle of
    // (word, bits) pairs, then a bounded collect (bits/64 longs)
    val bloom: Array[Long] = {
      val arr = new Array[Long](bits / 64)
      bh.select(explode(array((0 until nProbes).map(i => probe(col("__h"), i)): _*)).as("p"))
        .select(shiftrightunsigned(col("p"), 6).cast(IntegerType).as("w"),
          call_function("shiftleft", lit(1L),
            col("p").bitwiseAND(lit(63L)).cast(IntegerType)).as("b"))
        .groupBy(col("w")).agg(expr("bit_or(b)").as("bits"))
        .collect().foreach(r => arr(r.getInt(0)) = r.getLong(1))
      arr
    }
    val bloomLit = typedLit(bloom.toSeq)
    def mayContain(h: Column): Column =
      (0 until nProbes).map { i =>
        val p = probe(h, i)
        call_function("shiftrightunsigned",
            element_at(bloomLit, shiftrightunsigned(p, 6).cast(IntegerType) + 1),
            p.bitwiseAND(lit(63L)).cast(IntegerType))
          .bitwiseAND(lit(1L)) =!= lit(0L)
      }.reduce(_ && _)
    corpus
      .select(col(idCol), explode(word_shingle_hashes(col(textCol), width)).as("__h"))
      .filter(mayContain(col("__h")))
      .join(broadcast(bh), Seq("__h"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** PII patterns for [[scrubPii]] — kept in the common Java-regex/RE2
    * subset (no lookarounds, no backreferences) so ANY engine applies
    * byte-identical redactions: emails, bare IPv4 literals, standalone
    * long digit runs (phone-ish).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{7,15}\\b"

  /** PII scrubbing — the redaction pass a training corpus runs before
    * leaving quarantine: emails, bare IPv4s, and long digit runs replace
    * with typed placeholder tokens, SEQUENTIALLY — each category is
    * counted on the text with the previous categories already redacted,
    * so every count is the number of tokens actually emitted (digits
    * inside an email never count as a phone). Adds match counts per
    * category plus the `scrubbed` column. Pure map-side regexp column
    * math — codegen'd, zero shuffle.
    */
  def scrubPii(df: DataFrame, textCol: String): DataFrame = {
    // literal-substring occurrence count — a plain scan, no regex:
    // occurrences = length dropped by removing the token / token length
    def nTok(c: Column, tok: String): Column =
      ((length(c) - length(replace(c, lit(tok)))) / lit(tok.length))
        .cast(IntegerType)
    df.withColumn("__t1", regexp_replace(col(textCol), EmailRe, "<EMAIL>"))
      .withColumn("__t2", regexp_replace(col("__t1"), Ipv4Re, "<IP>"))
      .withColumn("scrubbed", regexp_replace(col("__t2"), PhoneRe, "<PHONE>"))
      // counts derive from placeholder-occurrence DELTAS between stages —
      // three cheap literal scans instead of three full regex re-scans of
      // text the replaces already scanned. Each regex match inserts
      // exactly one placeholder, and no replacement can create or destroy
      // an occurrence by juxtaposition (the placeholder strings have no
      // prefix/suffix self-overlap and contain no digits or '@'), so the
      // deltas equal the regex match counts exactly — including on text
      // that already contained literal placeholder strings.
      .withColumn("n_emails",
        nTok(col("__t1"), "<EMAIL>") - nTok(col(textCol), "<EMAIL>"))
      .withColumn("n_ips",
        nTok(col("__t2"), "<IP>") - nTok(col("__t1"), "<IP>"))
      .withColumn("n_phones",
        nTok(col("scrubbed"), "<PHONE>") - nTok(col("__t2"), "<PHONE>"))
      .drop("__t1", "__t2")
  }

  /** Boilerplate patterns for [[normalizeText]] — RE2-safe like the PII
    * set: URLs (scheme to the next whitespace) and HTML/XML tags.
    */
  val UrlRe = "https?://[^ \\t\\n]+"
  val TagRe = "<[^>]+>"

  /** Boilerplate normalization — the standard pre-tokenization cleanup:
    * strip URLs, strip HTML/XML tags, collapse whitespace runs to one
    * space, trim. Counts are sequential (tags counted after URL removal)
    * so they equal the constructs actually stripped. Pure map-side regexp
    * column math, zero shuffle.
    */
  def normalizeText(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("n_urls",
        size(regexp_extract_all(col(textCol), lit(UrlRe), lit(0))))
      .withColumn("__t1", regexp_replace(col(textCol), UrlRe, " "))
      .withColumn("n_tags",
        size(regexp_extract_all(col("__t1"), lit(TagRe), lit(0))))
      .withColumn("normalized",
        trim(regexp_replace(regexp_replace(col("__t1"), TagRe, " "),
          "[ \\t\\n]+", " ")))
      .drop("__t1")

  /** Gopher-style composite quality filter (the arithmetic rule family of
    * the Gopher/MassiveText data pipeline — no model): keep a document
    * iff its token count, mean characters-per-token, and duplicate-3-gram
    * fraction all sit inside the configured bounds. Emits the metrics
    * alongside the verdict so drops are auditable. One ShingleKernel +
    * one TextStats-style pass, pure map-side — this is a FILTER at 100 TB,
    * not a job.
    */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
                   minTokens: Long = 50L, maxTokens: Long = 5000L,
                   minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                   maxRep: Double = 0.2): DataFrame =
    df.select(col(idCol),
        tokenCount(col(textCol)).cast(LongType).as("n_tokens"),
        length(col(textCol)).cast(DoubleType).as("__len"),
        shingles(col(textCol), 3).as("__sh"))
      .withColumn("mean_chars_per_token",
        when(col("n_tokens") > 0, round(col("__len") / col("n_tokens"), 6))
          .otherwise(lit(0.0)))
      .withColumn("rep_ratio", repRatioOf(col("__sh")))
      .withColumn("keep",
        col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
          col("mean_chars_per_token") >= minMeanLen &&
          col("mean_chars_per_token") <= maxMeanLen &&
          col("rep_ratio") <= maxRep)
      .select(col(idCol), col("n_tokens"), col("mean_chars_per_token"),
        col("rep_ratio"), col("keep"))

  /** Gopher's LINE-level quality rules (the half of the repetition suite
    * [[gopherFilter]]'s shingle signals don't cover): per document, the
    * fraction of duplicate lines, of bullet-point lines, and of
    * ellipsis-terminated lines, each against its published threshold
    * (duplicate <= 30%, bullets <= 90%, ellipsis <= 30%). One map-side
    * projection over the split lines — no shuffle, streams unbounded.
    */
  def gopherLineRules(df: DataFrame, idCol: String, textCol: String,
                      maxDupLine: Double = 0.3, maxBullet: Double = 0.9,
                      maxEllipsis: Double = 0.3): DataFrame = {
    val ls = col("__ls")
    val nl = size(ls).cast(DoubleType)
    val dup = round((size(ls) - size(array_distinct(ls))).cast(DoubleType) / nl, 6)
    val bul = round(size(filter(ls, l =>
      l.startsWith("- ") || l.startsWith("* "))).cast(DoubleType) / nl, 6)
    val ell = round(size(filter(ls, l =>
      l.endsWith("..."))).cast(DoubleType) / nl, 6)
    df.withColumn("__ls", split(col(textCol), "\n"))
      .select(col(idCol), size(ls).as("n_lines"),
        dup.as("dup_line_frac"), bul.as("bullet_frac"),
        ell.as("ellipsis_frac"))
      .withColumn("keep",
        col("dup_line_frac") <= maxDupLine &&
          col("bullet_frac") <= maxBullet &&
          col("ellipsis_frac") <= maxEllipsis)
  }

  /** WITHIN-document line dedup — the repetition-removal transform (C4's
    * cross-corpus first-occurrence rule is [[graft.ops.Dedup.dedupLines]];
    * this drops a doc's own repeated lines, keeping first occurrence in
    * order). Pure map-side fold over the split lines — no shuffle, no
    * state; O(lines^2) comparisons per doc, bounded by doc size. Output
    * value-checks the rebuild: (id, n_kept_lines, text_fp).
    */
  def dedupLinesWithinDoc(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val kept = aggregate(col("__ls"),
      array().cast(ArrayType(StringType)),
      (acc, l) => when(array_contains(acc, l), acc)
        .otherwise(concat(acc, array(l))))
    df.withColumn("__ls", split(col(textCol), "\n"))
      .withColumn("__kept", kept)
      .select(col(idCol),
        size(col("__kept")).cast(LongType).as("n_kept_lines"),
        graft.functions.fingerprint64(array_join(col("__kept"), "\n"))
          .as("text_fp"))
  }

  /** Concat-then-chunk sequence packing — the LLM-pretraining step that
    * concatenates documents into a token stream and slices fixed-size
    * training windows: within each `groupCol` stream, documents ordered
    * by `idCol` get the sequence id their FIRST token lands in
    * (seq_id = token_offset DIV budget; integer division, exact at any
    * stream length). One partitioned window carrying only
    * (group, id, n_tokens) triples — groups pack in parallel, text never
    * shuffles.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    groupCol: String, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.select(col(groupCol), col(idCol),
        tokenCount(col(textCol)).cast(LongType).as("n_tokens"))
      .withColumn("token_offset",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq_id", expr(s"token_offset DIV $budgetTokens"))
  }

  /** Context-window chunking — the pretraining/RAG step that slices each
    * document's token stream into fixed-size windows with overlap
    * (window `window` tokens, step `stride`; stride < window =
    * overlapping chunks, the standard long-context ingestion shape).
    * Pure map-side generate + explode: each row expands to
    * ceil(n_tokens / stride) chunk rows, nothing shuffles, and the
    * output volume is bounded by window/stride x corpus tokens —
    * a 100 TB corpus chunks in one pass with zero exchanges.
    * Documents with no tokens emit no chunks; generation stops at the
    * FIRST window that reaches the document end, so no chunk is entirely
    * contained in its predecessor (the trailing chunk may be short).
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    val toks = col("__toks")
    val n = size(toks)
    // last start = the smallest stride multiple whose window covers the
    // final token: ceil((n - window) / stride) * stride (0 when n <= window)
    val lastStart = when(n <= lit(window), lit(0))
      .otherwise(expr(s"((size(__toks) - $window + $stride - 1) DIV $stride) * $stride"))
    df.select(col(idCol),
        cleanTokens(col(textCol))
          .as("__toks"))
      // one start per stride step up to lastStart; empty docs emit no rows
      // (posexplode of an empty array)
      .select(col(idCol), toks,
        posexplode(when(n > 0, sequence(lit(0), lastStart, lit(stride)))
          .otherwise(array().cast(ArrayType(IntegerType))))
          .as(Seq("chunk_id", "start")))
      .select(col(idCol), col("chunk_id").cast(IntegerType).as("chunk_id"),
        col("start").cast(IntegerType).as("start"),
        slice(toks, col("start") + 1, lit(window)).as("__chunk"))
      .select(col(idCol), col("chunk_id"), col("start"),
        size(col("__chunk")).cast(IntegerType).as("n_tokens"),
        array_join(col("__chunk"), " ").as("chunk_text"))
  }

  /** Corpus-wide top-k word bigrams by frequency (tiebreak: gram asc).
    * The token array is materialized as a COLUMN before the per-index
    * lambda: referencing the split/filter expression inside the lambda
    * re-evaluates the whole chain per element (HOFs are interpreted and
    * not CSE'd) — measured O(tokens^2) per document, 7s -> sub-second.
    */
  def topBigrams(df: DataFrame, textCol: String, k: Int): DataFrame =
    // word_shingles: one compiled tokenize+build pass per doc — the
    // transform/element_at/concat_ws HOF chain interpreted its lambda
    // per position (identical gram list, including no grams under 2
    // tokens)
    df.select(explode(word_shingles(col(textCol), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(k)

  /** Cross-document duplicated n-gram census — the corpus diagnostic
    * behind substring-dedup tuning (which spans are worth deduplicating,
    * and how widespread are they): the top-k word n-grams by DOCUMENT
    * frequency among those appearing in >= 2 documents. Per-doc grams
    * are distinct'd map-side (`array_distinct` before the explode), so
    * the one shuffle carries at most one row per (doc, distinct gram)
    * and the count IS document frequency; top-k is a per-partition heap
    * (TakeOrdered), never a global sort.
    */
  def topDuplicatedNgrams(df: DataFrame, textCol: String, n: Int,
                          k: Int): DataFrame = {
    require(n >= 2, s"topDuplicatedNgrams needs n >= 2, got $n")
    // word_shingles(distinct): one compiled tokenize+build+dedupe pass
    // per doc — same distinct gram set as the former array_distinct over
    // the interpreted transform/slice/concat_ws chain (n-tuples of
    // whitespace-free tokens map 1:1 to their joined strings, so struct
    // vs string dedup cannot differ), probed ~2x less map-side time
    df.select(explode(word_shingles(col(textCol), n, distinct = true))
        .as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("n_docs").desc, col("ngram").asc)
      .limit(k)
  }

  /** Corpus vocabulary: top-k tokens by total occurrence count, with
    * document frequency. Two-level aggregation — (token, doc) partial
    * counts collapse duplicates map-side before the token-level shuffle,
    * so the second exchange carries one row per distinct (token, doc)
    * pair, never raw token occurrences (the scalable exact-count shape;
    * a countDistinct over raw pairs would expand instead).
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
                 k: Int): DataFrame =
    df.select(col(idCol),
        explode(cleanTokens(col(textCol)))
          .as("token"))
      .groupBy(col("token"), col(idCol)).agg(count(lit(1)).as("__n"))
      .groupBy(col("token"))
      .agg(sum(col("__n")).cast(LongType).as("n"),
        count(lit(1)).as("n_docs"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** Per-document top TF-IDF terms — the inverted-index statistics pass
    * of retrieval/data-curation pipelines. Ranking must agree bit-for-bit
    * across engines, so idf is QUANTIZED to integer micro-units
    * (floor(ln(N/df) * 1e6 + 0.5) — pure IEEE arithmetic on identical
    * integer inputs) and the score is the exact integer tf * idf_micro;
    * no float comparison anywhere near the rank boundary.
    *
    * Shape at scale: tf aggregates on (doc, token) with map-side combine;
    * the df table is vocabulary-sized (AQE broadcasts it when small); the
    * final per-doc ranking windows on doc_id. No corpus-sized exchange
    * beyond the two keyed aggregations. The corpus size N resolves INSIDE
    * the job as a one-row aggregate broadcast onto the vocabulary-sized
    * df table (the bm25 pattern) — not a separate driver-side `count()`
    * job, which would be one needless extra full corpus pass at scale
    * (the in-plan count scan itself is column-pruned to row-count-only).
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
                    perDoc: Int): DataFrame = {
    val tf = df.select(col(idCol),
        explode(cleanTokens(col(textCol)))
          .as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val n = df.agg(count(lit(1)).as("__n"))
    val dft = tf.groupBy(col("token")).agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(n))
      .withColumn("__idf_micro",
        floor(log(col("__n").cast(DoubleType) / col("__df")) * lit(1e6) + lit(0.5))
          .cast(LongType))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("token").asc)
    tf.join(dft, "token")
      .withColumn("score_micro", col("tf") * col("__idf_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perDoc)
      .select(col(idCol), col("token"), col("tf"), col("score_micro"),
        col("rank"))
  }

  /** Per-document average unigram log-probability under the corpus's own
    * unigram LM — the classic cheap LM-quality proxy for training-data
    * filtering (rare-token soup scores low, plain prose scores high).
    *
    * Two passes in one plan: token counts (one partial-aggregating
    * shuffle on token — at 100 TB the vocab frame is Zipf-small compared
    * to the corpus), then a token->count join and a per-document ORDERED
    * fold (array_sort(collect_list(struct(pos, logp))) then a
    * left-assoc sum) so the floating sum is position-deterministic on any
    * partitioning — groupBy sum of doubles would not be. The 1-row total
    * broadcasts.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df
      .select(col(idCol),
        posexplode(split(lower(col(textCol)), "\\s+")).as(Seq("pos", "tok")))
      .filter(col("tok") =!= "")
    // vocab is Zipf-small: one eager localCheckpoint materializes it so
    // BOTH consumers (the total scalar and the scoring join) read the
    // checkpointed frame — without it the optimizer re-derived `total`
    // from scratch and the corpus was tokenized+exploded THREE times
    // (main pass, vocab pass, total pass; plans/r19/
    // unigram_logprob_before.txt nodes 4-8 vs 14-21). Model-sized state,
    // same totals.
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val total = vocab.agg(sum(col("cnt")).as("total"))
    // pos_ordered_sum: the identical position-ordered left fold (same
    // IEEE op sequence as array_sort + HOF aggregate, and as the
    // oracle's list(logp ORDER BY pos) reduce) in one compiled kernel
    // call per doc — no interpreted sort comparator or lambda fold
    toks.join(vocab, "tok")
      .crossJoin(broadcast(total))
      .withColumn("logp",
        log(col("cnt").cast(DoubleType) / col("total")))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("pos"), col("logp"))).as("__lp"))
      .select(col(idCol),
        size(col("__lp")).as("n_toks"),
        round(pos_ordered_sum(col("__lp")) / size(col("__lp")), 6)
          .as("avg_logprob"))
  }

  /** Add-alpha smoothed BIGRAM LM scorer — the next rung of the LM-
    * quality ladder above [[unigramLogProb]] (the KenLM-style fluency
    * proxy training pipelines threshold on): per document, the mean of
    * ln p̂(w_i | w_{i-1}) with p̂ = (c(w1 w2) + α) / (c(w1 ·) + α·V),
    * where c(w1 ·) counts w1 as a bigram HEAD and V is the corpus
    * vocabulary size (a model scalar). Same scale shape as the unigram
    * scorer: model frames are vocab/bigram-vocab sized (Zipf-small beside
    * the corpus), the per-doc sum folds in position order so the float
    * arithmetic is partitioning-deterministic, rounding happens once at
    * the end. Documents with fewer than two tokens have no bigrams and
    * are absent from the output.
    */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
                    alpha: Double = 0.5): DataFrame =
    scoreBigramLm(fitBigramLm(df, textCol, alpha), df, idCol, textCol)

  /** A fitted bigram LM: head counts, bigram counts (both Zipf-small
    * model frames — cacheable/parquet-able like any other stored
    * artifact), the vocabulary-size scalar, and the smoothing alpha.
    */
  final case class BigramLm(heads: DataFrame, bigrams: DataFrame,
                            vocabSize: Double, alpha: Double)

  private def lmToks(d: DataFrame, textCol: String, cols: Column*): DataFrame =
    d.select(cols :+
      cleanTokens(col(textCol)).as("ts"): _*)

  // bigram construction is arrays_zip over two slices (whole-stage
  // codegen) rather than a transform/sequence/element_at lambda chain —
  // HOFs interpret the lambda per element; the zip form measured ~0.3 s
  // faster per scoring pass at sf0.1 with identical (pos, w1, w2) rows
  private def lmBigrams(t: DataFrame, cols: Column*): DataFrame =
    t.select(cols :+
        posexplode(when(size(col("ts")) > 1,
            arrays_zip(slice(col("ts"), lit(1), size(col("ts")) - 1),
              slice(col("ts"), lit(2), size(col("ts")) - 1)))
          .otherwise(array().cast("array<struct<`0`:string,`1`:string>>")))
          .as(Seq("pos", "bg")): _*)
      .select(cols ++ Seq(col("pos"), col("bg").getField("0").as("w1"),
        col("bg").getField("1").as("w2")): _*)

  /** TRAIN: one corpus pass for the bigram frame + one distinct-count
    * (the vocab scalar). Head counts re-aggregate the Zipf-small bigram
    * frame (c1(w1) = Σ_w2 c2 — exact long sums, the same counts a second
    * corpus pass would produce) instead of exploding the corpus again.
    * An offline batch job — serving callers cache the result like the
    * IVF/NB artifacts.
    */
  def fitBigramLm(df: DataFrame, textCol: String,
                  alpha: Double = 0.5): BigramLm = {
    val toks = lmToks(df, textCol)
    val bi = lmBigrams(toks)
    val big = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val heads = big.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    // vocabulary size: ONE distinct-count over tokens — model state; the
    // smoothed denominator term is computed as a double and inlined so
    // the oracle divides by the identical literal
    val v = toks.select(explode(col("ts")).as("t")).agg(countDistinct(col("t")))
      .head().getLong(0).toDouble
    BigramLm(heads, big, v, alpha)
  }

  /** SCORE `df` against a fitted model: one feature pass + two model
    * joins (LEFT — unseen heads/bigrams take the add-alpha floor the
    * training formula implies at c=0, so in-corpus scoring is identical
    * to the inner-join form and held-out scoring degrades continuously)
    * + the per-doc position-ordered ln fold.
    */
  def scoreBigramLm(lm: BigramLm, df: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    scoreBigramCore(
      lmBigrams(lmToks(df, textCol, col(idCol)), col(idCol)),
      lm.bigrams, lm.heads, lit(lm.alpha * lm.vocabSize), lm.alpha, idCol)

  /** Shared scoring tail: model joins (LEFT — add-alpha floor at c=0),
    * the ln formula with `aV` = alpha·V as a COLUMN (a literal for
    * pre-resolved models, an in-plan broadcast scalar for lazy fits),
    * and the per-doc position-ordered fold.
    */
  private def scoreBigramCore(bi: DataFrame, bigrams: DataFrame,
                              heads: DataFrame, aV: Column, alpha: Double,
                              idCol: String): DataFrame =
    bi.join(bigrams, Seq("w1", "w2"), "left")
      .join(heads, Seq("w1"), "left")
      .withColumn("logp",
        log((coalesce(col("c2"), lit(0L)).cast(DoubleType) + alpha) /
          (coalesce(col("c1"), lit(0L)).cast(DoubleType) + aV)))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("pos"), col("logp"))).as("__lp"))
      .select(col(idCol),
        size(col("__lp")).as("n_bigrams"),
        // compiled position-ordered fold — same IEEE sequence as the
        // interpreted array_sort + aggregate form (see unigramLogProb)
        round(pos_ordered_sum(col("__lp")) / size(col("__lp")), 6)
          .as("avg_logprob"))

  /** HELD-OUT bigram LM scoring — the eval-side twin of
    * [[bigramLogProb]]: the model (head counts, bigram counts, vocab
    * scalar) fits on `model`, the documents of `df` are scored against
    * it. Unseen heads/bigrams fall back to the add-alpha floor via LEFT
    * joins + coalesce(count, 0) — exactly the smoothing the training
    * formula implies at c=0, so scores degrade continuously instead of
    * dropping rows. Same scale shape: model frames Zipf-small, per-doc
    * position-ordered fold, one rounding at the end. The train/eval
    * split version of the CCNet recipe ("fit the LM on clean text, score
    * the candidate pool").
    */
  def bigramLogProbAgainst(model: DataFrame, df: DataFrame, idCol: String,
                           textCol: String,
                           alpha: Double = 0.5): DataFrame = {
    // lazy in-plan fit: the vocab scalar resolves INSIDE the job as a
    // 1-row broadcast (alpha·V computed with the same double multiply
    // the eager fit inlined), so no separate distinct-count job runs and
    // the train corpus is exploded once, not three times
    val toks = lmToks(model, textCol)
    val bi = lmBigrams(toks)
    val big = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val heads = big.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val aVrow = toks.select(explode(col("ts")).as("t"))
      .agg((lit(alpha) * countDistinct(col("t")).cast(DoubleType)).as("__aV"))
    scoreBigramCore(
      lmBigrams(lmToks(df, textCol, col(idCol)), col(idCol))
        .crossJoin(broadcast(aVrow)),
      big, heads, col("__aV"), alpha, idCol)
  }

  /** Light suffix-stripping stem rules, applied in order to a lowercased
    * token. ONE list drives both engines: each entry is (anchored RE2
    * pattern with one capture group, suffix appended after the group) —
    * [[lightStem]] renders Java-regex `$1` replacements, the DuckDB mirror
    * renders `\1`. Anchored patterns match at most once, so Spark's
    * replace-all and DuckDB's replace-first behave identically. This is a
    * deliberately rule-transparent stemmer (vocabulary folding for
    * retrieval), not Porter.
    */
  val StemRules: Seq[(String, String)] = Seq(
    ("^([a-z]{3,})ies$", "y"),        // studies -> study
    ("^([a-z]{3,})sses$", "ss"),      // classes -> class
    ("^([a-z]{4,})ing$", ""),         // processing -> process
    ("^([a-z]{4,})ed$", ""),          // merged -> merg
    ("^([a-z]{2,}[a-ru-z])s$", ""))   // dogs -> dog (keeps -ss, -us)

  /** Apply [[StemRules]] to a single lowercased token column. */
  def lightStem(token: Column): Column =
    StemRules.foldLeft(token) { case (c, (pat, suffix)) =>
      regexp_replace(c, pat, "$1" + suffix)
    }

  /** Stemmed vocabulary: explode lowercased tokens, fold with
    * [[lightStem]], count, keep the top-k (count desc, term asc) — one
    * partial-aggregating shuffle + a TakeOrdered, like the raw vocab op.
    */
  def stemmedVocab(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"stemmedVocab needs k >= 1, got $k")
    df.select(explode(cleanTokens(col(textCol))).as("tok"))
      .select(lightStem(col("tok")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
  }

  /** Full per-document text-analysis projection. */
  def analyze(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).as("id"),
      tokenCount(col(textCol)).as("n_tokens"),
      round(stopwordRatio(col(textCol)), 6).as("stopword_ratio"),
      qualityScore(col(textCol)).as("quality"),
      langId(col(textCol)).as("lang_pred"),
      fingerprint(col(textCol)).as("fingerprint"))
}
