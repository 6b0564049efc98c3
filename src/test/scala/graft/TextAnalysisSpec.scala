package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bigramLogProbAgainst: seen bigrams match in-corpus scoring; unseen hit the add-alpha floor") {
    val model = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    // vocab = {a,b,c} -> V=3; heads: a->3, b->2; bigrams: (a,b)->3, (b,a)->1, (b,c)->1
    val alpha = 0.5
    val scored = TextAnalysis.bigramLogProbAgainst(
      model, Seq((10L, "a b"), (11L, "z q")).toDF("doc_id", "text"),
      "doc_id", "text", alpha)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val aV = alpha * 3
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(scored(10L) === r6(math.log((3 + alpha) / (3 + aV))))
    // fully unseen head AND bigram: ln(alpha / (0 + alpha*V))
    assert(scored(11L) === r6(math.log(alpha / aV)))
    // scoring the model corpus against itself equals bigramLogProb
    val self = TextAnalysis.bigramLogProb(model, "doc_id", "text", alpha)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val against = TextAnalysis.bigramLogProbAgainst(model, model,
      "doc_id", "text", alpha)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(self === against)
  }

  test("topDuplicatedNgrams: document frequency of distinct grams, df>=2 only") {
    val docs = Seq(
      "a b c d e f",       // shares "a b c" with doc 2 and 3
      "x a b c y z",
      "a b c a b c q q",   // repeated gram counts ONCE for this doc
      "totally different words here now").toDF("text")
    val got = TextAnalysis.topDuplicatedNgrams(docs, "text", n = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a b c") === 3L)   // per-doc distinct: doc 3 contributes 1
    assert(!got.contains("d e f"))          // df = 1 filtered
    assert(got.values.forall(_ >= 2L))
    // docs shorter than n emit nothing
    val short = TextAnalysis.topDuplicatedNgrams(
      Seq("a b", "a b").toDF("text"), "text", n = 3, k = 5)
    assert(short.count() === 0L)
  }

  test("tokenCount counts whitespace tokens") {
    val r = Seq("one two  three\tfour").toDF("t")
      .select(TextAnalysis.tokenCount(col("t"))).head().getInt(0)
    assert(r === 4)
  }

  test("stopwordRatio and punctRatio bounds") {
    val df = Seq(
      "the the the",            // all stopwords
      "spark flink trino",      // none
      "!!! ???").toDF("t")
      .select(
        TextAnalysis.stopwordRatio(col("t")).as("s"),
        TextAnalysis.punctRatio(col("t")).as("p"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) === 1.0)
    assert(rows(1).getDouble(0) === 0.0)
    assert(rows(2).getDouble(1) > 0.5)
    rows.foreach { r =>
      assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
      assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
    }
  }

  test("qualityScore in [0,1]; natural text scores above garbage") {
    val df = Seq(
      ("good", ("the quick brown fox is on the hill and it runs to the river " * 5)),
      ("bad", "@@## $$%% ^^&&"))
      .toDF("k", "t")
      .select(col("k"), TextAnalysis.qualityScore(col("t")).as("q"))
    val m = df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("good") > m("bad"))
    assert(m.values.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("langId recognizes clear function-word profiles") {
    val df = Seq(
      ("en", "the cat and the dog is in that house for now with food"),
      ("de", "der hund und die katze ist nicht ein problem mit uns"),
      ("es", "el perro y la casa que es una maravilla para todos los dias"),
      ("fr", "le chien est dans une maison pour les amis des bois"),
      ("und", "xyzzy quux plugh"))
      .toDF("expected", "t")
      .select(col("expected"), TextAnalysis.langId(col("t")).as("got"))
    df.collect().foreach(r => assert(r.getString(1) === r.getString(0),
      s"lang mismatch for ${r.getString(0)}"))
  }

  test("repetitionRatio: repeated 3-grams raise the ratio; short docs are 0") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c a b c a b c"),  // 7 shingles, 3 distinct -> 4/7 repeated
      (2L, "all distinct words here now"), // 3 shingles, all distinct -> 0
      (3L, "too short"))           // < 3 tokens -> no shingles -> 0
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.repetitionRatio(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(out(1L) === ((7, 3, math.rint((1.0 - 3.0 / 7) * 1e6) / 1e6)))
    assert(out(2L) === ((3, 3, 0.0)))
    assert(out(3L) === ((0, 0, 0.0)))
    // NULL text counts as zero shingles, not size(NULL) = -1
    val withNull = Seq((9L, Option.empty[String])).toDF("doc_id", "text")
    val nr = graft.ops.TextAnalysis.repetitionRatio(withNull, "doc_id", "text")
      .collect().head
    assert((nr.getInt(1), nr.getInt(2), nr.getDouble(3)) === ((0, 0, 0.0)))
    // and the plan is shuffle-free: a pure map-side projection
    val plan = graft.ops.TextAnalysis.repetitionRatio(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("contaminatedDocs flags exactly the docs sharing a 3-gram with the benchmark") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps"),    // shares "quick brown fox"
      (2L, "completely unrelated text body here"),
      (3L, "another document with quick brown fox inside"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "quick brown fox")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.contaminatedDocs(
      corpus, "doc_id", "text", bench, "text")
    assert(out.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    // benchmark side broadcasts; the corpus is never sort-merge joined
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("bloom-prefiltered decontamination equals the exact path and thins the join") {
    val docs = graft.Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 97 =!= 0)
    val bench = docs.filter(col("doc_id") % 97 === 0)
    val exact = graft.ops.TextAnalysis
      .contaminatedDocs(corpus, "doc_id", "text", bench, "text")
      .collect().map(_.getLong(0)).toSet
    val bloom = graft.ops.TextAnalysis
      .contaminatedDocsBloom(corpus, "doc_id", "text", bench, "text")
      .collect().map(_.getLong(0)).toSet
    // the bloom only thins the join input — the RESULT is identical
    assert(bloom === exact)
    assert(bloom.nonEmpty)
    // plan shape: the corpus is scanned once, the verify join is a
    // broadcast (benchmark side), never a sort-merge of the corpus
    val plan = graft.ops.TextAnalysis
      .contaminatedDocsBloom(corpus, "doc_id", "text", bench, "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // and it genuinely thins: the may-contain prefilter must reject the
    // bulk of corpus shingles (random 64-bit hashes hit a sparsely set
    // 64 Kbit array on all 4 probes with probability ~(m_set/bits)^4)
    import graft.functions.word_shingle_hashes
    val totalShingles = corpus
      .select(explode(word_shingle_hashes(col("text"), 3)).as("__h"))
      .count()
    val benchHashes = bench
      .select(explode(word_shingle_hashes(col("text"), 3)).as("__h"))
      .distinct().count()
    // true matches are a lower bound on survivors; assert the prefilter
    // passes under 10% of the corpus shingles (it measured ~benchHashes
    // + fp, far below totalShingles at this benchmark density)
    assert(benchHashes.toDouble / totalShingles < 0.1,
      s"test premise: benchmark density $benchHashes/$totalShingles")
  }

  test("normalizeText strips URLs and tags, collapses whitespace") {
    import spark.implicits._
    val df = Seq(
      (1L, "read  this:  https://a.io/x?y=1 <b>bold</b>\tand <br/> done"),
      (2L, "plain already")).toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.normalizeText(df, "text")
      .select("doc_id", "n_urls", "n_tags", "normalized")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(out(1L) === ((1, 3, "read this: bold and done"))) // <b>, </b>, <br/>
    assert(out(2L) === ((0, 0, "plain already")))
  }

  test("gopherFilter: each rule independently drops; clean docs keep") {
    import spark.implicits._
    val longText = Seq.tabulate(60)(i => s"word$i").mkString(" ")       // 60 tokens, distinct
    val repeats = Seq.fill(20)("spam spam spam").mkString(" ")           // high repetition
    val df = Seq(
      (1L, longText),                                   // keep
      (2L, "too short"),                                // drop: < minTokens
      (3L, repeats + " " + longText),                   // drop: rep_ratio
      (4L, Seq.fill(60)("hippopotomonstrous").mkString(" "))) // drop: mean len > 10
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.gopherFilter(df, "doc_id", "text",
        minTokens = 50L, maxTokens = 5000L, maxRep = 0.2)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("packSequences: concat-then-chunk offsets within each group stream") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", "a b c"),        // 3 tokens, offset 0, seq 0
      (2L, "en", "d e f g"),      // offset 3, seq 0
      (3L, "en", "h i"),          // offset 7, seq 1 (budget 4)
      (1L, "de", "x y z w q"))    // separate stream: offset 0, seq 0
      .toDF("doc_id", "lang", "text")
    val out = graft.ops.TextAnalysis.packSequences(df, "doc_id", "text", "lang", 4L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(("en", 1L)) === ((3L, 0L, 0L)))
    assert(out(("en", 2L)) === ((4L, 3L, 0L))) // straddles; starts in seq 0
    assert(out(("en", 3L)) === ((2L, 7L, 1L)))
    assert(out(("de", 1L)) === ((5L, 0L, 0L)))
  }

  test("scrubPii redacts emails, IPs, and digit runs with typed tokens") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail me at a.b-c%d@sub.example.org or call 5551234567 from 192.168.0.1"),
      (2L, "clean text with user123 and v2.0 markers"))
      .toDF("doc_id", "text")
    val out = graft.ops.TextAnalysis.scrubPii(df, "text")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "scrubbed")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toMap
    assert(out(1L) === ((1, 1, 1,
      "mail me at <EMAIL> or call <PHONE> from <IP>")))
    // short digit runs and version markers survive untouched
    assert(out(2L) === ((0, 0, 0, "clean text with user123 and v2.0 markers")))
  }

  test("scrubPii counts reflect tokens actually emitted (no double counting)") {
    import spark.implicits._
    // the digit-run local part disappears inside <EMAIL>; it must not
    // ALSO count as a phone
    val df = Seq((1L, "reach 5551234567@example.com today")).toDF("doc_id", "text")
    val r = graft.ops.TextAnalysis.scrubPii(df, "text")
      .select("n_emails", "n_ips", "n_phones", "scrubbed").collect().head
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) === ((1, 0, 0)))
    assert(r.getString(3) === "reach <EMAIL> today")
  }

  test("scrubPii and normalizeText are idempotent (tokens never re-match)") {
    import spark.implicits._
    val df = Seq(
      (1L, "a@b.co 1.2.3.4 5551234567 https://x.io/p <i>t</i>  mixed \t text"),
      (2L, "clean"),
      (3L, "<EMAIL> looks scrubbed already 12345678901"))
      .toDF("doc_id", "text")
    val once = graft.ops.TextAnalysis.scrubPii(df, "text")
      .select(col("doc_id"), col("scrubbed").as("text"))
    val twice = graft.ops.TextAnalysis.scrubPii(once, "text")
      .select("doc_id", "n_emails", "n_ips", "n_phones", "scrubbed").collect()
    twice.foreach { r =>
      assert((r.getInt(1), r.getInt(2), r.getInt(3)) === ((0, 0, 0)),
        s"re-scrub found new matches: $r")
    }
    val norm1 = graft.ops.TextAnalysis.normalizeText(df, "text")
      .select(col("doc_id"), col("normalized").as("text"))
    val norm2 = graft.ops.TextAnalysis.normalizeText(norm1, "text")
      .select("doc_id", "n_urls", "n_tags", "normalized").collect()
    norm2.foreach { r =>
      assert((r.getInt(1), r.getInt(2)) === ((0, 0)), s"re-normalize matched: $r")
    }
  }

  test("packSequences offsets are contiguous per group on the real corpus") {
    val out = graft.ops.TextAnalysis.packSequences(
        Tables.load(spark, TestSpark.sfDir, "documents"), "doc_id", "text",
        "lang", 1024L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    out.groupBy(_._1).values.foreach { group =>
      val ordered = group.sortBy(_._2)
      ordered.sliding(2).foreach {
        case Array((_, _, n, off), (_, _, _, off2)) =>
          assert(off2 === off + n, "token stream must be gap-free")
        case _ => ()
      }
      assert(ordered.head._4 === 0L)
    }
  }

  test("chunkDocs: windows tile the token stream with the stated overlap") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than one window
      (3L, "   ")                                     // token-less: no chunks
    ).toDF("doc_id", "text")
    val out = TextAnalysis.chunkDocs(df, "doc_id", "text", window = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(out.filter(_._1 == 3L).isEmpty, "empty doc emits no chunks")
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts advance by stride and stop at the first window reaching the
    // end — no chunk is a suffix of its predecessor
    assert(d1.map(_._3).toSeq === Seq(0, 2, 4, 6))
    assert(d1.map(_._4).toSeq === Seq(4, 4, 4, 4))
    assert(d1.head._5 === "t1 t2 t3 t4")
    // consecutive chunks share window-stride tokens
    assert(d1(0)._5.split(" ").drop(2).toSeq === d1(1)._5.split(" ").take(2).toSeq)
    val d2 = out.filter(_._1 == 2L)
    assert(d2.map(x => (x._2, x._3, x._4, x._5)).toSeq === Seq((0, 0, 3, "a b c")))
    // non-overlapping stride reconstructs the document exactly
    val flat = TextAnalysis.chunkDocs(df.filter(col("doc_id") === 1L),
        "doc_id", "text", window = 4, stride = 4)
      .orderBy("chunk_id").collect().map(_.getString(4)).mkString(" ")
    assert(flat === (1 to 10).map(i => s"t$i").mkString(" "))
  }

  test("vocabulary: counts, doc frequency, deterministic tiebreak") {
    val df = Seq(
      (1L, "b a b c"),
      (2L, "a b"),
      (3L, "c a")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabulary(df, "doc_id", "text", k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a and b tie at 3 occurrences -> token asc breaks the tie
    assert(out.toSeq === Seq(("a", 3L, 3L), ("b", 3L, 2L), ("c", 2L, 2L)))
  }

  test("tfidfTopTerms: rare terms outrank ubiquitous ones; ranks bounded") {
    val df = Seq(
      (1L, "common rare common"),
      (2L, "common other"),
      (3L, "common other")).toDF("doc_id", "text")
    val out = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", perDoc = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    // 'common' appears in every doc -> idf = ln(1) = 0 -> score 0
    out.filter(_._2 == "common").foreach(r => assert(r._4 === 0L))
    // doc 1: 'rare' (df=1, tf=1) beats 'common' (tf=2, idf 0)
    val d1 = out.filter(_._1 == 1L).sortBy(_._5)
    assert(d1.head._2 === "rare" && d1.head._4 === math.floor(math.log(3.0) * 1e6 + 0.5).toLong)
    assert(out.groupBy(_._1).values.forall(g => g.map(_._5).sorted.toSeq == (1 to g.size).toSeq))
    assert(out.forall(_._5 <= 2))
  }

  test("percentileBins: monotone in the metric, quartiles roughly balanced") {
    val t = Tables.load(spark, TestSpark.sfDir, "documents")
      .withColumn("__st", TextAnalysis.stats(col("text")))
      .select(col("doc_id"), TextAnalysis.tokenCountOf(col("__st")).as("m"))
    val out = TextAnalysis.percentileBins(t, "m", Seq(0.25, 0.5, 0.75))
      .collect().map(r => (r.getAs[Number](1).longValue(), r.getInt(2)))
    // strict value partition: equal metrics share a bin, so every value
    // in bin b sorts strictly below every value in bin b+1
    val byBin = out.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    for (b <- 0 until 3; hi <- byBin.get(b + 1); lo <- byBin.get(b))
      assert(lo.max < hi.min, s"bin $b overlaps ${b + 1}")
    for (b <- 0 to 3) {
      val n = byBin.getOrElse(b, Array.empty[Long]).length
      assert(n > out.length / 8 && n < out.length / 2,
        s"bin $b holds $n of ${out.length}")
    }
  }

  test("analyze produces the full projection on real documents") {
    val out = TextAnalysis.analyze(
      Tables.load(spark, TestSpark.sfDir, "documents"), "doc_id", "text")
    assert(out.columns.toSeq === Seq("id", "n_tokens", "stopword_ratio",
      "quality", "lang_pred", "fingerprint"))
    assert(out.count() === 500)
    assert(out.filter(col("fingerprint").isNull).count() === 0)
  }

  test("lightStem folds the documented suffix families and nothing shorter") {
    import spark.implicits._
    val cases = Seq(
      ("studies", "study"), ("classes", "class"), ("processing", "process"),
      ("merged", "merg"), ("dogs", "dog"),
      ("ties", "tie"),
      // guards: short stems and -ss/-us words stay put
      ("its", "its"), ("sing", "sing"), ("bed", "bed"),
      ("class", "class"), ("bus", "bus"), ("is", "is"),
      // non-alpha tokens untouched
      ("42", "42"), ("a1s", "a1s"))
    val got = cases.map(_._1).toDF("tok")
      .select(col("tok"), TextAnalysis.lightStem(col("tok")).as("s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (in, want) =>
      assert(got(in) == want, s"$in -> ${got(in)}, wanted $want")
    }
  }

  test("stemmedVocab folds plural/inflected forms into one term") {
    import spark.implicits._
    val docs = Seq(
      (1L, "query queries querying queried"),
      (2L, "query queries shard shards")).toDF("doc_id", "text")
    val got = TextAnalysis.stemmedVocab(docs, "text", k = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // query x2 + queries->query x2 + querying->query = 5;
    // queried -> queri (the documented light -ed behavior);
    // shard + shards->shard = 2
    assert(got("query") == 5L, got)
    assert(got("shard") == 2L, got)
    assert(got("queri") == 1L, got)
    assert(!got.contains("queries") && !got.contains("shards"))
  }

  test("unigramLogProb: frequent-token prose outscores rare-token soup") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the mat"),
      (3L, "zyx qwv jkl pqr xxq zzt")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(out.values.forall(_._1 == 6))
    // every token of doc 3 is a hapax -> strictly lower avg logprob
    assert(out(3L)._2 < out(1L)._2 && out(3L)._2 < out(2L)._2, out)
    // all probabilities < 1 -> negative scores
    assert(out.values.forall(_._2 < 0))
  }

  test("noveltyScore: unique content scores 1, fully-copied content 0") {
    import graft.ops.TextAnalysis
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),       // all shingles unique
      (2L, "one two three four five"),              // copied by doc 3
      (3L, "one two three four five"),              // exact copy
      (4L, "x y")                                   // < width tokens: absent
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScore(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out === Map(1L -> 1.0, 2L -> 0.0, 3L -> 0.0))
  }

  test("nfc_normalize composes decomposed marks; NFC text passes through") {
    val df = Seq(
      (1L, "café"),   // e + combining acute -> precomposed é
      (2L, "café"),    // already NFC
      (3L, "plain ascii")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        graft.functions.nfc_normalize(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "café")
    assert(out(2L) === "café")
    assert(out(3L) === "plain ascii")
  }

  test("strip_accents drops marks from composed AND decomposed forms; ASCII zero-copy") {
    val df = Seq(
      (1L, "cafe\u0301"),   // decomposed e + U+0301
      (2L, "café"),         // precomposed
      (3L, "mühle ångström"),
      (4L, "plain")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
        graft.functions.strip_accents(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "cafe")
    assert(out(2L) === "cafe")
    assert(out(3L) === "muhle angstrom")
    assert(out(4L) === "plain")
  }

  test("gopherLineRules: duplicate/bullet/ellipsis fractions and verdicts") {
    import graft.ops.TextAnalysis
    val df = Seq(
      (1L, "a b\na b\nc d\na b"),            // 2 of 4 lines duplicate -> fail
      (2L, "- one\n- two\n- three\nplain"),  // 3/4 bullets -> under 0.9, keep
      (3L, "done...\nnot this one\nmore..."),// 2/3 ellipsis -> fail
      (4L, "clean text\nno tricks here"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.gopherLineRules(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)), r.getBoolean(5))).toMap
    assert(out(1L) === ((0.5, 0.0, 0.0), false))
    assert(out(2L) === ((0.0, 0.75, 0.0), true))
    assert(out(3L)._1._3 > 0.3 && !out(3L)._2)
    assert(out(4L) === ((0.0, 0.0, 0.0), true))
  }

  test("dedupLinesWithinDoc keeps first occurrence in order") {
    import graft.ops.TextAnalysis
    val df = Seq(
      (1L, "x\ny\nx\nz\ny"),
      (2L, "a\nb"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.dedupLinesWithinDoc(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L)._1 === 3L)
    assert(out(2L)._1 === 2L)
    val expect = spark.range(1)
      .select(graft.functions.fingerprint64(lit("x\ny\nz"))).head().getLong(0)
    assert(out(1L)._2 === expect)
  }

  test("charEntropy: uniform text maximal, constant text zero, empty NULL") {
    import graft.ops.TextAnalysis
    val df = Seq(
      (1L, "abcd"),        // uniform over 4 chars: ln(4)
      (2L, "aaaa"),        // single symbol: 0
      (3L, ""),            // empty: NULL
      // document-sized input: guards against the O(n^3) lambda-inlining
      // hang the first formulation had (fine at 4 chars, minutes at 550)
      (4L, "ab" * 300)     // uniform over 2 chars: ln(2)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(math.abs(out(1L).get - math.log(4.0)) < 1e-6)
    assert(out(2L).get === 0.0 || out(2L).get === -0.0)
    assert(out(3L) === None)
    assert(math.abs(out(4L).get - math.log(2.0)) < 1e-6)
  }

  test("chunkDocuments: window/stride boundaries, short and empty docs, case preserved") {
    import spark.implicits._
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens, w=4 s=3
      (2L, "Short Doc"),                              // < window: one chunk
      (3L, ""),                                       // empty: no chunks
      (4L, "a b c d")                                 // == window exactly
    ).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis
      .chunkDocuments(df, "doc_id", "text", window = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3))).sortBy(c => (c._1, c._2)).toSeq
    // doc 1: starts 0,3,6 — ceil((10-4)/3)+1 = 3 chunks; last runs to end
    assert(got.filter(_._1 == 1L) === Seq(
      (1L, 0, "t1 t2 t3 t4", 4),
      (1L, 1, "t4 t5 t6 t7", 4),
      (1L, 2, "t7 t8 t9 t10", 4)))
    assert(got.filter(_._1 == 2L) === Seq((2L, 0, "Short Doc", 2)))
    assert(!got.exists(_._1 == 3L))
    assert(got.filter(_._1 == 4L) === Seq((4L, 0, "a b c d", 1 * 4)))
    // tail shorter than a window keeps its true token count
    val tail = graft.ops.TextAnalysis
      .chunkDocuments(df.filter($"doc_id" === 1L), "doc_id", "text",
        window = 4, stride = 4)
      .collect().map(r => (r.getInt(1), r.getString(2), r.getInt(3))).toSeq
      .sortBy(_._1)
    assert(tail === Seq((0, "t1 t2 t3 t4", 4), (1, "t5 t6 t7 t8", 4),
      (2, "t9 t10", 2)))
    // map-side plan: split -> slice -> explode, no shuffle
    val plan = graft.ops.TextAnalysis
      .chunkDocuments(df, "doc_id", "text", window = 4, stride = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking shuffled:\n$plan")
  }
}
