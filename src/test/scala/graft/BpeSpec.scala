package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Bpe

/** BPE vocabulary training: the greedy merge rule's edge cases (the
  * self-pair overlap), deterministic argmax ties, training on a corpus
  * with a known answer, and the encode path.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def mergeOf(word: String, a: String, b: String): Seq[String] =
    Seq(word).toDF("w")
      .select(Bpe.mergePair(Bpe.charSymbols(col("w")), a, b))
      .head().getSeq[String](0)

  test("mergePair is greedy left-to-right, non-overlapping on self-pairs") {
    assert(mergeOf("banana", "a", "n") === Seq("b", "an", "an", "a", "</w>"))
    // "aaaa": matches at 1,2,3 — greedy takes 1-2 and 3-4, never 2-3
    assert(mergeOf("aaaa", "a", "a") === Seq("aa", "aa", "</w>"))
    // odd run: "aaa" -> [aa, a]
    assert(mergeOf("aaa", "a", "a") === Seq("aa", "a", "</w>"))
    // word-final merge consumes the marker
    assert(mergeOf("hi", "i", "</w>") === Seq("h", "i</w>"))
    // no match: unchanged
    assert(mergeOf("xyz", "q", "r") === Seq("x", "y", "z", "</w>"))
  }

  test("trainMerges finds the classic most-frequent pair sequence") {
    // Sennrich's running example shape: 'low' dominates, so (l, o) and
    // then (lo, w) are the first merges (ties broken lexicographically)
    val docs = Seq(
      (1L, "low low low lower lowest"),
      (2L, "low lower newest newest")).toDF("doc_id", "text")
    val (merges, syms) = Bpe.trainMerges(docs, "text", numMerges = 4)
    assert(merges.head.left === "l" && merges.head.right === "o")
    assert(merges.head.count === 7L) // every word starts with "lo"
    assert(merges(1).left === "lo" && merges(1).right === "w")
    // steps numbered 1..n in order
    assert(merges.map(_.step) === (1 to merges.length))
    // after (l,o) and (lo,w): "low" segments as [low, </w>] once a
    // further merge fuses the marker or stays [low, </w>] otherwise
    val lowSeg = syms.filter(col("word") === "low")
      .head().getSeq[String](2)
    assert(lowSeg.head.startsWith("low"))
  }

  test("applyMerges re-derives training segmentation; counts are map-side") {
    val docs = Seq(
      (1L, "aba aba abab"),
      (2L, "bab aba")).toDF("doc_id", "text")
    val (merges, syms) = Bpe.trainMerges(docs, "text", numMerges = 3)
    // encode path must reproduce the training-side segmentation exactly
    val reEncoded = syms.select(col("word"),
      Bpe.applyMerges(Bpe.charSymbols(col("word")), merges).as("s2"),
      col("s"))
    assert(reEncoded.filter(not(col("s") === col("s2"))).count() === 0)
    val counted = Bpe.subwordCountTrained(docs, "text", merges, "n")
      .orderBy("doc_id").collect().map(_.getLong(2))
    assert(counted.length === 2 && counted.forall(_ > 0))
    // fewer merges => never fewer subwords (merges only fuse)
    val counted0 = Bpe.subwordCountTrained(docs, "text", Seq.empty, "n")
      .orderBy("doc_id").collect().map(_.getLong(2))
    assert(counted.zip(counted0).forall { case (a, b) => a <= b })
  }

  test("early stop when every word is fully fused") {
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    // 'ab</w>' fully fuses in 2 merges; asking for 10 must stop early
    val (merges, syms) = Bpe.trainMerges(docs, "text", numMerges = 10)
    assert(merges.length <= 3)
    assert(syms.head().getSeq[String](2).length === 1)
  }

  test("encodeTokenCounts (vocab join) == subwordCountTrained (fold); OOV falls back to chars") {
    import spark.implicits._
    val corpus = Tables.load(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(50)
    val (merges, syms) = Bpe.trainMerges(corpus, "text", numMerges = 8)
    val viaJoin = Bpe.encodeTokenCounts(corpus, "doc_id", "text", syms)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaFold = Bpe.subwordCountTrained(corpus, "text", merges, "n")
      .select(col("doc_id"), col("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaJoin == viaFold)
    // a doc of only unseen words: char-level fallback len+1 per word
    val oov = Seq((999L, "zzzq xq")).toDF("doc_id", "text")
    val n = Bpe.encodeTokenCounts(oov, "doc_id", "text", syms).head().getLong(1)
    assert(n == (4 + 1) + (2 + 1), s"OOV fallback got $n")
  }
}
