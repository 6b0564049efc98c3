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

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count approximation: words plus punctuation clusters
    * counted separately (regexp token model). */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)) +
      size(filter(split(text, "[a-z0-9\\s]+"), t => length(t) > 0))

  private val stopwords =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")

  /** Fraction of tokens that are stopwords (signal of natural language). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val stops = size(filter(toks, t => array_contains(array(stopwords.map(lit): _*), t)))
    when(size(toks) > 0, stops.cast(DoubleType) / size(toks).cast(DoubleType))
      .otherwise(lit(0.0))
  }

  /** Fraction of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    val punct = total - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))
    when(total > 0, punct.cast(DoubleType) / total.cast(DoubleType)).otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: length sweet-spot * (1 - punct
    * excess) * stopword presence. A heuristic quality prior in the spirit
    * of C4/Gopher text-quality rules.
    */
  def qualityScore(text: Column): Column = {
    val n = tokenCount(text).cast(DoubleType)
    val lengthScore = least(n / lit(50.0), lit(1.0))
    val stopScore = least(stopwordRatio(text) * lit(5.0), lit(1.0))
    val punctPenalty = greatest(lit(1.0) - punctRatio(text) * lit(3.0), lit(0.0))
    round(lengthScore * (lit(0.5) + lit(0.5) * stopScore) * punctPenalty, 6)
  }

  /** Language-ID profiles: characteristic high-frequency function words.
    * Deterministic argmax with fixed precedence (en > de > es > fr > unknown).
    */
  private val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "es" -> Seq("el", "la", "que", "de", "los", "es", "una", "para"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour"))

  /** N-gram/function-word language heuristic: score per language = count of
    * profile words present (distinct), predict the max (ties resolved by
    * profile order), 'und' (unknown) when no profile word occurs.
    */
  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(text))
    val scores = langProfiles.map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Stable 64-bit document fingerprint (native rolling-hash expression). */
  def fingerprint(text: Column): Column = fingerprint64(text)

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
