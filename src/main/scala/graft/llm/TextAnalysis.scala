package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language-ID, quality scoring, fingerprinting.
  *
  * Everything is a pure `Column` expression built from codegen'd
  * built-ins (no UDFs) — at 100 TB these run inside whole-stage codegen
  * over the document scan with nothing on the driver.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: letter runs, digit runs, and single
    * punctuation marks each count as one token — the usual pre-tokenizer
    * shape for byte-pair encoders. */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]"))

  /** Normalized form used for fingerprinting/dedup: lowercase, collapse
    * whitespace runs, trim. */
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Document fingerprint: md5 of the normalized text (hex string).
    * Stable across engines and shuffle order; used as the exact-dedup
    * key. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Fraction of tokens that appear in `stopwords` (duplicates count —
    * this is a ratio over the token stream, not the vocabulary). The
    * membership count is a custom codegen expression with a shared hash
    * set — `filter(toks, t -> array_contains(...))` evaluates the lambda
    * interpreted per token and rescans the literal array per call. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    graft.functions.F.countTokensIn(toks, stopwords).cast(DoubleType) /
      nullif(size(toks), lit(0)).cast(DoubleType)
  }

  /** Tiny per-language function-word profiles (public knowledge). */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "une", "pas", "avec", "pour"),
    "es" -> Seq("el", "la", "los", "y", "es", "un", "una", "no", "con", "para"))

  /** Language-ID heuristic: argmax of per-language stopword-stream
    * ratios, 'und' when nothing matches. Deterministic tie-break: the
    * profile order above (en > de > fr > es). */
  def languageId(text: Column): Column = {
    val scores = StopwordProfiles.map { case (lang, words) =>
      lang -> stopwordRatio(text, words)
    }
    val anyHit = scores.map(_._2).reduce(_ + _) > 0.0
    val best = scores.tail.foldLeft(
      when(lit(true), struct(scores.head._2.as("s"), lit(scores.head._1).as("l")))) {
      case (acc, (lang, s)) =>
        when(s > acc.getField("s"), struct(s.as("s"), lit(lang).as("l"))).otherwise(acc)
    }
    when(anyHit, best.getField("l")).otherwise(lit("und"))
  }

  /** Winnowing fingerprints of the normalized text (rolling k-byte-gram
    * hashes, window-min selection — the MOSS local-fingerprint scheme):
    * any shared substring of length ≥ w+k-1 between two docs yields at
    * least one shared fingerprint, so partial-overlap/containment dedup
    * becomes an equi-join on exploded fingerprints — md5-style whole-doc
    * fingerprints can't see containment at all. */
  def winnowFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    graft.functions.F.winnow(normalize(text), k, w)

  /** Repetition signals from the open web-corpus filtering canon
    * (duplicate-line fraction, dominant-token fraction): high values
    * flag boilerplate/word-salad documents for removal. */
  def duplicateLineRatio(text: Column): Column = {
    val lines = split(text, "\n")
    (lit(1.0) - size(array_distinct(lines)).cast(DoubleType) /
      nullif(size(lines), lit(0)).cast(DoubleType))
  }

  /** Fraction of the token stream taken by its most frequent token —
    * one codegen pass (graft.functions.MaxTokenFreqRatio). */
  def maxTokenFreqRatio(text: Column): Column =
    graft.functions.F.maxTokenFreqRatio(tokens(text))

  /** Punctuation character ratio. */
  def punctRatio(text: Column): Column =
    regexp_count(text, lit("[^\\p{L}\\p{N}\\s]")).cast(DoubleType) /
      nullif(length(text), lit(0)).cast(DoubleType)

  /** Composite 0–100 quality score from public heuristics: length,
    * stopword density, punctuation density, mean word length. Mirrors the
    * length/punct/stopword-ratio recipe used by open web-corpus filters. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(text).cast(DoubleType) / 500.0, lit(1.0))
    val stopScore = least(stopwordRatio(text, stopwords) * 5.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val meanWordLen =
      length(regexp_replace(text, "\\s+", "")).cast(DoubleType) /
        nullif(tokenCount(text), lit(0)).cast(DoubleType)
    val wordLenScore =
      when(meanWordLen.between(3.0, 10.0), 1.0)
        .when(meanWordLen.isNull, 0.0)
        .otherwise(0.5)
    round(
      lit(100.0) * (lenScore * 0.3 + stopScore * 0.3 + punctScore * 0.2 +
        wordLenScore * 0.2), 2)
  }
}
