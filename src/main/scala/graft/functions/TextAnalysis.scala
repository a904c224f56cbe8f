package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language-ID, and document
  * fingerprinting.
  *
  * Everything is built from Catalyst built-in expressions (split /
  * higher-order functions / regexp), so the whole column graph stays inside
  * WholeStageCodegen — per-row work, no shuffle, linear scale over input
  * splits. No UDFs anywhere.
  *
  * Determinism contract: each function has an exact ANSI-SQL twin used by the
  * DuckDB oracle (SparkEntry.oracleSql) — same tokenizer (single-space
  * split), same marker sets, same arithmetic, same rounding.
  */
object TextAnalysis {

  /** Whitespace tokens, empties dropped (text is single-space separated). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => length(t) > lit(0))

  /** Exact whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-count estimate: ~4 chars/token, the common heuristic
    * for sizing LLM training shards without running a real tokenizer. */
  def bpeTokenEstimate(text: Column): Column =
    ceil(length(text) / lit(4.0)).cast("int")

  /** Count of tokens that appear in a fixed marker vocabulary. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t =>
      array_contains(array(markers.map(lit): _*), t)))

  /** English stopwords used by the quality score (fixed, mirrored in SQL). */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is")

  /** Null-guarded denominator: Spark 4's default ANSI mode turns x/0 into a
    * runtime DIVIDE_BY_ZERO that kills the whole query; a null denominator
    * yields null for just the degenerate row (matching SQL `nullif(d, 0)`
    * in the oracle). */
  private def nonZero(d: Column): Column =
    when(d =!= 0, d)

  /** Ratio of non-alphanumeric, non-space characters (null on empty text). */
  def punctRatio(text: Column): Column =
    round(
      (length(text) - length(regexp_replace(text, "[^a-z0-9 ]", ""))) /
        nonZero(length(text).cast("double")), 4)

  /** Stopword ratio over whitespace tokens (null on zero tokens). */
  def stopwordRatio(text: Column): Column =
    round(markerCount(tokens(text), Stopwords) /
      nonZero(tokenCount(text).cast("double")), 4)

  /** Composite quality score in [0,1]: favors low punctuation noise, a
    * natural stopword rate, and non-trivial length. Weights are fixed and
    * mirrored exactly in the oracle SQL. Null on empty/whitespace text. */
  def qualityScore(text: Column): Column = {
    val punct = (length(text) - length(regexp_replace(text, "[^a-z0-9 ]", ""))) /
      nonZero(length(text).cast("double"))
    val stop = markerCount(tokens(text), Stopwords) /
      nonZero(tokenCount(text).cast("double"))
    val len = least(lit(1.0), tokenCount(text) / lit(100.0))
    round((lit(1.0) - punct) * lit(0.5) + stop * lit(0.3) + len * lit(0.2), 4)
  }

  /** Marker vocabularies per language for the n-gram/marker language-ID
    * heuristic. Fixed sets, mirrored in the oracle SQL. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is"),
    "es" -> Seq("el", "la", "de", "que"),
    "de" -> Seq("der", "die", "und", "das"),
    "fr" -> Seq("le", "les", "et", "une"),
    "zh" -> Seq("的", "是", "不", "在"),
  )

  /** Predicted language: argmax of marker-token counts with a fixed
    * priority order (en > es > de > fr > zh) as tie-break; "unknown" when no
    * marker hits. The CASE chain is replicated verbatim in SQL. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val counts = LangMarkers.map { case (lang, ms) =>
      lang -> markerCount(toks, ms)
    }
    val langs = counts.map(_._1)
    val byLang = counts.toMap
    // en wins ties against all; es against later ones; etc.
    langs.zipWithIndex.foldRight(lit("unknown")) {
      case ((lang, i), elseExpr) =>
        val later = langs.drop(i + 1)
        val cond = later.foldLeft(byLang(lang) > lit(0)) {
          (acc, other) => acc && byLang(lang) >= byLang(other)
        }
        when(cond, lit(lang)).otherwise(elseExpr)
    }
  }

  /** Rolling polynomial fingerprint over the character stream:
    * h = (h*31 + codepoint) mod 1e9+7. Order-sensitive (anagram texts get
    * different prints), cheap, and exactly reproducible in any engine —
    * the SQL twin uses list_reduce over the same codepoints. */
  val FingerprintMod = 1000000007L

  def fingerprint(text: Column): Column =
    aggregate(
      transform(filter(split(text, ""), ch => length(ch) > lit(0)),
        ch => ascii(ch).cast("long")),
      lit(0L),
      (h, x) => (h * lit(31L) + x) % lit(FingerprintMod))
}
