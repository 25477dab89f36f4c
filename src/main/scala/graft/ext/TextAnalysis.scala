package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Text analysis for LLM-data pipelines (SURVEY.md §2.5): language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions (codegen'd, no UDFs), with arithmetic chosen to be
  * bit-reproducible in any engine (integer counts, md5, double division).
  */
object TextAnalysis {

  /** Stable document fingerprint: md5 of whitespace-collapsed normalized
    * text — the exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(TextOps.normalize(text), "\\s+", " ")).cast("binary"))

  /** Rolling (Rabin–Karp) fingerprint of the raw text bytes — the
    * incremental alternative to the md5 fingerprint: appending bytes
    * extends the hash without rehashing, which streaming ingest needs.
    * Native codegen'd loop; engine-reproducible (overflow-free int64
    * recurrence mod 2³¹−1). */
  def rollingFingerprint(text: Column): Column =
    graft.functions.RollingHash.rollingHash(text)

  /** Whitespace token count (reference map.py token semantics). */
  def nTokens(text: Column): Column = TextOps.tokenCount(text)

  /** BPE-ish piece count: maximal alphanumeric runs plus isolated
    * non-space symbols (explicit ASCII classes so every regex engine
    * agrees). */
  def nPieces(text: Column): Column =
    regexp_count(lower(text), lit("[a-z0-9_]+|[^a-z0-9_\\s]"))

  private val stopwords =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "for", "on", "with")

  /** Fraction of tokens that are stopwords, over a precomputed token
    * array. Tokenization is the expensive step (a regex pass over the
    * raw text) and Catalyst does not share it across consumers —
    * pipelines deriving several metrics should project
    * `TextOps.tokens(text)` ONCE and feed the `*FromTokens` variants. */
  def stopwordRatioFromTokens(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      size(filter(toks, t => t.isInCollection(stopwords))).cast("double") / size(toks))

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column =
    stopwordRatioFromTokens(TextOps.tokens(text))

  /** Mean token length over a precomputed token array. */
  def meanTokenLenFromTokens(toks: Column): Column =
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") / size(toks))

  /** Mean token length (character count over token count). */
  def meanTokenLen(text: Column): Column =
    meanTokenLenFromTokens(TextOps.tokens(text))

  /** Punctuation density over raw characters. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      regexp_count(text, lit("\\p{Punct}")).cast("double") / length(text))

  /** Composite quality score in [0,1]-ish: favors mid-length documents
    * with some stopword structure and little punctuation noise. Pure
    * arithmetic on deterministic terms. */
  def qualityScore(text: Column): Column = {
    val nt = nTokens(text).cast("double")
    val lenTerm = least(nt / 100.0, lit(1.0))
    lenTerm * 0.5 + stopwordRatio(text) * 0.3 + (lit(1.0) - punctRatio(text)) * 0.2
  }

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "nicht", "ist"),
    "en" -> Seq("the", "a", "of", "to", "and", "is"),
    "es" -> Seq("el", "la", "los", "que", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que"))

  /** Marker-count score for one language over a precomputed token
    * array. */
  def langScoreFromTokens(toks: Column, lang: String): Column = {
    val markers = langMarkers.toMap.apply(lang)
    size(filter(toks, t => t.isInCollection(markers)))
  }

  /** Marker-count score for one language. */
  def langScore(text: Column, lang: String): Column =
    langScoreFromTokens(TextOps.tokens(text), lang)

  /** n-gram-heuristic language ID over a precomputed token array:
    * argmax marker count, alphabetical tie-break, "und" (undetermined)
    * when nothing matches. Four cheap array scans instead of four
    * regex tokenizations when `toks` is a projected column. */
  def langIdFromTokens(toks: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScoreFromTokens(toks, l) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((l, s), acc) =>
      when(s === best && s > 0, lit(l)).otherwise(acc)
    }
  }

  /** n-gram-heuristic language ID of raw text (single-metric use; see
    * `langIdFromTokens` for multi-metric pipelines). */
  def langId(text: Column): Column = langIdFromTokens(TextOps.tokens(text))
}
