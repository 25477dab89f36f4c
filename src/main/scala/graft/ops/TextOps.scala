package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text normalization + tokenization with the exact semantics of the
  * reference's canonical map UDF (`w7/src/python/map.py:9-18`):
  * lowercase → every punctuation char → space → split on spaces → drop
  * empty tokens. Implemented purely with codegen'd built-in expressions
  * (no UDFs) so the whole pipeline stays inside whole-stage codegen.
  *
  * Java's `\p{Punct}` is exactly Python's `string.punctuation`
  * (the 32 ASCII punctuation chars), so `regexp_replace(lower(x),
  * "\\p{Punct}", " ")` reproduces `str.translate` at `map.py:11-13`.
  */
object TextOps {

  /** Document-length cap (characters) applied by `normalize`, and
    * therefore by every tokenize/shingle/MinHash/n-gram kernel built on
    * it: per-row scratch (token arrays, shingle hash sets, signature
    * inputs) is O(cap), never O(document), so one pathological 100 MB
    * document in a 100 TB crawl cannot become a straggler row or an
    * executor OOM. 1 MiB of characters is ~150–250k tokens — far past
    * any sane training document; production pipelines truncate at a
    * length cap (C4/Gopher-style) rather than chunk for dedup purposes.
    * The DuckDB oracles replay tokenization uncapped: the test corpora
    * sit orders of magnitude below the cap, so capped == uncapped there
    * by construction, and the cap is a documented policy divergence for
    * pathological inputs only. */
  val maxDocChars: Int = 1 << 20

  /** lowercase + punctuation→space (map.py:9-13), after the
    * `maxDocChars` truncation policy. */
  def normalize(c: Column): Column =
    regexp_replace(lower(substring(c, 1, maxDocChars)), "\\p{Punct}", " ")

  /** Array of non-empty tokens (map.py:16-18 skips empty words). */
  def tokens(c: Column): Column =
    filter(split(normalize(c), " "), t => length(t) > 0)

  /** Number of non-empty whitespace tokens — cheap token counting for
    * pipeline budgeting (ext surface). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** One output row per token of `text` — the map phase of word count
    * (D4 in SURVEY.md §2.1). */
  def explodeWords(df: DataFrame, text: Column): DataFrame =
    df.select(explode(split(normalize(text), " ")).as("word"))
      .where(length(col("word")) > 0)

  /** The reference's one shipped end-to-end query: word count
    * (`w7/src/python/map.py` + `w7/src/python/reduce.py`). Partial
    * aggregation (the reference's in-UDF combiner, map.py:16-22) is
    * automatic under HashAggregateExec. */
  def wordCount(df: DataFrame, text: Column): DataFrame =
    explodeWords(df, text).groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Character n-gram shingles of normalized text (for MinHash / Jaccard
    * dedup — extension surface, SURVEY.md §2.5). */
  def charShingles(c: Column, n: Int): Column = {
    val s = regexp_replace(normalize(c), "\\s+", " ")
    // transform over 0..len-n producing substrings; empty when too short
    filter(
      transform(
        sequence(lit(0), greatest(length(s) - n, lit(0))),
        i => substring(s, lit(1) + i, lit(n))),
      g => length(g) === n)
  }

  /** Word n-grams over an ALREADY-PROJECTED token array column.
    *
    * The column MUST be a projected token array (`.as("tk")` first),
    * not a raw `tokens(text)` expression: higher-order functions are
    * interpreted, and an expression referenced inside the lambda body
    * is RE-EVALUATED per lambda call — a tokenize expression there
    * re-runs the whole regex tokenization once per gram, O(doc²) per
    * document (profiled as 500 µs/gram; a bound column reference is
    * nanoseconds). Construction yields exactly size−n+1 full-length
    * grams when size ≥ n, so no post-filter is needed; the guard
    * covers short docs (slicing an empty array would yield a bogus
    * [""] singleton for n = 1). */
  def wordNgramsFromTokens(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>")).otherwise(
      transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))

  /** Word n-grams of normalized text. Convenience form for single-use
    * contexts (tests, small relations): the tokenization inside the
    * lambda re-runs per gram — hot paths must project the token array
    * and use `wordNgramsFromTokens`. */
  def wordNgrams(c: Column, n: Int): Column =
    wordNgramsFromTokens(tokens(c), n)
}
