package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  private[graft] val stopwords =
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

  /** Composite quality score over a precomputed token array (the raw
    * text is still needed for the punctuation term). Multi-metric
    * pipelines that already project `tokens(text)` save two full
    * regex tokenizations per row vs the raw-text form. */
  def qualityScoreFromTokens(text: Column, toks: Column): Column = {
    val nt = size(toks).cast("double")
    val lenTerm = least(nt / 100.0, lit(1.0))
    lenTerm * 0.5 + stopwordRatioFromTokens(toks) * 0.3 +
      (lit(1.0) - punctRatio(text)) * 0.2
  }

  /** Composite quality score in [0,1]-ish: favors mid-length documents
    * with some stopword structure and little punctuation noise. Pure
    * arithmetic on deterministic terms. */
  def qualityScore(text: Column): Column =
    qualityScoreFromTokens(text, TextOps.tokens(text))

  /** Marker word lists per language — `private[graft]` so the DuckDB
    * oracle generator derives its langid SQL from the SAME list
    * (adding a language or marker re-derives every langid oracle
    * instead of silently desyncing it). */
  private[graft] val langMarkers: Seq[(String, Seq[String])] = Seq(
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

  /** Per-document duplicated-window statistics (Lee et al. 2022
    * substring dedup): n_grams 8-token windows, n_dup of them occurring
    * ≥ 2 times in the whole corpus, dup_permille = 1000·n_dup/n_grams.
    * Map-only gram extraction over a PROJECTED token array (HOF lambdas
    * re-evaluate unprojected expressions per gram — the O(doc²) trap),
    * grams shuffled as 60-bit md5-derived longs (4× fewer bytes than
    * the raw ~50-char strings), one occurrence-count hash agg, one
    * gram-keyed scoring join (heavy-tailed, AQE-skew-safe). The tiny
    * ids+hashes relation feeds two consumers and is cached for the
    * query's lifetime (Verify/Bench clear per query). */
  def dupNgramStats(docs: DataFrame, idCol: String, textCol: String, n: Int = 8): DataFrame = {
    val grams = graft.util.Par.widen(docs)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
      .select(col(idCol), explode(TextOps.wordNgramsFromTokens(col("tk"), n)).as("g"))
      .select(col(idCol),
        conv(substring(md5(col("g").cast("binary")), 1, 15), 16, 10).cast("long").as("h"))
      .cache()
    val counts = grams.groupBy("h").agg(count(lit(1)).as("n_occ"))
    grams.join(counts, "h")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("n_occ") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_permille", expr("(n_dup * 1000) div n_grams"))
  }

  /** First-occurrence novelty per document: the share of a document's
    * DISTINCT n-grams whose corpus-wide first owner (minimum id — ids
    * are ingestion order by contract) is this document. The data-value
    * signal behind first-occurrence credit: a crawl re-scrape scores
    * near 0 (every gram already owned upstream), genuinely new content
    * near 1000 — the per-doc complement of `dupNgramStats`' corpus-wide
    * duplication score, and the batch form of what the incremental
    * ingest screen decides one batch at a time.
    *
    * Scale shape: the distinct (id, gram-hash) relation pays one
    * exchange; the min-owner agg keys by gram hash and map-side
    * combines; the join back is co-partitioned on the same hash (no
    * third data shuffle); the per-doc rollup is a partial-aggregated
    * count pair. All linear in gram count — the `dupNgramStats`
    * envelope with a min instead of a count. */
  def noveltyStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8,
      scope: graft.util.CacheScope = new graft.util.CacheScope): DataFrame = {
    // consumed twice (min-owner agg + join back): cached past the
    // distinct so the corpus tokenizes once — the dupNgramStats rule;
    // lifecycle owned by the caller's CacheScope like the sibling ops
    val grams = scope.cache(graft.util.Par.widen(docs)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
      .select(col(idCol), explode(TextOps.wordNgramsFromTokens(col("tk"), n)).as("g"))
      .select(col(idCol),
        conv(substring(md5(col("g").cast("binary")), 1, 15), 16, 10).cast("long").as("h"))
      .distinct())
    val firstOwner = grams.groupBy("h").agg(min(col(idCol)).as("__first"))
    grams.join(firstOwner, "h")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col(idCol), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_permille", expr("(n_novel * 1000) div n_grams"))
  }

  /** Duplicate-SPAN removal — the operational half of Lee et al. 2022
    * substring dedup that `dupNgramStats` only scores: rewrite each
    * document with every token covered by a corpus-duplicated n-token
    * window (a window occurring ≥ 2× across the whole corpus) removed.
    * Returns (id, n_tokens, n_removed, stripped_md5) — the rewritten
    * text travels as its md5 so the cross-engine compare stays scalar.
    *
    * Dataflow: tokenize once (cached — consumed by gram extraction and
    * the final rewrite), extract every window WITH its start position
    * (map-only explode), count occurrences of the 60-bit md5 gram hash
    * corpus-wide (one hash agg — the same gram relation dupNgramStats
    * shuffles), and ship each doc ONLY its duplicated-window start
    * list (the contaminated sliver, not the gram universe) back
    * through a groupBy + left join. The rewrite itself is a per-row
    * array filter: token i survives iff no duplicated window starts in
    * (i−n, i] — O(len·|dup starts|) per doc, zero additional shuffle.
    * At 100 TB: two gram-keyed exchanges (count + start-list) and a
    * map-only rewrite — the same shape as dupNgramStats plus a
    * doc-keyed join of the (sparse) removal lists. */
  def stripDupSpans(docs: DataFrame, idCol: String, textCol: String, n: Int = 8): DataFrame =
    stripDupSpansKept(docs, idCol, textCol, n)
      .select(col(idCol),
        size(col("tk")).cast("long").as("n_tokens"),
        (size(col("tk")) - size(col("kept"))).cast("long").as("n_removed"),
        md5(array_join(col("kept"), " ").cast("binary")).as("stripped_md5"))

  /** The rewrite half of `stripDupSpans` with the surviving token
    * array exposed: (id, tk, kept) — the spec's invariant checks run
    * on `kept` directly. */
  private[graft] def stripDupSpansKept(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = graft.util.Par.widen(docs)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
      .cache()
    val grams = posGramHashes(toks, idCol, n).cache()
    val dup = grams.groupBy("h").agg(count(lit(1)).as("n_occ"))
      .where(col("n_occ") >= 2)
      .select("h")
    val starts = grams.join(dup, "h")
      .groupBy(idCol)
      .agg(sort_array(collect_list(col("pos"))).as("starts"))
    rewriteByStarts(toks, starts, idCol, n)
  }

  /** Positional n-gram 60-bit hashes off a pre-tokenized (id, tk)
    * relation: (id, pos, h) — one row per window start. */
  private def posGramHashes(toks: DataFrame, idCol: String, n: Int): DataFrame =
    toks
      .select(col(idCol), posexplode(TextOps.wordNgramsFromTokens(col("tk"), n)))
      .select(col(idCol), col("pos"),
        conv(substring(md5(col("col").cast("binary")), 1, 15), 16, 10).cast("long").as("h"))

  /** Rewrite each doc's token array against its duplicated-window
    * start list: token i survives iff no start s has s ≤ i < s+n.
    * Per-row array filter — zero additional shuffle. */
  private def rewriteByStarts(
      toks: DataFrame, starts: DataFrame, idCol: String, n: Int): DataFrame =
    toks.join(starts, Seq(idCol), "left")
      .select(col(idCol), col("tk"),
        coalesce(col("starts"), array().cast("array<int>")).as("starts"))
      .withColumn("kept", transform(
        filter(
          transform(col("tk"), (t, i) => struct(t.as("t"), i.as("i"))),
          p => !exists(col("starts"),
            s => p.getField("i") >= s && p.getField("i") < s + n)),
        p => p.getField("t")))
      .select(col(idCol), col("tk"), col("kept"))

  /** Duplicate-span removal, KEEP-FIRST policy — ExactSubstr dedup as
    * published (Lee et al. 2022 keep ONE copy of each duplicated
    * substring; `stripDupSpans` is the strip-ALL-copies scrub): a
    * corpus-duplicated n-token window is removed from every occurrence
    * EXCEPT its corpus-wide first — min (id, pos) order — so the
    * content survives exactly once in the corpus. Returns
    * (id, n_tokens, n_removed, deduped_md5).
    *
    * The canonical occurrence travels as one packed long
    * ord = id·2^20 + pos (contract: < 2^20 tokens per document — the
    * fixture max is a few hundred; wider docs need a wider pack), so
    * picking it is a plain `min` with no cross-engine struct-ordering
    * semantics to keep aligned. Dataflow = `stripDupSpans` plus one
    * packed column on the same two gram-keyed exchanges: count+argmin
    * hash agg, occurrence-filter join (ord ≠ first_ord), doc-keyed
    * start-list fold, map-only rewrite. The guarantee is positional:
    * the first occurrence's WINDOW never enters a removal list, but an
    * overlapping distinct duplicated window can still remove tokens
    * inside it — the same span-union behavior as the reference
    * algorithm. At 100 TB the shape is stripDupSpans': two gram-keyed
    * shuffles of 60-bit hashes and a sparse start-list join; nothing
    * is broadcast, nothing is collected. */
  def dedupSpansKeepFirst(
      docs: DataFrame, idCol: String, textCol: String, n: Int = 8): DataFrame =
    dedupSpansKeepFirstKept(docs, idCol, textCol, n)
      .select(col(idCol),
        size(col("tk")).cast("long").as("n_tokens"),
        (size(col("tk")) - size(col("kept"))).cast("long").as("n_removed"),
        md5(array_join(col("kept"), " ").cast("binary")).as("deduped_md5"))

  /** The rewrite half of `dedupSpansKeepFirst` with the surviving
    * token array exposed: (id, tk, kept) — specs assert the keep-first
    * ⊇ strip-all survivor relation on `kept` directly. */
  private[graft] def dedupSpansKeepFirstKept(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = graft.util.Par.widen(docs)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
      .cache()
    val grams = posGramHashes(toks, idCol, n)
      .withColumn("ord", col(idCol).cast("long") * lit(1L << 20) + col("pos"))
      .cache()
    val firsts = grams.groupBy("h")
      .agg(count(lit(1)).as("n_occ"), min(col("ord")).as("first_ord"))
      .where(col("n_occ") >= 2)
      .select("h", "first_ord")
    val starts = grams.join(firsts, "h")
      .where(col("ord") =!= col("first_ord"))
      .groupBy(idCol)
      .agg(sort_array(collect_list(col("pos"))).as("starts"))
    rewriteByStarts(toks, starts, idCol, n)
  }

  /** Contamination SURGERY — the operational completion of the decon
    * family: `contaminationScreen` flags docs sharing any word n-gram
    * with a held-out benchmark, this rewrites them with every token
    * covered by a benchmark-shared n-token window REMOVED, keeping the
    * rest of the document (the right call when eval overlap is a
    * quoted snippet inside an otherwise-clean doc — dropping the whole
    * doc throws away good tokens, keeping it verbatim leaks the
    * benchmark). Returns (id, n_tokens, n_removed, stripped_md5).
    *
    * Dataflow is `stripDupSpans` with the hot-gram source swapped: the
    * benchmark's DISTINCT gram hashes (eval-set-sized by contract) are
    * BROADCAST, so unlike the corpus-duplicated form there is no
    * corpus-wide gram count — the corpus grams never shuffle at all;
    * only contaminated docs' start lists cross the doc-keyed exchange,
    * and the rewrite is the same map-only array filter. At 100 TB:
    * one scan + one sparse doc-keyed shuffle, the same budget as the
    * screen. */
  def decontaminateStrip(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5): DataFrame = {
    val toks = graft.util.Par.widen(corpus)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
      .cache()
    val benchHashes = bench
      .select(explode(
        TextOps.wordNgramsFromTokens(TextOps.tokens(col(textCol)), n)).as("g"))
      .select(conv(substring(md5(col("g").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .distinct()
    val starts = posGramHashes(toks, idCol, n)
      .join(broadcast(benchHashes), "h")
      .groupBy(idCol)
      .agg(sort_array(collect_list(col("pos"))).as("starts"))
    rewriteByStarts(toks, starts, idCol, n)
      .select(col(idCol),
        size(col("tk")).cast("long").as("n_tokens"),
        (size(col("tk")) - size(col("kept"))).cast("long").as("n_removed"),
        md5(array_join(col("kept"), " ").cast("binary")).as("stripped_md5"))
  }

  /** Per-SOURCE boilerplate removal — the intra-site template scrub of
    * the RefinedWeb/CCNet lineage, distinct from both duplicate-span
    * families: `stripDupSpans` keys on absolute corpus-wide occurrence
    * counts (≥ 2 anywhere), which catches plagiarism but also unique
    * cross-source quotes; a site template (nav text, footers, cookie
    * banners) is instead a window that recurs across a large FRACTION
    * of one source's documents. A window is boilerplate for source s
    * iff it appears in ≥ max(2, ceil(pct·n_docs(s)/100)) DISTINCT
    * documents of s (distinct docs, not occurrences — a doc repeating
    * its own phrase is `repetitionStats`' business, not a template);
    * every token covered by a boilerplate window is removed and the
    * doc rewritten. Returns (id, n_tokens, n_removed, stripped_md5).
    *
    * Scale shape: the hot set is found from per-doc-DISTINCT gram
    * hashes (map-side `array_distinct`, so the (source, h) count agg
    * counts documents without a count-distinct shuffle), and is
    * template-sized by contract — so it BROADCASTS, and the corpus's
    * positional grams never shuffle at all (the decontaminateStrip
    * discipline, with the hot set corpus-derived instead of
    * benchmark-supplied). Only contaminated docs' start lists cross
    * the doc-keyed exchange; the rewrite is the same map-only array
    * filter as every span scrub. The relative threshold keeps the
    * definition scale-invariant: inflating a source 64× leaves its
    * boilerplate set fixed. */
  def stripBoilerplate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      n: Int = 4,
      pctOfDocs: Int = 5): DataFrame = {
    require(pctOfDocs >= 1 && pctOfDocs <= 100,
      s"pctOfDocs must be in [1, 100], got $pctOfDocs")
    val toks = graft.util.Par.widen(docs)
      .select(col(idCol), col(sourceCol), TextOps.tokens(col(textCol)).as("tk"))
      .cache()
    val srcN = docs.groupBy(col(sourceCol)).agg(count(lit(1)).as("n_docs"))
    val gramHash = (g: Column) =>
      conv(substring(md5(g.cast("binary")), 1, 15), 16, 10).cast("long")
    val docGrams = toks
      .select(col(sourceCol), col(idCol),
        explode(array_distinct(transform(
          TextOps.wordNgramsFromTokens(col("tk"), n), gramHash))).as("h"))
    val hot = docGrams.groupBy(col(sourceCol), col("h"))
      .agg(count(lit(1)).as("n_docs_g"))
      .join(broadcast(srcN), sourceCol)
      .where(col("n_docs_g") >=
        greatest(lit(2L), expr(s"($pctOfDocs * n_docs + 99) div 100")))
      .select(col(sourceCol), col("h"))
    val starts = toks
      .select(col(idCol), col(sourceCol),
        posexplode(TextOps.wordNgramsFromTokens(col("tk"), n)))
      .select(col(idCol), col(sourceCol), col("pos"), gramHash(col("col")).as("h"))
      .join(broadcast(hot), Seq(sourceCol, "h"))
      .groupBy(idCol)
      .agg(sort_array(collect_list(col("pos"))).as("starts"))
    rewriteByStarts(toks.select(col(idCol), col("tk")), starts, idCol, n)
      .select(col(idCol),
        size(col("tk")).cast("long").as("n_tokens"),
        (size(col("tk")) - size(col("kept"))).cast("long").as("n_removed"),
        md5(array_join(col("kept"), " ").cast("binary")).as("stripped_md5"))
  }

  // Patterns chosen to mean the same thing in Java regex and RE2 —
  // character classes and bounded quantifiers only, no lookarounds
  private val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val longDigitsRe = "[0-9][0-9 -]{5,}[0-9]"

  /** PII-style scrub (the standard pre-training redaction pass):
    * e-mail addresses and long digit runs (phone/account/card shapes)
    * replaced with fixed tags. Map-only, shuffle-free — at 100 TB this
    * is a pure scan that fuses into whatever projection follows. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailRe, "<EMAIL>"),
      longDigitsRe, "<NUMBER>")

  /** How many of each PII shape a document carries — the audit metric
    * next to the scrub. */
  def piiCounts(text: Column): (Column, Column) =
    (regexp_count(text, lit(emailRe)), regexp_count(text, lit(longDigitsRe)))

  /** Gopher-style repetition quality signals (Rae et al. 2021,
    * "Scaling Language Models: ... Gopher" repetition filters), the
    * within-document complement of the corpus-wide `dupNgramStats`:
    *
    *   - top_word_permille: characters under the most frequent token
    *     (count × length, ties by token string) per mille of all
    *     token characters — boilerplate keyword spam;
    *   - top_bigram_permille: same for the most frequent word bigram
    *     — templated phrase spam;
    *   - dup_word_permille: tokens whose token occurs ≥ 2× in the doc
    *     per mille of all tokens — low lexical diversity.
    *
    * All integer per-mille arithmetic (truncating div), argmaxes
    * tie-broken by token string, so any engine reproduces the bytes.
    * Dataflow: one (doc, token)-keyed and one (doc, bigram)-keyed
    * count agg (both partial-aggregated), folded to per-doc stats —
    * the wordcount shape twice, no corpus-wide state at all. Docs
    * with < 2 tokens report bigram 0. */
  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = graft.util.Par.widen(docs)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) > 0)
      .cache()
    val wc = toks.select(col(idCol), explode(col("tk")).as("w"))
      .groupBy(idCol, "w").agg(count(lit(1)).as("c"))
    // min_by over (−count, token): largest count, smallest token on
    // ties — the id-broken-argmax pattern, string edition
    val wstats = wc.groupBy(idCol).agg(
      sum(col("c")).as("n_tokens"),
      sum(col("c") * length(col("w"))).as("n_chars"),
      min_by(col("c") * length(col("w")),
        struct((col("c") * -1).as("nc"), col("w"))).as("top_word_chars"),
      sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("dup_tokens"))
    val bc = toks.where(size(col("tk")) >= 2)
      .select(col(idCol), explode(bigrams(col("tk"))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .groupBy(idCol, "w1", "w2").agg(count(lit(1)).as("c"))
    val bstats = bc.groupBy(idCol).agg(
      min_by(col("c") * (length(col("w1")) + length(col("w2"))),
        struct((col("c") * -1).as("nc"), col("w1"), col("w2"))).as("top_bigram_chars"))
    wstats.join(bstats, Seq(idCol), "left")
      .select(col(idCol),
        expr("(1000 * top_word_chars) div n_chars").as("top_word_permille"),
        expr("(1000 * coalesce(top_bigram_chars, 0)) div n_chars").as("top_bigram_permille"),
        expr("(1000 * dup_tokens) div n_tokens").as("dup_word_permille"))
  }

  /** Adjacent token pairs of a token array — map-only (two slices
    * zipped), never the self-join-on-position a naive bigram
    * extraction would shuffle for. */
  def bigrams(toks: Column): Column =
    zip_with(
      slice(toks, lit(1), size(toks) - 1),
      slice(toks, lit(2), size(toks) - 1),
      (a, b) => struct(a.as("w1"), b.as("w2")))

  /** Bigram language-model quality score — the CCNet-style "perplexity
    * under a corpus LM" filter, with the LM trained on the corpus
    * itself in the same job (the reference's chaining pattern: two
    * wordcount-shaped aggregations feeding a scoring join,
    * `w6/docs/design.md:74`).
    *
    * score(doc) = mean over its bigrams of p(w2|w1), with
    * p = count(w1,w2)/count(w1,·) kept in EXACT integer arithmetic
    * (scaled by 10⁶, floor division) so any engine reproduces the
    * bytes — a float log-prob would drift in the last ulp across
    * engines. Monotone in the geometric-mean-free LM quality signal:
    * repeated boilerplate scores high, unseen-continuation soup scores
    * low.
    *
    * Scale shape: bigram extraction is map-only; the model is two
    * hash aggregations (partial combine on both); scoring is an
    * equi-join of instances against the (much smaller, heavy-tailed —
    * AQE-skew-safe) stats relations; the per-doc mean is one more
    * hash agg. No driver state, no broadcast of the (unbounded)
    * vocabulary. */
  /** Benchmark-decontamination screen — the train/test-overlap check
    * every published pre-training pipeline runs before training: flag
    * corpus documents that share any word-n-gram with a held-out
    * benchmark set, with the distinct-shared-gram count as the
    * severity signal (verbatim contamination shares most of a doc's
    * grams; chance overlap shares one or two).
    *
    * Grams travel as the native 44-bit md5 shingle hashes
    * (`ShingleMd5Hashes` — one primitive pass per doc, per-doc
    * distinct), so the benchmark side reduces to a distinct hash SET.
    * Scale shape: benchmarks are tiny next to a 100 TB corpus, so the
    * bench hashes are BROADCAST and the corpus side never shuffles its
    * grams — the only exchange is the per-doc hit count (≤ 1 row per
    * doc per partition after partial agg, and only for docs with ≥ 1
    * hit). A corpus-side groupBy of raw grams would shuffle the whole
    * corpus; this shuffles the contaminated sliver. */
  def contaminationScreen(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 5): DataFrame = {
    def grams(df: DataFrame) = graft.util.Par.widen(df).select(
      col(idCol),
      explode(graft.functions.ShingleMd5Hashes.shingleMd5(
        TextOps.tokens(col(textCol)), n)).as("h"))
    val benchHashes = grams(bench).select("h").distinct()
    grams(corpus)
      .join(broadcast(benchHashes), "h")
      // per-doc hashes are already distinct (ShingleMd5Hashes dedups),
      // so this count IS the distinct shared-gram count
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Multi-benchmark contamination ATTRIBUTION — the provenance form
    * of [[contaminationScreen]]: a production pipeline screens against
    * MANY eval sets at once and needs to know WHICH benchmark each
    * flagged doc leaks (a doc contaminating GSM8K gets handled
    * differently from one grazing a translation set). Per (doc,
    * benchmark): the count of distinct word n-grams the doc shares
    * with that benchmark. A gram present in several benchmarks counts
    * toward each — attribution, not global dedup of the hit.
    *
    * Scale shape: identical to the single-set screen — the (bench, h)
    * relation is eval-set-sized by contract and broadcast, corpus
    * grams never shuffle, and only per-(doc, bench) hit counts (the
    * contaminated sliver × benchmark fan-out) reach the aggregation.
    * Clean docs die at the broadcast join. */
  def contaminationAttribution(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      benchCol: String,
      n: Int = 5): DataFrame = {
    def grams(df: DataFrame, key: Column, keyName: String) = graft.util.Par.widen(df).select(
      key.as(keyName),
      explode(graft.functions.ShingleMd5Hashes.shingleMd5(
        TextOps.tokens(col(textCol)), n)).as("h"))
    val benchHashes = grams(bench, col(benchCol), "bench").distinct()
    grams(corpus, col(idCol), idCol)
      .join(broadcast(benchHashes), "h")
      // per-doc hashes are distinct (ShingleMd5Hashes dedups) and the
      // bench side is (bench, h)-distinct, so this count IS the
      // distinct shared-gram count per (doc, benchmark)
      .groupBy(idCol, "bench")
      .agg(count(lit(1)).as("n_hits"))
  }

  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // the (id, w1, w2) relation feeds three consumers (pair counts,
    // prefix counts via c2, and the scoring join) — cache it or the
    // corpus is re-tokenized and re-grammed per consumer (the same
    // multi-consumer rule as dupNgramStats; Verify/Bench clear per
    // query)
    val bg = graft.util.Par.widen(docs)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col(idCol), explode(bigrams(col("tk"))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .cache()
    val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
    val c1 = c2.groupBy("w1").agg(sum("n2").as("n1"))
    bg.join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .select(col(idCol), expr("(n2 * 1000000) div n1").as("s"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        expr("sum(s) div count(1)").cast("long").as("lm_score"))
  }

  /** Collocation mining — the multiword-expression signal tokenizer
    * and vocabulary curation runs over a corpus (Church & Hanks' lift
    * over adjacent pairs): the top-k bigrams by pointwise lift
    * `P(w1,w2) / (P(w1 as prefix)·P(w2 as suffix))` over the bigram
    * event stream, with a support floor so one-off juxtapositions
    * can't claim infinite lift. The score is the EXACT integer
    * `(n₂·N·10⁶) div (n₁·n₂ᵇ)` with the products carried in
    * DECIMAL(38,0) (int64 would overflow at corpus scale) and ONE
    * floor division at the end — log-free, so lift ORDER is exactly
    * PMI order and any engine replays the bytes.
    *
    * Scale shape: the bigram extraction is map-only (`bigrams`), the
    * three marginals are hash aggregations off ONE cached pair-count
    * relation (prefix and suffix marginals re-aggregate the counts,
    * never the corpus; the total crosses as a broadcast 1-row agg),
    * scoring joins the count relation against its own two marginals —
    * vocabulary-sized, heavy-tailed, AQE-skew-safe — and the ranking
    * is a TakeOrdered top-k, ≤ k rows per partition. */
  def collocations(
      docs: DataFrame,
      textCol: String,
      k: Int = 30,
      minSup: Long = 10L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && minSup > 0, s"need k > 0 and minSup > 0, got $k/$minSup")
    val c2 = graft.util.Par.widen(docs)
      .select(TextOps.tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(explode(bigrams(col("tk"))).as("bg"))
      .groupBy(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("n2"))
      .cache()
    val pre = c2.groupBy("w1").agg(sum("n2").as("n1"))
    val suf = c2.groupBy("w2").agg(sum("n2").as("n2b"))
    val tot = c2.agg(sum("n2").as("nb"))
    c2.where(col("n2") >= minSup)
      .join(pre, "w1").join(suf, "w2")
      .crossJoin(broadcast(tot))
      .select(col("w1"), col("w2"), col("n2").as("n_pair"),
        expr("""(CAST(n2 AS DECIMAL(38,0)) * nb * 1000000)
                 div (CAST(n1 AS DECIMAL(38,0)) * n2b)""").as("lift_ppm"))
      .orderBy(desc("lift_ppm"), col("w1"), col("w2"))
      .limit(k)
      .withColumn("rn", row_number()
        .over(Window.orderBy(desc("lift_ppm"), col("w1"), col("w2")))
        .cast("long"))
  }

  /** DSIR-style importance scores (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): score each raw
    * document by how target-like its bigram distribution is. DSIR's
    * log-ratio of hashed-n-gram LMs is reproduced as an exact integer
    * micro-ratio (the bigramLmScore convention — no float log for the
    * cross-engine oracle to drift on): per bigram g,
    * r(g) = ((n_target(g)+1)·10⁶) div (n_corpus(g)+1) (add-one keeps
    * never-in-target grams finite), per doc the mean of r over its
    * bigrams. Target membership is any boolean column expression —
    * "looks like wikipedia", "is English", a quality bit.
    *
    * Scale shape: one map-only bigram pass feeds BOTH distributions
    * (the target count is a conditional sum in the same hash agg —
    * no second scan of the corpus), one gram-keyed scoring join, one
    * per-doc agg. Identical dataflow cost to bigramLmScore. */
  def dsirScores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      scope: graft.util.CacheScope = new graft.util.CacheScope): DataFrame = {
    // cached through the caller's scope (the Dedup-entry-point idiom):
    // the exploded bigram relation is the largest intermediate here and
    // a bare .cache() would accumulate per call in a long-lived session
    val bg = scope.cache(graft.util.Par.widen(docs)
      .select(col(idCol), isTarget.as("tgt"), TextOps.tokens(col(textCol)).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col(idCol), col("tgt"), explode(bigrams(col("tk"))).as("bg"))
      .select(col(idCol), col("tgt"), col("bg.w1").as("w1"), col("bg.w2").as("w2")))
    val stats = bg.groupBy("w1", "w2").agg(
      count(lit(1)).as("n_all"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("n_tgt"))
    bg.join(stats, Seq("w1", "w2"))
      .select(col(idCol), expr("((n_tgt + 1) * 1000000) div (n_all + 1)").as("r"))
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_bigrams"),
        expr("sum(r) div count(1)").cast("long").as("dsir_score"))
  }

  /** CCNet-style per-language quality bucketing (Wenzek et al. 2020):
    * each scored document lands in head/middle/tail (1/2/3) of its
    * language by bigram-LM score. Production CCNet cuts on score
    * THRESHOLDS derived from the corpus distribution, not on per-row
    * ranks — reproduced here exactly: the bucket is a function of
    * (lang, score) alone, computed on the per-language DISTINCT-SCORE
    * histogram (≤ 10⁶ rows per language by score construction), so no
    * per-document global sort ever happens. A document is head when
    * strictly-higher-scored documents are < n/3 of its language, tail
    * when ≥ 2n/3 — ties share a bucket by definition, integer
    * arithmetic end to end.
    *
    * Scale shape: score once (bigramLmScore's two hash-aggs + one
    * join), aggregate the histogram (tiny), window over the histogram
    * (per-lang, bounded), broadcast-join the (lang, score → bucket)
    * map back. The 100 TB cost is the scoring pass; the bucketing
    * itself is O(distinct scores). */
  def ccnetBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = bigramLmScore(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(langCol)), Seq(idCol))
    val hist = scored.groupBy(langCol, "lm_score").agg(count(lit(1)).as("c"))
    val above = Window.partitionBy(langCol).orderBy(col("lm_score").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = hist
      .withColumn("higher", coalesce(sum(col("c")).over(above), lit(0L)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(langCol)))
      .select(col(langCol), col("lm_score"),
        when(col("higher") * 3 < col("n"), 1)
          .when(col("higher") * 3 < col("n") * 2, 2)
          .otherwise(3).as("bucket"))
    scored
      .join(broadcast(buckets), Seq(langCol, "lm_score"))
      .select(col(idCol), col(langCol), col("lm_score"), col("bucket"))
  }

  /** Winnowing geometry, shared with the DuckDB oracle generator so
    * the packing arithmetic cannot desync (the `defaultTrainRounds`
    * precedent). Positions occupy the low `winnowPosBits`; a
    * 40-bit gram hash occupies the high bits, so packed keys stay
    * inside signed int64 (40 + 20 = 60 bits). `maxDocChars` (2²⁰
    * chars) caps tokens at 2¹⁹ — positions always fit. */
  private[graft] val winnowPosBits = 20
  private[graft] val winnowPosMask: Long = (1L << winnowPosBits) - 1
  private[graft] val winnowHashHex = 10 // 40-bit md5-prefix gram hash
  private[graft] val winnowK = 4 // tokens per gram
  private[graft] val winnowW = 4 // grams per winnow window

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS local fingerprinting algorithm): hash
    * every k-token gram, slide a w-gram window, and keep each
    * window's minimum hash (rightmost on ties). Guarantees: any
    * shared token run of ≥ w+k−1 tokens between two documents yields
    * ≥ 1 shared fingerprint, and expected density is 2/(w+1) of the
    * grams — a POSITION-AWARE near-dup family complementing MinHash
    * (whole-doc set resemblance) and SimHash (weighted profile):
    * it localizes WHICH spans overlap, the plagiarism/partial-copy
    * detector the reference's text pipeline has no answer to.
    *
    * Both the (min hash, rightmost position) argmin and the
    * cross-engine replay ride one trick: pack hash and position into
    * a single int64 key h·2²⁰ + (2²⁰−1−pos), so `array_min` IS the
    * argmin with the declared tie-break, in Spark and DuckDB alike —
    * no struct ordering, no window-function tie semantics to match.
    *
    * Scale shape: extraction is MAP-ONLY (tokenize → one-pass native
    * `WinnowKeys` expression: gram-hash + monotonic-deque sliding
    * minima, O(grams) per row, per-row scratch bounded by
    * `maxDocChars`);
    * the only data movement is whatever the consumer does with the
    * emitted (id, pos, h) rows — ~2/(w+1) the size of the gram
    * stream that substring-dedup (`dupNgramStats`) already shuffles
    * at full density. Returns (id, pos, h), pos 1-based gram start. */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = winnowK, w: Int = winnowW): DataFrame =
    graft.util.Par.widen(docs)
      .select(col(idCol),
        explode(graft.functions.WinnowKeys.winnowKeys(
          TextOps.tokens(col(textCol)), k, w, winnowPosBits)).as("key"))
      .select(col(idCol),
        (lit(winnowPosMask) - pmod(col("key"), lit(winnowPosMask + 1))).as("pos"),
        expr(s"key div ${winnowPosMask + 1}").as("h"))

  /** The interpreted higher-order-function formulation `WinnowKeys`
    * replaced — kept as the value-parity witness (`WinnowSpec` asserts
    * set equality per document): md5+conv per gram, then an
    * array_min over every w-slice, then array_distinct. O(grams·w)
    * interpreted lambdas per row — measured at 8.9 s (text_winnow,
    * sf0.1) vs ~1 s native. */
  private[graft] def winnowFingerprintsHof(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = winnowK, w: Int = winnowW): DataFrame = {
    val grams = TextOps.wordNgramsFromTokens(TextOps.tokens(col(textCol)), k)
    val packed = transform(grams, (g, i) =>
      conv(substring(md5(g.cast("binary")), 1, winnowHashHex), 16, 10).cast("long")
        * lit(winnowPosMask + 1)
        + (lit(winnowPosMask) - i.cast("long") - 1L))
    val keys = when(size(col("pk")) === 0, array().cast("array<long>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), greatest(lit(1), size(col("pk")) - (w - 1))),
        i => array_min(slice(col("pk"), i, lit(w))))))
    docs.select(col(idCol), packed.as("pk"))
      .select(col(idCol), explode(keys).as("key"))
      .select(col(idCol),
        (lit(winnowPosMask) - pmod(col("key"), lit(winnowPosMask + 1))).as("pos"),
        expr(s"key div ${winnowPosMask + 1}").as("h"))
  }

  /** Sum of squared byte counts — the higher-order-function reference
    * twin of the native `CharCollision` loop (`R8OpsSpec` asserts
    * equality): O(len·distinct) interpreted lambdas per row vs the
    * native O(len) histogram. ASCII-only strings: the HOF counts
    * CHARACTERS where the native counts bytes — equal exactly when
    * every char is one byte, which is the contract both declare. */
  private[graft] def charSumSqHof(text: Column): Column = {
    val cs = split(text, "")
    aggregate(
      transform(array_distinct(cs), d => {
        val k = size(filter(cs, x => x === d)).cast("long")
        k * k
      }),
      lit(0L), (acc, v) => acc + v)
  }

  /** Per-document integer micro-unit quality score: the SAME three
    * terms as `qualityScore` (length, stopword structure, punctuation
    * noise), each scaled to parts-per-million and truncated
    * independently —
    *   min(nt,100)·5000 + (nsw·300000 div nt) + 200000 − (npunct·200000 div nch)
    * ∈ [0, 10⁶]. The integer form exists for the quantile GATE
    * (`qualityFilterBySource`): a double score is almost surely unique
    * per document, so a distinct-score histogram over it degenerates
    * to a per-doc sort — the integer score collides heavily and keeps
    * the histogram (and the broadcast gate table) small. Emits
    * (id, srcCol, q_micro); all arithmetic truncating int64, so any
    * engine replays it bit-for-bit. */
  def qualityMicroScores(
      docs: DataFrame, idCol: String, textCol: String, srcCol: String): DataFrame =
    graft.util.Par.widen(docs)
      .select(col(idCol), col(srcCol), col(textCol).as("text"),
        TextOps.tokens(col(textCol)).as("tk"))
      .select(col(idCol), col(srcCol),
        size(col("tk")).cast("long").as("nt"),
        size(filter(col("tk"), t => t.isInCollection(stopwords))).cast("long").as("nsw"),
        length(col("text")).cast("long").as("nch"),
        regexp_count(col("text"), lit("\\p{Punct}")).cast("long").as("npunct"))
      .select(col(idCol), col(srcCol),
        (least(col("nt"), lit(100L)) * 5000L
          + when(col("nt") === 0, lit(0L)).otherwise(expr("(nsw * 300000) div nt"))
          + lit(200000L)
          - when(col("nch") === 0, lit(0L)).otherwise(expr("(npunct * 200000) div nch"))
        ).as("q_micro"))

  /** Per-source quality gate: keep each source's top `keepPermille`‰
    * documents by `q_micro`, ties at the cut kept whole. The CCNet
    * histogram discipline (`ccnetBuckets`): thresholds come from a
    * DISTINCT-score cumulative count — one (source, score) hash agg,
    * a window over the BOUNDED histogram (never the documents), and a
    * broadcast join of the surviving (source, score) gate back onto
    * the scored relation. Keep rule, all int64: a score group survives
    * iff strictly-higher-scored docs number < n·keepPermille/1000 —
    * so the kept count is the smallest tie-closed set ≥ the target
    * fraction. The 100 TB cost is the scoring pass; the gate itself
    * is O(distinct scores). */
  def qualityFilterBySource(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      srcCol: String,
      keepPermille: Int = 300): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(keepPermille > 0 && keepPermille <= 1000,
      s"keepPermille must be in (0, 1000], got $keepPermille")
    val scored = qualityMicroScores(docs, idCol, textCol, srcCol)
    val hist = scored.groupBy(srcCol, "q_micro").agg(count(lit(1)).as("c"))
    val above = Window.partitionBy(srcCol).orderBy(col("q_micro").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val gate = hist
      .withColumn("higher", coalesce(sum(col("c")).over(above), lit(0L)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(srcCol)))
      .where(col("higher") * 1000L < col("n") * keepPermille)
      .select(col(srcCol), col("q_micro"))
    scored.join(broadcast(gate), Seq(srcCol, "q_micro"))
      .select(col(idCol), col(srcCol), col("q_micro"))
  }

  /** Per-source percentile normalization of the quality score — the
    * step that makes thresholds COMPARABLE across sources: raw
    * `q_micro` distributions differ per source (a forum corpus and an
    * encyclopedia corpus have different punctuation baselines), so a
    * global cut systematically starves some sources; the percentile
    * rank within each source is the score a mixture policy can
    * threshold uniformly ("keep every source's top 30%" = one
    * predicate on one column). `pctl_permille = (strictly-below ·
    * 1000) div max(n_source − 1, 1)` — ties share a percentile, the
    * per-source max scores 1000, a singleton source scores 0 — all
    * int64, so the rank replays externally.
    *
    * Scale shape: the same histogram discipline as
    * `qualityFilterBySource` — NOT a per-doc rank window (one reducer
    * per source at corpus scale): one (source, score) hash agg, the
    * cumulative window over the BOUNDED distinct-score histogram, and
    * a broadcast join of the (source, score → permille) map back onto
    * the scored relation. The 100 TB cost is the scoring pass. */
  def qualityPercentiles(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      srcCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = qualityMicroScores(docs, idCol, textCol, srcCol)
    val hist = scored.groupBy(srcCol, "q_micro").agg(count(lit(1)).as("c"))
    val below = Window.partitionBy(srcCol).orderBy(col("q_micro"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranks = hist
      .withColumn("below", coalesce(sum(col("c")).over(below), lit(0L)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(srcCol)))
      .select(col(srcCol), col("q_micro"),
        expr("(below * 1000) div greatest(n - 1, 1L)").as("pctl_permille"))
    scored.join(broadcast(ranks), Seq(srcCol, "q_micro"))
      .select(col(idCol), col(srcCol), col("q_micro"), col("pctl_permille"))
  }
}
