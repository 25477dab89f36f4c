package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Keyword retrieval over the corpus — the inverted-index-shaped
  * capability a training-data pipeline leans on for targeted corpus
  * inspection, contamination triage, and eval-set curation (find every
  * document about X). The reference's grep query (`w7/client.sh`
  * `--query grep`) is the membership half of this; ranking is the part
  * a corpus-scale user actually needs.
  *
  * Scoring is BM25-SHAPED but all-integer so the DuckDB oracle replays
  * it bit-for-bit (the same reason `text_lm_score` retrains its LM in
  * scaled integers): the two float inputs of real BM25 are replaced by
  * deterministic integer twins with the same monotonic behavior —
  *  - idf: `ln((N-df+.5)/(df+.5))` → `floor(log2(2N/df))`, computed as
  *    `length(bin(2N div df)) - 1`; both engines print identical binary
  *    strings for BIGINT, so the weight replays with zero float risk.
  *    Rare terms still dominate (weight grows one unit per halving of
  *    df) and terms in more than half the corpus bottom out at 1.
  *  - tf saturation + length norm: `tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl))`
  *    in per-mille floor arithmetic (k1 = 1.2, b = 0.75 as
  *    `k1X1000`/`bX1000`), `dl/avgdl` as `dl·N div Σdl`.
  *
  * Scale shape (the point): the query terms are a FIXED tiny set, so
  *  - per-doc tf columns are map-only `size(filter(tokens, = term))`
  *    expressions — the 100 TB corpus side never shuffles tokens, never
  *    builds a posting list, never explodes a row;
  *  - corpus statistics (N, Σdl, per-term df) are ONE partially
  *    aggregated 1-row relation, broadcast back for scoring;
  *  - the final ranking is top-k by (score, id) — TakeOrderedAndProject,
  *    ≤ k rows per partition cross to the driver-side merge, never a
  *    global sort.
  * So the whole query is two passes over the corpus with O(terms)
  * shuffled bytes — the same budget as `decontaminate`'s broadcast
  * screen.
  */
object Search {

  /** The shipped query's terms/k — shared by the `search_bm25` plan and
    * its oracle generator (the same single-source-of-truth rule as
    * `Similarity.defaultTrainRounds`): one rare term (`dup`, in ~5% of
    * docs → idf 5) against two corpus-saturating ones (idf 1). */
  val defaultTerms: Seq[String] = Seq("dup", "join", "vector")
  val defaultK: Int = 25

  /** SQL string literal for a query term in the generated oracle text:
    * doubles embedded single quotes so a term like `don't` produces a
    * valid (and correct) literal instead of breaking the oracle SQL.
    * Oracle-side only — the engine side takes terms as Columns. */
  private def sqlLit(t: String): String = s"'${t.replace("'", "''")}'"

  /** Top-k documents for a bag-of-words query, BM25-shaped integer
    * scoring, ties broken by ascending id. Emits (id, score, n_hits)
    * where n_hits is the number of distinct query terms present. */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1X1000: Long = 1200L,
      bX1000: Long = 750L): DataFrame = {
    require(terms.nonEmpty && terms.size <= 64,
      s"query must carry 1..64 terms, got ${terms.size}")
    // a repeated term would be counted twice here (independent tf_i
    // columns) but once by indexTopK (whose isin(terms) filter dedups)
    // — reject it uniformly at both entry points so the documented
    // "bit-identical to the scan form" contract can't silently break
    require(terms.distinct.size == terms.size,
      s"query terms must be distinct, got $terms")
    val tfCols = terms.indices.map { i =>
      size(filter(col("tk"), x => x === lit(terms(i)))).cast("long").as(s"tf_$i")
    }
    val base = graft.util.Par.widen(docs)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
      .select(col(idCol) +: size(col("tk")).cast("long").as("dl") +: tfCols: _*)

    // ONE 1-row stats relation: corpus size, token mass, per-term df —
    // partial-aggregated, then broadcast back for map-only scoring
    val statsAggs =
      sum(col("dl")).as("sum_dl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = base.agg(count(lit(1)).as("n_docs"), statsAggs: _*)

    // integer BM25: idf = floor(log2(2N/df)) via bin(); tf term in
    // per-mille floor arithmetic. `div` throughout, never Column `/`:
    // the latter promotes to DOUBLE, whose rounding can disagree with
    // DuckDB's exact `//` at the margins.
    def idf(i: Int): Column =
      (length(bin(expr(s"(2 * n_docs) div df_$i"))) - 1).cast("long")
    def termScore(i: Int): Column = {
      val tf = col(s"tf_$i")
      val satX1000 =
        expr(s"(tf_$i * ${k1X1000 + 1000L} * 1000) div (tf_$i * 1000 + k_x1000)")
      when(tf > 0 && col(s"df_$i") > 0, idf(i) * satX1000).otherwise(0L)
    }
    val nHits = terms.indices
      .map(i => when(col(s"tf_$i") > 0, 1L).otherwise(0L))
      .reduce(_ + _)

    base.crossJoin(broadcast(stats))
      .withColumn("k_x1000",
        expr(s"($k1X1000 * ((1000 - $bX1000) + ($bX1000 * dl * n_docs) div sum_dl)) div 1000"))
      .select(col(idCol),
        terms.indices.map(termScore).reduce(_ + _).as("score"),
        nHits.as("n_hits"))
      .where(col("score") > 0)
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** The shipped query batch, shared with the oracle generator — the
    * single-query defaults plus two more drawn from the fixture
    * vocabulary, overlapping on `join` so one (doc, term) row provably
    * serves two queries. */
  val defaultBatch: Seq[(Long, Seq[String])] = Seq(
    0L -> defaultTerms,
    1L -> Seq("spark", "window"),
    2L -> Seq("merge", "join", "scan"))

  /** Batch BM25 serving: MANY queries answered in ONE corpus pass —
    * the shape an evaluation harness or a contamination sweep needs,
    * where running `bm25TopK` per query would re-scan the corpus
    * |queries| times. Scores are bit-identical to `bm25TopK` on each
    * query (same integer idf/saturation arithmetic), emitted as
    * (qid, id, score, n_hits, rn).
    *
    * Scale shape: the corpus pays one tokenize pass; the per-row array
    * filter against the BROADCAST union of query terms drops every
    * unqueried token map-side, so the one (id, term) exchange carries
    * only matching postings — O(matching tokens), not O(corpus
    * tokens). df and the 1-row corpus stats are tiny aggregates over
    * that relation; queries and df join back as broadcasts; the
    * (qid, id) score agg map-side combines (a doc-term row fans out
    * only to the queries containing that term); and the per-query cut
    * ships ≤ k rows per qid per partition through the bounded-heap
    * `TopKPerKey`. Query batches are bounded by contract (≤ 4096
    * queries × ≤ 64 terms) — an unbounded query STREAM is the
    * persisted-index (`indexTopK`) territory instead. */
  def batchBm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Long, Seq[String])] = defaultBatch,
      k: Int = defaultK,
      k1X1000: Long = 1200L,
      bX1000: Long = 750L): DataFrame = {
    require(queries.nonEmpty && queries.size <= 4096,
      s"need 1..4096 queries, got ${queries.size}")
    require(queries.map(_._1).distinct.size == queries.size,
      "query ids must be distinct")
    queries.foreach { case (qid, ts) =>
      require(ts.nonEmpty && ts.size <= 64 && ts.distinct.size == ts.size,
        s"query $qid must carry 1..64 distinct terms, got $ts")
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val qRel = queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("qid", "term")
    val allTerms = queries.flatMap(_._2).distinct
    val base = graft.util.Par.widen(docs)
      .select(col(idCol), TextOps.tokens(col(textCol)).as("tk"))
      .select(col(idCol), size(col("tk")).cast("long").as("dl"), col("tk"))
    val stats = base.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tfRel = base
      .select(col(idCol), col("dl"),
        explode(filter(col("tk"), x => x.isInCollection(allTerms))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(first(col("dl")).as("dl"), count(lit(1)).as("tf"))
    val dfRel = tfRel.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tfRel
      .join(broadcast(qRel), "term")
      .join(broadcast(dfRel), "term")
      .crossJoin(broadcast(stats))
      .withColumn("k_x1000",
        expr(s"($k1X1000 * ((1000 - $bX1000) + ($bX1000 * dl * n_docs) div sum_dl)) div 1000"))
      .withColumn("__ts",
        (length(bin(expr("(2 * n_docs) div df"))) - 1).cast("long")
          * expr(s"(tf * ${k1X1000 + 1000L} * 1000) div (tf * 1000 + k_x1000)"))
      .groupBy(col("qid"), col(idCol))
      .agg(sum(col("__ts")).as("score"), count(lit(1)).as("n_hits"))
      .where(col("score") > 0)
    val top = graft.plans.TopKPerKey(
      scored, Seq("qid"), Seq(("score", false), (idCol, true)), k)
    val w = Window.partitionBy("qid").orderBy(desc("score"), asc(idCol))
    top.withColumn("rn", row_number().over(w).cast("long"))
  }

  /** Oracle generator for `batchBm25TopK`: the bm25 replay arithmetic
    * over a VALUES query relation and a term-restricted postings CTE. */
  def batchBm25OracleSql(
      tokSql: String,
      queries: Seq[(Long, Seq[String])],
      k: Int,
      k1X1000: Long = 1200L,
      bX1000: Long = 750L): String =
    s"""WITH ${batchBm25CtesSql(tokSql, queries, k1X1000, bX1000)}
       |SELECT qid, doc_id, score, n_hits, rn FROM r WHERE rn <= $k
       |ORDER BY qid, rn""".stripMargin

  /** The CTE block `batchBm25OracleSql` and the MRR-evaluation oracle
    * share — ends with `r` = the full per-(qid, doc) ranking. */
  private[graft] def batchBm25CtesSql(
      tokSql: String,
      queries: Seq[(Long, Seq[String])],
      k1X1000: Long = 1200L,
      bX1000: Long = 750L): String = {
    val qValues = queries
      .flatMap { case (qid, ts) => ts.map(t => s"($qid, ${sqlLit(t)})") }
      .mkString(", ")
    val inList = queries.flatMap(_._2).distinct.map(sqlLit).mkString(", ")
    s"""base AS (
       |  SELECT doc_id, len(tk) AS dl, tk
       |  FROM (SELECT doc_id, $tokSql AS tk FROM documents)),
       |stats AS (SELECT count(*) AS n_docs, sum(dl) AS sum_dl FROM base),
       |q(qid, term) AS (VALUES $qValues),
       |tf AS (
       |  SELECT doc_id, dl, w AS term, count(*) AS tf FROM (
       |    SELECT doc_id, dl, unnest(tk) AS w FROM base) s
       |  WHERE w IN ($inList)
       |  GROUP BY doc_id, dl, w),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |sc0 AS (
       |  SELECT q.qid, t.doc_id, t.tf, d.df, s.n_docs,
       |         ($k1X1000 * ((1000 - $bX1000) + ($bX1000 * t.dl * s.n_docs) // s.sum_dl)) // 1000 AS k_x1000
       |  FROM tf t JOIN q ON q.term = t.term JOIN df d ON d.term = t.term
       |  CROSS JOIN stats s),
       |sc AS (
       |  SELECT qid, doc_id,
       |         sum((length(bin(CAST((2*n_docs) // df AS BIGINT))) - 1)
       |             * ((tf * ${k1X1000 + 1000L} * 1000) // (tf * 1000 + k_x1000))) AS score,
       |         count(*) AS n_hits
       |  FROM sc0 GROUP BY qid, doc_id),
       |r AS (
       |  SELECT CAST(qid AS BIGINT) AS qid, doc_id,
       |         CAST(score AS BIGINT) AS score, CAST(n_hits AS BIGINT) AS n_hits,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS BIGINT) AS rn
       |  FROM sc WHERE score > 0)""".stripMargin
  }

  /** Retrieval-quality evaluation over the query batch — MRR-style,
    * with the standard label-free proxy for relevance: a document is
    * RELEVANT to a query iff it contains ALL the query's terms
    * (`n_hits == |terms|` — conjunctive containment, the criterion
    * grep-based triage would use). Per query: the rank of the first
    * relevant document in the BM25 top-k (null when none surfaces)
    * and its reciprocal rank in integer micro (0 when none) — the
    * number a ranking change is gated on, as `recallEval` gates an
    * ANN index rollout.
    *
    * Scale shape: exactly `batchBm25TopK` (the ranking IS the cost)
    * plus a broadcast |queries|-row term-count join and a ≤ k·|queries|
    * aggregation. */
  def mrrEval(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Long, Seq[String])] = defaultBatch,
      k: Int = defaultK): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranked = batchBm25TopK(docs, idCol, textCol, queries, k)
    val nTerms = queries.map { case (qid, ts) => (qid, ts.size.toLong) }
      .toDF("qid", "__nt")
    val hits = ranked.join(broadcast(nTerms), "qid")
      .where(col("n_hits") === col("__nt"))
      .groupBy("qid")
      .agg(min(col("rn")).as("first_rank"))
    queries.map(_._1).toDF("qid")
      .join(hits, Seq("qid"), "left")
      .select(col("qid"), col("first_rank"),
        coalesce(expr("1000000 div first_rank"), lit(0L)).as("rr_micro"))
  }

  /** Oracle generator for `mrrEval` — the batch replay's full ranking,
    * a conjunctive-containment hit set, and the reciprocal-rank law. */
  def mrrOracleSql(
      tokSql: String,
      queries: Seq[(Long, Seq[String])],
      k: Int): String = {
    val ntValues = queries.map { case (qid, ts) => s"($qid, ${ts.size})" }
      .mkString(", ")
    val qsValues = queries.map { case (qid, _) => s"($qid)" }.mkString(", ")
    s"""WITH ${batchBm25CtesSql(tokSql, queries)},
       |nt(qid, n_terms) AS (VALUES $ntValues),
       |hit AS (
       |  SELECT r.qid, min(rn) AS first_rank
       |  FROM r JOIN nt ON nt.qid = r.qid
       |  WHERE r.rn <= $k AND r.n_hits = nt.n_terms
       |  GROUP BY r.qid),
       |qs(qid) AS (VALUES $qsValues)
       |SELECT CAST(qs.qid AS BIGINT) AS qid,
       |       CAST(hit.first_rank AS BIGINT) AS first_rank,
       |       CAST(coalesce(1000000 // hit.first_rank, 0) AS BIGINT) AS rr_micro
       |FROM qs LEFT JOIN hit ON hit.qid = qs.qid
       |ORDER BY qid""".stripMargin
  }

  /** The shipped phrase query, shared with the oracle generator — a
    * token run that actually occurs in the fixture corpus. */
  val defaultPhrase: Seq[String] = Seq("row", "column", "sort")

  /** Exact PHRASE search: documents containing the query tokens as a
    * CONSECUTIVE run, ranked by occurrence count (ties to smaller id),
    * top k — the capability term-at-a-time BM25 structurally lacks
    * (bag-of-words scoring cannot tell "row column sort" from the
    * three words scattered). The phrase is matched as ONE m-token
    * window against the document's m-gram stream (the positional
    * grams every span operator extracts), so the corpus side is
    * map-only — no posting intersection, no position-adjacency join —
    * and the ranking is a TakeOrdered top-k, ≤ k rows per partition.
    * An index-backed variant would store positional postings; at one
    * window string per position the scan IS the m-gram extraction, so
    * the serve-from-index split only pays once the corpus is static —
    * `writeTextIndex`'s tradeoff, deliberately not re-made here.
    * `phrase` must be tokenizer-normalized words (lowercase, no
    * punctuation — what `TextOps.tokens` emits). */
  def phraseTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String] = defaultPhrase,
      k: Int = defaultK): DataFrame = {
    require(phrase.nonEmpty && phrase.size <= 16,
      s"phrase must carry 1..16 tokens, got ${phrase.size}")
    val p = phrase.mkString(" ")
    // The n_hits > 0 cut sits ABOVE the top-k, not below it: a filter
    // below the sort is substituted and pushed under the widen
    // repartition, re-running the m-gram extraction serially
    // pre-shuffle (guide §4.4's duplicated-evaluation trap), while a
    // filter cannot move through a Limit — so the heavy projection is
    // evaluated exactly once, post-widen, in parallel. Output is
    // identical: the order is (n_hits DESC, id) and 0-hit docs rank
    // strictly below every hit, so filtering the k-prefix equals
    // filtering first. (An explode+count form was measured 12x more
    // CPU — one row per gram — and rejected.)
    graft.util.Par.widen(docs)
      .select(col(idCol),
        size(filter(graft.ops.TextOps.wordNgramsFromTokens(
            graft.ops.TextOps.tokens(col(textCol)), phrase.size),
          g => g === lit(p))).cast("long").as("n_hits"))
      .orderBy(desc("n_hits"), col(idCol))
      .limit(k)
      .where(col("n_hits") > 0)
  }

  /** The DuckDB replay of `bm25TopK` for the oracle generators: same
    * floor arithmetic, same bin()-derived idf, same (score, id) cut.
    * `tokSql` is the caller's token-array SQL for `text`. */
  def bm25OracleSql(
      tokSql: String,
      terms: Seq[String],
      k: Int,
      k1X1000: Long = 1200L,
      bX1000: Long = 750L,
      fromSql: String = "documents"): String =
    s"""WITH ${bm25CtesSql(tokSql, terms, k1X1000, bX1000, fromSql)}
       |SELECT doc_id, CAST(score AS BIGINT) AS score, CAST(n_hits AS BIGINT) AS n_hits
       |FROM scored WHERE score > 0
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin

  /** The `base`/`stats`/`scored` CTE block both `bm25OracleSql` and the
    * hybrid-fusion oracle interpolate — one source of truth for the
    * integer-BM25 replay arithmetic. `fromSql` is the corpus relation
    * (default the full `documents` table; the purge oracle passes the
    * retained slice so the replay IS the rebuild-from-scratch truth). */
  private def bm25CtesSql(
      tokSql: String,
      terms: Seq[String],
      k1X1000: Long,
      bX1000: Long,
      fromSql: String = "documents"): String = {
    val tfDefs = terms.indices.map { i =>
      s"len(list_filter(tk, x -> x = ${sqlLit(terms(i))})) AS tf_$i"
    }.mkString(",\n|         ")
    val dfDefs = terms.indices.map { i =>
      s"sum(CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END) AS df_$i"
    }.mkString(",\n|         ")
    val termScores = terms.indices.map { i =>
      s"""CASE WHEN tf_$i > 0 AND df_$i > 0
         |            THEN (length(bin(CAST((2*n_docs) // df_$i AS BIGINT))) - 1)
         |                 * ((tf_$i * ${k1X1000 + 1000} * 1000) // (tf_$i * 1000 + k_x1000))
         |            ELSE 0 END""".stripMargin
    }.mkString(" +\n|       ")
    val hitFlags = terms.indices
      .map(i => s"CASE WHEN tf_$i > 0 THEN 1 ELSE 0 END").mkString(" + ")
    s"""base AS (
       |  SELECT doc_id, len(tk) AS dl,
       |         $tfDefs
       |  FROM (SELECT doc_id, $tokSql AS tk FROM $fromSql)),
       |stats AS (
       |  SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
       |         $dfDefs
       |  FROM base),
       |scored AS (
       |  SELECT doc_id,
       |       $termScores AS score,
       |       $hitFlags AS n_hits
       |  FROM (SELECT base.*, stats.*,
       |          ($k1X1000 * ((1000 - $bX1000) + ($bX1000 * dl * n_docs) // sum_dl)) // 1000 AS k_x1000
       |        FROM base, stats))""".stripMargin
  }

  /** Shipped hybrid-query constants, shared with the oracle generator
    * (the `defaultTerms` single-source-of-truth rule): dense query =
    * the corpus vector with this id, RRF constant 60 (the value the
    * original reciprocal-rank-fusion paper fixed and every search
    * engine kept), numerator 10⁶ so integer floor division still
    * separates adjacent ranks (10⁶/(60+r) steps by ~250 near r=1). */
  val defaultQueryVecId: Long = 0L
  val defaultRrfK: Long = 60L
  val rrfNum: Long = 1000000L

  /** Hybrid retrieval: BM25 lexical leg over `docs.textCol` fused with
    * an exact-cosine dense leg over `emb.vecCol` by reciprocal-rank
    * fusion — the standard RAG-serving shape (sparse recall for exact
    * term hits, dense recall for paraphrase) with all-integer scoring
    * so an external engine replays the fusion bit-for-bit:
    * `rrf = Σ_legs 10⁶ div (rrfK + rank)`, absent legs contribute 0.
    *
    * Scale shape (the reason fusion is cheap): each leg is already a
    * top-`legK` REDUCTION of its corpus pass — BM25's map-only scan +
    * broadcast stats + TakeOrdered, and the dense leg's single-probe
    * `bruteForceTopK` through the bounded-heap `TopKPerKey` (≤ legK
    * rows per partition cross the shuffle). The fusion itself joins two
    * ≤ legK-row relations: O(k) rows, O(k) bytes, regardless of corpus
    * size. The rank windows run AFTER the legs' limits, over ≤ legK
    * rows — a single-partition window over driver-scale data, never
    * over the corpus.
    *
    * ID-ALIGNMENT CONTRACT: the fusion full-outer-joins the lexical
    * leg's `idCol` values against the dense leg's `vecIdCol` values on
    * one shared id space — `docs` row i and `emb` row i must describe
    * the SAME document (the fixture's documents/embeddings tables are
    * generated aligned this way, and the oracle's fused CTE assumes
    * the same). With unaligned corpora the fusion silently pairs
    * unrelated rows; no runtime check is practical (both columns are
    * opaque int64), so alignment is the caller's contract, like any
    * foreign key. */
  def hybridRrfTopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      emb: DataFrame,
      vecIdCol: String,
      vecCol: String,
      terms: Seq[String] = defaultTerms,
      queryVecId: Long = defaultQueryVecId,
      k: Int = defaultK,
      legK: Int = defaultK,
      rrfK: Long = defaultRrfK): DataFrame = {
    // lexical leg: bm25TopK is (score DESC, id)-ordered and limited, so
    // ranking its ≤ legK rows reproduces ranks 1..legK exactly
    val lex = bm25TopK(docs, idCol, textCol, terms, legK)
      .withColumn("lex_rank",
        row_number().over(Window.orderBy(desc("score"), col(idCol))).cast("long"))
      .select(col(idCol).as("id"), col("lex_rank"))
    // dense leg: one probe vector (the corpus row with id = queryVecId),
    // exact quantized-int cosine ranking, probe excluded from results
    val probe = emb.where(col(vecIdCol) === queryVecId)
      .select(col(vecIdCol).as("probe_id"), col(vecCol).as("pe"))
    val dense = Similarity
      .bruteForceTopK(emb, probe, vecIdCol, vecCol, "probe_id", "pe", legK)
      .select(col(vecIdCol).as("id"), col("rn").as("dense_rank"))
    lex.join(dense, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(0L)).as("dense_rank"))
      .withColumn("rrf",
        expr(s"IF(lex_rank > 0, ${rrfNum}L div ($rrfK + lex_rank), 0L)" +
          s" + IF(dense_rank > 0, ${rrfNum}L div ($rrfK + dense_rank), 0L)"))
      .orderBy(desc("rrf"), col(idCol))
      .limit(k)
  }

  /** Build and persist an inverted index for keyword retrieval — the
    * train-once/serve-many counterpart of `bm25TopK` (which bakes its
    * term set into the plan and re-scans the corpus per query), exactly
    * as `Similarity.writeAnnIndex` is the serving form of the inline
    * ANN paths. Three all-integer parquet relations:
    *  - `postings` (term, id, tf, dl) — one row per distinct term per
    *    doc, range-partitioned AND sorted by term so parquet row-group
    *    min/max prune every term the query doesn't mention;
    *  - `term_df` (term, df) — the idf input;
    *  - `meta` (n_docs, sum_dl) — one row.
    * Serving cost is O(postings of the query's terms): the `IN` filter
    * reaches the scan as a pushed filter (spec-guarded), the df sliver
    * and the 1-row meta broadcast, the per-doc sum is one hash agg over
    * matched postings, and the cut is TakeOrdered. The 100 TB corpus is
    * read ONCE at build; queries never touch it again. */
  def writeTextIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      path: String): Unit = {
    val dl = graft.util.Par.widen(docs)
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("tk"))
      .select(col("id"), size(col("tk")).cast("long").as("dl"), col("tk"))
    val postings = dl
      .select(col("id"), col("dl"), explode(col("tk")).as("term"))
      .groupBy("term", "id", "dl").agg(count(lit(1)).as("tf"))
    postings
      .repartitionByRange(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/postings")
    // r13: term_df comes off the postings just WRITTEN — a pruned
    // (term) columnar scan of the compact index relation — instead of
    // re-running the tokenize+explode+aggregate pipeline over the
    // corpus a second time (strictly cheaper at every scale: the
    // postings relation is the gram stream already term-sorted).
    // meta still needs one corpus-side pass: n_docs must count
    // token-LESS documents too, which leave no postings row (the
    // purge contract documents exactly this asymmetry) — but it is a
    // no-explode partial aggregate, not a gram-stream shuffle.
    docs.sparkSession.read.parquet(s"$path/postings")
      .groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/term_df")
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** The index's three relation names; each lives as a base directory
    * `$path/<rel>` plus zero or more append-only `$path/<rel>_delta_N`
    * directories that `updateTextIndex` adds and `compactTextIndex`
    * folds back into the base. */
  private val indexRels = Seq("postings", "term_df", "meta")

  private def hadoopFs(
      spark: org.apache.spark.sql.SparkSession,
      path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Existing delta directories of one relation, `$path/<rel>_delta_N`,
    * in generation order. Listing metadata only — O(deltas). */
  private[graft] def deltaDirs(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      rel: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val f = hadoopFs(spark, path)
    val pat = s"${rel}_delta_(\\d+)".r
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap(s => s.getPath.getName match {
        case pat(n) => Some((n.toInt, s.getPath.toString))
        case _ => None
      })
      .sortBy(_._1).map(_._2)
  }

  /** One relation as base ∪ deltas — the serving view. Multi-path
    * parquet reads plan as ONE scan, so pushed filters (the `IN(terms)`
    * predicate) prune base and delta files alike. */
  private def readRel(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      rel: String): DataFrame =
    spark.read.parquet((s"$path/$rel" +: deltaDirs(spark, path, rel)): _*)

  /** Incremental index maintenance: fold a document batch into a
    * persisted `writeTextIndex` artifact without re-reading the corpus
    * OR the index — the daily-ingest twin of `Dedup`'s incremental
    * screen. Append-only: the batch's postings, per-term df, and 1-row
    * meta are each written as a NEW `<rel>_delta_N` directory (postings
    * term-range-sorted like the base, so row-group pruning works on
    * deltas too); nothing under the existing base or earlier deltas is
    * opened, let alone rewritten (spec-pinned byte-identical). Cost is
    * O(batch) — a daily fold-in stays daily-sized while the indexed
    * corpus grows without bound. `indexTopK` serves from base ∪ deltas
    * bit-identically to an index built from scratch on the union
    * (spec-pinned); `compactTextIndex` folds accumulated deltas back
    * into the base when their file count starts to matter (the
    * `Sinks.compact` small-file discipline). New ids must not collide
    * with indexed ones — the caller's contract, same as any CDC key
    * discipline. */
  def updateTextIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      batch: DataFrame,
      idCol: String,
      textCol: String): Unit = {
    // next generation number = max existing + 1, per relation listing
    // (metadata-only); the three relations advance in lockstep
    val gen = indexRels
      .flatMap(rel => deltaDirs(spark, path, rel)
        .map(_.split("_delta_").last.toInt))
      .reduceOption(_ max _).map(_ + 1).getOrElse(0)
    val dl = graft.util.Par.widen(batch)
      .select(col(idCol).as("id"), TextOps.tokens(col(textCol)).as("tk"))
      .select(col("id"), size(col("tk")).cast("long").as("dl"), col("tk"))
    val newPost = dl
      .select(col("id"), col("dl"), explode(col("tk")).as("term"))
      .groupBy("term", "id", "dl").agg(count(lit(1)).as("tf"))
    newPost
      .repartitionByRange(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/postings_delta_$gen")
    // df from the delta just written (pruned columnar read) — the
    // writeTextIndex r13 rationale, per fold-in batch
    spark.read.parquet(s"$path/postings_delta_$gen")
      .groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/term_df_delta_$gen")
    dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$path/meta_delta_$gen")
  }

  /** Fold accumulated deltas back into the base relations — the
    * periodic consolidation that keeps serve-side file counts bounded
    * (run it when deltas accumulate, not per fold-in; fold-ins stay
    * O(batch)). Each merged relation is written to a `.compacting`
    * sibling FIRST and only then swapped in (all three writes complete
    * before any delete), so a crash leaves stale extra directories,
    * never a truncated index. No-op when there are no deltas. */
  def compactTextIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    // roll forward (or clear) any crash-interrupted rewrite BEFORE
    // reading: a mixed-relation state would silently mis-compact
    graft.io.Sinks.recoverSwap(spark, path, indexRels)
    if (indexRels.forall(rel => deltaDirs(spark, path, rel).isEmpty)) return
    readRel(spark, path, "postings")
      .repartitionByRange(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/postings.compacting")
    readRel(spark, path, "term_df")
      .groupBy("term").agg(sum(col("df")).as("df"))
      .write.mode("overwrite").parquet(s"$path/term_df.compacting")
    readRel(spark, path, "meta")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$path/meta.compacting")
    graft.io.Sinks.swapCompacting(spark, path, indexRels,
      indexRels.flatMap(deltaDirs(spark, path, _)))
  }

  /** Right-to-be-forgotten propagation into the persisted index: drop
    * every trace of `deleteIds` from the three relations WITHOUT
    * re-reading the corpus — the deletion side of the maintenance
    * story `updateTextIndex` tells for ingest. A 100 TB deployment
    * cannot rebuild the index per GDPR request; it must subtract.
    *
    * Exactness (the law `PurgeSpec` pins): the purged index serves
    * bit-identically to `writeTextIndex` run from scratch on the
    * retained corpus, because every relation is a sum of independent
    * per-document contributions —
    *  - postings: per-(term, doc) rows, so the anti-join drops exactly
    *    the deleted docs' rows;
    *  - term_df: the deleted docs' postings sliver (O(deletes ·
    *    terms/doc) rows, read via a broadcast semi-join) aggregates to
    *    the per-term decrement; terms reaching 0 disappear, as a
    *    rebuild would have them;
    *  - meta: the same sliver's distinct (id, dl) rows are the n_docs /
    *    sum_dl decrement.
    * Contract: deleted ids must have ≥ 1 token. A token-less document
    * leaves no postings, so its +1 in n_docs is not recoverable from
    * the index alone — it can never be SERVED (score 0 always), and the
    * periodic full rebuild that re-centers any index clears the count.
    *
    * Cost: one pass over base ∪ delta postings (the anti-join rewrite,
    * which also folds deltas — a purge IS a compaction) with the
    * delete set broadcast; term_df/meta rewrites touch O(terms) and
    * 1-row relations. Crash discipline identical to
    * `compactTextIndex`: all three `.compacting` writes complete
    * before any delete/rename. */
  def purgeTextIndex(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      deleteIds: DataFrame,
      idCol: String): Unit = {
    // eager op (every write completes before return), so the scope is
    // owned and closed HERE — unlike the lazy-pipeline operators that
    // must delegate lifecycle to the caller
    val scope = new graft.util.CacheScope
    try purgeTextIndexImpl(spark, path, deleteIds, idCol, scope)
    finally scope.close()
  }

  private def purgeTextIndexImpl(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      deleteIds: DataFrame,
      idCol: String,
      scope: graft.util.CacheScope): Unit = {
    // roll forward (or clear) any crash-interrupted rewrite BEFORE
    // computing the deleted sliver: after a half-applied swap the
    // postings may already be purged, and decrements recomputed from
    // them would be empty while term_df/meta still carry the old mass
    graft.io.Sinks.recoverSwap(spark, path, indexRels)
    val del = deleteIds.select(col(idCol).as("id")).distinct()
    val post = readRel(spark, path, "postings")
    // the deleted docs' postings sliver — everything the decrements need
    val gone = scope.cache(post.join(broadcast(del), Seq("id"), "left_semi")
      .select("id", "term", "dl"))
    // contract check (cheap: the sliver is delete-batch-sized): an id
    // ingested twice with CONFLICTING lengths — an updateTextIndex
    // no-collision violation — would silently under-decrement
    // n_docs/sum_dl below; surface it as an error instead
    val conflicts = gone.select("id", "dl").distinct()
      .groupBy("id").agg(count(lit(1)).as("n"))
      .where(col("n") > 1).limit(1).collect()
    require(conflicts.isEmpty,
      s"purgeTextIndex: deleted id ${conflicts.headOption.map(_.get(0)).orNull} " +
        "carries conflicting document lengths in the index — " +
        "updateTextIndex's no-collision contract was violated upstream")
    post.join(broadcast(del), Seq("id"), "left_anti")
      .repartitionByRange(col("term")).sortWithinPartitions("term")
      .write.mode("overwrite").parquet(s"$path/postings.compacting")
    // no broadcast hint on the decrement side: it is bounded by the
    // deleted docs' DISTINCT terms, which for a large GDPR batch can
    // approach vocabulary size — let the planner (AQE) choose; for
    // request-sized deletes it will broadcast on its own estimate
    readRel(spark, path, "term_df")
      .groupBy("term").agg(sum(col("df")).as("df"))
      .join(gone.groupBy("term").agg(count(lit(1)).as("dec")),
        Seq("term"), "left")
      .select(col("term"), (col("df") - coalesce(col("dec"), lit(0L))).as("df"))
      .where(col("df") > 0)
      .write.mode("overwrite").parquet(s"$path/term_df.compacting")
    readRel(spark, path, "meta")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
      .crossJoin(broadcast(gone.select("id", "dl").distinct()
        .agg(count(lit(1)).as("nd"), coalesce(sum(col("dl")), lit(0L)).as("sd"))))
      .select((col("n_docs") - col("nd")).as("n_docs"),
        (col("sum_dl") - col("sd")).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$path/meta.compacting")
    graft.io.Sinks.swapCompacting(spark, path, indexRels,
      indexRels.flatMap(deltaDirs(spark, path, _)))
  }

  /** Serve a bag-of-words query from a persisted `writeTextIndex`
    * artifact, reading base ∪ any `updateTextIndex` deltas: bit-
    * identical to `bm25TopK` over the same corpus (same integer
    * idf/saturation/length-norm and the same (score, id) cut), which is
    * why the shipped query shares `bm25OracleSql` with the scan form.
    * The delta union costs nothing at serve time: postings plan as ONE
    * multi-path scan with the `IN(terms)` filter pushed into every
    * file, the df sum-merge runs over ≤ |terms|·(1+deltas) pushed-
    * filtered rows, and the meta sum over 1+deltas rows. Output column
    * is named `idColOut`. */
  def indexTopK(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      terms: Seq[String],
      k: Int,
      idColOut: String = "doc_id",
      k1X1000: Long = 1200L,
      bX1000: Long = 750L): DataFrame = {
    require(terms.nonEmpty && terms.size <= 64,
      s"query must carry 1..64 terms, got ${terms.size}")
    // same repeated-term rejection as bm25TopK: the isin filter below
    // would dedup what the scan form counts twice
    require(terms.distinct.size == terms.size,
      s"query terms must be distinct, got $terms")
    val p = readRel(spark, path, "postings")
      .where(col("term").isin(terms: _*))
    val dfs = readRel(spark, path, "term_df")
      .where(col("term").isin(terms: _*))
      .groupBy("term").agg(sum(col("df")).as("df"))
    val meta = readRel(spark, path, "meta")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    p.join(broadcast(dfs), "term")
      .crossJoin(broadcast(meta))
      .withColumn("k_x1000",
        expr(s"($k1X1000 * ((1000 - $bX1000) + ($bX1000 * dl * n_docs) div sum_dl)) div 1000"))
      .withColumn("idf", (length(bin(expr("(2 * n_docs) div df"))) - 1).cast("long"))
      .withColumn("s",
        expr(s"idf * ((tf * ${k1X1000 + 1000L} * 1000) div (tf * 1000 + k_x1000))"))
      .groupBy(col("id"))
      .agg(sum(col("s")).as("score"), count(lit(1)).as("n_hits"))
      .where(col("score") > 0)
      .orderBy(desc("score"), col("id"))
      .limit(k)
      .select(col("id").as(idColOut), col("score"), col("n_hits"))
  }

  /** DuckDB replay of `hybridRrfTopK`: the shared BM25 CTEs, the dense
    * leg rebuilt from scratch with the caller's quantized-dot SQL
    * (`qdotSql(a, b)` must render the SAME integer dot the engine's
    * `quantizedDot` computes), and the identical integer RRF. */
  def hybridOracleSql(
      tokSql: String,
      qdotSql: (String, String) => String,
      terms: Seq[String] = defaultTerms,
      queryVecId: Long = defaultQueryVecId,
      k: Int = defaultK,
      legK: Int = defaultK,
      rrfK: Long = defaultRrfK,
      k1X1000: Long = 1200L,
      bX1000: Long = 750L): String =
    s"""WITH ${bm25CtesSql(tokSql, terms, k1X1000, bX1000)},
       |lex AS (
       |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
       |  FROM (SELECT doc_id, score FROM scored WHERE score > 0
       |        ORDER BY score DESC, doc_id LIMIT $legK)),
       |probe AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = $queryVecId),
       |dscored AS (
       |  SELECT vec_id, ${qdotSql("pe", "embedding")} AS qdot
       |  FROM embeddings, probe WHERE vec_id <> $queryVecId),
       |dense AS (
       |  SELECT vec_id AS id, CAST(row_number() OVER (ORDER BY qdot DESC, vec_id) AS BIGINT) AS dense_rank
       |  FROM (SELECT vec_id, qdot FROM dscored ORDER BY qdot DESC, vec_id LIMIT $legK)),
       |fused AS (
       |  SELECT coalesce(l.doc_id, d.id) AS doc_id,
       |         coalesce(l.lex_rank, 0) AS lex_rank,
       |         coalesce(d.dense_rank, 0) AS dense_rank
       |  FROM lex l FULL OUTER JOIN dense d ON l.doc_id = d.id)
       |SELECT doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
       |       CAST(dense_rank AS BIGINT) AS dense_rank,
       |       CAST((CASE WHEN lex_rank > 0 THEN $rrfNum // ($rrfK + lex_rank) ELSE 0 END)
       |          + (CASE WHEN dense_rank > 0 THEN $rrfNum // ($rrfK + dense_rank) ELSE 0 END) AS BIGINT) AS rrf
       |FROM fused
       |ORDER BY rrf DESC, doc_id LIMIT $k""".stripMargin
}
