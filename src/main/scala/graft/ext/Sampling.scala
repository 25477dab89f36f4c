package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-composition sampling beyond the flat-rate schemes in the
  * query surface (`sample_stratified`'s fixed per-language rates,
  * `sample_balanced`'s equal-share rebalancer): the two policies real
  * pre-training mixes are actually built with.
  *
  * Both are derived-rate + deterministic-hash designs like their
  * siblings: tiny aggregations produce an O(groups) rate relation,
  * broadcast back; the corpus pass is map-only; every keep decision is
  * an md5-per-mille threshold, so the sample is identical at any
  * partitioning, any cluster size, and in the DuckDB oracle's replay.
  */
object Sampling {

  /** The shipped queries' parameters — shared by the plans and their
    * oracle generators so they can never silently desync. The mix
    * budget is half the sf0.01 corpus; at other SFs the rates derive
    * from the actual counts, so the query stays well-defined (just a
    * deeper down-sample). */
  val defaultMixBudget: Long = 250L
  val defaultPriorityK: Int = 100

  /** `corpus_pipeline`'s mixture budget — sized so the temperature
    * stage actually SUBSAMPLES at the sf0.01 gate (the quality/langid/
    * dedup/decon stages leave ~200 docs; 120 puts most sources' rates
    * well under 1000‰, exercising both the keep and drop branches). */
  val defaultPipelineBudget: Long = 120L

  /** `corpus_epochs` parameters: ~4× the sf0.01 corpus mass, so the
    * 4-epoch repeat cap BINDS for the small sources and not the large
    * ones at the gate SF (both branches exercised); at larger SFs the
    * same budget is just a deeper single-epoch mix. */
  val defaultEpochBudget: Long = 600000L
  val defaultMaxEpochsMilli: Long = 4000L

  /** The md5-derived 60-bit uniform used by every sampling query
    * (split_assign et al.) — deterministic, engine-independent. */
  private[graft] def md5Hash(id: Column): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long")

  /** Temperature-scaled mixture sampling (exponent α = 1/2): the
    * multilingual/multi-source rebalancing rule (XLM-R-style p_i^α
    * smoothing) that up-samples low-resource sources without flattening
    * the mix entirely. Target share of source i ∝ n_i^α; a total doc
    * budget is then spread by those shares and converted to per-source
    * per-mille keep rates.
    *
    * All arithmetic replays across engines: n_i^(1/2) is computed as
    * floor(sqrt(n_i · 10^6)) — the input is an exact integer below
    * 2^53 and IEEE-754 sqrt is correctly rounded, so the scaled root is
    * the same BIGINT in Spark and DuckDB; everything after is integer
    * floor arithmetic and the md5 keep decision.
    *
    * Scale shape: one count aggregation over the corpus (partial-
    * aggregated, O(sources) rows), one O(sources) broadcast back, then
    * a map-only filtered pass — the same two-pass budget as
    * `sample_balanced`, at 100 TB a scan plus a scan.
    */
  def temperatureMixture(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      budget: Long,
      scope: graft.util.CacheScope = new graft.util.CacheScope): DataFrame = {
    // the O(sources) count relation feeds BOTH the rate derivation and
    // the Σw total; uncached, Catalyst plans those as two independent
    // subtrees whose pushed filters differ — i.e. TWO full corpus
    // sizing scans. Caching ≤|sources| rows converts that to one scan
    // (lifecycle: caller's scope, or the Verify/Bench per-query clear)
    val counts = scope.cache(docs.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_grp"))
      .withColumn("w", floor(sqrt(col("n_grp") * 1000000L)).cast("long")))
    // Σw as a 1-row broadcast against the O(sources) counts — no
    // driver collect, no window over a single partition
    val tot = counts.agg(sum(col("w")).cast("long").as("sum_w"))
    // `div`, not `/`: Column `/` promotes to DOUBLE, whose 53-bit
    // mantissa silently rounds what DuckDB's `//` computes exactly
    val rates = counts.crossJoin(broadcast(tot))
      .select(col(groupCol),
        least(lit(1000L),
          expr(s"(1000 * $budget * w) div (sum_w * n_grp)")).as("rate"))
    docs
      .join(broadcast(rates), Seq(groupCol))
      .where(pmod(md5Hash(col(idCol)), lit(1000L)) < col("rate"))
      // preserve the caller's columns (plus the derived rate): a
      // pipeline stage must not strip the annotations later stages
      // consume (the capstone carries n_tokens through to packing)
      .select(docs.columns.map(col) :+ col("rate"): _*)
  }

  /** DuckDB replay of `temperatureMixture` over `documents` for the
    * oracle generator — same scaled integer sqrt, same floor
    * arithmetic, same md5 threshold. */
  def temperatureMixtureOracleSql(groupCol: String, budget: Long): String =
    s"""WITH counts AS (
       |  SELECT $groupCol, count(*) AS n_grp,
       |         CAST(floor(sqrt(count(*) * 1000000)) AS BIGINT) AS w
       |  FROM documents GROUP BY $groupCol),
       |tot AS (SELECT CAST(sum(w) AS BIGINT) AS sum_w FROM counts),
       |rates AS (
       |  SELECT $groupCol,
       |         least(1000, CAST((1000 * $budget * w) // (sum_w * n_grp) AS BIGINT)) AS rate
       |  FROM counts, tot)
       |SELECT d.doc_id, d.$groupCol AS $groupCol, r.rate
       |FROM documents d JOIN rates r USING ($groupCol)
       |WHERE CAST(concat('0x', substring(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 1000 < r.rate
       |ORDER BY doc_id""".stripMargin

  /** Deterministic char/token-budget materialization: spread a total
    * size budget over sources by the same √n temperature shares as
    * [[temperatureMixture]], then fill each source's cap with the
    * hash-SMALLEST documents — "give me ~B chars of corpus, mixed like
    * the temperature law says" — without ever sorting documents:
    * the cut is found on a 4096-bucket histogram of the 60-bit hash's
    * top 12 bits (the `qualityFilterBySource` discipline — a per-doc
    * rank window would put every source on one reducer). Each source
    * keeps the longest PREFIX of hash buckets whose cumulative size
    * fits its cap; undershoot is bounded by one bucket's mass
    * (~1/4096 of the source per uniform hashing). Everything —
    * shares, caps, bucket cut — is integer and replays externally;
    * the kept SET is exactly `bucket(doc) <= cutoff`, a map-only
    * predicate any downstream pass re-derives from the report.
    *
    * Scale shape: one sizing scan, one (source, bucket) map-side-
    * combined agg, a cumulative window over ≤4096 rows per source,
    * two broadcasts of O(sources) rows. Returns the per-source report
    * `(source, cap_chars, cutoff_bucket, n_kept, chars_kept)`;
    * cutoff −1 = even the first bucket overflowed the cap. */
  def budgetFill(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      sizeExpr: Column,
      budgetChars: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetChars > 0, s"need a positive budget, got $budgetChars")
    val sized = docs.select(col(groupCol).as("grp"),
      md5Hash(col(idCol)).as("h"), sizeExpr.cast("long").as("sz"))
    val counts = sized.groupBy("grp").agg(count(lit(1)).as("n_grp"))
      .withColumn("w", floor(sqrt(col("n_grp") * 1000000L)).cast("long"))
    val tot = counts.agg(sum(col("w")).cast("long").as("sum_w"))
    val caps = counts.crossJoin(broadcast(tot))
      .select(col("grp"), expr(s"($budgetChars * w) div sum_w").as("cap_chars"))
    // 2^48: the 60-bit hash's top 12 bits → 4096 ordered buckets
    val hist = sized.withColumn("b", expr("h div 281474976710656"))
      .groupBy("grp", "b")
      .agg(sum(col("sz")).as("bc"), count(lit(1)).as("bn"))
    val cum = hist.withColumn("cum",
      sum(col("bc")).over(Window.partitionBy("grp").orderBy("b")))
    val kept = cum.join(broadcast(caps), "grp")
      .where(col("cum") <= col("cap_chars"))
      .groupBy("grp")
      .agg(max(col("b")).as("cutoff_bucket"), sum(col("bn")).as("n_kept"),
        sum(col("bc")).as("chars_kept"))
    caps.join(kept, Seq("grp"), "left")
      .select(col("grp").as(groupCol), col("cap_chars"),
        coalesce(col("cutoff_bucket"), lit(-1L)).as("cutoff_bucket"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("chars_kept"), lit(0L)).as("chars_kept"))
  }

  /** Weighted sample without replacement by PRIORITY SAMPLING (Duffield,
    * Lund & Thorup, JACM 2007): each row gets priority u/w — u a
    * deterministic md5 uniform, w its weight — and the k smallest
    * priorities win. Rows with k× the weight are ~k× as likely to be
    * kept, heavy rows can't be picked twice (vs sampling WITH
    * replacement), and the whole draw replays from the hash.
    *
    * Integer form: priority = u div w on the 60-bit uniform — floor
    * division in both engines, ties broken by ascending id.
    *
    * Scale shape: priority is map-only; the k-smallest cut is
    * TakeOrdered (≤ k rows per partition reach the final merge), never
    * a global sort — the same bound as every top-k in the engine.
    */
  def prioritySample(
      docs: DataFrame,
      idCol: String,
      weightCol: String,
      k: Int): DataFrame =
    docs
      .where(col(weightCol) > 0)
      .select(col(idCol), col(weightCol).cast("long").as("weight"),
        md5Hash(col(idCol)).as("u"))
      // `div`, not `/`: the 60-bit uniform exceeds DOUBLE's 53-bit
      // mantissa, so float division would round off exactly the low
      // bits the priority order is decided by
      .select(col(idCol), col("weight"),
        expr("u div weight").as("priority"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)

  /** DuckDB replay of `prioritySample` over `documents`. */
  def prioritySampleOracleSql(weightCol: String, k: Int): String =
    s"""SELECT doc_id, CAST($weightCol AS BIGINT) AS weight,
       |       CAST(CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) // $weightCol AS BIGINT) AS priority
       |FROM documents WHERE $weightCol > 0
       |ORDER BY priority, doc_id LIMIT $k""".stripMargin

  /** Data-constrained epoch schedule (the Muennighoff et al. 2023
    * regime — repeating data beyond ~4 epochs stops buying loss):
    * given a total token budget, spread it over sources by the same
    * √n temperature law as [[temperatureMixture]], then convert each
    * source's allocation into a REPEAT factor in milli-epochs, capped
    * at `maxEpochsMilli`. The report is the training schedule: how
    * many times each source's tokens are seen, what its allocation
    * was, and the effective tokens actually consumed — the cap's
    * unused budget shows up as effective < alloc and is reported, not
    * silently redistributed (redistribution is a policy choice; rerun
    * with different shares if the gap matters).
    *
    * Integer arithmetic end-to-end on the [[temperatureMixture]]
    * determinism contract: w = floor(sqrt(n_tokens·10⁶)) is exact
    * while n_tokens·10⁶ < 2⁵³ (IEEE sqrt is correctly rounded on
    * exact inputs); everything after is floor division.
    *
    * Scale shape: ONE map-side-combined sum per source (O(sources)
    * rows), a 1-row Σw broadcast — the corpus is scanned once and
    * nothing else moves. The schedule feeds `interleaveBySource` /
    * `corpus_pack` downstream. */
  def epochSchedule(
      docs: DataFrame,
      groupCol: String,
      sizeExpr: Column,
      budgetTokens: Long,
      maxEpochsMilli: Long = defaultMaxEpochsMilli): DataFrame = {
    require(budgetTokens > 0, s"need a positive budget, got $budgetTokens")
    require(maxEpochsMilli > 0, s"need a positive epoch cap, got $maxEpochsMilli")
    val counts = docs.groupBy(col(groupCol))
      .agg(sum(sizeExpr.cast("long")).as("n_tokens"))
      .where(col("n_tokens") > 0)
      .withColumn("w", floor(sqrt(col("n_tokens") * 1000000L)).cast("long"))
    val tot = counts.agg(sum(col("w")).cast("long").as("sum_w"))
    counts.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n_tokens"),
        expr(s"($budgetTokens * w) div sum_w").as("alloc_tokens"))
      .withColumn("epochs_milli",
        least(lit(maxEpochsMilli), expr("(alloc_tokens * 1000) div n_tokens")))
      .withColumn("effective_tokens", expr("(n_tokens * epochs_milli) div 1000"))
  }

  /** DuckDB replay of `epochSchedule` over `documents`. */
  def epochScheduleOracleSql(
      groupCol: String,
      sizeCol: String,
      budgetTokens: Long,
      maxEpochsMilli: Long = defaultMaxEpochsMilli): String =
    s"""WITH counts AS (
       |  SELECT $groupCol, CAST(sum($sizeCol) AS BIGINT) AS n_tokens,
       |         CAST(floor(sqrt(sum($sizeCol) * 1000000)) AS BIGINT) AS w
       |  FROM documents GROUP BY $groupCol HAVING sum($sizeCol) > 0),
       |tot AS (SELECT CAST(sum(w) AS BIGINT) AS sum_w FROM counts),
       |alloc AS (
       |  SELECT $groupCol, n_tokens,
       |         CAST(($budgetTokens * w) // sum_w AS BIGINT) AS alloc_tokens
       |  FROM counts, tot),
       |ep AS (
       |  SELECT $groupCol, n_tokens, alloc_tokens,
       |         least($maxEpochsMilli, (alloc_tokens * 1000) // n_tokens) AS epochs_milli
       |  FROM alloc)
       |SELECT $groupCol, n_tokens, alloc_tokens,
       |       CAST(epochs_milli AS BIGINT) AS epochs_milli,
       |       CAST((n_tokens * epochs_milli) // 1000 AS BIGINT) AS effective_tokens
       |FROM ep
       |ORDER BY $groupCol""".stripMargin

  /** One exponentiated-gradient step of domain-mixture reweighting —
    * the DoReMi-shaped update (Xie et al., 2023: upweight the domains
    * where the proxy model's excess loss is largest) in exact integer
    * arithmetic: from uniform weights, each domain's multiplier is
    * `1000 + clamp(η·excess, ±clamp)` permille where excess = the
    * domain's mean per-row loss minus the corpus mean, and the new
    * share is the multiplier renormalized over domains. `lossExpr` is
    * any per-row integer loss in permille (the shipped query uses a
    * short-document indicator; a real run plugs in per-row proxy-model
    * scores) — the operator is the UPDATE RULE, deliberately agnostic
    * to the loss.
    *
    * All divisions are truncating in both engines (Spark `div` ==
    * DuckDB `//`, signed — both truncate toward zero), so the oracle
    * replays bit-for-bit. One map-combined agg to O(domains) rows;
    * everything after runs on the sliver with 1-row broadcasts. */
  def mixtureReweight(
      docs: DataFrame,
      domainCol: String,
      lossExpr: Column,
      etaPermille: Long = 2000L,
      clampPermille: Long = 500L): DataFrame = {
    require(etaPermille > 0, s"need a positive learning rate, got $etaPermille")
    require(clampPermille > 0 && clampPermille < 1000,
      s"need 0 < clamp < 1000 (multipliers must stay positive), got $clampPermille")
    val per = docs.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"), sum(lossExpr.cast("long")).as("sl"))
    val tot = per.agg(sum(col("sl")).as("tsl"), sum(col("n_docs")).as("tn"))
    val f = per.crossJoin(broadcast(tot))
      .select(col(domainCol), col("n_docs"),
        expr("sl div n_docs").as("loss_pm"),
        expr("(sl div n_docs) - (tsl div tn)").as("excess_pm"))
      .withColumn("factor_pm",
        lit(1000L) + greatest(lit(-clampPermille),
          least(lit(clampPermille), expr(s"($etaPermille * excess_pm) div 1000"))))
    val sf = f.agg(sum(col("factor_pm")).as("sum_f"))
    f.crossJoin(broadcast(sf))
      .select(col(domainCol), col("n_docs"), col("loss_pm"), col("excess_pm"),
        expr("(factor_pm * 1000) div sum_f").as("share_pm"))
  }

  /** DuckDB replay of `mixtureReweight` over `documents`. `lossSql` is
    * the per-row loss expression in SQL. */
  def mixtureReweightOracleSql(
      groupCol: String,
      lossSql: String,
      etaPermille: Long = 2000L,
      clampPermille: Long = 500L): String =
    s"""WITH per AS (
       |  SELECT $groupCol, count(*) AS n_docs, sum($lossSql) AS sl
       |  FROM documents GROUP BY $groupCol),
       |tot AS (SELECT sum(sl) AS tsl, sum(n_docs) AS tn FROM per),
       |e AS (
       |  SELECT $groupCol, n_docs, sl // n_docs AS loss_pm,
       |         (sl // n_docs) - (tsl // tn) AS excess_pm
       |  FROM per, tot),
       |f AS (
       |  SELECT *, 1000 + greatest(-$clampPermille,
       |           least($clampPermille, ($etaPermille * excess_pm) // 1000)) AS factor_pm
       |  FROM e),
       |s AS (SELECT sum(factor_pm) AS sum_f FROM f)
       |SELECT $groupCol, CAST(n_docs AS BIGINT) AS n_docs,
       |       CAST(loss_pm AS BIGINT) AS loss_pm,
       |       CAST(excess_pm AS BIGINT) AS excess_pm,
       |       CAST((factor_pm * 1000) // sum_f AS BIGINT) AS share_pm
       |FROM f, s
       |ORDER BY $groupCol""".stripMargin

  /** Deterministic source-INTERLEAVED training order: `corpus_shuffle`
    * randomizes the corpus globally, but a multi-source mix wants the
    * sources WOVEN at a fixed cadence — concatenated sources make
    * every mid-training checkpoint see whichever domain came first,
    * and even a global shuffle leaves the cadence to chance. Rule:
    * docs of source s, ordered by (md5(id), id), take positions
    * r·K + index(s) (K = number of sources, index = the source's rank
    * in lexicographic name order) — a strict round-robin, so any
    * contiguous training window holds each source at ~1/K. Unequal
    * sources leave tail gaps in the position sequence; reading in
    * position order is the schedule.
    *
    * Scale shape: ONE range-partitioned sort keyed (source, hash, id)
    * through the distributed-rank machinery (never an Exchange
    * SinglePartition); per-source ranks are the global ranks minus
    * per-source offsets — an O(|sources|) driver map, the rank-offset
    * metadata budget — and the position stamp is map-only. */
  def interleaveBySource(
      docs: DataFrame,
      idCol: String,
      sourceCol: String,
      parts: Int): DataFrame = {
    val ranked = graft.ops.GlobalSort.globalRank(
      docs.select(col(sourceCol), col(idCol), md5Hash(col(idCol)).as("__h")),
      Seq(col(sourceCol).asc, col("__h").asc, col(idCol).asc),
      parts, rankCol = "__grnk")
    // O(|sources|) metadata: counts → lexicographic index + exclusive
    // offset (global order is keyed by source first, so per-source
    // ranks are a contiguous slice of the global ranks)
    val counts = ranked.groupBy(col(sourceCol)).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val k = counts.length
    val offsets = counts.map(_._2).scanLeft(0L)(_ + _)
    val meta = docs.sparkSession.createDataFrame(
      counts.zipWithIndex.map { case ((s, _), i) => (s, i.toLong, offsets(i)) }.toSeq)
      .toDF(sourceCol, "__sidx", "__off")
    ranked.join(broadcast(meta), sourceCol)
      .select(col(idCol), col(sourceCol),
        (col("__grnk") - 1 - col("__off")).as("src_rank"),
        ((col("__grnk") - 1 - col("__off")) * k + col("__sidx")).as("interleave_pos"))
  }
}
