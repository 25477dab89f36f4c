package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series reshaping over event tables. The reference's event
  * handling is batch per-hour aggregation (the `q12` shape); resampling
  * onto a DENSE time spine is what downstream consumers (dashboards,
  * anomaly detectors, rate monitors) actually require — a missing hour
  * must be an explicit zero row, not an absent one.
  */
object TimeSeries {

  /** Gap-filled per-key counts on a dense `unit` spine: truncate event
    * times to the unit, count per (bucket, key), then left-join the
    * counts onto the full spine × key grid and fill zeros.
    *
    * Scale shape: the data pays ONE aggregation pass (the same cost as
    * the sparse hourly rollup). The spine is `sequence(min, max)` off a
    * single broadcast bounds row — its length is time-range/unit,
    * thousands of rows at any corpus size — and the key set is a
    * broadcast distinct over a low-cardinality column (the caller's
    * contract, ENFORCED by the `maxKeys` guard below). The grid join
    * is broadcast-left, so nothing about the fill step scales with the
    * event count. The bounds row is collected (1 row — the guard must
    * fire before the grid exists), so the call is eager by one
    * partial-aggregated pass. */
  def gapFillCounts(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      unit: String = "hour",
      maxKeys: Int = 4096): DataFrame = {
    val counts = df
      .groupBy(date_trunc(unit, col(tsCol)).as("bucket_ts"), col(keyCol))
      .agg(count(lit(1)).as("n"))
    // the bounds pass carries the distinct-key count for free (one
    // partial-aggregated row), and is collected so the low-cardinality
    // CONTRACT becomes a loud failure instead of a broadcast OOM: a
    // high-cardinality key makes the dense spine×key grid itself the
    // product, which no deployment wants filled
    val b = df.agg(
      date_trunc(unit, min(col(tsCol))).as("lo"),
      date_trunc(unit, max(col(tsCol))).as("hi"),
      count_distinct(col(keyCol)).as("nk")).collect()(0)
    if (b.isNullAt(0)) return counts.limit(0) // no events → empty grid
    require(b.getLong(2) <= maxKeys,
      s"gapFillCounts: '$keyCol' holds ${b.getLong(2)} distinct values (> maxKeys=$maxKeys); " +
        "the dense spine x key grid is only meaningful for low-cardinality keys - " +
        "bucket the key first or raise maxKeys deliberately")
    val spine = df.sparkSession.range(1)
      .select(lit(b.getTimestamp(0)).as("lo"), lit(b.getTimestamp(1)).as("hi"))
      .select(explode(expr(s"sequence(lo, hi, interval 1 $unit)")).as("bucket_ts"))
    val keys = df.select(col(keyCol)).distinct()
    spine.crossJoin(broadcast(keys))
      .join(counts, Seq("bucket_ts", keyCol), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }

  /** Ordered funnel: how many users reached step i of `steps` with each
    * step STRICTLY AFTER their first completion of the previous one
    * (the standard product-analytics funnel, not the per-type-min
    * shortcut — a click that precedes the user's first view must not
    * count). Returns one row per step: (stage, n_users), stages
    * numbered so they sort in funnel order.
    *
    * Scale shape: one filtered scan per step (the type predicate pushes
    * to the source), each reduced to one (user, first_ts) row BEFORE
    * the next join — so every join is keyed by user over ≤ |users|
    * rows per side, and the event table itself never self-joins. Each
    * stage's per-user relation is cached through the scope: it feeds
    * BOTH the next stage's gate and the final count, and uncached the
    * nesting would re-run stage i's scan inside every later stage's
    * plan (O(steps²) passes over the event table). */
  def funnelStages(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String],
      scope: graft.util.CacheScope = new graft.util.CacheScope): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val reached = steps.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (step, _)) =>
        val hits = events.where(col(typeCol) === step)
        val gated = prev match {
          case None => hits
          case Some(p) =>
            hits.join(p.select(col(userCol), col("__t").as("__pt")), userCol)
              .where(col(tsCol) > col("__pt"))
        }
        Some(scope.cache(gated.groupBy(userCol).agg(min(col(tsCol)).as("__t"))))
    }.flatten
    reached.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(s"${i + 1}_$step").as("stage"), col("n_users"))
    }.reduce(_.unionByName(_))
  }

  /** Trailing-window anomaly flags over the dense per-key series — the
    * ingest-monitoring primitive a pipeline runs on its event volumes
    * (a source whose hourly doc count triples against its own trailing
    * day is a crawl loop or an upstream dump, either way a quarantine
    * candidate). A bucket is anomalous iff the full trailing baseline
    * exists (`window` prior buckets — partial baselines at the series
    * head never flag), the count clears the noise floor `minCount`,
    * and `n · 100 · window > thresholdPct · Σ baseline` — i.e. the
    * bucket exceeds thresholdPct% of its trailing mean, stated in
    * integers so the flag replays externally (no float mean crosses
    * the engine boundary).
    *
    * Scale shape: inherits `gapFillCounts` — the event table pays one
    * aggregation pass, and the trailing window runs over the DENSE
    * spine×key grid (time-range/unit × ≤maxKeys rows), never the
    * events; per-key series are modest at any corpus size, so the
    * partitioned window is safe where a raw-event window would not be.
    * Returns every grid cell: (bucket_ts, key, n, base_n, is_anom
    * 0/1). */
  def anomalyFlags(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      unit: String = "hour",
      window: Int = 24,
      thresholdPct: Long = 300L,
      minCount: Long = 0L,
      maxKeys: Int = 4096): DataFrame = {
    require(window >= 1 && thresholdPct > 0,
      s"need window >= 1 and thresholdPct > 0; got $window/$thresholdPct")
    val dense = gapFillCounts(df, tsCol, keyCol, unit, maxKeys)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col("bucket_ts"))
      .rowsBetween(-window, -1)
    dense
      .withColumn("base_n", coalesce(sum(col("n")).over(w), lit(0L)))
      .withColumn("base_rows", count(lit(1)).over(w))
      .withColumn("is_anom",
        when(col("base_rows") === window && col("n") >= minCount &&
          col("n") * 100L * window > lit(thresholdPct) * col("base_n"), 1L)
          .otherwise(0L))
      .drop("base_rows")
  }

  /** Retention cohorts: users grouped by first-active day, counted at
    * each day offset they returned within `maxOffsetDays`. One
    * aggregation derives the cohorts, one distinct the activity days —
    * both keyed by user — and the cohort join is user-keyed too; the
    * output is |days| × |offsets| rows regardless of event count. */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      maxOffsetDays: Int = 7): DataFrame = {
    val first = events.groupBy(userCol).agg(to_date(min(col(tsCol))).as("__c"))
    val active = events.select(col(userCol), to_date(col(tsCol)).as("__d")).distinct()
    first.join(active, userCol)
      .withColumn("day_offset", datediff(col("__d"), col("__c")).cast("long"))
      .where(col("day_offset").between(0, maxOffsetDays))
      .groupBy(date_format(col("__c"), "yyyy-MM-dd").as("cohort_day"), col("day_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Half-life decayed trending entities, exact-integer: each hourly
    * bucket's count contributes `n >> (age_hours div halfLifeHours)`
    * (age measured from the corpus's LAST bucket, shift capped at 62),
    * so a bucket loses half its weight per half-life and — unlike the
    * float `e^(−λt)` formulation, which cannot cross engines
    * bit-stably — the whole score REPLAYS externally. Recency-weighted
    * ranking is the standard "trending now" signal; the power-of-two
    * decay is the price of exactness and is monotone-equivalent to any
    * base's exponential at half-life granularity.
    *
    * Scale shape: ONE (bucket, key) aggregation pass (map-side
    * combined), a single broadcast reference row, one per-key sum, and
    * a global top-k planned as `TakeOrderedAndProject` (limit k — no
    * global sort, each partition forwards ≤ k rows); the final rank
    * window runs over the ≤ k survivors only. */
  def decayedTopK(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      k: Int = 20,
      halfLifeHours: Int = 24): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0 && halfLifeHours > 0,
      s"need k > 0 and halfLifeHours > 0, got $k/$halfLifeHours")
    val counts = events
      .select(date_trunc("hour", col(tsCol)).as("bucket"), col(keyCol))
      .groupBy("bucket", keyCol)
      .agg(count(lit(1)).as("n"))
    val ref = events.agg(date_trunc("hour", max(col(tsCol))).as("ref"))
    val scored = counts.crossJoin(broadcast(ref))
      .withColumn("__shift",
        least(expr(s"timestampdiff(HOUR, bucket, ref) div $halfLifeHours"),
          lit(62L)).cast("int"))
      .select(col(keyCol), expr("shiftright(n, __shift)").as("__c"))
      .groupBy(keyCol)
      .agg(sum(col("__c")).as("score"))
    scored.orderBy(desc("score"), asc(keyCol)).limit(k)
      .withColumn("rn", row_number()
        .over(Window.orderBy(desc("score"), asc(keyCol))).cast("long"))
  }

  /** Per-key ordinary-least-squares trend over the DENSE hourly grid —
    * the "is this source growing or dying" statistic dashboards fit,
    * computed exactly: slope in micro-units-per-hour as the floored
    * quotient of the textbook sufficient statistics
    * `(n·Σxy − Σx·Σy)·10⁶ div (n·Σx² − (Σx)²)`, plus the milli mean
    * level. Fitting on the GAP-FILLED grid is load-bearing: a sparse
    * rollup silently drops zero hours and biases every dying series'
    * slope toward flat — `gapFillCounts` makes the zeros explicit, so
    * the fit sees them (and inherits its broadcast-spine cost shape
    * and `maxKeys` guard). Sums are carried in DECIMAL(38,0) (int64
    * overflows at corpus scale; both engines' 38-digit exact envelopes
    * match) and the only division is the final integral `div` — no
    * float ever crosses the engine boundary. A single-bucket series
    * has zero x-variance and reports a null slope.
    *
    * Scale shape: the event table pays gapFillCounts' ONE aggregation
    * pass; the fit itself is one hash agg over the grid (five
    * DECIMAL sums per key, map-side combined) — grid-sized, never
    * event-sized — and the reference hour crosses as a broadcast
    * 1-row min. */
  def trendComponents(
      df: DataFrame,
      tsCol: String,
      keyCol: String): DataFrame = {
    val dense = gapFillCounts(df, tsCol, keyCol)
    val t0 = dense.agg(min(col("bucket_ts")).as("t0"))
    dense.crossJoin(broadcast(t0))
      .select(col(keyCol),
        expr("CAST(timestampdiff(HOUR, t0, bucket_ts) AS DECIMAL(18,0))").as("x"),
        col("n").cast(org.apache.spark.sql.types.DecimalType(18, 0)).as("y"))
      .groupBy(keyCol)
      .agg(
        count(lit(1)).cast(org.apache.spark.sql.types.DecimalType(18, 0)).as("nb"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"))
      .select(col(keyCol),
        col("nb").cast("long").as("n_buckets"),
        expr("""CASE WHEN nb * sxx - sx * sx = 0 THEN NULL
                ELSE ((nb * sxy - sx * sy) * 1000000)
                     div (nb * sxx - sx * sx) END""").as("slope_micro"),
        expr("(sy * 1000) div nb").as("mean_milli"))
  }

  /** Session-scoped Markov transition counts — the behavioral model
    * behind next-action prediction and journey analysis: within each
    * user session (same `gapSeconds` boundary as the sessionize
    * queries), count every consecutive `event_type` pair, with a
    * virtual `_start` before each session's first event and `_end`
    * after its last, so row counts at every state balance (in-degree =
    * out-degree per session walk) and entry/exit probabilities fall
    * out of the same relation as the interior transitions. Consumers
    * divide by the per-src total for the transition matrix — this
    * emits the exact integer counts.
    *
    * Scale shape: ONE user-partitioned window sort carries all three
    * derivations (session flag, predecessor type, successor presence —
    * same partition key and ordering, one exchange + one sort), the
    * per-row expansion is ≤ 2 tiny structs through a generator, and
    * the count aggregation map-side combines into an output bounded by
    * (|type vocabulary| + 2)² rows — independent of event count. */
  def sessionTransitions(
      events: DataFrame,
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      gapSeconds: Int = 1800): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(gapSeconds > 0, s"need gapSeconds > 0, got $gapSeconds")
    val wu = Window.partitionBy(userCol).orderBy("sec", tieCol)
    val wRun = wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ws = Window.partitionBy(userCol, "session_id").orderBy("sec", tieCol)
    events
      .select(col(userCol), col(tieCol), col(typeCol).as("cur"),
        unix_timestamp(col(tsCol)).as("sec"))
      .withColumn("prev_sec", lag(col("sec"), 1).over(wu))
      .withColumn("new_session",
        when(col("prev_sec").isNull ||
          col("sec") - col("prev_sec") > gapSeconds, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .withColumn("prev", lag(col("cur"), 1).over(ws))
      .withColumn("next", lead(col("cur"), 1).over(ws))
      .select(explode(concat(
        array(struct(coalesce(col("prev"), lit("_start")).as("src"),
          col("cur").as("dst"))),
        when(col("next").isNull,
          array(struct(col("cur").as("src"), lit("_end").as("dst"))))
          .otherwise(array().cast("array<struct<src:string,dst:string>>"))))
        .as("t"))
      .groupBy(col("t.src").as("src_type"), col("t.dst").as("dst_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Event-time disorder profile — the measured input for choosing a
    * streaming watermark delay: per event, how far its timestamp lags
    * the maximum timestamp already seen in its key's ARRIVAL order
    * (`tieCol` — commit/ingest order by contract), rolled up into a
    * power-of-two histogram of lag seconds. A watermark of delay D
    * drops exactly the events in buckets above D; reading the profile
    * off the actual stream replaces guessing the
    * `withWatermark("10 minutes")` constant. In-order events land in
    * bucket −1 (lag 0).
    *
    * Scale shape: one key-partitioned window sort (running max over
    * arrival order — the sessionize envelope), a map-only bucket
    * expression (integer bit length), and a ≤ 64-bucket rollup. No
    * global window: disorder is measured within each key's stream,
    * which is what per-key watermarking actually sees. */
  def disorderProfile(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // secondary order by the event second: if the caller's tieCol
    // collides within a key (caller-supplied ties, or the 60-bit
    // md5-truncated arrival key in the events_disorder plan), the
    // ROWS-frame running max would otherwise depend on tie placement;
    // with (tieCol, sec) the only remaining ties have equal sec and
    // are interchangeable w.r.t. max(sec) — deterministic either way
    val w = Window.partitionBy(keyCol).orderBy(col(tieCol), col("sec"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col(keyCol), col(tieCol), unix_timestamp(col(tsCol)).as("sec"))
      .withColumn("lag_sec",
        greatest(coalesce(max(col("sec")).over(w) - col("sec"), lit(0L)), lit(0L)))
      // bucket = bit length of the lag (0 → −1): bucket b holds lags
      // in [2^b, 2^(b+1))
      .withColumn("bucket",
        when(col("lag_sec") === 0L, lit(-1L))
          .otherwise((length(bin(col("lag_sec"))) - 1).cast("long")))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), max(col("lag_sec")).as("max_lag_sec"))
  }

  /** RFM user segmentation — recency / frequency / monetary quintiles,
    * the classic audience-analytics rollup, built scale-safe: per
    * metric, population quintiles are derived from a BOUNDED
    * distinct-bucket histogram (each metric min-max-normalized into
    * ≤ 1000 integer buckets off a broadcast 1-row bounds agg, then a
    * cumulative window over the ≤ 1001-row histogram — the
    * `qualityPercentiles` discipline), never a global ntile window
    * (Exchange SinglePartition over every user at corpus scale).
    * Quintile = (users strictly below the bucket · 5) div users —
    * integer, population-based, tie-stable. Monetary sums in floored
    * cents so no float crosses an engine boundary after the one
    * deterministic floor. Output: one row per occupied segment code
    * (`r·100 + f·10 + m`, each digit 0–4), with user count and total
    * cents — ≤ 125 rows at any event volume.
    *
    * Scale shape: one per-user aggregation pass (the only data-scale
    * exchange), a 1-row bounds agg, three bounded-histogram windows,
    * three broadcast joins back onto the per-user relation, and a
    * ≤125-row rollup. */
  def rfmSegments(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      valueCol: String = "value",
      scope: graft.util.CacheScope = new graft.util.CacheScope): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = events.groupBy(col(userCol)).agg(
      max(unix_timestamp(col(tsCol))).as("r_sec"),
      count(lit(1)).as("fq"),
      sum(floor(col(valueCol) * 100).cast("long")).as("m_cents"))
    val bounds = per.agg(
      min(col("r_sec")).as("rmin"), max(col("r_sec")).as("rmax"),
      min(col("fq")).as("fmin"), max(col("fq")).as("fmax"),
      min(col("m_cents")).as("mmin"), max(col("m_cents")).as("mmax"),
      count(lit(1)).as("nu"))
    // consumed four times (three histograms + the final join): cached
    // so the event table pays its per-user aggregation ONCE; lifecycle
    // owned by `scope` (the nearDupPairs discipline)
    val bk = scope.cache(per.crossJoin(broadcast(bounds)).select(
      col(userCol), col("nu"), col("m_cents"),
      expr("((r_sec - rmin) * 1000) div (rmax - rmin + 1)").as("br"),
      expr("((fq - fmin) * 1000) div (fmax - fmin + 1)").as("bf"),
      expr("((m_cents - mmin) * 1000) div (mmax - mmin + 1)").as("bm")))
    // per metric: bounded histogram (≤ 1001 rows) → strictly-below
    // cumulative → integer population quintile, broadcast back
    def quintiles(bCol: String): DataFrame = {
      val w = Window.orderBy(bCol)
        .rowsBetween(Window.unboundedPreceding, -1)
      bk.groupBy(col(bCol), col("nu"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__below", coalesce(sum(col("__c")).over(w), lit(0L)))
        .select(col(bCol), expr("(__below * 5) div nu").as(s"q_$bCol"))
    }
    bk.join(broadcast(quintiles("br")), "br")
      .join(broadcast(quintiles("bf")), "bf")
      .join(broadcast(quintiles("bm")), "bm")
      .select(col(userCol),
        (col("q_br") * 100 + col("q_bf") * 10 + col("q_bm")).as("segment"),
        col("m_cents"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_users"), sum(col("m_cents")).as("total_cents"))
  }

  /** First-touch conversion attribution: credit each conversion event
    * to the type of the FIRST event in its session (same `gapSeconds`
    * law as the sessionize family), answering "which entry action
    * leads to conversions" — the classic marketing-attribution rollup,
    * here over the engine's own session assignment so the answer is
    * consistent with every other session-scoped query.
    *
    * Scale shape: one user-partitioned window sort carries the session
    * flag, the running session id, AND the per-session first type
    * (same partition key and ordering → one exchange + one sort);
    * conversions then filter map-side and the rollup is bounded by the
    * type vocabulary. The distinct-user count is the only extra
    * exchange, keyed by (type, user) with partial aggregation. */
  def firstTouchAttribution(
      events: DataFrame,
      conversionType: String = "purchase",
      userCol: String = "user_id",
      typeCol: String = "event_type",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      gapSeconds: Int = 1800): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(gapSeconds > 0, s"need gapSeconds > 0, got $gapSeconds")
    val wu = Window.partitionBy(userCol).orderBy("sec", tieCol)
    val wRun = wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ws = Window.partitionBy(userCol, "session_id").orderBy("sec", tieCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col(userCol), col(tieCol), col(typeCol).as("cur"),
        unix_timestamp(col(tsCol)).as("sec"))
      .withColumn("prev_sec", lag(col("sec"), 1).over(wu))
      .withColumn("new_session",
        when(col("prev_sec").isNull ||
          col("sec") - col("prev_sec") > gapSeconds, 1).otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .withColumn("first_touch", first(col("cur")).over(ws))
      .where(col("cur") === conversionType)
      .groupBy(col("first_touch").as("first_touch_type"))
      .agg(
        count(lit(1)).as("n_conversions"),
        countDistinct(col(userCol)).as("n_users"))
  }

  /** Interval-concurrency profile — per hour bucket, the PEAK number of
    * simultaneously active sessions plus the start/end endpoint counts:
    * the capacity question (how many concurrent users must the serving
    * tier hold?) that an interval self-join answers in O(n·m) and this
    * answers in O(n log n).
    *
    * Shape: sessionize (the `q29` gap rule — one window per user, the
    * natural partitioning), emit two endpoint rows per session
    * (half-open [first, last+1), so back-to-back sessions never
    * overlap), then ONE distributed prefix sum over the global
    * endpoint order (`GlobalSort.globalPrefixSum` — range partition +
    * per-partition offsets, never an Exchange SinglePartition) turns
    * ±1 deltas into the running active count. Peak within a bucket is
    * `max(greatest(after, before))` where before = after - d, which
    * correctly reads a concurrency level that only FALLS inside the
    * bucket (the first end's before-value carries the level the bucket
    * inherited). Hours with no endpoints are omitted — between
    * endpoints concurrency is constant, and the dense-spine fill is
    * `gapFillCounts`'s job if a consumer wants it.
    *
    * The endpoint order (t, d, uid, sid) is total (sid unique per uid)
    * and puts ends before starts at equal t (d = -1 < +1) — the
    * half-open-interval tie rule.
    *
    * `parts` = 0 (default) sizes the range partitioning from the
    * events relation via `ShuffleBudget.advise` — the library's
    * data-proportional discipline; endpoints are ≤ 2 rows per event,
    * so the un-inflated source estimate already errs upward. */
  def concurrencyProfile(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      gapSec: Long = 1800L,
      parts: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(gapSec > 0, s"need gapSec > 0, got $gapSec")
    val p = if (parts > 0) parts else graft.util.ShuffleBudget.advise(events)
    val w = Window.partitionBy("uid").orderBy("sec", "tie")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events
      .select(col(userCol).as("uid"), col(tieCol).as("tie"),
        unix_timestamp(col(tsCol)).as("sec"))
      .withColumn("prev", lag(col("sec"), 1).over(w))
      .withColumn("ns",
        when(col("prev").isNull || col("sec") - col("prev") > gapSec, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("ns")).over(wRun))
      .groupBy("uid", "sid")
      .agg(min(col("sec")).as("t0"), (max(col("sec")) + 1L).as("t1"))
    val pts = sess.select(col("uid"), col("sid"), col("t0").as("t"),
        lit(1L).as("d"))
      .unionByName(sess.select(col("uid"), col("sid"), col("t1").as("t"),
        lit(-1L).as("d")))
    GlobalSort.globalPrefixSum(pts,
        Seq(col("t"), col("d"), col("uid"), col("sid")), "d", p)
      .withColumn("conc", col("cum") + col("d"))
      .groupBy(date_format(
        timestamp_seconds(expr("(t div 3600) * 3600")),
        "yyyy-MM-dd HH:mm:ss").as("hour_ts"))
      .agg(
        max(greatest(col("conc"), col("cum"))).as("max_conc"),
        sum(when(col("d") === 1L, 1L).otherwise(0L)).as("n_starts"),
        sum(when(col("d") === -1L, 1L).otherwise(0L)).as("n_ends"))
  }

  /** Per-user event-sequence pattern matching — the MATCH_RECOGNIZE
    * capability in its distributed-friendly form: each user's event
    * types, ordered by (time, tieCol), are encoded to a one-char
    * alphabet and matched against a regex; emits users with ≥ 1
    * non-overlapping match. The funnel question `funnelStages` answers
    * ordinally (reached step i somewhere) this answers structurally
    * (the steps occurred CONSECUTIVELY up to the pattern's own
    * tolerance, e.g. `vc*p` = a view, any clicks, then purchase with
    * nothing else between).
    *
    * Scale shape: one shuffle (groupBy user), per-user state O(their
    * history) — the same per-entity bound every sessionization carries
    * — and the regex pass is per-user linear. Event types outside
    * `encode` map to '#', which matches nothing in the sane pattern
    * alphabet and so acts as an adjacency breaker. `pattern` is
    * restricted to a quote-free alphabet so both engines' regex
    * dialects (Java here, RE2 in the DuckDB oracle) agree and the
    * oracle SQL interpolation is injection-safe. */
  def patternFunnels(
      events: DataFrame,
      pattern: String,
      encode: Seq[(String, String)],
      userCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    require(pattern.nonEmpty && pattern.forall(c =>
        c.isLetterOrDigit || "*+?|()[]".contains(c)),
      s"pattern must use only [A-Za-z0-9*+?|()\\[\\]], got '$pattern'")
    require(encode.nonEmpty && encode.forall(_._2.length == 1),
      "encode must map each event type to exactly one character")
    val m = map(encode.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    events
      .select(col(userCol).as("user_id"),
        struct(unix_timestamp(col(tsCol)).as("sec"), col(tieCol).as("tie"),
          coalesce(m(col(typeCol)), lit("#")).as("ch")).as("s"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), collect_list(col("s")).as("ss"))
      .select(col("user_id"),
        size(expr(s"regexp_extract_all(concat_ws('', transform(" +
          s"array_sort(ss), x -> x.ch)), '$pattern', 0)"))
          .cast("long").as("n_matches"),
        col("n_events"))
      .where(col("n_matches") > 0)
  }
}
