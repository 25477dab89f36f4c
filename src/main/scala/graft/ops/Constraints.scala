package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Declarative data-quality constraint checking — the admission gate a
  * 100 TB ingest runs before a batch joins the corpus (the Deequ/
  * Great-Expectations workload, expressed as one Spark aggregate). The
  * reference validates records imperatively inside map functions; a
  * declarative rule set makes the validation itself data: each rule is
  * a name plus a VIOLATION predicate, and the report is one row per
  * rule with its violation count — zero means the batch honors the
  * contract.
  *
  * Scale shape: every row-level rule compiles to a conditional sum
  * inside ONE aggregation pass — adding rules adds columns to the
  * partial aggregate (a handful of longs of state each), never passes
  * over the data. Key-uniqueness cannot be a row predicate; it rides
  * the SAME `agg` as `count(*) − count_distinct(key)` (violations =
  * surplus rows beyond their key's first), which Spark plans as one
  * expand + hash aggregate — an unavoidable distinct exchange on the
  * key, the honest minimum for exact uniqueness. The one stats row is
  * then unpivoted with `stack` (the `analyzeColumns` discipline). */
object Constraints {

  /** One-pass constraint report: `(rule, n_violations)` per rule, in
    * the given order (rule names must be unique and SQL-literal-safe).
    * `rowRules` pair a name with the predicate that marks a VIOLATING
    * row (null predicate results count as violations — an unexpected
    * null is never silently compliant); `uniqueKeys` pair a name with
    * the column set that must be row-unique. */
  def check(
      df: DataFrame,
      rowRules: Seq[(String, Column)],
      uniqueKeys: Seq[(String, Seq[String])] = Nil,
      fdRules: Seq[(String, (Seq[String], Seq[String]))] = Nil): DataFrame =
    unpivotReport(wideCheck(df, rowRules, uniqueKeys, fdRules),
      rowRules.map(_._1) ++ uniqueKeys.map(_._1) ++ fdRules.map(_._1))

  /** The report's aggregation half alone: ONE row with a `__c_<i>`
    * violation-count column per rule. Split out because a STREAMING
    * gate can run this as a Complete-mode global aggregate (state =
    * this one row of partial sums) but cannot append a generator to a
    * streaming aggregate — the stream sinks the wide row and
    * [[unpivotReport]] reshapes it batch-side. Streams cannot carry
    * `uniqueKeys` (distinct aggregates are unsupported over streams —
    * exact uniqueness is inherently corpus-wide, a batch/compaction-
    * time check). */
  private[graft] def wideCheck(
      df: DataFrame,
      rowRules: Seq[(String, Column)],
      uniqueKeys: Seq[(String, Seq[String])] = Nil,
      fdRules: Seq[(String, (Seq[String], Seq[String]))] = Nil): DataFrame = {
    val names = rowRules.map(_._1) ++ uniqueKeys.map(_._1) ++ fdRules.map(_._1)
    require(names.nonEmpty, "need at least one rule")
    require(names.distinct.size == names.size, s"duplicate rule names in $names")
    require(names.forall(n => !n.contains("'") && !n.contains("\\")),
      "rule names must be SQL-literal-safe")
    val aggs =
      rowRules.zipWithIndex.map { case ((_, violated), i) =>
        sum(when(coalesce(violated, lit(true)), 1L).otherwise(0L)).as(s"__c_$i")
      } ++
        uniqueKeys.zipWithIndex.map { case ((_, cols), i) =>
          (count(lit(1)) - count_distinct(struct(cols.map(col): _*)))
            .as(s"__c_${rowRules.size + i}")
        } ++
        // functional dependency X → Y: violations = the number of
        // EXTRA (X, Y) combinations beyond one per X — zero iff every
        // X value determines a single Y; rides the same agg as the
        // uniqueness rules (one distinct exchange each, the honest
        // minimum for an exact FD check)
        fdRules.zipWithIndex.map { case ((_, (lhs, rhs)), i) =>
          (count_distinct(struct((lhs ++ rhs).map(col): _*)) -
            count_distinct(struct(lhs.map(col): _*)))
            .as(s"__c_${rowRules.size + uniqueKeys.size + i}")
        }
    df.agg(aggs.head, aggs.tail: _*)
  }

  /** Reshape the wide one-row aggregate to `(rule, n_violations)` in
    * the given rule order. */
  private[graft] def unpivotReport(wide: DataFrame, names: Seq[String]): DataFrame = {
    val fields = names.zipWithIndex.map { case (n, i) => s"'$n', __c_$i" }
    wide.select(expr(
      s"stack(${fields.size}, ${fields.mkString(", ")}) AS (rule, n_violations)"))
  }

  /** Schema-drift report for an evolving table: how `batch`'s schema
    * differs from the table's current `base` schema, one row per
    * drifted column — `added` (new in the batch; parquet absorbs it,
    * earlier files null-fill on merged reads), `dropped` (absent from
    * the batch; the batch's files null-fill), or `retyped` (same name,
    * different type — the ONE drift `mergeSchema` cannot reconcile,
    * so it must fail at the admission gate, not as a read-time merge
    * error after the batch landed). Pure driver-side metadata — zero
    * jobs, O(|schema|) — the schema-level sibling of [[check]]'s
    * row-level gate. Comparison is by lowercase name (Spark's
    * resolution default) and DDL type string (nested types compare
    * structurally). */
  def schemaDrift(base: StructType, batch: StructType): Seq[(String, String, String)] = {
    def m(s: StructType) =
      s.fields.map(f => f.name.toLowerCase -> f.dataType.sql).toMap
    val (b, n) = (m(base), m(batch))
    val added = (n.keySet -- b.keySet).toSeq.sorted
      .map(c => (c, "added", n(c)))
    val dropped = (b.keySet -- n.keySet).toSeq.sorted
      .map(c => (c, "dropped", b(c)))
    val retyped = (b.keySet & n.keySet).toSeq.sorted
      .collect { case c if b(c) != n(c) => (c, "retyped", s"${b(c)} -> ${n(c)}") }
    added ++ dropped ++ retyped
  }

  /** Admission wrapper: throws on `retyped` drift (the irreconcilable
    * kind), returns the benign drift rows for the caller's audit log. */
  def requireCompatible(base: StructType, batch: StructType): Seq[(String, String, String)] = {
    val drift = schemaDrift(base, batch)
    val bad = drift.filter(_._2 == "retyped")
    require(bad.isEmpty, s"retyped columns cannot evolve in place: $bad")
    drift
  }

  /** k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala et
    * al. 2007) — the re-identification gate a privacy review runs
    * before person-derived data joins a training corpus: every
    * EQUIVALENCE CLASS over the quasi-identifier columns (the
    * attributes an attacker can link against outside data) with its
    * size and the diversity of the sensitive attribute within it. A
    * class below `k` rows re-identifies its members by linkage; a
    * class whose members all share one sensitive value discloses that
    * value to anyone who can place a person in the class even when the
    * class is large (the homogeneity attack l-diversity exists for).
    * The full per-class report — not just the violators — so the same
    * relation drives the release decision, the risk dashboard, and
    * [[suppressNonAnonymous]]'s keep set.
    *
    * Scale shape: ONE hash aggregate over the quasi columns (map-side
    * partials; the `count_distinct` rides the same agg as the FD rules
    * in [[check]] — one expand + distinct exchange, the honest minimum
    * for exact diversity). The result is O(classes) rows, bounded by
    * the quasi-identifier domain product — small by definition, or
    * k-anonymity would be unachievable on the table at all. */
  def privacyReport(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitive: Column,
      k: Long,
      l: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1 && l >= 1, s"need k >= 1 and l >= 1, got k=$k l=$l")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(sensitive).as("n_sensitive"))
      .select(quasiCols.map(col) ++ Seq(
        col("n_rows"), col("n_sensitive"),
        (col("n_rows") >= k).as("k_anonymous"),
        (col("n_sensitive") >= l).as("l_diverse")): _*)
  }

  /** Suppression release transform: keep only rows whose equivalence
    * class passes BOTH gates of [[privacyReport]] — the simplest
    * k-anonymization (drop the linkable sliver) and the baseline every
    * generalization scheme is judged against. The passing-class keys
    * are O(classes) rows broadcast back into a map-side semi-join, so
    * the corpus pass never shuffles. */
  def suppressNonAnonymous(
      df: DataFrame,
      quasiCols: Seq[String],
      sensitive: Column,
      k: Long,
      l: Long): DataFrame = {
    val keep = privacyReport(df, quasiCols, sensitive, k, l)
      .where(col("k_anonymous") && col("l_diverse"))
      .select(quasiCols.map(col): _*)
    df.join(broadcast(keep), quasiCols)
  }

  /** Differentially-private release of grouped counts — the geometric
    * mechanism (Ghosh–Roughgarden–Sundararajan, the utility-optimal
    * one for counts): each class count is published with additive
    * two-sided-geometric noise X = G₁ − G₂ where the Gᵢ are iid
    * Geometric(1/2), i.e. P(X = d) ∝ 2^(−|d|) — the discrete Laplace
    * that is ε-DP at ε = ln 2 for sensitivity-1 queries (contract:
    * each individual contributes ≤ 1 row per class — the same
    * quasi-identifier framing [[privacyReport]] audits; the third leg
    * of the privacy family next to suppression and index purge).
    *
    * The noise is SEEDED: both geometrics derive from bit slices of
    * md5(seed ‖ class key), the key LENGTH-PREFIX-FRAMED per component
    * so distinct classes can never share a hash key (and so a noise
    * draw), and the release replays bit-for-bit — the
    * oracle/test requirement that makes the artifact auditable here.
    * A production publication substitutes fresh randomness per release
    * (a re-derivable seed re-identifies trivially); the mechanism,
    * sensitivity accounting, and post-processing safety are unchanged
    * by that swap, which is the part this operator exists to get
    * right.
    *
    * Geometric sampling is exact integer arithmetic, no floats: for U
    * uniform on {1..2^32} (a 32-bit md5 slice + 1), 32 − ceil(log₂ U)
    * is Geometric(1/2) truncated at 32, and ceil(log₂ n) =
    * length(bin(n−1)) for n ≥ 2 — the bin()-length idiom the BM25 idf
    * already relies on in both engines. The published value is
    * n + clog₂(u₂) − clog₂(u₁) (the two 32s cancel).
    *
    * Scale shape: ONE map-combined hash agg to O(classes) rows; all
    * noise math runs on that sliver. */
  def dpGroupCounts(
      df: DataFrame,
      quasiCols: Seq[String],
      seed: String = "graft-dp-v1"): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one group column")
    require(!seed.contains("'") && !seed.contains("|"),
      "seed must avoid quote/separator chars (oracle SQL literal + key framing)")
    // length-prefix framing makes the class key INJECTIVE: without it,
    // classes ("x|y", "z") and ("x", "y|z") would share one hash key
    // and so one noise draw — perfectly correlated noise across
    // distinct classes, which differencing defeats
    def framed(c: String): Column = {
      val v = col(c).cast("string")
      concat(length(v).cast("string"), lit(":"), v)
    }
    val key = concat_ws("|", (lit(seed) +: quasiCols.map(framed)): _*)
    val h = md5(key.cast("binary"))
    // clog2(u) for the (slice+1) uniform: 0 when u = 0, bin-length of
    // u otherwise — exact ceil(log2(u+1))
    def clog2(from: Int): Column = {
      val u = conv(substring(h, from, 8), 16, 10).cast("long")
      when(u <= 0L, 0L).otherwise(length(bin(u)).cast("long"))
    }
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .select(quasiCols.map(col) :+
        (col("__n") + clog2(9) - clog2(1)).as("dp_count"): _*)
  }
}
