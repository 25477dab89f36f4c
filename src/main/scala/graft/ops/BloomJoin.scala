package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join reduction — the 100 TB join-pruning pattern.
  *
  * The reference's only join primitive is the D6/D7 hash-partition
  * shuffle (`w7/src/worker/worker.h:117-150`): BOTH sides pay a full
  * shuffle before any row can be dropped. When the probe side is
  * 100 TB and the build side is selective but too large to broadcast
  * as rows, the right plan is: aggregate the build keys into a
  * fixed-size Bloom bitmap (one pass, bitwise-OR merge — a few hundred
  * KB regardless of build cardinality), broadcast the bitmap, filter
  * the probe side AGAINST IT before the shuffle, then run the exact
  * join on the survivors. False positives only cost a little extra
  * shuffle; false negatives are impossible, so the final result is
  * byte-identical to the plain join — which is exactly why the oracle
  * for `bloom_join` is the plain SQL join.
  *
  * Spark's own runtime row-level bloom (InjectRuntimeFilter) applies
  * the same idea automatically in narrow cases; this operator makes it
  * explicit, tunable (d, words), and available to any plan shape.
  */
object BloomJoin {

  /** The d bit positions of one key in a `words`·64-bit bitmap:
    * seed-indexed xxhash64 mod m. Native long hashing — no string
    * casts, no md5 — because bloom positions need no cross-engine
    * reproducibility: false negatives are impossible under ANY hash,
    * so the final joined result (what the oracle checks) is
    * hash-family-independent. The sketch queries use md5 slices
    * precisely because their oracles rebuild the sketch; this one's
    * oracle is the plain join. */
  private[graft] def bitPositions(key: Column, d: Int, words: Int): Column = {
    require(d >= 1, s"need d >= 1 hash probes, got d=$d")
    val m = words.toLong * 64
    array((0 until d).map(i => pmod(xxhash64(lit(i), key), lit(m))): _*)
  }

  /** Rows of `big` whose `bigKey` MIGHT be in `small.smallKey` —
    * a superset of the true semi-join, never missing a match.
    *
    * Plan shape: one pass over `small` builds the bitmap (partial
    * aggregation, OR-merge) and materializes it to the driver —
    * `words`·8 bytes of metadata, O(sketch) not O(data), the same
    * driver-side residence Spark's own InjectRuntimeFilter gives its
    * bloom subquery result — then the probe is a scan-direct
    * codegen'd filter over an inlined literal. No join and no shuffle
    * anywhere near the probe side. (A first cut attached the bitmap
    * as a broadcast crossJoin column; the nested-loop join then
    * copied all `words`·8 bytes into EVERY probe output row — a
    * 75 GB row-materialization tax at sf0.1. Literals are referenced,
    * not copied.) */
  /** Rows of `big` that might match `small.smallKey`, by the cheapest
    * reduction Catalyst's own statistics justify: a build side small
    * enough to broadcast as rows gets an EXACT broadcast semi-join
    * (no false positives at all); anything larger gets the bloom
    * bitmap (fixed `words`·8 bytes at ANY build size). The same
    * size-estimate-driven choice Spark's planner makes between
    * broadcast and shuffle joins, applied to semi-join reduction —
    * callers that follow with the exact join get identical results on
    * either path, so the choice is pure physical planning. */
  def prunedProbe(
      big: DataFrame,
      bigKey: Column,
      small: DataFrame,
      smallKey: Column,
      d: Int = 3,
      words: Int = 16384): DataFrame = {
    val threshold = big.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10485760")
      .stripSuffix("b").trim.toLongOption.getOrElse(10485760L)
    val buildBytes = small.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && buildBytes <= threshold)
      big.join(broadcast(small.select(smallKey.as("__probe_key"))),
        bigKey === col("__probe_key"), "left_semi")
    else
      mightMatch(big, bigKey, small, smallKey, d, words)
  }

  def mightMatch(
      big: DataFrame,
      bigKey: Column,
      small: DataFrame,
      smallKey: Column,
      d: Int = 3,
      words: Int = 16384): DataFrame = {
    val bits: Array[Long] = small
      .select(bitPositions(smallKey, d, words).as("pos"))
      .agg(udaf(Aggregators.BloomOr(words)).apply(col("pos")).as("bits"))
      .head().getSeq[Long](0).toArray
    val bitsLit = lit(bits)
    val pos = bitPositions(bigKey, d, words)
    val hit = (1 to d)
      .map { i =>
        val p = element_at(pos, i)
        val word = element_at(bitsLit, shiftright(p, 6).cast("int") + 1)
        // variable-distance shift: the Scala `shiftright` helper only
        // takes a literal distance, the SQL function takes a column
        call_function("shiftright", word, pmod(p, lit(64)).cast("int"))
          .bitwiseAND(lit(1L)) === 1L
      }
      .reduce(_ && _)
    big.filter(hit)
  }
}
