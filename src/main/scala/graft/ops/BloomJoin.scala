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
    * 8-hex-char slices of the key's md5 digest mod m — engine-
    * independent (an external SQL engine derives identical positions
    * from `substring(md5(key), 1+8*i, 8)`), uniform, and cheap (one
    * md5 per row feeds all d probes). d ≤ 4 fits one 32-hex digest. */
  private[graft] def bitPositions(key: Column, d: Int, words: Int): Column = {
    require(d >= 1 && 8 * d <= 32, s"need 1..4 md5 slices of 8 hex chars, got d=$d")
    val m = words.toLong * 64
    val dig = md5(key.cast("string").cast("binary"))
    array((0 until d).map(i =>
      pmod(conv(substring(dig, 1 + 8 * i, 8), 16, 10).cast("long"), lit(m))): _*)
  }

  /** Rows of `big` whose `bigKey` MIGHT be in `small.smallKey` —
    * a superset of the true semi-join, never missing a match.
    *
    * Plan shape: one pass over `small` builds the bitmap (partial
    * aggregation, OR-merge), a broadcast of `words`·8 bytes, and a
    * codegen'd filter on `big` — no shuffle of `big` at all. */
  def mightMatch(
      big: DataFrame,
      bigKey: Column,
      small: DataFrame,
      smallKey: Column,
      d: Int = 3,
      words: Int = 16384): DataFrame = {
    val bloom = small
      .select(bitPositions(smallKey, d, words).as("pos"))
      .agg(udaf(Aggregators.BloomOr(words)).apply(col("pos")).as("__bloom_bits"))
    val withPos = big
      .crossJoin(broadcast(bloom))
      .withColumn("__bloom_pos", bitPositions(bigKey, d, words))
    val hit = (1 to d)
      .map { i =>
        // word = pos div 64, bit = pos mod 64; SQL shiftright takes
        // column operands (the DataFrame helper only takes literals)
        expr(s"""(shiftright(
                |   element_at(__bloom_bits, cast(element_at(__bloom_pos, $i) div 64 as int) + 1),
                |   cast(element_at(__bloom_pos, $i) % 64 as int)) & 1) = 1""".stripMargin)
      }
      .reduce(_ && _)
    withPos.filter(hit).drop("__bloom_bits", "__bloom_pos")
  }
}
