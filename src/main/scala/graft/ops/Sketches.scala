package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Query-shaped fronts for the sketch aggregators. */
object Sketches {

  /** KMV distinct-count estimate over a column of uniform `bits`-bit
    * hashes: one pass, bounded state (≤ k longs per partition cross the
    * shuffle — never a distinct exchange). Returns a single row
    * (kth_min, est):
    *   - sketch not full → its size IS the exact distinct count
    *     (est exact, kth_min = current max of the buffer);
    *   - full → est = (k−1)·2^bits div kth_min, exact int64 division;
    *   - empty input → (null, 0) instead of `element_at(_, 0)` erroring.
    * Exact-vs-estimate accuracy is asserted in `SketchSpec`; shipping an
    * exact `countDistinct` beside the sketch would pay the very shuffle
    * the sketch exists to avoid. */
  def kmvDistinct(hashes: DataFrame, hashCol: String, k: Int, bits: Int): DataFrame = {
    require(bits < 63 && k > 1, s"need 1 < k and bits < 63, got k=$k bits=$bits")
    require((k - 1).toLong <= (Long.MaxValue >> bits), s"(k-1)*2^$bits overflows int64")
    val space = 1L << bits
    hashes
      .agg(udaf(Aggregators.KMinValues(k)).apply(col(hashCol)).as("mins"))
      .select(
        when(size(col("mins")) > 0, element_at(col("mins"), size(col("mins"))))
          .as("kth_min"),
        when(size(col("mins")) < k, size(col("mins")).cast("long"))
          .otherwise(expr(s"(${(k - 1).toLong * space}L) div element_at(mins, $k)"))
          .cast("long").as("est"))
  }
}
