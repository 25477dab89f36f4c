package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounded-range (interval) join: all (left, right) pairs within the
  * same key whose numeric times differ by at most `maxGap` — the other
  * temporal join Spark lacks natively (the as-of join is `AsOfJoin`).
  *
  * A naive non-equi join plans as BroadcastNestedLoopJoin — quadratic
  * per key. This is the standard binned formulation instead: both
  * sides bucket time into `maxGap`-wide bins, the LEFT side is
  * replicated to its bin and both neighbors, and the join is a plain
  * equi-join on (key, bin) followed by the exact |Δt| ≤ maxGap check.
  * Any qualifying pair differs by at most one bin, so it is found in
  * exactly one (left-replica, right-bin) combination — no dedup
  * needed. Cost: the left relation shuffles 3×, the right 1×, and the
  * per-task work is bounded by bin population, not key population —
  * the shape that survives a 100 TB event log.
  */
object RangeJoin {

  /** @param left     left relation
    * @param right    right relation
    * @param key      equality key column name (both sides)
    * @param leftTime left numeric time column (e.g. epoch seconds)
    * @param rightTime right numeric time column
    * @param maxGap   inclusive bound on |leftTime - rightTime| (> 0)
    * @param payload  right columns carried to output as `range_<c>`;
    *                 the exact gap is emitted as `range_gap`
    */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      maxGap: Long,
      payload: Seq[String]): DataFrame = {
    require(maxGap > 0, s"maxGap must be positive, got $maxGap")
    val outNames = payload.map(c => s"range_$c") :+ "range_gap" :+ "__bin" :+ "__rt"
    val clash = left.columns.filter(outNames.contains)
    require(clash.isEmpty,
      s"range join reserves column names ${clash.distinct.mkString(", ")}; rename the left input")
    // exact integral division (`div`), not floor(col / maxGap): the
    // double quotient rounds for values near 2^53 (epoch nanos) and a
    // row can land one bin off on only one side, dropping boundary
    // pairs. `div` truncates toward zero rather than flooring, which
    // only widens bin 0 to (-maxGap, maxGap); bins are still >= maxGap
    // wide everywhere, so a qualifying pair (|dt| <= maxGap) can never
    // sit more than one bin apart and the +/-1 replication stays
    // complete.
    def bin(c: String) = expr(s"CAST(`$c` AS BIGINT) div ${maxGap}L")
    val l = left.withColumn("__bin",
      explode(array(Seq(-1, 0, 1).map(d => bin(leftTime) + d): _*)))
    val r = right.select(
      Seq(col(key), col(rightTime).as("__rt"),
        bin(rightTime).as("__bin")) ++
        payload.map(c => col(c).as(s"range_$c")): _*)
    l.join(r, Seq(key, "__bin"))
      .where(abs(col(leftTime) - col("__rt")) <= maxGap)
      .withColumn("range_gap", abs(col(leftTime) - col("__rt")).cast("long"))
      .drop("__bin", "__rt")
  }
}
