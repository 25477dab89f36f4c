package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed total order with global ranks — terasort's shape.
  *
  * The naive rank (`row_number` over an empty window partition) is a
  * scale-killer: Spark plans it as Exchange SinglePartition, one
  * executor sorts 100 TB. The distributed form is the two-pass
  * classic the reference's sorted-reduce hints at but never needed
  * (its reducers sort only within a partition, `w7/src/worker/
  * worker.h:152-170`):
  *
  *   1. range-partition on the sort key (sampled boundaries) and sort
  *      within each partition — every partition now holds a
  *      contiguous, internally-sorted key range;
  *   2. count rows per partition (a tiny metadata job — `parts`
  *      longs to the driver, nothing else moves) and prefix-sum the
  *      counts into per-partition starting offsets;
  *   3. one map pass stamps offset + local index.
  *
  * `zipWithIndex` is exactly steps 2+3. One data shuffle total, rank
  * assignment embarrassingly parallel. The caller must make
  * `sortExprs` a TOTAL order (include a unique tiebreaker) or ranks
  * of tied rows are partition-placement-dependent.
  */
object GlobalSort {

  def globalRank(
      df: DataFrame,
      sortExprs: Seq[Column],
      parts: Int,
      rankCol: String = "rnk"): DataFrame = {
    val spark = df.sparkSession
    val ranged = df
      .repartitionByRange(parts, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
    val ranked = ranged.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1))
    }
    spark.createDataFrame(ranked, ranged.schema.add(rankCol, LongType, nullable = false))
  }
}
