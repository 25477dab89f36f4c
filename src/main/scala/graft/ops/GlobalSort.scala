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

  /** Distributed EXCLUSIVE prefix sum of `valueCol` over the total
    * order `sortExprs` — the generalization of `globalRank` from
    * "count of earlier rows" to "sum of earlier values", and the
    * primitive behind concat-and-split sequence packing.
    *
    * Same two-pass shape as zipWithIndex: range-partition + sort, one
    * metadata job sums each partition (`parts` longs to the driver —
    * the rank-offset budget), scanLeft turns them into partition
    * starting offsets, and one map pass stamps offset + running local
    * sum. `cumCol` = sum of `valueCol` over all rows strictly BEFORE
    * this row. One data shuffle total; the caller must make
    * `sortExprs` a TOTAL order or tied rows' sums are
    * placement-dependent. */
  def globalPrefixSum(
      df: DataFrame,
      sortExprs: Seq[Column],
      valueCol: String,
      parts: Int,
      cumCol: String = "cum"): DataFrame = {
    val spark = df.sparkSession
    val ranged = df
      .repartitionByRange(parts, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
    val vIdx = ranged.schema.fieldIndex(valueCol)
    val rdd = ranged.rdd
    val partSums = rdd
      .mapPartitionsWithIndex { (p, it) =>
        var s = 0L
        while (it.hasNext) s += it.next().getLong(vIdx)
        Iterator((p, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    val stamped = rdd.mapPartitionsWithIndex { (p, it) =>
      var acc = offsets(p)
      it.map { row =>
        val out = Row.fromSeq(row.toSeq :+ acc)
        acc += row.getLong(vIdx)
        out
      }
    }
    spark.createDataFrame(stamped, ranged.schema.add(cumCol, LongType, nullable = false))
  }
}
