package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys — the failure mode the reference never hits
  * (its demo corpus is uniform) but a 100 TB corpus always does: one
  * giant key (an empty-string fingerprint, a boilerplate document, a
  * celebrity user) lands every row on one reducer.
  *
  * `saltedAgg` is two-phase aggregation: rows are spread across
  * `saltBuckets` sub-keys, partially aggregated, then the (tiny)
  * partials are re-aggregated per real key. AQE's skew-join handling
  * covers joins; this covers single-key aggregation skew, and the same
  * shape applies to any commutative+associative aggregate — exactly the
  * contract the engine's reduce surface already requires
  * (MapReduceJob.reducer).
  */
object Skew {

  /** Salt column: deterministic spread derived from the whole row via a
    * monotonic id would break associativity tests; a hash of extra
    * columns (or spark_partition_id) keeps it deterministic per row. */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Two-phase salted sum/count aggregation: groupBy(key) over skewed
    * data without any single reducer seeing a whole hot key. */
  def saltedAgg(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltBuckets: Int = 64,
      saltSource: Seq[String] = Nil): DataFrame = {
    val saltCols =
      if (saltSource.nonEmpty) saltSource.map(col)
      else Seq(spark_partition_id().cast("int").as("__pid"))
    val partial = df
      .withColumn("__salt", salt(saltBuckets, saltCols: _*))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__n"))
    partial
      .groupBy(keyCol)
      .agg(sum(col("__s")).as(s"sum_$valueCol"), sum(col("__n")).as("n"))
  }
}
