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
    * contract; a high-cardinality key would make the dense grid itself
    * the product, which no deployment wants filled). The grid join is
    * broadcast-left, so nothing about the fill step scales with the
    * event count. */
  def gapFillCounts(
      df: DataFrame,
      tsCol: String,
      keyCol: String,
      unit: String = "hour"): DataFrame = {
    val counts = df
      .groupBy(date_trunc(unit, col(tsCol)).as("bucket_ts"), col(keyCol))
      .agg(count(lit(1)).as("n"))
    val bounds = df.agg(
      date_trunc(unit, min(col(tsCol))).as("lo"),
      date_trunc(unit, max(col(tsCol))).as("hi"))
    val spine = bounds
      .select(explode(expr(s"sequence(lo, hi, interval 1 $unit)")).as("bucket_ts"))
    val keys = df.select(col(keyCol)).distinct()
    spine.crossJoin(broadcast(keys))
      .join(counts, Seq("bucket_ts", keyCol), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
  }
}
