package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.GlobalSort

/** Global rank must agree with the single-partition window form and
  * must never plan an Exchange SinglePartition. */
class GlobalSortSpec extends SparkSpec {
  import spark.implicits._

  test("globalRank matches row_number over the same total order") {
    val o = io.Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    val got = GlobalSort.globalRank(
        o, Seq(col("o_totalprice").desc, col("o_orderkey").asc), parts = 4)
      .select("o_orderkey", "rnk").as[(Long, Long)].collect().toMap
    val want = o
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc))
          .cast("long"))
      .select("o_orderkey", "rnk").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("ranks are a 1..n permutation across many partitions") {
    val df = (1L to 10000L).toDF("k").repartition(8)
    val ranks = GlobalSort.globalRank(df, Seq(col("k").desc), parts = 8)
      .select("rnk").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to 10000L))
  }

  test("histogram quantile estimates are within one bin width of the exact values") {
    val exact = SparkEntry.queries("quantiles_exact")(spark, sf)
      .select("v").as[Double].collect().sorted
    val est = SparkEntry.queries("quantiles_hist")(spark, sf)
      .orderBy("q").select("est").as[Double].collect()
    val li = io.Tables(spark, sf, "lineitem")
      .agg(min("l_extendedprice"), max("l_extendedprice")).as[(Double, Double)].head()
    val binWidth = (li._2 - li._1) / 4096
    exact.zip(est).foreach { case (ex, es) =>
      assert(es <= ex && ex - es <= binWidth,
        s"estimate $es should be the bin lower edge under exact $ex (width $binWidth)")
    }
  }

  test("plan range-partitions and never collapses to a single partition") {
    // the rank stamping lives behind an RDD boundary (zipWithIndex), so
    // audit the shuffle stage itself: the exchange must be
    // RangePartitioning, and nothing in either stage may plan the
    // Exchange SinglePartition a bare global row_number would
    val o = io.Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    val sortExprs = Seq(col("o_totalprice").desc, col("o_orderkey").asc)
    val rangedPlan = o.repartitionByRange(4, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(rangedPlan.contains("rangepartitioning"), s"plan:\n$rangedPlan")
    assert(!rangedPlan.contains("singlepartition"), s"plan:\n$rangedPlan")
    val rankedPlan = GlobalSort.globalRank(o, sortExprs, parts = 4)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!rankedPlan.contains("singlepartition"), s"plan:\n$rankedPlan")
  }
}
