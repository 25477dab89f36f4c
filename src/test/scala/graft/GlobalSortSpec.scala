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

  test("globalPrefixSum matches the window running sum over the same total order") {
    val o = io.Tables(spark, sf, "orders")
      .select(col("o_orderkey"), (pmod(col("o_orderkey"), lit(97)) + 1).as("v"))
    val got = GlobalSort.globalPrefixSum(
        o, Seq(col("o_orderkey").asc), "v", parts = 4, cumCol = "start")
      .select("o_orderkey", "start").as[(Long, Long)].collect().toMap
    val want = o
      .withColumn("start",
        coalesce(sum(col("v")).over(
          Window.orderBy(col("o_orderkey").asc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("o_orderkey", "start").as[(Long, Long)].collect().toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("globalPrefixSum is exclusive: first row 0, last row total minus its value") {
    val df = (1L to 5000L).map(i => (i, i % 13 + 1)).toDF("k", "v").repartition(8)
    val cum = GlobalSort.globalPrefixSum(df, Seq(col("k").asc), "v", parts = 8)
      .orderBy("k").select("k", "v", "cum").as[(Long, Long, Long)].collect()
    assert(cum.head._3 == 0L)
    val total = cum.map(_._2).sum
    assert(cum.last._3 == total - cum.last._2)
    // running invariant: cum(i+1) == cum(i) + v(i)
    cum.sliding(2).foreach { case Array(a, b) => assert(b._3 == a._3 + a._2) }
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
