package graft

import org.apache.spark.sql.functions._

/** The pre-partitioned-layout story: two tables bucketed on the join
  * key join and aggregate with NO shuffle exchange — the bucket spec
  * IS the partitioning, which is what a 100 TB deployment
  * pre-materializes for its hot join keys. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("join and aggregation over co-bucketed tables plan zero exchanges") {
    val orders = io.Tables(spark, sf, "orders")
    val customer = io.Tables(spark, sf, "customer")
    io.Sinks.writeBucketed(
      orders.select("o_orderkey", "o_custkey", "o_totalprice"), "orders_bkt", 8, Seq("o_custkey"))
    io.Sinks.writeBucketed(
      customer.select("c_custkey", "c_name"), "customer_bkt", 8, Seq("c_custkey"))
    try {
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("o_totalprice").as("total"))
      val rows = joined.count()
      // small tables would normally broadcast — disable to prove the
      // bucket layout alone removes the shuffles a sort-merge join and
      // the aggregation would otherwise need
      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        joined.collect()
        val plan = joined.queryExecution.executedPlan.toString
          .split("== Initial Plan ==").head
        assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      // and the result matches the plain (shuffling) formulation
      val expected = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("o_custkey").agg(count(lit(1)).as("n"), sum("o_totalprice").as("total"))
        .as[(Long, Long, Double)].collect().toSet
      val got = joined.as[(Long, Long, Double)].collect().toSet
      assert(got == expected && rows > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
