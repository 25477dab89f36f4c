package graft

import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("custom physical top-k-per-key equals window row_number formulation") {
    val o = io.Tables(spark, sf, "orders")
    val custom = TopKPerKey(o, Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .as[(Long, Long, Double)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val window = o.withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .as[(Long, Long, Double)].collect().toSet
    assert(custom == window)
    assert(custom.nonEmpty)
  }

  test("plan contains TopKPerKeyExec partial/final around one exchange") {
    val o = io.Tables(spark, sf, "orders")
    val plan = TopKPerKey(o, Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
      .queryExecution.executedPlan.toString
    assert("TopKPerKey \\[".r.findAllIn(plan).length == 2, plan) // partial + final
    assert(plan.contains(", true"), plan)  // partial stage before the exchange
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }

  test("ties and small groups: k larger than group size returns whole group") {
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v")
    val got = TopKPerKey(df, Seq("k"), Seq(("v", false)), 5)
      .as[(Int, Int)].collect().toSet
    assert(got == Set((1, 10), (1, 20), (2, 5)))
  }
}
