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

  test("tfidf top-3 through TopKPerKey equals the window formulation (string order column)") {
    val docs = io.Tables(spark, sf, "documents")
    val words = docs.select(col("doc_id"), explode(ops.TextOps.tokens(col("text"))).as("word"))
    val tf = words.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
    val df = words.select("doc_id", "word").distinct()
      .groupBy("word").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "word")
      .select(col("doc_id"), col("word"),
        floor(col("tf") * lit(1000000.0) / col("df")).cast("long").as("score"))
    val custom = TopKPerKey(scored, Seq("doc_id"), Seq(("score", false), ("word", true)), 3)
      .select("doc_id", "word", "score")
      .as[(Long, String, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(desc("score"), asc("word"))
    val window = scored.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .select("doc_id", "word", "score")
      .as[(Long, String, Long)].collect().toSet
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

  test("final TopKPerKey reports its partitioning: same-key window adds NO exchange") {
    val o = io.Tables(spark, sf, "orders")
    val topk = TopKPerKey(o.select("o_custkey", "o_totalprice", "o_orderkey"),
      Seq("o_custkey"), Seq(("o_totalprice", false), ("o_orderkey", true)), 2)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(org.apache.spark.sql.functions.desc("o_totalprice"))
    val plan = topk
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .queryExecution.executedPlan.toString
    // exactly the one partial->final exchange; the window reuses the
    // key partitioning instead of re-shuffling the k-bounded output
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }

  test("ties and small groups: k larger than group size returns whole group") {
    val df = Seq((1, 10), (1, 20), (2, 5)).toDF("k", "v")
    val got = TopKPerKey(df, Seq("k"), Seq(("v", false)), 5)
      .as[(Int, Int)].collect().toSet
    assert(got == Set((1, 10), (1, 20), (2, 5)))
  }

  test("near-unique keys with a tiny in-memory cap still produce exact top-k") {
    // 20k distinct-ish keys with the partial-phase map capped at 64 keys:
    // forces many flush batches; the final phase must still merge exactly
    val prev = spark.conf.getOption("graft.topk.maxKeysInMemory")
    spark.conf.set("graft.topk.maxKeysInMemory", "64")
    try {
      val df = spark.range(0, 20000)
        .select((col("id") % 9973).as("k"), (col("id") * 37 % 10007).as("v"), col("id"))
      val custom = TopKPerKey(df, Seq("k"), Seq(("v", false), ("id", true)), 2)
        .select("k", "id").as[(Long, Long)].collect().toSet
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy(desc("v"), asc("id"))
      val window = df.withColumn("rn", row_number().over(w)).where(col("rn") <= 2)
        .select("k", "id").as[(Long, Long)].collect().toSet
      assert(custom == window)
      assert(custom.size > 9973) // most keys have 2+ rows
    } finally {
      prev match {
        case Some(v) => spark.conf.set("graft.topk.maxKeysInMemory", v)
        case None => spark.conf.unset("graft.topk.maxKeysInMemory")
      }
    }
  }

  test("duplicate column names are rejected, not silently bound") {
    val df = Seq((1, 2)).toDF("k", "v").select(col("k"), col("v"), col("v"))
    val e = intercept[RuntimeException] {
      TopKPerKey(df, Seq("k"), Seq(("v", true)), 1)
    }
    assert(e.getMessage.contains("ambiguous"))
  }
}
