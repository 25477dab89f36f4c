package graft

import org.apache.spark.sql.functions._

import graft.ops.{Aggregators, BloomJoin}

/** Bloom semi-join reduction: no false negatives (so the prefiltered
  * join equals the plain join), real pruning on disjoint keys, and a
  * plan that never shuffles the probe side before the bitmap filter. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("mightMatch is a superset of the true semi-join (no false negatives)") {
    val big = (1L to 2000L).toDF("k")
    val small = Seq(7L, 13L, 999L, 1500L).toDF("j")
    val kept = BloomJoin.mightMatch(big, col("k"), small, col("j"))
      .select("k").as[Long].collect().toSet
    assert(Set(7L, 13L, 999L, 1500L).subsetOf(kept))
  }

  test("prefilter + exact join is byte-identical to the plain join") {
    val li = io.Tables(spark, sf, "lineitem")
    val urgent = io.Tables(spark, sf, "orders")
      .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plain = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    val pruned = BloomJoin.mightMatch(li, col("l_orderkey"), urgent, col("o_orderkey"))
    val viaBloom = pruned.join(urgent, pruned("l_orderkey") === urgent("o_orderkey"))
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    assert(viaBloom.toSeq == plain.toSeq)
  }

  test("disjoint keys are (almost) all pruned — the bitmap really filters") {
    val big = (1L to 5000L).toDF("k")
    val small = (1000000L to 1000050L).toDF("j")
    val survivors = BloomJoin.mightMatch(big, col("k"), small, col("j")).count()
    // 51 keys in a 2^20-bit filter, d=3 → FP rate ~(51*3/2^20)^3 ≈ 0;
    // allow a generous margin so the test never flakes on hash luck
    assert(survivors <= 5, s"expected near-total pruning, got $survivors of 5000")
  }

  test("BloomOr merge is the bitwise union of partition bitmaps") {
    val agg = Aggregators.BloomOr(4)
    val b1 = agg.reduce(agg.zero, Seq(0L, 65L))
    val b2 = agg.reduce(agg.zero, Seq(1L, 255L))
    val m = agg.merge(b1, b2)
    assert(m(0) == 3L)            // bits 0 and 1
    assert(m(1) == 2L)            // bit 65
    assert(m(3) == Long.MinValue) // bit 255
  }

  test("prunedProbe picks broadcast semi-join for small builds, bloom for large") {
    val li = io.Tables(spark, sf, "lineitem")
    val urgent = io.Tables(spark, sf, "orders")
      .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val smallPlan = BloomJoin.prunedProbe(li, col("l_orderkey"), urgent, col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(smallPlan.contains("BroadcastHashJoin") && smallPlan.contains("LeftSemi"),
      s"small build should broadcast:\n$smallPlan")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try {
      val bigPlan = BloomJoin.prunedProbe(li, col("l_orderkey"), urgent, col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(!bigPlan.contains("Join"), s"large build should take the bloom path:\n$bigPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // both paths feed the same exact join → same final result; the
    // bloom path is a superset of the semi-join, checked elsewhere
  }

  test("probe plan is a scan-direct filter: no exchange, no join, no row-widening") {
    val li = io.Tables(spark, sf, "lineitem")
    val urgent = io.Tables(spark, sf, "orders")
      .where(col("o_orderpriority") === "1-URGENT").select("o_orderkey")
    val plan = BloomJoin.mightMatch(li, col("l_orderkey"), urgent, col("o_orderkey"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"probe side must not shuffle, plan:\n$plan")
    // the first cut attached the bitmap via a broadcast nested-loop
    // join, which copied the whole bitmap into every probe output row
    assert(!plan.contains("Join"), s"probe side must not join, plan:\n$plan")
  }
}
