package graft

import org.apache.spark.sql.functions._

/** corpus_pipeline guards: the chained curation DAG's exchange budget
  * (no corpus re-scan, no re-shuffle between stages that share
  * partitioning, broadcast discipline) and the packing invariants. */
class PipelineSpec extends SparkSpec {

  test("pipeline plan: one cached corpus pass, bounded exchange budget, no cartesian") {
    // static plan (AQE re-plans at runtime but keeps the same exchange
    // set; disabling it makes the node census deterministic)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val train = ExtQueries.pipelineTrain(spark, sf, cache = true)
      val plan = train.queryExecution.executedPlan
      val s = plan.toString
      // cached sub-plans print inline under every InMemoryTableScan, so
      // raw substring counts overstate — census DISTINCT physical nodes
      def ids(marker: String): Set[String] =
        (java.util.regex.Pattern.quote(marker) + """[^\n]*\[plan_id=(\d+)\]""")
          .r.findAllMatchIn(s).map(_.group(1)).toSet
      // the chained DAG's exchange budget — exactly one data shuffle
      // per stage that genuinely needs one, nothing re-shuffled:
      //   1. dedup's fingerprint partition (inside the cached corpus
      //      pass — the ONLY corpus-sized exchange in the pipeline),
      //   2. the bench-gram distinct (benchmark-sized),
      //   3. the contaminated-doc rollup (contaminated-sliver-sized),
      //   4. the mixture's per-source count agg (map-combined to
      //      O(sources) rows).
      assert(ids("Exchange hashpartitioning").size == 4,
        s"pipeline hash-exchange budget changed:\n$s")
      // one deliberate single-partition exchange: the Σw total over
      // the O(sources) count relation — metadata-sized by construction
      assert(ids("Exchange SinglePartition").size == 1,
        s"unexpected single-partition exchanges:\n$s")
      // broadcast discipline: policy, bench hashes, contaminated ids,
      // Σw row, rates — all O(config)/O(bench)/O(sources)
      assert(ids("BroadcastExchange").size == 5,
        s"pipeline broadcast set changed:\n$s")
      assert(ids("CartesianProduct").isEmpty, s"cartesian product:\n$s")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.catalog.clearCache()
    }
  }

  test("pipeline exchange budget holds at inflated scale (×8 union legs)") {
    // ask r11 #3: composition is where exchange creep would appear
    // first at 64× — assert the SAME budget over an inflated corpus
    // (union legs add scan legs, never exchanges; the materialized
    // BenchScale protocol reads the same plan off one scan)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val docs0 = io.Tables(spark, sf, "documents")
      val infl = (0 until 8).map(k => docs0.select(
        (col("doc_id") + lit(k.toLong * 1000000000L)).as("doc_id"),
        col("source"), col("text"))).reduce(_ unionByName _)
      val train = ExtQueries.pipelineTrainDocs(spark, infl, cache = true)
      val s = train.queryExecution.executedPlan.toString
      def ids(marker: String): Set[String] =
        (java.util.regex.Pattern.quote(marker) + """[^\n]*\[plan_id=(\d+)\]""")
          .r.findAllMatchIn(s).map(_.group(1)).toSet
      assert(ids("Exchange hashpartitioning").size == 4,
        s"inflated pipeline hash-exchange budget changed:\n$s")
      assert(ids("Exchange SinglePartition").size == 1,
        s"inflated pipeline single-partition exchanges:\n$s")
      assert(ids("BroadcastExchange").size == 5,
        s"inflated pipeline broadcast set changed:\n$s")
      assert(ids("CartesianProduct").isEmpty, s"cartesian product:\n$s")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.catalog.clearCache()
    }
  }

  test("pipeline near-dup dedup stage: pinned production geometry ≡ adaptive output") {
    // ask r11 #6: the per-epoch pinned-geometry override through the
    // capstone — a recall-sufficient pinned schedule (r=2 × 96 bands,
    // ≠ the adaptive pick) must keep-first the same survivors, so
    // pinning is a pure COST knob, never a semantics knob
    val docs = io.Tables(spark, sf, "documents")
    def run(g: Option[(Int, Int)]): Seq[Seq[Any]] = {
      val out = ExtQueries.pipelinePackedDocs(spark, docs, cache = true,
        nearDupGeometry = g).orderBy("doc_id").collect().map(_.toSeq).toSeq
      spark.catalog.clearCache()
      out
    }
    val pinned = run(Some((192, 96)))
    val adaptive = run(Some((0, 0)))
    assert(pinned.nonEmpty)
    assert(pinned == adaptive)
    // and the near-dup stage is genuinely a different dedup law than
    // the exact stage on this corpus (it keeps short un-shingleable
    // docs exact dedup drops, and drops near-dup variants exact dedup
    // keeps) — otherwise this case proves nothing
    val exact = run(None)
    assert(pinned != exact)
  }

  test("pipeline packing invariants: exclusive prefix order, offsets, shard law") {
    val out = ExtQueries.pipelinePacked(spark, sf, cache = true)
      .orderBy("doc_id").collect()
    spark.catalog.clearCache()
    assert(out.nonEmpty)
    var start = 0L
    for (r <- out) {
      val (nTok, packId, packOff, shard) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(packId == start / 256, s"pack_id at doc ${r.getLong(0)}")
      assert(packOff == start % 256, s"pack_offset at doc ${r.getLong(0)}")
      assert(shard == packId % 16, s"shard at doc ${r.getLong(0)}")
      start += nTok
    }
  }
}
