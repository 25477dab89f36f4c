package graft

import org.apache.spark.sql.functions._

/** Round-3 plan audit: formatted plans of the queries whose physical
  * shape changed this round (fixed-K IVF quantizer, bounded-heap ANN
  * ranking) — plan-only, nothing executes. */
object AuditR3 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, 8, "audit-r3")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val emb = io.Tables(spark, dir, "embeddings")
    println("=== ann_ivf_topk (fixed-K quantizer) ===")
    ext.Similarity.ivfTopK(emb, "vec_id", "embedding", col("vec_id") < 10, 10)
      .explain("formatted")
    println("=== ann_topk (bounded-heap ranking) ===")
    val probes = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    ext.Similarity.bruteForceTopK(emb, probes, "vec_id", "embedding", "probe_id", "pe", 10)
      .explain("formatted")
    println("=== split_assign (map-only) ===")
    SparkEntry.queries("split_assign")(spark, dir).explain("formatted")
    spark.stop()
  }
}
