package graft

import org.apache.spark.sql.functions._

/** Measured recall@10 for every ANN path against brute force —
  * `runMain graft.AuditRecall [sfDir] [nProbes]` (defaults sf0.1,
  * 100 probes). The correctness gate proves each path computes its
  * DECLARED approximation exactly; this audit measures how good that
  * approximation is, which the oracles cannot say. Results recorded in
  * SURVEY §9. */
object AuditRecall {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nProbes = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = GraftSession.local(16, 32, "audit-recall")
    val emb = io.Tables(spark, dir, "embeddings").cache()
    val n = emb.count()
    val pf = col("vec_id") < nProbes
    val probes = emb.where(pf)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))

    val truth = keySet(ext.Similarity
      .bruteForceTopK(emb, probes, "vec_id", "embedding", "probe_id", "pe", 10))
    println(s"[recall] corpus n=$n probes=$nProbes truth pairs=${truth.size}")

    def report(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val got = keySet(df)
      val hit = got.count(truth.contains)
      println(f"[recall] $name%-22s recall@10 = ${hit.toDouble / truth.size}%.4f  (${hit}/${truth.size})")
      spark.catalog.clearCache()
      emb.cache().count()
    }

    report("ann_lsh_topk", ext.Similarity.lshTopK(emb, "vec_id", "embedding", pf, 10, 64))
    report("ann_lsh_mp_topk", ext.Similarity.lshTopKMp(emb, "vec_id", "embedding", pf, 10, 64))
    // the synthetic embeddings are isotropic (no cluster structure) —
    // coarse quantization's worst case, where recall is bought with
    // nprobe; sweep it so the knob's tradeoff is on record
    for (np <- Seq(4, 8, 16, 32))
      report(s"ann_ivf_topk np=$np",
        ext.Similarity.ivfTopK(emb, "vec_id", "embedding", pf, 10, nprobe = np))
    // IVF-PQ's second knob: on isotropic data the 8×16 codebook's ADC
    // ordering is noisy, so the refine (exact re-rank) depth — not the
    // coarse probe — caps recall
    // (16, 160) is the shipped default since round 8 — the grid keeps
    // the cheaper points so the recall-vs-cost trade stays measured
    for ((np, rf) <- Seq((4, 40), (16, 40), (16, 160)))
      report(s"ann_ivfpq_topk np=$np rf=$rf",
        ext.Similarity.ivfPqTopK(emb, "vec_id", "embedding", pf, 10, nprobe = np, refine = rf))
    report("ann_ivfpq_res_topk", ext.Similarity.ivfPqResidualTopK(emb, "vec_id", "embedding", pf, 10))
    spark.stop()
  }

  private def keySet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import df.sparkSession.implicits._
    df.select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
  }
}
