package graft

import org.apache.spark.sql.functions._

/** Measured recall@10 for every ANN path against brute force —
  * `runMain graft.AuditRecall [sfDir] [nProbes]` (defaults sf0.1,
  * 100 probes). The correctness gate proves each path computes its
  * DECLARED approximation exactly; this audit measures how good that
  * approximation is, which the oracles cannot say. Results recorded in
  * SURVEY §9.
  *
  * Two regimes per path (round 9):
  *  - "isotropic": the fixture embeddings — no cluster structure, the
  *    THEORETICAL WORST CASE for coarse quantization (every inverted
  *    list boundary cuts through neighbor balls).
  *  - "clustered": a deterministic mixture of well-separated clusters
  *    (below), the shape a real corpus's embedding space actually has
  *    — this is the recall a deployment would see. Same row count as
  *    the fixture so the two columns are comparable.
  */
object AuditRecall {

  /** Deterministic clustered corpus: point i belongs to cluster
    * hash(i) mod `clusters`; coordinate d = center(cluster, d) + noise,
    * center coords ~ U(-1, 1) and noise ~ U(-noiseAmp, noiseAmp), both
    * derived from xxhash64 — seeded, generator-replayable, no RNG
    * state. Separation ratio: E‖c₁−c₂‖² = 2·dim/3 ≈ 42.7 vs
    * E‖noise₁−noise₂‖² = 2·dim·noiseAmp²/3. At the default
    * noiseAmp = 0.6 that's 42.7 vs 15.4 — visible cluster structure
    * (the regime coarse quantization exists for) but with real
    * overlap, so neighbor balls can straddle a list boundary. The
    * default 256 clusters deliberately exceeds the IVF centroid
    * budget (64) AND holds fewer points than k per cluster at the
    * fixture scale (~8 < 10), so every top-10 truth list crosses
    * clusters — real corpora have far more modes than centroids, and
    * a generator with clusters == K and per-cluster count > k makes
    * every path trivially perfect (measured: 1.000 across the board
    * at 64/0.25 and 64/0.6) — a sanity bound, not a deployment
    * number. */
  def clusteredEmbeddings(
      spark: org.apache.spark.sql.SparkSession,
      n: Long,
      dim: Int = 64,
      clusters: Int = 256,
      noiseAmp: Double = 0.6): org.apache.spark.sql.DataFrame = {
    val span = math.round(noiseAmp * 2000).toInt + 1
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d => {
        val c = pmod(xxhash64(lit("c"), col("id")), lit(clusters.toLong))
        val center =
          (pmod(xxhash64(lit("ctr"), c, d), lit(2001L)) - lit(1000L)).cast("double") / lit(1000.0)
        val noise =
          (pmod(xxhash64(lit("nz"), col("id"), d), lit(span.toLong)) - lit(span / 2L)).cast("double") / lit(1000.0)
        (center + noise).cast("float")
      }).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nProbes = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = GraftSession.local(16, 32, "audit-recall")
    val nCorpus = io.Tables(spark, dir, "embeddings").count()
    // targeted re-runs: SPARK_GRAFT_RECALL_REGIMES="clustered16x" (comma
    // list) skips the others — each regime's numbers are independent
    val only = sys.env.get("SPARK_GRAFT_RECALL_REGIMES")
      .map(_.split(",").map(_.trim).toSet)
    def wanted(r: String): Boolean = only.forall(_.contains(r))

    val regimes: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "isotropic" -> io.Tables(spark, dir, "embeddings"),
      "clustered" -> clusteredEmbeddings(spark, nCorpus))

    for ((regime, emb0) <- regimes if wanted(regime)) {
      val emb = emb0.cache()
      val n = emb.count()
      val pf = col("vec_id") < nProbes
      val probes = emb.where(pf)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))

      val truth = keySet(ext.Similarity
        .bruteForceTopK(emb, probes, "vec_id", "embedding", "probe_id", "pe", 10))
      println(s"[recall] regime=$regime corpus n=$n probes=$nProbes truth pairs=${truth.size}")

      def report(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val got = keySet(df)
        val hit = got.count(truth.contains)
        println(f"[recall] $regime%-10s $name%-22s recall@10 = ${hit.toDouble / truth.size}%.4f  (${hit}/${truth.size})")
        spark.catalog.clearCache()
        emb.cache().count()
      }

      report("ann_lsh_topk", ext.Similarity.lshTopK(emb, "vec_id", "embedding", pf, 10, 64))
      report("ann_lsh_mp_topk", ext.Similarity.lshTopKMp(emb, "vec_id", "embedding", pf, 10, 64))
      // isotropic data is coarse quantization's worst case, where
      // recall is bought with nprobe; sweep it so the knob's tradeoff
      // is on record in BOTH regimes
      for (np <- Seq(4, 8, 16, 32))
        report(s"ann_ivf_topk np=$np",
          ext.Similarity.ivfTopK(emb, "vec_id", "embedding", pf, 10, nprobe = np))
      // IVF-PQ's second knob: the refine (exact re-rank) depth — not
      // the coarse probe — caps recall when the ADC ordering is noisy
      // (16, 160) is the shipped default since round 8 — the grid keeps
      // the cheaper points so the recall-vs-cost trade stays measured
      for ((np, rf) <- Seq((4, 40), (16, 40), (16, 160)))
        report(s"ann_ivfpq_topk np=$np rf=$rf",
          ext.Similarity.ivfPqTopK(emb, "vec_id", "embedding", pf, 10, nprobe = np, refine = rf))
      report("ann_ivfpq_res_topk", ext.Similarity.ivfPqResidualTopK(emb, "vec_id", "embedding", pf, 10))
      // SQ8 (round 10): per-dimension 8-bit codes — unlike the
      // bucketed/list paths its candidate set is the WHOLE corpus and
      // only the refine cut loses truth, so recall isolates pure
      // scalar-quantization ordering noise; sweep refine like PQ's
      for (rf <- Seq(40, 160))
        report(s"ann_sq8_topk rf=$rf",
          ext.Similarity.sq8TopK(emb, "vec_id", "embedding", pf, 10, refine = rf))
      // IVF+SQ8 at the shipped defaults: the coarse probe is now the
      // binding cut (SQ8 in-list ordering is near-exact per the rows
      // above), so this should read ≈ ann_ivf_topk at the same nprobe
      // and ABOVE ann_ivfpq_topk at matched knobs — the recall the 4×
      // (vs PQ's 32×) compression buys back
      report("ann_ivf_sq8_topk",
        ext.Similarity.ivfSq8TopK(emb, "vec_id", "embedding", pf, 10))
      // persisted-index serving path (round 10): train-once, parquet
      // round trip, probeIndex at the shipped defaults. By spec its
      // arithmetic equals ivfPqTopK's, so recall must MATCH the
      // nprobe=16/refine=160 row — a drift here means the serve path
      // desynced from the inline one
      report("ann_index_probe", {
        val dirIdx = java.nio.file.Files
          .createTempDirectory(s"recall_idx_$regime").toString
        ext.Similarity.writeAnnIndex(
          ext.Similarity.annIndex(emb, "vec_id", "embedding"), dirIdx)
        ext.Similarity.probeIndex(
          ext.Similarity.readAnnIndex(spark, dirIdx), emb, "vec_id", "embedding", pf, 10)
      })
      // does residual-PQ's reconstruction-error advantage survive
      // clustering? ExtSpec measures it on the fixture (isotropic —
      // where residuals ≈ raw, no centroid structure to subtract);
      // clustered is where coupling the quantizers should win MORE
      val qRaw = ext.Similarity.pqEncode(emb, "vec_id", "embedding")
        .agg(avg(col("qerr"))).head.getDouble(0)
      val qRes = ext.Similarity.pqEncodeResidual(emb, "vec_id", "embedding")
        .agg(avg(col("qerr"))).head.getDouble(0)
      println(f"[recall] $regime%-10s mean qerr: raw-PQ=$qRaw%.0f residual-PQ=$qRes%.0f ratio=${qRes / qRaw}%.3f")
      spark.catalog.clearCache()
      emb.unpersist()
    }

    // Round 13 (verdict r12 ask #5): the degradation DIRECTION at
    // scale, on the regime that matters. IVF-PQ is the path whose
    // recall erodes first as a clustered corpus grows — the coarse
    // budget (64 centroids) is fixed while real corpora add MODES with
    // volume, so each probed cell covers ever more distinct clusters
    // and the ADC ordering noise gets more candidates to mis-rank.
    // This regime inflates the clustered corpus 16× WITH the mode
    // count growing alongside (4096 clusters — preserves the ~8 < k
    // points/cluster honesty property of the base generator), measures
    // the shipped default, and measures which knob buys the recall
    // back (nprobe vs refine) plus the IVF / IVF+SQ8 contrast rows
    // that isolate routing loss from in-list quantizer loss.
    if (wanted("clustered16x")) {
      val regime = "clustered16x"
      val emb = clusteredEmbeddings(spark, nCorpus * 16, clusters = 4096).cache()
      val n = emb.count()
      val pf = col("vec_id") < nProbes
      val probes = emb.where(pf)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      val truth = keySet(ext.Similarity
        .bruteForceTopK(emb, probes, "vec_id", "embedding", "probe_id", "pe", 10))
      println(s"[recall] regime=$regime corpus n=$n probes=$nProbes truth pairs=${truth.size}")
      def report(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val got = keySet(df)
        val hit = got.count(truth.contains)
        println(f"[recall] $regime%-11s $name%-28s recall@10 = ${hit.toDouble / truth.size}%.4f  (${hit}/${truth.size})")
        spark.catalog.clearCache()
        emb.cache().count()
      }
      for ((np, rf) <- Seq((16, 160), (32, 160), (16, 320), (32, 320), (32, 640)))
        report(s"ann_ivfpq_topk np=$np rf=$rf",
          ext.Similarity.ivfPqTopK(emb, "vec_id", "embedding", pf, 10,
            nprobe = np, refine = rf))
      for (np <- Seq(16, 32))
        report(s"ann_ivf_topk np=$np",
          ext.Similarity.ivfTopK(emb, "vec_id", "embedding", pf, 10, nprobe = np))
      report("ann_ivf_sq8_topk",
        ext.Similarity.ivfSq8TopK(emb, "vec_id", "embedding", pf, 10))
      report("ann_ivf_sq8_topk np=32",
        ext.Similarity.ivfSq8TopK(emb, "vec_id", "embedding", pf, 10, nprobe = 32))
      report("ann_sq8_topk rf=160",
        ext.Similarity.sq8TopK(emb, "vec_id", "embedding", pf, 10, refine = 160))
      spark.catalog.clearCache()
      emb.unpersist()
    }
    spark.stop()
  }

  private def keySet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import df.sparkSession.implicits._
    df.select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
  }
}
