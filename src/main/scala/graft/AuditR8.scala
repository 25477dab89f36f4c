package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-8 measurement audit: attribute the LAST-OCTAVE superlinearity
  * of the two exact dedup kernels (`dedup_jaccard_pairs` 16×→64× step
  * 5.4×, `dedup_winnow_pairs` 6.3× in the round-7 BENCH_scale) and
  * extend the probe one octave to 128×.
  *
  * Two modes per kernel, one fresh SparkContext per (factor, config):
  *
  *  - SPARK_GRAFT_STAGEWISE set: per-stage times AND row counts at the
  *    top factors, so the growth can be pinned to a stage. If candidate
  *    rows grow ~×f while a stage's TIME grows superlinearly, the
  *    kernel's algorithmic output is fine and the cost is mechanical
  *    (shuffle/sort spill); if candidate rows themselves grow
  *    superlinearly, the prefix/df-cap geometry is at fault.
  *
  *  - default: the full kernel under two shuffle-partition budgets —
  *    the probe's fixed 32 vs 32·(f/16) (what ANY real deployment does:
  *    shuffle partitions track data volume; a 1000-executor cluster
  *    reading 64× the bytes does not keep 32 reduce slots). A step that
  *    normalizes under scaled partitions is an under-provisioned-
  *    harness artifact, not a kernel defect — per-partition shuffle
  *    blocks crossing the spill threshold — and the honest 100 TB
  *    claim is "linear given proportional reduce slots".
  */
object AuditR8 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "16,64,128")
      .split(",").map(_.trim.toInt).toSeq
    val stagewise = sys.env.get("SPARK_GRAFT_STAGEWISE").isDefined
    val kernels = sys.env.getOrElse("SPARK_GRAFT_KERNELS", "jaccard,winnow")
      .split(",").map(_.trim).toSet

    def withSession[T](parts: Int)(body: SparkSession => T): T = {
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", parts.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.extensions", "graft.functions.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try body(spark) finally { spark.catalog.clearCache(); spark.stop() }
    }

    def timed(label: String, f: Int, parts: Int)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = body
      System.err.println(
        f"[auditr8] $label%-22s f=$f%-4d parts=$parts%-4d ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }

    // BPE trainer realism probe (independent of the inflate factors):
    // production tokenizers train tens of thousands of merges; the
    // driver loop is O(vocab·avg_pieces·merges), so measure whether the
    // default-knob assumption (trivial driver cost) survives 10×
    // merges × 4× vocab on the real corpus. The distributed part (one
    // word-frequency agg) is timed separately so the driver-loop share
    // is attributable.
    if (kernels("bpe")) withSession(32) { spark =>
      val docs = io.Tables(spark, sfDir, "documents"); docs.count()
      // (0, v) rows time the DISTRIBUTED part alone (the word-frequency
      // agg + bounded collect) — the driver-loop share of every other
      // row is the difference
      for ((m, v) <- Seq((0, 8192), (50, 2048), (512, 8192), (2048, 16384))) {
        val t0 = System.nanoTime()
        val got = ext.Bpe.trainMerges(docs, "text", numMerges = m, vocabWords = v)
        System.err.println(
          f"[auditr8] bpe_train merges=$m%-5d vocab=$v%-6d ${(System.nanoTime() - t0) / 1e9}%8.2f s  learned=${got.size}")
      }
    }

    for (f <- factors) {
      if (stagewise) {
        // ---- stage decomposition at the probe's fixed 32 partitions ----
        if (kernels("jaccard")) withSession(32) { spark =>
          val docs0 = io.Tables(spark, sfDir, "documents"); docs0.count()
          val threshold = 0.5; val delta = 3
          val docs = BenchScale.inflateDocs(docs0, f)
          val sh = docs
            .select(col("doc_id"), ext.Dedup.shingleHashSet(col("text"), 3).as("ws"))
            .where(size(col("ws")) > 0).cache()
          timed("jac_sh", f, 32)(sh.count())
          val posts = sh.select(col("doc_id").as("id"), size(col("ws")).as("sz"),
            explode(col("ws")).as("h"))
          val dfreq = posts.groupBy("h").agg(count(lit(1)).as("df"))
          timed("jac_dfreq", f, 32)(dfreq.count())
          val prefix = posts
            .join(dfreq, "h")
            .groupBy(col("id"), col("sz"))
            .agg(collect_list(struct(col("df"), col("h"))).as("dh"))
            .select(col("id"), col("sz"),
              explode(slice(array_sort(col("dh")), lit(1),
                (ceil((lit(1.0) - threshold) * col("sz")) + delta).cast("int"))).as("dh"))
            .select(col("id"), col("sz"), col("dh.h").as("h"))
            .cache()
          timed("jac_prefix", f, 32)(prefix.count())
          val cands = prefix.as("a")
            .join(prefix.as("b"),
              col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
                least(col("a.sz"), col("b.sz")) >=
                  floor(lit(threshold) * greatest(col("a.sz"), col("b.sz"))))
            .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
              col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
            .groupBy("id_a", "id_b", "sz_a", "sz_b")
            .agg(count(lit(1)).as("m"))
            .where(col("m") >= greatest(lit(1), least(lit(delta),
              floor(lit(threshold) * greatest(col("sz_a"), col("sz_b"))))))
            .select("id_a", "id_b")
            .cache()
          timed("jac_cands", f, 32)(cands.count())
          timed("jac_verify", f, 32) {
            cands
              .join(sh.select(col("doc_id").as("id_a"), col("ws").as("ws_a")), "id_a")
              .join(sh.select(col("doc_id").as("id_b"), col("ws").as("ws_b")), "id_b")
              .select(ext.Dedup.jaccard(col("ws_a"), col("ws_b")).as("jaccard"))
              .where(col("jaccard") >= threshold).count()
          }
        }
        if (kernels("winnow")) withSession(32) { spark =>
          val docs0 = io.Tables(spark, sfDir, "documents"); docs0.count()
          val docs = BenchScale.inflateDocs(docs0, f)
          val fp = ext.TextAnalysis.winnowFingerprints(docs, "doc_id", "text")
            .select(col("doc_id").as("id"), col("h")).distinct().cache()
          timed("win_fp", f, 32)(fp.count())
          val sizes = fp.groupBy("id").agg(count(lit(1)).as("nfp"))
          val shareable = fp.groupBy("h").agg(count(lit(1)).as("df"))
            .where(col("df") >= 2 && col("df") <= 64)
            .select("h")
          val keyed = fp.join(shareable, "h").cache()
          timed("win_keyed", f, 32)(keyed.count())
          val pairs = keyed.select(col("h"), col("id").as("a"))
            .join(keyed.select(col("h"), col("id").as("b")), "h")
            .where(col("a") < col("b"))
            .groupBy("a", "b").agg(count(lit(1)).as("shared"))
            .cache()
          timed("win_pairs", f, 32)(pairs.count())
          timed("win_final", f, 32) {
            pairs
              .join(sizes.select(col("id").as("a"), col("nfp").as("na")), "a")
              .join(sizes.select(col("id").as("b"), col("nfp").as("nb")), "b")
              .withColumn("share_permille", expr("(1000 * shared) div least(na, nb)"))
              .where(col("share_permille") >= 500).count()
          }
        }
      } else {
        // ---- full-kernel A/B: fixed-32 vs data-proportional partitions.
        // Untimed f=1 warmup inside each fresh session: codegen/JIT of
        // the kernel's expressions otherwise lands on the timed run
        // (the BenchScale warmup discipline) ----
        val budgets = Seq(32, math.max(32, 32 * f / 16)).distinct
        for (parts <- budgets) {
          if (kernels("jaccard")) withSession(parts) { spark =>
            val docs0 = io.Tables(spark, sfDir, "documents"); docs0.count()
            ext.Dedup.jaccardPairs(docs0, "doc_id", "text",
              shingleN = 3, threshold = 0.5).count()
            timed("jaccard_full", f, parts)(
              ext.Dedup.jaccardPairs(BenchScale.inflateDocs(docs0, f),
                "doc_id", "text", shingleN = 3, threshold = 0.5).count())
          }
          if (kernels("winnow")) withSession(parts) { spark =>
            val docs0 = io.Tables(spark, sfDir, "documents"); docs0.count()
            ext.Dedup.winnowPairs(docs0, "doc_id", "text").count()
            timed("winnow_full", f, parts)(
              ext.Dedup.winnowPairs(BenchScale.inflateDocs(docs0, f),
                "doc_id", "text").count())
          }
          if (kernels("neardup")) withSession(parts) { spark =>
            val docs0 = io.Tables(spark, sfDir, "documents"); docs0.count()
            ext.Dedup.nearDupPairs(docs0, "doc_id", "text", threshold = 0.6).count()
            timed("neardup_full", f, parts)(
              ext.Dedup.nearDupPairs(BenchScale.inflateDocs(docs0, f),
                "doc_id", "text", threshold = 0.6).count())
          }
          if (kernels("clusters")) withSession(parts) { spark =>
            val docs0 = io.Tables(spark, sfDir, "documents"); docs0.count()
            ext.Dedup.connectedComponents(
              ext.Dedup.nearDupPairs(docs0, "doc_id", "text", threshold = 0.6),
              "id_a", "id_b").count()
            timed("clusters_full", f, parts)(
              ext.Dedup.connectedComponents(
                ext.Dedup.nearDupPairs(BenchScale.inflateDocs(docs0, f),
                  "doc_id", "text", threshold = 0.6),
                "id_a", "id_b").count())
          }
        }
      }
    }
  }
}
