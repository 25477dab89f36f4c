package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 measurement audit: verify that the ShuffleBudget wiring
  * (the advised-eager dedup/graph kernels) reproduces round-8's
  * scaled-partition A/B numbers with NO manual conf — every session
  * here is created at the default fixed 32 shuffle partitions, exactly
  * the configuration whose spill knee round 8 diagnosed, and the
  * kernels must now shed it by self-advising.
  *
  * Round-8 reference cells (manual conf, fresh sessions):
  *   dedup_jaccard_pairs 128×: 52.8 s @32 → 29.7 s @256
  *   dedup_clusters       64×: 78.1 s @32 → 30.4 s @256
  *   dedup_neardup_pairs  64×: 44.4 s @32 → 23.5 s @256
  *
  * One fresh SparkContext per (kernel, factor), untimed f=1 warmup —
  * the isolated-protocol discipline of BenchScale. Output: stderr rows
  * plus one JSON line (AUDIT_r9.json by default).
  */
object AuditR9 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "16,64,128")
      .split(",").map(_.trim.toInt).toSeq
    val only = sys.env.get("SPARK_GRAFT_KERNELS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    def withSession[T](body: SparkSession => T): T = {
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
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

    // per kernel: the self-advising default API vs the lazy plan
    // counted at the session's fixed 32 (the pre-wiring behavior) —
    // BOTH in fresh 32-partition sessions, interleaved same-run so
    // host drift can't masquerade as the win. For dedup_clusters the
    // "fixed" leg still runs CC's own edge-count advice (no lazy form
    // exists — the edges are materialized by construction); its
    // contrast isolates the upstream pair-graph advice, which is where
    // round 8 located the cost.
    import org.apache.spark.sql.DataFrame
    val kernels: Seq[(String, Int, (SparkSession, Int, Boolean) => Long)] = Seq(
      ("dedup_jaccard_pairs", 128, (s, f, adv) =>
        ext.Dedup.jaccardPairs(
          BenchScale.inflateDocs(io.Tables(s, sfDir, "documents"), f),
          "doc_id", "text", shingleN = 3, threshold = 0.5, eager = adv).count()),
      ("dedup_neardup_pairs", 64, (s, f, adv) =>
        ext.Dedup.nearDupPairs(
          BenchScale.inflateDocs(io.Tables(s, sfDir, "documents"), f),
          "doc_id", "text", shingleN = 3, threshold = 0.6, eager = adv).count()),
      ("dedup_clusters", 64, (s, f, adv) =>
        ext.Dedup.connectedComponents(
          ext.Dedup.nearDupPairs(
            BenchScale.inflateDocs(io.Tables(s, sfDir, "documents"), f),
            "doc_id", "text", shingleN = 3, threshold = 0.6, eager = adv),
          "id_a", "id_b").count()),
      ("emb_semdedup", 64, (s, f, adv) =>
        ext.Similarity.semDedupKeep(
          BenchScale.inflateEmbeddings(io.Tables(s, sfDir, "embeddings"), f),
          "vec_id", "embedding", minQdot = 450000L,
          numCentroids = 64 * math.sqrt(f.toDouble).round.toInt,
          eager = adv).count()),
      ("emb_knn_graph", 64, (s, f, adv) =>
        ext.Similarity.knnGraphIvf(
          BenchScale.inflateEmbeddings(io.Tables(s, sfDir, "embeddings"), f),
          "vec_id", "embedding", k = 5, eager = adv).count()))

    val out = scala.collection.mutable.LinkedHashMap.empty[String, Seq[(Int, Double, Double, Long)]]
    for ((name, cap, run) <- kernels if only.forall(_.contains(name))) {
      out(name) = factors.filter(_ <= cap).map { f =>
        def cell(adv: Boolean): (Double, Long) = withSession { spark =>
          run(spark, 1, adv) // untimed warmup: codegen + parquet footers
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          val rows = run(spark, f, adv)
          ((System.nanoTime() - t0) / 1e9, rows)
        }
        val (fixedSec, rows0) = cell(adv = false)
        val (advSec, rows) = cell(adv = true)
        require(rows == rows0, s"$name f=$f: advised/fixed row mismatch $rows vs $rows0")
        System.err.println(
          f"[auditr9] $name%-22s f=$f%-4d fixed32 ${fixedSec}%8.2f s  advised ${advSec}%8.2f s  rows=$rows")
        (f, fixedSec, advSec, rows)
      }
    }
    def cellJson(pick: ((Int, Double, Double, Long)) => Any): String =
      out.map { case (n, runs) =>
        "\"" + n + "\":{" + runs.map(r => "\"" + r._1 + "\":" + pick(r)).mkString(",") + "}"
      }.mkString("{", ",", "}")
    val qJson = cellJson(_._3)
    val fJson = cellJson(_._2)
    val rJson = cellJson(_._4)
    val line =
      s"""{"metric":"audit_r9_advised","sf":"$sfDir","queries":$qJson,"fixed32":$fJson,"rows":$rJson}"""
    println(line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_AUDIT_OUT", "AUDIT_r9.json")),
      line + "\n")
  }
}
