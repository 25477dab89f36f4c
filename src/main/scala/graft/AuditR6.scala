package graft

import org.apache.spark.sql.functions._

/** Round-6 measurement audit: reconcile `AuditR5Geom`'s ~20.5 s
  * matched-conditions 64× `dedup_neardup_pairs` with `BenchScale`'s
  * 52–55 s for the same call on a verified-quiet host — the two
  * harnesses differ systematically, so "host load" (round 5's
  * explanation of record) cannot be the whole story. One JVM, the two
  * candidate mechanical differences isolated:
  *   - result handling: bare `count()` (AuditR5Geom) vs
  *     `cache()+count()` (BenchScale — forces every output column to
  *     materialize, including the exact-Jaccard score the bare count
  *     prunes to a filter-only evaluation);
  *   - interleaving: repeated A/B/A/B so drift within the JVM (page
  *     cache, JIT, heap shape) shows up as trend, not as a one-off.
  */
object AuditR6 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(cores = 32, shufflePartitions = 32, appName = "audit-r6")
    println(s"[audit] heap max = ${Runtime.getRuntime.maxMemory() / (1 << 20)} MiB")
    val docs0 = io.Tables(spark, sfDir, "documents")
    val infl = BenchScale.inflateDocs(docs0, 64)
    ext.Dedup.nearDupPairs(docs0, "doc_id", "text", threshold = 0.6).count() // warmup
    spark.catalog.clearCache()
    for (round <- 1 to 2; cached <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val df = ext.Dedup.nearDupPairs(infl, "doc_id", "text",
        shingleN = 3, threshold = 0.6)
      val rows = if (cached) df.cache().count() else df.count()
      println(f"[audit] neardup64 round=$round cached=$cached%-5s rows=$rows%-6d ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      spark.catalog.clearCache()
    }
    // clusters at 4×: BenchScale read 21.9 s on a quiet host where the
    // round-5 artifact read 5.0 s — same isolation question
    val infl4 = BenchScale.inflateDocs(docs0, 4)
    for (round <- 1 to 2; cached <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val df = ext.Dedup.connectedComponents(
        ext.Dedup.nearDupPairs(infl4, "doc_id", "text",
          shingleN = 3, threshold = 0.6), "id_a", "id_b")
      val rows = if (cached) df.cache().count() else df.count()
      println(f"[audit] clusters4 round=$round cached=$cached%-5s rows=$rows%-6d ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
