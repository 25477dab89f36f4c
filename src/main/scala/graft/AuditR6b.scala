package graft

import org.apache.spark.sql.functions._

/** Second round-6 measurement experiment: WHERE does BenchScale's
  * overhead live?
  *  (a) plan-construction cost of the f-way `unionByName` inflation
  *      chain — each unionByName eagerly re-analyzes the accumulated
  *      left subtree, an O(f²) driver-side analyzer bill that
  *      BenchScale pays INSIDE its timer (inflateDocs(f) is called in
  *      the timed build) while AuditR5Geom/AuditR6 pre-built the
  *      inflated frame before the clock started;
  *  (b) session poisoning — does running a 64× kernel first slow a
  *      subsequent small kernel (the probe's clusters4 read 21.9 s
  *      where isolation reads 3–4 s)?
  */
object AuditR6b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(cores = 32, shufflePartitions = 32, appName = "audit-r6b")
    val docs0 = io.Tables(spark, sfDir, "documents")
    docs0.count()
    // (a) construction+analysis cost alone, no action
    for (f <- Seq(4, 16, 64)) {
      val t0 = System.nanoTime()
      val infl = BenchScale.inflateDocs(docs0, f)
      val tCons = (System.nanoTime() - t0) / 1e9
      // and the analyzer bill a consumer pays on top (resolve only)
      val t1 = System.nanoTime()
      infl.schema // forces analysis of the final frame (already eager, ~0)
      val tAn = (System.nanoTime() - t1) / 1e9
      println(f"[audit-b] inflate f=$f%-3d construct=${tCons}%6.1f s  schema=${tAn}%6.3f s")
    }
    // (b) probe-order replication: neardup64 first, then clusters4
    val t2 = System.nanoTime()
    ext.Dedup.nearDupPairs(BenchScale.inflateDocs(docs0, 64), "doc_id", "text",
      shingleN = 3, threshold = 0.6).cache().count()
    println(f"[audit-b] neardup64 (inflate inside timer) ${(System.nanoTime() - t2) / 1e9}%6.1f s")
    spark.catalog.clearCache()
    val t3 = System.nanoTime()
    ext.Dedup.connectedComponents(
      ext.Dedup.nearDupPairs(BenchScale.inflateDocs(docs0, 4), "doc_id", "text",
        shingleN = 3, threshold = 0.6), "id_a", "id_b").cache().count()
    println(f"[audit-b] clusters4 after a 64x run ${(System.nanoTime() - t3) / 1e9}%6.1f s")
    spark.catalog.clearCache()
    spark.stop()
  }
}
