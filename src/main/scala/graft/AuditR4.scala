package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-4 profiling harness: where do dedup_clusters' 28 extra seconds
  * at 16× inflation go? Times the LSH front and the CC phase separately
  * and prints per-round numbers from the CC loop.
  */
object AuditR4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val f = sys.env.getOrElse("SPARK_GRAFT_SCALE_F", "16").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs0 = io.Tables(spark, sfDir, "documents")
    docs0.count()

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(f"[audit] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = BenchScale.inflateDocs(docs0, f)
    // warmup pass (codegen etc.)
    ext.Dedup.nearDupPairs(BenchScale.inflateDocs(docs0, 1), "doc_id", "text").count()
    spark.catalog.clearCache()

    val pairs = ext.Dedup.nearDupPairs(docs, "doc_id", "text",
      shingleN = 3, numPerms = 128, bands = 64, threshold = 0.6)
    val p = timed(s"pairs f=$f (cache+count)") { val c = pairs.cache(); c.count() }
    System.err.println(s"[audit] pairs rows = $p")

    val cc = timed(s"cc f=$f (from cached pairs)") {
      ext.Dedup.connectedComponents(pairs, "id_a", "id_b").count()
    }
    System.err.println(s"[audit] cc rows = $cc")
    spark.catalog.clearCache()

    // now the full un-cached composition, as the scale probe runs it
    val full = timed(s"clusters f=$f (cold)") {
      ext.Dedup.connectedComponents(
        ext.Dedup.nearDupPairs(docs, "doc_id", "text",
          shingleN = 3, numPerms = 128, bands = 64, threshold = 0.6),
        "id_a", "id_b").count()
    }
    System.err.println(s"[audit] full rows = $full")
    spark.stop()
  }
}
