package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-7 measurement audit: the exact-Jaccard PPJoin's prefix
  * selection, window-sort form vs hash-agg + per-row-sort form, at the
  * probe factors where the window form went superlinear (22 s at 16×
  * → 230 s at 64× in the first BENCH_scale run with the kernel). One
  * fresh SparkContext per factor, the BenchScale inflation. */
object AuditR7 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "16,64")
      .split(",").map(_.trim.toInt).toSeq
    val parts = sys.env.getOrElse("SPARK_GRAFT_PARTS", "32")
    factors.foreach { f =>
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val docs0 = io.Tables(spark, sfDir, "documents")
      docs0.count()
      if (sys.env.get("SPARK_GRAFT_STAGEWISE").isDefined) {
        // stage-by-stage decomposition of the PPJoin at this factor
        val threshold = 0.5
        val docs = BenchScale.inflateDocs(docs0, f)
        def timed[T](label: String)(body: => T): T = {
          val t0 = System.nanoTime()
          val r = body
          System.err.println(f"[auditr7] $label%-16s f=$f%-3d ${(System.nanoTime() - t0) / 1e9}%8.2f s")
          r
        }
        val sh = docs
          .select(col("doc_id"), ext.Dedup.shingleHashSet(col("text"), 3).as("ws"))
          .where(size(col("ws")) > 0).cache()
        timed("sh_count")(sh.count())
        val posts = sh.select(col("doc_id").as("id"), size(col("ws")).as("sz"),
          explode(col("ws")).as("h"))
        val dfreq = posts.groupBy("h").agg(count(lit(1)).as("df"))
        timed("dfreq")(dfreq.count())
        val prefix = posts
          .join(dfreq, "h")
          .groupBy(col("id"), col("sz"))
          .agg(collect_list(struct(col("df"), col("h"))).as("dh"))
          .select(col("id"), col("sz"),
            explode(slice(array_sort(col("dh")), lit(1),
              (ceil((lit(1.0) - threshold) * col("sz")) + 1).cast("int"))).as("dh"))
          .select(col("id"), col("sz"), col("dh.h").as("h"))
          .cache()
        timed("prefix")(System.err.println("[auditr7]   prefix rows " + prefix.count()))
        val joined = prefix.as("a")
          .join(prefix.as("b"),
            col("a.h") === col("b.h") && col("a.id") < col("b.id") &&
              least(col("a.sz"), col("b.sz")) >=
                floor(lit(threshold) * greatest(col("a.sz"), col("b.sz"))))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        timed("join_raw")(System.err.println("[auditr7]   raw pairs " + joined.count()))
        val cands = joined.distinct().cache()
        timed("distinct")(System.err.println("[auditr7]   cands " + cands.count()))
        timed("verify") {
          val n = cands
            .join(sh.select(col("doc_id").as("id_a"), col("ws").as("ws_a")), "id_a")
            .join(sh.select(col("doc_id").as("id_b"), col("ws").as("ws_b")), "id_b")
            .select(col("id_a"), col("id_b"),
              ext.Dedup.jaccard(col("ws_a"), col("ws_b")).as("jaccard"))
            .where(col("jaccard") >= threshold).count()
          System.err.println("[auditr7]   verified " + n)
        }
      } else {
        val t0 = System.nanoTime()
        val rows = ext.Dedup.jaccardPairs(
          BenchScale.inflateDocs(docs0, f), "doc_id", "text",
          shingleN = 3, threshold = 0.5).cache().count()
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[auditr7] jaccard_pairs f=$f%-3d ${sec}%8.2f s  rows=$rows")
      }
      spark.catalog.clearCache()
      spark.stop()
    }
  }
}
