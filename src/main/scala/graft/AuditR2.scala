package graft

import org.apache.spark.sql.functions._

/** Round-2 plan audit: formatted plans of the queries whose physical
  * shape changed this round, to eyeball broadcasts, exchanges, and the
  * absence of driver-side collection. */
object AuditR2 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, 8, "audit-r2")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    Seq("ann_ivf_topk", "emb_neardup_pairs", "dedup_neardup_pairs",
      "dedup_simhash_pairs", "dedup_keepfirst", "text_rollhash",
      "q33_exists", "q37_unpivot", "q38_range_join", "skew_salted_agg").foreach { q =>
      println(s"######## $q")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
