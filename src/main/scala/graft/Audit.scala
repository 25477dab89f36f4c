package graft
import org.apache.spark.sql.functions._
object Audit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, 8, "audit")
    val dir = "/root/testdata/sf0.01"
    Seq("q1_agg", "q3_join", "q6_filter", "mr_grep", "q5_region_revenue", "q8_window_rank").foreach { q =>
      println(s"######## $q")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
