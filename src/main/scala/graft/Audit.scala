package graft
import org.apache.spark.sql.functions._

/** Ad-hoc plan audit: `runMain graft.Audit [query ...]` prints
  * `explain("formatted")` for each named `SparkEntry.queries` entry
  * (default: a relational sample) against sf0.01. */
object Audit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, 8, "audit")
    val dir = "/root/testdata/sf0.01"
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_join", "q6_filter", "mr_grep", "q5_region_revenue", "q8_window_rank")
    names.foreach { q =>
      println(s"######## $q")
      SparkEntry.queries(q)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
