package graft

class QueriesSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows at the oracle gate scale (sf0.01)") {
    val gate = "/root/testdata/sf0.01"
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, gate)
      withClue(s"query $name: ") {
        assert(df.count() > 0, s"$name returned no rows at $gate")
      }
    }
  }

  test("every oracle key exists in queries") {
    val unknown = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"oracle entries without queries: $unknown")
  }

  test("events ts predicates push down to the parquet scan (native-timestamp reader)") {
    import org.apache.spark.sql.functions._
    // with a native TIMESTAMP(MICROS) ts column the reader applies no
    // withColumn rewrite, so a ts filter must reach the scan as a
    // pushed filter (a rewrite would strand it above the projection —
    // at 100 TB that is the difference between pruning row groups at
    // the source and decoding every page); legacy nanos-long inputs
    // legitimately keep the rewrite and are exempt
    val ev = io.Tables(spark, sf, "events")
    // assume (not if-skip): a legacy-nanos fixture cancels VISIBLY in
    // the test report instead of silently passing an empty body. The
    // old `if` required exactly TimestampType and silently no-opped
    // forever: Spark 4 infers parquet TIMESTAMP(MICROS, not-UTC) as
    // TimestampNTZType, which pushes down just the same.
    val tsType = ev.schema("ts").dataType
    assume((tsType == org.apache.spark.sql.types.TimestampType ||
        tsType == org.apache.spark.sql.types.TimestampNTZType) &&
      !ev.queryExecution.analyzed.toString.contains("timestamp_micros"),
      "fixture has legacy nanos ts; pushdown legitimately does not apply")
    // LocalDateTime literal: typed NTZ when the column is NTZ, so the
    // comparison needs no cast that would block pushdown
    val q = ev.where(col("ts") >= lit(java.time.LocalDateTime.parse("2024-01-02T00:00:00")))
    q.count()
    val scan = q.queryExecution.executedPlan.toString
    // order-tolerant: Spark versions reorder pushed filters; require
    // both filters somewhere inside one PushedFilters list
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(scan).map(_.group(1)).getOrElse("")
    assert(pushed.contains("IsNotNull(ts)") && pushed.contains("GreaterThanOrEqual(ts"),
      s"ts filter did not reach the scan (pushed=[$pushed]):\n$scan")
  }
}
