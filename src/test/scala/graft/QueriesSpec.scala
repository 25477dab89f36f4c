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
    if (ev.schema("ts").dataType == org.apache.spark.sql.types.TimestampType &&
        !ev.queryExecution.analyzed.toString.contains("timestamp_micros")) {
      val q = ev.where(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
      q.count()
      val scan = q.queryExecution.executedPlan.toString
      assert(scan.contains("PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts"),
        s"ts filter did not reach the scan:\n$scan")
    }
  }
}
