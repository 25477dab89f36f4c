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
}
