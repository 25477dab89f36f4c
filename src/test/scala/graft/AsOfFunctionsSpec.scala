package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.ops.AsOfJoin

class AsOfFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks latest right at-or-before left, null when none") {
    val left = Seq((1L, 10L, "p1"), (1L, 5L, "p2"), (2L, 7L, "p3"))
      .toDF("k", "t", "name")
    val right = Seq((1L, 5L, "c_at_5"), (1L, 8L, "c_at_8"), (3L, 1L, "other"))
      .toDF("k", "rt", "payload")
    val got = AsOfJoin.asof(left, right, "k", "t", "rt", Seq("payload"))
      .select("name", "asof_payload").as[(String, Option[String])]
      .collect().toMap
    assert(got == Map(
      "p1" -> Some("c_at_8"),   // latest of 5,8 at t=10
      "p2" -> Some("c_at_5"),   // inclusive at equal time
      "p3" -> None))            // no right rows for k=2
  }

  test("asof join carries a legitimately-null payload value from the matched row") {
    val left = Seq((1L, 10L, "p1")).toDF("k", "t", "name")
    // the matched right row (t=8) has a NULL payload value and a non-null
    // second field: both must come from t=8, not fall back to t=5
    val right = Seq((1L, 5L, Some("old"), Some(50L)), (1L, 8L, None, Some(80L)))
      .toDF("k", "rt", "payload", "aux")
    val got = AsOfJoin.asof(left, right, "k", "t", "rt", Seq("payload", "aux"))
      .select("name", "asof_payload", "asof_aux")
      .as[(String, Option[String], Option[Long])].collect().toSeq
    assert(got == Seq(("p1", None, Some(80L))))
  }

  test("asof join rejects reserved column names") {
    val left = Seq((1L, 10L, "x")).toDF("k", "t", "__tag")
    val right = Seq((1L, 5L, "y")).toDF("k", "rt", "p")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asof(left, right, "k", "t", "rt", Seq("p"))
    }
    assert(e.getMessage.contains("__tag"))
  }

  test("SQL functions available by default (GraftExtensions via session config) and match Column API") {
    // NO imperative GraftFunctions.register here: GraftSession.local
    // configures spark.sql.extensions=graft.functions.GraftExtensions
    val r = spark.sql(
      "SELECT qdot(array(CAST(1.0 AS FLOAT), CAST(0.5 AS FLOAT)), array(CAST(2.0 AS FLOAT), CAST(0.25 AS FLOAT))) AS d")
      .as[Long].head()
    assert(r == 1000L * 2000 + 500L * 250)
    val sig = spark.sql("SELECT minhash_sig(shingle_hashes(array('a','b','c','d'), 3), 16) AS s")
      .as[Seq[Long]].head()
    assert(sig.length == 16)
    // 2 shingles -> signature minima are over 2 candidates, stable
    val sig2 = spark.sql("SELECT minhash_sig(shingle_hashes(array('a','b','c','d'), 3), 16) AS s")
      .as[Seq[Long]].head()
    assert(sig == sig2)
  }

  test("extensions carry to a fresh newSession with no imperative calls") {
    val fresh = spark.newSession()
    assert(fresh.sql("SELECT qdot(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS d")
      .as[Long].head() == 1000000L)
  }

  test("imperative GraftFunctions.register stays idempotent on an extended session") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT rolling_hash('ab') AS h").as[Long].head() ==
      ((97L * 131 + 98) % 2147483647))
  }

  test("char stats are SQL-callable: collision micro + distinct bytes") {
    // 'aab': counts (2,1) over n=3 → (4+1)·10⁶ div 9 = 555555; 2 distinct
    assert(spark.sql("SELECT char_collision('aab') AS c").as[Long].head() == 555555L)
    assert(spark.sql("SELECT char_distinct('aab') AS d").as[Long].head() == 2L)
    assert(spark.sql("SELECT char_collision('') AS c").as[Long].head() == 0L)
  }
}
