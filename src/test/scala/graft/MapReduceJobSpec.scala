package graft

import org.apache.spark.sql.functions._

import graft.api.MapReduceJob
import graft.ops.{Aggregators, TextOps}

/** Serializable closures for Spark tasks (a FunSuite instance is not). */
object MapReduceJobSpec {
  private val mapPy = """[!"#$%&'()*+,\-./:;<=>?@\[\\\]^_`{|}~]"""

  /** Scala replica of w7/src/python/map.py:9-18 record semantics. */
  def tokenize(line: String): Seq[String] =
    line.toLowerCase.replaceAll(mapPy, " ").split(" ").filter(_.nonEmpty).toSeq
}

class MapReduceJobSpec extends SparkSpec {
  import MapReduceJobSpec.tokenize
  import spark.implicits._

  test("typed MapReduceJob wordcount == DataFrame wordcount") {
    val docs = io.Tables(spark, sf, "documents")
    val typed = MapReduceJob(
      docs.select("text").as[String],
      (line: String) => tokenize(line).map(_ -> 1L),
      (a: Long, b: Long) => a + b)
      .run()
      .collect()
      .toMap
    val df = TextOps
      .wordCount(docs, col("text"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(typed == df)
    assert(typed.nonEmpty)
  }

  test("withReducers controls output partition count (the r knob)") {
    val ds = MapReduceJob(
      spark.range(100).as[Long],
      (i: Long) => Seq((i % 7).toString -> 1L),
      (a: Long, b: Long) => a + b)
      .withReducers(3)
      .run()
    assert(ds.rdd.getNumPartitions == 3)
    assert(ds.collect().toMap.values.sum == 100L)
  }

  test("job chaining: wordcount then count-by-count (design.md:74)") {
    val docs = io.Tables(spark, sf, "documents").select("text").as[String]
    val chained = MapReduceJob(
      docs,
      (line: String) => tokenize(line).map(_ -> 1L),
      (a: Long, b: Long) => a + b)
      .andThen[Long, Long](
        { case (_, cnt) => Seq(cnt -> 1L) },
        (a: Long, b: Long) => a + b)
      .run()
      .collect()
      .toMap
    val words = TextOps.wordCount(io.Tables(spark, sf, "documents"), col("text"))
      .groupBy("cnt").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chained == words)
  }

  test("Aggregator path: TopK per key") {
    val topk = MapReduceJob.aggregate(
      spark.range(100).as[Long],
      (i: Long) => Seq((i % 2 == 0, i)),
      Aggregators.TopK[Long](3))
    val m = topk.collect().toMap
    assert(m(true) == Seq(98L, 96L, 94L))
    assert(m(false) == Seq(99L, 97L, 95L))
  }

  test("MinVector aggregator merges element-wise minimum") {
    val a = Aggregators.MinVector(4)
    val m = a.merge(Array(1L, 9L, 5L, 7L), Array(2L, 3L, 5L, Long.MaxValue))
    assert(m.toSeq == Seq(1L, 3L, 5L, 7L))
  }

  test("CustomJob reducer sees the WHOLE group — non-associative logic is legal") {
    import spark.implicits._
    val lines = Seq("b a", "a c b", "c").toDS()
    val mapper = new api.TextMapper {
      def map(r: String): IterableOnce[(String, String)] =
        r.split(" ").zipWithIndex.map { case (w, i) => (w, i.toString) }
    }
    // joins the SORTED value list — order-sensitive, not a fold of pairs
    val reducer = new api.TextReducer {
      def reduce(key: String, values: Iterator[String]): String =
        values.toSeq.sorted.mkString("|")
    }
    val got = api.CustomJob.run(lines, mapper, reducer, r = 2)
      .as[(String, String)].collect().toMap
    assert(got == Map("a" -> "0|1", "b" -> "0|2", "c" -> "0|1"))
  }
}
