package graft

import org.apache.spark.sql.functions._

/** Round-10 operator laws: multi-benchmark contamination attribution
  * and the TV-distance drift gate. */
class R10OpsSpec extends SparkSpec {
  import spark.implicits._

  test("contaminationAttribution credits each leaked benchmark separately") {
    val span1 = "alpha bravo charlie delta echo" // one 5-gram
    val span2 = "one two three four five six"    // two 5-grams
    val corpus = Seq(
      (1L, s"intro $span1 outro words here"),   // leaks bench A only
      (2L, s"start $span2 finish"),             // leaks bench B (both grams)
      (3L, s"$span1 then also $span2"),         // leaks both benches
      (4L, "completely clean text with nothing shared at all"))
      .toDF("doc_id", "text")
    val bench = Seq(
      ("A", s"unrelated lead $span1 unrelated tail"),
      ("B", s"other framing $span2 other ending"))
      .toDF("bench", "text")
    val got = ext.TextAnalysis
      .contaminationAttribution(corpus, bench, "doc_id", "text", "bench")
      .as[(Long, String, Long)].collect()
      .map { case (d, b, n) => (d, b) -> n }.toMap
    assert(got == Map(
      (1L, "A") -> 1L,
      (2L, "B") -> 2L,
      (3L, "A") -> 1L, (3L, "B") -> 2L))
  }

  test("histogramDriftTv: 0 on identical slices, 1000 on disjoint ranges, 0 on constants") {
    val a = spark.range(0L, 1000L).select(
      col("id").as("x"), col("id").as("y"), lit(7L).as("c"))
    val same = ops.Sketches.histogramDriftTv(a, a, Seq("x", "y", "c"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(same == Map("x" -> 0L, "y" -> 0L, "c" -> 0L))

    val b = spark.range(1000L, 2000L).select(
      col("id").as("x"), col("id").as("y"), lit(7L).as("c"))
    val disj = ops.Sketches.histogramDriftTv(a, b, Seq("x", "c"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r._4).toMap
    // sides occupy disjoint bucket sets -> maximal TV; the constant
    // column is identical on both sides (single shared bucket) -> 0
    assert(disj("x") == 1000L, s"disjoint ranges must read 1000, got ${disj("x")}")
    assert(disj("c") == 0L)

    // totals ride along correctly
    val row = ops.Sketches.histogramDriftTv(a, b, Seq("x"))
      .as[(String, Long, Long, Long)].head()
    assert(row._2 == 1000L && row._3 == 1000L)
  }
}
