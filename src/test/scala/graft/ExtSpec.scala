package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Similarity, TextAnalysis}
import graft.ops.TextOps

class ExtSpec extends SparkSpec {
  import spark.implicits._

  test("quantizedDot: exact integer arithmetic") {
    val df = Seq((Array(1.0f, 0.5f), Array(2.0f, 0.25f))).toDF("a", "b")
    val got = df.select(Similarity.quantizedDot(col("a"), col("b"))).as[Long].head()
    assert(got == 1000L * 2000 + 500L * 250)
  }

  test("cosine of identical unit vectors is 1") {
    val df = Seq((Array(0.6f, 0.8f), Array(0.6f, 0.8f))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].head()
    assert(math.abs(got - 1.0) < 1e-9)
  }

  test("jaccard on distinct arrays") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val got = df.select(Dedup.jaccard(col("x"), col("y"))).as[Double].head()
    assert(got == 2.0 / 4.0)
  }

  test("minhash LSH recovers all exact-jaccard pairs (vs brute force, sf0.001)") {
    val docs = io.Tables(spark, sf, "documents")
    val lsh = Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("ws"))
      .where(size(col("ws")) > 0)
    val a = sh.select(col("doc_id").as("id_a"), col("ws").as("wa"))
    val b = sh.select(col("doc_id").as("id_b"), col("ws").as("wb"))
    val brute = a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .where(Dedup.jaccard(col("wa"), col("wb")) >= 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh == brute)
    assert(brute.nonEmpty)
  }

  test("native SimHash60 equals the HOF bit-vote formulation on real docs") {
    val docs = io.Tables(spark, sf, "documents")
    val hashes = docs.select(
      col("doc_id"),
      Dedup.wordHashes(TextOps.tokens(col("text"))).as("wh"))
      .where(size(col("wh")) > 0)
    val diff = hashes.select(
        graft.functions.SimHash60.simhash60(col("wh")).as("native"),
        Dedup.simHashFromHashes(col("wh")).as("hof"))
      .where(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("simhash: near-identical texts collide, unrelated texts don't") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "the quick brown fox jumps over the lazy cat again and again today"),
      (3L, "completely different subject matter entirely unrelated words everywhere")
    ).toDF("id", "text")
    val pairs = Dedup.simHashPairs(df, "id", "text", maxHamming = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("rhp bucket is stable and separates orthogonal vectors sometimes") {
    val df = Seq(
      (1L, Array.fill(64)(0.125f)),
      (2L, Array.fill(64)(0.125f))).toDF("id", "v")
    val buckets = df.select(Similarity.rhpBucket(col("v"), 64, 16)).as[Long].collect()
    assert(buckets(0) == buckets(1))
  }

  test("langId picks marker language with alphabetical tie-break") {
    val df = Seq(
      "der hund ist nicht hier",
      "the cat is of the house",
      "el gato y la casa que",
      "zzz qqq xxx").toDF("text")
    val got = df.select(TextAnalysis.langId(col("text"))).as[String].collect().toSeq
    assert(got == Seq("de", "en", "es", "und"))
  }

  test("fingerprint is whitespace/punct-normalization invariant") {
    val df = Seq("Hello,  World!", "hello world").toDF("text")
    val fps = df.select(TextAnalysis.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("quality metrics sane on known text") {
    val df = Seq("the cat sat on the mat").toDF("text")
    val r = df.select(
      TextAnalysis.nTokens(col("text")),
      TextAnalysis.stopwordRatio(col("text")),
      TextAnalysis.meanTokenLen(col("text"))).head()
    assert(r.getInt(0) == 6)
    assert(r.getDouble(1) == 3.0 / 6.0) // the, on, the
    assert(r.getDouble(2) == 17.0 / 6.0)
  }
}
