package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def wc(lines: Seq[String]): Map[String, Long] =
    TextOps
      .wordCount(lines.toDF("text"), col("text"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap

  test("reference map.py normalization: lowercase, punctuation→space, drop empties") {
    // mirrors w7/src/python/map.py:9-18 on a testdata_1.txt-style line
    val got = wc(Seq("Savannah nanoseconds. The THE the!  a:b"))
    assert(got == Map(
      "savannah" -> 1L, "nanoseconds" -> 1L, "the" -> 3L, "a" -> 1L, "b" -> 1L))
  }

  test("every ASCII punctuation char is a separator") {
    val punct = """!"#$%&'()*+,-./:;<=>?@[\]^_`{|}~"""
    val line = punct.map(p => s"x${p}y").mkString(" ")
    val got = wc(Seq(line))
    assert(got == Map("x" -> punct.length.toLong, "y" -> punct.length.toLong))
  }

  test("wordcount is a homomorphism: wc(a ++ b) == merge(wc(a), wc(b))") {
    // the associativity the reference combiner assumes (map.py:16-22)
    val wordGen = Gen.listOf(
      Gen.oneOf("Alpha", "beta,", "GAMMA.", "d:e", "", "  "))
    (0 until 10).foreach { i =>
      val a = wordGen(Gen.Parameters.default, Seed(i.toLong)).getOrElse(Nil)
      val b = wordGen(Gen.Parameters.default, Seed(i + 100L)).getOrElse(Nil)
      val merged = (wc(Seq(a.mkString(" "))).toSeq ++ wc(Seq(b.mkString(" "))).toSeq)
        .groupMapReduce(_._1)(_._2)(_ + _)
      assert(wc(Seq((a ++ b).mkString(" "))) == merged)
    }
  }

  test("char shingles") {
    val got = spark.range(1).select(TextOps.charShingles(lit("abcd"), 3)).as[Seq[String]].head()
    assert(got == Seq("abc", "bcd"))
  }

  test("word ngrams") {
    val got = spark.range(1)
      .select(TextOps.wordNgrams(lit("The quick, brown fox"), 2)).as[Seq[String]].head()
    assert(got == Seq("the quick", "quick brown", "brown fox"))
  }

  test("token count") {
    val got = spark.range(1).select(TextOps.tokenCount(lit("a  b, c."))).as[Int].head()
    assert(got == 3)
  }

  test("PII redaction tags emails and digit runs (corpus has none — oracle only proves identity)") {
    val df = Seq("mail jane.doe+x@example.co.uk or call 555-123 4567, ext 9").toDF("text")
    val r = df.select(
      ext.TextAnalysis.redact(col("text")).as("t"),
      ext.TextAnalysis.piiCounts(col("text"))._1.as("e"),
      ext.TextAnalysis.piiCounts(col("text"))._2.as("n")).head()
    assert(r.getString(0) == "mail <EMAIL> or call <NUMBER>, ext 9")
    assert(r.getInt(1) == 1 && r.getInt(2) == 1)
  }

  test("bigram LM: deterministic continuations score 10^6, split ones the exact ratio") {
    // corpus: "a b" x3 and one "a c" — p(b|a) = 3/4, p(c|a) = 1/4;
    // doc 4 "x y x y" has p(y|x)=1 and p(x|y)=1 bigrams → mean 10^6
    val docs = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "a b a c"), (4L, "x y x y"))
      .toDF("doc_id", "text")
    val got = ext.TextAnalysis.bigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 3 bigrams: (a,b) 750000, (b,a) 10^6, (a,c) 250000 → mean 666666
    assert(got == Seq(
      (1L, 1L, 750000L), (2L, 1L, 750000L), (3L, 3L, 666666L), (4L, 3L, 1000000L)))
  }

  test("CCNet buckets: thresholds are (lang, score) functions — ties share a bucket") {
    // six docs in one language with scores s1 > s2 = s2 > s3: the two
    // tied middle docs must land in the SAME bucket even though a
    // per-row ntile would split them across the 1/3 boundary
    val docs = Seq(
      // "a b" repeated → p(b|a)=1 within these, but scores come from
      // the corpus-trained LM — engineer ranks via distinct texts
      (1L, "a b a b"), (2L, "a b a b"), // deterministic pairs, top score
      (3L, "a c x y"), (4L, "a c x y"), // identical docs → identical score
      (5L, "c a y x"), (6L, "c a y x")
    ).toDF("doc_id", "text")
    val got = ext.TextAnalysis.ccnetBuckets(docs.withColumn("lang", lit("en")),
        "doc_id", "text", "lang")
      .orderBy("doc_id")
      .select("doc_id", "lm_score", "bucket")
      .as[(Long, Long, Int)].collect().toSeq
    // identical texts must always share score AND bucket
    assert(got(2)._2 == got(3)._2 && got(2)._3 == got(3)._3)
    assert(got(4)._2 == got(5)._2 && got(4)._3 == got(5)._3)
    // buckets are non-decreasing as score decreases
    val byScore = got.sortBy(r => (-r._2, r._1)).map(_._3)
    assert(byScore == byScore.sorted)
  }

  test("DSIR: add-one integer ratios — never-in-target grams score > 0, target-only grams highest") {
    // target = docs 1,2 ("en"); doc 3 shares gram (a,b) with the
    // target, doc 4's gram (x,y) never appears in the target
    val docs = Seq(
      (1L, "a b", "en"), (2L, "a b", "en"), (3L, "a b", "de"), (4L, "x y", "de"))
      .toDF("doc_id", "text", "lang")
    val got = ext.TextAnalysis.dsirScores(docs, "doc_id", "text", col("lang") === "en")
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    // (a,b): n_all=3, n_tgt=2 → (3·10^6) div 4 = 750000 for docs 1-3;
    // (x,y): n_all=1, n_tgt=0 → (1·10^6) div 2 = 500000 — finite, not 0
    assert(got == Seq(
      (1L, 1L, 750000L), (2L, 1L, 750000L), (3L, 1L, 750000L), (4L, 1L, 500000L)))
  }
}
