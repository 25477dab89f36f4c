package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextAnalysis}
import graft.ops.TextOps

/** Winnowing fingerprints (Schleimer et al. 2003): the selection
  * contract (min hash per window, rightmost on ties, distinct), the
  * paper's detection guarantee (any shared run of ≥ w+k−1 tokens yields
  * a shared fingerprint), and the map-only plan shape that makes
  * extraction free of data movement at any corpus size. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val k = TextAnalysis.winnowK
  private val w = TextAnalysis.winnowW

  /** Reference winnower: brute-force recompute of the declared
    * semantics with plain Scala collections. */
  private def bruteWinnow(text: String): Set[(Long, Long)] = {
    val toks = text.toLowerCase.replaceAll("\\p{Punct}", " ")
      .split(" ").filter(_.nonEmpty).toSeq
    if (toks.length < k) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = (0 to toks.length - k).map { i =>
      val gram = toks.slice(i, i + k).mkString(" ")
      val hex = md.digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(TextAnalysis.winnowHashHex), 16)
    }
    val mask = TextAnalysis.winnowPosMask
    val packed = hs.zipWithIndex.map { case (h, i0) => h * (mask + 1) + (mask - i0 - 1) }
    val starts = 0 to math.max(0, packed.length - w)
    starts.map(i => packed.slice(i, i + w).min).toSet
      .map((key: Long) => (mask - key % (mask + 1), key / (mask + 1)))
  }

  test("selection matches a brute-force recompute of the declared semantics") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a a a a a a a a a a"), // all-equal hashes: rightmost-tie path
      (3L, "one two three four"),  // exactly one gram
      (4L, "too few"),             // below k tokens: no fingerprints
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.winnowFingerprints(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    for (id <- 1L to 5L) {
      val text = docs.where(col("doc_id") === id).select("text").as[String].head()
      val want = bruteWinnow(text) // decode already yields 1-based pos
      assert(got.getOrElse(id, Set.empty) == want, s"doc $id")
    }
  }

  test("guarantee: a shared run of w+k-1 tokens yields a shared fingerprint hash") {
    // 100 random-ish word docs sharing only a (w+k-1)-token run —
    // the paper's threshold t = w + k − 1 where detection is certain
    val run = (1 to (w + k - 1)).map(i => s"shared$i").mkString(" ")
    val fillerA = (1 to 40).map(i => s"lefta$i").mkString(" ")
    val fillerB = (1 to 40).map(i => s"rightb$i").mkString(" ")
    val docs = Seq(
      (10L, s"$fillerA $run ${(1 to 40).map(i => s"taila$i").mkString(" ")}"),
      (20L, s"$fillerB $run ${(1 to 40).map(i => s"tailb$i").mkString(" ")}")
    ).toDF("doc_id", "text")
    val fp = TextAnalysis.winnowFingerprints(docs, "doc_id", "text")
    val shared = fp.where(col("doc_id") === 10L).select("h")
      .intersect(fp.where(col("doc_id") === 20L).select("h"))
    assert(shared.count() >= 1, "winnowing guarantee violated")
  }

  test("density: fingerprints per doc stay within [1, windows] and near 2/(w+1)") {
    val docs = io.Tables(spark, sf, "documents")
    val stats = TextAnalysis.winnowFingerprints(docs, "doc_id", "text")
      .groupBy("doc_id").agg(count(lit(1)).as("nfp"))
      .join(docs.select(col("doc_id"), TextOps.tokenCount(col("text")).as("nt")), "doc_id")
      .select(sum("nfp").as("nfp"), sum(greatest(col("nt") - (k - 1), lit(1))).as("grams"))
      .head()
    val density = stats.getAs[Long]("nfp").toDouble / stats.getAs[Long]("grams")
    // expected 2/(w+1) = 0.4 on random text; wide tolerance — this
    // guards against selecting every gram (1.0) or one per doc (~0)
    assert(density > 0.15 && density < 0.75, s"density $density")
  }

  test("native WinnowKeys equals the interpreted HOF formulation on the real corpus") {
    val docs = io.Tables(spark, sf, "documents")
    val native = TextAnalysis.winnowFingerprints(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    val hof = TextAnalysis.winnowFingerprintsHof(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(native == hof)
  }

  test("extraction is map-only: no exchange in the fingerprint plan") {
    // r13: the scale-adaptive input widen (Par.widen, guide §2.5) may
    // round-robin repartition an under-split fixture scan before the
    // CPU-heavy extraction; that is the ONE exchange allowed here — the
    // extraction itself must still be map-only (no hash/range exchange,
    // i.e. no data-dependent shuffle of the gram stream).
    val plan = TextAnalysis
      .winnowFingerprints(io.Tables(spark, sf, "documents"), "doc_id", "text")
      .queryExecution.executedPlan.toString
    val nonWiden = "Exchange(?! RoundRobinPartitioning)".r
    assert(nonWiden.findFirstIn(plan).isEmpty,
      s"winnow extraction must not shuffle (widen round-robin aside):\n$plan")
  }

  test("pair detection finds the planted partial copy and caps hot fingerprints") {
    // doc 2 copies the second half of doc 1; docs 3..40 share one
    // boilerplate sentence repeated everywhere — its fingerprints are
    // a small minority of each doc's total, so share stays below the
    // 500‰ threshold and no boilerplate pair may surface
    val half = (1 to 60).map(i => s"body$i").mkString(" ")
    val boiler = "all rights reserved by the usual boilerplate footer here"
    val docs = (
      Seq((1L, s"${(1 to 60).map(i => s"head$i").mkString(" ")} $half"),
          (2L, s"$half ${(1 to 60).map(i => s"tail$i").mkString(" ")}")) ++
      (3L to 40L).map(i => (i, s"${(1 to 30).map(j => s"unique${i}x$j").mkString(" ")} $boiler"))
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L), "planted half-copy not found")
    // the boilerplate-only docs must NOT pair up: their shared
    // fingerprints are a small fraction of each doc's total
    assert(!pairs.exists(p => p._1 >= 3L), s"boilerplate docs paired: ${pairs.mkString(",")}")
  }
}
