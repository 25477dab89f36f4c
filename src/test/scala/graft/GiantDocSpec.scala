package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.ops.TextOps

/** Giant-document robustness: the `TextOps.maxDocChars` truncation
  * policy must bound every per-row kernel (token arrays, shingle hash
  * sets, MinHash signatures) at O(cap) regardless of document size, and
  * a pathological document must not perturb the dedup verdicts of the
  * normal-sized corpus around it. A 100 TB crawl WILL contain multi-MB
  * garbage rows; this is the spec that says one of them cannot straggle
  * or OOM an executor. */
class GiantDocSpec extends SparkSpec {
  import spark.implicits._

  // ~4 MiB of two-char tokens — 4× past the cap
  private lazy val giant: String = ("ab " * ((4 << 20) / 3)).trim

  test("tokens/shingles/minhash are capped at maxDocChars, not document length") {
    val df = Seq((1L, giant)).toDF("doc_id", "text")
    val row = df.select(
      size(TextOps.tokens(col("text"))).as("n_tok"),
      size(Dedup.shingleHashSet(col("text"), 3)).as("n_sh"),
      size(Dedup.minHashSignature(Dedup.shingleHashSet(col("text"), 3), 128)).as("n_sig"))
      .head()
    // "ab " = 3 chars per token; the cap admits ⌈(1<<20)/3⌉ tokens of
    // the 4 MiB input (the final sliced token may be partial)
    val capTokens = (TextOps.maxDocChars + 2) / 3
    assert(row.getAs[Int]("n_tok") <= capTokens,
      s"token array must be cap-bounded, got ${row.getAs[Int]("n_tok")}")
    assert(row.getAs[Int]("n_tok") >= capTokens - 1)
    // all tokens equal → the distinct shingle set collapses (the hash
    // set is ≤ distinct n-grams, trivially ≤ cap-bounded window count)
    assert(row.getAs[Int]("n_sh") <= 2)
    assert(row.getAs[Int]("n_sig") == 128)
  }

  test("a giant doc passes through nearDupPairs without perturbing the small corpus") {
    // two genuine near-dups + one 4 MiB monster; the monster shares no
    // vocabulary with the pair, so the pair set must be exactly {(1,2)}
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 20
    val docs = Seq(
      (1L, base),
      (2L, base + " lambda"),
      (3L, giant)).toDF("doc_id", "text")
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    spark.catalog.clearCache()
  }
}
