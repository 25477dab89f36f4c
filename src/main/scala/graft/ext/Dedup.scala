package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Near-duplicate detection for LLM-data pipelines (SURVEY.md §2.5).
  *
  * The LSH shape is the reference's own hash-partition trick (D6,
  * `hash(key) % R` at `w7/src/worker/workerimpl.cc:254`) applied to MinHash
  * band hashes, per the MapReduce similarity-join literature (ClusterJoin
  * VLDB'14, V-SMART-Join VLDB'12 — see PAPERS.md): candidates are generated
  * by an equi-join on (band, bandHash) — a plain co-partitioned shuffle
  * join that scales linearly in corpus size — and then verified with the
  * exact similarity, so LSH parameters only affect recall/cost, never
  * output correctness (with b=64 bands of r=2 rows, the probability of
  * missing a pair at Jaccard ≥ 0.6 is (1-0.36)^64 < 1e-12).
  */
object Dedup {

  /** Distinct word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int): Column =
    array_distinct(TextOps.wordNgrams(text, n))

  /** MinHash signature (array<long> of length numPerms) from a shingle
    * array column. Hash family: h_i(s) = xxhash64(xxhash64(s), i) — each
    * shingle is hashed to 8 bytes once, then re-mixed per permutation
    * (no multiplicative wraparound, which ANSI mode rejects as overflow).
    * Computed entirely with higher-order functions — one pass per row,
    * no explode, no shuffle. */
  def minHashSignature(shinglesCol: Column, numPerms: Int): Column = {
    val base = transform(shinglesCol, s => xxhash64(s))
    array((0 until numPerms).map { i =>
      array_min(transform(base, h => xxhash64(h, lit(i))))
    }: _*)
  }

  /** Explode a signature into (band, bandHash) rows: bands of `rows`
    * consecutive signature entries, hashed together. */
  def lshBands(df: DataFrame, idCol: String, sigCol: String, bands: Int, rows: Int): DataFrame = {
    val bandArr = transform(
      sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"), hash(slice(col(sigCol), b * rows + 1, lit(rows))).as("bh")))
    df.select(col(idCol), explode(bandArr).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bh").as("bh"))
  }

  /** Candidate pairs (idA < idB) sharing at least one LSH bucket. The
    * equi-self-join on (band, bh) shuffles both sides by bucket key —
    * the scalable path; hot buckets are bounded by band width and can be
    * salted if a corpus has giant near-identical clusters. */
  def candidatePairs(bandsDf: DataFrame, idCol: String): DataFrame = {
    val a = bandsDf.select(col("band"), col("bh"), col(idCol).as("id_a"))
    val b = bandsDf.select(col("band"), col("bh"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bh"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact Jaccard between two distinct-element array columns. Integer
    * set sizes and a single double division — deterministic everywhere. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Full MinHash-LSH near-dup pipeline over (id, text): returns
    * (id_a, id_b, jaccard) for pairs with exact Jaccard ≥ threshold.
    * Exact verification makes LSH a pure candidate filter. */
  def nearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      numPerms: Int = 128,
      bands: Int = 64,
      threshold: Double = 0.6): DataFrame = {
    val sh = df
      .select(col(idCol), shingles(col(textCol), shingleN).as("ws"))
      .where(size(col("ws")) > 0)
    val sigs = sh.select(col(idCol), minHashSignature(col("ws"), numPerms).as("sig"))
    val cands = candidatePairs(lshBands(sigs, idCol, "sig", bands, numPerms / bands), idCol)
    val wsA = sh.select(col(idCol).as("id_a"), col("ws").as("ws_a"))
    val wsB = sh.select(col(idCol).as("id_b"), col("ws").as("ws_b"))
    cands
      .join(wsA, "id_a")
      .join(wsB, "id_b")
      .select(col("id_a"), col("id_b"), jaccard(col("ws_a"), col("ws_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** 60-bit SimHash over the word multiset, using md5 word hashes (md5 so
    * the same fingerprint is reproducible in any engine; 60 bits = 15 hex
    * chars keeps the value inside a signed long). */
  def simHash(tokens: Column): Column = {
    val words = tokens
    val wordHash = (w: Column) => conv(substring(md5(w.cast("binary")), 1, 15), 16, 10).cast("long")
    val bitScore = (b: Int) =>
      aggregate(
        words,
        lit(0),
        (acc, w) => acc + when(shiftright(wordHash(w), b).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
    (0 until 60).map(b => when(bitScore(b) > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce((x, y) => x.bitwiseOR(y))
  }

  /** SimHash near-dup pairs: candidates share one of 4 15-bit chunks
    * (pigeonhole: hamming ≤ 3 ⇒ at least one chunk equal), verified with
    * exact hamming distance ≤ maxHamming. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val hashed = df.select(col(idCol), simHash(TextOps.tokens(col(textCol))).as("sh"))
    val chunks = hashed.select(
      col(idCol), col("sh"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"), shiftright(col("sh"), c * 15).bitwiseAND(lit(0x7FFFL)).as("ch"))
      }: _*)).as("cc"))
      .select(col(idCol), col("sh"), col("cc.chunk").as("chunk"), col("cc.ch").as("ch"))
    val a = chunks.select(col("chunk"), col("ch"), col(idCol).as("id_a"), col("sh").as("sh_a"))
    val b = chunks.select(col("chunk"), col("ch"), col(idCol).as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("chunk", "ch"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }
}
