package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Corpus-trained byte-pair encoding (SURVEY.md §8.4 upgrade): replaces
  * the "BPE-ish regex" piece count with a real, deterministic,
  * engine-replayable merge-table tokenizer.
  *
  * Training is the classic greedy BPE (Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units")
  * made bit-reproducible: integer pair counts weighted by
  * word frequency over the top-`vocabWords` word-frequency table, the
  * most frequent pair merged each round with ties broken by (lhs, rhs)
  * string order, for exactly `numMerges` rounds (stopping early only
  * when no pairs remain). Merge application is a single left scan —
  * the piece before the cursor merges with the current piece when they
  * equal (lhs, rhs) — which an external engine reproduces as a
  * list_reduce, so the DuckDB oracle replays the whole training AND
  * the final segmentation byte-for-byte (validated: 50/50 merges
  * identical at sf0.01).
  *
  * Scale shape: the trainer consumes ONE wordcount-shaped aggregation
  * (partial-combined) and a distributed TakeOrdered of `vocabWords`
  * rows — bounded driver metadata, the same O(sketch) budget as the
  * bloom bitmap and the IVF sample; the merge loop itself touches only
  * that table (microseconds). Application runs per DISTINCT word (the
  * `BpePieces` expression), never per occurrence — occurrences join
  * the (small) word→pieces relation by word, so a 100 TB corpus pays
  * one hash join keyed on its vocabulary, not a per-token scan. */
object Bpe {

  /** Merge-table size — shared by the engine defaults and the DuckDB
    * oracle generator (ExtQueries unrolls exactly this many
    * round-CTEs). */
  val defaultMerges = 50

  /** Training vocabulary cap: pair counts come from the top-N words by
    * (frequency, word) — bounded driver state at any corpus size. */
  val defaultVocabWords = 2048

  /** One merge application: left scan, merging the accumulator's last
    * piece with the current piece when they equal (l, r) — exactly the
    * list_reduce the oracle runs. A merged piece can immediately merge
    * again only via a LATER merge rule, never within the same scan. */
  def applyMerge(pieces: Array[String], l: String, r: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < pieces.length) {
      val x = pieces(i)
      if (out.nonEmpty && out.last == l && x == r) out(out.length - 1) = l + r
      else out += x
      i += 1
    }
    out.toArray
  }

  /** Segment one word: character pieces, then every merge in training
    * order. */
  def encode(word: String, merges: Seq[(String, String)]): Array[String] = {
    var pieces: Array[String] = word.map(_.toString).toArray
    merges.foreach { case (l, r) => pieces = applyMerge(pieces, l, r) }
    pieces
  }

  /** Train the merge table on `docs.textCol`. Deterministic: integer
    * counts, (count DESC, lhs, rhs) selection order, fixed round
    * count. Returns < numMerges entries only when the vocabulary runs
    * out of adjacent pairs. */
  def trainMerges(
      docs: DataFrame,
      textCol: String,
      numMerges: Int = defaultMerges,
      vocabWords: Int = defaultVocabWords): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val freqs: Array[(String, Long)] = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w"))
      .limit(vocabWords)
      .as[(String, Long)].collect()
    var vocab: Array[(Array[String], Long)] =
      freqs.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      for ((ps, c) <- vocab; i <- 0 until ps.length - 1) {
        val k = (ps(i), ps(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + c
      }
      if (counts.isEmpty) exhausted = true
      else {
        val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }._1
        merges += best
        vocab = vocab.map { case (ps, c) => (applyMerge(ps, best._1, best._2), c) }
      }
    }
    merges.toSeq
  }

  /** Context-window chunking in PIECE space: each document's in-order
    * BPE piece stream cut into fixed `chunk`-piece training sequences
    * — the model-token twin of `corpus_chunks`' whitespace version
    * (a context window is a piece budget, not a word budget).
    * Segmentation still runs once per DISTINCT word; the in-order
    * stream is reassembled by one doc-keyed ordered aggregation
    * (position-sorted collect + flatten), then chunking is the same
    * map-only slice explode. At 100 TB: one vocabulary-keyed join +
    * one doc-keyed exchange — the minimum any chunker that must see
    * a document's pieces in order pays. */
  def pieceChunks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)],
      chunk: Int = 32): DataFrame = {
    val words = docs
      .select(col(idCol), posexplode(TextOps.tokens(col(textCol))))
      .toDF(idCol, "i", "w")
    val pieces = words.select("w").distinct()
      .select(col("w"), graft.functions.BpePieces.pieces(col("w"), merges).as("ps"))
    words.join(pieces, "w")
      .groupBy(idCol)
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("i"), col("ps")))),
        e => e.getField("ps"))).as("ps"))
      .where(size(col("ps")) >= 1)
      .select(col(idCol), col("ps"),
        explode(expr(s"sequence(0, (size(ps) - 1) div $chunk)")).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        slice(col("ps"), col("chunk_id") * lit(chunk) + lit(1), lit(chunk)).as("ck"))
      .select(col(idCol), col("chunk_id"),
        size(col("ck")).cast("long").as("n_pieces"),
        md5(array_join(col("ck"), " ").cast("binary")).as("chunk_md5"))
  }

  /** Per-document BPE token counts: (id, n_tokens, n_pieces). The
    * segmentation runs once per DISTINCT word; occurrences pay a hash
    * join. */
  def tokenCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("w"))
    val pieces = words.select("w").distinct()
      .select(col("w"),
        size(graft.functions.BpePieces.pieces(col("w"), merges)).as("np"))
    words.join(pieces, "w")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"), sum(col("np")).as("n_pieces"))
  }
}
