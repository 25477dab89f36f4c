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

  /** Initial segmentation: one piece per Unicode CODE POINT, not per
    * UTF-16 unit — the oracle's `substring(word, j, 1)` walks code
    * points, and splitting a surrogate pair into two broken half-pieces
    * would desync every non-BMP word across engines. (Identical to a
    * per-char split for BMP text, which is all the test corpora hold.) */
  private[ext] def codePointPieces(word: String): Array[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** UTF-8 byte-order comparison — the collation BOTH engines use for
    * string ordering (Spark's UTF8String, DuckDB's binary VARCHAR).
    * Scala's default String ordering is UTF-16 code units, which ranks
    * supplementary-plane characters BELOW U+E000..U+FFFF (surrogates
    * sort at 0xD800) while UTF-8 ranks them above — a driver-side
    * argmin tie on a non-BMP pair would silently desync the merge
    * table from the oracle's replay. */
  private[ext] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** Segment one word: code-point pieces, then every merge in training
    * order. */
  def encode(word: String, merges: Seq[(String, String)]): Array[String] = {
    var pieces: Array[String] = codePointPieces(word)
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
      freqs.map { case (w, c) => (codePointPieces(w), c) }
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
        // (count DESC, lhs, rhs) with string ties in UTF-8 BYTE order —
        // matching the engines' collation, not Scala's UTF-16 units
        val best = counts.toSeq.min(new Ordering[((String, String), Long)] {
          def compare(a: ((String, String), Long), b: ((String, String), Long)): Int = {
            var d = java.lang.Long.compare(b._2, a._2)
            if (d == 0) d = utf8Compare(a._1._1, b._1._1)
            if (d == 0) d = utf8Compare(a._1._2, b._1._2)
            d
          }
        })._1
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

  /** Per-SOURCE tokenizer-efficiency report — the numbers a tokenizer
    * team watches per domain/language when deciding whether the merge
    * table serves the corpus: fertility (pieces per word) and
    * compression (word chars per piece). A source whose fertility
    * runs high is under-served by the trained vocabulary — its text
    * costs more model context per character — and is the candidate
    * for more merges or more training weight. All integer
    * (per-mille, truncating `div`), so the report replays externally.
    * `n_chars` counts WORD characters (whitespace already spent by
    * tokenization), keeping the ratio a property of the vocabulary,
    * not the corpus's spacing.
    *
    * Cost: the same one distinct-word segmentation every BPE consumer
    * pays (occurrences pay a vocabulary-keyed hash join), then ONE
    * per-source aggregation — nothing new shuffles at corpus scale. */
  def coverageBySource(
      docs: DataFrame,
      textCol: String,
      sourceCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs.select(col(sourceCol),
      explode(TextOps.tokens(col(textCol))).as("w"))
    val pieces = words.select("w").distinct()
      .select(col("w"),
        size(graft.functions.BpePieces.pieces(col("w"), merges)).as("np"))
    words.join(pieces, "w")
      .groupBy(sourceCol)
      .agg(
        count(lit(1)).as("n_words"),
        sum(col("np")).as("n_pieces"),
        sum(length(col("w"))).as("n_chars"))
      .withColumn("pieces_per_word_milli", expr("(1000 * n_pieces) div n_words"))
      .withColumn("chars_per_piece_milli", expr("(1000 * n_chars) div n_pieces"))
  }
}
