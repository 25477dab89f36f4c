package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Typed `Aggregator[IN, BUF, OUT]` library — the faithful port of the
  * reference's `reducefunc` UDF slot (`w7/src/python/reduce.py:2-17`,
  * SURVEY.md §2.4). The reference's reducer sees its whole sorted partition
  * at once; an Aggregator sees a merge tree, so user logic must be
  * commutative + associative — the same property the reference's in-map
  * combiner already assumed (`w7/src/python/map.py:16-22`).
  *
  * Register for SQL/DataFrame use via
  * `org.apache.spark.sql.functions.udaf(...)`.
  */
object Aggregators {

  /** Reference parity: sum of per-key counts (`reduce.py:13-15`). */
  object SumLong extends Aggregator[Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Long): Long = b + a
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(b: Long): Long = b
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  object CountAgg extends Aggregator[Any, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: Any): Long = b + 1
    def merge(b1: Long, b2: Long): Long = b1 + b2
    def finish(b: Long): Long = b
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Bounded top-k by score within each group — keeps a k-bounded buffer
    * per partition so the shuffle carries at most k rows per group per
    * partition (map-side combine for top-k).
    *
    * The buffer invariant is "sorted descending, length ≤ k", which
    * makes the hot path O(1): a row no better than the current k-th is
    * rejected with one comparison; an improving row costs one O(k)
    * insertion; merging two buffers is one O(k) sorted merge. (The
    * first version re-sorted the whole buffer on every input row.) */
  final case class TopK[T](k: Int)(implicit ord: Ordering[T], enc: Encoder[Seq[T]])
      extends Aggregator[T, Seq[T], Seq[T]] {
    require(k > 0, s"TopK needs k > 0, got $k")
    def zero: Seq[T] = Seq.empty
    def reduce(b: Seq[T], a: T): Seq[T] =
      if (b.length >= k && ord.lteq(a, b.last)) b
      else {
        val (hi, lo) = b.span(x => ord.gteq(x, a))
        ((hi :+ a) ++ lo).take(k)
      }
    def merge(b1: Seq[T], b2: Seq[T]): Seq[T] = {
      val x = b1.toIndexedSeq
      val y = b2.toIndexedSeq
      val out = mutable.ArrayBuffer.empty[T]
      var i = 0
      var j = 0
      while (out.length < k && (i < x.length || j < y.length)) {
        if (j >= y.length || (i < x.length && ord.gteq(x(i), y(j)))) {
          out += x(i); i += 1
        } else {
          out += y(j); j += 1
        }
      }
      out.toSeq
    }
    def finish(b: Seq[T]): Seq[T] = b
    def bufferEncoder: Encoder[Seq[T]] = enc
    def outputEncoder: Encoder[Seq[T]] = enc
  }

  /** K-Minimum-Values distinct-count sketch (Bar-Yossef et al. 2002):
    * keeps the k smallest DISTINCT hash values seen — one bounded
    * sorted buffer per partition, mergeable — the classic sketch for
    * "how many distinct" over 100 TB with O(k) state and NO distinct
    * shuffle (a `countDistinct` shuffles every distinct value; this
    * ships ≤ k longs per partition). Estimator: |S| exactly when
    * |S| < k, else (k−1)·2^B / kth_min for B-bit hashes. The buffer
    * invariant is "sorted ascending, distinct, length ≤ k": a value no
    * smaller than the current k-th is rejected in one comparison. */
  final case class KMinValues(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    require(k > 0, s"KMinValues needs k > 0, got $k")
    // Vector, not List: once the buffer is full the hot path is the
    // reject check `a >= b.last`, and List pays O(k) for `length`/`last`
    // on EVERY row — measured 7 s on a 600k-row × 4-column ANALYZE
    // pass, ~3× the whole remaining query. Vector makes the reject O(1)
    // (eC) and only the rare insert pays the O(k) rebuild. Buffers
    // arriving from Spark's Seq[Long] decoder may be another Seq type;
    // normalizing through `toVector` on first touch keeps the invariant.
    def zero: Seq[Long] = Vector.empty
    def reduce(b0: Seq[Long], a: Long): Seq[Long] = {
      val b = b0 match { case v: Vector[Long] => v; case s => s.toVector }
      if (b.length >= k && a >= b.last) b
      else {
        val (lo, hi) = b.span(_ < a)
        if (hi.headOption.contains(a)) b
        else ((lo :+ a) ++ hi).take(k)
      }
    }
    def merge(b1: Seq[Long], b2: Seq[Long]): Seq[Long] = {
      val x = b1.toIndexedSeq
      val y = b2.toIndexedSeq
      val out = mutable.ArrayBuffer.empty[Long]
      var i = 0
      var j = 0
      while (out.length < k && (i < x.length || j < y.length)) {
        if (j >= y.length) { out += x(i); i += 1 }
        else if (i >= x.length) { out += y(j); j += 1 }
        else if (x(i) < y(j)) { out += x(i); i += 1 }
        else if (y(j) < x(i)) { out += y(j); j += 1 }
        else { out += x(i); i += 1; j += 1 }
      }
      out.toSeq
    }
    def finish(b: Seq[Long]): Seq[Long] = b
    def bufferEncoder: Encoder[Seq[Long]] = ExprEnc.longSeq
    def outputEncoder: Encoder[Seq[Long]] = ExprEnc.longSeq
  }

  /** Count-Min frequency sketch (Cormode & Muthukrishnan 2005): d rows
    * of w counters; every occurrence increments one counter per row and
    * a term's estimate is the MIN of its d counters — always ≥ the true
    * count, overestimating by ≈ N/w per row with the min over d rows
    * making a large error exponentially unlikely. State is a FIXED d·w
    * longs per partition, merged by element-wise sum — term-frequency
    * estimation over 100 TB in one pass with no per-term groupBy
    * shuffle. Input rows carry their d counter positions pre-computed
    * as a column (engine-independent md5-slice hashing — see
    * `Sketches.cmsTermFreq` — so an external SQL engine rebuilds the
    * identical counters). */
  final case class CountMin(d: Int, w: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    require(d > 0 && w > 0, s"CountMin needs d, w > 0, got d=$d w=$w")
    def zero: Array[Long] = new Array[Long](d * w)
    def reduce(b: Array[Long], pos: Seq[Long]): Array[Long] = {
      var i = 0
      while (i < d) { b(i * w + pos(i).toInt) += 1; i += 1 }
      b
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) += b2(i); i += 1 }
      b1
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExprEnc.longArray
    def outputEncoder: Encoder[Seq[Long]] = ExprEnc.longSeq
  }

  /** Single-pass mean without a second aggregation job. */
  object MeanDouble extends Aggregator[Double, (Double, Long), Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), a: Double): (Double, Long) = (b._1 + a, b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(b: (Double, Long)): Double = if (b._2 == 0) 0.0 else b._1 / b._2
    def bufferEncoder: Encoder[(Double, Long)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Element-wise min of fixed-width long vectors — the merge step of a
    * MinHash signature (extension surface, SURVEY.md §2.5). */
  final case class MinVector(width: Int)
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.fill(width)(Long.MaxValue)
    def reduce(b: Array[Long], a: Array[Long]): Array[Long] = {
      var i = 0
      while (i < width) { if (a(i) < b(i)) b(i) = a(i); i += 1 }
      b
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = reduce(b1, b2)
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: Encoder[Array[Long]] = ExprEnc.longArray
    def outputEncoder: Encoder[Array[Long]] = ExprEnc.longArray
  }

  /** Bloom-filter bitmap builder (Bloom 1970): a FIXED `words`·64-bit
    * bitmap per partition; every input row sets its d pre-computed bit
    * positions, partitions merge by bitwise OR. No false negatives by
    * construction, so filtering a big relation through the bitmap
    * before an exact join can only drop rows the join would drop
    * anyway. At 100 TB this is the semi-join reduction: a build side
    * too large to broadcast as rows (keys + payloads) still broadcasts
    * as a bitmap of a few hundred KB, pruning most of the probe side
    * BEFORE it pays the join shuffle. Positions arrive pre-computed as
    * a column (engine-independent md5-slice hashing, see
    * `BloomJoin.bitPositions`). */
  final case class BloomOr(words: Int)
      extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    require(words > 0, s"BloomOr needs words > 0, got $words")
    def zero: Array[Long] = new Array[Long](words)
    def reduce(b: Array[Long], pos: Seq[Long]): Array[Long] = {
      pos.foreach { p => b((p >>> 6).toInt) |= 1L << (p & 63) }
      b
    }
    def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b1.length) { b1(i) |= b2(i); i += 1 }
      b1
    }
    def finish(b: Array[Long]): Seq[Long] = b.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExprEnc.longArray
    def outputEncoder: Encoder[Seq[Long]] = ExprEnc.longSeq
  }

  /** Misra–Gries frequent-items summary (Misra & Gries 1982) with the
    * mergeable-summaries combine step (Agarwal et al., PODS 2012):
    * at most `m` (item, counter) entries per buffer; an unseen item
    * either takes a free slot or triggers a decrement-all round, and
    * two buffers merge by summing counters then subtracting the
    * (m+1)-th largest count and dropping non-positives — which
    * preserves the MG bound, so after ANY merge tree every item with
    * true count > n/(m+1) still holds a slot. The candidate SET is
    * merge-order-dependent (only the guaranteed-superset property is
    * not), so consumers must treat the output as candidates for an
    * exact second pass, never as the answer — see
    * `Sketches.heavyHittersExact`. Decrement rounds cost O(m) but
    * retire m+1 count units each, so total work stays O(n). */
  final case class MisraGries(m: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    require(m > 0, s"MisraGries needs m > 0, got $m")
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], w: String): Map[String, Long] =
      b.get(w) match {
        case Some(c)            => b.updated(w, c + 1)
        case None if b.size < m => b.updated(w, 1L)
        case None =>
          b.collect { case (k, c) if c > 1 => k -> (c - 1) }
      }
    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val sum = b2.foldLeft(b1) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      if (sum.size <= m) sum
      else {
        val v = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(m)
        sum.collect { case (k, c) if c > v => k -> (c - v) }
      }
    }
    def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted
    def bufferEncoder: Encoder[Map[String, Long]] = ExprEnc.stringLongMap
    def outputEncoder: Encoder[Seq[String]] = ExprEnc.stringSeq
  }

  private object ExprEnc {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val longArray: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    val longSeq: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    val stringSeq: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
    val stringLongMap: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  }
}
