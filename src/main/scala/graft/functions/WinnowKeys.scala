package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Distinct winnowing keys (Schleimer et al. 2003) from a token array
  * in ONE primitive pass: word k-grams → 40-bit md5-prefix hash packed
  * with the gram position → sliding-window-of-w minima via a monotonic
  * deque (O(grams), not O(grams·w)) → first-seen-order dedup.
  *
  * Value parity contract (the cross-engine point): each key equals
  * what the HOF formulation produces —
  *   packed(j) = conv(substring(md5(gram_j), 1, 10), 16, 10)·2²⁰
  *               + (2²⁰−1 − j − 1)
  *   keys      = array_distinct of array_min over every w-slice
  * with gram_j the space-joined tokens j..j+k−1 — so the DuckDB oracle
  * replays identical int64 values from scratch, and `WinnowSpec`
  * asserts equality against the interpreted-HOF twin. The position
  * term is INVERTED (mask − j − 1), making the in-window argmin the
  * RIGHTMOST minimal hash — Schleimer's robust-winnowing tie rule —
  * while keeping one `array_min` the whole selection.
  *
  * Replaces a per-row O(grams·w) interpreted chain (md5+conv HOF per
  * gram, then slice+array_min HOFs per window) measured at 8.9 s /
  * 6.7 s (text_winnow / dedup_winnow_pairs, sf0.1) — the same
  * interpreted-lambda trap ShingleMd5Hashes closed for the KMV
  * sketches. CodegenFallback: tight per-row loop already. */
case class WinnowKeys(child: Expression, k: Int, w: Int, posBits: Int)
    extends UnaryExpression with CodegenFallback {

  // the packed key is hash·2^posBits + invertedPos: the 40-bit md5
  // prefix plus the position field must fit in a non-negative int64,
  // and the inverted position term (posMask − i − 1) goes NEGATIVE —
  // silently corrupting keys — once a row carries ≥ 2^posBits − 1
  // grams, so that bound is enforced per row below, not assumed from
  // callers' truncation discipline (TextOps.maxDocChars happens to
  // bound it today)
  require(k > 0 && w > 0 && posBits > 0 && 40 + posBits <= 63,
    s"need k>0, w>0, 0<posBits<=23 (40-bit hash + posBits <= 63), got k=$k w=$w posBits=$posBits")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val posMask = (1L << posBits) - 1
    val space = posMask + 1
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < k) return new GenericArrayData(Array.emptyLongArray)
    require(m - k + 1 <= posMask,
      s"row has ${m - k + 1} $k-grams, exceeding the 2^$posBits-1 position field; " +
        "truncate tokens upstream (TextOps.maxDocChars) or raise posBits")
    val md = java.security.MessageDigest.getInstance("MD5")
    val tb = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) { tb(i) = toks.getUTF8String(i).getBytes; i += 1 }
    val nGrams = m - k + 1
    val packed = new Array[Long](nGrams)
    i = 0
    while (i < nGrams) {
      var len = k - 1
      var j = 0
      while (j < k) { len += tb(i + j).length; j += 1 }
      val buf = new Array[Byte](len)
      var off = 0
      j = 0
      while (j < k) {
        if (j > 0) { buf(off) = ' '; off += 1 }
        val t = tb(i + j)
        System.arraycopy(t, 0, buf, off, t.length)
        off += t.length
        j += 1
      }
      val d = md.digest(buf)
      // first 10 hex chars = 40 bits = the digest's first 5 bytes —
      // matches conv(substring(md5_hex, 1, 10), 16, 10)
      val h = ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) |
        ((d(2) & 0xffL) << 16) | ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
      packed(i) = h * space + (posMask - i - 1)
      i += 1
    }
    // sliding minimum over windows of w (single window of everything
    // when nGrams < w), monotonic deque of candidate indices
    val nWin = math.max(1, nGrams - w + 1)
    val winLen = math.min(w, nGrams)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0 // deque occupies [head, tail)
    i = 0
    while (i < nWin + winLen - 1) {
      while (tail > head && packed(deque(tail - 1)) >= packed(i)) tail -= 1
      deque(tail) = i; tail += 1
      while (deque(head) <= i - winLen) head += 1
      if (i >= winLen - 1) seen.add(packed(deque(head)))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowKeys {
  def winnowKeys(tokens: Column, k: Int, w: Int, posBits: Int): Column =
    GraftBridge.column(WinnowKeys(GraftBridge.expression(tokens), k, w, posBits))
}
