package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Distinct 44-bit md5 hashes of word n-gram shingles from a token
  * array — one primitive pass per row, no shingle-string arrays, no
  * higher-order functions.
  *
  * Value parity contract: each hash equals
  * `conv(substring(md5(shingle), 1, 11), 16, 10)` of the space-joined
  * shingle string (= DuckDB `CAST(concat('0x', substring(md5(g), 1,
  * 11)) AS BIGINT)`), i.e. the first 11 hex chars of the digest as an
  * int64 — so a DuckDB oracle rebuilds identical values from scratch.
  * Unlike `ShingleHashSet` (engine-internal xxhash64, for LSH
  * candidates that get exact-verified) this family is for sketches
  * whose VALUES cross the engine boundary. The HOF formulation it
  * replaces (shingle strings via transform+array_join+slice, then
  * explode+md5) evaluates interpreted lambdas per element and was the
  * whole cost of the KMV sketch query. CodegenFallback: the per-row
  * work is a tight loop already. */
case class ShingleMd5Hashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val tb = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) { tb(i) = toks.getUTF8String(i).getBytes; i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= m - n) {
      var len = n - 1
      var j = 0
      while (j < n) { len += tb(i + j).length; j += 1 }
      val buf = new Array[Byte](len)
      var off = 0
      j = 0
      while (j < n) {
        if (j > 0) { buf(off) = ' '; off += 1 }
        val t = tb(i + j)
        System.arraycopy(t, 0, buf, off, t.length)
        off += t.length
        j += 1
      }
      val d = md.digest(buf)
      // first 11 hex chars = 44 bits: 5 full bytes + the high nibble of
      // the 6th — matches conv(substring(md5_hex, 1, 11), 16, 10)
      val h = ((d(0) & 0xffL) << 36) | ((d(1) & 0xffL) << 28) |
        ((d(2) & 0xffL) << 20) | ((d(3) & 0xffL) << 12) |
        ((d(4) & 0xffL) << 4) | ((d(5) & 0xffL) >> 4)
      seen.add(h)
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

object ShingleMd5Hashes {
  def shingleMd5(tokens: Column, n: Int): Column =
    GraftBridge.column(ShingleMd5Hashes(GraftBridge.expression(tokens), n))
}
