package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Distinct 64-bit hashes of word n-gram shingles from a token array —
  * one primitive pass per row (token hash via xxhash64 of the UTF-8
  * bytes, n-gram combine via splitmix64 chaining, dedup via a hash set).
  *
  * Exists because the higher-order-function formulation re-evaluates the
  * token-hash subtree once per lambda element in interpreted mode —
  * O(tokens²) per document. Hash values are engine-internal (LSH
  * candidates are always verified with exact Jaccard), so only
  * determinism matters, not any particular family. CodegenFallback: the
  * per-row work is a tight Scala loop already; codegen would only save
  * the call boundary. */
case class ShingleHashSet(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = toks.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= m - n) {
      var acc = 42L
      var j = 0
      while (j < n) {
        acc = MinHashSig.mix(acc ^ th(i + j))
        j += 1
      }
      seen.add(acc)
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

object ShingleHashSet {
  def shingleHashes(tokens: Column, n: Int): Column =
    GraftBridge.column(ShingleHashSet(GraftBridge.expression(tokens), n))
}
