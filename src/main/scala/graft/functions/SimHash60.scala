package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** 60-bit SimHash from an array of word hashes: per bit, the sign of the
  * ±1 vote over all words. One primitive pass per row (word count × 60
  * bit tests) — replaces 60 interpreted `aggregate` lambdas, each of
  * which walked the array separately. Bit semantics are identical to the
  * HOF formulation in `Dedup.simHashFromHashes` (score > 0 sets the
  * bit), which remains as the validation reference and the shape the
  * DuckDB oracle mirrors. */
case class SimHash60(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {
  def simhash60(hashes: Column): Column =
    GraftBridge.column(SimHash60(GraftBridge.expression(hashes)))
}
