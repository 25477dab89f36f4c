package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BPE segmentation of a word under a fixed merge table
  * (`ext.Bpe.encode` as an expression): character pieces, then every
  * merge in training order via the deterministic left scan.
  *
  * CodegenFallback on purpose (the RhpBuckets precedent): the merge
  * loop is algorithmic, and the expression is only ever applied to the
  * DISTINCT-words relation — a vocabulary-sized input at any corpus
  * scale — so codegen would buy nothing on the hot path. The merge
  * table ships inside the expression (vocabulary-bounded, the same
  * O(metadata) budget as a broadcast dimension). */
case class BpePieces(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val pieces = graft.ext.Bpe.encode(input.asInstanceOf[UTF8String].toString, merges)
    new GenericArrayData(pieces.map(UTF8String.fromString(_): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpePieces {
  def pieces(word: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpePieces(GraftBridge.expression(word), merges))
}
