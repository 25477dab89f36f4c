package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `tables` random-hyperplane LSH bucket ids of an embedding in one
  * pass: element t of the output is the sign-bit bucket of table t
  * (`planes` hyperplanes, deterministic per-table seed).
  *
  * Exists because the Column-expression formulation (a sum of
  * `element_at` terms per plane per table) creates tables×planes×dim
  * expression nodes — ~25k nodes blow Janino codegen into minutes of
  * compilation. Here the plane matrix is generated once per executor and
  * the per-row work is a primitive triple loop (CodegenFallback; the
  * loop is already tight Scala). */
case class RhpBuckets(child: Expression, dim: Int, planes: Int, tables: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val planeVecs: Array[Array[Double]] = {
    val all = new Array[Array[Double]](tables * planes)
    var t = 0
    while (t < tables) {
      val rnd = new scala.util.Random(100 + t)
      var p = 0
      while (p < planes) {
        all(t * planes + p) = Array.fill(dim)(rnd.nextGaussian())
        p += 1
      }
      t += 1
    }
    all
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = math.min(dim, vec.numElements())
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < planes) {
        val plane = planeVecs(t * planes + p)
        var dot = 0.0
        var i = 0
        while (i < n) {
          dot += vec.getFloat(i).toDouble * plane(i)
          i += 1
        }
        if (dot > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RhpBuckets {
  def rhpBuckets(vec: Column, dim: Int, planes: Int, tables: Int): Column =
    GraftBridge.column(RhpBuckets(GraftBridge.expression(vec), dim, planes, tables))
}
