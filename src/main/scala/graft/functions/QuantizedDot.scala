package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd quantized dot product over two `array<float>` columns:
  * sum_i round(a_i*1000) * round(b_i*1000) as int64, rounding half away
  * from zero (identical to `round(x)` in SQL engines and to
  * `Similarity.quantizedDot`'s higher-order-function formulation, which
  * this replaces in hot paths — the HOF version allocates a lambda frame
  * per element; this compiles to a tight primitive loop inside
  * whole-stage codegen).
  *
  * Returns null if either side is null or lengths differ (zip_with-pad
  * semantics collapse to null the same way).
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += QuantizedDot.q(x.getFloat(i)) * QuantizedDot.q(y.getFloat(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val cls = QuantizedDot.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $cls.q($a.getFloat($i)) * $cls.q($b.getFloat($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {

  /** Quantize one float coordinate: round(x*1000) half away from zero —
    * must stay bit-compatible with `round(col.cast("double")*1000)`. */
  def q(f: Float): Long = {
    val x = f.toDouble * 1000d
    if (x >= 0) math.floor(x + 0.5d).toLong else math.ceil(x - 0.5d).toLong
  }

  /** Column wrapper. */
  def qdot(a: Column, b: Column): Column =
    GraftBridge.column(QuantizedDot(GraftBridge.expression(a), GraftBridge.expression(b)))
}
