package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native codegen'd quantized dot product. Each side is either
  * `array<float>` — quantized per element as sum_i round(x_i*1000),
  * rounding half away from zero (identical to `round(x)` in SQL engines
  * and to `Similarity.quantizedDot`'s higher-order-function formulation)
  * — or `array<long>`, taken as ALREADY quantized (the trained IVF
  * centroids live in quantized int64 units; re-quantizing them would be
  * wrong and converting them back to float would lose exactness). The
  * product is exact int64 arithmetic either way.
  *
  * Replaces the HOF formulation in hot paths — that version allocates a
  * lambda frame per element; this compiles to a tight primitive loop
  * inside whole-stage codegen.
  *
  * Returns null if either side is null or lengths differ (zip_with-pad
  * semantics collapse to null the same way).
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private def elemIsLong(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"qdot needs array<float> or array<long> sides, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lLong = elemIsLong(left)
    val rLong = elemIsLong(right)
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lLong) x.getLong(i) else QuantizedDot.q(x.getFloat(i))
      val yv = if (rLong) y.getLong(i) else QuantizedDot.q(y.getFloat(i))
      acc += xv * yv
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
      def get(arr: String, long: Boolean): String =
        if (long) s"$arr.getLong($i)" else s"$cls.q($arr.getFloat($i))"
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${get(a, elemIsLong(left))} * ${get(b, elemIsLong(right))};
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
