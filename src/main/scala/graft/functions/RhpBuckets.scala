package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All `tables` random-hyperplane LSH bucket ids of an embedding in one
  * pass: element t of the output is the sign-bit bucket of table t
  * (`planes` hyperplanes per table).
  *
  * Exists because the Column-expression formulation (a sum of
  * `element_at` terms per plane per table) creates tables×planes×dim
  * expression nodes — ~25k nodes blow Janino codegen into minutes of
  * compilation. Here the plane matrix is generated once per executor and
  * the per-row work is a primitive triple loop (CodegenFallback; the
  * loop is already tight Scala).
  *
  * The hyperplanes are engine-independent by construction so any SQL
  * engine can recompute the exact buckets (this is what gives the ANN
  * query a full hash oracle): component (t,p,i) is the small integer
  * `(md5_hex15("t:p:i") mod 17) - 8` — sparse ±small-int projections are
  * a standard random-projection family (Achlioptas '03) — and the sign
  * test uses the exact int64 dot of the ×1000-quantized vector, so the
  * bucket bit can never differ across engines by float summation order. */
case class RhpBuckets(child: Expression, dim: Int, planes: Int, tables: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val planeVecs: Array[Array[Long]] = {
    val all = new Array[Array[Long]](tables * planes)
    var t = 0
    while (t < tables) {
      var p = 0
      while (p < planes) {
        val w = new Array[Long](dim)
        var i = 0
        while (i < dim) {
          w(i) = RhpBuckets.planeWeight(t, p, i)
          i += 1
        }
        all(t * planes + p) = w
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
        var dot = 0L
        var i = 0
        while (i < n) {
          dot += QuantizedDot.q(vec.getFloat(i)) * plane(i)
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

  /** Hyperplane component (t,p,i): first 15 hex chars of md5("t:p:i")
    * as int64, mod 17, shifted to [-8, 8]. md5 hex is identical in the
    * JVM, Spark SQL, and DuckDB, so this exact formula is reproducible
    * as SQL: `(CAST(concat('0x', substring(md5(t||':'||p||':'||i),1,15))
    * AS BIGINT) % 17) - 8`. */
  def planeWeight(t: Int, p: Int, i: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"$t:$p:$i".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % 17L - 8L
  }

  def rhpBuckets(vec: Column, dim: Int, planes: Int, tables: Int): Column =
    GraftBridge.column(RhpBuckets(GraftBridge.expression(vec), dim, planes, tables))
}
