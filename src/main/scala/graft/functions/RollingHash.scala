package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Rabin–Karp rolling fingerprint of a string's UTF-8
  * bytes: h ← (h·131 + byte) mod (2³¹−1), one primitive loop per row.
  *
  * The modulus is the Mersenne prime 2³¹−1 so every intermediate
  * (≤ (2³¹−2)·131 + 255 < 2³⁹) stays far below int64 overflow — ANSI
  * mode (Spark 4 default) would throw on a wraparound multiply, and an
  * overflow-free recurrence is also what makes the exact same value
  * reproducible in any SQL engine (DuckDB: `list_reduce` over
  * code points — equal to bytes on ASCII corpora).
  *
  * This is the reference-free "document fingerprinting" extension op:
  * unlike the md5 fingerprint (`TextAnalysis.fingerprint`), the rolling
  * form extends incrementally — append bytes without rehashing — which
  * is the property streaming ingest fingerprinting needs.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 131L + (bytes(i) & 0xffL)) % 2147483647L
      i += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |final byte[] $bytes = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 131L + ($bytes[$i] & 0xffL)) % 2147483647L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  def rollingHash(s: Column): Column =
    GraftBridge.column(RollingHash(GraftBridge.expression(s)))
}
