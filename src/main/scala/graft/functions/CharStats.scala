package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass byte-histogram statistics over a string's UTF-8
  * bytes — the gibberish/junk signal family (a natural-language page
  * has a diffuse character distribution; base64 blobs, minified JS and
  * `aaaa…` runs concentrate it). Two scalar expressions share the
  * 256-slot count loop:
  *
  *  - `CharCollision`: Rényi-2 "collision" concentration
  *    ⌊Σc²·10⁶ / n²⌋ — the exact integer rational of Σp² (collision
  *    entropy = −log₂ Σp², monotone in this value, so thresholds can
  *    be stated on the rational and no float log ever crosses the
  *    engine boundary — the `bigramLmScore` micro-ratio discipline).
  *    Empty string → 0 by contract (no distribution to concentrate).
  *    Bounds: n ≤ 2²⁰ (`TextOps.maxDocChars`) ⇒ Σc²·10⁶ ≤ 10⁶·n² ≈
  *    1.1·10¹⁸ < 2⁶³ — no overflow, no ANSI throw.
  *  - `CharDistinct`: count of distinct bytes.
  *
  * Byte semantics (not code points): exact char statistics on ASCII
  * corpora — the same contract `RollingHash` declares — and still a
  * valid concentration signal on multi-byte text. O(len) per row,
  * fixed 256-int scratch, codegen'd; the HOF reference twin
  * (`TextAnalysis.charSumSqHof`) is O(len·distinct) and exists to
  * validate this loop in `R8OpsSpec`.
  */
case class CharCollision(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length.toLong
    if (n == 0L) 0L
    else {
      val counts = new Array[Long](256)
      var i = 0
      while (i < bytes.length) { counts(bytes(i) & 0xff) += 1L; i += 1 }
      var ss = 0L
      var j = 0
      while (j < 256) { ss += counts(j) * counts(j); j += 1 }
      ss * 1000000L / (n * n)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val counts = ctx.freshName("counts")
      val ss = ctx.freshName("ss")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |final byte[] $bytes = $s.getBytes();
         |final long $n = (long) $bytes.length;
         |if ($n == 0L) {
         |  ${ev.value} = 0L;
         |} else {
         |  final long[] $counts = new long[256];
         |  for (int $i = 0; $i < $bytes.length; $i++) {
         |    $counts[$bytes[$i] & 0xff] += 1L;
         |  }
         |  long $ss = 0L;
         |  for (int $i = 0; $i < 256; $i++) {
         |    $ss += $counts[$i] * $counts[$i];
         |  }
         |  ${ev.value} = $ss * 1000000L / ($n * $n);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct UTF-8 byte count — see [[CharCollision]] for the contract. */
case class CharDistinct(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val seen = new Array[Boolean](256)
    var d = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      if (!seen(b)) { seen(b) = true; d += 1L }
      i += 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val seen = ctx.freshName("seen")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      s"""
         |final byte[] $bytes = $s.getBytes();
         |final boolean[] $seen = new boolean[256];
         |long $d = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  final int $b = $bytes[$i] & 0xff;
         |  if (!$seen[$b]) { $seen[$b] = true; $d += 1L; }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharStats {
  def collisionMicro(s: Column): Column =
    GraftBridge.column(CharCollision(GraftBridge.expression(s)))
  def distinctBytes(s: Column): Column =
    GraftBridge.column(CharDistinct(GraftBridge.expression(s)))
}
