package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL exposure of the engine's native expressions, so `spark.sql` users
  * get the same codegen'd kernels as the Column API:
  *
  *   qdot(a, b)            — quantized int64 dot product (QuantizedDot)
  *   minhash_sig(h, k)     — MinHash signature of a hash array (MinHashSig)
  *   shingle_hashes(t, n)  — word n-gram hash set of a token array
  *   rolling_hash(s)       — Rabin–Karp byte fingerprint (RollingHash)
  *   char_collision(s)     — Rényi-2 byte-histogram concentration ×10⁶ (CharCollision)
  *   char_distinct(s)      — distinct byte count (CharDistinct)
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(s"$what must be an integer literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "qdot" -> (exprs => QuantizedDot(exprs(0), exprs(1))),
    "minhash_sig" -> (exprs => MinHashSig(exprs(0), intLit(exprs(1), "numPerms"))),
    "shingle_hashes" -> (exprs => ShingleHashSet(exprs(0), intLit(exprs(1), "n"))),
    "rolling_hash" -> (exprs => RollingHash(exprs(0))),
    "char_collision" -> (exprs => CharCollision(exprs(0))),
    "char_distinct" -> (exprs => CharDistinct(exprs(0))))

  /** Register on a live session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      GraftBridge.registerFunction(spark, name, builder)
    }
}

/** Builder-time registration:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  * Injects the SQL functions AND the custom top-k-per-key planner
  * strategy, so a session configured with this class needs no
  * imperative `register`/`install` calls at all. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, builder) =>
      e.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
  }
}
