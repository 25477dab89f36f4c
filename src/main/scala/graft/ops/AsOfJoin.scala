package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for each left row, the latest right row with
  * rightTime <= leftTime within the same key — an operator Spark lacks
  * natively. Composed from built-ins (preference (a) in SURVEY.md §7.4):
  * tag both sides, union, and carry the latest right payload forward with
  * a `last(ignoreNulls)` running window — one shuffle on (key), no
  * range-join explosion, linear in |left|+|right| per key. Right rows
  * must be unique per (key, time); pre-aggregate to enforce it.
  *
  * At scale this is the standard sort-based as-of: the union sorts
  * within key partitions (one exchange, one sort), where a naive
  * range-join would be O(|L|·|R|) per key.
  */
object AsOfJoin {

  /** @param left      left relation
    * @param right     right relation, unique per (key, time)
    * @param key       equality key column name (both sides)
    * @param leftTime  left ordering column name (numeric/time)
    * @param rightTime right ordering column name (numeric/time)
    * @param payload   right columns to carry to matched left rows
    */
  def asof(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val lCols = left.columns
    val reserved = Set("__t", "__tag", "__p", "__asof") ++ payload.map(c => s"asof_$c")
    val clash = (lCols ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"as-of join reserves column names ${clash.distinct.mkString(", ")}; rename the inputs")
    // the whole payload travels as ONE struct: a right row's struct is
    // non-null even when every payload FIELD is null, so a legitimately
    // null payload value is carried (not skipped for an older row) and
    // all fields always come from the same matched right row
    val payloadType = StructType(payload.map(c => right.schema(c).copy(name = c)))
    // tag 0 = right, 1 = left: at equal times the right row sorts first,
    // giving <= (inclusive) as-of semantics
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .select(Seq(col(key), col("__t"), col("__tag")) ++
        lCols.filterNot(_ == key).map(col) :+
        lit(null).cast(payloadType).as("__p"): _*)
    val r = right
      .withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(0))
      .select(Seq(col(key), col("__t"), col("__tag")) ++
        lCols.filterNot(_ == key).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(payload.map(c => col(c).as(c)): _*).as("__p"): _*)
    val w = Window
      .partitionBy(key)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(lCols.map(col) ++
        payload.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }

  /** Point-in-time enrichment against an SCD-2 interval dimension —
    * the leakage-safe feature join (each fact sees the dimension value
    * that was TRUE at its own time, never a later backfill): for each
    * left row, the right row whose validity interval
    * `[effFrom, effTo)` contains `leftTime` (effTo null = still
    * current); facts falling in a coverage gap — before the first
    * version, or after a tombstone closed the interval — get null
    * payload, exactly as history says.
    *
    * Composed as [[asof]] on `effFrom` plus an interval-validity mask:
    * the as-of picks the latest version STARTED at or before the fact,
    * and the mask nulls it back out when that version had already
    * ENDED — together exactly the interval-containment join (intervals
    * per key are disjoint by SCD-2 construction). Scale shape: the
    * same single key-partitioned sort as `asof` — linear in
    * |facts|+|versions| per key where the naive `BETWEEN` range join
    * is O(|facts|·|versions|) per key with no equi-predicate for the
    * planner to hash on. */
  def pointInTime(
      left: DataFrame,
      dim: DataFrame,
      key: String,
      leftTime: String,
      effFrom: String,
      effTo: String,
      payload: Seq[String]): DataFrame = {
    require(!payload.contains(effTo),
      s"payload must not include the interval-end column $effTo")
    val j = asof(left, dim, key, leftTime, effFrom, payload :+ effTo)
    val valid = col(s"asof_$effTo").isNull ||
      col(leftTime) < col(s"asof_$effTo")
    j.select(left.columns.map(col) ++
        payload.map(c => when(valid, col(s"asof_$c"))
          .otherwise(lit(null)).as(s"asof_$c")): _*)
  }
}
