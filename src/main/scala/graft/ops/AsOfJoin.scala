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
}
