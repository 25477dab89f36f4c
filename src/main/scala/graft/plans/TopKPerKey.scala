package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Top-k rows per key — the whole-operator extension point (SURVEY.md
  * §7.4 class (c): LogicalPlan + SparkStrategy + SparkPlan).
  *
  * The built-in formulation (`row_number().over(Window.partitionBy(key)
  * .orderBy(...)) <= k`) shuffles EVERY row of a key to one task and
  * sorts it. This operator keeps a bounded k-heap per key on the map
  * side (partial), shuffles only ≤ k rows per key per input partition,
  * and re-merges heaps after the exchange (final) — the aggregation-
  * style two-phase shape that survives hot keys at 100 TB. The planner
  * inserts the exchange itself from `requiredChildDistribution`.
  *
  * Memory model (the aggregate split, made spill-safe):
  *  - the PARTIAL phase keeps a hash map of per-key heaps and FLUSHES
  *    the whole batch downstream whenever the map reaches
  *    `graft.topk.maxKeysInMemory` keys — emitting more than one ≤k
  *    batch per key is fine because the final phase re-merges, so
  *    partial memory is strictly bounded even on near-unique keys;
  *  - the FINAL phase requires its (already k-bounded, post-shuffle)
  *    input sorted by key and streams one heap at a time — O(k) memory;
  *    the planner satisfies the requirement with SortExec, whose
  *    external sorter is the actual spill path.
  */
case class TopKPerKeyPlan(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, planLater(child), partial = true)
      TopKPerKeyExec(keys, order, k, partial, partial = false) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    partial: Boolean) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    if (partial) Seq(Nil)
    else Seq(keys.map(key => SortOrder(key, Ascending)))

  /** Both phases are per-partition transforms, so the child's
    * partitioning survives — without this override the node reports
    * UnknownPartitioning and every downstream key-clustered consumer
    * (e.g. a rank window over the same keys) pays a REDUNDANT exchange
    * of the already-key-partitioned output. */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  /** The final phase streams one key-group at a time over key-sorted
    * input, so its output stays key-clustered in ascending key blocks
    * (rows within a group are heap-ordered — only the key prefix is
    * promised). The partial phase's hash-map scrambles order. */
  override def outputOrdering: Seq[SortOrder] =
    if (partial) Nil else keys.map(key => SortOrder(key, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val orderExprs = order
    val keyExprs = keys
    val limit = k
    val isPartial = partial
    val maxKeys = conf.getConfString("graft.topk.maxKeysInMemory", "262144").toInt
    child.execute().mapPartitions { iter =>
      // heap keeps the k first rows in `order`; comparator reversed so
      // poll() drops the worst
      val ordering = RowOrdering.create(orderExprs, childOutput)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      import scala.jdk.CollectionConverters._

      if (isPartial) {
        // hash map of heaps, flushed as a batch whenever it reaches
        // maxKeys: a key split across batches emits ≤ k rows per batch
        // and the final phase re-merges — bounded memory, same answer
        def batch(): Iterator[InternalRow] = {
          val groups = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
          while (iter.hasNext && groups.size() < maxKeys) {
            val row = iter.next()
            val key = keyProj(row).copy()
            var heap = groups.get(key)
            if (heap == null) {
              heap = new java.util.PriorityQueue[InternalRow](limit + 1, ordering.reversed())
              groups.put(key, heap)
            }
            heap.add(row.copy())
            if (heap.size() > limit) heap.poll()
          }
          groups.values().iterator().asScala.flatMap(_.iterator().asScala)
        }
        Iterator.continually(()).takeWhile(_ => iter.hasNext).flatMap(_ => batch())
      } else {
        // input is key-sorted (requiredChildOrdering): stream one
        // group's heap at a time — O(k) memory, spill delegated to the
        // planner-inserted external sort
        new Iterator[InternalRow] {
          private var pending: InternalRow = if (iter.hasNext) iter.next().copy() else null
          private var drain: Iterator[InternalRow] = Iterator.empty

          private def buildGroup(): Unit = {
            val curKey = keyProj(pending).copy()
            val heap = new java.util.PriorityQueue[InternalRow](limit + 1, ordering.reversed())
            heap.add(pending)
            pending = null
            var done = false
            while (!done && iter.hasNext) {
              val row = iter.next()
              if (keyProj(row) == curKey) {
                heap.add(row.copy())
                if (heap.size() > limit) heap.poll()
              } else {
                pending = row.copy()
                done = true
              }
            }
            drain = heap.iterator().asScala
          }

          override def hasNext: Boolean = {
            while (!drain.hasNext && pending != null) buildGroup()
            drain.hasNext
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            drain.next()
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerKey {

  /** Register the strategy on a session (idempotent). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies = cur :+ TopKPerKeyStrategy
    }
  }

  /** Top-k rows of `df` per `keyCols` group, "top" = first in `sortCols`
    * order ((name, ascending) pairs). Output row order within groups is
    * unspecified — sort downstream. */
  def apply(
      df: DataFrame,
      keyCols: Seq[String],
      sortCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    install(df.sparkSession)
    val child = GraftBridge.plan(df)
    def attr(name: String): Expression = {
      val matches = child.output.filter(_.name == name)
      if (matches.isEmpty) sys.error(s"column $name not in ${child.output.map(_.name)}")
      if (matches.length > 1) sys.error(
        s"column $name is ambiguous (${matches.length} attributes match) — alias the inputs first")
      matches.head
    }
    val keyExprs: Seq[Expression] = keyCols.map(attr)
    val sortOrders: Seq[SortOrder] = sortCols.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    GraftBridge.ofRows(df.sparkSession, TopKPerKeyPlan(keyExprs, sortOrders, k, child))
  }
}
