package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._

import graft.api.MapReduceJob

/** Serializable fault-injection closures (a FunSuite instance is not). */
object FaultToleranceSpec {

  /** Wraps an iterator so the FIRST attempt of `deadPartition` throws after
    * `failAfter` records have already been emitted downstream — the
    * reference's `fail_after` hook shape (`w7/src/master/master.cc:31`):
    * the worker dies with partial output in flight. Keyed purely on
    * `TaskContext.attemptNumber`, so it is deterministic under any
    * scheduling and needs no shared mutable state. */
  def failingOnFirstAttempt[T](
      it: Iterator[T], deadPartition: Int, failAfter: Int): Iterator[T] = {
    val tc = TaskContext.get()
    if (tc == null || tc.partitionId() != deadPartition || tc.attemptNumber() > 0) it
    else new Iterator[T] {
      private var emitted = 0
      def hasNext: Boolean = {
        if (emitted >= failAfter)
          throw new RuntimeException(
            s"injected fail_after($failAfter) on partition $deadPartition attempt 0")
        it.hasNext
      }
      def next(): T = { emitted += 1; it.next() }
    }
  }

  def tokenizeKv(line: String): Iterator[(String, Long)] =
    MapReduceJobSpec.tokenize(line).iterator.map(_ -> 1L)
}

/** Batch fault-injection parity with the reference's failure demos.
  *
  * The reference's graded workshops kill a worker mid-job and require the
  * job to finish with the same output (`fail_after` hook at
  * `w7/src/master/master.cc:31`, kill script `w7/src/kubernetes/fail.yaml`,
  * demo walkthrough `w6/docs/workshop9.md:8-27`). SURVEY.md §2.3 argues
  * Spark's task retry absorbs that control-path surface (C4/C10); this spec
  * is the argument made executable: a task throws mid-iterator on its first
  * attempt — after partial output has been produced — and the job must
  * still return a result identical to the no-failure run, with the partial
  * attempt discarded (no duplicated records).
  *
  * The shared test session runs `local[4, 3]` (`SparkSpec`), which is local
  * mode's spelling of task retry; a real cluster ships
  * `spark.task.maxFailures = 4` out of the box.
  */
class FaultToleranceSpec extends SparkSpec {
  import FaultToleranceSpec._
  import spark.implicits._

  test("map task killed mid-partition on first attempt: identical result, no duplicates") {
    val docs = io.Tables(spark, sf, "documents")
      .select(col("text")).as[String].repartition(4)

    // identical pipelines; `inject` is the only difference, so any output
    // delta is the retry machinery leaking partial first-attempt output
    def wordCount(inject: Boolean) = docs
      .mapPartitions { it =>
        val in = if (inject) failingOnFirstAttempt(it, deadPartition = 1, failAfter = 7) else it
        in.flatMap(MapReduceJobSpec.tokenize)
      }
      .groupBy(col("value").as("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("word").as[(String, Long)].collect()

    val clean = wordCount(inject = false)
    val faulted = wordCount(inject = true)
    assert(clean.length > 0)
    assert(faulted.sameElements(clean),
      "retried task must replace (not append to) the partial first attempt")
  }

  test("MapReduceJob with a mapper task dying on first attempt matches the clean run") {
    val docs = io.Tables(spark, sf, "documents")
      .select(col("text")).as[String]
    val clean = MapReduceJob[String, String, Long](docs, tokenizeKv, _ + _)
      .run().toDF("word", "cnt").orderBy("word").as[(String, Long)].collect()

    // inject at the map phase via mapPartitionsJob feeding the same reduce
    val mapped = MapReduceJob.mapPartitionsJob[String, (String, Long)](
      docs.repartition(4),
      it => failingOnFirstAttempt(it, deadPartition = 0, failAfter = 3)
        .flatMap(tokenizeKv))
    val faulted = MapReduceJob[(String, Long), String, Long](
      mapped, kv => Iterator.single(kv), _ + _)
      .run().toDF("word", "cnt").orderBy("word").as[(String, Long)].collect()

    assert(clean.length > 0)
    assert(faulted.sameElements(clean))
  }
}
