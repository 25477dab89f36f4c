package graft.api

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col

/** The reference's whole query surface is "arbitrary per-record map +
  * hash-partitioned per-key reduce" (`w6/docs/design.md:93-101`): a job is
  * `(container, mapfunc, reducefunc, M, R)` (`w7/src/master/requesthandler.h:45-61`).
  * This is that contract as a typed, composable Spark job:
  *
  *   - `mapper` ≙ `mapfunc` (`w7/src/python/map.py:3-26`) — one input record
  *     to zero-or-more (key, value) pairs. (The reference's mapfunc is
  *     file-granular with an internal combiner; Spark's partial aggregation
  *     provides the combiner automatically, so record granularity loses
  *     nothing — SURVEY.md §2.4.)
  *   - `reducer` ≙ `reducefunc` (`w7/src/python/reduce.py:2-17`) — merge of
  *     two values for one key. Must be commutative + associative, the same
  *     property the reference's combiner silently assumes (map.py:16-22).
  *   - `reducers` ≙ `r` — number of output partitions
  *     (hash(key) % R at `w7/src/worker/workerimpl.cc:254` ≙ Spark's
  *     HashPartitioner under the shuffle).
  *
  * Jobs chain (output of one = input of the next, `w6/docs/design.md:74`)
  * because `run()` returns a Dataset.
  */
final class MapReduceJob[I, K, V] private (
    input: Dataset[I],
    mapper: I => IterableOnce[(K, V)],
    reducer: (V, V) => V,
    reducers: Option[Int])(implicit kEnc: Encoder[K], vEnc: Encoder[V]) {

  private implicit val kvEnc: Encoder[(K, V)] = Encoders.tuple(kEnc, vEnc)

  def withReducers(r: Int): MapReduceJob[I, K, V] =
    new MapReduceJob(input, mapper, reducer, Some(r))

  /** Map phase output (pre-shuffle) — the reference's intermediate KV
    * stream (`w7/src/worker/workerimpl.cc:249-263`). */
  def mapped: Dataset[(K, V)] = input.flatMap(mapper)

  /** Full job: map → shuffle by key → per-key reduce. */
  def run(): Dataset[(K, V)] = {
    val reduced = mapped
      .groupByKey(_._1)(kEnc)
      .mapValues(_._2)(vEnc)
      .reduceGroups(reducer)
    val out = reduced
    reducers match {
      case Some(r) => out.repartition(r, col(out.columns.head))
      case None    => out
    }
  }

  /** Chain: feed this job's output into another map/reduce pair
    * (`w6/docs/design.md:74` — "output format = input format"). */
  def andThen[K2, V2](
      nextMapper: ((K, V)) => IterableOnce[(K2, V2)],
      nextReducer: (V2, V2) => V2)(implicit
      k2: Encoder[K2],
      v2: Encoder[V2]): MapReduceJob[(K, V), K2, V2] =
    MapReduceJob(run(), nextMapper, nextReducer)
}

object MapReduceJob {

  def apply[I, K, V](
      input: Dataset[I],
      mapper: I => IterableOnce[(K, V)],
      reducer: (V, V) => V)(implicit
      kEnc: Encoder[K],
      vEnc: Encoder[V]): MapReduceJob[I, K, V] =
    new MapReduceJob(input, mapper, reducer, None)

  /** Aggregator-based variant for non-reduceGroups aggregation (the typed
    * UDAF surface — SURVEY.md §2.4). */
  def aggregate[I, K, V, B, O](
      input: Dataset[I],
      mapper: I => IterableOnce[(K, V)],
      agg: Aggregator[V, B, O])(implicit
      kEnc: Encoder[K],
      vEnc: Encoder[V],
      oEnc: Encoder[O]): Dataset[(K, O)] = {
    implicit val kvEnc: Encoder[(K, V)] = Encoders.tuple(kEnc, vEnc)
    implicit val koEnc: Encoder[(K, O)] = Encoders.tuple(kEnc, oEnc)
    input
      .flatMap(mapper)
      .groupByKey(_._1)(kEnc)
      .mapValues(_._2)(vEnc)
      .agg(agg.toColumn)
  }

  /** Whole-partition escape hatch — the literal shape of the reference's
    * UDFs, which see an entire shard/partition file at once
    * (`w7/src/python/map.py:3`, `w7/src/python/reduce.py:2`,
    * `w7/REPORT_W8.md:45-47`). Prefer record-level `mapper`; use this only
    * for genuinely partition-scoped logic. */
  def mapPartitionsJob[I, O: Encoder](
      input: Dataset[I],
      f: Iterator[I] => Iterator[O]): Dataset[O] =
    input.mapPartitions(f)
}
