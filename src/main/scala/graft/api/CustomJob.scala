package graft.api

import org.apache.spark.sql.{DataFrame, Dataset}

/** Dynamic user-UDF job submission — the reference design doc's ideal of
  * POSTing an arbitrary `map.py`/`reduce.py` pair with a job
  * (`w6/docs/design.md:66-74`; `w7/client.sh:28-29` carries unused
  * `--map`/`--reduce` flags for it), honored in JVM terms: the CLI
  * accepts fully-qualified class names implementing these two small
  * traits, instantiates them reflectively on the driver, and ships them
  * to executors inside the job's closures — a user submits a custom
  * mapper/reducer without touching engine code or writing Spark.
  */
trait TextMapper extends Serializable {
  /** One input record → zero or more (key, value) pairs — the
    * reference's mapfunc shape (`w7/src/python/map.py:9-18`). */
  def map(record: String): IterableOnce[(String, String)]
}

trait TextReducer extends Serializable {
  /** All values of one key → the reduced value — the reference's
    * reducefunc shape (`w7/src/python/reduce.py:2-17`): the reducer sees
    * its whole group at once, so non-associative logic is legal here
    * (at the cost of no map-side combine). */
  def reduce(key: String, values: Iterator[String]): String
}

object CustomJob {

  /** Reflectively build a no-arg instance of a user class. */
  def instantiate[T](fqcn: String): T =
    Class.forName(fqcn).getDeclaredConstructor().newInstance().asInstanceOf[T]

  /** map → ONE shuffle by key into exactly `r` partitions → sort-run
    * whole-group reduce (`hash(key) % R` at
    * `w7/src/worker/workerimpl.cc:254` ≙ the explicit repartition, which
    * AQE never coalesces).
    *
    * The reduce phase is the reference's own reducer model: keys arrive
    * in sorted runs and the reducer walks one group at a time
    * (`w7/src/python/reduce.py:6-17` iterates a sorted shuffle file).
    * Spark's external sort is the spill path, and groups stream through
    * a lazy per-key iterator, so a non-associative whole-group reducer
    * never needs its group materialized — and the reduce exchange IS the
    * R partitioning (a `groupByKey.mapGroups` + trailing `repartition(r)`
    * shuffled the same data twice). */
  def run(lines: Dataset[String], mapper: TextMapper, reducer: TextReducer, r: Int): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines
      .flatMap(mapper.map(_))
      .toDF("key", "value")
      .repartition(r, org.apache.spark.sql.functions.col("key"))
      .sortWithinPartitions("key")
      .as[(String, String)]
      .mapPartitions { it =>
        val buf = it.buffered
        new Iterator[(String, String)] {
          def hasNext: Boolean = buf.hasNext
          def next(): (String, String) = {
            val k = buf.head._1
            val values = new Iterator[String] {
              def hasNext: Boolean = buf.hasNext && buf.head._1 == k
              def next(): String = buf.next()._2
            }
            val v = reducer.reduce(k, values)
            while (values.hasNext) values.next() // drain an unconsumed tail
            (k, v)
          }
        }
      }
      .toDF("key", "value")
  }
}
