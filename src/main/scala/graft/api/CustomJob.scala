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

  /** map → shuffle by key → whole-group reduce, with `r` reduce
    * partitions (`hash(key) % R` at `w7/src/worker/workerimpl.cc:254` ≙
    * Spark's HashPartitioner under the repartition). */
  def run(lines: Dataset[String], mapper: TextMapper, reducer: TextReducer, r: Int): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines
      .flatMap(mapper.map(_))
      .groupByKey(_._1)
      .mapGroups { (k, it) => (k, reducer.reduce(k, it.map(_._2))) }
      .toDF("key", "value")
      .repartition(r, org.apache.spark.sql.functions.col("key"))
  }
}
