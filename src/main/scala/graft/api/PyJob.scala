package graft.api

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The reference framework's LITERAL Python UDF contract on Spark: a
  * job is two user-authored `.py` files — `mapfunc(in_file)` returning
  * a dict over one input shard, `reducefunc(in_file)` returning a dict
  * over one `key:value` reduce partition — submitted at run time with
  * no compiled code (`w6/docs/design.md:66-74` "Accepts … map function
  * (.py file), reduce function (.py file)"; executed by the embedded
  * interpreter at `w7/src/worker/workerimpl.cc:143-247`).
  *
  * Spark spelling: `RDD.pipe` — the oldest public Hadoop-streaming
  * shape Spark carries — streams each partition through
  * `python3 pyshim.py {map|reduce} user.py`; the shim spools stdin to
  * a temp file and hands the user function the FILE PATH it expects,
  * so the `.py` runs unmodified. One map-task invocation per input
  * partition (≙ one `mapfunc` per shard file), then an explicit
  * `repartition(r, key)` — the reference's `hash(key) % R`
  * (`w7/src/worker/workerimpl.cc:254`) — then one `reducefunc` per
  * reduce partition. Per-partition (not per-row) process granularity:
  * the subprocess cost amortizes over the shard exactly like the
  * reference's per-shard interpreter call.
  *
  * Scale notes: the subprocess pipe is the slow path by construction
  * (row serialization over stdin, no codegen, no partial aggregation
  * before the shuffle — the user dict combines only WITHIN a
  * partition, matching the reference's in-UDF combiner) — it exists
  * for contract parity; `--mapper-expr`/`--mapper-class` are the fast
  * equivalents. Local mode shares one filesystem, so driver-local
  * `.py` paths resolve on executors; a cluster deployment ships the
  * scripts with `SparkContext.addFile` and resolves `SparkFiles.get`
  * per executor.
  */
object PyJob {

  /** The stdin→file→function→stdout bridge, extracted from resources
    * to a temp file once per JVM (executors in local mode share it). */
  private lazy val shimPath: String = {
    val in = getClass.getResourceAsStream("/graft/pyshim.py")
    require(in != null, "resource graft/pyshim.py missing")
    val tmp = Files.createTempFile("graft_pyshim", ".py")
    try Files.copy(in, tmp, StandardCopyOption.REPLACE_EXISTING) finally in.close()
    tmp.toFile.deleteOnExit()
    tmp.toString
  }

  /** Run a two-`.py` MapReduce job over a line Dataset. Returns
    * (key string, value string) — the reference's untyped wire pairs;
    * map-only when `reducerPy` is None (the reference's absent-reduce
    * degenerate case). Output of the reduce form keeps the
    * `hash(key) % r` partitioning, so `KvText.write(prePartitioned =
    * true)` emits the `out_<j>` contract without a second exchange.
    *
    * `m > 0` pins the MAP task count exactly (one `mapfunc` invocation
    * per partition ≙ the reference's M knob, `--m M` /
    * `Master::create_sharding_data`): the explicit round-robin
    * repartition overrides whatever partitioning the source planning
    * produced — the direct control when split-size-derived sharding
    * (`GraftSession.withMapShards`) can't reach the requested count
    * (e.g. a single small file never splits below one partition).
    * `m = 0` (default) keeps the source partitioning. */
  def run(
      lines: Dataset[String],
      mapperPy: String,
      reducerPy: Option[String],
      r: Int,
      m: Int = 0,
      python: String = sys.env.getOrElse("GRAFT_PYTHON", "python3")): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    def parse(raw: Dataset[String]): DataFrame = raw
      // LAST-colon split (rsplit parity): keys may contain ':'
      .select(
        regexp_extract(col("value"), "^(.*):([^:]*)$", 1).as("key"),
        regexp_extract(col("value"), "^(.*):([^:]*)$", 2).as("value"))
    val mapperAbs = Paths.get(mapperPy).toAbsolutePath.toString
    require(Files.exists(Paths.get(mapperAbs)), s"mapper script not found: $mapperAbs")
    val sharded = if (m > 0) lines.repartition(m) else lines
    val mapped = parse(
      sharded.rdd.pipe(Seq(python, shimPath, "map", mapperAbs)).toDS())
    reducerPy match {
      case None => mapped
      case Some(rp) =>
        val reducerAbs = Paths.get(rp).toAbsolutePath.toString
        require(Files.exists(Paths.get(reducerAbs)), s"reducer script not found: $reducerAbs")
        val partitioned = mapped
          .repartition(r, col("key"))
          .select(concat_ws(":", col("key"), col("value")).as("value"))
          .as[String]
        parse(partitioned.rdd.pipe(Seq(python, shimPath, "reduce", reducerAbs)).toDS())
    }
  }
}
