package graft

import org.apache.spark.sql.functions.col

import graft.io.{KvText, Tables}
import graft.ops.TextOps

/** CLI job submission — the engine's analogue of the reference client
  * (`w7/client.sh`: `-c container -m M -r R`, word count baked in; the
  * design-doc ideal of POSTing arbitrary map/reduce UDFs,
  * `w6/docs/design.md:66-74`, maps to `--query sql`: SQL text IS this
  * engine's arbitrary-job surface, with the custom native functions —
  * qdot, minhash_sig, shingle_hashes — registered and every table of
  * the input directory exposed as a view).
  *
  * Usage:
  *   graft.Main --input <dir|file> [--format text|parquet]
  *              [--query wordcount|sql|custom|expr|py|<named>] [--sql "SELECT ..."]
  *              [--mapper-class FQCN --reducer-class FQCN]
  *              [--mapper-expr "<array<struct<key,value>> expr>"]
  *              [--reducer-expr "<aggregate over value>"]
  *              [--mapper-py map.py] [--reducer-py reduce.py]
  *              [--m M] [--r R] --output <dir> [--table documents --col text]
  *              [--key <col> --value <col>]
  *
  * `--query custom` is the arbitrary-UDF submission path
  * (`w6/docs/design.md:66-74`): the named classes must implement
  * `graft.api.TextMapper` / `graft.api.TextReducer` and are instantiated
  * reflectively — no engine code changes, no SQL.
  *
  * `--query py` is the reference's contract to the LETTER: two `.py`
  * files (`mapfunc(in_file)` / `reducefunc(in_file)` returning dicts,
  * `w6/docs/design.md:66-74`) run UNMODIFIED via `RDD.pipe` through a
  * stdin→file shim (`graft.api.PyJob`) — slow path by construction,
  * kept for submission parity; `expr`/`custom` are the fast equivalents.
  *
  * `--query expr` is the same contract with no compiled code at all — the
  * closest Spark spelling of the reference's "POST map.py/reduce.py at
  * submit time" (`w6/docs/design.md:66-74`, client flags
  * `w7/client.sh:28-29`). The mapper is a SQL expression over the input
  * row producing `ARRAY<STRUCT<key, value>>` (one record → zero-or-more
  * kv pairs, exactly `mapfunc`); the engine explodes it and hash-groups
  * by `key`. The reducer is a SQL aggregate expression over column
  * `value` (e.g. `sum(value)`, `count(distinct value)`); omitted → a
  * map-only job emitting the raw kv pairs. Both expressions see the
  * engine's native functions (qdot, minhash_sig, shingle_hashes, …) —
  * they are registered by `GraftExtensions` on every session.
  *
  * `--m` sets the map-shard count for the input size (the reference's M,
  * via maxPartitionBytes); `--r` the number of reducers = output files.
  * With `--key`/`--value` the result is written in the reference's
  * `key:value` `out_<j>` contract (KvText); otherwise parquet.
  */
object Main {

  private def parseArgs(args: Array[String]): Map[String, String] = {
    require(args.length % 2 == 0, s"expected --flag value pairs, got: ${args.mkString(" ")}")
    args.sliding(2, 2).map {
      case Array(k, v) if k.startsWith("--") && !v.startsWith("--") => k.drop(2) -> v
      case Array(k, v) => sys.error(s"bad argument pair: $k $v")
    }.toMap
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val hadSession = org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession).isDefined
    val input = opts.getOrElse("input", sys.error("--input required"))
    val output = opts.getOrElse("output", sys.error("--output required"))
    val format = opts.getOrElse("format", "text")
    val query = opts.getOrElse("query", "wordcount")
    val r = opts.getOrElse("r", "5").toInt

    val spark = GraftSession.local(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      shufflePartitions = r)

    val df = format match {
      case "text" => Tables.text(spark, input)
      case "parquet" =>
        val table = opts.getOrElse("table", "documents")
        Tables(spark, input, table)
      case other => sys.error(s"unknown --format $other")
    }
    opts.get("m").foreach { m =>
      val bytes = df.inputFiles.map(f => new java.io.File(new java.net.URI(f)).length()).sum
      GraftSession.withMapShards(spark, bytes, m.toInt)
    }
    val textCol = col(opts.getOrElse("col", if (format == "text") "value" else "text"))

    // prePartitioned: the result already carries hash(key) % r
    // partitioning from its own (single) reduce exchange — don't pay a
    // second one in the sink
    def sink(result: org.apache.spark.sql.DataFrame, prePartitioned: Boolean = false): Unit =
      opts.get("key") match {
        case Some(k) =>
          val v = opts.getOrElse("value", sys.error("--value required with --key"))
          KvText.write(result, k, v, output, r, prePartitioned)
        case None =>
          if (prePartitioned) result.write.mode("overwrite").parquet(output)
          else result.repartition(r).write.mode("overwrite").parquet(output)
      }

    query match {
      case "wordcount" =>
        KvText.write(TextOps.wordCount(df, textCol), "word", "cnt", output, r)
      case "sql" =>
        val sqlText = opts.getOrElse("sql", sys.error("--sql required with --query sql"))
        Tables.registerAll(spark, input)
        // native functions come from spark.sql.extensions (GraftSession)
        sink(spark.sql(sqlText))
      case "custom" =>
        val mc = opts.getOrElse("mapper-class",
          sys.error("--mapper-class required with --query custom"))
        val rc = opts.getOrElse("reducer-class",
          sys.error("--reducer-class required with --query custom"))
        import spark.implicits._
        val lines = df.select(textCol.cast("string")).na.drop().as[String]
        sink(graft.api.CustomJob.run(lines,
          graft.api.CustomJob.instantiate[graft.api.TextMapper](mc),
          graft.api.CustomJob.instantiate[graft.api.TextReducer](rc), r),
          prePartitioned = true)
      case "py" =>
        val mp = opts.getOrElse("mapper-py",
          sys.error("--mapper-py required with --query py"))
        import spark.implicits._
        val lines = df.select(textCol.cast("string")).na.drop().as[String]
        // --m on the py path pins the mapfunc invocation count exactly
        // (the split-size heuristic above can't subdivide one small
        // file); elsewhere --m only steers source split planning
        val result = graft.api.PyJob.run(lines, mp, opts.get("reducer-py"), r,
          m = opts.get("m").map(_.toInt).getOrElse(0))
        // the reduce form arrives hash(key)%r partitioned (PyJob's own
        // exchange); map-only output has no reduce partitioning yet
        sink(result, prePartitioned = opts.contains("reducer-py"))
      case "expr" =>
        import org.apache.spark.sql.functions.{explode, expr}
        val me = opts.getOrElse("mapper-expr",
          sys.error("--mapper-expr required with --query expr"))
        // explode is map-side; the groupBy hash-partitions by key (the
        // reference's hash(key) % R, `w7/src/worker/workerimpl.cc:254`).
        // The sink's own repartition(r, key) then pins the out_<j> file
        // contract — AQE may coalesce the groupBy exchange, so the
        // aggregate's partitioning can't be trusted as the R layout; the
        // re-shuffled relation is the already-reduced (small) one.
        val kv = df
          .select(explode(expr(me)).as("kv"))
          .select(col("kv.key").as("key"), col("kv.value").as("value"))
        opts.get("reducer-expr") match {
          case Some(re) => sink(kv.groupBy("key").agg(expr(re).as("value")))
          case None => sink(kv) // map-only job
        }
      case name if SparkEntry.queries.contains(name) =>
        sink(SparkEntry.queries(name)(spark, input))
      case other => sys.error(s"unknown --query $other")
    }
    println(s"graft: wrote $output")
    if (!hadSession) spark.stop()
  }
}
