package graft

import org.apache.spark.sql.functions.col

import graft.io.{KvText, Tables}
import graft.ops.TextOps

/** CLI job submission — the engine's analogue of the reference client
  * (`w7/client.sh`: `-c container -m M -r R`, word count baked in).
  *
  * Usage:
  *   graft.Main --input <dir|file> [--format text|parquet] [--query wordcount]
  *              [--m M] [--r R] --output <dir> [--table documents --col text]
  *
  * `--m` sets the map-shard count for the input size (the reference's M,
  * via maxPartitionBytes); `--r` the number of reducers = output files.
  * Output is the reference's `key:value` `out_<j>` contract (KvText).
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

    query match {
      case "wordcount" =>
        KvText.write(TextOps.wordCount(df, textCol), "word", "cnt", output, r)
      case name if SparkEntry.queries.contains(name) =>
        SparkEntry.queries(name)(spark, input)
          .coalesce(1).write.mode("overwrite").parquet(output)
      case other => sys.error(s"unknown --query $other")
    }
    println(s"graft: wrote $output")
    if (!hadSession) spark.stop()
  }
}
