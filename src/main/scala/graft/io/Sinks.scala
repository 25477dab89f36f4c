package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sources and sinks beyond parquet/KV-text: CSV and JSON line formats,
  * with the reference's "R output files" contract available on every
  * format (repartition to R, deterministic `out_<j>` names —
  * `w7/src/worker/workerimpl.cc:319-323`).
  */
object Sinks {

  /** Write with exactly R hash-partitioned output files named out_<j>. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      r: Int,
      keyCol: String,
      format: String = "parquet"): Unit = {
    val spark = df.sparkSession
    df.repartition(r, org.apache.spark.sql.functions.col(keyCol))
      .write.mode("overwrite").format(format).save(path)
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(dir).map(_.getPath).filter(_.getName.startsWith("part-")).foreach { p =>
      val j = p.getName.stripPrefix("part-").takeWhile(_.isDigit).toInt
      val ext = p.getName.dropWhile(_ != '.')
      fs.rename(p, new Path(dir, s"out_$j$ext"))
    }
  }

  /** Persist a table bucketed (and sorted) by join/aggregation keys —
    * the layout a 100 TB deployment pre-materializes so repeated joins
    * and aggregations on those keys read co-located buckets and plan
    * ZERO shuffle exchanges (Spark reports the bucket spec as the
    * scan's output partitioning). `bucketBy` requires the session
    * catalog, so this writes a managed table under the warehouse dir
    * rather than a bare path; `BucketedJoinSpec` proves the
    * exchange-free plan. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      buckets: Int,
      keyCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .saveAsTable(table)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonLines(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)
}
