package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

/** Source layer: a "container" in the reference is a directory of blobs
  * (`w7/src/master/dbconn.h:107-113`); here a dataset is a directory of
  * parquet (or text) files. Spark's FileSourceScanExec does the blob
  * listing + byte-range sharding the reference hand-rolled
  * (`DBConnection::make_shards`, `w7/src/master/dbconn.h:66-104`).
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one named parquet table from a scale-factor directory.
    *
    * Some generator versions write `events.ts` as parquet
    * TIMESTAMP(NANOS), which Spark 4 refuses to read as a timestamp;
    * detect that case and read it as raw nanos, truncating to
    * microseconds with integer division (`div`, not `/` — double division
    * would lose precision above 2^53). Newer generators write a plain
    * TIMESTAMP(MICROS) that needs no fix-up. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Load a text "container": one row per line, column `value`.
    * Equivalent of the reference's blob-container input
    * (`w7/client.sh:162-168`); Spark's line reader replaces
    * `fix_word_boundary` (`w7/src/worker/worker.h:196-232`). */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Register every table as a temp view for spark.sql use. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
