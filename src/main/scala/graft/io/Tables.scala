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
    * TIMESTAMP(NANOS), which Spark 4 refuses to read as a timestamp
    * unless `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    * `GraftSession.local` at construction — never mutated here: the
    * conf is consulted again at execution time when footers are
    * re-read per file, so a scoped set-then-restore would break the
    * action, and an unscoped set races in a shared session). When the
    * flag is on, nanos arrive as Long and are truncated to
    * microseconds with integer division (`div`, not `/` — double
    * division would lose precision above 2^53). Newer generators
    * write plain TIMESTAMP(MICROS), which needs no fix-up under
    * either flag value. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      val raw =
        try spark.read.parquet(s"$dir/$name.parquet")
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if e.getMessage != null && e.getMessage.toLowerCase.contains("nanos") =>
            throw new IllegalStateException(
              "events.parquet uses TIMESTAMP(NANOS); set " +
                "spark.sql.legacy.parquet.nanosAsLong=true at session " +
                "construction (GraftSession.local does) so Tables can " +
                "truncate it to microseconds", e)
        }
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
