package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Each query is fully
  * materialized through the noop sink (a bare count() would let the
  * optimizer prune projections/sorts and under-measure).
  *
  * Noise defense: every query runs `SPARK_GRAFT_BENCH_PASSES` (default
  * 3) times in INTERLEAVED full passes and the reported number is the
  * per-query MEDIAN (per-query minima are emitted alongside). A
  * single-shot bench once recorded a 2.3×-wrong total because transient
  * machine load inflated the alphabetically-early queries; a median of
  * interleaved passes can't be corrupted by load that comes and goes. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val passes = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: touch every table once so the first measured query
    // doesn't absorb JVM/codegen/parquet-footer cold-start (profiled at
    // ~5 s — it made whichever query sorted first look 5× slower)
    io.Tables.all.foreach(t => io.Tables(spark, sfDir, t).count())
    val names = SparkEntry.queries.keys.toSeq.sorted
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    val failed = scala.collection.mutable.LinkedHashSet.empty[String]
    for (_ <- 1 to passes; name <- names) {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          failed += name
      }
      times(name) = ((System.nanoTime() - t0) / 1e9) :: times.getOrElse(name, Nil)
      // caches opened while building a query must not leak into the
      // next measurement (or accumulate over passes × 67 queries)
      spark.catalog.clearCache()
    }
    def median(xs: List[Double]): Double = {
      val s = xs.sorted
      s(s.length / 2)
    }
    val med = names.map(n => n -> median(times(n)))
    val qs = med.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val mins = names.map(n => "\"" + n + "\":" + times(n).min).mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = med.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"min":$mins,"passes":$passes,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
