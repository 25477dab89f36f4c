package graft.util

import org.apache.spark.sql.DataFrame

/** Data-proportional shuffle-partition advice — the operational answer
  * to SURVEY §9's round-8 finding: every shuffle-heavy kernel in this
  * library is linear in data GIVEN reduce slots that track data
  * volume, and the only above-linear growth the scale probe ever
  * measured was a FIXED partition budget crossing the per-partition
  * spill threshold (jaccard 128×: 52.8 s at 32 partitions → 29.7 s at
  * 256; neardup 64×: 44.4 → 23.5 s; clusters: 78.1 → 30.4 s — all
  * A/B'd in fresh sessions). AQE coalesces an over-provisioned count
  * DOWN for free, but can never raise an under-provisioned cap — so
  * the advice errs upward and lets AQE trim.
  *
  * `advise` derives the count from Catalyst's own size estimate of the
  * input plan (file-size-based for parquet scans — the same statistic
  * a cluster-side operator would read), targeting the classic
  * ~128 MiB of pre-shuffle input per reduce slot, floored at the
  * session's current setting so advice never DE-provisions, and
  * capped sanely. `withAdvised` scopes the setting to one block and
  * restores the previous value — the library-safe form of the conf
  * mutation (the `nanosAsLong` lesson: never leave a shared session's
  * conf changed behind a call).
  */
object ShuffleBudget {

  /** ~128 MiB of estimated pre-shuffle bytes per reduce slot. */
  val targetPartitionBytes: Long = 128L << 20

  /** Hard cap: beyond this, per-task scheduling overhead dominates any
    * realistic single-job win (Spark's own default maxes AQE advice at
    * a few thousand). */
  val maxAdvised: Int = 65536

  def adviseBytes(bytes: Long, floor: Int): Int = {
    require(floor > 0, s"floor must be positive, got $floor")
    val want = math.ceil(bytes.toDouble / targetPartitionBytes).toLong
    math.min(math.max(want, floor.toLong), maxAdvised.toLong).toInt
  }

  /** Advised shuffle-partition count for a job whose dominant shuffle
    * input is `df` — floor defaults to the session's current setting.
    * `inflate` is the kernel's measured in-flight expansion: the ratio
    * of its widest shuffle's bytes to the compressed source estimate
    * (parquet → decoded rows, token/gram explode, candidate-pair
    * fanout). The kernels below pass their own documented factor; the
    * saturating multiply keeps a garbage upstream estimate pinned at
    * the `maxAdvised` cap instead of overflowing. */
  def advise(df: DataFrame, floor: Int = 0, inflate: Long = 1L): Int = {
    require(inflate >= 1L, s"inflate must be >= 1, got $inflate")
    val spark = df.sparkSession
    val f =
      if (floor > 0) floor
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val bytes =
      if (est.isValidLong && est.toLong <= Long.MaxValue / inflate)
        est.toLong * inflate
      else Long.MaxValue
    adviseBytes(bytes, f)
  }

  /** Run `body` with `spark.sql.shuffle.partitions` advised from `df`,
    * restoring the prior value afterwards (even on failure). The plans
    * EXECUTED inside the block capture the advised setting at their
    * physical planning; a long-lived shared session sees no residue.
    * NOTE for kernel authors: a DataFrame merely RETURNED from the
    * block re-plans at action time, after the conf is restored — a
    * kernel that wants its shuffles advised must run its actions (or
    * `localCheckpoint(true)` its result) inside the block, which is
    * exactly what the advised dedup/graph entry points do. */
  def withAdvised[T](df: DataFrame, inflate: Long = 1L)(body: => T): T =
    withPartitions(df.sparkSession, advise(df, inflate = inflate))(body)

  /** `withAdvised` for a kernel whose dominant shuffle size is known as
    * a row count × bytes-per-row instead of an input plan (e.g.
    * connectedComponents, whose edge relation is already materialized
    * and counted). */
  def withAdvisedBytes[T](
      spark: org.apache.spark.sql.SparkSession,
      bytes: Long)(body: => T): T = {
    val floor = spark.conf.get("spark.sql.shuffle.partitions", "200").toInt
    withPartitions(spark, adviseBytes(bytes, floor))(body)
  }

  private def withPartitions[T](
      spark: org.apache.spark.sql.SparkSession,
      n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key, "200")
    spark.conf.set(key, n.toString)
    try body finally spark.conf.set(key, prev)
  }
}
