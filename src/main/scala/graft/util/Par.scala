package graft.util

import org.apache.spark.sql.DataFrame

/** Scale-adaptive scan parallelism (optimization guide §2.5, "input
  * skew: one huge unsplittable file … repartition immediately after the
  * read").
  *
  * The gate fixtures are single-file, single-row-group parquet, so every
  * scan plans ONE input partition and every CPU-heavy per-row kernel
  * above it (tokenize, shingle, MinHash, n-gram, payload hash) runs
  * serially on one core — profiled at 4.9 s for a single 4.85 s task on
  * `search_phrase` while 31 cores idled. Parquet row-group alignment
  * makes `maxPartitionBytes`/`openCostInBytes` useless here (extra byte
  * ranges of a one-row-group file produce empty tasks), so the only
  * lever is an explicit round-robin repartition after the read.
  *
  * `widen` is the identity whenever the scan already carries at least
  * half the session's default parallelism — which any real (≥ cores ×
  * row groups) corpus does — so cluster plans are untouched: the knob
  * adapts to the INPUT's planned split count, not to local[32]. Callers
  * are the CPU-bound kernels whose per-row work dwarfs one extra
  * exchange of their (projected) input; results are unchanged because
  * every downstream operator in this engine is partition-count
  * independent by contract (the reference's R-knob invariant).
  */
object Par {
  // kill-switch (SPARK_GRAFT_WIDEN=0): restores the unwidened plans for
  // A/B attribution runs and for deployments whose inputs are always
  // well-split
  private lazy val enabled: Boolean =
    !sys.props.get("graft.widen").orElse(sys.env.get("SPARK_GRAFT_WIDEN"))
      .exists(v => Set("0", "false", "off", "no")(v.trim.toLowerCase))

  def widen(df: DataFrame): DataFrame = {
    if (!enabled || df.isStreaming) return df // no .rdd probe on a stream
    val target = df.sparkSession.sparkContext.defaultParallelism
    // .rdd only PLANS the frame (no job); scans report their file splits
    if (df.rdd.getNumPartitions * 2 >= target) df
    else df.repartition(target)
  }
}
