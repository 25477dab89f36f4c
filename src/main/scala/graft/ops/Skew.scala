package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot keys — the failure mode the reference never hits
  * (its demo corpus is uniform) but a 100 TB corpus always does: one
  * giant key (an empty-string fingerprint, a boilerplate document, a
  * celebrity user) lands every row on one reducer.
  *
  * `saltedAgg` is two-phase aggregation: rows are spread across
  * `saltBuckets` sub-keys, partially aggregated, then the (tiny)
  * partials are re-aggregated per real key. AQE's skew-join handling
  * covers joins; this covers single-key aggregation skew, and the same
  * shape applies to any commutative+associative aggregate — exactly the
  * contract the engine's reduce surface already requires
  * (MapReduceJob.reducer).
  */
object Skew {

  /** Salt column: deterministic spread derived from the whole row via a
    * monotonic id would break associativity tests; a hash of extra
    * columns (or spark_partition_id) keeps it deterministic per row. */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Two-phase salted sum/count aggregation: groupBy(key) over skewed
    * data without any single reducer seeing a whole hot key. */
  def saltedAgg(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      saltBuckets: Int = 64,
      saltSource: Seq[String] = Nil): DataFrame = {
    val saltCols =
      if (saltSource.nonEmpty) saltSource.map(col)
      else Seq(spark_partition_id().cast("int").as("__pid"))
    val partial = df
      .withColumn("__salt", salt(saltBuckets, saltCols: _*))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__n"))
    partial
      .groupBy(keyCol)
      .agg(sum(col("__s")).as(s"sum_$valueCol"), sum(col("__n")).as("n"))
  }

  /** Salted equi-join for a fact side skewed on the join key — the
    * structural twin of AQE's `OptimizeSkewedJoin` for the cases AQE
    * can't rewrite (it only splits oversized sort-merge-join partitions
    * AFTER a shuffle materializes them; a bucketed/pre-partitioned join,
    * a streaming join, or a join feeding a co-partitioned consumer
    * never gives it that seam).
    *
    * Shape: one count pre-pass over the fact keys finds keys with
    * ≥ `hotThreshold` rows (the hot set is ≤ rows/threshold — the same
    * bounded-metadata argument as `Dedup`'s hot-bucket salting, and it
    * stays a broadcast relation, never a driver collect). Cold keys take
    * the plain join. Hot fact rows are salted into `saltBuckets`
    * sub-keys; the OTHER side's hot sliver is replicated once per
    * bucket, so the join key becomes (key, salt) and no reducer holds a
    * whole hot key. The joined multiset is exactly the plain join's —
    * salt values never affect which rows pair, only where.
    *
    * 100 TB: replication cost is `saltBuckets × |hot sliver of right|`,
    * and the sliver is ≤ |hot keys| ≈ rows/threshold rows of the
    * (deduplicated-key) right side — the blow-up is confined to the
    * keys that were going to strangle a reducer anyway. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      saltBuckets: Int = 16,
      hotThreshold: Long = 1000L): DataFrame = {
    require(saltBuckets > 1 && hotThreshold > 1,
      s"need saltBuckets > 1 and hotThreshold > 1, got $saltBuckets/$hotThreshold")
    val hot = left.groupBy(keyCol).agg(count(lit(1)).as("__kn"))
      .where(col("__kn") >= hotThreshold)
      .select(keyCol)
    val cold = left.join(broadcast(hot), Seq(keyCol), "left_anti")
      .join(right, keyCol)
    // salt value is immaterial to the result (right is replicated for
    // every bucket), but its DISTRIBUTION is the whole point: a
    // partition-id-derived salt collapses to few values when the hot
    // rows arrive in fewer partitions than saltBuckets (small,
    // coalesced, or single-file input) — correct but silently
    // unmitigated. monotonically_increasing_id counts rows WITHIN each
    // partition, so pmod cycles through every bucket even when all hot
    // rows share one partition.
    val hotLeft = left.join(broadcast(hot), Seq(keyCol))
      .withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)).cast("int"))
    val hotRight = right.join(broadcast(hot), Seq(keyCol))
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
    cold.unionByName(
      hotLeft.join(hotRight.withColumnRenamed(keyCol, "__k"),
          col(keyCol) === col("__k") && hotLeft("__salt") === hotRight("__salt"))
        .drop("__salt", "__k"))
  }
}
