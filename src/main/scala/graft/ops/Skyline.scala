package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) — the data-selection primitive behind
  * budget curves: "which documents are not strictly beaten on BOTH
  * quality and length?" gives the undominated set a curation policy
  * sweeps when trading quality against volume. The reference has no
  * such operator; this is pure composition of built-ins.
  */
object Skyline {

  /** Rows of `df` not dominated on (`xCol`, `yCol`), both maximized.
    * A row p is dominated iff some row q has q.x ≥ p.x ∧ q.y ≥ p.y
    * with at least one strict; rows tied on BOTH axes are mutually
    * undominated and all kept.
    *
    * Scale shape: the classic sort-based skyline would shuffle the
    * whole relation into one global sort. Instead the data pays ONE
    * map-side-combined aggregation to (x, max y) — at most one row per
    * distinct x value, which the CALLER bounds by quantizing x (the
    * `qualityGate` distinct-score-histogram precedent: a micro-quantized
    * score has ≤ 10⁶+1 levels at any corpus size). The frontier falls
    * out of a running strict-max window over that bounded relation
    * (level x survives iff its max y strictly exceeds every
    * higher-x level's max — strictness encodes the dominance
    * tie-break), and survivors join back as a broadcast: the full
    * relation is scanned twice and never shuffled on data keys. */
  def frontierMax(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val perX = df.groupBy(xCol).agg(max(col(yCol)).as("__maxy"))
    // bounded relation (one row per distinct x) — the unpartitioned
    // window is safe by the quantized-x contract above
    val wHi = Window.orderBy(desc(xCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val levels = perX
      .withColumn("__hi", max(col("__maxy")).over(wHi))
      .where(col("__hi").isNull || col("__maxy") > col("__hi"))
      .select(col(xCol).as("__lx"), col("__maxy"))
    // a doc survives iff its level survives AND it sits at the level's
    // max y (a same-x row with larger y dominates it)
    df.join(broadcast(levels),
        col(xCol) === col("__lx") && col(yCol) === col("__maxy"))
      .drop("__lx", "__maxy")
  }
}
