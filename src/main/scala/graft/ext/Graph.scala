package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relation-shaped edge lists. The
  * reference's framework runs exactly this workload class as chained
  * MapReduce rounds (`w6/docs/design.md` motivates the framework with
  * iterative link-analysis jobs); here each round is one declarative
  * join+aggregate job, the same shape `Dedup.connectedComponents` uses
  * for its label propagation.
  *
  * In a training-data pipeline the graph is derived — kNN edges over
  * embeddings (`Similarity.knnGraphIvf`), near-dup edges from LSH —
  * and a centrality score over it is a curation signal: PageRank over
  * the similarity graph surfaces "hub" documents (highly reachable =
  * semantically central = likely boilerplate) exactly the way
  * repetition scores surface templated text.
  */
object Graph {

  /** Shipped constants, shared with the oracle generator: rank mass is
    * scaled to 10⁹ integer units, damping 0.85 as the classic x100
    * integer pair, 5 synchronous iterations. */
  val defaultIters: Int = 5
  val defaultScale: Long = 1000000000L
  val defaultDampX100: Long = 85L

  /** Integer PageRank: `r₀ = scale div n`, then
    * `r_{t+1}(v) = ((100-d)·scale) div (100·n) + (d·Σ_u r_t(u) div deg(u)) div 100`
    * over v's in-neighbors u — all int64 floor division, so any engine
    * replays the fixpoint trajectory bit-for-bit (the same reason the
    * BM25/LM scores are integer). Nodes with no out-edges simply leak
    * their mass (the standard simplified formulation); nodes with no
    * in-edges settle at the teleport floor.
    *
    * Scale shape: edges are projected to ids-only ONCE, joined with
    * their out-degree, and cached — per iteration the work is exactly
    * one shuffle keyed by `src` (rank join) and one keyed by `dst`
    * (contribution sum), both linear in |edges|; the rank relation
    * stays O(nodes) with a `localCheckpoint` per round so the plan
    * doesn't grow with the iteration count (the
    * `connectedComponents` lineage rule). The node count crosses the
    * driver once as a broadcast 1-row aggregate — no `collect`, no
    * driver-side graph. */
  def pageRank(
      edges0: DataFrame,
      srcCol: String,
      dstCol: String,
      nodes0: DataFrame,
      idCol: String,
      iters: Int = defaultIters,
      scale: Long = defaultScale,
      dampX100: Long = defaultDampX100,
      scope: graft.util.CacheScope = new graft.util.CacheScope): DataFrame = {
    require(iters >= 0 && dampX100 >= 0 && dampX100 <= 100 && scale > 0,
      s"need iters >= 0, 0 <= dampX100 <= 100, scale > 0; got $iters/$dampX100/$scale")
    val edges = scope.cache(
      edges0.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    // out-degree joined onto every edge once — the per-iteration join
    // then carries (src, dst, d) and never recomputes degrees
    val ed = scope.cache(edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("d")), "src"))
    val nodes = scope.cache(nodes0.select(col(idCol).as("id")))
    val nAgg = nodes.agg(count(lit(1)).as("nn"))
    val teleport = expr(s"((${100L - dampX100} * ${scale}L) div (100 * nn))")
    var ranks = nodes.crossJoin(broadcast(nAgg))
      .select(col("id"), expr(s"${scale}L div nn").as("r"))
      .localCheckpoint(false)
    for (_ <- 1 to iters) {
      val contrib = ed.join(ranks, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(sum(expr("r div d")).as("s"))
      ranks = nodes.crossJoin(broadcast(nAgg))
        .join(contrib, col("id") === col("dst"), "left")
        .select(col("id"),
          (teleport + expr(s"($dampX100 * coalesce(s, 0L)) div 100")).as("r"))
        .localCheckpoint(false)
    }
    ranks.select(col("id").as(idCol), col("r").as("pr"))
  }

  /** DuckDB replay of `pageRank` as a CTE chain: `edgesCte` must bind
    * relations `gedges(src, dst)` and `gnodes(id)`; the generator
    * unrolls the synchronous iterations as r0..r{iters} CTEs with the
    * identical integer arithmetic. */
  def pageRankOracleSql(
      edgesCte: String,
      idColOut: String,
      iters: Int = defaultIters,
      scale: Long = defaultScale,
      dampX100: Long = defaultDampX100): String = {
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (
         |  SELECT q.id,
         |         (${(100L - dampX100) * scale} // (100 * n.nn))
         |           + ($dampX100 * coalesce(c.s, 0)) // 100 AS r
         |  FROM gnodes q CROSS JOIN gn n
         |  LEFT JOIN (
         |    SELECT e.dst, sum(r${i - 1}.r // gdeg.d) AS s
         |    FROM gedges e
         |    JOIN r${i - 1} ON e.src = r${i - 1}.id
         |    JOIN gdeg ON gdeg.src = e.src
         |    GROUP BY e.dst) c ON c.dst = q.id)""".stripMargin
    }.mkString(",\n")
    s"""$edgesCte,
       |gdeg AS (SELECT src, count(*) AS d FROM gedges GROUP BY src),
       |gn AS (SELECT count(*) AS nn FROM gnodes),
       |r0 AS (SELECT id, $scale // nn AS r FROM gnodes, gn),
       |$rounds
       |SELECT id AS $idColOut, CAST(r AS BIGINT) AS pr FROM r$iters
       |ORDER BY $idColOut""".stripMargin
  }
}
