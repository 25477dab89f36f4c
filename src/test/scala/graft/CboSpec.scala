package graft

import org.apache.spark.sql.functions._

/** Round-10: the engine's own ANALYZE feeding Catalyst's cost-based
  * optimizer through the session catalog (`Sketches.analyzeToCatalog`).
  *
  * The engineered pair: a dim table whose PARQUET FILE SIZE exceeds the
  * broadcast threshold, queried through a 0.1%-selective range filter.
  * Without stats the planner can only price the filtered side at file
  * size (no row count, no selectivity) → SortMergeJoin. With the
  * engine's one-pass stats (row count + min/max + KMV ndv) installed,
  * CBO's FilterEstimation interpolates the range predicate to ~200
  * rows → the filtered side prices under the threshold → the SAME
  * query plans a BroadcastHashJoin. AQE could rescue the un-stats'd
  * plan at runtime after the first shuffle materializes; the stats
  * flip happens at compile time, before any shuffle is provisioned —
  * which is the difference that matters when the fact side is 100 TB.
  */
class CboSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("engine ANALYZE stats flip a filtered dim join to broadcast") {
    val table = "graft_cbo_dim"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // 200k rows with an incompressible 32-char payload → the parquet
    // file comfortably exceeds the 1 MiB threshold below
    spark.range(200000L)
      .select(col("id").as("k"), md5(col("id").cast("string").cast("binary")).as("payload"))
      .write.saveAsTable(table)
    try {
      val fact = spark.range(1000000L).select(col("id").as("k"))
      def joinPlan(): String = {
        val dim = spark.table(table).where(col("k") >= 199800L)
        // sparkPlan = the compile-time choice, before AQE runtime
        // re-planning (disabled below anyway)
        fact.join(dim, "k").queryExecution.sparkPlan.toString
      }
      withConfs(
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> (1024 * 1024).toString,
        "spark.sql.adaptive.enabled" -> "false") {
        val before = joinPlan()
        assert(before.contains("SortMergeJoin") && !before.contains("BroadcastHashJoin"),
          s"without stats the filtered dim must price at file size (SMJ), got:\n$before")
        val (n, sz) = ops.Sketches.analyzeToCatalog(spark, table, Seq("k"))
        assert(n == 200000L && sz > 0)
        val after = joinPlan()
        assert(after.contains("BroadcastHashJoin"),
          s"with engine stats CBO must price the 0.1% slice broadcastable, got:\n$after")
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("engine ANALYZE stats drive a cost-based join reorder") {
    // three catalog tables joined on k in a deliberately bad syntactic
    // order (big ⋈ mid first → 100k intermediate rows; big ⋈ small
    // first → ≤100). CostBasedJoinReorder only fires when EVERY
    // relation carries row-count stats — which is exactly what
    // analyzeToCatalog installs — so the leaf order flip below is
    // driven end-to-end by the engine's own numbers.
    val names = Seq("graft_cbo_big" -> 1000000L, "graft_cbo_mid" -> 100000L,
      "graft_cbo_small" -> 100L)
    names.foreach { case (t, _) => spark.sql(s"DROP TABLE IF EXISTS $t") }
    names.foreach { case (t, n) =>
      spark.range(n).select(col("id").as("k")).write.saveAsTable(t)
    }
    try {
      withConfs(
        "spark.sql.cbo.enabled" -> "true",
        "spark.sql.cbo.joinReorder.enabled" -> "true",
        "spark.sql.adaptive.enabled" -> "false") {
        def leafOrder(): Seq[String] = {
          val q = spark.table("graft_cbo_big")
            .join(spark.table("graft_cbo_mid"), "k")
            .join(spark.table("graft_cbo_small"), "k")
          q.queryExecution.optimizedPlan.collectLeaves().map(_.toString)
            .map(s => names.map(_._1).find(s.contains).getOrElse("?"))
        }
        val before = leafOrder()
        assert(before == Seq("graft_cbo_big", "graft_cbo_mid", "graft_cbo_small"),
          s"without stats the syntactic order must survive, got $before")
        names.foreach { case (t, _) =>
          ops.Sketches.analyzeToCatalog(spark, t, Seq("k"))
        }
        val after = leafOrder()
        assert(after != before && after.indexOf("graft_cbo_small") < 2,
          s"with engine stats CBO must pull the 100-row table forward, got $after")
      }
    } finally names.foreach { case (t, _) =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
    }
  }
}
