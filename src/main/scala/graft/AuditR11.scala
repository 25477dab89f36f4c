package graft

import org.apache.spark.sql.SparkSession

/** Round-11 audits.
  *
  * `cbo` — A/B the suite's relational/join queries with the engine's
  * ANALYZE stats feeding Catalyst (`SPARK_GRAFT_CBO`) vs stats-blind:
  * prints the Join/Exchange plan signature of every query whose plan
  * CHANGED under CBO (verdict ask #4's "note on any query whose plan
  * changed"). AQE disabled so the census is the static planner's.
  *
  * `ivfpq` — isolated matched-conditions run of `ann_ivfpq_res_topk`
  * (fresh JVM's first and only query family): its committed quiet
  * median crept 5.05 → 7.22 s over rounds 7–10 with an unchanged
  * plan; if the isolated cost still sits near the r7/r8 level the
  * creep is suite-growth squeezing the shared session's page cache /
  * JIT budget, not a real plan regression (verdict ask #5). */
object AuditR11 {

  private def planSig(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString
      .split("\n")
      .filter(l => l.contains("Join") || l.contains("Exchange"))
      .map(_.replaceAll("#\\d+", "#").replaceAll("plan_id=\\d+", "")
        .replaceAll("^[\\s:+-]*", ""))
      .mkString("\n")

  private def newSession(cpus: Int): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = args.headOption.getOrElse("cbo") match {
    case "cbo" =>
      val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
      val names = SparkEntry.queries.keys.toSeq.sorted.filter(n =>
        n.matches("q\\d+.*") || n.startsWith("mr_") ||
          Set("q1_agg", "bloom_join", "skew_salted_join", "skew_salted_agg",
            "stats_join_estimate", "join_fuzzy_blocked")(n))
      def plans(cbo: Boolean): Map[String, String] = {
        if (cbo) System.setProperty("graft.cbo", "1")
        else System.clearProperty("graft.cbo")
        val spark = newSession(8)
        val r = names.map { n =>
          n -> (try planSig(SparkEntry.queries(n)(spark, dir))
          catch { case e: Throwable => s"ERR ${e.getMessage}" })
        }.toMap
        spark.stop()
        r
      }
      val off = plans(false)
      val on = plans(true)
      System.clearProperty("graft.cbo")
      var changed = 0
      for (n <- names if off(n) != on(n)) {
        changed += 1
        println(s"=== $n: plan changed under CBO ===")
        println(s"--- stats-blind ---\n${off(n)}")
        println(s"--- stats-fed ---\n${on(n)}")
      }
      println(s"[audit] cbo: ${names.size} queries compared, $changed changed")

    case "ivfpq" =>
      val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.1")
      val spark = newSession(32)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      io.Tables.all.foreach(t => io.Tables(spark, dir, t).count())
      val fn = SparkEntry.queries("ann_ivfpq_res_topk")
      for (i <- 0 to 3) {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[audit] ivfpq isolated pass $i (${if (i == 0) "warm" else "timed"}): $dt%.2f s")
        spark.catalog.clearCache()
      }
      spark.stop()

    case other => sys.error(s"unknown audit: $other (want cbo|ivfpq)")
  }
}
