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
        // catalog-served attributes print fully qualified
        // (spark_catalog.default.graft_lineitem.l_suppkey) — strip the
        // prefix so a naming-only delta doesn't read as a plan change
        .replaceAll("spark_catalog\\.default\\.graft_\\w+\\.", "")
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

    case "dupngrams" =>
      // attribution probe for the text_dup_ngrams scale tail (verdict
      // ask #2): census the gram relation at factor f (instance count
      // vs distinct (doc, gram) vs distinct grams, heaviest groups)
      // and time the kernel in-session. Round-11 findings at 64×/128×:
      // instances == docGram (no in-document duplicates), max group
      // size 4 (the cipher generator creates NO cross-copy gram
      // collisions beyond the base corpus's own ≤4-way duplicates),
      // kernel 13.8 s → 32.4 s (2.35× for 2× data — linear). The
      // committed union-protocol rows (27.6 s / 143.9 s) carry f-leg
      // planning/codegen on top — see BenchScale's materialized-input
      // protocol.
      val f = args.drop(1).headOption.map(_.toInt).getOrElse(64)
      val spark = GraftSession.local(32, 32, "audit-dupngrams")
      val docs = BenchScale.inflateDocs(
        io.Tables(spark, "/root/testdata/sf0.1", "documents"), f)
      def time[T](label: String)(body: => T): T = {
        val t0 = System.nanoTime()
        val r = body
        println(f"[audit] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      import org.apache.spark.sql.functions._
      val grams = docs
        .select(col("doc_id"), ops.TextOps.tokens(col("text")).as("tk"))
        .select(col("doc_id"),
          explode(ops.TextOps.wordNgramsFromTokens(col("tk"), 8)).as("g"))
        .select(col("doc_id"),
          conv(substring(md5(col("g").cast("binary")), 1, 15), 16, 10)
            .cast("long").as("h"))
      val stats = time("instance/distinct/groups census")(
        grams.agg(
          count(lit(1)).as("instances"),
          count_distinct(struct(col("doc_id"), col("h"))).as("doc_gram"),
          count_distinct(col("h")).as("grams")).collect()(0))
      println(s"[audit] f=$f instances=${stats.getLong(0)} " +
        s"docGram=${stats.getLong(1)} grams=${stats.getLong(2)}")
      val top = time("heaviest gram groups")(
        grams.groupBy("h").agg(count(lit(1)).as("n")).orderBy(desc("n"))
          .limit(5).collect().map(_.getLong(1)).toSeq)
      println(s"[audit] top group sizes: $top")
      time("dupNgramStats in-session")(
        ext.TextAnalysis.dupNgramStats(docs, "doc_id", "text")
          .write.format("noop").mode("overwrite").save())
      spark.stop()

    case "neardup" =>
      // attribution for the dedup_neardup/pairs_by_source top-octave
      // step (materialized-input rows 34.0 s at 64× → 134.6 s at
      // 128×): the count-derived LSH geometry crosses an octave at
      // 320k→640k rows (r 3→4, bands 96→160 — 2.2× minhash work per
      // doc, 1.67× band rows), the DESIGNED constant-recall schedule.
      // A/B: the same 128× corpus under the derived schedule vs the
      // 64× geometry pinned — if the step is the schedule, the pinned
      // run lands at ~2× the 64× cost (linear), with the recall trade
      // visible in the pair count.
      val f = args.drop(1).headOption.map(_.toInt).getOrElse(128)
      val spark = GraftSession.local(32, 32, "audit-neardup")
      val docs0 = io.Tables(spark, "/root/testdata/sf0.1", "documents")
      val dir = java.nio.file.Files.createTempDirectory("nd_mat").toString
      BenchScale.inflateDocs(docs0, f).write.parquet(s"$dir/docs")
      val docsM = spark.read.parquet(s"$dir/docs")
      ext.Dedup.nearDupPairs(docs0, "doc_id", "text").count() // untimed codegen warmup
      spark.catalog.clearCache()
      for ((label, np, nb) <- Seq(
          ("count-derived schedule (r=4,b=160)", 0, 0),
          ("pinned 64x geometry (r=3,b=96)", 288, 96))) {
        val t0 = System.nanoTime()
        val n = ext.Dedup.nearDupPairs(docsM, "doc_id", "text",
          numPerms = np, bands = nb).count()
        println(f"[audit] neardup f=$f $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, pairs=$n")
        spark.catalog.clearCache()
      }
      spark.stop()

    case other => sys.error(s"unknown audit: $other (want cbo|ivfpq|dupngrams|neardup)")
  }
}
