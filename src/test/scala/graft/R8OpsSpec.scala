package graft

import org.apache.spark.sql.functions._

import graft.ext.{Similarity, TextAnalysis}
import graft.functions.CharStats

/** Round-8 operators: byte-histogram char stats (native vs HOF twin),
  * the per-source quality quantile gate, and the IVF-blocked kNN
  * graph (vs the brute-force graph truth). */
class R8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("CharStats native == HOF twin on the corpus; edge cases by hand") {
    val docs = io.Tables(spark, sf, "documents")
    val mismatches = docs
      .select(col("doc_id"),
        CharStats.collisionMicro(col("text")).as("native_ss"),
        TextAnalysis.charSumSqHof(col("text")).as("hof_ss"),
        length(col("text")).cast("long").as("n"))
      .where(col("n") > 0)
      .where(col("native_ss") =!= expr("(hof_ss * 1000000) div (n * n)"))
      .count()
    assert(mismatches == 0)

    val hand = Seq(
      ("", 0L, 0L),              // empty → 0 by contract, 0 distinct
      ("aaaa", 1000000L, 1L),    // single byte: Σp² = 1
      ("ab", 500000L, 2L),       // two counts of 1 over n=2: 2/4
      ("aab", 555555L, 2L))      // (4+1)·10⁶/9 truncated
      .toDF("s", "cm", "nd")
    val bad = hand.where(
      CharStats.collisionMicro(col("s")) =!= col("cm") ||
        CharStats.distinctBytes(col("s")) =!= col("nd")).count()
    assert(bad == 0)
  }

  test("qualityFilterBySource keeps the tie-closed top fraction per source") {
    val docs = io.Tables(spark, sf, "documents")
    val kept = TextAnalysis.qualityFilterBySource(docs, "doc_id", "text", "source", 300)
    val scored = TextAnalysis.qualityMicroScores(docs, "doc_id", "text", "source")
      .select(col("source"), col("q_micro"), col("doc_id")).as[(String, Long, Long)]
      .collect().groupBy(_._1)
    val got = kept.select(col("source"), col("doc_id")).as[(String, Long)]
      .collect().groupBy(_._1).map { case (s, v) => (s, v.map(_._2).toSet) }
    for ((src, rows) <- scored) {
      val n = rows.length
      // expected: walk distinct scores high→low, include a whole score
      // group while strictly-higher count < ceil-free n·300/1000 rule
      val byScore = rows.groupBy(_._2).toSeq.sortBy(-_._1)
      var higher = 0L
      val expect = scala.collection.mutable.Set.empty[Long]
      for ((_, grp) <- byScore) {
        if (higher * 1000 < n.toLong * 300) expect ++= grp.map(_._3)
        higher += grp.length
      }
      assert(got.getOrElse(src, Set.empty) == expect.toSet, s"source $src")
      // the gate never keeps less than the target fraction
      assert(expect.size.toLong * 1000 >= n.toLong * 300 - 1000, s"source $src undershoot")
    }
  }

  test("ShuffleBudget: grows with input, floors at session setting, restores conf") {
    import graft.util.ShuffleBudget
    assert(ShuffleBudget.adviseBytes(0L, 32) == 32)
    assert(ShuffleBudget.adviseBytes(128L << 20, 32) == 32)
    assert(ShuffleBudget.adviseBytes(100L << 30, 32) == 800)   // 100 GiB / 128 MiB
    assert(ShuffleBudget.adviseBytes(Long.MaxValue, 32) == ShuffleBudget.maxAdvised)
    val docs = io.Tables(spark, sf, "documents")
    val cur = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(ShuffleBudget.advise(docs) >= cur)
    val big = BenchScale.inflateDocs(docs, 64)
    assert(ShuffleBudget.advise(big) >= ShuffleBudget.advise(docs))
    val key = "spark.sql.shuffle.partitions"
    val before = spark.conf.get(key)
    ShuffleBudget.withAdvised(big) {
      assert(spark.conf.get(key).toInt >= before.toInt)
    }
    assert(spark.conf.get(key) == before)
  }

  test("knnGraphIvf: every emitted neighbor list is exact within its probed lists") {
    val emb = io.Tables(spark, sf, "embeddings")
    val k = 5
    val graph = Similarity.knnGraphIvf(emb, "vec_id", "embedding", k = k)
    val rows = graph.select("probe_id", "vec_id", "qdot", "rn")
      .as[(Long, Long, Long, Long)].collect()
    // structural: every probe appears, ranks are 1..≤k, id-broken desc qdot
    val byProbe = rows.groupBy(_._1)
    assert(byProbe.size == emb.count())
    for ((_, g) <- byProbe) {
      val sorted = g.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1L to sorted.length).toSeq)
      val pairs = sorted.map(r => (r._3, r._2))
      assert(pairs.sameElements(pairs.sortBy(p => (-p._1, p._2))))
    }
    // recall floor vs the brute graph: the IVF graph trades recall for
    // the n² → Σm² cost drop; on sf0.001 the isotropic worst case must
    // still recover a sane fraction of true edges (and every edge it
    // does emit must BE a true scored pair — spot-check qdot values)
    val probes = emb.select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
    val brute = Similarity
      .bruteForceTopK(emb, probes, "vec_id", "embedding", "probe_id", "pe", k)
      .select("probe_id", "vec_id").as[(Long, Long)].collect().toSet
    val gotEdges = rows.map(r => (r._1, r._2)).toSet
    val recall = gotEdges.intersect(brute).size.toDouble / brute.size
    assert(recall > 0.2, s"recall $recall")
    val truth = emb.select(col("vec_id").as("probe_id"), col("embedding").as("pe"))
      .crossJoin(emb.select(col("vec_id"), col("embedding")))
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id"),
        Similarity.quantizedDot(col("pe"), col("embedding")).as("qdot"))
      .as[(Long, Long, Long)].collect().map(r => ((r._1, r._2), r._3)).toMap
    for (r <- rows.take(50)) assert(truth((r._1, r._2)) == r._3)
  }

  test("pageRank: hand-replayed integer fixpoint on tiny graphs; corpus mass sane") {
    // 3-cycle, out-degree 1 everywhere: uniform rank is a fixpoint of
    // the integer recurrence too (teleport 15e9/300 = 50M,
    // 85*333333333/100 = 283333333, sum = 333333333 exactly)
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val nodes3 = Seq(1L, 2L, 3L).toDF("id")
    val got = ext.Graph.pageRank(cyc, "src", "dst", nodes3, "id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 333333333L, 2L -> 333333333L, 3L -> 333333333L))

    // asymmetric graph: replay the same integer recurrence in plain
    // Scala and require bit-for-bit agreement after 5 rounds
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L), (4L, 1L))
    val ids = Seq(1L, 2L, 3L, 4L)
    val deg = edges.groupBy(_._1).map { case (s, es) => (s, es.size.toLong) }
    var r = ids.map(i => i -> 1000000000L / ids.size).toMap
    for (_ <- 1 to 5) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        (d, es.map(e => r(e._1) / deg(e._1)).sum)
      }
      r = ids.map(i => i ->
        (15000000000L / (100L * ids.size) + 85L * in.getOrElse(i, 0L) / 100L)).toMap
    }
    val got2 = ext.Graph
      .pageRank(edges.toDF("src", "dst"), "src", "dst", ids.toDF("id"), "id")
      .as[(Long, Long)].collect().toMap
    assert(got2 == r, s"engine $got2 vs replay $r")
    // node 4 has no in-edges → exactly the teleport floor; node 1 is
    // the hub and must dominate
    assert(got2(4L) == 37500000L && got2(1L) > got2(2L) && got2(2L) > got2(4L))

    // corpus-derived kNN graph: ranks positive, total mass ≤ scale
    // (integer floors + out-edge leakage only ever LOSE mass), and the
    // spread is real (a hub exists in any finite kNN graph)
    val emb = io.Tables(spark, sf, "embeddings")
    val knn = Similarity.knnGraphIvf(emb, "vec_id", "embedding", k = 3)
    val pr = ext.Graph.pageRank(knn, "probe_id", "vec_id", emb, "vec_id")
      .as[(Long, Long)].collect()
    assert(pr.length == emb.count() && pr.forall(_._2 > 0))
    assert(pr.map(_._2).sum <= 1000000000L)
    assert(pr.map(_._2).max > pr.map(_._2).min)
  }

  test("saltedJoin == plain join on a skewed key; hot path actually engaged") {
    // one celebrity key with 2000 rows, 50 cold keys with ≤ 5 — the
    // shape AQE can't always fix (pre-shuffle seam) and the salted
    // rewrite must leave bit-identical
    val fact = ((1 to 2000).map(i => (999L, s"e${i % 7}")) ++
      (1 to 250).map(i => (i.toLong % 50, s"e${i % 7}"))).toDF("k", "tag")
    val dim = (0L to 999L).map(k => (k, k * 10)).toDF("k", "v")
    val plain = fact.join(dim, "k")
      .groupBy("k", "tag").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("k", "tag").collect()
    val salted = graft.ops.Skew
      .saltedJoin(fact, dim, "k", saltBuckets = 4, hotThreshold = 100L)
      .groupBy("k", "tag").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("k", "tag").collect()
    assert(salted.toSeq == plain.toSeq)
    // the hot set really caught the celebrity (and only it): a
    // threshold above the max count must route everything cold and
    // still agree
    val allCold = graft.ops.Skew
      .saltedJoin(fact, dim, "k", saltBuckets = 4, hotThreshold = 100000L)
      .groupBy("k", "tag").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy("k", "tag").collect()
    assert(allCold.toSeq == plain.toSeq)
  }

  test("mergeSnapshot: upsert/delete/insert semantics; base probes a broadcast") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val ch = Seq((2L, "B", false), (3L, "x", true), (9L, "Z", false))
      .toDF("k", "v", "__deleted")
    val m = io.Sinks.mergeSnapshot(base, ch, "k", "__deleted")
    assert(m.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "B"), (9L, "Z")))
    // the big (base) side must not shuffle: anti join against the
    // broadcast change keys, no sort-merge anywhere (AQE final plan,
    // read after the action)
    val plan = m.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    // a tombstone for an absent key is a no-op, not an error
    val onlyDel = io.Sinks.mergeSnapshot(base,
      Seq((42L, "", true)).toDF("k", "v", "__deleted"), "k", "__deleted")
    assert(onlyDel.orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("analyzeColumns: exact stats when small, null sentinel contract, estimate sanity") {
    // below-k column with nulls: min/max ignore nulls, n_nulls exact,
    // ndv exact and EXCLUDING nulls (the sentinel rule)
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 10L), (2L, 10L), (3L, null), (4L, 20L), (5L, null))
      .toDF("a", "b")
    val got = graft.ops.Sketches.analyzeColumns(df, Seq("a", "b"))
      .orderBy("col_name")
      .as[(String, java.lang.Long, java.lang.Long, Long, Long)].collect()
    assert(got(0) == ("a", 1L, 5L, 0L, 5L))
    assert(got(1) == ("b", 10L, 20L, 2L, 2L))
    // all-null column: stats are (null, null, n, 0)
    val alln = graft.ops.Sketches.analyzeColumns(
      Seq[java.lang.Long](null, null).toDF("c"), Seq("c"))
      .as[(String, java.lang.Long, java.lang.Long, Long, Long)].collect()
    assert(alln.head == ("c", null, null, 2L, 0L))
    // above-k column: the estimate must land within the KMV error
    // envelope of the exact count (k=256 → σ ≈ 1/√254 ≈ 6.3%)
    val big = (1L to 5000L).toDF("v")
    val est = graft.ops.Sketches.analyzeColumns(big, Seq("v"))
      .select("ndv_est").as[Long].head()
    assert(math.abs(est - 5000L) < 1000L, s"est $est")
  }

  test("gapFillCounts: dense grid, zero fills, mass conservation") {
    val ev = io.Tables(spark, sf, "events")
    val filled = graft.ops.TimeSeries.gapFillCounts(ev, "ts", "event_type")
    val rows = filled.select(col("bucket_ts").cast("string"), col("event_type"), col("n"))
      .as[(String, String, Long)].collect()
    val nHours = rows.map(_._1).distinct.length
    val nTypes = rows.map(_._2).distinct.length
    // the grid is exactly dense and counts every event exactly once
    assert(rows.length == nHours * nTypes)
    assert(rows.map(_._3).sum == ev.count())
    // the sparse rollup has holes on this fixture and every hole is an
    // explicit zero row here
    val sparse = ev.groupBy(date_trunc("hour", col("ts")), col("event_type")).count()
    assert(sparse.count() < rows.length)
    assert(rows.count(_._3 == 0L) == rows.length - sparse.count())
  }

  test("funnelStages: strictly-ordered gating; retention offsets by hand") {
    import java.sql.Timestamp
    def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)
    // u1 completes in order; u2's click PRECEDES their first view (must
    // not count — and without a counted click, a later purchase can't
    // either); u3 views only; u4 has click-after-view then purchase
    // BEFORE the click (purchase must not count)
    val ev = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(1)), (1L, "purchase", ts(2)),
      (2L, "click", ts(0)), (2L, "view", ts(1)), (2L, "purchase", ts(2)),
      (3L, "view", ts(0)),
      (4L, "view", ts(0)), (4L, "purchase", ts(1)), (4L, "click", ts(2)))
      .toDF("user_id", "event_type", "ts")
    val got = graft.ops.TimeSeries
      .funnelStages(ev, "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
      .orderBy("stage").as[(String, Long)].collect().toSeq
    assert(got == Seq(("1_view", 4L), ("2_click", 2L), ("3_purchase", 1L)))

    // retention: one event on day 0 and one on day 2 → offsets 0 and 2
    val ev2 = Seq((7L, ts(0)), (7L, ts(2 * 24 * 60))).toDF("user_id", "ts")
    val ret = graft.ops.TimeSeries.retentionCohorts(ev2, "user_id", "ts")
      .select("day_offset", "n_users").as[(Long, Long)].collect().toSet
    assert(ret == Set((0L, 1L), (2L, 1L)))
  }

  test("diversitySample: per-list bound, contiguous ranks, deterministic") {
    val emb = io.Tables(spark, sf, "embeddings")
    val got = Similarity.diversitySample(emb, "vec_id", "embedding", perList = 2)
      .select("list_id", "vec_id", "rn").as[(Long, Long, Long)].collect()
    // the oracle proves the SELECTION exact (rank-level hash match);
    // here: the per-list contract and run-to-run determinism
    val byList = got.groupBy(_._1)
    assert(byList.nonEmpty && byList.forall(_._2.length <= 2))
    for ((_, rows) <- byList)
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    val again = Similarity.diversitySample(emb, "vec_id", "embedding", perList = 2)
      .select("list_id", "vec_id", "rn").as[(Long, Long, Long)].collect()
    assert(got.sortBy(r => (r._1, r._3)).toSeq == again.sortBy(r => (r._1, r._3)).toSeq)
  }

  test("hybridRrfTopK: fusion arithmetic, leg consistency, both-legs dominance") {
    val docs = io.Tables(spark, sf, "documents")
    val emb = io.Tables(spark, sf, "embeddings")
    val k = ext.Search.defaultK
    val rows = ext.Search.hybridRrfTopK(docs, "doc_id", "text", emb, "vec_id", "embedding")
      .select("doc_id", "lex_rank", "dense_rank", "rrf")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.length <= k && rows.nonEmpty)
    // rrf is exactly the declared integer fusion of the two ranks
    for ((_, lr, dr, rrf) <- rows) {
      val want = (if (lr > 0) 1000000L / (60L + lr) else 0L) +
        (if (dr > 0) 1000000L / (60L + dr) else 0L)
      assert(rrf == want && lr >= 0 && lr <= k && dr >= 0 && dr <= k)
    }
    // each leg's ranks agree with the leg recomputed standalone
    val lexTruth = ext.Search.bm25TopK(docs, "doc_id", "text",
        ext.Search.defaultTerms, k)
      .orderBy(desc("score"), col("doc_id"))
      .select("doc_id").as[Long].collect().zipWithIndex
      .map { case (id, i) => (id, i + 1L) }.toMap
    for ((id, lr, _, _) <- rows if lr > 0)
      assert(lexTruth(id) == lr, s"lex rank mismatch for $id")
    // a doc in BOTH legs must outrank a doc holding the same best rank
    // in only one leg — the point of fusion
    val both = rows.filter(r => r._2 > 0 && r._3 > 0)
    val solo = rows.filter(r => r._2 == 0 || r._3 == 0)
    for (b <- both; s <- solo
         if math.max(b._2, b._3) <= math.min(
           if (s._2 > 0) s._2 else Long.MaxValue,
           if (s._3 > 0) s._3 else Long.MaxValue))
      assert(b._4 > s._4)
  }
}
