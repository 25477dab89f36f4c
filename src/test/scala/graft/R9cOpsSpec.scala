package graft

import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.ops.{Skyline, TimeSeries}

/** Round-9 wave: 2-D Pareto frontier, margin-based bitext mining (and
  * the knnGraphIvf candidate-filter contract it rides on), first-touch
  * attribution. Each op gets a local brute-force twin plus the
  * structural invariant its scaladoc claims. */
class R9cOpsSpec extends SparkSpec {
  import spark.implicits._

  test("Skyline.frontierMax equals the brute-force dominance filter, ties on both axes kept") {
    val pts = Seq(
      (1L, 10L, 100L), (2L, 10L, 100L), // tied on both axes: both survive
      (3L, 20L, 50L), (4L, 5L, 200L),
      (5L, 20L, 49L),                   // dominated same-x by 3
      (6L, 10L, 99L),                   // dominated same-x by 1/2
      (7L, 3L, 200L),                   // dominated by 4 (same y, lower x)
      (8L, 25L, 10L), (9L, 1L, 1L))
      .toDF("id", "x", "y")
    val got = Skyline.frontierMax(pts, "x", "y")
      .select("id").as[Long].collect().toSet
    val rows = pts.as[(Long, Long, Long)].collect()
    val want = rows.filter { case (_, px, py) =>
      !rows.exists { case (_, qx, qy) =>
        qx >= px && qy >= py && (qx > px || qy > py)
      }
    }.map(_._1).toSet
    assert(got == want)
    assert(got == Set(1L, 2L, 3L, 4L, 8L))
  }

  test("frontierMax broadcasts the level relation and never plans a data-keyed exchange on the join") {
    val pts = spark.range(0, 5000).selectExpr(
      "id", "id % 97 AS x", "(id * 31) % 1000 AS y")
    val out = Skyline.frontierMax(pts, "x", "y")
    out.collect() // AQE: executedPlan is final only after an action
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"frontier join-back must broadcast the bounded level relation:\n$plan")
  }

  test("knnGraphIvf edgeFilter restricts candidates BEFORE the rank cut") {
    val emb = io.Tables(spark, sf, "embeddings")
    val crossSide = pmod(col("probe_id"), lit(2)) =!= pmod(col("vec_id"), lit(2))
    val filtered = Similarity
      .knnGraphIvf(emb, "vec_id", "embedding", k = 3, edgeFilter = crossSide)
      .as[(Long, Long, Long, Long)].collect()
    // every edge satisfies the predicate...
    assert(filtered.forall { case (p, v, _, _) => p % 2 != v % 2 })
    // ...and ranks are contiguous from 1 (a post-filter of the
    // unconstrained graph would leave holes)
    filtered.groupBy(_._1).foreach { case (_, es) =>
      assert(es.map(_._4).sorted.toSeq == (1L to es.length).toSeq)
    }
    // the filtered graph is NOT a subset of the unconstrained top-3:
    // some probe must reach deeper cross-side neighbors the plain
    // graph's same-side edges crowd out (proves pre-rank filtering)
    val plain = Similarity.knnGraphIvf(emb, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(e => (e._1, e._2)).toSet
    assert(filtered.exists(e => !plain.contains((e._1, e._2))))
    spark.catalog.clearCache()
  }

  test("mineBitext pairs are cross-side, mutual, and carry the exact integer margin") {
    val emb = io.Tables(spark, sf, "embeddings")
    val got = Similarity.mineBitext(emb, "vec_id", "embedding", k = 5,
        minMarginMilli = 1000L)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // local replay from the SAME cross-side graph the kernel builds
    val crossSide = pmod(col("probe_id"), lit(2)) =!= pmod(col("vec_id"), lit(2))
    val g = Similarity
      .knnGraphIvf(emb, "vec_id", "embedding", k = 5, edgeFilter = crossSide)
      .as[(Long, Long, Long, Long)].collect()
    val avgMilli = g.groupBy(_._1).map { case (p, es) =>
      p -> es.map(_._3).sum * 1000 / es.length
    }
    val edges = g.map(e => (e._1, e._2)).toSet
    val qd = g.map(e => ((e._1, e._2), e._3)).toMap
    val want = (for {
      ((a, b), q) <- qd.toSeq
      if a % 2 == 0 && edges.contains((b, a)) && q >= 0
      den = avgMilli(a) + avgMilli(b)
      if den > 0
      m = q * 2000000L / den
      if m >= 1000L
    } yield (a, b, q, m)).sortBy(p => (p._1, p._2))
    assert(got.sortBy(p => (p._1, p._2)).toSeq == want)
    // every kept pair is side A × side B and mutual by construction
    assert(got.forall { case (a, b, _, _) => a % 2 == 0 && b % 2 == 1 })
    spark.catalog.clearCache()
  }

  test("localityOrder is a dense (sh, id) total order that places duplicates adjacent") {
    val docs = io.Tables(spark, sf, "documents").limit(40)
      .select(col("doc_id"), col("text"))
    // plant an exact duplicate family far apart in id space
    val dup = docs.where(col("doc_id") === 0)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val got = graft.ext.Dedup.localityOrder(docs.union(dup), "doc_id", "text")
      .as[(Long, Long, Long)].collect()
    // dense permutation 1..n
    assert(got.map(_._3).sorted.toSeq == (1L to got.length).toSeq)
    // the order IS the (sh, id) sort
    assert(got.sortBy(_._3).map(_._1).toSeq ==
      got.sortBy(r => (r._2, r._1)).map(_._1).toSeq)
    // identical texts fingerprint identically and sit adjacent
    val byId = got.map(r => (r._1, r._3)).toMap
    val sh = got.map(r => (r._1, r._2)).toMap
    assert(sh(0L) == sh(10000L))
    assert(math.abs(byId(0L) - byId(10000L)) == 1)
  }

  test("oodScreen's bottom-k cut matches the full ranking's bottom slice") {
    val emb = io.Tables(spark, sf, "embeddings")
    val k = 20
    val cut = Similarity.oodScreen(emb, "vec_id", "embedding", k = k)
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    val full = Similarity.oodScreen(emb, "vec_id", "embedding", k = 100000)
      .as[(Long, Long, Long)].collect().sortBy(_._3)
    // contiguous ascending ranks, affinity non-decreasing
    assert(cut.map(_._3).toSeq == (1L to k).toSeq)
    assert(cut.sliding(2).forall(p => p(0)._2 <= p(1)._2))
    // the cut is exactly the full ranking's first k rows (same training)
    assert(cut.toSeq == full.take(k).toSeq)
    // nothing outside the screen is farther than anything inside
    assert(full.drop(k).forall(_._2 >= cut.last._2))
    spark.catalog.clearCache()
  }

  test("trustRank matches a local seed-gated integer replay; non-seeds get no teleport") {
    // chain 1→2→3 plus isolated 4; seed = {1}
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val nodes = (1L to 4L).toDF("id")
    val seeds = Seq(1L).toDF("id")
    val got = graft.ext.Graph.trustRank(edges, "src", "dst", nodes, "id",
        seeds, "id", iters = 3, scale = 1000000L, dampX100 = 85L)
      .as[(Long, Long)].collect().toMap
    // local replay of the exact integer law
    val deg = Map(1L -> 1L, 2L -> 1L)
    val adjIn = Map(2L -> Seq(1L), 3L -> Seq(2L))
    var r = Map(1L -> 1000000L, 2L -> 0L, 3L -> 0L, 4L -> 0L)
    for (_ <- 1 to 3) {
      r = r.keys.map { v =>
        val tele = if (v == 1L) (15L * 1000000L) / (100L * 1L) else 0L
        val s = adjIn.getOrElse(v, Seq.empty).map(u => r(u) / deg(u)).sum
        v -> (tele + (85L * s) / 100L)
      }.toMap
    }
    assert(got == r)
    // structural: only the seed holds teleport mass; the isolated
    // non-seed is exactly 0; downstream trust decays but is positive
    assert(got(4L) == 0L && got(1L) > got(2L) && got(2L) > got(3L) && got(3L) > 0L)
  }

  test("linkPredict scores non-adjacent common-neighbor pairs and excludes existing edges") {
    // square 1-2-3-4: diagonals (1,3) and (2,4) share two neighbors
    // each and are not edges; every adjacent pair IS an edge and must
    // be excluded no matter how many neighbors it shares
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val got = graft.ext.Graph.linkPredict(edges, "src", "dst", k = 10)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._5)
    // jac = 2·1000 div (2 + 2 − 2) = 1000 for both diagonals
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      Seq((1L, 3L, 2L, 1000L), (2L, 4L, 2L, 1000L)))
    assert(got.map(_._5).toSeq == Seq(1L, 2L))
    spark.catalog.clearCache()
  }

  test("batchBm25TopK serves every query bit-identically to the single-query scan") {
    import graft.ext.Search
    val docs = io.Tables(spark, sf, "documents")
    val batch = Search.batchBm25TopK(docs, "doc_id", "text",
        Search.defaultBatch, k = 10)
      .select("qid", "doc_id", "score", "n_hits", "rn")
      .as[(Long, Long, Long, Long, Long)].collect()
    for ((qid, terms) <- Search.defaultBatch) {
      val single = Search.bm25TopK(docs, "doc_id", "text", terms, k = 10)
        .as[(Long, Long, Long)].collect().toSeq
      val got = batch.filter(_._1 == qid).sortBy(_._5)
        .map(r => (r._2, r._3, r._4)).toSeq
      assert(got == single, s"query $qid diverged from the scan form")
    }
  }

  test("noveltyStats gives first owners full credit and re-scrapes zero") {
    val a = (1 to 20).map(i => s"w$i").mkString(" ")   // 13 distinct 8-grams
    val fresh = (100 to 110).map(i => s"x$i").mkString(" ")
    val half = ((1 to 10).map(i => s"w$i") ++ (200 to 209).map(i => s"y$i")).mkString(" ")
    val docs = Seq((1L, a), (2L, a), (3L, fresh), (4L, half))
      .toDF("doc_id", "text")
    val got = graft.ext.TextAnalysis.noveltyStats(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    val byId = got.map(r => r._1 -> r).toMap
    // doc 1 owns everything it has; its re-scrape doc 2 owns nothing
    assert(byId(1L)._4 == 1000L && byId(2L)._4 == 0L)
    // doc 3 shares no vocabulary: fully novel
    assert(byId(3L)._4 == 1000L)
    // doc 4: grams fully inside w1..w10 are owned by doc 1; every gram
    // touching a y-token is novel — 20-token doc has 13 grams, 3 lie
    // inside the shared prefix → 10/13 novel
    assert(byId(4L)._2 == 13L && byId(4L)._3 == 10L)
    assert(byId(4L)._4 == 10L * 1000L / 13L)
    // permille law holds everywhere
    got.foreach(r => assert(r._4 == r._3 * 1000L / r._2))
  }

  test("rfmSegments assigns population quintiles from bounded histograms") {
    // 10 users, one event each: recency and monetary both ascend with
    // i, frequency is constant (degenerate single bucket → quintile 0
    // for everyone) — so q_r == q_m == (i-1) div 2 and the segment
    // code is q·101
    val ev = (1 to 10).map(i =>
      (i.toLong, i.toLong, "view", i.toLong * 10000L, i.toDouble))
      .toDF("event_id", "user_id", "event_type", "sec", "value")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = TimeSeries.rfmSegments(ev)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val want = (0 to 4).map { q =>
      val users = Seq(2 * q + 1, 2 * q + 2)
      (q * 101L, 2L, users.map(_ * 100L).sum)
    }
    assert(got == want)
  }

  test("recallEval reads 1000 when the IVF path probes every list, and is bounded otherwise") {
    val emb = io.Tables(spark, sf, "embeddings")
    val full = Similarity.recallEval(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 5, k = 10, nprobe = 64)
      .as[(Long, Long, Long)].collect()
    // nprobe == numCentroids → the approx leg IS exact → perfect recall
    assert(full.length == 5 && full.forall(r => r._2 == 10L && r._3 == 1000L))
    val part = Similarity.recallEval(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 5, k = 10)
      .as[(Long, Long, Long)].collect()
    // default nprobe=4: a strict subset of lists → recall in [0, 1000],
    // permille law exact
    assert(part.forall(r => r._2 >= 0L && r._2 <= 10L && r._3 == r._2 * 1000L / 10L))
    spark.catalog.clearCache()
  }

  test("mrrEval finds the first conjunctively-relevant rank; queries with no such doc score 0") {
    import graft.ext.Search
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "c d"))
      .toDF("doc_id", "text")
    val got = Search.mrrEval(docs, "doc_id", "text",
        Seq(0L -> Seq("a", "c"), 1L -> Seq("b", "d")), k = 3)
      .as[(Long, Option[Long], Long)].collect().sortBy(_._1)
    // doc 1 is the only one holding both 'a' and 'c', and two matched
    // terms outscore any single-term doc → first_rank 1, rr 10⁶
    assert(got(0) == ((0L, Some(1L), 1000000L)))
    // no document holds both 'b' and 'd' → null rank, reciprocal 0
    assert(got(1) == ((1L, None, 0L)))
  }

  test("disorderProfile buckets event-time lag behind the arrival-order running max") {
    // one user, arrival order = event_id; lags: 0, 50, 0, 10, 0
    val ev = Seq(
      (1L, 1L, 100L), (2L, 1L, 50L), (3L, 1L, 200L),
      (4L, 1L, 190L), (5L, 1L, 1000L))
      .toDF("event_id", "user_id", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = TimeSeries.disorderProfile(ev)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // bucket −1 = in order; 10 → bucket 3 ([8,16)); 50 → bucket 5 ([32,64))
    assert(got == Seq((-1L, 3L, 0L), (3L, 1L, 10L), (5L, 1L, 50L)))
  }

  test("trainingTriples: positives above band, negatives below, local brute replay") {
    val emb = io.Tables(spark, sf, "embeddings")
    val got = Similarity.trainingTriples(emb, "vec_id", "embedding",
        probeFilter = col("vec_id") < 50, negatives = 3)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._6))
    assert(got.nonEmpty)
    assert(got.forall(r => r._3 >= 450000L && r._5 < 450000L))
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._6).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // local brute replay off the raw vectors
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, v) => id -> v.map(graft.functions.QuantizedDot.q) }
    def qd(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => x * y }.sum
    val want = (for {
      (pid, pv) <- vecs.filter(_._1 < 50)
      scored = vecs.filter(_._1 != pid).map { case (id, v) => (id, qd(pv, v)) }
      pos <- scored.filter(_._2 >= 450000L)
        .sortBy { case (id, q) => (-q, id) }.headOption.toSeq
      ((nid, nq), i) <- scored.filter(_._2 < 450000L)
        .sortBy { case (id, q) => (-q, id) }.take(3).zipWithIndex
    } yield (pid, pos._1, pos._2, nid, nq, i + 1L)).sortBy(r => (r._1, r._6))
    assert(got.toSeq == want.toSeq)
    spark.catalog.clearCache()
  }

  test("langid confusion matrix conserves mass and matches the per-doc predictions") {
    val docs = io.Tables(spark, sf, "documents")
    val matrix = docs
      .select(col("lang"), graft.ops.TextOps.tokens(col("text")).as("tk"))
      .select(col("lang"),
        graft.ext.TextAnalysis.langIdFromTokens(col("tk")).as("pred_lang"))
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect()
    assert(matrix.map(_._3).sum == docs.count())
    val perDoc = docs
      .select(col("lang"), graft.ops.TextOps.tokens(col("text")).as("tk"))
      .select(col("lang"),
        graft.ext.TextAnalysis.langIdFromTokens(col("tk")).as("p"))
      .as[(String, String)].collect()
      .groupBy(identity).map { case (k, g) => (k._1, k._2, g.size.toLong) }.toSet
    assert(matrix.toSet == perDoc)
  }

  test("source-pair dedup provenance conserves the pair count and orders pairs canonically") {
    val docs = io.Tables(spark, sf, "documents")
    val pairs = graft.ext.Dedup.nearDupPairs(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.6)
    val src = docs.select(col("doc_id"), col("source"))
    val bySrc = pairs
      .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")), "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")), "id_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_pairs"))
      .as[(String, String, Long)].collect()
    assert(bySrc.map(_._3).sum == pairs.count())
    assert(bySrc.forall(r => r._1 <= r._2))
    spark.catalog.clearCache()
  }

  test("firstTouchAttribution credits each conversion to its session's entry type") {
    val ev = Seq(
      // user 1, session 1: view → click → purchase  (credit: view)
      (1L, 1L, "view", 0L), (2L, 1L, "click", 600L), (3L, 1L, "purchase", 1200L),
      // user 1, session 2 (gap > 1800): signup → purchase (credit: signup)
      (4L, 1L, "signup", 10000L), (5L, 1L, "purchase", 10500L),
      // user 2, one session starting with purchase: credits itself
      (6L, 2L, "purchase", 0L), (7L, 2L, "view", 100L),
      // user 3: session with no conversion contributes nothing
      (8L, 3L, "view", 0L))
      .toDF("event_id", "user_id", "event_type", "sec")
      .withColumn("ts", timestamp_seconds(col("sec")))
    val got = TimeSeries.firstTouchAttribution(ev)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      ("purchase", 1L, 1L), ("signup", 1L, 1L), ("view", 1L, 1L)))
  }
}
