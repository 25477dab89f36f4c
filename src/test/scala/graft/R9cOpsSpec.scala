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
