package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.QuantizedDot
import graft.ops.AsOfJoin

class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("QuantizedDot.q matches BigDecimal HALF_UP rounding for arbitrary floats") {
    val gen = Gen.chooseNum(-10f, 10f)
    (0 until 2000).foreach { i =>
      val f = gen(Gen.Parameters.default, Seed(i.toLong)).getOrElse(0f)
      val expected = java.math.BigDecimal.valueOf(f.toDouble * 1000d)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      assert(QuantizedDot.q(f) == expected, s"f=$f")
    }
    // exact .5 boundaries (representable in binary)
    Seq(0.0005f, -0.0005f, 0.0015f, 1.0625f).foreach { f =>
      val expected = java.math.BigDecimal.valueOf(f.toDouble * 1000d)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
      assert(QuantizedDot.q(f) == expected, s"boundary f=$f")
    }
  }

  test("TopK aggregator fold/merge equals sort.take(k) on random data and splits") {
    val agg = ops.Aggregators.TopK[Long](5)
    val rnd = new scala.util.Random(11)
    (0 until 200).foreach { _ =>
      val xs = Seq.fill(rnd.nextInt(40))(rnd.nextInt(20).toLong)
      val expected = xs.sorted(Ordering[Long].reverse).take(5)
      // straight fold
      val folded = xs.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(folded) == expected, s"fold xs=$xs")
      // arbitrary split + merge (the shuffle path)
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == expected, s"merge xs=$xs cut=$cut")
    }
  }

  test("KMinValues sketch fold/merge equals sorted-distinct-take-k on random data") {
    val agg = ops.Aggregators.KMinValues(6)
    val rnd = new scala.util.Random(17)
    (0 until 200).foreach { _ =>
      val xs = Seq.fill(rnd.nextInt(50))(rnd.nextInt(25).toLong)
      val expected = xs.distinct.sorted.take(6)
      val folded = xs.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(folded) == expected, s"fold xs=$xs")
      val cut = if (xs.isEmpty) 0 else rnd.nextInt(xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == expected, s"merge xs=$xs cut=$cut")
    }
  }

  test("saltedJoin equals the reference multiset join on random key skews") {
    val rnd = new scala.util.Random(23)
    for (_ <- 0 until 3) {
      val n = 300 + rnd.nextInt(200)
      // half the rows pile on one celebrity key; the dim carries
      // duplicate rows per key so multiset (not set) semantics are hit
      val left = Seq.fill(n)(if (rnd.nextBoolean()) 7L else rnd.nextInt(40).toLong)
        .zipWithIndex.map { case (k, i) => (k, i.toLong) }
      val right = (0L to 40L).flatMap(k => Seq.fill(1 + (k % 3).toInt)((k, k * 100)))
      val expected = (for ((k, v) <- left; (k2, w) <- right if k2 == k)
        yield (k, v, w)).groupBy(identity).view.mapValues(_.size).toMap
      val got = graft.ops.Skew
        .saltedJoin(left.toDF("k", "v"), right.toDF("k", "w"), "k",
          saltBuckets = 3, hotThreshold = 50L)
        .as[(Long, Long, Long)].collect()
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got == expected)
    }
  }

  test("BloomOr fold/merge equals the reference bitset on random data and splits") {
    val words = 4
    val agg = ops.Aggregators.BloomOr(words)
    val rnd = new scala.util.Random(13)
    (0 until 200).foreach { _ =>
      val rows = Seq.fill(rnd.nextInt(30))(
        Seq.fill(3)(rnd.nextInt(words * 64).toLong))
      val expected = {
        val b = new Array[Long](words)
        rows.flatten.foreach(p => b((p >>> 6).toInt) |= 1L << (p & 63))
        b.toSeq
      }
      val folded = rows.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(folded.clone) == expected)
      val cut = if (rows.isEmpty) 0 else rnd.nextInt(rows.length + 1)
      val (l, r) = rows.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == expected, s"rows=$rows cut=$cut")
    }
  }

  test("CountMin fold/merge never undercounts and is split-invariant on random data") {
    val (d, w) = (3, 16)
    val agg = ops.Aggregators.CountMin(d, w)
    val dig = (t: String) => java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def positions(t: String): Seq[Long] =
      (0 until d).map(i => java.lang.Long.parseLong(dig(t).substring(4 * i, 4 * i + 4), 16) % w)
    val rnd = new scala.util.Random(17)
    (0 until 100).foreach { _ =>
      val terms = Seq.fill(rnd.nextInt(50))(s"t${rnd.nextInt(8)}")
      val rows = terms.map(positions)
      val cut = if (rows.isEmpty) 0 else rnd.nextInt(rows.length + 1)
      val (l, r) = rows.splitAt(cut)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      val folded = rows.foldLeft(agg.zero)(agg.reduce)
      assert(merged.toSeq == folded.toSeq, "split-invariance")
      terms.distinct.foreach { t =>
        val est = positions(t).zipWithIndex.map { case (p, i) => folded(i * w + p.toInt) }.min
        assert(est >= terms.count(_ == t), s"undercount for $t")
      }
    }
  }

  test("BPE encode reassembles arbitrary words under arbitrary merge tables") {
    val rnd = new scala.util.Random(23)
    def randWord(n: Int) = Seq.fill(n)(('a' + rnd.nextInt(4)).toChar).mkString
    (0 until 300).foreach { _ =>
      // random merge table over a tiny alphabet: high collision rate
      // exercises chained merges (merged outputs feeding later rules)
      var merges = List.empty[(String, String)]
      var pieces = Set("a", "b", "c", "d")
      (0 until rnd.nextInt(12)).foreach { _ =>
        val l = pieces.toSeq(rnd.nextInt(pieces.size))
        val r = pieces.toSeq(rnd.nextInt(pieces.size))
        merges :+= ((l, r))
        pieces += (l + r)
      }
      val w = randWord(1 + rnd.nextInt(14))
      val out = ext.Bpe.encode(w, merges)
      assert(out.mkString == w, s"w=$w merges=$merges out=${out.toSeq}")
      assert(out.nonEmpty && out.length <= w.length)
      // idempotence: re-applying the same merges changes nothing
      val again = merges.foldLeft(out) { case (ps, (l, r)) => ext.Bpe.applyMerge(ps, l, r) }
      assert(again.toSeq == out.toSeq, s"not idempotent: w=$w merges=$merges")
    }
  }

  test("RangeJoin (binned) equals the naive non-equi join on random data") {
    val rnd = new scala.util.Random(23)
    val left = (1 to 300).map(i => (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong - 200, i.toLong))
      .toDF("k", "t", "lid")
    val right = (1 to 300).map(i => (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong - 200, i.toLong))
      .toDF("k", "rt", "rid")
    val binned = ops.RangeJoin.rangeJoin(left, right, "k", "t", "rt", 37L, Seq("rid"))
      .select("lid", "range_rid").as[(Long, Long)].collect().toSet
    val naive = left.join(right,
      left("k") === right("k") &&
        org.apache.spark.sql.functions.abs(left("t") - right("rt")) <= 37)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(binned.nonEmpty)
    // multiplicity check too: the binned join must not duplicate pairs
    val n = ops.RangeJoin.rangeJoin(left, right, "k", "t", "rt", 37L, Seq("rid")).count()
    assert(n == naive.size)
  }

  test("AsOfJoin equals brute-force reference on random data") {
    val rnd = new scala.util.Random(7)
    val left = (1 to 200).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong, i.toLong))
    val right = (1 to 100).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(100).toLong))
      .distinct // unique (key, time) as the contract requires
      .map { case (k, t) => (k, t, s"p_${k}_$t") }
    val lDf = left.toDF("k", "t", "lid")
    val rDf = right.toDF("k", "rt", "payload")
    val got = AsOfJoin.asof(lDf, rDf, "k", "t", "rt", Seq("payload"))
      .select("lid", "asof_payload").as[(Long, Option[String])].collect().toMap
    val expected = left.map { case (k, t, lid) =>
      val best = right.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption
      lid -> best.map(_._3)
    }.toMap
    assert(got == expected)
    assert(got.values.exists(_.isDefined))
    assert(got.values.exists(_.isEmpty) || right.map(_._2).min == 0)
  }
}
