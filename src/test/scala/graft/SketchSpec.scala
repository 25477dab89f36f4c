package graft

import org.apache.spark.sql.functions._

/** The shipped KMV query must be sketch-ONLY: the exact-vs-estimate
  * comparison lives here as an assertion, not as an output column —
  * an exact `countDistinct` beside the sketch would pay the very
  * distinct shuffle the sketch exists to avoid. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def shingleHashes(dir: String) =
    io.Tables(spark, dir, "documents")
      .select(explode(ext.Dedup.shingles(col("text"), 3)).as("g"))
      .select(conv(substring(md5(col("g").cast("binary")), 1, 11), 16, 10)
        .cast("long").as("h"))

  test("KMV estimate tracks the exact distinct shingle count (k=256 → ~6% sigma)") {
    val est = SparkEntry.queries("sketch_distinct_shingles")(spark, sf)
      .select("est").as[Long].head()
    val exact = shingleHashes(sf).agg(countDistinct(col("h"))).as[Long].head()
    if (exact <= 256) assert(est == exact)
    else {
      val relErr = math.abs(est.toDouble - exact) / exact
      assert(relErr < 0.20, s"est=$est exact=$exact relErr=$relErr (3 sigma ≈ 0.19)")
    }
  }

  test("sketch query plan has no distinct aggregate and a single exchange") {
    val df = SparkEntry.queries("sketch_distinct_shingles")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // `array_distinct` (shingling) is fine; a `count(distinct …)` agg is
    // the anti-pattern the sketch replaces
    assert(!plan.contains("count(distinct"), s"distinct aggregate leaked into:\n$plan")
    // the AQE string repeats the plan under "== Initial Plan ==" — count
    // exchanges in the final section only
    val finalSection = plan.split("== Initial Plan ==").head
    val exchanges = "Exchange".r.findAllIn(finalSection).length
    assert(exchanges == 1, s"expected the one partial→final agg exchange, got $exchanges:\n$plan")
  }

  test("native ShingleMd5Hashes equals the HOF md5-of-shingle-string formulation") {
    val docs = io.Tables(spark, sf, "documents")
    val native = docs.select(col("doc_id"),
      array_sort(functions.ShingleMd5Hashes.shingleMd5(ops.TextOps.tokens(col("text")), 3)).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    val hof = docs
      .select(col("doc_id"), explode(ext.Dedup.shingles(col("text"), 3)).as("g"))
      .select(col("doc_id"), conv(substring(md5(col("g").cast("binary")), 1, 11), 16, 10)
        .cast("long").as("h"))
      .groupBy("doc_id").agg(array_sort(collect_set(col("h"))).as("hs"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native.filter(_._2.nonEmpty) == hof)
    assert(native.values.exists(_.nonEmpty))
  }

  test("Count-Min estimates are exact-or-over and invariant to partitioning") {
    val words = io.Tables(spark, sf, "documents")
      .select(explode(ops.TextOps.tokens(col("text"))).as("word"))
    val terms = ops.Sketches.trackedTerms
    val est = ops.Sketches.cmsTermFreq(words, "word", terms)
      .as[(String, Long)].collect().toMap
    val exact = words.where(col("word").isin(terms: _*))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val total = words.count()
    for (t <- terms) {
      val e = est(t)
      val x = exact.getOrElse(t, 0L)
      assert(e >= x, s"CMS must never undercount: $t est=$e exact=$x")
      // min over 4 rows of 1024 counters: a large overshoot means the
      // sketch is broken, not unlucky
      assert(e - x <= 8 * total / 1024, s"$t overcounted: est=$e exact=$x total=$total")
    }
    // merge correctness: the sketch is partitioning-invariant
    val est1 = ops.Sketches.cmsTermFreq(words.repartition(1), "word", terms)
      .as[(String, Long)].collect().toMap
    assert(est1 == est)
  }

  test("empty input degrades to (null kth_min, est 0) instead of erroring") {
    val empty = spark.range(0).select(col("id").as("h"))
    val row = ops.Sketches.kmvDistinct(empty, "h", k = 256, bits = 44).collect().head
    assert(row.isNullAt(0) && row.getLong(1) == 0L)
  }

  test("non-full sketch is the exact count; kth_min is the buffer max") {
    val five = spark.range(5).select((col("id") * 7L + 3L).as("h"))
    val row = ops.Sketches.kmvDistinct(five, "h", k = 256, bits = 44).collect().head
    assert(row.getLong(0) == 31L && row.getLong(1) == 5L)
  }

  test("KMV overlap: non-full sketches give EXACT inclusion-exclusion; estimates track truth when full") {
    // three groups with engineered overlap: A = 0..99, B = 50..149
    // (|A∩B| = 50), C = 1000..1099 (disjoint from both); < k distinct
    // per group and per union, so every estimate is exact by the
    // non-full-sketch contract
    val rows = (0L to 99L).map(("A", _)) ++ (50L to 149L).map(("B", _)) ++
      (1000L to 1099L).map(("C", _))
    val df = rows.toDF("src", "v")
      // spread values over the hash space like real md5-slice hashes
      .select(col("src"), pmod(xxhash64(col("v")), lit(1L << 44)).as("h"))
    val got = ops.Sketches.kmvOverlapPairs(df, "src", "h", k = 256, bits = 44)
      .orderBy("src_a", "src_b")
      .select("src_a", "src_b", "est_a", "est_b", "est_inter")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("A", "B", 100L, 100L, 50L), ("A", "C", 100L, 100L, 0L),
      ("B", "C", 100L, 100L, 0L)))

    // full sketches: two 10k-value groups sharing half their values —
    // k=256 KMV has ~1/sqrt(k) ≈ 6% sigma; assert within 5 sigma
    val big = (0L until 10000L).map(("X", _)) ++ (5000L until 15000L).map(("Y", _))
    val bigDf = big.toDF("src", "v")
      .select(col("src"), pmod(xxhash64(col("v")), lit(1L << 44)).as("h"))
    val est = ops.Sketches.kmvOverlapPairs(bigDf, "src", "h", k = 256, bits = 44)
      .select("est_union", "est_inter").as[(Long, Long)].collect().head
    assert(math.abs(est._1 - 15000L) < 4500, s"union est ${est._1} too far from 15000")
    assert(math.abs(est._2 - 5000L) < 4500, s"inter est ${est._2} too far from 5000")
  }

  test("histogram quantiles: empty input yields no rows, not an NPE") {
    val empty = spark.range(0).select(col("id").cast("double").as("v"))
    assert(ops.Sketches.histQuantiles(empty, "v", Seq(0.5, 0.9)).count() == 0)
  }

  test("histogram quantiles: all-equal input yields that value, not NaN bins") {
    val const = spark.range(100).select(lit(42.5).as("v"))
    val got = ops.Sketches.histQuantiles(const, "v", Seq(0.5, 0.99))
      .orderBy("q").as[(Double, Double)].collect().toSeq
    assert(got == Seq((0.5, 42.5), (0.99, 42.5)))
  }

  test("grouped histogram quantiles: per-group bounds, constant groups hit exactly") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("b", 7.0), ("b", 7.0), ("b", 7.0)).toDF("k", "v")
    val got = ops.Sketches.histQuantilesBy(df, "k", "v", Seq(0.5), bins = 1024)
      .orderBy("grp").as[(String, Double, Double)].collect().toSeq
    // group a: rank ceil(0.5*4)=2 → value 2.0, within one bin width below
    assert(got(1) == (("b", 0.5, 7.0)))
    val (g, q, est) = got(0)
    assert(g == "a" && q == 0.5 && est <= 2.0 && 2.0 - est <= 3.0 / 1024)
  }

  test("histogram quantiles: exact on integer-width bins") {
    // values 0..4096 with bins=4096 → width exactly 1, every value its
    // own bin: the lower-edge estimate IS the exact quantile pick
    // (rank ceil(0.5·4097) = 2049 → value 2048)
    val vals = spark.range(4097).select(col("id").cast("double").as("v"))
    val got = ops.Sketches.histQuantiles(vals, "v", Seq(0.5))
      .as[(Double, Double)].collect().head
    assert(got == ((0.5, 2048.0)))
  }

  // Zipf-ish random words: uniform draw from a per-row modulus cycling
  // 1..100, so word j's count ~ n/100·Σ_{k>j} 1/k — a heavy head (w0
  // ≈ 5% of all rows) over a vocabulary larger than the MG capacity
  // used below, so the candidate pruning actually fires; md5-derived
  // so it's deterministic
  private def zipfWords(n: Int) =
    spark.range(n).select(
      concat(lit("w"),
        (conv(substring(md5(col("id").cast("string")), 1, 11), 16, 10)
          .cast("long") % (col("id") % 100 + 1))).as("word"))

  test("MisraGries candidates are a superset of every > n/(m+1) item, any partitioning") {
    val n = 20000
    val m = 50
    val words = zipfWords(n)
    val exact = words.groupBy("word").count()
      .where(col("count") > n.toLong / (m + 1))
      .as[(String, Long)].collect().map(_._1).toSet
    assert(exact.nonEmpty, "test data must contain true heavy items")
    for (parts <- Seq(1, 4, 13)) {
      val cand = words.repartition(parts)
        .agg(udaf(ops.Aggregators.MisraGries(m)).apply(col("word")))
        .as[Seq[String]].collect().head.toSet
      assert(cand.size <= m, s"capacity $m exceeded: ${cand.size}")
      assert(exact.subsetOf(cand),
        s"parts=$parts lost heavy items: ${exact.diff(cand)}")
    }
  }

  test("heavyHittersExact equals plain groupBy + HAVING at any partitioning") {
    val words = zipfWords(20000)
    val phi = 5
    val expect = words.groupBy("word").agg(count(lit(1)).as("cnt"))
      .crossJoin(words.agg(count(lit(1)).as("n")))
      .where(col("cnt") * 1000 >= col("n") * phi)
      .select("word", "cnt").as[(String, Long)].collect().toSet
    assert(expect.nonEmpty)
    for (parts <- Seq(1, 7)) {
      val got = ops.Sketches.heavyHittersExact(words.repartition(parts), "word", phi)
        .as[(String, Long)].collect().toSet
      assert(got == expect, s"parts=$parts")
    }
  }

  test("heavyHittersExactByKey equals per-key groupBy + HAVING, per-key thresholds") {
    // two keys with DIFFERENT totals, so a word can clear one key's
    // threshold and miss the other's — the per-key contract
    val words = zipfWords(16000).withColumn("k",
      when(col("word").substr(2, 1).cast("int") % 3 === 0, "a").otherwise("b"))
    val phi = 8
    val totals = words.groupBy("k").agg(count(lit(1)).as("n"))
    val expect = words.groupBy("k", "word").agg(count(lit(1)).as("cnt"))
      .join(totals, "k")
      .where(col("cnt") * 1000 >= col("n") * phi)
      .select("k", "word", "cnt").as[(String, String, Long)].collect().toSet
    assert(expect.nonEmpty)
    assert(expect.map(_._1).size == 2, "both keys must contribute hitters")
    val got = ops.Sketches.heavyHittersExactByKey(words.repartition(7), "k", "word", phi)
      .as[(String, String, Long)].collect().toSet
    assert(got == expect)
  }

  test("heavyHittersExact: empty input yields no rows; plan broadcasts the candidates") {
    val empty = spark.range(0).select(col("id").cast("string").as("word"))
    assert(ops.Sketches.heavyHittersExact(empty, "word", 10).count() == 0)
    val df = ops.Sketches.heavyHittersExact(zipfWords(5000), "word", 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"candidate filter must be a broadcast join, not a shuffle:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "no shuffled join in the verify pass")
  }
}
