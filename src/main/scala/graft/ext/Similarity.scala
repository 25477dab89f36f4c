package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search (SURVEY.md §2.5).
  *
  * Scores use quantized integer dot products: each float coordinate is
  * rounded to 3 decimals (×1000) and the dot product is exact int64
  * arithmetic. For unit-norm embeddings qdot ≈ cosine × 10^6. Integer
  * scores make results bit-reproducible across engines and partitionings —
  * float summation order can never flip a ranking.
  */
object Similarity {

  /** Quantized int64 dot product of two array<float> columns — the native
    * codegen'd Catalyst expression (tight primitive loop inside
    * whole-stage codegen). */
  def quantizedDot(a: Column, b: Column): Column =
    graft.functions.QuantizedDot.qdot(a, b)

  /** Same semantics built only from higher-order functions — the
    * reference formulation the native expression is validated against. */
  def quantizedDotHof(a: Column, b: Column): Column = {
    val q = (x: Column) => round(x.cast("double") * 1000).cast("long")
    aggregate(
      zip_with(a, b, (x, y) => q(x) * q(y)),
      lit(0L),
      (acc, v) => acc + v)
  }

  /** Exact double cosine (for engine-internal use where cross-engine
    * reproducibility doesn't matter; sum order is fixed left-to-right). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val n1 = aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val n2 = aggregate(transform(b, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    dot / (sqrt(n1) * sqrt(n2))
  }

  /** Brute-force top-k neighbors for each probe: the exact baseline.
    * Probes are broadcast (small side); the corpus is scanned once —
    * at 100 TB this is the map-only "score + per-probe top-k" shape with
    * partial top-k folded into the final window. */
  def bruteForceTopK(
      corpus: DataFrame,
      probes: DataFrame,
      idCol: String,
      vecCol: String,
      probeIdCol: String,
      probeVecCol: String,
      k: Int): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(probes))
      .where(col(idCol) =!= col(probeIdCol))
      .select(
        col(probeIdCol),
        col(idCol),
        quantizedDot(col(probeVecCol), col(vecCol)).as("qdot"))
    val w = Window.partitionBy(probeIdCol).orderBy(desc("qdot"), asc(idCol))
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= k)
  }

  /** All embedding pairs with qdot ≥ threshold — embedding-cosine
    * near-dup detection, exact O(n²) evaluated as a block-broadcast
    * kernel: the corpus is quantized once to a compact int64 matrix,
    * broadcast, and each partition scores its rows against all
    * higher-id broadcast rows in a primitive loop. Identical output to
    * the declarative crossJoin (`nearDupPairsCrossJoin`) but without
    * per-pair row materialization — arithmetic, not copies, is the
    * cost. At a corpus too large for one broadcast, the same kernel
    * runs per (row-block × column-block) pair; pair with the LSH
    * bucketing front (`lshNearDupPairs`) before going quadratic. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, minQdot: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val quantized: Dataset[(Long, Array[Long])] = df
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v.map(graft.functions.QuantizedDot.q)) }
    val all = quantized.collect().sortBy(_._1)
    val ids = all.map(_._1)
    val mat = all.map(_._2)
    val bc = spark.sparkContext.broadcast((ids, mat))
    val threshold = minQdot
    quantized
      .flatMap { case (idA, va) =>
        val (bIds, bMat) = bc.value
        // only score against strictly-higher ids: each pair once
        var lo = java.util.Arrays.binarySearch(bIds, idA)
        if (lo < 0) lo = -lo - 1 else lo += 1
        val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        var j = lo
        while (j < bIds.length) {
          val vb = bMat(j)
          var dot = 0L
          var i = 0
          val n = math.min(va.length, vb.length)
          while (i < n) { dot += va(i) * vb(i); i += 1 }
          if (dot >= threshold) out += ((idA, bIds(j), dot))
          j += 1
        }
        out
      }
      .toDF("id_a", "id_b", "qdot")
  }

  /** Declarative crossJoin formulation — validation reference for the
    * block-broadcast kernel. */
  def nearDupPairsCrossJoin(df: DataFrame, idCol: String, vecCol: String, minQdot: Long): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.crossJoin(b)
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), quantizedDot(col("v_a"), col("v_b")).as("qdot"))
      .where(col("qdot") >= minQdot)
  }

  /** Random-hyperplane LSH bucket id for an embedding: sign bits against
    * `planes` fixed pseudo-random hyperplanes — the scale path for ANN
    * (candidates from matching buckets, then exact re-score). */
  def rhpBucket(vec: Column, dim: Int, planes: Int, seed: Int = 7): Column = {
    val rnd = new scala.util.Random(seed)
    val planeVecs = Array.fill(planes, dim)(rnd.nextGaussian())
    val bits = (0 until planes).map { p =>
      val dot = (0 until dim).map { i =>
        element_at(vec, i + 1).cast("double") * lit(planeVecs(p)(i))
      }.reduce(_ + _)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((x: Column, y: Column) => x.bitwiseOR(y))
  }

  /** LSH-bucketed near-dup pairs — the scale path for
    * `nearDupPairs`: candidates only from shared hyperplane buckets
    * (linear-ish in corpus size), verified with the exact quantized dot,
    * so every emitted pair truly clears `minQdot`; recall (which pairs
    * are found) depends on the bucket geometry. */
  def lshNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minQdot: Long,
      dim: Int,
      tables: Int = 8,
      planes: Int = 6): DataFrame = {
    // candidate generation carries ONLY ids — the bucket self-join and
    // pair dedup would otherwise shuffle both float vectors per
    // candidate row; vectors are re-attached afterwards by two joins
    // against the (small per bucket-key group) corpus
    val buckets = df
      .select(col(idCol),
        posexplode(graft.functions.RhpBuckets.rhpBuckets(col(vecCol), dim, planes, tables)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "bkt")
    val a = buckets.select(col("tbl"), col("bkt"), col(idCol).as("id_a"))
    val b = buckets.select(col("tbl"), col("bkt"), col(idCol).as("id_b"))
    val cands = a.join(b, Seq("tbl", "bkt"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val va = df.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val vb = df.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    cands.join(va, "id_a").join(vb, "id_b")
      .select(col("id_a"), col("id_b"), quantizedDot(col("v_a"), col("v_b")).as("qdot"))
      .where(col("qdot") >= minQdot)
  }

  /** LSH-bucketed approximate top-k: candidates come only from buckets
    * the probe shares in one of `tables` independent hyperplane tables,
    * then are re-scored exactly. Replaces the per-probe corpus scan with
    * a bucket equi-join — the shape that survives a 1000-executor corpus.
    * Recall depends on data geometry (multi-table probing raises it;
    * uniform-random corpora are the worst case); results are always a
    * subset of the exact ranking because re-scoring is exact. */
  def lshTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      probeFilter: Column,
      k: Int,
      dim: Int,
      tables: Int = 8,
      planes: Int = 6): DataFrame = {
    // ids-only candidate generation (see lshNearDupPairs), vectors
    // re-attached before the exact re-score
    val buckets = corpus
      .select(col(idCol),
        posexplode(graft.functions.RhpBuckets.rhpBuckets(col(vecCol), dim, planes, tables)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "bkt")
    val probeBuckets = corpus.where(probeFilter)
      .select(col(idCol).as("probe_id"),
        posexplode(graft.functions.RhpBuckets.rhpBuckets(col(vecCol), dim, planes, tables)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "bkt")
    val cands = probeBuckets
      .join(buckets, Seq("tbl", "bkt"))
      .where(col(idCol) =!= col("probe_id"))
      .select(col("probe_id"), col(idCol))
      .distinct()
    val probesVec = corpus.where(probeFilter)
      .select(col(idCol).as("probe_id"), col(vecCol).as("pe"))
    val cv = corpus.select(col(idCol), col(vecCol))
    val scored = cands
      .join(broadcast(probesVec), "probe_id")
      .join(cv, idCol)
      .select(col("probe_id"), col(idCol), quantizedDot(col("pe"), col(vecCol)).as("qdot"))
    val w = Window.partitionBy("probe_id").orderBy(desc("qdot"), asc(idCol))
    scored.withColumn("rn", row_number().over(w).cast("long")).where(col("rn") <= k)
  }
}
