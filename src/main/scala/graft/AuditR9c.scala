package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-9 attribution probe for the bitext kernel: the gated scale
  * run read `emb_bitext_mine` ≈ 2× `graph_pagerank` at 16× and ≈ 3× at
  * 64×, although both ride the same kNN-graph substrate and bitext's
  * own joins are linear in edges. Decompose: (a) the cross-side-
  * filtered graph build alone, (b) the unfiltered build alone, (c) the
  * margin pipeline on a pre-materialized graph. One fresh context per
  * cell, untimed 1× warmup — the BenchScale discipline. */
object AuditR9c {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "16,64")
      .split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt).toSeq

    def withSession[T](body: SparkSession => T): T = {
      val spark = SparkSession.builder()
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.extensions", "graft.functions.GraftExtensions")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      try body(spark) finally spark.stop()
    }

    def time[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    // batch-serving amortization: N queries through ONE batchBm25TopK
    // pass vs N single-query bm25TopK scans — the claim behind
    // search_batch_bm25's design (each single serve re-tokenizes the
    // corpus; the batch pays one pass for all)
    if (sys.env.get("SPARK_GRAFT_AUDIT_BATCH").forall(_ == "1")) withSession { spark =>
      val docs = io.Tables(spark, sfDir, "documents")
      val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table",
        "value", "part", "hash", "merge", "batch", "spark", "line", "sort",
        "window", "data", "column", "join", "small", "customer", "query",
        "big", "stream", "group", "order", "filter", "vector")
      val queries = (0 until 24).map { i =>
        i.toLong -> Seq(vocab(i % vocab.size), vocab((i + 7) % vocab.size),
          vocab((i + 13) % vocab.size))
      }
      // untimed warmup
      ext.Search.bm25TopK(docs, "doc_id", "text", queries.head._2, 10).count()
      val (tSingle, _) = time {
        queries.foreach { case (_, ts) =>
          ext.Search.bm25TopK(docs, "doc_id", "text", ts, 10).count()
        }
      }
      val (tBatch, n) = time {
        ext.Search.batchBm25TopK(docs, "doc_id", "text", queries, 10).count()
      }
      System.err.println(
        f"[audit-r9c] batch-serve 24 queries: single-loop ${tSingle}%7.2f s  one-pass ${tBatch}%6.2f s  (${tSingle / tBatch}%4.1f×, $n rows)")
    }

    for (f <- factors) {
      withSession { spark =>
        val emb0 = io.Tables(spark, sfDir, "embeddings")
        // untimed warmup at 1×
        ext.Similarity.knnGraphIvf(BenchScale.inflateEmbeddings(emb0, 1),
          "vec_id", "embedding", k = 5).count()
        spark.catalog.clearCache()
        val infl = BenchScale.inflateEmbeddings(emb0, f)
        val crossSide = pmod(col("probe_id"), lit(2)) =!= pmod(col("vec_id"), lit(2))

        val (tPlain, gPlain) = time {
          ext.Similarity.knnGraphIvf(infl, "vec_id", "embedding", k = 5)
        }
        val nPlain = gPlain.count()
        spark.catalog.clearCache()

        val (tFilt, gFilt) = time {
          ext.Similarity.knnGraphIvf(infl, "vec_id", "embedding", k = 5,
            edgeFilter = crossSide)
        }
        val nFilt = gFilt.count()

        // margin pipeline on the ALREADY materialized filtered graph:
        // replicate mineBitext's tail off gFilt
        val (tMargin, nPairs) = time {
          val g = gFilt.select(col("probe_id"), col("vec_id").as("__nb"), col("qdot"))
          val stats = g.groupBy("probe_id")
            .agg(sum(col("qdot")).as("__sq"), count(lit(1)).as("__cnt"))
            .select(col("probe_id"), expr("(__sq * 1000) div __cnt").as("__avg"))
          val fwd = g.where(pmod(col("probe_id"), lit(2)) === 0)
            .select(col("probe_id").as("id_a"), col("__nb").as("id_b"), col("qdot"))
          val rev = g.where(pmod(col("probe_id"), lit(2)) === 1)
            .select(col("probe_id").as("id_b"), col("__nb").as("id_a"))
          fwd.join(rev, Seq("id_a", "id_b"))
            .join(stats.select(col("probe_id").as("id_a"), col("__avg").as("__ma")), "id_a")
            .join(stats.select(col("probe_id").as("id_b"), col("__avg").as("__mb")), "id_b")
            .where(col("qdot") >= 0 && (col("__ma") + col("__mb")) > 0)
            .withColumn("margin_milli", expr("(qdot * 2000000) div (__ma + __mb)"))
            .where(col("margin_milli") >= 1000L)
            .count()
        }
        System.err.println(
          f"[audit-r9c] f=$f%-3d plain-graph ${tPlain}%7.2f s ($nPlain edges)  " +
          f"filtered-graph ${tFilt}%7.2f s ($nFilt edges)  margin-tail ${tMargin}%6.2f s ($nPairs pairs)")
      }
    }
  }
}
