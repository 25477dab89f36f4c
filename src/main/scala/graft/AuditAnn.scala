package graft

/** One-off stage-time profile of the LSH ANN query at sf0.1: times each
  * pipeline segment separately (bucket explode, candidate join, vector
  * re-attach + re-score, rank window) to locate the fixed-overhead vs
  * real-work split. */
object AuditAnn {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32, 32, "audit-ann")
    import org.apache.spark.sql.functions._
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val emb = io.Tables(spark, dir, "embeddings")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[audit] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("warm: count")(emb.count())
    val buckets = emb.select(col("vec_id"),
      posexplode(functions.RhpBuckets.rhpBuckets(col("embedding"), 64, 6, 8)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bkt")
    time("buckets explode")(buckets.write.format("noop").mode("overwrite").save())
    val probeBuckets = emb.where(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"),
        posexplode(functions.RhpBuckets.rhpBuckets(col("embedding"), 64, 6, 8)))
      .withColumnRenamed("pos", "tbl").withColumnRenamed("col", "bkt")
    val cands = probeBuckets.join(buckets, Seq("tbl", "bkt"))
      .where(col("vec_id") =!= col("probe_id"))
      .select(col("probe_id"), col("vec_id")).distinct()
    time("candidates")(cands.write.format("noop").mode("overwrite").save())
    println(s"[audit] n_cands = ${time("count cands")(cands.count())}")
    val full = ext.Similarity.lshTopK(emb, "vec_id", "embedding", col("vec_id") < 10, 10, 64)
    time("full query")(full.write.format("noop").mode("overwrite").save())
    time("full query again")(full.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
