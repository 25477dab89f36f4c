package graft

import org.apache.spark.sql.functions._

/** The composed production pipeline: one MinHash-LSH pass feeds pairs,
  * clusters, and canonical selection — unlike the standalone oracle
  * queries, which each re-run the front by harness design. */
class DedupPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("one materialized pair graph serves pairs/clusters/canonical; close releases it") {
    val docs = io.Tables(spark, sf, "documents")
    val scope = new util.CacheScope
    val p = ext.Dedup.pipeline(docs, "doc_id", "text", scope = scope)

    // consumer 1: the pair list reads the cache
    assert(p.pairs.count() > 0)
    assert(p.pairs.queryExecution.executedPlan.toString.contains("InMemoryTableScan"))

    // consumer 2: clusters are consistent with the pair graph (every
    // verified pair ended up in one component)
    val lbl = p.clusters
    val crossCluster = p.pairs
      .join(lbl.select(col("id").as("id_a"), col("cluster_id").as("ca")), "id_a")
      .join(lbl.select(col("id").as("id_b"), col("cluster_id").as("cb")), "id_b")
      .where(col("ca") =!= col("cb")).count()
    assert(crossCluster == 0)

    // consumer 3: canonical filter equals the standalone oracle query's
    // representative set, WITHOUT re-running the LSH front
    val canon = p.canonical(docs, "doc_id")
    val canonPlan = canon.queryExecution.executedPlan.toString.toLowerCase
    assert(!canonPlan.contains("minhash") && !canonPlan.contains("shingle"),
      s"canonical re-ran the LSH front:\n$canonPlan")
    val canonIds = canon.select("doc_id").as[Long].collect().toSet
    val standalone = SparkEntry.queries("dedup_canonical")(spark, sf)
      .where(col("doc_id") === col("canonical_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(canonIds == standalone)

    assert(p.pairs.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    p.close()
    // scope-owned caches are gone (connectedComponents' localCheckpoint
    // RDDs are the ContextCleaner's to reap, not the scope's)
    assert(p.pairs.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "close() must unpersist the pipeline's materializations")
  }
}
