package graft

import org.apache.spark.sql.functions._

import ext.{Search, Similarity}

/** Right-to-be-forgotten laws: purging a persisted index must equal a
  * rebuild on the retained corpus — stats included — without reading
  * the corpus, and the ANN purge must never touch the pinned
  * quantizers. */
class PurgeSpec extends SparkSpec {
  import spark.implicits._

  private def served(path: String, terms: Seq[String]) =
    Search.indexTopK(spark, path, terms, 25)
      .orderBy(desc("score"), col("doc_id"))
      .as[(Long, Long, Long)].collect().toSeq

  test("purgeTextIndex equals a rebuild on the retained corpus (relations AND serving), folding deltas") {
    val docs = io.Tables(spark, sf, "documents")
    val retained = docs.where(pmod(col("doc_id"), lit(37)) =!= 3)
    val p = java.nio.file.Files.createTempDirectory("txtpurge_spec").toString
    val pRef = java.nio.file.Files.createTempDirectory("txtpurge_ref").toString
    // build 80% + fold in 20% so the purge also has DELTAS to subtract
    // from — the production shape (ingest fold-ins accumulate between
    // purges)
    Search.writeTextIndex(docs.where(pmod(col("doc_id"), lit(5)) =!= 0),
      "doc_id", "text", p)
    Search.updateTextIndex(spark, p,
      docs.where(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text")
    Search.writeTextIndex(retained, "doc_id", "text", pRef)
    Search.purgeTextIndex(spark, p,
      docs.where(pmod(col("doc_id"), lit(37)) === 3).select("doc_id"), "doc_id")
    // a purge is also a compaction: no delta dirs may survive it
    for (rel <- Seq("postings", "term_df", "meta"))
      assert(Search.deltaDirs(spark, p, rel).isEmpty, rel)
    // all three relations equal the rebuild's, row for row
    def postings(path: String) = spark.read.parquet(s"$path/postings")
      .select(col("term"), col("id"), col("dl"), col("tf"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(postings(p) == postings(pRef))
    def termDf(path: String) = spark.read.parquet(s"$path/term_df")
      .select(col("term"), col("df"))
      .orderBy("term").as[(String, Long)].collect().toSeq
    assert(termDf(p) == termDf(pRef))
    def meta(path: String) = spark.read.parquet(s"$path/meta")
      .select(col("n_docs"), col("sum_dl"))
      .as[(Long, Long)].collect().toSeq
    assert(meta(p) == meta(pRef))
    // and serving is bit-identical — idf/length-norm read the purged
    // stats, not just the purged postings
    for (terms <- Seq(Search.defaultTerms, Seq("table", "merge")))
      assert(served(p, terms) == served(pRef, terms), s"terms=$terms")
  }

  test("purgeAnnIndex drops the deleted ids from lists+codes, leaves quantizers byte-untouched, serves identically") {
    val emb = io.Tables(spark, sf, "embeddings")
    val idx = java.nio.file.Files.createTempDirectory("annpurge_spec").toString
    Similarity.writeAnnIndex(Similarity.annIndex(emb, "vec_id", "embedding"), idx)
    val original = Similarity.readAnnIndex(spark, idx)
    // the expected purged content, held as collected rows (the purge
    // rewrites the directories under the same session)
    val delPred = pmod(col("vec_id"), lit(37)) === 3
    def listRows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id").cast("long"), col("list_id").cast("long"))
      .as[(Long, Long)].collect().toSet
    def codeRows(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id").cast("long"), col("sub").cast("long"),
        col("code").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    val expLists = listRows(original.lists.where(!delPred))
    val expCodes = codeRows(original.codes.where(!delPred))
    def quantizerFiles(): Map[String, (Long, Long)] = {
      val fs = new org.apache.hadoop.fs.Path(idx)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      Seq("coarse", "book").flatMap { rel =>
        fs.listStatus(new org.apache.hadoop.fs.Path(s"$idx/$rel")).toSeq
          .filter(_.isFile)
          .map(st => st.getPath.toString -> (st.getLen, st.getModificationTime))
      }.toMap
    }
    val qBefore = quantizerFiles()
    // the serving REFERENCE must be materialized BEFORE the purge
    // rewrites the directories (the index relations are lazy readers):
    // the same pinned quantizers over in-plan-filtered lists/codes
    val retained = emb.where(!delPred)
    def probe(i: Similarity.AnnIndex) =
      Similarity.probeIndex(i, retained, "vec_id", "embedding",
          probeFilter = col("vec_id") < 10, k = 10)
        .orderBy("probe_id", "rn")
        .as[(Long, Long, Long, Long)].collect().toSeq
    val probeRef = probe(Similarity.AnnIndex(original.coarse,
      original.lists.where(!delPred), original.book,
      original.codes.where(!delPred)))
    Similarity.purgeAnnIndex(spark, idx,
      emb.where(delPred).select("vec_id"), "vec_id")
    // pinned quantizers: not a byte of coarse/book moved
    assert(quantizerFiles() == qBefore,
      "purge touched quantizer files — retraining desyncs surviving codes")
    val purged = Similarity.readAnnIndex(spark, idx)
    assert(listRows(purged.lists) == expLists)
    assert(codeRows(purged.codes) == expCodes)
    // serving equality: the purged ARTIFACT behaves exactly like the
    // in-plan filtered index — the rewrite is content-preserving
    assert(probe(purged) == probeRef)
    // and a purged id can never surface as a neighbor
    assert(probe(purged).forall { case (_, vid, _, _) => vid % 37 != 3 })
  }
}
