package graft

import graft.queries.{LexQueries, SimilarityQueries}
import graft.sources.Tables
import graft.streaming.HybridServe

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The streamed HYBRID serving edge — bit-parity with the batch hybrid
  * entry points ([[LexQueries.hybridServed]]/[[LexQueries.hybridFiltered]]):
  * the full production retrieval shape (RRF fusion + facet + frozen
  * artifacts) must stream exactly as it batches. Index builds are
  * deterministic, so fresh tmp indexes over the same fixture serve the
  * same answers as the cached batch-path indexes. */
class HybridServeSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  // the batch hybrid rows query qid 0 with the single term "vector" and
  // vec 0's embedding — the streamed twin feeds the identical query
  private def hybridQueryRow: (Long, String, Seq[Float]) = {
    val emb = Tables.embeddings(spark, dir).filter(col("vec_id") === 0L)
      .select(col("embedding")).as[Seq[Float]].head()
    (0L, "vector", emb)
  }

  private type OutRow = (Long, Option[Long], Option[Long], Double, Long)

  private def asRows(df: org.apache.spark.sql.DataFrame): Set[OutRow] =
    df.select(col("doc_id"), col("bm_rk"), col("cos_rk"), col("rrf"), col("rk"))
      .as[OutRow].collect().toSet

  test("streamed hybrid == batch hybrid_served; faceted streamed == hybrid_filtered, bit for bit") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lexIdx = tmp("hybrid_lex_idx")
    LexQueries.buildLexIndex(spark, dir, lexIdx)
    val ivfIdx = tmp("hybrid_ivf_idx")
    SimilarityQueries.buildIvfIndex(spark, dir, ivfIdx)
    val row = hybridQueryRow

    def runStream(facetLang: Option[String]): Set[OutRow] = {
      val ms = MemoryStream[(Long, String, Seq[Float])]
      val outDir = tmp("hybrid_out")
      val query = HybridServe.start(
        spark, ms.toDF().toDF("qid", "text", "embedding"),
        lexIdx, ivfIdx,
        (df, id) => df.write.mode("overwrite").parquet(s"$outDir/b$id"),
        tmp("hybrid_ckpt"), facetLang = facetLang)
      try {
        ms.addData(row)
        query.processAllAvailable()
      } finally query.stop()
      val out = spark.read.parquet(s"$outDir/b0")
      assert(out.select(col("qid")).as[Long].collect().forall(_ == 0L))
      asRows(out)
    }

    val streamed = runStream(None)
    val batch = asRows(LexQueries.hybridServed(spark, dir))
    assert(streamed.nonEmpty && streamed == batch,
      "unfaceted streamed hybrid must equal hybrid_served bit for bit")

    val streamedFacet = runStream(Some("en"))
    val batchFacet = asRows(LexQueries.hybridFiltered(spark, dir))
    assert(streamedFacet.nonEmpty && streamedFacet == batchFacet,
      "lang-faceted streamed hybrid must equal hybrid_filtered bit for bit")
    assert(streamedFacet != streamed,
      "the fixture's en facet must actually change the fused ranking")
  }

  test("a sidecar-less lexical index refuses faceted hybrid serving once, at stream start") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lexIdx = tmp("hybrid_bare_lex")
    LexQueries.buildLexIndex(spark, dir, lexIdx)
    val fs = new org.apache.hadoop.fs.Path(lexIdx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$lexIdx/attrs"), true)
    val ivfIdx = tmp("hybrid_bare_ivf")
    SimilarityQueries.buildIvfIndex(spark, dir, ivfIdx)
    val ms = MemoryStream[(Long, String, Seq[Float])]
    intercept[IllegalArgumentException] {
      HybridServe.start(spark, ms.toDF().toDF("qid", "text", "embedding"),
        lexIdx, ivfIdx, (_, _) => (), tmp("hybrid_bare_ckpt"),
        facetLang = Some("en"))
    }
  }
}
