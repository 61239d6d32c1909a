package graft.streaming

import graft.queries.{LexQueries, SimilarityQueries}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{coalesce, col, lit, row_number}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming HYBRID retrieval — the full production retrieval shape
  * ([[LexQueries.hybridFiltered]]: RRF fusion over the persisted
  * lexical + IVF indexes, facet applied to BOTH arms, tombstone-aware)
  * as an always-on serving edge: hybrid queries (qid, text, embedding)
  * arrive as a stream, every micro-batch is answered by fusing the two
  * per-batch serving paths the single-family edges ([[LexServe]],
  * [[AnnServe]]) already run.
  *
  * Reference anchor: the reference is a *streaming* job end to end
  * (StreamingJob.java:119-123); this closes the one retrieval shape
  * that existed batch-only — the fusion of the four streamed families.
  *
  * Plan per micro-batch ([[serveBatch]]):
  *   - the LEX arm answers the batch's text through
  *     [[LexQueries.queryBatch]] (slot-pruned lexicon/posting reads,
  *     result sharing by term-set signature) at arm width `armK`;
  *   - the SEM arm answers the batch's embeddings through
  *     [[SimilarityQueries.serveQueryBatch]] (cached frozen centroids,
  *     dynamic-partition-pruned probed buckets, result sharing by
  *     embedding) at the same arm width;
  *   - a facet screens BOTH arms filter-first from ONE partition-pruned
  *     read of the lexical index's attrs sidecar (doc_id ≡ vec_id ties
  *     the two id spaces — the [[LexQueries.hybridFiltered]] contract),
  *     so each arm's top-armK fills among qualifying documents and the
  *     fused ranks are ranks WITHIN the facet;
  *   - the arms full-outer-join per (qid, doc) and fuse with RRF
  *     (k = 60) — the exact fixed-order arithmetic of the batch path,
  *     so streamed results are bit-identical to it (StreamingSpec pins
  *     streamed == `hybrid_filtered`);
  *   - per-query top-k, through `sink(df, batchId)`.
  *
  * What is cached at stream start: the lex stats row AND the IVF
  * centroid row — both frozen for their index's life (the same
  * artifacts the single-family edges pin); both released when the
  * query terminates. Tombstones and facet allowlists re-read per batch
  * — a takedown or a concurrent append lands on the next micro-batch
  * with no restart, in BOTH arms at once.
  *
  * Scale (100 TB): per-batch work is the sum of the two arms' per-batch
  * costs — O(batch tokenize + matched postings) + O(batch ×
  * probed-bucket volume) — plus a fusion join bounded by 2·armK rows
  * per query. Neither corpus is ever scanned; state is zero; restart
  * safety is checkpoint + idempotent sink, the shared foreachBatch
  * contract.
  */
object HybridServe {

  /** One micro-batch of hybrid serving — exposed for direct batch
    * parity testing. `batch` columns: (qid, text, embedding). Output:
    * (qid, doc_id, bm_rk, cos_rk, rrf, rk), rk ≤ k per qid. */
  private[graft] def serveBatch(spark: SparkSession, batch: DataFrame,
      lexIndex: String, ivfIndex: String, statsRow: DataFrame,
      centRow: DataFrame, k: Int = 20, armK: Int = 50,
      nprobe: Int = SimilarityQueries.IvfNprobe,
      tombstoneAware: Boolean = false,
      facetLang: Option[String] = None,
      facetSource: Option[String] = None): DataFrame = {
    // ONE allowlist read screens both arms (doc_id ≡ vec_id): both
    // facet axes are attrs partition levels, so the read prunes at
    // lang and/or source directories — never a text byte
    val preds = facetLang.map(l => col("lang") === l).toSeq ++
      facetSource.map(s => col("source") === s).toSeq
    val allowed = if (preds.isEmpty) None
      else Some(spark.read.parquet(s"$lexIndex/attrs")
        .filter(preds.reduce(_ && _)).select(col("doc_id").as("_facet_doc")))
    def screen(idCol: String): DataFrame => DataFrame = df => allowed match {
      case None => df
      case Some(a) => df.join(a, df(idCol) === col("_facet_doc"), "left_semi")
    }
    val lexArm = LexQueries.queryBatch(spark,
        batch.select(col("qid"), col("text")), lexIndex, statsRow, armK,
        tombstoneAware, docFilter = screen("doc_id"))
      .select(col("qid"), col("doc_id"), col("rk").as("bm_rk"))
    // ≤ armK rows per qid from the shared serving path; re-ranking them
    // by the same (cos desc, vid asc) total order reproduces the batch
    // path's ranks over a BOUNDED per-query frame
    val wCos = Window.partitionBy(col("qid"))
      .orderBy(col("cos").desc, col("vid").asc)
    val semArm = SimilarityQueries.serveQueryBatch(spark,
        batch.select(col("qid").as("vec_id"), col("embedding")),
        centRow, ivfIndex, nprobe, tombstoneAware,
        docFilter = screen("vid"), k = armK)
      .withColumn("cos_rk", row_number().over(wCos).cast("long"))
      .select(col("qid"), col("vid").as("doc_id"), col("cos_rk"))
    // RRF fuse — the EXACT fixed-order arithmetic of the batch path
    // (two deterministic divisions, one addition), so fused scores are
    // bit-identical to LexQueries.hybridServedBy
    val wRrf = Window.partitionBy(col("qid"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
    lexArm.join(semArm, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60.0) + col("bm_rk").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("cos_rk").cast("double")), lit(0.0)))
      .withColumn("rk", row_number().over(wRrf).cast("long"))
      .filter(col("rk") <= k)
      .select(col("qid"), col("doc_id"), col("bm_rk"), col("cos_rk"),
        col("rrf"), col("rk"))
  }

  /** Start serving `queries` (a STREAMING frame with columns `qid`,
    * `text`, `embedding`) against the persisted lexical index at
    * `lexIndex` fused with the persisted IVF index at `ivfIndex`; each
    * micro-batch's fused top-k goes to `sink` with its batch id.
    * `facetLang`/`facetSource` scope every query to one facet (their
    * conjunction when both), applied filter-first to BOTH arms; an
    * index without the attrs sidecar refuses ONCE at stream start. */
  def start(
      spark: SparkSession,
      queries: DataFrame,
      lexIndex: String,
      ivfIndex: String,
      sink: (DataFrame, Long) => Unit,
      checkpointDir: String,
      k: Int = 20,
      armK: Int = 50,
      nprobe: Int = SimilarityQueries.IvfNprobe,
      availableNow: Boolean = false,
      tombstoneAware: Boolean = false,
      facetLang: Option[String] = None,
      facetSource: Option[String] = None
  ): StreamingQuery = {
    if (facetLang.isDefined || facetSource.isDefined) {
      val attrs = new org.apache.hadoop.fs.Path(s"$lexIndex/attrs")
      require(attrs.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(attrs),
        s"HybridServe --facetLang/--facetSource: no attrs/ sidecar under " +
          s"$lexIndex - the index predates faceted serving; rebuild it (or " +
          "append/ingest once, which materializes facet rows for the " +
          "delta) before serving with a facet")
    }
    // the two frozen one-row artifacts, pinned once for the stream's
    // life — the same caches the single-family edges hold
    val statsRow = LexQueries.loadStats(spark, lexIndex).cache()
    statsRow.count()
    val centRow = SimilarityQueries.loadCentRow(spark, ivfIndex).cache()
    centRow.count()
    def releaseBoth(): Unit = { statsRow.unpersist(); centRow.unpersist(); () }
    val w = queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(serveBatch(batch.sparkSession, batch, lexIndex, ivfIndex,
          statsRow, centRow, k, armK, nprobe, tombstoneAware,
          facetLang, facetSource), id)
      }
    // a throwing start() never registers the listener — release the
    // pinned artifacts before rethrowing rather than leak them
    val q =
      try (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
      catch { case e: Throwable => releaseBoth(); throw e }
    ServeCache.releaseOnTermination(spark, q)(() => releaseBoth())
    q
  }
}
