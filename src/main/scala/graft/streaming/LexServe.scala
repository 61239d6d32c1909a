package graft.streaming

import graft.queries.LexQueries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming LEXICAL retrieval over the persisted BM25 inverted index —
  * [[AnnServe]]'s text-retrieval twin, completing the serve-many
  * symmetry for the third index family: text queries arrive as a
  * stream, every micro-batch is answered with its BM25 top-k against
  * the STANDING corpus without tokenizing or scanning a single standing
  * document.
  *
  * Reference anchor: the reference is a *streaming* job end to end
  * (StreamingJob.java:119-123); this gives lexical retrieval the same
  * always-on query edge the vector and dedup families have.
  *
  * Plan per micro-batch ([[LexQueries.queryBatch]]):
  *   - the batch tokenizes ITSELF (batch-priced work);
  *   - its distinct terms look up the slot-partitioned lexicon and the
  *     slot-partitioned postings through broadcast equijoins — dynamic
  *     partition pruning reads ≤|batch terms| slot directories of each;
  *   - per-(query, doc) totals fold in deterministic term order, so
  *     streamed results are bit-identical to the batch API;
  *   - per-query top-k, through `sink(df, batchId)`.
  *
  * What is cached at stream start: ONLY the one-row corpus stats
  * (n_docs, sum_dl — frozen for the index's life, like the IVF
  * family's centroids). The LEXICON is deliberately not cached: it is
  * vocabulary-sized (the reason the IVF centroid-caching trick does not
  * transfer), and the per-batch pruned lookup touches only the batch's
  * own slots — O(batch terms), not O(vocabulary).
  *
  * `tombstoneAware` re-reads the tombstone set per batch, so a takedown
  * ([[LexQueries.deleteLexDocs]]) stops surfacing on the NEXT
  * micro-batch with no restart; an [[LexQueries.appendLexIndex]] lands
  * on the next micro-batch the same way (the posting read is
  * per-batch). The frozen-stats contract matches the batch serving
  * paths: only a REBUILD (new df/stats) needs a stream restart.
  *
  * Scale (100 TB): per-batch work is O(batch tokenize) + O(matched
  * posting rows for the batch's terms); the index is never scanned
  * whole; state is zero; restart safety is checkpoint + an idempotent
  * sink — the shared foreachBatch contract.
  */
object LexServe {

  /** One micro-batch answered from the index — exposed for direct batch
    * parity testing. Output: (qid, doc_id, n_terms, score, rk).
    *
    * `facetLang` scopes every query to one facet with FILTER-FIRST
    * semantics ([[LexQueries.bm25Filtered]]'s contract, streaming): the
    * allowlist is a partition-pruned read of the `attrs/` sidecar's one
    * lang directory, re-read PER BATCH — like tombstones — so facet
    * rows landed by a concurrent append/ingest scope the very next
    * micro-batch with no restart. */
  private[graft] def serveBatch(spark: SparkSession, batch: DataFrame,
      indexPath: String, statsRow: DataFrame, k: Int,
      tombstoneAware: Boolean, facetLang: Option[String] = None,
      facetSource: Option[String] = None): DataFrame = {
    // both facet axes are attrs partition levels: a lang facet prunes at
    // level 1, a source facet at level 2, a combined predicate at the
    // leaf — one allowlist read either way
    val preds =
      facetLang.map(l => col("lang") === l).toSeq ++
        facetSource.map(s => col("source") === s).toSeq
    LexQueries.queryBatch(spark, batch, indexPath, statsRow, k,
      tombstoneAware, docFilter =
        if (preds.isEmpty) identity
        else df => df.join(
          spark.read.parquet(s"$indexPath/attrs")
            .filter(preds.reduce(_ && _)).select(col("doc_id").as("_facet_doc")),
          df("doc_id") === col("_facet_doc"), "left_semi"))
  }

  /** Start serving `queries` (a STREAMING frame with columns `qid`,
    * `text`) against the persisted lexical index at `indexPath`; each
    * micro-batch's top-k frame goes to `sink` with its batch id. */
  def start(
      spark: SparkSession,
      queries: DataFrame,
      indexPath: String,
      sink: (DataFrame, Long) => Unit,
      checkpointDir: String,
      k: Int = 10,
      availableNow: Boolean = false,
      tombstoneAware: Boolean = false,
      facetLang: Option[String] = None,
      facetSource: Option[String] = None
  ): StreamingQuery = {
    // facet serving needs the attrs sidecar — refuse ONCE at stream
    // start with an actionable message for a standing index built
    // before the sidecar existed (pre-lex-v4), instead of failing every
    // micro-batch with a raw path error from the per-batch read
    if (facetLang.isDefined || facetSource.isDefined) {
      val attrs = new org.apache.hadoop.fs.Path(s"$indexPath/attrs")
      require(attrs.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(attrs),
        s"LexServe --facetLang/--facetSource: no attrs/ sidecar under $indexPath - the " +
          "index predates faceted serving; rebuild it (or append/ingest " +
          "once, which materializes facet rows for the delta) before " +
          "serving with a facet")
    }
    // corpus stats: one frozen row for the index's life — loaded and
    // pinned once, broadcast into every batch's scoring
    val statsRow = LexQueries.loadStats(spark, indexPath).cache()
    statsRow.count()
    val w = queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(serveBatch(batch.sparkSession, batch, indexPath, statsRow, k,
          tombstoneAware, facetLang, facetSource), id)
      }
    // a throwing start() never registers the listener — release the
    // pinned stats row before rethrowing rather than leak it
    val q =
      try (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
      catch { case e: Throwable => statsRow.unpersist(); throw e }
    ServeCache.releaseOnTermination(spark, q)(() => statsRow.unpersist())
    q
  }
}
