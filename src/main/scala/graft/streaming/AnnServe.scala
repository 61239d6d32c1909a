package graft.streaming

import graft.queries.SimilarityQueries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ANN serving over a PERSISTED IVF index — the production
  * shape the index lifecycle (build → append → serve → retire) exists
  * for: query vectors arrive as a stream, every micro-batch is routed
  * and answered online.
  *
  * Reference anchor: the reference is a *streaming* job end to end
  * (StreamingJob.java:119-123 — consume, transform, emit per record);
  * this gives the ANN family the same always-on edge instead of
  * batch-only entry points.
  *
  * Plan per micro-batch (the exact `annIvfServe` serving plan, driven
  * incrementally):
  *   - the stored centroids are loaded ONCE at stream start and cached —
  *     they are frozen for the life of the index, so no batch re-reads
  *     them (the one-row centroid-array frame broadcasts to the batch);
  *   - the batch's queries rank the broadcast centroid array in-row
  *     (bounded k, no shuffle) and explode to their nprobe probe buckets;
  *   - the posting read is gated by the probed bucket set — dynamic
  *     partition pruning reads only those directories of the
  *     bucket-partitioned index, never the corpus;
  *   - per-query top-3 window, emitted through `sink(df, batchId)`.
  *
  * Scale (100 TB): per-batch work is O(batch × nprobe-bucket-volume).
  * The index is never scanned whole, state is zero (every batch is
  * independent — retrieval has no cross-batch semantics), and the
  * centroid cache is ≤ IvfK rows. Restart safety comes from the
  * checkpoint (source offsets) + an idempotent sink, same contract as
  * every other foreachBatch edge here.
  */
object AnnServe {

  /** Start serving `queries` (a STREAMING frame with columns `vec_id`,
    * `embedding`) against the persisted index at `indexPath`. Each
    * micro-batch's top-3 result frame (qid, vid, cos) goes to `sink`
    * with its batch id.
    *
    * `tombstoneAware` re-reads the index's tombstone set per batch
    * (centroids stay cached — they are frozen; tombstones are the one
    * piece of index state that legitimately changes under a live
    * stream), so a takedown (`ivfIndexDelete`) stops surfacing on the
    * NEXT micro-batch with no stream restart — the online half of the
    * retire lifecycle.
    *
    * Append-during-serve contract (StreamingSpec pins it): the POSTING
    * read is per-batch, so an `ivfIndexAppend` lands on the next
    * micro-batch with no restart, and the streamed results equal the
    * batch served query over the appended index. The CENTROIDS are
    * frozen for the life of the stream by design — append routes new
    * vectors through the same stored centroids, so the cached copy is
    * never stale with respect to routing; only a full REBUILD (new
    * centroids) requires a stream restart, because a rebuild changes
    * what the posting buckets MEAN. */
  /** `facetLabel`/`facetSource` scope every query to one facet (their
    * conjunction when both) with FILTER-FIRST
    * semantics ([[SimilarityQueries.filteredAnnServed]]'s contract,
    * streaming): the allowlist is a partition-pruned read of the
    * `attrs/` sidecar's one label directory, re-built PER BATCH — like
    * tombstones — so facet rows landed by a concurrent append/ingest
    * scope the very next micro-batch with no restart. An index without
    * the sidecar refuses ONCE at stream start with an actionable
    * message instead of failing every micro-batch. */
  def start(
      spark: SparkSession,
      queries: DataFrame,
      indexPath: String,
      sink: (DataFrame, Long) => Unit,
      checkpointDir: String,
      nprobe: Int = SimilarityQueries.IvfNprobe,
      availableNow: Boolean = false,
      tombstoneAware: Boolean = false,
      facetLabel: Option[Long] = None,
      facetSource: Option[String] = None
  ): StreamingQuery = {
    if (facetLabel.isDefined || facetSource.isDefined) {
      val attrs = new org.apache.hadoop.fs.Path(s"$indexPath/attrs")
      require(attrs.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(attrs),
        s"AnnServe --facetLabel/--facetSource: no attrs/ sidecar under $indexPath - the " +
          "index predates faceted serving; rebuild it (or append/absorb " +
          "once, which materializes facet rows for the delta) before " +
          "serving with a facet")
    }
    // centroids: loaded + materialized once per stream start (frozen for
    // the index's life); every batch broadcasts this one-row frame
    val centRow = SimilarityQueries.loadCentRow(spark, indexPath).cache()
    centRow.count()
    val w = queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(SimilarityQueries.serveQueryBatch(
          batch.sparkSession, batch, centRow, indexPath, nprobe,
          tombstoneAware,
          // the allowlist plan is built per batch — a fresh file listing,
          // so appended facet rows land next micro-batch like tombstones
          docFilter = SimilarityQueries.facetPostingsFilter(
            batch.sparkSession, indexPath, facetLabel, facetSource)), id)
      }
    // a throwing start() never registers the listener — release the
    // centroid cache before rethrowing rather than leak it
    val q =
      try (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
      catch { case e: Throwable => centRow.unpersist(); throw e }
    // release the centroid cache when THIS query terminates (see
    // ServeCache for the idempotence/race contract)
    ServeCache.releaseOnTermination(spark, q)(() => centRow.unpersist())
    q
  }
}
