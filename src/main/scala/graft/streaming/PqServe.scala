package graft.streaming

import graft.queries.SimilarityQueries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, collect_list, struct}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ANN serving over a PERSISTED IVFPQ index — [[AnnServe]]'s
  * compressed-index twin, and the serving shape a 100 TB deployment
  * actually runs: the standing side is the ~64×-compressed code
  * postings (3 small ints per (vector, subspace)), never raw vectors,
  * so the per-batch candidate read is tiny even when the corpus is
  * not.
  *
  * Reference anchor: the reference is a *streaming* job end to end
  * (StreamingJob.java:119-123 — consume, transform, emit per record);
  * this closes the last batch-only serving gap in the index lifecycle
  * (`ivfpq_ann_served` had the train-once/serve-many path, but only as
  * a batch entry point).
  *
  * Plan per micro-batch (the exact `ivfPqAnnServe` serving plan,
  * driven incrementally):
  *   - coarse centroids AND residual codebooks are loaded ONCE at
  *     stream start and cached — both are frozen for the life of the
  *     index (append encodes against the stored codebooks; only a full
  *     rebuild changes them, and a rebuild restarts the stream);
  *   - the batch routes against the broadcast centroid array (bounded
  *     k, in-row argmax) and explodes to its nprobe probe buckets;
  *   - the batch's ADC distance table is built from the cached
  *     codebooks (O(batch × nprobe × M × Ks) — small side only);
  *   - the code-posting read is gated to the probed buckets of the
  *     bucket-partitioned index; the exact fixed-point ADC sum + top-3
  *     window emit through `sink(df, batchId)`.
  *
  * Scale (100 TB): per-batch work is O(batch × probed-bucket code
  * volume); zero cross-batch state; restart safety = checkpoint +
  * idempotent sink, the same contract as every foreachBatch edge here.
  */
object PqServe {

  /** Start serving `queries` (a STREAMING frame with columns `vec_id`,
    * `embedding`) against the persisted IVFPQ index at `indexPath`
    * ([[SimilarityQueries.buildIvfPqIndex]]'s layout). Each
    * micro-batch's (qid, vid, adist_fp, rn) top-3 frame goes to `sink`
    * with its batch id.
    *
    * `tombstoneAware` re-reads the index's tombstone set per batch
    * (centroids and codebooks stay cached — they are frozen; tombstones
    * are the one piece of index state that legitimately changes under
    * a live stream), so an [[SimilarityQueries.ivfPqIndexDelete]]
    * takedown stops surfacing on the NEXT micro-batch with no
    * restart. */
  /** `facetLabel`/`facetSource` scope every query to one facet (their
    * conjunction when both) with FILTER-FIRST
    * semantics ([[AnnServe]]'s contract, compressed-index form): the
    * allowlist screens the CODE posting rows before the ADC join,
    * re-built per batch like tombstones; a sidecar-less index refuses
    * once at stream start. */
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
        s"PqServe --facetLabel/--facetSource: no attrs/ sidecar under $indexPath - the " +
          "index predates faceted serving; rebuild it (or append/absorb " +
          "once, which materializes facet rows for the delta) before " +
          "serving with a facet")
    }
    // frozen index state, loaded + materialized once per stream start:
    // the one-row routing centroid array, the (pcid, cemb) residual
    // centroid frame, and the residual codebooks — every batch
    // broadcasts these small cached frames
    val centStored = spark.read.parquet(s"$indexPath/centroids")
    val centRow = centStored
      .agg(collect_list(struct(col("cid"), col("cemb"), col("cnrm"))).as("cents"))
      .cache()
    centRow.count()
    val cent = centStored.select(col("cid").as("pcid"), col("cemb")).cache()
    cent.count()
    val cb = spark.read.parquet(s"$indexPath/codebooks").cache()
    cb.count()
    val w = queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(SimilarityQueries.servePqQueryBatch(
          batch.sparkSession, batch, centRow, cent, cb, indexPath, nprobe,
          tombstoneAware,
          docFilter = SimilarityQueries.facetPostingsFilter(
            batch.sparkSession, indexPath, facetLabel, facetSource)), id)
      }
    // a throwing start() never registers the listener — release the
    // cached frames before rethrowing rather than leak them
    val q =
      try (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
      catch {
        case e: Throwable =>
          centRow.unpersist(); cent.unpersist(); cb.unpersist()
          throw e
      }
    ServeCache.releaseOnTermination(spark, q) { () =>
      centRow.unpersist(); cent.unpersist(); cb.unpersist()
    }
    q
  }
}
