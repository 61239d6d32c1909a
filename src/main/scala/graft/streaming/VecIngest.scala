package graft.streaming

import graft.queries.SimilarityQueries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming vector INGEST into a persisted IVF index — the write-side
  * twin of [[AnnServe]]: an embedding firehose arrives as a stream and
  * every micro-batch lands in the bucket-partitioned index, servable on
  * the next serving micro-batch (the append-during-serve contract
  * StreamingSpec pins).
  *
  * Plan per micro-batch ([[SimilarityQueries.appendIvfIndex]]'s routing,
  * driven incrementally):
  *   - the stored centroids load ONCE at stream start and stay cached
  *     (frozen for the index's life — the same contract as serving;
  *     only a retrain/rebuild changes what buckets MEAN, and that
  *     requires a stream restart by design);
  *   - the batch routes in-row against the broadcast centroid array
  *     (bounded k, zero shuffle) and writes per-bucket posting files
  *     plus the (vec_id, bucket) idmap sidecar rows — O(batch) work,
  *     no standing read, append-only storage.
  *
  * EXACTLY-ONCE under foreachBatch redelivery, which a plain
  * `mode("append")` cannot give (a replayed batch would duplicate
  * posting rows, and a duplicated vector occupies two top-k slots at
  * serve time — not a benign direction). The batch commit is a staged
  * promote:
  *
  *   1. route + write the batch under `_staging/<batchId>/` (postings
  *      partitioned by bucket, idmap rows beside them), then mark the
  *      staging write complete (`_STAGED`). A crash mid-write leaves no
  *      `_STAGED`: the replay deletes and rewrites the staging from
  *      scratch — nothing standing was touched.
  *   2. PROMOTE: every staged file moves into its standing directory
  *      under a deterministic name derived from the batch id and the
  *      SOURCE file name (`ingest-<id>-<srcName>`). A crash mid-promote
  *      replays into the idempotent half: a target that already exists
  *      IS this exact file already moved (staging is never rewritten
  *      after `_STAGED`, so names are stable) and is skipped.
  *   3. write the commit marker (`_ingest_commits/<id>`), then clear the
  *      staging tree. A batch whose marker exists returns immediately.
  *
  * Scale (100 TB): per-batch cost is routing (in-row against ≤ IvfK
  * centroids) + one staged write + O(files-in-batch) renames — renames
  * are metadata ops on any hierarchical store. Nothing reads the
  * standing postings, the corpus, or the sidecar; ingest cost tracks
  * the FIREHOSE, never the index. */
object VecIngest {

  /** Start ingesting `vectors` (a STREAMING frame with columns `vec_id`,
    * `embedding`) into the persisted index at `indexPath`. */
  def start(
      spark: SparkSession,
      vectors: DataFrame,
      indexPath: String,
      checkpointDir: String,
      availableNow: Boolean = false
  ): StreamingQuery = {
    val centRow = SimilarityQueries.loadCentRow(spark, indexPath).cache()
    centRow.count()
    val w = vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestBatch(batch.sparkSession, batch, centRow, indexPath, id)
      }
    // a throwing start() never registers the listener — release the
    // centroid cache before rethrowing rather than leak it
    val q =
      try (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
      catch { case e: Throwable => centRow.unpersist(); throw e }
    ServeCache.releaseOnTermination(spark, q)(() => centRow.unpersist())
    q
  }

  /** One micro-batch's staged-promote commit — idempotent per
    * (indexPath, batchId); exposed for the replay/crash-window specs. */
  private[graft] def ingestBatch(spark: SparkSession, batch: DataFrame,
      centRow: DataFrame, indexPath: String, batchId: Long): Unit =
    StagedCommit.run(spark, indexPath, batchId, "VecIngest.ingestBatch",
        trees = Seq("postings", "idmap", "attrs")) { staging =>
      // repartition ON THE BUCKET before the staged write: one file per
      // touched bucket instead of (partitions × buckets) shards — fewer
      // renames per commit, and (the 100 TB point) a long-running ingest
      // adds O(touched buckets) standing posting files per batch, not
      // O(parallelism × buckets); the shuffle is batch-sized, trivial
      val asn = SimilarityQueries.routeIngestBatch(batch, centRow)
        .repartition(col("bucket"))
        .persist() // routed once; postings and idmap writes both consume it
      try {
        asn.write.partitionBy("bucket").mode("overwrite")
          .parquet(new Path(staging, "postings").toString)
        asn.select(col("vec_id"), col("bucket").cast("long").as("bucket"))
          .coalesce(1) // two longs per vector — one sidecar file per batch
          .write.mode("overwrite").parquet(new Path(staging, "idmap").toString)
        // facet sidecar rides the same exactly-once commit: one thin row
        // per vector into its (label, source) leaf (attribute-less
        // streams land honestly in `-1`/`unk`, never silently facet-less)
        SimilarityQueries.vecAttrsRows(batch)
          .repartition(col("label"), col("source"))
          .write.partitionBy(SimilarityQueries.VecAttrsPartCols: _*)
          .mode("overwrite")
          .parquet(new Path(staging, "attrs").toString)
      } finally { asn.unpersist(); () }
    }
}
