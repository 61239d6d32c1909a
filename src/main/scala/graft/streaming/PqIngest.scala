package graft.streaming

import graft.queries.SimilarityQueries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming vector ingest into a persisted IVFPQ index —
  * [[VecIngest]]'s compressed-index twin, completing write-edge symmetry
  * for the index a 100 TB deployment actually serves from: an embedding
  * firehose arrives as a stream, every micro-batch routes against the
  * frozen coarse centroids, residual-encodes with the frozen codebooks
  * (3 small ints per (vector, subspace) land on disk — never the raw
  * vector), and appends bucket-partitioned CODE postings plus the
  * (vec_id, bucket) idmap sidecar, servable by a concurrent
  * `--mode serve --family ivfpq` on its next micro-batch.
  *
  * Frozen state cached ONCE at stream start (the [[PqServe]] contract,
  * write-side): the one-row routing centroid array, the (cid, cemb)
  * residual-centroid frame, and the codebooks. Only a retrain changes
  * what buckets/codes MEAN, and that requires a stream restart by
  * design.
  *
  * EXACTLY-ONCE per micro-batch via the shared [[StagedCommit]]
  * staged-promote protocol — a replayed batch must not duplicate code
  * rows (M duplicated rows per vector would corrupt ADC scoring, which
  * groups a vector's M codes).
  *
  * Scale (100 TB): per-batch cost is routing + M-subspace encoding
  * (in-row against broadcast frames) + one staged write + O(touched
  * buckets) renames. Nothing reads the standing postings or the corpus;
  * ingest cost tracks the FIREHOSE, never the index. */
object PqIngest {

  /** Start ingesting `vectors` (a STREAMING frame with columns `vec_id`,
    * `embedding`) into the persisted IVFPQ index at `indexPath`. */
  def start(
      spark: SparkSession,
      vectors: DataFrame,
      indexPath: String,
      checkpointDir: String,
      availableNow: Boolean = false
  ): StreamingQuery = {
    val centStored0 = spark.read.parquet(s"$indexPath/centroids")
    val centRow = centStored0
      .agg(collect_list(struct(col("cid"), col("cemb"), col("cnrm"))).as("cents"))
      .cache()
    centRow.count()
    val centStored = centStored0.select(col("cid"), col("cemb")).cache()
    centStored.count()
    val cbStored = spark.read.parquet(s"$indexPath/codebooks").cache()
    cbStored.count()
    val w = vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ingestBatch(batch.sparkSession, batch, centRow, centStored, cbStored,
          indexPath, id)
      }
    // If start() itself throws (bad checkpoint dir, …) the termination
    // listener is never registered — release the caches before rethrowing
    // so a failed start can't leak them for the session's life.
    val q =
      try (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
      catch {
        case e: Throwable =>
          centRow.unpersist(); centStored.unpersist(); cbStored.unpersist()
          throw e
      }
    ServeCache.releaseOnTermination(spark, q) { () =>
      centRow.unpersist(); centStored.unpersist(); cbStored.unpersist(); ()
    }
    q
  }

  /** One micro-batch's staged-promote commit — idempotent per
    * (indexPath, batchId); exposed for the replay specs. */
  private[graft] def ingestBatch(spark: SparkSession, batch: DataFrame,
      centRow: DataFrame, centStored: DataFrame, cbStored: DataFrame,
      indexPath: String, batchId: Long): Unit =
    StagedCommit.run(spark, indexPath, batchId, "PqIngest.ingestBatch",
        trees = Seq("postings", "idmap", "attrs")) { staging =>
      val (codes0, asn0) = SimilarityQueries.pqEncodeBatch(
        batch, centRow, centStored, cbStored)
      // persist the ROUTING once (the VecIngest discipline): the code
      // write consumes it through the encode joins and the idmap write
      // directly — without the cache, routing would run a second full
      // pass over every micro-batch
      val asn = asn0.persist()
      // one file per touched bucket, same discipline as VecIngest
      val codes = codes0.repartition(col("bucket")).persist()
      try {
        codes.write.partitionBy("bucket").mode("overwrite")
          .parquet(new Path(staging, "postings").toString)
        asn.select(col("vec_id"), col("bucket").cast("long").as("bucket"))
          .coalesce(1)
          .write.mode("overwrite").parquet(new Path(staging, "idmap").toString)
        // facet sidecar rides the same exactly-once commit (the VecIngest
        // contract: label-less streams land honestly in `-1`)
        SimilarityQueries.vecAttrsRows(batch)
          .repartition(col("label"), col("source"))
          .write.partitionBy(SimilarityQueries.VecAttrsPartCols: _*)
          .mode("overwrite")
          .parquet(new Path(staging, "attrs").toString)
      } finally { codes.unpersist(); asn.unpersist(); () }
    }
}
