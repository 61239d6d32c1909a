package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming CDC upsert sink — MERGE INTO semantics (SCD type 1,
  * last-writer-wins) applied per micro-batch against a key-bucketed
  * parquet table: the streaming twin of the batch `upsert_merge` query,
  * completing the reference sink's upsert story (Timestream upserts
  * records with identical time + dimensions, the latest version wins —
  * `TimestreamSink.java:72-125` only ever had at-least-once append).
  *
  * Design, per micro-batch:
  *
  *   1. elect the batch's per-key latest — `max(struct(version…,
  *      value…))`, the mergeable argmax `upsert_merge` proves against
  *      the DuckDB oracle: struct comparison is lexicographic, so the
  *      version columns (e.g. timestamp, then a unique event id as the
  *      deterministic tie-break) order writers totally
  *   2. bucket keys with `pmod(xxhash64(key…), nBuckets)` — the bucket
  *      is the table's PARTITION column, so the merge reads and
  *      rewrites ONLY the buckets the batch touches (dynamic partition
  *      overwrite); untouched buckets' files are never opened
  *   3. union standing (touched buckets only) with the delta,
  *      re-elect per key with the same argmax, overwrite those buckets
  *
  * Idempotence is by ALGEBRA, not bookkeeping: the merge is a
  * semilattice fold (max over a total order), so re-applying any
  * replayed batch — foreachBatch's at-least-once contract after a
  * restart — converges to the same state; no batch-id marker needed
  * for correctness. A crash mid-overwrite can leave a torn bucket
  * directory, which the next replay of that batch repairs by
  * rewriting the same buckets from standing ∪ delta.
  *
  * Scale (100 TB): per-batch cost is O(delta) + O(touched buckets),
  * never O(corpus) — the copy-on-write unit is the bucket, so size
  * `nBuckets` for the target state size (state_bytes / nBuckets ≈ the
  * rewrite granularity you can afford per batch). The election and
  * merge aggregations are map-side combinable on the same key, and the
  * standing read is partition-pruned by the touched-bucket filter.
  */
final class UpsertSink(
    path: String,
    keyCols: Seq[String],
    versionCols: Seq[String],
    valueCols: Seq[String],
    nBuckets: Int = 32) {
  require(keyCols.nonEmpty && versionCols.nonEmpty, "UpsertSink needs key and version columns")

  private val stateCols = versionCols ++ valueCols

  private def kb: Column =
    pmod(xxhash64(keyCols.map(col): _*), lit(nBuckets.toLong))

  /** Per-key last-writer election over `df` — the shared argmax both
    * the batch delta and the standing-merge pass run, so the two can't
    * diverge. */
  private def elect(df: DataFrame): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(max(struct(stateCols.map(col): _*)).as("_st"))
      .select(keyCols.map(col) ++ stateCols.map(c => col(s"_st.$c").as(c)): _*)

  private def stateExists(spark: SparkSession): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.startsWith("kb="))
  }

  /** Apply one micro-batch of changelog rows. Exposed for direct batch
    * testing (foreachBatch hands it the same frame). */
  def merge(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = elect(batch).withColumn("kb", kb).localCheckpoint()
    // touched buckets: bounded by nBuckets — but nBuckets is caller
    // config, so admit the collect LOUDLY (the lex edge's MaxBatchTerms
    // stance) instead of trusting every deployment to keep it sane
    require(nBuckets <= UpsertSink.MaxCollectableBuckets,
      s"UpsertSink: nBuckets=$nBuckets exceeds " +
        s"${UpsertSink.MaxCollectableBuckets} - the touched-bucket set " +
        "collects to the driver per batch; use fewer, larger buckets " +
        "(the copy-on-write unit should be sized in MBs, not rows) or " +
        "raise MaxCollectableBuckets deliberately")
    val touched = delta.select(col("kb")).distinct().collect().map(_.getLong(0))
    if (touched.nonEmpty) {
      val merged =
        if (stateExists(spark)) {
          val standing = spark.read.parquet(path)
            // partition filter: only the touched buckets' directories
            .filter(col("kb").isin(touched: _*))
            .select(delta.columns.map(col): _*)
          elect(standing.unionByName(delta)).withColumn("kb", kb)
        } else delta
      // localCheckpoint cuts the read-path lineage so the overwrite of
      // the directory being read is legal (and the merge computes once)
      merged.localCheckpoint()
        .write.mode("overwrite")
        .partitionBy("kb")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    }
  }

  /** Current merged state. */
  def state(spark: SparkSession): DataFrame =
    spark.read.parquet(path).select((keyCols ++ stateCols).map(col): _*)

  /** Attach the sink to a streaming changelog. */
  def start(changelog: DataFrame, checkpointDir: String,
      availableNow: Boolean = false): StreamingQuery = {
    val w = changelog.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((df: DataFrame, id: Long) => merge(df, id))
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }
}

object UpsertSink {
  /** Driver-side ceiling on the per-batch touched-bucket collect —
    * 1M longs ≈ 8 MB, far past any sane bucketing (the bucket is the
    * COPY-ON-WRITE unit; a million of them means per-batch rewrites
    * are already metadata-bound) but a hard stop before a pathological
    * config turns the bookkeeping collect into a driver OOM. */
  val MaxCollectableBuckets: Int = 1 << 20
}
