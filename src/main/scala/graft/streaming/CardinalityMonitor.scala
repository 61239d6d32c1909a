package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming approximate-cardinality monitor — the streaming twin of the
  * batch `approx_stats` sketch query
  * ([[graft.queries.AnalyticsQueries.approxStats]]): per (series,
  * 10-minute event-time window), the distinct-user estimate from a
  * DataSketches HLL sketch (`hll_sketch_agg`), finalized by the
  * watermark for append output. The live "how many distinct
  * users/documents did this feed carry in the last window" gauge a
  * volume count ([[AnomalyDetect.scoreVolumes]]) cannot give: replayed
  * or fanned-out records inflate counts but not cardinality.
  *
  * Why a SKETCH aggregation and not `dropDuplicates` + count: exact
  * streaming distinct keeps O(distinct keys) state per window;
  * the HLL register array is a few KB per (series, window) REGARDLESS of
  * cardinality, and register-max merging is associative, commutative,
  * and order-independent — partial sketches fold map-side inside each
  * micro-batch and merge across batches in the windowed aggregation
  * state, so stream and batch over the same rows produce the IDENTICAL
  * sketch and therefore the identical estimate (StatefulSpec asserts
  * exact equality, not a tolerance).
  *
  * Scale (100 TB): state is (series × open windows) sketches — bounded
  * by the watermark horizon, never by event or user count; the same
  * register state unions across days/shards (`hll_union_agg`) without
  * re-reading events, which is why production cardinality pipelines
  * store sketches, not counts. Estimates are exact while the sketch is
  * in sparse mode (small true cardinality), within ~1.6%/√(2^lgK) once
  * dense.
  */
object CardinalityMonitor {

  /** Window width — 10 minutes, the bucket the batch time-series family
    * (`hourly_rollup`'s finer twin, `anomaly_zscore`, `series_rate`)
    * already standardizes on. */
  val BucketMs = 600000L

  /** The shared aggregation: one windowed HLL per (series, bucket).
    * Expects an `event_time` timestamp column (watermarked upstream in
    * the streaming form) beside `event_type` and `user_id`. */
  private def bucketed(df: DataFrame): DataFrame =
    df.groupBy(col("event_type"),
        window(col("event_time"), "10 minutes").as("w"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("approx_users"))
      .select(col("event_type"),
        expr(s"unix_millis(w.start) DIV $BucketMs").as("bucket"),
        col("approx_users"))

  /** Monitor a raw event stream `(event_type, event_ms, user_id)`. The
    * watermark finalizes a window once event time passes its end +
    * delay; finalized rows append exactly once. */
  def distinctUsers(
      ds: Dataset[(String, Long, Long)],
      watermarkDelay: String = "10 seconds"): DataFrame =
    bucketed(ds.toDF("event_type", "event_ms", "user_id")
      .withColumn("event_time", timestamp_millis(col("event_ms")))
      .withWatermark("event_time", watermarkDelay))

  /** Batch twin over the same `(event_type, event_ms, user_id)` frame —
    * the identical sketch chain minus the watermark, for parity proofs
    * and backfills. */
  def distinctUsersBatch(df: DataFrame): DataFrame =
    bucketed(df.withColumn("event_time", timestamp_millis(col("event_ms"))))
}
