package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Streaming moment-profile monitor — the streaming twin of the batch
  * incremental-stats maintenance
  * ([[graft.queries.AnalyticsQueries.incrementalStats]]): per
  * (series, 10-minute event-time window), the SAME mergeable moment
  * state {n, Σq, min, max, Σq²} the batch IVM path persists per day,
  * finalized by the watermark, with mean and population variance
  * derived per emitted row. The live per-window profile a drift or
  * alerting consumer reads — and because every component is an
  * associative, commutative, order-independent integer fold, a stream
  * split across any micro-batching produces BIT-IDENTICAL rows to the
  * batch twin over the same data (StatefulSpec asserts set equality,
  * not tolerance — the same discipline as [[CardinalityMonitor]]).
  *
  * Values centi-quantize to BIGINT exactly as in the batch query; the
  * variance cross product n·Σq² − (Σq)² runs in DECIMAL(38,0) on the
  * finalized window's few BIGINTs.
  *
  * Scale (100 TB/day of stream): state is 5 longs per (series, open
  * window) — bounded by the watermark horizon, never by event count;
  * partial moments fold map-side within each micro-batch before
  * touching state, so per-batch state traffic is O(series × open
  * windows), not O(events).
  */
object StatsMonitor {

  /** Window width — 10 minutes, the time-series family's bucket. */
  val BucketMs = 600000L

  private val D38 = DecimalType(38, 0)

  /** The shared windowed moment fold + derived stats. Expects
    * `event_type`, a (watermarked, in the streaming form) `event_time`
    * timestamp, and the raw double `value`. */
  private def bucketed(df: DataFrame): DataFrame =
    df.withColumn("qv", floor(col("value") * lit(100.0)).cast("long"))
      .groupBy(col("event_type"),
        window(col("event_time"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"), sum(col("qv")).as("s"),
        min(col("qv")).as("mn"), max(col("qv")).as("mx"),
        sum(col("qv") * col("qv")).as("sq"))
      .select(col("event_type"),
        expr(s"unix_millis(w.start) DIV $BucketMs").as("bucket"),
        col("n"),
        (col("s").cast("double") / col("n").cast("double") / lit(100.0)).as("mean"),
        (col("mn").cast("double") / lit(100.0)).as("vmin"),
        (col("mx").cast("double") / lit(100.0)).as("vmax"),
        ((col("n").cast(D38) * col("sq").cast(D38) -
          col("s").cast(D38) * col("s").cast(D38)).cast("double")
          / (col("n").cast("double") * col("n").cast("double"))
          / lit(10000.0)).as("variance"))

  /** Monitor a raw `(event_type, event_ms, value)` stream. The
    * watermark finalizes a window once event time passes its end +
    * delay; finalized rows append exactly once. */
  def profile(
      ds: Dataset[(String, Long, Double)],
      watermarkDelay: String = "10 seconds"): DataFrame =
    bucketed(ds.toDF("event_type", "event_ms", "value")
      .withColumn("event_time", timestamp_millis(col("event_ms")))
      .withWatermark("event_time", watermarkDelay))

  /** Batch twin over the same `(event_type, event_ms, value)` frame —
    * the identical fold minus the watermark, for parity proofs and
    * backfills. */
  def profileBatch(df: DataFrame): DataFrame =
    bucketed(df.withColumn("event_time", timestamp_millis(col("event_ms"))))
}
