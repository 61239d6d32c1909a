package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor — the production form of the
  * batch `dist_drift` query ([[graft.queries.AnalyticsQueries.distDrift]]):
  * the batch query splits ONE bounded corpus at its time midpoint; a
  * live pipeline instead freezes a REFERENCE histogram (from a trusted
  * batch window) and scores every 10-minute event-time window of the
  * stream against it — the alarm that fires while the feed is drifting,
  * not at the end of the day.
  *
  * Semantics per (series, window): both histograms live on the
  * reference's fixed 10-bin grid (live values outside the reference
  * range clamp into the edge bins — a brand-new value regime piles up
  * in bin 0/9 and scores maximal drift, exactly what the alarm wants);
  * drift is the L1 distance between the normalized histograms in the
  * same exact rational form as the batch query: `Σ|c_b·R − r_b·C|` in
  * BIGINTs with ONE terminal IEEE division by `C·R`.
  *
  * Plan shape: the reference is a ≤(series)-row broadcast joined onto
  * the stream BEFORE aggregation (its grid defines the bin; its counts
  * ride along as grouping-constant columns), so the whole monitor is
  * one watermarked windowed aggregation emitting 10 conditional sums —
  * no custom state, no second stateful operator, append-finalized by
  * the watermark. State is (series × open windows) × 10 longs.
  * Series absent from the reference drop at the join: scoring drift
  * against nothing is undefined — refresh the reference to admit them.
  */
object DriftMonitor {

  val Bins = 10
  val BucketMs = 600000L

  private def binCol: Column =
    expr(s"least(greatest(((q - q0) * $Bins) DIV (q1 - q0 + 1), 0), ${Bins - 1})")

  private def binSums(prefix: String): Seq[Column] =
    (0 until Bins).map(b =>
      sum(when(col("bin") === b, 1L).otherwise(0L)).as(s"$prefix$b"))

  /** Freeze the per-series reference from a batch `(event_type, value)`
    * frame: the bin grid (q0, q1 over 10⁻³-quantized values) and the
    * 10-bin histogram with its total. */
  def referenceHistogram(events: DataFrame): DataFrame = {
    val q = events.select(col("event_type"),
      expr("CAST(floor(value * 1000.0) AS BIGINT)").as("q"))
    val grid = q.groupBy(col("event_type"))
      .agg(min(col("q")).as("q0"), max(col("q")).as("q1"))
    val aggs = binSums("r") :+ count(lit(1)).as("rn")
    q.join(broadcast(grid), "event_type")
      .withColumn("bin", binCol)
      .groupBy(col("event_type"), col("q0"), col("q1"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The shared window-scoring chain (stream and batch twin): expects
    * `event_time`, `value`, plus the joined reference columns. */
  private def scored(df: DataFrame): DataFrame = {
    val refCols = (0 until Bins).map(b => col(s"r$b")) :+ col("rn")
    val keyCols = Seq(col("event_type"),
      window(col("event_time"), "10 minutes").as("w"),
      col("q0"), col("q1")) ++ refCols
    val l1num = (0 until Bins)
      .map(b => abs(col(s"c$b") * col("rn") - col(s"r$b") * col("cn")))
      .reduce(_ + _)
    val aggs = binSums("c") :+ count(lit(1)).as("cn")
    df.withColumn("q", expr("CAST(floor(value * 1000.0) AS BIGINT)"))
      .withColumn("bin", binCol)
      .groupBy(keyCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(col("event_type"),
        expr(s"unix_millis(w.start) DIV $BucketMs").as("bucket"),
        col("cn").as("n_window"), col("rn").as("n_ref"),
        (l1num.cast("double") / (col("cn") * col("rn")).cast("double")).as("l1_drift"))
  }

  /** Score a raw event stream `(event_type, event_ms, value)` against the
    * frozen reference. Append mode: a window's drift emits once, when the
    * watermark passes its end. */
  def scoreDrift(
      ds: Dataset[(String, Long, Double)],
      reference: DataFrame,
      watermarkDelay: String = "10 seconds"): DataFrame =
    scored(ds.toDF("event_type", "event_ms", "value")
      .withColumn("event_time", timestamp_millis(col("event_ms")))
      .withWatermark("event_time", watermarkDelay)
      .join(broadcast(reference), "event_type"))

  /** Batch twin over the same `(event_type, event_ms, value)` frame —
    * identical chain minus the watermark, for parity proofs and
    * reference-period self-scoring. */
  def scoreDriftBatch(df: DataFrame, reference: DataFrame): DataFrame =
    scored(df
      .withColumn("event_time", timestamp_millis(col("event_ms")))
      .join(broadcast(reference), "event_type"))
}
