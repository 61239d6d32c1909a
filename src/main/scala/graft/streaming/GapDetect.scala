package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming dead-series detection — the alarm [[graft.queries.AnalyticsQueries.gapFill]]
  * can only raise after the fact: a batch query sees a gap once data
  * RESUMES; an operations team needs the alert DURING the silence. The
  * reference's Timestream consumers poll dashboards for exactly this
  * (SURVEY §1 — operational monitoring is the pipeline's stated
  * purpose); this operator closes the loop in-engine with EVENT-TIME
  * TIMERS: each series re-arms a timer `threshold` buckets past its
  * latest bucket, and if the watermark (driven by the other, live
  * series) passes that expiry with no newer data, the silence itself
  * emits a row.
  *
  * Alarm semantics: one alarm per silence — the timer is not re-armed
  * on expiry, so a dead series alarms once and stays quiet until
  * traffic resumes (which re-arms it). `threshold_crossed_bucket` is
  * the bucket at which the silence CROSSED the threshold
  * (`last_bucket + threshold`; the first silent bucket is
  * `last_bucket + 1`), derived from the timer's own expiry timestamp,
  * so the emitted row is deterministic regardless of where the
  * watermark exactly stands when the timer fires.
  *
  * Scale (100 TB): state is ONE Long plus ONE registered timer per
  * series — O(series) — on the RocksDB store `transformWithState`
  * requires; timers live in the state store and hash-partition with
  * their key, so expiry scans are per-partition, never global. */
object GapDetect {

  /** 10-minute buckets, as everywhere in the time-series family. */
  val BucketMs = 600000L

  final case class Gap(event_type: String, last_bucket: Long, threshold_crossed_bucket: Long)

  /** Timer expiry for a series whose latest bucket is `b`: the end of
    * bucket `b + threshold` in event-time ms. */
  private def expiryMs(b: Long, thresholdBuckets: Int): Long =
    (b + 1 + thresholdBuckets) * BucketMs

  /** Keyed state: the series' latest bucket. Exactly one timer is armed
    * per series — re-armed (delete stale + register) on every arrival. */
  class GapProcessor(thresholdBuckets: Int)
      extends StatefulProcessor[String, (String, Long, Double, java.sql.Timestamp), Gap] {
    @transient private var last: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[Long](
        "last", Encoders.scalaLong, org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long, Double, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[Gap] = {
      val maxBucket = rows.map(_._2).max
      val prev = if (last.exists()) Some(last.get()) else None
      val newLast = prev.fold(maxBucket)(math.max(_, maxBucket))
      prev.foreach(p => getHandle.deleteTimer(expiryMs(p, thresholdBuckets)))
      getHandle.registerTimer(expiryMs(newLast, thresholdBuckets))
      last.update(newLast)
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: String,
        timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Gap] = {
      // derive the crossing bucket from the timer itself — watermark
      // position at fire time does not enter the emitted row
      val crossed = expiredTimerInfo.getExpiryTimeInMs() / BucketMs - 1
      Iterator.single(Gap(key, last.get(), crossed))
    }
  }

  /** Watch a finalized bucket-mean stream `(series, bucket, mean)` and
    * emit one [[Gap]] per series per silence of more than
    * `thresholdBuckets` buckets. Event-time: the bucket's end timestamp
    * carries the watermark, so a series is judged silent by the STREAM's
    * progress, not the wall clock — replays and backfills behave
    * identically to live runs. */
  def detectGaps(
      ds: Dataset[(String, Long, Double)],
      thresholdBuckets: Int): Dataset[Gap] = {
    import ds.sparkSession.implicits._
    ds.toDF("event_type", "b", "mv")
      .withColumn("event_time", timestamp_millis((col("b") + 1) * lit(BucketMs) - 1))
      .withWatermark("event_time", "0 seconds")
      .as[(String, Long, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(
        new GapProcessor(thresholdBuckets), TimeMode.EventTime(), OutputMode.Append())
  }
}
