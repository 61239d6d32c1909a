package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming per-series rate of change — the alerting form of the batch
  * [[graft.queries.AnalyticsQueries.seriesRate]] query (Timestream's
  * DERIVATIVE/RATE family on the live stream): each finalized bucket
  * mean emits its delta against the series' PREVIOUS bucket divided by
  * the TRUE elapsed seconds, so sparse series divide by real time, not
  * the nominal bucket width.
  *
  * Input and ordering contract are [[AnomalyDetect]]'s: the finalized
  * per-(series, bucket) mean frame in non-decreasing bucket order per
  * series (Append-mode watermarked windows deliver exactly that; within
  * a micro-batch the processor sorts).
  *
  * Exactness: identical to the batch query — (mv − prev) is one IEEE
  * subtraction of identical doubles and the divisor `(Δb)·600` is exact
  * in double far below 2⁵³, so no quantization is needed (a lag touches
  * ONE value; frame-sum order never enters). StatefulSpec asserts
  * stream == batch exactly, rate doubles included.
  *
  * Scale (100 TB): state is ONE (bucket, mean) pair per series —
  * O(series), never O(events) — on the RocksDB store
  * `transformWithState` requires; series hash-partition across
  * executors exactly like the batch lag window's partitionBy. */
object RateMonitor {

  final case class Rate(
      event_type: String, bucket: Long, mv: Double, rate_per_sec: Double)

  /** Keyed state: the last seen (bucket, mean). The first bucket of a
    * series has no predecessor and emits nothing, as in every rate()
    * implementation (and the batch query's `pm IS NOT NULL` filter). */
  class RateProcessor
      extends StatefulProcessor[String, (String, Long, Double), Rate] {
    @transient private var last: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[(Long, Double)](
        "last", Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long, Double)],
        timerValues: TimerValues): Iterator[Rate] = {
      var prev: Option[(Long, Double)] = Option(last.get())
      val out = Array.newBuilder[Rate]
      rows.toArray.sortBy(_._2).foreach { case (_, bucket, mv) =>
        prev.foreach { case (pb, pm) =>
          out += Rate(key, bucket, mv, (mv - pm) / ((bucket - pb).toDouble * 600.0))
        }
        prev = Some((bucket, mv))
      }
      prev.foreach(last.update)
      out.result().iterator
    }
  }

  /** Rate a finalized bucket-mean stream `(series, bucket, mean)`.
    * TimeMode.None: no timers — an idle series holds its last bucket
    * until traffic resumes, then rates against it over the full gap. */
  def rateBuckets(ds: Dataset[(String, Long, Double)]): Dataset[Rate] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new RateProcessor, TimeMode.None(), OutputMode.Append())
  }
}
