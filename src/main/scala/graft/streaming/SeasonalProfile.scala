package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** Streaming hour-of-day profile anomaly detection — the ONLINE twin of
  * the batch [[graft.queries.AnalyticsQueries.seasonalAnomaly]] query:
  * each arriving bucket mean is scored against the running profile of
  * its own (series, hour-of-day) cell, then folded into it. Where the
  * batch query scores against the COMPLETE profile (every observation,
  * past and future), the streaming form is prequential — test on the
  * profile so far, then train on the row — the standard online-learning
  * evaluation, and the only causal option on a live stream. Warmup and
  * flat-profile guards match the batch query (n ≥ 8, radicand > 0).
  *
  * Exactness: the same integral restatement as the batch family —
  * quantize once to `floor(mv·10³)`, keep (n, Σx, Σx²) as exact BIGINTs
  * per cell, score with `z = (x·n − Σx)/√(n·Σx² − (Σx)²)` in two final
  * IEEE ops. StatefulSpec reconciles the stream against a driver-side
  * prequential rebuild EXACTLY, z doubles included.
  *
  * Scale (100 TB): state is a ≤24-entry map (hod → three BIGINTs) per
  * series — O(series), never O(events) — in transformWithState's
  * RocksDB MapState, where each hod cell reads/writes independently
  * (a ValueState holding the whole profile would rewrite 24 cells per
  * row; MapState touches one). */
object SeasonalProfile {

  final case class Score(
      event_type: String, bucket: Long, hod: Long, mv: Double,
      n_profile: Long, z: Double, is_anomaly: Boolean)

  /** Keyed state: hod → (n, Σfp, Σfp²), updated prequentially. */
  class ProfileProcessor
      extends StatefulProcessor[String, (String, Long, Double), Score] {
    @transient private var prof: MapState[Long, (Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      prof = getHandle.getMapState[Long, (Long, Long, Long)](
        "prof", Encoders.scalaLong,
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long, Double)],
        timerValues: TimerValues): Iterator[Score] = {
      val out = Array.newBuilder[Score]
      rows.toArray.sortBy(_._2).foreach { case (_, bucket, mv) =>
        val fp = math.floor(mv * 1000.0).toLong
        val hod = (bucket % 144) / 6
        val (n, s, ss) =
          if (prof.containsKey(hod)) prof.getValue(hod) else (0L, 0L, 0L)
        if (n >= 8) {
          val rad = n * ss - s * s
          if (rad > 0) {
            val z = (fp * n - s).toDouble / math.sqrt(rad.toDouble)
            out += Score(key, bucket, hod, mv, n, z, math.abs(z) > 3.0)
          }
        }
        prof.updateValue(hod, (n + 1, s + fp, ss + fp * fp))
      }
      out.result().iterator
    }
  }

  /** Score a finalized bucket-mean stream `(series, bucket, mean)`
    * against each row's own running (series, hod) profile. Ordering
    * contract as [[AnomalyDetect]]: non-decreasing bucket order per
    * series across batches (within a batch the processor sorts). */
  def scoreSeasonal(ds: Dataset[(String, Long, Double)]): Dataset[Score] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new ProfileProcessor, TimeMode.None(), OutputMode.Append())
  }
}
