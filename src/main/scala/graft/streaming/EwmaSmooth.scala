package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming truncated-EWMA smoothing — the online form of the batch
  * `series_ewma` query ([[graft.queries.AnalyticsQueries.seriesEwma]]):
  * per series, the α = 1/4 exponentially-weighted mean over the last 8
  * observed buckets plus the one-step forecast error `mv − ewma_prev`,
  * the residual a live dashboard charts as "how far off trend is this
  * series right now".
  *
  * Exactness: the identical integer kernel — means quantize ONCE to
  * `floor(mv·10³)` BIGINTs, the weighted numerator/denominator fold the
  * shared exact-rational weights ([[graft.queries.AnalyticsQueries.EwmaWeights]],
  * 3^j·4^(7−j)) over the lags actually present, then the same two
  * fixed-order IEEE divisions — so StatefulSpec asserts stream == batch
  * EXACTLY, ewma and forecast-error doubles included. Ordering contract
  * as [[AnomalyDetect]]: non-decreasing bucket order per series across
  * batches (within a batch the processor sorts).
  *
  * Scale (100 TB): state is a ≤7-long quantized ring plus one double
  * per series — O(series), never O(events) — on the RocksDB store
  * `transformWithState` requires; series hash-partition across
  * executors exactly like the batch window's partitionBy. */
object EwmaSmooth {

  final case class Smoothed(
      event_type: String, bucket: Long, mv: Double,
      ewma: Double, forecast_err: Option[Double])

  /** Keyed state: the trailing ≤7 quantized means (oldest first) and the
    * previous emitted ewma (the one-step forecast for the next row). */
  class EwmaProcessor
      extends StatefulProcessor[String, (String, Long, Double), Smoothed] {
    @transient private var ring: ListState[Long] = _
    @transient private var prevE: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      ring = getHandle.getListState[Long](
        "ring", Encoders.scalaLong, org.apache.spark.sql.streaming.TTLConfig.NONE)
      prevE = getHandle.getValueState[Double](
        "prev", Encoders.scalaDouble, org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long, Double)],
        timerValues: TimerValues): Iterator[Smoothed] = {
      val weights = graft.queries.AnalyticsQueries.EwmaWeights
      val out = Array.newBuilder[Smoothed]
      var win = ring.get().toArray // oldest first, ≤7 entries
      rows.toArray.sortBy(_._2).foreach { case (_, bucket, mv) =>
        val fp = math.floor(mv * 1000.0).toLong
        // lag j: j=0 is the current row, j=1 the newest ring entry, …
        val lags = fp +: win.reverse
        var num = 0L; var den = 0L
        var j = 0
        while (j < lags.length && j < weights.length) {
          num += weights(j) * lags(j); den += weights(j); j += 1
        }
        val e = num.toDouble / den.toDouble / 1000.0
        val fe = if (prevE.exists()) Some(mv - prevE.get()) else None
        out += Smoothed(key, bucket, mv, e, fe)
        prevE.update(e)
        win = (win :+ fp).takeRight(weights.length - 1)
      }
      ring.put(win)
      out.result().iterator
    }
  }

  /** Smooth a finalized bucket-mean stream `(series, bucket, mean)`.
    * Same arrival-order contract as [[AnomalyDetect.scoreBuckets]]. */
  def smooth(ds: Dataset[(String, Long, Double)]): Dataset[Smoothed] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new EwmaProcessor, TimeMode.None(), OutputMode.Append())
  }
}
