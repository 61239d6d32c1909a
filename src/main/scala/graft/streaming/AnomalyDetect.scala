package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, TimerValues}

/** Streaming rolling z-score anomaly detection — the alerting form of the
  * batch [[graft.queries.AnalyticsQueries.anomalyZscore]] query, and the
  * observability alarm the reference's Timestream consumers build on top
  * of the stored points (SURVEY §1: the pipeline's stated purpose is
  * operational monitoring; the reference itself stops at storage and
  * leaves scoring to Timestream dashboards — this operator closes that
  * loop in-engine, on the stream).
  *
  * Input is the finalized per-(series, 10-min bucket) mean frame — in
  * production the Append-mode output of the watermarked tumbling-window
  * mean (the [[graft.operators.Windowing]] family), which finalizes
  * windows as the watermark passes their end, i.e. in non-decreasing
  * bucket order per series (the one ordering this operator assumes;
  * within a micro-batch it sorts, so only CROSS-batch regressions — a
  * window finalizing after a later one, which Append-mode watermarking
  * rules out — would diverge from batch).
  *
  * Exactness is inherited from the batch query's integral restatement:
  * each mean is quantized ONCE to `floor(mv·10³)` and the trailing-24
  * count/sum/sum-of-squares stay exact BIGINTs, so
  * `z = (x·n − Σx) / √(n·Σx² − (Σx)²)` performs the same two IEEE ops
  * (one divide, one correctly-rounded sqrt) on identical integers —
  * StatefulSpec asserts stream == batch EXACTLY, z doubles included.
  *
  * Scale (100 TB): state is one ≤24-long ring per series — O(series),
  * never O(events) — on the RocksDB store `transformWithState` requires,
  * so state bigger than heap spills to disk, and series hash-partition
  * across executors exactly like the batch window's partitionBy. */
object AnomalyDetect {

  final case class Score(
      event_type: String, bucket: Long, mv: Double,
      n_window: Long, z: Double, is_anomaly: Boolean)

  /** The ONE trailing-24 integral ring discipline both scorers share
    * (means quantized to milli-units, counts raw): score each incoming
    * exact integer against the ring BEFORE pushing it (the batch frame
    * is `rowsBetween(-24, -1)` — the current row is excluded from its
    * own window), with the batch queries' warmup (n ≥ 12) and
    * flat-window (radicand > 0) guards, then advance the ring. A change
    * to the shared discipline lands in both scorers by construction.
    * `P` carries the scorer's original payload (the un-quantized mean)
    * through to `emit(bucket, v, payload, n, z)`. */
  private def scoreRing[P](win0: Array[Long], sorted: Array[(Long, Long, P)])(
      emit: (Long, Long, P, Long, Double) => Unit): Array[Long] = {
    var win = win0
    sorted.foreach { case (bucket, v, payload) =>
      val n = win.length.toLong
      if (n >= 12) {
        var s = 0L; var ss = 0L
        win.foreach { x => s += x; ss += x * x }
        val rad = n * ss - s * s
        if (rad > 0)
          emit(bucket, v, payload, n, (v * n - s).toDouble / math.sqrt(rad.toDouble))
      }
      win = if (win.length >= 24) win.drop(win.length - 23) :+ v
            else win :+ v
    }
    win
  }

  /** Keyed state: the trailing ≤24 quantized bucket means, oldest first
    * ([[scoreRing]] holds the shared scoring discipline). */
  class ZScoreProcessor
      extends StatefulProcessor[String, (String, Long, Double), Score] {
    @transient private var ring: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ring = getHandle.getListState[Long](
        "ring", Encoders.scalaLong, org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long, Double)],
        timerValues: TimerValues): Iterator[Score] = {
      val out = Array.newBuilder[Score]
      val sorted = rows.toArray.sortBy(_._2)
        .map { case (_, b, mv) => (b, math.floor(mv * 1000.0).toLong, mv) }
      val win = scoreRing(ring.get().toArray, sorted) { (bucket, _, mv, n, z) =>
        out += Score(key, bucket, mv, n, z, math.abs(z) > 3.0)
      }
      ring.put(win)
      out.result().iterator
    }
  }

  /** Score a finalized bucket-mean stream `(series, bucket, mean)`.
    * TimeMode.None: the ring advances on arrival order (see ordering
    * contract above), no timers — an idle series simply stops being
    * scored, holding its last 24 buckets until traffic resumes. */
  def scoreBuckets(ds: Dataset[(String, Long, Double)]): Dataset[Score] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new ZScoreProcessor, TimeMode.None(), OutputMode.Append())
  }

  final case class VolumeScore(
      event_type: String, bucket: Long, cnt: Long,
      n_window: Long, z: Double, is_anomaly: Boolean)

  /** [[ZScoreProcessor]]'s twin on bucket COUNTS — the streaming form of
    * the batch `volume_anomaly` query
    * ([[graft.queries.AnalyticsQueries.volumeAnomaly]]): a series whose
    * values look normal but whose event VOLUME spikes (retry storm,
    * replay, upstream fan-out bug) alarms here and nowhere else. Counts
    * are already exact BIGINTs, so there is no quantization step at all;
    * everything else IS the shared [[scoreRing]] discipline —
    * StatefulSpec asserts stream == batch exactly, z doubles included. */
  class VolumeProcessor
      extends StatefulProcessor[String, (String, Long, Long), VolumeScore] {
    @transient private var ring: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      ring = getHandle.getListState[Long](
        "ring", Encoders.scalaLong, org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long, Long)],
        timerValues: TimerValues): Iterator[VolumeScore] = {
      val out = Array.newBuilder[VolumeScore]
      val sorted = rows.toArray.sortBy(_._2)
        .map { case (_, b, cnt) => (b, cnt, ()) }
      val win = scoreRing(ring.get().toArray, sorted) { (bucket, cnt, _, n, z) =>
        out += VolumeScore(key, bucket, cnt, n, z, math.abs(z) > 3.0)
      }
      ring.put(win)
      out.result().iterator
    }
  }

  /** Score a finalized bucket-count stream `(series, bucket, count)` —
    * the volume alarm. Same arrival-order contract as [[scoreBuckets]]. */
  def scoreVolumes(ds: Dataset[(String, Long, Long)]): Dataset[VolumeScore] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new VolumeProcessor, TimeMode.None(), OutputMode.Append())
  }
}
