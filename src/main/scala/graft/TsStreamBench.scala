package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Throughput bench for the streaming time-series operators
  * ([[graft.streaming.AnomalyDetect]], [[graft.streaming.RateMonitor]],
  * [[graft.streaming.GapDetect]]): synthetic finalized bucket-mean rows
  * through each transformWithState processor, one AvailableNow drain,
  * records/second end to end. All three require the RocksDB store
  * (transformWithState's contract), so that provider is unconditional
  * here — config mirrors StreamBench's pinned settings.
  *
  *   java -cp ... graft.TsStreamBench [nRecords] [nSeries] [partitions]
  *
  * The input shape is nSeries interleaved series × (n/nSeries) buckets
  * each — state stays O(series) in every processor, so throughput
  * measures per-row processor cost, not state growth.
  */
object TsStreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val nSeries = args.lift(1).map(_.toInt).getOrElse(256)
    val parts = args.lift(2).map(_.toInt).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$parts]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .config("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
      .config("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB", "2048")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // interleaved arrival: bucket-major, so every micro-batch touches
    // every series — the worst realistic state-access pattern
    def rows(count: Int): Seq[(String, Long, Double)] =
      (0 until count).map { i =>
        val b = i / nSeries
        val s = i % nSeries
        (s"series_$s", b.toLong, 100.0 + (i % 97) * 0.5)
      }

    def freshStream[T](data: Seq[T])(implicit enc: org.apache.spark.sql.Encoder[T]) = {
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[T](0, spark, Some(parts))(enc)
      ms.addData(data: _*)
      ms
    }

    def runOnce[T](data: Seq[T],
                   build: org.apache.spark.sql.Dataset[T] =>
                     org.apache.spark.sql.Dataset[_])(
        implicit enc: org.apache.spark.sql.Encoder[T]): Double = {
      val df = build(freshStream(data).toDS())
      val ckpt = java.nio.file.Files.createTempDirectory("tsb-ckpt").toString
      val t0 = System.nanoTime()
      val q = df.writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }

    val data = rows(n)
    // bucket COUNTS for the volume scorer — same interleaved shape
    val volData = (0 until n).map { i =>
      val b = i / nSeries
      val s = i % nSeries
      (s"series_$s", b.toLong, 50L + (i % 97))
    }
    // item stream for the SpaceSaving sketch: skewed draws — half the
    // mass on 5 hot ids, the rest spread over 500 cold ids, so with
    // m = 8 the budget fills fast and the EVICTION path (the O(m)
    // per-row cost the sketch pays on real streams) dominates the run;
    // seq = arrival index per key
    val hhData = (0 until n).map { i =>
      val s = i % nSeries
      val r = i * 2654435761L % 1000
      val item = if (r < 500) r % 5 else r
      (s"series_$s", (i / nSeries).toLong, s"item_$item")
    }
    // event-shaped inputs for the windowed monitors: event time advances
    // one minute per bucket row, so the run spans n/nSeries windows of
    // the 10-min aggregations (state = series × open-window, the shape
    // the monitors claim)
    val cardData = (0 until n).map { i =>
      val b = i / nSeries
      val s = i % nSeries
      (s"series_$s", b.toLong * 60000L, (i % 997).toLong)
    }
    val driftRef = graft.streaming.DriftMonitor.referenceHistogram(
      (0 until 10000).map(i => (s"series_${i % nSeries}", (i % 97).toDouble))
        .toDF("event_type", "value"))
      .localCheckpoint(true)
    val driftData = (0 until n).map { i =>
      val b = i / nSeries
      val s = i % nSeries
      (s"series_$s", b.toLong * 60000L, (i % 97).toDouble)
    }
    val funnelData = (0 until n).map { i =>
      val step = i % 3 match {
        case 0 => "view"; case 1 => "click"; case _ => "purchase"
      }
      graft.streaming.FunnelMonitor.FunnelEvt(
        (i % (nSeries * 16)).toLong, (i / nSeries).toLong * 60000000L, step)
    }
    // warmup: one-time codegen + store init, untimed — the volume and
    // heavy-hitter paths warm separately (different input types /
    // encoders / processors, so their plans would otherwise compile
    // inside the timed run)
    runOnce(rows(2000), (ds: org.apache.spark.sql.Dataset[(String, Long, Double)]) =>
      graft.streaming.AnomalyDetect.scoreBuckets(ds))
    runOnce(volData.take(2000), (ds: org.apache.spark.sql.Dataset[(String, Long, Long)]) =>
      graft.streaming.AnomalyDetect.scoreVolumes(ds))
    runOnce(hhData.take(2000), (ds: org.apache.spark.sql.Dataset[(String, Long, String)]) =>
      graft.streaming.HeavyHitters.topK(ds, 8))
    runOnce(rows(2000), (ds: org.apache.spark.sql.Dataset[(String, Long, Double)]) =>
      graft.streaming.EwmaSmooth.smooth(ds))
    runOnce(cardData.take(2000), (ds: org.apache.spark.sql.Dataset[(String, Long, Long)]) =>
      graft.streaming.CardinalityMonitor.distinctUsers(ds).as[(String, Long, Long)])
    runOnce(driftData.take(2000), (ds: org.apache.spark.sql.Dataset[(String, Long, Double)]) =>
      graft.streaming.DriftMonitor.scoreDrift(ds, driftRef)
        .as[(String, Long, Long, Long, Double)])
    runOnce(funnelData.take(2000),
      (ds: org.apache.spark.sql.Dataset[graft.streaming.FunnelMonitor.FunnelEvt]) =>
        graft.streaming.FunnelMonitor.track(ds, horizonMs = 3600000L))
    runOnce(driftData.take(2000), (ds: org.apache.spark.sql.Dataset[(String, Long, Double)]) =>
      graft.streaming.StatsMonitor.profile(ds)
        .as[(String, Long, Long, Double, Double, Double, Double)])

    val zSec = runOnce(data, (ds: org.apache.spark.sql.Dataset[(String, Long, Double)]) =>
      graft.streaming.AnomalyDetect.scoreBuckets(ds))
    val rSec = runOnce(data, (ds: org.apache.spark.sql.Dataset[(String, Long, Double)]) =>
      graft.streaming.RateMonitor.rateBuckets(ds))
    val gSec = runOnce(data, (ds: org.apache.spark.sql.Dataset[(String, Long, Double)]) =>
      graft.streaming.GapDetect.detectGaps(ds, 3))
    val sSec = runOnce(data, (ds: org.apache.spark.sql.Dataset[(String, Long, Double)]) =>
      graft.streaming.SeasonalProfile.scoreSeasonal(ds))
    val vSec = runOnce(volData, (ds: org.apache.spark.sql.Dataset[(String, Long, Long)]) =>
      graft.streaming.AnomalyDetect.scoreVolumes(ds))
    val hSec = runOnce(hhData, (ds: org.apache.spark.sql.Dataset[(String, Long, String)]) =>
      graft.streaming.HeavyHitters.topK(ds, 8))
    val eSec = runOnce(data, (ds: org.apache.spark.sql.Dataset[(String, Long, Double)]) =>
      graft.streaming.EwmaSmooth.smooth(ds))
    val cSec = runOnce(cardData, (ds: org.apache.spark.sql.Dataset[(String, Long, Long)]) =>
      graft.streaming.CardinalityMonitor.distinctUsers(ds).as[(String, Long, Long)])
    val dSec = runOnce(driftData, (ds: org.apache.spark.sql.Dataset[(String, Long, Double)]) =>
      graft.streaming.DriftMonitor.scoreDrift(ds, driftRef)
        .as[(String, Long, Long, Long, Double)])
    val fSec = runOnce(funnelData,
      (ds: org.apache.spark.sql.Dataset[graft.streaming.FunnelMonitor.FunnelEvt]) =>
        graft.streaming.FunnelMonitor.track(ds, horizonMs = 3600000L))
    val stSec = runOnce(driftData, (ds: org.apache.spark.sql.Dataset[(String, Long, Double)]) =>
      graft.streaming.StatsMonitor.profile(ds)
        .as[(String, Long, Long, Double, Double, Double, Double)])
    println(
      f"""{"metric":"ts_stream_throughput","records":$n,"series":$nSeries,"zscore_rps":${n / zSec}%.0f,"rate_rps":${n / rSec}%.0f,"gap_rps":${n / gSec}%.0f,"seasonal_rps":${n / sSec}%.0f,"volume_rps":${n / vSec}%.0f,"hitters_rps":${n / hSec}%.0f,"ewma_rps":${n / eSec}%.0f,"cardinality_rps":${n / cSec}%.0f,"drift_rps":${n / dSec}%.0f,"funnel_rps":${n / fSec}%.0f,"stats_rps":${n / stSec}%.0f,"state_store":"rocksdb"}""")
    spark.stop()
  }
}
