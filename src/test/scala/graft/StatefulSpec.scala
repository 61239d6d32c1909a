package graft

import graft.config.AppConfig
import graft.fixtures.LogGen
import graft.streaming.{Pipeline, Stateful}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

class StatefulSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  test("flatMapGroupsWithState sessionization closes sessions on watermark timeout") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Stateful.Evt]
    val base = 1700000000000L
    val sessions = Stateful.sessionize(ms.toDS(), gapMs = 60000L, watermarkDelay = "0 seconds")
    val q = sessions.writeStream
      .format("memory").queryName("sessions").outputMode("append")
      .option("checkpointLocation", tmp("ckpt-sess"))
      .start()
    // user 1: two bursts 10 min apart (two sessions); user 2: one burst
    ms.addData(
      Stateful.Evt(1L, base), Stateful.Evt(1L, base + 10000),
      Stateful.Evt(2L, base + 5000))
    q.processAllAvailable()
    ms.addData(Stateful.Evt(1L, base + 600000), Stateful.Evt(2L, base + 610000))
    q.processAllAvailable()
    // push watermark far ahead so every open session times out
    ms.addData(Stateful.Evt(99L, base + 7200000))
    q.processAllAvailable()
    ms.addData(Stateful.Evt(98L, base + 9000000))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("sessions")
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    // first burst of user 1: 2 events spanning 10s
    assert(got.contains((1L, base, base + 10000, 2L)))
    // second burst of user 1 closed by the far-future watermark
    assert(got.contains((1L, base + 600000, base + 600000, 1L)))
    assert(got.contains((2L, base + 5000, base + 5000, 1L)))
    assert(got.contains((2L, base + 610000, base + 610000, 1L)))
  }

  test("transformWithState running totals accumulate across micro-batches (RocksDB store)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(String, Long)]
      val q = Stateful.runningTotals(ms.toDS())
        .writeStream.format("memory").queryName("totals").outputMode("append")
        .option("checkpointLocation", tmp("ckpt-tws")).start()
      ms.addData(("get", 1L), ("get", 2L), ("put", 3L))
      q.processAllAvailable()
      ms.addData(("get", 4L))
      q.processAllAvailable()
      q.stop()
      val got = spark.table("totals")
        .select("key", "batch_count", "total_count")
        .as[(String, Long, Long)].collect().toSet
      // batch 1: get=2, put=1; batch 2: get delta 1, running total 3
      assert(got == Set(("get", 2L, 2L), ("put", 1L, 1L), ("get", 1L, 3L)))
      // the TTL'd production path must also start (TTL requires
      // ProcessingTime mode — a TTL under TimeMode.None throws at init).
      // A processing-time-TTL query never idles (the store keeps
      // scheduling eviction batches), so neither processAllAvailable nor
      // AvailableNow terminates on its own: poll for the output, stop.
      val ms2 = MemoryStream[(String, Long)]
      ms2.addData(("get", 1L), ("get", 2L))
      val q2 = Stateful.runningTotals(ms2.toDS(), java.time.Duration.ofHours(1))
        .writeStream.format("memory").queryName("totals_ttl").outputMode("append")
        .option("checkpointLocation", tmp("ckpt-tws2")).start()
      try {
        val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
        while (spark.table("totals_ttl").isEmpty && System.nanoTime() < deadline)
          Thread.sleep(200)
        assert(spark.table("totals_ttl").select("key", "total_count")
          .as[(String, Long)].collect().toSet == Set(("get", 2L)))
      } finally q2.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-static enrich: broadcast dimension join, no streaming state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val dim = Seq(("GetItem", "read"), ("PutItem", "write")).toDF("operation", "kind")
    val stream = ms.toDS().toDF("operation", "latency")
    val q = Stateful.enrich(stream, dim, "operation")
      .writeStream.format("memory").queryName("enriched").outputMode("append")
      .option("checkpointLocation", tmp("ckpt-enr")).start()
    ms.addData(("GetItem", 5L), ("PutItem", 9L), ("Unknown", 1L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("enriched")
      .select("operation", "latency", "kind")
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(got == Set(
      ("GetItem", 5L, Some("read")),
      ("PutItem", 9L, Some("write")),
      ("Unknown", 1L, None) // left join: unmatched streaming rows survive
    ))
    // no stateful operator: a stream-static join keeps zero streaming state
    assert(q.lastProgress.stateOperators.isEmpty)
  }

  test("stream-stream interval join correlates within horizon and bounds state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val reqs = MemoryStream[(Long, Long)]
    val acks = MemoryStream[(Long, Long)]
    val base = 1700000000000L
    def withTime(ms: MemoryStream[(Long, Long)]) =
      ms.toDS().toDF("key", "t").withColumn("event_time", timestamp_millis(col("t")))
    val joined = Stateful.correlate(
      withTime(reqs), withTime(acks), "key", horizonSec = 30, watermarkDelay = "0 seconds")
    val q = joined.writeStream
      .format("memory").queryName("corr").outputMode("append")
      .option("checkpointLocation", tmp("ckpt-corr")).start()
    reqs.addData((1L, base), (2L, base))
    // key 1 acks inside the 30s horizon; key 2 acks outside it; key 3
    // never had a request
    acks.addData((1L, base + 10000), (2L, base + 40000), (3L, base + 5000))
    q.processAllAvailable()
    // advance both watermarks past every buffered row so inner-join state
    // for unmatched rows is evicted, then emit
    reqs.addData((99L, base + 600000)); acks.addData((99L, base + 600000))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("corr").select("l_key", "l_time", "r_time")
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).getTime, r.getTimestamp(2).getTime)).toSet
    assert(got.contains((1L, base, base + 10000)), "in-horizon ack must correlate")
    assert(!got.exists(_._1 == 2L), "ack beyond the 30s horizon must not match")
    assert(!got.exists(_._1 == 3L), "ack without a request must not match")
    assert(got.contains((99L, base + 600000, base + 600000)))
    // the join IS stateful — but the watermark must cap its state: after
    // the far-future batch, buffered rows from the first batch are gone
    val state = q.recentProgress.flatMap(_.stateOperators).lastOption
    assert(state.exists(_.numRowsTotal <= 4), s"state must be watermark-bounded: $state")
  }

  test("ancient out-of-order event becomes its own session, not a backwards stretch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Stateful.Evt]
    val base = 1700000000000L
    // tolerant watermark so the ancient event reaches the function at all
    // (with a tight watermark Spark drops it at the stateful operator's
    // input - that's LateRouter territory); this test exercises the MERGE
    // logic
    val q = Stateful.sessionize(ms.toDS(), gapMs = 60000L, watermarkDelay = "3600 seconds")
      .writeStream.format("memory").queryName("anc").outputMode("append")
      .option("checkpointLocation", tmp("ckpt-anc")).start()
    ms.addData(Stateful.Evt(4L, base))
    q.processAllAvailable()
    // 10 minutes OLDER than the open session minus gap
    ms.addData(Stateful.Evt(4L, base - 600000L))
    q.processAllAvailable()
    ms.addData(Stateful.Evt(99L, base + 7200000L)) // advance watermark
    q.processAllAvailable()
    ms.addData(Stateful.Evt(98L, base + 9000000L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("anc")
      .select("user_id", "session_start", "n_events")
      .as[(Long, Long, Long)].collect().filter(_._1 == 4L).toSet
    // two separate sessions; the open one was NOT stretched back
    assert(got == Set((4L, base - 600000L, 1L), (4L, base, 1L)))
  }

  test("two ancient stragglers within the gap merge into ONE closed session (batch parity)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Stateful.Evt]
    val base = 1700000000000L
    val q = Stateful.sessionize(ms.toDS(), gapMs = 60000L, watermarkDelay = "3600 seconds")
      .writeStream.format("memory").queryName("anc2").outputMode("append")
      .option("checkpointLocation", tmp("ckpt-anc2")).start()
    ms.addData(Stateful.Evt(5L, base))
    q.processAllAvailable()
    // one batch delivers TWO stragglers 10s apart, both far older than
    // the open session minus gap — the batch session_agg equivalent is a
    // single [t, t+10s] session of 2 events, and so is this
    ms.addData(Stateful.Evt(5L, base - 600000L), Stateful.Evt(5L, base - 590000L))
    q.processAllAvailable()
    ms.addData(Stateful.Evt(99L, base + 7200000L)) // advance watermark
    q.processAllAvailable()
    ms.addData(Stateful.Evt(98L, base + 9000000L))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("anc2")
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect().filter(_._1 == 5L).toSet
    assert(got == Set(
      (5L, base - 600000L, base - 590000L, 2L), // merged straggler pair
      (5L, base, base, 1L) // the open session, closed by timeout later
    ))
  }

  test("sessionize state stays O(users), not O(events), at 10k-user cardinality") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[Stateful.Evt]
    val base = 1700000000000L
    val q = Stateful.sessionize(ms.toDS(), gapMs = 60000L, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess10k").outputMode("append")
      .option("checkpointLocation", tmp("ckpt-sess10k")).start()
    val nUsers = 10000
    // 3 events per user, all within one open session per user
    val evts = (0 until nUsers).flatMap { u =>
      Seq(Stateful.Evt(u.toLong, base + u), Stateful.Evt(u.toLong, base + u + 1000),
        Stateful.Evt(u.toLong, base + u + 2000))
    }
    ms.addData(evts: _*)
    q.processAllAvailable()
    // one open-session state row per user — 10k rows for 30k events
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    assert(stateRows <= nUsers.toLong,
      s"state must be O(users): $stateRows rows for $nUsers users")
    // close everything via a far-future watermark and check the output
    ms.addData(Stateful.Evt(-1L, base + 7200000L))
    q.processAllAvailable()
    ms.addData(Stateful.Evt(-2L, base + 9000000L))
    q.processAllAvailable()
    q.stop()
    assert(spark.table("sess10k").where(col("user_id") >= 0).count() == nUsers.toLong)
  }

  test("streaming dedup drops re-sent records at the state store") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[String]
    val rec = LogGen.record("GetTable", 111L, "GLUE", "1.5", 1700000000000L)
    val rec2 = LogGen.record("GetTable", 222L, "S3", "2.5", 1700000001000L)
    val deduped = Stateful.dedupPoints(
      Pipeline.parsed(ms.toDF().withColumnRenamed("value", "raw"), AppConfig())
        .select("time", "awsaccountid", "operation", "callerservice", "latency", "event_time"))
    val q = deduped.writeStream
      .format("memory").queryName("dedup").outputMode("append")
      .option("checkpointLocation", tmp("ckpt-dedup"))
      .start()
    ms.addData(rec, rec, rec2)       // duplicate within batch
    q.processAllAvailable()
    ms.addData(rec)                  // re-sent across batches
    q.processAllAvailable()
    // advance the watermark far past both records' event times: the
    // within-watermark dedup state for them must be EVICTED (the plain
    // dropDuplicates variant would keep it forever — unbounded state on a
    // long-running stream)
    val recFar = LogGen.record("GetTable", 333L, "GLUE", "3.5", 1700009000000L)
    ms.addData(recFar)
    q.processAllAvailable()
    ms.addData(LogGen.record("GetTable", 444L, "S3", "4.5", 1700009100000L))
    q.processAllAvailable()
    val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
    q.stop()
    assert(spark.table("dedup").count() == 4L)
    // only the keys still inside the watermark horizon remain in state
    assert(stateRows <= 2L, s"dedup state not evicted: $stateRows rows")
  }

  test("gap detect: a silent series alarms once via event-time timer; live series stays quiet") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[(String, Long, Double)]
      val q = graft.streaming.GapDetect.detectGaps(ms.toDS(), thresholdBuckets = 3)
        .writeStream.format("memory").queryName("gaps").outputMode("append")
        .option("checkpointLocation", tmp("ckpt-gap")).start()
      // batch 1: both series alive through bucket 2 / bucket 0
      ms.addData(Seq(("a", 0L, 1.0), ("a", 1L, 1.0), ("a", 2L, 1.0), ("b", 0L, 5.0)))
      q.processAllAvailable()
      assert(spark.table("gaps").count() == 0L, "no gap while the watermark trails both series")
      // batch 2: only a advances — far past b's bucket 0 + 3 threshold.
      // Timers fire against the PREVIOUS batch's watermark, so b's alarm
      // needs one more batch after the watermark jump.
      ms.addData(Seq(("a", 10L, 1.0)))
      q.processAllAvailable()
      ms.addData(Seq(("a", 11L, 1.0)))
      q.processAllAvailable()
      val gaps = spark.table("gaps")
        .as[(String, Long, Long)].collect()
      q.stop()
      // exactly one alarm: series b, last seen bucket 0, threshold
      // crossed at bucket 3 (= 0 + threshold); series a re-armed on
      // every arrival
      assert(gaps.toSeq == Seq(("b", 0L, 3L)), s"got ${gaps.toSeq}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("seasonal profile: stream matches a driver-side prequential rebuild exactly (RocksDB)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = "/root/testdata/sf0.001"
      val means = graft.queries.AnalyticsQueries.bucketMeans(spark, dir)
        .select(col("event_type"), col("b"), col("mv"))
        .as[(String, Long, Double)].collect().sortBy(_._2)
      val (first, second) = means.splitAt(means.length / 2)
      val ms = MemoryStream[(String, Long, Double)]
      val q = graft.streaming.SeasonalProfile.scoreSeasonal(ms.toDS())
        .writeStream.format("memory").queryName("seasonal").outputMode("append")
        .option("checkpointLocation", tmp("ckpt-seasonal")).start()
      ms.addData(first.toIndexedSeq)
      q.processAllAvailable()
      ms.addData(second.toIndexedSeq)
      q.processAllAvailable()
      q.stop()
      // prequential rebuild: per series in bucket order, score against
      // the cell-so-far then fold the row in — the operator's contract
      val expect = scala.collection.mutable.Map[(String, Long), (Double, Long, Double)]()
      means.groupBy(_._1).foreach { case (t, rows) =>
        val prof = scala.collection.mutable.Map[Long, (Long, Long, Long)]()
        rows.sortBy(_._2).foreach { case (_, b, mv) =>
          val fp = math.floor(mv * 1000.0).toLong
          val hod = (b % 144) / 6
          val (n, s, ss) = prof.getOrElse(hod, (0L, 0L, 0L))
          if (n >= 8 && n * ss - s * s > 0) {
            val z = (fp * n - s).toDouble / math.sqrt((n * ss - s * s).toDouble)
            expect((t, b)) = (mv, n, z)
          }
          prof(hod) = (n + 1, s + fp, ss + fp * fp)
        }
      }
      val streamed = spark.table("seasonal")
        .select("event_type", "bucket", "mv", "n_profile", "z")
        .as[(String, Long, Double, Long, Double)].collect()
      assert(streamed.length == expect.size,
        s"stream(${streamed.length}) != prequential(${expect.size})")
      streamed.foreach { case (t, b, mv, n, z) =>
        val (emv, en, ez) = expect((t, b))
        assert(mv == emv && n == en && z == ez, s"mismatch at ($t, $b)")
      }
      assert(streamed.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming rate monitor agrees with the batch series_rate exactly (RocksDB store)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = "/root/testdata/sf0.001"
      // same two-micro-batch split as the z-score parity test: the
      // (bucket, mean) value state provably carries across batches
      val means = graft.queries.AnalyticsQueries.bucketMeans(spark, dir)
        .select(col("event_type"), col("b"), col("mv"))
        .as[(String, Long, Double)].collect().sortBy(_._2)
      val (first, second) = means.splitAt(means.length / 2)
      val ms = MemoryStream[(String, Long, Double)]
      val q = graft.streaming.RateMonitor.rateBuckets(ms.toDS())
        .writeStream.format("memory").queryName("rates").outputMode("append")
        .option("checkpointLocation", tmp("ckpt-rate")).start()
      ms.addData(first.toIndexedSeq)
      q.processAllAvailable()
      ms.addData(second.toIndexedSeq)
      q.processAllAvailable()
      q.stop()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("event_type", "bucket", "mv", "rate_per_sec")
        .as[(String, Long, Double, Double)].collect().toSet
      val streamed = rows(spark.table("rates"))
      val batch = rows(graft.queries.AnalyticsQueries.seriesRate(spark, dir))
      assert(streamed == batch,
        s"stream(${streamed.size}) != batch(${batch.size}); " +
          s"onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
      assert(batch.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming z-score anomaly detection agrees with the batch query exactly (RocksDB store)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = "/root/testdata/sf0.001"
      // the identical finalized bucket-mean frame the batch query scores,
      // delivered in TWO micro-batches split at the median bucket so the
      // ring provably carries across batches (the global bucket sort
      // keeps each series' arrival order non-decreasing — the operator's
      // ordering contract)
      val means = graft.queries.AnalyticsQueries.bucketMeans(spark, dir)
        .select(col("event_type"), col("b"), col("mv"))
        .as[(String, Long, Double)].collect().sortBy(_._2)
      val (first, second) = means.splitAt(means.length / 2)
      val ms = MemoryStream[(String, Long, Double)]
      val q = graft.streaming.AnomalyDetect.scoreBuckets(ms.toDS())
        .writeStream.format("memory").queryName("zscores").outputMode("append")
        .option("checkpointLocation", tmp("ckpt-zscore")).start()
      ms.addData(first.toIndexedSeq)
      q.processAllAvailable()
      ms.addData(second.toIndexedSeq)
      q.processAllAvailable()
      q.stop()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("event_type", "bucket", "mv", "n_window", "z", "is_anomaly")
        .as[(String, Long, Double, Long, Double, Boolean)].collect().toSet
      val streamed = rows(spark.table("zscores"))
      val batch = rows(graft.queries.AnalyticsQueries.anomalyZscore(spark, dir))
      assert(streamed == batch,
        s"stream(${streamed.size}) != batch(${batch.size}); " +
          s"onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
      assert(batch.nonEmpty && batch.exists(_._6), "fixture should produce at least one anomaly")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming EWMA smoothing agrees with the batch series_ewma exactly (RocksDB store)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = "/root/testdata/sf0.001"
      val means = graft.queries.AnalyticsQueries.bucketMeans(spark, dir)
        .select(col("event_type"), col("b"), col("mv"))
        .as[(String, Long, Double)].collect().sortBy(_._2)
      val (first, second) = means.splitAt(means.length / 2)
      val ms = MemoryStream[(String, Long, Double)]
      val q = graft.streaming.EwmaSmooth.smooth(ms.toDS())
        .writeStream.format("memory").queryName("ewmas").outputMode("append")
        .option("checkpointLocation", tmp("ckpt-ewma")).start()
      ms.addData(first.toIndexedSeq)
      q.processAllAvailable()
      ms.addData(second.toIndexedSeq)
      q.processAllAvailable()
      q.stop()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("event_type", "bucket", "mv", "ewma", "forecast_err")
        .as[(String, Long, Double, Double, Option[Double])].collect().toSet
      val streamed = rows(spark.table("ewmas"))
      val batch = rows(graft.queries.AnalyticsQueries.seriesEwma(spark, dir))
      assert(streamed == batch,
        s"stream(${streamed.size}) != batch(${batch.size}); " +
          s"onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
      assert(batch.nonEmpty && batch.exists(_._5.isEmpty),
        "each series' first bucket must carry a null forecast error")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming SpaceSaving heavy hitters match a driver-side fold exactly; sketch guarantees hold") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = "/root/testdata/sf0.001"
      val m = 8
      // item stream: per-series user ids in event_id (arrival) order,
      // TWO micro-batches split at the median seq so counters and the
      // n_seen tally provably carry across batches
      val items = graft.sources.Tables.events(spark, dir)
        .select(col("event_type"), col("event_id"), col("user_id").cast("string"))
        .as[(String, Long, String)].collect().sortBy(_._2)
      val (first, second) = items.splitAt(items.length / 2)
      val ms = MemoryStream[(String, Long, String)]
      val q = graft.streaming.HeavyHitters.topK(ms.toDS(), m)
        .writeStream.format("memory").queryName("hitters").outputMode("append")
        .option("checkpointLocation", tmp("ckpt-hitters")).start()
      ms.addData(first.toIndexedSeq)
      q.processAllAvailable()
      ms.addData(second.toIndexedSeq)
      q.processAllAvailable()
      q.stop()
      val emitted = spark.table("hitters")
        .as[(String, String, Long, Long, Long)].collect()
      // final snapshot per key = the rows stamped with the maximal n_seen
      val finalSnap = emitted.groupBy(_._1).map { case (k, rows) =>
        val nMax = rows.map(_._5).max
        k -> rows.filter(_._5 == nMax)
          .map(r => r._2 -> ((r._3, r._4))).toMap
      }
      val byKey = items.groupBy(_._1)
      byKey.foreach { case (k, rows) =>
        val seq = rows.sortBy(_._2).map(_._3)
        val expect = graft.streaming.HeavyHitters.spaceSavingFold(
          Map.empty, seq.iterator, m)
        assert(finalSnap(k) == expect,
          s"key $k: stream snapshot != driver fold")
        // SpaceSaving guarantees against TRUE frequencies:
        val truth = seq.groupBy(identity).view.mapValues(_.length.toLong).toMap
        val n = seq.length.toLong
        finalSnap(k).foreach { case (it, (est, err)) =>
          val t = truth(it)
          assert(est - err <= t && t <= est,
            s"key $k item $it: est=$est err=$err true=$t")
        }
        truth.filter(_._2 > n / m).keys.foreach { hot =>
          assert(finalSnap(k).contains(hot),
            s"key $k: item $hot with freq > n/m must be tracked")
        }
        // per-batch snapshots stamped with running n_seen (cross-batch tally)
        assert(emitted.filter(_._1 == k).map(_._5).toSet.contains(n),
          s"key $k: final n_seen $n must be stamped")
      }
      // the sketch respects the budget
      finalSnap.foreach { case (k, snap) =>
        assert(snap.size <= m, s"key $k: ${snap.size} counters > budget $m")
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming moment profile agrees with the batch twin bit-exactly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_millis(ts)").as("event_ms"), col("value"))
      .as[(String, Long, Double)].collect().sortBy(_._2)
    val (first, second) = ev.splitAt(ev.length / 2)
    val sentinel = ("zz_flush", ev.map(_._2).max + 86400000L, 0.0)
    val ms = MemoryStream[(String, Long, Double)]
    val q = graft.streaming.StatsMonitor.profile(ms.toDS())
      .writeStream.format("memory").queryName("statsmon").outputMode("append")
      .option("checkpointLocation", tmp("ckpt-statsmon")).start()
    ms.addData(first.toIndexedSeq)
    q.processAllAvailable()
    ms.addData(second.toIndexedSeq :+ sentinel)
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("event_type") =!= "zz_flush")
      .select("event_type", "bucket", "n", "mean", "vmin", "vmax", "variance")
      .as[(String, Long, Long, Double, Double, Double, Double)].collect().toSet
    val streamed = rows(spark.table("statsmon"))
    val batch = rows(graft.streaming.StatsMonitor.profileBatch(
      graft.sources.Tables.events(spark, dir)
        .select(col("event_type"), expr("unix_millis(ts)").as("event_ms"), col("value"))))
    // every moment is an order-independent integer fold: same rows ⇒
    // bit-identical output, however the stream was micro-batched
    assert(streamed == batch,
      s"stream(${streamed.size}) != batch(${batch.size}); " +
        s"onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    assert(streamed.nonEmpty)
    streamed.foreach { case (_, _, n, mean, vmin, vmax, variance) =>
      assert(n > 0 && vmin <= mean + 0.01 && mean <= vmax + 0.01)
      assert(variance >= 0.0)
    }
  }

  test("streaming HLL cardinality agrees with the batch sketch exactly; estimates sane") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_millis(ts)").as("event_ms"), col("user_id"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    val (first, second) = ev.splitAt(ev.length / 2)
    // a far-future sentinel advances the watermark past every real
    // window so append mode finalizes them all; its own window stays
    // open and is excluded from both sides
    val sentinel = ("zz_flush", ev.map(_._2).max + 86400000L, 0L)
    val ms = MemoryStream[(String, Long, Long)]
    val q = graft.streaming.CardinalityMonitor.distinctUsers(ms.toDS())
      .writeStream.format("memory").queryName("cardmon").outputMode("append")
      .option("checkpointLocation", tmp("ckpt-cardmon")).start()
    ms.addData(first.toIndexedSeq)
    q.processAllAvailable()
    ms.addData(second.toIndexedSeq :+ sentinel)
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("event_type") =!= "zz_flush")
      .select("event_type", "bucket", "approx_users")
      .as[(String, Long, Long)].collect().toSet
    val streamed = rows(spark.table("cardmon"))
    val batch = rows(graft.streaming.CardinalityMonitor.distinctUsersBatch(
      graft.sources.Tables.events(spark, dir)
        .select(col("event_type"), expr("unix_millis(ts)").as("event_ms"), col("user_id"))))
    // register-max merging is order-independent: same rows ⇒ same sketch
    // ⇒ same estimate, split across micro-batches or not
    assert(streamed == batch,
      s"stream(${streamed.size}) != batch(${batch.size}); " +
        s"onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    assert(streamed.nonEmpty)
    // sketch sanity: every estimate within 5% of the exact distinct count
    val exact = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_millis(ts) DIV 600000").as("bucket"), col("user_id"))
      .groupBy("event_type", "bucket").agg(countDistinct("user_id").as("n"))
      .as[(String, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    streamed.foreach { case (t, b, est) =>
      val n = exact((t, b))
      assert(math.abs(est - n) <= math.max(1L, n / 20),
        s"($t, $b): estimate $est vs exact $n")
    }
  }

  test("streaming funnel agrees with a driver recompute and the batch funnel counts exactly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("tus"), col("event_type"))
      .as[(Long, Long, String)].collect().sortBy(_._2)
    val (first, second) = ev.splitAt(ev.length / 2)
    // horizon wider than the fixture's whole time range: each user's
    // funnel must span ALL their events (the batch query's scope) and
    // emit exactly once; the sentinel then advances the watermark past
    // every last-event + horizon to fire every timeout
    val horizonMs = 60L * 86400000L
    val sentinel = graft.streaming.FunnelMonitor.FunnelEvt(
      999999999L, ev.map(_._2).max + (horizonMs + 86400000L) * 1000L, "view")
    def toEvt(t: (Long, Long, String)) =
      graft.streaming.FunnelMonitor.FunnelEvt(t._1, t._2, t._3)
    val ms = MemoryStream[graft.streaming.FunnelMonitor.FunnelEvt]
    val q = graft.streaming.FunnelMonitor.track(ms.toDS(), horizonMs = horizonMs)
      .writeStream.format("memory").queryName("funnelmon").outputMode("append")
      .option("checkpointLocation", tmp("ckpt-funnelmon")).start()
    ms.addData(first.map(toEvt).toIndexedSeq)
    q.processAllAvailable()
    ms.addData(second.map(toEvt).toIndexedSeq :+ sentinel)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("funnelmon")
      .filter(col("user_id") =!= 999999999L)
      .as[graft.streaming.FunnelMonitor.Conversion].collect()
      .map(c => c.user_id -> ((c.t_view, c.t_click, c.t_purchase))).toMap
    // independent reference: the batch chain per user in plain Scala
    val want = ev.groupBy(_._1).map { case (u, rows) =>
      val tv = rows.filter(_._3 == "view").map(_._2).minOption
      val tc = tv.flatMap(v => rows.filter(r => r._3 == "click" && r._2 > v).map(_._2).minOption)
      val tp = tc.flatMap(c => rows.filter(r => r._3 == "purchase" && r._2 > c).map(_._2).minOption)
      u -> ((tv, tc, tp))
    }
    assert(streamed == want)
    assert(streamed.nonEmpty && streamed.values.exists(_._3.isDefined),
      "fixture should contain full conversions")
    // aggregate parity with the batch query's per-step user counts
    val batchCounts = graft.queries.AnalyticsQueries.funnelSteps(spark, dir)
      .select("step", "n_users").as[(Long, Long)].collect().toMap
    assert(batchCounts(1L) == streamed.values.count(_._1.isDefined))
    assert(batchCounts(2L) == streamed.values.count(_._2.isDefined))
    assert(batchCounts(3L) == streamed.values.count(_._3.isDefined))
  }

  test("funnel horizon: an activity gap beyond the horizon splits a user into separate funnels") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import graft.streaming.FunnelMonitor.FunnelEvt
    val ms = MemoryStream[FunnelEvt]
    val q = graft.streaming.FunnelMonitor.track(ms.toDS(), horizonMs = 60000L)
      .writeStream.format("memory").queryName("funnelsplit").outputMode("append")
      .option("checkpointLocation", tmp("ckpt-funnelsplit")).start()
    // burst 1: view + click at ~1000 s
    ms.addData(FunnelEvt(1L, 1000000000L, "view"), FunnelEvt(1L, 1001000000L, "click"))
    q.processAllAvailable()
    // an unrelated user's event pushes the watermark past burst 1's
    // timeout while user 1 is silent — the first funnel closes WITHOUT
    // a purchase
    ms.addData(FunnelEvt(2L, 5000000000L, "view"))
    q.processAllAvailable()
    // burst 2: a fresh funnel for user 1, fully converting; sentinel
    // flushes everything
    ms.addData(
      FunnelEvt(1L, 6000000000L, "view"), FunnelEvt(1L, 6001000000L, "click"),
      FunnelEvt(1L, 6002000000L, "purchase"), FunnelEvt(3L, 10000000000000L, "view"))
    q.processAllAvailable()
    q.stop()
    val u1 = spark.table("funnelsplit")
      .filter(col("user_id") === 1L)
      .as[graft.streaming.FunnelMonitor.Conversion].collect()
      .map(c => (c.t_view, c.t_click, c.t_purchase)).sortBy(_._1)
    assert(u1.toSeq == Seq(
      (Some(1000000000L), Some(1001000000L), None),
      (Some(6000000000L), Some(6001000000L), Some(6002000000L))))
  }

  test("streaming A/B conversion z: known-count windows score exactly; degenerate window nulls z") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // window 0: variant 0 = 10 events 2 purchases, variant 1 = 10 events
    // 5 purchases; window 1: ALL events purchases (pooled p = 1 → z NULL)
    val w0 = (0 until 10).flatMap(i => Seq(
      (if (i < 2) "purchase" else "view", i * 1000L, 2L * i),
      (if (i < 5) "purchase" else "view", i * 1000L, 2L * i + 1)))
    val w1 = (0 until 4).map(i => ("purchase", 600000L + i * 1000L, i.toLong))
    val sentinel = ("view", 86400000L, 999L)
    val ms = MemoryStream[(String, Long, Long)]
    val q = graft.streaming.AbMonitor.conversionZ(ms.toDS())
      .writeStream.format("memory").queryName("abmon").outputMode("append")
      .option("checkpointLocation", tmp("ckpt-abmon")).start()
    ms.addData(w0.toIndexedSeq)
    q.processAllAvailable()
    ms.addData(w1.toIndexedSeq :+ sentinel)
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("bucket", "n0", "n1", "c0", "c1", "z", "srm_chi2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)), r.getDouble(6))).toSet
    val streamed = rows(spark.table("abmon"))
    // hand-computed: p0=0.2, p1=0.5, pooled 0.35 → z = 0.3/sqrt(0.35·0.65·0.2)
    val z0 = 0.3 / math.sqrt(0.35 * 0.65 * 0.2)
    val got0 = streamed.find(_._1 == 0L).get
    assert((got0._2, got0._3, got0._4, got0._5) == ((10L, 10L, 2L, 5L)))
    assert(math.abs(got0._6.get - z0) < 1e-12 && got0._7 == 0.0)
    // all-purchase window: zero pooled variance → NULL z, SRM still real
    val got1 = streamed.find(_._1 == 1L).get
    assert(got1._6.isEmpty && got1._4 == got1._2 && got1._5 == got1._3)
    // batch twin parity on the same rows (sans the sentinel, whose own
    // window the stream never finalizes) — exact, doubles included
    val batch = rows(graft.streaming.AbMonitor.conversionZBatch(
      (w0 ++ w1).toDF("event_type", "event_ms", "user_id")))
    assert(batch == streamed)
  }

  test("streaming drift vs frozen reference: replayed window scores exactly 0, shifted regime exactly 1.8") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // reference: 100 events uniform over values 0..9 → 10 bins × 10
    val reference = graft.streaming.DriftMonitor.referenceHistogram(
      (0 until 100).map(i => ("s", (i % 10).toDouble)).toDF("event_type", "value"))
    // window 0 replays the reference distribution exactly; window 1 is a
    // new constant regime far outside the reference grid (clamps to the
    // top bin); the off-reference sentinel advances the watermark only
    val w0 = (0 until 100).map(i => ("s", i * 1000L, (i % 10).toDouble))
    val w1 = (0 until 50).map(i => ("s", 600000L + i * 1000L, 1000.0))
    val sentinel = ("zz", 86400000L, 0.0)
    val ms = MemoryStream[(String, Long, Double)]
    val q = graft.streaming.DriftMonitor.scoreDrift(ms.toDS(), reference)
      .writeStream.format("memory").queryName("driftmon").outputMode("append")
      .option("checkpointLocation", tmp("ckpt-driftmon")).start()
    ms.addData(w0.toIndexedSeq)
    q.processAllAvailable()
    ms.addData(w1.toIndexedSeq :+ sentinel)
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("event_type", "bucket", "n_window", "n_ref", "l1_drift")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    val streamed = rows(spark.table("driftmon"))
    // an identical distribution cancels exactly in the rational fold;
    // the shifted window is 50 events in bin 9 vs uniform reference:
    // (9·|0−10·50| + |50·100−10·50|) / (50·100) = 9000/5000 = 1.8
    assert(streamed == Set(("s", 0L, 100L, 100L, 0.0), ("s", 1L, 50L, 100L, 1.8)))
    // the off-reference series never scores (no reference to drift from)
    assert(!spark.table("driftmon").select("event_type").as[String].collect().contains("zz"))
    // batch twin parity on the same rows — exact, doubles included
    val batch = rows(graft.streaming.DriftMonitor.scoreDriftBatch(
      (w0 ++ w1).toDF("event_type", "event_ms", "value"), reference))
    assert(batch == streamed)
  }

  test("streaming mixture monitor: on-target window scores a driver-replayed L1, flooded window alarms; batch parity exact") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // frozen target: sources a/b with token shares 0.64/0.36
    val target = graft.streaming.MixMonitor.targetMixture(
      Seq(("a", 64L), ("b", 36L)).toDF("source", "n_tok"))
    // driver replay of the fixed-point normalizer
    val wfpA = math.floor(math.sqrt(64.0 / 100.0) * 1e6).toLong
    val wfpB = math.floor(math.sqrt(36.0 / 100.0) * 1e6).toLong
    val zfp = wfpA + wfpB
    // window 0: roughly on-target blend; window 1: source b floods
    val w0 = Seq(("a", 0L, 4000L), ("b", 1000L, 3000L))
    val w1 = Seq(("a", 600000L, 100L), ("b", 600001L, 5000L))
    val sentinel = ("a", 86400000L, 1L)
    val ms = MemoryStream[(String, Long, Long)]
    val q = graft.streaming.MixMonitor.scoreMix(ms.toDS(), target)
      .writeStream.format("memory").queryName("mixmon").outputMode("append")
      .option("checkpointLocation", tmp("ckpt-mixmon")).start()
    ms.addData(w0.toIndexedSeq)
    q.processAllAvailable()
    ms.addData(w1.toIndexedSeq :+ sentinel)
    q.processAllAvailable()
    q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("bucket", "n_tok", "l1_mix", "off_target")
      .as[(Long, Long, Double, Boolean)].collect().toSet
    val streamed = rows(spark.table("mixmon"))
    // driver replay of the positive-part L1 identity
    def l1(toks: Map[String, Long]): Double = {
      val c = toks.values.sum
      val num = Seq("a" -> wfpA, "b" -> wfpB).map { case (s, w) =>
        math.max(toks.getOrElse(s, 0L) * zfp - w * c, 0L)
      }.sum
      2.0 * num.toDouble / (c.toDouble * zfp.toDouble)
    }
    val exp0 = l1(Map("a" -> 4000L, "b" -> 3000L))
    val exp1 = l1(Map("a" -> 100L, "b" -> 5000L))
    assert(streamed == Set(
      (0L, 7000L, exp0, exp0 >= graft.streaming.MixMonitor.AlarmL1),
      (1L, 5100L, exp1, exp1 >= graft.streaming.MixMonitor.AlarmL1)))
    // the blend near target stays quiet; the flooded window alarms
    assert(exp0 < graft.streaming.MixMonitor.AlarmL1)
    assert(exp1 >= graft.streaming.MixMonitor.AlarmL1)
    // batch twin parity on the same rows — exact, doubles included
    val batch = rows(graft.streaming.MixMonitor.scoreMixBatch(
      (w0 ++ w1).toDF("source", "event_ms", "n_tok"), target))
    assert(batch == streamed)
  }

  test("streaming volume anomaly agrees with the batch query exactly (RocksDB store)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val dir = "/root/testdata/sf0.001"
      // same fixture discipline as the mean scorer: the batch query's own
      // (series, bucket, count) frame, two micro-batches split at the
      // median bucket so the ring provably carries across batches
      val counts = graft.queries.AnalyticsQueries.bucketMeans(spark, dir)
        .select(col("event_type"), col("b"), col("cnt"))
        .as[(String, Long, Long)].collect().sortBy(_._2)
      val (first, second) = counts.splitAt(counts.length / 2)
      val ms = MemoryStream[(String, Long, Long)]
      val q = graft.streaming.AnomalyDetect.scoreVolumes(ms.toDS())
        .writeStream.format("memory").queryName("volscores").outputMode("append")
        .option("checkpointLocation", tmp("ckpt-volscore")).start()
      ms.addData(first.toIndexedSeq)
      q.processAllAvailable()
      ms.addData(second.toIndexedSeq)
      q.processAllAvailable()
      q.stop()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select("event_type", "bucket", "cnt", "n_window", "z", "is_anomaly")
        .as[(String, Long, Long, Long, Double, Boolean)].collect().toSet
      val streamed = rows(spark.table("volscores"))
      val batch = rows(graft.queries.AnalyticsQueries.volumeAnomaly(spark, dir))
      assert(streamed == batch,
        s"stream(${streamed.size}) != batch(${batch.size}); " +
          s"onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
      assert(batch.nonEmpty, "fixture should produce scored buckets")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
