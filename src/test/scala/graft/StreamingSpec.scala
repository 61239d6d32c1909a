package graft

import graft.config.AppConfig
import graft.fixtures.LogGen
import graft.sink.Sinks.ParquetTableSink
import graft.streaming.Pipeline

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files

/** Streaming parity (SURVEY §5.4): MemoryStream of generator-format
  * records → parse → watermark → windowed agg / late router, fully
  * deterministic (seeded generator, AvailableNow trigger, no wall clock).
  * Reproduces the reference's `--percent-late/--late-time` scenario
  * (timestream_kinesis_data_gen.py:50-59). */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("windowed aggregation over a memory stream matches batch semantics") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[String]
    val recs = LogGen.records(n = 100, seed = 7L)
    ms.addData(recs: _*)
    val cfg = AppConfig()
    val agg = Pipeline.windowedStats(
      Pipeline.parsed(ms.toDF().withColumnRenamed("value", "raw"), cfg), cfg)
    val q = agg.writeStream
      .format("memory").queryName("win_agg").outputMode("complete")
      .option("checkpointLocation", tmp("ckpt-agg"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("win_agg")
    // 100 records, 1s apart → 11 distinct 10s windows; grouped by service/op
    val total = got.agg(sum("cnt")).as[Long].collect()(0)
    assert(total == 100L)
    // 100 records 1s apart from an epoch-aligned base → exactly 10 windows
    assert(got.select("window_start").distinct().count() == 10L)

    // streaming ↔ batch parity: the same records through the BATCH
    // windowing core must produce identical rows INCLUDING the float
    // aggregates — both paths compute avg as exact-decimal sum ÷ count
    // through double, so equality is exact, not approximate
    val batch = graft.operators.Windowing.tumblingStats(
      graft.functions.LogParse.parse(recs.toDF("raw"), "raw"),
      "event_time", Seq("callerservice", "operation"), 10000L, "latency")
    val batchSet = batch
      .select(col("window_start"), col("callerservice"), col("operation"),
        col("cnt"), col("min_value"), col("max_value"), col("avg_value"))
      .as[(java.sql.Timestamp, String, String, Long, Double, Double, Double)]
      .collect().toSet
    val streamSet = got
      .select(col("window_start"), col("callerservice"), col("operation"),
        col("cnt"), col("min_latency"), col("max_latency"), col("avg_latency"))
      .as[(java.sql.Timestamp, String, String, Long, Double, Double, Double)]
      .collect().toSet
    assert(streamSet == batchSet)
  }

  test("windowed pipeline on RocksDB state store (StreamBench's production config)") {
    // the exact config StreamBench pins for its rocksdb rows: provider +
    // changelog checkpointing + one bounded shared block cache — prove it
    // FUNCTIONS on the full pipeline, not just transformWithState
    // (StatefulSpec), so the recorded throughput numbers describe a
    // config this suite keeps working
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.streaming.stateStore.providerClass",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
      "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage",
      "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"
    )
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set(keys(0),
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      conf.set(keys(1), "true")
      conf.set(keys(2), "true")
      conf.set(keys(3), "512")
      val ms = MemoryStream[String]
      val recs = LogGen.records(n = 100, seed = 7L)
      ms.addData(recs: _*)
      val cfg = AppConfig()
      val agg = Pipeline.windowedStats(
        Pipeline.parsed(ms.toDF().withColumnRenamed("value", "raw"), cfg), cfg)
      val q = agg.writeStream
        .format("memory").queryName("win_agg_rocks").outputMode("complete")
        .option("checkpointLocation", tmp("ckpt-agg-rocks"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      val got = spark.table("win_agg_rocks")
      // same data as the hdfs-store test above: identical totals
      assert(got.agg(sum("cnt")).as[Long].collect()(0) == 100L)
      assert(got.select("window_start").distinct().count() == 10L)
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("append vs update on RocksDB: eviction parity and the attribution metrics stay observable") {
    // the round-12 BASELINE.md attribution's regression guard. Two
    // contracts: (1) eviction SEMANTICS are mode-symmetric — both output
    // modes remove the same state rows for the same data (append's
    // evict-and-emit scan vs update's by-key removal differ in COST,
    // never in what gets evicted); (2) the progress metrics the
    // attribution reads (allRemovalsTimeMs, commitTimeMs, the RocksDB
    // custom file-sync latency) stay present, so a Spark upgrade can't
    // silently blind StreamBench's append_state/update_state JSON.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val conf = spark.conf
    val pk = "spark.sql.streaming.stateStore.providerClass"
    val saved = conf.getOption(pk)
    try {
      conf.set(pk,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      val cfg = AppConfig()
      def run(mode: String): (Long, Boolean) = {
        val ms = MemoryStream[String]
        // two staged blocks -> two micro-batches, so the watermark from
        // batch 1 actually evicts windows during batch 2
        val recs = LogGen.records(n = 200, seed = 11L)
        val agg = Pipeline.windowedStats(
          Pipeline.parsed(ms.toDF().withColumnRenamed("value", "raw"), cfg), cfg)
        val q = agg.writeStream.format("noop").outputMode(mode)
          .option("checkpointLocation", tmp(s"ckpt-evict-$mode"))
          .start()
        ms.addData(recs.take(100): _*)
        q.processAllAvailable()
        ms.addData(recs.drop(100): _*)
        q.processAllAvailable()
        val sos = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
        q.stop()
        val removed = sos.map(_.numRowsRemoved).sum
        val metricsPresent = sos.nonEmpty &&
          sos.forall(s => s.customMetrics.containsKey("rocksdbCommitFileSyncLatencyMs")) &&
          sos.map(_.commitTimeMs).sum >= 0 && sos.map(_.allRemovalsTimeMs).sum >= 0
        (removed, metricsPresent)
      }
      val (removedAppend, okAppend) = run("append")
      val (removedUpdate, okUpdate) = run("update")
      assert(okAppend && okUpdate,
        "state-operator + RocksDB custom metrics must stay observable")
      assert(removedAppend == removedUpdate,
        s"modes must evict the same rows: append=$removedAppend update=$removedUpdate")
      assert(removedAppend > 0, "fixture must actually trigger eviction")
    } finally saved.fold(conf.unset(pk))(conf.set(pk, _))
  }

  test("observed metrics report per-batch row count and max event time") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[String]
    val recs = LogGen.records(n = 50, seed = 11L)
    ms.addData(recs: _*)
    val cfg = AppConfig()
    val observed = Pipeline.withMetrics(
      Pipeline.parsed(ms.toDF().withColumnRenamed("value", "raw"), cfg))
    val q = Pipeline.windowedStats(observed, cfg).writeStream
      .format("memory").queryName("obs_agg").outputMode("complete")
      .option("checkpointLocation", tmp("ckpt-obs"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val m = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("pipeline"))).lastOption
      .getOrElse(fail("no 'pipeline' observed metrics in any progress"))
    assert(m.getAs[Long]("n_rows") == 50L)
    assert(m.getAs[Long]("n_null_time") == 0L)
    // the observed max must equal the actual max of the parsed batch
    val batchMax = graft.functions.LogParse
      .parse(recs.toDF("raw"), "raw")
      .agg(max(col("time"))).head.getLong(0)
    assert(m.getAs[Long]("max_event_ms") == batchMax)
  }

  test("update mode re-emits a window for an in-grace late record (Flink allowedLateness analog)") {
    // Flink's allowedLateness(5s) RE-FIRES a closed window when a record
    // arrives within the grace period (StreamingJob.java:149). Spark's
    // closest analog is Update output mode: a window whose state is still
    // live (window end > watermark) re-emits its updated row. This test
    // pins that substitution down: the window fires with cnt=2, then an
    // out-of-order record 4s behind the watermark lands in the still-open
    // window and the window re-fires with cnt=3.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[String]
    val base = 1700000000000L // epoch-aligned 10s boundary
    val cfg = AppConfig() // 10s window, 5s lateness
    def rec(offMs: Long) = LogGen.record("GetTable", 1L, "GLUE", "1.0", base + offMs)
    val agg = Pipeline.windowedStats(
      Pipeline.parsed(ms.toDF().withColumnRenamed("value", "raw"), cfg), cfg)
    val q = agg.writeStream
      .format("memory").queryName("refire").outputMode("update")
      .option("checkpointLocation", tmp("ckpt-refire"))
      .start()
    // batch 1: two records in window [base, base+10s) plus one at +11s
    // that drags the watermark to +6s — past the first two, window open
    ms.addData(rec(0), rec(1000), rec(11000))
    q.processAllAvailable()
    // batch 2: +2s record is 4s behind the watermark (late!) but its
    // window end (+10s) is still ahead of it — accepted, window re-fires
    ms.addData(rec(2000))
    q.processAllAvailable()
    q.stop()
    val w0 = new java.sql.Timestamp(base)
    val emissions = spark.table("refire")
      .filter(col("window_start") === lit(w0))
      .select("cnt").as[Long].collect().sorted.toSeq
    assert(emissions == Seq(2L, 3L),
      s"expected first fire cnt=2 then re-fire cnt=3, got $emissions")
  }

  test("late router reproduces --percent-late: late records hit the dead letter") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[String]
    val base = 1700000000000L
    // batch 1 establishes the watermark (in-order, no late injection);
    // batch 2 interleaves 25% records timestamped 600s in the past —
    // the reference generator's --percent-late 25 --late-time 600
    val batch1 = LogGen.records(n = 100, seed = 11L, baseTimeMs = base)
    val batch2 = LogGen.records(n = 100, seed = 13L, baseTimeMs = base + 100000L,
      percentLate = 25, lateSeconds = 600)
    def timesOf(rs: Seq[String]) = rs.map(_.linesIterator
      .find(_.startsWith("EndTime=")).get.stripPrefix("EndTime=").toLong)
    val wmAfter1 = timesOf(batch1).max
    val cutoff = wmAfter1 - 5000L
    val expectedLate = timesOf(batch2).count(_ < cutoff)
    assert(expectedLate > 0) // the scenario actually injects lateness

    val sinkDir = tmp("sink")
    val router = new Pipeline.LateRouter(5000L,
      new ParquetTableSink(s"$sinkDir/main"), new ParquetTableSink(s"$sinkDir/late"))
    val q = Pipeline.parsed(ms.toDF().withColumnRenamed("value", "raw"), AppConfig())
      .writeStream
      .option("checkpointLocation", tmp("ckpt-router"))
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) => router.process(df, id))
      .start()
    ms.addData(batch1: _*)
    q.processAllAvailable()
    ms.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()

    val late = spark.read.parquet(s"$sinkDir/late/data")
    val main = spark.read.parquet(s"$sinkDir/main/data")
    assert(late.count() == expectedLate)
    assert(main.count() == 200L - expectedLate)
    // every late row really is older than the batch-1 watermark cutoff
    assert(late.filter(col("time") >= cutoff).count() == 0)
  }

  test("LateRouter runs the source lineage exactly once per batch") {
    // the cache() in process() exists so the two sink writes and the
    // watermark-advance max all read one materialization; an accumulator
    // in the lineage counts how many times each source row is computed
    val acc = spark.sparkContext.longAccumulator("source-computes")
    val tick = udf { (t: Long) => acc.add(1L); t }
    val batch = spark.range(100)
      .select(tick(col("id") * 1000L).as("time"), col("id").as("v"))
    val counting = new graft.sink.Sinks.RecordSink {
      override def write(b: org.apache.spark.sql.DataFrame, id: Long): (Long, Long) =
        (b.count(), 0L)
    }
    val router = new Pipeline.LateRouter(5000L, counting, counting,
      initialWatermarkMs = Some(50000L)) // cutoff 45s: batch splits both ways
    router.process(batch, 0L)
    assert(acc.value == 100L,
      s"each source row must be computed exactly once, got ${acc.value} computes")
  }

  test("file source + checkpoint: end-to-end, restart processes ONLY new files") {
    val srcDir = tmp("src")
    LogGen.records(n = 10, seed = 3L).zipWithIndex.foreach { case (r, i) =>
      Files.writeString(java.nio.file.Path.of(srcDir, s"rec_$i.log"), r)
    }
    val sinkDir = tmp("fsink")
    val ckpt = tmp("ckpt-file")
    val router = new Pipeline.LateRouter(5000L,
      new ParquetTableSink(s"$sinkDir/main"), new ParquetTableSink(s"$sinkDir/late"))
    val q = Pipeline.start(spark, new Pipeline.FileLogSource(srcDir),
      AppConfig(), router, ckpt, availableNow = true)
    q.awaitTermination(120000)
    assert(spark.read.parquet(s"$sinkDir/main/data").count() == 10L)

    // recovery (O11): drop 5 more files, restart from the SAME checkpoint
    // — the already-processed 10 must NOT be re-sent to the sink
    LogGen.records(n = 5, seed = 21L, baseTimeMs = 1700000020000L)
      .zipWithIndex.foreach { case (r, i) =>
        Files.writeString(java.nio.file.Path.of(srcDir, s"more_$i.log"), r)
      }
    val q2 = Pipeline.start(spark, new Pipeline.FileLogSource(srcDir),
      AppConfig(), router, ckpt, availableNow = true)
    q2.awaitTermination(120000)
    assert(spark.read.parquet(s"$sinkDir/main/data").count() == 15L)
  }

  test("restarted router with bootstrapped watermark flags late records immediately") {
    val srcDir = tmp("bsrc")
    val base = 1700000000000L
    LogGen.records(n = 10, seed = 31L, baseTimeMs = base).zipWithIndex.foreach {
      case (r, i) => Files.writeString(java.nio.file.Path.of(srcDir, s"a_$i.log"), r)
    }
    val sinkDir = tmp("bsink")
    val ckpt = tmp("bckpt")
    val r1 = new Pipeline.LateRouter(5000L,
      new ParquetTableSink(s"$sinkDir/main"), new ParquetTableSink(s"$sinkDir/late"))
    Pipeline.start(spark, new Pipeline.FileLogSource(srcDir), AppConfig(), r1, ckpt,
      availableNow = true).awaitTermination(120000)

    // simulate a crash: NEW router instance; one very-late file arrives.
    // Without bootstrap the late record would slip into main (watermark
    // reset); with bootstrap it must hit the dead letter.
    Files.writeString(java.nio.file.Path.of(srcDir, "late_0.log"),
      LogGen.record("GetTable", 9L, "S3", "1.0", base - 600000L))
    val wm = Pipeline.LateRouter.bootstrapWatermark(spark, s"$sinkDir/main/data")
    assert(wm.contains(base + 9000L))
    val r2 = new Pipeline.LateRouter(5000L,
      new ParquetTableSink(s"$sinkDir/main"), new ParquetTableSink(s"$sinkDir/late"),
      initialWatermarkMs = wm)
    Pipeline.start(spark, new Pipeline.FileLogSource(srcDir), AppConfig(), r2, ckpt,
      availableNow = true).awaitTermination(120000)
    assert(spark.read.parquet(s"$sinkDir/late/data").count() == 1L)
    assert(spark.read.parquet(s"$sinkDir/main/data").count() == 10L)
  }

  test("update-mode windowed stats re-fires a revised window for a late-but-in-grace record (RocksDB, restart)") {
    val srcDir = tmp("updsrc")
    val base = 1700000000000L // 10s-aligned
    LogGen.records(n = 10, seed = 13L, baseTimeMs = base).zipWithIndex.foreach {
      case (r, i) => Files.writeString(java.nio.file.Path.of(srcDir, s"a_$i.log"), r)
    }
    // a guaranteed-present key in window [base, base+10s) so the re-fire
    // provably REVISES existing state rather than creating a fresh window
    Files.writeString(java.nio.file.Path.of(srcDir, "k_0.log"),
      LogGen.record("GetTable", 98L, "S3", "1.0", base + 2000L))
    val outDir = tmp("updout")
    val ckpt = tmp("updckpt")
    val cfg = AppConfig() // stateStoreProvider defaults to rocksdb
    def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit =
      df.withColumn("_batch", lit(id)).write.mode("append").parquet(outDir)
    Pipeline.startWindowedUpdate(spark, new Pipeline.FileLogSource(srcDir), cfg,
      sink _, ckpt, availableNow = true).awaitTermination(120000)
    // snapshot run-1 emissions to the driver NOW — a lazily re-listed
    // parquet read here would also see run 2's files
    val first = spark.read.parquet(outDir).collect()
    assert(first.map(_.getAs[Long]("cnt")).sum == 11L)
    val maxB1 = first.map(_.getAs[Long]("_batch")).max
    // Flink re-fire scenario (StreamingJob.java:149): a 3s-late record —
    // max event time is base+9s, this lands at base+6s — inside the 5s grace
    Files.writeString(java.nio.file.Path.of(srcDir, "late_0.log"),
      LogGen.record("GetTable", 99L, "S3", "1.0", base + 6000L))
    // restart from the same checkpoint: state must reload from RocksDB
    Pipeline.startWindowedUpdate(spark, new Pipeline.FileLogSource(srcDir), cfg,
      sink _, ckpt, availableNow = true).awaitTermination(120000)
    val revised = spark.read.parquet(outDir).filter(col("_batch") > maxB1).collect()
    // update mode emits ONLY the changed window — exactly one revised row
    assert(revised.length == 1, s"expected 1 re-fired row, got ${revised.toSeq}")
    val r = revised(0)
    // the parser lowercases the whole record (str_to_map over lower(raw))
    assert(r.getAs[String]("callerservice") == "s3" &&
      r.getAs[String]("operation") == "gettable")
    val prior = first.filter(x => x.getAs[String]("callerservice") == "s3" &&
      x.getAs[String]("operation") == "gettable" &&
      x.getAs[java.sql.Timestamp]("window_start") ==
        r.getAs[java.sql.Timestamp]("window_start"))
      .map(_.getAs[Long]("cnt")).max
    assert(prior >= 1L)
    // revised cnt = prior + 1: the pre-restart window state survived in
    // RocksDB (a lost store would re-fire cnt == 1)
    assert(r.getAs[Long]("cnt") == prior + 1L)
  }

  test("re-fire into UpsertSink: standing table holds each window's LATEST revision only") {
    val srcDir = tmp("rfusrc")
    val base = 1700000000000L
    LogGen.records(n = 10, seed = 13L, baseTimeMs = base).zipWithIndex.foreach {
      case (r, i) => Files.writeString(java.nio.file.Path.of(srcDir, s"a_$i.log"), r)
    }
    Files.writeString(java.nio.file.Path.of(srcDir, "k_0.log"),
      LogGen.record("GetTable", 98L, "S3", "1.0", base + 2000L))
    val tableDir = tmp("rfutab") + "/windows"
    val ckpt = tmp("rfuckpt")
    val cfg = AppConfig()
    val ups = new graft.streaming.UpsertSink(tableDir,
      keyCols = Seq("window_start", "callerservice", "operation"),
      versionCols = Seq("cnt"),
      valueCols = Seq("min_latency", "max_latency", "avg_latency"))
    def run(): Unit = Pipeline.startWindowedUpdate(
      spark, new Pipeline.FileLogSource(srcDir), cfg,
      (df, id) => ups.merge(df, id), ckpt, availableNow = true)
      .awaitTermination(120000)
    run()
    val t1 = spark.read.parquet(tableDir)
    val prior = t1.filter(col("callerservice") === "s3" && col("operation") === "gettable")
      .select(col("cnt")).as[Long].collect()
    assert(prior.length == 1) // upsert: ONE row per key, not a changelog
    // the in-grace late record re-fires its window; MERGE must REPLACE
    // the standing row, not append a second revision
    Files.writeString(java.nio.file.Path.of(srcDir, "late_0.log"),
      LogGen.record("GetTable", 99L, "S3", "1.0", base + 6000L))
    run()
    val t2 = spark.read.parquet(tableDir)
      .filter(col("callerservice") === "s3" && col("operation") === "gettable")
      .select(col("cnt")).as[Long].collect()
    assert(t2.length == 1, s"expected one upserted row per key, got ${t2.length}")
    assert(t2(0) == prior(0) + 1L,
      s"standing row must hold the revised count (${prior(0)} + 1), got ${t2(0)}")
  }

  test("refire mode dead-letter: beyond-grace records land durable while in-grace ones revise windows") {
    // Main --mode refire's topology: update-mode upsert as the delivery
    // query + a LateRouter (on-time -> DiscardSink) purely for the dead
    // letter — the update-mode window operator DROPS beyond-grace rows
    val srcDir = tmp("rfdsrc")
    val base = 1700000000000L
    LogGen.records(n = 10, seed = 13L, baseTimeMs = base).zipWithIndex.foreach {
      case (r, i) => Files.writeString(java.nio.file.Path.of(srcDir, s"a_$i.log"), r)
    }
    val sinkDir = tmp("rfdsink")
    val cfg = AppConfig()
    val ups = new graft.streaming.UpsertSink(s"$sinkDir/windows",
      keyCols = Seq("window_start", "callerservice", "operation"),
      versionCols = Seq("cnt"),
      valueCols = Seq("min_latency", "max_latency", "avg_latency"))
    def runBoth(): Unit = {
      Pipeline.startWindowedUpdate(spark, new Pipeline.FileLogSource(srcDir), cfg,
        (df, id) => ups.merge(df, id), s"$sinkDir/ckpt", availableNow = true)
        .awaitTermination(120000)
      // Main --mode refire's restart recovery: bootstrap the router's
      // watermark from the delivered windows table (max window_start)
      val windowsWm: Option[Long] =
        try {
          val r = spark.read.parquet(s"$sinkDir/windows")
            .agg(max(expr("unix_millis(window_start)"))).collect()(0)
          if (r.isNullAt(0)) None else Some(r.getLong(0))
        } catch { case scala.util.control.NonFatal(_) => None }
      Pipeline.start(spark, new Pipeline.FileLogSource(srcDir), cfg,
        new Pipeline.LateRouter(cfg.latenessSeconds * 1000L,
          new graft.sink.Sinks.DiscardSink,
          new ParquetTableSink(s"$sinkDir/late"),
          initialWatermarkMs = windowsWm),
        s"$sinkDir/ckpt-late", availableNow = true)
        .awaitTermination(120000)
    }
    runBoth()
    // one BEYOND-grace record (60s < max event time - 5s grace): the
    // update window drops it; the dead letter must keep it
    Files.writeString(java.nio.file.Path.of(srcDir, "verylate_0.log"),
      LogGen.record("GetTable", 99L, "S3", "1.0", base - 60000L))
    runBoth()
    val late = spark.read.parquet(s"$sinkDir/late/data").collect()
    assert(late.length == 1 && late(0).getAs[Long]("time") == base - 60000L,
      s"beyond-grace record must reach the dead letter, got ${late.toSeq}")
    // and it must NOT have revised any window
    val wins = spark.read.parquet(s"$sinkDir/windows")
    assert(wins.agg(sum("cnt")).as[Long].collect()(0) == 10L)
  }

  test("bootstrapWatermark: missing/corrupt sink path yields None; fatal errors propagate") {
    // missing path: no sink has ever been written — legitimately no watermark
    assert(Pipeline.LateRouter.bootstrapWatermark(spark, tmp("nope") + "/does/not/exist").isEmpty)
    // corrupt parquet: a half-written file reads as AnalysisException/IOException
    // (NonFatal) — still None, not a crash
    val corruptDir = tmp("corruptwm")
    Files.write(java.nio.file.Path.of(corruptDir, "part-0.parquet"),
      Array[Byte](1, 2, 3, 4))
    assert(Pipeline.LateRouter.bootstrapWatermark(spark, corruptDir).isEmpty)
  }

  test("gzipped wire format: binaryFile source -> gunzip -> parse; corrupt payload dropped") {
    val srcDir = tmp("gzsrc")
    def gz(s: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(s.getBytes("UTF-8")); g.close(); bos.toByteArray
    }
    LogGen.records(n = 6, seed = 29L).zipWithIndex.foreach { case (r, i) =>
      Files.write(java.nio.file.Path.of(srcDir, s"rec_$i.gz"), gz(r))
    }
    // a corrupt gz payload must null out, not kill the query
    Files.write(java.nio.file.Path.of(srcDir, "corrupt.gz"),
      Array[Byte](0x1f, 0x8b.toByte, 1, 2, 3))
    val sinkDir = tmp("gzsink")
    val router = new Pipeline.LateRouter(5000L,
      new ParquetTableSink(s"$sinkDir/main"), new ParquetTableSink(s"$sinkDir/late"))
    val q = Pipeline.start(spark, new Pipeline.GzipFileLogSource(srcDir),
      AppConfig(), router, tmp("gzckpt"), availableNow = true)
    q.awaitTermination(120000)
    val main = spark.read.parquet(s"$sinkDir/main/data")
    assert(main.count() == 6L)
    assert(main.filter(col("latency").isNotNull).count() == 6L) // real parse happened
  }

  test("sliding windows: every record lands in window/slide = 2 windows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[String]
    ms.addData(LogGen.records(n = 40, seed = 17L): _*)
    val agg = Pipeline.slidingStats(
      Pipeline.parsed(ms.toDF().withColumnRenamed("value", "raw"), AppConfig()),
      winDur = "10 seconds", slide = "5 seconds")
    val q = agg.writeStream
      .format("memory").queryName("slide_agg").outputMode("complete")
      .option("checkpointLocation", tmp("ckpt-slide"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val total = spark.table("slide_agg").agg(sum("cnt")).as[Long].collect()(0)
    assert(total == 80L) // 40 records x 2 overlapping windows each
  }

  test("KinesisLogSource: reference-parity option translation; missing connector guarded") {
    val cfg = AppConfig(region = "eu-west-1", streamName = "mystream",
      pollIntervalMs = 250L, maxRecordsPerPoll = 5000, useAdaptiveReads = false)
    val opts = Pipeline.KinesisLogSource.options(cfg)
    assert(opts("kinesis.streamName") == "mystream")
    assert(opts("kinesis.region") == "eu-west-1")
    assert(opts("kinesis.endpointUrl") == "https://kinesis.eu-west-1.amazonaws.com")
    assert(opts("kinesis.startingPosition") == "LATEST")
    assert(opts("kinesis.getRecords.fetchIntervalMs") == "250")   // StreamingJob.java:90-91
    assert(opts("kinesis.getRecords.maxRecordsPerFetch") == "5000") // StreamingJob.java:93-94
    assert(opts("kinesis.consumerType") == "GetRecords")
    // adaptive reads stay on the polling consumer (the connector has no
    // adaptive-polling knob; EFO push would be a different consumer model,
    // voiding the GetRecords options) — documented semantic substitution
    assert(Pipeline.KinesisLogSource.options(cfg.copy(useAdaptiveReads = true))
      .apply("kinesis.consumerType") == "GetRecords")             // StreamingJob.java:84-88
    // a missing connector must fail with the actionable guard, not a raw
    // data-source lookup stack (the production name now resolves in-test
    // to FakeKinesisProvider — see KinesisEdgeSpec for the e2e path — so
    // the guard is exercised against a genuinely absent short name)
    val e = intercept[IllegalStateException] {
      new Pipeline.KinesisLogSource(cfg, format = "aws-kinesis-absent").stream(spark)
    }
    assert(e.getMessage.contains("connector"))
  }

  test("built-in session_window aggregation over a memory stream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[String]
    val base = 1700000000000L
    // account 1: burst of 3 within 5s, then 10 min silence, then 1 more
    val recs =
      Seq(0L, 2000L, 4000L, 600000L).map(off =>
        LogGen.record("GetTable", 1L, "GLUE", "1.0", base + off)) ++
      Seq(LogGen.record("GetTable", 2L, "S3", "2.0", base + 1000L))
    ms.addData(recs: _*)
    val agg = Pipeline.sessionStats(
      Pipeline.parsed(ms.toDF().withColumnRenamed("value", "raw"), AppConfig()),
      gap = "30 seconds")
    val q = agg.writeStream
      .format("memory").queryName("sess_win").outputMode("complete")
      .option("checkpointLocation", tmp("ckpt-sw"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val got = spark.table("sess_win")
      .select("awsaccountid", "n_events")
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(got("1") == Seq(1L, 3L)) // two sessions: the burst and the straggler
    assert(got("2") == Seq(1L))
  }

  test("ohlc bars: streaming agrees with batch bar-for-bar, and with the oracle-checked query") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    def bars(df: org.apache.spark.sql.DataFrame)
        : Set[(java.sql.Timestamp, String, Double, Double, Double, Double, Long, Double)] = df
      .select(col("bar_start"), col("event_type"), col("open"), col("high"),
        col("low"), col("close"), col("cnt"), col("volume"))
      .as[(java.sql.Timestamp, String, Double, Double, Double, Double, Long, Double)]
      .collect().toSet
    val evDf = graft.sources.Tables.events(spark, dir)
      .select(col("ts"), col("event_id"), col("event_type"), col("value"))
    val ev = evDf.as[(java.sql.Timestamp, Long, String, Double)].collect().toSeq

    val ms = MemoryStream[(java.sql.Timestamp, Long, String, Double)]
    ms.addData(ev: _*)
    val sdf = ms.toDF().toDF("ts", "event_id", "event_type", "value")
      .withWatermark("ts", "1 minute")
    val q = graft.operators.Windowing
      .ohlcBars(sdf, "ts", "event_type", "event_id", "value", "1 hour")
      .writeStream.format("memory").queryName("ohlc_stream").outputMode("complete")
      .option("checkpointLocation", tmp("ckpt-ohlc"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val streamSet = bars(spark.table("ohlc_stream"))
    val batchSet = bars(graft.operators.Windowing
      .ohlcBars(evDf, "ts", "event_type", "event_id", "value", "1 hour"))
    assert(streamSet == batchSet, "streaming OHLC must equal batch OHLC exactly")
    // the oracle-checked query uses arithmetic hour bucketing for
    // pushdown-safety; window("1 hour") is epoch-aligned, so the two
    // bucketings name the same bars
    val fromQuery = graft.queries.AnalyticsQueries.ohlcAgg(spark, dir)
      .select(timestamp_micros(col("hour") * 3600000000L).as("bar_start"),
        col("event_type"), col("open"), col("high"), col("low"),
        col("close"), col("cnt"), col("volume"))
    assert(bars(fromQuery) == batchSet,
      "the oracle-checked arithmetic bucketing must name the same bars")
  }

  test("stream-stream interval join: streamed views x clicks equals the batch join of the same frames") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    def side(t: String) = ev.filter(col("event_type") === t)
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = side("view").as[(Long, java.sql.Timestamp, Long)]
      .collect().sortBy(_._2.getTime)
    val clicks = side("click").as[(Long, java.sql.Timestamp, Long)]
      .collect().sortBy(_._2.getTime)
    val msV = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val msC = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = graft.streaming.StreamJoin.viewClickJoin(
      msV.toDS().toDF("user_id", "ts", "event_id"),
      msC.toDS().toDF("user_id", "ts", "event_id"))
    val q = joined.writeStream.format("memory").queryName("vc_join")
      .outputMode("append")
      .option("checkpointLocation", tmp("ckpt-vcjoin"))
      .start()
    // two in-order halves per side — inner joins emit eagerly, and the
    // sorted feed keeps both watermarks behind every future match
    val (v1, v2) = views.splitAt(views.length / 2)
    val (c1, c2) = clicks.splitAt(clicks.length / 2)
    msV.addData(v1.toIndexedSeq); msC.addData(c1.toIndexedSeq)
    q.processAllAvailable()
    msV.addData(v2.toIndexedSeq); msC.addData(c2.toIndexedSeq)
    q.processAllAvailable()
    q.stop()
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("view_id"), col("click_id"))
      .as[(Long, Long, Long)].collect().toSet
    val streamed = pairs(spark.table("vc_join"))
    val batch = pairs(graft.streaming.StreamJoin.viewClickJoin(side("view"), side("click")))
    assert(streamed == batch,
      s"stream(${streamed.size}) != batch(${batch.size}); " +
        s"onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    assert(batch.nonEmpty)
    // the range predicate really bounds every match
    spark.table("vc_join").as[(Long, Long, Long, java.sql.Timestamp, java.sql.Timestamp)]
      .collect().foreach { case (_, _, _, vts, cts) =>
        val d = cts.getTime - vts.getTime
        assert(d > 0 && d <= 600000L)
      }
  }

  test("left-outer stream-stream join: unconverted views emit null clicks after the watermark passes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = 1700000000000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val msV = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val msC = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val joined = graft.streaming.StreamJoin.viewClickJoinLeftOuter(
      msV.toDS().toDF("user_id", "ts", "event_id"),
      msC.toDS().toDF("user_id", "ts", "event_id"))
    val q = joined.writeStream.format("memory").queryName("vc_louter")
      .outputMode("append")
      .option("checkpointLocation", tmp("ckpt-vclouter"))
      .start()
    // user 1 converts (click 5 min after view); user 2 never clicks
    msV.addData((1L, ts(base), 10L), (2L, ts(base), 20L))
    msC.addData((1L, ts(base + 300000L), 11L))
    q.processAllAvailable()
    val eager = spark.table("vc_louter")
      .select(col("view_id"), col("click_id")).as[(Long, Option[Long])]
      .collect().toSet
    // the matched pair emits eagerly; the unmatched view must NOT have
    // emitted yet (its 10-min window could still fill)
    assert(eager.contains((10L, Some(11L))))
    assert(!eager.exists(_._1 == 20L),
      "unmatched view emitted before the watermark could rule out a late click")
    // advance BOTH watermarks far past view_ts + 10 min -> null emission
    msV.addData((9L, ts(base + 3600000L), 90L))
    msC.addData((9L, ts(base + 3600000L), 91L))
    q.processAllAvailable()
    q.stop()
    val all = spark.table("vc_louter")
      .select(col("view_id"), col("click_id")).as[(Long, Option[Long])]
      .collect().toSet
    assert(all.contains((20L, None)),
      s"unconverted view must emit with null click after the watermark; got $all")
    assert(!all.contains((10L, None)), "a matched view must not also emit a null row")
  }

  test("streaming session_window parity: append-mode watermarked sessions equal the batch session_agg exactly") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"))
      .as[(Long, java.sql.Timestamp)].collect().sortBy(_._2.getTime)
    val (first, second) = ev.splitAt(ev.length / 2)
    val maxTs = ev.map(_._2.getTime).max
    val ms = MemoryStream[(Long, java.sql.Timestamp)]
    val q = graft.streaming.SessionWindows
      .sessionize(ms.toDS().toDF("user_id", "ts"))
      .writeStream.format("memory").queryName("sess_parity").outputMode("append")
      .option("checkpointLocation", tmp("ckpt-sess-parity"))
      .start()
    // two in-order halves (the sorted split keeps every batch-2 event at
    // or after batch-1's max, so the 10-min watermark drops nothing),
    // then two far-future sentinels: the first advances the watermark
    // past every real session's close, the second triggers the flush
    ms.addData(first.toIndexedSeq)
    q.processAllAvailable()
    ms.addData(second.toIndexedSeq)
    q.processAllAvailable()
    ms.addData((-1L, new java.sql.Timestamp(maxTs + 30L * 86400000L)))
    q.processAllAvailable()
    ms.addData((-1L, new java.sql.Timestamp(maxTs + 31L * 86400000L)))
    q.processAllAvailable()
    q.stop()
    def sessions(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSet
    val streamed = sessions(spark.table("sess_parity"))
    // the hand-rolled lag/cumsum batch query (the oracle-gated one)
    val batch = sessions(graft.queries.AnalyticsQueries.sessionAgg(spark, dir))
    assert(streamed == batch,
      s"stream(${streamed.size}) != batch(${batch.size}); " +
        s"onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    assert(batch.nonEmpty)
    // every user's sessions are disjoint and gap-separated by > 1h
    streamed.groupBy(_._1).foreach { case (_, ss) =>
      val sorted = ss.toSeq.sortBy(_._2.getTime)
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(b._2.getTime - a._3.getTime > 3600000L)
        case _ =>
      }
    }
  }

  test("tombstone-aware streaming ANN serving: a takedown stops surfacing on the NEXT micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.SimilarityQueries
    val idx = tmp("ann_takedown_idx")
    q.buildIvfIndex(spark, dir, idx)
    val queryVecs = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val ms = MemoryStream[(Long, Seq[Float])]
    val outDir = tmp("ann_takedown_out")
    val query = graft.streaming.AnnServe.start(
      spark, ms.toDF().toDF("vec_id", "embedding"), idx,
      (df, id) => df.write.mode("append").parquet(s"$outDir/b$id"),
      tmp("ann_takedown_ckpt"), tombstoneAware = true)
    // batch 1: full index
    ms.addData(queryVecs: _*)
    query.processAllAvailable()
    val batch1 = spark.read.parquet(s"$outDir/b*")
      .collect().map(r => (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue))
    assert(batch1.nonEmpty)
    // takedown: retire every vid the first batch surfaced, mid-stream
    import spark.implicits._
    val victims = batch1.map(_._2).distinct.toSeq.toDF("vec_id")
    q.ivfIndexDelete(spark, idx, victims)
    val victimSet = batch1.map(_._2).toSet
    // batch 2, same queries: none of the retired vids may surface —
    // no stream restart, the tombstones were re-read for this batch
    ms.addData(queryVecs.map { case (id, e) => (id + 1000L, e) }: _*)
    query.processAllAvailable()
    query.stop()
    val batch2 = spark.read.parquet(s"$outDir/b*")
      .filter(col("qid") >= 1000L)
      .collect().map(r => r.getAs[Number]("vid").longValue)
    assert(batch2.nonEmpty, "survivors must still serve the second batch")
    assert(batch2.toSet.intersect(victimSet).isEmpty,
      s"retired vids surfaced post-takedown: ${batch2.toSet.intersect(victimSet).take(3)}")
  }

  test("streaming LSH near-dup serving: parity with the batch pair set; a takedown " +
      "stops matching on the NEXT micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.SimilarityQueries
    val idx = tmp("lsh_serve_idx")
    q.buildLshIndex(spark, dir, idx) // base slice only (doc_id % 4 != 0)
    // the delta slice plays the query stream, split over two batches
    val queryDocs = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val ms = MemoryStream[(Long, String)]
    val outDir = tmp("lsh_serve_out")
    val query = graft.streaming.LshServe.start(
      spark, ms.toDF().toDF("doc_id", "text"), idx,
      (df, id) => df.write.mode("overwrite").parquet(s"$outDir/b$id"),
      tmp("lsh_serve_ckpt"), tombstoneAware = true)
    val (first, second) = queryDocs.splitAt(queryDocs.size / 2)
    ms.addData(first: _*)
    query.processAllAvailable()
    ms.addData(second: _*)
    query.processAllAvailable()
    def norm(r: org.apache.spark.sql.Row) = {
      val (a, b) = (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue)
      (math.min(a, b), math.max(a, b))
    }
    val streamed = spark.read.parquet(s"$outDir/b*").collect().map(norm).toSet
    // parity: the union of per-batch candidates == the full-corpus LSH
    // pair set restricted to pairs with exactly one delta side (the
    // standing index holds only the base slice; within-batch pairs are
    // by contract the ingest gate's job, not this edge's)
    val expected = q.minhashLsh(spark, dir)
      .filter((col("doc_a") % 4 === 0) =!= (col("doc_b") % 4 === 0))
      .collect().map(norm).toSet
    assert(expected.nonEmpty)
    assert(streamed == expected,
      s"stream(${streamed.size}) != batch(${expected.size}); " +
        s"onlyStream=${(streamed -- expected).take(3)} " +
        s"onlyBatch=${(expected -- streamed).take(3)}")

    // takedown: retire every standing doc that matched, mid-stream —
    // the SAME queries re-sent must come back empty on the next batch
    import spark.implicits._
    val victims = streamed.flatMap(p => Seq(p._1, p._2))
      .filter(_ % 4 != 0).toSeq
    q.lshIndexDelete(spark, idx, victims.toDF("doc_id"))
    ms.addData(queryDocs: _*)
    query.processAllAvailable()
    query.stop()
    val post = spark.read.parquet(s"$outDir/b2").collect().map(norm).toSet
    assert(post.flatMap(p => Seq(p._1, p._2)).intersect(victims.toSet).isEmpty,
      s"retired standing docs surfaced post-takedown: ${post.take(3)}")
    assert(post.isEmpty,
      "every batch-1/2 match was retired, so the re-sent queries must match nothing")
  }

  test("append-during-serve: new postings surface on the NEXT micro-batch, centroids stay frozen") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.SimilarityQueries
    val idx = tmp("ann_append_idx")
    q.buildIvfIndexBase(spark, dir, idx) // base slice only (vec_id % 4 != 0)
    val queryVecs = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val ms = MemoryStream[(Long, Seq[Float])]
    val outDir = tmp("ann_append_out")
    val query = graft.streaming.AnnServe.start(
      spark, ms.toDF().toDF("vec_id", "embedding"), idx,
      (df, id) => df.write.mode("append").parquet(s"$outDir/b$id"),
      tmp("ann_append_ckpt"))
    // the SAME qids in both batches (so the serving plan's self-match
    // exclusion behaves identically), separated by per-batch sink dirs
    def rows(batchId: Long) = spark.read.parquet(s"$outDir/b$batchId")
      .collect()
      .map(r => (r.getAs[Number]("qid").longValue,
        r.getAs[Number]("vid").longValue, r.getAs[Double]("cos")))
      .toSet
    // batch 1: served from the base index
    ms.addData(queryVecs: _*)
    query.processAllAvailable()
    val served1 = rows(0L)
    assert(served1.nonEmpty)
    // mid-stream APPEND — no restart: the posting read is per-batch, so
    // the delta must surface on the NEXT micro-batch; the trained
    // centroids stay frozen by contract (the stream's cached centRow is
    // never re-read — append routes through the same stored centroids,
    // so frozen-centroid serving and batch serving still agree)
    q.appendIvfIndex(spark, dir, idx)
    ms.addData(queryVecs: _*)
    query.processAllAvailable()
    query.stop()
    val served2 = rows(1L)
    // parity with the batch served query over the appended index
    val batchAppended = q.annIvfServe(spark, dir, idx)
      .collect()
      .map(r => (r.getAs[Number]("qid").longValue,
        r.getAs[Number]("vid").longValue, r.getAs[Double]("cos")))
      .toSet
    assert(served2 == batchAppended,
      s"post-append stream != batch over appended index; " +
        s"onlyStream=${(served2 -- batchAppended).take(3)} " +
        s"onlyBatch=${(batchAppended -- served2).take(3)}")
    // the append actually changed answers AND delta vectors surface
    // (pinned empirically for this fixture: 5 of 30 rows are delta)
    assert(served2 != served1, "appended postings must be visible next batch")
    assert(served2.exists(_._2 % 4 == 0),
      "an appended (delta-slice) vector must surface in some top-3")
  }

  test("merge-during-serve: a shard merged mid-stream surfaces on the NEXT micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.SimilarityQueries
    val e = graft.sources.Tables.embeddings(spark, dir)
    val dstIdx = tmp("ann_merge_dst")
    val srcIdx = tmp("ann_merge_src")
    // shard A (odd) serves; shard B (even) is built independently and
    // merged in mid-stream — the shard-parallel build landing on a LIVE
    // serving stream, the exact consistency story of append-during-serve
    q.buildIvfIndexSlice(spark, e.filter(col("vec_id") % 2 === 1), dstIdx)
    q.buildIvfIndexSlice(spark, e.filter(col("vec_id") % 2 === 0), srcIdx)
    val queryVecs = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val ms = MemoryStream[(Long, Seq[Float])]
    val outDir = tmp("ann_merge_out")
    val query = graft.streaming.AnnServe.start(
      spark, ms.toDF().toDF("vec_id", "embedding"), dstIdx,
      (df, id) => df.write.mode("append").parquet(s"$outDir/b$id"),
      tmp("ann_merge_ckpt"))
    def rows(batchId: Long) = spark.read.parquet(s"$outDir/b$batchId")
      .collect()
      .map(r => (r.getAs[Number]("qid").longValue,
        r.getAs[Number]("vid").longValue, r.getAs[Double]("cos")))
      .toSet
    ms.addData(queryVecs: _*)
    query.processAllAvailable()
    val served1 = rows(0L)
    assert(served1.nonEmpty)
    // mid-stream MERGE — no restart: merge is append-only on dst, the
    // per-batch posting read picks it up, and the cached centroids stay
    // valid (merge re-routes src against exactly those frozen centroids)
    q.ivfIndexMergeInto(spark, dstIdx, srcIdx)
    ms.addData(queryVecs: _*)
    query.processAllAvailable()
    query.stop()
    val served2 = rows(1L)
    val batchMerged = q.annIvfServe(spark, dir, dstIdx)
      .collect()
      .map(r => (r.getAs[Number]("qid").longValue,
        r.getAs[Number]("vid").longValue, r.getAs[Double]("cos")))
      .toSet
    assert(served2 == batchMerged,
      s"post-merge stream != batch over merged index; " +
        s"onlyStream=${(served2 -- batchMerged).take(3)} " +
        s"onlyBatch=${(batchMerged -- served2).take(3)}")
    assert(served2 != served1, "merged shard must be visible next batch")
    assert(served2.exists(_._2 % 2 == 0),
      "a merged (shard-B) vector must surface in some top-3")
  }

  test("streaming IVFPQ serving: parity with the batch served path; a takedown " +
      "stops surfacing on the NEXT micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.SimilarityQueries
    val idx = tmp("pq_serve_idx")
    q.buildIvfPqIndex(spark, dir, idx)
    val queryVecs = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    assert(queryVecs.nonEmpty)
    val ms = MemoryStream[(Long, Seq[Float])]
    val outDir = tmp("pq_serve_out")
    val query = graft.streaming.PqServe.start(
      spark, ms.toDF().toDF("vec_id", "embedding"), idx,
      (df, id) => df.write.mode("overwrite").parquet(s"$outDir/b$id"),
      tmp("pq_serve_ckpt"), tombstoneAware = true)
    // TWO micro-batches — per-batch routing, ADC tables, and pruned
    // code-posting reads, not one staged drain
    val (first, second) = queryVecs.splitAt(queryVecs.size / 2)
    ms.addData(first: _*)
    query.processAllAvailable()
    ms.addData(second: _*)
    query.processAllAvailable()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Number]("qid").longValue, r.getAs[Number]("vid").longValue,
        r.getAs[Number]("adist_fp").longValue, r.getAs[Number]("rn").longValue)
    val streamed = spark.read.parquet(s"$outDir/b*").collect().map(key).toSet
    // parity: union of per-batch results == the batch served query over
    // the same persisted index (each query lives in exactly one batch;
    // per-query ADC top-3 is independent of batching)
    val batch = q.ivfPqAnnServe(spark, dir, idx).collect().map(key).toSet
    assert(streamed == batch,
      s"stream(${streamed.size}) != batch(${batch.size}); " +
        s"onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    assert(batch.nonEmpty)
    // takedown: tombstone every vid batch 1+2 surfaced, mid-stream —
    // the NEXT micro-batch must not surface any of them (tombstones
    // re-read per batch; centroids/codebooks stay cached)
    import spark.implicits._
    val victimSet = streamed.map(_._2)
    q.ivfPqIndexDelete(spark, idx, victimSet.toSeq.toDF("vec_id"))
    ms.addData(queryVecs.map { case (id, e) => (id + 1000L, e) }: _*)
    query.processAllAvailable()
    query.stop()
    val batch3 = spark.read.parquet(s"$outDir/b2")
      .collect().map(r => r.getAs[Number]("vid").longValue)
    assert(batch3.nonEmpty, "survivors must still serve the post-takedown batch")
    assert(batch3.toSet.intersect(victimSet).isEmpty,
      s"retired vids surfaced post-takedown: ${batch3.toSet.intersect(victimSet).take(3)}")
  }

  test("streaming ANN serving over the persisted trained IVF index matches the batch serving path") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val q = graft.queries.SimilarityQueries
    // train + persist once (the lifecycle's build step), then serve a
    // query-vector STREAM against the frozen index
    val idx = tmp("ann_serve_idx")
    q.buildIvfIndexTrained(spark, dir, idx)
    val queryVecs = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    assert(queryVecs.nonEmpty)
    val ms = MemoryStream[(Long, Seq[Float])]
    val outDir = tmp("ann_serve_out")
    val query = graft.streaming.AnnServe.start(
      spark,
      ms.toDF().toDF("vec_id", "embedding"),
      idx,
      (df, id) => df.write.mode("append").parquet(s"$outDir/b$id"),
      tmp("ann_serve_ckpt"))
    // TWO micro-batches — per-batch routing + pruned posting reads, not
    // one staged drain
    val (first, second) = queryVecs.splitAt(queryVecs.size / 2)
    ms.addData(first: _*)
    query.processAllAvailable()
    ms.addData(second: _*)
    query.processAllAvailable()
    query.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Number](0).longValue, r.getAs[Number](1).longValue,
        r.getAs[Double](2))
    val streamed = spark.read.parquet(s"$outDir/*")
      .select(col("qid"), col("vid"), col("cos"))
      .collect().map(key).toSet
    // parity: the union of per-batch results == the batch serving path
    // (each query lives in exactly one micro-batch; per-query top-3 is
    // independent of batching)
    val batch = q.annIvfTrainedServed(spark, dir)
      .collect().map(key).toSet
    assert(streamed == batch,
      s"stream(${streamed.size}) != batch(${batch.size}); " +
        s"onlyStream=${(streamed -- batch).take(3)} onlyBatch=${(batch -- streamed).take(3)}")
    assert(batch.nonEmpty)
  }

  test("streaming lexical retrieval: bit-parity with the batch API; takedown and " +
      "append land on the NEXT micro-batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val lq = graft.queries.LexQueries
    val idx = tmp("lex_serve_idx")
    lq.buildLexIndex(spark, dir, idx)
    // term mixes incl. a vocabulary miss (zzz...) — unknown terms score 0
    val queries = Seq(
      (1L, "join vector"), (2L, "stream window spark"),
      (3L, "vector spark"), (4L, "zzzmissing join"))
    val ms = MemoryStream[(Long, String)]
    val outDir = tmp("lex_serve_out")
    val query = graft.streaming.LexServe.start(
      spark, ms.toDF().toDF("qid", "text"), idx,
      (df, id) => df.write.mode("overwrite").parquet(s"$outDir/b$id"),
      tmp("lex_serve_ckpt"), tombstoneAware = true)
    val (first, second) = queries.splitAt(2)
    ms.addData(first: _*)
    query.processAllAvailable()
    ms.addData(second: _*)
    query.processAllAvailable()
    val streamed = spark.read.parquet(s"$outDir/b0").unionByName(
        spark.read.parquet(s"$outDir/b1"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    // batch twin: the SAME queries through the batch API in ONE call —
    // results must match BIT FOR BIT (the deterministic-order fold is
    // what makes cross-partitioning score equality possible)
    val batchRes = lq.queryBatch(spark, queries.toDF("qid", "text"), idx,
        lq.loadStats(spark, idx))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(streamed.nonEmpty && streamed.sameElements(batchRes),
      s"stream(${streamed.length}) != batch(${batchRes.length})")

    // takedown mid-stream: retire qid 1's top doc; the re-sent query
    // must serve around it on the next micro-batch, no restart
    val victim = spark.read.parquet(s"$outDir/b0")
      .filter(col("qid") === 1L && col("rk") === 1L)
      .collect()(0).getAs[Number]("doc_id").longValue
    lq.deleteLexDocs(spark, idx, Seq(victim))
    ms.addData((11L, "join vector"))
    query.processAllAvailable()
    val postDel = spark.read.parquet(s"$outDir/b2")
      .collect().map(r => r.getAs[Number]("doc_id").longValue).toSet
    assert(postDel.nonEmpty && !postDel.contains(victim),
      s"retired doc $victim surfaced post-takedown")

    // append mid-stream: a new doc rich in the query terms must surface
    // on the next micro-batch (frozen lexicon covers its terms)
    lq.appendLexIndex(spark,
      Seq((999999L, "join vector join vector join vector join vector"))
        .toDF("doc_id", "text"), idx)
    ms.addData((21L, "join vector"))
    query.processAllAvailable()
    query.stop()
    val postApp = spark.read.parquet(s"$outDir/b3")
      .collect().map(r => r.getAs[Number]("doc_id").longValue).toSet
    assert(postApp.contains(999999L),
      s"appended doc must serve on the next micro-batch; got $postApp")
  }
}
