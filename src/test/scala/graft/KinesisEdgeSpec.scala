package graft

import graft.config.AppConfig
import graft.fixtures.LogGen
import graft.streaming.{FakeKinesisStore, Pipeline}

import org.apache.spark.sql.DataFrame

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files

/** End-to-end seam test for operator O1 (StreamingJob.java:74-110): the
  * PRODUCTION [[Pipeline.KinesisLogSource]] — unmodified — resolves the
  * `aws-kinesis` format through Spark's real DataSource V2 ServiceLoader
  * lookup (satisfied in tests by [[graft.streaming.FakeKinesisProvider]]),
  * so the option MAP, `LATEST` positioning, the `data`-column record
  * contract, and checkpoint offset resume are all exercised through
  * `readStream.format(...).options(...).load()` rather than asserted at
  * a unit seam. */
class KinesisEdgeSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private def collectTo(df: DataFrame, ckpt: String, sink: java.util.List[String]) =
    df.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val rows = b.as[String].collect()
        sink.synchronized { rows.foreach(sink.add) }
        ()
      }
      .start()

  test("KinesisLogSource: options arrive intact, LATEST skips backlog, payload round-trips") {
    val cfg = AppConfig(streamName = "graft-e2e-a", region = "us-west-2",
      pollIntervalMs = 250L, maxRecordsPerPoll = 500)
    FakeKinesisStore.reset(cfg.streamName)

    // backlog BEFORE the query starts: LATEST must never deliver these
    val backlog = LogGen.records(n = 3, seed = 11L)
    backlog.foreach(r => FakeKinesisStore.append(cfg.streamName, r.getBytes(UTF_8), "pk0"))

    val df = new Pipeline.KinesisLogSource(cfg).stream(spark)
    val sink = new java.util.ArrayList[String]()
    val q = collectTo(df, tmp("ckpt-kin-a"), sink)
    try {
      q.processAllAvailable()
      assert(sink.isEmpty, "LATEST positioning must skip the pre-start backlog")

      // live records appended after stream start ARE delivered, byte-exact
      val live = LogGen.records(n = 5, seed = 12L)
      live.foreach(r => FakeKinesisStore.append(cfg.streamName, r.getBytes(UTF_8), "pk1"))
      q.processAllAvailable()
      val got = sink.synchronized(scala.jdk.CollectionConverters.ListHasAsScala(sink).asScala.toSet)
      assert(got == live.toSet)
    } finally q.stop()

    // the full option map arrived through the real lookup, key by key
    // (DSv2 lower-cases option keys; values must be verbatim)
    val want = Pipeline.KinesisLogSource.options(cfg).map { case (k, v) => k.toLowerCase -> v }
    val seen = FakeKinesisStore.capturedOptions
    want.foreach { case (k, v) =>
      assert(seen.get(k).contains(v), s"option '$k': expected '$v', connector saw ${seen.get(k)}")
    }
    assert(seen("kinesis.streamname") == "graft-e2e-a")
    assert(seen("kinesis.startingposition") == "LATEST")
    assert(seen("kinesis.region") == "us-west-2")
    assert(seen("kinesis.getrecords.fetchintervalms") == "250")
    assert(seen("kinesis.getrecords.maxrecordsperfetch") == "500")
  }

  test("KinesisLogSource: checkpoint restart resumes from the committed offset") {
    val cfg = AppConfig(streamName = "graft-e2e-b")
    FakeKinesisStore.reset(cfg.streamName)
    val ckpt = tmp("ckpt-kin-b")
    val sink = new java.util.ArrayList[String]()

    val first = LogGen.records(n = 4, seed = 21L)
    val q1 = collectTo(new Pipeline.KinesisLogSource(cfg).stream(spark), ckpt, sink)
    try {
      q1.processAllAvailable() // commits the LATEST start position
      first.foreach(r => FakeKinesisStore.append(cfg.streamName, r.getBytes(UTF_8), "pk"))
      q1.processAllAvailable()
    } finally q1.stop()
    assert(sink.size == 4)

    // records landing while the query is DOWN must be delivered on
    // restart (offset resume from the checkpoint, not LATEST re-seek)
    val whileDown = LogGen.records(n = 6, seed = 22L)
    whileDown.foreach(r => FakeKinesisStore.append(cfg.streamName, r.getBytes(UTF_8), "pk"))

    val q2 = collectTo(new Pipeline.KinesisLogSource(cfg).stream(spark), ckpt, sink)
    try q2.processAllAvailable()
    finally q2.stop()
    val got = sink.synchronized(scala.jdk.CollectionConverters.ListHasAsScala(sink).asScala.toList)
    assert(got.size == 10, s"restart must deliver exactly the 6 missed records, got ${got.size} total")
    assert(got.drop(4).toSet == whileDown.toSet)
  }

  test("Kinesis edge feeds the full parse+window pipeline identically to the batch core") {
    val cfg = AppConfig(streamName = "graft-e2e-c")
    FakeKinesisStore.reset(cfg.streamName)
    val parsed = Pipeline.parsed(new Pipeline.KinesisLogSource(cfg).stream(spark), cfg)
    val agg = Pipeline.windowedStats(parsed, cfg)
    val q = agg.writeStream
      .format("memory").queryName("kin_win").outputMode("complete")
      .option("checkpointLocation", tmp("ckpt-kin-c"))
      .start()
    try {
      q.processAllAvailable()
      val recs = LogGen.records(n = 60, seed = 23L)
      recs.foreach(r => FakeKinesisStore.append(cfg.streamName, r.getBytes(UTF_8), "pk"))
      q.processAllAvailable()
      val got = spark.table("kin_win")
      val total = got.agg(org.apache.spark.sql.functions.sum("cnt")).as[Long].collect()(0)
      assert(total == 60L)
      // parity with the batch windowing core on the same records
      val batch = graft.operators.Windowing.tumblingStats(
        graft.functions.LogParse.parse(recs.toDF("raw"), "raw"),
        "event_time", Seq("callerservice", "operation"), cfg.windowSeconds * 1000L, "latency")
      assert(got.count() == batch.count())
    } finally q.stop()
  }
}
