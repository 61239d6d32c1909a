package graft

import graft.config.AppConfig
import graft.fixtures.LogGen
import graft.streaming.Pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** Streaming throughput benchmark: wire-format records through the full
  * pipeline (parse → watermark → keyed windowed aggregation), measured as
  * records/second end to end.
  *
  * Context (BASELINE.md): the reference's Kinesis consumer config caps at
  * ~10 000 records/s/shard (1000 ms poll × 10 000 records,
  * StreamingJob.java:90-94), and its `windowAll` forces the whole window
  * stage through ONE task. This measures our single-node ceiling on the
  * same record format for comparison.
  *
  *   java -cp ... graft.StreamBench [nRecords] [partitions] [store]
  *
  * `store` (or env SPARK_GRAFT_STATE_STORE) selects the state store:
  * `hdfs` (default — Spark's in-memory HDFSBackedStateStore) or
  * `rocksdb` (RocksDBStateStoreProvider — the store a production
  * cluster runs, state off-heap and spillable; changelog checkpointing
  * on, bounded memory). The provider is echoed in the JSON so recorded
  * numbers are pinned to their config.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val parts = args.lift(1).map(_.toInt).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val store = args.lift(2)
      .orElse(sys.env.get("SPARK_GRAFT_STATE_STORE")).getOrElse("hdfs")
    // a typo'd store name must not silently run the default provider
    // while the JSON line labels the row with the raw string — that
    // would record HDFS throughput as "rocksDB" in BASELINE.md
    require(store == "hdfs" || store == "rocksdb",
      s"unknown state store '$store' (expected 'hdfs' or 'rocksdb')")
    val builder = SparkSession.builder()
      .master(s"local[$parts]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (store == "rocksdb") {
      builder
        .config("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        // changelog checkpointing ships per-batch deltas instead of full
        // SST snapshots — the production setting for frequent commits
        .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
          sys.env.getOrElse("SPARK_GRAFT_ROCKSDB_CHANGELOG", "true"))
        // bound native memory so 32 parallel store instances on one box
        // can't balloon: one shared block cache across all partitions
        .config("spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true")
        .config("spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB", "2048")
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // dense burst: 100 records per event-time second (n records span
    // n/100 s of stream time — a realistic hot-shard shape; the 1 rec/s
    // default would spread n records over n seconds of event time and
    // benchmark the state store's window count instead of the engine)
    val recs = LogGen.records(n = n, seed = 1L, stepMs = 10L)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String](
      0, spark, Some(parts))(implicitly[org.apache.spark.sql.Encoder[String]])
    // stage the data before the clock starts — we measure the ENGINE,
    // not the generator; one staged block → AvailableNow drains it in a
    // single micro-batch (state-store commit rounds otherwise dominate)
    ms.addData(recs: _*)

    val cfg = AppConfig()
    def pipeline(raw: org.apache.spark.sql.DataFrame) =
      Pipeline.windowedStats(Pipeline.parsed(raw, cfg), cfg)

    // per-run state-operator metrics, summed over the run's micro-batches
    // (AvailableNow usually commits one) — the attribution data for the
    // RocksDB append-vs-update gap: where does wall-clock sit, update
    // application, eviction removals, or the store commit?
    def stateJson(q: org.apache.spark.sql.streaming.StreamingQuery): String = {
      val sos = q.recentProgress.toSeq.flatMap(_.stateOperators.toSeq)
      if (sos.isEmpty) "null"
      else {
        def sum(f: org.apache.spark.sql.streaming.StateOperatorProgress => Long) =
          sos.map(f).sum
        // RocksDB custom metrics worth attributing to (all 0 on HDFS)
        val custom = Seq("rocksdbCommitFlushLatency", "rocksdbCommitCompactLatency",
          "rocksdbCommitCheckpointLatency", "rocksdbCommitFileSyncLatencyMs",
          "rocksdbWriterStallLatencyMs", "rocksdbTotalBytesWritten")
          .map { k =>
            val v = sos.map(s => Option(s.customMetrics.get(k))
              .map(_.longValue).getOrElse(0L)).sum
            s""""$k":$v"""
          }.mkString(",")
        s"""{"numRowsTotal":${sum(_.numRowsTotal)},""" +
          s""""numRowsUpdated":${sum(_.numRowsUpdated)},""" +
          s""""numRowsRemoved":${sum(_.numRowsRemoved)},""" +
          s""""allUpdatesTimeMs":${sum(_.allUpdatesTimeMs)},""" +
          s""""allRemovalsTimeMs":${sum(_.allRemovalsTimeMs)},""" +
          s""""commitTimeMs":${sum(_.commitTimeMs)},$custom}"""
      }
    }
    var lastState: String = "null"
    def runOnce(data: org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String],
                build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                mode: String = "append"): Double = {
      val df = build(data.toDF().withColumnRenamed("value", "raw"))
      val ckpt = java.nio.file.Files.createTempDirectory("sb-ckpt").toString
      val t0 = System.nanoTime()
      val q = df.writeStream.format("noop").outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      lastState = stateJson(q)
      sec
    }
    def freshStream(data: Seq[String]) = {
      val s = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String](
        0, spark, Some(parts))(implicitly[org.apache.spark.sql.Encoder[String]])
      s.addData(data: _*)
      s
    }

    // warmup: first streaming query of a session pays one-time codegen /
    // state-store / infra init (measured 3-4x) — burn it untimed
    runOnce(freshStream(recs.take(2000)), pipeline)

    val parseSec = runOnce(freshStream(recs),
      raw => Pipeline.parsed(raw, cfg))
    // append vs update (the Pipeline.startWindowedUpdate re-fire twin):
    // measured ALTERNATING, min-of-2 per mode — a single ordered pass
    // hands the last-measured mode a warmer session (measured: the same
    // mode swings 3-5x between first and last position), and this box's
    // bursty ambient load does the rest. Alternation + min cancels both;
    // expect update ≲ append (update re-emits every changed window per
    // batch where append emits each window once).
    val full1 = runOnce(freshStream(recs), pipeline)
    val fullState1 = lastState
    val upd1 = runOnce(freshStream(recs), pipeline, mode = "update")
    val updState1 = lastState
    val full2 = runOnce(freshStream(recs), pipeline)
    val fullState2 = lastState
    val upd2 = runOnce(freshStream(recs), pipeline, mode = "update")
    val updState2 = lastState
    val fullSec = math.min(full1, full2)
    val updSec = math.min(upd1, upd2)
    // state metrics of the run that PRODUCED the reported (min) time
    val fullState = if (full1 <= full2) fullState1 else fullState2
    val updState = if (upd1 <= upd2) updState1 else updState2

    // Streaming ANN serving: a query-vector stream against the persisted
    // IVF index (graft.streaming.AnnServe) — per-batch centroid routing
    // + bucket-pruned posting reads, measured as queries/second across
    // real micro-batches (not one staged drain).
    // guarded: StreamBench had no fixture dependency before this stage —
    // a missing sf dir must cost the ANN row (-1 markers), never the
    // minutes of pipeline measurements already taken above
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (annQueries, annSec) = try {
      val idx = java.nio.file.Files.createTempDirectory("sb-ivf").toString
      graft.queries.SimilarityQueries.buildIvfIndex(spark, sfDir, idx)
      val base = graft.sources.Tables.embeddings(spark, sfDir)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding"))
        .as[(Long, Seq[Float])].collect()
      val nQ = math.min(20000, math.max(2000, n / 10))
      // fresh ids so no query self-excludes as its own source vector
      val queries: Seq[(Long, Seq[Float])] =
        (0 until nQ).map(i => (1000000L + i, base(i % base.length)._2))
      val ms2 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Float])](1, spark, Some(parts))(
          implicitly[org.apache.spark.sql.Encoder[(Long, Seq[Float])]])
      val q = graft.streaming.AnnServe.start(
        spark, ms2.toDF().toDF("vec_id", "embedding"), idx,
        (df, _) => df.write.format("noop").mode("overwrite").save(),
        java.nio.file.Files.createTempDirectory("sb-ann-ckpt").toString)
      // warmup batch (codegen + centroid cache), untimed
      ms2.addData(queries.take(200): _*)
      q.processAllAvailable()
      val chunks = queries.drop(200).grouped(math.max(1, (nQ - 200) / 8)).toSeq
      val t0 = System.nanoTime()
      chunks.foreach { c => ms2.addData(c: _*); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      (nQ - 200, sec)
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[streambench] ann serving stage failed: ${e.getMessage}")
      (-1, -1.0)
    }
    val annQps = if (annSec > 0) annQueries / annSec else -1.0

    // HEAD-SKEWED decade for the result-sharing path: the same ANN
    // serving stage with every query drawn from only 16 distinct
    // embeddings — the production shape (query streams are heavily
    // head-skewed). The serve edge dedupes each micro-batch to its
    // distinct vectors, scores once per vector, and fans answers back,
    // so scoring cost tracks DISTINCT vectors per batch; the qps ratio
    // vs the base ANN row above (whose stream cycles the whole fixture)
    // is the sharing multiplier.
    val (annSkQueries, annSkSec) = try {
      val idx = java.nio.file.Files.createTempDirectory("sb-ivf-skew").toString
      graft.queries.SimilarityQueries.buildIvfIndex(spark, sfDir, idx)
      val base = graft.sources.Tables.embeddings(spark, sfDir)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding"))
        .as[(Long, Seq[Float])].collect()
      val nQ = math.min(20000, math.max(2000, n / 10))
      val nDistinct = math.min(16, base.length)
      val queries: Seq[(Long, Seq[Float])] =
        (0 until nQ).map(i => (8000000L + i, base(i % nDistinct)._2))
      val ms9 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Float])](8, spark, Some(parts))(
          implicitly[org.apache.spark.sql.Encoder[(Long, Seq[Float])]])
      val q = graft.streaming.AnnServe.start(
        spark, ms9.toDF().toDF("vec_id", "embedding"), idx,
        (df, _) => df.write.format("noop").mode("overwrite").save(),
        java.nio.file.Files.createTempDirectory("sb-ann-skew-ckpt").toString)
      ms9.addData(queries.take(200): _*) // warmup batch, untimed
      q.processAllAvailable()
      val chunks = queries.drop(200).grouped(math.max(1, (nQ - 200) / 8)).toSeq
      val t0 = System.nanoTime()
      chunks.foreach { c => ms9.addData(c: _*); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      (nQ - 200, sec)
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[streambench] ann skew stage failed: ${e.getMessage}")
      (-1, -1.0)
    }
    val annSkQps = if (annSkSec > 0) annSkQueries / annSkSec else -1.0

    // FACETED ANN serving — the base ANN stage with --facetLabel: the
    // allowlist (one label directory of the attrs sidecar) is re-read
    // and semi-joined into the probed postings every batch, so the qps
    // ratio vs ann_serve_qps prices the facet screen itself (the scored
    // candidate set shrinks ~10x, the screen adds one broadcast
    // semi-join + one pruned sidecar read per batch).
    val (annFcQueries, annFcSec) = try {
      val idx = java.nio.file.Files.createTempDirectory("sb-ivf-facet").toString
      graft.queries.SimilarityQueries.buildIvfIndex(spark, sfDir, idx)
      val base = graft.sources.Tables.embeddings(spark, sfDir)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding"))
        .as[(Long, Seq[Float])].collect()
      val nQ = math.min(20000, math.max(2000, n / 10))
      val queries: Seq[(Long, Seq[Float])] =
        (0 until nQ).map(i => (9000000L + i, base(i % base.length)._2))
      val ms12 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Float])](12, spark, Some(parts))(
          implicitly[org.apache.spark.sql.Encoder[(Long, Seq[Float])]])
      val q = graft.streaming.AnnServe.start(
        spark, ms12.toDF().toDF("vec_id", "embedding"), idx,
        (df, _) => df.write.format("noop").mode("overwrite").save(),
        java.nio.file.Files.createTempDirectory("sb-ann-facet-ckpt").toString,
        facetLabel = Some(graft.queries.SimilarityQueries.FacetLabel))
      ms12.addData(queries.take(200): _*) // warmup batch, untimed
      q.processAllAvailable()
      val chunks = queries.drop(200).grouped(math.max(1, (nQ - 200) / 8)).toSeq
      val t0 = System.nanoTime()
      chunks.foreach { c => ms12.addData(c: _*); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      (nQ - 200, sec)
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[streambench] ann facet stage failed: ${e.getMessage}")
      (-1, -1.0)
    }
    val annFcQps = if (annFcSec > 0) annFcQueries / annFcSec else -1.0

    // Streaming IVFPQ serving (graft.streaming.PqServe — the
    // compressed-index twin): same query stream shape, ADC scoring over
    // bucket-pruned CODE postings with centroids + codebooks cached at
    // stream start. Same guard stance as the IVF stage.
    val (pqQueries, pqSec) = try {
      val idx = java.nio.file.Files.createTempDirectory("sb-ivfpq").toString
      graft.queries.SimilarityQueries.buildIvfPqIndex(spark, sfDir, idx)
      val base = graft.sources.Tables.embeddings(spark, sfDir)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding"))
        .as[(Long, Seq[Float])].collect()
      val nQ = math.min(20000, math.max(2000, n / 10))
      val queries: Seq[(Long, Seq[Float])] =
        (0 until nQ).map(i => (3000000L + i, base(i % base.length)._2))
      val ms4 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Float])](3, spark, Some(parts))(
          implicitly[org.apache.spark.sql.Encoder[(Long, Seq[Float])]])
      val q = graft.streaming.PqServe.start(
        spark, ms4.toDF().toDF("vec_id", "embedding"), idx,
        (df, _) => df.write.format("noop").mode("overwrite").save(),
        java.nio.file.Files.createTempDirectory("sb-pq-ckpt").toString)
      // warmup batch (codegen + centroid/codebook caches), untimed
      ms4.addData(queries.take(200): _*)
      q.processAllAvailable()
      val chunks = queries.drop(200).grouped(math.max(1, (nQ - 200) / 8)).toSeq
      val t0 = System.nanoTime()
      chunks.foreach { c => ms4.addData(c: _*); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      (nQ - 200, sec)
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[streambench] ivfpq serving stage failed: ${e.getMessage}")
      (-1, -1.0)
    }
    val pqQps = if (pqSec > 0) pqQueries / pqSec else -1.0

    // Streaming vector INGEST (graft.streaming.VecIngest — the write
    // edge): vectors/second through the staged-promote exactly-once
    // commit, measured across real micro-batches against a standing
    // index built from the fixture. Fresh ids so every batch appends.
    val (viVecs, viSec) = try {
      val idx = java.nio.file.Files.createTempDirectory("sb-vi").toString
      graft.queries.SimilarityQueries.buildIvfIndex(spark, sfDir, idx)
      val base = graft.sources.Tables.embeddings(spark, sfDir)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding"))
        .as[(Long, Seq[Float])].collect()
      val nV = math.min(20000, math.max(2000, n / 10))
      val vecs: Seq[(Long, Seq[Float])] =
        (0 until nV).map(i => (4000000L + i, base(i % base.length)._2))
      val ms5 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Float])](4, spark, Some(parts))(
          implicitly[org.apache.spark.sql.Encoder[(Long, Seq[Float])]])
      val q = graft.streaming.VecIngest.start(
        spark, ms5.toDF().toDF("vec_id", "embedding"), idx,
        java.nio.file.Files.createTempDirectory("sb-vi-ckpt").toString)
      ms5.addData(vecs.take(200): _*) // warmup batch, untimed
      q.processAllAvailable()
      val rest = vecs.drop(200)
      val chunks = rest.grouped(math.max(1, rest.size / 8)).toSeq
      val t0 = System.nanoTime()
      chunks.foreach { c => ms5.addData(c: _*); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      (rest.size, sec)
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[streambench] vector ingest stage failed: ${e.getMessage}")
      (-1, -1.0)
    }
    val viVps = if (viSec > 0) viVecs / viSec else -1.0

    // Streaming IVFPQ ingest (graft.streaming.PqIngest — the compressed
    // index's write edge): vectors/second through route + M-subspace
    // residual encode + the shared staged-promote commit.
    val (piVecs, piSec) = try {
      val idx = java.nio.file.Files.createTempDirectory("sb-pi").toString
      graft.queries.SimilarityQueries.buildIvfPqIndex(spark, sfDir, idx)
      val base = graft.sources.Tables.embeddings(spark, sfDir)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding"))
        .as[(Long, Seq[Float])].collect()
      val nV = math.min(20000, math.max(2000, n / 10))
      val vecs: Seq[(Long, Seq[Float])] =
        (0 until nV).map(i => (7000000L + i, base(i % base.length)._2))
      val ms8 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Seq[Float])](7, spark, Some(parts))(
          implicitly[org.apache.spark.sql.Encoder[(Long, Seq[Float])]])
      val q = graft.streaming.PqIngest.start(
        spark, ms8.toDF().toDF("vec_id", "embedding"), idx,
        java.nio.file.Files.createTempDirectory("sb-pi-ckpt").toString)
      ms8.addData(vecs.take(200): _*) // warmup batch, untimed
      q.processAllAvailable()
      val rest = vecs.drop(200)
      val chunks = rest.grouped(math.max(1, rest.size / 8)).toSeq
      val t0 = System.nanoTime()
      chunks.foreach { c => ms8.addData(c: _*); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      (rest.size, sec)
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[streambench] pq ingest stage failed: ${e.getMessage}")
      (-1, -1.0)
    }
    val piVps = if (piSec > 0) piVecs / piSec else -1.0

    // Streaming DOCUMENT ingest (graft.streaming.LexIngest — the lexical
    // index's write edge): documents/second through the shared
    // staged-promote exactly-once commit, across real micro-batches
    // against a standing inverted index. Fresh ids so every batch
    // appends.
    val (diDocs, diSec) = try {
      val idx = java.nio.file.Files.createTempDirectory("sb-li").toString
      graft.queries.LexQueries.buildLexIndex(spark, sfDir, idx)
      val baseDocs = graft.sources.Tables.documents(spark, sfDir)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))
        .as[(Long, String)].collect()
      val docs: Seq[(Long, String)] =
        baseDocs.toSeq.map { case (id, t) => (6000000L + id, t) }
      val ms7 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](6, spark, Some(parts))(
          implicitly[org.apache.spark.sql.Encoder[(Long, String)]])
      val q = graft.streaming.LexIngest.start(
        spark, ms7.toDF().toDF("doc_id", "text"), idx,
        java.nio.file.Files.createTempDirectory("sb-li-ckpt").toString)
      val warm = math.min(200, docs.size / 10)
      ms7.addData(docs.take(warm): _*) // warmup batch, untimed
      q.processAllAvailable()
      val rest = docs.drop(warm)
      val chunks = rest.grouped(math.max(1, rest.size / 8)).toSeq
      val t0 = System.nanoTime()
      chunks.foreach { c => ms7.addData(c: _*); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      (rest.size, sec)
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[streambench] doc ingest stage failed: ${e.getMessage}")
      (-1, -1.0)
    }
    val diDps = if (diSec > 0) diDocs / diSec else -1.0

    // Streaming LSH near-dup serving (graft.streaming.LshServe —
    // AnnServe's text-side twin): document batches sign themselves and
    // band-equijoin the persisted signature index; measured as
    // documents/second across real micro-batches. Same guard stance as
    // the ANN stage. `indexDir` sizes the STANDING corpus independently
    // of the query load, so a second run at a 10× index prices whether
    // serving is signing-bound (flat) or index-bound (degrading).
    def lshStage(indexDir: String, queryDir: String, tag: String): (Int, Double) = try {
      val idx = java.nio.file.Files.createTempDirectory(s"sb-$tag").toString
      graft.queries.SimilarityQueries.buildLshIndex(spark, indexDir, idx)
      val docs = graft.sources.Tables.documents(spark, queryDir)
        .select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("text"))
        .as[(Long, String)].collect()
      // fresh ids: the queries play "new crawl shard against the
      // standing corpus" — same texts, so every query has standing work
      val queries: Seq[(Long, String)] =
        docs.toSeq.map { case (id, t) => (2000000L + id, t) }
      val ms3 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](2, spark, Some(parts))(
          implicitly[org.apache.spark.sql.Encoder[(Long, String)]])
      val q = graft.streaming.LshServe.start(
        spark, ms3.toDF().toDF("doc_id", "text"), idx,
        (df, _) => df.write.format("noop").mode("overwrite").save(),
        java.nio.file.Files.createTempDirectory(s"sb-$tag-ckpt").toString)
      val warm = math.min(200, queries.size / 10)
      ms3.addData(queries.take(warm): _*)
      q.processAllAvailable()
      val rest = queries.drop(warm)
      val chunks = rest.grouped(math.max(1, rest.size / 8)).toSeq
      val t0 = System.nanoTime()
      chunks.foreach { c => ms3.addData(c: _*); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      (rest.size, sec)
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[streambench] $tag serving stage failed: ${e.getMessage}")
      (-1, -1.0)
    }
    val (lshDocs, lshSec) = lshStage(sfDir, sfDir, "lsh")
    val lshDps = if (lshSec > 0) lshDocs / lshSec else -1.0

    // Optional 10× standing-index decade (SPARK_GRAFT_SF1_DIR — the
    // scripts/gen_sf1.py slice): SAME query batch, standing signature
    // index built from 10× documents. dps ratio vs the base row isolates
    // the index-size term of serving cost.
    val (lsh10Docs, lsh10Sec) = sys.env.get("SPARK_GRAFT_SF1_DIR")
      .map(d => lshStage(d, sfDir, "lsh10x")).getOrElse((-1, -1.0))
    val lsh10Dps = if (lsh10Sec > 0) lsh10Docs / lsh10Sec else -1.0

    // Streaming LEXICAL retrieval (graft.streaming.LexServe — BM25 top-k
    // from the persisted inverted index): queries/second across real
    // micro-batches. Query texts rotate over the non-empty subsets of
    // the benchmark term set, so batches mix 1–5-term lookups. As with
    // lshStage, `indexDir` sizes the STANDING corpus independently of
    // the query load — the optional 10× row prices whether serving is
    // query-bound (flat) or index-bound (degrading).
    def lexStage(indexDir: String, tag: String): (Int, Double) = try {
      val idx = java.nio.file.Files.createTempDirectory(s"sb-$tag").toString
      graft.queries.LexQueries.buildLexIndex(spark, indexDir, idx)
      val terms = graft.queries.LexQueries.QueryTerms
      val subsets = (1 until (1 << terms.size)).map(m =>
        terms.zipWithIndex.collect { case (t, i) if ((m >> i) & 1) == 1 => t }
          .mkString(" "))
      val nQ = math.min(20000, math.max(2000, n / 10))
      val queries: Seq[(Long, String)] =
        (0 until nQ).map(i => (5000000L + i, subsets(i % subsets.size)))
      val ms6 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String)](5, spark, Some(parts))(
          implicitly[org.apache.spark.sql.Encoder[(Long, String)]])
      val q = graft.streaming.LexServe.start(
        spark, ms6.toDF().toDF("qid", "text"), idx,
        (df, _) => df.write.format("noop").mode("overwrite").save(),
        java.nio.file.Files.createTempDirectory(s"sb-$tag-ckpt").toString)
      ms6.addData(queries.take(200): _*) // warmup batch, untimed
      q.processAllAvailable()
      val rest = queries.drop(200)
      val chunks = rest.grouped(math.max(1, rest.size / 8)).toSeq
      val t0 = System.nanoTime()
      chunks.foreach { c => ms6.addData(c: _*); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      (rest.size, sec)
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[streambench] $tag serving stage failed: ${e.getMessage}")
      (-1, -1.0)
    }
    val (lexQueries, lexSec) = lexStage(sfDir, "lex")
    val lexQps = if (lexSec > 0) lexQueries / lexSec else -1.0
    val (lex10Queries, lex10Sec) = sys.env.get("SPARK_GRAFT_SF1_DIR")
      .map(d => lexStage(d, "lex10x")).getOrElse((-1, -1.0))
    val lex10Qps = if (lex10Sec > 0) lex10Queries / lex10Sec else -1.0

    // Streaming HYBRID retrieval (graft.streaming.HybridServe — RRF
    // fusion of the lex and IVF per-batch serving paths): hybrid
    // queries (qid, text, embedding) rotate term subsets × base
    // vectors. The qps prices fusion against the two single-family
    // stages from the SAME session — per batch it runs both arms plus
    // a ≤2·armK-rows-per-query fusion join, so the expected cost is
    // roughly the sum of the arms'. `facet` runs the lang-faceted twin
    // (both arms screened from one allowlist read). */
    def hybridStage(tag: String, facetLang: Option[String]): (Int, Double) = try {
      val lexIdx = java.nio.file.Files.createTempDirectory(s"sb-$tag-lex").toString
      graft.queries.LexQueries.buildLexIndex(spark, sfDir, lexIdx)
      val ivfIdx = java.nio.file.Files.createTempDirectory(s"sb-$tag-ivf").toString
      graft.queries.SimilarityQueries.buildIvfIndex(spark, sfDir, ivfIdx)
      val terms = graft.queries.LexQueries.QueryTerms
      val subsets = (1 until (1 << terms.size)).map(m =>
        terms.zipWithIndex.collect { case (t, i) if ((m >> i) & 1) == 1 => t }
          .mkString(" "))
      val base = graft.sources.Tables.embeddings(spark, sfDir)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding"))
        .as[(Long, Seq[Float])].collect()
      val nQ = math.min(20000, math.max(2000, n / 10))
      val queries: Seq[(Long, String, Seq[Float])] =
        (0 until nQ).map(i => (7000000L + i, subsets(i % subsets.size),
          base(i % base.length)._2))
      val ms13 = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, String, Seq[Float])](13, spark, Some(parts))(
          implicitly[org.apache.spark.sql.Encoder[(Long, String, Seq[Float])]])
      val q = graft.streaming.HybridServe.start(
        spark, ms13.toDF().toDF("qid", "text", "embedding"), lexIdx, ivfIdx,
        (df, _) => df.write.format("noop").mode("overwrite").save(),
        java.nio.file.Files.createTempDirectory(s"sb-$tag-ckpt").toString,
        facetLang = facetLang)
      ms13.addData(queries.take(200): _*) // warmup batch, untimed
      q.processAllAvailable()
      val rest = queries.drop(200)
      val chunks = rest.grouped(math.max(1, rest.size / 8)).toSeq
      val t0 = System.nanoTime()
      chunks.foreach { c => ms13.addData(c: _*); q.processAllAvailable() }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      (rest.size, sec)
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[streambench] $tag serving stage failed: ${e.getMessage}")
      (-1, -1.0)
    }
    val (hybQueries, hybSec) = hybridStage("hybrid", None)
    val hybQps = if (hybSec > 0) hybQueries / hybSec else -1.0
    val (hybFcQueries, hybFcSec) = hybridStage("hybridfc", Some("en"))
    val hybFcQps = if (hybFcSec > 0) hybFcQueries / hybFcSec else -1.0

    println(
      f"""{"metric":"stream_throughput","records":$n,"parse_watermark_rps":${n / parseSec}%.0f,"full_pipeline_rps":${n / fullSec}%.0f,"update_mode_rps":${n / updSec}%.0f,"parse_seconds":$parseSec%.2f,"full_seconds":$fullSec%.2f,"update_seconds":$updSec%.2f,"ann_serve_qps":$annQps%.0f,"ann_serve_queries":$annQueries,"ann_serve_seconds":$annSec%.2f,"ann_serve_skew_qps":$annSkQps%.0f,"ann_serve_skew_queries":$annSkQueries,"ann_serve_skew_seconds":$annSkSec%.2f,"ann_serve_facet_qps":$annFcQps%.0f,"ann_serve_facet_queries":$annFcQueries,"ann_serve_facet_seconds":$annFcSec%.2f,"pq_serve_qps":$pqQps%.0f,"pq_serve_queries":$pqQueries,"pq_serve_seconds":$pqSec%.2f,"lsh_serve_dps":$lshDps%.0f,"lsh_serve_docs":$lshDocs,"lsh_serve_seconds":$lshSec%.2f,"lsh_serve_10x_dps":$lsh10Dps%.0f,"lsh_serve_10x_docs":$lsh10Docs,"lsh_serve_10x_seconds":$lsh10Sec%.2f,"lex_serve_qps":$lexQps%.0f,"lex_serve_queries":$lexQueries,"lex_serve_seconds":$lexSec%.2f,"lex_serve_10x_qps":$lex10Qps%.0f,"lex_serve_10x_queries":$lex10Queries,"lex_serve_10x_seconds":$lex10Sec%.2f,"hybrid_serve_qps":$hybQps%.0f,"hybrid_serve_queries":$hybQueries,"hybrid_serve_seconds":$hybSec%.2f,"hybrid_serve_facet_qps":$hybFcQps%.0f,"hybrid_serve_facet_queries":$hybFcQueries,"hybrid_serve_facet_seconds":$hybFcSec%.2f,"vec_ingest_vps":$viVps%.0f,"vec_ingest_vectors":$viVecs,"vec_ingest_seconds":$viSec%.2f,"pq_ingest_vps":$piVps%.0f,"pq_ingest_vectors":$piVecs,"pq_ingest_seconds":$piSec%.2f,"doc_ingest_dps":$diDps%.0f,"doc_ingest_docs":$diDocs,"doc_ingest_seconds":$diSec%.2f,"state_store":"$store","append_state":$fullState,"update_state":$updState,"reference_ceiling_rps":10000}""")
    spark.stop()
  }
}
