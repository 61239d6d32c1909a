package graft

import graft.queries.LexQueries
import graft.streaming.LexIngest

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.{Files => JFiles, Paths}
import scala.jdk.CollectionConverters._

/** Streaming document ingest ([[LexIngest]]): the crawl firehose →
  * persisted inverted index edge, [[VecIngestSpec]]'s text twin. Pins:
  *   1. two streamed micro-batches land EXACTLY the posting rows batch
  *      [[LexQueries.appendLexIndex]] lands, and serving the streamed
  *      index is bit-identical to serving the batch-appended one;
  *   2. a replayed (already-committed) batch is a byte-level no-op;
  *   3. both crash-window replays (staged-unpromoted, mid-promote)
  *      complete to the exact one-pass row set — no duplicate tf rows
  *      (a duplicated posting would inflate tf at serve time). */
class LexIngestSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tmp(prefix: String) = JFiles.createTempDirectory(prefix).toString

  private def postingRows(idx: String): Seq[String] =
    spark.read.parquet(s"$idx/postings")
      .select(col("tok"), col("doc_id"), col("tf"), col("dl"),
        // the POSITIONAL payload is part of the parity fingerprint —
        // a streamed index with wrong posns would break phrase/prox
        // queries while tf-only comparisons still passed
        concat_ws(",", col("posns")).as("posns"),
        col("slot").cast("long"))
      .collect().map(_.toSeq.mkString("|")).toSeq.sorted

  private def fileNames(root: String): Set[String] =
    JFiles.walk(Paths.get(root)).iterator().asScala
      .filter(p => JFiles.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(_.toString.stripPrefix(root)).toSet

  test("streamed document ingest == batch append: postings and served answers") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.sources.Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val idxStream = tmp("li_stream")
    val idxBatch = tmp("li_batch")
    LexQueries.buildLexIndexFrom(spark, base, idxStream)
    LexQueries.buildLexIndexFrom(spark, base, idxBatch)
    LexQueries.appendLexIndex(spark, docs.filter(col("doc_id") % 4 === 0), idxBatch)

    val delta = docs.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val (half1, half2) = delta.splitAt(delta.size / 2)
    val ms = MemoryStream[(Long, String)]
    val query = LexIngest.start(
      spark, ms.toDF().toDF("doc_id", "text"), idxStream, tmp("li_ckpt"))
    try {
      ms.addData(half1: _*); query.processAllAvailable()
      ms.addData(half2: _*); query.processAllAvailable()
    } finally query.stop()

    assert(postingRows(idxStream) == postingRows(idxBatch))
    // no staging residue; commit markers for both batches
    assert(!JFiles.exists(Paths.get(s"$idxStream/_staging")) ||
      JFiles.list(Paths.get(s"$idxStream/_staging")).count() == 0)
    assert(JFiles.exists(Paths.get(s"$idxStream/_ingest_commits/0")))
    assert(JFiles.exists(Paths.get(s"$idxStream/_ingest_commits/1")))

    // serving parity, bit-identical (frozen lexicon + exact-long tf/dl)
    def served(idx: String) = LexQueries.serveTermScores(spark, idx,
        LexQueries.QueryTerms, LexQueries.loadStats(spark, idx))
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(served(idxStream) == served(idxBatch))
    assert(served(idxStream).exists(r => r(1).asInstanceOf[Long] % 4 == 0),
      "ingested docs must serve")
  }

  test("replay is a no-op; both crash windows complete without duplicate postings") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val delta = docs.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), col("text"))

    val idx = tmp("li_replay")
    LexQueries.buildLexIndexFrom(spark, base, idx)
    LexIngest.ingestBatch(spark, delta, idx, 7L)
    val after1 = fileNames(idx)
    val rows1 = postingRows(idx)
    LexIngest.ingestBatch(spark, delta, idx, 7L)
    assert(fileNames(idx) == after1, "replaying a committed batch must change nothing")

    val fsConf = spark.sparkContext.hadoopConfiguration
    def stage(index: String, id: Long): Unit = {
      val fs = new org.apache.hadoop.fs.Path(index).getFileSystem(fsConf)
      val staging = new org.apache.hadoop.fs.Path(s"$index/_staging/$id")
      LexQueries.postingRows(delta)
        .write.partitionBy("slot").mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(staging, "postings").toString)
      fs.create(new org.apache.hadoop.fs.Path(staging, "_STAGED"), true).close()
    }

    // crash window A: staged + fenced, never promoted
    val idxA = tmp("li_crash_a")
    LexQueries.buildLexIndexFrom(spark, base, idxA)
    stage(idxA, 3L)
    LexIngest.ingestBatch(spark, delta, idxA, 3L)
    assert(postingRows(idxA) == rows1)

    // crash window B: one staged file already promoted (mid-promote)
    val idxB = tmp("li_crash_b")
    LexQueries.buildLexIndexFrom(spark, base, idxB)
    stage(idxB, 4L)
    val stagedFiles = JFiles.walk(Paths.get(s"$idxB/_staging/4/postings"))
      .iterator().asScala
      .filter(p => JFiles.isRegularFile(p) && p.toString.endsWith(".parquet")).toSeq
    assert(stagedFiles.nonEmpty)
    val first = stagedFiles.head
    val slotDir = first.getParent.getFileName.toString // slot=X
    val target = Paths.get(s"$idxB/postings/$slotDir/ingest-4-${first.getFileName}")
    JFiles.createDirectories(target.getParent)
    JFiles.move(first, target)
    LexIngest.ingestBatch(spark, delta, idxB, 4L)
    assert(postingRows(idxB) == rows1,
      "mid-promote replay must complete to the exact one-pass row set")
  }

  test("crash-window replay re-marks bounds stale even after an intervening refresh") {
    // the exact interleave the beforePromote seam exists for: a batch
    // stages fully (_STAGED fence) and crashes before promoting; an
    // operator runs refreshLexicon (marker cleared, bounds now cover
    // the STANDING postings only); the stream restarts and replays the
    // batch — the promote grows the postings, so the marker MUST come
    // back, or pruned serving would silently trust stale bounds
    val docs = graft.sources.Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val delta = docs.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), col("text"))
    val idx = tmp("li_stale_window")
    LexQueries.buildLexIndexFrom(spark, base, idx)
    // stage batch 9 without promoting (the crash)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(s"$idx/_staging/9")
    LexQueries.postingRows(delta)
      .write.partitionBy("slot").mode("overwrite")
      .parquet(new org.apache.hadoop.fs.Path(staging, "postings").toString)
    fs.create(new org.apache.hadoop.fs.Path(staging, "_STAGED"), true).close()
    // the intervening refresh clears any staleness
    LexQueries.refreshLexicon(spark, idx)
    assert(!LexQueries.boundsStale(spark, idx))
    // replay completes the promote — and must re-mark
    LexIngest.ingestBatch(spark, delta, idx, 9L)
    assert(LexQueries.boundsStale(spark, idx),
      "the crash-window replay grew the postings; bounds must be stale again")
  }

  test("auto-refresh cadence: grow past the threshold → bounds fresh, pruned serving exact; restart catches up") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = graft.sources.Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val deltaRows = docs.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val (half1, half2) = deltaRows.splitAt(deltaRows.size / 2)

    val idx = tmp("li_autorf")
    LexQueries.buildLexIndexFrom(spark, base, idx)
    // manual twin: batch append + manual refresh — what the cadence
    // must reproduce bit for bit once it fires
    val twin = tmp("li_autorf_twin")
    LexQueries.buildLexIndexFrom(spark, base, twin)
    LexQueries.appendLexIndex(spark,
      docs.filter(col("doc_id") % 4 === 0), twin)
    LexQueries.refreshLexicon(spark, twin)

    val ms = MemoryStream[(Long, String)]
    // threshold: more than half1, at most the whole delta — the first
    // batch must leave the bounds stale, the second must refresh them
    val query = LexIngest.start(spark, ms.toDF().toDF("doc_id", "text"),
      idx, tmp("li_autorf_ckpt"),
      refreshEveryDocs = half1.size + 1L)
    try {
      ms.addData(half1: _*); query.processAllAvailable()
      assert(LexQueries.boundsStale(spark, idx),
        "below the threshold the bounds must stay (honestly) stale")
      ms.addData(half2: _*); query.processAllAvailable()
      assert(!LexQueries.boundsStale(spark, idx),
        "crossing the threshold must refresh the bounds")
    } finally query.stop()
    // refreshed state == manual append+refresh, bit for bit
    def lexRows(p: String) = spark.read.parquet(s"$p/lexicon")
      .select(col("tok"), col("df"), col("ub"))
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(lexRows(idx) == lexRows(twin))
    val statsOf = (p: String) => LexQueries.loadStats(spark, p)
      .collect().map(_.toSeq).toSeq
    assert(statsOf(idx) == statsOf(twin))
    // pruned serving is available again and exact
    val run = LexQueries.maxscoreFromIndex(spark, idx)
    assert(!run.boundsStale, "pruned serving must be armed post-refresh")
    val unpruned = LexQueries.rankTop10(LexQueries.multitermTotals(
        LexQueries.serveTermScores(spark, idx, LexQueries.QueryTerms,
          LexQueries.loadStats(spark, idx))))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(run.result.collect().map(_.toSeq).sortBy(_.mkString("|"))
      .sameElements(unpruned))

    // restart catch-up: an index left stale (crash before the cadence
    // fired) seeds the counter at the threshold — the FIRST committed
    // batch of the new stream triggers the catch-up refresh
    val idx2 = tmp("li_autorf2")
    LexQueries.buildLexIndexFrom(spark, base, idx2)
    LexQueries.appendLexIndex(spark,
      spark.createDataFrame(Seq((900001L, "join vector stream"))).toDF("doc_id", "text"),
      idx2)
    assert(LexQueries.boundsStale(spark, idx2))
    val ms2 = MemoryStream[(Long, String)]
    val query2 = LexIngest.start(spark, ms2.toDF().toDF("doc_id", "text"),
      idx2, tmp("li_autorf2_ckpt"), refreshEveryDocs = 1000000L)
    try {
      ms2.addData((900002L, "window spark")); query2.processAllAvailable()
      assert(!LexQueries.boundsStale(spark, idx2),
        "a stale index must catch up on the new stream's first batch")
    } finally query2.stop()
  }
}
