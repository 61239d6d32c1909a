package graft

import graft.queries.SimilarityQueries
import graft.streaming.VecIngest

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.{Files => JFiles, Paths}
import scala.jdk.CollectionConverters._

/** Streaming vector ingest ([[VecIngest]]): the embedding firehose →
  * persisted IVF index edge. Pins the three contracts:
  *   1. two streamed micro-batches land EXACTLY the rows batch
  *      [[SimilarityQueries.appendIvfIndex]] lands, and serving the
  *      streamed index is bit-identical to serving the batch-appended
  *      one (frozen-centroid routing is deterministic);
  *   2. a replayed (already-committed) batch is a byte-level no-op;
  *   3. the two crash-window replays — staging complete but unpromoted,
  *      and promote interrupted halfway — both complete to the exact
  *      one-pass result, no duplicate and no lost posting. */
class VecIngestSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val q = SimilarityQueries

  private def tmp(prefix: String) = JFiles.createTempDirectory(prefix).toString

  private def num(v: Any): Long = v.asInstanceOf[Number].longValue

  private def postingPairs(idx: String): Seq[(Long, Long)] =
    spark.read.parquet(s"$idx/postings")
      .select(col("vec_id"), col("bucket").cast("long"))
      .collect().map(r => (num(r.get(0)), num(r.get(1)))).toSeq

  private def fileNames(root: String): Set[String] =
    JFiles.walk(Paths.get(root)).iterator().asScala
      .filter(p => JFiles.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(_.toString.stripPrefix(root)).toSet

  test("streamed ingest == batch append: postings, sidecar, and served answers") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idxStream = tmp("vi_stream")
    val idxBatch = tmp("vi_batch")
    q.buildIvfIndexBase(spark, dir, idxStream)
    q.buildIvfIndexBase(spark, dir, idxBatch)
    q.appendIvfIndex(spark, dir, idxBatch)

    val delta = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val (half1, half2) = delta.splitAt(delta.size / 2)
    val ms = MemoryStream[(Long, Seq[Float])]
    val query = VecIngest.start(
      spark, ms.toDF().toDF("vec_id", "embedding"), idxStream, tmp("vi_ckpt"))
    try {
      ms.addData(half1: _*); query.processAllAvailable()
      ms.addData(half2: _*); query.processAllAvailable()
    } finally query.stop()

    // row-set equality on both stores
    assert(postingPairs(idxStream).sorted == postingPairs(idxBatch).sorted)
    def idmap(idx: String) = spark.read.parquet(s"$idx/idmap")
      .collect().map(r => (num(r.get(0)), num(r.get(1)))).toSeq.sorted
    assert(idmap(idxStream) == idmap(idxBatch))
    // no staging residue, and the commit markers exist for both batches
    assert(!JFiles.exists(Paths.get(s"$idxStream/_staging")) ||
      JFiles.list(Paths.get(s"$idxStream/_staging")).count() == 0)
    assert(JFiles.exists(Paths.get(s"$idxStream/_ingest_commits/0")))
    assert(JFiles.exists(Paths.get(s"$idxStream/_ingest_commits/1")))

    // serving parity, bit-identical (same centroids, same routing)
    def served(idx: String) = q.annIvfServe(spark, dir, idx)
      .collect().map(r => (num(r.get(0)), num(r.get(1)), r.getDouble(2))).toSet
    assert(served(idxStream) == served(idxBatch))
    // the streamed delta actually surfaces
    assert(served(idxStream).exists(_._2 % 4 == 0))
  }

  test("replay is a no-op; both crash windows complete without duplicates") {
    val idx = tmp("vi_replay")
    q.buildIvfIndexBase(spark, dir, idx)
    val centRow = q.loadCentRow(spark, idx).cache()
    val delta = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding"))

    // committed-batch replay: byte-level no-op
    VecIngest.ingestBatch(spark, delta, centRow, idx, 7L)
    val after1 = fileNames(idx)
    val pairs1 = postingPairs(idx).sorted
    VecIngest.ingestBatch(spark, delta, centRow, idx, 7L)
    assert(fileNames(idx) == after1, "replaying a committed batch must change nothing")

    // crash window A: staging written + fenced, promote never ran —
    // the replay must promote exactly the staged files
    val idxA = tmp("vi_crash_a")
    q.buildIvfIndexBase(spark, dir, idxA)
    val fs = new org.apache.hadoop.fs.Path(idxA)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def stage(index: String, id: Long): Unit = {
      val staging = new org.apache.hadoop.fs.Path(s"$index/_staging/$id")
      val asn = q.routeIngestBatch(delta, centRow)
      asn.write.partitionBy("bucket").mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(staging, "postings").toString)
      asn.select(col("vec_id"), col("bucket").cast("long").as("bucket"))
        .write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(staging, "idmap").toString)
      fs.create(new org.apache.hadoop.fs.Path(staging, "_STAGED"), true).close()
    }
    stage(idxA, 3L)
    VecIngest.ingestBatch(spark, delta, centRow, idxA, 3L)
    assert(postingPairs(idxA).sorted == pairs1.map(identity)) // same rows as the clean commit

    // crash window B: one staged file already promoted (mid-promote
    // crash) — the replay must skip it and move the rest, no dupes
    val idxB = tmp("vi_crash_b")
    q.buildIvfIndexBase(spark, dir, idxB)
    stage(idxB, 4L)
    val stagedFiles = JFiles.walk(Paths.get(s"$idxB/_staging/4/postings"))
      .iterator().asScala
      .filter(p => JFiles.isRegularFile(p) && p.toString.endsWith(".parquet")).toSeq
    assert(stagedFiles.nonEmpty)
    val first = stagedFiles.head
    val bucketDir = first.getParent.getFileName.toString // bucket=X
    val target = Paths.get(s"$idxB/postings/$bucketDir/ingest-4-${first.getFileName}")
    JFiles.createDirectories(target.getParent)
    JFiles.move(first, target)
    VecIngest.ingestBatch(spark, delta, centRow, idxB, 4L)
    assert(postingPairs(idxB).sorted == pairs1.map(identity),
      "mid-promote replay must complete to the exact one-pass row set")
    centRow.unpersist()
  }
}
