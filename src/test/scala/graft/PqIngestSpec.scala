package graft

import graft.queries.SimilarityQueries
import graft.streaming.PqIngest

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.{Files => JFiles, Paths}
import scala.jdk.CollectionConverters._

/** Streaming IVFPQ ingest ([[PqIngest]]): the embedding firehose →
  * compressed-index edge, [[VecIngestSpec]]'s composite twin. Pins:
  *   1. two streamed micro-batches land EXACTLY the code rows + sidecar
  *      the batch absorb ([[SimilarityQueries.ivfPqAbsorb]]) lands, and
  *      ADC serving over the streamed index is bit-identical to serving
  *      the batch-absorbed one (frozen centroids/codebooks make the
  *      encode deterministic);
  *   2. a replayed (already-committed) batch is a byte-level no-op
  *      (the shared StagedCommit protocol's crash windows are pinned by
  *      VecIngestSpec / LexIngestSpec; this spec pins the PQ payload). */
class PqIngestSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val q = SimilarityQueries

  private def tmp(prefix: String) = JFiles.createTempDirectory(prefix).toString

  private def num(v: Any): Long = v.asInstanceOf[Number].longValue

  private def codeRows(idx: String): Seq[(Long, Long, Long, Long)] =
    spark.read.parquet(s"$idx/postings")
      .select(col("vid"), col("m"), col("code"), col("bucket").cast("long"))
      .collect()
      .map(r => (num(r.get(0)), num(r.get(1)), num(r.get(2)), num(r.get(3))))
      .toSeq.sorted

  test("streamed PQ ingest == batch absorb: code rows, sidecar, ADC serving") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val idxStream = tmp("pqi_stream")
    val idxBatch = tmp("pqi_batch")
    q.buildIvfPqIndexBase(spark, dir, idxStream)
    q.buildIvfPqIndexBase(spark, dir, idxBatch)
    val delta = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding"))
    q.ivfPqAbsorb(spark, idxBatch, delta)

    val deltaRows = delta.as[(Long, Seq[Float])].collect().toSeq
    val (half1, half2) = deltaRows.splitAt(deltaRows.size / 2)
    val ms = MemoryStream[(Long, Seq[Float])]
    val query = PqIngest.start(
      spark, ms.toDF().toDF("vec_id", "embedding"), idxStream, tmp("pqi_ckpt"))
    try {
      ms.addData(half1: _*); query.processAllAvailable()
      ms.addData(half2: _*); query.processAllAvailable()
    } finally query.stop()

    assert(codeRows(idxStream) == codeRows(idxBatch),
      "streamed code rows must equal the batch absorb's")
    def idmap(idx: String) = spark.read.parquet(s"$idx/idmap")
      .collect().map(r => (num(r.get(0)), num(r.get(1)))).toSeq.sorted
    assert(idmap(idxStream) == idmap(idxBatch))
    assert(JFiles.exists(Paths.get(s"$idxStream/_ingest_commits/0")))
    assert(JFiles.exists(Paths.get(s"$idxStream/_ingest_commits/1")))

    // ADC serving parity, bit-identical
    def served(idx: String) = q.ivfPqAnnServe(spark, dir, idx)
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(served(idxStream) == served(idxBatch))
    assert(served(idxStream).nonEmpty)
  }

  test("replaying a committed PQ batch is a byte-level no-op") {
    val idx = tmp("pqi_replay")
    q.buildIvfPqIndexBase(spark, dir, idx)
    val centStored0 = spark.read.parquet(s"$idx/centroids")
    val centRow = centStored0
      .agg(collect_list(struct(col("cid"), col("cemb"), col("cnrm"))).as("cents"))
    val centStored = centStored0.select(col("cid"), col("cemb"))
    val cb = spark.read.parquet(s"$idx/codebooks")
    val delta = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding"))
    PqIngest.ingestBatch(spark, delta, centRow, centStored, cb, idx, 9L)
    def files(root: String) = JFiles.walk(Paths.get(root)).iterator().asScala
      .filter(p => JFiles.isRegularFile(p) && p.toString.endsWith(".parquet"))
      .map(_.toString.stripPrefix(root)).toSet
    val after1 = files(idx)
    PqIngest.ingestBatch(spark, delta, centRow, centStored, cb, idx, 9L)
    assert(files(idx) == after1)
  }
}
