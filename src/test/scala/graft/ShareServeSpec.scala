package graft

import graft.queries.SimilarityQueries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** RESULT SHARING on the vector/LSH serving edges: a micro-batch with
  * duplicate queries must answer each qid EXACTLY as the unshared
  * per-query path would — bit for bit, including each duplicate's OWN
  * self-exclusion (the subtlety that forces the rep to serve an
  * unexcluded top-(k+1)). */
class ShareServeSpec extends SparkSuite {
  private val q = SimilarityQueries
  private val dir = "/root/testdata/sf0.001"

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit(); d.getPath
  }

  /** A head-skewed query batch: fixture embeddings 0..4, each asked by
    * three qids — one of them the INDEXED vec_id itself (self-exclusion
    * must stay per-duplicate), two synthetic duplicates — plus two
    * all-distinct stragglers (the fall-through shape). */
  private def skewedBatch(): DataFrame = {
    val base = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding"))
    val dup1 = base.select((col("vec_id") + 100L).as("vec_id"), col("embedding"))
    val dup2 = base.select((col("vec_id") + 200L).as("vec_id"), col("embedding"))
    val distinctTail = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") >= 5 && col("vec_id") < 7)
      .select(col("vec_id"), col("embedding"))
    base.unionByName(dup1).unionByName(dup2).unionByName(distinctTail)
  }

  private def sorted(df: DataFrame): Array[Seq[Any]] =
    df.collect().map(_.toSeq).sortBy(_.mkString("|"))

  test("IVF serve edge: shared == unshared bit for bit on a head-skewed batch") {
    val idx = tmp("share_ivf")
    q.buildIvfIndex(spark, dir, idx)
    val centRow = q.loadCentRow(spark, idx)
    val batch = skewedBatch()
    val shared = sorted(q.serveQueryBatch(spark, batch, centRow, idx))
    val unshared = sorted(q.serveQueryBatch(spark, batch, centRow, idx,
      shareResults = false))
    assert(shared.nonEmpty && shared.sameElements(unshared),
      s"shared(${shared.length}) != unshared(${unshared.length})")
    // the self-exclusion really differs between duplicates of one
    // embedding: qid 0 (indexed) must not see vid 0; qid 100 may
    val vids = shared.groupBy(_.head).map { case (k, rows) =>
      k.asInstanceOf[Long] -> rows.map(_(1).asInstanceOf[Long]).toSet }
    assert(!vids(0L).contains(0L), "indexed qid must exclude itself")
  }

  test("IVFPQ serve edge: shared == unshared bit for bit (incl. recomputed rn)") {
    val idx = tmp("share_ivfpq")
    q.buildIvfPqIndex(spark, dir, idx)
    val centStored = spark.read.parquet(s"$idx/centroids")
    val centRow = centStored
      .agg(collect_list(struct(col("cid"), col("cemb"), col("cnrm"))).as("cents"))
    val cent = centStored.select(col("cid").as("pcid"), col("cemb"))
    val cb = spark.read.parquet(s"$idx/codebooks")
    val batch = skewedBatch()
    val shared = sorted(q.servePqQueryBatch(spark, batch, centRow, cent, cb, idx))
    val unshared = sorted(q.servePqQueryBatch(spark, batch, centRow, cent, cb, idx,
      shareResults = false))
    assert(shared.nonEmpty && shared.sameElements(unshared),
      s"shared(${shared.length}) != unshared(${unshared.length})")
  }

  test("LSH serve edge: shared == unshared on duplicate texts") {
    val idx = tmp("share_lsh")
    q.buildLshIndex(spark, dir, idx)
    val base = graft.sources.Tables.documents(spark, dir)
      .filter(col("doc_id") % 4 === 0 && col("doc_id") < 40)
      .select(col("doc_id"), col("text"))
    val dup = base.select((col("doc_id") + 1000L).as("doc_id"), col("text"))
    val batch = base.unionByName(dup)
    val shared = sorted(graft.streaming.LshServe.candidatesFor(
      spark, batch, idx, tombstoneAware = false))
    val unshared = sorted(graft.streaming.LshServe.candidatesFor(
      spark, batch, idx, tombstoneAware = false, shareResults = false))
    assert(shared.nonEmpty && shared.sameElements(unshared),
      s"shared(${shared.length}) != unshared(${unshared.length})")
  }
}
