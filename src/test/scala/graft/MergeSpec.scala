package graft

import graft.queries.SimilarityQueries
import graft.sources.Tables
import org.apache.spark.sql.functions._

import java.nio.file.{Files => JFiles, Paths}
import scala.jdk.CollectionConverters._

/** Shard-parallel IVF build + merge ([[SimilarityQueries.ivfIndexMergeInto]]).
  * Pins the contracts the merge exists for:
  *   1. merge is append-only on the destination — every posting file
  *      present before the merge stays byte-identical;
  *   2. the merged index covers BOTH shards, routed by the DESTINATION's
  *      frozen centroids (merge ≡ one-pass assignment of the union);
  *   3. the sidecar stays consistent (one (vec_id, bucket) row per
  *      posting row), so deletes on the merged index stay O(batch);
  *   4. source vectors tombstoned before the merge never enter the
  *      destination — merge doubles as their physical purge.
  */
class MergeSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"
  private val q = SimilarityQueries

  private def num(v: Any): Long = v.asInstanceOf[Number].longValue

  private def fileSigs(root: String): Map[String, (Long, Int)] =
    JFiles.walk(Paths.get(root)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && JFiles.isRegularFile(p))
      .map { p =>
        val bytes = JFiles.readAllBytes(p)
        p.toString -> (bytes.length.toLong, java.util.Arrays.hashCode(bytes))
      }.toMap

  test("IVF shard merge: append-only, dst-centroid routing, sidecar consistent, src tombstones purged") {
    val dstIdx = JFiles.createTempDirectory("ivf_merge_dst").toString
    val srcIdx = JFiles.createTempDirectory("ivf_merge_src").toString
    val e = Tables.embeddings(spark, dir)

    // shard A (odd) → dst, shard B (even) → src, via the public
    // single-shard build (buildIvfIndexMerged wraps the same calls)
    val odd = e.filter(col("vec_id") % 2 === 1)
    val even = e.filter(col("vec_id") % 2 === 0)
    q.buildIvfIndexSlice(spark, odd, dstIdx)
    q.buildIvfIndexSlice(spark, even, srcIdx)

    // tombstone a slice of the SOURCE shard before merging
    val retired = even.select(col("vec_id")).filter(col("vec_id") % 10 === 4)
    val retiredIds = retired.collect().map(r => num(r.get(0))).toSet
    assert(retiredIds.nonEmpty)
    q.ivfIndexDelete(spark, srcIdx, retired)

    val dstSigsBefore = fileSigs(s"$dstIdx/postings")
    q.ivfIndexMergeInto(spark, dstIdx, srcIdx)

    // 1. append-only: every pre-merge posting file is byte-identical
    val dstSigsAfter = fileSigs(s"$dstIdx/postings")
    dstSigsBefore.foreach { case (path, sig) =>
      assert(dstSigsAfter.get(path).contains(sig), s"pre-merge file rewritten: $path")
    }
    assert(dstSigsAfter.size > dstSigsBefore.size, "merge added no posting files")

    // 2. coverage + routing: all odd ids, all even ids EXCEPT the
    //    tombstoned ones, each in exactly one bucket, and that bucket is
    //    the argmax against the DESTINATION's stored centroids
    val postings = spark.read.parquet(s"$dstIdx/postings")
      .select(col("vec_id"), col("bucket").cast("long").as("bucket"))
    val got = postings.collect().map(r => num(r.get(0)) -> num(r.get(1))).toMap
    val allIds = e.select(col("vec_id")).collect().map(r => num(r.get(0))).toSet
    val expectIds = allIds.filterNot(retiredIds)
    assert(got.keySet == expectIds)
    assert(postings.count() == expectIds.size.toLong, "a vec_id landed in more than one bucket")
    // 4. (interleaved with 2) purged: no tombstoned id anywhere
    retiredIds.foreach(id => assert(!got.contains(id), s"tombstoned $id entered the merge"))

    // routing parity: re-derive the expected bucket per vector from the
    // stored dst centroids with the SAME serving code path
    val expected = q.routeAgainstIndex(spark, e, dstIdx)
      .collect().map(r => num(r.get(0)) -> num(r.get(1))).toMap
    expectIds.foreach { id =>
      assert(got(id) == expected(id), s"vec $id routed to ${got(id)}, dst centroids say ${expected(id)}")
    }

    // 3. sidecar consistency: idmap rows == posting rows, same pairs
    val idmap = spark.read.parquet(s"$dstIdx/idmap")
      .select(col("vec_id"), col("bucket").cast("long").as("bucket"))
    assert(idmap.count() == postings.count())
    assert(idmap.except(postings).count() == 0 && postings.except(idmap).count() == 0)

    // and a delete on the MERGED index still resolves through the
    // sidecar and lands in exactly one bucket's tombstones
    val mergedDelete = spark.range(1).select(lit(expectIds.head).as("vec_id"))
    q.ivfIndexDelete(spark, dstIdx, mergedDelete)
    val tomb = spark.read.parquet(s"$dstIdx/tombstones")
    assert(tomb.count() == 1 && num(tomb.collect()(0).get(0)) == expectIds.head)
  }

  test("LSH shard merge: append-only posting union, equals one-pass signing, src tombstones purged") {
    val dstIdx = JFiles.createTempDirectory("lsh_merge_dst").toString
    val srcIdx = JFiles.createTempDirectory("lsh_merge_src").toString
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val delta = docs.filter(col("doc_id") % 4 === 0)
    q.buildLshIndexSlice(base, dstIdx)
    q.buildLshIndexSlice(delta, srcIdx)

    // tombstone part of the source shard before merging
    val retired = delta.select(col("doc_id")).filter(col("doc_id") % 8 === 0)
    val retiredIds = retired.collect().map(r => num(r.get(0))).toSet
    assert(retiredIds.nonEmpty)
    q.lshIndexDelete(spark, srcIdx, retired)

    val dstSigsBefore = fileSigs(s"$dstIdx/postings")
    q.lshIndexMergeInto(spark, dstIdx, srcIdx)

    // append-only: every pre-merge posting file is byte-identical
    val dstSigsAfter = fileSigs(s"$dstIdx/postings")
    dstSigsBefore.foreach { case (path, sig) =>
      assert(dstSigsAfter.get(path).contains(sig), s"pre-merge file rewritten: $path")
    }

    // merge == one-pass signing of the live union (base + delta minus
    // the tombstoned docs), row set exactly
    val got = spark.read.parquet(s"$dstIdx/postings")
      .select(col("doc_id"), col("band").cast("long").as("band"), col("sig"))
      .collect().map(r => (num(r.get(0)), num(r.get(1)), r.getString(2))).toSet
    val onePassIdx = JFiles.createTempDirectory("lsh_onepass").toString
    q.buildLshIndexSlice(
      docs.filter(!col("doc_id").isin(retiredIds.toSeq: _*)), onePassIdx)
    val want = spark.read.parquet(s"$onePassIdx/postings")
      .select(col("doc_id"), col("band").cast("long").as("band"), col("sig"))
      .collect().map(r => (num(r.get(0)), num(r.get(1)), r.getString(2))).toSet
    assert(got == want)
    retiredIds.foreach(id => assert(!got.exists(_._1 == id), s"tombstoned doc $id entered the merge"))
  }

  test("ivfpq absorb: a foreign shard corpus re-encodes with stored artifacts, append-only, servable") {
    val idx = JFiles.createTempDirectory("pq_absorb").toString
    q.buildIvfPqIndex(spark, dir, idx)
    val sigsBefore = fileSigs(s"$idx/postings")
    val nBefore = spark.read.parquet(s"$idx/postings").count()
    // a "shard corpus": the fixture's vectors under fresh disjoint ids
    val shard = Tables.embeddings(spark, dir)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    q.ivfPqAbsorb(spark, idx, shard)
    // append-only on the standing postings
    val sigsAfter = fileSigs(s"$idx/postings")
    sigsBefore.foreach { case (p, s) =>
      assert(sigsAfter.get(p).contains(s), s"pre-absorb file rewritten: $p")
    }
    // every shard vector landed: M code rows per vector, one bucket each
    val absorbed = spark.read.parquet(s"$idx/postings")
      .filter(col("vid") >= 1000000L)
    assert(absorbed.count() == nBefore, "absorb must encode M rows per shard vector")
    assert(absorbed.select(col("vid"), col("bucket")).distinct().count() * 4 == nBefore)
    // identical vectors route identically and encode identically: the
    // absorbed twin of every original carries the SAME codes and bucket
    val orig = spark.read.parquet(s"$idx/postings").filter(col("vid") < 1000000L)
      .select(col("vid"), col("m"), col("code"), col("bucket").cast("long").as("bucket"))
      .collect().map(r => (num(r.get(0)), num(r.get(1)), num(r.get(2)), num(r.get(3)))).toSet
    val twin = absorbed
      .select((col("vid") - 1000000L).as("vid"), col("m"), col("code"),
        col("bucket").cast("long").as("bucket"))
      .collect().map(r => (num(r.get(0)), num(r.get(1)), num(r.get(2)), num(r.get(3)))).toSet
    assert(twin == orig, "stored-artifact re-encode must be deterministic")
    // the sidecar resolves a delete of an absorbed id without postings reads
    q.ivfPqIndexDelete(spark, idx, spark.range(1)
      .select(lit(1000005L).as("vec_id")))
    val tomb = spark.read.parquet(s"$idx/tombstones")
    assert(tomb.count() == 1 && num(tomb.collect()(0).get(0)) == 1000005L)
  }

  test("maintenance guard: writers refuse mid-compact, compact refuses over live ingest staging") {
    val idx = JFiles.createTempDirectory("ivf_guard").toString
    q.buildIvfIndex(spark, dir, idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val shard = Tables.embeddings(spark, dir)
      .select((col("vec_id") + 2000000L).as("vec_id"), col("embedding"))

    // a held _maintenance marker (compact in flight) must refuse every
    // append-side writer loudly — a file landed mid-rewrite would be
    // silently deleted by the bucket overwrite
    fs.create(q.maintenanceMarker(idx), true).close()
    val eAbsorb = intercept[IllegalStateException](q.ivfAbsorb(spark, idx, shard))
    assert(eAbsorb.getMessage.contains("compaction in progress"))
    intercept[IllegalStateException](q.ivfPqAbsorb(spark, idx, shard))
    intercept[IllegalStateException](q.ivfIndexMergeInto(spark, idx, idx))
    val centRow = q.loadCentRow(spark, idx)
    intercept[IllegalStateException](
      graft.streaming.VecIngest.ingestBatch(spark, shard, centRow, idx, 1L))
    fs.delete(q.maintenanceMarker(idx), false)

    // compact must refuse while an uncommitted ingest staging tree
    // exists (its promote would race the rewrite); after the staging
    // clears, the same compact runs and releases the marker
    q.ivfIndexDelete(spark, idx,
      Tables.embeddings(spark, dir).select(col("vec_id")).limit(3))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$idx/_staging/5"))
    val eCompact = intercept[IllegalStateException](q.ivfIndexCompact(spark, idx))
    assert(eCompact.getMessage.contains("_staging"))
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/_staging"), true)
    q.ivfIndexCompact(spark, idx)
    assert(!fs.exists(q.maintenanceMarker(idx)), "compact must release the marker")
    // and the writers work again post-compact
    q.ivfAbsorb(spark, idx, shard)
  }

  test("ivfpq merge: artifact-identical shards union index-to-index; divergent artifacts refuse") {
    // central-training lifecycle: artifacts train on the odd slice,
    // shard B adopts them verbatim — the merged index must equal a
    // ONE-PASS encode of the whole corpus with those artifacts
    val e = Tables.embeddings(spark, dir)
    val dst = JFiles.createTempDirectory("pqm_dst").toString
    q.buildIvfPqIndexSlice(spark, e.filter(col("vec_id") % 2 === 1), dst)
    val src = JFiles.createTempDirectory("pqm_src").toString
    q.buildIvfPqShardWithArtifacts(spark, dst,
      e.filter(col("vec_id") % 2 === 0).select(col("vec_id"), col("embedding")),
      src)
    val sigsBefore = fileSigs(s"$dst/postings")
    q.ivfPqIndexMergeInto(spark, dst, src)
    // append-only on the destination
    val sigsAfter = fileSigs(s"$dst/postings")
    sigsBefore.foreach { case (p, s) =>
      assert(sigsAfter.get(p).contains(s), s"pre-merge file rewritten: $p")
    }
    def codeSet(idx: String) = spark.read.parquet(s"$idx/postings")
      .select(col("vid"), col("m"), col("code"), col("bucket").cast("long").as("bucket"))
      .collect().map(r => (num(r.get(0)), num(r.get(1)), num(r.get(2)), num(r.get(3)))).toSet
    val onePass = JFiles.createTempDirectory("pqm_onepass").toString
    // one-pass twin: same artifacts, whole corpus encoded in one absorb
    q.buildIvfPqShardWithArtifacts(spark, dst,
      e.select(col("vec_id"), col("embedding")), onePass)
    assert(codeSet(dst) == codeSet(onePass),
      "merged codes must equal the one-pass encode under shared artifacts")
    // sidecar covers both shards (M code rows per (vec, bucket) pair)
    val idmap = spark.read.parquet(s"$dst/idmap").distinct().count()
    assert(idmap * 4 == spark.read.parquet(s"$dst/postings").count())
    // src tombstones purge on the way in
    val dst2 = JFiles.createTempDirectory("pqm_dst2").toString
    q.buildIvfPqIndexSlice(spark, e.filter(col("vec_id") % 2 === 1), dst2)
    val src2 = JFiles.createTempDirectory("pqm_src2").toString
    q.buildIvfPqShardWithArtifacts(spark, dst2,
      e.filter(col("vec_id") % 2 === 0).select(col("vec_id"), col("embedding")),
      src2)
    val victim = spark.read.parquet(s"$src2/idmap").select(col("vec_id"))
      .orderBy(col("vec_id")).limit(1)
    q.ivfPqIndexDelete(spark, src2, victim)
    val victimId = victim.collect()(0).getLong(0)
    q.ivfPqIndexMergeInto(spark, dst2, src2)
    assert(spark.read.parquet(s"$dst2/postings")
      .filter(col("vid") === victimId).count() == 0,
      "src-tombstoned vector must not enter the merge")
    assert(spark.read.parquet(s"$dst2/idmap")
      .filter(col("vec_id") === victimId).count() == 0)
    // artifact-DIVERGENT shards refuse loudly (independently trained)
    val alien = JFiles.createTempDirectory("pqm_alien").toString
    q.buildIvfPqIndexSlice(spark, e.filter(col("vec_id") % 2 === 0), alien)
    val err = intercept[IllegalArgumentException](
      q.ivfPqIndexMergeInto(spark, dst, alien))
    assert(err.getMessage.contains("ivfPqAbsorb"),
      "the refusal must point at the absorb path")
  }

  test("ann_ivf_merged equals one-pass assignment of the union against shard-A centroids") {
    // the oracle's claim, engine-side: the merged-index serving rows must
    // be bit-identical to serving an index built in ONE pass over the
    // whole corpus with shard A's centroid sample
    val merged = SparkEntry.queries("ann_ivf_merged")(spark, dir)
      .collect().map(r => (num(r.get(0)), num(r.get(1)), r.getDouble(2))).toSet
    val onePassIdx = JFiles.createTempDirectory("ivf_onepass").toString
    val e = Tables.embeddings(spark, dir)
    q.buildIvfIndexSliceCents(spark, e, e.filter(col("vec_id") % 2 === 1), onePassIdx)
    val onePass = q.annIvfServe(spark, dir, onePassIdx)
      .collect().map(r => (num(r.get(0)), num(r.get(1)), r.getDouble(2))).toSet
    assert(merged == onePass)
  }
}
