package graft

import graft.queries.SimilarityQueries
import org.apache.spark.sql.functions._

import java.nio.file.{Files => JFiles, Paths}
import scala.jdk.CollectionConverters._

/** The index retire lifecycle: delete (tombstone) → tombstone-aware
  * serving → bucket-scoped compaction. Pins the three contracts the
  * lifecycle exists for:
  *   1. a retired id NEVER surfaces as a candidate (either side);
  *   2. compaction rewrites ONLY the touched bucket partitions —
  *      untouched posting files stay byte-identical;
  *   3. compaction changes storage, never results (post-compact serving
  *      equals pre-compact tombstone-aware serving), and is idempotent.
  */
class IndexRetireSpec extends SparkSuite {

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

  test("IVF retire: tombstoned ids never surface; compaction touches only their buckets; results invariant") {
    val idx = JFiles.createTempDirectory("ivf_retire").toString
    q.buildIvfIndex(spark, dir, idx)
    val retired = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id")).filter(col("vec_id") % 10 === 7)
    val retiredIds = retired.collect().map(r => num(r.get(0))).toSet
    assert(retiredIds.nonEmpty)
    q.ivfIndexDelete(spark, idx, retired)

    // delete wrote tombstones only — not one posting file changed
    val postingSigsAtBuild = fileSigs(s"$idx/postings")
    // tombstones recorded each id's bucket (what scopes the compaction)
    val tomb = spark.read.parquet(s"$idx/tombstones")
    assert(tomb.select("vec_id").distinct().count() == retiredIds.size)
    val touchedBuckets = tomb.select("bucket").distinct()
      .collect().map(r => num(r.get(0))).toSet

    // 1. tombstone-aware serving: no retired id on either side
    val served = q.annIvfDeleted(spark, dir).collect()
    assert(served.nonEmpty)
    served.foreach { r =>
      assert(!retiredIds.contains(num(r.getAs[Any]("qid"))), s"retired qid served: $r")
      assert(!retiredIds.contains(num(r.getAs[Any]("vid"))), s"retired vid served: $r")
    }
    // capture the tombstone-aware results from THIS index for the
    // invariance check (annIvfDeleted uses its own cached index; the
    // local one exercises the raw lifecycle calls)
    val preCompact = spark.read.parquet(s"$idx/postings")
      .join(spark.read.parquet(s"$idx/tombstones").select(col("vec_id")),
        Seq("vec_id"), "left_anti")
      .collect().map(r => num(r.getAs[Any]("vec_id"))).toSet
    assert(preCompact.intersect(retiredIds).isEmpty)

    // 2. compaction: only touched bucket partitions rewritten
    assert(fileSigs(s"$idx/postings") == postingSigsAtBuild,
      "delete must not touch posting files")
    q.ivfIndexCompact(spark, idx)
    val after = fileSigs(s"$idx/postings")
    def bucketOf(path: String): Long =
      "bucket=(-?\\d+)".r.findFirstMatchIn(path).get.group(1).toLong
    postingSigsAtBuild.foreach { case (p, sig) =>
      if (!touchedBuckets.contains(bucketOf(p)))
        assert(after.get(p).contains(sig),
          s"untouched bucket file rewritten or removed: $p")
      else
        assert(!after.get(p).contains(sig),
          s"touched bucket file must be rewritten: $p")
    }
    // tombstones cleared; retired rows physically gone
    assert(!JFiles.exists(Paths.get(s"$idx/tombstones")))
    val postIds = spark.read.parquet(s"$idx/postings")
      .select("vec_id").collect().map(r => num(r.get(0))).toSet
    assert(postIds.intersect(retiredIds).isEmpty)
    // 3. storage changed, membership didn't
    assert(postIds == preCompact, "compaction must not change surviving rows")

    // idempotent: a second compaction with no tombstones is a no-op
    q.ivfIndexCompact(spark, idx)
    assert(fileSigs(s"$idx/postings") == after)
  }

  test("delete resolution: sidecar-only (zero postings files read), appended ids covered, " +
      "compact prunes the sidecar, legacy fallback intact") {
    import spark.implicits._
    val idx = JFiles.createTempDirectory("ivf_sidecar").toString
    q.buildIvfIndexBase(spark, dir, idx)
    q.appendIvfIndex(spark, dir, idx)
    val ids = Seq(7L, 8L, 17L).toDF("vec_id") // 8 is an appended (%4==0) id
    // the resolution plan must touch the idmap sidecar ONLY — never a
    // posting file (the O(two-longs-per-vector) cost claim)
    val res = q.deleteResolutionFrame(spark, idx, ids)
    val files = res.inputFiles
    assert(files.nonEmpty && files.forall(f => !f.contains("/postings")),
      s"delete resolution must not read postings, read: ${files.mkString(",")}")
    assert(files.forall(_.contains("/idmap")))
    // appended ids resolve too (appendIdMap keeps the sidecar complete)
    val resolved = res.select("vec_id").collect().map(r => num(r.get(0))).toSet
    assert(resolved == Set(7L, 8L, 17L))
    // buckets agree with the postings' ground truth
    val truth = spark.read.parquet(s"$idx/postings")
      .filter(col("vec_id").isin(7L, 8L, 17L))
      .select("vec_id", "bucket").collect()
      .map(r => (num(r.get(0)), num(r.get(1)))).toSet
    assert(res.select("vec_id", "bucket").collect()
      .map(r => (num(r.get(0)), num(r.get(1)))).toSet == truth)

    // delete + compact: the sidecar is pruned alongside the postings
    q.ivfIndexDelete(spark, idx, ids)
    q.ivfIndexCompact(spark, idx)
    val idmapIds = spark.read.parquet(s"$idx/idmap")
      .select("vec_id").collect().map(r => num(r.get(0))).toSet
    assert(idmapIds.intersect(Set(7L, 8L, 17L)).isEmpty,
      "compact must drop removed ids from the sidecar")
    val liveIds = spark.read.parquet(s"$idx/postings")
      .select("vec_id").collect().map(r => num(r.get(0))).toSet
    assert(idmapIds == liveIds, "sidecar must track the live index exactly")

    // legacy fallback: an index without a sidecar still resolves, via
    // the column-pruned postings read
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/idmap"), true)
    val legacy = q.deleteResolutionFrame(spark, idx, Seq(27L).toDF("vec_id"))
    assert(legacy.inputFiles.forall(_.contains("/postings")))
    assert(legacy.select("vec_id").collect().map(r => num(r.get(0))).toSet == Set(27L))
  }

  test("IVF retire: a fully-deleted bucket's directory is dropped") {
    val idx = JFiles.createTempDirectory("ivf_retire_full").toString
    q.buildIvfIndex(spark, dir, idx)
    // retire EVERY member of one bucket
    val postings = spark.read.parquet(s"$idx/postings")
    val someBucket = postings.select("bucket").distinct()
      .orderBy(col("bucket")).limit(1).collect()(0) match { case r => num(r.get(0)) }
    val victims = postings.filter(col("bucket") === someBucket)
      .select(col("vec_id"))
    q.ivfIndexDelete(spark, idx, victims)
    q.ivfIndexCompact(spark, idx)
    assert(!JFiles.exists(Paths.get(s"$idx/postings/bucket=$someBucket")),
      "an emptied bucket directory must be dropped, not left stale")
    // and the emptied bucket really contributes nothing
    assert(spark.read.parquet(s"$idx/postings")
      .filter(col("bucket") === someBucket).count() == 0)
  }

  test("IVFPQ retire: code postings compact bucket-scoped; deleted == compacted") {
    val idx = JFiles.createTempDirectory("ivfpq_retire").toString
    q.buildIvfPqIndex(spark, dir, idx)
    val retired = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id")).filter(col("vec_id") % 10 === 7)
    val retiredIds = retired.collect().map(r => num(r.get(0))).toSet
    q.ivfPqIndexDelete(spark, idx, retired)
    val before = fileSigs(s"$idx/postings")
    val touched = spark.read.parquet(s"$idx/tombstones")
      .select("bucket").distinct().collect().map(r => num(r.get(0))).toSet
    q.ivfIndexCompact(spark, idx, idCol = "vid")
    val after = fileSigs(s"$idx/postings")
    def bucketOf(p: String): Long =
      "bucket=(-?\\d+)".r.findFirstMatchIn(p).get.group(1).toLong
    before.foreach { case (p, sig) =>
      if (!touched.contains(bucketOf(p)))
        assert(after.get(p).contains(sig), s"untouched code bucket rewritten: $p")
    }
    // every code row of a retired vector is gone (all M subspace rows)
    val postIds = spark.read.parquet(s"$idx/postings")
      .select("vid").collect().map(r => num(r.get(0))).toSet
    assert(postIds.intersect(retiredIds).isEmpty)
    // serving parity: tombstone-aware == compacted, no retired id anywhere
    val del = q.ivfPqAnnDeleted(spark, dir).collect()
      .map(r => (num(r.get(0)), num(r.get(1)))).toSet
    val comp = q.ivfPqAnnCompacted(spark, dir).collect()
      .map(r => (num(r.get(0)), num(r.get(1)))).toSet
    assert(del == comp, "IVFPQ compaction must not change serving results")
    assert(del.nonEmpty)
    del.foreach { case (qid, vid) =>
      assert(!retiredIds.contains(qid) && !retiredIds.contains(vid))
    }
  }

  test("LSH retire: compaction removes tombstoned signatures, serving unchanged, idempotent") {
    val idx = JFiles.createTempDirectory("lsh_retire").toString
    q.buildLshIndex(spark, dir, idx)
    q.lshIndexAppend(spark, dir, idx)
    val retired = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id")).filter(col("doc_id") % 10 === 7)
    val retiredIds = retired.collect().map(r => num(r.get(0))).toSet
    q.lshIndexDelete(spark, idx, retired)
    def pairsFrom(postings: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
      val all = postings.select(col("doc_id"), col("band"), col("sig"))
      val delta = all.filter(col("doc_id") % 4 === 0)
        .select(col("doc_id").as("doc_d"), col("band").as("band_d"),
          col("sig").as("sig_d"))
      all.join(delta,
          col("band") === col("band_d") && col("sig") === col("sig_d") &&
            col("doc_id") =!= col("doc_d"))
        .select(least(col("doc_id"), col("doc_d")), greatest(col("doc_id"), col("doc_d")))
        .distinct().collect().map(r => (num(r.get(0)), num(r.get(1)))).toSet
    }
    val tombIds = spark.read.parquet(s"$idx/tombstones")
      .select(col("doc_id").as("t")).distinct()
    val pre = spark.read.parquet(s"$idx/postings")
    val tombAware = pairsFrom(
      pre.join(tombIds, pre("doc_id") === tombIds("t"), "left_anti"))
    q.lshIndexCompact(spark, idx)
    assert(!JFiles.exists(java.nio.file.Paths.get(s"$idx/tombstones")))
    val post = spark.read.parquet(s"$idx/postings")
    // every signature row of a retired doc is physically gone
    assert(post.select("doc_id").collect().map(r => num(r.get(0))).toSet
      .intersect(retiredIds).isEmpty)
    // compaction changes storage, never candidates
    assert(pairsFrom(post) == tombAware)
    // idempotent: a second compaction with no tombstones is a no-op
    val sigs = fileSigs(s"$idx/postings")
    q.lshIndexCompact(spark, idx)
    assert(fileSigs(s"$idx/postings") == sigs)
  }

  test("retire results: deleted == compacted == full serve minus retired (and LSH side never surfaces a tombstone)") {
    val del = q.annIvfDeleted(spark, dir).collect()
      .map(r => (num(r.get(0)), num(r.get(1)))).toSet
    val comp = q.annIvfCompacted(spark, dir).collect()
      .map(r => (num(r.get(0)), num(r.get(1)))).toSet
    assert(del == comp, "compaction must not change serving results")
    // LSH: tombstoned docs absent from every candidate pair
    val pairs = q.incrementalNearDupDeleted(spark, dir).collect()
    pairs.foreach { r =>
      assert(num(r.getAs[Any]("doc_a")) % 10 != 7 && num(r.getAs[Any]("doc_b")) % 10 != 7,
        s"retired doc surfaced in a pair: $r")
    }
    // and the deleted variant is exactly the undeleted pair set minus
    // pairs touching a retired endpoint
    val full = q.incrementalNearDup(spark, dir).collect()
      .map(r => (num(r.get(0)), num(r.get(1)))).toSet
    val expect = full.filter { case (a, b) => a % 10 != 7 && b % 10 != 7 }
    assert(pairs.map(r => (num(r.get(0)), num(r.get(1)))).toSet == expect)
  }

  test("autoCompact retire == retire-then-manual-compact, every family (the RetireAb override pin)") {
    import spark.implicits._
    val q = SimilarityQueries
    def tmp(pfx: String) = JFiles.createTempDirectory(pfx).toString
    // IVF: source retire with autoCompact vs manual compact — identical
    // surviving attrs/postings row sets and zero tombstones both ways
    val a = tmp("rt_auto"); val m = tmp("rt_man")
    q.buildIvfIndex(spark, dir, a); q.buildIvfIndex(spark, dir, m)
    q.ivfIndexDeleteSource(spark, a, q.RetiredVecSource, autoCompact = true)
    q.ivfIndexDeleteSource(spark, m, q.RetiredVecSource)
    q.ivfIndexCompact(spark, m)
    def postRows(idx: String) = spark.read.parquet(s"$idx/postings")
      .select(col("vec_id"), col("bucket").cast("long"))
      .as[(Long, Long)].collect().toSet
    def attrRows(idx: String) = spark.read.parquet(s"$idx/attrs")
      .select(col("vec_id")).as[Long].collect().toSet
    def noTombs(idx: String) = !new org.apache.hadoop.fs.Path(s"$idx/tombstones")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(new org.apache.hadoop.fs.Path(s"$idx/tombstones"))
    assert(postRows(a) == postRows(m) && attrRows(a) == attrRows(m))
    assert(noTombs(a) && noTombs(m),
      "autoCompact must clear the tombstone set exactly like a manual compact")
    // IVFPQ label retire, same contract over the code layout
    val pa = tmp("rt_pq_auto"); val pm = tmp("rt_pq_man")
    q.buildIvfPqIndex(spark, dir, pa); q.buildIvfPqIndex(spark, dir, pm)
    q.ivfPqIndexDeleteLabel(spark, pa, q.RetiredLabel, autoCompact = true)
    q.ivfPqIndexDeleteLabel(spark, pm, q.RetiredLabel)
    q.ivfIndexCompact(spark, pm, idCol = "vid")
    def codeRows(idx: String) = spark.read.parquet(s"$idx/postings")
      .select(col("vid"), col("m").cast("long"), col("code").cast("long"))
      .as[(Long, Long, Long)].collect().toSet
    assert(codeRows(pa) == codeRows(pm) && noTombs(pa) && noTombs(pm))
    // lex source retire
    val la = tmp("rt_lex_auto"); val lm = tmp("rt_lex_man")
    graft.queries.LexQueries.buildLexIndex(spark, dir, la)
    graft.queries.LexQueries.buildLexIndex(spark, dir, lm)
    graft.queries.LexQueries.deleteLexSource(spark, la,
      graft.queries.LexQueries.RetiredSource, autoCompact = true)
    graft.queries.LexQueries.deleteLexSource(spark, lm,
      graft.queries.LexQueries.RetiredSource)
    graft.queries.LexQueries.compactLexIndex(spark, lm)
    def lexRows(idx: String) = spark.read.parquet(s"$idx/postings")
      .select(col("tok"), col("doc_id")).as[(String, Long)].collect().toSet
    assert(lexRows(la) == lexRows(lm) && noTombs(la) && noTombs(lm))
    // lsh source retire
    val sa = tmp("rt_lsh_auto"); val sm = tmp("rt_lsh_man")
    q.buildLshIndex(spark, dir, sa); q.buildLshIndex(spark, dir, sm)
    q.lshIndexDeleteSource(spark, sa,
      graft.queries.LexQueries.RetiredSource, autoCompact = true)
    q.lshIndexDeleteSource(spark, sm, graft.queries.LexQueries.RetiredSource)
    q.lshIndexCompact(spark, sm)
    def sigRows(idx: String) = spark.read.parquet(s"$idx/postings")
      .select(col("doc_id"), col("band").cast("long"), col("sig"))
      .as[(Long, Long, String)].collect().toSet
    assert(sigRows(sa) == sigRows(sm) && noTombs(sa) && noTombs(sm))
  }
}
