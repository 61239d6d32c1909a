package graft

import graft.queries.SimilarityQueries
import graft.sources.Tables

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Faceted VECTOR retrieval — the attrs-sidecar + filter-first contract
  * for the IVF/IVFPQ families ([[graft.queries.LexQueries]]'s lex-v4
  * facet design ported to embeddings):
  *
  *   - every WRITER maintains the (vec_id, label) sidecar (build,
  *     append, absorb, merge, streamed ingest, compact purge) — a grown
  *     index's facets must cover its delta vectors;
  *   - serving filters FIRST: the facet allowlist screens the posting
  *     rows before any distance or top-k, so k fills among qualifying
  *     vectors and surviving scores are bit-identical to the
  *     unfiltered serve;
  *   - the streamed facet edge equals the batch facet entry point bit
  *     for bit, and appended facet rows land on the NEXT micro-batch
  *     (the tombstone re-read discipline). */
class FacetSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  /** The ground-truth (vec_id, label) set straight from the fixture —
    * what every writer's sidecar must reproduce for its slice. */
  private def truth(pred: org.apache.spark.sql.Column): Set[(Long, Long)] =
    Tables.embeddings(spark, dir).filter(pred)
      .select(col("vec_id"), col("label").cast("long"))
      .as[(Long, Long)].collect().toSet

  private def attrsOf(idx: String): Set[(Long, Long)] =
    spark.read.parquet(s"$idx/attrs")
      .select(col("vec_id"), col("label").cast("long"))
      .as[(Long, Long)].collect().toSet

  test("every IVF writer maintains the attrs sidecar: build, append, absorb, merge, compact") {
    val q = SimilarityQueries
    // build covers the build slice
    val idx = tmp("facet_ivf")
    q.buildIvfIndexBase(spark, dir, idx)
    assert(attrsOf(idx) == truth(col("vec_id") % 4 =!= 0),
      "build must write one facet row per indexed vector")
    // append covers the delta
    q.appendIvfIndex(spark, dir, idx)
    assert(attrsOf(idx) == truth(lit(true)),
      "append must extend the facets to the delta")
    // absorb covers an arbitrary labeled frame
    val extra = Seq((100000L, Seq.fill(8)(0.25f), 3L), (100001L, Seq.fill(8)(0.5f), 7L))
      .toDF("vec_id", "embedding", "label")
    q.ivfAbsorb(spark, idx, extra)
    assert(attrsOf(idx) == truth(lit(true)) + ((100000L, 3L)) + ((100001L, 7L)))
    // a label-less absorb lands honestly in -1, never silently facet-less
    q.ivfAbsorb(spark, idx,
      Seq((100002L, Seq.fill(8)(0.75f))).toDF("vec_id", "embedding"))
    assert(attrsOf(idx).contains((100002L, -1L)))
    // delete + compact purges the tombstoned ids from the sidecar
    q.ivfIndexDelete(spark, idx, Seq(100000L, 100002L).toDF("vec_id"))
    q.ivfIndexCompact(spark, idx)
    assert(attrsOf(idx) == truth(lit(true)) + ((100001L, 7L)),
      "compact must purge tombstoned ids from the facet sidecar")
  }

  test("IVF and IVFPQ merges carry the shard's facets (src tombstones purged)") {
    val q = SimilarityQueries
    val e = Tables.embeddings(spark, dir)
    // IVF: shard B (with one tombstoned vector) merges into shard A
    val dst = tmp("facet_mrg_dst")
    val src = tmp("facet_mrg_src")
    q.buildIvfIndexSlice(spark, e.filter(col("vec_id") % 2 === 1), dst)
    q.buildIvfIndexSlice(spark, e.filter(col("vec_id") % 2 === 0), src)
    val victim = e.filter(col("vec_id") % 2 === 0)
      .select(col("vec_id")).as[Long].head()
    q.ivfIndexDelete(spark, src, Seq(victim).toDF("vec_id"))
    q.ivfIndexMergeInto(spark, dst, src)
    assert(attrsOf(dst) ==
      truth(col("vec_id") % 2 === 1) ++
        truth(col("vec_id") % 2 === 0 && col("vec_id") =!= victim),
      "merge must absorb src facets minus src tombstones")
    // IVFPQ: central-training shard merge, same contract
    val pqIdx = tmp("facet_pq_mrg")
    q.buildIvfPqIndexMerged(spark, dir, pqIdx)
    assert(attrsOf(pqIdx) == truth(lit(true)),
      "the ivfpq shard merge must cover both shards' facets")
  }

  test("filter-first faceted serving: sidecar allowlist == label truth; scores bit-identical to unfiltered") {
    val got = SimilarityQueries.filteredAnnServed(spark, dir)
      .select(col("qid"), col("vid"), col("cos"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got.nonEmpty)
    // every surfaced candidate satisfies the facet
    val facetIds = truth(col("label").cast("long") === SimilarityQueries.FacetLabel)
      .map(_._1)
    assert(got.forall(r => facetIds.contains(r._2)),
      "a non-facet candidate surfaced through the filtered serve")
    // filter-first, not post-filter: the unfiltered top-3 then filtered
    // UNDERFILLS; the filtered serve must fill k among qualifying
    // vectors in the probed buckets — so it must be a superset of the
    // post-filtered unfiltered answer, with bit-identical scores there
    val unfiltered = SimilarityQueries.annIvfServed(spark, dir)
      .select(col("qid"), col("vid"), col("cos"))
      .as[(Long, Long, Double)].collect().toSet
    val postFiltered = unfiltered.filter(r => facetIds.contains(r._2))
    assert(postFiltered.subsetOf(got),
      "filter-first must keep every facet survivor of the unfiltered " +
        "top-k, with bit-identical scores")
    assert(got.size >= postFiltered.size)
    // the composite twin obeys the same facet
    val gotPq = SimilarityQueries.ivfPqAnnFiltered(spark, dir)
      .select(col("qid"), col("vid")).as[(Long, Long)].collect().toSet
    assert(gotPq.nonEmpty && gotPq.forall(r => facetIds.contains(r._2)))
  }

  test("streamed faceted serving == batch facet entry point; appended facet rows land next micro-batch; sidecar-less index refuses") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val q = SimilarityQueries
    val idx = tmp("facet_stream_idx")
    q.buildIvfIndexBase(spark, dir, idx)
    val queryVecs = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val ms = MemoryStream[(Long, Seq[Float])]
    val outDir = tmp("facet_stream_out")
    val query = graft.streaming.AnnServe.start(
      spark, ms.toDF().toDF("vec_id", "embedding"), idx,
      (df, id) => df.write.mode("overwrite").parquet(s"$outDir/b$id"),
      tmp("facet_stream_ckpt"),
      facetLabel = Some(SimilarityQueries.FacetLabel))
    def rows(id: Long) = spark.read.parquet(s"$outDir/b$id")
      .select(col("qid"), col("vid"), col("cos"))
      .as[(Long, Long, Double)].collect().toSet
    try {
      ms.addData(queryVecs: _*)
      query.processAllAvailable()
      // batch twin over the same base index: the shared serving core
      // with the same facet screen
      val batchTwin = q.serveQueryBatch(spark,
        Tables.embeddings(spark, dir).filter(col("vec_id") < 10)
          .select(col("vec_id"), col("embedding")),
        q.loadCentRow(spark, idx), idx,
        docFilter = q.facetPostingsFilter(spark, idx, Some(q.FacetLabel)))
        .select(col("qid"), col("vid"), col("cos"))
        .as[(Long, Long, Double)].collect().toSet
      assert(rows(0L) == batchTwin,
        "streamed faceted serving must equal the batch facet path bit for bit")
      // append the delta mid-stream: its facet rows (attrs re-read per
      // batch) AND its postings land on the next micro-batch
      q.appendIvfIndex(spark, dir, idx)
      ms.addData(queryVecs: _*)
      query.processAllAvailable()
      val after = rows(1L)
      val facetIds = truth(col("label").cast("long") === q.FacetLabel).map(_._1)
      assert(after.forall(r => facetIds.contains(r._2)))
      assert(after != rows(0L),
        "appended facet vectors must become servable on the next batch " +
          "(the fixture's delta slice contains facet-label vectors near " +
          "the queries)")
    } finally query.stop()
    // a pre-sidecar index refuses faceted serving ONCE, at stream start
    val bare = tmp("facet_bare_idx")
    q.buildIvfIndexBase(spark, dir, bare)
    val fs = new org.apache.hadoop.fs.Path(bare)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$bare/attrs"), true)
    val ms2 = MemoryStream[(Long, Seq[Float])]
    intercept[IllegalArgumentException] {
      graft.streaming.AnnServe.start(
        spark, ms2.toDF().toDF("vec_id", "embedding"), bare,
        (_, _) => (), tmp("facet_bare_ckpt"),
        facetLabel = Some(q.FacetLabel))
    }
  }

  test("streamed IVFPQ faceted serving == batch facet path (the compressed-index parity pin)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val q = SimilarityQueries
    val idx = tmp("facet_pq_stream_idx")
    q.buildIvfPqIndex(spark, dir, idx)
    val queryVecs = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val ms = MemoryStream[(Long, Seq[Float])]
    val outDir = tmp("facet_pq_stream_out")
    val query = graft.streaming.PqServe.start(
      spark, ms.toDF().toDF("vec_id", "embedding"), idx,
      (df, id) => df.write.mode("overwrite").parquet(s"$outDir/b$id"),
      tmp("facet_pq_stream_ckpt"),
      facetLabel = Some(SimilarityQueries.FacetLabel))
    try {
      ms.addData(queryVecs: _*)
      query.processAllAvailable()
      val streamed = spark.read.parquet(s"$outDir/b0")
        .select(col("qid"), col("vid"), col("adist_fp"))
        .as[(Long, Long, Long)].collect().toSet
      val centStored = spark.read.parquet(s"$idx/centroids")
      val batchTwin = q.servePqQueryBatch(spark,
        Tables.embeddings(spark, dir).filter(col("vec_id") < 10)
          .select(col("vec_id"), col("embedding")),
        centStored.agg(collect_list(struct(col("cid"), col("cemb"),
          col("cnrm"))).as("cents")),
        centStored.select(col("cid").as("pcid"), col("cemb")),
        spark.read.parquet(s"$idx/codebooks"), idx,
        docFilter = q.facetPostingsFilter(spark, idx, Some(q.FacetLabel)))
        .select(col("qid"), col("vid"), col("adist_fp"))
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed.nonEmpty && streamed == batchTwin,
        "streamed IVFPQ faceted serving must equal the batch facet path")
      val facetIds = truth(col("label").cast("long") === q.FacetLabel).map(_._1)
      assert(streamed.forall(r => facetIds.contains(r._2)))
    } finally query.stop()
  }

  test("streamed vector ingest maintains the facet sidecar under the exactly-once commit") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val q = SimilarityQueries
    val idx = tmp("facet_ingest_idx")
    q.buildIvfIndexBase(spark, dir, idx)
    val before = attrsOf(idx)
    val delta = Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 4 === 0)
      .select(col("vec_id"), col("embedding"), col("label").cast("long"))
      .as[(Long, Seq[Float], Long)].collect().toSeq
    val ms = MemoryStream[(Long, Seq[Float], Long)]
    val query = graft.streaming.VecIngest.start(
      spark, ms.toDF().toDF("vec_id", "embedding", "label"),
      idx, tmp("facet_ingest_ckpt"))
    try {
      ms.addData(delta: _*)
      query.processAllAvailable()
    } finally query.stop()
    assert(attrsOf(idx) == before ++ delta.map(t => (t._1, t._3)),
      "streamed ingest must land facet rows under the same commit as postings")
    // and a replay of the same batch does not duplicate facet rows
    val n = spark.read.parquet(s"$idx/attrs").count()
    graft.streaming.VecIngest.ingestBatch(spark,
      delta.toDF("vec_id", "embedding", "label"),
      q.loadCentRow(spark, idx), idx, batchId = 0L)
    assert(spark.read.parquet(s"$idx/attrs").count() == n,
      "a committed batch's replay must be a no-op for the sidecar too")
  }

  // ------------------------------------------------------------- LSH family
  // The FOURTH index family's facets: the near-dup signature index is
  // doc-keyed like the lexical one, so it shares the (lang, source)
  // sidecar layout outright (LexQueries.attrsRows / purgeAttrsSidecar).

  /** Ground-truth (doc_id, lang, source) for a document predicate. */
  private def docTruth(pred: org.apache.spark.sql.Column): Set[(Long, String, String)] =
    Tables.documents(spark, dir).filter(pred)
      .select(col("doc_id"), col("lang"), col("source"))
      .as[(Long, String, String)].collect().toSet

  private def docAttrsOf(idx: String): Set[(Long, String, String)] =
    spark.read.parquet(s"$idx/attrs")
      .select(col("doc_id"), col("lang"), col("source"))
      .as[(Long, String, String)].collect().toSet

  test("every LSH writer maintains the attrs sidecar: build, append, merge, compact purge") {
    val q = SimilarityQueries
    val idx = tmp("facet_lsh")
    q.buildLshIndex(spark, dir, idx)
    assert(docAttrsOf(idx) == docTruth(col("doc_id") % 4 =!= 0),
      "build must write one facet row per indexed document")
    q.lshIndexAppend(spark, dir, idx)
    assert(docAttrsOf(idx) == docTruth(lit(true)),
      "append must extend the facets to the delta")
    // merge absorbs the shard's facets, src tombstones purged on the way
    val docs = graft.sources.Tables.documents(spark, dir)
    val dst = tmp("facet_lsh_dst")
    val src = tmp("facet_lsh_src")
    q.buildLshIndexSlice(docs.filter(col("doc_id") % 2 === 1), dst)
    q.buildLshIndexSlice(docs.filter(col("doc_id") % 2 === 0), src)
    val victim = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id")).as[Long].head()
    q.lshIndexDelete(spark, src, Seq(victim).toDF("doc_id"))
    q.lshIndexMergeInto(spark, dst, src)
    assert(docAttrsOf(dst) ==
      docTruth(col("doc_id") % 2 === 1) ++
        docTruth(col("doc_id") % 2 === 0 && col("doc_id") =!= victim),
      "merge must absorb src facets minus src tombstones")
    // delete + compact purges the tombstoned ids from the sidecar
    val gone = docs.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id")).as[Long].head()
    q.lshIndexDelete(spark, idx, Seq(gone).toDF("doc_id"))
    q.lshIndexCompact(spark, idx)
    assert(docAttrsOf(idx) == docTruth(col("doc_id") =!= gone),
      "compact must purge tombstoned ids from the facet sidecar")
  }

  test("incremental_neardup_filtered == the unfaceted pair set with both endpoints in the facet") {
    val q = SimilarityQueries
    val got = q.incrementalNearDupFiltered(spark, dir)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    val en = docTruth(col("lang") === "en").map(_._1)
    val all = q.incrementalNearDup(spark, dir)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    assert(got == all.filter(p => en(p._1) && en(p._2)),
      "signatures are facet-independent, so the screened pair set must " +
        "equal the unfaceted set restricted to facet-member endpoints")
    assert(got.nonEmpty, "the fixture must plant en-en near-dup pairs")
    assert(got != all, "the facet must actually exclude cross-facet pairs")
  }

  test("facet-scoped takedown: tombstones resolve from the sidecar, serving and compact honor them, sidecar-less index refuses") {
    import graft.queries.LexQueries
    val q = SimilarityQueries
    // --- lex family, synthetic corpus with known sources
    val docs = Seq(
      (1L, "join vector stream", "en", "webA"),
      (2L, "join vector", "de", "webB"),
      (3L, "join stream spark", "en", "webB"),
      (4L, "vector window spark", "de", "webA"),
      (5L, "join", "en", "webB")).toDF("doc_id", "text", "lang", "source")
    val idx = tmp("facet_srcdel_lex")
    LexQueries.buildLexIndexFrom(spark, docs, idx)
    LexQueries.deleteLexSource(spark, idx, "webB")
    val tombs = spark.read.parquet(s"$idx/tombstones")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(tombs == Set(2L, 3L, 5L),
      "the tombstone set must be exactly the sidecar's source membership")
    // tombstone-aware serving excludes the retired source's docs
    val served = graft.streaming.LexServe.serveBatch(spark,
        Seq((1L, "join vector")).toDF("qid", "text"), idx,
        LexQueries.loadStats(spark, idx), k = 10, tombstoneAware = true)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(served == Set(1L, 4L),
      "only the surviving sources' docs may serve after a source retire")
    // compact purges the retired source's postings AND its facet rows
    LexQueries.compactLexIndex(spark, idx)
    assert(spark.read.parquet(s"$idx/attrs")
      .filter(col("source") === "webB").count() == 0,
      "compact must purge the retired source from the sidecar")
    assert(spark.read.parquet(s"$idx/postings")
      .filter(col("doc_id").isin(2L, 3L, 5L)).count() == 0)
    // a pre-sidecar index refuses with the actionable message
    val bare = tmp("facet_srcdel_bare")
    LexQueries.buildLexIndexFrom(spark, docs.drop("lang", "source"), bare)
    val fs = new org.apache.hadoop.fs.Path(bare)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$bare/attrs"), true)
    intercept[IllegalArgumentException] {
      LexQueries.deleteLexSource(spark, bare, "webB")
    }
    // --- LSH twin over the fixture: same contract, sidecar-resolved
    val lshIdx = tmp("facet_srcdel_lsh")
    q.buildLshIndex(spark, dir, lshIdx)
    q.lshIndexAppend(spark, dir, lshIdx)
    q.lshIndexDeleteSource(spark, lshIdx, LexQueries.RetiredSource)
    val lshTombs = spark.read.parquet(s"$lshIdx/tombstones")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(lshTombs ==
      docTruth(col("source") === LexQueries.RetiredSource).map(_._1),
      "LSH source retire must tombstone exactly the fixture's source slice")
    intercept[IllegalArgumentException] {
      fs.delete(new org.apache.hadoop.fs.Path(s"$lshIdx/attrs"), true)
      q.lshIndexDeleteSource(spark, lshIdx, LexQueries.RetiredSource)
    }
  }

  test("vector facet-scoped takedown: label members tombstone via the sidecar, both families; sidecar-less refuses") {
    val q = SimilarityQueries
    val labelIds = truth(col("label").cast("long") === q.RetiredLabel).map(_._1)
    assert(labelIds.nonEmpty)
    val idx = tmp("facet_ldel_ivf")
    q.buildIvfIndex(spark, dir, idx)
    q.ivfIndexDeleteLabel(spark, idx, q.RetiredLabel)
    assert(spark.read.parquet(s"$idx/tombstones")
      .select(col("vec_id")).as[Long].collect().toSet == labelIds,
      "the IVF tombstone set must be exactly the sidecar's label membership")
    val pq = tmp("facet_ldel_pq")
    q.buildIvfPqIndex(spark, dir, pq)
    q.ivfPqIndexDeleteLabel(spark, pq, q.RetiredLabel)
    assert(spark.read.parquet(s"$pq/tombstones")
      .select(col("vec_id")).as[Long].collect().toSet == labelIds,
      "the IVFPQ tombstone set must be exactly the sidecar's label membership")
    // retired-label vectors never surface as candidates after the retire
    val got = q.annIvfLabelRetired(spark, dir)
      .select(col("vid")).as[Long].collect().toSet
    assert(got.nonEmpty && got.intersect(labelIds).isEmpty)
    val gotPq = q.ivfPqAnnLabelRetired(spark, dir)
      .select(col("vid")).as[Long].collect().toSet
    assert(gotPq.nonEmpty && gotPq.intersect(labelIds).isEmpty)
    // a pre-sidecar index refuses with the actionable message
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$idx/attrs"), true)
    intercept[IllegalArgumentException] {
      q.ivfIndexDeleteLabel(spark, idx, q.RetiredLabel)
    }
  }

  test("incremental_neardup_source_retired: a retired source never surfaces on either pair side") {
    val q = SimilarityQueries
    val got = q.incrementalNearDupSourceRetired(spark, dir)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    val retired = docTruth(col("source") === graft.queries.LexQueries.RetiredSource)
      .map(_._1)
    val all = q.incrementalNearDup(spark, dir)
      .select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    assert(got == all.filter(p => !retired(p._1) && !retired(p._2)),
      "the retired-source pair set must equal the unfaceted set minus " +
        "pairs touching the retired source")
    assert(got.nonEmpty && got != all,
      "the fixture must plant pairs touching the retired source")
  }

  test("streamed faceted LSH serving == batch facet path; non-facet standing docs never surface; sidecar-less index refuses") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val q = SimilarityQueries
    val idx = tmp("facet_lsh_stream_idx")
    q.buildLshIndex(spark, dir, idx)
    q.lshIndexAppend(spark, dir, idx)
    val queryDocs = Tables.documents(spark, dir)
      .filter(col("doc_id") % 7 === 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val ms = MemoryStream[(Long, String)]
    val outDir = tmp("facet_lsh_stream_out")
    val query = graft.streaming.LshServe.start(
      spark, ms.toDF().toDF("doc_id", "text"), idx,
      (df, id) => df.write.mode("overwrite").parquet(s"$outDir/b$id"),
      tmp("facet_lsh_stream_ckpt"), facetLang = Some("en"))
    try {
      ms.addData(queryDocs: _*)
      query.processAllAvailable()
      val streamed = spark.read.parquet(s"$outDir/b0")
        .select(col("query_id"), col("standing_id"))
        .as[(Long, Long)].collect().toSet
      val batchTwin = graft.streaming.LshServe.candidatesFor(spark,
          queryDocs.toDF("doc_id", "text"), idx, tombstoneAware = false,
          facetLang = Some("en"))
        .select(col("query_id"), col("standing_id"))
        .as[(Long, Long)].collect().toSet
      assert(streamed == batchTwin,
        "streamed faceted LSH serving must equal the batch facet path")
      // the facet screens the STANDING side only; parity with a manual
      // restriction of the unfaceted candidates
      val unfaceted = graft.streaming.LshServe.candidatesFor(spark,
          queryDocs.toDF("doc_id", "text"), idx, tombstoneAware = false)
        .select(col("query_id"), col("standing_id"))
        .as[(Long, Long)].collect().toSet
      val en = docTruth(col("lang") === "en").map(_._1)
      assert(streamed == unfaceted.filter(p => en(p._2)),
        "the faceted candidate set must be the unfaceted set restricted " +
          "to facet-member standing docs")
      assert(streamed.nonEmpty && streamed != unfaceted)
    } finally query.stop()
    // a pre-sidecar index refuses faceted serving ONCE, at stream start
    val bare = tmp("facet_lsh_bare")
    q.buildLshIndex(spark, dir, bare)
    val fs = new org.apache.hadoop.fs.Path(bare)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$bare/attrs"), true)
    val ms2 = MemoryStream[(Long, String)]
    intercept[IllegalArgumentException] {
      graft.streaming.LshServe.start(
        spark, ms2.toDF().toDF("doc_id", "text"), bare,
        (_, _) => (), tmp("facet_lsh_bare_ckpt"), facetLang = Some("en"))
    }
  }

  // ---------------------------------------------- SOURCE axis (vec-v3)
  //
  // The vector sidecar's second partition level: source joins in from
  // the documents table at build time (doc_id ≡ vec_id), giving the
  // vector families the licensing/takedown facet where it arguably
  // matters most — "retire every embedding derived from source X".

  /** Ground-truth (vec_id, source) via the doc_id ≡ vec_id join —
    * what every source-carrying writer's sidecar must reproduce. */
  private def srcTruth(pred: org.apache.spark.sql.Column): Set[(Long, String)] =
    Tables.embeddings(spark, dir).filter(pred)
      .join(Tables.documents(spark, dir)
          .select(col("doc_id"), col("source").as("_dsrc")),
        col("vec_id") === col("doc_id"), "left")
      .select(col("vec_id"), coalesce(col("_dsrc"), lit("unk")))
      .as[(Long, String)].collect().toSet

  private def attrsSrcOf(idx: String): Set[(Long, String)] =
    spark.read.parquet(s"$idx/attrs")
      .select(col("vec_id"), col("source").cast("string"))
      .as[(Long, String)].collect().toSet

  test("SOURCE axis: every vector writer lands it (build, append, absorb, compact purge)") {
    val q = SimilarityQueries
    val idx = tmp("facet_src_ivf")
    q.buildIvfIndexBase(spark, dir, idx)
    assert(attrsSrcOf(idx) == srcTruth(col("vec_id") % 4 =!= 0),
      "build must land each vector's document source in the sidecar")
    q.appendIvfIndex(spark, dir, idx)
    assert(attrsSrcOf(idx) == srcTruth(lit(true)),
      "append must extend the source axis to the delta")
    // an absorb frame carrying its OWN source column lands it; one
    // without lands honestly in unk
    q.ivfAbsorb(spark, idx,
      Seq((200000L, Seq.fill(8)(0.25f), 3L, "srcX"))
        .toDF("vec_id", "embedding", "label", "source"))
    q.ivfAbsorb(spark, idx,
      Seq((200001L, Seq.fill(8)(0.5f), 3L)).toDF("vec_id", "embedding", "label"))
    assert(attrsSrcOf(idx).contains((200000L, "srcX")))
    assert(attrsSrcOf(idx).contains((200001L, "unk")))
    // compact purges tombstoned ids out of the (label, source) leaves
    q.ivfIndexDelete(spark, idx, Seq(200000L).toDF("vec_id"))
    q.ivfIndexCompact(spark, idx)
    assert(attrsSrcOf(idx) == srcTruth(lit(true)) + ((200001L, "unk")),
      "compact must purge tombstoned ids from the two-axis sidecar")
    // the composite family writes the same two-axis sidecar
    val pq = tmp("facet_src_pq")
    q.buildIvfPqIndexBase(spark, dir, pq)
    assert(attrsSrcOf(pq) == srcTruth(col("vec_id") % 4 =!= 0))
    q.appendIvfPqIndex(spark, dir, pq)
    assert(attrsSrcOf(pq) == srcTruth(lit(true)))
  }

  test("vector SOURCE takedown: members resolve from the sidecar leaves, both families serve their complement") {
    val q = SimilarityQueries
    val retIds = srcTruth(lit(true))
      .filter(_._2 == q.RetiredVecSource).map(_._1)
    assert(retIds.nonEmpty, "the fixture must populate the retired source")
    val idx = tmp("facet_sdel_ivf")
    q.buildIvfIndex(spark, dir, idx)
    q.ivfIndexDeleteSource(spark, idx, q.RetiredVecSource)
    assert(spark.read.parquet(s"$idx/tombstones")
      .select(col("vec_id")).as[Long].collect().toSet == retIds,
      "the IVF tombstone set must be exactly the sidecar's source membership")
    val pq = tmp("facet_sdel_pq")
    q.buildIvfPqIndex(spark, dir, pq)
    q.ivfPqIndexDeleteSource(spark, pq, q.RetiredVecSource)
    assert(spark.read.parquet(s"$pq/tombstones")
      .select(col("vec_id")).as[Long].collect().toSet == retIds,
      "the IVFPQ tombstone set must be exactly the sidecar's source membership")
    // both contract sides: retired vectors neither query nor surface,
    // and the retire actually removed something from the query set
    val got = q.annIvfSourceRetired(spark, dir)
    val gotQ = got.select(col("qid")).as[Long].collect().toSet
    val gotV = got.select(col("vid")).as[Long].collect().toSet
    assert(gotV.nonEmpty && gotV.intersect(retIds).isEmpty)
    assert(gotQ.intersect(retIds).isEmpty && retIds.exists(_ < 10),
      "the retired source must contain a query vector (non-vacuous)")
    val gotPq = q.ivfPqAnnSourceRetired(spark, dir)
      .select(col("vid")).as[Long].collect().toSet
    assert(gotPq.nonEmpty && gotPq.intersect(retIds).isEmpty)
  }

  test("SOURCE-faceted serving is filter-first with bit-identical scores; streamed == batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val q = SimilarityQueries
    val facetIds = srcTruth(lit(true))
      .filter(_._2 == q.FacetVecSource).map(_._1)
    assert(facetIds.nonEmpty)
    val got = q.filteredAnnSource(spark, dir)
      .select(col("qid"), col("vid"), col("cos"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got.nonEmpty && got.forall(r => facetIds.contains(r._2)),
      "a non-facet candidate surfaced through the source-filtered serve")
    val unfiltered = q.annIvfServed(spark, dir)
      .select(col("qid"), col("vid"), col("cos"))
      .as[(Long, Long, Double)].collect().toSet
    val postFiltered = unfiltered.filter(r => facetIds.contains(r._2))
    assert(postFiltered.subsetOf(got),
      "filter-first must keep every facet survivor of the unfiltered " +
        "top-k, with bit-identical scores")
    // streamed: AnnServe --facetSource equals the batch entry point
    val idx = tmp("facet_src_stream_idx")
    q.buildIvfIndex(spark, dir, idx)
    val queryVecs = Tables.embeddings(spark, dir)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect().toSeq
    val ms = MemoryStream[(Long, Seq[Float])]
    val outDir = tmp("facet_src_stream_out")
    val query = graft.streaming.AnnServe.start(
      spark, ms.toDF().toDF("vec_id", "embedding"), idx,
      (df, id) => df.write.mode("overwrite").parquet(s"$outDir/b$id"),
      tmp("facet_src_stream_ckpt"),
      facetSource = Some(q.FacetVecSource))
    try {
      ms.addData(queryVecs: _*)
      query.processAllAvailable()
      val streamed = spark.read.parquet(s"$outDir/b0")
        .select(col("qid"), col("vid"), col("cos"))
        .as[(Long, Long, Double)].collect().toSet
      val batchTwin = q.serveQueryBatch(spark,
        Tables.embeddings(spark, dir).filter(col("vec_id") < 10)
          .select(col("vec_id"), col("embedding")),
        q.loadCentRow(spark, idx), idx,
        docFilter = q.facetPostingsFilter(spark, idx, None,
          Some(q.FacetVecSource)))
        .select(col("qid"), col("vid"), col("cos"))
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed.nonEmpty && streamed == batchTwin,
        "streamed source-faceted serving must equal the batch facet path")
      assert(streamed.forall(r => facetIds.contains(r._2)))
    } finally query.stop()
  }

  test("streamed vector ingest lands the source axis under the exactly-once commit") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val q = SimilarityQueries
    val idx = tmp("facet_src_ingest_idx")
    q.buildIvfIndexBase(spark, dir, idx)
    // a streamed batch carrying (label, source) attribute columns
    val rows = Seq(
      (300000L, Seq.fill(8)(0.3f), 2L, "srcA"),
      (300001L, Seq.fill(8)(0.6f), 2L, "srcB"))
    val ms = MemoryStream[(Long, Seq[Float], Long, String)]
    val query = graft.streaming.VecIngest.start(
      spark, ms.toDF().toDF("vec_id", "embedding", "label", "source"),
      idx, tmp("facet_src_ingest_ckpt"))
    try {
      ms.addData(rows: _*)
      query.processAllAvailable()
    } finally query.stop()
    assert(attrsSrcOf(idx).contains((300000L, "srcA")))
    assert(attrsSrcOf(idx).contains((300001L, "srcB")))
  }
}
