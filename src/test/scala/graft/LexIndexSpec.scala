package graft

import graft.queries.{CurationQueries, LexQueries}
import graft.sources.Tables

import org.apache.spark.sql.functions._

/** The lexical (BM25 inverted) index lifecycle — served-equals-computed,
  * append byte-identity, tombstone serve-around, compact purge, and
  * MaxScore losslessness with REAL pruning. */
class LexIndexSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name").toFile
    d.deleteOnExit(); d.getPath
  }

  /** (relative path → (length, first/last bytes)) of every posting file —
    * cheap byte-identity fingerprint. */
  private def postingFiles(idx: String): Map[String, (Long, Int)] = {
    val root = new java.io.File(s"$idx/postings")
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(root).filter(_.getName.endsWith(".parquet")).map { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      f.getPath.stripPrefix(root.getPath) -> (f.length(), java.util.Arrays.hashCode(bytes))
    }.toMap
  }

  test("driver-side slot computation agrees with the distributed writer slot") {
    import spark.implicits._
    val words = LexQueries.QueryTerms ++ Seq("a", "zz9", "hash", "the", "x1y2z3")
    val dist = words.toDF("tok")
      .select(col("tok"), pmod(hash(col("tok")), lit(LexQueries.NSlots)).as("slot"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    words.foreach { w =>
      assert(LexQueries.slotOfLiteral(w) == dist(w),
        s"slot mismatch for '$w': driver=${LexQueries.slotOfLiteral(w)} dist=${dist(w)}")
    }
  }

  test("bm25_served from the persisted index is bit-identical to compute-from-scratch") {
    val served = LexQueries.bm25Served(spark, dir).collect()
      .map(_.toSeq).sortBy(_.mkString("|"))
    val scratch = CurationQueries.bm25Top(spark, dir).collect()
      .map(_.toSeq).sortBy(_.mkString("|"))
    assert(served.length == scratch.length && served.sameElements(scratch),
      "served result must equal bm25_top row for row (scores bit-identical)")
  }

  test("serving plan never touches the documents table and statically slot-prunes every index scan") {
    val p = LexQueries.bm25Served(spark, dir)
      .queryExecution.executedPlan.treeString
    assert(!p.contains("documents.parquet"),
      s"serving must not re-tokenize the corpus:\n${p.take(3000)}")
    // the driver-computed term slots reach BOTH index scans as STATIC
    // partition filters (no DPP subquery needed): every postings and
    // lexicon scan line must carry a slot IN (...) partition filter
    val idxScans = p.linesIterator.filter(l =>
      l.contains("Scan parquet") &&
        (l.contains("/postings") || l.contains("/lexicon"))).toSeq
    assert(idxScans.nonEmpty, s"expected index scans in:\n${p.take(3000)}")
    idxScans.foreach { l =>
      assert(l.contains("PartitionFilters") && l.contains("slot") && l.contains(" IN "),
        s"index scan must be statically slot-pruned:\n$l")
    }
  }

  test("append writes only new files — existing posting bytes untouched, lexicon frozen") {
    val idx = tmp("lexapp")
    val docs = Tables.documents(spark, dir)
    LexQueries.buildLexIndexFrom(spark, docs.filter(col("doc_id") % 4 =!= 0), idx)
    val before = postingFiles(idx)
    val lexBefore = spark.read.parquet(s"$idx/lexicon")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    LexQueries.appendLexIndex(spark, docs.filter(col("doc_id") % 4 === 0), idx)
    val after = postingFiles(idx)
    assert(before.keySet.subsetOf(after.keySet), "append must never delete files")
    before.foreach { case (k, v) =>
      assert(after(k) == v, s"append rewrote an existing posting file: $k")
    }
    assert(after.size > before.size, "append must add delta posting files")
    val lexAfter = spark.read.parquet(s"$idx/lexicon")
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(lexAfter.sameElements(lexBefore), "append must not touch the frozen lexicon")
    // delta docs are servable: a term they contain surfaces their rows
    val servedDocs = LexQueries.serveTermScores(spark, idx,
        LexQueries.QueryTerms,
        LexQueries.loadStats(spark, idx))
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(servedDocs.exists(_ % 4 == 0), "appended docs must serve")
  }

  test("tombstone delete serves around a live top result without touching posting files") {
    val idx = tmp("lexdel")
    LexQueries.buildLexIndexFrom(spark, Tables.documents(spark, dir), idx)
    def serveIds(aware: Boolean) = LexQueries.serveTermScores(spark, idx,
        LexQueries.QueryTerms,
        LexQueries.loadStats(spark, idx), tombstoneAware = aware)
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    val victim = serveIds(aware = false).min
    val before = postingFiles(idx)
    LexQueries.deleteLexDocs(spark, idx, Seq(victim))
    assert(postingFiles(idx) == before, "delete must be O(batch): no posting rewrite")
    val after = serveIds(aware = true)
    assert(!after.contains(victim), "tombstoned doc must not serve")
    assert(serveIds(aware = false).contains(victim),
      "the rows are physically present until compact")
  }

  test("compact purges tombstoned rows physically, rewrites only touched slots") {
    val idx = tmp("lexcomp")
    LexQueries.buildLexIndexFrom(spark, Tables.documents(spark, dir), idx)
    val post = spark.read.parquet(s"$idx/postings")
    val victim = post.agg(min(col("doc_id"))).collect()(0).getLong(0)
    val victimSlots = post.filter(col("doc_id") === victim)
      .select(col("slot")).distinct().collect().map(_.getInt(0)).toSet
    val before = postingFiles(idx)
    LexQueries.deleteLexDocs(spark, idx, Seq(victim))
    val servedAround = LexQueries.serveTermScores(spark, idx,
        LexQueries.QueryTerms,
        LexQueries.loadStats(spark, idx), tombstoneAware = true)
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    LexQueries.compactLexIndex(spark, idx)
    assert(!new java.io.File(s"$idx/tombstones").exists(), "compact drops the tombstones")
    val remaining = spark.read.parquet(s"$idx/postings")
    assert(remaining.filter(col("doc_id") === victim).count() == 0,
      "compact must purge the tombstoned rows")
    // untouched slots keep their exact bytes
    val after = postingFiles(idx)
    before.filter { case (k, _) =>
      !victimSlots.exists(s => k.contains(s"slot=$s/")) }
      .foreach { case (k, v) =>
        assert(after.get(k).contains(v), s"compact rewrote an untouched slot file: $k")
      }
    // post-compact serving (no tombstones) equals pre-compact serve-around
    val servedAfter = LexQueries.serveTermScores(spark, idx,
        LexQueries.QueryTerms,
        LexQueries.loadStats(spark, idx))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(servedAfter.sameElements(servedAround),
      "compacted serving must equal tombstone-aware serving")
  }

  test("hybrid_served plan: both arms serve from indexes, never a corpus scan") {
    val p = LexQueries.hybridServed(spark, dir)
      .queryExecution.executedPlan.treeString
    assert(!p.contains("documents.parquet"),
      s"the lexical arm must serve from the inverted index:\n${p.take(3000)}")
    // the only embeddings read is the pushed-down single-query-row scan
    // (vec_id = 0); the semantic candidates come from the IVF postings
    val embScans = p.linesIterator.filter(l =>
      l.contains("Scan parquet") && l.contains("embeddings.parquet")).toSeq
    assert(embScans.nonEmpty && embScans.forall(l =>
        l.contains("vec_id") && l.contains("= 0)")),
      s"every embeddings scan must be the pushed query-row scan:\n${embScans.mkString("\n")}")
    // the centroid array comes from the STORED k-row frame, never a
    // corpus-driven sample (no corpus scan exists — checked above); the
    // candidates stream from the persisted postings
    assert(p.contains("/centroids") && p.contains("/postings"),
      s"the semantic arm must read the persisted index:\n${p.take(3000)}")
  }

  test("shard merge: partition-wise union — merge ≡ append, dst bytes untouched, src tombstones purged") {
    val docs = Tables.documents(spark, dir)
    val base = docs.filter(col("doc_id") % 4 =!= 0)
    val delta = docs.filter(col("doc_id") % 4 === 0)
    // appended twin: base index grown in place
    val appIdx = tmp("lexmrg_app")
    LexQueries.buildLexIndexFrom(spark, base, appIdx)
    LexQueries.appendLexIndex(spark, delta, appIdx)
    // merged twin: base index absorbs a shard-built delta index
    val dstIdx = tmp("lexmrg_dst")
    val srcIdx = tmp("lexmrg_src")
    LexQueries.buildLexIndexFrom(spark, base, dstIdx)
    LexQueries.buildLexIndexFrom(spark, delta, srcIdx)
    val dstBefore = postingFiles(dstIdx)
    LexQueries.lexIndexMergeInto(spark, dstIdx, srcIdx)
    // existing dst files byte-identical (append-only merge)
    dstBefore.foreach { case (k, v) =>
      assert(postingFiles(dstIdx)(k) == v, s"merge rewrote a dst file: $k")
    }
    // merge ≡ append: identical posting ROW SETS
    def rows(idx: String) = spark.read.parquet(s"$idx/postings")
      .collect().map(_.toSeq.mkString("|")).sorted
    assert(rows(dstIdx).sameElements(rows(appIdx)),
      "merged posting rows must equal appended posting rows")
    // ... and identical serving
    def served(idx: String) = LexQueries.serveTermScores(spark, idx,
        LexQueries.QueryTerms, LexQueries.loadStats(spark, idx))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(served(dstIdx).sameElements(served(appIdx)))

    // src tombstones purge on the way in
    val dst2 = tmp("lexmrg_dst2")
    val src2 = tmp("lexmrg_src2")
    LexQueries.buildLexIndexFrom(spark, base, dst2)
    LexQueries.buildLexIndexFrom(spark, delta, src2)
    val victim = delta.agg(min(col("doc_id"))).collect()(0).getLong(0)
    LexQueries.deleteLexDocs(spark, src2, Seq(victim))
    LexQueries.lexIndexMergeInto(spark, dst2, src2)
    assert(spark.read.parquet(s"$dst2/postings")
        .filter(col("doc_id") === victim).count() == 0,
      "src-tombstoned doc must not enter the merged index")
  }

  test("phrase search: k-term position fold counts exact occurrences, never scans text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma x alpha beta gamma"), // 2 occurrences
      (2L, "alpha beta x gamma alpha"),            // terms non-adjacent
      (3L, "gamma beta alpha"),                    // wrong order
      (4L, "x alpha beta gamma y")).toDF("doc_id", "text") // 1 occurrence
    val idx = tmp("lexphrase")
    LexQueries.buildLexIndexFrom(spark, docs, idx)
    val got = LexQueries.phraseFromIndex(spark, idx, Seq("alpha", "beta", "gamma"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 2L, 4L -> 1L), s"3-term phrase counts wrong: $got")
    // single-term degenerate case: n_occ == tf
    val single = LexQueries.phraseFromIndex(spark, idx, Seq("alpha"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(single == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
    // fixture plan: positional verification reads ONLY the index, slot-pruned
    val p = LexQueries.phraseSearch(spark, dir)
      .queryExecution.executedPlan.treeString
    assert(!p.contains("documents.parquet"),
      "phrase search must verify against stored positions, not re-tokenize")
    val scans = p.linesIterator.filter(l =>
      l.contains("Scan parquet") && l.contains("/postings")).toSeq
    assert(scans.nonEmpty && scans.forall(l =>
      l.contains("slot") && l.contains(" IN ")))
  }

  test("refresh: grow-then-refresh equals build-from-scratch; postings untouched") {
    val docs = Tables.documents(spark, dir)
    val grown = tmp("lexrf_grown")
    LexQueries.buildLexIndexFrom(spark, docs.filter(col("doc_id") % 4 =!= 0), grown)
    LexQueries.appendLexIndex(spark, docs.filter(col("doc_id") % 4 === 0), grown)
    val postBefore = postingFiles(grown)
    LexQueries.refreshLexicon(spark, grown)
    assert(postingFiles(grown) == postBefore,
      "refresh must recompute serving state only — no posting byte moves")
    val scratch = tmp("lexrf_scratch")
    LexQueries.buildLexIndexFrom(spark, docs, scratch)
    def served(idx: String) = LexQueries.serveTermScores(spark, idx,
        LexQueries.QueryTerms, LexQueries.loadStats(spark, idx))
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(served(grown) == served(scratch),
      "refreshed serving must equal a from-scratch build bit for bit")
    def lexRows(idx: String) = spark.read.parquet(s"$idx/lexicon")
      .collect().map(_.toSeq).toSeq.sortBy(_.mkString("|"))
    assert(lexRows(grown) == lexRows(scratch),
      "refreshed lexicon (df + MaxScore bounds) must equal from-scratch")
  }

  test("refresh holds the maintenance fence: growers refuse inside its span, marker released after") {
    // the grower-vs-refresh race the fence closes: a grower that
    // marks-and-writes between refresh's postings read and its
    // clearBoundsStale would get its staleness marker wiped while the
    // refreshed bounds do not cover its postings — so refresh holds
    // _maintenance for its read-to-clear span and growers (which all
    // assertNoMaintenance) fail loudly instead of silently losing the
    // marker. The span itself is sub-second; pin its two edges.
    val docs = Tables.documents(spark, dir)
    val idx = tmp("lexrf_fence")
    LexQueries.buildLexIndexFrom(spark, docs.filter(col("doc_id") % 4 =!= 0), idx)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = graft.queries.SimilarityQueries.maintenanceMarker(idx)
    // edge 1: while the refresh span's marker stands (held here by the
    // test, standing in for a mid-span refresh), every grower refuses
    fs.create(marker, true).close()
    try {
      intercept[IllegalStateException] {
        LexQueries.appendLexIndex(spark,
          docs.filter(col("doc_id") % 4 === 0), idx)
      }
      // ... and a second refresh refuses too (no nested maintenance)
      intercept[IllegalStateException] { LexQueries.refreshLexicon(spark, idx) }
    } finally { fs.delete(marker, false); () }
    // edge 2: a completed refresh releases the marker and growers work
    LexQueries.refreshLexicon(spark, idx)
    assert(!fs.exists(marker), "refresh must release _maintenance on success")
    LexQueries.appendLexIndex(spark, docs.filter(col("doc_id") % 4 === 0), idx)
    assert(LexQueries.boundsStale(spark, idx))
  }

  test("property: multi-query result sharing equals independent per-query answers") {
    import spark.implicits._
    // seeded random corpora + query batches with heavy signature reuse
    // (the sharing path) AND all-distinct stragglers (the fall-through):
    // every qid's rows must equal the answer computed for that query
    // ALONE — the dedup/fan-out machinery must be semantically invisible
    val rnd = new scala.util.Random(20260816L)
    val vocab = Vector("join", "vector", "stream", "window", "spark",
      "data", "table", "hash", "sort", "merge")
    (1 to 3).foreach { trial =>
      val docs = (1L to 40L).map(i =>
        (i, Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))).toDF("doc_id", "text")
      val idx = tmp(s"lexprop$trial")
      LexQueries.buildLexIndexFrom(spark, docs, idx)
      val stats = LexQueries.loadStats(spark, idx)
      val queries = (1L to 12L).map(q =>
        (q, Seq.fill(1 + rnd.nextInt(3))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      val batch = LexQueries.queryBatch(spark, queries.toDF("qid", "text"),
          idx, stats, k = 5)
        .collect().map(_.toSeq).groupBy(_.head.asInstanceOf[Long])
      queries.foreach { case (q, text) =>
        val solo = LexQueries.queryBatch(spark,
            Seq((q, text)).toDF("qid", "text"), idx, stats, k = 5)
          .collect().map(_.toSeq).sortBy(_.mkString("|"))
        val got = batch.getOrElse(q, Array.empty).sortBy(_.mkString("|"))
        assert(got.sameElements(solo),
          s"trial $trial qid $q ('$text'): batch=$got solo=$solo")
      }
    }
  }

  test("multi-query maxscore pruning is lossless, engages on fresh indexes, and disarms on stale bounds") {
    import spark.implicits._
    // corpora large enough that θ exists (≥ k champion postings) and
    // skewed so common terms dominate posting volume — the shape the
    // pruning pays off on; parity must hold bit for bit regardless
    val rnd = new scala.util.Random(42L)
    val common = Vector("join", "vector", "stream")
    val rare = Vector("window", "spark", "hash", "merge")
    val docs = (1L to 120L).map { i =>
      val body = Seq.fill(6 + rnd.nextInt(10))(common(rnd.nextInt(common.size))) ++
        (if (i % 9 == 0) Seq(rare(rnd.nextInt(rare.size))) else Nil) ++
        Seq(s"d$i")
      (i, body.mkString(" "))
    }.toDF("doc_id", "text")
    val idx = tmp("lexqbms")
    LexQueries.buildLexIndexFrom(spark, docs, idx)
    val stats = LexQueries.loadStats(spark, idx)
    val queries = Seq(
      (1L, "join window spark"), (2L, "join window spark"),
      (3L, "vector stream"), (4L, "join vector stream window spark"),
      (5L, "merge hash join"), (6L, "stream"), (7L, "zzz_absent")).toDF("qid", "text")
    def run(pr: Boolean) = LexQueries.queryBatch(spark, queries, idx, stats,
      k = 5, maxscorePrune = Some(pr))
    val pruned = run(true).collect().map(_.toSeq).sortBy(_.mkString("|"))
    val unpruned = run(false).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(pruned.sameElements(unpruned),
      "per-sig maxscore pruning must be bit-lossless")
    // the pruned plan carries the candidate semi-join; the unpruned one
    // must not — and a stale-bounds index must also serve unpruned
    assert(run(true).queryExecution.executedPlan.treeString.contains("LeftSemi"),
      "fresh index + prune=true must take the candidate semi-join path")
    assert(!run(false).queryExecution.executedPlan.treeString.contains("LeftSemi"))
    LexQueries.markBoundsStale(spark, idx)
    assert(!run(true).queryExecution.executedPlan.treeString.contains("LeftSemi"),
      "stale bounds must disarm the pruned serving path")
  }

  test("default serving is the unpruned single-pass plan (the measured winner at every scale and shape)") {
    // round 16 removed the auto-engage: LexAbXl measured the pruned
    // plan 2.3× slower even at Σ df = 10⁷ with tiny essential sets, and
    // only a wash at 5× signature fan-out — the default must be the
    // unpruned plan unconditionally (forced Some(true) stays available
    // and parity-pinned above)
    import spark.implicits._
    val idx = tmp("lexauto")
    LexQueries.buildLexIndexFrom(spark,
      graft.sources.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text")), idx)
    val auto = LexQueries.queryBatch(spark,
      Seq((1L, "join vector stream")).toDF("qid", "text"),
      idx, LexQueries.loadStats(spark, idx))
    assert(!auto.queryExecution.executedPlan.treeString.contains("LeftSemi"),
      "the default serving plan must be the unpruned single pass")
  }

  test("bm25_filtered: filter-first facet semantics; allowlist reads the attrs sidecar, never text") {
    val out = LexQueries.bm25Filtered(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 10)
    // every hit is an en doc, and k fills among qualifying docs: the
    // unfiltered top-10 restricted to en is a PREFIX of the filtered
    // ranking, never the whole answer when more en docs qualify
    val enDocs = graft.sources.Tables.documents(spark, dir)
      .filter(col("lang") === "en").select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    out.foreach(r => assert(enDocs(r.getAs[Long]("doc_id"))))
    val unfiltered = LexQueries.bm25Multiterm(spark, dir).collect()
      .map(_.getAs[Long]("doc_id")).filter(enDocs)
    assert(out.length >= unfiltered.length,
      "filter-first must fill k at least as well as post-filtering")
    // scores are bit-identical to the unfiltered serve (corpus-wide
    // frozen statistics — the facet scopes candidates, not the model)
    val unfScores = LexQueries.bm25Multiterm(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    out.foreach { r =>
      unfScores.get(r.getAs[Long]("doc_id")).foreach(s =>
        assert(s == r.getAs[Double]("score"), "facet must not change scores"))
    }
    // plan: the documents table is never scanned — the facet allowlist
    // comes from the partition-pruned attrs sidecar
    val p = LexQueries.bm25Filtered(spark, dir)
      .queryExecution.executedPlan.treeString
    assert(!p.contains("documents.parquet"),
      s"faceted serving must not scan the corpus:\n$p")
    assert(p.contains("/attrs"), "the allowlist must come from the attrs sidecar")
    assert(p.contains("lang=en") || p.contains("PartitionFilters: [isnotnull(lang"),
      "the facet read must be partition-pruned to its directory")
  }

  test("bm25_filtered_source: the second facet axis prunes at the attrs leaf level, same filter-first contract") {
    val out = LexQueries.bm25FilteredSource(spark, dir).collect()
    assert(out.nonEmpty && out.length <= 10)
    val srcDocs = graft.sources.Tables.documents(spark, dir)
      .filter(col("source") === "src3").select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    out.foreach(r => assert(srcDocs(r.getAs[Long]("doc_id")),
      "a non-facet doc surfaced through the source facet"))
    // scores bit-identical to the unfiltered serve on survivors —
    // corpus-wide frozen statistics, the facet scopes candidates only
    val unfScores = LexQueries.bm25Multiterm(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    out.foreach { r =>
      unfScores.get(r.getAs[Long]("doc_id")).foreach(s =>
        assert(s == r.getAs[Double]("score"), "facet must not change scores"))
    }
    // plan: no corpus scan; the allowlist is the attrs read pruned on
    // the SECOND partition level (source= leaf directories)
    val p = LexQueries.bm25FilteredSource(spark, dir)
      .queryExecution.executedPlan.treeString
    assert(!p.contains("documents.parquet"),
      s"source-faceted serving must not scan the corpus:\n$p")
    assert(p.contains("/attrs"), "the allowlist must come from the attrs sidecar")
    assert(p.contains("source=src3") || p.contains("PartitionFilters: [isnotnull(source"),
      s"the source facet must prune at the leaf partition level:\n$p")
  }

  test("facet sidecar follows the whole lifecycle: append/merge/ingest docs facet-visible, compact purges, attribute-less docs land in und") {
    import spark.implicits._
    def attrs(idx: String) = spark.read.parquet(s"$idx/attrs")
      .select(col("doc_id"), col("lang"), col("source"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val base = Seq((1L, "join vector", "en", "web"),
      (2L, "stream window", "de", "web")).toDF("doc_id", "text", "lang", "source")
    val idx = tmp("lexattr")
    LexQueries.buildLexIndexFrom(spark, base, idx)
    assert(attrs(idx) == Set((1L, "en", "web"), (2L, "de", "web")))
    // append carries attributes; an attribute-less frame lands in und
    LexQueries.appendLexIndex(spark,
      Seq((3L, "spark join", "en", "crawl")).toDF("doc_id", "text", "lang", "source"), idx)
    LexQueries.appendLexIndex(spark, Seq((4L, "vector")).toDF("doc_id", "text"), idx)
    assert(attrs(idx).contains((3L, "en", "crawl")))
    // attribute-less docs land in the honest sentinel partitions at BOTH
    // levels (source is a partition column since lex-v5, so a null would
    // otherwise hide in the hive default-partition directory)
    assert(attrs(idx).contains((4L, "und", "unk")))
    // merge absorbs the shard's attrs, src tombstones purged on the way
    val shard = tmp("lexattr_shard")
    LexQueries.buildLexIndexFrom(spark,
      Seq((10L, "join stream", "fr", "web"),
        (11L, "window", "fr", "web")).toDF("doc_id", "text", "lang", "source"), shard)
    LexQueries.deleteLexDocs(spark, shard, Seq(11L))
    LexQueries.lexIndexMergeInto(spark, idx, shard)
    assert(attrs(idx).contains((10L, "fr", "web")))
    assert(!attrs(idx).exists(_._1 == 11L), "src-tombstoned attrs must not merge")
    // streamed ingest stages attrs under the same exactly-once commit
    graft.streaming.LexIngest.ingestBatch(spark,
      Seq((20L, "spark stream", "es", "feed")).toDF("doc_id", "text", "lang", "source"),
      idx, 1L)
    assert(attrs(idx).contains((20L, "es", "feed")))
    // compact purges tombstoned attrs rows from their lang partitions
    LexQueries.deleteLexDocs(spark, idx, Seq(10L, 20L))
    LexQueries.compactLexIndex(spark, idx)
    val after = attrs(idx)
    assert(!after.exists(r => r._1 == 10L || r._1 == 20L),
      "compact must purge tombstoned facet rows")
    assert(after.contains((1L, "en", "web")) && after.contains((4L, "und", "unk")))
    // the fully-purged (es, feed) LEAF directory is gone, and so is its
    // lang directory (nothing else lived under es)
    val fs = new org.apache.hadoop.fs.Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$idx/attrs/lang=es")),
      "a fully-purged facet directory must be dropped, not left empty")
  }

  test("faceted multi-query serving: filter-first per facet, bit-parity with a manual allowlist restriction") {
    import spark.implicits._
    val docs = Seq(
      (1L, "join vector stream", "en", "web"),
      (2L, "join vector", "de", "web"),
      (3L, "join stream spark", "en", "crawl"),
      (4L, "vector window spark", "de", "web"),
      (5L, "join", "en", "web")).toDF("doc_id", "text", "lang", "source")
    val idx = tmp("lexfacetserve")
    LexQueries.buildLexIndexFrom(spark, docs, idx)
    val stats = LexQueries.loadStats(spark, idx)
    val queries = Seq((1L, "join vector"), (2L, "spark")).toDF("qid", "text")
    val faceted = graft.streaming.LexServe.serveBatch(spark, queries, idx,
        stats, k = 10, tombstoneAware = false, facetLang = Some("en"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    // manual twin: the unfaceted serve restricted BEFORE top-k by the
    // same allowlist (filter-first), via the generic docFilter seam
    val allow = spark.read.parquet(s"$idx/attrs")
      .filter(col("lang") === "en").select(col("doc_id").as("_d"))
    val manual = LexQueries.queryBatch(spark, queries, idx, stats, k = 10,
        docFilter = df => df.join(allow, df("doc_id") === col("_d"), "left_semi"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(faceted.nonEmpty && faceted.sameElements(manual))
    val enDocs = Set(1L, 3L, 5L)
    faceted.foreach(r => assert(enDocs(r(1).asInstanceOf[Long]),
      s"non-facet doc served: ${r(1)}"))
    // filter-first: qid 1 must see ALL its en matches (docs 1, 3, 5),
    // including ones a global unfaceted top-k could have displaced
    val q1 = faceted.filter(_.head == 1L).map(_(1).asInstanceOf[Long]).toSet
    assert(q1 == Set(1L, 3L, 5L))
    // the SOURCE axis serves through the same seam (level-2 pruning);
    // combining both axes intersects at the leaf
    val bySrc = graft.streaming.LexServe.serveBatch(spark, queries, idx,
        stats, k = 10, tombstoneAware = false, facetSource = Some("web"))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val webDocs = Set(1L, 2L, 4L, 5L)
    assert(bySrc.nonEmpty)
    bySrc.foreach(r => assert(webDocs(r(1).asInstanceOf[Long])))
    val both = graft.streaming.LexServe.serveBatch(spark, queries, idx,
        stats, k = 10, tombstoneAware = false,
        facetLang = Some("en"), facetSource = Some("web"))
      .collect().map(_.toSeq)
    val enWeb = Set(1L, 5L)
    assert(both.nonEmpty)
    both.foreach(r => assert(enWeb(r(1).asInstanceOf[Long]),
      "a combined-facet serve must intersect both axes"))
  }

  test("facet screens are interchangeable: pushdown == semi-join bit for bit, auto picks the measured winner") {
    import spark.implicits._
    val docs = Seq(
      (1L, "join vector stream", "en", "web"),
      (2L, "join vector", "de", "web"),
      (3L, "join stream spark", "en", "crawl"),
      (4L, "vector window spark", "de", "web"),
      (5L, "join", "en", "web")).toDF("doc_id", "text", "lang", "source")
    val idx = tmp("lexfacetscreen")
    LexQueries.buildLexIndexFrom(spark, docs, idx)
    val stats = LexQueries.loadStats(spark, idx)
    def served(maxIds: Long) = LexQueries.rankTop10(LexQueries.multitermTotals(
      LexQueries.facetScreen(spark, idx, col("lang") === "en",
        pushdownMaxIds = maxIds)(
        LexQueries.serveTermScores(spark, idx, LexQueries.QueryTerms, stats))))
      .collect().map(_.toSeq).toSeq
    val semi = served(0L)       // semi-join (the measured default)
    val push = served(1000L)    // collected-id pushdown (the losing plan)
    assert(semi.nonEmpty && semi == push,
      "the two facet screens must be semantically invisible to the answer")
    assert(semi == served(LexQueries.FacetPushdownMaxIds),
      "the auto gate must answer identically at its default")
  }

  test("contamination_served plan: the training corpus is never re-tokenized") {
    val p = LexQueries.contaminationServed(spark, dir)
      .queryExecution.executedPlan.treeString
    // the ONLY documents read is the pushed-down held-out probe slice
    // (doc_id < 50); training docs are answered from the positional
    // postings alone
    val docScans = p.linesIterator.filter(l =>
      l.contains("Scan parquet") && l.contains("documents.parquet")).toSeq
    // round 17: the probe frame localCheckpoints, so the (pushed,
    // probe-slice) documents scan usually runs at checkpoint time and
    // vanishes from THIS plan entirely — zero documents scans satisfies
    // the invariant a fortiori; any scan still present must be the
    // pushed probe slice
    assert(docScans.forall(_.contains("< 50)")),
      s"every documents scan must be the pushed probe-slice scan:\n${docScans.mkString("\n")}")
    // the probe-term postings materialize ONCE at localCheckpoint time;
    // the final plan consumes the checkpointed frame (ExistingRDD), so
    // the posting path itself is not in this plan string
    assert(p.contains("/postings") || p.contains("Scan ExistingRDD"),
      "training-side candidates must come from the (checkpointed) postings")
  }

  test("maxscore: lossless vs unpruned AND actually prunes on the fixture") {
    val unpruned = LexQueries.bm25Multiterm(spark, dir).collect()
      .map(_.toSeq).sortBy(_.mkString("|"))
    val run = LexQueries.bm25Maxscore(spark, dir).collect()
      .map(_.toSeq).sortBy(_.mkString("|"))
    assert(run.sameElements(unpruned), "pruned answer must equal the unpruned top-10")
  }

  test("maxscore θ < 10 candidates edge: all terms essential, answer still exact") {
    import spark.implicits._
    // 4 docs only — the champion term can never yield 10 candidates, so
    // θ = -inf and nothing may be pruned
    val docs = Seq(
      (1L, "join vector stream join"),
      (2L, "window spark spark"),
      (3L, "vector vector window"),
      (4L, "join spark stream window vector")).toDF("doc_id", "text")
    val idx = tmp("lexedge")
    LexQueries.buildLexIndexFrom(spark, docs, idx)
    val run = LexQueries.maxscoreFromIndex(spark, idx)
    assert(run.theta == Double.NegativeInfinity, "θ must be -inf under 10 candidates")
    assert(run.nonEssential.isEmpty, "no term may be non-essential at θ = -inf")
    val scored = LexQueries.serveTermScores(spark, idx,
      LexQueries.QueryTerms,
      LexQueries.loadStats(spark, idx))
    val unpruned = LexQueries.rankTop10(LexQueries.multitermTotals(scored))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val got = run.result.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.sameElements(unpruned))
  }

  test("maxscore bound-staleness is enforced: a grown index serves exact via the unpruned fallback; refresh restores pruning") {
    import spark.implicits._
    // base corpus: rich in every query term so pruning has a real θ;
    // the delta doc is an EXTREME posting ("vector" tf ≫ any base tf in
    // a short doc) engineered to exceed the frozen 'vector' bound — the
    // exact shape that made prose-guarded pruning silently lossy
    val filler = (1 to 300).map(i => s"w$i").mkString(" ")
    val base = ((1L to 12L).map(i =>
        (i, s"join vector stream spark window d$i")) :+
      (99L, s"window $filler")).toDF("doc_id", "text")
    val delta = Seq((200L, Seq.fill(30)("vector join stream spark").mkString(" ")))
      .toDF("doc_id", "text")
    val idx = tmp("lexstale")
    LexQueries.buildLexIndexFrom(spark, base, idx)
    assert(!LexQueries.boundsStale(spark, idx), "fresh build ⇒ bounds current")
    LexQueries.appendLexIndex(spark, delta, idx)
    assert(LexQueries.boundsStale(spark, idx), "append must mark bounds stale")
    // the grown posting really does exceed the frozen bound — the
    // scenario the marker exists for
    val frozenUb = spark.read.parquet(s"$idx/lexicon")
      .filter(col("tok") === "vector").collect().head.getAs[Double]("ub")
    val maxScore = LexQueries.serveTermScores(spark, idx,
        LexQueries.QueryTerms, LexQueries.loadStats(spark, idx))
      .filter(col("tok") === "vector")
      .agg(org.apache.spark.sql.functions.max(col("score"))).collect()
      .head.getDouble(0)
    assert(maxScore > frozenUb,
      s"fixture must exceed the frozen bound ($maxScore !> $frozenUb)")
    // pruned serving on the grown index: must take the exact fallback
    val run = LexQueries.maxscoreFromIndex(spark, idx)
    assert(run.boundsStale, "grown index must be served via the fallback")
    assert(run.nonEssential.isEmpty, "fallback must not prune")
    val unpruned = LexQueries.rankTop10(LexQueries.multitermTotals(
        LexQueries.serveTermScores(spark, idx, LexQueries.QueryTerms,
          LexQueries.loadStats(spark, idx))))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val got = run.result.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.sameElements(unpruned), "fallback answer must be the exact top-10")
    assert(got.exists(_.head == 200L),
      "the extreme delta doc must surface in the exact top-10 (lossy pruning would drop it)")
    // refresh recomputes the bounds → marker cleared, pruning active
    // again and exact against the REFRESHED stats (df/avgdl change, so
    // the comparison target is the post-refresh unpruned top-10)
    LexQueries.refreshLexicon(spark, idx)
    assert(!LexQueries.boundsStale(spark, idx), "refresh must clear the marker")
    val run2 = LexQueries.maxscoreFromIndex(spark, idx)
    assert(!run2.boundsStale)
    val unpruned2 = LexQueries.rankTop10(LexQueries.multitermTotals(
        LexQueries.serveTermScores(spark, idx, LexQueries.QueryTerms,
          LexQueries.loadStats(spark, idx))))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val got2 = run2.result.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got2.sameElements(unpruned2), "refreshed pruned answer must stay exact")
    // merge must mark too
    val shard = tmp("lexstale_shard")
    LexQueries.buildLexIndexFrom(spark,
      Seq((300L, "spark stream")).toDF("doc_id", "text"), shard)
    LexQueries.lexIndexMergeInto(spark, idx, shard)
    assert(LexQueries.boundsStale(spark, idx), "merge must mark bounds stale")
  }

  test("maxscore prunes a term whose bound cannot reach θ") {
    import spark.implicits._
    // 'window' rides in EVERY doc once (df = 13 → raw-odds idf ≈ 0.04 —
    // near-zero bound), the other terms are rich in 12 docs — the
    // champion's 12 candidates set a θ the window bound cannot reach,
    // so 'window' must go non-essential and the answer stay exact
    val filler = (1 to 400).map(i => s"w$i").mkString(" ")
    val docs = ((1L to 12L).map(i =>
        (i, s"join vector join vector stream spark join vector window d$i")) :+
      (99L, s"window $filler")).toDF("doc_id", "text")
    val idx = tmp("lexprune")
    LexQueries.buildLexIndexFrom(spark, docs, idx)
    val run = LexQueries.maxscoreFromIndex(spark, idx)
    assert(run.nonEssential.contains("window"),
      s"low-bound term must be pruned; nonEss=${run.nonEssential}, θ=${run.theta}")
    val scored = LexQueries.serveTermScores(spark, idx,
      LexQueries.QueryTerms,
      LexQueries.loadStats(spark, idx))
    val unpruned = LexQueries.rankTop10(LexQueries.multitermTotals(scored))
      .collect().map(_.toSeq).sortBy(_.mkString("|"))
    val got = run.result.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(got.sameElements(unpruned), "pruning must stay lossless")
  }
}
