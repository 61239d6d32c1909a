package graft.queries

import graft.functions.TextFunctions._
import graft.sources.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The LEXICAL retrieval index lifecycle — the text-side twin of the
  * IVF/IVFPQ vector-index family ([[SimilarityQueries.buildIvfIndex]]):
  * a persisted inverted index over the corpus vocabulary with
  * train-once/serve-many BM25 scoring, incremental append, tombstone
  * deletes, and lossless MaxScore top-k pruning. A 100 TB curation
  * pipeline runs lexical retrieval constantly (topic mining,
  * decontamination lookups, hybrid RAG arms — the same workloads
  * `bm25_top` prices compute-per-query); this family is the layout that
  * makes those lookups O(query terms), not O(corpus).
  *
  * Index layout at `indexPath/`:
  *   - `stats/` — ONE row (n_docs, sum_dl): the corpus statistics BM25
  *     normalizes by, frozen at build time.
  *   - `lexicon/` — one row per vocabulary term (tok, df, ub, slot):
  *     document frequency (frozen — the idf staleness between index
  *     refreshes is the same contract as the IVF family's frozen
  *     centroids) and `ub`, the EXACT maximum BM25 contribution of the
  *     term over its postings (the MaxScore bound; a selection over
  *     per-row scores, so oracle-reproducible with no new arithmetic).
  *   - `postings/` — (tok, doc_id, tf, dl) PARTITIONED BY
  *     slot = pmod(hash(tok), 64). Raw-term partitioning would create a
  *     directory per vocabulary word (millions at corpus scale); the
  *     64-way slot hash keeps directory counts flat while the serving
  *     join's slot equality makes the read DYNAMIC-PARTITION-PRUNABLE —
  *     a query probing 5 terms reads ≤5 slot directories, not the
  *     vocabulary. `dl` rides the posting row (constant per doc,
  *     cardinality unchanged) so serving needs no per-doc length join,
  *     same trick as [[CurationQueries.bm25Top]]'s tf grouping.
  *   - `tombstones/` — retired doc_ids; every serving path anti-joins
  *     the broadcast set (bounded by delete traffic, never corpus size),
  *     so a takedown serves around immediately without a rebuild.
  *
  * Scoring is bit-identical to [[CurationQueries.bm25Top]]: Okapi
  * k1 = 1.2, b = 0.75 with the idf as the RAW odds ratio (the log is
  * monotonic, and rational-only arithmetic keeps the DuckDB oracle
  * exact). tf/df/dl/n_docs/sum_dl are longs — persisting them through
  * parquet is lossless, so served scores equal computed-from-scratch
  * scores bit for bit, which is what gates `bm25_served` against the
  * SAME oracle SQL as `bm25_top`.
  */
object LexQueries {

  /** The fixed retrieval term set every lexical query family uses —
    * same set as [[CurationQueries.bm25Top]]. Order matters: multi-term
    * totals are IEEE sums in THIS order, engine and oracle alike. */
  val QueryTerms: Seq[String] = Seq("join", "vector", "stream", "window", "spark")

  /** Posting-partition fan-out. 64 directories regardless of vocabulary
    * size; at 1000 executors each slot is still many files wide, so
    * parallelism is unconstrained — the partitioning exists for pruning,
    * not for balance. */
  val NSlots: Int = 64

  /** The fixed takedown batch `bm25_deleted`'s oracle excludes — literal
    * so DuckDB can mirror it; LexIndexSpec separately retires ids taken
    * from a LIVE result to pin that serve-around changes answers. */
  val DeletedIds: Seq[Long] = Seq(3L, 7L, 11L, 19L, 23L)

  private def slotOf(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    pmod(hash(c), lit(NSlots))

  /** (doc_id, dl, tok, tf) over the FULL vocabulary of `docs` — the
    * inverted index's row set. One tokenize + one (doc, term)-keyed
    * aggregate; `explode_outer` + null filter keeps Catalyst from
    * double-evaluating the tokenizer in the scan (same note as
    * [[CurationQueries.bm25Top]]). */
  private def tfOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), wordTokens(col("text")).as("ws"))
      .select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        posexplode_outer(col("ws")).as(Seq("pos", "tok")))
      .filter(col("tok").isNotNull)
      .groupBy(col("doc_id"), col("dl"), col("tok"))
      // POSITIONAL postings: 1-based in-doc token positions, sorted —
      // what phrase/proximity queries verify against. posns rides the
      // posting row as one more parquet column; BM25 serving never
      // references it, so column pruning keeps the scoring scans as
      // narrow as before (tf is kept denormalized for the same reason:
      // scoring must not pay size(posns) per row)
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos") + 1)).as("posns"))

  /** Persist the lexical index over the fixture's documents table. */
  def buildLexIndex(spark: SparkSession, dir: String, indexPath: String): Unit =
    buildLexIndexFrom(spark, Tables.documents(spark, dir), indexPath)

  /** The ATTRIBUTE sidecar rows faceted retrieval filters on: one thin
    * doc_id row per document PARTITIONED BY (lang, source) — BOTH
    * production facet axes are partition levels, so a language facet
    * prunes at level 1, a source facet (the takedown/licensing shape)
    * at level 2, and a combined predicate at the leaf: every facet's
    * allowlist is a partition-pruned read of one narrow column (never a
    * text byte) and low-cardinality facets cost one directory listing
    * at any corpus size. Tolerant of attribute-less frames (spec
    * fixtures, the chunk pseudo-corpus): a missing lang lands in the
    * honest `und` (ISO undetermined) partition and a missing source in
    * `unk` — visible there rather than silently absent from every
    * facet. The sidecar is maintained by EVERY writer (build, append,
    * merge, streamed ingest, compact purge), so a grown index's facets
    * cover its delta docs — the same no-silent-staleness stance as
    * `_bounds_stale`. */
  private[graft] def attrsRows(docs: DataFrame): DataFrame = {
    val src = if (docs.columns.contains("source"))
      coalesce(col("source").cast("string"), lit("unk"))
    else lit("unk")
    val lang = if (docs.columns.contains("lang"))
      coalesce(col("lang").cast("string"), lit("und"))
    else lit("und")
    docs.select(col("doc_id"), lang.as("lang"), src.as("source"))
  }

  /** The attrs tree's partition spec, shared by every writer. */
  private[graft] val AttrsPartCols: Seq[String] = Seq("lang", "source")

  /** [[buildLexIndex]] generic over the document source (the appended
    * family builds on the base slice). Build cost is one tokenize pass,
    * one (doc, term) aggregate, and one vocabulary-keyed shuffle for df
    * — the honest one-time price; every serve after it is
    * O(query terms). */
  private[graft] def buildLexIndexFrom(spark: SparkSession, docs: DataFrame,
      indexPath: String): Unit = {
    val toks = docs.select(col("doc_id"), wordTokens(col("text")).as("ws"))
    val stats = toks.select(size(col("ws")).cast("long").as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    stats.write.mode("overwrite").parquet(s"$indexPath/stats")
    postingRows(docs)
      .write.partitionBy("slot").mode("overwrite")
      .parquet(s"$indexPath/postings")
    // lexicon from the JUST-WRITTEN postings — the corpus tokenizes
    // exactly twice (stats pass + posting pass); the df/ub derivation
    // reads the posting rows back instead of re-running the tokenizer
    // on both sides of its vocabulary-keyed self-join
    writeLexiconFrom(spark, indexPath,
      spark.read.parquet(s"$indexPath/postings")
        .select(col("tok"), col("doc_id"), col("tf"), col("dl")))
    attrsRows(docs).write.partitionBy(AttrsPartCols: _*).mode("overwrite")
      .parquet(s"$indexPath/attrs")
    // a full rebuild computes fresh bounds over exactly these postings
    clearBoundsStale(spark, indexPath)
  }

  /** The lexicon derivation shared by build and refresh: df + the exact
    * per-term max score (the MaxScore bound) over a (tok, doc_id, tf,
    * dl) posting frame under the CURRENT stored stats. The df join is
    * vocabulary-keyed — a build/refresh-time shuffle, never a serving
    * cost. The score expression is the serving expression, so ub is a
    * max over ACTUAL IEEE scores (a selection, not new arithmetic) —
    * the bound can never round below a served score. */
  private def writeLexiconFrom(spark: SparkSession, indexPath: String,
      post: DataFrame): Unit = {
    val st = spark.read.parquet(s"$indexPath/stats")
    val dfq = post.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    post.join(dfq, "tok").crossJoin(broadcast(st))
      .withColumn("score", scoreCol)
      .groupBy(col("tok"), col("df"))
      .agg(max(col("score")).as("ub"))
      .select(col("tok"), col("df"), col("ub"), slotOf(col("tok")).as("slot"))
      .write.partitionBy("slot").mode("overwrite").parquet(s"$indexPath/lexicon")
  }

  /** Incremental growth — [[SimilarityQueries.ivfIndexAppend]]'s lexical
    * twin: tokenize ONLY the delta docs, route their posting rows through
    * the same slot hash, `mode("append")` under `partitionBy(slot)` so
    * new files land only in touched slot directories and existing posting
    * files are never rewritten (LexIndexSpec pins byte-identity). The
    * lexicon and stats stay FROZEN: served idf/avgdl go stale between
    * refreshes exactly like frozen IVF centroids go routing-stale — the
    * documented contract real engines (Lucene between merges) run under.
    * A delta term absent from the frozen lexicon is unservable until the
    * next rebuild, same as a vector outside every trained centroid's
    * reach — and the frozen MaxScore bounds may UNDERESTIMATE delta
    * postings, so MaxScore-pruned serving needs a [[refreshLexicon]]
    * first (BM25 scoring itself stays safe: stale df/avgdl shift scores
    * uniformly per term, they never break an inequality the way a stale
    * bound does). */
  def appendLexIndex(spark: SparkSession, docsDelta: DataFrame,
      indexPath: String): Unit = {
    SimilarityQueries.assertNoMaintenance(fsOf(spark, indexPath), indexPath,
      "appendLexIndex")
    // growth can outrun the frozen MaxScore bounds: mark BEFORE the
    // write so pruned serving falls back to the exact unpruned plan
    // until the next refresh/rebuild (a crash after the mark but before
    // the write leaves only spurious staleness — the safe direction)
    markBoundsStale(spark, indexPath)
    // attrs land BEFORE postings — the two writes are separate jobs and
    // only this order crashes harmlessly: facet rows without postings
    // are dead weight (the allowlist is a semi-join restriction, an
    // unmatched doc_id there selects nothing), whereas postings without
    // facet rows would serve unfiltered yet be absent from EVERY facet,
    // contradicting the sidecar's no-silently-absent stance. Re-running
    // the append after such a crash duplicates only attrs rows, which
    // the semi-join dedups by construction.
    attrsRows(docsDelta).write.partitionBy(AttrsPartCols: _*).mode("append")
      .parquet(s"$indexPath/attrs")
    postingRows(docsDelta)
      .write.partitionBy("slot").mode("append")
      .parquet(s"$indexPath/postings")
  }

  /** A document frame's slot-routed posting rows — the write-side unit
    * shared by build, append, and the streaming ingest edge. */
  private[graft] def postingRows(docs: DataFrame): DataFrame =
    tfOf(docs).select(col("tok"), col("doc_id"), col("tf"), col("dl"),
      col("posns"), slotOf(col("tok")).as("slot"))

  private def fsOf(spark: SparkSession, indexPath: String) =
    new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ----------------------------------------------- MaxScore bound freshness
  //
  // The lexicon's ub bounds are exact maxima over the postings AT
  // BUILD/REFRESH TIME. Growing the index (append / merge / streamed
  // ingest) can add a posting whose score exceeds its term's frozen
  // bound, which would make MaxScore pruning silently LOSSY — the one
  // staleness direction that breaks an inequality rather than shifting
  // scores uniformly. The `_bounds_stale` marker turns that prose
  // contract into code: every grower sets it BEFORE its posting write
  // (a crash between the two leaves only spurious staleness — safe),
  // [[refreshLexicon]] and a full rebuild clear it AFTER their lexicon
  // write, and every pruned serving path checks it and falls back to
  // the always-exact unpruned plan while it stands.

  private def boundsStalePath(indexPath: String) =
    new org.apache.hadoop.fs.Path(s"$indexPath/_bounds_stale")

  /** Record that the postings may have outgrown the frozen MaxScore
    * bounds — called by every grower before it writes. */
  private[graft] def markBoundsStale(spark: SparkSession, indexPath: String): Unit = {
    val fs = fsOf(spark, indexPath)
    fs.create(boundsStalePath(indexPath), true).close()
  }

  /** Are the frozen ub bounds possibly stale for the current postings? */
  private[graft] def boundsStale(spark: SparkSession, indexPath: String): Boolean =
    fsOf(spark, indexPath).exists(boundsStalePath(indexPath))

  private def clearBoundsStale(spark: SparkSession, indexPath: String): Unit = {
    fsOf(spark, indexPath).delete(boundsStalePath(indexPath), false)
    ()
  }

  /** Refresh the FROZEN serving state (lexicon + stats) from the
    * CURRENT postings — the staleness-loop closer: after any number of
    * appends/merges/streamed ingests, `refresh` restores exact BM25
    * (df, n_docs, avgdl, MaxScore bounds all current) WITHOUT reading a
    * byte of document text — posting rows already carry tf and dl, so
    * the recompute is one postings scan + one vocabulary-keyed shuffle,
    * the same build-time cost profile as the original lexicon pass but
    * corpus-free. Fenced like the appenders (a refresh landing
    * mid-compact would recount rows the rewrite is deleting).
    *
    * Semantics, pinned by `bm25_refreshed`'s oracle: the refreshed
    * stats cover LIVE documents with ≥1 token — tombstoned docs are
    * anti-joined out of the recount (refresh-after-delete ≡ rebuild
    * over the surviving corpus, the view tombstone-aware serving
    * answers from), and an empty document leaves no posting row to
    * count (versus a from-scratch build, n_docs drops by the empty-doc
    * count and sum_dl by 0). Every downstream quantity is otherwise
    * identical. Refresh also restores the MaxScore bounds' validity
    * after growth — see the [[maxscoreFromIndex]] precondition.
    *
    * Concurrency contracts: (1) a refresh CHANGES what served scores
    * mean — a live [[graft.streaming.LexServe]] stream caches stats at
    * start and reads the lexicon per batch, so it would mix generations;
    * restart serving streams after a refresh, exactly as after a rebuild
    * (batch serving paths read both per call and pick the new generation
    * up whole under the single-JVM sequential contract). (2) The two
    * overwrites (stats first, then lexicon) are not atomic together: a
    * crash between them leaves a mixed generation on disk — re-running
    * the refresh completes it (idempotent; inputs are the postings,
    * which refresh never touches). */
  def refreshLexicon(spark: SparkSession, indexPath: String): Unit = {
    // refresh HOLDS the maintenance marker for its read-to-clear span
    // (growers assertNoMaintenance and so fail loudly while it stands):
    // without the fence, a grower that marks-and-writes between the
    // postings read below and the clearBoundsStale at the end would get
    // its marker wiped while the refreshed bounds do not cover its
    // postings — pruning silently lossy, the exact class the marker
    // exists to prevent. The fence turns that interleaving into a loud
    // retry on the grower's side; reachable in practice now that
    // LexIngest's auto-refresh cadence runs refresh routinely during
    // streaming. A crash inside the span leaves the marker standing —
    // operator removes it or re-runs the (idempotent) refresh via
    // compact-style recovery; the safe direction, since a standing
    // marker only refuses writes, never corrupts. Unlike a compact,
    // refresh does NOT refuse over uncommitted ingest staging: it never
    // rewrites posting files, and a staged-but-unpromoted batch's
    // replay re-marks staleness through the beforePromote seam, so a
    // refresh inside the crash window stays safe (LexIngestSpec pins
    // exactly that interleave).
    val release = SimilarityQueries.acquireMaintenance(
      fsOf(spark, indexPath), indexPath, refuseStaging = false)
    try {
      // the recount covers LIVE postings only: tombstoned docs are
      // anti-joined out, so refresh-after-delete equals a rebuild over
      // the surviving corpus (what tombstone-aware serving answers from)
      // rather than a state no build could produce
      val post = tombFilter(spark, indexPath, tombstoneAware = true)(
          spark.read.parquet(s"$indexPath/postings"))
        .select(col("tok"), col("doc_id"), col("tf"), col("dl"))
      // stats from the distinct per-doc lengths riding the posting rows
      post.select(col("doc_id"), col("dl")).distinct()
        .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
        .write.mode("overwrite").parquet(s"$indexPath/stats")
      writeLexiconFrom(spark, indexPath, post)
      // bounds recomputed over the CURRENT postings — pruned serving is
      // exact again (cleared last: a crash mid-refresh re-runs it)
      clearBoundsStale(spark, indexPath)
    } finally release()
  }

  /** `bm25_refreshed`: serve after append + [[refreshLexicon]] — the
    * pin that "grow then refresh ≡ build from scratch": df/stats/ub are
    * all current again, so the oracle is the PLAIN full-corpus chain
    * (modulo the empty-doc stats note above: g counts docs with ≥1
    * token). */
  def bm25Refreshed(spark: SparkSession, dir: String): DataFrame = {
    val idx = SimilarityQueries.servedIndexWith(dir, "lexidx_rf",
        lexStamp(spark, dir)) { p =>
      buildLexIndexFrom(spark,
        Tables.documents(spark, dir).filter(col("doc_id") % 4 =!= 0), p)
      appendLexIndex(spark,
        Tables.documents(spark, dir).filter(col("doc_id") % 4 === 0), p)
      refreshLexicon(spark, p)
    }
    perTermTop10(serveTermScores(spark, idx, QueryTerms, loadStats(spark, idx)))
  }

  /** O(batch) takedown: append doc_ids to the tombstone side table —
    * zero posting files read or rewritten; every serving path anti-joins
    * the broadcast set on its next run/micro-batch. */
  def deleteLexDocs(spark: SparkSession, indexPath: String,
      ids: Seq[Long]): Unit = {
    import spark.implicits._
    // fenced: a tombstone landing between a compact's read and its
    // tombstone drop would be silently discarded — a lost takedown. The
    // marker makes the race a loud retry instead.
    SimilarityQueries.assertNoMaintenance(fsOf(spark, indexPath), indexPath,
      "deleteLexDocs")
    ids.toDF("doc_id").write.mode("append").parquet(s"$indexPath/tombstones")
  }

  /** FACET-SCOPED takedown — "retire everything we ingested from source
    * X", the licensing/legal shape the (lang, source) sidecar exists to
    * serve on its write side: the doc_ids resolve from ONE
    * partition-pruned attrs read (the source= leaves across langs) and
    * land in the tombstone table distributed, so the whole operation is
    * O(facet sidecar slice) — zero posting files read, zero text bytes,
    * no driver-side id collection. Serving anti-joins the broadcast
    * tombstone set as with any takedown; since a whole source can be a
    * corpus-scale fraction (vs the usual ≪corpus takedown batch), run
    * [[compactLexIndex]] soon after to purge physically and shrink the
    * broadcast back to zero. Fenced like every delete. */
  /** `autoCompact`: fold the physical purge into the retire — an
    * explicit override, never an auto-engage (the RetireAb measurement:
    * tombstoned serving is latency-free at every measurable mass; the
    * corpus-scale trigger is broadcast memory, an operator decision). */
  def deleteLexSource(spark: SparkSession, indexPath: String,
      source: String, autoCompact: Boolean = false): Unit = {
    val fs = fsOf(spark, indexPath)
    SimilarityQueries.assertNoMaintenance(fs, indexPath, "deleteLexSource")
    val attrs = new org.apache.hadoop.fs.Path(s"$indexPath/attrs")
    require(fs.exists(attrs),
      s"deleteLexSource: no attrs/ sidecar under $indexPath - the index " +
        "predates facets, so source membership is unknown; rebuild it " +
        "(or resolve the ids upstream and use deleteLexDocs)")
    spark.read.parquet(attrs.toString)
      .filter(col("source") === source).select(col("doc_id")).distinct()
      .write.mode("append").parquet(s"$indexPath/tombstones")
    if (autoCompact) compactLexIndex(spark, indexPath)
  }

  /** Physical purge — rewrite ONLY the slot directories that still hold
    * tombstoned rows, then drop the tombstones (the IVF compact
    * discipline: untouched slots keep their bytes, a slot whose every
    * row was deleted gets its directory dropped explicitly — dynamic
    * overwrite only rewrites partitions PRESENT in the new data — and
    * the `_maintenance` marker fences concurrent appenders for the
    * rewrite's duration). Idempotent: no tombstones, no work. */
  def compactLexIndex(spark: SparkSession, indexPath: String): Unit = {
    val tombPath = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    val fs = tombPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tombPath)) return
    val release = SimilarityQueries.acquireMaintenance(fs, indexPath)
    try {
      val tombs = broadcast(spark.read.parquet(tombPath.toString)
        .select(col("doc_id").as("tomb_id")).distinct())
      val touched = spark.read.parquet(s"$indexPath/postings")
        .join(tombs, col("doc_id") === col("tomb_id"))
        .select(col("slot")).distinct()
        .collect().map(_.getInt(0)).toIndexedSeq
      if (touched.nonEmpty) {
        val survivors = spark.read.parquet(s"$indexPath/postings")
          .filter(col("slot").isin(touched: _*))
          .join(tombs, col("doc_id") === col("tomb_id"), "left_anti")
          .select(col("tok"), col("doc_id"), col("tf"), col("dl"),
            col("posns"), col("slot"))
          .persist()
        try {
          val surviving = survivors.select(col("slot")).distinct()
            .collect().map(_.getInt(0)).toSet
          survivors.write.partitionBy("slot")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(s"$indexPath/postings")
          touched.filterNot(surviving).foreach { s =>
            fs.delete(new org.apache.hadoop.fs.Path(
              s"$indexPath/postings/slot=$s"), true)
          }
          // a FULLY-purged index must stay readable and appendable —
          // keep one schema-bearing empty slot dir for partition
          // discovery (the IVF compact's same rule)
          val root = new org.apache.hadoop.fs.Path(s"$indexPath/postings")
          val anyLeft = fs.exists(root) && fs.listStatus(root).exists(st =>
            st.isDirectory && st.getPath.getName.startsWith("slot="))
          if (!anyLeft)
            survivors.drop("slot").limit(0).write.mode("overwrite")
              .parquet(s"$indexPath/postings/slot=${touched.head}")
        } finally survivors.unpersist()
      }
      purgeAttrsSidecar(spark, fs, indexPath, tombPath)
      fs.delete(tombPath, true)
    } finally release()
  }

  /** Purge tombstoned doc_ids from the (lang, source) attrs facet
    * sidecar: rewrite only the LEAF partitions that still hold
    * tombstoned rows (the slot-compact discipline on the attrs tree —
    * the touched set is bounded by delete traffic, never by facet
    * cardinality); an index built before the sidecar existed has none.
    * Shared by the lexical AND LSH compactors (both facet their
    * doc-keyed indexes through the same sidecar layout); callers hold
    * the maintenance marker. */
  private[graft] def purgeAttrsSidecar(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem, indexPath: String,
      tombPath: org.apache.hadoop.fs.Path): Unit = {
      val attrsRoot = new org.apache.hadoop.fs.Path(s"$indexPath/attrs")
      if (fs.exists(attrsRoot)) {
        val tombs2 = broadcast(spark.read.parquet(tombPath.toString)
          .select(col("doc_id").as("tomb_id")).distinct())
        val touchedPair = spark.read.parquet(attrsRoot.toString)
          .join(tombs2, col("doc_id") === col("tomb_id"))
          .select(col("lang"), col("source")).distinct()
          .collect().map(r => (r.getString(0), r.getString(1))).toIndexedSeq
        if (touchedPair.nonEmpty) {
          // level-1 pruning gates the read; the leaf predicate below
          // narrows to exactly the touched pairs
          val pairPred = touchedPair.map { case (l, s) =>
            col("lang") === l && col("source") === s
          }.reduce(_ || _)
          val surv = spark.read.parquet(attrsRoot.toString)
            .filter(pairPred)
            .join(tombs2, col("doc_id") === col("tomb_id"), "left_anti")
            .select(col("doc_id"), col("lang"), col("source"))
            .persist()
          try {
            val survPair = surv.select(col("lang"), col("source")).distinct()
              .collect().map(r => (r.getString(0), r.getString(1))).toSet
            surv.write.partitionBy(AttrsPartCols: _*)
              .option("partitionOverwriteMode", "dynamic")
              .mode("overwrite").parquet(attrsRoot.toString)
            // dynamic overwrite only rewrites leaves PRESENT in the new
            // data — a fully-purged leaf directory drops explicitly
            touchedPair.filterNot(survPair).foreach { case (l, s) =>
              fs.delete(new org.apache.hadoop.fs.Path(
                s"$indexPath/attrs/lang=$l/source=$s"), true)
              // and its lang directory too once the last source left
              val langDir = new org.apache.hadoop.fs.Path(
                s"$indexPath/attrs/lang=$l")
              if (fs.exists(langDir) && !fs.listStatus(langDir).exists(st =>
                  st.isDirectory && st.getPath.getName.startsWith("source=")))
                fs.delete(langDir, true)
            }
            val anyLangLeft = fs.exists(attrsRoot) &&
              fs.listStatus(attrsRoot).exists(st =>
                st.isDirectory && st.getPath.getName.startsWith("lang="))
            if (!anyLangLeft) {
              val (l0, s0) = touchedPair.head
              surv.drop("lang").drop("source").limit(0).write.mode("overwrite")
                .parquet(s"$indexPath/attrs/lang=$l0/source=$s0")
            }
          } finally surv.unpersist()
        }
      }
  }

  // ---------------------------------------------------------------- serving

  private[graft] def loadStats(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(s"$indexPath/stats")

  /** The slot a term's postings live in, computed DRIVER-side by
    * evaluating the same foldable expression the writers use — what
    * makes query-time partition pruning STATIC (a `slot IN (…)` filter
    * on the scan) instead of leaning on dynamic-partition-pruning
    * heuristics that a constant-folded literal term frame defeats. */
  private[graft] def slotOfLiteral(t: String): Int = {
    // the same murmur3(seed 42) the distributed slotOf evaluates, plus a
    // positive mod — LexIndexSpec pins driver/executor slot agreement
    val h = new org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
        Seq(org.apache.spark.sql.catalyst.expressions.Literal(t)))
      .eval(org.apache.spark.sql.catalyst.InternalRow.empty).asInstanceOf[Int]
    ((h % NSlots) + NSlots) % NSlots
  }

  /** The query terms' lexicon rows. The lexicon is vocabulary-sized —
    * too big to cache the way the IVF family caches its k centroids —
    * so the lookup is a statically slot-pruned scan: `slot IN (…)`
    * reaches the partition filter, `tok IN (…)` the row groups —
    * ≤|terms| slot directories read, never the vocabulary. */
  private[graft] def queryLexicon(spark: SparkSession, indexPath: String,
      terms: Seq[String]): DataFrame =
    if (terms.isEmpty)
      spark.range(0).select(lit("").as("tok"), lit(0L).as("df"),
        lit(0.0).as("ub"), lit(0).as("slot"))
    else spark.read.parquet(s"$indexPath/lexicon")
      .filter(col("slot").isin(terms.map(slotOfLiteral).distinct: _*) &&
        col("tok").isin(terms: _*))
      .select(col("tok"), col("df"), col("ub"), col("slot"))

  /** The served score expression — the SAME operation tree as
    * [[CurationQueries.bm25Top]]'s oracle-matched chain (every
    * intermediate one IEEE op on exact-long inputs), evaluated over
    * stored posting/lexicon/stats columns. */
  private def scoreCol: org.apache.spark.sql.Column = {
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf =
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))
    idf * (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
  }

  /** The serving CORE every batch and streaming lexical entry point
    * shares: statically slot-pruned scans of lexicon and postings
    * (`slot IN (…)` partition filters from the driver-computed term
    * slots), a broadcast (slot, tok) equijoin attaching each posting
    * row's frozen df, and the shared score expression over the frozen
    * one-row stats. With `tombstoneAware`, the current tombstone set is
    * re-read and anti-joined per call, so takedowns land without a
    * rebuild. */
  private[graft] def serveTermScores(spark: SparkSession, indexPath: String,
      terms: Seq[String], statsRow: DataFrame,
      tombstoneAware: Boolean = false): DataFrame = {
    if (terms.isEmpty)
      return spark.range(0).select(lit("").as("tok"), lit(0L).as("doc_id"),
        lit(0L).as("tf"), lit(0L).as("df"), lit(0L).as("dl"),
        lit(0.0).as("score"))
    val lexq = queryLexicon(spark, indexPath, terms)
      .select(col("tok").as("qtok"), col("df"), col("slot").as("qslot"))
    val post = tombFilter(spark, indexPath, tombstoneAware)(
      spark.read.parquet(s"$indexPath/postings")
        .filter(col("slot").isin(terms.map(slotOfLiteral).distinct: _*) &&
          col("tok").isin(terms: _*)))
    post.join(broadcast(lexq),
        post("slot") === col("qslot") && post("tok") === col("qtok"))
      .crossJoin(broadcast(statsRow))
      .withColumn("score", scoreCol)
      .select(col("tok"), col("doc_id"), col("tf"), col("df"), col("dl"),
        col("score"))
  }

  /** The per-call tombstone screen ([[SimilarityQueries]]'s
    * tombstonePostingsFilter, doc_id-keyed). */
  private def tombFilter(spark: SparkSession, indexPath: String,
      tombstoneAware: Boolean): DataFrame => DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    if (tombstoneAware &&
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)) {
      val tombs = broadcast(spark.read.parquet(p.toString)
        .select(col("doc_id").as("tomb_id")).distinct())
      d => d.join(tombs, d("doc_id") === tombs("tomb_id"), "left_anti")
    } else identity
  }

  /** Per-term top-10 from scored (tok, doc_id, …) rows — `bm25_top`'s
    * output shape, WindowGroupLimit-pruned. */
  private def perTermTop10(scored: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("tok")).orderBy(col("score").desc, col("doc_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("tok"), col("doc_id"), col("tf"), col("df"), col("dl"),
        col("score"), col("rk").cast("long").as("rk"))
  }

  /** Physical-layout version folded into every cached-index staleness
    * stamp: bumping it invalidates indexes built by older code whose
    * on-disk layout changed (the fixture stamp alone cannot see that). */
  private val LayoutVersion = "lex-v5" // v5: attrs/ partitioned (lang, source)

  private def lexStamp(spark: SparkSession, dir: String): String =
    s"${SimilarityQueries.documentsStamp(spark, dir)};$LayoutVersion"

  /** The self-managing persisted index over the fixture's documents —
    * build-once/serve-many under the shared cache discipline. */
  private[graft] def servedLexIndex(spark: SparkSession, dir: String): String =
    SimilarityQueries.servedIndexWith(dir, "lexidx",
      lexStamp(spark, dir))(buildLexIndex(spark, dir, _))

  /** `bm25_served`: [[CurationQueries.bm25Top]] answered from the
    * PERSISTED index — no tokenize, no df pass, no corpus scan; one
    * slot-pruned posting read per term. Bit-identical to the
    * compute-from-scratch result (same longs through parquet, same
    * expression tree), so it shares `bm25_top`'s oracle SQL. */
  def bm25Served(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedLexIndex(spark, dir)
    perTermTop10(serveTermScores(spark, idx, QueryTerms, loadStats(spark, idx)))
  }

  /** Per-doc multi-term totals from scored rows: pivot the ≤|terms|
    * per-term scores wide (max of a one-element group — a selection),
    * then ONE fixed-order IEEE sum in [[QueryTerms]] order (absent terms
    * contribute exact 0.0) — the shape the DuckDB oracle reproduces
    * addition-for-addition. */
  private[graft] def multitermTotals(scored: DataFrame): DataFrame = {
    val aggs = count(lit(1)).as("n_terms") +:
      QueryTerms.map(t => max(when(col("tok") === t, col("score"))).as(s"s_$t"))
    val piv = scored.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val total = QueryTerms.map(t => coalesce(col(s"s_$t"), lit(0.0)))
      .reduceLeft(_ + _)
    piv.select(col("doc_id"), col("n_terms"), total.as("score"))
  }

  /** `bm25_multiterm`: the actual retrieval query — top 10 docs by the
    * SUM of per-term BM25 over the 5-term query, from the persisted
    * index. Top-k prunes via TakeOrderedAndProject (distributed heap,
    * no global sort); the rank window runs on the ≤10 survivors. */
  def bm25Multiterm(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedLexIndex(spark, dir)
    rankTop10(multitermTotals(serveTermScores(spark, idx, QueryTerms,
      loadStats(spark, idx))))
  }

  private[graft] def rankTop10(totals: DataFrame): DataFrame =
    totals.orderBy(col("score").desc, col("doc_id").asc).limit(10)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("n_terms"), col("score"), col("rk"))

  /** `bm25_maxscore`: the SAME top-10 as [[bm25Multiterm]], computed
    * with MaxScore pruning (Turtle & Flood) driven by the lexicon's
    * exact per-term bounds:
    *
    *  1. θ = the 10th-best FULL score among docs containing the
    *     champion term (the max-ub term) — a true lower bound on the
    *     real 10th score, TakeOrderedAndProject + a 10-row collect.
    *  2. Non-essential set: grow greedily (ub ascending) while the
    *     [[QueryTerms]]-fixed-order IEEE sum of the set's ubs stays
    *     STRICTLY below θ. A doc appearing only in non-essential terms
    *     has total ≤ that bound (IEEE round-to-nearest is monotone step
    *     by step, and the bound is summed in the same order as doc
    *     totals with exact 0.0 for the rest) < θ ≤ the real 10th score —
    *     so pruning it is lossless, ties included.
    *  3. Candidates = docs in ≥1 ESSENTIAL term's postings; full-score
    *     only those and rank.
    *
    * In a doc-at-a-time engine MaxScore skips posting READS; in a batch
    * engine the matched-term posting scan is one slot-pruned columnar
    * read either way, and the win is the candidate-bounded pivot/
    * aggregate/top-k — the scored rows materialize once
    * (localCheckpoint) and both phases reuse them. The oracle is the
    * UNPRUNED multi-term SQL: correctness gates that pruning is
    * lossless, the bench row prices the saving. */
  def bm25Maxscore(spark: SparkSession, dir: String): DataFrame =
    maxscoreFromIndex(spark, servedLexIndex(spark, dir)).result

  /** One MaxScore execution plus its pruning decision — the seam
    * LexIndexSpec pins losslessness AND actual pruning through.
    *
    * Bound freshness is ENFORCED, not assumed: the lexicon's ub bounds
    * cover the postings only on a freshly built or [[refreshLexicon]]ed
    * index — on an index GROWN since (append/merge/ingest), a delta
    * posting can exceed its term's frozen bound and pruning would turn
    * lossy. Every grower sets the `_bounds_stale` marker; while it
    * stands this method skips the pruning and answers through the
    * always-exact unpruned plan (`boundsStale = true` in the returned
    * run), so a grown index can never serve a silently-lossy top-k —
    * refresh restores the pruned path. */
  private[graft] final case class MaxscoreRun(
    nonEssential: Seq[String], theta: Double, result: DataFrame,
    boundsStale: Boolean = false)

  private[graft] def maxscoreFromIndex(spark: SparkSession,
      indexPath: String): MaxscoreRun = {
    val scoredOf = () => serveTermScores(spark, indexPath, QueryTerms,
      loadStats(spark, indexPath))
    if (boundsStale(spark, indexPath))
      return MaxscoreRun(Nil, Double.NegativeInfinity,
        rankTop10(multitermTotals(scoredOf())), boundsStale = true)
    val lexq = queryLexicon(spark, indexPath, QueryTerms)
    val scored = scoredOf().localCheckpoint(true)
    // ≤|QueryTerms| lexicon rows drive the driver-side term partition
    val ubs = lexq.select(col("tok"), col("ub")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .sortBy { case (t, u) => (u, t) }
    if (ubs.isEmpty)
      return MaxscoreRun(Nil, Double.NegativeInfinity,
        rankTop10(multitermTotals(scored)))
    val champion = ubs.last._1
    val d1 = scored.filter(col("tok") === lit(champion)).select(col("doc_id"))
    val top10 = multitermTotals(scored.join(d1, Seq("doc_id"), "left_semi"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(10).collect()
    val theta = if (top10.length < 10) Double.NegativeInfinity
      else top10.last.getAs[Double]("score")
    val ubMap = ubs.toMap
    var nonEss = Set.empty[String]
    for ((t, _) <- ubs) {
      val trial = nonEss + t
      val bound = QueryTerms.foldLeft(0.0)((acc, q) =>
        acc + (if (trial(q)) ubMap.getOrElse(q, 0.0) else 0.0))
      if (bound < theta) nonEss = trial
    }
    val ess = ubs.map(_._1).filterNot(nonEss)
    // ess can only be empty if the all-term bound < θ, which contradicts
    // θ being a real doc's score — but a defensive fall-through keeps the
    // answer correct even if a future bound change breaks that argument
    if (ess.isEmpty)
      return MaxscoreRun(Nil, theta, rankTop10(multitermTotals(scored)))
    val cand = scored.filter(col("tok").isin(ess: _*))
      .select(col("doc_id")).distinct()
    MaxscoreRun(nonEss.toSeq.sorted, theta,
      rankTop10(multitermTotals(scored.join(cand, Seq("doc_id"), "left_semi"))))
  }

  /** `lex_lexicon`: the stored lexicon rows for the query terms —
    * df and the exact MaxScore bound, both DuckDB-recomputable (df is a
    * count; ub a max over the shared score expression). Gates that the
    * build pass froze the statistics serving depends on correctly. */
  def lexLexicon(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedLexIndex(spark, dir)
    queryLexicon(spark, idx, QueryTerms).select(col("tok"), col("df"), col("ub"))
  }

  /** BM25 top-k for ONE batch of (qid, text) queries against the
    * persisted index — the multi-query core [[graft.streaming.LexServe]]
    * drives per micro-batch:
    *
    *   - the batch tokenizes ITSELF (batch-priced; term multiplicity in
    *     a query is ignored — standard binary query term weighting);
    *   - the batch's DISTINCT terms look up the lexicon and the
    *     postings ONCE, shared across every query in the batch (two
    *     broadcast equijoins, both slot-pruned);
    *   - per-(qid, doc) totals fold `sort_array(collect_list(struct(tok,
    *     score)))` with `aggregate` — a DETERMINISTIC-order IEEE sum
    *     whatever the partitioning, so streamed results equal batch
    *     results bit for bit (a plain float `sum()` merges partials in
    *     task-completion order and would flake the parity pin);
    *   - per-qid top-k prunes via WindowGroupLimit.
    *
    * `statsRow` is the frozen one-row corpus stats — the streaming edge
    * loads it once at stream start (frozen for the index's life). */
  /** Loud admission guard on the per-batch term dictionary: the distinct
    * terms of a query micro-batch drive DRIVER-side slot computation and
    * static partition pruning, so they must collect — bounded by query
    * traffic, never by the corpus, but a pathological batch (someone
    * streaming documents into the query edge) must fail with an
    * actionable message instead of an driver OOM. */
  private[graft] val MaxBatchTerms = 100000

  /** WHY THERE IS NO AUTO-ENGAGE for per-signature MaxScore pruning:
    * round 15 shipped one past Σ df ≥ 10⁷ matched posting rows — a
    * threshold calibrated only from the LOSING side (LexAb at 10⁵–10⁶
    * rows). Round 16 measured the engaging side (LexAbXl, 200 k-doc /
    * 10.2 M-posting engineered index, bench_records/r16_lexabxl.txt)
    * and the auto-engage is REMOVED on the result: at Σ df = 10⁷ with
    * tiny essential sets (the textbook-best case) the pruned plan still
    * measured 8.2 s vs the unpruned 3.6 s — 2.3× SLOWER, the same ratio
    * as fixture scale — and in the high-fan-out regime (5 signatures
    * sharing every long posting list, 50 M pre-fold rows over 10 M
    * matched) it reached only a WASH (13.2 s both plans): in this batch
    * engine the candidate screening passes (θ windows + essential-set
    * semi-join + the extra materialization) cost at least what the
    * per-(sig, doc) fold they shrink saves, at every measured scale and
    * shape. The pruned path stays available via
    * `maxscorePrune = Some(true)` — lossless, parity-pinned both ways,
    * disarmed by stale bounds — for layouts where posting READS
    * themselves could be skipped (impact-ordered postings), the one
    * economics this engine's slot-pruned columnar scan does not have. */

  /** Multi-query MaxScore: [[maxscoreFromIndex]]'s pruning applied
    * inside [[queryBatch]], per SIGNATURE and fully distributed — the
    * serving-edge analogue of the single-query pruned path, lossless by
    * the same argument, adapted to the batch fold order:
    *
    *   - θ_sig = the k-th best SINGLE-TERM score among the signature's
    *     champion-term (max-ub) postings — a weaker but still valid
    *     lower bound on the true k-th best total (each of those k docs'
    *     totals ≥ its champion score, nonnegative addends only), and
    *     computable from a window over ONE term's postings per sig
    *     instead of a full per-sig scoring pass;
    *   - a term set is prunable when the IEEE fold of its ubs IN TOKEN
    *     ORDER stays strictly below θ_sig: batch totals fold
    *     sorted-by-token (the deterministic-order sum below), and for
    *     nonnegative addends the token-order fl-sum over a doc's
    *     matched subset is ≤ the token-order fl-sum of the full
    *     non-essential set's ubs — monotone step by step — so a doc
    *     matching ONLY non-essential terms has total < θ_sig ≤ the true
    *     k-th score and can never displace a top-k row, ties included;
    *   - the greedy grows the non-essential set in ub-ascending PREFIX
    *     order (fl-sums of nonnegative values are nondecreasing in the
    *     prefix, so the largest passing prefix is well-defined); sigs
    *     with fewer than k champion postings get no θ and keep every
    *     term essential — pruning degrades to a no-op, never to a wrong
    *     answer;
    *   - candidates = (sig, doc) pairs matching ≥1 ESSENTIAL term.
    *     Essential terms are the HIGH-ub (rare, short-posting) ones, so
    *     the candidate frame is small; the semi-join then drops the
    *     bulk of the common-term rows before the expensive per-(sig,
    *     doc) fold + per-sig top-k window — the MaxScore economics in
    *     batch form.
    *
    * WHEN it pays — measured, and the answer is NEVER on this engine:
    * in a doc-at-a-time engine MaxScore skips posting READS; in this
    * batch engine both plans read the same slot-pruned postings once,
    * and pruning trades screening passes (θ windows, essential-set
    * semi-join, an extra materialization) against the smaller
    * fold/top-k. LexAb measured the pruned path 1.8–2.3× slower at the
    * 5 k/50 k-doc fixtures; LexAbXl (round 16) measured the engineered
    * BEST case — Σ df = 10⁷ matched rows, tiny essential sets — still
    * 2.3× slower, and the 5×-fan-out shared-vocabulary regime a wash
    * (see the essay above this method). The default is therefore the
    * UNPRUNED single-pass plan, always; `maxscorePrune = Some(true)`
    * forces the pruned plan (lossless, parity-pinned both ways) for
    * study or for a future impact-ordered layout.
    *
    * Gated on bound freshness exactly like the single-query path: a
    * `_bounds_stale` index serves through the unpruned plan. The
    * StreamingSpec parity pin holds bit-for-bit because pruning only
    * removes rows that cannot appear in the answer. */
  /** `docFilter` is the faceted-serving seam: a candidate-doc
    * restriction (e.g. the attrs-sidecar facet allowlist) applied to
    * the scored rows BEFORE the fold and top-k — filter-first
    * semantics, like [[bm25Filtered]]; the MaxScore machinery then
    * operates entirely within the filtered doc set, so pruning stays
    * lossless relative to the filtered answer. */
  private[graft] def queryBatch(spark: SparkSession, batch: DataFrame,
      indexPath: String, statsRow: DataFrame, k: Int = 10,
      tombstoneAware: Boolean = false,
      maxscorePrune: Option[Boolean] = None,
      docFilter: DataFrame => DataFrame = identity): DataFrame = {
    // RESULT SHARING across identical queries — the optimization that
    // makes the scoring cost ∝ DISTINCT query sets, not query count: a
    // BM25 answer depends only on the query's term SET, so queries
    // group by their canonical signature (sorted distinct terms joined
    // by a space — tokens never contain spaces, so the encoding is
    // collision-free), each distinct set is scored and top-k'd ONCE,
    // and the per-set answers fan back to qids with one broadcast join.
    // Production query streams are heavily head-skewed; without this, a
    // batch of 20k queries over common terms scores 20k × |postings|
    // pairs (measured 40× slower at sf0.1). Worst case (all-distinct
    // signatures) adds one distinct + one broadcast join — noise.
    val qsets = batch.select(col("qid"),
      concat_ws(" ", sort_array(array_distinct(wordTokens(col("text")))))
        .as("qsig"))
    val sigTok = qsets.select(col("qsig")).distinct()
      .select(col("qsig"), explode(split(col("qsig"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    // the term DICTIONARY collects (driver-computed slots -> static
    // partition pruning, the same plan every batch path serves with);
    // the qid->signature mapping stays distributed
    val termRows = sigTok.select(col("tok")).distinct()
      .limit(MaxBatchTerms + 1).collect()
    require(termRows.length <= MaxBatchTerms,
      s"queryBatch: > $MaxBatchTerms distinct terms in one query batch - " +
        "this edge serves QUERIES; stream documents through CorpusIngest " +
        "instead, or raise MaxBatchTerms")
    val terms = termRows.map(_.getString(0)).toSeq
    // ≤ |terms| lexicon rows — the per-sig bound lists, read only when
    // the caller FORCED the pruned plan (there is no auto decision to
    // feed since round 16 removed the auto-engage on measurement)
    val lexRows =
      if (terms.isEmpty || !maxscorePrune.contains(true))
        Array.empty[(String, Long, Double)]
      else queryLexicon(spark, indexPath, terms)
        .select(col("tok"), col("df"), col("ub")).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val prune = maxscorePrune.contains(true) &&
      terms.nonEmpty && !boundsStale(spark, indexPath)
    val scored0 = docFilter(serveTermScores(spark, indexPath, terms, statsRow,
      tombstoneAware))
    // with pruning on, three consumers (θ windows, candidate pairs, the
    // final fold) share one materialization of the matched postings
    val scored = if (prune) scored0.localCheckpoint(true) else scored0
    val joined = scored.join(broadcast(sigTok.withColumnRenamed("tok", "qtok2")),
      col("tok") === col("qtok2"))
    val kept = if (!prune) joined else {
      // per-sig terms sorted ub-ascending; last element is the champion
      // (bounds come from the already-collected lexicon rows — no
      // second lexicon read)
      val ubq = spark.createDataFrame(
          lexRows.toIndexedSeq.map(t => (t._1, t._3)))
        .toDF("utok", "ub")
      val sigTerms = sigTok.join(broadcast(ubq), col("tok") === col("utok"))
        .groupBy(col("qsig"))
        .agg(sort_array(collect_list(struct(col("ub"), col("tok")))).as("tl"))
        .withColumn("champ", element_at(col("tl"), -1)("tok"))
      // θ_sig: k-th best champion single-term score — one window over
      // ONE term's postings per sig; sigs with < k champion postings
      // get no row here and stay unpruned
      val wSig = Window.partitionBy(col("qsig"))
        .orderBy(col("score").desc, col("doc_id").asc)
      val theta = scored
        .join(broadcast(sigTerms.select(col("qsig"), col("champ"))),
          col("tok") === col("champ"))
        .withColumn("crk", row_number().over(wSig))
        .filter(col("crk") === k)
        .select(col("qsig").as("tsig"), col("score").as("theta"))
      // largest ub-ascending prefix whose TOKEN-ORDER fl-sum of bounds
      // stays strictly below θ — everything after it is essential
      val essFrame = sigTerms.join(theta, sigTerms("qsig") === theta("tsig"), "left")
        .withColumn("ncut", when(col("theta").isNull, lit(0)).otherwise(
          aggregate(sequence(lit(1), size(col("tl"))), lit(0),
            (best, i) => when(
              aggregate(
                array_sort(transform(slice(col("tl"), lit(1), i),
                  x => struct(x("tok").as("tok"), x("ub").as("ub")))),
                lit(0.0), (acc, x) => acc + x("ub")) < col("theta"),
              i).otherwise(best))))
        .select(col("qsig"),
          explode(slice(col("tl"), col("ncut") + lit(1),
            size(col("tl")) - col("ncut"))).as("e"))
        .select(col("qsig").as("esig"), col("e")("tok").as("etok"))
      // candidates: (sig, doc) pairs matching ≥1 essential (rare, high-
      // ub) term — a small frame; the semi-join drops the common-term
      // bulk before the per-(sig, doc) fold and per-sig top-k window
      val cand = scored.join(broadcast(essFrame), col("tok") === col("etok"))
        .select(col("esig").as("csig"), col("doc_id").as("cdoc")).distinct()
      joined.join(cand,
        joined("qsig") === cand("csig") && joined("doc_id") === cand("cdoc"),
        "left_semi")
    }
    val w = Window.partitionBy(col("qsig"))
      .orderBy(col("score").desc, col("doc_id").asc)
    val perSig = kept
      .groupBy(col("qsig"), col("doc_id"))
      .agg(sort_array(collect_list(struct(col("tok"), col("score")))).as("parts"))
      .select(col("qsig"), col("doc_id"),
        size(col("parts")).cast("long").as("n_terms"),
        aggregate(col("parts"), lit(0.0), (acc, x) => acc + x("score")).as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qsig").as("rsig"), col("doc_id"), col("n_terms"),
        col("score"), col("rk").cast("long").as("rk"))
    // fan the ≤ |sigs|·k answer rows back to every asking qid
    qsets.join(broadcast(perSig), col("qsig") === col("rsig"))
      .select(col("qid"), col("doc_id"), col("n_terms"), col("score"), col("rk"))
  }

  /** Shard-parallel index consolidation — [[SimilarityQueries.lshIndexMergeInto]]'s
    * lexical twin: absorb one shard's persisted inverted index into
    * another WITHOUT reading any document text. Posting rows are
    * (tok, doc_id, tf, dl) under the UNIVERSAL slot hash, so the merge
    * is a pure partition-wise posting union — src rows append into the
    * destination's matching slot directories as new files (never a
    * rewrite), with src tombstones purged on the way in. The
    * destination's lexicon and stats stay FROZEN (its df/avgdl now
    * understate the grown corpus — the same idf-staleness contract as
    * [[appendLexIndex]], refreshed at the next rebuild). Cost:
    * O(src postings); the destination corpus is never read.
    *
    * Atomicity contract (all merge families share it): the posting and
    * attrs appends are separate jobs — each commits atomically via the
    * parquet committer, but a crash BETWEEN them leaves postings merged
    * without the shard's facet rows, and re-running the merge would
    * duplicate postings. Merges are operator-driven maintenance: run
    * against a quiesced destination and, on a crash, restore from the
    * shard (still intact — the merge never mutates its source) rather
    * than re-running blind. */
  def lexIndexMergeInto(spark: SparkSession, dstIndex: String,
      srcIndex: String): Unit = {
    val tombPath = new org.apache.hadoop.fs.Path(s"$srcIndex/tombstones")
    val fs = tombPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    SimilarityQueries.assertNoMaintenance(fs, dstIndex, "lexIndexMergeInto")
    val src = spark.read.parquet(s"$srcIndex/postings")
      .select(col("tok"), col("doc_id"), col("tf"), col("dl"),
        col("posns"), col("slot"))
    val live =
      if (fs.exists(tombPath)) {
        val tomb = broadcast(spark.read.parquet(tombPath.toString)
          .select(col("doc_id").as("_tomb_del")).distinct())
        src.join(tomb, src("doc_id") === tomb("_tomb_del"), "left_anti")
      } else src
    // the destination's frozen MaxScore bounds don't cover src postings
    markBoundsStale(spark, dstIndex)
    live.write.partitionBy("slot").mode("append").parquet(s"$dstIndex/postings")
    // facets must cover the absorbed shard: src attrs (tombstone-purged)
    // append into the destination's per-lang directories; a shard built
    // before the sidecar existed simply contributes none
    val srcAttrs = new org.apache.hadoop.fs.Path(s"$srcIndex/attrs")
    if (fs.exists(srcAttrs)) {
      // coalesce on the way in: a shard written by the single-level
      // (pre-source-facet) layout carried source as a nullable DATA
      // column; its nulls land in the honest `unk` partition here
      val a = spark.read.parquet(srcAttrs.toString)
        .select(col("doc_id"),
          coalesce(col("lang").cast("string"), lit("und")).as("lang"),
          coalesce(col("source").cast("string"), lit("unk")).as("source"))
      val liveA =
        if (fs.exists(tombPath)) {
          val tomb = broadcast(spark.read.parquet(tombPath.toString)
            .select(col("doc_id").as("_tomb_del")).distinct())
          a.join(tomb, a("doc_id") === tomb("_tomb_del"), "left_anti")
        } else a
      liveA.write.partitionBy(AttrsPartCols: _*).mode("append")
        .parquet(s"$dstIndex/attrs")
    }
  }

  /** `bm25_merged`: per-term top-10 after merging a shard index (built
    * from the delta slice) into the base-slice index — because the slot
    * hash is universal and the destination lexicon stays frozen, merge
    * ≡ append, and the oracle IS `bm25_appended`'s SQL (stats/df over
    * the base slice, tf over everything). LexIndexSpec additionally
    * pins merge ≡ append row-for-row engine-side and src-tombstone
    * purge. */
  def bm25Merged(spark: SparkSession, dir: String): DataFrame = {
    val idx = SimilarityQueries.servedIndexWith(dir, "lexidx_mrg",
        lexStamp(spark, dir)) { p =>
      buildLexIndexFrom(spark,
        Tables.documents(spark, dir).filter(col("doc_id") % 4 =!= 0), p)
      val shard = s"${p}_srcshard"
      buildLexIndexFrom(spark,
        Tables.documents(spark, dir).filter(col("doc_id") % 4 === 0), shard)
      lexIndexMergeInto(spark, p, shard)
    }
    perTermTop10(serveTermScores(spark, idx, QueryTerms, loadStats(spark, idx)))
  }

  /** `phrase_search`: exact-phrase matching from the POSITIONAL
    * postings — the query class (quoted search, boilerplate/contract
    * clause detection, contamination phrase probes) tf-only indexes
    * cannot answer. Candidates are docs containing EVERY phrase term
    * (slot-pruned posting reads, doc-keyed equijoins — no text is ever
    * scanned); verification folds start positions: position p survives
    * step i iff term i occurs at p + i, so the surviving count after
    * the last term is the exact phrase-occurrence count. Cost is
    * bounded by the rarest term's posting list — the equijoin chain
    * intersects down monotonically. */
  def phraseSearch(spark: SparkSession, dir: String): DataFrame =
    phraseFromIndex(spark, servedLexIndex(spark, dir), Seq("vector", "stream"))

  private[graft] def phraseFromIndex(spark: SparkSession, indexPath: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    val slots = phrase.map(slotOfLiteral).distinct
    val post = spark.read.parquet(s"$indexPath/postings")
      .filter(col("slot").isin(slots: _*) && col("tok").isin(phrase.distinct: _*))
      .select(col("tok"), col("doc_id"), col("posns"))
    def termRows(t: String, as: String) = post.filter(col("tok") === t)
      .select(col("doc_id"), col("posns").as(as))
    val start = termRows(phrase.head, "cur")
    val matched = phrase.zipWithIndex.tail.foldLeft(start) {
      case (acc, (t, i)) =>
        acc.join(termRows(t, s"p$i"), "doc_id")
          .withColumn("cur",
            filter(col("cur"), p => array_contains(col(s"p$i"), p + i)))
          .select(col("doc_id"), col("cur"))
    }
    matched.select(col("doc_id"), size(col("cur")).cast("long").as("n_occ"))
      .filter(col("n_occ") > 0)
  }

  /** `prox_search`: proximity ranking from the POSITIONAL postings —
    * the primitive behind near-operators and proximity-boosted scoring:
    * for every doc containing BOTH query terms, the minimum absolute
    * position distance between any occurrence pair (plus both term
    * counts), closest-first top-20. The span computation is per-doc
    * tf_a × tf_b pairs — bounded by in-document term frequencies, never
    * by the corpus — over slot-pruned posting reads; no text is
    * scanned. All-integer arithmetic, so the oracle matches exactly. */
  def proxSearch(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedLexIndex(spark, dir)
    val terms = Seq("join", "window")
    val slots = terms.map(slotOfLiteral).distinct
    val post = spark.read.parquet(s"$idx/postings")
      .filter(col("slot").isin(slots: _*) && col("tok").isin(terms: _*))
    val a = post.filter(col("tok") === terms.head)
      .select(col("doc_id"), col("posns").as("pa"))
    val b = post.filter(col("tok") === terms(1))
      .select(col("doc_id"), col("posns").as("pb"))
    a.join(b, "doc_id")
      .select(col("doc_id"),
        size(col("pa")).cast("long").as("n_a"),
        size(col("pb")).cast("long").as("n_b"),
        array_min(flatten(transform(col("pa"), x =>
          transform(col("pb"), y => abs(x - y))))).cast("long").as("min_span"))
      .orderBy(col("min_span").asc, col("doc_id").asc).limit(20)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("min_span").asc, col("doc_id").asc)).cast("long"))
  }

  /** `contamination_served`: train/test decontamination answered from
    * the POSITIONAL index — [[TextQueries.contamination]]'s serve-many
    * twin. The held-out docs' distinct word-3-gram probes (query-priced
    * tokenize of the <50 slice, the SAME shingle construction as the
    * batch op) verify against the standing index by position adjacency
    * (w1@p, w2@p+1, w3@p+2), so the TRAINING corpus is never
    * re-tokenized or scanned — the plan a 100 TB decontamination sweep
    * needs, where the benchmark suite is tiny and the corpus is not.
    * Output = the contaminated training doc_ids, identical to the batch
    * op (they share one oracle).
    *
    * Cost shape: step 1 fans each matching posting row out per probe
    * sharing its leading word — a probe-set-sized multiplier, never
    * corpus-sized; steps 2–3 are doc-keyed equijoins whose surviving
    * start-position intersections shrink monotonically.
    *
    * Honest crossover (the bench row says so): at fixture scale the
    * batch op WINS (~0.6 s vs ~1.9 s) — re-tokenizing a 5 000-doc
    * corpus is cheaper than the probe fan-out joins. This op exists for
    * the opposite regime, corpus ≫ benchmark suite, where the batch op
    * re-reads and re-shingles the whole corpus per decontamination
    * sweep and this one reads only probe-term postings. */
  def contaminationServed(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedLexIndex(spark, dir)
    // localCheckpoint the probe frame: the three termFrame union arms AND
    // the j1 broadcast each re-derived the tokenize→shingle→distinct
    // chain (4 derivations). The frame is |distinct probe 3-grams| rows —
    // benchmark-suite-sized by construction, never corpus-sized.
    val probes = Tables.documents(spark, dir).filter(col("doc_id") < 50)
      .select(explode(SimilarityQueries.shingleColPublic(
        wordTokens(col("text")))).as("sh"))
      .distinct()
      .select(split(col("sh"), " ").as("g"))
      .select(element_at(col("g"), 1).as("w1"),
        element_at(col("g"), 2).as("w2"), element_at(col("g"), 3).as("w3"))
      .localCheckpoint(true)
    // ONE pass over the postings: semi-join to the probe vocabulary and
    // materialize — the three per-word steps reuse the probe-term
    // posting frame instead of re-scanning the posting table three
    // times. At fixture scale this is a wash (the test slice shares the
    // corpus vocabulary, so the semi-join filters little); at corpus ≫
    // benchmark-suite scale the probe vocabulary is a sliver and this
    // is the difference between one bounded read and three full ones.
    val termFrame = probes.select(col("w1").as("t"))
      .union(probes.select(col("w2")))
      .union(probes.select(col("w3"))).distinct()
    val post = spark.read.parquet(s"$idx/postings")
      .filter(col("doc_id") >= 50)
      .join(broadcast(termFrame), col("tok") === col("t"), "left_semi")
      .select(col("tok"), col("doc_id"), col("posns"))
      .localCheckpoint(true)
    val p1 = post.select(col("tok").as("t1"), col("doc_id"), col("posns").as("ps1"))
    val p2 = post.select(col("tok").as("t2"), col("doc_id"), col("posns").as("ps2"))
    val p3 = post.select(col("tok").as("t3"), col("doc_id"), col("posns").as("ps3"))
    val j1 = p1.join(broadcast(probes), col("t1") === col("w1"))
    val j2 = j1.join(p2, j1("doc_id") === p2("doc_id") && col("t2") === col("w2"))
      .withColumn("cur",
        array_intersect(transform(col("ps1"), x => x + 1), col("ps2")))
      .filter(size(col("cur")) > 0)
      .select(j1("doc_id").as("doc_id"), col("w3"), col("cur"))
    val j3 = j2.join(p3, j2("doc_id") === p3("doc_id") && col("t3") === col("w3"))
      .filter(arrays_overlap(transform(col("cur"), x => x + 1), col("ps3")))
    j3.select(j2("doc_id")).distinct()
  }

  /** `bm25_maxp`: max-passage retrieval over a persisted CHUNK-level
    * index — the standard long-document recipe (score passages, a
    * document scores as its best passage): the corpus chunks through
    * [[TextQueries.chunkText]]'s 50-token/40-step windows, each chunk
    * indexes as a pseudo-document (cid = doc_id·1000 + chunk_id — the
    * fixture's docs chunk far below 1000), the 5-term query scores
    * chunks through the SAME served multi-term chain, and the doc
    * rollup is a per-doc argmax over chunk totals (a selection —
    * oracle-exact, no new arithmetic). BM25 stats are CHUNK-corpus
    * stats by construction (n_chunks, chunk lengths) — the semantics
    * passage retrieval wants. Output: top-10 docs with their best
    * chunk. */
  def bm25Maxp(spark: SparkSession, dir: String): DataFrame = {
    val idx = SimilarityQueries.servedIndexWith(dir, "lexidx_chunk",
        lexStamp(spark, dir)) { p =>
      buildLexIndexFrom(spark,
        TextQueries.chunkText(spark, dir)
          .select((col("doc_id") * 1000 + col("chunk_id")).as("doc_id"),
            col("chunk_text").as("text")), p)
    }
    val perChunk = multitermTotals(
      serveTermScores(spark, idx, QueryTerms, loadStats(spark, idx)))
    val wDoc = Window.partitionBy(col("ddoc"))
      .orderBy(col("score").desc, col("chunk_id").asc)
    val best = perChunk
      .select(expr("doc_id div 1000").as("ddoc"),
        pmod(col("doc_id"), lit(1000L)).as("chunk_id"),
        col("n_terms"), col("score"))
      .withColumn("crn", row_number().over(wDoc))
      .filter(col("crn") === 1)
      .select(col("ddoc").as("doc_id"), col("chunk_id"), col("n_terms"),
        col("score"))
    best.orderBy(col("score").desc, col("doc_id").asc).limit(10)
      .withColumn("rk", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id").asc)).cast("long"))
      .select(col("doc_id"), col("chunk_id"), col("n_terms"), col("score"),
        col("rk"))
  }

  /** `hybrid_served`: [[CurationQueries.rankFusion]]'s production twin —
    * reciprocal-rank fusion where BOTH arms come from PERSISTED indexes
    * instead of corpus scans: the lexical arm is BM25 for "vector" from
    * the inverted index (bit-identical to the scratch arm — shared
    * longs, shared expression tree), the semantic arm is the IVF-SERVED
    * top-50 for query vector 0 (approximate by design — the index's
    * probed-bucket candidates, exactly what production hybrid search
    * fuses). RRF k = 60; every fused score is two deterministic
    * divisions and ONE fixed-order addition — oracle-exact; the oracle
    * recomputes the IVF arm through the shared routing CTE chain.
    *
    * Scale: each arm prunes to 50 rows via TakeOrderedAndProject before
    * the fuse; the lexical arm reads one slot directory, the semantic
    * arm reads the probed bucket directories — neither scans a corpus. */
  def hybridServed(spark: SparkSession, dir: String): DataFrame =
    hybridServedBy(spark, dir, facetPred = None)

  /** `hybrid_filtered`: the FULL production retrieval shape in one
    * query — hybrid (RRF over the persisted lexical + IVF indexes) with
    * the SAME facet applied to BOTH arms, filter-first: each arm's
    * candidates screen against the facet allowlist BEFORE that arm's
    * rank window, so both top-50s fill among qualifying documents and
    * the fused ranks are ranks WITHIN the facet (post-filtering fused
    * output would instead underfill and carry unfaceted ranks). The
    * allowlist is ONE partition-pruned read of the lexical index's
    * attrs sidecar (the doc-attribute axis; doc_id ≡ vec_id in the
    * fixture, so the same allowlist screens the vector arm's posting
    * rows — the vector index's own sidecar carries the label axis,
    * which is a different facet). BM25/cosine values are bit-identical
    * to the unfiltered arms on facet survivors — only ranks shift. */
  def hybridFiltered(spark: SparkSession, dir: String): DataFrame =
    hybridServedBy(spark, dir, facetPred = Some(col("lang") === "en"))

  private def hybridServedBy(spark: SparkSession, dir: String,
      facetPred: Option[org.apache.spark.sql.Column]): DataFrame = {
    val lexIdx = servedLexIndex(spark, dir)
    // the facet allowlist: one partition-pruned attrs read, screening
    // BOTH arms (semi-joins dedup by construction)
    val allowed = facetPred.map { p =>
      spark.read.parquet(s"$lexIdx/attrs").filter(p)
        .select(col("doc_id").as("_facet_doc"))
    }
    val lexScreen: DataFrame => DataFrame = df => allowed match {
      case None => df
      case Some(a) => df.join(a, df("doc_id") === a("_facet_doc"), "left_semi")
    }
    val vidScreen: DataFrame => DataFrame = df => allowed match {
      case None => df
      case Some(a) => df.join(a, df("vid") === a("_facet_doc"), "left_semi")
    }
    val byScore = Seq(col("score").desc, col("doc_id").asc)
    val lex = lexScreen(serveTermScores(spark, lexIdx, Seq("vector"),
        loadStats(spark, lexIdx)))
      .orderBy(byScore: _*).limit(50)
      .withColumn("bm_rk", row_number().over(Window.orderBy(byScore: _*)).cast("long"))
      .select(col("doc_id"), col("bm_rk"))
    val byCos = Seq(col("cos").desc, col("vid").asc)
    val sem = SimilarityQueries.annIvfServedTopK(spark, dir, qid = 0L, k = 50,
        docFilter = vidScreen)
      .orderBy(byCos: _*).limit(50)
      .withColumn("cos_rk", row_number().over(Window.orderBy(byCos: _*)).cast("long"))
      .select(col("vid").as("doc_id"), col("cos_rk"))
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60.0) + col("bm_rk").cast("double")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("cos_rk").cast("double")), lit(0.0)))
      .withColumn("rk",
        row_number().over(Window.orderBy(col("rrf").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rk") <= 20)
      .select(col("doc_id"), col("bm_rk"), col("cos_rk"), col("rrf"), col("rk"))
  }

  /** The base+append grown index behind `bm25_appended` and
    * `bm25_grown_maxscore` — built once per fixture under the shared
    * cache discipline (both consumers serve the SAME physical index, so
    * the bench prices serving, not a duplicate build). */
  private def appendedLexIndex(spark: SparkSession, dir: String): String =
    SimilarityQueries.servedIndexWith(dir, "lexidx_app",
        lexStamp(spark, dir)) { p =>
      buildLexIndexFrom(spark,
        Tables.documents(spark, dir).filter(col("doc_id") % 4 =!= 0), p)
      appendLexIndex(spark,
        Tables.documents(spark, dir).filter(col("doc_id") % 4 === 0), p)
    }

  /** `bm25_appended`: per-term top-10 from an index built on the BASE
    * slice (doc_id % 4 != 0) then grown with the delta slice under the
    * FROZEN lexicon — the oracle recomputes df/stats over the base slice
    * and tf over everything, pinning the staleness contract exactly. */
  def bm25Appended(spark: SparkSession, dir: String): DataFrame = {
    val idx = appendedLexIndex(spark, dir)
    perTermTop10(serveTermScores(spark, idx, QueryTerms, loadStats(spark, idx)))
  }

  /** `bm25_filtered`: FACETED retrieval from the persisted index —
    * [[SimilarityQueries.filteredAnn]]'s lexical twin, and the
    * production lexical query shape (retrieval is almost always scoped:
    * a language, a source, a license class): the 5-term top-10
    * restricted to `lang = 'en'` documents with FILTER-FIRST semantics
    * — the predicate lands before the top-k, so k fills among
    * qualifying docs whenever k exist (post-filtering a global top-k
    * cannot give that). BM25 statistics stay CORPUS-wide (frozen
    * df/stats — the standard faceted-search semantics: the facet scopes
    * the result set, not the ranking model), so scores are bit-identical
    * to the unfiltered serve and the oracle reuses the multiterm chain
    * with only the candidate filter added.
    *
    * Plan: the facet's allowlist is a PARTITION-PRUNED read of the
    * `attrs/` sidecar (lang=en directory only, two thin columns, zero
    * text bytes) semi-joined into the slot-pruned scored rows —
    * un-hinted, so AQE broadcasts the facet when small and
    * shuffle-joins when a facet spans the corpus. For very hot
    * low-cardinality facets the next step up is facet-partitioned
    * postings; the sidecar keeps ONE posting layout while making every
    * facet's allowlist read O(facet), which is the right default. */
  def bm25Filtered(spark: SparkSession, dir: String): DataFrame =
    bm25FilteredBy(spark, dir, col("lang") === "en")

  /** `bm25_filtered_source`: the SOURCE-scoped facet twin — the
    * takedown/licensing retrieval shape ("answer only from source X"):
    * same filter-first semantics and corpus-frozen ranking model, the
    * allowlist pruned at the attrs tree's SECOND partition level
    * (`source=` leaf directories under every lang). One query shape,
    * two independently-pruned facet axes. */
  def bm25FilteredSource(spark: SparkSession, dir: String): DataFrame =
    bm25FilteredBy(spark, dir, col("source") === "src3")

  /** The source the *_source_retired rows take down — deliberately NOT
    * `bm25_filtered_source`'s src3, so the facet-serve and facet-retire
    * rows exercise disjoint slices; src12 touches near-dup pairs at
    * every gated SF, so the LSH retire row is never vacuous. */
  private[graft] val RetiredSource = "src12"

  /** `bm25_source_retired`: serve AFTER a facet-scoped takedown
    * ([[deleteLexSource]]) — the other half of the licensing shape
    * (`bm25_filtered_source` answers FROM one source; this one retires
    * a source and answers from everything else). Tombstones resolved
    * from the sidecar's `source=` leaves, zero posting reads; serving is
    * the plain tombstone-aware multiterm chain with df/stats frozen at
    * the full-corpus build — exactly what the oracle recomputes by
    * restricting candidates to the complement. */
  def bm25SourceRetired(spark: SparkSession, dir: String): DataFrame = {
    val idx = SimilarityQueries.servedIndexWith(dir, "lexidx_srcdel",
        s"${lexStamp(spark, dir)};srcdel=$RetiredSource") { p =>
      buildLexIndex(spark, dir, p)
      deleteLexSource(spark, p, RetiredSource)
    }
    rankTop10(multitermTotals(serveTermScores(spark, idx, QueryTerms,
      loadStats(spark, idx), tombstoneAware = true)))
  }

  /** `facet_profile`: the operator's pre-flight view of the facet tree
    * — per-(lang, source) doc counts straight from the served index's
    * attrs sidecar (partition columns + one thin id column, never a
    * text byte; the corpus is not in the plan). This is the number a
    * facet-scoped QUERY will read and a facet-scoped TAKEDOWN
    * ([[deleteLexSource]]) would retire — the capacity/impact check an
    * operator runs before either; also the sidecar's own audit (the
    * oracle recomputes the counts from the corpus, so a writer that
    * dropped or duplicated facet rows hash-mismatches here). */
  def facetProfile(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedLexIndex(spark, dir)
    spark.read.parquet(s"$idx/attrs")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** The shared faceted-serving chain: a partition-pruned attrs read
    * under `facetPred` (any predicate over the lang/source partition
    * columns — both levels prune), screened into the slot-pruned scored
    * rows BEFORE the fold and top-k via [[facetScreen]]. */
  private def bm25FilteredBy(spark: SparkSession, dir: String,
      facetPred: org.apache.spark.sql.Column): DataFrame = {
    val idx = servedLexIndex(spark, dir)
    val scored = facetScreen(spark, idx, facetPred)(
      serveTermScores(spark, idx, QueryTerms, loadStats(spark, idx)))
    rankTop10(multitermTotals(scored))
  }

  /** Threshold for the facet-allowlist SCAN-PUSHDOWN experiment: at or
    * below this many allowlisted docs, [[facetScreen]] collects the ids
    * and pushes a literal doc_id filter into the posting scan instead
    * of semi-joining. MEASURED OFF (0) by default: LexAbXl's 200 k-doc
    * fixture (bench_records/r16_lexabxl.txt) shows the pushdown
    * LOSES at both selectivities — 0.91 s vs the semi-join's 0.77 s at
    * a 100-doc facet over a 1 M-row matched posting set (the posting
    * rows are slot-pruned but doc_id-UNSORTED within files, so the
    * literal filter skips no row group and just pays per-row predicate
    * evaluation against a broadcast hash probe that was already cheap),
    * and catastrophically at a broad facet (12.4 s vs 1.14 s: a 200 k-
    * literal predicate bloats the plan). The MaxScore-pruning lesson
    * again: a doc-at-a-time engine's "prune the read" instinct does not
    * transfer to a batch engine whose read was already partition-pruned
    * — so the default is the measured winner (semi-join, always), and
    * the seam + threshold remain for a future doc_id-clustered posting
    * layout where row-group skipping would have teeth. */
  private[graft] val FacetPushdownMaxIds: Long = 0L

  /** The facet screen every faceted lexical path shares: allowlist from
    * one partition-pruned attrs read; small facets push down as literal
    * id filters, large ones semi-join (see [[FacetPushdownMaxIds]]).
    * Lossless either way — FacetPushSpec pins both plans bit-identical. */
  private[graft] def facetScreen(spark: SparkSession, indexPath: String,
      facetPred: org.apache.spark.sql.Column,
      pushdownMaxIds: Long = FacetPushdownMaxIds): DataFrame => DataFrame = {
    val allowed = spark.read.parquet(s"$indexPath/attrs")
      .filter(facetPred).select(col("doc_id"))
    // the size probe reads ONLY the pruned facet directory's doc_id
    // column and stops counting at the threshold — bounded driver work
    // whatever the facet's true size
    val small = pushdownMaxIds > 0 &&
      allowed.limit(pushdownMaxIds.toInt + 1).count() <= pushdownMaxIds
    if (small) {
      val ids = allowed.collect().map(_.getLong(0)).toIndexedSeq
      df => df.filter(col("doc_id").isin(ids: _*))
    } else {
      val f = allowed.select(col("doc_id").as("_facet_doc"))
      df => df.join(f, df("doc_id") === col("_facet_doc"), "left_semi")
    }
  }

  /** `bm25_grown_maxscore`: the MaxScore entry point asked to serve the
    * GROWN index — the query that hash-gates the bound-staleness
    * contract itself. The append left `_bounds_stale` standing, so
    * [[maxscoreFromIndex]] must refuse the pruned plan and answer
    * through the exact unpruned fallback; the oracle recomputes the
    * multi-term top-10 with df/stats FROZEN at the base slice and tf
    * over the grown corpus — the answer only the fallback produces
    * (lossy pruning against the stale bounds would drop any delta doc
    * whose score outgrew its term's frozen ub). */
  def bm25GrownMaxscore(spark: SparkSession, dir: String): DataFrame =
    maxscoreFromIndex(spark, appendedLexIndex(spark, dir)).result

  /** `bm25_deleted`: per-term top-10 serving AROUND the fixed takedown
    * batch — tombstone anti-join, zero posting files rewritten; the
    * oracle excludes the same literal ids with df/stats frozen at the
    * full-corpus build. */
  def bm25Deleted(spark: SparkSession, dir: String): DataFrame = {
    val idx = SimilarityQueries.servedIndexWith(dir, "lexidx_del",
        lexStamp(spark, dir)) { p =>
      buildLexIndex(spark, dir, p)
      deleteLexDocs(spark, p, DeletedIds)
    }
    perTermTop10(serveTermScores(spark, idx, QueryTerms,
      loadStats(spark, idx), tombstoneAware = true))
  }
}
