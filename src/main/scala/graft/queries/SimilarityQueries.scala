package graft.queries

import graft.functions.TextFunctions._
import graft.functions.VectorOps._
import graft.sources.Tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search + near-duplicate detection — the north-star LLM
  * pipeline operators over `embeddings` (ANN) and `documents`
  * (MinHash-LSH / n-gram Jaccard).
  *
  * Scale design (100 TB): NOTHING here is an all-pairs cross join over the
  * corpus. The brute-force path broadcasts only the (small) query set; the
  * ANN path is IVF — a broadcast join against k centroids, then a shuffle
  * join on bucket id; LSH candidates come from a band-signature equijoin;
  * Jaccard runs only on pruned candidate pairs. Every shuffle key is a
  * compact id/signature, never a document body or raw vector.
  */
object SimilarityQueries {

  /** Number of top results per query vector. */
  private val K = 5

  /** Per-vector L2 norm precomputed ONCE per vector — cosine between a
    * pair then needs a single dot-product fold instead of three (measured
    * 3× on the ANN queries; the norm CTE in the oracle mirrors this, and
    * dot/(na·nb) is the same IEEE arithmetic wherever the norms were
    * computed). */
  private def withNorm(e: DataFrame): DataFrame =
    e.withColumn("nrm", normD(col("embedding")))

  /** Brute-force cosine top-k — the exact baseline. The query set
    * (`vec_id < 10`) is broadcast; the corpus streams past it, so the scan
    * side scales out and the per-query top-k is a keyed window over a
    * 10-partition shuffle. */
  def knnCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("qemb"), col("nrm").as("qnrm"))
      .filter(col("qid") < 10)
    val scored = e
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", dotD(col("qemb"), col("embedding")) / (col("qnrm") * col("nrm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("qid"), col("vec_id").as("vid"), col("cos"))
  }

  /** Filtered (predicate-constrained) exact kNN — the composition every
    * production vector store is judged on: "nearest neighbors of q AMONG
    * rows where label ∈ S". Post-filtering an unfiltered top-k UNDERFILLS
    * (if only 2 of the global top-10 satisfy the predicate, the user gets
    * 2, not 10); the correct plan filters FIRST, at the scan — the
    * predicate prunes before any distance is computed, and the top-k
    * window ranks only qualifying rows, so every query returns its full
    * k whenever k qualifying rows exist. Same broadcast-query +
    * WindowGroupLimit shape as [[knnCosine]], plus the parquet-pushed
    * label filter ([[graft.PlanSpec]] asserts it reaches the scan).
    *
    * Scale: candidate side is one filtered scan (selectivity × corpus);
    * queries broadcast; the window partitions by query. */
  def filteredAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("qemb"),
      col("nrm").as("qnrm"), col("label").as("qlabel"))
      .filter(col("qid") < 10)
    // the predicate: same-label neighbors only — the "filtered search"
    // a labeled corpus asks for (swap any pushable predicate in)
    val scored = e
      .join(broadcast(q),
        col("vec_id") =!= col("qid") && col("label") === col("qlabel"))
      .withColumn("cos", dotD(col("qemb"), col("embedding")) / (col("qnrm") * col("nrm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    scored
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("qid"), col("qlabel").as("label"),
        col("vec_id").as("vid"), col("cos"),
        col("rn").cast("long").as("rk"))
  }

  /** IVF index parameters. k is FIXED — the whole point: the centroid set
    * must broadcast at ANY corpus size, and assignment work must be O(N·k),
    * never a corpus-fraction (the round-4 `vec_id % 50` policy made
    * k = N/50, i.e. O(N²/50) assignment and an unboundedly growing
    * broadcast — the one shape that dies first at 100 TB). Production
    * would use k-means centroids; a deterministic hash-ordered sample is
    * the dependency-free stand-in with the same plan shape. */
  private[graft] val IvfK = 64

  /** Buckets probed per QUERY vector. nprobe > 1 recovers the recall a
    * bounded k gives up: a query near a Voronoi boundary also searches its
    * runner-up centroid's bucket. Candidates still index under their top-1
    * bucket only, so the candidate side never duplicates. */
  private[graft] val IvfNprobe = 2

  /** IVF bucket assignment, zero-shuffle: the k centroids (smallest
    * md5(vec_id) — a deterministic pseudo-random sample) are folded into a
    * ONE-ROW array via TakeOrderedAndProject + collect_list, broadcast to
    * every scan partition, and each vector ranks them with an in-row
    * array_sort — no N×k window shuffle, no per-vector aggregation, just a
    * narrow map over the corpus scan. Output: top-1 `bucket` (candidate
    * side) and top-nprobe `probe_buckets` (query side).
    *
    * Not cached: with bounded k the assignment is a cheap narrow map, so
    * consumers that use it twice recompute rather than leak a
    * session-lifetime cache entry (round-4 verdict finding #3). */
  /** The k coarse centroids as a ≤k-row frame (cid, cemb, cnrm) — the
    * deterministic md5-ordered sample shared by [[ivfAssign]] and the
    * IVF+PQ composite's residual computation ([[ivfPqAnn]]). */
  private def ivfCentFrame(e: DataFrame): DataFrame =
    e.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(IvfK)
      .select(col("vec_id").as("cid"), col("embedding").as("cemb"),
        col("nrm").as("cnrm"))

  private[graft] def ivfAssign(spark: SparkSession, dir: String,
      nprobe: Int = IvfNprobe): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val cent = ivfCentFrame(e)
      .agg(collect_list(struct(
        col("cid"), col("cemb"), col("cnrm")
      )).as("cents"))
    assignFromCents(e, cent, nprobe)
  }

  /** Route vectors against a one-row broadcast centroid-array frame —
    * the shared core of [[ivfAssign]] (in-session training) and
    * [[annIvfServe]] (routing against a PERSISTED index): per-row scores
    * over the centroid array; the argmax is order-independent (strict
    * total order: ccos desc NULLS LAST, cid asc — cids are unique), so
    * the nondeterministic collect_list order cannot leak into the
    * result. The explicit NULL branches in the shared comparator keep
    * the order total even for a NULL cosine (e.g. a NULL embedding
    * element), matching DuckDB's ORDER BY ... DESC default of NULLS
    * LAST; without them every ccos comparison on a NULL is false and
    * the sort would fall through to cid — a different bucket per
    * engine. */
  private def assignFromCents(e: DataFrame, cent: DataFrame,
      nprobe: Int = IvfNprobe): DataFrame = {
    val scored = transform(col("cents"), c =>
      struct(
        (dotD(col("embedding"), c("cemb")) / (col("nrm") * c("cnrm"))).as("ccos"),
        c("cid").as("cid")))
    e.join(broadcast(cent))
      .withColumn("probes", slice(array_sort(scored, byCosDescCidAscCmp), 1, nprobe))
      .select(
        col("vec_id"), col("embedding"), col("nrm"),
        element_at(col("probes"), 1)("cid").as("bucket"),
        transform(col("probes"), p => p("cid")).as("probe_buckets"))
  }

  /** Persist the IVF index: centroids as a k-row frame, postings
    * PARTITIONED BY bucket — the train-once/serve-many layout every
    * bench-row caveat about "re-trains from scratch per run" points at.
    * Partitioning the postings by bucket makes the serving join
    * DYNAMIC-PARTITION-PRUNABLE: a query batch probing 20 buckets reads
    * 20 directories of the index, not the corpus. */
  def buildIvfIndex(spark: SparkSession, dir: String, indexPath: String): Unit =
    buildIvfIndexFrom(withNorm(Tables.embeddings(spark, dir)), indexPath,
      docSrc = Some(docSrcOf(spark, dir)))

  /** [[buildIvfIndex]] generic over the vector source — the same
    * centroid-sample + bucket-partitioned-postings layout over ANY
    * normed (vec_id, embedding, nrm) frame (the in-engine hash-embedded
    * corpus indexes through here too). */
  private def buildIvfIndexFrom(e: DataFrame, indexPath: String,
      docSrc: Option[DataFrame] = None): Unit = {
    val cents = ivfCentFrame(e)
    cents.write.mode("overwrite").parquet(s"$indexPath/centroids")
    val centRow = cents.agg(collect_list(struct(
      col("cid"), col("cemb"), col("cnrm"))).as("cents"))
    assignFromCents(e, centRow)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$indexPath/postings")
    writeIdMapFromPostings(e.sparkSession, indexPath)
    writeVecAttrs(e, indexPath, "overwrite", docSrc)
  }

  /** Serve [[annIvf]]'s query from a PERSISTED index: route the query
    * vectors with the stored centroids (no training work), equijoin the
    * bucket-partitioned postings — Spark's dynamic partition pruning
    * reads only the probed buckets' directories (the broadcast query
    * side seeds the partition filter at runtime), which is the serving
    * cost model an ANN index exists for: O(query × probed-bucket), not
    * O(corpus). Result is bit-identical to [[annIvf]] (same centroids,
    * same routing argmax, same cosine and top-3 window). */
  def annIvfServe(spark: SparkSession, dir: String, indexPath: String,
      nprobe: Int = IvfNprobe): DataFrame =
    ivfServeFrom(spark, withNorm(Tables.embeddings(spark, dir)), indexPath, nprobe)

  /** [[annIvfServe]] generic over the query-vector source — any normed
    * (vec_id, embedding, nrm) frame serves through the same persisted
    * layout, so the model-embedded fixture and the in-engine
    * [[hashEmbedVectors]] corpus share one serving plan (routing against
    * the stored centroids, bucket equijoin against the
    * dynamic-partition-pruned postings, top-3 window). */
  private def ivfServeFrom(spark: SparkSession, e: DataFrame,
      indexPath: String, nprobe: Int = IvfNprobe,
      postingsFilter: DataFrame => DataFrame = identity): DataFrame =
    serveAgainstIndex(spark, e.filter(col("vec_id") < 10),
      loadCentRow(spark, indexPath), indexPath, nprobe, postingsFilter)

  /** The stored centroid set folded to the ONE-ROW broadcastable array
    * frame — loaded once per serving session (centroids are frozen for
    * the life of the index; streaming serving caches this across
    * micro-batches, see [[graft.streaming.AnnServe]]). */
  private[graft] def loadCentRow(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(s"$indexPath/centroids")
      .agg(collect_list(struct(
        col("cid"), col("cemb"), col("cnrm")
      )).as("cents"))

  /** The serving CORE shared by every batch and streaming entry point:
    * route the (already normed, already scoped) query frame against the
    * pre-loaded one-row centroid array, equijoin the probed buckets'
    * bucket-partitioned postings (dynamic partition pruning gates the
    * read to the probed directories), per-query top-3 window. */
  private[graft] def serveAgainstIndex(spark: SparkSession, queries: DataFrame,
      centRow: DataFrame, indexPath: String, nprobe: Int = IvfNprobe,
      postingsFilter: DataFrame => DataFrame = identity,
      k: Int = 3, excludeSelf: Boolean = true): DataFrame = {
    val q = assignFromCents(queries, centRow, nprobe)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
        col("nrm").as("qnrm"), explode(col("probe_buckets")).as("qbucket"))
    val postings = postingsFilter(spark.read.parquet(s"$indexPath/postings")
      .select(col("vec_id").as("vid"), col("embedding").as("cemb2"),
        col("nrm").as("cnrm2"), col("bucket")))
    // excludeSelf=false serves the raw unexcluded ranking — the shared
    // (deduped) serving path applies each duplicate's OWN self-exclusion
    // at fan-out time, which needs one extra candidate row per query
    val joinCond =
      if (excludeSelf) col("qbucket") === col("bucket") && col("qid") =!= col("vid")
      else col("qbucket") === col("bucket")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid").asc)
    postings.join(broadcast(q), joinCond)
      .withColumn("cos", dotD(col("qemb"), col("cemb2")) / (col("qnrm") * col("cnrm2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vid"), col("cos"))
  }

  /** One query vector's IVF-served top-k from the self-managing persisted
    * index — the semantic arm of [[LexQueries.hybridServed]]: same stored
    * centroids, routing, and cosine as [[annIvfServed]], with a
    * caller-chosen k (hybrid fusion wants 50, not 3). */
  /** `docFilter` is the faceted-hybrid seam: a candidate allowlist
    * screen (e.g. the lex attrs facet, doc_id ≡ vec_id in the fixture)
    * applied to the posting rows BEFORE the cosine and top-k —
    * filter-first, so the semantic arm's k fills among qualifying
    * vectors in the probed buckets. */
  private[graft] def annIvfServedTopK(spark: SparkSession, dir: String,
      qid: Long, k: Int,
      docFilter: DataFrame => DataFrame = identity): DataFrame = {
    val idx = servedIndex(spark, dir, "ivf")(buildIvfIndex(spark, dir, _))
    serveAgainstIndex(spark,
      withNorm(Tables.embeddings(spark, dir)).filter(col("vec_id") === qid),
      loadCentRow(spark, idx), idx, IvfNprobe, docFilter, k)
  }

  /** One micro-batch of STREAMING ANN serving — [[serveAgainstIndex]]
    * over a raw (vec_id, embedding) query batch: norm the batch, route
    * it, read only the probed buckets. With `tombstoneAware`, the
    * CURRENT tombstone set is re-read and anti-joined per batch, so a
    * takedown ([[ivfIndexDelete]]) lands on the very next micro-batch
    * without restarting the serving stream. Exposed for
    * [[graft.streaming.AnnServe]]'s foreachBatch. */
  /** `docFilter` is the faceted-serving seam ([[facetPostingsFilter]] —
    * [[graft.queries.LexQueries.queryBatch]]'s twin): a candidate
    * restriction composed OVER the tombstone screen, applied to the
    * posting rows before any distance or top-k — filter-first, so k
    * fills among qualifying vectors and surviving scores are
    * bit-identical to the unfiltered serve. */
  private[graft] def serveQueryBatch(spark: SparkSession, queryVecs: DataFrame,
      centRow: DataFrame, indexPath: String, nprobe: Int = IvfNprobe,
      tombstoneAware: Boolean = false, shareResults: Boolean = true,
      docFilter: DataFrame => DataFrame = identity,
      k: Int = 3): DataFrame = {
    val screen: DataFrame => DataFrame =
      p => docFilter(tombstonePostingsFilter(spark, indexPath, tombstoneAware)(p))
    if (!shareResults)
      serveAgainstIndex(spark, withNorm(queryVecs), centRow, indexPath, nprobe,
        screen, k)
    else shareByEmbedding(queryVecs, k = k,
      rankCols = Seq(col("cos").desc, col("vid").asc),
      payload = Seq("vid", "cos")) { reps =>
      serveAgainstIndex(spark, withNorm(reps), centRow, indexPath, nprobe,
        screen, k = k + 1, excludeSelf = false)
    }
  }

  /** RESULT SHARING for the vector serving edges — the
    * [[LexQueries.queryBatch]] signature-grouping trick ported to
    * embedding queries: an ANN answer depends only on the query's
    * VECTOR, so a micro-batch dedupes to its distinct embeddings
    * (exact bytes — Spark groups float arrays element-wise, NaN-safe),
    * each distinct vector is routed and scored ONCE against the index,
    * and the per-vector answers fan back to every asking qid through a
    * broadcast join. Production query streams are head-skewed; without
    * this every duplicate re-pays routing + the probed-bucket candidate
    * join. Worst case (all-distinct) adds one batch-sized groupBy and
    * one broadcast join — noise against the posting read.
    *
    * Exactness (StreamingSpec pins shared == unshared bit for bit): the
    * rep serves UNEXCLUDED top-(k+1); for any qid sharing the vector,
    * dropping its own vid from that list shifts ranks by at most one,
    * so its exact excluded top-k is a subset — scores are computed once
    * per vector from the identical expression, hence bit-identical.
    *
    * `serve` must return (qid, <payload...>) rows ranked by `rankCols`
    * semantics with AT LEAST k+1 rows kept per rep qid and NO self
    * exclusion applied. */
  private def shareByEmbedding(queryVecs: DataFrame, k: Int,
      rankCols: Seq[Column], payload: Seq[String],
      emitRank: Option[String] = None)(
      serve: DataFrame => DataFrame): DataFrame = {
    val reps = queryVecs.groupBy(col("embedding"))
      .agg(min(col("vec_id")).as("vec_id"))
      .select(col("vec_id"), col("embedding"))
    val repRes = serve(reps).withColumnRenamed("qid", "rep_qid")
      .drop(emitRank.toSeq: _*) // the rep's rank is recomputed per qid
    val mapping = queryVecs
      .select(col("vec_id").as("out_qid"), col("embedding"))
      .join(reps.select(col("vec_id").as("rep_id"), col("embedding")),
        "embedding")
      .select(col("out_qid"), col("rep_id"))
    val w = Window.partitionBy(col("out_qid")).orderBy(rankCols: _*)
    val ranked = mapping.join(broadcast(repRes), col("rep_id") === col("rep_qid"))
      .filter(col("vid") =!= col("out_qid")) // each duplicate's OWN exclusion
      .withColumn("_share_rn", row_number().over(w))
      .filter(col("_share_rn") <= k)
    val outCols = col("out_qid").as("qid") +: payload.map(col) ++:
      emitRank.map(n => col("_share_rn").cast("long").as(n)).toSeq
    ranked.select(outCols: _*)
  }

  /** The ATTRIBUTE sidecar rows faceted VECTOR retrieval filters on —
    * [[graft.queries.LexQueries.attrsRows]]'s embedding twin: one thin
    * (vec_id, label, source) row per indexed vector PARTITIONED BY
    * (label, source) — BOTH facet axes are partition levels (the
    * lex-v5 discipline), so a label facet prunes at level 1, a SOURCE
    * facet (the takedown/licensing shape applied to embeddings) at
    * level 2, and a combined predicate at the leaf: every facet's
    * allowlist is a partition-pruned read of one narrow column (never
    * an embedding byte or a code row) and costs one directory listing
    * at any corpus size. Tolerant of attribute-less frames (raw ingest
    * batches, the hash-embedded pseudo-corpus): a missing or null
    * label lands in the honest `-1` partition and a missing source in
    * `unk` — visible there rather than silently absent from every
    * facet. Maintained by EVERY writer (build, append, absorb, merge,
    * streamed ingest, compact purge), the same no-silent-staleness
    * stance as the lexical sidecar. */
  private[graft] def vecAttrsRows(vecs: DataFrame): DataFrame = {
    val lab = if (vecs.columns.contains("label"))
      coalesce(col("label").cast("long"), lit(-1L))
    else lit(-1L)
    val src = if (vecs.columns.contains("source"))
      coalesce(col("source").cast("string"), lit("unk"))
    else lit("unk")
    vecs.select(col("vec_id"), lab.as("label"), src.as("source"))
  }

  /** The vec-attrs tree's partition spec, shared by every writer. */
  private[graft] val VecAttrsPartCols: Seq[String] = Seq("label", "source")

  /** A sidecar read normalized to the two-axis (vec_id, label, source)
    * shape — partition columns read back with directory-name types, so
    * label re-pins to LONG; a shard written before the source axis
    * existed (pre-vec-v3) contributes honest `unk` rows rather than a
    * missing-column failure. */
  private def readAttrsTwoAxis(spark: SparkSession, attrsPath: String): DataFrame = {
    val a = spark.read.parquet(attrsPath)
    val src = if (a.columns.contains("source")) col("source").cast("string")
      else lit("unk")
    a.select(col("vec_id"), col("label").cast("long").as("label"),
      src.as("source"))
  }

  /** The thin (doc_id, source) map a SOURCE axis derives from —
    * doc_id ≡ vec_id ties each embedding to the document it was
    * computed from, so the documents table's source column becomes the
    * vector families' licensing/takedown facet ("retire every
    * embedding derived from source X"). Two narrow columns; the
    * sidecar join below never touches an embedding byte. */
  private[graft] def docSrcOf(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"),
      coalesce(col("source").cast("string"), lit("unk")).as("source"))

  /** Write-side sidecar maintenance shared by the vector-index writers.
    * Appenders write attrs BEFORE postings (the harmless crash
    * direction: a facet row without postings selects nothing — the
    * allowlist is a semi-join restriction — whereas postings without a
    * facet row would serve unfiltered yet be absent from every facet).
    *
    * `docSrc` attaches the SOURCE axis from a thin (doc_id, source)
    * map ([[docSrcOf]]) by an id equijoin on the SIDECAR rows only —
    * the vector frame's centroid/posting jobs never see the join, so
    * attaching source costs one narrow build-time shuffle in the
    * sidecar write and nothing anywhere else. Un-hinted: both sides
    * are corpus-scale-thin, AQE picks the join strategy. A vector with
    * no document row (or no docSrc at all) lands honestly in `unk`. */
  private def writeVecAttrs(vecs: DataFrame, indexPath: String,
      mode: String, docSrc: Option[DataFrame] = None): Unit = {
    val rows = vecAttrsRows(vecs)
    val out = docSrc match {
      case None => rows
      case Some(m) =>
        val mm = m.select(col("doc_id").as("_src_doc"),
          col("source").as("_src_val"))
        rows.drop("source")
          .join(mm, col("vec_id") === col("_src_doc"), "left")
          .select(col("vec_id"), col("label"),
            coalesce(col("_src_val"), lit("unk")).as("source"))
    }
    out.write.partitionBy(VecAttrsPartCols: _*).mode(mode)
      .parquet(s"$indexPath/attrs")
  }

  /** The FACETED-serving candidate screen for the vector families —
    * [[graft.queries.LexQueries.queryBatch]]'s `docFilter` seam in
    * postings-filter form: semi-join posting rows (`vid`) against the
    * facet's allowlist, a PARTITION-PRUNED read of the `attrs/`
    * sidecar's one label directory (two thin columns, zero embedding or
    * code bytes). Filter-FIRST semantics: the screen lands before any
    * distance/top-k, so k fills among qualifying vectors whenever k
    * exist in the probed buckets, and surviving scores are bit-identical
    * to the unfiltered serve (cosine/ADC are per-pair — no corpus
    * statistic shifts). Re-evaluated per call/micro-batch, so facet rows
    * landed by a concurrent append/ingest scope the next batch like
    * tombstones. */
  private[graft] def facetPostingsFilter(spark: SparkSession,
      indexPath: String, facetLabel: Option[Long],
      facetSource: Option[String] = None): DataFrame => DataFrame = {
    // both facet axes are attrs partition levels: a label facet prunes
    // at level 1, a source facet at level 2, a combined predicate at
    // the leaf — one allowlist read either way
    val preds = facetLabel.map(l => col("label") === l).toSeq ++
      facetSource.map(s => col("source") === s).toSeq
    if (preds.isEmpty) identity
    else {
      val attrs = new org.apache.hadoop.fs.Path(s"$indexPath/attrs")
      require(attrs.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(attrs),
        s"faceted serving: no attrs/ sidecar under $indexPath - the index " +
          "predates faceted serving; rebuild it (or append/absorb once, " +
          "which materializes facet rows for the delta) before serving " +
          "with a facet")
      val allowed = spark.read.parquet(attrs.toString)
        .filter(preds.reduce(_ && _)).select(col("vec_id").as("_facet_vid"))
      p => p.join(allowed, p("vid") === col("_facet_vid"), "left_semi")
    }
  }

  /** The per-batch tombstone screen shared by the streaming serving
    * paths: when enabled and tombstones exist, anti-join the posting
    * rows (`vid`) against the CURRENT broadcast tombstone set — re-read
    * per batch so a takedown lands on the next micro-batch with no
    * stream restart. The set is bounded by delete traffic since the
    * last compaction, never corpus size. */
  private def tombstonePostingsFilter(spark: SparkSession, indexPath: String,
      tombstoneAware: Boolean): DataFrame => DataFrame =
    if (tombstoneAware && {
      val p = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }) {
      val tombIds = broadcast(spark.read.parquet(s"$indexPath/tombstones")
        .select(col("vec_id").as("tomb_id")).distinct())
      p => p.join(tombIds, p("vid") === tombIds("tomb_id"), "left_anti")
    } else identity

  /** One micro-batch of STREAMING IVFPQ serving — [[ivfPqAnnServe]]'s
    * plan driven incrementally over a raw (vec_id, embedding) query
    * batch: norm + route the batch against the CACHED one-row centroid
    * array, build its ADC table from the CACHED codebooks (both frozen
    * for the life of the index — [[graft.streaming.PqServe]] loads them
    * once at stream start), and candidate-join only the probed buckets'
    * encoded postings (3 small ints per (vector, subspace) — the
    * compressed representation a 100 TB deployment actually serves
    * from). `cent` is the stored (pcid, cemb) centroid frame (query
    * residuals), `cb` the (cm, cid, cv, cself) codebook frame. With
    * `tombstoneAware`, the CURRENT tombstone set anti-joins the code
    * rows per batch ([[ivfPqIndexDelete]] lands next micro-batch, no
    * restart). */
  private[graft] def servePqQueryBatch(spark: SparkSession, queryVecs: DataFrame,
      centRow: DataFrame, cent: DataFrame, cb: DataFrame, indexPath: String,
      nprobe: Int = IvfNprobe, tombstoneAware: Boolean = false,
      shareResults: Boolean = true,
      docFilter: DataFrame => DataFrame = identity): DataFrame = {
    val enc = docFilter(tombstonePostingsFilter(spark, indexPath, tombstoneAware)(
      spark.read.parquet(s"$indexPath/postings")
        // partition column reads back INT (directory-name inference);
        // restore the join key's LONG type explicitly
        .select(col("vid"), col("m"), col("code"),
          col("bucket").cast("long").as("vbucket"))))
    if (!shareResults)
      ivfPqSearch(enc,
        ivfPqAdcTableFrom(assignFromCents(withNorm(queryVecs), centRow, nprobe),
          cent, cb))
    else shareByEmbedding(queryVecs, k = 3,
      rankCols = Seq(col("adist_fp").asc, col("vid").asc),
      payload = Seq("vid", "adist_fp"), emitRank = Some("rn")) { reps =>
      ivfPqSearch(enc,
        ivfPqAdcTableFrom(assignFromCents(withNorm(reps), centRow, nprobe),
          cent, cb),
        k = 4, excludeSelf = false)
    }
  }

  /** IVF-bucketed approximate top-k: each query searches its top-nprobe
    * centroids' buckets (explode of a 2-element array — a tiny fan-out on
    * the SMALL side only). The candidate join is an equijoin on bucket
    * id — at 100 TB this is the path that replaces the brute-force scan;
    * recall trades off via nprobe, not correctness of the plumbing.
    * Candidates index under their top-1 bucket and the probed buckets are
    * distinct centroids, so each (qid, vid) pair appears at most once —
    * no dedup needed after the join. */
  def annIvf(spark: SparkSession, dir: String): DataFrame =
    annIvfNprobe(spark, dir, IvfNprobe)

  /** [[annIvf]] with a caller-chosen probe width — nprobe is the recall
    * knob production IVF serves with (FAISS's `nprobe`): each query
    * searches its nprobe nearest coarse buckets instead of only the
    * top-1/2. The probe set stays k-bounded (≤ nprobe distinct cids per
    * query, exploded on the SMALL broadcast side only) and the candidate
    * join stays a bucket equijoin, so raising nprobe scales serving cost
    * linearly in probed-bucket volume — never back toward O(corpus). */
  def annIvfNprobe(spark: SparkSession, dir: String, nprobe: Int): DataFrame =
    ivfSearch(ivfAssign(spark, dir, nprobe))

  /** The IVF candidate join + cosine + top-3 over an assignment frame
    * (vec_id, embedding, nrm, bucket, probe_buckets) — shared by the
    * hash-sampled ([[annIvf]]) and k-means-trained ([[annIvfTrained]])
    * routings so the search semantics cannot diverge between them. */
  private def ivfSearch(assigned: DataFrame): DataFrame = {
    val q = assigned
      .filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
        col("nrm").as("qnrm"), explode(col("probe_buckets")).as("qbucket"))
    val cand = assigned
      .select(col("vec_id").as("vid"), col("embedding").as("cemb2"),
        col("nrm").as("cnrm2"), col("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid").asc)
    q.join(cand, col("qbucket") === col("bucket") && col("qid") =!= col("vid"))
      .withColumn("cos", dotD(col("qemb"), col("cemb2")) / (col("qnrm") * col("cnrm2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("vid"), col("cos"))
  }

  /** Feature-hashing dimensions for the in-engine text embedder. */
  private[graft] val HashEmbedDim = 32

  /** In-engine text embeddings by the hashing trick (Weinberger et al.
    * 2009): each word token hashes to one of [[HashEmbedDim]] buckets
    * with a ±1 sign from an independent hash bit; a document's vector is
    * the signed token-count fold — EXACT BIGINTs, so the embedding is
    * bit-identical across engines and partitionings (no model weights,
    * no floats until a consumer normalizes). This closes the pipeline
    * gap every other embedding operator here assumes away: the
    * `embeddings` fixture stands in for a model's output, but a corpus
    * bootstrap needs SOME vectorizer before any model exists, and the
    * hashing trick is the standard dependency-free one.
    *
    * Scale (100 TB): tokenize → narrow per-token hash math → ONE
    * map-combinable (doc, bucket) aggregation; the dense 32-cell
    * assembly is an in-row map fold. No joins, no text shuffle — the
    * same cost shape as token_count.
    *
    * The QUERY surface emits the dense grid as (doc_id, k, v) rows (the
    * oracle harness compares scalar columns); [[hashEmbedVectors]] is
    * the array-valued form consumers like [[hashEmbedKnn]] build on. */
  def hashEmbed(spark: SparkSession, dir: String): DataFrame =
    hashEmbedVectors(spark, dir)
      .select(col("doc_id"), posexplode(col("emb")))
      .select(col("doc_id"), col("pos").cast("long").as("k"), col("col").as("v"))

  private[graft] def hashEmbedVectors(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(wordTokens(col("text"))).as("tok"))
      .withColumn("j", pmod(md5Hash32(col("tok")), lit(HashEmbedDim.toLong)))
      .withColumn("s",
        when(pmod(md5Hash32(concat(lit("s:"), col("tok"))), lit(2L)) === 1L, 1L)
          .otherwise(-1L))
      .groupBy(col("doc_id"), col("j"))
      .agg(sum(col("s")).as("v"))
    cells.groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("j"), col("v")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0L), lit(HashEmbedDim - 1L)),
          k => coalesce(element_at(col("m"), k), lit(0L))).as("emb"))
  }

  /** Top-3 cosine retrieval over the [[hashEmbed]] vectors — proof the
    * in-engine embedder is USABLE for search, not just a profile: query
    * docs (doc_id < 10) broadcast against the corpus, integer dot
    * products (exact), IEEE sqrt norms, the same per-query top-k window
    * as [[knnCosine]]. Zero-norm documents (all buckets cancelled) are
    * excluded on both sides — cosine is undefined there, and the
    * exclusion is deterministic. */
  def hashEmbedKnn(spark: SparkSession, dir: String): DataFrame = {
    val e = hashEmbedVectors(spark, dir)
      .withColumn("dd", aggregate(col("emb"), lit(0L), (acc, x) => acc + x * x))
      .filter(col("dd") > 0L)
    val q = e.select(col("doc_id").as("qid"), col("emb").as("qemb"),
      col("dd").as("qdd")).filter(col("qid") < 10)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid").asc)
    e.select(col("doc_id").as("vid"), col("emb").as("cemb"), col("dd").as("cdd"))
      .join(broadcast(q), col("qid") =!= col("vid"))
      .withColumn("dot",
        aggregate(zip_with(col("qemb"), col("cemb"), (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
      .withColumn("cos",
        col("dot").cast("double") / (sqrt(col("qdd").cast("double")) * sqrt(col("cdd").cast("double"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("vid"), col("dot"), col("cos"))
  }

  /** The hash-embedded corpus shaped for the IVF machinery: signed-count
    * vectors cast to exact doubles (every |v| ≪ 2²⁶, so each product and
    * partial sum in the shared double fold is EXACT and engine-portable),
    * norm from the exact integer self-dot, zero-norm documents excluded
    * (cosine undefined — same exclusion as [[hashEmbedKnn]]). */
  private def hashEmbedNormed(spark: SparkSession, dir: String): DataFrame =
    hashEmbedVectors(spark, dir)
      .withColumn("dd", aggregate(col("emb"), lit(0L), (acc, x) => acc + x * x))
      .filter(col("dd") > 0L)
      .select(col("doc_id").as("vec_id"),
        transform(col("emb"), x => x.cast("double")).as("embedding"),
        sqrt(col("dd").cast("double")).as("nrm"))

  /** IVF-routed retrieval over the IN-ENGINE hash embeddings — closes the
    * embedder→index loop: [[hashEmbed]] proved in-engine vectorization
    * and [[hashEmbedKnn]] searched it exactly (O(corpus × queries));
    * this routes the same vectors through the bounded-k centroid argmax
    * + bucket equijoin + top-3 window of [[annIvf]], so corpus-scale
    * retrieval needs no external embedding model anywhere in the chain.
    * Same 100 TB shape as annIvf: ≤[[IvfK]]-row broadcast centroids, the
    * candidate join a bucket equijoin, never O(corpus²). */
  def hashEmbedAnn(spark: SparkSession, dir: String): DataFrame = {
    // NOT checkpointed, deliberately: the plan shows 4 documents scans
    // (centroid fold, query side, candidate side re-derive the embed
    // chain — branches share no subexpressions), but the query-side
    // branch pushes `vec_id < 10` BELOW the embed aggregate, so only 10
    // documents tokenize there; an eager checkpoint materializes the
    // FULL frame first and measured 15% SLOWER. The served twin
    // ([[hashEmbedAnnServed]]) is the production path where the corpus
    // never re-embeds at all.
    val e = hashEmbedNormed(spark, dir)
    val cent = ivfCentFrame(e)
      .agg(collect_list(struct(col("cid"), col("cemb"), col("cnrm"))).as("cents"))
    ivfSearch(assignFromCents(e, cent))
  }

  /** [[hashEmbedAnn]] served from a PERSISTED index over the hash
    * embeddings ([[buildIvfIndexFrom]] layout: centroid frame + postings
    * partitioned by bucket) — embed-once/serve-many: re-running a query
    * pays routing + a dynamic-partition-pruned posting read, never
    * re-tokenizing the corpus. Bit-identical to the in-session
    * [[hashEmbedAnn]] (same centroids, argmax, cosine fold, window). */
  def hashEmbedAnnServed(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndexWith(dir, "hashemb_ivf",
        s"${documentsStamp(spark, dir)};$VecLayoutVersion") {
      p => buildIvfIndexFrom(hashEmbedNormed(spark, dir), p)
    }
    // query vectors re-embed only the 10 query documents' text — the
    // corpus side comes entirely from the index
    ivfServeFrom(spark, hashEmbedNormed(spark, dir), idx)
  }

  /** Recall@3 of [[hashEmbedAnn]] against the exact [[hashEmbedKnn]]
    * top-3 — the same accuracy audit [[annRecall]] runs for the
    * model-embedded fixture, closing the loop's eval edge: every ANN
    * rollout over the in-engine embeddings gates on this number. */
  def hashEmbedAnnRecall(spark: SparkSession, dir: String): DataFrame = {
    // NOT checkpointed, deliberately: the two truth references are
    // identical subtrees, so the embed→knn chain's window exchange
    // dedupes via ReuseExchange; an eager checkpoint measured
    // 2.21 → 3.16 s (interleaved A/B at sf0.1).
    val exact3 = hashEmbedKnn(spark, dir).select(col("qid"), col("vid"))
    val approx3 = hashEmbedAnn(spark, dir).select(col("qid"), col("vid"))
    val hits = approx3.join(exact3, Seq("qid", "vid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
    exact3.groupBy(col("qid")).agg(count(lit(1)).as("k"))
      .join(hits, Seq("qid"), "left")
      .select(
        col("qid"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        col("k"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("k").cast("double")).as("recall"))
  }

  /** Persist the TRAINED IVF index — [[buildIvfIndex]] with
    * [[kmeansCentroids]] (2-round Lloyd's) in place of the hash-sampled
    * seeds: centroids as a ≤k-row frame, postings PARTITIONED BY the
    * trained bucket. Completes the production lifecycle matrix: train
    * (k-means, in-engine) → persist → serve-many / append. */
  def buildIvfIndexTrained(spark: SparkSession, dir: String, indexPath: String): Unit = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val cents = kmeansCentroids(spark, dir, rounds = 2)
    cents.write.mode("overwrite").parquet(s"$indexPath/centroids")
    val centRow = cents.agg(collect_list(struct(
      col("cid"), col("cemb"), col("cnrm"))).as("cents"))
    assignFromCents(e, centRow)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$indexPath/postings")
    writeIdMapFromPostings(spark, indexPath)
    writeVecAttrs(e, indexPath, "overwrite", Some(docSrcOf(spark, dir)))
  }

  /** [[annIvfTrained]] served from the PERSISTED trained index —
    * training cost paid once at build, every query thereafter is
    * routing + a dynamic-partition-pruned posting read
    * ([[annIvfServe]] is generic over the stored centroid frame, so the
    * trained and sampled indexes serve through the same plan);
    * oracle-pinned bit-identical to the in-session [[annIvfTrained]]. */
  def annIvfTrainedServed(spark: SparkSession, dir: String): DataFrame =
    annIvfServe(spark, dir,
      servedIndex(spark, dir, "ivf_tr")(buildIvfIndexTrained(spark, dir, _)))

  /** IVF top-3 routed by TRAINED centroids — [[annIvf]] upgraded from
    * the hash-sampled stand-in to real 2-round Lloyd's centroids
    * ([[kmeansCentroids]], the exact fixed-point chain kmeans_train2
    * pins bit-for-bit): the production index shape, where routing
    * quality comes from training rather than sampling luck. Same
    * bounded-k broadcast argmax, same bucket equijoin, same top-3
    * window — training changes WHERE vectors land, never how the
    * search executes; the oracle restates both Lloyd's rounds and the
    * probe ranking as CTEs and must agree on every (qid, vid, cos). */
  def annIvfTrained(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val cent = kmeansCentroids(spark, dir, rounds = 2)
      .agg(collect_list(struct(col("cid"), col("cemb"), col("cnrm"))).as("cents"))
    ivfSearch(assignFromCents(e, cent))
  }

  /** One distributed Lloyd's (k-means) iteration over the IVF
    * assignment: re-center each of the k buckets on the element-wise
    * mean of its members — the refinement step that turns the hash-
    * sampled seed centroids ([[ivfAssign]]'s stand-in) into real k-means
    * centroids; run it to a fixed point and the IVF index is trained
    * in-engine. Output: one row per (bucket, dimension) with the member
    * count and the new centroid coordinate.
    *
    * Scale (100 TB): assignment is the proven zero-shuffle narrow map;
    * the update is posexplode to (bucket, pos, v) — compact 20-byte
    * rows — then ONE hash shuffle on (bucket, pos), k·dim groups, fully
    * map-side-combinable. No iteration state lives on the driver.
    *
    * Exactness: float sums are order-dependent, so the mean is computed
    * from fixed-point quantized components — floor(v·10⁶) summed as
    * longs (exact, order-independent; |v|·10⁶ ≪ 2⁵³) with ONE IEEE
    * division at the end — the same exact-moments trick as
    * `stats_agg`, so the DuckDB oracle matches bit-for-bit. */
  def kmeansStep(spark: SparkSession, dir: String): DataFrame =
    ivfAssign(spark, dir)
      .select(col("bucket"), posexplode(col("embedding")))
      .groupBy(col("bucket"), (col("pos") + 1).cast("long").as("pos"))
      .agg(
        count(lit(1)).as("n_members"),
        sum(floor(col("col").cast("double") * lit(1000000.0))).as("qsum"))
      .select(
        col("bucket"), col("pos"), col("n_members"),
        (col("qsum").cast("double") / (col("n_members").cast("double") * lit(1000000.0)))
          .as("centroid"))

  /** Strict total order for the in-row centroid argmax: cosine desc with
    * NULLS LAST (DuckDB's ORDER BY ... DESC default), centroid id asc.
    * Shared by [[ivfAssign]] and the [[kmeansTrain]] assignment rounds. */
  private val byCosDescCidAscCmp: (Column, Column) => Column = (a, b) =>
    when(a("ccos").isNull && b("ccos").isNotNull, 1)
      .when(a("ccos").isNotNull && b("ccos").isNull, -1)
      .when(a("ccos") > b("ccos"), -1).when(a("ccos") < b("ccos"), 1)
      .when(a("cid") < b("cid"), -1).when(a("cid") > b("cid"), 1)
      .otherwise(0)

  /** Full iterative k-means training in-engine: `rounds` assignment
    * passes with a Lloyd's centroid update between each — the loop that
    * turns [[ivfAssign]]'s hash-sampled seed centroids into trained IVF
    * centroids — each vector's final bucket plus its cosine to the
    * assigned trained centroid.
    *
    * Each round is the proven IVF shape: centroids fold to ONE row,
    * broadcast, in-row argmax (narrow map, no shuffle); the update is
    * [[kmeansStep]]'s exact fixed-point mean (one compact
    * (bucket, pos) shuffle) reassembled into ordered double arrays with
    * an in-group array_sort. Nothing iterates on the driver except the
    * loop counter; state between rounds is a ≤k-row centroid frame. At
    * many rounds, localCheckpoint the centroid frame every few
    * iterations to truncate plan growth — at 2–3 rounds (the common
    * IVF-training budget) the raw chain is fine. Returns the full final
    * assignment frame (vec_id, embedding, nrm, bucket, cos) for
    * downstream consumers ([[semanticNearDup]]); [[kmeansTrainAssign]]
    * is the narrow public projection.
    *
    * Exactness across engines: seed centroids widen float→double
    * (exact); updated centroids are exact by the fixed-point-sum
    * construction; every cosine is the same index-order double fold both
    * sides; argmax ties break on centroid id. Empty buckets drop out of
    * the update (k can only shrink), matching the SQL restatement. */
  /** The k seed centroids (smallest md5(vec_id) — the same
    * deterministic pseudo-random sample as [[ivfAssign]]) as
    * exact-double arrays with norms. ONE definition shared by
    * [[kmeansTrain]] and [[kmeansShift]], so the convergence signal
    * always measures movement against the same seeds training used.
    * `e` must be a [[withNorm]] frame. */
  private def seedCentroids(e: DataFrame): DataFrame =
    e.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(IvfK)
      .select(
        col("vec_id").as("cid"),
        transform(col("embedding"), x => x.cast("double")).as("cemb"),
        col("nrm").as("cnrm"))

  /** Score any frame carrying (`embedding`, `nrm`) columns against a
    * centroid frame (cid, cemb: array<double>, cnrm): the centroids fold
    * to ONE row, broadcast to every scan partition, and each input row
    * ranks them with an in-row array_sort — a narrow map, no shuffle.
    * Adds `cluster` (argmax centroid id) and `ccos` (cosine to it),
    * keeping every input column. The assignment primitive
    * [[kmeansTrain]]'s rounds AND the streaming ingest's semantic gate
    * ([[graft.streaming.CorpusIngest]]) share — batch and streaming
    * agree on cluster membership by construction. */
  private[graft] def assignToCentroids(df: DataFrame, cents: DataFrame): DataFrame = {
    val row = cents.agg(collect_list(struct(
      col("cid"), col("cemb"), col("cnrm"))).as("cents"))
    val scored = transform(col("cents"), c =>
      struct(
        (dotD(col("embedding"), c("cemb")) / (col("nrm") * c("cnrm"))).as("ccos"),
        c("cid").as("cid")))
    df.join(broadcast(row))
      .withColumn("best", element_at(array_sort(scored, byCosDescCidAscCmp), 1))
      .withColumn("cluster", col("best")("cid"))
      .withColumn("ccos", col("best")("ccos"))
      .drop("cents", "best")
  }

  /** [[kmeansTrain]]'s assignment round over the embeddings table:
    * the narrow (vec_id, embedding, nrm, bucket, cos) projection. */
  private def lloydAssign(e: DataFrame, cents: DataFrame): DataFrame =
    assignToCentroids(e, cents)
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("cluster").as("bucket"), col("ccos").as("cos"))

  /** Lloyd's update: exact fixed-point means ([[kmeansStep]]'s
    * arithmetic), reassembled into pos-ordered double arrays.
    * localCheckpointed: the frame is ≤ k rows at ANY corpus size but
    * its lineage is a corpus-sized assign+aggregate pass, and consumers
    * BRANCH on it (the next round's assignment feeds both sides of the
    * semantic pair join; `cluster_eval` consumes the trained frame
    * twice) — without the checkpoint every branch re-trains from
    * scratch (measured co-sentineled at sf0.1: cluster_eval
    * 1.95 → 1.24 s, kmeans_train2 0.96 → 0.77 s; the semantic_* family
    * is flat — its cost is the label-propagation rounds, not
    * retraining. Identical results: the update is exact fixed-point
    * arithmetic). */
  private def lloydUpdate(assigned: DataFrame): DataFrame =
    lloydUpdatePlan(assigned).localCheckpoint()

  private def lloydUpdatePlan(assigned: DataFrame): DataFrame =
    assigned
      .select(col("bucket"), posexplode(col("embedding")))
      .groupBy(col("bucket"), col("pos"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("col").cast("double") * lit(1000000.0))).as("qsum"))
      .withColumn("m",
        col("qsum").cast("double") / (col("n").cast("double") * lit(1000000.0)))
      .groupBy(col("bucket"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(
        col("bucket").as("cid"),
        transform(col("pm"), p => p("m")).as("cemb"))
      .withColumn("cnrm", normD(col("cemb")))

  /** The round-1 Lloyd plan BEFORE the checkpoint — exposed for
    * PlanSpec only: [[lloydUpdate]]'s eager checkpoint executes the
    * first training round at checkpoint time, so its shape (one-row
    * seed-centroid broadcast, in-row argmax, compact map-combinable
    * update — never a window or cartesian) vanished from every final
    * plan; this pins it directly. */
  private[graft] def lloydRound1Plan(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    lloydUpdatePlan(lloydAssign(e, seedCentroids(e)))
  }

  def kmeansTrain(spark: SparkSession, dir: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"kmeansTrain needs at least one round, got $rounds")
    val e = withNorm(Tables.embeddings(spark, dir))
    var cents = seedCentroids(e)
    var assigned = lloydAssign(e, cents)
    (2 to rounds).foreach { _ =>
      cents = lloydUpdate(assigned)
      assigned = lloydAssign(e, cents)
    }
    assigned
  }

  /** The TRAINED centroid frame (cid, cemb, cnrm) that produced
    * [[kmeansTrain]]'s final assignment — i.e. the state a consumer
    * FREEZES to score new data later without retraining:
    * `assignToCentroids(newRows, kmeansCentroids(...))` reproduces
    * training-time cluster membership exactly (same comparator, same
    * broadcast-argmax arithmetic). The streaming semantic-dedup gate
    * collects this (≤ k rows) and re-broadcasts it per micro-batch. */
  def kmeansCentroids(spark: SparkSession, dir: String, rounds: Int): DataFrame = {
    require(rounds >= 1, s"kmeansCentroids needs at least one round, got $rounds")
    val e = withNorm(Tables.embeddings(spark, dir))
    var cents = seedCentroids(e)
    (2 to rounds).foreach { _ =>
      cents = lloydUpdate(lloydAssign(e, cents))
    }
    cents
  }

  /** [[kmeansTrain]]'s public projection: final per-vector assignment. */
  def kmeansTrainAssign(spark: SparkSession, dir: String, rounds: Int): DataFrame =
    kmeansTrain(spark, dir, rounds)
      .select(col("vec_id"), col("bucket"), col("cos"))

  /** Convergence signal for [[kmeansTrain]]: per bucket, the Chebyshev
    * (max-coordinate) distance between the seed centroid and its
    * round-1 Lloyd's update — the number a training loop thresholds to
    * decide "converged, stop". Chebyshev rather than L2 because MAX is
    * aggregation-order-independent (an L2 sum of squared diffs would
    * flake on double summation order across engines); each |Δ| is one
    * deterministic subtraction of exact inputs.
    *
    * Scale: [[kmeansStep]]'s one compact shuffle plus a ≤k-row
    * broadcast-able join against the seed centroids and a k-group max. */
  def kmeansShift(spark: SparkSession, dir: String): DataFrame = {
    val seed = seedCentroids(withNorm(Tables.embeddings(spark, dir)))
      .select(col("cid"), col("cemb"))
    kmeansStep(spark, dir)
      .join(broadcast(seed), col("bucket") === col("cid"))
      .withColumn("seed_v", element_at(col("cemb"), col("pos").cast("int")))
      .groupBy(col("bucket"))
      .agg(
        min(col("n_members")).as("n_members"),
        max(abs(col("centroid") - col("seed_v"))).as("max_shift"))
  }

  /** Two-round k-means (assign → update → re-assign) — the
    * oracle-checked pin of [[kmeansTrain]]: DuckDB restates both rounds
    * and the exact centroid update as CTEs and must agree bit-for-bit
    * on every vector's final bucket and cosine. */
  def kmeansTrain2(spark: SparkSession, dir: String): DataFrame =
    kmeansTrainAssign(spark, dir, rounds = 2)

  /** Top principal component of the embedding table by THREE in-engine
    * power-iteration rounds over the mean-centered data — the
    * dimensionality/drift probe a curation pass runs on its embedding
    * space (and the vector the ABC/PCA-whitening preprocessors freeze).
    * Returns one row per dimension: the final un-normalized matvec
    * coordinate as an exact fixed-point BIGINT (`w_fp`, the cross-engine
    * anchor) and the unit-norm `loading`.
    *
    * Exactness across engines (the [[kmeansTrain]] rulebook): the mean is
    * an exact fixed-point long-sum ratio; each centered coordinate is one
    * deterministic subtraction; each row's projection `s = cx·v` is the
    * same index-order double fold both sides; the matvec accumulation
    * over ROWS — the only order-dependent reduction — is quantized
    * per (row, dim) to `floor(s·cxⱼ·10⁶)` BIGINTs and summed as longs
    * (order-independent exact); norms divide through IEEE sqrt (correctly
    * rounded, engine-identical). v₀ is the all-ones direction.
    *
    * Scale (100 TB): each round broadcasts ONE d-vector, streams the
    * corpus with narrow per-row work, and shuffles only d·partitions
    * pre-aggregated (pos, partial-sum) rows — the [[kmeansStep]] shuffle
    * shape; nothing lives on the driver. Headroom: per-row quantized
    * contributions are ~10⁸ at unit-scale embeddings, so the per-dim
    * BIGINT sum has room past 10⁹ rows; ANSI mode makes overflow loud,
    * not wrong. */
  /** The shared 3-round power-iteration chain: mean-centered embeddings
    * `cx(vec_id, cx)`, the final unit vector `v(v)` (one row), and the
    * final-round quantized matvec `pq(wq)` — [[pcaPower]] reports the
    * loadings from pq, [[pcaProject]] scores every vector against v. */
  private def pcaChain(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val rounds = 3
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("x"))
    val mu = e.select(posexplode(col("x")))
      .groupBy(col("pos"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("col") * lit(1000000.0))).as("qs"))
      .withColumn("m",
        col("qs").cast("double") / (col("n").cast("double") * lit(1000000.0)))
      .groupBy()
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(transform(col("pm"), p => p("m")).as("mu"))
    val cx = e.join(broadcast(mu))
      .select(col("vec_id"), zip_with(col("x"), col("mu"), (a, b) => a - b).as("cx"))
    var v = mu.select(transform(col("mu"), _ => lit(1.0)).as("v"))
    var pq: DataFrame = null
    (1 to rounds).foreach { _ =>
      pq = cx.join(broadcast(v))
        .withColumn("s", dotD(col("cx"), col("v")))
        .select(col("s"), posexplode(col("cx")))
        .groupBy(col("pos"))
        .agg(sum(floor(col("s") * col("col") * lit(1000000.0))).as("q"))
        .groupBy()
        .agg(array_sort(collect_list(struct(col("pos"), col("q")))).as("pq"))
        .select(transform(col("pq"), p => p("q")).as("wq"))
      v = pq
        .select(transform(col("wq"), q => q.cast("double")).as("w"))
        .select(transform(col("w"), x => x / normD(col("w"))).as("v"))
    }
    (cx, v, pq)
  }

  def pcaPower(spark: SparkSession, dir: String): DataFrame = {
    val (_, _, pq) = pcaChain(spark, dir)
    pq
      .withColumn("nw", normD(transform(col("wq"), q => q.cast("double"))))
      .select(col("nw"), posexplode(col("wq")))
      .select(
        (col("pos") + 1).cast("long").as("pos"),
        col("col").as("w_fp"),
        (col("col").cast("double") / col("nw")).as("loading"))
  }

  /** PC1 projection histogram by class: every vector scored against the
    * trained top principal component, binned at 0.1 width, counted per
    * (bin, label) — the one-dimensional density map that answers "does
    * the leading axis of variance separate the labels" before anyone
    * trusts a PCA plot of the embedding space. min/max of the exact
    * projection per cell expose the bin edges.
    *
    * Exactness: the unit vector is the shared fixed-point chain's
    * output; each projection is the index-order dotD fold of identical
    * doubles; the bin is floor(s·10) of identical doubles — both
    * engines bin identically. Scale: scoring is a narrow map under a
    * one-row broadcast; the histogram is a (bin, label) hash aggregate. */
  def pcaProject(spark: SparkSession, dir: String): DataFrame = {
    val (cx, v, _) = pcaChain(spark, dir)
    val lbl = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"))
    cx.join(broadcast(v))
      .withColumn("s", dotD(col("cx"), col("v")))
      .select(col("vec_id"), col("s"))
      .join(lbl, "vec_id")
      .groupBy(floor(col("s") * lit(10)).cast("long").as("bin"), col("label"))
      .agg(count(lit(1)).as("cnt"), min(col("s")).as("min_s"), max(col("s")).as("max_s"))
  }

  /** Embedding outliers: the 20 vectors FARTHEST from their own trained
    * cluster centroid (lowest assignment cosine after two k-means
    * rounds) — the out-of-distribution screen a curation pass runs on an
    * embedding space: junk, mojibake, and modality mistakes don't sit
    * near any density center, so they surface here first (the flip side
    * of [[semanticNearDup]], which reads the SAME assignment frame for
    * its densest regions).
    *
    * Scale (100 TB): the assignment is [[kmeansTrain]]'s zero-shuffle
    * narrow map; the bottom-k is a TakeOrderedAndProject (never a global
    * sort), and the rank window runs on the 20-row result. */
  def embeddingOutliers(spark: SparkSession, dir: String): DataFrame = {
    val scored = kmeansTrain(spark, dir, rounds = 2)
      .select(col("vec_id"), col("bucket"), col("cos"))
      .orderBy(col("cos").asc, col("vec_id").asc).limit(20)
    scored.select(col("vec_id"), col("bucket"), col("cos"),
      row_number().over(Window.orderBy(col("cos").asc, col("vec_id").asc))
        .cast("long").as("rk"))
  }

  /** Semantic near-duplicate pairs over the TRAINED index: cosine ≥ 0.3
    * within a round-2 k-means bucket, a<b — [[embeddingNearDup]]'s pair
    * pattern consuming [[kmeansTrain]] instead of the raw hash-sampled
    * seed buckets. Trained centroids track the data's actual density, so
    * buckets are tighter around real clusters: more true near-dup pairs
    * land in the same bucket (higher recall) without the pair space
    * growing past Σ bucket² — the production SemDeDup shape: train,
    * assign, pair within cell. */
  def semanticNearDup(spark: SparkSession, dir: String): DataFrame =
    semanticNearDupFrom(
      kmeansTrain(spark, dir, rounds = 2).localCheckpoint(true))

  /** [[semanticNearDup]]'s pair join over an EXPLICIT assignment frame —
    * the seam [[graft.queries.CurationQueries.semanticKeep]] shares so
    * one trained assignment feeds both the edge set and the keeper
    * scores. The caller checkpoints: both join sides read the frame and
    * the assign chain is NARROW (broadcast argmax, no exchange), so
    * ReuseExchange cannot share it — un-materialized, the corpus argmax
    * (and its whole Lloyd lineage) ran once per reference. */
  private[graft] def semanticNearDupFrom(assigned: DataFrame): DataFrame = {
    val a = assigned.select(col("vec_id").as("va"), col("embedding").as("ea"),
      col("nrm").as("na"), col("bucket"))
    val b = assigned.select(col("vec_id").as("vb"), col("embedding").as("eb"),
      col("nrm").as("nb"), col("bucket").as("bucket_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("va") < col("vb"))
      .withColumn("cos", dotD(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.3)
      .select(col("va"), col("vb"), col("cos"))
  }

  /** Clustering-quality report over the round-2 trained index: per
    * cluster, the member count, the exact fixed-point sum of squared
    * L2 distances to the trained centroid (inertia — the number a
    * training loop plots to pick k / decide convergence), and the
    * majority `label` with its purity share (how well the unsupervised
    * buckets recover the labelled classes). Per-coordinate terms
    * floor((d·d)·10⁶) sum as longs — exact and order-independent, so
    * the L2 sums that [[kmeansShift]] had to avoid (double summation
    * order) are safe here; purity is one IEEE division of two counts.
    *
    * Scale (100 TB): the assignment pass is [[kmeansTrain]]'s proven
    * zero-shuffle narrow map; the SSE rollup joins the ≤k-row trained
    * centroid frame by broadcast and shuffles only (bucket)-keyed
    * 16-byte partial rows; the label histogram joins labels back on
    * vec_id (co-partitioned when the table is vec_id-bucketed) and
    * shuffles (bucket, label) — both keys compact. The majority pick
    * prunes per bucket via WindowGroupLimit. */
  def clusterEval(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    // the exact kmeansTrain(rounds = 2) chain, restated locally so the
    // assignment and its centroid frame share one lineage
    val cents = lloydUpdate(lloydAssign(e, seedCentroids(e)))
    val assigned = lloydAssign(e, cents)
    val sse = assigned
      .join(broadcast(cents.select(col("cid"), col("cemb"))), col("bucket") === col("cid"))
      .withColumn("sse_row",
        aggregate(
          zip_with(col("embedding"), col("cemb"), (x, c) => {
            val d = x.cast("double") - c
            floor(d * d * lit(1000000.0))
          }),
          lit(0L), (acc, t) => acc + t))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_members"), sum(col("sse_row")).as("sse_fp"))
    val lab = assigned.select(col("vec_id"), col("bucket"))
      .join(Tables.embeddings(spark, dir).select(col("vec_id"), col("label")), "vec_id")
      .groupBy(col("bucket"), col("label")).agg(count(lit(1)).as("cl"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("cl").desc, col("label").asc)
    val maj = lab.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("bucket"), col("label").as("majority_label"), col("cl").as("n_majority"))
    sse.join(maj, "bucket")
      .withColumn("purity", col("n_majority").cast("double") / col("n_members").cast("double"))
      .select(col("bucket"), col("n_members"), col("sse_fp"),
        col("majority_label").cast("long").as("majority_label"),
        col("n_majority"), col("purity"))
  }

  /** Cluster NAMING — top-3 distinctive terms per trained embedding
    * cluster: the "what is each cluster about" report every corpus
    * exploration runs right after [[kmeansTrain]], and the composition
    * showcase the engine exists for (similarity family supplies the
    * clusters, text family supplies the vocabulary). A term's
    * distinctiveness is the df-damped cluster containment `ctf/(df+1)`
    * — [[CurationQueries.tfidfTop]]'s rational score lifted from
    * documents to clusters, so common corpus words (high df) cannot
    * name a cluster.
    *
    * Exactness: counts are BIGINTs (docs-in-cluster-containing-term,
    * corpus doc frequency over DISTINCT per-doc tokens), the score is
    * one integer floor-division in 10⁶ fixed point, ties break on the
    * term string — no floats anywhere. The cluster assignment is the
    * oracle-pinned two-round Lloyd's chain (`kmeans_train2`), restated
    * by the oracle's shared CTE body bit-for-bit.
    *
    * Scale (100 TB): the assignment is [[kmeansTrain]]'s audited shape
    * (broadcast centroids, in-row argmax, compact shuffles); the term
    * side shuffles (bucket, tok) and (tok) counts — vocabulary-scale
    * keys, text dies at the scan; the df join is vocabulary-sized; the
    * top-3 window partitions by cluster and prunes via
    * WindowGroupLimit before the final exchange. */
  def clusterTerms(spark: SparkSession, dir: String): DataFrame = {
    val assign = kmeansTrainAssign(spark, dir, rounds = 2)
      .select(col("vec_id"), col("bucket"))
    val dt = Tables.documents(spark, dir)
      .withColumn("ws", graft.functions.TextFunctions.wordTokens(col("text")))
      .select(col("doc_id"), explode(array_distinct(col("ws"))).as("tok"))
    val dfreq = dt.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ctf = dt.join(assign, col("doc_id") === col("vec_id"))
      .groupBy(col("bucket"), col("tok")).agg(count(lit(1)).as("ctf"))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("score_fp").desc, col("tok").asc)
    ctf.join(dfreq, "tok")
      .withColumn("score_fp", expr("(ctf * 1000000) div (df + 1)"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("bucket"), col("rk"), col("tok"), col("ctf"),
        col("df"), col("score_fp"))
  }

  /** Cosine of every corpus vector to ONE query vector (`qid`),
    * broadcast-scored — the semantic arm [[CurationQueries.rankFusion]]
    * fuses with BM25. Same fold order as [[knnCosine]]. */
  private[queries] def cosineToQuery(spark: SparkSession, dir: String, qid: Long): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val q = e.filter(col("vec_id") === qid)
      .select(col("embedding").as("qemb"), col("nrm").as("qnrm"))
    e.filter(col("vec_id") =!= qid)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        (dotD(col("qemb"), col("embedding")) / (col("qnrm") * col("nrm"))).as("cos"))
  }

  /** Embedding near-duplicate pairs: cosine ≥ 0.3 within an IVF bucket,
    * a<b. Bucketing bounds the pair space (Σ bucket² ≪ N²). */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    // materialized once: both pair-join sides read the assignment and
    // the assign chain is narrow (broadcast argmax, no exchange to reuse)
    val assigned = ivfAssign(spark, dir).localCheckpoint(true)
    val a = assigned.select(col("vec_id").as("va"), col("embedding").as("ea"),
      col("nrm").as("na"), col("bucket"))
    val b = assigned.select(col("vec_id").as("vb"), col("embedding").as("eb"),
      col("nrm").as("nb"), col("bucket").as("bucket_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("va") < col("vb"))
      .withColumn("cos", dotD(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= 0.3)
      .select(col("va"), col("vb"), col("cos"))
  }

  /** Sketch-match threshold sweep over the LSH candidates — the MinHash
    * twin of [[semanticThresholdSweep]]: for every candidate threshold
    * t ∈ 1..12 matching signature components (estimated Jaccard t/12),
    * how many candidate pairs survive? The curve that tunes the
    * near-dup gate's strictness before anyone commits to one number.
    * Pure integer counts — bit-exact by construction.
    *
    * Scale: one signature self-join bounded by the LSH candidate set
    * (the [[minhashEstimate]] shape without its exact-Jaccard arm); the
    * 12-way explode multiplies a 3-column scalar frame and folds
    * map-side to 12 rows. */
  def minhashThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val mins = minhashSigs(spark, dir)
    val nMatch = MinhashSeeds.indices.map(i =>
      when(col(s"a.mh$i") === col(s"b.mh$i"), 1L).otherwise(0L)).reduce(_ + _)
    lshCandidates(mins)
      .join(mins.as("a"), col("doc_a") === col("a.doc_id"))
      .join(mins.as("b"), col("doc_b") === col("b.doc_id"))
      .select(nMatch.as("n_match"))
      .select(col("n_match"), explode(sequence(lit(1), lit(12))).as("threshold"))
      .groupBy(col("threshold").cast("long").as("threshold"))
      .agg(sum(when(col("n_match") >= col("threshold"), 1L).otherwise(0L)).as("n_pairs"))
  }

  /** Triangle census of the near-dup graph — the graph-density
    * diagnostic beside the component map (`dedup_clusters`) and hub
    * ranking (`dup_pagerank`): many triangles relative to wedges means
    * tight template cliques (mass boilerplate); a low global clustering
    * coefficient means chains of weak pairwise matches (borderline
    * threshold). One row out: edges, wedges (Σ deg·(deg−1)/2),
    * triangles, and the global clustering coefficient 3·T/W.
    *
    * Exactness: counts and the wedge sum are BIGINTs (deg·(deg−1) is
    * even, so the `div 2` is exact); the coefficient is one final IEEE
    * division.
    *
    * Scale: the triangle join runs on DEGREE-ORIENTED edges — each edge
    * points from its lower-(degree, id) endpoint to the higher — the
    * standard distributed-triangle-count trick: wedge intermediates are
    * Σ outdeg², bounded O(m^1.5) REGARDLESS of clique structure, where
    * the naive id-ordered join is Σ deg² — fatal on the template
    * mega-cliques real corpora contain (the dedup skew fixture builds a
    * 200-clique; at 100 TB a 10⁶-doc clique makes id-ordering 10¹⁸
    * intermediates). Orientation permutes which edge of a triangle is
    * which, never the COUNT, so the id-ordered DuckDB oracle restates
    * the same number. Degrees fold map-side from the edge list. */
  def dupTriangles(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint the edge list, degrees and oriented edges: `e`
    // feeds nEdges/deg/oe, `deg` feeds wedges and BOTH sides of the
    // orientation join, and `oe` appears three times in the triangle
    // join — un-materialized, the MinHash chain re-ran 9× (22 parquet
    // scans in the before-plan). All three frames are compact id rows.
    val e = minhashLsh(spark, dir).localCheckpoint(true)
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val deg = e.select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    val wedges = deg.agg(sum(expr("deg * (deg - 1) div 2")).as("n_wedges"))
    // orient: (u, v) with (deg_u, u) <lex (deg_v, v); rank structs carry
    // the order so the triple join needs no further degree lookups
    val oe = e
      .join(deg.select(col("d").as("doc_a"), col("deg").as("da")), "doc_a")
      .join(deg.select(col("d").as("doc_b"), col("deg").as("db")), "doc_b")
      .select(
        when(struct(col("da"), col("doc_a")) < struct(col("db"), col("doc_b")),
          struct(col("doc_a").as("u"), col("doc_b").as("v")))
          .otherwise(struct(col("doc_b").as("u"), col("doc_a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint(true)
    val tri = oe.as("e1")
      .join(oe.select(col("u").as("u2"), col("v").as("c2")).as("e2"),
        col("e1.v") === col("u2"))
      .join(oe.select(col("u").as("a3"), col("v").as("c3")).as("e3"),
        col("e1.u") === col("a3") && col("c2") === col("c3"))
      .agg(count(lit(1)).as("n_triangles"))
    nEdges.crossJoin(broadcast(wedges)).crossJoin(broadcast(tri)) // 1-row sides
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        when(col("n_wedges") > 0,
          lit(3.0) * col("n_triangles").cast("double") / col("n_wedges").cast("double"))
          .otherwise(lit(0.0)).as("clustering_coeff"))
  }

  /** Cosine-threshold sweep over the embedding near-dup pair space —
    * the tuning query BEFORE anyone picks [[embeddingNearDup]]'s 0.3:
    * for each candidate threshold t ∈ {0.30, 0.35, …, 0.90}, how many
    * IVF-bucket pairs would the semantic gate flag? One pass over the
    * bounded pair frame; the de-dup rate-vs-threshold curve every
    * corpus-curation rollout reads first ([[graft.queries.TextQueries]]'
    * `quality_threshold_sweep`, lifted to the vector side).
    *
    * Exactness: thresholds are computed in-engine as `i/20.0` (one IEEE
    * division of identical integers) and compared against the same
    * `cos` doubles the oracle reproduces bit-for-bit; counts are
    * integers.
    *
    * Scale: the pair space is IVF-bounded (Σ bucket²); the 13-way
    * threshold explode multiplies COUNTS, not vectors (the projection
    * drops embeddings before the explode), and folds map-side to 13
    * rows per partition. */
  def semanticThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    // materialized once: both pair-join sides read the assignment (the
    // narrow broadcast-argmax chain re-ran per side otherwise)
    val assigned = ivfAssign(spark, dir).localCheckpoint(true)
    val a = assigned.select(col("vec_id").as("va"), col("embedding").as("ea"),
      col("nrm").as("na"), col("bucket"))
    val b = assigned.select(col("vec_id").as("vb"), col("embedding").as("eb"),
      col("nrm").as("nb"), col("bucket").as("bucket_b"))
    a.join(b, col("bucket") === col("bucket_b") && col("va") < col("vb"))
      .select((dotD(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
      .select(col("cos"), explode(sequence(lit(6), lit(18))).as("i"))
      .withColumn("threshold", col("i").cast("double") / lit(20.0))
      .groupBy(col("threshold"))
      .agg(sum(when(col("cos") >= col("threshold"), 1L).otherwise(0L)).as("n_pairs"))
  }

  /** Edit-distance near-dup (the fifth dedup family: exact / MinHash /
    * SimHash / embedding-cosine / Levenshtein). Candidate pairs come from
    * the MinHash-LSH band-signature equijoin (`minhashLsh`), keeping the
    * pair space linear-ish at corpus scale; candidates are further pruned
    * by |Δ n_chars| ≤ 10 — a LENGTH lower-bound on edit distance, so the
    * prune is admissible for the threshold — then exact Levenshtein on a
    * fixed 24-char prefix (bounding the O(m·n) DP; prefix length is the
    * knob that keeps per-pair cost constant as documents grow). */
  def editDistanceNearDup(spark: SparkSession, dir: String): DataFrame = {
    val cands = minhashLsh(spark, dir)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), substring(col("text"), 1, 24).as("prefix"))
    cands
      .join(docs.select(col("doc_id").as("doc_a"), col("n_chars").as("nc_a"),
        col("prefix").as("pa")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("n_chars").as("nc_b"),
        col("prefix").as("pb")), "doc_b")
      .filter(abs(col("nc_a") - col("nc_b")) <= 10)
      .withColumn("edit_dist", levenshtein(col("pa"), col("pb")).cast("long"))
      .filter(col("edit_dist") <= 15)
      .select(col("doc_a"), col("doc_b"), col("edit_dist"))
  }

  /** MOSS-style copied-span score over LSH candidate pairs: the share
    * of the smaller document's winnowing fingerprints the pair shares.
    * The winnowing guarantee makes this a LOCAL-substring-copy signal —
    * any common run of ≥ k+w−1 = 8 chars contributes a shared
    * fingerprint — catching verbatim spans embedded in otherwise
    * different documents, which whole-set shingle Jaccard dilutes
    * toward zero. The sixth near-dup family (exact / MinHash / SimHash /
    * embedding / edit-distance / copied-span).
    *
    * Scale: fingerprints come from the zero-shuffle native [[WinnowFps]]
    * pass; the pair space is the LSH candidate set; per-pair cost is
    * two doc_id equijoins + one sorted-array intersection. */
  def winnowOverlap(spark: SparkSession, dir: String): DataFrame = {
    val cands = minhashLsh(spark, dir)
    val fps = Tables.documents(spark, dir)
      .withColumn("norm", normText(col("text")))
      .select(col("doc_id"),
        graft.functions.GraftFunctions.winnowFps(col("norm"), 5, 4).as("fps"))
    cands
      .join(fps.select(col("doc_id").as("doc_a"), col("fps").as("fps_a")), "doc_a")
      .join(fps.select(col("doc_id").as("doc_b"), col("fps").as("fps_b")), "doc_b")
      .withColumn("n_common", size(array_intersect(col("fps_a"), col("fps_b"))).cast("long"))
      .withColumn("min_fp", least(size(col("fps_a")), size(col("fps_b"))))
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        when(col("min_fp") === 0, lit(null).cast("double"))
          .otherwise(col("n_common").cast("double") / col("min_fp").cast("double"))
          .as("overlap"))
  }

  /** Multimodal join: documents ⋈ embeddings (doc_id = vec_id) — the
    * text+vector row a training pipeline feeds downstream, with the
    * vector's norm surfaced through the native dot expression. */
  def docEmbeddingJoin(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val e = Tables.embeddings(spark, dir)
    d.join(e, col("doc_id") === col("vec_id"))
      .select(
        col("doc_id"), col("lang"), col("n_chars"),
        col("label").cast("long").as("label"),
        normD(col("embedding")).as("vec_norm")
      )
  }

  /** Word 3-gram shingles from a MATERIALIZED token-array column (docs
    * shorter than 3 tokens contribute none).
    *
    * `ws` must be a plain column attribute, not an inline `wordTokens(...)`
    * expression: a captured non-trivial subtree inside a higher-order
    * lambda is re-evaluated on EVERY element in interpreted mode — with the
    * tokenizer inlined that meant 3 full regex tokenizations per shingle
    * (measured 18×: 17.1s → 0.95s at sf0.1). Callers `withColumn("ws", …)`
    * first; multi-referenced non-cheap aliases survive CollapseProject, so
    * the tokenizer runs once per row. */
  /** Public alias for cross-module reuse (contamination sweep). */
  def shingleColPublic(ws: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    shingleCol(ws)

  private def shingleCol(ws: org.apache.spark.sql.Column) =
    when(size(ws) >= 3,
      transform(
        sequence(lit(1), size(ws) - 2),
        i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1), element_at(ws, i + 2))
      )
    ).otherwise(array())

  /** Universal-hash family for MinHash: mhᵢ = (aᵢ·h32 + bᵢ) mod p over ONE
    * md5-derived 32-bit hash per shingle. One md5 per shingle instead of
    * one per (shingle × seed) — measured 10× on the bench — and the 12
    * mins fall out of a single grouped aggregation with no seed
    * explosion. aᵢ < 2²⁰ keeps aᵢ·h32 < 2⁵² — exact in BIGINT on both
    * engines. */
  val MinhashSeeds: Seq[(Long, Long)] =
    (0 until 12).map(i => (100003L + 911L * i, 30011L * i + 7L))
  val MinhashP: Long = 2147483647L

  /** Per-doc MinHash signature frame over ANY (doc_id, text) frame:
    * doc_id + one `mh$i` column per seed (shingle → md5Hash32 →
    * grouped min per universal hash). Shared by the batch queries and
    * the streaming ingest's near-dup gate, so both agree on what a
    * signature is. Docs with fewer than 3 tokens produce no shingles
    * and drop out (they cannot near-dup by this definition). */
  private[graft] def minhashSigsOf(docs: DataFrame): DataFrame = {
    val sh = docs
      .withColumn("ws", wordTokens(col("text")))
      .select(col("doc_id"), explode(shingleCol(col("ws"))).as("sh"))
      .withColumn("h", md5Hash32(col("sh")))
    val aggs = MinhashSeeds.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % MinhashP).as(s"mh$i")
    }
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** The banded signature rows (doc_id, band, sig) of a [[minhashSigsOf]]
    * frame — 4 rows per doc, md5 over each band's 3 components. */
  private[graft] def bandSigs(mins: DataFrame): DataFrame = {
    val bandStructs = (0 until 4).map { bd =>
      struct(
        lit(bd).as("band"),
        md5(concat_ws(",",
          (0 until 3).map(j => col(s"mh${bd * 3 + j}").cast("string")): _*)).as("sig")
      )
    }
    mins
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  private def minhashSigs(spark: SparkSession, dir: String): DataFrame =
    minhashSigsOf(Tables.documents(spark, dir))

  /** Band the signature frame 4×3 and equijoin on band signatures —
    * [[minhashLsh]]'s candidate generation split out so consumers that
    * ALSO need the signatures ([[minhashEstimate]]) band the SAME
    * frame instead of recomputing the shingle+hash pass. */
  private[graft] def lshCandidates(mins: DataFrame): DataFrame = {
    val bands = bandSigs(mins)
    val a = bands.select(col("doc_id").as("doc_a"), col("band"), col("sig"))
    val b = bands.select(col("doc_id").as("doc_b"), col("band").as("band_b"), col("sig").as("sig_b"))
    a.join(b, col("band") === col("band_b") && col("sig") === col("sig_b") && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** MinHash-LSH near-dup candidates: 12 universal-hash minhashes per doc
    * over word 3-gram shingles, banded 4×3; docs sharing any band
    * signature pair up. The only join is the band-signature equijoin —
    * LSH's whole point at scale. */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    lshCandidates(minhashSigs(spark, dir))

  /** Source-pair duplication matrix: the LSH near-dup candidates rolled
    * up by unordered (source, source) pair — the "which crawls copy
    * which" diagnostic every corpus-mixing decision starts from (a high
    * cross-source cell means two feeds share an upstream; a high
    * diagonal means a feed re-serves its own content). Pure integer
    * counts — cross-engine exact by construction.
    *
    * Scale: the candidate pairs are LSH-bounded; the two doc_id→source
    * lookups are compact-key equijoins (2 narrow columns of the corpus),
    * and the rollup keys on source pairs — output is (sources choose 2)
    * + sources rows. */
  def dupMatrix(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    minhashLsh(spark, dir)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Degree distribution of the near-dup graph: how many documents have
    * 0, 1, 2, … LSH candidate partners — the graph-shape report read
    * BEFORE trusting cluster/keeper decisions (next to [[dupTriangles]]'
    * closure and `dedup_stats`' component sizes): a healthy corpus is
    * almost all degree-0 with a thin dup tail; mass at high degree means
    * template content or a collapsed LSH threshold. Pure integer counts.
    *
    * Scale: degrees are one map-combinable count over the LSH-bounded
    * edge list (each edge contributes both endpoints); the histogram is
    * a ≤max-degree-row rollup; degree-0 docs come from one compact
    * doc_id anti-join. */
  def dupDegreeHist(spark: SparkSession, dir: String): DataFrame = {
    val edges = minhashLsh(spark, dir)
    val deg = edges.select(col("doc_a").as("d"))
      .unionAll(edges.select(col("doc_b").as("d")))
      .groupBy(col("d")).agg(count(lit(1)).as("degree"))
    val nZero = Tables.documents(spark, dir).select(col("doc_id"))
      .join(deg.select(col("d").as("doc_id")), Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("n_docs"))
      .select(lit(0L).as("degree"), col("n_docs"))
    deg.groupBy(col("degree")).agg(count(lit(1)).as("n_docs"))
      .unionByName(nZero.filter(col("n_docs") > 0))
  }

  /** Link prediction on the semantic near-dup graph (Liben-Nowell &
    * Kleinberg 2003): for every NON-edge pair with at least one common
    * neighbor, the common-neighbor count, neighborhood Jaccard
    * |Γa∩Γb| / |Γa∪Γb|, and preferential attachment deg·deg. This is
    * the recall-repair pass for bucketed candidate generation: IVF
    * bucketing's known false-negative mode is a genuinely-similar pair
    * split across two buckets — but such a pair usually SHARES
    * neighbors that did co-bucket with each side, so ranking non-edges
    * by neighborhood overlap surfaces exactly the pairs the bucketing
    * missed, for a second (exact-cosine) verification pass. Scores
    * stay exact: integer counts and ONE terminal division (Jaccard),
    * which is why Adamic-Adar's Σ1/ln(deg) — an order-dependent float
    * fold — is deliberately not offered.
    *
    * Scale: wedge fan-out is Σ_w deg(w)² — bounded by the IVF bucket
    * sizes that generate the edges (the same candidate-space bound
    * every near-dup family here relies on), never corpus². All joins
    * key on compact vec ids; the anti-join removes known edges. */
  def linkPredict(spark: SparkSession, dir: String): DataFrame = {
    // materialize the compact (va, vb) edge list ONCE: adjacency (×2),
    // the anti-join, and the degree frame all read it, and without the
    // checkpoint each reference would re-derive the whole IVF near-dup
    // chain — the dup_pagerank discipline (compact ids only, never
    // vectors)
    val edges = embeddingNearDup(spark, dir).select(col("va"), col("vb"))
      .localCheckpoint(true)
    val adj = edges.select(col("va").as("u"), col("vb").as("v"))
      .unionAll(edges.select(col("vb").as("u"), col("va").as("v")))
    val deg = adj.groupBy(col("u")).agg(count(lit(1)).as("deg"))
    val cn = adj.select(col("u").as("a"), col("v").as("w"))
      .join(adj.select(col("v").as("b"), col("u").as("w")), "w")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cn"))
    cn
      .join(edges, col("a") === col("va") && col("b") === col("vb"), "left_anti")
      .join(deg.select(col("u").as("a"), col("deg").as("deg_a")), "a")
      .join(deg.select(col("u").as("b"), col("deg").as("deg_b")), "b")
      .select(col("a").as("va"), col("b").as("vb"), col("cn"),
        col("deg_a"), col("deg_b"),
        (col("cn").cast("double") /
          (col("deg_a") + col("deg_b") - col("cn")).cast("double")).as("jaccard"),
        (col("deg_a") * col("deg_b")).as("pref_attach"))
  }

  /** Cross-family near-dup agreement matrix — do the engine's dedup
    * families agree on what a duplicate IS? For each pair of families
    * (MinHash-LSH candidates, SimHash Hamming ≤ 6 pairs, exact
    * normalized-fingerprint pairs), the pair-set sizes, the overlap, and
    * pair-set Jaccard. The calibration read: exact pairs SHOULD be a
    * subset of both sketch families (n_common(X, exact) = n_exact is a
    * recall-of-exact-dups check on X), while minhash↔simhash agreement
    * quantifies how differently shingle-Jaccard and token-frequency
    * geometry carve the near-dup space — the number that justifies
    * running both in a production pass.
    *
    * Scale: each family's pair set is LSH/band-bounded (never doc×doc;
    * the exact-fp self-join groups are exact-dup clusters — tiny); the
    * overlaps are pair-key equijoins; every aggregate folds to one row
    * before the broadcast cross-joins assemble the 3-row report. */
  def neardupFamilies(spark: SparkSession, dir: String): DataFrame = {
    // NOT checkpointed, deliberately: all three pair frames are
    // referenced 4× (two stats() cells × count+semi), but the repeated
    // references are IDENTICAL subtrees, so ReuseExchange already shares
    // the heavy candidate chains — an eager checkpoint only adds a
    // materialization barrier (interleaved A/B at sf0.1: 2.48 → 3.11 s).
    val mh = minhashLsh(spark, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val sh = TextQueries.simhashNearDup(spark, dir)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), md5(normText(col("text"))).as("fp"))
    val ex = d.select(col("doc_id").as("a"), col("fp"))
      .join(d.select(col("doc_id").as("b"), col("fp").as("fp2")),
        col("fp") === col("fp2") && col("a") < col("b"))
      .select(col("a"), col("b"))
    def stats(na: String, fa: DataFrame, nb: String, fb: DataFrame): DataFrame =
      fa.agg(count(lit(1)).as("n_a"))
        .crossJoin(broadcast(fb.agg(count(lit(1)).as("n_b"))))
        .crossJoin(broadcast(
          fa.join(fb, Seq("a", "b"), "left_semi").agg(count(lit(1)).as("n_common"))))
        .select(lit(na).as("fam_a"), lit(nb).as("fam_b"),
          col("n_a"), col("n_b"), col("n_common"),
          when(col("n_a") + col("n_b") - col("n_common") > 0,
            col("n_common").cast("double") /
              (col("n_a") + col("n_b") - col("n_common")).cast("double"))
            .otherwise(lit(null).cast("double")).as("agreement"))
    stats("minhash", mh, "simhash", sh)
      .unionByName(stats("minhash", mh, "exact", ex))
      .unionByName(stats("simhash", sh, "exact", ex))
  }

  /** Source-level content overlap, sketched AND exact: each source's
    * shingle SET is summarized by a mergeable MinHash signature (per-seed
    * `min` over every shingle the source emits — associative and
    * commutative, so it folds map-side like any min and merges across
    * shards/days without re-reading text: the sketch a 100 TB ingest
    * keeps as standing per-source state). Pairs of sources sharing at
    * least one shingle report the sketch's similarity ESTIMATE
    * (matching components / 12) beside the exact shingle-set Jaccard —
    * [[minhashEstimate]]'s audit discipline lifted from documents to
    * sources, quantifying wholesale feed overlap where [[dupMatrix]]
    * counts per-document near-dup pairs.
    *
    * Exactness: min-sketches, set sizes, and intersections are integer;
    * the two similarity columns are single IEEE divisions.
    *
    * Scale: the signature frame is sources × 12 longs; the exact side is
    * a distinct on compact (source, hash32) pairs and a hash-keyed
    * equijoin — never text, never all-pairs over docs. The estimate
    * attaches via source-keyed equijoins onto the (sources choose 2)
    * result frame. */
  def sourceSimilarity(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .withColumn("ws", wordTokens(col("text")))
      .select(col("source"), explode(shingleCol(col("ws"))).as("sh"))
      .withColumn("h", md5Hash32(col("sh")))
      .select(col("source"), col("h"))
    val aggs = MinhashSeeds.zipWithIndex.map { case ((a, b), i) =>
      min((col("h") * a + b) % MinhashP).as(s"mh$i")
    }
    // ONE tokenize pass: materialize the distinct (source, h) set and
    // derive the sketch from it — per-seed min is duplicate-insensitive
    // (min over the multiset == min over the set), so the signatures are
    // bit-identical while the shingle explode runs once instead of 4×
    // (sigs + sizes + both intersection sides each re-derived `sh`).
    val sets = sh.distinct().localCheckpoint(true)
    val sigs = sets.groupBy(col("source")).agg(aggs.head, aggs.tail: _*)
    val sizes = sets.groupBy(col("source")).agg(count(lit(1)).as("sz"))
    val inter = sets.select(col("source").as("src_a"), col("h"))
      .join(sets.select(col("source").as("src_b"), col("h").as("hb")),
        col("h") === col("hb") && col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b")).agg(count(lit(1)).as("inter"))
    val nMatch = MinhashSeeds.indices.map(i =>
      when(col(s"a.mh$i") === col(s"b.mh$i"), 1L).otherwise(0L)).reduce(_ + _)
    inter
      .join(sizes.select(col("source").as("src_a"), col("sz").as("sz_a")), "src_a")
      .join(sizes.select(col("source").as("src_b"), col("sz").as("sz_b")), "src_b")
      .join(sigs.as("a"), col("src_a") === col("a.source"))
      .join(sigs.as("b"), col("src_b") === col("b.source"))
      .select(col("src_a"), col("src_b"), col("sz_a"), col("sz_b"), col("inter"),
        (col("inter").cast("double") /
          (col("sz_a") + col("sz_b") - col("inter")).cast("double")).as("jaccard"),
        nMatch.as("n_match"),
        (nMatch.cast("double") / lit(MinhashSeeds.size.toDouble)).as("est_sim"))
  }

  /** Recall@3 of the IVF approximate path against the exact brute-force
    * top-3, per query vector — the accuracy price of the ANN shortcut,
    * measured inside the engine. The eval every production ANN rollout
    * gates on: exact kNN on a sample (affordable at any scale because
    * the sample is small), IVF over the same sample, set intersection
    * per query. */
  def annRecall(spark: SparkSession, dir: String): DataFrame =
    cosineRecallOf(spark, dir, annIvf(spark, dir).select(col("qid"), col("vid")))

  /** Recall@3 of the TRAINED-centroid IVF ([[annIvfTrained]]) against
    * the exact cosine top-3 — the audit that prices what k-means
    * training buys over the hash-sampled routing (compare with
    * `ann_recall`): same scoring fold, only the routing differs. */
  def annRecallTrained(spark: SparkSession, dir: String): DataFrame =
    cosineRecallOf(spark, dir, annIvfTrained(spark, dir).select(col("qid"), col("vid")))

  /** Per-query recall@3 of `approx3 (qid, vid)` against the exact
    * brute-force cosine top-3 — [[annRecall]]'s scoring fold shared by
    * the sampled and trained routings. */
  private def cosineRecallOf(spark: SparkSession, dir: String,
      approx3: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid").asc)
    // localCheckpoint the truth frame (3 rows/query): the hit semi-join
    // and the k fold both read it — un-materialized, the exact
    // corpus×queries scan ran twice.
    val exact3 = knnCosine(spark, dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("qid"), col("vid"))
      .localCheckpoint(true)
    val hits = approx3.join(exact3, Seq("qid", "vid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
    exact3.groupBy(col("qid")).agg(count(lit(1)).as("k"))
      .join(hits, Seq("qid"), "left")
      .select(
        col("qid"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        col("k"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("k").cast("double")).as("recall")
      )
  }

  /** Recall@3 as a function of probe width — the nprobe sweep every IVF
    * deployment tunes with: run the [[annIvfNprobe]] candidate chain at
    * nprobe ∈ {1, 2, 4} in ONE pass (assign once at the max width, keep
    * each probe's rank, gate by a 3-row broadcast level frame) and score
    * each level against the exact brute-force top-3. Recall must be
    * monotone non-decreasing in nprobe (a wider probe set only ever adds
    * candidates — AnnSweepSpec pins this); the cost side stays a bucket
    * equijoin whose probed volume grows linearly with nprobe, which is
    * the whole trade the sweep exists to price. */
  def annRecallNprobe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val probeLevels = Seq(1, 2, 4)
    val assigned = ivfAssign(spark, dir, probeLevels.max)
    // query side: 10 vectors × ≤4 (rank, bucket) probes — posexplode keeps
    // the probe's rank so one max-width assignment serves every level
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
        col("nrm").as("qnrm"), posexplode(col("probe_buckets")))
      .withColumnRenamed("pos", "ppos")
      .withColumnRenamed("col", "qbucket")
    val levels = probeLevels.toDF("nprobe")
    // 3-row broadcast fan-out on the SMALL side only (ppos is 0-based)
    val ql = q.crossJoin(broadcast(levels)).filter(col("ppos") < col("nprobe"))
    val cand = assigned.select(col("vec_id").as("vid"),
      col("embedding").as("cemb2"), col("nrm").as("cnrm2"), col("bucket"))
    val w = Window.partitionBy(col("nprobe"), col("qid"))
      .orderBy(col("cos").desc, col("vid").asc)
    val approx3 = cand
      .join(broadcast(ql), col("qbucket") === col("bucket") && col("qid") =!= col("vid"))
      .withColumn("cos", dotD(col("qemb"), col("cemb2")) / (col("qnrm") * col("cnrm2")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("nprobe"), col("qid"), col("vid"))
    val wx = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid").asc)
    // NOT checkpointed: the two truth references share the window
    // exchange via ReuseExchange (a checkpoint measured 1.02–1.16× in
    // two interleaved A/Bs at sf0.1)
    val exact3 = knnCosine(spark, dir)
      .withColumn("rn", row_number().over(wx)).filter(col("rn") <= 3)
      .select(col("qid"), col("vid"))
    val hits = approx3.join(exact3, Seq("qid", "vid"), "left_semi")
      .groupBy(col("nprobe")).agg(count(lit(1)).as("n_hit"))
    val base = exact3.agg(count(lit(1)).as("k"))
    levels.crossJoin(broadcast(base))
      .join(hits, Seq("nprobe"), "left")
      .select(
        col("nprobe").cast("long").as("nprobe"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        col("k"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("k").cast("double")).as("recall"))
  }

  /** Prefix dimensions used by the truncated (Matryoshka-style) retrieval
    * pass in [[mrlRecall]] — 16 of 64, the 4× bandwidth saving a
    * truncated first-pass search buys. */
  private[graft] val MrlDims = 16

  /** Truncated-dimension retrieval recall (the Matryoshka/MRL eval):
    * top-3 by cosine over only the FIRST [[MrlDims]] of 64 embedding
    * dimensions, scored against the exact full-dimension top-3 per
    * query. This is the eval behind every "shorten the vectors" rollout:
    * a prefix-truncated first pass reads 4× less vector data per
    * candidate (the dominant cost of brute-force scan at 100 TB is
    * memory bandwidth, not FLOPs), and this query measures exactly how
    * much recall that truncation costs on the live corpus — the number
    * that decides whether the cheap pass can front a full-dim re-rank.
    *
    * Both passes share the broadcast-query + per-query WindowGroupLimit
    * shape of [[knnCosine]]; `slice` keeps the prefix fold order
    * identical in both engines, so the truncated cosine is the same
    * fixed-order IEEE arithmetic as the oracle's sliced list fold.
    *
    * Scale: the corpus streams past a 10-row broadcast twice (once per
    * metric); shuffles carry only (qid, vid, cos) triples, never
    * vectors. */
  def mrlRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
      .withColumn("temb", slice(col("embedding"), 1, MrlDims))
      .withColumn("tnrm", normD(col("temb")))
    val q = e.select(col("vec_id").as("qid"),
      col("embedding").as("qemb"), col("nrm").as("qnrm"),
      col("temb").as("qtemb"), col("tnrm").as("qtnrm"))
      .filter(col("qid") < 10)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    def top3(scoreOf: Column): DataFrame = e
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", scoreOf)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("vec_id").as("vid"))
    // NOT checkpointed: both truth references share the window exchange
    // via ReuseExchange; a checkpoint measured 0.39 → 0.54 s (A/B).
    val exact3 = top3(dotD(col("qemb"), col("embedding")) / (col("qnrm") * col("nrm")))
    val trunc3 = top3(dotD(col("qtemb"), col("temb")) / (col("qtnrm") * col("tnrm")))
    val hits = trunc3.join(exact3, Seq("qid", "vid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
    exact3.groupBy(col("qid")).agg(count(lit(1)).as("k"))
      .join(hits, Seq("qid"), "left")
      .select(
        col("qid"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        col("k"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("k").cast("double")).as("recall")
      )
  }

  /** MinHash accuracy audit: for every LSH candidate pair, the sketch's
    * Jaccard ESTIMATE (matching components / 12) against the exact
    * shingle-set Jaccard — the per-pair companion of [[annRecall]]: it
    * measures what the near-dup pipeline's threshold actually means
    * before anyone tunes it. All arithmetic is integer counts and single
    * IEEE divisions, so the DuckDB oracle reproduces it exactly.
    *
    * Scale: the signature frame is 12 longs + id per doc; the pair join
    * is two id equijoins against the LSH candidates (bounded by bucket
    * collisions), and the exact-Jaccard side reuses the same
    * shingle-set join shape as [[ngramJaccard]]. */
  def minhashEstimate(spark: SparkSession, dir: String): DataFrame = {
    val mins = minhashSigs(spark, dir)
    val nSeeds = MinhashSeeds.size
    val nMatch = MinhashSeeds.indices.map(i =>
      when(col(s"a.mh$i") === col(s"b.mh$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    // candidates banded from the SAME signature frame joined below —
    // the shingle+hash pass appears once in the plan (identical
    // exchange subtrees also dedupe via ReuseExchange)
    val pairs = lshCandidates(mins)
      .join(mins.as("a"), col("doc_a") === col("a.doc_id"))
      .join(mins.as("b"), col("doc_b") === col("b.doc_id"))
      .select(col("doc_a"), col("doc_b"), nMatch.as("n_match"))
    val docs = Tables.documents(spark, dir)
      .withColumn("ws", wordTokens(col("text")))
      .select(col("doc_id"), array_distinct(shingleCol(col("ws"))).as("shs"))
    pairs
      .join(docs.select(col("doc_id").as("doc_a"), col("shs").as("shs_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("shs").as("shs_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .withColumn("na", size(col("shs_a")).cast("long"))
      .withColumn("nb", size(col("shs_b")).cast("long"))
      .select(
        col("doc_a"), col("doc_b"), col("n_match"),
        (col("n_match").cast("double") / lit(nSeeds.toDouble)).as("est_jaccard"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
          .as("exact_jaccard")
      )
  }

  /** Exact n-gram Jaccard over MinHash-LSH candidate pairs: the candidate
    * set comes from the band-signature equijoin (`minhashLsh`), so the
    * pair space is bounded by LSH bucket collisions — never a
    * (lang, source) self-join, whose buckets cover nearly the whole
    * corpus on real data ("en" × "common_crawl" ≈ everything) and go
    * quadratic. Exact |∩|/|∪| of distinct shingle sets then re-ranks the
    * candidates; per-pair cost is two doc_id equijoins plus one
    * set-intersection, linear in the candidate count. */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val cands = minhashLsh(spark, dir)
    val docs = Tables.documents(spark, dir)
      .withColumn("ws", wordTokens(col("text")))
      .select(col("doc_id"), array_distinct(shingleCol(col("ws"))).as("shs"))
    cands
      .join(docs.select(col("doc_id").as("doc_a"), col("shs").as("shs_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("shs").as("shs_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .withColumn("na", size(col("shs_a")).cast("long"))
      .withColumn("nb", size(col("shs_b")).cast("long"))
      .withColumn(
        "jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double")
      )
      .select(col("doc_a"), col("doc_b"), col("inter"), col("jaccard"))
  }

  /** Asymmetric containment over the LSH candidates — the dedup signal
    * symmetric Jaccard structurally MISSES: a 50-shingle doc quoted
    * whole inside a 5000-shingle doc scores Jaccard ≈ 0.01 (union-
    * dominated) but containment 1.0 on the small side. Broder's
    * containment |A∩B|/|A| per direction, plus the max — the quote /
    * excerpt / wrapper-page detector every curation pipeline runs beside
    * near-dup.
    *
    * Exactness: integer set sizes and intersections; the three ratios
    * are single IEEE divisions.
    *
    * Scale: identical shape to [[ngramJaccard]] — two doc_id equijoins
    * over the LSH-bounded candidates, per-pair set intersect. (LSH
    * recall on asymmetric pairs is inherited: a wholly-contained small
    * doc shares its minhashes with probability ≈ containment, so
    * high-containment pairs are exactly the ones LSH keeps.) */
  def ngramContainment(spark: SparkSession, dir: String): DataFrame = {
    val cands = minhashLsh(spark, dir)
    val docs = Tables.documents(spark, dir)
      .withColumn("ws", wordTokens(col("text")))
      .select(col("doc_id"), array_distinct(shingleCol(col("ws"))).as("shs"))
    cands
      .join(docs.select(col("doc_id").as("doc_a"), col("shs").as("shs_a")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("shs").as("shs_b")), "doc_b")
      .withColumn("inter", size(array_intersect(col("shs_a"), col("shs_b"))).cast("long"))
      .withColumn("na", size(col("shs_a")).cast("long"))
      .withColumn("nb", size(col("shs_b")).cast("long"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("na"), col("nb"),
        (col("inter").cast("double") / col("na").cast("double")).as("containment_a"),
        (col("inter").cast("double") / col("nb").cast("double")).as("containment_b"),
        (col("inter").cast("double") /
          least(col("na"), col("nb")).cast("double")).as("max_containment"))
  }

  // ——— Product quantization (the FAISS IVF-PQ compression path) ———

  /** PQ geometry: the 64-dim embeddings split into [[PqM]] contiguous
    * subspaces of [[PqSubDim]] dims; each subspace gets its own
    * [[PqCodes]]-entry codebook. A vector's PQ code is then M small
    * ints — 4 bytes here vs 256 bytes of floats — which is what makes
    * 100 TB of embeddings searchable from memory: the codes table is
    * ~64× smaller than the raw vectors, and query-time distances come
    * from a Q×M×K lookup table instead of touching raw vectors at all
    * (asymmetric distance computation). */
  private[graft] val PqM = 4
  private[graft] val PqSubDim = 16
  private[graft] val PqCodes = 16

  /** Strict total order for the in-row code argmin: squared-L2 distance
    * asc with NULLS LAST, code id asc — [[byCosDescCidAscCmp]]'s
    * ascending sibling, same cross-engine tie-break contract. */
  private val byDistAscCidAscCmp: (Column, Column) => Column = (a, b) =>
    when(a("d").isNull && b("d").isNotNull, 1)
      .when(a("d").isNotNull && b("d").isNull, -1)
      .when(a("d") < b("d"), -1).when(a("d") > b("d"), 1)
      .when(a("cid") < b("cid"), -1).when(a("cid") > b("cid"), 1)
      .otherwise(0)

  /** Per-subspace subvectors: one row per (vec_id, m) with the float
    * slice `sv` and its self-dot `sself` (precomputed once — the
    * squared-L2 to any centroid is then `(sself + cself) − 2·dot`, ONE
    * fold per pair instead of three; the expression tree order is
    * pinned and mirrored verbatim in the oracle so distances agree
    * bitwise). A narrow map over the scan — the M× row fan-out carries
    * 1/M-length slices, so total bytes are unchanged. */
  private def pqSubvectors(e: DataFrame): DataFrame =
    e.select(col("vec_id"), col("embedding"))
      .withColumn("m", explode(sequence(lit(1L), lit(PqM.toLong))))
      .withColumn("sv",
        slice(col("embedding"), ((col("m") - 1) * PqSubDim + 1).cast("int"), lit(PqSubDim)))
      .withColumn("sself", dotD(col("sv"), col("sv")))
      .select(col("vec_id"), col("m"), col("sv"), col("sself"))

  /** Seed codebooks: the [[PqCodes]] vectors with smallest md5(vec_id)
    * (the same deterministic pseudo-random sample family as
    * [[ivfAssign]]) contribute their m-th slice as subspace m's seed
    * code — code id = seed vec_id. ≤ M·K rows, always broadcast-able. */
  private def pqSeedCodebook(subs: DataFrame, e: DataFrame): DataFrame = {
    val seeds = e
      .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(PqCodes)
      .select(col("vec_id").as("scid"))
    subs.join(broadcast(seeds), col("vec_id") === col("scid"))
      .select(col("m").as("cm"), col("scid").as("cid"),
        col("sv").as("cv"), col("sself").as("cself"))
  }

  /** Assign every (vec_id, m) subvector its nearest code from a
    * codebook frame (cm, cid, cv, cself): the whole M·K-entry codebook
    * folds to ONE row, broadcasts, and each row filters to its own
    * subspace's entries and argmins in-row — the zero-shuffle
    * [[assignToCentroids]] pattern, per subspace. Adds `code` and its
    * squared-L2 `dist`. */
  private def pqAssignCodes(subs: DataFrame, cb: DataFrame): DataFrame = {
    val row = cb.agg(collect_list(struct(
      col("cm"), col("cid"), col("cv"), col("cself"))).as("cents"))
    val mine = filter(col("cents"), c => c("cm") === col("m"))
    val scored = transform(mine, c =>
      struct(
        ((col("sself") + c("cself")) - lit(2.0) * dotD(col("sv"), c("cv"))).as("d"),
        c("cid").as("cid")))
    subs.join(broadcast(row))
      .withColumn("best", element_at(array_sort(scored, byDistAscCidAscCmp), 1))
      .withColumn("code", col("best")("cid"))
      .withColumn("dist", col("best")("d"))
      .drop("cents", "best")
  }

  /** Lloyd's update over a PQ assignment, kept in per-coordinate form:
    * one row per (subspace, code, pos) with the member count and the
    * exact fixed-point coordinate sum — [[kmeansStep]]'s arithmetic
    * keyed by (cm, cid, pos). ONE compact shuffle, fully
    * map-side-combinable, ≤ M·K·subdim groups. */
  private def pqUpdateAgg(assigned: DataFrame): DataFrame =
    assigned
      .select(col("m").as("cm"), col("code").as("cid"), posexplode(col("sv")))
      .groupBy(col("cm"), col("cid"), col("pos"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("col").cast("double") * lit(1000000.0))).as("qsum"))

  /** The trained codebook frame (cm, cid, cv: array<double>, n_members,
    * cself) reassembled from [[pqUpdateAgg]]'s per-coordinate rows.
    * Empty codes drop out (K can only shrink), matching the SQL
    * restatement. */
  private def pqTrainedCodebook(aggd: DataFrame): DataFrame =
    aggd
      .withColumn("mv",
        col("qsum").cast("double") / (col("n").cast("double") * lit(1000000.0)))
      .groupBy(col("cm"), col("cid"))
      .agg(
        array_sort(collect_list(struct(col("pos"), col("mv")))).as("pm"),
        min(col("n")).as("n_members"))
      .select(col("cm"), col("cid"), transform(col("pm"), p => p("mv")).as("cv"),
        col("n_members"))
      .withColumn("cself", dotD(col("cv"), col("cv")))

  /** One-Lloyd-round trained codebooks for `e` — seed assign → exact
    * fixed-point update. Production would loop like [[kmeansTrain]];
    * one round is the oracle-pinned shape (every further round repeats
    * the same two steps). */
  private def pqTrain(e: DataFrame): DataFrame = {
    val subs = pqSubvectors(e)
    // localCheckpoint the ≤ M·K-row codebook: its lineage is the full
    // corpus-sized training pass (seed assign + exact Lloyd update), and
    // every consumer (the corpus encode AND the query ADC table) would
    // otherwise re-run that pass — measured 3.98 → 2.56 s on ivfpq_ann
    // at sf0.1. The materialized frame is 64 rows at ANY corpus size.
    pqTrainedCodebook(pqUpdateAgg(pqAssignCodes(subs, pqSeedCodebook(subs, e))))
      .localCheckpoint()
  }

  /** Trained PQ codebooks, exploded to one row per (subspace, code,
    * pos) with the member count and centroid coordinate — the artifact
    * a PQ index persists.
    *
    * Scale (100 TB): training runs on a SAMPLE in production (the
    * codebook only needs the distribution, not the corpus); the fixture
    * trains on the full table, and the plan shape is the point — a
    * zero-shuffle broadcast-argmin assign plus one compact
    * (subspace, code, pos) shuffle, nothing keyed on a raw vector. */
  def pqCodebook(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val subs = pqSubvectors(e)
    pqUpdateAgg(pqAssignCodes(subs, pqSeedCodebook(subs, e)))
      .select(
        col("cm").as("subspace"), col("cid").as("code"),
        (col("pos") + 1).cast("long").as("pos"), col("n").as("n_members"),
        (col("qsum").cast("double") / (col("n").cast("double") * lit(1000000.0)))
          .as("centroid"))
  }

  /** Every vector's PQ code per subspace (plus its quantization error
    * `dist`) — the 64×-compressed representation the ANN path searches.
    * Encoding is the zero-shuffle broadcast-argmin narrow map: at
    * 100 TB this is one pass over the corpus scan, no shuffle at all. */
  def pqEncode(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    pqAssignCodes(pqSubvectors(e), pqTrain(e))
      .select(col("vec_id"), col("m").as("subspace"), col("code"), col("dist"))
  }

  /** PQ top-3 per query via asymmetric distance computation: each query
    * precomputes its distance to every code (a Q×M×K table — here
    * 10×4×16 = 640 rows, broadcast; NEVER corpus-sized), the encoded
    * corpus joins that table on (subspace, code), and the per-(qid,
    * vid) total is a fixed-point sum of M BIGINT terms — exact and
    * order-independent, so the cross-engine ranking can't flake on
    * float summation order.
    *
    * Scale (100 TB): the corpus side carries only (vec_id, m, code) —
    * the compressed codes, not vectors; the only shuffle is the
    * (qid, vid)-keyed partial-sum aggregation, fully map-side
    * combinable; top-k prunes per query via WindowGroupLimit. This is
    * the query path that replaces [[annIvf]]'s raw-vector bucket scan
    * when the vectors themselves no longer fit anywhere. */
  def pqAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val subs = pqSubvectors(e)
    val cb = pqTrain(e)
    val enc = pqAssignCodes(subs, cb)
      .select(col("vec_id").as("vid"), col("m"), col("code"))
    val dt = subs.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("m").as("qm"),
        col("sv").as("qsv"), col("sself").as("qself"))
      .join(broadcast(cb), col("qm") === col("cm"))
      .select(col("qid"), col("qm"), col("cid"),
        floor(((col("qself") + col("cself")) - lit(2.0) * dotD(col("qsv"), col("cv")))
          * lit(1000000.0)).cast("long").as("d_fp"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adist_fp").asc, col("vid").asc)
    enc.join(broadcast(dt), col("m") === col("qm") && col("code") === col("cid"))
      .filter(col("vid") =!= col("qid"))
      .groupBy(col("qid"), col("vid"))
      .agg(sum(col("d_fp")).as("adist_fp"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("vid"), col("adist_fp"), col("rn").cast("long").as("rn"))
  }

  /** Recall@3 of the PQ/ADC path against exact full-vector squared-L2
    * top-3 — [[annRecall]]'s companion for the compressed index: the
    * number that says what the 64× compression costs in accuracy
    * before anyone ships it. Same exact-distance formula shape
    * ((qself + self) − 2·dot) as the PQ arms, so the comparison is
    * apples-to-apples L2. */
  /** Exact full-vector squared-L2 top-3 for the `vec_id < 10` query set —
    * the ground truth shared by [[pqRecall]] and [[ivfPqRecall]]. */
  private def exactL2Top3(spark: SparkSession, dir: String): DataFrame = {
    val en = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding"))
      .withColumn("self", dotD(col("embedding"), col("embedding")))
    val q = en.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"), col("self").as("qself"))
    val w = Window.partitionBy(col("qid")).orderBy(col("d").asc, col("vid").asc)
    en.join(broadcast(q), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("vid"),
        ((col("qself") + col("self")) - lit(2.0) * dotD(col("qemb"), col("embedding"))).as("d"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("vid"))
  }

  /** Recall@3 of an approximate (qid, vid) top-3 frame against
    * [[exactL2Top3]] — one row per query with hit count and recall. */
  private def recallAgainstExact(
      spark: SparkSession, dir: String, approx3: DataFrame): DataFrame = {
    // localCheckpoint the truth frame: the hit semi-join AND the per-query
    // k fold both read it — un-materialized, the exact corpus×queries
    // scan ran twice. 3 rows per query at any corpus size.
    val exact3 = exactL2Top3(spark, dir).localCheckpoint(true)
    val hits = approx3.join(exact3, Seq("qid", "vid"), "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("n_hit"))
    exact3.groupBy(col("qid")).agg(count(lit(1)).as("k"))
      .join(hits, Seq("qid"), "left")
      .select(
        col("qid"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        col("k"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") / col("k").cast("double")).as("recall"))
  }

  def pqRecall(spark: SparkSession, dir: String): DataFrame =
    recallAgainstExact(spark, dir, pqAnn(spark, dir).select(col("qid"), col("vid")))

  /** nDCG@3 of the IVF retrieval against the exact cosine top-3 — the
    * graded companion to [[annRecall]]'s hit-rate: recall treats rank-1
    * and rank-3 hits alike, nDCG pays position. Gains are 3/2/1 by
    * EXACT rank; discounts are the standard 1/log₂(p+1) — but log is
    * NOT a correctly-rounded IEEE op, so the three discount values are
    * pinned as identical literals in both engines (1, 0.6309297535714575,
    * 0.5) instead of computed; each gain·discount term is floor-quantized
    * to picounits and summed as BIGINT (order-independent), with ONE
    * pinned division chain by the ideal DCG at the end.
    *
    * Scale: both retrieval chains are the existing bounded shapes
    * ([[knnCosine]]'s broadcast-query scan, [[annIvf]]'s bucket
    * equijoin); the join keys on (qid, vid); 10 rows out. */
  def annNdcg(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val q = e.select(col("vec_id").as("qid"), col("embedding").as("qemb"),
      col("nrm").as("qnrm")).filter(col("qid") < 10)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid").asc)
    val exact = e.join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("cos", dotD(col("qemb"), col("embedding")) / (col("qnrm") * col("nrm")))
      .select(col("qid"), col("vec_id").as("vid"), col("cos"))
      .withColumn("er", row_number().over(w))
      .filter(col("er") <= 3)
      .select(col("qid"), col("vid"), (lit(4L) - col("er")).as("gain"))
    val approx = annIvf(spark, dir)
      .withColumn("p", row_number().over(w))
    val disc = when(col("p") === 1, lit(1.0))
      .when(col("p") === 2, lit(0.6309297535714575))
      .otherwise(lit(0.5))
    approx.join(exact, Seq("qid", "vid"), "left")
      .select(col("qid"),
        floor(coalesce(col("gain"), lit(0L)).cast("double") * disc *
          lit(1000000000000.0)).cast("long").as("t_fp"))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_listed"), sum(col("t_fp")).as("dcg_fp"))
      .select(col("qid"), col("n_listed"),
        ((col("dcg_fp").cast("double") / lit(1000000000000.0)) /
          lit(3.0 * 1.0 + 2.0 * 0.6309297535714575 + 1.0 * 0.5)).as("ndcg"))
  }

  // ── IVF+PQ composite (residual-encoded coarse+fine index) ─────────────

  /** Per-vector residual against its OWN coarse centroid, as a
    * (vec_id, bucket, embedding: array<double>) frame ready for the PQ
    * chain. Residual subtraction is element-wise IEEE double — exact and
    * identical on both engines. */
  private def residualFrame(e: DataFrame, asn: DataFrame): DataFrame =
    residualFrameWith(asn, ivfCentFrame(e).select(col("cid"), col("cemb")))

  /** [[residualFrame]] against an EXPLICIT centroid frame — the seam
    * the persisted-index append path needs (residuals vs the STORED
    * centroids, not re-derived ones). */
  private def residualFrameWith(asn: DataFrame, cent: DataFrame): DataFrame =
    asn.join(broadcast(cent), col("bucket") === col("cid"))
      .select(col("vec_id"), col("bucket"),
        zip_with(col("embedding"), col("cemb"),
          (x, c) => x.cast("double") - c.cast("double")).as("embedding"))

  /** IVF+PQ composite top-3 — the production billion-vector index shape
    * (Jégou et al. 2011; FAISS `IVFPQ`): the coarse quantizer
    * ([[ivfAssign]]'s k sampled centroids) routes each vector to a
    * bucket, PQ encodes the RESIDUAL v − c(bucket) (residuals are
    * centered near 0, so the same K codes spend their resolution on the
    * local neighborhood instead of the whole space — the whole reason
    * the composite beats flat PQ), and a query scans only its
    * top-nprobe buckets with a per-(query, bucket) ADC table over the
    * residual codebooks.
    *
    * Exactness: residuals are exact double subtractions; the PQ chain is
    * the [[pqAnn]] chain verbatim on the residual frame (pinned
    * `(sself + cself) − 2·dot` order, (dist, cid) tie-breaks, exact
    * fixed-point Lloyd update); ADC entries floor to BIGINT BEFORE the
    * per-pair sum, so ranking is order-independent.
    *
    * Scale (100 TB): everything the two parents prove, composed — the
    * corpus side of the search carries (vid, bucket, m, code): 4 small
    * ints per vector, no raw vectors anywhere in the query path; the ADC
    * table is Q×nprobe×M×K rows, broadcast; candidates come from the
    * bucket equijoin (a vector pairs with a query ONLY under its own
    * bucket, so no dedup is needed); the one shuffle is the
    * (qid, vid)-keyed 8-byte partial-sum aggregation, map-side
    * combinable; top-k prunes via WindowGroupLimit. */
  def ivfPqAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    // localCheckpoint the coarse assignment: residual frame, encode join
    // and ADC query side all read it, and the chain is NARROW (broadcast
    // argmax, no exchange), so ReuseExchange cannot share it — without
    // the checkpoint the corpus argmax ran 3×. This is exactly the frame
    // the persisted-index build writes as postings.
    val asn = ivfAssign(spark, dir).localCheckpoint(true)
    val res = residualFrame(e, asn)
    val subsR = pqSubvectors(res)
    val cb = pqTrain(res)
    val enc = pqAssignCodes(subsR, cb)
      .select(col("vec_id").as("vid"), col("m"), col("code"))
      .join(asn.select(col("vec_id").as("vid"), col("bucket").as("vbucket")), "vid")
    val cent = ivfCentFrame(e).select(col("cid").as("pcid"), col("cemb"))
    ivfPqSearch(enc, ivfPqAdcTable(asn, cent, cb))
  }

  /** The per-(query, probed-bucket) ADC table of the IVF+PQ composite:
    * queries' residuals against each probed centroid, sliced per
    * subspace, distanced against every codebook entry, floored to
    * BIGINT. Shared verbatim by [[ivfPqAnn]] (in-session codebooks) and
    * [[ivfPqAnnServe]] (persisted codebooks) so the two paths cannot
    * diverge. `qAsn` carries (vec_id, embedding, probe_buckets); `cent`
    * is (pcid, cemb); `cb` a (cm, cid, cv, cself) codebook frame. */
  private def ivfPqAdcTable(qAsn: DataFrame, cent: DataFrame, cb: DataFrame): DataFrame =
    ivfPqAdcTableFrom(qAsn.filter(col("vec_id") < 10), cent, cb)

  /** [[ivfPqAdcTable]] without the fixture's query-set scoping — the
    * streaming serving path feeds an ALREADY-scoped micro-batch (the
    * batch IS the query set), so the `vec_id < 10` fixture filter must
    * not re-apply. */
  private def ivfPqAdcTableFrom(qAsn: DataFrame, cent: DataFrame, cb: DataFrame): DataFrame = {
    val q = qAsn
      .select(col("vec_id").as("qid"), col("embedding").as("qemb"),
        explode(col("probe_buckets")).as("pb"))
      .join(broadcast(cent), col("pb") === col("pcid"))
      .withColumn("qr", zip_with(col("qemb"), col("cemb"),
        (x, c) => x.cast("double") - c.cast("double")))
      .withColumn("m", explode(sequence(lit(1L), lit(PqM.toLong))))
      .withColumn("qsv",
        slice(col("qr"), ((col("m") - 1) * PqSubDim + 1).cast("int"), lit(PqSubDim)))
      .withColumn("qself", dotD(col("qsv"), col("qsv")))
      .select(col("qid"), col("pb"), col("m").as("qm"), col("qsv"), col("qself"))
    q.join(broadcast(cb), col("qm") === col("cm"))
      .select(col("qid"), col("pb"), col("qm"), col("cid"),
        floor(((col("qself") + col("cself")) - lit(2.0) * dotD(col("qsv"), col("cv")))
          * lit(1000000.0)).cast("long").as("d_fp"))
  }

  /** The IVF+PQ candidate join + exact fixed-point ADC sum + top-k —
    * [[ivfPqAdcTable]]'s consumer, shared by the in-session and served
    * paths (k = 3, the answer set) and by [[ivfPqRerank]]'s shortlist
    * arm (k = [[PqRerankShortlist]]). `enc` carries
    * (vid, m, code, vbucket). */
  private def ivfPqSearch(enc: DataFrame, dt: DataFrame, k: Int = 3,
      excludeSelf: Boolean = true): DataFrame = {
    val w = Window.partitionBy(col("qid")).orderBy(col("adist_fp").asc, col("vid").asc)
    enc.join(broadcast(dt),
        col("vbucket") === col("pb") && col("m") === col("qm") && col("code") === col("cid"))
      // excludeSelf=false keeps the raw ranking for the shared (deduped)
      // serving path, which applies per-duplicate exclusion at fan-out
      .filter(if (excludeSelf) col("vid") =!= col("qid") else lit(true))
      .groupBy(col("qid"), col("vid"))
      .agg(sum(col("d_fp")).as("adist_fp"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vid"), col("adist_fp"), col("rn").cast("long").as("rn"))
  }

  /** Persist the IVF+PQ composite index — [[buildIvfIndex]] extended to
    * the residual codebooks: coarse centroids, the trained residual PQ
    * codebooks, and the encoded postings (vid, m, code) PARTITIONED BY
    * coarse bucket. The postings carry 3 small ints per (vector,
    * subspace) — the ~64×-compressed representation — and the bucket
    * partitioning makes the serving join dynamic-partition-prunable,
    * exactly like the raw-vector IVF layout. */
  def buildIvfPqIndex(spark: SparkSession, dir: String, indexPath: String): Unit = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val asn = ivfAssign(spark, dir)
    val res = residualFrame(e, asn)
    val cb = pqTrain(res)
    ivfCentFrame(e).write.mode("overwrite").parquet(s"$indexPath/centroids")
    cb.write.mode("overwrite").parquet(s"$indexPath/codebooks")
    pqAssignCodes(pqSubvectors(res), cb)
      .select(col("vec_id").as("vid"), col("m"), col("code"))
      .join(asn.select(col("vec_id").as("vid"), col("bucket")), "vid")
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$indexPath/postings")
    writeIdMapFromPostings(spark, indexPath, idCol = "vid", dedup = true)
    writeVecAttrs(e, indexPath, "overwrite", Some(docSrcOf(spark, dir)))
  }

  /** Serve [[ivfPqAnn]] from a PERSISTED index ([[buildIvfPqIndex]]) —
    * the train-once/serve-many twin: query vectors route against the
    * stored coarse centroids (no training anywhere in the plan), the
    * ADC table comes from the stored residual codebooks, and the
    * bucket-partitioned postings join is dynamic-partition-pruned to
    * the probed buckets. Bit-identical to [[ivfPqAnn]]: same centroids
    * and codebooks (parquet round-trips doubles exactly), same routing
    * argmax, the shared [[ivfPqAdcTable]]/[[ivfPqSearch]] arithmetic. */
  def ivfPqAnnServe(spark: SparkSession, dir: String, indexPath: String,
      nprobe: Int = IvfNprobe,
      queryFilter: Column = lit(true),
      postingsFilter: DataFrame => DataFrame = identity,
      k: Int = 3): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val centStored = spark.read.parquet(s"$indexPath/centroids")
    val centRow = centStored
      .agg(collect_list(struct(col("cid"), col("cemb"), col("cnrm"))).as("cents"))
    val qAsn = assignFromCents(
      e.filter(col("vec_id") < 10 && queryFilter), centRow, nprobe)
    val cent = centStored.select(col("cid").as("pcid"), col("cemb"))
    val cb = spark.read.parquet(s"$indexPath/codebooks")
    val enc = postingsFilter(spark.read.parquet(s"$indexPath/postings")
      // the partition column reads back as INT (directory-name
      // inference); restore the join key's LONG type explicitly
      .select(col("vid"), col("m"), col("code"), col("bucket").cast("long").as("vbucket")))
    ivfPqSearch(enc, ivfPqAdcTable(qAsn, cent, cb), k)
  }

  /** Shortlist width of the re-rank stage — candidates kept from the
    * ADC scan per query, each paying one raw-vector fetch. */
  private[graft] val PqRerankShortlist = 10

  /** IVFPQ + exact re-rank — the FAISS `IndexRefine` recipe, and the
    * production serving shape at 100 TB: the ~64×-compressed in-memory
    * codes produce a per-query ADC shortlist
    * (top-[[PqRerankShortlist]] via the shared [[ivfPqSearch]]), and
    * only the shortlist's RAW vectors are fetched — the broadcast
    * ≤ |Q|·k' shortlist hash-joins one column-pruned scan of the
    * vector store, never a posting-sized read — and re-scored with
    * EXACT cosine; the answer is the exact top-3 of the shortlist.
    * Recall recovers toward exact search while the expensive store is
    * touched per-candidate, not per-posting. The shortlist is
    * localCheckpointed once, so the ADC scan runs exactly once and is
    * never re-optimized into the re-rank plan (PlanSpec pins the
    * checkpoint-fed, broadcast-only, shuffle-free shape). */
  def ivfPqRerank(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndex(spark, dir, "ivfpq")(buildIvfPqIndex(spark, dir, _))
    val short = ivfPqAnnServe(spark, dir, idx, k = PqRerankShortlist)
      .select(col("qid"), col("vid"))
      .localCheckpoint(true)
    val e = withNorm(Tables.embeddings(spark, dir))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("rqid"), col("embedding").as("rqemb"),
        col("nrm").as("rqnrm"))
    // the fetch IS a broadcast hash join: one column-pruned scan of the
    // vector store against the broadcast ≤ |Q|·k' shortlist — no
    // shuffle, no semi-join subquery, the store streamed exactly once
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid").asc)
    e.join(broadcast(short), col("vec_id") === col("vid"))
      .join(broadcast(q), col("qid") === col("rqid"))
      .withColumn("cos",
        dotD(col("rqemb"), col("embedding")) / (col("rqnrm") * col("nrm")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("vid"), col("cos"), col("rn").cast("long").as("rn"))
  }

  /** A self-managing persisted index under the JVM temp dir: (re)builds
    * via `build` only when the fixture's embeddings files changed
    * (name/length/mtime stamp), returns the index path. First run pays
    * the one-time build; every later run is the serving cost an index
    * exists for — which is exactly what the served bench rows should
    * price. */
  private def servedIndex(spark: SparkSession, dir: String, family: String)(
      build: String => Unit): String =
    servedIndexWith(dir, family, embeddingsStamp(spark, dir))(build)

  /** [[servedIndex]] generalized over the staleness stamp so indexes
    * over OTHER fixture tables (the documents-driven LSH index) share
    * the build-once/serve-many cache discipline.
    *
    * Concurrency note: the cache path is per-box and the build runs in
    * place, so it assumes ONE JVM exercises a given (fixture, family)
    * at a time — the driver's verify/bench/test phases run
    * sequentially, which satisfies it. Two JVMs racing the same cache
    * (e.g. a manual Verify run concurrent with `sbt test` on the same
    * fixtures) can observe a half-built index; crash-safety is still
    * guaranteed (the stamp is written LAST, so an interrupted build
    * re-runs), only cross-JVM concurrency is out of contract. */
  private[queries] def servedIndexWith(dir: String, family: String, stamp: String)(
      build: String => Unit): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val idx = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_${family}_$safe").getPath
    val stampFile = new java.io.File(idx, "_stamp")
    val fresh = stampFile.exists() &&
      new String(java.nio.file.Files.readAllBytes(stampFile.toPath), "UTF-8") == stamp
    if (!fresh) {
      build(idx)
      java.nio.file.Files.write(stampFile.toPath, stamp.getBytes("UTF-8"))
    }
    idx
  }

  /** [[ivfPqAnnServe]] behind the self-managing index — the
    * `queries`-map entry point for the composite index's serving path. */
  def ivfPqAnnServed(spark: SparkSession, dir: String): DataFrame =
    ivfPqAnnServe(spark, dir,
      servedIndex(spark, dir, "ivfpq")(buildIvfPqIndex(spark, dir, _)))

  /** [[ivfPqAnnServed]] at a caller-chosen probe width — the composite
    * index's query-time recall knob ([[annIvfServeAt]]'s PQ twin): the
    * ADC distance uses each PROBED bucket's centroid for the query
    * residual, so widening nprobe composes with the quantization
    * unchanged and never rebuilds codebooks or postings. */
  def ivfPqAnnServeAt(spark: SparkSession, dir: String, nprobe: Int): DataFrame =
    ivfPqAnnServe(spark, dir,
      servedIndex(spark, dir, "ivfpq")(buildIvfPqIndex(spark, dir, _)), nprobe)

  /** [[annIvfServe]] behind the self-managing index — the raw-vector
    * IVF serving twin of [[ivfPqAnnServed]], oracle-pinned bit-identical
    * to [[annIvf]]. */
  def annIvfServed(spark: SparkSession, dir: String): DataFrame =
    annIvfServe(spark, dir,
      servedIndex(spark, dir, "ivf")(buildIvfIndex(spark, dir, _)))

  /** [[annIvfServed]] at a caller-chosen probe width — the serving-path
    * twin of [[annIvfNprobe]]: same persisted index, nprobe decided at
    * query time (an index never needs rebuilding to change recall). */
  def annIvfServeAt(spark: SparkSession, dir: String, nprobe: Int): DataFrame =
    annIvfServe(spark, dir,
      servedIndex(spark, dir, "ivf")(buildIvfIndex(spark, dir, _)), nprobe)

  /** The fixed facet value the `filtered_ann_served`/`ivfpq_ann_filtered`
    * rows scope to — literal so the DuckDB oracle can mirror it. */
  private[graft] val FacetLabel = 1L

  /** `vec_facet_profile`: [[graft.queries.LexQueries.facetProfile]]'s
    * vector twin — per-label vector counts straight from the served IVF
    * index's attrs sidecar (one partition column + one thin id column;
    * no embedding byte, the corpus is not in the plan). The pre-flight
    * for both faceted serving (`--facetLabel`) and the facet-scoped
    * takedown ([[ivfIndexDeleteLabel]]), and the sidecar's own audit —
    * the oracle recomputes the histogram from the embeddings table, so
    * a writer that dropped or duplicated facet rows hash-mismatches. */
  def vecFacetProfile(spark: SparkSession, dir: String): DataFrame =
    facetProfileOf(spark,
      servedIndex(spark, dir, "ivf")(buildIvfIndex(spark, dir, _)))

  /** `ivfpq_facet_profile`: [[vecFacetProfile]] over the COMPOSITE
    * index's sidecar — same O(partition-metadata) histogram, auditing
    * the PQ writer family's facet maintenance end to end (the oracle
    * recomputes from embeddings⋈documents, so a code-path writer that
    * dropped or duplicated facet rows hash-mismatches). */
  def ivfPqFacetProfile(spark: SparkSession, dir: String): DataFrame =
    facetProfileOf(spark,
      servedIndex(spark, dir, "ivfpq")(buildIvfPqIndex(spark, dir, _)))

  /** The per-(label, source) histogram shared by the vector profile
    * rows: both axes are partition columns of the attrs tree, so the
    * plan reads ZERO data columns (ReadSchema: struct<> — PlanSpec
    * pins it) and folds from partition metadata alone. */
  private def facetProfileOf(spark: SparkSession, idx: String): DataFrame =
    spark.read.parquet(s"$idx/attrs")
      .groupBy(col("label").cast("long").as("label"),
        col("source").cast("string").as("source"))
      .agg(count(lit(1)).as("n_vecs"))

  /** `filtered_ann_served`: FACETED retrieval from the persisted IVF
    * index — [[graft.queries.LexQueries.bm25Filtered]]'s vector twin,
    * and the production ANN query shape ("nearest neighbors within
    * label/language/source X" is the second-most-common retrieval after
    * plain top-k): the IVF-served top-3 restricted to
    * label = [[FacetLabel]] candidates with FILTER-FIRST semantics —
    * the facet allowlist (a partition-pruned read of the `attrs/`
    * sidecar's one label directory, one thin column, zero embedding
    * bytes) screens the probed buckets' posting rows BEFORE the cosine
    * and the top-k window, so k fills among qualifying vectors whenever
    * k exist in the probed buckets, and surviving scores are
    * bit-identical to the unfiltered serve (cosine is per-pair — no
    * corpus statistic shifts). Versus [[filteredAnn]] (exact kNN over a
    * corpus scan), this is the INDEX-SERVED path: O(query ×
    * probed-bucket ∩ facet), never O(corpus) — what a standing faceted
    * retrieval service runs. */
  def filteredAnnServed(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndex(spark, dir, "ivf")(buildIvfIndex(spark, dir, _))
    ivfServeFrom(spark, withNorm(Tables.embeddings(spark, dir)), idx,
      postingsFilter = facetPostingsFilter(spark, idx, Some(FacetLabel)))
  }

  /** `ivfpq_ann_filtered`: [[filteredAnnServed]] for the COMPOSITE
    * index — the same facet allowlist screens the CODE posting rows
    * before the ADC join, so the compressed serving path gains the
    * identical filter-first facet semantics (the 100 TB deployment
    * serves from codes; its faceted queries must too). */
  def ivfPqAnnFiltered(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndex(spark, dir, "ivfpq")(buildIvfPqIndex(spark, dir, _))
    ivfPqAnnServe(spark, dir, idx,
      postingsFilter = facetPostingsFilter(spark, idx, Some(FacetLabel)))
  }

  /** Incremental growth of the persisted IVF index — the lifecycle step
    * after train-once ([[buildIvfIndex]]) and serve-many
    * ([[annIvfServe]]): new vectors arrive and must JOIN the index
    * without retraining it. Centroids train on the BASE slice only
    * (vec_id % 4 != 0 — a deterministic 75% of the fixture standing in
    * for "the corpus the index was built on"); the delta slice is then
    * routed with the FROZEN stored centroids and appended to the
    * bucket-partitioned postings — `mode("append")` under
    * `partitionBy(bucket)` writes new files ONLY into the touched
    * bucket directories, existing posting files are never rewritten
    * (AppendSpec proves byte-identity). Routing delta against frozen
    * centroids is exactly how a production IVF index absorbs inserts
    * between periodic retrains: the index stays correct-as-built
    * (assignment is centroid-deterministic, so append ≡ having indexed
    * base+delta in one pass), while recall drifts only as the data
    * distribution does — which [[annRecall]]-style audits monitor. */
  def buildIvfIndexAppend(spark: SparkSession, dir: String, indexPath: String): Unit = {
    buildIvfIndexBase(spark, dir, indexPath)
    appendIvfIndex(spark, dir, indexPath)
  }

  /** Train-and-index the BASE slice only (vec_id % 4 != 0) — the
    * starting state of the append lifecycle. */
  def buildIvfIndexBase(spark: SparkSession, dir: String, indexPath: String): Unit = {
    val base = withNorm(Tables.embeddings(spark, dir))
      .filter(col("vec_id") % 4 =!= 0)
    ivfCentFrame(base).write.mode("overwrite").parquet(s"$indexPath/centroids")
    assignFromCents(base, storedCents(spark, indexPath))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$indexPath/postings")
    writeIdMapFromPostings(spark, indexPath)
    writeVecAttrs(base, indexPath, "overwrite", Some(docSrcOf(spark, dir)))
  }

  /** One insert batch: route the delta slice (vec_id % 4 == 0) with the
    * STORED centroids — no training anywhere in this plan — and append
    * per-bucket. Only the touched bucket directories gain files;
    * existing posting files are never rewritten. */
  def appendIvfIndex(spark: SparkSession, dir: String, indexPath: String): Unit = {
    assertNoMaintenance(new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration), indexPath, "appendIvfIndex")
    val delta = withNorm(Tables.embeddings(spark, dir))
      .filter(col("vec_id") % 4 === 0)
    // facets must cover the delta; attrs land first (the harmless crash
    // direction — see writeVecAttrs)
    writeVecAttrs(delta, indexPath, "append", Some(docSrcOf(spark, dir)))
    val asn = assignFromCents(delta, storedCents(spark, indexPath))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
    asn.write.partitionBy("bucket").mode("append")
      .parquet(s"$indexPath/postings")
    appendIdMap(asn, indexPath)
  }

  /** Absorb one shard's persisted IVF index into another WITHOUT
    * retraining or touching either corpus — the shard-parallel build
    * story at 100 TB: N workers each build an independent index over
    * their slice (the [[buildIvfIndex]] layout), then merges fold them
    * into the serving index. The destination's centroids stay FROZEN
    * (serving plans, cached centroid arrays, and recall audits remain
    * valid); the source's postings — which already carry
    * (vec_id, embedding, nrm), so the source CORPUS is never read —
    * are re-routed against the destination centroids and appended
    * per-bucket (`mode("append")` under `partitionBy(bucket)`: only
    * touched bucket directories gain files, existing posting files are
    * never rewritten — MergeSpec pins byte-identity), and the sidecar
    * gains the delta's (vec_id, bucket) pairs. Source vectors
    * tombstoned before the merge are dropped on the way in — a free
    * physical purge; their (vec_id, src-bucket) tombstone rows would
    * be meaningless under destination routing. Cost:
    * O(|src postings| routing) + O(touched buckets) write — never
    * O(dst corpus). (The IVFPQ layout cannot merge index-to-index:
    * its postings carry CODES, not embeddings, and re-encoding
    * residuals against the destination's centroids/codebooks needs the
    * shard corpus — use [[appendIvfPqIndex]]-style routing from the
    * source vectors instead.) */
  def ivfIndexMergeInto(spark: SparkSession, dstIndex: String, srcIndex: String): Unit = {
    val srcTomb = new org.apache.hadoop.fs.Path(s"$srcIndex/tombstones")
    val fs = srcTomb.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assertNoMaintenance(fs, dstIndex, "ivfIndexMergeInto")
    val srcRows = spark.read.parquet(s"$srcIndex/postings")
      .select(col("vec_id"), col("embedding"), col("nrm"))
    val live =
      if (fs.exists(srcTomb)) {
        val tomb = broadcast(spark.read.parquet(srcTomb.toString)
          .select(col("vec_id").as("_tomb_del")).distinct())
        srcRows.join(tomb, srcRows("vec_id") === tomb("_tomb_del"), "left_anti")
      } else srcRows
    // facets must cover the absorbed shard: src attrs (tombstone-purged)
    // append into the destination's per-label directories BEFORE the
    // postings land (the harmless crash direction); a shard built before
    // the sidecar existed simply contributes none
    val srcAttrs = new org.apache.hadoop.fs.Path(s"$srcIndex/attrs")
    if (fs.exists(srcAttrs)) {
      val a = readAttrsTwoAxis(spark, srcAttrs.toString)
      val liveA =
        if (fs.exists(srcTomb)) {
          val tomb = broadcast(spark.read.parquet(srcTomb.toString)
            .select(col("vec_id").as("_tomb_del")).distinct())
          a.join(tomb, a("vec_id") === tomb("_tomb_del"), "left_anti")
        } else a
      liveA.write.partitionBy(VecAttrsPartCols: _*).mode("append")
        .parquet(s"$dstIndex/attrs")
    }
    // routed once, consumed by the postings write AND the sidecar append
    val asn = assignFromCents(live, storedCents(spark, dstIndex))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
      .persist()
    try {
      asn.write.partitionBy("bucket").mode("append").parquet(s"$dstIndex/postings")
      appendIdMap(asn, dstIndex)
    } finally { asn.unpersist(); () }
  }

  /** One shard's independent build in the shard-parallel lifecycle: the
    * standard index layout ([[buildIvfIndex]]) over an arbitrary raw
    * (vec_id, embedding) slice, centroids sampled from the slice. */
  private[graft] def buildIvfIndexSlice(spark: SparkSession, slice: DataFrame,
      indexPath: String, docSrc: Option[DataFrame] = None): Unit =
    buildIvfIndexFrom(withNorm(slice), indexPath, docSrc)

  /** Build over `corpus` with centroids sampled from `centSlice` — the
    * one-pass twin MergeSpec compares the shard merge against. */
  private[graft] def buildIvfIndexSliceCents(spark: SparkSession, corpus: DataFrame,
      centSlice: DataFrame, indexPath: String,
      docSrc: Option[DataFrame] = None): Unit = {
    ivfCentFrame(withNorm(centSlice))
      .write.mode("overwrite").parquet(s"$indexPath/centroids")
    assignFromCents(withNorm(corpus), storedCents(spark, indexPath))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$indexPath/postings")
    writeIdMapFromPostings(spark, indexPath)
    writeVecAttrs(corpus, indexPath, "overwrite", docSrc)
  }

  /** Argmax routing of a raw (vec_id, embedding) frame against a stored
    * index's centroids → (vec_id, bucket) — the routing-parity probe
    * MergeSpec checks merged postings against. */
  private[graft] def routeAgainstIndex(spark: SparkSession, vecs: DataFrame,
      indexPath: String): DataFrame =
    assignFromCents(withNorm(vecs), storedCents(spark, indexPath))
      .select(col("vec_id"), col("bucket").cast("long").as("bucket"))

  /** Shard-parallel build + merge lifecycle behind [[annIvfMerged]]:
    * shard A (odd vec_ids) and shard B (even) each build an independent
    * index from their slice alone; B is then merged into A
    * ([[ivfIndexMergeInto]]). Because routing against frozen centroids
    * is deterministic, "build A, build B, merge" ≡ "assign the whole
    * corpus against shard A's centroids in one pass" — which is exactly
    * what the `ann_ivf_merged` oracle recomputes. */
  def buildIvfIndexMerged(spark: SparkSession, dir: String, indexPath: String): Unit = {
    val e = Tables.embeddings(spark, dir)
    buildIvfIndexSlice(spark, e.filter(col("vec_id") % 2 === 1), indexPath,
      docSrc = Some(docSrcOf(spark, dir)))
    // shard B stages as a SIBLING of the destination (same filesystem —
    // works beyond local mode, unlike a driver-local temp dir) and is
    // deleted once absorbed: the merge never mutates its source, so the
    // shard is pure scratch after ivfIndexMergeInto returns
    val srcIdx = s"${indexPath}_shard_b"
    val fs = new org.apache.hadoop.fs.Path(srcIdx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(srcIdx), true)
    buildIvfIndexSlice(spark, e.filter(col("vec_id") % 2 === 0), srcIdx,
      docSrc = Some(docSrcOf(spark, dir)))
    ivfIndexMergeInto(spark, indexPath, srcIdx)
    fs.delete(new org.apache.hadoop.fs.Path(srcIdx), true)
    ()
  }

  /** [[annIvfServe]] over the shard-merged index
    * ([[buildIvfIndexMerged]]) — same serving plan, centroids from
    * shard A, postings covering both shards. */
  def annIvfMerged(spark: SparkSession, dir: String): DataFrame =
    annIvfServe(spark, dir,
      servedIndex(spark, dir, "ivf_merged")(buildIvfIndexMerged(spark, dir, _)))

  /** Route a raw (vec_id, embedding) batch against a pre-loaded one-row
    * centroid frame — [[appendIvfIndex]]'s routing, batch-scoped, with
    * the centroid load lifted out so a stream caches it once. Exposed
    * for [[graft.streaming.VecIngest]]'s per-micro-batch assignment. */
  private[graft] def routeIngestBatch(batch: DataFrame, centRow: DataFrame): DataFrame =
    assignFromCents(withNorm(batch), centRow)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))

  /** The persisted centroid table folded to the one-row broadcastable
    * array frame [[assignFromCents]] routes against. */
  private def storedCents(spark: SparkSession, indexPath: String): DataFrame =
    spark.read.parquet(s"$indexPath/centroids")
      .agg(collect_list(struct(col("cid"), col("cemb"), col("cnrm"))).as("cents"))

  /** [[annIvfServe]] over the incrementally-grown index
    * ([[buildIvfIndexAppend]]) — same serving plan, centroids from the
    * base slice, postings covering base + appended delta. */
  def annIvfAppended(spark: SparkSession, dir: String): DataFrame =
    annIvfServe(spark, dir,
      servedIndex(spark, dir, "ivf_app")(buildIvfIndexAppend(spark, dir, _)))

  /** IVFPQ mirror of [[buildIvfIndexAppend]]: coarse centroids AND
    * residual codebooks train on the base slice only; the delta slice
    * is routed and RESIDUAL-ENCODED with the frozen stored artifacts
    * and appended per-bucket. Since both the coarse argmax and the PQ
    * code argmin are deterministic functions of the stored arrays,
    * append ≡ one-pass encoding of base+delta — the
    * `ivfpq_ann_appended` oracle pins that with base-filtered training
    * CTEs over the single-chain SQL. */
  def buildIvfPqIndexAppend(spark: SparkSession, dir: String, indexPath: String): Unit = {
    buildIvfPqIndexBase(spark, dir, indexPath)
    appendIvfPqIndex(spark, dir, indexPath)
  }

  /** Train coarse centroids + residual codebooks on the BASE slice
    * (vec_id % 4 != 0) and index its vectors — the starting state of
    * the composite append lifecycle. */
  def buildIvfPqIndexBase(spark: SparkSession, dir: String, indexPath: String): Unit = {
    val base = withNorm(Tables.embeddings(spark, dir))
      .filter(col("vec_id") % 4 =!= 0)
    ivfCentFrame(base).write.mode("overwrite").parquet(s"$indexPath/centroids")
    val centStored = spark.read.parquet(s"$indexPath/centroids")
    val asn = assignFromCents(base, storedCents(spark, indexPath))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
    val res = residualFrameWith(asn, centStored.select(col("cid"), col("cemb")))
    val cb = pqTrain(res)
    cb.write.mode("overwrite").parquet(s"$indexPath/codebooks")
    pqAssignCodes(pqSubvectors(res), cb)
      .select(col("vec_id").as("vid"), col("m"), col("code"))
      .join(asn.select(col("vec_id").as("vid"), col("bucket")), "vid")
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$indexPath/postings")
    writeIdMapFromPostings(spark, indexPath, idCol = "vid", dedup = true)
    writeVecAttrs(base, indexPath, "overwrite", Some(docSrcOf(spark, dir)))
  }

  /** One insert batch for the composite index: route AND residual-encode
    * the delta slice (vec_id % 4 == 0) with the STORED centroids and
    * codebooks — no training anywhere in this plan — and append
    * per-bucket; existing posting files are never rewritten. */
  def appendIvfPqIndex(spark: SparkSession, dir: String, indexPath: String): Unit =
    // label rides along so the delta's facet rows carry the real facet,
    // not the label-less -1 fallback
    ivfPqAbsorb(spark, indexPath,
      Tables.embeddings(spark, dir).filter(col("vec_id") % 4 === 0)
        .select(col("vec_id"), col("embedding"), col("label")),
      docSrc = Some(docSrcOf(spark, dir)))

  /** Absorb an ARBITRARY raw (vec_id, embedding) frame into a persisted
    * composite index using only the STORED artifacts — the shard-corpus
    * route the ivfpq merge refusal points at: PQ postings carry CODES,
    * not embeddings, so cross-shard consolidation re-encodes from the
    * shard's vectors (route against the stored coarse centroids,
    * residual-encode with the stored codebooks, append per bucket +
    * sidecar). No training anywhere in the plan; only touched bucket
    * directories gain files. The fixture append lifecycle
    * ([[appendIvfPqIndex]], oracle `ivfpq_ann_appended`) runs through
    * this exact path, so the absorb arithmetic is hash-gated. */
  def ivfPqAbsorb(spark: SparkSession, indexPath: String, vecs: DataFrame,
      docSrc: Option[DataFrame] = None): Unit = {
    assertNoMaintenance(new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration), indexPath, "ivfPqAbsorb")
    writeVecAttrs(vecs, indexPath, "append", docSrc) // before postings — crash-safe order
    val (codes, asnD) = pqEncodeBatch(vecs, storedCents(spark, indexPath),
      spark.read.parquet(s"$indexPath/centroids"),
      spark.read.parquet(s"$indexPath/codebooks"))
    codes.write.partitionBy("bucket").mode("append")
      .parquet(s"$indexPath/postings")
    appendIdMap(asnD, indexPath)
  }

  /** Are two composite indexes' FROZEN artifacts (coarse centroids AND
    * residual codebooks) value-identical? The precondition that makes
    * PQ codes routable index-to-index: a code is an argmin against a
    * specific codebook in a specific bucket's residual space, so only
    * equality of BOTH artifact sets makes a src posting meaningful
    * under dst semantics. Both tables are training-bounded (IvfK rows /
    * M·Ks rows) — a driver-side exact compare, never a corpus read.
    * Doubles compare exactly: the central-training shape produces both
    * shards' artifacts from ONE published parquet, and parquet
    * round-trips doubles losslessly. */
  private[graft] def ivfPqArtifactsIdentical(spark: SparkSession,
      dstIndex: String, srcIndex: String): Boolean = {
    def centKey(p: String) = spark.read.parquet(s"$p/centroids")
      .select(col("cid"), col("cemb"), col("cnrm"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2)))
      .sortBy(_._1).toSeq
    def cbKey(p: String) = spark.read.parquet(s"$p/codebooks")
      .select(col("cm"), col("cid"), col("cv"), col("cself"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getSeq[Double](2), r.getDouble(3)))
      .sortBy(_._1).toSeq
    centKey(dstIndex) == centKey(srcIndex) && cbKey(dstIndex) == cbKey(srcIndex)
  }

  /** Shard-parallel consolidation for the COMPOSITE index — index-to-
    * index, possible exactly when src and dst carry bit-identical
    * artifacts ([[ivfPqArtifactsIdentical]] — the central-training
    * deployment shape: one training job publishes centroids+codebooks,
    * N encode workers build shards with them,
    * [[buildIvfPqShardWithArtifacts]]). Codes are then routable AS IS
    * and the merge is a pure partition-wise posting union: src code
    * rows append into dst's matching bucket directories as new files
    * (never a rewrite), the sidecar gains src's (vec_id, bucket) pairs,
    * and src tombstones purge on the way in — O(src postings), never
    * O(dst corpus), the IVF/LSH/lex merge economics extended to the
    * compressed index. Artifact-DIVERGENT shards still refuse loudly
    * (codes are not routable across different codebooks) and point at
    * [[ivfPqAbsorb]], the O(src corpus) re-encode. */
  def ivfPqIndexMergeInto(spark: SparkSession, dstIndex: String,
      srcIndex: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dstIndex)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assertNoMaintenance(fs, dstIndex, "ivfPqIndexMergeInto")
    require(ivfPqArtifactsIdentical(spark, dstIndex, srcIndex),
      "ivfpq merge is index-to-index only between ARTIFACT-IDENTICAL shards " +
        "(bit-equal centroids AND codebooks - the central-training shape); " +
        "these shards' artifacts differ, so src codes are not routable under " +
        "dst semantics: re-encode the shard corpus via ivfPqAbsorb " +
        "(--op absorb --vecDir)")
    val srcTomb = new org.apache.hadoop.fs.Path(s"$srcIndex/tombstones")
    val tombF: DataFrame => DataFrame =
      if (fs.exists(srcTomb)) {
        val t = broadcast(spark.read.parquet(srcTomb.toString)
          .select(col("vec_id").as("_tomb_del")).distinct())
        d => d.join(t, // postings key off vid, the sidecar off vec_id
          d(if (d.columns.contains("vid")) "vid" else "vec_id")
            === t("_tomb_del"), "left_anti")
      } else identity
    // facets must cover the absorbed shard — src attrs (tombstone-purged)
    // first, the crash-safe order shared by every appender
    val srcAttrs = new org.apache.hadoop.fs.Path(s"$srcIndex/attrs")
    if (fs.exists(srcAttrs))
      tombF(readAttrsTwoAxis(spark, srcAttrs.toString))
        .write.partitionBy(VecAttrsPartCols: _*).mode("append")
        .parquet(s"$dstIndex/attrs")
    tombF(spark.read.parquet(s"$srcIndex/postings")
        .select(col("vid"), col("m"), col("code"),
          col("bucket").cast("long").as("bucket")))
      .write.partitionBy("bucket").mode("append").parquet(s"$dstIndex/postings")
    tombF(spark.read.parquet(s"$srcIndex/idmap")
        .select(col("vec_id"), col("bucket").cast("long").as("bucket")))
      .write.mode("append").parquet(s"$dstIndex/idmap")
  }

  /** One encode worker's shard in the central-training lifecycle: adopt
    * the PUBLISHED artifacts (copied verbatim from `artifactIndex` —
    * parquet round-trips doubles losslessly, so the shards stay
    * artifact-identical and therefore mergeable) and encode this
    * worker's slice with them — no training anywhere in the plan. */
  private[graft] def buildIvfPqShardWithArtifacts(spark: SparkSession,
      artifactIndex: String, vecs: DataFrame, indexPath: String,
      docSrc: Option[DataFrame] = None): Unit = {
    spark.read.parquet(s"$artifactIndex/centroids")
      .write.mode("overwrite").parquet(s"$indexPath/centroids")
    spark.read.parquet(s"$artifactIndex/codebooks")
      .write.mode("overwrite").parquet(s"$indexPath/codebooks")
    ivfPqAbsorb(spark, indexPath, vecs, docSrc)
  }

  /** Central-training shard-merge lifecycle behind [[ivfPqAnnMerged]]:
    * artifacts train ONCE on the odd slice (shard A, which also encodes
    * it), shard B adopts A's artifacts verbatim and encodes the even
    * slice, then B merges into A index-to-index
    * ([[ivfPqIndexMergeInto]] — the artifact-equality gate passes by
    * construction). Coarse argmax and code argmin are deterministic
    * functions of the artifacts, so the merged index ≡ one-pass
    * encoding of the whole corpus with odd-trained artifacts — exactly
    * what the `ivfpq_ann_merged` oracle recomputes. */
  def buildIvfPqIndexMerged(spark: SparkSession, dir: String,
      indexPath: String): Unit = {
    val e = Tables.embeddings(spark, dir)
    buildIvfPqIndexSlice(spark, e.filter(col("vec_id") % 2 === 1), indexPath,
      docSrc = Some(docSrcOf(spark, dir)))
    // shard B stages as a SIBLING of the destination and is deleted once
    // absorbed (same rationale as buildIvfIndexMerged: destination-
    // derived path works beyond local mode; the merge never mutates its
    // source, so the shard is scratch after the merge returns)
    val srcIdx = s"${indexPath}_shard_b"
    val fs = new org.apache.hadoop.fs.Path(srcIdx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(srcIdx), true)
    buildIvfPqShardWithArtifacts(spark, indexPath,
      e.filter(col("vec_id") % 2 === 0)
        .select(col("vec_id"), col("embedding"), col("label")),
      srcIdx, docSrc = Some(docSrcOf(spark, dir)))
    ivfPqIndexMergeInto(spark, indexPath, srcIdx)
    fs.delete(new org.apache.hadoop.fs.Path(srcIdx), true)
    ()
  }

  /** Train coarse centroids + residual codebooks on an arbitrary raw
    * slice and index it — [[buildIvfPqIndexBase]] generalized off the
    * fixture filter (the central-training job of the shard-merge
    * lifecycle). */
  private[graft] def buildIvfPqIndexSlice(spark: SparkSession, slice: DataFrame,
      indexPath: String, docSrc: Option[DataFrame] = None): Unit = {
    val base = withNorm(slice)
    ivfCentFrame(base).write.mode("overwrite").parquet(s"$indexPath/centroids")
    val centStored = spark.read.parquet(s"$indexPath/centroids")
    val asn = assignFromCents(base, storedCents(spark, indexPath))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
    val res = residualFrameWith(asn, centStored.select(col("cid"), col("cemb")))
    val cb = pqTrain(res)
    cb.write.mode("overwrite").parquet(s"$indexPath/codebooks")
    pqAssignCodes(pqSubvectors(res), cb)
      .select(col("vec_id").as("vid"), col("m"), col("code"))
      .join(asn.select(col("vec_id").as("vid"), col("bucket")), "vid")
      .write.partitionBy("bucket").mode("overwrite")
      .parquet(s"$indexPath/postings")
    writeIdMapFromPostings(spark, indexPath, idCol = "vid", dedup = true)
    writeVecAttrs(base, indexPath, "overwrite", docSrc)
  }

  /** [[ivfPqAnnServe]] over the shard-merged composite index
    * ([[buildIvfPqIndexMerged]]) — same serving plan, artifacts from
    * the central training, postings covering both shards. */
  def ivfPqAnnMerged(spark: SparkSession, dir: String): DataFrame =
    ivfPqAnnServe(spark, dir,
      servedIndexWith(dir, "ivfpq_merged", embeddingsStamp(spark, dir))(
        buildIvfPqIndexMerged(spark, dir, _)))

  /** Route + residual-encode one raw (vec_id, embedding) frame with the
    * STORED artifacts — [[ivfPqAbsorb]]'s arithmetic returned as frames
    * instead of written, so the streaming write edge
    * ([[graft.streaming.PqIngest]]) can stage them under its
    * exactly-once commit. `centRow` is the one-row broadcast routing
    * array, `centStored` the (cid, cemb) residual-centroid frame,
    * `cbStored` the codebooks — all frozen for the index's life and
    * cacheable at stream start. Returns (code rows (vid, m, code,
    * bucket), assignment (…, vec_id, bucket)). */
  private[graft] def pqEncodeBatch(vecs: DataFrame, centRow: DataFrame,
      centStored: DataFrame, cbStored: DataFrame): (DataFrame, DataFrame) = {
    val v = withNorm(vecs)
    val asnD = assignFromCents(v, centRow)
      .select(col("vec_id"), col("embedding"), col("nrm"), col("bucket"))
    val resD = residualFrameWith(asnD, centStored.select(col("cid"), col("cemb")))
    val codes = pqAssignCodes(pqSubvectors(resD), cbStored)
      .select(col("vec_id").as("vid"), col("m"), col("code"))
      .join(asnD.select(col("vec_id").as("vid"), col("bucket")), "vid")
    (codes, asnD)
  }

  /** The raw-vector twin of [[ivfPqAbsorb]]: absorb an arbitrary
    * (vec_id, embedding) frame into a persisted IVF index by routing
    * against the stored frozen centroids and appending per bucket —
    * [[appendIvfIndex]] generalized off the fixture slice (the
    * streaming edge, [[graft.streaming.VecIngest]], is this same
    * routing under an exactly-once staged-promote commit). */
  def ivfAbsorb(spark: SparkSession, indexPath: String, vecs: DataFrame,
      docSrc: Option[DataFrame] = None): Unit = {
    assertNoMaintenance(new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration), indexPath, "ivfAbsorb")
    writeVecAttrs(vecs, indexPath, "append", docSrc) // before postings — crash-safe order
    val asn = routeIngestBatch(vecs, storedCents(spark, indexPath))
    asn.write.partitionBy("bucket").mode("append").parquet(s"$indexPath/postings")
    appendIdMap(asn, indexPath)
  }

  /** [[ivfPqAnnServe]] over the incrementally-grown composite index —
    * same serving plan, centroids/codebooks from the base slice,
    * postings covering base + appended delta. */
  def ivfPqAnnAppended(spark: SparkSession, dir: String): DataFrame =
    ivfPqAnnServe(spark, dir,
      servedIndex(spark, dir, "ivfpq_app")(buildIvfPqIndexAppend(spark, dir, _)))

  /** Physical-layout version folded into every VECTOR-family cached-index
    * staleness stamp (the [[graft.queries.LexQueries]] LayoutVersion
    * discipline): bumping it invalidates indexes built by older code
    * whose on-disk layout changed — the fixture stamp alone cannot see
    * that. v2: `attrs/` facet sidecar beside postings/idmap. */
  private val VecLayoutVersion = "vec-v3"

  /** Content stamp of the fixture's embeddings table (file names +
    * lengths + mtimes) — the staleness guard for [[ivfPqAnnServed]]'s
    * cached index: a regenerated fixture must rebuild, a same-session
    * re-run must not. */
  private def embeddingsStamp(spark: SparkSession, dir: String): String =
    s"${tableStamp(spark, dir, "embeddings")};$VecLayoutVersion"

  /** [[embeddingsStamp]]'s documents twin — guards the LSH index. */
  private[queries] def documentsStamp(spark: SparkSession, dir: String): String =
    tableStamp(spark, dir, "documents")

  private def tableStamp(spark: SparkSession, dir: String, table: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$table.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "missing"
    else fs.listStatus(p).map(s =>
      s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
      .sorted.mkString(",")
  }

  /** Persist the MinHash-LSH near-dup index — the DEDUP family's
    * train-once/serve-many layout, mirroring [[buildIvfIndex]]: the 4×3
    * banded signatures (doc_id, sig, band) of the BASE corpus slice
    * (doc_id % 4 != 0 — the same deterministic 75% standing in for
    * "yesterday's corpus" as the IVF append lifecycle) written
    * partitioned by band. At 100 TB the shingle + hash + 12-way minhash
    * pass IS the dominant near-dup cost — it reads every token of every
    * document — so persisting the 4-rows-per-doc signature table means
    * that pass runs once per document EVER: each new crawl shard signs
    * only itself ([[lshIndexAppend]]), and candidate generation against
    * the full standing corpus stays the band-signature equijoin over
    * compact (band, sig) keys, never touching document text again. */
  def buildLshIndex(spark: SparkSession, dir: String, indexPath: String): Unit = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") % 4 =!= 0)
    bandSigs(minhashSigsOf(docs))
      .write.partitionBy("band").mode("overwrite").parquet(s"$indexPath/postings")
    // facet sidecar — the SAME (doc_id → lang, source) layout as the
    // lexical index (both facet a doc-keyed index), so faceted near-dup
    // serving reads one partition-pruned directory per facet value
    LexQueries.attrsRows(docs)
      .write.partitionBy(LexQueries.AttrsPartCols: _*).mode("overwrite")
      .parquet(s"$indexPath/attrs")
  }

  /** Incremental growth of the LSH index: sign ONLY the delta slice
    * (doc_id % 4 == 0) and append. Signatures are strictly per-document
    * (no trained global state), so append requires no retraining and no
    * re-reading of the standing corpus — the contrast with
    * [[buildIvfIndexAppend]], whose frozen centroids encode a global
    * model the delta must route through. */
  def lshIndexAppend(spark: SparkSession, dir: String, indexPath: String): Unit = {
    assertNoMaintenance(new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration), indexPath, "lshIndexAppend")
    val delta = Tables.documents(spark, dir).filter(col("doc_id") % 4 === 0)
    // facets must cover the delta; attrs land first (the harmless crash
    // direction shared by every appender)
    LexQueries.attrsRows(delta)
      .write.partitionBy(LexQueries.AttrsPartCols: _*).mode("append")
      .parquet(s"$indexPath/attrs")
    bandSigs(minhashSigsOf(delta))
      .write.partitionBy("band").mode("append").parquet(s"$indexPath/postings")
  }

  /** One shard's independent LSH build over an arbitrary document
    * slice — the near-dup side of the shard-parallel story. */
  private[graft] def buildLshIndexSlice(docs: DataFrame, indexPath: String): Unit = {
    bandSigs(minhashSigsOf(docs.select(col("doc_id"), col("text"))))
      .write.partitionBy("band").mode("overwrite").parquet(s"$indexPath/postings")
    LexQueries.attrsRows(docs)
      .write.partitionBy(LexQueries.AttrsPartCols: _*).mode("overwrite")
      .parquet(s"$indexPath/attrs")
  }

  /** LSH twin of [[ivfIndexMergeInto]] — and the degenerate case that
    * shows why the near-dup index is the EASY one to shard: signatures
    * are strictly per-document (no centroids, no codebooks, no trained
    * state), so absorbing one shard's signature index into another is a
    * pure partition-wise posting union — the source's sig rows append
    * per band with no signing, no re-routing, and no source-corpus
    * read. Append-only on the destination (MergeSpec pins pre-merge
    * posting files byte-identical); source docs tombstoned before the
    * merge are dropped on the way in (tombstones are doc-keyed, so the
    * merge is their physical purge). Merge ≡ one-pass signing of the
    * live union corpus, exactly — MergeSpec pins the row sets equal. */
  def lshIndexMergeInto(spark: SparkSession, dstIndex: String, srcIndex: String): Unit = {
    val tombPath = new org.apache.hadoop.fs.Path(s"$srcIndex/tombstones")
    val fs = tombPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assertNoMaintenance(fs, dstIndex, "lshIndexMergeInto")
    val src = spark.read.parquet(s"$srcIndex/postings")
      .select(col("doc_id"), col("sig"), col("band"))
    val live =
      if (fs.exists(tombPath)) {
        val tomb = broadcast(spark.read.parquet(tombPath.toString)
          .select(col("doc_id").as("_tomb_del")).distinct())
        src.join(tomb, src("doc_id") === tomb("_tomb_del"), "left_anti")
      } else src
    // facets must cover the absorbed shard — src attrs (tombstone-
    // purged) first, the crash-safe order shared by every appender; a
    // shard built before the sidecar existed contributes none
    val srcAttrs = new org.apache.hadoop.fs.Path(s"$srcIndex/attrs")
    if (fs.exists(srcAttrs)) {
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
      liveA.write.partitionBy(LexQueries.AttrsPartCols: _*).mode("append")
        .parquet(s"$dstIndex/attrs")
    }
    live.write.partitionBy("band").mode("append").parquet(s"$dstIndex/postings")
  }

  /** LSH bucket-skew audit — the top-10 hottest (band, sig) posting
    * lists with their document counts: [[ivf_balance]]'s twin for the
    * near-dup side. At 100 TB a hot band signature (usually a boilerplate
    * cluster — shared headers, templated pages) is the key that blows up
    * the band equijoin quadratically, and this is the number an operator
    * thresholds before df-capping or excising the offending shingles
    * (see `boilerplate_ngrams`). One map-combinable (band, sig) count +
    * a TakeOrderedAndProject top-10 — no join at all. */
  def lshBucketSkew(spark: SparkSession, dir: String): DataFrame =
    bandSigs(minhashSigsOf(Tables.documents(spark, dir)))
      .groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("band").asc, col("sig").asc)
      .limit(10)

  /** Near-dup candidates for a NEW crawl shard against the standing
    * corpus, served ENTIRELY from the persisted LSH index — the
    * production incremental-dedup shape (new shard vs everything seen
    * so far, including itself): the index holds base + appended delta
    * signatures; the query equijoins the delta's 4-rows-per-doc band
    * signatures against the full posting table and normalizes pairs
    * (least, greatest, distinct). ZERO document text is read in the
    * serving plan — both sides come from the signature index; compare
    * [[minhashLsh]], which re-signs the whole corpus per run, and
    * `incremental_dedup` (CurationQueries), the exact-fingerprint
    * variant of the same lifecycle. Output equals the full-corpus LSH
    * pair set restricted to pairs touching the delta (the oracle pins
    * exactly that). */
  /** LSH layout version folded into the cached-index stamps — the
    * [[graft.queries.LexQueries]] discipline. v2: attrs facet sidecar. */
  private val LshLayoutVersion = "lsh-v2"

  private def lshStamp(spark: SparkSession, dir: String): String =
    s"${documentsStamp(spark, dir)};$LshLayoutVersion"

  def incrementalNearDup(spark: SparkSession, dir: String): DataFrame =
    incrementalNearDupBy(spark, dir, facetPred = None)

  /** `incremental_neardup_filtered`: FACETED near-dup serving — the
    * fourth index family gains the facet seam the other three have
    * (lex `bm25_filtered`, IVF `filtered_ann_served`, IVFPQ
    * `ivfpq_ann_filtered`): the new-shard-vs-standing-corpus candidate
    * set restricted to lang = 'en' documents, filter-FIRST — the
    * allowlist (a partition-pruned read of the shared attrs sidecar)
    * screens the signature rows BEFORE the band equijoin, so the pair
    * join runs entirely within the facet. Per-document signatures are
    * facet-independent (no corpus statistic anywhere), so the faceted
    * pair set IS the unfaceted set with both endpoints in the facet —
    * which is exactly what the oracle recomputes. The production shape:
    * language-scoped dedup sweeps (cross-language near-dups are almost
    * always false positives of boilerplate, and curation pipelines
    * dedup within language buckets). */
  def incrementalNearDupFiltered(spark: SparkSession, dir: String): DataFrame =
    incrementalNearDupBy(spark, dir, Some(col("lang") === "en"))

  /** `lsh_facet_profile`: [[graft.queries.LexQueries.facetProfile]]
    * over the near-dup index's sidecar — per-(lang, source) doc counts
    * from partition metadata alone (ReadSchema: struct<>, PlanSpec
    * pins it), auditing the LSH writer family's facet maintenance:
    * build + append cover the full corpus, so the histogram must equal
    * the documents table's own. */
  def lshFacetProfile(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndexWith(dir, "lshidx", lshStamp(spark, dir)) { p =>
      buildLshIndex(spark, dir, p); lshIndexAppend(spark, dir, p)
    }
    spark.read.parquet(s"$idx/attrs")
      .groupBy(col("lang").cast("string").as("lang"),
        col("source").cast("string").as("source"))
      .agg(count(lit(1)).as("n_docs"))
  }

  private def incrementalNearDupBy(spark: SparkSession, dir: String,
      facetPred: Option[Column]): DataFrame = {
    val idx = servedIndexWith(dir, "lshidx", lshStamp(spark, dir)) { p =>
      buildLshIndex(spark, dir, p); lshIndexAppend(spark, dir, p)
    }
    val all0 = spark.read.parquet(s"$idx/postings")
      .select(col("doc_id"), col("band"), col("sig"))
    // the facet screens BEFORE the pair join: delta derives from the
    // screened frame too, so both pair endpoints satisfy the facet
    val all = facetPred match {
      case None => all0
      case Some(p) => graft.queries.LexQueries.facetScreen(spark, idx, p)(all0)
    }
    val delta = all.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id").as("doc_d"), col("band").as("band_d"),
        col("sig").as("sig_d"))
    all.join(delta,
        col("band") === col("band_d") && col("sig") === col("sig_d") &&
          col("doc_id") =!= col("doc_d"))
      .select(least(col("doc_id"), col("doc_d")).as("doc_a"),
        greatest(col("doc_id"), col("doc_d")).as("doc_b"))
      .distinct()
  }

  // ── Index retire lifecycle: delete (tombstone) → serve-around → compact ──
  //
  // Real corpora retire documents (takedowns, TTL, license revocation).
  // The lifecycle completes build/append/serve with the missing edge:
  // a DELETE is an O(batch) tombstone write (no posting file touched),
  // serving anti-joins the broadcast tombstone set (tombstones between
  // compactions are rare-event small), and COMPACTION physically removes
  // tombstoned rows by rewriting ONLY the touched bucket partitions
  // (dynamic partition overwrite — a vector lives in exactly one IVF
  // bucket, so a delete batch touching b buckets rewrites b directories
  // of a 100 TB index, never the index).

  /** The fixture's deterministic takedown set — the retire lifecycle's
    * `% 4` twin (append uses doc_id % 4 == 0 as "the new shard"; retire
    * uses id % 10 == 7 as "the takedown batch"). */
  private def retiredPred(idCol: Column): Column = idCol % 10 === 7

  /** Maintain the (vec_id, bucket) SIDECAR every IVF-family
    * build/append writes beside its postings: two longs per indexed
    * vector, read back column-pruned from the just-written postings
    * (build) or written straight from the delta assignment (append).
    * This is what keeps [[ivfIndexDelete]] off the postings entirely —
    * a delete batch resolves its buckets against the sidecar, never
    * against the posting files' embedding/code bytes. `dedup` is for
    * the IVFPQ layout, whose postings carry M code rows per vector. */
  private def writeIdMapFromPostings(spark: SparkSession, indexPath: String,
      idCol: String = "vec_id", dedup: Boolean = false): Unit = {
    // bucket is pinned BIGINT in every sidecar writer: read back from
    // the postings it arrives as the partition-DISCOVERED type (int32
    // for small values), while the append path writes the assignment's
    // long — unpinned, a base+append sidecar would hold mixed parquet
    // types and fail to read
    val pairs = spark.read.parquet(s"$indexPath/postings")
      .select(col(idCol).as("vec_id"), col("bucket").cast("long").as("bucket"))
    (if (dedup) pairs.distinct() else pairs)
      .write.mode("overwrite").parquet(s"$indexPath/idmap")
  }

  /** Append-side sidecar maintenance: the delta's (vec_id, bucket)
    * pairs, delta-priced (the assignment frame is already in hand).
    * bucket pinned BIGINT — see [[writeIdMapFromPostings]]. */
  private def appendIdMap(asn: DataFrame, indexPath: String): Unit =
    asn.select(col("vec_id"), col("bucket").cast("long").as("bucket"))
      .write.mode("append").parquet(s"$indexPath/idmap")

  /** Resolve a delete batch's (vec_id, bucket) rows — against the
    * sidecar when present (O(two longs per indexed vector), zero
    * posting bytes read — PlanSpec pins that the resolution touches no
    * `postings/` file), falling back to a column-pruned postings read
    * for indexes built before the sidecar existed. Exposed for the
    * PlanSpec pin. */
  private[graft] def deleteResolutionFrame(spark: SparkSession, indexPath: String,
      ids: DataFrame, idCol: String = "vec_id"): DataFrame = {
    val idmap = new org.apache.hadoop.fs.Path(s"$indexPath/idmap")
    val fs = idmap.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pairs =
      if (fs.exists(idmap)) spark.read.parquet(idmap.toString)
      else spark.read.parquet(s"$indexPath/postings")
        .select(col(idCol).as("vec_id"),
          col("bucket").cast("long").as("bucket")).distinct()
    // un-hinted: AQE broadcasts the usual ≪corpus takedown batch at
    // runtime, but a facet-scoped delete (ivfIndexDeleteLabel) can carry
    // a corpus-scale fraction — a forced broadcast hint would ship that
    // whole slice to every task where a shuffle join is the right plan
    pairs.join(ids.select(col("vec_id")).distinct(), "vec_id")
  }

  /** Maintenance marker protocol — the index twin of the corpus
    * appender's tmp-table guard: a compact REPLACES bucket directories
    * (dynamic partition overwrite), so a posting file landed by a
    * concurrent append/absorb/merge/ingest between the compact's read
    * and its commit would be silently deleted — lost data whose source
    * offsets may already be committed. Compaction therefore takes the
    * `_maintenance` marker for its duration and every append-side
    * writer refuses LOUDLY while it is held (and compaction refuses
    * while an uncommitted streaming-ingest staging tree exists). The
    * residual TOCTOU window is one marker existence check — metadata-
    * priced, same contract as `rewriteBucketed`'s listing fence;
    * maintenance is still best run with writers quiesced. */
  private[graft] def maintenanceMarker(indexPath: String) =
    new org.apache.hadoop.fs.Path(s"$indexPath/_maintenance")

  private[graft] def assertNoMaintenance(
      fs: org.apache.hadoop.fs.FileSystem, indexPath: String, op: String): Unit =
    if (fs.exists(maintenanceMarker(indexPath)))
      throw new IllegalStateException(
        s"$op($indexPath): compaction in progress (_maintenance marker " +
          "present) — a write landing mid-compact would be deleted by the " +
          "bucket rewrite. Retry after the compact finishes.")

  /** Acquire the marker for a maintenance span: refuses if a writer's
    * marker is already held OR (with `refuseStaging`, the compact rule)
    * an uncommitted ingest staging tree exists (a live
    * [[graft.streaming.VecIngest]] batch could promote mid-rewrite; a
    * CRASHED one will promote on replay — either way its files must
    * land before buckets are rewritten). Maintenance that never rewrites
    * posting files — [[LexQueries.refreshLexicon]] — passes
    * `refuseStaging = false`: a staged-but-unpromoted batch's replay
    * re-marks bound staleness through the `beforePromote` seam, so a
    * refresh inside the crash window is safe; the marker there only
    * serializes the refresh against concurrent growers. Returns the
    * release thunk. */
  private[queries] def acquireMaintenance(
      fs: org.apache.hadoop.fs.FileSystem, indexPath: String,
      refuseStaging: Boolean = true): () => Unit = {
    val marker = maintenanceMarker(indexPath)
    if (fs.exists(marker))
      throw new IllegalStateException(
        s"compact($indexPath): another maintenance run holds _maintenance")
    val staging = new org.apache.hadoop.fs.Path(s"$indexPath/_staging")
    if (refuseStaging && fs.exists(staging) && fs.listStatus(staging).nonEmpty)
      throw new IllegalStateException(
        s"compact($indexPath): uncommitted streaming-ingest staging present " +
          "under _staging — let the ingest stream drain (or replay its " +
          "checkpoint to completion) before compacting, else its promote " +
          "races the bucket rewrite.")
    fs.create(marker, true).close()
    () => { fs.delete(marker, false); () }
  }

  /** Tombstone a batch of vector ids in the persisted IVF index:
    * resolve each id's bucket against the (vec_id, bucket) sidecar
    * ([[deleteResolutionFrame]] — the postings are never read), append
    * (vec_id, bucket) tombstones. No posting file is touched, no
    * embedding byte is read — the cost is the delete batch plus one
    * scan of the two-longs-per-vector sidecar — and the recorded
    * bucket is what lets [[ivfIndexCompact]] stay partition-scoped. */
  def ivfIndexDelete(spark: SparkSession, indexPath: String, ids: DataFrame): Unit = {
    // fenced like the appenders: a tombstone landing between a compact's
    // read and its tombstone drop would be silently discarded — a lost
    // takedown. The marker turns the race into a loud retry.
    assertNoMaintenance(new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration), indexPath,
      "ivfIndexDelete")
    deleteResolutionFrame(spark, indexPath, ids)
      .write.mode("append").parquet(s"$indexPath/tombstones")
  }

  /** The vec_ids of one facet label, resolved from the attrs sidecar's
    * ONE partition-pruned label directory — the shared resolution step
    * of the vector families' facet-scoped takedown. */
  private def labelMembers(spark: SparkSession, indexPath: String,
      label: Long, op: String): DataFrame =
    facetMembers(spark, indexPath, col("label") === label, op)

  /** [[labelMembers]] on the SOURCE axis — one leaf-pruned read of the
    * `source=` directories across labels. */
  private def sourceMembers(spark: SparkSession, indexPath: String,
      source: String, op: String): DataFrame =
    facetMembers(spark, indexPath, col("source") === source, op)

  /** The vec_ids of one facet, resolved from the attrs sidecar's
    * partition-pruned directories — the shared resolution step of the
    * vector families' facet-scoped takedown. */
  private def facetMembers(spark: SparkSession, indexPath: String,
      pred: Column, op: String): DataFrame = {
    val attrs = new org.apache.hadoop.fs.Path(s"$indexPath/attrs")
    val fs = attrs.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(attrs),
      s"$op: no attrs/ sidecar under $indexPath - the index predates " +
        "facets, so facet membership is unknown; rebuild it (or resolve " +
        "the ids upstream and use the id-list delete)")
    spark.read.parquet(attrs.toString)
      .filter(pred).select(col("vec_id")).distinct()
  }

  /** FACET-SCOPED takedown for the raw-vector family — the doc-keyed
    * families' [[graft.queries.LexQueries.deleteLexSource]] shape on
    * embeddings ("retire every vector of class/source X", e.g. a
    * contaminated or license-pulled slice): ids resolve from the attrs
    * sidecar's one label directory, buckets from the idmap sidecar —
    * O(facet) end to end, zero posting files read. Compact soon after a
    * corpus-scale label to shrink the serving anti-join broadcast. */
  /** `autoCompact` on the facet-scoped retires: measured (RetireAb,
    * bench_records/r17_retireab.txt — sf1-scale index, 20k-query serve
    * batch, tombstone masses 1/5/25/50%), the per-serve tombstone
    * anti-join penalty is UNMEASURABLE at every mass (50%: 3.41 s
    * tombstoned vs 3.44 s compacted) while compact costs ~6 s one-time
    * — so there is no mass threshold at which auto-compaction wins on
    * serving latency, and none ships (the MaxScore/PruneAutoRows
    * honesty protocol: measure, ship the winner, keep the override).
    * The real corpus-scale trigger is broadcast MEMORY — a 100 TB
    * deployment's corpus-scale tombstone set is a GB-scale broadcast
    * per serve — which is operator-visible capacity planning, not a
    * latency gate: pass `autoCompact = true` to fold the compact into
    * the retire when that ceiling approaches. */
  def ivfIndexDeleteLabel(spark: SparkSession, indexPath: String,
      label: Long, autoCompact: Boolean = false): Unit = {
    ivfIndexDelete(spark, indexPath,
      labelMembers(spark, indexPath, label, "ivfIndexDeleteLabel"))
    if (autoCompact) ivfIndexCompact(spark, indexPath)
  }

  /** [[ivfIndexDeleteLabel]] for the composite (IVFPQ) layout. */
  def ivfPqIndexDeleteLabel(spark: SparkSession, indexPath: String,
      label: Long, autoCompact: Boolean = false): Unit = {
    ivfPqIndexDelete(spark, indexPath,
      labelMembers(spark, indexPath, label, "ivfPqIndexDeleteLabel"))
    if (autoCompact) ivfIndexCompact(spark, indexPath, idCol = "vid")
  }

  /** SOURCE-scoped takedown for the raw-vector family —
    * [[graft.queries.LexQueries.deleteLexSource]] applied to
    * embeddings, arguably where the licensing shape matters most
    * ("retire every vector DERIVED FROM source X" — the embeddings of
    * a license-pulled or contaminated corpus slice are as tainted as
    * its text): ids resolve from the attrs sidecar's `source=` leaf
    * directories (doc_id ≡ vec_id tied the documents' source axis to
    * the sidecar at build time), buckets from the idmap sidecar —
    * O(facet) end to end, zero posting files read, no id list
    * anywhere. Compact soon after a corpus-scale source to shrink the
    * serving anti-join broadcast. */
  def ivfIndexDeleteSource(spark: SparkSession, indexPath: String,
      source: String, autoCompact: Boolean = false): Unit = {
    ivfIndexDelete(spark, indexPath,
      sourceMembers(spark, indexPath, source, "ivfIndexDeleteSource"))
    if (autoCompact) ivfIndexCompact(spark, indexPath)
  }

  /** [[ivfIndexDeleteSource]] for the composite (IVFPQ) layout. */
  def ivfPqIndexDeleteSource(spark: SparkSession, indexPath: String,
      source: String, autoCompact: Boolean = false): Unit = {
    ivfPqIndexDelete(spark, indexPath,
      sourceMembers(spark, indexPath, source, "ivfPqIndexDeleteSource"))
    if (autoCompact) ivfIndexCompact(spark, indexPath, idCol = "vid")
  }

  /** Physically remove tombstoned vectors: read ONLY the touched bucket
    * partitions (≤ [[IvfK]], partition-pruned), anti-join the broadcast
    * tombstone ids, dynamic-partition-overwrite exactly those bucket
    * directories — untouched buckets stay byte-identical
    * (IndexRetireSpec pins this). A bucket whose every row was deleted
    * gets its directory dropped explicitly (dynamic overwrite only
    * rewrites partitions PRESENT in the new data). Clears the tombstone
    * set afterwards; idempotent — no tombstones, no work. */
  def ivfIndexCompact(spark: SparkSession, indexPath: String,
      idCol: String = "vec_id"): Unit = {
    val tombPath = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    val fs = tombPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tombPath)) return
    val release = acquireMaintenance(fs, indexPath)
    try { ivfIndexCompactLocked(spark, indexPath, idCol, fs, tombPath) }
    finally release()
  }

  private def ivfIndexCompactLocked(spark: SparkSession, indexPath: String,
      idCol: String, fs: org.apache.hadoop.fs.FileSystem,
      tombPath: org.apache.hadoop.fs.Path): Unit = {
    val tomb = spark.read.parquet(tombPath.toString)
    val touched = tomb.select(col("bucket")).distinct().collect()
      .map(_.get(0)).toIndexedSeq
    if (touched.nonEmpty) {
      // idCol: the posting table's vector-id column ("vec_id" for the
      // raw-vector IVF layout, "vid" for the IVFPQ code layout — same
      // compaction, M code rows per vector all drop together)
      val tombIds = broadcast(
        tomb.select(col("vec_id").as("_tomb_del")).distinct())
      val pruned = spark.read.parquet(s"$indexPath/postings")
        .filter(col("bucket").isin(touched: _*))
      // persisted: both the surviving-bucket collect and the rewrite
      // consume this frame (branches share no subexpressions)
      val survivors = pruned
        .join(tombIds, pruned(idCol) === tombIds("_tomb_del"), "left_anti")
        .persist()
      try {
        val surviving = survivors.select(col("bucket")).distinct()
          .collect().map(_.get(0)).toSet
        survivors.write.partitionBy("bucket")
          .option("partitionOverwriteMode", "dynamic")
          .mode("overwrite").parquet(s"$indexPath/postings")
        touched.filterNot(surviving).foreach { b =>
          fs.delete(new org.apache.hadoop.fs.Path(
            s"$indexPath/postings/bucket=$b"), true)
        }
        // a FULLY-retired index must stay readable AND appendable: if no
        // bucket directory remains, land the empty schema-bearing frame
        // under one bucket dir (partition discovery then sees the same
        // layout future appends write into)
        val root = new org.apache.hadoop.fs.Path(s"$indexPath/postings")
        val anyLeft = fs.exists(root) && fs.listStatus(root).exists(s =>
          s.isDirectory && s.getPath.getName.startsWith("bucket="))
        if (!anyLeft)
          survivors.drop("bucket").limit(0).write.mode("overwrite")
            .parquet(s"$indexPath/postings/bucket=${touched.head}")
        // sidecar hygiene: drop the physically-removed ids from the
        // (vec_id, bucket) idmap so its size keeps tracking the LIVE
        // index across delete/compact cycles (tmp-write + rename — a
        // crash between the delete and the rename just loses the
        // sidecar, and future deletes fall back to the column-pruned
        // postings scan until the next build)
        val idmapPath = new org.apache.hadoop.fs.Path(s"$indexPath/idmap")
        if (fs.exists(idmapPath)) {
          val idmapTmp = new org.apache.hadoop.fs.Path(s"$indexPath/idmap_tmp")
          val idmap = spark.read.parquet(idmapPath.toString)
          idmap.join(tombIds, idmap("vec_id") === tombIds("_tomb_del"), "left_anti")
            .write.mode("overwrite").parquet(idmapTmp.toString)
          fs.delete(idmapPath, true)
          fs.rename(idmapTmp, idmapPath)
        }
      } finally survivors.unpersist()
    }
    // facet-sidecar purge: rewrite only the (label, source) leaves that
    // still hold tombstoned rows (the slot-compact discipline on the
    // attrs tree, two-axis like the lexical sidecar's); an index built
    // before the sidecar existed has none
    val attrsRoot = new org.apache.hadoop.fs.Path(s"$indexPath/attrs")
    if (fs.exists(attrsRoot)) {
      val tombIds2 = broadcast(spark.read.parquet(tombPath.toString)
        .select(col("vec_id").as("_tomb_del")).distinct())
      // partition columns read back with directory-name types — pin the
      // driver-side pair list to (LONG, STRING) explicitly
      val touchedPair = readAttrsTwoAxis(spark, attrsRoot.toString)
        .join(tombIds2, col("vec_id") === col("_tomb_del"))
        .select(col("label"), col("source")).distinct()
        .collect().map(r => (r.getLong(0), r.getString(1))).toIndexedSeq
      if (touchedPair.nonEmpty) {
        val pairPred = touchedPair.map { case (l, src) =>
          col("label") === l && col("source") === src
        }.reduce(_ || _)
        val surv = readAttrsTwoAxis(spark, attrsRoot.toString)
          .filter(pairPred)
          .join(tombIds2, col("vec_id") === col("_tomb_del"), "left_anti")
          .persist()
        try {
          val survPair = surv.select(col("label"), col("source")).distinct()
            .collect().map(r => (r.getLong(0), r.getString(1))).toSet
          surv.write.partitionBy(VecAttrsPartCols: _*)
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").parquet(attrsRoot.toString)
          // dynamic overwrite only rewrites leaves PRESENT in the new
          // data — a fully-purged leaf drops explicitly, and its label
          // directory too once the last source left
          touchedPair.filterNot(survPair).foreach { case (l, src) =>
            fs.delete(new org.apache.hadoop.fs.Path(
              s"$indexPath/attrs/label=$l/source=$src"), true)
            val labDir = new org.apache.hadoop.fs.Path(
              s"$indexPath/attrs/label=$l")
            if (fs.exists(labDir) && !fs.listStatus(labDir).exists(st =>
                st.isDirectory && st.getPath.getName.startsWith("source=")))
              fs.delete(labDir, true)
          }
          val anyLabLeft = fs.exists(attrsRoot) &&
            fs.listStatus(attrsRoot).exists(st =>
              st.isDirectory && st.getPath.getName.startsWith("label="))
          if (!anyLabLeft)
            surv.drop("label").drop("source").limit(0).write.mode("overwrite")
              .parquet(s"$indexPath/attrs/label=${touchedPair.head._1}" +
                s"/source=${touchedPair.head._2}")
        } finally surv.unpersist()
      }
    }
    fs.delete(tombPath, true)
  }

  /** [[annIvfServe]] with tombstone-aware candidates: posting rows whose
    * vec_id is tombstoned never surface — the serving contract between a
    * delete and the next compaction. The tombstone set broadcasts (it is
    * bounded by the delete traffic since the last compaction, never by
    * corpus size). */
  private def ivfServeTombstoned(spark: SparkSession, e: DataFrame,
      indexPath: String): DataFrame = {
    val tombIds = broadcast(spark.read.parquet(s"$indexPath/tombstones")
      .select(col("vec_id").as("tomb_id")).distinct())
    ivfServeFrom(spark, e, indexPath,
      postingsFilter =
        p => p.join(tombIds, p("vid") === tombIds("tomb_id"), "left_anti"))
  }

  /** IVF serving after a takedown batch, tombstones still live — the
    * retired vectors are anti-joined out at query time; no index file
    * has been rewritten. Query set: the surviving fixture queries
    * (retired documents do not query). Oracle: [[annIvf]] with both
    * sides restricted to survivors. */
  def annIvfDeleted(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndexWith(dir, "ivf_del", embeddingsStamp(spark, dir)) { p =>
      buildIvfIndex(spark, dir, p)
      ivfIndexDelete(spark, p, Tables.embeddings(spark, dir)
        .select(col("vec_id")).filter(retiredPred(col("vec_id"))))
    }
    val e = withNorm(Tables.embeddings(spark, dir))
      .filter(!retiredPred(col("vec_id")))
    ivfServeTombstoned(spark, e, idx)
  }

  /** The label the *_label_retired rows take down — deliberately NOT
    * [[FacetLabel]] (the facet-SERVE rows' label), and chosen so the
    * fixture's query set (vec_id < 10) contains retired-label queries:
    * both contract sides exercise (retired vectors neither query nor
    * surface as candidates). Literal so the oracle mirrors it. */
  private[graft] val RetiredLabel = 7L

  /** `ann_ivf_label_retired`: IVF serving after a FACET-SCOPED takedown
    * ([[ivfIndexDeleteLabel]]) — a whole label class retired by ONE
    * partition-pruned sidecar read, no id list anywhere; serving is the
    * plain tombstone-aware path, oracle = [[annIvf]] with both sides
    * restricted to the label's complement. */
  def annIvfLabelRetired(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndexWith(dir, "ivf_ldel",
        s"${embeddingsStamp(spark, dir)};ldel=$RetiredLabel") { p =>
      buildIvfIndex(spark, dir, p)
      ivfIndexDeleteLabel(spark, p, RetiredLabel)
    }
    val e = withNorm(Tables.embeddings(spark, dir))
      .filter(col("label").cast("long") =!= RetiredLabel)
    ivfServeTombstoned(spark, e, idx)
  }

  /** `ivfpq_ann_label_retired`: [[annIvfLabelRetired]] for the
    * composite index — the compressed serving path after the same
    * sidecar-resolved label takedown. */
  def ivfPqAnnLabelRetired(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndexWith(dir, "ivfpq_ldel",
        s"${embeddingsStamp(spark, dir)};ldel=$RetiredLabel") { p =>
      buildIvfPqIndex(spark, dir, p)
      ivfPqIndexDeleteLabel(spark, p, RetiredLabel)
    }
    val tombIds = broadcast(spark.read.parquet(s"$idx/tombstones")
      .select(col("vec_id").as("tomb_id")).distinct())
    ivfPqAnnServe(spark, dir, idx,
      queryFilter = col("label").cast("long") =!= RetiredLabel,
      postingsFilter =
        p => p.join(tombIds, p("vid") === tombIds("tomb_id"), "left_anti"))
  }

  /** The source the vector *_source_retired rows take down — the
    * fixture maps doc_id ≡ vec_id and sources cycle mod 20, so src7
    * contains query vector 7 (vec_id < 10 is the query set): both
    * contract sides exercise (retired-source vectors neither query nor
    * surface as candidates). Deliberately distinct from the lex
    * family's retired source (src12) and the serve-facet source
    * ([[FacetVecSource]]). Literal so the oracle mirrors it. */
  private[graft] val RetiredVecSource = "src7"

  /** The source the source-FACETED vector serve rows scope to —
    * literal so the DuckDB oracle can mirror it; distinct from
    * [[RetiredVecSource]] so facet-serve and facet-retire exercise
    * disjoint slices. */
  private[graft] val FacetVecSource = "src3"

  /** The retired-source membership as a query-side screen: anti-join
    * the thin (doc_id, source) map — never an embedding byte. */
  private def notFromSource(spark: SparkSession, dir: String, source: String)(
      e: DataFrame): DataFrame = {
    val ret = docSrcOf(spark, dir).filter(col("source") === source)
      .select(col("doc_id").as("_ret_doc"))
    e.join(broadcast(ret), e("vec_id") === col("_ret_doc"), "left_anti")
  }

  /** `ann_ivf_source_retired`: IVF serving after a SOURCE-scoped
    * takedown ([[ivfIndexDeleteSource]]) — the licensing shape applied
    * to embeddings ("retire every vector derived from source X"): the
    * tombstone set resolves from the sidecar's source leaves (landed
    * there at build time via doc_id ≡ vec_id), no id list anywhere;
    * serving is the plain tombstone-aware path, oracle = [[annIvf]]
    * with both sides restricted to the source's complement via the
    * documents join. */
  def annIvfSourceRetired(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndexWith(dir, "ivf_sdel",
        s"${embeddingsStamp(spark, dir)};sdel=$RetiredVecSource") { p =>
      buildIvfIndex(spark, dir, p)
      ivfIndexDeleteSource(spark, p, RetiredVecSource)
    }
    val e = notFromSource(spark, dir, RetiredVecSource)(
      withNorm(Tables.embeddings(spark, dir)))
    ivfServeTombstoned(spark, e, idx)
  }

  /** `ivfpq_ann_source_retired`: [[annIvfSourceRetired]] for the
    * composite index — the compressed serving path after the same
    * sidecar-resolved source takedown. */
  def ivfPqAnnSourceRetired(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndexWith(dir, "ivfpq_sdel",
        s"${embeddingsStamp(spark, dir)};sdel=$RetiredVecSource") { p =>
      buildIvfPqIndex(spark, dir, p)
      ivfPqIndexDeleteSource(spark, p, RetiredVecSource)
    }
    val tombIds = broadcast(spark.read.parquet(s"$idx/tombstones")
      .select(col("vec_id").as("tomb_id")).distinct())
    // queryFilter is a Column over the embeddings row — resolve the
    // retired membership via a collected id set scoped to the serve
    // contract's query ids (vec_id < 10), so the collect is ≤ 10 rows
    // regardless of how large the retired source is
    val retSet = docSrcOf(spark, dir).filter(col("source") === RetiredVecSource)
      .filter(col("doc_id") < 10)
      .select(col("doc_id")).collect().map(_.getLong(0)).toIndexedSeq
    val retLit = if (retSet.isEmpty) lit(false)
      else col("vec_id").isin(retSet: _*)
    ivfPqAnnServe(spark, dir, idx,
      queryFilter = !retLit,
      postingsFilter =
        p => p.join(tombIds, p("vid") === tombIds("tomb_id"), "left_anti"))
  }

  /** `filtered_ann_source`: SOURCE-faceted retrieval from the persisted
    * IVF index — [[graft.queries.LexQueries.bm25FilteredSource]]'s
    * vector twin ("nearest neighbors within source X", the provenance-
    * scoped retrieval shape): filter-first against the sidecar's
    * `source=` leaf allowlist, surviving cosines bit-identical to the
    * unfiltered serve (the frozen-stats contract). */
  def filteredAnnSource(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndex(spark, dir, "ivf")(buildIvfIndex(spark, dir, _))
    ivfServeFrom(spark, withNorm(Tables.embeddings(spark, dir)), idx,
      postingsFilter =
        facetPostingsFilter(spark, idx, None, Some(FacetVecSource)))
  }

  /** IVF serving after compaction — the tombstoned rows are physically
    * gone (touched buckets rewritten, untouched buckets byte-identical),
    * serving is the plain [[annIvfServe]] plan with zero anti-join work.
    * MUST return exactly [[annIvfDeleted]]'s rows: compaction changes
    * storage, never results (the oracle pins both to the same SQL). */
  def annIvfCompacted(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndexWith(dir, "ivf_delc", embeddingsStamp(spark, dir)) { p =>
      buildIvfIndex(spark, dir, p)
      ivfIndexDelete(spark, p, Tables.embeddings(spark, dir)
        .select(col("vec_id")).filter(retiredPred(col("vec_id"))))
      ivfIndexCompact(spark, p)
    }
    ivfServeFrom(spark,
      withNorm(Tables.embeddings(spark, dir)).filter(!retiredPred(col("vec_id"))),
      idx)
  }

  /** [[ivfIndexDelete]] for the COMPOSITE (IVFPQ) index — the same
    * sidecar resolution (the sidecar holds one (vec_id, bucket) pair
    * per vector even though postings carry M code rows); the legacy
    * fallback reads the (vid, bucket) pair distinct. */
  def ivfPqIndexDelete(spark: SparkSession, indexPath: String, ids: DataFrame): Unit = {
    assertNoMaintenance(new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration), indexPath,
      "ivfPqIndexDelete")
    deleteResolutionFrame(spark, indexPath, ids, idCol = "vid")
      .write.mode("append").parquet(s"$indexPath/tombstones")
  }

  /** IVFPQ serving after a takedown batch, tombstones live —
    * [[annIvfDeleted]]'s composite twin: centroids, codebooks, and code
    * assignments stay frozen as built; the broadcast tombstone anti-join
    * removes retired code rows before the ADC candidate join. */
  def ivfPqAnnDeleted(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndexWith(dir, "ivfpq_del", embeddingsStamp(spark, dir)) { p =>
      buildIvfPqIndex(spark, dir, p)
      ivfPqIndexDelete(spark, p, Tables.embeddings(spark, dir)
        .select(col("vec_id")).filter(retiredPred(col("vec_id"))))
    }
    val tombIds = broadcast(spark.read.parquet(s"$idx/tombstones")
      .select(col("vec_id").as("tomb_id")).distinct())
    ivfPqAnnServe(spark, dir, idx,
      queryFilter = !retiredPred(col("vec_id")),
      postingsFilter =
        p => p.join(tombIds, p("vid") === tombIds("tomb_id"), "left_anti"))
  }

  /** IVFPQ serving after compaction — the retired code rows are
    * physically gone ([[ivfIndexCompact]] with the code layout's `vid`
    * id column; only touched bucket directories rewritten); MUST return
    * exactly [[ivfPqAnnDeleted]]'s rows (shared oracle SQL pins it). */
  def ivfPqAnnCompacted(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndexWith(dir, "ivfpq_delc", embeddingsStamp(spark, dir)) { p =>
      buildIvfPqIndex(spark, dir, p)
      ivfPqIndexDelete(spark, p, Tables.embeddings(spark, dir)
        .select(col("vec_id")).filter(retiredPred(col("vec_id"))))
      ivfIndexCompact(spark, p, idCol = "vid")
    }
    ivfPqAnnServe(spark, dir, idx, queryFilter = !retiredPred(col("vec_id")))
  }

  /** Tombstone a batch of doc ids in the persisted LSH index — the
    * near-dup family's delete edge. Signatures are per-document with no
    * trained state, so the tombstone needs no bucket lookup at all. */
  def lshIndexDelete(spark: SparkSession, indexPath: String, ids: DataFrame): Unit = {
    assertNoMaintenance(new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration), indexPath,
      "lshIndexDelete")
    ids.select(col("doc_id")).distinct()
      .write.mode("append").parquet(s"$indexPath/tombstones")
  }

  /** FACET-SCOPED takedown for the near-dup index —
    * [[graft.queries.LexQueries.deleteLexSource]]'s twin (the two
    * doc-keyed families share the sidecar layout, so they share the
    * retire shape): doc_ids resolve from one partition-pruned attrs
    * read and land in the tombstone table distributed — O(facet sidecar
    * slice), zero posting reads, no driver-side collection. A whole
    * source can be a corpus-scale fraction: compact soon after to keep
    * the serving-side broadcast anti-join small. */
  def lshIndexDeleteSource(spark: SparkSession, indexPath: String,
      source: String, autoCompact: Boolean = false): Unit = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assertNoMaintenance(fs, indexPath, "lshIndexDeleteSource")
    val attrs = new org.apache.hadoop.fs.Path(s"$indexPath/attrs")
    require(fs.exists(attrs),
      s"lshIndexDeleteSource: no attrs/ sidecar under $indexPath - the " +
        "index predates facets, so source membership is unknown; rebuild " +
        "it (or resolve the ids upstream and use lshIndexDelete)")
    spark.read.parquet(attrs.toString)
      .filter(col("source") === source).select(col("doc_id")).distinct()
      .write.mode("append").parquet(s"$indexPath/tombstones")
    if (autoCompact) lshIndexCompact(spark, indexPath)
  }

  /** Physically remove tombstoned documents from the LSH signature
    * index. Unlike the IVF layouts — where a vector lives in exactly one
    * bucket directory — every document contributes one signature row to
    * EVERY band partition, so any delete batch touches all band
    * directories and LSH compaction is a full posting rewrite by
    * construction (amortize it across delete batches; the tombstone
    * anti-join serves correctly in between). Still partition-granular
    * (dynamic overwrite of the band dirs), clears the tombstone set,
    * idempotent. */
  def lshIndexCompact(spark: SparkSession, indexPath: String): Unit = {
    val tombPath = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
    val fs = tombPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tombPath)) return
    val release = acquireMaintenance(fs, indexPath)
    try { lshIndexCompactLocked(spark, indexPath, fs, tombPath) }
    finally release()
  }

  private def lshIndexCompactLocked(spark: SparkSession, indexPath: String,
      fs: org.apache.hadoop.fs.FileSystem,
      tombPath: org.apache.hadoop.fs.Path): Unit = {
    val tombIds = broadcast(spark.read.parquet(tombPath.toString)
      .select(col("doc_id").as("_tomb_del")).distinct())
    val postings = spark.read.parquet(s"$indexPath/postings")
    // persisted: the surviving-band collect and the rewrite both consume
    // this full-index frame (LSH compaction is a whole-posting rewrite by
    // construction — don't pay the anti-join twice on top)
    val survivors = postings
      .join(tombIds, postings("doc_id") === tombIds("_tomb_del"), "left_anti")
      .persist()
    try {
      // dynamic overwrite only rewrites partitions PRESENT in the new
      // data — a band emptied entirely (corpus fully retired) must have
      // its directory dropped explicitly, like the IVF compactor
      val surviving = survivors.select(col("band")).distinct()
        .collect().map(_.get(0)).toSet
      val postRoot = new org.apache.hadoop.fs.Path(s"$indexPath/postings")
      val allBands = fs.listStatus(postRoot).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("band="))
        .map(_.getPath.getName.stripPrefix("band="))
      survivors.write.partitionBy("band")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite").parquet(s"$indexPath/postings")
      allBands.filterNot(b => surviving.exists(_.toString == b)).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$indexPath/postings/band=$b"), true)
      }
      // a fully-retired index must stay readable and appendable — same
      // empty-frame landing as the IVF compactor
      val anyLeft = fs.exists(postRoot) && fs.listStatus(postRoot).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith("band="))
      if (!anyLeft && allBands.nonEmpty)
        survivors.drop("band").limit(0).write.mode("overwrite")
          .parquet(s"$indexPath/postings/band=${allBands.head}")
    } finally survivors.unpersist()
    // facet-sidecar purge — the shared (lang, source) leaf-granular
    // rewrite the lexical compactor uses (both indexes are doc-keyed
    // and facet through the same sidecar layout)
    LexQueries.purgeAttrsSidecar(spark, fs, indexPath, tombPath)
    fs.delete(tombPath, true)
  }

  /** [[incrementalNearDup]] after a takedown batch: serving anti-joins
    * the broadcast tombstones BEFORE pair generation, so a retired
    * document never surfaces on either side of a candidate pair — the
    * dedup-side retire contract ([[annIvfDeleted]]'s twin). Still reads
    * zero document text. */
  def incrementalNearDupDeleted(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndexWith(dir, "lshidx_del", lshStamp(spark, dir)) { p =>
      buildLshIndex(spark, dir, p)
      lshIndexAppend(spark, dir, p)
      lshIndexDelete(spark, p, Tables.documents(spark, dir)
        .select(col("doc_id")).filter(retiredPred(col("doc_id"))))
    }
    val tomb = broadcast(spark.read.parquet(s"$idx/tombstones")
      .select(col("doc_id").as("tomb_id")).distinct())
    val all = spark.read.parquet(s"$idx/postings")
      .select(col("doc_id"), col("band"), col("sig"))
      .join(tomb, col("doc_id") === col("tomb_id"), "left_anti")
    val delta = all.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id").as("doc_d"), col("band").as("band_d"),
        col("sig").as("sig_d"))
    all.join(delta,
        col("band") === col("band_d") && col("sig") === col("sig_d") &&
          col("doc_id") =!= col("doc_d"))
      .select(least(col("doc_id"), col("doc_d")).as("doc_a"),
        greatest(col("doc_id"), col("doc_d")).as("doc_b"))
      .distinct()
  }

  /** `incremental_neardup_source_retired`: the near-dup serve after a
    * FACET-SCOPED takedown ([[lshIndexDeleteSource]]) — a whole source's
    * documents stop surfacing on EITHER side of a candidate pair, with
    * the tombstones resolved from the sidecar rather than an explicit id
    * list. Same tombstone-aware pair chain as
    * [[incrementalNearDupDeleted]]; the oracle restricts endpoints to
    * the complement of the retired source. */
  def incrementalNearDupSourceRetired(spark: SparkSession, dir: String): DataFrame = {
    val idx = servedIndexWith(dir, "lshidx_srcdel",
        s"${lshStamp(spark, dir)};srcdel=${LexQueries.RetiredSource}") { p =>
      buildLshIndex(spark, dir, p)
      lshIndexAppend(spark, dir, p)
      lshIndexDeleteSource(spark, p, LexQueries.RetiredSource)
    }
    val tomb = broadcast(spark.read.parquet(s"$idx/tombstones")
      .select(col("doc_id").as("tomb_id")).distinct())
    val all = spark.read.parquet(s"$idx/postings")
      .select(col("doc_id"), col("band"), col("sig"))
      .join(tomb, col("doc_id") === col("tomb_id"), "left_anti")
    val delta = all.filter(col("doc_id") % 4 === 0)
      .select(col("doc_id").as("doc_d"), col("band").as("band_d"),
        col("sig").as("sig_d"))
    all.join(delta,
        col("band") === col("band_d") && col("sig") === col("sig_d") &&
          col("doc_id") =!= col("doc_d"))
      .select(least(col("doc_id"), col("doc_d")).as("doc_a"),
        greatest(col("doc_id"), col("doc_d")).as("doc_b"))
      .distinct()
  }

  /** Recall@3 of the IVF+PQ composite against exact full-vector L2 —
    * [[pqRecall]]'s companion for the composite index: what nprobe-bounded
    * bucket search PLUS residual quantization together cost in accuracy.
    * Compare with `pq_recall` (flat PQ, full corpus scanned) and
    * `ann_recall` (IVF, raw vectors) to attribute the loss. */
  def ivfPqRecall(spark: SparkSession, dir: String): DataFrame =
    recallAgainstExact(spark, dir, ivfPqAnn(spark, dir).select(col("qid"), col("vid")))

  /** MinHash-LSH recall audit — the near-dup counterpart of [[annRecall]]:
    * for each Jaccard threshold t ∈ {0.1 … 0.9}, how many TRUE pairs
    * (exact hashed-shingle Jaccard ≥ t) exist, and how many of them the
    * production LSH ([[minhashLsh]] — 12 minhashes, 4×3 bands) actually
    * proposes as candidates. This is the empirical S-curve every banding
    * choice (b, r) is justified by: recall should be ≈ 1 above the
    * design threshold and fall off below it — measured, not assumed.
    *
    * Truth is Jaccard over each doc's DISTINCT 32-bit shingle-hash set
    * (both engines hash identically, so a cross-shingle collision merges
    * the same pair on both sides); `i·10 ≥ u·t` keeps every threshold
    * test in exact BIGINTs, and recall is one IEEE division (NULL when a
    * threshold has no true pairs).
    *
    * Scale (100 TB): the truth side is NOT all-pairs — pairs materialize
    * only via the shingle-hash equijoin (co-occurrence-bounded, the
    * [[ngramJaccard]] shape minus the LSH pre-filter), which is exactly
    * why this is an AUDIT query: a boilerplate mega-shingle makes the
    * intersection join quadratic in its posting list, so at corpus scale
    * the audit runs over a deterministic doc sample (hash-of-id, the
    * [[annRecall]] discipline) and/or df-caps hot shingles — estimating
    * a recall curve needs a sample, never the corpus. The candidate
    * membership check is an equijoin on canonical (a, b) pair keys. */
  def lshRecall(spark: SparkSession, dir: String): DataFrame =
    lshRecallOver(spark, dir, Tables.documents(spark, dir))

  /** Fixed SIZE of the sampled recall audit's doc subset — a constant,
    * not a rate: the truth join is then sample²-bounded whatever the
    * corpus grows to. Literal so the oracle mirrors the selection. */
  private[graft] val RecallSampleK = 1000

  /** `lsh_recall_sampled`: the CORPUS-SCALE recall audit —
    * [[lshRecall]]'s documented scale path made a first-class query.
    * The round-16 scaling screen measured the exact audit's truth side
    * at 98.6× join rows for a 10× doc step (the shingle vocabulary
    * saturates, so Σc² grows quadratically — SCALING.md finding 1b′);
    * this twin restricts the TRUTH side to a deterministic fixed-size
    * sample (the [[RecallSampleK]] docs with the smallest
    * md5("smp:" ++ doc_id) — order-stable, corpus-independent), so the
    * intersection join is bounded by sample² forever, while the
    * CANDIDATE side stays the full production band-bounded
    * [[minhashLsh]] pair set (recall is audited for sampled true pairs
    * against real candidates — the standard unbiased audit design).
    * At fixtures smaller than the sample the two audits coincide; at
    * every larger corpus this is the one you can afford to run. */
  def lshRecallSampled(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val sample = docs
      .select(col("doc_id"),
        md5(concat(lit("smp:"), col("doc_id").cast("string"))).as("hk"))
      .orderBy(col("hk"), col("doc_id")).limit(RecallSampleK)
      .select(col("doc_id").as("_smp_doc"))
    lshRecallOver(spark, dir,
      docs.join(broadcast(sample), docs("doc_id") === col("_smp_doc"), "left_semi"))
  }

  private def lshRecallOver(spark: SparkSession, dir: String,
      truthDocs: DataFrame): DataFrame = {
    val shx = truthDocs
      .withColumn("ws", wordTokens(col("text")))
      .select(col("doc_id"), explode(array_distinct(shingleCol(col("ws")))).as("sh"))
      .select(col("doc_id"), md5Hash32(col("sh")).as("h"))
      .distinct()
    val sz = shx.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = shx.as("a")
      .join(shx.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("i"))
    val pairs = inter
      .join(sz.select(col("doc_id").as("da"), col("n").as("na")), "da")
      .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), "db")
      .select(col("da"), col("db"), col("i"), (col("na") + col("nb") - col("i")).as("u"))
    val cand = minhashLsh(spark, dir)
      .select(col("doc_a").as("da"), col("doc_b").as("db"), lit(1L).as("caught"))
    val flagged = pairs.join(cand, Seq("da", "db"), "left")
      .select(col("i"), col("u"), coalesce(col("caught"), lit(0L)).as("caught"))
    val thr = spark.range(1, 10).select(col("id").as("t"))
    flagged.crossJoin(broadcast(thr))
      .groupBy(col("t"))
      .agg(
        sum(when(col("i") * 10 >= col("u") * col("t"), 1L).otherwise(0L)).as("n_true"),
        sum(when(col("i") * 10 >= col("u") * col("t"), col("caught")).otherwise(0L)).as("n_caught"))
      .select(col("t").as("threshold_x10"), col("n_true"), col("n_caught"),
        when(col("n_true") > 0,
          col("n_caught").cast("double") / col("n_true").cast("double"))
          .otherwise(lit(null).cast("double")).as("recall"))
  }

  /** Per-source embedding centroid drift — the embedding-space twin of
    * `source_divergence`'s token-space chi-square: how far each source's
    * mean embedding sits from the corpus mean, as a cosine. A source
    * whose centroid drifts (new upstream, template change, language
    * shift) moves here before token statistics notice. Cosine of MEANS
    * equals cosine of SUMS (scale invariance), so the whole measurement
    * runs on exact integer component sums: quantize once, fold
    * (source, pos) partials map-side, derive the corpus sums by
    * re-aggregating the compact source frame — the corpus is scanned
    * ONCE — and the final cosine is two sqrts and a division on exact
    * BIGINT dot products.
    *
    * Scale: the only corpus-sized work is the posexplode fold to the
    * (sources × dims) frame; everything downstream is sources × 64
    * rows. */
  def sourceCentroids(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .join(Tables.embeddings(spark, dir),
        col("doc_id") === col("vec_id"))
      .select(col("source"), posexplode(col("embedding")).as(Seq("p", "v")))
      .select(col("source"), (col("p") + 1).as("pos"),
        floor(col("v").cast("double") * lit(1000.0)).cast("long").as("qv"))
    // the fold carries the per-(source, pos) row count so n_docs reads
    // off the pos=1 cell — no second corpus scan
    val s = q.groupBy(col("source"), col("pos"))
      .agg(sum(col("qv")).as("sv"), count(lit(1)).as("cnt"))
    val g = s.groupBy(col("pos")).agg(sum(col("sv")).as("gv"))
    val per = s.join(broadcast(g), "pos")
      .groupBy(col("source"))
      .agg(sum(col("sv") * col("gv")).as("dot"),
        sum(col("sv") * col("sv")).as("na"),
        max(when(col("pos") === 1, col("cnt"))).as("n_docs"))
    val nb = g.agg(sum(col("gv") * col("gv")).as("nb"))
    per.crossJoin(broadcast(nb))
      .select(col("source"), col("n_docs"),
        (col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cos_to_corpus"))
  }

  /** Newman modularity of the LABEL partition over the semantic
    * near-dup graph — the homophily audit: does "semantically
    * near-duplicate" respect the label structure? Per label c:
    * q_c = W_c/m − (D_c/2m)² (internal-edge share minus the share
    * expected under random wiring at the same degrees); Σq_c near 0
    * means near-dup edges ignore labels (the sketch families measure
    * something labels don't), strongly positive means label-aware
    * dedup sharding would not sever near-dup pairs. Note the partition
    * is INDEPENDENT of the graph (labels, not the components the edges
    * define) — components would trivially score every edge internal.
    *
    * Exact: q_c = (4m·W_c − D_c²) / (4m²) — integer numerator in
    * DECIMAL(38,0) (HUGEINT in the oracle), ONE division per label
    * row; no float sum across labels is ever taken in-engine.
    *
    * Scale: edges come IVF-bounded from [[embeddingNearDup]]; label
    * joins key on vec_id; everything folds to a labels-sized frame. */
  def dupModularity(spark: SparkSession, dir: String): DataFrame = {
    val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val lab = Tables.embeddings(spark, dir).select(col("vec_id"), col("label"))
    // materialize the labeled edge list ONCE (m, degree, and internal
    // folds each read it; the IVF chain must not run three times)
    val e2 = embeddingNearDup(spark, dir).select(col("va"), col("vb"))
      .join(lab.select(col("vec_id").as("va"), col("label").as("la")), "va")
      .join(lab.select(col("vec_id").as("vb"), col("label").as("lb")), "vb")
      .localCheckpoint(true)
    val m = e2.agg(count(lit(1)).as("m"))
    // degree mass per label: every edge endpoint contributes 1
    val dc = e2.select(col("la").as("label"))
      .unionAll(e2.select(col("lb").as("label")))
      .groupBy(col("label")).agg(count(lit(1)).as("degree_sum"))
    val wc = e2.filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("internal_edges"))
    val nodes = lab.groupBy(col("label")).agg(count(lit(1)).as("n_nodes"))
    nodes
      .join(dc, Seq("label"), "left")
      .join(wc, Seq("label"), "left")
      .crossJoin(broadcast(m))
      .select(col("label"), col("n_nodes"),
        coalesce(col("degree_sum"), lit(0L)).as("degree_sum"),
        coalesce(col("internal_edges"), lit(0L)).as("internal_edges"),
        ((lit(4L).cast(D38) * col("m").cast(D38) *
          coalesce(col("internal_edges"), lit(0L)).cast(D38) -
          coalesce(col("degree_sum"), lit(0L)).cast(D38) *
            coalesce(col("degree_sum"), lit(0L)).cast(D38)).cast("double")
          / (lit(4.0) * col("m").cast("double") * col("m").cast("double")))
          .as("q_contrib"))
  }

  /** IVF bucket-balance audit — the operational health metric of the
    * ANN serving path: per-bucket occupancy of the coarse index, folded
    * to one row of {bucket count, corpus size, min/max/mean occupancy,
    * imbalance = max/mean}. Query latency under IVF is driven by the
    * LARGEST probed bucket, so imbalance is the number that decides
    * when to retrain the centroids or split hot cells — the check a
    * production rollout alarms on, computed from the same assignment
    * chain the serving queries use ([[ivfAssign]], zero-shuffle).
    *
    * Scale: one map-combinable (bucket → count) fold over the
    * assignment map, then a k-row rollup; nothing exceeds k rows after
    * the first fold. */
  def ivfBalance(spark: SparkSession, dir: String): DataFrame = {
    val asn = ivfAssign(spark, dir)
    asn.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("n_vecs"),
        min(col("n")).as("min_bucket"), max(col("n")).as("max_bucket"))
      .select(col("n_buckets"), col("n_vecs"), col("min_bucket"), col("max_bucket"),
        (col("n_vecs").cast("double") / col("n_buckets").cast("double")).as("mean_bucket"),
        (col("max_bucket").cast("double") /
          (col("n_vecs").cast("double") / col("n_buckets").cast("double"))).as("imbalance"))
  }

  /** Corpus embedding-isotropy audit (Ethayarajh 2019's question asked
    * of the whole corpus): anisotropy = ‖μ‖² / E‖x‖² — the fraction
    * of the mean squared norm explained by the common mean direction.
    * Near 0 the embedding cloud is centered (healthy for cosine
    * retrieval); large values flag the "anisotropic cone" pathology where every
    * cosine is inflated by a shared offset and retrieval contrast
    * collapses — the audit run before trusting any cosine threshold in
    * the near-dup family. EXACT in milli-quantized integers: per-dim
    * component sums s_d and the total squared norm S₂ are BIGINT folds,
    * Σs_d² runs in DECIMAL(38,0) (HUGEINT in the oracle), and the
    * anisotropy ratio Σs_d² / (n·S₂) is ONE terminal division.
    *
    * Scale: one posexplode fold to a dims-sized frame plus one
    * per-vector squared-norm fold — both map-side combinable; nothing
    * downstream exceeds 64 rows. */
  def embeddingIsotropy(spark: SparkSession, dir: String): DataFrame = {
    val D38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val q = Tables.embeddings(spark, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("p", "v")))
      .select(col("vec_id"), col("p"),
        floor(col("v").cast("double") * lit(1000.0)).cast("long").as("qv"))
    // per-dim component sums; the pos=0 cell carries the vector count
    val dims = q.groupBy(col("p"))
      .agg(sum(col("qv")).as("sd"), count(lit(1)).as("cnt"))
    val a = dims.agg(
      count(lit(1)).as("n_dims"),
      max(when(col("p") === 0, col("cnt"))).as("n"),
      sum(col("sd").cast(D38) * col("sd").cast(D38)).as("ssd2"))
    val s2 = q.agg(sum(col("qv") * col("qv")).as("s2"))
    a.crossJoin(broadcast(s2))
      .select(col("n"), col("n_dims"),
        (col("s2").cast("double") / col("n").cast("double") / lit(1000000.0)).as("mean_sq_norm"),
        (col("ssd2").cast("double") /
          (col("n").cast("double") * col("n").cast("double")) / lit(1000000.0)).as("mu_sq_norm"),
        (col("ssd2").cast("double") /
          (col("n").cast("double") * col("s2").cast("double"))).as("anisotropy"))
  }

  /** PPJoin-style EXACT set-similarity join (Xiao et al., WWW 2008):
    * every pair with shingle Jaccard ≥ 0.7, with a GUARANTEE of no false
    * negatives — the deterministic complement to [[minhashLsh]]'s
    * probabilistic candidates (whose measured misses [[lshRecall]]
    * reports). The prefix-filtering lemma: order each doc's shingles by
    * global rarity (df asc, hash asc); if J(x, y) ≥ t, the first
    * |x| − ⌈t·|x|⌉ + 1 shingles of x and y must overlap — so indexing
    * ONLY that prefix still finds every qualifying pair, and prefixes
    * are built from each doc's RAREST shingles, exactly the ones with
    * tiny document frequency. PPJoin's length filter stacks on top:
    * J ≥ t bounds the size ratio (t·|x| ≤ |y|), pruning cross-size
    * candidates before the distinct. (t = 0.7, the near-dup radius the
    * curation family confirms at; at t = 0.5 the prefix is half of
    * every doc and the measured candidate volume 4×.)
    *
    * Scale: candidate volume is Σ df(h)² over PREFIX occurrences only
    * (rarity-ordered, so boilerplate high-df shingles enter a prefix
    * only for docs that consist of little else); verification joins the
    * per-doc sorted hash arrays back by doc_id and intersects IN-ROW —
    * the corpus-wide co-occurrence join the oracle runs is exactly what
    * this plan avoids. Windows partition by doc. */
  def prefixJoin(spark: SparkSession, dir: String): DataFrame = {
    // NOT checkpointed, deliberately: shx/prefix/arrs are each read
    // multiple times, but every re-reference is an identical subtree and
    // the distinct/window exchanges dedupe via ReuseExchange — eager
    // checkpoints measured 1.80 → 2.29 s (interleaved A/B at sf0.1).
    val shx = Tables.documents(spark, dir)
      .withColumn("ws", wordTokens(col("text")))
      .select(col("doc_id"), explode(array_distinct(shingleCol(col("ws")))).as("sh"))
      .select(col("doc_id"), md5Hash32(col("sh")).as("h"))
      .distinct()
    val df = shx.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val sz = shx.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // rarity order within each doc; prefix keeps n − ⌈0.7n⌉ + 1 shingles
    // (⌈7n/10⌉ = (7n+9) div 10, exact in both engines for n ≥ 0)
    val prefix = shx.join(df, "h").join(sz, "doc_id")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("h").asc)))
      .where(col("rk") <= col("n") - expr("(7 * n + 9) div 10") + lit(1))
      .select(col("doc_id"), col("h"), col("n"), col("rk"))
    // PPJoin's POSITIONAL filters (the paper's second filter family)
    // stack on the prefix match. All bounds flow from one fact: the
    // rarity order is GLOBAL, hence consistent across docs, and
    // J ≥ 0.7 requires overlap α = ⌈7(|x|+|y|)/17⌉ (I/(|x|+|y|−I) ≥
    // 7/10 ⟺ 17·I ≥ 7(|x|+|y|)).
    //
    // (1) PAIR-ADAPTIVE PREFIX, in the join condition: the per-doc
    //     stored prefix n − ⌈0.7n⌉ + 1 is sized for the worst partner
    //     (|y| = 0.7|x|); for a CONCRETE pair the first common shingle
    //     must sit within rank |x| − α + 1 of x AND |y| − α + 1 of y —
    //     for same-size partners that is ~0.18n, not 0.3n, which cut
    //     the surviving collision rows 15.4M → 5.6M on the sf1 slice
    //     (boilerplate partners have near-equal sizes).
    // (2) PER-COLLISION bound, min-aggregated: common shingles before a
    //     collision at ranks (i, j) sit at ranks < i AND < j, after it
    //     at > i AND > j, so overlap ≤ min(i,j) + min(|x|−i, |y|−j).
    // (3) MATCH-COUNT bound: with c prefix collisions whose largest
    //     ranks are (i*, j*), every unmatched common shingle sits after
    //     (i*, j*) in BOTH docs (one before them inside x's prefix but
    //     outside y's would contradict order consistency), so
    //     overlap ≤ c + min(|x|−i*, |y|−j*) — tighter than (2) when the
    //     pair's collisions are few and early.
    // The groupBy replaces the old distinct: same shuffle, less input.
    val alpha = expr("(7 * (a.n + b.n) + 16) div 17")
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id") &&
          // length filter: J ≥ 0.7 ⟹ 7·max(|x|,|y|) ≤ 10·min(|x|,|y|)
          col("a.n") * 7 <= col("b.n") * 10 && col("b.n") * 7 <= col("a.n") * 10 &&
          col("a.rk") <= col("a.n") - alpha + 1 &&
          col("b.rk") <= col("b.n") - alpha + 1)
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        col("a.n").as("pna"), col("b.n").as("pnb"),
        col("a.rk").as("ra"), col("b.rk").as("rb"),
        (least(col("a.rk"), col("b.rk")) +
          least(col("a.n") - col("a.rk"), col("b.n") - col("b.rk"))).as("obound"))
      .groupBy(col("da"), col("db"), col("pna"), col("pnb"))
      .agg(min(col("obound")).as("obound"), count(lit(1)).as("c"),
        max(col("ra")).as("mra"), max(col("rb")).as("mrb"))
      .where(col("obound") * 17 >= (col("pna") + col("pnb")) * 7 &&
        (col("c") + least(col("pna") - col("mra"), col("pnb") - col("mrb"))) * 17 >=
          (col("pna") + col("pnb")) * 7)
      .select(col("da"), col("db"))
    val arrs = shx.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("h"))).as("hs"), count(lit(1)).as("n"))
    cand
      .join(arrs.select(col("doc_id").as("da"), col("hs").as("ha"), col("n").as("na")), "da")
      .join(arrs.select(col("doc_id").as("db"), col("hs").as("hb"), col("n").as("nb")), "db")
      .withColumn("inter", size(array_intersect(col("ha"), col("hb"))).cast("long"))
      .withColumn("n_union", col("na") + col("nb") - col("inter"))
      // J ≥ 0.7 tested in exact integers: i/u ≥ 7/10 ⟺ 10i ≥ 7u
      .where(col("inter") * 10 >= col("n_union") * 7)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("inter"), col("n_union"),
        (col("inter").cast("double") / col("n_union").cast("double")).as("jaccard"))
  }

  // ── Signed-random-projection (hyperplane) LSH ─────────────────────────

  /** The shared hyperplane constants — see
    * [[graft.expressions.SrpSign64.DefaultPlanes]] (they live with the
    * kernel so the SQL function registry can reuse them without a
    * package cycle). */
  private[graft] val SrpPlanes: Seq[Long] = graft.expressions.SrpSign64.DefaultPlanes

  /** Exact-cosine confirmation threshold for [[srpNearDup]] — 0.3, the
    * same radius [[embeddingNearDup]]/[[semanticNearDup]] confirm at, so
    * the three family members are comparable on the same fixture (whose
    * max pairwise cosine is ≈ 0.51 — no tighter radius has support).
    * Band math: at cos 0.3 (θ ≈ 72.5°) one 8-bit band agrees with
    * probability (1 − θ/π)⁸ ≈ 0.016, so 8 bands alone recover only ~12%
    * of θ-boundary pairs — SRP's sweet spot is the HIGH-cosine regime
    * (at cos 0.9 the same bands give ~97% recall), which is exactly the
    * near-duplicate radius it screens for in an ingest gate; the
    * fixture's loose radius exercises the plumbing, not the S-curve. */
  private[graft] val SrpCosThreshold = 0.3

  private def srpSign64(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.SrpSign64(
        org.apache.spark.sql.graft.ColumnBridge.expression(c), SrpPlanes))

  /** Hyperplane-LSH cosine near-duplicates — the INDEX-FREE member of the
    * embedding near-dup family: where [[embeddingNearDup]]/[[semanticNearDup]]
    * need a trained coarse quantizer (IVF seed or k-means rounds) before
    * any pair forms, SRP needs only 64 fixed hyperplanes: each vector's
    * signature bit b is sign⟨v, r_b⟩ (Charikar 2002), agreeing bits
    * estimate the angle, and an 8×8-bit band equijoin proposes candidates
    * that one exact cosine pass confirms at ≥ [[SrpCosThreshold]]. The
    * one-pass/streaming-friendly shape: a NEW vector's signature needs no
    * index state at all, so the same kernel gates a continuous ingest
    * (where k-means centroids would lag the stream).
    *
    * Exactness: signatures are exact-BIGINT sign sums of 10⁻⁶-quantized
    * coordinates (native [[graft.expressions.SrpSign64]] kernel, oracle
    * recomputes the identical chain from the same plane literals); the
    * confirming cosine is the pinned index-order double fold shared by
    * every embedding query.
    *
    * Scale (100 TB): the signature is a narrow map at the scan (8 bytes
    * out per vector, embeddings never shuffle for banding); candidates
    * come from an equijoin on the compact (band, 8-bit value) key — never
    * vector×vector; the confirm pass joins embeddings back by vec_id, so
    * only LSH-surviving pairs ever pay a dot product. Band width is the
    * bucket-size dial: 8-bit bands give 256 buckets/band (fine at fixture
    * N; at 10⁹+ vectors widen to 16-bit bands exactly as
    * `simhash_neardup` argues, same plumbing). */
  /** The (vec_id, sp_lo, sp_hi) SRP signature frame — the two positive
    * 32-bit halves from the native kernel. */
  private def srpSigFrame(e: DataFrame): DataFrame =
    e.select(col("vec_id"), srpSign64(col("embedding")).as("srp"))
      .select(col("vec_id"),
        element_at(col("srp"), 1).as("sp_lo"),
        element_at(col("srp"), 2).as("sp_hi"))

  /** Distinct canonical candidate pairs from the 8×8-bit band equijoin
    * over a signature frame. */
  private def srpBandCands(sig: DataFrame): DataFrame = {
    val banded = sig
      .select(col("vec_id"), explode(sequence(lit(0), lit(7))).as("b"),
        col("sp_lo"), col("sp_hi"))
      .withColumn("bv",
        expr("CASE WHEN b < 4 THEN (sp_lo >> (8 * b)) & 255 ELSE (sp_hi >> (8 * (b - 4))) & 255 END"))
      .select(col("vec_id"), col("b"), col("bv"))
    val a = banded.select(col("vec_id").as("va"), col("b"), col("bv"))
    val c = banded.select(col("vec_id").as("vb"), col("b").as("b2"), col("bv").as("bv2"))
    a.join(c, col("b") === col("b2") && col("bv") === col("bv2") && col("va") < col("vb"))
      .select(col("va"), col("vb"))
      .distinct()
  }

  def srpNearDup(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val cand = srpBandCands(srpSigFrame(e))
    val ea = e.select(col("vec_id").as("va"), col("embedding").as("ea"), col("nrm").as("na"))
    val eb = e.select(col("vec_id").as("vb"), col("embedding").as("eb"), col("nrm").as("nb"))
    cand.join(ea, "va").join(eb, "vb")
      .withColumn("cos", dotD(col("ea"), col("eb")) / (col("na") * col("nb")))
      .filter(col("cos") >= SrpCosThreshold)
      .select(col("va"), col("vb"), col("cos"))
  }

  /** SRP estimator audit — [[minhashEstimate]]'s discipline for the
    * hyperplane family: every band-candidate pair reports its full
    * 64-bit signature Hamming distance (the SKETCH's angle estimate:
    * E[hamming]/64 = θ/π, Charikar 2002) beside the EXACT cosine, so a
    * banding/threshold choice is justified by measured estimator error,
    * not the asymptotic formula. Hamming is exact integer XOR popcount
    * on the two positive halves; cosine is the pinned index-order fold.
    *
    * Scale: the candidate set is band-bounded; signatures re-join by
    * vec_id (8 bytes each), embeddings only for the surviving pairs —
    * the [[srpNearDup]] plan plus one popcount projection. */
  def srpEstimate(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(Tables.embeddings(spark, dir))
    val sig = srpSigFrame(e)
    val cand = srpBandCands(sig)
    val sa = sig.select(col("vec_id").as("va"), col("sp_lo").as("la"), col("sp_hi").as("ha"))
    val sb = sig.select(col("vec_id").as("vb"), col("sp_lo").as("lb"), col("sp_hi").as("hb"))
    val ea = e.select(col("vec_id").as("va"), col("embedding").as("ea"), col("nrm").as("na"))
    val eb = e.select(col("vec_id").as("vb"), col("embedding").as("eb"), col("nrm").as("nb"))
    cand.join(sa, "va").join(sb, "vb").join(ea, "va").join(eb, "vb")
      .select(col("va"), col("vb"),
        expr("CAST(bit_count(la ^ lb) + bit_count(ha ^ hb) AS BIGINT)").as("hamming"),
        (dotD(col("ea"), col("eb")) / (col("na") * col("nb"))).as("cos"))
  }

  /** 3×3 determinant by cofactor expansion over named one-row columns,
    * each wrapped in `castTo` — shared by the engine (DECIMAL(38,0)) and
    * the DuckDB oracle (HUGEINT) so the Cramer arithmetic cannot drift. */
  def det3Sql(castTo: String)(
      a: String, b: String, c: String,
      d: String, e: String, f: String,
      g: String, h: String, i: String): String = {
    def w(x: String) = s"CAST($x AS $castTo)"
    s"(${w(a)} * (${w(e)} * ${w(i)} - ${w(f)} * ${w(h)})" +
      s" - ${w(b)} * (${w(d)} * ${w(i)} - ${w(f)} * ${w(g)})" +
      s" + ${w(c)} * (${w(d)} * ${w(h)} - ${w(e)} * ${w(g)}))"
  }

  /** The probe's training frames, shared by [[linearProbe]] and its
    * evaluation companions [[modelAuc]] / [[calibrationBins]]: the
    * per-row (x1, x2, y) frame and the ONE-ROW closed-form coefficient
    * frame (n, sy, sx1y, sx2y, b0, b1, b2; coefficients NULL on a
    * singular system). */
  private def probeFrames(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val q = Tables.embeddings(spark, dir).select(
      floor(element_at(col("embedding"), 1).cast("double") * 1000).cast("long").as("x1"),
      floor(element_at(col("embedding"), 2).cast("double") * 1000).cast("long").as("x2"),
      when(col("label") === 0, 1L).otherwise(0L).as("y"))
    val m = q.agg(
      count(lit(1)).as("n"),
      sum("x1").as("sx1"), sum("x2").as("sx2"),
      sum(col("x1") * col("x1")).as("sx11"),
      sum(col("x1") * col("x2")).as("sx12"),
      sum(col("x2") * col("x2")).as("sx22"),
      sum("y").as("sy"),
      sum(col("x1") * col("y")).as("sx1y"),
      sum(col("x2") * col("y")).as("sx2y"))
    val d = det3Sql("DECIMAL(38,0)") _
    val coef = m.selectExpr("*",
      s"${d("n", "sx1", "sx2", "sx1", "sx11", "sx12", "sx2", "sx12", "sx22")} AS det",
      s"${d("sy", "sx1", "sx2", "sx1y", "sx11", "sx12", "sx2y", "sx12", "sx22")} AS det0",
      s"${d("n", "sy", "sx2", "sx1", "sx1y", "sx12", "sx2", "sx2y", "sx22")} AS det1",
      s"${d("n", "sx1", "sy", "sx1", "sx11", "sx1y", "sx2", "sx12", "sx2y")} AS det2")
      .selectExpr("n", "sy", "sx1y", "sx2y",
        "CASE WHEN det = 0 THEN NULL ELSE CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) END AS b0",
        "CASE WHEN det = 0 THEN NULL ELSE CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) END AS b1",
        "CASE WHEN det = 0 THEN NULL ELSE CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) END AS b2")
    (q, coef)
  }

  /** Per-row (y, qs): probe score ŷ quantized to micro-units — the
    * shared scoring pass behind [[modelAuc]] and [[calibrationBins]].
    * ŷ is the identical fixed-order IEEE expression in both engines,
    * so the floor is safe; rows drop if the system was singular. */
  private def probeScores(spark: SparkSession, dir: String): DataFrame = {
    val (q, coef) = probeFrames(spark, dir)
    q.crossJoin(broadcast(coef.select(col("b0"), col("b1"), col("b2"))))
      .filter(col("b0").isNotNull)
      .select(col("y"),
        floor((col("b0") + col("b1") * col("x1").cast("double") +
          col("b2") * col("x2").cast("double")) * lit(1000000.0)).cast("long").as("qs"))
  }

  /** Exact ROC AUC of the in-engine probe — the other half of "train
    * in the engine": evaluate in the engine. AUC is the probability a
    * random positive outscores a random negative, i.e. the
    * Mann-Whitney U statistic normalized by n₁·n₀ — computed exactly
    * over the score histogram by the same 2U closed form as
    * [[graft.queries.AnalyticsQueries.mannWhitney]] (ties contribute
    * the standard half; 2U keeps the halves integer). Output: one row
    * with n_pos, n_neg, auc, and the Gini coefficient 2·AUC − 1.
    *
    * Scale: scores micro-quantize to a DOMAIN-bounded histogram (ŷ
    * lives in ~[0,1], so ≤ ~10⁶ distinct cells at ANY corpus size —
    * the frame the single cumulative window ranks never grows with the
    * corpus; band it like `score_agreement` if a wider score domain
    * ever makes it corpus-shaped). */
  def modelAuc(spark: SparkSession, dir: String): DataFrame = {
    val h = probeScores(spark, dir).groupBy(col("qs")).agg(
      sum(when(col("y") === 1, 1L).otherwise(0L)).as("f1"),
      sum(when(col("y") === 0, 1L).otherwise(0L)).as("f0"))
    val w = Window.orderBy(col("qs"))
      .rowsBetween(Window.unboundedPreceding, -1)
    h.withColumn("cum0", coalesce(sum(col("f0")).over(w), lit(0L)))
      .agg(sum(col("f1")).as("n_pos"), sum(col("f0")).as("n_neg"),
        sum(col("f1") * (lit(2L) * col("cum0") + col("f0"))).as("u2"))
      .select(col("n_pos"), col("n_neg"),
        (col("u2").cast("double") /
          (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double"))).as("auc"))
      .withColumn("gini", lit(2.0) * col("auc") - lit(1.0))
  }

  /** Calibration (reliability) table of the probe — 10 equal-width
    * score bins between the observed min and max score: per bin the
    * count, mean predicted score, and empirical positive rate. A
    * well-calibrated scorer has mean_pred ≈ frac_pos per bin; a probe
    * used as a quality gate needs this table before anyone picks a
    * threshold. Binning is pure integer arithmetic on the quantized
    * scores ((qs−lo)·10 div (hi−lo+1) — in [0,9] by construction), so
    * bin membership cannot drift between engines.
    *
    * Scale: min/max fold to one broadcast row; the bin rollup is one
    * map-combinable 10-group aggregate. */
  def calibrationBins(spark: SparkSession, dir: String): DataFrame = {
    val sc = probeScores(spark, dir)
    val mm = sc.agg(min(col("qs")).as("lo"), max(col("qs")).as("hi"))
    sc.crossJoin(broadcast(mm))
      .withColumn("bin",
        expr("((qs - lo) * 10) div (hi - lo + 1)"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("qs")).as("sq"), sum(col("y")).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("sq").cast("double") / col("n").cast("double") / lit(1000000.0)).as("mean_pred"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("frac_pos"))
  }

  /** Linear probe trained in-engine, closed form: least-squares
    * y ≈ b0 + b1·x1 + b2·x2 where y = [label = 0] and (x1, x2) are the
    * first two embedding components quantized to milli-units — the
    * standard representation-quality audit ("can a linear model read the
    * label out of the embedding?"), solved exactly instead of by
    * gradient descent. All nine normal-equation moments are
    * order-independent integer sums folded map-side in ONE pass; the
    * 3×3 Cramer determinants run in DECIMAL(38,0) (HUGEINT in the
    * oracle — both exact, identical values), and only the final
    * coefficient divisions touch doubles. A second broadcast-coefficient
    * pass scores the probe: R² from the moment identity, 0.5-threshold
    * accuracy vs the majority-class floor.
    *
    * Scale: pass 1 is a map-combined 9-sum aggregate (one row out);
    * pass 2 re-scans with the one-row model broadcast — no shuffle ever
    * carries more than the coefficient row, at any corpus size.
    *
    * On the synthetic fixture the first two raw dims carry no label
    * signal (per-dim |corr| ≤ 0.1 across all 64), so the probe correctly
    * reports R² ≈ 0 and accuracy at the majority-class floor — the
    * measurement, not a defect; [[pca_project]] is the companion audit
    * that looks for structure along the learned PC1 instead. */
  def linearProbe(spark: SparkSession, dir: String): DataFrame = {
    val (q, coef) = probeFrames(spark, dir)
    q.crossJoin(broadcast(coef))
      .withColumn("yhat",
        col("b0") + col("b1") * col("x1").cast("double") +
          col("b2") * col("x2").cast("double"))
      .withColumn("correct",
        ((col("yhat") >= 0.5).cast("long") === col("y")).cast("long"))
      .groupBy(col("n"), col("sy"), col("sx1y"), col("sx2y"),
        col("b0"), col("b1"), col("b2"))
      .agg(sum(col("correct")).as("n_correct"))
      .selectExpr("n", "b0", "b1", "b2",
        // SSE via the least-squares moment identity (Σy² = Σy for 0/1 y):
        // SSE = Sy - (b0·Sy + b1·Sx1y + b2·Sx2y); SST = Sy - Sy²/n
        """1.0 - (CAST(sy AS DOUBLE)
          |        - (b0 * CAST(sy AS DOUBLE) + b1 * CAST(sx1y AS DOUBLE)
          |           + b2 * CAST(sx2y AS DOUBLE)))
          |      / (CAST(sy AS DOUBLE)
          |         - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
          |  AS r2""".stripMargin,
        "CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy",
        "CAST(greatest(sy, n - sy) AS DOUBLE) / CAST(n AS DOUBLE) AS base_acc")
  }
}
