package graft.streaming

import graft.functions.TextFunctions.contentFingerprint
import graft.functions.VectorOps.{dotD, normD}
import graft.queries.SimilarityQueries
import graft.sources.Ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.sketch.BloomFilter

/** Continuous deduped corpus ingestion — the end-to-end composition a
  * training-data pipeline actually runs: watch a directory for landed
  * JSONL shards, quarantine malformed lines, drop documents whose
  * normalized-text fingerprint already exists in the STANDING corpus,
  * append the survivors. `Ingest.streamJsonl` (exactly-once file
  * pickup via the source's checkpointed log) + the `incremental_dedup`
  * anti-join pattern + an append-only corpus.
  *
  * Dedup state is the corpus ITSELF, not stream memory: each
  * micro-batch anti-joins its fingerprints against the standing
  * corpus's fingerprint column, so restarts are free, the dedup
  * horizon is the whole corpus (not a watermark window), and nothing
  * unbounded lives in the state store.
  *
  * Two layouts:
  *
  *   - [[start]]: plain parquet directory, naive dedup — the per-batch
  *     anti-join re-scans AND re-shuffles the standing fp set every
  *     batch. Kept as the simple variant and the bench baseline; its
  *     recurring cost grows with the corpus.
  *   - [[startBucketed]]: the 100 TB form, two layers:
  *     (1) a driver-held Bloom filter over every standing fp screens
  *     each batch — an all-fresh batch (the common case in continuous
  *     ingestion) appends WITHOUT touching the standing corpus at all;
  *     (2) fps the Bloom cannot rule out probe the corpus through
  *     [[standingDups]], a broadcast-probe semi-join: ONE standing
  *     column scan, zero shuffle, zero sort, regardless of corpus size
  *     (IngestSpec pins the shuffle-free plan). The corpus itself is a
  *     table BUCKETED BY fp with one file per bucket per append
  *     (bounded file count), which keeps every downstream batch
  *     equijoin on fp exchange-free (LayoutSpec) and gives the
  *     compaction path a stable layout to rewrite into.
  *
  * Bloom correctness contract: the filter is a pure over-approximation
  * of the standing fp set (seeded from a one-off distributed
  * `stat.bloomFilter` scan at stream start, extended with every
  * appended fp). It can only ever say "maybe standing" for a fresh fp
  * (false positive → we fall through to the exact anti-join, result
  * unchanged); it can never say "fresh" for a standing fp, so results
  * NEVER depend on it. Lost driver state (restart, crash between
  * append and filter update) just reseeds from the corpus. Sizing: bits
  * scale with `bloomExpectedItems` — at 10⁹ fps and 1% fpp the filter
  * is ~1.2 GB of driver heap (the standing set itself would be 30×
  * that); overfilling degrades the false-positive rate, i.e. costs
  * extra anti-joins, never answers.
  *
  * Batches also dedup WITHIN themselves first (first-doc_id keeper per
  * fp, the `dedup_exact` rule), so two copies landing in one shard
  * can't both append.
  */
object CorpusIngest {

  /** Bucketed-corpus layout + Bloom sizing for [[startBucketed]].
    *
    * `buckets` fixes the standing side's hash partitioning for the
    * corpus's whole life (append preserves it; Spark rejects a
    * mismatched re-spec) — size it for the TARGET corpus, not the
    * first batch: at 100 TB / 128 MB-ish working partitions that is
    * O(10⁵) buckets; the test default mirrors the session shuffle
    * parallelism. */
  final case class BucketedCorpus(
      table: String,
      buckets: Int = 32,
      bloomExpectedItems: Long = 4L * 1024 * 1024,
      bloomFpp: Double = 0.01,
      /** Driver-side screening budget per micro-batch: the ingest design
        * collects each batch's (fp[, cluster]) keys and band signatures
        * to the driver for Bloom screening — bounded by source ADMISSION
        * (`maxFilesPerTrigger`/`maxBytesPerTrigger`), not by corpus
        * size. This caps that collect so a misconfigured trigger fails
        * loudly instead of OOMing the driver. 1M keys ≈ 100 MB of
        * 32-hex strings — far above any sane micro-batch, far below
        * driver heap. */
      maxBatchKeys: Int = 1 << 20)

  /** Frozen trained centroids + cosine threshold for SEMANTIC dedup at
    * ingest time — the SemDeDup composition: an incoming document whose
    * embedding sits within `threshold` cosine of ANY standing document
    * in its assigned cluster is a paraphrase-duplicate and is
    * quarantined instead of appended, even though its exact fingerprint
    * is fresh.
    *
    * The centroids are driver-held rows (≤ k = [[SimilarityQueries.IvfK]]
    * of them) collected ONCE from [[SimilarityQueries.kmeansCentroids]]
    * (or any frame shaped (cid, cemb: array<double>, cnrm)) and
    * re-broadcast per micro-batch through the same one-row in-row-argmax
    * assignment the batch queries use — batch `semantic_neardup` and
    * streaming ingest agree on cluster membership by construction.
    *
    * Scale: assignment is a narrow map over the batch; the standing
    * side of the pair check is pruned to the ≤ k clusters actually
    * present in the batch (a PARTITION filter — the corpus table is
    * partitioned by cluster when a gate is configured), and the pair
    * space is batch_rows × standing_cluster_rows, the same
    * Σ-bucket-bounded shape as the batch query. */
  final case class SemanticGate(
      centroids: Seq[(Long, Seq[Double], Double)],
      threshold: Double) {
    require(centroids.nonEmpty, "SemanticGate needs at least one centroid")
  }

  object SemanticGate {
    /** Collect a (cid, cemb, cnrm) centroid frame into a frozen gate. */
    def fromFrame(cents: DataFrame, threshold: Double): SemanticGate =
      SemanticGate(
        cents.collect().toIndexedSeq.map(r =>
          (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))),
        threshold)

    /** Train on an embeddings table and freeze — the offline step a
      * deployment runs before starting the ingest stream. */
    def train(spark: SparkSession, embeddingsDir: String, rounds: Int,
              threshold: Double): SemanticGate =
      fromFrame(SimilarityQueries.kmeansCentroids(spark, embeddingsDir, rounds), threshold)
  }

  /** Streaming TEXT near-dup gate — MinHash over word 3-gram shingles,
    * for corpora WITHOUT embeddings (the [[SemanticGate]] twin). An
    * incoming document sharing an LSH band signature with a standing
    * (or smaller-doc_id same-batch) document AND agreeing on at least
    * `minMatches` of the 12 MinHash components is a near-duplicate and
    * is quarantined to `neardup/`. matches/12 estimates shingle-set
    * Jaccard (the batch `minhash_estimate` query audits exactly this
    * estimator against exact Jaccard), so minMatches = 9 ≈ "Jaccard
    * ≳ 0.75". Signatures are the SAME construction as the batch
    * `minhash_lsh` pipeline ([[SimilarityQueries.minhashSigsOf]] /
    * `bandSigs`), so batch and streaming agree on what a signature is.
    *
    * State is a side table `<corpus>_sigs` (doc_id, band, sig,
    * mh0..mh11 — 4 rows per doc, bucketed by sig) maintained per batch
    * for appended survivors, probed with the same Bloom + broadcast-
    * probe pattern as the exact pass: one sigs-table scan, zero
    * shuffle, at any corpus size; all-fresh batches (no Bloom hit on
    * any band signature) skip the scan entirely. Sig rows append AFTER
    * the corpus append: a crash between the two loses only future
    * near-dup coverage for that batch's docs (benign), where the
    * reverse order would let a replayed batch near-dup-match its own
    * signatures and silently drop its rows.
    *
    * Docs with fewer than 3 tokens have no shingles, hence no
    * signature: they always pass (and add no index rows).
    *
    * Cost model (IngestBench records it): the gate's work — shingle +
    * 12-hash signatures and the within-batch band self-join — is
    * BATCH-proportional, so it prices each incremental wave, not the
    * corpus. Corollary: bootstrap a large EXISTING corpus with the
    * batch dedup pipeline (`minhash_lsh`/`dedup_clusters`) and start
    * the gated stream from its output; pushing the whole history
    * through the gate in one giant micro-batch does the batch
    * pipeline's job at streaming prices. */
  final case class MinHashGate(minMatches: Int = 9) {
    require(minMatches >= 1 && minMatches <= SimilarityQueries.MinhashSeeds.size,
      s"minMatches must be in [1, ${SimilarityQueries.MinhashSeeds.size}]")
  }

  /** The signature side table backing [[MinHashGate]]. */
  private[graft] def sigsTable(corpus: BucketedCorpus): String = s"${corpus.table}_sigs"

  /** The corpus tombstone LEDGER backing [[retireDocs]] — an
    * append-only table of (doc_id, ts, retire) events: [[retireDocs]]
    * appends retire=true rows, the appender appends retire=false
    * (un-retire) rows when a retired doc_id re-ingests. Append-only by
    * design: both writers only ever ADD rows, so a takedown landing
    * concurrently with an ingest batch can never lose the other's
    * update (the lost-update hazard an overwrite-style tombstone table
    * would have). Bounded by takedown traffic since the last
    * [[compact]] (which deletes exactly the events it consumed) or
    * [[compactLedger]] (which rewrites to one resolved latest-state
    * row per doc_id — `--mode retire` rides it past a threshold),
    * never by corpus size. */
  private[graft] def retiredTable(corpus: BucketedCorpus): String =
    s"${corpus.table}_retired"

  /** Currently-pending takedown ids — each doc_id's LATEST ledger event
    * wins (ties prefer retire: boolean true sorts above false in the
    * (ts, retire) struct max, so a same-instant retire/un-retire pair
    * resolves to the safe direction). None when no retire has ever run
    * (the common case — readers then skip the serve-around join
    * entirely). The aggregation runs over the tiny ledger, never the
    * corpus. */
  private[graft] def retiredIds(spark: SparkSession, corpus: BucketedCorpus): Option[DataFrame] =
    if (spark.catalog.tableExists(retiredTable(corpus))) {
      // refresh before reading: the ledger is written by OTHER sessions
      // (a takedown CLI, the streaming clone's un-retire) whose inserts
      // invalidate their own relation cache, not this session's — a
      // stale listing here would keep hiding an un-retired doc. The
      // table is takedown-traffic-sized, so the re-list is metadata
      // noise.
      spark.catalog.refreshTable(retiredTable(corpus))
      Some(spark.table(retiredTable(corpus))
        .groupBy(col("doc_id"))
        .agg(max(struct(col("ts"), col("retire"))).as("last"))
        .filter(col("last.retire"))
        .select(col("doc_id")))
    } else None

  /** `df` minus pending-takedown rows — the serve-around every standing
    * reader applies between a [[retireDocs]] and the next [[compact]]:
    * one broadcast anti-join on the (takedown-traffic-sized) tombstone
    * set, zero shuffle, zero extra standing scans. */
  private[graft] def serveAround(
      df: DataFrame, retired: Option[DataFrame]): DataFrame =
    retired.map(r => df.join(broadcast(r), Seq("doc_id"), "left_anti"))
      .getOrElse(df)

  /** The ACTIVE corpus view — standing rows minus pending takedowns.
    * This is the read surface consumers (and the ingest probes) use;
    * reading `spark.table(corpus.table)` directly sees rows that are
    * legally retired but not yet physically compacted away. */
  def activeCorpus(spark: SparkSession, corpus: BucketedCorpus): DataFrame =
    serveAround(spark.table(corpus.table), retiredIds(spark, corpus))

  /** Collect a driver-bound frame, failing LOUDLY past `maxRows` — the
    * guard that keeps the design's driver-side screening honest: batch
    * keys/signatures are collected per micro-batch (sized by source
    * admission control, never by the corpus), and a misconfigured
    * trigger must fail with the knob named, not OOM the driver. The
    * `limit(maxRows + 1)` bounds the TRANSFER itself, so even the
    * failing path materializes at most one row past the budget. */
  private[streaming] def collectBounded(
      df: DataFrame, maxRows: Int, what: String): IndexedSeq[org.apache.spark.sql.Row] = {
    // saturate, don't wrap: maxRows = Int.MaxValue (the natural way to
    // disable the guard) must not become limit(-2^31), which Spark
    // rejects and which would kill the stream on its first batch
    val probe = math.min(maxRows.toLong + 1L, Int.MaxValue.toLong).toInt
    val rows = df.limit(probe).collect().toIndexedSeq
    require(rows.length <= maxRows,
      s"CorpusIngest: $what exceeded maxBatchKeys=$maxRows for one micro-batch. " +
        "The driver-side Bloom screen is sized for admission-controlled batches: " +
        "tighten the source trigger (maxFilesPerTrigger / maxBytesPerTrigger) or " +
        "raise BucketedCorpus.maxBatchKeys.")
    rows
  }

  /** A signature frame's columns renamed under `prefix`, plus the
    * component-match count between the UNPREFIXED mh columns (of
    * whatever frame this joins against) and the prefixed ones — the one
    * construction both MinHash probes (within-batch and standing)
    * share, so the match rule cannot diverge between them. */
  private def prefixedSigs(ws: DataFrame, prefix: String)
      : (DataFrame, org.apache.spark.sql.Column) = {
    val n = SimilarityQueries.MinhashSeeds.size
    val renamed = ws.select(
      Seq(col("doc_id").as(s"${prefix}id"), col("band").as(s"${prefix}band"),
        col("sig").as(s"${prefix}sig")) ++
        (0 until n).map(i => col(s"mh$i").as(s"${prefix}mh$i")): _*)
    val nMatch = (0 until n).map(i =>
      when(col(s"mh$i") === col(s"${prefix}mh$i"), 1).otherwise(0)).reduce(_ + _)
    (renamed, nMatch)
  }

  /** Split incoming rows against same-cluster standing rows by cosine:
    * (fresh, semantic-dup). `incoming` carries (cluster, embedding,
    * nrm); `standing` must be pre-renamed to (s_cluster, s_emb, s_nrm).
    * Shared verbatim by the streaming gate and the batch agreement
    * test, so the two paths cannot diverge.
    *
    * Join shape, same discipline as [[standingDups]]: the STANDING side
    * only ever streams past a broadcast of the (micro-batch-sized)
    * incoming frame — a direct left-anti against standing would make
    * Spark shuffle the standing cluster rows on every batch (an anti
    * join can only broadcast its right side). The matched incoming ids
    * are batch-bounded, so the id-distinct and the final broadcast
    * anti/semi are all batch-priced. */
  /** The ids of incoming rows with a same-cluster standing row within
    * `threshold` — [[semanticSplit]]'s verdict, exposed so the
    * streaming path can MATERIALIZE it (collect) before the corpus
    * append: a lazy frame that reads the standing table must never be
    * evaluated after the batch lands, or the appended rows match
    * THEMSELVES (Spark's recacheByPath recomputes persisted plans
    * whose lineage touches the written path — observed dropping a
    * fresh doc's signature rows before this was materialized). */
  private[graft] def semanticDupIds(
      incoming: DataFrame, standing: DataFrame, threshold: Double): DataFrame = {
    val cond = col("cluster") === col("s_cluster") &&
      (dotD(col("embedding"), col("s_emb")) / (col("nrm") * col("s_nrm"))) >= threshold
    standing.join(broadcast(incoming), cond).select(col("doc_id")).distinct()
  }

  private[graft] def semanticSplit(
      incoming: DataFrame, standing: DataFrame, threshold: Double)
      : (DataFrame, DataFrame) = {
    val dupIds = semanticDupIds(incoming, standing, threshold)
    (incoming.join(broadcast(dupIds), Seq("doc_id"), "left_anti"),
      incoming.join(broadcast(dupIds), Seq("doc_id"), "left_semi"))
  }

  /** Batch-LOCAL semantic keeper election: a row is dropped iff SOME
    * same-cluster batch row with a SMALLER doc_id sits within the
    * cosine threshold — the semantic twin of [[electKeepers]]'
    * min-doc_id rule, so two paraphrases landing in ONE shard can't
    * both append (the standing check alone only sees earlier batches).
    * The smaller-id neighbor may itself have been dropped: in a chain
    * a~b~c (a<b<c, a NOT~ c), both b AND c drop — chains collapse
    * toward their minimum, the same keep-set a connected-components
    * pass would elect for min-anchored chains, WITHOUT the iterative
    * closure (a row whose only smaller-id links are outside threshold
    * survives even if components would merge it). A curation pass
    * wanting exact components runs the batch `dedup_clusters`. Cost:
    * one broadcast self-join of the (micro-batch-sized) frame. Returns
    * (keepers, dropped). */
  private[graft] def semanticKeepers(batch: DataFrame, threshold: Double)
      : (DataFrame, DataFrame) = {
    val other = batch.select(
      col("doc_id").as("o_id"), col("cluster").as("o_cluster"),
      col("embedding").as("o_emb"), col("nrm").as("o_nrm"))
    val cond = col("cluster") === col("o_cluster") && col("o_id") < col("doc_id") &&
      (dotD(col("embedding"), col("o_emb")) / (col("nrm") * col("o_nrm"))) >= threshold
    // no broadcast hint: both sides are the micro-batch, so a shuffle
    // here is batch-priced (fine), while a FORCED broadcast would OOM
    // on an oversized batch; Catalyst broadcasts small batches on its
    // own size estimate
    (batch.join(other, cond, "left_anti"), batch.join(other, cond, "left_semi"))
  }

  /** Driver-held over-approximation of the standing corpus's fp set.
    * Purely an optimization gate (see the object scaladoc's contract);
    * rebuilt from the corpus on every stream start. */
  private[streaming] final class BloomGate(expected: Long, fpp: Double) {
    private var bloom: BloomFilter = BloomFilter.create(expected, fpp)
    /** One distributed scan of the standing fps. REPLACES the filter
      * rather than merging: the aggregate may size its bit array
      * differently from a driver-side create (Spark caps aggregate
      * bloom bits), and a bit-size mismatch makes merge throw. A capped
      * seed just raises the false-positive rate — extra probes, never
      * wrong answers. */
    def seed(standingFps: DataFrame, colName: String): Unit =
      bloom = standingFps.stat.bloomFilter(colName, expected, fpp)
    def mightContain(fp: String): Boolean = bloom.mightContain(fp)
    def add(fps: Iterable[String]): Unit = fps.foreach(bloom.put)
  }

  /** Which probe fps already stand in the corpus — ONE standing column
    * scan, ZERO shuffle, ZERO sort, at any corpus size: the probe side
    * (the batch fps the Bloom could not rule out) is broadcast and the
    * standing set streams past it as a semi-join. This replaces the
    * standing-side anti-join in the per-batch path — a sort-merge
    * anti-join would re-SORT the whole standing fp set every batch,
    * which is the cost that grows without bound as the corpus grows.
    * The output is at most probe-sized (micro-batch-bounded), so
    * collecting it back to the driver is safe. Exposed for the
    * IngestSpec plan assertion. */
  private[graft] def standingDups(standing: DataFrame, probe: DataFrame): DataFrame =
    standing.select(col("fp")).join(broadcast(probe), Seq("fp"), "left_semi")

  /** Structural completeness: a line can be valid JSON yet unusable —
    * doc_id or text absent → null after the schema-pinned parse. Such
    * rows can neither be deduped (a null fp collapses unrelated docs
    * inside a batch AND never matches the standing anti-join across
    * batches) nor elected, so they are QUARANTINED, preserving the
    * every-line-lands-somewhere contract. */
  private val complete = col("doc_id").isNotNull && col("text").isNotNull

  /** Batch-local keeper election: exactly one row per fingerprint
    * survives — `row_number` over (fp, doc_id), NOT `doc_id = min(doc_id)`,
    * so two copies of the SAME doc_id in one shard still elect a single
    * keeper instead of both tying at the min. The fp key is
    * [[contentFingerprint]] — the same rule as the batch
    * `incremental_dedup`/`dedup_exact` queries, so streaming and batch
    * agree on what counts as a duplicate. */
  private[graft] def electKeepers(completeRows: DataFrame): DataFrame = {
    val pick = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    completeRows
      .withColumn("fp", contentFingerprint(col("text")))
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** The standing anti-join both layouts share: batch-local keepers vs
    * the standing fp column. No `distinct()` on the standing side — a
    * left-anti join is insensitive to right-side duplicates, and the
    * corpus is unique-by-fp by construction, so the distinct was one
    * whole-corpus shuffle per batch for nothing. Exposed for the
    * IngestSpec plan assertion. */
  private[graft] def freshAgainst(local: DataFrame, standing: DataFrame): DataFrame =
    local.join(standing.select(col("fp")), Seq("fp"), "left_anti")

  /** One micro-batch against a plain parquet-directory corpus.
    * Exposed for direct batch testing.
    *
    * The incomplete-quarantine append is at-least-once: a replayed
    * micro-batch (foreachBatch's contract on retry) re-appends the same
    * quarantine rows — acceptable for a dead-letter directory, whose
    * consumers triage rather than aggregate; the CORPUS append stays
    * effectively-once because replayed rows fail the fp anti-join. No
    * emptiness pre-check: an empty append is harmless and the probe
    * cost an extra action per batch. */
  private[streaming] def appendDeduped(
      spark: SparkSession, batch: DataFrame,
      corpusDir: String, incompleteDir: String): Unit = {
    // one materialization per invocation: quarantine + election + join
    // all read this frame
    batch.persist()
    try {
      batch.filter(!complete).write.mode("append").parquet(incompleteDir)
      val local = electKeepers(batch.filter(complete))
      val fresh =
        if (corpusExists(spark, corpusDir))
          freshAgainst(local, spark.read.parquet(corpusDir))
        else local
      fresh.write.mode("append").parquet(corpusDir)
    } finally batch.unpersist()
  }

  /** One micro-batch against the BUCKETED corpus table, Bloom-gated,
    * with optional semantic (embedding) and MinHash (text) gates:
    *
    *   1. quarantine incomplete rows (with a gate, a missing embedding
    *      is incomplete too — the row can't be semantically checked);
    *      elect batch-local keepers
    *   2. with a gate: assign each keeper its cluster (one-row centroid
    *      broadcast, narrow map — no shuffle)
    *   3. collect the batch's (fp, cluster) pairs to the driver
    *      (bounded by micro-batch size — 32-hex strings + longs)
    *   4. EXACT pass: fps the Bloom rules out are fresh with no I/O at
    *      all; the rest probe the corpus via [[standingDups]] (one
    *      scan, no shuffle), and confirmed dups drop out of the batch
    *      through a broadcast anti-join — batch-sized, also shuffle-free
    *   5. SEMANTIC pass: batch-local keeper election first
    *      ([[semanticKeepers]] — paraphrase pairs inside one shard),
    *      then anti/semi-join the survivors against standing rows of
    *      the SAME clusters only (a partition filter — the table is
    *      partitioned by cluster); cosine ≥ threshold → quarantined to
    *      `semdupDir` as a paraphrase-duplicate
    *   6. MINHASH pass ([[MinHashGate]]): within-batch band election,
    *      then a Bloom-screened broadcast probe of the `<corpus>_sigs`
    *      table; near-dups → `neardupDir`
    *   7. append the survivors (one file per bucket); append their
    *      signature rows; extend both Blooms with what landed
    */
  private[streaming] def appendDedupedBucketed(
      spark: SparkSession, batch: DataFrame,
      corpus: BucketedCorpus, incompleteDir: String, gate: BloomGate,
      semantic: Option[SemanticGate] = None, semdupDir: String = "",
      minhash: Option[MinHashGate] = None, sigBloom: Option[BloomGate] = None,
      neardupDir: String = ""): Unit = {
    val completeCond =
      if (semantic.isDefined) complete && col("embedding").isNotNull else complete
    batch.persist()
    try {
      batch.filter(!completeCond).write.mode("append").parquet(incompleteDir)
      val keepers = electKeepers(batch.filter(completeCond))
      val local = (semantic match {
        case Some(g) =>
          import spark.implicits._
          val centDf = g.centroids.toDF("cid", "cemb", "cnrm")
          SimilarityQueries
            .assignToCentroids(keepers.withColumn("nrm", normD(col("embedding"))), centDf)
            .drop("ccos")
        case None => keepers
      }).persist()
      try {
        val keyCols = col("fp") +: semantic.map(_ => col("cluster")).toSeq
        val keys = collectBounded(local.select(keyCols: _*),
          corpus.maxBatchKeys, "batch (fp[, cluster]) keys")
        val fps = keys.map(_.getString(0))
        // maintenance-swap guard: a compact tmp table existing — for the
        // CORPUS or for the SIGS side table — means a tmp-swap is in
        // flight (between its saveAsTable and RENAME) or a crashed swap
        // left its only full copy under the tmp name. Appending now
        // would either land rows the in-flight rewrite already missed
        // (silently dropped at swap) or — worse, on the sigs side —
        // recreate the dropped table mid-swap, making the RENAME fail
        // and stranding the standing data in tmp where the next
        // rewrite's cleanup would destroy it. Fail the batch LOUDLY;
        // the stream retries after the swap (or its crash recovery)
        // completes. The rewrite itself additionally aborts if an
        // append slips in during its read phase (before tmp exists) —
        // see Layout.rewriteBucketed's lost-append check.
        val tmpInFlight = (Seq(corpus.table, sigsTable(corpus))
          .map(t => s"${t}_compact_tmp") :+
          // the batch may append un-retire events; a ledger swap in
          // flight must fail it the same way (see requireNoLedgerSwap)
          s"${retiredTable(corpus)}_swap_tmp").filter(spark.catalog.tableExists)
        if (tmpInFlight.nonEmpty)
          throw new IllegalStateException(
            s"${corpus.table}: maintenance swap in progress " +
              s"(${tmpInFlight.mkString(", ")} exists) — retry this batch " +
              "after compact/retire completes")
        val exists = spark.catalog.tableExists(corpus.table)
        // pending takedowns, collected ONCE per batch (bounded by
        // takedown traffic since the last compact): every standing
        // probe below serves around this set so a retired doc neither
        // counts as a standing dup nor generates near-dup quarantines
        // — the immediate-legal-effect half of the retire lifecycle
        val retiredSet: IndexedSeq[Long] = retiredIds(spark, corpus)
          .map { df => import spark.implicits._; df.as[Long].collect().toIndexedSeq }
          .getOrElse(IndexedSeq.empty)
        val retiredDf: Option[DataFrame] =
          if (retiredSet.isEmpty) None
          else {
            import spark.implicits._
            Some(broadcast(retiredSet.toDF("doc_id")))
          }
        // exact pass: Bloom screens the batch fps on the driver; only
        // the survivors ("maybe standing" — false positives included)
        // probe the corpus, via the shuffle-free broadcast semi-join
        val maybe = fps.filter(gate.mightContain)
        val dupSet: Set[String] =
          if (!exists || maybe.isEmpty) Set.empty
          else {
            import spark.implicits._
            standingDups(serveAround(spark.table(corpus.table), retiredDf),
                maybe.toDF("fp"))
              .as[String].collect().toSet
          }
        val exactFresh =
          if (dupSet.isEmpty) local
          else {
            import spark.implicits._
            local.join(broadcast(dupSet.toSeq.toDF("fp")), Seq("fp"), "left_anti")
          }
        val fresh = semantic match {
          case Some(g) =>
            // within-batch first (two paraphrases in one shard must not
            // both append), then against the standing corpus. The
            // standing verdict is COLLECTED here, before the append:
            // everything evaluated after the batch lands (quarantine
            // writes, the sig-table semi-join) must carry batch-only
            // lineage — see semanticDupIds' hazard note
            val (localKeep, localDup) = semanticKeepers(exactFresh, g.threshold)
            val standIdsDf: Option[DataFrame] =
              if (!exists) None
              else {
                import spark.implicits._
                val clusters = keys.map(_.getLong(1)).distinct
                val standing = serveAround(
                    spark.table(corpus.table)
                      .filter(col("cluster").isin(clusters: _*)), retiredDf)
                  .select(col("cluster").as("s_cluster"),
                    col("embedding").as("s_emb"), col("nrm").as("s_nrm"))
                val semIds = semanticDupIds(localKeep, standing, g.threshold)
                  .as[Long].collect().toIndexedSeq
                if (semIds.isEmpty) None else Some(broadcast(semIds.toDF("doc_id")))
              }
            val dupAll = standIdsDf
              .map(ids => localDup.unionByName(localKeep.join(ids, Seq("doc_id"), "left_semi")))
              .getOrElse(localDup)
            dupAll.write.mode("append").parquet(semdupDir)
            standIdsDf
              .map(ids => localKeep.join(ids, Seq("doc_id"), "left_anti"))
              .getOrElse(localKeep)
          case None => exactFresh
        }
        // with gates active, `fresh` feeds several actions (signature
        // build, quarantine writes, the corpus append, the sig-table
        // semi-join) — pin it so the gate joins and the standing
        // cluster scan run once, not once per action
        val gated = semantic.isDefined || minhash.isDefined
        if (gated) fresh.persist()
        // MINHASH pass (text near-dup, see MinHashGate): within-batch
        // election + Bloom-screened standing probe, both on the shared
        // batch/streaming signature construction
        val withSig = minhash.map { _ =>
          val mins = SimilarityQueries.minhashSigsOf(
            fresh.select(col("doc_id"), col("text")))
          SimilarityQueries.bandSigs(mins).join(mins, "doc_id").persist()
        }
        try {
          val (finalFresh, survivorSigs) = (minhash, withSig, sigBloom) match {
            case (Some(g), Some(ws), Some(sb)) =>
              import spark.implicits._
              // 4 band rows per doc, hence 4× the key budget (long math:
              // a near-MaxValue configured budget must saturate, not wrap)
              val sigBudget = math.min(4L * corpus.maxBatchKeys, Int.MaxValue - 1L).toInt
              val sigPairs = collectBounded(ws.select(col("doc_id"), col("sig")),
                sigBudget, "batch band signatures")
              // within-batch: band collision against a SMALLER doc_id
              // with >= minMatches agreeing components — drop iff such
              // a neighbor EXISTS, dropped or not (chains collapse
              // toward the min; same rule as semanticKeepers)
              // no broadcast hint on the self-join: both sides are the
              // batch (see semanticKeepers' note)
              val (o, nMatchLocal) = prefixedSigs(ws, "o_")
              val localDupIds = ws.join(o,
                  col("band") === col("o_band") && col("sig") === col("o_sig") &&
                    col("o_id") < col("doc_id"))
                .filter(nMatchLocal >= g.minMatches)
                .select(col("doc_id")).distinct().as[Long].collect().toSet
              // standing: Bloom-screened broadcast probe of the sigs
              // table — one scan, no shuffle; skipped when no incoming
              // band signature can possibly collide.
              // Twin standing rows (an un-retired doc's duplicate sig
              // rows, pending compact) cannot flip any outcome here:
              // nMatchStanding compares the 12 mh COMPONENTS of one
              // (standing row, probe row) pair — it never counts rows —
              // and the result folds through distinct(); a twin just
              // re-evaluates the same per-row predicate. (A doc_id
              // re-used for DIFFERENT content could match via its stale
              // rows, but that id reuse is outside retireDocs'
              // stable-identity contract, and matching stale content
              // only over-quarantines — the safe direction.)
              val sigT = sigsTable(corpus)
              val anyMaybe = sigPairs.exists(r => sb.mightContain(r.getString(1)))
              val standingDupIds: Set[Long] =
                if (!anyMaybe || !spark.catalog.tableExists(sigT)) Set.empty
                else {
                  val (probe, nMatchStanding) = prefixedSigs(ws, "in_")
                  serveAround(spark.table(sigT), retiredDf)
                    .join(broadcast(probe),
                      col("band") === col("in_band") && col("sig") === col("in_sig"))
                    .filter(nMatchStanding >= g.minMatches)
                    .select(col("in_id")).distinct().as[Long].collect().toSet
                }
              val dropIds = localDupIds ++ standingDupIds
              if (dropIds.isEmpty) (fresh, sigPairs.map(_.getString(1)))
              else {
                val dropDf = broadcast(dropIds.toSeq.toDF("doc_id"))
                fresh.join(dropDf, Seq("doc_id"), "left_semi")
                  .write.mode("append").parquet(neardupDir)
                (fresh.join(dropDf, Seq("doc_id"), "left_anti"),
                  sigPairs.filterNot(r => dropIds(r.getLong(0))).map(_.getString(1)))
              }
            case _ => (fresh, Seq.empty[String])
          }
          // pre-shuffle to exactly the bucket layout: repartition hash
          // (Murmur3 pmod n) IS the bucketing hash, so each task holds
          // one bucket's rows and writes ONE file — without this the
          // Bloom fast path (arbitrary input partitioning) writes up to
          // tasks × buckets files per append, and the standing scan
          // then pays a footer-read per file forever (the small-files
          // problem Layout.compactFiles exists to undo). One
          // batch-sized shuffle per append buys a bounded file count.
          val w = finalFresh.repartition(corpus.buckets, col("fp")).write
          (if (semantic.isDefined) w.partitionBy("cluster") else w)
            .bucketBy(corpus.buckets, "fp")
            .sortBy("fp")
            .mode("append")
            .saveAsTable(corpus.table)
          // sig rows for what ACTUALLY landed, appended AFTER the corpus
          // (crash between the two loses only future near-dup coverage
          // for this batch — see MinHashGate's ordering note)
          (minhash, withSig, sigBloom) match {
            case (Some(_), Some(ws), Some(sb)) =>
              ws.join(broadcast(finalFresh.select(col("doc_id"))), Seq("doc_id"), "left_semi")
                .repartition(corpus.buckets, col("sig"))
                .write.bucketBy(corpus.buckets, "sig").sortBy("sig")
                .mode("append").saveAsTable(sigsTable(corpus))
              sb.add(survivorSigs)
            case _ =>
          }
          // appended fps are driver-computable — batch fps minus the
          // confirmed standing dups — so no extra collect job runs. The
          // semantic/minhash passes may have dropped more rows; adding
          // their fps anyway is a safe over-approximation per the Bloom
          // contract.
          gate.add(fps.filterNot(dupSet))
          // un-retire: a landed doc_id that was pending takedown just
          // re-ingested — append retire=false ledger events so the
          // serve-around stops hiding the fresh copy. Runs only while
          // a retire is pending (retiredSet nonempty — the rare state);
          // the landed∩pending intersection is one batch-priced
          // semi-join against the broadcast pending set, and the write
          // is an APPEND of literal rows (never reads the ledger — no
          // self-insert, no lost-update window with a concurrent
          // retireDocs).
          retiredDf.foreach { pend =>
            import spark.implicits._
            val landedRetired = finalFresh.select(col("doc_id"))
              .join(pend, Seq("doc_id"), "left_semi")
              .distinct().as[Long].collect()
            if (landedRetired.nonEmpty)
              landedRetired.toSeq.toDF("doc_id")
                .withColumn("ts", current_timestamp())
                .withColumn("retire", lit(false))
                .write.mode("append").saveAsTable(retiredTable(corpus))
          }
        } finally {
          withSig.foreach(_.unpersist())
          if (gated) fresh.unpersist()
        }
      } finally local.unpersist()
    } finally batch.unpersist()
  }

  /** Periodic maintenance for the bucketed corpus: rewrite to one
    * sorted file per bucket ([[graft.sources.Layout.rewriteBucketed]]).
    * Continuous appends add a file per bucket per batch; run this
    * between ingest sessions (it swaps the table out from under a
    * running stream's scan otherwise) on whatever cadence keeps the
    * per-bucket file count acceptable. `semantic` must match how the
    * stream was started — a cluster-partitioned corpus keeps its
    * partitioning through the rewrite. Passing a `retention` policy
    * additionally expires date partitions of the companion
    * time-series sink past the magnetic TTL on the same cadence. */
  def compact(spark: SparkSession, corpus: BucketedCorpus,
              semantic: Boolean = false,
              retention: Option[graft.sources.Layout.RetentionPolicy] = None): Unit = {
    import spark.implicits._
    // pending takedowns ride the compaction rewrite — the physical half
    // of the retire lifecycle ([[retireDocs]] wrote only tombstones).
    // The ledger is SNAPSHOTTED ONCE here, as literal rows (bounded by
    // takedown traffic since the last compact): both rewrites purge
    // from the same resolved pending set (a lazy frame would re-read
    // the live ledger per rewrite — a retire landing between the two
    // would leave corpus and sigs inconsistent), and at the end only
    // the CONSUMED snapshot events are deleted from the ledger — a
    // retire or un-retire committed while the rewrites ran survives
    // for the next compact instead of being dropped with the table
    // (the lost-takedown hazard of a blanket DROP). The same corpus
    // pass also collapses the identical duplicate rows a same-doc_id
    // re-ingest leaves behind (see retireDocs — dups can ONLY arise
    // from the retire lifecycle, so the dedup runs only when a retire
    // table exists). Crash-safe: the ledger is truncated LAST, so a
    // crash mid-compact re-runs the purge idempotently and readers
    // keep serving around the still-pending set.
    val hadRetired = spark.catalog.tableExists(retiredTable(corpus))
    val ledgerSnap: Seq[(Long, java.sql.Timestamp, Boolean)] =
      if (!hadRetired) Nil
      else {
        spark.catalog.refreshTable(retiredTable(corpus))
        spark.table(retiredTable(corpus))
          .select(col("doc_id"), col("ts"), col("retire"))
          .as[(Long, java.sql.Timestamp, Boolean)].collect().toSeq
      }
    // latest-wins resolution over the SNAPSHOT (ties prefer retire —
    // the same rule as retiredIds), computed driver-side on the
    // collected rows so both rewrites see one immutable set
    val pending: Seq[Long] = ledgerSnap
      .groupBy(_._1)
      .collect { case (id, evs) if evs.maxBy(e => (e._2.getTime, e._3))._3 => id }
      .toSeq
    val retired =
      if (pending.isEmpty) None else Some(broadcast(pending.toDF("doc_id")))
    def purge(dedupCols: Seq[String])(df: DataFrame): DataFrame =
      if (!hadRetired) df
      else serveAround(df, retired).dropDuplicates(dedupCols)
    graft.sources.Layout.rewriteBucketed(
      spark, corpus.table, "fp", corpus.buckets,
      if (semantic) Seq("cluster") else Nil,
      purge(Seq("fp")))
    if (spark.catalog.tableExists(sigsTable(corpus)))
      graft.sources.Layout.rewriteBucketed(
        spark, sigsTable(corpus), "sig", corpus.buckets, Nil,
        purge(Seq("doc_id", "band")))
    if (hadRetired) {
      // delete exactly the consumed events (anti-join on the full
      // event triple); events appended during the rewrites — retires
      // from a takedown CLI, un-retires from a live appender — stay
      // pending for the next compact. The fenced swap aborts (ledger
      // untouched) if an append lands mid-truncation: leftover
      // consumed events are semantically harmless (their docs are
      // already purged; serving around an absent id is a no-op), so
      // an aborted truncation costs bloat, never correctness.
      val snapDf = ledgerSnap.toDF("doc_id", "ts", "retire")
      rewriteLedger(spark, corpus)(
        _.join(snapDf, Seq("doc_id", "ts", "retire"), "left_anti"))
    }
    // retention rides the same maintenance cadence: expire date
    // partitions of the companion time-series sink past the magnetic
    // TTL (the reference's MagneticStoreRetentionPeriodInDays,
    // TimestreamInitializer.java:47-50). One directory delete per
    // expired day; in-retention files untouched.
    retention.foreach(p => graft.sources.Layout.applyRetention(spark, p))
  }

  /** TAKEDOWN across the standing ingest corpus — O(takedown), not
    * O(corpus): append the doc_ids to the `<corpus>_retired` tombstone
    * table and STOP. No corpus or sigs file is touched (IngestSpec pins
    * byte-identity of every standing file across a retire). Legal
    * effect is immediate because every standing reader serves AROUND
    * the tombstones ([[activeCorpus]]; the ingest probes —
    * [[standingDups]]' scan, the semantic cluster scan, the sigs-table
    * band probe — all anti-join the broadcast retired set), so a
    * retired document stops surfacing and stops generating dedup /
    * near-dup quarantines on the very next batch. The physical rewrite
    * is DEFERRED to the next scheduled [[compact]], which folds the
    * tombstone anti-join into the rewrite it was doing anyway — the
    * same tombstone-then-compact split the ANN index retire lifecycle
    * uses ([[graft.queries.SimilarityQueries.ivfIndexDelete]] /
    * `ivfIndexCompact`).
    *
    * The driver Bloom gate needs NO surgery: its contract is a pure
    * over-approximation of the standing fp set, so a stale
    * "maybe standing" for a retired fp falls through to the exact
    * standing probe — which serves around the tombstone and finds
    * nothing — and a retired document RE-INGESTED later lands correctly
    * with the gate still warm (IngestSpec pins exactly that round
    * trip, mid-stream).
    *
    * Re-ingest under the SAME doc_id un-retires it: the appender
    * appends retire=false ledger events for landed doc_ids that were
    * pending (otherwise the tombstone would hide the fresh copy too).
    * Until the next compact the corpus then physically holds two
    * identical rows for that fp — harmless to the semi-join probes,
    * collapsed by [[compact]]'s dedup pass. Contract: doc_id is a
    * stable content identity — re-using a retired doc_id for DIFFERENT
    * content is unsupported (assign new content a new id).
    *
    * Unlike the old full-rewrite design this is safe to run against a
    * LIVE appender: both writers only append to the tiny event ledger
    * (see [[retiredTable]]), so no interleaving can lose an update. */
  def retireDocs(spark: SparkSession, corpus: BucketedCorpus,
      ids: DataFrame): Unit = {
    requireNoLedgerSwap(spark, corpus)
    ids.select(col("doc_id")).distinct()
      .withColumn("ts", current_timestamp())
      .withColumn("retire", lit(true))
      .write.mode("append").saveAsTable(retiredTable(corpus))
  }

  /** Fail loudly when a ledger tmp-swap is in flight — an append now
    * could recreate the dropped table mid-RENAME and strand the
    * ledger's only copy in tmp (the same guard stance as the
    * appender's corpus/sigs tmp check). */
  private def requireNoLedgerSwap(spark: SparkSession, corpus: BucketedCorpus): Unit = {
    val tmp = s"${retiredTable(corpus)}_swap_tmp"
    if (spark.catalog.tableExists(tmp))
      throw new IllegalStateException(
        s"${retiredTable(corpus)}: ledger maintenance swap in progress " +
          s"($tmp exists) — retry after compact/compactLedger completes")
  }

  /** Swap the retire ledger's contents for `transform(current)` behind
    * the repo's lost-append fence: snapshot the table's files, write
    * the transformed rows to a tmp table, abort (ledger untouched) if
    * the listing changed — an append committed mid-rewrite — else
    * DROP+RENAME. Crash between DROP and RENAME recovers on the next
    * call (tmp holds the only copy; complete the rename first).
    * Returns false when aborted. */
  private def rewriteLedger(spark: SparkSession, corpus: BucketedCorpus)(
      transform: DataFrame => DataFrame): Boolean = {
    val t = retiredTable(corpus)
    val tmp = s"${t}_swap_tmp"
    if (!spark.catalog.tableExists(t) && spark.catalog.tableExists(tmp))
      spark.sql(s"ALTER TABLE $tmp RENAME TO $t")
    if (!spark.catalog.tableExists(t)) return true
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    spark.catalog.refreshTable(t)
    val filesBefore = spark.table(t).inputFiles.toSet
    transform(spark.table(t)).write.mode("overwrite").saveAsTable(tmp)
    spark.catalog.refreshTable(t)
    if (spark.table(t).inputFiles.toSet != filesBefore) {
      spark.sql(s"DROP TABLE IF EXISTS $tmp")
      false
    } else if (spark.table(tmp).isEmpty) {
      // every event consumed/resolved away: retire the ledger table
      // itself, restoring the no-ledger fast path (retiredIds = None)
      spark.sql(s"DROP TABLE $t")
      spark.sql(s"DROP TABLE $tmp")
      true
    } else {
      spark.sql(s"DROP TABLE $t")
      spark.sql(s"ALTER TABLE $tmp RENAME TO $t")
      true
    }
  }

  /** Ledger self-compaction — rewrite the append-only retire ledger to
    * ONE resolved latest-state row per doc_id (same latest-wins,
    * ties-prefer-retire rule as [[retiredIds]], so the pending set is
    * IDENTICAL across the rewrite; IngestSpec pins it). Bounds the
    * per-read aggregation and the per-batch pending broadcast under
    * sustained takedown traffic between corpus compactions, which is
    * the one regime where the ledger otherwise grows without bound —
    * `--mode retire` rides this past a row threshold. Returns false
    * when the fenced swap aborted on a concurrent append (ledger
    * untouched — safe, just unshrunk). */
  def compactLedger(spark: SparkSession, corpus: BucketedCorpus): Boolean =
    rewriteLedger(spark, corpus)(
      _.groupBy(col("doc_id"))
        .agg(max(struct(col("ts"), col("retire"))).as("last"))
        .select(col("doc_id"), col("last.ts").as("ts"),
          col("last.retire").as("retire")))

  /** A corpus exists when its directory already holds parquet data —
    * a bare/nonexistent dir is the first-batch bootstrap case, not an
    * error (same idempotent-init stance as `Sinks.DdlInitializer`). */
  private def corpusExists(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(path) && fs.listStatus(path).exists { s =>
      s.getPath.getName.endsWith(".parquet") || s.getPath.getName.startsWith("part-")
    }
  }

  /** Start both halves against a plain parquet-directory corpus: the
    * deduped corpus appender and the quarantine writer. Quarantine
    * layout: `malformed/` holds raw unparseable lines, `incomplete/`
    * holds parsed-but-null-keyed rows. Returns (corpus query,
    * quarantine query) — await both. */
  def start(
      spark: SparkSession,
      watchDir: String,
      schema: StructType,
      corpusDir: String,
      quarantineDir: String,
      checkpointDir: String,
      availableNow: Boolean = false,
      sourceOptions: Map[String, String] = Map.empty
  ): (StreamingQuery, StreamingQuery) =
    startWith(spark, watchDir, schema, quarantineDir, checkpointDir, availableNow,
      sourceOptions)(
      (df, _) => appendDeduped(df.sparkSession, df, corpusDir, s"$quarantineDir/incomplete"))

  /** [[start]] against the fp-bucketed corpus table with the Bloom
    * gate — the layout that holds at 100 TB (see object scaladoc). The
    * Bloom filter is seeded from the standing corpus HERE, once per
    * stream start, then maintained incrementally per batch.
    *
    * With a [[SemanticGate]], incoming documents are ALSO checked
    * against same-cluster standing documents by embedding cosine:
    * paraphrase-duplicates (fresh fp, near-identical meaning) land in
    * `quarantine/semdup` instead of the corpus, and the corpus table is
    * additionally partitioned by cluster so the per-batch check reads
    * only the touched clusters' partitions. */
  def startBucketed(
      spark: SparkSession,
      watchDir: String,
      schema: StructType,
      corpus: BucketedCorpus,
      quarantineDir: String,
      checkpointDir: String,
      availableNow: Boolean = false,
      semantic: Option[SemanticGate] = None,
      minhash: Option[MinHashGate] = None,
      sourceOptions: Map[String, String] = Map.empty
  ): (StreamingQuery, StreamingQuery) = {
    val gate = new BloomGate(corpus.bloomExpectedItems, corpus.bloomFpp)
    if (spark.catalog.tableExists(corpus.table))
      gate.seed(spark.table(corpus.table), "fp")
    val sigBloom = minhash.map { _ =>
      // 4 band-signature rows per doc, hence 4x the fp sizing
      val b = new BloomGate(4 * corpus.bloomExpectedItems, corpus.bloomFpp)
      if (spark.catalog.tableExists(sigsTable(corpus)))
        b.seed(spark.table(sigsTable(corpus)), "sig")
      b
    }
    startWith(spark, watchDir, schema, quarantineDir, checkpointDir, availableNow,
      sourceOptions)(
      (df, _) => appendDedupedBucketed(
        df.sparkSession, df, corpus, s"$quarantineDir/incomplete", gate,
        semantic, s"$quarantineDir/semdup",
        minhash, sigBloom, s"$quarantineDir/neardup"))
  }

  /** Shared wiring: JSONL split → (corpus foreachBatch, malformed
    * quarantine sink). */
  private def startWith(
      spark: SparkSession,
      watchDir: String,
      schema: StructType,
      quarantineDir: String,
      checkpointDir: String,
      availableNow: Boolean,
      sourceOptions: Map[String, String] = Map.empty
  )(perBatch: (DataFrame, Long) => Unit): (StreamingQuery, StreamingQuery) = {
    val (good, bad) = Ingest.streamJsonl(spark, watchDir, schema, sourceOptions)
    val goodQ = {
      val w = good.writeStream
        .option("checkpointLocation", s"$checkpointDir/corpus")
        .foreachBatch(perBatch)
      (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
    }
    val badQ = {
      val w = bad.writeStream
        .format("parquet")
        .option("path", s"$quarantineDir/malformed")
        .option("checkpointLocation", s"$checkpointDir/quarantine")
      (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
    }
    (goodQ, badQ)
  }
}
