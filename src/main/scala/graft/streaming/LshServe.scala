package graft.streaming

import graft.queries.SimilarityQueries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming NEAR-DUP serving over a PERSISTED MinHash-LSH index —
  * [[AnnServe]]'s text-side twin, completing the serve-many symmetry:
  * document batches arrive as a stream and every micro-batch is
  * answered with its near-dup candidates against the STANDING corpus,
  * reading zero document text on the standing side (both the index's
  * band signatures and the batch's freshly-computed ones are compact
  * (band, sig) keys).
  *
  * Reference anchor: the reference is a *streaming* job end to end
  * (StreamingJob.java:119-123); this gives the dedup family the same
  * always-on query edge the ANN family has.
  *
  * Plan per micro-batch:
  *   - the batch's documents sign themselves (shingle → 12 minhashes →
  *     4×3 band signatures — the SAME construction as the batch
  *     pipeline and the ingest gate, so all three agree on what a
  *     signature is), batch-priced work;
  *   - the persisted posting table equijoins the BROADCAST batch
  *     signatures on (band, sig) — partition-pruned to the batch's
  *     bands, never a shuffle of the standing side;
  *   - candidate pairs (query doc, standing doc) come back distinct,
  *     through `sink(df, batchId)`.
  *
  * `tombstoneAware` re-reads the index's tombstone set per batch
  * (broadcast anti-join before pair generation), so a takedown
  * (`lshIndexDelete`) stops surfacing as a match on the NEXT
  * micro-batch with no restart — the dedup side of the online retire
  * contract, exactly [[AnnServe]]'s.
  *
  * Scale (100 TB): per-batch work is O(batch signing) + O(colliding
  * posting rows); the index is never scanned whole (band partition
  * pruning + the band-signature equijoin), state is zero, restart
  * safety is checkpoint + an idempotent sink. Within-batch pairs are
  * NOT emitted — two new docs duplicating each other is the ingest
  * gate's job ([[CorpusIngest.MinHashGate]]); this edge answers "does
  * this batch collide with the STANDING corpus".
  */
object LshServe {

  /** Candidates for ONE batch of (doc_id, text) rows against the
    * persisted index — exposed for direct batch testing and parity.
    * Output: (query_id, standing_id), distinct.
    *
    * `facetLang`/`facetSource` scope the STANDING side to one facet
    * ([[LexServe.serveBatch]]'s contract, near-dup flavored): the
    * allowlist is a partition-pruned read of the `attrs/` sidecar —
    * both axes are partition levels, so a lang facet prunes at level 1,
    * a source facet at level 2 — re-read PER BATCH like tombstones, so
    * facet rows landed by a concurrent append scope the very next
    * micro-batch. Per-document signatures carry no corpus statistic, so
    * the faceted candidate set IS the unfaceted set restricted to
    * facet-member standing docs — screening before the equijoin is
    * pure savings, never a semantics change. */
  private[graft] def candidatesFor(
      spark: SparkSession, batch: DataFrame, indexPath: String,
      tombstoneAware: Boolean, shareResults: Boolean = true,
      facetLang: Option[String] = None,
      facetSource: Option[String] = None): DataFrame = {
    if (shareResults) {
      // RESULT SHARING: candidates depend only on the document TEXT, so
      // a head-skewed batch (boilerplate re-crawls are exactly this)
      // shingles + minhashes each distinct text ONCE and fans the
      // per-text candidate sets back by a broadcast join — the
      // LexQueries.queryBatch signature trick, text-keyed. Worst case
      // (all-distinct) adds one batch-sized groupBy + one broadcast
      // join, noise against the 12-hash signature pass it saves.
      val reps = batch.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"), col("text"))
      val repCand = candidatesFor(spark, reps, indexPath, tombstoneAware,
        shareResults = false, facetLang = facetLang,
        facetSource = facetSource)
        .withColumnRenamed("query_id", "rep_qid")
      val mapping = batch.select(col("doc_id").as("out_qid"), col("text"))
        .join(reps.select(col("doc_id").as("rep_id"), col("text")), "text")
        .select(col("out_qid"), col("rep_id"))
      return mapping.join(broadcast(repCand), col("rep_id") === col("rep_qid"))
        .select(col("out_qid").as("query_id"), col("standing_id"))
        .distinct()
    }
    val sigs = SimilarityQueries.bandSigs(SimilarityQueries.minhashSigsOf(
        batch.select(col("doc_id"), col("text"))))
      .select(col("doc_id").as("query_id"), col("band").as("q_band"),
        col("sig").as("q_sig"))
    val postings0 = spark.read.parquet(s"$indexPath/postings")
      .select(col("doc_id").as("standing_id"), col("band"), col("sig"))
    val postings =
      if (!tombstoneAware) postings0
      else {
        val tombPath = new org.apache.hadoop.fs.Path(s"$indexPath/tombstones")
        val fs = tombPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(tombPath)) postings0
        else postings0.join(
          broadcast(spark.read.parquet(tombPath.toString)
            .select(col("doc_id").as("tomb_id")).distinct()),
          postings0("standing_id") === col("tomb_id"), "left_anti")
      }
    val facetPreds =
      facetLang.map(l => col("lang") === l).toSeq ++
        facetSource.map(s => col("source") === s).toSeq
    val faceted =
      if (facetPreds.isEmpty) postings
      else postings.join(
        spark.read.parquet(s"$indexPath/attrs")
          .filter(facetPreds.reduce(_ && _))
          .select(col("doc_id").as("_facet_doc")),
        postings("standing_id") === col("_facet_doc"), "left_semi")
    faceted
      .join(broadcast(sigs),
        col("band") === col("q_band") && col("sig") === col("q_sig"))
      .select(col("query_id"), col("standing_id"))
      .distinct()
  }

  /** Start serving `docs` (a STREAMING frame with columns `doc_id`,
    * `text`) against the persisted LSH index at `indexPath`; each
    * micro-batch's candidate frame goes to `sink` with its batch id. */
  def start(
      spark: SparkSession,
      docs: DataFrame,
      indexPath: String,
      sink: (DataFrame, Long) => Unit,
      checkpointDir: String,
      availableNow: Boolean = false,
      tombstoneAware: Boolean = false,
      facetLang: Option[String] = None,
      facetSource: Option[String] = None
  ): StreamingQuery = {
    // facet serving needs the attrs sidecar — refuse ONCE at stream
    // start with an actionable message for a standing index built
    // before it existed (pre-lsh-v2), instead of failing every
    // micro-batch with a raw path error from the per-batch read
    if (facetLang.isDefined || facetSource.isDefined) {
      val attrs = new org.apache.hadoop.fs.Path(s"$indexPath/attrs")
      require(attrs.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .exists(attrs),
        s"LshServe --facetLang/--facetSource: no attrs/ sidecar under $indexPath - the " +
          "index predates faceted serving; rebuild it (or append once, " +
          "which materializes facet rows for the delta) before serving " +
          "with a facet")
    }
    val w = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(candidatesFor(batch.sparkSession, batch, indexPath,
          tombstoneAware, facetLang = facetLang,
          facetSource = facetSource), id)
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }
}
