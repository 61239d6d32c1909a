package graft.streaming

import graft.functions.TextFunctions.contentFingerprint
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
  *   - [[start]]: plain parquet directory. Simple, fine while the
  *     standing fp scan is cheap; the per-batch anti-join shuffles the
  *     standing side every batch.
  *   - [[startBucketed]]: the 100 TB form. The corpus is a table
  *     BUCKETED BY fp ([[graft.sources.Layout.writeBucketed]]'s
  *     layout), so the standing side of the per-batch anti-join reads
  *     already-hash-partitioned on the join key — NO Exchange on the
  *     standing set, ever; only the (small) incoming batch shuffles, to
  *     the bucket count (LayoutSpec/IngestSpec pin this on the physical
  *     plan). In front of the join sits a driver-held Bloom filter over
  *     every standing fp: a batch whose fps all miss the filter is
  *     provably all-fresh and appends WITHOUT touching the standing
  *     corpus at all — the common case in continuous ingestion, where
  *     the recurring cost would otherwise grow with the corpus forever.
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
      bloomFpp: Double = 0.01)

  /** Driver-held over-approximation of the standing corpus's fp set.
    * Purely an optimization gate (see the object scaladoc's contract);
    * rebuilt from the corpus on every stream start. */
  private[streaming] final class BloomGate(expected: Long, fpp: Double) {
    private val bloom: BloomFilter = BloomFilter.create(expected, fpp)
    /** One distributed scan of the standing fps; merged in because
      * `stat.bloomFilter` with identical (expected, fpp) yields a
      * bit-compatible filter. */
    def seed(standingFps: DataFrame, colName: String): Unit =
      bloom.mergeInPlace(standingFps.stat.bloomFilter(colName, expected, fpp))
    def anyMightContain(fps: Iterable[String]): Boolean =
      fps.exists(bloom.mightContain)
    def add(fps: Iterable[String]): Unit = fps.foreach(bloom.put)
  }

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
  private[streaming] def electKeepers(completeRows: DataFrame): DataFrame = {
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

  /** One micro-batch against the BUCKETED corpus table, Bloom-gated:
    *
    *   1. quarantine incomplete rows; elect batch-local keepers
    *   2. collect the batch's fps to the driver (bounded by micro-batch
    *      size — these are 32-hex strings, one per surviving row)
    *   3. if NO fp might be standing (Bloom), append directly — zero
    *      standing-corpus I/O for an all-fresh batch
    *   4. else exact anti-join; the standing side reads bucketed on fp,
    *      so only the batch side shuffles
    *   5. extend the Bloom with what actually landed
    */
  private[streaming] def appendDedupedBucketed(
      spark: SparkSession, batch: DataFrame,
      corpus: BucketedCorpus, incompleteDir: String, gate: BloomGate): Unit = {
    batch.persist()
    try {
      batch.filter(!complete).write.mode("append").parquet(incompleteDir)
      val local = electKeepers(batch.filter(complete)).persist()
      try {
        val fps = local.select(col("fp")).collect().map(_.getString(0)).toSeq
        def appendToTable(df: DataFrame): Unit =
          df.write
            .bucketBy(corpus.buckets, "fp")
            .sortBy("fp")
            .mode("append")
            .saveAsTable(corpus.table)
        if (!spark.catalog.tableExists(corpus.table) || !gate.anyMightContain(fps)) {
          appendToTable(local)
          gate.add(fps)
        } else {
          val fresh = freshAgainst(local, spark.table(corpus.table)).persist()
          try {
            appendToTable(fresh)
            gate.add(fresh.select(col("fp")).collect().map(_.getString(0)).toSeq)
          } finally fresh.unpersist()
        }
      } finally local.unpersist()
    } finally batch.unpersist()
  }

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
      availableNow: Boolean = false
  ): (StreamingQuery, StreamingQuery) =
    startWith(spark, watchDir, schema, quarantineDir, checkpointDir, availableNow)(
      (df, _) => appendDeduped(df.sparkSession, df, corpusDir, s"$quarantineDir/incomplete"))

  /** [[start]] against the fp-bucketed corpus table with the Bloom
    * gate — the layout that holds at 100 TB (see object scaladoc). The
    * Bloom filter is seeded from the standing corpus HERE, once per
    * stream start, then maintained incrementally per batch. */
  def startBucketed(
      spark: SparkSession,
      watchDir: String,
      schema: StructType,
      corpus: BucketedCorpus,
      quarantineDir: String,
      checkpointDir: String,
      availableNow: Boolean = false
  ): (StreamingQuery, StreamingQuery) = {
    val gate = new BloomGate(corpus.bloomExpectedItems, corpus.bloomFpp)
    if (spark.catalog.tableExists(corpus.table))
      gate.seed(spark.table(corpus.table), "fp")
    startWith(spark, watchDir, schema, quarantineDir, checkpointDir, availableNow)(
      (df, _) => appendDedupedBucketed(
        df.sparkSession, df, corpus, s"$quarantineDir/incomplete", gate))
  }

  /** Shared wiring: JSONL split → (corpus foreachBatch, malformed
    * quarantine sink). */
  private def startWith(
      spark: SparkSession,
      watchDir: String,
      schema: StructType,
      quarantineDir: String,
      checkpointDir: String,
      availableNow: Boolean
  )(perBatch: (DataFrame, Long) => Unit): (StreamingQuery, StreamingQuery) = {
    val (good, bad) = Ingest.streamJsonl(spark, watchDir, schema)
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
