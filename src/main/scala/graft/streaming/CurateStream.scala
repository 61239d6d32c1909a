package graft.streaming

import graft.queries.CurationQueries
import graft.sources.Ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The CURATION pipeline's always-on twin — `--mode curate` driven per
  * micro-batch, with the same per-stage audit manifest the batch run
  * writes, appended as one row-set per batch to a STANDING manifest
  * table. The reference is a streaming job end to end
  * (StreamingJob.java:119-185 — consume, transform, emit, audit); this
  * closes the one surface that was batch-only.
  *
  * Stage semantics are the batch pipeline's OWN functions, not
  * re-implementations: every micro-batch runs
  * [[CurationQueries.curationFlagsOf]] (quality gate → exact-fp keeper
  * → near-dup keep-best → mixture sampling → packing) over the batch,
  * so a fixture dropped as ONE batch produces exactly the batch
  * `curation_manifest` (IngestSpec pins the summed streaming manifest
  * against it, hash-for-hash). Across batches the stages split into
  * their natural scopes:
  *
  *   - quality: per-document, scope-free — identical in any batching;
  *   - exact dedup: batch keeper election PLUS the standing-fp
  *     serve-around (fps curated by earlier batches disqualify later
  *     arrivals — state is the tiny fp column of the standing curated
  *     output, not stream memory);
  *   - near-dup keep-best: batch-scoped by design (the LSH→components
  *     election runs within the batch; CROSS-batch near-dup policing is
  *     [[CorpusIngest.MinHashGate]]'s job on the ingest path — a
  *     curation stream composes downstream of a gated corpus);
  *   - mixture + packing: epoch-level stages — rates and prefix sums
  *     are computed over each batch (the epoch the batch represents);
  *     shard/bin coordinates are per-batch pack units, which is how an
  *     incremental trainer consumes them.
  *
  * Takedown policy for CURATED output: curated shards are derived,
  * epoch-scoped artifacts — a takedown reaches them by retiring the
  * doc at the SOURCE corpus ([[CorpusIngest.retireDocs]], immediate
  * serve-around there) and regenerating the affected epoch's shards
  * (`--mode curate` over the post-retire corpus), the same
  * derived-data story as the ANN index compaction. The standing
  * curated table here is dedup STATE first (its fp column), training
  * input second.
  *
  * Output layout: `outDir/curated/batch_id=N` (survivor rows) and
  * `outDir/manifest/batch_id=N` (5 stage rows), one partition
  * directory per micro-batch, each written with OVERWRITE — the
  * foreachBatch idempotence recipe: a batch redelivered after a crash
  * (between the writes and the checkpoint commit) REPLACES its own
  * partitions instead of appending a second row-set. The standing-fp
  * probe excludes the current batch's own partition, so the replay
  * recomputes against exactly the standing view the first attempt saw
  * and rewrites byte-equal content — exactly-once effect with no
  * consumer-side dedup caveat (IngestSpec pins the double-delivery).
  * `batch_id` is a partition column (reads back INT by directory-name
  * inference; [[readManifest]]/[[readCurated]] pin it LONG).
  *
  * Scale (100 TB): per-batch work is batch-priced (the LSH chain, the
  * windows, the rate fold all scope to the batch); the only standing
  * read is the curated table's fp COLUMN, Bloom-prunable the same way
  * [[CorpusIngest.startBucketed]]'s probe is if batches are large —
  * kept as the plain column read here because curation batches are
  * admission-controlled like every other foreachBatch edge.
  */
object CurateStream {

  /** One micro-batch through the full stage cascade; exposed for direct
    * batch testing. Returns the manifest row-set it appended.
    *
    * Standing-fp probe shape (the 100 TB point, same discipline as
    * [[CorpusIngest.standingDups]]): the BATCH's fingerprints broadcast
    * and the standing curated fp column streams past them as a
    * semi-join — one standing column scan, zero shuffle of the standing
    * side, and the frame handed to the cascade is batch-bounded (≤ one
    * hit per batch fp), so ITS broadcast inside `curationFlagsOf` is
    * safe at any corpus size. Broadcasting the standing fp set directly
    * would grow with the corpus, not the batch. With a [[CorpusIngest
    * .BloomGate]] (`start` wires one), an all-fresh batch — the common
    * case of a long-running stream — skips even that one standing scan:
    * the gate's over-approximation contract means "no batch fp might be
    * standing" is always safe to act on. */
  private[graft] def curateBatch(
      spark: SparkSession, batch: DataFrame, batchId: Long,
      outDir: String, gate: Option[CorpusIngest.BloomGate] = None,
      maxBatchKeys: Int = 1 << 20): DataFrame = {
    import spark.implicits._
    val curatedPath = s"$outDir/curated"
    val curatedExists = {
      val p = new org.apache.hadoop.fs.Path(curatedPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(p) && fs.listStatus(p).nonEmpty
    }
    // batch fps collected once (admission-bounded, like every driver
    // collect on the ingest path): they screen the standing probe AND
    // extend the Bloom gate after the append
    val batchFps: Seq[String] =
      if (gate.isDefined || curatedExists)
        CorpusIngest.collectBounded(
          batch.select(graft.functions.TextFunctions
              .contentFingerprint(col("text")).as("fp"))
            .where(col("fp").isNotNull).distinct(),
          maxBatchKeys, "curate batch fps").map(_.getString(0))
      else Nil
    val standingFps: Option[DataFrame] =
      if (!curatedExists) None
      else {
        val maybe = gate match {
          case Some(g) => batchFps.filter(g.mightContain)
          case None => batchFps
        }
        if (maybe.isEmpty) None
        else Some(spark.read.parquet(curatedPath)
          // replay isolation: a redelivered batch must see exactly the
          // standing view its first attempt saw, so its OWN partition
          // (possibly written by that first attempt) never serves
          // around itself — the partition filter prunes the directory,
          // it never scans it
          .filter(col("batch_id").cast("long") =!= lit(batchId))
          .select(col("fp"))
          .join(broadcast(maybe.toDF("fp")), Seq("fp"), "left_semi").distinct())
      }
    val flags = CurationQueries.curationFlagsOf(
      batch, CurationQueries.dedupClustersOf(batch), standingFps).persist()
    try {
      // survivors carry their fp so future batches' standing serve-around
      // reads one narrow column of this very table; OVERWRITE of the
      // batch's own partition directory = idempotent under redelivery
      CurationQueries.curatedFrom(flags)
        .join(flags.select(col("doc_id"), col("fp")), "doc_id")
        .write.mode("overwrite").parquet(s"$curatedPath/batch_id=$batchId")
      // extend the gate with the WHOLE batch's fps — a safe
      // over-approximation of what landed (the Bloom contract: a stale
      // "maybe" just falls through to the exact probe)
      gate.foreach(_.add(batchFps))
      val m = CurationQueries.manifestFrom(flags)
      m.write.mode("overwrite").parquet(s"$outDir/manifest/batch_id=$batchId")
      m.withColumn("batch_id", lit(batchId))
    } finally flags.unpersist()
  }

  /** The standing manifest (all batches) with `batch_id` pinned LONG —
    * the partition column reads back INT by directory-name inference. */
  def readManifest(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/manifest")
      .withColumn("batch_id", col("batch_id").cast("long"))

  /** The standing curated corpus (all batches) with `batch_id` pinned
    * LONG. */
  def readCurated(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(s"$outDir/curated")
      .withColumn("batch_id", col("batch_id").cast("long"))

  /** Start the streaming curation run: JSONL shards landing in
    * `watchDir` flow through the 5-stage cascade per micro-batch;
    * malformed lines quarantine. Returns (curate query, quarantine
    * query) — await both. */
  def start(
      spark: SparkSession,
      watchDir: String,
      schema: StructType,
      outDir: String,
      checkpointDir: String,
      availableNow: Boolean = false,
      sourceOptions: Map[String, String] = Map.empty,
      bloomExpectedItems: Long = 4L * 1024 * 1024,
      bloomFpp: Double = 0.01
  ): (StreamingQuery, StreamingQuery) = {
    // driver Bloom over the standing curated fps — seeded once per
    // stream start, extended per batch; all-fresh batches then skip the
    // standing probe entirely (CorpusIngest.startBucketed's fast path)
    val gate = new CorpusIngest.BloomGate(bloomExpectedItems, bloomFpp)
    locally {
      val p = new org.apache.hadoop.fs.Path(s"$outDir/curated")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p) && fs.listStatus(p).nonEmpty)
        gate.seed(spark.read.parquet(p.toString), "fp")
    }
    val (good, bad) = Ingest.streamJsonl(spark, watchDir, schema, sourceOptions)
    val goodQ = {
      val w = good.writeStream
        .option("checkpointLocation", s"$checkpointDir/curate")
        .foreachBatch { (df: DataFrame, id: Long) =>
          curateBatch(df.sparkSession, df, id, outDir, Some(gate)); ()
        }
      (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
    }
    val badQ = {
      val w = bad.writeStream
        .format("parquet")
        .option("path", s"$outDir/malformed")
        .option("checkpointLocation", s"$checkpointDir/quarantine")
      (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
    }
    (goodQ, badQ)
  }
}
