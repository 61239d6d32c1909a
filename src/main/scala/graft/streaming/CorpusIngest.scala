package graft.streaming

import graft.functions.TextFunctions.contentFingerprint
import graft.sources.Ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Continuous deduped corpus ingestion — the end-to-end composition a
  * training-data pipeline actually runs: watch a directory for landed
  * JSONL shards, quarantine malformed lines, drop documents whose
  * normalized-text fingerprint already exists in the STANDING corpus,
  * append the survivors. `Ingest.streamJsonl` (exactly-once file
  * pickup via the source's checkpointed log) + the `incremental_dedup`
  * anti-join pattern + an append-only parquet corpus.
  *
  * Dedup state is the corpus ITSELF, not stream memory: each
  * micro-batch anti-joins its fingerprints against the standing
  * corpus's fingerprint column, so restarts are free, the dedup
  * horizon is the whole corpus (not a watermark window), and nothing
  * unbounded lives in the state store. At 100 TB the standing side is
  * a 40-byte (fp, doc_id) projection of the corpus — keep the corpus
  * bucketed by `fp` (`Layout.writeBucketed`) and the per-batch
  * anti-join co-locates instead of reshuffling the standing set; a
  * bloom filter on fp in front of the join cuts it further. Batches
  * also dedup WITHIN themselves first (min-doc_id keeper per fp, the
  * `dedup_exact` rule), so two copies landing in one shard can't both
  * append.
  */
object CorpusIngest {

  /** One micro-batch: structural completeness gate, batch-local keeper
    * election, the standing anti-join, then append. Exposed for direct
    * batch testing.
    *
    * A line can be valid JSON yet structurally incomplete — doc_id or
    * text absent → null after the schema-pinned parse. Such rows can
    * neither be deduped (a null fp collapses unrelated docs inside a
    * batch AND never matches the standing anti-join across batches)
    * nor elected (null === null keeper comparisons filter to nothing,
    * silently dropping the row), so they are QUARANTINED to
    * `incompleteDir`, preserving the every-line-lands-somewhere
    * contract. The fp key is [[contentFingerprint]] — the same rule as
    * the batch `incremental_dedup`/`dedup_exact` queries, so streaming
    * and batch agree on what counts as a duplicate. */
  private[streaming] def appendDeduped(
      spark: SparkSession, batch: DataFrame,
      corpusDir: String, incompleteDir: String): Unit = {
    val complete = col("doc_id").isNotNull && col("text").isNotNull
    val incomplete = batch.filter(!complete)
    if (!incomplete.isEmpty)
      incomplete.write.mode("append").parquet(incompleteDir)
    val byFp = Window.partitionBy(col("fp"))
    val local = batch.filter(complete)
      .withColumn("fp", contentFingerprint(col("text")))
      .withColumn("keeper", min(col("doc_id")).over(byFp))
      .filter(col("doc_id") === col("keeper"))
      .drop("keeper")
    val fresh =
      if (corpusExists(spark, corpusDir)) {
        val standing = spark.read.parquet(corpusDir).select(col("fp")).distinct()
        local.join(standing, Seq("fp"), "left_anti")
      } else local
    fresh.write.mode("append").parquet(corpusDir)
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

  /** Start both halves: the deduped corpus appender and the quarantine
    * writer. Quarantine layout: `malformed/` holds raw unparseable
    * lines, `incomplete/` holds parsed-but-null-keyed rows. Returns
    * (corpus query, quarantine query) — await both. */
  def start(
      spark: SparkSession,
      watchDir: String,
      schema: StructType,
      corpusDir: String,
      quarantineDir: String,
      checkpointDir: String,
      availableNow: Boolean = false
  ): (StreamingQuery, StreamingQuery) = {
    val (good, bad) = Ingest.streamJsonl(spark, watchDir, schema)
    val goodQ = {
      val w = good.writeStream
        .option("checkpointLocation", s"$checkpointDir/corpus")
        .foreachBatch((df: DataFrame, _: Long) =>
          appendDeduped(df.sparkSession, df, corpusDir, s"$quarantineDir/incomplete"))
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
