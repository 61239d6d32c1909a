package graft.streaming

import graft.queries.LexQueries

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming DOCUMENT ingest into a persisted lexical (BM25 inverted)
  * index — [[VecIngest]]'s text twin, completing write-edge symmetry: a
  * crawl firehose of (doc_id, text) arrives as a stream, every
  * micro-batch tokenizes itself and lands its slot-routed posting rows
  * in the standing index, servable by a concurrent
  * `--mode serve --family lex` on its next serving micro-batch.
  *
  * Reference anchor: the reference is a *streaming* job end to end
  * (StreamingJob.java:119-123); this gives lexical retrieval the same
  * always-on WRITE edge the vector family has.
  *
  * Per micro-batch: tokenize + one (doc, term)-keyed aggregate — pure
  * batch-priced work, no standing read at all (ingest needs neither the
  * lexicon nor the stats; those are SERVING state). The frozen-lexicon
  * contract applies downstream exactly as for [[LexQueries.appendLexIndex]]:
  * ingested terms absent from the frozen lexicon stay unservable until
  * the next rebuild, and served idf/avgdl understate the grown corpus
  * between refreshes.
  *
  * EXACTLY-ONCE under foreachBatch redelivery via the shared
  * [[StagedCommit]] staged-promote protocol (stage → `_STAGED` fence →
  * idempotent per-file rename named by batch id + source file → commit
  * marker): a duplicated posting row would inflate that document's tf
  * at serve time — not a benign direction — so plain `mode("append")`
  * is not acceptable here either.
  *
  * Scale (100 TB): per-batch cost is the batch's tokenize + aggregate,
  * one slot-repartitioned staged write, and O(touched slots) renames.
  * Nothing reads the standing postings or the corpus; ingest cost
  * tracks the FIREHOSE, never the index. */
object LexIngest {

  /** Start ingesting `docs` (a STREAMING frame with columns `doc_id`,
    * `text`) into the persisted lexical index at `indexPath`.
    *
    * `refreshEveryDocs` > 0 turns on the AUTO-REFRESH cadence: the edge
    * counts ingested documents and runs [[LexQueries.refreshLexicon]]
    * once the count passes the threshold — BETWEEN batch commits
    * (inside foreachBatch, after the staged commit; fenced against
    * maintenance like every refresh), bounding idf staleness and
    * keeping MaxScore-pruned serving available under continuous ingest
    * instead of parking the index on `_bounds_stale` forever. The
    * counter is conservative across restarts: stale bounds at stream
    * start count as a full threshold already pending, so the first
    * committed batch triggers a catch-up refresh (over-refreshing is
    * the safe direction — a refresh is an idempotent exact recompute,
    * and its cost amortizes as one postings scan per `refreshEveryDocs`
    * ingested documents). 0 (the default) preserves the manual
    * refresh-on-demand contract. */
  def start(
      spark: SparkSession,
      docs: DataFrame,
      indexPath: String,
      checkpointDir: String,
      availableNow: Boolean = false,
      refreshEveryDocs: Long = 0L
  ): StreamingQuery = {
    val pending = new java.util.concurrent.atomic.AtomicLong(
      if (refreshEveryDocs > 0L && LexQueries.boundsStale(spark, indexPath))
        refreshEveryDocs
      else 0L)
    val w = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (refreshEveryDocs <= 0L) ingestBatch(batch.sparkSession, batch, indexPath, id)
        else {
          // the batch is consumed twice (posting write + doc count):
          // pin it so the source isn't re-read per consumer
          val b = batch.persist()
          try {
            ingestBatch(b.sparkSession, b, indexPath, id)
            val n = b.select(col("doc_id")).distinct().count()
            if (pending.addAndGet(n) >= refreshEveryDocs) {
              LexQueries.refreshLexicon(b.sparkSession, indexPath)
              pending.set(0L)
            }
          } finally { b.unpersist(); () }
        }
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** One micro-batch's staged-promote commit — idempotent per
    * (indexPath, batchId); exposed for the replay/crash-window specs. */
  private[graft] def ingestBatch(spark: SparkSession, batch: DataFrame,
      indexPath: String, batchId: Long): Unit =
    // growth can outrun the frozen MaxScore bounds — the marker is set
    // through the beforePromote seam: on EVERY attempt that reaches the
    // promote (including a crash-window replay after an intervening
    // refresh), before anything lands in the standing index, and never
    // on a replay of an already-committed batch (which returns at the
    // commit-marker check and so cannot undo a refresh that ran since)
    StagedCommit.run(spark, indexPath, batchId, "LexIngest.ingestBatch",
        trees = Seq("postings", "attrs"),
        beforePromote = () => LexQueries.markBoundsStale(spark, indexPath)) {
      staging =>
      // repartition ON THE SLOT before the staged write — the same
      // one-file-per-touched-partition discipline as VecIngest: a
      // long-running ingest adds O(touched slots) standing files per
      // batch, not O(parallelism × slots)
      LexQueries.postingRows(batch)
        .repartition(col("slot"))
        .write.partitionBy("slot").mode("overwrite")
        .parquet(new Path(staging, "postings").toString)
      // facet sidecar rides the same exactly-once commit: one thin row
      // per doc into its (lang, source) leaf directory (streams without
      // lang/source columns land honestly in `und`/`unk`, never
      // silently facet-less)
      LexQueries.attrsRows(batch)
        .repartition(col("lang"), col("source"))
        .write.partitionBy(LexQueries.AttrsPartCols: _*).mode("overwrite")
        .parquet(new Path(staging, "attrs").toString)
    }
}
