package graft.streaming

import graft.queries.SimilarityQueries

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** The staged-promote EXACTLY-ONCE batch commit shared by the streaming
  * index WRITE edges ([[VecIngest]], [[LexIngest]]) — the protocol that
  * makes a foreachBatch redelivery replay to a no-op or a completion,
  * which plain `mode("append")` cannot give (a replayed batch would
  * duplicate posting rows; a duplicated posting occupies two result
  * slots at serve time — not a benign direction).
  *
  * Idempotent per (indexPath, batchId):
  *
  *   1. a batch whose commit marker (`_ingest_commits/<id>`) exists
  *      returns immediately;
  *   2. `stage` writes the batch under `_staging/<id>/` — called only
  *      when the `_STAGED` fence is absent; a partial stage (crash
  *      mid-write) is deleted and rewritten from scratch, nothing
  *      standing was touched;
  *   3. every subtree named in `trees` promotes file-by-file into the
  *      standing directory of the same name under the deterministic
  *      target `ingest-<id>-<srcName>` — after `_STAGED`, staging file
  *      names are frozen, so an existing target IS this exact file from
  *      an earlier attempt and is skipped;
  *   4. the marker commits the batch, then the staging tree clears
  *      (best-effort — a leftover tree under an existing marker is dead
  *      weight, never replayed).
  *
  * A compaction in flight (`_maintenance` marker) fails the batch
  * loudly BEFORE staging — promoting into a bucket directory mid-rewrite
  * would be silently deleted; the stream retries the batch after the
  * compact and the protocol makes the retry exact. */
private[streaming] object StagedCommit {

  def run(spark: SparkSession, indexPath: String, batchId: Long,
      guardOp: String, trees: Seq[String],
      beforePromote: () => Unit = () => ())(stage: Path => Unit): Unit = {
    val fs = new Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(s"$indexPath/_ingest_commits/$batchId")
    if (fs.exists(marker)) return // fully committed; a replay is a no-op
    SimilarityQueries.assertNoMaintenance(fs, indexPath, guardOp)

    val staging = new Path(s"$indexPath/_staging/$batchId")
    val staged = new Path(staging, "_STAGED")
    if (!fs.exists(staged)) {
      if (fs.exists(staging)) { fs.delete(staging, true); () }
      stage(staging)
      fs.create(staged, true).close()
    }

    // runs on EVERY attempt that reaches the promote (not just the one
    // that staged) — the seam for markers that must precede any standing
    // change even on a crash-window replay (e.g. the lex bounds-stale
    // marker, which a refresh between crash and replay would have
    // cleared while the staged postings were still unpromoted)
    beforePromote()

    trees.foreach { t =>
      promoteTree(fs, new Path(staging, t), new Path(s"$indexPath/$t"), batchId)
    }

    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
    fs.delete(staging, true)
    ()
  }

  /** Move every data file under `src` (flat, or one `key=X/` partition
    * level) to the same relative location under `dst` as
    * `ingest-<batchId>-<srcFileName>`. Existing targets are skipped —
    * under the `_STAGED` fence a name collision can only be this exact
    * file, already promoted by an earlier attempt. */
  private def promoteTree(fs: FileSystem, src: Path, dst: Path,
      batchId: Long): Unit = {
    if (!fs.exists(src)) return
    fs.listStatus(src).foreach { entry =>
      val name = entry.getPath.getName
      if (entry.isDirectory && name.contains("=")) {
        promoteTree(fs, entry.getPath, new Path(dst, name), batchId)
      } else if (entry.isFile && name.endsWith(".parquet")) {
        val target = new Path(dst, s"ingest-$batchId-$name")
        fs.mkdirs(dst)
        if (!fs.exists(target)) {
          // HadoopFileSystem#rename signals some failures by returning
          // false rather than throwing; a dropped file here would still
          // commit the batch marker — permanent silent loss. Fail the
          // batch instead; the foreachBatch retry replays it exactly.
          require(fs.rename(entry.getPath, target),
            s"staged-commit promote failed: rename ${entry.getPath} -> $target")
        } else { fs.delete(entry.getPath, false); () }
      }
    }
  }
}
