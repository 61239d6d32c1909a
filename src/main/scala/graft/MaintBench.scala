package graft

import graft.queries.SimilarityQueries
import graft.sources.Tables
import graft.streaming.CorpusIngest
import graft.streaming.CorpusIngest.BucketedCorpus

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Maintenance-lifecycle bench: prices the retire surface — corpus
  * takedown (tombstone + serve-around + deferred compact) and the
  * IVF / LSH index delete/compact ops — at TWO fixture scales with a
  * FIXED-SIZE takedown batch, so the printed sf0.1/sf0.01 ratio
  * measures how each op's cost scales with the CORPUS while the input
  * batch stays constant:
  *
  *   - `retire` (corpus tombstone append) and `ivf_delete` (sidecar
  *     resolution) claim O(batch): their ratio should sit near 1;
  *   - `active_read` (serve-around count) and `ivf_compact`
  *     (touched-bucket rewrite) claim O(corpus-scan) / O(touched):
  *     the read ratio tracks the scan, the compact ratio the touched
  *     buckets (constant batch → bounded touched set);
  *   - `corpus_compact` and `lsh_compact` are full rewrites BY DESIGN
  *     (amortized across takedown batches) — their ratio tracks corpus
  *     size, and printing it keeps that cost model measured, not
  *     asserted.
  *
  * Each op is min-of-2 over full rebuild→delete→compact cycles (the
  * bench-load discipline BASELINE.md documents — state-mutating ops
  * can't re-run in place, so the cycle rebuilds between iterations).
  *
  *   java -cp ... graft.MaintBench [sfDirA sfDirB]
  *
  * Prints one JSON line; BASELINE.md records the table.
  */
object MaintBench {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.length >= 2) Seq(args(0), args(1))
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val parts = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$parts]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("mb-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // a FIXED takedown batch (25 ids, present at every fixture scale):
    // the maintenance ops' input is constant, only the corpus scales
    val takedown = (0 until 25).map(i => 10L * i + 7L)
    def ids(colName: String) = takedown.toDF(colName)

    /** One full lifecycle at `dir`; returns op -> seconds. */
    def cycle(dir: String, tag: String): Map[String, Double] = {
      val q = SimilarityQueries
      // IVF index: delete resolves against the sidecar, compact
      // rewrites only the (≤ batch-sized) touched bucket set
      val idx = java.nio.file.Files.createTempDirectory("mb-ivf").toString
      q.buildIvfIndex(spark, dir, idx)
      val ivfDelete = timed(q.ivfIndexDelete(spark, idx, ids("vec_id")))
      val ivfCompact = timed(q.ivfIndexCompact(spark, idx))
      // shard merge: a FIXED-SIZE shard index (built untimed from the
      // smaller fixture's embeddings, ids offset into a fresh range so
      // both scales absorb the same disjoint 125 vectors) merged into
      // the dir-scale index AFTER its delete/compact timings — claims
      // O(src postings + touched buckets), so ratio ≈ 1
      val shard = java.nio.file.Files.createTempDirectory("mb-shard").toString
      q.buildIvfIndexSlice(spark,
        Tables.embeddings(spark, dirs.head)
          .filter(col("vec_id") % 4 === 2)
          .withColumn("vec_id", col("vec_id") + 1000000L), shard)
      val ivfMerge = timed(q.ivfIndexMergeInto(spark, idx, shard))
      // LSH index: delete is a bare tombstone append; compact is a full
      // posting rewrite by construction (every doc signs every band)
      val lsh = java.nio.file.Files.createTempDirectory("mb-lsh").toString
      q.buildLshIndex(spark, dir, lsh)
      val lshDelete = timed(q.lshIndexDelete(spark, lsh, ids("doc_id")))
      val lshCompact = timed(q.lshIndexCompact(spark, lsh))
      // LSH shard merge: same fixed-shard discipline (per-document
      // signatures ⇒ a pure posting union; O(src) append, ratio ≈ 1)
      val lshShard = java.nio.file.Files.createTempDirectory("mb-lshard").toString
      q.buildLshIndexSlice(
        Tables.documents(spark, dirs.head)
          .filter(col("doc_id") % 4 === 2)
          .withColumn("doc_id", col("doc_id") + 1000000L), lshShard)
      val lshMerge = timed(q.lshIndexMergeInto(spark, lsh, lshShard))
      // lexical index: delete is a bare tombstone append (O(batch));
      // compact rewrites only the touched slot set (constant batch →
      // bounded touched slots, though common terms touch many); merge
      // is a pure posting union under the universal slot hash (O(src))
      val lex = java.nio.file.Files.createTempDirectory("mb-lex").toString
      graft.queries.LexQueries.buildLexIndex(spark, dir, lex)
      val lexDelete = timed(
        graft.queries.LexQueries.deleteLexDocs(spark, lex, takedown))
      val lexCompact = timed(graft.queries.LexQueries.compactLexIndex(spark, lex))
      val lexShard = java.nio.file.Files.createTempDirectory("mb-lexshard").toString
      graft.queries.LexQueries.buildLexIndexFrom(spark,
        Tables.documents(spark, dirs.head)
          .filter(col("doc_id") % 4 === 2)
          .withColumn("doc_id", col("doc_id") + 1000000L), lexShard)
      val lexMerge = timed(
        graft.queries.LexQueries.lexIndexMergeInto(spark, lex, lexShard))
      // bucketed ingest corpus + sigs side table (built untimed, the
      // same layout the streaming appender maintains)
      val corpus = BucketedCorpus(table = s"mb_corpus_$tag", buckets = parts)
      Seq(corpus.table, s"${corpus.table}_sigs", s"${corpus.table}_retired")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      CorpusIngest.electKeepers(docs)
        .repartition(corpus.buckets, col("fp"))
        .write.bucketBy(corpus.buckets, "fp").sortBy("fp")
        .mode("overwrite").saveAsTable(corpus.table)
      val mins = q.minhashSigsOf(docs)
      q.bandSigs(mins).join(mins, "doc_id")
        .repartition(corpus.buckets, col("sig"))
        .write.bucketBy(corpus.buckets, "sig").sortBy("sig")
        .mode("overwrite").saveAsTable(s"${corpus.table}_sigs")
      val retire = timed(CorpusIngest.retireDocs(spark, corpus, ids("doc_id")))
      val activeRead = timed {
        CorpusIngest.activeCorpus(spark, corpus).count(): Unit
      }
      // ledger under sustained takedown traffic: resolution at 1×
      // events, at 10× churn (repeated retires of the same fixed id
      // set — multiple events per doc), then the self-compaction and
      // post-compaction resolution. The flat claim: resolution cost
      // tracks TRAFFIC, never the corpus (ratio ≈ 1 across scales),
      // and compactLedger restores the 1× resolution cost however
      // much churn accumulated between corpus compactions.
      def resolvePending(): Unit =
        CorpusIngest.retiredIds(spark, corpus).foreach(_.count(): Unit)
      val resolve1 = timed(resolvePending())
      (1 to 9).foreach(_ => CorpusIngest.retireDocs(spark, corpus, ids("doc_id")))
      val resolve10 = timed(resolvePending())
      val selfCompact = timed { CorpusIngest.compactLedger(spark, corpus): Unit }
      val resolveC = timed(resolvePending())
      val corpusCompact = timed(CorpusIngest.compact(spark, corpus))
      Map("ivf_delete" -> ivfDelete, "ivf_compact" -> ivfCompact,
        "ivf_merge" -> ivfMerge, "lsh_merge" -> lshMerge,
        "lsh_delete" -> lshDelete, "lsh_compact" -> lshCompact,
        "lex_delete" -> lexDelete, "lex_compact" -> lexCompact,
        "lex_merge" -> lexMerge,
        "retire" -> retire, "active_read" -> activeRead,
        "ledger_resolve_1x" -> resolve1, "ledger_resolve_10x" -> resolve10,
        "ledger_selfcompact" -> selfCompact,
        "ledger_resolve_compacted" -> resolveC,
        "corpus_compact" -> corpusCompact)
    }

    // warmup: one untimed cycle at the SMALLER passed fixture burns
    // codegen, write-path, and catalog init so scale A's first timed
    // cycle isn't paying setup scale B doesn't (dirs.head, not a
    // hardcoded path — the bench must run against any fixture pair)
    cycle(dirs.head, "warm")

    val results = dirs.map { dir =>
      val tag = new java.io.File(dir).getName.replace('.', '_')
      val runs = (1 to 2).map(i => cycle(dir, s"${tag}_$i"))
      dir -> runs.head.keys.map(k => k -> runs.map(_(k)).min).toMap
    }
    val ops = results.head._2.keys.toSeq.sorted
    def scaleJson(m: Map[String, Double]) =
      ops.map(k => s""""$k":${"%.3f".format(m(k))}""").mkString("{", ",", "}")
    val ratios = ops.map { k =>
      val a = results.head._2(k); val b = results.last._2(k)
      s""""$k":${"%.2f".format(if (a > 0) b / a else -1.0)}"""
    }.mkString("{", ",", "}")
    println(
      s"""{"metric":"maintenance","takedown_batch":${takedown.size},""" +
        results.map { case (d, m) =>
          s""""${new java.io.File(d).getName}":${scaleJson(m)}"""
        }.mkString(",") +
        s""","ratio_large_over_small":$ratios}""")
    spark.stop()
  }
}
