package graft

import graft.config.AppConfig
import graft.sink.Sinks.{DdlInitializer, JdbcBatchSink, ParquetTableSink, RecordSink}
import graft.streaming.Pipeline

import org.apache.spark.sql.SparkSession

/** User-facing job entry point — the counterpart of the reference's
  * `StreamingJob.main` (StreamingJob.java:112-186), same lifecycle:
  *
  *   1. config from CLI args merged over properties (O13);
  *   2. idempotent DDL before the dataflow launches (O12,
  *      StreamingJob.java:176-178 runs the Timestream initializer
  *      synchronously on the client);
  *   3. source → parse → watermark → late router → checkpointed sink.
  *
  * Offline wiring: a text-file drop directory stands in for the Kinesis
  * stream, a parquet table sink for Timestream. With connectors on the
  * classpath both edges swap behind [[Pipeline.LogSource]] /
  * [[graft.sink.Sinks.RecordSink]] without touching the dataflow.
  *
  * Usage: graft.Main --sourceDir /path/in --sinkDir /path/out
  *                   [--checkpointDir /path/ckpt] [--once true]
  */
object Main {
  /** One shared session recipe for every mode: pinned shuffle
    * parallelism + UTC, and a local-master fallback so a bare `java`
    * launch works while spark-submit's master (set via sys props) still
    * wins. */
  /** `hive = true` binds the session to the persistent metastore
    * (external if configured, embedded Derby in the working directory
    * otherwise) — required by CLI modes that must SEE managed tables
    * another JVM created (the corpus lifecycle); the default in-memory
    * catalog scopes managed-table metadata to this process. */
  private def mkSession(appName: String, hive: Boolean = false): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
    if (!sys.props.contains("spark.master"))
      builder.master(s"local[$cpus]")
    val spark = (if (hive) builder.enableHiveSupport() else builder).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  def main(args: Array[String]): Unit = {
    val cli = AppConfig.parseArgs(args)
    val cfg = AppConfig.load(args)

    // --mode curate: the BATCH entry point — one corpus-in →
    // training-shards-out curation run (quality gate → exact dedup →
    // near-dup keeper election → mixture sampling → sequence packing),
    // each stage the individually-oracled operator, composed
    // sequentially. Writes the curated corpus and the per-stage
    // manifest; prints the manifest as the run's audit log. Mirrors the
    // reference's single-entry-point StreamingJob.main
    // (StreamingJob.java:113-185) for the batch side.
    // Usage: graft.Main --mode curate --sfDir /path/tables --outDir /out
    if (cli.get("mode").contains("curate")) {
      val sfDir = cli.getOrElse("sfDir", sys.error("--sfDir required"))
      val outDir = cli.getOrElse("outDir", sys.error("--outDir required"))
      val spark = mkSession("graft-curate")
      graft.queries.CurationQueries.curateRun(spark, sfDir, outDir)
        .orderBy("stage_ord").show(truncate = false)
      spark.stop()
      return
    }

    // --mode curate-stream: the curation pipeline's ALWAYS-ON twin —
    // JSONL shards landing in --watchDir run the same 5-stage cascade
    // per micro-batch (graft.streaming.CurateStream shares the batch
    // stage functions verbatim), appending survivors and a per-batch
    // manifest row-set to --outDir. --sfDir supplies the document
    // schema (the fixture documents table's shape).
    // Usage: graft.Main --mode curate-stream --watchDir in/ --outDir out/
    //                   --sfDir /root/testdata/sf0.01 [--once true]
    if (cli.get("mode").contains("curate-stream")) {
      val watchDir = cli.getOrElse("watchDir", sys.error("--watchDir required"))
      val outDir = cli.getOrElse("outDir", sys.error("--outDir required"))
      val sfDir = cli.getOrElse("sfDir", sys.error("--sfDir required (schema source)"))
      val ckpt = cli.getOrElse("checkpointDir", s"$outDir/_checkpoint")
      val once = cli.getOrElse("once", "true").toBoolean
      val spark = mkSession("graft-curate-stream")
      val schema = graft.sources.Tables.documents(spark, sfDir).schema
      val (gq, bq) = graft.streaming.CurateStream.start(
        spark, watchDir, schema, outDir, ckpt, availableNow = once)
      gq.awaitTermination(); bq.awaitTermination()
      spark.stop()
      return
    }

    // --mode index: the index lifecycle as a CLI — build / append /
    // delete / compact / merge a persisted ANN or LSH index, so the
    // build-once/serve-many/retire story is drivable end to end
    // (--mode serve answers queries from the result).
    //   --family ivf|ivf_trained|ivfpq|lsh|lex
    //   --op build|append|delete|compact|merge|absorb|refresh
    //   (lex append takes --docDir: arbitrary (doc_id, text) parquet;
    //   lex refresh recomputes lexicon+stats from the index alone)
    //   delete takes --ids 1,2,3 (vector/doc ids to tombstone)
    //   merge takes --srcIndexDir (the shard index absorbed into
    //   --indexDir; src tombstones purged on the way in)
    //   absorb takes --vecDir (arbitrary (vec_id, embedding) parquet
    //   routed/encoded with the STORED artifacts — the shard-corpus
    //   path for families whose postings aren't index-to-index
    //   mergeable)
    // Usage: graft.Main --mode index --family ivf --op build
    //                   --sfDir /root/testdata/sf0.01 --indexDir idx/
    if (cli.get("mode").contains("index")) {
      val family = cli.getOrElse("family", sys.error("--family required"))
      val op = cli.getOrElse("op", sys.error("--op required"))
      val indexDir = cli.getOrElse("indexDir", sys.error("--indexDir required"))
      // compact/delete/refresh work off the index alone; merge reads
      // only the two indexes; absorb reads --vecDir; lex append reads
      // --docDir — none of these reads fixture tables
      val family0 = cli.getOrElse("family", "")
      val sfDir = cli.getOrElse("sfDir",
        if (op == "compact" || op == "delete" || op == "delete-source" ||
            op == "delete-label" || op == "merge" || op == "absorb" ||
            op == "refresh" || (family0 == "lex" && op == "append")) ""
        else sys.error("--sfDir required"))
      def srcIndexDir = cli.getOrElse("srcIndexDir",
        sys.error("--srcIndexDir required for merge"))
      val spark = mkSession("graft-index")
      val q = graft.queries.SimilarityQueries
      def ids: org.apache.spark.sql.DataFrame = {
        import spark.implicits._
        val idCol = if (family == "lsh") "doc_id" else "vec_id"
        cli.getOrElse("ids", sys.error("--ids required for delete"))
          .split(",").map(_.trim.toLong).toSeq.toDF(idCol)
      }
      def vecFrame: org.apache.spark.sql.DataFrame =
        spark.read.parquet(cli.getOrElse("vecDir",
            sys.error("--vecDir required for absorb")))
          .select(org.apache.spark.sql.functions.col("vec_id"),
            org.apache.spark.sql.functions.col("embedding"))
      (family, op) match {
        case ("ivf", "build") => q.buildIvfIndex(spark, sfDir, indexDir)
        case ("ivf_trained", "build") => q.buildIvfIndexTrained(spark, sfDir, indexDir)
        // append NEVER rebuilds: the delta routes through the STORED
        // centroids/codebooks and lands as new posting files only — a
        // standing index (and its live tombstones) is untouched. The
        // base+delta demo composites (buildIvf*IndexAppend) are the
        // fixture-lifecycle entry points, not CLI ops.
        case ("ivf" | "ivf_trained", "append") => q.appendIvfIndex(spark, sfDir, indexDir)
        case ("ivf" | "ivf_trained", "delete") => q.ivfIndexDelete(spark, indexDir, ids)
        // facet-scoped takedown: tombstones resolve from the attrs
        // sidecar's one label directory — O(facet), zero posting reads
        case ("ivf" | "ivf_trained", "delete-label") =>
          q.ivfIndexDeleteLabel(spark, indexDir, cli.getOrElse("label",
            sys.error("--label required for delete-label")).toLong)
        case ("ivf" | "ivf_trained", "delete-source") =>
          q.ivfIndexDeleteSource(spark, indexDir, cli.getOrElse("source",
            sys.error("--source required for delete-source")))
        case ("ivf" | "ivf_trained", "compact") => q.ivfIndexCompact(spark, indexDir)
        // shard-parallel merge: src postings re-route against the
        // DESTINATION's frozen centroids and append per-bucket — no
        // retraining, no corpus read; src tombstones purge on the way in
        case ("ivf" | "ivf_trained", "merge") =>
          q.ivfIndexMergeInto(spark, indexDir, srcIndexDir)
        case ("ivf" | "ivf_trained", "absorb") => q.ivfAbsorb(spark, indexDir, vecFrame)
        case ("ivfpq", "build") => q.buildIvfPqIndex(spark, sfDir, indexDir)
        case ("ivfpq", "append") => q.appendIvfPqIndex(spark, sfDir, indexDir)
        case ("ivfpq", "delete") => q.ivfPqIndexDelete(spark, indexDir, ids)
        case ("ivfpq", "delete-label") =>
          q.ivfPqIndexDeleteLabel(spark, indexDir, cli.getOrElse("label",
            sys.error("--label required for delete-label")).toLong)
        case ("ivfpq", "delete-source") =>
          q.ivfPqIndexDeleteSource(spark, indexDir, cli.getOrElse("source",
            sys.error("--source required for delete-source")))
        case ("ivfpq", "compact") => q.ivfIndexCompact(spark, indexDir, idCol = "vid")
        case ("ivfpq", "absorb") => q.ivfPqAbsorb(spark, indexDir, vecFrame)
        case ("ivfpq", "merge") =>
          // index-to-index ONLY between artifact-identical shards (the
          // central-training shape — codes are then routable as-is and
          // the merge is a pure posting union); divergent artifacts
          // refuse loudly inside and point at `--op absorb --vecDir`,
          // the O(src corpus) re-encode
          q.ivfPqIndexMergeInto(spark, indexDir, srcIndexDir)
        case ("lsh", "build") => q.buildLshIndex(spark, sfDir, indexDir)
        case ("lsh", "append") => q.lshIndexAppend(spark, sfDir, indexDir)
        case ("lsh", "delete") => q.lshIndexDelete(spark, indexDir, ids)
        // facet-scoped takedown: tombstones resolve from the attrs
        // sidecar's source= leaves — O(facet), zero posting reads
        case ("lsh", "delete-source") => q.lshIndexDeleteSource(spark, indexDir,
          cli.getOrElse("source", sys.error("--source required for delete-source")))
        case ("lsh", "compact") => q.lshIndexCompact(spark, indexDir)
        // per-document signatures: merge = partition-wise posting union
        case ("lsh", "merge") => q.lshIndexMergeInto(spark, indexDir, srcIndexDir)
        // lexical (BM25 inverted) index: build indexes the sfDir corpus;
        // append absorbs an ARBITRARY (doc_id, text) parquet under the
        // frozen lexicon (--docDir, the absorb shape); delete/compact
        // are the shared tombstone lifecycle
        case ("lex", "build") =>
          graft.queries.LexQueries.buildLexIndex(spark, sfDir, indexDir)
        case ("lex", "append") =>
          // the frame passes through whole: posting rows use doc_id +
          // text; lang/source (when the parquet carries them) feed the
          // facet sidecar, absent ones land in the honest `und` facet
          graft.queries.LexQueries.appendLexIndex(spark,
            spark.read.parquet(cli.getOrElse("docDir",
              sys.error("--docDir required for lex append"))),
            indexDir)
        case ("lex", "delete") =>
          graft.queries.LexQueries.deleteLexDocs(spark, indexDir,
            cli.getOrElse("ids", sys.error("--ids required for delete"))
              .split(",").map(_.trim.toLong).toSeq)
        case ("lex", "delete-source") =>
          graft.queries.LexQueries.deleteLexSource(spark, indexDir,
            cli.getOrElse("source", sys.error("--source required for delete-source")))
        case ("lex", "compact") =>
          graft.queries.LexQueries.compactLexIndex(spark, indexDir)
        // universal slot hash ⇒ shard merge is a partition-wise posting
        // union (src tombstones purged on the way in; dst lexicon frozen)
        case ("lex", "merge") =>
          graft.queries.LexQueries.lexIndexMergeInto(spark, indexDir, srcIndexDir)
        // refresh: recompute lexicon + stats from the CURRENT postings
        // (no corpus read) — exact BM25 restored after append/merge/ingest
        case ("lex", "refresh") =>
          graft.queries.LexQueries.refreshLexicon(spark, indexDir)
        case other => sys.error(s"unknown family/op: $other")
      }
      println(s"[graft] index $op done: family=$family index=$indexDir")
      spark.stop()
      return
    }

    // --mode retire: the corpus takedown as a CLI — append doc_ids to
    // the corpus's tombstone ledger (O(takedown); every standing probe
    // and activeCorpus serve around it immediately), optionally running
    // the physical purge (--compact true) on the spot instead of the
    // scheduled maintenance cadence. The ingest stream may stay up for
    // the tombstone append; run --compact only with the appender
    // quiesced (the rewrite's fence aborts otherwise, loudly).
    // Catalog note: the corpus is a MANAGED bucketed table, so a retire
    // invoked as its own JVM must share the catalog that holds it —
    // --hiveCatalog true (default) binds to the persistent metastore
    // (external if configured, embedded Derby in the working dir
    // otherwise; run from the same directory as the ingest job). The
    // guard below fails loudly if the table is not visible, instead of
    // appending a ledger no reader will consult.
    // Past --ledgerCompactRows ledger events (default 100k), the
    // retire also rides a LEDGER self-compaction (one resolved
    // latest-state row per doc_id — pending set unchanged), so
    // sustained takedown traffic between corpus compactions cannot
    // grow the per-batch pending broadcast without bound.
    // Usage: graft.Main --mode retire --corpusTable corpus --ids 1,2,3
    //                   [--buckets 32] [--compact false] [--semantic false]
    //                   [--ledgerCompactRows 100000] [--hiveCatalog true]
    if (cli.get("mode").contains("retire")) {
      val table = cli.getOrElse("corpusTable", sys.error("--corpusTable required"))
      val idsArg = cli.getOrElse("ids", sys.error("--ids required"))
      val buckets = cli.getOrElse("buckets",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).toInt
      val runCompact = cli.getOrElse("compact", "false").toBoolean
      val semantic = cli.getOrElse("semantic", "false").toBoolean
      val spark = mkSession("graft-retire",
        hive = cli.getOrElse("hiveCatalog", "true").toBoolean)
      import spark.implicits._
      if (!spark.catalog.tableExists(table))
        sys.error(s"--mode retire: corpus table '$table' is not visible in " +
          "this session's catalog. The corpus is a managed table — run " +
          "retire against the same metastore that holds it (same working " +
          "directory for the embedded Derby metastore, or configure the " +
          "shared external metastore); a tombstone written into a " +
          "different catalog would never be served around.")
      val corpus = graft.streaming.CorpusIngest.BucketedCorpus(table, buckets)
      val ids = idsArg.split(",").map(_.trim.toLong).toSeq.toDF("doc_id")
      graft.streaming.CorpusIngest.retireDocs(spark, corpus, ids)
      println(s"[graft] retired ${idsArg.split(",").length} ids into " +
        s"${table}_retired (serve-around active)")
      val ledgerCap = cli.getOrElse("ledgerCompactRows", "100000").toLong
      if (!runCompact &&
          spark.table(s"${table}_retired").count() > ledgerCap) {
        val ok = graft.streaming.CorpusIngest.compactLedger(spark, corpus)
        println(if (ok) "[graft] ledger self-compacted to latest-state rows"
          else "[graft] ledger self-compaction aborted (concurrent append) — unchanged")
      }
      if (runCompact) {
        graft.streaming.CorpusIngest.compact(spark, corpus, semantic)
        println(s"[graft] compact done: tombstoned rows purged, consumed ledger events cleared")
      }
      spark.stop()
      return
    }

    // --mode ingest-vectors: the STREAMING write edge of the index
    // lifecycle — embedding batches dropped as parquet files into
    // --vecDir land in the persisted index at --indexDir per
    // micro-batch, EXACTLY-ONCE via the shared staged-promote commit,
    // servable by a concurrent --mode serve on its next batch.
    // --family ivf (default): routed against the frozen centroids, raw
    // postings appended (VecIngest); --family ivfpq: routed AND
    // residual-encoded with the frozen codebooks — only codes land on
    // disk (PqIngest, the compressed index's write edge).
    // Usage: graft.Main --mode ingest-vectors [--family ivf|ivfpq]
    //                   --indexDir idx/ --vecDir vecs/ [--once true]
    if (cli.get("mode").contains("ingest-vectors")) {
      val indexDir = cli.getOrElse("indexDir", sys.error("--indexDir required"))
      val vecDir = cli.getOrElse("vecDir", sys.error("--vecDir required"))
      val ckpt = cli.getOrElse("checkpointDir", s"$indexDir/_ingest_checkpoint")
      val once = cli.getOrElse("once", "true").toBoolean
      val family = cli.getOrElse("family", "ivf")
      val spark = mkSession("graft-vec-ingest")
      // code postings carry no raw vectors; the query vector type comes
      // from the stored centroids for the ivfpq family
      val vSchema = family match {
        case "ivf" => org.apache.spark.sql.types.StructType(
          spark.read.parquet(s"$indexDir/postings")
            .select("vec_id", "embedding").schema.fields)
        case "ivfpq" =>
          val embType = spark.read.parquet(s"$indexDir/centroids")
            .schema("cemb").dataType
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("vec_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("embedding", embType)))
        case other => sys.error(s"unknown ingest family: $other")
      }
      val stream = spark.readStream.schema(vSchema).parquet(vecDir)
      val q = family match {
        case "ivf" => graft.streaming.VecIngest.start(
          spark, stream, indexDir, ckpt, availableNow = once)
        case _ => graft.streaming.PqIngest.start(
          spark, stream, indexDir, ckpt, availableNow = once)
      }
      q.awaitTermination()
      spark.stop()
      return
    }

    // --mode ingest-docs: the lexical index's streaming write edge —
    // (doc_id, text) batches dropped as parquet files into --docDir
    // land in the persisted inverted index at --indexDir per
    // micro-batch (the batch tokenizes itself; EXACTLY-ONCE via the
    // shared staged-promote commit), servable by a concurrent
    // --mode serve --family lex on its next batch.
    // Usage: graft.Main --mode ingest-docs --indexDir idx/
    //                   --docDir docs/ [--once true]
    if (cli.get("mode").contains("ingest-docs")) {
      val indexDir = cli.getOrElse("indexDir", sys.error("--indexDir required"))
      val docDir = cli.getOrElse("docDir", sys.error("--docDir required"))
      val ckpt = cli.getOrElse("checkpointDir", s"$indexDir/_ingest_checkpoint")
      val once = cli.getOrElse("once", "true").toBoolean
      val spark = mkSession("graft-doc-ingest")
      val dSchema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      val q = graft.streaming.LexIngest.start(
        spark, spark.readStream.schema(dSchema).parquet(docDir),
        indexDir, ckpt, availableNow = once)
      q.awaitTermination()
      spark.stop()
      return
    }

    // --mode serve: the STREAMING serving entry point — queries dropped
    // as parquet files into --queryDir are answered per micro-batch
    // from the persisted index at --indexDir. --family ivf (default):
    // vector queries through graft.streaming.AnnServe (centroids cached
    // at stream start, posting reads pruned to the probed buckets);
    // --family ivfpq: vector queries through graft.streaming.PqServe
    // (centroids + residual codebooks cached at stream start, ADC
    // scoring over bucket-pruned CODE postings — the compressed-index
    // serving path); --family lsh: (doc_id, text) document queries
    // through graft.streaming.LshServe (batch signs itself,
    // band-signature equijoin against the standing signature index —
    // zero standing text read). --tombstoneAware true re-reads the
    // tombstone set per batch so takedowns land without a restart, all
    // families. Results land under --outDir/b<batchId>. Build an index
    // first with --mode index (families ivf/ivf_trained/ivfpq/lsh).
    // --family lex: (qid, text) retrieval queries through
    // graft.streaming.LexServe (BM25 top-10 from the standing inverted
    // index — batch tokenizes itself, lexicon/posting reads slot-pruned).
    // Usage: graft.Main --mode serve [--family ivf|ivfpq|lsh|lex|hybrid]
    //                   --indexDir idx/ --queryDir q/ --outDir out/
    //                   [--once true] [--tombstoneAware true]
    //                   [--facetLabel N] [--facetSource src] (ivf|ivfpq)
    //                   [--facetLang xx] [--facetSource src] (lex|lsh)
    if (cli.get("mode").contains("serve")) {
      val indexDir = cli.getOrElse("indexDir", sys.error("--indexDir required"))
      val queryDir = cli.getOrElse("queryDir", sys.error("--queryDir required"))
      val outDir = cli.getOrElse("outDir", sys.error("--outDir required"))
      val ckpt = cli.getOrElse("checkpointDir", s"$outDir/_checkpoint")
      val once = cli.getOrElse("once", "true").toBoolean
      val tombAware = cli.getOrElse("tombstoneAware", "true").toBoolean
      // --family ivf (default): vector queries → AnnServe top-3;
      // --family ivfpq: vector queries → PqServe ADC top-3;
      // --family lsh: (doc_id, text) document queries → LshServe
      // near-dup candidates against the standing signature index
      val family = cli.getOrElse("family", "ivf")
      val spark = mkSession(s"graft-$family-serve")
      // overwrite, not append: foreachBatch redelivers a failed batch
      // under the SAME batch id, so a per-batch-directory sink is only
      // idempotent (the serving restart contract) if the retry
      // REPLACES the partial first attempt instead of doubling it
      val sink = (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.write.mode("overwrite").parquet(s"$outDir/b$id")
      val q = family match {
        case "ivf" =>
          // the query stream's schema comes from the index postings
          // (same vector type) — a drop dir needs no schema registry
          val qSchema = org.apache.spark.sql.types.StructType(
            spark.read.parquet(s"$indexDir/postings")
              .select("vec_id", "embedding").schema.fields)
          // --facetLabel N scopes every query to that facet
          // (filter-first; the attrs sidecar's one label directory
          // re-read per batch, so appended facet rows land on the next
          // micro-batch like tombstones)
          graft.streaming.AnnServe.start(
            spark, spark.readStream.schema(qSchema).parquet(queryDir),
            indexDir, sink, ckpt, availableNow = once,
            tombstoneAware = tombAware,
            facetLabel = cli.get("facetLabel").map(_.toLong),
            facetSource = cli.get("facetSource"))
        case "ivfpq" =>
          // code postings carry no raw vectors; the query vector type
          // comes from the stored centroids instead
          val embType = spark.read.parquet(s"$indexDir/centroids")
            .schema("cemb").dataType
          val qSchema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("vec_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("embedding", embType)))
          graft.streaming.PqServe.start(
            spark, spark.readStream.schema(qSchema).parquet(queryDir),
            indexDir, sink, ckpt, availableNow = once,
            tombstoneAware = tombAware,
            facetLabel = cli.get("facetLabel").map(_.toLong),
            facetSource = cli.get("facetSource"))
        case "lsh" =>
          val qSchema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType)))
          // --facetLang/--facetSource scope the STANDING side to one
          // facet (the attrs sidecar's pruned directories re-read per
          // batch, like tombstones) — "near-dups within language X",
          // the language-scoped dedup-sweep shape
          graft.streaming.LshServe.start(
            spark, spark.readStream.schema(qSchema).parquet(queryDir),
            indexDir, sink, ckpt, availableNow = once,
            tombstoneAware = tombAware, facetLang = cli.get("facetLang"),
            facetSource = cli.get("facetSource"))
        case "lex" =>
          // (qid, text) retrieval queries → LexServe BM25 top-10 against
          // the standing inverted index (build with --mode index
          // --family lex); stats cached at stream start, lexicon and
          // postings slot-pruned per batch. --facetLang xx scopes every
          // query to that facet (filter-first; the attrs sidecar's one
          // lang directory re-read per batch, so appended facet rows
          // land on the next micro-batch like tombstones)
          val qSchema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("qid",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType)))
          // --facetSource src scopes to one source (the takedown/
          // licensing shape) — attrs level-2 partition pruning; combine
          // with --facetLang for a leaf-pruned two-axis facet
          graft.streaming.LexServe.start(
            spark, spark.readStream.schema(qSchema).parquet(queryDir),
            indexDir, sink, ckpt, availableNow = once,
            tombstoneAware = tombAware, facetLang = cli.get("facetLang"),
            facetSource = cli.get("facetSource"))
        case "hybrid" =>
          // (qid, text, embedding) hybrid queries → HybridServe: RRF
          // fusion of the lexical index at --indexDir with the IVF
          // index at --ivfIndexDir; facet flags screen BOTH arms from
          // one allowlist read (doc_id ≡ vec_id)
          val ivfDir = cli.getOrElse("ivfIndexDir",
            sys.error("--ivfIndexDir required for --family hybrid"))
          val embType = spark.read.parquet(s"$ivfDir/postings")
            .schema("embedding").dataType
          val qSchema = org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("qid",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("embedding", embType)))
          graft.streaming.HybridServe.start(
            spark, spark.readStream.schema(qSchema).parquet(queryDir),
            indexDir, ivfDir, sink, ckpt, availableNow = once,
            tombstoneAware = tombAware, facetLang = cli.get("facetLang"),
            facetSource = cli.get("facetSource"))
        case other => sys.error(s"unknown serve family: $other")
      }
      q.awaitTermination()
      spark.stop()
      return
    }

    val sourceDir = cli.getOrElse("sourceDir", sys.error("--sourceDir required"))
    val sinkDir = cli.getOrElse("sinkDir", sys.error("--sinkDir required"))
    val checkpointDir = cli.getOrElse("checkpointDir", s"$sinkDir/_checkpoint")
    val once = cli.getOrElse("once", "true").toBoolean

    val spark = mkSession("graft-streaming-job")

    // --mode refire: the Flink allowedLateness RE-FIRE wiring
    // (StreamingJob.java:149) — update-output windowed aggregation whose
    // revisions MERGE into an upsert table, so the standing table always
    // holds each window's LATEST aggregate (Timestream's own upsert
    // semantics: identical time+dimensions, latest version wins). cnt is
    // the version column — a window's re-fire strictly grows its count,
    // so last-writer == highest cnt.
    if (cli.get("mode").contains("refire")) {
      val ups = new graft.streaming.UpsertSink(s"$sinkDir/windows",
        keyCols = Seq("window_start", "callerservice", "operation"),
        versionCols = Seq("cnt"),
        valueCols = Seq("min_latency", "max_latency", "avg_latency"))
      // restart recovery: the delivered side lives in the WINDOWS table,
      // so the router's watermark bootstraps from max(window_start) —
      // a lower bound on the max delivered event time (bootstrapping
      // from the late table instead would UNDERSTATE the watermark and
      // silently discard late records on the first post-restart batch).
      // Read BEFORE the upsert query launches: a concurrent
      // dynamic-partition overwrite would either throw mid-read (silently
      // disabling the bootstrap) or leak the current run's windows into
      // the watermark, dead-lettering records the window query delivered.
      val windowsWm: Option[Long] =
        try {
          val r = spark.read.parquet(s"$sinkDir/windows")
            .agg(org.apache.spark.sql.functions.max(
              org.apache.spark.sql.functions.unix_millis(
                org.apache.spark.sql.functions.col("window_start"))))
            .collect()(0)
          if (r.isNullAt(0)) None else Some(r.getLong(0))
        } catch { case scala.util.control.NonFatal(_) => None }
      val q = Pipeline.startWindowedUpdate(
        spark, new Pipeline.FileLogSource(sourceDir), cfg,
        (df, id) => ups.merge(df, id), checkpointDir, availableNow = once)
      // dead-letter parity (StreamingJob.java:150,168): the update-mode
      // window operator silently DROPS beyond-grace records, so a second
      // router query preserves them — late side to the durable dead
      // letter, on-time side discarded (those rows are delivered by the
      // upsert query above). Own checkpoint: independent source offsets.
      DdlInitializer.ensureTableDir(s"$sinkDir/late")
      val lateQ = Pipeline.start(
        spark, new Pipeline.FileLogSource(sourceDir), cfg,
        new Pipeline.LateRouter(
          cfg.latenessSeconds * 1000L,
          new graft.sink.Sinks.DiscardSink,
          new ParquetTableSink(s"$sinkDir/late"),
          initialWatermarkMs = windowsWm),
        s"$checkpointDir-late", availableNow = once)
      q.awaitTermination()
      lateQ.awaitTermination()
      spark.stop()
      return
    }

    // DDL before launch, like the reference (idempotent)
    DdlInitializer.ensureTableDir(s"$sinkDir/main")
    DdlInitializer.ensureTableDir(s"$sinkDir/late")

    // --jdbcUrl switches the main point sink to the JDBC edge (the
    // BASELINE.json-designated production target); the late dead letter
    // stays file-backed either way
    val mainSink: RecordSink = cfg.jdbcUrl match {
      case Some(_) => new JdbcBatchSink(cfg)
      // date-partitioned: retention via Layout.expirePartitions and a
      // partition-pruned restart bootstrap (one day of files, not the
      // whole table) both key off the event_date= layout. A sink written
      // by the earlier UNPARTITIONED layout keeps writing flat — mixing
      // event_date= dirs into it would break partition discovery on
      // every future read of that table.
      case None =>
        val legacy = graft.sink.Sinks.ParquetTableSink
          .isLegacyFlat(spark, s"$sinkDir/main/data")
        if (legacy)
          System.err.println(
            s"[graft] $sinkDir/main/data holds a flat (pre-partitioned) " +
              "layout - continuing unpartitioned; migrate with " +
              "Layout.writeDatePartitioned to enable pruned restarts/retention")
        new ParquetTableSink(s"$sinkDir/main", datePartitioned = !legacy)
    }
    // --lateToConsole mirrors the reference's side-output print()
    // (StreamingJob.java:168); default keeps the dead-letter durable
    val lateSink: RecordSink =
      if (cli.get("lateToConsole").contains("true")) new graft.sink.Sinks.ConsoleSink
      else new ParquetTableSink(s"$sinkDir/late")
    val router = new Pipeline.LateRouter(
      cfg.latenessSeconds * 1000L,
      mainSink,
      lateSink,
      initialWatermarkMs =
        Pipeline.LateRouter.bootstrapWatermark(spark, s"$sinkDir/main/data")
    )
    val query = Pipeline.start(
      spark, new Pipeline.FileLogSource(sourceDir), cfg, router,
      checkpointDir, availableNow = once)
    query.awaitTermination()
    spark.stop()
  }
}
