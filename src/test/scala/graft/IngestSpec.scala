package graft

import graft.sources.Ingest

import org.apache.spark.sql.types._

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.util.zip.GZIPOutputStream

/** File-ingest edge: schema-pinned JSONL/CSV with a corrupt-record dead
  * letter — every line lands in exactly one of the two frames. */
class IngestSpec extends SparkSuite {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  private def writeLines(path: String, lines: Seq[String], gzip: Boolean): Unit = {
    val out = new FileOutputStream(path)
    val w = new BufferedWriter(new OutputStreamWriter(
      if (gzip) new GZIPOutputStream(out) else out, "UTF-8"))
    lines.foreach { l => w.write(l); w.newLine() }
    w.close()
  }

  test("jsonl: good lines parse typed, malformed lines dead-letter verbatim") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    writeLines(s"$dir/part-0.jsonl", Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "hola", "lang": "es"}""",
      """{"doc_id": broken not json""",
      """{"doc_id": "not-a-number", "text": "x", "lang": "en"}""",
      "", // blank separator line: must quarantine, not become an all-null doc
      "   "
    ), gzip = false)
    val (good, bad) = Ingest.readJsonl(spark, dir, docSchema)
    val g = good.collect()
    assert(g.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L))
    assert(g.find(_.getAs[Long]("doc_id") == 1L).get.getAs[String]("text") == "hello world")
    val b = bad.collect().map(_.getAs[String]("raw_line"))
    assert(b.length == 4)
    assert(b.exists(_.contains("broken not json")))
    assert(b.exists(_.contains("not-a-number"))) // type drift is quarantined, not nulled
    assert(b.contains("") && b.contains("   ")) // phantom null rows never reach good
    // conservation: every input line is in exactly one frame
    assert(g.length + b.length == 6)
  }

  test("gzipped jsonl reads transparently (the standard corpus dump layout)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_gz").toString
    writeLines(s"$dir/shard-00.jsonl.gz", Seq(
      """{"doc_id": 10, "text": "compressed", "lang": "en"}""",
      """garbage line"""
    ), gzip = true)
    val (good, bad) = Ingest.readJsonl(spark, dir, docSchema)
    assert(good.collect().map(_.getAs[Long]("doc_id")).toSeq == Seq(10L))
    assert(bad.count() == 1L)
  }

  test("streaming jsonl: landed shards split into corpus and quarantine sinks") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_stream").toString
    writeLines(s"$dir/landed-0.jsonl", Seq(
      """{"doc_id": 1, "text": "streamed", "lang": "en"}""",
      """half a json {""",
      """{"doc_id": 2, "text": "more", "lang": "fr"}"""
    ), gzip = false)
    val (good, bad) = Ingest.streamJsonl(spark, dir, docSchema)
    assert(good.isStreaming && bad.isStreaming)
    def drain(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val q = df.writeStream.format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain(good, "ingest_good")
    drain(bad, "ingest_bad")
    val g = spark.table("ingest_good").collect()
    assert(g.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L))
    val b = spark.table("ingest_bad").collect().map(_.getAs[String]("raw_line"))
    assert(b.toSeq == Seq("half a json {"))
  }

  test("corpus ingest end-to-end: landed shards dedup against the standing corpus across restarts") {
    import graft.streaming.CorpusIngest
    val base = java.nio.file.Files.createTempDirectory("graft_corpus").toString
    val watch = s"$base/landing"; val corpus = s"$base/corpus"
    val quarantine = s"$base/quarantine"; val ckpt = s"$base/ckpt"
    new java.io.File(watch).mkdirs()

    def runOnce(): Unit = {
      val (gq, bq) = CorpusIngest.start(spark, watch, docSchema, corpus,
        quarantine, ckpt, availableNow = true)
      gq.awaitTermination(); bq.awaitTermination()
    }

    // shard 1: two docs, one internal duplicate pair (doc 3 dups doc 1
    // modulo normalization), a malformed line, and a structurally
    // incomplete line (valid JSON, text absent) — the last must land in
    // the incomplete quarantine, not vanish and not "dedup" anything
    writeLines(s"$watch/shard-1.jsonl", Seq(
      """{"doc_id": 1, "text": "the quick brown fox", "lang": "en"}""",
      """{"doc_id": 2, "text": "something else", "lang": "en"}""",
      """{"doc_id": 3, "text": "The  QUICK brown fox", "lang": "en"}""",
      """{"doc_id": 4, "lang": "en"}""",
      """corrupt {{{"""
    ), gzip = false)
    runOnce()
    val after1 = spark.read.parquet(corpus).collect()
    assert(after1.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L),
      "batch-local keeper election must drop doc 3 (dup of 1)")
    assert(spark.read.parquet(s"$quarantine/malformed").count() == 1L)
    val inc = spark.read.parquet(s"$quarantine/incomplete").collect()
    assert(inc.length == 1 && inc.head.getAs[Long]("doc_id") == 4L)

    // shard 2 lands later: one dup of the STANDING corpus, one new doc;
    // the restarted query must only process the new file (checkpoint)
    writeLines(s"$watch/shard-2.jsonl", Seq(
      """{"doc_id": 10, "text": "the quick BROWN fox", "lang": "en"}""",
      """{"doc_id": 11, "text": "genuinely new content", "lang": "en"}"""
    ), gzip = false)
    runOnce()
    val after2 = spark.read.parquet(corpus).collect()
    assert(after2.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L, 11L),
      "standing-corpus anti-join must drop doc 10, keep doc 11")
  }

  test("bucketed corpus ingest: dedups across restarts; standing anti-join side reads bucketed") {
    import graft.streaming.CorpusIngest
    import graft.streaming.CorpusIngest.BucketedCorpus
    val base = java.nio.file.Files.createTempDirectory("graft_corpus_b").toString
    val watch = s"$base/landing"; val quarantine = s"$base/quarantine"
    val ckpt = s"$base/ckpt"
    new java.io.File(watch).mkdirs()
    val corpus = BucketedCorpus(table = "corpus_bucketed_test", buckets = 4)

    def runOnce(): Unit = {
      val (gq, bq) = CorpusIngest.startBucketed(spark, watch, docSchema, corpus,
        quarantine, ckpt, availableNow = true)
      gq.awaitTermination(); bq.awaitTermination()
    }

    // shard 1: all-fresh (the Bloom fast path — no standing table yet),
    // with an internal dup pair and a same-doc_id double (the ADVICE
    // row_number case: min(doc_id) election would keep both copies)
    writeLines(s"$watch/shard-1.jsonl", Seq(
      """{"doc_id": 1, "text": "the quick brown fox", "lang": "en"}""",
      """{"doc_id": 1, "text": "THE QUICK  brown fox", "lang": "en"}""",
      """{"doc_id": 2, "text": "something else", "lang": "en"}"""
    ), gzip = false)
    runOnce()
    val after1 = spark.table(corpus.table).collect()
    assert(after1.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L),
      "keeper election must keep exactly one row per fp even on doc_id ties")

    // shard 2 lands after a RESTART (fresh BloomGate seeded from the
    // standing table): one dup of the standing corpus — forces the
    // Bloom-hit exact anti-join branch — and one genuinely new doc
    writeLines(s"$watch/shard-2.jsonl", Seq(
      """{"doc_id": 10, "text": "the quick BROWN fox", "lang": "en"}""",
      """{"doc_id": 11, "text": "genuinely new content", "lang": "en"}"""
    ), gzip = false)
    runOnce()
    // the append ran in the stream's cloned session; this session's
    // relation cache still lists shard-1's files only (standard Spark
    // cross-session table semantics)
    spark.catalog.refreshTable(corpus.table)
    val after2 = spark.table(corpus.table).collect()
    assert(after2.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L, 11L),
      "standing-corpus anti-join must drop doc 10, keep doc 11")

    // THE scale point: the per-batch standing probe is a broadcast-probe
    // semi-join — ONE standing scan, ZERO shuffle, ZERO sort of the
    // standing set, at any corpus size (an SMJ anti-join would re-sort
    // the whole standing fp set every batch)
    locally {
      import spark.implicits._
      val probe = Seq("00000000000000000000000000000000").toDF("fp")
      val plan = CorpusIngest.standingDups(spark.table(corpus.table), probe)
        .queryExecution.executedPlan.treeString
      assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"standing probe must not shuffle anything:\n$plan")
      assert(!plan.linesIterator.exists(l => l.contains("Sort ") && !l.contains("SortBy")),
        s"standing probe must not sort anything:\n$plan")
      // with a pending takedown, the serve-around adds ONE broadcast
      // anti-join in front — still one standing scan, still zero
      // shuffle/sort (the retire redesign must not cost the probe its
      // 100 TB shape)
      val retired = org.apache.spark.sql.functions.broadcast(Seq(999L).toDF("doc_id"))
      val planR = CorpusIngest.standingDups(
          CorpusIngest.serveAround(spark.table(corpus.table), Some(retired)), probe)
        .queryExecution.executedPlan.treeString
      assert(planR.contains("LeftAnti") && planR.contains("LeftSemi"), planR)
      assert(!planR.contains("Exchange hashpartitioning"),
        s"serve-around probe must not shuffle anything:\n$planR")
      assert(!planR.linesIterator.exists(l => l.contains("Sort ") && !l.contains("SortBy")),
        s"serve-around probe must not sort anything:\n$planR")
      assert(planR.linesIterator.count(_.contains("Scan ")) <=
        plan.linesIterator.count(_.contains("Scan ")) + 1,
        s"serve-around must add at most the tiny tombstone scan:\n$planR")
    }

    // and the bucketed layout still serves downstream batch work: a
    // same-bucket-count fp equijoin against the corpus needs no
    // Exchange on the corpus side
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val local = spark.createDataFrame(
        spark.sparkContext.parallelize(after2.toIndexedSeq),
        spark.table(corpus.table).schema)
      val plan = CorpusIngest.freshAgainst(local, spark.table(corpus.table))
        .queryExecution.executedPlan.treeString
      assert(plan.contains("SortMergeJoin") && plan.contains("LeftAnti"), plan)
      assert(plan.contains("SelectedBucketsCount"), plan)
      val nExchanges = plan.linesIterator.count(_.contains("Exchange hashpartitioning"))
      assert(nExchanges == 1,
        s"expected exactly one Exchange (batch side only), got $nExchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("semantic ingest: a paraphrased duplicate (fresh fp) is quarantined, not appended") {
    import graft.streaming.CorpusIngest
    import graft.streaming.CorpusIngest.{BucketedCorpus, SemanticGate}
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_corpus_sem").toString
    val watch = s"$base/landing"; val quarantine = s"$base/quarantine"
    val ckpt = s"$base/ckpt"
    new java.io.File(watch).mkdirs()
    val embSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("embedding", ArrayType(DoubleType))))
    val corpus = BucketedCorpus(table = "corpus_semantic_test", buckets = 4)
    // two frozen unit centroids; anything within cos >= 0.95 of a
    // standing same-cluster doc is a paraphrase-duplicate
    val gate = SemanticGate(Seq(
      (100L, Seq(1.0, 0.0), 1.0),
      (200L, Seq(0.0, 1.0), 1.0)), threshold = 0.95)

    def runOnce(): Unit = {
      val (gq, bq) = CorpusIngest.startBucketed(spark, watch, embSchema, corpus,
        quarantine, ckpt, availableNow = true, semantic = Some(gate))
      gq.awaitTermination(); bq.awaitTermination()
    }

    // shard 1: two semantically distinct docs (one per cluster), one
    // row with NO embedding — unscoreable, must land in incomplete —
    // and a WITHIN-BATCH paraphrase of doc 1 (different text, near
    // cosine): the standing check can't see it (nothing stands yet),
    // so the batch-local semantic election must catch it
    writeLines(s"$watch/shard-1.jsonl", Seq(
      """{"doc_id": 1, "text": "alpha one", "embedding": [1.0, 0.05]}""",
      """{"doc_id": 2, "text": "totally different words", "embedding": [0.05, 1.0]}""",
      """{"doc_id": 3, "text": "no embedding here"}""",
      """{"doc_id": 4, "text": "alpha uno", "embedding": [0.995, 0.06]}"""
    ), gzip = false)
    runOnce()
    assert(spark.table(corpus.table).collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
      == Seq(1L, 2L),
      "the within-batch paraphrase (doc 4) must not append alongside doc 1")
    val inc = spark.read.parquet(s"$quarantine/incomplete").collect()
    assert(inc.length == 1 && inc.head.getAs[Long]("doc_id") == 3L,
      "a row the gate cannot score must quarantine, not append unchecked")
    assert(spark.read.parquet(s"$quarantine/semdup").collect()
      .map(_.getAs[Long]("doc_id")).toSeq == Seq(4L))

    // shard 2 after restart: doc 10 paraphrases doc 1 (different text,
    // near-identical embedding) -> semdup quarantine; doc 11 shares
    // cluster 100 but is far in cosine -> appends; doc 12 is an EXACT
    // dup of doc 1's text -> the fp anti-join drops it
    writeLines(s"$watch/shard-2.jsonl", Seq(
      """{"doc_id": 10, "text": "alpha won here", "embedding": [0.99, 0.04]}""",
      """{"doc_id": 11, "text": "unrelated new content", "embedding": [0.6, -0.8]}""",
      """{"doc_id": 12, "text": "ALPHA  one", "embedding": [0.5, 0.5]}"""
    ), gzip = false)
    runOnce()
    spark.catalog.refreshTable(corpus.table)
    assert(spark.table(corpus.table).collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
      == Seq(1L, 2L, 11L),
      "paraphrase 10 and exact dup 12 must both be dropped; 11 must append")
    val sem = spark.read.parquet(s"$quarantine/semdup").collect()
    assert(sem.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(4L, 10L),
      "both paraphrases (within-batch 4, cross-batch 10) must be quarantined")
    // corpus rows carry their cluster (partition column) and norm
    assert(spark.table(corpus.table).filter(col("doc_id") === 11L)
      .head.getAs[Long]("cluster") == 100L)

    // batch/streaming agreement: the SAME incoming rows through the
    // batch-side helpers (shared code: electKeepers -> assignToCentroids
    // -> semanticSplit) must make identical keep/quarantine decisions
    import spark.implicits._
    val incoming = Seq(
      (10L, "alpha won here", Seq(0.99, 0.04)),
      (11L, "unrelated new content", Seq(0.6, -0.8))
    ).toDF("doc_id", "text", "embedding")
    val centDf = gate.centroids.toDF("cid", "cemb", "cnrm")
    val enriched = graft.queries.SimilarityQueries.assignToCentroids(
      CorpusIngest.electKeepers(incoming)
        .withColumn("nrm", graft.functions.VectorOps.normD(col("embedding"))),
      centDf).drop("ccos")
    val standing = spark.table(corpus.table)
      .filter(col("doc_id").isin(1L, 2L)) // the standing set shard 2 saw
      .select(col("cluster").as("s_cluster"),
        col("embedding").as("s_emb"), col("nrm").as("s_nrm"))
    val (fresh, dup) = CorpusIngest.semanticSplit(enriched, standing, gate.threshold)
    assert(fresh.collect().map(_.getAs[Long]("doc_id")).toSeq == Seq(11L))
    assert(dup.collect().map(_.getAs[Long]("doc_id")).toSeq == Seq(10L))

    // maintenance: compaction keeps the cluster partitioning and loses
    // nothing (the corpus here is partitioned by cluster AND bucketed)
    CorpusIngest.compact(spark, corpus, semantic = true)
    val compacted = spark.table(corpus.table).collect()
    assert(compacted.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L, 11L))
    assert(compacted.map(_.getAs[Long]("cluster")).sorted.toSeq == Seq(100L, 100L, 200L))
  }

  test("minhash ingest: reworded near-duplicates are quarantined by the text gate") {
    import graft.streaming.CorpusIngest
    import graft.streaming.CorpusIngest.{BucketedCorpus, MinHashGate}
    val base = java.nio.file.Files.createTempDirectory("graft_corpus_mh").toString
    val watch = s"$base/landing"; val quarantine = s"$base/quarantine"
    val ckpt = s"$base/ckpt"
    new java.io.File(watch).mkdirs()
    val corpus = BucketedCorpus(table = "corpus_minhash_test", buckets = 4)
    val gate = MinHashGate(minMatches = 8)

    // a 40-word document; variants swap ONE word (3 of 38 shingles
    // change, so ~11 of 12 MinHash components still agree — all
    // md5-deterministic, no flake)
    def doc(sub: Map[Int, String]): String =
      (1 to 40).map(i => sub.getOrElse(i, s"word$i")).mkString(" ")
    def line(id: Long, text: String) = s"""{"doc_id": $id, "text": "$text"}"""

    def runOnce(): Unit = {
      val (gq, bq) = CorpusIngest.startBucketed(spark, watch, docSchema, corpus,
        quarantine, ckpt, availableNow = true, minhash = Some(gate))
      gq.awaitTermination(); bq.awaitTermination()
    }

    // shard 1: the original, an unrelated doc, and a WITHIN-BATCH
    // near-dup (one word swapped — fresh fp, the exact gate passes it)
    writeLines(s"$watch/shard-1.jsonl", Seq(
      line(1, doc(Map.empty)),
      line(2, (1 to 12).map(i => s"unrelated$i").mkString(" ")),
      line(3, doc(Map(20 -> "swapped")))
    ), gzip = false)
    runOnce()
    assert(spark.table(corpus.table).collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
      == Seq(1L, 2L),
      "the within-batch reworded near-dup (doc 3) must not append")
    assert(spark.read.parquet(s"$quarantine/neardup").collect()
      .map(_.getAs[Long]("doc_id")).toSeq == Seq(3L))

    // shard 2 after a restart (sig Bloom reseeded from the sigs table):
    // another reword of the STANDING doc 1, plus a genuinely new doc
    writeLines(s"$watch/shard-2.jsonl", Seq(
      line(10, doc(Map(30 -> "different"))),
      line(11, (1 to 12).map(i => s"brandnew$i").mkString(" "))
    ), gzip = false)
    runOnce()
    spark.catalog.refreshTable(corpus.table)
    assert(spark.table(corpus.table).collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
      == Seq(1L, 2L, 11L),
      "the cross-batch reword (doc 10) must be dropped; doc 11 must append")
    assert(spark.read.parquet(s"$quarantine/neardup").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(3L, 10L))
    // the signature index tracks exactly the corpus survivors (4 band
    // rows per doc; doc 2 and 11 are 12 tokens -> 10 shingles, signed)
    spark.catalog.refreshTable(CorpusIngest.sigsTable(corpus))
    assert(spark.table(CorpusIngest.sigsTable(corpus))
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 2L, 11L))
  }

  test("combined gates: semantic and minhash compose, each quarantining its own modality") {
    import graft.streaming.CorpusIngest
    import graft.streaming.CorpusIngest.{BucketedCorpus, MinHashGate, SemanticGate}
    val base = java.nio.file.Files.createTempDirectory("graft_corpus_both").toString
    val watch = s"$base/landing"; val quarantine = s"$base/quarantine"
    val ckpt = s"$base/ckpt"
    new java.io.File(watch).mkdirs()
    val embSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("embedding", ArrayType(DoubleType))))
    val corpus = BucketedCorpus(table = "corpus_both_test", buckets = 4)
    val sem = SemanticGate(Seq(
      (100L, Seq(1.0, 0.0), 1.0),
      (200L, Seq(0.0, 1.0), 1.0)), threshold = 0.95)
    val mh = MinHashGate(minMatches = 8)

    def doc(sub: Map[Int, String]): String =
      (1 to 40).map(i => sub.getOrElse(i, s"word$i")).mkString(" ")
    def uniq(prefix: String): String = (1 to 12).map(i => s"$prefix$i").mkString(" ")
    def line(id: Long, text: String, emb: (Double, Double)) =
      s"""{"doc_id": $id, "text": "$text", "embedding": [${emb._1}, ${emb._2}]}"""

    def runOnce(): Unit = {
      val (gq, bq) = CorpusIngest.startBucketed(spark, watch, embSchema, corpus,
        quarantine, ckpt, availableNow = true,
        semantic = Some(sem), minhash = Some(mh))
      gq.awaitTermination(); bq.awaitTermination()
    }

    // one shard exercising both gates at once:
    //   1  — the original (cluster 100)
    //   5  — DIFFERENT text, near-identical embedding  -> semantic dup
    //   7  — reworded text, FAR embedding (cluster 200) -> minhash dup
    //   9  — unrelated text and far embedding           -> appends
    writeLines(s"$watch/shard-1.jsonl", Seq(
      line(1, doc(Map.empty), (1.0, 0.05)),
      line(5, uniq("othertok"), (0.99, 0.04)),
      line(7, doc(Map(20 -> "swapped")), (0.05, 1.0)),
      line(9, uniq("elsewords"), (-0.7, 0.7))
    ), gzip = false)
    runOnce()
    assert(spark.table(corpus.table).collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
      == Seq(1L, 9L))
    assert(spark.read.parquet(s"$quarantine/semdup").collect()
      .map(_.getAs[Long]("doc_id")).toSeq == Seq(5L))
    assert(spark.read.parquet(s"$quarantine/neardup").collect()
      .map(_.getAs[Long]("doc_id")).toSeq == Seq(7L))

    // cross-batch after a restart: each gate again catches its modality
    writeLines(s"$watch/shard-2.jsonl", Seq(
      line(20, uniq("freshtok"), (-0.72, 0.69)),      // emb-paraphrase of 9
      line(21, doc(Map(30 -> "different")), (0.9, -0.4)), // text-reword of 1
      line(22, uniq("brandnewt"), (0.5, -0.85))       // genuinely new
    ), gzip = false)
    runOnce()
    // read through a FRESH session (shared catalog, fresh metadata
    // caches): this long-lived test session's cached listing for the
    // partitioned table can stay stale even after refreshTable when the
    // appends happen in the stream's cloned session — a fresh session
    // is also how a real downstream consumer reads an actively-appended
    // table
    val reader = spark.newSession()
    assert(reader.table(corpus.table).collect().map(_.getAs[Long]("doc_id")).sorted.toSeq
      == Seq(1L, 9L, 22L))
    assert(spark.read.parquet(s"$quarantine/semdup").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(5L, 20L))
    assert(spark.read.parquet(s"$quarantine/neardup").collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(7L, 21L))
    // the signature index tracks exactly the corpus survivors
    assert(reader.table(CorpusIngest.sigsTable(corpus))
      .select("doc_id").distinct().collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 9L, 22L))
  }

  test("semantic gate agrees with batch semantic_neardup on the real embeddings fixture") {
    import graft.queries.SimilarityQueries
    import graft.streaming.CorpusIngest
    import graft.streaming.CorpusIngest.{BucketedCorpus, SemanticGate}
    val dir = "/root/testdata/sf0.001"
    // freeze the SAME trained index the oracle-green batch query uses
    val gate = SemanticGate.fromFrame(
      SimilarityQueries.kmeansCentroids(spark, dir, rounds = 2), threshold = 0.3)
    // batch ground truth: a doc is a within-corpus near-dup iff it is
    // the LARGER id of some semantic_neardup pair (the gate's
    // smaller-id-keeper rule over one batch is exactly that set)
    val expectedDrops = SimilarityQueries.semanticNearDup(spark, dir)
      .collect().map(_.getAs[Long]("vb")).toSet
    val allIds = spark.read.parquet(s"$dir/embeddings.parquet")
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(expectedDrops.nonEmpty && expectedDrops.size < allIds.size,
      "fixture must exercise both outcomes")

    // stream the SAME 500 vectors (exact float->double widening) as one
    // JSONL shard through the gated ingest
    val base = java.nio.file.Files.createTempDirectory("graft_corpus_agree").toString
    val watch = s"$base/landing"; new java.io.File(watch).mkdirs()
    val lines = spark.read.parquet(s"$dir/embeddings.parquet").collect().map { r =>
      val id = r.getAs[Long]("vec_id")
      val emb = r.getSeq[Float](1).map(_.toDouble.toString).mkString(",")
      s"""{"doc_id": $id, "text": "vector number $id", "embedding": [$emb]}"""
    }
    writeLines(s"$watch/shard.jsonl", lines.toIndexedSeq, gzip = false)
    val embSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("embedding", ArrayType(DoubleType))))
    val corpus = BucketedCorpus(table = "corpus_agree_test", buckets = 4)
    val (gq, bq) = CorpusIngest.startBucketed(spark, watch, embSchema, corpus,
      s"$base/quarantine", s"$base/ckpt", availableNow = true, semantic = Some(gate))
    gq.awaitTermination(); bq.awaitTermination()

    val appended = spark.table(corpus.table).collect().map(_.getAs[Long]("doc_id")).toSet
    val quarantined = spark.read.parquet(s"$base/quarantine/semdup")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(quarantined == expectedDrops,
      s"gate drops must equal the batch pairs' larger ids; extra=${quarantined -- expectedDrops} missing=${expectedDrops -- quarantined}")
    assert(appended == allIds -- expectedDrops)
  }

  test("compact runs the retention sweep on the maintenance cadence") {
    import graft.streaming.CorpusIngest
    import graft.streaming.CorpusIngest.BucketedCorpus
    import graft.sources.Layout
    val base = java.nio.file.Files.createTempDirectory("graft_compact_retention").toString
    val watch = s"$base/landing"
    new java.io.File(watch).mkdirs()
    val corpus = BucketedCorpus(table = "corpus_retention_test", buckets = 4)
    writeLines(s"$watch/shard-1.jsonl", Seq(
      """{"doc_id": 1, "text": "retained corpus content", "lang": "en"}"""
    ), gzip = false)
    val (gq, bq) = CorpusIngest.startBucketed(spark, watch, docSchema, corpus,
      s"$base/quarantine", s"$base/ckpt", availableNow = true)
    gq.awaitTermination(); bq.awaitTermination()
    // a companion date-partitioned time-series sink with one stale day
    val today = java.time.LocalDate.of(2026, 8, 14)
    val sinkData = s"$base/sink/data"
    Seq(today.minusDays(30), today).foreach { d =>
      new java.io.File(s"$sinkData/event_date=$d").mkdirs()
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$sinkData/event_date=$d/part-0.parquet"), "x")
    }
    CorpusIngest.compact(spark, corpus,
      retention = Some(Layout.RetentionPolicy(sinkData, keepDays = 7, today = today)))
    // the corpus survived compaction AND the stale partition is gone
    spark.catalog.refreshTable(corpus.table)
    assert(spark.table(corpus.table).count() == 1)
    val dirs = new java.io.File(sinkData).listFiles.map(_.getName).toSet
    assert(dirs == Set(s"event_date=$today"),
      s"compact must expire the out-of-TTL day, got $dirs")
  }

  test("oversized micro-batch fails loudly at the driver-collect guard, naming the knob") {
    import graft.streaming.CorpusIngest
    import graft.streaming.CorpusIngest.BucketedCorpus
    val base = java.nio.file.Files.createTempDirectory("graft_corpus_guard").toString
    val watch = s"$base/landing"
    new java.io.File(watch).mkdirs()
    // budget of 2 keys; a 3-doc shard (all distinct texts) must trip it
    val corpus = BucketedCorpus(table = "corpus_guard_test", buckets = 4,
      maxBatchKeys = 2)
    writeLines(s"$watch/shard-1.jsonl", Seq(
      """{"doc_id": 1, "text": "first document body", "lang": "en"}""",
      """{"doc_id": 2, "text": "second document body", "lang": "en"}""",
      """{"doc_id": 3, "text": "third document body", "lang": "en"}"""
    ), gzip = false)
    val (gq, bq) = CorpusIngest.startBucketed(spark, watch, docSchema, corpus,
      s"$base/quarantine", s"$base/ckpt", availableNow = true)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      gq.awaitTermination()
    }
    bq.awaitTermination()
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(e).mkString("\n")
    assert(all.contains("maxBatchKeys=2") && all.contains("maxFilesPerTrigger"),
      s"guard must fail loudly naming the admission knob, got:\n$all")
    // nothing appended: the guard fires BEFORE any corpus write
    assert(!spark.catalog.tableExists(corpus.table) ||
      spark.table(corpus.table).count() == 0)

    // the normal path is unchanged: a within-budget batch still ingests
    val base2 = java.nio.file.Files.createTempDirectory("graft_corpus_guard_ok").toString
    val watch2 = s"$base2/landing"
    new java.io.File(watch2).mkdirs()
    val corpus2 = BucketedCorpus(table = "corpus_guard_ok_test", buckets = 4,
      maxBatchKeys = 2)
    writeLines(s"$watch2/shard-1.jsonl", Seq(
      """{"doc_id": 1, "text": "first document body", "lang": "en"}""",
      """{"doc_id": 2, "text": "second document body", "lang": "en"}"""
    ), gzip = false)
    val (gq2, bq2) = CorpusIngest.startBucketed(spark, watch2, docSchema, corpus2,
      s"$base2/quarantine", s"$base2/ckpt", availableNow = true)
    gq2.awaitTermination(); bq2.awaitTermination()
    assert(spark.table(corpus2.table).count() == 2)
  }

  test("csv: malformed rows dead-letter instead of killing the job or vanishing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    writeLines(s"$dir/part-0.csv", Seq(
      "1,hello,en",
      "oops,not a long,es",
      "3,ok,fr"
    ), gzip = false)
    val (good, bad) = Ingest.readCsv(spark, dir, docSchema)
    assert(good.collect().map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 3L))
    val b = bad.collect().map(_.getAs[String]("raw_line"))
    assert(b.length == 1 && b.head.contains("oops"))
  }

  test("retire ledger: latest event wins; a same-instant retire/un-retire tie resolves to retire") {
    import graft.streaming.CorpusIngest
    import graft.streaming.CorpusIngest.BucketedCorpus
    import spark.implicits._
    val corpus = BucketedCorpus(table = "corpus_ledger_test", buckets = 2)
    spark.sql(s"DROP TABLE IF EXISTS ${corpus.table}_retired")
    val t0 = java.sql.Timestamp.valueOf("2026-08-15 10:00:00")
    val t1 = java.sql.Timestamp.valueOf("2026-08-15 11:00:00")
    Seq(
      (1L, t0, true),  // retired at t0 ...
      (1L, t1, false), // ... un-retired later: NOT pending
      (2L, t0, false), // un-retire then ...
      (2L, t1, true),  // ... retired later: pending
      (3L, t0, true),  // same-instant pair: the tie must resolve to the
      (3L, t0, false)  // safe direction (retire) — boolean true > false
    ).toDF("doc_id", "ts", "retire")
      .write.mode("overwrite").saveAsTable(s"${corpus.table}_retired")
    val pending = CorpusIngest.retiredIds(spark, corpus).get
      .collect().map(_.getLong(0)).toSet
    assert(pending == Set(2L, 3L),
      s"expected latest-event-wins with retire-on-tie, got $pending")
    spark.sql(s"DROP TABLE IF EXISTS ${corpus.table}_retired")
  }

  test("appender refuses to run while a sigs-table maintenance swap is in flight") {
    import graft.streaming.CorpusIngest
    import graft.streaming.CorpusIngest.BucketedCorpus
    val base = java.nio.file.Files.createTempDirectory("graft_sigs_guard").toString
    val watch = s"$base/landing"
    new java.io.File(watch).mkdirs()
    val corpus = BucketedCorpus(table = "corpus_sigsguard_test", buckets = 4)
    Seq(corpus.table, s"${corpus.table}_sigs", s"${corpus.table}_sigs_compact_tmp")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // a compact tmp for the SIGS side table exists (swap mid-flight or
    // crashed): an appending batch must fail LOUDLY — committing now
    // could recreate the dropped sigs table mid-swap and strand the
    // standing signatures under the tmp name
    spark.range(0, 1).toDF("doc_id").write
      .saveAsTable(s"${corpus.table}_sigs_compact_tmp")
    writeLines(s"$watch/shard-1.jsonl", Seq(
      """{"doc_id": 1, "text": "some body", "lang": "en"}"""), gzip = false)
    val (gq, bq) = CorpusIngest.startBucketed(spark, watch, docSchema, corpus,
      s"$base/quarantine", s"$base/ckpt", availableNow = true)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      gq.awaitTermination()
    }
    bq.awaitTermination()
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(e).mkString("\n")
    assert(all.contains("maintenance swap in progress") &&
      all.contains(s"${corpus.table}_sigs_compact_tmp"), s"got:\n$all")
    // nothing appended
    assert(!spark.catalog.tableExists(corpus.table) ||
      spark.table(corpus.table).count() == 0)
    spark.sql(s"DROP TABLE IF EXISTS ${corpus.table}_sigs_compact_tmp")
  }

  test("streaming curation twin: single-drop manifest == batch curation_manifest; " +
      "standing fps gate the next batch") {
    import graft.streaming.CurateStream
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("graft_curate_stream").toString
    val watch = s"$base/landing"; val out = s"$base/out"
    new java.io.File(watch).mkdirs()
    val docs = graft.sources.Tables.documents(spark, dir)
    // the whole fixture as ONE JSONL shard (write.json escapes text
    // losslessly; one part file = one micro-batch)
    docs.coalesce(1).write.json(s"$base/jsonl")
    val part = new java.io.File(s"$base/jsonl").listFiles
      .find(_.getName.endsWith(".json")).get
    java.nio.file.Files.copy(part.toPath,
      java.nio.file.Paths.get(s"$watch/shard-1.jsonl"))
    val (gq, bq) = CurateStream.start(spark, watch, docs.schema, out,
      s"$base/ckpt", availableNow = false)
    try {
      gq.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("stage_ord"), r.getAs[String]("stage"),
          r.getAs[Long]("n_in"), r.getAs[Long]("n_out"),
          r.getAs[Long]("tokens_in"), r.getAs[Long]("tokens_out"))
      // summed streaming manifest == the batch pipeline's manifest,
      // column for column — the stages are the SAME functions
      val streamed = spark.read.parquet(s"$out/manifest")
        .groupBy(col("stage_ord"), col("stage"))
        .agg(sum("n_in").as("n_in"), sum("n_out").as("n_out"),
          sum("tokens_in").as("tokens_in"), sum("tokens_out").as("tokens_out"))
        .collect().map(key).toSet
      val batch = graft.queries.CurationQueries.curationManifest(spark, dir)
        .collect().map(key).toSet
      assert(streamed == batch,
        s"streamed=$streamed\nbatch=$batch")
      // and the curated rows agree with the batch curated corpus
      val streamedDocs = spark.read.parquet(s"$out/curated")
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val batchDocs = graft.queries.CurationQueries.curatedCorpus(spark, dir)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(streamedDocs == batchDocs)

      // batch 2: a curated doc's TEXT re-arrives under a fresh id — the
      // standing-fp serve-around must fail it at the exact-dedup stage
      val dupText = docs.filter(col("doc_id").isin(streamedDocs.toSeq.map(Long.box): _*))
        .orderBy(col("doc_id")).limit(1).collect()(0)
      docs.filter(col("doc_id") === dupText.getAs[Long]("doc_id"))
        .withColumn("doc_id", lit(999999L))
        .coalesce(1).write.json(s"$base/jsonl2")
      val part2 = new java.io.File(s"$base/jsonl2").listFiles
        .find(_.getName.endsWith(".json")).get
      java.nio.file.Files.copy(part2.toPath,
        java.nio.file.Paths.get(s"$watch/shard-2.jsonl"))
      gq.processAllAvailable()
      val m2 = spark.read.parquet(s"$out/manifest")
        .filter(col("batch_id") === 1L)
        .collect().map(r => r.getAs[String]("stage") ->
          (r.getAs[Long]("n_in"), r.getAs[Long]("n_out"))).toMap
      assert(m2("quality") == ((1L, 1L)),
        s"the re-arrived doc passes quality again, got $m2")
      assert(m2("exact_dedup")._2 == 0L,
        s"standing fp must fail the duplicate at exact dedup, got $m2")
      assert(spark.read.parquet(s"$out/curated")
        .filter(col("batch_id") === 1L).count() == 0)
    } finally { gq.stop(); bq.stop() }
  }

  test("curate stream redelivery: the same batch delivered twice under the same id " +
      "overwrites its own partitions — identical standing manifest and curated rows") {
    import graft.streaming.CurateStream
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft_curate_replay").toString
    val docs = graft.sources.Tables.documents(spark, dir)
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    CurateStream.curateBatch(spark, b0, 0L, out)
    CurateStream.curateBatch(spark, b1, 1L, out)
    def manifestRows = CurateStream.readManifest(spark, out).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("stage_ord"),
        r.getAs[String]("stage"), r.getAs[Long]("n_in"), r.getAs[Long]("n_out"),
        r.getAs[Long]("tokens_in"), r.getAs[Long]("tokens_out"))).toSeq.sorted
    def curatedRows = CurateStream.readCurated(spark, out).collect()
      .map(r => (r.getAs[Long]("batch_id"), r.getAs[Long]("doc_id"))).toSeq.sorted
    val m1 = manifestRows
    val c1 = curatedRows
    assert(c1.count(_._1 == 1L) > 0, "batch 1 must have survivors before the replay")
    // REDELIVERY: foreachBatch re-runs batch 1 after a crash between
    // the writes and the checkpoint commit. The standing-fp probe must
    // NOT serve batch 1 around its own first attempt (which would
    // record a zero-survivor manifest), and the overwrite must not
    // double any row — the standing output is byte-for-byte the same.
    CurateStream.curateBatch(spark, b1, 1L, out)
    assert(manifestRows == m1, "replayed batch changed the standing manifest")
    assert(curatedRows == c1, "replayed batch changed the standing curated rows")
  }

  /** (name -> md5) of every data file under a managed table's location
    * — the byte-identity probe for O(takedown) retire. */
  private def tableFileHashes(table: String): Map[String, String] = {
    val loc = new java.io.File(java.net.URI.create(
      spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table)).location.toString))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
      else if (f.getName.startsWith("part-")) Seq(f) else Nil
    walk(loc).map { f =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(java.nio.file.Files.readAllBytes(f.toPath))
      f.getName -> md.map("%02x".format(_)).mkString
    }.toMap
  }

  test("corpus takedown: O(takedown) tombstone — standing files byte-identical, " +
      "immediate serve-around, re-ingest past a warm Bloom, compact purges") {
    import graft.streaming.CorpusIngest
    import graft.streaming.CorpusIngest.BucketedCorpus
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_retire_ing").toString
    val watch = s"$base/landing"; val quarantine = s"$base/quarantine"
    new java.io.File(watch).mkdirs()
    val corpus = BucketedCorpus(table = "corpus_retire_test", buckets = 4)
    Seq(corpus.table, s"${corpus.table}_retired")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    // ONE continuous stream session: the Bloom gate stays warm across
    // the takedown — the exact scenario the over-approximation contract
    // exists for
    val (gq, bq) = CorpusIngest.startBucketed(spark, watch, docSchema, corpus,
      quarantine, s"$base/ckpt", availableNow = false)
    try {
      writeLines(s"$watch/shard-1.jsonl", Seq(
        """{"doc_id": 1, "text": "taken down content", "lang": "en"}""",
        """{"doc_id": 2, "text": "innocent bystander", "lang": "en"}"""
      ), gzip = false)
      gq.processAllAvailable()
      spark.catalog.refreshTable(corpus.table)
      assert(spark.table(corpus.table).collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L))

      // takedown doc 1 while the stream (and its Bloom, which learned
      // doc 1's fp) keeps running — the tombstone write must not touch
      // ANY standing corpus file (that is the O(takedown) claim)
      val before = tableFileHashes(corpus.table)
      CorpusIngest.retireDocs(spark, corpus, Seq(1L).toDF("doc_id"))
      assert(tableFileHashes(corpus.table) == before,
        "retire must be a pure tombstone append: corpus files byte-identical")
      // immediate legal effect through the ACTIVE view; the physical
      // rows await the next compact
      assert(CorpusIngest.activeCorpus(spark, corpus).collect()
        .map(_.getAs[Long]("doc_id")).toSeq == Seq(2L),
        "activeCorpus must hide the retired doc immediately")
      assert(spark.table(corpus.table).count() == 2,
        "physical rows are compact's job, not retire's")

      // the SAME text re-ingests under a new id: the stale Bloom says
      // "maybe standing", the exact standing probe serves around the
      // tombstone and finds nothing, the doc LANDS — takedown never
      // poisons future ingestion of re-licensed content
      writeLines(s"$watch/shard-2.jsonl", Seq(
        """{"doc_id": 20, "text": "taken  DOWN content", "lang": "en"}""",
        """{"doc_id": 2, "text": "innocent bystander", "lang": "en"}"""
      ), gzip = false)
      gq.processAllAvailable()
      spark.catalog.refreshTable(corpus.table)
      assert(CorpusIngest.activeCorpus(spark, corpus).collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(2L, 20L),
        "re-ingest of retired content must land; the standing dup (doc 2) must not")
    } finally { gq.stop(); bq.stop() }

    // compact: the physical half — retired rows purged, ledger cleared,
    // bucketed layout preserved
    CorpusIngest.compact(spark, corpus)
    spark.catalog.refreshTable(corpus.table)
    assert(spark.table(corpus.table).collect()
      .map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(2L, 20L),
      "compact must physically remove the tombstoned rows")
    assert(!spark.catalog.tableExists(s"${corpus.table}_retired"),
      "compact must clear the tombstone ledger")
    val cat = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(corpus.table))
    assert(cat.bucketSpec.exists(b =>
      b.numBuckets == corpus.buckets && b.bucketColumnNames == Seq("fp")))
  }

  test("ledger self-compaction: pending set identical across compactLedger; " +
      "compact deletes only the events it consumed") {
    import graft.streaming.CorpusIngest
    import graft.streaming.CorpusIngest.BucketedCorpus
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_ledger_sc").toString
    val watch = s"$base/landing"; val quarantine = s"$base/quarantine"
    new java.io.File(watch).mkdirs()
    val corpus = BucketedCorpus(table = "corpus_ledger_sc_test", buckets = 4)
    Seq(corpus.table, s"${corpus.table}_retired")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val (gq, bq) = CorpusIngest.startBucketed(spark, watch, docSchema, corpus,
      quarantine, s"$base/ckpt", availableNow = false)
    try {
      writeLines(s"$watch/shard-1.jsonl", Seq(
        """{"doc_id": 1, "text": "ledger event subject one", "lang": "en"}""",
        """{"doc_id": 2, "text": "ledger event subject two", "lang": "en"}""",
        """{"doc_id": 3, "text": "ledger event subject three", "lang": "en"}"""
      ), gzip = false)
      gq.processAllAvailable()
      // a churny event history: 1 retired; 2 retired then un-retired
      // (same-id re-ingest appends the retire=false event); 1 retired
      // AGAIN after the churn — multiple rows per doc_id
      CorpusIngest.retireDocs(spark, corpus, Seq(1L, 2L).toDF("doc_id"))
      writeLines(s"$watch/shard-2.jsonl", Seq(
        """{"doc_id": 2, "text": "ledger event subject two prime", "lang": "en"}"""
      ), gzip = false)
      gq.processAllAvailable()
      CorpusIngest.retireDocs(spark, corpus, Seq(1L).toDF("doc_id"))
      def pendingIds = CorpusIngest.activeCorpus(spark, corpus).collect()
        .map(_.getAs[Long]("doc_id")).distinct.sorted.toSeq
      val rowsBefore = spark.table(s"${corpus.table}_retired").count()
      assert(rowsBefore >= 4, s"want a multi-event ledger, got $rowsBefore rows")
      val activeBefore = pendingIds
      // self-compaction: one resolved latest-state row per doc_id,
      // pending set (hence the active view) IDENTICAL
      assert(CorpusIngest.compactLedger(spark, corpus), "fenced swap must commit")
      spark.catalog.refreshTable(s"${corpus.table}_retired")
      val rowsAfter = spark.table(s"${corpus.table}_retired").count()
      assert(rowsAfter == 2L, // doc 1 (retired) + doc 2 (un-retired) latest rows
        s"latest-state rewrite: want 2 resolved rows, got $rowsAfter")
      assert(pendingIds == activeBefore,
        "ledger semantics must be identical across a self-compact")
    } finally { gq.stop(); bq.stop() }
    // compact consumes the CURRENT snapshot and deletes exactly those
    // events; a retire landing after (simulated post-compact here, the
    // interleaving the anti-join protects) must still be pending
    CorpusIngest.compact(spark, corpus)
    assert(!spark.catalog.tableExists(s"${corpus.table}_retired"),
      "all events consumed: the ledger table retires")
    spark.catalog.refreshTable(corpus.table)
    assert(spark.table(corpus.table).collect()
      .map(_.getAs[Long]("doc_id")).distinct.sorted.toSeq == Seq(2L, 3L),
      "compact purged the pending doc and kept the un-retired/innocent docs")
    // fresh retire AFTER the compact: nothing of it was consumed, so it
    // must stand in a fresh ledger and serve around immediately
    CorpusIngest.retireDocs(spark, corpus, Seq(3L).toDF("doc_id"))
    assert(CorpusIngest.activeCorpus(spark, corpus).collect()
      .map(_.getAs[Long]("doc_id")).distinct.sorted.toSeq == Seq(2L))
  }

  test("corpus takedown: same-doc_id re-ingest un-retires via the event ledger; " +
      "compact collapses the twin rows") {
    import graft.streaming.CorpusIngest
    import graft.streaming.CorpusIngest.BucketedCorpus
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_unretire").toString
    val watch = s"$base/landing"
    new java.io.File(watch).mkdirs()
    val corpus = BucketedCorpus(table = "corpus_unretire_test", buckets = 4)
    Seq(corpus.table, s"${corpus.table}_retired")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val (gq, bq) = CorpusIngest.startBucketed(spark, watch, docSchema, corpus,
      s"$base/quarantine", s"$base/ckpt", availableNow = false)
    try {
      writeLines(s"$watch/shard-1.jsonl", Seq(
        """{"doc_id": 1, "text": "first body", "lang": "en"}""",
        """{"doc_id": 2, "text": "second body", "lang": "en"}"""
      ), gzip = false)
      gq.processAllAvailable()
      CorpusIngest.retireDocs(spark, corpus, Seq(1L).toDF("doc_id"))
      assert(CorpusIngest.activeCorpus(spark, corpus).collect()
        .map(_.getAs[Long]("doc_id")).toSeq == Seq(2L))
      // the SAME doc (same id, same text) comes back: must land AND be
      // visible — the appender's un-retire event flips the ledger
      writeLines(s"$watch/shard-2.jsonl", Seq(
        """{"doc_id": 1, "text": "first body", "lang": "en"}"""
      ), gzip = false)
      gq.processAllAvailable()
      spark.catalog.refreshTable(corpus.table)
      // twin physical rows for doc 1 until compact — visible (the doc
      // is legally back), collapsed by the next compact
      assert(CorpusIngest.activeCorpus(spark, corpus).collect()
        .map(_.getAs[Long]("doc_id")).sorted.toSeq.distinct == Seq(1L, 2L),
        "same-id re-ingest must un-retire the doc")
      assert(spark.table(corpus.table).count() == 3)
    } finally { gq.stop(); bq.stop() }
    CorpusIngest.compact(spark, corpus)
    spark.catalog.refreshTable(corpus.table)
    val rows = spark.table(corpus.table).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).sorted.toSeq == Seq(1L, 2L),
      "compact must keep exactly one copy per fp and drop nothing live")
  }
}
