package graft

import graft.streaming.CorpusIngest
import graft.streaming.CorpusIngest.{BucketedCorpus, MinHashGate}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}

/** End-to-end throughput of the continuous corpus-ingest composition
  * (JSONL landing → quarantine split → keeper election → standing-corpus
  * dedup → append), measured as records/second for BOTH corpus layouts:
  *
  *   - `plain`: parquet directory; every wave's anti-join re-scans and
  *     re-shuffles the standing fp set
  *   - `bucketed`: fp-bucketed table + driver Bloom gate; the standing
  *     side never shuffles, and all-fresh waves skip standing I/O
  *     entirely
  *
  * Three phases per layout (see `scenario`):
  *
  *   - `fresh`: one wave of n all-new documents into an empty corpus —
  *     the bootstrap cost
  *   - `standing-fresh`: small all-new waves against the standing
  *     corpus — the Bloom skip path, the common case of a long-running
  *     ingest
  *   - `standing-dup`: small dup-bearing waves — the exact anti-join
  *     path, where the bucketed layout avoids the standing-side shuffle
  *
  *   java -cp ... graft.IngestBench [nRecords] [partitions]
  *
  * Prints one JSON line; BASELINE.md records the numbers.
  */
object IngestBench {

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  /** Deterministic ~30-word document; `key` controls dedup identity. */
  private def textOf(key: Long): String = {
    val r = new scala.util.Random(key)
    val words = Array("data", "model", "token", "layer", "graph", "query",
      "stream", "batch", "shard", "merge", "index", "score", "route", "cache")
    (0 until 28).map(_ => words(r.nextInt(words.length)))
      .mkString(s"doc $key ", " ", "")
  }

  private def writeShard(path: String, ids: Seq[Long], keyOf: Long => Long): Unit = {
    val w = new BufferedWriter(new OutputStreamWriter(
      new FileOutputStream(path), "UTF-8"))
    ids.foreach { i =>
      w.write(s"""{"doc_id": $i, "text": "${textOf(keyOf(i))}"}"""); w.newLine()
    }
    w.close()
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    // standing waves are n/40 docs each; below 40 they'd be empty and
    // the printed rps would be NaN/Infinity — a silent garbage record
    require(n >= 40, s"nRecords must be >= 40, got $n")
    val parts = args.lift(1).map(_.toInt).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$parts]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("ib-wh").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    /** One layout's full scenario; returns (freshSec, standingFreshSec,
      * standingDupSec). `runStream(watch, quarantine, ckpt,
      * sourceOptions)` drains the landing dir with AvailableNow and
      * blocks until done. Three phases:
      *   fresh          — n docs into an empty corpus, one micro-batch
      *   standing-fresh — 2 micro-batches of n/40 ALL-NEW docs against
      *                    the standing corpus (the Bloom skip path)
      *   standing-dup   — 2 micro-batches of n/40 docs, half duplicating
      *                    the corpus (the exact anti-join path)
      * Waves are deliberately SMALL relative to the corpus (1:40 — still
      * generous; a real continuous ingest is 1:10000+): the recurring
      * per-batch cost a layout is judged on is standing-side work, which
      * a batch-sized wave would mask.
      */
    // per-batch processing time (triggerExecution over non-empty
    // batches) from the query's progress log: excludes stream startup
    // and the bucketed layout's once-per-stream-LIFETIME Bloom seed —
    // the recurring per-batch cost is what a layout is judged on (the
    // wall clock of these short phases is dominated by per-run fixed
    // costs this bench pays once per phase but a real ingest pays once
    // per deploy)
    def batchSeconds(q: org.apache.spark.sql.streaming.StreamingQuery): Double =
      q.recentProgress.filter(_.numInputRows > 0)
        .map(_.durationMs.get("triggerExecution").toDouble).sum / 1e3

    def scenario(runStream: (String, String, String, Map[String, String]) =>
          org.apache.spark.sql.streaming.StreamingQuery)
        : (Double, Double, Double) = {
      val watch = java.nio.file.Files.createTempDirectory("ib-land").toString
      val ckpt = java.nio.file.Files.createTempDirectory("ib-ckpt").toString
      val quarantine = java.nio.file.Files.createTempDirectory("ib-q").toString
      (0 until 4).foreach { s =>
        writeShard(s"$watch/w0-$s.jsonl",
          (s * n / 4) until ((s + 1) * n / 4) map (_.toLong), identity)
      }
      val freshSec = batchSeconds(runStream(watch, quarantine, ckpt, Map.empty))

      (1 to 2).foreach { wave =>
        val ids = (0 until n / 40).map(i => (n + wave.toLong * n + i))
        writeShard(s"$watch/wf$wave.jsonl", ids, identity) // all-new keys
      }
      val standingFreshSec = batchSeconds(
        runStream(watch, quarantine, ckpt, Map("maxFilesPerTrigger" -> "1")))

      (1 to 2).foreach { wave =>
        val ids = (0 until n / 40).map(i => (10L * n + wave.toLong * n + i))
        writeShard(s"$watch/wd$wave.jsonl", ids,
          // even rows re-key to an original doc's text -> standing dup
          id => if (id % 2 == 0) (id % n) else id)
      }
      val standingDupSec = batchSeconds(
        runStream(watch, quarantine, ckpt, Map("maxFilesPerTrigger" -> "1")))
      (freshSec, standingFreshSec, standingDupSec)
    }

    def awaitBoth(qs: (org.apache.spark.sql.streaming.StreamingQuery,
                       org.apache.spark.sql.streaming.StreamingQuery))
        : org.apache.spark.sql.streaming.StreamingQuery = {
      qs._1.awaitTermination(); qs._2.awaitTermination(); qs._1
    }

    // warmup: burn one-time streaming/codegen/write-path init untimed —
    // PER COMPOSITION, against throwaway corpora, or the first timed
    // batch of each layout pays setup the others don't (the comparison
    // is the whole point of this bench)
    def warm(run: (String, String, String) => Unit): Unit = {
      val w = java.nio.file.Files.createTempDirectory("ib-warm").toString
      writeShard(s"$w/s.jsonl", (0L until 2000L), identity)
      val c = java.nio.file.Files.createTempDirectory("ib-warmout").toString
      run(w, c, s"$c/ckpt")
    }
    warm((w, c, k) => awaitBoth(CorpusIngest.start(
      spark, w, schema, s"$c/corpus", s"$c/q", k, availableNow = true)))
    spark.sql("DROP TABLE IF EXISTS ingest_warm")
    warm((w, c, k) => awaitBoth(CorpusIngest.startBucketed(
      spark, w, schema, BucketedCorpus("ingest_warm", buckets = parts),
      s"$c/q", k, availableNow = true)))
    spark.sql("DROP TABLE IF EXISTS ingest_warm_mh")
    spark.sql("DROP TABLE IF EXISTS ingest_warm_mh_sigs")
    warm((w, c, k) => awaitBoth(CorpusIngest.startBucketed(
      spark, w, schema, BucketedCorpus("ingest_warm_mh", buckets = parts),
      s"$c/q", k, availableNow = true, minhash = Some(MinHashGate()))))

    val plainCorpus = java.nio.file.Files.createTempDirectory("ib-plain").toString + "/corpus"
    val (plainFresh, plainSF, plainSD) = scenario { (watch, q, ckpt, opts) =>
      awaitBoth(CorpusIngest.start(spark, watch, schema, plainCorpus, q, ckpt,
        availableNow = true, sourceOptions = opts))
    }

    spark.sql("DROP TABLE IF EXISTS ingest_bench_corpus")
    val bc = BucketedCorpus("ingest_bench_corpus", buckets = parts,
      bloomExpectedItems = math.max(n * 4L, 1L << 20))
    val (buckFresh, buckSF, buckSD) = scenario { (watch, q, ckpt, opts) =>
      awaitBoth(CorpusIngest.startBucketed(spark, watch, schema, bc, q, ckpt,
        availableNow = true, sourceOptions = opts))
    }

    // bucketed + the streaming MinHash near-dup gate: same waves, plus
    // per-batch signature computation and the sig-table probe
    spark.sql("DROP TABLE IF EXISTS ingest_bench_mh")
    spark.sql("DROP TABLE IF EXISTS ingest_bench_mh_sigs")
    val mhCorpus = BucketedCorpus("ingest_bench_mh", buckets = parts,
      bloomExpectedItems = math.max(n * 4L, 1L << 20))
    val (mhFresh, mhSF, mhSD) = scenario { (watch, q, ckpt, opts) =>
      awaitBoth(CorpusIngest.startBucketed(spark, watch, schema, mhCorpus, q, ckpt,
        availableNow = true, minhash = Some(MinHashGate()), sourceOptions = opts))
    }

    // CDC upsert sink ([[graft.streaming.UpsertSink]]): bootstrap n
    // changelog rows into empty state, then the per-batch MERGE cost of
    // update waves against the standing state — once with keys
    // SCATTERED across every bucket (worst case: the COW model rewrites
    // all touched buckets, here all of them) and once LOCALIZED to a
    // single bucket (the partition-pruned best case the bucket layout
    // exists for). The spread between those two rows IS the cost model:
    // per-batch work = O(delta) + O(touched buckets), never O(state).
    import spark.implicits._
    val sr = 2 * (n / 40) // records per standing phase
    val upDir = java.nio.file.Files.createTempDirectory("ib-upsert").toString
    val sink = new graft.streaming.UpsertSink(s"$upDir/state",
      Seq("user_id", "event_type"), Seq("us", "event_id"), Seq("value"),
      nBuckets = parts)
    def changelog(ids: Seq[Long], usBase: Long) = ids.zipWithIndex.map { case (k, i) =>
      (k % (n / 4).toLong, s"t${k % 3}", usBase + i, usBase + i, (k % 1000) / 1000.0)
    }.toDF("user_id", "event_type", "us", "event_id", "value")
    def changelogOf(keys: Seq[(Long, String)], usBase: Long) =
      keys.zipWithIndex.map { case ((u, t), i) =>
        (u, t, usBase + i, usBase + i, (u % 1000) / 1000.0)
      }.toDF("user_id", "event_type", "us", "event_id", "value")
    // warm the write/merge path untimed on a throwaway sink
    locally {
      val w = new graft.streaming.UpsertSink(s"$upDir/warm",
        Seq("user_id", "event_type"), Seq("us", "event_id"), Seq("value"), parts)
      w.merge(changelog(0L until 2000L, 0L), 0L); w.merge(changelog(0L until 500L, 9000L), 1L)
    }
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val upBoot = timed(sink.merge(changelog(0L until n.toLong, 0L), 0L))
    val upScattered = timed((1 to 2).foreach { w =>
      sink.merge(changelog((0 until sr / 2).map(i => (i * 7919L) % n), n.toLong * w), w.toLong)
    })
    // localized wave: update KEYS (user, type pairs — the bucket hash
    // covers both) drawn from ONE bucket of the standing state
    val oneBucket = spark.read.parquet(s"$upDir/state")
      .filter(org.apache.spark.sql.functions.col("kb") === 0L)
      .select("user_id", "event_type").limit(sr / 2)
      .as[(Long, String)].collect().toSeq
    val upLocal = timed((3 to 4).foreach { w =>
      sink.merge(changelogOf(oneBucket, n.toLong * w), w.toLong)
    })
    // bucket 0 can hold fewer keys than limit(sr/2) asked for — the rps
    // denominator must be what the waves actually merged, not the ask
    val localRecs = 2 * oneBucket.size
    println(
      f"""{"metric":"ingest_throughput","records":$n,"plain":{"fresh_rps":${n / plainFresh}%.0f,"standing_fresh_rps":${sr / plainSF}%.0f,"standing_dup_rps":${sr / plainSD}%.0f,"seconds":[$plainFresh%.2f,$plainSF%.2f,$plainSD%.2f]},"bucketed":{"fresh_rps":${n / buckFresh}%.0f,"standing_fresh_rps":${sr / buckSF}%.0f,"standing_dup_rps":${sr / buckSD}%.0f,"seconds":[$buckFresh%.2f,$buckSF%.2f,$buckSD%.2f]},"bucketed_minhash":{"fresh_rps":${n / mhFresh}%.0f,"standing_fresh_rps":${sr / mhSF}%.0f,"standing_dup_rps":${sr / mhSD}%.0f,"seconds":[$mhFresh%.2f,$mhSF%.2f,$mhSD%.2f]},"upsert":{"bootstrap_rps":${n / upBoot}%.0f,"scattered_update_rps":${sr / upScattered}%.0f,"localized_update_rps":${localRecs / upLocal}%.0f,"seconds":[$upBoot%.2f,$upScattered%.2f,$upLocal%.2f]}}""")
    spark.stop()
  }
}
