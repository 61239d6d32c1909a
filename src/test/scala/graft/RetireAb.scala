package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B for VERDICT-r16 item 7 — compact-after-retire economics: after a
  * facet-scoped takedown leaves T tombstones, every serve pays a
  * broadcast anti-join over T ids until a compact. Measure, at the
  * largest local scale (the sf1-equivalent fixtures when present), the
  * per-serve tombstone penalty at small / corpus-scale / half-corpus
  * masses, and the one-time compact cost — the evidence for whether an
  * AUTO compact-after-retire gate earns its keep or ships default-off
  * with the override (the PruneAutoRows honesty protocol).
  *
  * Run: sbt 'Test/runMain graft.RetireAb' (ideally on a quiet box);
  * record the TIME lines in bench_records/.
  */
object RetireAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val q = graft.queries.SimilarityQueries
    val dir = {
      val sf1 = "/tmp/testdata_sf1"
      if (new java.io.File(s"$sf1/embeddings.parquet").exists) sf1
      else "/root/testdata/sf0.1"
    }
    println(s"FIXTURE $dir")
    val base = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).collect()
    val n = base.length
    // a 20k-query serve batch cycling the corpus vectors — the serving
    // load the tombstone anti-join taxes
    val batch = spark.createDataset(
      (0 until 20000).map(i => (1000000L + i, base(i % n).getSeq[Float](1))))
      .toDF("vec_id", "embedding").cache()
    batch.count()

    def timedMin(tag: String, reps: Int = 3)(f: => Long): Double = {
      f // warm
      val secs = (1 to reps).map { _ =>
        val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9
      }
      println(f"TIME $tag ${secs.min}%.3f (all ${secs.map(s => f"$s%.3f").mkString(",")})")
      secs.min
    }

    // tombstone masses: ~1% (an id-batch takedown), ~5% (one source —
    // the licensing shape), 25% and 50% (catastrophic retires)
    for (pct <- Seq(1, 5, 25, 50)) {
      val idx = java.nio.file.Files.createTempDirectory(s"retire_ab_$pct").toString
      q.buildIvfIndex(spark, dir, idx)
      val centRow = q.loadCentRow(spark, idx).cache(); centRow.count()
      val cut = math.max(1, (n.toLong * pct / 100).toInt)
      val ids = base.take(cut).map(_.getLong(0)).toSeq
      q.ivfIndexDelete(spark, idx, ids.toDF("vec_id"))
      timedMin(s"serve_tombstoned_pct$pct") {
        q.serveQueryBatch(spark, batch, centRow, idx,
          tombstoneAware = true).count()
      }
      val t0 = System.nanoTime
      q.ivfIndexCompact(spark, idx)
      println(f"TIME compact_pct$pct ${(System.nanoTime - t0) / 1e9}%.3f")
      timedMin(s"serve_compacted_pct$pct") {
        q.serveQueryBatch(spark, batch, centRow, idx,
          tombstoneAware = true).count()
      }
      centRow.unpersist()
    }
    spark.stop()
  }
}
