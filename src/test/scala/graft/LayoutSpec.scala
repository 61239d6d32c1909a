package graft

import graft.sources.{Layout, Tables}

import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Storage-layout effects, asserted on physical plans: bucketed joins
  * drop the shuffle; date-partitioned reads prune directories. */
class LayoutSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without an exchange") {
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "orderkey")
    val o = Tables.orders(spark, dir).select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "orderkey")
    Layout.writeBucketed(li, "li_b", "orderkey", 8)
    Layout.writeBucketed(o, "o_b", "orderkey", 8)

    val joined = Layout.bucketedJoin(spark, "li_b", "o_b", "orderkey")
    val p = joined.queryExecution.executedPlan.treeString
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"))
    if (p.contains("SortMergeJoin")) {
      // the whole point: no shuffle on either side
      assert(!p.contains("Exchange hashpartitioning"))
      assert(p.contains("SelectedBucketsCount"))
    }
    // and it computes the right thing
    assert(joined.count() ==
      Tables.lineitem(spark, dir).join(
        Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey")).count())
  }

  test("bucketed compaction restores one file per bucket and elides the join Sort") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // a continuously-appended bucketed table: 3 appends -> 3 files/bucket
      def appendWave(table: String, offset: Int): Unit =
        spark.range(offset, offset + 3000).toDF("k")
          .repartition(4, col("k"))
          .write.bucketBy(4, "k").sortBy("k").mode("append").saveAsTable(table)
      Seq("comp_a", "comp_b").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        (0 until 3).foreach(w => appendWave(t, w * 3000))
      }
      assert(spark.table("comp_a").inputFiles.length > 4, "appends must accumulate files")

      // multi-file buckets: the scan yields no ordering, so the SMJ sorts
      val before = spark.table("comp_a").join(spark.table("comp_b"), "k")
        .queryExecution.executedPlan.treeString
      assert(before.contains("SortMergeJoin") && before.contains("Sort "), before)

      Seq("comp_a", "comp_b").foreach(t => Layout.rewriteBucketed(spark, t, "k", 4))

      assert(spark.table("comp_a").inputFiles.length == 4,
        "compaction must restore one file per bucket")
      val after = spark.table("comp_a").join(spark.table("comp_b"), "k")
        .queryExecution.executedPlan.treeString
      assert(after.contains("SortMergeJoin"), after)
      assert(!after.contains("Exchange hashpartitioning"),
        s"compacted bucketed join must not shuffle:\n$after")
      // single-file sorted buckets report their ordering (and so elide
      // the join Sort) under the legacy derivation conf — proving the
      // rewrite really produced fully-sorted bucket files
      val ord = "spark.sql.legacy.bucketedTableScan.outputOrdering"
      spark.conf.set(ord, "true")
      try {
        val sorted = spark.table("comp_a").join(spark.table("comp_b"), "k")
          .queryExecution.executedPlan.treeString
        assert(sorted.contains("SortMergeJoin") && !sorted.contains("Sort "),
          s"one sorted file per bucket must elide the join Sort:\n$sorted")
      } finally spark.conf.set(ord, "false")
      // and nothing was lost in the rewrite
      assert(spark.table("comp_a").count() == 9000)
      assert(spark.table("comp_a").join(spark.table("comp_b"), "k").count() == 9000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("rewriteBucketed: an append landing during the rewrite aborts the swap — no rows lost") {
    spark.sql("DROP TABLE IF EXISTS fence_t")
    spark.sql("DROP TABLE IF EXISTS fence_t_compact_tmp")
    spark.range(0, 1000).toDF("k").repartition(2, col("k"))
      .write.bucketBy(2, "k").sortBy("k").saveAsTable("fence_t")
    // simulate a concurrently-committing appender: rows land while the
    // rewrite is in its read phase (the transform hook runs exactly
    // there). Without the file-listing fence the swap would silently
    // drop these rows with their source offsets already committed.
    val e = intercept[IllegalStateException] {
      Layout.rewriteBucketed(spark, "fence_t", "k", 2, Nil, df => {
        spark.range(1000, 1100).toDF("k").repartition(2, col("k"))
          .write.mode("append").bucketBy(2, "k").sortBy("k")
          .saveAsTable("fence_t")
        df
      })
    }
    assert(e.getMessage.contains("concurrent append"), e.getMessage)
    // the table is untouched by the aborted swap: original AND appended
    // rows all present, tmp cleaned up
    assert(spark.table("fence_t").count() == 1100)
    assert(!spark.catalog.tableExists("fence_t_compact_tmp"))
    // a re-run with the appender quiesced completes normally
    Layout.rewriteBucketed(spark, "fence_t", "k", 2)
    assert(spark.table("fence_t").count() == 1100)
    assert(spark.table("fence_t").inputFiles.length == 2)
  }

  test("compaction re-run after a crash between DROP and RENAME recovers the data") {
    spark.sql("DROP TABLE IF EXISTS crash_t")
    spark.sql("DROP TABLE IF EXISTS crash_t_compact_tmp")
    spark.range(0, 1000).toDF("k").repartition(2, col("k"))
      .write.bucketBy(2, "k").sortBy("k").saveAsTable("crash_t")
    // simulate a compaction that died between its DROP TABLE and RENAME:
    // the sole copy of the data sits in the tmp table
    spark.sql("ALTER TABLE crash_t RENAME TO crash_t_compact_tmp")
    // the operator re-runs compaction to recover — this must complete
    // the interrupted swap, NOT drop the only copy
    Layout.rewriteBucketed(spark, "crash_t", "k", 2)
    assert(spark.table("crash_t").count() == 1000)
    assert(spark.table("crash_t").agg(sum(col("k"))).head.getLong(0) == 1000L * 999 / 2)
  }

  test("range-sorted writes produce disjoint per-file key ranges") {
    val out = Files.createTempDirectory("range").toString + "/events_ranged"
    Layout.writeRangeSorted(Tables.events(spark, dir), "ts", 4, out)
    // per-file min/max must not overlap across files
    val files = new java.io.File(out).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 2)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("ts")), max(col("ts"))).collect()(0)
      (r.getTimestamp(0).getTime, r.getTimestamp(1).getTime)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    // nothing lost in the rewrite
    assert(spark.read.parquet(out).count() == Tables.events(spark, dir).count())
  }

  test("z-ordered writes are narrow in BOTH dimensions; single-axis sort is not") {
    val base = Files.createTempDirectory("zorder").toString
    val ev = Tables.events(spark, dir).select(col("user_id"), col("value"))
    Layout.writeZOrdered(ev, "user_id", "value", 8, s"$base/z")
    Layout.writeRangeSorted(ev, "user_id", 8, s"$base/single")
    def meanSpread(path: String, c: String, globalSpread: Double): Double = {
      val files = new java.io.File(path).listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length >= 4)
      files.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(c)).cast("double"), max(col(c)).cast("double")).collect()(0)
        (r.getDouble(1) - r.getDouble(0)) / globalSpread
      }.sum / files.length
    }
    val g = ev.agg(
      (max(col("user_id")) - min(col("user_id"))).cast("double"),
      (max(col("value")) - min(col("value"))).cast("double")).collect()(0)
    // z-order: per-file spread well below the full domain on BOTH columns
    val zU = meanSpread(s"$base/z", "user_id", g.getDouble(0))
    val zV = meanSpread(s"$base/z", "value", g.getDouble(1))
    assert(zU < 0.7 && zV < 0.7, f"z files must be 2-D narrow: user=$zU%.2f value=$zV%.2f")
    // single-axis sort leaves the second column unclustered: its per-file
    // spread must be materially wider than the z-ordered layout's (an
    // absolute ~domain-width bound is too flaky — the global spread is
    // set by rare extremes a 1/8th-size file often misses)
    val sV = meanSpread(s"$base/single", "value", g.getDouble(1))
    assert(zV + 0.1 < sV,
      f"z-order must beat single-axis sort on the second dimension: z=$zV%.2f single=$sV%.2f")
    // nothing lost in the rewrite
    assert(spark.read.parquet(s"$base/z").count() == ev.count())
  }

  test("date-partitioned writes give PartitionFilters on range reads") {
    val out = Files.createTempDirectory("part").toString + "/events_by_date"
    Layout.writeDatePartitioned(Tables.events(spark, dir), "ts", out)
    val read = spark.read.parquet(out)
      .filter(col("event_date") === "2024-01-03")
    val p = read.queryExecution.executedPlan.treeString
    val scanLine = p.linesIterator.find(_.contains("PartitionFilters")).get
    assert(scanLine.contains("event_date"))
    // pruned read matches a full-scan filter
    val full = spark.read.parquet(out)
    assert(read.count() == full.filter(col("event_date") === "2024-01-03").count())
    assert(read.count() > 0)
  }

  test("compaction rewrites a small-files mess into the computed file count, losslessly") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val in = s"$base/in"
    val out = s"$base/out"
    // 64 tiny files
    spark.range(0, 6400).toDF("id").repartition(64)
      .write.mode("overwrite").parquet(in)
    val nIn = spark.read.parquet(in).inputFiles.length
    assert(nIn == 64)
    val sumBytes = spark.read.parquet(in).inputFiles.map(f =>
      new java.io.File(new java.net.URI(f)).length).sum
    val target = math.max(1L, sumBytes / 4) // expect ~4-5 output files
    val n = sources.Layout.compactFiles(spark, in, out, target)
    // recompute the sizing math INDEPENDENTLY — compactFiles returns a
    // re-listing of its own output, so comparing only against n would be
    // a tautology
    val expected = math.max(1, math.ceil(sumBytes.toDouble / target).toInt)
    val outFiles = spark.read.parquet(out).inputFiles.length
    assert(n == expected && outFiles == expected && n < nIn,
      s"expected $expected compacted files (from $nIn), got n=$n, listed $outFiles")
    // lossless: same ids in, same ids out
    assert(spark.read.parquet(out).agg(sum(col("id"))).head.getLong(0)
      == 6400L * 6399 / 2)
    assert(spark.read.parquet(out).count() == 6400)
  }

  test("compaction of a no-data-files directory fails loudly, naming the path") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_empty").toString
    val in = s"$base/in"
    val out = s"$base/out"
    // what a sink directory looks like before its first commit: markers
    // but no data files — previously surfaced as Spark's bare
    // UNABLE_TO_INFER_SCHEMA (or files.head's NoSuchElementException)
    spark.range(0, 10).toDF("id").filter(lit(false))
      .write.mode("overwrite").parquet(in)
    new java.io.File(in).listFiles.filter(_.getName.endsWith(".parquet"))
      .foreach(f => assert(f.delete()))
    val e = intercept[IllegalArgumentException] {
      sources.Layout.compactFiles(spark, in, out)
    }
    assert(e.getMessage.contains(in))
  }

  test("compaction of a zero-row (schema-only) table is a no-op that still writes a table") {
    val base = java.nio.file.Files.createTempDirectory("graft_compact_zero").toString
    val in = s"$base/in"
    val out = s"$base/out"
    spark.range(0, 10).toDF("id").filter(lit(false))
      .write.mode("overwrite").parquet(in) // one schema-only part file
    val n = sources.Layout.compactFiles(spark, in, out)
    assert(n == 1 && spark.read.parquet(out).count() == 0)
  }

  test("retention sweep expires only out-of-TTL partitions; survivors byte-identical; idempotent") {
    import graft.config.AppConfig
    import graft.sink.Sinks
    val base = Files.createTempDirectory("graft_retention").toString
    val today = java.time.LocalDate.of(2026, 8, 14)
    def ms(off: Long): Long = today.plusDays(off)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    // four days of points: -9 and -7 are past a 7-day TTL (keep window is
    // today-6 .. today inclusive), -2 and 0 are in retention
    import spark.implicits._
    val pts = Seq(-9L, -7L, -2L, 0L).flatMap(off =>
      Seq((ms(off), "DOUBLE", "1.5"), (ms(off) + 1000, "BIGINT", "7")))
      .toDF("time", "measure_value_type", "measure_value")
    new Sinks.ParquetTableSink(base, datePartitioned = true).write(pts, 0L)
    val dataDir = new java.io.File(s"$base/data")
    def partDirs(): Set[String] = dataDir.listFiles.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
      .map(_.getName).toSet
    assert(partDirs().size == 4)
    // a partition value that does not parse as a date must be KEPT
    val odd = new java.io.File(dataDir, "event_date=notadate")
    assert(odd.mkdir())
    // fingerprint every surviving file before the sweep
    def fileBytes(d: java.io.File): Map[String, Seq[Byte]] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(d).map(f => f.getPath -> Files.readAllBytes(f.toPath).toSeq).toMap
    }
    val keepDirs = Seq(-2L, 0L).map(o => s"event_date=${today.plusDays(o)}")
    val before = keepDirs.map(n => n -> fileBytes(new java.io.File(dataDir, n))).toMap
    val dropped = Sinks.DdlInitializer.enforceRetention(
      spark, base, AppConfig(magneticStoreRetentionDays = 7L), today)
    assert(dropped == Seq(-9L, -7L).map(o => today.plusDays(o).toString),
      s"expected the two out-of-TTL days dropped, got $dropped")
    assert(partDirs() == keepDirs.toSet + "event_date=notadate")
    // expiry is a directory delete, never a rewrite: surviving files are
    // byte-identical
    keepDirs.foreach { n =>
      assert(fileBytes(new java.io.File(dataDir, n)) == before(n),
        s"in-retention partition $n was modified by the sweep")
    }
    // re-run finds nothing — idempotent
    assert(Sinks.DdlInitializer.enforceRetention(
      spark, base, AppConfig(magneticStoreRetentionDays = 7L), today).isEmpty)
    // and the table still reads: 4 in-retention rows across 2 days
    val left = spark.read.parquet(s"$base/data")
    assert(left.count() == 4)
    assert(left.select("event_date").distinct().count() == 2)
  }
}
