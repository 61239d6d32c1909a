package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators for the 100 TB path: bucketing (co-located,
  * exchange-free joins on the bucket key) and date-partitioned writes
  * (partition pruning at the scan).
  *
  * At 100 TB the biggest shuffle in the engine is lineitem⋈orders on the
  * order key; bucketing both sides by that key at write time removes the
  * exchange from EVERY downstream join. Likewise event data written
  * `PARTITION BY (event_date)` turns time-range filters into directory
  * pruning instead of a full scan. LayoutSpec asserts both effects on the
  * physical plan.
  */
object Layout {

  /** Write a DataFrame as a managed bucketed table (sorted within
    * buckets) — the layout that makes `key`-equijoins exchange-free. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int
  ): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: with matching
    * bucket counts Spark plans a SortMergeJoin with NO Exchange on either
    * side. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Write events date-partitioned; range predicates on the partition
    * column become PartitionFilters (directory pruning). */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .write
      .partitionBy("event_date")
      .mode("overwrite")
      .parquet(path)

  /** Range-partitioned, within-file-sorted write: each output file covers
    * a disjoint key range (repartitionByRange samples split points), so
    * min/max footer stats make range scans skip whole files — the sorted
    * layout a time-series table wants at rest. */
  def writeRangeSorted(df: DataFrame, keyCol: String, partitions: Int, path: String): Unit =
    df.repartitionByRange(partitions, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .write
      .mode("overwrite")
      .parquet(path)

  /** 2-D Z-order (Morton) value over two 16-bit bucket columns: bit i of
    * each input lands at bits 2i / 2i+1 of the z-value, so rows close in
    * z are close in BOTH dimensions. Pure integer column arithmetic —
    * codegen'd, no UDF. */
  def zValue16(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // interleave in LONG arithmetic: bit 31 of an int z-value would be
    // the sign bit, breaking sort monotonicity
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until 16).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Compact a small-files directory into ~`targetFileBytes` parquet
    * files. The chronic 100 TB operational problem: streaming sinks and
    * over-parallel writers leave thousands of KB-sized files, and every
    * downstream scan then pays one task + one footer-read per file. The
    * file count comes from the ACTUAL byte size of the input (summed from
    * the file listing, not optimizer estimates), and the rewrite is one
    * coalesce-free `repartition(n)` so output files are near-uniform.
    * Returns the file count written. */
  def compactFiles(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024
  ): Int = {
    // a directory with no data files is an operator error (wrong path, or
    // a sink that never committed) — name the path instead of leaking
    // Spark's schema-inference error or a bare NoSuchElementException
    // from files.head below
    val df =
      try spark.read.parquet(inPath)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if Option(e.getCondition).contains("UNABLE_TO_INFER_SCHEMA") =>
          throw new IllegalArgumentException(
            s"compactFiles: no input files under $inPath", e)
      }
    val files = df.inputFiles
    require(files.nonEmpty, s"compactFiles: no input files under $inPath")
    // one FileSystem for the whole listing — resolving per file would pay
    // the config lookup thousands of times on exactly the small-files
    // input this exists for
    val fs = new org.apache.hadoop.fs.Path(files.head)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inputBytes = files.map(f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(f)).getLen).sum
    val n = math.max(1, math.ceil(inputBytes.toDouble / targetFileBytes).toInt)
    df.repartition(n).write.mode("overwrite").parquet(outPath)
    // report what landed, not the partition count: empty partitions (row
    // count < n) write no file
    spark.read.parquet(outPath).inputFiles.length
  }

  /** Compact a bucketed table back to ONE sorted file per bucket — the
    * maintenance pass a continuously-appended bucketed corpus
    * ([[graft.streaming.CorpusIngest.startBucketed]]) runs
    * periodically. Every append adds a file per bucket, and every
    * downstream scan then pays a task-setup + footer read per file —
    * the chronic small-files tax. The rewrite restores the one-file-
    * per-bucket invariant while keeping joins on the key exchange-free
    * (LayoutSpec pins both), and — because each bucket file is fully
    * sorted — a scan under
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`
    * additionally reports its ordering, eliding the per-side Sort in
    * sort-merge joins (modern Spark drops that derivation by default,
    * SPARK-28595; LayoutSpec demonstrates it under the conf). The
    * sorted files earn their keep either way via parquet min/max
    * skipping on key-range predicates.
    *
    * The rewrite lands in a temp table first and swaps via RENAME:
    * Spark (correctly) refuses to overwrite a table it is reading.
    *
    * `transform` rewrites the ROWS on the way through (default
    * identity = pure compaction) — the hook behind
    * [[graft.streaming.CorpusIngest.compact]]'s takedown purge (the
    * physical half of `retireDocs`' tombstones), so every tmp-swap in
    * the repo shares ONE tmp name and ONE crash-recovery path instead
    * of parallel copies that drift. */
  def rewriteBucketed(
      spark: SparkSession,
      table: String,
      key: String,
      buckets: Int,
      partitionCols: Seq[String] = Nil,
      transform: DataFrame => DataFrame = identity
  ): Unit = {
    val tmp = s"${table}_compact_tmp"
    // crash recovery: a previous run that died between its DROP and
    // RENAME left the ONLY copy of the data in tmp — blindly dropping
    // tmp here would destroy it. Complete the interrupted swap instead,
    // then compact normally.
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(tmp)) {
      spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
      if (partitionCols.nonEmpty) spark.sql(s"MSCK REPAIR TABLE $table")
    }
    // a table that STILL does not exist is the bootstrap case (e.g. a
    // retire against a corpus whose sigs table was never created) — a
    // no-op, never an error or a silent half-swap
    if (!spark.catalog.tableExists(table)) return
    spark.sql(s"DROP TABLE IF EXISTS $tmp")
    // force a genuinely BUCKETED read: the optimizer elides the
    // repartition below (the table's bucket metadata already satisfies
    // it), but the planner would then ALSO auto-disable the bucketed
    // scan as "unused" — leaving file-split partitions that are not
    // bucket-pure, so every write task would open a file per bucket it
    // sees (verified on Spark 4.1: a 3-append 4-bucket table compacted
    // to 10 misaligned files without this). Pinning autoBucketedScan
    // off makes the scan emit one bucket-pure partition per bucket and
    // the rewrite lands exactly one file per bucket.
    val abs = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(abs, "true")
    spark.conf.set(abs, "false")
    // lost-append fence: snapshot the table's data files before the
    // rewrite reads them. An appender that commits DURING the (long)
    // read+write phase adds files the rewrite never saw — swapping
    // would silently drop those rows with their source offsets already
    // committed. Appends only ever ADD files, so a changed listing at
    // swap time is exactly that race: abort the swap (drop tmp, table
    // untouched) and let the caller re-run. The residual window is the
    // re-listing + two catalog ops below — metadata-priced, not
    // rewrite-priced; the appender's own tmp-table guard covers the
    // DROP→RENAME half. Maintenance is still best run between
    // committed batches.
    val filesBefore = spark.table(table).inputFiles.toSet
    try {
      val w = transform(spark.table(table))
        .repartition(buckets, col(key)) // load-bearing when re-bucketing to a NEW count
        .write
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(tmp)
    } finally spark.conf.set(abs, prev)
    if (spark.table(table).inputFiles.toSet != filesBefore) {
      spark.sql(s"DROP TABLE IF EXISTS $tmp")
      throw new IllegalStateException(
        s"rewriteBucketed($table): concurrent append detected during the " +
          "rewrite — swap aborted, table untouched. Re-run after the " +
          "appender quiesces.")
    }
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    // a partitioned table's per-partition catalog locations still point
    // at the pre-rename directory; recover them from the moved layout
    if (partitionCols.nonEmpty) spark.sql(s"MSCK REPAIR TABLE $table")
  }

  /** Retention policy for a date-partitioned table: keep `keepDays` days
    * of partitions as of `today` — the magnetic-store TTL the reference
    * actually enforces (TimestreamInitializer.java:47-50 sets
    * MagneticStoreRetentionPeriodInDays; Timestream then EXPIRES data
    * past it). `today` is injectable so sweeps are testable and
    * re-runnable for a fixed day. */
  final case class RetentionPolicy(
      dataPath: String,
      keepDays: Long,
      // UTC, not the JVM default zone: event_date partitions are named
      // by the UTC day (every entry point pins
      // spark.sql.session.timeZone=UTC, so to_date(timestamp_millis(t))
      // buckets by UTC) — a local-zone "today" on a UTC+13 driver sits
      // one day AHEAD of the newest possible partition and the cutoff
      // would expire the oldest still-in-retention day
      today: java.time.LocalDate = java.time.LocalDate.now(java.time.ZoneOffset.UTC))

  /** Drop date partitions strictly older than `olderThan` — the expiry
    * sweep that turns `writeDatePartitioned`'s layout into a real TTL
    * (partition pruning's storage twin: retention is one directory
    * delete per expired day, NEVER a rewrite of in-retention data, so
    * surviving files are byte-identical afterwards).
    *
    * Semantics: only directories named `partitionCol=<ISO date>` are
    * candidates; a value that does not parse as a date is KEPT (never
    * delete what can't be dated). Missing root is a no-op (bootstrap
    * stance of [[graft.sink.Sinks.DdlInitializer]]). Idempotent: a
    * re-run with the same cutoff finds nothing to drop. Returns the
    * dropped partition values, sorted.
    *
    * Scale: the whole sweep is a driver-side directory listing — one
    * NameNode/S3 LIST of day-level entries (bounded by retention span,
    * not data size) and one recursive delete per expired day. */
  def expirePartitions(
      spark: SparkSession,
      path: String,
      partitionCol: String,
      olderThan: java.time.LocalDate): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val prefix = s"$partitionCol="
    val dropped = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .flatMap { s =>
        val v = s.getPath.getName.stripPrefix(prefix)
        scala.util.Try(java.time.LocalDate.parse(v)).toOption match {
          case Some(d) if d.isBefore(olderThan) =>
            require(fs.delete(s.getPath, true),
              s"expirePartitions: failed to delete ${s.getPath}")
            Some(v)
          case _ => None
        }
      }
    dropped.sorted
  }

  /** Apply a [[RetentionPolicy]]: expire `event_date` partitions older
    * than `today - keepDays`. The cutoff keeps exactly the last
    * `keepDays` days INCLUDING today, matching Timestream's
    * day-granular magnetic retention. */
  def applyRetention(spark: SparkSession, policy: RetentionPolicy): Seq[String] =
    expirePartitions(spark, policy.dataPath, "event_date",
      policy.today.minusDays(policy.keepDays - 1))

  /** Z-ordered write: min-max scale two numeric dimensions to 16-bit
    * buckets, sort by the interleaved Morton value, write range-split
    * files. Unlike a single-axis sort (which leaves the second column's
    * per-file min/max spanning the whole domain), z-clustered files are
    * narrow in BOTH dimensions — parquet footer stats then skip files
    * for predicates on either column. The min/max pre-pass is one tiny
    * distributed aggregate. */
  def writeZOrdered(
      df: DataFrame,
      colA: String,
      colB: String,
      partitions: Int,
      path: String
  ): Unit = {
    val r = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    // empty input yields one all-null row; an all-NULL dimension column
    // nulls only its own min/max — either way there is no z-range to
    // cluster on, so fall back to a plain write
    if (r.isNullAt(0) || r.isNullAt(2)) {
      df.write.mode("overwrite").parquet(path)
      return
    }
    val (loA, hiA, loB, hiB) = (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
    def bucket(c: String, lo: Double, hi: Double) =
      if (hi <= lo) lit(0)
      else ((col(c).cast("double") - lit(lo)) / lit(hi - lo) * lit(65535.0))
        .cast("int")
    df.withColumn("_z", zValue16(bucket(colA, loA, hiA), bucket(colB, loB, hiB)))
      .repartitionByRange(partitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write
      .mode("overwrite")
      .parquet(path)
  }
}
