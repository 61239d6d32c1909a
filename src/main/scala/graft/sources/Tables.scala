package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch table loaders over the shared parquet fixtures.
  *
  * The reference's only source is a Kinesis stream of text records
  * (StreamingJob.java:74-110); in this offline environment all batch inputs
  * are parquet. Plain `spark.read.parquet` keeps the scan fully Catalyst
  * managed — column pruning and predicate pushdown reach the parquet reader
  * (verify with `.explain`: `PushedFilters`, `ReadSchema`).
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Spread a narrow-but-compute-heavy input across the cluster. The local
    * fixture files are single-row-group parquet, so the scan stage is one
    * task no matter what `maxPartitionBytes` says — a round-robin shuffle of
    * the (tiny) input buys full parallelism for expensive downstream
    * expressions. Guarded: when the source already has at least
    * `defaultParallelism` splits (any real multi-file/100 TB table), this is
    * a no-op — never an unconditional reshuffle of a big input. */
  def distribute(spark: SparkSession, df: DataFrame): DataFrame = {
    val target = spark.sparkContext.defaultParallelism
    // estimate the scan's split count from file metadata instead of
    // df.rdd.getNumPartitions — materializing the RDD lineage just to
    // count partitions forces physical planning twice per call. Any real
    // multi-file table short-circuits on file count; few-but-huge files
    // estimate their maxPartitionBytes splits (driver-side metadata
    // lookups only, and only when fewer files than cores).
    val files = df.inputFiles
    if (files.length >= target) df
    else {
      val hconf = spark.sparkContext.hadoopConfiguration
      val bytes = files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        try p.getFileSystem(hconf).getFileStatus(p).getLen
        catch { case _: Exception => 0L }
      }.sum
      val maxPart = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
      if (math.max(1L, (bytes + maxPart - 1) / maxPart) < target) df.repartition(target)
      else df
    }
  }

  /** Broadcast hint guarded by the session's broadcast threshold: an
    * unconditional `broadcast(dim)` is right at fixture scale but fights
    * AQE when the dimension outgrows the limit (customer at sf100 is
    * ~1.5 GB — forcing that broadcast OOMs executors or falls over the
    * 8 GB hard cap). Hint only when the optimizer's own size estimate
    * fits the configured threshold; otherwise leave the join strategy to
    * Catalyst/AQE. */
  def broadcastIfSmall(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    val threshold =
      try org.apache.spark.network.util.JavaUtils.byteStringAsBytes(conf)
      catch { case _: Exception => conf.toLong }
    val size = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (threshold > 0 && size <= threshold) broadcast(df) else df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** `events.ts` has shipped in two physical forms across fixture
    * generations, so the read is schema-adaptive:
    *
    *   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it outright
    *     ([PARQUET_TYPE_ILLEGAL]), so it arrives as a raw nanos Long
    *     (`nanosAsLong`, a runtime-settable session conf) and a
    *     TimestampType column is rebuilt by integer division — `DIV 1000`
    *     truncates toward zero exactly like DuckDB's ns→µs read path,
    *     keeping the oracle bit-identical. Never divide the Long through
    *     Double (2^63 ns ≫ 2^53 mantissa — silent precision loss).
    *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): infers as
    *     TIMESTAMP_NTZ; cast to TimestampType under the session's pinned
    *     UTC zone — the micros value is unchanged, matching DuckDB's
    *     naive-timestamp `epoch_us` exactly. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
