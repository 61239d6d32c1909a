package graft.config

/** Engine configuration (operator O13).
  *
  * Mirrors the reference's config loader semantics
  * (ParameterToolUtils.java:21-35: CLI args merged over KDA application
  * properties, group "FlinkApplicationProperties") as a pure
  * precedence-merge: defaults < properties < CLI args. The keys cover the
  * reference's operational surface (StreamingJob.java:74-110,147-150,174;
  * TimestreamInitializer.java:12-13).
  */
final case class AppConfig(
    region: String = "us-east-1",
    streamName: String = "TimestreamTestStream",
    /** Kinesis poll interval, ms (SHARD_GETRECORDS_INTERVAL_MILLIS). */
    pollIntervalMs: Long = 1000L,
    /** Max records per GetRecords (SHARD_GETRECORDS_MAX). */
    maxRecordsPerPoll: Int = 10000,
    /** Adaptive reads toggle (SHARD_USE_ADAPTIVE_READS,
      * StreamingJob.java:84-88). */
    useAdaptiveReads: Boolean = false,
    /** Sink batch size (TimestreamIngestBatchSize, default 50). */
    sinkBatchSize: Int = 50,
    windowSeconds: Int = 10,
    latenessSeconds: Int = 5,
    databaseName: String = "kdaflink",
    tableName: String = "kdaflinkmetrics",
    /** Retention knobs (TimestreamInitializer.java:12-13). */
    memoryStoreRetentionHours: Long = 24L,
    magneticStoreRetentionDays: Long = 7L,
    /** JDBC endpoint for the batch sink; None ⇒ offline parquet sink. */
    jdbcUrl: Option[String] = None,
    /** Streaming state-store backend: "rocksdb" (default — the only
      * store whose keyed state spills to disk, i.e. the one that
      * survives 100 TB-scale window/session/join state; changelog
      * checkpointing + bounded block cache are set with it) or "hdfs"
      * (Spark's in-memory default, fine for tests/small state). Applied
      * by Pipeline.start/startWindowedUpdate on the session. */
    stateStoreProvider: String = "rocksdb"
)

object AppConfig {

  /** `--key value` argument scanner. Every flag must be `--`-prefixed and
    * carry a value; a valueless flag or a stray positional token is an
    * ERROR, not silently skipped — the fixed 2-by-2 pairing this replaces
    * shifted the pairing after one bad token and silently mis-bound every
    * subsequent `--key value`. */
  def parseArgs(args: Array[String]): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < args.length) {
      val a = args(i)
      require(a.startsWith("--"), s"unexpected positional argument '$a' (expected --key value)")
      require(i + 1 < args.length, s"missing value for '$a'")
      require(!args(i + 1).startsWith("--"), s"missing value for '$a' (next token is a flag)")
      out += a.drop(2) -> args(i + 1)
      i += 2
    }
    out.result()
  }

  /** `--key value` CLI args over a properties map over defaults. Unknown
    * keys are ignored (the reference's ParameterTool does the same). */
  def load(args: Array[String], props: Map[String, String] = Map.empty): AppConfig = {
    val cli = parseArgs(args)
    val m = props ++ cli
    def s(k: String, d: String) = m.getOrElse(k, d)
    AppConfig(
      region = s("Region", s("region", "us-east-1")),
      streamName = s("InputStreamName", s("streamName", "TimestreamTestStream")),
      pollIntervalMs = s("SHARD_GETRECORDS_INTERVAL_MILLIS", "1000").toLong,
      maxRecordsPerPoll = s("SHARD_GETRECORDS_MAX", "10000").toInt,
      useAdaptiveReads = s("SHARD_USE_ADAPTIVE_READS", "false").toBoolean,
      sinkBatchSize = s("TimestreamIngestBatchSize", "50").toInt,
      windowSeconds = s("windowSeconds", "10").toInt,
      latenessSeconds = s("latenessSeconds", "5").toInt,
      databaseName = s("TimestreamDbName", s("databaseName", "kdaflink")),
      tableName = s("TimestreamTableName", s("tableName", "kdaflinkmetrics")),
      memoryStoreRetentionHours = s("memoryStoreRetentionHours", "24").toLong,
      magneticStoreRetentionDays = s("magneticStoreRetentionDays", "7").toLong,
      jdbcUrl = m.get("jdbcUrl"),
      stateStoreProvider = s("stateStoreProvider", "rocksdb")
    )
  }
}
