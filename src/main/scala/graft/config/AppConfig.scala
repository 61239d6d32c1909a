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
    jdbcUrl: Option[String] = None
)

object AppConfig {

  /** `--key value` CLI args over a properties map over defaults. Unknown
    * keys are ignored (the reference's ParameterTool does the same). */
  def load(args: Array[String], props: Map[String, String] = Map.empty): AppConfig = {
    val cli = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
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
      jdbcUrl = m.get("jdbcUrl")
    )
  }
}
