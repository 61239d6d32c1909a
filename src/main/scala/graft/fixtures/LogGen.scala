package graft.fixtures

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import scala.util.Random

/** Deterministic service-log fixture generator (operator O14).
  *
  * Reproduces the reference data generator's wire format
  * (timestream_kinesis_data_gen.py:24-36): one record = a ruler line plus
  * `key=value` lines ending in `EOE`, with the same key set and constant
  * filler fields. Two flavors:
  *
  *   1. [[eventsAsServiceLogs]] — relational: renders each row of the shared
  *      `events` parquet table into a log record (Operation := event_type,
  *      AwsAccountId := user_id, CallerService := "SVC" + user_id%3,
  *      Time := value, EndTime := epoch-ms of ts). Used by the oracle-checked
  *      `parse_logs` / `window_agg` queries, so the DuckDB oracle can
  *      recompute the expected parse output directly from `events`.
  *
  *   2. [[records]] — a seeded in-memory generator mirroring the reference's
  *      random-choice domains and `--percent-late`/`--late-time` late-arrival
  *      injection (timestream_kinesis_data_gen.py:38-42,50-59,67-72), for
  *      deterministic streaming tests (MemoryStream).
  */
object LogGen {

  val Ruler = "-" * 72

  /** Render an events row into the reference wire format. `CallerService`
    * is emitted uppercase ("SVC0") to exercise the parser's lowercasing. */
  def serviceLogText(
      operation: Column,
      awsAccountId: Column,
      callerService: Column,
      latency: Column,
      endTimeMs: Column
  ): Column =
    concat_ws(
      "\n",
      lit(Ruler),
      concat(lit("Operation="), operation),
      concat(lit("AwsAccountId="), awsAccountId.cast("string")),
      lit("HttpStatusCode=200"),
      concat(lit("CallerService="), callerService),
      lit("Size=2"),
      concat(lit("Time="), latency.cast("string"), lit(" ms")),
      concat(lit("EndTime="), endTimeMs.cast("string")),
      concat(lit("StartTime="), (endTimeMs - 1000L).cast("string")),
      lit("Program=AmazonDataCatalog"),
      lit("EOE")
    )

  /** events table → DataFrame with a single `raw` text column (plus
    * `event_id` carried through for test joins). */
  def eventsAsServiceLogs(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      serviceLogText(
        operation = col("event_type"),
        awsAccountId = col("user_id"),
        callerService = concat(lit("SVC"), (col("user_id") % 3).cast("string")),
        latency = col("value"),
        endTimeMs = unix_millis(col("ts"))
      ).as("raw")
    )

  // Reference generator domains (timestream_kinesis_data_gen.py:38-42,67-72).
  private val Operations =
    Seq("GetTable", "CreateTable", "CreateNameSpace", "GetDatabase", "CreateDatabase")
  private val CallerServices = Seq("GLUE", "S3")
  private val Latencies =
    Seq("178.715432", "123.152632", "562.789562", "125.785214", "252.123568")

  /** One wire-format record. */
  def record(
      operation: String,
      awsAccountId: Long,
      callerService: String,
      latencyText: String,
      endTimeMs: Long
  ): String =
    Seq(
      Ruler,
      s"Operation=$operation",
      s"AwsAccountId=$awsAccountId",
      "HttpStatusCode=200",
      s"CallerService=$callerService",
      "Size=2",
      s"Time=$latencyText ms",
      s"EndTime=$endTimeMs",
      s"StartTime=${endTimeMs - 1000}",
      "Program=AmazonDataCatalog",
      "EOE"
    ).mkString("\n")

  /** Seeded record stream with late-arrival injection: with probability
    * `percentLate`/100 a record's event time is `lateSeconds` in the past
    * (timestream_kinesis_data_gen.py:50-59). `baseTimeMs` advances
    * `stepMs` per record (default 1 s, like the generator's pacing) — no
    * wall clock, fully deterministic. */
  def records(
      n: Int,
      seed: Long,
      baseTimeMs: Long = 1700000000000L,
      percentLate: Int = 0,
      lateSeconds: Int = 0,
      stepMs: Long = 1000L
  ): Seq[String] = {
    val rng = new Random(seed)
    (0 until n).map { i =>
      val endTime =
        if (percentLate > 0 && rng.nextInt(100) < percentLate)
          baseTimeMs + i * stepMs - lateSeconds * 1000L
        else baseTimeMs + i * stepMs
      record(
        operation = Operations(rng.nextInt(Operations.size)),
        awsAccountId = 100000000000L + rng.nextInt(1000000),
        callerService = CallerServices(rng.nextInt(CallerServices.size)),
        latencyText = Latencies(rng.nextInt(Latencies.size)),
        endTimeMs = endTime
      )
    }
  }
}
