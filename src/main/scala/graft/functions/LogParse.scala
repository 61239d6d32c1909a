package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Service-log parser (operator O3): multi-line `key=value` text record →
  * typed time-series point columns.
  *
  * Reference semantics (LogsToTimestreamPayloadFn.java:25-94): split the
  * record into lines, split each line on `=`, lowercase + whitelist keys
  * (`callerservice`, `operation`, `awsaccountid`, `endtime`, `time`), rename
  * `time` → `latency` stripping the non-numeric `" ms"` suffix
  * (LogsToTimestreamPayloadFn.java:44), take `endtime` as the epoch-ms event
  * time, and collect the whitelisted string keys as dimensions. Unknown keys
  * (`HttpStatusCode`, `Size`, `StartTime`, `Program`, `EOE`, the ruler line)
  * are dropped.
  *
  * Implemented entirely with native Catalyst expressions (no UDF, no
  * mapPartitions) so whole-stage codegen fuses the parse into the scan, and
  * fixes the reference's bugs by construction:
  *   - cross-record state leak (LogsToTimestreamPayloadFn.java:18 — the
  *     `metrics` map is never cleared): relational expressions are pure per
  *     row, nothing leaks;
  *   - positional `lineSplit[1]` bug (LogsToTimestreamPayloadFn.java:27-46):
  *     we split on the FIRST `=` only, so values containing `=` survive;
  *   - duplicate keys follow last-write-wins like the reference's map-put
  *     semantics via `spark.sql.mapKeyDedupPolicy=LAST_WIN`, which
  *     [[parse]] sets on the session (session-wide by necessity —
  *     `str_to_map` has no per-call policy; callers using [[kvMap]]
  *     directly in a fresh session must set it themselves or duplicate
  *     keys throw under the default EXCEPTION policy).
  */
object LogParse {

  /** Keys promoted to the dimensions map (reference whitelist minus the two
    * measure/time keys). */
  val DimensionKeys: Seq[String] = Seq("callerservice", "operation", "awsaccountid")

  /** Parse a raw multi-line `key=value` record into a
    * `map<string,string>` with lowercased keys, first-`=` split (values
    * containing `=` survive), and last-write-wins duplicate handling.
    * Lines without `=` become null-valued entries the field extractors
    * ignore.
    *
    * One native `str_to_map` pass. Earlier iterations built the map from a
    * chain of higher-order functions (transform/filter/aggregate) — HOFs
    * are CodegenFallback and allocation-heavy, and measured 20-30× slower
    * per row at sf0.1. Requires `spark.sql.mapKeyDedupPolicy=LAST_WIN`
    * (the reference's map-put overwrite semantics,
    * LogsToTimestreamPayloadFn.java:28-46); [[parse]] sets it on the
    * session. */
  def kvMap(raw: Column): Column =
    str_to_map(lower(raw), lit("\n"), lit("="))

  /** Latency measure: `"178.715432 ms"` → 178.715432 (strip every char
    * outside `[0-9.]`, reference LogsToTimestreamPayloadFn.java:44). Null if
    * the key is absent or the remainder is not numeric — `try_cast`, not
    * `cast`: Spark 4 runs ANSI mode by default, where a plain cast of
    * residue like `"1.2.3"` would fail the whole job instead of nulling the
    * row. The parser must be total. */
  def latencyFrom(kv: Column): Column =
    regexp_replace(try_element_at(kv, lit("time")), "[^0-9.]", "").try_cast("double")

  /** Full parse: input DataFrame with a raw-text column → typed point
    * columns. Promotes the three dimensions to top-level columns (better
    * pruning/pushdown than map access) and keeps the `dimensions` map for
    * the open-ended model. Adds `event_time: timestamp` at the model
    * boundary (Spark watermarks need TimestampType). */
  def parse(df: DataFrame, rawCol: String = "raw"): DataFrame = {
    // Duplicate keys overwrite like the reference's map-put (LAST_WIN);
    // runtime-settable session conf, idempotent.
    df.sparkSession.conf.set("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    // try_element_at, not element_at: under Spark 4 ANSI (the default,
    // never disabled here) element_at on a MISSING map key throws
    // MAP_KEY_DOES_NOT_EXIST and kills the job — a record lacking a
    // whitelisted line must null the column instead (the parser is total)
    val parsed = df.withColumn("_kv", kvMap(col(rawCol)))
    val withFields = parsed
      .withColumn("time", try_element_at(col("_kv"), lit("endtime")).try_cast("long"))
      .withColumn("latency", latencyFrom(col("_kv")))
      .withColumn("operation", try_element_at(col("_kv"), lit("operation")))
      .withColumn("callerservice", try_element_at(col("_kv"), lit("callerservice")))
      .withColumn("awsaccountid", try_element_at(col("_kv"), lit("awsaccountid")))
      .withColumn(
        "dimensions",
        map_filter(col("_kv"), (k, _) => k.isin(DimensionKeys: _*))
      )
      .withColumn("measure_name", lit("latency"))
      .withColumn("measure_value", col("latency").cast("string"))
      .withColumn("measure_value_type", lit("DOUBLE"))
      .withColumn("time_unit", lit("MILLISECONDS"))
      .withColumn("event_time", timestamp_millis(col("time")))
    withFields.drop("_kv")
  }

  /** Typed flavor: the same parse surfaced as `Dataset[TimestreamPoint]`
    * for callers that want compile-time field checks (SURVEY §1.3's typed
    * path). Same expressions underneath — not a row-level closure. */
  def parseTyped(
      df: DataFrame,
      rawCol: String = "raw"
  ): org.apache.spark.sql.Dataset[graft.model.TimestreamPoint] = {
    import df.sparkSession.implicits._
    parse(df, rawCol)
      .select(
        col("time"),
        col("time_unit").as("timeUnit"),
        col("measure_name").as("measureName"),
        col("measure_value").as("measureValue"),
        col("measure_value_type").as("measureValueType"),
        col("dimensions")
      )
      // the typed model's `time` is a primitive Long: records whose
      // endtime is missing/unparseable carry the 0 sentinel (epoch 0).
      // This is REFERENCE PARITY, not an accident — the Flink POJO's
      // `private long time` (TimestreamPoint.java:13) defaults to 0 for
      // exactly these records, and downstream Flink code sees that 0.
      // Callers that window on time should pre-filter time > 0, or use
      // the untyped parse() whose nullable column keeps the signal
      // (LogParseSpec's "POJO-default time" test pins both behaviors)
      .na.fill(0L, Seq("time"))
      .as[graft.model.TimestreamPoint]
  }
}
