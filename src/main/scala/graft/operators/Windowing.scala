package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Event-time windowing (operators O4–O8).
  *
  * The reference assigns event time + a monotonic watermark
  * (StreamingJob.java:132-144), buffers ALL records in a parallelism-1
  * global 10s tumbling window (`windowAll`, StreamingJob.java:148 — a
  * scale-out killer we deliberately do NOT reproduce), allows 5s lateness
  * (StreamingJob.java:149) and routes later records to a side output
  * (StreamingJob.java:128,150-166).
  *
  * Spark-first redesign:
  *   - `groupBy(window(...), keys...)` hash-partitions by (window, keys) —
  *     scales with the cluster instead of funnelling through one task;
  *     map-side partial aggregation halves the shuffle.
  *   - Lateness folds into the watermark delay in streaming
  *     (`withWatermark(col, "5 seconds")`); Spark append mode fires once
  *     when the watermark passes window end + delay instead of Flink's
  *     re-fire — a documented semantic substitution (SURVEY §7.4.1).
  *   - The side output — Spark's one genuinely missing primitive (it
  *     silently DROPS late rows) — is a library-level split: batch mode
  *     derives the cutoff from the observed max event time (deterministic,
  *     no wall clock); streaming mode routes inside `foreachBatch`.
  */
object Windowing {

  /** Epoch-aligned tumbling window start, computed arithmetically.
    *
    * Deliberately NOT `functions.window()` for the batch path: the
    * TimeWindowing rule injects `Filter isnotnull(ts)`, and predicate
    * pushdown then substitutes the ENTIRE upstream expression tree (here:
    * the whole log parse) into that filter at the scan — every row parses
    * twice (measured 3× wall-clock on the flagship query). The arithmetic
    * form is null-safe (null ts → null bucket → SQL null group), emits a
    * flat column instead of a struct, and `pmod` gives the same
    * floor-alignment as `window()` including pre-epoch timestamps.
    * `window()` remains the right tool in the STREAMING path, where the
    * state store keys on the window struct. */
  def tumble(ts: Column, durMs: Long): Column = {
    val ms = unix_millis(ts)
    timestamp_millis(ms - pmod(ms, lit(durMs)))
  }

  /** Flagship windowed aggregation (SURVEY §7.1): per tumbling window of
    * `durMs` milliseconds, per `keys`, count + min/max/sum/avg of
    * `valueCol`.
    *
    * The sum/average are computed as exact-decimal sum (÷ count) cast
    * through double, so the result is bit-deterministic regardless of
    * partitioning / aggregation order — a bare float `sum()`/`avg()` would
    * differ run-to-run at 1000 executors. min/max/count are
    * order-insensitive and stay native.
    */
  def tumblingStats(
      df: DataFrame,
      timeCol: String,
      keys: Seq[String],
      durMs: Long,
      valueCol: String
  ): DataFrame =
    df.groupBy(
        (tumble(col(timeCol), durMs).as("window_start") +: keys.map(col)): _*
      )
      .agg(
        count(lit(1)).as("cnt"),
        min(col(valueCol)).as("min_value"),
        max(col(valueCol)).as("max_value"),
        sum(col(valueCol).cast(DecimalType(18, 2))).as("_sum_dec")
      )
      .withColumn("sum_value", col("_sum_dec").cast("double"))
      // avg divides by the WINDOW row count (cnt), not count(valueCol):
      // deliberately "mean over all records in the window" — rows whose
      // value nulled out still belong to the window. The oracle divides
      // by count(*) identically; switching either side alone to SQL AVG
      // semantics (null-skipping denominator) would break the hash gate.
      .withColumn("avg_value", col("_sum_dec").cast("double") / col("cnt"))
      .drop("_sum_dec")

  /** OHLC bars over tumbling windows — the streaming-capable form of
    * [[graft.queries.AnalyticsQueries.ohlcAgg]]: per (window, key),
    * open/close as lexicographic (ts, id, value) struct extremes
    * (deterministic under timestamp ties), high/low, count, and the
    * exact decimal volume. Uses `window()` structs so a STREAMING caller
    * can watermark `timeCol` and run it as a stateful windowed
    * aggregation (struct min/max and decimal sums are all
    * streaming-supported); the batch query keeps its arithmetic hour
    * bucketing for pushdown-safety — StreamingSpec asserts the two
    * agree bar-for-bar on a shared fixture. */
  def ohlcBars(
      df: DataFrame,
      timeCol: String,
      keyCol: String,
      idCol: String,
      valueCol: String,
      dur: String
  ): DataFrame =
    df.groupBy(window(col(timeCol), dur).as("w"), col(keyCol))
      .agg(
        min(struct(col(timeCol), col(idCol), col(valueCol))).as("o"),
        max(struct(col(timeCol), col(idCol), col(valueCol))).as("c"),
        min(col(valueCol)).as("low"),
        max(col(valueCol)).as("high"),
        count(lit(1)).as("cnt"),
        sum(col(valueCol).cast(DecimalType(18, 2))).cast("double").as("volume")
      )
      .select(
        col("w")("start").as("bar_start"), col(keyCol),
        col("o")(valueCol).as("open"), col("high"), col("low"),
        col("c")(valueCol).as("close"), col("cnt"), col("volume"))

  /** Batch late-flagging: a row is late iff its event time trails the
    * dataset's max event time by more than `lateness`. Two passes — a
    * single-row aggregate, broadcast back — instead of a global sort or a
    * parallelism-1 window; the broadcast nested-loop join of one row is
    * free. Deterministic (max of the data, never wall clock). */
  def withLateFlag(df: DataFrame, tsCol: String, lateness: String): DataFrame = {
    val cutoff = df.agg(max(col(tsCol)).as("_max_ts"))
    df.crossJoin(broadcast(cutoff))
      .withColumn(
        "is_late",
        // null-safe: a null event time makes the comparison three-valued
        // NULL, which both splitLate filters would drop — the row would
        // vanish from BOTH outputs. Null-time rows are not-late (same
        // ruling as LateRouter's `time.isNotNull && time < cutoff`).
        coalesce(col(tsCol) < col("_max_ts") - expr(s"INTERVAL $lateness"), lit(false))
      )
      .drop("_max_ts")
  }

  /** Side-output emulation: (onTime, late) pair of DataFrames
    * (reference OutputTag routing, StreamingJob.java:128,150-166). */
  def splitLate(
      df: DataFrame,
      tsCol: String,
      lateness: String
  ): (DataFrame, DataFrame) = {
    val flagged = withLateFlag(df, tsCol, lateness)
    (flagged.filter(!col("is_late")), flagged.filter(col("is_late")))
  }

}
