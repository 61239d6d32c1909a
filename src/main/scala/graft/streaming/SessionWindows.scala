package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming sessionization — the live twin of the batch
  * [[graft.queries.AnalyticsQueries.sessionAgg]] query, built on Spark's
  * NATIVE `session_window` aggregation rather than hand-rolled state: the
  * engine merges each user's events into gap-bounded sessions and
  * finalizes a session only once the event-time watermark passes its
  * close, which is exactly the semantics the batch lag/cumsum query
  * computes in hindsight. Three independent implementations — this
  * operator, the batch window query, and the DuckDB oracle — must agree,
  * and StreamingSpec asserts the first two do, exactly.
  *
  * Gap-boundary contract: `session_window` starts a new session when the
  * inter-event gap is ≥ the gap duration, while the batch query's
  * `gap > 1h` keeps an exactly-one-hour gap in-session. The boundary can
  * only disagree on a gap of EXACTLY 3 600 000 000 µs — measure-zero on
  * microsecond event time (the fixtures contain none, which the parity
  * spec proves); a consumer sessionizing data with quantized timestamps
  * (whole hours) should align the two before comparing.
  *
  * Scale (100 TB): sessionization shuffles once on user_id (compact
  * key) into the stateful aggregation; per-user state is the OPEN
  * sessions only — closed sessions emit and leave the store the moment
  * the watermark passes, so state is O(active users), not O(history).
  * This is the property that lets the operator run forever: the
  * watermark is the retention policy.
  */
object SessionWindows {

  /** Sessionize a `(user_id, ts)` event stream with a 1-hour gap.
    * `delay` is the watermark lateness allowance; sessions finalize
    * (and emit, in Append mode) once the watermark passes their close.
    * Works identically on a BATCH frame (Spark plans `session_window`
    * in both modes), which is what the parity spec exploits. */
  def sessionize(ds: DataFrame, delay: String = "10 minutes"): DataFrame =
    ds.select(col("user_id"), col("ts"))
      .withWatermark("ts", delay)
      .groupBy(col("user_id"), session_window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
}
