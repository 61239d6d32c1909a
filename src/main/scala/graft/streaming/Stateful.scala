package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed state on top of Structured Streaming —
  * `flatMapGroupsWithState` sessionization and watermarked streaming
  * dedup. The reference has no keyed state at all (SURVEY §2.1: "no keyed
  * state, no timers"); these are the state primitives a production
  * version of its pipeline grows into, and the streaming counterparts of
  * the batch `session_agg` / `dedup_exact` oracle queries.
  */
object Stateful {

  final case class Evt(user_id: Long, event_ms: Long)
  final case class SessionState(start: Long, end: Long, n: Long)
  final case class Session(user_id: Long, session_start: Long, session_end: Long, n_events: Long)

  /** Streaming sessionization with an inactivity gap: state is one open
    * session per user (O(users) state, never O(events)); sessions close
    * via event-time timeout when the watermark passes end+gap, exactly
    * like the batch lag+cumsum `session_agg`. */
  def sessionize(
      ds: Dataset[Evt],
      gapMs: Long,
      watermarkDelay: String = "10 seconds"
  ): Dataset[Session] = {
    import ds.sparkSession.implicits._
    ds.withColumn("event_time", timestamp_millis(col("event_ms")))
      .withWatermark("event_time", watermarkDelay)
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start, s.end, s.n))
          } else {
            // Classic interval merge over {open session} ∪ {batch events},
            // sorted by start: any two pieces within gapMs chain into one
            // session — EXACTLY the batch lag+cumsum `session_agg`
            // semantics on the same events. (A per-event fold against only
            // the open session would emit each ancient straggler as its
            // own singleton, never merging two stragglers that sit within
            // gapMs of each other.) The latest merged interval stays open;
            // everything earlier is closed output.
            val pieces =
              (rows.map(t => SessionState(t._2, t._2, 1)) ++ state.getOption.iterator)
                .toArray.sortBy(_.start)
            if (pieces.isEmpty) Iterator.empty
            else {
            var merged = List.empty[SessionState]
            pieces.foreach { p =>
              merged = merged match {
                case h :: rest if p.start <= h.end + gapMs =>
                  SessionState(h.start, math.max(h.end, p.end), h.n + p.n) :: rest
                case _ => p :: merged
              }
            }
            // merged is newest-first; head stays open, the rest close now
            val open = merged.head
            state.update(open)
            state.setTimeoutTimestamp(open.end + gapMs)
            merged.tail.reverseIterator
              .map(s => Session(user, s.start, s.end, s.n))
            }
          }
      }
  }

  /** Streaming dedup on the point identity (time × dimensions) — the
    * exactly-once story SURVEY §3.3 sketches for the at-least-once sink:
    * re-sent records drop at the state store. The input must already
    * carry a watermark (e.g. from [[Pipeline.parsed]]) — `dropDuplicates`
    * only evicts state when the event-time column is among the dedup
    * keys, which these keys (a raw epoch-ms long, not the watermarked
    * timestamp) are not, so the plain variant would grow state without
    * bound on a long-running stream. `dropDuplicatesWithinWatermark`
    * evicts each key once the watermark passes its event time + delay:
    * bounded state, and exactly the replay window the at-least-once sink
    * needs (re-sends happen within the restart/replay horizon, not days
    * later). */
  def dedupPoints(parsed: DataFrame): DataFrame =
    parsed.dropDuplicatesWithinWatermark("time", "awsaccountid", "operation", "callerservice")

  final case class KeyedTotal(key: String, batch_count: Long, total_count: Long)

  /** Per-key running EVENT totals on the `transformWithState`
    * arbitrary-state API (Spark 4's successor to `mapGroupsWithState`):
    * one TTL-managed `ValueState[Long]` per key, each micro-batch emits
    * (batch delta, running total). The counted quantity is rows per key —
    * the tuple's value component is payload this counter deliberately
    * ignores (swap `n += 1` for `n += rows.next()._2` for value sums).
    * The TTL is the operational state bound — keys idle
    * past it are evicted by the store itself, no timer bookkeeping —
    * and the API requires the RocksDB state store provider, the
    * disk-backed store that holds state bigger than executor heap at
    * production key cardinalities. */
  class RunningTotalProcessor(ttl: java.time.Duration)
      extends org.apache.spark.sql.streaming.StatefulProcessor[String, (String, Long), KeyedTotal] {
    import org.apache.spark.sql.streaming.{TTLConfig, ValueState}
    @transient private var total: ValueState[Long] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      val ttlConf = if (ttl == null) TTLConfig.NONE else TTLConfig(ttl)
      total = getHandle.getValueState[Long](
        "total", org.apache.spark.sql.Encoders.scalaLong, ttlConf)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long)],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[KeyedTotal] = {
      var n = 0L
      while (rows.hasNext) { rows.next(); n += 1 }
      val t = (if (total.exists()) total.get() else 0L) + n
      total.update(t)
      Iterator.single(KeyedTotal(key, n, t))
    }
  }

  /** Running per-key totals over a keyed stream; see
    * [[RunningTotalProcessor]]. `ttl = null` keeps state forever (tests);
    * production passes the retention the key universe needs. Spark only
    * permits state TTL in ProcessingTime mode
    * (`StatefulProcessorHandleImpl.validateTTLConfig` throws otherwise),
    * so the time mode follows the ttl argument. */
  def runningTotals(
      ds: Dataset[(String, Long)],
      ttl: java.time.Duration = null
  ): Dataset[KeyedTotal] = {
    import ds.sparkSession.implicits._
    val timeMode =
      if (ttl == null) org.apache.spark.sql.streaming.TimeMode.None()
      else org.apache.spark.sql.streaming.TimeMode.ProcessingTime()
    ds.groupByKey(_._1)
      .transformWithState(
        new RunningTotalProcessor(ttl),
        timeMode,
        OutputMode.Append())
  }

  /** Stream-static enrichment: join each streaming point against a
    * batch dimension table (operation → metadata). The static side plans
    * as a broadcast per micro-batch — no streaming state at all, the
    * cheapest join a streaming pipeline can run, and the right shape for
    * any dimension that fits the broadcast threshold (re-read on restart;
    * slowly-changing dims become a new broadcast on redeploy). */
  def enrich(parsed: DataFrame, dim: DataFrame, key: String): DataFrame =
    parsed.join(broadcast(dim), Seq(key), "left")

  /** Watermarked stream-stream interval join: correlate each point on
    * stream A with points on stream B for the same key within
    * [0, horizonSec] AFTER it — request/follow-up correlation. Both
    * sides carry watermarks and the join condition bounds event time in
    * BOTH directions, so Spark derives a state-eviction horizon for each
    * side instead of buffering streams forever (state is O(rows within
    * the watermark window), the only scalable shape for stream-stream
    * joins). Inner join: unmatched rows age out of state silently. */
  def correlate(
      left: DataFrame,
      right: DataFrame,
      key: String,
      horizonSec: Int,
      watermarkDelay: String = "10 seconds"
  ): DataFrame = {
    val l = left.withWatermark("event_time", watermarkDelay)
      .select(col(key).as("l_key"), col("event_time").as("l_time"))
    val r = right.withWatermark("event_time", watermarkDelay)
      .select(col(key).as("r_key"), col("event_time").as("r_time"))
    l.join(
      r,
      col("l_key") === col("r_key") &&
        col("r_time") >= col("l_time") &&
        col("r_time") <= col("l_time") + expr(s"INTERVAL $horizonSec SECONDS"),
      "inner"
    )
  }
}
