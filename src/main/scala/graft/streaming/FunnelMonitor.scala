package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming behavioral funnel — the online form of the batch
  * `funnel_steps` query ([[graft.queries.AnalyticsQueries.funnelSteps]]):
  * per user, the strictly-ordered view → click → purchase conversion
  * chain (step N counts only with an event strictly AFTER the user's
  * step-N−1 time, each step taking the MINIMUM qualifying time), emitted
  * once per user when the watermark passes their last event + the
  * inactivity horizon.
  *
  * Why the state keeps click/purchase CANDIDATE LISTS and not a running
  * chain: the batch semantics anchor every step on the FINAL minimum of
  * the previous step, and events arrive out of order — a late view can
  * lower t_view and make an already-seen earlier click eligible, so a
  * fold that kept only "the best chain so far" would be order-dependent
  * and disagree with batch. Candidates are pruned at emission, when the
  * anchors are final; until then state is O(user's clicks+purchases
  * within the horizon) — same class as [[Stateful.sessionize]]'s open
  * interval set, evicted by the same event-time timeout. Views need only
  * their running minimum (one long).
  *
  * Exactness: all times are epoch-microsecond longs; the chain is
  * min/filter integer arithmetic — StatefulSpec asserts stream == a
  * driver recompute AND the per-step totals == the batch query exactly.
  *
  * Scale (100 TB): users hash-partition; state per user is one long +
  * two bounded lists; one timer per user. The aggregate step counts are
  * a trivial rollup of the emitted per-user rows.
  */
object FunnelMonitor {

  final case class FunnelEvt(user_id: Long, event_us: Long, event_type: String)

  final case class FunnelState(
      minView: Option[Long], clicks: List[Long], purchases: List[Long],
      lastSeen: Long)

  /** One row per user at horizon expiry: the step times that qualified
    * (t_click only with a view before it, t_purchase only with a
    * qualifying click before it). */
  final case class Conversion(
      user_id: Long, t_view: Option[Long], t_click: Option[Long],
      t_purchase: Option[Long])

  /** Track a `(user_id, event_us, event_type)` stream. A user's funnel
    * emits once the watermark passes their last event + `horizonMs`. */
  def track(
      ds: Dataset[FunnelEvt],
      horizonMs: Long,
      watermarkDelay: String = "10 seconds"): Dataset[Conversion] = {
    import ds.sparkSession.implicits._
    ds.withColumn("event_time", timestamp_micros(col("event_us")))
      .withWatermark("event_time", watermarkDelay)
      .as[(Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, Conversion](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, String, java.sql.Timestamp)],
         state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            // anchors are final here: resolve the strict chain exactly as
            // the batch query's per-step min-over-qualifying filter
            val tv = s.minView
            val tc = tv.flatMap(v => s.clicks.filter(_ > v).minOption)
            val tp = tc.flatMap(c => s.purchases.filter(_ > c).minOption)
            Iterator(Conversion(user, tv, tc, tp))
          } else {
            val s0 = state.getOption
              .getOrElse(FunnelState(None, Nil, Nil, Long.MinValue))
            val s = rows.foldLeft(s0) { case (acc, (_, tus, typ, _)) =>
              val seen = math.max(acc.lastSeen, tus)
              typ match {
                case "view" =>
                  acc.copy(
                    minView = Some(acc.minView.fold(tus)(math.min(_, tus))),
                    lastSeen = seen)
                case "click" => acc.copy(clicks = tus :: acc.clicks, lastSeen = seen)
                case "purchase" => acc.copy(purchases = tus :: acc.purchases, lastSeen = seen)
                case _ => acc.copy(lastSeen = seen)
              }
            }
            state.update(s)
            state.setTimeoutTimestamp(s.lastSeen / 1000L + horizonMs)
            Iterator.empty
          }
      }
  }
}
