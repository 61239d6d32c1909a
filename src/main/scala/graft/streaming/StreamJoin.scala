package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream event-time join — the Spark surface the
  * rest of the streaming package hasn't exercised: two live streams
  * joined per user under a time-range predicate, with BOTH watermarks
  * bounding the buffered state. The classic attribution shape: every
  * view joined to the clicks the same user makes within the next ten
  * minutes.
  *
  * Semantics: INNER stream-stream joins emit eagerly (a match emits the
  * micro-batch both sides have arrived, no watermark wait), so given
  * complete in-order delivery the streamed result equals the BATCH join
  * of the same frames — and because this builder is mode-agnostic
  * (plain DataFrame ops), the parity spec runs the SAME code both ways
  * and asserts set equality.
  *
  * Scale (100 TB/day): the join shuffles both sides on user_id once; the
  * state each executor buffers is bounded by the watermarks — a view can
  * only match clicks ≤ 10 min after it, so once the click watermark
  * passes view_ts + 10 min the buffered view row is dropped (state is
  * O(10-minutes-of-stream), not O(history)). Without the time-range
  * bound on BOTH columns Spark would have to keep every row forever —
  * the range predicate is what makes the operator runnable unbounded. */
object StreamJoin {

  /** Join `views(user_id, ts, event_id)` to `clicks(user_id, ts,
    * event_id)`: clicks in (view_ts, view_ts + 10 min]. Works on static
    * and streaming frames alike. */
  def viewClickJoin(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", "10 minutes")
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "10 minutes")
    v.join(c,
      col("v_user") === col("c_user") &&
        col("click_ts") > col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 10 MINUTES"))
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** LEFT-OUTER flavor of [[viewClickJoin]] — attribution's other half:
    * the views that NEVER converted. Matched rows emit eagerly like the
    * inner join; an unmatched view emits with null click columns only
    * once the watermark passes view_ts + 10 min (Spark must be certain
    * no matching click can still arrive before it may declare the view
    * unconverted — the null-emission wait IS the correctness condition,
    * not an implementation lag). State stays watermark-bounded exactly
    * as in the inner case: the outer side's buffered rows are dropped at
    * the same eviction point where the nulls are emitted. */
  def viewClickJoinLeftOuter(views: DataFrame, clicks: DataFrame): DataFrame = {
    val v = views
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", "10 minutes")
    val c = clicks
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
      .withWatermark("click_ts", "10 minutes")
    v.join(c,
      col("v_user") === col("c_user") &&
        col("click_ts") > col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 10 MINUTES"),
      "leftOuter")
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }
}
