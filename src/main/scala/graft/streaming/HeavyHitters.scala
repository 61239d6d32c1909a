package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Streaming heavy hitters — SpaceSaving (Metwally, Agrawal, El Abbadi,
  * ICDT 2005) over a keyed item stream: per key, a fixed budget of m
  * counters tracks the most frequent items with the classic guarantees
  * (every item with true frequency > n/m IS tracked; each estimate
  * overcounts by at most its recorded error, and
  * `est − err ≤ true ≤ est`). The streaming complement to the batch
  * `cms_topk` query: CMS answers "how often was THIS item seen",
  * SpaceSaving answers "WHICH items dominate" — the live view of token /
  * user / URL concentration that decides sampling caps while a corpus
  * streams in (the reference's Timestream consumers run exactly this
  * kind of top-N dashboard on the stored points).
  *
  * Determinism: SpaceSaving is processing-order dependent, so the
  * operator fixes both orders: rows sort by their sequence number within
  * each batch (the contract: seq is non-decreasing per key across
  * batches — arrival/offset order), and eviction ties break by smallest
  * count then LEXICOGRAPHICALLY SMALLEST item. With those two rules the
  * fold is a pure function of the input sequence — StatefulSpec replays
  * the identical sequence driver-side via [[spaceSavingFold]] (the SAME
  * function the processor calls) and asserts the final snapshots match
  * exactly, mid-stream snapshots included.
  *
  * Scale (100 TB): state is m counters per key — O(keys·m), never
  * O(items) — on the RocksDB store `transformWithState` requires; each
  * micro-batch reads the ≤ m-entry map once, folds the batch in memory,
  * and writes back only the entries that changed. Keys hash-partition
  * across executors; a global (un-keyed) top-N is the per-key sketches'
  * MERGE (sum est, sum err caps), which is a tiny follow-up aggregate —
  * the sketch frame is keys×m rows, not the stream. */
object HeavyHitters {

  final case class Hitter(
      event_type: String, item: String, est: Long, err: Long, n_seen: Long)

  /** The deterministic SpaceSaving fold both the processor and the
    * driver-side reference replay share: increment tracked items; grow
    * until the m-counter budget; then evict the (count, item)-minimal
    * counter, inheriting its count as the newcomer's estimate and
    * recording it as the newcomer's error bound. */
  def spaceSavingFold(
      state: Map[String, (Long, Long)],
      items: Iterator[String],
      m: Int): Map[String, (Long, Long)] = {
    var s = state
    items.foreach { x =>
      s.get(x) match {
        case Some((c, e)) => s = s.updated(x, (c + 1, e))
        case None if s.size < m => s = s.updated(x, (1L, 0L))
        case None =>
          val (jItem, (jc, _)) = s.minBy { case (it, (c, _)) => (c, it) }
          s = (s - jItem).updated(x, (jc + 1, jc))
      }
    }
    s
  }

  /** Keyed state: item → (est, err) under the m-counter budget, plus the
    * per-key item count. After each batch the processor emits the FULL
    * current sketch stamped with n_seen, so in Append mode the snapshot
    * with the maximal n_seen per key is the current one (and mid-stream
    * snapshots remain inspectable). */
  class TopKProcessor(m: Int)
      extends StatefulProcessor[String, (String, Long, String), Hitter] {
    @transient private var counters: MapState[String, (Long, Long)] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[String, (Long, Long)](
        "counters", Encoders.STRING,
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        org.apache.spark.sql.streaming.TTLConfig.NONE)
      seen = getHandle.getValueState[Long](
        "seen", Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    }

    override def handleInputRows(
        key: String,
        rows: Iterator[(String, Long, String)],
        timerValues: TimerValues): Iterator[Hitter] = {
      val sorted = rows.toArray.sortBy(_._2)
      val before = {
        val b = Map.newBuilder[String, (Long, Long)]
        counters.iterator().foreach { p => b += (p._1 -> p._2) }
        b.result()
      }
      val after = spaceSavingFold(before, sorted.iterator.map(_._3), m)
      // write back only the delta: evicted keys go, changed entries update
      (before.keySet -- after.keySet).foreach(counters.removeKey)
      after.foreach { case (it, v) =>
        if (!before.get(it).contains(v)) counters.updateValue(it, v)
      }
      val n = (if (seen.exists()) seen.get() else 0L) + sorted.length
      seen.update(n)
      after.toSeq.sortBy(_._1)
        .map { case (it, (c, e)) => Hitter(key, it, c, e, n) }.iterator
    }
  }

  /** Track heavy hitters over a keyed item stream `(key, seq, item)`
    * with an m-counter budget per key. Ordering contract: seq is
    * non-decreasing per key across micro-batches (within a batch the
    * processor sorts by it). */
  def topK(ds: Dataset[(String, Long, String)], m: Int): Dataset[Hitter] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .transformWithState(new TopKProcessor(m), TimeMode.None(), OutputMode.Append())
  }
}
