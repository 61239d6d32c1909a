package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

/** Lifecycle plumbing shared by the always-on serving edges
  * ([[AnnServe]], [[PqServe]]): frozen index state (centroids,
  * codebooks) is cached once at stream start, and must be released
  * exactly once when THAT query terminates — without it every serve
  * stream leaks a session-lifetime cache entry. */
private[streaming] object ServeCache {

  /** Run `release` exactly once when `q` terminates. The release is
    * guarded (idempotent) because the listener callback and the
    * already-terminated check below can race on a fast AvailableNow
    * stream; the post-registration `isActive` check covers a
    * termination event that fired before the listener existed. */
  def releaseOnTermination(spark: SparkSession, q: StreamingQuery)(
      release0: () => Unit): Unit = {
    val released = new java.util.concurrent.atomic.AtomicBoolean(false)
    def release(): Unit =
      if (released.compareAndSet(false, true)) release0()
    val qid = q.id
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == qid) { release(); spark.streams.removeListener(this) }
    }
    spark.streams.addListener(listener)
    if (!q.isActive) { release(); spark.streams.removeListener(listener) }
  }
}
