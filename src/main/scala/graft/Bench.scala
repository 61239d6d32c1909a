package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Session warmup so the alphabetically-first query doesn't absorb
    // one-time init (parquet reader, codegen infra, broadcast machinery —
    // ~6s measured): touch each fixture table once, untimed.
    // events.parquet is TIMESTAMP(NANOS): without nanosAsLong the raw read
    // aborts a job, litters stderr with a stack, and leaves events cold so
    // the first events-touching query absorbs init cost.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try {
      Seq("lineitem", "orders", "customer", "events", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count())
    } catch { case _: Throwable => () }
    // A failed query must NOT look like a fast query: report -1.0 seconds
    // as an explicit error marker instead of its (tiny) elapsed time.
    // noop sink, not count(): count() lets Catalyst prune every projected
    // column, so pure-projection queries (e.g. the parse pipeline) would
    // measure a near-empty plan; the noop write materializes every row.
    //
    // MIN OF 2 RUNS per query: this box shows transient multi-second CPU
    // spikes (noisy neighbor — the same suite measures 72s..254s on
    // identical code minutes apart). The min of two back-to-back runs
    // discards one-off spikes and first-run codegen/classload cost, so the
    // number reported is the query's steady-state cost, which is the
    // quantity comparable across rounds.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double =
        try {
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1.0
        }
      val (a, b) = (once(), once())
      // either run failing marks the query failed — a flaky query must not
      // hide behind its lucky run
      name -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // A failure must never IMPROVE the total (excluding a broken expensive
    // query would make the perf gate easier): each failed query contributes
    // a penalty of at least the healthy suite's whole wall-clock, floored
    // at 120s so a run where EVERYTHING fails fast (okSum ~ 0 — e.g. a
    // missing SF dir) still reports a total far beyond any healthy
    // baseline instead of a spuriously small okSum-scaled number.
    val okSum = results.map(_._2).filter(_ >= 0).sum
    val failures = results.count(_._2 < 0)
    val total = okSum + failures * math.max(okSum, 120.0)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failures,"sf":"$sfDir"}"""
    println(json)
    // The driver's stdout capture has truncated the front of this (long)
    // line in past rounds, losing the per-query map. Persist the full JSON
    // to a stable path the driver (or a human) can lift verbatim.
    try {
      val p = java.nio.file.Paths.get("target/bench.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.write(p, (json + "\n").getBytes("UTF-8"))
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write target/bench.json: ${e.getMessage}")
    }
    spark.stop()
  }
}
