package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Parse a flat `{"name": sec, ...}` baseline file; empty on any
    * failure (adjudication then simply disables). */
  private[graft] def loadBaseline(path: String): Map[String, Double] =
    try {
      val txt = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(path)), "UTF-8")
      """"([^"]+)"\s*:\s*([0-9][0-9.eE+-]*)""".r
        .findAllMatchIn(txt).map(m => m.group(1) -> m.group(2).toDouble).toMap
    } catch { case scala.util.control.NonFatal(_) => Map.empty }

  /** Classify a row that stayed >2× its baseline after bounded retries:
    * if the co-measured sentinels are themselves inflated vs THEIR
    * baseline rows (mean ratio > 1.5), the box is loud — "load_suspect";
    * if the sentinels sit at baseline, believe the row — "regression".
    * Pure so the decision rule is unit-testable (BenchAdjudiSpec). */
  private[graft] def classifyStubborn(
      sentinelSamples: Seq[Double],
      sentinelBaselines: Seq[Option[Double]]): String = {
    val ratios = sentinelSamples.zip(sentinelBaselines).flatMap {
      case (sv, Some(b)) if b > 0 => Some(sv / b)
      case _ => None
    }
    if (ratios.nonEmpty && ratios.sum / ratios.size > 1.5) "load_suspect"
    else "regression"
  }
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
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      try {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1.0
      }
    // LOAD SENTINEL: three fixed, cheap, plan-stable queries co-measured at
    // run start / middle / end (single-run each; they also appear min-of-2 in
    // the main map). Ambient CPU load on this box inflates every query
    // together by up to ~4x, so a single bench artifact can't otherwise
    // distinguish "this query regressed" from "the box was loud during this
    // stretch" — compare each sentinel sample against its baseline row to
    // adjudicate the run's load window from the JSON alone.
    val sentinelNames = Seq("dedup_exact", "pivot_agg", "k_anonymity")
    def sentinelSample(): Seq[Double] =
      sentinelNames.map(n => once(n, SparkEntry.queries(n)))
    // one untimed warm pass so sentinel samples measure LOAD, not first-run
    // codegen/classload (measured: a cold start sample reads 2.3 s where the
    // steady-state cost is 0.36 s — that would read as a loud box)
    sentinelSample()
    // SPARK_GRAFT_RUNS: min-of-N per query (default 2). SPARK_GRAFT_ONLY:
    // comma-separated name filter for targeted quiet-box re-records — the
    // same measurement path as a full run, so targeted rows are comparable.
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt.max(1)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    def minOfN(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (String, Double) = {
      val samples = Seq.fill(runs)(once(name, fn))
      // any run failing marks the query failed — a flaky query must not
      // hide behind its lucky run
      name -> (if (samples.exists(_ < 0)) -1.0 else samples.min)
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val (firstHalf, secondHalf) = ordered.splitAt(ordered.size / 2)
    val sentStart = sentinelSample()
    val resultsA = firstHalf.map((minOfN _).tupled)
    val sentMid = sentinelSample()
    val resultsB = secondHalf.map((minOfN _).tupled)
    val sentEnd = sentinelSample()
    val measured = resultsA ++ resultsB

    // SELF-ADJUDICATION against baseline.json (name -> authoritative
    // seconds, written by scripts/rebaseline.py from the recording run).
    // Ambient load on this box inflates rows up to ~9x; two rounds of
    // verdicts were spent hand-re-measuring such rows only to find them
    // all at-or-below baseline. Instead the bench adjudicates itself:
    // any >2x-of-baseline row is re-measured (same minOfN path, up to 2
    // bounded retries, stop early once inside 2x) AFTER the main pass,
    // both samples recorded. A row still >2x gets classified by a
    // sentinel sample taken at retry time: sentinels inflated vs their
    // own baseline rows -> "load_suspect" (the box, not the code);
    // sentinels quiet -> "regression" (believe it). The reported value
    // is the min over all samples — the steady-state cost.
    // resolve the baseline beside the classes dir too, so a driver that
    // launches from another cwd still gets adjudication: walk UP from
    // the classes location until a baseline.json appears (covers both
    // the sbt target/scala-2.13/classes layout — repo root three
    // parents up — and a flat <repo>/classes deploy)
    val classesAncestors: Seq[String] =
      try {
        val start = new java.io.File(getClass.getProtectionDomain
          .getCodeSource.getLocation.toURI)
        Iterator.iterate(start)(_.getParentFile).takeWhile(_ != null)
          .take(5).map(d => s"${d.getPath}/baseline.json").toSeq
      } catch { case scala.util.control.NonFatal(_) => Seq.empty }
    val baselinePath = sys.env.get("SPARK_GRAFT_BASELINE")
      .orElse(("baseline.json" +: classesAncestors)
        .find(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
      .getOrElse("baseline.json")
    val baseline: Map[String, Double] = loadBaseline(baselinePath)
    val maxRetries = 2
    case class Adjudicated(name: String, first: Double, samples: List[Double],
        base: Double, verdict: String, sentinel: Option[Seq[Double]])
    val adjudicated = scala.collection.mutable.ListBuffer.empty[Adjudicated]
    val results = measured.map { case (name, v) =>
      baseline.get(name) match {
        case Some(base) if v >= 0 && base > 0 && v > 2.0 * base =>
          var best = v
          var failed = false
          var tries = List.empty[Double]
          while (tries.size < maxRetries && best > 2.0 * base && !failed) {
            val s = Seq.fill(runs)(once(name, SparkEntry.queries(name)))
            val m = if (s.exists(_ < 0)) -1.0 else s.min
            tries = tries :+ m
            // minOfN's invariant holds through retries too: a query that
            // CRASHES while re-measuring is a failed query, not a healthy
            // row wearing its lucky first sample — mark it failed so the
            // failure penalty applies
            if (m < 0) failed = true
            else if (m < best) best = m
          }
          // classify the stubborn row by the box's load RIGHT NOW — a
          // fresh sentinel sample per stubborn row (a sample cached from
          // an earlier stubborn row could be minutes stale on this bursty
          // box and would misclassify a real regression as load_suspect);
          // kept WITH the row so every verdict is auditable from the
          // artifact, not just the last one
          val (verdict, rowSentinel) =
            if (failed) ("failed_on_retry", None)
            else if (best <= 2.0 * base) ("cleared", None)
            else {
              val sent = sentinelSample()
              (classifyStubborn(sent, sentinelNames.map(baseline.get)),
                Some(sent))
            }
          adjudicated += Adjudicated(name, v, tries, base, verdict, rowSentinel)
          name -> (if (failed) -1.0 else best)
        case _ => name -> v
      }
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val adjJson = {
      val rows = adjudicated.map { a =>
        s""""${a.name}":{"first":${a.first},"retries":${a.samples.mkString("[", ",", "]")},""" +
          s""""base":${a.base},"verdict":"${a.verdict}",""" +
          s""""sentinel":${a.sentinel.map(_.mkString("[", ",", "]")).getOrElse("null")}}"""
      }.mkString("{", ",", "}")
      val suspects = adjudicated.filter(_.verdict == "load_suspect").map("\"" + _.name + "\"")
      val regressions = adjudicated.filter(_.verdict == "regression").map("\"" + _.name + "\"")
      s"""{"baseline_rows":${baseline.size},"retried":$rows,""" +
        s""""load_suspect":${suspects.mkString("[", ",", "]")},""" +
        s""""regression":${regressions.mkString("[", ",", "]")}}"""
    }
    // A failure must never IMPROVE the total (excluding a broken expensive
    // query would make the perf gate easier): each failed query contributes
    // a penalty of at least the healthy suite's whole wall-clock, floored
    // at 120s so a run where EVERYTHING fails fast (okSum ~ 0 — e.g. a
    // missing SF dir) still reports a total far beyond any healthy
    // baseline instead of a spuriously small okSum-scaled number.
    val okSum = results.map(_._2).filter(_ >= 0).sum
    val failures = results.count(_._2 < 0)
    val total = okSum + failures * math.max(okSum, 120.0)
    def sentJson(xs: Seq[Double]) = xs.mkString("[", ",", "]")
    val sentinel =
      s"""{"queries":${sentinelNames.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""start":${sentJson(sentStart)},"mid":${sentJson(sentMid)},"end":${sentJson(sentEnd)}}"""
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failures,"sentinel":$sentinel,"adjudication":$adjJson,"sf":"$sfDir"}"""
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
