package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The CROSSOVER-regime in-JVM A/B the fixture indexes cannot host —
  * a synthetic 200 k-doc corpus engineered for LONG posting lists
  * (every doc carries all 50 common terms ⇒ df = 200 000 per common
  * term ⇒ a query batch over the common vocabulary matches ≥ 10⁷
  * posting rows) plus rare discriminative terms
  * (df = 100) so MaxScore's essential set is tiny. Two measurements:
  *
  *   1. `queryBatch` MaxScore pruning ON vs OFF vs the default past the
  *      round-15 auto-engage threshold (Σ df ≥ 10⁷) — the regime that
  *      gate was calibrated FOR but never measured IN (round-15
  *      measured only the losing fixture regime). THIS RUN'S RESULT
  *      REMOVED THE AUTO-ENGAGE: pruned still 2.3× slower at 10⁷
  *      matched rows, only a wash at 5× fan-out. Parity asserted
  *      (pruning must stay lossless).
  *   2. the faceted-serving screen at two facet selectivities —
  *      semi-join vs collected-id pushdown vs the auto gate
  *      (`FacetPushdownMaxIds`) on a 1 M-row matched posting set.
  *      Parity asserted (both screens must keep the same rows).
  *
  * Run with `sbt "Test/runMain graft.LexAbXl"`; TIME lines are the
  * artifact (min-of-2 per plan, fixture build excluded). */
object LexAbXl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val lq = graft.queries.LexQueries

    val nDocs = 200000L
    val commons = (0 until 50).map(i => f"c$i%02d")
    // every doc: all 50 commons + ONE rare (2 000 rares ⇒ df = 100)
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat(lit(commons.mkString(" ") + " r"),
        lpad((col("id") % 2000).cast("string"), 4, "0")).as("text"),
      when(col("id") < 100, lit("narrow")).otherwise(lit("broad")).as("source"),
      lit("xx").as("lang"))
    val idx = java.nio.file.Files.createTempDirectory("lexabxl").toString
    println(s"building 200k-doc / 10.2M-posting index at $idx ...")
    lq.buildLexIndexFrom(spark, docs, idx)
    val stats = lq.loadStats(spark, idx).cache(); stats.count()

    def timed(tag: String)(f: => Long): Double = {
      f // warm
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime; val n = f
        val s = (System.nanoTime - t0) / 1e9
        println(f"TIME $tag $s%.2f rows=$n"); s
      }
      ts.min
    }

    // ---- 1. MaxScore pruning past the round-15 auto threshold ----
    // 10 signatures, disjoint 5-common subsets + 2 rares each: the
    // batch's distinct lexicon terms cover all 50 commons (sum df =
    // 10.0M, the regime the removed auto-engage targeted) while
    // candidates are the rare matchers (~200 docs/sig)
    val sigs = (0 until 10).map { i =>
      (commons.slice(5 * i, 5 * i + 5) ++
        Seq(f"r${2 * i}%04d", f"r${2 * i + 1}%04d")).mkString(" ")
    }
    val queries = spark.createDataset(
        (0 until 200).map(i => (9000000L + i, sigs(i % sigs.size))))
      .toDF("qid", "text").cache()
    queries.count()
    def runPrune(p: Option[Boolean]) =
      lq.queryBatch(spark, queries, idx, stats, maxscorePrune = p)
    val pr = runPrune(Some(true)).collect().map(_.toSeq).sortBy(_.mkString("|"))
    val un = runPrune(Some(false)).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(pr.sameElements(un), "MaxScore pruning must stay lossless in the crossover regime")
    println(s"parity OK (${pr.length} answer rows)")
    timed("prune/on")   { runPrune(Some(true)).count() }
    timed("prune/off")  { runPrune(Some(false)).count() }
    timed("prune/auto") { runPrune(None).count() }

    // ---- 1b. the HIGH-FAN-OUT regime: signatures SHARE the long
    // posting lists, so the pre-fold (sig × posting) join multiplies
    // matched rows 5× (50M joined rows) while candidates stay tiny —
    // the regime where the fold savings could finally beat the
    // screening passes. This separates the two candidate gate metrics:
    // Σ df (matched rows, the current gate) is IDENTICAL to scenario 1,
    // but fold volume differs 5×.
    val sigsShared = (0 until 5).map { i =>
      (commons ++ Seq(f"r${100 + 2 * i}%04d", f"r${101 + 2 * i}%04d")).mkString(" ")
    }
    val queriesShared = spark.createDataset(
        (0 until 100).map(i => (9500000L + i, sigsShared(i % sigsShared.size))))
      .toDF("qid", "text").cache()
    queriesShared.count()
    def runPruneShared(p: Option[Boolean]) =
      lq.queryBatch(spark, queriesShared, idx, stats, maxscorePrune = p)
    val prS = runPruneShared(Some(true)).collect().map(_.toSeq).sortBy(_.mkString("|"))
    val unS = runPruneShared(Some(false)).collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(prS.sameElements(unS), "MaxScore pruning must stay lossless in the fan-out regime")
    timed("pruneshared/on")  { runPruneShared(Some(true)).count() }
    timed("pruneshared/off") { runPruneShared(Some(false)).count() }

    // ---- 2. faceted screen: semi-join vs pushdown vs auto ----
    // serving shape: 5-common-term multiterm top-10 (1M matched rows)
    def faceted(screen: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame) =
      lq.rankTop10(lq.multitermTotals(screen(
        lq.serveTermScores(spark, idx, commons.take(5), stats))))
    def screenOf(src: String, maxIds: Long) =
      lq.facetScreen(spark, idx, col("source") === src, pushdownMaxIds = maxIds)
    for (src <- Seq("narrow", "broad")) {
      val semi = faceted(screenOf(src, 0L)).collect().map(_.toSeq).sortBy(_.mkString("|"))
      val push = faceted(screenOf(src, 1000000L)).collect().map(_.toSeq).sortBy(_.mkString("|"))
      assert(semi.sameElements(push), s"facet screens must agree ($src)")
      timed(s"facet/$src/semijoin") { faceted(screenOf(src, 0L)).count() }
      timed(s"facet/$src/pushdown") { faceted(screenOf(src, 1000000L)).count() }
      timed(s"facet/$src/auto")     { faceted(screenOf(src, lq.FacetPushdownMaxIds)).count() }
    }
    spark.stop()
  }
}
