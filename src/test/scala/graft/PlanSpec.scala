package graft

import graft.queries.{AnalyticsQueries, CoreQueries, SimilarityQueries}

/** Physical-plan assertions — the 100 TB design contract, enforced:
  * filters and projections reach the parquet scan, small sides broadcast,
  * and nothing regresses into a cartesian product. */
class PlanSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.treeString

  test("schema_integrity: one aggregate pass per table — the fact tables are scanned exactly once") {
    val df = AnalyticsQueries.schemaIntegrity(spark, dir)
    val p = plan(df)
    def scans(table: String): Int = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains(s"$table.parquet"))
    // each table's pk check and ALL its fk orphan counts fold in ONE
    // aggregate over one scan — the naive per-check form scanned
    // lineitem 4 times for the same audit. Parent tables additionally
    // serve one single-column distinct-key scan per child edge.
    assert(scans("lineitem") == 1, s"lineitem must be scanned once:\n${p.take(3000)}")
    assert(scans("events") == 1)
    assert(scans("embeddings") == 1)
    assert(!p.contains("CartesianProduct"))
  }

  test("ivfpq_ann_served: serving plan is training-free and partition-pruned") {
    // build (or reuse) the persisted index, then pin the SERVING plan:
    // dynamic partition pruning gates the postings scan, and the only
    // embeddings read is the pushed-down query-vector scan — no Lloyd's
    // update, no codebook training anywhere
    val df = SimilarityQueries.ivfPqAnnServed(spark, dir)
    val p = plan(df)
    assert(p.contains("dynamicpruning"),
      s"postings scan must be dynamic-partition-pruned:\n${p.take(4000)}")
    // every embeddings scan in the serving plan is the pushed-down
    // QUERY-vector scan (vec_id < 10 in DataFilters) — the corpus is
    // never read; the DPP subquery duplicates that 10-row scan, which
    // is why there can be more than one line
    val embScans = p.linesIterator.filter(l =>
      l.contains("Scan parquet") && l.contains("embedding")).toSeq
    assert(embScans.nonEmpty && embScans.forall(_.contains("< 10")),
      s"every embeddings scan must be the pushed-down query scan:\n${embScans.mkString("\n")}")
    assert(!p.contains("collect_list(struct(cm"),
      "serving plan must not train codebooks")
  }

  test("ivfpq_rerank: shortlist is checkpoint-fed, vector fetches broadcast, no training") {
    val df = SimilarityQueries.ivfPqRerank(spark, dir)
    val p = plan(df)
    // the ADC scan ran ONCE at localCheckpoint time — the re-rank plan
    // consumes the materialized <= |Q|*k' shortlist, never the postings
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      s"re-rank must read the checkpointed shortlist:\n${p.take(3000)}")
    assert(!p.contains("dynamicpruning") && !p.contains("adist"),
      "the ADC scan must not re-run inside the re-rank plan")
    assert(!p.contains("collect_list(struct(cm"), "re-rank plan must not train codebooks")
    // both raw-vector touches are broadcast-bounded: the fetch is a
    // BroadcastHashJoin of the shortlist id set against the vector
    // store, the query side a broadcast of the <= 10-row query frame
    assert(p.linesIterator.count(_.contains("BroadcastHashJoin")) >= 2,
      s"fetch and query joins must both broadcast:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "no shuffle join anywhere in the re-rank")
  }

  test("filter_pushdown: predicates reach the parquet scan, schema pruned") {
    val p = plan(CoreQueries.filterPushdown(spark, dir))
    assert(p.contains("PushedFilters:") &&
      (p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("IsNotNull(l_shipdate")))
    assert(p.contains("EqualTo(l_returnflag,R)"))
    // projection pruning: the 11-column table reads only the 4 needed
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_partkey"))
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_shipdate"))
  }

  test("zorder_prune: 3-column scan, bounds broadcast, no cartesian blowup") {
    val p = plan(CoreQueries.zorderPrune(spark, dir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    // the 16-column table reads only the two predicate keys + orderkey
    assert(readSchema.contains("l_partkey") && readSchema.contains("l_suppkey") &&
      readSchema.contains("l_orderkey"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"))
    // the global-maxima row joins as a broadcast, never a cartesian shuffle
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q1_agg: column pruning keeps the scan narrow") {
    val p = plan(CoreQueries.q1Agg(spark, dir))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_shipdate"))
  }

  test("join_3way / join_5way: dims broadcast, no cartesian product") {
    Seq(CoreQueries.join3Way(spark, dir), AnalyticsQueries.join5Way(spark, dir))
      .foreach { df =>
        val p = plan(df)
        assert(p.contains("BroadcastHashJoin"))
        assert(!p.contains("CartesianProduct"))
      }
  }

  test("similarity queries never build an all-pairs cartesian") {
    Seq(
      SimilarityQueries.knnCosine(spark, dir),
      SimilarityQueries.annIvf(spark, dir),
      SimilarityQueries.embeddingNearDup(spark, dir),
      SimilarityQueries.minhashLsh(spark, dir),
      SimilarityQueries.ngramJaccard(spark, dir),
      graft.queries.TextQueries.simhashNearDup(spark, dir),
      SimilarityQueries.editDistanceNearDup(spark, dir),
      SimilarityQueries.semanticNearDup(spark, dir),
      SimilarityQueries.srpNearDup(spark, dir),
      SimilarityQueries.ivfPqAnn(spark, dir),
      graft.queries.TextQueries.contamination(spark, dir)
    ).foreach { df =>
      assert(!plan(df).contains("CartesianProduct"))
    }
  }

  test("hash_embed_ann: bounded centroid fold, bucket equijoin — never all-pairs") {
    val p = plan(SimilarityQueries.hashEmbedAnn(spark, dir))
    assert(!p.contains("CartesianProduct"))
    // routing: centroids come from the LIMIT-k md5 sample (bounded at any
    // corpus size), folded to a one-row array and broadcast
    assert(p.linesIterator.exists(
      _.contains(s"TakeOrderedAndProject(limit=${SimilarityQueries.IvfK}")),
      s"centroids must be the bounded LIMIT-k sample:\n$p")
    // candidate stage: an EQUIJOIN on the bucket id (hash or sort-merge —
    // never a nested loop over the corpus)
    val equijoins = p.linesIterator.filter(l =>
      (l.contains("BroadcastHashJoin") || l.contains("SortMergeJoin") ||
        l.contains("ShuffledHashJoin")) && l.contains("bucket")).toSeq
    assert(equijoins.nonEmpty, s"candidate join must equijoin on bucket:\n$p")
  }

  test("IVF centroid side is bounded: every broadcast NLJ builds from a LIMIT-k subtree") {
    // The round-4 scale-killer was k = N/50 centroids: an unconditioned
    // broadcast NLJ against a corpus-fraction set (O(N²/50) assignment,
    // unboundedly growing broadcast). The fixed-k design must show up in
    // the plan: the only nested-loop join allowed is against the one-row
    // collect_list of the TakeOrderedAndProject(k)-sampled centroids —
    // bounded at ANY corpus size. Assignment itself must add no Window
    // and no Exchange (in-row argmax over the broadcast array).
    // string-level check: executedPlan.collect does not descend into the
    // AdaptiveSparkPlan wrapper's inner plan, but treeString prints it all
    // round 17: embedding_neardup's assignment localCheckpoints, so its
    // centroid fold + NLJ run at checkpoint time and the FINAL plan reads
    // an ExistingRDD with zero nested loops — which satisfies the
    // invariant (no NLJ at all ⇒ no unbounded NLJ) a fortiori. annIvf
    // still plans the fold inline, so the bounded-NLJ shape stays pinned
    // there; for both, any NLJ that DOES appear must build from the
    // LIMIT-k fold.
    Seq(
      "annIvf" -> plan(SimilarityQueries.annIvf(spark, dir)),
      "embeddingNearDup" -> plan(SimilarityQueries.embeddingNearDup(spark, dir))
    ).foreach { case (tag, p) =>
      val nlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
      val boundedFold = p.linesIterator.count(
        _.contains(s"TakeOrderedAndProject(limit=${SimilarityQueries.IvfK}"))
      val arrayFold = p.linesIterator.count(l =>
        l.contains("functions=[collect_list"))
      if (tag == "annIvf")
        assert(nlj >= 1, s"$tag: centroid fold should broadcast-join the one-row array:\n$p")
      assert(boundedFold == nlj && arrayFold == nlj,
        s"$tag: every NLJ must build from the bounded LIMIT-k centroid fold " +
          s"(nlj=$nlj, limit-k=$boundedFold, collect_list=$arrayFold):\n$p")
    }
    // embedding_neardup has no top-k window, so the assignment's shape is
    // directly visible: no Window operator anywhere in its plan.
    val nd = plan(SimilarityQueries.embeddingNearDup(spark, dir))
    assert(!nd.contains("Window"), "IVF assignment must not plan a per-vector window")
  }

  test("quantile_bins_scalable plans no window and no sort anywhere") {
    // quantile_bins (exact ntile) is the acknowledged audit-scale form:
    // Window.orderBy with no partition key = one task sorts the world.
    // The scalable variant must show the 100 TB shape instead — a
    // distributed percentile aggregate folded to one broadcast row, then
    // a narrow map + hash aggregate. No Window, no Sort of ANY kind (the
    // percentile aggregate is ObjectHashAggregate, not SortAggregate).
    val p = plan(AnalyticsQueries.quantileBinsScalable(spark, dir))
    assert(!p.contains("Window"), s"scalable binning must not plan a window:\n$p")
    assert(!p.linesIterator.exists(_.contains("Sort [")),
      s"scalable binning must not plan any sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"cutpoint row should reach the corpus via broadcast:\n$p")
    // and the exact form really is the contrast case (keeps this test
    // honest if quantileBins is ever reworked)
    assert(plan(AnalyticsQueries.quantileBins(spark, dir)).contains("Window"))
  }

  test("topk compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan(CoreQueries.topK(spark, dir))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("window_agg scans its input exactly once (no filter-pushdown double-parse)") {
    // the TimeWindowing rule's isnotnull filter can get the whole parse
    // expression substituted into the scan, parsing every row twice; the
    // arithmetic-bucket batch path exists to avoid that — one scan, one
    // parse (PLANS.md "window_agg")
    val p = plan(CoreQueries.windowAgg(spark, dir))
    assert(p.linesIterator.count(_.contains("Scan parquet")) == 1)
    assert(p.contains("HashAggregate")) // partial+final, map-side combine
  }

  test("salted_agg: first exchange is keyed on (keys, salt), second on keys alone") {
    val p = plan(graft.queries.TextQueries.saltedAgg(spark, dir))
    val exchanges = p.linesIterator.filter(_.contains("hashpartitioning")).toSeq
    assert(exchanges.exists(_.contains("_salt")),
      "pre-aggregation shuffle must spread the hot key over salt buckets")
    assert(exchanges.exists(e => e.contains("event_type") && !e.contains("_salt")),
      "final combine shuffles on the bare keys")
  }

  test("top-k windows prune with WindowGroupLimit (knn_cosine, ann_ivf)") {
    // rank-filter top-k must push the per-partition limit into the window
    // operator, not materialize every scored pair then filter
    Seq(
      SimilarityQueries.knnCosine(spark, dir),
      SimilarityQueries.annIvf(spark, dir)
    ).foreach { df =>
      val p = plan(df)
      assert(p.contains("WindowGroupLimit"), "rank<=k must prune inside the window op")
    }
  }

  test("near-dup candidate joins are keyed on LSH signatures, not (lang, source)") {
    // The quadratic anti-pattern is a self-join keyed on low-cardinality
    // document attributes: on a real corpus one (lang, source) bucket covers
    // nearly everything. All three near-dup queries must derive candidates
    // from a band-signature equijoin instead.
    Seq(
      SimilarityQueries.ngramJaccard(spark, dir),
      SimilarityQueries.editDistanceNearDup(spark, dir)
    ).foreach { df =>
      val p = plan(df)
      assert(p.contains("sig"), "candidate pairs must come from the LSH band-signature join")
      assert(!p.contains("lang#") || !p.contains("(lang"),
        "no join keyed on lang/source")
      assert(!p.contains("CartesianProduct"))
    }
    val sp = plan(graft.queries.TextQueries.simhashNearDup(spark, dir))
    assert(sp.contains("band_val"), "simhash candidates must join on a band value")
    assert(sp.contains("65535"), "simhash bands must be 16-bit (4×16 over a 64-bit signature)")
    assert(!sp.contains("CartesianProduct"))
    // the image near-dup follows the same discipline: candidates from a
    // (band, 16-bit value) equijoin on the 8-byte perceptual hash —
    // never image×image, and no payload column through any exchange
    val pp = plan(graft.queries.TextQueries.phashNearDup(spark, dir))
    assert(pp.contains("band_val"), "phash candidates must join on a band value")
    assert(pp.contains("65535"), "phash bands must be 16-bit (4×16 over the 64-bit dHash)")
    assert(!pp.contains("CartesianProduct"))
  }

  test("tfidf_top: per-doc top-k prunes with WindowGroupLimit; df side shuffles compact keys") {
    val p = plan(graft.queries.CurationQueries.tfidfTop(spark, dir))
    assert(p.contains("WindowGroupLimit"), "rk<=3 must prune inside the window op")
    assert(!p.contains("CartesianProduct"))
    // the scan feeding tokenization reads only (doc_id, text)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("source") && !readSchema.contains("n_chars"))
  }

  test("dedup_clusters: label propagation rounds are equijoins, never cartesian") {
    val p = plan(graft.queries.CurationQueries.dedupClusters(spark, dir))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Join") || p.contains("InMemoryTableScan"))
  }

  test("cheapest_supplier: rank-1 prunes via WindowGroupLimit, dims broadcast") {
    val p = plan(AnalyticsQueries.cheapestSupplier(spark, dir))
    assert(p.contains("WindowGroupLimit"), "rk=1 must prune inside the window op")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("salted_join: join exchange is keyed on (key, salt); join is shuffled, not broadcast") {
    val p = plan(AnalyticsQueries.saltedJoin(spark, dir))
    assert(p.contains("ShuffledHashJoin"), "salting targets the no-broadcast regime")
    assert(p.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("l_orderkey") && l.contains("_salt")),
      "big side must shuffle on (l_orderkey, _salt), spreading the hot key")
  }

  test("interval_join: bucketized equijoin, never a nested-loop range join") {
    val p = plan(AnalyticsQueries.intervalJoin(spark, dir))
    assert(p.contains("BroadcastHashJoin"), "bucket equijoin must hash-join the broadcast windows")
    assert(!p.contains("BroadcastNestedLoopJoin"), "range predicate must not plan a nested loop")
    assert(!p.contains("CartesianProduct"))
  }

  test("incremental_dedup: anti-join shuffles 32-hex fingerprints, never text bodies") {
    val p = plan(graft.queries.CurationQueries.incrementalDedup(spark, dir))
    assert(p.contains("LeftAnti"), "must plan an anti-join")
    assert(!p.contains("CartesianProduct"))
    // the join operates on derived fingerprints: text must not survive
    // past the scan's projection into any exchange
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.forall(!_.contains("text#")), "no exchange may carry the text column")
  }

  test("pack_sequences: one window-sort per shard, shard is the partition key") {
    val p = plan(graft.queries.CurationQueries.packSequences(spark, dir))
    assert(p.contains("Window"), "running offset must be a window aggregate")
    assert(p.linesIterator.exists(l => l.contains("hashpartitioning") && l.contains("shard")),
      "window exchange must partition by shard")
  }

  test("embed_quantize / pii_redact: narrow scans, no shuffle at all") {
    // pure per-row transforms: the plan must be scan → project, zero exchanges
    Seq(
      graft.queries.CurationQueries.embedQuantize(spark, dir),
      graft.queries.CurationQueries.piiRedact(spark, dir),
      graft.queries.CurationQueries.sampleStratified(spark, dir),
      graft.queries.TextQueries.winnowFingerprint(spark, dir)
    ).foreach { df =>
      val p = plan(df)
      assert(!p.contains("Exchange"), s"per-row transform must not shuffle:\n$p")
    }
  }

  test("bm25_top: no tokenizer re-evaluation in scan filters, top-k prunes in the window") {
    // explode's inferred size(ws) > 0 filter must not push the whole
    // regex tokenizer into the scan as a second per-row evaluation
    // (the explode_outer formulation exists exactly to prevent that),
    // and the per-term top-10 must prune via WindowGroupLimit.
    val p = plan(graft.queries.CurationQueries.bm25Top(spark, dir))
    assert(!p.linesIterator.exists(l =>
      l.contains("Filter") && l.contains("regexp_extract_all")),
      s"tokenizer must not run inside a pushed filter:\n$p")
    assert(p.contains("WindowGroupLimit"), "rk<=10 must prune inside the window op")
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator.count(_.contains("Scan parquet")) <= 3,
      "tf, df-via-tf, and corpus stats should need at most 3 corpus scans")
  }

  test("snapshot_diff: full-outer exchanges carry fp-only rows, never text bodies") {
    // The 100 TB contract is that both corpus versions reduce to
    // (doc_id, 32-hex fp) BEFORE the full-outer join — the shuffle moves
    // 40-byte rows. Structural check on the prepared physical plan: no
    // shuffle exchange's row schema may include the text column. AQE is
    // disabled for the check because exchanges are inserted by
    // EnsureRequirements at preparation time (sparkPlan has none yet)
    // and AdaptiveSparkPlanExec hides its inner tree from collect().
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val sp = graft.queries.CurationQueries.snapshotDiff(spark, dir)
        .queryExecution.executedPlan
      assert(sp.toString.contains("FullOuter"), s"must plan a full-outer join:\n$sp")
      assert(!sp.toString.contains("CartesianProduct"))
      val shuffles = sp.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty, "the version diff is a co-partitioned shuffle join")
      shuffles.foreach { e =>
        val cols = e.output.map(_.name)
        assert(!cols.contains("text"),
          s"exchange must carry fingerprints, not text bodies: $cols")
      }
    } finally saved.fold(conf.unset("spark.sql.adaptive.enabled"))(
      conf.set("spark.sql.adaptive.enabled", _))
  }

  test("retention_cohort: the corpus-sized (user, week) activity set never broadcasts") {
    // The cohort anchor (one row per user, min(week)) is the legitimate
    // broadcast side; the distinct (user, week) activity set is
    // corpus-cardinality and must stay on the streamed/shuffled side. The
    // distinct shows up as a HashAggregate with grouping keys and ZERO
    // aggregate functions — assert no broadcast subtree contains one.
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val isDistinctAgg: PartialFunction[org.apache.spark.sql.execution.SparkPlan,
        BaseAggregateExec] = {
      case h: BaseAggregateExec
          if h.aggregateExpressions.isEmpty && h.groupingExpressions.size >= 2 => h
    }
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val sp = AnalyticsQueries.retentionCohort(spark, dir)
        .queryExecution.executedPlan
      // the pattern must match SOMETHING in the full plan, or the
      // broadcast check below is vacuous
      assert(sp.collect(isDistinctAgg).nonEmpty,
        s"expected the (user, week) distinct aggregate in the plan:\n$sp")
      sp.collect { case b: BroadcastExchangeExec => b }.foreach { b =>
        assert(b.collect(isDistinctAgg).isEmpty,
          s"corpus-sized (user, week) distinct must not sit under a broadcast:\n$b")
      }
      assert(!sp.toString.contains("CartesianProduct"))
    } finally saved.fold(conf.unset("spark.sql.adaptive.enabled"))(
      conf.set("spark.sql.adaptive.enabled", _))
  }

  test("kmeans_train2: two in-row assignment rounds, no window, no cartesian") {
    // each training round must keep the proven IVF-assignment shape: the
    // centroid set folds to one broadcast row and the argmax happens
    // in-row — never a per-(vector, centroid) window or rank shuffle.
    // Since lloydUpdate checkpoints its ≤k-row output, round 1 runs at
    // checkpoint time and the FINAL plan shows exactly the round-2
    // assignment broadcast over the checkpointed centroid frame
    val p = plan(SimilarityQueries.kmeansTrain2(spark, dir))
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 1,
      s"expected exactly the final-round one-row centroid broadcast:\n$p")
    assert(p.contains("ExistingRDD"),
      s"the trained centroids must come from the checkpointed frame:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window"),
      "assignment argmax must stay in-row; the update is a hash aggregate")
  }

  test("corpus_profile: exchanges carry compact derived columns, never text") {
    // both shuffles (fingerprint window, (lang, source) rollup) must move
    // fixed-width derived rows; the text body dies at the scan projection
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val sp = graft.queries.CurationQueries.corpusProfile(spark, dir)
        .queryExecution.executedPlan
      val shuffles = sp.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty)
      shuffles.foreach { e =>
        assert(!e.output.map(_.name).contains("text"),
          s"exchange must not carry text bodies: ${e.output.map(_.name)}")
      }
    } finally saved.fold(conf.unset("spark.sql.adaptive.enabled"))(
      conf.set("spark.sql.adaptive.enabled", _))
  }

  test("source_cap: per-source cap prunes with WindowGroupLimit") {
    val p = plan(graft.queries.CurationQueries.sourceCap(spark, dir))
    assert(p.contains("WindowGroupLimit"),
      s"rnk<=cap must prune inside the window op, bounding a skewed source's shuffle rows:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("token_budget_select: no unpartitioned window ever consumes corpus rows") {
    // The naive greedy is a running sum over ONE global sort — the
    // single-task shape quantile_bins documents as its own scale-killer.
    // The shipped rewrite may use an unpartitioned window ONLY on the
    // ≤32-row band-totals frame: assert every empty-partition WindowExec
    // sits above a grouping aggregate, and that the per-document running
    // sum is a partitioned window. AQE off so the prepared plan exposes
    // the full operator tree to collect().
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val sp = graft.queries.CurationQueries.tokenBudgetSelect(spark, dir)
        .queryExecution.executedPlan
      val wins = sp.collect { case w: WindowExec => w }
      val global = wins.filter(_.partitionSpec.isEmpty)
      assert(global.nonEmpty, s"the prefix-offset window is unpartitioned by design:\n$sp")
      global.foreach { w =>
        assert(w.collectFirst {
          case a: BaseAggregateExec if a.groupingExpressions.nonEmpty => a
        }.isDefined,
          s"unpartitioned window must consume the band-totals aggregate, never corpus rows:\n$w")
      }
      assert(wins.exists(_.partitionSpec.nonEmpty),
        "per-document running sum must be a band-partitioned window")
      assert(!sp.toString.contains("CartesianProduct"))
    } finally saved.fold(conf.unset("spark.sql.adaptive.enabled"))(
      conf.set("spark.sql.adaptive.enabled", _))
  }

  test("score_agreement: both Spearman ranks are banded — no corpus-global sort") {
    // Each rank used to be row_number over a corpus-global Window.orderBy
    // — a single-task total sort of the whole joined frame, twice. The
    // banded rewrite computes prefix offsets driver-side from the ≤32²
    // band-counts collect, so NO unpartitioned window should exist at
    // all (any that appears must at least sit above a grouping
    // aggregate, never corpus rows), and the per-document rank windows
    // are band-partitioned.
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val sp = graft.queries.TextQueries.scoreAgreement(spark, dir)
        .queryExecution.executedPlan
      val wins = sp.collect { case w: WindowExec => w }
      val global = wins.filter(_.partitionSpec.isEmpty)
      global.foreach { w =>
        assert(w.collectFirst {
          case a: BaseAggregateExec if a.groupingExpressions.nonEmpty => a
        }.isDefined,
          s"unpartitioned window must consume a band-counts aggregate, never corpus rows:\n$w")
      }
      assert(wins.count(_.partitionSpec.nonEmpty) >= 2,
        "both per-document rank windows must be band-partitioned")
      assert(!sp.toString.contains("CartesianProduct"))
    } finally saved.fold(conf.unset("spark.sql.adaptive.enabled"))(
      conf.set("spark.sql.adaptive.enabled", _))
  }

  test("rank_fusion: every rank window consumes a TakeOrderedAndProject-pruned frame") {
    // both arms and the fused ranking are top-k: the distributed limit
    // must run BEFORE each unpartitioned row_number, so no window ever
    // sees more than the pruned ≤50/≤100 rows
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.window.WindowExec
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val sp = graft.queries.CurationQueries.rankFusion(spark, dir)
        .queryExecution.executedPlan
      val wins = sp.collect { case w: WindowExec => w }
      assert(wins.nonEmpty)
      wins.foreach { w =>
        assert(w.collectFirst { case t: TakeOrderedAndProjectExec => t }.isDefined,
          s"a rank window without an upstream top-k would sort an unbounded frame:\n$w")
      }
      assert(!sp.toString.contains("CartesianProduct"))
    } finally saved.fold(conf.unset("spark.sql.adaptive.enabled"))(
      conf.set("spark.sql.adaptive.enabled", _))
  }

  test("weighted_sample: priority top-k is TakeOrderedAndProject; windows see only the pruned frame") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.window.WindowExec
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      // the corpus-wide selection must be the per-partition-heap limit,
      // never a global sort of all priorities
      val spTop = graft.queries.CurationQueries.weightedSampleTop(spark, dir, 100)
        .queryExecution.executedPlan
      assert(spTop.collectFirst { case t: TakeOrderedAndProjectExec => t }.isDefined,
        s"priority top-k must plan as TakeOrderedAndProject:\n$spTop")
      // downstream, the only window runs on the checkpointed ≤101-row frame
      val sp = graft.queries.CurationQueries.weightedSample(spark, dir)
        .queryExecution.executedPlan
      val wins = sp.collect { case w: WindowExec => w }
      assert(wins.nonEmpty)
      wins.foreach { w =>
        assert(!w.treeString.contains("FileScan"),
          s"rank window must consume the bounded checkpointed frame, not a corpus scan:\n$w")
      }
      assert(!sp.treeString.contains("CartesianProduct"))
    } finally saved.fold(conf.unset("spark.sql.adaptive.enabled"))(
      conf.set("spark.sql.adaptive.enabled", _))
  }

  test("winsorize / robust_zscore: series-level stats broadcast back; no corpus window, no cartesian") {
    import org.apache.spark.sql.execution.window.WindowExec
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      Seq(
        AnalyticsQueries.winsorize(spark, dir),
        AnalyticsQueries.robustZscore(spark, dir)
      ).foreach { df =>
        val sp = df.queryExecution.executedPlan
        assert(sp.toString.contains("BroadcastHashJoin"),
          s"series-level stats must broadcast onto the scan:\n$sp")
        assert(sp.collect { case w: WindowExec => w }.isEmpty,
          s"clamp/score must be a narrow map, not a window:\n$sp")
        assert(!sp.toString.contains("CartesianProduct"))
      }
    } finally saved.fold(conf.unset("spark.sql.adaptive.enabled"))(
      conf.set("spark.sql.adaptive.enabled", _))
  }

  test("substring_dedup: exchanges carry only (doc_id, pos, h) — never shingle text or token arrays") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val sp = graft.queries.TextQueries.substringDedup(spark, dir)
        .queryExecution.executedPlan
      val shuffles = sp.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty)
      shuffles.foreach { e =>
        val names = e.output.map(_.name)
        assert(!names.contains("text") && !names.contains("ws") && !names.contains("sg"),
          s"exchange must not carry document bodies, token arrays, or shingle text: $names")
        e.output.foreach(a =>
          assert(!a.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType],
            s"exchange must not carry arrays: ${a.name}"))
      }
      assert(!sp.toString.contains("CartesianProduct"))
    } finally saved.fold(conf.unset("spark.sql.adaptive.enabled"))(
      conf.set("spark.sql.adaptive.enabled", _))
  }

  test("lm_score: exchanges carry compact model keys, never text or token arrays") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val sp = graft.queries.TextQueries.lmScore(spark, dir)
        .queryExecution.executedPlan
      val shuffles = sp.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty)
      shuffles.foreach { e =>
        val names = e.output.map(_.name)
        assert(!names.contains("text") && !names.contains("ws"),
          s"exchange must not carry document bodies or token arrays: $names")
      }
      assert(!sp.toString.contains("CartesianProduct"))
    } finally saved.fold(conf.unset("spark.sql.adaptive.enabled"))(
      conf.set("spark.sql.adaptive.enabled", _))
  }

  test("cluster_eval: no cartesian; every window is partitioned over aggregated rows") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.window.WindowExec
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val sp = graft.queries.SimilarityQueries.clusterEval(spark, dir)
        .queryExecution.executedPlan
      val wins = sp.collect { case w: WindowExec => w }
      assert(wins.nonEmpty)
      wins.foreach { w =>
        assert(w.partitionSpec.nonEmpty,
          s"cluster_eval must never plan an unpartitioned window:\n$w")
        assert(w.collectFirst {
          case a: BaseAggregateExec if a.groupingExpressions.nonEmpty => a
        }.isDefined,
          "the majority window consumes the (bucket, label) aggregate, never corpus rows")
      }
      assert(!sp.toString.contains("CartesianProduct"))
    } finally saved.fold(conf.unset("spark.sql.adaptive.enabled"))(
      conf.set("spark.sql.adaptive.enabled", _))
  }

  test("AQE skew join splits the hot partition (the automatic path beside salted_join)") {
    // salted_join is the manual fallback; the FIRST line of defense at
    // scale is AQE's skew split, which subdivides an oversized shuffle
    // partition into parallel sub-joins at runtime. Thresholds are
    // production-sized (256 MB), so pin the behavior at test scale by
    // lowering them; the marker is `skew=true` on the join node of the
    // adaptively re-planned (executed) query.
    import spark.implicits._
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled"
    )
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 90% of the fact side lands on key 7
      val fact = (1 to 100000)
        .map(i => (if (i % 10 == 0) i.toLong else 7L, i.toLong)).toDF("k", "v")
      val dim = (1L to 100000L).map(k => (k, s"d$k")).toDF("k", "name")
      val joined = fact.join(dim, "k")
      // collect() executes THIS Dataset's queryExecution, which is what
      // AQE re-plans in place — a count() would execute a different one
      val rows = joined.collect().length
      assert(rows == 100000, s"join result wrong: $rows")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the hot partition skew=true:\n${plan.take(3000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // The 100 TB semi-join-reduction lever: when a selective dimension
    // filter survives into a shuffle join, Spark's InjectRuntimeFilter
    // builds a bloom filter on the small (creation) side and applies it
    // at the big (application) side's scan — rows that cannot join are
    // dropped BEFORE the exchange. Defaults gate it on a ≥10 GB probe
    // scan, so fixture-scale plans never show it; pin the behavior here
    // with the thresholds lowered and broadcast disabled (a broadcast
    // join needs no bloom — the runtime filter matters exactly when the
    // join must shuffle).
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = graft.sources.Tables.lineitem(spark, dir)
      val ord = graft.sources.Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey"), col("o_orderdate"))
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderdate")).agg(sum(col("l_quantity")).as("qty"))
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain") || p.contains("bloom_filter"),
        s"expected an injected runtime bloom filter on the probe side:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("lloyd round 1 (the checkpoint-time job) keeps the in-row broadcast-argmax shape") {
    // lloydUpdate's eager checkpoint removed round 1 from every final
    // plan, so the per-round contract is pinned on the pre-checkpoint
    // frame directly: one one-row seed-centroid broadcast, in-row
    // argmax, a map-combinable compact update — no window, no cartesian
    val p = plan(SimilarityQueries.lloydRound1Plan(spark, dir))
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 1,
      s"round 1 must assign under exactly one one-row centroid broadcast:\n$p")
    assert(p.linesIterator.exists(
      _.contains(s"TakeOrderedAndProject(limit=${SimilarityQueries.IvfK}")),
      s"the broadcast must build from the bounded LIMIT-k seed fold:\n$p")
    assert(!p.contains("Window"),
      "round-1 assignment must argmax in-row, never via a rank window")
    assert(!p.contains("CartesianProduct"))
  }

  test("pq_encode: both code assignments are in-row broadcast argmins, no window") {
    // seed assign + trained re-encode must each fold the codebook to one
    // broadcast row and argmin in-row (the kmeans_train2 contract, per
    // subspace) — never a per-(subvector, code) rank shuffle. pqTrain
    // checkpoints the trained codebook, so the seed-assign round runs at
    // checkpoint time and the FINAL plan shows exactly the re-encode
    // broadcast over the checkpointed codebook
    val p = plan(SimilarityQueries.pqEncode(spark, dir))
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 1,
      s"expected exactly the re-encode one-row codebook broadcast:\n$p")
    assert(p.contains("ExistingRDD"),
      s"the trained codebook must come from the checkpointed frame:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window"),
      "code argmin must stay in-row; the Lloyd's update is a hash aggregate")
  }

  test("pca_power: matvec rounds are one-row broadcasts, no cartesian, no window") {
    // each power-iteration round: the current direction folds to ONE
    // broadcast row (BroadcastNestedLoopJoin, free by construction), the
    // per-(row, dim) quantization is a narrow map, and the only corpus
    // shuffle is the map-combinable (pos) hash aggregate
    val p = plan(SimilarityQueries.pcaPower(spark, dir))
    // each of the 3 rounds re-derives the centered frame (one mean
    // broadcast) and broadcasts its direction: 3 × 2 one-row joins
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) == 6,
      s"expected a mean + direction one-row broadcast per round:\n$p")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("Window"),
      "the matvec must be a hash aggregate, never a rank/window shuffle")
  }

  test("vocab_coverage: the vocabulary broadcasts; bpe_pairs: top-k prunes, no corpus window") {
    val pv = plan(graft.queries.TextQueries.vocabCoverage(spark, dir))
    assert(pv.contains("BroadcastHashJoin"),
      s"the 100-row vocabulary must broadcast onto the token stream:\n$pv")
    assert(!pv.contains("CartesianProduct"))
    val pb = plan(graft.queries.TextQueries.bpePairs(spark, dir))
    assert(pb.contains("TakeOrderedAndProject"),
      s"the pair ranking must prune to 50 rows via top-k, not a global sort:\n$pb")
    assert(!pb.contains("CartesianProduct"))
  }

  test("ohlc_agg: one aggregate, no window; gap_fill/anomaly_zscore: windows keyed by series") {
    import org.apache.spark.sql.execution.window.WindowExec
    val po = plan(AnalyticsQueries.ohlcAgg(spark, dir))
    assert(!po.contains("Window"),
      s"open/close must resolve in the aggregate via struct extremes, not a rank window:\n$po")
    assert(!po.contains("CartesianProduct"))
    // every window in the gap-fill and anomaly paths must be partitioned
    // (by event_type) — an unpartitioned window would serialize the grid.
    // AQE off so the prepared plan exposes the operator tree to collect()
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      Seq(AnalyticsQueries.gapFill(spark, dir), AnalyticsQueries.anomalyZscore(spark, dir))
        .foreach { df =>
          val sp = df.queryExecution.executedPlan
          val wins = sp.collect { case w: WindowExec => w }
          assert(wins.nonEmpty)
          assert(wins.forall(_.partitionSpec.nonEmpty),
            s"all time-series windows must partition by series:\n$sp")
          assert(!sp.treeString.contains("CartesianProduct"))
        }
    } finally saved.foreach(conf.set("spark.sql.adaptive.enabled", _))
  }

  test("series_rate: lag window keyed by series; seasonal_anomaly: profile broadcasts, no window") {
    import org.apache.spark.sql.execution.window.WindowExec
    // the rate query's only window is the per-series lag over the compact
    // mean frame — an unpartitioned window would serialize the series grid
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val sp = AnalyticsQueries.seriesRate(spark, dir).queryExecution.executedPlan
      val wins = sp.collect { case w: WindowExec => w }
      assert(wins.nonEmpty)
      assert(wins.forall(_.partitionSpec.nonEmpty),
        s"the lag window must partition by series:\n$sp")
      assert(!sp.treeString.contains("CartesianProduct"))
    } finally saved.foreach(conf.set("spark.sql.adaptive.enabled", _))
    // the seasonal profile is series × 24 rows: it must come back as a
    // broadcast join over the mean frame, and the z-score needs no window
    val ps = plan(AnalyticsQueries.seasonalAnomaly(spark, dir))
    assert(ps.contains("BroadcastHashJoin"),
      s"the (series, hod) profile must broadcast onto the mean frame:\n$ps")
    assert(!ps.contains("Window"),
      s"profile z is a join + arithmetic — a window here would re-sort the frame:\n$ps")
    assert(!ps.contains("CartesianProduct"))
    // the pair alignment joins two compact mean frames on the bucket id —
    // one side broadcasts, and the moments need no window either
    val pc = plan(AnalyticsQueries.seriesCorrelation(spark, dir))
    assert(pc.contains("BroadcastHashJoin"),
      s"the bucket-aligned pair join must broadcast one mean frame:\n$pc")
    assert(!pc.contains("Window") && !pc.contains("CartesianProduct"))
  }

  test("rolling_median / series_autocorr / series_cusum: windows partition by series; dup_matrix joins stay equi") {
    import org.apache.spark.sql.execution.window.WindowExec
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      // every window in the three time-series queries must partition by
      // the series key — an unpartitioned window would serialize the
      // bounded mean frame through one task
      Seq(
        AnalyticsQueries.rollingMedian(spark, dir),
        AnalyticsQueries.seriesAutocorr(spark, dir),
        AnalyticsQueries.seriesCusum(spark, dir),
        AnalyticsQueries.seriesDecompose(spark, dir),
        AnalyticsQueries.seriesEwma(spark, dir),
        AnalyticsQueries.volumeAnomaly(spark, dir)
      ).foreach { df =>
        val sp = df.queryExecution.executedPlan
        val wins = sp.collect { case w: WindowExec => w }
        assert(wins.nonEmpty)
        assert(wins.forall(_.partitionSpec.nonEmpty),
          s"all time-series windows must partition by series:\n$sp")
        assert(!sp.treeString.contains("CartesianProduct"))
      }
    } finally saved.foreach(conf.set("spark.sql.adaptive.enabled", _))
    // the per-series totals frame is one row per series — it must come
    // back as a broadcast join, not a shuffle of the mean frame
    val pc = plan(AnalyticsQueries.seriesCusum(spark, dir))
    assert(pc.contains("BroadcastHashJoin"),
      s"per-series totals must broadcast onto the mean frame:\n$pc")
    // the source rollup joins candidates to (doc_id, source) by id —
    // LSH-bounded equijoins, never a cartesian
    val pd = plan(SimilarityQueries.dupMatrix(spark, dir))
    assert(!pd.contains("CartesianProduct"))
    // source_similarity: the exact side must pair sources via the
    // hash-keyed equijoin (plus the < filter), never a cartesian; the
    // sketch/size attachments are source-keyed equijoins
    val ps = plan(SimilarityQueries.sourceSimilarity(spark, dir))
    assert(!ps.contains("CartesianProduct") && !ps.contains("BroadcastNestedLoop"),
      s"source pairing must stay an equijoin:\n$ps")
    // unpivot is a single Expand over the aggregated frame — a union
    // re-scan would read the corpus once per measure
    val pu = plan(AnalyticsQueries.unpivotStats(spark, dir))
    assert(pu.contains("Expand"), s"unpivot must plan as Expand:\n$pu")
    assert(pu.linesIterator.count(_.contains("FileScan")) == 1,
      s"unpivot must not re-scan per measure:\n$pu")
    // cms_topk: the 4096-row counter table broadcasts onto the probe
    // side; the top-50 probe is a TakeOrderedAndProject, not a sort
    val pm = plan(graft.queries.TextQueries.cmsTopk(spark, dir))
    assert(pm.contains("BroadcastHashJoin"),
      s"counter table must broadcast:\n$pm")
    assert(pm.contains("TakeOrderedAndProject"),
      s"top-50 probe must be a top-k, not a global sort:\n$pm")
    // semantic_threshold_sweep: pair space bucket-bounded (never
    // cartesian), and the Generate (explode) must see only the scalar
    // cosine — exploding rows that still carry embeddings would 13×
    // the vector bytes in flight
    val pw = plan(SimilarityQueries.semanticThresholdSweep(spark, dir))
    assert(!pw.contains("CartesianProduct"))
    val genLines = pw.linesIterator.filter(_.contains("Generate explode")).toSeq
    assert(genLines.nonEmpty && genLines.forall(l => !l.contains("embedding")),
      s"the threshold explode must not carry embedding columns:\n$pw")
  }

  test("pq_ann: distance tables broadcast onto the codes table, top-k prunes in the window") {
    val p = plan(SimilarityQueries.pqAnn(spark, dir))
    // the Q×M×K distance table must broadcast-hash-join the encoded
    // corpus on (subspace, code) — the corpus side never shuffles for it
    assert(p.contains("BroadcastHashJoin"),
      s"ADC lookup must be a broadcast equijoin on (subspace, code):\n$p")
    assert(p.contains("WindowGroupLimit"), "rn<=3 must prune inside the window op")
    assert(!p.contains("CartesianProduct"))
  }

  test("filter_cascade / join_size_est / bloom_prune / forecast & holt: scale shapes hold") {
    // filter_cascade: the fp window is the only corpus shuffle and text
    // never rides an exchange
    val fc = plan(graft.queries.CurationQueries.filterCascade(spark, dir))
    assert(!fc.contains("CartesianProduct"))
    val fcEx = fc.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(fcEx.nonEmpty && fcEx.forall(l => !l.contains("text#")),
      s"document text must not be a shuffle payload:\n$fc")

    // join_size_est: sketch cells fold map-side (partial_count before the
    // exchange), never a join of the raw sides
    val js = plan(AnalyticsQueries.joinSizeEst(spark, dir))
    assert(!js.contains("CartesianProduct"))
    assert(js.contains("partial_count") || js.contains("partial count"),
      s"cell counts must pre-aggregate map-side:\n$js")

    // bloom_prune: the probe side passes a BROADCAST semi-join — the
    // probe is never shuffled for the membership test
    val bp = plan(AnalyticsQueries.bloomPrune(spark, dir))
    assert(!bp.contains("CartesianProduct"))
    assert(bp.contains("BroadcastHashJoin") && bp.contains("LeftSemi"),
      s"bit-set membership must be a broadcast semi-join:\n$bp")

    // time-series pair: no corpus-global window, no single-partition sort
    Seq(AnalyticsQueries.forecastEval(spark, dir),
      AnalyticsQueries.holtForecast(spark, dir)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"))
      assert(!p.contains("Exchange SinglePartition"),
        s"per-series work must stay series-partitioned:\n$p")
    }
  }

  test("round-9 additions: partitioned windows, broadcast semi/cross, no cartesian") {
    // rolling_actives: the window-hour membership test is a BROADCAST
    // semi-join and nothing runs in a single partition
    val ra = plan(AnalyticsQueries.rollingActives(spark, dir))
    assert(ra.contains("LeftSemi") && !ra.contains("CartesianProduct"))
    assert(!ra.contains("Exchange SinglePartition"),
      s"rolling_actives must stay key-partitioned:\n$ra")
    // theil_sen / value_runs / pareto_front: per-key windows only
    Seq(AnalyticsQueries.theilSen(spark, dir),
      AnalyticsQueries.valueRuns(spark, dir),
      AnalyticsQueries.paretoFront(spark, dir)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"))
      assert(!p.contains("Exchange SinglePartition"),
        s"per-key work must stay partitioned:\n$p")
    }
    // prefix_join: candidates come from an EQUIJOIN on the prefix hash —
    // never a cartesian — and verification joins back by doc_id
    val pj = plan(SimilarityQueries.prefixJoin(spark, dir))
    assert(!pj.contains("CartesianProduct") && !pj.contains("BroadcastNestedLoopJoin"),
      s"prefix candidates must be hash-equijoined:\n$pj")
    // linear_probe / cuped_ab: the model/moment row broadcasts; the only
    // joins are one-row broadcast crosses
    Seq(SimilarityQueries.linearProbe(spark, dir),
      AnalyticsQueries.cupedAb(spark, dir)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct"))
      assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
        s"the one-row frame must broadcast:\n$p")
    }
  }

  test("round-9 continuation: retrieval/merge/eval additions keep their scale shapes") {
    // mrl_recall: both passes prune per-query top-k in WindowGroupLimit;
    // the only non-equi join is the broadcast of the 10-row query set
    val mrl = plan(SimilarityQueries.mrlRecall(spark, dir))
    assert(mrl.contains("WindowGroupLimit") && !mrl.contains("CartesianProduct"))
    assert(mrl.contains("BroadcastExchange"), s"query set must broadcast:\n$mrl")
    // benford_audit: expectation/totals broadcast onto the 45-group
    // aggregate; nothing sorts globally
    val ben = plan(AnalyticsQueries.benfordAudit(spark, dir))
    assert(ben.contains("BroadcastHashJoin") && !ben.contains("CartesianProduct"))
    assert(!ben.contains("Exchange SinglePartition"),
      s"benford_audit must stay key-partitioned:\n$ben")
    // incremental_stats: two partial day-state aggregations merge through
    // a Union — re-aggregation, never a raw-history rescan join
    val inc = plan(AnalyticsQueries.incrementalStats(spark, dir))
    assert(inc.contains("Union") && inc.contains("HashAggregate") &&
      !inc.contains("CartesianProduct"))
    // upsert_merge: base and delta elect per-key argmax via mergeable
    // aggregates, then a FULL OUTER equijoin on the shared grouping key
    val up = plan(AnalyticsQueries.upsertMerge(spark, dir))
    assert(up.contains("FullOuter") && !up.contains("CartesianProduct"))
    // link_predict: wedges/degrees/anti-join are ALL hash equijoins on
    // compact ids — a cartesian or nested-loop here would be corpus²
    val lp = plan(SimilarityQueries.linkPredict(spark, dir))
    assert(!lp.contains("CartesianProduct"), s"link_predict cartesian:\n$lp")
    // model_auc / calibration_bins: the coefficient row broadcasts;
    // calibration has NO window at all (its rollup is 10 groups)
    val auc = plan(SimilarityQueries.modelAuc(spark, dir))
    assert(auc.contains("BroadcastExchange") && !auc.contains("CartesianProduct"))
    val cal = plan(SimilarityQueries.calibrationBins(spark, dir))
    assert(!cal.contains("Window") && !cal.contains("CartesianProduct"),
      s"calibration_bins must not window:\n$cal")
  }

  test("round-9 close: analytics additions keep their scale shapes") {
    // sample_mean_ci / rfm_segments: no window at all (cutpoints and
    // totals are one-row broadcasts; rfm's SinglePartition exchanges
    // only merge groupless one-row aggregate partials, which is fine)
    Seq(AnalyticsQueries.sampleMeanCi(spark, dir),
      AnalyticsQueries.rfmSegments(spark, dir)).foreach { df =>
      val p = plan(df)
      assert(!p.contains("CartesianProduct") && !p.contains("Window"), p)
    }
    // cohort_value: the cumulative window partitions by cohort — never
    // an unpartitioned corpus sort
    val cv = plan(AnalyticsQueries.cohortValue(spark, dir))
    assert(!cv.contains("CartesianProduct"))
    assert(!cv.contains("Exchange SinglePartition"),
      s"cohort_value must stay key-partitioned:\n$cv")
    // attribution_linear: single pass over the pair frame — exactly ONE
    // user-keyed join (an aggregate+rejoin shape would show two)
    val at = plan(AnalyticsQueries.attributionLinear(spark, dir))
    assert(!at.contains("CartesianProduct"))
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(at).length == 1, s"attribution_linear must join once:\n$at")
    // markov_eval: the transition model reaches the test rollup as a
    // broadcast, never a shuffled join of two corpus-derived sides
    val mk = plan(AnalyticsQueries.markovEval(spark, dir))
    assert(mk.contains("BroadcastHashJoin") && !mk.contains("CartesianProduct"))
    // dup_modularity: edge folds over the checkpointed compact list; the
    // one-row m frame broadcasts
    val dm = plan(SimilarityQueries.dupModularity(spark, dir))
    assert(!dm.contains("CartesianProduct"))
    assert(dm.contains("BroadcastExchange"), s"m must broadcast:\n$dm")
  }

  test("every served-index path is dynamic-partition-pruned (raw IVF, trained IVF, hash-embed IVF)") {
    // ivfpq_ann_served has its own dedicated pin above; these three share
    // serveAgainstIndex, whose bucket-partitioned posting read must stay
    // gated by the probed-bucket set at ANY index size
    Seq(
      "ann_ivf_served" -> SimilarityQueries.annIvfServed(spark, dir),
      "ann_ivf_trained_served" -> SimilarityQueries.annIvfTrainedServed(spark, dir),
      "hash_embed_ann_served" -> SimilarityQueries.hashEmbedAnnServed(spark, dir)
    ).foreach { case (name, df) =>
      val p = plan(df)
      assert(p.contains("dynamicpruning"),
        s"$name postings scan must be dynamic-partition-pruned:\n${p.take(3000)}")
      assert(!p.contains("CartesianProduct"))
    }
  }

  test("curated corpus: one-scan flag cascade — bounded documents scans, no cartesian") {
    val df = graft.queries.CurationQueries.curatedCorpus(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"))
    // the composed 5-stage cascade folds as conditional windows over ONE
    // tokenize chain; the only extra corpus read is the (checkpointed)
    // cluster chain's singleton rejoin — a regression to per-stage frames
    // or an uncheckpointed rate fold reads documents 6+ times
    val docScans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("documents.parquet"))
    assert(docScans <= 2, s"flag cascade must not re-derive the corpus per stage ($docScans scans):\n${p.take(3000)}")
  }

  test("bootstrap_watermark: restart scan prunes to the latest event_date partition") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_bootstrap").toString
    val day = java.time.LocalDate.of(2026, 8, 12)
    def ms(off: Long): Long = day.plusDays(off)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    val pts = Seq(0L, 1L, 2L).map(off => (ms(off) + off, "DOUBLE", "1.0"))
      .toDF("time", "measure_value_type", "measure_value")
    new graft.sink.Sinks.ParquetTableSink(base, datePartitioned = true).write(pts, 0L)
    // the pruned scan carries a partition filter — no data filter on time
    val scan = graft.streaming.Pipeline.LateRouter.bootstrapScan(spark, s"$base/data")
    val p = scan.queryExecution.executedPlan.treeString
    assert(p.contains("PartitionFilters") && p.contains("event_date"),
      s"bootstrap scan must filter on the partition column:\n$p")
    // physical proof: poison the OLDER partitions with a huge time value —
    // a full-table scan would surface it; the pruned scan never reads them
    Seq(0L, 1L).foreach { off =>
      val d = s"$base/data/event_date=${day.plusDays(off)}"
      Seq((Long.MaxValue / 2, "DOUBLE", "9.9"))
        .toDF("time", "measure_value_type", "measure_value")
        .write.mode("overwrite").parquet(d)
    }
    val wm = graft.streaming.Pipeline.LateRouter
      .bootstrapWatermark(spark, s"$base/data")
    assert(wm.contains(ms(2) + 2),
      s"watermark must come from the latest partition only, got $wm")
    // unpartitioned sinks still bootstrap via the full-scan fallback
    val flat = java.nio.file.Files.createTempDirectory("graft_bootstrap_flat").toString
    new graft.sink.Sinks.ParquetTableSink(flat).write(pts, 0L)
    assert(graft.streaming.Pipeline.LateRouter
      .bootstrapWatermark(spark, s"$flat/data").contains(ms(2) + 2))
  }

  test("facet profiles read ZERO data columns: every scan's ReadSchema is struct<>") {
    // the profile rows fold entirely from the attrs trees' partition
    // metadata — a regression that pulls a data column (vec_id, doc_id)
    // into the plan turns an O(metadata) pre-flight into a sidecar scan
    val profiles = Seq[org.apache.spark.sql.DataFrame](
      SimilarityQueries.vecFacetProfile(spark, dir),
      SimilarityQueries.ivfPqFacetProfile(spark, dir),
      SimilarityQueries.lshFacetProfile(spark, dir))
    profiles.foreach { df =>
      val p = plan(df)
      val rs = p.linesIterator.filter(_.contains("ReadSchema")).toSeq
      assert(rs.nonEmpty && rs.forall(_.contains("struct<>")),
        s"profile plan must read zero data columns:\n${rs.mkString("\n")}")
    }
  }

  test("full-surface window-boundedness pin: no declared query introduces an unaudited unpartitioned WindowExec") {
    // VERDICT r16 item 6: the `WindowExec: No Partition Defined` warning
    // was adjudicated by human audit each round — this makes it
    // mechanical. Every declared query's physical plan is walked; an
    // unpartitioned WindowExec is acceptable ONLY when the plan itself
    // bounds its input (a GlobalLimit / TakeOrderedAndProject below it,
    // or a one-row/local frame) or the query is on the audited
    // allowlist below, each entry justified. A future query that adds
    // an unbounded global sort/rank fails here by name.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec,
      TakeOrderedAndProjectExec, LocalTableScanExec, RDDScanExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    // audited: unpartitioned windows whose inputs are bounded by
    // CONSTRUCTION (not visible as a limit in the plan) — the human
    // audit, recorded once, enforced thereafter
    val audited: Map[String, String] = Map(
      "token_budget_select" -> "global window consumes the <=32-row band-totals aggregate (own PlanSpec test)",
      "hybrid_served" -> "arms TakeOrderedAndProject to 50 rows before the global fuse window",
      "hybrid_filtered" -> "same bounded-arm fuse, facet-screened",
      "quantile_bins" -> "documented single-task scale-killer row: the DOCUMENTED alternative to percentile_approx, kept as the exactness contrast",
      "lsh_recall" -> "global stats over the <=|truth-sample| audit frame",
      "lsh_recall_sampled" -> "global stats over the fixed-1000-doc sample frame",
      "topk" -> "rank over the already-limited top-k frame",
      "bootstrap_ci" -> "window over the <=B-row resample-means frame")
    def bounded(w: WindowExec): Boolean =
      w.child.collectFirst {
        case _: GlobalLimitExec => ()
        case _: LocalLimitExec => ()
        case _: TakeOrderedAndProjectExec => ()
        case _: LocalTableScanExec => ()
        case _: RDDScanExec => () // localCheckpoint-fed bounded shortlists
        case a: BaseAggregateExec if a.groupingExpressions.isEmpty => () // one-row aggregate
      }.isDefined
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.adaptive.enabled")
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        val sp = fn(spark, dir).queryExecution.executedPlan
        val unpart = sp.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
        if (unpart.exists(w => !bounded(w)) && !audited.contains(name))
          offenders += name
      }
    } finally saved.fold(conf.unset("spark.sql.adaptive.enabled"))(
      conf.set("spark.sql.adaptive.enabled", _))
    assert(offenders.isEmpty,
      s"unaudited unpartitioned WindowExec over possibly-unbounded input in: " +
        s"${offenders.mkString(", ")} - bound the input or add an audited " +
        "allowlist entry with its justification")
  }
}
