package graft

import graft.functions.TextFunctions
import graft.queries.{AnalyticsQueries, CoreQueries, CurationQueries, LexQueries, SimilarityQueries, TextQueries}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extensions) is exposed as a named query here, with matching ANSI SQL the
  * driver runs in DuckDB over the same parquet tables. Column names are
  * aliased identically on both sides — the driver's compare sorts columns
  * by name before hashing values.
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.1): log-parse → event-time → 10s tumbling
    * windowed aggregation, on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.windowAgg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (CoreQueries.q1Agg _),
    "parse_logs" -> (CoreQueries.parseLogs _),
    "window_agg" -> (CoreQueries.windowAgg _),
    "late_split" -> (CoreQueries.lateSplit _),
    "join_3way" -> (CoreQueries.join3Way _),
    "topk" -> (CoreQueries.topK _),
    "json_extract" -> (CoreQueries.jsonExtract _),
    "json_typed" -> (CoreQueries.jsonTyped _),
    "dedup_exact" -> (TextQueries.dedupExact _),
    "substring_dedup" -> (TextQueries.substringDedup _),
    "text_stats" -> (TextQueries.textStats _),
    "token_count" -> (TextQueries.tokenCount _),
    "lang_id" -> (TextQueries.langIdQuery _),
    "tokenizer_fertility" -> (TextQueries.tokenizerFertility _),
    "ngram_novelty" -> (TextQueries.ngramNovelty _),
    "lang_confusion" -> (TextQueries.langConfusion _),
    "quality_score" -> (TextQueries.qualityScore _),
    "top_terms" -> (TextQueries.topTerms _),
    "chunk_text" -> (TextQueries.chunkText _),
    "shard_assign" -> (TextQueries.shardAssign _),
    "contamination" -> (TextQueries.contamination _),
    "salted_agg" -> (TextQueries.saltedAgg _),
    "fingerprint" -> (TextQueries.fingerprint _),
    "winnow_fingerprint" -> (TextQueries.winnowFingerprint _),
    "simhash" -> (TextQueries.simhash _),
    "simhash_neardup" -> (TextQueries.simhashNearDup _),
    "image_phash" -> (TextQueries.imagePhash _),
    "video_phash" -> (TextQueries.videoPhash _),
    "audio_fingerprint" -> (TextQueries.audioFingerprintQuery _),
    "video_neardup" -> (TextQueries.videoNearDup _),
    "phash_neardup" -> (TextQueries.phashNearDup _),
    "doc_embedding_join" -> (SimilarityQueries.docEmbeddingJoin _),
    "edit_distance_neardup" -> (SimilarityQueries.editDistanceNearDup _),
    "knn_cosine" -> (SimilarityQueries.knnCosine _),
    "ann_ivf" -> (SimilarityQueries.annIvf _),
    "ann_ivf_trained" -> (SimilarityQueries.annIvfTrained _),
    "ann_ivf_trained_served" -> (SimilarityQueries.annIvfTrainedServed _),
    "ann_ivf_served" -> (SimilarityQueries.annIvfServed _),
    "filtered_ann_served" -> (SimilarityQueries.filteredAnnServed _),
    "ivfpq_ann_filtered" -> (SimilarityQueries.ivfPqAnnFiltered _),
    "filtered_ann_source" -> (SimilarityQueries.filteredAnnSource _),
    "ann_ivf_merged" -> (SimilarityQueries.annIvfMerged _),
    "ann_ivf_appended" -> (SimilarityQueries.annIvfAppended _),
    "ann_ndcg" -> (SimilarityQueries.annNdcg _),
    "ivfpq_ann_appended" -> (SimilarityQueries.ivfPqAnnAppended _),
    "ivfpq_ann_merged" -> (SimilarityQueries.ivfPqAnnMerged _),
    "ann_recall" -> (SimilarityQueries.annRecall _),
    "ann_recall_trained" -> (SimilarityQueries.annRecallTrained _),
    "ann_recall_nprobe" -> (SimilarityQueries.annRecallNprobe _),
    "lsh_recall_sampled" -> (SimilarityQueries.lshRecallSampled _),
    "incremental_neardup" -> (SimilarityQueries.incrementalNearDup _),
    "incremental_neardup_filtered" -> (SimilarityQueries.incrementalNearDupFiltered _),
    "incremental_neardup_deleted" -> (SimilarityQueries.incrementalNearDupDeleted _),
    "incremental_neardup_source_retired" -> (SimilarityQueries.incrementalNearDupSourceRetired _),
    "ann_ivf_deleted" -> (SimilarityQueries.annIvfDeleted _),
    "ann_ivf_label_retired" -> (SimilarityQueries.annIvfLabelRetired _),
    "ann_ivf_source_retired" -> (SimilarityQueries.annIvfSourceRetired _),
    "ann_ivf_compacted" -> (SimilarityQueries.annIvfCompacted _),
    "ivfpq_ann_deleted" -> (SimilarityQueries.ivfPqAnnDeleted _),
    "ivfpq_ann_label_retired" -> (SimilarityQueries.ivfPqAnnLabelRetired _),
    "ivfpq_ann_source_retired" -> (SimilarityQueries.ivfPqAnnSourceRetired _),
    "ivfpq_ann_compacted" -> (SimilarityQueries.ivfPqAnnCompacted _),
    "lsh_bucket_skew" -> (SimilarityQueries.lshBucketSkew _),
    "interval_join_outer" -> (AnalyticsQueries.intervalJoinOuter _),
    "hash_embed" -> (SimilarityQueries.hashEmbed _),
    "hash_embed_knn" -> (SimilarityQueries.hashEmbedKnn _),
    "hash_embed_ann" -> (SimilarityQueries.hashEmbedAnn _),
    "hash_embed_ann_served" -> (SimilarityQueries.hashEmbedAnnServed _),
    "hash_embed_ann_recall" -> (SimilarityQueries.hashEmbedAnnRecall _),
    "mrl_recall" -> (SimilarityQueries.mrlRecall _),
    "embedding_neardup" -> (SimilarityQueries.embeddingNearDup _),
    "srp_neardup" -> (SimilarityQueries.srpNearDup _),
    "srp_estimate" -> (SimilarityQueries.srpEstimate _),
    "span_excise" -> (TextQueries.spanExcise _),
    "span_excise_keep_one" -> (TextQueries.spanExciseKeepOne _),
    "token_zipf" -> (TextQueries.tokenZipf _),
    "dup_degree_hist" -> (SimilarityQueries.dupDegreeHist _),
    "link_predict" -> (SimilarityQueries.linkPredict _),
    "neardup_families" -> (SimilarityQueries.neardupFamilies _),
    "lsh_recall" -> (SimilarityQueries.lshRecall _),
    "dist_drift" -> (AnalyticsQueries.distDrift _),
    "semantic_clusters" -> (CurationQueries.semanticClusters _),
    "semantic_keep" -> (CurationQueries.semanticKeep _),
    "kmeans_step" -> (SimilarityQueries.kmeansStep _),
    "kmeans_train2" -> (SimilarityQueries.kmeansTrain2 _),
    "pca_power" -> (SimilarityQueries.pcaPower _),
    "pca_project" -> (SimilarityQueries.pcaProject _),
    "semantic_neardup" -> (SimilarityQueries.semanticNearDup _),
    "kmeans_shift" -> (SimilarityQueries.kmeansShift _),
    "cluster_eval" -> (SimilarityQueries.clusterEval _),
    "cluster_terms" -> (SimilarityQueries.clusterTerms _),
    "minhash_lsh" -> (SimilarityQueries.minhashLsh _),
    "minhash_estimate" -> (SimilarityQueries.minhashEstimate _),
    "ngram_jaccard" -> (SimilarityQueries.ngramJaccard _),
    "ngram_containment" -> (SimilarityQueries.ngramContainment _),
    "score_agreement" -> (TextQueries.scoreAgreement _),
    "volume_anomaly" -> (AnalyticsQueries.volumeAnomaly _),
    "minhash_threshold_sweep" -> (SimilarityQueries.minhashThresholdSweep _),
    "winnow_overlap" -> (SimilarityQueries.winnowOverlap _),
    "bm25_top" -> (CurationQueries.bm25Top _),
    "bm25_served" -> (LexQueries.bm25Served _),
    "bm25_multiterm" -> (LexQueries.bm25Multiterm _),
    "bm25_maxscore" -> (LexQueries.bm25Maxscore _),
    "bm25_grown_maxscore" -> (LexQueries.bm25GrownMaxscore _),
    "bm25_filtered" -> (LexQueries.bm25Filtered _),
    "bm25_filtered_source" -> (LexQueries.bm25FilteredSource _),
    "bm25_source_retired" -> (LexQueries.bm25SourceRetired _),
    "facet_profile" -> (LexQueries.facetProfile _),
    "vec_facet_profile" -> (SimilarityQueries.vecFacetProfile _),
    "ivfpq_facet_profile" -> (SimilarityQueries.ivfPqFacetProfile _),
    "lsh_facet_profile" -> (SimilarityQueries.lshFacetProfile _),
    "bm25_appended" -> (LexQueries.bm25Appended _),
    "bm25_deleted" -> (LexQueries.bm25Deleted _),
    "lex_lexicon" -> (LexQueries.lexLexicon _),
    "bm25_merged" -> (LexQueries.bm25Merged _),
    "bm25_refreshed" -> (LexQueries.bm25Refreshed _),
    "bm25_maxp" -> (LexQueries.bm25Maxp _),
    "phrase_search" -> (LexQueries.phraseSearch _),
    "prox_search" -> (LexQueries.proxSearch _),
    "contamination_served" -> (LexQueries.contaminationServed _),
    "hybrid_served" -> (LexQueries.hybridServed _),
    "hybrid_filtered" -> (LexQueries.hybridFiltered _),
    "rank_fusion" -> (CurationQueries.rankFusion _),
    "multimodal_meta" -> ((s: SparkSession, dir: String) =>
      graft.operators.Multimodal.metaQuery(graft.sources.Tables.documents(s, dir))),
    "dims_exploded" -> (CoreQueries.dimsExploded _),
    "hourly_rollup" -> (CoreQueries.hourlyRollup _),
    "filter_pushdown" -> (CoreQueries.filterPushdown _),
    "zorder_prune" -> (CoreQueries.zorderPrune _),
    "rolling_actives" -> (AnalyticsQueries.rollingActives _),
    "linear_probe" -> (SimilarityQueries.linearProbe _),
    "model_auc" -> (SimilarityQueries.modelAuc _),
    "calibration_bins" -> (SimilarityQueries.calibrationBins _),
    "embedding_isotropy" -> (SimilarityQueries.embeddingIsotropy _),
    "dup_modularity" -> (SimilarityQueries.dupModularity _),
    "ivf_balance" -> (SimilarityQueries.ivfBalance _),
    "heaps_law" -> (TextQueries.heapsLaw _),
    "cluster_split" -> (CurationQueries.clusterSplit _),
    "conversion_lag" -> (AnalyticsQueries.conversionLag _),
    "sample_mean_ci" -> (AnalyticsQueries.sampleMeanCi _),
    "bootstrap_ci" -> (AnalyticsQueries.bootstrapCi _),
    "attribution_linear" -> (AnalyticsQueries.attributionLinear _),
    "cohort_value" -> (AnalyticsQueries.cohortValue _),
    "rfm_segments" -> (AnalyticsQueries.rfmSegments _),
    "decile_lift" -> (AnalyticsQueries.decileLift _),
    "markov_eval" -> (AnalyticsQueries.markovEval _),
    "schema_integrity" -> (AnalyticsQueries.schemaIntegrity _),
    "date_agg" -> (CoreQueries.dateAgg _),
    "window_rank" -> (AnalyticsQueries.windowRank _),
    "rollup_agg" -> (AnalyticsQueries.rollupAgg _),
    "cube_agg" -> (AnalyticsQueries.cubeAgg _),
    "key_skew" -> (AnalyticsQueries.keySkew _),
    "semi_anti" -> (AnalyticsQueries.semiAnti _),
    "setops" -> (AnalyticsQueries.setOps _),
    "join_5way" -> (AnalyticsQueries.join5Way _),
    "sliding_agg" -> (AnalyticsQueries.slidingAgg _),
    "session_agg" -> (AnalyticsQueries.sessionAgg _),
    "grouping_sets" -> (AnalyticsQueries.groupingSets _),
    "typed_agg" -> (AnalyticsQueries.typedAgg _),
    "asof_join" -> (AnalyticsQueries.asofJoin _),
    "null_profile" -> (AnalyticsQueries.nullProfile _),
    "value_histogram" -> (AnalyticsQueries.valueHistogram _),
    "stats_agg" -> (AnalyticsQueries.statsAgg _),
    "pivot_agg" -> (AnalyticsQueries.pivotAgg _),
    "dedup_clusters" -> (CurationQueries.dedupClusters _),
    "dedup_stats" -> (CurationQueries.dedupStats _),
    "tfidf_top" -> (CurationQueries.tfidfTop _),
    "sample_stratified" -> (CurationQueries.sampleStratified _),
    "weighted_sample" -> (CurationQueries.weightedSample _),
    "mix_sample" -> (CurationQueries.mixSample _),
    "mix_temperature" -> (CurationQueries.mixTemperature _),
    "epoch_schedule" -> (CurationQueries.epochSchedule _),
    "domain_reweight" -> (CurationQueries.domainReweight _),
    "cross_shard_dup" -> (CurationQueries.crossShardDup _),
    "quality_vs_dup" -> (CurationQueries.qualityVsDup _),
    "pii_redact" -> (CurationQueries.piiRedact _),
    "repetition_score" -> (CurationQueries.repetitionScore _),
    "embed_quantize" -> (CurationQueries.embedQuantize _),
    "pack_sequences" -> (CurationQueries.packSequences _),
    "incremental_dedup" -> (CurationQueries.incrementalDedup _),
    "source_cap" -> (CurationQueries.sourceCap _),
    "corpus_profile" -> (CurationQueries.corpusProfile _),
    "token_budget_select" -> (CurationQueries.tokenBudgetSelect _),
    "filter_cascade" -> (CurationQueries.filterCascade _),
    "curation_manifest" -> (CurationQueries.curationManifest _),
    "pack_efficiency" -> (CurationQueries.packEfficiency _),
    "kcore_peel" -> (CurationQueries.kcorePeel _),
    "source_divergence" -> (CurationQueries.sourceDivergence _),
    "join_size_est" -> (AnalyticsQueries.joinSizeEst _),
    "forecast_eval" -> (AnalyticsQueries.forecastEval _),
    "bloom_prune" -> (AnalyticsQueries.bloomPrune _),
    "holt_forecast" -> (AnalyticsQueries.holtForecast _),
    "dominant_period" -> (AnalyticsQueries.dominantPeriod _),
    "path_topk" -> (AnalyticsQueries.pathTopk _),
    "k_anonymity" -> (TextQueries.kAnonymity _),
    "l_diversity" -> (TextQueries.lDiversity _),
    "t_closeness" -> (TextQueries.tCloseness _),
    "interval_join" -> (AnalyticsQueries.intervalJoin _),
    "salted_join" -> (AnalyticsQueries.saltedJoin _),
    "cheapest_supplier" -> (AnalyticsQueries.cheapestSupplier _),
    "boilerplate_ngrams" -> (TextQueries.boilerplateNgrams _),
    "funnel_steps" -> (AnalyticsQueries.funnelSteps _),
    "quantile_bins" -> (AnalyticsQueries.quantileBins _),
    "quantile_bins_scalable" -> (AnalyticsQueries.quantileBinsScalable _),
    "retention_cohort" -> (AnalyticsQueries.retentionCohort _),
    "time_split" -> (AnalyticsQueries.timeSplit _),
    "token_rarity" -> (TextQueries.tokenRarity _),
    "importance_weight" -> (TextQueries.importanceWeight _),
    "lm_score" -> (TextQueries.lmScore _),
    "token_diversity" -> (TextQueries.tokenDiversity _),
    "ohlc_agg" -> (AnalyticsQueries.ohlcAgg _),
    "gap_fill" -> (AnalyticsQueries.gapFill _),
    "anomaly_zscore" -> (AnalyticsQueries.anomalyZscore _),
    "series_rate" -> (AnalyticsQueries.seriesRate _),
    "seasonal_anomaly" -> (AnalyticsQueries.seasonalAnomaly _),
    "series_correlation" -> (AnalyticsQueries.seriesCorrelation _),
    "theil_sen" -> (AnalyticsQueries.theilSen _),
    "pareto_front" -> (AnalyticsQueries.paretoFront _),
    "value_runs" -> (AnalyticsQueries.valueRuns _),
    "cuped_ab" -> (AnalyticsQueries.cupedAb _),
    "ab_ztest" -> (AnalyticsQueries.abZtest _),
    "activity_gini" -> (AnalyticsQueries.activityGini _),
    "mann_whitney" -> (AnalyticsQueries.mannWhitney _),
    "ks_test" -> (AnalyticsQueries.ksTest _),
    "benford_audit" -> (AnalyticsQueries.benfordAudit _),
    "incremental_stats" -> (AnalyticsQueries.incrementalStats _),
    "upsert_merge" -> (AnalyticsQueries.upsertMerge _),
    "rolling_median" -> (AnalyticsQueries.rollingMedian _),
    "series_autocorr" -> (AnalyticsQueries.seriesAutocorr _),
    "series_cusum" -> (AnalyticsQueries.seriesCusum _),
    "series_ewma" -> (AnalyticsQueries.seriesEwma _),
    "winsorize" -> (AnalyticsQueries.winsorize _),
    "robust_zscore" -> (AnalyticsQueries.robustZscore _),
    "dup_matrix" -> (SimilarityQueries.dupMatrix _),
    "source_similarity" -> (SimilarityQueries.sourceSimilarity _),
    "series_decompose" -> (AnalyticsQueries.seriesDecompose _),
    "unpivot_stats" -> (AnalyticsQueries.unpivotStats _),
    "cms_topk" -> (TextQueries.cmsTopk _),
    "semantic_threshold_sweep" -> (SimilarityQueries.semanticThresholdSweep _),
    "dup_triangles" -> (SimilarityQueries.dupTriangles _),
    "vocab_coverage" -> (TextQueries.vocabCoverage _),
    "bpe_pairs" -> (TextQueries.bpePairs _),
    "bpe_train" -> (TextQueries.bpeTrain _),
    // DEFLATE itself has no DuckDB counterpart, but since round 13 the
    // per-doc/per-pair sizes are OracleFixtures tables and everything
    // downstream is hash-gated; CompressRatioSpec and the ncd_neardup
    // spec keep gating the kernel
    "compress_ratio" -> (TextQueries.compressRatio _),
    "ncd_neardup" -> (TextQueries.ncdNearDup _),
    "filtered_ann" -> (SimilarityQueries.filteredAnn _),
    "prefix_join" -> (SimilarityQueries.prefixJoin _),
    "source_centroids" -> (SimilarityQueries.sourceCentroids _),
    "token_lift" -> (TextQueries.tokenLift _),
    "embedding_outliers" -> (SimilarityQueries.embeddingOutliers _),
    "quality_threshold_sweep" -> (TextQueries.qualityThresholdSweep _),
    "group_percentiles" -> (AnalyticsQueries.groupPercentiles _),
    "snapshot_diff" -> (CurationQueries.snapshotDiff _),
    "event_transitions" -> (AnalyticsQueries.eventTransitions _),
    "above_avg_docs" -> (AnalyticsQueries.aboveAvgDocs _),
    "dedup_keep_best" -> (CurationQueries.dedupKeepBest _),
    "dup_pagerank" -> (CurationQueries.dupPagerank _),
    "pq_codebook" -> (SimilarityQueries.pqCodebook _),
    "pq_encode" -> (SimilarityQueries.pqEncode _),
    "pq_ann" -> (SimilarityQueries.pqAnn _),
    "pq_recall" -> (SimilarityQueries.pqRecall _),
    "ivfpq_ann" -> (SimilarityQueries.ivfPqAnn _),
    "ivfpq_ann_served" -> (SimilarityQueries.ivfPqAnnServed _),
    "ivfpq_rerank" -> (SimilarityQueries.ivfPqRerank _),
    "ivfpq_recall" -> (SimilarityQueries.ivfPqRecall _),
    // sketch VALUES are engine-specific, but their accuracy CONTRACTS
    // are oracled invariants (booleans vs exact SQL bounds) since
    // round 13; ApproxStatsSpec keeps the tighter raw-sketch gate
    "approx_stats" -> (AnalyticsQueries.approxStatsChecked _),
    "exact_distinct" -> (AnalyticsQueries.exactDistinct _)
  )

  /** DuckDB fragment: first 8 hex chars of md5(s) parsed as uint32 —
    * mirrors TextFunctions.md5Hash32. */
  /** DuckDB fragment: first `nHex` hex chars of md5(s) as a BIGINT
    * nibble-sum — the shared body behind [[hash32Sql]]/[[hash60Sql]]. */
  private def hashSql(s: String, nHex: Int): String =
    s"""CAST(list_sum(list_transform(range(1, ${nHex + 1}),
       |  i -> (strpos('0123456789abcdef', substr(md5($s), CAST(i AS INT), 1)) - 1)
       |       * (CAST(1 AS BIGINT) << CAST(4 * ($nHex - i) AS INT)))) AS BIGINT)""".stripMargin

  private def hash32Sql(s: String): String = hashSql(s, 8)

  /** First 15 hex chars — the 60-bit wide key for corpus-global hashing
    * where 32 bits birthday-saturate (mirrors TextFunctions.md5Hash60). */
  private def hash60Sql(s: String): String = hashSql(s, 15)

  /** DuckDB CTE chain computing the per-doc 32-bit SimHash; terminal CTE
    * is `sfinal(doc_id, simhash)` — shared by the `simhash` and
    * `simhash_neardup` oracles. */
  private lazy val oracleSimhashBody: String =
    s"""toks AS (
       |  SELECT doc_id, unnest($WordToksSql) AS tok FROM documents),
       |h AS (SELECT doc_id, CAST(list_sum(list_transform(range(1, 9),
       |    i -> (strpos('0123456789abcdef', substr(md5(tok), CAST(i AS INT), 1)) - 1)
       |         * (CAST(1 AS BIGINT) << CAST(4 * (8 - i) AS INT)))) AS BIGINT) AS h
       |  FROM toks),
       |bits AS (SELECT doc_id, j,
       |    CASE WHEN (h >> j) & 1 = 1 THEN 1 ELSE -1 END AS vote
       |  FROM h, (SELECT unnest(range(0, 32)) AS j) js),
       |s AS (SELECT doc_id, j, sum(vote) AS s FROM bits GROUP BY doc_id, j),
       |sfinal AS (SELECT doc_id,
       |  CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
       |FROM s GROUP BY doc_id)""".stripMargin

  /** DuckDB fragment: dot product of two list<float> columns in index-order
    * double accumulation — the same fold order as VectorOps.dotD, so
    * values agree bitwise. */
  private def dotSql(x: String, y: String): String =
    s"list_sum(list_transform(range(1, len($x) + 1), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)))"

  /** Self-dot of `embedding` (for the norm CTE). */
  private val dotSelfSql = dotSql("embedding", "embedding")

  /** Shared IVF-assignment CTE prefix (mirrors SimilarityQueries.ivfAssign):
    * bounded-k centroids = the IvfK vectors with smallest md5(vec_id)
    * (both engines emit lowercase hex over the same decimal rendering, so
    * the lexicographic order agrees), per-vector rank over them; `asn` is
    * the top-1 bucket (candidate side), `probes` the top-nprobe buckets
    * (query side). The argmax tie-break (ccos DESC, cid) matches the Spark
    * comparator exactly, and ccos is the same fixed-order double fold. */
  private def ivfAssignSqlWith(centFilter: String): String =
    s"""WITH en AS (SELECT vec_id, embedding, sqrt($dotSelfSql) AS nrm FROM embeddings),
       |cent AS (SELECT vec_id AS cid, embedding AS cemb, nrm AS cnrm FROM en$centFilter
       |         ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT ${SimilarityQueries.IvfK}),
       |ranked AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
       |  FROM (SELECT e.vec_id, e.embedding, e.nrm, c.cid,
       |      ${dotSql("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) AS ccos
       |    FROM en e, cent c)),
       |asn AS (SELECT vec_id, embedding, nrm, cid AS bucket FROM ranked WHERE rn = 1),
       |probes AS (SELECT vec_id, embedding, nrm, cid AS bucket FROM ranked
       |           WHERE rn <= ${SimilarityQueries.IvfNprobe})""".stripMargin

  private lazy val IvfAssignSql: String = ivfAssignSqlWith("")

  /** [[IvfAssignSql]] with centroids sampled from the BASE slice only —
    * the `ann_ivf_appended` oracle: frozen-centroid routing means
    * "append then serve" must equal "assign everything against the base
    * centroids", which is exactly this chain. */
  private lazy val IvfAssignBaseCentSql: String =
    ivfAssignSqlWith(" WHERE vec_id % 4 != 0")

  /** [[IvfAssignSql]] with centroids sampled from shard A only (odd
    * vec_ids) — the `ann_ivf_merged` oracle: merging shard B into A
    * re-routes B's postings against A's frozen centroids, so the merged
    * index ≡ assigning the whole corpus against A's centroids. */
  private lazy val IvfAssignMergedCentSql: String =
    ivfAssignSqlWith(" WHERE vec_id % 2 = 1")

  /** Two-round k-means CTE chain (extends [[IvfAssignSql]] — whose `asn`
    * IS the round-1 assignment): the exact fixed-point Lloyd's update
    * (`list(... ORDER BY pos)` rebuilds the coordinate order Spark's
    * array_sort pins), then round 2 re-ranks every vector against the
    * trained centroids with the same index-order double fold and
    * (ccos DESC, cid) tie-break. Terminal CTE is
    * `asn2(vec_id, embedding, nrm, bucket, ccos)` — shared by the
    * `kmeans_train2` and `semantic_neardup` oracles. */
  private lazy val KmeansTrain2Body: String =
    s"""$IvfAssignSql,
       |ex AS (SELECT bucket, generate_subscripts(embedding, 1) AS pos,
       |         unnest(embedding) AS v FROM asn),
       |ag AS (SELECT bucket, pos, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS qsum
       |       FROM ex GROUP BY bucket, pos),
       |nc AS (SELECT bucket AS cid2,
       |         list(CAST(qsum AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY pos) AS cemb2
       |       FROM ag GROUP BY bucket),
       |nc2 AS (SELECT cid2, cemb2, sqrt(${dotSql("cemb2", "cemb2")}) AS cnrm2 FROM nc),
       |p2 AS (SELECT e.vec_id, e.embedding, e.nrm, c.cid2,
       |         ${dotSql("e.embedding", "c.cemb2")} / (e.nrm * c.cnrm2) AS ccos
       |       FROM en e, nc2 c),
       |r2 AS (SELECT vec_id, embedding, nrm, cid2, ccos,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid2) AS rn
       |       FROM p2),
       |asn2 AS (SELECT vec_id, embedding, nrm, cid2 AS bucket, ccos FROM r2 WHERE rn = 1)""".stripMargin

  /** The 64-bit SimHash band-candidate CTE chain (mirrors
    * TextQueries.simhash64Df + bandedHammingJoin's candidate stage),
    * with every CTE name under `p` so it composes with other bodies
    * (LshCandBody also terminates in an unprefixed `cand`). Terminal:
    * `${p}cand(doc_a, doc_b, la, ha, lb, hb)` — the Hamming filter is
    * the caller's. */
  private def simhash64Body(p: String): String =
    s"""${p}toks AS (SELECT doc_id, unnest($WordToksSql) AS tok FROM documents),
       |${p}h AS (SELECT doc_id, ${hash32Sql("tok")} AS hlo,
       |    ${hash32Sql("'hi:' || tok")} AS hhi FROM ${p}toks),
       |${p}bits AS (SELECT doc_id, j,
       |    CASE WHEN (hlo >> j) & 1 = 1 THEN 1 ELSE -1 END AS vlo,
       |    CASE WHEN (hhi >> j) & 1 = 1 THEN 1 ELSE -1 END AS vhi
       |  FROM ${p}h, (SELECT unnest(range(0, 32)) AS j) js),
       |${p}s AS (SELECT doc_id, j, sum(vlo) AS slo, sum(vhi) AS shi FROM ${p}bits GROUP BY doc_id, j),
       |${p}sfin AS (SELECT doc_id,
       |    CAST(sum(CASE WHEN slo > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sh_lo,
       |    CAST(sum(CASE WHEN shi > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sh_hi
       |  FROM ${p}s GROUP BY doc_id),
       |${p}banded AS (SELECT doc_id, sh_lo, sh_hi, b.b AS b,
       |    CASE WHEN b.b < 2 THEN (sh_lo >> (16 * b.b)) & 65535
       |         ELSE (sh_hi >> (16 * (b.b - 2))) & 65535 END AS band_val
       |  FROM ${p}sfin, (SELECT unnest(range(0, 4)) AS b) b),
       |${p}cand AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
       |    a.sh_lo AS la, a.sh_hi AS ha, c.sh_lo AS lb, c.sh_hi AS hb
       |  FROM ${p}banded a JOIN ${p}banded c
       |    ON a.b = c.b AND a.band_val = c.band_val AND a.doc_id < c.doc_id)""".stripMargin

  /** Duplicated-substring span CTE chain (mirrors
    * TextQueries.dupSpanFrame): 5-token shingle positions with 60-bit
    * hashes, occurrence counts (> 1 = duplicated), per-doc
    * gaps-and-islands merge. Terminal CTEs: `n(doc_id, n_tokens, ws)`
    * and `sp(doc_id, island, st, en)` — shared by the `substring_dedup`
    * and `span_excise` oracles. */
  private lazy val SubstringSpanBody: String = substringSpanBody(keepOne = false)

  /** The keep-one variant: each duplicated shingle's lexicographically
    * first occurrence is NOT a duplication mark (mirrors
    * TextQueries.dupSpanFrameKeepOne's struct-min election via a
    * (doc_id, pos)-ordered row_number). */
  private lazy val SubstringSpanKeepOneBody: String = substringSpanBody(keepOne = true)

  private def substringSpanBody(keepOne: Boolean): String = {
    val cx =
      if (keepOne)
        """cx AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS cnt,
          |         row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
          |       FROM hx),
          |dx AS (SELECT doc_id, pos FROM cx WHERE cnt > 1 AND rn > 1),""".stripMargin
      else
        """cx AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS cnt FROM hx),
          |dx AS (SELECT doc_id, pos FROM cx WHERE cnt > 1),""".stripMargin
    s"""w AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
       |n AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens, ws FROM w),
       |sx AS (SELECT doc_id,
       |         unnest(range(1, len(ws) - 3)) AS pos,
       |         unnest(list_transform(range(1, len(ws) - 3), i ->
       |           ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] || ' ' || ws[i+4])) AS sg
       |       FROM n WHERE len(ws) >= 5),
       |hx AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, ${hash60Sql("sg")} AS h FROM sx),
       |$cx
       |ix AS (SELECT doc_id, pos,
       |         max(pos + 4) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |       FROM dx),
       |jx AS (SELECT doc_id, pos,
       |         CASE WHEN prev_end IS NULL OR pos > prev_end + 1 THEN 1 ELSE 0 END AS ni
       |       FROM ix),
       |kx AS (SELECT doc_id, pos,
       |         sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |       FROM jx),
       |sp AS (SELECT doc_id, island, min(pos) AS st, max(pos) + 4 AS en
       |       FROM kx GROUP BY 1, 2)""".stripMargin
  }

  /** SRP signature + band-candidate CTE chain (mirrors
    * SimilarityQueries.srpSigFrame/srpBandCands): the 64 hyperplane
    * bitmasks as shared literals (MinhashSeeds discipline); the
    * quantize → ±BIGINT sum → sign chain mirrors
    * graft.expressions.SrpSign64 exactly; (p >> k) & 1 reads the same
    * bit whether the shift is arithmetic (DuckDB) or logical (the
    * kernel's >>>). Terminal CTEs: `sig(vec_id, sp_lo, sp_hi)`,
    * `cand(va, vb)`, `sen(vec_id, embedding, nrm)` — shared by the
    * `srp_neardup` and `srp_estimate` oracles. */
  private lazy val SrpCandBody: String = {
    val planes = SimilarityQueries.SrpPlanes
      .map(p => s"CAST($p AS BIGINT)").mkString("[", ", ", "]")
    s"""qv AS (SELECT vec_id,
       |    list_transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
       |  FROM embeddings),
       |s AS (SELECT vec_id, b,
       |    list_sum(list_transform(range(1, len(q) + 1),
       |      d -> q[d] * (CASE WHEN ($planes[CAST(b + 1 AS INT)] >> CAST((d - 1) % 64 AS INT)) & 1 = 1
       |                        THEN 1 ELSE -1 END))) AS sv
       |  FROM qv, (SELECT unnest(range(0, 64)) AS b) bs),
       |sig AS (SELECT vec_id,
       |    CAST(sum(CASE WHEN sv > 0 AND b < 32 THEN (CAST(1 AS BIGINT) << CAST(b AS INT)) ELSE 0 END) AS BIGINT) AS sp_lo,
       |    CAST(sum(CASE WHEN sv > 0 AND b >= 32 THEN (CAST(1 AS BIGINT) << CAST(b - 32 AS INT)) ELSE 0 END) AS BIGINT) AS sp_hi
       |  FROM s GROUP BY vec_id),
       |bands AS (SELECT vec_id, b,
       |    CASE WHEN b < 4 THEN (sp_lo >> CAST(8 * b AS INT)) & 255
       |         ELSE (sp_hi >> CAST(8 * (b - 4) AS INT)) & 255 END AS bv
       |  FROM sig, (SELECT unnest(range(0, 8)) AS b) b8),
       |cand AS (SELECT DISTINCT a.vec_id AS va, c.vec_id AS vb
       |  FROM bands a JOIN bands c ON a.b = c.b AND a.bv = c.bv AND a.vec_id < c.vec_id),
       |sen AS (SELECT vec_id, embedding, sqrt($dotSelfSql) AS nrm FROM embeddings)""".stripMargin
  }

  /** Semantic-component CTE chain (extends [[KmeansTrain2Body]], its own
    * `WITH` stripped so the caller's `WITH RECURSIVE` owns the clause):
    * the trained-bucket cosine-≥0.3 pairs, undirected edges, recursive
    * transitive closure from EVERY vector, min-anchor labels. Terminal
    * CTE: `scl(vec_id, cluster)` — shared by the `semantic_clusters`
    * and `semantic_keep` oracles. */
  private lazy val SemClusterBody: String =
    s"""${KmeansTrain2Body.stripPrefix("WITH ")},
       |sp AS (SELECT a.vec_id AS va, b.vec_id AS vb
       |  FROM asn2 a JOIN asn2 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |  WHERE ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) >= 0.3),
       |sedges AS (SELECT va AS src, vb AS dst FROM sp
       |           UNION SELECT vb, va FROM sp),
       |sreach(vec_id, anchor) AS (
       |  SELECT vec_id, vec_id AS anchor FROM embeddings
       |  UNION
       |  SELECT e.dst, r.anchor FROM sreach r JOIN sedges e ON r.vec_id = e.src
       |),
       |scl AS (SELECT vec_id, min(anchor) AS cluster FROM sreach GROUP BY vec_id)""".stripMargin

  /** Product-quantization CTE chain (mirrors SimilarityQueries.pqTrain/
    * pqAssignCodes): per-subspace slices with precomputed self-dots, the
    * md5-sampled seed codebook, seed assignment with the pinned
    * `(sself + cself) − 2·dot` expression order and (dist ASC, cid) tie
    * break, the exact fixed-point Lloyd's update, and the re-encode
    * against trained codebooks. Terminal CTEs: `agg0(cm, cid, pos, n,
    * qsum)` (the trained-codebook coordinates), `cb2(cm, cid, cv,
    * cself)`, `asn1(vec_id, m, sv, sself, code, dist)` — shared by the
    * four `pq_*` oracles. DuckDB list slicing is 1-based inclusive, so
    * `[(m−1)·d+1 : m·d]` is exactly Spark's `slice(emb, (m−1)·d+1, d)`. */
  private lazy val PqBodySql: String = {
    val d = SimilarityQueries.PqSubDim
    s"""WITH subs AS (
       |  SELECT vec_id, m, embedding[((m - 1) * $d + 1):(m * $d)] AS sv
       |  FROM embeddings, (SELECT unnest(range(1, ${SimilarityQueries.PqM + 1})) AS m) ms),
       |subs2 AS (SELECT vec_id, m, sv, ${dotSql("sv", "sv")} AS sself FROM subs),
       |seeds AS (SELECT vec_id AS scid FROM embeddings
       |          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT ${SimilarityQueries.PqCodes}),
       |cb0 AS (SELECT s.m AS cm, s.vec_id AS cid, s.sv AS cv, s.sself AS cself
       |        FROM subs2 s JOIN seeds ON s.vec_id = scid),
       |a0 AS (SELECT s.vec_id, s.m, s.sv, c.cid,
       |         (s.sself + c.cself) - 2.0 * ${dotSql("s.sv", "c.cv")} AS dist
       |       FROM subs2 s JOIN cb0 c ON s.m = c.cm),
       |r0 AS (SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, cid) AS rn
       |       FROM a0),
       |asn0 AS (SELECT vec_id, m, sv, cid AS code FROM r0 WHERE rn = 1),
       |upd AS (SELECT m AS cm, code AS cid, CAST(generate_subscripts(sv, 1) AS BIGINT) AS pos,
       |          unnest(sv) AS v FROM asn0),
       |agg0 AS (SELECT cm, cid, pos, CAST(count(*) AS BIGINT) AS n,
       |           CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS qsum
       |         FROM upd GROUP BY cm, cid, pos),
       |cb AS (SELECT cm, cid,
       |         list(CAST(qsum AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY pos) AS cv
       |       FROM agg0 GROUP BY cm, cid),
       |cb2 AS (SELECT cm, cid, cv, ${dotSql("cv", "cv")} AS cself FROM cb),
       |a1 AS (SELECT s.vec_id, s.m, s.sv, s.sself, c.cid,
       |         (s.sself + c.cself) - 2.0 * ${dotSql("s.sv", "c.cv")} AS dist
       |       FROM subs2 s JOIN cb2 c ON s.m = c.cm),
       |r1 AS (SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, cid) AS rn
       |       FROM a1),
       |asn1 AS (SELECT vec_id, m, sv, sself, cid AS code, dist FROM r1 WHERE rn = 1)""".stripMargin
  }

  /** PQ/ADC query arm (extends [[PqBodySql]]): per-query code distance
    * tables from the trained codebooks (Q×M×K rows), fixed-point floor
    * BEFORE the (qid, vid) sum so the total is an order-independent
    * BIGINT sum; terminal CTE `rr(qid, vid, adist_fp, rn)` — shared by
    * `pq_ann` and `pq_recall`. */
  private lazy val PqAnnBody: String =
    s"""$PqBodySql,
       |dt AS (SELECT s.vec_id AS qid, s.m AS qm, c.cid,
       |         CAST(floor(((s.sself + c.cself) - 2.0 * ${dotSql("s.sv", "c.cv")})
       |                    * 1000000.0) AS BIGINT) AS d_fp
       |       FROM subs2 s JOIN cb2 c ON s.m = c.cm WHERE s.vec_id < 10),
       |pp AS (SELECT d.qid, e.vec_id AS vid, CAST(sum(d.d_fp) AS BIGINT) AS adist_fp
       |       FROM asn1 e JOIN dt d ON e.m = d.qm AND e.code = d.cid
       |       WHERE e.vec_id != d.qid GROUP BY d.qid, e.vec_id),
       |rr AS (SELECT qid, vid, adist_fp,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY adist_fp ASC, vid) AS BIGINT) AS rn
       |       FROM pp)""".stripMargin

  /** IVF+PQ composite CTE chain (extends [[IvfAssignSql]], mirrors
    * SimilarityQueries.ivfPqAnn): per-vector residuals against the OWN
    * coarse centroid, the PQ train/encode chain verbatim on the residual
    * frame (p-prefixed CTEs — [[PqBodySql]]'s shapes, renamed to coexist
    * with IvfAssignSql's en/cent/asn/probes), per-(query, probed bucket)
    * residual ADC tables, candidates from the bucket equijoin. Terminal
    * CTE: `prr(qid, vid, adist_fp, rn)`. */
  private lazy val IvfPqBody: String = ivfPqBodyWith("", "", "")

  /** [[IvfPqBody]] with injectable base filters — empty strings give the
    * full-corpus chain verbatim; the `ivfpq_ann_appended` oracle passes
    * base-slice filters for the coarse-centroid sample (`centFilter`,
    * on `en`), the PQ seed sample (`seedFilter`, on `embeddings`), and
    * the codebook-training fold (`trainFilter`, on `rsub2 s`) — while
    * assignment/encoding/serving still cover every vector, which is
    * exactly the frozen-artifact append semantics. */
  private def ivfPqBodyWith(
      centFilter: String, seedFilter: String, trainFilter: String,
      qExtra: String = "", candExtra: String = ""): String = {
    val d = SimilarityQueries.PqSubDim
    s"""${ivfAssignSqlWith(centFilter)},
       |res AS (SELECT a.vec_id, a.bucket,
       |    list_transform(range(1, len(a.embedding) + 1),
       |      i -> CAST(a.embedding[i] AS DOUBLE) - CAST(c.cemb[i] AS DOUBLE)) AS r
       |  FROM asn a JOIN cent c ON a.bucket = c.cid),
       |rsub AS (SELECT vec_id, bucket, m, r[((m - 1) * $d + 1):(m * $d)] AS sv
       |  FROM res, (SELECT unnest(range(1, ${SimilarityQueries.PqM + 1})) AS m) ms),
       |rsub2 AS (SELECT vec_id, bucket, m, sv, ${dotSql("sv", "sv")} AS sself FROM rsub),
       |pseeds AS (SELECT vec_id AS scid FROM embeddings$seedFilter
       |           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT ${SimilarityQueries.PqCodes}),
       |pcb0 AS (SELECT s.m AS cm, s.vec_id AS cid, s.sv AS cv, s.sself AS cself
       |         FROM rsub2 s JOIN pseeds ON s.vec_id = scid),
       |pa0 AS (SELECT s.vec_id, s.m, s.sv, c.cid,
       |          (s.sself + c.cself) - 2.0 * ${dotSql("s.sv", "c.cv")} AS dist
       |        FROM rsub2 s JOIN pcb0 c ON s.m = c.cm$trainFilter),
       |pr0 AS (SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, cid) AS rn
       |        FROM pa0),
       |pasn0 AS (SELECT vec_id, m, sv, cid AS code FROM pr0 WHERE rn = 1),
       |pupd AS (SELECT m AS cm, code AS cid, CAST(generate_subscripts(sv, 1) AS BIGINT) AS pos,
       |           unnest(sv) AS v FROM pasn0),
       |pagg AS (SELECT cm, cid, pos, CAST(count(*) AS BIGINT) AS n,
       |           CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS qsum
       |         FROM pupd GROUP BY cm, cid, pos),
       |pcb AS (SELECT cm, cid,
       |          list(CAST(qsum AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY pos) AS cv
       |        FROM pagg GROUP BY cm, cid),
       |pcb2 AS (SELECT cm, cid, cv, ${dotSql("cv", "cv")} AS cself FROM pcb),
       |pa1 AS (SELECT s.vec_id, s.bucket, s.m, s.sv, s.sself, c.cid,
       |          (s.sself + c.cself) - 2.0 * ${dotSql("s.sv", "c.cv")} AS dist
       |        FROM rsub2 s JOIN pcb2 c ON s.m = c.cm),
       |pr1 AS (SELECT *, row_number() OVER (PARTITION BY vec_id, m ORDER BY dist ASC, cid) AS rn
       |        FROM pa1),
       |penc AS (SELECT vec_id AS vid, bucket, m, cid AS code FROM pr1 WHERE rn = 1),
       |qres AS (SELECT p.vec_id AS qid, p.bucket AS pb,
       |    list_transform(range(1, len(p.embedding) + 1),
       |      i -> CAST(p.embedding[i] AS DOUBLE) - CAST(c.cemb[i] AS DOUBLE)) AS qr
       |  FROM probes p JOIN cent c ON p.bucket = c.cid WHERE p.vec_id < 10$qExtra),
       |qsub AS (SELECT qid, pb, m, qr[((m - 1) * $d + 1):(m * $d)] AS qsv
       |  FROM qres, (SELECT unnest(range(1, ${SimilarityQueries.PqM + 1})) AS m) ms),
       |qsub2 AS (SELECT qid, pb, m AS qm, qsv, ${dotSql("qsv", "qsv")} AS qself FROM qsub),
       |pdt AS (SELECT q.qid, q.pb, q.qm, c.cid,
       |          CAST(floor(((q.qself + c.cself) - 2.0 * ${dotSql("q.qsv", "c.cv")})
       |                     * 1000000.0) AS BIGINT) AS d_fp
       |        FROM qsub2 q JOIN pcb2 c ON q.qm = c.cm),
       |ppp AS (SELECT d.qid, e.vid, CAST(sum(d.d_fp) AS BIGINT) AS adist_fp
       |        FROM penc e JOIN pdt d ON e.bucket = d.pb AND e.m = d.qm AND e.code = d.cid
       |        WHERE e.vid != d.qid$candExtra GROUP BY 1, 2),
       |prr AS (SELECT qid, vid, adist_fp,
       |          CAST(row_number() OVER (PARTITION BY qid ORDER BY adist_fp ASC, vid) AS BIGINT) AS rn
       |        FROM ppp)""".stripMargin
  }

  /** DuckDB fragment: word 3-gram shingle list of normalized text from a
    * token-list column `ws` (empty below 3 tokens). */
  private val ShingleSql =
    """CASE WHEN len(ws) >= 3
      | THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      | ELSE [] END""".stripMargin

  /** DuckDB CTE chain computing the MinHash-LSH candidate pairs; terminal
    * CTE is `cand(doc_a, doc_b)` — shared by the `minhash_lsh`,
    * `ngram_jaccard`, and `edit_distance_neardup` oracles (the latter two
    * re-rank LSH candidates, mirroring the Spark side's scale design). */
  /** IVF search routed by the TRAINED (2-round Lloyd's) centroids:
    * r2's rank over trained centroids doubles as the probe ranking
    * (rn <= nprobe), asn2 (rn = 1) is the candidate-side bucket. Shared
    * by `ann_ivf_trained` (in-session) and `ann_ivf_trained_served`
    * (persisted index) — the serving path is bit-identical by design. */
  private lazy val AnnIvfTrainedSql: String =
    s"""$KmeansTrain2Body,
       |tq AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm,
       |        cid2 AS bucket
       |      FROM r2 WHERE vec_id < 10 AND rn <= ${SimilarityQueries.IvfNprobe}),
       |tp AS (SELECT tq.qid, a.vec_id AS vid,
       |        ${dotSql("tq.qemb", "a.embedding")} / (tq.qnrm * a.nrm) AS cos
       |      FROM tq JOIN asn2 a ON tq.bucket = a.bucket AND a.vec_id != tq.qid),
       |tr AS (SELECT qid, vid, cos,
       |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM tp)
       |SELECT qid, vid, cos FROM tr WHERE rn <= 3""".stripMargin

  /** Feature-hashed embedding CTE chain (mirrors
    * SimilarityQueries.hashEmbed): per-token bucket j = hash32 % 32 with
    * a ±1 sign bit, signed counts per (doc, bucket), densified over the
    * 32-cell grid for every doc with ≥ 1 token. Terminal CTE:
    * `f(doc_id, k, v)` — consumers assemble `list(v ORDER BY k)`. */
  private lazy val HashEmbedBody: String = {
    val dim = SimilarityQueries.HashEmbedDim
    s"""toks AS (SELECT doc_id, unnest($WordToksSql) AS tok FROM documents),
       |hx AS (SELECT doc_id, ${hash32Sql("tok")} % $dim AS j,
       |        CASE WHEN ${hash32Sql("'s:' || tok")} % 2 = 1 THEN 1 ELSE -1 END AS s
       |      FROM toks),
       |c AS (SELECT doc_id, j, CAST(sum(s) AS BIGINT) AS v FROM hx GROUP BY 1, 2),
       |g AS (SELECT t.doc_id, CAST(ks.k AS BIGINT) AS k
       |      FROM (SELECT DISTINCT doc_id FROM toks) t,
       |           (SELECT unnest(range(0, $dim)) AS k) ks),
       |f AS (SELECT g.doc_id, g.k, CAST(COALESCE(c.v, 0) AS BIGINT) AS v
       |      FROM g LEFT JOIN c ON g.doc_id = c.doc_id AND g.k = c.j)""".stripMargin
  }

  /** IVF chain over the hash-embedded corpus (mirrors
    * SimilarityQueries.hashEmbedAnn): extends [[HashEmbedBody]] with the
    * normed double-vector frame (exact BIGINT self-dot under the sqrt,
    * zero-norm docs excluded), the md5-sampled bounded-k centroids, the
    * (ccos DESC, cid) routing argmax, and the bucket-equijoin cosine
    * ranking. Terminal: `hr(qid, vid, cos, rn)` — rn <= 3 is the result. */
  private lazy val HashEmbedIvfBody: String =
    s"""$HashEmbedBody,
       |he AS (SELECT doc_id AS vec_id, list(CAST(v AS DOUBLE) ORDER BY k) AS embedding,
       |        CAST(sum(v * v) AS BIGINT) AS dd FROM f GROUP BY doc_id),
       |hen AS MATERIALIZED (SELECT vec_id, embedding, sqrt(CAST(dd AS DOUBLE)) AS nrm
       |       FROM he WHERE dd > 0),
       |hcent AS (SELECT vec_id AS cid, embedding AS cemb, nrm AS cnrm FROM hen
       |          ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT ${SimilarityQueries.IvfK}),
       |hranked AS MATERIALIZED (SELECT *,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid) AS rn
       |  FROM (SELECT e.vec_id, e.embedding, e.nrm, c.cid,
       |      ${dotSql("e.embedding", "c.cemb")} / (e.nrm * c.cnrm) AS ccos
       |    FROM hen e, hcent c)),
       |hasn AS (SELECT vec_id, embedding, nrm, cid AS bucket FROM hranked WHERE rn = 1),
       |hprobes AS (SELECT vec_id, embedding, nrm, cid AS bucket FROM hranked
       |            WHERE rn <= ${SimilarityQueries.IvfNprobe}),
       |hq AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm, bucket
       |       FROM hprobes WHERE vec_id < 10),
       |hp AS (SELECT hq.qid, a.vec_id AS vid,
       |        ${dotSql("hq.qemb", "a.embedding")} / (hq.qnrm * a.nrm) AS cos
       |      FROM hq JOIN hasn a ON hq.bucket = a.bucket AND a.vec_id != hq.qid),
       |hr AS (SELECT qid, vid, cos,
       |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM hp)""".stripMargin

  /** IVF over the hash embeddings — shared verbatim by `hash_embed_ann`
    * and its served twin (serving must be bit-identical to in-session). */
  private lazy val HashEmbedAnnSql: String =
    s"""WITH $HashEmbedIvfBody
       |SELECT qid, vid, cos FROM hr WHERE rn <= 3""".stripMargin

  /** Serving the retired IVFPQ composite — shared verbatim by
    * `ivfpq_ann_deleted` and `ivfpq_ann_compacted` (compaction of the
    * code postings changes storage, never results). Centroids/codebooks
    * train on the FULL corpus (frozen as built); only retired rows
    * (% 10 = 7) vanish from the query and candidate sides. */
  private lazy val IvfPqRetiredServeSql: String =
    s"""${ivfPqBodyWith("", "", "",
           qExtra = " AND p.vec_id % 10 != 7",
           candExtra = " AND e.vid % 10 != 7")}
       |SELECT qid, vid, adist_fp, rn FROM prr WHERE rn <= 3""".stripMargin

  /** Serving a retired IVF index with the takedown set factored out —
    * `% 10 = 7` id batches for the deleted/compacted pair, a label's
    * sidecar membership for the facet-scoped retire row. */
  private def ivfRetiredServeSqlWith(qPred: String, candPred: String): String =
    s"""$IvfAssignSql,
       |q AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm, bucket
       |      FROM probes WHERE vec_id < 10 AND $qPred),
       |p AS (SELECT q.qid, a.vec_id AS vid,
       |        ${dotSql("q.qemb", "a.embedding")} / (q.qnrm * a.nrm) AS cos
       |      FROM q JOIN asn a ON q.bucket = a.bucket AND a.vec_id != q.qid
       |      WHERE $candPred),
       |r AS (SELECT qid, vid, cos,
       |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM p)
       |SELECT qid, vid, cos FROM r WHERE rn <= 3""".stripMargin

  /** Serving the retired IVF index — shared verbatim by the
    * `ann_ivf_deleted` (tombstone-aware) and `ann_ivf_compacted`
    * (physically compacted) oracle keys: compaction must change storage,
    * never results. */
  private lazy val IvfRetiredServeSql: String =
    ivfRetiredServeSqlWith("vec_id % 10 != 7", "a.vec_id % 10 != 7")

  /** The label complement the facet-scoped vector retire rows serve
    * from (mirrors `SimilarityQueries.RetiredLabel`). */
  private def labelSurvivorSql(idExpr: String): String =
    s"$idExpr NOT IN (SELECT vec_id FROM embeddings WHERE label = ${SimilarityQueries.RetiredLabel})"

  /** The source complement the SOURCE-scoped vector retire rows serve
    * from — membership via doc_id ≡ vec_id against the documents table
    * (mirrors `SimilarityQueries.RetiredVecSource`). */
  private def srcSurvivorSql(idExpr: String): String =
    s"$idExpr NOT IN (SELECT doc_id FROM documents " +
      s"WHERE source = '${SimilarityQueries.RetiredVecSource}')"

  /** The two-axis vector facet histogram — shared verbatim by
    * `vec_facet_profile` (IVF sidecar) and `ivfpq_facet_profile`
    * (composite sidecar): both writer families maintain the same
    * (vec_id, label, source) sidecar, so one oracle definition pins
    * both. The source axis recomputes through the documents join the
    * builders perform (doc_id ≡ vec_id; an unmatched vector lands in
    * 'unk'). */
  private lazy val VecFacetProfileSql: String =
    s"""SELECT CAST(coalesce(e.label, -1) AS BIGINT) AS label,
       |  coalesce(d.source, 'unk') AS source,
       |  CAST(count(*) AS BIGINT) AS n_vecs
       |FROM embeddings e LEFT JOIN documents d ON e.vec_id = d.doc_id
       |GROUP BY 1, 2""".stripMargin

  private lazy val LshCandBody: String = {
    val minExprs = SimilarityQueries.MinhashSeeds.zipWithIndex.map {
      case ((a, b), i) => s"min((h * $a + $b) % ${SimilarityQueries.MinhashP}) AS mh$i"
    }.mkString(",\n  ")
    val bandSelects = (0 until 4).map { bd =>
      val cat = (0 until 3).map(j => s"mh${bd * 3 + j}").mkString(" || ',' || ")
      s"SELECT doc_id, $bd AS band, md5($cat) AS sig FROM m"
    }.mkString("\n  UNION ALL ")
    s"""w AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
       |shx AS (SELECT doc_id, unnest($ShingleSql) AS sh FROM w),
       |hh AS (SELECT doc_id, ${hash32Sql("sh")} AS h FROM shx),
       |m AS (SELECT doc_id, $minExprs FROM hh GROUP BY doc_id),
       |b AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
       |  FROM b a JOIN b b2 ON a.band = b2.band AND a.sig = b2.sig AND a.doc_id < b2.doc_id)""".stripMargin
  }

  /** Connected-components CTE chain over the LSH candidate pairs;
    * terminal CTE is `cl(doc_id, cluster)` — shared by the
    * `dedup_clusters` and `dedup_keep_best` oracles. Must follow a
    * `WITH RECURSIVE`. */
  private lazy val ClusterBody: String =
    s"""$LshCandBody,
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
       |          UNION SELECT doc_b, doc_a FROM cand),
       |reach(doc_id, anchor) AS (
       |  SELECT doc_id, doc_id AS anchor FROM documents
       |  UNION
       |  SELECT e.dst, r.anchor FROM reach r JOIN edges e ON r.doc_id = e.src
       |),
       |cl AS (SELECT doc_id, min(anchor) AS cluster FROM reach GROUP BY doc_id)""".stripMargin

  /** Probe training CTE chain (mirrors SimilarityQueries.probeFrames):
    * per-row `q(x1, x2, y)` and the one-row closed-form coefficients
    * `co(n, sy, sx1y, sx2y, b0, b1, b2)` — shared by the
    * `linear_probe`, `model_auc`, and `calibration_bins` oracles.
    * Must follow a `WITH`. */
  private lazy val ProbeCoefBody: String = {
    val d = SimilarityQueries.det3Sql("HUGEINT") _
    s"""q AS (SELECT
       |    CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000) AS BIGINT) AS x1,
       |    CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000) AS BIGINT) AS x2,
       |    CASE WHEN label = 0 THEN 1 ELSE 0 END AS y
       |  FROM embeddings),
       |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x1) AS BIGINT) AS sx1, CAST(sum(x2) AS BIGINT) AS sx2,
       |    CAST(sum(x1*x1) AS BIGINT) AS sx11, CAST(sum(x1*x2) AS BIGINT) AS sx12,
       |    CAST(sum(x2*x2) AS BIGINT) AS sx22, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x1*y) AS BIGINT) AS sx1y, CAST(sum(x2*y) AS BIGINT) AS sx2y
       |  FROM q),
       |c AS (SELECT *,
       |    ${d("n", "sx1", "sx2", "sx1", "sx11", "sx12", "sx2", "sx12", "sx22")} AS det,
       |    ${d("sy", "sx1", "sx2", "sx1y", "sx11", "sx12", "sx2y", "sx12", "sx22")} AS det0,
       |    ${d("n", "sy", "sx2", "sx1", "sx1y", "sx12", "sx2", "sx2y", "sx22")} AS det1,
       |    ${d("n", "sx1", "sy", "sx1", "sx11", "sx1y", "sx2", "sx12", "sx2y")} AS det2
       |  FROM m),
       |co AS (SELECT n, sy, sx1y, sx2y,
       |    CASE WHEN det = 0 THEN NULL ELSE CAST(det0 AS DOUBLE) / CAST(det AS DOUBLE) END AS b0,
       |    CASE WHEN det = 0 THEN NULL ELSE CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) END AS b1,
       |    CASE WHEN det = 0 THEN NULL ELSE CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) END AS b2
       |  FROM c)""".stripMargin
  }

  /** Probe scoring CTE (mirrors SimilarityQueries.probeScores):
    * `sc(y, qs)` — micro-quantized score per row, empty on a singular
    * system. Follows `ProbeCoefBody` in the same WITH chain;
    * MATERIALIZED because every consumer reads it 2+ times. */
  private lazy val ProbeScoreSql: String =
    """sc AS MATERIALIZED (SELECT q.y,
      |    CAST(floor((co.b0 + co.b1 * CAST(q.x1 AS DOUBLE)
      |                + co.b2 * CAST(q.x2 AS DOUBLE))
      |               * CAST(1000000 AS DOUBLE)) AS BIGINT) AS qs
      |  FROM q, co WHERE co.b0 IS NOT NULL)""".stripMargin

  /** Winnowing-fingerprint CTE chain — the non-rolling restatement of
    * WinnowFps's polynomial hash (per position, sum code-point ×
    * 257^(4−j) over the 5-gram, mod 2³² — integer arithmetic both
    * engines reproduce exactly), windowed minima, distinct-sort.
    * Terminal CTE is `wf(doc_id, m, fps)` — shared by the
    * `winnow_fingerprint` and `winnow_overlap` oracles (CTE names are
    * w-prefixed to avoid colliding with LshCandBody's `w`/`m`). */
  private lazy val WinnowBody: String =
    s"""wd AS (SELECT doc_id, $NormSql AS norm FROM documents),
       |wg AS (SELECT doc_id, length(norm) AS n,
       |    CASE WHEN length(norm) < 5 THEN CAST([] AS BIGINT[])
       |         ELSE list_transform(range(1, length(norm) - 3),
       |           p -> CAST(list_sum(list_transform(range(0, 5),
       |             j -> ord(substr(norm, CAST(p + j AS INT), 1))
       |                  * list_extract([CAST(4362470401 AS BIGINT), 16974593, 66049, 257, 1],
       |                      CAST(j + 1 AS INT)))) % 4294967296 AS BIGINT)) END AS hashes
       |  FROM wd),
       |wm AS (SELECT doc_id, hashes, len(hashes) AS m FROM wg),
       |ww AS (SELECT doc_id, m,
       |    CASE WHEN m = 0 THEN hashes
       |         WHEN m < 4 THEN [list_min(hashes)]
       |         ELSE list_transform(range(1, m - 2),
       |           j -> list_min(hashes[j:j+3])) END AS mins
       |  FROM wm),
       |wf AS (SELECT doc_id, m, list_sort(list_distinct(mins)) AS fps FROM ww)""".stripMargin

  /** DuckDB fragment: normalized text (whitespace-collapse+trim+lower);
    * note DuckDB regexp_replace needs the 'g' flag to match Spark's
    * replace-all semantics. */
  /** dHash CTE body: 8×9 block-average luma grid over the payload
    * characters (mirrors `Multimodal.lumaGrid` — exact BIGINT
    * arithmetic), then two positive 32-bit gradient halves (mirrors
    * `Multimodal.phashHalf`). Expects a CTE `u(doc_id, text, L,
    * bright)` upstream. */
  /** One 32-bit half of the dHash gradient fold over an 8×9 grid list
    * column — 1-based list indexing, exact BIGINT bit math (the
    * DuckDB twin of `Multimodal.phashHalf`). */
  private def gradHalfSql(grid: String, rowOff: Int): String =
    s"""CAST(list_sum(list_transform(range(0, 32), j ->
       |      CASE WHEN $grid[CAST((j // 8 + $rowOff) * 9 + (j % 8) + 1 AS INT)] > $grid[CAST((j // 8 + $rowOff) * 9 + (j % 8) + 2 AS INT)]
       |           THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)""".stripMargin

  /** One 32-bit half of the audio energy-delta fold over a 65-long
    * energy list — bit j set iff segment off+j is louder than the
    * next (the DuckDB twin of `Multimodal.energyHash64`). */
  private def energyHalfSql(e: String, off: Int): String =
    s"""CAST(list_sum(list_transform(range(0, 32), j ->
       |      CASE WHEN $e[CAST(j + $off + 1 AS INT)] > $e[CAST(j + $off + 2 AS INT)]
       |           THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)""".stripMargin

  private val PhashFromU =
    s"""g AS (SELECT doc_id,
       |    list_transform(range(0, 72), k ->
       |      list_sum(list_transform(range(k * L // 72 + 1, (k + 1) * L // 72 + 1),
       |        i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT) + bright))
       |      // (((k + 1) * L // 72) - (k * L // 72))) AS grid
       |  FROM u),
       |p AS (SELECT doc_id,
       |    ${gradHalfSql("grid", 0)} AS ph_lo,
       |    ${gradHalfSql("grid", 4)} AS ph_hi
       |  FROM g)""".stripMargin

  /** The 3-round power-iteration CTE chain (mean-centered `cx`, rounds
    * s1..v3) shared by the `pca_power` and `pca_project` oracles —
    * terminal CTEs are `q3(pos, q)`, `w3(w)`, and the unit vector
    * `v3(v)`. */
  private lazy val PcaChainBody: String =
    s"""e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS x FROM embeddings),
       |me AS (SELECT generate_subscripts(x, 1) AS pos, unnest(x) AS xv FROM e),
       |mg AS (SELECT pos, CAST(count(*) AS BIGINT) AS n,
       |         CAST(sum(CAST(floor(xv * 1000000.0) AS BIGINT)) AS BIGINT) AS qs
       |       FROM me GROUP BY pos),
       |mu AS (SELECT list(CAST(qs AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) ORDER BY pos) AS mu FROM mg),
       |cx AS (SELECT vec_id, list_transform(range(1, len(x) + 1), i -> x[i] - mu.mu[i]) AS cx FROM e, mu),
       |v0 AS (SELECT list_transform(mu, m -> 1.0) AS v FROM mu),
       |${(1 to 3).map { i =>
         s"""s$i AS (SELECT ${dotSql("c.cx", "v.v")} AS s,
            |        generate_subscripts(c.cx, 1) AS pos, unnest(c.cx) AS cxj
            |      FROM cx c, v${i - 1} v),
            |q$i AS (SELECT pos, CAST(sum(CAST(floor(s * cxj * 1000000.0) AS BIGINT)) AS BIGINT) AS q
            |      FROM s$i GROUP BY pos),
            |w$i AS (SELECT list(CAST(q AS DOUBLE) ORDER BY pos) AS w FROM q$i),
            |v$i AS (SELECT list_transform(w, x -> x / sqrt(${dotSql("w", "w")})) AS v FROM w$i)""".stripMargin
       }.mkString(",\n")}""".stripMargin

  private val NormSql = """lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"""
  private val WordToksSql = s"regexp_extract_all($NormSql, '[a-z0-9]+')"

  /** The BM25 per-term CTE chain shared by the lexical-index oracles —
    * `bm25_top`'s formula restated once, parameterized over the three
    * WHERE seams the index lifecycle moves: `gWhere` scopes the corpus
    * stats (frozen at build — the appended oracle pins them to the base
    * slice), `dfWhere` scopes document frequency (same freeze), and
    * `tfWhere` scopes the served posting rows (the deleted oracle
    * excludes the tombstoned ids). Terminal CTE is
    * `s(tok, doc_id, tf, df, dl, score)`. */
  private def bm25ScoredBody(gWhere: String = "", dfWhere: String = "",
      tfWhere: String = "",
      // the (doc_id, ws) token source — `bm25_maxp` swaps in the CHUNK
      // corpus (chunk pseudo-ids, pre-split token arrays) so the whole
      // scoring chain is reused verbatim over passages
      tBody: String = s"t AS (SELECT doc_id, %TOKS% AS ws FROM documents)"): String = {
    val termsIn = LexQueries.QueryTerms.map(t => s"'$t'").mkString("(", ",", ")")
    s"""${tBody.replace("%TOKS%", WordToksSql)},
       |dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM t),
       |g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl $gWhere),
       |tk AS (SELECT doc_id, unnest(ws) AS tok FROM t),
       |tf0 AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM tk
       |  WHERE tok IN $termsIn GROUP BY doc_id, tok),
       |tf AS (SELECT * FROM tf0 $tfWhere),
       |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf0 $dfWhere GROUP BY tok),
       |s AS (SELECT f.tok, f.doc_id, f.tf, d.df, l.dl,
       |    ((CAST(g.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
       |      * (CAST(f.tf AS DOUBLE) * 2.2)
       |      / (CAST(f.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE) / (CAST(g.sum_dl AS DOUBLE) / CAST(g.n_docs AS DOUBLE))))) AS score
       |  FROM tf f JOIN dfq d ON f.tok = d.tok JOIN dl l ON f.doc_id = l.doc_id CROSS JOIN g)""".stripMargin
  }

  /** Per-term top-10 tail over [[bm25ScoredBody]] — `bm25_top`'s output
    * shape, reused by every per-term lexical-index oracle. */
  private def bm25PerTermSql(gWhere: String = "", dfWhere: String = "",
      tfWhere: String = ""): String =
    s"""WITH ${bm25ScoredBody(gWhere, dfWhere, tfWhere)},
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY tok ORDER BY score DESC, doc_id) AS BIGINT) AS rk FROM s)
       |SELECT tok, doc_id, tf, df, dl, score, rk FROM r WHERE rk <= 10""".stripMargin

  /** Multi-term total top-10 over [[bm25ScoredBody]]: pivot the per-term
    * scores wide (max of a one-element group — a selection), then ONE
    * left-associative sum in [[LexQueries.QueryTerms]] order with exact
    * 0.0 for absent terms — addition-for-addition the engine's
    * `multitermTotals` shape, so `bm25_multiterm` and the MaxScore-pruned
    * `bm25_maxscore` hash-match it. */
  private def bm25Pivots: String = LexQueries.QueryTerms
    .map(t => s"max(CASE WHEN tok = '$t' THEN score END) AS s_$t").mkString(",\n|   ")
  private def bm25Total: String =
    LexQueries.QueryTerms.map(t => s"coalesce(s_$t, 0.0)").mkString(" + ")

  private def bm25MultitermSql: String = bm25MultitermSqlWith()

  /** [[bm25MultitermSql]] with the scored body's freshness filters
    * exposed — `bm25_grown_maxscore` freezes df/stats at the base slice
    * (the grown-index staleness contract) while tf covers everything. */
  private def bm25MultitermSqlWith(gWhere: String = "",
      dfWhere: String = "", tfWhere: String = ""): String =
    s"""WITH ${bm25ScoredBody(gWhere, dfWhere, tfWhere)},
       |p AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       |   $bm25Pivots
       |  FROM s GROUP BY doc_id),
       |tot AS (SELECT doc_id, n_terms, $bm25Total AS score FROM p),
       |r AS (SELECT doc_id, n_terms, score, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk FROM tot)
       |SELECT doc_id, n_terms, score, rk FROM r WHERE rk <= 10""".stripMargin

  /** Max-passage retrieval over the chunk pseudo-corpus: the shared
    * scoring chain runs on `chunk_text`'s 50/40 windows (cid =
    * doc_id·1000 + chunk_id), then the doc rollup is a per-doc argmax
    * over chunk totals — a selection, oracle-exact. */
  private def bm25MaxpSql: String = {
    val chunkT =
      """tt AS (SELECT doc_id, %TOKS% AS toks FROM documents),
        |tn AS (SELECT doc_id, toks, len(toks) AS n FROM tt),
        |tc AS (SELECT doc_id, toks,
        |        unnest(range(0, CAST(greatest(ceil((n - 50) / 40.0), 0) AS INT) + 1)) AS chunk_id
        |      FROM tn),
        |ts AS (SELECT doc_id, chunk_id,
        |        toks[(chunk_id * 40 + 1):(chunk_id * 40 + 50)] AS ck FROM tc),
        |t AS (SELECT CAST(doc_id * 1000 + chunk_id AS BIGINT) AS doc_id, ck AS ws
        |      FROM ts WHERE len(ck) > 0)""".stripMargin
    s"""WITH ${bm25ScoredBody(tBody = chunkT)},
       |p AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
       |   $bm25Pivots
       |  FROM s GROUP BY doc_id),
       |tot AS (SELECT doc_id, n_terms, $bm25Total AS score FROM p),
       |ds AS (SELECT doc_id // 1000 AS ddoc, doc_id % 1000 AS chunk_id, n_terms, score FROM tot),
       |r1 AS (SELECT *, CAST(row_number() OVER (PARTITION BY ddoc ORDER BY score DESC, chunk_id) AS BIGINT) AS crn FROM ds),
       |best AS (SELECT CAST(ddoc AS BIGINT) AS doc_id, CAST(chunk_id AS BIGINT) AS chunk_id, n_terms, score FROM r1 WHERE crn = 1),
       |r AS (SELECT doc_id, chunk_id, n_terms, score, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rk FROM best)
       |SELECT doc_id, chunk_id, n_terms, score, rk FROM r WHERE rk <= 10""".stripMargin
  }
  private def inList(lang: String): String =
    TextFunctions.Stopwords(lang).map(w => s"'$w'").mkString("(", ", ", ")")

  /** The composite-quality CTE chain — ONE restatement of
    * TextFunctions-side `qualityCol` shared by every oracle that rates
    * documents (`quality_score`, `token_budget_select`,
    * `quality_threshold_sweep`, `corpus_profile`), so the formula the
    * cross-engine bit-exactness contract hangs on lives in exactly one
    * place per engine. Terminal CTE is
    * `qq(doc_id, lang, source, fp, text_len, n_tok, quality)`. */
  private lazy val QualityBody: String =
    s"""qt AS (SELECT doc_id, lang, source, text, $WordToksSql AS tokens FROM documents),
       |q0 AS (SELECT doc_id, lang, source,
       |  CAST(len(tokens) AS DOUBLE) AS n_tok,
       |  CAST(length(text) AS DOUBLE) AS text_len,
       |  CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS n_alpha,
       |  CAST(len(list_filter(tokens, x -> x IN ${inList("en")})) AS DOUBLE) AS stop_hits,
       |  CAST(len(tokens) AS BIGINT) AS n_tok_l,
       |  CAST(length(text) AS BIGINT) AS text_len_l,
       |  md5($NormSql) AS fp
       |FROM qt),
       |qq AS (SELECT doc_id, lang, source, fp, text_len_l AS text_len, n_tok_l AS n_tok,
       |  least(CAST(1.0 AS DOUBLE), n_tok / CAST(50.0 AS DOUBLE)) * CAST(0.3 AS DOUBLE) +
       |  (n_alpha / text_len) * CAST(0.4 AS DOUBLE) +
       |  least(CAST(0.3 AS DOUBLE), stop_hits / n_tok) AS quality
       |FROM q0)""".stripMargin

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "parse_logs" ->
      """SELECT event_id, epoch_ms(ts) AS time, lower(event_type) AS operation,
        |  'svc' || CAST(user_id % 3 AS VARCHAR) AS callerservice,
        |  CAST(user_id AS VARCHAR) AS awsaccountid, value AS latency,
        |  'latency' AS measure_name, CAST(value AS VARCHAR) AS measure_value,
        |  'DOUBLE' AS measure_value_type, 'MILLISECONDS' AS time_unit
        |FROM events""".stripMargin,
    "window_agg" ->
      """SELECT make_timestamp((epoch_ms(ts) // 10000) * 10000 * 1000) AS window_start,
        |  'svc' || CAST(user_id % 3 AS VARCHAR) AS callerservice,
        |  lower(event_type) AS operation,
        |  count(*) AS cnt, min(value) AS min_value, max(value) AS max_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "late_split" ->
      """SELECT event_id, ts,
        |  ts < (SELECT max(ts) - INTERVAL 5 SECOND FROM events) AS is_late
        |FROM events""".stripMargin,
    "join_3way" ->
      """SELECT c_mktsegment, o_orderpriority, count(*) AS cnt,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(DISTINCT o_orderkey) AS n_orders
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment, o_orderpriority""".stripMargin,
    "topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "json_extract" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "json_typed" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,
    "dedup_exact" ->
      s"""WITH d AS (SELECT doc_id, md5($NormSql) AS fp FROM documents)
         |SELECT doc_id,
         |  min(doc_id) OVER (PARTITION BY fp) AS keeper,
         |  doc_id != min(doc_id) OVER (PARTITION BY fp) AS is_dup
         |FROM d""".stripMargin,
    "substring_dedup" ->
      // 5-token shingle positions, hashed occurrence counts (> 1 = dup),
      // gaps-and-islands span merge per doc — BIGINTs throughout, one
      // final integer division for dup_frac
      s"""WITH $SubstringSpanBody,
         |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
         |         CAST(sum(en - st + 1) AS BIGINT) AS dup_tokens
         |       FROM sp GROUP BY 1)
         |SELECT n.doc_id, n.n_tokens,
         |  COALESCE(pd.n_dup_spans, 0) AS n_dup_spans,
         |  COALESCE(pd.dup_tokens, 0) AS dup_tokens,
         |  CASE WHEN n.n_tokens > 0
         |       THEN CAST(COALESCE(pd.dup_tokens, 0) AS DOUBLE) / CAST(n.n_tokens AS DOUBLE)
         |       ELSE 0.0 END AS dup_frac
         |FROM n LEFT JOIN pd ON n.doc_id = pd.doc_id""".stripMargin,
    "span_excise" ->
      // the rewrite over the shared span chain: tokens outside every
      // duplicated span, rebuilt in position order — the md5 of the
      // kept stream pins the whole rewrite byte-for-byte
      s"""WITH $SubstringSpanBody,
         |tk AS (SELECT doc_id, CAST(generate_subscripts(ws, 1) AS BIGINT) AS pos,
         |         unnest(ws) AS tok FROM n),
         |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tk t
         |         WHERE NOT EXISTS (SELECT 1 FROM sp
         |           WHERE sp.doc_id = t.doc_id AND t.pos BETWEEN sp.st AND sp.en)),
         |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
         |         md5(string_agg(tok, ' ' ORDER BY pos)) AS clean_fp
         |       FROM kept GROUP BY 1)
         |SELECT n.doc_id, n.n_tokens,
         |  COALESCE(ag.kept_tokens, 0) AS kept_tokens,
         |  COALESCE(ag.clean_fp, md5('')) AS clean_fp
         |FROM n LEFT JOIN ag ON n.doc_id = ag.doc_id""".stripMargin,
    "span_excise_keep_one" ->
      // keep-one policy: the (doc_id, pos)-first occurrence of each
      // duplicated shingle is not a mark (rn = 1 elected), so one copy
      // of every duplicated run survives corpus-wide
      s"""WITH $SubstringSpanKeepOneBody,
         |tk AS (SELECT doc_id, CAST(generate_subscripts(ws, 1) AS BIGINT) AS pos,
         |         unnest(ws) AS tok FROM n),
         |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tk t
         |         WHERE NOT EXISTS (SELECT 1 FROM sp
         |           WHERE sp.doc_id = t.doc_id AND t.pos BETWEEN sp.st AND sp.en)),
         |ag AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
         |         md5(string_agg(tok, ' ' ORDER BY pos)) AS clean_fp
         |       FROM kept GROUP BY 1)
         |SELECT n.doc_id, n.n_tokens,
         |  COALESCE(ag.kept_tokens, 0) AS kept_tokens,
         |  COALESCE(ag.clean_fp, md5('')) AS clean_fp
         |FROM n LEFT JOIN ag ON n.doc_id = ag.doc_id""".stripMargin,
    "text_stats" ->
      s"""WITH t AS (SELECT doc_id, lang, text, $WordToksSql AS tokens FROM documents)
         |SELECT doc_id, lang, length(text) AS text_len, len(tokens) AS n_tokens,
         |  len(list_distinct(tokens)) AS n_distinct_tokens,
         |  CAST(list_sum(list_transform(tokens, x -> length(x))) AS DOUBLE) /
         |    CAST(nullif(len(tokens), 0) AS DOUBLE) AS avg_token_len
         |FROM t""".stripMargin,
    "token_count" ->
      """WITH t AS (SELECT doc_id,
        |  regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]') AS toks FROM documents)
        |SELECT doc_id, len(toks) AS n_bpe_tokens,
        |  len(list_distinct(toks)) AS n_distinct_bpe
        |FROM t""".stripMargin,
    "tokenizer_fertility" ->
      s"""WITH t AS (SELECT lang,
         |    CAST(length(text) AS BIGINT) AS nc,
         |    CAST(len($WordToksSql) AS BIGINT) AS nw,
         |    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS nb
         |  FROM documents),
         |g AS (SELECT lang, count(*) AS n_docs,
         |    CAST(sum(nc) AS BIGINT) AS total_chars,
         |    CAST(sum(nw) AS BIGINT) AS total_word_tokens,
         |    CAST(sum(nb) AS BIGINT) AS total_bpe_tokens
         |  FROM t GROUP BY lang)
         |SELECT lang, n_docs, total_chars, total_word_tokens, total_bpe_tokens,
         |  CASE WHEN total_bpe_tokens > 0
         |       THEN CAST(total_chars AS DOUBLE) / CAST(total_bpe_tokens AS DOUBLE) END AS chars_per_bpe,
         |  CASE WHEN total_word_tokens > 0
         |       THEN CAST(total_bpe_tokens AS DOUBLE) / CAST(total_word_tokens AS DOUBLE) END AS bpe_per_word
         |FROM g""".stripMargin,
    "lang_confusion" ->
      s"""WITH t AS (SELECT lang, $WordToksSql AS tokens FROM documents),
         |s AS (SELECT lang,
         |  len(list_filter(tokens, x -> x IN ${inList("en")})) AS en_hits,
         |  len(list_filter(tokens, x -> x IN ${inList("es")})) AS es_hits,
         |  len(list_filter(tokens, x -> x IN ${inList("fr")})) AS fr_hits,
         |  len(list_filter(tokens, x -> x IN ${inList("de")})) AS de_hits
         |FROM t),
         |pr AS (SELECT lang,
         |  CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
         |       WHEN es_hits >= fr_hits AND es_hits >= de_hits AND es_hits > 0 THEN 'es'
         |       WHEN fr_hits >= de_hits AND fr_hits > 0 THEN 'fr'
         |       WHEN de_hits > 0 THEN 'de'
         |       ELSE 'und' END AS lang_pred
         |FROM s)
         |SELECT lang, lang_pred, count(*) AS cnt FROM pr GROUP BY 1, 2""".stripMargin,
    "lang_id" ->
      s"""WITH t AS (SELECT doc_id, $WordToksSql AS tokens FROM documents),
         |s AS (SELECT doc_id,
         |  len(list_filter(tokens, x -> x IN ${inList("en")})) AS en_hits,
         |  len(list_filter(tokens, x -> x IN ${inList("es")})) AS es_hits,
         |  len(list_filter(tokens, x -> x IN ${inList("fr")})) AS fr_hits,
         |  len(list_filter(tokens, x -> x IN ${inList("de")})) AS de_hits
         |FROM t)
         |SELECT doc_id, en_hits, es_hits, fr_hits, de_hits,
         |  CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
         |       WHEN es_hits >= fr_hits AND es_hits >= de_hits AND es_hits > 0 THEN 'es'
         |       WHEN fr_hits >= de_hits AND fr_hits > 0 THEN 'fr'
         |       WHEN de_hits > 0 THEN 'de'
         |       ELSE 'und' END AS lang_pred
         |FROM s""".stripMargin,
    "quality_score" ->
      s"""WITH $QualityBody
         |SELECT doc_id, quality FROM qq""".stripMargin,
    "fingerprint" ->
      s"""WITH t AS (SELECT doc_id, text, $WordToksSql AS tokens FROM documents)
         |SELECT doc_id, md5($NormSql) AS content_fp,
         |  md5(array_to_string(list_sort(list_distinct(tokens)), ' ')) AS bag_fp
         |FROM t""".stripMargin,
    "simhash" -> s"WITH $oracleSimhashBody\nSELECT doc_id, simhash FROM sfinal",
    "simhash_neardup" ->
      // 64-bit signature as two independent 32-bit halves (lo: md5(tok),
      // hi: md5('hi:'||tok)), banded 4×16 — mirrors TextQueries.simhash64Df
      s"""WITH ${simhash64Body("")}
         |SELECT doc_a, doc_b,
         |  CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 6""".stripMargin,
    "image_phash" ->
      // per-payload 64-bit dHash as two positive 32-bit halves —
      // mirrors Multimodal.lumaGrid/phashHalf bit for bit
      s"""WITH u AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS L, 0 AS bright
         |  FROM documents WHERE length(text) >= 72),
         |$PhashFromU
         |SELECT doc_id, ph_lo, ph_hi FROM p""".stripMargin,
    "phash_neardup" ->
      // plant one uniformly-brightened re-encode per payload (id
      // offset 1e6): dHash is invariant to the shift, so the band
      // equijoin + Hamming<=10 re-check must recover exactly those
      // pairs while the background (closest natural pair: 18) stays out
      s"""WITH d AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS L
         |  FROM documents WHERE length(text) >= 72),
         |u AS (SELECT doc_id, text, L, 0 AS bright FROM d
         |      UNION ALL
         |      SELECT doc_id + 1000000, text, L, 7 FROM d),
         |$PhashFromU,
         |banded AS (SELECT doc_id, ph_lo, ph_hi, b.b AS b,
         |    CASE WHEN b.b < 2 THEN (ph_lo >> (16 * b.b)) & 65535
         |         ELSE (ph_hi >> (16 * (b.b - 2))) & 65535 END AS band_val
         |  FROM p, (SELECT unnest(range(0, 4)) AS b) b),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
         |    a.ph_lo AS la, a.ph_hi AS ha, c.ph_lo AS lb, c.ph_hi AS hb
         |  FROM banded a JOIN banded c
         |    ON a.b = c.b AND a.band_val = c.band_val AND a.doc_id < c.doc_id)
         |SELECT doc_a, doc_b,
         |  CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |FROM cand WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 10""".stripMargin,
    "edit_distance_neardup" ->
      s"""WITH $LshCandBody,
         |d AS (SELECT doc_id, n_chars, substr(text, 1, 24) AS prefix FROM documents)
         |SELECT c.doc_a, c.doc_b,
         |  CAST(levenshtein(a.prefix, b.prefix) AS BIGINT) AS edit_dist
         |FROM cand c JOIN d a ON c.doc_a = a.doc_id JOIN d b ON c.doc_b = b.doc_id
         |WHERE abs(a.n_chars - b.n_chars) <= 10
         |  AND levenshtein(a.prefix, b.prefix) <= 15""".stripMargin,
    "doc_embedding_join" ->
      s"""SELECT doc_id, lang, n_chars, CAST(label AS BIGINT) AS label,
         |  sqrt($dotSelfSql) AS vec_norm
         |FROM documents JOIN embeddings ON doc_id = vec_id""".stripMargin,
    "knn_cosine" ->
      s"""WITH en AS (SELECT vec_id, embedding, sqrt($dotSelfSql) AS nrm FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm FROM en WHERE vec_id < 10),
         |p AS (SELECT q.qid, e.vec_id AS vid,
         |        ${dotSql("q.qemb", "e.embedding")} / (q.qnrm * e.nrm) AS cos
         |      FROM en e, q WHERE e.vec_id != q.qid),
         |r AS (SELECT qid, vid, cos,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM p)
         |SELECT qid, vid, cos FROM r WHERE rn <= 5""".stripMargin,
    "filtered_ann" ->
      // filter FIRST, then rank: the window sees only qualifying rows, so
      // every query fills its k whenever k same-label rows exist
      s"""WITH en AS (SELECT vec_id, embedding, label, sqrt($dotSelfSql) AS nrm FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm, label AS qlabel
         |      FROM en WHERE vec_id < 10),
         |p AS (SELECT q.qid, q.qlabel AS label, e.vec_id AS vid,
         |        ${dotSql("q.qemb", "e.embedding")} / (q.qnrm * e.nrm) AS cos
         |      FROM en e, q WHERE e.vec_id != q.qid AND e.label = q.qlabel),
         |r AS (SELECT qid, label, vid, cos,
         |        CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid)
         |          AS BIGINT) AS rk FROM p)
         |SELECT qid, label, vid, cos, rk FROM r WHERE rk <= 5""".stripMargin,
    "ann_ivf" ->
      s"""$IvfAssignSql,
         |q AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm, bucket FROM probes WHERE vec_id < 10),
         |p AS (SELECT q.qid, a.vec_id AS vid,
         |        ${dotSql("q.qemb", "a.embedding")} / (q.qnrm * a.nrm) AS cos
         |      FROM q JOIN asn a ON q.bucket = a.bucket AND a.vec_id != q.qid),
         |r AS (SELECT qid, vid, cos,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM p)
         |SELECT qid, vid, cos FROM r WHERE rn <= 3""".stripMargin,
    // the served twin is bit-identical to ann_ivf by construction (same
    // persisted centroids, same routing argmax, same cosine/top-3)
    "ann_ivf_served" ->
      s"""$IvfAssignSql,
         |q AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm, bucket FROM probes WHERE vec_id < 10),
         |p AS (SELECT q.qid, a.vec_id AS vid,
         |        ${dotSql("q.qemb", "a.embedding")} / (q.qnrm * a.nrm) AS cos
         |      FROM q JOIN asn a ON q.bucket = a.bucket AND a.vec_id != q.qid),
         |r AS (SELECT qid, vid, cos,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM p)
         |SELECT qid, vid, cos FROM r WHERE rn <= 3""".stripMargin,
    "filtered_ann_served" ->
      // the served chain with the facet filtered FIRST: the candidate
      // side restricts to label = FacetLabel BEFORE the rank window, so
      // k fills among qualifying vectors in the probed buckets and
      // surviving scores are bit-identical to the unfiltered serve
      s"""$IvfAssignSql,
         |q AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm, bucket FROM probes WHERE vec_id < 10),
         |p AS (SELECT q.qid, a.vec_id AS vid,
         |        ${dotSql("q.qemb", "a.embedding")} / (q.qnrm * a.nrm) AS cos
         |      FROM q JOIN asn a ON q.bucket = a.bucket AND a.vec_id != q.qid
         |      WHERE a.vec_id IN (SELECT vec_id FROM embeddings
         |                         WHERE label = ${SimilarityQueries.FacetLabel})),
         |r AS (SELECT qid, vid, cos,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM p)
         |SELECT qid, vid, cos FROM r WHERE rn <= 3""".stripMargin,
    "filtered_ann_source" ->
      // the served chain scoped to one SOURCE's candidates (membership
      // via doc_id ≡ vec_id), filter-first before the rank window —
      // surviving cosines bit-identical to the unfiltered serve
      s"""$IvfAssignSql,
         |q AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm, bucket FROM probes WHERE vec_id < 10),
         |p AS (SELECT q.qid, a.vec_id AS vid,
         |        ${dotSql("q.qemb", "a.embedding")} / (q.qnrm * a.nrm) AS cos
         |      FROM q JOIN asn a ON q.bucket = a.bucket AND a.vec_id != q.qid
         |      WHERE a.vec_id IN (SELECT doc_id FROM documents
         |                         WHERE source = '${SimilarityQueries.FacetVecSource}')),
         |r AS (SELECT qid, vid, cos,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM p)
         |SELECT qid, vid, cos FROM r WHERE rn <= 3""".stripMargin,
    "ann_ivf_merged" ->
      // shard-A centroids; routing/serving tail identical to
      // ann_ivf_served — frozen-centroid merge ≡ one-pass assignment
      s"""$IvfAssignMergedCentSql,
         |q AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm, bucket FROM probes WHERE vec_id < 10),
         |p AS (SELECT q.qid, a.vec_id AS vid,
         |        ${dotSql("q.qemb", "a.embedding")} / (q.qnrm * a.nrm) AS cos
         |      FROM q JOIN asn a ON q.bucket = a.bucket AND a.vec_id != q.qid),
         |r AS (SELECT qid, vid, cos,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM p)
         |SELECT qid, vid, cos FROM r WHERE rn <= 3""".stripMargin,
    "ann_ivf_appended" ->
      // base-slice centroids; routing/serving tail identical to
      // ann_ivf_served — frozen-centroid append ≡ one-pass assignment
      s"""$IvfAssignBaseCentSql,
         |q AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm, bucket FROM probes WHERE vec_id < 10),
         |p AS (SELECT q.qid, a.vec_id AS vid,
         |        ${dotSql("q.qemb", "a.embedding")} / (q.qnrm * a.nrm) AS cos
         |      FROM q JOIN asn a ON q.bucket = a.bucket AND a.vec_id != q.qid),
         |r AS (SELECT qid, vid, cos,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM p)
         |SELECT qid, vid, cos FROM r WHERE rn <= 3""".stripMargin,
    "ann_ndcg" ->
      // gains 3/2/1 by exact cosine rank; discounts pinned as literals
      // (log is not correctly-rounded IEEE); picounit-quantized terms
      // sum as BIGINTs, one pinned division chain by the ideal DCG
      s"""$IvfAssignSql,
         |kq AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm FROM en WHERE vec_id < 10),
         |kp AS (SELECT kq.qid, e.vec_id AS vid,
         |        ${dotSql("kq.qemb", "e.embedding")} / (kq.qnrm * e.nrm) AS cos
         |      FROM en e, kq WHERE e.vec_id != kq.qid),
         |kr AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM kp),
         |ex AS (SELECT qid, vid, 4 - rn AS gain FROM kr WHERE rn <= 3),
         |aq AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm, bucket FROM probes WHERE vec_id < 10),
         |ap AS (SELECT aq.qid, a.vec_id AS vid,
         |        ${dotSql("aq.qemb", "a.embedding")} / (aq.qnrm * a.nrm) AS cos
         |      FROM aq JOIN asn a ON aq.bucket = a.bucket AND a.vec_id != aq.qid),
         |ar AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM ap),
         |a3 AS (SELECT qid, vid, rn AS p FROM ar WHERE rn <= 3),
         |tm AS (SELECT a.qid,
         |    CAST(floor(CAST(coalesce(e.gain, 0) AS DOUBLE) *
         |      (CASE WHEN a.p = 1 THEN 1.0 WHEN a.p = 2 THEN 0.6309297535714575 ELSE 0.5 END)
         |      * 1000000000000.0) AS BIGINT) AS t_fp
         |  FROM a3 a LEFT JOIN ex e ON a.qid = e.qid AND a.vid = e.vid)
         |SELECT qid, CAST(count(*) AS BIGINT) AS n_listed,
         |  (CAST(sum(t_fp) AS DOUBLE) / 1000000000000.0) /
         |    (3.0*1.0 + 2.0*0.6309297535714575 + 1.0*0.5) AS ndcg
         |FROM tm GROUP BY qid""".stripMargin,
    "ann_recall" ->
      s"""$IvfAssignSql,
         |kq AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm FROM en WHERE vec_id < 10),
         |kp AS (SELECT kq.qid, e.vec_id AS vid,
         |        ${dotSql("kq.qemb", "e.embedding")} / (kq.qnrm * e.nrm) AS cos
         |      FROM en e, kq WHERE e.vec_id != kq.qid),
         |kr AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM kp),
         |exact3 AS (SELECT qid, vid FROM kr WHERE rn <= 3),
         |aq AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm, bucket FROM probes WHERE vec_id < 10),
         |ap AS (SELECT aq.qid, a.vec_id AS vid,
         |        ${dotSql("aq.qemb", "a.embedding")} / (aq.qnrm * a.nrm) AS cos
         |      FROM aq JOIN asn a ON aq.bucket = a.bucket AND a.vec_id != aq.qid),
         |ar AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM ap),
         |approx3 AS (SELECT qid, vid FROM ar WHERE rn <= 3),
         |hits AS (SELECT e.qid, count(*) AS n_hit FROM exact3 e
         |         JOIN approx3 x ON e.qid = x.qid AND e.vid = x.vid GROUP BY 1),
         |base AS (SELECT qid, count(*) AS k FROM exact3 GROUP BY 1)
         |SELECT b.qid, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit, b.k,
         |  CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / CAST(b.k AS DOUBLE) AS recall
         |FROM base b LEFT JOIN hits h ON b.qid = h.qid""".stripMargin,
    "ann_recall_trained" ->
      // recall@3 of the trained-centroid IVF (ann_ivf_trained's tq/tp/tr
      // chain) against the exact brute-force cosine top-3 (ann_recall's
      // kq/kp/kr chain — KmeansTrain2Body already provides `en`)
      s"""$KmeansTrain2Body,
         |kq AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm FROM en WHERE vec_id < 10),
         |kp AS (SELECT kq.qid, e.vec_id AS vid,
         |        ${dotSql("kq.qemb", "e.embedding")} / (kq.qnrm * e.nrm) AS cos
         |      FROM en e, kq WHERE e.vec_id != kq.qid),
         |kr AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM kp),
         |exact3 AS (SELECT qid, vid FROM kr WHERE rn <= 3),
         |tq AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm,
         |        cid2 AS bucket
         |      FROM r2 WHERE vec_id < 10 AND rn <= ${SimilarityQueries.IvfNprobe}),
         |tp AS (SELECT tq.qid, a.vec_id AS vid,
         |        ${dotSql("tq.qemb", "a.embedding")} / (tq.qnrm * a.nrm) AS cos
         |      FROM tq JOIN asn2 a ON tq.bucket = a.bucket AND a.vec_id != tq.qid),
         |tr AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM tp),
         |approx3 AS (SELECT qid, vid FROM tr WHERE rn <= 3),
         |hits AS (SELECT e.qid, count(*) AS n_hit FROM exact3 e
         |         JOIN approx3 x ON e.qid = x.qid AND e.vid = x.vid GROUP BY 1),
         |base AS (SELECT qid, count(*) AS k FROM exact3 GROUP BY 1)
         |SELECT b.qid, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit, b.k,
         |  CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / CAST(b.k AS DOUBLE) AS recall
         |FROM base b LEFT JOIN hits h ON b.qid = h.qid""".stripMargin,
    "ann_recall_nprobe" ->
      // the sweep reuses IvfAssignSql's `ranked` CTE directly: a query's
      // nprobe-wide probe set is exactly its centroid ranks 1..nprobe
      // (Spark's posexplode ppos is 0-based, rn here is 1-based)
      s"""$IvfAssignSql,
         |lv AS (SELECT unnest([1, 2, 4]) AS nprobe),
         |kq AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm FROM en WHERE vec_id < 10),
         |kp AS (SELECT kq.qid, e.vec_id AS vid,
         |        ${dotSql("kq.qemb", "e.embedding")} / (kq.qnrm * e.nrm) AS cos
         |      FROM en e, kq WHERE e.vec_id != kq.qid),
         |kr AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM kp),
         |exact3 AS (SELECT qid, vid FROM kr WHERE rn <= 3),
         |aq AS (SELECT lv.nprobe, r.vec_id AS qid, r.embedding AS qemb,
         |        r.nrm AS qnrm, r.cid AS bucket
         |      FROM ranked r, lv WHERE r.vec_id < 10 AND r.rn <= lv.nprobe),
         |ap AS (SELECT aq.nprobe, aq.qid, a.vec_id AS vid,
         |        ${dotSql("aq.qemb", "a.embedding")} / (aq.qnrm * a.nrm) AS cos
         |      FROM aq JOIN asn a ON aq.bucket = a.bucket AND a.vec_id != aq.qid),
         |ar AS (SELECT nprobe, qid, vid,
         |        row_number() OVER (PARTITION BY nprobe, qid ORDER BY cos DESC, vid) AS rn FROM ap),
         |approx3 AS (SELECT nprobe, qid, vid FROM ar WHERE rn <= 3),
         |hits AS (SELECT x.nprobe, count(*) AS n_hit FROM approx3 x
         |         JOIN exact3 e ON x.qid = e.qid AND x.vid = e.vid GROUP BY 1),
         |base AS (SELECT count(*) AS k FROM exact3)
         |SELECT CAST(lv.nprobe AS BIGINT) AS nprobe,
         |  CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
         |  CAST(b.k AS BIGINT) AS k,
         |  CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / CAST(b.k AS DOUBLE) AS recall
         |FROM lv CROSS JOIN base b LEFT JOIN hits h ON h.nprobe = lv.nprobe""".stripMargin,
    "mrl_recall" ->
      // truncated pass = cosine over the first MrlDims components only
      // (DuckDB's 1-based inclusive slice); same sliced ascending fold
      // order as FloatVecDot over Spark's slice()
      s"""WITH en AS (SELECT vec_id, embedding, sqrt($dotSelfSql) AS nrm,
         |        embedding[1:${SimilarityQueries.MrlDims}] AS temb,
         |        sqrt(${dotSql(s"embedding[1:${SimilarityQueries.MrlDims}]",
                                s"embedding[1:${SimilarityQueries.MrlDims}]")}) AS tnrm
         |      FROM embeddings),
         |q AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm,
         |        temb AS qtemb, tnrm AS qtnrm FROM en WHERE vec_id < 10),
         |fp AS (SELECT q.qid, e.vec_id AS vid,
         |        ${dotSql("q.qemb", "e.embedding")} / (q.qnrm * e.nrm) AS cos
         |      FROM en e, q WHERE e.vec_id != q.qid),
         |fr AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM fp),
         |exact3 AS (SELECT qid, vid FROM fr WHERE rn <= 3),
         |tp AS (SELECT q.qid, e.vec_id AS vid,
         |        ${dotSql("q.qtemb", "e.temb")} / (q.qtnrm * e.tnrm) AS cos
         |      FROM en e, q WHERE e.vec_id != q.qid),
         |tr AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM tp),
         |trunc3 AS (SELECT qid, vid FROM tr WHERE rn <= 3),
         |hits AS (SELECT e.qid, count(*) AS n_hit FROM trunc3 t
         |         JOIN exact3 e ON t.qid = e.qid AND t.vid = e.vid GROUP BY 1),
         |base AS (SELECT qid, count(*) AS k FROM exact3 GROUP BY 1)
         |SELECT b.qid, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit, b.k,
         |  CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / CAST(b.k AS DOUBLE) AS recall
         |FROM base b LEFT JOIN hits h ON b.qid = h.qid""".stripMargin,
    "embedding_neardup" ->
      s"""$IvfAssignSql,
         |p AS (SELECT a.vec_id AS va, b.vec_id AS vb,
         |    ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
         |  FROM asn a JOIN asn b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT va, vb, cos FROM p WHERE cos >= 0.3""".stripMargin,
    "srp_neardup" ->
      s"""WITH $SrpCandBody,
         |p AS (SELECT cand.va, cand.vb,
         |    ${dotSql("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm) AS cos
         |  FROM cand JOIN sen ea ON cand.va = ea.vec_id JOIN sen eb ON cand.vb = eb.vec_id)
         |SELECT va, vb, cos FROM p WHERE cos >= ${SimilarityQueries.SrpCosThreshold}""".stripMargin,
    "srp_estimate" ->
      // every band candidate: 64-bit signature Hamming (the sketch's
      // angle estimate) beside the exact pinned-fold cosine
      s"""WITH $SrpCandBody
         |SELECT cand.va, cand.vb,
         |  CAST(bit_count(xor(a.sp_lo, b2.sp_lo)) + bit_count(xor(a.sp_hi, b2.sp_hi)) AS BIGINT) AS hamming,
         |  ${dotSql("ea.embedding", "eb.embedding")} / (ea.nrm * eb.nrm) AS cos
         |FROM cand JOIN sig a ON cand.va = a.vec_id JOIN sig b2 ON cand.vb = b2.vec_id
         |  JOIN sen ea ON cand.va = ea.vec_id JOIN sen eb ON cand.vb = eb.vec_id""".stripMargin,
    "source_centroids" ->
      // cosine of means = cosine of sums (scale invariance): exact
      // integer component sums, two sqrts and one division at the end
      """WITH q AS (SELECT d.source,
        |    CAST(generate_subscripts(e.embedding, 1) AS BIGINT) AS pos,
        |    CAST(floor(CAST(unnest(e.embedding) AS DOUBLE) * 1000) AS BIGINT) AS qv
        |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
        |s AS MATERIALIZED (SELECT source, pos, CAST(sum(qv) AS BIGINT) AS sv,
        |    CAST(count(*) AS BIGINT) AS cnt FROM q GROUP BY 1, 2),
        |g AS MATERIALIZED (SELECT pos, CAST(sum(sv) AS BIGINT) AS gv FROM s GROUP BY 1),
        |p AS (SELECT s.source, CAST(sum(s.sv * g.gv) AS BIGINT) AS dot,
        |    CAST(sum(s.sv * s.sv) AS BIGINT) AS na,
        |    max(CASE WHEN s.pos = 1 THEN s.cnt END) AS n_docs
        |  FROM s JOIN g ON s.pos = g.pos GROUP BY 1),
        |nb AS (SELECT CAST(sum(gv * gv) AS BIGINT) AS nb FROM g)
        |SELECT p.source, p.n_docs,
        |  CAST(p.dot AS DOUBLE)
        |    / (sqrt(CAST(p.na AS DOUBLE)) * sqrt(CAST(nb.nb AS DOUBLE)))
        |    AS cos_to_corpus
        |FROM p, nb""".stripMargin,
    "prefix_join" ->
      // the ORACLE runs the corpus-wide co-occurrence join the engine's
      // prefix filter exists to avoid — by the prefix lemma the two
      // produce the same thresholded pair set (10i >= 7u ⟺ J >= 0.7)
      s"""WITH rw AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |rs0 AS (SELECT doc_id, unnest($ShingleSql) AS sh FROM rw),
         |rs AS MATERIALIZED (SELECT DISTINCT doc_id, ${hash32Sql("sh")} AS h FROM rs0),
         |rsz AS MATERIALIZED (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM rs GROUP BY 1),
         |rit AS (SELECT a.doc_id AS da, b2.doc_id AS db, CAST(count(*) AS BIGINT) AS i
         |  FROM rs a JOIN rs b2 ON a.h = b2.h AND a.doc_id < b2.doc_id GROUP BY 1, 2),
         |rpj AS (SELECT da, db, i, sa.n + sb.n - i AS u
         |  FROM rit JOIN rsz sa ON da = sa.doc_id JOIN rsz sb ON db = sb.doc_id)
         |SELECT da AS doc_a, db AS doc_b, i AS inter, u AS n_union,
         |  CAST(i AS DOUBLE) / CAST(u AS DOUBLE) AS jaccard
         |FROM rpj WHERE i * 10 >= u * 7""".stripMargin,
    "lsh_recall" -> {
      // truth = exact hashed-shingle Jaccard via the co-occurrence
      // equijoin (r-prefixed CTEs so they don't collide with
      // LshCandBody's w/shx/m/b/cand); i·10 >= u·t keeps every
      // threshold test in exact BIGINTs
      s"""WITH $LshCandBody,
         |rw AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |rs0 AS (SELECT doc_id, unnest($ShingleSql) AS sh FROM rw),
         |rs AS (SELECT DISTINCT doc_id, ${hash32Sql("sh")} AS h FROM rs0),
         |rsz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM rs GROUP BY 1),
         |rit AS (SELECT a.doc_id AS da, b2.doc_id AS db, CAST(count(*) AS BIGINT) AS i
         |  FROM rs a JOIN rs b2 ON a.h = b2.h AND a.doc_id < b2.doc_id GROUP BY 1, 2),
         |rpj AS (SELECT da, db, i, sa.n + sb.n - i AS u
         |  FROM rit JOIN rsz sa ON da = sa.doc_id JOIN rsz sb ON db = sb.doc_id),
         |rpc AS (SELECT rpj.i, rpj.u,
         |    CASE WHEN c.doc_a IS NOT NULL THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS caught
         |  FROM rpj LEFT JOIN cand c ON rpj.da = c.doc_a AND rpj.db = c.doc_b),
         |th AS (SELECT unnest(range(1, 10)) AS t)
         |SELECT CAST(t AS BIGINT) AS threshold_x10,
         |  CAST(sum(CASE WHEN i * 10 >= u * t THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
         |  CAST(sum(CASE WHEN i * 10 >= u * t THEN caught ELSE 0 END) AS BIGINT) AS n_caught,
         |  CASE WHEN sum(CASE WHEN i * 10 >= u * t THEN 1 ELSE 0 END) > 0
         |       THEN CAST(sum(CASE WHEN i * 10 >= u * t THEN caught ELSE 0 END) AS DOUBLE)
         |            / CAST(sum(CASE WHEN i * 10 >= u * t THEN 1 ELSE 0 END) AS DOUBLE)
         |       ELSE NULL END AS recall
         |FROM rpc, th GROUP BY t""".stripMargin
    },
    "lsh_recall_sampled" -> {
      // the corpus-scale audit twin: the TRUTH side restricted to the
      // deterministic fixed-size sample (smallest md5("smp:"||id), ties
      // impossible), the candidate side the full band-bounded cand set
      s"""WITH $LshCandBody,
         |rsmp AS (SELECT doc_id FROM (
         |    SELECT doc_id, md5('smp:' || CAST(doc_id AS VARCHAR)) AS hk
         |    FROM documents ORDER BY hk, doc_id
         |    LIMIT ${SimilarityQueries.RecallSampleK})),
         |rw AS (SELECT doc_id, $WordToksSql AS ws FROM documents
         |  WHERE doc_id IN (SELECT doc_id FROM rsmp)),
         |rs0 AS (SELECT doc_id, unnest($ShingleSql) AS sh FROM rw),
         |rs AS (SELECT DISTINCT doc_id, ${hash32Sql("sh")} AS h FROM rs0),
         |rsz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM rs GROUP BY 1),
         |rit AS (SELECT a.doc_id AS da, b2.doc_id AS db, CAST(count(*) AS BIGINT) AS i
         |  FROM rs a JOIN rs b2 ON a.h = b2.h AND a.doc_id < b2.doc_id GROUP BY 1, 2),
         |rpj AS (SELECT da, db, i, sa.n + sb.n - i AS u
         |  FROM rit JOIN rsz sa ON da = sa.doc_id JOIN rsz sb ON db = sb.doc_id),
         |rpc AS (SELECT rpj.i, rpj.u,
         |    CASE WHEN c.doc_a IS NOT NULL THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS caught
         |  FROM rpj LEFT JOIN cand c ON rpj.da = c.doc_a AND rpj.db = c.doc_b),
         |th AS (SELECT unnest(range(1, 10)) AS t)
         |SELECT CAST(t AS BIGINT) AS threshold_x10,
         |  CAST(sum(CASE WHEN i * 10 >= u * t THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
         |  CAST(sum(CASE WHEN i * 10 >= u * t THEN caught ELSE 0 END) AS BIGINT) AS n_caught,
         |  CASE WHEN sum(CASE WHEN i * 10 >= u * t THEN 1 ELSE 0 END) > 0
         |       THEN CAST(sum(CASE WHEN i * 10 >= u * t THEN caught ELSE 0 END) AS DOUBLE)
         |            / CAST(sum(CASE WHEN i * 10 >= u * t THEN 1 ELSE 0 END) AS DOUBLE)
         |       ELSE NULL END AS recall
         |FROM rpc, th GROUP BY t""".stripMargin
    },
    "minhash_threshold_sweep" -> {
      // candidate pairs surviving each sketch-match threshold 1..12 —
      // pure integer counts over the shared cand + signature CTEs
      val matchSum = SimilarityQueries.MinhashSeeds.indices
        .map(i => s"(CASE WHEN a.mh$i = b2.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
      s"""WITH $LshCandBody,
         |pm AS (SELECT $matchSum AS n_match
         |  FROM cand c JOIN m a ON c.doc_a = a.doc_id JOIN m b2 ON c.doc_b = b2.doc_id),
         |th AS (SELECT unnest(range(1, 13)) AS i)
         |SELECT CAST(i AS BIGINT) AS threshold,
         |  CAST(sum(CASE WHEN n_match >= i THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
         |FROM pm, th GROUP BY 1""".stripMargin
    },
    "dup_triangles" ->
      // canonical a<b<c triangle join over the shared cand CTE; wedge
      // sum integer-exact (deg*(deg-1) even), one final IEEE division
      s"""WITH $LshCandBody,
         |deg AS (SELECT d, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT doc_a AS d FROM cand UNION ALL SELECT doc_b FROM cand)
         |  GROUP BY d),
         |wg AS (SELECT CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg),
         |ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM cand),
         |tr AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
         |  FROM cand e1 JOIN cand e2 ON e1.doc_b = e2.doc_a
         |    JOIN cand e3 ON e1.doc_a = e3.doc_a AND e2.doc_b = e3.doc_b)
         |SELECT ne.n_edges, wg.n_wedges, tr.n_triangles,
         |  CASE WHEN wg.n_wedges > 0
         |    THEN 3.0 * CAST(tr.n_triangles AS DOUBLE) / CAST(wg.n_wedges AS DOUBLE)
         |    ELSE 0.0 END AS clustering_coeff
         |FROM ne, wg, tr""".stripMargin,
    "semantic_threshold_sweep" ->
      // 13 candidate thresholds i/20.0 over the same IVF pair space —
      // identical cos doubles, integer counts
      s"""$IvfAssignSql,
         |p AS (SELECT ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
         |  FROM asn a JOIN asn b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |th AS (SELECT unnest(range(6, 19)) AS i)
         |SELECT CAST(i AS DOUBLE) / 20.0 AS threshold,
         |  CAST(sum(CASE WHEN cos >= CAST(i AS DOUBLE) / 20.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs
         |FROM p, th GROUP BY 1""".stripMargin,
    "kmeans_step" ->
      // Lloyd's update over the IVF assignment: element-wise bucket means
      // from fixed-point floor(v*1e6) long sums (order-independent exact
      // integer arithmetic), one IEEE division at the end — mirrors
      // SimilarityQueries.kmeansStep bit-for-bit
      s"""$IvfAssignSql,
         |ex AS (SELECT bucket, generate_subscripts(embedding, 1) AS pos,
         |         unnest(embedding) AS v FROM asn),
         |ag AS (SELECT bucket, CAST(pos AS BIGINT) AS pos,
         |         CAST(count(*) AS BIGINT) AS n_members,
         |         CAST(sum(CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS BIGINT) AS qsum
         |       FROM ex GROUP BY bucket, pos)
         |SELECT bucket, pos, n_members,
         |  CAST(qsum AS DOUBLE) / (CAST(n_members AS DOUBLE) * 1000000.0) AS centroid
         |FROM ag""".stripMargin,
    "kmeans_train2" ->
      s"""$KmeansTrain2Body
         |SELECT vec_id, bucket, ccos AS cos FROM asn2""".stripMargin,
    "ann_ivf_trained" -> AnnIvfTrainedSql,
    // the persisted-trained-index serving path is bit-identical to the
    // in-session trained search (same centroids, same routing argmax,
    // same cosine and top-3 window) — one oracle pins both
    "ann_ivf_trained_served" -> AnnIvfTrainedSql,
    "cluster_terms" ->
      // df-damped cluster containment over the shared two-round Lloyd's
      // chain: BIGINT counts, one integer floor-division, term tie-break
      s"""$KmeansTrain2Body,
         |dt AS (SELECT doc_id, unnest(list_distinct($WordToksSql)) AS tok
         |       FROM documents),
         |dfr AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM dt GROUP BY 1),
         |ctf AS (SELECT a.bucket, dt.tok, CAST(count(*) AS BIGINT) AS ctf
         |        FROM dt JOIN asn2 a ON dt.doc_id = a.vec_id
         |        GROUP BY 1, 2),
         |sc AS (SELECT bucket, c.tok, ctf, df,
         |         (ctf * 1000000) // (df + 1) AS score_fp
         |       FROM ctf c JOIN dfr ON c.tok = dfr.tok),
         |rk AS (SELECT *, CAST(row_number() OVER (PARTITION BY bucket
         |         ORDER BY score_fp DESC, tok) AS BIGINT) AS rk
         |       FROM sc)
         |SELECT bucket, rk, tok, ctf, df, score_fp FROM rk WHERE rk <= 3""".stripMargin,
    "embedding_outliers" ->
      // bottom-20 assignment cosines over the shared two-round chain:
      // the vectors farthest from every trained density center
      s"""$KmeansTrain2Body,
         |o AS (SELECT vec_id, bucket, ccos AS cos,
         |        CAST(row_number() OVER (ORDER BY ccos ASC, vec_id ASC) AS BIGINT) AS rk
         |      FROM asn2)
         |SELECT vec_id, bucket, cos, rk FROM o WHERE rk <= 20""".stripMargin,
    "token_lift" ->
      // PMI's monotone rational form: c(ab)·N·10⁶ // (c(a)·c(b)),
      // support ≥ 5, top-50 by (lift, pair) — no log space
      s"""WITH w AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |t AS (SELECT doc_id, unnest(ws) AS tok FROM w),
         |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS cu FROM t GROUP BY tok),
         |bx AS (SELECT unnest(list_transform(range(1, len(ws)),
         |         i -> struct_pack(a := ws[i], b := ws[i+1]))) AS p
         |       FROM w),
         |bg AS (SELECT p.a AS a, p.b AS b, CAST(count(*) AS BIGINT) AS cb
         |       FROM bx GROUP BY 1, 2),
         |nn AS (SELECT CAST(sum(cb) AS BIGINT) AS n FROM bg),
         |lf AS (SELECT g.a, g.b, g.cb,
         |         CAST((g.cb * nn.n * 1000000) // (ua.cu * ub.cu) AS BIGINT) AS lift_fp
         |       FROM bg g
         |       JOIN uni ua ON g.a = ua.tok
         |       JOIN uni ub ON g.b = ub.tok
         |       CROSS JOIN nn
         |       WHERE g.cb >= 5),
         |r AS (SELECT a, b, cb, lift_fp,
         |        CAST(lift_fp AS DOUBLE) / 1000000.0 AS lift,
         |        CAST(row_number() OVER (ORDER BY lift_fp DESC, a ASC, b ASC) AS BIGINT) AS rk
         |      FROM lf)
         |SELECT a, b, cb, lift_fp, lift, rk FROM r WHERE rk <= 50""".stripMargin,
    "pca_power" ->
      // three unrolled power-iteration rounds over the mean-centered
      // embeddings: the row-order-dependent matvec reduction is quantized
      // per (row, dim) to floor(s·cxⱼ·10⁶) BIGINTs (exact,
      // order-independent); per-row dots and norms are the same
      // index-order folds as every cosine oracle
      s"""WITH $PcaChainBody,
         |nw AS (SELECT sqrt(${dotSql("w", "w")}) AS nw FROM w3)
         |SELECT CAST(q3.pos AS BIGINT) AS pos, q3.q AS w_fp,
         |  CAST(q3.q AS DOUBLE) / nw.nw AS loading
         |FROM q3, nw""".stripMargin,
    "pca_project" ->
      // every vector scored against the shared chain's unit v3 (index-
      // order dot of identical doubles), binned at floor(s·10)
      s"""WITH $PcaChainBody,
         |ppr AS (SELECT c.vec_id, ${dotSql("c.cx", "v.v")} AS s FROM cx c, v3 v)
         |SELECT CAST(floor(ppr.s * 10) AS BIGINT) AS bin,
         |  CAST(e2.label AS BIGINT) AS label,
         |  count(*) AS cnt, min(ppr.s) AS min_s, max(ppr.s) AS max_s
         |FROM ppr JOIN embeddings e2 ON ppr.vec_id = e2.vec_id
         |GROUP BY 1, 2""".stripMargin,
    "cluster_eval" ->
      // inertia as exact fixed-point sums (floor((d·d)·10⁶) per
      // coordinate, summed as BIGINTs — order-independent), majority
      // label per trained bucket; asn2/nc2 from the shared chain
      s"""$KmeansTrain2Body,
         |se AS (SELECT a.bucket,
         |    CAST(list_sum(list_transform(range(1, len(a.embedding) + 1),
         |      i -> CAST(floor((CAST(a.embedding[i] AS DOUBLE) - c.cemb2[i])
         |                      * (CAST(a.embedding[i] AS DOUBLE) - c.cemb2[i])
         |                      * 1000000.0) AS BIGINT))) AS BIGINT) AS sse_row
         |  FROM asn2 a JOIN nc2 c ON a.bucket = c.cid2),
         |ss AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_members,
         |         CAST(sum(sse_row) AS BIGINT) AS sse_fp FROM se GROUP BY bucket),
         |lb AS (SELECT a.bucket, e.label, CAST(count(*) AS BIGINT) AS cl
         |       FROM asn2 a JOIN embeddings e ON a.vec_id = e.vec_id
         |       GROUP BY a.bucket, e.label),
         |mj AS (SELECT bucket, label, cl,
         |         row_number() OVER (PARTITION BY bucket ORDER BY cl DESC, label) AS rn
         |       FROM lb)
         |SELECT s.bucket, s.n_members, s.sse_fp,
         |  CAST(m.label AS BIGINT) AS majority_label, m.cl AS n_majority,
         |  CAST(m.cl AS DOUBLE) / CAST(s.n_members AS DOUBLE) AS purity
         |FROM ss s JOIN mj m ON s.bucket = m.bucket AND m.rn = 1""".stripMargin,
    "kmeans_shift" ->
      // Chebyshev centroid movement per bucket: max over coordinates of
      // |updated - seed| (max is aggregation-order-independent); ag/nc/
      // cent come from the shared two-round chain
      s"""$KmeansTrain2Body,
         |mem AS (SELECT bucket, CAST(min(n) AS BIGINT) AS n_members FROM ag GROUP BY bucket)
         |SELECT n.cid2 AS bucket, m.n_members,
         |  list_max(list_transform(range(1, len(n.cemb2) + 1),
         |    i -> abs(n.cemb2[i] - CAST(c.cemb[i] AS DOUBLE)))) AS max_shift
         |FROM nc n JOIN cent c ON n.cid2 = c.cid JOIN mem m ON n.cid2 = m.bucket""".stripMargin,
    "semantic_clusters" ->
      // SemDeDup clustering: transitive closure over the trained-bucket
      // cosine pairs via recursive CTE (the dedup_clusters discipline on
      // the embedding graph); KmeansTrain2Body's own WITH is stripped so
      // RECURSIVE can take the single WITH slot
      s"""WITH RECURSIVE $SemClusterBody
         |SELECT vec_id, cluster FROM scl""".stripMargin,
    "semantic_keep" ->
      // keeper = farthest-from-centroid member (ccos asc, vec_id) —
      // SemDeDup's keep-the-outlier heuristic; ccos is the bit-exact
      // round-2 assignment cosine kmeans_train2 already pins
      s"""WITH RECURSIVE $SemClusterBody,
         |kk AS (SELECT s.cluster, a.vec_id, a.ccos,
         |    row_number() OVER (PARTITION BY s.cluster ORDER BY a.ccos ASC, a.vec_id) AS rn,
         |    count(*) OVER (PARTITION BY s.cluster) AS n_vecs
         |  FROM scl s JOIN asn2 a ON s.vec_id = a.vec_id)
         |SELECT cluster, vec_id AS keeper, CAST(n_vecs AS BIGINT) AS n_vecs,
         |  ccos AS keeper_cos
         |FROM kk WHERE rn = 1""".stripMargin,
    "semantic_neardup" ->
      // embedding_neardup's pair pattern over the TRAINED round-2 buckets
      s"""$KmeansTrain2Body,
         |p AS (SELECT a.vec_id AS va, b.vec_id AS vb,
         |    ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
         |  FROM asn2 a JOIN asn2 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT va, vb, cos FROM p WHERE cos >= 0.3""".stripMargin,
    "dup_pagerank" ->
      // three unrolled power-iteration rounds in pure integer arithmetic:
      // DuckDB's `//` and Spark's `div` are the same floor division on the
      // non-negative fixed-point ranks, so every round is bit-exact
      s"""WITH $LshCandBody,
         |adj AS (SELECT doc_a AS src, doc_b AS dst FROM cand
         |        UNION ALL SELECT doc_b AS src, doc_a AS dst FROM cand),
         |dg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY src),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         |r0 AS (SELECT doc_id, 1000000 // n AS r FROM documents CROSS JOIN tot),
         |${(1 to 3).map { i =>
           s"""c$i AS (SELECT a.dst, CAST(sum(r.r // d.deg) AS BIGINT) AS s
              |       FROM adj a JOIN dg d ON a.src = d.src
              |            JOIN r${i - 1} r ON a.src = r.doc_id
              |       GROUP BY a.dst),
              |r$i AS (SELECT doc_id, (150000 // t.n) + ((85 * COALESCE(c.s, 0)) // 100) AS r
              |       FROM documents CROSS JOIN tot t LEFT JOIN c$i c ON doc_id = c.dst)""".stripMargin
         }.mkString(",\n")}
         |SELECT d.doc_id, COALESCE(g.deg, 0) AS deg, r3.r AS rank_fp,
         |  CAST(r3.r AS DOUBLE) / 1000000.0 AS rank
         |FROM documents d LEFT JOIN dg g ON d.doc_id = g.src
         |     JOIN r3 ON d.doc_id = r3.doc_id""".stripMargin,
    "pq_codebook" ->
      // trained PQ codebook coordinates: exact fixed-point means over the
      // seed assignment (mirrors pqUpdateAgg; one IEEE division at the end)
      s"""$PqBodySql
         |SELECT cm AS subspace, cid AS code, pos, n AS n_members,
         |  CAST(qsum AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0) AS centroid
         |FROM agg0""".stripMargin,
    "pq_encode" ->
      // every vector's per-subspace code + quantization error against the
      // trained codebooks; dist is the same pinned-order double fold
      s"""$PqBodySql
         |SELECT vec_id, m AS subspace, code, dist FROM asn1""".stripMargin,
    "pq_ann" ->
      s"""$PqAnnBody
         |SELECT qid, vid, adist_fp, rn FROM rr WHERE rn <= 3""".stripMargin,
    "pq_recall" ->
      // recall@3 of the PQ/ADC arm vs exact full-vector squared-L2 top-3
      s"""$PqAnnBody,
         |en AS (SELECT vec_id, embedding, $dotSelfSql AS self FROM embeddings),
         |kq AS (SELECT vec_id AS qid, embedding AS qemb, self AS qself FROM en WHERE vec_id < 10),
         |kp AS (SELECT kq.qid, e.vec_id AS vid,
         |         (kq.qself + e.self) - 2.0 * ${dotSql("kq.qemb", "e.embedding")} AS d
         |       FROM en e, kq WHERE e.vec_id != kq.qid),
         |kr AS (SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY d ASC, vid) AS rn
         |       FROM kp),
         |exact3 AS (SELECT qid, vid FROM kr WHERE rn <= 3),
         |approx3 AS (SELECT qid, vid FROM rr WHERE rn <= 3),
         |hits AS (SELECT e.qid, count(*) AS n_hit FROM exact3 e
         |         JOIN approx3 x ON e.qid = x.qid AND e.vid = x.vid GROUP BY 1),
         |base AS (SELECT qid, count(*) AS k FROM exact3 GROUP BY 1)
         |SELECT b.qid, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit, b.k,
         |  CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / CAST(b.k AS DOUBLE) AS recall
         |FROM base b LEFT JOIN hits h ON b.qid = h.qid""".stripMargin,
    "ivfpq_ann" ->
      s"""$IvfPqBody
         |SELECT qid, vid, adist_fp, rn FROM prr WHERE rn <= 3""".stripMargin,
    // the served twin is bit-identical to ivfpq_ann by construction
    // (same centroids/codebooks via parquet round-trip, shared ADC and
    // search arithmetic) -- the oracle pins exactly that
    "ivfpq_ann_served" ->
      s"""$IvfPqBody
         |SELECT qid, vid, adist_fp, rn FROM prr WHERE rn <= 3""".stripMargin,
    "ivfpq_ann_filtered" ->
      // the composite chain with the facet filtered FIRST on the
      // candidate code rows (candExtra lands inside the ADC candidate
      // join's WHERE) — filter-first, ADC distances bit-identical to
      // the unfiltered serve on facet survivors
      s"""${ivfPqBodyWith("", "", "",
             candExtra = " AND e.vid IN (SELECT vec_id FROM embeddings" +
               s" WHERE label = ${SimilarityQueries.FacetLabel})")}
         |SELECT qid, vid, adist_fp, rn FROM prr WHERE rn <= 3""".stripMargin,
    // ADC shortlist (top-10 of the composite chain), then EXACT cosine
    // re-rank over only the shortlist's raw vectors -- the FAISS refine
    // recipe; `en` (full-vector norms) comes from the IvfAssignSql base
    "ivfpq_rerank" ->
      s"""$IvfPqBody,
         |short AS (SELECT qid, vid FROM prr WHERE rn <= ${SimilarityQueries.PqRerankShortlist}),
         |rq AS (SELECT vec_id AS rqid, embedding AS rqemb, nrm AS rqnrm FROM en WHERE vec_id < 10),
         |rsc AS (SELECT s.qid, s.vid,
         |          ${dotSql("q.rqemb", "d.embedding")} / (q.rqnrm * d.nrm) AS cos
         |        FROM short s JOIN en d ON s.vid = d.vec_id JOIN rq q ON s.qid = q.rqid),
         |rrk AS (SELECT qid, vid, cos,
         |          CAST(row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS BIGINT) AS rn
         |        FROM rsc)
         |SELECT qid, vid, cos, rn FROM rrk WHERE rn <= 3""".stripMargin,
    // the appended twin: centroids, PQ seeds, and codebook training all
    // restricted to the base slice; assignment/encoding cover everything
    // -- frozen-artifact append == one-pass encoding, which this chain IS
    "ivfpq_ann_appended" ->
      s"""${ivfPqBodyWith(" WHERE vec_id % 4 != 0", " WHERE vec_id % 4 != 0",
             " WHERE s.vec_id % 4 != 0")}
         |SELECT qid, vid, adist_fp, rn FROM prr WHERE rn <= 3""".stripMargin,
    // the shard-merged twin (central-training lifecycle): centroids, PQ
    // seeds, and codebook training all restricted to shard A's odd
    // slice; assignment/encoding cover everything -- artifact-identical
    // index-to-index merge == one-pass encoding, which this chain IS
    "ivfpq_ann_merged" ->
      s"""${ivfPqBodyWith(" WHERE vec_id % 2 = 1", " WHERE vec_id % 2 = 1",
             " WHERE s.vec_id % 2 = 1")}
         |SELECT qid, vid, adist_fp, rn FROM prr WHERE rn <= 3""".stripMargin,
    "ivfpq_recall" ->
      // recall@3 of the composite vs exact full-vector squared-L2 top-3
      // (x-prefixed exact CTEs — IvfAssignSql already owns `en`)
      s"""$IvfPqBody,
         |xen AS (SELECT vec_id, embedding, $dotSelfSql AS self FROM embeddings),
         |xq AS (SELECT vec_id AS qid, embedding AS qemb, self AS qself FROM xen WHERE vec_id < 10),
         |xp AS (SELECT xq.qid, e.vec_id AS vid,
         |         (xq.qself + e.self) - 2.0 * ${dotSql("xq.qemb", "e.embedding")} AS d
         |       FROM xen e, xq WHERE e.vec_id != xq.qid),
         |xr AS (SELECT qid, vid, row_number() OVER (PARTITION BY qid ORDER BY d ASC, vid) AS rn
         |       FROM xp),
         |exact3 AS (SELECT qid, vid FROM xr WHERE rn <= 3),
         |approx3 AS (SELECT qid, vid FROM prr WHERE rn <= 3),
         |hits AS (SELECT e.qid, count(*) AS n_hit FROM exact3 e
         |         JOIN approx3 x ON e.qid = x.qid AND e.vid = x.vid GROUP BY 1),
         |base AS (SELECT qid, count(*) AS k FROM exact3 GROUP BY 1)
         |SELECT b.qid, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit, b.k,
         |  CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / CAST(b.k AS DOUBLE) AS recall
         |FROM base b LEFT JOIN hits h ON b.qid = h.qid""".stripMargin,
    "minhash_lsh" ->
      s"""WITH $LshCandBody
         |SELECT doc_a, doc_b FROM cand""".stripMargin,
    "approx_stats" ->
      // the sketch values are engine-specific; the RESULT is the exact
      // distinct count (hash-gated) plus accuracy-contract booleans the
      // oracle pins to literal TRUE — an approximation outside its
      // documented bound hash-mismatches
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  TRUE AS hll_ok, TRUE AS p50_ok, TRUE AS p99_ok
        |FROM events GROUP BY 1""".stripMargin,
    "compress_ratio" ->
      // per-doc DEFLATE sizes come from the engine's fixture table
      // (OracleFixtures — the kernel is spec-gated); ratio, binning,
      // and the per-bin aggregate are recomputed here
      s"""WITH s AS (SELECT n_bytes, deflate_bytes,
         |    CAST(deflate_bytes AS DOUBLE) / CAST(n_bytes AS DOUBLE) AS ratio
         |  FROM ${graft.queries.OracleFixtures.sqlRef("compress_sizes")}),
         |b AS (SELECT LEAST(CAST(floor(ratio * 10.0) AS BIGINT), 15) AS bin, s.* FROM s)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(n_bytes) AS BIGINT) AS raw_bytes,
         |  CAST(sum(deflate_bytes) AS BIGINT) AS deflate_bytes,
         |  min(ratio) AS min_ratio, max(ratio) AS max_ratio
         |FROM b GROUP BY 1""".stripMargin,
    "ncd_neardup" ->
      // DEFLATE sizes from the engine fixture; the candidate pair set is
      // RE-DERIVED from scratch (the shared LSH pipeline) and inner-
      // joined to the fixture, so a pair-set disagreement surfaces as a
      // row-count mismatch; the NCD formula is recomputed exactly
      s"""WITH $LshCandBody,
         |f AS (SELECT * FROM ${graft.queries.OracleFixtures.sqlRef("ncd_sizes")})
         |SELECT f.doc_a, f.doc_b, f.ca, f.cb, f.cxy,
         |  CAST(f.cxy - LEAST(f.ca, f.cb) AS DOUBLE)
         |    / CAST(GREATEST(f.ca, f.cb) AS DOUBLE) AS ncd
         |FROM cand c JOIN f ON c.doc_a = f.doc_a AND c.doc_b = f.doc_b""".stripMargin,
    "video_phash" ->
      // decoded per-keyframe 8×9 luma grids from the engine fixture
      // (the Y4M container parse + exact block-mean downsample is the
      // spec-gated kernel); the 64 gradient comparisons folding a grid
      // into the two dHash halves are recomputed here bit-for-bit
      s"""SELECT doc_id, frame_idx,
         |  CASE WHEN ok THEN ${gradHalfSql("grid", 0)} ELSE CAST(0 AS BIGINT) END AS ph_lo,
         |  CASE WHEN ok THEN ${gradHalfSql("grid", 4)} ELSE CAST(0 AS BIGINT) END AS ph_hi,
         |  ok
         |FROM ${graft.queries.OracleFixtures.sqlRef("video_grids")}""".stripMargin,
    "audio_fingerprint" ->
      // decoded 65-segment PCM energies from the engine fixture (the
      // WAV container parse + amplitude fold is the spec-gated kernel);
      // the 64 louder-than-next comparisons folding them into the two
      // fingerprint halves are recomputed here bit-for-bit
      s"""SELECT doc_id,
         |  CASE WHEN ok THEN ${energyHalfSql("energy", 0)} ELSE CAST(0 AS BIGINT) END AS afp_lo,
         |  CASE WHEN ok THEN ${energyHalfSql("energy", 32)} ELSE CAST(0 AS BIGINT) END AS afp_hi,
         |  ok
         |FROM ${graft.queries.OracleFixtures.sqlRef("audio_energy")}""".stripMargin,
    "video_neardup" ->
      // decoded keyframe dHashes from the engine fixture (the Y4M
      // container parse is the spec-gated kernel); banding, the
      // aligned-keyframe filter, the Hamming re-check, and the clip
      // rollup are recomputed here
      s"""WITH p AS (SELECT doc_id, ph_lo, ph_hi
         |  FROM ${graft.queries.OracleFixtures.sqlRef("video_ph")}),
         |banded AS (SELECT doc_id, ph_lo, ph_hi, b.b AS b,
         |    CASE WHEN b.b < 2 THEN (ph_lo >> (16 * b.b)) & 65535
         |         ELSE (ph_hi >> (16 * (b.b - 2))) & 65535 END AS band_val
         |  FROM p, (SELECT unnest(range(0, 4)) AS b) b),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
         |    a.ph_lo AS la, a.ph_hi AS ha, c.ph_lo AS lb, c.ph_hi AS hb
         |  FROM banded a JOIN banded c
         |    ON a.b = c.b AND a.band_val = c.band_val AND a.doc_id < c.doc_id),
         |h AS (SELECT doc_a, doc_b,
         |    CAST(bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |  FROM cand
         |  WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 10
         |    AND doc_a % 10 = doc_b % 10)
         |SELECT doc_a // 10 AS clip_a, doc_b // 10 AS clip_b,
         |  CAST(count(*) AS BIGINT) AS n_matched_frames, max(hamming) AS max_hamming
         |FROM h GROUP BY 1, 2""".stripMargin,
    "incremental_neardup" ->
      // the persisted-index serving path must equal the full-corpus LSH
      // pair set restricted to pairs touching the delta slice (doc_id%4==0)
      // — signatures are deterministic per doc, so index-served == recomputed
      s"""WITH $LshCandBody
         |SELECT doc_a, doc_b FROM cand
         |WHERE doc_a % 4 = 0 OR doc_b % 4 = 0""".stripMargin,
    "incremental_neardup_filtered" ->
      // faceted near-dup serving (the fourth index family's facet row):
      // per-document signatures carry no corpus statistic, so the
      // facet-screened pair set (allowlist from the attrs sidecar applied
      // BEFORE the band equijoin) is exactly the unfaceted set with BOTH
      // endpoints in the facet — which is what this recomputes
      s"""WITH $LshCandBody,
         |fen AS (SELECT doc_id FROM documents WHERE lang = 'en')
         |SELECT doc_a, doc_b FROM cand
         |WHERE (doc_a % 4 = 0 OR doc_b % 4 = 0)
         |  AND doc_a IN (SELECT doc_id FROM fen)
         |  AND doc_b IN (SELECT doc_id FROM fen)""".stripMargin,
    "incremental_neardup_deleted" ->
      // retire contract: a tombstoned doc (id % 10 = 7) never surfaces on
      // EITHER side of a pair — the anti-join runs before pair generation,
      // so this is exactly the incremental set minus pairs touching a
      // retired endpoint
      s"""WITH $LshCandBody
         |SELECT doc_a, doc_b FROM cand
         |WHERE (doc_a % 4 = 0 OR doc_b % 4 = 0)
         |  AND doc_a % 10 != 7 AND doc_b % 10 != 7""".stripMargin,
    "incremental_neardup_source_retired" ->
      // facet-scoped takedown: a retired SOURCE's docs (tombstones
      // resolved from the attrs sidecar, not an id list) never surface
      // on either side of a pair
      s"""WITH $LshCandBody,
         |ret AS (SELECT doc_id FROM documents WHERE source = 'src12')
         |SELECT doc_a, doc_b FROM cand
         |WHERE (doc_a % 4 = 0 OR doc_b % 4 = 0)
         |  AND doc_a NOT IN (SELECT doc_id FROM ret)
         |  AND doc_b NOT IN (SELECT doc_id FROM ret)""".stripMargin,
    // tombstone-aware serving: centroids and surviving assignments are
    // FROZEN as built (delete never retrains); only rows whose vec_id is
    // retired (% 10 = 7) vanish from both query and candidate sides
    "ann_ivf_deleted" -> IvfRetiredServeSql,
    // facet-scoped takedown: a whole label class retired via the attrs
    // sidecar — the same retired-serve chain with the label's sidecar
    // membership as the takedown set (retired vectors neither query nor
    // surface as candidates)
    "ann_ivf_label_retired" -> ivfRetiredServeSqlWith(
      labelSurvivorSql("vec_id"), labelSurvivorSql("a.vec_id")),
    // source-scoped takedown on embeddings: the retired SOURCE's vectors
    // (membership via doc_id ≡ vec_id) neither query nor surface
    "ann_ivf_source_retired" -> ivfRetiredServeSqlWith(
      srcSurvivorSql("vec_id"), srcSurvivorSql("a.vec_id")),
    "ivfpq_ann_label_retired" ->
      s"""${ivfPqBodyWith("", "", "",
             qExtra = s" AND ${labelSurvivorSql("p.vec_id")}",
             candExtra = s" AND ${labelSurvivorSql("e.vid")}")}
         |SELECT qid, vid, adist_fp, rn FROM prr WHERE rn <= 3""".stripMargin,
    "ivfpq_ann_source_retired" ->
      s"""${ivfPqBodyWith("", "", "",
             qExtra = s" AND ${srcSurvivorSql("p.vec_id")}",
             candExtra = s" AND ${srcSurvivorSql("e.vid")}")}
         |SELECT qid, vid, adist_fp, rn FROM prr WHERE rn <= 3""".stripMargin,
    // the composite twin of the retire pair — one shared definition
    "ivfpq_ann_deleted" -> IvfPqRetiredServeSql,
    "ivfpq_ann_compacted" -> IvfPqRetiredServeSql,
    // compaction changes storage (touched buckets rewritten, tombstones
    // cleared), never results — the SAME definition as ann_ivf_deleted
    // binds both keys, so the invariance pin is structural, not a pair of
    // string literals that must stay manually identical
    "ann_ivf_compacted" -> IvfRetiredServeSql,
    "lsh_bucket_skew" ->
      // hottest (band, sig) posting lists — LshCandBody's banded `b` CTE
      // grouped and top-10'd with a (n_docs DESC, band, sig) total order
      s"""WITH $LshCandBody
         |SELECT band, sig, CAST(count(*) AS BIGINT) AS n_docs
         |FROM b GROUP BY band, sig
         |ORDER BY n_docs DESC, band ASC, sig ASC LIMIT 10""".stripMargin,
    "hash_embed" ->
      // signed token-count fold into 32 hash buckets — exact BIGINTs;
      // only docs with >= 1 token embed (matches the Spark groupBy);
      // emitted as the dense (doc_id, k, v) grid (scalar columns hash)
      s"""WITH $HashEmbedBody
         |SELECT doc_id, k, v FROM f""".stripMargin,
    "hash_embed_knn" ->
      s"""WITH $HashEmbedBody,
         |e AS (SELECT doc_id, list(v ORDER BY k) AS emb,
         |        CAST(sum(v * v) AS BIGINT) AS dd FROM f GROUP BY doc_id),
         |en AS (SELECT * FROM e WHERE dd > 0),
         |q AS (SELECT doc_id AS qid, emb AS qemb, dd AS qdd FROM en WHERE doc_id < 10),
         |p AS (SELECT q.qid, e2.doc_id AS vid,
         |        CAST(list_sum(list_transform(range(1, ${SimilarityQueries.HashEmbedDim + 1}),
         |          ii -> q.qemb[ii] * e2.emb[ii])) AS BIGINT) AS dot,
         |        e2.dd AS cdd, q.qdd AS qdd
         |      FROM en e2, q WHERE e2.doc_id != q.qid),
         |r AS (SELECT qid, vid, dot,
         |        CAST(dot AS DOUBLE) / (sqrt(CAST(qdd AS DOUBLE)) * sqrt(CAST(cdd AS DOUBLE))) AS cos
         |      FROM p),
         |rr AS (SELECT qid, vid, dot, cos,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM r)
         |SELECT qid, vid, dot, cos FROM rr WHERE rn <= 3""".stripMargin,
    "hash_embed_ann" -> HashEmbedAnnSql,
    // the served twin is bit-identical to hash_embed_ann by construction
    // (same persisted centroids, routing argmax, cosine fold, window) —
    // the shared definition makes the pin structural
    "hash_embed_ann_served" -> HashEmbedAnnSql,
    "hash_embed_ann_recall" ->
      // exact top-3 (hash_embed_knn's brute-force chain over the same
      // hen frame) vs the IVF top-3; per-query hit count and recall@3
      s"""WITH $HashEmbedIvfBody,
         |xp AS (SELECT kq.qid, e2.vec_id AS vid,
         |        ${dotSql("kq.qemb", "e2.embedding")} / (kq.qnrm * e2.nrm) AS cos
         |      FROM hen e2,
         |        (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm
         |         FROM hen WHERE vec_id < 10) kq
         |      WHERE e2.vec_id != kq.qid),
         |xr AS (SELECT qid, vid,
         |        row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid) AS rn FROM xp),
         |ex AS (SELECT qid, vid FROM xr WHERE rn <= 3),
         |ap AS (SELECT qid, vid FROM hr WHERE rn <= 3),
         |hits AS (SELECT a.qid, CAST(count(*) AS BIGINT) AS n_hit
         |         FROM ap a JOIN ex e ON a.qid = e.qid AND a.vid = e.vid GROUP BY a.qid),
         |kk AS (SELECT qid, CAST(count(*) AS BIGINT) AS k FROM ex GROUP BY qid)
         |SELECT kk.qid, CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit, kk.k,
         |  CAST(COALESCE(h.n_hit, 0) AS DOUBLE) / CAST(kk.k AS DOUBLE) AS recall
         |FROM kk LEFT JOIN hits h ON kk.qid = h.qid""".stripMargin,
    "token_zipf" ->
      // top-100 head with the Zipf cnt·rank diagnostic; (cnt desc, tok)
      // is a strict total order so both engines agree on the cut
      s"""WITH tz AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest($WordToksSql) AS tok FROM documents)
         |  GROUP BY tok ORDER BY cnt DESC, tok LIMIT 100)
         |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS rk,
         |  tok, cnt,
         |  CAST(cnt * row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT) AS cnt_x_rank
         |FROM tz""".stripMargin,
    "neardup_families" ->
      // three pair sets (LSH cand, sm-prefixed simhash chain, exact-fp
      // self-join), pairwise set sizes/overlap/Jaccard — the CTE names
      // are disjoint by the sm prefix
      s"""WITH $LshCandBody,
         |${simhash64Body("sm")},
         |smf AS (SELECT doc_a, doc_b FROM smcand
         |        WHERE bit_count(xor(la, lb)) + bit_count(xor(ha, hb)) <= 6),
         |xd AS (SELECT doc_id, md5($NormSql) AS fp FROM documents),
         |xp AS (SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b
         |       FROM xd a JOIN xd b2 ON a.fp = b2.fp AND a.doc_id < b2.doc_id),
         |st AS (
         |  SELECT 'minhash' AS fam_a, 'simhash' AS fam_b,
         |    (SELECT count(*) FROM cand) AS n_a, (SELECT count(*) FROM smf) AS n_b,
         |    (SELECT count(*) FROM cand c JOIN smf s2
         |       ON c.doc_a = s2.doc_a AND c.doc_b = s2.doc_b) AS n_common
         |  UNION ALL
         |  SELECT 'minhash', 'exact',
         |    (SELECT count(*) FROM cand), (SELECT count(*) FROM xp),
         |    (SELECT count(*) FROM cand c JOIN xp x
         |       ON c.doc_a = x.doc_a AND c.doc_b = x.doc_b)
         |  UNION ALL
         |  SELECT 'simhash', 'exact',
         |    (SELECT count(*) FROM smf), (SELECT count(*) FROM xp),
         |    (SELECT count(*) FROM smf s2 JOIN xp x
         |       ON s2.doc_a = x.doc_a AND s2.doc_b = x.doc_b))
         |SELECT fam_a, fam_b, CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         |  CAST(n_common AS BIGINT) AS n_common,
         |  CASE WHEN n_a + n_b - n_common > 0
         |       THEN CAST(n_common AS DOUBLE) / CAST(n_a + n_b - n_common AS DOUBLE)
         |       ELSE NULL END AS agreement
         |FROM st""".stripMargin,
    "link_predict" ->
      // non-edge pairs with >= 1 common neighbor over the semantic
      // (IVF-bucketed, cos >= 0.3) near-dup graph: wedge join over the
      // symmetrized edge list, known edges anti-joined away; integer
      // scores + one terminal Jaccard division. enp/adj/deg
      // MATERIALIZED — each is referenced 2-3 times and would
      // otherwise re-derive the whole IVF chain per reference
      s"""$IvfAssignSql,
         |pp AS (SELECT a.vec_id AS va, b.vec_id AS vb,
         |    ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
         |  FROM asn a JOIN asn b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |enp AS MATERIALIZED (SELECT va, vb FROM pp WHERE cos >= 0.3),
         |adj AS MATERIALIZED (SELECT va AS u, vb AS v FROM enp
         |  UNION ALL SELECT vb, va FROM enp),
         |deg AS MATERIALIZED (SELECT u, CAST(count(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
         |cn AS (SELECT x.u AS a, y.v AS b, CAST(count(*) AS BIGINT) AS cn
         |  FROM adj x JOIN adj y ON x.v = y.u AND x.u < y.v GROUP BY 1, 2),
         |ne AS (SELECT cn.a, cn.b, cn.cn FROM cn
         |  LEFT JOIN enp ON cn.a = enp.va AND cn.b = enp.vb
         |  WHERE enp.va IS NULL)
         |SELECT ne.a AS va, ne.b AS vb, ne.cn,
         |  da.deg AS deg_a, db.deg AS deg_b,
         |  CAST(ne.cn AS DOUBLE) / CAST(da.deg + db.deg - ne.cn AS DOUBLE) AS jaccard,
         |  CAST(da.deg * db.deg AS BIGINT) AS pref_attach
         |FROM ne JOIN deg da ON ne.a = da.u JOIN deg db ON ne.b = db.u""".stripMargin,
    "dup_degree_hist" ->
      // per-doc incident-edge counts over the shared cand CTE, rolled
      // into a degree histogram; degree-0 docs counted by difference
      s"""WITH $LshCandBody,
         |deg AS (SELECT d, CAST(count(*) AS BIGINT) AS degree FROM (
         |    SELECT doc_a AS d FROM cand UNION ALL SELECT doc_b FROM cand)
         |  GROUP BY d),
         |hist AS (SELECT degree, CAST(count(*) AS BIGINT) AS n_docs FROM deg GROUP BY 1),
         |z AS (SELECT CAST(0 AS BIGINT) AS degree,
         |    CAST((SELECT count(*) FROM documents) - (SELECT count(*) FROM deg) AS BIGINT) AS n_docs)
         |SELECT degree, n_docs FROM hist
         |UNION ALL SELECT degree, n_docs FROM z WHERE n_docs > 0""".stripMargin,
    "ngram_jaccard" ->
      s"""WITH $LshCandBody,
         |d AS (SELECT doc_id, list_distinct($ShingleSql) AS shs
         |  FROM (SELECT doc_id, $WordToksSql AS ws FROM documents)),
         |p AS (SELECT c.doc_a, c.doc_b,
         |    len(list_intersect(da.shs, db.shs)) AS inter, len(da.shs) AS na, len(db.shs) AS nb
         |  FROM cand c JOIN d da ON c.doc_a = da.doc_id JOIN d db ON c.doc_b = db.doc_id)
         |SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
         |  CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS jaccard
         |FROM p""".stripMargin,
    "ngram_containment" ->
      // Broder containment per direction + max over the same candidate
      // pair frame — integer sizes, three single divisions
      s"""WITH $LshCandBody,
         |d AS (SELECT doc_id, list_distinct($ShingleSql) AS shs
         |  FROM (SELECT doc_id, $WordToksSql AS ws FROM documents)),
         |p AS (SELECT c.doc_a, c.doc_b,
         |    len(list_intersect(da.shs, db.shs)) AS inter, len(da.shs) AS na, len(db.shs) AS nb
         |  FROM cand c JOIN d da ON c.doc_a = da.doc_id JOIN d db ON c.doc_b = db.doc_id)
         |SELECT doc_a, doc_b, CAST(inter AS BIGINT) AS inter,
         |  CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
         |  CAST(inter AS DOUBLE) / CAST(na AS DOUBLE) AS containment_a,
         |  CAST(inter AS DOUBLE) / CAST(nb AS DOUBLE) AS containment_b,
         |  CAST(inter AS DOUBLE) / CAST(least(na, nb) AS DOUBLE) AS max_containment
         |FROM p""".stripMargin,
    "minhash_estimate" ->
      s"""WITH $LshCandBody,
         |d AS (SELECT doc_id, list_distinct($ShingleSql) AS shs
         |  FROM (SELECT doc_id, $WordToksSql AS ws FROM documents)),
         |p AS (SELECT c.doc_a, c.doc_b,
         |    CAST(${SimilarityQueries.MinhashSeeds.indices.map(i => s"(CASE WHEN ma.mh$i = mb.mh$i THEN 1 ELSE 0 END)").mkString(" + ")} AS BIGINT) AS n_match,
         |    len(list_intersect(da.shs, db.shs)) AS inter, len(da.shs) AS na, len(db.shs) AS nb
         |  FROM cand c JOIN m ma ON c.doc_a = ma.doc_id JOIN m mb ON c.doc_b = mb.doc_id
         |       JOIN d da ON c.doc_a = da.doc_id JOIN d db ON c.doc_b = db.doc_id)
         |SELECT doc_a, doc_b, n_match,
         |  CAST(n_match AS DOUBLE) / ${SimilarityQueries.MinhashSeeds.size}.0 AS est_jaccard,
         |  CAST(inter AS DOUBLE) / CAST(na + nb - inter AS DOUBLE) AS exact_jaccard
         |FROM p""".stripMargin,
    "bm25_top" ->
      s"""WITH t AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM t),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
         |tk AS (SELECT doc_id, unnest(ws) AS tok FROM t),
         |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM tk
         |  WHERE tok IN ('join','vector','stream','window','spark') GROUP BY doc_id, tok),
         |dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
         |s AS (SELECT f.tok, f.doc_id, f.tf, d.df, l.dl,
         |    ((CAST(g.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
         |      * (CAST(f.tf AS DOUBLE) * 2.2)
         |      / (CAST(f.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE) / (CAST(g.sum_dl AS DOUBLE) / CAST(g.n_docs AS DOUBLE))))) AS score
         |  FROM tf f JOIN dfq d ON f.tok = d.tok JOIN dl l ON f.doc_id = l.doc_id CROSS JOIN g),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY tok ORDER BY score DESC, doc_id) AS BIGINT) AS rk FROM s)
         |SELECT tok, doc_id, tf, df, dl, score, rk FROM r WHERE rk <= 10""".stripMargin,
    // bm25_served answers from the PERSISTED inverted index; longs
    // survive parquet losslessly and the expression tree is shared, so
    // it hash-matches the compute-from-scratch oracle bit for bit
    "bm25_served" -> bm25PerTermSql(),
    "bm25_multiterm" -> bm25MultitermSql,
    // bm25_maxscore prunes with the lexicon's exact per-term bounds; the
    // UNPRUNED oracle gates that the pruning is lossless
    "bm25_maxscore" -> bm25MultitermSql,
    // the MaxScore entry point on a GROWN index: the _bounds_stale
    // marker forces the exact unpruned fallback, whose answer (df/stats
    // frozen at the base slice, tf over the grown corpus) this oracle
    // recomputes — lossy pruning against stale bounds could not match it
    "bm25_grown_maxscore" -> bm25MultitermSqlWith(
      gWhere = "WHERE doc_id % 4 <> 0", dfWhere = "WHERE doc_id % 4 <> 0"),
    // faceted retrieval: the facet scopes the CANDIDATE set only —
    // df/stats stay corpus-wide (the ranking model is unscoped), so the
    // oracle is the multiterm chain with just the tf-rows filter added
    "bm25_filtered" -> bm25MultitermSqlWith(
      tfWhere = "WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')"),
    // the source-facet twin (takedown/licensing scope): same chain, the
    // candidate filter keyed on the attrs tree's SECOND partition level
    "bm25_filtered_source" -> bm25MultitermSqlWith(
      tfWhere = "WHERE doc_id IN (SELECT doc_id FROM documents WHERE source = 'src3')"),
    // facet-scoped takedown: candidates restricted to the COMPLEMENT of
    // the retired source, df/stats frozen at the full-corpus build —
    // exactly the tombstone-aware serve over sidecar-resolved tombstones
    "bm25_source_retired" -> bm25MultitermSqlWith(
      tfWhere = "WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE source = 'src12')"),
    // the facet-tree pre-flight: sidecar counts must equal the corpus's
    // own (lang, source) histogram — a writer that dropped or duplicated
    // facet rows mismatches here
    "facet_profile" ->
      s"""SELECT coalesce(lang, 'und') AS lang, coalesce(source, 'unk') AS source,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM documents GROUP BY 1, 2""".stripMargin,
    // the vector twin: label histogram from the IVF sidecar == the
    // embeddings table's own (missing labels would land in -1)
    // two-axis since vec-v3: the SOURCE axis joins in from documents
    // via doc_id ≡ vec_id at build time — the oracle recomputes both
    "vec_facet_profile" -> VecFacetProfileSql,
    // the composite writer family maintains the SAME sidecar — one
    // definition binds both keys, so the invariance pin is structural
    "ivfpq_facet_profile" -> VecFacetProfileSql,
    // the LSH sidecar is doc-keyed (lang, source) like the lexical one;
    // build+append cover the full corpus
    "lsh_facet_profile" ->
      s"""SELECT coalesce(lang, 'und') AS lang, coalesce(source, 'unk') AS source,
         |  CAST(count(*) AS BIGINT) AS n_docs
         |FROM documents GROUP BY 1, 2""".stripMargin,
    // max-passage retrieval from the persisted chunk-level index: the
    // oracle re-derives the chunk pseudo-corpus and the argmax rollup
    "bm25_maxp" -> bm25MaxpSql,
    // exact-phrase matching from the positional postings: the oracle
    // re-derives 1-based positions (generate_subscripts) and the same
    // start-position adjacency fold
    "phrase_search" ->
      s"""WITH t AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |tk AS (SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS pos FROM t),
         |pa AS (SELECT doc_id, list(pos ORDER BY pos) AS ps FROM tk WHERE tok = 'vector' GROUP BY doc_id),
         |pb AS (SELECT doc_id, list(pos ORDER BY pos) AS ps FROM tk WHERE tok = 'stream' GROUP BY doc_id),
         |m AS (SELECT pa.doc_id,
         |        CAST(len(list_filter(pa.ps, p -> list_contains(pb.ps, p + 1))) AS BIGINT) AS n_occ
         |      FROM pa JOIN pb ON pa.doc_id = pb.doc_id)
         |SELECT doc_id, n_occ FROM m WHERE n_occ > 0""".stripMargin,
    // proximity ranking: min |pos_a - pos_b| over occurrence pairs —
    // all-integer, re-derived from the same position lists
    "prox_search" ->
      s"""WITH t AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |tk AS (SELECT doc_id, unnest(ws) AS tok, generate_subscripts(ws, 1) AS pos FROM t),
         |pa AS (SELECT doc_id, list(pos ORDER BY pos) AS ps FROM tk WHERE tok = 'join' GROUP BY doc_id),
         |pb AS (SELECT doc_id, list(pos ORDER BY pos) AS ps FROM tk WHERE tok = 'window' GROUP BY doc_id),
         |m AS (SELECT pa.doc_id,
         |        CAST(len(pa.ps) AS BIGINT) AS n_a, CAST(len(pb.ps) AS BIGINT) AS n_b,
         |        CAST(list_min(flatten(list_transform(pa.ps, x -> list_transform(pb.ps, y -> abs(x - y))))) AS BIGINT) AS min_span
         |      FROM pa JOIN pb ON pa.doc_id = pb.doc_id),
         |r AS (SELECT *, CAST(row_number() OVER (ORDER BY min_span, doc_id) AS BIGINT) AS rk FROM m)
         |SELECT doc_id, n_a, n_b, min_span, rk FROM r WHERE rk <= 20""".stripMargin,
    // appended index: corpus stats + df FROZEN at the base-slice build
    // (doc_id % 4 != 0), posting rows from the grown corpus — the
    // idf-staleness contract, pinned exactly
    "bm25_appended" -> bm25PerTermSql(
      gWhere = "WHERE doc_id % 4 <> 0", dfWhere = "WHERE doc_id % 4 <> 0"),
    // merged index: the universal slot hash makes shard merge ≡ append
    // (dst lexicon frozen at the base slice), so merge shares the
    // appended oracle exactly
    "bm25_merged" -> bm25PerTermSql(
      gWhere = "WHERE doc_id % 4 <> 0", dfWhere = "WHERE doc_id % 4 <> 0"),
    // refreshed index: grow-then-refresh ≡ build-from-scratch — df/stats
    // recomputed from the postings alone, so the oracle is the PLAIN
    // full-corpus chain; g counts docs with ≥1 token (an empty doc
    // leaves no posting row for the corpus-free recount to see)
    "bm25_refreshed" -> bm25PerTermSql(gWhere = "WHERE dl > 0"),
    // deleted index: tombstone serve-around — posting rows exclude the
    // fixed takedown ids, stats/df stay frozen at the full-corpus build
    "bm25_deleted" -> bm25PerTermSql(
      tfWhere = s"WHERE doc_id NOT IN (${LexQueries.DeletedIds.mkString(",")})"),
    // the stored lexicon: df a count, ub a max over the shared score
    // expression — both selections over exact inputs, no new arithmetic
    "lex_lexicon" ->
      s"""WITH ${bm25ScoredBody()}
         |SELECT tok, df, max(score) AS ub FROM s GROUP BY tok, df""".stripMargin,
    // hybrid_served: RRF where BOTH arms serve from persisted indexes —
    // the lexical arm is bit-identical to the scratch chain (shared
    // longs + expression tree), the semantic arm is the IVF-SERVED
    // top-50 (probed-bucket candidates), re-derived via the shared
    // routing CTEs. l-prefixed lex CTEs avoid colliding with
    // IvfAssignSql's names.
    "hybrid_served" ->
      s"""$IvfAssignSql,
         |q AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm, bucket FROM probes WHERE vec_id = 0),
         |p AS (SELECT q.qid, a.vec_id AS vid,
         |        ${dotSql("q.qemb", "a.embedding")} / (q.qnrm * a.nrm) AS cos
         |      FROM q JOIN asn a ON q.bucket = a.bucket AND a.vec_id != q.qid),
         |csr AS (SELECT vid, CAST(row_number() OVER (ORDER BY cos DESC, vid) AS BIGINT) AS cos_rk FROM p),
         |sem AS (SELECT vid, cos_rk FROM csr WHERE cos_rk <= 50),
         |lt AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |ldl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM lt),
         |lg AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM ldl),
         |ltk AS (SELECT doc_id, unnest(ws) AS tok FROM lt),
         |ltf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tf FROM ltk
         |  WHERE tok = 'vector' GROUP BY doc_id),
         |ldfq AS (SELECT CAST(count(*) AS BIGINT) AS df FROM ltf),
         |ls AS (SELECT f.doc_id,
         |    ((CAST(lg.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
         |      * (CAST(f.tf AS DOUBLE) * 2.2)
         |      / (CAST(f.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE) / (CAST(lg.sum_dl AS DOUBLE) / CAST(lg.n_docs AS DOUBLE))))) AS score
         |  FROM ltf f CROSS JOIN ldfq d JOIN ldl l ON f.doc_id = l.doc_id CROSS JOIN lg),
         |lexr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS bm_rk FROM ls),
         |lex AS (SELECT doc_id, bm_rk FROM lexr WHERE bm_rk <= 50),
         |fused AS (SELECT coalesce(l.doc_id, m.vid) AS doc_id, l.bm_rk, m.cos_rk,
         |    coalesce(1.0 / (60.0 + CAST(l.bm_rk AS DOUBLE)), 0.0)
         |    + coalesce(1.0 / (60.0 + CAST(m.cos_rk AS DOUBLE)), 0.0) AS rrf
         |  FROM lex l FULL OUTER JOIN sem m ON l.doc_id = m.vid),
         |fr AS (SELECT *, CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rk FROM fused)
         |SELECT doc_id, bm_rk, cos_rk, rrf, rk FROM fr WHERE rk <= 20""".stripMargin,
    "hybrid_filtered" ->
      // hybrid_served's chain with the facet filtered FIRST in BOTH
      // arms: each arm's rank window runs over facet survivors only
      // (filter-first ranks-within-facet), while the SCORES stay the
      // unfaceted per-pair/frozen-stat values — exactly the engine's
      // semi-join-before-rank plan
      s"""$IvfAssignSql,
         |fct AS (SELECT doc_id FROM documents WHERE lang = 'en'),
         |q AS (SELECT vec_id AS qid, embedding AS qemb, nrm AS qnrm, bucket FROM probes WHERE vec_id = 0),
         |p AS (SELECT q.qid, a.vec_id AS vid,
         |        ${dotSql("q.qemb", "a.embedding")} / (q.qnrm * a.nrm) AS cos
         |      FROM q JOIN asn a ON q.bucket = a.bucket AND a.vec_id != q.qid),
         |csr AS (SELECT vid, CAST(row_number() OVER (ORDER BY cos DESC, vid) AS BIGINT) AS cos_rk
         |        FROM p WHERE vid IN (SELECT doc_id FROM fct)),
         |sem AS (SELECT vid, cos_rk FROM csr WHERE cos_rk <= 50),
         |lt AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |ldl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM lt),
         |lg AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM ldl),
         |ltk AS (SELECT doc_id, unnest(ws) AS tok FROM lt),
         |ltf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tf FROM ltk
         |  WHERE tok = 'vector' GROUP BY doc_id),
         |ldfq AS (SELECT CAST(count(*) AS BIGINT) AS df FROM ltf),
         |ls AS (SELECT f.doc_id,
         |    ((CAST(lg.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
         |      * (CAST(f.tf AS DOUBLE) * 2.2)
         |      / (CAST(f.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE) / (CAST(lg.sum_dl AS DOUBLE) / CAST(lg.n_docs AS DOUBLE))))) AS score
         |  FROM ltf f CROSS JOIN ldfq d JOIN ldl l ON f.doc_id = l.doc_id CROSS JOIN lg),
         |lexr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS bm_rk
         |         FROM ls WHERE doc_id IN (SELECT doc_id FROM fct)),
         |lex AS (SELECT doc_id, bm_rk FROM lexr WHERE bm_rk <= 50),
         |fused AS (SELECT coalesce(l.doc_id, m.vid) AS doc_id, l.bm_rk, m.cos_rk,
         |    coalesce(1.0 / (60.0 + CAST(l.bm_rk AS DOUBLE)), 0.0)
         |    + coalesce(1.0 / (60.0 + CAST(m.cos_rk AS DOUBLE)), 0.0) AS rrf
         |  FROM lex l FULL OUTER JOIN sem m ON l.doc_id = m.vid),
         |fr AS (SELECT *, CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rk FROM fused)
         |SELECT doc_id, bm_rk, cos_rk, rrf, rk FROM fr WHERE rk <= 20""".stripMargin,
    "rank_fusion" ->
      // lexical arm = bm25_top's chain for the single term 'vector'
      // (per-term scores are independent of the term set); semantic arm
      // = cosine to query vector 0; RRF k=60, each fused score ONE
      // fixed-order addition of two deterministic divisions
      s"""WITH t AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM t),
         |g AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dl),
         |tk AS (SELECT doc_id, unnest(ws) AS tok FROM t),
         |tf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS tf FROM tk
         |  WHERE tok = 'vector' GROUP BY doc_id),
         |dfq AS (SELECT CAST(count(*) AS BIGINT) AS df FROM tf),
         |s AS (SELECT f.doc_id,
         |    ((CAST(g.n_docs AS DOUBLE) - CAST(d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
         |      * (CAST(f.tf AS DOUBLE) * 2.2)
         |      / (CAST(f.tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(l.dl AS DOUBLE) / (CAST(g.sum_dl AS DOUBLE) / CAST(g.n_docs AS DOUBLE))))) AS score
         |  FROM tf f CROSS JOIN dfq d JOIN dl l ON f.doc_id = l.doc_id CROSS JOIN g),
         |lexr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS bm_rk FROM s),
         |lex AS (SELECT doc_id, bm_rk FROM lexr WHERE bm_rk <= 50),
         |en AS (SELECT vec_id, embedding, sqrt($dotSelfSql) AS nrm FROM embeddings),
         |q AS (SELECT embedding AS qemb, nrm AS qnrm FROM en WHERE vec_id = 0),
         |cs AS (SELECT e.vec_id, ${dotSql("q.qemb", "e.embedding")} / (q.qnrm * e.nrm) AS cos
         |       FROM en e CROSS JOIN q WHERE e.vec_id <> 0),
         |csr AS (SELECT vec_id, CAST(row_number() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS cos_rk FROM cs),
         |sem AS (SELECT vec_id, cos_rk FROM csr WHERE cos_rk <= 50),
         |fused AS (SELECT coalesce(l.doc_id, m.vec_id) AS doc_id, l.bm_rk, m.cos_rk,
         |    coalesce(1.0 / (60.0 + CAST(l.bm_rk AS DOUBLE)), 0.0)
         |    + coalesce(1.0 / (60.0 + CAST(m.cos_rk AS DOUBLE)), 0.0) AS rrf
         |  FROM lex l FULL OUTER JOIN sem m ON l.doc_id = m.vec_id),
         |fr AS (SELECT *, CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rk FROM fused)
         |SELECT doc_id, bm_rk, cos_rk, rrf, rk FROM fr WHERE rk <= 20""".stripMargin,
    "lm_score" ->
      // bigram MLE scoring: per-bigram conditional probability
      // c(u w)/c(u) quantized to floor(p·10⁹) BIGINTs (exact,
      // order-independent sum), one IEEE division at the end
      s"""WITH w AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |t AS (SELECT doc_id, unnest(ws) AS tok FROM w),
         |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS cu FROM t GROUP BY tok),
         |bx AS (SELECT doc_id,
         |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
         |  FROM w),
         |bu AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS u FROM bx),
         |bi AS (SELECT bg, CAST(count(*) AS BIGINT) AS cb FROM bu GROUP BY bg),
         |sc AS (SELECT b.doc_id,
         |    CAST(floor((CAST(i.cb AS DOUBLE) / CAST(n.cu AS DOUBLE)) * 1000000000.0) AS BIGINT) AS p_fp
         |  FROM bu b JOIN bi i ON b.bg = i.bg JOIN uni n ON b.u = n.tok)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |  CAST(sum(p_fp) AS BIGINT) AS lp_fp,
         |  CAST(sum(p_fp) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000000.0) AS avg_p
         |FROM sc GROUP BY doc_id""".stripMargin,
    "score_agreement" ->
      // Spearman over distinct row_number ranks: exact BIGINT sum of
      // squared rank deltas, the rho expression in the same IEEE order
      s"""WITH $QualityBody,
         |w2 AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |t2 AS (SELECT doc_id, unnest(ws) AS tok FROM w2),
         |uni2 AS (SELECT tok, CAST(count(*) AS BIGINT) AS cu FROM t2 GROUP BY tok),
         |bx2 AS (SELECT doc_id,
         |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
         |  FROM w2),
         |bu2 AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS u FROM bx2),
         |bi2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS cb FROM bu2 GROUP BY bg),
         |sc2 AS (SELECT b.doc_id,
         |    CAST(floor((CAST(i.cb AS DOUBLE) / CAST(n.cu AS DOUBLE)) * 1000000000.0) AS BIGINT) AS p_fp
         |  FROM bu2 b JOIN bi2 i ON b.bg = i.bg JOIN uni2 n ON b.u = n.tok),
         |lm AS (SELECT doc_id,
         |    CAST(sum(p_fp) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000000.0) AS avg_p
         |  FROM sc2 GROUP BY doc_id),
         |j AS (SELECT qq.doc_id, qq.quality, lm.avg_p
         |  FROM qq JOIN lm ON qq.doc_id = lm.doc_id),
         |r AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY quality, doc_id) AS BIGINT) AS ra,
         |    CAST(row_number() OVER (ORDER BY avg_p, doc_id) AS BIGINT) AS rb
         |  FROM j)
         |SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2,
         |  CASE WHEN count(*) >= 2 THEN
         |    1.0 - 6.0 * CAST(sum((ra - rb) * (ra - rb)) AS DOUBLE) /
         |      (CAST(count(*) AS DOUBLE) * (CAST(count(*) AS DOUBLE) * CAST(count(*) AS DOUBLE) - 1.0))
         |  ELSE NULL END AS spearman
         |FROM r""".stripMargin,
    // documents.text is pure ASCII (verified: length == octet_length for
    // every row), so first-8-BYTES == first-8-CHARS; DuckDB has no blob
    // substring, Spark side slices the real binary payload.
    "multimodal_meta" ->
      s"""WITH x AS (SELECT doc_id, text, lower(hex(encode(text))) AS ph FROM documents),
         |h AS (SELECT doc_id, text, ph, ${hash32Sql("ph")} AS h FROM x)
         |SELECT doc_id,
         |  octet_length(encode(text)) AS n_bytes,
         |  lower(hex(encode(substr(text, 1, 8)))) AS header_hex,
         |  (h % 1920) + 1 AS width,
         |  ((h >> 8) % 1080) + 1 AS height,
         |  CAST(${hash32Sql("'0:' || ph")} AS DOUBLE) / 4294967296.0 AS f0,
         |  CAST(${hash32Sql("'7:' || ph")} AS DOUBLE) / 4294967296.0 AS f7
         |FROM h""".stripMargin,
    "dims_exploded" ->
      """SELECT event_id, 'awsaccountid' AS key, CAST(user_id AS VARCHAR) AS value FROM events
        |UNION ALL
        |SELECT event_id, 'callerservice' AS key, 'svc' || CAST(user_id % 3 AS VARCHAR) AS value FROM events
        |UNION ALL
        |SELECT event_id, 'operation' AS key, lower(event_type) AS value FROM events""".stripMargin,
    "hourly_rollup" ->
      """SELECT make_timestamp((epoch_ms(ts) // 3600000) * 3600000 * 1000) AS hour_start,
        |  'svc' || CAST(user_id % 3 AS VARCHAR) AS callerservice,
        |  count(*) AS cnt, min(value) AS min_latency, max(value) AS max_latency,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_latency
        |FROM events GROUP BY 1, 2""".stripMargin,
    "chunk_text" ->
      s"""WITH t AS (SELECT doc_id, $WordToksSql AS toks FROM documents),
         |n AS (SELECT doc_id, toks, len(toks) AS n FROM t),
         |c AS (SELECT doc_id, toks,
         |        unnest(range(0, CAST(greatest(ceil((n - 50) / 40.0), 0) AS INT) + 1)) AS chunk_id
         |      FROM n),
         |s AS (SELECT doc_id, chunk_id,
         |        toks[(chunk_id * 40 + 1):(chunk_id * 40 + 50)] AS ck FROM c)
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |  CAST(len(ck) AS BIGINT) AS n_tokens,
         |  array_to_string(ck, ' ') AS chunk_text
         |FROM s WHERE len(ck) > 0""".stripMargin,
    "shard_assign" ->
      s"""WITH d AS (SELECT doc_id,
         |    ${hash32Sql("text")} % 8 AS shard,
         |    len($WordToksSql) AS n_tok
         |  FROM documents)
         |SELECT shard, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM d GROUP BY shard""".stripMargin,
    "contamination" ->
      s"""WITH w AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |shx AS (SELECT doc_id, unnest($ShingleSql) AS sh FROM w),
         |test AS (SELECT DISTINCT sh FROM shx WHERE doc_id < 50)
         |SELECT DISTINCT s.doc_id FROM shx s JOIN test t ON s.sh = t.sh
         |WHERE s.doc_id >= 50""".stripMargin,
    // contamination_served answers the SAME question from the
    // positional index (3-gram presence ≡ position adjacency), so it
    // shares the batch op's oracle verbatim
    "contamination_served" ->
      s"""WITH w AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |shx AS (SELECT doc_id, unnest($ShingleSql) AS sh FROM w),
         |test AS (SELECT DISTINCT sh FROM shx WHERE doc_id < 50)
         |SELECT DISTINCT s.doc_id FROM shx s JOIN test t ON s.sh = t.sh
         |WHERE s.doc_id >= 50""".stripMargin,
    "top_terms" ->
      s"""WITH t AS (SELECT lang, unnest($WordToksSql) AS tok FROM documents),
         |c AS (SELECT lang, tok, count(*) AS cnt FROM t GROUP BY lang, tok),
         |r AS (SELECT lang, tok, cnt,
         |        CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS BIGINT) AS rk
         |      FROM c)
         |SELECT lang, tok, cnt, rk FROM r WHERE rk <= 10""".stripMargin,
    // salted two-stage aggregation must equal the direct GROUP BY —
    // the oracle IS the direct form
    "salted_agg" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,
    "filter_pushdown" ->
      """SELECT l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00' AND l_returnflag = 'R'
        |GROUP BY l_linestatus""".stripMargin,
    // Cramer determinants generated by the same det3Sql the engine uses
    // (HUGEINT here, DECIMAL(38,0) there — both exact integer arithmetic)
    "linear_probe" ->
      s"""WITH $ProbeCoefBody,
         |s AS (SELECT co.n, co.sy, co.sx1y, co.sx2y, co.b0, co.b1, co.b2,
         |    CAST(sum(CASE WHEN co.b0 IS NULL THEN NULL
         |             WHEN (CASE WHEN co.b0 + co.b1 * CAST(q.x1 AS DOUBLE)
         |                             + co.b2 * CAST(q.x2 AS DOUBLE) >= 0.5
         |                   THEN 1 ELSE 0 END) = q.y
         |             THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
         |  FROM q, co GROUP BY 1, 2, 3, 4, 5, 6, 7)
         |SELECT n, b0, b1, b2,
         |  1.0 - (CAST(sy AS DOUBLE)
         |          - (b0 * CAST(sy AS DOUBLE) + b1 * CAST(sx1y AS DOUBLE)
         |             + b2 * CAST(sx2y AS DOUBLE)))
         |        / (CAST(sy AS DOUBLE)
         |           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
         |    AS r2,
         |  CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy,
         |  CAST(greatest(sy, n - sy) AS DOUBLE) / CAST(n AS DOUBLE) AS base_acc
         |FROM s""".stripMargin,
    "model_auc" ->
      // AUC = U/(n1·n0) via the 2U histogram closed form over the
      // micro-quantized probe scores (ProbeScoreBody mirrors the
      // engine's scoring pass exactly)
      s"""WITH $ProbeCoefBody,
         |$ProbeScoreSql,
         |h AS (SELECT qs,
         |    CAST(sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         |    CAST(sum(CASE WHEN y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS f0
         |  FROM sc GROUP BY 1),
         |cw AS (SELECT f1, f0,
         |    CAST(coalesce(sum(f0) OVER (ORDER BY qs
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum0
         |  FROM h),
         |a AS (SELECT CAST(sum(f1) AS BIGINT) AS n_pos,
         |    CAST(sum(f0) AS BIGINT) AS n_neg,
         |    CAST(sum(f1 * (2 * cum0 + f0)) AS BIGINT) AS u2
         |  FROM cw)
         |SELECT n_pos, n_neg,
         |  CAST(u2 AS DOUBLE) / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc,
         |  2.0 * (CAST(u2 AS DOUBLE) / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))) - 1.0 AS gini
         |FROM a""".stripMargin,
    "dup_modularity" ->
      // per-label Newman contribution over the IVF-bounded near-dup
      // edges: q_c's numerator 4m·W_c − D_c² in HUGEINT (engine:
      // DECIMAL(38,0)), one division; labels with no edges emit 0
      s"""$IvfAssignSql,
         |pp AS (SELECT a.vec_id AS va, b.vec_id AS vb,
         |    ${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm) AS cos
         |  FROM asn a JOIN asn b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |enp AS MATERIALIZED (SELECT va, vb FROM pp WHERE cos >= 0.3),
         |e2 AS MATERIALIZED (SELECT la.label AS la, lb.label AS lb
         |  FROM enp JOIN embeddings la ON enp.va = la.vec_id
         |           JOIN embeddings lb ON enp.vb = lb.vec_id),
         |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e2),
         |dc AS (SELECT label, CAST(count(*) AS BIGINT) AS degree_sum FROM (
         |    SELECT la AS label FROM e2 UNION ALL SELECT lb FROM e2) GROUP BY 1),
         |wc AS (SELECT la AS label, CAST(count(*) AS BIGINT) AS internal_edges
         |  FROM e2 WHERE la = lb GROUP BY 1),
         |nn AS (SELECT label, CAST(count(*) AS BIGINT) AS n_nodes
         |  FROM embeddings GROUP BY 1)
         |SELECT nn.label, nn.n_nodes,
         |  COALESCE(dc.degree_sum, 0) AS degree_sum,
         |  COALESCE(wc.internal_edges, 0) AS internal_edges,
         |  CAST(CAST(4 AS HUGEINT) * CAST(mm.m AS HUGEINT)
         |         * CAST(COALESCE(wc.internal_edges, 0) AS HUGEINT)
         |       - CAST(COALESCE(dc.degree_sum, 0) AS HUGEINT)
         |         * CAST(COALESCE(dc.degree_sum, 0) AS HUGEINT) AS DOUBLE)
         |    / (4.0 * CAST(mm.m AS DOUBLE) * CAST(mm.m AS DOUBLE)) AS q_contrib
         |FROM nn LEFT JOIN dc ON nn.label = dc.label
         |  LEFT JOIN wc ON nn.label = wc.label, mm""".stripMargin,
    "cluster_split" ->
      // both split methods over the shared connected-components CTE;
      // clm MATERIALIZED (cl feeds both method arms); md5 split and
      // census arithmetic all integer
      s"""WITH RECURSIVE $ClusterBody,
         |clm AS MATERIALIZED (SELECT doc_id, cluster FROM cl),
         |t AS MATERIALIZED (
         |  SELECT doc_id, cluster, 'by_doc' AS method,
         |    CASE WHEN ${hash32Sql("CAST(doc_id AS VARCHAR)")} % 100 < 80
         |      THEN 'train' ELSE 'eval' END AS split
         |  FROM clm
         |  UNION ALL
         |  SELECT doc_id, cluster, 'by_cluster' AS method,
         |    CASE WHEN ${hash32Sql("CAST(cluster AS VARCHAR)")} % 100 < 80
         |      THEN 'train' ELSE 'eval' END AS split
         |  FROM clm),
         |lk AS (SELECT method,
         |    CAST(sum(CASE WHEN nsp > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_leaky_clusters
         |  FROM (SELECT method, cluster, count(DISTINCT split) AS nsp
         |        FROM t GROUP BY 1, 2) GROUP BY 1)
         |SELECT t.method, t.split, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT t.cluster) AS BIGINT) AS n_clusters,
         |  lk.n_leaky_clusters
         |FROM t JOIN lk ON t.method = lk.method
         |GROUP BY 1, 2, lk.n_leaky_clusters""".stripMargin,
    "heaps_law" ->
      // cumulative distinct via first-occurrence docs: one vocab-sized
      // (tok -> min doc) fold answers all ten prefix checkpoints; no
      // log-log fit (libm ln ULP rule) — the exact curve is the output
      s"""WITH toks AS (SELECT doc_id, unnest($WordToksSql) AS tok FROM documents),
         |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks FROM toks GROUP BY 1),
         |fd AS (SELECT tok, min(doc_id) AS first_doc FROM toks GROUP BY 1),
         |mx AS (SELECT max(doc_id) AS max_id FROM documents),
         |cuts AS (SELECT CAST(d AS BIGINT) AS decile,
         |    (mx.max_id * d) // 10 AS cutoff_id
         |  FROM mx, (SELECT unnest(range(1, 11)) AS d)),
         |dt AS (SELECT c.decile, c.cutoff_id,
         |    CAST(count(*) AS BIGINT) AS docs_cum,
         |    CAST(sum(pd.n_toks) AS BIGINT) AS tokens_cum
         |  FROM pd JOIN cuts c ON pd.doc_id <= c.cutoff_id GROUP BY 1, 2),
         |v AS (SELECT c.decile, CAST(count(*) AS BIGINT) AS vocab_cum
         |  FROM fd JOIN cuts c ON fd.first_doc <= c.cutoff_id GROUP BY 1)
         |SELECT dt.decile, dt.cutoff_id, dt.docs_cum, dt.tokens_cum, v.vocab_cum,
         |  CAST(v.vocab_cum AS DOUBLE) / CAST(dt.tokens_cum AS DOUBLE) AS type_token_ratio
         |FROM dt JOIN v ON dt.decile = v.decile""".stripMargin,
    "ivf_balance" ->
      // per-bucket occupancy of the shared IVF assignment, folded to a
      // one-row balance report; two pinned-order terminal divisions
      s"""$IvfAssignSql,
         |occ AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM asn GROUP BY 1),
         |a AS (SELECT CAST(count(*) AS BIGINT) AS n_buckets,
         |    CAST(sum(n) AS BIGINT) AS n_vecs,
         |    min(n) AS min_bucket, max(n) AS max_bucket FROM occ)
         |SELECT n_buckets, n_vecs, min_bucket, max_bucket,
         |  CAST(n_vecs AS DOUBLE) / CAST(n_buckets AS DOUBLE) AS mean_bucket,
         |  CAST(max_bucket AS DOUBLE)
         |    / (CAST(n_vecs AS DOUBLE) / CAST(n_buckets AS DOUBLE)) AS imbalance
         |FROM a""".stripMargin,
    "embedding_isotropy" ->
      // anisotropy = Σs_d²/(n·S₂): per-dim sums + total squared norm in
      // BIGINT, Σs_d² in HUGEINT (engine: DECIMAL(38,0)), terminal
      // divisions pinned to the engine's order
      """WITH q AS (SELECT vec_id,
        |    CAST(generate_subscripts(embedding, 1) AS BIGINT) AS pos,
        |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS qv
        |  FROM embeddings),
        |d AS (SELECT pos, CAST(sum(qv) AS BIGINT) AS sd,
        |    CAST(count(*) AS BIGINT) AS cnt FROM q GROUP BY 1),
        |a AS (SELECT CAST(count(*) AS BIGINT) AS n_dims,
        |    CAST(max(CASE WHEN pos = 1 THEN cnt END) AS BIGINT) AS n,
        |    CAST(sum(CAST(sd AS HUGEINT) * CAST(sd AS HUGEINT)) AS HUGEINT) AS ssd2
        |  FROM d),
        |s AS (SELECT CAST(sum(qv * qv) AS BIGINT) AS s2 FROM q)
        |SELECT a.n, a.n_dims,
        |  CAST(s.s2 AS DOUBLE) / CAST(a.n AS DOUBLE) / 1000000.0 AS mean_sq_norm,
        |  CAST(a.ssd2 AS DOUBLE) / (CAST(a.n AS DOUBLE) * CAST(a.n AS DOUBLE)) / 1000000.0 AS mu_sq_norm,
        |  CAST(a.ssd2 AS DOUBLE) / (CAST(a.n AS DOUBLE) * CAST(s.s2 AS DOUBLE)) AS anisotropy
        |FROM a, s""".stripMargin,
    "schema_integrity" -> {
      // PK checks: rows − distinct keys; FK checks: NOT EXISTS orphan
      // counts (≡ Spark's left_anti — column names are globally unique
      // across the star schema, so the correlation needs no aliases)
      def pkSql(name: String, table: String, keys: String) =
        s"""SELECT '$name' AS check_name,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $table) AS n_rows,
           |  CAST((SELECT count(*) FROM $table)
           |    - (SELECT count(*) FROM (SELECT DISTINCT $keys FROM $table)) AS BIGINT) AS n_bad""".stripMargin
      def fkSql(name: String, child: String, key: String, parent: String, pkey: String) =
        s"""SELECT '$name' AS check_name,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child) AS n_rows,
           |  (SELECT CAST(count(*) AS BIGINT) FROM $child
           |   WHERE NOT EXISTS (SELECT 1 FROM $parent WHERE $pkey = $key)) AS n_bad""".stripMargin
      val checks = Seq(
        pkSql("pk_lineitem", "lineitem", "l_orderkey, l_linenumber"),
        pkSql("pk_orders", "orders", "o_orderkey"),
        pkSql("pk_customer", "customer", "c_custkey"),
        pkSql("pk_part", "part", "p_partkey"),
        pkSql("pk_supplier", "supplier", "s_suppkey"),
        pkSql("pk_nation", "nation", "n_nationkey"),
        pkSql("pk_region", "region", "r_regionkey"),
        pkSql("pk_events", "events", "event_id"),
        pkSql("pk_documents", "documents", "doc_id"),
        pkSql("pk_embeddings", "embeddings", "vec_id"),
        fkSql("fk_lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        fkSql("fk_lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
        fkSql("fk_lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        fkSql("fk_orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
        fkSql("fk_customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        fkSql("fk_supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        fkSql("fk_nation_region", "nation", "n_regionkey", "region", "r_regionkey"),
        fkSql("fk_embeddings_documents", "embeddings", "vec_id", "documents", "doc_id"))
      s"""SELECT check_name, n_rows, n_bad,
         |  CAST(n_bad AS DOUBLE) / CAST(n_rows AS DOUBLE) AS bad_rate
         |FROM (${checks.mkString("\n UNION ALL \n")})""".stripMargin
    },
    "markov_eval" ->
      // per-user lag pairs split at the midpoint of successor times;
      // argmax ties to the larger successor (identical comparator);
      // integer counts, one division per row
      """WITH p AS (SELECT prev_type, event_type AS next_type, t FROM (
        |    SELECT event_type, epoch_us(ts) AS t,
        |      lag(event_type) OVER (PARTITION BY user_id
        |        ORDER BY ts ASC, event_id ASC) AS prev_type
        |    FROM events) WHERE prev_type IS NOT NULL),
        |m AS (SELECT (min(t) + max(t)) // 2 AS mid_t FROM p),
        |tr AS (SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
        |  FROM p, m WHERE t < mid_t GROUP BY 1, 2),
        |mod AS (SELECT prev_type, next_type AS predicted_next, n AS n_top, n_train
        |  FROM (SELECT *,
        |      row_number() OVER (PARTITION BY prev_type ORDER BY n DESC, next_type DESC) AS rk,
        |      CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS n_train
        |    FROM tr) WHERE rk = 1),
        |te AS (SELECT p.prev_type, p.next_type FROM p, m WHERE p.t >= m.mid_t)
        |SELECT te.prev_type, mod.predicted_next, mod.n_train,
        |  CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(sum(CASE WHEN te.next_type = mod.predicted_next THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        |  CAST(sum(CASE WHEN te.next_type = mod.predicted_next THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS accuracy,
        |  CAST(mod.n_top AS DOUBLE) / CAST(mod.n_train AS DOUBLE) AS train_majority
        |FROM te JOIN mod ON te.prev_type = mod.prev_type
        |GROUP BY 1, 2, 3, mod.n_top""".stripMargin,
    "l_diversity" ->
      """WITH g AS (SELECT source, n_chars // 100 AS len_bucket,
        |    CAST(count(DISTINCT lang) AS BIGINT) AS l,
        |    CAST(count(*) AS BIGINT) AS gsize
        |  FROM documents GROUP BY 1, 2)
        |SELECT l, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(gsize) AS BIGINT) AS n_docs, l < 2 AS at_risk
        |FROM g GROUP BY l""".stripMargin,
    "t_closeness" ->
      // HUGEINT cross-products (the engine uses DECIMAL(38,0)) keep the
      // TVD numerator exact; the decile is ten exact comparisons, never
      // a rounded division. cell is referenced 4x -> MATERIALIZED.
      """WITH cell AS MATERIALIZED (
        |  SELECT source, n_chars // 100 AS len_bucket, lang,
        |    CAST(count(*) AS HUGEINT) AS c
        |  FROM documents GROUP BY 1, 2, 3),
        |g AS (SELECT source, len_bucket, sum(c) AS gsize
        |  FROM cell GROUP BY 1, 2),
        |gl AS (SELECT lang, sum(c) AS cv FROM cell GROUP BY 1),
        |tot AS (SELECT sum(c) AS n FROM cell),
        |grp AS (
        |  SELECT cell.source, cell.len_bucket,
        |    sum(greatest(cell.c * tot.n - gl.cv * g.gsize,
        |                 CAST(0 AS HUGEINT))) AS s,
        |    any_value(g.gsize) AS gsize, any_value(tot.n) AS n
        |  FROM cell
        |  JOIN gl USING (lang)
        |  JOIN g ON cell.source = g.source AND cell.len_bucket = g.len_bucket
        |  CROSS JOIN tot
        |  GROUP BY 1, 2),
        |dc AS (
        |  SELECT gsize, CAST(
        |    (10*s >= 1*gsize*n)::int + (10*s >= 2*gsize*n)::int +
        |    (10*s >= 3*gsize*n)::int + (10*s >= 4*gsize*n)::int +
        |    (10*s >= 5*gsize*n)::int + (10*s >= 6*gsize*n)::int +
        |    (10*s >= 7*gsize*n)::int + (10*s >= 8*gsize*n)::int +
        |    (10*s >= 9*gsize*n)::int + (10*s >= 10*gsize*n)::int
        |    AS BIGINT) AS t_decile
        |  FROM grp)
        |SELECT t_decile, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(gsize) AS BIGINT) AS n_docs, t_decile >= 5 AS at_risk
        |FROM dc GROUP BY 1""".stripMargin,
    "decile_lift" ->
      // quantile_cont == Spark percentile (quantile_bins_scalable
      // precedent); strict > cutpoint binning mirrored; division order
      // pinned: lift = (conv/users) / (t_conv/t_users)
      """WITH u AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(max(CASE WHEN event_type = 'purchase' AND value >= 200.0 THEN 1 ELSE 0 END) AS BIGINT) AS conv
        |  FROM events GROUP BY 1),
        |cuts AS (SELECT quantile_cont(n_events,
        |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS c FROM u),
        |b AS (SELECT CAST(1 + len(list_filter(cuts.c, x -> n_events > x)) AS BIGINT)
        |    AS decile, conv FROM u, cuts),
        |d AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
        |    CAST(sum(conv) AS BIGINT) AS n_conv FROM b GROUP BY 1),
        |t AS (SELECT CAST(sum(n_users) AS BIGINT) AS t_users,
        |    CAST(sum(n_conv) AS BIGINT) AS t_conv FROM d),
        |r AS (SELECT d.*, t.t_users, t.t_conv,
        |    CAST(sum(n_users) OVER (ORDER BY decile DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users,
        |    CAST(sum(n_conv) OVER (ORDER BY decile DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_conv
        |  FROM d, t)
        |SELECT decile, n_users, n_conv,
        |  CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS rate,
        |  (CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE)) /
        |    (CAST(t_conv AS DOUBLE) / CAST(t_users AS DOUBLE)) AS lift,
        |  cum_users, cum_conv,
        |  (CAST(cum_conv AS DOUBLE) / CAST(cum_users AS DOUBLE)) /
        |    (CAST(t_conv AS DOUBLE) / CAST(t_users AS DOUBLE)) AS cum_lift
        |FROM r""".stripMargin,
    "rfm_segments" ->
      // quantile_cont matches Spark percentile bit-for-bit (the
      // quantile_bins_scalable precedent); decimal value totals exact
      // until the terminal cast; lambda var `c` avoids hash32Sql's `i`
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t,
        |    CAST(value AS DECIMAL(18,2)) AS vdec FROM events),
        |u AS (SELECT user_id, max(t) AS last_t,
        |    CAST(count(*) AS BIGINT) AS frequency, sum(vdec) AS mdec
        |  FROM e GROUP BY 1),
        |mx AS (SELECT max(last_t) AS t_max FROM u),
        |u2 AS MATERIALIZED (SELECT u.*, mx.t_max - u.last_t AS recency,
        |    CAST(u.mdec AS DOUBLE) AS monetary FROM u, mx),
        |cuts AS (SELECT quantile_cont(recency, [0.25,0.5,0.75]) AS rc,
        |    quantile_cont(frequency, [0.25,0.5,0.75]) AS fc,
        |    quantile_cont(monetary, [0.25,0.5,0.75]) AS mc FROM u2),
        |b AS (SELECT u2.*,
        |    CAST(1 + len(list_filter(cuts.rc, c -> recency > c)) AS BIGINT) AS r_bin,
        |    CAST(1 + len(list_filter(cuts.fc, c -> frequency > c)) AS BIGINT) AS f_bin,
        |    CAST(1 + len(list_filter(cuts.mc, c -> monetary > c)) AS BIGINT) AS m_bin
        |  FROM u2, cuts)
        |SELECT r_bin, f_bin, m_bin, CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(mdec) AS DOUBLE) AS total_value,
        |  CAST(sum(frequency) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avg_frequency
        |FROM b GROUP BY 1, 2, 3""".stripMargin,
    "cohort_value" ->
      // exact DECIMAL value sums through the cumulative window; one
      // double conversion + division per row
      """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week,
        |    CAST(value AS DECIMAL(18,2)) AS vdec FROM events),
        |fw AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY 1),
        |sz AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
        |  FROM fw GROUP BY 1),
        |c AS (SELECT fw.cohort_week, e.week - fw.cohort_week AS age_week,
        |    CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active,
        |    sum(e.vdec) AS wdec
        |  FROM e JOIN fw ON e.user_id = fw.user_id GROUP BY 1, 2),
        |r AS (SELECT *, sum(wdec) OVER (PARTITION BY cohort_week
        |    ORDER BY age_week ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cdec
        |  FROM c)
        |SELECT r.cohort_week, r.age_week, r.n_active, sz.cohort_size,
        |  CAST(r.wdec AS DOUBLE) AS week_value,
        |  CAST(r.cdec AS DOUBLE) AS cum_value,
        |  CAST(r.cdec AS DOUBLE) / CAST(sz.cohort_size AS DOUBLE) AS ltv_per_user
        |FROM r JOIN sz ON r.cohort_week = sz.cohort_week""".stripMargin,
    "attribution_linear" ->
      // user-keyed touch-purchase pairing in the trailing hour; credit
      // shares micro-quantized by integer division so sums are exact
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t, event_id
        |  FROM events),
        |p AS (SELECT user_id, t AS tp, event_id AS pid FROM e
        |  WHERE event_type = 'purchase'),
        |tc AS (SELECT user_id, event_type AS touch_type, t FROM e
        |  WHERE event_type IN ('view', 'click', 'signup')),
        |pr AS MATERIALIZED (SELECT tc.touch_type, p.pid
        |  FROM tc JOIN p ON tc.user_id = p.user_id
        |  WHERE tc.t < p.tp AND tc.t >= p.tp - 3600000000),
        |k AS (SELECT pid, CAST(count(*) AS BIGINT) AS k FROM pr GROUP BY 1)
        |SELECT pr.touch_type,
        |  CAST(count(*) AS BIGINT) AS n_touches,
        |  CAST(count(DISTINCT pr.pid) AS BIGINT) AS n_purchases,
        |  CAST(CAST(sum(1000000 // k.k) AS BIGINT) AS DOUBLE) / 1000000.0 AS credit
        |FROM pr JOIN k ON pr.pid = k.pid GROUP BY 1""".stripMargin,
    "bootstrap_ci" -> {
      // one-pass Poisson bootstrap: 2B conditional integer sums, the
      // SAME hash-derived multiplicities (CDF literals string-parsed),
      // replica means sorted in-row, integer index picks
      val b = AnalyticsQueries.BootB
      def multSql(bb: Int): String = {
        val u = s"CAST(${hash32Sql(s"CAST(event_id AS VARCHAR) || ':$bb'")} % 1000000 AS DOUBLE) / 1000000.0"
        AnalyticsQueries.PoissonCdf.zipWithIndex.reverse
          .foldLeft("CAST(5 AS BIGINT)") { case (acc, (c, k)) =>
            s"CASE WHEN $u < CAST('$c' AS DOUBLE) THEN CAST($k AS BIGINT) ELSE $acc END"
          }
      }
      val multCols = (0 until b).map(bb => s"(${multSql(bb)}) AS m$bb").mkString(",\n    ")
      val aggCols = (0 until b).map(bb =>
        s"CAST(sum(m$bb) AS BIGINT) AS n$bb,\n" +
          s"    CAST(sum(m$bb * qv) AS BIGINT) AS s$bb").mkString(",\n    ")
      val meanList = (0 until b).map(bb =>
        s"CAST(s$bb AS DOUBLE) / CAST(n$bb AS DOUBLE) / 100.0").mkString("[", ", ", "]")
      s"""WITH ev AS (SELECT event_type, event_id,
         |    CAST(floor(value * 100) AS BIGINT) AS qv,
         |    CAST(value AS DECIMAL(18,2)) AS vdec FROM events),
         |wm AS (SELECT event_type, qv, vdec,
         |    $multCols
         |  FROM ev),
         |a AS (SELECT event_type,
         |    $aggCols,
         |    CAST(count(*) AS BIGINT) AS n_exact, sum(vdec) AS edec
         |  FROM wm GROUP BY 1),
         |r AS (SELECT event_type, n_exact,
         |    CAST(edec AS DOUBLE) / CAST(n_exact AS DOUBLE) AS mean_exact,
         |    list_sort($meanList) AS rm
         |  FROM a)
         |SELECT event_type, n_exact, mean_exact,
         |  rm[2] AS ci_lo, rm[${b - 1}] AS ci_hi,
         |  mean_exact >= rm[2] AND mean_exact <= rm[${b - 1}] AS within_ci
         |FROM r""".stripMargin
    },
    "sample_mean_ci" ->
      // same deterministic md5-nibble sample; variance cross product in
      // HUGEINT (engine: DECIMAL(38,0)); CI arithmetic order-pinned
      """WITH ev AS (SELECT event_type, value,
        |    CAST(floor(value * 100) AS BIGINT) AS qv,
        |    substr(md5(CAST(event_id AS VARCHAR)), 1, 1) = '0' AS in_sample
        |  FROM events),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample,
        |    sum(CAST(value AS DECIMAL(18,2))) AS sdec,
        |    CAST(sum(qv) AS BIGINT) AS sq1,
        |    CAST(sum(qv * qv) AS BIGINT) AS sq2
        |  FROM ev WHERE in_sample GROUP BY 1),
        |e AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_exact,
        |    sum(CAST(value AS DECIMAL(18,2))) AS edec
        |  FROM ev GROUP BY 1),
        |j AS (SELECT s.event_type, s.n_sample, e.n_exact,
        |    CAST(s.sdec AS DOUBLE) / CAST(s.n_sample AS DOUBLE) AS mean_sample,
        |    CAST(e.edec AS DOUBLE) / CAST(e.n_exact AS DOUBLE) AS mean_exact,
        |    CAST(CAST(s.n_sample AS HUGEINT) * CAST(s.sq2 AS HUGEINT)
        |         - CAST(s.sq1 AS HUGEINT) * CAST(s.sq1 AS HUGEINT) AS DOUBLE)
        |      / (CAST(s.n_sample AS DOUBLE) * (CAST(s.n_sample AS DOUBLE) - 1.0))
        |      / 10000.0 AS var_sample
        |  FROM s JOIN e ON s.event_type = e.event_type
        |  WHERE s.n_sample >= 2)
        |SELECT *,
        |  1.96 * sqrt(var_sample / CAST(n_sample AS DOUBLE)) AS ci_half,
        |  abs(mean_sample - mean_exact)
        |    <= 1.96 * sqrt(var_sample / CAST(n_sample AS DOUBLE)) AS within_ci
        |FROM j""".stripMargin,
    "conversion_lag" ->
      // first-view → first-subsequent-purchase lag per user, bucketed
      // on integer microsecond band edges; share under a one-row total
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
        |v AS (SELECT user_id, min(tus) AS t0 FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |l AS (SELECT e.user_id, min(e.tus - v.t0) AS lag_us
        |  FROM e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND e.tus > v.t0 GROUP BY 1),
        |b AS (SELECT CASE WHEN lag_us < 60000000 THEN 0
        |    WHEN lag_us < 600000000 THEN 1
        |    WHEN lag_us < 3600000000 THEN 2
        |    WHEN lag_us < 21600000000 THEN 3
        |    WHEN lag_us < 86400000000 THEN 4
        |    WHEN lag_us < 604800000000 THEN 5
        |    ELSE 6 END AS bucket FROM l),
        |c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_users FROM b GROUP BY 1),
        |t AS (SELECT CAST(sum(n_users) AS BIGINT) AS n_total FROM c)
        |SELECT CAST(c.bucket AS BIGINT) AS bucket,
        |  (['lt_1m', 'lt_10m', 'lt_1h', 'lt_6h', 'lt_1d', 'lt_7d', 'ge_7d'])[c.bucket + 1] AS band,
        |  c.n_users, t.n_total,
        |  CAST(c.n_users AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS share
        |FROM c, t""".stripMargin,
    "calibration_bins" ->
      // equal-width bins in INTEGER arithmetic on the quantized scores
      // — bin membership cannot straddle an engine float difference
      s"""WITH $ProbeCoefBody,
         |$ProbeScoreSql,
         |mm AS (SELECT min(qs) AS lo, max(qs) AS hi FROM sc)
         |SELECT ((sc.qs - mm.lo) * 10) // (mm.hi - mm.lo + 1) AS bin,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(sc.y) AS BIGINT) AS n_pos,
         |  CAST(sum(sc.qs) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000000.0 AS mean_pred,
         |  CAST(sum(sc.y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS frac_pos
         |FROM sc, mm GROUP BY 1""".stripMargin,
    "rolling_actives" ->
      """WITH uh AS MATERIALIZED (SELECT DISTINCT event_type, user_id,
         |    epoch_ms(ts) // 3600000 AS hb FROM events),
         |hrs AS (SELECT DISTINCT hb AS wh FROM uh),
         |w AS (SELECT u.event_type, u.user_id, u.hb + g.k AS wh
         |      FROM uh u, (SELECT unnest(range(0, 24)) AS k) g),
         |r AS (SELECT event_type, wh,
         |        CAST(count(DISTINCT user_id) AS BIGINT) AS actives_24h
         |      FROM w WHERE wh IN (SELECT wh FROM hrs) GROUP BY 1, 2),
         |h AS (SELECT event_type, hb AS wh,
         |        CAST(count(DISTINCT user_id) AS BIGINT) AS actives_1h
         |      FROM uh GROUP BY 1, 2)
         |SELECT r.event_type,
         |  make_timestamp(r.wh * 3600000 * 1000) AS window_hour,
         |  r.actives_24h,
         |  COALESCE(h.actives_1h, 0) AS actives_1h,
         |  CAST(COALESCE(h.actives_1h, 0) AS DOUBLE) / CAST(r.actives_24h AS DOUBLE)
         |    AS stickiness
         |FROM r LEFT JOIN h ON r.event_type = h.event_type AND r.wh = h.wh""".stripMargin,
    // the Morton interleave is the same 16-term bit expression the engine
    // builds in Layout.zValue16 — generated here so the two can't drift;
    // keys scale into [0, 65535] FIRST (zValue16 interleaves bits 0–15
    // only — raw keys would alias once they outgrow 16 bits)
    "zorder_prune" -> {
      val morton = (0 until 16).map(i =>
        s"(((a16 >> $i) & 1) << ${2 * i}) | (((b16 >> $i) & 1) << ${2 * i + 1})")
        .mkString(" | ")
      s"""WITH b AS MATERIALIZED (
         |  SELECT CAST(l_partkey AS BIGINT) AS pk, CAST(l_suppkey AS BIGINT) AS sk,
         |         CAST(l_orderkey AS BIGINT) AS ok
         |  FROM lineitem),
         |bounds AS MATERIALIZED (SELECT max(ok) AS okmax,
         |                  max(pk) AS pmax, max(sk) AS smax FROM b),
         |zt AS MATERIALIZED (SELECT pk, sk, ok, okmax, ($morton) AS z FROM
         |  (SELECT pk, sk, ok, okmax,
         |     (pk * 65536)//(pmax + 1) AS a16, (sk * 65536)//(smax + 1) AS b16
         |   FROM b, bounds)),
         |pred AS (SELECT (pmax+1)//4 AS plo, (pmax+1)//4 + (pmax+1)//16 - 1 AS phi,
         |                (smax+1)//4 AS slo, (smax+1)//4 + (smax+1)//16 - 1 AS shi
         |         FROM bounds),
         |e AS (
         |  SELECT 'zorder' AS layout, zt.z//16777216 AS file_id, zt.pk, zt.sk,
         |    CASE WHEN zt.pk >= p.plo AND zt.pk <= p.phi
         |          AND zt.sk >= p.slo AND zt.sk <= p.shi THEN 1 ELSE 0 END AS hit,
         |    p.plo, p.phi, p.slo, p.shi
         |  FROM zt, pred p
         |  UNION ALL
         |  SELECT 'linear', (zt.ok*256)//(zt.okmax+1), zt.pk, zt.sk,
         |    CASE WHEN zt.pk >= p.plo AND zt.pk <= p.phi
         |          AND zt.sk >= p.slo AND zt.sk <= p.shi THEN 1 ELSE 0 END,
         |    p.plo, p.phi, p.slo, p.shi
         |  FROM zt, pred p),
         |f AS (
         |  SELECT layout, file_id,
         |    min(pk) AS min_pk, max(pk) AS max_pk,
         |    min(sk) AS min_sk, max(sk) AS max_sk,
         |    CAST(count(*) AS BIGINT) AS cnt, CAST(sum(hit) AS BIGINT) AS hits,
         |    min(plo) AS plo, min(phi) AS phi, min(slo) AS slo, min(shi) AS shi
         |  FROM e GROUP BY 1, 2),
         |s AS (
         |  SELECT layout,
         |    CAST(count(*) AS BIGINT) AS n_files,
         |    CAST(sum(CASE WHEN min_pk <= phi AND max_pk >= plo
         |                   AND min_sk <= shi AND max_sk >= slo
         |             THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
         |    CAST(sum(cnt) AS BIGINT) AS rows_total,
         |    CAST(sum(CASE WHEN min_pk <= phi AND max_pk >= plo
         |                   AND min_sk <= shi AND max_sk >= slo
         |             THEN cnt ELSE 0 END) AS BIGINT) AS rows_scanned,
         |    CAST(sum(hits) AS BIGINT) AS rows_matched
         |  FROM f GROUP BY 1)
         |SELECT layout, n_files, files_scanned, rows_total, rows_scanned, rows_matched,
         |  CAST(rows_scanned AS DOUBLE)/CAST(rows_total AS DOUBLE) AS scan_frac
         |FROM s""".stripMargin
    },
    "date_agg" ->
      """SELECT date_trunc('month', o_orderdate) AS month, o_orderpriority,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
        |  count(DISTINCT o_custkey) AS n_custs
        |FROM orders GROUP BY 1, 2""".stripMargin,
    "window_rank" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
        |  CAST(rank() OVER w AS BIGINT) AS rk,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""".stripMargin,
    "rollup_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,
    "cube_agg" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_ls
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin,
    "key_skew" ->
      // per-key counts then HHI: BIGINT sums, shares divided in double
      // space with n**2 as double*double, same order as the engine
      """WITH kc AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |ag AS (SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(max(c) AS BIGINT) AS max_key_count,
        |    CAST(sum(c * c) AS BIGINT) AS ssq
        |  FROM kc GROUP BY 1)
        |SELECT event_type, n_events, n_keys, max_key_count,
        |  CAST(max_key_count AS DOUBLE) / CAST(n_events AS DOUBLE) AS top_share,
        |  CAST(ssq AS DOUBLE) / (CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE)) AS hhi
        |FROM ag""".stripMargin,
    "semi_anti" ->
      """SELECT 'with_orders' AS tag, count(*) AS cnt FROM customer
        |  WHERE c_custkey IN (SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'without_orders' AS tag, count(*) AS cnt FROM customer
        |  WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""".stripMargin,
    "setops" ->
      """SELECT 'intersect' AS tag, count(*) AS cnt FROM
        |  (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'except' AS tag, count(*) AS cnt FROM
        |  (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'union' AS tag, count(*) AS cnt FROM
        |  (SELECT DISTINCT k FROM (SELECT c_custkey AS k FROM customer UNION ALL SELECT o_custkey FROM orders))""".stripMargin,
    "join_5way" ->
      """SELECT r_name, n_name, count(*) AS cnt,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "sliding_agg" ->
      """WITH e AS (SELECT event_type, value, epoch_ms(ts) AS ms FROM events),
        |x AS (SELECT event_type, value,
        |        make_timestamp(((ms - (ms % 5000)) - k.k * 5000) * 1000) AS window_start
        |      FROM e, (SELECT unnest([0, 1]) AS k) k)
        |SELECT window_start, event_type, count(*) AS cnt,
        |  min(value) AS min_value, max(value) AS max_value,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM x GROUP BY window_start, event_type""".stripMargin,
    "grouping_sets" ->
      """SELECT event_type, user_id % 10 AS bucket, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  CAST(grouping(event_type) AS BIGINT) AS g_type
        |FROM events
        |GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())""".stripMargin,
    "typed_agg" ->
      """SELECT event_type, count(*) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type""".stripMargin,
    "asof_join" ->
      """SELECT event_id, user_id, ts, event_type, signup_ts FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_ts
        |  FROM events)
        |WHERE event_type != 'signup'""".stripMargin,
    "null_profile" ->
      """SELECT
        |  count(*) - count(l_orderkey) AS l_orderkey_nulls,
        |  count(DISTINCT l_orderkey) AS l_orderkey_distinct,
        |  count(*) - count(l_partkey) AS l_partkey_nulls,
        |  count(DISTINCT l_partkey) AS l_partkey_distinct,
        |  count(*) - count(l_quantity) AS l_quantity_nulls,
        |  count(DISTINCT l_quantity) AS l_quantity_distinct,
        |  count(*) - count(l_returnflag) AS l_returnflag_nulls,
        |  count(DISTINCT l_returnflag) AS l_returnflag_distinct,
        |  count(*) - count(l_shipdate) AS l_shipdate_nulls,
        |  count(DISTINCT l_shipdate) AS l_shipdate_distinct
        |FROM lineitem""".stripMargin,
    "value_histogram" ->
      """SELECT CAST(floor(value / 50.0) AS BIGINT) AS bucket, count(*) AS cnt,
        |  min(value) AS min_value, max(value) AS max_value
        |FROM events GROUP BY 1""".stripMargin,
    "stats_agg" ->
      """WITH e AS (SELECT event_type,
        |    CAST(value AS DECIMAL(18,2)) AS x,
        |    CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS DECIMAL(18,2)) AS y
        |  FROM events),
        |s AS (SELECT event_type, count(*) AS n,
        |    sum(x) AS sx, sum(x*x) AS sx2, sum(y) AS sy, sum(y*y) AS sy2, sum(x*y) AS sxy
        |  FROM e GROUP BY event_type)
        |SELECT event_type, n,
        |  CAST(sx AS DOUBLE) / n AS mean_value,
        |  sqrt((CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) / (n - 1)) AS stddev_value,
        |  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / n) /
        |    (sqrt(CAST(sx2 AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n) *
        |     sqrt(CAST(sy2 AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / n)) AS corr_value_k
        |FROM s""".stripMargin,
    "exact_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,
    "pivot_agg" ->
      """SELECT user_id % 10 AS bucket,
        |  count(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  count(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  count(CASE WHEN event_type = 'view' THEN 1 END) AS "view"
        |FROM events GROUP BY user_id % 10""".stripMargin,
    "dedup_clusters" ->
      // connected components over the LSH candidate pairs: transitive
      // closure via recursive CTE, then min anchor per doc — mirrors the
      // Spark side's iterative min-label propagation exactly
      s"""WITH RECURSIVE $ClusterBody
         |SELECT doc_id, cluster FROM cl""".stripMargin,
    "dedup_stats" ->
      // cluster-size histogram over the same connected components
      s"""WITH RECURSIVE $ClusterBody,
         |cs AS (SELECT cluster, count(*) AS sz FROM cl GROUP BY cluster)
         |SELECT sz AS cluster_size, count(*) AS n_clusters,
         |  CAST(sum(sz) AS BIGINT) AS n_docs,
         |  CAST(sum(sz - 1) AS BIGINT) AS n_droppable
         |FROM cs GROUP BY sz""".stripMargin,
    "dedup_keep_best" ->
      // keeper per cluster: longest text, doc_id tie-break; n_docs is the
      // component size the keep decision covered
      s"""WITH RECURSIVE $ClusterBody,
         |j AS (SELECT c.cluster, c.doc_id, d.n_chars
         |      FROM cl c JOIN documents d ON c.doc_id = d.doc_id),
         |r AS (SELECT *,
         |    CAST(row_number() OVER (PARTITION BY cluster ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rn,
         |    CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS n_docs
         |  FROM j)
         |SELECT cluster, doc_id AS keeper, n_docs, n_chars AS keeper_chars
         |FROM r WHERE rn = 1""".stripMargin,
    "boilerplate_ngrams" ->
      // a 3-gram is boilerplate when it appears in >= 5 distinct docs;
      // per-doc share of its DISTINCT shingle set that is boilerplate
      s"""WITH w AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |shd AS (SELECT DISTINCT doc_id, sh FROM
         |  (SELECT doc_id, unnest($ShingleSql) AS sh FROM w)),
         |dfq AS (SELECT sh, count(*) AS dfc FROM shd GROUP BY sh),
         |j AS (SELECT s.doc_id, CASE WHEN d.dfc >= 5 THEN 1 ELSE 0 END AS is_b
         |      FROM shd s JOIN dfq d ON s.sh = d.sh)
         |SELECT doc_id, count(*) AS n_shingles,
         |  CAST(sum(is_b) AS BIGINT) AS n_boiler,
         |  CAST(sum(is_b) AS DOUBLE) / count(*) AS boiler_ratio
         |FROM j GROUP BY doc_id""".stripMargin,
    "funnel_steps" ->
      // strict temporal funnel; times compared in integer microseconds
      s"""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
         |v AS (SELECT user_id, min(tus) AS t_view FROM e
         |      WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, min(e.tus) AS t_click FROM e
         |      JOIN v ON e.user_id = v.user_id
         |      WHERE e.event_type = 'click' AND e.tus > v.t_view GROUP BY e.user_id),
         |p AS (SELECT e.user_id, min(e.tus) AS t_purchase FROM e
         |      JOIN c ON e.user_id = c.user_id
         |      WHERE e.event_type = 'purchase' AND e.tus > c.t_click GROUP BY e.user_id)
         |SELECT CAST(1 AS BIGINT) AS step, 'view' AS stage, count(*) AS n_users FROM v
         |UNION ALL SELECT 2, 'click_after_view', count(*) FROM c
         |UNION ALL SELECT 3, 'purchase_after_click', count(*) FROM p""".stripMargin,
    "snapshot_diff" ->
      s"""WITH d AS (SELECT doc_id, md5($NormSql) AS fp FROM documents),
         |v1 AS (SELECT doc_id AS id_a, fp AS fp_a FROM d WHERE doc_id % 5 <> 0),
         |v2 AS (SELECT doc_id AS id_b,
         |    CASE WHEN doc_id % 3 = 0 THEN md5(fp || 'x') ELSE fp END AS fp_b
         |  FROM d WHERE doc_id % 7 <> 0)
         |SELECT coalesce(id_a, id_b) AS doc_id,
         |  CASE WHEN id_a IS NULL THEN 'added'
         |       WHEN id_b IS NULL THEN 'removed'
         |       WHEN fp_a <> fp_b THEN 'changed'
         |       ELSE 'same' END AS status
         |FROM v1 FULL OUTER JOIN v2 ON id_a = id_b""".stripMargin,
    "above_avg_docs" ->
      s"""SELECT doc_id, n_chars,
         |  n_chars - (SELECT CAST(sum(n_chars) AS DOUBLE) / count(*) FROM documents) AS above_by
         |FROM documents
         |WHERE n_chars > (SELECT CAST(sum(n_chars) AS DOUBLE) / count(*) FROM documents)""".stripMargin,
    "event_transitions" ->
      s"""WITH t AS (SELECT user_id, event_type, lag(event_type) OVER
         |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type FROM events)
         |SELECT prev_type, event_type AS next_type, count(*) AS n
         |FROM t WHERE prev_type IS NOT NULL GROUP BY 1, 2""".stripMargin,
    "group_percentiles" ->
      // quantile_cont shares Spark percentile's rank = p*(n-1) linear
      // interpolation - verified bit-identical on this data
      s"""SELECT event_type, count(*) AS n,
         |  quantile_cont(value, 0.5) AS p50,
         |  quantile_cont(value, 0.9) AS p90,
         |  quantile_cont(value, 0.99) AS p99
         |FROM events GROUP BY event_type""".stripMargin,
    "retention_cohort" ->
      // week = integer epoch-days DIV 7 on both engines (no calendar math).
      // INVARIANT: ts >= 1970-01-01. DuckDB `//` floors while Spark `DIV`
      // truncates toward zero, so the two agree only on non-negative
      // epochs; a pre-1970 ts would bucket into different weeks per
      // engine. The generator's events all satisfy this; a consumer with
      // historical timestamps must switch both sides to floor division.
      s"""WITH e AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 // 7 AS week FROM events),
         |cohort AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id)
         |SELECT c.cohort_week, e.week - c.cohort_week AS weeks_since,
         |  count(*) AS n_active_users
         |FROM e JOIN cohort c ON e.user_id = c.user_id
         |GROUP BY 1, 2""".stripMargin,
    "dist_drift" ->
      // non-negative numerators make DuckDB's flooring // and Spark's
      // truncating DIV agree; the L1 fold is the exact rational form
      // with one terminal IEEE division
      """WITH ev AS (SELECT event_type, epoch_us(ts) AS tus,
        |    CAST(floor(value * 1000.0) AS BIGINT) AS q FROM events),
        |b AS (SELECT min(tus) AS t0, max(tus) AS t1 FROM ev),
        |vb AS (SELECT event_type, min(q) AS q0, max(q) AS q1 FROM ev GROUP BY 1),
        |cells AS (SELECT e.event_type,
        |    ((e.q - vb.q0) * 10) // (vb.q1 - vb.q0 + 1) AS bin,
        |    CAST(sum(CASE WHEN e.tus * 2 <= b.t0 + b.t1 THEN 1 ELSE 0 END) AS BIGINT) AS ce,
        |    CAST(sum(CASE WHEN e.tus * 2 <= b.t0 + b.t1 THEN 0 ELSE 1 END) AS BIGINT) AS cl
        |  FROM ev e, b JOIN vb ON e.event_type = vb.event_type GROUP BY 1, 2),
        |tot AS (SELECT event_type, CAST(sum(ce) AS BIGINT) AS n_early,
        |    CAST(sum(cl) AS BIGINT) AS n_late FROM cells GROUP BY 1)
        |SELECT c.event_type, t.n_early, t.n_late,
        |  CASE WHEN t.n_early > 0 AND t.n_late > 0
        |       THEN CAST(sum(abs(c.ce * t.n_late - c.cl * t.n_early)) AS DOUBLE)
        |            / CAST(t.n_early * t.n_late AS DOUBLE)
        |       ELSE NULL END AS l1_drift
        |FROM cells c JOIN tot t ON c.event_type = t.event_type
        |GROUP BY c.event_type, t.n_early, t.n_late""".stripMargin,
    "time_split" ->
      // quantile_cont shares Spark percentile's interpolation (proven on
      // group_percentiles); epoch-us magnitudes are exact in double
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        |c AS (SELECT quantile_cont(tus, 0.8) AS cut FROM e),
        |t AS (SELECT user_id,
        |        CASE WHEN tus <= cut THEN 'train' ELSE 'eval' END AS split
        |      FROM e, c),
        |o AS (SELECT count(*) AS n_overlap_users FROM
        |        (SELECT DISTINCT user_id FROM t WHERE split = 'train') a
        |        JOIN (SELECT DISTINCT user_id FROM t WHERE split = 'eval') b
        |          USING (user_id))
        |SELECT split, count(*) AS n_events,
        |  count(DISTINCT user_id) AS n_users, o.n_overlap_users
        |FROM t, o GROUP BY split, o.n_overlap_users""".stripMargin,
    "quality_threshold_sweep" ->
      // i/10.0 is the identical IEEE double on both engines. The
      // correlated form (not a cross-join GROUP BY) yields ten zero
      // rows on an empty corpus, matching the Spark side's coalesced
      // one-row aggregate; the qf filter pins "unratable (empty/
      // zero-token) docs are in no bucket" — without it a 0/0-NaN
      // quality sorts differently per engine.
      s"""WITH $QualityBody,
         |qf AS (SELECT n_tok, quality FROM qq WHERE text_len > 0 AND n_tok > 0),
         |th AS (SELECT unnest(range(0, 10)) AS i)
         |SELECT CAST(th.i AS DOUBLE) / 10.0 AS threshold,
         |  (SELECT CAST(count(*) AS BIGINT) FROM qf
         |     WHERE quality >= CAST(th.i AS DOUBLE) / 10.0) AS n_docs,
         |  (SELECT CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM qf
         |     WHERE quality >= CAST(th.i AS DOUBLE) / 10.0) AS n_tokens
         |FROM th""".stripMargin,
    "token_rarity" ->
      s"""WITH toks AS (SELECT doc_id, unnest($WordToksSql) AS tok FROM documents),
         |vc AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
         |j AS (SELECT t.doc_id, v.c FROM toks t JOIN vc v ON t.tok = v.tok)
         |SELECT doc_id, count(*) AS n_tok,
         |  CAST(sum(c) AS BIGINT) AS sum_freq,
         |  CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_freq,
         |  CAST(min(c) AS BIGINT) AS min_freq,
         |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
         |FROM j GROUP BY doc_id""".stripMargin,
    "importance_weight" ->
      // DSIR-shape target-likeness: per-token target/raw ratio as an
      // integer floor division (DuckDB // ≡ Spark div on non-negatives),
      // doc mean the same way — bit-exact, no log space
      s"""WITH tk AS (SELECT doc_id, lang, unnest($WordToksSql) AS tok FROM documents),
         |fr AS (SELECT tok, CAST(count(*) AS BIGINT) AS cr,
         |         CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS ct
         |       FROM tk GROUP BY tok),
         |ds AS (SELECT k.doc_id, CAST(count(*) AS BIGINT) AS n_toks,
         |         CAST(sum((f.ct * 1000000) // f.cr) AS BIGINT) AS score_fp
         |       FROM tk k JOIN fr f ON k.tok = f.tok GROUP BY k.doc_id)
         |SELECT doc_id, n_toks, score_fp, score_fp // n_toks AS mean_fp,
         |  CAST(score_fp // n_toks AS DOUBLE) / 1000000.0 AS importance
         |FROM ds""".stripMargin,
    "ohlc_agg" ->
      // open/close via deterministic (ts, event_id, value) extreme —
      // restated as rank-1 conditional aggregates; volume as exact
      // DECIMAL sum cast to double (hourly_rollup's rule)
      """WITH b AS (SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
        |            ts, event_id, value FROM events),
        |r AS (SELECT *,
        |        row_number() OVER (PARTITION BY event_type, hour
        |          ORDER BY ts, event_id, value) AS ra,
        |        row_number() OVER (PARTITION BY event_type, hour
        |          ORDER BY ts DESC, event_id DESC, value DESC) AS rd
        |      FROM b)
        |SELECT event_type, hour,
        |  max(CASE WHEN ra = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rd = 1 THEN value END) AS close,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS volume
        |FROM r GROUP BY event_type, hour""".stripMargin,
    "gap_fill" ->
      // Timestream INTERPOLATE_LINEAR/FILL: dense 10-min grid per series,
      // exact decimal means on filled buckets, linear interpolation
      // between nearest filled neighbours (edges clamp); neighbour search
      // restated as correlated extremes over the mean table
      """WITH m AS (SELECT event_type AS mt, epoch_us(ts) // 600000000 AS mb,
        |            CAST(count(*) AS BIGINT) AS cnt,
        |            sum(CAST(value AS DECIMAL(18,2))) AS sdec
        |          FROM events GROUP BY 1, 2),
        |mm AS (SELECT mt, mb, CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE) AS mv FROM m),
        |sp AS (SELECT mt, min(mb) AS b0, max(mb) AS b1 FROM mm GROUP BY mt),
        |g AS (SELECT mt AS event_type, unnest(range(b0, b1 + 1)) AS bucket FROM sp),
        |j AS (SELECT g.event_type, g.bucket, mm.mv
        |      FROM g LEFT JOIN mm ON g.event_type = mm.mt AND g.bucket = mm.mb),
        |pn AS (SELECT event_type, bucket, mv,
        |        (SELECT max(x.mb) FROM mm x WHERE x.mt = j.event_type AND x.mb <= j.bucket) AS pb,
        |        (SELECT min(x.mb) FROM mm x WHERE x.mt = j.event_type AND x.mb >= j.bucket) AS nb
        |      FROM j),
        |f AS (SELECT p.event_type, p.bucket, p.mv, p.pb, p.nb, pv.mv AS pv, nv.mv AS nv
        |      FROM pn p LEFT JOIN mm pv ON p.event_type = pv.mt AND p.pb = pv.mb
        |                LEFT JOIN mm nv ON p.event_type = nv.mt AND p.nb = nv.mb)
        |SELECT event_type, bucket, mv IS NOT NULL AS filled,
        |  CASE WHEN mv IS NOT NULL THEN mv
        |       WHEN pb IS NULL THEN nv
        |       WHEN nb IS NULL THEN pv
        |       ELSE pv + (nv - pv) * (CAST(bucket - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE))
        |  END AS value
        |FROM f""".stripMargin,
    "anomaly_zscore" ->
      // rolling z over the trailing 24 observed buckets; the window sums
      // run on floor(mean·10³) BIGINTs (exact, order-independent — double
      // frame-sum order differs between engines), then
      // z = (x·n − Σx)/√(n·Σx² − (Σx)²) in two final IEEE ops
      """WITH m AS (SELECT event_type, epoch_us(ts) // 600000000 AS b,
        |            CAST(count(*) AS BIGINT) AS cnt,
        |            sum(CAST(value AS DECIMAL(18,2))) AS sdec
        |          FROM events GROUP BY 1, 2),
        |mm AS (SELECT event_type, b,
        |         CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE) AS mv,
        |         CAST(floor((CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1000.0) AS BIGINT) AS fp
        |       FROM m),
        |w AS (SELECT event_type, b, mv, fp,
        |        CAST(count(fp) OVER win AS BIGINT) AS n,
        |        CAST(sum(fp) OVER win AS BIGINT) AS s,
        |        CAST(sum(fp * fp) OVER win AS BIGINT) AS ss
        |      FROM mm
        |      WINDOW win AS (PARTITION BY event_type ORDER BY b
        |        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, b AS bucket, mv, n AS n_window,
        |  CAST(fp * n - s AS DOUBLE) / sqrt(CAST(n * ss - s * s AS DOUBLE)) AS z,
        |  abs(CAST(fp * n - s AS DOUBLE) / sqrt(CAST(n * ss - s * s AS DOUBLE))) > 3.0 AS is_anomaly
        |FROM w WHERE n >= 12 AND n * ss - s * s > 0""".stripMargin,
    "volume_anomaly" ->
      // rolling z on bucket COUNTS — BIGINTs from the start, no
      // quantization; same window shape as anomaly_zscore
      """WITH m AS (SELECT event_type, epoch_us(ts) // 600000000 AS b,
        |            CAST(count(*) AS BIGINT) AS cnt
        |          FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, b, cnt,
        |        CAST(count(cnt) OVER win AS BIGINT) AS n,
        |        CAST(sum(cnt) OVER win AS BIGINT) AS s,
        |        CAST(sum(cnt * cnt) OVER win AS BIGINT) AS ss
        |      FROM m
        |      WINDOW win AS (PARTITION BY event_type ORDER BY b
        |        ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, b AS bucket, cnt, n AS n_window,
        |  CAST(cnt * n - s AS DOUBLE) / sqrt(CAST(n * ss - s * s AS DOUBLE)) AS z,
        |  abs(CAST(cnt * n - s AS DOUBLE) / sqrt(CAST(n * ss - s * s AS DOUBLE))) > 3.0 AS is_anomaly
        |FROM w WHERE n >= 12 AND n * ss - s * s > 0""".stripMargin,
    "series_rate" ->
      // adjacent bucket-mean deltas / true elapsed seconds; one lag per
      // value — no frame sums, so plain doubles are cross-engine exact
      """WITH m AS (SELECT event_type, epoch_us(ts) // 600000000 AS b,
        |            CAST(count(*) AS BIGINT) AS cnt,
        |            sum(CAST(value AS DECIMAL(18,2))) AS sdec
        |          FROM events GROUP BY 1, 2),
        |mm AS (SELECT event_type, b,
        |         CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE) AS mv
        |       FROM m),
        |l AS (SELECT event_type, b, mv,
        |        lag(mv) OVER win AS pm, lag(b) OVER win AS pb
        |      FROM mm WINDOW win AS (PARTITION BY event_type ORDER BY b))
        |SELECT event_type, b AS bucket, mv,
        |  (mv - pm) / (CAST(b - pb AS DOUBLE) * 600.0) AS rate_per_sec
        |FROM l WHERE pm IS NOT NULL""".stripMargin,
    "seasonal_anomaly" ->
      // hour-of-day profile z: BIGINT count/sum/sum-of-squares per
      // (series, hod) cell (group-sum order differs between engines),
      // population form, then the same two final IEEE ops
      """WITH m AS (SELECT event_type, epoch_us(ts) // 600000000 AS b,
        |            CAST(count(*) AS BIGINT) AS cnt,
        |            sum(CAST(value AS DECIMAL(18,2))) AS sdec
        |          FROM events GROUP BY 1, 2),
        |mm AS (SELECT event_type, b,
        |         CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE) AS mv,
        |         CAST(floor((CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1000.0) AS BIGINT) AS fp,
        |         (b % 144) // 6 AS hod
        |       FROM m),
        |p AS (SELECT event_type, hod, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(fp) AS BIGINT) AS s, CAST(sum(fp * fp) AS BIGINT) AS ss
        |      FROM mm GROUP BY 1, 2)
        |SELECT mm.event_type, mm.b AS bucket, mm.hod, mm.mv,
        |  CAST(fp * n - s AS DOUBLE) / sqrt(CAST(n * ss - s * s AS DOUBLE)) AS z,
        |  abs(CAST(fp * n - s AS DOUBLE) / sqrt(CAST(n * ss - s * s AS DOUBLE))) > 3.0 AS is_anomaly
        |FROM mm JOIN p ON mm.event_type = p.event_type AND mm.hod = p.hod
        |WHERE n >= 8 AND n * ss - s * s > 0""".stripMargin,
    "series_correlation" ->
      // centi-quantized bucket means; all six moments BIGINT; Pearson
      // as three exact integer terms + three final IEEE ops
      """WITH m AS (SELECT event_type, epoch_us(ts) // 600000000 AS b,
        |            CAST(count(*) AS BIGINT) AS cnt,
        |            sum(CAST(value AS DECIMAL(18,2))) AS sdec
        |          FROM events GROUP BY 1, 2),
        |mm AS (SELECT event_type, b,
        |         CAST(floor((CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE)) * 100.0) AS BIGINT) AS fp
        |       FROM m),
        |g AS (SELECT x.event_type AS et_a, y.event_type AS et_b,
        |        CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(x.fp) AS BIGINT) AS sx, CAST(sum(y.fp) AS BIGINT) AS sy,
        |        CAST(sum(x.fp * y.fp) AS BIGINT) AS sxy,
        |        CAST(sum(x.fp * x.fp) AS BIGINT) AS sxx,
        |        CAST(sum(y.fp * y.fp) AS BIGINT) AS syy
        |      FROM mm x JOIN mm y ON x.b = y.b AND x.event_type < y.event_type
        |      GROUP BY 1, 2)
        |SELECT et_a, et_b, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)) AS corr
        |FROM g WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0""".stripMargin,
    "rolling_median" ->
      // exact trailing-24 median: never an engine percentile (interpolation
      // order differs) — sort the frame's milli-quantized BIGINTs, pick the
      // two middles by integer index, one final IEEE division by 2000
      """WITH m AS (SELECT event_type, epoch_us(ts) // 600000000 AS b,
        |            CAST(count(*) AS BIGINT) AS cnt,
        |            sum(CAST(value AS DECIMAL(18,2))) AS sdec
        |          FROM events GROUP BY 1, 2),
        |mm AS (SELECT event_type, b,
        |         CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE) AS mv,
        |         CAST(floor((CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1000.0) AS BIGINT) AS fp
        |       FROM m),
        |w AS (SELECT event_type, b, mv,
        |        list_sort(list(fp) OVER win) AS arr,
        |        CAST(count(*) OVER win AS BIGINT) AS n
        |      FROM mm
        |      WINDOW win AS (PARTITION BY event_type ORDER BY b
        |        ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        |SELECT event_type, b AS bucket, mv, n AS n_window,
        |  CAST(arr[(n + 1) // 2] + arr[(n + 2) // 2] AS BIGINT) AS med_x2,
        |  CAST(arr[(n + 1) // 2] + arr[(n + 2) // 2] AS DOUBLE) / 2000.0 AS median
        |FROM w WHERE n >= 12""".stripMargin,
    "ks_test" ->
      // D's numerator cross-multiplies the two empirical CDFs in BIGINTs
      // (max |C1*n0 - C0*n1|); ONE terminal division by n0*n1; argmax
      // value tie-broken to the smallest qv
      """WITH q AS (SELECT event_type, user_id % 2 AS variant,
        |    CAST(floor(value * 100) AS BIGINT) AS qv FROM events),
        |h AS (SELECT event_type, qv,
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS f0,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1
        |  FROM q GROUP BY 1, 2),
        |c AS MATERIALIZED (SELECT event_type, qv,
        |    CAST(sum(f0) OVER w AS BIGINT) AS c0,
        |    CAST(sum(f1) OVER w AS BIGINT) AS c1
        |  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY qv
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |p AS (SELECT event_type, max(c0) AS n0, max(c1) AS n1
        |  FROM c GROUP BY 1),
        |s AS MATERIALIZED (SELECT c.event_type, c.qv, p.n0, p.n1,
        |    abs(c.c1 * p.n0 - c.c0 * p.n1) AS dnum
        |  FROM c JOIN p ON c.event_type = p.event_type),
        |d AS (SELECT event_type, CAST(max(dnum) AS BIGINT) AS d_num
        |  FROM s GROUP BY 1)
        |SELECT s.event_type, s.n0, s.n1,
        |  CAST(d.d_num AS DOUBLE)
        |    / (CAST(s.n0 AS DOUBLE) * CAST(s.n1 AS DOUBLE)) AS ks_d,
        |  CAST(min(s.qv) AS DOUBLE) / 100.0 AS at_value
        |FROM s JOIN d ON s.event_type = d.event_type AND s.dnum = d.d_num
        |GROUP BY 1, 2, 3, d.d_num""".stripMargin,
    "incremental_stats" ->
      // the oracle recomputes directly from raw events — equality with
      // the engine's day-partial merge IS the IVM losslessness proof;
      // variance cross product in HUGEINT (engine: DECIMAL(38,0))
      """WITH e AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(floor(value * 100) AS BIGINT) AS qv FROM events),
        |a AS (SELECT event_type,
        |    CAST(count(DISTINCT day) AS BIGINT) AS n_days,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(qv) AS BIGINT) AS s, min(qv) AS mn, max(qv) AS mx,
        |    CAST(sum(qv * qv) AS BIGINT) AS sq
        |  FROM e GROUP BY 1)
        |SELECT event_type, n_days, n_events,
        |  CAST(s AS DOUBLE) / 100.0 AS total,
        |  CAST(mn AS DOUBLE) / 100.0 AS vmin,
        |  CAST(mx AS DOUBLE) / 100.0 AS vmax,
        |  CAST(s AS DOUBLE) / CAST(n_events AS DOUBLE) / 100.0 AS mean,
        |  CAST(CAST(n_events AS HUGEINT) * CAST(sq AS HUGEINT)
        |       - CAST(s AS HUGEINT) * CAST(s AS HUGEINT) AS DOUBLE)
        |    / (CAST(n_events AS DOUBLE) * CAST(n_events AS DOUBLE))
        |    / 10000.0 AS variance
        |FROM a""".stripMargin,
    "upsert_merge" ->
      // per-key latest over the WHOLE changelog split into base/delta
      // elections — base⊕delta ≡ full replay is the MERGE INTO invariant
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
        |    event_id, value FROM events),
        |m AS (SELECT (min(us) + max(us)) // 2 AS mid_us FROM e),
        |b AS (SELECT user_id, event_type, us, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY us DESC, event_id DESC) AS rn
        |  FROM e, m WHERE us < mid_us),
        |d AS (SELECT user_id, event_type, us, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY us DESC, event_id DESC) AS rn
        |  FROM e, m WHERE us >= mid_us),
        |b1 AS (SELECT * FROM b WHERE rn = 1),
        |d1 AS (SELECT * FROM d WHERE rn = 1)
        |SELECT COALESCE(d1.user_id, b1.user_id) AS user_id,
        |  COALESCE(d1.event_type, b1.event_type) AS event_type,
        |  COALESCE(d1.us, b1.us) AS last_us,
        |  COALESCE(d1.event_id, b1.event_id) AS last_event_id,
        |  COALESCE(d1.value, b1.value) AS last_value,
        |  CASE WHEN d1.us IS NOT NULL THEN 'delta' ELSE 'base' END AS src
        |FROM b1 FULL OUTER JOIN d1
        |  ON b1.user_id = d1.user_id AND b1.event_type = d1.event_type""".stripMargin,
    "benford_audit" ->
      // first digit via BIGINT cents → decimal string, never log10/pow
      // mantissa math; expected shares are the SAME decimal literals
      // (interpolated from AnalyticsQueries.BenfordP) parsed by both
      // engines; chi_term repeats the obs expression so the IEEE op
      // order matches the engine's ((n*d)*d)/e exactly
      s"""WITH d AS (SELECT o_orderpriority AS priority,
         |    CAST(substr(CAST(CAST(floor(o_totalprice * 100.0) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
         |  FROM orders WHERE CAST(floor(o_totalprice * 100.0) AS BIGINT) > 0),
         |c AS (SELECT priority, digit, CAST(count(*) AS BIGINT) AS n_digit FROM d GROUP BY 1, 2),
         |t AS (SELECT priority, CAST(sum(n_digit) AS BIGINT) AS n_total FROM c GROUP BY 1),
         |e AS (SELECT * FROM (VALUES ${AnalyticsQueries.BenfordP
              // string→double (strtod) — a bare decimal literal parses
              // via DECIMAL first and can land an ulp off the Scala parse
              .map { case (dd, p) => s"($dd, CAST('$p' AS DOUBLE))" }.mkString(", ")}) AS v(digit, exp_p))
         |SELECT c.priority, c.digit, c.n_digit, t.n_total,
         |  CAST(c.n_digit AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS obs_p, e.exp_p,
         |  CAST(t.n_total AS DOUBLE)
         |    * (CAST(c.n_digit AS DOUBLE) / CAST(t.n_total AS DOUBLE) - e.exp_p)
         |    * (CAST(c.n_digit AS DOUBLE) / CAST(t.n_total AS DOUBLE) - e.exp_p)
         |    / e.exp_p AS chi_term
         |FROM c JOIN t ON c.priority = t.priority JOIN e ON c.digit = e.digit""".stripMargin,
    "mann_whitney" ->
      // U via the histogram closed form (2U in BIGINTs keeps the tie
      // halves integer); values centi-quantized so the histogram is
      // domain-bounded; z is the tie-uncorrected normal approximation
      """WITH q AS (SELECT event_type, user_id % 2 AS variant,
        |    CAST(floor(value * 100) AS BIGINT) AS qv FROM events),
        |h AS (SELECT event_type, qv,
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS f0,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1
        |  FROM q GROUP BY 1, 2),
        |w AS (SELECT event_type, f0, f1,
        |    CAST(coalesce(sum(f0) OVER (PARTITION BY event_type ORDER BY qv
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum0
        |  FROM h),
        |a AS (SELECT event_type,
        |    CAST(sum(f0) AS BIGINT) AS n0, CAST(sum(f1) AS BIGINT) AS n1,
        |    CAST(sum(f1 * (2 * cum0 + f0)) AS BIGINT) AS u2
        |  FROM w GROUP BY 1)
        |SELECT event_type, n0, n1,
        |  CAST(u2 AS DOUBLE) / 2.0 AS u,
        |  (CAST(u2 AS DOUBLE) / 2.0 - CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 2.0)
        |  / sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
        |         * CAST(n0 + n1 + 1 AS DOUBLE) / 12.0) AS z
        |FROM a""".stripMargin,
    "activity_gini" ->
      // tie-grouped closed form over the distinct-count histogram: for f
      // users sharing count c after cumulative position p, the rank sum
      // is c*(f*p + f(f+1)/2) — exact integers, two terminal divisions
      """WITH uc AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |h AS (SELECT event_type, c, CAST(count(*) AS BIGINT) AS f
        |  FROM uc GROUP BY 1, 2),
        |w AS (SELECT event_type, c, f,
        |    CAST(coalesce(sum(f) OVER (PARTITION BY event_type ORDER BY c
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS p
        |  FROM h),
        |a AS (SELECT event_type,
        |    CAST(sum(f) AS BIGINT) AS n_users,
        |    CAST(sum(c * f) AS BIGINT) AS total_events,
        |    CAST(sum(c * (f * p + (f * (f + 1)) // 2)) AS BIGINT) AS ranked
        |  FROM w GROUP BY 1)
        |SELECT event_type, n_users, total_events,
        |  2.0 * CAST(ranked AS DOUBLE)
        |    / (CAST(n_users AS DOUBLE) * CAST(total_events AS DOUBLE))
        |  - CAST(n_users + 1 AS DOUBLE) / CAST(n_users AS DOUBLE) AS gini
        |FROM a""".stripMargin,
    "ab_ztest" ->
      // z reported, never a p-value: erf/Phi differ across libm builds;
      // counts + one sqrt + fixed-order IEEE ops are exact cross-engine
      """WITH u AS (SELECT user_id, date_trunc('day', ts) AS d,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS conv
        |  FROM events GROUP BY 1, 2),
        |v AS (SELECT user_id % 2 AS variant, conv FROM u),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
        |  FROM v)
        |SELECT n0, n1, c0, c1,
        |  CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
        |  CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
        |  (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |   - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |  / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |         * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
        |         * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE))) AS z,
        |  (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
        |    * (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
        |    / (CAST(n0 + n1 AS DOUBLE) / 2.0)
        |  + (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
        |    * (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
        |    / (CAST(n0 + n1 AS DOUBLE) / 2.0) AS srm_chi2
        |FROM a""".stripMargin,
    "cuped_ab" ->
      // mirrors the engine op-for-op: per-user period means quantized to
      // centi-units, pooled theta/rho2 from exact BIGINT moments, then
      // the variant adjustment in the same IEEE order
      """WITH ev AS MATERIALIZED (SELECT user_id, value, epoch_ms(ts) AS ms FROM events),
        |mid AS (SELECT (min(ms) + max(ms)) // 2 AS mid_ms FROM ev),
        |u0 AS (SELECT user_id,
        |    CAST(count(CASE WHEN ms < mid_ms THEN 1 END) AS BIGINT) AS nx,
        |    sum(CASE WHEN ms < mid_ms THEN CAST(value AS DECIMAL(18,2)) END) AS sx_dec,
        |    CAST(count(CASE WHEN ms >= mid_ms THEN 1 END) AS BIGINT) AS ny,
        |    sum(CASE WHEN ms >= mid_ms THEN CAST(value AS DECIMAL(18,2)) END) AS sy_dec
        |  FROM ev, mid GROUP BY user_id, mid_ms),
        |u AS MATERIALIZED (SELECT user_id, user_id % 2 AS variant,
        |    CAST(floor((CAST(sx_dec AS DOUBLE) / CAST(nx AS DOUBLE)) * 100) AS BIGINT) AS x,
        |    CAST(floor((CAST(sy_dec AS DOUBLE) / CAST(ny AS DOUBLE)) * 100) AS BIGINT) AS y
        |  FROM u0 WHERE nx > 0 AND ny > 0),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x*x) AS BIGINT) AS sxx,
        |    CAST(sum(x*y) AS BIGINT) AS sxy, CAST(sum(y*y) AS BIGINT) AS syy
        |  FROM u),
        |t AS (SELECT n, sx,
        |    CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |    ELSE CAST(n * sxy - sx * sy AS DOUBLE)
        |         / CAST(n * sxx - sx * sx AS DOUBLE) END AS theta,
        |    CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
        |    ELSE (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
        |         / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
        |    END AS rho2
        |  FROM m)
        |SELECT u.variant, CAST(count(*) AS BIGINT) AS n_users, t.theta, t.rho2,
        |  CAST(sum(u.y) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0 AS mean_post,
        |  CAST(sum(u.x) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0 AS mean_pre,
        |  (CAST(sum(u.y) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |   - t.theta * (CAST(sum(u.x) AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |                - CAST(t.sx AS DOUBLE) / CAST(t.n AS DOUBLE))) / 100.0 AS mean_adj
        |FROM u, t GROUP BY u.variant, t.theta, t.rho2, t.sx, t.n""".stripMargin,
    "value_runs" ->
      // SCD2 run-length intervals: islands by value change per user,
      // then the half-open valid_until from the next run's start
      """WITH e AS (SELECT user_id, event_id, ts, event_type,
        |    lag(event_type) OVER w AS prev
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |c AS (SELECT *, CASE WHEN prev IS NULL OR prev <> event_type
        |                     THEN 1 ELSE 0 END AS chg FROM e),
        |r AS (SELECT *, CAST(sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS run_id
        |  FROM c),
        |g AS (SELECT user_id, run_id, event_type,
        |    CAST(count(*) AS BIGINT) AS n_events,
        |    min(ts) AS valid_from, max(ts) AS valid_to
        |  FROM r GROUP BY 1, 2, 3)
        |SELECT user_id, run_id, event_type, n_events, valid_from, valid_to,
        |  lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_until
        |FROM g""".stripMargin,
    "pareto_front" ->
      // skyline via the same sweep construction the engine runs: min
      // price per (segment, date), strictly-previous running min over
      // dates, survive iff date-best AND cheaper than every earlier best
      """WITH r AS (SELECT c.c_mktsegment AS segment, o.o_orderdate AS odate,
        |    o.o_totalprice AS price, o.o_orderkey
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
        |d AS (SELECT segment, odate, min(price) AS md FROM r GROUP BY 1, 2),
        |w AS (SELECT segment, odate, md,
        |    min(md) OVER (PARTITION BY segment ORDER BY odate
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1
        |  FROM d)
        |SELECT r.segment, r.odate, r.o_orderkey, r.price
        |FROM r JOIN w ON r.segment = w.segment AND r.odate = w.odate
        |WHERE r.price = w.md AND (w.m1 IS NULL OR r.price < w.m1)""".stripMargin,
    "theil_sen" ->
      // pairwise slopes integer-divide toward zero (Spark div and DuckDB
      // // BOTH truncate — verified on the negative numerators a falling
      // series produces); median = value at rank (n+1)//2
      """WITH m AS MATERIALIZED (SELECT event_type,
        |    epoch_us(ts) // 3600000000 AS hb,
        |    CAST(floor((CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |                 / CAST(count(*) AS DOUBLE)) * 1000) AS BIGINT) AS fp
        |  FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |    ((b.fp - a.fp) * 1000) // (b.hb - a.hb) AS slope_fp
        |  FROM m a JOIN m b ON a.event_type = b.event_type AND b.hb > a.hb),
        |r AS (SELECT event_type, slope_fp,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY slope_fp)
        |      AS BIGINT) AS rk,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_pairs
        |  FROM p),
        |med AS (SELECT event_type, n_pairs, slope_fp AS ts_slope_fp
        |  FROM r WHERE rk = (n_pairs + 1) // 2),
        |o AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_hours,
        |    CAST(sum(hb) AS BIGINT) AS sx, CAST(sum(fp) AS BIGINT) AS sy,
        |    CAST(sum(hb * hb) AS BIGINT) AS sxx, CAST(sum(hb * fp) AS BIGINT) AS sxy
        |  FROM m GROUP BY 1)
        |SELECT med.event_type, o.n_hours, med.n_pairs, med.ts_slope_fp,
        |  CAST(med.ts_slope_fp AS DOUBLE) / 1000.0 AS ts_slope,
        |  CAST(o.n_hours * o.sxy - o.sx * o.sy AS DOUBLE)
        |    / CAST(o.n_hours * o.sxx - o.sx * o.sx AS DOUBLE) AS ols_slope
        |FROM med JOIN o ON med.event_type = o.event_type""".stripMargin,
    "series_autocorr" ->
      // lag-1 Pearson per series: centi-quantized means, six BIGINT
      // moments, three final IEEE ops — series_correlation's discipline
      """WITH m AS (SELECT event_type, epoch_us(ts) // 600000000 AS b,
        |            CAST(count(*) AS BIGINT) AS cnt,
        |            sum(CAST(value AS DECIMAL(18,2))) AS sdec
        |          FROM events GROUP BY 1, 2),
        |mm AS (SELECT event_type, b,
        |         CAST(floor((CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE)) * 100.0) AS BIGINT) AS fp
        |       FROM m),
        |l AS (SELECT event_type, fp,
        |        lag(fp) OVER (PARTITION BY event_type ORDER BY b) AS pf
        |      FROM mm),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(fp) AS BIGINT) AS sx, CAST(sum(pf) AS BIGINT) AS sy,
        |        CAST(sum(fp * pf) AS BIGINT) AS sxy,
        |        CAST(sum(fp * fp) AS BIGINT) AS sxx,
        |        CAST(sum(pf * pf) AS BIGINT) AS syy
        |      FROM l WHERE pf IS NOT NULL GROUP BY 1)
        |SELECT event_type, n,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)) AS autocorr_lag1
        |FROM g WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0""".stripMargin,
    "series_cusum" ->
      // CUSUM argmax restated scale-free: S·n = n·prefixΣ − i·totalΣ, all
      // BIGINT; earliest-bucket tie-break via explicit row_number; one
      // final IEEE division for the normalized shift
      """WITH m AS (SELECT event_type, epoch_us(ts) // 600000000 AS b,
        |            CAST(count(*) AS BIGINT) AS cnt,
        |            sum(CAST(value AS DECIMAL(18,2))) AS sdec
        |          FROM events GROUP BY 1, 2),
        |mm AS (SELECT event_type, b,
        |         CAST(floor((CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1000.0) AS BIGINT) AS fp
        |       FROM m),
        |t AS (SELECT event_type AS tet, CAST(count(*) AS BIGINT) AS ntot,
        |        CAST(sum(fp) AS BIGINT) AS stot
        |      FROM mm GROUP BY 1),
        |r AS (SELECT mm.event_type, b, ntot, stot,
        |        CAST(row_number() OVER wo AS BIGINT) AS i,
        |        CAST(sum(fp) OVER wr AS BIGINT) AS ps
        |      FROM mm JOIN t ON mm.event_type = t.tet
        |      WINDOW wo AS (PARTITION BY mm.event_type ORDER BY b),
        |             wr AS (PARTITION BY mm.event_type ORDER BY b
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |s AS (SELECT event_type, b, ntot, ntot * ps - i * stot AS s FROM r),
        |p AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY abs(s) DESC, b) AS rn FROM s)
        |SELECT event_type, b AS change_bucket, ntot AS n_buckets, s AS cusum_xn,
        |  CAST(abs(s) AS DOUBLE) / (CAST(ntot AS DOUBLE) * CAST(ntot AS DOUBLE) * 1000.0) AS cusum_norm
        |FROM p WHERE rn = 1""".stripMargin,
    "series_ewma" -> {
      // truncated α=1/4 EWMA: exact-rational weights 3^j·4^(7−j) over
      // milli-quantized means, termwise BIGINT lag sums (no frame
      // aggregation), two fixed-order IEEE divisions; forecast_err is
      // one subtraction of identical doubles
      val ws = AnalyticsQueries.EwmaWeights
      val lagDefs = (1 until 8)
        .map(j => s"lag(fp, $j) OVER win AS l$j").mkString(",\n  ")
      val num = (s"fp * ${ws(0)}" +:
        (1 until 8).map(j =>
          s"CASE WHEN l$j IS NOT NULL THEN l$j * ${ws(j)} ELSE 0 END"))
        .mkString(" + ")
      val den = (s"${ws(0)}" +:
        (1 until 8).map(j =>
          s"CASE WHEN l$j IS NOT NULL THEN ${ws(j)} ELSE 0 END"))
        .mkString(" + ")
      s"""WITH m AS (SELECT event_type, epoch_us(ts) // 600000000 AS b,
         |            CAST(count(*) AS BIGINT) AS cnt,
         |            sum(CAST(value AS DECIMAL(18,2))) AS sdec
         |          FROM events GROUP BY 1, 2),
         |mm AS (SELECT event_type, b,
         |         CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE) AS mv
         |       FROM m),
         |f AS (SELECT event_type, b, mv,
         |        CAST(floor(mv * 1000.0) AS BIGINT) AS fp FROM mm),
         |l AS (SELECT event_type, b, mv, fp,
         |  $lagDefs
         |  FROM f WINDOW win AS (PARTITION BY event_type ORDER BY b)),
         |e AS (SELECT event_type, b, mv,
         |        CAST($num AS DOUBLE) / CAST($den AS DOUBLE) / 1000.0 AS ewma
         |      FROM l)
         |SELECT event_type, b AS bucket, mv, ewma,
         |  mv - lag(ewma) OVER (PARTITION BY event_type ORDER BY b) AS forecast_err
         |FROM e""".stripMargin
    },
    "robust_zscore" ->
      // Iglewicz–Hoaglin modified z: sorted-array double-middle picks on
      // milli-quantized BIGINTs (med ×2 units, MAD ×4 units — no
      // half-integers anywhere), one fixed-order IEEE expression
      """WITH m AS (SELECT event_type, epoch_us(ts) // 600000000 AS b,
        |            CAST(count(*) AS BIGINT) AS cnt,
        |            sum(CAST(value AS DECIMAL(18,2))) AS sdec
        |          FROM events GROUP BY 1, 2),
        |f AS (SELECT event_type, b,
        |        CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE) AS mv,
        |        CAST(floor((CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1000.0) AS BIGINT) AS fp
        |      FROM m
        |      WHERE sdec IS NOT NULL),
        |md AS (SELECT event_type AS mt, list_sort(list(fp)) AS arr,
        |         CAST(count(*) AS BIGINT) AS n
        |       FROM f GROUP BY 1),
        |md2 AS (SELECT mt, n,
        |          arr[CAST((n + 1) // 2 AS INT)] + arr[CAST((n + 2) // 2 AS INT)] AS med_x2
        |        FROM md),
        |dv AS (SELECT f.event_type, f.b, f.mv, f.fp, md2.n, md2.med_x2,
        |         abs(2 * fp - med_x2) AS dev_x2
        |       FROM f JOIN md2 ON f.event_type = md2.mt),
        |ma AS (SELECT event_type AS dt, list_sort(list(dev_x2)) AS darr,
        |         CAST(count(*) AS BIGINT) AS dn
        |       FROM dv GROUP BY 1),
        |ma2 AS (SELECT dt,
        |          darr[CAST((dn + 1) // 2 AS INT)] + darr[CAST((dn + 2) // 2 AS INT)] AS mad_x4
        |        FROM ma),
        |z AS (SELECT event_type, b, mv, med_x2, mad_x4,
        |        0.6745 * CAST(2 * fp - med_x2 AS DOUBLE) * 2.0 / CAST(mad_x4 AS DOUBLE) AS robust_z
        |      FROM dv JOIN ma2 ON dv.event_type = ma2.dt
        |      WHERE mad_x4 > 0 AND n >= 12)
        |SELECT event_type, b AS bucket, mv, med_x2, mad_x4, robust_z,
        |  abs(robust_z) > 3.5 AS is_anomaly
        |FROM z""".stripMargin,
    "winsorize" ->
      // per-series p05/p95 clamp: quantile_cont matches Spark's exact
      // percentile bit-for-bit (proven on group_percentiles); NULL
      // values pass through with NULL flags in both engines
      """WITH c AS (SELECT event_type AS ct,
        |    quantile_cont(value, 0.05) AS lo,
        |    quantile_cont(value, 0.95) AS hi
        |  FROM events GROUP BY 1)
        |SELECT event_id, event_type, value,
        |  CASE WHEN value < lo THEN lo WHEN value > hi THEN hi
        |       ELSE value END AS winsorized,
        |  value < lo AS clipped_low, value > hi AS clipped_high
        |FROM events JOIN c ON event_type = ct""".stripMargin,
    "dup_matrix" ->
      // LSH candidates rolled up by unordered source pair — integer
      // counts over the shared cand CTE
      s"""WITH $LshCandBody,
         |s AS (SELECT doc_id, source FROM documents)
         |SELECT least(sa.source, sb.source) AS src_a,
         |  greatest(sa.source, sb.source) AS src_b,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM cand c
         |JOIN s sa ON c.doc_a = sa.doc_id
         |JOIN s sb ON c.doc_b = sb.doc_id
         |GROUP BY 1, 2""".stripMargin,
    "source_similarity" -> {
      // per-source mergeable MinHash (min per seed over the source's
      // shingles) beside the exact shingle-set Jaccard — integer counts,
      // two final IEEE divisions
      val minExprs = SimilarityQueries.MinhashSeeds.zipWithIndex.map {
        case ((a, b), i) => s"min((h * $a + $b) % ${SimilarityQueries.MinhashP}) AS mh$i"
      }.mkString(",\n  ")
      val matchSum = SimilarityQueries.MinhashSeeds.indices
        .map(i => s"(CASE WHEN a.mh$i = b.mh$i THEN 1 ELSE 0 END)").mkString(" + ")
      val nSeeds = SimilarityQueries.MinhashSeeds.size
      s"""WITH w AS (SELECT source, $WordToksSql AS ws FROM documents),
         |shx AS (SELECT source, unnest($ShingleSql) AS sh FROM w),
         |hh AS (SELECT source, ${hash32Sql("sh")} AS h FROM shx),
         |sig AS (SELECT source, $minExprs FROM hh GROUP BY source),
         |sets AS (SELECT DISTINCT source, h FROM hh),
         |sz AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM sets GROUP BY source),
         |it AS (SELECT x.source AS src_a, y.source AS src_b,
         |         CAST(count(*) AS BIGINT) AS inter
         |       FROM sets x JOIN sets y ON x.h = y.h AND x.source < y.source
         |       GROUP BY 1, 2)
         |SELECT i.src_a, i.src_b, sa.sz AS sz_a, sb.sz AS sz_b, i.inter,
         |  CAST(i.inter AS DOUBLE) / CAST(sa.sz + sb.sz - i.inter AS DOUBLE) AS jaccard,
         |  CAST($matchSum AS BIGINT) AS n_match,
         |  CAST($matchSum AS DOUBLE) / $nSeeds.0 AS est_sim
         |FROM it i
         |JOIN sz sa ON i.src_a = sa.source
         |JOIN sz sb ON i.src_b = sb.source
         |JOIN sig a ON i.src_a = a.source
         |JOIN sig b ON i.src_b = b.source""".stripMargin
    },
    "series_decompose" ->
      // trend: centered ±12 frame sums on milli-quantized BIGINTs, one
      // division; detrended re-quantizes once, staying in milli-units
      // (identical doubles floor identically); profile sums BIGINT
      // again; residual ops in the same IEEE order as the engine side
      """WITH m AS (SELECT event_type, epoch_us(ts) // 600000000 AS b,
        |            CAST(count(*) AS BIGINT) AS cnt,
        |            sum(CAST(value AS DECIMAL(18,2))) AS sdec
        |          FROM events GROUP BY 1, 2),
        |mm AS (SELECT event_type, b,
        |         CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE) AS mv,
        |         CAST(floor((CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1000.0) AS BIGINT) AS fp
        |       FROM m),
        |t AS (SELECT event_type, b, mv, fp,
        |        CAST(count(fp) OVER win AS BIGINT) AS nt,
        |        CAST(sum(fp) OVER win AS BIGINT) AS st
        |      FROM mm
        |      WINDOW win AS (PARTITION BY event_type ORDER BY b
        |        ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)),
        |d AS (SELECT event_type, b, mv,
        |        CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) AS trend_fp,
        |        CAST(fp AS DOUBLE) - CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) AS detr,
        |        CAST(floor(CAST(fp AS DOUBLE) - CAST(st AS DOUBLE) / CAST(nt AS DOUBLE)) AS BIGINT) AS dq,
        |        (b % 144) // 6 AS hod
        |      FROM t WHERE nt >= 13),
        |p AS (SELECT event_type, hod, CAST(count(*) AS BIGINT) AS np,
        |        CAST(sum(dq) AS BIGINT) AS sp
        |      FROM d GROUP BY 1, 2)
        |SELECT d.event_type, d.b AS bucket, d.mv,
        |  d.trend_fp / 1000.0 AS trend,
        |  (CAST(p.sp AS DOUBLE) / CAST(p.np AS DOUBLE)) / 1000.0 AS seasonal,
        |  (d.detr - CAST(p.sp AS DOUBLE) / CAST(p.np AS DOUBLE)) / 1000.0 AS residual
        |FROM d JOIN p ON d.event_type = p.event_type AND d.hod = p.hod""".stripMargin,
    "unpivot_stats" ->
      // wide→narrow melt restated as UNION ALL of one select per
      // measure — value arithmetic identical to the engine side
      """WITH w AS (SELECT event_type,
        |    CAST(count(*) AS DOUBLE) AS n_events,
        |    min(value) AS min_value, max(value) AS max_value,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1)
        |SELECT event_type, 'n_events' AS metric, n_events AS value FROM w
        |UNION ALL SELECT event_type, 'min_value', min_value FROM w
        |UNION ALL SELECT event_type, 'max_value', max_value FROM w
        |UNION ALL SELECT event_type, 'sum_value', sum_value FROM w""".stripMargin,
    "cms_topk" -> {
      // CMS audit: 4×1024 counters from one token pass, probed with the
      // exact top-50 — pure BIGINT arithmetic end to end
      val P = SimilarityQueries.MinhashP
      val w = TextQueries.CmsW
      val rowSelects = TextQueries.CmsSeeds.zipWithIndex.map { case ((a, b), i) =>
        s"SELECT CAST($i AS BIGINT) AS d, (h * $a + $b) % $P % $w AS bkt FROM th"
      }.mkString("\n  UNION ALL ")
      val probeSelects = TextQueries.CmsSeeds.zipWithIndex.map { case ((a, b), i) =>
        s"SELECT tok, exact_c, CAST($i AS BIGINT) AS d, (h * $a + $b) % $P % $w AS bkt FROM ex"
      }.mkString("\n  UNION ALL ")
      s"""WITH tk AS (SELECT unnest($WordToksSql) AS tok FROM documents),
         |th AS (SELECT tok, ${hash32Sql("tok")} AS h FROM tk),
         |bk AS ($rowSelects),
         |counters AS (SELECT d, bkt, CAST(count(*) AS BIGINT) AS c FROM bk GROUP BY 1, 2),
         |ex AS (SELECT tok, h, CAST(count(*) AS BIGINT) AS exact_c FROM th
         |       GROUP BY 1, 2 ORDER BY exact_c DESC, tok LIMIT 50),
         |pr AS ($probeSelects)
         |SELECT p.tok, p.exact_c, min(c.c) AS est_c,
         |  min(c.c) - p.exact_c AS overcount
         |FROM pr p JOIN counters c ON p.d = c.d AND p.bkt = c.bkt
         |GROUP BY p.tok, p.exact_c""".stripMargin
    },
    "token_diversity" ->
      // Simpson diversity 1 − Σpᵢ² as a pure BIGINT rational —
      // (n² − Σc²)·10⁶ // n² — no log space (libm-ULP rule)
      s"""WITH t AS (SELECT doc_id, unnest($WordToksSql) AS tok FROM documents),
         |g AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY doc_id, tok),
         |d AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
         |        CAST(count(*) AS BIGINT) AS n_distinct,
         |        CAST(sum(c * c) AS BIGINT) AS sum_sq
         |      FROM g GROUP BY doc_id)
         |SELECT doc_id, n_tok, n_distinct, sum_sq,
         |  CAST(((n_tok * n_tok - sum_sq) * 1000000) // (n_tok * n_tok) AS BIGINT) AS simpson_fp,
         |  CAST(((n_tok * n_tok - sum_sq) * 1000000) // (n_tok * n_tok) AS DOUBLE) / 1000000.0 AS simpson
         |FROM d""".stripMargin,
    "vocab_coverage" ->
      // top-100 vocab by (count DESC, token ASC); coverage as the exact
      // fixed-point ratio n_in_vocab·10⁶ // n_tok
      s"""WITH t AS (SELECT doc_id, unnest($WordToksSql) AS tok FROM documents),
         |vc AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
         |vr AS (SELECT tok, row_number() OVER (ORDER BY c DESC, tok ASC) AS rk FROM vc),
         |v AS (SELECT tok FROM vr WHERE rk <= 100),
         |d AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tok,
         |        CAST(sum(CASE WHEN v.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_in_vocab
         |      FROM t LEFT JOIN v ON t.tok = v.tok GROUP BY t.doc_id)
         |SELECT doc_id, n_tok, n_in_vocab,
         |  CAST((n_in_vocab * 1000000) // n_tok AS BIGINT) AS coverage_fp,
         |  CAST((n_in_vocab * 1000000) // n_tok AS DOUBLE) / 1000000.0 AS coverage
         |FROM d""".stripMargin,
    "bpe_train" -> {
      // unrolled 3-round merge chain; every multiply-referenced CTE is
      // MATERIALIZED (DuckDB inlines per reference otherwise — the
      // kcore_peel lesson). The zipped unnests enumerate adjacent symbol
      // pairs; '|' terminators make replace() boundary-safe.
      def census(w: String, p: String, t: String) =
        s"""$p AS (SELECT a, b, CAST(sum(c) AS BIGINT) AS cnt FROM (
           |    SELECT c,
           |      unnest(list_transform(range(1, len(sy)), x -> sy[x])) AS a,
           |      unnest(list_transform(range(1, len(sy)), x -> sy[x+1])) AS b
           |    FROM (SELECT c, string_split(substr(seq, 1, length(seq) - 1), '|') AS sy
           |          FROM $w)
           |    WHERE len(sy) >= 2) GROUP BY 1, 2),
           |$t AS MATERIALIZED (SELECT a, b, cnt FROM $p ORDER BY cnt DESC, a, b LIMIT 1)""".stripMargin
      def merge(prev: String, t: String, w: String, s: String) =
        s"""$w AS MATERIALIZED (SELECT tok, c,
           |    replace(seq, t.a || '|' || t.b || '|', t.a || t.b || '|') AS seq
           |  FROM $prev, $t t),
           |$s AS (SELECT CAST(sum(c * (length(seq) - length(replace(seq, '|', ''))))
           |    AS BIGINT) AS total_symbols FROM $w)""".stripMargin
      s"""WITH wf AS (SELECT tok, CAST(count(*) AS BIGINT) AS c
         |    FROM (SELECT unnest($WordToksSql) AS tok FROM documents) GROUP BY tok),
         |w0 AS MATERIALIZED (SELECT tok, c,
         |    array_to_string(string_split(tok, ''), '|') || '|' AS seq FROM wf),
         |${census("w0", "p1", "t1")},
         |${merge("w0", "t1", "w1", "s1")},
         |${census("w1", "p2", "t2")},
         |${merge("w1", "t2", "w2", "s2")},
         |${census("w2", "p3", "t3")},
         |${merge("w2", "t3", "w3", "s3")}
         |SELECT CAST(1 AS BIGINT) AS round, t1.a AS "left", t1.b AS "right",
         |  t1.cnt AS pair_cnt, s1.total_symbols FROM t1, s1
         |UNION ALL SELECT CAST(2 AS BIGINT), t2.a, t2.b, t2.cnt, s2.total_symbols FROM t2, s2
         |UNION ALL SELECT CAST(3 AS BIGINT), t3.a, t3.b, t3.cnt, s3.total_symbols FROM t3, s3""".stripMargin
    },
    "bpe_pairs" ->
      // one BPE merge iteration: char-pair counts over the DISTINCT-word
      // table weighted by word frequency; DuckDB range(1,n) is
      // end-exclusive and s[i:i+1] is a 1-based inclusive 2-char slice —
      // both match Spark's sequence(1, len-1) + substr(i, 2)
      s"""WITH t AS (SELECT unnest($WordToksSql) AS tok FROM documents),
         |wf AS (SELECT tok, CAST(count(*) AS BIGINT) AS c FROM t GROUP BY tok),
         |p AS (SELECT unnest(list_transform(range(1, length(tok)), i -> tok[i:i+1])) AS pair, c
         |      FROM wf WHERE length(tok) >= 2),
         |a AS (SELECT pair, CAST(sum(c) AS BIGINT) AS cnt FROM p GROUP BY pair),
         |r AS (SELECT pair, cnt,
         |        CAST(row_number() OVER (ORDER BY cnt DESC, pair ASC) AS BIGINT) AS rk
         |      FROM a)
         |SELECT pair, cnt, rk FROM r WHERE rk <= 50""".stripMargin,
    "quantile_bins" ->
      // NULLs route to a dedicated bin 0, excluded from the tiling
      // (PARTITION BY value IS NULL keeps them out of the non-null
      // partition's ntile slots) — matching quantileBins exactly
      s"""WITH b AS (SELECT value, event_id,
         |    CASE WHEN value IS NULL THEN 0 ELSE CAST(ntile(10) OVER
         |      (PARTITION BY value IS NULL ORDER BY value, event_id) AS BIGINT)
         |    END AS bin FROM events)
         |SELECT bin, count(*) AS n, min(value) AS min_value, max(value) AS max_value,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM b GROUP BY bin""".stripMargin,
    "quantile_bins_scalable" ->
      // quantile_cont's rank = p*(n-1) linear interpolation matches Spark
      // percentile bit-for-bit (proven on group_percentiles), so the
      // cutpoint comparisons below are identical across engines. Lambda
      // var `qc` deliberately avoids hash32Sql's internal `i`.
      s"""WITH cuts AS (SELECT quantile_cont(value,
         |    [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cuts FROM events),
         |b AS (SELECT value,
         |    CASE WHEN value IS NULL THEN 0
         |    ELSE CAST(1 + len(list_filter(cuts.cuts, qc -> value > qc)) AS BIGINT)
         |    END AS bin
         |  FROM events, cuts)
         |SELECT bin, count(*) AS n, min(value) AS min_value, max(value) AS max_value,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         |FROM b GROUP BY bin""".stripMargin,
    "tfidf_top" ->
      s"""WITH toks AS (SELECT doc_id, unnest($WordToksSql) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY doc_id, tok),
         |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
         |s AS (SELECT t.doc_id, t.tok, t.tf, d.df,
         |    CAST(t.tf AS DOUBLE) / CAST(d.df + 1 AS DOUBLE) AS score
         |  FROM tf t JOIN dfreq d ON t.tok = d.tok),
         |r AS (SELECT *, CAST(row_number() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, tok) AS BIGINT) AS rk FROM s)
         |SELECT doc_id, tok, tf, df, score, rk FROM r WHERE rk <= 3""".stripMargin,
    "mix_sample" ->
      // rate = min(1, (total/n_sources)/src_tok), all three IEEE ops in
      // the same order as the Spark side; u = h/2^32 is exact
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST(len($WordToksSql) AS BIGINT) AS n_tok,
         |    CAST(${hash32Sql("source || ':' || text")} AS DOUBLE) / 4294967296.0 AS u
         |  FROM documents),
         |s AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tok FROM d GROUP BY source),
         |t AS (SELECT CAST(sum(src_tok) AS BIGINT) AS total_tok,
         |             CAST(count(*) AS BIGINT) AS n_src FROM s),
         |r AS (SELECT source,
         |    least(CAST(1.0 AS DOUBLE),
         |      (CAST(total_tok AS DOUBLE) / CAST(n_src AS DOUBLE)) / CAST(src_tok AS DOUBLE)) AS rate
         |  FROM s, t)
         |SELECT d.doc_id, d.source, d.n_tok, r.rate
         |FROM d JOIN r ON d.source = r.source
         |WHERE d.u < r.rate""".stripMargin,
    "mix_temperature" ->
      // target share ∝ √raw_share; the normalizer Σ√share sums exact
      // fixed-point BIGINTs (floor(√p·1e12)); sqrt/divisions are single
      // correctly-rounded IEEE ops in the same order as the Spark side
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST(len($WordToksSql) AS BIGINT) AS n_tok,
         |    CAST(${hash32Sql("'t:' || source || ':' || text")} AS DOUBLE) / 4294967296.0 AS u
         |  FROM documents),
         |s AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tok FROM d GROUP BY source),
         |t AS (SELECT CAST(sum(src_tok) AS BIGINT) AS total_tok FROM s),
         |w AS (SELECT source, src_tok,
         |    CAST(src_tok AS DOUBLE) / CAST(total_tok AS DOUBLE) AS raw_share,
         |    CAST(floor(sqrt(CAST(src_tok AS DOUBLE) / CAST(total_tok AS DOUBLE))
         |               * 1000000000000.0) AS BIGINT) AS wfp
         |  FROM s, t),
         |z AS (SELECT CAST(sum(wfp) AS BIGINT) AS zfp FROM w),
         |r AS (SELECT source, raw_share,
         |    CAST(wfp AS DOUBLE) / CAST(zfp AS DOUBLE) AS temp_share,
         |    least(CAST(1.0 AS DOUBLE),
         |      (CAST(wfp AS DOUBLE) / CAST(zfp AS DOUBLE)) / raw_share) AS rate
         |  FROM w, z)
         |SELECT d.doc_id, d.source, d.n_tok, r.raw_share, r.temp_share, r.rate
         |FROM d JOIN r ON d.source = r.source
         |WHERE d.u < r.rate""".stripMargin,
    "cross_shard_dup" ->
      // LSH candidates classified by shard co-location (md5-mod-8
      // content sharding) and exact-fingerprint equality
      s"""WITH $LshCandBody,
         |shd AS (SELECT doc_id, ${hash32Sql("text")} % 8 AS shard,
         |    md5($NormSql) AS fp FROM documents)
         |SELECT a.shard = b.shard AS same_shard, a.fp = b.fp AS exact_dup,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM cand JOIN shd a ON cand.doc_a = a.doc_id
         |          JOIN shd b ON cand.doc_b = b.doc_id
         |GROUP BY 1, 2""".stripMargin,
    "quality_vs_dup" ->
      // near-dup degree buckets (0..3+) vs micro-quantized mean quality;
      // BIGINT sums, one pinned division
      s"""WITH $LshCandBody,
         |$QualityBody,
         |dg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS deg FROM (
         |    SELECT doc_a AS doc_id FROM cand
         |    UNION ALL SELECT doc_b FROM cand) GROUP BY 1),
         |qd AS (SELECT least(coalesce(d.deg, 0), 3) AS deg_bucket,
         |    CAST(floor(q.quality * 1000000.0) AS BIGINT) AS q_fp
         |  FROM qq q LEFT JOIN dg d ON q.doc_id = d.doc_id)
         |SELECT deg_bucket, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(q_fp) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0) AS mean_quality
         |FROM qd GROUP BY 1""".stripMargin,
    "domain_reweight" ->
      // lm_score's bigram chain keyed to source; HUGEINT cross-products
      // (DECIMAL(38,0) in the engine) keep the excess-loss numerator and
      // unnormalized weights exact; final doubles are pinned single
      // divisions. Multiply-referenced CTEs MATERIALIZED.
      s"""WITH w AS MATERIALIZED (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |t AS (SELECT doc_id, unnest(ws) AS tok FROM w),
         |uni AS (SELECT tok, CAST(count(*) AS BIGINT) AS cu FROM t GROUP BY tok),
         |bx AS (SELECT doc_id,
         |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
         |  FROM w),
         |bu AS MATERIALIZED (SELECT doc_id, bg, string_split(bg, ' ')[1] AS u FROM bx),
         |bi AS (SELECT bg, CAST(count(*) AS BIGINT) AS cb FROM bu GROUP BY bg),
         |sc AS (SELECT b.doc_id,
         |    CAST(floor((CAST(i.cb AS DOUBLE) / CAST(n.cu AS DOUBLE)) * 1000000000.0) AS BIGINT) AS p_fp
         |  FROM bu b JOIN bi i ON b.bg = i.bg JOIN uni n ON b.u = n.tok),
         |pd AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nb,
         |    CAST(sum(p_fp) AS BIGINT) AS lp FROM sc GROUP BY doc_id),
         |ps AS MATERIALIZED (SELECT d.source,
         |    CAST(sum(nb) AS HUGEINT) AS ns, CAST(sum(lp) AS HUGEINT) AS ls
         |  FROM pd JOIN documents d USING (doc_id) GROUP BY 1),
         |tt AS (SELECT sum(ns) AS ntot, sum(ls) AS ltot FROM ps),
         |uu AS MATERIALIZED (SELECT source, ns, ls, ntot, ltot,
         |    ntot*ns + greatest(ltot*ns - ls*ntot, CAST(0 AS HUGEINT)) AS u
         |  FROM ps, tt),
         |z AS (SELECT sum(u) AS uz FROM uu)
         |SELECT source, CAST(ns AS BIGINT) AS n_bigrams,
         |  CAST(ls AS DOUBLE) / (CAST(ns AS DOUBLE) * 1000000000.0) AS fluency,
         |  CAST(ns AS DOUBLE) / CAST(ntot AS DOUBLE) AS old_share,
         |  CAST(u AS DOUBLE) / CAST(uz AS DOUBLE) AS new_weight,
         |  ltot*ns > ls*ntot AS upweighted
         |FROM uu, z""".stripMargin,
    "epoch_schedule" ->
      // same fixed-point normalizer as mix_temperature; every double
      // after zfp is a pinned chain of single IEEE ops in the same
      // order as the Spark side (share, then B·share, then /src_tok)
      s"""WITH d AS (SELECT source,
         |    CAST(len($WordToksSql) AS BIGINT) AS n_tok FROM documents),
         |s AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tok FROM d GROUP BY source),
         |t AS (SELECT CAST(sum(src_tok) AS BIGINT) AS total_tok FROM s),
         |w AS (SELECT source, src_tok, total_tok,
         |    CAST(floor(sqrt(CAST(src_tok AS DOUBLE) / CAST(total_tok AS DOUBLE))
         |               * 1000000000000.0) AS BIGINT) AS wfp
         |  FROM s, t),
         |z AS (SELECT CAST(sum(wfp) AS BIGINT) AS zfp FROM w),
         |e AS (SELECT source, src_tok,
         |    CAST(wfp AS DOUBLE) / CAST(zfp AS DOUBLE) AS temp_share,
         |    CAST(2 * total_tok AS DOUBLE)
         |      * (CAST(wfp AS DOUBLE) / CAST(zfp AS DOUBLE)) AS target_tok
         |  FROM w, z),
         |e2 AS (SELECT source, src_tok, temp_share, target_tok,
         |    target_tok / CAST(src_tok AS DOUBLE) AS epochs FROM e)
         |SELECT source, src_tok, temp_share, target_tok, epochs,
         |  least(epochs, CAST(4.0 AS DOUBLE)) AS epochs_capped,
         |  epochs > 4.0 AS over_cap,
         |  CASE WHEN epochs > 4.0
         |    THEN target_tok - 4.0 * CAST(src_tok AS DOUBLE)
         |    ELSE 0.0 END AS clipped_tok
         |FROM e2""".stripMargin,
    "sample_stratified" ->
      s"""WITH d AS (SELECT doc_id, lang,
         |    ${hash32Sql("lang || ':' || text")} % 100 AS bucket FROM documents)
         |SELECT doc_id, lang, bucket FROM d WHERE bucket < 10""".stripMargin,
    "weighted_sample" ->
      // DLT priority sampling: q = floor(w·2³²/(h+1)) in pure BIGINTs;
      // τ = min priority of the top-(k+1), 0 when the population ≤ k
      s"""WITH p AS (SELECT doc_id, greatest(n_chars, 1) AS weight,
         |    ${hash32Sql("CAST(doc_id AS VARCHAR)")} + 1 AS u
         |  FROM documents),
         |pr AS (SELECT doc_id, weight,
         |    (weight * 4294967296) // u AS priority FROM p),
         |top AS (SELECT * FROM pr ORDER BY priority DESC, doc_id LIMIT 101),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS cnt,
         |    min(priority) AS minp FROM top),
         |r AS (SELECT doc_id, weight, priority,
         |    row_number() OVER (ORDER BY priority DESC, doc_id) AS rn FROM top)
         |SELECT doc_id, weight, priority,
         |  greatest(weight,
         |    CASE WHEN st.cnt <= 100 THEN 0 ELSE st.minp END) AS est_weight
         |FROM r, st WHERE rn <= 100""".stripMargin,
    "pii_redact" ->
      // n_phones on the email-redacted text, matching the redaction order
      s"""WITH e AS (SELECT doc_id, text,
         |    regexp_replace(text, '${TextFunctions.EmailRe}', '<EMAIL>', 'g') AS er
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(text, '${TextFunctions.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(er, '${TextFunctions.PhoneRe}')) AS BIGINT) AS n_phones,
         |  length(regexp_replace(er, '${TextFunctions.PhoneRe}', '<PHONE>', 'g')) AS redacted_len
         |FROM e""".stripMargin,
    "repetition_score" ->
      s"""WITH w AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |shx AS (SELECT doc_id, unnest($ShingleSql) AS sh FROM w),
         |c AS (SELECT doc_id, sh, count(*) AS cnt FROM shx GROUP BY doc_id, sh)
         |SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_shingles,
         |  CAST(max(cnt) AS BIGINT) AS max_rep,
         |  CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS rep_ratio
         |FROM c GROUP BY doc_id""".stripMargin,
    "embed_quantize" ->
      s"""WITH x AS (SELECT vec_id,
         |    list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xd FROM embeddings),
         |s AS (SELECT vec_id, xd, list_min(xd) AS mn,
         |    (list_max(xd) - list_min(xd)) / 255.0 AS scale FROM x),
         |q AS (SELECT vec_id, xd, mn, scale,
         |    CASE WHEN scale = 0 THEN list_transform(xd, v -> CAST(0 AS BIGINT))
         |         ELSE list_transform(xd, v -> least(CAST(255 AS BIGINT),
         |             CAST(floor((v - mn) / scale) AS BIGINT))) END AS qv
         |  FROM s)
         |SELECT vec_id, CAST(len(qv) AS BIGINT) AS n_dims,
         |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
         |  CASE WHEN scale = 0 THEN 0.0
         |       ELSE list_max(list_transform(range(1, len(xd) + 1),
         |           i -> abs(xd[i] - (mn + (qv[i] + 0.5) * scale)))) END AS max_err
         |FROM q""".stripMargin,
    "winnow_fingerprint" ->
      s"""WITH $WinnowBody
         |SELECT doc_id, CAST(m AS BIGINT) AS n_kgrams,
         |  CAST(len(fps) AS BIGINT) AS n_fp,
         |  md5(array_to_string(list_transform(fps, x -> CAST(x AS VARCHAR)), ',')) AS fp_md5
         |FROM wf""".stripMargin,
    "winnow_overlap" ->
      // copied-span detection between LSH candidate pairs: shared
      // winnowing fingerprints guarantee any common substring of
      // length >= k+w-1 = 8 chars contributes overlap, char-level
      // signal shingle Jaccard dilutes
      s"""WITH $LshCandBody,
         |$WinnowBody
         |SELECT c.doc_a, c.doc_b,
         |  CAST(len(list_intersect(a.fps, b.fps)) AS BIGINT) AS n_common,
         |  CASE WHEN least(len(a.fps), len(b.fps)) = 0 THEN NULL
         |       ELSE CAST(len(list_intersect(a.fps, b.fps)) AS DOUBLE)
         |            / CAST(least(len(a.fps), len(b.fps)) AS DOUBLE) END AS overlap
         |FROM cand c JOIN wf a ON c.doc_a = a.doc_id JOIN wf b ON c.doc_b = b.doc_id""".stripMargin,
    "pack_sequences" ->
      s"""WITH d AS (SELECT doc_id,
         |    ${hash32Sql("text")} % 8 AS shard,
         |    CAST(len($WordToksSql) AS BIGINT) AS n_tok FROM documents),
         |s AS (SELECT doc_id, shard, n_tok,
         |    COALESCE(CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS start_tok
         |  FROM d)
         |SELECT doc_id, shard, n_tok, start_tok, start_tok // 512 AS bin FROM s""".stripMargin,
    "kcore_peel" -> {
      // 8 unconditional peel rounds over the symmetric LSH edge list —
      // the same function as the engine's fixpoint-or-8 loop, since
      // post-fixpoint rounds are no-ops
      // AS MATERIALIZED pins every round's frame: each ke/kn is referenced
      // three times, and inlining would re-derive the whole upstream chain
      // per reference (exponential documents re-scans — DuckDB runs out of
      // file handles before finishing)
      val rounds = (1 to 8).map { i =>
        s"""kn$i AS MATERIALIZED (SELECT src FROM ke${i - 1} GROUP BY src HAVING count(*) >= 2),
           |ke$i AS MATERIALIZED (SELECT e.src, e.dst FROM ke${i - 1} e
           |  WHERE e.src IN (SELECT src FROM kn$i)
           |    AND e.dst IN (SELECT src FROM kn$i))""".stripMargin
      }.mkString(",\n")
      s"""WITH $LshCandBody,
         |ke0 AS MATERIALIZED (SELECT doc_a AS src, doc_b AS dst FROM cand
         |        UNION ALL SELECT doc_b, doc_a FROM cand),
         |$rounds
         |SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS core_deg
         |FROM ke8 GROUP BY src""".stripMargin
    },
    "pack_efficiency" ->
      // the pack_sequences body rolled up twice: (shard, bin) partials
      // then the shard totals; two fixed-order IEEE divisions at the end
      s"""WITH d AS (SELECT doc_id,
         |    ${hash32Sql("text")} % 8 AS shard,
         |    CAST(len($WordToksSql) AS BIGINT) AS n_tok FROM documents),
         |s AS (SELECT doc_id, shard, n_tok,
         |    COALESCE(CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS start_tok
         |  FROM d),
         |pb AS (SELECT shard, start_tok // 512 AS bin,
         |    CAST(count(*) AS BIGINT) AS db, CAST(sum(n_tok) AS BIGINT) AS bt
         |  FROM s GROUP BY 1, 2),
         |pe AS (SELECT shard, CAST(sum(db) AS BIGINT) AS n_docs,
         |    CAST(sum(bt) AS BIGINT) AS total_tokens,
         |    max(bin) + 1 AS n_bins, max(db) AS max_docs_per_bin
         |  FROM pb GROUP BY shard)
         |SELECT shard, n_docs, total_tokens, n_bins,
         |  CAST(n_docs AS DOUBLE) / CAST(n_bins AS DOUBLE) AS avg_docs_per_bin,
         |  max_docs_per_bin,
         |  CAST(total_tokens AS DOUBLE) / CAST(n_bins * 512 AS DOUBLE) AS fill_rate
         |FROM pe""".stripMargin,
    "cheapest_supplier" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_price,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
        |  FROM lineitem GROUP BY 1, 2),
        |u AS (SELECT l_partkey, l_suppkey,
        |    CAST(sum_price AS DOUBLE) / CAST(sum_qty AS DOUBLE) AS unit_price FROM ps),
        |r AS (SELECT *, row_number() OVER (PARTITION BY l_partkey
        |    ORDER BY unit_price ASC, l_suppkey ASC) AS rk FROM u)
        |SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, r.unit_price
        |FROM r JOIN part p ON r.l_partkey = p.p_partkey
        |       JOIN supplier s ON r.l_suppkey = s.s_suppkey
        |WHERE r.rk = 1""".stripMargin,
    "salted_join" ->
      // the direct formulation — salting must not change the result
      """SELECT o_orderpriority, count(*) AS cnt,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
        |    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    "interval_join" ->
      // stated as a direct range-overlap join (the semantic definition);
      // the Spark side executes the bucketized-equijoin rewrite
      """WITH spans AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    min(ts) AS s, max(ts) AS e FROM events GROUP BY 1, 2),
        |inc AS (SELECT epoch_ms(ts) // 3600000 AS hour, count(*) AS n_ev
        |  FROM events GROUP BY 1 ORDER BY n_ev DESC, hour ASC LIMIT 3)
        |SELECT sp.user_id, sp.day,
        |  epoch_ms(sp.s) AS span_start_ms, epoch_ms(sp.e) AS span_end_ms,
        |  i.hour, i.n_ev
        |FROM spans sp JOIN inc i
        |  ON epoch_ms(sp.s) < (i.hour + 1) * 3600000
        | AND epoch_ms(sp.e) >= i.hour * 3600000""".stripMargin,
    "interval_join_outer" ->
      // the semantic definition is a direct LEFT JOIN on the range
      // predicate; the Spark side executes inner-matches UNION anti-join
      // (nulls for spans overlapping no incident hour)
      """WITH spans AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    min(ts) AS s, max(ts) AS e FROM events GROUP BY 1, 2),
        |inc AS (SELECT epoch_ms(ts) // 3600000 AS hour, count(*) AS n_ev
        |  FROM events GROUP BY 1 ORDER BY n_ev DESC, hour ASC LIMIT 3)
        |SELECT sp.user_id, sp.day,
        |  epoch_ms(sp.s) AS span_start_ms, epoch_ms(sp.e) AS span_end_ms,
        |  i.hour, i.n_ev
        |FROM spans sp LEFT JOIN inc i
        |  ON epoch_ms(sp.s) < (i.hour + 1) * 3600000
        | AND epoch_ms(sp.e) >= i.hour * 3600000""".stripMargin,
    "incremental_dedup" ->
      s"""WITH d AS (SELECT doc_id, md5($NormSql) AS fp FROM documents),
         |standing AS (SELECT DISTINCT fp FROM d WHERE doc_id % 4 <> 0),
         |fresh AS (SELECT doc_id, fp FROM d WHERE doc_id % 4 = 0)
         |SELECT doc_id, fp FROM fresh f
         |WHERE NOT EXISTS (SELECT 1 FROM standing s WHERE s.fp = f.fp)""".stripMargin,
    "corpus_profile" ->
      // fixed-point quality mean (floor(q*1e6) long sums) + dedup_exact's
      // fingerprint window + one rollup — every mean is a single IEEE
      // division over order-independent integer sums
      s"""WITH $QualityBody,
         |cp AS (SELECT doc_id, lang, source, n_tok, fp,
         |  CAST(floor(quality * 1000000.0) AS BIGINT) AS qfix FROM qq),
         |d AS (SELECT *, CASE WHEN doc_id != min(doc_id) OVER (PARTITION BY fp)
         |                     THEN 1 ELSE 0 END AS is_dup FROM cp)
         |SELECT lang, source, count(*) AS n_docs,
         |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         |  CAST(sum(n_tok) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_tokens,
         |  CAST(sum(qfix) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0) AS mean_quality,
         |  CAST(sum(is_dup) AS BIGINT) AS n_dups,
         |  CAST(sum(is_dup) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS dup_rate
         |FROM d GROUP BY lang, source""".stripMargin,
    "source_cap" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rnk
        |  FROM documents)
        |SELECT doc_id, source, n_chars, rnk FROM r WHERE rnk <= 15""".stripMargin,
    "token_budget_select" ->
      // greedy prefix under a token budget, stated as the naive global
      // running sum (the semantic definition); the Spark side executes
      // the banded distributed-cumsum rewrite, whose output is invariant
      // to where the band cutpoints fall
      s"""WITH $QualityBody,
         |b AS (SELECT CAST(floor(CAST(sum(n_tok) AS DOUBLE) * 0.4) AS BIGINT) AS budget FROM qq),
         |c AS (SELECT doc_id, quality, n_tok,
         |    CAST(sum(n_tok) OVER (ORDER BY quality DESC, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
         |  FROM qq)
         |SELECT doc_id, quality, n_tok, cum_tokens FROM c, b
         |WHERE cum_tokens <= budget""".stripMargin,
    "filter_cascade" ->
      // 2^4 pass/fail grid over the shared quality body + the lang_id
      // CASE + dedup_exact's fingerprint window; counts/sums are exact
      // BIGINTs, the only doubles are the shared IEEE quality formula
      s"""WITH $QualityBody,
         |fl AS (SELECT doc_id, $WordToksSql AS tokens FROM documents),
         |fh AS (SELECT doc_id,
         |  len(list_filter(tokens, x -> x IN ${inList("en")})) AS en_hits,
         |  len(list_filter(tokens, x -> x IN ${inList("es")})) AS es_hits,
         |  len(list_filter(tokens, x -> x IN ${inList("fr")})) AS fr_hits,
         |  len(list_filter(tokens, x -> x IN ${inList("de")})) AS de_hits
         |FROM fl),
         |fpp AS (SELECT doc_id,
         |  CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
         |       WHEN es_hits >= fr_hits AND es_hits >= de_hits AND es_hits > 0 THEN 'es'
         |       WHEN fr_hits >= de_hits AND fr_hits > 0 THEN 'fr'
         |       WHEN de_hits > 0 THEN 'de'
         |       ELSE 'und' END AS lang_pred
         |FROM fh),
         |fk AS (SELECT q.doc_id, q.lang, q.n_tok, q.text_len, q.quality,
         |    min(q.doc_id) OVER (PARTITION BY q.fp) AS keeper, p.lang_pred
         |  FROM qq q JOIN fpp p ON q.doc_id = p.doc_id)
         |SELECT (n_tok >= 30 AND text_len <= 20000) AS pass_len,
         |  (lang_pred = lang) AS pass_lang,
         |  (quality >= 0.6) AS pass_quality,
         |  (doc_id = keeper) AS pass_dedup,
         |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
         |FROM fk GROUP BY 1, 2, 3, 4""".stripMargin,
    "curation_manifest" ->
      // the composed curate run, stage by stage: quality gate (filter_
      // cascade's three predicates) → exact-fp keeper within survivors →
      // best surviving member per near-dup cluster → mix_sample rates
      // over the deduped corpus → 512-token packing; every count/sum is
      // an exact BIGINT. Heavy frames MATERIALIZED — each aN is read by
      // two manifest rows, and inlining would re-derive the recursive
      // cluster chain per reference.
      s"""WITH RECURSIVE $ClusterBody,
         |$QualityBody,
         |fl AS (SELECT doc_id, $WordToksSql AS tokens FROM documents),
         |fh AS (SELECT doc_id,
         |  len(list_filter(tokens, x -> x IN ${inList("en")})) AS en_hits,
         |  len(list_filter(tokens, x -> x IN ${inList("es")})) AS es_hits,
         |  len(list_filter(tokens, x -> x IN ${inList("fr")})) AS fr_hits,
         |  len(list_filter(tokens, x -> x IN ${inList("de")})) AS de_hits
         |FROM fl),
         |fpp AS (SELECT doc_id,
         |  CASE WHEN en_hits >= es_hits AND en_hits >= fr_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
         |       WHEN es_hits >= fr_hits AND es_hits >= de_hits AND es_hits > 0 THEN 'es'
         |       WHEN fr_hits >= de_hits AND fr_hits > 0 THEN 'fr'
         |       WHEN de_hits > 0 THEN 'de'
         |       ELSE 'und' END AS lang_pred
         |FROM fh),
         |cm AS MATERIALIZED (SELECT q.doc_id, q.lang, q.source, q.n_tok, q.text_len,
         |    q.quality, q.fp, p.lang_pred, d.text, d.n_chars
         |  FROM qq q JOIN fpp p ON q.doc_id = p.doc_id
         |  JOIN documents d ON q.doc_id = d.doc_id),
         |c1 AS MATERIALIZED (SELECT * FROM cm
         |  WHERE n_tok >= 30 AND text_len <= 20000 AND lang_pred = lang AND quality >= 0.6),
         |c2 AS MATERIALIZED (SELECT * FROM (
         |    SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keeper FROM c1)
         |  WHERE doc_id = keeper),
         |c3 AS MATERIALIZED (SELECT * FROM (
         |    SELECT c2.*, row_number() OVER (PARTITION BY cl.cluster
         |        ORDER BY c2.n_chars DESC, c2.doc_id) AS rn
         |    FROM c2 JOIN cl ON c2.doc_id = cl.doc_id)
         |  WHERE rn = 1),
         |cus AS (SELECT source, CAST(sum(n_tok) AS BIGINT) AS src_tok FROM c3 GROUP BY source),
         |cut AS (SELECT CAST(sum(src_tok) AS BIGINT) AS total_tok,
         |        CAST(count(*) AS BIGINT) AS n_src FROM cus),
         |cur AS (SELECT source, least(CAST(1.0 AS DOUBLE),
         |      (CAST(total_tok AS DOUBLE) / CAST(n_src AS DOUBLE)) / CAST(src_tok AS DOUBLE)) AS rate
         |  FROM cus, cut),
         |c4 AS MATERIALIZED (SELECT c3.* FROM c3 JOIN cur ON c3.source = cur.source
         |  WHERE CAST(${hash32Sql("c3.source || ':' || c3.text")} AS DOUBLE) / 4294967296.0 < cur.rate),
         |c5 AS MATERIALIZED (SELECT doc_id, n_tok,
         |    ${hash32Sql("text")} % 8 AS shard FROM c4),
         |c5b AS MATERIALIZED (SELECT shard,
         |    COALESCE(CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) // 512 AS bin
         |  FROM c5),
         |a0 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(COALESCE(sum(n_tok), 0) AS BIGINT) AS tok FROM cm),
         |a1 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(COALESCE(sum(n_tok), 0) AS BIGINT) AS tok FROM c1),
         |a2 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(COALESCE(sum(n_tok), 0) AS BIGINT) AS tok FROM c2),
         |a3 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(COALESCE(sum(n_tok), 0) AS BIGINT) AS tok FROM c3),
         |a4 AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS n,
         |  CAST(COALESCE(sum(n_tok), 0) AS BIGINT) AS tok FROM c4),
         |a5 AS (SELECT CAST(count(*) AS BIGINT) AS n FROM
         |  (SELECT DISTINCT shard, bin FROM c5b))
         |SELECT CAST(1 AS BIGINT) AS stage_ord, 'quality' AS stage,
         |  a0.n AS n_in, a1.n AS n_out, a0.tok AS tokens_in, a1.tok AS tokens_out FROM a0, a1
         |UNION ALL SELECT CAST(2 AS BIGINT), 'exact_dedup', a1.n, a2.n, a1.tok, a2.tok FROM a1, a2
         |UNION ALL SELECT CAST(3 AS BIGINT), 'neardup_keep', a2.n, a3.n, a2.tok, a3.tok FROM a2, a3
         |UNION ALL SELECT CAST(4 AS BIGINT), 'mix_sample', a3.n, a4.n, a3.tok, a4.tok FROM a3, a4
         |UNION ALL SELECT CAST(5 AS BIGINT), 'pack', a4.n, a5.n, a4.tok, a4.tok FROM a4, a5""".stripMargin,
    "source_divergence" ->
      // χ² over the top-100 head: zero-filled |sources|×100 grid, each
      // IEEE term quantized to micro-units BEFORE the per-source sum
      s"""WITH sdt AS (SELECT source, unnest($WordToksSql) AS tok FROM documents),
         |sdh AS (SELECT tok, CAST(count(*) AS BIGINT) AS ct
         |  FROM sdt GROUP BY tok ORDER BY ct DESC, tok LIMIT 100),
         |sds AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS o
         |  FROM sdt WHERE tok IN (SELECT tok FROM sdh) GROUP BY 1, 2),
         |sdn AS (SELECT source, CAST(sum(o) AS BIGINT) AS ns FROM sds GROUP BY source),
         |sdtot AS (SELECT CAST(sum(ct) AS BIGINT) AS nn FROM sdh),
         |sdg AS (SELECT n.source, n.ns, h.tok, h.ct, t.nn, s.o
         |  FROM sdn n CROSS JOIN sdh h CROSS JOIN sdtot t
         |  LEFT JOIN sds s ON s.source = n.source AND s.tok = h.tok),
         |sdterm AS (SELECT source, ns,
         |    CAST(floor((CAST(COALESCE(o, 0) AS DOUBLE) - CAST(ns AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE))
         |      * (CAST(COALESCE(o, 0) AS DOUBLE) - CAST(ns AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE))
         |      / (CAST(ns AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(nn AS DOUBLE))
         |      * 1000000.0) AS BIGINT) AS term_fp
         |  FROM sdg)
         |SELECT source, max(ns) AS n_head_tokens,
         |  CAST(count(*) - 1 AS BIGINT) AS df,
         |  CAST(sum(term_fp) AS BIGINT) AS chi2_fp,
         |  CAST(sum(term_fp) AS DOUBLE) / 1000000.0 AS chi2
         |FROM sdterm GROUP BY source""".stripMargin,
    "ngram_novelty" ->
      // distinct shingles per doc, 60-bit-hash first-owner attribution,
      // one integer-ratio division per doc
      s"""WITH nvw AS (SELECT doc_id, $WordToksSql AS ws FROM documents),
         |nvs AS (SELECT doc_id, unnest(list_distinct($ShingleSql)) AS sh FROM nvw),
         |nvh AS (SELECT doc_id, ${hash60Sql("sh")} AS h FROM nvs),
         |nvo AS (SELECT h, min(doc_id) AS owner FROM nvh GROUP BY h)
         |SELECT a.doc_id, count(*) AS n_shingles,
         |  CAST(sum(CASE WHEN o.owner = a.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
         |  CAST(sum(CASE WHEN o.owner = a.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS novelty
         |FROM nvh a JOIN nvo o ON a.h = o.h GROUP BY a.doc_id""".stripMargin,
    "path_topk" ->
      // two leads per user-ordered sequence, |types|^3 count, total-order
      // top-10 — (ts, event_id) is a strict order so both engines agree
      """WITH pl AS (SELECT user_id, event_type,
        |    lead(event_type, 1) OVER win AS e2,
        |    lead(event_type, 2) OVER win AS e3
        |  FROM events WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type AS step1, e2 AS step2, e3 AS step3,
        |  count(*) AS cnt
        |FROM pl WHERE e2 IS NOT NULL AND e3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY cnt DESC, step1, step2, step3 LIMIT 10""".stripMargin,
    "k_anonymity" ->
      """WITH g AS (SELECT lang, source, n_chars // 100 AS len_bucket,
        |    count(*) AS gsize
        |  FROM documents GROUP BY 1, 2, 3)
        |SELECT gsize, count(*) AS n_groups,
        |  CAST(gsize * count(*) AS BIGINT) AS n_docs,
        |  gsize < 5 AS at_risk
        |FROM g GROUP BY gsize""".stripMargin,
    "dominant_period" -> {
      // lag-swept Pearson autocorr (series_autocorr's integer-moment
      // formula per (series, lag)), argmax by the (r desc, lag) order
      val lags = ((1 to 48) ++ Seq(72, 96, 120, 144, 168)).mkString(", ")
      s"""WITH dm AS (SELECT event_type, epoch_us(ts) // 600000000 AS b,
         |            CAST(count(*) AS BIGINT) AS cnt,
         |            sum(CAST(value AS DECIMAL(18,2))) AS sdec
         |          FROM events GROUP BY 1, 2),
         |df2 AS (SELECT event_type, b,
         |        CAST(floor((CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE)) * 100.0) AS BIGINT) AS fp
         |      FROM dm),
         |dl AS (SELECT event_type, b, fp AS x, unnest([$lags]) AS lg FROM df2),
         |dj AS (SELECT a.event_type, a.lg, a.x, r2.fp AS y
         |       FROM dl a JOIN df2 r2
         |         ON a.event_type = r2.event_type AND r2.b = a.b + a.lg),
         |dg AS (SELECT event_type, lg, CAST(count(*) AS BIGINT) AS n,
         |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |        CAST(sum(x * y) AS BIGINT) AS sxy,
         |        CAST(sum(x * x) AS BIGINT) AS sxx,
         |        CAST(sum(y * y) AS BIGINT) AS syy
         |      FROM dj GROUP BY 1, 2),
         |ds AS (SELECT event_type, lg, n,
         |        CAST(n * sxy - sx * sy AS DOUBLE) /
         |          sqrt(CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)) AS r
         |      FROM dg
         |      WHERE n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0),
         |dr AS (SELECT *, row_number() OVER (PARTITION BY event_type
         |        ORDER BY r DESC, lg) AS rn FROM ds)
         |SELECT event_type, CAST(lg AS BIGINT) AS best_lag,
         |  n AS n_pairs, r AS autocorr
         |FROM dr WHERE rn = 1""".stripMargin
    },
    "holt_forecast" -> {
      // Brown's double smoothing: the series_ewma termwise kernel applied
      // twice (fp → s1q → s2q, exact floor-div requantization between
      // passes — numerators non-negative so // == div), then fixed-order
      // IEEE level/trend/forecast expressions
      val ws = AnalyticsQueries.EwmaWeights
      def lagDefs(src: String, pfx: String) = (1 until 8)
        .map(j => s"lag($src, $j) OVER win AS $pfx$j").mkString(",\n  ")
      def num(src: String, pfx: String) = (s"$src * ${ws(0)}" +:
        (1 until 8).map(j =>
          s"CASE WHEN $pfx$j IS NOT NULL THEN $pfx$j * ${ws(j)} ELSE 0 END"))
        .mkString(" + ")
      def den(pfx: String) = (s"${ws(0)}" +:
        (1 until 8).map(j =>
          s"CASE WHEN $pfx$j IS NOT NULL THEN ${ws(j)} ELSE 0 END"))
        .mkString(" + ")
      val lagNum = ws.zipWithIndex.map { case (wj, j) => wj * j }.sum
      val lagDen = ws.sum
      s"""WITH hm AS (SELECT event_type, epoch_us(ts) // 600000000 AS b,
         |            CAST(count(*) AS BIGINT) AS cnt,
         |            sum(CAST(value AS DECIMAL(18,2))) AS sdec
         |          FROM events GROUP BY 1, 2),
         |hmm AS (SELECT event_type, b,
         |         CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE) AS mv
         |       FROM hm),
         |hf AS (SELECT event_type, b, mv,
         |        CAST(floor(mv * 1000.0) AS BIGINT) AS fp FROM hmm),
         |hl AS (SELECT event_type, b, mv, fp,
         |  ${lagDefs("fp", "l")}
         |  FROM hf WINDOW win AS (PARTITION BY event_type ORDER BY b)),
         |h1 AS (SELECT event_type, b, mv,
         |        (${num("fp", "l")}) // (${den("l")}) AS s1q
         |      FROM hl),
         |h2l AS (SELECT event_type, b, mv, s1q,
         |  ${lagDefs("s1q", "m")}
         |  FROM h1 WINDOW win AS (PARTITION BY event_type ORDER BY b)),
         |h2 AS (SELECT event_type, b, mv, s1q,
         |        (${num("s1q", "m")}) // (${den("m")}) AS s2q
         |      FROM h2l)
         |SELECT event_type, b AS bucket, mv,
         |  CAST(s1q AS DOUBLE) / 1000.0 AS s1,
         |  CAST(s2q AS DOUBLE) / 1000.0 AS s2,
         |  CAST(2 * s1q - s2q AS DOUBLE) / 1000.0 AS level,
         |  CAST((s1q - s2q) * $lagDen AS DOUBLE) / ${lagNum * 1000}.0 AS trend,
         |  CAST(2 * s1q - s2q AS DOUBLE) / 1000.0 + CAST((s1q - s2q) * $lagDen AS DOUBLE) / ${lagNum * 1000}.0 AS forecast_next
         |FROM h2""".stripMargin
    },
    "bloom_prune" ->
      // md5-positioned k=4/m=65536 Bloom over urgent order keys, probed
      // by distinct lineitem keys; exact member/false-positive accounting
      s"""WITH bk AS (SELECT DISTINCT CAST(o_orderkey AS VARCHAR) AS k
         |  FROM orders WHERE o_orderpriority = '1-URGENT'),
         |bb AS (SELECT DISTINCT ${hash32Sql("CAST(bi AS VARCHAR) || ':' || k")} % 65536 AS pos
         |  FROM bk CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS bi) ii),
         |pk AS (SELECT DISTINCT CAST(l_orderkey AS VARCHAR) AS k FROM lineitem),
         |ph AS (SELECT k, ${hash32Sql("CAST(bi AS VARCHAR) || ':' || k")} % 65536 AS pos
         |  FROM pk CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS bi) ii),
         |hh AS (SELECT k, count(*) AS nh FROM ph
         |  WHERE pos IN (SELECT pos FROM bb) GROUP BY k),
         |fl AS (SELECT pk.k,
         |    COALESCE(hh.nh = 4, FALSE) AS pass_bloom,
         |    pk.k IN (SELECT k FROM bk) AS member
         |  FROM pk LEFT JOIN hh ON pk.k = hh.k)
         |SELECT count(*) AS n_probe_keys,
         |  CAST(sum(CASE WHEN pass_bloom THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_bloom,
         |  CAST(sum(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
         |  CAST(sum(CASE WHEN pass_bloom AND NOT member THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
         |  CASE WHEN count(*) > sum(CASE WHEN member THEN 1 ELSE 0 END)
         |       THEN CAST(sum(CASE WHEN pass_bloom AND NOT member THEN 1 ELSE 0 END) AS DOUBLE)
         |            / CAST(count(*) - sum(CASE WHEN member THEN 1 ELSE 0 END) AS DOUBLE)
         |       ELSE NULL END AS fp_rate
         |FROM fl""".stripMargin,
    "forecast_eval" ->
      // seasonal-naive backtest: milli-quantized bucket means joined to
      // their 144-bucket (1 day) lag; MAE/WAPE/bias as integer sums with
      // one fixed-order IEEE division each
      """WITH fm AS (SELECT event_type, epoch_us(ts) // 600000000 AS b,
        |            CAST(count(*) AS BIGINT) AS cnt,
        |            sum(CAST(value AS DECIMAL(18,2))) AS sdec
        |          FROM events GROUP BY 1, 2),
        |ff AS (SELECT event_type, b,
        |        CAST(floor((CAST(sdec AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1000.0) AS BIGINT) AS fp
        |      FROM fm),
        |fj AS (SELECT a.event_type, a.fp, p.fp AS pfp
        |       FROM ff a JOIN ff p
        |         ON a.event_type = p.event_type AND a.b = p.b + 144)
        |SELECT event_type, count(*) AS n_scored,
        |  CAST(sum(abs(fp - pfp)) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000.0 AS mae,
        |  CASE WHEN sum(abs(fp)) > 0
        |       THEN CAST(sum(abs(fp - pfp)) AS DOUBLE) / CAST(sum(abs(fp)) AS DOUBLE)
        |       ELSE NULL END AS wape,
        |  CAST(sum(fp - pfp) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 1000.0 AS bias
        |FROM fj GROUP BY event_type""".stripMargin,
    "join_size_est" ->
      // AMS/CMS self-join-size estimator: 3×4096 counter sketch, row
      // estimate Σc², min over rows vs the exact Σf² — all BIGINTs, one
      // final IEEE division for rel_err
      s"""WITH jk AS (SELECT CAST(l_partkey AS VARCHAR) AS k FROM lineitem),
         |jc AS (SELECT r, ${hash32Sql("CAST(r AS VARCHAR) || ':' || k")} % 4096 AS c,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM jk CROSS JOIN (SELECT unnest([0, 1, 2]) AS r) rr GROUP BY 1, 2),
         |je AS (SELECT r, CAST(sum(cnt * cnt) AS BIGINT) AS est FROM jc GROUP BY r),
         |jp AS (SELECT
         |    CAST(sum(CASE WHEN r = 0 THEN est END) AS BIGINT) AS est0,
         |    CAST(sum(CASE WHEN r = 1 THEN est END) AS BIGINT) AS est1,
         |    CAST(sum(CASE WHEN r = 2 THEN est END) AS BIGINT) AS est2,
         |    min(est) AS est
         |  FROM je),
         |jx AS (SELECT CAST(sum(f * f) AS BIGINT) AS exact
         |  FROM (SELECT count(*) AS f FROM lineitem GROUP BY l_partkey))
         |SELECT exact, est0, est1, est2, est,
         |  CAST(est - exact AS DOUBLE) / CAST(exact AS DOUBLE) AS rel_err
         |FROM jp, jx""".stripMargin,
    "session_agg" ->
      """WITH l AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |s AS (SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 3600000000 THEN 1 ELSE 0 END AS new_session
        |  FROM l),
        |c AS (SELECT user_id, ts,
        |    CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM s)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end
        |FROM c GROUP BY user_id, session_id""".stripMargin
  )
}
