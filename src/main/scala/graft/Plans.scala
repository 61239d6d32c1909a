package graft

import org.apache.spark.sql.SparkSession

import java.nio.file.{Files, Paths}

/** Dumps `explain("formatted")` for the headline queries into PLANS.md —
  * the physical-plan evidence for the scale design claims (pushdown,
  * pruning, broadcasts, no cartesians, WindowGroupLimit top-k).
  * Regenerate after planner-affecting changes:
  *   java -cp ... graft.Plans [sfDir] [outFile]
  */
object Plans {
  private val Headline = Seq(
    "filter_pushdown" -> "predicates + pruned schema reach the parquet scan",
    "q1_agg" -> "map-side partial aggregation, narrow ReadSchema",
    "window_agg" -> "parse once (no filter-pushdown double-parse), keyed window agg",
    "join_5way" -> "dims broadcast; single shuffle join on the natural key",
    "topk" -> "TakeOrderedAndProject, not a global sort",
    "knn_cosine" -> "query set broadcast; WindowGroupLimit prunes per-query top-k",
    "ann_ivf" -> "bounded-k centroid array broadcast (in-row argmax, no shuffle); nprobe=2; bucket equijoin",
    "minhash_lsh" -> "band-signature equijoin for candidates",
    "simhash_neardup" -> "64-bit signature, 4×16-bit band equijoin + exact Hamming",
    "phash_neardup" -> "image dHash: 4×16-bit band equijoin + exact Hamming; payload bytes never shuffle",
    "ngram_jaccard" -> "exact Jaccard re-rank over LSH candidates (doc_id equijoins)",
    "edit_distance_neardup" -> "prefix Levenshtein re-rank over LSH candidates",
    "salted_agg" -> "two-stage salted aggregation (salt visible in first exchange)",
    "tfidf_top" -> "WindowGroupLimit prunes per-doc top-3; vocabulary-sized df join",
    "dedup_clusters" -> "final label-propagation round: equijoin + keyed min, no cartesian",
    "embed_quantize" -> "pure per-row transform: scan → project, zero exchanges",
    "incremental_dedup" -> "anti-join on 32-hex fingerprints, text never shuffled",
    "pack_sequences" -> "one window-sort per shard; shard is the partition key",
    "winnow_fingerprint" -> "native WinnowFps rolling hash: scan → project, zero exchanges",
    "interval_join" -> "range overlap as bucketized equijoin + broadcast windows, no nested loop",
    "salted_join" -> "shuffled join keyed on (key, salt) — hot key spread over 16 tasks",
    "cheapest_supplier" -> "argmin-by-group: WindowGroupLimit rank-1, dims broadcast back",
    "boilerplate_ngrams" -> "shingle-keyed df join, never doc×doc; compact-key shuffles only",
    "funnel_steps" -> "per-type filters pushed to the scan; user-keyed equijoins, no whole-log window",
    "dedup_keep_best" -> "cluster-keyed window over the label join; one row per cluster out",
    "snapshot_diff" -> "full-outer equijoin of 40-byte fingerprint rows; text never shuffled",
    "above_avg_docs" -> "scalar subqueries precomputed as one-row results — no join (each instance is a pruned single-column agg scan)",
    "quantile_bins_scalable" -> "percentile cutpoints folded to one broadcast row; no Window, no Sort, no single-task stage",
    "bm25_top" -> "term-filtered explode before any shuffle; df + corpus stats broadcast; WindowGroupLimit top-10",
    "minhash_estimate" -> "signature self-join on candidate ids only; integer component-match count + exact Jaccard re-join",
    "kmeans_step" -> "Lloyd's update: posexplode to compact rows, one map-combinable (bucket, pos) shuffle",
    "kmeans_train2" -> "two training rounds: one-row centroid broadcasts, in-row argmax, no window anywhere",
    "semantic_neardup" -> "trained-bucket pair join (SemDeDup shape), pair space bounded by cell sizes",
    "quality_threshold_sweep" -> "10 thresholds from ONE scan of conditional aggregates — no fan-out, one row folded",
    "source_cap" -> "per-source cap: WindowGroupLimit prunes to ≤cap rows per source before the exchange",
    "token_budget_select" -> "banded distributed cumsum: unpartitioned window only on the 32-row band-totals frame",
    "corpus_profile" -> "two compact-key shuffles (fp window, rollup); text dies at the scan projection",
    "mix_sample" -> "per-source rates from one compact aggregation, broadcast back; keep decision is a narrow map",
    "rank_fusion" -> "both arms prune to top-50 via TakeOrderedAndProject before the fuse; final rank on ≤100 rows",
    "lm_score" -> "vocabulary-sized model tables; model joins keyed on compact bigram/token strings",
    "cluster_eval" -> "assignment is the zero-shuffle narrow map; centroids broadcast; (bucket)/(bucket,label) rollups only",
    "pca_power" -> "each matvec round: one-row vector broadcast, narrow per-row quantization, map-combinable (pos) shuffle",
    "vocab_coverage" -> "100-row vocabulary broadcast onto the token stream; doc-keyed rollup is the only corpus shuffle",
    "bpe_pairs" -> "pair explode over the VOCABULARY (never the corpus); top-50 via TakeOrderedAndProject",
    "ohlc_agg" -> "one map-combinable hash aggregate on (event_type, hour); struct extremes, no window, no self-join",
    "gap_fill" -> "raw scan folds to (series, bucket) partials map-side; windows partition by series over the bounded grid",
    "anomaly_zscore" -> "rolling-24 window per series over the compact mean frame, never over raw events",
    "token_lift" -> "vocabulary-sized count joins on compact token keys; top-50 via TakeOrderedAndProject",
    "embedding_outliers" -> "zero-shuffle trained assignment; bottom-k via TakeOrderedAndProject, rank window on 20 rows",
    "series_rate" -> "per-series lag over the compact mean frame; raw events fold map-side before any window",
    "seasonal_anomaly" -> "(series, hod) profile folded to 120 rows, broadcast back; no window anywhere",
    "series_correlation" -> "pair alignment joins two compact mean frames on bucket id (one broadcasts); moments are one hash aggregate",
    "rolling_median" -> "collect+sort window touches ≤24 BIGINTs per row of the bounded mean frame, partitioned by series",
    "series_autocorr" -> "per-series lag window over the compact mean frame; six BIGINT moments in one hash aggregate",
    "series_cusum" -> "per-series totals broadcast back; prefix + argmax windows partition by series over the bounded frame",
    "dup_matrix" -> "LSH-bounded candidate pairs; two compact doc_id→source equijoins; rollup keys on source pairs",
    "source_similarity" -> "mergeable per-source min-sketch folds map-side; exact side distincts compact (source, hash32) and equijoins on hash",
    "series_decompose" -> "centered rolling window per series over the bounded mean frame; 120-row detrended profile broadcasts back",
    "unpivot_stats" -> "one map-combinable series-keyed aggregation, then a single Expand — no join, no union re-scan",
    "cms_topk" -> "4096-key counter aggregation folds map-side; top-50 probe via TakeOrderedAndProject joins the broadcast counter table",
    "semantic_threshold_sweep" -> "IVF-bounded pair space; 13-way explode multiplies scalar cosines (embeddings dropped first), folds map-side to 13 rows",
    "cube_agg" -> "all four grouping sets in one Expand + single aggregation — the multiplier is the set count, not the data",
    "dup_triangles" -> "degree-oriented triangle join (wedges O(m^1.5) even on mega-cliques); two equijoins over the LSH-bounded edge list",
    "key_skew" -> "two map-combinable aggregations on compact keys: (series, user) partials then the series rollup",
    "ngram_containment" -> "same LSH-bounded candidate shape as ngram_jaccard: two doc_id equijoins + per-pair set intersect",
    "score_agreement" -> "both Spearman ranks via banded prefix-sum rank (token_budget_select's pattern) — band-local windows only, no corpus-global sort",
    "volume_anomaly" -> "rolling-24 count window per series over the compact bucket frame — anomaly_zscore's shape on BIGINT counts",
    "minhash_threshold_sweep" -> "LSH-bounded signature self-join; 12-way explode over a scalar frame folds map-side to 12 rows",
    "substring_dedup" -> "ONE tokenize (checkpointed token frame); 60-bit shingle hashes computed map-side, text never shuffles; count folds to (h, cnt) partials; h equijoin AQE-skew-splittable; islands in per-doc windows",
    "weighted_sample" -> "DLT priorities as a narrow map; top-(k+1) via TakeOrderedAndProject (per-partition heaps, no global sort); rank window on the checkpointed ≤101-row frame",
    "series_ewma" -> "termwise lag window per series over the compact mean frame — no frame aggregation, no corpus window",
    "winsorize" -> "per-series percentile cutpoints fold map-side to a series-count frame, broadcast back; clamp is a narrow map — no window, no sort",
    "robust_zscore" -> "median/MAD picks fold to two series-count frames, broadcast back; score is a narrow map — no window, no sort",
    "cluster_terms" -> "trained assignment broadcast-argmax (kmeans chain); (bucket, tok)/(tok) vocabulary-scale counts; WindowGroupLimit top-3 per cluster",
    "srp_neardup" -> "hyperplane signature at the scan (native kernel, 8 bytes out per vector); 8×8-bit band equijoin; exact-cosine confirm joins embeddings back by vec_id",
    "lsh_recall" -> "truth pairs via shingle-hash co-occurrence equijoin (audit-scoped, never all-pairs); candidate membership by canonical pair-key equijoin; 9 thresholds fold from one pair frame",
    "ann_recall_nprobe" -> "one assignment at max nprobe; 3-row level frame broadcast-gates probe ranks; bucket equijoin only — level fan-out never touches the corpus side",
    "incremental_neardup" -> "served from the persisted signature index: both join sides are (band, sig) posting scans, ZERO document text in the plan; delta side filtered at the scan",
    "ann_ivf_trained" -> "trained-centroid routing: two Lloyd's rounds of one-row broadcasts + in-row argmax, then the same bucket equijoin as ann_ivf — training never changes the search plan",
    "hash_embed" -> "tokenize -> narrow per-token hash math -> ONE map-combinable (doc, bucket) aggregation; dense 32-cell assembly is an in-row map fold, no join, no text shuffle",
    "interval_join_outer" -> "inner bucketized matches UNION compact-key anti-join — outer-over-interval without a nested loop",
    "lsh_bucket_skew" -> "one map-combinable (band, sig) count + TakeOrderedAndProject top-10 — the posting-list heat audit costs one signature pass, no join",
    "dist_drift" -> "time bounds + per-type value grids broadcast; ONE map-combinable (type, bin) aggregation; L1 folds exact rationals, one terminal division",
    "ivfpq_ann" -> "coarse route is the zero-shuffle broadcast-argmax; corpus query payload is 4 residual-PQ code ints per vector; per-(query, probed-bucket) ADC tables broadcast; candidates from the bucket equijoin",
    "semantic_keep" -> "SemDeDup keeper election: labels equijoin onto the trained assignment, component-keyed WindowGroupLimit pick — dedup_keep_best's shape on the embedding graph",
    "span_excise" -> "the substring-dedup REWRITE: tokens anti-join spans on (doc_id, range); kept stream rebuilt in one per-doc aggregation — text never a shuffle key, no global sort",
    "neardup_families" -> "three LSH/band-bounded pair sets, pair-key semi-join overlaps, one-row aggregates assembled by broadcast cross-joins — the 3-row agreement report",
    "filter_cascade" -> "one corpus scan; the fp window (32-hex key, text dropped) is the only corpus shuffle; 16-group hash aggregate out",
    "join_size_est" -> "fixed 3×4096 sketch folds map-side (shuffle ≤ 12288 rows per partition at ANY scale); exact side is one compact-key agg; two 1-row frames crossed",
    "bloom_prune" -> "bit-set (distinct positions) and member keys broadcast; probe explode + broadcast semi-join — the probe side never shuffles",
    "forecast_eval" -> "season-lag alignment equijoin on (series, bucket) compact keys over the bounded mean frame; per-series integer-sum scoring",
    "holt_forecast" -> "two termwise lag windows per series over the compact mean frame — series_ewma's shape applied twice",
    "dominant_period" -> "lag sweep multiplies the COMPACT mean frame, alignment is a (series, bucket+lag) equijoin; rank window sees |series|×|lags| rows",
    "kcore_peel" -> "final peel round: map-combinable degree count + two semi-joins on compact doc ids; the edge list only shrinks",
    "pack_efficiency" -> "two hash aggregations over the compact pack frame; the only window is pack_sequences' per-shard cumsum",
    "path_topk" -> "user-keyed lead windows; |types|^3-bounded count; top-10 via TakeOrderedAndProject",
    "k_anonymity" -> "two compact hash aggregations — QI group sizes then the size histogram; text never read",
    "ngram_novelty" -> "shingle text dies at the map — only (doc_id, 60-bit hash) shuffles; ownership is a map-combinable min; join keys on the hash",
    "source_divergence" -> "100-row head broadcast; per-(source, token) counts fold map-side; zero-filled grid is |sources|×100",
    "pca_project" -> "projection is a narrow map under a one-row unit-vector broadcast; histogram is a (bin, label) hash aggregate",
    "zorder_prune" -> "3-column scan; maxima fold to ONE broadcast row; per-(layout, file) minmax is a ≤512-group map-combined aggregate — no sort, no wide shuffle",
    "rolling_actives" -> "raw stream dedupes to the compact (type, user, hour) frame FIRST; ≤24× fan-out on integer keys, window hours semi-join a ≤|hours| broadcast — never a time-range self-join",
    "linear_probe" -> "closed-form training: nine integer moments fold map-side to ONE row; Cramer in exact decimal; the scoring pass re-scans under the one-row coefficient broadcast",
    "bpe_train" -> "corpus text read ONCE (word census, checkpointed); each merge round is vocabulary-sized work under a one-row winner broadcast — no driver collect, no corpus re-scan",
    "theil_sen" -> "pair space is C(|hours|, 2) per series — bounded by the time span, never the corpus; rank window partitions by series; raw events fold map-side to the hour frame first",
    "pareto_front" -> "skyline WITHOUT the O(n²) dominance self-join: per-(segment, date) min folds map-side, running-min window over the calendar-bounded frame, compact equijoin back",
    "value_runs" -> "every window partitions by user: lag/cumsum islands, then one lead over the per-user RUN frame (smaller than the stream) — no global sort, no self-join",
    "compress_ratio" -> "native codegen DeflateSize at the scan — one pass, zero shuffle until the 16-bin histogram fold; the corpus profile, not raw rows, is the result",
    "ncd_neardup" -> "LSH-bounded candidates only (never doc×doc); per-doc C(x) computed once pre-join; each pair pays ONE extra deflate — text joins by doc_id, bodies never shuffle keys",
    "filtered_ann" -> "predicate prunes BEFORE any distance computes (filter-first, never post-filter); queries broadcast; WindowGroupLimit top-k per query",
    "prefix_join" -> "candidates from the RAREST-shingle prefixes only (df² on prefix occurrences, never the corpus co-occurrence join the oracle runs); verification intersects per-doc arrays in-row",
    "cuped_ab" -> "one conditional per-user aggregation under a one-row midpoint broadcast; pooled moments fold to ONE row, broadcast over the 2-row variant aggregate",
    "ab_ztest" -> "one per-(user, day) conditional aggregation folds to a single row — no joins at all; z and SRM are fixed-order IEEE ops on four counts",
    "source_centroids" -> "ONE corpus posexplode fold to the (sources × dims) frame; corpus sums re-aggregate that compact frame — the corpus is never scanned twice; cosine on exact integer sums",
    "activity_gini" -> "per-(type, user) counts fold map-side; the only window runs over the DISTINCT-COUNT histogram frame (bounded by max activity, not by users), partitioned by type",
    "mann_whitney" -> "per-(type, centi-value, variant) counts fold map-side; the rank window runs over the DOMAIN-bounded histogram, never a per-event frame",
    "ks_test" -> "same domain-bounded histogram shape; CDF cross-multiplication keeps D's numerator in exact BIGINTs, one terminal division",
    "mrl_recall" -> "both retrieval passes share the broadcast-query + WindowGroupLimit shape; shuffles carry (qid, vid, cos) triples, never vectors",
    "benford_audit" -> "one map-combinable 45-group aggregation over the scan; expectation and totals are ≤9-row broadcasts",
    "incremental_stats" -> "day-grain partial states (the IVM materialization) merge by re-aggregation — both halves map-side combine; union shuffles only types×days partial rows",
    "upsert_merge" -> "per-key argmax via mergeable max(struct) both sides; base/delta full-outer join co-partitions on the shared grouping key",
    "link_predict" -> "wedge equijoin over the IVF-bounded near-dup edge list (Σdeg² bucket-bounded, never corpus²); known edges anti-joined; degree joins on compact vec ids",
    "model_auc" -> "scoring pass under the one-row coefficient broadcast; the 2U window ranks only the DOMAIN-bounded (≤1e6-cell) score histogram",
    "calibration_bins" -> "min/max fold to one broadcast row; binning is integer arithmetic in a narrow map; one 10-group map-combinable rollup",
    "embedding_isotropy" -> "one posexplode fold to a 64-row dims frame + one squared-norm fold — both map-combinable; nothing downstream exceeds 64 rows",
    "conversion_lag" -> "two per-user min aggregations (map-combinable) + a 7-group rollup; no window, no raw-stream self-join",
    "dup_modularity" -> "IVF-bounded edge list; label joins on vec_id; degree/internal folds to a labels-sized frame under a one-row m broadcast",
    "sample_mean_ci" -> "deterministic md5-nibble sample is a narrow map at the scan; both passes map-combinable per-type folds; no shuffle grows with the corpus",
    "attribution_linear" -> "user-keyed touch-purchase equijoin (pairs bounded by per-user activity); k via a pid-partitioned window in ONE pass over the pair frame",
    "cohort_value" -> "one (user → first week) map-combinable fold; cumulative window partitions by cohort over the calendar-bounded weeks grid",
    "rfm_segments" -> "per-user fold; three cutpoint arrays in ONE broadcast row; binning is a narrow map; ≤64-group rollup — no window, no sort",
    "markov_eval" -> "per-user lag pairs; |types|²-bounded model broadcast onto the test rollup; midpoint is a one-row broadcast",
    "schema_integrity" -> "each table's pk + fk checks fold in ONE aggregate over one scan; parents join as distinct single-column key frames (dims broadcast)",
    "ivf_balance" -> "zero-shuffle assignment map → one (bucket → count) fold → k-row rollup; nothing exceeds k rows after the first fold",
    "heaps_law" -> "cumulative distinct via (tok → first doc) vocabulary fold; 10-row cutoff broadcast fans out only compact frames; ≤10 groups after",
    "cluster_split" -> "checkpointed compact (doc, cluster) frame; both split arms are narrow md5 maps; every fold after keys on cluster ids",
    "bootstrap_ci" -> "one-pass Poisson bootstrap: 2B conditional integer sums fold map-side in ONE aggregation — zero fan-out; the sort ranks a B-element in-row array",
    "ivfpq_ann_served" -> "train-once serving: routing + ADC from the PERSISTED index (no training in the plan); postings scan dynamic-partition-pruned to the probed buckets",
    "decile_lift" -> "activity deciles from ONE broadcast percentile-cutpoint row (no global sort); the only window orders the 10-row decile frame",
    "t_closeness" -> "checkpointed (QI, lang) cell frame feeds all four consumers — corpus scanned once; global-lang and 1-row total frames broadcast; decile is ten DECIMAL(38) comparisons, no division",
    "epoch_schedule" -> "checkpointed |sources|-row token fold — corpus tokenized once; everything after is arithmetic on that frame under two 1-row broadcasts",
    "domain_reweight" -> "lm_score's compact bigram-keyed model shuffles; checkpointed |sources|-row loss fold; DECIMAL(38) weight update under two 1-row broadcasts",
    "ann_ivf_appended" -> "serving over the incrementally-grown index: no training in the plan; postings scan dynamic-partition-pruned to probed buckets (append wrote only touched bucket dirs)",
    "cross_shard_dup" -> "LSH-bounded pairs + two compact (doc_id -> shard, fp) equijoins; <=4 rows out, no cartesian",
    "quality_vs_dup" -> "LSH-bounded degree fold joined doc_id-keyed onto one quality scan; BIGINT micro-quantized sums, <=4 rows out",
    "ann_ndcg" -> "both retrieval arms keep their bounded shapes (broadcast-query scan, bucket equijoin); (qid, vid) equijoin; 10 rows out",
    "ivfpq_ann_appended" -> "composite-index serving after append: no training in the plan (stored centroids + codebooks); postings scan dynamic-partition-pruned to probed buckets",
    "ann_ivf_merged" -> "serving over the shard-merged index: same pruned-serving shape (merge re-routed shard B through the stored shard-A centroids at merge time, not query time)",
    "ivfpq_rerank" -> "checkpoint-fed <=|Q|*k' ADC shortlist broadcast onto ONE column-pruned vector-store scan; exact-cosine re-rank is broadcast-only, shuffle-free, training-free",
    "bm25_served" -> "lexical serving: STATIC slot IN (...) partition filters on lexicon AND postings (driver-computed term slots); no documents scan, no df pass; WindowGroupLimit top-10",
    "bm25_maxscore" -> "MaxScore pruning: checkpoint-materialized term scores consumed by candidate-bounded semi-joins; the unpruned answer's plan shape with fewer aggregated docs",
    "hybrid_served" -> "RRF from TWO persisted indexes: slot-pruned BM25 arm + stored-centroid IVF arm; both TakeOrderedAndProject to 50 rows before the <=100-row fuse",
    "bm25_maxp" -> "max-passage: chunk-level slot-pruned serving; per-doc argmax via WindowGroupLimit rank-1; top-10 docs via TakeOrderedAndProject",
    "filtered_ann_served" -> "index-served faceted ANN: attrs sidecar read partition-pruned to ONE label directory, semi-joined into the probed buckets' postings BEFORE cosine/top-k (filter-first); no corpus scan",
    "ivfpq_ann_filtered" -> "faceted COMPRESSED serving: the same label-pruned allowlist screens the code postings before the ADC join; no raw vector, no corpus scan",
    "bm25_filtered_source" -> "source facet: allowlist read pruned at the attrs tree's SECOND partition level (source= leaves); corpus never in the plan",
    "hybrid_filtered" -> "hybrid + facet: ONE partition-pruned allowlist read screens BOTH arms before their rank windows (ranks are within-facet); arms still TakeOrderedAndProject to 50",
    "incremental_neardup_filtered" -> "faceted near-dup serving (4th family): lang-pruned attrs allowlist semi-joins the signature scan BEFORE the band equijoin; both pair sides facet-screened compact keys, zero document text in the plan",
    "facet_profile" -> "the facet-tree pre-flight: one map-combinable aggregate over the sidecar's partition columns + doc_id — the corpus is not in the plan, no text byte read",
    "vec_facet_profile" -> "the vector families' pre-flight, two-axis since vec-v3: ReadSchema struct<> — the histogram folds from the (label, source) partition metadata alone, zero data columns read",
    "ivfpq_facet_profile" -> "the composite family's twin over its own sidecar: same ReadSchema struct<> contract — the PQ writers' facet maintenance audited at zero data-column cost",
    "lsh_facet_profile" -> "the near-dup family's twin over its doc-keyed (lang, source) sidecar: same ReadSchema struct<> contract"
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.lift(1).getOrElse("/root/repo/PLANS.md")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxMetadataStringLength", "200")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — physical plans of the headline queries\n\n")
    sb.append(s"Generated by `graft.Plans` over `$sfDir`. The evidence for the\n")
    sb.append("scale-design claims in COVERAGE.md/README.md.\n")
    Headline.foreach { case (name, note) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name — $note\n\n```\n")
      sb.append(plan.take(12000))
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
