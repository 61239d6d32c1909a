package graft.queries

import graft.functions.TextFunctions._
import graft.sources.Tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-data-pipeline text operators over the `documents` table: exact
  * dedup, token/statistics profiling, language ID, quality scoring,
  * fingerprinting, SimHash. Each is a `queries()` entry with a DuckDB
  * oracle recomputing the same deterministic derivation.
  *
  * Scale notes (100 TB): every query here is a single scan + narrow
  * map-side work + one hash shuffle on a compact key (md5 or doc_id) —
  * no cross joins, no global sorts, no driver-side collection. Dedup
  * partitions by the 32-hex md5 of the normalized text, never by the text
  * itself (shuffling full document bodies as keys would dominate the
  * exchange).
  */
object TextQueries {

  /** Exact dedup mapping: every doc → the minimal doc_id sharing its
    * normalized-text fingerprint. Window-min over the fingerprint
    * partition; `is_dup` marks rows a dedup pass would drop. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("fp", md5(normText(col("text"))))
    val w = Window.partitionBy(col("fp"))
    docs
      .withColumn("keeper", min(col("doc_id")).over(w))
      .withColumn("is_dup", col("doc_id") =!= col("keeper"))
      .select(col("doc_id"), col("keeper"), col("is_dup"))
  }

  /** Duplicated-SUBSTRING span profile — the exact-substring complement
    * to document-level dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better": duplicated spans inside
    * otherwise-unique documents are the dominant leak once whole-doc
    * dups are gone). Every 5-token shingle occurring more than once in
    * the corpus (across OR within documents — internal boilerplate
    * repeats are duplication too) marks its 5 tokens as duplicated;
    * overlapping/adjacent duplicated shingles merge into maximal spans
    * per document. Output: per-doc span count, duplicated-token count,
    * and duplicated fraction — the frame a span-excision pass consumes.
    *
    * Exactness: positions and counts are pure BIGINTs; shingles compare
    * by the md5-derived 60-BIT hash in BOTH engines (a cross-shingle
    * hash collision merges the same pair on both sides — and the width
    * matters: 2³² buckets saturate by birthday collision near 10⁵
    * distinct shingles and would mark essentially every position
    * duplicated at corpus scale; 2⁶⁰ keeps expected collisions for
    * 10¹⁰ shingles below 10²); `dup_frac` is one division of exact
    * integers.
    *
    * Scale (100 TB): the shingle TEXT never leaves the map — only
    * (doc_id, pos, h) rows shuffle, keyed by the compact hash. The
    * occurrence count is a map-side-combinable groupBy (NOT a window
    * over the h partition: a boilerplate mega-shingle would funnel its
    * whole postings list through one task; partial aggregation absorbs
    * it, and the join back is AQE-skew-splittable). Island merging runs
    * in per-document windows. The tokenized frame is materialized ONCE
    * (localCheckpoint) and feeds all three consumers — count branch,
    * probe branch, per-doc totals — so the corpus pays one regex
    * tokenize, not three (measured 2.20 vs 2.75 s at sf0.1); a
    * long-running 1000-executor job would swap the non-resilient
    * localCheckpoint for a materialized tokenized/shingle TABLE, which
    * is how the multi-pass substring-dedup pipelines run in production
    * anyway. This is the distributed restatement of the suffix-array
    * pass: O(tokens) rows, equijoins on 8-byte keys, no doc×doc
    * anywhere. */
  def substringDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = tokenizedDocs(spark, dir)
    val spans = dupSpanFrame(docs)
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("en") - col("st") + 1).as("dup_tokens"))
    docs.select(col("doc_id"), col("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .withColumn("dup_frac",
        when(col("n_tokens") > 0,
          col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** The (doc_id, ws, n_tokens) token frame, materialized ONCE
    * (localCheckpoint) — the shared input of [[substringDedup]] and
    * [[spanExcise]]: every consumer re-derives from cheap array ops on
    * this frame instead of re-running the regex tokenize (measured 2.20
    * vs 2.75 s at sf0.1); a long-running 1000-executor job would swap
    * the non-resilient localCheckpoint for a materialized tokenized
    * TABLE, which is how multi-pass substring-dedup pipelines run in
    * production anyway. */
  private def tokenizedDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("ws", wordTokens(col("text")))
      .select(col("doc_id"), col("ws"),
        size(col("ws")).cast("long").as("n_tokens"))
      .localCheckpoint(true)

  private val SpanK = 5

  /** Maximal duplicated-token spans per document — (doc_id, island, st,
    * en) in 1-based token positions: every [[SpanK]]-token shingle
    * occurring more than once in the corpus marks its tokens duplicated;
    * overlapping/adjacent marks merge via per-doc gaps-and-islands. The
    * hash is computed inside the projection so only compact (doc_id,
    * pos, 60-bit h) rows reach any exchange; the occurrence count is a
    * map-side-combinable groupBy (NOT a window over the h partition: a
    * boilerplate mega-shingle would funnel its postings through one
    * task; partial aggregation absorbs it, and the join back is
    * AQE-skew-splittable). */
  /** The 1-based shingle-start frame (doc_id, pos, 60-bit h) — hashes
    * computed inside the projection so only compact keys reach any
    * exchange. */
  private def shingleStarts(docs: DataFrame): DataFrame = {
    val K = SpanK
    docs
      .where(size(col("ws")) >= K)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("ws")) - (K - 1)),
          i => md5Hash60(concat_ws(" ", slice(col("ws"), i, lit(K)))))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("h"))
  }

  /** Merge duplicated shingle-start marks (doc_id, pos) into maximal
    * spans via per-doc gaps-and-islands. */
  private def islandsOf(marks: DataFrame): DataFrame = {
    val K = SpanK
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marks
      .withColumn("prev_end",
        max(col("pos") + (K - 1)).over(wDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("prev_end").isNull || col("pos") > col("prev_end") + 1, 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("ni")).over(wDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("st"), (max(col("pos")) + (K - 1)).as("en"))
  }

  private def dupSpanFrame(docs: DataFrame): DataFrame = {
    // materialize the shingle-start frame once: the count branch and the
    // mark branch otherwise each re-run the per-shingle md5Hash60 pass
    // (compact (doc_id, pos, h) rows — token-count-sized, never text)
    val sh = shingleStarts(docs).localCheckpoint(true)
    val dupCounts = sh.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > 1)
      .select(col("h"))
    islandsOf(sh.join(dupCounts, "h"))
  }

  /** The keep-ONE-occurrence span frame: each duplicated shingle elects
    * its lexicographically-first occurrence (min (doc_id, pos) — a
    * map-side-combinable struct min, no window over the hot h
    * partition); only NON-elected occurrences mark their tokens. The
    * elected copy survives, so excising these spans deduplicates the
    * corpus without losing content entirely — Lee et al. 2022's actual
    * policy, where [[dupSpanFrame]]'s drop-all form is the conservative
    * profile. */
  private def dupSpanFrameKeepOne(docs: DataFrame): DataFrame = {
    // same one-materialization as dupSpanFrame: election + marks both
    // read the shingle-start frame
    val sh = shingleStarts(docs).localCheckpoint(true)
    val elected = sh.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      .where(col("cnt") > 1)
      .select(col("h"),
        col("first").getField("doc_id").as("e_doc"),
        col("first").getField("pos").as("e_pos"))
    val marks = sh.join(elected, "h")
      .where(!(col("doc_id") === col("e_doc") && col("pos") === col("e_pos")))
      .select(col("doc_id"), col("pos"))
    islandsOf(marks)
  }

  /** Span EXCISION — the rewrite step [[substringDedup]]'s profile
    * feeds (Lee et al. 2022 run exactly this pass over their
    * suffix-array spans): drop every token inside a duplicated span and
    * emit the cleaned document's token count plus the md5 fingerprint
    * of the kept token stream (position order). The fingerprint is the
    * handoff artifact: a downstream exact-dedup pass over cleaned docs
    * keys on it, and the oracle recomputes it byte-for-byte, which
    * pins the ENTIRE rewrite (any dropped/kept/reordered token changes
    * the hash). Conservative policy: all occurrences of a duplicated
    * span are excised (keep-one-occurrence needs a global occurrence
    * election — a keyed min over the h groups — and changes no
    * plumbing).
    *
    * Scale (100 TB): tokens and spans meet in a doc_id equijoin with a
    * per-doc range predicate (spans per doc are few and bounded by
    * n_tokens/K); the rebuild is one per-doc aggregation of compact
    * (pos, token) structs — text bodies never shuffle as keys, and no
    * global sort exists anywhere. */
  def spanExcise(spark: SparkSession, dir: String): DataFrame = {
    val docs = tokenizedDocs(spark, dir)
    exciseSpans(docs, dupSpanFrame(docs))
  }

  /** [[spanExcise]] under the keep-one-occurrence policy
    * ([[dupSpanFrameKeepOne]]): a duplicated run's FIRST occurrence
    * (min (doc_id, pos) per shingle) keeps its tokens; all later copies
    * excise. Corpus-wide, each duplicated substring survives exactly
    * where it first appeared — the rewrite that deduplicates without
    * deleting content outright. Same plan shape as [[spanExcise]] plus
    * one struct-min aggregation. */
  def spanExciseKeepOne(spark: SparkSession, dir: String): DataFrame = {
    val docs = tokenizedDocs(spark, dir)
    exciseSpans(docs, dupSpanFrameKeepOne(docs))
  }

  /** Rebuild each doc's kept token stream outside `spans` and emit
    * (doc_id, n_tokens, kept_tokens, clean_fp) — shared by both
    * excision policies. */
  private def exciseSpans(docs: DataFrame, spanFrame: DataFrame): DataFrame = {
    val spans = spanFrame.select(col("doc_id").as("s_doc"), col("st"), col("en"))
    val toks = docs
      .select(col("doc_id"), posexplode(col("ws")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        col("col").as("tok"))
    val kept = toks
      .join(spans,
        col("doc_id") === col("s_doc") && col("pos").between(col("st"), col("en")),
        "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("kept_tokens"),
        md5(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            p => p("tok")))).as("clean_fp"))
    docs.select(col("doc_id"), col("n_tokens"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        coalesce(col("clean_fp"), md5(lit(""))).as("clean_fp"))
  }

  /** Zipf rank-frequency profile: the top-100 corpus vocabulary by
    * frequency with each term's `cnt·rank` product — Zipf's law predicts
    * the product is roughly constant, and a corpus whose head deviates
    * hard (product collapsing with rank) is template/boilerplate-heavy
    * rather than natural text; the one-page distribution sanity check
    * beside [[topTerms]]' per-language heads. Pure integer counts; the
    * rank window runs AFTER the top-100 TakeOrderedAndProject prune
    * (the `rank_fusion` discipline — bounded frame, no corpus window).
    *
    * Scale: one map-combinable vocabulary count, a per-partition-heap
    * top-k, a 100-row window. */
  def tokenZipf(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(explode(wordTokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok").asc)
      .limit(100)
    counts
      .withColumn("rk",
        row_number().over(Window.orderBy(col("cnt").desc, col("tok").asc)).cast("long"))
      .select(col("rk"), col("tok"), col("cnt"),
        (col("cnt") * col("rk")).as("cnt_x_rank"))
  }

  /** Per-document token statistics: counts, distinct counts, exact mean
    * token length (integer sum ÷ count through double — deterministic). */
  def textStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("tokens", wordTokens(col("text")))
      .select(
        col("doc_id"),
        col("lang"),
        // DuckDB len()/length() are BIGINT — match the oracle's types
        length(col("text")).cast("long").as("text_len"),
        size(col("tokens")).cast("long").as("n_tokens"),
        size(array_distinct(col("tokens"))).cast("long").as("n_distinct_tokens"),
        (aggregate(transform(col("tokens"), t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).cast("double") /
          when(size(col("tokens")) === 0, lit(null))
            .otherwise(size(col("tokens"))).cast("double"))
          .as("avg_token_len")
      )

  /** BPE-ish token counting (letter runs / digit runs / punctuation). */
  def tokenCount(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("toks", bpeTokens(col("text")))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_bpe_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct_bpe")
      )

  /** k-anonymity audit over the quasi-identifier tuple (lang, source,
    * 100-char length bucket): the size distribution of QI groups, with
    * the under-5 groups flagged — documents in a group of size 1 are
    * re-identifiable by their metadata alone even after [[piiRedact]]
    * scrubs the text (Sweeney's k-anonymity, the standard release-risk
    * read before publishing a corpus). One scan, two compact hash
    * aggregations: (QI) group sizes, then the size histogram. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), col("source"),
        expr("n_chars div 100").as("len_bucket"))
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).as("gsize"))
      .groupBy(col("gsize"))
      .agg(count(lit(1)).as("n_groups"))
      .select(col("gsize"), col("n_groups"),
        (col("gsize") * col("n_groups")).as("n_docs"),
        (col("gsize") < 5).as("at_risk"))

  /** l-diversity audit — [[kAnonymity]]'s companion (Machanavajjhala et
    * al. 2007): a QI group can be large (k-anonymous) yet expose its
    * members if every row shares the SAME sensitive value, so per QI
    * group (source, 100-char length bucket) count the DISTINCT
    * sensitive values (lang — deliberately excluded from this QI), and
    * report the distribution of diversity levels with the l = 1 groups
    * flagged: everyone in such a group is known to share that lang.
    *
    * Scale: one scan, two compact hash aggregations — (QI) distinct
    * fold, then the ≤|langs|-row level histogram. */
  def lDiversity(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), expr("n_chars div 100").as("len_bucket"), col("lang"))
      .groupBy(col("source"), col("len_bucket"))
      .agg(countDistinct(col("lang")).as("l"), count(lit(1)).as("gsize"))
      .groupBy(col("l"))
      .agg(count(lit(1)).as("n_groups"), sum(col("gsize")).as("n_docs"))
      .select(col("l"), col("n_groups"), col("n_docs"), (col("l") < 2).as("at_risk"))

  /** t-closeness audit — the third rung of the release-risk ladder
    * after [[kAnonymity]] and [[lDiversity]] (Li, Li &
    * Venkatasubramanian 2007): a QI group can be k-anonymous AND
    * l-diverse yet still leak if its sensitive-value DISTRIBUTION
    * diverges from the corpus-wide one (e.g. a group that is 95% one
    * lang in a 20-lang corpus). Per QI group (source, 100-char length
    * bucket), total-variation distance between the group's lang
    * distribution and the global lang distribution, reported as a
    * decile histogram with the t ≥ 0.5 groups flagged.
    *
    * Exactness: TVD = Σ_v max(p_g(v) − p(v), 0) — absent-in-group
    * languages contribute max(0 − p, 0) = 0, so only the group's OWN
    * (QI, lang) cells are needed (no category cross join). Cleared of
    * denominators: S = Σ max(c_gv·N − c_v·g, 0), t = S / (g·N). The
    * cross-products run in DECIMAL(38,0) so they stay exact past the
    * BIGINT² overflow point (~3e9 docs — a 100 TB corpus clears it),
    * and the decile is TEN EXACT COMPARISONS (10·S ≥ k·g·N), never a
    * rounded division whose banker's/HALF_UP tail could flip a
    * boundary group's bucket vs the oracle.
    *
    * Scale: one scan → compact (QI, lang) cell counts; global lang
    * counts and QI sizes RE-AGGREGATE the cells (no second scan); the
    * ≤|langs|-row global frame broadcasts back onto the cells. */
  def tCloseness(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    // compact (≤ groups×langs rows) with corpus-sized lineage and FOUR
    // branching consumers (s-join, gsize, glob, n) — checkpoint so the
    // corpus is scanned once, not four times
    val cells = Tables.documents(spark, dir)
      .select(col("source"), expr("n_chars div 100").as("len_bucket"), col("lang"))
      .groupBy(col("source"), col("len_bucket"), col("lang"))
      .agg(count(lit(1)).cast(dec).as("c"))
      .localCheckpoint(true)
    val gsize = cells.groupBy(col("source"), col("len_bucket"))
      .agg(sum(col("c")).cast(dec).as("gsize"))
    val glob = cells.groupBy(col("lang")).agg(sum(col("c")).cast(dec).as("cv"))
    val n = cells.agg(sum(col("c")).cast(dec).as("n"))
    val s = cells
      .join(broadcast(glob), Seq("lang"))
      .join(gsize, Seq("source", "len_bucket"))
      .crossJoin(broadcast(n)) // 1-row broadcast build side: corpus total
      .groupBy(col("source"), col("len_bucket"))
      .agg(
        sum(greatest(col("c") * col("n") - col("cv") * col("gsize"), lit(0).cast(dec)))
          .cast(dec).as("s"),
        first(col("gsize")).as("gsize"),
        first(col("n")).as("n"))
    val decile = (1 to 10)
      .map(k => when(lit(10).cast(dec) * col("s") >= lit(k).cast(dec) * col("gsize") * col("n"), 1L).otherwise(0L))
      .reduce(_ + _)
    s.select(col("source"), col("len_bucket"), decile.as("t_decile"),
        col("gsize").cast("long").as("gsize"))
      .groupBy(col("t_decile"))
      .agg(count(lit(1)).as("n_groups"), sum(col("gsize")).as("n_docs"))
      .select(col("t_decile"), col("n_groups"), col("n_docs"),
        (col("t_decile") >= 5).as("at_risk"))
  }

  /** Tokenizer-fertility profile per language: characters per BPE-ish
    * token and BPE tokens per whitespace word — the tokenizer-health
    * read a multilingual pipeline checks before trusting token budgets
    * (a language whose fertility is far above the corpus norm pays more
    * context window per character; Ács' fertility metric for subword
    * tokenizers). One scan, |langs| groups, integer sums, two final
    * IEEE divisions. */
  def tokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        length(col("text")).cast("long").as("nc"),
        size(wordTokens(col("text"))).cast("long").as("nw"),
        size(bpeTokens(col("text"))).cast("long").as("nb"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("nc")).as("total_chars"),
        sum(col("nw")).as("total_word_tokens"),
        sum(col("nb")).as("total_bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("total_chars"),
        col("total_word_tokens"), col("total_bpe_tokens"),
        when(col("total_bpe_tokens") > 0,
          col("total_chars").cast("double") /
            col("total_bpe_tokens").cast("double")).as("chars_per_bpe"),
        when(col("total_word_tokens") > 0,
          col("total_bpe_tokens").cast("double") /
            col("total_word_tokens").cast("double")).as("bpe_per_word"))

  /** Stopword-argmax language ID with per-language scores exposed. */
  def langIdQuery(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("tokens", wordTokens(col("text")))
      .select(
        col("doc_id"),
        stopwordHits(col("tokens"), Stopwords("en")).cast("long").as("en_hits"),
        stopwordHits(col("tokens"), Stopwords("es")).cast("long").as("es_hits"),
        stopwordHits(col("tokens"), Stopwords("fr")).cast("long").as("fr_hits"),
        stopwordHits(col("tokens"), Stopwords("de")).cast("long").as("de_hits"),
        langId(col("tokens")).as("lang_pred")
      )

  /** Language-ID confusion matrix: labeled lang × predicted lang with
    * counts — the evaluation query that tells a curation pipeline
    * whether to trust its classifier before filtering a corpus by it.
    * Pure map + compact-key aggregation (≤ |langs|² groups). */
  def langConfusion(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("lang_pred", langId(wordTokens(col("text"))))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("cnt"))

  /** The composite quality expression over (text, tokens) columns — the
    * single definition [[qualityScore]] and
    * [[CurationQueries.tokenBudgetSelect]] share, so every consumer ranks
    * documents by the identical IEEE arithmetic (same operation order as
    * the oracle SQL).
    *
    * INVARIANT: documents have ≥1 char and ≥1 token (the fixtures
    * guarantee it). An empty/zero-token doc makes this a 0/0 NaN, and
    * NaN ORDERS DIFFERENTLY per engine (Spark comparisons with NaN are
    * false; DuckDB sorts NaN above everything) — a consumer comparing
    * quality against thresholds over a corpus that may contain empty
    * docs must pre-filter them explicitly, as
    * [[qualityThresholdSweep]] does. */
  private[graft] def qualityCol(text: Column, tokens: Column): Column = {
    val nTok = size(tokens).cast("double")
    val textLen = length(text).cast("double")
    val nAlpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val stopHits = stopwordHits(tokens, Stopwords("en")).cast("double")
    least(lit(1.0), nTok / lit(50.0)) * lit(0.3) +
      (nAlpha / textLen) * lit(0.4) +
      least(lit(0.3), stopHits / nTok)
  }

  /** Composite quality score in [0,1]: length, alphabetic ratio, stopword
    * ratio, token-length sanity. The formula is written in the exact same
    * operation order as the oracle SQL — IEEE-identical doubles. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("tokens", wordTokens(col("text")))
      .select(
        col("doc_id"),
        qualityCol(col("text"), col("tokens")).as("quality")
      )

  /** Quality-filter calibration curve: for each candidate threshold
    * 0.0, 0.1, …, 0.9, how many documents and tokens survive
    * `quality >= t` — the sweep a curation run reads before picking its
    * cutoff (every threshold's yield in one query, instead of ten
    * trial filters).
    *
    * Scale (100 TB): ONE corpus scan and ZERO pre-aggregation fan-out —
    * all ten thresholds are conditional aggregates of the same pass,
    * folded to a single row, then exploded to (threshold, n_docs,
    * n_tokens) rows driver-side-free. Thresholds are i/10.0 doubles
    * computed identically on both engines.
    *
    * Empty/zero-token documents are excluded EXPLICITLY: their quality
    * is a 0/0 NaN, and the engines order NaN differently (Spark
    * comparisons with NaN are false, DuckDB sorts NaN above all) — the
    * filter makes "unratable docs are in no bucket" the pinned
    * cross-engine semantics. The sums are coalesced so an empty corpus
    * yields ten zero rows, matching the oracle's correlated form. */
  def qualityThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("tokens", wordTokens(col("text")))
      .select(
        length(col("text")).cast("long").as("text_len"),
        size(col("tokens")).cast("long").as("n_tok"),
        qualityCol(col("text"), col("tokens")).as("quality"))
      .filter(col("text_len") > 0 && col("n_tok") > 0)
    val aggs = (0 to 9).flatMap { i =>
      val t = i.toDouble / 10.0
      Seq(
        coalesce(sum(when(col("quality") >= t, 1L).otherwise(0L)), lit(0L)).as(s"d$i"),
        coalesce(sum(when(col("quality") >= t, col("n_tok")).otherwise(0L)), lit(0L)).as(s"t$i"))
    }
    val rows = (0 to 9).map { i =>
      struct(
        lit(i.toDouble / 10.0).as("threshold"),
        col(s"d$i").as("n_docs"),
        col(s"t$i").as("n_tokens"))
    }
    docs.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.threshold"), col("r.n_docs"), col("r.n_tokens"))
  }

  /** Token-rarity profile — the corpus-frequency quality signal (the
    * "word frequency filter" of C4-style cleaning): per document, the
    * mean and minimum corpus frequency of its token occurrences and the
    * count of hapax tokens (corpus frequency 1). A document whose tokens
    * are mostly hapaxes is usually noise (OCR garbage, base64, boiler
    * IDs); one whose min frequency is high is pure template text. All
    * arithmetic is integer counts and one IEEE division — oracle-exact.
    *
    * Scale (100 TB): the frequency table is vocabulary-sized (≪ corpus,
    * Zipf) — one token-keyed aggregation, then a token equijoin back
    * against the exploded occurrences and a doc-keyed rollup. Every
    * shuffle key is a single token or doc_id. Docs with zero tokens
    * contribute no row (nothing to rate). */
  def tokenRarity(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .withColumn("ws", wordTokens(col("text")))
      .select(col("doc_id"), explode(col("ws")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    toks.join(vocab, "tok")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tok"),
        sum(col("c")).as("sum_freq"),
        (sum(col("c")).cast("double") / count(lit(1)).cast("double")).as("mean_freq"),
        min(col("c")).as("min_freq"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
  }

  /** Importance weighting against a target distribution — the DSIR-shape
    * data-selection signal (Xie et al. 2023: select pretraining data
    * whose token distribution resembles a trusted target set). The
    * target here is the `lang = 'en'` slice; each token's target share
    * `cnt_target / cnt_raw` is an exact fixed-point integer ratio, and a
    * document's importance is the mean of its tokens' ratios — high
    * means "looks like the target corpus", the ranking a data-mixture
    * pass selects by. Stays out of log space entirely (same libm-ULP
    * rule as lm_score): per-token ratios are integer floor divisions,
    * the doc rollup is a BIGINT sum, one integer division for the mean,
    * one IEEE division for the display double.
    *
    * Scale (100 TB): both count tables are vocabulary-sized (Zipf ≪
    * corpus) — the [[tokenRarity]] shape with a target column beside the
    * raw column. The `cnt_target * 10⁶` product needs headroom only for
    * stopword-grade counts (>9·10¹² occurrences of ONE token before
    * BIGINT overflow, which ANSI mode makes loud, not wrong — rescale to
    * 10³ units if a corpus ever gets there). */
  def importanceWeight(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .withColumn("ws", wordTokens(col("text")))
      .select(col("doc_id"), col("lang"), explode(col("ws")).as("tok"))
    val freqs = toks.groupBy(col("tok")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
    toks.join(freqs, "tok")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_toks"),
        sum(expr("(ct * 1000000) div cr")).as("score_fp"))
      .select(
        col("doc_id"), col("n_toks"), col("score_fp"),
        expr("score_fp div n_toks").as("mean_fp"),
        (expr("score_fp div n_toks").cast("double") / lit(1000000.0)).as("importance"))
  }

  /** Bigram language-model scoring — the fluency signal of CCNet-style
    * filtering: train unigram/bigram counts on the corpus itself, then
    * score each document by its mean bigram conditional probability
    * P(w | u) = c(u w) / c(u). Disfluent text (shuffled words, OCR
    * noise, keyword stuffing) strings together rare transitions and
    * scores low; templated text scores high. The mean stays out of
    * log-space (libm ULP divergence would break the cross-engine hash —
    * same rule as the BM25 idf): each conditional probability is ONE
    * integer-ratio division quantized to fixed point (floor(p·10⁹)
    * summed as longs — exact, order-independent), with a single IEEE
    * division at the end. Docs with < 2 tokens have no bigrams → no row.
    *
    * Scale (100 TB): both model tables are vocabulary-sized (Zipf ≪
    * corpus) — one bigram-keyed and one token-keyed aggregation, then
    * two equijoins of the exploded bigram stream on those compact
    * string keys and a doc-keyed rollup. No broadcast assumed: a
    * corpus-scale bigram vocabulary can exceed broadcast limits, so the
    * model joins shuffle on the model keys instead. */
  def lmScore(spark: SparkSession, dir: String): DataFrame =
    bigramScoresFp(spark, dir)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_fp")).as("lp_fp"))
      .withColumn("avg_p",
        col("lp_fp").cast("double") / (col("n_bigrams").cast("double") * lit(1000000000.0)))

  /** The per-bigram fixed-point MLE score stream `(doc_id, p_fp)`
    * behind [[lmScore]], shared with
    * [[CurationQueries.domainReweight]] so the two derivations cannot
    * diverge. p_fp = floor(10⁹ · c(u w)/c(u)) — exact BIGINTs, so any
    * downstream sum is order-independent. */
  private[queries] def bigramScoresFp(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), wordTokens(col("text")).as("ws"))
    val uni = docs.select(explode(col("ws")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cu"))
    // sequence(1, 0) yields a DESCENDING range in Spark — guard short docs
    val big = docs
      .select(col("doc_id"),
        explode(when(size(col("ws")) >= 2,
          transform(sequence(lit(1), size(col("ws")) - 1), i =>
            struct(
              concat(element_at(col("ws"), i), lit(" "),
                element_at(col("ws"), i + 1)).as("bg"),
              element_at(col("ws"), i).as("u"))))
          .otherwise(array().cast("array<struct<bg:string,u:string>>"))).as("b"))
      .select(col("doc_id"), col("b")("bg").as("bg"), col("b")("u").as("u"))
    val bi = big.groupBy(col("bg")).agg(count(lit(1)).as("cb"))
    big.join(bi, "bg")
      .join(uni, col("u") === col("tok"))
      .withColumn("p_fp",
        floor((col("cb").cast("double") / col("cu").cast("double")) * lit(1000000000.0)))
      .select(col("doc_id"), col("p_fp"))
  }

  /** Heaps-law vocabulary-growth curve — per decile of the corpus (by
    * doc_id prefix, i.e. ingestion order): cumulative docs, tokens,
    * DISTINCT vocabulary, and the type-token ratio. The corpus-health
    * read that decides "will more of this source keep adding new
    * vocabulary, or is it recycling itself" — a flattening curve is
    * the first sign a crawl has saturated. Cumulative distinct needs
    * no running set: a token is in the decile-d vocabulary iff its
    * FIRST-occurrence doc falls in the prefix, so one vocabulary-sized
    * (tok → min doc_id) fold answers all ten checkpoints. No log-log
    * slope fit on purpose (libm ln drifts across engines — the ULP
    * rule); the exact integer curve is the deliverable.
    *
    * Scale: token explode folds map-side to per-doc counts and the
    * vocabulary frame; the 10-row cutoff frame broadcasts for the
    * prefix fan-out; everything after is ≤10 groups. */
  def heapsLaw(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(wordTokens(col("text"))).as("tok"))
    val perDoc = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_toks"))
    val firstDoc = toks.groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
    val mx = Tables.documents(spark, dir).agg(max(col("doc_id")).as("max_id"))
    val cuts = mx.select(explode(sequence(lit(1), lit(10))).as("decile"), col("max_id"))
      .select(col("decile"), expr("(max_id * decile) div 10").as("cutoff_id"))
    val docsTok = perDoc.crossJoin(broadcast(cuts))
      .filter(col("doc_id") <= col("cutoff_id"))
      .groupBy(col("decile"), col("cutoff_id"))
      .agg(count(lit(1)).as("docs_cum"), sum(col("n_toks")).as("tokens_cum"))
    val vocab = firstDoc.crossJoin(broadcast(cuts))
      .filter(col("first_doc") <= col("cutoff_id"))
      .groupBy(col("decile")).agg(count(lit(1)).as("vocab_cum"))
    docsTok.join(vocab, "decile")
      .select(col("decile").cast("long").as("decile"), col("cutoff_id"),
        col("docs_cum"), col("tokens_cum"), col("vocab_cum"),
        (col("vocab_cum").cast("double") /
          col("tokens_cum").cast("double")).as("type_token_ratio"))
  }

  /** Rank agreement between the two quality signals — Spearman's ρ
    * between the heuristic [[qualityScore]] and the bigram-MLE
    * [[lmScore]] fluency, over docs that have both (≥ 2 tokens). The
    * eval every pipeline with two scorers runs before trusting either:
    * ρ near 1 means the cheap heuristic can gate for the expensive
    * model; ρ near 0 means they measure different things.
    *
    * Exactness: ranks are distinct global positions with a doc_id
    * tie-break (note: row_number tie-breaking, not average ranks — with
    * heavy ties this deflates ρ versus the tie-corrected form; the
    * doc_id break is deterministic, so both engines agree bit-for-bit),
    * so Spearman's exact form `ρ = 1 − 6Σd²/(n(n²−1))` applies with Σd²
    * an exact BIGINT (headroom to n ≈ 2M docs; ANSI overflow is loud
    * beyond); the final ρ is computed in double with the identical
    * expression order as the oracle, and is NULL when n < 2 (the
    * formula divides by n(n²−1) = 0).
    *
    * Scale (100 TB): each rank is the banded prefix-sum pattern of
    * `token_budget_select` ([[graft.queries.CurationQueries.tokenBudgetSelect]]):
    * percentile cutpoints split the corpus into ~32 value bands (a
    * literal array, narrow map — no sort); the per-(band, band) counts
    * fold to ≤32² rows collected once to the driver, whose exclusive
    * prefix offsets come back as literal map lookups; each document's
    * global rank is its band-local `row_number` plus its band's
    * offset. Band index is monotone in the score and equal scores
    * share a band, so (band, score, doc_id) IS the global order —
    * bit-identical to a global `row_number`, with every corpus-sized
    * sort band-local and NO unpartitioned window anywhere. Widen to
    * ~10k `approx_percentile` bands at real corpus scale. */
  def scoreAgreement(spark: SparkSession, dir: String): DataFrame = {
    val q = qualityScore(spark, dir)
    val l = lmScore(spark, dir).select(col("doc_id"), col("avg_p"))
    // materialize the narrow (doc_id, quality, avg_p) frame ONCE: the
    // banded passes below (cutpoints, band counts, final ranks) each
    // read it, and without the checkpoint every read would re-run the
    // full quality + bigram-LM scorer chains — measured 4.6× the
    // pre-banding cost. Same dup_pagerank discipline: checkpoint a
    // compact per-doc frame, never corpus text.
    val joined = q.join(l, "doc_id")
      .select(col("doc_id"), col("quality"), col("avg_p"))
      .localCheckpoint(true)
    // BOTH ranks from one banded pass: one percentile aggregate carries
    // both cutpoint arrays, both band assignments ride one narrow map
    // over the checkpointed frame, and the ≤ nBands² band counts come
    // back to the driver ONCE, turning each rank's exclusive prefix
    // offsets into a literal map lookup — no offset joins, no
    // unpartitioned window anywhere, four small jobs total (an earlier
    // in-plan offsets-join formulation paid ~10 job launches, 2.6× the
    // pre-banding wall time at sf0.1 on pure scheduling overhead)
    val nBands = 32
    val probs = (1 until nBands).map(i => i.toDouble / nBands)
      .mkString("array(", ",", ")")
    val cutsRow = joined.agg(
      expr(s"percentile(quality, $probs)").as("qcuts"),
      expr(s"percentile(avg_p, $probs)").as("pcuts")).head()
    val ranked =
      if (cutsRow.isNullAt(0)) // empty corpus: no bands, ranks never read
        joined.withColumn("ra", lit(0L)).withColumn("rb", lit(0L))
      else {
        def bandOf(cuts: Seq[Double], scoreCol: String): Column =
          size(filter(lit(cuts.toArray), c => c < col(scoreCol)))
        val banded = joined
          .withColumn("qband", bandOf(cutsRow.getSeq[Double](0), "quality"))
          .withColumn("pband", bandOf(cutsRow.getSeq[Double](1), "avg_p"))
        val counts = banded.groupBy(col("qband"), col("pband"))
          .agg(count(lit(1)).as("n")).collect()
        def offsetsOf(byBand: Map[Int, Long]): Map[Int, Long] = {
          var run = 0L
          (0 until nBands).map { b =>
            val o = b -> run; run += byBand.getOrElse(b, 0L); o
          }.toMap
        }
        def offCol(m: Map[Int, Long], band: String): Column =
          element_at(typedLit(m), col(band))
        val qoff = offsetsOf(counts.groupMapReduce(_.getInt(0))(_.getLong(2))(_ + _))
        val poff = offsetsOf(counts.groupMapReduce(_.getInt(1))(_.getLong(2))(_ + _))
        val wq = Window.partitionBy(col("qband"))
          .orderBy(col("quality").asc, col("doc_id").asc)
        val wp = Window.partitionBy(col("pband"))
          .orderBy(col("avg_p").asc, col("doc_id").asc)
        banded
          .withColumn("ra", row_number().over(wq).cast("long") + offCol(qoff, "qband"))
          .withColumn("rb", row_number().over(wp).cast("long") + offCol(poff, "pband"))
      }
    ranked
      .withColumn("d", col("ra") - col("rb"))
      .agg(count(lit(1)).as("n"), sum(col("d") * col("d")).as("sum_d2"))
      .select(col("n"), col("sum_d2"),
        when(col("n") >= 2,
          lit(1.0) - lit(6.0) * col("sum_d2").cast("double") /
            (col("n").cast("double") *
              (col("n").cast("double") * col("n").cast("double") - lit(1.0))))
          .otherwise(lit(null).cast("double"))
          .as("spearman"))
  }


  /** Collocation strength — PMI's ratio without its logarithm: for each
    * adjacent token pair, `lift = c(ab)·N / (c(a)·c(b))` (how much more
    * often the pair co-occurs than independence predicts), in exact
    * fixed point with a ≥5 support floor, top 50 by (lift, pair). High
    * lift finds multiword expressions and boilerplate collocations —
    * the phrase-mining signal a tokenizer or n-gram blocklist builder
    * reads. Staying out of log space is the [[lmScore]] libm rule: the
    * ORDERING of lift is the ordering of PMI (log is monotone), so
    * nothing is lost by ranking on the rational form.
    *
    * Scale (100 TB): both count tables are vocabulary-sized; the join
    * keys are compact token strings; the final top-k plans as
    * TakeOrderedAndProject with the rank window on 50 rows. Headroom:
    * `c(ab)·N·10⁶` overflows BIGINT once c(ab)·N exceeds ~9·10¹² — at
    * web scale, rescale to 10³ units or pre-divide N; ANSI mode makes
    * the overflow loud, not wrong. */
  def tokenLift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), wordTokens(col("text")).as("ws"))
    val uni = docs.select(explode(col("ws")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cu"))
    val bg = docs
      .select(
        explode(when(size(col("ws")) >= 2,
          transform(sequence(lit(1), size(col("ws")) - 1), i =>
            struct(
              element_at(col("ws"), i).as("a"),
              element_at(col("ws"), i + 1).as("b"))))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
      .select(col("p")("a").as("a"), col("p")("b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("cb"))
    val n = bg.agg(sum(col("cb")).as("n"))
    bg.where(col("cb") >= 5)
      .join(uni.select(col("tok").as("a"), col("cu").as("ca")), "a")
      .join(uni.select(col("tok").as("b"), col("cu").as("cbb")), "b")
      .join(broadcast(n))
      .withColumn("lift_fp", expr("(cb * n * 1000000) div (ca * cbb)"))
      .orderBy(col("lift_fp").desc, col("a").asc, col("b").asc).limit(50)
      .select(col("a"), col("b"), col("cb"), col("lift_fp"),
        (col("lift_fp").cast("double") / lit(1000000.0)).as("lift"),
        row_number().over(
          Window.orderBy(col("lift_fp").desc, col("a").asc, col("b").asc))
          .cast("long").as("rk"))
  }

  /** Content + bag-of-words fingerprints (md5; order-sensitive and
    * order-insensitive). */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("tokens", wordTokens(col("text")))
      .select(
        col("doc_id"),
        contentFingerprint(col("text")).as("content_fp"),
        bagFingerprint(col("tokens")).as("bag_fp")
      )

  /** Winnowing fingerprint (the Schleimer–Wilkerson–Aiken scheme MOSS
    * uses): hash every char 5-gram of the normalized text, take the min
    * hash of each window of 4 consecutive 5-grams, deduplicate. Any
    * substring two documents share of length ≥ k+w−1 = 8 chars is
    * guaranteed to contribute a common fingerprint — the local-substring
    * dedup signal the whole-doc md5 fingerprints can't give.
    *
    * The per-position hash is a polynomial rolling hash (B=257 over code
    * points, mod 2³²) computed by the native codegen'd
    * [[graft.expressions.WinnowFps]] expression — O(1) per position in
    * one pass, no per-element boxing, no shuffle: linear CPU,
    * embarrassingly parallel at any scale. The oracle recomputes the
    * identical integer arithmetic from the non-rolling definition. */
  def winnowFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val k = 5
    val w = 4
    Tables.documents(spark, dir)
      .withColumn("norm", normText(col("text")))
      .withColumn("fps", graft.functions.GraftFunctions.winnowFps(col("norm"), k, w))
      .select(
        col("doc_id"),
        greatest(length(col("norm")) - (k - 1), lit(0)).cast("long").as("n_kgrams"),
        org.apache.spark.sql.functions.size(col("fps")).cast("long").as("n_fp"),
        md5(array_join(transform(col("fps"), x => x.cast("string")), ",")).as("fp_md5")
      )
  }

  /** Document chunking: fixed 50-token windows with 10-token overlap —
    * the operator that turns documents into training samples. Chunk
    * starts step by (size − overlap); the tail chunk may be short but is
    * never empty. Explode factor ≈ tokens/40 per doc — bounded, linear. */
  def chunkText(spark: SparkSession, dir: String): DataFrame = {
    val size = 50
    val step = 40 // size - overlap(10)
    val docs = Tables.documents(spark, dir)
      .withColumn("toks", wordTokens(col("text")))
      .withColumn("n", org.apache.spark.sql.functions.size(col("toks")))
    docs
      .withColumn(
        "chunk_id",
        explode(sequence(lit(0), greatest(ceil((col("n") - size) / lit(step.toDouble)), lit(0)).cast("int")))
      )
      .withColumn("chunk_toks", slice(col("toks"), col("chunk_id") * step + 1, lit(size)))
      .filter(org.apache.spark.sql.functions.size(col("chunk_toks")) > 0)
      .select(
        col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        org.apache.spark.sql.functions.size(col("chunk_toks")).cast("long").as("n_tokens"),
        array_join(col("chunk_toks"), " ").as("chunk_text")
      )
  }

  /** Deterministic training-shard assignment: shard = md5-hash mod N
    * (portable across engines, unlike Spark's murmur3 `hash()`), with
    * per-shard doc counts and token budgets — the layout step before
    * writing training shards. */
  def shardAssign(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("shard", pmod(md5Hash32(col("text")), lit(8L)))
      .withColumn("n_tok", org.apache.spark.sql.functions.size(wordTokens(col("text"))).cast("long"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc")
      )

  /** Train/test contamination: training docs (doc_id ≥ 50) sharing any
    * word 3-gram shingle with the held-out set (doc_id < 50) — an
    * equijoin on exploded shingles + distinct, the scalable shape for
    * decontamination sweeps (never pairwise text comparison). */
  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val sh = Tables.documents(spark, dir)
      .withColumn("ws", wordTokens(col("text")))
      .select(col("doc_id"), explode(graft.queries.SimilarityQueries.shingleColPublic(col("ws"))).as("sh"))
    val test = sh.filter(col("doc_id") < 50).select(col("sh")).distinct()
    sh.filter(col("doc_id") >= 50)
      .join(test, "sh")
      .select(col("doc_id"))
      .distinct()
  }

  /** Count-min-sketch seeds (4 universal-hash rows) and width. The
    * sketch is 4 × 1024 BIGINT counters — constant size, mergeable by
    * addition — the heavy-hitter primitive a 100 TB sharded/streaming
    * pipeline keeps where an exact vocabulary count would shuffle the
    * full token space. */
  private[graft] val CmsSeeds: Seq[(Long, Long)] =
    Seq((100003L, 7L), (100913L, 30011L), (101833L, 60029L), (102761L, 90019L))
  private[graft] val CmsW = 1024L

  /** Count-min-sketch accuracy audit over the corpus vocabulary: build
    * the 4×1024 CMS in ONE pass (per-token md5 hash + 4 affine maps →
    * a 4096-key aggregation), then probe it with the exact top-50
    * tokens and report the sketch ESTIMATE (min over the 4 rows) beside
    * the exact count — [[graft.queries.SimilarityQueries.minhashEstimate]]'s
    * audit discipline for the frequency sketch. CMS never
    * underestimates, so `overcount = est − exact ≥ 0` is a hard
    * invariant the oracle checks by construction.
    *
    * Exactness: hashes, counters, and counts are all BIGINT integer
    * arithmetic — bit-exact across engines, no IEEE ops at all.
    *
    * Scale: the counter aggregation keys on (row, bucket) — 4096 keys
    * regardless of corpus size — and folds map-side; the probe side is
    * a top-50 TakeOrderedAndProject joined to the broadcast 4096-row
    * counter table. Sketches from shards/days merge by adding
    * counters — no re-scan. */
  def cmsTopk(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(explode(wordTokens(col("text"))).as("tok"))
      .withColumn("h", md5Hash32(col("tok")))
    val P = SimilarityQueries.MinhashP
    val rowStructs = CmsSeeds.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(i.toLong).as("d"), (((col("h") * a + b) % P) % CmsW).as("bkt"))
    }
    val counters = toks
      .select(explode(array(rowStructs: _*)).as("db"))
      .select(col("db.d").as("d"), col("db.bkt").as("bkt"))
      .groupBy(col("d"), col("bkt")).agg(count(lit(1)).as("c"))
    val exact = toks.groupBy(col("tok"), col("h"))
      .agg(count(lit(1)).as("exact_c"))
      .orderBy(col("exact_c").desc, col("tok").asc).limit(50)
    exact
      .select(col("tok"), col("exact_c"), explode(array(rowStructs: _*)).as("db"))
      .select(col("tok"), col("exact_c"), col("db.d").as("d"), col("db.bkt").as("bkt"))
      .join(broadcast(counters), Seq("d", "bkt"))
      .groupBy(col("tok"), col("exact_c"))
      .agg(min(col("c")).as("est_c"))
      .select(col("tok"), col("exact_c"), col("est_c"),
        (col("est_c") - col("exact_c")).as("overcount"))
  }

  /** Top terms per language: explode → count → rank ≤ 10 with a
    * deterministic tiebreak. The corpus-vocabulary profile every
    * training-data pipeline reports. */
  def topTerms(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(wordTokens(col("text"))).as("tok"))
    val counts = toks.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("tok").asc)
    counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 10)
      .select(col("lang"), col("tok"), col("cnt"), col("rk").cast("long").as("rk"))
  }

  /** Skew-aware grouped stats over events (two-stage salted aggregation;
    * bit-identical to a direct GROUP BY — the oracle IS the direct GROUP
    * BY). */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Salting.saltedStats(
      Tables.events(spark, dir),
      keys = Seq("event_type"),
      valueCol = "value",
      spreadCol = "event_id",
      buckets = 16
    )

  /** 32-bit SimHash per document: each token occurrence votes ±1 on every
    * bit of its 32-bit md5-derived hash; the sign vector is the signature.
    * Shaped as ONE keyed aggregation with 32 conditional-sum columns —
    * an earlier version exploded a (doc, bit) row per token×bit, a 32×
    * row blow-up through the shuffle for identical math (the oracle kept
    * matching bitwise across the rewrite). */
  def simhash(spark: SparkSession, dir: String): DataFrame = simhashDf(spark, dir)

  /** SimHash near-duplicate pairs over a 64-BIT signature banded 4×16:
    * docs sharing any 16-bit band become candidates (the LSH equijoin);
    * exact Hamming distance on the full 64 bits filters candidates.
    *
    * Why 64/16 and not 32/8: with 8-bit bands each band has only 256
    * values, so expected bucket size is N/256 and candidate pairs grow
    * ~N²/2⁹ — a quadratic blow-up at corpus scale that small fixtures
    * hide. 16-bit bands give 65 536 buckets per band; expected candidates
    * per band are ~N²/2¹⁷ of a *random* corpus but concentrate on true
    * near-dups, which is the LSH contract. Pairs whose ≤`maxHamming`
    * differing bits straddle all 4 bands are missed — the standard recall
    * trade-off. The signature is stored as two 32-bit halves (`sh_lo`,
    * `sh_hi`) so every value stays positive in a signed 64-bit BIGINT on
    * both engines. */
  def simhashNearDup(spark: SparkSession, dir: String): DataFrame =
    bandedHammingJoin(simhash64Df(spark, dir), "sh_lo", "sh_hi", maxHamming = 6)

  /** The 4×16 band-LSH + exact-Hamming discipline BOTH 64-bit near-dup
    * families share ([[simhashNearDup]] over text SimHash,
    * [[phashNearDup]] over the image dHash): explode 4 bands, 16-bit
    * band value from the right half (two positive 32-bit halves — the
    * signed-BIGINT bit-63 hazard never arises), candidate pairs from
    * the (band, value) equijoin with a doc_a < doc_b canonical order,
    * distinct (a pair colliding on several bands reports once), exact
    * Hamming on the full 64 bits to confirm. One definition so the two
    * families cannot diverge on banding, dedup, or shift handling. */
  private def bandedHammingJoin(
      hashes: DataFrame, lo: String, hi: String, maxHamming: Int): DataFrame = {
    val banded = hashes.select(
      col("doc_id"), col(lo), col(hi),
      explode(sequence(lit(0), lit(3))).as("b")
    ).withColumn(
      "band_val",
      expr(s"CASE WHEN b < 2 THEN ($lo >> (16 * b)) & 65535 ELSE ($hi >> (16 * (b - 2))) & 65535 END")
    )
    val a = banded.select(col("doc_id").as("doc_a"), col(lo).as("la"),
      col(hi).as("ha"), col("b"), col("band_val"))
    val bb = banded.select(col("doc_id").as("doc_b"), col(lo).as("lb"),
      col(hi).as("hb"), col("b").as("b2"), col("band_val").as("band_val2"))
    a.join(bb, col("b") === col("b2") && col("band_val") === col("band_val2") &&
        col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("la"), col("ha"), col("lb"), col("hb"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(la ^ lb) + bit_count(ha ^ hb) AS BIGINT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
  }

  /** Per-document perceptual hash (dHash) of the multimodal payload —
    * the IMAGE near-dup key: an 8×9 block-average luma grid over the
    * payload bytes ([[graft.operators.Multimodal.lumaGrid]]; the
    * fixture's bytes stand in for pixels, the REAL pixel path is
    * [[graft.operators.Multimodal.imageDHash]] + `phashBatch` with
    * identical grid/bit arithmetic), one gradient bit per cell pair,
    * stored as two positive 32-bit halves (`simhash_neardup`'s
    * signed-bit discipline). Payloads shorter than the 72-cell grid
    * have no hash and drop out (the `< 3 tokens ⇒ no signature`
    * contract).
    *
    * Scale (100 TB): one narrow map over the scan — the hash is 8
    * bytes per image regardless of payload size, computed where the
    * bytes already live; nothing shuffles. */
  def imagePhash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(length(col("text")) >= 72)
      .withColumn("grid", graft.operators.Multimodal.lumaGrid("text"))
      .select(col("doc_id"),
        graft.operators.Multimodal.phashHalf(col("grid"), 0).as("ph_lo"),
        graft.operators.Multimodal.phashHalf(col("grid"), 4).as("ph_hi"))

  /** Perceptual-hash image near-duplicates — [[simhashNearDup]]'s
    * band-LSH shape applied to the multimodal column: dHash the
    * payloads ([[imagePhash]]), band the 64 bits 4×16, equijoin on
    * (band, value) for candidates, exact Hamming ≤ 10 on the full hash
    * to confirm (the standard dHash near-dup radius).
    *
    * Fixture construction: the text stand-in payloads have no natural
    * image near-dups (measured: the closest cross-doc pair sits at
    * Hamming 18), so the query PLANTS one "re-encoded" copy per
    * payload — the same bytes uniformly brightened
    * ([[graft.operators.Multimodal.lumaGrid]]'s brightness knob, id
    * offset 10⁶) — and the pipeline must find exactly those pairs at
    * Hamming 0 while the background stays out. That verifies, cross-
    * engine, the two properties that make dHash the image near-dup
    * key: brightness invariance (gradient comparisons survive uniform
    * shifts) and band-LSH recall on the survivors. Real images take
    * the same pipeline via [[graft.operators.Multimodal.imageDHash]] /
    * `phashBatch` (SimilarityTextSpec proves shift-invariance, resize
    * stability, and planted-dup recall on real decoded PNGs).
    *
    * Scale (100 TB): identical to the text families — candidates come
    * from an equijoin on a compact (band, 16-bit value) key, never
    * image×image; payload bytes never shuffle (the hash is computed at
    * the scan and is all that travels). */
  def phashNearDup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(length(col("text")) >= 72)
    def hashed(idOffset: Long, brightness: Int) = docs
      .withColumn("grid", graft.operators.Multimodal.lumaGrid("text", brightness))
      .select((col("doc_id") + lit(idOffset)).as("doc_id"),
        graft.operators.Multimodal.phashHalf(col("grid"), 0).as("ph_lo"),
        graft.operators.Multimodal.phashHalf(col("grid"), 4).as("ph_hi"))
    // materialize the compact (doc_id, 2×32-bit) hash frame once: both
    // sides of the band self-join read it, and the checkpoint keeps the
    // decode+grid pass from running twice (the dup_pagerank discipline —
    // 8-byte hashes checkpoint; payload bytes never do)
    val ph = hashed(0L, 0).unionByName(hashed(1000000L, 7)).localCheckpoint(true)
    bandedHammingJoin(ph, "ph_lo", "ph_hi", maxHamming = 10)
  }

  /** Per-keyframe video perceptual hashes over REAL Y4M decode — the
    * video modality's `queries` surface (the decode itself is proven in
    * MultimodalSpec; this runs it as a distributed query). Each
    * document ≥ 384 chars synthesizes a deterministic 3-frame 16×8
    * C420 YUV4MPEG2 clip whose three Y planes are consecutive 128-byte
    * slices of its ASCII-pinned text (non-ASCII chars map to 'x' so
    * chars ⇒ bytes 1:1; chroma planes are constant — dHash reads only
    * luma); [[graft.operators.Multimodal.videoPhashBatch]] then
    * actually PARSES the Y4M container and dHashes every 2nd keyframe
    * through the shared 64-bit kernel.
    *
    * Oracle seam (the [[OracleFixtures]] split): the container parse +
    * exact-integer block-mean downsample is the engine-only kernel —
    * its per-keyframe 8×9 luma grids are materialized as the
    * `video_grids` fixture (and each grid is pinned by the
    * container-bypass spec recompute) — while the 64 gradient
    * comparisons that fold a grid into the dHash are ordinary
    * relational math both engines recompute over the read-back fixture.
    * The hash is emitted as two unsigned 32-bit halves (`ph_lo`/
    * `ph_hi`, the `simhash_neardup` convention) so neither engine
    * touches the signed-BIGINT bit-63 hazard.
    *
    * Scale (100 TB): decode runs where the bytes live
    * (`mapPartitions` codec boundary); only (doc_id, frame, 72 block
    * means) rows ever shuffle — never payload bytes. */
  def videoPhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val g = OracleFixtures.materialize(
      graft.operators.Multimodal.videoGridBatch(
        videoPayloads(spark, dir, 0L, "YUV4MPEG2 W16 H8 F25:1 Ip A1:1 C420\n"),
        stride = 2).toDF(),
      dir, "video_grids")
    g.select(col("doc_id"), col("frame_idx"),
      when(col("ok"), graft.operators.Multimodal.phashHalf(col("grid"), 0))
        .otherwise(lit(0L)).as("ph_lo"),
      when(col("ok"), graft.operators.Multimodal.phashHalf(col("grid"), 4))
        .otherwise(lit(0L)).as("ph_hi"),
      col("ok"))
  }

  /** The synthesize-decode-hash chain behind [[videoPhash]] and
    * [[videoNearDup]], with the clip id offset and the Y4M header as
    * seams — a different header is a RE-ENCODE of the same content
    * (different container params, identical luma), which must hash
    * identically per frame. */
  private def videoFrameHashes(
      spark: SparkSession, dir: String, idOffset: Long, header: String): DataFrame =
    graft.operators.Multimodal
      .videoPhashBatch(videoPayloads(spark, dir, idOffset, header), stride = 2).toDF()

  /** The synthesized Y4M payload frame shared by the hash and grid
    * decode paths: each ≥384-char doc becomes a 3-frame 16×8 C420 clip
    * whose Y planes are consecutive 128-byte slices of its ASCII-pinned
    * text. */
  private def videoPayloads(
      spark: SparkSession, dir: String, idOffset: Long, header: String
  ): org.apache.spark.sql.Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    val uv = "P" * 64 // constant chroma: 8×4 U + 8×4 V per C420 frame
    val t = regexp_replace(col("text"), "[^\\x20-\\x7e]", "x")
    val payload = concat(
      lit(header),
      lit("FRAME\n"), substring(t, 1, 128), lit(uv),
      lit("FRAME\n"), substring(t, 129, 128), lit(uv),
      lit("FRAME\n"), substring(t, 257, 128), lit(uv))
    Tables.documents(spark, dir)
      .filter(length(col("text")) >= 384)
      .select((col("doc_id") + lit(idOffset)).as("doc_id"),
        payload.cast("binary").as("bytes"))
      .as[(Long, Array[Byte])]
  }

  /** Clip-level video near-duplicates — [[phashNearDup]]'s band-LSH
    * shape lifted to the video modality: per-keyframe dHashes
    * ([[videoPhash]]'s REAL Y4M decode), banded 4×16 per (keyframe
    * position), candidates from the (frame, band, value) equijoin,
    * exact Hamming ≤ 10 per frame, then clip pairs rolled up with
    * their matched-keyframe count — "two clips are near-dups when
    * aligned keyframes match", the standard video-dedup heuristic.
    * Planted: every clip gets a RE-ENCODED copy (different container
    * params — frame rate, interlace tags — same luma planes, id offset
    * 10⁶), which the pipeline must recover at Hamming 0 on every
    * keyframe; decode-invariance across container params is exactly
    * what makes the frame dHash the video near-dup key.
    *
    * Scale (100 TB): decode at the scan, 8-byte hashes checkpoint
    * (payloads never shuffle), candidates from compact-key equijoins —
    * never clip×clip. */
  def videoNearDup(spark: SparkSession, dir: String): DataFrame = {
    val orig = videoFrameHashes(spark, dir, 0L, "YUV4MPEG2 W16 H8 F25:1 Ip A1:1 C420\n")
    val reenc = videoFrameHashes(spark, dir, 1000000L, "YUV4MPEG2 W16 H8 F30:1 C420\n")
    // fold the keyframe position into the banding key (frame_idx ∈
    // {0, 2} — one decimal digit), so the shared band join only pairs
    // ALIGNED keyframes. The decoded frame hashes are the engine-only
    // kernel (Y4M container parse — spec-gated by the container-bypass
    // recompute): materialized as the oracle fixture, which ALSO serves
    // the localCheckpoint role (decode runs once per side, union
    // branches never re-derive it); the banding, aligned-frame filter,
    // Hamming re-check, and clip rollup are hash-gated against DuckDB
    // recomputing them over the fixture.
    val ph = OracleFixtures.materialize(
      orig.unionByName(reenc)
        .filter(col("ok"))
        .select((col("doc_id") * 10 + col("frame_idx")).as("doc_id"),
          col("phash").bitwiseAND(lit(0xffffffffL)).as("ph_lo"),
          shiftrightunsigned(col("phash"), 32).as("ph_hi")),
      dir, "video_ph")
    bandedHammingJoin(ph, "ph_lo", "ph_hi", maxHamming = 10)
      .filter(pmod(col("doc_a"), lit(10L)) === pmod(col("doc_b"), lit(10L)))
      .groupBy(
        expr("doc_a div 10").as("clip_a"),
        expr("doc_b div 10").as("clip_b"))
      .agg(count(lit(1)).as("n_matched_frames"), max(col("hamming")).as("max_hamming"))
  }

  /** Per-document audio fingerprints over REAL WAV decode — the audio
    * modality's `queries` surface (the [[graft.operators.Multimodal
    * .audioFingerprint]] energy-delta hash is proven volume-invariant
    * in its spec; this runs it as a distributed query). Each ≥260-char
    * doc synthesizes a deterministic fixed-length mono WAV: a constant
    * 44-byte RIFF/PCM header (the length fields are compile-time
    * constants because every clip is exactly 130 16-bit samples)
    * followed by the first 260 ASCII-pinned text bytes interpreted as
    * little-endian PCM; `audioEnergyBatch` then actually PARSES the
    * container through javax.sound and decodes the PCM stream.
    *
    * Oracle seam (the [[OracleFixtures]] split): the container parse +
    * per-frame amplitude + 65 exact-integer segment energies is the
    * engine-only kernel, materialized as the `audio_energy` fixture
    * (each energy vector pinned by the container-bypass spec
    * recompute); the 64 louder-than-next comparisons that fold the
    * energies into the fingerprint are recomputed by both engines over
    * the read-back fixture, emitted as two unsigned 32-bit halves
    * (`afp_lo`/`afp_hi`).
    *
    * Scale (100 TB): decode where the bytes live; only (doc_id,
    * 65 longs) rows shuffle. */
  def audioFingerprintQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dataBytes = 260 // 130 samples × 16-bit mono
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    def le16(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte)
    val header: Array[Byte] =
      "RIFF".getBytes("US-ASCII") ++ le32(36 + dataBytes) ++ "WAVE".getBytes("US-ASCII") ++
        "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16) ++
        "data".getBytes("US-ASCII") ++ le32(dataBytes)
    val t = regexp_replace(col("text"), "[^\\x20-\\x7e]", "x")
    val ds = Tables.documents(spark, dir)
      .filter(length(col("text")) >= dataBytes)
      .select(col("doc_id"),
        concat(lit(header), substring(t, 1, dataBytes).cast("binary")).as("bytes"))
      .as[(Long, Array[Byte])]
    val e = OracleFixtures.materialize(
      graft.operators.Multimodal.audioEnergyBatch(ds).toDF(), dir, "audio_energy")
    def half(off: Int): Column = (0 until 32).map { j =>
      val k = off + j
      when(element_at(col("energy"), k + 1) > element_at(col("energy"), k + 2),
        lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    e.select(col("doc_id"),
      when(col("ok"), half(0)).otherwise(lit(0L)).as("afp_lo"),
      when(col("ok"), half(32)).otherwise(lit(0L)).as("afp_hi"),
      col("ok"))
  }

  /** 64-bit SimHash as two independent 32-bit halves: the low half votes
    * with md5Hash32(tok), the high half with md5Hash32("hi:" ⊕ tok) — two
    * draws from the same md5 family, exactly reproducible in the oracle.
    * One token explode feeds ONE keyed aggregation with 64
    * conditional-sum columns (no (doc, bit) row blow-up through the
    * shuffle). */
  private def simhash64Df(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(wordTokens(col("text"))).as("tok"))
      .withColumn("hlo", md5Hash32(col("tok")))
      .withColumn("hhi", md5Hash32(concat(lit("hi:"), col("tok"))))
    def votes(h: String, p: String) = (0 until 32).map { j =>
      sum(
        expr(s"CASE WHEN (shiftright($h, $j) & 1) = 1 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END")
      ).as(s"$p$j")
    }
    def sig(p: String) = (0 until 32)
      .map(j => when(col(s"$p$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val allVotes = votes("hlo", "s") ++ votes("hhi", "t")
    toks
      .groupBy(col("doc_id"))
      .agg(allVotes.head, allVotes.tail: _*)
      .select(col("doc_id"), sig("s").as("sh_lo"), sig("t").as("sh_hi"))
  }

  /** Boilerplate n-gram profile (the C4/RefinedWeb boilerplate-removal
    * signal): a word 3-gram is "boilerplate" when it appears in ≥ 5
    * distinct documents; each doc reports how much of its distinct
    * shingle set is boilerplate. Near-1 ratios mark template/chrome text
    * a curation pass strips before training.
    *
    * Scale (100 TB): distinct (doc, shingle) pairs → one compact-key
    * shuffle to count document frequency, then an equijoin of the pairs
    * back onto the df table keyed by shingle — never doc×doc. The df
    * side is vocabulary-sized (≪ corpus); AQE broadcasts it when small.
    * Docs with < 3 tokens have no shingles and drop out (same contract
    * as [[repetitionScore]]). */
  /** Novelty curve: per document, the fraction of its distinct word
    * 3-gram shingles whose FIRST corpus occurrence (minimal doc_id over
    * the shingle hash) is this document — the diminishing-returns read
    * behind data-mixing decisions: as a crawl grows, per-doc novelty
    * decays, and the marginal value of more data from the same source
    * decays with it (the scaling-laws view of dedup). Documents below
    * the 3-token shingle threshold have no rate and emit no row.
    *
    * Scale (100 TB): shingle text dies at the map — only (doc_id,
    * 60-bit hash) rows shuffle (the [[substringDedup]] width rationale:
    * 2³² birthday-saturates on corpus-global shingle spaces); ownership
    * is one map-combinable min per hash; the join keys on the compact
    * hash. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val shd = Tables.documents(spark, dir)
      .withColumn("ws", wordTokens(col("text")))
      .select(col("doc_id"),
        explode(array_distinct(SimilarityQueries.shingleColPublic(col("ws")))).as("sh"))
      .select(col("doc_id"), md5Hash60(col("sh")).as("h"))
      // materialized once: ownership fold + the join side otherwise each
      // re-run the tokenize→shingle→hash pass (compact (doc_id, h) rows)
      .localCheckpoint(true)
    val owner = shd.groupBy(col("h")).agg(min(col("doc_id")).as("owner"))
    shd.join(owner, "h")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("owner") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_shingles").cast("double")).as("novelty"))
  }

  def boilerplateNgrams(spark: SparkSession, dir: String): DataFrame = {
    val shd = Tables.documents(spark, dir)
      .withColumn("ws", wordTokens(col("text")))
      .select(col("doc_id"),
        explode(array_distinct(SimilarityQueries.shingleColPublic(col("ws")))).as("sh"))
      // materialized once: the df fold + the join side otherwise each
      // re-run the tokenize→shingle pass
      .localCheckpoint(true)
    // shd is distinct per (doc_id, sh) by construction, so count(*) per
    // shingle IS its document frequency
    val dfq = shd.groupBy(col("sh")).agg(count(lit(1)).as("dfc"))
    shd.join(dfq, "sh")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_shingles"),
        sum(when(col("dfc") >= 5, 1L).otherwise(0L)).as("n_boiler")
      )
      .select(
        col("doc_id"), col("n_shingles"), col("n_boiler"),
        (col("n_boiler").cast("double") / col("n_shingles").cast("double")).as("boiler_ratio")
      )
  }

  /** Simpson diversity of each document's token distribution — the
    * concentration signal a curation pass reads next to
    * [[CurationQueries.repetitionScore]]: 1 − Σ pᵢ² over the doc's token
    * frequencies. Near 0 ⇒ one token dominates (spam/keyword stuffing);
    * near 1 ⇒ tokens spread evenly. Chosen over Shannon entropy
    * deliberately: Simpson is a pure rational function of the counts, so
    * the whole derivation stays in exact BIGINT arithmetic (the libm-ULP
    * rule of [[lmScore]] — no cross-engine `ln`), quantized as
    * `(n² − Σcᵢ²)·10⁶ div n²` with one IEEE division for display.
    *
    * Scale (100 TB): one scan, two compact-key aggregations (per
    * (doc_id, tok), then per doc_id) — the [[tokenRarity]] shuffle shape.
    * Headroom: Σcᵢ²·10⁶ ≤ n²·10⁶ overflows BIGINT only past n ≈ 3·10⁶
    * tokens in ONE document — ANSI mode makes that loud, not wrong.
    * Zero-token docs have no rows to group and drop out, matching the
    * oracle. */
  def tokenDiversity(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .withColumn("ws", wordTokens(col("text")))
      .select(col("doc_id"), explode(col("ws")).as("tok"))
    toks.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("c")).as("n_tok"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * col("c")).as("sum_sq"))
      .select(
        col("doc_id"), col("n_tok"), col("n_distinct"), col("sum_sq"),
        expr("((n_tok * n_tok - sum_sq) * 1000000) div (n_tok * n_tok)")
          .as("simpson_fp"),
        (expr("((n_tok * n_tok - sum_sq) * 1000000) div (n_tok * n_tok)")
          .cast("double") / lit(1000000.0)).as("simpson"))
  }

  /** Vocabulary coverage: the share of each document's tokens that a
    * fixed top-K corpus vocabulary (K = 100 here) covers — the
    * out-of-vocabulary audit run before committing to a tokenizer or a
    * vocab-pruned model. Vocabulary membership is deterministic: rank by
    * (count DESC, token ASC), keep ranks ≤ K. Coverage is the exact
    * fixed-point ratio `n_in_vocab·10⁶ div n_tok`.
    *
    * Scale (100 TB): the vocabulary is K rows by construction —
    * broadcast it (the hint is explicit); the doc-side pass is then one
    * scan + broadcast-probe + doc-keyed rollup, no shuffle of the
    * exploded token stream on the vocab key. The vocab build itself is
    * a vocabulary-sized aggregation and a K-row top-k
    * (TakeOrderedAndProject, not a global sort). */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .withColumn("ws", wordTokens(col("text")))
      .select(col("doc_id"), explode(col("ws")).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc).limit(100)
      .select(col("tok").as("vtok"))
    toks.join(broadcast(vocab), col("tok") === col("vtok"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tok"),
        sum(when(col("vtok").isNotNull, 1L).otherwise(0L)).as("n_in_vocab"))
      .select(
        col("doc_id"), col("n_tok"), col("n_in_vocab"),
        expr("(n_in_vocab * 1000000) div n_tok").as("coverage_fp"),
        (expr("(n_in_vocab * 1000000) div n_tok").cast("double") /
          lit(1000000.0)).as("coverage"))
  }

  /** One BPE training iteration: the corpus-wide adjacent-character-pair
    * counts whose argmax is the first merge a byte-pair-encoding
    * tokenizer would learn (Sennrich et al. 2016's inner loop as one
    * query). Pairs are counted per DISTINCT word weighted by the word's
    * corpus frequency — the standard BPE formulation — and the top 50
    * are returned with a deterministic (cnt DESC, pair ASC) rank.
    *
    * Scale (100 TB): the pair generation runs over the VOCABULARY (Zipf
    * ≪ corpus), not the token stream — the corpus-sized work is exactly
    * one word-count aggregation; everything after operates on
    * vocabulary-sized frames, and the final top-k plans as
    * TakeOrderedAndProject. Subsequent merge iterations are this same
    * query re-run over a re-segmented vocab table, never the corpus. */
  def bpePairs(spark: SparkSession, dir: String): DataFrame = {
    val wf = Tables.documents(spark, dir)
      .select(explode(wordTokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val pairs = wf
      .where(length(col("tok")) >= 2)
      // sequence(1, 0) yields a DESCENDING range in Spark — the length
      // guard above keeps the upper bound ≥ 1
      .select(
        explode(transform(sequence(lit(1), length(col("tok")) - 1),
          i => col("tok").substr(i, lit(2)))).as("pair"),
        col("c"))
    // top-k FIRST (plans as TakeOrderedAndProject), THEN the rank
    // window — the only unpartitioned window runs on the 50-row frame
    pairs.groupBy(col("pair")).agg(sum(col("c")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc).limit(50)
      .select(col("pair"), col("cnt"),
        row_number().over(Window.orderBy(col("cnt").desc, col("pair").asc))
          .cast("long").as("rk"))
  }

  /** Compressibility quality profile — compressed÷raw size per document
    * under the native [[graft.expressions.DeflateSize]] kernel (pinned
    * DEFLATE settings, codegen'd, one pass, zero shuffle until the
    * 16-bin histogram fold). The model-free duplication/diversity signal
    * big-corpus curation uses beside stopword and repetition features:
    * template/boilerplate text lands far below natural prose, random
    * noise barely compresses. DEFLATE itself has no DuckDB counterpart,
    * so the per-doc sizes are split out as an [[OracleFixtures]] table
    * (the kernel stays gated by CompressRatioSpec: separation,
    * interpreted-vs-codegen equality, determinism) and everything
    * downstream — ratio, binning, per-bin counts and byte masses — is
    * hash-gated against DuckDB recomputing the same SQL over the
    * fixture.
    *
    * Output: per-ratio-bin doc count + byte mass, so the corpus profile
    * (not 500k raw rows) is the result — the shape a curation gate
    * consumes when picking its keep thresholds. */
  def compressRatio(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Tables.documents(spark, dir)
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("n_bytes"),
        deflateSize(col("text")).as("deflate_bytes"))
      .where(col("n_bytes") > 0)
    val scored = OracleFixtures.materialize(sizes, dir, "compress_sizes")
      .withColumn("ratio",
        col("deflate_bytes").cast("double") / col("n_bytes").cast("double"))
      // 16 bins over [0, 1.6): ratios above raw size (tiny docs where the
      // zlib header dominates) clamp into the top bin
      .withColumn("bin", least(floor(col("ratio") * lit(10.0)).cast("long"), lit(15L)))
    scored.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bytes")).as("raw_bytes"),
        sum(col("deflate_bytes")).as("deflate_bytes"),
        min(col("ratio")).as("min_ratio"),
        max(col("ratio")).as("max_ratio"))
      .orderBy(col("bin"))
  }

  /** Normalized Compression Distance re-ranker over the LSH candidates —
    * Cilibrasi & Vitányi's parameter-free similarity: NCD(x, y) =
    * (C(xy) − min(C(x), C(y))) ÷ max(C(x), C(y)) under the native
    * [[graft.expressions.DeflateSize]] kernel. The third re-rank lens
    * beside shingle Jaccard ([[graft.queries.SimilarityQueries
    * .ngramJaccard]]) and prefix edit distance: it needs no tokenizer,
    * no shingle width, and no vocabulary, so it catches near-dups those
    * representations miss (reordered paragraphs, consistent token-level
    * rewrites) — a compressor models the SHARED INFORMATION directly.
    * Near-identical docs land near 0; unrelated docs near 1.
    *
    * The DEFLATE sizes (per-doc C(x) and per-pair C(xy)) are the
    * engine-only kernel — split out as an [[OracleFixtures]] table
    * (the kernel stays spec-gated on planted duplicate vs unrelated
    * pairs); the candidate pair set and the NCD arithmetic are
    * hash-gated against DuckDB re-deriving the SAME LSH pairs from
    * scratch and recomputing the NCD formula over the fixture — a pair
    * the two engines disagree on surfaces as a row-count mismatch.
    *
    * Scale: candidates are LSH-bounded (never doc×doc); per-doc sizes
    * C(x) compute ONCE on the doc frame before the join, so each
    * candidate pair pays exactly one extra deflate (the concatenation) —
    * text joins by doc_id, bodies never become shuffle keys. */
  def ncdNearDup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), deflateSize(col("text")).as("cx"))
    val sizes = SimilarityQueries.minhashLsh(spark, dir)
      .join(docs.select(col("doc_id").as("doc_a"), col("text").as("ta"),
        col("cx").as("ca")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("text").as("tb"),
        col("cx").as("cb")), "doc_b")
      .withColumn("cxy", deflateSize(concat(col("ta"), lit("\n"), col("tb"))))
      .select(col("doc_a"), col("doc_b"), col("ca"), col("cb"), col("cxy"))
    OracleFixtures.materialize(sizes, dir, "ncd_sizes")
      .select(col("doc_a"), col("doc_b"), col("ca"), col("cb"), col("cxy"),
        ((col("cxy") - least(col("ca"), col("cb"))).cast("double") /
          greatest(col("ca"), col("cb")).cast("double")).as("ncd"))
  }

  /** Three rounds of BPE merge TRAINING in-engine — [[bpePairs]] is one
    * candidate census; this actually learns the merge list. State is the
    * word-TYPE frame (vocabulary-sized, localCheckpointed once): each
    * word as a '|'-terminated symbol string ("cat" → "c|a|t|"), so a
    * merge is a plain `replace(seq, "a|b|", "ab|")` — the terminator
    * makes cross-symbol false matches impossible and gives identical
    * left-to-right non-overlapping semantics in both engines. Per round:
    * adjacent-pair census weighted by word frequency (vocabulary-sized,
    * map-combined), winner picked by (count desc, pair asc), merge
    * applied under a ONE-ROW broadcast — the whole 3-round chain stays
    * in-plan, no driver collect. Output: one row per round with the
    * learned merge and the corpus symbol count after applying it (the
    * quantity BPE training monotonically shrinks; spec-asserted).
    *
    * Scale: corpus text is touched once (word census); every round is
    * vocabulary-sized work — the 100 TB shape, since vocabulary grows
    * ~log(corpus), not with it. */
  def bpeTrain(spark: SparkSession, dir: String): DataFrame = {
    val wf = Tables.documents(spark, dir)
      .select(explode(wordTokens(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("seq", concat(array_join(split(col("tok"), ""), "|"), lit("|")))
      .localCheckpoint()
    def pairCensus(w: DataFrame): DataFrame = {
      val syms = split(expr("substring(seq, 1, length(seq) - 1)"), "\\|")
      w.select(col("c"), syms.as("sy"))
        .where(size(col("sy")) >= 2)
        .select(col("c"), explode(expr(
          "transform(sequence(1, size(sy) - 1)," +
            " i -> struct(element_at(sy, i) AS a, element_at(sy, i + 1) AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("c")).as("cnt"))
    }
    def top1(census: DataFrame): DataFrame =
      census.orderBy(col("cnt").desc, col("a").asc, col("b").asc).limit(1)
    def applyMerge(w: DataFrame, winner: DataFrame): DataFrame =
      w.crossJoin(broadcast(winner.select(col("a").as("ma"), col("b").as("mb"))))
        .withColumn("seq", expr(
          "replace(seq, concat(ma, '|', mb, '|'), concat(ma, mb, '|'))"))
        .drop("ma", "mb")
    def symTotal(w: DataFrame): DataFrame =
      w.agg(sum(col("c") * (length(col("seq")) -
        length(regexp_replace(col("seq"), "\\|", "")))).as("total_symbols"))
    val rounds = (1 to 3).scanLeft((wf, Option.empty[DataFrame])) {
      case ((w, _), _) =>
        val winner = top1(pairCensus(w))
        (applyMerge(w, winner), Some(winner))
    }.collect { case (w, Some(winner)) => (w, winner) }
    rounds.zipWithIndex.map { case ((w, winner), i) =>
      winner.crossJoin(broadcast(symTotal(w)))
        .select(lit((i + 1).toLong).as("round"),
          col("a").as("left"), col("b").as("right"),
          col("cnt").as("pair_cnt"), col("total_symbols"))
    }.reduce(_ unionAll _)
  }

  private def simhashDf(spark: SparkSession, dir: String): DataFrame = {
    // every OCCURRENCE votes (standard frequency-weighted SimHash) — on a
    // small shared vocabulary, distinct-token signatures degenerate to
    // near-identical; term frequencies are what separate documents
    val toks = Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        explode(wordTokens(col("text"))).as("tok")
      )
      .withColumn("h", md5Hash32(col("tok")))
    val voteSums = (0 until 32).map { j =>
      sum(
        expr(s"CASE WHEN (shiftright(h, $j) & 1) = 1 THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END")
      ).as(s"s$j")
    }
    val sig = (0 until 32)
      .map(j => when(col(s"s$j") > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    toks
      .groupBy(col("doc_id"))
      .agg(voteSums.head, voteSums.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }
}
