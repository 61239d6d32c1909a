package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-data-pipeline operators
  * (north-star extension beyond the reference surface): normalization,
  * tokenization, language-ID heuristics, fingerprinting, SimHash.
  *
  * Everything is native Catalyst expressions over string/array functions —
  * no UDFs — and every derivation is cross-engine deterministic (md5-based
  * hashing, exact integer arithmetic, fixed-order double formulas) so the
  * DuckDB oracle can recompute identical values.
  */
object TextFunctions {

  /** Whitespace-collapse + trim + lowercase normalization — the canonical
    * key for exact dedup. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Word tokens: maximal `[a-z0-9]+` runs over the normalized text. */
  def wordTokens(c: Column): Column =
    regexp_extract_all(normText(c), lit("[a-z0-9]+"), lit(0))

  /** BPE-ish tokens: letter runs, digit runs, and single punctuation
    * marks — the pre-tokenization split most BPE vocabularies assume. */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** Stopword tables for the n-gram/stopword language-ID heuristic. */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "for",
      "on", "with", "as", "at", "by", "this", "that"),
    "es" -> Seq("el", "la", "de", "los", "las", "en", "y", "que", "un",
      "una", "es", "por", "con", "para"),
    "fr" -> Seq("le", "les", "des", "une", "et", "est", "pour", "dans",
      "du", "au", "sur", "pas"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den",
      "im", "ein", "eine", "zu")
  )

  /** Count of tokens that appear in `words` (duplicates counted — a
    * frequency signal, unlike a set intersection). */
  def stopwordHits(tokens: Column, words: Seq[String]): Column =
    size(filter(tokens, t => t.isin(words.map(_.asInstanceOf[Any]): _*)))

  /** Deterministic language-ID: argmax of stopword hit counts with a fixed
    * preference order (en > es > fr > de), `und` when no list scores. A
    * heuristic, not a model — the point is a scalable, engine-native,
    * reproducible classifier. */
  def langId(tokens: Column): Column = {
    val en = stopwordHits(tokens, Stopwords("en"))
    val es = stopwordHits(tokens, Stopwords("es"))
    val fr = stopwordHits(tokens, Stopwords("fr"))
    val de = stopwordHits(tokens, Stopwords("de"))
    when(en >= es && en >= fr && en >= de && en > 0, "en")
      .when(es >= fr && es >= de && es > 0, "es")
      .when(fr >= de && fr > 0, "fr")
      .when(de > 0, "de")
      .otherwise("und")
  }

  /** Order-sensitive content fingerprint: md5 of the normalized text. */
  def contentFingerprint(c: Column): Column = md5(normText(c))

  /** Order-insensitive bag fingerprint: md5 over the sorted distinct token
    * set — robust to word reordering, the cheap first-pass near-dup key. */
  def bagFingerprint(tokens: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens)), " "))

  /** First 8 hex chars of md5 parsed as an unsigned 32-bit int — the
    * portable per-token hash both engines reproduce bit-for-bit. Backed
    * by the native [[graft.expressions.Md5Hash32]] (digest bytes → long,
    * no hex-string round-trip); value-identical to
    * `conv(substring(md5(c), 1, 8), 16, 10)`, which is what the DuckDB
    * oracle computes. */
  def md5Hash32(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.Md5Hash32(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** DEFLATE-compressed byte count of the string's UTF-8 form — the
    * compressibility quality kernel (native
    * [[graft.expressions.DeflateSize]], pinned level-6 settings). */
  def deflateSize(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.DeflateSize(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** First 60 bits of md5 as a non-negative long — the wide variant for
    * corpus-global keys where 32-bit birthday collisions would saturate
    * (see [[graft.expressions.Md5Hash60]]). Value-identical to
    * `conv(substring(md5(c), 1, 15), 16, 10)`. */
  def md5Hash60(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.Md5Hash60(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** PII patterns, written in the regex subset Java and RE2 share (no
    * backrefs, no lookaround) so the DuckDB oracle runs the identical
    * automaton. */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"

  /** Phone-shaped runs: optional +, then ≥8 DIGITS allowing ()/-/space
    * separators between them — deliberately conservative (a bare 4-digit
    * number is NOT a phone, and neither is "1 2 3 4 5": the count that
    * matters is digits, not characters). */
  val PhoneRe = "\\+?(?:[0-9][()\\- ]*){7,}[0-9]"

  /** Replace emails then phone-shaped runs with placeholder tags. */
  def redactPii(c: Column): Column =
    regexp_replace(regexp_replace(c, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
}
