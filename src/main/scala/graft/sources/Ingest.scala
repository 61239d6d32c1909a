package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** File-based corpus ingestion: schema-pinned JSONL / CSV readers with a
  * corrupt-record dead letter — the batch ingest edge an LLM-data
  * pipeline runs before anything in `queries/` touches the corpus
  * (real corpora arrive as `.jsonl` / `.jsonl.gz` / `.csv.gz` dumps,
  * not parquet).
  *
  * Contract, mirroring the streaming sinks' validation split
  * (`sink/Sinks.scala`): every input line lands in exactly ONE of the
  * two returned frames — `good` (parsed, schema-typed; includes rows a
  * drifting producer retyped mid-corpus ONLY in the dead letter, never
  * silently nulled) or `bad` (the raw offending line, for quarantine/
  * repair) — so a malformed record can neither kill the job (FAILFAST)
  * nor vanish (DROPMALFORMED). Schema is REQUIRED, never inferred:
  * inference costs an extra full pass at 100 TB.
  *
  * Design note: this deliberately reads via `spark.read.text` + a
  * `from_json`/`from_csv` parse EXPRESSION with its own in-struct
  * corrupt-record field, not the DataFrameReader's PERMISSIVE mode.
  * The reader-level corrupt column cannot be split into two frames
  * without caching the whole scan (Spark disallows queries that
  * reference only the corrupt column of a raw file scan —
  * UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — and caching
  * is not a 100 TB option); the expression form has no such
  * restriction, parses each line exactly once per branch, and keeps
  * both branches narrow maps over a splittable text scan. Gzip is
  * transparent and parallelizes at file granularity — shard corpora
  * into many `.gz` members (the standard layout) and the scan scales
  * out.
  */
object Ingest {

  /** In-struct field the parse expression routes the raw line of any
    * malformed or type-drifted record into. */
  private val Corrupt = "_corrupt_record"

  private val ParseOpts =
    Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> Corrupt)

  private def split(raw: DataFrame, schema: StructType,
                    parse: (Column, StructType) => Column)
      : (DataFrame, DataFrame) = {
    // a caller schema already containing the corrupt-record name would
    // produce a duplicate-named struct field and make the good/bad
    // split's getField resolution ambiguous — reject it loudly
    require(!schema.fieldNames.contains(Corrupt),
      s"ingest schema must not contain a '$Corrupt' field — it is reserved for the dead-letter split")
    val withCorrupt = schema.add(Corrupt, StringType)
    val parsed = raw
      .select(col("raw_line"), parse(col("raw_line"), withCorrupt).as("p"))
    // blank / whitespace-only lines parse to a NULL struct with NO
    // corrupt record set (verified against Spark 4.1.2) — without the
    // isNotNull guard they'd land in `good` as phantom all-null rows,
    // violating the never-silently-nulled contract
    val corrupt = col("p").getField(Corrupt)
    val good = parsed.filter(col("p").isNotNull && corrupt.isNull)
      // getField, not col("p.name"): a schema field containing dots
      // must resolve as a literal name, not a nested path
      .select(schema.fieldNames.map(f => col("p").getField(f).as(f)).toIndexedSeq: _*)
    val bad = parsed.filter(col("p").isNull || corrupt.isNotNull)
      .select(col("raw_line"))
    (good, bad)
  }

  private def batchText(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path).toDF("raw_line")

  /** JSONL (one JSON object per line, `.gz` transparent). Returns
    * (good, dead-letter). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) =
    split(batchText(spark, path), schema, (c, s) => from_json(c, s, ParseOpts))

  /** Headerless CSV with the given schema (`.gz` transparent). Returns
    * (good, dead-letter).
    *
    * RESTRICTION: records must not contain quoted embedded newlines —
    * the line-based text scan would fragment such an RFC-4180 record
    * into two malformed lines and dead-letter both halves. Corpora with
    * multi-line fields need the DataFrameReader's `multiLine` CSV mode
    * (which gives up both input splitting and this dead-letter split)
    * or, better, JSONL. */
  def readCsv(spark: SparkSession, path: String, schema: StructType)
      : (DataFrame, DataFrame) =
    split(batchText(spark, path), schema, (c, s) => from_csv(c, s, ParseOpts))

  /** Streaming twin of [[readJsonl]]: watch a directory for landed JSONL
    * shards (the continuous-crawl ingest shape — producers drop
    * `.jsonl(.gz)` files, the pipeline picks each up exactly once via
    * the file source's checkpointed log). Same split contract; each
    * returned frame starts its own streaming query (good → the corpus
    * sink, bad → the quarantine sink). `sourceOptions` passes file-source
    * knobs through (e.g. `maxFilesPerTrigger` to bound micro-batch
    * size — the admission control a high-volume landing zone needs). */
  def streamJsonl(spark: SparkSession, path: String, schema: StructType,
                  sourceOptions: Map[String, String] = Map.empty)
      : (DataFrame, DataFrame) =
    split(
      spark.readStream.options(sourceOptions).text(path)
        .withColumnRenamed("value", "raw_line"),
      schema, (c, s) => from_json(c, s, ParseOpts))
}
