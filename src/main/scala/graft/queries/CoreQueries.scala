package graft.queries

import graft.fixtures.LogGen
import graft.functions.LogParse
import graft.operators.Windowing
import graft.sources.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Core relational query surface: the reference's pipeline re-expressed as
  * oracle-checked batch queries, plus the star-schema capability queries a
  * real user of the engine runs daily (joins, top-k, JSON extraction).
  *
  * Numeric discipline (applies to every query here): any aggregate whose
  * value depends on float summation ORDER (sum/avg over doubles) is computed
  * as an exact DECIMAL sum and only then cast to double — partitioning and
  * AQE re-plans can reorder float adds, and at 1000 executors a bare
  * `sum(double)` is not reproducible. min/max/count are order-insensitive
  * and stay native.
  */
object CoreQueries {

  private val Dec = DecimalType(18, 2)

  /** Shared parse-pipeline input: events rendered to the wire format,
    * spread across the cluster first — the render+parse is the compute
    * (str_to_map + casts per row), and the local fixture file is a single
    * row group, so without the (guarded, no-op at real scale) distribute
    * the whole pipeline runs on one task. Measured 2.2x at sf0.1. */
  private def renderedLogs(spark: SparkSession, dir: String) =
    LogGen.eventsAsServiceLogs(Tables.distribute(spark, Tables.events(spark, dir)))

  /** TPC-H Q1-style pricing summary over lineitem: the canonical
    * shuffle-light aggregation (map-side partial agg → 6-group exchange). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast(Dec)).cast("double").as("sum_base_price"),
        sum(
          col("l_extendedprice").cast(Dec) *
            (lit(BigDecimal(1)).cast(Dec) - col("l_discount").cast(Dec))
        ).cast("double").as("sum_disc_price"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty")
      )

  /** O3 as an oracle-checked query: render events rows into the reference
    * wire format (LogGen), parse them back with the native-expression
    * parser, emit the typed point columns. The DuckDB oracle recomputes the
    * expected output directly from events — a full construct→parse
    * round-trip proof. */
  def parseLogs(spark: SparkSession, dir: String): DataFrame = {
    LogParse.parse(renderedLogs(spark, dir), "raw").select(
      col("event_id"),
      col("time"),
      col("operation"),
      col("callerservice"),
      col("awsaccountid"),
      col("latency"),
      col("measure_name"),
      col("measure_value"),
      col("measure_value_type"),
      col("time_unit")
    )
  }

  /** Flagship query (SURVEY §7.1, operators O3+O4+O5+O6): parse pipeline →
    * event time → per-10s-tumbling-window, per-(callerservice, operation)
    * count/min/max/sum/avg latency. Keyed `groupBy(window, keys)` — scales
    * out where the reference's `windowAll` funnelled through one task. */
  def windowAgg(spark: SparkSession, dir: String): DataFrame = {
    val parsed = LogParse.parse(renderedLogs(spark, dir), "raw")
    Windowing
      .tumblingStats(
        parsed,
        timeCol = "event_time",
        keys = Seq("callerservice", "operation"),
        durMs = 10000L,
        valueCol = "latency"
      )
      .select(
        col("window_start"),
        col("callerservice"),
        col("operation"),
        col("cnt"),
        col("min_value"),
        col("max_value"),
        col("sum_value"),
        col("avg_value")
      )
  }

  /** The open-ended `dimensions` MapType column, proven end-to-end:
    * parse → explode the map → (record, key, value) rows the oracle
    * reconstructs per dimension key. */
  def dimsExploded(spark: SparkSession, dir: String): DataFrame = {
    LogParse.parse(renderedLogs(spark, dir), "raw")
      .select(col("event_id"), explode(col("dimensions")).as(Seq("key", "value")))
  }

  /** Hierarchical windowed rollup: hourly stats REAGGREGATED from the 10s
    * partial aggregates instead of rescanning the source — the pattern
    * that makes multi-granularity dashboards affordable at 100 TB. Exact
    * because the partials keep DECIMAL sums (double partial sums would
    * drift); the oracle computes the hourly rollup directly from raw
    * events, so the gate proves partials-reagg ≡ direct. */
  def hourlyRollup(spark: SparkSession, dir: String): DataFrame = {
    val parsed = LogParse.parse(renderedLogs(spark, dir), "raw")
    val partials = parsed
      .groupBy(
        Windowing.tumble(col("event_time"), 10000L).as("w10"),
        col("callerservice")
      )
      .agg(
        count(lit(1)).as("cnt"),
        min(col("latency")).as("mn"),
        max(col("latency")).as("mx"),
        sum(col("latency").cast(Dec)).as("sdec")
      )
    partials
      .groupBy(
        Windowing.tumble(col("w10"), 3600000L).as("hour_start"),
        col("callerservice")
      )
      .agg(
        sum(col("cnt")).as("cnt"),
        min(col("mn")).as("min_latency"),
        max(col("mx")).as("max_latency"),
        sum(col("sdec")).cast("double").as("sum_latency")
      )
  }

  /** O7/O8 batch semantics: flag rows later than (max event time − 5s).
    * Deterministic — cutoff derives from the data, never wall clock. */
  def lateSplit(spark: SparkSession, dir: String): DataFrame =
    Windowing
      .withLateFlag(Tables.events(spark, dir), "ts", "5 SECONDS")
      .select(col("event_id"), col("ts"), col("is_late"))

  /** lineitem ⋈ orders ⋈ customer revenue rollup. orders⋈lineitem is the
    * big shuffle join on the natural key; customer broadcasts when its
    * size estimate fits the threshold (it does at fixture scale — no
    * second shuffle) and falls back to AQE's choice when it doesn't
    * (customer at sf100 is over the broadcast limit). */
  def join3Way(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.broadcastIfSmall(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(
          col("l_extendedprice").cast(Dec) *
            (lit(BigDecimal(1)).cast(Dec) - col("l_discount").cast(Dec))
        ).cast("double").as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders")
      )
  }

  /** Top-k with a deterministic tiebreak (price desc, then key) — a global
    * TakeOrderedAndProject, not a full sort: Spark keeps only k rows per
    * partition then merges k·p rows on the driver. */
  def topK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderpriority"))

  /** Selective scan: filter + narrow projection designed to reach the
    * parquet reader (PushedFilters + pruned ReadSchema — asserted by
    * PlanSpec). At 100 TB this is the difference between reading 2 columns
    * of a date range and reading everything. */
  def filterPushdown(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      // session-TZ (UTC) timestamp literal — java.sql.Timestamp.valueOf
      // would use the JVM default zone and could disagree with the oracle
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
        col("l_returnflag") === "R")
      .groupBy(col("l_linestatus"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty")
      )

  /** Date/time function surface: per-month order rollup (UTC month
    * truncation, portable across engines). */
  def dateAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(
        date_trunc("month", col("o_orderdate")).as("month"),
        col("o_orderpriority")
      )
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast(Dec)).cast("double").as("sum_price"),
        countDistinct(col("o_custkey")).as("n_custs")
      )

  /** Schema-full JSON parsing (`from_json` with an explicit struct
    * schema — the typed counterpart of `get_json_object`): the parsed
    * field is a real typed column downstream, and invalid JSON nulls the
    * FIELDS (Spark 4 returns a struct of nulls, not a null struct; DuckDB
    * errors instead — which is why no cross-engine "malformed" flag is
    * exposed here). */
  def jsonTyped(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("p",
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))
      .select(col("event_id"), col("p.k").as("k"))

  /** JSON extraction from the events `props` payload (`{"k": 87}`) +
    * grouped aggregation — exact integer sums, no float hazard. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k")
      )

  /** Z-order layout pruning audit: how many "files" does a 2-D box
    * predicate skip via parquet min/max footer stats under a Z-ordered
    * layout vs the natural insertion-order layout? This quantifies the
    * decision [[graft.sources.Layout.writeZOrdered]] implements: at
    * 100 TB the dominant query cost is the scan, and file skipping is the
    * only lever that removes I/O entirely rather than making it faster.
    *
    * Model: every row is assigned to one of ≤256 equal-width "files"
    * under each layout — by its 2-D Morton value ([[Layout.zValue16]]
    * over (l_partkey, l_suppkey) each scaled into [0, 65535] first, the
    * same 16-bit bucketing `writeZOrdered` performs — raw keys would
    * silently alias once they outgrow 16 bits) and by l_orderkey (orders are generated
    * in insertion sequence, so orderkey-order models the at-rest layout
    * of an append-only table). Per file, the parquet-footer stats
    * (min/max of both predicate columns) decide whether a template box
    * predicate (the middle 1/16 × 1/16 of each key range — a selective
    * 2-D lookup) can skip the file. The output is one row per layout:
    * file/row scan fractions plus the true match count (identical across
    * layouts — layout changes I/O, never answers).
    *
    * Everything is integer arithmetic (`div`, exact in both engines);
    * the one double, `scan_frac`, is a single IEEE division of two
    * longs. Shape at scale: one 3-column scan, one 6-long broadcast of
    * the global maxima, a ≤512-group compact-key aggregate (map-side
    * combined), then a 2-group summary — no wide shuffle, no sort. */
  def zorderPrune(spark: SparkSession, dir: String): DataFrame = {
    import graft.sources.Layout
    val base = Tables.lineitem(spark, dir).select(
      col("l_partkey").cast("long").as("pk"),
      col("l_suppkey").cast("long").as("sk"),
      col("l_orderkey").cast("long").as("ok"))
    // global key maxima: one tiny aggregated row, broadcast onto the scan
    val bounds = base.agg(
      max("ok").as("okmax"), max("pk").as("pmax"), max("sk").as("smax"))
    // zValue16 interleaves bits 0–15 ONLY (writeZOrdered buckets to 16
    // bits for the same reason): keys are scaled into [0, 65535] first —
    // feeding raw keys would silently alias pk and pk+65536 to one
    // z-value once keys outgrow 16 bits, corrupting the audit
    val keyed = base
      .crossJoin(broadcast(bounds))
      .withColumn("z", Layout.zValue16(
        expr("(pk * 65536) div (pmax + 1)"),
        expr("(sk * 65536) div (smax + 1)")))
    val exploded = keyed
      // box predicate: middle 1/16 of each dimension, integer-exact
      .withColumn("plo", expr("(pmax + 1) div 4"))
      .withColumn("phi", expr("(pmax + 1) div 4 + (pmax + 1) div 16 - 1"))
      .withColumn("slo", expr("(smax + 1) div 4"))
      .withColumn("shi", expr("(smax + 1) div 4 + (smax + 1) div 16 - 1"))
      .withColumn("hit",
        (col("pk") >= col("plo") && col("pk") <= col("phi") &&
          col("sk") >= col("slo") && col("sk") <= col("shi")).cast("long"))
      // the same row lands in one file per layout: equal-width file ids
      // over the Morton value and over the insertion (orderkey) order
      .select(col("pk"), col("sk"), col("hit"),
        col("plo"), col("phi"), col("slo"), col("shi"),
        // z spans [0, 2³²) by construction → fixed-width 256 files
        explode(array(
          struct(lit("zorder").as("layout"),
            expr("z div 16777216").as("file_id")),
          struct(lit("linear").as("layout"),
            expr("(ok * 256) div (okmax + 1)").as("file_id")))).as("e"))
      .select(col("pk"), col("sk"), col("hit"),
        col("plo"), col("phi"), col("slo"), col("shi"),
        col("e.layout").as("layout"), col("e.file_id").as("file_id"))
    // per-file footer stats (min/max of both predicate columns) + row count
    val files = exploded
      .groupBy(col("layout"), col("file_id"))
      .agg(
        min("pk").as("min_pk"), max("pk").as("max_pk"),
        min("sk").as("min_sk"), max("sk").as("max_sk"),
        count(lit(1)).as("cnt"), sum("hit").as("hits"),
        min("plo").as("plo"), min("phi").as("phi"),
        min("slo").as("slo"), min("shi").as("shi"))
      .withColumn("scanned",
        (col("min_pk") <= col("phi") && col("max_pk") >= col("plo") &&
          col("min_sk") <= col("shi") && col("max_sk") >= col("slo")).cast("long"))
    files
      .groupBy(col("layout"))
      .agg(
        count(lit(1)).as("n_files"),
        sum(col("scanned")).as("files_scanned"),
        sum(col("cnt")).as("rows_total"),
        sum(col("scanned") * col("cnt")).as("rows_scanned"),
        sum(col("hits")).as("rows_matched"))
      .withColumn("scan_frac",
        col("rows_scanned").cast("double") / col("rows_total").cast("double"))
      .orderBy(col("layout"))
  }
}
