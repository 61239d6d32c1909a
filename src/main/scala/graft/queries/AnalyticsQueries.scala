package graft.queries

import graft.functions.TextFunctions.md5Hash32
import graft.sources.Tables

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational capability widening: SQL analytic windows (OVER clauses),
  * ROLLUP, set operations, semi/anti joins, the deep star join, and the
  * sliding/session event-time windows the reference imports but never
  * uses (StreamingJob.java:39).
  *
  * Scale notes: analytic windows partition by compact keys (custkey /
  * user_id) — no global windows; the 5-way join broadcasts every
  * dimension and leaves exactly one big shuffle (orders⋈lineitem);
  * sliding windows explode each row into window/slide = 2 copies only;
  * session windows are lag+cumsum per user partition, linear state.
  */
object AnalyticsQueries {

  private val Dec = DecimalType(18, 2)

  /** Ranking + running aggregate per customer (rank, exact decimal
    * running sum exposed as double). */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.select(
      col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
      rank().over(w).cast("long").as("rk"),
      sum(col("o_totalprice").cast(Dec))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double").as("run_sum")
    )
  }

  /** ROLLUP aggregation with grouping indicators. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"),
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls")
      )

  /** Hot-key concentration per series — the diagnostic that DECIDES when
    * the salting operators ([[graft.operators.Salting]], `salted_agg` /
    * `salted_join`) are worth their two-stage cost: per event_type, the
    * key count, the heaviest key's share, and the
    * Herfindahl–Hirschman index Σ(cᵢ/n)² — HHI → 1/n_keys means uniform
    * (don't salt), HHI → 1 means one dominant key (salt or die at
    * scale).
    *
    * Exactness: counts and Σc² are BIGINTs (Σc² is exact while every
    * single key stays under ~3·10⁹ rows — ANSI overflow is loud past
    * that); the two shares divide in DOUBLE space with n² computed as
    * double·double, in the same order as the oracle.
    *
    * Scale: two map-combinable aggregations on compact keys —
    * (series, user) then series. */
  def keySkew(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("c")).as("n_events"),
        count(lit(1)).as("n_keys"),
        max(col("c")).as("max_key_count"),
        sum(col("c") * col("c")).as("ssq"))
      .select(col("event_type"), col("n_events"), col("n_keys"),
        col("max_key_count"),
        (col("max_key_count").cast("double") / col("n_events").cast("double"))
          .as("top_share"),
        (col("ssq").cast("double") /
          (col("n_events").cast("double") * col("n_events").cast("double")))
          .as("hhi"))

  /** CUBE over (returnflag, linestatus) — the remaining GROUPING SETS
    * shorthand beside [[rollupAgg]] and the explicit `grouping_sets`
    * query: all four subset combinations in one Expand-based pass, with
    * `grouping()` markers disambiguating real NULLs from subtotal rows.
    * Same Expand + single-aggregation plan shape as rollup — the
    * multiplier is the grouping-set count, not the data. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast(Dec)).cast("double").as("sum_qty"),
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls")
      )

  /** Left semi + anti join counts: customers with vs without orders. */
  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("cnt")).withColumn("tag", lit("with_orders"))
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("cnt")).withColumn("tag", lit("without_orders"))
    semi.unionByName(anti).select(col("tag"), col("cnt"))
  }

  /** Set operations (distinct semantics in both engines): customer keys vs
    * ordering-customer keys. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).select(col("c_custkey").as("k"))
    val o = Tables.orders(spark, dir).select(col("o_custkey").as("k"))
    val inter = c.intersect(o).agg(count(lit(1)).as("cnt"))
      .withColumn("tag", lit("intersect"))
    val exc = c.except(o).agg(count(lit(1)).as("cnt"))
      .withColumn("tag", lit("except"))
    val uni = c.union(o).distinct().agg(count(lit(1)).as("cnt"))
      .withColumn("tag", lit("union"))
    inter.unionByName(exc).unionByName(uni).select(col("tag"), col("cnt"))
  }

  /** 5-way star join (TPC-H Q5 shape): revenue per nation. Every
    * dimension (region, nation, customer) broadcast while it fits the
    * broadcast threshold (size-guarded — customer outgrows it at large
    * SF and then falls back to AQE); the only shuffle join is
    * orders⋈lineitem on the natural key. */
  def join5Way(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.broadcastIfSmall(c), col("o_custkey") === col("c_custkey"))
      .join(Tables.broadcastIfSmall(n), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.broadcastIfSmall(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(
          col("l_extendedprice").cast(Dec) *
            (lit(BigDecimal(1)).cast(Dec) - col("l_discount").cast(Dec))
        ).cast("double").as("revenue")
      )
  }

  /** Rolling 24 h distinct actives per event type (the DAU-style metric
    * every telemetry pipeline reports), exact. Spark's window functions
    * cannot express `count(DISTINCT) OVER (RANGE 24 HOURS)`, and the
    * naive form — a time-range self-join of events against events — is
    * quadratic in the window. The scale-safe shape: dedupe the raw
    * stream to the compact (type, user, hour) activity frame FIRST (one
    * map-combined distinct — the only corpus-sized shuffle), fan each
    * activity row out to the ≤24 rolling windows it makes the user
    * active in, and count distinct users per (type, window-end) over
    * compact integer keys. Window ends are restricted to hours that
    * exist in the data (a ≤|hours| broadcast semi-join), so both engines
    * enumerate identical windows. `stickiness` = hourly actives ÷
    * trailing-24 h actives — the DAU/WAU-style engagement ratio. */
  def rollingActives(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint the activity frame: `uh` feeds the window fan-out,
    // the hour list AND the hourly counts — un-materialized, the
    // corpus-sized scan+distinct ran 3× (3 event scans in the
    // before-plan). The frame is compact (type, user, hour) rows.
    val uh = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        expr("unix_millis(ts) div 3600000").as("hb"))
      .distinct()
      .localCheckpoint(true)
    val hrs = uh.select(col("hb").as("wh")).distinct()
    val rolling = uh
      .select(col("event_type"), col("user_id"), col("hb"),
        explode(sequence(lit(0L), lit(23L))).as("k"))
      .withColumn("wh", col("hb") + col("k"))
      .join(broadcast(hrs), Seq("wh"), "left_semi")
      .groupBy(col("event_type"), col("wh"))
      .agg(countDistinct(col("user_id")).as("actives_24h"))
    val hourly = uh
      .groupBy(col("event_type"), col("hb").as("wh"))
      .agg(countDistinct(col("user_id")).as("actives_1h"))
    rolling
      .join(hourly, Seq("event_type", "wh"), "left")
      .select(
        col("event_type"),
        timestamp_millis(col("wh") * lit(3600000L)).as("window_hour"),
        col("actives_24h"),
        coalesce(col("actives_1h"), lit(0L)).as("actives_1h"))
      .withColumn("stickiness",
        col("actives_1h").cast("double") / col("actives_24h").cast("double"))
  }

  /** Sliding event-time windows (10 s window, 5 s slide) — each event
    * belongs to exactly window/slide = 2 windows; the explode factor is
    * the overlap count, not the data size. The unused import the
    * reference never wired (StreamingJob.java:39), implemented. */
  def slidingAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("ms", unix_millis(col("ts")))
    ev.select(col("event_type"), col("value"), col("ms"),
        explode(array(lit(0), lit(1))).as("k"))
      .withColumn("ws_ms",
        (col("ms") - pmod(col("ms"), lit(5000L))) - col("k") * lit(5000L))
      .withColumn("window_start", timestamp_millis(col("ws_ms")))
      .groupBy(col("window_start"), col("event_type"))
      .agg(
        count(lit(1)).as("cnt"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        sum(col("value").cast(Dec)).cast("double").as("sum_value")
      )
  }

  /** Order-stable second-moment statistics: sample stddev and Pearson
    * correlation computed from EXACT decimal sums (Σx, Σx², Σy, Σxy) with
    * the final formula in fixed-order double arithmetic. Spark's native
    * `stddev`/`corr` accumulate doubles in partition order — not
    * reproducible across runs/cluster sizes; this form is, and the oracle
    * matches it bitwise. */
  def statsAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("x", col("value").cast(Dec))
      .withColumn("y", get_json_object(col("props"), "$.k").cast("long").cast(Dec))
    ev.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x")).as("_sx"),
        sum(col("x") * col("x")).as("_sx2"),
        sum(col("y")).as("_sy"),
        sum(col("y") * col("y")).as("_sy2"),
        sum(col("x") * col("y")).as("_sxy")
      )
      .select(
        col("event_type"), col("n"),
        (col("_sx").cast("double") / col("n")).as("mean_value"),
        sqrt((col("_sx2").cast("double") -
          col("_sx").cast("double") * col("_sx").cast("double") / col("n")) /
          (col("n") - 1)).as("stddev_value"),
        ((col("_sxy").cast("double") -
          col("_sx").cast("double") * col("_sy").cast("double") / col("n")) /
          (sqrt(col("_sx2").cast("double") -
            col("_sx").cast("double") * col("_sx").cast("double") / col("n")) *
           sqrt(col("_sy2").cast("double") -
            col("_sy").cast("double") * col("_sy").cast("double") / col("n"))))
          .as("corr_value_k")
      )
  }

  /** Pivot: per user bucket, one count column per event type. Spark's
    * `pivot()` emits null for absent combinations; coalesced to 0 to
    * match the oracle's conditional-count form. */
  def pivotAgg(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.events(spark, dir)
      .withColumn("bucket", col("user_id") % 10)
      .groupBy(col("bucket"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    types.foldLeft(pivoted)((df, t) =>
      df.withColumn(t, coalesce(col(t), lit(0L))))
  }

  /** GROUPING SETS through the SQL entry path (`spark.sql` over a
    * registered view) — the one query surface the DataFrame API queries
    * don't exercise; semantics identical in DuckDB. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame =
    withUniqueView(spark, Tables.events(spark, dir)) { v =>
      spark.sql(
        s"""SELECT event_type, user_id % 10 AS bucket, count(*) AS cnt,
           |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
           |  CAST(grouping(event_type) AS BIGINT) AS g_type
           |FROM $v
           |GROUP BY GROUPING SETS ((event_type), (user_id % 10), ())""".stripMargin)
    }

  /** Registers `df` under a per-call unique temp-view name, analyzes the
    * SQL against it (Spark analysis is eager — the resolved plan holds
    * the relation itself), then drops the view so concurrent queries in
    * one session never race on a shared fixed name. */
  private def withUniqueView(spark: SparkSession, df: DataFrame)(
      sql: String => DataFrame): DataFrame = {
    val v = s"graft_v_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    df.createOrReplaceTempView(v)
    try sql(v) finally spark.catalog.dropTempView(v)
  }

  /** Typed `Aggregator[IN, BUF, OUT]` surface: exact-decimal mean via a
    * (count, BigDecimal) buffer on a typed Dataset — the compile-time-
    * checked path for custom aggregation logic, same numeric discipline
    * as the relational queries (exact sum, double at the edge). */
  def typedAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val statsAggr = new org.apache.spark.sql.expressions.Aggregator[
        (String, Double), (Long, BigDecimal), (Long, Double)] {
      def zero: (Long, BigDecimal) = (0L, BigDecimal(0))
      def reduce(b: (Long, BigDecimal), a: (String, Double)): (Long, BigDecimal) =
        (b._1 + 1, b._2 + BigDecimal(a._2).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      def merge(x: (Long, BigDecimal), y: (Long, BigDecimal)): (Long, BigDecimal) =
        (x._1 + y._1, x._2 + y._2)
      def finish(r: (Long, BigDecimal)): (Long, Double) = (r._1, r._2.toDouble)
      def bufferEncoder = implicitly[org.apache.spark.sql.Encoder[(Long, BigDecimal)]]
      def outputEncoder = implicitly[org.apache.spark.sql.Encoder[(Long, Double)]]
    }
    Tables.events(spark, dir)
      .select(col("event_type"), col("value"))
      .as[(String, Double)]
      .groupByKey(_._1)
      .agg(statsAggr.toColumn.name("stats"))
      .select(
        col("key").as("event_type"),
        col("stats._1").as("cnt"),
        col("stats._2").as("sum_value")
      )
  }

  /** AS-OF join via composition (SURVEY §7.3 preference (a): compose
    * existing ops before building a custom operator): for every
    * non-signup event, the timestamp of the same user's most recent
    * signup at-or-before it. Carry-forward `last(..., ignoreNulls)` over
    * a (user, time) window — one shuffle on the user key, linear state,
    * no range join explosion. The general recipe for enrich-with-
    * latest-dimension at 100 TB. */
  def asofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn(
        "signup_ts",
        last(when(col("event_type") === "signup", col("ts")), ignoreNulls = true).over(w)
      )
      .filter(col("event_type") =!= "signup")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("signup_ts"))
  }

  /** Cheapest supplier per part (argmin by group): per (part, supplier)
    * exact-decimal volume sums from lineitem, ranked inside each part by
    * double unit price with a deterministic supplier tiebreak, rank 1
    * kept (WindowGroupLimit prunes per-partition), then the part and
    * supplier dimensions broadcast-join back. The argmin-by-window shape
    * is the deterministic alternative to `min_by` (whose tie behavior is
    * engine-defined) — the pattern every "best per group" query needs at
    * scale: one shuffle on the group key, no self-join. */
  def cheapestSupplier(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"), col("l_quantity"))
    val perSupp = li.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(
        sum(col("l_extendedprice").cast(Dec)).as("sum_price"),
        sum(col("l_quantity").cast(Dec)).as("sum_qty")
      )
      .withColumn("unit_price",
        col("sum_price").cast("double") / col("sum_qty").cast("double"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("unit_price").asc, col("l_suppkey").asc)
    perSupp
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .join(Tables.broadcastIfSmall(
        Tables.part(spark, dir).select(col("p_partkey"), col("p_name"))),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.broadcastIfSmall(
        Tables.supplier(spark, dir).select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"), col("s_name"),
        col("unit_price"))
  }

  /** Skew-aware salted equijoin ([[graft.operators.Salting.saltedJoin]]):
    * lineitem (pretend l_orderkey is hot) ⋈ orders with the orders side
    * replicated over 16 salt buckets and lineitem salted by its
    * row-unique (orderkey, linenumber) composite — the hottest
    * orderkey's rows land on all 16 buckets instead of one task. Same rows as the plain join (oracle is
    * the direct formulation); the plan's first exchange must carry
    * (l_orderkey, _salt). The manual fallback for the case AQE skew
    * handling can't split: one key too hot for a single task, dim too
    * big to broadcast. */
  def saltedJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_discount"))
    val ord = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    graft.operators.Salting.saltedJoin(li, ord, "l_orderkey",
      // row-unique spread: (orderkey, linenumber) is lineitem's PK —
      // l_linenumber alone has only 7 distinct values, which would cap
      // the hot key's fan-out at 7 of the 16 buckets
      concat_ws("#", col("l_orderkey"), col("l_linenumber")))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(
          col("l_extendedprice").cast(Dec) *
            (lit(BigDecimal(1)).cast(Dec) - col("l_discount").cast(Dec))
        ).cast("double").as("revenue")
      )
  }

  /** Interval (range-overlap) join in the bucketized equijoin shape:
    * per-user daily activity spans joined to the 3 busiest hours by
    * span∩hour overlap. A naive range join plans as a nested-loop over
    * every (span, window) pair; instead each span explodes into the hour
    * buckets it covers (bounded: ≤ 24/day) and overlap becomes a plain
    * equijoin on the bucket — broadcast here since the window side is
    * tiny, shuffle-equijoin when it isn't. The exact-overlap re-check
    * after the bucket match keeps semantics right for windows that don't
    * align to bucket edges. The oracle states the same join as a direct
    * range predicate — the definition, not the execution shape. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame = {
    def hourOf(c: org.apache.spark.sql.Column) = floor(unix_millis(c) / lit(3600000L))
    val ev = Tables.events(spark, dir).select(col("user_id"), col("ts"))
    val incidents = ev.groupBy(hourOf(col("ts")).as("hour"))
      .agg(count(lit(1)).as("n_ev"))
      .orderBy(col("n_ev").desc, col("hour").asc)
      .limit(3)
    spanFrame(spark, dir)
      .withColumn("hour", explode(sequence(hourOf(col("s")), hourOf(col("e")))))
      .join(broadcast(incidents), "hour")
      .filter(unix_millis(col("s")) < (col("hour") + 1) * 3600000L &&
        unix_millis(col("e")) >= col("hour") * 3600000L)
      .select(col("user_id"), col("day"),
        unix_millis(col("s")).as("span_start_ms"),
        unix_millis(col("e")).as("span_end_ms"),
        col("hour"), col("n_ev"))
  }

  /** Per-user daily activity spans (user_id, day, s, e) — the single
    * definition [[intervalJoin]] and [[intervalJoinOuter]] share, so the
    * two sides of the outer rewrite (and the oracle) cannot diverge on
    * what a span is. */
  private def spanFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).select(col("user_id"), col("ts"))
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))

  /** LEFT-OUTER interval join — [[intervalJoin]] plus the spans that
    * overlap NO incident hour (null hour/n_ev), i.e. the "unaffected
    * sessions" rows an incident post-mortem needs alongside the affected
    * ones. Executed as inner-matches ∪ anti-join-unmatched so the plan
    * stays two compact-key equijoins: a direct left-outer on the raw
    * range predicate would be a nested loop (exactly what
    * CartesianGuard exists to refuse), while the anti join keys on the
    * span's (user_id, day) — the standard outer-join-over-interval
    * rewrite at scale. */
  def intervalJoinOuter(spark: SparkSession, dir: String): DataFrame = {
    // matched feeds BOTH the anti-join build side and the union —
    // localCheckpoint so the inner-join plan (events scan + explode +
    // broadcast) runs once, not once per consumer (matched is
    // ≤ spans×3 compact rows at any scale)
    val matched = intervalJoin(spark, dir).localCheckpoint()
    val spans = spanFrame(spark, dir)
      .select(col("user_id"), col("day"),
        unix_millis(col("s")).as("span_start_ms"),
        unix_millis(col("e")).as("span_end_ms"))
    val unmatched = spans
      .join(matched.select(col("user_id"), col("day")), Seq("user_id", "day"), "left_anti")
      .withColumn("hour", lit(null).cast("long"))
      .withColumn("n_ev", lit(null).cast("long"))
    matched.unionByName(unmatched)
  }

  /** Data-quality profiling: per-column null counts + distinct counts on
    * lineitem — the profile every ingest pipeline runs before training. */
  def nullProfile(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val cols = Seq("l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate")
    val aggs = cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct")
      )
    }
    li.agg(aggs.head, aggs.tail: _*)
  }

  /** Fixed-width histogram of event values (50-unit buckets): the value-
    * distribution profile, one scan + one tiny-key shuffle. */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("bucket", floor(col("value") / 50.0).cast("long"))
      .groupBy(col("bucket"))
      .agg(
        count(lit(1)).as("cnt"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value")
      )

  /** Distribution-drift monitor: per event type, the L1 (total-variation
    * ×2) distance between the value histograms of the stream's EARLY and
    * LATE time halves — the data-quality alarm that catches a feed
    * silently changing shape (new client version, schema shift, upstream
    * bug) even when volumes stay flat. Both halves share one fixed
    * 10-bin grid over the type's full value range, so the comparison is
    * apples-to-apples.
    *
    * Exactness: values quantize to `floor(value·10³)` BIGINTs; the time
    * midpoint test `tus·2 ≤ t0+t1` and the bin index
    * `((q−q0)·10) div (q1−q0+1)` stay in exact integers (non-negative
    * numerator, so Spark's truncating DIV and DuckDB's flooring `//`
    * agree); the L1 distance folds the exact rational form
    * `Σ|cₑ·n_l − c_l·nₑ|` and pays ONE IEEE division by `nₑ·n_l`
    * (≤ 10¹⁰ — exact in double). NULL when either half of a type is
    * empty (drift against nothing is undefined, not zero).
    *
    * Scale (100 TB): one scan; the time bounds and per-type value bounds
    * are two tiny broadcast aggregates; the cell counts shuffle on
    * compact (type, bin) keys with full map-side combine — types × 10
    * cells of state, no window, no sort anywhere. A production monitor
    * would slide this per day against a reference window; the shape is
    * identical. */
  def distDrift(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts)").as("tus"),
        expr("CAST(floor(value * 1000.0) AS BIGINT)").as("q"))
    val bounds = ev.agg(min(col("tus")).as("t0"), max(col("tus")).as("t1"))
    val vb = ev.groupBy(col("event_type"))
      .agg(min(col("q")).as("q0"), max(col("q")).as("q1"))
    val cells = ev
      .crossJoin(broadcast(bounds)) // 1-row build side: free
      .join(broadcast(vb), "event_type")
      .select(col("event_type"),
        when(col("tus") * 2 <= col("t0") + col("t1"), 0L).otherwise(1L).as("half"),
        expr("((q - q0) * 10) DIV (q1 - q0 + 1)").as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(
        sum(when(col("half") === 0L, 1L).otherwise(0L)).as("ce"),
        sum(when(col("half") === 1L, 1L).otherwise(0L)).as("cl"))
    val totals = cells.groupBy(col("event_type"))
      .agg(sum(col("ce")).as("n_early"), sum(col("cl")).as("n_late"))
    cells.join(broadcast(totals), "event_type")
      .groupBy(col("event_type"))
      .agg(
        max(col("n_early")).as("n_early"), max(col("n_late")).as("n_late"),
        sum(abs(col("ce") * col("n_late") - col("cl") * col("n_early"))).as("l1_num"))
      .select(col("event_type"), col("n_early"), col("n_late"),
        when(col("n_early") > 0 && col("n_late") > 0,
          col("l1_num").cast("double") /
            (col("n_early") * col("n_late")).cast("double"))
          .otherwise(lit(null).cast("double")).as("l1_drift"))
  }

  /** Sketch-based approximate aggregates — HyperLogLog++ distinct counts
    * and approximate quantiles per event type. No DuckDB oracle (sketch
    * algorithms are engine-specific; the driver records a rows-only
    * check): the point is the 100 TB shape — constant-size mergeable
    * state where exact distinct/quantile would shuffle the world. */
  def approxStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.01).as("approx_users"),
        percentile_approx(col("value"), lit(0.5), lit(10000)).as("p50_value"),
        percentile_approx(col("value"), lit(0.99), lit(10000)).as("p99_value")
      )

  /** [[approxStats]] recast as an ORACLED INVARIANT frame — the
    * registered `approx_stats` query. The sketch VALUES are
    * engine-specific (HLL++ registers, KLL-style quantile summaries
    * have no DuckDB counterpart), but their ACCURACY CONTRACTS are
    * plain SQL: per group the frame carries the exact distinct count
    * (hash-gated) plus three booleans asserting each approximation sits
    * inside a bound far looser than its documented error — HLL at
    * rsd = 0.01 within ±5% of exact (5 σ), the accuracy-10000 quantile
    * sketches (rank error ≤ 10⁻⁴) between the exact 0.45/0.55 and
    * 0.985/0.995 quantiles. The oracle emits literal TRUE per group, so
    * any approximation drifting outside its contract hash-mismatches.
    * ApproxStatsSpec keeps gating the raw sketch frame tighter. */
  def approxStatsChecked(spark: SparkSession, dir: String): DataFrame = {
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        expr("percentile(value, 0.45D)").as("p45"),
        expr("percentile(value, 0.55D)").as("p55"),
        expr("percentile(value, 0.985D)").as("p985"),
        expr("percentile(value, 0.995D)").as("p995"))
    approxStats(spark, dir).join(exact, "event_type")
      .select(
        col("event_type"),
        col("n_users"),
        (abs(col("approx_users") - col("n_users")) <=
          col("n_users").cast("double") * lit(0.05)).as("hll_ok"),
        col("p50_value").between(col("p45"), col("p55")).as("p50_ok"),
        col("p99_value").between(col("p985"), col("p995")).as("p99_ok"))
  }

  /** Exact per-group distinct users — the cross-engine anchor for
    * [[approxStats]]'s HLL++ sketch, which is engine-specific and can
    * only get a rows-only check from the oracle. Registered as the
    * `exact_distinct` query, hash-gated in DuckDB at verify scale;
    * ApproxStatsSpec then bounds the sketch against this method's
    * output. Scale: exact distinct is the expensive form (two shuffles:
    * expand on (group, user), then re-aggregate) — that cost is exactly
    * why approxStats exists; this stays for audits. */
  def exactDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events")
      )

  /** Session windows per user (1 h inactivity gap) via lag + running
    * session counter — linear per-partition state, the batch equivalent
    * of `session_window`. */
  def sessionAgg(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // gap compared in exact integer MICROSECONDS on both engines
    // (Spark's timestamp→long cast truncates to seconds — a precision
    // mismatch vs DuckDB's fractional epoch())
    ev.withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 3600000000L, 1L)
          .otherwise(0L)
      )
      .withColumn("session_id", sum(col("new_session")).over(run))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end")
      )
  }

  /** Three-step behavioral funnel (view → click → purchase) with strict
    * temporal ordering: a user converts at step N only with an event
    * strictly AFTER their step-N−1 time. Timestamps compare in exact
    * integer microseconds on both engines (same rationale as
    * [[sessionAgg]]).
    *
    * Scale (100 TB): each step is one user-keyed equijoin + keyed min —
    * the event-type filters push to the scan, the step tables shrink
    * monotonically (step N ⊆ step N−1 users), and nothing ever pairs
    * events with events. The classic window-per-user alternative (sort
    * every user's full history) shuffles the whole event log; this
    * formulation shuffles only per-type projections. */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tus")).as("t_view"))
    val c = ev.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("tus") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("t_click"))
    val p = ev.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("tus") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("tus")).as("t_purchase"))
    def stage(df: DataFrame, step: Int, name: String) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step.toLong).as("step"), lit(name).as("stage"), col("n_users"))
    stage(v, 1, "view")
      .unionAll(stage(c, 2, "click_after_view"))
      .unionAll(stage(p, 3, "purchase_after_click"))
  }

  /** Corpus-relative filter via scalar subqueries: docs longer than the
    * corpus mean length, reported with their distance from it — the
    * "compare each row to a global statistic" shape. Catalyst evaluates
    * each scalar subquery up front as a one-row result that rides the
    * task closure — no join in the plan; each instance is a
    * column-pruned partial-agg scan of the single n_chars column. The
    * mean (exact long sum ÷ count, one double division) is
    * engine-deterministic. */
  def aboveAvgDocs(spark: SparkSession, dir: String): DataFrame =
    withUniqueView(spark, Tables.documents(spark, dir)) { v =>
      spark.sql(
        s"""SELECT doc_id, n_chars,
           |  n_chars - (SELECT CAST(sum(n_chars) AS DOUBLE) / count(*) FROM $v) AS above_by
           |FROM $v
           |WHERE n_chars > (SELECT CAST(sum(n_chars) AS DOUBLE) / count(*) FROM $v)""".stripMargin)
    }

  /** Event-type transition matrix: per user, consecutive event pairs in
    * (ts, event_id) order, counted per (prev → next) cell — first-order
    * Markov structure of the event stream (the path-analysis primitive
    * behind "what do users do after an error?").
    *
    * Scale: one user-keyed window (each user's history sorts within its
    * partition; no global order) and one 2-string-key count. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    // asc_nulls_last pins Spark to DuckDB's ASC default — same latent
    // nulls-ordering trap as quantileBins
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
    Tables.events(spark, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Exact interpolated percentiles per group (p50/p90/p99 of the value
    * distribution by event type) — the latency-SLO shape the reference's
    * Timestream pipeline existed to serve. Spark's `percentile` and
    * DuckDB's `quantile_cont` share the rank = p·(n−1) linear
    * interpolation, verified bit-identical on this data.
    *
    * Scale: exact percentile buffers each group's values (O(group) per
    * key) — right for bounded group counts like per-type SLO panels. For
    * unbounded/corpus-scale groups use the mergeable-sketch path
    * (`approx_stats`); same split as [[quantileBins]]. */
  def groupPercentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        expr("percentile(value, 0.99)").as("p99")
      )

  /** Temporal train/eval split with a leakage audit: cut at the 0.8
    * quantile of event time (the eval window is the most recent 20%),
    * report per-split volumes and how many users appear on BOTH sides —
    * the overlap an eval-contamination review signs off on before a
    * model trains on the past and is scored on the future.
    *
    * Exactness: the cutpoint is the same rank = p·(n−1) interpolation
    * both engines share (proven bit-identical on `group_percentiles`);
    * epoch-microsecond magnitudes (~2⁵¹) stay exactly representable in
    * the double comparison. Scale: one distributed percentile folded to
    * a broadcast row, two distinct aggregations keyed on user_id, and a
    * semi-join-shaped overlap count — no window, no global sort. */
  def timeSplit(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), expr("unix_micros(ts)").as("tus"))
    val cut = ev.agg(expr("percentile(tus, 0.8)").as("cut"))
    val tagged = ev.crossJoin(broadcast(cut)) // 1-row build side: free
      .select(col("user_id"),
        when(col("tus") <= col("cut"), "train").otherwise("eval").as("split"))
    val overlap = tagged.filter(col("split") === "train").select(col("user_id")).distinct()
      .join(tagged.filter(col("split") === "eval")
        .select(col("user_id").as("u2")).distinct(),
        col("user_id") === col("u2"))
      .agg(count(lit(1)).as("n_overlap_users"))
    tagged.groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .crossJoin(broadcast(overlap))
  }

  /** Weekly retention cohorts: users grouped by the week of their FIRST
    * event; for each (cohort_week, weeks_since) cell, how many of the
    * cohort's users were active that week. The `week` is integer
    * epoch-days ÷ 7 (no calendar/timezone dependence — identical
    * arithmetic on every engine, PROVIDED ts >= 1970-01-01: Spark's DIV
    * truncates toward zero while DuckDB's `//` floors, and the two only
    * agree on non-negative epochs; see the oracle-side note in
    * SparkEntry.oracleSql).
    *
    * Scale (100 TB): one user-keyed min to anchor cohorts, one equijoin
    * back onto the (user, week) distinct activity set, one count per
    * cohort cell — all compact-key shuffles; the cohort anchor table is
    * |users|-sized, broadcast-able for any realistic user count. */
  def retentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      // integer DIV, not `/` (double division) — epoch-µs magnitudes sit
      // near the edge of exact double representation
      .select(col("user_id"),
        expr("unix_micros(ts) DIV 86400000000 DIV 7").as("week"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    ev.distinct()
      .join(cohort, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(count(lit(1)).as("n_active_users"))
  }

  /** Exact decile binning of event values: ntile(10) over a total order
    * (value, event_id tie-break), per-bin count/min/max/sum. Exact
    * quantile assignment inherently requires a global order — Spark plans
    * the near-constant-partition Window as a single-partition sort, which
    * is the correct tool at eval scale (bin audits, threshold
    * calibration). At 100 TB the corpus-scale variant is
    * `approx_percentile` cutpoints (see [[approxStats]]) followed by a
    * broadcast range-bucket join; the exact form stays for the
    * sample-sized audits that gate it.
    *
    * NULL routing: NULL values land in a dedicated bin 0, excluded from
    * the decile tiling (the window partitions on `value IS NULL`, so
    * NULLs never consume ntile slots) — the SAME rule as
    * [[quantileBinsScalable]], so the two variants agree the day `value`
    * becomes nullable instead of silently shifting boundaries. */
  def quantileBins(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("value").isNull)
      .orderBy(col("value").asc_nulls_last, col("event_id").asc_nulls_last)
    Tables.events(spark, dir)
      .withColumn("bin",
        when(col("value").isNull, lit(0L))
          .otherwise(ntile(10).over(w).cast("long")))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        sum(col("value").cast(Dec)).cast("double").as("sum_value")
      )
  }

  /** The 100 TB form of [[quantileBins]]: decile CUTPOINTS from one
    * distributed `percentile` aggregate (a 9-double row), then bin
    * assignment as a one-row broadcast against the corpus — a narrow map,
    * no global sort, no window, no single-task stage. Swap `percentile`
    * for `approx_percentile` when the value domain is too wide for the
    * exact aggregate's per-partition value→count map; the join shape is
    * unchanged. Bin semantics deliberately differ from ntile: bin k is
    * the VALUE RANGE (c_{k-1}, c_k] (bin = 1 + #cutpoints below value),
    * so equal values always share a bin — what a threshold-calibration
    * consumer wants, where ntile splits ties across bins to equalize
    * counts. Counts are therefore near-equal, not exactly equal.
    *
    * NULL routing: NULL values land in a dedicated bin 0 (`percentile`
    * already ignores NULLs when computing cutpoints on both engines) —
    * the SAME rule as [[quantileBins]], so the two variants agree on
    * nullable columns by construction. */
  def quantileBinsScalable(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_id"), col("value"))
    val cuts = ev.agg(expr(
      "percentile(value, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("cuts"))
    ev.crossJoin(broadcast(cuts)) // 1-row build side: broadcast is free
      .withColumn("bin",
        when(col("value").isNull, lit(0L))
          .otherwise((size(filter(col("cuts"), qc => col("value") > qc)) + 1).cast("long")))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        sum(col("value").cast(Dec)).cast("double").as("sum_value")
      )
  }

  /** OHLC downsampling: per (event_type, hour) — open (value at the
    * earliest event), high, low, close (value at the latest), count, and
    * the exact decimal volume — the candlestick/decimation query every
    * time-series store ships (Timestream's bin() + first/last shape;
    * reference emits raw points it later rolls up, SURVEY §2 O5).
    *
    * Open/close are deterministic under timestamp ties: the aggregation
    * minimizes/maximizes the lexicographic (ts, event_id, value) struct —
    * ONE hash aggregate, no window, no self-join, so ties break on
    * event_id identically in both engines.
    *
    * Scale (100 TB): a single map-combinable aggregation keyed on the
    * compact (event_type, hour) pair — the [[CoreQueries.hourlyRollup]]
    * shuffle shape; series count × span bounds the output, not the row
    * count. */
  def ohlcAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("hour", expr("unix_micros(ts) div 3600000000"))
      .groupBy(col("event_type"), col("hour"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
        max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
        min(col("value")).as("low"),
        max(col("value")).as("high"),
        count(lit(1)).as("cnt"),
        sum(col("value").cast(Dec)).cast("double").as("volume"))
      .select(
        col("event_type"), col("hour"),
        col("o")("value").as("open"), col("high"), col("low"),
        col("c")("value").as("close"), col("cnt"), col("volume"))

  /** Gap-filled series with linear interpolation — Timestream's
    * INTERPOLATE_LINEAR / FILL over a regular grid, in-engine: per
    * event_type, a dense 10-minute grid from the series' first to last
    * bucket; buckets with data carry their exact mean; empty buckets
    * linearly interpolate between the nearest filled neighbours (edges
    * clamp to the nearest value — Timestream's boundary fill). `filled`
    * marks real vs synthesized points.
    *
    * Exactness: bucket means are DECIMAL sums ÷ counts (one IEEE
    * division); the interpolation weight is an integer-bucket ratio
    * through double — every engine-side double op is written in the
    * same order as the oracle. The neighbour search is two
    * running-extreme windows (last/first IGNORE NULLS), not a self-join.
    *
    * Scale (100 TB): the raw scan folds to (type, bucket) partials
    * map-side; everything after — grid explode, neighbour windows,
    * interpolation — runs on the GRID frame, whose size is
    * series × span (time-bounded), independent of event count. Windows
    * partition by event_type, so no global sort; a series' grid sorts
    * within one task (span ~10⁵ buckets/series at 2 years of 10-min
    * bins — trivially in-memory). */
  /** Exact per-(series, 10-min bucket) means: DECIMAL sums ÷ counts, one
    * IEEE division — the base frame [[gapFill]] and [[anomalyZscore]]
    * share. One map-combinable compact-key aggregation of the raw scan.
    * `private[graft]` so the streaming parity test feeds
    * [[graft.streaming.AnomalyDetect]] the identical frame. */
  private[graft] def bucketMeans(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("b", expr("unix_micros(ts) div 600000000"))
      .groupBy(col("event_type"), col("b"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(Dec)).as("sdec"))
      .withColumn("mv", col("sdec").cast("double") / col("cnt").cast("double"))

  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val means = bucketMeans(spark, dir)
      .select(col("event_type").as("mt"), col("b").as("mb"), col("cnt"), col("mv"))
    val grid = means.groupBy(col("mt"))
      .agg(min(col("mb")).as("b0"), max(col("mb")).as("b1"))
      .select(col("mt").as("event_type"),
        explode(sequence(col("b0"), col("b1"))).as("bucket"))
    // BOTH neighbour searches are RUNNING frames (unbounded-preceding →
    // current): Spark evaluates growing frames incrementally but
    // recomputes shrinking (current → unbounded-following) frames from
    // scratch per row — O(span²) per series (measured 3.5 s vs 0.9 s at
    // sf0.1). The "next filled" search therefore runs the same growing
    // frame over the REVERSED bucket order instead.
    val wAsc = Window.partitionBy(col("event_type")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(col("event_type")).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(means, col("event_type") === col("mt") && col("bucket") === col("mb"), "left")
      .select(col("event_type"), col("bucket"), col("mv"))
      .withColumn("pv", last(col("mv"), ignoreNulls = true).over(wAsc))
      .withColumn("pb", last(when(col("mv").isNotNull, col("bucket")), ignoreNulls = true).over(wAsc))
      .withColumn("nv", last(col("mv"), ignoreNulls = true).over(wDesc))
      .withColumn("nb", last(when(col("mv").isNotNull, col("bucket")), ignoreNulls = true).over(wDesc))
      .withColumn("value",
        when(col("mv").isNotNull, col("mv"))
          .when(col("pb").isNull, col("nv"))
          .when(col("nb").isNull, col("pv"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("bucket") - col("pb")).cast("double") /
              (col("nb") - col("pb")).cast("double"))))
      .select(col("event_type"), col("bucket"),
        col("mv").isNotNull.as("filled"), col("value"))
  }

  /** Rolling z-score anomaly detection — the observability alarm query
    * of the reference's domain: each 10-minute bucket mean scored
    * against the trailing 24 OBSERVED buckets of its own series
    * (`z = (x−μ)/σ`), with a 12-bucket warmup and a flat-window guard.
    * Emits every scored bucket with its z and the `is_anomaly` flag
    * (|z| > 3), so consumers see the score distribution, not just the
    * alarms.
    *
    * Exactness: window sums are the ONE cross-engine hazard here —
    * engines disagree on double summation order inside a frame (segment
    * trees vs running sums) — so the bucket mean is quantized ONCE to
    * `floor(mv·10³)` and the rolling count/sum/sum-of-squares all run on
    * exact BIGINTs. The z formula is restated to keep everything
    * integral until two final IEEE ops:
    * `z = (x·n − Σx) / √(n·Σx² − (Σx)²)` — numerator and radicand are
    * exact BIGINTs, then one division and one correctly-rounded sqrt.
    * Headroom: values ≤ ~500 ⇒ fp ≤ 5·10⁵, n·Σx² ≤ 24²·2.5·10¹¹ ≈
    * 1.4·10¹⁴ — four orders under BIGINT, and ANSI overflow is loud.
    *
    * Scale (100 TB): the raw scan folds map-side to the compact
    * (series, bucket) mean frame; the rolling window partitions by
    * series over that BOUNDED frame (span × series, independent of
    * event count) — never over raw events. */
  def anomalyZscore(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("b"))
      .rowsBetween(-24, -1)
    bucketMeans(spark, dir)
      .withColumn("fp", floor(col("mv") * lit(1000.0)))
      .withColumn("n", count(col("fp")).over(w))
      .withColumn("s", sum(col("fp")).over(w))
      .withColumn("ss", sum(col("fp") * col("fp")).over(w))
      .where(col("n") >= 12 && (col("n") * col("ss") - col("s") * col("s")) > 0)
      .withColumn("z",
        (col("fp") * col("n") - col("s")).cast("double") /
          sqrt((col("n") * col("ss") - col("s") * col("s")).cast("double")))
      .select(
        col("event_type"), col("b").as("bucket"), col("mv"),
        col("n").as("n_window"), col("z"),
        (abs(col("z")) > lit(3.0)).as("is_anomaly"))
  }

  /** Rolling volume anomaly — [[anomalyZscore]]'s sibling on the bucket
    * COUNT instead of the bucket mean: a series whose values look
    * normal but whose event VOLUME spikes (retry storm, replay,
    * upstream fan-out bug) alarms here and nowhere else. Same trailing
    * 24-observed-bucket window, warmup, and flat guard.
    *
    * Exactness: counts are already BIGINTs — no quantization step at
    * all; the z formula is the same two final IEEE ops on exact
    * integers. Headroom: n·Σc² stays under 2⁶³ while per-bucket counts
    * stay under ~6·10⁸ (ANSI loud beyond).
    *
    * Scale: identical to [[anomalyZscore]] — the raw scan folds
    * map-side to the bounded (series, bucket) frame; the window
    * partitions by series. */
  def volumeAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("b"))
      .rowsBetween(-24, -1)
    bucketMeans(spark, dir)
      .withColumn("n", count(col("cnt")).over(w))
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("ss", sum(col("cnt") * col("cnt")).over(w))
      .where(col("n") >= 12 && (col("n") * col("ss") - col("s") * col("s")) > 0)
      .withColumn("z",
        (col("cnt") * col("n") - col("s")).cast("double") /
          sqrt((col("n") * col("ss") - col("s") * col("s")).cast("double")))
      .select(
        col("event_type"), col("b").as("bucket"), col("cnt"),
        col("n").as("n_window"), col("z"),
        (abs(col("z")) > lit(3.0)).as("is_anomaly"))
  }

  /** Per-series rate of change — Timestream's `DERIVATIVE`/`RATE` family
    * (the PromQL-rate shape its dashboards chart): adjacent bucket-mean
    * deltas divided by their time gap in seconds, so a sparse series
    * (missing buckets) divides by the TRUE elapsed time, not the nominal
    * bucket width. First bucket of each series has no predecessor and is
    * dropped, as in every rate() implementation.
    *
    * Exactness: both engines compute the identical IEEE sequence —
    * (mv − prev_mv) is one subtraction of identical doubles, the divisor
    * `(Δb)·600` is exact in double far below 2⁵³ — no quantization
    * needed (unlike the windowed SUMS in [[anomalyZscore]], where
    * frame-sum ORDER differs between engines; a lag touches one value,
    * order never enters).
    *
    * Scale: the lag window partitions by series over the compact bounded
    * mean frame — never raw events. */
  def seriesRate(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("b"))
    bucketMeans(spark, dir)
      .withColumn("pm", lag(col("mv"), 1).over(w))
      .withColumn("pb", lag(col("b"), 1).over(w))
      .where(col("pm").isNotNull)
      .select(col("event_type"), col("b").as("bucket"), col("mv"),
        ((col("mv") - col("pm")) /
          ((col("b") - col("pb")).cast("double") * lit(600.0))).as("rate_per_sec"))
  }

  /** Seasonal (hour-of-day) anomaly detection — the profile complement to
    * [[anomalyZscore]]'s trailing window: each bucket mean is scored
    * against ALL observations of its own (series, hour-of-day) cell, so
    * a 3 a.m. burst that would hide inside a trailing-4-hour window
    * stands out against every other 3 a.m. The reference's Timestream
    * consumers express exactly this as scheduled dashboard queries.
    *
    * Same integral restatement as [[anomalyZscore]] (quantize once,
    * BIGINT count/sum/sum-of-squares — group-sum order differs between
    * engines — two final IEEE ops), with the population form including
    * the scored bucket in its own profile: `z = (x·n − Σx)/√(n·Σx² −
    * (Σx)²)`, warmup n ≥ 8, flat-profile guard.
    *
    * Scale: the profile is series × 24 rows — broadcast back over the
    * compact mean frame, so beyond [[bucketMeans]]' own map-side fold
    * the only shuffle is the profile's (series, hod) aggregation of the
    * bounded frame. */
  def seasonalAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val m = bucketMeans(spark, dir)
      .withColumn("fp", floor(col("mv") * lit(1000.0)))
      .withColumn("hod", expr("(b % 144) div 6"))
    val prof = m.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("n"), sum(col("fp")).as("s"),
        sum(col("fp") * col("fp")).as("ss"))
    m.join(broadcast(prof), Seq("event_type", "hod"))
      .where(col("n") >= 8 && (col("n") * col("ss") - col("s") * col("s")) > 0)
      .withColumn("z",
        (col("fp") * col("n") - col("s")).cast("double") /
          sqrt((col("n") * col("ss") - col("s") * col("s")).cast("double")))
      .select(col("event_type"), col("b").as("bucket"), col("hod"), col("mv"),
        col("z"), (abs(col("z")) > lit(3.0)).as("is_anomaly"))
  }

  /** Wide→narrow unpivot (melt) of a per-series stats frame — the
    * relational surface Timestream's data model is BUILT on: the
    * reference stores one narrow (measure_name, measure_value) row per
    * metric (TimestreamPoint, SURVEY §2 O2), and converting a wide
    * aggregate into that shape is `Dataset.unpivot` — Spark's native
    * melt, planned as a single Expand over the aggregate (no join, no
    * union re-scan).
    *
    * Exactness: the four measures are count (exact), min/max (exact
    * picks), and the decimal-sum-cast-double rule; the unpivot itself
    * moves values without arithmetic.
    *
    * Scale: one map-combinable aggregation on the series key, then an
    * Expand over the series-count-sized frame — 4 rows out per series,
    * independent of event count. */
  def unpivotStats(spark: SparkSession, dir: String): DataFrame = {
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).cast("double").as("n_events"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        sum(col("value").cast(Dec)).cast("double").as("sum_value"))
      .unpivot(
        Array(col("event_type")),
        Array(col("n_events"), col("min_value"), col("max_value"), col("sum_value")),
        "metric", "value")
  }

  /** Additive seasonal decomposition per series — the classic
    * trend + seasonal + residual split (what Timestream consumers chart
    * before picking an anomaly detector): trend is a centered ±12-bucket
    * rolling mean, the seasonal component is the hour-of-day profile of
    * the DETRENDED series, and the residual is what's left. Edge buckets
    * without a full-enough window (n < 13) drop out.
    *
    * Exactness: the trend frame sums run on `floor(mv·10³)` BIGINTs
    * (frame-sum order differs between engines on doubles), then ONE
    * division; the detrended value re-quantizes ONCE — `floor(detr)`
    * keeps the same milli-unit scale as `fp` (detr is already
    * milli-units; a second ·10³ here would leave the profile in
    * micro-units and report seasonal 1000× too large), and flooring
    * bit-identical doubles is bit-identical — so the profile's group
    * sums are again exact BIGINTs. Every residual double op is written
    * in the same order as the oracle.
    *
    * Scale: two windows and one (series, hod) profile aggregation, all
    * over the compact bounded mean frame; the 120-row profile broadcasts
    * back — [[seasonalAnomaly]]'s shuffle shape plus one rolling
    * window. Never raw events. */
  def seriesDecompose(spark: SparkSession, dir: String): DataFrame = {
    val wT = Window.partitionBy(col("event_type")).orderBy(col("b"))
      .rowsBetween(-12, 12)
    val m = bucketMeans(spark, dir)
      .withColumn("fp", floor(col("mv") * lit(1000.0)))
      .withColumn("nt", count(col("fp")).over(wT))
      .withColumn("st", sum(col("fp")).over(wT))
      .where(col("nt") >= 13)
      .withColumn("trend_fp", col("st").cast("double") / col("nt").cast("double"))
      .withColumn("detr", col("fp").cast("double") - col("trend_fp"))
      .withColumn("dq", floor(col("detr")))
      .withColumn("hod", expr("(b % 144) div 6"))
    val prof = m.groupBy(col("event_type"), col("hod"))
      .agg(count(lit(1)).as("np"), sum(col("dq")).as("sp"))
    m.join(broadcast(prof), Seq("event_type", "hod"))
      .withColumn("seasonal_fp", col("sp").cast("double") / col("np").cast("double"))
      .select(col("event_type"), col("b").as("bucket"), col("mv"),
        (col("trend_fp") / lit(1000.0)).as("trend"),
        (col("seasonal_fp") / lit(1000.0)).as("seasonal"),
        ((col("detr") - col("seasonal_fp")) / lit(1000.0)).as("residual"))
  }

  /** Pairwise Pearson correlation between event series over aligned
    * bucket means — the "which metrics move together" dashboard staple
    * (Timestream's CORR over interpolated series; cf.
    * StreamingJob.java:39's per-type windowing, which this cross-series
    * view complements). Buckets where both series observed data align
    * on the bucket id; each unordered pair reports once (et_a < et_b).
    *
    * Exactness: means quantize once to centi-units (`floor(mv·100)`),
    * then every moment (n, Σx, Σy, Σxy, Σx², Σy²) is a BIGINT — group
    * order can't perturb integer sums — and the Pearson form
    * `(n·Σxy − ΣxΣy)/√((n·Σx² − (Σx)²)·(n·Σy² − (Σy)²))` runs as three
    * exact BIGINT terms and three final IEEE ops (two casts-products,
    * one sqrt), identical in both engines. Centi-quantization keeps
    * `n·Σx²` under 2⁶³ out to ~10⁸ aligned buckets per pair (values
    * ≤ ~500): two years of 1-second buckets.
    *
    * Scale: the mean frame is series × buckets — already folded
    * map-side from raw events. One side broadcasts (series count is
    * bounded); the pair space is (series choose 2) rows out. With an
    * unbounded series dimension this becomes a shuffle equijoin on the
    * bucket id; nothing else changes. */
  /** Rolling exact median smoother — Timestream's robust-smoothing
    * counterpart to [[anomalyZscore]]'s mean/σ window: each bucket mean
    * against the trailing 24 OBSERVED buckets (current inclusive) of its
    * own series, 12-bucket warmup. The median is the robust location
    * estimate dashboards overlay when spikes make the mean useless.
    *
    * Exactness: engines disagree on percentile INTERPOLATION order, so
    * the median is never computed by an engine aggregate. The frame's
    * quantized means (`floor(mv·10³)` BIGINTs) are collected, sorted,
    * and the two middle elements picked by integer index — `med_x2 =
    * arr[(n+1) div 2] + arr[(n+2) div 2]` is an exact BIGINT in both
    * engines (odd n: twice the middle; even n: sum of the two middles),
    * and the reported `median` is one final IEEE division by 2000.
    *
    * Scale (100 TB): the raw scan folds map-side to the compact
    * (series, bucket) mean frame; the collect+sort window touches ≤ 24
    * BIGINTs per row of that BOUNDED frame (span × series, independent
    * of event count) — never raw events. */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("b"))
      .rowsBetween(-23, Window.currentRow)
    bucketMeans(spark, dir)
      .withColumn("fp", floor(col("mv") * lit(1000.0)))
      .withColumn("arr", array_sort(collect_list(col("fp")).over(w)))
      .withColumn("n", size(col("arr")))
      .where(col("n") >= 12)
      .withColumn("med_x2",
        expr("element_at(arr, cast((n + 1) div 2 as int)) + element_at(arr, cast((n + 2) div 2 as int))"))
      .select(col("event_type"), col("b").as("bucket"), col("mv"),
        col("n").cast("long").as("n_window"), col("med_x2"),
        (col("med_x2").cast("double") / lit(2000.0)).as("median"))
  }

  /** Lag-1 autocorrelation per series — the "is this metric trending or
    * noise" dashboard statistic (Timestream models it as CORR of a
    * series against its own LAG): Pearson r between each bucket mean
    * and its predecessor, per event_type.
    *
    * Exactness: identical discipline to [[seriesCorrelation]] — means
    * centi-quantize once, all six moments (n, Σx, Σy, Σxy, Σx², Σy²)
    * are BIGINTs (group-sum order can't perturb integer sums), then
    * three final IEEE ops. Same 2⁶³ headroom: ~10⁸ buckets per series.
    *
    * Scale: one lag window partitioned by series over the compact
    * bounded mean frame, one map-combinable aggregation keyed on the
    * series id — never raw events. */
  def seriesAutocorr(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("b"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    bucketMeans(spark, dir)
      .withColumn("fp", floor(col("mv") * lit(100.0)))
      .withColumn("pf", lag(col("fp"), 1).over(w))
      .where(col("pf").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("fp")).as("sx"), sum(col("pf")).as("sy"),
        sum(col("fp") * col("pf")).as("sxy"),
        sum(col("fp") * col("fp")).as("sxx"),
        sum(col("pf") * col("pf")).as("syy"))
      .where(col("n") >= 2 && vx > 0 && vy > 0)
      .select(col("event_type"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt(vx.cast("double") * vy.cast("double"))).as("autocorr_lag1"))
  }

  /** Top-10 three-step event paths across all users — the sequence-mining
    * read beside [[eventTransitions]]' bigram matrix: which exact
    * view→click→purchase-style trigrams dominate user behavior. Two
    * leads per user-keyed window (each user's event sequence in (ts,
    * event_id) order), then a |types|³-bounded count and a
    * TakeOrderedAndProject top-10 under the total (cnt desc, path asc)
    * order.
    *
    * Scale: the window partitions by user_id (compact key, bounded
    * per-user history); the trigram aggregate has at most |event_types|³
    * groups, folded map-side. */
  def pathTopk(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .where(col("e2").isNotNull && col("e3").isNotNull)
      .groupBy(col("event_type").as("step1"), col("e2").as("step2"),
        col("e3").as("step3"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("step1").asc, col("step2").asc, col("step3").asc)
      .limit(10)
  }

  /** Dominant-period detection per series — "does this metric have a
    * cycle, and how long is it": Pearson autocorrelation r(L) swept over
    * candidate lags (every 10-min lag to 8 h, then 12 h/16 h/20 h/1 day/
    * 28 h), reporting the argmax lag per series. The poor-man's
    * periodogram: a daily-cycled series peaks at L = 144, white noise
    * peaks nowhere in particular with r ≈ 0 — the read that tells a
    * monitoring pipeline whether [[seasonalAnomaly]]'s hour-of-day
    * profile is even applicable.
    *
    * Exactness: [[seriesAutocorr]]'s discipline per (series, lag) —
    * centi-quantized means, six BIGINT moments, three final IEEE ops;
    * the argmax compares identical doubles in both engines with the
    * (r desc, lag asc) total order. Degenerate lags (n < 2 or zero
    * variance) drop before ranking.
    *
    * Scale (100 TB): the lag sweep multiplies the COMPACT mean frame
    * (|lags| × buckets-per-series rows of three BIGINTs), never raw
    * events; alignment is an equijoin on (series, bucket+lag); moments
    * fold map-side; the rank window sees |series| × |lags| rows. */
  def dominantPeriod(spark: SparkSession, dir: String): DataFrame = {
    val lagSet = ((1 to 48) ++ Seq(72, 96, 120, 144, 168)).map(_.toLong)
    val m = bucketMeans(spark, dir)
      .select(col("event_type"), col("b"), floor(col("mv") * lit(100.0)).as("fp"))
    val right = m.select(col("event_type").as("rt"), col("b").as("rb"),
      col("fp").as("y"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    val scored = m
      .select(col("event_type"), col("b"), col("fp").as("x"),
        explode(array(lagSet.map(lit): _*)).as("lg"))
      .join(right, col("event_type") === col("rt") &&
        col("rb") === col("b") + col("lg"))
      .groupBy(col("event_type"), col("lg"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .where(col("n") >= 2 && vx > 0 && vy > 0)
      .select(col("event_type"), col("lg"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt(vx.cast("double") * vy.cast("double"))).as("r"))
    val wr = Window.partitionBy(col("event_type"))
      .orderBy(col("r").desc, col("lg").asc)
    scored
      .withColumn("rn", row_number().over(wr)).where(col("rn") === 1)
      .select(col("event_type"), col("lg").as("best_lag"),
        col("n").as("n_pairs"), col("r").as("autocorr"))
  }

  /** CUSUM change-point detection per series — "when did this metric's
    * level shift": the classic cumulative-sum statistic Sᵢ = Σ₁..ᵢ(xⱼ−x̄)
    * maximized in absolute value over the series; the reported bucket is
    * the maximum-likelihood single change point.
    *
    * Exactness: the statistic is restated scale-free as
    * `S·n = n·prefixΣ(fp) − i·totalΣ(fp)` — every term a BIGINT (means
    * quantized once to milli-units), so prefix-sum order can't perturb
    * it; ties on |S·n| break on the earliest bucket via an explicit
    * row_number. `cusum_norm = |S·n|/(n²·10³)` (the mean absolute level
    * shift in value units) is one final IEEE division. Headroom:
    * n·prefixΣ ≤ n²·5·10⁵ ⇒ exact to ~4·10⁶ buckets/series; ANSI
    * overflow is loud beyond.
    *
    * Scale: per-series totals fold to one row per series and broadcast
    * back; the prefix window partitions by series over the compact
    * bounded mean frame; the argmax is a WindowGroupLimit-prunable
    * rank-1 pick. Never raw events. */
  def seriesCusum(spark: SparkSession, dir: String): DataFrame = {
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("b"))
    val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = bucketMeans(spark, dir)
      .withColumn("fp", floor(col("mv") * lit(1000.0)))
    val tot = m.groupBy(col("event_type").as("tet"))
      .agg(count(lit(1)).as("ntot"), sum(col("fp")).as("stot"))
    val wPick = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("s")).desc, col("b").asc)
    m.join(broadcast(tot), col("event_type") === col("tet"))
      .withColumn("i", row_number().over(wOrd).cast("long"))
      .withColumn("ps", sum(col("fp")).over(wRun))
      .withColumn("s", col("ntot") * col("ps") - col("i") * col("stot"))
      .withColumn("rn", row_number().over(wPick))
      .where(col("rn") === 1)
      .select(col("event_type"), col("b").as("change_bucket"),
        col("ntot").as("n_buckets"), col("s").as("cusum_xn"),
        (abs(col("s")).cast("double") /
          (col("ntot").cast("double") * col("ntot").cast("double") * lit(1000.0)))
          .as("cusum_norm"))
  }

  /** The truncated α=1/4 EWMA kernel: exact-rational weights
    * α(1−α)^j·4⁸ = 3^j·4^(7−j) for j = 0..7 — shared with the streaming
    * twin ([[graft.streaming.EwmaSmooth]]) and the DuckDB oracle
    * generator so every consumer folds the identical integers. */
  private[graft] val EwmaWeights: IndexedSeq[Long] = (0 until 8).map(j =>
    BigInt(3).pow(j).toLong * BigInt(4).pow(7 - j).toLong)

  /** Truncated exponentially-weighted moving average + one-step forecast
    * error per series — the smoothing/forecast primitive Timestream
    * consumers chart next to the raw series (EWMA is also the basis of
    * the classic EWMA control chart). α = 1/4 over the last 8 observed
    * buckets: weights α(1−α)^j, j = 0..7, are exact rationals with
    * common denominator 4⁸ — w_j = 3^j·4^(7−j) as BIGINTs — and are
    * renormalized over the lags actually present, so series heads (< 8
    * buckets of history) use a properly-normalized truncated kernel
    * instead of leaking weight to nothing.
    *
    * Exactness: bucket means quantize ONCE to milli-unit BIGINTs
    * (`floor(mv·10³)`); the weighted numerator/denominator are pure
    * BIGINT lag sums written termwise (no frame aggregation — lag order
    * cannot differ between engines); then exactly two IEEE divisions in
    * fixed order. `forecast_err = mv − lag(ewma)` subtracts bitwise
    * identical doubles.
    *
    * Scale: one row-lag window over the compact bounded mean frame,
    * partitioned by series — the [[seriesRate]] shuffle shape. Lags are
    * by OBSERVED row, not nominal bucket (a sparse series smooths over
    * its observations; [[gapFill]] is the densify step if nominal-bucket
    * smoothing is wanted). */
  def seriesEwma(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("b"))
    val weights = EwmaWeights
    val lags = weights.indices.map(j =>
      if (j == 0) col("fp") else lag(col("fp"), j).over(w))
    val num = weights.zip(lags).map { case (wj, l) =>
      when(l.isNotNull, l * lit(wj)).otherwise(lit(0L))
    }.reduce(_ + _)
    val den = weights.zip(lags).map { case (wj, l) =>
      when(l.isNotNull, lit(wj)).otherwise(lit(0L))
    }.reduce(_ + _)
    bucketMeans(spark, dir)
      .withColumn("fp", floor(col("mv") * lit(1000.0)))
      .withColumn("ewma",
        num.cast("double") / den.cast("double") / lit(1000.0))
      .withColumn("forecast_err", col("mv") - lag(col("ewma"), 1).over(w))
      .select(col("event_type"), col("b").as("bucket"), col("mv"),
        col("ewma"), col("forecast_err"))
  }

  /** Brown's linear (double) exponential smoothing per series — the
    * trend-aware upgrade of [[seriesEwma]]: smooth the milli-quantized
    * bucket means twice with the SAME truncated α=1/4 kernel
    * ([[EwmaWeights]]), then level = 2·S1 − S2 and trend =
    * (S1 − S2)/D, giving the one-step-ahead forecast level + trend.
    * D = Σⱼ j·wⱼ / Σⱼ wⱼ is the TRUNCATED kernel's exact mean lag
    * (124437/58975 ≈ 2.11; the untruncated geometric kernel's limit is
    * (1−α)/α = 3) — dividing by the textbook 3 instead would
    * under-forecast every trending series by c·(1 − D/3) per step, which
    * the linear-series spec catches. Where plain EWMA lags a trending
    * series by D buckets, Brown's recovers the slope from the gap
    * between the two smoothings — the standard next step before
    * reaching for Holt-Winters.
    *
    * Exactness: S1 is the termwise BIGINT lag kernel divided ONCE by
    * exact floor-division (`div` — numerators are non-negative, the
    * fixture invariant value ≥ 0, so Spark's truncating `div` and
    * DuckDB's flooring `//` agree) and re-quantized to milli-unit
    * BIGINTs; S2 repeats the identical kernel over s1q. Level/trend/
    * forecast are fixed-order IEEE expressions over those two integers.
    *
    * Scale: two row-lag windows over the compact per-series mean frame —
    * the [[seriesEwma]] shuffle shape, one partition pass each. */
  def holtForecast(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("b"))
    val weights = EwmaWeights
    def kernel(c: Column): (Column, Column) = {
      val lags = weights.indices.map(j => if (j == 0) c else lag(c, j).over(w))
      val num = weights.zip(lags).map { case (wj, l) =>
        when(l.isNotNull, l * lit(wj)).otherwise(lit(0L))
      }.reduce(_ + _)
      val den = weights.zip(lags).map { case (wj, l) =>
        when(l.isNotNull, lit(wj)).otherwise(lit(0L))
      }.reduce(_ + _)
      (num, den)
    }
    val base = bucketMeans(spark, dir)
      .withColumn("fp", floor(col("mv") * lit(1000.0)).cast("long"))
    val (n1, d1) = kernel(col("fp"))
    val s1 = base
      .withColumn("n1", n1).withColumn("d1", d1)
      .withColumn("s1q", expr("n1 div d1"))
    val (n2, d2) = kernel(col("s1q"))
    // exact mean lag of the truncated kernel: D = lagNum/lagDen
    val lagNum = weights.zipWithIndex.map { case (wj, j) => wj * j }.sum
    val lagDen = weights.sum
    val trend =
      ((col("s1q") - col("s2q")) * lit(lagDen)).cast("double") / lit(lagNum * 1000.0)
    val level = (lit(2L) * col("s1q") - col("s2q")).cast("double") / lit(1000.0)
    s1
      .withColumn("n2", n2).withColumn("d2", d2)
      .withColumn("s2q", expr("n2 div d2"))
      .select(col("event_type"), col("b").as("bucket"), col("mv"),
        (col("s1q").cast("double") / lit(1000.0)).as("s1"),
        (col("s2q").cast("double") / lit(1000.0)).as("s2"),
        level.as("level"),
        trend.as("trend"),
        (level + trend).as("forecast_next"))
  }

  /** Robust (median/MAD) outlier scoring per series — the
    * Iglewicz–Hoaglin modified z-score `0.6745·(x − med)/MAD` with the
    * standard |z| > 3.5 cutoff, over the bucket-mean frame. The robust
    * complement to [[anomalyZscore]]'s mean/σ: one wild bucket inflates
    * a trailing σ and can mask ITSELF (masking); the median and MAD
    * barely move, so the same bucket stands out. The pair
    * (anomaly_zscore, robust_zscore) is the classic
    * detection-cross-check before alerting on either.
    *
    * Exactness: medians are sorted-array middle picks on milli-quantized
    * BIGINTs — never an engine percentile (interpolation order differs,
    * see [[rollingMedian]]) — kept in ×2 units (sum of the two middles)
    * so no half-integer ever exists: `med_x2 = arr[(n+1)/2]+arr[(n+2)/2]`,
    * per-bucket deviation `|2·fp − med_x2|` (exact), `mad_x4` the same
    * double-middle pick over the deviations (×4 units). The final score
    * performs IEEE ops in one fixed order:
    * `z = 0.6745 · (2·(2·fp − med_x2)) / mad_x4` — both engines divide
    * identical integers. Flat series (mad_x4 = 0) emit no score rows.
    *
    * Scale (100 TB): the per-series collect+sort touches the COMPACT
    * bounded mean frame (buckets per series, not events), same as
    * [[seriesCusum]]'s totals; the two series-level picks broadcast
    * back. Raw events fold map-side to (series, bucket) partials before
    * anything else. */
  def robustZscore(spark: SparkSession, dir: String): DataFrame = {
    // all-NULL buckets (mv = NULL → fp = NULL) are unscoreable and are
    // excluded EXPLICITLY on both engines — relying on collect_list's
    // silent NULL drop would desync n from the array and shift (or,
    // under ANSI, overrun) the middle picks; n = size(arr) is the
    // rollingMedian discipline
    val m = bucketMeans(spark, dir)
      .withColumn("fp", floor(col("mv") * lit(1000.0)))
      .where(col("fp").isNotNull)
    val med = m.groupBy(col("event_type"))
      .agg(array_sort(collect_list(col("fp"))).as("arr"))
      .withColumn("n", size(col("arr")).cast("long"))
      .select(col("event_type").as("mt"),
        expr("element_at(arr, cast((n + 1) div 2 as int)) + element_at(arr, cast((n + 2) div 2 as int))").as("med_x2"),
        col("n"))
    val dev = m.join(broadcast(med), col("event_type") === col("mt"))
      .withColumn("dev_x2", abs(col("fp") * 2 - col("med_x2")))
    val mad = dev.groupBy(col("event_type"))
      .agg(array_sort(collect_list(col("dev_x2"))).as("darr"))
      .withColumn("dn", size(col("darr")).cast("long"))
      .select(col("event_type").as("dt"),
        expr("element_at(darr, cast((dn + 1) div 2 as int)) + element_at(darr, cast((dn + 2) div 2 as int))").as("mad_x4"))
    dev.join(broadcast(mad), col("event_type") === col("dt"))
      .where(col("mad_x4") > 0 && col("n") >= 12)
      .withColumn("robust_z",
        lit(0.6745) * (col("fp") * 2 - col("med_x2")).cast("double") * lit(2.0) /
          col("mad_x4").cast("double"))
      .select(col("event_type"), col("b").as("bucket"), col("mv"),
        col("med_x2"), col("mad_x4"), col("robust_z"),
        (abs(col("robust_z")) > lit(3.5)).as("is_anomaly"))
  }

  /** Per-series winsorization — clamp each event's value into its own
    * series' [p05, p95] band, flagging what was clipped on either side.
    * The robust-cleaning pass a metrics/training pipeline runs before
    * any mean-based aggregate (a single stuck sensor or retry storm
    * otherwise drags every downstream average); the flags feed the
    * data-quality report, the clamped column feeds the aggregates.
    *
    * Exactness: the cutpoints come from Spark's exact `percentile`
    * (rank = p·(n−1) linear interpolation — proven bit-identical to
    * DuckDB's `quantile_cont` on `group_percentiles`); the clamp and
    * flags are comparisons/copies of identical doubles, and NULL values
    * pass through as NULL with NULL flags in both engines.
    *
    * Scale (100 TB): one map-combinable per-series percentile aggregate
    * (series-count-sized frame) broadcast back onto the scan; the clamp
    * is a narrow map — no window, no sort, no corpus shuffle. Swap
    * `percentile` for `approx_percentile` when the per-partition
    * value→count map outgrows memory; the join shape is unchanged. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    val cuts = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.05, 0.95))").as("cuts"))
      .select(col("event_type").as("ct"),
        col("cuts")(0).as("lo"), col("cuts")(1).as("hi"))
    Tables.events(spark, dir)
      .join(broadcast(cuts), col("event_type") === col("ct"))
      .select(col("event_id"), col("event_type"), col("value"),
        when(col("value") < col("lo"), col("lo"))
          .when(col("value") > col("hi"), col("hi"))
          .otherwise(col("value")).as("winsorized"),
        (col("value") < col("lo")).as("clipped_low"),
        (col("value") > col("hi")).as("clipped_high"))
  }

  /** Activity concentration (Gini) per event type — the inequality audit
    * that catches a feed dominated by a handful of users (bots, test
    * rigs, one scripted tenant) before any per-user cap fires. Exact,
    * with ties handled by construction: fold to per-(type, user) counts,
    * then to the (type, count-value, frequency) HISTOGRAM — for a run of
    * f users sharing count c starting after cumulative position p,
    * Σ rank·x over the run is c·(f·p + f(f+1)/2) in closed form, so the
    * sorted-rank sum needs only a cumulative-frequency window over the
    * tiny distinct-count frame, never a per-user rank. G = 2Σrank·x /
    * (n·Σx) − (n+1)/n, two IEEE divisions at the end.
    *
    * Scale: per-(type, user) counts fold map-side; the histogram frame
    * is |distinct count values| rows (bounded by max per-user activity,
    * not by users); the only window runs over that frame, partitioned by
    * type. */
  def activityGini(spark: SparkSession, dir: String): DataFrame = {
    val uc = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    val h = uc.groupBy(col("event_type"), col("c"))
      .agg(count(lit(1)).as("f"))
      .withColumn("p", coalesce(sum(col("f")).over(
        Window.partitionBy(col("event_type")).orderBy(col("c"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    h.groupBy(col("event_type"))
      .agg(
        sum(col("f")).as("n_users"),
        sum(col("c") * col("f")).as("total_events"),
        sum(col("c") * (col("f") * col("p") +
          expr("f * (f + 1) div 2"))).as("ranked"))
      .selectExpr("event_type", "n_users", "total_events",
        """2.0 * CAST(ranked AS DOUBLE)
          |  / (CAST(n_users AS DOUBLE) * CAST(total_events AS DOUBLE))
          |- CAST(n_users + 1 AS DOUBLE) / CAST(n_users AS DOUBLE) AS gini""".stripMargin)
  }

  /** Mann–Whitney U between the hash variants, per event type — the
    * rank-based nonparametric complement to [[abZtest]]: it detects a
    * distribution shift in `value` without assuming normality, and one
    * gross outlier moves it by at most one rank. Exact via the same
    * histogram closed form as [[activityGini]]: U = Σ_v f1(v)·(F0(<v) +
    * f0(v)/2) over the DISTINCT-VALUE histogram (ties contribute the
    * standard half), computed as 2U in BIGINTs so the halves stay
    * integer. Values quantize to centi-units first, bounding the
    * histogram by the VALUE DOMAIN rather than the corpus — the window
    * that ranks it never sees a per-event frame. The normal
    * approximation z (tie-uncorrected, documented) is two fixed-order
    * IEEE ops on exact integers.
    *
    * Scale: per-(type, centi-value, variant) counts fold map-side; the
    * only window runs over the domain-bounded histogram, partitioned by
    * type. */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.events(spark, dir).select(
      col("event_type"),
      pmod(col("user_id"), lit(2L)).as("variant"),
      floor(col("value") * lit(100.0)).cast("long").as("qv"))
    val h = q.groupBy(col("event_type"), col("qv"))
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("f0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("f1"))
      .withColumn("cum0", coalesce(sum(col("f0")).over(
        Window.partitionBy(col("event_type")).orderBy(col("qv"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    h.groupBy(col("event_type"))
      .agg(
        sum(col("f0")).as("n0"), sum(col("f1")).as("n1"),
        sum(col("f1") * (lit(2L) * col("cum0") + col("f0"))).as("u2"))
      .selectExpr("event_type", "n0", "n1",
        "CAST(u2 AS DOUBLE) / 2.0 AS u",
        """(CAST(u2 AS DOUBLE) / 2.0 - CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE) / 2.0)
          |/ sqrt(CAST(n0 AS DOUBLE) * CAST(n1 AS DOUBLE)
          |       * CAST(n0 + n1 + 1 AS DOUBLE) / 12.0) AS z""".stripMargin)
  }

  /** Two-sample Kolmogorov–Smirnov D between the hash variants, per
    * event type — completes the distribution-test trio ([[abZtest]]
    * parametric, [[mannWhitney]] rank, this one distributional): D =
    * max_v |F1(v) − F0(v)| catches shape changes (variance, bimodality)
    * that leave means and mean ranks untouched. EXACT: over the same
    * centi-quantized domain-bounded histogram, D's numerator is
    * max_v |C1(v)·n0 − C0(v)·n1| in BIGINTs (cross-multiplying the two
    * empirical CDFs clears both denominators), with ONE terminal
    * division by n0·n1 — no float CDFs to drift. The value where the
    * max is attained rides along (ties broken to the smallest value,
    * deterministic) — where the two distributions diverge most, which
    * is what an investigation looks at first.
    *
    * Scale: same shape as [[mannWhitney]] — map-side histogram fold,
    * one cumulative window over the domain-bounded frame per type. */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    val q = Tables.events(spark, dir).select(
      col("event_type"),
      pmod(col("user_id"), lit(2L)).as("variant"),
      floor(col("value") * lit(100.0)).cast("long").as("qv"))
    val h = q.groupBy(col("event_type"), col("qv"))
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("f0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("f1"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("qv"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = h
      .withColumn("c0", sum(col("f0")).over(w))
      .withColumn("c1", sum(col("f1")).over(w))
    val per = cum.groupBy(col("event_type"))
      .agg(max(col("c0")).as("n0"), max(col("c1")).as("n1"))
    val scored = cum.join(per, "event_type")
      .withColumn("dnum", abs(col("c1") * col("n0") - col("c0") * col("n1")))
    val dmax = scored.groupBy(col("event_type")).agg(max(col("dnum")).as("d_num"))
    scored.join(dmax, "event_type")
      .where(col("dnum") === col("d_num"))
      .groupBy(col("event_type"), col("n0"), col("n1"), col("d_num"))
      .agg(min(col("qv")).as("at_qv"))
      .select(col("event_type"), col("n0"), col("n1"),
        (col("d_num").cast("double") /
          (col("n0").cast("double") * col("n1").cast("double"))).as("ks_d"),
        (col("at_qv").cast("double") / lit(100.0)).as("at_value"))
  }

  /** CUPED variance-reduced A/B readout (Deng et al., WSDM 2013) — the
    * experimentation-analytics op: adjust each variant's post-period
    * metric by the pre-period covariate, `adj = ȳ_v − θ·(x̄_v − x̄)`,
    * with θ = cov(x, y)/var(x) estimated pooled. Here variant =
    * user_id % 2 (a deterministic hash split), the pre/post boundary is
    * the corpus time midpoint, and the unit metric is the per-user MEAN
    * value in each period (means stay bounded by the value domain, so
    * the fixed-point moments never approach BIGINT range at any scale —
    * per-user SUMS would). Users lacking either period drop, as a real
    * CUPED pipeline drops covariate-less units. All moments are exact
    * integer sums; θ, ρ² (the variance-reduction fraction), and the
    * adjusted means are fixed-order IEEE ops mirrored in the oracle.
    *
    * Scale: one conditional aggregation per user under a one-row
    * midpoint broadcast (compact user frame), one 1-row moment fold
    * broadcast back over the 2-row variant aggregate. */
  def cupedAb(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("value"), expr("unix_millis(ts)").as("ms"))
    val mid = ev.agg(expr("(min(ms) + max(ms)) div 2").as("mid_ms"))
    val users = ev.crossJoin(broadcast(mid))
      .groupBy(col("user_id"))
      .agg(
        count(when(col("ms") < col("mid_ms"), 1)).as("nx"),
        sum(when(col("ms") < col("mid_ms"), col("value").cast(Dec))).as("sx_dec"),
        count(when(col("ms") >= col("mid_ms"), 1)).as("ny"),
        sum(when(col("ms") >= col("mid_ms"), col("value").cast(Dec))).as("sy_dec"))
      .where(col("nx") > 0 && col("ny") > 0)
      .select(col("user_id"), pmod(col("user_id"), lit(2L)).as("variant"),
        floor((col("sx_dec").cast("double") / col("nx").cast("double")) * lit(100.0))
          .cast("long").as("x"),
        floor((col("sy_dec").cast("double") / col("ny").cast("double")) * lit(100.0))
          .cast("long").as("y"))
    val m = users.agg(
      count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
      .selectExpr("n", "sx",
        """CASE WHEN n * sxx - sx * sx = 0 THEN NULL
          |ELSE CAST(n * sxy - sx * sy AS DOUBLE)
          |     / CAST(n * sxx - sx * sx AS DOUBLE) END AS theta""".stripMargin,
        """CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
          |ELSE (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
          |     / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
          |END AS rho2""".stripMargin)
    users.crossJoin(broadcast(m))
      .groupBy(col("variant"), col("n").as("n_total"),
        col("sx").as("sx_all"), col("theta"), col("rho2"))
      .agg(count(lit(1)).as("n_users"), sum("x").as("svx"), sum("y").as("svy"))
      .selectExpr("variant", "n_users", "theta", "rho2",
        "CAST(svy AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0 AS mean_post",
        "CAST(svx AS DOUBLE) / CAST(n_users AS DOUBLE) / 100.0 AS mean_pre",
        """(CAST(svy AS DOUBLE) / CAST(n_users AS DOUBLE)
          | - theta * (CAST(svx AS DOUBLE) / CAST(n_users AS DOUBLE)
          |            - CAST(sx_all AS DOUBLE) / CAST(n_total AS DOUBLE))) / 100.0
          |  AS mean_adj""".stripMargin)
  }

  /** Two-proportion z-test + sample-ratio-mismatch check — the readout
    * that accompanies [[cupedAb]] in any experimentation pipeline. The
    * unit is the observed USER-DAY (every user converts eventually on
    * this fixture — the per-user rate is degenerate at 1.0; daily
    * conversion sits at ~0.40), conversion = "≥1 purchase that day",
    * variant = user_id % 2. Pooled z = (p1 − p0)/√(p̂(1−p̂)(1/n0 +
    * 1/n1)), and the SRM chi-square of the observed unit split against
    * 50/50 (a large value means the assignment itself is broken and the
    * z is meaningless — the first gate a trustworthy readout checks).
    * The z is reported, not a p-value: erf/Φ differ across libm builds,
    * while counts, one sqrt, and fixed-order IEEE ops are exact
    * cross-engine.
    *
    * Scale: one per-(user, day) conditional aggregation (compact unit
    * frame), folded to a single row — no joins at all. */
  def abZtest(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("d"))
      .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("conv"))
      .select(pmod(col("user_id"), lit(2L)).as("variant"), col("conv"))
      .agg(
        sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("variant") === 0, col("conv")).otherwise(0L)).as("c0"),
        sum(when(col("variant") === 1, col("conv")).otherwise(0L)).as("c1"))
      .selectExpr("n0", "n1", "c0", "c1",
        "CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0",
        "CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1",
        """(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          | - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
          |/ sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
          |       * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
          |       * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
          |  AS z""".stripMargin,
        """(CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
          |  * (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
          |  / (CAST(n0 + n1 AS DOUBLE) / 2.0)
          |+ (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
          |  * (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
          |  / (CAST(n0 + n1 AS DOUBLE) / 2.0) AS srm_chi2""".stripMargin)

  /** SCD2-style run-length intervals: collapse each user's time-ordered
    * event stream into maximal runs of the SAME event type, each run a
    * validity interval [valid_from, valid_to] plus the half-open
    * `valid_until` (the next run's start — NULL for the user's current
    * run), which is exactly the type-2 slowly-changing-dimension history
    * a warehouse keeps for "what state was this entity in at time T".
    * [[sessionAgg]] islands by TIME GAP; this islands by VALUE CHANGE —
    * the other classic gaps-and-islands axis.
    *
    * Scale: both windows partition by user (lag/cumsum, then one lead
    * over the per-user RUN frame, which is strictly smaller than the
    * event stream); no global sort, no self-join. */
  def valueRuns(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val runs = Tables.events(spark, dir)
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("event_type"), 1L)
          .otherwise(0L))
      .withColumn("run_id", sum(col("chg")).over(run))
      .groupBy(col("user_id"), col("run_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("valid_from"),
        max(col("ts")).as("valid_to"))
    runs.withColumn("valid_until",
      lead(col("valid_from"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("run_id"))))
  }

  /** Skyline (Pareto frontier) per market segment: the orders no other
    * same-segment order beats on BOTH axes (earlier-or-equal date AND
    * cheaper-or-equal price, strictly better on one) — the classic
    * "best tradeoffs" operator (Börzsönyi et al., ICDE 2001) that
    * `ORDER BY` cannot express. The naive form is an O(n²) dominance
    * self-join; the scale shape here is the sweep restated in
    * relational terms: fold orders map-side to the per-(segment, date)
    * min price (a calendar-bounded compact frame), take the strictly-
    * previous running min over dates in a segment-partitioned window,
    * and join back — an order survives iff it is min-price on its date
    * AND strictly cheaper than every earlier date's best. Ties on both
    * axes don't dominate each other, so equal-cheapest orders of one
    * date all survive.
    *
    * Scale: the only window runs over the segment × dates frame
    * (calendar-bounded, never corpus-sized); the join back is a compact
    * (segment, date, price) equijoin. */
  def paretoFront(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val rows = o.join(Tables.broadcastIfSmall(c), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"), col("o_orderdate").as("odate"),
        col("o_totalprice").as("price"), col("o_orderkey"))
    val byDate = rows.groupBy(col("segment"), col("odate"))
      .agg(min(col("price")).as("md"))
      .withColumn("m1", min(col("md")).over(
        Window.partitionBy(col("segment")).orderBy(col("odate"))
          .rowsBetween(Window.unboundedPreceding, -1)))
    rows.join(byDate, Seq("segment", "odate"))
      .where(col("price") === col("md") &&
        (col("m1").isNull || col("price") < col("m1")))
      .select(col("segment"), col("odate"), col("o_orderkey"), col("price"))
  }

  /** Theil–Sen robust trend per series — the median of all pairwise
    * slopes over the HOURLY mean frame, beside the OLS slope it
    * robustifies (one gross outlier hour drags OLS arbitrarily; the
    * median slope has a 29% breakdown point). Everything that must match
    * the oracle is integer-exact: hourly means quantize to milli-units
    * once, each pairwise slope is an integer division to micro-units/hour
    * (both Spark `div` and DuckDB `//` truncate toward zero — verified on
    * negative numerators, which falling series produce), and the median
    * is the value at rank `(n+1) div 2` of the per-series sorted slope
    * multiset. OLS comes from exact BIGINT moments with two final IEEE
    * ops.
    *
    * Scale: the pair space is C(|hours|, 2) per series — bounded by the
    * TIME SPAN, never by corpus size (100 TB of events still folds to
    * the same series × hours frame map-side). The rank window partitions
    * by series; nothing global. */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint the hourly mean frame: both pair-join sides AND
    // the OLS moments read it — un-materialized, the corpus scan+fold
    // ran 3×. The frame is series × hours rows, calendar-bounded.
    val m = Tables.events(spark, dir)
      .withColumn("hb", expr("unix_micros(ts) div 3600000000"))
      .groupBy(col("event_type"), col("hb"))
      .agg(count(lit(1)).as("cnt"), sum(col("value").cast(Dec)).as("sdec"))
      .select(col("event_type"), col("hb"),
        floor((col("sdec").cast("double") / col("cnt").cast("double")) *
          lit(1000.0)).cast("long").as("fp"))
      .localCheckpoint(true)
    val a = m.select(col("event_type"), col("hb").as("ha"), col("fp").as("fa"))
    val b = m.select(col("event_type"), col("hb").as("hbb"), col("fp").as("fb"))
    val slopes = a.join(b, Seq("event_type"))
      .where(col("hbb") > col("ha"))
      .withColumn("num", (col("fb") - col("fa")) * lit(1000L))
      .withColumn("dt", col("hbb") - col("ha"))
      .select(col("event_type"), expr("num div dt").as("slope_fp"))
    val w = Window.partitionBy(col("event_type"))
    val med = slopes
      .withColumn("rk", row_number().over(w.orderBy(col("slope_fp"))).cast("long"))
      .withColumn("n_pairs", count(lit(1)).over(w))
      .where(col("rk") === expr("(n_pairs + 1) div 2"))
      .select(col("event_type"), col("n_pairs"), col("slope_fp").as("ts_slope_fp"))
    val ols = m.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("hb")).as("sx"), sum(col("fp")).as("sy"),
        sum(col("hb") * col("hb")).as("sxx"),
        sum(col("hb") * col("fp")).as("sxy"))
      .select(col("event_type"), col("n_hours"),
        ((col("n_hours") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n_hours") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("ols_slope"))
    med.join(ols, Seq("event_type"))
      .select(col("event_type"), col("n_hours"), col("n_pairs"),
        col("ts_slope_fp"),
        (col("ts_slope_fp").cast("double") / lit(1000.0)).as("ts_slope"),
        col("ols_slope"))
  }

  def seriesCorrelation(spark: SparkSession, dir: String): DataFrame = {
    val m = bucketMeans(spark, dir)
      .select(col("event_type"), col("b"),
        floor(col("mv") * lit(100.0)).as("fp"))
    val right = m.select(col("event_type").as("et_b"), col("b").as("rb"),
      col("fp").as("xb"))
    val vx = col("n") * col("sxx") - col("sx") * col("sx")
    val vy = col("n") * col("syy") - col("sy") * col("sy")
    m.select(col("event_type").as("et_a"), col("b"), col("fp").as("xa"))
      .join(broadcast(right), col("b") === col("rb") && col("et_a") < col("et_b"))
      .groupBy(col("et_a"), col("et_b"))
      .agg(count(lit(1)).as("n"),
        sum(col("xa")).as("sx"), sum(col("xb")).as("sy"),
        sum(col("xa") * col("xb")).as("sxy"),
        sum(col("xa") * col("xa")).as("sxx"),
        sum(col("xb") * col("xb")).as("syy"))
      .where(col("n") >= 2 && vx > 0 && vy > 0)
      .select(col("et_a"), col("et_b"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          sqrt(vx.cast("double") * vy.cast("double"))).as("corr"))
  }

  /** Bloom-filter semi-join pruning audit — the declarative, exactly-
    * checkable twin of the streaming ingest's Bloom gate
    * ([[graft.streaming.CorpusIngest]]): build a k=4, m=65536 Bloom over
    * the urgent orders' keys, probe every distinct lineitem order key,
    * and account EXACTLY for what the filter passes — true members,
    * false positives, and the realized false-positive rate. This is the
    * pattern that makes a 100 TB join cheap: ship a kilobyte-scale bit
    * set to the probe side and drop non-matching rows BEFORE the
    * shuffle; this query measures what that gate would do on real keys
    * (a Bloom has no false negatives, so `pass_bloom ⊇ members` — the
    * spec asserts it).
    *
    * Determinism: bit positions are md5-derived (the shared hash32
    * convention), so both engines build bit-identical filters — unlike
    * an engine-native Bloom (Spark's uses Murmur3 internally), this one
    * is oracle-reproducible.
    *
    * Scale (100 TB): the filter is the DISTINCT position set (≤ m
    * compact ints, broadcast); the probe explodes each distinct key into
    * k=4 position rows and broadcast-semi-joins — no shuffle of the
    * probe side, one final single-row aggregate. m scales linearly with
    * the build-side key count in practice (≈ 10 bits/key for 1% fp). */
  def bloomPrune(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.md5Hash32
    val M = 65536L
    val K = 4
    def posCols(k: Column) = (0 until K).map(i =>
      (md5Hash32(concat(lit(s"$i:"), k)) % M).as("pos"))
    val buildKeys = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").cast("string").as("k")).distinct()
    val bits = buildKeys
      .select(explode(array(posCols(col("k")): _*)).as("pos")).distinct()
    val probeKeys = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").cast("string").as("k")).distinct()
    val hits = probeKeys
      .select(col("k"), explode(array(posCols(col("k")): _*)).as("pos"))
      .join(broadcast(bits), Seq("pos"), "left_semi")
      .groupBy(col("k")).agg(count(lit(1)).as("nh"))
    probeKeys
      .join(hits, Seq("k"), "left")
      .withColumn("pass_bloom", coalesce(col("nh") === K, lit(false)))
      .join(broadcast(buildKeys.withColumn("is_m", lit(true))), Seq("k"), "left")
      .withColumn("member", coalesce(col("is_m"), lit(false)))
      .agg(
        count(lit(1)).as("n_probe_keys"),
        sum(when(col("pass_bloom"), 1L).otherwise(0L)).as("n_pass_bloom"),
        sum(when(col("member"), 1L).otherwise(0L)).as("n_members"),
        sum(when(col("pass_bloom") && !col("member"), 1L).otherwise(0L)).as("n_false_pos"))
      .select(col("n_probe_keys"), col("n_pass_bloom"), col("n_members"), col("n_false_pos"),
        when(col("n_probe_keys") > col("n_members"),
          col("n_false_pos").cast("double") /
            (col("n_probe_keys") - col("n_members")).cast("double")).as("fp_rate"))
  }

  /** Seasonal-naive forecast backtest: predict each 10-min bucket mean by
    * the SAME series one season (144 buckets = 1 day) earlier, score the
    * forecast per series with MAE, WAPE (Σ|err|/Σ|actual| — the ratio-of-
    * integer-sums form that stays deterministic where a mean of per-row
    * ratios would drift with fold order), and signed bias. The backtest a
    * monitoring pipeline runs BEFORE trusting any fancier model: a model
    * that can't beat seasonal-naive on these numbers is noise.
    *
    * Exactness: bucket means milli-quantize to BIGINT (the shared fp
    * convention); every aggregate is an integer sum; the three metrics
    * are single fixed-order IEEE divisions at the end.
    *
    * Scale (100 TB): grid-sized work — the self-join matches each bucket
    * to its season-lagged twin on (event_type, bucket) compact keys, so
    * the shuffle carries two BIGINTs per bucket regardless of event
    * volume; scoring is a per-series hash aggregate. */
  def forecastEval(spark: SparkSession, dir: String): DataFrame = {
    val m = bucketMeans(spark, dir)
      .select(col("event_type"), col("b"),
        floor(col("mv") * lit(1000.0)).cast("long").as("fp"))
    val prev = m.select(col("event_type").as("pt"),
      (col("b") + 144).as("pb"), col("fp").as("pfp"))
    m.join(prev, col("event_type") === col("pt") && col("b") === col("pb"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_scored"),
        sum(abs(col("fp") - col("pfp"))).as("sad"),
        sum(abs(col("fp"))).as("sa"),
        sum(col("fp") - col("pfp")).as("sd"))
      .select(col("event_type"), col("n_scored"),
        (col("sad").cast("double") / col("n_scored").cast("double") / lit(1000.0)).as("mae"),
        when(col("sa") > 0,
          col("sad").cast("double") / col("sa").cast("double")).as("wape"),
        (col("sd").cast("double") / col("n_scored").cast("double") / lit(1000.0)).as("bias"))
  }

  /** Join-size estimation from count-min sketches (the AMS/CMS
    * inner-product estimator, Alon–Matias–Szegedy '96 / Cormode–
    * Muthukrishnan '05): predict |lineitem ⋈ lineitem on l_partkey| —
    * the skew-sensitive self-join size that decides whether a planned
    * join is safe to run — WITHOUT executing the join. Each of d=3
    * independent hash rows buckets key frequencies into w=4096 counters;
    * the row estimate is the counter self-inner-product Σ c², an
    * overestimate of the true Σ f² by exactly the colliding cross terms;
    * the reported estimate is the min over rows. Output: one row with the
    * exact size (for the audit), the three row estimates, the min, and
    * the signed relative error.
    *
    * Scale (100 TB): the sketch is FIXED SIZE (3×4096 counters) no matter
    * the input — counts fold map-side into (row, bucket) partials, so the
    * shuffle is ≤ 12 288 rows per partition regardless of data volume,
    * and sketches of disjoint partitions/tables MERGE by cell-wise
    * addition (how a planner estimates every candidate join from
    * one-pass per-table sketches). The exact side is a compact-key
    * aggregate kept only to score the estimator. */
  def joinSizeEst(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.md5Hash32
    val W = 4096L
    val keys = Tables.lineitem(spark, dir)
      .select(col("l_partkey").cast("string").as("k"))
    val rows = (0 to 2).map { r =>
      struct(lit(r.toLong).as("r"),
        (md5Hash32(concat(lit(s"$r:"), col("k"))) % W).as("c"))
    }
    val cells = keys
      .select(explode(array(rows: _*)).as("rc"))
      .select(col("rc.r").as("r"), col("rc.c").as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("cnt"))
    val ests = cells.groupBy(col("r"))
      .agg(sum(col("cnt") * col("cnt")).as("est"))
      .agg(
        sum(when(col("r") === 0, col("est"))).as("est0"),
        sum(when(col("r") === 1, col("est"))).as("est1"),
        sum(when(col("r") === 2, col("est"))).as("est2"),
        min(col("est")).as("est"))
    val exact = Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("f"))
      .agg(sum(col("f") * col("f")).as("exact"))
    ests.crossJoin(broadcast(exact)) // both sides are single rows
      .select(col("exact"), col("est0"), col("est1"), col("est2"), col("est"),
        ((col("est") - col("exact")).cast("double") /
          col("exact").cast("double")).as("rel_err"))
  }

  /** Incremental (materialized-view) stats maintenance — the 100 TB
    * aggregation pattern: per-(type, day) PARTIAL states {n, Σq, min,
    * max, Σq²} are built separately for the historical half and the
    * "newly arrived" half of the corpus (split at the midpoint day),
    * then MERGED by re-aggregation — never by rescanning raw history.
    * Every moment is mergeable (sums add, extrema fold), so the merged
    * result is bit-identical to a full recompute — which is exactly
    * what the oracle checks, directly from raw events: equality IS the
    * losslessness proof for the incremental path.
    *
    * Values centi-quantize to BIGINT so the partials are exact
    * integers; the variance cross product n·Σq² − (Σq)² runs in
    * DECIMAL(38,0) (HUGEINT in the oracle) because at corpus scale it
    * exceeds int64, with ONE terminal double conversion.
    *
    * Scale: day partials are what you'd persist; each day's delta folds
    * in with work O(delta) + O(types·days) merge, not O(corpus). Both
    * aggregations are map-side-combinable; the union merge shuffles
    * only ~types·days partial rows. */
  def incrementalStats(spark: SparkSession, dir: String): DataFrame = {
    val D38 = DecimalType(38, 0)
    val ev = Tables.events(spark, dir).select(
      col("event_type"),
      expr("unix_micros(ts) div 86400000000").as("day"),
      floor(col("value") * lit(100.0)).cast("long").as("qv"))
    val mid = ev.agg(expr("(min(day) + max(day)) div 2").as("mid_day"))
    val tagged = ev.crossJoin(broadcast(mid))
    def partials(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"), sum(col("qv")).as("s"),
        min(col("qv")).as("mn"), max(col("qv")).as("mx"),
        sum(col("qv") * col("qv")).as("sq"))
    val history = partials(tagged.filter(col("day") < col("mid_day")))
    val delta = partials(tagged.filter(col("day") >= col("mid_day")))
    history.unionByName(delta)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("n_events"),
        sum(col("s")).as("s"), min(col("mn")).as("mn"),
        max(col("mx")).as("mx"), sum(col("sq")).as("sq"))
      .select(col("event_type"), col("n_days"), col("n_events"),
        (col("s").cast("double") / lit(100.0)).as("total"),
        (col("mn").cast("double") / lit(100.0)).as("vmin"),
        (col("mx").cast("double") / lit(100.0)).as("vmax"),
        (col("s").cast("double") / col("n_events").cast("double") / lit(100.0)).as("mean"),
        ((col("n_events").cast(D38) * col("sq").cast(D38) -
          col("s").cast(D38) * col("s").cast(D38)).cast("double")
          / (col("n_events").cast("double") * col("n_events").cast("double"))
          / lit(10000.0)).as("variance"))
  }

  /** CDC upsert merge (SCD type 1, last-writer-wins) — MERGE INTO
    * semantics as a declarative plan: the standing per-key state (the
    * latest row per (user, type) BEFORE the midpoint) full-outer-joined
    * with the delta's per-key latest, delta winning every collision.
    * Writer order is (timestamp, event_id) — event_id uniqueness makes
    * the election deterministic under timestamp ties. The per-key
    * latest is `max(struct(us, event_id, value))` — a mergeable argmax
    * (struct compares lexicographically), so both sides map-side
    * combine and never shuffle full rows.
    *
    * The oracle elects the overall per-key latest from the raw
    * changelog: base⊕delta merge ≡ full recompute is exactly the
    * invariant a MERGE INTO pipeline relies on when it applies deltas
    * to stored state instead of replaying history.
    *
    * Scale: base is the state you'd keep key-bucketed on disk; the
    * delta aggregate is O(batch); both sides shuffle on the SAME key so
    * the join co-partitions (and a small delta broadcasts under AQE). */
  def upsertMerge(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id"), col("event_type"),
      expr("unix_micros(ts)").as("us"), col("event_id"), col("value"))
    val mid = ev.agg(expr("(min(us) + max(us)) div 2").as("mid_us"))
    val tagged = ev.crossJoin(broadcast(mid))
    def latest(df: DataFrame): DataFrame = df
      .groupBy(col("user_id"), col("event_type"))
      .agg(max(struct(col("us"), col("event_id"), col("value"))).as("st"))
    val base = latest(tagged.filter(col("us") < col("mid_us")))
      .withColumnRenamed("st", "b")
    val delta = latest(tagged.filter(col("us") >= col("mid_us")))
      .withColumnRenamed("st", "d")
    base.join(delta, Seq("user_id", "event_type"), "full_outer")
      .select(col("user_id"), col("event_type"),
        coalesce(col("d.us"), col("b.us")).as("last_us"),
        coalesce(col("d.event_id"), col("b.event_id")).as("last_event_id"),
        coalesce(col("d.value"), col("b.value")).as("last_value"),
        when(col("d").isNotNull, lit("delta")).otherwise(lit("base")).as("src"))
  }

  /** Referential-integrity audit of the whole star schema — per
    * constraint one row: key-uniqueness checks (n_bad = rows minus
    * distinct keys) for every table's primary key, and orphan checks
    * (anti-join count) for every foreign key. The dbt-style test suite
    * run INSIDE the engine, in one query — the first thing a pipeline
    * asserts after ingesting a new snapshot, because every join in
    * this engine silently drops or duplicates rows if these fail.
    * On the synthetic fixture the audit reports a REAL finding:
    * `pk_lineitem` is violated (the generator assigns `l_linenumber`
    * randomly rather than sequentially per order) while all 17 other
    * constraints are clean — the spec pins both.
    *
    * Scale: ONE aggregate pass per table computes that table's pk check
    * AND all its fk orphan counts together — the table's fk columns
    * left-join the parents' DISTINCT key frames (single-column pruned
    * scans; dims broadcast) and the orphan counts ride the same fold as
    * the uniqueness check, so lineitem is scanned once, not 4×, for the
    * whole-warehouse audit. The distinct on each parent key frame is a
    * compact map-combinable shuffle and makes the join duplicate-proof
    * (the audit must not assume the uniqueness it is auditing). Output
    * is constraints-sized. */
  def schemaIntegrity(spark: SparkSession, dir: String): DataFrame = {
    // (check name, n_bad expression) pairs fold in ONE aggregate over the
    // (joined) table scan, then unstack to the per-check rows
    def checks(table: DataFrame, pkName: String, pkKeys: Seq[String],
        fks: Seq[(String, String)]): DataFrame = {
      val aggs =
        (count(lit(1)) - countDistinct(pkKeys.head, pkKeys.tail: _*)).as(pkName) +:
          fks.map { case (name, parentKey) =>
            // count(when), not sum(when): an EMPTY child table must
            // report 0 orphans (the anti-join form's behavior), never
            // a SQL-null n_bad
            count(when(col(parentKey).isNull, lit(1))).as(name)
          }
      val row = table.agg(count(lit(1)).as("n_rows"), aggs: _*)
      val pairs = (pkName +: fks.map(_._1)).map(nm =>
        struct(lit(nm).as("chk"), col(nm).as("n_bad")))
      row.select(col("n_rows"), explode(array(pairs: _*)).as("kv"))
        .select(col("kv.chk").as("chk"), col("n_rows"), col("kv.n_bad"))
    }
    // distinct single-column parent key frames: duplicate-proof join
    // targets the child passes LEFT-join (null parent key == orphan)
    def keys(df: DataFrame, k: String): DataFrame = df.select(col(k)).distinct()
    val o = Tables.orders(spark, dir); val c = Tables.customer(spark, dir)
    val p = Tables.part(spark, dir); val s = Tables.supplier(spark, dir)
    val n = Tables.nation(spark, dir); val r = Tables.region(spark, dir)
    val d = Tables.documents(spark, dir)
    Seq(
      checks(
        Tables.lineitem(spark, dir)
          .join(keys(o, "o_orderkey"), col("l_orderkey") === col("o_orderkey"), "left")
          .join(broadcast(keys(p, "p_partkey")), col("l_partkey") === col("p_partkey"), "left")
          .join(broadcast(keys(s, "s_suppkey")), col("l_suppkey") === col("s_suppkey"), "left"),
        "pk_lineitem", Seq("l_orderkey", "l_linenumber"),
        Seq("fk_lineitem_orders" -> "o_orderkey",
          "fk_lineitem_part" -> "p_partkey",
          "fk_lineitem_supplier" -> "s_suppkey")),
      checks(
        o.join(broadcast(keys(c, "c_custkey")), col("o_custkey") === col("c_custkey"), "left"),
        "pk_orders", Seq("o_orderkey"), Seq("fk_orders_customer" -> "c_custkey")),
      checks(
        c.join(broadcast(keys(n, "n_nationkey")), col("c_nationkey") === col("n_nationkey"), "left"),
        "pk_customer", Seq("c_custkey"), Seq("fk_customer_nation" -> "n_nationkey")),
      checks(p, "pk_part", Seq("p_partkey"), Nil),
      checks(
        s.join(broadcast(keys(n, "n_nationkey")), col("s_nationkey") === col("n_nationkey"), "left"),
        "pk_supplier", Seq("s_suppkey"), Seq("fk_supplier_nation" -> "n_nationkey")),
      checks(
        n.join(broadcast(keys(r, "r_regionkey")), col("n_regionkey") === col("r_regionkey"), "left"),
        "pk_nation", Seq("n_nationkey"), Seq("fk_nation_region" -> "r_regionkey")),
      checks(r, "pk_region", Seq("r_regionkey"), Nil),
      checks(Tables.events(spark, dir), "pk_events", Seq("event_id"), Nil),
      checks(d, "pk_documents", Seq("doc_id"), Nil),
      checks(
        Tables.embeddings(spark, dir)
          .join(broadcast(keys(d, "doc_id")), col("vec_id") === col("doc_id"), "left"),
        "pk_embeddings", Seq("vec_id"), Seq("fk_embeddings_documents" -> "doc_id"))
    ).reduce(_ unionByName _)
      .select(col("chk").as("check_name"), col("n_rows"), col("n_bad"),
        (col("n_bad").cast("double") / col("n_rows").cast("double")).as("bad_rate"))
  }

  /** First-order Markov next-event prediction, trained AND evaluated
    * in-engine — the sequence-model analog of [[graft.queries.SimilarityQueries.linearProbe]]:
    * transition counts from the pairs whose successor lands BEFORE the
    * corpus midpoint (the train half), a per-state argmax prediction
    * (ties to the lexicographically larger successor — identical
    * comparator both engines), and top-1 accuracy measured on the
    * held-out later pairs. Per predecessor state: the prediction, its
    * training support, held-out counts, and accuracy — beside the
    * train-majority share so lift over the marginal is visible. All
    * counts integer, one division per row.
    *
    * Scale: the pair stream is per-user lag windows ([[eventTransitions]]'
    * shape); transition/train tables are |types|² rows, broadcast onto
    * the test rollup. */
  def markovEval(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc_nulls_last, col("event_id").asc_nulls_last)
    val pairs = Tables.events(spark, dir)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .select(col("prev_type"), col("event_type").as("next_type"),
        unix_micros(col("ts")).as("t"))
    val mid = pairs.agg(expr("(min(t) + max(t)) div 2").as("mid_t"))
    val tagged = pairs.crossJoin(broadcast(mid))
    val train = tagged.filter(col("t") < col("mid_t"))
      .groupBy(col("prev_type"), col("next_type")).agg(count(lit(1)).as("n"))
    val pw = Window.partitionBy(col("prev_type"))
      .orderBy(col("n").desc, col("next_type").desc)
    val model = train
      .withColumn("rk", row_number().over(pw))
      .withColumn("n_train", sum(col("n")).over(Window.partitionBy(col("prev_type"))))
      .filter(col("rk") === 1)
      .select(col("prev_type"), col("next_type").as("predicted_next"),
        col("n").as("n_top"), col("n_train"))
    tagged.filter(col("t") >= col("mid_t"))
      .join(broadcast(model), "prev_type")
      .groupBy(col("prev_type"), col("predicted_next"), col("n_top"), col("n_train"))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("next_type") === col("predicted_next"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("prev_type"), col("predicted_next"), col("n_train"), col("n_test"),
        col("n_correct"),
        (col("n_correct").cast("double") / col("n_test").cast("double")).as("accuracy"),
        (col("n_top").cast("double") / col("n_train").cast("double")).as("train_majority"))
  }

  /** Decile-lift table — the targeting-model evaluation every uplift /
    * propensity readout starts from, computed on user ACTIVITY as the
    * score: users fold to (event count, converted-ever flag), activity
    * deciles come from corpus-wide percentile cutpoints (the
    * [[quantileBinsScalable]] discipline — one broadcast cutpoint row,
    * binning is a narrow map, no global sort), and per decile the
    * conversion rate and its lift over the base rate, plus the
    * cumulative rate/lift scanning from the most-active decile down —
    * "target the top-k deciles" is read straight off the cumulative
    * column. Tied counts make deciles lumpy; the strict `>` cutpoint
    * comparison is deterministic and mirrored in the oracle.
    *
    * Exactness: all counts BIGINT; rate = conv/users and
    * lift = rate/base are pinned-order IEEE divisions, identical SQL.
    *
    * Scale: one map-combinable per-user fold; cutpoints fold to ONE
    * broadcast row; ≤10-group rollup; the only window orders the
    * 10-row decile frame (bounded by construction). */
  def decileLift(spark: SparkSession, dir: String): DataFrame = {
    val u = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        // conversion = a HIGH-VALUE purchase: the plain purchase flag
        // saturates (every user buys eventually on this fixture), which
        // would make every lift 1.0 — a degenerate table
        max(when(col("event_type") === "purchase" && col("value") >= 200.0, 1L)
          .otherwise(0L)).as("conv"))
    val cuts = u.agg(
      expr("percentile(n_events, array(0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9))").as("c"))
    val byDecile = u.crossJoin(broadcast(cuts))
      .withColumn("decile",
        (size(filter(col("c"), c => col("n_events") > c)) + 1).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
    val tot = byDecile.agg(
      sum(col("n_users")).as("t_users"), sum(col("n_conv")).as("t_conv"))
    // the cumulative window orders the ≤10-row decile frame — bounded
    val cum = Window.orderBy(col("decile").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDecile.crossJoin(broadcast(tot))
      .withColumn("cum_users", sum(col("n_users")).over(cum))
      .withColumn("cum_conv", sum(col("n_conv")).over(cum))
      .select(col("decile"), col("n_users"), col("n_conv"),
        (col("n_conv").cast("double") / col("n_users").cast("double")).as("rate"),
        ((col("n_conv").cast("double") / col("n_users").cast("double")) /
          (col("t_conv").cast("double") / col("t_users").cast("double"))).as("lift"),
        col("cum_users"), col("cum_conv"),
        ((col("cum_conv").cast("double") / col("cum_users").cast("double")) /
          (col("t_conv").cast("double") / col("t_users").cast("double"))).as("cum_lift"))
  }

  /** RFM segmentation — the classic marketing cube: per user, recency
    * (time since last event), frequency (event count), and monetary
    * (exact decimal value total), each quartile-binned against
    * corpus-wide cutpoints, rolled up to the ≤64 (r, f, m) segments
    * with user counts, total value, and mean frequency. The
    * "who are my champions / who is churning" readout every retention
    * program starts from. Cutpoint comparisons follow the
    * [[quantileBinsScalable]] discipline (quantile_cont's p·(n−1)
    * interpolation matches Spark's `percentile` bit-for-bit), and the
    * value totals stay exact decimal until one terminal conversion.
    *
    * Scale: one map-combinable per-user fold; the three cutpoint
    * arrays fold to ONE broadcast row (swap in `approx_percentile` at
    * real corpus scale, same plan shape); binning is a narrow map and
    * the rollup has ≤64 groups. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      unix_micros(col("ts")).as("t"), col("value").cast(Dec).as("vdec"))
    val users = ev.groupBy(col("user_id")).agg(
      max(col("t")).as("last_t"), count(lit(1)).as("frequency"),
      sum(col("vdec")).as("mdec"))
    val u2 = users
      .crossJoin(broadcast(users.agg(max(col("last_t")).as("t_max"))))
      .withColumn("recency", col("t_max") - col("last_t"))
      .withColumn("monetary", col("mdec").cast("double"))
    val cuts = u2.agg(
      expr("percentile(recency, array(0.25,0.5,0.75))").as("rc"),
      expr("percentile(frequency, array(0.25,0.5,0.75))").as("fc"),
      expr("percentile(monetary, array(0.25,0.5,0.75))").as("mc"))
    def binOf(cutsName: String, v: String): Column =
      (size(filter(col(cutsName), c => col(v) > c)) + 1).cast("long")
    u2.crossJoin(broadcast(cuts))
      .withColumn("r_bin", binOf("rc", "recency"))
      .withColumn("f_bin", binOf("fc", "frequency"))
      .withColumn("m_bin", binOf("mc", "monetary"))
      .groupBy(col("r_bin"), col("f_bin"), col("m_bin"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("mdec")).cast("double").as("total_value"),
        (sum(col("frequency")).cast("double") /
          count(lit(1)).cast("double")).as("avg_frequency"))
  }

  /** Cohort LTV curves — [[retentionCohort]]'s value twin: per
    * (first-activity-week cohort × age-in-weeks), the active users,
    * the week's value, the RUNNING cumulative value, and LTV-per-user
    * (cumulative value over the cohort's size). The curve every growth
    * model is calibrated against. Value sums stay exact DECIMAL(18,2)
    * through the cumulative window (decimal addition is associative —
    * no float accumulation order anywhere), with one double conversion
    * and one division per emitted row.
    *
    * Scale: the heavy fold is one map-combinable (user → first week)
    * aggregation plus one (cohort, age) rollup; the cumulative window
    * partitions by cohort over the WEEKS×WEEKS grid (calendar-bounded,
    * never corpus-sized). */
  def cohortValue(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id"),
      expr("unix_micros(ts) div 604800000000").as("week"),
      col("value").cast(Dec).as("vdec"))
    val firstWeek = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val sizes = firstWeek.groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_size"))
    val cells = ev.join(firstWeek, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("age_week"))
      .agg(countDistinct(col("user_id")).as("n_active"),
        sum(col("vdec")).as("wdec"))
    val w = Window.partitionBy(col("cohort_week")).orderBy(col("age_week"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cdec", sum(col("wdec")).over(w))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("age_week"), col("n_active"), col("cohort_size"),
        col("wdec").cast("double").as("week_value"),
        col("cdec").cast("double").as("cum_value"),
        (col("cdec").cast("double") / col("cohort_size").cast("double")).as("ltv_per_user"))
  }

  /** Linear multi-touch attribution — each purchase's credit split
    * equally across the user's touches (view/click/signup) in the
    * trailing hour: per touch type, the touch count, the number of
    * purchases it participated in, and the attributed credit
    * Σ 1/k_p. The per-purchase shares are quantized to micro-credits
    * (`1000000 div k` — integer division, documented floor loss below
    * one-millionth per touch) so the credit totals are EXACT integer
    * sums in any summation order — the rational-fixed-point discipline
    * every float-sum query here follows.
    *
    * Scale: the touch-purchase pairing is a user-keyed equijoin (pair
    * count bounded by per-user activity, never cross-user); k folds
    * per purchase and joins back on the compact purchase id. */
  def attributionLinear(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id"), col("event_type"),
      unix_micros(col("ts")).as("t"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t").as("tp"), col("event_id").as("pid"))
    val touches = ev
      .filter(col("event_type").isin("view", "click", "signup"))
      .select(col("user_id"), col("event_type").as("touch_type"), col("t"))
    val pairs = touches.join(purchases, "user_id")
      .filter(col("t") < col("tp") && col("t") >= col("tp") - lit(3600000000L))
    // k via a pid-partitioned window — ONE pass over the pair frame
    // instead of an aggregate + rejoin that would re-run the pairing
    // join (at corpus scale the pair frame is too large to checkpoint)
    pairs
      .withColumn("k", count(lit(1)).over(Window.partitionBy(col("pid"))))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        countDistinct(col("pid")).as("n_purchases"),
        sum(expr("1000000 div k")).as("credit_fp"))
      .select(col("touch_type"), col("n_touches"), col("n_purchases"),
        (col("credit_fp").cast("double") / lit(1000000.0)).as("credit"))
  }

  /** Poisson(1) CDF thresholds as FIXED decimal literals (multiplicity
    * k ⇔ u lands in [C_{k−1}, C_k); tail capped at 5) — string-parsed
    * to identical doubles in both engines, never computed via exp(). */
  private[graft] val PoissonCdf: Seq[String] = Seq(
    "0.36787944117144233", "0.7357588823428847", "0.9196986029286058",
    "0.9810118431238462", "0.9963401531726563")

  /** Bootstrap replica count. */
  private[graft] val BootB = 32

  /** One-pass Poisson bootstrap CI (the distributed bootstrap: each
    * replica resamples every row with an independent Poisson(1)
    * multiplicity, so B replicas need ONE scan and no per-replica
    * shuffles — the construction that makes bootstrapping feasible at
    * warehouse scale, vs B actual resampling passes). Multiplicities
    * are DETERMINISTIC: u = md5(event_id : replica) mapped through
    * fixed Poisson CDF literals, so both engines draw the identical
    * resamples and the oracle matches bit-for-bit — the engine's
    * seedless-sampling discipline applied to resampling. Per type: the
    * exact mean, the [replica 2, replica B−1] band of the B sorted
    * replica means (an ≈94% interval at B = 32, integer-indexed — no
    * interpolation), and whether the band covers the exact mean.
    * Complements [[sampleMeanCi]]: the bootstrap needs no normality
    * and generalizes to any plug-in statistic.
    *
    * Scale: B·{n, Σ} conditional integer sums fold map-side in one
    * aggregation — 2B columns per type, zero fan-out; the sort ranks a
    * B-element in-row array. */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("event_type"), col("event_id"),
      floor(col("value") * lit(100.0)).cast("long").as("qv"),
      col("value").cast(Dec).as("vdec"))
    // per-row multiplicity for replica b: u = hash scaled to [0,1),
    // folded in reverse so the SMALLEST matching CDF threshold wins
    // (when(u<C0, 0).otherwise(when(u<C1, 1)...) outermost-first)
    def mult(b: Int): Column = {
      val u = pmod(md5Hash32(concat(col("event_id").cast("string"),
        lit(s":$b"))), lit(1000000L)).cast("double") / lit(1000000.0)
      PoissonCdf.zipWithIndex.reverse.foldLeft(lit(5L): Column) {
        case (acc, (c, k)) =>
          when(u < lit(c.toDouble), lit(k.toLong)).otherwise(acc)
      }
    }
    // the two identical mult(b) occurrences per replica (n_b and s_b)
    // are deduplicated by codegen common-subexpression elimination, so
    // the md5 kernel runs B times per row as-is; materializing the
    // multiplicities in an explicit projection instead measured 2x
    // SLOWER (wide intermediate row + lost fusion)
    val aggs = (0 until BootB).flatMap { b =>
      Seq(sum(mult(b)).as(s"n$b"), sum(mult(b) * col("qv")).as(s"s$b"))
    } ++ Seq(count(lit(1)).as("n_exact"), sum(col("vdec")).as("edec"))
    val perType = ev.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*)
    val means = array((0 until BootB).map(b =>
      col(s"s$b").cast("double") / col(s"n$b").cast("double") / lit(100.0)): _*)
    perType
      .withColumn("rm", array_sort(means))
      .select(col("event_type"), col("n_exact"),
        (col("edec").cast("double") / col("n_exact").cast("double")).as("mean_exact"),
        element_at(col("rm"), 2).as("ci_lo"),
        element_at(col("rm"), BootB - 1).as("ci_hi"))
      .withColumn("within_ci",
        col("mean_exact") >= col("ci_lo") && col("mean_exact") <= col("ci_hi"))
  }

  /** Approximate query processing audit — answer "mean value per type"
    * from a DETERMINISTIC 1/16 sample (md5 first hex nibble = '0', the
    * engine's seedless-sampling discipline, replayable in any engine)
    * with a 95% CI, then score it against the exact answer computed
    * beside it. At 100 TB the sample pass reads 1/16 of the data and
    * the exact pass is exactly what you are avoiding — this query is
    * the calibration run that tells you whether the CI machinery can
    * be trusted before you switch the dashboard to samples. Sample
    * variance comes from exact centi-quantized integer moments
    * (n·Σq² − (Σq)² in DECIMAL(38)/HUGEINT); the CI half-width
    * 1.96·√(var/n) and the z-score are fixed-order IEEE ops mirrored
    * in the oracle.
    *
    * Scale: the sample predicate is a narrow map at the scan (no
    * shuffle grows); both passes are map-combinable per-type folds. */
  def sampleMeanCi(spark: SparkSession, dir: String): DataFrame = {
    val D38 = DecimalType(38, 0)
    val ev = Tables.events(spark, dir).select(
      col("event_type"), col("value"),
      floor(col("value") * lit(100.0)).cast("long").as("qv"),
      (substring(md5(col("event_id").cast("string")), 1, 1) === "0").as("in_sample"))
    val s = ev.filter(col("in_sample"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_sample"),
        sum(col("value").cast(Dec)).as("sdec"),
        sum(col("qv")).as("sq1"),
        sum(col("qv") * col("qv")).as("sq2"))
    val e = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_exact"),
        sum(col("value").cast(Dec)).as("edec"))
    s.join(e, "event_type")
      .filter(col("n_sample") >= 2)
      .select(col("event_type"), col("n_sample"), col("n_exact"),
        (col("sdec").cast("double") / col("n_sample").cast("double")).as("mean_sample"),
        (col("edec").cast("double") / col("n_exact").cast("double")).as("mean_exact"),
        ((col("n_sample").cast(D38) * col("sq2").cast(D38) -
          col("sq1").cast(D38) * col("sq1").cast(D38)).cast("double") /
          (col("n_sample").cast("double") * (col("n_sample").cast("double") - lit(1.0))) /
          lit(10000.0)).as("var_sample"))
      .withColumn("ci_half",
        lit(1.96) * sqrt(col("var_sample") / col("n_sample").cast("double")))
      .withColumn("within_ci",
        abs(col("mean_sample") - col("mean_exact")) <= col("ci_half"))
  }

  /** Conversion-latency histogram — the funnel-analytics companion of
    * [[funnelSteps]]: for users whose first purchase follows their
    * first view, the view→purchase lag bucketed into product-meaningful
    * bands (<1m, <10m, <1h, <6h, <1d, <7d, ≥7d). Counts per band plus
    * the share of converters — the "how long does conversion take"
    * readout that decides attribution windows and retargeting delays.
    * Band edges are integer microsecond literals, so membership cannot
    * drift; the share is one terminal division under a one-row total
    * broadcast.
    *
    * Scale: two per-user min aggregations (map-side combinable) and a
    * 7-group rollup — no window, no self-join on the raw stream. */
  def conversionLag(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("tus")).as("t0"))
    val lags = ev.filter(col("event_type") === "purchase").join(v, "user_id")
      .filter(col("tus") > col("t0"))
      .groupBy(col("user_id")).agg(min(col("tus") - col("t0")).as("lag_us"))
    val bucket = when(col("lag_us") < 60000000L, 0)
      .when(col("lag_us") < 600000000L, 1)
      .when(col("lag_us") < 3600000000L, 2)
      .when(col("lag_us") < 21600000000L, 3)
      .when(col("lag_us") < 86400000000L, 4)
      .when(col("lag_us") < 604800000000L, 5)
      .otherwise(6)
    val label = element_at(
      typedLit(Seq("lt_1m", "lt_10m", "lt_1h", "lt_6h", "lt_1d", "lt_7d", "ge_7d")),
      col("bucket") + 1)
    val counts = lags.select(bucket.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_users"))
    val total = counts.agg(sum(col("n_users")).as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(col("bucket").cast("long").as("bucket"), label.as("band"),
        col("n_users"), col("n_total"),
        (col("n_users").cast("double") / col("n_total").cast("double")).as("share"))
  }

  /** Expected Benford first-digit proportions log10(1 + 1/d), d = 1..9,
    * as FIXED decimal literals — both engines parse the same decimal
    * string to the same IEEE double, where computing log10 in each
    * engine's libm could differ by an ulp. Shared with the oracle's
    * VALUES list verbatim. */
  private[graft] val BenfordP: Seq[(Int, String)] = Seq(
    1 -> "0.3010299956639812", 2 -> "0.17609125905568124",
    3 -> "0.12493873660829993", 4 -> "0.09691001300805642",
    5 -> "0.07918124604762482", 6 -> "0.06694678963061322",
    7 -> "0.05799194697768673", 8 -> "0.05115252244738129",
    9 -> "0.04575749056067514")

  /** Benford first-digit audit of `o_totalprice` per order priority —
    * the forensic data-quality check: naturally occurring monetary
    * amounts spanning magnitudes follow log10(1+1/d) first-digit
    * frequencies, and a segment that deviates hard (fabricated values,
    * a capped generator, unit mix-ups) shows up as a large chi-square
    * contribution. Per (priority, digit): observed count and share,
    * expected share, and the chi-square term n_total·(obs−exp)²/exp —
    * summable downstream to the per-segment statistic.
    *
    * The first digit is extracted INTEGER-exactly: cents =
    * floor(price·100) as BIGINT, then the first character of its
    * decimal rendering — identical across engines, where a
    * log10/pow-based mantissa extraction can straddle a power of ten
    * by an ulp and flip 999999 → 1.
    *
    * Scale: one map-side-foldable groupBy over the scan (45 groups),
    * a 9-row broadcast for the expectation, a 5-row broadcast back for
    * the per-priority totals. */
  def benfordAudit(spark: SparkSession, dir: String): DataFrame = {
    val digits = Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"),
        floor(col("o_totalprice") * lit(100.0)).cast("long").as("cents"))
      .where(col("cents") > 0)
      .select(col("priority"),
        substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
    val counts = digits.groupBy(col("priority"), col("digit"))
      .agg(count(lit(1)).as("n_digit"))
    val totals = counts.groupBy(col("priority")).agg(sum(col("n_digit")).as("n_total"))
    val exp = BenfordP.map { case (d, p) =>
      struct(lit(d).as("digit"), lit(p.toDouble).as("exp_p"))
    }
    val expDf = spark.range(1)
      .select(explode(array(exp: _*)).as("e"))
      .select(col("e.digit").as("digit"), col("e.exp_p").as("exp_p"))
    counts
      .join(broadcast(totals), "priority")
      .join(broadcast(expDf), "digit")
      .select(col("priority"), col("digit"), col("n_digit"), col("n_total"),
        (col("n_digit").cast("double") / col("n_total").cast("double")).as("obs_p"),
        col("exp_p"))
      .withColumn("chi_term",
        col("n_total").cast("double") *
          (col("obs_p") - col("exp_p")) * (col("obs_p") - col("exp_p")) / col("exp_p"))
  }
}
