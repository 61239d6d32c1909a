package graft

import graft.queries.CoreQueries

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
    "json_extract" -> (CoreQueries.jsonExtract _)
  )

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
        |  sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
        |  min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        |FROM events GROUP BY event_type""".stripMargin
  )
}
