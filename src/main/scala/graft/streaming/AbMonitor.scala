package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming experiment readout — the live form of the batch `ab_ztest`
  * query ([[graft.queries.AnalyticsQueries.abZtest]]): per 10-minute
  * event-time window, the two-proportion z between the user_id % 2
  * variants plus the sample-ratio-mismatch chi-square, finalized by the
  * watermark. The monitor a guardrail dashboard polls while an
  * experiment ramps: SRM spiking means the assignment broke NOW, not in
  * tomorrow's batch readout.
  *
  * Unit semantics differ from the batch query deliberately: the batch
  * readout deduplicates to user-days (cross-window exact distinct —
  * a second stateful operator streaming cannot chain under one
  * watermark without arbitrary-keep dedup), so the stream scores EVENT
  * units: conversion = purchase share of events per variant per window.
  * Both are standard readouts; the scaladoc'd difference is the
  * contract. Everything is counts + fixed-order IEEE ops, so the batch
  * twin matches the stream EXACTLY (StatefulSpec asserts equality,
  * doubles included). Degenerate windows (a variant absent, or pooled
  * conversion at 0 or 1) emit a NULL z rather than an Infinity the
  * dashboard would have to special-case.
  *
  * Plan shape: ONE watermarked windowed aggregation of four conditional
  * counts — no joins, no custom state; state is (open windows) × 4
  * longs. */
object AbMonitor {

  val BucketMs = 600000L

  private def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))

  private def scored(df: DataFrame): DataFrame = {
    val v = pmod(col("user_id"), lit(2L))
    val conv = col("event_type") === "purchase"
    df.groupBy(window(col("event_time"), "10 minutes").as("w"))
      .agg(
        cnt(v === 0).as("n0"), cnt(v === 1).as("n1"),
        cnt(v === 0 && conv).as("c0"), cnt(v === 1 && conv).as("c1"))
      .select(col("n0"), col("n1"), col("c0"), col("c1"),
        expr(s"unix_millis(w.start) DIV $BucketMs").as("bucket"))
      .selectExpr("bucket", "n0", "n1", "c0", "c1",
        """CASE WHEN n0 = 0 OR n1 = 0 OR c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN NULL
          |ELSE (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)
          |      - CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))
          |     / sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
          |            * (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE))
          |            * (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
          |END AS z""".stripMargin,
        """(CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
          |  * (CAST(n0 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
          |  / (CAST(n0 + n1 AS DOUBLE) / 2.0)
          |+ (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
          |  * (CAST(n1 AS DOUBLE) - CAST(n0 + n1 AS DOUBLE) / 2.0)
          |  / (CAST(n0 + n1 AS DOUBLE) / 2.0) AS srm_chi2""".stripMargin)
  }

  /** Monitor a raw `(event_type, event_ms, user_id)` stream. Append
    * mode: a window's readout emits once, when the watermark passes its
    * end. */
  def conversionZ(
      ds: Dataset[(String, Long, Long)],
      watermarkDelay: String = "10 seconds"): DataFrame =
    scored(ds.toDF("event_type", "event_ms", "user_id")
      .withColumn("event_time", timestamp_millis(col("event_ms")))
      .withWatermark("event_time", watermarkDelay))

  /** Batch twin over the same `(event_type, event_ms, user_id)` frame —
    * identical chain minus the watermark, for parity proofs and
    * backfills. */
  def conversionZBatch(df: DataFrame): DataFrame =
    scored(df.withColumn("event_time", timestamp_millis(col("event_ms"))))
}
