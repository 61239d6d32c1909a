package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming mixture-drift monitor — the live guard for the mixture the
  * batch planners design ([[graft.queries.CurationQueries.mixTemperature]]
  * / `epoch_schedule`): while a pipeline ingests, is each 10-minute
  * window's per-source TOKEN SHARE still tracking the frozen target
  * mixture, or has one feed silently flooded the blend? Scores the L1
  * distance between the window's source-share vector and the target
  * vector — the alarm that fires mid-ingest, not after the shard ships.
  *
  * Exactness: the target rides as fixed-point micro-weights
  * (wfp = floor(√share·10⁶), zfp = Σwfp — `mix_temperature`'s
  * order-independent normalizer at alarm resolution). Both share
  * vectors sum to 1 (non-target sources drop at the broadcast join, so
  * the window total counts target sources only), which admits the
  * positive-part identity L1 = 2·Σ_s max(tok_s·Z − w_s·C, 0)/(C·Z):
  * sources ABSENT from a window contribute max(0 − w·C, 0) = 0, so
  * only observed rows are needed — no dense source grid. All products
  * are BIGINTs (Z ≤ |sources|·10⁶, so windows up to ~10¹² tokens fit
  * int64), one pinned IEEE division at the end.
  *
  * Plan shape: TWO chained watermarked windowed aggregations (Spark's
  * multi-stateful-operator support): (window, source) token sums, then
  * a per-window fold whose collect_list is bounded by |target sources|.
  * Both finalize on the same watermark; append mode emits each window
  * once. State: (open windows × sources) longs + (open windows) lists.
  */
object MixMonitor {

  val BucketMs = 600000L
  /** L1 ≥ this flags the window (L1 ranges [0, 2]; 0.2 ≈ 10% of the
    * corpus mass off-target). */
  val AlarmL1 = 0.2

  /** Freeze the target mixture from a batch `(source, n_tok)` frame:
    * temperature-½ shares as order-independent fixed-point micro-weights
    * `(source, wfp)` with the normalizer `zfp` riding on every row. */
  def targetMixture(docs: DataFrame): DataFrame = {
    val bySource = docs.groupBy(col("source")).agg(sum(col("n_tok")).as("src_tok"))
    val tot = bySource.agg(sum(col("src_tok")).as("total_tok"))
    val weights = bySource.crossJoin(broadcast(tot)) // 1-row build side: free
      .select(col("source"),
        floor(sqrt(col("src_tok").cast("double") / col("total_tok").cast("double")) *
          lit(1000000.0)).cast("long").as("wfp"))
    val z = weights.agg(sum(col("wfp")).as("zfp"))
    weights.crossJoin(broadcast(z)) // 1-row build side: free
  }

  /** The shared two-stage scoring chain (stream and batch twin):
    * expects `event_time`, `source`, `n_tok` plus joined `wfp`/`zfp`. */
  private def scored(df: DataFrame): DataFrame = {
    val perSource = df
      .groupBy(window(col("event_time"), "10 minutes").as("w"),
        col("source"), col("wfp"), col("zfp"))
      .agg(sum(col("n_tok")).as("tok"))
    val excess = aggregate(col("parts"), lit(0L),
      (acc, x) => acc + greatest(
        x.getField("tok") * col("zfp") - x.getField("wfp") * col("c"), lit(0L)))
    perSource
      .groupBy(window(col("w"), "10 minutes").as("w2"))
      .agg(sum(col("tok")).as("c"), first(col("zfp")).as("zfp"),
        collect_list(struct(col("tok"), col("wfp"))).as("parts"))
      .select(
        expr(s"unix_millis(w2.start) DIV $BucketMs").as("bucket"),
        col("c").as("n_tok"),
        (lit(2.0) * excess.cast("double") /
          (col("c").cast("double") * col("zfp").cast("double"))).as("l1_mix"))
      .withColumn("off_target", col("l1_mix") >= AlarmL1)
  }

  /** Score a raw ingest stream `(source, event_ms, n_tok)` against the
    * frozen target. Append mode: a window emits once, when the watermark
    * passes its end (both stateful stages share the watermark). */
  def scoreMix(
      ds: Dataset[(String, Long, Long)],
      target: DataFrame,
      watermarkDelay: String = "10 seconds"): DataFrame =
    scored(ds.toDF("source", "event_ms", "n_tok")
      .withColumn("event_time", timestamp_millis(col("event_ms")))
      .withWatermark("event_time", watermarkDelay)
      .join(broadcast(target), "source"))

  /** Batch twin over the same `(source, event_ms, n_tok)` frame —
    * identical chain minus the watermark, for parity proofs. */
  def scoreMixBatch(df: DataFrame, target: DataFrame): DataFrame =
    scored(df
      .withColumn("event_time", timestamp_millis(col("event_ms")))
      .join(broadcast(target), "source"))
}
