package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-aware two-stage aggregation: pre-aggregate on (keys, salt) to
  * spread a hot key over `buckets` reducers, then combine partials on the
  * keys alone. Results are identical to a direct groupBy (counts and
  * exact-decimal sums are associative); what changes is the shuffle: the
  * hottest key's rows land on `buckets` tasks instead of one. This is the
  * manual fallback for skew that AQE's skew-join handling doesn't cover
  * (single-key aggregation skew at 1000 executors).
  */
object Salting {

  private val Dec = DecimalType(18, 2)

  /** Salt from a high-cardinality spreading column (deterministic
    * murmur3). */
  def salt(spreadCol: Column, buckets: Int): Column =
    pmod(hash(spreadCol), lit(buckets))

  /** count + exact decimal sum of `valueCol` per `keys`, two-stage. */
  def saltedStats(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      spreadCol: String,
      buckets: Int = 16
  ): DataFrame = {
    val partial = df
      .withColumn("_salt", salt(col(spreadCol), buckets))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(
        count(lit(1)).as("_cnt"),
        sum(col(valueCol).cast(Dec)).as("_sum")
      )
    partial
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("_cnt")).as("cnt"),
        sum(col("_sum")).cast("double").as("sum_value")
      )
  }

  /** Skew-aware equijoin: the big (skewed) side salts each row into one
    * of `buckets` sub-keys; the small-but-not-broadcastable side is
    * replicated once per bucket, so the join key becomes
    * (key, salt) and the hottest key's rows spread over `buckets` tasks.
    * `spread` must be a HIGH-CARDINALITY expression (ideally row-unique,
    * e.g. a composite of the row's natural key) — a low-cardinality
    * spread column caps the fan-out at its distinct count while the
    * replication still pays the full `buckets` factor.
    * Same rows out as a plain equijoin. This is the manual fallback
    * when the dim outgrows the broadcast threshold AND a key is hot
    * enough that AQE's split-by-size skew handling still leaves one
    * straggler partition (size-based splitting can't separate rows that
    * share one key's hash). Replication cost: |right| × buckets rows
    * shuffled — pick `buckets` ≈ the skew factor, not the cluster size. */
  def saltedJoin(
      big: DataFrame,
      right: DataFrame,
      key: String,
      spread: Column,
      buckets: Int = 16
  ): DataFrame = {
    val spark = big.sparkSession
    import spark.implicits._
    val saltedBig = big.withColumn("_salt", salt(spread, buckets))
    val replicated = right.crossJoin(broadcast((0 until buckets).toDF("_salt")))
    // shuffle_hash pins the shuffled-join path: the whole point of
    // salting is the regime where `right` does NOT fit the broadcast
    // threshold, which the fixture can't reproduce by size
    saltedBig.join(replicated.hint("shuffle_hash"), Seq(key, "_salt")).drop("_salt")
  }
}
