package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators for the 100 TB path: bucketing (co-located,
  * exchange-free joins on the bucket key) and date-partitioned writes
  * (partition pruning at the scan).
  *
  * At 100 TB the biggest shuffle in the engine is lineitem⋈orders on the
  * order key; bucketing both sides by that key at write time removes the
  * exchange from EVERY downstream join. Likewise event data written
  * `PARTITION BY (event_date)` turns time-range filters into directory
  * pruning instead of a full scan. LayoutSpec asserts both effects on the
  * physical plan.
  */
object Layout {

  /** Write a DataFrame as a managed bucketed table (sorted within
    * buckets) — the layout that makes `key`-equijoins exchange-free. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int
  ): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: with matching
    * bucket counts Spark plans a SortMergeJoin with NO Exchange on either
    * side. */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      key: String
  ): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Write events date-partitioned; range predicates on the partition
    * column become PartitionFilters (directory pruning). */
  def writeDatePartitioned(df: DataFrame, tsCol: String, path: String): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .write
      .partitionBy("event_date")
      .mode("overwrite")
      .parquet(path)

  /** Range-partitioned, within-file-sorted write: each output file covers
    * a disjoint key range (repartitionByRange samples split points), so
    * min/max footer stats make range scans skip whole files — the sorted
    * layout a time-series table wants at rest. */
  def writeRangeSorted(df: DataFrame, keyCol: String, partitions: Int, path: String): Unit =
    df.repartitionByRange(partitions, col(keyCol))
      .sortWithinPartitions(col(keyCol))
      .write
      .mode("overwrite")
      .parquet(path)
}
