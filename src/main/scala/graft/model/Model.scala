package graft.model

import org.apache.spark.sql.types._

/** The engine's core time-series data model.
  *
  * Mirrors the reference's single data abstraction — the mutable Timestream
  * point POJO (reference: TimestreamPoint.java:8-98) — as an immutable Scala
  * case class suitable for a `Dataset[TimestreamPoint]` typed path. The
  * relational path (preferred: columnar pruning + predicate pushdown work on
  * top-level columns) promotes the three produced dimensions
  * (callerservice/operation/awsaccountid, reference:
  * LogsToTimestreamPayloadFn.java:30-37,86-88) to first-class columns and
  * keeps the open-ended map alongside.
  *
  * `time` is epoch milliseconds; the model boundary converts it to a real
  * `TimestampType` column `event_time` because Spark watermarks/windows
  * require TimestampType, not Long.
  */
final case class TimestreamPoint(
    time: Long,
    timeUnit: String,
    measureName: String,
    measureValue: String,
    measureValueType: String,
    dimensions: Map[String, String]
)

object TimestreamPoint {
  /** Valid measure value types (reference: TimestreamPoint.java:11 uses the
    * AWS SDK MeasureValueType enum; we model it as a constrained string). */
  val MeasureValueTypes: Set[String] = Set("DOUBLE", "BIGINT", "VARCHAR", "BOOLEAN")

  val schema: StructType = StructType(Seq(
    StructField("time", LongType),
    StructField("timeUnit", StringType),
    StructField("measureName", StringType),
    StructField("measureValue", StringType),
    StructField("measureValueType", StringType),
    StructField("dimensions", MapType(StringType, StringType))
  ))
}
