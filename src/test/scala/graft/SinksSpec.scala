package graft

import graft.config.AppConfig
import graft.sink.Sinks.{DdlInitializer, ParquetTableSink}

import org.apache.spark.sql.functions._

import java.nio.file.Files

class SinksSpec extends SparkSuite {
  import spark.implicits._

  private def points = Seq(
    // (time, measure_value, measure_value_type) — row 2 has a bad DOUBLE,
    // row 3 a null time, row 4 an unknown type: all rejected like
    // Timestream's RejectedRecords (TimestreamSink.java:103-120)
    (Some(1000L), "1.5", "DOUBLE"),
    (Some(2000L), "not-a-number", "DOUBLE"),
    (None: Option[Long], "2.5", "DOUBLE"),
    (Some(3000L), "9", "GEOMETRY"),
    (Some(4000L), "42", "BIGINT")
  ).toDF("time", "measure_value", "measure_value_type")

  test("per-record rejection: invalid rows land in the dead letter, valid rows write") {
    val dir = Files.createTempDirectory("sinkspec").toString
    val sink = new ParquetTableSink(dir)
    val (ok, bad) = sink.write(points, 0L)
    assert(ok == 2 && bad == 3)
    assert(spark.read.parquet(s"$dir/data").count() == 2)
    val dead = spark.read.parquet(s"$dir/_dead_letter")
    assert(dead.count() == 3)
    assert(dead.filter(col("measure_value") === "not-a-number").count() == 1)
  }

  test("NULL measure_value_type / measure_value rows land in the dead letter, not limbo") {
    // a NULL type makes isin() three-valued NULL: without the null-safe
    // _valid flag these rows failed BOTH filters and vanished from the
    // batch entirely (counted in neither output)
    val dir = Files.createTempDirectory("sinkspec_null").toString
    val withNulls = Seq(
      (Some(1000L), Some("1.5"), Some("DOUBLE")),
      (Some(2000L), Some("7"), None: Option[String]), // NULL type
      (Some(3000L), None: Option[String], Some("VARCHAR")) // NULL value
    ).toDF("time", "measure_value", "measure_value_type")
    val (ok, bad) = new ParquetTableSink(dir).write(withNulls, 0L)
    assert(ok == 1 && bad == 2, s"got ($ok, $bad) — every row must land somewhere")
    assert(spark.read.parquet(s"$dir/_dead_letter").count() == 2)
  }

  test("sink append across batches (micro-batch = buffer, no flush-boundary bug)") {
    val dir = Files.createTempDirectory("sinkspec2").toString
    val sink = new ParquetTableSink(dir)
    sink.write(points, 0L)
    sink.write(points, 1L)
    assert(spark.read.parquet(s"$dir/data").count() == 4)
  }

  test("idempotent sink: a replayed batchId writes nothing twice") {
    val dir = Files.createTempDirectory("sink-idem").toString
    val sink = new graft.sink.Sinks.IdempotentSink(
      new ParquetTableSink(s"$dir/t"), s"$dir/markers")
    val batch = points
    val first = sink.write(batch, 7L)
    assert(first == (2L, 3L))
    // recovery replay: same batchId re-delivered — must be a no-op
    val replay = sink.write(batch, 7L)
    assert(replay == (0L, 0L))
    assert(spark.read.parquet(s"$dir/t/data").count() == 2L)
    assert(spark.read.parquet(s"$dir/t/_dead_letter").count() == 3L)
    // a NEW batchId still writes
    val next = sink.write(batch.filter(col("time").isNotNull), 8L)
    assert(next == (2L, 2L))
    assert(spark.read.parquet(s"$dir/t/data").count() == 4L)
  }

  test("legacy flat layout is detected; a date-partitioned sink is not") {
    import org.apache.spark.sql.functions.col
    val flat = Files.createTempDirectory("flat_sink").toString
    val pts = Seq((1000L, "DOUBLE", "1.0"))
      .toDF("time", "measure_value_type", "measure_value")
    new ParquetTableSink(flat).write(pts, 0L)
    assert(ParquetTableSink.isLegacyFlat(spark, s"$flat/data"),
      "top-level part files must read as the legacy flat layout")
    val part = Files.createTempDirectory("part_sink").toString
    new ParquetTableSink(part, datePartitioned = true).write(pts, 0L)
    assert(!ParquetTableSink.isLegacyFlat(spark, s"$part/data"),
      "event_date= directories are the partitioned layout, not legacy")
    // missing dir: fresh sink, not legacy
    assert(!ParquetTableSink.isLegacyFlat(spark, s"$part/nope"))
  }

  test("DDL initializer is idempotent and emits IF NOT EXISTS with retention") {
    val dir = Files.createTempDirectory("ddl").toString + "/table"
    assert(DdlInitializer.ensureTableDir(dir))
    assert(!DdlInitializer.ensureTableDir(dir)) // second call: already there
    val sql = DdlInitializer.createTableSql(AppConfig())
    assert(sql.contains("CREATE TABLE IF NOT EXISTS kdaflink.kdaflinkmetrics"))
    assert(sql.contains("memory_store_retention_hours=24"))
    assert(sql.contains("magnetic_store_retention_days=7"))
  }
}
