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

  test("sink append across batches (micro-batch = buffer, no flush-boundary bug)") {
    val dir = Files.createTempDirectory("sinkspec2").toString
    val sink = new ParquetTableSink(dir)
    sink.write(points, 0L)
    sink.write(points, 1L)
    assert(spark.read.parquet(s"$dir/data").count() == 4)
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
