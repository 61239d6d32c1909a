package graft

import graft.config.AppConfig
import graft.sink.Sinks.JdbcBatchSink

import org.apache.spark.sql.functions._

/** The real JDBC edge, end to end against embedded Derby (on Spark's own
  * classpath) — accepted rows land in the table, rejected rows in the
  * `<table>_dead_letter` table, repeated batches append. */
class JdbcSinkSpec extends SparkSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftsink;create=true"

  private def points = Seq(
    (Some(1000L), "1.5", "DOUBLE"),
    (Some(2000L), "not-a-number", "DOUBLE"), // rejected
    (Some(3000L), "42", "BIGINT")
  ).toDF("time", "measure_value", "measure_value_type")

  test("JDBC sink writes accepted rows and dead-letters rejects") {
    val cfg = AppConfig.load(Array("--jdbcUrl", url, "--TimestreamTableName", "points"))
    val sink = new JdbcBatchSink(cfg)
    val (ok, bad) = sink.write(points, 0L)
    assert(ok == 2 && bad == 1)
    val back = spark.read.jdbc(url, "points", new java.util.Properties())
    assert(back.count() == 2)
    assert(back.filter(col("measure_value") === "not-a-number").count() == 0)
    val dead = spark.read.jdbc(url, "points_dead_letter", new java.util.Properties())
    assert(dead.count() == 1)
    // second batch appends (micro-batch = buffer; no flush-boundary bug)
    sink.write(points, 1L)
    assert(spark.read.jdbc(url, "points", new java.util.Properties()).count() == 4)
  }
}
