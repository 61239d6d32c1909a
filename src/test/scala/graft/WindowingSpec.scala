package graft

import graft.operators.Windowing

import org.apache.spark.sql.functions._

class WindowingSpec extends SparkSuite {
  import spark.implicits._

  test("tumble aligns to epoch and every event lands in exactly one window") {
    val ts = Seq(0L, 1L, 9999L, 10000L, 10001L, 123456789L)
    val df = ts.toDF("ms").withColumn("t", timestamp_millis(col("ms")))
    val rows = df.select(col("ms"), unix_millis(Windowing.tumble(col("t"), 10000L)).as("ws"))
      .collect()
    rows.foreach { r =>
      val (ms, ws) = (r.getLong(0), r.getLong(1))
      assert(ws % 10000 == 0)
      assert(ws <= ms && ms < ws + 10000)
    }
  }

  test("tumble matches functions.window start (cross-check vs built-in)") {
    val df = (0 until 500).map(i => 1700000000000L + i * 3777L).toDF("ms")
      .withColumn("t", timestamp_millis(col("ms")))
    val mismatch = df
      .withColumn("ours", Windowing.tumble(col("t"), 10000L))
      .groupBy(window(col("t"), "10 seconds"), col("ours"))
      .count()
      .filter(col("window.start") =!= col("ours"))
      .count()
    assert(mismatch == 0)
  }

  test("splitLate: cutoff is max event time minus lateness, deterministic") {
    val df = Seq(1000L, 5000L, 9000L, 20000L).toDF("ms")
      .withColumn("t", timestamp_millis(col("ms")))
    val (onTime, late) = Windowing.splitLate(df, "t", "5 SECONDS")
    // max = 20000ms; cutoff = 15000ms; late = {1000, 5000, 9000}
    assert(late.select("ms").as[Long].collect().sorted.toSeq == Seq(1000L, 5000L, 9000L))
    assert(onTime.select("ms").as[Long].collect().toSeq == Seq(20000L))
  }

  test("tumblingStats: count/min/max/sum/avg per window+key") {
    val df = Seq(
      (1000L, "a", 1.0), (2000L, "a", 3.0), (11000L, "a", 5.0), (1000L, "b", 7.0)
    ).toDF("ms", "k", "v").withColumn("t", timestamp_millis(col("ms")))
    val out = Windowing.tumblingStats(df, "t", Seq("k"), 10000L, "v")
      .select("window_start", "k", "cnt", "min_value", "max_value", "sum_value", "avg_value")
      .orderBy("k", "window_start")
      .collect()
    assert(out.length == 3)
    val first = out(0) // k=a window 0
    assert(first.getLong(2) == 2 && first.getDouble(3) == 1.0 &&
      first.getDouble(4) == 3.0 && first.getDouble(5) == 4.0 && first.getDouble(6) == 2.0)
  }
}
