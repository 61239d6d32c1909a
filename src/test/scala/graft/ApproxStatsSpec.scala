package graft

import graft.queries.AnalyticsQueries
import graft.sources.Tables

import org.apache.spark.sql.functions._

/** Error-bound correctness for the approximate sketches — the one
  * `queries()` entry with no DuckDB oracle (sketch internals are
  * engine-specific, so cross-engine hash comparison is impossible by
  * design). Instead, the sketches are checked against EXACT aggregation
  * on the same data within their documented accuracy:
  *
  *   - `approx_count_distinct(rsd = 0.01)`: HLL++ with 1% target relative
  *     standard deviation — assert within 5% of exact `countDistinct`
  *     (5 sigma; a failure means the sketch is broken, not unlucky).
  *   - `percentile_approx(accuracy = 10000)`: rank error ≤ n/accuracy —
  *     assert the approximate p50/p99 lies between the exact percentiles
  *     at q ∓ 0.01 (two orders of magnitude looser than the documented
  *     bound at this n, so the test is stable while still catching any
  *     real defect).
  */
class ApproxStatsSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.01"

  test("approx_count_distinct within 5% of exact countDistinct per group") {
    val approx = AnalyticsQueries.approxStats(spark, dir)
      .select(col("event_type"), col("approx_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the exact side is the oracle-checked `exact_distinct` query — the
    // same anchor the driver hash-gates in DuckDB at verify scale
    val exact = AnalyticsQueries.exactDistinct(spark, dir)
      .select(col("event_type"), col("n_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, ex) =>
      val ap = approx(k)
      val relErr = math.abs(ap - ex).toDouble / ex
      assert(relErr < 0.05, s"$k: approx $ap vs exact $ex (rel err $relErr)")
    }
  }

  test("percentile_approx p50/p99 within rank-error bounds of exact percentiles") {
    val approx = AnalyticsQueries.approxStats(spark, dir)
      .select(col("event_type"), col("p50_value"), col("p99_value"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // exact percentile brackets at q -/+ 0.01
    val exact = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        percentile(col("value"), lit(0.49)).as("p49"),
        percentile(col("value"), lit(0.51)).as("p51"),
        percentile(col("value"), lit(0.98)).as("p98"),
        percentile(col("value"), lit(1.0)).as("p100")
      )
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (p49, p51, p98, p100)) =>
      val (p50a, p99a) = approx(k)
      assert(p50a >= p49 && p50a <= p51, s"$k: p50 approx $p50a outside [$p49, $p51]")
      assert(p99a >= p98 && p99a <= p100, s"$k: p99 approx $p99a outside [$p98, $p100]")
    }
  }
}
