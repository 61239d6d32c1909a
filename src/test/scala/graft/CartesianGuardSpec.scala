package graft

import graft.plans.CartesianGuard
import graft.queries.{AnalyticsQueries, SimilarityQueries}
import graft.sources.Tables

import org.apache.spark.sql.functions._

/** The planning-time all-pairs guardrail: big×big condition-less joins
  * must fail BEFORE execution; the engine's own one-row/k-row broadcast
  * crosses must pass untouched. */
class CartesianGuardSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  private def withGuard[A](maxBytes: Long)(body: => A): A = {
    CartesianGuard.install(spark)
    spark.conf.set(CartesianGuard.MaxBytesKey, maxBytes.toString)
    try body
    finally {
      spark.conf.unset(CartesianGuard.MaxBytesKey)
      spark.conf.unset(CartesianGuard.EnabledKey)
      CartesianGuard.uninstall(spark)
    }
  }

  test("big x big cross join fails at planning time with an actionable message") {
    withGuard(maxBytes = 1024) {
      val li = Tables.lineitem(spark, dir)
      val e = intercept[Exception] {
        li.crossJoin(Tables.orders(spark, dir)).queryExecution.optimizedPlan
      }
      val msg = Option(e.getMessage).getOrElse(e.getCause.getMessage)
      assert(msg.contains("CartesianGuard") && msg.contains("crossGuard.maxBytes"))
    }
  }

  test("the engine's one-row broadcast crosses pass under a tight guard") {
    withGuard(maxBytes = 1024) {
      // grouping-less aggregates estimate as one row — exactly the
      // legitimate cross-join shape the guard must not block
      Seq(
        AnalyticsQueries.cupedAb(spark, dir),
        AnalyticsQueries.incrementalStats(spark, dir),
        AnalyticsQueries.upsertMerge(spark, dir),
        SimilarityQueries.linearProbe(spark, dir),
        SimilarityQueries.modelAuc(spark, dir),
        SimilarityQueries.embeddingIsotropy(spark, dir)
      ).foreach { df =>
        df.queryExecution.optimizedPlan // forces the optimizer incl. guard
      }
    }
  }

  test("conditioned joins and the kill switch are exempt") {
    withGuard(maxBytes = 1024) {
      // a conditioned join of two large sides is NOT condition-less —
      // out of the guard's scope even when big
      Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .queryExecution.optimizedPlan
      // the kill switch lets an operator override without a rebuild
      spark.conf.set(CartesianGuard.EnabledKey, "false")
      Tables.lineitem(spark, dir).crossJoin(Tables.orders(spark, dir))
        .queryExecution.optimizedPlan
    }
  }

  test("unhinted non-equi big x big fails; a broadcast hint vouches and passes") {
    withGuard(maxBytes = 20 * 1024) {
      // a pure range join of two large tables plans as a nested-loop
      // product — the guard must refuse it
      val e = intercept[Exception] {
        Tables.lineitem(spark, dir)
          .join(Tables.orders(spark, dir), col("l_orderkey") < col("o_orderkey"))
          .queryExecution.optimizedPlan
      }
      assert(Option(e.getMessage).getOrElse(e.getCause.getMessage)
        .contains("non-equi"))
      // the engine's own non-equi shape: corpus x broadcast(query set) —
      // the hint vouches the small side, so the guard steps aside
      graft.queries.SimilarityQueries.knnCosine(spark, dir)
        .queryExecution.optimizedPlan
    }
  }

  test("the ENTIRE query surface plans clean under a tight guard") {
    // 20 KB threshold makes every fixture fact table "large" at
    // sf0.001 — any accidental unhinted product anywhere in the 196
    // queries would throw here. This is the sweep that keeps the guard
    // honest as the surface grows.
    withGuard(maxBytes = 20 * 1024) {
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          try { fn(spark, dir).queryExecution.optimizedPlan; None }
          catch { case e: Throwable if Option(e.getMessage).toSeq
              .exists(_.contains("CartesianGuard")) =>
            Some(name -> e.getMessage.take(120)) }
      }
      assert(failures.isEmpty,
        s"guard-tripped queries:\n${failures.map { case (n, m) => s"  $n: $m" }.mkString("\n")}")
    }
  }

  test("install is idempotent and uninstall restores the session") {
    CartesianGuard.install(spark)
    CartesianGuard.install(spark)
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[CartesianGuard]) == 1)
    CartesianGuard.uninstall(spark)
    assert(!spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[CartesianGuard]))
    // guard gone: the big cross plans again (execution not attempted)
    Tables.lineitem(spark, dir).crossJoin(Tables.orders(spark, dir))
      .queryExecution.optimizedPlan
  }
}
