package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer guardrail: refuse condition-less joins whose BOTH sides are
  * large — the "accidental all-pairs" shape that is survivable at test
  * scale and fatal at 100 TB (a 1 TB × 1 TB cross join is 10²⁴ row
  * pairs; no cluster finishes it, it just burns until someone kills
  * the job). Every legitimate cross join in this engine crosses a
  * one-row (or k-row) aggregate against the corpus — those pass,
  * because the small side's size estimate sits under the threshold.
  * Misuse fails AT PLANNING TIME with an actionable message instead of
  * at hour six of the job.
  *
  * Scope: `Join` nodes with NO condition (a filtered cross join is
  * rewritten by Catalyst into a conditioned join before this rule
  * runs, so genuine `a.crossJoin(b)` misuse is exactly what remains).
  * The size source is the logical stats visitor — for scans that is
  * file size, for grouping-less aggregates a one-row estimate, i.e.
  * precisely the signal that separates "broadcastable moment row"
  * from "second corpus".
  *
  * Wiring: injected by [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions`) or per-session via [[CartesianGuard.install]]
  * (`spark.experimental.extraOptimizations` — removable with
  * [[CartesianGuard.uninstall]], which test harnesses use).
  * `spark.graft.crossGuard.maxBytes` tunes the per-side threshold
  * (default 10 MB, the autoBroadcastJoinThreshold ballpark);
  * `spark.graft.crossGuard.enabled=false` disables without rebuilding
  * the session.
  */
case class CartesianGuard(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val enabled = spark.conf
      .getOption(CartesianGuard.EnabledKey).forall(_.toBoolean)
    if (enabled) {
      val maxBytes = spark.conf.getOption(CartesianGuard.MaxBytesKey)
        .map(_.toLong).getOrElse(CartesianGuard.DefaultMaxBytes)
      plan.foreach {
        case j @ Join(left, right, _, cond, hint)
            if !CartesianGuard.broadcastHinted(hint) &&
              !cond.exists(CartesianGuard.hasEquality) =>
          // no condition at all, OR a condition with no equality
          // anywhere: both plan as a product (CartesianProduct /
          // BroadcastNestedLoopJoin), i.e. |L|×|R| comparisons. An
          // explicit broadcast() hint is the author vouching a side is
          // small — that case is exempt (the equality test is crude in
          // the SAFE direction: any equality anywhere passes, so the
          // guard never blocks a plan Catalyst could hash-join).
          val (lb, rb) = (left.stats.sizeInBytes, right.stats.sizeInBytes)
          if (lb > maxBytes && rb > maxBytes) {
            throw new IllegalStateException(
              s"CartesianGuard: ${if (cond.isEmpty) "condition-less" else "non-equi"} " +
                s"join of two large relations " +
                s"(~$lb x ~$rb bytes, threshold $maxBytes/side) would be an " +
                s"all-pairs product at scale. Broadcast a genuinely small " +
                s"side, add an equi-condition, or raise " +
                s"${CartesianGuard.MaxBytesKey}. Join: ${j.simpleString(1)}")
          }
        case _ => ()
      }
    }
    plan
  }
}

object CartesianGuard {
  val EnabledKey = "spark.graft.crossGuard.enabled"
  val MaxBytesKey = "spark.graft.crossGuard.maxBytes"

  import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression}
  import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, JoinHint}

  /** Any equality anywhere in the condition — deliberately crude in the
    * safe direction (a literal equality also passes), so the guard can
    * never block a join Catalyst could execute as a hash join. */
  private[plans] def hasEquality(cond: Expression): Boolean = cond.exists {
    case _: EqualTo | _: EqualNullSafe => true
    case _ => false
  }

  /** An explicit `broadcast()` hint on either side is the author
    * vouching that side is small — exempt. */
  private[plans] def broadcastHinted(hint: JoinHint): Boolean =
    Seq(hint.leftHint, hint.rightHint).flatten
      .exists(_.strategy.contains(BROADCAST))

  /** ~autoBroadcastJoinThreshold: a side this small would broadcast. */
  val DefaultMaxBytes: Long = 10L * 1024 * 1024

  /** Arm the guard on a live session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!installed(spark))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CartesianGuard(spark)

  /** Remove the guard from a live session (for shared test sessions). */
  def uninstall(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[CartesianGuard])

  private def installed(spark: SparkSession): Boolean =
    spark.experimental.extraOptimizations.exists(_.isInstanceOf[CartesianGuard])
}
