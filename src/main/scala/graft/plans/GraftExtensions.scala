package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.cube.GraftSql

/** Transparent query acceleration as a SparkSessionExtensions plugin —
  * the Spark-idiomatic form of the reference's planner integration
  * (kylin-spark-query SparderContext registers Calcite rules that swap
  * cube scans into user queries; here a Catalyst rule does the same to
  * plain `spark.sql(...)`, no GraftSql.sqlVia call required).
  *
  * Install at session build time, then opt in per session:
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.plans.GraftExtensions")
  *     ...
  *   GraftSql.registerViews(spark, dataDir)
  *   spark.conf.set("spark.graft.accelerate", "true")
  *   spark.sql("SELECT n_name, sum(...) FROM graft_star GROUP BY ...")
  *   // ^ served from the routed cuboid, falls back plan-unchanged
  *   //   whenever the shape/types don't match
  * }}}
  *
  * The rule is injected post-hoc-resolution: that is the only phase
  * where the plan still carries the View nodes the route matcher keys
  * on (the optimizer inlines views away) and is already resolved. All
  * refusal logic lives in `GraftSql.accelerate` — a None leaves the
  * user's plan byte-identical. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPostHocResolutionRule(s => GraftAccelerationRule(s))
    // serving guard AFTER acceleration (same Once batch, in order):
    // it wraps whatever plan will actually be consumed, and reads the
    // acceleration outcome the rule above just recorded for pool
    // choice (ServeGuard.scala; reference ResultPlan.scala:60-123)
    ext.injectPostHocResolutionRule(s => ServeGuardRule(s))
    ext.injectPlannerStrategy(_ => ServeGuardStrategy)
    ext.injectColumnar(_ => new ServeGuardColumnarRule)
  }
}

final case class GraftAccelerationRule(session: SparkSession)
    extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    GraftSql.accelerate(session, plan).getOrElse(plan)
}
