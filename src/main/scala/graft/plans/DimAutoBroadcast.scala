package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Injected optimizer rule: auto-broadcast the KNOWN dimension tables.
  *
  * On a 100 TB star schema the dimensions are small by design, but
  * auto-broadcast by size (`spark.sql.autoBroadcastJoinThreshold`) only
  * fires when statistics exist and are small enough, and every analyst
  * forgetting a `broadcast()` hint pays a fact-table sort-merge-join.
  * Warehouses solve this with a DIMENSION REGISTRY: a rule that
  * recognizes the registered dims structurally and hints the broadcast
  * regardless of size estimates. That's this rule — it walks each Join,
  * and if one side is (a projection/filter over) a scan of a registered
  * dimension table with no explicit strategy hint already present, it
  * adds the broadcast hint. Planner strategy selection then picks
  * BroadcastHashJoin even with auto-broadcast disabled.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule` (see
  * [[GraftExtensions]]) — the third injection surface next to functions
  * and the check-rule listener hook.
  */
object DimAutoBroadcast extends Rule[LogicalPlan] {

  /** The star schema's dimension tables (by file/table base name). */
  private val DIMS = Set("region", "nation", "supplier", "customer", "part")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j: Join =>
      val withLeft =
        if (dimName(j.left).isDefined && j.hint.leftHint.isEmpty)
          j.copy(hint = j.hint.copy(leftHint = Some(HintInfo(strategy = Some(BROADCAST)))))
        else j
      if (dimName(withLeft.right).isDefined && withLeft.hint.rightHint.isEmpty)
        withLeft.copy(hint = withLeft.hint.copy(rightHint = Some(HintInfo(strategy = Some(BROADCAST)))))
      else withLeft
  }

  /** The registered-dimension name behind a (projected/filtered/aliased)
    * scan, if any. */
  private def dimName(p: LogicalPlan): Option[String] = p match {
    case Project(_, child)         => dimName(child)
    case Filter(_, child)          => dimName(child)
    case SubqueryAlias(_, child)   => dimName(child)
    case ResolvedHint(child, _)    => dimName(child)
    case lr: LogicalRelation =>
      lr.relation match {
        case hfs: HadoopFsRelation =>
          hfs.location.rootPaths.headOption
            .map(_.getName.stripSuffix(".parquet"))
            .filter(DIMS.contains)
        case _ => None
      }
    case _ => None
  }
}
