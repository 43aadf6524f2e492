package graft.lineage

import org.apache.spark.sql.catalyst.expressions.{Attribute, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._

/** Column-level lineage: resolve each output attribute of an analyzed plan
  * down to the set of source-table columns it derives from, following
  * ExprId chains through Project/Aggregate/Window/Generate/Union/joins.
  */
object ColumnLineage {

  /** Lineage for every output column of `plan` (analyzed). */
  def forPlan(plan: LogicalPlan): Seq[ColumnMapping] = {
    val body = PlanExtractor.queryBody(plan)
    body.output.map { attr =>
      ColumnMapping(attr.name, resolve(attr, body).toSeq.sorted,
        derivation(attr, body))
    }
  }

  /** The derivation expression (Catalyst SQL) that COMPUTES `attr`, or
    * None when the column is an identity read of a source column.
    * Rename chains (Alias over a bare attribute, `withColumnRenamed`)
    * are transparent: the walk continues below them, so `sum(x) AS a`
    * later renamed to `b` still reports `sum(x)`. Only the OUTERMOST
    * non-trivial expression is reported — it names the columns of the
    * plan level it was written at, which is what a catalog consumer
    * reads alongside the resolved source set.
    */
  def derivation(attr: Attribute, plan: LogicalPlan): Option[String] = plan match {
    case leaf if leaf.children.isEmpty => None

    case p: Project => derivationNamed(attr, p.projectList, p.child)

    case a: Aggregate => derivationNamed(attr, a.aggregateExpressions, a.child)

    case w: Window =>
      w.windowExpressions.find(_.toAttribute.exprId == attr.exprId) match {
        case Some(ne) => derivationOf(ne, w.child)
        case None     => derivation(attr, w.child)
      }

    case g: Generate =>
      if (g.generatorOutput.exists(_.exprId == attr.exprId))
        Some(g.generator.sql)
      else derivation(attr, g.child)

    case u: Union =>
      // per-branch derivations may differ; report the first branch's
      // (the UNION's output naming follows it) when any branch computes
      val idx = u.output.indexWhere(_.exprId == attr.exprId)
      if (idx >= 0) u.children.view.flatMap(c => derivation(c.output(idx), c)).headOption
      else None

    case other =>
      val owning = other.children.filter(_.outputSet.contains(attr))
      val targets = if (owning.nonEmpty) owning else other.children
      targets.view.flatMap(c => derivation(attr, c)).headOption
  }

  private def derivationNamed(
      attr: Attribute,
      exprs: Seq[NamedExpression],
      child: LogicalPlan): Option[String] =
    exprs.find(_.toAttribute.exprId == attr.exprId) match {
      case Some(ne) => derivationOf(ne, child)
      case None     => derivation(attr, child)
    }

  private def derivationOf(ne: NamedExpression, child: LogicalPlan): Option[String] =
    ne match {
      case a: org.apache.spark.sql.catalyst.expressions.Alias =>
        a.child match {
          case ar: Attribute => derivation(ar, child) // pure rename: descend
          case computed      => Some(computed.sql)
        }
      case ar: Attribute => derivation(ar, child)
      case otherNe       => Some(otherNe.sql)
    }

  /** Source columns (as "source.column") feeding `attr` within `plan`. */
  def resolve(attr: Attribute, plan: LogicalPlan): Set[String] = plan match {
    case leaf if leaf.children.isEmpty =>
      if (leaf.outputSet.contains(attr))
        Set(s"${PlanExtractor.leafName(leaf)}.${attr.name}")
      else Set.empty

    case p: Project =>
      resolveNamed(attr, p.projectList, p.child)

    case a: Aggregate =>
      resolveNamed(attr, a.aggregateExpressions, a.child)

    case w: Window =>
      w.windowExpressions.find(_.toAttribute.exprId == attr.exprId) match {
        case Some(ne) => resolveRefs(ne, w.child)
        case None     => resolve(attr, w.child)
      }

    case g: Generate =>
      if (g.generatorOutput.exists(_.exprId == attr.exprId))
        g.generator.references.toSeq.flatMap(a => resolve(a, g.child)).toSet
      else resolve(attr, g.child)

    case u: Union =>
      val idx = u.output.indexWhere(_.exprId == attr.exprId)
      if (idx >= 0) u.children.flatMap(c => resolve(c.output(idx), c)).toSet
      else u.children.flatMap(c => resolve(attr, c)).toSet

    case e: Expand =>
      // rollup/cube/grouping-sets: each output position is fed by the
      // same position of every projection row (NULLed out in some — the
      // union of references is the true source set)
      val idx = e.output.indexWhere(_.exprId == attr.exprId)
      if (idx >= 0)
        e.projections.flatMap(p =>
          p(idx).references.toSeq.flatMap(a => resolve(a, e.child))).toSet
      else resolve(attr, e.child)

    case other =>
      // pass-through nodes (Filter, Join, Sort, SubqueryAlias, Limit, ...):
      // descend into whichever children can produce the attribute
      val owning = other.children.filter(_.outputSet.contains(attr))
      val targets = if (owning.nonEmpty) owning else other.children
      targets.flatMap(c => resolve(attr, c)).toSet
  }

  private def resolveNamed(
      attr: Attribute,
      exprs: Seq[NamedExpression],
      child: LogicalPlan): Set[String] =
    exprs.find(_.toAttribute.exprId == attr.exprId) match {
      case Some(ne) => resolveRefs(ne, child)
      case None     => resolve(attr, child)
    }

  private def resolveRefs(ne: NamedExpression, child: LogicalPlan): Set[String] = {
    val direct = ne.references.toSeq.flatMap(a => resolve(a, child)).toSet
    // a column computed FROM a subquery (SELECT (SELECT max(x) FROM t))
    // derives from the subquery plan's own sources
    val fromSubqueries = ne.collect {
      case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression =>
        s.plan.output.flatMap(a => resolve(a, s.plan)).toSet
    }.flatten.toSet
    direct ++ fromSubqueries
  }
}
