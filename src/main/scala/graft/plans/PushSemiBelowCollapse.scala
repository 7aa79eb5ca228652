package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join,
  LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.LatestBy

/** Pushes a LeftSemi restriction below the lake's merge-on-read
  * `latest_by` collapse so an affected-groups probe reads O(affected),
  * not collapse-the-whole-table-first.
  *
  * Spark's own `PushDownLeftSemiAntiJoin` refuses every case when the
  * join can be planned as a broadcast hash join (SPARK-34081's TPC-DS
  * heuristic: a cheap broadcast semi above a cardinality-REDUCING
  * aggregate often beats pushing it below). For this engine's collapse
  * the economics invert: `latest_by` carries the full row payload through
  * a shuffle, its output is ~input-sized (key versions, not rollups), and
  * the probe side is a tiny affected-group set — filtering at the scan
  * removes almost all of the shuffle. So this rule re-enables the push,
  * gated to aggregates that contain a [[graft.functions.LatestBy]] (the
  * engine's own collapse marker — user aggregates keep Spark's
  * heuristic).
  *
  * Safety: `Join(Agg(c), R) ≡ Agg(Join(c, R))` for LeftSemi whose
  * condition references only GROUPING ATTRIBUTES of the left side (group
  * membership is per-key; restricting groups before or after collapsing
  * picks the same winners; a semi never duplicates left rows). The
  * Project/Filter peels are the standard pushes Spark itself performs
  * when its broadcast guard does not fire, restricted to deterministic
  * expressions with the condition resolvable below.
  *
  * Installed per session via `spark.experimental.extraOptimizations`
  * (the "User Provided Optimizers" fixed-point batch, running after the
  * main optimizer has collapsed the snapshot plan into the
  * Join ← Project ← Filter ← Aggregate shape this rule peels);
  * [[ensureInstalled]] is idempotent and called by the lake read path.
  */
object PushSemiBelowCollapse extends Rule[LogicalPlan] {

  private def isCollapse(agg: Aggregate): Boolean =
    agg.aggregateExpressions.exists(_.exists {
      case ae: AggregateExpression =>
        ae.aggregateFunction.isInstanceOf[LatestBy]
      case _ => false
    })

  private def groupingAttrs(agg: Aggregate): AttributeSet =
    AttributeSet(agg.groupingExpressions.collect { case a: Attribute => a })

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // peel a deterministic Project when the condition already resolves
    // below it (the engine's key columns are pass-through attributes).
    // A non-deterministic CONDITION must never move below the collapse:
    // it would filter row VERSIONS instead of collapsed groups, letting
    // a stale version win latest_by.
    case j @ Join(p: Project, right, LeftSemi, Some(cond), _)
        if cond.deterministic &&
          p.projectList.forall(_.deterministic) &&
          containsCollapse(p.child) &&
          cond.references.subsetOf(p.child.outputSet ++ right.outputSet) =>
      p.copy(child = j.copy(left = p.child))
    // peel a deterministic Filter (output = child output)
    case j @ Join(f: Filter, _, LeftSemi, Some(cond), _)
        if cond.deterministic && f.condition.deterministic &&
          containsCollapse(f.child) =>
      f.copy(child = j.copy(left = f.child))
    // land below the collapse aggregate itself. groupingExpressions must
    // be non-empty: a GLOBAL aggregate emits one row even over empty
    // input, so Join(Agg(c), R) ≡ Agg(Join(c, R)) does not hold for it.
    case j @ Join(agg: Aggregate, right, LeftSemi, Some(cond), _)
        if isCollapse(agg) && agg.groupingExpressions.nonEmpty &&
          cond.deterministic &&
          agg.aggregateExpressions.forall(_.deterministic) &&
          cond.references.subsetOf(groupingAttrs(agg) ++ right.outputSet) =>
      agg.copy(child = j.copy(left = agg.child))
  }

  /** The peels only fire on plans that actually lead down to an engine
    * collapse — user Project/Filter chains elsewhere stay untouched. */
  private def containsCollapse(plan: LogicalPlan): Boolean = plan match {
    case agg: Aggregate => isCollapse(agg)
    case p: Project => containsCollapse(p.child)
    case f: Filter => containsCollapse(f.child)
    case _ => false
  }

  /** Idempotently register the rule on `spark`'s experimental optimizer
    * extensions. The read-modify-write is synchronized on the session's
    * ExperimentalMethods so a racing concurrent appender (this rule from
    * another thread, or a third-party rule) is never silently dropped. */
  def ensureInstalled(spark: SparkSession): Unit =
    spark.experimental.synchronized {
      val cur = spark.experimental.extraOptimizations
      if (!cur.exists(_ eq this))
        spark.experimental.extraOptimizations = cur :+ this
    }
}
