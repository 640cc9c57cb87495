package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: `SELECT cols FROM (... row_number() OVER (PARTITION
  * BY g ORDER BY o) AS rk ...) WHERE rk <= k` — with rk discarded
  * afterwards — is a top-k-per-group reduction wearing a window
  * costume. Rewrites it to the TopKPerGroup operator, turning a full
  * shuffle + per-partition sort into bounded map-side heaps.
  *
  * Fires only when provably safe: single row_number window expression,
  * a `rk <= k` / `rk < k` / `rk = 1` filter, and no other reference to
  * the rank attribute.
  */
object RankFilterToTopK extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rank: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rank) => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.semanticEquals(rank) => Some(k - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType)) if a.semanticEquals(rank) => Some(1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: Attribute) if a.semanticEquals(rank) => Some(k)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, spec), _)), part, order, child, _)))
        if spec.partitionSpec == part && spec.orderSpec == order &&
          // the rank column must be dead above the filter
          !projectList.exists(_.references.contains(alias.toAttribute)) &&
          projectList.forall(_.references.subsetOf(child.outputSet)) =>
      limitOf(cond, alias.toAttribute) match {
        case Some(k) if k >= 1 =>
          Project(projectList, TopKPerGroup(part, order, k, child))
        case _ => p
      }
  }
}
