package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType}

/** SURVEY §4 ("KNN search" / "Spatial point-in-polygon join" rows) — the
  * automated version of the grid-bucket rewrite SpatialQueries performs
  * by hand: a `Rule[LogicalPlan]` that turns a radius θ-join
  *
  *   a JOIN b ON (ax-bx)² + (ay-by)² <= r²        (no equi keys → the
  *                                                 planner's only option
  *                                                 is a nested-loop join)
  *
  * into a grid-cell equi-join: both sides are keyed to cells of side
  * r = √r², the probe side explodes to its 3×3 neighborhood, and the
  * original distance predicate stays as the exact residual. With cell
  * size == radius the rewrite is EXACT (a match cannot hide outside the
  * neighborhood), and the planner now sees equi keys → hash join,
  * shuffle partitioned by cell — the O(n·m) → O(n+m+pairs) move that
  * makes the join survive 100 TB.
  *
  * The rule only fires on Inner joins whose condition has NO extractable
  * equi predicate (if it has one the join is already shuffleable), which
  * also makes it idempotent: its own output contains cell equi keys.
  */
object RadiusJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** ((a1-a2)*(a1-a2) + (c1-c2)*(c1-c2)) <= r2 */
  private object Dist2LE {
    def unapply(e: Expression): Option[(Expression, Expression, Expression, Expression, Double)] =
      e match {
        case LessThanOrEqual(
            Add(
              Multiply(Subtract(a1, a2, _), Subtract(b1, b2, _), _),
              Multiply(Subtract(c1, c2, _), Subtract(d1, d2, _), _), _),
            Literal(r2: Double, DoubleType))
            if a1.semanticEquals(b1) && a2.semanticEquals(b2) &&
              c1.semanticEquals(d1) && c2.semanticEquals(d2) && r2 > 0 =>
          Some((a1, a2, c1, c2, r2))
        case _ => None
      }
  }

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def hasEquiKey(conjuncts: Seq[Expression], l: LogicalPlan,
      r: LogicalPlan): Boolean =
    conjuncts.exists {
      case EqualTo(a, b) =>
        (refsOnly(a, l) && refsOnly(b, r)) || (refsOnly(a, r) && refsOnly(b, l))
      case _ => false
    }

  private def cellOf(coord: Expression, cell: Double): Expression =
    Floor(Divide(coord, Literal(cell)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val radius = conjuncts.collectFirst {
        case d @ Dist2LE(x1, x2, y1, y2, r2)
            if refsOnly(x1, left) && refsOnly(y1, left) &&
              refsOnly(x2, right) && refsOnly(y2, right) =>
          // nextUp: sqrt rounds to nearest, which can land strictly BELOW
          // the true radius; the cell must be >= the radius or a pair a
          // half-ulp across two cell boundaries could escape the 3×3
          // neighborhood. One ulp of slack keeps the rewrite exact.
          (x1, y1, x2, y2, Math.nextUp(math.sqrt(r2)))
      }
      if (radius.isEmpty || hasEquiKey(conjuncts, left, right)) j
      else {
        val (x1, y1, x2, y2, cell) = radius.get

        // Probe side: explode to the 3×3 cell neighborhood.
        val offsets = CreateArray(Seq(Literal(-1L), Literal(0L), Literal(1L)))
        val dx = AttributeReference("__graft_dx", LongType, nullable = false)()
        val dy = AttributeReference("__graft_dy", LongType, nullable = false)()
        val genDx = Generate(Explode(offsets), Nil, outer = false, None, Seq(dx), left)
        val genDy = Generate(Explode(offsets), Nil, outer = false, None, Seq(dy), genDx)
        val cellXL = Alias(Add(cellOf(x1, cell), dx), "__graft_cellx_l")()
        val cellYL = Alias(Add(cellOf(y1, cell), dy), "__graft_celly_l")()
        val projL = Project(left.output ++ Seq(cellXL, cellYL), genDy)

        // Build side: its single cell.
        val cellXR = Alias(cellOf(x2, cell), "__graft_cellx_r")()
        val cellYR = Alias(cellOf(y2, cell), "__graft_celly_r")()
        val projR = Project(right.output ++ Seq(cellXR, cellYR), right)

        val newCond = Seq(
          EqualTo(cellXL.toAttribute, cellXR.toAttribute),
          EqualTo(cellYL.toAttribute, cellYR.toAttribute)) ++ conjuncts
        val bucketed = Join(projL, projR, Inner,
          Some(newCond.reduce(And)), hint)
        // Restore the original schema.
        Project(left.output ++ right.output, bucketed)
      }
  }
}
