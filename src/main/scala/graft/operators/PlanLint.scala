package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}

/** Plan linter — the pre-flight check a job runs BEFORE committing a
  * 100 TB cluster to a query: walk the OPTIMIZED logical plan and flag
  * the shapes that are fine at demo scale and catastrophic at fleet
  * scale. The same rules PlanAuditSpec asserts test-side, exposed as a
  * library verb so pipelines can gate on them at runtime (fail the
  * submit, not the cluster).
  *
  * Rules:
  *  - `cross-join`    — a Join with no condition (CartesianProduct /
  *                      BroadcastNestedLoopJoin at execution: O(N·M)).
  *  - `global-window` — a Window with an empty partitionSpec: Catalyst
  *                      funnels EVERY row through one task (the
  *                      GlobalRank operator is the fix).
  *  - `global-sort`   — a top-level Sort with `global = true` that is
  *                      not absorbed into a limit: a full range-exchange
  *                      of the relation. Informational severity — often
  *                      intended (ordered output), always worth seeing.
  *
  * Inspection happens on the optimized plan so rules fire on what will
  * actually run (e.g. a Sort under a Limit becomes TakeOrdered and is
  * NOT flagged).
  */
object PlanLint {

  final case class Finding(rule: String, severity: String, node: String)

  def lint(df: DataFrame): Seq[Finding] = {
    val plan = df.queryExecution.optimizedPlan
    // Sort directly under a GlobalLimit/LocalLimit compiles to
    // TakeOrderedAndProject — collect those Sorts to exempt them.
    val absorbedSorts = plan.collect {
      case l: logical.GlobalLimit => l.collectFirst {
        case s: logical.Sort if s.global => s
      }
    }.flatten.toSet
    plan.collect {
      case j: logical.Join
          if j.condition.isEmpty &&
            (j.joinType == Inner || j.joinType == Cross) =>
        Finding("cross-join", "error", j.simpleString(60))
      case w: logical.Window if w.partitionSpec.isEmpty =>
        Finding("global-window", "error", w.simpleString(60))
      case s: logical.Sort if s.global && !absorbedSorts.contains(s) =>
        Finding("global-sort", "info", s.simpleString(60))
    }
  }

  /** Fail-fast gate: throw if any `error`-severity rule fires. */
  def assertScaleSafe(df: DataFrame): Unit = {
    val errs = lint(df).filter(_.severity == "error")
    require(errs.isEmpty,
      "plan has scale killers:\n" +
        errs.map(f => s"  [${f.rule}] ${f.node}").mkString("\n"))
  }
}
