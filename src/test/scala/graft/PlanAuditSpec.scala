package graft
import org.scalatest.funsuite.AnyFunSuite
class PlanAuditSpec extends AnyFunSuite with SparkTestBase {
  test("knn plan audit") {
    val df = SparkEntry.queries("q_join_knn")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    println("=== KNN PLAN ===")
    println(plan.linesIterator.filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("Window") || l.contains("Scan")).mkString("\n"))
    assert(!plan.contains("CartesianProduct"), "cross join in KNN plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "nested loop join in KNN plan")
  }
}
