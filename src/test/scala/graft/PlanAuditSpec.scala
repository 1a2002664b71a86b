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

  test("facet-partitioned read prunes partitions") {
    val df = SparkEntry.queries("q_facet_partitioned")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      "lang filter did not reach PartitionFilters:\n" + plan)
  }

  test("sketch expressions are not duplicated into pushed-down filters") {
    // Join-inferred isnotnull(key) constraints must fold away (the keys
    // are coalesce-wrapped): if they push below the exchange they inline
    // the sketch expression with split(text) substituted per reference —
    // a 100M-regex single-task stage at sf0.1.
    for (q <- Seq("q_dedup_simhash", "q_dedup_minhash", "q_dedup_ngram_jaccard",
        "q_ann_lsh_topk", "q_dedup_embedding")) {
      val opt = SparkEntry.queries(q)(spark, sf)
        .queryExecution.optimizedPlan.toString
      val badFilters = opt.linesIterator
        .filter(l => l.contains("Filter") && l.contains("lambdafunction"))
        .toSeq
      assert(badFilters.isEmpty,
        s"$q: sketch lambda inlined into a Filter (constraint pushdown):\n" +
          badFilters.map(_.take(200)).mkString("\n"))
    }
  }

  test("dedup candidate generation has no cartesian joins") {
    for (q <- Seq("q_dedup_minhash", "q_dedup_simhash", "q_dedup_ngram_jaccard",
        "q_ann_lsh_topk", "q_dedup_embedding")) {
      val plan = SparkEntry.queries(q)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"cross join in $q")
    }
  }
}
