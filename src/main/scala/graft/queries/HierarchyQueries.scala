package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

import graft.operators.Checkpoints.CutOps

/** SURVEY §2.3 J12 — recursive/iterative hierarchy traversal. The
  * reference walks site parent chains with a recursive CTE
  * (`etl-notes.md:663-692`) and place-name history depth-first
  * (`etl-notes.md:770`). Spark has no recursive CTE; the idiomatic
  * equivalent is the iterate-union loop: join the frontier to the edge
  * table until it empties, `localCheckpoint` every round to cut lineage
  * (without it the plan doubles per level and the optimizer re-walks the
  * whole history each iteration — the 100 TB failure mode).
  *
  * The edge table is a synthesized binary forest over `customer`
  * (parent(k) = k div 2), giving log₂(N) levels — the driver-side loop
  * count is bounded by tree DEPTH, never by row count.
  */
object HierarchyQueries extends QueryCatalog {

  private def traverse(s: SparkSession, dir: String): DataFrame = {
    val nodes = Tables.customer(s, dir)
      .select(col("c_custkey").as("node"),
        expr("c_custkey div 2").as("parent"))
    val children = nodes.filter(col("node") > 1)
    var acc = nodes.filter(col("node") <= 1)
      .select(col("node"), lit(0).as("level"),
        concat(lit("/"), col("node").cast("string")).as("path"))
    var frontier = acc.cutLineage()
    var levelCount = frontier.count()
    while (levelCount > 0) {
      val next = frontier.as("f")
        .join(children.as("c"), col("c.parent") === col("f.node"))
        .select(col("c.node").as("node"),
          (col("f.level") + 1).as("level"),
          concat(col("f.path"), lit("/"), col("c.node").cast("string"))
            .as("path"))
        .cutLineage()
      levelCount = next.count()
      if (levelCount > 0) acc = acc.unionByName(next)
      frontier = next
    }
    acc
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full traversal: every node with its depth and root path — the
    // "site parent chain" shape (level + path, etl-notes.md:663-692).
    "q_recursive_hierarchy" -> ((s, dir) =>
      traverse(s, dir).orderBy(col("node"))),

    // Aggregate twin: nodes per level (the validation-count view of the
    // same traversal).
    "q_recursive_levels" -> ((s, dir) =>
      traverse(s, dir)
        .groupBy(col("level"))
        .agg(count(lit(1)).as("n"),
          min(col("node")).as("min_node"),
          max(col("node")).as("max_node"))
        .orderBy(col("level")))
  )

  private val recursiveCte =
    """WITH RECURSIVE r AS (
      |  SELECT c_custkey AS node, 0 AS level,
      |    '/' || CAST(c_custkey AS VARCHAR) AS path
      |  FROM customer WHERE c_custkey <= 1
      |  UNION ALL
      |  SELECT c.c_custkey, r.level + 1,
      |    r.path || '/' || CAST(c.c_custkey AS VARCHAR)
      |  FROM customer c JOIN r ON (c.c_custkey // 2) = r.node
      |  WHERE c.c_custkey > 1)""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "q_recursive_hierarchy" ->
      s"""$recursiveCte
         |SELECT node, level, path FROM r ORDER BY node""".stripMargin,
    "q_recursive_levels" ->
      s"""$recursiveCte
         |SELECT level, COUNT(*) AS n, MIN(node) AS min_node,
         |  MAX(node) AS max_node
         |FROM r GROUP BY level ORDER BY level""".stripMargin
  )
}
