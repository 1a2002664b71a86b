package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** SURVEY §2.7 set operations (U1-U4): UNION ALL of branch projections
  * (recursive CTE body, etl-notes.md:673), directory-glob graph merge (U2),
  * EXCEPT-style gap checks (U3, etl-queries.md:21-26), set difference of
  * label sets (U4, placenames_compare.py:27-36).
  */
object SetOpQueries extends QueryCatalog {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // U1/U2: UNION ALL across heterogeneous sources, tagged by origin.
    "q_set_union_all" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
        .select(col("c_name").as("name"), lit("customer").as("src"))
      val p = Tables.supplier(s, dir)
        .select(col("s_name").as("name"), lit("supplier").as("src"))
      c.unionByName(p)
        .groupBy(col("src"))
        .agg(count(lit(1)).as("n"), countDistinct(col("name")).as("n_distinct"))
        .orderBy(col("src"))
    }),

    // U3/U4: EXCEPT (distinct semantics) — keys present on one side only.
    "q_set_except" -> ((s, dir) => {
      val allCust = Tables.customer(s, dir).select(col("c_custkey").as("custkey"))
      val fCust = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select(col("o_custkey").as("custkey"))
      allCust.except(fCust).orderBy(col("custkey"))
    }),

    // INTERSECT (distinct) — keys present on both sides.
    "q_set_intersect" -> ((s, dir) => {
      val fOrders = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      val pOrders = Tables.orders(s, dir)
        .filter(col("o_orderstatus") === "P").select(col("o_custkey"))
      fOrders.intersect(pOrders).orderBy(col("o_custkey"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_set_union_all" ->
      """SELECT src, COUNT(*) AS n, COUNT(DISTINCT name) AS n_distinct
        |FROM (
        |  SELECT c_name AS name, 'customer' AS src FROM customer
        |  UNION ALL
        |  SELECT s_name AS name, 'supplier' AS src FROM supplier)
        |GROUP BY src ORDER BY src""".stripMargin,
    "q_set_except" ->
      """SELECT c_custkey AS custkey FROM customer
        |EXCEPT
        |SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
        |ORDER BY custkey""".stripMargin,
    "q_set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin
  )
}
