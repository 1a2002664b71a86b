package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._

/** SURVEY §2.2 projections / filters / predicates (P1-P9).
  * Mirrors: alias projections (etl_lalf_address.py:728), the `!= 'H'`
  * non-historical filter (P2), IN/NOT IN literal lists
  * (etl_lalf_parcel.py:135), compound boolean filters (etl_pndb.py:461-464),
  * NULL predicates (P5), the lot-9999 CASE (etl_lalf_parcel.py:133-140),
  * NULLIF/COALESCE chains (P7), LIKE/ILIKE (P9).
  *
  * Scale: every one of these predicates reaches the Parquet scan as a
  * pushed filter + pruned column set (`PushedFilters`/`ReadSchema` in
  * explain) — nothing is evaluated post-shuffle.
  */
object FilterQueries extends QueryCatalog {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // P1+P2: projection with aliasing + inequality filter, pushed down.
    "q_filter_project_alias" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter(col("o_orderstatus") =!= "O") // the != 'H' idiom
        .select(col("o_orderkey").as("order_id"),
          col("o_custkey").as("cust_id"),
          asMoney(dec2(col("o_totalprice"))).as("price"))
        .orderBy(col("order_id"))
    }),

    // P3: IN / NOT IN literal lists (plan_no NOT IN (...) idiom).
    "q_filter_in_notin" -> ((s, dir) => {
      Tables.part(s, dir)
        .filter(col("p_type").isin("ECONOMY", "PROMO") &&
          !col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
        .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"))
        .orderBy(col("p_partkey"))
    }),

    // P4: compound boolean — ((a AND (b OR c)) OR NOT a) shape of
    // etl_pndb.py:461-464.
    "q_filter_compound" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter((col("o_orderstatus") === "F" &&
          (col("o_orderpriority") === "1-URGENT" || col("o_totalprice") > 200000))
          || col("o_orderstatus") === "P")
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
    }),

    // P5: NULL predicates over a genuinely nullable column (built via
    // NULLIF, the qrt_found-is-null idiom).
    "q_filter_null_pred" -> ((s, dir) => {
      Tables.orders(s, dir)
        .withColumn("maybe", nullif(col("o_orderstatus"), lit("O")))
        .filter(col("maybe").isNull)
        .agg(count(lit(1)).as("n_null"))
    }),

    // P6: CASE WHEN — the lot-9999→'0' rule with an exception list
    // (etl_lalf_parcel.py:133-140): quantity 50 maps to 0 unless the
    // returnflag is in the exception list.
    "q_filter_case_when" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .withColumn("qty_fixed",
          when(col("l_quantity") === 50.0 && !col("l_returnflag").isin("R"),
            lit(0.0)).otherwise(col("l_quantity")))
        .groupBy(col("l_returnflag"))
        .agg(asMoney(sum(dec2(col("qty_fixed")))).as("sum_fixed"),
          count(when(col("qty_fixed") === 0.0, 1)).as("n_zeroed"))
        .orderBy(col("l_returnflag"))
    }),

    // P7: NULLIF + COALESCE fallback chain (road_suffix / gazetted_date
    // idioms, cam/tables/qrt.py:35, etl_pndb_localities.py:104-123).
    "q_filter_nullif_coalesce" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          coalesce(nullif(col("c_mktsegment"), lit("HOUSEHOLD")),
            concat(lit("fallback-"), col("c_nationkey").cast("string")))
            .as("segment_resolved"))
        .orderBy(col("c_custkey"))
    }),

    // P9: LIKE + ILIKE (pl_name ILIKE ..., etl-notes.md:468).
    "q_filter_like" -> ((s, dir) => {
      Tables.part(s, dir)
        .filter(col("p_name").like("%widget%") ||
          col("p_name").ilike("LARGE%"))
        .select(col("p_partkey"), col("p_name"))
        .orderBy(col("p_partkey"))
    }),

    // Regex predicate (rlike / regexp_matches) — the pattern class LIKE
    // can't express; stays a scan-side filter (one compiled-regex pass
    // per row inside codegen, no shuffle).
    "q_filter_rlike" -> ((s, dir) => {
      Tables.customer(s, dir)
        .filter(col("c_name").rlike("(00|77)$"))
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // P8: truthiness guard — blank-stripped optional component counting.
    "q_filter_truthiness" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("head", substring(col("text"), 1, 20))
        .filter(length(trim(col("head"))) > 0)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_nonblank"))
        .orderBy(col("lang"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_filter_project_alias" ->
      """SELECT o_orderkey AS order_id, o_custkey AS cust_id,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders WHERE o_orderstatus <> 'O' ORDER BY order_id""".stripMargin,
    "q_filter_in_notin" ->
      """SELECT p_partkey, p_name, p_brand, p_type FROM part
        |WHERE p_type IN ('ECONOMY','PROMO')
        |  AND p_brand NOT IN ('Brand#1','Brand#2','Brand#3')
        |ORDER BY p_partkey""".stripMargin,
    "q_filter_compound" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        |WHERE (o_orderstatus = 'F'
        |       AND (o_orderpriority = '1-URGENT' OR o_totalprice > 200000))
        |   OR o_orderstatus = 'P'
        |ORDER BY o_orderkey""".stripMargin,
    "q_filter_null_pred" ->
      """SELECT COUNT(*) AS n_null FROM orders
        |WHERE NULLIF(o_orderstatus, 'O') IS NULL""".stripMargin,
    "q_filter_case_when" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(CASE WHEN l_quantity = 50.0 AND l_returnflag NOT IN ('R')
        |    THEN 0.0 ELSE l_quantity END AS DECIMAL(18,2))) AS DOUBLE) AS sum_fixed,
        |  COUNT(CASE WHEN (CASE WHEN l_quantity = 50.0 AND l_returnflag NOT IN ('R')
        |    THEN 0.0 ELSE l_quantity END) = 0.0 THEN 1 END) AS n_zeroed
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_filter_nullif_coalesce" ->
      """SELECT c_custkey,
        |  COALESCE(NULLIF(c_mktsegment, 'HOUSEHOLD'),
        |    'fallback-' || CAST(c_nationkey AS VARCHAR)) AS segment_resolved
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_filter_like" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE p_name LIKE '%widget%' OR p_name ILIKE 'LARGE%'
        |ORDER BY p_partkey""".stripMargin,
    "q_filter_rlike" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE regexp_matches(c_name, '(00|77)$')
        |ORDER BY c_custkey""".stripMargin,
    "q_filter_truthiness" ->
      """SELECT lang, COUNT(*) AS n_nonblank FROM documents
        |WHERE length(trim(substring(text, 1, 20))) > 0
        |GROUP BY lang ORDER BY lang""".stripMargin
  )
}
