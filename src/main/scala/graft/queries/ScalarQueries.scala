package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._

/** SURVEY §2.8 scalar functions (F1-F18): concat with separator, slugify,
  * regexp normalize, packed-timestamp round-trips, date parts, casts,
  * stable hashes, WKT render, JSON access, status-pair pattern match,
  * note assembly.
  *
  * All pure Column compositions — the whole query stays in one
  * WholeStageCodegen span over the scan.
  */
object ScalarQueries extends QueryCatalog {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1+F3+F4+F5: concat_ws, upper/lower, slugify, whitespace collapse.
    "q_scalar_strings" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(
          col("p_partkey"),
          concat_ws(" ", col("p_brand"), col("p_name")).as("full_name"),
          upper(col("p_name")).as("name_upper"),
          slugify(col("p_name")).as("name_slug"),
          normalizeWs(concat(lit("  "), col("p_type"), lit("   x  ")))
            .as("type_norm"),
          length(col("p_name")).as("name_len"))
        .orderBy(col("p_partkey"))
    }),

    // F6: packed numeric timestamp 'yyyyMMddHHmmss' round-trip
    // (cam/tables/lf_address_history.py:38-39).
    "q_scalar_packed_ts" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") % 500 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          date_format(col("l_shipdate"), "yyyyMMddHHmmss").as("packed"))
        .withColumn("reparsed_ms", epochMs(packedTimestamp(col("packed"))))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // F7: date parts + month truncation (created.date() idiom).
    "q_scalar_date_parts" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          epochMs(date_trunc("month", col("o_orderdate"))).as("month_ms"))
        .orderBy(col("o_orderkey"))
    }),

    // Calendar ARITHMETIC (the q_scalar_date_parts sibling: producing
    // dates, not extracting fields): month-add with end-of-month
    // clamping (Jan 31 + 1m = Feb 29 in both engines), quarter
    // truncation, last-day-of-month, and day deltas vs a fixed epoch —
    // the fiscal-calendar toolkit of any reporting layer, all
    // scan-side codegen'd expressions. Dates cross the gate as strings
    // / day integers (the catalog's timestamp-free parity convention).
    "q_scalar_date_arith" -> ((s, dir) => {
      val d = to_date(col("o_orderdate"))
      Tables.orders(s, dir)
        .filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"),
          date_format(d, "yyyy-MM-dd").as("d_str"),
          date_format(add_months(d, 3), "yyyy-MM-dd").as("plus_3m"),
          date_format(date_trunc("quarter", col("o_orderdate")),
            "yyyy-MM-dd").as("quarter_start"),
          date_format(last_day(d), "yyyy-MM-dd").as("month_end"),
          datediff(d, lit("2024-01-01").cast("date")).as("days_since"))
        .orderBy(col("o_orderkey"))
    }),

    // F8: CAST text→int/float round-trips.
    "q_scalar_casts" -> ((s, dir) => {
      Tables.supplier(s, dir)
        .select(col("s_suppkey"),
          col("s_suppkey").cast("string").cast("long").as("key_roundtrip"),
          col("s_acctbal").cast("decimal(18,2)").cast("string").as("bal_str"),
          floor(col("s_acctbal")).cast("long").as("bal_floor"))
        .orderBy(col("s_suppkey"))
    }),

    // F10: stable md5 content hash (vs the reference's process-seeded
    // Python hash() bug — cam/etl/__init__.py:86).
    "q_scalar_hash_md5" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          md5(concat_ws("|", col("c_name"), col("c_mktsegment"))).as("row_hash"))
        .orderBy(col("c_custkey"))
    }),

    // F12: WKT point render from synthesized lon/lat (bounded 2-dp values
    // so double→string agrees across engines).
    "q_scalar_wkt" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          ((col("c_custkey") % 36000).cast("double") / 100.0 - 180.0).as("lon"),
          ((col("c_custkey") % 18000).cast("double") / 100.0 - 90.0).as("lat"))
        .select(col("c_custkey"),
          wktPoint(col("lon"), col("lat")).as("wkt"))
        .orderBy(col("c_custkey"))
    }),

    // F18: JSON field access over events.props.
    "q_scalar_json" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy((col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"))
        .orderBy(col("k_mod"))
    }),

    // F18b: TYPED json parse — `from_json` with an explicit schema parses
    // ONCE and projects many fields (per-path get_json_object re-parses
    // the document per field — the anti-pattern at 100 TB), and its
    // PERMISSIVE mode turns corrupt documents into null rows instead of
    // failed tasks. A deterministic slice of inputs is corrupted in-query
    // to prove that: parsed k survives, corrupt rows yield nulls, absent
    // fields project as null without error.
    "q_scalar_json_typed" -> ((s, dir) => {
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("k", IntegerType),
        StructField("absent", StringType)))
      Tables.events(s, dir)
        .filter(col("event_id") % 20 === 0)
        .select(col("event_id"),
          when(col("event_id") % 40 === 0, concat(lit("x"), col("props")))
            .otherwise(col("props")).as("p"))
        .select(col("event_id"), from_json(col("p"), schema).as("j"))
        .select(col("event_id"), col("j.k").as("k"),
          col("j.k").isNull.as("is_corrupt"),
          col("j.absent").isNull.as("absent_is_null"))
        .orderBy(col("event_id"))
    }),

    // F15: multi-way (status,currency)→concept pattern match
    // (etl_pndb.py:163-175) — mapped onto (orderstatus, priority-class).
    "q_scalar_status_map" -> ((s, dir) => {
      val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          when(col("o_orderstatus") === "F" && urgent, "closed-fast")
            .when(col("o_orderstatus") === "F" && !urgent, "closed-slow")
            .when(col("o_orderstatus") === "O" && urgent, "open-hot")
            .otherwise("other").as("concept"))
        .groupBy(col("concept")).agg(count(lit(1)).as("n"))
        .orderBy(col("concept"))
    }),

    // F9: deterministic uuid5 minting, checked against INDEPENDENT
    // vectors: the oracle's VALUES list was produced by CPython's
    // uuid.uuid5 (RFC 4122 §4.3 reference implementation), not by this
    // engine — a true cross-implementation golden test.
    "q_scalar_uuid5" -> ((s, dir) => {
      Tables.customer(s, dir)
        .filter(col("c_custkey").between(1, 20))
        .select(col("c_custkey"),
          uuid5(GraftNamespace, col("c_custkey").cast("string")).as("uuid"))
        .orderBy(col("c_custkey"))
    }),

    // F14: NUL-byte cleanup at ingest — a NUL is injected between brand
    // and name, lengths before/after prove the strip.
    "q_scalar_nul_cleanup" -> ((s, dir) => {
      Tables.part(s, dir)
        .select(col("p_partkey"),
          concat(col("p_brand"), lit("\u0000"), col("p_name")).as("dirty"))
        .select(col("p_partkey"),
          length(col("dirty")).as("len_dirty"),
          cleanNulBytes(col("dirty")).as("clean"))
        .withColumn("len_clean", length(col("clean")))
        .orderBy(col("p_partkey"))
    }),

    // F11: declarative IRI template interpolation.
    "q_scalar_iri_template" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          iriTemplate(
            "https://example.org/addr/{segment}/{key}",
            Map("segment" -> slugify(col("c_mktsegment")),
              "key" -> col("c_custkey").cast("string"))).as("iri"))
        .orderBy(col("c_custkey"))
    }),

    // F16: search-query token mangling for the prefix-search API.
    "q_scalar_search_mangle" -> ((s, dir) => {
      Tables.part(s, dir)
        .filter(col("p_partkey") % 20 === 0)
        .select(col("p_partkey"),
          searchMangle(concat_ws("/", col("p_brand"), col("p_type")))
            .as("query"))
        .orderBy(col("p_partkey"))
    }),

    // F17: history-note assembly — non-null parts joined by a separator
    // then trimmed (etl_pndb.py:249-261).
    "q_scalar_note_assembly" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey"),
          concat_ws("\n\n",
            nullif(col("c_name"), lit("")),
            nullif(col("c_mktsegment"), lit("BUILDING")),
            when(col("c_acctbal") > 0, lit("in credit"))).as("note"))
        .orderBy(col("c_custkey"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_scalar_strings" ->
      """SELECT p_partkey,
        |  concat_ws(' ', p_brand, p_name) AS full_name,
        |  upper(p_name) AS name_upper,
        |  regexp_replace(lower(trim(p_name)), '\s+', '-', 'g') AS name_slug,
        |  regexp_replace(trim('  ' || p_type || '   x  '), '\s+', ' ', 'g') AS type_norm,
        |  length(p_name) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_scalar_packed_ts" ->
      """SELECT l_orderkey, l_linenumber,
        |  strftime(l_shipdate, '%Y%m%d%H%M%S') AS packed,
        |  epoch_ms(strptime(strftime(l_shipdate, '%Y%m%d%H%M%S'), '%Y%m%d%H%M%S')) AS reparsed_ms
        |FROM lineitem WHERE l_orderkey % 500 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_scalar_date_parts" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS d,
        |  epoch_ms(date_trunc('month', o_orderdate)) AS month_ms
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_scalar_date_arith" ->
      """WITH d AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
        |  FROM orders WHERE o_orderkey % 97 = 0)
        |SELECT o_orderkey,
        |  strftime(d, '%Y-%m-%d') AS d_str,
        |  strftime(d + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
        |  strftime(date_trunc('quarter', d), '%Y-%m-%d') AS quarter_start,
        |  strftime(last_day(d), '%Y-%m-%d') AS month_end,
        |  CAST(date_diff('day', DATE '2024-01-01', d) AS INTEGER)
        |    AS days_since
        |FROM d ORDER BY o_orderkey""".stripMargin,
    "q_scalar_casts" ->
      """SELECT s_suppkey,
        |  CAST(CAST(s_suppkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
        |  CAST(CAST(s_acctbal AS DECIMAL(18,2)) AS VARCHAR) AS bal_str,
        |  CAST(floor(s_acctbal) AS BIGINT) AS bal_floor
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "q_scalar_hash_md5" ->
      """SELECT c_custkey, md5(c_name || '|' || c_mktsegment) AS row_hash
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_scalar_wkt" ->
      """SELECT c_custkey,
        |  'POINT (' || CAST(CAST(c_custkey % 36000 AS DOUBLE) / 100.0 - 180.0 AS VARCHAR)
        |  || ' ' || CAST(CAST(c_custkey % 18000 AS DOUBLE) / 100.0 - 90.0 AS VARCHAR) || ')' AS wkt
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_scalar_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum
        |FROM events GROUP BY k_mod ORDER BY k_mod""".stripMargin,

    "q_scalar_json_typed" ->
      """WITH p AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 40 = 0 THEN 'x' || props ELSE props END AS p
        |  FROM events WHERE event_id % 20 = 0)
        |SELECT event_id,
        |  CASE WHEN json_valid(p)
        |    THEN CAST(json_extract_string(p, '$.k') AS INTEGER) END AS k,
        |  NOT json_valid(p) AS is_corrupt,
        |  TRUE AS absent_is_null
        |FROM p ORDER BY event_id""".stripMargin,
    "q_scalar_status_map" ->
      """SELECT CASE
        |    WHEN o_orderstatus = 'F' AND o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'closed-fast'
        |    WHEN o_orderstatus = 'F' AND o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 'closed-slow'
        |    WHEN o_orderstatus = 'O' AND o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'open-hot'
        |    ELSE 'other' END AS concept,
        |  COUNT(*) AS n
        |FROM orders GROUP BY concept ORDER BY concept""".stripMargin,
    "q_scalar_uuid5" ->
      """SELECT c.c_custkey, v.uuid
        |FROM customer c
        |JOIN (VALUES
        |  (1, '675ff9c8-cb41-59fc-b4ee-effa05ba9ece'),
        |  (2, '9261fdb5-1cb8-52e4-b7a4-702e777cb3b8'),
        |  (3, 'b6d60816-695a-50e0-a027-443d1a2ca5be'),
        |  (4, '6a3e7c51-e03f-505d-aabd-b20f78fa360f'),
        |  (5, 'a928020f-d148-51b1-adf5-b19304f5e36f'),
        |  (6, '45ea4212-3a3d-5151-a46b-c1347973a780'),
        |  (7, '75385554-1bae-51ee-b7d4-eab68c6a7106'),
        |  (8, '846f8a14-e60f-5cd4-9a4d-82917d81ad4b'),
        |  (9, '9ba84ac7-87a8-5813-971a-6b046b6d9c55'),
        |  (10, '9ed28b70-64b1-5547-8c95-c5fdf81df67b'),
        |  (11, 'edd86c42-d11d-5275-85e2-03ccba2c3e0d'),
        |  (12, '919e9abf-2273-5b00-a3bc-6546a431f60a'),
        |  (13, '5e9f7481-9dac-516c-a0f0-076d8fd159f5'),
        |  (14, '8e230820-5239-5a81-af33-e28b0c3412d3'),
        |  (15, '3d30c800-5cd4-5b61-b8fb-b5fb379178f8'),
        |  (16, '5cb71346-2f0e-5fd8-96fd-63dfce1b8a5a'),
        |  (17, '1bc7b23b-565b-5206-b511-45b793b0974d'),
        |  (18, '53c33b5b-4fb0-53bb-a35c-6c5128ac431b'),
        |  (19, '7aa92e1d-1a1b-54f2-b7e7-db28f53d7f7e'),
        |  (20, '1d4b8266-71f6-5c22-98e1-b65b04bc71b8')) AS v(k, uuid)
        |  ON c.c_custkey = v.k
        |WHERE c.c_custkey BETWEEN 1 AND 20
        |ORDER BY c.c_custkey""".stripMargin,
    "q_scalar_nul_cleanup" ->
      """SELECT p_partkey,
        |  length(p_brand || chr(0) || p_name) AS len_dirty,
        |  replace(p_brand || chr(0) || p_name, chr(0), '') AS clean,
        |  length(replace(p_brand || chr(0) || p_name, chr(0), '')) AS len_clean
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_scalar_iri_template" ->
      """SELECT c_custkey,
        |  'https://example.org/addr/' ||
        |  regexp_replace(lower(trim(c_mktsegment)), '\s+', '-', 'g') ||
        |  '/' || CAST(c_custkey AS VARCHAR) AS iri
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_scalar_search_mangle" ->
      """SELECT p_partkey,
        |  regexp_replace(trim(translate(p_brand || '/' || p_type, '-/', '  ')),
        |    '\s+', ' ', 'g') || '*' AS query
        |FROM part WHERE p_partkey % 20 = 0 ORDER BY p_partkey""".stripMargin,
    "q_scalar_note_assembly" ->
      """SELECT c_custkey,
        |  concat_ws(chr(10) || chr(10),
        |    NULLIF(c_name, ''),
        |    NULLIF(c_mktsegment, 'BUILDING'),
        |    CASE WHEN c_acctbal > 0 THEN 'in credit' END) AS note
        |FROM customer ORDER BY c_custkey""".stripMargin
  )
}
