package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._
import graft.operators.Merge

/** MERGE / upsert over the customer dimension — the engine twin of the
  * reference's JDBC write-back loop (SURVEY §2.1 S12,
  * `etl_lalf_road_qrt_spatial_match.py:115-138`) re-expressed as one
  * co-partitioned full-outer join (see [[graft.operators.Merge]]).
  *
  * The delta batch is derived deterministically from the same table so the
  * DuckDB oracle can replay it: every 7th customer gets a balance update,
  * every 1000th spawns a brand-new key (insert), every 997th is deleted.
  */
object MergeQueries extends QueryCatalog {

  private def target(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_custkey").as("key"),
      col("c_name").as("name"), dec2(col("c_acctbal")).as("bal"))

  private def source(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(s, dir)
    val updates = c.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        dec2(dec2(col("c_acctbal")) + lit(100)).as("bal"),
        lit(false).as("del"))
    val inserts = c.filter(col("c_custkey") % 1000 === 0)
      .select((col("c_custkey") + 10000000L).as("key"),
        concat(lit("NEW "), col("c_name")).as("name"),
        dec2(lit(0)).as("bal"), lit(false).as("del"))
    // % 7 exclusion keeps the branches key-disjoint at every SF (keys
    // divisible by both 7 and 997 would otherwise emit two source rows
    // for one merge key — MERGE requires unique source keys).
    val deletes = c.filter(col("c_custkey") % 997 === 0 &&
        col("c_custkey") % 7 =!= 0)
      .select(col("c_custkey").as("key"), col("c_name").as("name"),
        dec2(col("c_acctbal")).as("bal"), lit(true).as("del"))
    updates.unionByName(inserts).unionByName(deletes)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full MERGE INTO: update + insert + keep + delete in one pass; the
    // output is the complete next target version plus the action audit
    // column. One key shuffle per side — no row-at-a-time writes.
    "q_merge_upsert" -> ((s, dir) => {
      Merge.upsert(target(s, dir), source(s, dir), "key",
          deleteFlag = Some("del"))
        .select(col("key"), col("name"), asMoney(col("bal")).as("bal"),
          col("action"))
        .orderBy(col("key"))
    }),

    // Merge audit rollup: action counts + moved money — the count-parity
    // check a production merge job would gate on (SURVEY §5.3 style).
    "q_merge_audit" -> ((s, dir) => {
      Merge.upsert(target(s, dir), source(s, dir), "key",
          deleteFlag = Some("del"))
        .groupBy(col("action"))
        .agg(count(lit(1)).as("n"), asMoney(sum(col("bal"))).as("bal_sum"))
        .orderBy(col("action"))
    }),

    // Snapshot diff (operators/Diff — the inverse of the merge): old
    // version vs the POST-merge state recovers the change feed — insert /
    // delete / update / same per key with old/new values. The CDC shape
    // for full-dump sources: one co-partitioned full-outer join instead
    // of re-processing the dump downstream.
    "q_snapshot_diff" -> ((s, dir) => {
      val newState = Merge.upsert(target(s, dir), source(s, dir), "key",
        deleteFlag = Some("del")).select(col("key"), col("name"), col("bal"))
      graft.operators.Diff
        .snapshotDiff(target(s, dir), newState, "key", Seq("name", "bal"))
        .select(col("key"), col("action"),
          col("old_name"), col("new_name"),
          col("old_bal").cast("double").as("old_bal"),
          col("new_bal").cast("double").as("new_bal"))
        .orderBy(col("key"))
    }),

    // SCD Type-2 history build over the order-status change stream
    // (operators/Scd2): run-compressed status versions per customer with
    // [valid_from, valid_to) epoch-ms intervals and the current flag —
    // the time-travel complement of Merge's "current state only" upsert.
    "q_scd2_history" -> ((s, dir) => {
      val src = graft.Tables.orders(s, dir).select(col("o_custkey"),
        col("o_orderkey"), col("o_orderstatus"),
        // o_orderdate is TIMESTAMP_NTZ; the UTC session tz (Verify/Bench
        // builders) makes the cast epoch-exact, matching DuckDB epoch_ms
        unix_millis(col("o_orderdate").cast("timestamp")).as("ms"))
      graft.operators.Scd2.buildHistory(src, col("o_custkey"), col("ms"),
          col("o_orderkey"), col("o_orderstatus"))
        .select(col("key").as("o_custkey"), col("version"),
          col("attr_value").as("status"),
          col("valid_from"), col("valid_to"), col("is_current"))
        .orderBy(col("o_custkey"), col("version"))
    }),

    // Point-in-time lookup against the SCD2 history — the feature-store
    // join that answers "what was this user's status WHEN the event
    // happened" without leaking later versions (training-serving skew
    // guard). The interval probe is NOT an inequality θ-join: version
    // validity [from, to) makes "latest valid_from ≤ ts" sufficient, so
    // it rides operators/AsOfJoin — one key shuffle, merge-sorted, linear
    // per key. The oracle replays it with DuckDB's NATIVE ASOF LEFT JOIN
    // — an independent implementation of the semantics.
    "q_scd2_pit" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val changes = ev
        .filter(col("event_type").isin("signup", "purchase", "error"))
        .select(col("user_id"), col("event_id"),
          col("event_type").as("status"), epochMs(col("ts")).as("ms"))
      val hist = graft.operators.Scd2.buildHistory(changes, col("user_id"),
          col("ms"), col("event_id"), col("status"))
        .select(col("key").as("user_id"), col("valid_from").as("ms"),
          col("attr_value").as("status_at"), col("version"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"),
          epochMs(col("ts")).as("ms"))
      graft.operators.AsOfJoin.asOf(clicks, hist, "user_id", "ms")
        .select(col("event_id"), col("user_id"), col("ms").as("click_ms"),
          col("status_at"), col("version"))
        .orderBy(col("event_id"))
    }),

    // Replica reconciliation by bucket digests (the Merkle-tree idea,
    // one level deep, fully relational): before shipping ANY rows, the
    // source and the drifted replica each reduce to 256 md5-keyed
    // bucket summaries — order-independent BIGINT sums of per-row
    // digests — and one full-outer compare localizes every divergence
    // to its bucket. That turns a 100 TB "are these in sync?" question
    // into shuffling 256 rows per side; only dirty buckets ever need a
    // row-level q_snapshot_diff. Drift is injected deterministically
    // (delete %1000=7, reprice %997=13) so the oracle replays both
    // replicas exactly.
    "q_sync_bucket_digest" -> ((s, dir) => {
      def digest(df: DataFrame): DataFrame = df
        .select(substring(md5(col("key").cast("string")), 1, 2)
            .as("bucket"),
          conv(substring(md5(concat_ws("|",
            col("key").cast("string"), col("price").cast("string"),
            col("status"))), 1, 8), 16, 10).cast("long").as("rd"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("cnt"), sum(col("rd")).as("dig"))
      val src = Tables.orders(s, dir).select(
        col("o_orderkey").as("key"),
        col("o_totalprice").as("price"), col("o_orderstatus").as("status"))
      val dst = src.filter(col("key") % 1000 =!= 7)
        .select(col("key"),
          when(col("key") % 997 === 13, col("price") + 1)
            .otherwise(col("price")).as("price"), col("status"))
      digest(src).as("s")
        .join(digest(dst).as("d"), Seq("bucket"), "full_outer")
        .filter(coalesce(col("s.dig"), lit(-1)) =!=
            coalesce(col("d.dig"), lit(-1)) ||
          coalesce(col("s.cnt"), lit(-1)) =!=
            coalesce(col("d.cnt"), lit(-1)))
        .select(col("bucket"),
          col("s.cnt").as("src_cnt"), col("d.cnt").as("dst_cnt"),
          col("s.dig").as("src_dig"), col("d.dig").as("dst_dig"))
        .orderBy(col("bucket"))
    }),

    // CDC applied across SUCCESSIVE batches: two change waves merge
    // sequentially into the target (update → update-again + delete), and
    // the oracle computes the final state directly with last-writer-wins
    // CASE logic — proving batch-at-a-time MERGE convergence, the batch
    // twin of StreamingSpec's foreachBatch CDC-apply loop. Each wave is
    // one co-partitioned full-outer join; N waves cost N joins, never a
    // history rescan.
    "q_merge_cdc_batches" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val target = c.select(col("c_custkey").as("key"),
        col("c_acctbal").cast("decimal(18,2)").as("bal"))
      val b1 = c.filter(col("c_custkey") % 5 === 0)
        .select(col("c_custkey").as("key"),
          (col("c_acctbal").cast("decimal(18,2)") + 100)
            .cast("decimal(18,2)").as("bal"),
          lit(false).as("del"))
      val b2 = c.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey").as("key"),
          (col("c_acctbal").cast("decimal(18,2)") + 200)
            .cast("decimal(18,2)").as("bal"),
          (col("c_custkey") % 500 === 0).as("del"))
      val m1 = Merge.upsert(target, b1, "key", deleteFlag = Some("del"))
        .drop("action")
      Merge.upsert(m1, b2, "key", deleteFlag = Some("del"))
        .drop("action")
        .filter(col("key") % 5 === 0)
        .select(col("key"), col("bal").cast("double").as("bal"))
        .orderBy(col("key"))
    })
  )

  // The delete-filtered update wins over the same key's delete row only via
  // the flag — in SQL the three branches are reconstructed with a FULL
  // OUTER JOIN against the union'd delta, exactly as the operator plans it.
  private val deltaSql =
    """SELECT c_custkey AS key, c_name AS name,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100 AS DECIMAL(18,2)) AS bal,
      |    FALSE AS del
      |  FROM customer WHERE c_custkey % 7 = 0
      |UNION ALL
      |SELECT c_custkey + 10000000, 'NEW ' || c_name,
      |    CAST(0 AS DECIMAL(18,2)), FALSE
      |  FROM customer WHERE c_custkey % 1000 = 0
      |UNION ALL
      |SELECT c_custkey, c_name, CAST(c_acctbal AS DECIMAL(18,2)), TRUE
      |  FROM customer WHERE c_custkey % 997 = 0 AND c_custkey % 7 <> 0""".stripMargin

  private val mergedSql =
    s"""WITH tgt AS (
       |  SELECT c_custkey AS key, c_name AS name,
       |    CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer),
       |src AS (
       |  $deltaSql),
       |m AS (
       |  SELECT COALESCE(s.key, t.key) AS key,
       |    CASE WHEN s.key IS NOT NULL THEN s.name ELSE t.name END AS name,
       |    CASE WHEN s.key IS NOT NULL THEN s.bal ELSE t.bal END AS bal,
       |    CASE WHEN t.key IS NULL THEN 'insert'
       |         WHEN s.key IS NULL THEN 'keep'
       |         ELSE 'update' END AS action
       |  FROM tgt t FULL OUTER JOIN src s ON t.key = s.key
       |  WHERE NOT (t.key IS NOT NULL AND s.key IS NOT NULL
       |             AND COALESCE(s.del, FALSE)))""".stripMargin

  override def oracleSql: Map[String, String] = Map(
    "q_merge_upsert" ->
      s"""$mergedSql
         |SELECT key, name, CAST(bal AS DOUBLE) AS bal, action
         |FROM m ORDER BY key""".stripMargin,
    "q_merge_audit" ->
      s"""$mergedSql
         |SELECT action, COUNT(*) AS n, CAST(SUM(bal) AS DOUBLE) AS bal_sum
         |FROM m GROUP BY action ORDER BY action""".stripMargin,
    "q_snapshot_diff" ->
      s"""$mergedSql
         |SELECT COALESCE(o.key, m.key) AS key,
         |  CASE WHEN o.key IS NULL THEN 'insert'
         |       WHEN m.key IS NULL THEN 'delete'
         |       WHEN o.name IS DISTINCT FROM m.name
         |         OR o.bal IS DISTINCT FROM m.bal THEN 'update'
         |       ELSE 'same' END AS action,
         |  o.name AS old_name, m.name AS new_name,
         |  CAST(o.bal AS DOUBLE) AS old_bal, CAST(m.bal AS DOUBLE) AS new_bal
         |FROM (SELECT c_custkey AS key, c_name AS name,
         |        CAST(c_acctbal AS DECIMAL(18,2)) AS bal FROM customer) o
         |FULL OUTER JOIN (SELECT key, name, bal FROM m) m ON o.key = m.key
         |ORDER BY key""".stripMargin,
    "q_scd2_history" ->
      """WITH src AS (
        |  SELECT o_custkey, o_orderkey, o_orderstatus,
        |    epoch_ms(o_orderdate) AS ms
        |  FROM orders),
        |runs AS (
        |  SELECT *, lag(o_orderstatus) OVER
        |    (PARTITION BY o_custkey ORDER BY ms, o_orderkey) AS prev
        |  FROM src),
        |ch AS (
        |  SELECT * FROM runs WHERE prev IS NULL OR prev <> o_orderstatus)
        |SELECT o_custkey, CAST(row_number() OVER w AS INT) AS version,
        |  o_orderstatus AS status, ms AS valid_from,
        |  lead(ms) OVER w AS valid_to,
        |  (lead(ms) OVER w IS NULL) AS is_current
        |FROM ch
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY ms, o_orderkey)
        |ORDER BY o_custkey, version""".stripMargin,

    "q_scd2_pit" ->
      """WITH src AS (
        |  SELECT user_id, event_id, event_type AS status, epoch_ms(ts) AS ms
        |  FROM events WHERE event_type IN ('signup', 'purchase', 'error')),
        |runs AS (
        |  SELECT *, lag(status) OVER
        |    (PARTITION BY user_id ORDER BY ms, event_id) AS prev
        |  FROM src),
        |ch AS (SELECT * FROM runs WHERE prev IS NULL OR prev <> status),
        |hist AS (
        |  SELECT user_id, ms, status AS status_at,
        |    CAST(row_number() OVER
        |      (PARTITION BY user_id ORDER BY ms, event_id) AS INT) AS version
        |  FROM ch),
        |clicks AS (
        |  SELECT event_id, user_id, epoch_ms(ts) AS ms
        |  FROM events WHERE event_type = 'click')
        |SELECT c.event_id, c.user_id, c.ms AS click_ms,
        |       h.status_at, h.version
        |FROM clicks c ASOF LEFT JOIN hist h
        |  ON c.user_id = h.user_id AND c.ms >= h.ms
        |ORDER BY c.event_id""".stripMargin,

    "q_sync_bucket_digest" ->
      """WITH src AS (
        |  SELECT o_orderkey AS key, o_totalprice AS price,
        |    o_orderstatus AS status FROM orders),
        |dst AS (
        |  SELECT key,
        |    CASE WHEN key % 997 = 13 THEN price + 1 ELSE price END
        |      AS price,
        |    status
        |  FROM src WHERE key % 1000 <> 7),
        |ds AS (
        |  SELECT substring(md5(CAST(key AS VARCHAR)), 1, 2) AS bucket,
        |    COUNT(*) AS cnt,
        |    SUM(('0x' || substring(md5(CAST(key AS VARCHAR) || '|' ||
        |      CAST(price AS VARCHAR) || '|' || status), 1, 8))::BIGINT)
        |      AS dig
        |  FROM src GROUP BY bucket),
        |dd AS (
        |  SELECT substring(md5(CAST(key AS VARCHAR)), 1, 2) AS bucket,
        |    COUNT(*) AS cnt,
        |    SUM(('0x' || substring(md5(CAST(key AS VARCHAR) || '|' ||
        |      CAST(price AS VARCHAR) || '|' || status), 1, 8))::BIGINT)
        |      AS dig
        |  FROM dst GROUP BY bucket)
        |SELECT COALESCE(ds.bucket, dd.bucket) AS bucket,
        |  ds.cnt AS src_cnt, dd.cnt AS dst_cnt,
        |  CAST(ds.dig AS BIGINT) AS src_dig,
        |  CAST(dd.dig AS BIGINT) AS dst_dig
        |FROM ds FULL OUTER JOIN dd ON ds.bucket = dd.bucket
        |WHERE COALESCE(ds.dig, -1) <> COALESCE(dd.dig, -1)
        |   OR COALESCE(ds.cnt, -1) <> COALESCE(dd.cnt, -1)
        |ORDER BY bucket""".stripMargin,

    "q_merge_cdc_batches" ->
      """SELECT key, CAST(bal AS DOUBLE) AS bal FROM (
        |  SELECT c_custkey AS key,
        |    CASE WHEN c_custkey % 10 = 0
        |           THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 200
        |                AS DECIMAL(18,2))
        |         WHEN c_custkey % 5 = 0
        |           THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100
        |                AS DECIMAL(18,2))
        |         ELSE CAST(c_acctbal AS DECIMAL(18,2)) END AS bal
        |  FROM customer
        |  WHERE NOT (c_custkey % 500 = 0))
        |WHERE key % 5 = 0 ORDER BY key""".stripMargin
  )
}
