package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._

/** SURVEY §2.5 windows (W1-W5) + §2.6 sorts/limits (O1-O5).
  * Mirrors the address-history sessionization
  * (cam/tables/lf_address_history.py:50-169): ordered partition iteration,
  * lag (prov:wasInformedBy), last-row current flag, lead-as-end-time; and
  * the KNN top-k-per-group rank (etl_lalf_road_qrt_spatial_match.py:70-87).
  *
  * Every window ORDER BY carries a unique tiebreaker so ranks are total —
  * the cross-engine determinism rule.
  */
object WindowQueries extends QueryCatalog {

  private def byLine = Window.partitionBy(col("l_orderkey"))
    .orderBy(col("l_linenumber"))

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // W1+W2+W4: ordered history per key with lag (previous version) and
    // lead (next modified = this stage's end time).
    "q_window_lag_lead" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"),
          lag(col("l_quantity"), 1).over(byLine).as("prev_qty"),
          lead(col("l_quantity"), 1).over(byLine).as("next_qty"),
          epochMs(lead(col("l_shipdate"), 1).over(byLine)).as("end_ms"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // W3: last-row flag — is_current = (version == max version in group)
    // (cam/tables/lf_address_history.py:86,114-117).
    "q_window_current_flag" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber").desc)
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") % 100 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          (row_number().over(w) === 1).as("is_current"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // W5: top-k per group by score with total tiebreak — the nearest-100
    // pattern (distance → here price).
    "q_window_topk_per_group" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"),
          asMoney(dec2(col("o_totalprice"))).as("price"),
          row_number().over(w).as("rk"))
        .filter(col("rk") <= 3)
        .orderBy(col("o_custkey"), col("rk"))
    }),

    // Running aggregate with explicit ROWS frame (analytic window over
    // the ordered history, frame pinned so engines agree).
    "q_window_running_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, dir)
        .filter(col("l_suppkey") <= 5)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          asMoney(sum(dec2(col("l_quantity"))).over(w)).as("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // W1+W2+W3+W4 combined — the full lf_address_history lifecycle shape
    // (cam/tables/lf_address_history.py:84-169): ordered versions per
    // entity, each stage linked to its predecessor (prov:wasInformedBy),
    // ended by its successor's timestamp, with the last stage flagged
    // current (open-ended).
    "q_window_lifecycle" -> ((s, dir) => {
      val asc = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber"))
      val desc = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_linenumber").desc)
      Tables.lineitem(s, dir)
        .filter(col("l_orderkey") % 200 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          lag(col("l_linenumber"), 1).over(asc).as("informed_by"),
          epochMs(col("l_shipdate")).as("start_ms"),
          epochMs(lead(col("l_shipdate"), 1).over(asc)).as("end_ms"),
          (row_number().over(desc) === 1).as("is_current"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Frame specs — the one window feature the reference never needed
    // (SURVEY §2.5 note) but a declared part of the engine surface:
    // a ROWS frame (last-3-orders moving spend; order carries a unique
    // tiebreaker because ROWS frames are tie-sensitive) and a RANGE frame
    // (trailing-30-day spend over an integer day key; RANGE includes
    // peers, so it is deterministic under ties by construction). Both
    // windows share the o_custkey partition → one shuffle, two frames.
    "q_window_frames" -> ((s, dir) => {
      val day = datediff(col("o_orderdate").cast("date"),
        lit("1990-01-01").cast("date"))
      val wRows = Window.partitionBy(col("o_custkey"))
        .orderBy(col("day"), col("o_orderkey"))
        .rowsBetween(-2, Window.currentRow)
      val wRange = Window.partitionBy(col("o_custkey"))
        .orderBy(col("day"))
        .rangeBetween(-30, Window.currentRow)
      Tables.orders(s, dir)
        .filter(col("o_custkey") % 10 === 0)
        .select(col("o_custkey"), col("o_orderkey"), day.as("day"),
          dec2(col("o_totalprice")).as("p"))
        .select(col("o_custkey"), col("o_orderkey"), col("day"),
          asMoney(sum(col("p")).over(wRows)).as("last3_total"),
          asMoney(sum(col("p")).over(wRange)).as("d30_total"))
        .orderBy(col("o_custkey"), col("day"), col("o_orderkey"))
    }),

    // NTILE quantile bucketing — stratification for quota sampling /
    // data mixing (assign each row its within-group quartile). Keyed by
    // market segment so the sort stays per-group (a global NTILE is a
    // single-partition sort at scale — avoid); tiebreak makes ranks total.
    "q_window_ntile" -> ((s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(dec2(col("c_acctbal")).desc, col("c_custkey"))
      Tables.customer(s, dir)
        .filter(col("c_custkey") % 10 === 0)
        .select(col("c_mktsegment"), col("c_custkey"),
          asMoney(dec2(col("c_acctbal"))).as("bal"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("c_mktsegment"), col("quartile"), col("c_custkey"))
    }),

    // Time-series densify + carry-forward (gap fill): per supplier, a
    // complete daily calendar spanned by sequence()+explode, left-joined
    // to the real daily sums, missing days carrying the last observed
    // value forward (`last(ignoreNulls)` over an unbounded-preceding ROWS
    // frame). Scale shape: after the daily pre-aggregation (the only
    // fact-sized shuffle) everything downstream — calendar, join, fill
    // window — operates on span × keys rows, independent of fact rows;
    // the explode itself is narrow.
    "q_window_gapfill" -> ((s, dir) => {
      val daily = Tables.lineitem(s, dir)
        .filter(col("l_suppkey") <= 3)
        .groupBy(col("l_suppkey"), to_date(col("l_shipdate")).as("day"))
        .agg(asMoney(sum(dec2(col("l_quantity")))).as("qty"))
      val calendar = daily.groupBy(col("l_suppkey"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("l_suppkey"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      calendar.join(daily, Seq("l_suppkey", "day"), "left")
        .select(col("l_suppkey"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          last(col("qty"), ignoreNulls = true).over(w).as("qty_filled"),
          col("qty").isNull.as("is_gap"))
        .orderBy(col("l_suppkey"), col("day"))
    }),

    // O1-O3: global top-k — ORDER BY score DESC LIMIT k with tiebreak
    // (etl-notes-data-loading.md:100).
    "q_sort_topk_global" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          asMoney(dec2(col("o_totalprice"))).as("price"))
        .orderBy(col("price").desc, col("o_orderkey"))
        .limit(20)
    }),

    // O4: offset/limit pagination (meili/main.py:96-105).
    "q_sort_pagination" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
        .offset(100)
        .limit(25)
    }),

    // Ratio-to-report: each nation's revenue share within its region —
    // the percent-of-total window verb. Revenue sums run in DECIMAL
    // (exact, engine-order-proof); only the final share division is
    // float, on identical operands. One group shuffle + one window over
    // the (tiny) aggregate.
    "q_window_share" -> ((s, dir) => {
      val rev = Tables.orders(s, dir)
        .join(Tables.customer(s, dir),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(dec2(col("o_totalprice"))).as("rev"))
      rev.withColumn("share",
          round(col("rev").cast("double") /
            sum(col("rev")).over(Window.partitionBy(col("r_name")))
              .cast("double"), 6))
        .select(col("r_name"), col("n_name"),
          asMoney(col("rev")).as("rev"), col("share"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // Largest-remainder integer allocation ("penny allocation"): split
    // each order's total cents across its lines proportional to
    // quantity, with the rounding remainder distributed to the largest
    // fractional parts — the classic proration primitive whose contract
    // is EXACT conservation: per-order Σalloc == total, no cent created
    // or lost. All math is integer (cents × quantity-cents fits BIGINT
    // comfortably); the remainder rank tie-breaks on line number so both
    // engines pick identical winners; the emitted `delta` column is the
    // in-band conservation proof (always 0) the oracle hashes too. Shape:
    // one group shuffle for the per-order sums + one window pass — no
    // join-back of the totals.
    "q_window_allocation" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select(
        col("l_orderkey"), col("l_linenumber"),
        (dec2(col("l_quantity")) * 100).cast("long").as("qty_c"))
      val w = Window.partitionBy(col("l_orderkey"))
      val withTot = li
        .join(Tables.orders(s, dir).select(col("o_orderkey"),
          (dec2(col("o_totalprice")) * 100).cast("long").as("total_c")),
          col("l_orderkey") === col("o_orderkey"))
        .withColumn("sum_qty", sum(col("qty_c")).over(w))
        .withColumn("base",
          expr("(total_c * qty_c) DIV sum_qty"))
        .withColumn("frac",
          expr("(total_c * qty_c) % sum_qty"))
      val ranked = withTot
        .withColumn("r", row_number().over(
          w.orderBy(col("frac").desc, col("l_linenumber"))))
        .withColumn("rem", col("total_c") - sum(col("base")).over(w))
        .withColumn("alloc_c",
          col("base") + when(col("r") <= col("rem"), 1L).otherwise(0L))
      ranked
        .withColumn("delta",
          sum(col("alloc_c")).over(w) - col("total_c"))
        .select(col("l_orderkey"), col("l_linenumber"), col("alloc_c"),
          col("delta"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // Percent-rank (CDF) normalization: each value's empirical quantile
    // within its event_type — the rank-based score transform that makes
    // heterogeneous signals comparable before mixing. The unique
    // (value, event_id) ordering makes the ranking strict, so
    // (rank−1)/(n−1) is exact integer math in both engines.
    "q_window_percent_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("pr", round(percent_rank().over(w), 9))
        .filter(col("event_id") % 97 === 0)
        .select(col("event_id"), col("event_type"), col("value"), col("pr"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // Time-weighted average (TWAP): per-user mean of `value` weighted by
    // how long it was the CURRENT value (lead-ts delta) — the correct
    // average over irregularly sampled series, where the plain mean
    // overweights bursts. One key shuffle shared by the lead window and
    // the aggregation.
    "q_window_twap" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("value"),
          epochMs(col("ts")).as("ms"))
        .withColumn("dt", lead(col("ms"), 1).over(w) - col("ms"))
        .filter(col("dt").isNotNull)
        .groupBy(col("user_id"))
        .agg(round(sum(col("value") * col("dt")) / sum(col("dt")), 6)
          .as("twap"),
          count(lit(1)).as("n_intervals"))
        .orderBy(col("user_id"))
    }),

    // Longest consecutive-active-day streak per user — the classic
    // gaps-and-islands decomposition (day_number − row_number is
    // constant within a run), the engagement metric behind retention
    // dashboards. All windows are USER-partitioned; the stream collapses
    // to distinct (user, day) first, so every stage after the dedup runs
    // over ≤ users × days rows. Deterministic winner: longest streak,
    // ties broken by earliest start.
    "q_window_streaks" -> ((s, dir) => {
      val wu = Window.partitionBy(col("user_id")).orderBy(col("dn"))
      val days = Tables.events(s, dir)
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
            .as("dn"))
        .distinct()
      val runs = days
        .withColumn("rn", row_number().over(wu))
        .withColumn("grp", col("dn") - col("rn"))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("streak"), min(col("dn")).as("start_dn"))
      val pick = Window.partitionBy(col("user_id"))
        .orderBy(col("streak").desc, col("start_dn"))
      runs.withColumn("rk", row_number().over(pick))
        .filter(col("rk") === 1 && col("user_id") % 5 === 0)
        .select(col("user_id"), col("streak"), col("start_dn"))
        .orderBy(col("user_id"))
    }),

    // Trailing 7-row moving MEDIAN per key — the robust smoother that
    // survives the spikes a moving average absorbs (sensor/metric
    // denoising before anomaly rules). percentile() is an ordinary
    // aggregate in both engines, so it runs directly over the row frame:
    // one per-key window exchange+sort, identical linear-interpolation
    // semantics (index p·(n−1)) on both sides. Restricted to purchases
    // to keep the gated output focused; the plan shape is key-partitioned
    // regardless of volume.
    "q_window_moving_median" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
        .rowsBetween(-6, 0)
      Tables.events(s, dir)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"),
          epochMs(col("ts")).as("ms"), col("value"))
        .withColumn("med7",
          round(expr("percentile(value, 0.5D)").over(w), 6))
        .filter(col("user_id") % 10 === 0)
        .orderBy(col("user_id"), col("ms"), col("event_id"))
    }),

    // rank vs dense_rank under REAL ties (the quantity ordering has no
    // tiebreaker on purpose): tied rows share a rank, rank then skips,
    // dense_rank doesn't — deterministic cross-engine because tied rows
    // get identical outputs regardless of physical order, the one case
    // where an incomplete window ordering is still gate-safe.
    "q_window_rank_dense" -> ((s, dir) => {
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_quantity"))
      Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"))
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .filter(col("l_orderkey") % 199 === 0 && col("l_linenumber") === 1)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_quantity"),
          col("rnk"), col("drnk"))
        .orderBy(col("l_returnflag"), col("l_orderkey"))
    }),

    // cume_dist + group extrema (explicit unbounded ROWS frame for the
    // first/last pair — both engines get the identical frame, sidestepping
    // DuckDB's RANGE-to-current-row default). The unique (value, event_id)
    // ordering makes cume_dist an exact int/int fraction. Output bounded
    // AFTER the windows (the distribution is over the full relation).
    "q_window_cume_dist" -> ((s, dir) => {
      val ord = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      val frame = ord.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.events(s, dir)
        .withColumn("cd", round(cume_dist().over(ord), 9))
        .withColumn("v_min", first(col("value")).over(frame))
        .withColumn("v_max", last(col("value")).over(frame))
        .filter(col("event_id") % 97 === 0)
        .select(col("event_id"), col("event_type"), col("value"),
          col("cd"), col("v_min"), col("v_max"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    // Bounded-horizon EWMA (geometric weights over the last 8 events per
    // user) — time-series smoothing in its SCALABLE form: the textbook
    // recurrence ewma_i = αx_i + (1-α)ewma_{i-1} is inherently
    // sequential over unbounded history, but geometric decay makes the
    // tail negligible, so an 8-term truncation is a lag pyramid — eight
    // lag() columns over ONE window spec, one exchange + one sort,
    // partial weights renormalized at sequence starts. The half-life
    // weights (0.5^k) are exact binary fractions: bit-identical algebra
    // in both engines.
    "q_window_ewma" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
      val ev = Tables.events(s, dir)
        .filter(col("user_id") % 25 === 0)
        .select(col("user_id"), col("event_id"),
          epochMs(col("ts")).as("ms"), col("value"))
      val lags = (0 to 7).map(k => lag(col("value"), k).over(w).as(s"l$k"))
      val withLags = ev.select(Seq(col("user_id"), col("event_id"),
        col("ms"), col("value")) ++ lags: _*)
      val num = (0 to 7).map(k =>
        when(col(s"l$k").isNotNull, col(s"l$k") * lit(math.pow(0.5, k)))
          .otherwise(lit(0.0))).reduce(_ + _)
      val den = (0 to 7).map(k =>
        when(col(s"l$k").isNotNull, lit(math.pow(0.5, k)))
          .otherwise(lit(0.0))).reduce(_ + _)
      withLags.select(col("user_id"), col("event_id"), col("ms"),
          col("value"), round(num / den, 6).as("ewma8"))
        .orderBy(col("user_id"), col("ms"), col("event_id"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_window_lag_lead" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  lag(l_quantity, 1) OVER w AS prev_qty,
        |  lead(l_quantity, 1) OVER w AS next_qty,
        |  epoch_ms(lead(l_shipdate, 1) OVER w) AS end_ms
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_window_current_flag" ->
      """SELECT l_orderkey, l_linenumber,
        |  (row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber DESC) = 1) AS is_current
        |FROM lineitem WHERE l_orderkey % 100 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_window_topk_per_group" ->
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) t
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q_window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_qty
        |FROM lineitem WHERE l_suppkey <= 5
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q_window_lifecycle" ->
      """SELECT l_orderkey, l_linenumber,
        |  lag(l_linenumber, 1) OVER wa AS informed_by,
        |  epoch_ms(l_shipdate) AS start_ms,
        |  epoch_ms(lead(l_shipdate, 1) OVER wa) AS end_ms,
        |  (row_number() OVER (PARTITION BY l_orderkey
        |     ORDER BY l_linenumber DESC) = 1) AS is_current
        |FROM lineitem WHERE l_orderkey % 200 = 0
        |WINDOW wa AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_window_frames" ->
      """WITH t AS (
        |  SELECT o_custkey, o_orderkey,
        |    date_diff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) AS day,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS p
        |  FROM orders WHERE o_custkey % 10 = 0)
        |SELECT o_custkey, o_orderkey, CAST(day AS INT) AS day,
        |  CAST(SUM(p) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS last3_total,
        |  CAST(SUM(p) OVER (PARTITION BY o_custkey ORDER BY day
        |    RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE) AS d30_total
        |FROM t ORDER BY o_custkey, day, o_orderkey""".stripMargin,
    "q_window_ntile" ->
      """SELECT c_mktsegment, c_custkey,
        |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS bal,
        |  ntile(4) OVER (PARTITION BY c_mktsegment
        |    ORDER BY CAST(c_acctbal AS DECIMAL(18,2)) DESC, c_custkey)
        |    AS quartile
        |FROM customer WHERE c_custkey % 10 = 0
        |ORDER BY c_mktsegment, quartile, c_custkey""".stripMargin,
    "q_window_gapfill" ->
      """WITH daily AS (
        |  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS day,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |  FROM lineitem WHERE l_suppkey <= 3 GROUP BY 1, 2),
        |b AS (
        |  SELECT l_suppkey, MIN(day) AS d0, MAX(day) AS d1
        |  FROM daily GROUP BY 1),
        |cal AS (
        |  SELECT l_suppkey,
        |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |f AS (
        |  SELECT c.l_suppkey, c.day, d.qty
        |  FROM cal c LEFT JOIN daily d
        |    ON c.l_suppkey = d.l_suppkey AND c.day = d.day)
        |SELECT l_suppkey, strftime(day, '%Y-%m-%d') AS day,
        |  last_value(qty IGNORE NULLS) OVER (PARTITION BY l_suppkey
        |    ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS qty_filled,
        |  (qty IS NULL) AS is_gap
        |FROM f ORDER BY l_suppkey, day""".stripMargin,
    "q_sort_topk_global" ->
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price
        |FROM orders ORDER BY price DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_sort_pagination" ->
      """SELECT c_custkey, c_name FROM customer
        |ORDER BY c_custkey LIMIT 25 OFFSET 100""".stripMargin,
    "q_window_allocation" ->
      """WITH li AS (
        |  SELECT l_orderkey, l_linenumber,
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS qty_c
        |  FROM lineitem),
        |o AS (
        |  SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS total_c
        |  FROM orders),
        |j AS (
        |  SELECT li.l_orderkey, li.l_linenumber, li.qty_c, o.total_c,
        |    SUM(qty_c) OVER (PARTITION BY l_orderkey) AS sum_qty
        |  FROM li JOIN o ON li.l_orderkey = o.o_orderkey),
        |b AS (
        |  SELECT *, CAST((total_c * qty_c) // sum_qty AS BIGINT) AS base,
        |    (total_c * qty_c) % sum_qty AS frac
        |  FROM j),
        |r AS (
        |  SELECT *,
        |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY frac DESC, l_linenumber) AS r,
        |    total_c - SUM(base) OVER (PARTITION BY l_orderkey) AS rem
        |  FROM b)
        |SELECT l_orderkey, l_linenumber,
        |  base + CASE WHEN r <= rem THEN 1 ELSE 0 END AS alloc_c,
        |  CAST(SUM(base + CASE WHEN r <= rem THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY l_orderkey) - total_c AS BIGINT) AS delta
        |FROM r ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_window_share" ->
      """WITH rev AS (
        |  SELECT r_name, n_name,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation ON c_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY r_name, n_name)
        |SELECT r_name, n_name, CAST(rev AS DOUBLE) AS rev,
        |  round(rev::DOUBLE /
        |    (SUM(rev) OVER (PARTITION BY r_name))::DOUBLE, 6) AS share
        |FROM rev ORDER BY r_name, n_name""".stripMargin,
    "q_window_percent_rank" ->
      """WITH r AS (
        |  SELECT event_id, event_type, value,
        |    round(percent_rank() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id), 9) AS pr
        |  FROM events)
        |SELECT event_id, event_type, value, pr FROM r
        |WHERE event_id % 97 = 0
        |ORDER BY event_type, event_id""".stripMargin,
    "q_window_twap" ->
      """WITH w AS (
        |  SELECT user_id, event_id, value, epoch_ms(ts) AS ms,
        |    lead(epoch_ms(ts)) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ms(ts), event_id) - epoch_ms(ts) AS dt
        |  FROM events)
        |SELECT user_id, round(SUM(value * dt) / SUM(dt), 6) AS twap,
        |  COUNT(*) AS n_intervals
        |FROM w WHERE dt IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_window_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS dn
        |  FROM events),
        |runs AS (
        |  SELECT user_id, dn - row_number() OVER (
        |      PARTITION BY user_id ORDER BY dn) AS grp, dn
        |  FROM days),
        |islands AS (
        |  SELECT user_id, grp, COUNT(*) AS streak, min(dn) AS start_dn
        |  FROM runs GROUP BY user_id, grp),
        |ranked AS (
        |  SELECT user_id, streak, start_dn, row_number() OVER (
        |    PARTITION BY user_id ORDER BY streak DESC, start_dn) AS rk
        |  FROM islands)
        |SELECT user_id, streak, CAST(start_dn AS INTEGER) AS start_dn
        |FROM ranked WHERE rk = 1 AND user_id % 5 = 0
        |ORDER BY user_id""".stripMargin,

    "q_window_moving_median" ->
      """WITH p AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms, value
        |  FROM events WHERE event_type = 'purchase')
        |SELECT user_id, event_id, ms, value,
        |  round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
        |    ORDER BY ms, event_id
        |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS med7
        |FROM p QUALIFY user_id % 10 = 0
        |ORDER BY user_id, ms, event_id""".stripMargin,

    "q_window_rank_dense" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |    rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
        |      AS rnk,
        |    dense_rank() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity) AS drnk
        |  FROM lineitem)
        |SELECT l_returnflag, l_orderkey, l_quantity, rnk, drnk FROM r
        |WHERE l_orderkey % 199 = 0 AND l_linenumber = 1
        |ORDER BY l_returnflag, l_orderkey""".stripMargin,

    "q_window_cume_dist" ->
      """WITH r AS (
        |  SELECT event_id, event_type, value,
        |    round(cume_dist() OVER (PARTITION BY event_type
        |      ORDER BY value, event_id), 9) AS cd,
        |    first_value(value) OVER (PARTITION BY event_type
        |      ORDER BY value, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS v_min,
        |    last_value(value) OVER (PARTITION BY event_type
        |      ORDER BY value, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS v_max
        |  FROM events)
        |SELECT event_id, event_type, value, cd, v_min, v_max FROM r
        |WHERE event_id % 97 = 0
        |ORDER BY event_type, event_id""".stripMargin,

    "q_window_ewma" -> {
      val lagCols = (0 to 7)
        .map(k => s"lag(value, $k) OVER w AS l$k").mkString(",\n|    ")
      val num = (0 to 7)
        .map(k => s"CASE WHEN l$k IS NOT NULL THEN l$k * ${math.pow(0.5, k)}::DOUBLE ELSE 0 END")
        .mkString("\n|      + ")
      val den = (0 to 7)
        .map(k => s"CASE WHEN l$k IS NOT NULL THEN ${math.pow(0.5, k)}::DOUBLE ELSE 0 END")
        .mkString("\n|      + ")
      s"""WITH ev AS (
         |  SELECT user_id, event_id, epoch_ms(ts) AS ms, value
         |  FROM events WHERE user_id % 25 = 0),
         |l AS (
         |  SELECT user_id, event_id, ms, value,
         |    $lagCols
         |  FROM ev
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id))
         |SELECT user_id, event_id, ms, value,
         |  round(($num)
         |    / ($den), 6) AS ewma8
         |FROM l ORDER BY user_id, ms, event_id""".stripMargin
    }
  )
}
