package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.{dec2, epochMs}
import graft.operators.Checkpoints.CutOps
import graft.operators.DataQuality
import graft.operators.DataQuality.Check

/** Distribution statistics and declarative data-quality rules — the
  * monitoring layer a 100 TB ingest runs BEFORE accepting a batch
  * (reference analogue: the pre-load validation SQL and count-parity
  * checks, `etl-notes.md` "validation"; the drift twin of
  * [[MiningQueries]]' PSI monitor).
  *
  * Cross-engine parity: every statistic is `round(…, 6)`; the reductions
  * (`max`, `sum` of ≤ a few dozen cells) are order-insensitive well below
  * 6 dp, so IEEE double noise cannot reach the hash.
  */
object StatsQueries extends QueryCatalog {

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Two-sample Kolmogorov-Smirnov D between the value distributions of
    // two event types — the classic "did this batch drift?" test. Scale
    // shape: the N-row input collapses FIRST to per-distinct-value counts
    // (map-side-combinable groupBy), so the global cumulative window runs
    // over the VALUE DOMAIN (|V| ≪ N), not the events; totals ride in on
    // a broadcast single-row aggregate. The domain-ordered cumulative is
    // the one inherently sequential step of a CDF — at extreme domains,
    // range-partition the sort and add per-partition prefix offsets.
    "q_stats_ks" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type").isin("click", "view"))
        .select(col("value").as("v"),
          (col("event_type") === "click").as("isa"))
      val perV = ev.groupBy(col("v")).agg(
        sum(when(col("isa"), 1L).otherwise(0L)).as("a"),
        sum(when(!col("isa"), 1L).otherwise(0L)).as("b"))
      val tot = ev.agg(
        sum(when(col("isa"), 1L).otherwise(0L)).cast("double").as("na"),
        sum(when(!col("isa"), 1L).otherwise(0L)).cast("double").as("nb"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perV
        .withColumn("ca", sum(col("a")).over(w))
        .withColumn("cb", sum(col("b")).over(w))
        .crossJoin(broadcast(tot))
        .agg(
          round(max(abs(col("ca") / col("na") - col("cb") / col("nb"))), 6)
            .as("ks_d"),
          count(lit(1)).as("n_points"))
    }),

    // Chi-squared independence between market segment and order priority.
    // Observed counts are one map-side-combinable aggregation; row/column
    // marginals and the grand total are windows over the CONTINGENCY
    // MATRIX (cells = |segments|×|priorities|, a constant — the windows
    // never see fact-table cardinality).
    "q_stats_chi2" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val obs = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
          col("o_orderpriority").as("pri"))
        .agg(count(lit(1)).cast("double").as("o"))
      val e = col("r") * col("c") / col("n")
      obs
        .withColumn("r", sum(col("o")).over(Window.partitionBy(col("seg"))))
        .withColumn("c", sum(col("o")).over(Window.partitionBy(col("pri"))))
        .withColumn("n", sum(col("o")).over(Window.partitionBy()))
        .agg(
          round(sum(pow(col("o") - e, 2) / e), 6).as("chi2"),
          count(lit(1)).as("cells"))
    }),

    // Declarative DQ rule spec → violations relation. Six row-level
    // checks over two tables compile to TWO aggregate passes (one per
    // table — adding a rule adds no scan), plus one uniqueness
    // aggregation and one anti-join FK probe. Zero AND nonzero rows both
    // appear: the report is the contract, not just the failures.
    "q_dq_rules" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val e = Tables.events(s, dir)
      val c = Tables.customer(s, dir)
      DataQuality.report(Seq(
        DataQuality.checkViolations(o, Seq(
          Check("ord_date_not_null", col("o_orderdate").isNotNull),
          Check("ord_price_cap", col("o_totalprice") <= 400000.0),
          Check("ord_status_domain",
            col("o_orderstatus").isin("O", "F", "P")))),
        DataQuality.checkViolations(e, Seq(
          Check("evt_props_format", col("props").rlike("^\\{\"k\": [0-9]+\\}$")),
          Check("evt_type_domain", col("event_type").isin(
            "click", "view", "purchase", "signup", "error")),
          Check("evt_value_range",
            col("value") >= 0.0 && col("value") <= 190.0))),
        DataQuality.uniqueViolations("ord_key_unique", o,
          Seq(col("o_orderkey"))),
        DataQuality.fkViolations("evt_user_fk", e, col("user_id"),
          c, col("c_custkey"))))
    }),

    // One-pass column profiler — the "what's in this table" report every
    // ingest runs before writing expectations (null rates, cardinality,
    // value ranges per column). ONE aggregation over the data: all
    // per-column stats land in a single agg (the multi-COUNT-DISTINCT
    // plans through one Expand pass), then the 1-row result melts to a
    // row per column driver-side-free (explode of a literal struct
    // array). At 100 TB swap the exact distincts for
    // approx_count_distinct / the HLL aggregator and the Expand
    // disappears — the gate pins the exact variant. min/max strings are
    // truncated to 32 chars on BOTH engines (byte-wise collation
    // agrees: Spark UTF8String binary order = DuckDB byte order).
    "q_dq_profile" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      val aggs = cols.flatMap { c => Seq(
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        substring(min(col(c)).cast("string"), 1, 32).as(s"${c}__mn"),
        substring(max(col(c)).cast("string"), 1, 32).as(s"${c}__mx")) }
      val row = d.agg(count(lit(1)).as("n_rows"), aggs: _*)
      val entries = cols.map(c => struct(lit(c).as("col_name"),
        col(s"${c}__nn").as("n_non_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_s"), col(s"${c}__mx").as("max_s")))
      row.select(col("n_rows"), explode(array(entries: _*)).as("p"))
        .select(col("p.col_name").as("col_name"), col("n_rows"),
          col("p.n_non_null").as("n_non_null"),
          (col("n_rows") - col("p.n_non_null")).as("n_nulls"),
          col("p.n_distinct").as("n_distinct"),
          col("p.min_s").as("min_s"), col("p.max_s").as("max_s"))
        .orderBy(col("col_name"))
    }),

    // Day-of-week seasonal index — the volume baseline a monitoring
    // pipeline divides out before alerting (Monday traffic ≠ Sunday
    // traffic is seasonality, not drift). Two partial-aggregable
    // reductions: events→daily counts (N→days), daily→per-weekday means
    // (days→7); the corpus-wide mean rides a broadcast single-row
    // combinator. All ratios are exact-integer sums divided in double —
    // engine-identical below the 6 dp gate.
    "q_events_seasonality" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val tot = daily.agg(avg(col("n")).as("a"))
      daily.withColumn("dow", weekday(col("day")))
        .groupBy(col("dow")).agg(avg(col("n")).as("avg_n"))
        .crossJoin(broadcast(tot))
        .select(col("dow"), round(col("avg_n"), 6).as("avg_events"),
          round(col("avg_n") / col("a"), 6).as("seasonal_idx"))
        .orderBy(col("dow"))
    }),

    // Lag-1 autocorrelation of daily volume — "is today predicted by
    // yesterday": the one-number stationarity probe run before any
    // forecasting model. The N-row stream reduces to daily counts first;
    // the lag window and corr() then run over the DAY domain (the same
    // domain-not-stream shape as q_stats_ks). corr is a single-pass
    // co-moment — order-insensitive far below the 6 dp gate.
    "q_stats_autocorr" -> ((s, dir) => {
      val w = Window.orderBy(col("day"))
      Tables.events(s, dir)
        .groupBy(to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("prev_n", lag(col("n"), 1).over(w))
        .filter(col("prev_n").isNotNull)
        .agg(
          round(corr(col("n").cast("double"),
            col("prev_n").cast("double")), 6).as("lag1_autocorr"),
          count(lit(1)).as("n_pairs"))
    }),

    // Mann–Kendall trend test + Theil–Sen slope per user — the robust
    // (rank/median-based) trend detector next to the OLS regr_* family:
    // S is an exact ±1 pair sum, Var(S) carries the tie-correction term,
    // z applies the continuity correction, and the Sen slope is the
    // exact median of pairwise per-day slopes. The pairwise work is ONE
    // self-equi-join keyed on user_id (a single shuffle); the quadratic
    // blowup is bounded by per-user activity (~20 events), never corpus
    // size — the same bound as the basket self-join.
    "q_stats_mann_kendall" -> ((s, dir) => {
      val base = Tables.events(s, dir)
        .filter(col("event_type") === "purchase" &&
          col("user_id") % 10 === 0)
        .select(col("user_id"), epochMs(col("ts")).as("ms"),
          col("event_id"), col("value"))
        .cutLineage(eager = false)
      val pairs = base.as("a").join(base.as("b"),
        col("a.user_id") === col("b.user_id") &&
          (col("a.ms") < col("b.ms") ||
            (col("a.ms") === col("b.ms") &&
              col("a.event_id") < col("b.event_id"))))
      val pairAgg = pairs
        .groupBy(col("a.user_id").as("user_id"))
        .agg(
          sum(when(col("b.value") > col("a.value"), 1L)
            .when(col("b.value") < col("a.value"), -1L)
            .otherwise(0L)).as("s_stat"),
          round(expr(
            "percentile(CASE WHEN b.ms <> a.ms THEN " +
              "(b.value - a.value) / (b.ms - a.ms) * 86400000.0 END, 0.5)"),
            6).as("sen_slope_day"))
      val counts = base.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      val ties = base.groupBy(col("user_id"), col("value"))
        .agg(count(lit(1)).as("t"))
        .filter(col("t") > 1)
        .groupBy(col("user_id"))
        .agg(sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5))
          .as("tie_term"))
      val varS = (col("n") * (col("n") - 1) * (col("n") * 2 + 5) -
        coalesce(col("tie_term"), lit(0L))).cast("double") / 18.0
      pairAgg.join(counts, Seq("user_id"))
        .join(ties, Seq("user_id"), "left")
        .select(col("user_id"), col("n"), col("s_stat"),
          round(varS, 6).as("var_s"),
          round(
            when(col("s_stat") > 0,
              (col("s_stat") - 1).cast("double") / sqrt(varS))
              .when(col("s_stat") < 0,
                (col("s_stat") + 1).cast("double") / sqrt(varS))
              .otherwise(lit(0.0)), 6).as("z"),
          col("sen_slope_day"))
        .orderBy(col("user_id"))
    }),

    // BENFORD first-digit audit — the fraud/fabrication screen financial
    // DQ runs over money columns: naturally-grown amounts follow
    // P(d) = log10(1+1/d); fabricated or truncated feeds don't. The
    // digit comes from the DECIMAL's string rendering (exact, no
    // log-floor boundary risk), counts are one partial-aggregable
    // groupBy over 9 cells, and the per-digit |observed − expected|
    // deviation is reported next to both shares (all 6-dp-rounded —
    // the only doubles are one division and one log10 per digit).
    "q_dq_benford" -> ((s, dir) => {
      val d1 = Tables.orders(s, dir)
        .select(substring(
          col("o_totalprice").cast("decimal(18,2)").cast("string"), 1, 1)
          .as("digit"))
      val tot = d1.agg(count(lit(1)).as("tot"))
      d1.groupBy(col("digit")).agg(count(lit(1)).as("n"))
        .crossJoin(broadcast(tot))
        .select(col("digit"), col("n"),
          round(col("n") / col("tot").cast("double"), 6).as("obs_share"),
          round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
            .as("exp_share"))
        .withColumn("abs_dev",
          round(abs(col("obs_share") - col("exp_share")), 6))
        .orderBy(col("digit"))
    }),

    // k-anonymity / l-diversity audit — the privacy-governance twin of
    // the PII redaction op: group the relation by its quasi-identifier
    // combination (segment × nation × coarse balance band — the columns
    // an attacker could link externally) and measure each equivalence
    // class: fewer than k=5 members means the QI combination
    // re-identifies, fewer than l=2 distinct sensitive values means the
    // class leaks the attribute even without re-identification. One
    // partial-aggregable groupBy (count + distinct-count per class) at
    // any scale; the flags are in-band so the gate hashes the VERDICTS,
    // not just the counts.
    "q_dq_k_anonymity" -> ((s, dir) => {
      Tables.customer(s, dir)
        .select(col("c_mktsegment").as("segment"),
          col("c_nationkey").as("nation"),
          floor((dec2(col("c_acctbal")).cast("double") + 1000.0) / 2000.0)
            .cast("long").as("bal_band"),
          concat(lit("S"), (col("c_custkey") % 5).cast("string"))
            .as("sensitive"))
        .groupBy(col("segment"), col("nation"), col("bal_band"))
        .agg(count(lit(1)).as("k_size"),
          countDistinct(col("sensitive")).as("l_distinct"))
        .withColumn("k_risk", col("k_size") < 5)
        .withColumn("l_risk", col("l_distinct") < 2)
        .orderBy(col("segment"), col("nation"), col("bal_band"))
    }),

    // 2-D HISTOGRAM (heatmap) — hour-of-day × value band counts, the
    // activity-heatmap primitive behind every ops dashboard: both bin
    // ids are integer arithmetic (hour from epoch-ms div/mod; value band
    // from a floor at exactly-representable 5.0 boundaries), so the 2-D
    // binning is a pure partial-aggregable groupBy over O(24×bands)
    // cells — the heatmap costs one map-side-combined pass at any scale.
    "q_stats_histogram2d" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(epochMs(col("ts")).as("ms"), col("value"))
        .select(
          expr("CAST((ms div 3600000) % 24 AS INT)").as("hour"),
          least(lit(9), floor(col("value") / 5.0).cast("int")).as("vband"),
          col("value"))
        .groupBy(col("hour"), col("vband"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2)
            .as("sum_value"))
        .orderBy(col("hour"), col("vband"))
    }),

    // Per-user INTERVAL COVERAGE — union of overlapping intervals, the
    // total-watch-time / SLA-uptime primitive: each event holds a 15-min
    // lease, leases merge while they overlap (classic gaps-and-islands:
    // running max of interval end over PRECEDING rows; a start past that
    // max opens a new island), and the coverage is the sum of island
    // lengths — overlap is never double-counted. Scale shape: one
    // user-keyed window + two partial-aggregable groupBys; parallelism
    // is the user count, not a global sort. Tie-safety: equal (start,
    // end) pairs yield the same island count whichever of them the
    // window orders first, so the unique-tiebreak rule is satisfiable
    // without an id column.
    "q_events_coverage" -> ((s, dir) => {
      val lease = 15 * 60 * 1000L
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("s0"), col("e0"))
      val iv = Tables.events(s, dir)
        .select(col("user_id"), epochMs(col("ts")).as("s0"))
        .withColumn("e0", col("s0") + lease)
      iv
        .withColumn("maxe", max(col("e0")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new_island",
          when(col("maxe").isNull || col("s0") > col("maxe"), 1L)
            .otherwise(0L))
        .withColumn("island", sum(col("new_island")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("s0")).as("is0"), max(col("e0")).as("ie0"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_islands"),
          sum(col("ie0") - col("is0")).as("covered_ms"),
          max(col("ie0") - col("is0")).as("max_island_ms"))
        .orderBy(col("user_id"))
    }),

    // Sweep-line CONCURRENCY — peak simultaneous sessions per day, the
    // capacity-planning number (licenses, connection pools, GPU slots).
    // Sessions (30-min idle gap, the q_stream_sessions rule) become
    // ±1 boundary events; a day-partitioned running sum over
    // (ts, delta) is the classic sweep, and its max is the answer. At
    // equal timestamps STARTS process before ENDS (closed intervals —
    // a single-event session still peaks at 1; same-user boundaries
    // can never collide because sessions are >30 min apart), mirrored
    // in the oracle's window ORDER BY. Day partitioning keeps the sweep
    // parallel; sessions crossing midnight are split by day attribution
    // of their boundaries (documented approximation, exact for this
    // gap rule's intraday sessions).
    "q_events_concurrency" -> ((s, dir) => {
      val wGap = Window.partitionBy(col("user_id"))
        .orderBy(col("ms"), col("event_id"))
      val wSweep = Window.partitionBy(col("day"))
        .orderBy(col("ts_b"), col("delta").desc, col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          epochMs(col("ts")).as("ms"))
      val sessions = ev
        .withColumn("prev", lag(col("ms"), 1).over(wGap))
        .withColumn("new_s",
          when(col("prev").isNull ||
            col("ms") - col("prev") > 1800000L, 1).otherwise(0))
        .withColumn("sid", sum(col("new_s")).over(
          Window.partitionBy(col("user_id"))
            .orderBy(col("ms"), col("event_id"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(min(col("ms")).as("s_start"), max(col("ms")).as("s_end"))
      val bounds = sessions
        .select(col("user_id"), col("s_start").as("ts_b"),
          lit(1).as("delta"))
        .unionByName(sessions.select(col("user_id"),
          col("s_end").as("ts_b"), lit(-1).as("delta")))
        .withColumn("day",
          expr("ts_b div 86400000"))
      bounds
        .withColumn("conc", sum(col("delta")).over(wSweep))
        .groupBy(col("day"))
        .agg(max(col("conc")).as("peak_concurrency"),
          sum(when(col("delta") === 1, 1L).otherwise(0L))
            .as("n_sessions"))
        .orderBy(col("day"))
    }),

    // Inter-arrival-time profile — the traffic-shape signature per
    // stream key (burstiness shows up as p95 ≫ mean; the input to
    // capacity planning and anomaly thresholds). Gaps are a per-key
    // lag over event time (one window exchange); the percentile
    // summary then aggregates the per-key gap relation. Gap units are
    // exact integer milliseconds end to end.
    "q_stats_interarrival" -> ((s, dir) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("ms"), col("event_id"))
      Tables.events(s, dir)
        .select(col("event_type"), col("event_id"),
          epochMs(col("ts")).as("ms"))
        .withColumn("gap", col("ms") - lag(col("ms"), 1).over(w))
        .filter(col("gap").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          round(avg(col("gap")), 6).as("mean_ms"),
          expr("percentile(gap, array(0.5D, 0.95D))").as("pct"),
          max(col("gap")).as("max_ms"))
        .select(col("event_type"), col("n_gaps"), col("mean_ms"),
          round(col("pct").getItem(0), 6).as("p50_ms"),
          round(col("pct").getItem(1), 6).as("p95_ms"), col("max_ms"))
        .orderBy(col("event_type"))
    }),

    // Kaplan-Meier survival estimator — time-to-conversion with
    // censoring done right: users who never purchase after their first
    // view aren't dropped (that biases the curve down) but counted
    // at-risk until the observation horizon. S(t) = Π(1 − dᵢ/nᵢ) over
    // event days, computed as exp of a cumulative log-sum so the
    // product order is the deterministic day order. The stream reduces
    // to per-user (duration, event) pairs first, then everything runs
    // over the ~30-row day domain (the q_stats_ks shape).
    "q_stats_kaplan_meier" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"),
          epochMs(col("ts")).as("ms"))
      val t0 = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("ms")).as("t0"))
      val firstP = ev.filter(col("event_type") === "purchase")
        .join(t0, Seq("user_id")).filter(col("ms") > col("t0"))
        .groupBy(col("user_id")).agg(min(col("ms")).as("te"))
      val gmax = ev.agg(max(col("ms")).as("gm"))
      val durs = t0.join(firstP, Seq("user_id"), "left")
        .crossJoin(broadcast(gmax))
        .select(
          when(col("te").isNotNull, expr("(te - t0) div 86400000"))
            .otherwise(expr("(gm - t0) div 86400000")).as("t"),
          col("te").isNotNull.cast("int").as("ev"))
      val total = durs.agg(count(lit(1)).as("ntot"))
      val byT = durs.groupBy(col("t"))
        .agg(sum(col("ev")).as("d"), count(lit(1)).as("all_t"))
      val before = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val upTo = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byT.crossJoin(broadcast(total))
        .withColumn("n_risk",
          col("ntot") - coalesce(sum(col("all_t")).over(before), lit(0L)))
        .filter(col("d") > 0)
        // S(t) hits exactly 0 when every remaining at-risk user converts
        // (d = n); ln(0) is undefined, so the zero factor is carried as
        // a sticky flag and the log-sum skips it (same guard in SQL).
        .withColumn("f",
          lit(1.0) - col("d").cast("double") / col("n_risk"))
        .withColumn("anyzero",
          max(when(col("f") === 0.0, 1).otherwise(0)).over(upTo))
        .withColumn("surv",
          round(when(col("anyzero") === 1, 0.0).otherwise(
            exp(sum(log(when(col("f") === 0.0, 1.0).otherwise(col("f"))))
              .over(upTo))), 6))
        .select(col("t"), col("n_risk"), col("d"), col("surv"))
        .orderBy(col("t"))
    }),

    // Event-ORDER contract — the state-machine DQ rule relational
    // engines usually can't express declaratively: "no purchase before
    // the user's first signup". Per-user first-timestamps by type come
    // from ONE conditional-aggregate scan (no per-type joins — the
    // leakage-safe-matrix shape), then the violation predicate is a
    // pure projection. Counts + an example offender id cross the gate.
    "q_dq_event_order" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "signup", epochMs(col("ts"))))
            .as("first_signup"),
          min(when(col("event_type") === "purchase",
            epochMs(col("ts")))).as("first_purchase"))
        .select(
          count(lit(1)).as("n_users"),
          sum(when(col("first_purchase").isNotNull &&
            (col("first_signup").isNull ||
              col("first_purchase") < col("first_signup")), 1L)
            .otherwise(0L)).as("n_violations"),
          min(when(col("first_purchase").isNotNull &&
            (col("first_signup").isNull ||
              col("first_purchase") < col("first_signup")),
            col("user_id"))).as("first_offender"))
    }),

    // Plan LINT through the gate (operators/PlanLint): a deliberately
    // scale-broken plan (unconditioned cross join) and a healthy one
    // (broadcast equi-join + partial agg) are linted, and the
    // error/info counts cross the oracle. This pins the linter's
    // verdicts — the same rules a pipeline's submit gate would enforce
    // with PlanLint.assertScaleSafe — to an explicit expectation.
    "q_dq_plan_lint" -> ((s, dir) => {
      import s.implicits._
      import graft.operators.PlanLint
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val dims = Tables.nation(s, dir).select(col("n_nationkey"))
      val bad = docs.crossJoin(dims)
      val good = docs
        .join(broadcast(dims), col("doc_id") % 25 === col("n_nationkey"))
        .groupBy(col("n_nationkey")).count()
      def counts(name: String, df: DataFrame) = {
        val f = PlanLint.lint(df)
        (name, f.count(_.severity == "error").toLong,
          f.count(_.severity == "info").toLong)
      }
      // A disconnected textual SPARQL query (r8): rejected by default —
      // the parser's cartesian guard — and, when the conf opts in, the
      // compiled plan still carries the condition-less Join the linter
      // flags. Parser guard and plan linter agree on the same hazard.
      val sparqlQ = """SELECT * WHERE {
        ?a <urn:name> ?n . ?p <urn:type> ?t }"""
      val quads = Tables.nation(s, dir)
        .select(col("n_name").as("subject"),
          when(col("n_nationkey") % 2 === 0, "urn:name")
            .otherwise("urn:type").as("predicate"),
          col("n_name").as("objectValue"))
      val guarded =
        try { graft.rdf.SparqlParser.execute(quads, sparqlQ); false }
        catch { case e: IllegalArgumentException =>
          e.getMessage.contains("allowCartesian") }
      s.conf.set("graft.sparql.allowCartesian", "true")
      val cartesian =
        try counts("sparql_cartesian_optin",
          graft.rdf.SparqlParser.execute(quads, sparqlQ))
        finally s.conf.unset("graft.sparql.allowCartesian")
      require(guarded, "the SPARQL cartesian guard did not fire")
      Seq(counts("bad_cross_join", bad), counts("good_broadcast_agg", good),
        cartesian)
        .toDF("plan", "n_errors", "n_infos")
        .orderBy(col("plan"))
    }),

    // Declarative SCHEMA CONTRACT check — the ingest handshake: the
    // expected (column, type) contract meets the source's ACTUAL schema
    // (from the engine's canonical reader) in a full outer comparison,
    // yielding ok / missing_column / unexpected_column / type_mismatch
    // per column. Pure metadata — no data rows are read — which is
    // exactly why it runs BEFORE the 100 TB scan it protects.
    "q_dq_schema_contract" -> ((s, dir) => {
      import s.implicits._
      val expectedContract = Seq(
        ("event_id", "BIGINT"), ("ts", "TIMESTAMP"), ("user_id", "BIGINT"),
        ("event_type", "STRING"), ("value", "DOUBLE"), ("props", "STRING"))
      val exp = expectedContract.toDF("col_name", "expected_type")
      val act = Tables.events(s, dir).schema.fields.toSeq
        .map(f => (f.name, f.dataType.sql)).toDF("col_name", "actual_type")
      exp.join(act, Seq("col_name"), "full_outer")
        .select(col("col_name"),
          coalesce(col("expected_type"), lit("-")).as("expected_type"),
          coalesce(col("actual_type"), lit("-")).as("actual_type"),
          when(col("expected_type").isNull, "unexpected_column")
            .when(col("actual_type").isNull, "missing_column")
            .when(col("expected_type") =!= col("actual_type"),
              "type_mismatch")
            .otherwise("ok").as("status"))
        .orderBy(col("col_name"))
    }),

    // Pareto / Lorenz deciles — the "top 10% of customers drive X% of
    // revenue" table behind every concentration dashboard (the decile
    // view of q_stats_gini's single number). Global spend rank comes
    // from [[graft.operators.GlobalRank]]; decile boundaries use the
    // integer `div` formula (floors identically in both engines, unlike
    // ntile + CAST); the cumulative share window then runs over TEN
    // rows. Money exact-decimal until the final share division.
    "q_stats_pareto" -> ((s, dir) => {
      val w = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("x"))
      val n = spend.agg(count(lit(1)).as("n_cust"))
      graft.operators.GlobalRank
        .withGlobalRowNumber(spend,
          Seq(negate(col("x")), col("o_custkey")), "rk")
        .crossJoin(broadcast(n))
        .withColumn("decile", expr("((rk - 1) * 10) div n_cust") + 1)
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_cust"), sum(col("x")).as("dx"))
        .crossJoin(broadcast(spend.agg(sum(col("x")).as("tx"))))
        .select(col("decile"), col("n_cust"),
          round(col("dx").cast("double") / col("tx").cast("double"), 6)
            .as("share"),
          round(sum(col("dx")).over(w).cast("double") /
            col("tx").cast("double"), 6).as("cum_share"))
        .orderBy(col("decile"))
    }),

    // Deterministic distributed BOOTSTRAP — resampling-based uncertainty
    // for a mean without collecting anything: each replicate draws a
    // per-row Poisson(1) weight (the classic large-N approximation of
    // multinomial resampling) INVERTED FROM THE ROW'S HASH, so the
    // "randomness" is reproducible, shuffle-free, and SQL-replayable —
    // the hex-prefix thresholds are the Poisson(1) CDF at 16-bit
    // precision (24109/65536 ≈ e⁻¹ …). Three replicates explode from
    // each row in one scan pass; each replicate's weighted mean is an
    // exact-decimal reduction.
    "q_stats_bootstrap" -> ((s, dir) => {
      val h4 = substring(
        md5(concat(col("o_orderkey").cast("string"), lit(":"),
          col("rep").cast("string"))), 1, 4)
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").as("x"),
          explode(array(lit(0), lit(1), lit(2))).as("rep"))
        .withColumn("w",
          when(h4 < "5e2d", 0).when(h4 < "bc5b", 1).when(h4 < "eb79", 2)
            .when(h4 < "fb2b", 3).when(h4 < "ff10", 4).otherwise(5))
        .groupBy(col("rep"))
        .agg(sum(col("w")).as("n_eff"),
          round(sum(col("w") * col("x")).cast("double") / sum(col("w")), 6)
            .as("boot_mean"))
        .orderBy(col("rep"))
    }),

    // OHLC downsampling — the canonical time-series reduction (open/
    // high/low/close per key per day, metrics dashboards and financial
    // bars alike). Open and close come from min/max over
    // struct(ts, event_id, value) — ONE partial-aggregable pass, no
    // first_value window, no sort: the struct comparison makes "value
    // at the earliest/latest timestamp" an ordinary mergeable aggregate
    // (event_id uniquifies the instant). That is what lets a 100 TB
    // stream downsample map-side.
    "q_stats_ohlc" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_type"), to_date(col("ts")).as("day"),
          epochMs(col("ts")).as("ms"), col("event_id"), col("value"))
        .groupBy(col("event_type"), col("day"))
        .agg(
          min(struct(col("ms"), col("event_id"), col("value"))).as("o"),
          max(struct(col("ms"), col("event_id"), col("value"))).as("c"),
          round(max(col("value")), 6).as("high"),
          round(min(col("value")), 6).as("low"),
          count(lit(1)).as("n"))
        .select(col("event_type"),
          date_format(col("day"), "yyyy-MM-dd").as("day"),
          round(col("o").getField("value"), 6).as("open"),
          col("high"), col("low"),
          round(col("c").getField("value"), 6).as("close"), col("n"))
        .filter(col("event_type").isin("click", "purchase"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Freshness + volume monitor — the two table-level DQ signals every
    // ingest dashboard alarms on: per source key, "is the newest data
    // recent?" (lag vs the global high-watermark ≤ 1 day) and "did the
    // last day's volume collapse?" (final-day count ≥ 50% of the key's
    // daily average). Everything reduces through per-(key, day) counts
    // first — two tiny aggregates and a single-row broadcast; the
    // final-day count is a struct-max over the daily relation (the
    // q_agg_argmax trick), no join-back.
    "q_dq_freshness" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), epochMs(col("ts")).as("ms"),
          to_date(col("ts")).as("day"))
      val perDay = ev.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"))
      val perType = perDay.groupBy(col("event_type"))
        .agg(sum(col("n")).as("total"), count(lit(1)).as("n_days"),
          max(struct(col("day"), col("n"))).as("m"))
      val maxMs = ev.groupBy(col("event_type")).agg(max(col("ms")).as("max_ms"))
      val globalMs = ev.agg(max(col("ms")).as("gmax"))
      perType.join(maxMs, Seq("event_type"))
        .crossJoin(broadcast(globalMs))
        .select(col("event_type"), col("max_ms"), col("n_days"),
          col("m").getField("n").as("n_last_day"),
          round(col("total").cast("double") / col("n_days"), 6)
            .as("avg_daily"),
          (col("gmax") - col("max_ms") <= 86400000L).as("fresh_ok"),
          (col("m").getField("n").cast("double") * 2 >=
            col("total").cast("double") / col("n_days")).as("volume_ok"))
        .orderBy(col("event_type"))
    }),

    // Gini coefficient of per-customer spend — the concentration audit a
    // corpus owner runs on source/author balance before training ("does
    // 1% of the corpus contribute 50% of the tokens?"). Uses the sorted
    // Lorenz form G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n, which needs a GLOBAL
    // rank of the per-key totals: the naive no-partition window is a
    // single-task scale killer, so the rank comes from
    // [[graft.operators.GlobalRank]] (range-shuffle + per-partition
    // offsets — full parallelism, identical ranks). The N-row stream
    // collapses to per-key totals first; money math stays DECIMAL(18,2)
    // until the final DOUBLE division (catalog parity convention).
    "q_stats_gini" -> ((s, dir) => {
      val spend = Tables.orders(s, dir)
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("x"))
      graft.operators.GlobalRank
        .withGlobalRowNumber(spend, Seq(col("x"), col("o_custkey")), "i")
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("i") * col("x")).as("six"))
        .select(col("n"),
          round(
            lit(2.0) * col("six").cast("double") /
              (col("n") * col("sx").cast("double")) -
              (col("n") + 1).cast("double") / col("n"), 6).as("gini"))
    }),

    // Rolling 7-day OLS trend — the windowed sibling of q_agg_regression
    // and the parametric complement of q_stats_mann_kendall: a local
    // slope per day answers "is volume trending HERE", not just over the
    // whole series. Scale shape: events collapse to per-day counts
    // first, so the frame windows run over the DAY domain; every frame
    // statistic (k, Σx, Σy, Σxy, Σx²) is an exact BIGINT sum sharing ONE
    // ordered window spec — a single sort, five accumulators — and the
    // slope (kΣxy−ΣxΣy)/(kΣx²−(Σx)²) does its only FP work in the final
    // division. Full 7-day frames only (the warm-up rows have no
    // defined 7-day trend — and k=1 frames would divide by zero).
    "q_stats_rolling_slope" -> ((s, dir) => {
      val daily = Tables.events(s, dir)
        .select(expr("unix_millis(cast(ts as timestamp)) div 86400000")
          .as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("n"))
      val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
      // one select, not a withColumn chain: all five frame stats land in
      // a single Window node (CollapseWindow doesn't always merge
      // through the interleaved Projects a chain builds)
      daily
        .select(col("day"), col("n"),
          count(lit(1)).over(w).as("k"),
          sum(col("day")).over(w).as("sx"),
          sum(col("n")).over(w).as("sy"),
          sum(col("day") * col("n")).over(w).as("sxy"),
          sum(col("day") * col("day")).over(w).as("sx2"))
        .filter(col("k") === 7)
        .select(col("day"), col("n"),
          round((col("k") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (col("k") * col("sx2") - col("sx") * col("sx")), 6)
            .as("slope7"))
        .orderBy(col("day"))
    }),

    // CUSUM changepoint detection on the daily event-volume series —
    // "where did the level shift?" for an ingest monitor. CUSUM_t =
    // Σ_{i≤t}(x_i − x̄) peaks at the most likely change location. Scale
    // shape: the N-row stream collapses to per-day counts first, so the
    // ordered cumulative runs over the DAY domain (|D| ≪ N); the running
    // sum stays BIGINT (exact) and the mean subtraction is i·(Σx/|D|) —
    // two double ops per day, identical fold order in both engines. The
    // argmax day is recovered against the 6-dp-rounded peak so a sub-6dp
    // FP wiggle can never flip the reported changepoint.
    "q_stats_cusum" -> ((s, dir) => {
      val perDay = Tables.events(s, dir)
        .select(expr("unix_millis(cast(ts as timestamp)) div 86400000").as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("x"))
      val tot = perDay.agg(
        sum(col("x")).cast("double").as("sx"),
        count(lit(1)).cast("double").as("nd"))
      val wc = Window.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perDay
        .withColumn("cs", sum(col("x")).over(wc))
        .withColumn("i", row_number().over(Window.orderBy(col("day"))))
        .crossJoin(broadcast(tot))
        .withColumn("a", round(abs(
          col("cs").cast("double") - col("i") * (col("sx") / col("nd"))), 6))
        .withColumn("mx", max(col("a")).over(Window.partitionBy()))
        .agg(
          max(col("a")).as("max_abs_cusum"),
          min(when(col("a") === col("mx"), col("day"))).as("cp_day"),
          count(lit(1)).as("n_days"))
    }),

    // Additive seasonal decomposition of daily order revenue: trend =
    // centered 7-day moving average, seasonal = per-day-of-week mean of
    // the detrended series (the STL-lite a forecasting pipeline runs
    // before modeling). Parity trick: the detrended value is kept EXACT
    // as 7·revenue − Σ₇revenue in DECIMAL (no division until the end),
    // so the per-DoW aggregation is order-insensitive; one final DOUBLE
    // division by 7·n. DoW comes from the epoch-day index mod 7 (both
    // engines agree by construction; named weekday functions differ in
    // origin across engines). Interior days only (full 7-day window).
    "q_stats_seasonal" -> ((s, dir) => {
      val perDay = Tables.orders(s, dir)
        .groupBy(datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).as("day"))
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
      perDay
        .withColumn("s7", sum(col("rev")).over(w7))
        .withColumn("c7", count(lit(1)).over(w7))
        .filter(col("c7") === 7)
        .withColumn("det7", lit(7) * col("rev") - col("s7"))
        .groupBy((col("day") % 7).cast("int").as("dow"))
        .agg(
          count(lit(1)).as("n_days"),
          round(sum(col("det7")).cast("double") /
            (lit(7.0) * count(lit(1))), 6).as("seasonal"))
        .orderBy(col("dow"))
    }),

    // Lagged cross-correlation: does today's click VOLUME predict
    // purchase REVENUE `lag` days later? Pearson r at lags 0..3 from
    // exact mergeable sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²):
    // counts stay BIGINT, revenue stays DECIMAL, the products are
    // DECIMAL — every sum is order-insensitive, and r is assembled in
    // doubles only at the very end (the same discipline as
    // q_agg_sufficient_stats, which makes the window-order-free plan
    // safe at any scale). The lag shift is an equi-join of the tiny
    // per-day relation against itself per lag — no window functions.
    "q_stats_crosscorr" -> ((s, dir) => {
      val perDay = Tables.events(s, dir)
        .select(expr("unix_millis(cast(ts as timestamp)) div 86400000").as("day"),
          col("event_type"), col("value"))
        .groupBy(col("day"))
        .agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
          // Re-narrow the summed revenue to DECIMAL(18,2): keeps y·y at
          // precision 37 ≤ 38, so the squared products stay EXACT in both
          // engines instead of silently losing scale past the cap.
          coalesce(sum(when(col("event_type") === "purchase",
            col("value").cast("decimal(18,2)"))),
            lit(0).cast("decimal(18,2)")).cast("decimal(18,2)").as("y"))
      val lags = s.range(0, 4).select(col("id").cast("int").as("lag"))
      val a = perDay.select(col("day"), col("x"))
      val b = perDay.select(col("day").as("day2"), col("y"))
      a.crossJoin(broadcast(lags))
        .join(b, col("day2") === col("day") + col("lag"))
        .groupBy(col("lag"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x").cast("decimal(9,0)") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("lag"), col("n"),
          round(
            (col("n") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
            sqrt((col("n") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) *
              (col("n") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double"))), 6)
            .as("r"))
        .orderBy(col("lag"))
    }),

    // Two-proportion z-test for an A/B experiment: users are assigned to
    // arms by a deterministic md5 split (the same engine-replayable hash
    // the sampling operators use), conversion = "has at least one
    // purchase event". The z statistic is assembled from four integers
    // (users and converters per arm) — the aggregation is a single
    // map-side-combinable pass over per-user flags, and the only doubles
    // are the final closed-form expression, so parity is exact. This is
    // the experimentation readout a feature-flag pipeline runs at scale.
    "q_stats_ab_ztest" -> ((s, dir) => {
      // Conversion = "made a HIGH-VALUE purchase" — at test SFs nearly
      // every user purchases at least once, which saturates p at 1 and
      // zeroes the pooled SE; the value threshold keeps p in (0,1).
      val perUser = Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(max(when(col("event_type") === "purchase" &&
            col("value") > 150.0, 1L).otherwise(0L))
          .as("conv"))
        .withColumn("arm",
          when(substring(md5(col("user_id").cast("string")), 1, 2) < "80",
            "A").otherwise("B"))
      val z = perUser.agg(
        sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === "A", col("conv")).otherwise(0L)).as("c_a"),
        sum(when(col("arm") === "B", col("conv")).otherwise(0L)).as("c_b"))
      val p  = (col("c_a") + col("c_b")).cast("double") /
        (col("n_a") + col("n_b")).cast("double")
      val se = sqrt(p * (lit(1.0) - p) *
        (lit(1.0) / col("n_a") + lit(1.0) / col("n_b")))
      // Degenerate experiment (p = 0 or 1 ⇒ SE = 0) reports NULL z on
      // both sides instead of tripping ANSI divide-by-zero.
      z.select(col("n_a"), col("n_b"), col("c_a"), col("c_b"),
        when(se > 0.0,
          round((col("c_a").cast("double") / col("n_a") -
            col("c_b").cast("double") / col("n_b")) / se, 6)).as("z"))
    })
  )

  override def oracleSql: Map[String, String] = Map(
    "q_stats_ks" ->
      """WITH u AS (
        |  SELECT value AS v,
        |         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS ia,
        |         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS ib
        |  FROM events WHERE event_type IN ('click', 'view')),
        |tot AS (SELECT sum(ia)::DOUBLE AS na, sum(ib)::DOUBLE AS nb FROM u),
        |pv AS (SELECT v, sum(ia) AS a, sum(ib) AS b FROM u GROUP BY v),
        |c AS (SELECT v, sum(a) OVER (ORDER BY v) AS ca,
        |             sum(b) OVER (ORDER BY v) AS cb FROM pv)
        |SELECT round(max(abs(ca / na - cb / nb)), 6) AS ks_d,
        |       count(*) AS n_points
        |FROM c, tot""".stripMargin,

    "q_stats_chi2" ->
      """WITH obs AS (
        |  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS pri,
        |         count(*)::DOUBLE AS o
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY 1, 2),
        |m AS (
        |  SELECT o,
        |         sum(o) OVER (PARTITION BY seg) AS r,
        |         sum(o) OVER (PARTITION BY pri) AS c,
        |         sum(o) OVER () AS n
        |  FROM obs)
        |SELECT round(sum((o - r*c/n) * (o - r*c/n) / (r*c/n)), 6) AS chi2,
        |       count(*) AS cells
        |FROM m""".stripMargin,

    "q_dq_profile" -> {
      val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
      "WITH p AS (" + cols.map(c =>
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |  COUNT($c) AS n_non_null, COUNT(DISTINCT $c) AS n_distinct,
           |  substring(CAST(MIN($c) AS VARCHAR), 1, 32) AS min_s,
           |  substring(CAST(MAX($c) AS VARCHAR), 1, 32) AS max_s
           |FROM documents""".stripMargin).mkString("\nUNION ALL\n") +
        ")\nSELECT col_name, n_rows, n_non_null, " +
        "n_rows - n_non_null AS n_nulls, n_distinct, min_s, max_s " +
        "FROM p ORDER BY col_name"
    },

    "q_dq_rules" ->
      """SELECT rule_id, violations FROM (
        |  SELECT 'ord_date_not_null' AS rule_id,
        |         count(*) FILTER (WHERE o_orderdate IS NULL)::BIGINT AS violations
        |  FROM orders
        |  UNION ALL
        |  SELECT 'ord_price_cap',
        |         count(*) FILTER (WHERE NOT coalesce(o_totalprice <= 400000.0, FALSE))::BIGINT
        |  FROM orders
        |  UNION ALL
        |  SELECT 'ord_status_domain',
        |         count(*) FILTER (WHERE NOT coalesce(o_orderstatus IN ('O','F','P'), FALSE))::BIGINT
        |  FROM orders
        |  UNION ALL
        |  SELECT 'evt_props_format',
        |         count(*) FILTER (WHERE NOT coalesce(regexp_matches(props, '^\{"k": [0-9]+\}$'), FALSE))::BIGINT
        |  FROM events
        |  UNION ALL
        |  SELECT 'evt_type_domain',
        |         count(*) FILTER (WHERE NOT coalesce(event_type IN ('click','view','purchase','signup','error'), FALSE))::BIGINT
        |  FROM events
        |  UNION ALL
        |  SELECT 'evt_value_range',
        |         count(*) FILTER (WHERE NOT coalesce(value >= 0.0 AND value <= 190.0, FALSE))::BIGINT
        |  FROM events
        |  UNION ALL
        |  SELECT 'ord_key_unique', coalesce(sum(n), 0)::BIGINT FROM (
        |    SELECT count(*) AS n FROM orders GROUP BY o_orderkey
        |    HAVING count(*) > 1)
        |  UNION ALL
        |  SELECT 'evt_user_fk', count(*)::BIGINT FROM events e
        |  WHERE NOT EXISTS (
        |    SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id))
        |ORDER BY rule_id""".stripMargin,

    "q_events_seasonality" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |byd AS (
        |  SELECT CAST(isodow(day) - 1 AS INT) AS dow, AVG(n) AS avg_n
        |  FROM daily GROUP BY 1),
        |tot AS (SELECT AVG(n) AS a FROM daily)
        |SELECT dow, round(avg_n, 6) AS avg_events,
        |       round(avg_n / a, 6) AS seasonal_idx
        |FROM byd, tot ORDER BY dow""".stripMargin,

    "q_stats_mann_kendall" ->
      """WITH base AS (
        |  SELECT user_id, epoch_ms(ts) AS ms, event_id, value
        |  FROM events WHERE event_type = 'purchase' AND user_id % 10 = 0),
        |pairs AS (
        |  SELECT a.user_id, a.ms AS ams, b.ms AS bms,
        |         a.value AS av, b.value AS bv
        |  FROM base a JOIN base b ON a.user_id = b.user_id
        |   AND (a.ms < b.ms OR (a.ms = b.ms AND a.event_id < b.event_id))),
        |pa AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN bv > av THEN 1 WHEN bv < av THEN -1
        |      ELSE 0 END) AS BIGINT) AS s_stat,
        |    round(quantile_cont(CASE WHEN bms <> ams THEN
        |      (bv - av) / (bms - ams) * 86400000.0 END, 0.5), 6)
        |      AS sen_slope_day
        |  FROM pairs GROUP BY user_id),
        |cnt AS (SELECT user_id, COUNT(*) AS n FROM base GROUP BY user_id),
        |tie AS (
        |  SELECT user_id, sum(t * (t - 1) * (2 * t + 5)) AS tie_term
        |  FROM (SELECT user_id, value, COUNT(*) AS t FROM base
        |        GROUP BY 1, 2) g
        |  WHERE t > 1 GROUP BY user_id),
        |v AS (
        |  SELECT p.user_id, cnt.n, p.s_stat, p.sen_slope_day,
        |    (cnt.n * (cnt.n - 1) * (2 * cnt.n + 5)
        |      - coalesce(tie.tie_term, 0)) / 18.0 AS var_s
        |  FROM pa p JOIN cnt USING (user_id) LEFT JOIN tie USING (user_id))
        |SELECT user_id, n, s_stat, round(var_s, 6) AS var_s,
        |  round(CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s)
        |             WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s)
        |             ELSE 0.0 END, 6) AS z,
        |  sen_slope_day
        |FROM v ORDER BY user_id""".stripMargin,

    "q_stats_autocorr" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1),
        |l AS (
        |  SELECT n, lag(n, 1) OVER (ORDER BY day) AS prev_n FROM daily)
        |SELECT round(corr(n::DOUBLE, prev_n::DOUBLE), 6) AS lag1_autocorr,
        |       COUNT(*) AS n_pairs
        |FROM l WHERE prev_n IS NOT NULL""".stripMargin,

    "q_dq_k_anonymity" ->
      """WITH q AS (
        |  SELECT c_mktsegment AS segment, c_nationkey AS nation,
        |    CAST(floor((CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE)
        |      + 1000.0) / 2000.0) AS BIGINT) AS bal_band,
        |    'S' || CAST(c_custkey % 5 AS VARCHAR) AS sensitive
        |  FROM customer)
        |SELECT segment, nation, bal_band,
        |  COUNT(*) AS k_size,
        |  COUNT(DISTINCT sensitive) AS l_distinct,
        |  COUNT(*) < 5 AS k_risk,
        |  COUNT(DISTINCT sensitive) < 2 AS l_risk
        |FROM q GROUP BY segment, nation, bal_band
        |ORDER BY segment, nation, bal_band""".stripMargin,

    "q_dq_benford" ->
      """WITH d AS (
        |  SELECT substring(
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR), 1, 1)
        |    AS digit
        |  FROM orders),
        |t AS (SELECT COUNT(*) AS tot FROM d),
        |g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit)
        |SELECT digit, n,
        |  round(n / CAST(tot AS DOUBLE), 6) AS obs_share,
        |  round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS exp_share,
        |  round(abs(round(n / CAST(tot AS DOUBLE), 6) -
        |    round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)), 6)
        |    AS abs_dev
        |FROM g, t ORDER BY digit""".stripMargin,

    "q_stats_histogram2d" ->
      """WITH b AS (
        |  SELECT CAST((epoch_ms(ts) // 3600000) % 24 AS INT) AS hour,
        |    least(9, CAST(floor(value / 5.0) AS INT)) AS vband, value
        |  FROM events)
        |SELECT hour, vband, COUNT(*) AS n,
        |  round(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
        |    AS sum_value
        |FROM b GROUP BY hour, vband ORDER BY hour, vband""".stripMargin,

    "q_events_coverage" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_ms(ts) AS s0, epoch_ms(ts) + 900000 AS e0
        |  FROM events),
        |m AS (
        |  SELECT user_id, s0, e0,
        |    max(e0) OVER (PARTITION BY user_id ORDER BY s0, e0
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
        |  FROM iv),
        |isl AS (
        |  SELECT user_id, s0, e0,
        |    SUM(CASE WHEN maxe IS NULL OR s0 > maxe THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY s0, e0
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM m),
        |g AS (
        |  SELECT user_id, island, MIN(s0) AS is0, MAX(e0) AS ie0
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_islands,
        |  CAST(SUM(ie0 - is0) AS BIGINT) AS covered_ms,
        |  CAST(MAX(ie0 - is0) AS BIGINT) AS max_island_ms
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_events_concurrency" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
        |gaps AS (
        |  SELECT user_id, event_id, ms,
        |    CASE WHEN lag(ms) OVER w IS NULL
        |           OR ms - lag(ms) OVER w > 1800000 THEN 1 ELSE 0 END
        |      AS new_s
        |  FROM ev WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ms, event_id)),
        |sess AS (
        |  SELECT user_id,
        |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ms, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid,
        |    ms
        |  FROM gaps),
        |spans AS (
        |  SELECT user_id, sid, min(ms) AS s_start, max(ms) AS s_end
        |  FROM sess GROUP BY user_id, sid),
        |bounds AS (
        |  SELECT user_id, s_start AS ts_b, 1 AS delta FROM spans
        |  UNION ALL
        |  SELECT user_id, s_end, -1 FROM spans),
        |sweep AS (
        |  SELECT ts_b // 86400000 AS day, delta,
        |    SUM(delta) OVER (PARTITION BY ts_b // 86400000
        |      ORDER BY ts_b, delta DESC, user_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
        |  FROM bounds)
        |SELECT day, CAST(max(conc) AS BIGINT) AS peak_concurrency,
        |  CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_sessions
        |FROM sweep GROUP BY day ORDER BY day""".stripMargin,

    "q_stats_interarrival" ->
      """WITH seq AS (
        |  SELECT event_type, epoch_ms(ts) AS ms,
        |    epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
        |      PARTITION BY event_type
        |      ORDER BY epoch_ms(ts), event_id) AS gap
        |  FROM events)
        |SELECT event_type, COUNT(*) AS n_gaps,
        |  round(AVG(gap), 6) AS mean_ms,
        |  round(quantile_cont(gap, 0.5), 6) AS p50_ms,
        |  round(quantile_cont(gap, 0.95), 6) AS p95_ms,
        |  max(gap) AS max_ms
        |FROM seq WHERE gap IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_stats_kaplan_meier" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |t0 AS (
        |  SELECT user_id, min(ms) AS t0 FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id),
        |fp AS (
        |  SELECT ev.user_id, min(ms) AS te
        |  FROM ev JOIN t0 USING (user_id)
        |  WHERE event_type = 'purchase' AND ms > t0
        |  GROUP BY ev.user_id),
        |g AS (SELECT max(ms) AS gm FROM ev),
        |durs AS (
        |  SELECT CASE WHEN te IS NOT NULL THEN (te - t0) // 86400000
        |              ELSE (gm - t0) // 86400000 END AS t,
        |    CASE WHEN te IS NOT NULL THEN 1 ELSE 0 END AS ev
        |  FROM t0 LEFT JOIN fp USING (user_id), g),
        |tot AS (SELECT COUNT(*) AS ntot FROM durs),
        |by_t AS (
        |  SELECT t, CAST(SUM(ev) AS BIGINT) AS d, COUNT(*) AS all_t
        |  FROM durs GROUP BY t),
        |risk AS (
        |  SELECT t, d,
        |    CAST(ntot - coalesce(SUM(all_t) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS n_risk
        |  FROM by_t, tot),
        |f AS (
        |  SELECT t, n_risk, d,
        |    1.0 - CAST(d AS DOUBLE) / n_risk AS f
        |  FROM risk WHERE d > 0)
        |SELECT t, n_risk, d,
        |  round(CASE WHEN max(CASE WHEN f = 0.0 THEN 1 ELSE 0 END)
        |      OVER upto = 1 THEN 0.0
        |    ELSE exp(SUM(ln(CASE WHEN f = 0.0 THEN 1.0 ELSE f END))
        |      OVER upto) END, 6) AS surv
        |FROM f
        |WINDOW upto AS (ORDER BY t
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY t""".stripMargin,

    "q_dq_event_order" ->
      """WITH per AS (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN epoch_ms(ts) END)
        |      AS first_signup,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_ms(ts) END)
        |      AS first_purchase
        |  FROM events GROUP BY user_id)
        |SELECT COUNT(*) AS n_users,
        |  CAST(SUM(CASE WHEN first_purchase IS NOT NULL AND
        |    (first_signup IS NULL OR first_purchase < first_signup)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
        |  min(CASE WHEN first_purchase IS NOT NULL AND
        |    (first_signup IS NULL OR first_purchase < first_signup)
        |    THEN user_id END) AS first_offender
        |FROM per""".stripMargin,

    "q_dq_plan_lint" ->
      """SELECT * FROM (VALUES
        |  ('bad_cross_join', CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('good_broadcast_agg', CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
        |  ('sparql_cartesian_optin', CAST(1 AS BIGINT), CAST(0 AS BIGINT)))
        |  AS t(plan, n_errors, n_infos)
        |ORDER BY plan""".stripMargin,

    "q_dq_schema_contract" ->
      """SELECT * FROM (VALUES
        |  ('event_id', 'BIGINT', 'BIGINT', 'ok'),
        |  ('ts', 'TIMESTAMP', 'TIMESTAMP', 'ok'),
        |  ('user_id', 'BIGINT', 'BIGINT', 'ok'),
        |  ('event_type', 'STRING', 'STRING', 'ok'),
        |  ('value', 'DOUBLE', 'DOUBLE', 'ok'),
        |  ('props', 'STRING', 'STRING', 'ok'))
        |  AS t(col_name, expected_type, actual_type, status)
        |ORDER BY col_name""".stripMargin,

    "q_stats_pareto" ->
      """WITH spend AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
        |  FROM orders GROUP BY o_custkey),
        |n AS (SELECT COUNT(*) AS n_cust FROM spend),
        |t AS (SELECT SUM(x) AS tx FROM spend),
        |rk AS (
        |  SELECT x, row_number() OVER (ORDER BY x DESC, o_custkey) AS rk
        |  FROM spend),
        |dec AS (
        |  SELECT ((rk - 1) * 10) // n_cust + 1 AS decile, x FROM rk, n),
        |per AS (
        |  SELECT decile, COUNT(*) AS n_cust, SUM(x) AS dx
        |  FROM dec GROUP BY decile)
        |SELECT decile, n_cust,
        |  round(CAST(dx AS DOUBLE) / CAST(tx AS DOUBLE), 6) AS share,
        |  round(CAST(SUM(dx) OVER (ORDER BY decile
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(tx AS DOUBLE), 6) AS cum_share
        |FROM per, t ORDER BY decile""".stripMargin,

    "q_stats_bootstrap" ->
      """WITH r AS (
        |  SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS x,
        |    unnest([0, 1, 2]) AS rep
        |  FROM orders),
        |wts AS (
        |  SELECT rep, x,
        |    CASE
        |      WHEN substring(md5(CAST(o_orderkey AS VARCHAR) || ':' ||
        |        CAST(rep AS VARCHAR)), 1, 4) < '5e2d' THEN 0
        |      WHEN substring(md5(CAST(o_orderkey AS VARCHAR) || ':' ||
        |        CAST(rep AS VARCHAR)), 1, 4) < 'bc5b' THEN 1
        |      WHEN substring(md5(CAST(o_orderkey AS VARCHAR) || ':' ||
        |        CAST(rep AS VARCHAR)), 1, 4) < 'eb79' THEN 2
        |      WHEN substring(md5(CAST(o_orderkey AS VARCHAR) || ':' ||
        |        CAST(rep AS VARCHAR)), 1, 4) < 'fb2b' THEN 3
        |      WHEN substring(md5(CAST(o_orderkey AS VARCHAR) || ':' ||
        |        CAST(rep AS VARCHAR)), 1, 4) < 'ff10' THEN 4
        |      ELSE 5 END AS w
        |  FROM r)
        |SELECT rep, CAST(SUM(w) AS BIGINT) AS n_eff,
        |  round(CAST(SUM(w * x) AS DOUBLE) / SUM(w), 6) AS boot_mean
        |FROM wts GROUP BY rep ORDER BY rep""".stripMargin,

    "q_stats_ohlc" ->
      """WITH t AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, epoch_ms(ts) AS ms,
        |    event_id, value,
        |    first_value(value) OVER w AS o,
        |    last_value(value) OVER (PARTITION BY event_type,
        |      CAST(ts AS DATE) ORDER BY epoch_ms(ts), event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |      AS c
        |  FROM events
        |  WHERE event_type IN ('click', 'purchase')
        |  WINDOW w AS (PARTITION BY event_type, CAST(ts AS DATE)
        |    ORDER BY epoch_ms(ts), event_id))
        |SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
        |  round(min(o), 6) AS open, round(max(value), 6) AS high,
        |  round(min(value), 6) AS low, round(min(c), 6) AS close,
        |  COUNT(*) AS n
        |FROM t GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin,

    "q_dq_freshness" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_ms(ts) AS ms, CAST(ts AS DATE) AS day
        |  FROM events),
        |per_day AS (
        |  SELECT event_type, day, COUNT(*) AS n FROM ev
        |  GROUP BY event_type, day),
        |per_type AS (
        |  SELECT event_type, CAST(SUM(n) AS BIGINT) AS total,
        |    COUNT(*) AS n_days, arg_max(n, day) AS n_last_day
        |  FROM per_day GROUP BY event_type),
        |mx AS (SELECT event_type, max(ms) AS max_ms FROM ev
        |       GROUP BY event_type),
        |g AS (SELECT max(ms) AS gmax FROM ev)
        |SELECT p.event_type, max_ms, n_days, n_last_day,
        |  round(CAST(total AS DOUBLE) / n_days, 6) AS avg_daily,
        |  (gmax - max_ms <= 86400000) AS fresh_ok,
        |  (CAST(n_last_day AS DOUBLE) * 2 >= CAST(total AS DOUBLE) / n_days)
        |    AS volume_ok
        |FROM per_type p JOIN mx ON p.event_type = mx.event_type, g
        |ORDER BY p.event_type""".stripMargin,

    "q_stats_gini" ->
      """WITH spend AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
        |  FROM orders GROUP BY o_custkey),
        |r AS (
        |  SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i
        |  FROM spend)
        |SELECT COUNT(*) AS n,
        |  round(2.0 * CAST(SUM(i * x) AS DOUBLE) /
        |          (COUNT(*) * CAST(SUM(x) AS DOUBLE)) -
        |        CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini
        |FROM r""".stripMargin,

    "q_stats_rolling_slope" ->
      """WITH daily AS (
        |  SELECT epoch_ms(ts) // 86400000 AS day, COUNT(*) AS n
        |  FROM events GROUP BY day),
        |r AS (
        |  SELECT day, n,
        |    COUNT(*) OVER w AS k, SUM(day) OVER w AS sx,
        |    SUM(n) OVER w AS sy, SUM(day * n) OVER w AS sxy,
        |    SUM(day * day) OVER w AS sx2
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
        |SELECT day, n,
        |  round(CAST(k * sxy - sx * sy AS DOUBLE) /
        |    (k * sx2 - sx * sx), 6) AS slope7
        |FROM r WHERE k = 7 ORDER BY day""".stripMargin,

    "q_stats_cusum" ->
      """WITH pd AS (
        |  SELECT epoch_ms(ts) // 86400000 AS day, count(*) AS x
        |  FROM events GROUP BY 1),
        |t AS (SELECT CAST(sum(x) AS DOUBLE) AS sx,
        |             CAST(count(*) AS DOUBLE) AS nd FROM pd),
        |c AS (SELECT day,
        |             sum(x) OVER (ORDER BY day) AS cs,
        |             row_number() OVER (ORDER BY day) AS i FROM pd),
        |a AS (SELECT day,
        |             round(abs(CAST(cs AS DOUBLE) - i * (sx / nd)), 6) AS a
        |      FROM c, t)
        |SELECT max(a) AS max_abs_cusum,
        |       min(day) FILTER (WHERE a = (SELECT max(a) FROM a)) AS cp_day,
        |       count(*) AS n_days
        |FROM a""".stripMargin,

    "q_stats_seasonal" ->
      """WITH pd AS (
        |  SELECT date_diff('day', DATE '1970-01-01',
        |           CAST(o_orderdate AS DATE)) AS day,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders GROUP BY 1),
        |w AS (
        |  SELECT day, rev,
        |    sum(rev) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
        |                   AND 3 FOLLOWING) AS s7,
        |    count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING
        |                   AND 3 FOLLOWING) AS c7
        |  FROM pd)
        |SELECT CAST(day % 7 AS INT) AS dow, count(*) AS n_days,
        |       round(CAST(sum(7 * rev - s7) AS DOUBLE) / (7.0 * count(*)), 6)
        |         AS seasonal
        |FROM w WHERE c7 = 7
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_stats_crosscorr" ->
      """WITH pd AS (
        |  SELECT epoch_ms(ts) // 86400000 AS day,
        |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
        |    CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
        |      THEN CAST(value AS DECIMAL(18,2)) END),
        |      CAST(0 AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
        |  FROM events GROUP BY 1),
        |pairs AS (
        |  SELECT l.lag, a.x, b.y
        |  FROM pd a
        |  CROSS JOIN (VALUES (0),(1),(2),(3)) AS l(lag)
        |  JOIN pd b ON b.day = a.day + l.lag),
        |s AS (
        |  SELECT lag, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |         sum(CAST(x AS DECIMAL(9,0)) * y) AS sxy,
        |         sum(x * x) AS sxx, sum(y * y) AS syy
        |  FROM pairs GROUP BY lag)
        |SELECT CAST(lag AS INT) AS lag, n,
        |  round((n * CAST(sxy AS DOUBLE) -
        |           CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |        sqrt((n * CAST(sxx AS DOUBLE) -
        |                CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |             (n * CAST(syy AS DOUBLE) -
        |                CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r
        |FROM s ORDER BY lag""".stripMargin,

    "q_stats_ab_ztest" ->
      """WITH pu AS (
        |  SELECT user_id,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150.0
        |        THEN 1 ELSE 0 END) AS conv,
        |    CASE WHEN substring(md5(CAST(min(user_id) AS VARCHAR)), 1, 2)
        |           < '80' THEN 'A' ELSE 'B' END AS arm
        |  FROM events GROUP BY user_id),
        |s AS (
        |  SELECT
        |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        |    CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS c_a,
        |    CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS c_b
        |  FROM pu),
        |se AS (
        |  SELECT *,
        |    sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
        |         (1.0 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b)) *
        |         (1.0 / n_a + 1.0 / n_b)) AS sev
        |  FROM s)
        |SELECT n_a, n_b, c_a, c_b,
        |  CASE WHEN sev > 0.0 THEN
        |    round((CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
        |          / sev, 6) END AS z
        |FROM se""".stripMargin
  )
}
