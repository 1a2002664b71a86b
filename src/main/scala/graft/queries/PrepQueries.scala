package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.epochMs

/** ML feature-preparation operators — the transforms that sit between the
  * cleaned corpus and model training in a large-scale training-data
  * pipeline (reference analogue: the derived-attribute normalization
  * passes of the address/road matchers, generalized to feature space):
  *
  *  - `q_feature_hashing`: the hashing trick (Weinberger et al., ICML'09)
  *    — token → stable 32-bit hash → modulo-D feature index, counts per
  *    (doc, feature). No vocabulary table, no vocabulary JOIN, no driver
  *    state: the feature space is fixed at D up front, so the transform
  *    is a single map-side pass + one partial-aggregable groupBy. That
  *    statelessness is exactly why hashing wins at 100 TB — dictionary
  *    encoding (`q_encode_dictionary`) needs a fitted vocab broadcast,
  *    hashing needs nothing.
  *  - `q_encode_target`: smoothed mean target encoding of a categorical
  *    against a continuous target, `enc = (Σy + m·prior) / (n + m)` —
  *    the empirical-Bayes shrinkage form, m = 50. Stats are one
  *    partial-aggregable groupBy on the (low-cardinality) category; only
  *    the single-row global prior is broadcast back. Money math runs in
  *    DECIMAL(18,2) until the final DOUBLE division (catalog parity
  *    convention).
  *  - `q_sample_time_split`: temporal train/test split — the leakage-safe
  *    split for time-ordered corpora (hash splits leak future into
  *    train). Pure scan-side predicate: the cutoff comparison pushes into
  *    the parquet scan, each split is a partition-prunable filter at
  *    scale, and the audit aggregate is map-side combinable.
  *
  * Parity: hashes are md5-hex → 32-bit int (the [[graft.operators.Sampling]]
  * convention both engines replay); floating outputs rounded to 6 dp.
  */
object PrepQueries extends QueryCatalog {

  /** Feature-space width for the hashing trick. */
  private val HashDim = 256

  /** Smoothing pseudo-count for target encoding. */
  private val Smooth = 50

  /** Temporal split cutoff (events span 2024-01-01 .. 2024-01-30). */
  private val Cutoff = "2024-01-24 00:00:00"

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Hashed bag-of-words: token → (first 8 md5 hex chars as u32) mod D.
    // The doc_id % 5 gate only bounds the MATERIALIZED output (the gate
    // compares full results); the transform itself is corpus-wide and
    // per-row — no join, no vocab, one shuffle for the (doc, feature)
    // count whose partials combine map-side.
    "q_feature_hashing" -> ((s, dir) => {
      val toks = Tables.documents(s, dir)
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          explode(split(lower(regexp_replace(trim(col("text")), "\\s+", " ")),
            " ")).as("tok"))
        .filter(length(col("tok")) > 0)
      toks
        .withColumn("feature",
          (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
            % HashDim).cast("int"))
        .groupBy(col("doc_id"), col("feature"))
        .agg(count(lit(1)).as("tf"))
        .orderBy(col("doc_id"), col("feature"))
    }),

    // Smoothed mean target encoding of customer market segment against
    // order total price. The fact→dim join shuffles on the customer key
    // (Catalyst auto-broadcasts the dim projection when it fits); the
    // encoder itself is 5 rows — at serving time THAT is what gets
    // broadcast onto the scoring scan, never the fact table.
    "q_encode_target" -> ((s, dir) => {
      val j = Tables.orders(s, dir)
        .select(col("o_custkey"),
          col("o_totalprice").cast("decimal(18,2)").as("tp"))
        .join(Tables.customer(s, dir)
          .select(col("c_custkey"), col("c_mktsegment").as("segment")),
          col("o_custkey") === col("c_custkey"))
      val g = j.groupBy(col("segment"))
        .agg(count(lit(1)).as("cnt"), sum(col("tp")).as("s"))
      val p = g.agg(
        (sum(col("s")).cast("double") / sum(col("cnt"))).as("prior"))
      g.crossJoin(broadcast(p))
        .select(col("segment"), col("cnt"),
          round((col("s").cast("double") + lit(Smooth.toDouble) * col("prior"))
            / (col("cnt") + lit(Smooth)), 6).as("target_enc"),
          round(col("prior"), 6).as("prior"))
        .orderBy(col("segment"))
    }),

    // Population-stability-index drift monitor — the distribution-shift
    // alarm a training pipeline runs between a reference window and the
    // current window before trusting new data. Per event_type: decile
    // edges fitted on the REFERENCE half (time split at Jan 16), both
    // halves bucketed against those edges, PSI = Σ (p_cur − p_ref) ·
    // ln(p_cur / p_ref) with Laplace smoothing so an empty bucket stays
    // finite. Scale shape: the 9-edge-per-type table is a percentile
    // aggregate BROADCAST back onto the scan (the winsorize/z-score
    // shape); bucketing is a per-row HOF fold over the broadcast edge
    // array; everything after is (type × 10)-cardinality. Edges rounded
    // to 4 dp on both engines before comparison → integer bucket parity.
    "q_profile_drift" -> ((s, dir) => {
      val cutoff = lit("2024-01-16 00:00:00").cast("timestamp")
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("value").cast("double").as("v"),
          (col("ts") < cutoff).as("is_ref"))
      val qs = (1 to 9).map(i => s"0.${i}D").mkString(", ")
      val edges = ev.filter(col("is_ref"))
        .groupBy(col("event_type"))
        .agg(expr(s"transform(percentile(v, array($qs)), e -> round(e, 4))")
          .as("edges"))
      val bucketed = ev.join(broadcast(edges), Seq("event_type"))
        .withColumn("bucket",
          expr("aggregate(edges, 0, (acc, e) -> acc + IF(v > e, 1, 0))"))
        .groupBy(col("event_type"), col("bucket"))
        .agg(sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur"))
      val totals = bucketed.groupBy(col("event_type"))
        .agg(sum(col("n_ref")).as("t_ref"), sum(col("n_cur")).as("t_cur"))
      bucketed.join(broadcast(totals), Seq("event_type"))
        .select(col("event_type"), col("n_ref"), col("n_cur"),
          ((col("n_ref") + 1).cast("double") / (col("t_ref") + 10)).as("pr"),
          ((col("n_cur") + 1).cast("double") / (col("t_cur") + 10)).as("pc"))
        .groupBy(col("event_type"))
        .agg(sum(col("n_ref")).as("n_ref"), sum(col("n_cur")).as("n_cur"),
          round(sum((col("pc") - col("pr")) * log(col("pc") / col("pr"))), 6)
            .as("psi"))
        .orderBy(col("event_type"))
    }),

    // Curriculum ordering: the deterministic total training order a
    // curriculum-learning pipeline ships to the trainer — quality tiers
    // first (threshold-based, NOT quantile-based, so the tier label is a
    // pure scan-side projection with no global pass), md5-hash shuffle
    // within each tier (reproducible pseudo-randomness, the
    // [[graft.operators.Sampling]] convention), then a GLOBAL position +
    // round-robin shard id. The position comes from
    // [[graft.operators.GlobalRank]] — a no-partition row_number window
    // here would serialize the whole corpus through one task.
    "q_prep_curriculum" -> ((s, dir) => {
      val tiered = Tables.documents(s, dir)
        .select(col("doc_id"),
          when(col("n_chars") >= 350, "t1_long")
            .when(col("n_chars") >= 250, "t2_mid")
            .otherwise("t3_short").as("tier"),
          md5(col("doc_id").cast("string")).as("h"))
      graft.operators.GlobalRank
        .withGlobalRowNumber(
          tiered, Seq(col("tier"), col("h"), col("doc_id")), "pos")
        .select(col("doc_id"), col("tier"), col("pos"),
          ((col("pos") - 1) % 4).as("shard"))
        .orderBy(col("pos"))
    }),

    // Winsorization: clip the value column at the per-group [p05, p95]
    // and report raw vs clipped means — the outlier-robust normalization
    // a feature pipeline applies before scaling. Group thresholds are one
    // partial-aggregable percentile pass over the (low-cardinality)
    // group key, BROADCAST back onto the fact scan (the q_events_anomaly
    // shape) — the fact table is never re-shuffled. Thresholds are
    // rounded to 4 dp on BOTH engines before comparing, so a last-ulp
    // difference in percentile interpolation can never flip a row's
    // clipped/kept classification (integer count parity).
    "q_prep_winsorize" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"), col("value").cast("double").as("v"))
      val p = expr("percentile(v, array(0.05D, 0.95D))")
      val stats = ev.groupBy(col("event_type"))
        .agg(round(element_at(p, 1), 4).as("lo"),
          round(element_at(p, 2), 4).as("hi"))
      ev.join(broadcast(stats), Seq("event_type"))
        .withColumn("clipped",
          when(col("v") < col("lo"), col("lo"))
            .when(col("v") > col("hi"), col("hi"))
            .otherwise(col("v")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("v") < col("lo"), 1L).otherwise(0L)).as("n_clip_lo"),
          sum(when(col("v") > col("hi"), 1L).otherwise(0L)).as("n_clip_hi"),
          round(avg(col("v")), 6).as("mean_raw"),
          round(avg(col("clipped")), 6).as("mean_winsorized"),
          max(col("lo")).as("p05"), max(col("hi")).as("p95"))
        .orderBy(col("event_type"))
    }),

    // Temporal split audit: per-split × event-type row counts and time
    // bounds. The split label is a scan-side expression; downstream
    // pipelines filter on it, so each side stays a pushed-down predicate
    // over the same source — no materialized copy of the corpus.
    "q_sample_time_split" -> ((s, dir) =>
      Tables.events(s, dir)
        .withColumn("split",
          when(col("ts") < lit(Cutoff).cast("timestamp"), "train")
            .otherwise("test"))
        .groupBy(col("split"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          epochMs(min(col("ts"))).as("min_ms"),
          epochMs(max(col("ts"))).as("max_ms"))
        .orderBy(col("split"), col("event_type")))
  ,

    // Leakage-safe training matrix: per-user features computed ONLY from
    // pre-cutoff events, label ONLY from the post-cutoff window — the
    // temporal hygiene that keeps a trained model from seeing its own
    // future (the feature-store point-in-time contract, batch form).
    // ONE conditional-aggregation scan builds both sides: every feature
    // and the label are `when(ts < cutoff …)` branches of the same
    // groupBy, so adding a feature never adds a scan or a join, and the
    // cutoff is a constant the scan can prune on.
    "q_prep_leakage_safe" -> ((s, dir) => {
      val cut = lit(Cutoff).cast("timestamp")
      Tables.events(s, dir)
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("ts") < cut && col("event_type") === "click", 1L)
            .otherwise(0L)).as("f_clicks"),
          sum(when(col("ts") < cut && col("event_type") === "view", 1L)
            .otherwise(0L)).as("f_views"),
          round(sum(when(col("ts") < cut, col("value"))
            .otherwise(lit(0.0))), 6).as("f_value"),
          max(when(col("ts") >= cut && col("event_type") === "purchase", 1)
            .otherwise(0)).as("label"))
        .orderBy(col("user_id"))
    }))

  override def oracleSql: Map[String, String] = Map(
    "q_feature_hashing" ->
      s"""WITH toks AS (
         |  SELECT doc_id, unnest(string_split(
         |    lower(regexp_replace(trim(text), '\\s+', ' ', 'g')), ' ')) AS tok
         |  FROM documents WHERE doc_id % 5 = 0)
         |SELECT doc_id,
         |  CAST((('0x' || substring(md5(tok), 1, 8))::BIGINT % $HashDim)
         |    AS INT) AS feature,
         |  COUNT(*) AS tf
         |FROM toks WHERE length(tok) > 0
         |GROUP BY doc_id, feature
         |ORDER BY doc_id, feature""".stripMargin,

    "q_encode_target" ->
      s"""WITH j AS (
         |  SELECT c.c_mktsegment AS segment,
         |    CAST(o.o_totalprice AS DECIMAL(18,2)) AS tp
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
         |g AS (
         |  SELECT segment, COUNT(*) AS cnt, SUM(tp) AS s
         |  FROM j GROUP BY segment),
         |p AS (SELECT CAST(SUM(s) AS DOUBLE) / SUM(cnt) AS prior FROM g)
         |SELECT segment, cnt,
         |  round((CAST(s AS DOUBLE) + $Smooth.0 * prior) / (cnt + $Smooth), 6)
         |    AS target_enc,
         |  round(prior, 6) AS prior
         |FROM g, p ORDER BY segment""".stripMargin,

    "q_profile_drift" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(value AS DOUBLE) AS v,
        |    ts < TIMESTAMP '2024-01-16 00:00:00' AS is_ref
        |  FROM events),
        |edges AS (
        |  SELECT event_type,
        |    [round(e, 4) for e in quantile_cont(v,
        |      [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])] AS edges
        |  FROM ev WHERE is_ref GROUP BY event_type),
        |bucketed AS (
        |  SELECT ev.event_type,
        |    len(list_filter(ed.edges, x -> ev.v > x)) AS bucket,
        |    CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS n_ref,
        |    CAST(SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_cur
        |  FROM ev JOIN edges ed ON ev.event_type = ed.event_type
        |  GROUP BY 1, 2),
        |totals AS (
        |  SELECT event_type, SUM(n_ref) AS t_ref, SUM(n_cur) AS t_cur
        |  FROM bucketed GROUP BY 1),
        |frac AS (
        |  SELECT b.event_type, n_ref, n_cur,
        |    (n_ref + 1)::DOUBLE / (t_ref + 10) AS pr,
        |    (n_cur + 1)::DOUBLE / (t_cur + 10) AS pc
        |  FROM bucketed b JOIN totals t ON b.event_type = t.event_type)
        |SELECT event_type, CAST(SUM(n_ref) AS BIGINT) AS n_ref,
        |  CAST(SUM(n_cur) AS BIGINT) AS n_cur,
        |  round(SUM((pc - pr) * ln(pc / pr)), 6) AS psi
        |FROM frac GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_prep_winsorize" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(value AS DOUBLE) AS v FROM events),
        |stats AS (
        |  SELECT event_type,
        |    round(quantile_cont(v, 0.05), 4) AS lo,
        |    round(quantile_cont(v, 0.95), 4) AS hi
        |  FROM ev GROUP BY event_type)
        |SELECT e.event_type, COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN v < lo THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_lo,
        |  CAST(SUM(CASE WHEN v > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clip_hi,
        |  round(AVG(v), 6) AS mean_raw,
        |  round(AVG(CASE WHEN v < lo THEN lo WHEN v > hi THEN hi ELSE v END),
        |    6) AS mean_winsorized,
        |  MAX(lo) AS p05, MAX(hi) AS p95
        |FROM ev e JOIN stats s ON e.event_type = s.event_type
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "q_sample_time_split" ->
      s"""SELECT
         |  CASE WHEN ts < TIMESTAMP '$Cutoff' THEN 'train' ELSE 'test' END
         |    AS split,
         |  event_type, COUNT(*) AS n,
         |  epoch_ms(min(ts)) AS min_ms, epoch_ms(max(ts)) AS max_ms
         |FROM events
         |GROUP BY split, event_type
         |ORDER BY split, event_type""".stripMargin,

    "q_prep_leakage_safe" ->
      s"""SELECT user_id,
         |  COUNT(*) FILTER (WHERE ts < TIMESTAMP '$Cutoff'
         |    AND event_type = 'click')::BIGINT AS f_clicks,
         |  COUNT(*) FILTER (WHERE ts < TIMESTAMP '$Cutoff'
         |    AND event_type = 'view')::BIGINT AS f_views,
         |  round(SUM(CASE WHEN ts < TIMESTAMP '$Cutoff' THEN value
         |    ELSE 0.0 END), 6) AS f_value,
         |  MAX(CASE WHEN ts >= TIMESTAMP '$Cutoff'
         |    AND event_type = 'purchase' THEN 1 ELSE 0 END) AS label
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_prep_curriculum" ->
      """WITH tiered AS (
        |  SELECT doc_id,
        |    CASE WHEN n_chars >= 350 THEN 't1_long'
        |         WHEN n_chars >= 250 THEN 't2_mid'
        |         ELSE 't3_short' END AS tier,
        |    md5(CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents)
        |SELECT doc_id, tier,
        |  row_number() OVER (ORDER BY tier, h, doc_id) AS pos,
        |  (row_number() OVER (ORDER BY tier, h, doc_id) - 1) % 4 AS shard
        |FROM tiered ORDER BY pos""".stripMargin
  )
}
