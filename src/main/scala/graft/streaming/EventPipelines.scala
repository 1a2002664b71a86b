package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode,
  TimerValues, ValueState}

import graft.functions.GraftFunctions._

/** SURVEY §2.11 — Structured Streaming over the `events` table.
  *
  * The reference is batch-only but requires streaming sync ("spatial
  * system emits events", `etl-notes.md:9`) with resumable/idempotent
  * processing (the tri-state `qrt_found` flag,
  * `etl_lalf_road_qrt_spatial_match.py:96-112`). The Spark shape: one
  * transform defined on `DataFrame`, applied unchanged to a batch read or
  * a `readStream` — watermarks are no-ops in batch, so the BATCH TWIN of
  * every streaming pipeline is oracle-checkable while the streaming run
  * is covered by MemoryStream tests (StreamingSpec).
  *
  * Scale: windowed aggregation state is keyed by (window, event_type) —
  * bounded by watermark horizon × key cardinality; dedup state by event_id
  * within the watermark, the streaming twin of the reference's
  * idempotency flag.
  */
object EventPipelines {

  /** Tumbling 1-day windows per event_type with a 10-minute watermark:
    * count + exact-decimal value sum (cross-engine money math). */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        asMoney(sum(dec2(col("value")))).as("sum_value"))
      .select(epochMs(col("w.start")).as("window_ms"), col("event_type"),
        col("n"), col("sum_value"))

  /** HOPPING (sliding) windows — 2-day windows advancing by 1 day, so
    * every event lands in exactly two overlapping windows. The streaming
    * state story is the same as tumbling (state keyed by
    * (window, event_type), expired by the watermark) but each event
    * updates window-size/slide = 2 states; the batch twin is the same
    * plan with the watermark a no-op. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "2 days", "1 day").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(epochMs(col("w.start")).as("window_ms"), col("event_type"),
        col("n"))

  /** Top-k event types per tumbling window by count — the trending-items
    * view over the stream. Ranking over an aggregate isn't expressible
    * MID-stream (no window functions on a streaming agg), so the
    * streaming form applies this to each [[windowedCounts]] micro-batch
    * output via `foreachBatch` (StreamingSpec drives exactly that); in
    * batch it's the direct plan. Scale: the rank runs over the
    * (window × event_type)-cardinality AGGREGATE, never the event
    * stream, and the literal rank filter compiles to WindowGroupLimit. */
  def topKPerWindow(events: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_ms"))
      .orderBy(col("n").desc, col("event_type"))
    windowedCounts(events)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("window_ms"), col("rnk"), col("event_type"), col("n"))
  }

  /** Streaming dedup by event_id bounded by the watermark. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch twin of [[dedupStream]]: exact dedup on the full row (the
    * duplicates a replay produces are identical rows, so the survivor is
    * deterministic). */
  def dedupBatch(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id", "ts", "user_id", "event_type")

  /** Stream-static enrichment: each event joins the slowly-changing
    * customer dimension. Under `readStream` Spark re-plans the static
    * side per micro-batch as a broadcast hash join — the canonical
    * "decorate the stream with reference data" pattern, stateless (no
    * watermark) because the dimension is bounded. `dim` must carry
    * `c_custkey` + the decoration columns; unmatched events keep NULLs
    * (left join — a monitor must see events from unknown users, not
    * silently drop them). */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), events("user_id") === dim("c_custkey"),
      "left")

  /** Idempotent (exactly-once) foreachBatch parquet sink (r11, VERDICT
    * r10 stretch #9): Structured Streaming guarantees foreachBatch
    * AT-LEAST-once — after a failure the SAME batch id replays with the
    * same data, so a plain `mode("append")` writer duplicates rows.
    * Exactly-once = at-least-once + idempotent writes: the output
    * partitions BY BATCH ID and each write DYNAMICALLY overwrites only
    * its own batch partition, so a replay rewrites byte-equivalent
    * files in place instead of appending. This is the reference's
    * `qrt_found` resumability contract under FAILURE, not just the
    * happy path (`etl_lalf_road_qrt_spatial_match.py:96-112`: re-runs
    * must not double-apply work). At 100 TB the overwrite touches one
    * batch directory — cost ∝ batch, not output history. */
  def writeBatchIdempotent(batch: DataFrame, out: String,
      batchId: Long): Unit =
    batch.withColumn("_batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("_batch_id")
      .parquet(out)

  /** Arbitrary-state incremental enrichment — the streaming twin of the
    * reference's resumable tri-state `qrt_found` flag
    * (`etl_lalf_road_qrt_spatial_match.py:96-112`): every event gets the
    * user's running sequence number, state persisted across micro-batches
    * via `flatMapGroupsWithState`. */
  def enrichWithSeq(events: DataFrame): Dataset[(Long, String, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"),
        col("event_id").cast("string"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, String)], state: GroupState[Long]) =>
          var seq = state.getOption.getOrElse(0L)
          val out = rows.map { case (_, eid) =>
            seq += 1
            (uid, eid, seq)
          }.toList // materialize before updating state
          state.update(seq)
          out.iterator
      }
  }

  /** [[enrichWithSeq]] on the `transformWithState` API (Spark 4's
    * arbitrary-state surface, the successor to flatMapGroupsWithState):
    * typed `ValueState` via a `StatefulProcessor`, TTL-capable, backed by
    * the RocksDB state store — the API to reach for when per-key state
    * outgrows the in-memory HDFS-backed store (exactly the 100 TB keyed-
    * state regime: state lives off-heap/on-disk per partition, snapshots
    * ship incrementally to the checkpoint). Semantics are identical to
    * enrichWithSeq — StreamingSpec proves both produce the same sequence
    * numbers across micro-batches.
    */
  class UserSeqProcessor
      extends StatefulProcessor[Long, (Long, String), (Long, String, Long)] {
    @transient private var seq: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seq = getHandle.getValueState[Long]("seq", Encoders.scalaLong,
        TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[(Long, String)],
        tv: TimerValues): Iterator[(Long, String, Long)] = {
      var c = if (seq.exists()) seq.get() else 0L
      val out = rows.map { case (_, eid) =>
        c += 1
        (uid, eid, c)
      }.toList // materialize before the state write
      seq.update(c)
      out.iterator
    }
  }

  def enrichWithSeqTws(events: DataFrame): Dataset[(Long, String, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"),
        col("event_id").cast("string"))
      .as[(Long, String)]
      .groupByKey(_._1)
      .transformWithState(new UserSeqProcessor,
        TimeMode.None(), OutputMode.Append())
  }

  /** Gap-based sessionization with EVENT-TIME TIMERS — the shape the
    * GroupStateTimeout API could only approximate: each user's session
    * keeps one registered timer at `last event + gap`, re-armed on every
    * arrival, and the session summary is emitted by [[StatefulProcessor
    * .handleExpiredTimer]] exactly when the WATERMARK passes that
    * instant — closure is driven by event-time progress, not by which
    * micro-batch happened to see data. State per live session is one
    * (start, last, count) triple + one timer; both clear on emission,
    * so state is bounded by concurrent live sessions. */
  class SessionTimerProcessor(gapMs: Long)
      extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long, Long)] {
    @transient private var st: ValueState[(Long, Long, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)]("sess",
        Encoders.product[(Long, Long, Long)], TTLConfig.NONE)
    override def handleInputRows(uid: Long, rows: Iterator[(Long, Long)],
        tv: TimerValues): Iterator[(Long, Long, Long, Long)] = {
      var (s0, s1, n) =
        if (st.exists()) st.get() else (Long.MaxValue, Long.MinValue, 0L)
      rows.foreach { case (_, ms) =>
        s0 = math.min(s0, ms); s1 = math.max(s1, ms); n += 1
      }
      st.update((s0, s1, n))
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(s1 + gapMs) // re-arm the close timer
      Iterator.empty
    }
    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long)] = {
      val out =
        if (st.exists()) {
          val (s0, s1, n) = st.get()
          Iterator((uid, s0, s1, n))
        } else Iterator.empty
      st.clear()
      out
    }
  }

  /** (user_id, session_start_ms, session_end_ms, n_events) — emitted only
    * when the watermark closes the session. */
  def sessionsWithTimers(events: DataFrame, gapMs: Long,
      watermark: String = "10 minutes"): Dataset[(Long, Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id").cast("long"),
        unix_millis(col("ts").cast("timestamp")))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Stream-stream INTERVAL join — purchase-to-view attribution: each
    * purchase joins the same user's views from the preceding 30 minutes.
    * Under `readStream` this is Spark's canonical stream-stream join:
    * both sides carry watermarks and the two-sided time bound makes the
    * join state expirable (views older than purchase-watermark − 30 min
    * are dropped), so state is bounded by rate × horizon — the only
    * stream-stream join shape that survives unbounded inputs. In batch
    * the watermarks are no-ops and it is a plain equi-join on user_id
    * with the time band as a residual — one key shuffle per side.
    */
  def attributeViews(views: DataFrame, purchases: DataFrame): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("user_id").as("v_user"))
      .withWatermark("view_ts", "10 minutes")
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id"))
      .withWatermark("purchase_ts", "10 minutes")
    p.join(v,
        col("user_id") === col("v_user") &&
          col("view_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES") &&
          col("view_ts") <= col("purchase_ts"))
      .select(col("user_id"), col("purchase_id"), col("view_id"),
        epochMs(col("purchase_ts")).as("purchase_ms"),
        epochMs(col("view_ts")).as("view_ms"))
  }

  /** LEFT OUTER stream-stream interval join — attribution INCLUDING the
    * misses: a purchase with no qualifying view in its 30-minute
    * lookback emits a null-extended row. Under `readStream` Spark
    * requires exactly this shape for outer stream-stream joins (both
    * watermarks + a two-sided event-time bound): the null side of a
    * purchase can only be decided once the VIEW watermark passes
    * `purchase_ts` — no earlier view can still arrive — so unmatched
    * rows surface when both watermarks advance, and state stays bounded
    * as in [[attributeViews]]. In batch the same plan is a plain left
    * outer equi-join on user with the time band as a residual. */
  def attributeViewsOuter(views: DataFrame,
      purchases: DataFrame): DataFrame = {
    val v = views
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
        col("user_id").as("v_user"))
      .withWatermark("view_ts", "10 minutes")
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("ts").as("purchase_ts"),
        col("user_id"))
      .withWatermark("purchase_ts", "10 minutes")
    p.join(v,
        col("user_id") === col("v_user") &&
          col("view_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES") &&
          col("view_ts") <= col("purchase_ts"),
        "left_outer")
      .select(col("user_id"), col("purchase_id"),
        // nulls normalized to -1: cross-engine null ORDERING diverges
        // (Spark ASC = nulls first, DuckDB = NULLS LAST), and the gate
        // sorts on these columns
        coalesce(col("view_id"), lit(-1L)).as("view_id"),
        epochMs(col("purchase_ts")).as("purchase_ms"),
        coalesce(epochMs(col("view_ts")), lit(-1L)).as("view_ms"))
  }

  /** 30-minute-gap session windows per user: start, end, event count,
    * exact value sum. */
  def sessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"),
        col("user_id"))
      .agg(count(lit(1)).as("n"),
        asMoney(sum(dec2(col("value")))).as("sum_value"))
      .select(col("user_id"),
        epochMs(col("sw.start")).as("session_start_ms"),
        epochMs(col("sw.end")).as("session_end_ms"),
        col("n"), col("sum_value"))

  /** A flagged event from [[onlineAnomalies]]. */
  case class AnomalyFlag(event_id: Long, event_type: String, value: Double,
    z: Double)

  /** ONLINE anomaly detection — the streaming twin of the batch z-score
    * queries: per event_type, O(1) running (count, mean, M2) Welford
    * state in `flatMapGroupsWithState`; an event is flagged against the
    * statistics of its PREDECESSORS only (no lookahead — what a monitor
    * on a live stream can actually know), then folded into the state.
    * State is three doubles per key regardless of stream length — the
    * canonical bounded-state shape.
    *
    * Determinism: rows are folded in (ms, event_id) order within each
    * group/micro-batch, so the batch run replays exactly and a
    * time-split micro-batch sequence reaches the same flags
    * (StreamingSpec). z is rounded to 6 dp with Spark's own
    * BigDecimal.valueOf HALF_UP (identical to SQL `round(z, 6)`), and
    * the threshold compares the ROUNDED value — the DuckDB oracle
    * replays the prefix stats with window frames. */
  def onlineAnomalies(events: DataFrame, minCount: Int = 30,
      zThresh: Double = 3.0): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("event_type"), col("event_id").cast("long"),
        epochMs(col("ts")).as("ms"), col("value").cast("double"))
      .as[(String, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[(String, Long, Long, Double)],
            state: GroupState[(Long, Double, Double)]) =>
          var (n, mean, m2) = state.getOption.getOrElse((0L, 0.0, 0.0))
          val out = scala.collection.mutable.ListBuffer[AnomalyFlag]()
          rows.toArray.sortBy(r => (r._3, r._2)).foreach {
            case (_, eid, _, x) =>
              if (n >= minCount) {
                val sd = math.sqrt(m2 / (n - 1))
                if (sd > 0) {
                  val z = java.math.BigDecimal.valueOf((x - mean) / sd)
                    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
                  if (math.abs(z) >= zThresh)
                    out += AnomalyFlag(eid, etype, x, z)
                }
              }
              n += 1
              val d = x - mean
              mean += d / n
              m2 += d * (x - mean)
          }
          state.update((n, mean, m2))
          out.iterator
      }.toDF()
  }
}
