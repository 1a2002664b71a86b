package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
}
