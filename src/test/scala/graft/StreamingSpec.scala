package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventPipelines

/** SURVEY §2.11 — the genuinely-streaming half of the pipelines whose
  * batch twins are oracle-checked in StreamingQueries: MemoryStream in,
  * memory sink out, processAllAvailable for determinism.
  */
class StreamingSpec extends AnyFunSuite with SparkTestBase {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowed aggregation runs on a stream with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventPipelines.windowedCounts(events)
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Complete).start()
    try {
      in.addData((ts(0), 1L, "view", 1.5), (ts(5), 1L, "view", 2.5),
        (ts(10), 2L, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .orderBy("event_type").collect()
      assert(rows.length == 2)
      assert(rows.map(_.getAs[Long]("n")).toSeq == Seq(1L, 2L))
      assert(rows(1).getAs[Double]("sum_value") == 4.0)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark collapses replayed event ids") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, String)]
    val events = in.toDF().toDF("ts", "event_id", "event_type")
    val q = EventPipelines.dedupStream(events)
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((ts(0), "e1", "view"), (ts(0), "e1", "view"),
        (ts(1), "e2", "click"), (ts(1), "e2", "click"), (ts(2), "e3", "view"))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 3)
    } finally q.stop()
  }

  test("session windows merge events within the 30-minute gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, Double)]
    val events = in.toDF().toDF("ts", "user_id", "value")
    val q = EventPipelines.sessions(events)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Complete).start()
    try {
      // user 1: 10:00 and 10:10 merge; 10:55 (gap 45 min) is a new session.
      in.addData((ts(0), 1L, 1.0), (ts(10), 1L, 2.0), (ts(55), 1L, 4.0))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .orderBy("session_start_ms").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Long]("n") == 2)
      assert(rows(0).getAs[Double]("sum_value") == 3.0)
      assert(rows(1).getAs[Long]("n") == 1)
    } finally q.stop()
  }
}
