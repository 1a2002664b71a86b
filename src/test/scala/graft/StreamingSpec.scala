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

  test("stream-static join enriches events with the parquet dimension") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("ts", "user_id", "event_type", "value")
    val q = EventPipelines.enrichWithDim(events, dim)
      .select(col("user_id"), col("event_type"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"))
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1 exists in the dimension; user -5 cannot
      in.addData((ts(0), 1L, "view", 1.0), (ts(1), -5L, "view", 2.0))
      q.processAllAvailable()
      in.addData((ts(2), 2L, "click", 3.0)) // second micro-batch re-joins
      q.processAllAvailable()
      val rows = spark.table("enrich_out").orderBy("user_id").collect()
      assert(rows.length == 3)
      val bySeg = rows.map(r => r.getLong(0) -> r.getString(2)).toMap
      assert(bySeg(-5L) == "UNKNOWN", "unknown user must survive as UNKNOWN")
      val expected = dim.filter(col("c_custkey").isin(1L, 2L))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(bySeg(1L) == expected(1L) && bySeg(2L) == expected(2L),
        "streamed enrichment diverged from the static dimension")
    } finally q.stop()
  }

  test("N-Quads parser runs unchanged on a stream (stateless column exprs)") {
    // the RDF text source composes with readStream for free: the parse
    // is a stateless projection/filter (one native regex pass per line),
    // so a streaming N-Quads ingest is the same code path as batch.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = graft.rdf.QuadParser.parse(in.toDF().toDF("value"))
      .writeStream.format("memory").queryName("nq_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(
        "<urn:s> <urn:p> \"v\"@en <urn:g> .",
        "# comment",
        "_:b <urn:p> <urn:o> .",
        "malformed line")
      q.processAllAvailable()
      val rows = spark.table("nq_out").orderBy("subject").collect()
      assert(rows.length == 2)
      assert(rows.map(_.getString(0)).toSeq == Seq("b", "urn:s"))
      assert(rows(1).getString(6) == "en")
    } finally q.stop()
  }

  test("stream-stream interval join attributes purchases to recent views") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[(Timestamp, String, Long)]
    val purchases = MemoryStream[(Timestamp, String, Long)]
    val q = EventPipelines.attributeViews(
        views.toDF().toDF("ts", "event_id", "user_id"),
        purchases.toDF().toDF("ts", "event_id", "user_id"))
      .writeStream.format("memory").queryName("attr_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: one view inside the 30-min window, one outside (45 min
      // before); user 2: view AFTER the purchase — never attributed.
      views.addData((ts(0), "v_old", 1L), (ts(45), "v_in", 1L),
        (ts(50), "v_late", 2L))
      purchases.addData((ts(59), "p1", 1L), (ts(30), "p2", 2L))
      q.processAllAvailable()
      val rows = spark.table("attr_out").collect()
      assert(rows.map(r => (r.getAs[String]("purchase_id"),
        r.getAs[String]("view_id"))).toSet == Set(("p1", "v_in")))
    } finally q.stop()
  }

  test("outer stream-stream join emits unmatched purchases only after " +
      "the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def m(min: Int) = new Timestamp(1704103200000L + min * 60000L)
    val views = MemoryStream[(Timestamp, Long, Long)]
    val purchases = MemoryStream[(Timestamp, Long, Long)]
    val q = EventPipelines.attributeViewsOuter(
        views.toDF().toDF("ts", "event_id", "user_id"),
        purchases.toDF().toDF("ts", "event_id", "user_id"))
      .writeStream.format("memory").queryName("attr_outer_out")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1's purchase has a view 10 min back → attributed in-batch;
      // user 2's purchase has NO view — its null row is only decidable
      // once the VIEW watermark passes the purchase time (no earlier
      // view can still arrive), so it must NOT surface yet
      views.addData((m(50), 101L, 1L))
      purchases.addData((m(60), 201L, 1L), (m(60), 202L, 2L))
      q.processAllAvailable()
      val early = spark.table("attr_outer_out").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(early == Set(201L -> 101L),
        s"wrong pre-watermark emission: $early")
      // flush both sides an hour ahead → both watermarks pass m(60)
      views.addData((m(120), 900L, 99L))
      purchases.addData((m(120), 901L, 99L))
      q.processAllAvailable()
      val late = spark.table("attr_outer_out").collect()
        .map(r => (r.getLong(1), r.getLong(2))).toSet
      assert(late.contains(202L -> -1L),
        s"unmatched purchase never emitted: $late")
      assert(late.contains(201L -> 101L))
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

  test("flatMapGroupsWithState keeps per-user sequence across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val events = in.toDF().toDF("user_id", "event_id")
    val q = EventPipelines.enrichWithSeq(events)
      .toDF("user_id", "event_id", "seq")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, "a"), (1L, "b"), (2L, "x"))
      q.processAllAvailable()
      in.addData((1L, "c"), (2L, "y")) // second batch: state must carry over
      q.processAllAvailable()
      val rows = spark.table("enrich_out")
        .orderBy("user_id", "seq").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      assert(rows.filter(_._1 == 1L).map(_._3).toSeq == Seq(1L, 2L, 3L))
      assert(rows.find(r => r._1 == 1L && r._2 == "c").get._3 == 3L)
      assert(rows.filter(_._1 == 2L).map(_._3).toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("transformWithState matches flatMapGroupsWithState across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the new API requires the RocksDB state store — per-query conf,
    // restored so sibling streaming tests keep the default store
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Long, String)]
    val events = in.toDF().toDF("user_id", "event_id")
    val q = EventPipelines.enrichWithSeqTws(events)
      .toDF("user_id", "event_id", "seq")
      .writeStream.format("memory").queryName("tws_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData((1L, "a"), (1L, "b"), (2L, "x"))
      q.processAllAvailable()
      in.addData((1L, "c"), (2L, "y")) // ValueState must carry over
      q.processAllAvailable()
      val rows = spark.table("tws_out")
        .orderBy("user_id", "seq").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      // same contract the flatMapGroupsWithState test asserts
      assert(rows.filter(_._1 == 1L).map(_._3).toSeq == Seq(1L, 2L, 3L))
      assert(rows.find(r => r._1 == 1L && r._2 == "c").get._3 == 3L)
      assert(rows.filter(_._1 == 2L).map(_._3).toSeq == Seq(1L, 2L))
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("event-time timers close sessions when the watermark passes the gap") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val in = MemoryStream[(Timestamp, Long)]
    val events = in.toDF().toDF("ts", "user_id")
    val q = EventPipelines
      .sessionsWithTimers(events, gapMs = 30 * 60 * 1000L,
        watermark = "1 minute")
      .toDF("user_id", "start_ms", "end_ms", "n_events")
      .writeStream.format("memory").queryName("timer_sessions")
      .outputMode(OutputMode.Append).start()
    try {
      // user 1: two events 5 min apart → ONE session
      in.addData((ts(0), 1L), (new Timestamp(ts(0).getTime + 300000L), 1L))
      q.processAllAvailable()
      assert(spark.table("timer_sessions").count() == 0,
        "session closed before the watermark reached start+gap")
      // a much later event advances the watermark past user 1's gap;
      // the timer fires in the FOLLOWING micro-batch
      in.addData((new Timestamp(ts(0).getTime + 7200000L), 2L))
      q.processAllAvailable()
      in.addData((new Timestamp(ts(0).getTime + 7260000L), 2L))
      q.processAllAvailable()
      val rows = spark.table("timer_sessions").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.toSeq == Seq(
        (1L, ts(0).getTime, ts(0).getTime + 300000L, 2L)),
        s"expected exactly user 1's closed session, got ${rows.toSeq}")
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("foreachBatch applies streaming CDC batches to a JDBC target via MERGE") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the serving-database apply loop: each micro-batch MERGEs into the
    // warehouse table — latest-wins per key within the batch, upsert
    // against the store — so replays/duplicates cannot double-apply
    val url = "jdbc:derby:memory:graftcdc;create=true"
    val in = MemoryStream[(Long, String, Long)] // (key, value, seq)
    val q = in.toDF().toDF("k", "v", "seq").writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val s = batch.sparkSession
        import org.apache.spark.sql.expressions.Window
        // collapse the batch to one row per key (highest seq wins)
        val latest = batch
          .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
            Window.partitionBy(col("k")).orderBy(col("seq").desc)))
          .filter(col("rn") === 1).drop("rn", "seq")
        val target =
          try graft.sources.Sources.readJdbcTable(s, url, "CDC_TGT")
            .select(col("k"), col("v"))
          catch { case _: Exception => // first batch: table not yet created
            Seq.empty[(Long, String)].toDF("k", "v")
          }
        val next = graft.operators.Merge.upsert(target, latest, "k")
          .select(col("k"), col("v"))
          // materialize BEFORE the overwrite: the merge result lazily
          // reads the very table the write truncates (a real pipeline
          // MERGEs in-database or stages + swaps; the eager checkpoint
          // is the test-scale stand-in for that write barrier)
          .localCheckpoint(true)
        graft.sources.Sources.writeJdbc(next, url, "CDC_TGT")
      }
      .start()
    try {
      in.addData((1L, "a1", 1L), (2L, "b1", 2L), (1L, "a2", 3L))
      q.processAllAvailable()
      in.addData((2L, "b2", 4L), (3L, "c1", 5L))
      q.processAllAvailable()
      in.addData((2L, "b2", 4L)) // replayed duplicate must be a no-op
      q.processAllAvailable()
      val rows = graft.sources.Sources.readJdbcTable(spark, url, "CDC_TGT")
        .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.toSeq == Seq((1L, "a2"), (2L, "b2"), (3L, "c1")))
    } finally q.stop()
  }

  test("foreachBatch streams events into the N-Quads parquet sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_io/stream_quads"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val in = MemoryStream[(Timestamp, String, String)]
    val events = in.toDF().toDF("ts", "event_id", "event_type")
    val q = events.writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val quads = graft.rdf.QuadEmitter.explodeQuads(
          batch,
          concat(lit("https://example.org/event/"), col("event_id")),
          graft.model.Graphs.Addresses,
          Seq(graft.rdf.Emit.literal("https://schema.org/name",
            col("event_type"))))
        quads.write.mode("append").parquet(out)
      }
      .start()
    try {
      in.addData((ts(0), "e1", "view"), (ts(1), "e2", "click"))
      q.processAllAvailable()
      in.addData((ts(2), "e3", "view"))
      q.processAllAvailable()
      val back = spark.read.parquet(out)
      assert(back.count() == 3)
      assert(back.select("predicate").distinct().count() == 1)
    } finally q.stop()
  }

  test("streaming store maintenance: upsertBatch applies micro-batch " +
      "deltas subject-level; a replayed batch is absorbed") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val store =
      s"${System.getProperty("java.io.tmpdir")}/graft_io/upsert_stream"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    def toQuads(df: org.apache.spark.sql.DataFrame) =
      df.select(col("s").as("subject"), lit("iri").as("subjectKind"),
        lit("urn:p").as("predicate"), col("v").as("objectValue"),
        lit("literal").as("objectKind"),
        lit(null).cast("string").as("datatype"),
        lit(null).cast("string").as("lang"),
        lit("urn:g").as("graph"))
    graft.rdf.QuadStore.write(
      toQuads(Seq(("s1", "a"), ("s2", "b"), ("s3", "c")).toDF("s", "v")),
      store)
    var replayed = false
    val in = MemoryStream[(String, String)]
    val q = in.toDF().toDF("s", "v").writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.rdf.QuadStore.upsertBatch(store)(toQuads(batch), id)
        if (id == 1L && !replayed) {
          replayed = true // at-least-once: deliver batch 1 twice
          graft.rdf.QuadStore.upsertBatch(store)(toQuads(batch), id)
        }
      }
      .start()
    try {
      in.addData(("s2", "b2"))
      q.processAllAvailable()
      in.addData(("s2", "b3"), ("s4", "d")) // batch 1 — replayed
      q.processAllAvailable()
      assert(replayed, "the batch-1 retry did not fire")
      val back = graft.rdf.QuadStore.open(spark, store)
        .select(col("subject"), col("objectValue"))
        .as[(String, String)].collect().toSet
      // subject-level replace is absorbing: the replay changed nothing
      assert(back == Set(("s1", "a"), ("s2", "b3"), ("s3", "c"),
        ("s4", "d")))
      // the stats sidecar tracked the arithmetic (4 quads of urn:p)
      val stats = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(store, "_quadstats.tsv"))
      // r15 sidecar format: count<TAB>flag<TAB>predicate, upsert-touched
      // predicates conservatively flagged d
      assert(stats.size() == 1 && stats.get(0) == "4\td\turn:p", stats)
    } finally q.stop()
  }

  test("exactly-once under retry: a replayed batch id rewrites, never " +
      "duplicates (N-Quads sink)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_io/eo_quads"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    def toQuads(batch: org.apache.spark.sql.DataFrame) =
      graft.rdf.QuadEmitter.explodeQuads(
        batch,
        concat(lit("https://example.org/event/"), col("event_id")),
        graft.model.Graphs.Addresses,
        Seq(graft.rdf.Emit.literal("https://schema.org/name",
          col("event_type"))))
    // failure injection: the first delivery of batch 1 REPLAYS —
    // foreachBatch is at-least-once, so the sink sees the same
    // (batch, batchId) twice, exactly what a post-write pre-commit
    // crash produces
    var replayed = false
    val in = MemoryStream[(Timestamp, String, String)]
    val q = in.toDF().toDF("ts", "event_id", "event_type").writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.streaming.EventPipelines
          .writeBatchIdempotent(toQuads(batch), out, id)
        if (id == 1L && !replayed) {
          replayed = true
          graft.streaming.EventPipelines
            .writeBatchIdempotent(toQuads(batch), out, id)
        }
      }
      .start()
    try {
      in.addData((ts(0), "e1", "view"), (ts(1), "e2", "click"))
      q.processAllAvailable()
      in.addData((ts(2), "e3", "view"))
      q.processAllAvailable()
      assert(replayed, "the batch-1 retry did not fire")
      val back = spark.read.parquet(out)
      // at-least-once delivery, exactly-once OUTPUT: 3 events, no dupes
      assert(back.count() == 3)
      assert(back.select("subject").distinct().count() == 3)
      // and a non-idempotent append sink WOULD have duplicated — pin
      // the contrast so the test can't pass vacuously
      val naive = out + "_naive"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(naive))
      val b = Seq((ts(2), "e3", "view")).toDF("ts", "event_id", "event_type")
      toQuads(b).write.mode("append").parquet(naive)
      toQuads(b).write.mode("append").parquet(naive) // the same "retry"
      assert(spark.read.parquet(naive).count() == 2)
    } finally q.stop()
  }

  test("foreachBatch CDC apply: per-batch Merge.upsert converges to the sequential state") {
    // The streaming half of q_merge_upsert: each micro-batch of change
    // records MERGEs into a parquet target (read → upsert → atomic dir
    // swap), so the stream materializes "current state" continuously —
    // the lakehouse CDC-apply loop, minus a table format's transaction
    // log. Two batches with an overlapping key prove last-writer-wins
    // across batches, an insert, and a delete.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_io/cdc_target"
    val tgtDir = new java.io.File(base)
    org.apache.commons.io.FileUtils.deleteQuietly(tgtDir)
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("key", "name", "bal")
      .write.mode("overwrite").parquet(base)
    val in = MemoryStream[(Long, String, Double, Boolean)]
    val q = in.toDF().toDF("key", "name", "bal", "del").writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val next = graft.operators.Merge.upsert(
            spark.read.parquet(base), batch, "key",
            deleteFlag = Some("del"))
          .drop("action")
        val tmp = new java.io.File(base + "_next")
        next.write.mode("overwrite").parquet(tmp.getPath)
        org.apache.commons.io.FileUtils.deleteDirectory(tgtDir)
        org.apache.commons.io.FileUtils.moveDirectory(tmp, tgtDir)
      }
      .start()
    try {
      in.addData((2L, "b2", 25.0, false), (3L, "c", 30.0, false))
      q.processAllAvailable()
      in.addData((1L, "a", 10.0, true), (3L, "c2", 35.0, false))
      q.processAllAvailable()
      val got = spark.read.parquet(base)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .toSet
      assert(got == Set((2L, "b2", 25.0), (3L, "c2", 35.0)), got.toString)
    } finally q.stop()
  }

  test("streaming near-dup dedup against a growing band index " +
      "equals the batch twin") {
    // The genuinely-streaming run of q_dedup_streaming's loop: documents
    // arrive over three micro-batches; each foreachBatch call dedups the
    // batch against the band-index partitions of all EARLIER batches
    // (TextDedup.dedupAgainstIndex), then appends its own partition.
    // Doc 22 repeats doc 1 verbatim (guaranteed band collision across
    // two batch boundaries); doc 11 is a one-word edit of doc 1
    // (word-3-shingle Jaccard 9/11 ≈ 0.82, just over the 0.8 bar).
    import spark.implicits._
    import graft.operators.TextDedup
    implicit val sqlCtx = spark.sqlContext
    val d1 = "the quick brown fox jumps over the lazy dog every " +
      "single morning"
    val d1near = d1.replace("morning", "evening")
    val other1 = "completely unrelated text about distributed query " +
      "engines and shuffle plans"
    val other2 = "yet another filler document mentioning parquet " +
      "files and broadcast joins"
    val batches = Seq(
      Seq(1L -> d1, 2L -> other1),
      Seq(11L -> d1near, 12L -> other2),
      Seq(22L -> d1))

    // batch twin: the same splits through the same operator, no stream
    val expected = (1 to 2).flatMap { k =>
      val all = batches.take(k + 1).flatten.toDF("doc_id", "text")
      val batch = batches(k).toDF("doc_id", "text")
      val seen = batches.take(k).flatten.toDF("doc_id", "text")
      TextDedup.dedupAgainstIndex(
          batch, col("doc_id"), col("text"),
          TextDedup.bandIndex(seen, col("doc_id"), col("text")),
          seen, col("doc_id"), col("text"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    }.toSet
    assert(expected.map(p => (p._1, p._2)) ==
      Set(11L -> 1L, 22L -> 1L, 22L -> 11L), expected.toString)

    val root = java.nio.file.Files.createTempDirectory("stream_dedup")
      .toString
    val got = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    var k = 0
    val in = MemoryStream[(Long, String)]
    val q = in.toDF().toDF("doc_id", "text").writeStream
      .outputMode(OutputMode.Append)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          if (k > 0) {
            val idx = spark.read.parquet(
              (0 until k).map(j => s"$root/idx/batch=$j"): _*)
            val seen = spark.read.parquet(
              (0 until k).map(j => s"$root/seen/batch=$j"): _*)
            got ++= TextDedup.dedupAgainstIndex(
                batch, col("doc_id"), col("text"), idx,
                seen, col("doc_id"), col("text"))
              .collect()
              .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          }
          TextDedup.bandIndex(batch, col("doc_id"), col("text"))
            .write.mode("overwrite").parquet(s"$root/idx/batch=$k")
          batch.select("doc_id", "text")
            .write.mode("overwrite").parquet(s"$root/seen/batch=$k")
          k += 1
        }
      }
      .start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      assert(got.toSet == expected,
        s"streaming pairs ${got.toSet} != batch twin $expected")
    } finally q.stop()
  }

  test("windowed top-k ranks each micro-batch output via foreachBatch") {
    // rank-over-aggregate isn't expressible mid-stream, so the streaming
    // form of topKPerWindow applies the rank to each complete-mode
    // windowedCounts emission; the last emission equals the batch twin.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val events = in.toDF().toDF("ts", "user_id", "event_type", "value")
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, String)]
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("window_ms"))
      .orderBy(col("n").desc, col("event_type"))
    val q = EventPipelines.windowedCounts(events).writeStream
      .outputMode(OutputMode.Complete)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        got.clear()
        got ++= batch.withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= 1)
          .orderBy(col("window_ms"))
          .collect()
          .map(r => (r.getAs[Long]("window_ms"), r.getAs[Int]("rnk"),
            r.getAs[String]("event_type")))
        ()
      }
      .start()
    try {
      in.addData((ts(0), 1L, "view", 1.0), (ts(1), 1L, "view", 1.0),
        (ts(2), 2L, "click", 1.0))
      q.processAllAvailable()
      assert(got.toList.map(_._3) == List("view"))
      in.addData((ts(3), 2L, "click", 1.0), (ts(4), 3L, "click", 1.0))
      q.processAllAvailable()
      // clicks (3) now beat views (2) in the same daily window
      assert(got.toList.map(_._3) == List("click"))
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

  test("online anomalies: streaming over time-split batches equals the batch twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // 40 calm events then a spike, split mid-stream: the Welford state
    // must carry across the micro-batch boundary for the spike (and only
    // the spike) to flag with the same z as the single-pass batch run
    val calm = (0 until 40).map(i =>
      (ts(i), i.toLong, "m", 10.0 + (i % 5) * 0.1))
    val spike = Seq((ts(41), 100L, "m", 25.0), (ts(42), 101L, "m", 10.2))
    val batchDf = (calm ++ spike)
      .toDF("ts", "event_id", "event_type", "value")
    val expected = EventPipelines.onlineAnomalies(batchDf)
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(expected.map(_._1) == Seq(100L), "exactly the spike flags")

    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val q = EventPipelines
      .onlineAnomalies(in.toDF().toDF("ts", "event_id", "event_type", "value"))
      .writeStream.format("memory").queryName("anom_out")
      .outputMode(OutputMode.Append).start()
    try {
      in.addData(calm.take(25))
      q.processAllAvailable()
      in.addData(calm.drop(25) ++ spike) // state must carry over
      q.processAllAvailable()
      val got = spark.table("anom_out")
        .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
      assert(got == expected,
        s"streaming flags $got != batch twin $expected")
    } finally q.stop()
  }

  test("late-drop audit predicts real withWatermark drops") {
    // q_stream_late_drops' rule (late iff ts < running-max − 30 min over
    // arrival order) must agree with what a watermarked streaming agg
    // actually discards. Arrival order is forced by singleton
    // micro-batches; lateness is either 0 or ≥ 45 min so the 1-minute
    // window-end granularity can't blur the verdict; a far-future flush
    // event pushes the final watermark past every surviving window.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    def m(min: Int) = new Timestamp(1704103200000L + min * 60000L)
    val arrivals = Seq( // (event_id = arrival order, event-time minutes)
      1 -> 60, 2 -> 70, 3 -> 80, 4 -> 10, 5 -> 90, 6 -> 40, 7 -> 100)
    // batch audit, same expressions as the catalog query
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val audited = arrivals.map { case (id, mm) => (id.toLong, m(mm)) }
      .toDF("event_id", "ts")
      .withColumn("ms", unix_millis(col("ts")))
      .withColumn("hwm", max(col("ms")).over(w))
      .withColumn("late",
        col("hwm").isNotNull && col("ms") < col("hwm") - 1800000L)
      .collect().filter(_.getAs[Boolean]("late"))
      .map(_.getLong(0)).toSet
    assert(audited == Set(4L, 6L), s"audit flagged $audited")

    val in = MemoryStream[(Timestamp, Long)]
    val q = in.toDF().toDF("ts", "event_id")
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 minute")).count()
      .writeStream.format("memory").queryName("late_out")
      .outputMode(OutputMode.Append).start()
    try {
      arrivals.foreach { case (id, mm) => // one micro-batch per event
        in.addData((m(mm), id.toLong))
        q.processAllAvailable()
      }
      in.addData((m(200), 99L)) // flush: advance watermark past 100
      q.processAllAvailable()
      val emitted = spark.table("late_out")
        .select(unix_millis(col("window.start")).as("s"))
        .collect().map(r => ((r.getLong(0) - 1704103200000L) / 60000L).toInt)
        .toSet
      val survivors = arrivals.filterNot(a => audited(a._1.toLong))
        .map(_._2).toSet
      assert(emitted == survivors,
        s"streaming emitted $emitted, audit predicted $survivors")
    } finally q.stop()
  }

  test("foreachBatch streams quads out through the nquads DSv2 sink") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files
      .createTempDirectory("stream_nq").toString + "/sink"
    val in = MemoryStream[(String, String, String)]
    val quads = in.toDF().toDF("subject", "predicate", "objectValue")
      .withColumn("subjectKind", lit(graft.model.TermKind.Iri))
      .withColumn("objectKind", lit(graft.model.TermKind.Literal))
      .withColumn("datatype", lit(null).cast("string"))
      .withColumn("lang", lit(null).cast("string"))
      .withColumn("graph", lit("urn:g:stream"))
    // each micro-batch appends its own .nq part files via the connector
    // (append mode — no truncate — so batches accumulate)
    val q = quads.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.format("nquads").mode("append").save(out)
    }.start()
    try {
      in.addData(("urn:s1", "urn:p", "v1"))
      q.processAllAvailable()
      in.addData(("urn:s2", "urn:p", "v2"), ("urn:s3", "urn:p", "v3"))
      q.processAllAvailable()
      val back = spark.read.format("nquads").load(out)
      assert(back.count() == 3)
      assert(back.select("subject").as[String].collect().toSet ==
        Set("urn:s1", "urn:s2", "urn:s3"))
      assert(back.filter(col("graph") === "urn:g:stream").count() == 3)
    } finally q.stop()
  }

  test("end-to-end streaming ETL: file source → EmitSpec explosion → " +
      "nquads DSv2 sink equals the batch twin") {
    // The etl-notes.md:9 middleware-sync requirement composed entirely
    // from shipped parts: address rows ARRIVE as files (the reference's
    // nightly extract drop), a declarative EmitSpec compiles each
    // micro-batch to quads (the same array+explode plan as batch), and
    // the DSv2 nquads connector writes with its temp-rename task commit
    // (exactly-once visible parts). The stream's accumulated output must
    // equal a one-shot batch run of the identical spec.
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("stream_etl")
    val inDir = root.resolve("in").toString
    val outDir = root.resolve("out").toString
    new java.io.File(inDir).mkdirs()
    val spec = graft.rdf.EntitySpec(
      graph = graft.model.Graphs.Addresses,
      subjectTemplate = "https://example.org/address/{addr_id}",
      types = Seq("https://schema.org/Place"),
      properties = Seq(
        graft.rdf.PropertySpec("https://schema.org/name",
          graft.rdf.LiteralCol("name")),
        graft.rdf.PropertySpec("https://example.org/def/locality",
          graft.rdf.IriTemplate("https://example.org/locality/{locality}"))))
    val schema = "addr_id LONG, name STRING, locality STRING"
    def drop(n: Int, rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("addr_id", "name", "locality").coalesce(1)
        .write.mode("overwrite").json(s"$inDir/batch$n")
    // first file present before the stream starts; more arrive later
    val batch1 = Seq((1L, "Main St 1", "north"), (2L, "High St 2", "south"))
    val batch2 = Seq((3L, "Low Rd 3", "north"))
    drop(1, batch1)
    val stream = spark.readStream.schema(schema)
      .option("recursiveFileLookup", "true").json(inDir)
    val q = stream.writeStream
      .option("checkpointLocation", root.resolve("ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.rdf.EmitCompiler.compile(batch, spec)
          .withColumn("subjectKind", lit(graft.model.TermKind.Iri))
          .write.format("nquads").mode("append").save(outDir)
      }
      .start()
    try {
      q.processAllAvailable()
      drop(2, batch2)
      q.processAllAvailable()
      // no half-written parts: the rename commit leaves only committed
      // .nq files visible (dot-files are local-FS checksum sidecars the
      // reader skips; .inprogress remnants would mean a broken commit)
      val files = new java.io.File(outDir).listFiles().map(_.getName)
        .filterNot(_.startsWith("."))
      assert(files.nonEmpty && files.forall(_.endsWith(".nq")), files.toSeq)
      val streamed = spark.read.format("nquads").load(outDir)
      val batchTwin = graft.rdf.EmitCompiler.compile(
          (batch1 ++ batch2).toDF("addr_id", "name", "locality"), spec)
        .withColumn("subjectKind", lit(graft.model.TermKind.Iri))
        .select(streamed.columns.map(col): _*)
      assert(streamed.count() == 9) // 3 rows × (type + name + locality)
      assert(streamed.except(batchTwin).count() == 0 &&
        batchTwin.except(streamed).count() == 0,
        "streamed quads diverged from the batch twin")
    } finally q.stop()
  }
}
