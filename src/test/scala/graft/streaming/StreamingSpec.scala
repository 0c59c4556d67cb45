package graft.streaming

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface: the same windowed aggregation the batch
  * engine runs (st1), driven incrementally with a watermark — proving the
  * per-tile/batch transforms carry over to streams (SURVEY §2.8). */
class StreamingSpec extends SparkSpec {

  test("streaming windowed agg over events == batch result") {
    val batch = Tables.events(spark, sf())
    // stage the events under an isolated dir so readStream sees one schema
    val dir = new java.io.File("target/tmp/stream_events").getAbsolutePath
    batch.write.mode("overwrite").parquet(dir)

    val stream = spark.readStream
      .schema(batch.schema)
      .parquet(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))

    val q = stream.writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("st_events")
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("st_events")
      .select(col("window.start").as("hour"), col("event_type"), col("n"))
    val expected = batch
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(expected).isEmpty && expected.exceptAll(streamed).isEmpty)
  }

  test("StreamJob hopping windows == batch st3 counts (st3's stream twin)") {
    val batch = Tables.events(spark, sf())
    val dir = new java.io.File("target/tmp/stream_events_hop").getAbsolutePath
    batch.write.mode("overwrite").parquet(dir)
    val q = StreamJob.eventHoppingAgg(
        spark.readStream.schema(batch.schema).parquet(dir))
      .writeStream.outputMode("complete").format("memory").queryName("st_hop")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // exact columns (window, event_type, n) must match the batch query;
    // n_users is approximate by design on the stream side
    val streamed = spark.table("st_hop")
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
    val expected = graft.SparkEntry.queries("st3_hopping")(spark, sf())
      .select("w_start", "event_type", "n")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(expected).isEmpty && expected.exceptAll(streamed).isEmpty)
  }

  test("StreamJob trailing RANGE frame == batch w5 (w5's stream twin)") {
    import spark.implicits._
    val batch = Tables.events(spark, sf()).filter(col("user_id") < 50)
    val dir = new java.io.File("target/tmp/stream_events_w5").getAbsolutePath
    batch.write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(batch.schema).parquet(dir)
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      .as[StreamJob.ValueEvent]
    val q = StreamJob.streamingTrailingAgg(src)
      .writeStream.outputMode("append").format("memory").queryName("st_w5")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("st_w5")
      .select("event_id", "user_id", "n_1h", "sum_1h")
    val expected = graft.SparkEntry.queries("w5_range_frame")(spark, sf())
      .select("event_id", "user_id", "n_1h", "sum_1h")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(expected).isEmpty && expected.exceptAll(streamed).isEmpty)
  }

  test("StreamJob session windows bound state and count events per session") {
    val batch = Tables.events(spark, sf())
    val dir = new java.io.File("target/tmp/stream_events2").getAbsolutePath
    batch.write.mode("overwrite").parquet(dir)
    val q = StreamJob.eventSessions(
        spark.readStream.schema(batch.schema).parquet(dir))
      .writeStream.outputMode("append").format("memory").queryName("st_sessions")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("st_sessions")
      .select(col("user_id"), col("session_window.start").as("s_start"),
        col("session_window.end").as("s_end"), col("n_events"))
    assert(got.count() > 0)
    // exact equivalence with the st5 batch twin: every EMITTED session
    // matches a batch session row-for-row (append mode only finalizes a
    // session once the watermark passes its end, so streamed ⊆ batch) …
    val batchSessions = graft.SparkEntry.queries("st5_session_window")(spark, sf())
    assert(got.exceptAll(batchSessions).isEmpty,
      "streamed sessions must be a subset of the batch session windows")
    // … and every batch session that closed before the final watermark
    // (max ts − 1h delay) was emitted — nothing silently dropped
    val horizon = batch.agg(max("ts")).collect()(0).getTimestamp(0).toInstant
      .minusSeconds(3600)
    val missing = batchSessions
      .filter(col("s_end") < lit(java.sql.Timestamp.from(horizon)))
      .exceptAll(got)
    assert(missing.isEmpty,
      "sessions closed before the final watermark must all be emitted")
  }

  test("StreamJob streaming dedup keeps one row per digest (d1's stream twin)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "same text", java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (2L, "same text", java.sql.Timestamp.valueOf("2026-01-01 10:05:00")),
      (3L, "other text", java.sql.Timestamp.valueOf("2026-01-01 10:10:00")))
      .toDF("doc_id", "text", "ts")
    val dir = new java.io.File("target/tmp/stream_docs").getAbsolutePath
    docs.write.mode("overwrite").parquet(dir)
    val q = StreamJob.streamingDedup(
        spark.readStream.schema(docs.schema).parquet(dir))
      .writeStream.outputMode("append").format("memory").queryName("st_dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val kept = spark.table("st_dedup").select("text").as[String].collect().sorted
    assert(kept.toSeq == Seq("other text", "same text"))
  }

  test("streaming curation: quality filter + dedup + deterministic split at ingest") {
    import spark.implicits._
    val good = ("the quick brown fox jumps over the lazy dog. " * 6).trim
    val docs = Seq(
      (1L, good, java.sql.Timestamp.valueOf("2026-01-01 10:00:00")),
      (2L, good, java.sql.Timestamp.valueOf("2026-01-01 10:05:00")), // dup of 1
      (3L, "too short", java.sql.Timestamp.valueOf("2026-01-01 10:10:00")), // low quality
      (4L, good + " extra tail words here", java.sql.Timestamp.valueOf("2026-01-01 10:15:00")))
      .toDF("doc_id", "text", "ts")
    val dir = new java.io.File("target/tmp/stream_curation").getAbsolutePath
    docs.write.mode("overwrite").parquet(dir)
    val q = StreamJob.streamingCuration(
        spark.readStream.schema(docs.schema).parquet(dir))
      .writeStream.outputMode("append").format("memory").queryName("st_curation")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("st_curation")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.keySet.intersect(Set(1L, 2L)).size == 1) // one of the dup pair survives
    assert(got.contains(4L) && !got.contains(3L))
    // split matches the batch operator's deterministic assignment
    val batchSplit = graft.operators.TextOps.hashSplit(docs)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    got.foreach { case (id, sp) => assert(sp == batchSplit(id)) }
  }

  test("stream-stream interval join matches the batch interval join") {
    import graft.operators.RangeJoin
    val batch = Tables.events(spark, sf())
    val views = batch.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts"))
    val clicks = batch.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val vDir = new java.io.File("target/tmp/stream_iv_views").getAbsolutePath
    val cDir = new java.io.File("target/tmp/stream_iv_clicks").getAbsolutePath
    views.write.mode("overwrite").parquet(vDir)
    clicks.write.mode("overwrite").parquet(cDir)
    val q = StreamJob.streamIntervalJoin(
        spark.readStream.schema(views.schema).parquet(vDir),
        spark.readStream.schema(clicks.schema).parquet(cDir),
        keys = Seq("user_id"))
      .select(col("l.view_id"), col("r.click_id"))
      .writeStream.outputMode("append").format("memory").queryName("st_ivjoin")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("st_ivjoin")
    // batch oracle: the bucketized interval join over the same windows
    val expected = RangeJoin.intervalJoin(
        views.select(col("view_id"), col("user_id"), col("ts").as("w_start"),
          (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end")),
        clicks.select(col("user_id"), col("click_id"), col("ts").as("click_ts")),
        Seq("user_id"), "w_start", "w_end", "click_ts", binWidthSec = 3600)
      .select("view_id", "click_id")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(expected).isEmpty && expected.exceptAll(streamed).isEmpty)
  }

  test("streaming dedup probe is stateless and flags near-dups vs a static corpus") {
    import spark.implicits._
    import graft.operators.Dedup
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq((100L, a), (101L, "completely different corpus words here now"))
      .toDF("doc_id", "text")
    val corpusBuckets = Dedup.lshBuckets(
      Dedup.minhashSignatures(corpus, k = 4), k = 4, rowsPerBand = 2)
    val arriving = Seq(
      (1L, a),                                          // exact twin of 100
      (2L, "nothing shares these novel stream tokens")) // novel
      .toDF("doc_id", "text")
    val dir = new java.io.File("target/tmp/stream_probe").getAbsolutePath
    arriving.write.mode("overwrite").parquet(dir)
    // append mode with NO watermark only works because the probe is
    // genuinely stateless — a stray aggregation here would fail to start
    val q = StreamJob.streamingDedupProbe(
        spark.readStream.schema(arriving.schema).parquet(dir), corpusBuckets)
      .writeStream.outputMode("append").format("memory").queryName("st_probe")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val rows = spark.table("st_probe").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    // doc 1 collides with corpus doc 100 in every band; doc 2 only emits
    // novel (null) rows — the sink-side aggregate sees it as new
    assert(rows.filter(_._1 == 1L).forall(_._2.contains(100L)))
    assert(rows.count(_._1 == 1L) == 2) // k=4, rowsPerBand=2 → 2 bands
    assert(rows.filter(_._1 == 2L).forall(_._2.isEmpty))
  }

  test("flatMapGroupsWithState accumulator: one summary per source on idle, state evicted") {
    import spark.implicits._
    import StreamJob.{DocEvent, SourceSummary}
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // four single-file micro-batches with increasing mod-times so the
    // watermark advances between batches and fires the idle timeouts of
    // a and b (last seen 10:05/10:00 + 30 min gap << final wm 13:30)
    val batches = Seq(
      Seq(DocEvent(1L, "a", 10, t("2026-01-01 10:00:00")),
          DocEvent(2L, "b", 20, t("2026-01-01 10:00:00"))),
      Seq(DocEvent(3L, "a", 5, t("2026-01-01 10:05:00"))),
      Seq(DocEvent(4L, "c", 7, t("2026-01-01 14:00:00"))),
      Seq(DocEvent(5L, "c", 9, t("2026-01-01 14:30:00"))))
    val dir = new java.io.File("target/tmp/stream_state")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.mkdirs()
    batches.zipWithIndex.foreach { case (evts, i) =>
      val stage = new java.io.File(dir, s".stage$i")
      evts.toDS().coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      val target = new java.io.File(dir, f"batch$i%03d.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath)
      target.setLastModified(1700000000000L + i * 60000L)
      org.apache.commons.io.FileUtils.deleteQuietly(stage)
    }
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[DocEvent]].schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.getAbsolutePath)
      .as[DocEvent]
    val q = StreamJob.sourceAccumulator(stream)
      .writeStream.outputMode("append").format("memory").queryName("st_acc")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("st_acc").as[SourceSummary].collect()
      .map(s => s.source -> s).toMap
    // a and b went idle inside the stream → exactly one summary each;
    // c was still live at end-of-stream → no summary
    assert(got.keySet == Set("a", "b"), s"got ${got.keySet}")
    assert(got("a").n_docs == 2 && got("a").n_tokens == 15)
    assert(got("a").last_seen == t("2026-01-01 10:05:00"))
    assert(got("b").n_docs == 1 && got("b").n_tokens == 20)
  }

  test("streaming funnel single-batch replay == batch Funnel, multi-batch advances") {
    import spark.implicits._
    import StreamJob.{FunnelAdvance, UserEvent}
    val stages = Seq("view", "click", "purchase")
    val withinMs = 24 * 3600 * 1000L

    // leg 1: the whole sf0.001 event log in ONE micro-batch — per-group
    // event-time sort makes the replay reproduce the batch operator exactly
    val batch = Tables.events(spark, sf())
      .select(col("user_id"), col("event_type"), col("ts"))
    val dir = new java.io.File("target/tmp/stream_funnel").getAbsolutePath
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir).as[UserEvent]
    val q = StreamJob.streamingFunnel(stream, stages, withinMs)
      .writeStream.outputMode("append").format("memory").queryName("st_funnel")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamedCounts = spark.table("st_funnel")
      .groupBy("stage").agg(countDistinct("user_id").as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val batchCounts = graft.operators.Funnel.counts(
        Tables.events(spark, sf()), stages, withinMs / 1000).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap.filter(_._2 > 0)
    assert(streamedCounts == batchCounts,
      s"stream $streamedCounts vs batch $batchCounts")

    // leg 2: advancement across micro-batches (state carries the anchor)
    def t(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val b0 = Seq(UserEvent(1L, "view", t(0)), UserEvent(1L, "click", t(10)),
      UserEvent(2L, "click", t(0))) // no view yet: stage machine stays at 0
    val b1 = Seq(UserEvent(1L, "purchase", t(20)), UserEvent(2L, "view", t(30)))
    val dir2 = new java.io.File("target/tmp/stream_funnel2")
    org.apache.commons.io.FileUtils.deleteQuietly(dir2); dir2.mkdirs()
    Seq(b0, b1).zipWithIndex.foreach { case (evts, i) =>
      val stage = new java.io.File(dir2, s".stage$i")
      evts.toDS().coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(dir2, f"batch$i%03d.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteQuietly(stage)
    }
    val stream2 = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[UserEvent]].schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir2.getAbsolutePath).as[UserEvent]
    val q2 = StreamJob.streamingFunnel(stream2, stages, withinMs)
      .writeStream.outputMode("append").format("memory").queryName("st_funnel2")
      .trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    val got = spark.table("st_funnel2").as[FunnelAdvance].collect()
      .map(a => (a.user_id, a.stage) -> a.ts).toMap
    // user 1 walks all three stages, the purchase arriving a batch later
    assert(got.keySet == Set((1L, 1), (1L, 2), (1L, 3), (2L, 1)))
    assert(got((1L, 3)) == t(20))
    // user 2's pre-view click never counted; the later view opens stage 1
    assert(got((2L, 1)) == t(30))
  }

  test("streaming count-min == batch sketch (t29's stream twin), d·w-bounded state") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val dir = new java.io.File("target/tmp/stream_docs_cm").getAbsolutePath
    docs.write.mode("overwrite").parquet(dir)
    val streamTerms = spark.readStream.schema(docs.schema).parquet(dir)
      .select(explode(graft.operators.Dedup.tokens(col("text"))).as("term"))
    val q = StreamJob.streamingCountMin(streamTerms, "term", depth = 4, width = 16)
      .writeStream.outputMode("complete").format("memory").queryName("st_cm")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("st_cm")
    val batch = graft.operators.Sketch.countMin(
      docs.select(explode(graft.operators.Dedup.tokens(col("text"))).as("term")),
      "term", depth = 4, width = 16)
    assert(streamed.count() > 0)
    assert(streamed.count() <= 4 * 16, "state must be bounded by the grid")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("StreamJob incremental foreachBatch drives a batch transform") {
    val batch = Tables.events(spark, sf())
    val dir = new java.io.File("target/tmp/stream_events3").getAbsolutePath
    batch.write.mode("overwrite").parquet(dir)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = StreamJob.incrementalBlocks(spark, dir, batch.schema) { (df, _) =>
      seen.addAndGet(df.count())
    }
    q.awaitTermination(60000)
    assert(seen.get() == batch.count())
  }

  test("streaming transitions single-batch == x17 batch; state spans batches; stragglers drop") {
    import spark.implicits._
    import StreamJob.{Transition, UserEvent}

    // leg 1: whole sf0.001 log in one micro-batch — per-user event-time
    // replay reproduces the batch window-lead matrix (timestamps are
    // unique per user at this SF, the x17 total-order condition)
    val batch = Tables.events(spark, sf())
      .select(col("user_id"), col("event_type"), col("ts"))
    val dir = new java.io.File("target/tmp/stream_trans").getAbsolutePath
    batch.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema).parquet(dir).as[UserEvent]
    val q = StreamJob.streamingTransitions(stream, idleMs = 365L * 24 * 3600 * 1000)
      .writeStream.outputMode("append").format("memory").queryName("st_trans")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("st_trans")
      .groupBy("from_type", "to_type").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val fromBatch = graft.SparkEntry.queries("x17_transitions")(spark, sf())
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == fromBatch, s"stream $streamed vs batch $fromBatch")

    // leg 2: the chain links ACROSS micro-batches, and a straggler older
    // than the stored state drops instead of re-ordering history
    def t(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val b0 = Seq(UserEvent(1L, "view", t(0)), UserEvent(1L, "click", t(10)))
    val b1 = Seq(UserEvent(1L, "purchase", t(20)),
      UserEvent(1L, "error", t(5))) // straggler: between view and click
    val dir2 = new java.io.File("target/tmp/stream_trans2")
    org.apache.commons.io.FileUtils.deleteQuietly(dir2); dir2.mkdirs()
    Seq(b0, b1).zipWithIndex.foreach { case (evts, i) =>
      val stage = new java.io.File(dir2, s".stage$i")
      evts.toDS().coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(dir2, f"batch$i%03d.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteQuietly(stage)
    }
    val stream2 = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[UserEvent]].schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir2.getAbsolutePath).as[UserEvent]
    val q2 = StreamJob.streamingTransitions(stream2, idleMs = 3600000L)
      .writeStream.outputMode("append").format("memory").queryName("st_trans2")
      .trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    val got = spark.table("st_trans2").as[Transition].collect()
      .map(tr => (tr.from_type, tr.to_type)).toSet
    assert(got == Set(("view", "click"), ("click", "purchase")),
      s"got $got") // no edge touches the dropped straggler
  }

  test("StreamJob debounce == batch x41 kept census (x41's stream twin)") {
    import spark.implicits._
    val batch = Tables.events(spark, sf())
    val dir = new java.io.File("target/tmp/stream_events_deb").getAbsolutePath
    batch.write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(batch.schema).parquet(dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .as[StreamJob.FullEvent]
    val q = StreamJob.streamingDebounce(src)
      .writeStream.outputMode("append").format("memory").queryName("st_deb")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // single-batch run ⇒ identical kept counts per user as batch x41
    val streamed = spark.table("st_deb").groupBy("user_id")
      .agg(count(lit(1)).as("n_kept"))
    val expected = graft.SparkEntry.queries("x41_debounce")(spark, sf())
      .select("user_id", "n_kept")
    assert(streamed.count() > 0)
    assert(streamed.exceptAll(expected).isEmpty &&
      expected.exceptAll(streamed).isEmpty)
  }

  test("StreamJob latest-wins view == batch st6 argmax (st6's stream twin)") {
    import spark.implicits._
    val batch = Tables.events(spark, sf())
    val dir = new java.io.File("target/tmp/stream_events_latest").getAbsolutePath
    batch.write.mode("overwrite").parquet(dir)
    val src = spark.readStream.schema(batch.schema).parquet(dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
      .as[StreamJob.FullEvent]
    val q = StreamJob.streamingLatest(src)
      .writeStream.outputMode("update").format("memory").queryName("st_latest")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // update-mode memory sink accumulates every re-emission; the final
    // view is the (ts, event_id)-argmax per user over the emitted rows —
    // the same reduction the sink's upsert performs
    val finalView = spark.table("st_latest")
      .groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("__m"))
      .select(col("user_id"), col("__m.ts").as("ts"),
        col("__m.event_id").as("event_id"), col("__m.event_type").as("event_type"))
    val expected = graft.SparkEntry.queries("st6_latest_event")(spark, sf())
    assert(finalView.count() > 0)
    assert(finalView.exceptAll(expected).isEmpty &&
      expected.exceptAll(finalView).isEmpty)
  }

  test("streaming within-stream near-dup == batch nearDupVerdicts (st7); horizon evicts") {
    import spark.implicits._

    // leg 1: the whole sf0.001 corpus in ONE micro-batch, arrival order =
    // doc_id (ts strictly increasing, all inside one horizon) — the
    // per-bucket event-time sort makes the stateful replay reproduce the
    // batch twin's verdict relation EXACTLY
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"),
        timestamp_millis(lit(1700000000000L) + col("doc_id") * 1000).as("ts"))
    val dir = new java.io.File("target/tmp/stream_neardup").getAbsolutePath
    docs.write.mode("overwrite").parquet(dir)
    val q = StreamJob.streamingNearDup(
        spark.readStream.schema(docs.schema).parquet(dir), maxReps = 100000)
      .writeStream.outputMode("append").format("memory").queryName("st_neardup")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // the sink-side per-doc fold: min dup_of over the per-band verdicts
    val streamed = spark.table("st_neardup")
      .groupBy("doc_id").agg(min("dup_of").as("dup_of")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val batch = graft.operators.Dedup.nearDupVerdicts(
        Tables.documents(spark, sf()), k = 4, rowsPerBand = 2, minMatch = 3)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(streamed.size == batch.size, s"${streamed.size} vs ${batch.size}")
    assert(streamed == batch)
    assert(batch.values.exists(_.isDefined), "corpus should contain near-dups")

    // leg 2: the event-time horizon is load-bearing — an identical doc
    // arriving 2 h later is NOVEL (its twin's state expired), while one
    // arriving 10 s after that dups against the fresh rep
    import StreamJob.BandVerdict
    def t(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    val text = "alpha beta gamma delta epsilon"
    val b0 = Seq((1L, text, t(0)))
    val b1 = Seq((2L, text, t(7200L * 1000)), (3L, text, t(7200L * 1000 + 10000)))
    val dir2 = new java.io.File("target/tmp/stream_neardup2")
    org.apache.commons.io.FileUtils.deleteQuietly(dir2); dir2.mkdirs()
    Seq(b0, b1).zipWithIndex.foreach { case (ds, i) =>
      val stage = new java.io.File(dir2, s".stage$i")
      ds.toDF("doc_id", "text", "ts").coalesce(1)
        .write.mode("overwrite").parquet(stage.getAbsolutePath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(dir2, f"batch$i%03d.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteQuietly(stage)
    }
    val stream2 = spark.readStream
      .schema(docs.schema).option("maxFilesPerTrigger", 1)
      .parquet(dir2.getAbsolutePath)
    val q2 = StreamJob.streamingNearDup(stream2)
      .writeStream.outputMode("append").format("memory").queryName("st_neardup2")
      .trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    val got = spark.table("st_neardup2").as[BandVerdict].collect()
      .groupBy(_.doc_id).view.mapValues(_.flatMap(_.dup_of).minOption).toMap
    assert(got(1L).isEmpty, "first arrival is novel")
    assert(got(2L).isEmpty, "identical doc past the horizon must be novel again")
    assert(got(3L).contains(2L), "in-horizon twin dups against the FRESH rep")
  }

  /** One parquet file per micro-batch (maxFilesPerTrigger=1 reads them in
    * name order) — the arrival-order harness for the out-of-order legs. */
  private def stageBatches(dir: java.io.File,
      batches: Seq[Seq[(Long, String, java.sql.Timestamp)]]): Unit = {
    import spark.implicits._
    org.apache.commons.io.FileUtils.deleteQuietly(dir); dir.mkdirs()
    batches.zipWithIndex.foreach { case (ds, i) =>
      val stage = new java.io.File(dir, s".stage$i")
      ds.toDF("doc_id", "text", "ts").coalesce(1)
        .write.mode("overwrite").parquet(stage.getAbsolutePath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath,
        new java.io.File(dir, f"batch$i%03d.parquet").toPath)
      org.apache.commons.io.FileUtils.deleteQuietly(stage)
    }
  }

  test("st7 out-of-order: verdicts stay inside the batch relation (rid < id); " +
      "late-past-watermark arrivals drop") {
    import spark.implicits._
    import StreamJob.BandVerdict
    def t(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    val text = "alpha beta gamma delta epsilon"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))

    // leg 1: four identical docs, event times in id order, ARRIVAL order
    // 3, 1, 2, 4 (one micro-batch each, all inside watermark + horizon).
    // The batch twin says 1→None, 2→1, 3→1, 4→1. Under reordering the
    // contract is: every emitted dup_of is an EARLIER id (rid < id — the
    // ADVICE-r17 guard: doc 1 must NOT dup against the already-arrived 3),
    // and a doc may miss its true smallest-id dup when that dup arrives
    // after it (doc 3 → None here), but never leave the batch relation.
    val dir = new java.io.File("target/tmp/stream_neardup_ooo")
    stageBatches(dir, Seq(
      Seq((3L, text, t(3000))), Seq((1L, text, t(1000))),
      Seq((2L, text, t(2000))), Seq((4L, text, t(4000)))))
    val q = StreamJob.streamingNearDup(spark.readStream
        .schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(dir.getAbsolutePath))
      .writeStream.outputMode("append").format("memory")
      .queryName("st_neardup_ooo").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("st_neardup_ooo").as[BandVerdict].collect()
      .groupBy(_.doc_id).view.mapValues(_.flatMap(_.dup_of).minOption).toMap
    assert(got == Map(3L -> None, 1L -> None, 2L -> Some(1L), 4L -> Some(1L)),
      s"got $got")

    // leg 2: a doc whose event time sits behind the advanced watermark
    // emits NO verdict rows (the documented drop semantics). The drop is
    // the OPERATOR's own filter: Spark's flatMapGroupsWithState applies
    // the watermark to state timeout only — late input rows flow through
    // to the user function (this leg caught exactly that). batch 0 pushes
    // the watermark to t(3h) − horizon(1h) = t(2h); batch 1's doc 3 at
    // t(1h) is late.
    val dir2 = new java.io.File("target/tmp/stream_neardup_late")
    stageBatches(dir2, Seq(
      Seq((1L, text, t(0)), (2L, text, t(3 * 3600 * 1000L))),
      Seq((3L, text, t(1 * 3600 * 1000L)))))
    val q2 = StreamJob.streamingNearDup(spark.readStream
        .schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(dir2.getAbsolutePath))
      .writeStream.outputMode("append").format("memory")
      .queryName("st_neardup_late").trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    val got2 = spark.table("st_neardup_late").as[BandVerdict].collect()
      .groupBy(_.doc_id).view.mapValues(_.flatMap(_.dup_of).minOption).toMap
    assert(!got2.contains(3L), s"late arrival must emit nothing: $got2")
    assert(got2(1L).isEmpty && got2(2L).isEmpty,
      s"docs 1 and 2 sit a horizon apart: $got2")
  }

  test("st7 over-cap bucket: streaming keeps the NEWEST maxReps, batch drops " +
      "the bucket wholesale — the documented cap divergence, exercised") {
    // VERDICT r18 #6: the maxReps-vs-maxBucketSize divergence was resolved
    // by documentation in r18; this leg RUNS one degenerate bucket through
    // both paths past both caps so a future refactor cannot silently
    // change either side. Five identical docs land in the same LSH bucket
    // on every band.
    import spark.implicits._
    import StreamJob.BandVerdict
    def t(ms: Long) = new java.sql.Timestamp(1700000000000L + ms)
    val text = "alpha beta gamma delta epsilon"
    val docs = (1L to 5L).map(i => (i, text, t(i * 1000)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType)))
    val dir = new java.io.File("target/tmp/stream_neardup_cap")
    stageBatches(dir, docs.map(Seq(_)))
    // STREAMING at maxReps=2: the state ring keeps the newest two reps, so
    // verdicts keep flowing past the cap but the smallest-id rep ages out —
    // doc 4 dups against 2 (rep 1 evicted), doc 5 against 3.
    val q = StreamJob.streamingNearDup(spark.readStream
        .schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(dir.getAbsolutePath), maxReps = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("st_neardup_cap").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("st_neardup_cap").as[BandVerdict].collect()
      .groupBy(_.doc_id).view.mapValues(_.flatMap(_.dup_of).minOption).toMap
    assert(streamed == Map(1L -> None, 2L -> Some(1L), 3L -> Some(1L),
      4L -> Some(2L), 5L -> Some(3L)), s"streaming got $streamed")
    // BATCH at maxBucketSize=2: the size-5 bucket is dropped WHOLESALE —
    // every doc reads novel (no verdicts from a degenerate bucket).
    val batch = graft.operators.Dedup.nearDupVerdicts(
        docs.toDF("doc_id", "text", "ts").drop("ts"),
        k = 4, rowsPerBand = 2, minMatch = 3, maxBucketSize = 2)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(batch == (1L to 5L).map(_ -> None).toMap, s"batch got $batch")
    // caps disarmed, the two paths agree exactly (the documented contract)
    val q2 = StreamJob.streamingNearDup(spark.readStream
        .schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(dir.getAbsolutePath), maxReps = 100000)
      .writeStream.outputMode("append").format("memory")
      .queryName("st_neardup_cap2").trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    val streamed2 = spark.table("st_neardup_cap2").as[BandVerdict].collect()
      .groupBy(_.doc_id).view.mapValues(_.flatMap(_.dup_of).minOption).toMap
    val batch2 = graft.operators.Dedup.nearDupVerdicts(
        docs.toDF("doc_id", "text", "ts").drop("ts"),
        k = 4, rowsPerBand = 2, minMatch = 3)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(streamed2 == batch2 &&
      streamed2 == Map(1L -> None, 2L -> Some(1L), 3L -> Some(1L),
        4L -> Some(1L), 5L -> Some(1L)),
      s"disarmed paths diverge: $streamed2 vs $batch2")
  }
}
