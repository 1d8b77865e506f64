package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Streaming smoke tests: the events parquet drives real streaming
  * queries into memory sinks; results are cross-checked against the
  * equivalent batch aggregation (exactly-once semantics on a static
  * source means they must agree).
  */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  /** Streaming sources read directories; stage the single fixture file
    * into a temp dir (testdata is read-only).
    */
  lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  lazy val batchEvents = Tables.eventsWithTs(spark, "/root/testdata/sf0.001")

  test("tumbling window stream agrees with the batch aggregation") {
    val stream = EventStreams.readEventStream(spark, dir)
    val got = EventStreams.runToMemory(
      EventStreams.tumblingCounts(stream), "tumbling_out", "complete")
    val want = EventStreams.tumblingCounts(batchEvents)
    assert(got.count() > 0)
    assert(got.count() == want.count())
    val gotSum = got.agg(sum("n_events")).collect()(0).getLong(0)
    assert(gotSum == batchEvents.count())
  }

  test("sliding windows produce overlapping coverage") {
    val stream = EventStreams.readEventStream(spark, dir)
    val got = EventStreams.runToMemory(
      EventStreams.slidingCounts(stream), "sliding_out", "complete")
    // 1h window sliding 15m: each event lands in 4 windows
    val total = got.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == batchEvents.count() * 4)
  }

  test("session windows bound user activity by gap") {
    val stream = EventStreams.readEventStream(spark, dir)
    val got = EventStreams.runToMemory(
      EventStreams.sessionCounts(stream), "session_out", "complete")
    assert(got.count() > 0)
    import org.apache.spark.sql.Row
    got.collect().foreach { case r: Row =>
      assert(!r.getTimestamp(0).after(r.getTimestamp(1)), "start <= end")
    }
    val totalEvents = got.agg(sum("n_events")).collect()(0).getLong(0)
    assert(totalEvents == batchEvents.count())
  }

  test("streaming hot buckets roll up to the batch burst detection") {
    val stream = EventStreams.readEventStream(spark, dir)
    val hot = EventStreams.runToMemory(
      EventStreams.hotBucketStream(stream), "hot_buckets_out", "complete")
    val got = operators.TimeJoins.burstsFromHotBuckets(hot)
    val want = operators.TimeJoins.burstDetect(
      Tables.eventsNanos(spark, "/root/testdata/sf0.001")
        .select(col("user_id"), expr("ts div 1000").as("tsu")),
      "user_id", "tsu")
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "online hot-bucket alarm must equal the batch burst operator")
  }

  test("streaming user stats roll up to the batch RFM grid") {
    val stream = EventStreams.readEventStream(spark, dir)
    val stats = EventStreams.runToMemory(
      EventStreams.userStatsStream(stream), "user_stats_out", "complete")
    val got = operators.TimeJoins.rfmFromUserStats(stats)
    val want = operators.TimeJoins.rfmSegments(
      Tables.eventsNanos(spark, "/root/testdata/sf0.001")
        .select(col("user_id"), expr("ts div 1000").as("tsu"),
          col("value")),
      "user_id", "tsu", "value")
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "online user-stats state must equal the batch RFM segmentation")
  }

  test("streaming user-weeks roll up to the batch retention triangle") {
    val stream = EventStreams.readEventStream(spark, dir)
    val uw = EventStreams.runToMemory(
      EventStreams.userWeekStream(stream), "user_weeks_out", "complete")
    val got = operators.TimeJoins.retentionFromUserWeeks(uw)
    val want = operators.TimeJoins.retentionCohorts(
      Tables.eventsNanos(spark, "/root/testdata/sf0.001")
        .select(col("user_id"), expr("ts div 1000").as("tsu")),
      "user_id", "tsu")
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "online user-week state must equal the batch cohort triangle")
  }

  test("streaming session type sets roll up to the batch session lift") {
    val stream = EventStreams.readEventStream(spark, dir)
    val sets = EventStreams.runToMemory(
      EventStreams.sessionTypeSetStream(stream), "sess_types_out", "complete")
    val got = operators.TimeJoins.sessionTypeLiftFromSets(
      sets, minCount = 1L)
    val want = operators.TimeJoins.sessionTypeLift(
      Tables.eventsNanos(spark, "/root/testdata/sf0.001")
        .select(col("user_id"), expr("ts div 1000").as("tsu"),
          col("event_id"), col("event_type")),
      "user_id", "tsu", "event_id", "event_type", minCount = 1L)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "session-window streamed lift must equal the batch sessionizer's")
  }

  test("streaming dedup drops repeats within the watermark") {
    // duplicate the whole fixture: every (user, type, ts) key appears
    // at least twice; the deduped stream must match the batch distinct
    val d = java.nio.file.Files.createTempDirectory("graft_events_dup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      d.resolve("b.parquet"))
    val stream = EventStreams.readEventStream(spark, d.toString)
    val got = EventStreams.runToMemory(
      EventStreams.dedupedEvents(stream), "dedup_out", "append")
    val want = batchEvents.select("user_id", "event_type", "ts").distinct().count()
    assert(got.count() == want,
      s"streaming dedup ${got.count()} != batch distinct $want")
  }

  test("stream-static join enriches each micro-batch from a broadcast dim") {
    val stream = EventStreams.readEventStream(spark, dir)
    val dim = spark.createDataFrame(Seq(
      ("click", "interactive"), ("view", "passive"))).toDF("event_type", "kind")
    val got = EventStreams.runToMemory(
      EventStreams.enrichedEvents(stream, dim, "event_type"), "enrich_out", "append")
    assert(got.count() == batchEvents.count(), "left join preserves the stream")
    val kinds = got.select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds.contains("interactive") || kinds.contains("passive"))
  }

  test("stream-stream interval join agrees with the batch join") {
    val stream = EventStreams.readEventStream(spark, dir)
    val got = EventStreams.runToMemory(
      EventStreams.clickViewJoin(stream), "ssj_out", "append")

    val clicks = batchEvents.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val views = batchEvents.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
    val expected = clicks.join(views,
      col("user_id") === col("view_user") &&
        col("view_ts") >= col("click_ts") - expr("INTERVAL 1 hour") &&
        col("view_ts") <= col("click_ts"))
      .select("click_id", "user_id", "view_id", "click_ts", "view_ts")

    assert(expected.count() > 0, "fixture must produce click-view matches")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "streaming interval join must equal the batch join on a static source")
  }

  test("stateful sessionization emits when the event budget closes a session") {
    import spark.implicits._
    val events = batchEvents
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val emitted = EventStreams.statefulSessions(events, maxEventsPerSession = 5)
    val rows = emitted.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.n_events == 5))
    rows.foreach(r => assert(!r.start_ts.after(r.end_ts)))
  }

  test("streaming pit features equal the batch operator's on a static source") {
    import spark.implicits._
    val events = batchEvents
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val all = EventStreams.pitFeatureStream(events, targetType = "purchase")
      .toDF()
    // a static source is one micro-batch → in-batch sort means no lates
    assert(all.filter(col("late")).isEmpty,
      "event-time-ordered arrival must produce zero late rows")
    val got = all.filter(!col("late")).drop("late")
    val expected = operators.TimeJoins.pointInTimeFeatures(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu"),
            col("event_id"), col("event_type"), col("value")),
        "user_id", "tsu", "event_id", "event_type", "value", "purchase")
      .select("event_id", "user_id", "n_prior", "n_prior_target",
        "prior_value_cents")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "online keyed-state features must equal the batch 1-PRECEDING frames")
  }

  test("pit features flag cross-batch late arrivals and keep state forward-only") {
    import spark.implicits._
    // two files, one per micro-batch (maxFilesPerTrigger=1): the second
    // carries an event EARLIER in event time than the first batch's —
    // it must surface flagged late, with state unmoved by it
    val d = java.nio.file.Files.createTempDirectory("graft_pit_late")
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val batch1 = Seq(
      (1L, ts(100), 7L, "view", 1.0),
      (2L, ts(200), 7L, "purchase", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val batch2 = Seq(
      (3L, ts(150), 7L, "view", 4.0),   // LATE: before batch 1's ts(200)
      (4L, ts(300), 7L, "view", 8.0))   // on time
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    // stage each batch as ONE plain file with an explicit mod time —
    // FileStreamSource orders by modification time, so this pins
    // batch1 strictly before batch2
    def stage(df: org.apache.spark.sql.DataFrame, name: String, mtime: Long): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_pit_stage")
      df.coalesce(1).write.parquet(tmp.resolve("out").toString)
      val it = java.nio.file.Files.newDirectoryStream(tmp.resolve("out"), "part-*.parquet")
      val src = it.iterator().next()
      val dst = d.resolve(name)
      java.nio.file.Files.copy(src, dst)
      it.close()
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtime))
    }
    val t0 = System.currentTimeMillis()
    stage(batch1, "a.parquet", t0 - 60000)
    stage(batch2, "b.parquet", t0)
    val stream = spark.readStream.schema(batch1.schema)
      .option("maxFilesPerTrigger", 1).parquet(d.toString)
      .as[EventStreams.Event]
    val got = EventStreams.runToMemory(
      EventStreams.pitFeatureStream(stream, targetType = "purchase").toDF(),
      "pit_late_out")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got(1L) == ((0L, 0L, 0L, false)))
    assert(got(2L) == ((1L, 0L, 100L, false)))
    assert(got(3L)._4, "the out-of-order arrival must be flagged late")
    assert(got(4L) == ((2L, 1L, 300L, false)),
      s"a late event must not advance state, got ${got(4L)}")
  }

  test("streaming funnel state equals the batch funnel on a static source") {
    import spark.implicits._
    val stages = Seq("signup", "view", "purchase")
    val gap = 86400L * 1000000L
    val events = batchEvents
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val got = EventStreams.funnelStream(events, stages, gap).collect()
    assert(got.nonEmpty)
    // single batch → one changed-state row per reaching user; stage
    // counts fall straight out of the deepest-stage readout
    val reachedCounts = (1 to stages.size).map(i =>
      got.count(_.reached >= i).toLong)
    val want = operators.TimeJoins.funnel(
        Tables.eventsNanos(spark, "/root/testdata/sf0.001")
          .select(col("user_id"), expr("ts div 1000").as("tsu"),
            col("event_type")),
        "user_id", "tsu", "event_type", stages, gap)
      .orderBy("stage_no").collect().map(_.getAs[Long]("n_reached")).toSeq
    assert(reachedCounts == want,
      s"keyed funnel state $reachedCounts != batch window minima $want")
    // first-touch times are monotone within a user's stage vector
    got.foreach { u =>
      val set = u.stage_ts.takeWhile(_ >= 0)
      assert(set == set.sorted, s"stage times out of order: $u")
    }
  }

  test("streaming next-event pairs equal the batch operator on a static source") {
    import spark.implicits._
    val types = batchEvents.select("event_type").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val events = batchEvents
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[EventStreams.Event]
    val got = EventStreams.nextEventPairStream(events, types).toDF()
      .select("event_id", "user_id", "etype", "next_type", "neg_type")
    val want = operators.TimeJoins.nextEventPairs(
      Tables.eventsNanos(spark, "/root/testdata/sf0.001")
        .select(col("user_id"), expr("ts div 1000").as("tsu"),
          col("event_id"), col("event_type")),
      "user_id", "tsu", "event_id", "event_type")
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "online pair emission must equal the batch lead-window export")
  }

  test("streamed successor pairs roll up to the batch transition matrix") {
    import spark.implicits._
    // the per-user successor pairs the next-event face emits ARE the
    // lag pairs of t130 — one shared back half (transitionsFromPairs)
    // pins one arithmetic for the batch matrix and the online face
    val types = batchEvents.select("event_type").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val events = batchEvents
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[EventStreams.Event]
    val pairs = EventStreams.nextEventPairStream(events, types).toDF()
      .select(col("etype").as("from_type"),
        col("next_type").as("to_type"))
    val got = operators.TimeJoins.transitionsFromPairs(pairs)
    val want = operators.TimeJoins.eventTransitions(
      Tables.eventsNanos(spark, "/root/testdata/sf0.001")
        .select(col("user_id"), expr("ts div 1000").as("tsu"),
          col("event_id"), col("event_type")),
      "user_id", "tsu", "event_id", "event_type")
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "online successor pairs must roll up to the batch matrix")
  }

  test("streaming drift monitor: self-distribution is 0, shifted batch spikes") {
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val cnt = docs
      .select(explode(functions.TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val tot = cnt.agg(sum("c")).collect()(0).getLong(0)
    val ref = cnt.select(col("w"), expr(s"(c * 1000000) div $tot").as("ppm"))

    def streamOf(df: org.apache.spark.sql.DataFrame, tag: String) = {
      val d = java.nio.file.Files.createTempDirectory(s"graft_drift_$tag")
      df.coalesce(1).write.parquet(d.resolve("docs.parquet").toString)
      spark.readStream.schema(df.schema).parquet(d.toString + "/docs.parquet")
    }
    val same = scala.collection.mutable.Buffer.empty[(Long, Long, Long, Long)]
    EventStreams.driftMonitorStream(
      streamOf(docs.select("doc_id", "text"), "same"), "text", ref, same)
    assert(same.nonEmpty && same.forall(_._4 == 0L),
      s"self-distribution drift must be 0, got $same")

    val shifted = scala.collection.mutable.Buffer.empty[(Long, Long, Long, Long)]
    EventStreams.driftMonitorStream(
      streamOf(docs.select(col("doc_id"),
        lit("qqqzz qqqzz qqqzz").as("text")), "shift"), "text", ref, shifted)
    assert(shifted.nonEmpty && shifted.forall(_._4 > 1900000L),
      s"an out-of-vocabulary batch must spike near 2e6, got $shifted")

    // an empty (zero-token) batch scores the reference's own mass —
    // the L1 the decomposition assigns it, not a sentinel
    val refMass = ref.agg(sum("ppm")).collect()(0).getLong(0)
    val empty = scala.collection.mutable.Buffer.empty[(Long, Long, Long, Long)]
    EventStreams.driftMonitorStream(
      streamOf(docs.filter(col("doc_id") < 0).select("doc_id", "text"),
        "empty"), "text", ref, empty)
    assert(empty.nonEmpty && empty.forall(_._4 == refMass),
      s"an empty batch must score the reference mass $refMass, got $empty")
  }

  test("streaming winnow admission gates boilerplate and equals the batch disposition") {
    import spark.implicits._
    val boiler = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, s"$boiler lead paragraph one"),
      (2L, s"other indexed words entirely distinct body text here")).toDF("doc_id", "text")
    val index = graft.operators.Dedup.winnowFingerprints(
      corpus, "doc_id", "text").select("fp")
    val arriving = Seq(
      (10L, s"fresh new arrival with its own unique wording throughout"),
      (11L, s"$boiler republished under a new id"), // boilerplate carrier
      (12L, "tiny")).toDF("doc_id", "text") // no fingerprints
    val d = java.nio.file.Files.createTempDirectory("graft_winnow_adm")
    arriving.coalesce(1).write.parquet(d.resolve("docs.parquet").toString)
    val out = java.nio.file.Files.createTempDirectory("graft_winnow_out").toString
    EventStreams.winnowAdmissionStream(
      spark.readStream.schema(arriving.schema)
        .parquet(d.toString + "/docs.parquet"),
      index, out)
    val log = spark.read.parquet(out)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(log(10L)._2, "a fresh document must be admitted")
    assert(!log(11L)._2 && log(11L)._1 >= 2L,
      s"the boilerplate carrier must be gated, got ${log(11L)}")
    assert(log(12L) == ((0L, true)), "a fingerprint-less doc is admitted")
    // equality with the batch operator on the same static input
    val want = graft.operators.Dedup.incrementalWinnowDedup(
        index, arriving, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(log == want, "stream disposition must equal the batch operator")
  }

  test("stream-vs-index dedup drops only already-indexed documents") {
    import spark.implicits._
    // stage a tiny "incoming docs" stream directory
    val d = java.nio.file.Files.createTempDirectory("graft_docstream")
    val docs = Seq(
      (1L, "brand new document body"),
      (2L, "already indexed content"),
      (3L, "another fresh arrival")).toDF("doc_id", "text")
    docs.write.parquet(d.resolve("docs.parquet").toString)
    val index = Seq("already indexed content", "some other old doc")
      .toDF("text").select(sha2(col("text"), 256).as("h"))
    val stream = spark.readStream
      .schema(docs.schema)
      .parquet(d.toString + "/docs.parquet")
    val got = EventStreams.runToMemory(
      EventStreams.dedupAgainstIndex(stream, index, "text"), "dedup_idx_out")
    assert(got.count() == 2)
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("stream-vs-index semantic dedup log matches the batch disposition") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val split = emb.count() * 4 / 5
    val index = emb.filter(col("vec_id") < split)
    val batch = emb.filter(col("vec_id") >= split)
    // stage the batch as a stream directory and a disposition log dir
    val d = java.nio.file.Files.createTempDirectory("graft_vecstream")
    batch.write.parquet(d.resolve("batch.parquet").toString)
    val out = d.resolve("dispositions").toString
    val stream = spark.readStream.schema(emb.schema)
      .parquet(d.toString + "/batch.parquet")
    EventStreams.semDedupAgainstIndex(stream, index, "vec_id", "embedding",
      out, minNlist = 16, threshold = 0.3)
    val got = spark.read.parquet(out)
    val expect = graft.operators.Similarity.incrementalSemDedup(
      index, batch, "vec_id", "embedding", 16, 0.3)
    assert(got.count() == batch.count(), "one disposition per batch vector")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "stream log == batch disposition")
  }

  test("stream-vs-index image dedup log matches the batch disposition") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(octet_length(col("text")) === length(col("text")))
    def fps(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Multimodal.imagePhash(
        graft.operators.Multimodal.withBmpPayload(d, "doc_id", "text"), "doc_id")
    val index = fps(docs.filter(col("doc_id") % 5 =!= 0))
    val batchPayloads = graft.operators.Multimodal.withBmpPayload(
      docs.filter(col("doc_id") % 5 === 0), "doc_id", "text")
    val d = java.nio.file.Files.createTempDirectory("graft_imgstream")
    batchPayloads.write.parquet(d.resolve("batch.parquet").toString)
    val out = d.resolve("dispositions").toString
    val stream = spark.readStream.schema(batchPayloads.schema)
      .parquet(d.toString + "/batch.parquet")
    EventStreams.imageDedupAgainstIndex(stream, index, "doc_id", out)
    val got = spark.read.parquet(out)
    val expect = graft.operators.Dedup.incrementalHammingDedup(
      index, fps(docs.filter(col("doc_id") % 5 === 0)), "doc_id", "phash", 3)
    assert(got.count() == batchPayloads.count(), "one disposition per image")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "stream log == batch disposition")
  }

  test("stream-vs-index audio dedup log matches the batch disposition") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
    def fps(d: org.apache.spark.sql.DataFrame) =
      graft.operators.Multimodal.audioFingerprint(
        graft.operators.Multimodal.withWavPayload(d, "doc_id", "text"), "doc_id")
    val index = fps(docs.filter(col("doc_id") % 5 =!= 0))
    val batchPayloads = graft.operators.Multimodal.withWavPayload(
      docs.filter(col("doc_id") % 5 === 0), "doc_id", "text")
    val d = java.nio.file.Files.createTempDirectory("graft_audstream")
    batchPayloads.write.parquet(d.resolve("batch.parquet").toString)
    val out = d.resolve("dispositions").toString
    val stream = spark.readStream.schema(batchPayloads.schema)
      .parquet(d.toString + "/batch.parquet")
    EventStreams.audioDedupAgainstIndex(stream, index, "doc_id", out)
    val got = spark.read.parquet(out)
    val expect = graft.operators.Dedup.incrementalHammingDedup(
      index, fps(docs.filter(col("doc_id") % 5 === 0)), "doc_id", "afp", 3)
    assert(got.count() == batchPayloads.count(), "one disposition per clip")
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "stream log == batch disposition")
  }

  test("streaming HLL registers: state == batch sketch, replay idempotent") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val d = java.nio.file.Files.createTempDirectory("graft_hllstream")
    // several files -> several micro-batches under maxFilesPerTrigger
    docs.repartition(4).write.parquet(d.resolve("in").toString)
    val state = d.resolve("hll_state").toString
    def stream() = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(d.resolve("in").toString)
    EventStreams.hllSketchStream(stream(), "text", n = 3, p = 8, state)
    val got = spark.read.parquet(state)
    val expect = graft.operators.CorpusOps
      .hllRegisters(docs, "text", 3, 8)
    // incremental max-merge across micro-batches == one batch pass
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "stream-maintained registers diverge from the batch registers")
    // the estimate over the state matches the gated t54 estimate row
    val fromState = graft.operators.CorpusOps
      .hllEstimateFromRegisters(got, 8).collect().head
    val batchRow = graft.queries.TrainingData
      .docHllSketch(spark, "/root/testdata/sf0.001").collect().head
    Seq("p", "m", "n_zero_regs", "z_scaled", "est_distinct").foreach { c =>
      assert(fromState.getLong(fromState.fieldIndex(c)) ==
        batchRow.getLong(batchRow.fieldIndex(c)), s"column $c diverged")
    }
    // replaying the whole stream over existing state must be a no-op
    EventStreams.hllSketchStream(stream(), "text", n = 3, p = 8, state)
    val again = spark.read.parquet(state)
    assert(again.exceptAll(expect).isEmpty && expect.exceptAll(again).isEmpty,
      "replay must converge to the same registers (max is idempotent)")
  }

  test("streaming CM delta log: summed counters == batch counters, " +
      "checkpointed restart collapses, distinct runs both count") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val d = java.nio.file.Files.createTempDirectory("graft_cmstream")
    docs.repartition(3).write.parquet(d.resolve("in").toString)
    val log = d.resolve("cm_log").toString
    val cp = d.resolve("cm_cp").toString
    def stream() = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(d.resolve("in").toString)
    EventStreams.cmSketchStream(stream(), "text", n = 2, width = 1024, log,
      checkpointLocation = Some(cp))
    val got = EventStreams.cmCountersOfLog(spark, log)
    val expect = graft.operators.CorpusOps.cmCounters(docs, "text", 2, 1024)
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty,
      "summed per-batch deltas diverge from the one-pass counters")
    // restarting against the SAME checkpoint resumes: the recovered
    // query re-reads nothing, and any replayed in-flight batch would
    // append byte-identical (run_id = checkpoint, batch_id) rows the
    // read-side distinct collapses — no double count
    EventStreams.cmSketchStream(stream(), "text", n = 2, width = 1024, log,
      checkpointLocation = Some(cp))
    val again = EventStreams.cmCountersOfLog(spark, log)
    assert(again.exceptAll(expect).isEmpty && expect.exceptAll(again).isEmpty,
      "checkpointed restart double-counted — read-side dedup broken")
    // two DISTINCT un-checkpointed runs over inputs that happen to
    // produce identical per-batch deltas must BOTH count: without the
    // per-run id their rows would be byte-identical (batch ids restart
    // at 0 per query) and legitimate deltas would silently collapse
    val log2 = d.resolve("cm_log2").toString
    EventStreams.cmSketchStream(stream(), "text", n = 2, width = 1024, log2)
    EventStreams.cmSketchStream(stream(), "text", n = 2, width = 1024, log2)
    val doubled = EventStreams.cmCountersOfLog(spark, log2)
    val twice = expect.withColumn("c", col("c") * 2)
    assert(doubled.exceptAll(twice).isEmpty && twice.exceptAll(doubled).isEmpty,
      "second ingest's deltas were dropped (cross-run batch-id collision)")
  }

  test("CM run identity canonicalizes checkpoint spellings") {
    // "/cp", "/cp/" and "file:/cp" resume the SAME Spark checkpoint;
    // the logged run_id must collapse them or a replayed batch logged
    // under another spelling double-counts
    val base = java.nio.file.Files.createTempDirectory("graft_cp").toString
    val ids = Seq(base, base + "/", "file:" + base)
      .map(EventStreams.canonicalPath(spark, _))
    assert(ids.distinct.size == 1, s"spellings diverged: $ids")
  }

  test("streaming inverted-index maintenance: live state answers " +
      "retrieval like a batch-built index") {
    import graft.operators.CorpusOps
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val d = java.nio.file.Files.createTempDirectory("graft_invstream")
    docs.repartition(3).write.parquet(d.resolve("in").toString)
    val idx = d.resolve("index").toString
    EventStreams.invertedIndexStream(
      spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d.resolve("in").toString),
      "doc_id", "text", idx)
    val ref = d.resolve("ref_index").toString
    CorpusOps.buildInvertedIndex(docs, "doc_id", "text", ref)
    val queries = Seq(1L -> "spark window join", 2L -> "hash merge batch")
    val live = CorpusOps.searchInvertedIndex(spark, idx, queries,
      k1 = 1.2, b = 0.75, k = 10).orderBy("query_id", "rank").collect().toSeq
    val batch = CorpusOps.searchInvertedIndex(spark, ref, queries,
      k1 = 1.2, b = 0.75, k = 10).orderBy("query_id", "rank").collect().toSeq
    assert(batch.nonEmpty && live == batch,
      "stream-maintained index diverges from the batch build")
  }

  test("streaming winnow ingestion: micro-batch cuts leave the same " +
      "index state as the one-shot build") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val d = java.nio.file.Files.createTempDirectory("graft_winidx")
    val streamed = d.resolve("index_s").toString
    val full = d.resolve("index_f").toString
    Dedup.buildWinnowIndex(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", streamed)
    val arrivals = docs.filter(col("doc_id") % 3 =!= 0)
    arrivals.repartition(3).write.parquet(d.resolve("in").toString)
    EventStreams.winnowIngestStream(
      spark.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d.resolve("in").toString),
      "doc_id", "text", streamed)
    Dedup.buildWinnowIndex(docs, "doc_id", "text", full)
    // the index is a fingerprint SET and union is its merge: the
    // streamed state's distinct fps equal the one-shot build of the
    // whole corpus, however the arrivals were micro-batched
    val a = spark.read.parquet(s"$streamed/fps").select("fp").distinct()
    val b = spark.read.parquet(s"$full/fps").select("fp").distinct()
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "stream-ingested winnow index diverges from the one-shot build")
    // compaction reclaims duplicate rows without changing the set,
    // and the compacted store still answers admissions identically
    Dedup.compactWinnowIndex(spark, streamed)
    val c = spark.read.parquet(s"$streamed/fps")
    assert(c.count() == c.select("fp").distinct().count(),
      "compaction left duplicate fp rows")
    val c2 = c.select("fp").distinct()
    assert(c2.exceptAll(b).isEmpty && b.exceptAll(c2).isEmpty,
      "compaction changed the fingerprint set")
    import spark.implicits._
    val probe = Seq((9001L, docs.orderBy(col("doc_id")).select("text")
      .head().getString(0))).toDF("doc_id", "text")
    val verdict = Dedup.searchWinnowIndex(spark, streamed, probe,
      "doc_id", "text").collect().head
    assert(!verdict.getBoolean(3),
      "an already-indexed document must be gated by the live index")
  }

  test("streaming band-index ingestion: micro-batch cuts leave the same " +
      "index state as the one-shot build") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val d = java.nio.file.Files.createTempDirectory("graft_bandidx")
    val streamed = d.resolve("index_s").toString
    val full = d.resolve("index_f").toString
    Dedup.buildBandIndex(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", streamed)
    val arrivals = docs.filter(col("doc_id") % 3 =!= 0)
    arrivals.repartition(3).write.parquet(d.resolve("in").toString)
    EventStreams.bandIngestStream(
      spark.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d.resolve("in").toString),
      "doc_id", "text", streamed)
    Dedup.buildBandIndex(docs, "doc_id", "text", full)
    // deterministic sketching: streamed state == one-shot build of
    // everything, however the arrivals were micro-batched
    for (rel <- Seq("sigs", "bands")) {
      val a = spark.read.parquet(s"$streamed/$rel").distinct()
      val b = spark.read.parquet(s"$full/$rel").distinct()
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"stream-ingested $rel diverges from the one-shot build")
    }
    // compaction dedupes rows without changing either relation's set
    Dedup.compactBandIndex(spark, streamed)
    val sigRows = spark.read.parquet(s"$streamed/sigs")
    assert(sigRows.count() == sigRows.distinct().count(),
      "compaction left duplicate signature rows")
    // an already-indexed document is gated by the live index
    import spark.implicits._
    val probe = Seq((9001L, docs.orderBy(col("doc_id")).select("text")
      .head().getString(0))).toDF("doc_id", "text")
    val v = Dedup.searchBandIndex(spark, streamed, probe, "doc_id", "text")
      .collect().head
    assert(!v.getBoolean(4) && v.getLong(3) == 1000000L,
      s"identical indexed doc must score 1e6 and be gated, got $v")
  }

  test("streaming KMV-store ingestion: micro-batch cuts leave the same " +
      "overlap matrix as the one-shot build; compaction reclaims") {
    import org.apache.spark.sql.functions.col
    import graft.operators.CorpusOps
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val d = java.nio.file.Files.createTempDirectory("graft_kmvstore")
    val store = d.resolve("store").toString
    CorpusOps.buildKmvStore(docs.filter(col("doc_id") % 3 === 0),
      "text", "source", store, n = 3, k = 64)
    val arrivals = docs.filter(col("doc_id") % 3 =!= 0)
    arrivals.repartition(3).write.parquet(d.resolve("in").toString)
    EventStreams.kmvIngestStream(
      spark.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d.resolve("in").toString),
      "text", "source", store)
    // KMV merge law: the streamed store answers the ONE-SHOT matrix,
    // however the arrivals were micro-batched
    val got = CorpusOps.kmvOverlapFromStore(spark, store)
    val want = CorpusOps.kmvGroupOverlap(docs, "text", "source",
      n = 3, k = 64)
    assert(got.count() > 0)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "stream-ingested store diverges from the one-shot overlap matrix")
    // replayed batch: read-time bottom-k re-selection absorbs it
    CorpusOps.ingestKmvBatch(spark, store, arrivals.limit(50),
      "text", "source")
    val replayed = CorpusOps.kmvOverlapFromStore(spark, store)
    assert(replayed.exceptAll(want).isEmpty && want.exceptAll(replayed).isEmpty,
      "a replayed ingest batch changed the answered matrix")
    // compaction dedupes to <= |groups|·k rows and preserves the set
    CorpusOps.compactKmvStore(spark, store)
    val rows = spark.read.parquet(s"$store/sketches")
    val nGroups = rows.select("grp").distinct().count()
    assert(rows.count() == rows.distinct().count() &&
      rows.count() <= nGroups * 64, "compaction left excess rows")
    val after = CorpusOps.kmvOverlapFromStore(spark, store)
    assert(after.exceptAll(want).isEmpty && want.exceptAll(after).isEmpty,
      "compaction changed the answered matrix")
    // the store answers with no corpus anywhere in the plan
    val plan = CorpusOps.kmvOverlapFromStore(spark, store)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(900))
    assert("Scan parquet".r.findAllIn(plan).size == 0,
      "store answer must run on the pinned sketch relation only")
  }

  test("streaming quantile-map ingestion: histogram additivity makes " +
      "the streamed map equal the one-shot fit; transform calibrates") {
    import org.apache.spark.sql.functions.col
    import graft.operators.CorpusOps
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val d = java.nio.file.Files.createTempDirectory("graft_qmap")
    val store = d.resolve("map").toString
    val oneShot = d.resolve("map_full").toString
    CorpusOps.fitQuantileMap(docs.filter(col("doc_id") % 3 === 0),
      "n_chars", store)
    val arrivals = docs.filter(col("doc_id") % 3 =!= 0)
    arrivals.repartition(3).write.parquet(d.resolve("in").toString)
    EventStreams.quantileIngestStream(
      spark.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d.resolve("in").toString),
      "n_chars", store)
    CorpusOps.fitQuantileMap(docs, "n_chars", oneShot)
    val got = CorpusOps.percentileFromMap(spark, store, docs,
      "doc_id", "n_chars")
    val want = CorpusOps.percentileFromMap(spark, oneShot, docs,
      "doc_id", "n_chars")
    assert(got.count() == docs.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streamed-ingested map diverges from the one-shot fit")
    // compaction reclaims to one row per distinct score, same answers
    CorpusOps.compactQuantileMap(spark, store)
    val hist = spark.read.parquet(s"$store/hist")
    assert(hist.count() == hist.select("score").distinct().count(),
      "compaction left duplicate score rows")
    val after = CorpusOps.percentileFromMap(spark, store, docs,
      "doc_id", "n_chars")
    assert(after.exceptAll(want).isEmpty && want.exceptAll(after).isEmpty,
      "compaction changed the calibrated percentiles")
    // a probe below every reference score calibrates to exactly 0;
    // one above everything calibrates to exactly 1e6
    import spark.implicits._
    val probes = Seq((-1L, -5L), (-2L, 1000000L)).toDF("doc_id", "n_chars")
    val p = CorpusOps.percentileFromMap(spark, store, probes,
      "doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(p == Map(-1L -> 0L, -2L -> 1000000L), s"got $p")
  }

  test("streaming Bloom-registry ingestion: OR-mergeability makes the " +
      "streamed registry equal the one-shot filter; replay absorbed") {
    import org.apache.spark.sql.functions.col
    import graft.operators.CorpusOps
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val train = docs.filter(col("doc_id") % 10 =!= 0)
    val d = java.nio.file.Files.createTempDirectory("graft_bloomreg")
    val reg = d.resolve("reg").toString
    CorpusOps.buildBloomRegistry(bench.filter(col("doc_id") % 3 === 0),
      "text", reg, 4)
    val arrivals = bench.filter(col("doc_id") % 3 =!= 0)
    arrivals.repartition(3).write.parquet(d.resolve("in").toString)
    EventStreams.bloomIngestStream(
      spark.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d.resolve("in").toString),
      "text", reg)
    val got = CorpusOps.decontaminateFromRegistry(spark, reg, train,
      "doc_id", "text")
    val want = CorpusOps.bloomDecontaminate(train, bench, "doc_id",
      "text", 4, withExact = false)
    assert(got.count() == train.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streamed registry diverges from the one-shot Bloom filter")
    // replayed registration + compaction both leave answers unchanged
    CorpusOps.ingestBloomBatch(spark, reg, arrivals.limit(20), "text")
    CorpusOps.compactBloomRegistry(spark, reg)
    val after = CorpusOps.decontaminateFromRegistry(spark, reg, train,
      "doc_id", "text")
    assert(after.exceptAll(want).isEmpty && want.exceptAll(after).isEmpty,
      "replay + compaction changed the registry's answers")
    // an indexed benchmark document probes as fully flagged
    val probe = bench.limit(1)
    val v = CorpusOps.decontaminateFromRegistry(spark, reg, probe,
      "doc_id", "text").collect().head
    assert(v.getLong(3) == 1L && v.getLong(2) == v.getLong(1),
      s"an indexed benchmark doc must hit on every shingle, got $v")
  }

  test("streaming IVF-PQ ingestion: micro-batch cuts leave the same " +
      "index state as one batch append") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val d = java.nio.file.Files.createTempDirectory("graft_ivfstream")
    val streamed = d.resolve("index_s").toString
    val reference = d.resolve("index_b").toString
    Similarity.buildIvfPqIndex(emb.filter(col("vec_id") < 400), "vec_id",
      "embedding", streamed, minNlist = 16, m = 4, ksub = 16)
    Similarity.buildIvfPqIndex(emb.filter(col("vec_id") < 400), "vec_id",
      "embedding", reference, minNlist = 16, m = 4, ksub = 16)
    val arrivals = emb.filter(col("vec_id") >= 400)
    arrivals.repartition(3).write.parquet(d.resolve("in").toString)
    EventStreams.ivfPqIngestStream(
      spark.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d.resolve("in").toString),
      "vec_id", "embedding", streamed)
    Similarity.appendToIvfPqIndex(spark, reference, arrivals,
      "vec_id", "embedding")
    // frozen-quantizer routing is deterministic, so the state contents
    // must be identical however the arrivals were cut
    for (rel <- Seq("cells", "codes")) {
      val a = spark.read.parquet(s"$streamed/$rel")
      val b = spark.read.parquet(s"$reference/$rel")
      assert(a.count() == b.count() &&
        a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"stream-ingested $rel diverges from the one-shot append")
    }
    // and the streamed arrivals are searchable through the live index
    val hits = Similarity.searchIvfPqIndex(spark, streamed,
      emb.filter(col("vec_id") === 453L), "vec_id", "embedding", k = 5)
    assert(hits.count() > 0)
  }

  test("streaming IVF-binary ingestion: micro-batch cuts leave the same " +
      "index state as one batch append") {
    import org.apache.spark.sql.functions.col
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val d = java.nio.file.Files.createTempDirectory("graft_ivfbinstream")
    val streamed = d.resolve("index_s").toString
    val reference = d.resolve("index_b").toString
    Similarity.buildIvfBinaryIndex(emb.filter(col("vec_id") < 400), "vec_id",
      "embedding", streamed, minNlist = 16)
    Similarity.buildIvfBinaryIndex(emb.filter(col("vec_id") < 400), "vec_id",
      "embedding", reference, minNlist = 16)
    val arrivals = emb.filter(col("vec_id") >= 400)
    arrivals.repartition(3).write.parquet(d.resolve("in").toString)
    EventStreams.ivfBinaryIngestStream(
      spark.readStream.schema(arrivals.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d.resolve("in").toString),
      "vec_id", "embedding", streamed)
    Similarity.appendToIvfBinaryIndex(spark, reference, arrivals,
      "vec_id", "embedding")
    val a = spark.read.parquet(s"$streamed/codes")
    val b = spark.read.parquet(s"$reference/codes")
    assert(a.count() == b.count() &&
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "stream-ingested codes diverge from the one-shot append")
    // streamed arrivals are searchable through the live pruned index
    val hits = Similarity.searchIvfBinaryIndex(spark, streamed,
      emb.filter(col("vec_id") === 453L), emb, "vec_id", "embedding",
      k = 5, rerank = 16)
    assert(hits.count() == 5)
  }

  test("foreachBatch upsert sink: latest row per key, idempotent on replay") {
    val out = java.nio.file.Files.createTempDirectory("graft_upsert")
      .resolve("user_state").toString
    val stream = EventStreams.readEventStream(spark, dir)
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
    EventStreams.upsertToRelation(stream, key = "user_id", orderCol = "ts",
      path = out)
    val got = spark.read.parquet(out)
    // one row per user, carrying that user's LATEST event timestamp
    val expected = batchEvents.groupBy("user_id")
      .agg(max("ts").as("ts"), count(lit(1)).as("n"))
    assert(got.count() == expected.count(), "one row per key")
    val mismatched = got.select("user_id", "ts")
      .exceptAll(expected.select("user_id", "ts"))
    assert(mismatched.isEmpty,
      s"upsert kept a non-latest row: ${mismatched.take(3).mkString}")
    // replaying the whole stream must converge to the same relation
    EventStreams.upsertToRelation(stream, "user_id", "ts", out)
    val again = spark.read.parquet(out)
    assert(again.count() == expected.count())
    assert(again.select("user_id", "ts")
      .exceptAll(expected.select("user_id", "ts")).isEmpty,
      "replay must be a no-op (idempotent per key)")
  }
}
