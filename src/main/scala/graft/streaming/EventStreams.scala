package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming extension over the `events` fixture (SURVEY §7
  * phase 4 — the reference has no streaming surface; this is the
  * engine's scale-path for continuously arriving training data).
  *
  * All transforms are defined against an unbounded DataFrame; the
  * same code runs batch (for tests) or streaming (readStream). At
  * cluster scale the shuffle keys are (window, event_type) /
  * user_id — standard keyed-state partitioning.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionSummary(user_id: Long, n_events: Int,
      total_value: Double, start_ts: java.sql.Timestamp, end_ts: java.sql.Timestamp)

  /** Open a streaming read over an events parquet directory.
    * `ts` is normalized to TIMESTAMP (LTZ — the type watermarks
    * require) from whichever physical type the fixture has:
    * TIMESTAMP(NANOS)→nanos-long under the session's nanosAsLong
    * conf, or TIMESTAMP(MICROS)→TIMESTAMP_NTZ.
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(dir).schema
    val raw = spark.readStream.schema(schema).parquet(dir)
    schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** Tumbling-window aggregation with a watermark: event counts and
    * value sums per (window, event_type); late data beyond the
    * watermark is dropped.
    */
  def tumblingCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding-window aggregation (overlapping windows). */
  def slidingCounts(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n_events"))

  /** Session windows: activity grouped per user into gap-separated
    * sessions (built-in session_window, gap-based).
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Streaming session type sets — the online face of t133's
    * sessionization stage ([[graft.operators.TimeJoins.sessionTypeLift]]):
    * Structured Streaming's built-in session_window groups each
    * user's events into gap-separated sessions and keyed distinct-
    * type state (collect_set) emits one (user, session-start, sorted
    * type set) row per session;
    * [[graft.operators.TimeJoins.sessionTypeLiftFromSets]] rolls the
    * emitted relation up through the SAME lift scoring as the batch
    * operator (StreamingSpec pins the equality).
    *
    * Gap alignment: the batch sessionizer keeps a session alive at
    * diff <= gapUs where session_window keeps it at diff < gap, so
    * the face passes gap = gapUs + 1 µs — the two boundaries then
    * agree on every input, including a gap of exactly gapUs.
    *
    * State per open session is one bounded type set (the type
    * catalog, not the session length), evicted by the watermark.
    */
  def sessionTypeSetStream(events: DataFrame,
      gapUs: Long = 1800L * 1000000L,
      watermark: String = "2 hours"): DataFrame = {
    require(gapUs > 0)
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), s"${gapUs + 1} microseconds"),
        col("user_id"))
      .agg(sort_array(collect_set(col("event_type"))).as("types"))
      .select(col("session_window.start").as("session_start"),
        col("user_id"), col("types"))
  }

  /** Streaming hot-bucket alarm — the online face of
    * [[graft.operators.TimeJoins.burstDetect]]'s filter stage: fixed
    * `bucketUs` tumbling windows per user (epoch-aligned exactly like
    * the batch `tsu div bucketUs` buckets), counts kept as keyed
    * window state and emitted once the watermark closes the window;
    * only buckets reaching `minPerBucket` surface — the live bot
    * alarm. The island collapse
    * ([[graft.operators.TimeJoins.burstsFromHotBuckets]]) rolls the
    * emitted relation up through the SAME arithmetic as the batch
    * operator (StreamingSpec pins the equality). State per (user,
    * open window) is one count.
    */
  def hotBucketStream(events: DataFrame,
      bucketUs: Long = 3600L * 1000000L, minPerBucket: Long = 2L,
      watermark: String = "2 hours"): DataFrame = {
    require(bucketUs > 0 && minPerBucket >= 1)
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"$bucketUs microseconds"),
        col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minPerBucket)
      .select(col("user_id"),
        (unix_micros(col("window.start")) / bucketUs)
          .cast("long").as("b"),
        col("cnt"))
  }

  /** Streaming user-week activity — the online face of t135's
    * (user, week) distinct stage: epoch-aligned 7-day tumbling
    * windows per user (Spark windows align at the epoch, exactly the
    * batch `tsu div 604800e6` bucket), one count per open (user,
    * week) of keyed state, watermark-evicted; the cohort triangle
    * ([[graft.operators.TimeJoins.retentionFromUserWeeks]]) rolls the
    * emitted relation up through the SAME arithmetic as the batch
    * operator (StreamingSpec pins the equality).
    */
  def userWeekStream(events: DataFrame,
      watermark: String = "2 hours"): DataFrame = {
    val weekUs = 604800L * 1000000L
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"$weekUs microseconds"), col("user_id"))
      .agg(count(lit(1)).as("__cnt"))
      .select(col("user_id"),
        (unix_micros(col("window.start")) / weekUs)
          .cast("long").as("week"))
  }

  /** Streaming per-user RFM stats — the online face of
    * [[graft.operators.TimeJoins.rfmSegments]]: three running
    * aggregates per user (last event µs, event count, summed integer
    * cents — the t92 FLOOR(v·100+0.5) contract) as streaming keyed
    * state, emitted in complete mode;
    * [[graft.operators.TimeJoins.rfmFromUserStats]] is the shared
    * back half that turns a state snapshot into the quartile grid, so
    * the streamed segmentation equals the batch operator's
    * (StreamingSpec pins it). State is three longs per user.
    */
  def userStatsStream(events: DataFrame): DataFrame =
    events.groupBy(col("user_id")).agg(
      max(unix_micros(col("ts"))).as("last_tsu"),
      count(lit(1)).as("frequency"),
      sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
        .as("monetary_cents"))

  /** Streaming deduplication: drop repeated (user_id, event_type, ts)
    * events, with state bounded by the watermark
    * (dropDuplicatesWithinWatermark — the streaming face of the batch
    * exact-dedup operator; at 100 TB/day the dedup state holds only
    * keys inside the watermark horizon, not the full history).
    */
  def dedupedEvents(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type", "ts")

  /** Stream-static enrichment join: the static side (a dimension
    * table) is joined map-side against each micro-batch — Catalyst
    * broadcasts it, so the stream never shuffles. The standard shape
    * for joining a firehose against reference data.
    */
  def enrichedEvents(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left")

  /** Stream-vs-index exact dedup: drop arriving documents whose
    * content digest already exists in a persisted corpus index — the
    * streaming face of [[graft.operators.Dedup.incrementalDedup]]'s
    * exact pass (a continuously-arriving crawl deduped against the
    * accumulated corpus). The anti-join is stream-static: the index
    * relation is resolved per micro-batch, so an index table that
    * grows between batches is picked up without restarting the query;
    * only digests cross the join, never document bodies. The static
    * side here broadcasts (dev-scale); at 100 TB the index digest
    * table is bucketed on `h` and the join is shuffle-free on the
    * stream side too.
    */
  def dedupAgainstIndex(docs: DataFrame, indexDigests: DataFrame,
      textCol: String): DataFrame =
    docs.join(
      org.apache.spark.sql.functions.broadcast(indexDigests.select(col("h"))),
      sha2(col(textCol), 256) === col("h"), "left_anti")

  /** Streaming semantic admission: per micro-batch, dispose arriving
    * vectors against a static index via
    * [[graft.operators.Similarity.incrementalSemDedup]] and append
    * the dispositions (batch_id, status, match_id, cosine_sim) to a
    * parquet log — the streaming face of the t43 batch operator, as
    * [[dedupAgainstIndex]] is of the exact pass. The clustering math
    * needs driver actions (index count, checkpoints), so it runs
    * inside `foreachBatch`, where each micro-batch is a plain
    * DataFrame; the index relation is re-resolved per batch, so a
    * growing index is picked up without restarting the query.
    *
    * At-least-once caveat: a replayed micro-batch appends its
    * disposition rows again. The disposition of a given batch_id is
    * deterministic for a fixed index, so readers dedup the log by
    * batch_id (the same effectively-once-by-idempotence argument as
    * [[upsertToRelation]], with the dedup on the read side of a log
    * instead of the write side of a table).
    */
  def semDedupAgainstIndex(vecs: DataFrame, index: DataFrame,
      idCol: String, vecCol: String, outPath: String,
      minNlist: Int = 16, threshold: Double = 0.3): Unit = {
    val q = vecs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Similarity
          .incrementalSemDedup(index, batch, idCol, vecCol, minNlist, threshold)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming image admission: per micro-batch, fingerprint arriving
    * media payloads (real decode → pHash,
    * [[graft.operators.Multimodal.imagePhash]]) and dispose them
    * against a static fingerprint index via
    * [[graft.operators.Dedup.incrementalHammingDedup]], appending
    * (batch_id, status, match_id, hamming) to a parquet log — the
    * multimodal face of [[semDedupAgainstIndex]], completing the
    * streaming admission family (exact digests → text MinHash →
    * embeddings → images). Runs in `foreachBatch` (the banding join
    * needs a plain DataFrame); the index re-resolves per batch, so a
    * growing fingerprint index is picked up without restart. Same
    * at-least-once caveat as [[semDedupAgainstIndex]]: dispositions
    * are deterministic for a fixed index, so readers dedup the log
    * by batch_id.
    */
  def imageDedupAgainstIndex(payloads: DataFrame, index: DataFrame,
      idCol: String, outPath: String, maxHamming: Int = 3): Unit =
    fingerprintAdmission(payloads, index, outPath, maxHamming, "phash",
      batch => graft.operators.Multimodal.imagePhash(batch, idCol))

  /** Streaming audio admission: the audio face of
    * [[imageDedupAgainstIndex]] — arriving payloads run the real
    * audio decode → binned-energy fingerprint
    * ([[graft.operators.Multimodal.audioFingerprint]]) and dispose
    * against a static `afp` index through the same Hamming banding
    * core. Same per-batch index re-resolution and at-least-once
    * log-dedup contract.
    */
  def audioDedupAgainstIndex(payloads: DataFrame, index: DataFrame,
      idCol: String, outPath: String, maxHamming: Int = 3): Unit =
    fingerprintAdmission(payloads, index, outPath, maxHamming, "afp",
      batch => graft.operators.Multimodal.audioFingerprint(batch, idCol))

  /** Shared fingerprint-admission core: per micro-batch, compute
    * 64-bit fingerprints for the arriving payloads and dispose them
    * against the static index via
    * [[graft.operators.Dedup.incrementalHammingDedup]], appending
    * dispositions to the parquet log.
    */
  private def fingerprintAdmission(payloads: DataFrame, index: DataFrame,
      outPath: String, maxHamming: Int, fpCol: String,
      fingerprint: DataFrame => DataFrame): Unit = {
    val q = payloads.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Dedup.incrementalHammingDedup(
          index, fingerprint(batch.toDF()),
          "doc_id", fpCol, maxHamming)
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming winnow-sketch admission — the boilerplate gate on an
    * ingestion stream: per micro-batch of arriving documents, the
    * map-only winnowing pass selects each document's fingerprints and
    * [[graft.operators.Dedup.incrementalWinnowDedup]] disposes them
    * against the static corpus sketch (admit iff fewer than
    * `minShared` selected hashes already indexed), appending the
    * disposition log to parquet — the same per-batch shape as the
    * image/audio [[fingerprintAdmission]] faces, with the winnowed
    * index 2/(w+1) the size of a full gram index.
    */
  def winnowAdmissionStream(docs: DataFrame, indexFps: DataFrame,
      outPath: String, idCol: String = "doc_id", textCol: String = "text",
      k: Int = 3, w: Int = 4, minShared: Int = 2): Unit = {
    val q = docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Dedup.incrementalWinnowDedup(
          indexFps, batch.toDF(), idCol, textCol, k, w, minShared)
          .withColumn("batch_no", lit(batchId))
          .write.mode("append").parquet(outPath)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming winnow-index maintenance: per micro-batch, fingerprint
    * the arriving documents with the persisted index's FROZEN (k, w)
    * and append their distinct fps into the fp buckets
    * ([[graft.operators.Dedup.ingestWinnowBatch]]) — the ingestion
    * face of the winnowing-index lifecycle (as
    * [[winnowAdmissionStream]] is the admission face): everything
    * streamed becomes immediately matchable through
    * [[graft.operators.Dedup.searchWinnowIndex]]'s pruned probe.
    * Requires an existing [[graft.operators.Dedup.buildWinnowIndex]]
    * snapshot (the sketch parameters live in the index). The index is
    * a fingerprint SET and union is its merge, so the final state is
    * independent of the micro-batch cut AND of replays (set union is
    * idempotent — StreamingSpec pins streamed state equal to the
    * one-shot batch build); replayed batches only leave duplicate
    * rows for [[graft.operators.Dedup.compactWinnowIndex]] to reclaim.
    */
  def winnowIngestStream(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val q = docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // the micro-batch lives in the stream's CLONED session — the
        // ingest registers its functions there, not on the outer one
        graft.operators.Dedup.ingestWinnowBatch(
          batch.sparkSession, path, batch.toDF(), idCol, textCol)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming MinHash band-index maintenance: per micro-batch,
    * sketch the arriving documents with the persisted index's FROZEN
    * (n, numPerms, bands) and append signatures + band keys into
    * their buckets ([[graft.operators.Dedup.ingestBandBatch]]; sigs
    * first — the append ordering that can never silently admit a
    * duplicate). Deterministic sketching ⇒ the final state is
    * independent of the micro-batch cut (StreamingSpec pins streamed
    * state equal to the one-shot build); replays only leave duplicate
    * rows for [[graft.operators.Dedup.compactBandIndex]].
    */
  def bandIngestStream(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val q = docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Dedup.ingestBandBatch(
          batch.sparkSession, path, batch.toDF(), idCol, textCol)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming KMV sketch-store maintenance: per micro-batch, fold
    * the arriving documents' per-group bottom-k sketches into the
    * persisted store ([[graft.operators.CorpusOps.ingestKmvBatch]]
    * with the store's FROZEN (n, k)). KMV's exact merge law makes the
    * final state independent of the micro-batch cut — StreamingSpec
    * pins streamed ingestion equal to the one-shot build — and
    * replays are admission-idempotent (read-time bottom-k
    * re-selection ignores duplicate rows;
    * [[graft.operators.CorpusOps.compactKmvStore]] reclaims).
    */
  def kmvIngestStream(docs: DataFrame, textCol: String, groupCol: String,
      path: String): Unit = {
    val q = docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.CorpusOps.ingestKmvBatch(
          batch.sparkSession, path, batch.toDF(), textCol, groupCol)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming quantile-map maintenance: per micro-batch, add the
    * arriving reference documents' score histogram into the persisted
    * map ([[graft.operators.CorpusOps.ingestQuantileBatch]]).
    * Histograms ADD, so the final map is independent of the
    * micro-batch cut (StreamingSpec pins streamed fit equal to the
    * one-shot fit) and the transform face
    * ([[graft.operators.CorpusOps.percentileFromMap]]) over the live
    * store calibrates against everything streamed so far.
    */
  def quantileIngestStream(docs: DataFrame, scoreCol: String,
      path: String): Unit = {
    val q = docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.CorpusOps.ingestQuantileBatch(
          batch.sparkSession, path, batch.toDF(), scoreCol)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming Bloom-registry maintenance: per micro-batch, register
    * the arriving benchmark/canary documents into the persisted
    * decontamination registry
    * ([[graft.operators.CorpusOps.ingestBloomBatch]]). Bloom words
    * merge by bitwise OR, so the final registry is independent of
    * the micro-batch cut (StreamingSpec pins streamed registration
    * equal to the one-shot build) and replays are absorbed.
    */
  def bloomIngestStream(docs: DataFrame, textCol: String,
      path: String): Unit = {
    val q = docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.CorpusOps.ingestBloomBatch(
          batch.sparkSession, path, batch.toDF(), textCol)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming inverted-index maintenance: per micro-batch, ingest
    * the arriving documents into the persisted term-bucketed index
    * via [[graft.operators.CorpusOps.appendToInvertedIndex]] — batch
    * postings appended into their buckets, corpus stats folded into
    * meta — so [[graft.operators.CorpusOps.searchInvertedIndex]] over
    * the live state answers retrieval over everything streamed so
    * far. Works from a cold start (the first micro-batch's stats
    * become meta) or on top of a [[graft.operators.CorpusOps.buildInvertedIndex]]
    * snapshot. Per-batch cost tracks the batch.
    *
    * At-least-once caveat: postings appends are NOT replay-idempotent
    * (a replayed micro-batch re-appends its rows and inflates tf/df)
    * — the same single-ingest contract as the batch append; pass a
    * checkpointLocation-backed source when replays must be excluded.
    */
  def invertedIndexStream(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val q = docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // the micro-batch lives in the stream's CLONED session — any
        // function registration must land there, not on the outer one
        graft.operators.CorpusOps.appendToInvertedIndex(
          batch.sparkSession, path, batch.toDF(), idCol, textCol)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming IVF-PQ ingestion: per micro-batch, route and encode
    * arriving vectors against a persisted index's FROZEN quantizer
    * ([[graft.operators.Similarity.appendToIvfPqIndex]]) and append
    * them into their cell partitions — the ingestion face of the
    * vector-index lifecycle (as [[semDedupAgainstIndex]] is the
    * admission face): everything streamed becomes immediately
    * searchable through
    * [[graft.operators.Similarity.searchIvfPqIndex]]'s pruned scan.
    * Requires an existing [[graft.operators.Similarity.buildIvfPqIndex]]
    * snapshot (the quantizer must exist to route against). Routing is
    * deterministic under the frozen quantizer, so the final
    * cells/codes contents are independent of the micro-batch cut —
    * StreamingSpec pins stream-ingested state equal to one batch
    * append of the union. Same single-ingest replay caveat as the
    * batch append.
    */
  def ivfPqIngestStream(vecs: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val q = vecs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        // register on the stream's cloned session (see
        // [[invertedIndexStream]])
        graft.operators.Similarity.appendToIvfPqIndex(
          batch.sparkSession, path, batch.toDF(), idCol, vecCol)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming IVF-binary ingestion — the 1-bit twin of
    * [[ivfPqIngestStream]]: per micro-batch, route arrivals against
    * the persisted index's frozen quantizer and append their sign-bit
    * words into the cell partitions
    * ([[graft.operators.Similarity.appendToIvfBinaryIndex]]);
    * everything streamed becomes immediately searchable through the
    * pruned [[graft.operators.Similarity.searchIvfBinaryIndex]] scan.
    * Deterministic routing ⇒ state independent of the micro-batch
    * cut (StreamingSpec pins it equal to one batch append).
    */
  def ivfBinaryIngestStream(vecs: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val q = vecs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.Similarity.appendToIvfBinaryIndex(
          batch.sparkSession, path, batch.toDF(), idCol, vecCol)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming HLL maintenance: per micro-batch, fold the arriving
    * documents' n-gram hashes into HLL registers
    * ([[graft.operators.CorpusOps.hllRegisters]]) and MERGE-BY-MAX
    * into the (bucket, r) register relation at `path` — the
    * streaming proof of the sketch's mergeability claim: r is a
    * max-semilattice, so the maintained state equals the batch
    * registers of everything ever streamed, any batch replay is
    * idempotent (at-least-once becomes effectively-once without a
    * read-side dedup), and
    * [[graft.operators.CorpusOps.hllEstimateFromRegisters]] over the
    * state is the live distinct-count. State is ≤ 2^p rows on disk,
    * never executor memory; the same move-aside atomic swap as
    * [[upsertToRelation]] (which is NOT reused directly: its
    * merge REPLACES a key's row with the batch's, where registers
    * need max(old, new)).
    */
  def hllSketchStream(docs: DataFrame, textCol: String, n: Int, p: Int,
      path: String): Unit = {
    val spark = docs.sparkSession
    val q = docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val regs = graft.operators.CorpusOps
          .hllRegisters(batch.toDF(), textCol, n, p)
        val merged =
          if (relationExists(spark, path))
            spark.read.parquet(path).unionByName(regs)
              .groupBy("bucket").agg(max(col("r")).as("r"))
          else regs
        swapInRelation(merged, path)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Streaming count-min maintenance. CM counters merge by SUM,
    * which — unlike the HLL registers' max ([[hllSketchStream]]) —
    * is NOT idempotent under foreachBatch's at-least-once replay: a
    * merged-in-place state would double-count a replayed batch. So
    * the durable state is a per-batch DELTA LOG ((run_id, batch_id,
    * j, bucket, c) appended per micro-batch — counter deltas are
    * deterministic for a batch, so a replay appends byte-identical
    * rows) and the live counters come from the read side:
    * [[cmCountersOfLog]] dedups whole rows and sums per (j, bucket)
    * — the same read-side effectively-once contract as the admission
    * disposition logs. State on disk is ≤ batches·depth·width rows.
    *
    * `run_id` disambiguates QUERY LIFETIMES sharing one log:
    * foreachBatch batch ids restart at 0 per query run, so without it
    * a later run ingesting NEW data could emit rows byte-identical to
    * an earlier run's and have legitimate deltas silently collapse
    * (undercount). With `checkpointLocation` set, run_id is the
    * checkpoint path — stable across RESTARTS of the same query, so
    * an interrupted batch replayed after recovery still dedups — and
    * the checkpoint guarantees the restarted query resumes instead of
    * re-reading its input. Without a checkpoint, run_id is a fresh
    * UUID per call: correct for a log fed by many one-shot ingests of
    * DISTINCT data, but re-running the same source twice ingests it
    * twice by design (there is no cross-run input tracking to say
    * otherwise).
    */
  def cmSketchStream(docs: DataFrame, textCol: String, n: Int, width: Int,
      path: String, checkpointLocation: Option[String] = None): Unit = {
    val runId = checkpointLocation
      .map(cp => canonicalPath(docs.sparkSession, cp))
      .getOrElse(java.util.UUID.randomUUID.toString)
    val writer = docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        graft.operators.CorpusOps.cmCounters(batch.toDF(), textCol, n, width)
          .withColumn("run_id", lit(runId))
          .withColumn("batch_id", lit(id))
          .write.mode("append").parquet(path)
        ()
      }
    val q = checkpointLocation
      .fold(writer)(cp => writer.option("checkpointLocation", cp))
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** The fully-qualified canonical URI of a path — the run identity
    * [[cmSketchStream]] stamps on checkpointed delta rows. Raw
    * checkpoint STRINGS are a broken identity: "/cp", "/cp/" and
    * "file:/cp" all resume the same Spark checkpoint, but as raw
    * run_ids they would stop the read-side distinct from collapsing a
    * replayed batch logged under a different spelling (double count).
    */
  private[graft] def canonicalPath(spark: SparkSession,
      p: String): String = {
    val hp = new org.apache.hadoop.fs.Path(p)
    val u = hp.getFileSystem(spark.sessionState.newHadoopConf())
      .makeQualified(hp).toUri
    // rebuild scheme://authority/path explicitly: URI.toString renders
    // an absent authority as "file:/x" for some inputs and "file:///x"
    // for others, which would split one identity into two spellings
    s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}${u.getPath}"
  }

  /** Live CM counters from a [[cmSketchStream]] delta log: replayed
    * batches collapse under the whole-row distinct (keyed by the full
    * (run_id, batch_id, j, bucket, c) row), then deltas sum.
    */
  def cmCountersOfLog(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .distinct()
      .groupBy("j", "bucket")
      .agg(sum(col("c")).as("c"))

  /** Stream-stream interval join: each click joined to the same
    * user's views from the preceding `window` — the canonical
    * two-firehose correlation. BOTH sides carry watermarks and the
    * join condition bounds event time in both directions, so Spark
    * can size the state store exactly: a buffered view is evicted as
    * soon as the click-side watermark passes `view_ts + window`, and
    * vice versa — state is O(watermark horizon), never O(stream).
    * At 100 TB/day this is the shape that keeps a correlation join
    * running indefinitely.
    */
  def clickViewJoin(events: DataFrame, window: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
      col("user_id") === col("view_user") &&
        col("view_ts") >= col("click_ts") - expr(s"INTERVAL $window") &&
        col("view_ts") <= col("click_ts"))
      .select("click_id", "user_id", "view_id", "click_ts", "view_ts")
  }

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * escape hatch for state machines session_window can't express
    * (here: emit a summary whenever a session's event budget or the
    * timeout closes it).
    */
  def statefulSessions(events: Dataset[Event], maxEventsPerSession: Int = 100)(
      implicit enc: org.apache.spark.sql.Encoder[SessionSummary],
      stateEnc: org.apache.spark.sql.Encoder[(Int, Double, Long, Long)])
      : Dataset[SessionSummary] = {
    events.groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[(Int, Double, Long, Long), SessionSummary](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[(Int, Double, Long, Long)]) =>
          var (n, total, startTs, endTs) = state.getOption.getOrElse((0, 0.0, Long.MaxValue, 0L))
          val out = scala.collection.mutable.ListBuffer.empty[SessionSummary]
          for (e <- rows) {
            n += 1; total += e.value
            startTs = math.min(startTs, e.ts.getTime)
            endTs = math.max(endTs, e.ts.getTime)
            if (n >= maxEventsPerSession) {
              out += SessionSummary(userId, n, total,
                new java.sql.Timestamp(startTs), new java.sql.Timestamp(endTs))
              n = 0; total = 0.0; startTs = Long.MaxValue; endTs = 0L
            }
          }
          if (n > 0) state.update((n, total, startTs, endTs)) else state.remove()
          out.iterator
      }
  }

  final case class PitFeatures(event_id: Long, user_id: Long,
      n_prior: Long, n_prior_target: Long, prior_value_cents: Long,
      late: Boolean)

  /** Streaming point-in-time features — the online face of
    * [[graft.operators.TimeJoins.pointInTimeFeatures]]: per-user
    * running state (event count, target count, value cents) is read
    * BEFORE each arriving event updates it, so every emitted feature
    * row aggregates strictly earlier history only — the identical
    * leakage contract the batch operator enforces with its
    * 1-PRECEDING frame, realized here as keyed state that a serving
    * path reads at request time (train/serve consistency by
    * construction). Within a micro-batch, a user's events apply in
    * (ts, event_id) order — the batch operator's total order.
    *
    * CROSS-batch ordering cannot be assumed: an event arriving in a
    * later micro-batch with an earlier event time would read state
    * that already includes later-timestamped history — features that
    * both diverge from the batch operator and leak the future relative
    * to event time. The state therefore carries the user's last-seen
    * (event-time µs, event_id) high-water mark; an arrival at or below
    * it is emitted with `late = true` and does NOT advance state (its
    * out-of-order contribution would corrupt every subsequent forward
    * feature). Consumers drop (or route to backfill) late rows; the
    * batch equivalence contract holds exactly for the `late = false`
    * stream, which is the whole stream whenever arrival respects
    * event-time order across batches (always true within one batch).
    *
    * State is five longs per user — O(|users|), not O(stream).
    */
  def pitFeatureStream(events: Dataset[Event], targetType: String)(
      implicit enc: org.apache.spark.sql.Encoder[PitFeatures],
      stateEnc: org.apache.spark.sql.Encoder[(Long, Long, Long, Long, Long)])
      : Dataset[PitFeatures] = {
    events.groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[(Long, Long, Long, Long, Long), PitFeatures](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[(Long, Long, Long, Long, Long)]) =>
          var (n, nTgt, cents, lastUs, lastId) =
            state.getOption.getOrElse((0L, 0L, 0L, Long.MinValue, Long.MinValue))
          val out = scala.collection.mutable.ListBuffer.empty[PitFeatures]
          // (seconds, nanos-within-second, id): getTime alone is
          // millisecond-truncated and would misorder same-ms events
          for (e <- rows.toSeq.sortBy(e =>
              (e.ts.getTime / 1000, e.ts.getNanos, e.event_id))) {
            val us = (e.ts.getTime / 1000) * 1000000L + e.ts.getNanos / 1000
            val late = us < lastUs || (us == lastUs && e.event_id <= lastId)
            out += PitFeatures(e.event_id, userId, n, nTgt, cents, late)
            if (!late) {
              n += 1
              if (e.event_type == targetType) nTgt += 1
              cents += math.floor(e.value * 100 + 0.5).toLong
              lastUs = us; lastId = e.event_id
            }
          }
          state.update((n, nTgt, cents, lastUs, lastId))
          out.iterator
      }
  }

  final case class FunnelUser(user_id: Long, reached: Int,
      stage_ts: Seq[Long])

  /** Streaming funnel state — the online face of
    * [[graft.operators.TimeJoins.funnel]] (t111): per-user keyed
    * state carries each stage's FIRST-TOUCH completion time; an
    * arriving event advances stage i+1 iff it matches the stage type,
    * lands strictly after the user's stage-i time, and within
    * `maxGapUs` of it — the identical windowed first-touch contract
    * the batch operator realizes with chained window minima.
    * Incremental processing in event-time order reaches the same
    * fixed point because a stage time, once set, is final (the
    * earliest qualifying event has already arrived), so the batch
    * equivalence holds exactly for event-time-ordered arrival;
    * cross-batch LATE events are dropped under the same per-user
    * (event-time, id) high-water mark as [[pitFeatureStream]] (an
    * out-of-order event could otherwise bind a stage the batch
    * operator would bind earlier).
    *
    * Emits the users whose funnel state CHANGED in the micro-batch —
    * `reached` (deepest stage index + 1) and the per-stage first-touch
    * times (-1 = not reached); the latest row per user IS the funnel
    * readout (per-stage counts = users with reached >= i). State is
    * |stages|+2 longs per user — O(|users|), not O(stream).
    */
  def funnelStream(events: Dataset[Event], stages: Seq[String],
      maxGapUs: Long = Long.MaxValue)(
      implicit enc: org.apache.spark.sql.Encoder[FunnelUser],
      stateEnc: org.apache.spark.sql.Encoder[(Seq[Long], Long, Long)])
      : Dataset[FunnelUser] = {
    require(stages.size >= 2, "need at least two funnel stages")
    require(maxGapUs > 0)
    val nStages = stages.size
    events.groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[(Seq[Long], Long, Long), FunnelUser](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[(Seq[Long], Long, Long)]) =>
          var (ts0, lastUs, lastId) = state.getOption.getOrElse(
            (Seq.fill(nStages)(-1L), Long.MinValue, Long.MinValue))
          val st = ts0.toArray
          var changed = false
          for (e <- rows.toSeq.sortBy(e =>
              (e.ts.getTime / 1000, e.ts.getNanos, e.event_id))) {
            val us = (e.ts.getTime / 1000) * 1000000L + e.ts.getNanos / 1000
            val late = us < lastUs || (us == lastUs && e.event_id <= lastId)
            if (!late) {
              lastUs = us; lastId = e.event_id
              val i = stages.indexOf(e.event_type)
              if (i >= 0 && st(i) < 0) {
                val qualifies =
                  if (i == 0) true
                  else st(i - 1) >= 0 && us > st(i - 1) &&
                    us - st(i - 1) <= maxGapUs
                if (qualifies) { st(i) = us; changed = true }
              }
            }
          }
          state.update((st.toSeq, lastUs, lastId))
          if (changed)
            Iterator(FunnelUser(userId, st.takeWhile(_ >= 0).size, st.toSeq))
          else Iterator.empty
      }
  }

  final case class NextEventPair(event_id: Long, user_id: Long,
      etype: String, next_type: String, neg_type: Option[String])

  /** Streaming next-event training pairs — the online face of
    * [[graft.operators.TimeJoins.nextEventPairs]] (t107): per-user
    * keyed state holds the LAST seen event; when the successor
    * arrives, the completed (event → next) pair is emitted with the
    * deterministic hash-drawn negative from the FROZEN type catalog
    * `types` (sorted; the batch operator derives it from the full
    * log — a serving face freezes it, exactly like a deployed
    * vocabulary). The negative replays the batch draw bit-for-bit
    * ([[graft.operators.CorpusOps.idMixLong]] applied cyclically
    * after the positive's catalog position), so on an event-time-
    * ordered source the emitted pairs equal the batch operator's
    * rows whose catalog matches. Cross-batch LATE events are dropped
    * under the per-user high-water mark (pairing them would invert
    * the sequence the label stands for); a single-type catalog
    * yields None negatives, the batch operator's documented
    * degenerate case.
    *
    * State is one (ts µs, id, type) triple per user.
    */
  def nextEventPairStream(events: Dataset[Event], types: Seq[String])(
      implicit enc: org.apache.spark.sql.Encoder[NextEventPair],
      stateEnc: org.apache.spark.sql.Encoder[(Long, Long, String)])
      : Dataset[NextEventPair] = {
    require(types.nonEmpty && types == types.sorted,
      "types must be the sorted frozen catalog")
    val cat = types.toIndexedSeq
    events.groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
      .flatMapGroupsWithState[(Long, Long, String), NextEventPair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event],
            state: GroupState[(Long, Long, String)]) =>
          var (lastUs, lastId, lastType) = state.getOption.getOrElse(
            (Long.MinValue, Long.MinValue, null: String))
          val out = scala.collection.mutable.ListBuffer.empty[NextEventPair]
          for (e <- rows.toSeq.sortBy(e =>
              (e.ts.getTime / 1000, e.ts.getNanos, e.event_id))) {
            val us = (e.ts.getTime / 1000) * 1000000L + e.ts.getNanos / 1000
            val late = us < lastUs || (us == lastUs && e.event_id <= lastId)
            if (!late) {
              if (lastType != null) {
                val posIdx = cat.indexOf(e.event_type).toLong
                val neg =
                  if (cat.size > 1 && posIdx >= 0) {
                    val mix = graft.operators.CorpusOps.idMixLong(
                      userId * 1048576L + lastId)
                    val negIdx = (posIdx + 1L + mix % (cat.size - 1L)) % cat.size
                    Some(cat(negIdx.toInt))
                  } else None
                out += NextEventPair(lastId, userId, lastType,
                  e.event_type, neg)
              }
              lastUs = us; lastId = e.event_id; lastType = e.event_type
            }
          }
          state.update((lastUs, lastId, lastType))
          out.iterator
      }
  }

  /** Streaming corpus-drift monitor — the online face of the batch
    * drift/divergence reports (t79/t102): per micro-batch of arriving
    * documents, the L1 distance (1e6 fixed point) between the batch's
    * unigram distribution and a BROADCAST reference distribution
    * (per-word ppm, typically the corpus snapshot the current mixture
    * was tuned on). A spike in the emitted series is the
    * upstream-changed alarm that gates auto-ingestion.
    *
    * Same exact decomposition as the batch operator: Σ_shared
    * |p_batch − p_ref| + each side's missing mass — words absent from
    * one side contribute their full weight without a vocabulary
    * union. Per batch the state is the reference relation only
    * (broadcast, never grows); emits one row (batch_id, n_docs,
    * n_tokens, l1_ppm) per micro-batch via foreachBatch into `sink`.
    *
    * An EMPTY batch (zero tokens) scores the reference's own total
    * mass — exactly what the L1 decomposition assigns a batch sharing
    * no vocabulary with the reference (Σ ref ppm ≈ 1e6 minus floor
    * dust), so the series stays on one scale with no sentinel value a
    * reader could mistake for a genuinely disjoint batch.
    */
  def driftMonitorStream(docs: DataFrame, textCol: String,
      reference: DataFrame, sink: scala.collection.mutable.Buffer[(Long, Long, Long, Long)]): Unit = {
    import org.apache.spark.sql.functions._
    // one driver-side scalar, computed once outside the batch loop
    val refMass = reference.agg(coalesce(sum("ppm"), lit(0L)))
      .collect()(0).getLong(0)
    val q = docs.writeStream.outputMode("append")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val cnt = batch.toDF()
          .select(explode(graft.functions.TextFunctions.tokens(col(textCol)))
            .as("w"))
          .groupBy("w").agg(count(lit(1)).as("c"))
        val nDocs = batch.count()
        val tot = cnt.agg(coalesce(sum("c"), lit(0L))).collect()(0).getLong(0)
        val l1 =
          if (tot == 0L) refMass
          else {
            val ppm = cnt.select(col("w"),
              expr(s"(c * 1000000) div $tot").as("ppm"))
            val joined = ppm.join(reference
                .select(col("w"), col("ppm").as("ref_ppm")), Seq("w"), "full")
              .agg(
                coalesce(sum(abs(coalesce(col("ppm"), lit(0L)) -
                  coalesce(col("ref_ppm"), lit(0L)))), lit(0L)).as("l1"))
            joined.collect()(0).getLong(0)
          }
        sink.synchronized { sink += ((batchId, nDocs, tot, l1)) }
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Drive a streaming query synchronously into a memory sink
    * (local smoke path: batch parquet feeds the stream).
    */
  def runToMemory(df: DataFrame, name: String, outputMode: String = "append"): DataFrame = {
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode(outputMode).start()
    q.processAllAvailable()
    q.stop()
    df.sparkSession.table(name)
  }

  /** Streaming upsert sink: `foreachBatch` merge-by-key into a keyed
    * parquet relation — the streaming twin of the incremental
    * `unique_key` materialization (same anti-join + union dataflow,
    * same move-aside atomic swap; on a cluster both become a Delta
    * MERGE). Each micro-batch dedups to its LAST row per key (batch
    * order, then a deterministic tie-break column) before merging, so
    * replayed/duplicate events converge — the sink is idempotent
    * per key, which is what makes foreachBatch's at-least-once
    * delivery effectively-once here.
    *
    * Scale shape: per micro-batch ONE anti-join shuffle keyed on
    * `key` plus the rewrite of the relation (partition-level
    * insert-overwrite / MERGE at cluster scale); batch dedup is a
    * rank-pushdown window per key. State lives in the relation, not
    * executor memory.
    */
  def upsertToRelation(df: DataFrame, key: String, orderCol: String,
      path: String): Unit = {
    val spark = df.sparkSession
    val q = df.writeStream.outputMode("update")
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val w = Window.partitionBy(key).orderBy(col(orderCol).desc)
        val latest = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        val merged =
          if (relationExists(spark, path)) {
            val old = spark.read.parquet(path)
            old.join(latest.select(key).distinct(), Seq(key), "left_anti")
              .unionByName(latest.select(old.columns.map(col): _*))
          } else latest
        swapInRelation(merged, path)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
  }

  /** Materialize `merged` (whose lineage may READ the relation at
    * `path`) into a staging dir, then atomically move it into place —
    * the shared swap for every foreachBatch relation sink.
    */
  private def relationExists(spark: SparkSession, path: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).exists(hp)
  }

  private def swapInRelation(merged: DataFrame, path: String): Unit = {
    // HADOOP filesystem ops throughout, so the streamed state lives
    // wherever the pipeline does (hdfs://, s3a://, file:) — java.nio
    // moves only ever worked for bare local paths
    val spark = merged.sparkSession
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new org.apache.hadoop.fs.Path(path + "__staging")
    merged.write.mode("overwrite").parquet(staging.toString)
    val retired = new org.apache.hadoop.fs.Path(path + "__retired")
    // checked swaps ([[graft.core.FsOps]]): a silent rename/delete
    // failure here leaves the streamed state dir missing or stale
    // with no error until a later read
    graft.core.FsOps.deleteOrThrow(fs, retired)
    if (fs.exists(dir)) graft.core.FsOps.renameOrThrow(fs, dir, retired)
    graft.core.FsOps.renameOrThrow(fs, staging, dir)
    graft.core.FsOps.deleteOrThrow(fs, retired)
  }
}
