package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in form for (builder
  * brief: as-of join, range join), expressed as scale-safe dataflows
  * rather than inequality joins:
  *
  *   - [[asOf]] — union + keyed running-window: ONE shuffle on the
  *     key, no range-condition join (Spark would plan an inequality
  *     join as a broadcast nested loop or cartesian — quadratic per
  *     key).
  *   - [[rangeCountPreceding]] — banded (time-bucketed) equi-join:
  *     the inequality is reduced to bucket equality + a residual
  *     filter, so per-key fan-in is bounded by window occupancy, and
  *     AQE can split any hot (key, bucket).
  */
object TimeJoins {

  /** As-of join: for each left row, the single latest right row with
    * `rightTs <= leftTs` and the same key (LEFT-join semantics —
    * unmatched left rows keep null payloads).
    *
    * Plan: tag both sides, union by name, one window per key ordered
    * by (ts, side, tieBreak) carrying `last(payload, ignoreNulls)` —
    * right rows sort before left rows at equal timestamps so equality
    * matches, and `tieBreak` makes the winner among equal-ts right
    * rows deterministic (the max tieBreak value wins).
    *
    * Scale: one shuffle on the key; each window partition is one
    * key's event history (bounded, time-ordered) — the sort is the
    * only per-key cost, and nothing is quadratic. This is the plan an
    * inequality-join rewrite cannot reach.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String],
      tieBreak: String): DataFrame = {
    val leftCols = left.columns
    val r = right.select(
      (Seq(col(key), col(rightTs).as("__t"), lit(0).as("__side"),
        col(tieBreak).as("__tie")) ++
        payload.map(p => col(p).as(s"__p_$p"))): _*)
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(r.schema("__tie").dataType))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col("__t"), col("__side"), col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(s"__p_$p"), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select((leftCols.map(col) ++ payload.map(col)): _*)
  }

  /** Range-count join: for each left row, the number of right rows
    * with the same key in the half-open window
    * `[leftTs - window, leftTs)`. LEFT-join semantics: zero counts
    * are kept.
    *
    * Plan: both sides bucket by `floor(ts / window)`; every left row
    * probes its own bucket and the preceding one (the window spans at
    * most two buckets), the join is a pure equi-join on
    * (key, bucket), and the residual range predicate filters inside
    * the bucket. The count partial-aggregates before the final join
    * back to the left side.
    */
  def rangeCountPreceding(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, window: Long, leftId: String,
      countName: String): DataFrame = {
    val probes = left.select(col(leftId).as("__lid"), col(key).as("__k"),
        col(leftTs).as("__lt"),
        explode(array(expr(s"$leftTs div $window"),
          expr(s"$leftTs div $window - 1"))).as("__b"))
    val build = right.select(col(key).as("__k"),
      col(rightTs).as("__rt"), expr(s"$rightTs div $window").as("__b"))
    val counts = probes.join(build, Seq("__k", "__b"))
      .filter(col("__rt") >= col("__lt") - window && col("__rt") < col("__lt"))
      .groupBy("__lid").agg(count(lit(1)).as(countName))
    left.join(counts, left(leftId) === counts("__lid"), "left")
      .drop("__lid")
      .withColumn(countName, coalesce(col(countName), lit(0L)))
  }

  /** Ordered funnel analysis — the classic product-analytics read
    * over an event log: for a stage sequence (e.g. signup → view →
    * purchase), a user reaches stage i+1 only via an event STRICTLY
    * AFTER their stage-i completion time and WITHIN `maxGapUs` of it
    * (the windowed-funnel contract — "viewed within an hour of
    * signup"; first-touch semantics: each stage binds to its earliest
    * qualifying event). Emits one
    * row per stage: users reaching it, conversion from stage 1 and
    * from the previous stage (ppm — exact integer divisions).
    *
    * Scale shape: ONE shuffle on the user key; each stage is one
    * more Window pass over the SAME partitioning (a min over a
    * condition referencing the previous stage's window value), so
    * Catalyst plans re-sorts, never new exchanges; the per-stage
    * counts are a |stages|-row aggregation of per-user booleans.
    */
  def funnel(events: DataFrame, userCol: String, tsUsCol: String,
      typeCol: String, stages: Seq[String],
      maxGapUs: Long = Long.MaxValue): DataFrame = {
    require(stages.size >= 2, "need at least two funnel stages")
    require(maxGapUs > 0, s"maxGapUs must be positive, got $maxGapUs")
    val w = Window.partitionBy("user_id")
    val base = events.select(col(userCol).as("user_id"),
      col(tsUsCol).as("tsu"), col(typeCol).as("etype"))
    val staged = stages.zipWithIndex.foldLeft(base) {
      case (df, (stage, i)) =>
        val cond =
          if (i == 0) col("etype") === stage
          else col("etype") === stage && col(s"s${i - 1}").isNotNull &&
            col("tsu") > col(s"s${i - 1}") &&
            col("tsu") - col(s"s${i - 1}") <= maxGapUs
        df.withColumn(s"s$i", min(when(cond, col("tsu"))).over(w))
    }
    val reach = stages.indices.map(i =>
      max(col(s"s$i").isNotNull.cast("long")).as(s"r$i"))
    val perUser = staged.groupBy("user_id")
      .agg(reach.head, reach.tail: _*)
    val stageCounts = stages.indices.map(i => sum(s"r$i").as(s"n$i"))
    val counts = perUser.agg(count(lit(1)).as("n_users"),
      stageCounts: _*)
    val rows = stages.zipWithIndex.map { case (stage, i) =>
      struct(lit(i + 1).cast("long").as("stage_no"),
        lit(stage).as("stage"),
        col(s"n$i").as("n_reached"),
        expr(s"(n$i * 1000000) div greatest(n0, 1)").as("from_first_ppm"),
        expr(s"(n$i * 1000000) div greatest(n${math.max(i - 1, 0)}, 1)")
          .as("from_prev_ppm"))
    }
    counts.select(explode(array(rows: _*)).as("s"))
      .select(col("s.stage_no"), col("s.stage"), col("s.n_reached"),
        col("s.from_first_ppm"), col("s.from_prev_ppm"))
  }

  /** Point-in-time feature snapshot — the leakage-safe feature-
    * engineering primitive: for every event, aggregates over the
    * SAME user's STRICTLY EARLIER events only (the frame ends at
    * 1 PRECEDING), so a model trained on these rows never sees
    * information from its own label's timestamp or later — the
    * train/serve-consistent "features as of event time" contract a
    * feature store enforces. Emitted per event: prior event count,
    * prior count of `targetType` events, prior value sum in exact
    * integer cents, and the µs gap to the previous event (null on a
    * user's first event).
    *
    * Determinism: timestamps stay exact integer µs, values scale to
    * cents by one pure-double FLOOR, and every aggregate is an
    * order-independent integer sum within a total (tsu, id) order.
    *
    * Scale shape: ONE shuffle on the user key; all four features
    * share the single per-user window sort. The frame is
    * unbounded-preceding (running state, O(1) per row), never a
    * re-scan per event.
    */
  /** Next-event prediction pairs — the sequential-recommendation
    * export: each event whose user has a successor becomes one
    * training example (the point-in-time context is [[t106|
    * pointInTimeFeatures]]'s job; this op emits the LABEL side):
    * the true next event type as the positive, plus one
    * deterministic hash-drawn negative type from the catalog
    * (cyclically offset from the positive so it always differs —
    * a type catalog with one entry yields no negatives, documented).
    *
    * Scale shape: one per-user window (lead) for the positive; the
    * |types|-row catalog broadcasts for the negative draw. The
    * negative index is (idMix(packed event) mod (|types|−1)) applied
    * cyclically AFTER the positive's catalog position, so both
    * engines replay the same pick without a filter-and-retry loop.
    */
  def nextEventPairs(events: DataFrame, userCol: String, tsUsCol: String,
      ordCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    val base = events.select(col(userCol).as("user_id"),
        col(tsUsCol).as("tsu"), col(ordCol).as("event_id"),
        col(typeCol).as("etype"))
      .withColumn("next_type", lead(col("etype"), 1).over(w))
      .filter(col("next_type").isNotNull)
    val catalog = events.select(col(typeCol).as("t")).distinct()
      .agg(sort_array(collect_list(col("t"))).as("types"))
    base.crossJoin(broadcast(catalog))
      .withColumn("n_types", size(col("types")).cast("long"))
      .withColumn("pos_idx",
        (array_position(col("types"), col("next_type")) - 1L))
      .withColumn("neg_idx",
        when(col("n_types") > 1,
          (col("pos_idx") + 1L +
            graft.operators.CorpusOps.idMix(
              col("user_id") * lit(1048576L) + col("event_id"))
              % (col("n_types") - 1L)) % col("n_types")))
      .select(col("event_id"), col("user_id"), col("etype"),
        col("next_type"),
        element_at(col("types"), (col("neg_idx") + 1L).cast("int"))
          .as("neg_type"))
  }

  /** Per-user interaction-gap features — the automation/bot signal
    * set an interaction-log curation pass filters on before the log
    * becomes training data: event count, activity span, min/median/
    * max inter-event gap (exact integer µs; median = the lower median
    * ⌈n/2⌉-th smallest gap, deterministic with the (gap, id)
    * tie-break), and the count of sub-`burstUs` bursts — a user whose
    * median gap is milliseconds is a script, not a person.
    *
    * Scale shape: ONE shuffle on the user key; the ordering window,
    * the gap-rank window, and both aggregates all key on user_id, so
    * Catalyst plans re-sorts over the same exchange. Every statistic
    * is an exact integer the oracle replays (no avg/stddev floats).
    */
  def interactionGapFeatures(events: DataFrame, userCol: String,
      tsUsCol: String, ordCol: String,
      burstUs: Long = 1000000L): DataFrame = {
    require(burstUs > 0)
    val base = events.select(col(userCol).as("user_id"),
      col(tsUsCol).as("tsu"), col(ordCol).as("event_id"))
    val wOrd = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    val gaps = base
      .withColumn("gap", col("tsu") - lag(col("tsu"), 1).over(wOrd))
      .filter(col("gap").isNotNull)
    val gw = Window.partitionBy("user_id").orderBy("gap", "event_id")
    val gstats = gaps
      .withColumn("rn", row_number().over(gw))
      .withColumn("ng", count(lit(1)).over(Window.partitionBy("user_id")))
      .groupBy("user_id").agg(
        count(lit(1)).as("n_gaps"),
        min("gap").as("min_gap_us"),
        min(when(col("rn") === expr("(ng + 1) div 2"), col("gap")))
          .as("median_gap_us"),
        max("gap").as("max_gap_us"),
        sum(when(col("gap") < burstUs, 1L).otherwise(0L)).as("bursts"))
    base.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        (max("tsu") - min("tsu")).as("span_us"))
      .join(gstats, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"),
        coalesce(col("n_gaps"), lit(0L)).as("n_gaps"),
        col("min_gap_us"), col("median_gap_us"), col("max_gap_us"),
        coalesce(col("bursts"), lit(0L)).as("bursts"), col("span_us"))
  }

  /** Per-user behavioral diversity — the log-free companion of
    * entropy for bot/user segmentation: event-type counts collapse to
    * Gini impurity 1 − Σ pₜ² (1e6 fixed point, one exact floor over
    * 38-digit decimals — a single-type script scores 0, a uniform
    * explorer approaches 1 − 1/|types|) plus the modal type's share
    * in ppm and the type count. Pairs with
    * [[interactionGapFeatures]]: low diversity + millisecond medians
    * is automation.
    *
    * Scale shape: one (user, type) count aggregation (map-side
    * combinable), then a per-user re-aggregation on the same key —
    * Catalyst keeps both on one user-keyed exchange. No floats.
    */
  def behavioralDiversity(events: DataFrame, userCol: String,
      typeCol: String): DataFrame = {
    val cnt = events.select(col(userCol).as("user_id"),
        col(typeCol).as("etype"))
      .groupBy("user_id", "etype").agg(count(lit(1)).as("n_t"))
    cnt.groupBy("user_id").agg(
        sum("n_t").as("n_events"),
        count(lit(1)).as("n_types"),
        max("n_t").as("__modal"),
        sum(col("n_t") * col("n_t")).as("__sq"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        expr("CAST(1000000 - (CAST(__sq AS DECIMAL(38,0)) * 1000000)" +
          " div (CAST(n_events AS DECIMAL(38,0)) * n_events) AS LONG)")
          .as("gini_x1e6"),
        expr("(__modal * 1000000) div n_events").as("modal_share_x1e6"))
  }

  /** Event-type transition matrix — the first-order Markov counts a
    * next-event model (t107's exports) is calibrated against: for
    * every adjacent (type → next type) pair inside a user's
    * (ts, id)-ordered stream, the transition count and its
    * row-normalized ppm (one exact floor per cell). The matrix is
    * |types|² rows — broadcast-sized at any log scale.
    *
    * Scale shape: ONE user-keyed shuffle for the lag window; the cell
    * aggregation map-side combines; row totals ride a broadcast back.
    */
  def eventTransitions(events: DataFrame, userCol: String,
      tsUsCol: String, ordCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    val pairs = events.select(col(userCol).as("user_id"),
        col(tsUsCol).as("tsu"), col(ordCol).as("event_id"),
        col(typeCol).as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
    transitionsFromPairs(pairs)
  }

  /** The transition-matrix roll-up over an ALREADY-EXTRACTED
    * (from_type, to_type) pair relation — the shared back half of
    * [[eventTransitions]] and its streaming face (the per-user
    * successor pairs [[graft.streaming.EventStreams.nextEventPairStream]]
    * emits ARE the lag pairs, so the online matrix reuses one
    * arithmetic and the batch-equivalence proof pins both). Cells are
    * |types|² — broadcast-sized anywhere.
    */
  def transitionsFromPairs(pairs: DataFrame): DataFrame = {
    val cells = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("cnt"))
    val rows = cells.groupBy("from_type").agg(sum("cnt").as("__row"))
    cells.join(broadcast(rows), "from_type")
      .withColumn("row_ppm", expr("(cnt * 1000000) div __row"))
      .select("from_type", "to_type", "cnt", "row_ppm")
  }

  /** Per-user circadian profile — bot signal #3 next to
    * [[interactionGapFeatures]] and [[behavioralDiversity]]: activity
    * bucketed by hour-of-day (µs div 3600e6 mod 24), emitting the
    * peak hour (ties to the earliest hour), its share of the user's
    * events in ppm, and the count of distinct active hours — humans
    * concentrate and sleep, scripts run uniform or single-hour.
    * Exact integer arithmetic only.
    *
    * Scale shape: one (user, hour) count aggregation (≤ 24 cells per
    * user), one per-user fold on the same key.
    */
  def circadianProfile(events: DataFrame, userCol: String,
      tsUsCol: String): DataFrame = {
    val hours = events.select(col(userCol).as("user_id"),
        expr(s"($tsUsCol div ${3600L * 1000000L}) % 24").as("hour"))
      .groupBy("user_id", "hour").agg(count(lit(1)).as("n_h"))
    hours.groupBy("user_id").agg(
        sum("n_h").as("n_events"),
        count(lit(1)).as("active_hours"),
        min(struct((-col("n_h")).as("neg"), col("hour"))).as("__pk"))
      .select(col("user_id"), col("n_events"), col("active_hours"),
        col("__pk.hour").as("peak_hour"),
        expr("((-__pk.neg) * 1000000) div n_events").as("peak_share_x1e6"))
  }

  /** First-touch attribution — the label-construction pass behind
    * conversion models: each CONVERSION event (type = `convType`)
    * credits the EARLIEST event of a qualifying `touchTypes` set
    * inside the `lookbackUs` window strictly before it. Expressed as
    * a RANGE-frame window, not a join: qualifying events project a
    * (tsu, event_id, type) struct (NULL otherwise) and min() over
    * RANGE [-lookbackUs, -1µs) picks the first touch — Spark's
    * range frame keeps the state a per-partition sliding bound, so
    * there is no per-conversion scan and no inequality join to
    * degrade into a nested loop (the [[asOf]] argument, one tier up:
    * the window IS the algorithm). Unattributed conversions surface
    * with NULL touch columns (organic), never dropped.
    *
    * Scale shape: ONE user-keyed shuffle; the range frame advances
    * two pointers per partition. All integer µs.
    */
  def firstTouchAttribution(events: DataFrame, userCol: String,
      tsUsCol: String, ordCol: String, typeCol: String,
      convType: String, touchTypes: Seq[String],
      lookbackUs: Long = 86400L * 1000000L): DataFrame = {
    require(touchTypes.nonEmpty && lookbackUs > 0)
    val w = Window.partitionBy("user_id").orderBy("tsu")
      .rangeBetween(-lookbackUs, -1L)
    events.select(col(userCol).as("user_id"), col(tsUsCol).as("tsu"),
        col(ordCol).as("event_id"), col(typeCol).as("etype"))
      .withColumn("__touch",
        when(col("etype").isin(touchTypes: _*),
          struct(col("tsu").as("t"), col("event_id").as("id"),
            col("etype").as("ty"))))
      .withColumn("__first", min(col("__touch")).over(w))
      .filter(col("etype") === convType)
      .select(col("event_id").as("conversion_id"), col("user_id"),
        col("tsu").as("conv_tsu"),
        col("__first.id").as("touch_id"),
        col("__first.ty").as("touch_type"),
        (col("tsu") - col("__first.t")).as("gap_us"))
  }

  /** Sustained-rate burst detection — bot signal #4 next to
    * [[interactionGapFeatures]] / [[behavioralDiversity]] /
    * [[circadianProfile]]: a user's activity buckets into fixed
    * `bucketUs` windows; buckets holding at least `minPerBucket`
    * events are hot, and maximal runs of ADJACENT hot buckets merge
    * into bursts (the classic gaps-and-islands collapse: island key =
    * bucket − row_number over the user's hot buckets) — each burst
    * reported with its bucket span and event mass. Scripts sustain
    * rate across adjacent windows; humans spike and rest.
    *
    * Scale shape: one (user, bucket) count (map-side combinable), one
    * user-keyed window over the HOT buckets only (the filter runs
    * before the window, so the windowed relation is hot-bucket-sized,
    * not event-sized), one (user, island) collapse. All integer.
    */
  def burstDetect(events: DataFrame, userCol: String, tsUsCol: String,
      bucketUs: Long = 3600L * 1000000L, minPerBucket: Long = 2L): DataFrame = {
    require(bucketUs > 0 && minPerBucket >= 1)
    // same negative-timestamp loud-guard as retentionCohorts: div
    // truncation vs the oracle's floor silently shifts buckets < 0
    val hot = events.select(col(userCol).as("user_id"),
        when(col(tsUsCol) < 0L,
          raise_error(lit("burstDetect: negative timestamps are" +
            " outside the integer-exact envelope")).cast("long"))
          .otherwise(expr(s"$tsUsCol div $bucketUs")).as("b"))
      .groupBy("user_id", "b").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minPerBucket)
    burstsFromHotBuckets(hot)
  }

  /** The gaps-and-islands collapse over an ALREADY-FILTERED hot-bucket
    * relation (user_id, b, cnt) — the shared back half of
    * [[burstDetect]] and the streaming face
    * ([[graft.streaming.EventStreams.hotBucketStream]] emits the hot
    * buckets online; this rolls them up through the SAME collapse, so
    * the batch-equivalence proof pins one arithmetic).
    */
  def burstsFromHotBuckets(hot: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("b")
    hot.withColumn("isl", col("b") - row_number().over(w))
      .groupBy("user_id", "isl")
      .agg(min("b").as("start_bucket"), max("b").as("end_bucket"),
        count(lit(1)).as("n_buckets"), sum("cnt").as("n_events"))
      .select("user_id", "start_bucket", "end_bucket", "n_buckets",
        "n_events")
  }

  /** Exact per-type inter-event gap deciles — the latency profile a
    * sessionization / engagement model is calibrated against: the
    * silence PRECEDING each event, keyed by that event's type, and
    * for every type the nine exact decile gap values, computed over
    * the COMPRESSED (type, gap) histogram — [[graft.operators.CorpusOps.quantileNormalize]]'s
    * discipline pointed at time gaps: the per-type cumulative rides
    * [[Prefix.shardedCum]]'s two-phase sharded prefix sum (gap values
    * are near-unique at µs granularity, so a type's histogram is
    * corpus-sized — never a single window partition), and the decile
    * lookup is a ceiling-target ≥-join against the tiny (|types|·9)
    * target relation riding a broadcast. Decile d's value is the MINIMUM gap
    * whose cumulative count reaches ceil(d·n_t/10) — the exact
    * lower-quantile convention every oracle here replays.
    */
  def gapDeciles(events: DataFrame, userCol: String, tsUsCol: String,
      ordCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    val gaps = events.select(col(userCol).as("user_id"),
        col(tsUsCol).as("tsu"), col(ordCol).as("event_id"),
        col(typeCol).as("etype"))
      .withColumn("gap_us", col("tsu") - lag(col("tsu"), 1).over(w))
      .filter(col("gap_us").isNotNull)
    // compressed histogram: two consumers (cumulative + totals) — pin
    val gh = Dedup.barrier(
      gaps.groupBy("etype", "gap_us").agg(count(lit(1)).as("cnt")),
      col("etype")).localCheckpoint()
    val nT = gh.groupBy("etype").agg(sum("cnt").as("n_t"))
    // per-type cumulative via the two-phase sharded prefix sum: gap
    // values are near-unique at µs granularity, so a type's histogram
    // partition is corpus-sized — the same exposure as t150/t155
    val cum = Prefix.shardedCum(gh, "gap_us", Seq("cnt" -> "cum"),
      partCols = Seq("etype"))
    val targets = nT
      .select(col("etype"), col("n_t"),
        explode(sequence(lit(1L), lit(9L))).as("decile"))
      .withColumn("tgt", expr("(decile * n_t + 9) div 10"))
    // decile lookup stays the equi-join + ≥ filter + min: targets are
    // a CONSTANT 9 rows per etype, so the join's compare/output mass
    // is ≤ 9·|histogram| — linear, not the O(D²) shape
    // [[Prefix.shardedCeilLookup]] exists for. Measured r15: the
    // sharded lookup here cost 7.3 s vs 4.0 s at sf0.1 (its extra
    // barrier + windows over the histogram outweigh the 9× min-agg
    // at every scale when the target side is constant-bounded).
    cum.join(broadcast(targets), Seq("etype"))
      .filter(col("cum") >= col("tgt"))
      .groupBy("etype", "decile", "n_t")
      .agg(min("gap_us").as("gap_us"))
      .select("etype", "decile", "n_t", "gap_us")
  }

  /** Week-N retention cohort matrix — the engagement readout a
    * training-data curator uses to weight user streams by stickiness
    * (and the product analyst's classic triangle): users cohorted by
    * their FIRST active epoch week (µs div 604800e6 — fixed 7-day
    * buckets from the epoch, no calendar dependence for both engines
    * to disagree on), and each (cohort, week-offset) cell counts the
    * cohort's users active that week, with retention as the exact
    * ppm floor of cell/cohort size. week_n = 0 is the cohort's own
    * size by construction (a user's first week is active), so the
    * cohort denominator falls out of the matrix itself — no second
    * aggregation over users.
    *
    * Scale shape: one (user, week) distinct (compact longs), one
    * user-keyed window for the cohort minimum, then a (cohort,
    * week_n) cell collapse — weeks² cells, broadcast-sized at any
    * log scale; the cell relation is pinned for its two consumers
    * (matrix + week-0 denominators).
    */
  def retentionCohorts(events: DataFrame, userCol: String,
      tsUsCol: String): DataFrame = {
    val weekUs = 604800L * 1000000L
    // div truncates toward zero where the oracle's // floors — below
    // zero the two SILENTLY diverge (wrong cohort, no error), so the
    // domain is enforced loudly, folded into the consumed column
    val uw = events.select(col(userCol).as("user_id"),
        when(col(tsUsCol) < 0L,
          raise_error(lit("retentionCohorts: negative timestamps are" +
            " outside the integer-exact envelope")).cast("long"))
          .otherwise(expr(s"$tsUsCol div $weekUs")).as("week"))
      .distinct()
    retentionFromUserWeeks(uw)
  }

  /** The cohort-triangle roll-up over an ALREADY-DISTINCT
    * (user_id, week) relation — the shared back half of
    * [[retentionCohorts]] and the streaming face
    * ([[graft.streaming.EventStreams.userWeekStream]] maintains the
    * distinct user-weeks online; the batch-equivalence proof pins one
    * arithmetic).
    */
  def retentionFromUserWeeks(uw: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    val cells = Dedup.barrier(
      uw.withColumn("cohort_week", min("week").over(w))
        .select(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_n"))
        .groupBy("cohort_week", "week_n")
        .agg(count(lit(1)).as("n_active")),
      col("cohort_week")).localCheckpoint()
    val cohorts = cells.filter(col("week_n") === 0L)
      .select(col("cohort_week"), col("n_active").as("n_cohort"))
    cells.join(broadcast(cohorts), "cohort_week")
      .select(col("cohort_week"), col("week_n"), col("n_active"),
        col("n_cohort"),
        expr("(n_active * 1000000) div n_cohort").as("retention_ppm"))
  }

  /** Inter-session type carryover — the session-level analog of
    * [[eventTransitions]]: which behaviors in one visit predict
    * behaviors in the NEXT visit. Users' streams sessionize at
    * `gapUs` silences exactly as [[sessionTypeLift]]; every type
    * present in session k pairs with every type present in session
    * k+1 of the same user, and each (type_a → type_b) cell carries
    * its count and the row-normalized ppm (one exact floor —
    * P(b in next | a in current) over carryover pairs).
    *
    * Scale shape: ONE user-keyed shuffle for the sessionization
    * window; the (user, session) distinct type sets self-join on
    * (user, session+1) — an equi-join on compact keys whose per-pair
    * fan-out is |types-in-k|·|types-in-k+1|, bounded by the type
    * catalog squared, never by session or stream length; the cell
    * matrix is |types|² rows, broadcast-sized.
    */
  def sessionCarryover(events: DataFrame, userCol: String,
      tsUsCol: String, ordCol: String, typeCol: String,
      gapUs: Long = 1800L * 1000000L): DataFrame = {
    require(gapUs > 0)
    val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    val sess = events.select(col(userCol).as("user_id"),
        col(tsUsCol).as("tsu"), col(ordCol).as("event_id"),
        col(typeCol).as("etype"))
      .withColumn("boundary",
        when(col("tsu") - lag(col("tsu"), 1).over(w) > gapUs, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_no", sum("boundary").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("session_no"), col("etype"))
      .distinct()
    val pinned = Dedup.barrier(sess, col("user_id")).localCheckpoint()
    val pairs = pinned.as("a")
      .join(pinned.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("b.session_no") === col("a.session_no") + 1L)
      .groupBy(col("a.etype").as("type_a"), col("b.etype").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
    val rows = pairs.groupBy("type_a").agg(sum("n_ab").as("__row"))
    pairs.join(broadcast(rows), "type_a")
      .select(col("type_a"), col("type_b"), col("n_ab"),
        expr("(n_ab * 1000000) div __row").as("row_ppm"))
  }

  /** Session-level event-type co-occurrence by LIFT — which behaviors
    * travel together inside one visit: users' streams split into
    * sessions at `gapUs` silences (boundary = gap > gapUs, session
    * number = running boundary sum — one per-user window), each
    * session contributes its DISTINCT type set, and every type pair
    * present together in at least `minCount` sessions is scored with
    * lift = P(a,b)/(P(a)·P(b)) over sessions — the same log-free
    * integer-floor scoring as the token collocations (38-digit
    * products, one exact division).
    *
    * Scale shape: ONE user-keyed shuffle for the sessionization
    * window; (session, type) distinct and the pair join shuffle on
    * compact keys; per-session pair fan-out is |types-in-session|² —
    * bounded by the type catalog, not the session length.
    */
  def sessionTypeLift(events: DataFrame, userCol: String, tsUsCol: String,
      ordCol: String, typeCol: String, gapUs: Long = 1800L * 1000000L,
      minCount: Long = 5L): DataFrame = {
    require(gapUs > 0 && minCount >= 1)
    val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    val sess = events.select(col(userCol).as("user_id"),
        col(tsUsCol).as("tsu"), col(ordCol).as("event_id"),
        col(typeCol).as("etype"))
      .withColumn("boundary",
        when(col("tsu") - lag(col("tsu"), 1).over(w) > gapUs, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_no", sum("boundary").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("session_no"), col("etype"))
      .distinct()
    // (user, session) key packed for the pair join. The packing is
    // only injective for user_id in [0, 2^43) and session_no in
    // [0, 2^20) — outside that an overflow or bleed-through would
    // silently MERGE distinct sessions, so the bound check raises
    // instead, folded into the consumed sid column (a side guard
    // column gets pruned; prioritySample pattern).
    val keyed = Dedup.barrier(
      sess.select(
        when(col("user_id") < 0L || col("user_id") >= lit(1L << 43) ||
             col("session_no") < 0L || col("session_no") >= lit(1L << 20),
          raise_error(lit("sessionTypeLift: sid packing needs user_id in" +
            " [0,2^43) and session_no in [0,2^20) - key on a struct for" +
            " wider domains")).cast("long"))
          .otherwise(col("user_id") * lit(1048576L) + col("session_no"))
          .as("sid"),
        col("etype")),
      col("sid")).localCheckpoint()
    liftOverSessions(keyed, minCount)
  }

  /** Lift scoring over a distinct (sid, etype) session relation — the
    * shared back half of [[sessionTypeLift]] and
    * [[sessionTypeLiftFromSets]] (the streaming face rolls its
    * session_window state up through the same scoring, so the
    * batch-equivalence proof pins ONE arithmetic, not two). `keyed`
    * must already be distinct per (sid, etype) and pinned; sid may be
    * any equi-joinable type (packed long from the batch sessionizer,
    * (user, window-start) struct from the streamed sets).
    *
    * n_sessions is derived IN-PLAN as a broadcast 1-row aggregate
    * (the clusterSizeHistogram shape) — not an eager driver-side
    * count() baked in as a literal, which cost a second job.
    */
  private def liftOverSessions(keyed: DataFrame,
      minCount: Long): DataFrame = {
    val nSess = keyed.agg(count_distinct(col("sid")).as("n_sessions"))
    val perType = keyed.groupBy("etype").agg(count(lit(1)).as("n_t"))
    val pairs = keyed.as("a")
      .join(keyed.as("b"),
        col("a.sid") === col("b.sid") && col("a.etype") < col("b.etype"))
      .groupBy(col("a.etype").as("type_a"), col("b.etype").as("type_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairs
      .join(broadcast(perType.select(col("etype").as("type_a"),
        col("n_t").as("n_a"))), "type_a")
      .join(broadcast(perType.select(col("etype").as("type_b"),
        col("n_t").as("n_b"))), "type_b")
      .crossJoin(broadcast(nSess))
      .select(col("type_a"), col("type_b"), col("n_ab"), col("n_a"),
        col("n_b"), col("n_sessions"),
        expr("CAST((CAST(n_ab AS DECIMAL(38,0)) * n_sessions * 1000000)" +
          " div (CAST(n_a AS DECIMAL(38,0)) * n_b) AS LONG)")
          .as("lift_x1e6"))
  }

  /** [[sessionTypeLift]] over an ALREADY-SESSIONIZED type-set
    * relation — the roll-up consumer of the streaming face
    * ([[graft.streaming.EventStreams.sessionTypeSetStream]] emits one
    * (user_id, session_start, types) row per closed session window):
    * each row is one session, its array the session's distinct type
    * set, and the lift scoring is the identical integer-floor
    * arithmetic. The session key is the (user, window-start) struct —
    * no packing, so no domain bound to guard here.
    *
    * Scale shape: the sets relation is sessions-sized (not
    * events-sized); one explode, then the same bounded pair fan-out.
    */
  def sessionTypeLiftFromSets(sets: DataFrame, userCol: String = "user_id",
      startCol: String = "session_start", typesCol: String = "types",
      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1)
    val keyed = Dedup.barrier(
      sets.select(struct(col(userCol), col(startCol)).as("sid"),
          explode(col(typesCol)).as("etype"))
        .distinct(),
      col("sid")).localCheckpoint()
    liftOverSessions(keyed, minCount)
  }

  def pointInTimeFeatures(events: DataFrame, userCol: String,
      tsUsCol: String, ordCol: String, typeCol: String, valueCol: String,
      targetType: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col(userCol).as("user_id"), col(tsUsCol).as("tsu"),
        col(ordCol).as("event_id"), col(typeCol).as("etype"),
        floor(col(valueCol) * 100 + lit(0.5)).cast("long").as("cents"))
      .select(col("event_id"), col("user_id"), col("tsu"),
        count(lit(1)).over(prior).as("n_prior"),
        coalesce(sum(when(col("etype") === targetType, 1L).otherwise(0L))
          .over(prior), lit(0L)).as("n_prior_target"),
        coalesce(sum(col("cents")).over(prior), lit(0L))
          .as("prior_value_cents"),
        (col("tsu") - lag(col("tsu"), 1).over(w)).as("gap_us"))
  }

  /** RFM user segmentation — the classic recency / frequency /
    * monetary quartile grid, the first cut every behavioral dataset
    * gets before per-segment sampling or label stratification: each
    * user's days-since-last-event (vs the corpus high-water mark),
    * event count, and summed integer cents, each assigned an exact
    * quartile bin from the FULL population. Bins ascend with the raw
    * value (r_bin 1 = most recent quartile, f_bin/m_bin 4 = the
    * heaviest quartile); the composite segment string R#F#M# is the
    * conventional read.
    *
    * Quartiles ride the compressed-histogram discipline
    * ([[gapDeciles]] / quantileNormalize): threshold_q = min{v :
    * cum(v) ≥ ceil(q·n/4)} over the (metric, value) HISTOGRAM — the
    * cumulative rides [[Prefix.shardedCum]]'s two-phase sharded
    * prefix sum, since a near-unique value column (integer cents)
    * makes a metric's histogram user-relation-sized — and
    * bin(v) = 1 + |{q : threshold_q < v}|, so ties share a bin and
    * both engines replay the assignment exactly. Monetary is exact
    * integer cents (one pure-double FLOOR(v·100+0.5) per event — the
    * t92 contract); recency is an integer day floor of non-negative
    * µs, so truncating div and floor agree everywhere.
    *
    * Scale shape: ONE user-keyed aggregation builds the per-user
    * triple (pinned — consumed by the histogram build and the final
    * assignment); the corpus high-water mark is a broadcast 1-row
    * crossJoin; the nine thresholds collapse to ONE broadcast row of
    * conditional aggregates, so bin assignment is map-only over the
    * user relation — no second user shuffle, no global user sort.
    */
  def rfmSegments(events: DataFrame, userCol: String, tsUsCol: String,
      valueCol: String): DataFrame = {
    val users = events
      .select(col(userCol).as("user_id"), col(tsUsCol).as("tsu"),
        floor(col(valueCol) * 100 + lit(0.5)).cast("long").as("cents"))
      .groupBy("user_id").agg(max("tsu").as("last_tsu"),
        count(lit(1)).as("frequency"), sum("cents").as("monetary_cents"))
    rfmFromUserStats(users)
  }

  /** The RFM grid over an ALREADY-AGGREGATED per-user stats relation
    * (user_id, last_tsu, frequency, monetary_cents) — the shared back
    * half of [[rfmSegments]] and its streaming face
    * ([[graft.streaming.EventStreams.userStatsStream]] maintains the
    * same three running aggregates as keyed state), so one quartile
    * arithmetic carries both and StreamingSpec pins them equal.
    */
  def rfmFromUserStats(userStats: DataFrame): DataFrame = {
    val users = userStats.localCheckpoint()
    val hwm = users.agg(max("last_tsu").as("max_tsu"))
    val base = users.crossJoin(broadcast(hwm))
      .withColumn("recency_days",
        expr(s"(max_tsu - last_tsu) div ${86400L * 1000000L}"))
      .drop("max_tsu", "last_tsu")
    val long = base.select(col("user_id"),
        explode(map(lit("r"), col("recency_days"),
          lit("f"), col("frequency"),
          lit("m"), col("monetary_cents"))).as(Seq("metric", "v")))
    val hist = Dedup.barrier(
      long.groupBy("metric", "v").agg(count(lit(1)).as("cnt")),
      col("metric")).localCheckpoint()
    val nM = hist.groupBy("metric").agg(sum("cnt").as("n_m"))
    // three metric partitions over near-unique value histograms
    // (monetary cents!) would serialize through three tasks — the
    // cumulative rides the two-phase sharded prefix sum instead
    val cum = Prefix.shardedCum(hist, "v", Seq("cnt" -> "cum"),
      partCols = Seq("metric"))
    // quartile lookup stays the equi-join + ≥ filter + min: a CONSTANT
    // 3 targets per metric keeps the join mass ≤ 3·|histogram| —
    // linear; the sharded ceiling search measured slower here
    // (same finding as gapDeciles, r15)
    val thr = cum
      .join(broadcast(nM
        .select(col("metric"), explode(sequence(lit(1L), lit(3L))).as("q"),
          col("n_m"))
        .withColumn("tgt", expr("(q * n_m + 3) div 4"))), Seq("metric"))
      .filter(col("cum") >= col("tgt"))
      .groupBy("metric", "q").agg(min("v").as("thr"))
    // nine thresholds -> ONE broadcast row; assignment stays map-only
    val thrCols = Seq("r", "f", "m").flatMap { m =>
      (1 to 3).map(q => max(when(col("metric") === m && col("q") === q,
        col("thr"))).as(s"${m}$q"))
    }
    val wide = thr.agg(thrCols.head, thrCols.tail: _*)
    base.crossJoin(broadcast(wide))
      .select(col("user_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"),
        binOf(col("recency_days"), "r").as("r_bin"),
        binOf(col("frequency"), "f").as("f_bin"),
        binOf(col("monetary_cents"), "m").as("m_bin"))
      .withColumn("segment",
        concat(lit("R"), col("r_bin"), lit("F"), col("f_bin"),
          lit("M"), col("m_bin")))
  }

  /** bin = 1 + |{q : threshold_q < v}| over the three broadcast
    * threshold columns `<m>1..3`; a missing threshold (tiny
    * populations) never counts.
    */
  private def binOf(v: Column, m: String): Column =
    (lit(1L) +
      when(col(s"${m}1") < v, 1L).otherwise(0L) +
      when(col(s"${m}2") < v, 1L).otherwise(0L) +
      when(col(s"${m}3") < v, 1L).otherwise(0L)).cast("long")

  /** Behavioral drift report — did user BEHAVIOR change between the
    * first and second time half of the log? The event-stream analog
    * of [[graft.operators.CorpusOps.sourceDivergence]] (which asks it
    * of token distributions): each half's first-order transition
    * matrix ([[eventTransitions]]' cells, computed per half with lag
    * windows that never cross the cut), row-normalized to each half's
    * own ppm mass, full-outer-joined cell-for-cell with absolute
    * deviations. A reader sums dev_ppm for the L1 drift number, or
    * reads the top cells for WHICH transition moved — the alarm that
    * invalidates a next-event model trained on the old half.
    *
    * The cut is the exact median event time from the compressed
    * timestamp histogram (the [[purgedTimeSplit]] machinery at one
    * target, including its [[Prefix.shardedCum]] two-phase prefix sum
    * — µs-unique streams make that histogram corpus-sized, so no
    * unpartitioned window may touch it). Pairs that straddle the cut
    * belong to neither half by construction (the lag window
    * partitions on (user, half)) — identically in both engines.
    *
    * Scale shape: ONE (user, half)-keyed window exchange for the lag
    * pairs; cells are ≤ 2·|types|² rows; the full outer join and ppm
    * arithmetic run on that broadcast-sized relation.
    */
  def behaviorDrift(events: DataFrame, userCol: String, tsUsCol: String,
      ordCol: String, typeCol: String): DataFrame = {
    val e = events.select(col(userCol).as("user_id"),
      col(tsUsCol).as("tsu"), col(ordCol).as("event_id"),
      col(typeCol).as("to_type"))
    val hist = Dedup.barrier(
      e.groupBy("tsu").agg(count(lit(1)).as("cnt")), col("tsu"))
      .localCheckpoint()
    val n = hist.agg(sum("cnt").as("n"))
    // two-phase sharded prefix sum: µs-unique event streams make this
    // histogram corpus-sized, so the cumulative count must never ride
    // an unpartitioned window (the t138 discipline via Prefix)
    val cut = Prefix.shardedCum(hist, "tsu", Seq("cnt" -> "cum"))
      .crossJoin(broadcast(n))
      .filter(col("cum") >= expr("(n + 1) div 2"))
      .agg(min("tsu").as("cut"))
    val w = Window.partitionBy("user_id", "half").orderBy("tsu", "event_id")
    val pairs = e.crossJoin(broadcast(cut))
      .withColumn("half", when(col("tsu") <= col("cut"), 1L).otherwise(2L))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
    val cells = Dedup.barrier(
      pairs.groupBy("half", "from_type", "to_type")
        .agg(count(lit(1)).as("cnt")),
      col("half")).localCheckpoint()
    val tots = cells.groupBy("half").agg(sum("cnt").as("tot"))
    val ppm = cells.join(broadcast(tots), "half")
      .select(col("half"), col("from_type"), col("to_type"), col("cnt"),
        expr("(cnt * 1000000) div tot").as("ppm"))
    val h1 = ppm.filter(col("half") === 1L)
      .select(col("from_type"), col("to_type"),
        col("cnt").as("n_first"), col("ppm").as("ppm_first"))
    val h2 = ppm.filter(col("half") === 2L)
      .select(col("from_type"), col("to_type"),
        col("cnt").as("n_second"), col("ppm").as("ppm_second"))
    h1.join(h2, Seq("from_type", "to_type"), "full_outer")
      .select(col("from_type"), col("to_type"),
        coalesce(col("n_first"), lit(0L)).as("n_first"),
        coalesce(col("n_second"), lit(0L)).as("n_second"),
        coalesce(col("ppm_first"), lit(0L)).as("ppm_first"),
        coalesce(col("ppm_second"), lit(0L)).as("ppm_second"))
      .withColumn("dev_ppm",
        abs(col("ppm_first") - col("ppm_second")))
  }

  /** Purged walk-forward time split with embargo — the TEMPORAL
    * leakage-safe split (the de Prado purged/embargoed discipline)
    * next to the near-dup-aware splits of t78/t110: events split by
    * TIME, with exclusion zones of `embargoUs` after each cut so a
    * model whose features aggregate recent history (t106's PIT
    * features, next-event labels) never straddles a boundary —
    * train ≤ cut1 < embargo ≤ cut1+e < val ≤ cut2 < embargo ≤
    * cut2+e < test. A hash split (t31) is the RIGHT tool for i.i.d.
    * documents and the WRONG one for autocorrelated event streams;
    * this operator is the difference.
    *
    * The cuts are exact count quantiles: cut_q = min{t : cum(t) ≥
    * ceil(pct·n/100)} over the COMPRESSED (timestamp → count)
    * histogram — the [[gapDeciles]] ≥-join discipline — and the
    * cumulative count itself rides [[Prefix.shardedCum]]'s two-phase
    * sharded prefix sum, because µs-unique event streams make the
    * "compressed" histogram corpus-sized: partitioned within-shard
    * windows, a constant-bounded shard-totals window, broadcast
    * offsets. Both engines replay the thresholds bit-for-bit.
    * Assignment is map-only against the two broadcast cuts.
    */
  def purgedTimeSplit(events: DataFrame, ordCol: String, tsUsCol: String,
      trainPct: Int, valPct: Int, embargoUs: Long): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100 &&
      embargoUs >= 0)
    val e = events.select(col(ordCol).as("event_id"),
      col(tsUsCol).as("tsu"))
    val hist = Dedup.barrier(
      e.groupBy("tsu").agg(count(lit(1)).as("cnt")), col("tsu"))
      .localCheckpoint()
    val n = hist.agg(sum("cnt").as("n"))
    // two-phase sharded prefix sum (Prefix): the distinct-timestamp
    // histogram is corpus-sized for µs-unique streams — an
    // unpartitioned cumulative window here was the round-13
    // scale-killer finding
    val cum = Prefix.shardedCum(hist, "tsu", Seq("cnt" -> "cum"))
    val targets = n.select(explode(array(
        lit(trainPct.toLong), lit((trainPct + valPct).toLong))).as("pct"),
        col("n"))
      .withColumn("tgt", expr("(pct * n + 99) div 100"))
    // cut lookup stays the broadcast ≥-join + min: a CONSTANT 2
    // targets keeps the join mass ≤ 2·|histogram| — linear; the
    // sharded ceiling search measured slower here (same finding as
    // gapDeciles, r15)
    val thr = cum.join(broadcast(targets), col("cum") >= col("tgt"))
      .groupBy("pct").agg(min("tsu").as("cut"))
    val wide = thr.agg(
      max(when(col("pct") === trainPct.toLong, col("cut"))).as("cut1"),
      max(when(col("pct") === (trainPct + valPct).toLong, col("cut")))
        .as("cut2"))
    e.crossJoin(broadcast(wide))
      .select(col("event_id"), col("tsu"),
        when(col("tsu") <= col("cut1"), "train")
          .when(col("tsu") <= col("cut1") + embargoUs, "embargo")
          .when(col("tsu") <= col("cut2"), "val")
          .when(col("tsu") <= col("cut2") + embargoUs, "embargo")
          .otherwise("test").as("split"))
  }
}
