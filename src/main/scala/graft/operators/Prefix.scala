package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase sharded exact prefix sums over compressed histograms —
  * the scale-safe replacement for `Window.orderBy(key)` cumulative
  * counts whose input relation GROWS with the corpus (distinct
  * microsecond timestamps, distinct quality scores, distinct
  * inter-event gaps): a naive unpartitioned window serializes that
  * relation through ONE task, the exact WindowExec single-partition
  * warning, and is the last scale-killer shape the round-13 audit
  * found (t150/t155).
  *
  * The pattern is the [[CorpusOps.tokenBudgetShards]] discipline
  * generalized to arbitrary long-keyed histograms: keys range-bucket
  * into at most `targetBuckets` coarse shards (`(key − min) div
  * span`, span = ⌈range / targetBuckets⌉ — monotone in the key, so
  * bucket order IS key order), the within-bucket running sums ride a
  * PARTITIONED window (parallel, each partition ~|hist| /
  * targetBuckets rows), and only the per-bucket totals — ≤
  * targetBuckets rows per partition group, bounded by a CONSTANT, not
  * the corpus — pass through the small ordered window before riding
  * back as a broadcast. offset(bucket) + local running sum IS the
  * global prefix sum, bit-for-bit, so every DuckDB oracle that
  * replays the naive cumulative stays green unchanged.
  */
object Prefix {

  /** Exact cumulative sums over a histogram relation, two-phase.
    *
    * Contract — the caller guarantees:
    *  - `hist` is unique on (`partCols`, `keyCol`) (it is a grouped
    *    histogram), `keyCol` is an integral type and NON-NULL (a
    *    null key raises at runtime — see the bucketed guard), and
    *    the key RANGE
    *    fits a Long with `targetBuckets` headroom (max − min <
    *    2⁶³ − targetBuckets);
    *  - every summed column is a non-negative Long (counts), so the
    *    within-bucket running sum is non-decreasing and the bucket
    *    total is its MAX — which keeps the totals derivable from the
    *    windowed relation itself (one exchange feeds both consumers,
    *    the [[CorpusOps.tokenBudgetShards]] exchange-reuse note);
    *  - `hist` is cheap to consume twice (histogram-sized and/or
    *    pinned) — this helper reads it once for the 1-row bounds and
    *    once for the bucketed scan.
    *
    * @param sums (input count column → output cumulative column);
    *             each output is Σ input over rows with key ≤ this
    *             row's key inside its `partCols` group.
    * @return `hist`'s columns plus the output cumulative columns.
    */
  /** Ceiling lookup against a cumulative relation WITHOUT the
    * quadratic inequality join: for every `targets` row, the columns
    * of the `cum` row with the SMALLEST `cValCol` that is `>=` the
    * target's `tValCol` (null when no such row — the caller decides
    * whether that is a drop, like the inner ≥-join it replaces, or a
    * default).
    *
    * The r15 profile found the previous shape — `targets
    * .join(broadcast(cum), cum >= tgt).groupBy(...).agg(min(key))` —
    * evaluated as a BroadcastNestedLoopJoin whose compare count AND
    * output row count are |targets|·|cum| (t118 at sf0.1: 3,933
    * histogram rows → 1.06 M joined rows before the min; both
    * relations grow with distinct corpus scores, so the shape is
    * O(D²) — a scale-killer for exactly the relations
    * [[shardedCum]] exists to keep linear). This helper computes the
    * same answer as a sorted-merge: union the two relations tagged,
    * range-bucket on the compared value (the [[shardedCum]]
    * discipline — bucket order IS value order), take a within-bucket
    * running MIN of the cum-side struct over a (current →
    * unbounded following) frame, and resolve cross-bucket answers
    * with a suffix-MIN over the ≤ `targetBuckets` per-bucket minima.
    * O((|cum|+|targets|)·log) work, nothing quadratic, nothing
    * single-partition.
    *
    * Contract — the caller guarantees:
    *  - `cValCol` is STRICTLY increasing over the cum relation within
    *    a `partCols` group (true for every cumulative count built
    *    from positive histogram counts), so the frame minimum is
    *    deterministic and min-by-cVal equals min-by-any-payload that
    *    increases with it;
    *  - compared values are integral, NON-NULL on both sides, and the
    *    range fits a Long with `targetBuckets` headroom (the
    *    [[shardedCum]] envelope; null values raise loudly);
    *  - `targets`' columns and `cPayload` names do not collide.
    *
    * @param cPayload cum-relation columns returned per target row
    *                 (each null when no qualifying cum row exists).
    * @return `targets`' columns plus `cPayload` columns.
    */
  def shardedCeilLookup(cum: DataFrame, cValCol: String,
      cPayload: Seq[String], targets: DataFrame, tValCol: String,
      partCols: Seq[String] = Nil, targetBuckets: Int = 4096): DataFrame =
    shardedLookup(cum, cValCol, cPayload, targets, tValCol, partCols,
      targetBuckets, ceil = true)

  /** Floor lookup — the mirror of [[shardedCeilLookup]]: per target
    * row, the cum row with the LARGEST `cValCol` that is `<=` the
    * target's `tValCol` (null when none). Replaces the
    * `targets.join(broadcast(cum), cKey <= tKey, "left")
    * .groupBy(...).agg(max(struct(...)))` predecessor-search shape
    * (the [[CorpusOps.percentileFromMap]] transform) with the same
    * O(D²) → O(D·log) reduction, same contract.
    */
  def shardedFloorLookup(cum: DataFrame, cValCol: String,
      cPayload: Seq[String], targets: DataFrame, tValCol: String,
      partCols: Seq[String] = Nil, targetBuckets: Int = 4096): DataFrame =
    shardedLookup(cum, cValCol, cPayload, targets, tValCol, partCols,
      targetBuckets, ceil = false)

  private def shardedLookup(cum: DataFrame, cValCol: String,
      cPayload: Seq[String], targets: DataFrame, tValCol: String,
      partCols: Seq[String], targetBuckets: Int, ceil: Boolean): DataFrame = {
    require(targetBuckets > 0, s"targetBuckets must be > 0: $targetBuckets")
    val tCols = targets.columns.toSeq
    require(!tCols.exists(cPayload.contains),
      s"targets and cPayload share column names: " +
        tCols.filter(cPayload.contains).mkString(", "))
    def guarded(c: Column, side: String): Column =
      when(c.isNull, raise_error(lit(
        s"shardedLookup: NULL compared value on the $side side - " +
          "pre-aggregate or exclude the null group explicitly"))
        .cast("long")).otherwise(c.cast("long"))
    // tagged union: cum rows carry their payload struct (ordered by
    // the compared value, so a struct extremum IS the value
    // extremum), target rows carry every target column — nothing
    // needs a second join back
    val payloadType = cum.select(
      struct(col(cValCol).cast("long").as("__lk_cv") +:
        cPayload.map(col): _*).as("__lk_p")).schema("__lk_p").dataType
    val tFull = targets.select(
      partCols.map(col) ++ Seq(
        guarded(col(tValCol), "target").as("__lk_v"), lit(0).as("__lk_c"),
        lit(null).cast(payloadType).as("__lk_p")) ++
        tCols.filterNot(partCols.contains).map(c =>
          col(c).as(s"__lk_tc_$c")): _*)
    val cFull = cum.select(
      partCols.map(col) ++ Seq(
        guarded(col(cValCol), "cum").as("__lk_v"), lit(1).as("__lk_c"),
        struct(col(cValCol).cast("long").as("__lk_cv") +:
          cPayload.map(col): _*).as("__lk_p")) ++
        tCols.filterNot(partCols.contains).map(c =>
          lit(null).cast(tFull.schema(s"__lk_tc_$c").dataType)
            .as(s"__lk_tc_$c")): _*)
    // pinned: the union is consumed twice (value bounds + the
    // bucketed scan) and both inputs typically sit on expensive
    // lineages (a shardedCum output on the cum side, a corpus
    // aggregation on the target side) — without the pin the whole
    // upstream pipeline executes twice (measured +0.4–0.8 s per call
    // at sf0.1). Distinct-values-sized, the established checkpoint
    // budget of every histogram caller.
    val all = cFull.unionByName(tFull).localCheckpoint()
    val bounds = all
      .agg(min(col("__lk_v")).as("__lk_mn"), max(col("__lk_v")).as("__lk_mx"))
      .select(col("__lk_mn"), greatest(lit(1L),
          expr(s"(__lk_mx - __lk_mn + $targetBuckets) div $targetBuckets"))
        .as("__lk_span"))
    val pc: Seq[Column] = partCols.map(col)
    val bucketed = Dedup.barrier(
      all.crossJoin(broadcast(bounds))
        .withColumn("__lk_bkt", expr("(__lk_v - __lk_mn) div __lk_span")),
      pc :+ col("__lk_bkt"): _*)
    // within-bucket answer: running MIN (ceil) of the cum struct over
    // the rows with value ≥ the current one, cum-before-target at
    // equal value so an exact hit qualifies — or the (start → current)
    // MAX mirror for floor. The ceil side orders DESCENDING with a
    // (start → current) frame rather than ascending with (current →
    // end): the row sets are identical, but Spark implements the
    // running frame in O(k) per partition while an
    // unbounded-FOLLOWING frame recomputes the aggregate per row —
    // O(k²) for a duplicate-heavy bucket (value-range bucketing
    // bounds the value span, not the row count). cum-side rows have a
    // strictly increasing __lk_v (contract), so the frame extremum is
    // deterministic whatever the tie order among equal-valued targets
    // (their __lk_p is null and skipped).
    val wIn =
      if (ceil)
        Window.partitionBy(pc :+ col("__lk_bkt"): _*)
          .orderBy(col("__lk_v").desc, col("__lk_c").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      else
        Window.partitionBy(pc :+ col("__lk_bkt"): _*)
          .orderBy(col("__lk_v").asc, col("__lk_c").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val extremum: Column => Column = if (ceil) min(_) else max(_)
    val local = bucketed.withColumn("__lk_loc", extremum(col("__lk_p")).over(wIn))
    // per-bucket cum-side extrema over the SAME barrier exchange (the
    // bucket domain includes target-only buckets, so the cross-bucket
    // pass below can answer a target whose own bucket holds no cum
    // row); ≤ targetBuckets rows per part group, a constant — then
    // the strictly-before/after frame gives each bucket its
    // cross-bucket fallback, and the tiny relation broadcasts back.
    val bAgg = bucketed.groupBy(pc :+ col("__lk_bkt"): _*)
      .agg(extremum(col("__lk_p")).as("__lk_b"))
    // same running-frame mirror for the cross-bucket suffix pass:
    // strictly-after in ascending bucket order == strictly-before in
    // descending order, and the (start → -1) frame is O(buckets)
    val wB =
      if (ceil)
        Window.partitionBy(pc: _*).orderBy(col("__lk_bkt").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
      else
        Window.partitionBy(pc: _*).orderBy(col("__lk_bkt").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
    val bOff = bAgg
      .withColumn("__lk_off", extremum(col("__lk_b")).over(wB))
      .select(pc ++ Seq(col("__lk_bkt"), col("__lk_off")): _*)
    val joined = local.join(broadcast(bOff), partCols :+ "__lk_bkt")
    val ansExpr =
      if (ceil) least(col("__lk_loc"), col("__lk_off"))
      else greatest(col("__lk_loc"), col("__lk_off"))
    joined.filter(col("__lk_c") === 0)
      .withColumn("__lk_ans", ansExpr)
      .select(
        partCols.map(col) ++
          tCols.filterNot(partCols.contains).map(c =>
            col(s"__lk_tc_$c").as(c)) ++
          cPayload.map(p => col(s"__lk_ans.$p").as(p)): _*)
  }

  def shardedCum(hist: DataFrame, keyCol: String,
      sums: Seq[(String, String)], partCols: Seq[String] = Nil,
      targetBuckets: Int = 4096): DataFrame = {
    require(sums.nonEmpty, "need at least one (in, out) sum column")
    require(targetBuckets > 0, s"targetBuckets must be > 0: $targetBuckets")
    val bounds = hist
      .agg(min(col(keyCol)).as("__pfx_mn"), max(col(keyCol)).as("__pfx_mx"))
      .select(col("__pfx_mn"), greatest(lit(1L),
          expr(s"(__pfx_mx - __pfx_mn + $targetBuckets) div $targetBuckets"))
        .as("__pfx_span"))
    val pc: Seq[Column] = partCols.map(col)
    // explicit barrier on (part, bucket): the bucketed relation feeds
    // both the within-bucket windows and the bucket-totals rollup, and
    // AQE must not coalesce a few MB of histogram into one task ahead
    // of the window (the Dedup.barrier rationale)
    // NULL keys fail LOUDLY instead of silently vanishing: the
    // unpartitioned window this helper replaces ordered NULLs first
    // and INCLUDED them, so a silent drop here would leave cumulative
    // counts that never reach the separately-computed totals (n_ref /
    // n_tot in the quantile callers) and shift every KS/target
    // downstream. Callers histogram on cast("long") keys — an
    // unparseable score must surface as an error, not a CDF gap.
    val bucketed = Dedup.barrier(
      hist.crossJoin(broadcast(bounds))
        .withColumn("__pfx_bkt",
          when(col(keyCol).isNull, raise_error(lit(
            s"shardedCum: NULL key in `$keyCol` - the histogram must " +
              "pre-aggregate or exclude the null group explicitly"))
            .cast("long"))
          .otherwise(expr(s"(`$keyCol` - __pfx_mn) div __pfx_span"))),
      pc :+ col("__pfx_bkt"): _*)
    val wIn = Window.partitionBy(pc :+ col("__pfx_bkt"): _*)
      .orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sums.foldLeft(bucketed) { case (d, (in, out)) =>
      d.withColumn(s"__pfx_l_$out", sum(col(in)).over(wIn))
    }
    // bucket totals derive from the WINDOWED relation (max of a
    // non-decreasing running sum), not a second aggregate over hist —
    // both consumers sit above the one barrier exchange
    val totalAggs = sums.map { case (_, out) =>
      max(col(s"__pfx_l_$out")).as(s"__pfx_t_$out")
    }
    val wB = Window.partitionBy(pc: _*).orderBy("__pfx_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = sums.foldLeft(
      local.groupBy(pc :+ col("__pfx_bkt"): _*)
        .agg(totalAggs.head, totalAggs.tail: _*)) { case (d, (_, out)) =>
        d.withColumn(s"__pfx_o_$out",
          coalesce(sum(col(s"__pfx_t_$out")).over(wB), lit(0L)))
      }
      .select(pc ++ Seq(col("__pfx_bkt")) ++
        sums.map { case (_, out) => col(s"__pfx_o_$out") }: _*)
    val joined = local.join(broadcast(offs), partCols :+ "__pfx_bkt")
    sums.foldLeft(joined) { case (d, (_, out)) =>
        d.withColumn(out, col(s"__pfx_o_$out") + col(s"__pfx_l_$out"))
      }
      .drop(Seq("__pfx_mn", "__pfx_span", "__pfx_bkt") ++
        sums.flatMap { case (_, out) =>
          Seq(s"__pfx_l_$out", s"__pfx_o_$out")
        }: _*)
  }
}
