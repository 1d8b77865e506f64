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
