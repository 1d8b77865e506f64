package graft.operators

import org.apache.spark.sql.SparkSession

/** Execution-mode helper for the iterative drivers (PageRank rounds,
  * connected-components label propagation): their per-round plans are
  * FIXED-SHAPE joins/aggregations over already-pinned
  * (localCheckpoint) inputs, executed once per round as separate
  * actions. Under AQE every exchange of every round materializes as
  * its own stage-submission job plus a driver re-planning pause — the
  * r16 event-log profile measured ~10 jobs per round of 10–40 ms
  * each on t70/t99 (141 tasks across 77 jobs: pure scheduling), and
  * a same-window A/B of the whole query read −11% (t70) / −29%
  * (t99) with static planning. On a SMALL graph that latency IS the
  * round cost; re-planning a 20-row exchange buys nothing.
  *
  * On a LARGE graph the trade inverts: the rank⇄edge join of a
  * power-law graph wants AQE's skew split, and coalescing matters
  * once round relations carry real bytes. So static execution is
  * gated on the driver-side node count the drivers already collect —
  * NOT on core count or any local-mode property: above the threshold
  * every round keeps AQE exactly as before.
  */
private[graft] object IterDriver {
  /** Rounds over graphs at or below this node count run with static
    * plans (driver latency dominates); larger graphs keep AQE (skew
    * and partition sizing dominate). Env-overridable for A/B.
    */
  val StaticRoundsMaxNodes: Long =
    sys.env.get("SPARK_GRAFT_STATIC_ROUNDS_MAX_NODES")
      .map(_.toLong).getOrElse(1L << 17)

  /** Partition count of an already-pinned (localCheckpoint) relation
    * — plan metadata only, no job. Safe here because a checkpointed
    * Dataset's plan is a bare LogicalRDD: the observe()-claiming
    * hazard of materializing RDDs from live operator plans (the
    * CurationSpec lesson) cannot apply.
    */
  def pinnedPartitions(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.toRdd.getNumPartitions

  /** Run `f` with AQE disabled and the static shuffle partition count
    * pinned to `partitions` when the iterating relation is small (see
    * above); restore both settings whatever happens. Pinning the
    * shuffle width to the pinned inputs' own partition count is what
    * lets every round's join consume the checkpointed relation
    * IN PLACE — a static plan at the session default width would
    * re-shuffle the (AQE-coalesced) edge relation once per round,
    * which measured slower than leaving AQE on. The flip is
    * session-wide for the duration of `f` — the drivers run their
    * rounds synchronously on one thread, and every input the rounds
    * touch is already pinned, so no corpus-scale stage can be planned
    * inside the window.
    */
  /** Width-gated variant for drivers whose round relation has no
    * driver-side row count (perceptron features, BPE vocab): the
    * pinned relation's partition count is itself scale-adaptive (AQE
    * coalesced its final exchange by bytes), so few partitions ⇒ a
    * small relation ⇒ driver latency dominates the rounds. Above the
    * width bound the rounds keep AQE untouched.
    */
  val StaticRoundsMaxPartitions: Int =
    sys.env.get("SPARK_GRAFT_STATIC_ROUNDS_MAX_PARTS")
      .map(_.toInt).getOrElse(8)

  def maybeStaticRoundsByWidth[T](spark: SparkSession,
      pinned: org.apache.spark.sql.DataFrame)(f: => T): T = {
    val p = pinnedPartitions(pinned)
    if (p > StaticRoundsMaxPartitions) f
    else maybeStaticRounds(spark, nNodes = 0L, partitions = p)(f)
  }

  def maybeStaticRounds[T](spark: SparkSession, nNodes: Long,
      partitions: Int)(f: => T): T =
    if (nNodes > StaticRoundsMaxNodes) f
    else {
      val aqeKey = "spark.sql.adaptive.enabled"
      val partKey = "spark.sql.shuffle.partitions"
      val prevAqe = spark.conf.get(aqeKey)
      val prevPart = spark.conf.get(partKey)
      spark.conf.set(aqeKey, "false")
      spark.conf.set(partKey, math.max(1, partitions).toString)
      try f finally {
        spark.conf.set(aqeKey, prevAqe)
        spark.conf.set(partKey, prevPart)
      }
    }
}
