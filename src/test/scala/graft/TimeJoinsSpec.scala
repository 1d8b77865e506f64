package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeJoins

/** Unit tests for the temporal joins on synthetic data with
  * hand-computed expectations (equal-timestamp matches, ties among
  * right rows, unmatched left rows, window boundaries); fixture-level
  * correctness is gated by the DuckDB oracles (q27 vs native ASOF
  * JOIN, q28 vs an inequality join).
  */
class TimeJoinsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("asOf: latest preceding right row per key, equality included") {
    val left = Seq(
      (1L, "u1", 100L), // strictly after r10 and r11 -> r11
      (2L, "u1", 50L),  // equal ts to r10 -> matches (<=)
      (3L, "u1", 10L),  // before everything -> null
      (4L, "u2", 999L)  // key with no right rows -> null
    ).toDF("click_id", "key", "t")
    val right = Seq(
      (10L, "u1", 50L),
      (11L, "u1", 70L),
      (12L, "u3", 1L)
    ).toDF("rid", "key", "t")
    val got = TimeJoins.asOf(left, right, "key", "t", "t",
        payload = Seq("rid"), tieBreak = "rid")
      .select("click_id", "rid").orderBy("click_id").collect()
    assert(got(0).getLong(1) == 11L)
    assert(got(1).getLong(1) == 10L)
    assert(got(2).isNullAt(1))
    assert(got(3).isNullAt(1))
  }

  test("asOf: equal-timestamp right rows resolve to the max tie-break") {
    val left = Seq((1L, "u1", 100L)).toDF("click_id", "key", "t")
    val right = Seq((7L, "u1", 100L), (9L, "u1", 100L), (3L, "u1", 100L))
      .toDF("rid", "key", "t")
    val got = TimeJoins.asOf(left, right, "key", "t", "t",
      payload = Seq("rid"), tieBreak = "rid").collect()
    assert(got(0).getAs[Long]("rid") == 9L)
  }

  test("rangeCountPreceding: half-open window, bucket straddling, zero counts") {
    val W = 100L
    val left = Seq(
      (1L, "u1", 250L), // window [150, 250): r at 150 in, 249 in, 250 out
      (2L, "u1", 150L), // window [50, 150): r at 50 in, 149 in
      (3L, "u2", 500L)  // no right rows -> 0
    ).toDF("id", "key", "t")
    val right = Seq(
      ("u1", 50L), ("u1", 149L), ("u1", 150L), ("u1", 249L), ("u1", 250L)
    ).toDF("key", "t")
    val got = TimeJoins.rangeCountPreceding(left, right, "key", "t", "t",
        window = W, leftId = "id", countName = "n")
      .select("id", "n").orderBy("id").collect()
    assert(got(0).getLong(1) == 2L, "expected {150, 249}")
    assert(got(1).getLong(1) == 2L, "expected {50, 149}")
    assert(got(2).getLong(1) == 0L)
  }

  test("asOf matches a brute-force reference on seeded random data") {
    val rnd = new scala.util.Random(42)
    val keys = Seq("a", "b", "c")
    val left = (1L to 120L).map(i =>
      (i, keys(rnd.nextInt(3)), rnd.nextInt(200).toLong)).toSeq
    val right = (1000L to 1080L).map(i =>
      (i, keys(rnd.nextInt(3)), rnd.nextInt(200).toLong)).toSeq
    val got = TimeJoins.asOf(
        left.toDF("lid", "key", "t"), right.toDF("rid", "key", "t"),
        "key", "t", "t", payload = Seq("rid"), tieBreak = "rid")
      .select("lid", "rid").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    // brute force: max (t, rid) among right rows with same key, t <= lt
    val want = left.map { case (lid, k, lt) =>
      val cands = right.filter { case (_, rk, rt) => rk == k && rt <= lt }
      lid -> (if (cands.isEmpty) None
              else Some(cands.maxBy { case (rid, _, rt) => (rt, rid) }._1))
    }.toMap
    assert(got == want)
  }

  test("rangeCountPreceding matches a brute-force reference on seeded random data") {
    val rnd = new scala.util.Random(7)
    val keys = Seq("a", "b")
    val W = 50L
    val left = (1L to 100L).map(i =>
      (i, keys(rnd.nextInt(2)), rnd.nextInt(300).toLong)).toSeq
    val right = (1L to 150L).map(_ =>
      (keys(rnd.nextInt(2)), rnd.nextInt(300).toLong)).toSeq
    val got = TimeJoins.rangeCountPreceding(
        left.toDF("id", "key", "t"), right.toDF("key", "t"),
        "key", "t", "t", window = W, leftId = "id", countName = "n")
      .select("id", "n").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = left.map { case (id, k, lt) =>
      id -> right.count { case (rk, rt) => rk == k && rt >= lt - W && rt < lt }.toLong
    }.toMap
    assert(got == want)
  }

  test("retentionCohorts: hand-computed triangle, week-0 is the cohort size") {
    val wk = 604800L * 1000000L
    // cohort week 0: users 1,2,3 (u3 returns in week 1; u1 in weeks 1,2)
    // cohort week 1: user 4 only
    val events = Seq(
      (1L, 10L), (1L, wk + 5L), (1L, 2 * wk + 5L),
      (2L, 20L),
      (3L, 30L), (3L, wk + 7L), (3L, wk + 8L), // dup week collapses
      (4L, wk + 1L)
    ).toDF("user_id", "tsu")
    val got = TimeJoins.retentionCohorts(events, "user_id", "tsu")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == Map(
      (0L, 0L) -> ((3L, 3L, 1000000L)),
      (0L, 1L) -> ((2L, 3L, 666666L)),
      (0L, 2L) -> ((1L, 3L, 333333L)),
      (1L, 0L) -> ((1L, 1L, 1000000L))), s"got $got")
  }

  test("sessionCarryover: distinct type sets pair only across ADJACENT sessions") {
    val gap = 100L
    // u1: session0 {a,b} at t=0..10, session1 {b} at t=200,
    //     session2 {c} at t=400 -> carryover a->b, b->b, b->c, c->(none)
    // u2: single session {a} -> contributes nothing
    val events = Seq(
      (1L, 0L, 1L, "a"), (1L, 5L, 2L, "b"), (1L, 10L, 3L, "a"),
      (1L, 200L, 4L, "b"),
      (1L, 400L, 5L, "c"),
      (2L, 0L, 6L, "a")
    ).toDF("user_id", "tsu", "event_id", "etype")
    val got = TimeJoins.sessionCarryover(events, "user_id", "tsu",
        "event_id", "etype", gapUs = gap)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      ("a", "b") -> ((1L, 1000000L)),
      ("b", "b") -> ((1L, 500000L)),
      ("b", "c") -> ((1L, 500000L))), s"got $got")
  }

  test("q27/q28 plans: no cartesian, no inequality nested-loop join") {
    val q27 = queries.RelationalExt.q27(spark, "/root/testdata/sf0.001")
      .queryExecution.sparkPlan.toString
    val q28 = queries.RelationalExt.q28(spark, "/root/testdata/sf0.001")
      .queryExecution.sparkPlan.toString
    for ((name, p) <- Seq("q27" -> q27, "q28" -> q28)) {
      assert(!p.contains("CartesianProduct"), s"$name degraded to cartesian")
      assert(!p.contains("BroadcastNestedLoopJoin"),
        s"$name planned the inequality as a nested loop - the banded/window " +
          "form must be a pure equi-join/window")
    }
    assert(q27.contains("Window"), "as-of lost its running window")
    assert(q28.contains("SortMergeJoin") || q28.contains("ShuffledHashJoin") ||
      q28.contains("BroadcastHashJoin"), "range join lost its bucket equi-join")
  }

  test("behaviorDrift: hand-computed half matrices; no pair crosses " +
      "the median cut; ppm masses balance") {
    // one user, 8 events; half 1 (ts 1..4) walks a,b,a,b and half 2
    // (ts 5..8) walks a,c,a,c -> the behavior flip shows as four
    // fully-deviating cells; the b->? pair that would straddle the
    // cut (ts4 b -> ts5 a) must NOT appear in either half
    val events = Seq(
      (1L, 1L, 1L, "a"), (1L, 2L, 2L, "b"), (1L, 3L, 3L, "a"),
      (1L, 4L, 4L, "b"),
      (1L, 5L, 5L, "a"), (1L, 6L, 6L, "c"), (1L, 7L, 7L, "a"),
      (1L, 8L, 8L, "c")
    ).toDF("user_id", "tsu", "event_id", "etype")
    val got = TimeJoins.behaviorDrift(events, "user_id", "tsu",
        "event_id", "etype")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(6)))).toMap
    assert(got == Map(
      ("a", "b") -> ((2L, 0L, 666666L)),
      ("b", "a") -> ((1L, 0L, 333333L)),
      ("a", "c") -> ((0L, 2L, 666666L)),
      ("c", "a") -> ((0L, 1L, 333333L))), s"got $got")
    // real table: per-half ppm masses each sum to 1e6 minus dust
    import org.apache.spark.sql.functions.{col => c2, expr => e2}
    val real = TimeJoins.behaviorDrift(
      Tables.eventsNanos(spark, "/root/testdata/sf0.001")
        .select(c2("user_id"), e2("ts div 1000").as("tsu"),
          c2("event_id"), c2("event_type")),
      "user_id", "tsu", "event_id", "event_type").collect()
    val s1 = real.map(_.getLong(4)).sum
    val s2 = real.map(_.getLong(5)).sum
    assert(s1 > 1000000L - real.length && s1 <= 1000000L, s"s1=$s1")
    assert(s2 > 1000000L - real.length && s2 <= 1000000L, s"s2=$s2")
  }

  test("purgedTimeSplit: hand-computed cuts; embargo zones bracket " +
      "each boundary; classes are time-monotone") {
    import org.apache.spark.sql.functions.{col, expr}
    // 10 events at t=1..10us, 70/15 -> cut1 = min{t: cum >= 7} = 7,
    // cut2 = min{t: cum >= ceil(8.5)=9} = 9; embargo 1us eats t=8
    // (after cut1) and t=10 (after cut2), leaving val = {9}, test = {}
    val events = (1L to 10L).map(t => (t, t)).toSeq
      .toDF("event_id", "tsu")
    val got = TimeJoins.purgedTimeSplit(events, "event_id", "tsu",
        trainPct = 70, valPct = 15, embargoUs = 1L)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got == (1L to 7L).map(_ -> "train").toMap ++
      Map(8L -> "embargo", 9L -> "val", 10L -> "embargo"), s"got $got")
    // time-monotone classes on the real table: every train ts <=
    // every val ts <= every test ts, embargoes in between
    val real = TimeJoins.purgedTimeSplit(
      Tables.eventsNanos(spark, "/root/testdata/sf0.001")
        .select(col("event_id"), expr("ts div 1000").as("tsu")),
      "event_id", "tsu", 70, 15, 6L * 3600L * 1000000L)
      .collect().map(r => (r.getLong(1), r.getString(2)))
    def maxOf(s: String) = real.filter(_._2 == s).map(_._1)
    assert(maxOf("train").nonEmpty && maxOf("val").nonEmpty)
    assert(maxOf("train").max < maxOf("val").min,
      "train must strictly precede val")
    if (maxOf("test").nonEmpty)
      assert(maxOf("val").max < maxOf("test").min,
        "val must strictly precede test")
    // roughly 70% train by construction (exact count quantile)
    val nTrain = real.count(_._2 == "train")
    assert(nTrain >= (real.length * 70) / 100,
      s"train short of its quantile: $nTrain of ${real.length}")
  }

  test("rfmSegments: hand-computed quartile bins; ties share; " +
      "assignment is map-only over broadcast thresholds") {
    val day = 86400L * 1000000L
    // 4 users, distinct frequencies 1..4 -> thresholds 1,2,3 and bins
    // 1,2,3,4; recency: u1 last at day 0, others at day 3 (ties share
    // the r-histogram: recency 3,0,0,0 -> thr(1,2,3)=0,0,0 -> u1 bin 4,
    // rest bin 1); monetary all equal -> every m_bin = 1
    val events = Seq(
      (1L, 0L * day, 10.0),
      (2L, 3L * day, 2.5), (2L, 3L * day, 2.5), (2L, 3L * day, 5.0),
      (3L, 3L * day, 5.0), (3L, 3L * day, 5.0),
      (4L, 0L * day, 2.5), (4L, 1L * day, 2.5), (4L, 2L * day, 2.5),
      (4L, 3L * day, 2.5)
    ).toDF("user_id", "tsu", "value")
    val got = TimeJoins.rfmSegments(events, "user_id", "tsu", "value")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(7))))
      .toMap
    assert(got == Map(
      1L -> ((3L, 1L, 1000L, "R4F1M1")),
      2L -> ((0L, 3L, 1000L, "R1F3M1")),
      3L -> ((0L, 2L, 1000L, "R1F2M1")),
      4L -> ((0L, 4L, 1000L, "R1F4M1"))), s"got $got")
    // scale shape: thresholds ride ONE broadcast row; assignment adds
    // no user-keyed exchange and nothing degrades to a cartesian
    val plan = TimeJoins.rfmSegments(events, "user_id", "tsu", "value")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(900))
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      "thresholds/high-water mark must ride broadcasts")
  }
}
