package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan shape assertions at sf0.001: these lock in the
  * properties that matter at 100 TB — filters reaching the parquet
  * scan, column pruning, broadcast joins for star dims, and no
  * cartesian products in the bucketed similarity paths. A green
  * result here is what `.explain("formatted")` review verified by
  * hand, made regression-proof.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.sparkPlan.toString

  test("q01: filter is pushed down to the parquet scan") {
    val plan = planOf(queries.Relational.q01(spark, dir))
    assert(plan.contains("PushedFilters: ["), plan.take(500))
    assert(plan.contains("IsNotNull") || plan.contains("LessThanOrEqual"),
      "expected the date predicate among pushed filters")
  }

  test("q02: scan reads only the projected columns") {
    val df = queries.Relational.q02(spark, dir)
    val scanLine = planOf(df).linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    // lineitem has 16 columns; the projection needs a handful
    assert(!scanLine.contains("l_comment"),
      s"unprojected column read from parquet: $scanLine")
  }

  test("q24: no TypedImperative percentile buffer — sort-based plan only") {
    val plan = planOf(queries.RelationalExt.q24(spark, dir))
    // Spark's exact `percentile` is a TypedImperativeAggregate that
    // buffers every group value on one reducer (OOM at scale with
    // parallelism = #groups); the sort-based plan must not use it.
    assert(!plan.contains("percentile("), plan.take(800))
    assert(!plan.contains("ObjectHashAggregate"), plan.take(800))
    assert(plan.contains("Window"), "expected the rank/count window")
  }

  test("q21: star-schema dims are broadcast, not shuffled") {
    val plan = planOf(queries.RelationalExt.q21(spark, dir))
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("bucketed similarity paths contain no cartesian product") {
    val t9 = planOf(operators.Similarity.lshTopK(
      Tables.embeddings(spark, dir), "vec_id", "embedding", 3, 8))
    val t13 = planOf(operators.Similarity.lshNearDupPairs(
      Tables.embeddings(spark, dir), "vec_id", "embedding", 0.3, 8))
    for ((name, p) <- Seq("t09" -> t9, "t13" -> t13)) {
      assert(!p.contains("CartesianProduct"),
        s"$name plan degraded to a cartesian product")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"), s"$name lost its equi-join on the bucket key")
    }
  }

  test("t16: IVF plan broadcasts centroids and equi-joins on list id") {
    val plan = planOf(operators.Similarity.ivfTopK(
      Tables.embeddings(spark, dir), "vec_id", "embedding", 3, 16, 2))
    // assignment: big side never shuffles against the centroid table —
    // the nlist-row side is broadcast (nested-loop is fine: no equi key)
    assert(plan.contains("BroadcastNestedLoopJoin"),
      "centroid scoring must be a broadcast join, not a shuffle")
    assert(!plan.contains("CartesianProduct"),
      "IVF degraded to a cartesian product")
    // search: probe->list candidate join is an equi-join on the
    // centroid id, so fan-in per key is the inverted-list size
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), "lost the list-id equi-join")
    // assignment aggregation combines map-side before the exchange
    assert(plan.contains("partial_collect_list"),
      "assignment aggregation must combine map-side before the exchange")
  }

  test("minhash/simhash banding plans are equi-joins on compact keys") {
    val docs = Tables.documents(spark, dir)
    val t6 = planOf(operators.Dedup.minhashLsh(docs, "doc_id", "text", 3, 64, 16, 0.5))
    val t7 = planOf(operators.Dedup.simhashNearDups(docs, "doc_id", "text", 3, 3, 0.5))
    for ((name, p) <- Seq("minhash" -> t6, "simhash" -> t7)) {
      assert(!p.contains("CartesianProduct"), s"$name degraded to a cartesian")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"), s"$name lost its band-key equi-join")
    }
  }

  test("t19: decontamination broadcasts the benchmark shingle set") {
    val docs = Tables.documents(spark, dir)
    val plan = planOf(operators.CorpusOps.decontaminate(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0),
      "doc_id", "text", 4))
    // the training side must stay map-side against the (small) bench
    // set: a shuffle of the 100 TB corpus on shingle keys here would
    // be the bottleneck
    assert(plan.contains("BroadcastHashJoin"),
      "benchmark shingle set must be broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("t21: sequence packing windows are per-shard, never global") {
    val plan = planOf(operators.CorpusOps.packSequences(
      Tables.documents(spark, dir), "doc_id", "text", 512, 8))
    assert(plan.contains("Window"), "expected the running-sum window")
    // a global ordering would appear as an Exchange SinglePartition /
    // rangepartitioning ahead of the window
    assert(!plan.contains("SinglePartition"),
      "packing collapsed to a single partition - global window")
  }

  test("t17: repetition metrics are map-only — no Exchange anywhere") {
    val plan = planOf(operators.CorpusOps.repetitionMetrics(
      Tables.documents(spark, dir), "doc_id", "text"))
    // every metric is a per-row function of the token array; a shuffle
    // here means the operator regressed to the exploded-gram dataflow
    assert(!plan.contains("Exchange"),
      "repetition metrics shuffled — must stay a single map-only pass")
    assert(!plan.contains("CartesianProduct"))
  }

  test("t44: span rewrite shuffles key only on fp/doc_id, no cross product") {
    val plan = operators.CorpusOps.spanDedupRewrite(
        Tables.documents(spark, dir), "doc_id", "text", k = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"span rewrite degraded to all-pairs:\n${plan.take(1200)}")
    // every exchange must partition on the span fingerprint or the
    // doc id — a span-TEXT key here would mean the election shuffles
    // strings instead of 8-byte fingerprints
    val keys = "Exchange hashpartitioning\\(([a-zA-Z_]+)#"
      .r.findAllMatchIn(plan).map(_.group(1)).toSet
    assert(keys.nonEmpty && keys.subsetOf(Set("fp", "doc_id")),
      s"unexpected shuffle keys $keys:\n${plan.take(1200)}")
  }

  test("t45: hashed linear classifier is map-only — no Exchange anywhere") {
    val plan = planOf(operators.CorpusOps.hashedLinearScore(
      Tables.documents(spark, dir), "doc_id", "text",
      (0 until 64).map(i => ((i.toLong * 2654435761L + 7L) % 11L) - 5L), 0L, 0L))
    // the model is a literal array and the score a per-row fold — a
    // shuffle or join here means the inference degraded to a
    // weight-table join
    assert(!plan.contains("Exchange"),
      "classifier inference shuffled — must stay a single map-only pass")
    assert(!plan.contains("CartesianProduct"))
  }

  test("dedup family joins on compact keys, never full documents") {
    // the jaccard inverted-index join must join on the 8-byte shingle
    // fingerprint, not the shingle string
    val plan = planOf(operators.Dedup.jaccardPairs(
      Tables.documents(spark, dir), "doc_id", "text", 3, 0.05, 100000))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("shared LSH front end: family consumers plan ZERO corpus rescans") {
    // one materialized lshCandidates serves minhashLsh + containment +
    // contrastive without touching parquet again (edit-distance re-reads
    // TEXT for its DP by design — the only allowed scan there)
    val docs = Tables.documents(spark, dir)
    val shared = operators.Dedup.lshCandidates(docs, "doc_id", "text")
    def scans(df: org.apache.spark.sql.DataFrame): Int =
      "Scan parquet".r.findAllIn(df.queryExecution.executedPlan.toString).size
    assert(scans(operators.Dedup.minhashLsh(docs, "doc_id", "text",
      candOpt = Some(shared))) == 0, "minhashLsh must not rescan the corpus")
    assert(scans(operators.Dedup.containmentPairs(docs, "doc_id", "text",
      candOpt = Some(shared))) == 0, "containment must not rescan the corpus")
    assert(scans(operators.Dedup.contrastivePairs(docs, "doc_id", "text",
      candOpt = Some(shared))) <= 1,
      "contrastive may scan only for the random-tier bucket mins")
    assert(scans(operators.Dedup.editDistanceDedup(docs, "doc_id", "text",
      candOpt = Some(shared))) <= 2,
      "edit-distance re-reads text for candidate pairs only")
  }

  test("t112: IVF margin mining plans no cartesian/cross product") {
    // the scale path must meet sides only inside probed cells —
    // equi-joins on cid; the sole legal broadcast nested loop is the
    // nlist-row centroid assignment
    val plan = planOf(operators.Similarity.marginMutualPairsIvf(
      Tables.embeddings(spark, dir), "vec_id", "embedding",
      org.apache.spark.sql.functions.col("label") % 2 === 0, k = 4))
    assert(!plan.contains("CartesianProduct"),
      "IVF margin path must never plan a cartesian product")
  }

  test("q29: sessionization reuses ONE per-user shuffle for both windows and the agg") {
    // lag-flag window, running-sum window, and the per-(user, session)
    // aggregate all key on user_id — Catalyst must plan a single
    // hash-partitioning exchange (the final orderBy adds one range
    // exchange; that one is the query's own global sort).
    // Exchanges are inserted by EnsureRequirements — inspect the
    // executed plan, not the bare sparkPlan.
    val plan = queries.RelationalExt.q29(spark, dir).queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1, s"expected 1 hash exchange, got $hashExchanges:\n${plan.take(1200)}")
  }

  test("t92: SFT render plans ONE per-user shuffle for both windows and the agg") {
    // sessionize window keys on user_id; the offset window and the
    // per-session aggregate key on (user_id, session_id) — a
    // REFINEMENT of that clustering, so EnsureRequirements must add
    // only re-sorts, never a second hash exchange. A second exchange
    // here means the 100 TB event log shuffles twice.
    import org.apache.spark.sql.functions._
    val ev = Tables.eventsNanos(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("tsu"),
        col("event_id"), col("event_type"), col("value"))
    val plan = operators.CorpusOps.sftChatRender(ev, "user_id", "tsu",
        "event_id", "event_type", "value", Seq("view", "click"))
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"expected 1 hash exchange, got $hashExchanges:\n${plan.take(1200)}")
    assert(!plan.contains("Exchange SinglePartition"),
      "render collapsed to a single partition")
  }

  test("t86: priority sample is a bounded top-k heap, never a corpus sort") {
    // the global top-(k+1) must plan as TakeOrderedAndProject (a
    // per-partition heap merged on the driver); an Exchange
    // rangepartitioning here would be a full sort of the 100 TB corpus
    val plan = operators.CorpusOps.prioritySample(
        Tables.documents(spark, dir), "doc_id", "n_chars", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k lost its heap plan:\n${plan.take(1200)}")
    assert(!plan.contains("Exchange rangepartitioning"),
      "priority sample degraded to a global sort")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "tau must join the sample by broadcast")
  }

  test("t87/t88: shard-keyed packing plans reuse ONE hash exchange") {
    // packingReport: the audit agg groups on the same shard key the
    // packing window hash-distributed; lengthBucketBatches: the
    // per-(shard, batch) max window refines the rank window's shard
    // clustering — in both, a second hash exchange means the corpus
    // shuffles twice
    val docs = Tables.documents(spark, dir)
    val t87 = operators.CorpusOps.packingReport(docs, "doc_id", "text",
        budget = 512, shards = 8)
      .queryExecution.executedPlan.toString
    val t88 = operators.CorpusOps.lengthBucketBatches(docs, "doc_id",
        "text", batchSize = 32, shards = 8)
      .queryExecution.executedPlan.toString
    for ((name, plan) <- Seq("t87" -> t87, "t88" -> t88)) {
      val n = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(n == 1, s"$name: expected 1 hash exchange, got $n:\n${plan.take(1200)}")
      assert(!plan.contains("Exchange SinglePartition"),
        s"$name collapsed to a single partition")
    }
  }

  /** The round-13 scale-killer rule, regression-proofed: an
    * UNPARTITIONED WindowExec is legal ONLY over [[operators.Prefix]]'s
    * per-bucket totals relation (grouped on `__pfx_bkt`, ≤
    * targetBuckets rows per group — a CONSTANT bound). Any other
    * unpartitioned window serializes a corpus-scaling relation
    * through one task (distinct µs timestamps, distinct scores,
    * distinct gaps are all corpus-sized in production even when the
    * fixture's collide).
    */
  private def assertNoUnshardedGlobalWindow(
      df: org.apache.spark.sql.DataFrame, name: String): Unit = {
    val wins = df.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
        if w.partitionSpec.isEmpty => w
    }
    wins.foreach { w =>
      // Prefix's two constant-bounded per-bucket relations: the
      // shardedCum totals (grouped on __pfx_bkt) and the
      // sharded lookup's per-bucket extrema (grouped on __lk_bkt) —
      // both ≤ targetBuckets rows per group by construction
      val overBucketTotals = w.child.collectFirst {
        case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
          if a.groupingExpressions.exists(e =>
            e.toString.contains("__pfx_bkt") ||
              e.toString.contains("__lk_bkt"))
        => a
      }.isDefined
      assert(overBucketTotals,
        s"$name: unpartitioned window over a corpus-scaling relation " +
          s"(only Prefix bucket totals/extrema may ride one):\n$w")
    }
  }

  test("t89: calibration's cumulative rides the sharded prefix sum — " +
      "no unpartitioned window over the score histogram") {
    // the corpus collapses to a pinned score histogram (one scan by
    // construction — localCheckpoint); the remaining plan is
    // histogram-sized, and its only single-partition stages are the
    // 1-row bounds/total aggregates and the constant-bounded
    // bucket-totals window
    val df = operators.CorpusOps.scoreCalibrationReport(
      Tables.documents(spark, dir), "doc_id", "text",
      queries.TrainingData.ClassifierWeights,
      org.apache.spark.sql.functions.col("lang") === "en", bins = 10)
    assertNoUnshardedGlobalWindow(df, "t89")
    val plan = df.queryExecution.executedPlan.toString
    // all bounded: the 1-row bounds + 1-row grand-total aggregates,
    // the ≤targetBuckets bucket-totals window, and its broadcast prep
    val single = "Exchange SinglePartition".r.findAllIn(plan).size
    assert(single <= 4,
      s"expected ≤4 bounded single-partition exchanges, got $single")
    assert(!plan.contains("CartesianProduct"))
  }

  test("t150/t155/t140/t118/t152/t164: no unpartitioned window over a " +
      "corpus-scaling histogram — the two-phase prefix-sum rule") {
    import org.apache.spark.sql.functions._
    val ev = Tables.eventsNanos(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("tsu"),
        col("event_id"), col("event_type"), col("value"))
    val docs = Tables.documents(spark, dir)
    assertNoUnshardedGlobalWindow(
      operators.TimeJoins.purgedTimeSplit(ev, "event_id", "tsu", 70, 15,
        embargoUs = 1000000L), "t150 purgedTimeSplit")
    assertNoUnshardedGlobalWindow(
      operators.TimeJoins.behaviorDrift(ev, "user_id", "tsu", "event_id",
        "event_type"), "t155 behaviorDrift")
    assertNoUnshardedGlobalWindow(
      operators.TimeJoins.gapDeciles(ev, "user_id", "tsu", "event_id",
        "event_type"), "t140 gapDeciles")
    assertNoUnshardedGlobalWindow(
      operators.TimeJoins.rfmSegments(ev, "user_id", "tsu", "value"),
      "rfmSegments")
    assertNoUnshardedGlobalWindow(
      operators.CorpusOps.quantileNormalize(docs, "doc_id", "source",
        "n_chars"), "t118 quantileNormalize")
  }

  test("t169: both epoch ranks ride one source-keyed exchange; " +
      "allocations broadcast; no cartesian") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    // empty component relation isolates the selection plan (the memo
    // path is covered by the t169 gate itself)
    val comps = docs.sparkSession.range(0)
      .select(col("id").as("node"))
    // the eligible relation is pinned (one scan+anti-join), so the
    // static plan decomposes into exactly: the windows' corpus shuffle
    // on source (ONE — the stacked rank windows share it) and the
    // histogram's partial-agg exchange (|sources|·partitions rows,
    // combined map-side)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = operators.CorpusOps.holdoutRefresh(docs, "doc_id", "source",
        comps, "node", totalN = 50, prevEpoch = 1L, epoch = 2L)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan.take(900))
      assert(plan.contains("BroadcastExchange") ||
        plan.contains("BroadcastHashJoin"),
        "the |sources|-row allocation must broadcast back")
      // count REAL exchange nodes only — a ReusedExchange line quotes
      // its target ("ReusedExchange [...], Exchange hashpartitioning")
      val hashExchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") &&
          !l.contains("ReusedExchange"))
      assert(hashExchanges == 2,
        s"expected windows shuffle + partial-agg exchange, got " +
          s"$hashExchanges:\n${plan.take(1600)}")
      assert(plan.contains("partial_count"),
        "the source histogram must combine map-side before its exchange")
      assert(!plan.contains("Exchange rangepartitioning"),
        "holdout selection gained a global sort")
      // both rank windows ride the ONE corpus shuffle: no exchange
      // may sit between the two Window operators
      val firstWin = plan.indexOf("Window [row_number()")
      val secondWin = plan.indexOf("Window [row_number()", firstWin + 1)
      assert(firstWin >= 0 && secondWin > firstWin)
      assert(!plan.substring(firstWin, secondWin).contains("Exchange"),
        "the two rank windows must share one source exchange")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("t90: contrastive mining stays on band-key equi-joins, no cross product") {
    val plan = operators.Dedup.contrastivePairs(
        Tables.documents(spark, dir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"pair mining degraded to all-pairs:\n${plan.take(1200)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), "lost the band/bucket equi-joins")
  }

  test("t91: margin mining has exactly ONE quadratic stage; the rest is candidate-sized") {
    // the cross-side kNN is the documented brute-force stage (swapped
    // for IVF candidates at corpus scale); neighborhood sums, margin,
    // and the mutual filter must all run as hash aggs / windows /
    // equi-joins over the candidate set — a second all-pairs join
    // means a downstream stage re-derived the cosine relation
    val side = org.apache.spark.sql.functions.col("label") % 2 === 0
    val candPlan = operators.Similarity.marginCandidates(
        Tables.embeddings(spark, dir), "vec_id", "embedding", side, k = 4)
      .queryExecution.executedPlan.toString
    val allPairs = ("CartesianProduct".r.findAllIn(candPlan).size
      + "BroadcastNestedLoopJoin".r.findAllIn(candPlan).size)
    assert(allPairs == 1,
      s"expected exactly one all-pairs stage, got $allPairs:\n${candPlan.take(1200)}")
    // downstream of the pinned candidates: hash aggs + id equi-joins
    // only — a second all-pairs join here means a consumer re-derived
    // the cosine relation instead of reading the checkpoint
    val plan = operators.Similarity.marginMutualPairs(
        Tables.embeddings(spark, dir), "vec_id", "embedding", side, k = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"a post-candidate stage re-ran the quadratic join:\n${plan.take(1200)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      "neighborhood sums lost their id equi-joins")
  }

  test("t93: preference pairs assemble without a self-join — one group shuffle") {
    // pair sides are recovered by the pair-index trick; a rank
    // self-join would shuffle the scored corpus twice and re-derive
    // the scoring lineage per side
    val docs = Tables.documents(spark, dir)
    val plan = operators.CorpusOps.preferencePairs(
        docs.select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("n_chars").as("score"),
          org.apache.spark.sql.functions.col("lang"),
          org.apache.spark.sql.functions.col("source")),
        "doc_id", "score", Seq("lang", "source"), maxPairs = 8, minGap = 1L)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"expected 1 hash exchange, got $hashExchanges:\n${plan.take(1200)}")
    assert(!plan.contains("Join"), "pair assembly degraded to a self-join")
  }

  test("t94: fertility report is one map-side-combined aggregation") {
    val plan = operators.CorpusOps.tokenizerFertility(
        Tables.documents(spark, dir), "text", Seq("lang", "source"))
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"expected 1 hash exchange, got $hashExchanges:\n${plan.take(1200)}")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "BPE counting must combine map-side — the shuffle carries group rows only")
    assert(!plan.contains("Window"), "report gained an unexpected window sort")
  }

  test("t95: percentile normalization is one per-source window, no corpus sort") {
    val docs = Tables.documents(spark, dir)
    val plan = operators.CorpusOps.scorePercentiles(
        docs.select(org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("n_chars").as("score"),
          org.apache.spark.sql.functions.col("source")),
        "doc_id", "score", Seq("source"))
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"expected 1 hash exchange, got $hashExchanges:\n${plan.take(1200)}")
    assert(!plan.contains("Exchange rangepartitioning") &&
      !plan.contains("Exchange SinglePartition"),
      "percentiles degraded to a global sort")
  }

  test("t97: gopher rules are map-only — no Exchange anywhere") {
    val plan = operators.CorpusOps.gopherRules(
        Tables.documents(spark, dir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"rule gate gained a shuffle:\n${plan.take(1200)}")
  }

  test("t98: exact decontam broadcasts one probe row — corpus text never shuffles") {
    val docs = Tables.documents(spark, dir)
    val plan = operators.CorpusOps.exactPhraseDecontaminate(
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0),
        docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0),
        "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "probe list must broadcast")
    // the ONLY legal corpus-side exchange is ScanGuard's explicit
    // low-split redistribution (REPARTITION_BY_NUM on doc_id — fires
    // here because the fixture is one row group; identity at
    // production layouts). The JOIN itself must never shuffle the
    // corpus: no ENSURE_REQUIREMENTS hash exchange, no range exchange.
    val hashEx = "Exchange hashpartitioning[^\\n]*".r.findAllIn(plan).toSeq
    assert(hashEx.forall(e => e.contains("REPARTITION_BY_NUM") &&
      e.contains("doc_id")),
      s"corpus-side join shuffle appeared:\n${hashEx.mkString("\n")}")
    assert(!plan.contains("Exchange rangepartitioning"),
      s"corpus-side sort shuffle appeared:\n${plan.take(1200)}")
  }

  test("t99: mutuality is an equi-join over the pinned k-NN edges, no cross product") {
    // the IVF stage's own shape is locked by the t16 case; here the
    // downstream graph assembly must stay on (a, b) equi-joins over
    // the checkpointed |V|·k edge relation
    val plan = operators.Similarity.mutualKnnClusters(
        Tables.embeddings(spark, dir), "vec_id", "embedding", k = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"mutual filter degraded to all-pairs:\n${plan.take(1200)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), "lost the edge equi-joins")
  }

  test("t100: edit verify moves text only for candidates — id equi-joins, no cross") {
    val plan = operators.Dedup.editDistanceDedup(
        Tables.documents(spark, dir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"edit verify degraded to all-pairs:\n${plan.take(1200)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      "lost the band-key / id equi-joins")
    assert(plan.contains("levenshtein"), "lost the exact DP verify")
  }

  test("t101: containment rides the minhash plan — band equi-joins, no cross product") {
    val plan = operators.Dedup.containmentPairs(
        Tables.documents(spark, dir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"containment degraded to all-pairs:\n${plan.take(1200)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), "lost the band/id equi-joins")
    assert(plan.contains("sorted_inter_count"),
      "lost the zero-allocation intersect kernel")
  }

  test("t102: divergence self-joins on the word key; totals broadcast") {
    val plan = operators.CorpusOps.sourceDivergence(
        Tables.documents(spark, dir), "text", "source")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"divergence degraded to all-pairs:\n${plan.take(1200)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), "lost the word-key equi-join")
    assert(plan.contains("BroadcastExchange"), "source masses must broadcast")
  }

  test("t103: apportionment windows run on the histogram; allocations broadcast back") {
    import org.apache.spark.sql.functions._
    val plan = operators.CorpusOps.hamiltonEvalSet(
        Tables.documents(spark, dir)
          .withColumn("stratum", concat_ws("|", col("lang"), col("source"))),
        "doc_id", "stratum", totalN = 200)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange rangepartitioning"),
      "apportionment gained a corpus sort")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastHashJoin"),
      "the |strata|-row allocation must broadcast back")
    assert(!plan.contains("CartesianProduct"))
  }

  test("t104: span corruption is one per-doc shuffle — windows and agg share it") {
    val plan = operators.CorpusOps.spanCorruption(
        Tables.documents(spark, dir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"expected 1 hash exchange, got $hashExchanges:\n${plan.take(1200)}")
    assert(!plan.contains("Exchange SinglePartition"),
      "corruption collapsed to a single partition")
  }

  test("t105: NSP pairs — successor equi-join; only the bucket table is nested-loop") {
    val plan = operators.CorpusOps.segmentPairs(
        Tables.documents(spark, dir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"pair build degraded to an unbroadcast cross:\n${plan.take(1200)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), "lost the successor equi-join")
  }

  test("t106: point-in-time features share ONE per-user window sort") {
    import org.apache.spark.sql.functions._
    val ev = Tables.eventsNanos(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("tsu"),
        col("event_id"), col("event_type"), col("value"))
    val plan = operators.TimeJoins.pointInTimeFeatures(ev, "user_id",
        "tsu", "event_id", "event_type", "value", "purchase")
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"expected 1 hash exchange, got $hashExchanges:\n${plan.take(1200)}")
    val windows = "Window ".r.findAllIn(plan).size
    assert(windows == 1,
      s"features split across $windows window operators — one sort expected")
  }

  test("t107: next-event pairs — one per-user window; the type catalog broadcasts") {
    import org.apache.spark.sql.functions._
    val ev = Tables.eventsNanos(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("tsu"),
        col("event_id"), col("event_type"))
    val plan = operators.TimeJoins.nextEventPairs(ev, "user_id", "tsu",
        "event_id", "event_type")
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges <= 2, // lead window + the catalog's distinct agg
      s"expected at most 2 hash exchanges, got $hashExchanges:\n${plan.take(1200)}")
    assert(plan.contains("BroadcastExchange") ||
      plan.contains("BroadcastNestedLoopJoin"),
      "the type catalog must broadcast")
    assert(!plan.contains("CartesianProduct"))
  }

  test("t108: coverage curve shuffles 8-byte fingerprints; the curve runs on the histogram") {
    val plan = operators.CorpusOps.coverageCurve(
        Tables.documents(spark, dir), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("fnv64"),
      "gram shuffle must carry fingerprints, not text")
    assert(plan.contains("partial_min") || plan.contains("partial_count"),
      "per-gram min must combine map-side")
    assert(!plan.contains("CartesianProduct"))
  }

  test("t109: multi-probe keeps the bucket equi-join; fan-out is map-side") {
    val plan = operators.Similarity.lshTopKMultiProbe(
        Tables.embeddings(spark, dir), "vec_id", "embedding", 3, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"multi-probe degraded to all-pairs:\n${plan.take(1200)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), "lost the bucket equi-join")
    assert(plan.contains("Generate"),
      "probe fan-out must be a map-side explode, not a join")
  }

  test("t111: funnel stages stack windows on ONE per-user shuffle") {
    import org.apache.spark.sql.functions._
    val ev = Tables.eventsNanos(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("tsu"),
        col("event_type"))
    val plan = operators.TimeJoins.funnel(ev, "user_id", "tsu",
        "event_type", Seq("signup", "view", "purchase"),
        maxGapUs = 86400L * 1000000L)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1,
      s"expected 1 hash exchange, got $hashExchanges:\n${plan.take(1200)}")
  }

  test("t96: backoff scoring joins gram keys only — no cross product, totals broadcast") {
    val plan = operators.CorpusOps.trigramBackoffScore(
        Tables.documents(spark, dir), "doc_id", "text",
        org.apache.spark.sql.functions.col("lang") === "en")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"backoff degraded to all-pairs:\n${plan.take(1200)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), "lost the gram-key equi-joins")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      "the 1-row token total must broadcast")
  }

  test("q32: blocked fuzzy join is an equi-join on the block key, no cross product") {
    val plan = planOf(queries.RelationalExt.q32(spark, dir))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"fuzzy join degraded to all-pairs:\n${plan.take(1200)}")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), "lost the p_size equi-join")
  }

  test("q37: lateral LIMIT decorrelates to a window group-limit, no per-row subquery") {
    // the scale property: LATERAL ... ORDER BY ... LIMIT k becomes ONE
    // shuffle on the correlation key + a rank-pushdown WindowGroupLimit,
    // never a nested-loop re-execution of the subquery per outer row
    val plan = planOf(queries.RelationalExt2.q37(spark, dir))
    assert(!plan.contains("CartesianProduct"),
      s"lateral degraded to a cross product:\n${plan.take(1200)}")
    assert(plan.contains("WindowGroupLimit"),
      s"expected rank-pushdown WindowGroupLimit:\n${plan.take(1200)}")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), "lost the nation equi-join")
  }

  test("q35: pivot is the two-phase aggregate shape, both phases map-side partial") {
    val plan = queries.RelationalExt2.q35(spark, dir)
      .queryExecution.executedPlan.toString
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    // phase 1 aggregates on (y, status) — the only shuffle that sees
    // input-scale data; phase 2 (pivotfirst regrouped by y) shuffles
    // just |y x status| rows. More exchanges would mean the pivot
    // degraded to re-scanning or expanding the input.
    assert(hashExchanges == 2, s"expected 2 hash exchanges, got $hashExchanges:\n${plan.take(1200)}")
    assert(plan.contains("pivotfirst"), "expected the two-phase pivot aggregate")
    assert(plan.contains("HashAggregate"), "expected hash aggregation, not sort-based")
  }

  test("q39: gap-fill calendar is broadcast; LOCF window is per-entity") {
    val plan = planOf(queries.RelationalExt2.q39(spark, dir))
    // the month calendar (~80 rows) must ride a broadcast, never a
    // shuffle — the only acceptable nested-loop is that broadcast cross
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"calendar grid lost its broadcast:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"),
      s"grid degraded to a cartesian product:\n${plan.take(1200)}")
    assert(plan.contains("Window"), "expected the LOCF window")
  }

  test("t30: BM25 semi-filters on broadcast query terms with rank-pushdown top-k") {
    val docs = Tables.documents(spark, dir)
    val plan = planOf(operators.CorpusOps.bm25TopK(docs, "doc_id", "text",
      Seq(1L -> "spark window join"), k1 = 1.2, b = 0.75, k = 10))
    // query terms prune the token stream via a broadcast join BEFORE
    // any aggregation — the posting lists never shuffle for non-query
    // terms — and the per-query top-k is a WindowGroupLimit (per-
    // partition heaps), not a full sort of all scored docs
    assert(plan.contains("BroadcastHashJoin"),
      s"query-term filter lost its broadcast:\n${plan.take(1200)}")
    assert(plan.contains("WindowGroupLimit"),
      s"expected rank-pushdown top-k:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("t29: unigram quality reuses the tf shuffle for corpus counts") {
    val docs = Tables.documents(spark, dir)
    val df = operators.CorpusOps.unigramMeanProb(docs, "doc_id", "text")
    df.collect() // finalize THIS df's adaptive plan (count() would build its own)
    val plan = df.queryExecution.executedPlan.toString
    // corpus unigram counts derive from the (doc, term) tf aggregate:
    // both consumers share the tf exchange, so the token explode runs
    // over the corpus ONCE — the second branch is a ReusedExchange /
    // ReusedQueryStage, not a second scan+explode
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"tf shuffle not reused — corpus would be tokenized twice:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("q46: correlated scalar subquery decorrelates to one aggregate + join") {
    val plan = planOf(queries.RelationalExt2.q46(spark, dir))
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    // decorrelation = the customer side aggregates ONCE on the
    // correlation key, then joins — a per-row re-execution would show
    // no aggregate below the join at all
    assert(plan.contains("HashAggregate"), plan.take(1200))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin") ||
      plan.contains("ShuffledHashJoin"), "lost the decorrelated join")
  }

  test("t32/t33: PQ codebook and LUT are broadcast; the code scan never joins vectors") {
    val emb = Tables.embeddings(spark, dir)
    val enc = planOf(operators.Similarity.pqEncode(emb, "vec_id", "embedding", 4, 16))
    // the m·ksub codebook rides a broadcast; the argmin + regroup are
    // partial-aggregated map-side — no shuffle carries raw vectors
    assert(enc.contains("BroadcastHashJoin"),
      s"codebook lost its broadcast:\n${enc.take(1200)}")
    assert(!enc.contains("CartesianProduct"), enc.take(1200))
    assert(enc.contains("partial_min") || enc.contains("partial_"),
      "argmin must be map-side combinable")
    val adc = planOf(operators.Similarity.pqAdcTopK(emb, "vec_id", "embedding",
      Seq(0L, 7L, 42L), 5, 4, 16))
    assert(adc.contains("BroadcastHashJoin"),
      s"ADC LUT lost its broadcast:\n${adc.take(1200)}")
    assert(!adc.contains("CartesianProduct"), adc.take(1200))
    assert(adc.contains("WindowGroupLimit"),
      s"expected rank-pushdown top-k:\n${adc.take(1200)}")
  }

  test("t49/t50: pHash is map-only; Hamming banding joins on compact keys") {
    val docs = Tables.documents(spark, dir)
    val fps = operators.Multimodal.imagePhash(
      operators.Multimodal.withBmpPayload(docs, "doc_id", "text"), "doc_id")
    // the whole build+decode+hash pipeline is one partition-wise pass
    assert(!planOf(fps).contains("Exchange"),
      "pHash computation shuffled — must stay map-only")
    val pairs = planOf(operators.Dedup.hammingNearDups(
      fps, "doc_id", "phash", maxHamming = 3))
    assert(!pairs.contains("CartesianProduct"),
      "pHash banding degraded to a cartesian product")
    assert(pairs.contains("SortMergeJoin") || pairs.contains("ShuffledHashJoin") ||
      pairs.contains("BroadcastHashJoin"),
      "pHash banding lost its equi-join on (band, chunk)")
  }

  test("t53: audio fingerprint is map-only; banding keeps its equi-join") {
    val docs = Tables.documents(spark, dir)
    val fps = operators.Multimodal.audioFingerprint(
      operators.Multimodal.withWavPayload(docs, "doc_id", "text"), "doc_id")
    // WAV build + RIFF decode + binned-energy hash: one partition-wise pass
    assert(!planOf(fps).contains("Exchange"),
      "audio fingerprinting shuffled — must stay map-only")
    val pairs = planOf(operators.Dedup.hammingNearDups(
      fps, "doc_id", "afp", maxHamming = 3))
    assert(!pairs.contains("CartesianProduct"),
      "audio banding degraded to a cartesian product")
    assert(pairs.contains("SortMergeJoin") || pairs.contains("ShuffledHashJoin") ||
      pairs.contains("BroadcastHashJoin"),
      "audio banding lost its equi-join on (band, chunk)")
  }

  test("t59: IVF-PQ probes/LUT broadcast; rank-pushdown top-k; no cartesian") {
    val plan = planOf(operators.Similarity.ivfPqTopK(
      Tables.embeddings(spark, dir), "vec_id", "embedding",
      Seq(0L, 7L, 42L), 5, 16, 2, 4, 16))
    assert(plan.contains("BroadcastHashJoin"),
      s"probe/LUT relations lost their broadcast:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    assert(plan.contains("WindowGroupLimit"),
      s"expected rank-pushdown top-k:\n${plan.take(1200)}")
  }

  test("t56: Bloom words broadcast; no shingle-keyed corpus shuffle") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, dir)
    val plan = planOf(operators.CorpusOps.bloomDecontaminate(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", 4))
    assert(plan.contains("BroadcastHashJoin"),
      s"Bloom word table lost its broadcast:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("t58: curriculum offsets broadcast; corpus window is partitioned") {
    val plan = planOf(operators.CorpusOps.curriculumOrder(
      Tables.documents(spark, dir), "doc_id", "text", 4, 6))
    assert(plan.contains("BroadcastHashJoin"),
      s"offset histogram lost its broadcast:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    // the corpus-sized row_number must be partitioned by (bin, bucket)
    // — a partitionless corpus window would serialize on one task
    assert(plan.contains("windowspecdefinition(bin"),
      s"corpus window lost its (bin, bucket) partitioning:\n${plan.take(1500)}")
  }

  test("persisted IVF-PQ search prunes the codes SCAN to probed cells") {
    val emb = Tables.embeddings(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpq_plan")
      .resolve("index").toString
    operators.Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", path,
      minNlist = 16, m = 4, ksub = 16)
    val df = operators.Similarity.searchIvfPqIndex(spark, path,
      emb.filter(org.apache.spark.sql.functions.col("vec_id")
        .isin(0L, 7L, 42L)), "vec_id", "embedding", k = 5, nprobe = 2)
    val plan = df.queryExecution.executedPlan.toString
    // the probe relation must reach the codes scan as a PARTITION
    // filter (dynamic pruning reusing the qprobes broadcast) — at
    // 100 TB this is the difference between reading nprobe/nlist of
    // the code files and shuffling the entire codes relation
    assert(plan.contains("dynamicpruningexpression(cell"),
      s"codes scan lost its dynamic partition pruning on cell:\n${plan.take(2000)}")
    // and nothing may shuffle the codes relation before the probe
    // filter applies: the probe and LUT joins are both broadcast
    assert(!plan.contains("SortMergeJoin"),
      s"codes relation shuffled before the probe filter:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("persisted IVF-binary search prunes the codes SCAN to probed cells") {
    val emb = Tables.embeddings(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft_ivfbin_plan")
      .resolve("index").toString
    operators.Similarity.buildIvfBinaryIndex(emb, "vec_id", "embedding", path,
      minNlist = 16)
    val df = operators.Similarity.searchIvfBinaryIndex(spark, path,
      emb.filter(org.apache.spark.sql.functions.col("vec_id")
        .isin(0L, 7L, 42L)), emb, "vec_id", "embedding",
      k = 5, rerank = 16, nprobe = 2)
    val plan = df.queryExecution.executedPlan.toString
    // same discipline as the IVF-PQ store: the probe broadcast must
    // reach the codes scan as a partition filter, and the codes
    // relation must never shuffle ahead of it
    assert(plan.contains("dynamicpruningexpression(cell"),
      s"codes scan lost its dynamic partition pruning on cell:\n${plan.take(2000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"codes relation shuffled before the probe filter:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("t142: first-touch attribution is a pure RANGE-frame window — " +
      "no inequality join") {
    val plan = planOf(queries.TrainingData.eventsAttribution(spark, dir))
    // the lookback must be a window frame, never a time-range join —
    // Spark plans inequality joins as nested loops (quadratic per key)
    assert(plan.toLowerCase.contains("rangeframe"),
      s"attribution lost its RANGE frame:\n${plan.take(1500)}")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"attribution degraded to an inequality join:\n${plan.take(1500)}")
  }

  test("t138: the corpus prefix sum rides a PARTITIONED window; only " +
      "the bucket relation is globally ordered") {
    val df = operators.CorpusOps.tokenBudgetShards(
      Tables.documents(spark, dir), "doc_id", "text", budget = 8192L)
    val plan = planOf(df)
    // the corpus-sized running sum must be partitioned by bucket — a
    // partitionless ORDER BY doc_id window serializes 100 TB through
    // one task; the only unpartitioned window allowed is the one over
    // the |docs|/span bucket-totals relation
    assert("windowspecdefinition\\(bucket#\\d+L?, doc_id#".r
        .findFirstIn(plan).isDefined,
      s"corpus prefix sum lost its bucket partitioning:\n${plan.take(1500)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket offsets lost their broadcast:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
    // both consumers (windows + bucket totals) must share ONE barrier
    // exchange — a broken canonical match re-scans and re-tokenizes
    // the corpus (the isNotNull pre-filter in the operator is what
    // keeps the exchange children identical)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedExchange"),
      s"bucket barrier not reused - corpus scanned twice:\n${executed.take(1500)}")
  }

  test("persisted winnow search prunes the fps SCAN to the batch's buckets") {
    val docs = Tables.documents(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft_winnow_plan")
      .resolve("index").toString
    operators.Dedup.buildWinnowIndex(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0),
      "doc_id", "text", path)
    val df = operators.Dedup.searchWinnowIndex(spark, path,
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0),
      "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    // the batch's touched bucket ids must reach the fps scan as a
    // STATIC IN partition filter — at 100 TB this is the difference
    // between listing the touched buckets' files and reading the
    // whole corpus sketch
    assert("PartitionFilters: \\[[^\\]]*fpb".r.findFirstIn(plan).isDefined &&
        "PartitionFilters: \\[[^\\]]*fpb[^\\]]*IN".r.findFirstIn(plan.replace("\n", " ")).isDefined,
      s"fps scan lost its fpb bucket partition filter:\n${plan.take(2000)}")
    // and the probe rides a broadcast, never a shuffle of the index
    assert(plan.contains("BroadcastHashJoin"),
      s"fps probe lost its broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("persisted band-index search prunes BOTH stored scans to the " +
      "probe's buckets") {
    val docs = Tables.documents(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft_band_plan")
      .resolve("index").toString
    operators.Dedup.buildBandIndex(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0),
      "doc_id", "text", path)
    val batch =
      docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 =!= 0)
    // band keys prune the bands scan (asserted on the candidate
    // stage's own plan — the search pins that relation, so the final
    // plan only shows its materialized RDD)...
    val candPlan = operators.Dedup.bandProbeCandidates(spark, path,
        operators.Dedup.batchBandRows(spark, path, batch, "doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bb".r.findFirstIn(candPlan).isDefined,
      s"bands scan lost its bb bucket partition filter:\n${candPlan.take(2000)}")
    // ...and candidate ids prune the sigs scan in the search plan —
    // at 100 TB the search reads probe-sized slices of both stored
    // relations, never the whole index
    val df = operators.Dedup.searchBandIndex(spark, path, batch,
      "doc_id", "text")
    val plan = df.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*db".r.findFirstIn(plan).isDefined,
      s"sigs scan lost its db bucket partition filter:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("persisted inverted-index search prunes the postings SCAN to the " +
      "query terms' buckets") {
    val docs = Tables.documents(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft_invidx_plan")
      .resolve("index").toString
    operators.CorpusOps.buildInvertedIndex(docs, "doc_id", "text", path)
    val df = operators.CorpusOps.searchInvertedIndex(spark, path,
      Seq(1L -> "spark window join"), k1 = 1.2, b = 0.75, k = 10)
    val plan = df.queryExecution.executedPlan.toString
    // the query terms' bucket ids arrive as a STATIC IN filter on the
    // partition column — only those buckets' posting files are listed
    // and read; at 100 TB this is |query terms|/buckets of the index
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"postings scan lost its bucket partition filter:\n${plan.take(2000)}")
    // the term filter rides a broadcast, never a shuffle of postings
    assert(plan.contains("BroadcastHashJoin"),
      s"query-term filter lost its broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("t65: duplicated-range detection shuffles only fp/doc_id keys") {
    val plan = operators.CorpusOps.maximalDupRanges(
        Tables.documents(spark, dir), "doc_id", "text", l = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"dup-range detection degraded to all-pairs:\n${plan.take(1200)}")
    // every exchange keys on the 8-byte gram fingerprint or the doc
    // id — a gram-TEXT key would shuffle strings corpus-wide
    val keys = "Exchange hashpartitioning\\(([a-zA-Z_]+)#"
      .r.findAllMatchIn(plan).map(_.group(1)).toSet
    assert(keys.nonEmpty && keys.subsetOf(Set("fp", "doc_id")),
      s"unexpected shuffle keys $keys:\n${plan.take(1200)}")
  }

  test("t68: phrase search prunes the postings scan and broadcasts the " +
      "phrase relation") {
    val docs = Tables.documents(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft_phrase_plan")
      .resolve("index").toString
    operators.CorpusOps.buildInvertedIndex(docs, "doc_id", "text", path)
    val plan = operators.CorpusOps.phraseSearch(spark, path,
        Seq(1L -> "window join"), k = 10)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(plan).isDefined,
      s"postings scan lost its bucket partition filter:\n${plan.take(2000)}")
    assert(plan.contains("BroadcastHashJoin"),
      s"phrase relation lost its broadcast:\n${plan.take(2000)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("t72: per-domain cap is a rank-pushdown window, no corpus sort") {
    val plan = planOf(operators.CorpusOps.domainCap(
      Tables.documents(spark, dir), "doc_id", "source", 20))
    // rank <= cap must rewrite to WindowGroupLimit: map partitions
    // keep only cap rows per domain BEFORE the shuffle, which is what
    // makes a mega-domain (skewed host) survivable at 100 TB
    assert(plan.contains("WindowGroupLimit"),
      s"cap filter lost its rank pushdown:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("t82: epoch upsampling broadcasts per-source stats and expands map-side") {
    val plan = planOf(operators.CorpusOps.epochUpsample(
      Tables.documents(spark, dir), "doc_id", "text", "source",
      Map("src0" -> 5000L, "src1" -> 50000L, "src2" -> 600L), maxEpochs = 10))
    // the (source, epochs, threshold) relation rides a broadcast; the
    // replication is a Generate (explode) with no shuffle after it
    assert(plan.contains("BroadcastHashJoin"),
      s"per-source stats lost their broadcast:\n${plan.take(1200)}")
    assert(plan.contains("Generate"),
      s"epoch expansion lost its map-side explode:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("t83: contamination report broadcasts the benchmark grams — " +
      "the corpus never shuffles on gram keys") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, dir)
    val plan = planOf(operators.CorpusOps.contaminationReport(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", 4))
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark gram set lost its broadcast:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("t84: interleave ranking broadcasts offsets; corpus-sized " +
      "windows are bucket-partitioned, never global") {
    val plan = planOf(operators.CorpusOps.interleaveOrder(
      Tables.documents(spark, dir), "doc_id", "source"))
    // per-group offsets ride broadcasts; the only unpartitioned
    // windows run over histogram relations (sources x 2^bits rows)
    assert(plan.contains("BroadcastHashJoin"),
      s"offset relations lost their broadcast:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("t69: hybrid fusion tokenizes the corpus once — the tf exchange is reused") {
    val df = operators.CorpusOps.hybridRetrievalTopK(
      Tables.documents(spark, dir), "doc_id", "text",
      Seq(1L -> "spark window join"), k1 = 1.2, b = 0.75, k = 10)
    df.collect() // finalize THIS df's adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // both channels score the barriered query-term tf relation; the
    // second channel must ride a reused exchange, not a second
    // scan+tokenize of the corpus
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"tf exchange not reused — corpus tokenized per channel:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("t70: PageRank rounds join rank-to-edges as equi-joins; dangling mass broadcasts") {
    import org.apache.spark.sql.functions.{col, lit, sum => fsum, count, broadcast}
    val docs = Tables.documents(spark, dir)
    // plan ONE round explicitly: pageRank's loop checkpoints each
    // round, which hides the round plan behind an RDD scan
    val nodes = docs.select(col("source").as("node")).distinct()
    val edges = operators.GraphOps.domainAffinityEdges(
      docs, "source", "text", n = 3, maxDf = 10)
    val out = edges.groupBy("src").agg(fsum("weight").as("out_w"))
    val e = edges.join(out, "src")
    val outSrcs = e.select(col("src").as("node")).distinct()
    val ranks = nodes.withColumn("r", lit(1000000L))
    val plan = operators.GraphOps.pageRankRound(nodes, e, outSrcs, ranks,
      nNodes = 20L, base = 100L).queryExecution.executedPlan.toString
    // the per-round rank transfer is an equi-join on the source key
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"rank transfer lost its equi-join:\n${plan.take(1200)}")
    // the 1-row dangling aggregate rides a broadcast, never a shuffle
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"dangling mass lost its broadcast:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("t73: binary ANN broadcasts queries and candidates; rank-pushdown cuts") {
    val plan = planOf(operators.Similarity.binaryTopK(
      Tables.embeddings(spark, dir), "vec_id", "embedding",
      Seq(0L, 7L, 42L), k = 5, rerank = 16))
    // query words and the skinny candidate set both ride broadcasts —
    // the vector column never shuffles
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"queries/candidates lost their broadcast:\n${plan.take(1200)}")
    assert(plan.contains("WindowGroupLimit"),
      s"candidate cut lost its rank pushdown:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("t54: HLL registers partial-aggregate map-side; no wide shuffle") {
    val plan = planOf(operators.CorpusOps.hllDistinctSketch(
      Tables.documents(spark, dir), "text", 3, 8))
    // the register max must combine before the exchange — the shuffle
    // then carries at most m rows per partition, never the gram stream
    assert(plan.contains("partial_max") || plan.contains("partial_"),
      s"register max lost its map-side combine:\n${plan.take(1200)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("t173: boilerplate strip plans no window, no cartesian, and " +
      "map-side-combines the line census") {
    val plan = planOf(queries.TrainingData.queries("t173_line_boilerplate")
      .apply(spark, dir))
    // line granularity means corpus-scaling relations everywhere: the
    // census and the reassembly must both be keyed aggregations —
    // never a window (no rank/row_number shape exists here) and never
    // an all-pairs join
    assert(!plan.contains("Window"), plan.take(1200))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"), plan.take(1200))
    assert(plan.contains("partial_"),
      s"line census lost its map-side combine:\n${plan.take(1200)}")
  }

  test("t145: class scatter touches the corpus once; the pair stage is " +
      "an equi-join on dim over the 64·|labels| relation") {
    val df = operators.Similarity.classScatter(
      Tables.embeddings(spark, dir), "vec_id", "embedding", "label")
    val executed = df.queryExecution.executedPlan.toString
    // the single corpus read happens materializing the (label, dim)
    // pin; everything in the final plan runs on the 64·|labels|-row
    // checkpointed relation — zero parquet scans downstream
    assert("Scan parquet".r.findAllIn(executed).size == 0,
      "class scatter's pair stage must not rescan the corpus")
    assert(!executed.contains("CartesianProduct"), executed.take(1200))
    // the (label, dim) sum combines map-side before its exchange
    assert(executed.contains("partial_sum") || executed.contains("partial_"),
      s"dim sums lost their map-side combine:\n${executed.take(1200)}")
  }
}
