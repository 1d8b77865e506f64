package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextFunctions}

/** Graph centrality over corpus-derived link graphs (builder brief;
  * no reference counterpart): web-corpus curation ranks hosts by
  * centrality over the host link graph (the Common-Crawl-style
  * harmonic/PageRank host ranking) and uses the rank as a crawl-
  * priority / quality prior. Without hyperlink columns, the natural
  * link structure of a text corpus is CONTENT SYNDICATION — two
  * domains are linked when they publish the same word n-grams — so
  * the edge derivation here is the dedup machinery pointed at domains
  * instead of documents.
  *
  * Determinism: PageRank runs in scaled-integer arithmetic (ranks are
  * int64 fixed-point at Scale = 10^12; every per-edge transfer is one
  * floor division), so iteration results are order-independent exact
  * longs and the DuckDB oracle unrolls all rounds bit-for-bit.
  */
object GraphOps {

  /** Fixed-point scale for integer PageRank. */
  val RankScale = 1000000000000L

  /** Cross-domain syndication edges: weight(a → b) = number of
    * distinct word `n`-grams domains a and b both contain, for a ≠ b
    * (symmetric by construction — both directions are emitted).
    * Grams shared by more than `maxDf` domains are dropped first: the
    * standard stop-gram cut, which both removes boilerplate that
    * links everything to everything and bounds the self-join blowup
    * per gram to maxDf² pairs.
    *
    * Scale shape: explode grams map-side and compress each to its
    * 8-byte fnv64 fingerprint IN the map stage (the [[Dedup]]
    * discipline — shuffles carry longs, never gram text; the DuckDB
    * oracle replays raw gram strings, so fingerprint
    * collision-freedom is itself under test) → (domain, fp) distinct
    * with map-side combine → fp document-frequency agg over those
    * skinny rows → self-join WITHIN fp buckets only (never all-pairs
    * of domains; the maxDf cut caps each bucket) → pair count agg.
    */
  def domainAffinityEdges(docs: DataFrame, domainCol: String,
      textCol: String, n: Int, maxDf: Int): DataFrame = {
    require(n >= 1, s"gram size must be positive, got $n")
    require(maxDf >= 2, s"maxDf must be at least 2, got $maxDf")
    GraftFunctions.register(docs.sparkSession)
    val byDomain = docs.select(col(domainCol).as("src"),
        explode(call_function("fnv64_array",
          Dedup.shingles(col(textCol), n))).as("g"))
      .groupBy("src", "g").agg(count(lit(1)).as("dummy")).drop("dummy")
    val barred = Dedup.barrier(byDomain, col("g"))
    val eligible = barred.groupBy("g")
      .agg(count(lit(1)).as("gdf"))
      .filter(col("gdf") >= 2 && col("gdf") <= maxDf)
      .select("g")
    val e = barred.join(eligible, "g")
    e.as("a").join(e.as("b"), "g")
      .filter(col("a.src") =!= col("b.src"))
      .groupBy(col("a.src").as("src"), col("b.src").as("dst"))
      .agg(count(lit(1)).as("weight"))
  }

  /** PageRank over a weighted directed edge list, damping d = 85/100,
    * `iters` synchronous rounds from the uniform start. All
    * arithmetic is int64 fixed-point at [[RankScale]]:
    *
    *   r₀(v)   = Scale div N
    *   out(a)  = Σ_b w(a,b)
    *   c(b)    = Σ_a (r(a)·w(a,b)) div out(a)      — per-edge floor div
    *   dang    = Σ_{out(a)=0} r(a)                  — dangling mass
    *   r'(b)   = (15·Scale div 100) div N
    *           + (85·(c(b) + dang div N)) div 100
    *
    * (floor divisions leak a few units of mass per round — the price
    * of exactness; ranking order is unaffected at Scale = 10^12).
    *
    * Scale shape: the classic distributed PageRank — each round is
    * one join of the rank relation onto the out-degree-annotated edge
    * list (both shuffle-partitioned on the source key, so rounds
    * after the first reuse the edge exchange) plus a dst-keyed
    * partial-agg reduce; the dangling term is a 1-row broadcast. The
    * node count N is the only driver-side value (one scalar, the
    * sizing pattern the index builders already use). Nothing is ever
    * broadcast whose size grows with the graph.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be positive, got $iters")
    // The loop's rounds are SEPARATE actions; without materialization
    // every round (and the node count) would re-run the whole edge
    // derivation upstream of `edges` — measured 6× the operator's
    // cost on the syndication graph. localCheckpoint the derived
    // graph once (the GraphX discipline: iterate over a materialized
    // edge relation), then each round touches only checkpointed
    // inputs. Same per-round checkpoint for the N-row rank relation
    // (the BPE/Lloyd iterative-driver pattern) so lineage stays one
    // join + one agg deep, not a 2^round tree.
    val n0 = nodes.select("node").distinct().localCheckpoint(true)
    val nNodes = n0.count()
    require(nNodes > 0, "pageRank needs at least one node")
    val base = (15L * RankScale / 100L) / nNodes
    val out = edges.groupBy("src").agg(sum("weight").as("out_w"))
    val e = edges.join(out, "src").localCheckpoint(true)
    // int64 envelope: every per-edge transfer computes r·w with
    // r ≤ RankScale, so the largest weight must satisfy
    // RankScale·w < 2^63. DuckDB raises on BIGINT overflow; Spark
    // (non-ANSI) would wrap silently to corrupt negative
    // contributions — fail loudly at the same boundary instead. One
    // scalar agg over the already-checkpointed edge relation.
    val maxW = e.agg(coalesce(max("weight"), lit(0L))).collect().head.getLong(0)
    require(maxW <= Long.MaxValue / RankScale,
      s"pageRank edge weight $maxW overflows the int64 fixed-point " +
        s"envelope (max ${Long.MaxValue / RankScale} at scale $RankScale) " +
        "- reduce weights (e.g. cap shared-gram counts) or lower RankScale")
    // dangling test only needs the set of sources with out-edges —
    // derivable from the checkpointed edge relation for free
    val outSrcs = e.select(col("src").as("node")).distinct()
    // the rounds iterate over pinned inputs only — on a small graph
    // run them with static plans (the AQE per-stage job submission
    // was the round cost: see IterDriver) at the pinned edge
    // relation's own width, on a large one keep AQE
    IterDriver.maybeStaticRounds(nodes.sparkSession, nNodes,
      IterDriver.pinnedPartitions(e)) {
      var ranks = n0.withColumn("r", lit(RankScale / nNodes)).localCheckpoint(true)
      for (_ <- 1 to iters)
        ranks = pageRankRound(n0, e, outSrcs, ranks, nNodes, base).localCheckpoint(true)
      ranks.select(col("node"), col("r").as("rank_scaled"),
        (col("r").cast("double") / lit(RankScale.toDouble)).as("rank"))
    }
  }

  /** One synchronous PageRank round as an UN-materialized plan —
    * split out so the per-round shape (rank-to-edge equi-join on the
    * source key, dst-keyed partial-agg reduce, 1-row dangling
    * broadcast) is lockable by PlanShapeSpec; [[pageRank]]'s loop
    * checkpoints each round's result, which would otherwise hide the
    * round plan behind an RDD scan.
    */
  private[graft] def pageRankRound(n0: DataFrame, e: DataFrame,
      outSrcs: DataFrame, ranks: DataFrame, nNodes: Long, base: Long): DataFrame = {
    val contrib = e.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
      .select(col("dst"), expr("(r * weight) div out_w").as("c"))
      .groupBy("dst").agg(sum("c").as("contrib"))
      .withColumnRenamed("dst", "node")
    val dang = ranks.join(outSrcs, Seq("node"), "left_anti")
      .agg(coalesce(sum("r"), lit(0L)).as("dang"))
    n0.join(contrib, Seq("node"), "left")
      .crossJoin(broadcast(dang))
      .select(col("node"),
        (lit(base) +
          expr(s"85 * (coalesce(contrib, 0L) + (dang div ${nNodes}L)) div 100")
        ).as("r"))
  }

  /** Domain PageRank over the syndication graph — the corpus-curation
    * "host centrality prior" in one call: [[domainAffinityEdges]]
    * derives the link structure, [[pageRank]] ranks it. Domains with
    * no eligible shared gram still appear (dangling nodes holding the
    * uniform base mass).
    */
  def domainPageRank(docs: DataFrame, domainCol: String, textCol: String,
      n: Int = 3, maxDf: Int = 10, iters: Int = 5): DataFrame = {
    val nodes = docs.select(col(domainCol).as("node")).distinct()
    val edges = domainAffinityEdges(docs, domainCol, textCol, n, maxDf)
    pageRank(nodes, edges, iters)
      .select(col("node").as(domainCol), col("rank_scaled"), col("rank"))
  }
}
