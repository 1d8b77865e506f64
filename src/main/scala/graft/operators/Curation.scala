package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** End-to-end corpus curation: the composition a training-data
  * pipeline actually runs over a raw document pile — quality
  * filtering, repetition filtering, language filtering, PII
  * redaction, exact dedup, near-dup removal, semantic (embedding-
  * space) dedup, benchmark decontamination, stratified sampling, and
  * an optional closing span-dedup rewrite of the survivors — as one
  * declarative dataflow.
  *
  * Scale shape: quality/repetition/language/PII/sampling are map-only
  * (codegen'd per-row scoring); exact dedup shuffles a 32-byte
  * content hash; near-dup is MinHash+LSH (map-only signatures +
  * compact band-key shuffles); decontamination is a broadcast
  * semi-join against the (small) benchmark shingle set. Nothing
  * touches the driver; every stage streams.
  *
  * The attrition report is SINGLE-PASS: stage counts are collected
  * with `observe`/CollectMetrics accumulators during the one action
  * that materializes the curated output — not with per-stage
  * `count()` jobs that would each re-execute the pipeline prefix
  * (at 100 TB that was ~4 redundant full corpus passes). Two
  * structural rules keep the accumulator counts exact:
  *
  *   - observed nodes in a shared prefix sit below `repartition`
  *     barriers; the dedup self-joins and the decontamination
  *     anti-join reference those barriers twice, and Spark's exchange
  *     reuse executes the identical shuffle subtree (and therefore
  *     each CollectMetrics) exactly once (CurationSpec asserts the
  *     counts against independent jobs);
  *   - `afterExact` is derived as `afterNearDup + |losers|` from the
  *     loser branch, which occurs exactly once in the final plan, so
  *     it cannot double-count regardless of plan reuse.
  */
object Curation {

  final case class Config(
      minTokens: Int = 10,
      minQuality: Double = 0.3,
      /** Minimum distinct-token fraction (repetition filter, the
        * map-only Gopher-style gate); <= 0 disables the stage. Deeper
        * modal-n-gram filtering is [[CorpusOps.repetitionMetrics]].
        */
      minUniqFrac: Double = 0.0,
      keepLangs: Set[String] = Set.empty, // empty = keep all
      /** Redact PII (emails / IPv4 / phone runs + `piiTerms`) from
        * the text before dedup, so redaction-equal docs dedup
        * together and no PII survives into the curated corpus.
        */
      redactPii: Boolean = false,
      piiTerms: Seq[String] = Nil,
      /** Exact-dedup key: `false` (default) digests the raw text;
        * `true` digests [[Dedup.normalizeText]]'s canonical form, so
        * re-hosted copies differing only in casing, sentence
        * punctuation, or reflowed whitespace collapse in the exact
        * stage instead of burdening (or escaping) the near-dup
        * machinery. Same plan shape either way.
        */
      normalizedExactDedup: Boolean = false,
      nearDupThreshold: Double = 0.7,
      shingleSize: Int = 3,
      numPerms: Int = 64,
      bands: Int = 16,
      /** Near-dup candidate generator: "minhash" (tunable S-curve,
        * the default for loose thresholds) or "simhash" (one 64-bit
        * fingerprint per doc — cheapest at scale, recall bounded by
        * `maxHamming`, best for near-identical dedup).
        */
      nearDupStrategy: String = "minhash",
      maxHamming: Int = 3,
      /** Near-dup drop rule. `false` (default): drop every doc that
        * appears as the higher id of a qualifying pair — purely
        * declarative, single-action pipeline. `true`: resolve pairs
        * into connected components ([[Dedup.connectedComponents]])
        * and keep ONE doc (the min id) per cluster — the standard
        * corpus-dedup semantics (a doc linked only through an
        * already-dropped doc is still removed). The component fixed
        * point is inherently iterative, so enabling this runs its
        * jobs EAGERLY while the pipeline is being built; the loser
        * set it produces is a localCheckpoint (at cluster scale: a
        * checkpoint table) that the final action then scans once.
        */
      clusterNearDups: Boolean = false,
      /** Word n-gram size for benchmark decontamination (applies when
        * a bench set is passed to [[curateStaged]]). */
      decontamShingleSize: Int = 8,
      /** Semantic-dedup stage parameters (applies when an embedding
        * table is passed to [[curateStaged]]): drop every doc whose
        * [[Similarity.semDedup]] verdict is kept=false. Verdicts are
        * computed over the FULL embedding table — the offline-pipeline
        * convention (embeddings exist once, independent of which docs
        * earlier text stages dropped), and the contract the t40 oracle
        * gates. Like `clusterNearDups`, enabling this stage runs its
        * jobs EAGERLY while the pipeline is being built (the
        * clustering needs a count and a checkpoint); the loser set the
        * final anti-join scans is that checkpointed verdict relation.
        */
      semDedupThreshold: Double = 0.3,
      semDedupMinNlist: Int = 16,
      /** Column names of the embedding table's id (must align with
        * the doc id space) and vector. */
      embIdCol: String = "vec_id",
      embVecCol: String = "embedding",
      /** Per-language percent rates for deterministic stratified
        * sampling on `pred_lang`; empty disables the stage. */
      sampleRates: Map[String, Int] = Map.empty,
      sampleDefaultRate: Int = 100,
      /** Maximum any-alignment duplicated-token fraction
        * ([[CorpusOps.maximalDupRanges]] over `dupRangeL`-token
        * sliding windows): docs whose coalesced duplicated ranges
        * cover MORE than this fraction of their tokens are dropped —
        * the boilerplate-attrition gate (near-dup dedup keeps one
        * copy of a duplicated DOC; this removes docs that are mostly
        * duplicated MATERIAL, e.g. template-heavy pages whose unique
        * remainder is not worth keeping). <= 0 disables. Runs after
        * near-dup dedup, so surviving canonical copies define the
        * frequencies.
        */
      maxDupRangeFrac: Double = 0.0,
      dupRangeL: Int = 8,
      /** Span-dedup rewrite granularity ([[CorpusOps.spanDedupRewrite]]);
        * <= 0 disables the stage. When enabled, the FINAL stage
        * rewrites each surviving document, keeping one canonical copy
        * of every duplicated `spanRewriteK`-token span corpus-wide
        * (Lee et al. ACL'22 exact substring dedup). Runs last so the
        * election only pays for survivors; the `n_tokens`/`quality`
        * annotations describe the pre-rewrite text by design (they
        * are the values the filters acted on).
        */
      spanRewriteK: Int = 0)

  final case class Report(
      input: Long, afterQuality: Long, afterRepetition: Long,
      afterLang: Long, afterExact: Long, afterNearDup: Long,
      afterDupRange: Long, afterSemantic: Long, afterDecontam: Long,
      afterSample: Long,
      /** Total PII matches redacted (0 when redaction is off). */
      piiMatches: Long)

  /** A staged pipeline: run ONE action on `curated` (a write at
    * 100 TB; `count()` in tests), then call `report()` — it reads the
    * CollectMetrics accumulators that action populated. Calling
    * `report()` before any action blocks forever by Spark's
    * `Observation.get` contract, so don't.
    */
  final class Staged private[Curation] (
      val curated: DataFrame, mkReport: () => Report) {
    def report(): Report = mkReport()
  }

  /** Quality + language annotation columns (reusable standalone). */
  def annotate(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("n_tokens", TextFunctions.nTokens(col(textCol)))
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("pred_lang", TextFunctions.langId(col(textCol)))

  /** Build the full pipeline WITHOUT running it; the caller supplies
    * the single materializing action (see [[Staged]]). The near-dup
    * stage drops pair losers (greedy, default) or non-canonical
    * cluster members (`clusterNearDups` — see [[Config]]). Pass
    * `bench` to anti-join out every doc sharing a
    * `decontamShingleSize`-gram with the benchmark corpus.
    */
  def curateStaged(docs: DataFrame, idCol: String, textCol: String,
      config: Config = Config(), bench: Option[DataFrame] = None,
      embeddings: Option[DataFrame] = None): Staged = {
    val obsInput = Observation()
    val obsQuality = Observation()
    val obsRep = Observation()
    val obsLang = Observation()
    val obsPii = Observation()
    val obsLosers = Observation()
    val obsNearDup = Observation()
    val obsDupRange = Observation()
    val obsSemantic = Observation()
    val obsDecontam = Observation()
    val obsSample = Observation()
    def counted(df: DataFrame, obs: Observation): DataFrame =
      df.observe(obs, count(lit(1)).as("n"))

    val repetitionOn = config.minUniqFrac > 0.0
    val samplingOn = config.sampleRates.nonEmpty

    val scored = annotate(counted(docs, obsInput), textCol)
    val qualityFiltered = counted(scored.filter(
      col("n_tokens") >= config.minTokens && col("quality") >= config.minQuality),
      obsQuality)

    val ts = TextFunctions.tokens(col(textCol))
    val repFiltered =
      if (!repetitionOn) qualityFiltered
      else counted(qualityFiltered.filter(
        size(array_distinct(ts)).cast("double") / size(ts).cast("double")
          >= config.minUniqFrac), obsRep)

    val langFiltered = counted(
      if (config.keepLangs.isEmpty) repFiltered
      else repFiltered.filter(col("pred_lang").isin(config.keepLangs.toSeq: _*)),
      obsLang)

    val redacted =
      if (!config.redactPii) langFiltered
      else langFiltered
        .observe(obsPii, coalesce(sum(
          CorpusOps.piiMatchCount(col(textCol), config.piiTerms)), lit(0L)).as("n"))
        .withColumn(textCol, CorpusOps.redact(col(textCol), config.piiTerms))

    // Barriers: the exact-dedup semi-join consumes its input twice and
    // the near-dup anti-join consumes exactDeduped twice; repartition
    // exchanges make those subtrees reusable so each prefix (and each
    // observe in it) executes once per action.
    val prefixBarrier = Dedup.barrier(redacted, col(idCol))
    val exactDeduped = Dedup.barrier(
      if (config.normalizedExactDedup)
        Dedup.normalizedExact(prefixBarrier, idCol, textCol)
      else Dedup.exact(prefixBarrier, idCol, textCol),
      col(idCol))

    val nearDupPairs = config.nearDupStrategy match {
      case "simhash" => Dedup.simhashNearDups(exactDeduped, idCol, textCol,
        n = config.shingleSize, maxHamming = config.maxHamming,
        threshold = config.nearDupThreshold)
      case "minhash" => Dedup.minhashLsh(exactDeduped, idCol, textCol,
        n = config.shingleSize, numPerms = config.numPerms, bands = config.bands,
        threshold = config.nearDupThreshold)
      case other => throw new IllegalArgumentException(
        s"unknown nearDupStrategy '$other' (expected 'minhash' or 'simhash')")
    }
    val loserIds =
      if (!config.clusterNearDups)
        nearDupPairs.select(col("id_b").as(idCol)).distinct()
      else
        // non-canonical cluster members; runs the CC loop eagerly
        Dedup.connectedComponents(nearDupPairs, "id_a", "id_b")
          .filter(col("node") =!= col("comp"))
          .select(col("node").as(idCol))
    val losers = counted(loserIds, obsLosers)
    val nearDupCurated = counted(
      exactDeduped.join(losers, Seq(idCol), "left_anti"), obsNearDup)

    val dupRangeCurated =
      if (config.maxDupRangeFrac <= 0.0) nearDupCurated
      else {
        // maximalDupRanges consumes its input twice (gram stream +
        // the per-doc rejoin) — barrier so upstream observes stay
        // single-counted per action
        val barred = Dedup.barrier(nearDupCurated, col(idCol))
        val heavy = CorpusOps.maximalDupRanges(barred, idCol, textCol,
            config.dupRangeL)
          .filter(col("dup_tokens").cast("double") >
            col("n_tokens").cast("double") * config.maxDupRangeFrac)
          .select(col("doc_id").as(idCol))
        counted(barred.join(heavy, Seq(idCol), "left_anti"), obsDupRange)
      }

    val semanticCurated = embeddings match {
      case None => dupRangeCurated
      case Some(emb) =>
        // verdicts from the full embedding table; kept=false ids
        // anti-join the text-curated stream. semDedup's output is
        // already a checkpointed lineage, so the anti-join's right
        // side never re-runs the clustering per action.
        val semLosers = Similarity.semDedup(emb, config.embIdCol,
            config.embVecCol, config.semDedupMinNlist,
            config.semDedupThreshold)
          .filter(!col("kept")).select(col("vec_id").as(idCol))
        counted(dupRangeCurated.join(semLosers, Seq(idCol), "left_anti"),
          obsSemantic)
    }

    val decontamed = bench match {
      case None => semanticCurated
      case Some(b) =>
        // the anti-join consumes the prior stage's output twice (left
        // side + the shingle scan feeding contaminatedIds) — barrier
        // it so exchange reuse keeps the upstream observes
        // single-counted
        val barred = Dedup.barrier(semanticCurated, col(idCol))
        counted(barred.join(
          CorpusOps.contaminatedIds(barred, b, idCol, textCol,
            config.decontamShingleSize),
          Seq(idCol), "left_anti"), obsDecontam)
    }

    val sampled =
      if (!samplingOn) decontamed
      else counted(CorpusOps.stratifiedSample(decontamed, idCol, "pred_lang",
        config.sampleRates, config.sampleDefaultRate).drop("strat_bucket"),
        obsSample)

    val rewritten =
      if (config.spanRewriteK <= 0) sampled
      else {
        // the rewrite consumes its input three times (span election,
        // token-array rebuild, and the outer column-preserving join)
        // — barrier it so exchange reuse keeps every upstream observe
        // single-counted per action
        val barred = Dedup.barrier(sampled, col(idCol))
        val newText = CorpusOps.spanDedupRewrite(barred, idCol, textCol,
            config.spanRewriteK)
          .select(col("doc_id").as(idCol), col("new_text"))
        barred.join(newText, Seq(idCol))
          .withColumn(textCol, col("new_text")).drop("new_text")
      }

    new Staged(rewritten, () => {
      // Main-stream observes always execute once the action runs —
      // empty-relation propagation stops at CollectMetrics, and an
      // empty input still reports n=0 — so a MISSING metrics map there
      // means the stage was never wired into the executed plan (a
      // detached Observation), which must fail loudly, not report 0.
      def n(obs: Observation): Long = obs.get.get("n") match {
        case Some(v) => v.asInstanceOf[Long]
        case None => throw new IllegalStateException(
          "curation observation produced no metrics: its stage never " +
            "executed in the materializing action (detached Observation?)")
      }
      // The one exception: an observe riding a join's SIDE branch is
      // dropped wholesale when the join rewrites away an empty side
      // (zero near-dup pairs -> the anti-join's right subtree, losers
      // included, is eliminated). The only value such a branch can
      // have contributed is 0.
      def nOrZero(obs: Observation): Long =
        obs.get.getOrElse("n", 0L).asInstanceOf[Long]
      val afterNearDup = n(obsNearDup)
      // every loser id occurs exactly once in exactDeduped (ids are
      // unique post-exact-dedup), so the anti-join removed |losers|.
      val afterExact = afterNearDup + nOrZero(obsLosers)
      val afterQuality = n(obsQuality)
      val afterRep = if (repetitionOn) n(obsRep) else afterQuality
      val afterLang = n(obsLang)
      val afterDupRange =
        if (config.maxDupRangeFrac > 0.0) n(obsDupRange) else afterNearDup
      val afterSemantic =
        if (embeddings.isDefined) n(obsSemantic) else afterDupRange
      val afterDecontam =
        if (bench.isDefined) n(obsDecontam) else afterSemantic
      val afterSample = if (samplingOn) n(obsSample) else afterDecontam
      Report(n(obsInput), afterQuality, afterRep, afterLang,
        afterExact, afterNearDup, afterDupRange, afterSemantic,
        afterDecontam, afterSample,
        if (config.redactPii) n(obsPii) else 0L)
    })
  }

  /** Run the full pipeline; returns (curated, report). One job: the
    * `count()` that materializes the result also populates every
    * stage counter.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      config: Config = Config(), bench: Option[DataFrame] = None,
      embeddings: Option[DataFrame] = None): (DataFrame, Report) = {
    val staged = curateStaged(docs, idCol, textCol, config, bench, embeddings)
    staged.curated.count()
    (staged.curated, staged.report())
  }
}
