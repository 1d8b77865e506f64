package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** End-to-end corpus curation: the composition a training-data
  * pipeline actually runs over a raw document pile — quality
  * filtering, language filtering, exact dedup, then near-dup removal
  * — as one declarative dataflow.
  *
  * Scale shape: stages 1–2 are map-only (codegen'd per-row scoring);
  * stage 3 shuffles a 32-byte content hash; stage 4 is MinHash+LSH
  * (map-only signatures + compact band-key shuffles). Nothing touches
  * the driver; every stage streams.
  *
  * The attrition report is SINGLE-PASS: stage counts are collected
  * with `observe`/CollectMetrics accumulators during the one action
  * that materializes the curated output — not with per-stage
  * `count()` jobs that would each re-execute the pipeline prefix
  * (at 100 TB that was ~4 redundant full corpus passes). Two
  * structural rules keep the accumulator counts exact:
  *
  *   - observed nodes in the shared prefix sit below `repartition`
  *     barriers; the dedup self-joins reference those barriers twice,
  *     and Spark's exchange reuse executes the identical shuffle
  *     subtree (and therefore each CollectMetrics) exactly once
  *     (CurationSpec asserts the counts against independent jobs);
  *   - `afterExact` is derived as `afterNearDup + |losers|` from the
  *     loser branch, which occurs exactly once in the final plan, so
  *     it cannot double-count regardless of plan reuse.
  */
object Curation {

  final case class Config(
      minTokens: Int = 10,
      minQuality: Double = 0.3,
      keepLangs: Set[String] = Set.empty, // empty = keep all
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
      maxHamming: Int = 3)

  final case class Report(
      input: Long, afterQuality: Long, afterLang: Long,
      afterExact: Long, afterNearDup: Long)

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
    * stage keeps the lowest id of each detected pair-cluster (greedy:
    * any doc that appears as the higher id of a qualifying pair is
    * dropped).
    */
  def curateStaged(docs: DataFrame, idCol: String, textCol: String,
      config: Config = Config()): Staged = {
    val obsInput = Observation()
    val obsQuality = Observation()
    val obsLang = Observation()
    val obsLosers = Observation()
    val obsFinal = Observation()
    def counted(df: DataFrame, obs: Observation): DataFrame =
      df.observe(obs, count(lit(1)).as("n"))

    val scored = annotate(counted(docs, obsInput), textCol)
    val qualityFiltered = counted(scored.filter(
      col("n_tokens") >= config.minTokens && col("quality") >= config.minQuality),
      obsQuality)

    val langFiltered = counted(
      if (config.keepLangs.isEmpty) qualityFiltered
      else qualityFiltered.filter(col("pred_lang").isin(config.keepLangs.toSeq: _*)),
      obsLang)

    // Barriers: the exact-dedup semi-join consumes its input twice and
    // the final anti-join consumes exactDeduped twice; repartition
    // exchanges make those subtrees reusable so each prefix (and each
    // observe in it) executes once per action.
    val prefixBarrier = Dedup.barrier(langFiltered, col(idCol))
    val exactDeduped = Dedup.barrier(
      Dedup.exact(prefixBarrier, idCol, textCol), col(idCol))

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
    val losers = counted(
      nearDupPairs.select(col("id_b").as(idCol)).distinct(), obsLosers)
    val curated = counted(
      exactDeduped.join(losers, Seq(idCol), "left_anti"), obsFinal)

    new Staged(curated, () => {
      def n(obs: Observation): Long = obs.get("n").asInstanceOf[Long]
      val afterNearDup = n(obsFinal)
      // every loser id occurs exactly once in exactDeduped (ids are
      // unique post-exact-dedup), so the anti-join removed |losers|.
      Report(n(obsInput), n(obsQuality), n(obsLang),
        afterNearDup + n(obsLosers), afterNearDup)
    })
  }

  /** Run the full pipeline; returns (curated, report). One job: the
    * `count()` that materializes the result also populates every
    * stage counter.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      config: Config = Config()): (DataFrame, Report) = {
    val staged = curateStaged(docs, idCol, textCol, config)
    staged.curated.count()
    (staged.curated, staged.report())
  }
}
