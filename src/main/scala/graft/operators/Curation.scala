package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Quality + language annotation columns (reusable standalone). */
  def annotate(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("n_tokens", TextFunctions.nTokens(col(textCol)))
      .withColumn("quality", TextFunctions.qualityScore(col(textCol)))
      .withColumn("pred_lang", TextFunctions.langId(col(textCol)))

  /** Run the full pipeline; returns (curated, report). The near-dup
    * stage keeps the lowest id of each detected pair-cluster
    * (greedy: any doc that appears as the higher id of a qualifying
    * pair is dropped).
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      config: Config = Config()): (DataFrame, Report) = {
    val input = docs.count()

    val scored = annotate(docs, textCol)
    val qualityFiltered = scored.filter(
      col("n_tokens") >= config.minTokens && col("quality") >= config.minQuality)
    val afterQuality = qualityFiltered.count()

    val langFiltered =
      if (config.keepLangs.isEmpty) qualityFiltered
      else qualityFiltered.filter(col("pred_lang").isin(config.keepLangs.toSeq: _*))
    val afterLang = langFiltered.count()

    val exactDeduped = Dedup.exact(langFiltered, idCol, textCol)
    val afterExact = exactDeduped.count()

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
    val losers = nearDupPairs.select(col("id_b").as(idCol)).distinct()
    val curated = exactDeduped.join(losers, Seq(idCol), "left_anti")
    val afterNearDup = curated.count()

    (curated, Report(input, afterQuality, afterLang, afterExact, afterNearDup))
  }
}
