package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{GraftFunctions, TextFunctions}
import graft.operators.{CorpusOps, Dedup, Multimodal, Similarity, TimeJoins}

/** Training-data pipeline queries over the `documents` / `embeddings`
  * / `events` fixtures: dedup, similarity search, text analysis,
  * multimodal plumbing. These are first-class operators of the engine
  * (builder brief), each wired to a DuckDB oracle — INCLUDING the
  * hash-based ops (MinHash, SimHash, LSH buckets): every hash in
  * those pipelines is BIGINT-safe by construction, so the oracle
  * replays signatures, band keys and buckets verbatim in DuckDB SQL
  * and gates candidate generation end-to-end, not just the verify
  * step (see graft.functions.HashExpressions).
  */
object TrainingData {

  /** Text stats + composite quality score per document. */
  def docTextStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextFunctions.nTokens(col("text")).as("n_tokens"),
      TextFunctions.dictHits(col("text"), TextFunctions.Stopwords).as("stopword_hits"),
      TextFunctions.punctCount(col("text")).as("punct_count"),
      TextFunctions.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** Token counting both ways: whitespace words and BPE-style
    * pre-tokenizer segments (contractions / letter runs / digit runs
    * / punctuation runs) — the two denominators a training-data
    * pipeline budgets with. The RE2-compatible pattern runs verbatim
    * in the DuckDB oracle.
    */
  def docTokenCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextFunctions.nTokens(col("text")).as("n_words"),
      TextFunctions.nBpeTokens(col("text")).as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Real merges-table BPE token count per document (custom codegen'd
    * expression [[graft.functions.BpeTokenCount]]): the standard BPE
    * inference loop over the embedded [[graft.functions.Bpe.Merges]]
    * table, i.e. the token number a training pipeline actually
    * budgets with. The oracle replays the ENTIRE merge loop in DuckDB
    * (recursive CTE, one rank per step applied to fixpoint via
    * separator-delimited string replace — equivalence argument in the
    * [[graft.functions.Bpe]] Scaladoc), so the gate checks the
    * tokenizer itself, not a proxy count.
    */
  def docBpeReal(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      GraftFunctions.bpeTokenCount("text").as("n_bpe_real"))
      .orderBy("doc_id")
  }

  /** Language-ID heuristic per document. */
  def docLangId(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      TextFunctions.langId(col("text")).as("pred_lang"))
      .orderBy("doc_id")

  /** Polynomial rolling-hash fingerprint per document (custom
    * Catalyst expression [[graft.functions.PolyHash]]).
    */
  def docFingerprint(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(spark)
    Tables.documents(spark, dir).select(
      col("doc_id"),
      GraftFunctions.polyHash("text").as("fingerprint"))
      .orderBy("doc_id")
  }

  /** Exact dedup survivors (min doc_id per identical text). */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exact(Tables.documents(spark, dir), "doc_id", "text")
      .select("doc_id", "lang", "source", "n_chars")
      .orderBy("doc_id")

  /** Word-trigram Jaccard near-dup pairs (inverted-index join). */
  def dedupJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(spark, dir), "doc_id", "text",
        n = 3, threshold = 0.05, maxDocFreq = 100000)
      .orderBy("id_a", "id_b")

  /** MinHash+LSH near-dup pairs, verified by exact shingle-set
    * Jaccard. The DuckDB oracle replays the ENTIRE pipeline —
    * PolyHash shingles, signature permutations, band keys, candidate
    * join, Jaccard verify — in BIGINT-safe SQL, so the gate is exact
    * and fixture-independent (see minhashOracleSql).
    */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(Tables.documents(spark, dir), "doc_id", "text",
        n = 3, numPerms = 64, bands = 16, threshold = 0.5,
        candOpt = Some(sharedLshCandidates(spark, dir)))
      .select("id_a", "id_b", "jaccard")
      .orderBy("id_a", "id_b")

  /** SimHash near-dup pairs, verified by exact shingle-set Jaccard.
    * Banding guarantees every pair within 3 fingerprint bits is
    * surfaced (4 bands × 16 bits — the classic web-scale k, chosen
    * because correlated fingerprints make narrower chunks collide
    * quadratically), and the DuckDB oracle recomputes the identical
    * PolyHash+Spread64 fingerprints, so the gate checks the exact
    * contract — Jaccard >= 0.5 AND Hamming <= 3 — independent of the
    * fixture (see simhashOracleSql).
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashNearDups(Tables.documents(spark, dir), "doc_id", "text",
        n = 3, maxHamming = 3, threshold = 0.5)
      .orderBy("id_a", "id_b")

  /** Exact brute-force cosine top-3 neighbors per embedding. */
  def annBruteTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(Tables.embeddings(spark, dir), "vec_id", "embedding", 3)
      .orderBy("vec_id", "rank")

  /** LSH-bucketed approximate top-3. The bucket function (Rademacher
    * sign-random-projection, [[graft.functions.LshBucket]]) is pure
    * integer+sequential-fold arithmetic, so the DuckDB oracle
    * recomputes the IDENTICAL buckets in SQL and gates this operator
    * exactly — recall vs brute force is asserted in ScalaTest.
    */
  def annLshTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshTopKAuto(Tables.embeddings(spark, dir), "vec_id", "embedding",
        k = 3)
      .orderBy("vec_id", "rank")

  /** IVF approximate top-3: deterministic sampled coarse quantizer,
    * broadcast assignment, probe-limited inverted-list search
    * ([[Similarity.ivfTopKAuto]]), index sized from the data
    * (nlist = max(16, floor(sqrt(n))) — the O(n^1.5) sizing).
    * Centroid choice, sizing, assignment and probe ranking are all
    * oracle-expressible, so the DuckDB gate replays the ENTIRE index
    * build + search — recall vs brute force is asserted in ScalaTest.
    */
  /** One trained coarse-centroid relation per (session, corpus
    * snapshot, nlist), shared by every semantic-family query that
    * clusters that corpus — t16/t40/t41/t59/t63 over the full
    * embedding table, t43 over its 4/5 index split. The training is
    * deterministic (Lloyd from smallest-id seeds, integer-sum
    * arithmetic), so sharing changes nothing the oracle can see; it
    * only stops each query from re-running [[Similarity.LloydIters]]
    * full-corpus passes for the identical nlist-row result. Keyed by
    * applicationId so a fresh session (whose localCheckpoint blocks
    * are gone) retrains rather than reading dead blocks.
    */
  /** Compute-once memo cell: `putIfAbsent` races resolve to ONE
    * winning cell whose `lazy val` then runs the thunk exactly once
    * (under the lazy-val monitor) — `TrieMap.getOrElseUpdate` is not
    * atomic, so concurrent first callers could otherwise train
    * centroids or build a whole persisted index twice, leaking the
    * losing build's work (and, for indexes, its temp directory).
    */
  private final class Memo[V](thunk: => V) { lazy val value: V = thunk }

  private def memoized[K, V](
      cache: scala.collection.concurrent.TrieMap[K, Memo[V]], key: K)(
      thunk: => V): V = {
    val fresh = new Memo[V](thunk)
    cache.putIfAbsent(key, fresh).getOrElse(fresh).value
  }

  private val centroidCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, Int), Memo[DataFrame]]

  private def sharedCentroids(spark: SparkSession, corpusKey: String,
      emb: => DataFrame, minNlist: Int): DataFrame =
    memoized(centroidCache,
      (spark.sparkContext.applicationId, corpusKey, minNlist)) {
      Similarity.trainCentroids(emb, "vec_id", "embedding", minNlist)
    }

  private def fullCorpusCentroids(spark: SparkSession, dir: String,
      minNlist: Int = 16): DataFrame =
    sharedCentroids(spark, s"$dir/embeddings", Tables.embeddings(spark, dir),
      minNlist)

  private val lshCandCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), Memo[Dedup.LshCandidates]]

  /** One materialized MinHash-LSH front end (shingle sets + band-
    * collision candidate pairs, [[Dedup.lshCandidates]]) per (session,
    * corpus snapshot) at the family's shared parameters (n = 3,
    * 64 perms, 16 bands) — reused by every near-dup-family consumer:
    * t06 pairs, t90 contrastive mining, t100 edit-distance tier,
    * t101 containment, and the t24/t42/t78/t81/t85/t110 component
    * closure via [[sharedComponents]]. The front end is threshold-
    * independent (each consumer verifies at its own cutoff) and
    * deterministic, so sharing is oracle-invisible; it replaces one
    * full tokenize→MinHash→band corpus scan PER OPERATOR with one per
    * session. Keyed by applicationId so a fresh session (whose
    * localCheckpoint blocks are gone) rebuilds rather than reading
    * dead blocks.
    */
  private def sharedLshCandidates(spark: SparkSession,
      dir: String): Dedup.LshCandidates =
    memoized(lshCandCache,
      (spark.sparkContext.applicationId, s"$dir/documents")) {
      Dedup.lshCandidates(Tables.documents(spark, dir), "doc_id", "text",
        n = 3, numPerms = 64, bands = 16)
    }

  private val componentCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), Memo[DataFrame]]

  /** One banded-MinHash connected-component relation (node, comp)
    * per (session, corpus snapshot) at the shared t06/t24 parameters
    * (n = 3, 64 perms, 16 bands, threshold 0.5) — reused by every
    * dedup-cluster consumer over that corpus (t24 clusters, t42
    * canonical, t78 splits, t81 fractions, t85 weights). The same
    * argument as [[sharedCentroids]]: pair generation and the
    * component fixed point are DETERMINISTIC, so sharing changes
    * nothing any oracle can see — it only stops five queries from
    * re-running the identical pair+closure computation. Keyed by
    * applicationId so a fresh session (whose localCheckpoint blocks
    * are gone) recomputes rather than reading dead blocks.
    */
  private def sharedComponents(spark: SparkSession, dir: String): DataFrame =
    memoized(componentCache,
      (spark.sparkContext.applicationId, s"$dir/documents")) {
      val pairs = Dedup.minhashLsh(Tables.documents(spark, dir), "doc_id",
        "text", n = 3, numPerms = 64, bands = 16, threshold = 0.5,
        candOpt = Some(sharedLshCandidates(spark, dir)))
        .select("id_a", "id_b")
      Dedup.connectedComponents(pairs, "id_a", "id_b")
    }

  private val canonicalCache =
    scala.collection.concurrent.TrieMap.empty[(String, String), Memo[DataFrame]]

  /** One canonical-election relation (clustered docs + their
    * per-cluster argmax flag, [[CorpusOps.canonicalSelect]] at the
    * family parameters) per (session, corpus snapshot) — shared by
    * t42 and the survivorship audit (t121). Deterministic election,
    * duplicate-set-sized pin; the same sharing argument as
    * [[sharedComponents]], one tier up.
    */
  private def sharedCanonical(spark: SparkSession, dir: String): DataFrame =
    memoized(canonicalCache,
      (spark.sparkContext.applicationId, s"$dir/documents")) {
      CorpusOps.canonicalSelect(Tables.documents(spark, dir), "doc_id",
        "text", n = 3, numPerms = 64, bands = 16, threshold = 0.5,
        compOpt = Some(sharedComponents(spark, dir))).localCheckpoint()
    }

  def annIvfTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfTopKAuto(Tables.embeddings(spark, dir), "vec_id", "embedding",
        k = 3, minNlist = 16, nprobe = 2,
        centroidsOpt = Some(fullCorpusCentroids(spark, dir)))
      .orderBy("vec_id", "rank")

  /** Embedding near-duplicate pairs (cosine >= 0.5). */
  def embNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(Tables.embeddings(spark, dir), "vec_id", "embedding", 0.5)
      .orderBy("id_a", "id_b")

  /** Embedding near-dups via LSH bucketing — the 100 TB default (the
    * all-pairs t10 is the exactness baseline). The DuckDB oracle
    * replays the Rademacher buckets in SQL, so the gate checks the
    * bucketed contract exactly: cosine >= 0.5 AND same bucket.
    */
  def embNearDupLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshNearDupPairsAuto(Tables.embeddings(spark, dir), "vec_id",
        "embedding", threshold = 0.3)
      .orderBy("id_a", "id_b")

  /** Multimodal payload plumbing: binary column + metadata + fake
    * decode, projected to oracle-expressible fields.
    */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val features = Multimodal.extractFeatures(
      Multimodal.withPayload(docs, "doc_id", "text"), "doc_id")
    features.select(
      col("doc_id"), col("media_type"), col("n_bytes"),
      col("width").cast("long").as("width"),
      col("height").cast("long").as("height"))
      .orderBy("doc_id")
  }

  /** Gopher-style repetition metrics per document: duplicate-word
    * fraction and modal unigram/bigram mass ([[CorpusOps.repetitionMetrics]]).
    */
  def docRepetition(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.repetitionMetrics(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Sensitive terms redacted in the PII scan fixture query — chosen
    * to occur in the fixture vocabulary so the dictionary path is
    * exercised non-vacuously (the email/IP/phone patterns are the
    * real-corpus payload and are covered by synthetic-data ScalaTest).
    */
  val PiiTerms: Seq[String] = Seq("customer", "spark", "key")

  /** PII scan + redaction per document ([[CorpusOps.piiScan]]). */
  def docPiiRedact(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.piiScan(Tables.documents(spark, dir), "doc_id", "text", PiiTerms)
      .orderBy("doc_id")

  /** Shingle size for benchmark decontamination: 4-grams give a
    * non-degenerate contaminated/clean split on the fixture while the
    * operator itself is n-agnostic.
    */
  val DecontamN = 4

  /** Benchmark decontamination: every 10th document is the held-out
    * eval set; training docs sharing any word 4-gram with it are
    * flagged ([[CorpusOps.decontaminate]]).
    */
  def docDecontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    CorpusOps.decontaminate(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", DecontamN)
      .orderBy("doc_id")
  }

  /** Bloom-filter decontamination ([[CorpusOps.bloomDecontaminate]]):
    * the same benchmark split as t19 (every 10th doc), but membership
    * tested against a 2²⁰-bit Bloom filter of the benchmark shingles
    * instead of the exact broadcast set — the constant-memory scale
    * path. `exact_hit` rides along, so the oracle pins the
    * no-false-negative invariant AND the exact deterministic
    * false-positive pattern of the hash geometry.
    */
  def docBloomDecontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    CorpusOps.bloomDecontaminate(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", DecontamN)
      .orderBy("doc_id")
  }

  /** Per-language sampling rates (percent): downsample the dominant
    * language, keep the rare ones whole — the standard corpus-mix
    * rebalance.
    */
  val SampleRates: Map[String, Int] = Map("en" -> 40, "de" -> 70, "es" -> 70)

  /** Deterministic stratified sample over the documents table
    * ([[CorpusOps.stratifiedSample]]).
    */
  def docSampleStratified(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.stratifiedSample(Tables.documents(spark, dir), "doc_id", "lang",
        SampleRates)
      .select("doc_id", "lang", "strat_bucket")
      .orderBy("doc_id")

  /** Sequence packing: concat-then-chunk into 512-token training
    * sequences over 8 deterministic shards ([[CorpusOps.packSequences]]).
    */
  def docSeqPack(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.packSequences(Tables.documents(spark, dir), "doc_id", "text",
        budget = 512, shards = 8)
      .orderBy("doc_id")

  /** Corpus-wide top-50 word bigrams — vocabulary construction /
    * corpus profiling ([[CorpusOps.topNgrams]]): word-count shuffle
    * with map-side partial aggregation, then a per-partition-heap
    * global top-k, ties broken (count desc, gram asc) so both engines
    * pick the same boundary rows.
    */
  def docVocabNgrams(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.topNgrams(Tables.documents(spark, dir), "text", n = 2, k = 50)

  /** Overlapping token-window chunking (64-token windows every 48
    * tokens, [[CorpusOps.chunkDocs]]) — map-only, no shuffle.
    */
  def docChunking(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.chunkDocs(Tables.documents(spark, dir), "doc_id", "text",
        chunk = 64, stride = 48)
      .orderBy("doc_id", "chunk_no")

  /** Near-duplicate CLUSTERS: MinHash+LSH pair edges (t06's exact
    * pipeline) resolved into connected components
    * ([[Dedup.connectedComponents]]) — each clustered doc labeled
    * with its cluster's min doc_id, the canonical-survivor form of
    * dedup. The oracle replays the full MinHash pipeline AND the
    * component fixed point (recursive CTE).
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame =
    sharedComponents(spark, dir)
      .select(col("node").as("doc_id"), col("comp").as("cluster_id"))
      .orderBy("doc_id")

  /** KMV distinct-count sketch of the corpus word-trigram vocabulary
    * ([[CorpusOps.kmvDistinctSketch]], n = 3, k = 200; ~16k distinct
    * trigrams at the oracle SFs so the estimate path, not the
    * below-k exact path, is exercised): the bottom-k hash set, the
    * resulting estimate, and the exact distinct count — all
    * deterministic BIGINT arithmetic the oracle replays bit-for-bit.
    */
  def docKmvSketch(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.kmvDistinctSketch(Tables.documents(spark, dir), "text", n = 3, k = 200)

  /** Duplicated-span attrition at 8-token granularity
    * ([[CorpusOps.spanDupStats]]). The oracle rebuilds the spans with
    * the t23 chunking SQL and counts duplicates on the span TEXT;
    * Spark shuffles a 64-bit FNV fingerprint instead — a collision
    * would hash-mismatch the gate, so the compression is itself
    * under test.
    */
  def docSpanDedup(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.spanDupStats(Tables.documents(spark, dir), "doc_id", "text", k = 8)
      .orderBy("doc_id")

  /** Span-level exact dedup REWRITE at 8-token granularity
    * ([[CorpusOps.spanDedupRewrite]]): every duplicated span keeps
    * only its canonical (smallest doc_id, idx) occurrence and each
    * document is reassembled from its surviving spans. The oracle
    * re-runs the whole election and reassembly on span TEXT
    * (string_agg in span order); Spark elects on 64-bit FNV
    * fingerprints and rebuilds from the doc's own token array — the
    * fingerprint compression and the rebuild arithmetic are both
    * under the hash gate.
    */
  def docSpanRewrite(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.spanDedupRewrite(Tables.documents(spark, dir), "doc_id", "text", k = 8)
      .orderBy("doc_id")

  /** Deterministic 64-bucket integer weight table for the t45
    * classifier fixture: w(i) = ((i·2654435761 + 7) mod 11) − 5 —
    * pseudo-random in [−5, 5], mean ≈ 0 so document scores straddle
    * the keep threshold and both verdicts occur at every SF. The
    * identical list is interpolated into the oracle SQL.
    */
  private[graft] val ClassifierWeights: Seq[Long] =
    (0 until 64).map(i => ((i.toLong * 2654435761L + 7L) % 11L) - 5L)

  /** Hashed-feature linear classifier inference
    * ([[CorpusOps.hashedLinearScore]], F = 64, bias 0, threshold 0):
    * exact integer hashed-bag-of-words scoring. The oracle replays
    * token PolyHash, the mod-F bucket lookup against the interpolated
    * weight list, and the integer sum — candidate arithmetic, not a
    * fixture coincidence.
    */
  def docClassifierScore(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.hashedLinearScore(Tables.documents(spark, dir), "doc_id", "text",
        ClassifierWeights, bias = 0L, threshold = 0L)
      .orderBy("doc_id")

  /** In-engine classifier training ([[CorpusOps.perceptronTrain]],
    * F = 64, 3 rounds): a batch perceptron over hashed bag-of-words
    * counts, labeled by the `lang` column — the weights feed
    * [[CorpusOps.hashedLinearScore]] (t45) directly. The oracle
    * unrolls all three training rounds weight-for-weight in BIGINT
    * SQL, so the gate checks the full optimization trajectory, not
    * just a final artifact. (The fixture corpus is driver-synthetic
    * with one shared vocabulary across langs, so the label here
    * exercises the MACHINERY — the separability/convergence behavior
    * is pinned by the spec's disjoint-support corpus instead.)
    */
  def docPerceptronTrain(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.perceptronTrain(Tables.documents(spark, dir), "doc_id", "text",
        positive = col("lang") === "en", f = 64, rounds = 3)
      .orderBy("bucket")

  /** DSIR-style hashed importance reweighting
    * ([[CorpusOps.importanceReweight]], 1024 buckets, scale 2^20):
    * target = the first three sources (the same "curated slice" the
    * mixture fixtures use). The oracle replays bigram construction,
    * per-gram PolyHash bucketing, the add-1-smoothed integer bucket
    * weights, per-doc mass sums, and the corpus-mean keep verdict —
    * every step BIGINT, so the gate checks the full estimator, not a
    * fixture coincidence.
    */
  def docImportanceWeight(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.importanceReweight(Tables.documents(spark, dir), "doc_id", "text",
        col("source").isin("src0", "src1", "src2"))
      .orderBy("doc_id")

  /** 50/30/20 mixture weights over the first three sources — chosen
    * so the three keep-rate regimes all occur at the fixture's 25
    * docs/source: src0 saturates (rate 1.2 → clamp to keep-all),
    * src1/src2 genuinely down-sample (0.72 / 0.48), and the other 17
    * sources drop entirely (weight 0).
    */
  private val MixWeights: Map[String, Double] =
    Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2)

  /** Deterministic mixture sampling ([[CorpusOps.mixtureSample]]):
    * re-weight the corpus to [[MixWeights]] within a 60-doc budget.
    */
  def docMixSample(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.mixtureSample(Tables.documents(spark, dir), "doc_id", "source",
        MixWeights, totalTarget = 60L)
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy("doc_id")

  /** Token-budget mixture sampling ([[CorpusOps.tokenBudgetSample]]):
    * src0's budget keeps (nearly) everything, src1 truncates mid-
    * stream, src2 keeps only the head of its order, every other
    * source drops — all four regimes live at the fixture sizes. The
    * oracle replays the shard-major order arithmetic verbatim (all
    * BIGINT: token counts, id-hash, shard prefix sums).
    */
  def docTokenBudget(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.tokenBudgetSample(Tables.documents(spark, dir), "doc_id", "text",
        "source", Map("src0" -> 100000L, "src1" -> 500L, "src2" -> 40L),
        shards = 8)
      .orderBy("doc_id")

  /** SemDeDup semantic near-dup pruning ([[Similarity.semDedup]]):
    * every vector with its cluster and keep/drop verdict. The oracle
    * replays the adaptive nlist ladder, the rank-1 assignment, and
    * the within-cluster greedy-by-id drop rule; cosines use the
    * shared sequential-fold arithmetic so the 0.3 threshold compares
    * bit-identical values on both engines.
    */
  def docSemDedup(spark: SparkSession, dir: String): DataFrame =
    Similarity.semDedup(Tables.embeddings(spark, dir), "vec_id", "embedding",
        minNlist = 16, threshold = 0.3,
        centroidsOpt = Some(fullCorpusCentroids(spark, dir)))
      .orderBy("vec_id")

  /** Prototype-based diversity pruning ([[Similarity.prototypeSample]]):
    * per-cluster hardness rank and keep-half verdict. The oracle
    * replays the assignment and the (cs asc, id asc) rank; keepFrac
    * 0.5 keeps the ceil arithmetic exactly representable.
    */
  def docProtoSample(spark: SparkSession, dir: String): DataFrame =
    Similarity.prototypeSample(Tables.embeddings(spark, dir), "vec_id",
        "embedding", minNlist = 16, keepFrac = 0.5,
        centroidsOpt = Some(fullCorpusCentroids(spark, dir)))
      .orderBy("vec_id")

  /** Canonical selection for MinHash clusters
    * ([[CorpusOps.canonicalSelect]]): the oracle composes the t24
    * recursive-CTE component replay with the t37 integer quality
    * score and elects per-cluster argmax (score desc, doc_id asc).
    */
  def docCanonical(spark: SparkSession, dir: String): DataFrame =
    sharedCanonical(spark, dir).orderBy("doc_id")

  /** Incremental semantic dedup
    * ([[Similarity.incrementalSemDedup]]): the last fifth of the
    * embedding table arrives as the new batch against the first four
    * fifths as the index — the same 4/5 split convention as t38. The
    * oracle replays index-learned centroids, both assignments, and
    * the min-id match election.
    */
  def docIncrementalSemDedup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val split = emb.count() * 4 / 5
    // index-learned centroids (the 4/5 split is its own corpus
    // snapshot — a frozen index quantizer is trained once and reused
    // across every batch disposed against it)
    val c = sharedCentroids(spark, s"$dir/embeddings<$split",
      emb.filter(col("vec_id") < split), minNlist = 16)
    Similarity.incrementalSemDedup(
        emb.filter(col("vec_id") < split),
        emb.filter(col("vec_id") >= split),
        "vec_id", "embedding", minNlist = 16, threshold = 0.3,
        centroidsOpt = Some(c))
      .orderBy("batch_id")
  }

  /** Per-doc top-3 TF-IDF terms ([[CorpusOps.tfidfTopTerms]]) —
    * linear-IDF scoring keeps the arithmetic to two IEEE ops on exact
    * integers, so the oracle replays scores AND ranking bit-for-bit.
    */
  def docTfidf(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.tfidfTopTerms(Tables.documents(spark, dir), "doc_id", "text", k = 3)
      .orderBy("doc_id", "rank")

  /** Unigram-LM mean-probability fluency score
    * ([[CorpusOps.unigramMeanProb]]) — integer-sum numerator, one
    * final division, oracle bit-exact.
    */
  def docUnigramQuality(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.unigramMeanProb(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** The t30 retrieval query set — three lexical queries over the
    * fixture vocabulary, exercising single- and multi-term matches.
    */
  private val Bm25Queries: Seq[(Long, String)] = Seq(
    1L -> "spark window join",
    2L -> "hash merge batch",
    3L -> "slow scan filter table")

  /** BM25 top-10 per query ([[CorpusOps.bm25TopK]], k1=1.2, b=0.75)
    * with linear idf and scaled-long partial sums so the oracle
    * replays scores and ranking exactly.
    */
  def docBm25(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.bm25TopK(Tables.documents(spark, dir), "doc_id", "text",
        Bm25Queries, k1 = 1.2, b = 0.75, k = 10)
      .orderBy("query_id", "rank")

  /** Persisted inverted-index lifecycle under the oracle gate
    * ([[CorpusOps.buildInvertedIndex]] →
    * [[CorpusOps.searchInvertedIndex]]): build the term-bucketed
    * postings once into a scratch directory, then answer t30's exact
    * retrieval from the stored relations — the search reads ONLY the
    * query terms' buckets (static partition pruning; PlanShapeSpec
    * pins the scan filter) and tokenizes nothing. Identical
    * arithmetic to the one-shot scorer (shared ranking stage), so
    * the t30 oracle replays it bit-for-bit.
    */
  def docBm25Index(spark: SparkSession, dir: String): DataFrame = {
    val path = sessionIndexPath(spark, "t66_invidx", dir) { p =>
      CorpusOps.buildInvertedIndex(Tables.documents(spark, dir), "doc_id",
        "text", p)
    }
    CorpusOps.searchInvertedIndex(spark, path, Bm25Queries,
        k1 = 1.2, b = 0.75, k = 10)
      .orderBy("query_id", "rank")
  }

  /** Deterministic 10/10/80 val/test/train split + shuffle key
    * ([[CorpusOps.assignSplits]]).
    */
  def docSplits(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.assignSplits(Tables.documents(spark, dir), "doc_id",
        valPct = 10, testPct = 10)
      .orderBy("doc_id")

  /** PQ encoding ([[Similarity.pqEncode]], m=4, ksub=16): each
    * embedding compressed to 4 centroid codes + quantization error.
    */
  def annPqEncode(spark: SparkSession, dir: String): DataFrame =
    Similarity.pqEncode(Tables.embeddings(spark, dir), "vec_id", "embedding",
        m = 8, ksub = 64)
      // Gate wiring only: serialize the code array because the driver's
      // comparator row-sorts by every column and pandas cannot sort
      // array cells. pqEncode itself keeps the array codes.
      .select(col("vec_id"),
        concat_ws(",", col("codes").cast("array<string>")).as("codes"),
        col("quant_err"))
      .orderBy("vec_id")

  /** The t33 ADC query ids — three vectors spread across the id
    * space; ADC reads only CODES for the scan side.
    */
  private val PqQueryIds: Seq[Long] = Seq(0L, 7L, 42L)

  /** PQ asymmetric-distance top-5 ([[Similarity.pqAdcTopK]]). */
  def annPqAdc(spark: SparkSession, dir: String): DataFrame =
    Similarity.pqAdcTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
        PqQueryIds, k = 5, m = 8, ksub = 64)
      .orderBy("query_id", "rank")

  /** IVF-PQ search ([[Similarity.ivfPqTopK]]): the t16 coarse
    * quantizer composed with the t33 code scan — probe 2 of the
    * Lloyd-trained cells, ADC-score only the probed lists' codes.
    * The oracle replays the entire composition: centroid training,
    * cell routing, probe choice, LUT, ranking.
    */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame =
    Similarity.ivfPqTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
        PqQueryIds, k = 5, minNlist = 16, nprobe = 2, m = 8, ksub = 64,
        centroidsOpt = Some(fullCorpusCentroids(spark, dir)))
      .orderBy("query_id", "rank")

  /** Persisted IVF-PQ lifecycle under the oracle gate
    * ([[Similarity.buildIvfPqIndex]] → [[Similarity.searchIvfPqIndex]]):
    * build the cell-partitioned index once into a scratch directory,
    * then answer t59's exact query from the stored relations — the
    * search reads ONLY the probed cells' code files (dynamic
    * partition pruning; PlanShapeSpec pins the scan filter) and runs
    * zero training or encoding. Identical arithmetic to the one-shot
    * operator, so the t59 oracle replays it bit-for-bit.
    */
  /** One persisted index build per (session, kind, corpus snapshot) —
    * the "build once, search many" amortization the index lifecycles
    * advertise, actually realized by their gate queries: repeated
    * invocations (bench sweeps, verify reruns) search the
    * already-built scratch index instead of rebuilding into a fresh
    * temp directory each time (which also leaked one full index copy
    * per call). Keyed by applicationId so a new session rebuilds.
    */
  private val indexPathCache =
    scala.collection.concurrent.TrieMap.empty[(String, String, String), Memo[String]]

  /** Scratch-index directories created this JVM, reaped on exit — a
    * session's worth of bench/verify sweeps otherwise leaves one full
    * index copy per (kind, corpus) on disk forever.
    */
  private val tempIndexDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val tempDirReaper: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      tempIndexDirs.forEach { root =>
        try {
          val s = java.nio.file.Files.walk(root)
          try s.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
          finally s.close()
        } catch { case _: java.io.IOException => () }
      }
    }))

  private def sessionIndexPath(spark: SparkSession, kind: String,
      dir: String)(build: String => Unit): String =
    memoized(indexPathCache,
      (spark.sparkContext.applicationId, kind, dir)) {
      tempDirReaper
      val root = java.nio.file.Files.createTempDirectory(s"graft_$kind")
      tempIndexDirs.add(root)
      val p = root.resolve("index").toString
      build(p)
      p
    }

  def annIvfPqPersisted(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val path = sessionIndexPath(spark, "t63_ivfpq", dir) { p =>
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", p,
        minNlist = 16, m = 8, ksub = 64,
        centroidsOpt = Some(fullCorpusCentroids(spark, dir)))
    }
    Similarity.searchIvfPqIndex(spark, path,
        emb.filter(col("vec_id").isin(PqQueryIds: _*)), "vec_id", "embedding",
        k = 5, nprobe = 2)
      .orderBy("query_id", "rank")
  }

  /** Int8 scalar quantization ([[Similarity.sqEncode]]): every
    * embedding as (symmetric scale, int8 code array, reconstruction
    * error). Codes are stringified for the gate only (driver
    * comparator row-sorts and cannot sort array cells, same as t32).
    */
  def annSqEncode(spark: SparkSession, dir: String): DataFrame =
    Similarity.sqEncode(Tables.embeddings(spark, dir), "vec_id", "embedding")
      .select(col("vec_id"), col("maxabs"),
        concat_ws(",", col("codes").cast("array<string>")).as("codes"),
        col("recon_err"))
      .orderBy("vec_id")

  /** SQ asymmetric top-5 ([[Similarity.sqTopK]]) over the same query
    * ids the PQ tier uses — the scan side reads only int8 codes.
    */
  def annSqTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.sqTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
        PqQueryIds, k = 5)
      .orderBy("query_id", "rank")

  /** BPE tokenizer TRAINING under the oracle gate
    * ([[CorpusOps.learnBpeMerges]], first 3 merges): the oracle
    * unrolls three full rounds — pair counting over the character
    * vocabulary, the (count desc, pair asc) argmax, and the greedy
    * left-to-right merge application via the same `list_reduce`
    * fold [[graft.functions.Bpe.oracleSql]] uses — so the gate
    * checks the training loop itself, not a fixture coincidence. The
    * distributed trainer's rounds 4..48 are covered by the
    * shipped-table reproduction + randomized differential tests.
    */
  def docBpeTrain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    CorpusOps.learnBpeMerges(Tables.documents(spark, dir), "text", numMerges = 3)
      .toDF("rank", "lhs", "rhs", "pair_count")
      .select(col("rank").cast("long"), col("lhs"), col("rhs"), col("pair_count"))
      .orderBy("rank")
  }

  /** JSON extraction over the events table. */
  def eventsJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"))
      .withColumn("avg_k", col("sum_k").cast("double") / col("n_events").cast("double"))
      .orderBy("event_type")

  /** Real-codec audio decode under the gate: each document's text
    * bytes become a canonical 8-bit-PCM WAV ([[Multimodal.buildWav]]),
    * decoded back through the REAL `javax.sound.sampled` reader path
    * ([[Multimodal.extractAudioFeatures]]). The oracle predicts every
    * integer column from the text alone — sample count, duration,
    * and the exact (s-128)² PCM energy — so a header mis-parse, a
    * sample miscount, or a dropped PCM byte breaks the hash. Build +
    * decode are partition-local: the whole query is map-only, scale
    * cost is one streaming pass over the corpus bytes.
    */
  def docAudioDecode(spark: SparkSession, dir: String): DataFrame = {
    // the codec is byte-oriented, the oracle SQL char-oriented: gate
    // only single-byte (ASCII) docs so both sides index identically —
    // a no-op on the fixture corpus, robustness against a future
    // non-ASCII regen (the operator itself decodes any payload)
    val docs = Tables.documents(spark, dir)
      .filter(octet_length(col("text")) === length(col("text")))
    Multimodal.extractAudioFeatures(
      Multimodal.withWavPayload(docs, "doc_id", "text"), "doc_id")
      .select(col("doc_id"),
        col("sample_rate").cast("long").as("sample_rate"),
        col("channels").cast("long").as("channels"),
        col("bits").cast("long").as("bits"),
        col("n_frames"), col("duration_ms"), col("energy"), col("decoded"))
      .orderBy("doc_id")
  }

  /** Real container demux under the gate: each document's text bytes
    * become a structurally valid single-track MP4 (48-byte samples,
    * [[Multimodal.withMp4Payload]]); [[Multimodal.sampleFrames]] then
    * demuxes the stsz/stsc/stco sample table ([[Mp4.demux]]) and
    * keeps every 2nd access unit. The oracle predicts kept-frame
    * counts, kept bytes, and the sum of each kept frame's FIRST byte
    * — the last is an exact check that every demuxed offset landed on
    * the right mdat position. `n_fake` pins provenance: 0 means no
    * row fell back to the chunker. Map-only until the per-document
    * count aggregation (a doc_id-keyed partial agg).
    */
  def docMp4Frames(spark: SparkSession, dir: String): DataFrame = {
    // same single-byte gate as t35: the 48-byte sample grid and the
    // oracle's 48-char substr positions only agree on ASCII text
    val docs = Tables.documents(spark, dir).filter(length(col("text")) > 0 &&
      octet_length(col("text")) === length(col("text")))
    val frames = Multimodal.sampleFrames(
      Multimodal.withMp4Payload(docs, "doc_id", "text", sampleBytes = 48),
      "doc_id", everyNth = 2)
    frames.groupBy("doc_id").agg(
      count(lit(1)).as("n_frames_kept"),
      sum(col("n_bytes")).as("kept_bytes"),
      sum(ascii(col("frame").cast("string"))).cast("long").as("first_byte_sum"),
      sum(when(col("demuxed"), 0L).otherwise(1L)).as("n_fake"))
      .orderBy("doc_id")
  }

  /** Hamming bound for fixture pHash dedup: the banding default
    * (4 × 16-bit chunks, same regime as t07 SimHash).
    */
  val PhashMaxHamming = 3

  /** Perceptual image hash under the oracle gate: each document's
    * text bytes become a REAL 24-bit BMP on a 32×32 gray canvas
    * ([[Multimodal.withBmpPayload]]), `javax.imageio` decodes it back
    * to pixels, and [[Multimodal.aHash64]] folds the 8×8
    * nearest-neighbor downsample into a 64-bit average-hash. Because
    * gray-pixel luminance recovers the byte exactly, the oracle
    * replays the full integer pipeline — grid sample, mean, bit pack
    * — straight from the text characters; any decode, layout, or
    * downsample drift breaks the hash. Map-only at any scale.
    */
  def docImagePhash(spark: SparkSession, dir: String): DataFrame = {
    // same single-byte gate as t35: the canvas is byte-indexed, the
    // oracle char-indexed — identical only on ASCII text
    val docs = Tables.documents(spark, dir)
      .filter(octet_length(col("text")) === length(col("text")))
    Multimodal.imagePhash(
      Multimodal.withBmpPayload(docs, "doc_id", "text"), "doc_id")
      .orderBy("doc_id")
  }

  /** Image-CONTENT near-dup pairs: pHash fingerprints from the real
    * decode pipeline (t49), paired by the exact-recall Hamming
    * banding ([[Dedup.hammingNearDups]] — the SimHash pigeonhole
    * machinery over an arbitrary 64-bit code). The oracle recomputes
    * every pHash from text and checks ALL pairs (quadratic is fine in
    * the sf0.01 oracle; the operator itself never goes all-pairs).
    */
  /** Id offset for planted perceptual twins (fixture only). */
  val TwinStride = 1000000L

  /** The corpus plus its planted perceptual twins: every 7th doc gets
    * a copy (id + [[TwinStride]]) with its FIRST character replaced —
    * on the stretched canvas that perturbs at most the byte-0 sampled
    * cells, i.e. a few-bit hash change, the text stand-in for a
    * re-encoded/noised image. Without planted twins a discriminative
    * positional hash finds nothing on this corpus: text near-dups are
    * word-EDITS, which shift bytes rather than perturb them — the
    * operator's domain is perceptual (pixel-space) similarity, and
    * the fixture must plant that kind of neighbor to be non-vacuous.
    */
  private def docsWithTwins(spark: SparkSession, dir: String): DataFrame = {
    // twins derive from the RAW corpus and the ASCII gate applies per
    // ROW of the union, exactly like the oracle's tw -> phashCtes
    // order: a doc whose only non-ASCII char is the replaced first
    // one yields a gated-IN twin from a gated-OUT original
    val docs = Tables.documents(spark, dir)
    docs.select(col("doc_id"), col("text")).unionByName(
      docs.filter(col("doc_id") % 7 === 0 && length(col("text")) > 0)
        .select((col("doc_id") + TwinStride).as("doc_id"),
          concat(lit("x"), expr("substring(text, 2)")).as("text")))
      .filter(octet_length(col("text")) === length(col("text")))
  }

  def docImagePhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val fps = Multimodal.imagePhash(
      Multimodal.withBmpPayload(docsWithTwins(spark, dir), "doc_id", "text"),
      "doc_id")
      .filter(col("decoded"))
    Dedup.hammingNearDups(fps, "doc_id", "phash", PhashMaxHamming)
      .orderBy("id_a", "id_b")
  }

  /** Minimum shared near-identical keyframes for a video pair to
    * count as duplicated content, and the per-frame Hamming bound.
    */
  val KeyframeMinShared = 2
  val KeyframeMaxHamming = 2

  /** Video keyframe dedup: REAL ISO-BMFF demux (t36's pipeline) →
    * per-frame 64-bit fingerprint ([[Multimodal.framePhash]] — over
    * access-unit bytes; no pixel codec ships in the JDK) → exact-
    * recall Hamming banding over ALL videos' frames
    * ([[Dedup.hammingNearDups]] on a (doc·2³² + frame) composite id,
    * stride-ordered so cross-doc pairs always come out (doc_a <
    * doc_b)) → per-video-pair shared-frame count, kept at >=
    * [[KeyframeMinShared]]. The cross-corpus candidate volume is the
    * banded fingerprint join, never frames². The oracle replays
    * demux arithmetic, every frame hash, the <= hamming filter, and
    * the pair aggregation from text characters.
    */
  /** The t51 pipeline over an arbitrary (doc_id, text) relation —
    * split out so the composite-id arithmetic is testable with
    * synthetic long documents (the fixture corpus never exceeds 64
    * samples, which is exactly the regime where a too-small stride
    * silently misattributes pairs).
    */
  private[graft] def videoKeyframeDedup(docs: DataFrame): DataFrame = {
    val frames = Multimodal.sampleFrames(
      Multimodal.withMp4Payload(docs, "doc_id", "text", sampleBytes = 48),
      "doc_id", everyNth = 2)
    // composite stride 2^32: frame_idx is a non-negative Int, so it
    // can NEVER reach the stride and collide into the next doc's id
    // space (a *64 stride silently misattributed pairs for any doc
    // over 64 samples = ~3 KB); doc ids up to 2^31 fit the long
    val fps = Multimodal.framePhash(frames, "doc_id", "frame_idx")
      .select((col("doc_id") * lit(4294967296L) + col("frame_no")).as("fid"),
        col("phash"))
    Dedup.hammingNearDups(fps, "fid", "phash", KeyframeMaxHamming)
      .select(expr("id_a div 4294967296").as("id_a"),
        expr("id_b div 4294967296").as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= KeyframeMinShared)
      .orderBy("id_a", "id_b")
  }

  def docVideoKeyframeDedup(spark: SparkSession, dir: String): DataFrame =
    videoKeyframeDedup(
      Tables.documents(spark, dir).filter(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text"))))

  /** PIXEL-level video keyframe dedup — t51's pipeline with frames
    * that actually DECODE: [[Multimodal.withMp4ImagePayload]] builds
    * each 48-char text slice into a 16×16 gray BMP access unit, the
    * demuxed frames run [[Multimodal.framePhash]]'s real
    * decode-to-luminance path (`decoded = true` on every fixture
    * frame — pinned by spec), and the banding/pair stages are t51's.
    * Because the hash is over PIXELS, a re-encoded duplicate frame
    * (same image, different bytes — e.g. a JPEG transcode) still
    * collides; the byte-level t51 path cannot see those
    * (MultimodalSpec proves the planted-twin recall differential).
    * The oracle replays slice → stretched canvas → 8×8 luminance
    * sample → mean threshold → pair aggregation from text characters.
    */
  private[graft] def videoPixelKeyframeDedup(docs: DataFrame): DataFrame = {
    val frames = Multimodal.sampleFrames(
      Multimodal.withMp4ImagePayload(docs, "doc_id", "text", sampleBytes = 48),
      "doc_id", everyNth = 2)
    val fps = Multimodal.framePhash(frames, "doc_id", "frame_idx")
      .select((col("doc_id") * lit(4294967296L) + col("frame_no")).as("fid"),
        col("phash"))
    Dedup.hammingNearDups(fps, "fid", "phash", KeyframeMaxHamming)
      .select(expr("id_a div 4294967296").as("id_a"),
        expr("id_b div 4294967296").as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= KeyframeMinShared)
      .orderBy("id_a", "id_b")
  }

  def docVideoPixelDedup(spark: SparkSession, dir: String): DataFrame =
    videoPixelKeyframeDedup(
      Tables.documents(spark, dir).filter(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text"))))

  /** Candidate depth for the t67 exact re-rank — 3× the final k, the
    * usual refine budget.
    */
  val RerankDepth = 15

  /** The t68 phrase set — fixture-vocabulary bigrams present at every
    * SF, exercising adjacency (a bag-of-words scorer cannot tell
    * "window join" from "join … window").
    */
  private val PhraseQueries: Seq[(Long, String)] = Seq(
    1L -> "window join",
    2L -> "stream data",
    3L -> "filter small")

  /** Positional phrase retrieval over the persisted inverted index
    * ([[CorpusOps.phraseSearch]] on the t66 index): top-10 documents
    * per phrase by exact occurrence count. The oracle replays token
    * positions, the per-offset adjacency support, the all-offsets
    * filter, and the ranked cut from text.
    */
  def docPhraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val path = sessionIndexPath(spark, "t66_invidx", dir) { p =>
      CorpusOps.buildInvertedIndex(Tables.documents(spark, dir), "doc_id",
        "text", p)
    }
    CorpusOps.phraseSearch(spark, path, PhraseQueries, k = 10)
      .orderBy("query_id", "rank")
  }

  /** Two-tier persisted-index retrieval under the oracle gate
    * ([[Similarity.searchIvfPqIndexRerank]]): the t63 index's ADC
    * scan surfaces [[RerankDepth]] candidates per query, their raw
    * vectors are fetched from the primary store by a broadcast of the
    * skinny candidate set, and exact cosine keeps the top 5. The
    * oracle replays the ENTIRE composition — training, routing,
    * probing, ADC candidate ranking, and the exact-cosine refine.
    */
  def annIvfPqRerank(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val path = sessionIndexPath(spark, "t63_ivfpq", dir) { p =>
      Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", p,
        minNlist = 16, m = 8, ksub = 64,
        centroidsOpt = Some(fullCorpusCentroids(spark, dir)))
    }
    Similarity.searchIvfPqIndexRerank(spark, path,
        emb.filter(col("vec_id").isin(PqQueryIds: _*)), emb,
        "vec_id", "embedding", k = 5, rerank = RerankDepth, nprobe = 2)
      .orderBy("query_id", "rank")
  }

  /** Sliding window length for maximal duplicated-range detection —
    * short enough that the fixture's exact-dup documents cover whole
    * docs while partial copies still register.
    */
  val DupRangeL = 8

  /** Maximal duplicated-range detection
    * ([[CorpusOps.maximalDupRanges]], l = [[DupRangeL]]): per doc the
    * coalesced any-alignment duplicated ranges and their token mass.
    * The oracle replays the sliding grams ON TEXT (so the engine's
    * 8-byte fingerprint compression is itself under test), the
    * corpus-wide frequency, the gap>l range-breaking, and the
    * coalesced mass in BIGINT.
    */
  def docDupRanges(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.maximalDupRanges(Tables.documents(spark, dir), "doc_id", "text",
        l = DupRangeL)
      .orderBy("doc_id")

  /** Incremental image dedup under the oracle gate: every 5th
    * document plays the incoming image batch, the rest the indexed
    * corpus; both run the REAL BMP build→decode→pHash pipeline (t49)
    * and the batch is classified exact/near/new against the index by
    * [[Dedup.incrementalHammingDedup]] — index×batch banding only,
    * never a corpus re-pair. The oracle replays every pHash, the
    * Hamming filter, and the (hamming asc, id asc) nearest-match
    * election.
    */
  def docIncrementalImageDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val ascii = octet_length(col("text")) === length(col("text"))
    // the batch plants one twin class per disposition: perturbed
    // first char -> near, verbatim copy -> exact, reversed -> new.
    // Twins derive from the RAW corpus, the ASCII gate applies per
    // row AFTER construction — the oracle's tw -> phashCtes order
    val batch =
      docs.filter(col("doc_id") % 10 === 1 && length(col("text")) > 0)
        .select((col("doc_id") + TwinStride).as("doc_id"),
          concat(lit("x"), expr("substring(text, 2)")).as("text"))
      .unionByName(docs.filter(col("doc_id") % 10 === 2)
        .select((col("doc_id") + 2 * TwinStride).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 3 * TwinStride).as("doc_id"),
          reverse(col("text")).as("text")))
      .filter(ascii)
    def fps(d: org.apache.spark.sql.DataFrame) =
      Multimodal.imagePhash(
        Multimodal.withBmpPayload(d, "doc_id", "text"), "doc_id")
    Dedup.incrementalHammingDedup(
      fps(docs.filter(ascii).select("doc_id", "text")), fps(batch),
      "doc_id", "phash", PhashMaxHamming)
      .orderBy("batch_id")
  }

  /** Per-source corpus report card ([[CorpusOps.corpusReport]]): the
    * datasheet stats published with a corpus release — volumes,
    * exact-dup incidence, language composition, shape ratios — every
    * cell integer (or the modal-lang string) and oracle-replayed.
    */
  def docCorpusReport(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.corpusReport(Tables.documents(spark, dir), "doc_id", "text",
        "source", "lang")
      .orderBy("source")

  /** Count-min frequency sketch ([[CorpusOps.cmSketchTopK]], depth 4
    * × width 1024) over the corpus bigram stream, reported against
    * the true top-20 — est ≥ true one-sided by construction, every
    * counter and estimate replayed exactly by the oracle.
    */
  def docCmSketch(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.cmSketchTopK(Tables.documents(spark, dir), "text",
      n = 2, k = 20, width = 1024)

  /** Hamming bound for audio-fingerprint dedup — the same 4×16-bit
    * banding regime as t07 SimHash and t50 image pHash.
    */
  val AudioFpMaxHamming = 3

  /** The corpus plus its planted audio twins: every (doc_id % 9 = 2)
    * doc gets a VERBATIM copy (+[[TwinStride]] — a re-ingested
    * identical recording, the hamming-0 disposition) and every
    * (doc_id % 9 = 5) doc a copy (+2·[[TwinStride]]) with its FIRST
    * character replaced — one perturbed PCM sample, the text
    * stand-in for a re-encoded/noised recording. On the stretched
    * energy bins that moves only bin 0's energy plus the global mean
    * by ≤ 127²/64, a few-bit fingerprint change (measured: every
    * perturbed twin lands within hamming 2 of its original at
    * sf0.1). Text near-dups alone are word-EDITS that shift samples
    * rather than perturb them, so without planted twins a
    * discriminative time-binned hash finds almost nothing — same
    * non-vacuity argument as [[docsWithTwins]]. The len/ASCII gate
    * applies per row AFTER the union, mirroring the oracle's
    * tw → ad order. The plant is modality-generic, so t57's
    * cross-modal ensemble reuses this same twinned corpus.
    */
  private def docsWithAudioTwins(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 9 === 2)
        .select((col("doc_id") + TwinStride).as("doc_id"), col("text")))
      .unionByName(docs.filter(col("doc_id") % 9 === 5 && length(col("text")) > 0)
        .select((col("doc_id") + 2 * TwinStride).as("doc_id"),
          concat(lit("x"), expr("substring(text, 2)")).as("text")))
      .filter(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
  }

  /** Audio-CONTENT near-dup pairs: real WAV build→decode
    * ([[Multimodal.withWavPayload]] → [[Multimodal.audioFingerprint]])
    * → binned-energy 64-bit fingerprints → exact-recall Hamming
    * banding ([[Dedup.hammingNearDups]] — the SimHash pigeonhole
    * machinery, complete within [[AudioFpMaxHamming]]). The audio
    * sibling of t50: same banding, fingerprint from decoded PCM
    * energy instead of pixel luminance. The oracle recomputes every
    * fingerprint from text characters and checks ALL pairs
    * (quadratic only in the sf0.01 oracle; the operator never goes
    * all-pairs).
    */
  def docAudioFpDedup(spark: SparkSession, dir: String): DataFrame = {
    val fps = Multimodal.audioFingerprint(
      Multimodal.withWavPayload(docsWithAudioTwins(spark, dir), "doc_id", "text"),
      "doc_id")
      .filter(col("decoded"))
    Dedup.hammingNearDups(fps, "doc_id", "afp", AudioFpMaxHamming)
      .orderBy("id_a", "id_b")
  }

  /** Curriculum ordering ([[CorpusOps.curriculumOrder]], 4 bins):
    * the deterministic training-stream export — quality-binned
    * easy→hard order with an in-bin id-hash shuffle and a contiguous
    * global order index. The engine computes the index via the
    * two-phase distributed ranking (histogram offsets + bounded
    * windows); the oracle computes it as one naive global
    * ROW_NUMBER — the gate proves the two agree row-for-row.
    */
  def docCurriculumOrder(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.curriculumOrder(Tables.documents(spark, dir), "doc_id", "text",
        nBins = 4, bucketBits = 6)
      .orderBy("order_idx")

  /** Cross-modal ensemble dedup: near-dup pairs surfaced by the TEXT
    * channel (MinHash-LSH, t06's contract), the IMAGE channel (real
    * BMP decode → pHash → Hamming banding, t50's contract), or both —
    * full-outer-merged with modality provenance, over the twinned
    * corpus ([[docsWithAudioTwins]] — the plant is modality-generic:
    * a verbatim copy is a dup in EVERY channel, a first-char
    * perturbation stays near in the positional channels while the
    * text channel sees an almost-unchanged shingle set). Channel
    * agreement is the ensemble's value: 'both' rows are
    * high-confidence duplicates, single-channel rows are where one
    * signal is blind (word edits shift bytes → text-only; hash
    * coincidences → image-only). The oracle replays BOTH full
    * pipelines and the merge.
    */
  def docCrossModalDedup(spark: SparkSession, dir: String): DataFrame =
    crossModalDedup(docsWithAudioTwins(spark, dir))

  /** The t57 pipeline over an arbitrary (doc_id, text) relation —
    * split out so the modality derivation is testable with synthetic
    * docs engineered to hit each branch (the fixture corpus yields
    * 'both' and 'text' but no grid-preserving word rewrite, so the
    * 'image' branch needs a constructed pair).
    */
  private[graft] def crossModalDedup(base: DataFrame): DataFrame = {
    val textPairs = Dedup.minhashLsh(base, "doc_id", "text",
        n = 3, numPerms = 64, bands = 16, threshold = 0.5)
      .select(col("id_a"), col("id_b"), lit(1L).as("text_dup"))
    val imagePairs = Dedup.hammingNearDups(
        Multimodal.imagePhash(
          Multimodal.withBmpPayload(base, "doc_id", "text"), "doc_id")
          .filter(col("decoded")),
        "doc_id", "phash", PhashMaxHamming)
      .select(col("id_a"), col("id_b"), lit(1L).as("image_dup"))
    textPairs.join(imagePairs, Seq("id_a", "id_b"), "full_outer")
      .select(col("id_a"), col("id_b"),
        coalesce(col("text_dup"), lit(0L)).as("text_dup"),
        coalesce(col("image_dup"), lit(0L)).as("image_dup"))
      .withColumn("modality",
        when(col("text_dup") === 1 && col("image_dup") === 1, "both")
          .when(col("text_dup") === 1, "text").otherwise("image"))
      .orderBy("id_a", "id_b")
  }

  /** KMV sketch set operations between the even-id and odd-id corpus
    * halves ([[CorpusOps.kmvSetOps]], n = 3, k = 200): estimated
    * per-side, union, and intersection distinct trigram-vocabulary
    * sizes from two bottom-k sketches — the cross-dataset comparison
    * form of t25, oracle-replayed sketch-for-sketch with the exact
    * counts alongside.
    */
  def docKmvSetOps(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    CorpusOps.kmvSetOps(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1),
      "text", n = 3, k = 200)
  }

  /** HLL distinct sketch over the corpus 3-gram vocabulary
    * ([[CorpusOps.hllDistinctSketch]], p = 8 → 256 registers), the
    * fixed-memory companion to t25's bottom-k KMV over the SAME hash
    * stream — registers, scaled harmonic sum, and estimate all
    * replayed exactly by the oracle, with the exact distinct count
    * alongside for the accuracy check.
    */
  def docHllSketch(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.hllDistinctSketch(Tables.documents(spark, dir), "text",
      n = 3, p = 8)

  /** Per-source top-25% quality pruning ([[CorpusOps.qualityPrune]]):
    * exact per-source quantile via the compressed score histogram +
    * broadcast threshold filter — no corpus sort. The oracle replays
    * the integer score, the cumulative threshold walk, and the
    * tie-inclusive cut exactly.
    */
  def docQualityPrune(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.qualityPrune(Tables.documents(spark, dir), "doc_id", "text",
        "source", keepFrac = 0.25)
      .orderBy("doc_id")

  /** Incremental snapshot dedup ([[Dedup.incrementalDedup]]): the
    * last 20% of documents (by id) arrive as the "new batch" and are
    * disposed against the first 80% as the existing index — exact by
    * digest, near by verified MinHash-LSH, else new. The 80/20 split
    * point is pure COUNT(*) integer arithmetic so the oracle replays
    * it.
    */
  def docIncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val split = docs.count() * 4 / 5
    Dedup.incrementalDedup(
        docs.filter(col("doc_id") < split),
        docs.filter(col("doc_id") >= split),
        "doc_id", "text")
      .orderBy("batch_id")
  }

  /** Hybrid lexical retrieval ([[CorpusOps.hybridRetrievalTopK]]):
    * t30's BM25 channel fused with a TF-IDF channel by integer-exact
    * reciprocal-rank fusion. The oracle replays both channel rankings
    * AND the fusion arithmetic.
    */
  def docHybridRetrieval(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.hybridRetrievalTopK(Tables.documents(spark, dir), "doc_id",
        "text", Bm25Queries, k1 = 1.2, b = 0.75, k = 10, kConst = 60)
      .orderBy("query_id", "rank")

  /** Domain PageRank over the content-syndication graph
    * ([[graft.operators.GraphOps.domainPageRank]]): 3-gram shared-
    * content edges (stop-gram cap 10 domains), 5 scaled-integer
    * rounds — the oracle unrolls edge derivation and every round.
    */
  def docDomainPageRank(spark: SparkSession, dir: String): DataFrame =
    graft.operators.GraphOps.domainPageRank(
        Tables.documents(spark, dir), "source", "text",
        n = 3, maxDf = 10, iters = 5)
      .orderBy("source")

  /** Bigram-LM fluency ([[CorpusOps.bigramMeanProb]]) — add-one-
    * smoothed mean bigram probability in exact fixed-point.
    */
  def docBigramQuality(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.bigramMeanProb(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Per-domain cap ([[CorpusOps.domainCap]], cap 20) — hash-ordered
    * survivors with their within-domain rank.
    */
  def docDomainCap(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.domainCap(Tables.documents(spark, dir), "doc_id", "source", 20)
      .select(col("doc_id"), col("source"), col("domain_rank"))
      .orderBy("doc_id")

  /** Binary-quantization ANN ([[Similarity.binaryTopK]]): sign-bit
    * words, Hamming candidates (depth 16), exact-cosine refine to
    * top-5 — the oracle replays packing, Hamming, cut, and refine.
    */
  def annBinaryTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.binaryTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
        PqQueryIds, k = 5, rerank = 16)
      .orderBy("query_id", "rank")

  /** Square-root temperature rebalancing over languages
    * ([[CorpusOps.sqrtTemperatureSample]], scale 2.0): heavy
    * languages compress toward ~2·√n docs, small ones pass whole.
    */
  def docSqrtTemperature(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.sqrtTemperatureSample(Tables.documents(spark, dir), "doc_id",
        "lang", scale = 2.0)
      .select(col("doc_id"), col("lang"), col("source"))
      .orderBy("doc_id")

  /** Persisted IVF-binary index under the oracle gate
    * ([[Similarity.buildIvfBinaryIndex]] →
    * [[Similarity.searchIvfBinaryIndex]]): t73's 1-bit codes under
    * t63's cell-partitioned layout — probes prune the scan to
    * ~nprobe/nlist of the code files, Hamming scores 8-byte-pair
    * rows, the exact-cosine refine decides the final order. The
    * oracle replays the Lloyd quantizer, cell routing, probe choice,
    * packing, Hamming, cut, and refine.
    */
  def annIvfBinaryPersisted(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val path = sessionIndexPath(spark, "t75_ivfbin", dir) { p =>
      Similarity.buildIvfBinaryIndex(emb, "vec_id", "embedding", p,
        minNlist = 16, centroidsOpt = Some(fullCorpusCentroids(spark, dir)))
    }
    Similarity.searchIvfBinaryIndex(spark, path,
        emb.filter(col("vec_id").isin(PqQueryIds: _*)), emb,
        "vec_id", "embedding", k = 5, rerank = 16, nprobe = 2)
      .orderBy("query_id", "rank")
  }

  /** Normalized exact dedup ([[Dedup.normalizedExact]]) under a
    * DISCRIMINATING gate: the fixture has no case/punctuation
    * variants, so the query plants one — every 10th doc gains a
    * perturbed twin (id+1e6, ASCII-uppercased text + trailing " .")
    * that byte-exact dedup keeps and normalized dedup must collapse
    * back onto the original. Survivors = exactly the original corpus.
    * The plant uppercases via `translate` over the ASCII alphabet,
    * NOT `upper()`: JVM full case mapping (ß→SS) and DuckDB's
    * utf8proc 1:1 mapping disagree on non-ASCII code points, so an
    * upper()-built plant could diverge between engine and oracle —
    * translate is per-char 1:1 in both by definition.
    */
  def dedupNormalizedExact(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val lowerAz = "abcdefghijklmnopqrstuvwxyz"
    val upperAz = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    val planted = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(translate(col("text"), lowerAz, upperAz), lit(" .")).as("text"),
        col("lang"), col("source"), col("n_chars"))
    Dedup.normalizedExact(docs.unionByName(planted), "doc_id", "text")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy("doc_id")
  }

  /** Retrieval evaluation ([[CorpusOps.rankingMetrics]]): t30's BM25
    * top-10 measured against conjunctive all-terms relevance —
    * precision/recall@10 and MRR in exact scaled integers; the
    * oracle replays ranking, truth set, and every metric division.
    */
  def docRankingMetrics(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.evaluateBm25(Tables.documents(spark, dir), "doc_id", "text",
        Bm25Queries, k1 = 1.2, b = 0.75, k = 10)
      .orderBy("query_id")

  /** Leakage-safe splits ([[CorpusOps.leakageSafeSplits]], t24's
    * MinHash/component parameters): near-dup clusters move between
    * splits wholesale. The oracle replays pairs, components, and the
    * group-key bucket fold.
    */
  def docLeakageSafeSplits(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.leakageSafeSplits(Tables.documents(spark, dir), "doc_id", "text",
        compOpt = Some(sharedComponents(spark, dir)))
      .select(col("doc_id"), col("group_key"), col("split"))
      .orderBy("doc_id")

  /** Corpus drift report ([[CorpusOps.corpusDrift]]) under a
    * DISCRIMINATING construction (the t76 planting discipline): prev
    * drops every 5th doc, cur drops every 3rd and perturbs every 7th
    * doc's text (" drift" appended via concat — byte-deterministic in
    * both engines), so added / removed / changed / unchanged and the
    * vocab-drift Jaccard are ALL non-trivially exercised and the
    * oracle replays the same construction.
    */
  def docCorpusDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val prev = docs.filter(col("doc_id") % 5 =!= 0)
    val cur = docs.filter(col("doc_id") % 3 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 7 === 0, concat(col("text"), lit(" drift")))
          .otherwise(col("text")))
    CorpusOps.corpusDrift(prev, cur, "doc_id", "text")
      .orderBy("metric")
  }

  /** End-to-end governance recipe ([[CorpusOps.curationRecipe]]):
    * normalized dedup → leakage-safe splits → domain cap 20 →
    * √-temperature 4.0 → per-source token budgets → curriculum
    * ordering of the train split — the oracle replays every stage's
    * exact arithmetic in one composed query.
    */
  def docCurationRecipe(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.curationRecipe(Tables.documents(spark, dir), "doc_id",
        "text", "source",
        budgets = Map("src0" -> 100000L, "src1" -> 500L, "src2" -> 40L))
      .curated
      .orderBy("doc_id")

  /** Realized split fractions ([[CorpusOps.splitFractions]]) over
    * t78's leakage-safe splits — the audit making a skewed
    * cluster-weighted draw visible.
    */
  def docSplitFractions(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.splitFractions(
        CorpusOps.leakageSafeSplits(Tables.documents(spark, dir),
          "doc_id", "text",
          compOpt = Some(sharedComponents(spark, dir))))
      .orderBy("split")

  /** Multi-epoch upsampling ([[CorpusOps.epochUpsample]]): src0 gets
    * full epochs plus a fractional one, src1 caps at maxEpochs 10,
    * src2 degrades to fractional downsampling, all other sources are
    * dropped — the oracle replays the targets, the epoch division,
    * and the fractional hash rate.
    */
  def docEpochUpsample(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.epochUpsample(Tables.documents(spark, dir), "doc_id",
        "text", "source",
        Map("src0" -> 5000L, "src1" -> 50000L, "src2" -> 600L),
        maxEpochs = 10)
      .orderBy("doc_id", "epoch")

  /** Benchmark-side contamination report
    * ([[CorpusOps.contaminationReport]]): the t19 split (every 10th
    * doc is the held-out benchmark), reported from the BENCHMARK's
    * side — per bench doc, its gram count, leaked grams,
    * contaminating corpus docs, and max per-doc overlap.
    */
  def docContaminationReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    CorpusOps.contaminationReport(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", DecontamN)
      .orderBy("bench_id")
  }

  /** Proportional source interleaving ([[CorpusOps.interleaveOrder]]):
    * stride-scheduled serialization of the source mixture — the
    * oracle replays both ranking passes as naive global ROW_NUMBERs,
    * proving the two-phase distributed ranking realizes the exact
    * total order.
    */
  def docInterleaveOrder(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.interleaveOrder(Tables.documents(spark, dir), "doc_id",
        "source")
      .orderBy("doc_id")

  /** Soft dedup ([[CorpusOps.softDedupWeights]], t24's MinHash and
    * component parameters): every doc keeps a 1e6-fixed-point
    * 1/cluster_size loss weight instead of being dropped.
    */
  def docSoftDedupWeights(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.softDedupWeights(Tables.documents(spark, dir), "doc_id", "text",
        compOpt = Some(sharedComponents(spark, dir)))
      .orderBy("doc_id")

  /** k for the t86 weighted priority sample: 200 < |documents| at
    * every shipped SF, so the τ-adjustment branch is exercised at
    * each scale (an exhaustive sample would gate only τ=0).
    */
  private val PrioSampleK = 200

  /** Weighted priority sampling ([[CorpusOps.prioritySample]],
    * k=200, weight = n_chars): the Duffield–Lund–Thorup
    * weighted-without-replacement sample with Horvitz–Thompson
    * adjusted weights — the oracle replays the integer priority
    * arithmetic, the (k+1)-th-priority threshold, and the
    * adjustment bit-for-bit.
    */
  def docPrioritySample(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.prioritySample(Tables.documents(spark, dir), "doc_id",
        "n_chars", PrioSampleK)
      .orderBy("doc_id")

  /** Packing-efficiency audit ([[CorpusOps.packingReport]]) over
    * t21's packing parameters (budget 512, 8 shards): sequences cut,
    * final-sequence padding, boundary-straddling documents, and the
    * integer fill rate per shard.
    */
  def docPackingReport(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.packingReport(Tables.documents(spark, dir), "doc_id",
        "text", budget = 512, shards = 8)
      .orderBy("shard")

  /** Length-bucketed batching ([[CorpusOps.lengthBucketBatches]],
    * batches of 32 over 8 shards): padding-minimizing SFT batch
    * assembly — the oracle replays the (length, id) ranking, the
    * batch cut, and the per-batch max.
    */
  def docLengthBatches(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.lengthBucketBatches(Tables.documents(spark, dir),
        "doc_id", "text", batchSize = 32, shards = 8)
      .orderBy("doc_id")

  /** Score-calibration report ([[CorpusOps.scoreCalibrationReport]],
    * t45's frozen weights, label = lang='en', 10 quantile bins): the
    * per-bin positive-rate profile a classifier-pruned corpus is
    * trusted (or not) on — the oracle replays score, histogram,
    * cumulative bin walk, and every integer rate.
    */
  def docScoreCalibration(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.scoreCalibrationReport(Tables.documents(spark, dir),
        "doc_id", "text", ClassifierWeights, col("lang") === "en",
        bins = 10)
      .orderBy("bin")

  /** Contrastive pair mining ([[Dedup.contrastivePairs]], t06's
    * MinHash parameters, 64 negative buckets): pos / hard / random
    * training pairs for an embedding model — the oracle replays the
    * full LSH pipeline unthresholded, splits candidates by the
    * verify, and re-derives the bucket-min random partners.
    */
  def docContrastivePairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.contrastivePairs(Tables.documents(spark, dir), "doc_id",
        "text", candOpt = Some(sharedLshCandidates(spark, dir)))
      .orderBy("anchor_id", "cand_id", "tier")

  /** Margin-based mutual-kNN pair mining
    * ([[Similarity.marginMutualPairs]], k = 4): ratio-margin bitext
    * mining between the even-label and odd-label halves of the
    * embeddings table — mutual margin-argmax pairs with margin > 1.
    */
  def embMarginPairs(spark: SparkSession, dir: String): DataFrame =
    Similarity.marginMutualPairs(Tables.embeddings(spark, dir),
        "vec_id", "embedding", col("label") % 2 === 0, k = 4)
      .orderBy("a_id")

  /** Winnowing fingerprint sketch ([[Dedup.winnowFingerprints]],
    * k = 3 token grams, window w = 4): the MOSS selection — each
    * window of 4 consecutive gram hashes keeps its rightmost minimum.
    * The oracle replays gram construction, PolyHash, and the window
    * fold position-for-position.
    */
  def docWinnowFingerprints(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowFingerprints(Tables.documents(spark, dir), "doc_id",
        "text", k = 3, w = 4)
      .orderBy("doc_id", "pos", "fp")

  /** Winnowed overlap pairs ([[Dedup.winnowOverlapPairs]], ≥ 2 shared
    * selected hashes): the sub-linear boilerplate/plagiarism join the
    * winnowing guarantee powers — the inverted index is the 2/(w+1)-
    * density sketch, never the full gram set.
    */
  def docWinnowOverlap(spark: SparkSession, dir: String): DataFrame =
    Dedup.winnowOverlapPairs(Tables.documents(spark, dir), "doc_id",
        "text", k = 3, w = 4, minShared = 2)
      .orderBy("id_a", "id_b")

  /** Pairwise per-source KMV vocabulary overlap
    * ([[CorpusOps.kmvGroupOverlap]], trigrams, k = 128): bottom-k
    * sketch per source + the t55 estimators for every source pair —
    * the set-overlap redundancy matrix next to t102's distributional
    * one. The oracle replays sketches, merges, and estimators
    * integer-for-integer.
    */
  def docSourceKmvOverlap(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.kmvGroupOverlap(Tables.documents(spark, dir), "text",
        "source", n = 3, k = 128)
      .orderBy("source_a", "source_b")

  /** Systematic PPS sample ([[CorpusOps.systematicPpsSample]],
    * k = 50 pointers over the n_chars weight line): evenly-spaced
    * pointers on the cumulative weight line in the deterministic
    * sharded-hash order — Σ n_copies = k exactly, π in ppm for HT
    * estimation. The oracle replays the order, cumsum, pointer
    * divisions, and the split-exact π arithmetic.
    */
  def docPpsSample(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.systematicPpsSample(Tables.documents(spark, dir), "doc_id",
        "n_chars", k = 50)
      .orderBy("doc_id")

  /** Collocation mining by lift ([[CorpusOps.collocationLift]],
    * min count 5): adjacent-bigram lift in 1e6 fixed point — the
    * multiword-unit induction pass, log-free so both engines replay
    * one exact integer floor over 38-digit products.
    */
  def docCollocations(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.collocationLift(Tables.documents(spark, dir), "text",
        minCount = 5L)
      .orderBy("w1", "w2")

  /** Cross-source quantile normalization
    * ([[CorpusOps.quantileNormalize]] over n_chars): every document's
    * length score mapped to the global score at its within-source
    * quantile — per-source distributions become comparable before any
    * global threshold. Histogram-only arithmetic, oracle-replayed.
    */
  def docQuantileNorm(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.quantileNormalize(Tables.documents(spark, dir), "doc_id",
        "source", "n_chars")
      .orderBy("doc_id")

  /** Per-user interaction-gap features
    * ([[TimeJoins.interactionGapFeatures]], 1 s burst bound): exact
    * integer inter-event statistics — the bot-signal set an
    * interaction log is filtered on before it becomes training data.
    */
  def eventsGapFeatures(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.interactionGapFeatures(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu"),
            col("event_id")),
        "user_id", "tsu", "event_id")
      .orderBy("user_id")

  /** Split × source representativeness audit
    * ([[CorpusOps.splitSourceBalance]] over the t78 leakage-safe
    * splits): the full {train,val,test} × source contingency table
    * with expected-vs-realized ppm deviations — empty cells surface
    * with zero counts. Rides the shared component closure.
    */
  def docSplitSourceBalance(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    CorpusOps.splitSourceBalance(
        CorpusOps.leakageSafeSplits(docs, "doc_id", "text",
          compOpt = Some(sharedComponents(spark, dir))),
        docs, "doc_id", "source")
      .orderBy("split", "source")
  }

  /** Dedup survivorship by source ([[CorpusOps.dedupSurvivorship]]
    * over the shared canonical election): per-source survival ppm
    * after near-dup dedup — the which-sources-get-gutted audit.
    */
  def docDedupSurvivorship(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.dedupSurvivorship(Tables.documents(spark, dir), "doc_id",
        "source", sharedCanonical(spark, dir))
      .orderBy("source")

  /** Freshness-weighted PPS sample ([[CorpusOps.freshnessSample]],
    * 7-day half-life, k = 50): recency-biased replay draw over the
    * event log — weights halve per week of age (exact shifts), then
    * the t116 pointer walk. Oracle replays weights and the walk.
    */
  def eventsFreshnessSample(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.freshnessSample(
        Tables.eventsNanos(spark, dir)
          .select(col("event_id"), expr("ts div 1000").as("tsu")),
        "event_id", "tsu", halfLifeUs = 7L * 86400L * 1000000L, k = 50)
      .orderBy("doc_id")

  /** Per-user behavioral diversity
    * ([[TimeJoins.behavioralDiversity]]): Gini impurity of the
    * event-type distribution in 1e6 fixed point, modal share, type
    * count — entropy's log-free twin for bot segmentation.
    */
  def eventsDiversity(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.behavioralDiversity(Tables.events(spark, dir),
        "user_id", "event_type")
      .orderBy("user_id")

  /** Near-dup cluster-size histogram
    * ([[CorpusOps.clusterSizeHistogram]] over the shared component
    * closure): per cluster size (1 = singletons) the cluster count,
    * document mass, and ppm of corpus — the dedup-landscape read.
    */
  def docClusterHistogram(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.clusterSizeHistogram(Tables.documents(spark, dir), "doc_id",
        sharedComponents(spark, dir))
      .orderBy("cluster_size")

  /** b-bit minwise estimates ([[Dedup.bbitMinhashEstimate]], b = 4
    * over t06's LSH candidates): per candidate pair the truncated-
    * signature agreement, the collision-corrected Jaccard estimate,
    * and the exact Jaccard alongside — the 8×-smaller dedup sketch,
    * gated end-to-end.
    */
  def docBbitMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.bbitMinhashEstimate(Tables.documents(spark, dir), "doc_id",
        "text", b = 4, candOpt = Some(sharedLshCandidates(spark, dir)))
      .orderBy("id_a", "id_b")

  /** Incremental winnow-sketch admission
    * ([[Dedup.incrementalWinnowDedup]], t19's bench split doc_id%10=0
    * as the pre-indexed corpus): per new document, indexed-fingerprint
    * hits and the admit verdict — boilerplate gating at 2/(w+1) index
    * density.
    */
  def docWinnowAdmission(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    Dedup.incrementalWinnowDedup(
        Dedup.winnowFingerprints(docs.filter(col("doc_id") % 10 === 0),
          "doc_id", "text").select("fp"),
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
      .orderBy("batch_id")
  }

  /** Persisted winnow-index lifecycle under the oracle gate
    * ([[Dedup.buildWinnowIndex]] → [[Dedup.searchWinnowIndex]]):
    * build the fp-bucketed index once into a scratch directory over
    * the t126 index split (doc_id % 10 == 0), then answer t126's
    * exact admission question from the STORED relation — the probe
    * reads only the batch fingerprints' bucket files (dynamic
    * partition pruning; PlanShapeSpec pins the scan filter) and the
    * sketch parameters come from the index's meta, not the caller.
    * Identical semantics to the in-query t126 operator, so the same
    * oracle replays it bit-for-bit.
    */
  def docWinnowPersisted(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val path = sessionIndexPath(spark, "t134_winnow", dir) { p =>
      Dedup.buildWinnowIndex(docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", p)
    }
    Dedup.searchWinnowIndex(spark, path,
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
      .orderBy("batch_id")
  }

  /** Join-key skew report ([[CorpusOps.keySkewReport]] over the event
    * log's type key, 32-partition sizing): heavy keys, ppm shares,
    * and the ceiling salt factor — planning-time skew triage.
    */
  def eventsKeySkew(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.keySkewReport(Tables.events(spark, dir), "event_type",
        topK = 10, partitions = 32)
      .orderBy("rank")

  /** Corpus snapshot diff ([[CorpusOps.snapshotDiff]]): the old
    * snapshot is the fixture corpus; the new one deterministically
    * drops every 13th doc and revises every 7th (suffix edit) — the
    * oracle rebuilds the identical new snapshot and compares TEXT
    * directly where the engine compares 256-bit digests, so the
    * compression discipline is itself under the gate (t04 style).
    */
  def docSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val newSnap = docs.filter(col("doc_id") % 13 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" rev9"))).otherwise(col("text")))
    CorpusOps.snapshotDiff(docs, newSnap, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Per-source top-3 tokens ([[CorpusOps.topTokensPerGroup]]): the
    * vocabulary head per source, rank ≤ k realized as a
    * WindowGroupLimit (map partitions pre-prune before the shuffle).
    */
  def docTopTokens(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.topTokensPerGroup(Tables.documents(spark, dir), "text",
        "source", k = 3)
      .orderBy("source", "rank")

  /** Event-type transition matrix ([[TimeJoins.eventTransitions]]):
    * first-order Markov counts with row-normalized ppm.
    */
  def eventsTransitions(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.eventTransitions(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu"),
            col("event_id"), col("event_type")),
        "user_id", "tsu", "event_id", "event_type")
      .orderBy("from_type", "to_type")

  /** Zipf head-mass curve ([[CorpusOps.vocabMassCurve]], k ∈
    * {10, 100, 1000}): token-mass coverage of the top-k vocabulary —
    * the stop-list/vocab sizing read, bounded-top-k exact.
    */
  def docVocabMass(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.vocabMassCurve(Tables.documents(spark, dir), "text")
      .orderBy("k")

  /** Per-user circadian profile ([[TimeJoins.circadianProfile]]):
    * peak hour, its ppm share, active-hour count — the third bot
    * signal next to t119/t123.
    */
  def eventsCircadian(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.circadianProfile(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu")),
        "user_id", "tsu")
      .orderBy("user_id")

  /** Session-level event-type co-occurrence lift
    * ([[TimeJoins.sessionTypeLift]], 30-min sessions, min 5
    * co-sessions): which behaviors travel together in one visit —
    * the behavioral collocation table.
    */
  def eventsSessionLift(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.sessionTypeLift(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu"),
            col("event_id"), col("event_type")),
        "user_id", "tsu", "event_id", "event_type")
      .orderBy("type_a", "type_b")

  /** Week-N retention cohort matrix ([[TimeJoins.retentionCohorts]],
    * fixed epoch weeks): cohort size, per-offset active users, exact
    * ppm retention — the cohort triangle.
    */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.retentionCohorts(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu")),
        "user_id", "tsu")
      .orderBy("cohort_week", "week_n")

  /** Inter-session type carryover ([[TimeJoins.sessionCarryover]],
    * 30-min sessions): type present in visit k → type present in
    * visit k+1, with row-normalized ppm — the session-level analog
    * of the t130 transition matrix.
    */
  def eventsCarryover(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.sessionCarryover(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu"),
            col("event_id"), col("event_type")),
        "user_id", "tsu", "event_id", "event_type")
      .orderBy("type_a", "type_b")

  /** Per-source n-gram novelty ([[CorpusOps.gramNovelty]], word
    * trigrams): the reference is every third doc, the "new snapshot"
    * the rest — which sources bring unseen content, in exact ppm.
    */
  def docGramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    CorpusOps.gramNovelty(docs.filter(col("doc_id") % 3 === 0),
        docs.filter(col("doc_id") % 3 =!= 0), "text", "source")
      .orderBy("source")
  }

  /** Persisted MinHash band-index lifecycle under the oracle gate
    * ([[Dedup.buildBandIndex]] → [[Dedup.searchBandIndex]]): build
    * the bucketed band/signature store over the t126 index split,
    * then dispose the batch against it — candidates from pruned band
    * buckets, scores from signature agreement (exact ppm), best match
    * by one struct MAX. The oracle replays signatures, band keys,
    * cross-split candidate meetings, agreement counts, and the
    * tie-break bit-for-bit.
    */
  def docBandPersisted(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val path = sessionIndexPath(spark, "t143_band", dir) { p =>
      Dedup.buildBandIndex(docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", p)
    }
    Dedup.searchBandIndex(spark, path,
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
      .orderBy("batch_id")
  }

  /** Cross-source near-dup attribution matrix
    * ([[CorpusOps.sourceOverlapPairs]], shared LSH candidates): who
    * copies whom, pair-confirmed — the syndication map next to t115's
    * vocabulary overlap.
    */
  def docSourceOverlap(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.sourceOverlapPairs(Tables.documents(spark, dir), "doc_id",
        "text", "source", candOpt = Some(sharedLshCandidates(spark, dir)))
      .orderBy("source_a", "source_b")

  /** First-touch attribution ([[TimeJoins.firstTouchAttribution]]:
    * purchases credit the earliest view/click inside a 1-day
    * lookback, RANGE-frame windows — no inequality join).
    */
  def eventsAttribution(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.firstTouchAttribution(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu"),
            col("event_id"), col("event_type")),
        "user_id", "tsu", "event_id", "event_type",
        convType = "purchase", touchTypes = Seq("view", "click"))
      .orderBy("conversion_id")

  /** Sustained-rate burst detection ([[TimeJoins.burstDetect]],
    * 1-hour buckets, ≥ 2 events/bucket): maximal hot-bucket runs per
    * user with their span and event mass — bot signal #4.
    */
  def eventsBursts(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.burstDetect(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu")),
        "user_id", "tsu")
      .orderBy("user_id", "start_bucket")

  /** Per-type inter-event gap deciles ([[TimeJoins.gapDeciles]]):
    * nine exact decile silences preceding each event type, over the
    * compressed (type, gap) histogram.
    */
  def eventsGapDeciles(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.gapDeciles(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu"),
            col("event_id"), col("event_type")),
        "user_id", "tsu", "event_id", "event_type")
      .orderBy("etype", "decile")

  /** Naive-split near-dup leakage audit ([[CorpusOps.splitLeakage]]
    * at the family LSH parameters, riding the shared candidate front
    * end): (split_a, split_b) pair cells with the leaked flag and ppm
    * share — the contamination measurement that motivates t78's
    * cluster-aware splits.
    */
  def docSplitLeakage(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.splitLeakage(Tables.documents(spark, dir), "doc_id", "text",
        candOpt = Some(sharedLshCandidates(spark, dir)))
      .orderBy("split_a", "split_b")

  /** Exact token-budget sharding ([[CorpusOps.tokenBudgetShards]],
    * 8192-token shards): the two-phase exact global prefix sum —
    * per-doc cumulative tokens, shard id, in-shard offset, and the
    * boundary-spanning flag a sequence packer consumes.
    */
  def docTokenShards(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.tokenBudgetShards(Tables.documents(spark, dir), "doc_id",
        "text", budget = 8192L)
      .orderBy("doc_id")

  /** Purged walk-forward time split ([[TimeJoins.purgedTimeSplit]],
    * 70/15/15 with a 6-hour embargo after each cut): the temporal
    * leakage-safe split for autocorrelated event streams.
    */
  def eventsTimeSplit(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.purgedTimeSplit(
        Tables.eventsNanos(spark, dir)
          .select(col("event_id"), expr("ts div 1000").as("tsu")),
        "event_id", "tsu", trainPct = 70, valPct = 15,
        embargoUs = 6L * 3600L * 1000000L)
      .orderBy("event_id")

  /** Persisted Bloom decontamination registry under the oracle gate
    * ([[CorpusOps.buildBloomRegistry]] → [[CorpusOps.ingestBloomBatch]]
    * → [[CorpusOps.decontaminateFromRegistry]]): register a third of
    * the benchmark split, ingest the rest, decontaminate the training
    * split against the frozen registry — bitwise-OR mergeability makes
    * the one-shot t56-shape oracle exact.
    */
  def docBloomPersisted(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val path = sessionIndexPath(spark, "t158_bloom", dir) { p =>
      CorpusOps.buildBloomRegistry(bench.filter(col("doc_id") % 3 === 0),
        "text", p, DecontamN)
      CorpusOps.ingestBloomBatch(spark, p,
        bench.filter(col("doc_id") % 3 =!= 0), "text")
    }
    CorpusOps.decontaminateFromRegistry(spark, path,
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Bloom-registry health gauge ([[CorpusOps.bloomRegistryStats]]):
    * fill ratio and expected FP rate of the t158 registry, one row,
    * exact ppm — the resize/rebuild trigger.
    */
  def docBloomStats(spark: SparkSession, dir: String): DataFrame = {
    // same memo key + build lambda as t158: whichever query runs
    // first builds the store, both read the one artifact
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    val path = sessionIndexPath(spark, "t158_bloom", dir) { p =>
      CorpusOps.buildBloomRegistry(bench.filter(col("doc_id") % 3 === 0),
        "text", p, DecontamN)
      CorpusOps.ingestBloomBatch(spark, p,
        bench.filter(col("doc_id") % 3 =!= 0), "text")
    }
    CorpusOps.bloomRegistryStats(spark, path)
  }

  /** Language-metadata agreement matrix ([[CorpusOps.langAgreement]]):
    * the declared `lang` column vs the n-gram prediction, cell-exact
    * — the metadata-trust audit.
    */
  def docLangAgreement(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.langAgreement(Tables.documents(spark, dir), "text", "lang")
      .orderBy("declared", "predicted")

  /** Effective token budget per source after dedup
    * ([[CorpusOps.effectiveTokens]], shared canonical election): the
    * mixture designer's real per-source budget in tokens.
    */
  def docEffectiveTokens(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.effectiveTokens(Tables.documents(spark, dir), "doc_id",
        "text", "source", sharedCanonical(spark, dir))
      .orderBy("source")

  /** Behavioral drift report ([[TimeJoins.behaviorDrift]]): the two
    * time halves' transition matrices, cell-for-cell, with exact ppm
    * deviations — the next-event-model invalidation alarm.
    */
  def eventsBehaviorDrift(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.behaviorDrift(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu"),
            col("event_id"), col("event_type")),
        "user_id", "tsu", "event_id", "event_type")
      .orderBy("from_type", "to_type")

  /** Semantic split-leakage audit ([[CorpusOps.semanticSplitLeakage]],
    * cosine ≥ 0.4 under the auto-sized sign-LSH buckets): paraphrase
    * contamination of a cluster-blind split — the embedding twin of
    * t137's text audit.
    */
  def embSplitLeakage(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.semanticSplitLeakage(Tables.embeddings(spark, dir),
        "vec_id", "embedding", threshold = 0.4)
      .orderBy("split_a", "split_b")

  /** IVF index-staleness report ([[Similarity.ivfStalenessReport]]):
    * build the IVF-PQ index over a tenth of the corpus (quantizer
    * frozen at that snapshot), then measure the FULL corpus's drift
    * from it per cell — the rebuild-trigger relation. The oracle
    * replays the Lloyd training over the index split and both
    * assignments under the frozen centroids.
    */
  def embIvfStaleness(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val path = sessionIndexPath(spark, "t153_ivf", dir) { p =>
      Similarity.buildIvfPqIndex(emb.filter(col("vec_id") % 10 === 0),
        "vec_id", "embedding", p, minNlist = 16, m = 4, ksub = 16)
    }
    Similarity.ivfStalenessReport(spark, path, emb, "vec_id", "embedding")
      .orderBy("cell")
  }

  /** Persisted quantile-map lifecycle under the oracle gate
    * ([[CorpusOps.fitQuantileMap]] → [[CorpusOps.ingestQuantileBatch]]
    * → [[CorpusOps.percentileFromMap]]): fit the n_chars reference
    * CDF on a third of the corpus, ingest the rest, transform EVERY
    * document against the frozen map — histogram additivity makes the
    * one-shot full-corpus oracle exact.
    */
  def docQuantilePersisted(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val path = sessionIndexPath(spark, "t152_qmap", dir) { p =>
      CorpusOps.fitQuantileMap(docs.filter(col("doc_id") % 3 === 0),
        "n_chars", p)
      CorpusOps.ingestQuantileBatch(spark, p,
        docs.filter(col("doc_id") % 3 =!= 0), "n_chars")
    }
    CorpusOps.percentileFromMap(spark, path, docs, "doc_id", "n_chars")
      .orderBy("doc_id")
  }

  /** LSH parameter tuning curve ([[Dedup.lshParameterCurve]],
    * 64 perms banded 4/8/16 ways at threshold 0.5): candidate cost,
    * verified yield, precision, and relative recall per band choice —
    * the evidence table behind the family's bands=16 default.
    */
  def docLshCurve(spark: SparkSession, dir: String): DataFrame =
    Dedup.lshParameterCurve(Tables.documents(spark, dir), "doc_id",
        "text")
      .orderBy("bands")

  /** ANN recall audit ([[Similarity.annRecallAudit]], k = 3,
    * probeMod = 7): recall@k of the production sign-LSH path vs the
    * exact top-k on a deterministic hash-picked probe set — the
    * recall-SLO relation, oracle-gated end to end.
    */
  def embRecallAudit(spark: SparkSession, dir: String): DataFrame =
    Similarity.annRecallAuditAuto(Tables.embeddings(spark, dir), "vec_id",
        "embedding", k = 3, probeTarget = 70L)
      .orderBy("vec_id")

  /** Persisted KMV sketch-store lifecycle under the oracle gate
    * ([[CorpusOps.buildKmvStore]] → [[CorpusOps.ingestKmvBatch]] →
    * [[CorpusOps.kmvOverlapFromStore]]): build the per-source store
    * over a third of the corpus, ingest the rest as a batch, answer
    * the overlap matrix FROM THE STORE — KMV's exact merge law means
    * the one-shot full-corpus oracle gates the split-built store
    * bit-for-bit.
    */
  def docKmvPersisted(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val path = sessionIndexPath(spark, "t148_kmv", dir) { p =>
      CorpusOps.buildKmvStore(docs.filter(col("doc_id") % 3 === 0),
        "text", "source", p, n = 3, k = 64)
      CorpusOps.ingestKmvBatch(spark, p,
        docs.filter(col("doc_id") % 3 =!= 0), "text", "source")
    }
    CorpusOps.kmvOverlapFromStore(spark, path)
      .orderBy("source_a", "source_b")
  }

  /** RFM user segmentation ([[TimeJoins.rfmSegments]]): exact
    * recency/frequency/monetary quartile bins from compressed
    * histograms and one broadcast threshold row — the behavioral
    * stratification grid.
    */
  def eventsRfm(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.rfmSegments(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu"),
            col("value")),
        "user_id", "tsu", "value")
      .orderBy("user_id")

  /** Distinctive terms per source ([[CorpusOps.keynessTerms]],
    * minCount 3, top-5): tokens ranked by integer-exact lift against
    * the rest of the corpus — the terms that CAUSE t102's divergence.
    */
  def docKeyness(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.keynessTerms(Tables.documents(spark, dir), "text",
        "source", minCount = 3L, k = 5)
      .orderBy("source", "rank")

  /** Embedding class-scatter audit ([[Similarity.classScatter]]):
    * within- vs between-label mean squared distance over
    * unit-normalized vectors — the "does the embedding see the
    * labels" read, exact from integer-scaled components.
    */
  def embClassScatter(spark: SparkSession, dir: String): DataFrame =
    Similarity.classScatter(Tables.embeddings(spark, dir), "vec_id",
        "embedding", "label")
      .orderBy("label_a", "label_b")

  /** Margin mining over IVF candidates
    * ([[Similarity.marginMutualPairsIvf]], k = 4, shared full-corpus
    * quantizer, nprobe = 2) — the scale path of t91: cross-side
    * candidates come from probed IVF cells, never the |A|×|B| cross
    * join. The oracle replays the Lloyd quantizer, probe routing,
    * cross-side cell meetings, candidate ranks, and the margin tail.
    */
  def embMarginPairsIvf(spark: SparkSession, dir: String): DataFrame =
    Similarity.marginMutualPairsIvf(Tables.embeddings(spark, dir),
        "vec_id", "embedding", col("label") % 2 === 0, k = 4,
        minNlist = 16, nprobe = 2,
        centroidsOpt = Some(fullCorpusCentroids(spark, dir)))
      .orderBy("a_id")

  /** SFT chat-template rendering with loss-mask spans
    * ([[CorpusOps.sftChatRender]]): each (user, 30-min session) of
    * the events stream becomes one training example — turns rendered
    * `<|role|>type:cents<|end|>` in time order, with the character
    * spans of the assistant turns' content as the loss mask.
    * view/click are the `user` role; everything else is `assistant`.
    */
  def eventsSftRender(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.sftChatRender(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu"),
            col("event_id"), col("event_type"), col("value")),
        "user_id", "tsu", "event_id", "event_type", "value",
        userRoles = Seq("view", "click"))
      .orderBy("user_id", "session_id")

  /** Preference-pair export ([[CorpusOps.preferencePairs]], t45's
    * frozen classifier score, groups = (lang, source), 8 pairs per
    * group, gap ≥ 1): the i-th best vs i-th worst scored document of
    * each stratum — DPO / reward-model training pairs.
    */
  def docPreferencePairs(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = CorpusOps.hashedLinearScore(docs, "doc_id", "text",
        ClassifierWeights, bias = 0L, threshold = 0L)
      .select("doc_id", "score")
      .join(docs.select("doc_id", "lang", "source"), "doc_id")
    CorpusOps.preferencePairs(scored, "doc_id", "score",
        Seq("lang", "source"), maxPairs = 8, minGap = 1L)
      .orderBy("lang", "source", "pair_no")
  }

  /** Tokenizer fertility report ([[CorpusOps.tokenizerFertility]],
    * the frozen [[graft.functions.Bpe]] merge table, groups =
    * (lang, source)): words, real BPE tokens, chars, and the
    * fertility / compression ppm ratios per stratum.
    */
  def docTokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.tokenizerFertility(Tables.documents(spark, dir), "text",
        Seq("lang", "source"))
      .orderBy("lang", "source")

  /** Per-source score percentiles ([[CorpusOps.scorePercentiles]],
    * t45's frozen classifier score, groups = source): the
    * cross-source-comparable quality rank each document's raw score
    * maps to within its own source.
    */
  def docScorePercentiles(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val scored = CorpusOps.hashedLinearScore(docs, "doc_id", "text",
        ClassifierWeights, bias = 0L, threshold = 0L)
      .select("doc_id", "score")
      .join(docs.select("doc_id", "source"), "doc_id")
    CorpusOps.scorePercentiles(scored, "doc_id", "score", Seq("source"))
      .orderBy("doc_id")
  }

  /** Trigram stupid-backoff scoring
    * ([[CorpusOps.trigramBackoffScore]], reference = the `lang='en'`
    * slice, α = 2/5 exact): every document's mean per-position
    * backoff probability under the reference trigram model —
    * documents outside the reference language genuinely back off.
    */
  def docTrigramBackoff(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.trigramBackoffScore(Tables.documents(spark, dir),
        "doc_id", "text", col("lang") === "en")
      .orderBy("doc_id")

  /** Gopher-rule quality gate ([[CorpusOps.gopherRules]]): the
    * published heuristic bundle, word-level subset, one boolean per
    * rule plus the conjunction.
    */
  def docGopherRules(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.gopherRules(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Exact-phrase decontamination
    * ([[CorpusOps.exactPhraseDecontaminate]], 8-word probes) against
    * a FIXED canary registry — the t158 discipline stated at the
    * gate: benchmarks are a fixed artifact (doc_id % 10 == 0 capped
    * at id < 5000), so the probe list STOPS GROWING with the corpus
    * and the operator's cost is |canaries|·n — linear in the
    * training side, which is the only side that scales. (The earlier
    * fixture-coupled gate derived probes from the corpus split
    * itself, so the 10× bench read superlinear for a linear
    * operator — the t149 lesson, fixed here at the gate.)
    */
  def docExactDecontam(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    CorpusOps.exactPhraseDecontaminate(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0 && col("doc_id") < 5000),
        "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Mutual-k-NN semantic clusters
    * ([[Similarity.mutualKnnClusters]], k = 3, shared trained
    * centroids): every vector labeled with its mutual-graph component
    * and the component size.
    */
  def embMutualKnnClusters(spark: SparkSession, dir: String): DataFrame =
    Similarity.mutualKnnClusters(Tables.embeddings(spark, dir), "vec_id",
        "embedding", k = 3, minNlist = 16, nprobe = 2,
        centroidsOpt = Some(fullCorpusCentroids(spark, dir)))
      .orderBy("vec_id")

  /** Edit-distance dedup tier ([[Dedup.editDistanceDedup]], t06's
    * LSH parameters, dup at ≤ 5% of the longer text): exact
    * Levenshtein over the band-collision candidates.
    */
  def docEditDistanceDedup(spark: SparkSession, dir: String): DataFrame =
    Dedup.editDistanceDedup(Tables.documents(spark, dir), "doc_id", "text",
        candOpt = Some(sharedLshCandidates(spark, dir)))
      .orderBy("id_a", "id_b")

  /** Asymmetric containment pairs ([[Dedup.containmentPairs]], t06's
    * LSH parameters, containment ≥ 0.8 in either direction): the
    * short-quoted-inside-long duplication symmetric Jaccard misses.
    */
  def docContainmentPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables.documents(spark, dir), "doc_id", "text",
        candOpt = Some(sharedLshCandidates(spark, dir)))
      .orderBy("id_a", "id_b")

  /** Source-divergence map ([[CorpusOps.sourceDivergence]]): pairwise
    * L1 distance between source unigram distributions, ppm fixed
    * point — the redundancy matrix of the corpus mixture.
    */
  def docSourceDivergence(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.sourceDivergence(Tables.documents(spark, dir), "text",
        "source")
      .orderBy("source_a", "source_b")

  /** Hamilton eval-set apportionment ([[CorpusOps.hamiltonEvalSet]],
    * strata = lang|source, budget 200): an exactly-200-doc eval set
    * matching corpus proportions by largest remainders, selections by
    * the shared deterministic id-hash.
    */
  def docHamiltonEvalSet(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.hamiltonEvalSet(
        Tables.documents(spark, dir)
          .withColumn("stratum",
            concat_ws("|", col("lang"), col("source"))),
        "doc_id", "stratum", totalN = 200)
      .orderBy("doc_id")

  /** T5 span-corruption examples ([[CorpusOps.spanCorruption]],
    * 15% token mask rate): sentinel-masked inputs and span targets,
    * byte-identical across re-runs.
    */
  def docSpanCorruption(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.spanCorruption(Tables.documents(spark, dir), "doc_id",
        "text", ratePct = 15)
      .orderBy("doc_id")

  /** NSP segment pairs ([[CorpusOps.segmentPairs]], 32-token
    * segments, 64 negative buckets): true-next vs deterministic
    * pseudo-random partner per anchor segment.
    */
  def docSegmentPairs(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.segmentPairs(Tables.documents(spark, dir), "doc_id",
        "text", chunk = 32, negBuckets = 64)
      .orderBy("doc_id", "seg_no")

  /** Point-in-time features ([[TimeJoins.pointInTimeFeatures]],
    * target = purchase): per event, the user's strictly-earlier
    * event count, purchase count, value sum, and gap — leakage-safe
    * by the 1-PRECEDING frame.
    */
  def eventsPitFeatures(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.pointInTimeFeatures(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu"),
            col("event_id"), col("event_type"), col("value")),
        "user_id", "tsu", "event_id", "event_type", "value",
        targetType = "purchase")
      .orderBy("event_id")

  /** Next-event prediction pairs ([[TimeJoins.nextEventPairs]]): the
    * true next event type plus one deterministic hash-drawn negative
    * from the type catalog, per event with a successor.
    */
  def eventsNextPairs(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.nextEventPairs(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu"),
            col("event_id"), col("event_type")),
        "user_id", "tsu", "event_id", "event_type")
      .orderBy("event_id")

  /** Vocabulary coverage curve ([[CorpusOps.coverageCurve]], word
    * bigrams): distinct-gram coverage at nested 10%…100% hash
    * samples — the diminishing-returns read.
    */
  def docCoverageCurve(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.coverageCurve(Tables.documents(spark, dir), "doc_id",
        "text", n = 2)
      .orderBy("pct")

  /** Multi-probe sign-LSH top-k ([[Similarity.lshTopKMultiProbe]],
    * 8 planes, probes = own bucket + every 1-bit flip): the standard
    * recall-raiser at the t09 plan shape.
    */
  def annLshMultiProbe(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshTopKMultiProbe(Tables.embeddings(spark, dir), "vec_id",
        "embedding", k = 3, planes = 8)
      .orderBy("vec_id", "rank")

  /** Group-k-fold CV assignment ([[CorpusOps.groupKFold]], k = 5,
    * shared components): near-dup clusters rotate between folds
    * wholesale.
    */
  def docGroupKFold(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.groupKFold(Tables.documents(spark, dir), "doc_id", "text",
        k = 5, compOpt = Some(sharedComponents(spark, dir)))
      .select(col("doc_id"), col("group_key"), col("fold"))
      .orderBy("doc_id")

  /** Ordered funnel ([[TimeJoins.funnel]], signup → view → purchase,
    * first-touch, each stage within 24 HOURS of the previous):
    * per-stage reach and conversion ppm.
    */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame =
    TimeJoins.funnel(
        Tables.eventsNanos(spark, dir)
          .select(col("user_id"), expr("ts div 1000").as("tsu"),
            col("event_type")),
        "user_id", "tsu", "event_type",
        stages = Seq("signup", "view", "purchase"),
        maxGapUs = 86400L * 1000000L)
      .orderBy("stage_no")

  /** Winnow-store health gauge ([[Dedup.winnowIndexStats]]) over the
    * SAME persisted index t134 searches (shared memo): bucket fill,
    * hottest-bucket skew, reclaimable duplicate mass — the gauge
    * family's winnow member.
    */
  def docWinnowStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val path = sessionIndexPath(spark, "t134_winnow", dir) { p =>
      Dedup.buildWinnowIndex(docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", p)
    }
    Dedup.winnowIndexStats(spark, path)
  }

  /** Sampled winnow-store gauge ([[Dedup.winnowIndexStatsSampled]])
    * over the SAME persisted store t134/t165 share (session memo), at
    * the fixed 16-bucket budget — the winnow member of the sampled
    * gauge family t168 opened.
    */
  def docWinnowStatsSampled(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val path = sessionIndexPath(spark, "t134_winnow", dir) { p =>
      Dedup.buildWinnowIndex(docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", p)
    }
    Dedup.winnowIndexStatsSampled(spark, path, k = 16)
  }

  /** KMV-store health gauge ([[CorpusOps.kmvStoreStats]]) over the
    * SAME split-built store t148 answers from (shared memo): group
    * counts, exact-vs-estimated split at k, duplicate and reclaimable
    * row mass — the gauge family's sketch member.
    */
  def docKmvStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val path = sessionIndexPath(spark, "t148_kmv", dir) { p =>
      CorpusOps.buildKmvStore(docs.filter(col("doc_id") % 3 === 0),
        "text", "source", p, n = 3, k = 64)
      CorpusOps.ingestKmvBatch(spark, p,
        docs.filter(col("doc_id") % 3 =!= 0), "text", "source")
    }
    CorpusOps.kmvStoreStats(spark, path)
  }

  /** Inverted-index health gauge ([[CorpusOps.invertedIndexStats]])
    * over the SAME persisted postings store t66/t68/t69 search
    * (shared memo): term-hash bucket skew and the duplicate posting
    * mass that would double-count tf — the retrieval member of the
    * gauge family. The oracle replays the fnv64 bucket arithmetic
    * verbatim (FNV-1a in HUGEINT mod-2^64 steps; fixture text is
    * ASCII so byte-wise and codepoint-wise folds coincide, checked).
    */
  def docInvIndexStats(spark: SparkSession, dir: String): DataFrame = {
    val path = sessionIndexPath(spark, "t66_invidx", dir) { p =>
      CorpusOps.buildInvertedIndex(Tables.documents(spark, dir), "doc_id",
        "text", p)
    }
    CorpusOps.invertedIndexStats(spark, path)
  }

  /** Sampled inverted-index gauge
    * ([[CorpusOps.invertedIndexStatsSampled]]) over the SAME t66/t167
    * postings store (session memo), at the fixed 16-bucket budget —
    * completes the sampled family across every linear-scan store
    * gauge (band t168, winnow t170, postings t171).
    */
  def docInvIndexStatsSampled(spark: SparkSession, dir: String): DataFrame = {
    val path = sessionIndexPath(spark, "t66_invidx", dir) { p =>
      CorpusOps.buildInvertedIndex(Tables.documents(spark, dir), "doc_id",
        "text", p)
    }
    CorpusOps.invertedIndexStatsSampled(spark, path, k = 16)
  }

  /** Quantile-map staleness gauge ([[CorpusOps.quantileMapDrift]])
    * over the SAME t152 store (shared memo): the exact KS distance in
    * ppm between the frozen reference CDF and a deterministically
    * jittered current batch (score + doc_id % 7 — real drift at every
    * scale). The refit trigger completing the gauge family on the
    * calibration store.
    */
  def docQuantileDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val path = sessionIndexPath(spark, "t152_qmap", dir) { p =>
      CorpusOps.fitQuantileMap(docs.filter(col("doc_id") % 3 === 0),
        "n_chars", p)
      CorpusOps.ingestQuantileBatch(spark, p,
        docs.filter(col("doc_id") % 3 =!= 0), "n_chars")
    }
    CorpusOps.quantileMapDrift(spark, path,
      docs.select(col("doc_id"),
        (col("n_chars") + col("doc_id") % 7).as("n_chars")), "n_chars")
  }

  /** Per-source quality drift (t172,
    * [[CorpusOps.quantileMapDriftBySource]]): the t164 KS gauge
    * split by source against the SAME calibration store (the
    * t152/t164 session memo), with the same deterministically
    * perturbed batch — the per-source verdict an operator acts on
    * when one feed drifts while the corpus stays green.
    */
  def docSourceQualityDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val path = sessionIndexPath(spark, "t152_qmap", dir) { p =>
      CorpusOps.fitQuantileMap(docs.filter(col("doc_id") % 3 === 0),
        "n_chars", p)
      CorpusOps.ingestQuantileBatch(spark, p,
        docs.filter(col("doc_id") % 3 =!= 0), "n_chars")
    }
    CorpusOps.quantileMapDriftBySource(spark, path,
      docs.select(col("source"),
        (col("n_chars") + col("doc_id") % 7).as("n_chars")),
      "n_chars", "source")
  }

  /** Line-frequency boilerplate strip (t173,
    * [[CorpusOps.stripBoilerplateLines]]) over the t161 five-doc
    * page face with lines in doc_id order plus a constant footer
    * line appended to EVERY page — the footer guarantees stripped
    * mass at every scale, the fixture's exact-dup texts exercise the
    * data-driven census, and unique texts realize kept mass.
    */
  def docLineBoilerplate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val pages = docs
      .groupBy(expr("doc_id div 5").as("gid"))
      .agg(concat(
        array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          x => x.getField("text")), "\n"),
        lit("\n(c) corpus footer")).as("text"))
    CorpusOps.stripBoilerplateLines(pages, "gid", "text", minDocs = 2)
  }

  /** Band-store health gauge ([[Dedup.bandIndexStats]]) over the SAME
    * persisted index t143 searches (shared memo — whichever query
    * runs first builds the one artifact): bucket fill, hottest-bucket
    * skew vs uniform, and the duplicate-row mass compaction would
    * reclaim. Completes the staleness-gauge family (t153 IVF drift,
    * t159 Bloom fill, now band-bucket skew).
    */
  def docBandStats(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val path = sessionIndexPath(spark, "t143_band", dir) { p =>
      Dedup.buildBandIndex(docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", p)
    }
    Dedup.bandIndexStats(spark, path)
  }

  /** SAMPLED band-store gauge ([[Dedup.bandIndexStatsSampled]]) over
    * the SAME persisted store t143/t162 share (session memo), at a
    * fixed 16-bucket budget (stride 4 over the 64-bucket default):
    * the incremental/sampled mode of the r13 gauge family — exact
    * lower bounds over the sampled buckets plus stride-scaled
    * estimators, so a store owner alarms at a fixed read budget while
    * the store (and its bucket count, post-[[Dedup.rebucketBandIndex]])
    * grows.
    */
  def docBandStatsSampled(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val path = sessionIndexPath(spark, "t143_band", dir) { p =>
      Dedup.buildBandIndex(docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", p)
    }
    Dedup.bandIndexStatsSampled(spark, path, k = 16)
  }

  /** Line-level Gopher rules ([[CorpusOps.gopherLineRules]]) over a
    * rendered multi-line face (the t92 move: fixture text is
    * single-line, so groups of five documents render as one
    * five-line page — bullet-prefixed unless doc_id % 7 == 0,
    * ellipsis-suffixed when doc_id % 4 == 0, chosen so BOTH rules
    * realize both verdicts at every scale). Line-fraction rules are
    * order-invariant, so the unordered collect is semantics-free.
    */
  def docGopherLines(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val rendered = docs.select(expr("doc_id div 5").as("gid"),
        concat(
          when(col("doc_id") % 7 =!= 0, lit("- ")).otherwise(lit("")),
          col("text"),
          when(col("doc_id") % 4 === 0, lit("...")).otherwise(lit("")))
          .as("line"))
      .groupBy("gid")
      .agg(concat_ws("\n", collect_list(col("line"))).as("text"))
    CorpusOps.gopherLineRules(rendered, "gid", "text").orderBy("gid")
  }

  /** 2-D (source × quality-bin) token-budget allocation
    * ([[CorpusOps.mixtureBudgetCellsBy]], 10 ppm bins, per-source
    * divisors (srcN % 4) + 2 so every scale factor exercises
    * full/partial/none cells): the joint mixture design t39 and t37
    * each did one axis of. Ordered down each source's bin ladder —
    * the fill order itself. The divisor is DERIVED from the source
    * name — the same CAST(SUBSTR(source, 4)) % 4 + 2 arithmetic the
    * oracle replays — so any fixture source universe matches and a
    * non-`srcN` name fails loudly in both engines instead of being
    * silently dropped from the mixture.
    */
  def docMixtureBudget(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.mixtureBudgetCellsBy(Tables.documents(spark, dir), "text",
        "source",
        divisor = expr("CAST(SUBSTR(source, 4) AS BIGINT)") % 4 + 2)
      .orderBy(col("source"), col("bin").desc)

  /** Deterministic per-source holdout refresh
    * ([[CorpusOps.holdoutRefresh]], epochs 1 → 2, 200 seats): the
    * eval-slice rotation under t103's fixed Hamilton budget with the
    * t78 leakage guard (only cluster-singleton docs are eligible —
    * rides the session component memo). Per source, admitted ==
    * evicted exactly; re-running an epoch reproduces its holdout
    * bit-for-bit.
    */
  def docHoldoutRefresh(spark: SparkSession, dir: String): DataFrame =
    CorpusOps.holdoutRefresh(Tables.documents(spark, dir), "doc_id",
        "source", sharedComponents(spark, dir), "node", totalN = 200,
        prevEpoch = 1L, epoch = 2L)
      .orderBy("doc_id")

  /** SCD2 snapshot merge ([[graft.operators.Scd2]] — the dbt
    * `snapshot` materialization's dataflow, timestamp strategy with
    * hard-delete invalidation) replayed over two deterministic
    * extracts of the orders table: extract 1 sees keys with
    * id % 4 != 3; extract 2 sees every key except the hard-deleted
    * id % 11 == 7 slice, with the id % 5 == 0 slice UPDATED (status
    * 'X', updated_at + 30 days). The merged snapshot carries closed
    * validity windows for the updated keys, an open second version,
    * open never-touched rows, delete-stamped vanished keys, and
    * fresh inserts for the extract-2-only keys — every SCD2 merge
    * branch exercised in one relation, md5 scd_ids checked hex-exact.
    */
  def ordersScd2(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.orders(spark, dir).select(
      col("o_orderkey").as("id"),
      col("o_orderstatus").as("status"),
      datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
        .as("updated_at"))
    val b1 = src.filter(col("id") % 4 =!= 3)
    val upd = col("id") % 5 === 0
    val b2 = src.filter(col("id") % 11 =!= 7)
      .withColumn("status", when(upd, lit("X")).otherwise(col("status")))
      .withColumn("updated_at",
        when(upd, col("updated_at") + 30).otherwise(col("updated_at")))
    // NOT pinned: the merge consumes `snap` three times (current rows
    // twice + history) and re-runs the snapshot build per consumer,
    // but an r16 A/B of localCheckpoint-pinning snap1 measured
    // neutral at sf0.1 (2.37 pinned vs 2.41 unpinned, same-window
    // noise) — the eager materialization costs what the page-cached
    // re-reads save. At 100 TB the first snapshot is a materialized
    // TABLE, so the re-read is a column-pruned scan there, not a
    // recompute.
    val snap1 = graft.operators.Scd2.firstSnapshotTimestamp(b1, "id", "updated_at")
    graft.operators.Scd2.snapshotMergeTimestamp(snap1, b2, "id", "updated_at",
        invalidateHardDeletes = true, deleteStamp = Some(lit(30000L)))
      .orderBy("id", "dbt_valid_from")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t01_text_stats" -> docTextStats _,
    "t02_lang_id" -> docLangId _,
    "t03_fingerprint" -> docFingerprint _,
    "t04_dedup_exact" -> dedupExact _,
    "t05_dedup_jaccard" -> dedupJaccard _,
    "t06_dedup_minhash" -> dedupMinhash _,
    "t07_dedup_simhash" -> dedupSimhash _,
    "t08_ann_brute_topk" -> annBruteTopK _,
    "t09_ann_lsh_topk" -> annLshTopK _,
    "t10_emb_near_dup" -> embNearDup _,
    "t11_multimodal_meta" -> multimodalMeta _,
    "t12_events_json" -> eventsJson _,
    "t13_emb_near_dup_lsh" -> embNearDupLsh _,
    "t14_token_counts" -> docTokenCounts _,
    "t15_bpe_real" -> docBpeReal _,
    "t16_ann_ivf_topk" -> annIvfTopK _,
    "t17_repetition" -> docRepetition _,
    "t18_pii_redact" -> docPiiRedact _,
    "t19_decontam" -> docDecontam _,
    "t20_sample_stratified" -> docSampleStratified _,
    "t21_seq_pack" -> docSeqPack _,
    "t22_vocab_ngrams" -> docVocabNgrams _,
    "t23_chunking" -> docChunking _,
    "t24_dup_clusters" -> dedupClusters _,
    "t25_kmv_sketch" -> docKmvSketch _,
    "t26_span_dedup" -> docSpanDedup _,
    "t44_span_rewrite" -> docSpanRewrite _,
    "t45_classifier_score" -> docClassifierScore _,
    "t27_mix_sample" -> docMixSample _,
    "t28_tfidf_terms" -> docTfidf _,
    "t29_unigram_quality" -> docUnigramQuality _,
    "t30_bm25_topk" -> docBm25 _,
    "t31_split_shuffle" -> docSplits _,
    "t32_pq_encode" -> annPqEncode _,
    "t33_pq_adc_topk" -> annPqAdc _,
    "t34_bpe_train" -> docBpeTrain _,
    "t35_audio_decode" -> docAudioDecode _,
    "t36_mp4_frames" -> docMp4Frames _,
    "t37_quality_prune" -> docQualityPrune _,
    "t38_incremental_dedup" -> docIncrementalDedup _,
    "t39_token_budget" -> docTokenBudget _,
    "t40_sem_dedup" -> docSemDedup _,
    "t41_proto_sample" -> docProtoSample _,
    "t42_canonical" -> docCanonical _,
    "t43_incr_sem_dedup" -> docIncrementalSemDedup _,
    "t46_importance_weight" -> docImportanceWeight _,
    "t47_sq_encode" -> annSqEncode _,
    "t48_sq_topk" -> annSqTopK _,
    "t49_image_phash" -> docImagePhash _,
    "t50_image_phash_dedup" -> docImagePhashDedup _,
    "t51_video_keyframe_dedup" -> docVideoKeyframeDedup _,
    "t52_incr_image_dedup" -> docIncrementalImageDedup _,
    "t53_audio_fp_dedup" -> docAudioFpDedup _,
    "t54_hll_sketch" -> docHllSketch _,
    "t55_kmv_setops" -> docKmvSetOps _,
    "t56_bloom_decontam" -> docBloomDecontam _,
    "t57_crossmodal_dedup" -> docCrossModalDedup _,
    "t58_curriculum_order" -> docCurriculumOrder _,
    "t59_ann_ivfpq_topk" -> annIvfPq _,
    "t60_perceptron_train" -> docPerceptronTrain _,
    "t61_cm_sketch" -> docCmSketch _,
    "t62_corpus_report" -> docCorpusReport _,
    "t63_ann_ivfpq_persisted" -> annIvfPqPersisted _,
    "t64_video_pixel_dedup" -> docVideoPixelDedup _,
    "t65_dup_ranges" -> docDupRanges _,
    "t66_bm25_index" -> docBm25Index _,
    "t67_ann_ivfpq_rerank" -> annIvfPqRerank _,
    "t68_phrase_search" -> docPhraseSearch _,
    "t69_hybrid_rrf" -> docHybridRetrieval _,
    "t70_domain_pagerank" -> docDomainPageRank _,
    "t71_bigram_quality" -> docBigramQuality _,
    "t72_domain_cap" -> docDomainCap _,
    "t73_ann_binary_topk" -> annBinaryTopK _,
    "t74_sqrt_temperature" -> docSqrtTemperature _,
    "t75_ann_ivfbin_persisted" -> annIvfBinaryPersisted _,
    "t76_dedup_normalized" -> dedupNormalizedExact _,
    "t77_ranking_metrics" -> docRankingMetrics _,
    "t78_leakage_safe_splits" -> docLeakageSafeSplits _,
    "t79_corpus_drift" -> docCorpusDrift _,
    "t80_curation_recipe" -> docCurationRecipe _,
    "t81_split_fractions" -> docSplitFractions _,
    "t82_epoch_upsample" -> docEpochUpsample _,
    "t83_contamination_report" -> docContaminationReport _,
    "t84_interleave_order" -> docInterleaveOrder _,
    "t85_soft_dedup_weights" -> docSoftDedupWeights _,
    "t86_priority_sample" -> docPrioritySample _,
    "t87_packing_report" -> docPackingReport _,
    "t88_length_batches" -> docLengthBatches _,
    "t89_score_calibration" -> docScoreCalibration _,
    "t90_contrastive_pairs" -> docContrastivePairs _,
    "t91_margin_pairs" -> embMarginPairs _,
    "t92_sft_render" -> eventsSftRender _,
    "t93_preference_pairs" -> docPreferencePairs _,
    "t94_tokenizer_fertility" -> docTokenizerFertility _,
    "t95_score_percentiles" -> docScorePercentiles _,
    "t96_trigram_backoff" -> docTrigramBackoff _,
    "t97_gopher_rules" -> docGopherRules _,
    "t98_exact_decontam" -> docExactDecontam _,
    "t99_semantic_clusters" -> embMutualKnnClusters _,
    "t100_edit_dedup" -> docEditDistanceDedup _,
    "t101_containment" -> docContainmentPairs _,
    "t102_source_divergence" -> docSourceDivergence _,
    "t103_hamilton_eval" -> docHamiltonEvalSet _,
    "t104_span_corruption" -> docSpanCorruption _,
    "t105_segment_pairs" -> docSegmentPairs _,
    "t106_pit_features" -> eventsPitFeatures _,
    "t107_next_event_pairs" -> eventsNextPairs _,
    "t108_coverage_curve" -> docCoverageCurve _,
    "t109_ann_multiprobe" -> annLshMultiProbe _,
    "t110_group_kfold" -> docGroupKFold _,
    "t111_funnel" -> eventsFunnel _,
    "t112_margin_pairs_ivf" -> embMarginPairsIvf _,
    "t113_winnow_fingerprints" -> docWinnowFingerprints _,
    "t114_winnow_overlap" -> docWinnowOverlap _,
    "t115_source_kmv_overlap" -> docSourceKmvOverlap _,
    "t116_pps_sample" -> docPpsSample _,
    "t117_collocations" -> docCollocations _,
    "t118_quantile_norm" -> docQuantileNorm _,
    "t119_gap_features" -> eventsGapFeatures _,
    "t120_split_source_balance" -> docSplitSourceBalance _,
    "t121_dedup_survivorship" -> docDedupSurvivorship _,
    "t122_freshness_sample" -> eventsFreshnessSample _,
    "t123_behavioral_diversity" -> eventsDiversity _,
    "t124_cluster_histogram" -> docClusterHistogram _,
    "t125_bbit_minhash" -> docBbitMinhash _,
    "t126_winnow_admission" -> docWinnowAdmission _,
    "t127_key_skew" -> eventsKeySkew _,
    "t128_snapshot_diff" -> docSnapshotDiff _,
    "t129_top_tokens" -> docTopTokens _,
    "t130_event_transitions" -> eventsTransitions _,
    "t131_vocab_mass" -> docVocabMass _,
    "t132_circadian" -> eventsCircadian _,
    "t133_session_lift" -> eventsSessionLift _,
    "t134_winnow_persisted" -> docWinnowPersisted _,
    "t135_retention" -> eventsRetention _,
    "t136_session_carryover" -> eventsCarryover _,
    "t137_split_leakage" -> docSplitLeakage _,
    "t138_token_shards" -> docTokenShards _,
    "t139_bursts" -> eventsBursts _,
    "t140_gap_deciles" -> eventsGapDeciles _,
    "t141_source_overlap" -> docSourceOverlap _,
    "t142_attribution" -> eventsAttribution _,
    "t143_band_persisted" -> docBandPersisted _,
    "t144_gram_novelty" -> docGramNovelty _,
    "t145_class_scatter" -> embClassScatter _,
    "t146_keyness" -> docKeyness _,
    "t147_rfm" -> eventsRfm _,
    "t148_kmv_persisted" -> docKmvPersisted _,
    "t149_recall_audit" -> embRecallAudit _,
    "t150_time_split" -> eventsTimeSplit _,
    "t151_lsh_curve" -> docLshCurve _,
    "t152_quantile_persisted" -> docQuantilePersisted _,
    "t153_ivf_staleness" -> embIvfStaleness _,
    "t154_semantic_leakage" -> embSplitLeakage _,
    "t155_behavior_drift" -> eventsBehaviorDrift _,
    "t156_lang_agreement" -> docLangAgreement _,
    "t157_effective_tokens" -> docEffectiveTokens _,
    "t158_bloom_persisted" -> docBloomPersisted _,
    "t159_bloom_stats" -> docBloomStats _,
    "t160_scd2_snapshot" -> ordersScd2 _,
    "t162_band_stats" -> docBandStats _,
    "t161_gopher_lines" -> docGopherLines _,
    "t163_mixture_budget" -> docMixtureBudget _,
    "t164_quantile_drift" -> docQuantileDrift _,
    "t165_winnow_stats" -> docWinnowStats _,
    "t166_kmv_stats" -> docKmvStats _,
    "t167_invidx_stats" -> docInvIndexStats _,
    "t168_band_stats_sampled" -> docBandStatsSampled _,
    "t169_holdout_refresh" -> docHoldoutRefresh _,
    "t170_winnow_stats_sampled" -> docWinnowStatsSampled _,
    "t171_invidx_stats_sampled" -> docInvIndexStatsSampled _,
    "t172_source_quality_drift" -> docSourceQualityDrift _,
    "t173_line_boilerplate" -> docLineBoilerplate _,
  )


  /** Shared DuckDB replay of the KMV group-overlap estimators at
    * sketch size k — the oracle of BOTH t115 (in-query operator)
    * and t148 (persisted sketch store): KMV's exact merge law
    * bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)) makes the
    * one-shot full-corpus SQL gate the split-built store verbatim.
    */
  private def kmvOverlapOracleSql(k: Int): String = {
    val est = (nc: String, uk: String) =>
      s"CASE WHEN $nc < $k THEN $nc ELSE ${(k - 1).toLong * 4294967296L}" +
        s" // GREATEST($uk, 1) END"
    s"""WITH toks AS (
           |  SELECT source, string_split_regex(trim(text), '\\s+') AS ts
           |  FROM documents
           |), g AS (
           |  SELECT source AS grp,
           |    unnest(CASE WHEN len(ts) < 3 THEN CAST([] AS VARCHAR[])
           |    ELSE list_transform(range(1, len(ts) - 1), i ->
           |      ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1]
           |        || ' ' || ts[CAST(i AS INT)+2])
           |    END) AS tk
           |  FROM toks
           |), h AS (
           |  SELECT DISTINCT grp,
           |    (${polyHashSql("tk")} * 2654435761 + 123456789)
           |      % 4294967296 AS h
           |  FROM g
           |), sk AS (
           |  SELECT grp, h FROM (
           |    SELECT grp, h,
           |      ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
           |    FROM h)
           |  WHERE rn <= $k
           |), names AS (
           |  SELECT DISTINCT grp FROM sk
           |), prs AS (
           |  SELECT a.grp AS ga, b.grp AS gb
           |  FROM names a JOIN names b ON a.grp < b.grp
           |), ph AS (
           |  SELECT p.ga, p.gb, s.h,
           |    MAX(CASE WHEN s.grp = p.ga THEN 1 ELSE 0 END) AS in_a,
           |    MAX(CASE WHEN s.grp = p.gb THEN 1 ELSE 0 END) AS in_b
           |  FROM prs p JOIN sk s ON s.grp IN (p.ga, p.gb)
           |  GROUP BY 1, 2, 3
           |), mg AS (
           |  SELECT * FROM (
           |    SELECT ph.*,
           |      ROW_NUMBER() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
           |    FROM ph)
           |  WHERE rn <= $k
           |), su AS (
           |  SELECT ga, gb, CAST(COUNT(*) AS BIGINT) AS n_u, MAX(h) AS uk_u,
           |    CAST(SUM(in_a * in_b) AS BIGINT) AS rho
           |  FROM mg GROUP BY ga, gb
           |), st AS (
           |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_g, MAX(h) AS uk_g
           |  FROM sk GROUP BY grp
           |)
           |SELECT ga AS source_a, gb AS source_b,
           |  CAST($k AS BIGINT) AS k,
           |  CAST(${est("sa.n_g", "sa.uk_g")} AS BIGINT) AS est_a,
           |  CAST(${est("sb.n_g", "sb.uk_g")} AS BIGINT) AS est_b,
           |  CAST(${est("n_u", "uk_u")} AS BIGINT) AS est_union,
           |  rho,
           |  CAST(CASE WHEN n_u < $k THEN rho
           |    ELSE (rho * (${est("n_u", "uk_u")})) // $k END AS BIGINT)
           |    AS est_intersect
           |FROM su JOIN st sa ON sa.grp = su.ga JOIN st sb ON sb.grp = su.gb
           |ORDER BY source_a, source_b""".stripMargin
  }

  /** Shared DuckDB SELECT replaying [[CorpusOps.hashedLinearScore]]
    * with t45's frozen weights, carrying (doc_id, lang, source,
    * score) — the scored relation t93/t95 rank over.
    */
  private def classifierScoredSql: String = {
    val wl = ClassifierWeights.mkString("[", ", ", "]")
    val f = ClassifierWeights.length
    s"""SELECT doc_id, lang, source,
       |    0 + list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(${TextFunctions.Sql.tokens("text")},
       |        t -> list_extract($wl,
       |          CAST((CASE WHEN t = '' THEN 0
       |                ELSE ${TextFunctions.Sql.polyHash("t")} END)
       |            % $f AS INT) + 1))),
       |      (a, b) -> a + b) AS score
       |  FROM documents""".stripMargin
  }

  /** Shared DuckDB CTE fragment: per-doc word-trigram shingle sets,
    * sizes, and exact Jaccard pairs >= `threshold` (CTE `jac`) —
    * matching [[graft.operators.Dedup.shingles]] with n = 3.
    */
  private def jaccardCtes(threshold: Double,
      source: String = "documents"): String =
    s"""toks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts FROM $source
       |), grams AS (
       |  SELECT DISTINCT doc_id, unnest(
       |    CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
       |    ELSE list_transform(range(1, len(ts) - 1), i ->
       |      ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1] || ' ' || ts[CAST(i AS INT)+2])
       |    END) AS g
       |  FROM toks
       |), sizes AS (
       |  SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
       |), p0 AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS nc
       |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), jac AS (
       |  SELECT id_a, id_b,
       |    CAST(nc AS DOUBLE) / CAST(sa.sz + sb.sz - nc AS DOUBLE) AS jaccard
       |  FROM p0
       |  JOIN sizes sa ON id_a = sa.doc_id
       |  JOIN sizes sb ON id_b = sb.doc_id
       |  WHERE CAST(nc AS DOUBLE) / CAST(sa.sz + sb.sz - nc AS DOUBLE) >= $threshold
       |)""".stripMargin

  /** Fully-unrolled batch-perceptron training replay: hashed-count
    * features, zero-init weights, and per round the per-doc BIGINT
    * score join, the y·score ≤ 0 misclassified set, and the
    * per-bucket Σ y·cnt gradient — mirroring
    * [[graft.operators.CorpusOps.perceptronTrain]] round-for-round.
    */
  private def perceptronOracleSql(f: Int, rounds: Int): String = {
    val roundsSql = (1 to rounds).map { r =>
      s"""s$r AS (
         |  SELECT fe.doc_id, fe.y,
         |    CAST(SUM(fe.cnt * w${r - 1}.w) AS BIGINT) AS score
         |  FROM fe JOIN w${r - 1} USING (bucket) GROUP BY 1, 2
         |), m$r AS (
         |  SELECT doc_id FROM s$r WHERE y * score <= 0
         |), w$r AS (
         |  SELECT w${r - 1}.bucket,
         |    w${r - 1}.w + COALESCE(g.gs, 0) AS w
         |  FROM w${r - 1} LEFT JOIN (
         |    SELECT fe.bucket, CAST(SUM(fe.y * fe.cnt) AS BIGINT) AS gs
         |    FROM fe JOIN m$r USING (doc_id) GROUP BY 1) g
         |  ON w${r - 1}.bucket = g.bucket
         |)""".stripMargin
    }.mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
       |    unnest(string_split_regex(trim(text), '\\s+')) AS tk
       |  FROM documents
       |), fe AS (
       |  SELECT doc_id, y, ${polyHashSql("tk")} % $f AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM toks GROUP BY 1, 2, 3
       |), w0 AS (
       |  SELECT CAST(i AS BIGINT) AS bucket, CAST(0 AS BIGINT) AS w
       |  FROM range(0, $f) t(i)
       |), $roundsSql
       |SELECT bucket, w AS weight FROM w$rounds ORDER BY bucket""".stripMargin
  }

  /** DuckDB rendering of the 31-bit PolyHash with the empty-string →
    * 0 convention made explicit (list_reduce errors on empty lists).
    */
  /** Winnowing selection replay (k = 3 trigrams, window `w`):
    * positional gram PolyHashes folded to the rightmost minimum per
    * window — the same fold [[graft.operators.Dedup.winnowFingerprints]]
    * runs as an aggregate lambda (DuckDB's no-init list_reduce seeds
    * with the first element; the engine's MaxLong sentinel is
    * equivalent because the first element always wins against it).
    */
  private def winnowCtes(w: Int): String =
    s"""wt AS (
       |  SELECT doc_id, ${TextFunctions.Sql.tokens("text")} AS ts
       |  FROM documents
       |), wh AS (
       |  SELECT doc_id, list_transform(range(1, len(ts) - 1), i ->
       |    ${TextFunctions.Sql.polyHash(
             "(ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1]" +
             " || ' ' || ts[CAST(i AS INT)+2])")}) AS hs
       |  FROM wt WHERE len(ts) >= 3
       |), wwin AS (
       |  SELECT doc_id, hs, len(hs) AS m,
       |    unnest(range(0, GREATEST(len(hs) - $w, 0) + 1)) AS j
       |  FROM wh
       |), wsel AS (
       |  SELECT DISTINCT doc_id,
       |    list_reduce(list_transform(range(j, LEAST(j + $w - 1, m - 1) + 1),
       |      i -> {'fp': hs[CAST(i + 1 AS INT)], 'pos': CAST(i AS BIGINT)}),
       |      (a, b) -> CASE WHEN b.fp <= a.fp THEN b ELSE a END) AS s
       |  FROM wwin
       |)""".stripMargin

  /** Shared winnow-admission oracle (t126 and t134): the index split
    * (doc_id % 10 == 0) as the fingerprint set, every other doc as
    * the batch, LEFT joins so fingerprint-less docs surface admitted.
    * One oracle gates both engine paths — the in-query relation and
    * the persisted fp-bucketed store — because they answer the same
    * question by contract.
    */
  private def winnowAdmissionSql: String =
    s"""WITH ${winnowCtes(4)}, wf AS (
       |  SELECT DISTINCT doc_id, s.fp AS fp FROM wsel
       |), idxf AS (
       |  SELECT DISTINCT fp FROM wf WHERE doc_id % 10 = 0
       |), bfp AS (
       |  SELECT doc_id, fp FROM wf WHERE doc_id % 10 <> 0
       |), cnt AS (
       |  SELECT bfp.doc_id, CAST(COUNT(*) AS BIGINT) AS n_fps,
       |    CAST(SUM(CASE WHEN i.fp IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_hits
       |  FROM bfp LEFT JOIN idxf i ON bfp.fp = i.fp
       |  GROUP BY bfp.doc_id
       |)
       |SELECT d.doc_id AS batch_id,
       |  COALESCE(n_fps, 0) AS n_fps,
       |  COALESCE(n_hits, 0) AS n_hits,
       |  COALESCE(n_hits, 0) < 2 AS admitted
       |FROM documents d LEFT JOIN cnt USING (doc_id)
       |WHERE d.doc_id % 10 <> 0
       |ORDER BY batch_id""".stripMargin

  private def polyHashSql(c: String): String =
    s"CASE WHEN $c = '' THEN 0 ELSE ${TextFunctions.Sql.polyHash(c)} END"

  /** DuckDB rendering of [[graft.operators.CorpusOps.idMix]] — the
    * full-width deterministic id-hash every sampling / split / cap /
    * ordering oracle replays: both 32-bit lanes of the id, two
    * xor-shift/multiply (0x45d9f3b) rounds with every multiply
    * operand masked to 32 bits first (products < 2^59, BIGINT-safe in
    * both engines), final xor-fold, result in [0, 2^32). Textual
    * expansion only — DuckDB CSEs the repeated sub-terms.
    */
  private def idMixSql(e: String): String = {
    val lo = s"($e & 4294967295)"
    val hi = s"(($e >> 32) & 4294967295)"
    val s0 = s"(xor($lo, 123456789))"
    val h1 = s"(((xor($s0, $s0 >> 16)) * 73244475) & 4294967295)"
    val h2 = s"(xor($h1, $hi))"
    val h3 = s"(((xor($h2, $h2 >> 16)) * 73244475) & 4294967295)"
    s"xor($h3, $h3 >> 16)"
  }

  /** Full-pipeline oracle for the MinHash+LSH path: replays shingle
    * PolyHash, the (a·h + b) mod 2³¹−1 signature permutations (the
    * exact constants from [[graft.functions.MinHashSig.permParams]],
    * interpolated), the per-band polynomial fold key, the candidate
    * band-join, and the exact-Jaccard verify — all in BIGINT-safe SQL,
    * so the gate checks candidate generation itself, not just the
    * verify step, and is fixture-independent.
    */
  private def minhashCtes(numPerms: Int, bands: Int, threshold: Double,
      source: String = "documents"): String = {
    val (pa, pb) = graft.functions.MinHashSig.permParams(numPerms)
    val rows = numPerms / bands
    val perms = (0 until numPerms).map(j => s"($j, ${pa(j)}, ${pb(j)})").mkString(", ")
    s"""${jaccardCtes(threshold, source)}, gh AS (
       |  SELECT doc_id, ${polyHashSql("g")} AS h FROM grams
       |), perms(j, pa, pb) AS (
       |  VALUES $perms
       |), sig AS (
       |  SELECT doc_id, j, MIN((pa * h + pb) % 2147483647) AS v
       |  FROM gh CROSS JOIN perms GROUP BY doc_id, j
       |), bandkey AS (
       |  SELECT doc_id, j // $rows AS band,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT), list(v ORDER BY j)),
       |      (acc, x) -> (acc * 8191 + x) % 2147483647) AS bkey
       |  FROM sig GROUP BY doc_id, band
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bandkey a JOIN bandkey b
       |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |), pairs AS (
       |  SELECT j.id_a, j.id_b, j.jaccard
       |  FROM jac j JOIN cand c ON j.id_a = c.id_a AND j.id_b = c.id_b
       |)""".stripMargin
  }

  private def minhashOracleSql(numPerms: Int, bands: Int, threshold: Double): String =
    s"""WITH ${minhashCtes(numPerms, bands, threshold)}
       |SELECT id_a, id_b, jaccard FROM pairs
       |ORDER BY id_a, id_b""".stripMargin

  /** Incremental-dedup oracle: replay the full MinHash pair set, keep
    * only index(<split)×batch(≥split) edges, resolve exact matches by
    * raw text equality (collision-free stand-in for the engine's
    * sha2 digest join), pick the min index id per batch doc, and
    * classify exact > near > new.
    */
  private def incrementalDedupOracleSql(numPerms: Int, bands: Int,
      threshold: Double): String =
    s"""WITH ${minhashCtes(numPerms, bands, threshold)}, spl AS (
       |  SELECT CAST(COUNT(*) * 4 // 5 AS BIGINT) AS s FROM documents
       |), xm AS (
       |  SELECT b.doc_id AS batch_id, CAST(MIN(a.doc_id) AS BIGINT) AS exact_id
       |  FROM documents a JOIN documents b ON a.text = b.text
       |  WHERE a.doc_id < (SELECT s FROM spl)
       |    AND b.doc_id >= (SELECT s FROM spl)
       |  GROUP BY 1
       |), nm AS (
       |  SELECT id_b AS batch_id, CAST(MIN(id_a) AS BIGINT) AS near_id
       |  FROM pairs
       |  WHERE id_a < (SELECT s FROM spl) AND id_b >= (SELECT s FROM spl)
       |  GROUP BY 1
       |), nmj AS (
       |  SELECT n.batch_id, n.near_id, p.jaccard
       |  FROM nm n JOIN pairs p ON p.id_a = n.near_id AND p.id_b = n.batch_id
       |)
       |SELECT d.doc_id AS batch_id,
       |  CASE WHEN x.exact_id IS NOT NULL THEN 'exact'
       |       WHEN j.near_id IS NOT NULL THEN 'near'
       |       ELSE 'new' END AS status,
       |  COALESCE(x.exact_id, j.near_id) AS match_id,
       |  CASE WHEN x.exact_id IS NULL THEN j.jaccard END AS jaccard
       |FROM documents d
       |LEFT JOIN xm x ON d.doc_id = x.batch_id
       |LEFT JOIN nmj j ON d.doc_id = j.batch_id
       |WHERE d.doc_id >= (SELECT s FROM spl)
       |ORDER BY batch_id""".stripMargin

  /** Connected-components oracle over the replayed MinHash pair
    * edges: a recursive transitive-closure CTE (fine at oracle SF —
    * dup clusters are tiny) labels every clustered doc with the min
    * reachable id, exactly [[graft.operators.Dedup.connectedComponents]]'s
    * fixed point.
    */
  private def dupClusterOracleSql(numPerms: Int, bands: Int, threshold: Double): String =
    s"""WITH RECURSIVE ${minhashCtes(numPerms, bands, threshold)}, edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |), sel AS (
       |  SELECT src, dst FROM reach
       |  UNION
       |  SELECT src, src AS dst FROM edges
       |)
       |SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS cluster_id
       |FROM sel GROUP BY src ORDER BY doc_id""".stripMargin

  /** t78: the t24 component replay, group key = component root (or
    * own id for singletons), then the t31 bucket fold over the group
    * key.
    */
  private def leakageSplitOracleSql(numPerms: Int, bands: Int,
      threshold: Double): String =
    s"""WITH RECURSIVE ${minhashCtes(numPerms, bands, threshold)}, edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |), sel AS (
       |  SELECT src, dst FROM reach
       |  UNION
       |  SELECT src, src AS dst FROM edges
       |), comp AS (
       |  SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS root
       |  FROM sel GROUP BY src
       |), keyed AS (
       |  SELECT d.doc_id, COALESCE(c.root, d.doc_id) AS group_key
       |  FROM documents d LEFT JOIN comp c USING (doc_id)
       |)
       |SELECT doc_id, group_key,
       |  CASE WHEN ${idMixSql("group_key")} % 100 < 10 THEN 'val'
       |       WHEN ${idMixSql("group_key")} % 100 < 20 THEN 'test'
       |       ELSE 'train' END AS split
       |FROM keyed ORDER BY doc_id""".stripMargin

  /** t110: the t78 component replay with fold = idMix(group) mod k. */
  private def groupKFoldOracleSql(numPerms: Int, bands: Int,
      threshold: Double, k: Int): String =
    s"""WITH RECURSIVE ${minhashCtes(numPerms, bands, threshold)}, edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |), sel AS (
       |  SELECT src, dst FROM reach
       |  UNION
       |  SELECT src, src AS dst FROM edges
       |), comp AS (
       |  SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS root
       |  FROM sel GROUP BY src
       |), keyed AS (
       |  SELECT d.doc_id, COALESCE(c.root, d.doc_id) AS group_key
       |  FROM documents d LEFT JOIN comp c USING (doc_id)
       |)
       |SELECT doc_id, group_key,
       |  CAST(${idMixSql("group_key")} % $k AS BIGINT) AS fold
       |FROM keyed ORDER BY doc_id""".stripMargin

  /** t81: the t78 split replay, collapsed to per-split document and
    * cluster counts with exact 1e6 fixed-point fractions. `mpairs`
    * pins the MinHash pair relation MATERIALIZED before the
    * recursion: DuckDB re-evaluates non-materialized CTEs referenced
    * from a recursive section per fixpoint step, which re-runs the
    * whole signature chain each iteration and spills unboundedly at
    * sf0.1 (measured; the t80 oracle exhausted disk without this).
    */
  private def splitFractionsOracleSql(numPerms: Int, bands: Int,
      threshold: Double): String =
    s"""WITH RECURSIVE ${minhashCtes(numPerms, bands, threshold)},
       |mpairs AS MATERIALIZED (
       |  SELECT id_a, id_b FROM pairs
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM mpairs
       |  UNION
       |  SELECT id_b AS src, id_a AS dst FROM mpairs
       |), reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |), sel AS (
       |  SELECT src, dst FROM reach
       |  UNION
       |  SELECT src, src AS dst FROM edges
       |), comp AS (
       |  SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS root
       |  FROM sel GROUP BY src
       |), keyed AS (
       |  SELECT d.doc_id, COALESCE(c.root, d.doc_id) AS group_key
       |  FROM documents d LEFT JOIN comp c USING (doc_id)
       |), spl AS (
       |  SELECT doc_id, group_key,
       |    CASE WHEN ${idMixSql("group_key")} % 100 < 10 THEN 'val'
       |         WHEN ${idMixSql("group_key")} % 100 < 20 THEN 'test'
       |         ELSE 'train' END AS split
       |  FROM keyed
       |), per0 AS (
       |  SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(COUNT(DISTINCT group_key) AS BIGINT) AS n_groups
       |  FROM spl GROUP BY split
       |), per AS (
       |  SELECT s.split, COALESCE(n_docs, 0) AS n_docs,
       |    COALESCE(n_groups, 0) AS n_groups
       |  FROM (VALUES ('train'), ('val'), ('test')) s(split)
       |  LEFT JOIN per0 USING (split)
       |), tot AS (
       |  SELECT CAST(SUM(n_docs) AS BIGINT) AS td,
       |    CAST(SUM(n_groups) AS BIGINT) AS tg
       |  FROM per
       |)
       |SELECT split, n_docs, n_groups,
       |  n_docs * 1000000 // td AS docs_frac_x1e6,
       |  n_groups * 1000000 // tg AS groups_frac_x1e6,
       |  CAST(CASE split WHEN 'val' THEN 100000 WHEN 'test' THEN 100000
       |    ELSE 800000 END AS BIGINT) AS target_frac_x1e6,
       |  abs(n_docs * 1000000 // td -
       |    CASE split WHEN 'val' THEN 100000 WHEN 'test' THEN 100000
       |    ELSE 800000 END) AS dev_x1e6
       |FROM per, tot ORDER BY split""".stripMargin

  /** t85: the t24 component replay (materialized-pair form), cluster
    * sizes, and the exact 1e6 // size weight division.
    */
  private def softDedupOracleSql(numPerms: Int, bands: Int,
      threshold: Double): String =
    s"""WITH RECURSIVE ${minhashCtes(numPerms, bands, threshold)},
       |mpairs AS MATERIALIZED (
       |  SELECT id_a, id_b FROM pairs
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM mpairs
       |  UNION
       |  SELECT id_b AS src, id_a AS dst FROM mpairs
       |), reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |), sel AS (
       |  SELECT src, dst FROM reach
       |  UNION
       |  SELECT src, src AS dst FROM edges
       |), comp AS (
       |  SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS root
       |  FROM sel GROUP BY src
       |), keyed AS (
       |  SELECT d.doc_id, COALESCE(c.root, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN comp c USING (doc_id)
       |), sz AS (
       |  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
       |  FROM keyed GROUP BY 1
       |)
       |SELECT k.doc_id, k.cluster_id, s.cluster_size,
       |  1000000 // s.cluster_size AS weight_x1e6
       |FROM keyed k JOIN sz s USING (cluster_id)
       |ORDER BY doc_id""".stripMargin

  /** t80: the full governance-recipe replay — t76's normalized dedup,
    * t78's cluster splits over the deduped corpus, t72's cap window,
    * t74's √-temperature thresholds, t39's shard-major token budget,
    * and t58's curriculum ordering over the surviving train split,
    * composed stage-for-stage in one query.
    */
  private def curationRecipeOracleSql(numPerms: Int, bands: Int,
      threshold: Double, cap: Int, tempScale: Double): String = {
    import graft.functions.TextFunctions.{Sql => T}
    // nrm/dd/mpairs are MATERIALIZED: dd feeds every downstream
    // stage and mpairs feeds the recursive closure — left inline,
    // DuckDB re-evaluates them per consumer (and per recursion
    // step), which re-runs the dedup+signature chain repeatedly and
    // exhausted disk at sf0.1 (measured: 5 s materialized vs >80 GB
    // of spill inlined)
    s"""WITH RECURSIVE nrm AS MATERIALIZED (
       |  SELECT doc_id, text, source,
       |    trim(regexp_replace(regexp_replace(lower(text),
       |      '[.,!?;:]', '', 'g'), '\\s+', ' ', 'g')) AS nt
       |  FROM documents
       |), dd AS MATERIALIZED (
       |  SELECT doc_id, text, source FROM nrm
       |  WHERE doc_id IN (SELECT MIN(doc_id) FROM nrm GROUP BY nt)
       |), ${minhashCtes(numPerms, bands, threshold, source = "dd")},
       |mpairs AS MATERIALIZED (
       |  SELECT id_a, id_b FROM pairs
       |), edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM mpairs
       |  UNION
       |  SELECT id_b AS src, id_a AS dst FROM mpairs
       |), reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |), sel0 AS (
       |  SELECT src, dst FROM reach
       |  UNION
       |  SELECT src, src AS dst FROM edges
       |), comp AS (
       |  SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS root
       |  FROM sel0 GROUP BY src
       |), spl AS (
       |  SELECT d.doc_id, d.text, d.source,
       |    CASE WHEN ${idMixSql("COALESCE(c.root, d.doc_id)")} % 100 < 10
       |           THEN 'val'
       |         WHEN ${idMixSql("COALESCE(c.root, d.doc_id)")} % 100 < 20
       |           THEN 'test'
       |         ELSE 'train' END AS split
       |  FROM dd d LEFT JOIN comp c USING (doc_id)
       |), capped AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source
       |    ORDER BY ${idMixSql("doc_id")}, doc_id) AS BIGINT) AS domain_rank
       |  FROM spl
       |), c2 AS (
       |  SELECT * FROM capped WHERE domain_rank <= $cap
       |), cnt2 AS (
       |  SELECT source, COUNT(*) AS n FROM c2 GROUP BY source
       |), thr2 AS (
       |  SELECT source, CAST(FLOOR(LEAST(1.0,
       |    $tempScale / sqrt(CAST(n AS DOUBLE))) * 4294967296.0) AS BIGINT)
       |    AS thr
       |  FROM cnt2
       |), tmp2 AS (
       |  SELECT c.* FROM c2 c JOIN thr2 USING (source)
       |  WHERE ${idMixSql("c.doc_id")} < thr
       |), tbase AS (
       |  SELECT doc_id, source, split, domain_rank, text,
       |    ${T.nTokens("text")} AS n_tokens,
       |    ${idMixSql("doc_id")} AS ord
       |  FROM tmp2
       |), tsh AS (
       |  SELECT *, ord % 8 AS shard FROM tbase
       |), talloc AS (
       |  SELECT source, shard,
       |    COALESCE(CAST(SUM(sh_tokens) OVER (
       |      PARTITION BY source ORDER BY shard
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
       |      0) AS bef
       |  FROM (SELECT source, shard, CAST(SUM(n_tokens) AS BIGINT) AS sh_tokens
       |        FROM tsh GROUP BY source, shard)
       |), tcum AS (
       |  SELECT s.doc_id, s.source, s.split, s.domain_rank, s.text,
       |    s.n_tokens,
       |    a.bef + CAST(SUM(s.n_tokens) OVER (
       |      PARTITION BY s.source, s.shard ORDER BY s.ord, s.doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS cum_tokens
       |  FROM tsh s JOIN talloc a ON s.source = a.source AND s.shard = a.shard
       |), bud AS (
       |  SELECT * FROM tcum
       |  WHERE cum_tokens <= CASE source WHEN 'src0' THEN 100000
       |    WHEN 'src1' THEN 500 WHEN 'src2' THEN 40 ELSE 0 END
       |), ctoks AS (
       |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
       |  FROM bud WHERE split = 'train'
       |), ctf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM ctoks GROUP BY 1, 2
       |), ccnt AS (
       |  SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM ctf GROUP BY term
       |), cagg AS (
       |  SELECT ctf.doc_id, CAST(SUM(ctf.tf) AS BIGINT) AS n_tokens,
       |    CAST(SUM(ctf.tf * ccnt.cnt) AS BIGINT) AS hit_mass
       |  FROM ctf JOIN ccnt USING (term) GROUP BY 1
       |), cscored AS (
       |  SELECT doc_id, hit_mass // n_tokens AS score FROM cagg
       |), cmm AS (
       |  SELECT MIN(score) AS mn, MAX(score) AS mx FROM cscored
       |), ckeyed AS (
       |  SELECT doc_id, score, ((score - mn) * 4) // (mx - mn + 1) AS bin,
       |    ${idMixSql("doc_id")} AS shuffle_key
       |  FROM cscored, cmm
       |), cord AS (
       |  SELECT doc_id, CAST(ROW_NUMBER() OVER (
       |    ORDER BY bin DESC, shuffle_key, doc_id) AS BIGINT) AS order_idx
       |  FROM ckeyed
       |)
       |SELECT b.doc_id, b.source, b.split, b.domain_rank, b.n_tokens,
       |  b.cum_tokens, o.order_idx
       |FROM bud b LEFT JOIN cord o USING (doc_id)
       |ORDER BY b.doc_id""".stripMargin
  }

  /** t82: per-source available tokens, the LEAST(maxEpochs, //)
    * epoch division, the FLOOR(LEAST(1, rem/avail)·2³²) fractional
    * threshold, row expansion via range-unnest, and the shared
    * id-hash survival filter — [[graft.operators.CorpusOps.epochUpsample]]
    * replayed end to end.
    */
  private def epochUpsampleOracleSql(maxEpochs: Int): String = {
    import graft.functions.TextFunctions.{Sql => T}
    s"""WITH st AS (
       |  SELECT source, CAST(SUM(${T.nTokens("text")}) AS BIGINT) AS avail
       |  FROM documents GROUP BY source
       |), par AS (
       |  SELECT source, avail,
       |    CAST(CASE source WHEN 'src0' THEN 5000 WHEN 'src1' THEN 50000
       |      WHEN 'src2' THEN 600 ELSE 0 END AS BIGINT) AS target
       |  FROM st WHERE avail > 0
       |), ep AS (
       |  SELECT source, avail, target,
       |    LEAST(CAST($maxEpochs AS BIGINT), target // avail) AS fullep
       |  FROM par
       |), ep2 AS (
       |  SELECT source, avail, fullep,
       |    CASE WHEN fullep < $maxEpochs THEN target - fullep * avail
       |      ELSE 0 END AS rem
       |  FROM ep
       |), thr AS (
       |  SELECT source, fullep,
       |    CAST(FLOOR(LEAST(1.0, CAST(rem AS DOUBLE) / CAST(avail AS DOUBLE))
       |      * 4294967296.0) AS BIGINT) AS thr
       |  FROM ep2
       |), expanded AS (
       |  -- lateral-join unnest: the select-list unnest(range(...))
       |  -- form trips a DuckDB binder assertion when the alias is
       |  -- referenced from the outer WHERE
       |  SELECT d.doc_id, d.source, t.fullep, t.thr, u.epoch
       |  FROM documents d
       |  JOIN thr t USING (source)
       |  CROSS JOIN UNNEST(range(1, t.fullep +
       |    CASE WHEN t.thr > 0 THEN 1 ELSE 0 END + 1)) AS u(epoch)
       |)
       |SELECT doc_id, source, CAST(epoch AS BIGINT) AS epoch
       |FROM expanded
       |WHERE epoch <= fullep OR ${idMixSql("doc_id")} < thr
       |ORDER BY doc_id, epoch""".stripMargin
  }

  /** t42: the t24 component replay + the t37 integer quality score,
    * then a per-cluster argmax (score desc, doc_id asc).
    */
  private def canonicalOracleSql(numPerms: Int, bands: Int,
      threshold: Double): String =
    s"""WITH RECURSIVE ${minhashCtes(numPerms, bands, threshold)}, edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b AS src, id_a AS dst FROM pairs
       |), reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
       |), sel AS (
       |  SELECT src, dst FROM reach
       |  UNION
       |  SELECT src, src AS dst FROM edges
       |), comp AS (
       |  SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS cluster_id
       |  FROM sel GROUP BY src
       |), qterm AS (
       |  SELECT doc_id, unnest(ts) AS term FROM toks
       |), qtf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM qterm GROUP BY 1, 2
       |), qcnt AS (
       |  SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM qtf GROUP BY term
       |), qagg AS (
       |  SELECT qtf.doc_id,
       |    CAST(SUM(qtf.tf * qcnt.cnt) AS BIGINT)
       |      // CAST(SUM(qtf.tf) AS BIGINT) AS score
       |  FROM qtf JOIN qcnt USING (term) GROUP BY 1
       |), r AS (
       |  SELECT c.doc_id, c.cluster_id, CAST(q.score AS BIGINT) AS score,
       |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
       |      ORDER BY q.score DESC, c.doc_id) AS rn
       |  FROM comp c JOIN qagg q USING (doc_id)
       |)
       |SELECT doc_id, cluster_id, score, (rn = 1) AS canonical
       |FROM r ORDER BY doc_id""".stripMargin

  /** DuckDB sequential-fold dot product over 64-dim DOUBLE lists —
    * the same left-to-right addition order as the native
    * [[graft.functions.VecDot]], so cosines are bit-identical.
    */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, 65), i ->
       |      $a[CAST(i AS INT)] * $b[CAST(i AS INT)]), (x, y) -> x + y)""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}))"

  /** Lloyd-training replay
    * ([[graft.operators.Similarity.trainedCentroids]]): seeds `lc0`
    * are the adaptive-ladder smallest ids of `src` (vec_id, e); each
    * round r is a rank-1 assignment (`la$r`, cosine desc / cid asc),
    * per-(cluster, dim) exact integer sums of the µ-scaled-long
    * vectors (`ls$r` — order-independent, so DuckDB and Spark agree
    * bit-for-bit), and the summed direction vectors as the next
    * centroids (`lc$r` — cosine is scale-invariant, so no mean
    * division ever happens). Final relation: `lc2` (cid, ce), 2 =
    * `Similarity.LloydIters`.
    */
  private def lloydCtes(src: String, minNlist: Int): String = {
    val base =
      s"""lsl AS (
         |  SELECT vec_id, list_transform(e,
         |    x -> CAST(FLOOR(x * 1000000.0 + 0.5) AS BIGINT)) AS l
         |  FROM $src
         |), lc0 AS (
         |  SELECT vec_id AS cid, e AS ce FROM (
         |    SELECT vec_id, e, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn,
         |           COUNT(*) OVER () AS nn
         |    FROM $src) s
         |  WHERE rn <= greatest($minNlist, CAST(floor(sqrt(nn)) AS BIGINT))
         |)""".stripMargin
    val rounds = (1 to 2).map { r =>
      s"""la$r AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT w.vec_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY w.vec_id
         |        ORDER BY ${cosSql("w.e", "c.ce")} DESC, c.cid) AS pr
         |    FROM $src w, lc${r - 1} c) x
         |  WHERE pr = 1
         |), ls$r AS (
         |  SELECT a.cid, t.i, CAST(SUM(sl.l[CAST(t.i AS INT)]) AS BIGINT) AS s
         |  FROM la$r a JOIN lsl sl USING (vec_id) CROSS JOIN range(1, 65) t(i)
         |  GROUP BY a.cid, t.i
         |), lc$r AS (
         |  SELECT cid, list_transform(list(s ORDER BY i),
         |    x -> CAST(x AS DOUBLE)) AS ce
         |  FROM ls$r GROUP BY cid
         |)""".stripMargin
    }
    (base +: rounds).mkString(", ")
  }

  /** dsub-dim (one PQ subspace) left-to-right dot fold. */
  private def dotSubSql(a: String, b: String, dsub: Int): String =
    s"""list_reduce(list_transform(range(1, ${dsub + 1}), i ->
       |      $a[CAST(i AS INT)] * $b[CAST(i AS INT)]), (x, y) -> x + y)""".stripMargin

  /** Squared L2 in the |x|²−2x·c+|c|² expansion — identical IEEE op
    * order to [[graft.operators.Similarity]]'s `l2sq`.
    */
  private def l2sqSql(x: String, c: String, dsub: Int): String =
    s"((${dotSubSql(x, x, dsub)} - (2.0 * ${dotSubSql(x, c, dsub)})) + " +
      s"${dotSubSql(c, c, dsub)})"

  /** Shared SQ replay ([[graft.operators.Similarity.sqEncode]]):
    * embeddings as round-half-up µ-scaled longs (`sq0.l`), the
    * symmetric scale (`sqm.maxabs`, >= 1), and the int8 codes
    * (`sqc.codes`) — every step integer with non-negative division
    * operands, so `//` here and `div` on the Spark side agree
    * bit-for-bit.
    */
  /** Shared DuckDB CTE fragment replaying the pHash pipeline (CTE
    * `ph`: doc_id, phash) from text characters — the 32×32 gray
    * canvas is text byte `(y·32 + x)·len div 1024` (content
    * stretched over the canvas — the standard pHash
    * size-normalization; all-zero for empty docs; the ASCII gate
    * keeps char index = byte index), the 8×8 nearest-neighbor
    * sample reads byte `(128·gy + 4·gx)·len div 1024`, integer-floor
    * mean, bit
    * `gy·8 + gx` set iff sample > mean. Bit 63 cannot be built with
    * `<< 63` (DuckDB range-checks the shift), so bits 0–62 sum as
    * powers of two and bit 63 adds the min-BIGINT constant — the
    * same two's-complement value `1L << 63` packs on the Spark side.
    */
  private def phashCtes(source: String = "documents"): String =
    s"""pd AS (
      |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len FROM $source
      |  WHERE octet_length(encode(text)) = length(text)
      |), pg AS (
      |  SELECT doc_id, list_transform(range(0, 64), i ->
      |    CASE WHEN len = 0 THEN CAST(0 AS BIGINT)
      |      ELSE CAST(unicode(substr(text,
      |        CAST((128 * (i // 8) + 4 * (i % 8)) * len // 1024 + 1 AS INT), 1))
      |        AS BIGINT) END) AS g
      |  FROM pd
      |), pm AS (
      |  SELECT doc_id, g,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT), g), (x, y) -> x + y)
      |      // 64 AS mean
      |  FROM pg
      |), ph AS (
      |  SELECT doc_id,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(range(0, 63), i ->
      |        CASE WHEN g[CAST(i + 1 AS INT)] > mean
      |          THEN CAST(1 AS BIGINT) << CAST(i AS INT)
      |          ELSE CAST(0 AS BIGINT) END)),
      |      (x, y) -> x + y)
      |    + CASE WHEN g[64] > mean THEN (-9223372036854775807 - 1)
      |      ELSE CAST(0 AS BIGINT) END AS phash
      |  FROM pm
      |)""".stripMargin

  /** Shared DuckDB replay of the audio energy fingerprint
    * ([[graft.operators.Multimodal.energyFp64]] over the canonical
    * WAV's PCM = the text bytes): per-char energy (c−128)² routed to
    * bin i·64/len, per-bin sums, global mean (Σ/64, floor), bit b
    * set iff bin b strictly exceeds the mean. The b = 63 term adds
    * −2⁶³ (bigint sign bit); the whole fingerprint is CAST back to
    * BIGINT because DuckDB widens SUM to int128 — a 128-bit xor
    * would sign-extend and inflate cross-sign hamming distances.
    * Ends in CTE `afp(doc_id, afp)`.
    */
  private def audioFpCtes(source: String = "documents"): String =
    s"""ad AS (
       |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len FROM $source
       |  WHERE length(text) > 0 AND octet_length(encode(text)) = length(text)
       |), ach AS (
       |  SELECT doc_id, len, unnest(range(0, len)) AS i FROM ad
       |), acv AS (
       |  SELECT c.doc_id, (c.i * 64) // c.len AS b,
       |    (unicode(substr(a.text, CAST(c.i + 1 AS INT), 1)) - 128) AS d
       |  FROM ach c JOIN ad a USING (doc_id)
       |), aen AS (
       |  SELECT doc_id, b, SUM(d * d) AS e FROM acv GROUP BY 1, 2
       |), atot AS (
       |  SELECT doc_id, SUM(e) // 64 AS mean FROM aen GROUP BY 1
       |), afp AS (
       |  SELECT e.doc_id, CAST(
       |    SUM(CASE WHEN e.e > t.mean AND e.b < 63
       |      THEN CAST(1 AS BIGINT) << CAST(e.b AS INT) ELSE 0 END)
       |    + MAX(CASE WHEN e.e > t.mean AND e.b = 63
       |      THEN (-9223372036854775807 - 1) ELSE 0 END) AS BIGINT) AS afp
       |  FROM aen e JOIN atot t USING (doc_id) GROUP BY 1
       |)""".stripMargin

  private val sqCtes: String =
    """sq0 AS (
      |  SELECT vec_id,
      |    list_transform(CAST(embedding AS DOUBLE[]),
      |      x -> CAST(FLOOR(x * 1000000.0 + 0.5) AS BIGINT)) AS l
      |  FROM embeddings
      |), sqm AS (
      |  SELECT vec_id, l,
      |    GREATEST(list_max(list_transform(l, x -> abs(x))),
      |      CAST(1 AS BIGINT)) AS maxabs
      |  FROM sq0
      |), sqc AS (
      |  SELECT vec_id, maxabs, l,
      |    list_transform(l, x -> CASE WHEN x < 0
      |      THEN -(((-x) * 127) // maxabs)
      |      ELSE (x * 127) // maxabs END) AS codes
      |  FROM sqm
      |)""".stripMargin

  /** Shared PQ replay for an m-subspace / ksub-centroid index over
    * the 64-dim fixture embeddings (dsub = 64/m): codebook from the
    * ksub smallest-id vectors, per-(vector, subspace) argmin with the
    * (dist, code) tie-break, distances floored to scaled longs —
    * the exact index build both t32 and t33 consume.
    */
  private def pqCtes(m: Int, ksub: Int): String = {
    val dsub = 64 / m
    s"""v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), c0 AS (
       |  SELECT e, rn - 1 AS code FROM (
       |    SELECT e, ROW_NUMBER() OVER (ORDER BY vec_id) AS rn FROM v) s
       |  WHERE rn <= $ksub
       |), cs AS (
       |  SELECT code, sub,
       |    list_slice(e, CAST(sub*$dsub+1 AS INT), CAST(sub*$dsub+$dsub AS INT)) AS cv
       |  FROM c0 CROSS JOIN range(0, $m) t(sub)
       |), sv AS (
       |  SELECT vec_id, sub,
       |    list_slice(e, CAST(sub*$dsub+1 AS INT), CAST(sub*$dsub+$dsub AS INT)) AS sv
       |  FROM v CROSS JOIN range(0, $m) t(sub)
       |), d AS (
       |  SELECT s.vec_id, s.sub, c.code, ${l2sqSql("sv", "cv", dsub)} AS dist
       |  FROM sv s JOIN cs c USING (sub)
       |), best AS (
       |  SELECT vec_id, sub, code,
       |    CAST(FLOOR(dist * 1000000.0) AS BIGINT) AS dist_scaled
       |  FROM (
       |    SELECT vec_id, sub, code, dist,
       |      ROW_NUMBER() OVER (PARTITION BY vec_id, sub
       |                         ORDER BY dist, code) AS rn
       |    FROM d) x
       |  WHERE rn = 1
       |)""".stripMargin
  }

  /** Full index-build + search replay for the IVF path
    * ([[graft.operators.Similarity.ivfTopKAuto]]): adaptive index
    * size nlist = max(minNlist, floor(sqrt(n))) via a COUNT(*)
    * window, Lloyd-trained centroids ([[lloydCtes]] from the
    * smallest-id seeds), argmax-cosine
    * assignment with the same (cosine desc, cid asc) tie-break,
    * nprobe probe lists, exact re-rank. Gates candidate generation
    * itself — including the data-dependent sizing — not just the
    * final ranking.
    */
  /** The IVF k-NN CTE chain (v → Lloyd → assignment → ranked
    * neighbors `r`) shared by the t16 oracle and the t99 cluster
    * replay. */
  private def ivfKnnCtes(minNlist: Int, nprobe: Int): String =
    s"""v AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
       |), ${lloydCtes("v", minNlist)}, asg AS (
       |  SELECT v.vec_id, c.cid, ${cosSql("v.e", "c.ce")} AS cs
       |  FROM v, lc2 c
       |), asgr AS (
       |  SELECT vec_id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS pr
       |  FROM asg
       |), lists AS (
       |  SELECT a.cid, v.vec_id, v.e FROM asgr a JOIN v USING (vec_id)
       |  WHERE a.pr = 1
       |), probes AS (
       |  SELECT a.cid, v.vec_id, v.e FROM asgr a JOIN v USING (vec_id)
       |  WHERE a.pr <= $nprobe
       |), p2 AS (
       |  SELECT q.vec_id AS vec_id, l.vec_id AS neighbor_id,
       |    ${cosSql("q.e", "l.e")} AS cosine_sim
       |  FROM probes q JOIN lists l ON q.cid = l.cid AND q.vec_id <> l.vec_id
       |), r AS (
       |  SELECT vec_id, neighbor_id, cosine_sim,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |                       ORDER BY cosine_sim DESC, neighbor_id) AS rank
       |  FROM p2
       |)""".stripMargin

  private def ivfOracleSql(minNlist: Int, nprobe: Int, k: Int): String =
    s"""WITH ${ivfKnnCtes(minNlist, nprobe)}
       |SELECT vec_id, rank, neighbor_id, cosine_sim FROM r
       |WHERE rank <= $k ORDER BY vec_id, rank""".stripMargin

  /** t99: the t16 k-NN replay + mutual filter + the t24 recursive
    * component fixed point, then size labeling. */
  private def mutualKnnClusterOracleSql(minNlist: Int, nprobe: Int,
      k: Int): String =
    s"""WITH RECURSIVE ${ivfKnnCtes(minNlist, nprobe)}, knn AS (
       |  SELECT vec_id AS a, neighbor_id AS b FROM r WHERE rank <= $k
       |), mutual AS (
       |  SELECT e1.a, e1.b FROM knn e1
       |  JOIN knn e2 ON e1.a = e2.b AND e1.b = e2.a
       |  WHERE e1.a < e1.b
       |), edges AS (
       |  SELECT a AS src, b AS dst FROM mutual
       |  UNION
       |  SELECT b AS src, a AS dst FROM mutual
       |), reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT rc.src, e.dst FROM reach rc JOIN edges e ON rc.dst = e.src
       |), sel AS (
       |  SELECT src, dst FROM reach
       |  UNION
       |  SELECT src, src AS dst FROM edges
       |), lab AS (
       |  SELECT src AS vec_id, MIN(dst) AS comp FROM sel GROUP BY src
       |), full_lab AS (
       |  SELECT v.vec_id,
       |    CAST(COALESCE(l.comp, v.vec_id) AS BIGINT) AS cluster_id
       |  FROM v LEFT JOIN lab l ON v.vec_id = l.vec_id
       |), sz AS (
       |  SELECT cluster_id, COUNT(*) AS cluster_size
       |  FROM full_lab GROUP BY cluster_id
       |)
       |SELECT f.vec_id, f.cluster_id, sz.cluster_size
       |FROM full_lab f JOIN sz USING (cluster_id)
       |ORDER BY f.vec_id""".stripMargin

  /** Full-pipeline oracle for the SimHash path: replays token
    * PolyHash, the [[graft.functions.Spread64]] LCG bit spread, the
    * majority-vote fingerprint bits, and the Hamming bound — the
    * output is exactly "Jaccard >= threshold AND fingerprint Hamming
    * <= maxHamming", the operator's contract, independent of which
    * pairs the fixture happens to contain.
    */
  private def simhashOracleSql(maxHamming: Int, threshold: Double): String =
    s"""WITH ${jaccardCtes(threshold)}, tok AS (
       |  SELECT doc_id, unnest(ts) AS tk FROM toks
       |), th AS (
       |  SELECT doc_id, ${polyHashSql("tk")} AS h FROM tok
       |), bits AS (
       |  SELECT doc_id, bb,
       |    CASE WHEN SUM(CASE WHEN (h * (2654435761 + 2 * bb) + 123456789) % 4294967296
       |                            >= 2147483648 THEN 1 ELSE -1 END) >= 0
       |         THEN 1 ELSE 0 END AS bit
       |  FROM th CROSS JOIN range(0, 64) t(bb) GROUP BY doc_id, bb
       |), ham AS (
       |  SELECT j.id_a, j.id_b,
       |    SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS hamming
       |  FROM jac j
       |  JOIN bits a ON a.doc_id = j.id_a
       |  JOIN bits b ON b.doc_id = j.id_b AND a.bb = b.bb
       |  GROUP BY 1, 2
       |)
       |SELECT j.id_a, j.id_b, j.jaccard
       |FROM jac j JOIN ham h ON j.id_a = h.id_a AND j.id_b = h.id_b
       |WHERE h.hamming <= $maxHamming
       |ORDER BY j.id_a, j.id_b""".stripMargin


  /** Three fully-unrolled BPE training rounds in DuckDB (see
    * [[docBpeTrain]]): per round, pair counts weighted by word
    * frequency, the (count desc, pair asc) argmax, and the merge as
    * a `list_reduce` greedy left-to-right fold — the exact semantics
    * of [[CorpusOps.applyMerge]]'s Spark `aggregate` fold, including
    * odd runs of the same pair ("aaaaa" -> aa,aa,a with the leftover
    * LAST; the previous separator-`replace` fixpoint put it in the
    * middle, silently diverging the next round's pair counts).
    */
  private def bpeTrainOracleSql: String = {
    val pat = TextFunctions.BpePattern.replace("'", "''")
    def roundCtes(i: Int): String = {
      val prev = s"v${i - 1}"
      val rep =
        s"""list_reduce(list_prepend('', ls), (acc, el) ->
           |      CASE WHEN el = b.r AND ends_with(acc, chr(1) || b.l)
           |           THEN acc || el ELSE acc || chr(1) || el END)""".stripMargin
      s""", c$i AS (
         |  SELECT p[1] AS l, p[2] AS r, CAST(SUM(f) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT unnest(list_transform(range(1, len(ls)), j ->
         |      [ls[CAST(j AS INT)], ls[CAST(j AS INT)+1]])) AS p, f
         |    FROM $prev WHERE len(ls) > 1) t
         |  GROUP BY 1, 2
         |), b$i AS (
         |  SELECT l, r, cnt FROM c$i WHERE cnt >= 2
         |  ORDER BY cnt DESC, l, r LIMIT 1
         |), v$i AS (
         |  SELECT list_filter(string_split($rep, chr(1)), x -> x <> '') AS ls, f
         |  FROM $prev, b$i AS b
         |)""".stripMargin
    }
    s"""WITH words AS (
       |  SELECT unnest(regexp_extract_all(text, '$pat')) AS w FROM documents
       |), vocab AS (
       |  SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM words GROUP BY w
       |), v0 AS (
       |  SELECT regexp_extract_all(w, '.') AS ls, f FROM vocab WHERE len(w) > 1
       |)${roundCtes(1)}${roundCtes(2)}${roundCtes(3)}
       |SELECT * FROM (
       |  SELECT CAST(0 AS BIGINT) AS rank, l AS lhs, r AS rhs,
       |    cnt AS pair_count FROM b1
       |  UNION ALL SELECT 1, l, r, cnt FROM b2
       |  UNION ALL SELECT 2, l, r, cnt FROM b3) x
       |ORDER BY rank""".stripMargin
  }

  /** Shared oracle replay for the IVF-PQ composition (t59 one-shot
    * and t63 persisted search — identical arithmetic by construction,
    * pinned row-for-row by the differential spec): centroid training,
    * cell routing, probe choice, LUT build, and the scaled-long ADC
    * ranking, unrolled in DuckDB SQL.
    */
  private lazy val ivfPqOracleSql: String =
    s"""WITH $ivfPqOracleBody
       |SELECT query_id, rank, vec_id, cell,
       |  CAST(adist_scaled AS DOUBLE) / 1000000.0 AS approx_dist
       |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** The shared CTE chain of the IVF-PQ replay up to the ranked ADC
    * relation `r` — consumed by the t59/t63 top-k select above and by
    * t67's exact-cosine re-rank.
    */
  private lazy val ivfPqOracleBody: String =
    s"""${pqCtes(8, 64)}, ${lloydCtes("v", 16)}, pasg AS (
       |  SELECT v.vec_id, c.cid, ${cosSql("v.e", "c.ce")} AS cs
       |  FROM v, lc2 c
       |), pasgr AS (
       |  SELECT vec_id, cid,
       |    ROW_NUMBER() OVER (PARTITION BY vec_id
       |      ORDER BY cs DESC, cid) AS pr
       |  FROM pasg
       |), vcells AS (
       |  SELECT vec_id, cid FROM pasgr WHERE pr = 1
       |), qpr AS (
       |  SELECT vec_id AS qid, cid FROM pasgr
       |  WHERE pr <= 2 AND vec_id IN (${PqQueryIds.mkString(", ")})
       |), q AS (
       |  SELECT vec_id AS qid, sub, sv AS qv FROM sv
       |  WHERE vec_id IN (${PqQueryIds.mkString(", ")})
       |), lut AS (
       |  SELECT q.qid, q.sub, c.code,
       |    CAST(FLOOR(${l2sqSql("qv", "cv", 8)} * 1000000.0) AS BIGINT)
       |      AS lut_scaled
       |  FROM q JOIN cs c USING (sub)
       |), acc AS (
       |  SELECT l.qid AS query_id, b.vec_id,
       |    MIN(ce.cid) AS cell,
       |    CAST(SUM(l.lut_scaled) AS BIGINT) AS adist_scaled
       |  FROM best b
       |  JOIN vcells ce ON ce.vec_id = b.vec_id
       |  JOIN qpr ON qpr.cid = ce.cid
       |  JOIN lut l ON l.sub = b.sub AND l.code = b.code
       |    AND l.qid = qpr.qid AND l.qid <> b.vec_id
       |  GROUP BY 1, 2
       |), r AS (
       |  SELECT query_id, vec_id, cell, adist_scaled,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
       |      ORDER BY adist_scaled, vec_id) AS BIGINT) AS rank
       |  FROM acc
       |)""".stripMargin

  /** Shared oracle replay for BM25 retrieval (t30 one-shot and t66
    * persisted-index search — identical arithmetic by the shared
    * ranking stage, pinned row-for-row by the differential spec):
    * query tokenization, tf/df over query terms, corpus stats, the
    * scaled-long partial sums, and the ranked cut.
    */
  /** The CTE chain through the ranked relation `r` — shared by the
    * t30/t66 select and t77's evaluation oracle so the BM25 replay
    * cannot silently diverge between gates.
    */
  private lazy val bm25Ctes: String =
    """qraw AS (
      |  SELECT * FROM (VALUES (1, 'spark window join'), (2, 'hash merge batch'),
      |    (3, 'slow scan filter table')) AS t(query_id, qtext)
      |), q AS (
      |  SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id, term FROM (
      |    SELECT query_id,
      |      unnest(string_split_regex(trim(qtext), '\s+')) AS term
      |    FROM qraw)
      |), dl AS (
      |  SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS dl
      |  FROM documents
      |), s AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_tokens
      |  FROM dl
      |), toks AS (
      |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
      |  FROM documents
      |), tf AS (
      |  SELECT t.doc_id, d.dl, t.term, COUNT(*) AS tf
      |  FROM toks t JOIN (SELECT DISTINCT term FROM q) qt USING (term)
      |  JOIN dl d USING (doc_id)
      |  GROUP BY 1, 2, 3
      |), df AS (
      |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
      |), scored AS (
      |  SELECT q.query_id, tf.doc_id,
      |    CAST(FLOOR(((CAST(s.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) *
      |      ((CAST(tf.tf AS DOUBLE) * 2.2) /
      |       (CAST(tf.tf AS DOUBLE) + (1.2 * (0.25 +
      |        ((0.75 * CAST(tf.dl AS DOUBLE)) /
      |         (CAST(s.total_tokens AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))))))
      |      * 1000000.0) AS BIGINT) AS part_scaled
      |  FROM tf JOIN df USING (term) JOIN q USING (term) CROSS JOIN s
      |), agg AS (
      |  SELECT query_id, doc_id, CAST(SUM(part_scaled) AS BIGINT) AS score_scaled,
      |    COUNT(*) AS n_terms
      |  FROM scored GROUP BY 1, 2
      |), r AS (
      |  SELECT query_id, doc_id, n_terms, score_scaled,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY score_scaled DESC, doc_id) AS BIGINT) AS rank
      |  FROM agg
      |)""".stripMargin

  private lazy val bm25OracleSql: String =
    s"""WITH $bm25Ctes
       |SELECT query_id, rank, doc_id, n_terms,
       |  CAST(score_scaled AS DOUBLE) / 1000000.0 AS score
       |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  val oracles: Map[String, String] = {
    import TextFunctions.{Sql => T}
    Map(
      "t01_text_stats" ->
        s"""SELECT doc_id, ${T.nTokens("text")} AS n_tokens,
           |  ${T.dictHits("text", TextFunctions.Stopwords)} AS stopword_hits,
           |  ${T.punctCount("text")} AS punct_count,
           |  ${T.qualityScore("text")} AS quality
           |FROM documents ORDER BY doc_id""".stripMargin,
      "t02_lang_id" ->
        s"""SELECT doc_id, ${T.langId("text")} AS pred_lang
           |FROM documents ORDER BY doc_id""".stripMargin,
      "t03_fingerprint" ->
        s"""SELECT doc_id, ${T.polyHash("text")} AS fingerprint
           |FROM documents ORDER BY doc_id""".stripMargin,
      "t04_dedup_exact" ->
        """SELECT doc_id, lang, source, n_chars FROM documents
          |WHERE doc_id IN (SELECT MIN(doc_id) FROM documents GROUP BY text)
          |ORDER BY doc_id""".stripMargin,
      "t05_dedup_jaccard" ->
        """WITH toks AS (
          |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents
          |), grams AS (
          |  SELECT DISTINCT doc_id, unnest(
          |    CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
          |    ELSE list_transform(range(1, len(ts) - 1), i ->
          |      ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1] || ' ' || ts[CAST(i AS INT)+2])
          |    END) AS g
          |  FROM toks
          |), sizes AS (
          |  SELECT doc_id, COUNT(*) AS sz FROM grams GROUP BY doc_id
          |), pairs AS (
          |  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS nc
          |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
          |  GROUP BY 1, 2
          |)
          |SELECT ia AS id_a, ib AS id_b, nc AS n_common,
          |  sa.sz AS size_a, sb.sz AS size_b,
          |  CAST(nc AS DOUBLE) / CAST(sa.sz + sb.sz - nc AS DOUBLE) AS jaccard
          |FROM pairs
          |JOIN sizes sa ON ia = sa.doc_id
          |JOIN sizes sb ON ib = sb.doc_id
          |WHERE CAST(nc AS DOUBLE) / CAST(sa.sz + sb.sz - nc AS DOUBLE) >= 0.05
          |ORDER BY id_a, id_b""".stripMargin,
      "t14_token_counts" ->
        s"""SELECT doc_id, ${T.nTokens("text")} AS n_words,
           |  ${T.nBpeTokens("text")} AS n_bpe_tokens
           |FROM documents ORDER BY doc_id""".stripMargin,
      "t15_bpe_real" -> graft.functions.Bpe.oracleSql("documents"),
      "t17_repetition" ->
        """WITH toks AS (
          |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents
          |), uni AS (
          |  SELECT doc_id, unnest(ts) AS g FROM toks
          |), uc AS (
          |  SELECT doc_id, g, COUNT(*) AS c FROM uni GROUP BY 1, 2
          |), ua AS (
          |  SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM uc GROUP BY 1
          |), bi AS (
          |  SELECT doc_id, unnest(list_transform(range(1, len(ts)), i ->
          |    ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1])) AS g
          |  FROM toks
          |), bc AS (
          |  SELECT doc_id, g, COUNT(*) AS c FROM bi GROUP BY 1, 2
          |), ba AS (
          |  SELECT doc_id, MAX(c) AS mx, SUM(c) AS tot FROM bc GROUP BY 1
          |)
          |SELECT t.doc_id, len(ts) AS n_tokens,
          |  CAST(len(list_distinct(ts)) AS DOUBLE) / CAST(len(ts) AS DOUBLE) AS uniq_frac,
          |  CAST(ua.mx AS DOUBLE) / CAST(ua.tot AS DOUBLE) AS top_unigram_frac,
          |  COALESCE(CAST(ba.mx AS DOUBLE) / CAST(ba.tot AS DOUBLE), 0.0) AS top_bigram_frac
          |FROM toks t
          |JOIN ua USING (doc_id)
          |LEFT JOIN ba USING (doc_id)
          |ORDER BY doc_id""".stripMargin,
      "t18_pii_redact" -> {
        val email = graft.operators.CorpusOps.EmailPattern.replace("'", "''")
        val ipv4 = graft.operators.CorpusOps.Ipv4Pattern.replace("'", "''")
        val phone = graft.operators.CorpusOps.PhonePattern.replace("'", "''")
        val term = graft.operators.CorpusOps.termPattern(PiiTerms).replace("'", "''")
        s"""SELECT doc_id,
           |  len(regexp_extract_all(text, '$email')) AS n_emails,
           |  len(regexp_extract_all(text, '$ipv4')) AS n_ipv4,
           |  len(regexp_extract_all(text, '$phone')) AS n_phones,
           |  len(regexp_extract_all(text, '$term')) AS n_terms,
           |  regexp_replace(
           |    regexp_replace(
           |      regexp_replace(
           |        regexp_replace(text, '$email', '<EMAIL>', 'g'),
           |        '$ipv4', '<IP>', 'g'),
           |      '$phone', '<PHONE>', 'g'),
           |    '$term', '<TERM>', 'g') AS redacted
           |FROM documents ORDER BY doc_id""".stripMargin
      },
      "t19_decontam" -> {
        val n = DecontamN
        s"""WITH toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts FROM documents
           |), grams AS (
           |  SELECT DISTINCT doc_id, unnest(
           |    CASE WHEN len(ts) < $n THEN [array_to_string(ts, ' ')]
           |    ELSE list_transform(range(1, len(ts) - ${n - 2}), i ->
           |      array_to_string(ts[CAST(i AS INT):CAST(i + ${n - 1} AS INT)], ' '))
           |    END) AS g
           |  FROM toks
           |), sizes AS (
           |  SELECT doc_id, COUNT(*) AS n_shingles FROM grams GROUP BY 1
           |), bench AS (
           |  SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0
           |), hits AS (
           |  SELECT t.doc_id, COUNT(*) AS n_hits
           |  FROM grams t JOIN bench USING (g)
           |  WHERE t.doc_id % 10 <> 0 GROUP BY 1
           |)
           |SELECT s.doc_id, s.n_shingles, COALESCE(h.n_hits, 0) AS n_hits,
           |  CAST(COALESCE(h.n_hits, 0) > 0 AS BIGINT) AS contaminated
           |FROM sizes s LEFT JOIN hits h USING (doc_id)
           |WHERE s.doc_id % 10 <> 0 ORDER BY doc_id""".stripMargin
      },
      "t20_sample_stratified" -> {
        val cases = SampleRates.toSeq.sortBy(_._1)
          .map { case (k, v) => s"WHEN '$k' THEN $v" }.mkString(" ")
        s"""SELECT doc_id, lang,
           |  ${idMixSql("doc_id")} % 100 AS strat_bucket
           |FROM documents
           |WHERE ${idMixSql("doc_id")} % 100
           |  < CASE lang $cases ELSE 100 END
           |ORDER BY doc_id""".stripMargin
      },
      "t21_seq_pack" ->
        s"""WITH d AS (
           |  SELECT doc_id, doc_id % 8 AS shard,
           |    ${T.nTokens("text")} AS n_tokens
           |  FROM documents
           |), c AS (
           |  SELECT doc_id, shard, n_tokens,
           |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           |                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
           |      - n_tokens AS start_tok
           |  FROM d
           |)
           |SELECT doc_id, shard, n_tokens,
           |  start_tok // 512 AS seq_no, start_tok % 512 AS seq_offset
           |FROM c ORDER BY doc_id""".stripMargin,
      "t22_vocab_ngrams" ->
        """WITH toks AS (
          |  SELECT string_split_regex(trim(text), '\s+') AS ts FROM documents
          |), g AS (
          |  SELECT unnest(CASE WHEN len(ts) < 2 THEN CAST([] AS VARCHAR[])
          |    ELSE list_transform(range(1, len(ts)), i ->
          |      ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1]) END) AS gram
          |  FROM toks
          |)
          |SELECT gram, COUNT(*) AS cnt FROM g GROUP BY gram
          |ORDER BY cnt DESC, gram LIMIT 50""".stripMargin,
      "t23_chunking" ->
        """WITH toks AS (
          |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents
          |), s AS (
          |  SELECT doc_id, ts, len(ts) AS n, unnest(range(0, len(ts), 48)) AS start_tok
          |  FROM toks
          |)
          |SELECT doc_id, CAST(start_tok // 48 AS BIGINT) AS chunk_no,
          |  CAST(start_tok AS BIGINT) AS start_tok,
          |  array_to_string(list_slice(ts, CAST(start_tok + 1 AS INT),
          |    CAST(start_tok + 64 AS INT)), ' ') AS chunk_text,
          |  CAST(least(64, n - start_tok) AS BIGINT) AS chunk_tokens
          |FROM s ORDER BY doc_id, chunk_no""".stripMargin,
      "t24_dup_clusters" -> dupClusterOracleSql(64, 16, 0.5),
      "t78_leakage_safe_splits" -> leakageSplitOracleSql(64, 16, 0.5),
      "t110_group_kfold" -> groupKFoldOracleSql(64, 16, 0.5, k = 5),
      "t80_curation_recipe" ->
        curationRecipeOracleSql(64, 16, 0.5, cap = 20, tempScale = 4.0),
      "t81_split_fractions" -> splitFractionsOracleSql(64, 16, 0.5),
      "t82_epoch_upsample" -> epochUpsampleOracleSql(10),
      "t85_soft_dedup_weights" -> softDedupOracleSql(64, 16, 0.5),
      // t84: both distributed two-phase rankings replayed as naive
      // global ROW_NUMBERs over the same (hash, id) / (key, hash, id)
      // orders — the gate proves the bucketed ranking realizes the
      // exact total order it claims
      // t91: cosines fold sequentially (bit-parity with VecDot), are
      // scaled to BIGINT immediately, and every aggregate after that
      // is an exact integer sum — margin is ONE double division of
      // identical longs in both engines
      "t91_margin_pairs" ->
        s"""WITH v AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
           |    label % 2 = 0 AS side
           |  FROM embeddings
           |), p AS (
           |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           |    CAST(FLOOR(${cosSql("a.e", "b.e")} * 1000000 + 0.5)
           |      AS BIGINT) AS cos_i
           |  FROM v a JOIN v b ON a.side AND NOT b.side
           |), r AS (
           |  SELECT *,
           |    ROW_NUMBER() OVER (PARTITION BY a_id
           |      ORDER BY cos_i DESC, b_id) AS ra,
           |    ROW_NUMBER() OVER (PARTITION BY b_id
           |      ORDER BY cos_i DESC, a_id) AS rb
           |  FROM p
           |), sa AS (
           |  SELECT a_id, SUM(cos_i) AS nnsum_a FROM r
           |  WHERE ra <= 4 GROUP BY a_id
           |), sb AS (
           |  SELECT b_id, SUM(cos_i) AS nnsum_b FROM r
           |  WHERE rb <= 4 GROUP BY b_id
           |), c AS (
           |  SELECT r.a_id, r.b_id, r.cos_i,
           |    CAST(8 * r.cos_i AS DOUBLE) /
           |      CAST(nnsum_a + nnsum_b AS DOUBLE) AS margin
           |  FROM r JOIN sa ON r.a_id = sa.a_id
           |    JOIN sb ON r.b_id = sb.b_id
           |  WHERE (r.ra <= 4 OR r.rb <= 4) AND nnsum_a + nnsum_b > 0
           |), m AS (
           |  SELECT *,
           |    ROW_NUMBER() OVER (PARTITION BY a_id
           |      ORDER BY margin DESC, b_id) AS ma,
           |    ROW_NUMBER() OVER (PARTITION BY b_id
           |      ORDER BY margin DESC, a_id) AS mb
           |  FROM c
           |)
           |SELECT a_id, b_id, cos_i AS cos_x1e6, margin FROM m
           |WHERE ma = 1 AND mb = 1 AND margin > 1.0
           |ORDER BY a_id""".stripMargin,
      // t112: the IVF scale path of t91 — replays the Lloyd quantizer
      // + probe routing (the t16 CTE chain), meets sides only inside
      // probed cells, then runs the identical integer margin tail
      "t112_margin_pairs_ivf" ->
        s"""WITH ${ivfKnnCtes(16, 2)}, vs AS (
           |  SELECT vec_id, label % 2 = 0 AS side FROM embeddings
           |), cand0 AS (
           |  SELECT DISTINCT
           |    CASE WHEN sq.side THEN q.vec_id ELSE l.vec_id END AS a_id,
           |    CASE WHEN sq.side THEN l.vec_id ELSE q.vec_id END AS b_id,
           |    CAST(FLOOR(${cosSql("q.e", "l.e")} * 1000000 + 0.5)
           |      AS BIGINT) AS cos_i
           |  FROM probes q JOIN lists l ON q.cid = l.cid
           |  JOIN vs sq ON sq.vec_id = q.vec_id
           |  JOIN vs sl ON sl.vec_id = l.vec_id
           |  WHERE sq.side <> sl.side
           |), r2 AS (
           |  SELECT *,
           |    ROW_NUMBER() OVER (PARTITION BY a_id
           |      ORDER BY cos_i DESC, b_id) AS ra,
           |    ROW_NUMBER() OVER (PARTITION BY b_id
           |      ORDER BY cos_i DESC, a_id) AS rb
           |  FROM cand0
           |), sa AS (
           |  SELECT a_id, SUM(cos_i) AS nnsum_a FROM r2
           |  WHERE ra <= 4 GROUP BY a_id
           |), sb AS (
           |  SELECT b_id, SUM(cos_i) AS nnsum_b FROM r2
           |  WHERE rb <= 4 GROUP BY b_id
           |), cc AS (
           |  SELECT r2.a_id, r2.b_id, r2.cos_i,
           |    CAST(8 * r2.cos_i AS DOUBLE) /
           |      CAST(nnsum_a + nnsum_b AS DOUBLE) AS margin
           |  FROM r2 JOIN sa ON r2.a_id = sa.a_id
           |    JOIN sb ON r2.b_id = sb.b_id
           |  WHERE (r2.ra <= 4 OR r2.rb <= 4) AND nnsum_a + nnsum_b > 0
           |), m AS (
           |  SELECT *,
           |    ROW_NUMBER() OVER (PARTITION BY a_id
           |      ORDER BY margin DESC, b_id) AS ma,
           |    ROW_NUMBER() OVER (PARTITION BY b_id
           |      ORDER BY margin DESC, a_id) AS mb
           |  FROM cc
           |)
           |SELECT a_id, b_id, cos_i AS cos_x1e6, margin FROM m
           |WHERE ma = 1 AND mb = 1 AND margin > 1.0
           |ORDER BY a_id""".stripMargin,
      // t113: gram construction, PolyHash, and the rightmost-min
      // window fold replayed position-for-position
      "t113_winnow_fingerprints" ->
        s"""WITH ${winnowCtes(4)}
           |SELECT doc_id, s.pos AS pos, s.fp AS fp FROM wsel
           |ORDER BY doc_id, pos, fp""".stripMargin,
      // t114: the winnowed sketch's inverted-index join — distinct
      // selected hashes, df stop cut, shared counts, ppm of the
      // smaller sketch
      "t114_winnow_overlap" ->
        s"""WITH ${winnowCtes(4)}, wf AS (
           |  SELECT DISTINCT doc_id, s.fp AS fp FROM wsel
           |), wsz AS (
           |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
           |  FROM wf GROUP BY doc_id
           |), wdf AS (
           |  SELECT fp FROM wf GROUP BY fp HAVING COUNT(*) <= 1000
           |), wff AS (
           |  SELECT wf.* FROM wf JOIN wdf USING (fp)
           |), wp AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |    CAST(COUNT(*) AS BIGINT) AS n_shared
           |  FROM wff a JOIN wff b ON a.fp = b.fp AND a.doc_id < b.doc_id
           |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
           |)
           |SELECT id_a, id_b, n_shared, sa.sz AS size_a, sb.sz AS size_b,
           |  (n_shared * 1000000) // LEAST(sa.sz, sb.sz) AS overlap_ppm
           |FROM wp JOIN wsz sa ON sa.doc_id = wp.id_a
           |JOIN wsz sb ON sb.doc_id = wp.id_b
           |ORDER BY id_a, id_b""".stripMargin,
      // t115: per-source bottom-k sketches, pairwise merged bottom-k,
      // and the t55 integer estimators for all source pairs
      "t115_source_kmv_overlap" -> kmvOverlapOracleSql(128),
      // t148: the persisted store was split-built (build a third,
      // ingest the rest) — KMV's merge law makes the ONE-SHOT
      // full-corpus replay the exact gate
      "t148_kmv_persisted" -> kmvOverlapOracleSql(64),
      // t149: probe set from the shared idMix hash at a FIXED audit
      // budget (probeMod = max(1, n div 70) — the planesFor ladder's
      // discipline, so the exact side stays ~70·n dots at any scale);
      // ANN side replays the t09 pipeline verbatim; hits are an
      // equi-join of the two top-k sets (bit-identical cosines,
      // shared tie order), never a float compare
      "t149_recall_audit" ->
        s"""WITH v AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           |  FROM embeddings
           |), pm AS (
           |  SELECT GREATEST(1, COUNT(*) // 70) AS probe_mod FROM v
           |), probes AS (
           |  SELECT vec_id FROM v, pm
           |  WHERE ${idMixSql("vec_id")} % probe_mod = 0
           |), ex AS (
           |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           |    list_reduce(list_transform(range(1, 65), i ->
           |      a.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y) /
           |    (sqrt(list_reduce(list_transform(range(1, 65), i ->
           |      a.e[CAST(i AS INT)] * a.e[CAST(i AS INT)]), (x, y) -> x + y)) *
           |     sqrt(list_reduce(list_transform(range(1, 65), i ->
           |      b.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y)))
           |    AS cosine_sim
           |  FROM v a JOIN v b ON a.vec_id <> b.vec_id
           |  WHERE a.vec_id IN (SELECT vec_id FROM probes)
           |), exr AS (
           |  SELECT vec_id, neighbor_id FROM (
           |    SELECT vec_id, neighbor_id,
           |      ROW_NUMBER() OVER (PARTITION BY vec_id
           |        ORDER BY cosine_sim DESC, neighbor_id) AS rank
           |    FROM ex)
           |  WHERE rank <= 3
           |), params AS (
           |  SELECT COUNT(*) AS n FROM v
           |), pl AS (
           |  SELECT CASE WHEN n <= 7680 THEN 8 WHEN n <= 15360 THEN 9 WHEN n <= 30720 THEN 10 WHEN n <= 61440 THEN 11 WHEN n <= 122880 THEN 12 WHEN n <= 245760 THEN 13 WHEN n <= 491520 THEN 14 WHEN n <= 983040 THEN 15 WHEN n <= 1966080 THEN 16 WHEN n <= 3932160 THEN 17 WHEN n <= 7864320 THEN 18 WHEN n <= 15728640 THEN 19 WHEN n <= 31457280 THEN 20 WHEN n <= 62914560 THEN 21 WHEN n <= 125829120 THEN 22 WHEN n <= 251658240 THEN 23 ELSE 24 END AS planes FROM params
           |), proj AS (
           |  SELECT vec_id, p,
           |    list_reduce(list_transform(range(1, 65), i ->
           |      e[CAST(i AS INT)] *
           |      (CASE WHEN ((p * 1024 + i - 1) * 2654435761 + 123456789) % 4294967296
           |                 >= 2147483648
           |            THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)),
           |      (x, y) -> x + y) AS pr
           |  FROM v, pl, range(0, 24) t(p) WHERE t.p < pl.planes
           |), bkt AS (
           |  SELECT vec_id,
           |    CAST(SUM(CASE WHEN pr >= 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
           |  FROM proj GROUP BY vec_id
           |), v2 AS (
           |  SELECT v.vec_id, v.e, bkt.bucket FROM v JOIN bkt USING (vec_id)
           |), p2 AS (
           |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           |    list_reduce(list_transform(range(1, 65), i ->
           |      a.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y) /
           |    (sqrt(list_reduce(list_transform(range(1, 65), i ->
           |      a.e[CAST(i AS INT)] * a.e[CAST(i AS INT)]), (x, y) -> x + y)) *
           |     sqrt(list_reduce(list_transform(range(1, 65), i ->
           |      b.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y)))
           |    AS cosine_sim
           |  FROM v2 a JOIN v2 b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
           |), annr AS (
           |  SELECT vec_id, neighbor_id FROM (
           |    SELECT vec_id, neighbor_id,
           |      ROW_NUMBER() OVER (PARTITION BY vec_id
           |        ORDER BY cosine_sim DESC, neighbor_id) AS rank
           |    FROM p2)
           |  WHERE rank <= 3
           |    AND vec_id IN (SELECT vec_id FROM probes)
           |), hits AS (
           |  SELECT a.vec_id, CAST(COUNT(*) AS BIGINT) AS n_hits
           |  FROM annr a JOIN exr e
           |    ON a.vec_id = e.vec_id AND a.neighbor_id = e.neighbor_id
           |  GROUP BY 1
           |)
           |SELECT p.vec_id, COALESCE(n_hits, 0) AS n_hits,
           |  CAST(3 AS BIGINT) AS k,
           |  (COALESCE(n_hits, 0) * 1000000) // 3 AS recall_ppm
           |FROM probes p LEFT JOIN hits USING (vec_id)
           |ORDER BY p.vec_id""".stripMargin,
      // t150: exact count-quantile cuts from the compressed
      // timestamp histogram; embargo zones after each cut
      "t150_time_split" ->
        """WITH e AS (
          |  SELECT event_id, epoch_us(ts) AS tsu FROM events
          |), h AS (
          |  SELECT tsu, CAST(COUNT(*) AS BIGINT) AS cnt FROM e GROUP BY 1
          |), c AS (
          |  SELECT tsu, SUM(cnt) OVER (ORDER BY tsu
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          |  FROM h
          |), n AS (
          |  SELECT SUM(cnt) AS n FROM h
          |), tg AS (
          |  SELECT p.pct, (p.pct * n + 99) // 100 AS tgt
          |  FROM n, (VALUES (70), (85)) p(pct)
          |), th AS (
          |  SELECT pct, MIN(tsu) AS cut
          |  FROM c JOIN tg ON c.cum >= tg.tgt GROUP BY 1
          |), wide AS (
          |  SELECT MAX(CASE WHEN pct = 70 THEN cut END) AS cut1,
          |    MAX(CASE WHEN pct = 85 THEN cut END) AS cut2
          |  FROM th
          |)
          |SELECT event_id, tsu,
          |  CASE WHEN tsu <= cut1 THEN 'train'
          |       WHEN tsu <= cut1 + 21600000000 THEN 'embargo'
          |       WHEN tsu <= cut2 THEN 'val'
          |       WHEN tsu <= cut2 + 21600000000 THEN 'embargo'
          |       ELSE 'test' END AS split
          |FROM e, wide ORDER BY event_id""".stripMargin,
      // t151: one full MinHash replay per band choice (the oracle
      // pays per-choice what the engine shares via the pinned sig
      // relation — same outputs either way)
      "t151_lsh_curve" -> {
        val per = Seq(4, 8, 16).map { b =>
          s"""  (WITH ${minhashCtes(64, b, 0.5)}
             |  SELECT CAST($b AS BIGINT) AS bands,
             |    CAST(${64 / b} AS BIGINT) AS rows_per_band,
             |    (SELECT CAST(COUNT(*) AS BIGINT) FROM cand)
             |      AS n_candidates,
             |    (SELECT CAST(COUNT(*) AS BIGINT) FROM pairs)
             |      AS n_verified)""".stripMargin
        }.mkString("\n  UNION ALL\n")
        s"""WITH u AS (
           |$per
           |)
           |SELECT bands, rows_per_band, n_candidates, n_verified,
           |  (n_verified * 1000000) // GREATEST(n_candidates, 1)
           |    AS precision_ppm,
           |  (n_verified * 1000000)
           |    // GREATEST((SELECT MAX(n_verified) FROM u), 1)
           |    AS vs_best_ppm
           |FROM u ORDER BY bands""".stripMargin
      },
      // t158: the t56 Bloom chain at the same probes/bits, split-built
      // registry gated by the one-shot replay (words OR-merge),
      // withExact omitted — the registry's production face
      "t158_bloom_persisted" -> {
        val n = DecontamN
        val m = CorpusOps.BloomBits
        s"""WITH toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts FROM documents
           |), grams AS (
           |  SELECT DISTINCT doc_id, unnest(
           |    CASE WHEN len(ts) < $n THEN [array_to_string(ts, ' ')]
           |    ELSE list_transform(range(1, len(ts) - ${n - 2}), i ->
           |      array_to_string(ts[CAST(i AS INT):CAST(i + ${n - 1} AS INT)], ' '))
           |    END) AS g
           |  FROM toks
           |), gh AS (
           |  SELECT doc_id, g, ${polyHashSql("g")} AS hb FROM grams
           |), bh AS (
           |  SELECT DISTINCT hb FROM gh WHERE doc_id % 10 = 0
           |), bpos AS (
           |  SELECT unnest([
           |    (hb * 2654435761 + 123456789) % 4294967296 % $m,
           |    (hb * 2246822519 + 3266489917) % 4294967296 % $m]) AS pos
           |  FROM bh
           |), words AS (
           |  SELECT pos // 64 AS w,
           |    CAST(bit_or(CASE WHEN pos % 64 = 63
           |      THEN (-9223372036854775807 - 1)
           |      ELSE CAST(1 AS BIGINT) << CAST(pos % 64 AS INT) END) AS BIGINT)
           |      AS word
           |  FROM bpos GROUP BY 1
           |), tg AS (
           |  SELECT doc_id,
           |    (hb * 2654435761 + 123456789) % 4294967296 % $m AS p1,
           |    (hb * 2246822519 + 3266489917) % 4294967296 % $m AS p2
           |  FROM gh WHERE doc_id % 10 <> 0
           |), hits AS (
           |  SELECT t.doc_id, CAST(SUM(CASE WHEN
           |      (COALESCE(w1.word, 0) & (CASE WHEN t.p1 % 64 = 63
           |        THEN (-9223372036854775807 - 1)
           |        ELSE CAST(1 AS BIGINT) << CAST(t.p1 % 64 AS INT) END)) <> 0
           |      AND (COALESCE(w2.word, 0) & (CASE WHEN t.p2 % 64 = 63
           |        THEN (-9223372036854775807 - 1)
           |        ELSE CAST(1 AS BIGINT) << CAST(t.p2 % 64 AS INT) END)) <> 0
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
           |  FROM tg t
           |  LEFT JOIN words w1 ON t.p1 // 64 = w1.w
           |  LEFT JOIN words w2 ON t.p2 // 64 = w2.w
           |  GROUP BY 1
           |), sizes AS (
           |  SELECT doc_id, COUNT(*) AS n_shingles FROM grams
           |  WHERE doc_id % 10 <> 0 GROUP BY 1
           |)
           |SELECT s.doc_id, CAST(s.n_shingles AS BIGINT) AS n_shingles,
           |  COALESCE(h.n_hits, 0) AS n_hits,
           |  CAST(COALESCE(h.n_hits, 0) > 0 AS BIGINT) AS flagged
           |FROM sizes s
           |LEFT JOIN hits h USING (doc_id)
           |ORDER BY s.doc_id""".stripMargin
      },
      // t159: the registry's OR-folded words (one-shot == split-built
      // by OR associativity), exact bit_count fill and fp = fill²
      "t159_bloom_stats" -> {
        val n = DecontamN
        val m = CorpusOps.BloomBits
        s"""WITH toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
           |  FROM documents WHERE doc_id % 10 = 0
           |), grams AS (
           |  SELECT DISTINCT doc_id, unnest(
           |    CASE WHEN len(ts) < $n THEN [array_to_string(ts, ' ')]
           |    ELSE list_transform(range(1, len(ts) - ${n - 2}), i ->
           |      array_to_string(ts[CAST(i AS INT):CAST(i + ${n - 1} AS INT)], ' '))
           |    END) AS g
           |  FROM toks
           |), bh AS (
           |  SELECT DISTINCT ${polyHashSql("g")} AS hb FROM grams
           |), bpos AS (
           |  SELECT unnest([
           |    (hb * 2654435761 + 123456789) % 4294967296 % $m,
           |    (hb * 2246822519 + 3266489917) % 4294967296 % $m]) AS pos
           |  FROM bh
           |), words AS (
           |  SELECT pos // 64 AS w,
           |    CAST(bit_or(CASE WHEN pos % 64 = 63
           |      THEN (-9223372036854775807 - 1)
           |      ELSE CAST(1 AS BIGINT) << CAST(pos % 64 AS INT) END) AS BIGINT)
           |      AS word
           |  FROM bpos GROUP BY 1
           |), s AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
           |    CAST(SUM(bit_count(word)) AS BIGINT) AS bits_set
           |  FROM words
           |)
           |SELECT CAST($m AS BIGINT) AS m_bits, n_words, bits_set,
           |  (bits_set * 1000000) // $m AS fill_ppm,
           |  (((bits_set * 1000000) // $m)
           |    * ((bits_set * 1000000) // $m)) // 1000000 AS fp_ppm
           |FROM s""".stripMargin
      },
      // t156: the t02 n-gram predictor per doc, confusion cells,
      // row-normalized ppm
      "t156_lang_agreement" ->
        s"""WITH p AS (
           |  SELECT lang AS declared, ${T.langId("text")} AS predicted
           |  FROM documents
           |), c AS (
           |  SELECT declared, predicted,
           |    CAST(COUNT(*) AS BIGINT) AS n_docs
           |  FROM p GROUP BY 1, 2
           |), rw AS (
           |  SELECT declared, SUM(n_docs) AS tot FROM c GROUP BY 1
           |)
           |SELECT c.declared, predicted, n_docs,
           |  c.declared = predicted AS agree,
           |  CAST((n_docs * 1000000) // tot AS BIGINT) AS row_ppm
           |FROM c JOIN rw ON c.declared = rw.declared
           |ORDER BY c.declared, predicted""".stripMargin,
      // t157: the t121 canonical-election chain with the budget
      // restated in tokens
      "t157_effective_tokens" ->
        s"""WITH RECURSIVE ${minhashCtes(64, 16, 0.5)}, edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION
           |  SELECT id_b AS src, id_a AS dst FROM pairs
           |), reach AS (
           |  SELECT src, dst FROM edges
           |  UNION
           |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
           |), sel AS (
           |  SELECT src, dst FROM reach
           |  UNION
           |  SELECT src, src AS dst FROM edges
           |), comp AS (
           |  SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS cluster_id
           |  FROM sel GROUP BY src
           |), qterm AS (
           |  SELECT doc_id, unnest(ts) AS term FROM toks
           |), qtf AS (
           |  SELECT doc_id, term, COUNT(*) AS tf FROM qterm GROUP BY 1, 2
           |), qcnt AS (
           |  SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM qtf GROUP BY term
           |), qagg AS (
           |  SELECT qtf.doc_id,
           |    CAST(SUM(qtf.tf * qcnt.cnt) AS BIGINT)
           |      // CAST(SUM(qtf.tf) AS BIGINT) AS score
           |  FROM qtf JOIN qcnt USING (term) GROUP BY 1
           |), r AS (
           |  SELECT c.doc_id,
           |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
           |      ORDER BY q.score DESC, c.doc_id) AS rn
           |  FROM comp c JOIN qagg q USING (doc_id)
           |), tk AS (
           |  SELECT t.doc_id, d.source, CAST(len(t.ts) AS BIGINT) AS n_tokens
           |  FROM toks t JOIN documents d USING (doc_id)
           |)
           |SELECT source,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n_tokens) AS BIGINT) AS raw_tokens,
           |  CAST(SUM(CASE WHEN r.doc_id IS NULL OR r.rn = 1
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
           |  CAST(SUM(CASE WHEN r.doc_id IS NULL OR r.rn = 1
           |    THEN n_tokens ELSE 0 END) AS BIGINT) AS effective_tokens,
           |  (CAST(SUM(CASE WHEN r.doc_id IS NULL OR r.rn = 1
           |    THEN n_tokens ELSE 0 END) AS BIGINT) * 1000000)
           |    // GREATEST(CAST(SUM(n_tokens) AS BIGINT), 1)
           |    AS effective_x1e6
           |FROM tk LEFT JOIN r ON tk.doc_id = r.doc_id
           |GROUP BY source ORDER BY source""".stripMargin,
      // t155: median-time cut from the compressed ts histogram, lag
      // pairs per (user, half), per-half ppm, full-outer deviations
      "t155_behavior_drift" ->
        """WITH e AS (
          |  SELECT user_id, epoch_us(ts) AS tsu, event_id,
          |    event_type AS to_type
          |  FROM events
          |), h AS (
          |  SELECT tsu, CAST(COUNT(*) AS BIGINT) AS cnt FROM e GROUP BY 1
          |), n AS (
          |  SELECT SUM(cnt) AS n FROM h
          |), cu AS (
          |  SELECT tsu, SUM(cnt) OVER (ORDER BY tsu
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          |  FROM h
          |), ct AS (
          |  SELECT MIN(tsu) AS cut FROM cu, n WHERE cum >= (n + 1) // 2
          |), p AS (
          |  SELECT CASE WHEN tsu <= (SELECT cut FROM ct)
          |           THEN 1 ELSE 2 END AS half,
          |    user_id, tsu, event_id, to_type,
          |    LAG(to_type) OVER (
          |      PARTITION BY user_id,
          |        CASE WHEN tsu <= (SELECT cut FROM ct) THEN 1 ELSE 2 END
          |      ORDER BY tsu, event_id) AS from_type
          |  FROM e
          |), c AS (
          |  SELECT half, from_type, to_type,
          |    CAST(COUNT(*) AS BIGINT) AS cnt
          |  FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2, 3
          |), tt AS (
          |  SELECT half, SUM(cnt) AS tot FROM c GROUP BY 1
          |), pp AS (
          |  SELECT c.half, from_type, to_type, cnt,
          |    CAST((cnt * 1000000) // tot AS BIGINT) AS ppm
          |  FROM c JOIN tt ON c.half = tt.half
          |), h1 AS (
          |  SELECT from_type, to_type, cnt AS n_first, ppm AS ppm_first
          |  FROM pp WHERE half = 1
          |), h2 AS (
          |  SELECT from_type, to_type, cnt AS n_second, ppm AS ppm_second
          |  FROM pp WHERE half = 2
          |)
          |SELECT COALESCE(h1.from_type, h2.from_type) AS from_type,
          |  COALESCE(h1.to_type, h2.to_type) AS to_type,
          |  COALESCE(n_first, 0) AS n_first,
          |  COALESCE(n_second, 0) AS n_second,
          |  COALESCE(ppm_first, 0) AS ppm_first,
          |  COALESCE(ppm_second, 0) AS ppm_second,
          |  ABS(COALESCE(ppm_first, 0) - COALESCE(ppm_second, 0))
          |    AS dev_ppm
          |FROM h1 FULL OUTER JOIN h2
          |  ON h1.from_type = h2.from_type AND h1.to_type = h2.to_type
          |ORDER BY from_type, to_type""".stripMargin,
      // t154: the t13 bucketed pair chain at threshold 0.5 + the
      // t137 split/cell tail — paraphrase contamination, cell-exact
      "t154_semantic_leakage" ->
        s"""WITH v AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
           |), params AS (
           |  SELECT COUNT(*) AS n FROM v
           |), pl AS (
           |  SELECT CASE WHEN n <= 7680 THEN 8 WHEN n <= 15360 THEN 9 WHEN n <= 30720 THEN 10 WHEN n <= 61440 THEN 11 WHEN n <= 122880 THEN 12 WHEN n <= 245760 THEN 13 WHEN n <= 491520 THEN 14 WHEN n <= 983040 THEN 15 WHEN n <= 1966080 THEN 16 WHEN n <= 3932160 THEN 17 WHEN n <= 7864320 THEN 18 WHEN n <= 15728640 THEN 19 WHEN n <= 31457280 THEN 20 WHEN n <= 62914560 THEN 21 WHEN n <= 125829120 THEN 22 WHEN n <= 251658240 THEN 23 ELSE 24 END AS planes FROM params
           |), proj AS (
           |  SELECT vec_id, p,
           |    list_reduce(list_transform(range(1, 65), i ->
           |      e[CAST(i AS INT)] *
           |      (CASE WHEN ((p * 1024 + i - 1) * 2654435761 + 123456789) % 4294967296
           |                 >= 2147483648
           |            THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)),
           |      (x, y) -> x + y) AS pr
           |  FROM v, pl, range(0, 24) t(p) WHERE t.p < pl.planes
           |), bkt AS (
           |  SELECT vec_id,
           |    CAST(SUM(CASE WHEN pr >= 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
           |  FROM proj GROUP BY vec_id
           |), v2 AS (
           |  SELECT v.vec_id, v.e, bkt.bucket FROM v JOIN bkt USING (vec_id)
           |), p2 AS (
           |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           |    list_reduce(list_transform(range(1, 65), i ->
           |      a.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y) /
           |    (sqrt(list_reduce(list_transform(range(1, 65), i ->
           |      a.e[CAST(i AS INT)] * a.e[CAST(i AS INT)]), (x, y) -> x + y)) *
           |     sqrt(list_reduce(list_transform(range(1, 65), i ->
           |      b.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y)))
           |    AS cosine_sim
           |  FROM v2 a JOIN v2 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |), pr2 AS (
           |  SELECT id_a, id_b FROM p2 WHERE cosine_sim >= 0.4
           |), sp AS (
           |  SELECT vec_id AS doc_id,
           |    CASE WHEN ${idMixSql("vec_id")} % 100 < 10 THEN 'val'
           |         WHEN ${idMixSql("vec_id")} % 100 < 20 THEN 'test'
           |         ELSE 'train' END AS split
           |  FROM v
           |), cells AS (
           |  SELECT LEAST(sa.split, sb.split) AS split_a,
           |    GREATEST(sa.split, sb.split) AS split_b,
           |    CAST(COUNT(*) AS BIGINT) AS n_pairs
           |  FROM pr2 p JOIN sp sa ON p.id_a = sa.doc_id
           |  JOIN sp sb ON p.id_b = sb.doc_id
           |  GROUP BY 1, 2
           |), tot AS (
           |  SELECT CAST(SUM(n_pairs) AS BIGINT) AS n_total FROM cells
           |)
           |SELECT split_a, split_b, n_pairs,
           |  split_a <> split_b AS leaked,
           |  (n_pairs * 1000000) // n_total AS share_ppm
           |FROM cells, tot
           |ORDER BY split_a, split_b""".stripMargin,
      // t153: Lloyd replay over the index split; BOTH assignments
      // under the frozen lc2 centroids; nlist-row arithmetic
      "t153_ivf_staleness" ->
        s"""WITH v AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
           |  FROM embeddings
           |), idxv AS (
           |  SELECT * FROM v WHERE vec_id % 10 = 0
           |), ${lloydCtes("idxv", 16)}, ia AS (
           |  SELECT vec_id, cid FROM (
           |    SELECT w.vec_id, c.cid,
           |      ROW_NUMBER() OVER (PARTITION BY w.vec_id
           |        ORDER BY ${cosSql("w.e", "c.ce")} DESC, c.cid) AS pr
           |    FROM idxv w, lc2 c) x
           |  WHERE pr = 1
           |), ca AS (
           |  SELECT vec_id, cid FROM (
           |    SELECT w.vec_id, c.cid,
           |      ROW_NUMBER() OVER (PARTITION BY w.vec_id
           |        ORDER BY ${cosSql("w.e", "c.ce")} DESC, c.cid) AS pr
           |    FROM v w, lc2 c) x
           |  WHERE pr = 1
           |), ni AS (
           |  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_indexed
           |  FROM ia GROUP BY 1
           |), nc AS (
           |  SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_current
           |  FROM ca GROUP BY 1
           |), j AS (
           |  SELECT lc2.cid AS cell,
           |    COALESCE(n_indexed, 0) AS n_indexed,
           |    COALESCE(n_current, 0) AS n_current
           |  FROM lc2
           |  LEFT JOIN ni ON ni.cid = lc2.cid
           |  LEFT JOIN nc ON nc.cid = lc2.cid
           |), t AS (
           |  SELECT SUM(n_indexed) AS ti, SUM(n_current) AS tc FROM j
           |)
           |SELECT cell, n_indexed, n_current,
           |  CAST((n_indexed * 1000000) // GREATEST(ti, 1) AS BIGINT)
           |    AS indexed_ppm,
           |  CAST((n_current * 1000000) // GREATEST(tc, 1) AS BIGINT)
           |    AS current_ppm,
           |  CAST(ABS((n_indexed * 1000000) // GREATEST(ti, 1)
           |    - (n_current * 1000000) // GREATEST(tc, 1)) AS BIGINT)
           |    AS drift_ppm
           |FROM j, t ORDER BY cell""".stripMargin,
      // t152: fit(1/3) + ingest(2/3) == one-shot full-corpus
      // histogram (histograms add); per-doc percentile = cum at its
      // own score (every transformed score exists in the reference
      // here; the engine's lookup is the general <= struct-MAX)
      "t152_quantile_persisted" ->
        """WITH s AS (
          |  SELECT doc_id, CAST(n_chars AS BIGINT) AS score
          |  FROM documents
          |), h AS (
          |  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt
          |  FROM s GROUP BY 1
          |), c AS (
          |  SELECT score, SUM(cnt) OVER (ORDER BY score
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |    AS ref_cum
          |  FROM h
          |), n AS (
          |  SELECT SUM(cnt) AS n_ref FROM h
          |)
          |SELECT doc_id, score, CAST(ref_cum AS BIGINT) AS ref_cum,
          |  CAST((ref_cum * 1000000) // GREATEST(n_ref, 1) AS BIGINT)
          |    AS pct_ppm
          |FROM s JOIN c USING (score) CROSS JOIN n
          |ORDER BY doc_id""".stripMargin,
      // t116: the sharded-hash order, global cumsum, pointer floors,
      // and split-exact ppm inclusion probability
      "t116_pps_sample" ->
        s"""WITH b AS (
           |  SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           |    ${idMixSql("doc_id")} AS ord
           |  FROM documents WHERE n_chars > 0
           |), c AS (
           |  SELECT doc_id, weight,
           |    CAST(SUM(weight) OVER (ORDER BY ord % 64, ord, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS cum_after
           |  FROM b
           |), t AS (
           |  SELECT CAST(SUM(weight) AS BIGINT) AS w_tot FROM b
           |)
           |SELECT doc_id, weight, cum_after - weight AS cum_before,
           |  (50 * cum_after) // w_tot
           |    - (50 * (cum_after - weight)) // w_tot AS n_copies,
           |  CAST(LEAST(1000000, ((50 * weight) // w_tot) * 1000000
           |    + (((50 * weight) % w_tot) * 1000000) // w_tot)
           |    AS BIGINT) AS pi_x1e6
           |FROM c, t
           |WHERE (50 * cum_after) // w_tot
           |  - (50 * (cum_after - weight)) // w_tot > 0
           |ORDER BY doc_id""".stripMargin,
      // t117: token/bigram multiset counts and the TWO chained exact
      // HUGEINT floors of the lift contract (s1 then lift — matches
      // the engine's overflow-safe two-step form) — no logs, no
      // doubles
      "t117_collocations" ->
        """WITH toks AS (
          |  SELECT string_split_regex(trim(text), '\s+') AS ts FROM documents
          |), u AS (
          |  SELECT unnest(ts) AS w FROM toks
          |), uni AS (
          |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w FROM u GROUP BY w
          |), ntok AS (
          |  SELECT CAST(SUM(n_w) AS BIGINT) AS n_tok FROM uni
          |), bg AS (
          |  SELECT unnest(CASE WHEN len(ts) < 2 THEN CAST([] AS VARCHAR[])
          |    ELSE list_transform(range(1, len(ts)), i ->
          |      ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1]) END) AS g
          |  FROM toks
          |), bi_all AS (
          |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_ab FROM bg GROUP BY g
          |), nbi AS (
          |  SELECT CAST(SUM(n_ab) AS BIGINT) AS n_bi FROM bi_all
          |), bi AS (
          |  SELECT string_split(g, ' ')[1] AS w1, string_split(g, ' ')[2] AS w2,
          |    n_ab
          |  FROM bi_all WHERE n_ab >= 5
          |)
          |SELECT w1, w2, n_ab, n_a, n_b,
          |  CAST((s1 * n_tok) // n_b AS BIGINT) AS lift_x1e6
          |FROM (
          |  SELECT w1, w2, n_ab, a.n_w AS n_a, b.n_w AS n_b, n_tok,
          |    (CAST(n_ab AS HUGEINT) * n_tok * 1000000)
          |      // (CAST(a.n_w AS HUGEINT) * n_bi) AS s1
          |  FROM bi JOIN uni a ON a.w = bi.w1
          |  JOIN uni b ON b.w = bi.w2, ntok, nbi
          |)
          |ORDER BY w1, w2""".stripMargin,
      // t118: compressed (group, score) histograms, cumulative counts,
      // the HUGEINT ceiling target, and the >=-join quantile lookup
      "t118_quantile_norm" ->
        """WITH b AS (
          |  SELECT doc_id, source AS grp, CAST(n_chars AS BIGINT) AS score
          |  FROM documents
          |), gh AS (
          |  SELECT grp, score, CAST(COUNT(*) AS BIGINT) AS cnt
          |  FROM b GROUP BY 1, 2
          |), cumg AS (
          |  SELECT grp, score,
          |    CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY score)
          |      AS BIGINT) AS q
          |  FROM gh
          |), ng AS (
          |  SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n_g FROM gh GROUP BY grp
          |), g AS (
          |  SELECT score, CAST(SUM(cnt) AS BIGINT) AS gcnt FROM gh GROUP BY score
          |), gc AS (
          |  SELECT score AS gs,
          |    CAST(SUM(gcnt) OVER (ORDER BY score) AS BIGINT) AS gcum
          |  FROM g
          |), tot AS (
          |  SELECT CAST(SUM(gcnt) AS BIGINT) AS n_tot FROM g
          |), tgt AS (
          |  SELECT c.grp, c.score, c.q, ng.n_g,
          |    CAST((CAST(c.q AS HUGEINT) * n_tot + ng.n_g - 1) // ng.n_g
          |      AS BIGINT) AS target
          |  FROM cumg c JOIN ng USING (grp), tot
          |), lk AS (
          |  SELECT grp, score, q, n_g, MIN(gs) AS norm_score
          |  FROM tgt JOIN gc ON gcum >= target GROUP BY 1, 2, 3, 4
          |)
          |SELECT b.doc_id, b.grp, b.score, lk.q, lk.n_g, lk.norm_score
          |FROM b JOIN lk ON b.grp = lk.grp AND b.score = lk.score
          |ORDER BY doc_id""".stripMargin,
      // t119: per-user ordered gaps, the (gap, id)-ranked lower
      // median, and exact integer burst/span statistics
      "t119_gap_features" ->
        """WITH e AS (
          |  SELECT user_id, epoch_us(ts) AS tsu, event_id FROM events
          |), g0 AS (
          |  SELECT user_id, event_id,
          |    tsu - LAG(tsu) OVER (
          |      PARTITION BY user_id ORDER BY tsu, event_id) AS gap
          |  FROM e
          |), g AS (
          |  SELECT user_id, event_id, gap,
          |    ROW_NUMBER() OVER (
          |      PARTITION BY user_id ORDER BY gap, event_id) AS rn,
          |    COUNT(*) OVER (PARTITION BY user_id) AS ng
          |  FROM g0 WHERE gap IS NOT NULL
          |), gs AS (
          |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_gaps,
          |    MIN(gap) AS min_gap_us,
          |    MIN(CASE WHEN rn = (ng + 1) // 2 THEN gap END) AS median_gap_us,
          |    MAX(gap) AS max_gap_us,
          |    CAST(SUM(CASE WHEN gap < 1000000 THEN 1 ELSE 0 END)
          |      AS BIGINT) AS bursts
          |  FROM g GROUP BY user_id
          |), pu AS (
          |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
          |    MAX(tsu) - MIN(tsu) AS span_us
          |  FROM e GROUP BY user_id
          |)
          |SELECT pu.user_id, pu.n_events,
          |  COALESCE(gs.n_gaps, 0) AS n_gaps,
          |  gs.min_gap_us, gs.median_gap_us, gs.max_gap_us,
          |  COALESCE(gs.bursts, 0) AS bursts, pu.span_us
          |FROM pu LEFT JOIN gs USING (user_id)
          |ORDER BY user_id""".stripMargin,
      // t120: the t78 component+split replay joined to sources, the
      // static split × realized-source cross, and single-floor ppm
      // marginal arithmetic
      "t120_split_source_balance" ->
        s"""WITH RECURSIVE ${minhashCtes(64, 16, 0.5)},
           |mpairs AS MATERIALIZED (
           |  SELECT id_a, id_b FROM pairs
           |), edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM mpairs
           |  UNION
           |  SELECT id_b AS src, id_a AS dst FROM mpairs
           |), reach AS (
           |  SELECT src, dst FROM edges
           |  UNION
           |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
           |), sel AS (
           |  SELECT src, dst FROM reach
           |  UNION
           |  SELECT src, src AS dst FROM edges
           |), comp AS (
           |  SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS root
           |  FROM sel GROUP BY src
           |), keyed AS (
           |  SELECT d.doc_id, d.source, COALESCE(c.root, d.doc_id) AS group_key
           |  FROM documents d LEFT JOIN comp c USING (doc_id)
           |), spl AS (
           |  SELECT doc_id, source,
           |    CASE WHEN ${idMixSql("group_key")} % 100 < 10 THEN 'val'
           |         WHEN ${idMixSql("group_key")} % 100 < 20 THEN 'test'
           |         ELSE 'train' END AS split
           |  FROM keyed
           |), cell0 AS (
           |  SELECT split, source, CAST(COUNT(*) AS BIGINT) AS n_docs
           |  FROM spl GROUP BY 1, 2
           |), cr AS (
           |  SELECT sp.split, so.source
           |  FROM (VALUES ('train'), ('val'), ('test')) sp(split)
           |  CROSS JOIN (SELECT DISTINCT source FROM cell0) so
           |), cell AS (
           |  SELECT cr.split, cr.source, COALESCE(n_docs, 0) AS n_docs
           |  FROM cr LEFT JOIN cell0 USING (split, source)
           |), bs AS (
           |  SELECT source, CAST(SUM(n_docs) AS BIGINT) AS source_total
           |  FROM cell GROUP BY source
           |), bp AS (
           |  SELECT split, CAST(SUM(n_docs) AS BIGINT) AS split_total
           |  FROM cell GROUP BY split
           |), t AS (
           |  SELECT CAST(SUM(n_docs) AS BIGINT) AS n_total FROM cell
           |)
           |SELECT cell.split, cell.source, n_docs, source_total, split_total,
           |  (split_total * 1000000) // n_total AS expected_x1e6,
           |  (n_docs * 1000000) // GREATEST(source_total, 1) AS actual_x1e6,
           |  abs((n_docs * 1000000) // GREATEST(source_total, 1)
           |    - (split_total * 1000000) // n_total) AS dev_x1e6
           |FROM cell JOIN bs USING (source) JOIN bp USING (split), t
           |ORDER BY split, source""".stripMargin,
      // t121: the t42 canonical-election replay, left-joined to the
      // corpus: survive = unclustered OR per-cluster argmax
      "t121_dedup_survivorship" ->
        s"""WITH RECURSIVE ${minhashCtes(64, 16, 0.5)}, edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION
           |  SELECT id_b AS src, id_a AS dst FROM pairs
           |), reach AS (
           |  SELECT src, dst FROM edges
           |  UNION
           |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
           |), sel AS (
           |  SELECT src, dst FROM reach
           |  UNION
           |  SELECT src, src AS dst FROM edges
           |), comp AS (
           |  SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS cluster_id
           |  FROM sel GROUP BY src
           |), qterm AS (
           |  SELECT doc_id, unnest(ts) AS term FROM toks
           |), qtf AS (
           |  SELECT doc_id, term, COUNT(*) AS tf FROM qterm GROUP BY 1, 2
           |), qcnt AS (
           |  SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM qtf GROUP BY term
           |), qagg AS (
           |  SELECT qtf.doc_id,
           |    CAST(SUM(qtf.tf * qcnt.cnt) AS BIGINT)
           |      // CAST(SUM(qtf.tf) AS BIGINT) AS score
           |  FROM qtf JOIN qcnt USING (term) GROUP BY 1
           |), r AS (
           |  SELECT c.doc_id,
           |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
           |      ORDER BY q.score DESC, c.doc_id) AS rn
           |  FROM comp c JOIN qagg q USING (doc_id)
           |)
           |SELECT d.source,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(CASE WHEN r.doc_id IS NOT NULL THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_clustered,
           |  CAST(SUM(CASE WHEN r.doc_id IS NULL OR r.rn = 1 THEN 1 ELSE 0 END)
           |    AS BIGINT) AS n_survivors,
           |  (CAST(SUM(CASE WHEN r.doc_id IS NULL OR r.rn = 1 THEN 1 ELSE 0 END)
           |    AS BIGINT) * 1000000)
           |    // GREATEST(CAST(COUNT(*) AS BIGINT), 1) AS survival_x1e6
           |FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id
           |GROUP BY d.source
           |ORDER BY d.source""".stripMargin,
      // t122: exact shift-decayed weights + the t116 pointer walk
      // (same sharded-hash order, keyed by event_id)
      "t122_freshness_sample" ->
        s"""WITH e AS (
           |  SELECT event_id, epoch_us(ts) AS tsu FROM events
           |), mx AS (
           |  SELECT MAX(tsu) AS m FROM e
           |), b AS (
           |  SELECT event_id AS doc_id,
           |    1000000 // (1 << LEAST((m - tsu) // ${7L * 86400L * 1000000L},
           |      19)) AS weight,
           |    ${idMixSql("event_id")} AS ord
           |  FROM e, mx
           |  WHERE 1000000 // (1 << LEAST((m - tsu) // ${7L * 86400L * 1000000L},
           |    19)) > 0
           |), c AS (
           |  SELECT doc_id, weight,
           |    CAST(SUM(weight) OVER (ORDER BY ord % 64, ord, doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS cum_after
           |  FROM b
           |), t AS (
           |  SELECT CAST(SUM(weight) AS BIGINT) AS w_tot FROM b
           |)
           |SELECT doc_id, weight, cum_after - weight AS cum_before,
           |  (50 * cum_after) // w_tot
           |    - (50 * (cum_after - weight)) // w_tot AS n_copies,
           |  CAST(LEAST(1000000, ((50 * weight) // w_tot) * 1000000
           |    + (((50 * weight) % w_tot) * 1000000) // w_tot)
           |    AS BIGINT) AS pi_x1e6
           |FROM c, t
           |WHERE (50 * cum_after) // w_tot
           |  - (50 * (cum_after - weight)) // w_tot > 0
           |ORDER BY doc_id""".stripMargin,
      // t123: (user, type) counts folded to Gini impurity with one
      // HUGEINT floor; modal share is a single integer division
      "t123_behavioral_diversity" ->
        """WITH c AS (
          |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n_t
          |  FROM events GROUP BY 1, 2
          |), u AS (
          |  SELECT user_id, CAST(SUM(n_t) AS BIGINT) AS n_events,
          |    CAST(COUNT(*) AS BIGINT) AS n_types,
          |    MAX(n_t) AS modal_n,
          |    CAST(SUM(n_t * n_t) AS BIGINT) AS sq
          |  FROM c GROUP BY user_id
          |)
          |SELECT user_id, n_events, n_types,
          |  CAST(1000000 - (CAST(sq AS HUGEINT) * 1000000)
          |    // (CAST(n_events AS HUGEINT) * n_events) AS BIGINT)
          |    AS gini_x1e6,
          |  (modal_n * 1000000) // n_events AS modal_share_x1e6
          |FROM u ORDER BY user_id""".stripMargin,
      // t124: the component replay collapsed to per-cluster sizes, a
      // size histogram with the singleton row, and ppm mass floors
      "t124_cluster_histogram" ->
        s"""WITH RECURSIVE ${minhashCtes(64, 16, 0.5)}, edges AS (
           |  SELECT id_a AS src, id_b AS dst FROM pairs
           |  UNION
           |  SELECT id_b AS src, id_a AS dst FROM pairs
           |), reach AS (
           |  SELECT src, dst FROM edges
           |  UNION
           |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
           |), sel AS (
           |  SELECT src, dst FROM reach
           |  UNION
           |  SELECT src, src AS dst FROM edges
           |), comp AS (
           |  SELECT src AS doc_id, CAST(MIN(dst) AS BIGINT) AS root
           |  FROM sel GROUP BY src
           |), csz AS (
           |  SELECT root, CAST(COUNT(*) AS BIGINT) AS sz FROM comp GROUP BY root
           |), chist AS (
           |  SELECT sz, CAST(COUNT(*) AS BIGINT) AS n_clusters
           |  FROM csz GROUP BY sz
           |), nt AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents
           |), nc AS (
           |  SELECT CAST(COALESCE(SUM(sz), 0) AS BIGINT) AS c FROM csz
           |), rows0 AS (
           |  SELECT sz, n_clusters FROM chist
           |  UNION ALL
           |  SELECT 1 AS sz, n - c AS n_clusters FROM nt, nc WHERE n - c > 0
           |)
           |SELECT sz AS cluster_size, n_clusters,
           |  sz * n_clusters AS n_docs,
           |  (sz * n_clusters * 1000000) // GREATEST(n, 1) AS docs_ppm
           |FROM rows0, nt
           |ORDER BY cluster_size""".stripMargin,
      // t125: b-bit truncation of the replayed signatures, per-pair
      // agreement counts over the band candidates, clamp-then-divide
      // correction, exact Jaccard alongside (LEFT join p0: a band-key
      // collision pair may share zero grams)
      "t125_bbit_minhash" ->
        s"""WITH ${minhashCtes(64, 16, 0.5)}, bb AS (
           |  SELECT doc_id, j, v % 16 AS vb FROM sig
           |), bmatch AS (
           |  SELECT c.id_a, c.id_b,
           |    CAST(SUM(CASE WHEN a.vb = b.vb THEN 1 ELSE 0 END)
           |      AS BIGINT) AS matches
           |  FROM cand c
           |  JOIN bb a ON a.doc_id = c.id_a
           |  JOIN bb b ON b.doc_id = c.id_b AND a.j = b.j
           |  GROUP BY 1, 2
           |), ex AS (
           |  SELECT c.id_a, c.id_b,
           |    CAST(COALESCE(p0.nc, 0) AS BIGINT) AS nc,
           |    CAST(sa.sz AS BIGINT) AS sza, CAST(sb.sz AS BIGINT) AS szb
           |  FROM cand c
           |  LEFT JOIN p0 ON p0.id_a = c.id_a AND p0.id_b = c.id_b
           |  JOIN sizes sa ON c.id_a = sa.doc_id
           |  JOIN sizes sb ON c.id_b = sb.doc_id
           |)
           |SELECT m.id_a, m.id_b, m.matches,
           |  (m.matches * 1000000) // 64 AS f_x1e6,
           |  (GREATEST((m.matches * 1000000) // 64 - 62500, 0) * 1000000)
           |    // 937500 AS est_jaccard_x1e6,
           |  (ex.nc * 1000000) // (ex.sza + ex.szb - ex.nc) AS jaccard_x1e6
           |FROM bmatch m JOIN ex ON m.id_a = ex.id_a AND m.id_b = ex.id_b
           |ORDER BY m.id_a, m.id_b""".stripMargin,
      // t126: the winnow replay split index-vs-batch; counts via a
      // LEFT join so fingerprint-less docs surface admitted
      "t126_winnow_admission" -> winnowAdmissionSql,
      // t134: the persisted-index lifecycle answers the SAME
      // admission question from the stored relation — one oracle,
      // two engine paths (in-query t126, fp-bucketed store t134)
      "t134_winnow_persisted" -> winnowAdmissionSql,
      // t127: key counts, (cnt desc, key) top-k, ppm shares and the
      // integer ceiling salt factor
      "t127_key_skew" ->
        """WITH c AS (
          |  SELECT CAST(event_type AS VARCHAR) AS key,
          |    CAST(COUNT(*) AS BIGINT) AS cnt
          |  FROM events GROUP BY 1
          |), t AS (
          |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
          |    CAST(COUNT(*) AS BIGINT) AS n_keys
          |  FROM c
          |), r AS (
          |  SELECT key, cnt,
          |    ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rank
          |  FROM c
          |)
          |SELECT CAST(rank AS BIGINT) AS rank, key, cnt, n_rows, n_keys,
          |  (cnt * 1000000) // n_rows AS share_ppm,
          |  GREATEST(1, (cnt * 32 + n_rows - 1) // n_rows) AS suggested_salt
          |FROM r, t WHERE rank <= 10
          |ORDER BY rank""".stripMargin,
      // t128: the new snapshot rebuilt in SQL; TEXT compared directly
      // where the engine compares digests (t04 compression discipline)
      "t128_snapshot_diff" ->
        """WITH o AS (
          |  SELECT doc_id, text FROM documents
          |), n AS (
          |  SELECT doc_id,
          |    CASE WHEN doc_id % 7 = 0 THEN text || ' rev9' ELSE text END
          |      AS text
          |  FROM documents WHERE doc_id % 13 <> 0
          |)
          |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
          |  CASE WHEN o.doc_id IS NULL THEN 'added'
          |       WHEN n.doc_id IS NULL THEN 'removed'
          |       WHEN o.text <> n.text THEN 'changed'
          |       ELSE 'unchanged' END AS status
          |FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
          |ORDER BY doc_id""".stripMargin,
      // t129: (group, token) counts with the per-group (cnt desc,
      // token) rank cut
      "t129_top_tokens" ->
        s"""WITH c AS (
           |  SELECT source AS grp, unnest(${TextFunctions.Sql.tokens("text")})
           |    AS token
           |  FROM documents
           |), cnts AS (
           |  SELECT grp, token, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM c GROUP BY 1, 2
           |), r AS (
           |  SELECT grp, token, cnt,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY grp
           |      ORDER BY cnt DESC, token) AS BIGINT) AS rank
           |  FROM cnts
           |)
           |SELECT grp AS source, rank, token, cnt FROM r WHERE rank <= 3
           |ORDER BY source, rank""".stripMargin,
      // t130: per-user lag pairs, cell counts, one ppm floor per row
      "t130_event_transitions" ->
        """WITH e AS (
          |  SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type
          |  FROM events
          |), p AS (
          |  SELECT LAG(event_type) OVER (
          |      PARTITION BY user_id ORDER BY tsu, event_id) AS from_type,
          |    event_type AS to_type
          |  FROM e
          |), cells AS (
          |  SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS cnt
          |  FROM p WHERE from_type IS NOT NULL GROUP BY 1, 2
          |), rows0 AS (
          |  SELECT from_type, CAST(SUM(cnt) AS BIGINT) AS rt
          |  FROM cells GROUP BY from_type
          |)
          |SELECT c.from_type, c.to_type, c.cnt,
          |  (c.cnt * 1000000) // r.rt AS row_ppm
          |FROM cells c JOIN rows0 r USING (from_type)
          |ORDER BY c.from_type, c.to_type""".stripMargin,
      // t131: token counts, the (cnt desc, token) bounded head, and
      // cumulative-mass ppm floors per ladder step
      "t131_vocab_mass" ->
        s"""WITH c AS (
           |  SELECT unnest(${TextFunctions.Sql.tokens("text")}) AS w
           |  FROM documents
           |), cnts AS (
           |  SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM c GROUP BY w
           |), t AS (
           |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_tok,
           |    CAST(COUNT(*) AS BIGINT) AS n_vocab
           |  FROM cnts
           |), r AS (
           |  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rk
           |  FROM cnts
           |), steps(k) AS (
           |  VALUES (CAST(10 AS BIGINT)), (CAST(100 AS BIGINT)),
           |    (CAST(1000 AS BIGINT))
           |)
           |SELECT s.k,
           |  CAST(SUM(CASE WHEN r.rk <= s.k THEN r.cnt ELSE 0 END)
           |    AS BIGINT) AS head_mass,
           |  ANY_VALUE(n_tok) AS n_tok, ANY_VALUE(n_vocab) AS n_vocab,
           |  (CAST(SUM(CASE WHEN r.rk <= s.k THEN r.cnt ELSE 0 END)
           |    AS BIGINT) * 1000000) // GREATEST(ANY_VALUE(n_tok), 1)
           |    AS mass_ppm
           |FROM steps s, r, t
           |GROUP BY s.k ORDER BY s.k""".stripMargin,
      // t132: (user, hour) cells folded to the earliest-tied peak
      // hour, its ppm share, and the active-hour count
      "t132_circadian" ->
        s"""WITH e AS (
           |  SELECT user_id,
           |    (epoch_us(ts) // ${3600L * 1000000L}) % 24 AS hour
           |  FROM events
           |), h AS (
           |  SELECT user_id, hour, CAST(COUNT(*) AS BIGINT) AS n_h
           |  FROM e GROUP BY 1, 2
           |), pk AS (
           |  SELECT user_id, hour AS peak_hour, n_h AS peak_n,
           |    ROW_NUMBER() OVER (PARTITION BY user_id
           |      ORDER BY n_h DESC, hour) AS rn
           |  FROM h
           |), agg AS (
           |  SELECT user_id, CAST(SUM(n_h) AS BIGINT) AS n_events,
           |    CAST(COUNT(*) AS BIGINT) AS active_hours
           |  FROM h GROUP BY user_id
           |)
           |SELECT a.user_id, a.n_events, a.active_hours,
           |  p.peak_hour, (p.peak_n * 1000000) // a.n_events
           |    AS peak_share_x1e6
           |FROM agg a JOIN pk p ON a.user_id = p.user_id AND p.rn = 1
           |ORDER BY a.user_id""".stripMargin,
      // t133: gap-boundary sessionization, per-session distinct type
      // sets, pair counts, and the HUGEINT lift floor
      "t133_session_lift" ->
        """WITH e AS (
          |  SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type
          |  FROM events
          |), b0 AS (
          |  SELECT user_id, tsu, event_id, event_type,
          |    CASE WHEN tsu - LAG(tsu) OVER (
          |        PARTITION BY user_id ORDER BY tsu, event_id)
          |      > 1800000000 THEN 1 ELSE 0 END AS boundary
          |  FROM e
          |), b AS (
          |  SELECT user_id, event_type,
          |    SUM(boundary) OVER (PARTITION BY user_id
          |      ORDER BY tsu, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS session_no
          |  FROM b0
          |), s AS (
          |  SELECT DISTINCT user_id * 1048576 + session_no AS sid,
          |    event_type AS etype
          |  FROM b
          |), ns AS (
          |  SELECT CAST(COUNT(DISTINCT sid) AS BIGINT) AS n_sessions FROM s
          |), pt AS (
          |  SELECT etype, CAST(COUNT(*) AS BIGINT) AS n_t FROM s GROUP BY etype
          |), p AS (
          |  SELECT a.etype AS type_a, b2.etype AS type_b,
          |    CAST(COUNT(*) AS BIGINT) AS n_ab
          |  FROM s a JOIN s b2 ON a.sid = b2.sid AND a.etype < b2.etype
          |  GROUP BY 1, 2 HAVING COUNT(*) >= 5
          |)
          |SELECT type_a, type_b, n_ab, pa.n_t AS n_a, pb.n_t AS n_b,
          |  n_sessions,
          |  CAST((CAST(n_ab AS HUGEINT) * n_sessions * 1000000)
          |    // (CAST(pa.n_t AS HUGEINT) * pb.n_t) AS BIGINT) AS lift_x1e6
          |FROM p JOIN pt pa ON pa.etype = p.type_a
          |JOIN pt pb ON pb.etype = p.type_b, ns
          |ORDER BY type_a, type_b""".stripMargin,
      // t135: fixed epoch weeks, per-user cohort minimum, (cohort,
      // offset) cells, week-0 denominators, exact ppm floor
      "t135_retention" ->
        """WITH uw AS (
          |  SELECT DISTINCT user_id,
          |    epoch_us(ts) // 604800000000 AS week
          |  FROM events
          |), ck AS (
          |  SELECT week,
          |    MIN(week) OVER (PARTITION BY user_id) AS cohort_week
          |  FROM uw
          |), cells AS (
          |  SELECT cohort_week, week - cohort_week AS week_n,
          |    CAST(COUNT(*) AS BIGINT) AS n_active
          |  FROM ck GROUP BY 1, 2
          |), coh AS (
          |  SELECT cohort_week, n_active AS n_cohort
          |  FROM cells WHERE week_n = 0
          |)
          |SELECT c.cohort_week, c.week_n, c.n_active, h.n_cohort,
          |  (c.n_active * 1000000) // h.n_cohort AS retention_ppm
          |FROM cells c JOIN coh h USING (cohort_week)
          |ORDER BY cohort_week, week_n""".stripMargin,
      // t136: t133's gap-boundary sessionization, per-session
      // distinct types, the (session k -> k+1) carryover join, and
      // one exact row-normalizing floor
      "t136_session_carryover" ->
        """WITH e AS (
          |  SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type
          |  FROM events
          |), b0 AS (
          |  SELECT user_id, tsu, event_id, event_type,
          |    CASE WHEN tsu - LAG(tsu) OVER (
          |        PARTITION BY user_id ORDER BY tsu, event_id)
          |      > 1800000000 THEN 1 ELSE 0 END AS boundary
          |  FROM e
          |), b AS (
          |  SELECT user_id, event_type,
          |    SUM(boundary) OVER (PARTITION BY user_id
          |      ORDER BY tsu, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS session_no
          |  FROM b0
          |), s AS (
          |  SELECT DISTINCT user_id, session_no, event_type AS etype
          |  FROM b
          |), p AS (
          |  SELECT a.etype AS type_a, b2.etype AS type_b,
          |    CAST(COUNT(*) AS BIGINT) AS n_ab
          |  FROM s a JOIN s b2 ON a.user_id = b2.user_id
          |    AND b2.session_no = a.session_no + 1
          |  GROUP BY 1, 2
          |), r AS (
          |  SELECT type_a, CAST(SUM(n_ab) AS BIGINT) AS rw
          |  FROM p GROUP BY type_a
          |)
          |SELECT type_a, type_b, n_ab,
          |  (n_ab * 1000000) // rw AS row_ppm
          |FROM p JOIN r USING (type_a)
          |ORDER BY type_a, type_b""".stripMargin,
      // t137: the full MinHash pair replay, per-doc idMix hash splits
      // (the naive cluster-blind assignment), canonical cells, exact
      // ppm shares
      "t137_split_leakage" ->
        s"""WITH ${minhashCtes(64, 16, 0.5)}, sp AS (
           |  SELECT doc_id,
           |    CASE WHEN ${idMixSql("doc_id")} % 100 < 10 THEN 'val'
           |         WHEN ${idMixSql("doc_id")} % 100 < 20 THEN 'test'
           |         ELSE 'train' END AS split
           |  FROM documents
           |), cells AS (
           |  SELECT LEAST(sa.split, sb.split) AS split_a,
           |    GREATEST(sa.split, sb.split) AS split_b,
           |    CAST(COUNT(*) AS BIGINT) AS n_pairs
           |  FROM pairs p JOIN sp sa ON p.id_a = sa.doc_id
           |  JOIN sp sb ON p.id_b = sb.doc_id
           |  GROUP BY 1, 2
           |), tot AS (
           |  SELECT CAST(SUM(n_pairs) AS BIGINT) AS n_total FROM cells
           |)
           |SELECT split_a, split_b, n_pairs,
           |  split_a <> split_b AS leaked,
           |  (n_pairs * 1000000) // n_total AS share_ppm
           |FROM cells, tot
           |ORDER BY split_a, split_b""".stripMargin,
      // t138: the single-window exact prefix sum the engine's
      // two-phase form must reproduce bit-for-bit
      "t138_token_shards" ->
        s"""WITH b AS (
           |  SELECT doc_id,
           |    CAST(${TextFunctions.Sql.nTokens("text")} AS BIGINT)
           |      AS n_tokens
           |  FROM documents
           |), c AS (
           |  SELECT doc_id, n_tokens,
           |    CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |      AS BIGINT) AS cum_before
           |  FROM b
           |)
           |SELECT doc_id, n_tokens, cum_before,
           |  cum_before // 8192 AS shard,
           |  cum_before % 8192 AS offset_in_shard,
           |  cum_before % 8192 + n_tokens > 8192 AS spans_boundary
           |FROM c ORDER BY doc_id""".stripMargin,
      // t139: hourly (user, bucket) counts, the >=2 hot filter, the
      // gaps-and-islands collapse (bucket - row_number), burst spans
      "t139_bursts" ->
        """WITH b AS (
          |  SELECT user_id, epoch_us(ts) // 3600000000 AS b,
          |    CAST(COUNT(*) AS BIGINT) AS cnt
          |  FROM events GROUP BY 1, 2
          |), hot AS (
          |  SELECT user_id, b, cnt,
          |    b - row_number() OVER (PARTITION BY user_id ORDER BY b)
          |      AS isl
          |  FROM b WHERE cnt >= 2
          |)
          |SELECT user_id, CAST(MIN(b) AS BIGINT) AS start_bucket,
          |  CAST(MAX(b) AS BIGINT) AS end_bucket,
          |  CAST(COUNT(*) AS BIGINT) AS n_buckets,
          |  CAST(SUM(cnt) AS BIGINT) AS n_events
          |FROM hot GROUP BY user_id, isl
          |ORDER BY user_id, start_bucket""".stripMargin,
      // t140: per-user lag gaps keyed by the following event's type,
      // the compressed (type, gap) histogram, per-type cumulative
      // counts, ceil decile targets, the >=-join minimum lookup
      "t140_gap_deciles" ->
        """WITH e AS (
          |  SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type
          |  FROM events
          |), g AS (
          |  SELECT event_type AS etype,
          |    tsu - LAG(tsu) OVER (PARTITION BY user_id
          |      ORDER BY tsu, event_id) AS gap_us
          |  FROM e
          |), gh AS (
          |  SELECT etype, gap_us, CAST(COUNT(*) AS BIGINT) AS cnt
          |  FROM g WHERE gap_us IS NOT NULL GROUP BY 1, 2
          |), nt AS (
          |  SELECT etype, CAST(SUM(cnt) AS BIGINT) AS n_t
          |  FROM gh GROUP BY etype
          |), cumg AS (
          |  SELECT etype, gap_us,
          |    CAST(SUM(cnt) OVER (PARTITION BY etype ORDER BY gap_us)
          |      AS BIGINT) AS cum
          |  FROM gh
          |), tgt AS (
          |  SELECT etype, n_t, d.decile,
          |    (d.decile * n_t + 9) // 10 AS t
          |  FROM nt, (SELECT unnest(range(1, 10)) AS decile) d
          |)
          |SELECT c.etype AS etype, t.decile, t.n_t,
          |  CAST(MIN(c.gap_us) AS BIGINT) AS gap_us
          |FROM cumg c JOIN tgt t
          |  ON c.etype = t.etype AND c.cum >= t.t
          |GROUP BY c.etype, t.decile, t.n_t
          |ORDER BY c.etype, decile""".stripMargin,
      // t141: the MinHash pair replay cells keyed by canonical
      // source pairs with exact ppm shares
      "t141_source_overlap" ->
        s"""WITH ${minhashCtes(64, 16, 0.5)}, src AS (
           |  SELECT doc_id, source FROM documents
           |), cells AS (
           |  SELECT LEAST(sa.source, sb.source) AS source_a,
           |    GREATEST(sa.source, sb.source) AS source_b,
           |    CAST(COUNT(*) AS BIGINT) AS n_pairs
           |  FROM pairs p JOIN src sa ON p.id_a = sa.doc_id
           |  JOIN src sb ON p.id_b = sb.doc_id
           |  GROUP BY 1, 2
           |), tot AS (
           |  SELECT CAST(SUM(n_pairs) AS BIGINT) AS n_total FROM cells
           |)
           |SELECT source_a, source_b, n_pairs,
           |  source_a <> source_b AS cross_source,
           |  (n_pairs * 1000000) // n_total AS share_ppm
           |FROM cells, tot
           |ORDER BY source_a, source_b""".stripMargin,
      // t142: the RANGE-frame first-touch replay — struct MIN is
      // positional in both engines, NULL-skipping in both; organic
      // conversions keep NULL touch columns
      "t142_attribution" ->
        """WITH e AS (
          |  SELECT user_id, epoch_us(ts) AS tsu, event_id, event_type
          |  FROM events
          |), a AS (
          |  SELECT user_id, tsu, event_id, event_type,
          |    MIN(CASE WHEN event_type IN ('view', 'click') THEN
          |      {'t': tsu, 'id': event_id, 'ty': event_type} END)
          |      OVER (PARTITION BY user_id ORDER BY tsu
          |        RANGE BETWEEN 86400000000 PRECEDING
          |          AND 1 PRECEDING) AS f
          |  FROM e
          |)
          |SELECT event_id AS conversion_id, user_id,
          |  tsu AS conv_tsu,
          |  CAST(f.id AS BIGINT) AS touch_id,
          |  f.ty AS touch_type,
          |  tsu - f.t AS gap_us
          |FROM a WHERE event_type = 'purchase'
          |ORDER BY conversion_id""".stripMargin,
      // t143: signatures, band keys, cross-split candidate meetings,
      // agreement counts, one struct-MAX tie-break — all replayed
      "t143_band_persisted" ->
        s"""WITH ${minhashCtes(64, 16, 0.5)}, xc AS (
           |  SELECT CASE WHEN id_a % 10 <> 0 THEN id_a ELSE id_b END
           |      AS batch_id,
           |    CASE WHEN id_a % 10 = 0 THEN id_a ELSE id_b END
           |      AS idx_id
           |  FROM cand WHERE (id_a % 10 = 0) <> (id_b % 10 = 0)
           |), agr AS (
           |  SELECT x.batch_id, x.idx_id,
           |    CAST(SUM(CASE WHEN sa.v = sb.v THEN 1 ELSE 0 END)
           |      AS BIGINT) AS m
           |  FROM xc x JOIN sig sa ON sa.doc_id = x.batch_id
           |  JOIN sig sb ON sb.doc_id = x.idx_id AND sb.j = sa.j
           |  GROUP BY 1, 2
           |), est AS (
           |  SELECT batch_id, idx_id, (m * 1000000) // 64 AS e FROM agr
           |), b AS (
           |  SELECT batch_id, CAST(COUNT(*) AS BIGINT) AS n_candidates,
           |    MAX({'e': e, 'i': -idx_id}) AS bm
           |  FROM est GROUP BY 1
           |)
           |SELECT d.doc_id AS batch_id,
           |  COALESCE(n_candidates, 0) AS n_candidates,
           |  CAST(-bm.i AS BIGINT) AS best_id,
           |  CAST(bm.e AS BIGINT) AS best_est_x1e6,
           |  COALESCE(bm.e, 0) < 500000 AS admitted
           |FROM documents d LEFT JOIN b ON d.doc_id = b.batch_id
           |WHERE d.doc_id % 10 <> 0
           |ORDER BY batch_id""".stripMargin,
      // t144: the oracle joins gram TEXT where the engine joins fnv64
      // fingerprints (t04/t83 collision-freedom discipline); short
      // docs contribute their whole text as one gram, both engines
      "t144_gram_novelty" ->
        """WITH toks AS (
          |  SELECT doc_id, source,
          |    string_split_regex(trim(text), '\s+') AS ts
          |  FROM documents
          |), og AS (
          |  SELECT DISTINCT unnest(
          |    CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
          |    ELSE list_transform(range(1, len(ts) - 1), i ->
          |      array_to_string(ts[CAST(i AS INT):CAST(i + 2 AS INT)],
          |        ' '))
          |    END) AS g
          |  FROM toks WHERE doc_id % 3 = 0
          |), ng AS (
          |  SELECT DISTINCT source, unnest(
          |    CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
          |    ELSE list_transform(range(1, len(ts) - 1), i ->
          |      array_to_string(ts[CAST(i AS INT):CAST(i + 2 AS INT)],
          |        ' '))
          |    END) AS g
          |  FROM toks WHERE doc_id % 3 <> 0
          |), j AS (
          |  SELECT ng.source, CAST(COUNT(*) AS BIGINT) AS n_grams,
          |    CAST(SUM(CASE WHEN og.g IS NULL THEN 1 ELSE 0 END)
          |      AS BIGINT) AS n_novel
          |  FROM ng LEFT JOIN og ON ng.g = og.g
          |  GROUP BY 1
          |)
          |SELECT source, n_grams, n_novel,
          |  (n_novel * 1000000) // n_grams AS novelty_ppm
          |FROM j ORDER BY source""".stripMargin,
      // t145: unit-normalize in doubles (the shared sequential-fold
      // order), scale to floor(u_d*1e6) BIGINTs, then EVERYTHING is
      // exact integer sums — non-negative masses so // and div agree
      "t145_class_scatter" ->
        """WITH v0 AS (
          |  SELECT CAST(label AS BIGINT) AS label,
          |    CAST(embedding AS DOUBLE[]) AS e
          |  FROM embeddings
          |), v AS (
          |  SELECT label, e,
          |    sqrt(list_reduce(list_transform(range(1, 65), i ->
          |      e[CAST(i AS INT)] * e[CAST(i AS INT)]), (x, y) -> x + y))
          |      AS nrm
          |  FROM v0
          |), q AS (
          |  SELECT label, d.i AS dim,
          |    CAST(FLOOR(e[CAST(d.i AS INT)] / nrm * 1000000) AS BIGINT)
          |      AS q
          |  FROM v, range(1, 65) d(i) WHERE nrm > 0
          |), dims AS (
          |  SELECT label, dim, SUM(CAST(q AS HUGEINT)) AS s,
          |    SUM(CAST(q AS HUGEINT) * q) AS ssq_d,
          |    CAST(COUNT(*) AS BIGINT) AS n_d
          |  FROM q GROUP BY 1, 2
          |), lab AS (
          |  SELECT label, SUM(ssq_d) AS ssq, MAX(n_d) AS n
          |  FROM dims GROUP BY 1
          |), pd AS (
          |  SELECT a.label AS label_a, b.label AS label_b,
          |    SUM(a.s * b.s) AS sdot
          |  FROM dims a JOIN dims b
          |    ON a.dim = b.dim AND a.label <= b.label
          |  GROUP BY 1, 2
          |), m AS (
          |  SELECT label_a, label_b, la.n AS n_a, lb.n AS n_b,
          |    CASE WHEN label_a = label_b
          |      THEN CAST(la.n AS HUGEINT) * (la.n - 1)
          |      ELSE CAST(la.n AS HUGEINT) * lb.n * 2 END AS np2,
          |    CASE WHEN label_a = label_b
          |      THEN CAST(la.n AS HUGEINT) * la.ssq - sdot
          |      ELSE CAST(lb.n AS HUGEINT) * la.ssq
          |         + CAST(la.n AS HUGEINT) * lb.ssq - 2 * sdot END AS mass
          |  FROM pd
          |  JOIN lab la ON pd.label_a = la.label
          |  JOIN lab lb ON pd.label_b = lb.label
          |)
          |SELECT label_a, label_b, n_a, n_b,
          |  label_a = label_b AS within,
          |  CAST((2 * mass) // (np2 * 1000000) AS BIGINT)
          |    AS mean_sqdist_x1e6
          |FROM m WHERE np2 > 0
          |ORDER BY label_a, label_b""".stripMargin,
      // t146: lift vs the REST of the corpus, one HUGEINT floor;
      // the +1 rest-side smoothing keeps exclusive tokens finite
      "t146_keyness" ->
        s"""WITH gw AS (
           |  SELECT source, unnest(${TextFunctions.Sql.tokens("text")})
           |    AS token
           |  FROM documents
           |), c AS (
           |  SELECT source, token, CAST(COUNT(*) AS BIGINT) AS n_gw
           |  FROM gw GROUP BY 1, 2
           |), gt AS (
           |  SELECT source, SUM(n_gw) AS n_g FROM c GROUP BY 1
           |), wt AS (
           |  SELECT token, SUM(n_gw) AS n_w FROM c GROUP BY 1
           |), t AS (
           |  SELECT SUM(n_gw) AS n_tok FROM c
           |), s AS (
           |  SELECT c.source, c.token, n_gw, CAST(n_w AS BIGINT) AS n_w,
           |    CAST((CAST(n_gw AS HUGEINT) * (n_tok - n_g) * 1000000)
           |      // (CAST(n_g AS HUGEINT) * (n_w - n_gw + 1)) AS BIGINT)
           |      AS lift_x1e6
           |  FROM c JOIN gt USING (source) JOIN wt USING (token)
           |  CROSS JOIN t
           |  WHERE n_gw >= 3
           |), r AS (
           |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
           |    ORDER BY lift_x1e6 DESC, token) AS rank
           |  FROM s
           |)
           |SELECT source, rank, token, n_gw, n_w, lift_x1e6
           |FROM r WHERE rank <= 5
           |ORDER BY source, rank""".stripMargin,
      // t147: quartile thresholds replay the compressed-histogram
      // ceil-target >=-join; ties share bins; cents are the t92
      // FLOOR(v*100+0.5) contract
      "t147_rfm" ->
        """WITH e AS (
          |  SELECT user_id, epoch_us(ts) AS tsu,
          |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
          |  FROM events
          |), u AS (
          |  SELECT user_id, MAX(tsu) AS last_tsu,
          |    CAST(COUNT(*) AS BIGINT) AS frequency,
          |    CAST(SUM(cents) AS BIGINT) AS monetary_cents
          |  FROM e GROUP BY 1
          |), b AS (
          |  SELECT user_id,
          |    ((SELECT MAX(last_tsu) FROM u) - last_tsu) // 86400000000
          |      AS recency_days,
          |    frequency, monetary_cents
          |  FROM u
          |), l AS (
          |  SELECT 'r' AS metric, recency_days AS v FROM b
          |  UNION ALL SELECT 'f', frequency FROM b
          |  UNION ALL SELECT 'm', monetary_cents FROM b
          |), h AS (
          |  SELECT metric, v, CAST(COUNT(*) AS BIGINT) AS cnt
          |  FROM l GROUP BY 1, 2
          |), c AS (
          |  SELECT metric, v, SUM(cnt) OVER (PARTITION BY metric
          |    ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND
          |    CURRENT ROW) AS cum
          |  FROM h
          |), n AS (
          |  SELECT metric, SUM(cnt) AS n_m FROM h GROUP BY 1
          |), tg AS (
          |  SELECT metric, q.q, (q.q * n_m + 3) // 4 AS tgt
          |  FROM n, (VALUES (1), (2), (3)) q(q)
          |), th AS (
          |  SELECT c.metric, tg.q, MIN(v) AS thr
          |  FROM c JOIN tg ON c.metric = tg.metric AND c.cum >= tg.tgt
          |  GROUP BY 1, 2
          |), wide AS (
          |  SELECT
          |    MAX(CASE WHEN metric = 'r' AND q = 1 THEN thr END) AS r1,
          |    MAX(CASE WHEN metric = 'r' AND q = 2 THEN thr END) AS r2,
          |    MAX(CASE WHEN metric = 'r' AND q = 3 THEN thr END) AS r3,
          |    MAX(CASE WHEN metric = 'f' AND q = 1 THEN thr END) AS f1,
          |    MAX(CASE WHEN metric = 'f' AND q = 2 THEN thr END) AS f2,
          |    MAX(CASE WHEN metric = 'f' AND q = 3 THEN thr END) AS f3,
          |    MAX(CASE WHEN metric = 'm' AND q = 1 THEN thr END) AS m1,
          |    MAX(CASE WHEN metric = 'm' AND q = 2 THEN thr END) AS m2,
          |    MAX(CASE WHEN metric = 'm' AND q = 3 THEN thr END) AS m3
          |  FROM th
          |), f AS (
          |  SELECT user_id, recency_days, frequency, monetary_cents,
          |    1 + (CASE WHEN r1 < recency_days THEN 1 ELSE 0 END)
          |      + (CASE WHEN r2 < recency_days THEN 1 ELSE 0 END)
          |      + (CASE WHEN r3 < recency_days THEN 1 ELSE 0 END)
          |      AS r_bin,
          |    1 + (CASE WHEN f1 < frequency THEN 1 ELSE 0 END)
          |      + (CASE WHEN f2 < frequency THEN 1 ELSE 0 END)
          |      + (CASE WHEN f3 < frequency THEN 1 ELSE 0 END)
          |      AS f_bin,
          |    1 + (CASE WHEN m1 < monetary_cents THEN 1 ELSE 0 END)
          |      + (CASE WHEN m2 < monetary_cents THEN 1 ELSE 0 END)
          |      + (CASE WHEN m3 < monetary_cents THEN 1 ELSE 0 END)
          |      AS m_bin
          |  FROM b, wide
          |)
          |SELECT user_id, recency_days, frequency, monetary_cents,
          |  CAST(r_bin AS BIGINT) AS r_bin, CAST(f_bin AS BIGINT) AS f_bin,
          |  CAST(m_bin AS BIGINT) AS m_bin,
          |  'R' || CAST(r_bin AS VARCHAR) || 'F' || CAST(f_bin AS VARCHAR)
          |    || 'M' || CAST(m_bin AS VARCHAR) AS segment
          |FROM f ORDER BY user_id""".stripMargin,
      // t92: timestamps stay exact integer µs, values scale to integer
      // cents by one pure-double FLOOR, offsets are exact integer
      // running sums of fragment lengths — rendered string and mask
      // are bit-identical across engines
      "t92_sft_render" ->
        """WITH e AS (
          |  SELECT user_id, event_id, epoch_us(ts) AS tsu, event_type,
          |    CASE WHEN event_type IN ('view', 'click') THEN 'user'
          |         ELSE 'assistant' END AS role,
          |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
          |  FROM events
          |), s AS (
          |  SELECT *,
          |    CASE WHEN LAG(tsu) OVER w IS NULL
          |           OR tsu - LAG(tsu) OVER w > 1800000000
          |         THEN 1 ELSE 0 END AS new_s
          |  FROM e
          |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id)
          |), sid AS (
          |  SELECT *,
          |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY tsu, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |      AS session_id,
          |    '<|' || role || '|>' || event_type || ':' ||
          |      CAST(cents AS VARCHAR) || '<|end|>' AS frag
          |  FROM s
          |), o AS (
          |  SELECT *,
          |    SUM(CAST(LENGTH(frag) AS BIGINT)) OVER (
          |      PARTITION BY user_id, session_id ORDER BY tsu, event_id
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS off_end
          |  FROM sid
          |)
          |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
          |  string_agg(frag, '' ORDER BY tsu, event_id) AS rendered,
          |  COUNT(*) AS n_turns,
          |  CAST(SUM(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
          |    AS BIGINT) AS n_loss_turns,
          |  COALESCE(string_agg(CASE WHEN role = 'assistant' THEN
          |      CAST(off_end - LENGTH(frag) + 13 AS VARCHAR) || '-' ||
          |      CAST(off_end - 7 AS VARCHAR) END,
          |    ';' ORDER BY tsu, event_id), '') AS loss_mask,
          |  CAST(COALESCE(SUM(CASE WHEN role = 'assistant'
          |    THEN LENGTH(frag) - 20 END), 0) AS BIGINT) AS loss_chars
          |FROM o
          |GROUP BY 1, 2
          |ORDER BY user_id, session_id""".stripMargin,
      // t93: both sides of a pair recovered by the pair-index trick
      // (no self-join) — the oracle replays rank, n, pair_no, side,
      // and the two-row group collapse in exact BIGINT
      "t93_preference_pairs" ->
        s"""WITH scored AS (
           |  $classifierScoredSql
           |), r AS (
           |  SELECT *,
           |    ROW_NUMBER() OVER (PARTITION BY lang, source
           |      ORDER BY score DESC, doc_id) AS rb,
           |    COUNT(*) OVER (PARTITION BY lang, source) AS n
           |  FROM scored
           |), p AS (
           |  SELECT lang, source, doc_id, score,
           |    LEAST(rb, n + 1 - rb) AS pair_no,
           |    rb = LEAST(rb, n + 1 - rb) AS is_chosen
           |  FROM r
           |  WHERE LEAST(rb, n + 1 - rb) <= 8
           |    AND LEAST(rb, n + 1 - rb) <= n // 2
           |)
           |SELECT lang, source, CAST(pair_no AS BIGINT) AS pair_no,
           |  MIN(CASE WHEN is_chosen THEN doc_id END) AS chosen_id,
           |  MIN(CASE WHEN NOT is_chosen THEN doc_id END) AS rejected_id,
           |  MIN(CASE WHEN is_chosen THEN score END) AS chosen_score,
           |  MIN(CASE WHEN NOT is_chosen THEN score END) AS rejected_score,
           |  MIN(CASE WHEN is_chosen THEN score END)
           |    - MIN(CASE WHEN NOT is_chosen THEN score END) AS gap
           |FROM p GROUP BY 1, 2, 3
           |HAVING MIN(CASE WHEN is_chosen THEN score END)
           |  - MIN(CASE WHEN NOT is_chosen THEN score END) >= 1
           |ORDER BY lang, source, pair_no""".stripMargin,
      // t94: the BPE side replays the full frozen merge loop (the t15
      // oracle) as a subquery; every ratio is integer ppm arithmetic
      // over exact BIGINT sums
      "t94_tokenizer_fertility" -> {
        val words = TextFunctions.Sql.nTokens("d.text")
        // the BPE subquery contains ||-concat at line starts — splice
        // it AFTER stripMargin or the margin strip eats one pipe
        s"""SELECT d.lang, d.source, COUNT(*) AS n_docs,
           |  CAST(SUM($words) AS BIGINT) AS total_words,
           |  CAST(SUM(b.n_bpe_real) AS BIGINT) AS total_bpe_tokens,
           |  CAST(SUM(length(d.text)) AS BIGINT) AS total_chars,
           |  (CAST(SUM(b.n_bpe_real) AS BIGINT) * 1000000)
           |    // GREATEST(CAST(SUM($words) AS BIGINT), 1) AS fertility_ppm,
           |  (CAST(SUM(length(d.text)) AS BIGINT) * 1000000)
           |    // GREATEST(CAST(SUM(b.n_bpe_real) AS BIGINT), 1)
           |    AS chars_per_token_ppm
           |FROM documents d JOIN (__BPE_SUBQUERY__) b ON d.doc_id = b.doc_id
           |GROUP BY 1, 2
           |ORDER BY d.lang, d.source""".stripMargin
          .replace("__BPE_SUBQUERY__",
            graft.functions.Bpe.oracleSql("documents"))
      },
      // t95: RANK (ties share a percentile) + integer div — no float
      // enters the percentile arithmetic
      "t95_score_percentiles" ->
        s"""WITH scored AS (
           |  $classifierScoredSql
           |), r AS (
           |  SELECT source, doc_id, score,
           |    RANK() OVER (PARTITION BY source ORDER BY score) AS rk,
           |    COUNT(*) OVER (PARTITION BY source) AS n
           |  FROM scored
           |)
           |SELECT source, doc_id, score,
           |  CAST(CASE WHEN n > 1 THEN ((rk - 1) * 1000000) // (n - 1)
           |       ELSE 0 END AS BIGINT) AS pctl_ppm
           |FROM r ORDER BY doc_id""".stripMargin,
      // t90: full LSH replay UNTHRESHOLDED (threshold 0.0 keeps the
      // whole verified candidate set); cand pairs sharing zero grams
      // (band-key hash collisions) surface via the LEFT JOIN as
      // jaccard 0 — exactly the engine's sorted-merge 0-intersect
      "t90_contrastive_pairs" ->
        s"""WITH ${minhashCtes(64, 16, 0.0)}, scored AS (
           |  SELECT c.id_a, c.id_b, COALESCE(p.jaccard, 0.0) AS jaccard
           |  FROM cand c LEFT JOIN pairs p
           |    ON c.id_a = p.id_a AND c.id_b = p.id_b
           |), pos AS (
           |  SELECT * FROM scored WHERE jaccard >= 0.5
           |), hard AS (
           |  SELECT * FROM scored WHERE jaccard < 0.5
           |), anchors AS (
           |  SELECT DISTINCT anchor FROM (
           |    SELECT id_a AS anchor FROM pos
           |    UNION SELECT id_b AS anchor FROM pos)
           |), bmin AS (
           |  SELECT ${idMixSql("doc_id")} % 64 AS bucket,
           |    CAST(MIN(doc_id) AS BIGINT) AS partner
           |  FROM documents GROUP BY 1
           |), rnd AS (
           |  SELECT anchor AS anchor_id,
           |    min_by(partner, (bucket - target + 64) % 64) AS cand_id
           |  FROM (
           |    SELECT a.anchor, (${idMixSql("a.anchor")} + 1) % 64 AS target,
           |      b.bucket, b.partner
           |    FROM anchors a CROSS JOIN bmin b)
           |  GROUP BY anchor
           |  HAVING min_by(partner, (bucket - target + 64) % 64) <> anchor
           |)
           |SELECT anchor_id, cand_id, tier, label, jaccard FROM (
           |  SELECT id_a AS anchor_id, id_b AS cand_id, 'pos' AS tier,
           |    CAST(1 AS BIGINT) AS label, jaccard FROM pos
           |  UNION ALL
           |  SELECT id_a, id_b, 'hard', CAST(0 AS BIGINT), jaccard
           |  FROM hard
           |  UNION ALL
           |  SELECT anchor_id, cand_id, 'random', CAST(0 AS BIGINT),
           |    CAST(NULL AS DOUBLE) FROM rnd
           |)
           |ORDER BY anchor_id, cand_id, tier""".stripMargin,
      // t89: the t45 score replay → (score → cnt, pos) histogram →
      // cumulative quantile-bin walk → per-bin integer rates
      "t89_score_calibration" -> {
        val wl = ClassifierWeights.mkString("[", ", ", "]")
        val f = ClassifierWeights.length
        s"""WITH toks AS (
           |  SELECT doc_id, lang = 'en' AS pos,
           |    ${TextFunctions.Sql.tokens("text")} AS ts
           |  FROM documents
           |), scored AS (
           |  SELECT doc_id, pos,
           |    0 + list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(ts, t -> list_extract($wl,
           |        CAST((CASE WHEN t = '' THEN 0
           |              ELSE ${TextFunctions.Sql.polyHash("t")} END) % $f AS INT) + 1))),
           |      (a, b) -> a + b) AS score
           |  FROM toks
           |), hist AS (
           |  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
           |    CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT)
           |      AS pos_cnt
           |  FROM scored GROUP BY score
           |), cumed AS (
           |  SELECT score, cnt, pos_cnt,
           |    CAST(SUM(cnt) OVER (ORDER BY score
           |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           |    CAST((SELECT SUM(cnt) FROM hist) AS BIGINT) AS n_total
           |  FROM hist
           |), binned AS (
           |  SELECT score, cnt, pos_cnt,
           |    LEAST(((cum - 1) * 10) // n_total, 9) AS bin
           |  FROM cumed
           |)
           |SELECT bin, CAST(SUM(cnt) AS BIGINT) AS n_docs,
           |  CAST(SUM(pos_cnt) AS BIGINT) AS n_pos,
           |  MIN(score) AS lo_score, MAX(score) AS hi_score,
           |  (CAST(SUM(pos_cnt) AS BIGINT) * 1000000)
           |    // CAST(SUM(cnt) AS BIGINT) AS pos_ppm
           |FROM binned GROUP BY bin ORDER BY bin""".stripMargin
      },
      // t87: the t21 packing replay aggregated per shard; crossing
      // count guards n_tokens=0 with greatest so // (floor) and
      // Spark div (truncate) see only non-negative dividends
      "t87_packing_report" ->
        s"""WITH d AS (
           |  SELECT doc_id, doc_id % 8 AS shard,
           |    ${T.nTokens("text")} AS n_tokens
           |  FROM documents
           |), c AS (
           |  SELECT doc_id, shard, n_tokens,
           |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
           |                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
           |      - n_tokens AS start_tok
           |  FROM d
           |), p AS (
           |  SELECT shard, n_tokens, start_tok % 512 AS seq_offset
           |  FROM c
           |), a AS (
           |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |    CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           |    CAST(SUM(CASE WHEN seq_offset + n_tokens > 512
           |      THEN 1 ELSE 0 END) AS BIGINT) AS split_docs,
           |    CAST(SUM((seq_offset + GREATEST(n_tokens, 1) - 1) // 512)
           |      AS BIGINT) AS boundary_crossings
           |  FROM p GROUP BY shard
           |)
           |SELECT shard, n_docs, total_tokens,
           |  (total_tokens + 511) // 512 AS n_seqs,
           |  ((total_tokens + 511) // 512) * 512 - total_tokens
           |    AS pad_tokens,
           |  split_docs, boundary_crossings,
           |  CASE WHEN total_tokens > 0 THEN
           |    (total_tokens * 1000000)
           |      // (((total_tokens + 511) // 512) * 512)
           |    ELSE 1000000 END AS fill_ppm
           |FROM a ORDER BY shard""".stripMargin,
      // t88: (length, id) ranking inside deterministic shards,
      // batch = (rn-1)//32, per-batch max and padding
      "t88_length_batches" ->
        s"""WITH d AS (
           |  SELECT doc_id, doc_id % 8 AS shard,
           |    ${T.nTokens("text")} AS n_tokens
           |  FROM documents
           |), r AS (
           |  SELECT doc_id, shard, n_tokens,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY shard
           |      ORDER BY n_tokens, doc_id) AS BIGINT) AS rn
           |  FROM d
           |), b AS (
           |  SELECT doc_id, shard, n_tokens, (rn - 1) // 32 AS batch_no
           |  FROM r
           |)
           |SELECT doc_id, shard, n_tokens, batch_no,
           |  CAST(MAX(n_tokens) OVER (PARTITION BY shard, batch_no)
           |    AS BIGINT) AS batch_max,
           |  CAST(MAX(n_tokens) OVER (PARTITION BY shard, batch_no)
           |    AS BIGINT) - n_tokens AS pad_tokens
           |FROM b ORDER BY doc_id""".stripMargin,
      // t86: priority-sample replay — same integer w/u priorities
      // (weight units), the (k+1)-th threshold τ, the HT adjustment
      "t86_priority_sample" -> {
        val k = PrioSampleK
        s"""WITH pri AS (
           |  SELECT doc_id, n_chars AS weight,
           |    (n_chars * 4294967296) // (${idMixSql("doc_id")} + 1)
           |      AS priority
           |  FROM documents WHERE n_chars > 0
           |), topk1 AS (
           |  SELECT * FROM pri ORDER BY priority DESC, doc_id
           |  LIMIT ${k + 1}
           |), tau AS (
           |  SELECT CASE WHEN COUNT(*) = ${k + 1} THEN MIN(priority)
           |    ELSE 0 END AS tau
           |  FROM topk1
           |), sel AS (
           |  SELECT * FROM topk1 ORDER BY priority DESC, doc_id LIMIT $k
           |)
           |SELECT s.doc_id, s.weight, s.priority,
           |  GREATEST(s.weight, t.tau) AS adj_weight
           |FROM sel s CROSS JOIN tau t
           |ORDER BY doc_id""".stripMargin
      },
      "t84_interleave_order" ->
        s"""WITH rn0 AS (
           |  SELECT doc_id, source, ${idMixSql("doc_id")} AS h FROM documents
           |), rnk AS (
           |  SELECT doc_id, source, h,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY source
           |      ORDER BY h, doc_id) AS BIGINT) AS rn
           |  FROM rn0
           |), ns AS (
           |  SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
           |  FROM documents GROUP BY source
           |), k AS (
           |  SELECT r.doc_id, r.source, r.h, r.rn,
           |    ((r.rn - 1) * 1048576) // n.ns AS key
           |  FROM rnk r JOIN ns n USING (source)
           |)
           |SELECT doc_id, source, rn, key,
           |  CAST(ROW_NUMBER() OVER (ORDER BY key, h, doc_id) AS BIGINT)
           |    AS order_idx
           |FROM k ORDER BY doc_id""".stripMargin,
      // t83: the t19 gram construction replayed from the benchmark's
      // side — the oracle joins gram TEXT where the engine joins
      // fnv64 fingerprints (collision-freedom under test, the t04
      // discipline); zero-exposure bench docs survive via left joins
      "t83_contamination_report" -> {
        val n = DecontamN
        s"""WITH toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts FROM documents
           |), grams AS (
           |  SELECT DISTINCT doc_id, unnest(
           |    CASE WHEN len(ts) < $n THEN [array_to_string(ts, ' ')]
           |    ELSE list_transform(range(1, len(ts) - ${n - 2}), i ->
           |      array_to_string(ts[CAST(i AS INT):CAST(i + ${n - 1} AS INT)], ' '))
           |    END) AS g
           |  FROM toks
           |), bsz AS (
           |  SELECT doc_id AS bench_id, CAST(COUNT(*) AS BIGINT) AS n_grams
           |  FROM grams WHERE doc_id % 10 = 0 GROUP BY 1
           |), pair AS (
           |  SELECT b.doc_id AS bench_id, t.doc_id AS tid, b.g
           |  FROM grams b JOIN grams t ON b.g = t.g
           |  WHERE b.doc_id % 10 = 0 AND t.doc_id % 10 <> 0
           |), pc AS (
           |  SELECT bench_id, tid, COUNT(*) AS shared FROM pair GROUP BY 1, 2
           |), st AS (
           |  SELECT bench_id, CAST(COUNT(*) AS BIGINT) AS n_contam_docs,
           |    CAST(MAX(shared) AS BIGINT) AS max_shared
           |  FROM pc GROUP BY 1
           |), hg AS (
           |  SELECT bench_id, CAST(COUNT(DISTINCT g) AS BIGINT) AS n_hit_grams
           |  FROM pair GROUP BY 1
           |)
           |SELECT s.bench_id, s.n_grams,
           |  COALESCE(h.n_hit_grams, 0) AS n_hit_grams,
           |  COALESCE(t.n_contam_docs, 0) AS n_contam_docs,
           |  COALESCE(t.max_shared, 0) AS max_shared
           |FROM bsz s
           |LEFT JOIN st t USING (bench_id)
           |LEFT JOIN hg h USING (bench_id)
           |ORDER BY bench_id""".stripMargin
      },
      "t26_span_dedup" ->
        """WITH toks AS (
          |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents
          |), s AS (
          |  SELECT doc_id, ts, unnest(range(0, len(ts), 8)) AS start_tok FROM toks
          |), spans AS (
          |  SELECT doc_id, array_to_string(list_slice(ts, CAST(start_tok + 1 AS INT),
          |    CAST(start_tok + 8 AS INT)), ' ') AS sp
          |  FROM s
          |), freq AS (
          |  SELECT sp, COUNT(*) AS gf FROM spans GROUP BY sp
          |)
          |SELECT spans.doc_id, COUNT(*) AS n_spans,
          |  COUNT(*) FILTER (WHERE gf > 1) AS n_dup_spans,
          |  CAST(COUNT(*) FILTER (WHERE gf > 1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
          |    AS dup_frac
          |FROM spans JOIN freq USING (sp)
          |GROUP BY spans.doc_id ORDER BY doc_id""".stripMargin,
      "t44_span_rewrite" ->
        """WITH toks AS (
          |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts FROM documents
          |), s AS (
          |  SELECT doc_id, ts, unnest(range(0, len(ts), 8)) AS start_tok FROM toks
          |), spans AS (
          |  SELECT doc_id, CAST(start_tok // 8 AS BIGINT) AS idx,
          |    array_to_string(list_slice(ts, CAST(start_tok + 1 AS INT),
          |      CAST(start_tok + 8 AS INT)), ' ') AS sp
          |  FROM s
          |), freq AS (
          |  SELECT sp, COUNT(*) AS gf, MIN(doc_id * 1048576 + idx) AS can
          |  FROM spans GROUP BY sp
          |)
          |SELECT spans.doc_id, COUNT(*) AS n_spans,
          |  COUNT(*) FILTER (WHERE gf = 1 OR doc_id * 1048576 + idx = can)
          |    AS n_kept,
          |  coalesce(string_agg(sp, ' ' ORDER BY idx)
          |    FILTER (WHERE gf = 1 OR doc_id * 1048576 + idx = can), '')
          |    AS new_text
          |FROM spans JOIN freq USING (sp)
          |GROUP BY spans.doc_id ORDER BY doc_id""".stripMargin,
      "t45_classifier_score" -> {
        val wl = ClassifierWeights.mkString("[", ", ", "]")
        val f = ClassifierWeights.length
        s"""WITH toks AS (
           |  SELECT doc_id, ${TextFunctions.Sql.tokens("text")} AS ts FROM documents
           |), scored AS (
           |  SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
           |    0 + list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(ts, t -> list_extract($wl,
           |        CAST((CASE WHEN t = '' THEN 0
           |              ELSE ${TextFunctions.Sql.polyHash("t")} END) % $f AS INT) + 1))),
           |      (a, b) -> a + b) AS score
           |  FROM toks
           |)
           |SELECT doc_id, n_tokens, score, score >= 0 AS keep
           |FROM scored ORDER BY doc_id""".stripMargin
      },
      "t46_importance_weight" ->
        s"""WITH toks AS (
           |  SELECT doc_id, source IN ('src0', 'src1', 'src2') AS is_target,
           |    ${TextFunctions.Sql.tokens("text")} AS ts
           |  FROM documents
           |), grams AS (
           |  SELECT doc_id, is_target,
           |    ${TextFunctions.Sql.polyHash("g")} % 1024 AS b
           |  FROM (
           |    SELECT doc_id, is_target, unnest(list_transform(range(1, len(ts)),
           |      i -> ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT) + 1])) AS g
           |    FROM toks)
           |), w AS (
           |  SELECT b,
           |    CAST((SUM(CASE WHEN is_target THEN 1 ELSE 0 END) + 1) * 1048576
           |      // (COUNT(*) + 1) AS BIGINT) AS w,
           |    COUNT(*) AS cnt_r
           |  FROM grams GROUP BY b
           |), m AS (
           |  SELECT CAST(SUM(w * cnt_r) // SUM(cnt_r) AS BIGINT) AS mean_w FROM w
           |), mass AS (
           |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           |    CAST(SUM(w.w) AS BIGINT) AS ratio_mass
           |  FROM grams JOIN w USING (b) GROUP BY doc_id
           |)
           |SELECT d.doc_id, COALESCE(n_grams, 0) AS n_grams,
           |  COALESCE(ratio_mass, 0) AS ratio_mass,
           |  COALESCE(ratio_mass // n_grams, 0) AS avg_w,
           |  COALESCE(ratio_mass // n_grams, 0) >= m.mean_w AS keep
           |FROM documents d LEFT JOIN mass USING (doc_id) CROSS JOIN m
           |ORDER BY doc_id""".stripMargin,
      "t28_tfidf_terms" ->
        """WITH terms AS (
          |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
          |  FROM documents
          |), tf AS (
          |  SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2
          |), df AS (
          |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
          |), n AS (
          |  SELECT COUNT(*) AS n_docs FROM documents
          |), scored AS (
          |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
          |    CAST(tf.tf AS DOUBLE) * CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)
          |      AS score
          |  FROM tf JOIN df USING (term) CROSS JOIN n
          |), r AS (
          |  SELECT doc_id, term, tf, df, score,
          |    CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
          |      ORDER BY score DESC, term) AS BIGINT) AS rank
          |  FROM scored
          |)
          |SELECT doc_id, rank, term, tf, df, score FROM r
          |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
      "t29_unigram_quality" ->
        """WITH toks AS (
          |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
          |  FROM documents
          |), tf AS (
          |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
          |), cnt AS (
          |  SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY term
          |), tot AS (
          |  SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM cnt
          |), agg AS (
          |  SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
          |    CAST(SUM(tf.tf * cnt.cnt) AS BIGINT) AS hit_mass
          |  FROM tf JOIN cnt USING (term) GROUP BY 1
          |)
          |SELECT doc_id, n_tokens, hit_mass,
          |  CAST(hit_mass AS DOUBLE) /
          |    (CAST(n_tokens AS DOUBLE) * CAST(total_tokens AS DOUBLE)) AS mean_prob
          |FROM agg CROSS JOIN tot ORDER BY doc_id""".stripMargin,
      "t30_bm25_topk" -> bm25OracleSql,
      // the persisted-index search is row-for-row the one-shot scorer
      // (shared ranking stage; bucketing only changes the LAYOUT), so
      // the SAME oracle replay gates it
      "t66_bm25_index" -> bm25OracleSql,
      // t68: token positions, per-offset adjacency support, the
      // all-offsets filter, and the (n_hits desc, doc_id) ranked cut —
      // bucketing/layout only changes WHERE postings are read from
      "t68_phrase_search" ->
        """WITH phr AS (
          |  SELECT * FROM (VALUES (1, 'window join'), (2, 'stream data'),
          |    (3, 'filter small')) AS t(query_id, qtext)
          |), pterm AS (
          |  SELECT CAST(query_id AS BIGINT) AS query_id,
          |    CAST(i AS BIGINT) AS j, qs[CAST(i + 1 AS INT)] AS term
          |  FROM (SELECT query_id,
          |      string_split_regex(trim(qtext), '\s+') AS qs,
          |      unnest(range(0, len(string_split_regex(trim(qtext), '\s+'))))
          |        AS i
          |    FROM phr)
          |), pm AS (
          |  SELECT query_id, COUNT(*) AS m FROM pterm GROUP BY 1
          |), ptok AS (
          |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
          |    ts[CAST(i + 1 AS INT)] AS term
          |  FROM (SELECT doc_id,
          |      string_split_regex(trim(text), '\s+') AS ts,
          |      unnest(range(0, len(string_split_regex(trim(text), '\s+'))))
          |        AS i
          |    FROM documents)
          |), base AS (
          |  SELECT q.query_id, p.doc_id, p.pos AS p
          |  FROM pterm q JOIN ptok p ON p.term = q.term
          |  WHERE q.j = 0
          |), sup AS (
          |  SELECT b.query_id, b.doc_id, b.p, COUNT(*) AS sup
          |  FROM base b
          |  JOIN pterm q ON q.query_id = b.query_id
          |  JOIN ptok p ON p.doc_id = b.doc_id AND p.term = q.term
          |    AND p.pos = b.p + q.j
          |  GROUP BY 1, 2, 3
          |), hits AS (
          |  SELECT s.query_id, s.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits
          |  FROM sup s JOIN pm USING (query_id)
          |  WHERE s.sup = pm.m
          |  GROUP BY 1, 2
          |), rk AS (
          |  SELECT query_id, doc_id, n_hits,
          |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          |      ORDER BY n_hits DESC, doc_id) AS BIGINT) AS rank
          |  FROM hits
          |)
          |SELECT query_id, rank, doc_id, n_hits
          |FROM rk WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
      // t69: both lexical channels re-derived from one tf relation,
      // then reciprocal-rank fusion in the same scaled-integer
      // arithmetic the engine uses (1e9 // (60 + rank), long sums)
      "t69_hybrid_rrf" ->
        """WITH qraw AS (
          |  SELECT * FROM (VALUES (1, 'spark window join'), (2, 'hash merge batch'),
          |    (3, 'slow scan filter table')) AS t(query_id, qtext)
          |), q AS (
          |  SELECT DISTINCT CAST(query_id AS BIGINT) AS query_id, term FROM (
          |    SELECT query_id,
          |      unnest(string_split_regex(trim(qtext), '\s+')) AS term
          |    FROM qraw)
          |), dl AS (
          |  SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS dl
          |  FROM documents
          |), s AS (
          |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS total_tokens
          |  FROM dl
          |), toks AS (
          |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
          |  FROM documents
          |), tf AS (
          |  SELECT t.doc_id, d.dl, t.term, COUNT(*) AS tf
          |  FROM toks t JOIN (SELECT DISTINCT term FROM q) qt USING (term)
          |  JOIN dl d USING (doc_id)
          |  GROUP BY 1, 2, 3
          |), df AS (
          |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
          |), bscored AS (
          |  SELECT q.query_id, tf.doc_id,
          |    CAST(FLOOR(((CAST(s.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) *
          |      ((CAST(tf.tf AS DOUBLE) * 2.2) /
          |       (CAST(tf.tf AS DOUBLE) + (1.2 * (0.25 +
          |        ((0.75 * CAST(tf.dl AS DOUBLE)) /
          |         (CAST(s.total_tokens AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))))))
          |      * 1000000.0) AS BIGINT) AS part_scaled
          |  FROM tf JOIN df USING (term) JOIN q USING (term) CROSS JOIN s
          |), br AS (
          |  SELECT query_id, doc_id,
          |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          |      ORDER BY SUM(part_scaled) DESC, doc_id) AS BIGINT) AS rank
          |  FROM bscored GROUP BY query_id, doc_id
          |), tscored AS (
          |  SELECT q.query_id, tf.doc_id,
          |    CAST(FLOOR((CAST(s.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) *
          |      CAST(tf.tf AS DOUBLE) * 1000000.0) AS BIGINT) AS part_scaled
          |  FROM tf JOIN df USING (term) JOIN q USING (term) CROSS JOIN s
          |), tr AS (
          |  SELECT query_id, doc_id,
          |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          |      ORDER BY SUM(part_scaled) DESC, doc_id) AS BIGINT) AS rank
          |  FROM tscored GROUP BY query_id, doc_id
          |), u AS (
          |  SELECT query_id, doc_id, rank FROM br WHERE rank <= 10
          |  UNION ALL
          |  SELECT query_id, doc_id, rank FROM tr WHERE rank <= 10
          |), f AS (
          |  SELECT query_id, doc_id,
          |    CAST(SUM(1000000000 // (60 + rank)) AS BIGINT) AS rrf_scaled,
          |    COUNT(*) AS n_channels
          |  FROM u GROUP BY 1, 2
          |), r AS (
          |  SELECT query_id, doc_id, n_channels, rrf_scaled,
          |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
          |      ORDER BY rrf_scaled DESC, doc_id) AS BIGINT) AS rank
          |  FROM f
          |)
          |SELECT query_id, rank, doc_id, n_channels,
          |  CAST(rrf_scaled AS DOUBLE) / 1000000000.0 AS rrf_score
          |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin,
      // t70: edge derivation (distinct per-domain 3-gram shingles,
      // stop-gram cap 10) then five unrolled scaled-integer PageRank
      // rounds, every floor division replayed
      "t70_domain_pagerank" ->
        """WITH toks AS (
          |  SELECT source, string_split_regex(trim(text), '\s+') AS ts
          |  FROM documents
          |), g0 AS (
          |  SELECT source, unnest(
          |    CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
          |    ELSE list_transform(range(1, len(ts) - 1), i ->
          |      ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1] || ' ' ||
          |      ts[CAST(i AS INT)+2])
          |    END) AS g
          |  FROM toks
          |), dg AS (
          |  SELECT DISTINCT source AS src, g FROM g0
          |), gok AS (
          |  SELECT g FROM (SELECT g, COUNT(*) AS gdf FROM dg GROUP BY g)
          |  WHERE gdf >= 2 AND gdf <= 10
          |), eg AS (
          |  SELECT dg.src, dg.g FROM dg JOIN gok USING (g)
          |), edges AS (
          |  SELECT a.src AS src, b.src AS dst, COUNT(*) AS weight
          |  FROM eg a JOIN eg b USING (g) WHERE a.src <> b.src
          |  GROUP BY 1, 2
          |), outw AS (
          |  SELECT src, SUM(weight) AS out_w FROM edges GROUP BY src
          |), nodes AS (
          |  SELECT DISTINCT source AS node FROM documents
          |), nn AS (
          |  SELECT COUNT(*) AS n FROM nodes
          |), r0 AS (
          |  SELECT node, 1000000000000 // n AS r FROM nodes CROSS JOIN nn
          |), c1 AS (
          |  SELECT e.dst AS node, SUM((r.r * e.weight) // o.out_w) AS contrib
          |  FROM edges e JOIN outw o ON e.src = o.src
          |  JOIN r0 r ON r.node = e.src GROUP BY 1
          |), d1 AS (
          |  SELECT COALESCE(SUM(r), 0) AS dang FROM r0
          |  WHERE node NOT IN (SELECT src FROM outw)
          |), r1 AS (
          |  SELECT n.node, CAST(((15 * 1000000000000) // 100) // nn.n +
          |    (85 * (COALESCE(c.contrib, 0) + d.dang // nn.n)) // 100 AS BIGINT) AS r
          |  FROM nodes n CROSS JOIN nn CROSS JOIN d1 d LEFT JOIN c1 c USING (node)
          |), c2 AS (
          |  SELECT e.dst AS node, SUM((r.r * e.weight) // o.out_w) AS contrib
          |  FROM edges e JOIN outw o ON e.src = o.src
          |  JOIN r1 r ON r.node = e.src GROUP BY 1
          |), d2 AS (
          |  SELECT COALESCE(SUM(r), 0) AS dang FROM r1
          |  WHERE node NOT IN (SELECT src FROM outw)
          |), r2 AS (
          |  SELECT n.node, CAST(((15 * 1000000000000) // 100) // nn.n +
          |    (85 * (COALESCE(c.contrib, 0) + d.dang // nn.n)) // 100 AS BIGINT) AS r
          |  FROM nodes n CROSS JOIN nn CROSS JOIN d2 d LEFT JOIN c2 c USING (node)
          |), c3 AS (
          |  SELECT e.dst AS node, SUM((r.r * e.weight) // o.out_w) AS contrib
          |  FROM edges e JOIN outw o ON e.src = o.src
          |  JOIN r2 r ON r.node = e.src GROUP BY 1
          |), d3 AS (
          |  SELECT COALESCE(SUM(r), 0) AS dang FROM r2
          |  WHERE node NOT IN (SELECT src FROM outw)
          |), r3 AS (
          |  SELECT n.node, CAST(((15 * 1000000000000) // 100) // nn.n +
          |    (85 * (COALESCE(c.contrib, 0) + d.dang // nn.n)) // 100 AS BIGINT) AS r
          |  FROM nodes n CROSS JOIN nn CROSS JOIN d3 d LEFT JOIN c3 c USING (node)
          |), c4 AS (
          |  SELECT e.dst AS node, SUM((r.r * e.weight) // o.out_w) AS contrib
          |  FROM edges e JOIN outw o ON e.src = o.src
          |  JOIN r3 r ON r.node = e.src GROUP BY 1
          |), d4 AS (
          |  SELECT COALESCE(SUM(r), 0) AS dang FROM r3
          |  WHERE node NOT IN (SELECT src FROM outw)
          |), r4 AS (
          |  SELECT n.node, CAST(((15 * 1000000000000) // 100) // nn.n +
          |    (85 * (COALESCE(c.contrib, 0) + d.dang // nn.n)) // 100 AS BIGINT) AS r
          |  FROM nodes n CROSS JOIN nn CROSS JOIN d4 d LEFT JOIN c4 c USING (node)
          |), c5 AS (
          |  SELECT e.dst AS node, SUM((r.r * e.weight) // o.out_w) AS contrib
          |  FROM edges e JOIN outw o ON e.src = o.src
          |  JOIN r4 r ON r.node = e.src GROUP BY 1
          |), d5 AS (
          |  SELECT COALESCE(SUM(r), 0) AS dang FROM r4
          |  WHERE node NOT IN (SELECT src FROM outw)
          |), r5 AS (
          |  SELECT n.node, CAST(((15 * 1000000000000) // 100) // nn.n +
          |    (85 * (COALESCE(c.contrib, 0) + d.dang // nn.n)) // 100 AS BIGINT) AS r
          |  FROM nodes n CROSS JOIN nn CROSS JOIN d5 d LEFT JOIN c5 c USING (node)
          |)
          |SELECT node AS source, r AS rank_scaled,
          |  CAST(r AS DOUBLE) / 1000000000000.0 AS rank
          |FROM r5 ORDER BY source""".stripMargin,
      // t71: corpus bigram counts (multiset; empty for len<2 docs),
      // head counts derived from them, add-one smoothing over the
      // distinct-token vocabulary, all probabilities as int64
      // floor divisions at scale 1e9
      "t71_bigram_quality" ->
        """WITH toks AS (
          |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS ts
          |  FROM documents
          |), ids AS (
          |  SELECT doc_id, len(ts) AS n_tokens FROM toks
          |), bg AS (
          |  SELECT doc_id, unnest(
          |    CASE WHEN len(ts) < 2 THEN CAST([] AS VARCHAR[])
          |    ELSE list_transform(range(1, len(ts)), i ->
          |      ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1]) END) AS gram
          |  FROM toks
          |), dg AS (
          |  SELECT doc_id, gram, COUNT(*) AS occ FROM bg GROUP BY 1, 2
          |), c2 AS (
          |  SELECT gram, SUM(occ) AS c2 FROM dg GROUP BY gram
          |), c1 AS (
          |  SELECT split_part(gram, ' ', 1) AS head, SUM(c2) AS c1
          |  FROM c2 GROUP BY 1
          |), voc AS (
          |  SELECT COUNT(DISTINCT t) AS v
          |  FROM (SELECT unnest(ts) AS t FROM toks)
          |), parts AS (
          |  SELECT dg.doc_id,
          |    CAST(SUM(dg.occ * ((1000000000 * (c2.c2 + 1)) // (c1.c1 + voc.v)))
          |      AS BIGINT) AS sum_scaled
          |  FROM dg JOIN c2 USING (gram)
          |  JOIN c1 ON split_part(dg.gram, ' ', 1) = c1.head
          |  CROSS JOIN voc GROUP BY 1
          |), res AS (
          |  SELECT i.doc_id,
          |    CAST(GREATEST(i.n_tokens - 1, 0) AS BIGINT) AS n_bigrams,
          |    CAST(COALESCE(p.sum_scaled, 0) AS BIGINT) AS sum_scaled
          |  FROM ids i LEFT JOIN parts p USING (doc_id)
          |)
          |SELECT doc_id, n_bigrams, sum_scaled,
          |  CAST(CASE WHEN n_bigrams > 0 THEN sum_scaled // n_bigrams
          |       ELSE 0 END AS BIGINT) AS mean_prob_scaled,
          |  CAST(CASE WHEN n_bigrams > 0 THEN sum_scaled // n_bigrams
          |       ELSE 0 END AS DOUBLE) / 1000000000.0 AS score
          |FROM res ORDER BY doc_id""".stripMargin,
      // t96: α = 2/5 exact — every backoff branch is one BIGINT
      // floor-division; a seen trigram's head bigram is always seen,
      // so the CASE ladder never divides by NULL
      "t96_trigram_backoff" ->
        """WITH toks AS (
          |  SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS ts
          |  FROM documents
          |), ids AS (
          |  SELECT doc_id, len(ts) AS n_tokens FROM toks
          |), rt AS (
          |  SELECT ts FROM toks WHERE lang = 'en'
          |), tri AS (
          |  SELECT g3, COUNT(*) AS c3 FROM (
          |    SELECT unnest(CASE WHEN len(ts) < 3 THEN CAST([] AS VARCHAR[])
          |      ELSE list_transform(range(1, len(ts) - 1), i ->
          |        ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1]
          |          || ' ' || ts[CAST(i AS INT)+2]) END) AS g3
          |    FROM rt) GROUP BY g3
          |), bi AS (
          |  SELECT g2, COUNT(*) AS c2 FROM (
          |    SELECT unnest(CASE WHEN len(ts) < 2 THEN CAST([] AS VARCHAR[])
          |      ELSE list_transform(range(1, len(ts)), i ->
          |        ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1]) END) AS g2
          |    FROM rt) GROUP BY g2
          |), uni AS (
          |  SELECT w, COUNT(*) AS c1 FROM (
          |    SELECT unnest(ts) AS w FROM rt) GROUP BY w
          |), tot AS (
          |  SELECT SUM(c1) AS n_total FROM uni
          |), dg AS (
          |  SELECT doc_id, g3, COUNT(*) AS occ FROM (
          |    SELECT doc_id, unnest(CASE WHEN len(ts) < 3 THEN CAST([] AS VARCHAR[])
          |      ELSE list_transform(range(1, len(ts) - 1), i ->
          |        ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1]
          |          || ' ' || ts[CAST(i AS INT)+2]) END) AS g3
          |    FROM toks) GROUP BY 1, 2
          |), parts AS (
          |  SELECT dg.doc_id, CAST(SUM(dg.occ * (
          |    CASE WHEN tri.c3 IS NOT NULL
          |         THEN (CAST(1000000000 AS BIGINT) * tri.c3) // b12.c2
          |         WHEN b23.c2 IS NOT NULL
          |         THEN (CAST(2000000000 AS BIGINT) * b23.c2) // (5 * u2.c1)
          |         WHEN u3.c1 IS NOT NULL
          |         THEN (CAST(4000000000 AS BIGINT) * u3.c1)
          |           // (25 * tot.n_total)
          |         ELSE 0 END)) AS BIGINT) AS sum_scaled
          |  FROM dg
          |  LEFT JOIN tri USING (g3)
          |  LEFT JOIN bi b12 ON b12.g2 =
          |    split_part(dg.g3, ' ', 1) || ' ' || split_part(dg.g3, ' ', 2)
          |  LEFT JOIN bi b23 ON b23.g2 =
          |    split_part(dg.g3, ' ', 2) || ' ' || split_part(dg.g3, ' ', 3)
          |  LEFT JOIN uni u2 ON u2.w = split_part(dg.g3, ' ', 2)
          |  LEFT JOIN uni u3 ON u3.w = split_part(dg.g3, ' ', 3)
          |  CROSS JOIN tot
          |  GROUP BY 1
          |), res AS (
          |  SELECT i.doc_id,
          |    CAST(GREATEST(i.n_tokens - 2, 0) AS BIGINT) AS n_trigrams,
          |    CAST(COALESCE(p.sum_scaled, 0) AS BIGINT) AS sum_scaled
          |  FROM ids i LEFT JOIN parts p USING (doc_id)
          |)
          |SELECT doc_id, n_trigrams, sum_scaled,
          |  CAST(CASE WHEN n_trigrams > 0 THEN sum_scaled // n_trigrams
          |       ELSE 0 END AS BIGINT) AS mean_prob_scaled,
          |  CAST(CASE WHEN n_trigrams > 0 THEN sum_scaled // n_trigrams
          |       ELSE 0 END AS DOUBLE) / 1000000000.0 AS score
          |FROM res ORDER BY doc_id""".stripMargin,
      // t97: every rule threshold is an integer cross-multiplication —
      // no float division enters any verdict
      "t97_gopher_rules" -> {
        val stopList = TextFunctions.Stopwords.map(w => s"'$w'").mkString(", ")
        s"""WITH w AS (
           |  SELECT doc_id, ${TextFunctions.Sql.tokens("text")} AS ws,
           |    CAST(${TextFunctions.Sql
                  .dictHits("text", TextFunctions.Stopwords)} AS BIGINT)
           |      AS stop_hits,
           |    CAST(len(regexp_extract_all(text, '[#…]')) AS BIGINT)
           |      AS symbols
           |  FROM documents
           |), m AS (
           |  SELECT doc_id,
           |    CAST(len(ws) AS BIGINT) AS n_words,
           |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(ws, x -> CAST(length(x) AS BIGINT))),
           |      (a, b) -> a + b) AS BIGINT) AS word_chars,
           |    CAST(len(list_filter(ws,
           |      x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
           |      AS alpha_words,
           |    stop_hits, symbols
           |  FROM w
           |)
           |SELECT doc_id, n_words, word_chars, alpha_words, stop_hits,
           |  symbols,
           |  n_words >= 50 AND n_words <= 100000 AS ok_word_count,
           |  word_chars >= n_words * 3 AND word_chars <= n_words * 10
           |    AS ok_mean_len,
           |  symbols * 10 <= n_words AS ok_symbol,
           |  alpha_words * 5 >= n_words * 4 AS ok_alpha,
           |  stop_hits >= 2 AS ok_stopwords,
           |  n_words >= 50 AND n_words <= 100000
           |    AND word_chars >= n_words * 3 AND word_chars <= n_words * 10
           |    AND symbols * 10 <= n_words
           |    AND alpha_words * 5 >= n_words * 4
           |    AND stop_hits >= 2 AS keep
           |FROM m ORDER BY doc_id""".stripMargin
      },
      // t98: probes collapse to one sorted DISTINCT list; containment
      // is exact substring — string comparisons only, nothing floats;
      // the canary registry is FIXED (id-capped), never corpus-sized
      "t98_exact_decontam" ->
        """WITH bw AS (
          |  SELECT string_split_regex(trim(text), '\s+') AS ws
          |  FROM documents WHERE doc_id % 10 = 0 AND doc_id < 5000
          |), pr AS (
          |  SELECT list_sort(list(DISTINCT array_to_string(ws[1:8], ' ')))
          |    AS probes
          |  FROM bw WHERE len(ws) >= 8
          |)
          |SELECT d.doc_id,
          |  CAST(len(list_filter(pr.probes, p -> contains(d.text, p)))
          |    AS BIGINT) AS n_hits,
          |  len(list_filter(pr.probes, p -> contains(d.text, p))) > 0
          |    AS contaminated
          |FROM documents d CROSS JOIN pr
          |WHERE d.doc_id % 10 <> 0
          |ORDER BY d.doc_id""".stripMargin,
      // t99: mutuality and components replayed over the exact t16
      // k-NN relation — cosines are the shared sequential-fold cosSql
      "t99_semantic_clusters" ->
        mutualKnnClusterOracleSql(minNlist = 16, nprobe = 2, k = 3),
      // t100: the t06 candidate replay (threshold 0 keeps every band
      // collision) + exact Levenshtein — integer DP in both engines
      "t100_edit_dedup" ->
        s"""WITH ${minhashCtes(64, 16, 0.0)}
           |SELECT c.id_a, c.id_b,
           |  CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist,
           |  CAST(GREATEST(length(da.text), length(db.text)) AS BIGINT)
           |    AS max_len,
           |  levenshtein(da.text, db.text) * 100
           |    <= GREATEST(length(da.text), length(db.text)) * 5 AS is_dup
           |FROM cand c
           |JOIN documents da ON c.id_a = da.doc_id
           |JOIN documents db ON c.id_b = db.doc_id
           |ORDER BY c.id_a, c.id_b""".stripMargin,
      // t101: candidates from the t06 band replay; containment is one
      // integer floor-division per direction over the exact distinct-
      // shingle intersection (p0 = the gram-join pair counts)
      "t101_containment" ->
        s"""WITH ${minhashCtes(64, 16, 0.0)}
           |SELECT c.id_a, c.id_b,
           |  CAST(COALESCE(p0.nc, 0) AS BIGINT) AS inter,
           |  CAST(sa.sz AS BIGINT) AS size_a,
           |  CAST(sb.sz AS BIGINT) AS size_b,
           |  (CAST(COALESCE(p0.nc, 0) AS BIGINT) * 1000000) // sa.sz
           |    AS cont_a_ppm,
           |  (CAST(COALESCE(p0.nc, 0) AS BIGINT) * 1000000) // sb.sz
           |    AS cont_b_ppm,
           |  (CAST(COALESCE(p0.nc, 0) AS BIGINT) * 1000000) // sa.sz
           |    >= 800000 AS a_in_b,
           |  (CAST(COALESCE(p0.nc, 0) AS BIGINT) * 1000000) // sb.sz
           |    >= 800000 AS b_in_a
           |FROM cand c
           |LEFT JOIN p0 ON c.id_a = p0.id_a AND c.id_b = p0.id_b
           |JOIN sizes sa ON c.id_a = sa.doc_id
           |JOIN sizes sb ON c.id_b = sb.doc_id
           |WHERE (CAST(COALESCE(p0.nc, 0) AS BIGINT) * 1000000) // sa.sz
           |    >= 800000
           |  OR (CAST(COALESCE(p0.nc, 0) AS BIGINT) * 1000000) // sb.sz
           |    >= 800000
           |ORDER BY c.id_a, c.id_b""".stripMargin,
      // t102: integer-ppm distributions; L1 decomposes exactly over
      // the shared vocabulary + each side's missing mass
      "t102_source_divergence" ->
        s"""WITH cnt AS (
           |  SELECT source, w, COUNT(*) AS c FROM (
           |    SELECT source, unnest(${TextFunctions.Sql.tokens("text")}) AS w
           |    FROM documents) GROUP BY 1, 2
           |), tot AS (
           |  SELECT source, SUM(c) AS n FROM cnt GROUP BY source
           |), ppm AS (
           |  SELECT cnt.source, cnt.w,
           |    (cnt.c * 1000000) // tot.n AS ppm
           |  FROM cnt JOIN tot USING (source)
           |), mass AS (
           |  SELECT source, CAST(SUM(ppm) AS BIGINT) AS s_mass
           |  FROM ppm GROUP BY source
           |), shared AS (
           |  SELECT a.source AS source_a, b.source AS source_b,
           |    CAST(SUM(ABS(a.ppm - b.ppm)) AS BIGINT) AS shared_absdiff,
           |    CAST(SUM(a.ppm) AS BIGINT) AS shared_a,
           |    CAST(SUM(b.ppm) AS BIGINT) AS shared_b,
           |    COUNT(*) AS shared_vocab
           |  FROM ppm a JOIN ppm b
           |    ON a.w = b.w AND a.source < b.source
           |  GROUP BY 1, 2
           |)
           |SELECT s.source_a, s.source_b, s.shared_vocab,
           |  CAST(s.shared_absdiff + (ma.s_mass - s.shared_a)
           |    + (mb.s_mass - s.shared_b) AS BIGINT) AS l1_ppm
           |FROM shared s
           |JOIN mass ma ON s.source_a = ma.source
           |JOIN mass mb ON s.source_b = mb.source
           |ORDER BY s.source_a, s.source_b""".stripMargin,
      // t103: quotas are exact BIGINT products; seats rank by integer
      // remainder; selection replays the shared full-width id mix
      "t103_hamilton_eval" ->
        s"""WITH hist AS (
           |  SELECT lang || '|' || source AS stratum, COUNT(*) AS n_s
           |  FROM documents GROUP BY 1
           |), tot AS (
           |  SELECT SUM(n_s) AS n FROM hist
           |), a0 AS (
           |  SELECT stratum, n_s,
           |    (n_s * 200) // n AS base,
           |    (n_s * 200) % n AS rem,
           |    200 - SUM((n_s * 200) // n) OVER () AS leftover,
           |    ROW_NUMBER() OVER (ORDER BY (n_s * 200) % n DESC, stratum)
           |      AS seat_rank
           |  FROM hist CROSS JOIN tot
           |), alloc AS (
           |  SELECT stratum, n_s,
           |    base + CASE WHEN seat_rank <= leftover THEN 1 ELSE 0 END
           |      AS alloc
           |  FROM a0
           |), sel AS (
           |  SELECT doc_id, lang || '|' || source AS stratum,
           |    ROW_NUMBER() OVER (
           |      PARTITION BY lang || '|' || source
           |      ORDER BY ${idMixSql("doc_id")}, doc_id) AS sel_rank
           |  FROM documents
           |)
           |SELECT s.doc_id, s.stratum, CAST(s.sel_rank AS BIGINT) AS sel_rank,
           |  CAST(a.alloc AS BIGINT) AS alloc, CAST(a.n_s AS BIGINT) AS n_s
           |FROM sel s JOIN alloc a USING (stratum)
           |WHERE s.sel_rank <= a.alloc
           |ORDER BY s.doc_id""".stripMargin,
      // t104: per-position mask bits from the shared id-mix over the
      // packed (doc, pos) key; run collapse and both rendered strings
      // replay in the same windows
      "t104_span_corruption" ->
        s"""WITH toks AS (
           |  SELECT doc_id, ${TextFunctions.Sql.tokens("text")} AS ts
           |  FROM documents
           |), p AS (
           |  SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
           |    i -> struct_pack(pos := CAST(i - 1 AS BIGINT),
           |                     tok := ts[CAST(i AS INT)]))) AS u
           |  FROM toks
           |), q AS (
           |  SELECT doc_id, u.pos AS pos, u.tok AS tok,
           |    ${idMixSql("(doc_id * 1048576 + u.pos)")} % 100 < 15
           |      AS masked
           |  FROM p
           |), r AS (
           |  SELECT *,
           |    masked AND NOT COALESCE(LAG(masked) OVER w, FALSE)
           |      AS run_start
           |  FROM q WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
           |), s AS (
           |  SELECT *, SUM(CASE WHEN run_start THEN 1 ELSE 0 END) OVER (
           |    PARTITION BY doc_id ORDER BY pos
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
           |  FROM r
           |)
           |SELECT doc_id,
           |  COALESCE(string_agg(CASE WHEN NOT masked THEN tok
           |    WHEN run_start THEN
           |      '<extra_id_' || CAST(run_id - 1 AS VARCHAR) || '>' END,
           |    ' ' ORDER BY pos), '') AS input_text,
           |  COALESCE(string_agg(CASE WHEN run_start THEN
           |      '<extra_id_' || CAST(run_id - 1 AS VARCHAR) || '> ' || tok
           |    WHEN masked THEN tok END, ' ' ORDER BY pos), '')
           |    AS target_text,
           |  CAST(MAX(run_id) AS BIGINT) AS n_spans,
           |  CAST(SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_masked
           |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin,
      // t105: the t23 segment replay + the shared id-mix pair
      // decision; the negative draw replays the t90 cyclic bucket-min
      "t105_segment_pairs" ->
        s"""WITH toks AS (
           |  SELECT doc_id, ${TextFunctions.Sql.tokens("text")} AS ts
           |  FROM documents
           |), s AS (
           |  SELECT doc_id, CAST(start_tok // 32 AS BIGINT) AS chunk_no
           |  FROM (SELECT doc_id, unnest(range(0, len(ts), 32)) AS start_tok
           |        FROM toks)
           |), a AS (
           |  SELECT s1.doc_id, s1.chunk_no,
           |    ${idMixSql("(s1.doc_id * 1048576 + s1.chunk_no)")} AS h
           |  FROM s s1 JOIN s s2
           |    ON s1.doc_id = s2.doc_id AND s2.chunk_no = s1.chunk_no + 1
           |), pos AS (
           |  SELECT doc_id, chunk_no AS seg_no, doc_id AS partner_doc,
           |    chunk_no + 1 AS partner_seg, TRUE AS is_next
           |  FROM a WHERE h % 2 = 0
           |), bm AS (
           |  SELECT ${idMixSql("(doc_id * 1048576 + chunk_no)")} % 64
           |      AS bucket,
           |    MIN(doc_id * 1048576 + chunk_no) AS pcomp
           |  FROM s GROUP BY 1
           |), neg0 AS (
           |  SELECT a.doc_id, a.chunk_no AS seg_no, bm.pcomp,
           |    ROW_NUMBER() OVER (PARTITION BY a.doc_id, a.chunk_no
           |      ORDER BY (bm.bucket - ((a.h // 2 + 1) % 64) + 64) % 64)
           |      AS rk
           |  FROM a CROSS JOIN bm
           |  WHERE a.h % 2 <> 0
           |), neg AS (
           |  SELECT doc_id, seg_no,
           |    pcomp // 1048576 AS partner_doc,
           |    pcomp % 1048576 AS partner_seg, FALSE AS is_next
           |  FROM neg0 WHERE rk = 1 AND pcomp // 1048576 <> doc_id
           |)
           |SELECT doc_id, seg_no, partner_doc, partner_seg, is_next FROM pos
           |UNION ALL
           |SELECT doc_id, seg_no, partner_doc, partner_seg, is_next FROM neg
           |ORDER BY doc_id, seg_no""".stripMargin,
      // t106: all aggregates run over the strictly-earlier frame
      // (ROWS ... 1 PRECEDING) in exact integer µs/cents
      "t106_pit_features" ->
        """WITH e AS (
          |  SELECT event_id, user_id, epoch_us(ts) AS tsu, event_type,
          |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
          |  FROM events
          |)
          |SELECT event_id, user_id, tsu,
          |  COUNT(*) OVER prior AS n_prior,
          |  CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1
          |    ELSE 0 END) OVER prior, 0) AS BIGINT) AS n_prior_target,
          |  CAST(COALESCE(SUM(cents) OVER prior, 0) AS BIGINT)
          |    AS prior_value_cents,
          |  tsu - LAG(tsu) OVER w AS gap_us
          |FROM e
          |WINDOW
          |  w AS (PARTITION BY user_id ORDER BY tsu, event_id),
          |  prior AS (PARTITION BY user_id ORDER BY tsu, event_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
          |ORDER BY event_id""".stripMargin,
      // t107: the negative index applies the shared id-mix cyclically
      // AFTER the positive's catalog position, so it always differs.
      // The len(types) > 1 CASE mirrors the engine's when(n_types > 1)
      // guard: on a degenerate single-type catalog both sides emit a
      // NULL neg_type instead of the oracle dividing by zero.
      "t107_next_event_pairs" ->
        s"""WITH e AS (
           |  SELECT event_id, user_id, epoch_us(ts) AS tsu, event_type
           |  FROM events
           |), b AS (
           |  SELECT event_id, user_id, event_type AS etype,
           |    LEAD(event_type) OVER (
           |      PARTITION BY user_id ORDER BY tsu, event_id) AS next_type
           |  FROM e
           |), cat AS (
           |  SELECT list_sort(list(DISTINCT event_type)) AS types
           |  FROM events
           |)
           |SELECT b.event_id, b.user_id, b.etype, b.next_type,
           |  CASE WHEN len(types) > 1 THEN
           |    types[CAST((((list_position(types, b.next_type) - 1) + 1 +
           |      ${idMixSql("(b.user_id * 1048576 + b.event_id)")}
           |        % (len(types) - 1)) % len(types)) + 1 AS INT)]
           |  END AS neg_type
           |FROM b CROSS JOIN cat
           |WHERE b.next_type IS NOT NULL
           |ORDER BY b.event_id""".stripMargin,
      // t108: the oracle keys grams by TEXT where the engine shuffles
      // fnv64 fingerprints (t04 collision-freedom discipline); the
      // curve falls out of the per-gram minimum-bucket histogram
      "t108_coverage_curve" ->
        s"""WITH bg AS (
           |  SELECT ${idMixSql("doc_id")} % 100 AS bucket,
           |    unnest(CASE WHEN len(ts) < 2 THEN CAST([] AS VARCHAR[])
           |      ELSE list_transform(range(1, len(ts)), i ->
           |        ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1]) END)
           |      AS gram
           |  FROM (SELECT doc_id, ${TextFunctions.Sql.tokens("text")} AS ts
           |        FROM documents)
           |), g AS (
           |  SELECT gram, MIN(bucket) AS minb FROM bg GROUP BY gram
           |), hist AS (
           |  SELECT minb, COUNT(*) AS cnt FROM g GROUP BY minb
           |), tot AS (
           |  SELECT SUM(cnt) AS n_grams FROM hist
           |), pcts AS (
           |  SELECT unnest(range(1, 11)) * 10 AS pct
           |)
           |SELECT CAST(p.pct AS BIGINT) AS pct,
           |  CAST(COALESCE(SUM(h.cnt), 0) AS BIGINT) AS grams_covered,
           |  (CAST(COALESCE(SUM(h.cnt), 0) AS BIGINT) * 1000000)
           |    // CAST((SELECT n_grams FROM tot) AS BIGINT)
           |    AS coverage_ppm
           |FROM pcts p LEFT JOIN hist h ON h.minb < p.pct
           |GROUP BY p.pct
           |ORDER BY pct""".stripMargin,
      // t109: the t09 bucket replay at fixed 8 planes, fanned out to
      // the query's own bucket plus every 1-bit xor flip; candidates
      // dedup before the cosine rank exactly as the engine does
      "t109_ann_multiprobe" ->
        s"""WITH v AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
           |), proj AS (
           |  SELECT vec_id, p,
           |    list_reduce(list_transform(range(1, 65), i ->
           |      e[CAST(i AS INT)] *
           |      (CASE WHEN ((p * 1024 + i - 1) * 2654435761 + 123456789)
           |                   % 4294967296 >= 2147483648
           |            THEN CAST(1.0 AS DOUBLE)
           |            ELSE CAST(-1.0 AS DOUBLE) END)),
           |      (x, y) -> x + y) AS pr
           |  FROM v, range(0, 8) t(p)
           |), bkt AS (
           |  SELECT vec_id,
           |    CAST(SUM(CASE WHEN pr >= 0 THEN (1 << p) ELSE 0 END)
           |      AS BIGINT) AS bucket
           |  FROM proj GROUP BY vec_id
           |), probes AS (
           |  SELECT b.vec_id, xor(b.bucket, m.m) AS pb
           |  FROM bkt b,
           |    (SELECT CAST(unnest([0, 1, 2, 4, 8, 16, 32, 64, 128])
           |       AS BIGINT) AS m) m
           |), cand AS (
           |  SELECT DISTINCT p.vec_id AS qid, t.vec_id AS nid
           |  FROM probes p JOIN bkt t
           |    ON t.bucket = p.pb AND t.vec_id <> p.vec_id
           |), p2 AS (
           |  SELECT c.qid AS vec_id, c.nid AS neighbor_id,
           |    ${cosSql("a.e", "b.e")} AS cosine_sim
           |  FROM cand c
           |  JOIN v a ON c.qid = a.vec_id
           |  JOIN v b ON c.nid = b.vec_id
           |), r AS (
           |  SELECT vec_id, neighbor_id, cosine_sim,
           |    ROW_NUMBER() OVER (PARTITION BY vec_id
           |      ORDER BY cosine_sim DESC, neighbor_id) AS rank
           |  FROM p2
           |)
           |SELECT vec_id, rank, neighbor_id, cosine_sim FROM r
           |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin,
      // t111: first-touch stage times chain through per-user window
      // minima with strict-inequality conditions; conversions are
      // exact integer ppm
      "t111_funnel" ->
        """WITH e AS (
          |  SELECT user_id, epoch_us(ts) AS tsu, event_type FROM events
          |), s AS (
          |  SELECT user_id, tsu, event_type,
          |    MIN(CASE WHEN event_type = 'signup' THEN tsu END)
          |      OVER (PARTITION BY user_id) AS s0
          |  FROM e
          |), s1t AS (
          |  SELECT *, MIN(CASE WHEN event_type = 'view' AND s0 IS NOT NULL
          |      AND tsu > s0 AND tsu - s0 <= 86400000000 THEN tsu END)
          |    OVER (PARTITION BY user_id) AS s1
          |  FROM s
          |), s2t AS (
          |  SELECT *, MIN(CASE WHEN event_type = 'purchase'
          |      AND s1 IS NOT NULL AND tsu > s1
          |      AND tsu - s1 <= 86400000000 THEN tsu END)
          |    OVER (PARTITION BY user_id) AS s2
          |  FROM s1t
          |), pu AS (
          |  SELECT user_id,
          |    MAX(CASE WHEN s0 IS NOT NULL THEN 1 ELSE 0 END) AS r0,
          |    MAX(CASE WHEN s1 IS NOT NULL THEN 1 ELSE 0 END) AS r1,
          |    MAX(CASE WHEN s2 IS NOT NULL THEN 1 ELSE 0 END) AS r2
          |  FROM s2t GROUP BY user_id
          |), c AS (
          |  SELECT CAST(SUM(r0) AS BIGINT) AS n0,
          |    CAST(SUM(r1) AS BIGINT) AS n1,
          |    CAST(SUM(r2) AS BIGINT) AS n2
          |  FROM pu
          |)
          |SELECT * FROM (
          |  SELECT CAST(1 AS BIGINT) AS stage_no, 'signup' AS stage,
          |    n0 AS n_reached,
          |    (n0 * 1000000) // GREATEST(n0, 1) AS from_first_ppm,
          |    (n0 * 1000000) // GREATEST(n0, 1) AS from_prev_ppm
          |  FROM c
          |  UNION ALL
          |  SELECT CAST(2 AS BIGINT), 'view', n1,
          |    (n1 * 1000000) // GREATEST(n0, 1),
          |    (n1 * 1000000) // GREATEST(n0, 1)
          |  FROM c
          |  UNION ALL
          |  SELECT CAST(3 AS BIGINT), 'purchase', n2,
          |    (n2 * 1000000) // GREATEST(n0, 1),
          |    (n2 * 1000000) // GREATEST(n1, 1)
          |  FROM c
          |) ORDER BY stage_no""".stripMargin,
      // t73: sign-bit 32-bit-word packing (DuckDB raises on 1<<63, so
      // 32-bit words are the oracle-replayable layout), Hamming via
      // bit_count(xor), candidate cut at 16, exact-cosine refine
      "t73_ann_binary_topk" ->
        s"""WITH v AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
           |), bw AS (
           |  SELECT vec_id, list_transform(range(0, 2), wi ->
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(range(0, 32), j ->
           |        CASE WHEN wi * 32 + j < len(e)
           |                  AND e[CAST(wi * 32 + j + 1 AS INT)] >= 0
           |             THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
           |             ELSE CAST(0 AS BIGINT) END)),
           |      (a, b) -> a | b)) AS words
           |  FROM v
           |), q AS (
           |  SELECT vec_id AS query_id, words AS qwords FROM bw
           |  WHERE vec_id IN (0, 7, 42)
           |), h AS (
           |  SELECT q.query_id, b.vec_id,
           |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(range(0, 2), i ->
           |        CAST(bit_count(xor(q.qwords[CAST(i + 1 AS INT)],
           |          b.words[CAST(i + 1 AS INT)])) AS BIGINT))),
           |      (a, b) -> a + b) AS BIGINT) AS hamming
           |  FROM bw b CROSS JOIN q WHERE b.vec_id <> q.query_id
           |), hr AS (
           |  SELECT query_id, vec_id, hamming,
           |    ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY hamming, vec_id) AS hrank
           |  FROM h
           |), cand AS (
           |  SELECT query_id, vec_id, hamming FROM hr WHERE hrank <= 16
           |), rr AS (
           |  SELECT c.query_id, c.vec_id, c.hamming,
           |    ${cosSql("dv.e", "qv.e")} AS cosine_sim
           |  FROM cand c
           |  JOIN v dv ON dv.vec_id = c.vec_id
           |  JOIN v qv ON qv.vec_id = c.query_id
           |), rk AS (
           |  SELECT query_id, vec_id, hamming, cosine_sim,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY cosine_sim DESC, vec_id) AS BIGINT) AS rank
           |  FROM rr
           |)
           |SELECT query_id, rank, vec_id, hamming, cosine_sim
           |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
      // t75: the IVF-binary persisted index — Lloyd quantizer + cell
      // routing CTEs shared with t59/t63's replay, t73's 32-bit-word
      // packing and Hamming, probe-restricted candidates, cosine
      // refine
      "t75_ann_ivfbin_persisted" ->
        s"""WITH v AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
           |), ${lloydCtes("v", 16)}, pasg AS (
           |  SELECT v.vec_id, c.cid, ${cosSql("v.e", "c.ce")} AS cs
           |  FROM v, lc2 c
           |), pasgr AS (
           |  SELECT vec_id, cid,
           |    ROW_NUMBER() OVER (PARTITION BY vec_id
           |      ORDER BY cs DESC, cid) AS pr
           |  FROM pasg
           |), vcells AS (
           |  SELECT vec_id, cid FROM pasgr WHERE pr = 1
           |), qpr AS (
           |  SELECT vec_id AS qid, cid FROM pasgr
           |  WHERE pr <= 2 AND vec_id IN (${PqQueryIds.mkString(", ")})
           |), bw AS (
           |  SELECT vec_id, list_transform(range(0, 2), wi ->
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(range(0, 32), j ->
           |        CASE WHEN wi * 32 + j < len(e)
           |                  AND e[CAST(wi * 32 + j + 1 AS INT)] >= 0
           |             THEN (CAST(1 AS BIGINT) << CAST(j AS INT))
           |             ELSE CAST(0 AS BIGINT) END)),
           |      (a, b) -> a | b)) AS words
           |  FROM v
           |), h AS (
           |  SELECT qpr.qid AS query_id, b.vec_id, ce.cid AS cell,
           |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(range(0, 2), i ->
           |        CAST(bit_count(xor(qb.words[CAST(i + 1 AS INT)],
           |          b.words[CAST(i + 1 AS INT)])) AS BIGINT))),
           |      (a, b) -> a + b) AS BIGINT) AS hamming
           |  FROM bw b
           |  JOIN vcells ce ON ce.vec_id = b.vec_id
           |  JOIN qpr ON qpr.cid = ce.cid
           |  JOIN bw qb ON qb.vec_id = qpr.qid
           |  WHERE b.vec_id <> qpr.qid
           |), hr AS (
           |  SELECT query_id, vec_id, cell, hamming,
           |    ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY hamming, vec_id) AS hrank
           |  FROM h
           |), cand AS (
           |  SELECT query_id, vec_id, cell, hamming FROM hr WHERE hrank <= 16
           |), rr AS (
           |  SELECT c.query_id, c.vec_id, c.cell, c.hamming,
           |    ${cosSql("dv.e", "qv.e")} AS cosine_sim
           |  FROM cand c
           |  JOIN v dv ON dv.vec_id = c.vec_id
           |  JOIN v qv ON qv.vec_id = c.query_id
           |), rk AS (
           |  SELECT query_id, vec_id, cell, hamming, cosine_sim,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY cosine_sim DESC, vec_id) AS BIGINT) AS rank
           |  FROM rr
           |)
           |SELECT query_id, rank, vec_id, cell, hamming, cosine_sim
           |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
      // t77: COMPOSES the shared bm25Ctes chain (one replay, zero
      // divergence risk with t30/t66) — truth derives from the same
      // restricted tf relation the engine shares, base unions ranking
      // and truth query ids
      "t77_ranking_metrics" ->
        s"""WITH $bm25Ctes, qn AS (
           |  SELECT query_id, COUNT(*) AS qn FROM q GROUP BY 1
           |), truth AS (
           |  SELECT m.query_id, m.doc_id FROM (
           |    SELECT q.query_id, t.doc_id, COUNT(*) AS matched
           |    FROM tf t JOIN q USING (term) GROUP BY 1, 2) m
           |  JOIN qn USING (query_id) WHERE m.matched = qn.qn
           |), rel AS (
           |  SELECT query_id, COUNT(*) AS n_rel FROM truth GROUP BY 1
           |), hits AS (
           |  SELECT r.query_id, COUNT(*) AS hits, MIN(r.rank) AS first_rel
           |  FROM r JOIN truth USING (query_id, doc_id)
           |  WHERE r.rank <= 10 GROUP BY 1
           |), base AS (
           |  SELECT query_id FROM r UNION SELECT query_id FROM truth
           |), mm AS (
           |  SELECT b.query_id,
           |    CAST(COALESCE(rel.n_rel, 0) AS BIGINT) AS n_rel,
           |    CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
           |    h.first_rel
           |  FROM base b LEFT JOIN rel USING (query_id)
           |  LEFT JOIN hits h USING (query_id)
           |)
           |SELECT query_id, n_rel, hits,
           |  CAST((hits * 1000000) // 10 AS BIGINT) AS precision_scaled,
           |  CAST(CASE WHEN n_rel > 0 THEN (hits * 1000000) // n_rel
           |       ELSE 0 END AS BIGINT) AS recall_scaled,
           |  CAST(COALESCE(1000000 // first_rel, 0) AS BIGINT) AS mrr_scaled,
           |  CAST(CAST((hits * 1000000) // 10 AS BIGINT) AS DOUBLE) / 1000000.0
           |    AS precision_at_k,
           |  CAST(CAST(CASE WHEN n_rel > 0 THEN (hits * 1000000) // n_rel
           |       ELSE 0 END AS BIGINT) AS DOUBLE) / 1000000.0 AS recall_at_k,
           |  CAST(CAST(COALESCE(1000000 // first_rel, 0) AS BIGINT) AS DOUBLE)
           |    / 1000000.0 AS mrr
           |FROM mm ORDER BY query_id""".stripMargin,
      // t79: the same snapshot construction, digest comparison
      // replaced by direct text comparison (the engine's sha2 digests
      // keep collision-freedom under test, the t04/t76 discipline)
      "t79_corpus_drift" ->
        """WITH prev AS (
          |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0
          |), cur AS (
          |  SELECT doc_id,
          |    CASE WHEN doc_id % 7 = 0 THEN text || ' drift' ELSE text END AS text
          |  FROM documents WHERE doc_id % 3 <> 0
          |), j AS (
          |  SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
          |    p.text AS tp, c.text AS tc
          |  FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id
          |), membership AS (
          |  SELECT
          |    CAST(COUNT(tp) AS BIGINT) AS docs_prev,
          |    CAST(COUNT(tc) AS BIGINT) AS docs_cur,
          |    CAST(SUM(CASE WHEN tp IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS added,
          |    CAST(SUM(CASE WHEN tc IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS removed,
          |    CAST(SUM(CASE WHEN tp IS NOT NULL AND tc IS NOT NULL
          |      AND tp <> tc THEN 1 ELSE 0 END) AS BIGINT) AS changed,
          |    CAST(SUM(CASE WHEN tp = tc THEN 1 ELSE 0 END) AS BIGINT) AS unchanged
          |  FROM j
          |), vp AS (
          |  SELECT DISTINCT unnest(string_split_regex(trim(text), '\s+')) AS term
          |  FROM prev
          |), vc AS (
          |  SELECT DISTINCT unnest(string_split_regex(trim(text), '\s+')) AS term
          |  FROM cur
          |), vocab AS (
          |  SELECT
          |    CAST((SELECT COUNT(*) FROM vp) AS BIGINT) AS vocab_prev,
          |    CAST((SELECT COUNT(*) FROM vc) AS BIGINT) AS vocab_cur,
          |    CAST((SELECT COUNT(*) FROM vp JOIN vc USING (term)) AS BIGINT)
          |      AS vocab_shared
          |), wide AS (
          |  SELECT m.*, v.*,
          |    CAST(CASE WHEN v.vocab_prev + v.vocab_cur - v.vocab_shared > 0
          |      THEN (v.vocab_shared * 1000000) //
          |        (v.vocab_prev + v.vocab_cur - v.vocab_shared)
          |      ELSE 1000000 END AS BIGINT)
          |      AS vocab_jaccard_x1e6
          |  FROM membership m CROSS JOIN vocab v
          |)
          |SELECT metric, CAST(value AS BIGINT) AS value FROM (
          |  SELECT 'docs_prev' AS metric, docs_prev AS value FROM wide
          |  UNION ALL SELECT 'docs_cur', docs_cur FROM wide
          |  UNION ALL SELECT 'added', added FROM wide
          |  UNION ALL SELECT 'removed', removed FROM wide
          |  UNION ALL SELECT 'changed', changed FROM wide
          |  UNION ALL SELECT 'unchanged', unchanged FROM wide
          |  UNION ALL SELECT 'vocab_prev', vocab_prev FROM wide
          |  UNION ALL SELECT 'vocab_cur', vocab_cur FROM wide
          |  UNION ALL SELECT 'vocab_shared', vocab_shared FROM wide
          |  UNION ALL SELECT 'vocab_jaccard_x1e6', vocab_jaccard_x1e6 FROM wide
          |) ORDER BY metric""".stripMargin,
      // t76: the oracle groups by the RAW normalized text (the
      // engine's sha2 digest grouping keeps collision-freedom under
      // test, the t04 discipline) over the same planted perturbation
      "t76_dedup_normalized" ->
        """WITH all_docs AS (
          |  SELECT doc_id, text, lang, source, n_chars FROM documents
          |  UNION ALL
          |  SELECT doc_id + 1000000,
          |    translate(text, 'abcdefghijklmnopqrstuvwxyz',
          |      'ABCDEFGHIJKLMNOPQRSTUVWXYZ') || ' .',
          |    lang, source, n_chars
          |  FROM documents WHERE doc_id % 10 = 0
          |), norm AS (
          |  SELECT doc_id, lang, source, n_chars,
          |    trim(regexp_replace(regexp_replace(lower(text),
          |      '[.,!?;:]', '', 'g'), '\s+', ' ', 'g')) AS nt
          |  FROM all_docs
          |)
          |SELECT doc_id, lang, source, n_chars FROM norm
          |WHERE doc_id IN (SELECT MIN(doc_id) FROM norm GROUP BY nt)
          |ORDER BY doc_id""".stripMargin,
      // t74: IEEE sqrt is correctly rounded in both engines, so the
      // fixed op sequence FLOOR(LEAST(1, scale/sqrt(n))*2^32) is
      // bit-identical; survival is the shared 32-bit id-hash filter
      "t74_sqrt_temperature" ->
        s"""WITH cnt AS (
          |  SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
          |), thr AS (
          |  SELECT lang,
          |    CAST(FLOOR(LEAST(1.0, 2.0 / sqrt(CAST(n AS DOUBLE)))
          |      * 4294967296.0) AS BIGINT) AS thr
          |  FROM cnt
          |)
          |SELECT d.doc_id, d.lang, d.source
          |FROM documents d JOIN thr USING (lang)
          |WHERE ${idMixSql("d.doc_id")} < thr
          |ORDER BY d.doc_id""".stripMargin,
      // t72: the engine's deterministic full-width id-hash order
      // replayed verbatim inside the per-domain window
      "t72_domain_cap" ->
        s"""WITH r AS (
          |  SELECT doc_id, source,
          |    CAST(ROW_NUMBER() OVER (PARTITION BY source
          |      ORDER BY ${idMixSql("doc_id")}, doc_id) AS BIGINT)
          |      AS domain_rank
          |  FROM documents
          |)
          |SELECT doc_id, source, domain_rank FROM r
          |WHERE domain_rank <= 20 ORDER BY doc_id""".stripMargin,
      "t32_pq_encode" ->
        s"""WITH ${pqCtes(8, 64)}
           |SELECT vec_id,
           |  string_agg(CAST(code AS VARCHAR), ',' ORDER BY sub) AS codes,
           |  CAST(SUM(dist_scaled) AS DOUBLE) / 1000000.0 AS quant_err
           |FROM best GROUP BY vec_id ORDER BY vec_id""".stripMargin,
      "t47_sq_encode" ->
        s"""WITH $sqCtes
           |SELECT vec_id, maxabs,
           |  array_to_string(codes, ',') AS codes,
           |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    list_transform(range(1, len(l) + 1),
           |      i -> abs(l[CAST(i AS INT)])
           |        - ((abs(codes[CAST(i AS INT)]) * maxabs) // 127))),
           |    (x, y) -> x + y) AS DOUBLE) / 1000000.0 AS recon_err
           |FROM sqc ORDER BY vec_id""".stripMargin,
      "t48_sq_topk" ->
        s"""WITH $sqCtes, q AS (
           |  SELECT vec_id AS query_id, l AS ql FROM sq0
           |  WHERE vec_id IN (0, 7, 42)
           |), s0 AS (
           |  SELECT q.query_id, c.vec_id, c.codes, q.ql, c.maxabs
           |  FROM sqc c, q WHERE q.query_id <> c.vec_id
           |), s AS (
           |  SELECT query_id, vec_id,
           |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(range(1, len(codes) + 1),
           |        i -> codes[CAST(i AS INT)] * ql[CAST(i AS INT)])),
           |      (x, y) -> x + y) AS BIGINT) * maxabs AS adot
           |  FROM s0
           |), r AS (
           |  SELECT query_id, vec_id, adot,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY adot DESC, vec_id) AS BIGINT) AS rank
           |  FROM s
           |)
           |SELECT query_id, rank, vec_id, adot FROM r
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
      "t49_image_phash" ->
        s"""WITH ${phashCtes()}
           |SELECT doc_id, phash, TRUE AS decoded FROM ph
           |ORDER BY doc_id""".stripMargin,
      "t50_image_phash_dedup" ->
        s"""WITH tw AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + $TwinStride, 'x' || substr(text, 2)
           |  FROM documents WHERE doc_id % 7 = 0 AND length(text) > 0
           |), ${phashCtes("tw")}
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
           |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.phash, b.phash)) <= $PhashMaxHamming
           |ORDER BY id_a, id_b""".stripMargin,
      "t51_video_keyframe_dedup" ->
        s"""WITH vd AS (
           |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
           |  FROM documents
           |  WHERE length(text) > 0
           |    AND octet_length(encode(text)) = length(text)
           |), vf AS (
           |  SELECT doc_id, text, len,
           |    unnest(range(0, (len + 47) // 48)) AS i
           |  FROM vd
           |), vg AS (
           |  SELECT doc_id, i AS frame_no,
           |    list_transform(range(0, 64), j ->
           |      CASE WHEN j < 48 AND (48 * i + j) < len
           |        THEN CAST(unicode(substr(text,
           |          CAST(48 * i + j + 1 AS INT), 1)) AS BIGINT)
           |        ELSE CAST(0 AS BIGINT) END) AS g
           |  FROM vf WHERE (i % 2) = 0
           |), vm AS (
           |  SELECT doc_id, frame_no, g,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT), g), (x, y) -> x + y)
           |      // 64 AS mean
           |  FROM vg
           |), vp AS (
           |  SELECT doc_id, frame_no,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(range(0, 63), j ->
           |        CASE WHEN g[CAST(j + 1 AS INT)] > mean
           |          THEN CAST(1 AS BIGINT) << CAST(j AS INT)
           |          ELSE CAST(0 AS BIGINT) END)),
           |      (x, y) -> x + y)
           |    + CASE WHEN g[64] > mean THEN (-9223372036854775807 - 1)
           |      ELSE CAST(0 AS BIGINT) END AS phash
           |  FROM vm
           |)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(COUNT(*) AS BIGINT) AS shared_frames
           |FROM vp a JOIN vp b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.phash, b.phash)) <= $KeyframeMaxHamming
           |GROUP BY 1, 2 HAVING COUNT(*) >= $KeyframeMinShared
           |ORDER BY 1, 2""".stripMargin,
      // t64: the pixel-level face of t51 — each 48-char slice is
      // stretched over a 16×16 gray canvas (pixel p = slice byte
      // (p·seglen)//256), the 8×8 aHash samples canvas cell
      // 32·(j//8) + 2·(j%8), so the sampled byte is slice position
      // ((32·(j//8) + 2·(j%8))·seglen)//256 — real decode on the
      // Spark side, exact character arithmetic here
      "t64_video_pixel_dedup" ->
        s"""WITH vd AS (
           |  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len
           |  FROM documents
           |  WHERE length(text) > 0
           |    AND octet_length(encode(text)) = length(text)
           |), vf AS (
           |  SELECT doc_id, text, len,
           |    unnest(range(0, (len + 47) // 48)) AS i
           |  FROM vd
           |), vs AS (
           |  SELECT doc_id, text, i AS frame_no, 48 * i AS off,
           |    LEAST(CAST(48 AS BIGINT), len - 48 * i) AS seglen
           |  FROM vf WHERE (i % 2) = 0
           |), vg AS (
           |  SELECT doc_id, frame_no,
           |    list_transform(range(0, 64), j ->
           |      CAST(unicode(substr(text,
           |        CAST(off + ((32 * (j // 8) + 2 * (j % 8)) * seglen) // 256
           |          + 1 AS INT), 1)) AS BIGINT)) AS g
           |  FROM vs
           |), vm AS (
           |  SELECT doc_id, frame_no, g,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT), g), (x, y) -> x + y)
           |      // 64 AS mean
           |  FROM vg
           |), vp AS (
           |  SELECT doc_id, frame_no,
           |    list_reduce(list_prepend(CAST(0 AS BIGINT),
           |      list_transform(range(0, 63), j ->
           |        CASE WHEN g[CAST(j + 1 AS INT)] > mean
           |          THEN CAST(1 AS BIGINT) << CAST(j AS INT)
           |          ELSE CAST(0 AS BIGINT) END)),
           |      (x, y) -> x + y)
           |    + CASE WHEN g[64] > mean THEN (-9223372036854775807 - 1)
           |      ELSE CAST(0 AS BIGINT) END AS phash
           |  FROM vm
           |)
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(COUNT(*) AS BIGINT) AS shared_frames
           |FROM vp a JOIN vp b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.phash, b.phash)) <= $KeyframeMaxHamming
           |GROUP BY 1, 2 HAVING COUNT(*) >= $KeyframeMinShared
           |ORDER BY 1, 2""".stripMargin,
      // t65: sliding l-grams on TOKEN TEXT (the engine's fnv64
      // compression is under test), corpus frequency >= 2, gap > l
      // breaks ranges, coalesced mass = e - s + l per range
      "t65_dup_ranges" ->
        s"""WITH dtok AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts,
           |    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n
           |  FROM documents
           |), dg AS (
           |  SELECT doc_id,
           |    unnest(range(0, GREATEST(n - $DupRangeL + 1, 0))) AS i
           |  FROM dtok
           |), dgt AS (
           |  SELECT g.doc_id, g.i,
           |    array_to_string(list_slice(t.ts, CAST(g.i + 1 AS INT),
           |      CAST(g.i + $DupRangeL AS INT)), ' ') AS gram
           |  FROM dg g JOIN dtok t USING (doc_id)
           |), hot AS (
           |  SELECT gram FROM dgt GROUP BY gram HAVING COUNT(*) >= 2
           |), hits AS (
           |  SELECT doc_id, i FROM dgt WHERE gram IN (SELECT gram FROM hot)
           |), flg AS (
           |  SELECT doc_id, i,
           |    CASE WHEN lag(i) OVER (PARTITION BY doc_id ORDER BY i) IS NULL
           |      OR i - lag(i) OVER (PARTITION BY doc_id ORDER BY i)
           |        > $DupRangeL
           |      THEN 1 ELSE 0 END AS f
           |  FROM hits
           |), grp AS (
           |  SELECT doc_id, i,
           |    SUM(f) OVER (PARTITION BY doc_id ORDER BY i) AS gid
           |  FROM flg
           |), rng AS (
           |  SELECT doc_id, gid, MIN(i) AS s, MAX(i) AS e
           |  FROM grp GROUP BY 1, 2
           |), ragg AS (
           |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
           |    CAST(SUM(e - s + $DupRangeL) AS BIGINT) AS dup_tokens
           |  FROM rng GROUP BY 1
           |)
           |SELECT t.doc_id, t.n AS n_tokens,
           |  COALESCE(a.n_dup_spans, CAST(0 AS BIGINT)) AS n_dup_spans,
           |  COALESCE(a.dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens
           |FROM dtok t LEFT JOIN ragg a USING (doc_id)
           |ORDER BY doc_id""".stripMargin,
      "t52_incr_image_dedup" ->
        s"""WITH tw AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + $TwinStride, 'x' || substr(text, 2)
           |  FROM documents WHERE doc_id % 10 = 1 AND length(text) > 0
           |  UNION ALL
           |  SELECT doc_id + ${2 * TwinStride}, text
           |  FROM documents WHERE doc_id % 10 = 2
           |  UNION ALL
           |  SELECT doc_id + ${3 * TwinStride}, reverse(text)
           |  FROM documents WHERE doc_id % 10 = 3
           |), ${phashCtes("tw")}, pidx AS (
           |  SELECT doc_id, phash FROM ph WHERE doc_id < $TwinStride
           |), pbt AS (
           |  SELECT doc_id, phash FROM ph WHERE doc_id >= $TwinStride
           |), cand AS (
           |  SELECT b.doc_id AS batch_id, a.doc_id AS idx_id,
           |    CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS hamming
           |  FROM pidx a JOIN pbt b
           |    ON bit_count(xor(a.phash, b.phash)) <= $PhashMaxHamming
           |), best AS (
           |  SELECT batch_id, idx_id AS match_id, hamming FROM (
           |    SELECT batch_id, idx_id, hamming,
           |      ROW_NUMBER() OVER (PARTITION BY batch_id
           |        ORDER BY hamming, idx_id) AS rn
           |    FROM cand) t WHERE rn = 1
           |)
           |SELECT b.doc_id AS batch_id,
           |  CASE WHEN best.hamming = 0 THEN 'exact'
           |       WHEN best.hamming IS NOT NULL THEN 'near'
           |       ELSE 'new' END AS status,
           |  best.match_id, best.hamming
           |FROM pbt b LEFT JOIN best ON b.doc_id = best.batch_id
           |ORDER BY batch_id""".stripMargin,
      "t53_audio_fp_dedup" ->
        s"""WITH tw AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + $TwinStride, text
           |  FROM documents WHERE doc_id % 9 = 2
           |  UNION ALL
           |  SELECT doc_id + ${2 * TwinStride}, 'x' || substr(text, 2)
           |  FROM documents WHERE doc_id % 9 = 5 AND length(text) > 0
           |), ${audioFpCtes("tw")}
           |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           |  CAST(bit_count(xor(a.afp, b.afp)) AS BIGINT) AS hamming
           |FROM afp a JOIN afp b ON a.doc_id < b.doc_id
           |WHERE bit_count(xor(a.afp, b.afp)) <= $AudioFpMaxHamming
           |ORDER BY id_a, id_b""".stripMargin,
      "t54_hll_sketch" ->
        s"""WITH toks AS (
           |  SELECT string_split_regex(trim(text), '\\s+') AS ts FROM documents
           |), g AS (
           |  SELECT unnest(CASE WHEN len(ts) < 3 THEN CAST([] AS VARCHAR[])
           |    ELSE list_transform(range(1, len(ts) - 1), i ->
           |      ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1] || ' ' || ts[CAST(i AS INT)+2])
           |    END) AS tk
           |  FROM toks
           |), h AS (
           |  SELECT (${polyHashSql("tk")} * 2654435761 + 123456789)
           |    % 4294967296 AS h
           |  FROM g
           |), rr AS (
           |  SELECT h % 256 AS bucket,
           |    CASE WHEN h // 256 = 0 THEN 25
           |         ELSE 25 - length(bin(h // 256)) END AS rho
           |  FROM h
           |), regs AS (
           |  SELECT bucket, MAX(rho) AS r FROM rr GROUP BY 1
           |), agg AS (
           |  SELECT COUNT(*) AS n_filled,
           |    CAST(SUM(CAST(1 AS BIGINT) << CAST(25 - r AS INT)) AS BIGINT)
           |      AS z_filled
           |  FROM regs
           |)
           |SELECT CAST(8 AS BIGINT) AS p, CAST(256 AS BIGINT) AS m,
           |  256 - n_filled AS n_zero_regs,
           |  z_filled + (256 - n_filled) * ${1L << 25} AS z_scaled,
           |  CAST(FLOOR((CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE)
           |      + CAST(1.079 AS DOUBLE) / CAST(256 AS DOUBLE)))
           |    * CAST(${256L * 256} AS DOUBLE) * CAST(${1L << 25} AS DOUBLE)
           |    / CAST(z_filled + (256 - n_filled) * ${1L << 25} AS DOUBLE))
           |    AS BIGINT) AS est_distinct,
           |  (SELECT COUNT(DISTINCT h) FROM h) AS exact_distinct
           |FROM agg""".stripMargin,
      "t55_kmv_setops" ->
        s"""WITH toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts
           |  FROM documents
           |), g AS (
           |  SELECT doc_id % 2 AS side,
           |    unnest(CASE WHEN len(ts) < 3 THEN CAST([] AS VARCHAR[])
           |    ELSE list_transform(range(1, len(ts) - 1), i ->
           |      ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1] || ' ' || ts[CAST(i AS INT)+2])
           |    END) AS tk
           |  FROM toks
           |), h AS (
           |  SELECT DISTINCT side, (${polyHashSql("tk")} * 2654435761 + 123456789)
           |    % 4294967296 AS h
           |  FROM g
           |), sa AS (
           |  SELECT h FROM h WHERE side = 0 ORDER BY h LIMIT 200
           |), sb AS (
           |  SELECT h FROM h WHERE side = 1 ORDER BY h LIMIT 200
           |), mg AS (
           |  SELECT DISTINCT h FROM (SELECT h FROM sa UNION ALL SELECT h FROM sb)
           |  ORDER BY h LIMIT 200
           |), su AS (
           |  SELECT COUNT(*) AS n_u, MAX(mg.h) AS uk_u,
           |    CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL
           |      THEN 1 ELSE 0 END) AS BIGINT) AS rho
           |  FROM mg LEFT JOIN sa a ON mg.h = a.h LEFT JOIN sb b ON mg.h = b.h
           |), st AS (
           |  SELECT (SELECT COUNT(*) FROM sa) AS n_a,
           |    (SELECT MAX(h) FROM sa) AS uk_a,
           |    (SELECT COUNT(*) FROM sb) AS n_b,
           |    (SELECT MAX(h) FROM sb) AS uk_b,
           |    (SELECT COUNT(DISTINCT h) FROM h) AS exact_union,
           |    (SELECT COUNT(*) FROM (SELECT h FROM h WHERE side = 0
           |      INTERSECT SELECT h FROM h WHERE side = 1)) AS exact_intersect
           |)
           |SELECT CAST(200 AS BIGINT) AS k,
           |  CASE WHEN n_a < 200 THEN n_a
           |       ELSE ${199L * 4294967296L} // GREATEST(uk_a, 1) END AS est_a,
           |  CASE WHEN n_b < 200 THEN n_b
           |       ELSE ${199L * 4294967296L} // GREATEST(uk_b, 1) END AS est_b,
           |  CASE WHEN n_u < 200 THEN n_u
           |       ELSE ${199L * 4294967296L} // GREATEST(uk_u, 1) END AS est_union,
           |  rho,
           |  CASE WHEN n_u < 200 THEN rho
           |       ELSE (rho * (CASE WHEN n_u < 200 THEN n_u
           |         ELSE ${199L * 4294967296L} // GREATEST(uk_u, 1) END)) // 200
           |  END AS est_intersect,
           |  exact_union, exact_intersect
           |FROM su, st""".stripMargin,
      "t56_bloom_decontam" -> {
        val n = DecontamN
        val m = CorpusOps.BloomBits
        s"""WITH toks AS (
           |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts FROM documents
           |), grams AS (
           |  SELECT DISTINCT doc_id, unnest(
           |    CASE WHEN len(ts) < $n THEN [array_to_string(ts, ' ')]
           |    ELSE list_transform(range(1, len(ts) - ${n - 2}), i ->
           |      array_to_string(ts[CAST(i AS INT):CAST(i + ${n - 1} AS INT)], ' '))
           |    END) AS g
           |  FROM toks
           |), gh AS (
           |  SELECT doc_id, g, ${polyHashSql("g")} AS hb FROM grams
           |), bh AS (
           |  SELECT DISTINCT hb FROM gh WHERE doc_id % 10 = 0
           |), bpos AS (
           |  SELECT unnest([
           |    (hb * 2654435761 + 123456789) % 4294967296 % $m,
           |    (hb * 2246822519 + 3266489917) % 4294967296 % $m]) AS pos
           |  FROM bh
           |), words AS (
           |  SELECT pos // 64 AS w,
           |    CAST(bit_or(CASE WHEN pos % 64 = 63
           |      THEN (-9223372036854775807 - 1)
           |      ELSE CAST(1 AS BIGINT) << CAST(pos % 64 AS INT) END) AS BIGINT)
           |      AS word
           |  FROM bpos GROUP BY 1
           |), tg AS (
           |  SELECT doc_id,
           |    (hb * 2654435761 + 123456789) % 4294967296 % $m AS p1,
           |    (hb * 2246822519 + 3266489917) % 4294967296 % $m AS p2
           |  FROM gh WHERE doc_id % 10 <> 0
           |), hits AS (
           |  SELECT t.doc_id, CAST(SUM(CASE WHEN
           |      (COALESCE(w1.word, 0) & (CASE WHEN t.p1 % 64 = 63
           |        THEN (-9223372036854775807 - 1)
           |        ELSE CAST(1 AS BIGINT) << CAST(t.p1 % 64 AS INT) END)) <> 0
           |      AND (COALESCE(w2.word, 0) & (CASE WHEN t.p2 % 64 = 63
           |        THEN (-9223372036854775807 - 1)
           |        ELSE CAST(1 AS BIGINT) << CAST(t.p2 % 64 AS INT) END)) <> 0
           |    THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
           |  FROM tg t
           |  LEFT JOIN words w1 ON t.p1 // 64 = w1.w
           |  LEFT JOIN words w2 ON t.p2 // 64 = w2.w
           |  GROUP BY 1
           |), bg AS (
           |  SELECT DISTINCT g FROM grams WHERE doc_id % 10 = 0
           |), ex AS (
           |  SELECT DISTINCT t.doc_id FROM grams t JOIN bg USING (g)
           |  WHERE t.doc_id % 10 <> 0
           |), sizes AS (
           |  SELECT doc_id, COUNT(*) AS n_shingles FROM grams
           |  WHERE doc_id % 10 <> 0 GROUP BY 1
           |)
           |SELECT s.doc_id, s.n_shingles, COALESCE(h.n_hits, 0) AS n_hits,
           |  CAST(COALESCE(h.n_hits, 0) > 0 AS BIGINT) AS flagged,
           |  CAST(ex.doc_id IS NOT NULL AS BIGINT) AS exact_hit
           |FROM sizes s
           |LEFT JOIN hits h USING (doc_id)
           |LEFT JOIN ex ON s.doc_id = ex.doc_id
           |ORDER BY doc_id""".stripMargin
      },
      "t57_crossmodal_dedup" ->
        s"""WITH tw0 AS (
           |  SELECT doc_id, text FROM documents
           |  UNION ALL
           |  SELECT doc_id + $TwinStride, text
           |  FROM documents WHERE doc_id % 9 = 2
           |  UNION ALL
           |  SELECT doc_id + ${2 * TwinStride}, 'x' || substr(text, 2)
           |  FROM documents WHERE doc_id % 9 = 5 AND length(text) > 0
           |), tw AS (
           |  SELECT doc_id, text FROM tw0
           |  WHERE length(text) > 0
           |    AND octet_length(encode(text)) = length(text)
           |), ${minhashCtes(64, 16, 0.5, "tw")}, ${phashCtes("tw")}, ipairs AS (
           |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
           |  FROM ph a JOIN ph b ON a.doc_id < b.doc_id
           |  WHERE bit_count(xor(a.phash, b.phash)) <= $PhashMaxHamming
           |)
           |SELECT COALESCE(t.id_a, i.id_a) AS id_a,
           |  COALESCE(t.id_b, i.id_b) AS id_b,
           |  CAST(t.id_a IS NOT NULL AS BIGINT) AS text_dup,
           |  CAST(i.id_a IS NOT NULL AS BIGINT) AS image_dup,
           |  CASE WHEN t.id_a IS NOT NULL AND i.id_a IS NOT NULL THEN 'both'
           |       WHEN t.id_a IS NOT NULL THEN 'text' ELSE 'image' END AS modality
           |FROM pairs t FULL OUTER JOIN ipairs i
           |  ON t.id_a = i.id_a AND t.id_b = i.id_b
           |ORDER BY 1, 2""".stripMargin,
      "t58_curriculum_order" ->
        s"""WITH toks AS (
          |  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
          |  FROM documents
          |), tf AS (
          |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
          |), cnt AS (
          |  SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY term
          |), agg AS (
          |  SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
          |    CAST(SUM(tf.tf * cnt.cnt) AS BIGINT) AS hit_mass
          |  FROM tf JOIN cnt USING (term) GROUP BY 1
          |), scored AS (
          |  SELECT doc_id, hit_mass // n_tokens AS score FROM agg
          |), mm AS (
          |  SELECT MIN(score) AS mn, MAX(score) AS mx FROM scored
          |), keyed AS (
          |  SELECT doc_id, score,
          |    ((score - mn) * 4) // (mx - mn + 1) AS bin,
          |    ${idMixSql("doc_id")} AS shuffle_key
          |  FROM scored, mm
          |)
          |SELECT doc_id, score, bin, shuffle_key,
          |  CAST(ROW_NUMBER() OVER (ORDER BY bin DESC, shuffle_key, doc_id)
          |    AS BIGINT) AS order_idx
          |FROM keyed ORDER BY order_idx""".stripMargin,
      "t62_corpus_report" ->
        """WITH pd AS (
          |  SELECT source, lang,
          |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nt,
          |    CAST(length(text) AS BIGINT) AS nc, text
          |  FROM documents
          |), base AS (
          |  SELECT source, COUNT(*) AS n_docs,
          |    CAST(SUM(nt) AS BIGINT) AS n_tokens,
          |    CAST(SUM(nc) AS BIGINT) AS n_chars,
          |    COUNT(DISTINCT text) AS n_distinct_texts,
          |    COUNT(DISTINCT lang) AS n_langs
          |  FROM pd GROUP BY 1
          |), ml AS (
          |  SELECT source, lang AS modal_lang FROM (
          |    SELECT source, lang, COUNT(*) AS cnt,
          |      ROW_NUMBER() OVER (PARTITION BY source
          |        ORDER BY COUNT(*) DESC, lang) AS rn
          |    FROM pd GROUP BY source, lang) x
          |  WHERE rn = 1
          |)
          |SELECT b.source, n_docs, n_tokens, n_chars,
          |  n_docs - n_distinct_texts AS n_exact_dup_docs,
          |  n_langs, modal_lang,
          |  n_tokens // n_docs AS avg_doc_tokens,
          |  n_chars // GREATEST(n_tokens, 1) AS avg_token_len
          |FROM base b JOIN ml USING (source)
          |ORDER BY source""".stripMargin,
      "t60_perceptron_train" -> perceptronOracleSql(64, 3),
      "t61_cm_sketch" -> {
        val arms = graft.operators.CorpusOps.CmProbes.zipWithIndex.map {
          case ((a, b), j) =>
            s"SELECT $j AS j, (h * $a + $b) % 4294967296 % 1024 AS bucket," +
              s" gram, cnt FROM gc"
        }
        s"""WITH toks AS (
           |  SELECT string_split_regex(trim(text), '\\s+') AS ts FROM documents
           |), g AS (
           |  SELECT unnest(CASE WHEN len(ts) < 2 THEN CAST([] AS VARCHAR[])
           |    ELSE list_transform(range(1, len(ts)), i ->
           |      ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1]) END) AS gram
           |  FROM toks
           |), gc AS (
           |  SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt,
           |    ${polyHashSql("gram")} AS h
           |  FROM g GROUP BY gram
           |), pos AS (
           |  ${arms.mkString("\n  UNION ALL\n  ")}
           |), cs AS (
           |  SELECT j, bucket, CAST(SUM(cnt) AS BIGINT) AS c
           |  FROM pos GROUP BY 1, 2
           |), top AS (
           |  SELECT gram, cnt FROM gc ORDER BY cnt DESC, gram LIMIT 20
           |), est AS (
           |  SELECT p.gram, p.cnt, MIN(c.c) AS est_cnt
           |  FROM pos p JOIN cs c USING (j, bucket)
           |  JOIN top t ON t.gram = p.gram
           |  GROUP BY 1, 2
           |)
           |SELECT gram, cnt, est_cnt FROM est
           |ORDER BY cnt DESC, gram""".stripMargin
      },
      "t34_bpe_train" -> bpeTrainOracleSql,
      "t38_incremental_dedup" -> incrementalDedupOracleSql(64, 16, 0.5),
      "t37_quality_prune" ->
        """WITH toks AS (
          |  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
          |  FROM documents
          |), tf AS (
          |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2
          |), cnt AS (
          |  SELECT term, CAST(SUM(tf) AS BIGINT) AS cnt FROM tf GROUP BY term
          |), agg AS (
          |  SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
          |    CAST(SUM(tf.tf * cnt.cnt) AS BIGINT) AS hit_mass
          |  FROM tf JOIN cnt USING (term) GROUP BY 1
          |), scored AS (
          |  SELECT a.doc_id, d.source, a.hit_mass // a.n_tokens AS score
          |  FROM agg a JOIN documents d USING (doc_id)
          |), hist AS (
          |  SELECT source, score, COUNT(*) AS cnt FROM scored GROUP BY 1, 2
          |), nper AS (
          |  SELECT source, COUNT(*) AS n FROM scored GROUP BY 1
          |), cum AS (
          |  SELECT source, score,
          |    SUM(cnt) OVER (PARTITION BY source ORDER BY score DESC
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          |  FROM hist
          |), thr AS (
          |  SELECT c.source, MAX(c.score) AS thr
          |  FROM cum c JOIN nper p USING (source)
          |  WHERE c.cum >= CAST(ceil(p.n * 0.25) AS BIGINT) GROUP BY 1
          |)
          |SELECT s.doc_id, s.source, CAST(s.score AS BIGINT) AS score
          |FROM scored s JOIN thr t USING (source) WHERE s.score >= t.thr
          |ORDER BY s.doc_id""".stripMargin,
      "t35_audio_decode" ->
        """SELECT doc_id,
          |  CAST(8000 AS BIGINT) AS sample_rate,
          |  CAST(1 AS BIGINT) AS channels,
          |  CAST(8 AS BIGINT) AS bits,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS n_frames,
          |  CAST(octet_length(encode(text)) AS BIGINT) * 1000 // 8000
          |    AS duration_ms,
          |  list_reduce(list_prepend(CAST(0 AS BIGINT),
          |    list_transform(range(1, length(text) + 1),
          |      i -> CAST((unicode(substr(text, i, 1)) - 128)
          |        * (unicode(substr(text, i, 1)) - 128) AS BIGINT))),
          |    (x, y) -> x + y) AS energy,
          |  TRUE AS decoded
          |FROM documents
          |WHERE octet_length(encode(text)) = length(text)
          |ORDER BY doc_id""".stripMargin,
      "t36_mp4_frames" ->
        """WITH d AS (
          |  SELECT doc_id, text,
          |    CAST(octet_length(encode(text)) AS BIGINT) AS len
          |  FROM documents WHERE length(text) > 0
          |    AND octet_length(encode(text)) = length(text)
          |)
          |SELECT doc_id,
          |  ((len + 47) // 48 + 1) // 2 AS n_frames_kept,
          |  list_reduce(list_prepend(CAST(0 AS BIGINT),
          |    list_transform(range(0, (len + 47) // 48),
          |      i -> CASE WHEN (i % 2) = 0
          |        THEN CAST(least(48, len - (48 * i)) AS BIGINT)
          |        ELSE CAST(0 AS BIGINT) END)),
          |    (x, y) -> x + y) AS kept_bytes,
          |  list_reduce(list_prepend(CAST(0 AS BIGINT),
          |    list_transform(range(0, (len + 47) // 48),
          |      i -> CASE WHEN (i % 2) = 0
          |        THEN CAST(unicode(substr(text, CAST((48 * i) + 1 AS INT), 1))
          |          AS BIGINT)
          |        ELSE CAST(0 AS BIGINT) END)),
          |    (x, y) -> x + y) AS first_byte_sum,
          |  CAST(0 AS BIGINT) AS n_fake
          |FROM d ORDER BY doc_id""".stripMargin,
      "t33_pq_adc_topk" ->
        s"""WITH ${pqCtes(8, 64)}, q AS (
           |  SELECT vec_id AS qid, sub, sv AS qv FROM sv
           |  WHERE vec_id IN (0, 7, 42)
           |), lut AS (
           |  SELECT q.qid, q.sub, c.code,
           |    CAST(FLOOR(${l2sqSql("qv", "cv", 8)} * 1000000.0) AS BIGINT)
           |      AS lut_scaled
           |  FROM q JOIN cs c USING (sub)
           |), acc AS (
           |  SELECT l.qid AS query_id, b.vec_id,
           |    CAST(SUM(l.lut_scaled) AS BIGINT) AS adist_scaled
           |  FROM best b
           |  JOIN lut l ON l.sub = b.sub AND l.code = b.code AND l.qid <> b.vec_id
           |  GROUP BY 1, 2
           |), r AS (
           |  SELECT query_id, vec_id, adist_scaled,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY adist_scaled, vec_id) AS BIGINT) AS rank
           |  FROM acc
           |)
           |SELECT query_id, rank, vec_id,
           |  CAST(adist_scaled AS DOUBLE) / 1000000.0 AS approx_dist
           |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
      "t59_ann_ivfpq_topk" -> ivfPqOracleSql,
      // the persisted-index search is row-for-row the one-shot
      // operator (frozen quantizer, identical scaled-long ADC), so
      // the SAME oracle replay gates it
      "t63_ann_ivfpq_persisted" -> ivfPqOracleSql,
      // t67: ADC candidates (rank <= RerankDepth from the same
      // composition) refined by the exact sequential-fold cosine
      "t67_ann_ivfpq_rerank" ->
        s"""WITH $ivfPqOracleBody, cand AS (
           |  SELECT query_id, vec_id FROM r WHERE rank <= $RerankDepth
           |), rr AS (
           |  SELECT c.query_id, c.vec_id,
           |    ${cosSql("dv.e", "qv.e")} AS cosine_sim
           |  FROM cand c
           |  JOIN v dv ON dv.vec_id = c.vec_id
           |  JOIN v qv ON qv.vec_id = c.query_id
           |), rk AS (
           |  SELECT query_id, vec_id, cosine_sim,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id
           |      ORDER BY cosine_sim DESC, vec_id) AS BIGINT) AS rank
           |  FROM rr
           |)
           |SELECT query_id, rank, vec_id, cosine_sim
           |FROM rk WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,
      "t31_split_shuffle" ->
        s"""SELECT doc_id,
          |  CASE WHEN ${idMixSql("doc_id")} % 100 < 10 THEN 'val'
          |       WHEN ${idMixSql("doc_id")} % 100 < 20 THEN 'test'
          |       ELSE 'train' END AS split,
          |  ${idMixSql("doc_id")} AS shuffle_key
          |FROM documents ORDER BY doc_id""".stripMargin,
      "t27_mix_sample" ->
        s"""WITH cnt AS (
          |  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
          |), thr AS (
          |  SELECT source,
          |    CAST(FLOOR(LEAST(1.0,
          |      (CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3
          |                   WHEN 'src2' THEN 0.2 ELSE 0.0 END)
          |      * CAST(60 AS DOUBLE) / CAST(n AS DOUBLE)) * 4294967296.0)
          |      AS BIGINT) AS thr
          |  FROM cnt
          |)
          |SELECT d.doc_id, d.source, d.lang
          |FROM documents d JOIN thr USING (source)
          |WHERE ${idMixSql("d.doc_id")} < thr
          |ORDER BY d.doc_id""".stripMargin,
      "t39_token_budget" ->
        s"""WITH base AS (
           |  SELECT doc_id, source, ${T.nTokens("text")} AS n_tokens,
           |    ${idMixSql("doc_id")} AS ord
           |  FROM documents
           |), sh AS (
           |  SELECT *, ord % 8 AS shard FROM base
           |), alloc AS (
           |  SELECT source, shard,
           |    COALESCE(CAST(SUM(sh_tokens) OVER (
           |      PARTITION BY source ORDER BY shard
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
           |      0) AS bef
           |  FROM (SELECT source, shard, CAST(SUM(n_tokens) AS BIGINT) AS sh_tokens
           |        FROM sh GROUP BY source, shard)
           |), cum AS (
           |  SELECT s.doc_id, s.source, s.n_tokens,
           |    a.bef + CAST(SUM(s.n_tokens) OVER (
           |      PARTITION BY s.source, s.shard ORDER BY s.ord, s.doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |      AS cum_tokens
           |  FROM sh s JOIN alloc a ON s.source = a.source AND s.shard = a.shard
           |)
           |SELECT doc_id, source, n_tokens, cum_tokens FROM cum
           |WHERE cum_tokens <= CASE source WHEN 'src0' THEN 100000
           |  WHEN 'src1' THEN 500 WHEN 'src2' THEN 40 ELSE 0 END
           |ORDER BY doc_id""".stripMargin,
      "t40_sem_dedup" ->
        s"""WITH v AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
           |), ${lloydCtes("v", 16)}, asg AS (
           |  SELECT v.vec_id, c.cid, ${cosSql("v.e", "c.ce")} AS cs
           |  FROM v, lc2 c
           |), asgr AS (
           |  SELECT vec_id, cid,
           |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS pr
           |  FROM asg
           |), m AS (
           |  SELECT a.cid, v.vec_id, v.e FROM asgr a JOIN v USING (vec_id)
           |  WHERE a.pr = 1
           |), drp AS (
           |  SELECT DISTINCT b.vec_id FROM m a JOIN m b
           |  ON a.cid = b.cid AND a.vec_id < b.vec_id
           |  WHERE ${cosSql("a.e", "b.e")} >= 0.3
           |)
           |SELECT m.vec_id, m.cid, (d.vec_id IS NULL) AS kept
           |FROM m LEFT JOIN drp d ON m.vec_id = d.vec_id
           |ORDER BY m.vec_id""".stripMargin,
      "t41_proto_sample" ->
        s"""WITH v AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
           |), ${lloydCtes("v", 16)}, asg AS (
           |  SELECT v.vec_id, c.cid, ${cosSql("v.e", "c.ce")} AS cs
           |  FROM v, lc2 c
           |), m AS (
           |  SELECT vec_id, cid, cs FROM (
           |    SELECT vec_id, cid, cs,
           |      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS pr
           |    FROM asg) a
           |  WHERE pr = 1
           |), r AS (
           |  SELECT vec_id, cid,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY cid ORDER BY cs ASC, vec_id)
           |      AS BIGINT) AS proto_rank,
           |    COUNT(*) OVER (PARTITION BY cid) AS cluster_n
           |  FROM m
           |)
           |SELECT vec_id, cid, proto_rank,
           |  proto_rank <= CAST(ceil(cluster_n * 0.5) AS BIGINT) AS kept
           |FROM r ORDER BY vec_id""".stripMargin,
      "t42_canonical" -> canonicalOracleSql(64, 16, 0.5),
      "t43_incr_sem_dedup" ->
        s"""WITH v AS (
           |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
           |), params AS (
           |  SELECT COUNT(*) * 4 // 5 AS split FROM v
           |), vi AS (
           |  SELECT v.vec_id, v.e FROM v, params WHERE vec_id < split
           |), vb AS (
           |  SELECT v.vec_id, v.e FROM v, params WHERE vec_id >= split
           |), ${lloydCtes("vi", 16)}, mi AS (
           |  SELECT vec_id, cid, e FROM (
           |    SELECT vi.vec_id, c.cid, vi.e,
           |      ROW_NUMBER() OVER (PARTITION BY vi.vec_id
           |        ORDER BY ${cosSql("vi.e", "c.ce")} DESC, c.cid) AS pr
           |    FROM vi, lc2 c) a
           |  WHERE pr = 1
           |), mb AS (
           |  SELECT vec_id, cid, e FROM (
           |    SELECT vb.vec_id, c.cid, vb.e,
           |      ROW_NUMBER() OVER (PARTITION BY vb.vec_id
           |        ORDER BY ${cosSql("vb.e", "c.ce")} DESC, c.cid) AS pr
           |    FROM vb, lc2 c) a
           |  WHERE pr = 1
           |), p AS (
           |  SELECT mb.vec_id AS batch_id, mi.vec_id AS idx_id,
           |    ${cosSql("mi.e", "mb.e")} AS cs
           |  FROM mi JOIN mb ON mi.cid = mb.cid
           |  WHERE ${cosSql("mi.e", "mb.e")} >= 0.3
           |), best AS (
           |  SELECT batch_id, MIN(idx_id) AS match_id FROM p GROUP BY batch_id
           |), j AS (
           |  SELECT b.batch_id, b.match_id, p.cs FROM best b
           |  JOIN p ON p.batch_id = b.batch_id AND p.idx_id = b.match_id
           |)
           |SELECT vb.vec_id AS batch_id,
           |  CASE WHEN j.match_id IS NOT NULL THEN 'dup' ELSE 'new' END AS status,
           |  j.match_id, j.cs AS cosine_sim
           |FROM vb LEFT JOIN j ON vb.vec_id = j.batch_id
           |ORDER BY batch_id""".stripMargin,
      "t25_kmv_sketch" ->
        s"""WITH toks AS (
           |  SELECT string_split_regex(trim(text), '\\s+') AS ts FROM documents
           |), g AS (
           |  SELECT unnest(CASE WHEN len(ts) < 3 THEN CAST([] AS VARCHAR[])
           |    ELSE list_transform(range(1, len(ts) - 1), i ->
           |      ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1] || ' ' || ts[CAST(i AS INT)+2])
           |    END) AS tk
           |  FROM toks
           |), h AS (
           |  SELECT DISTINCT (${polyHashSql("tk")} * 2654435761 + 123456789)
           |    % 4294967296 AS h
           |  FROM g
           |), kmin AS (
           |  SELECT h FROM h ORDER BY h LIMIT 200
           |), agg AS (
           |  SELECT COUNT(*) AS n_kept, MAX(h) AS kth_min FROM kmin
           |)
           |SELECT CAST(200 AS BIGINT) AS k, n_kept, kth_min,
           |  CASE WHEN n_kept < 200 THEN n_kept
           |       ELSE (199 * 4294967296) // GREATEST(kth_min, 1) END AS est_distinct,
           |  (SELECT COUNT(*) FROM h) AS exact_distinct
           |FROM agg""".stripMargin,
      "t16_ann_ivf_topk" -> ivfOracleSql(minNlist = 16, nprobe = 2, k = 3),
      "t06_dedup_minhash" -> minhashOracleSql(64, 16, 0.5),
      "t07_dedup_simhash" -> simhashOracleSql(3, 0.5),
      "t09_ann_lsh_topk" ->
        """WITH v AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |), params AS (
          |  SELECT COUNT(*) AS n FROM v
          |), pl AS (
          |  SELECT CASE WHEN n <= 7680 THEN 8 WHEN n <= 15360 THEN 9 WHEN n <= 30720 THEN 10 WHEN n <= 61440 THEN 11 WHEN n <= 122880 THEN 12 WHEN n <= 245760 THEN 13 WHEN n <= 491520 THEN 14 WHEN n <= 983040 THEN 15 WHEN n <= 1966080 THEN 16 WHEN n <= 3932160 THEN 17 WHEN n <= 7864320 THEN 18 WHEN n <= 15728640 THEN 19 WHEN n <= 31457280 THEN 20 WHEN n <= 62914560 THEN 21 WHEN n <= 125829120 THEN 22 WHEN n <= 251658240 THEN 23 ELSE 24 END AS planes FROM params
          |), proj AS (
          |  SELECT vec_id, p,
          |    list_reduce(list_transform(range(1, 65), i ->
          |      e[CAST(i AS INT)] *
          |      (CASE WHEN ((p * 1024 + i - 1) * 2654435761 + 123456789) % 4294967296
          |                 >= 2147483648
          |            THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)),
          |      (x, y) -> x + y) AS pr
          |  FROM v, pl, range(0, 24) t(p) WHERE t.p < pl.planes
          |), bkt AS (
          |  SELECT vec_id,
          |    CAST(SUM(CASE WHEN pr >= 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
          |  FROM proj GROUP BY vec_id
          |), v2 AS (
          |  SELECT v.vec_id, v.e, bkt.bucket FROM v JOIN bkt USING (vec_id)
          |), p2 AS (
          |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
          |    list_reduce(list_transform(range(1, 65), i ->
          |      a.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y) /
          |    (sqrt(list_reduce(list_transform(range(1, 65), i ->
          |      a.e[CAST(i AS INT)] * a.e[CAST(i AS INT)]), (x, y) -> x + y)) *
          |     sqrt(list_reduce(list_transform(range(1, 65), i ->
          |      b.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y)))
          |    AS cosine_sim
          |  FROM v2 a JOIN v2 b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
          |), r AS (
          |  SELECT vec_id, neighbor_id, cosine_sim,
          |    ROW_NUMBER() OVER (PARTITION BY vec_id
          |                       ORDER BY cosine_sim DESC, neighbor_id) AS rank
          |  FROM p2
          |)
          |SELECT vec_id, rank, neighbor_id, cosine_sim FROM r
          |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin,
      "t08_ann_brute_topk" ->
        """WITH v AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |), p AS (
          |  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
          |    list_reduce(list_transform(range(1, 65), i ->
          |      a.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y) /
          |    (sqrt(list_reduce(list_transform(range(1, 65), i ->
          |      a.e[CAST(i AS INT)] * a.e[CAST(i AS INT)]), (x, y) -> x + y)) *
          |     sqrt(list_reduce(list_transform(range(1, 65), i ->
          |      b.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y)))
          |    AS cosine_sim
          |  FROM v a JOIN v b ON a.vec_id <> b.vec_id
          |), r AS (
          |  SELECT vec_id, neighbor_id, cosine_sim,
          |    ROW_NUMBER() OVER (PARTITION BY vec_id
          |                       ORDER BY cosine_sim DESC, neighbor_id) AS rank
          |  FROM p
          |)
          |SELECT vec_id, rank, neighbor_id, cosine_sim FROM r
          |WHERE rank <= 3 ORDER BY vec_id, rank""".stripMargin,
      "t10_emb_near_dup" ->
        """WITH v AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |)
          |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |  list_reduce(list_transform(range(1, 65), i ->
          |    a.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y) /
          |  (sqrt(list_reduce(list_transform(range(1, 65), i ->
          |    a.e[CAST(i AS INT)] * a.e[CAST(i AS INT)]), (x, y) -> x + y)) *
          |   sqrt(list_reduce(list_transform(range(1, 65), i ->
          |    b.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y)))
          |  AS cosine_sim
          |FROM v a JOIN v b ON a.vec_id < b.vec_id
          |WHERE list_reduce(list_transform(range(1, 65), i ->
          |    a.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y) /
          |  (sqrt(list_reduce(list_transform(range(1, 65), i ->
          |    a.e[CAST(i AS INT)] * a.e[CAST(i AS INT)]), (x, y) -> x + y)) *
          |   sqrt(list_reduce(list_transform(range(1, 65), i ->
          |    b.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y))) >= 0.5
          |ORDER BY id_a, id_b""".stripMargin,
      "t13_emb_near_dup_lsh" ->
        """WITH v AS (
          |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
          |), params AS (
          |  SELECT COUNT(*) AS n FROM v
          |), pl AS (
          |  SELECT CASE WHEN n <= 7680 THEN 8 WHEN n <= 15360 THEN 9 WHEN n <= 30720 THEN 10 WHEN n <= 61440 THEN 11 WHEN n <= 122880 THEN 12 WHEN n <= 245760 THEN 13 WHEN n <= 491520 THEN 14 WHEN n <= 983040 THEN 15 WHEN n <= 1966080 THEN 16 WHEN n <= 3932160 THEN 17 WHEN n <= 7864320 THEN 18 WHEN n <= 15728640 THEN 19 WHEN n <= 31457280 THEN 20 WHEN n <= 62914560 THEN 21 WHEN n <= 125829120 THEN 22 WHEN n <= 251658240 THEN 23 ELSE 24 END AS planes FROM params
          |), proj AS (
          |  SELECT vec_id, p,
          |    list_reduce(list_transform(range(1, 65), i ->
          |      e[CAST(i AS INT)] *
          |      (CASE WHEN ((p * 1024 + i - 1) * 2654435761 + 123456789) % 4294967296
          |                 >= 2147483648
          |            THEN CAST(1.0 AS DOUBLE) ELSE CAST(-1.0 AS DOUBLE) END)),
          |      (x, y) -> x + y) AS pr
          |  FROM v, pl, range(0, 24) t(p) WHERE t.p < pl.planes
          |), bkt AS (
          |  SELECT vec_id,
          |    CAST(SUM(CASE WHEN pr >= 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
          |  FROM proj GROUP BY vec_id
          |), v2 AS (
          |  SELECT v.vec_id, v.e, bkt.bucket FROM v JOIN bkt USING (vec_id)
          |), p2 AS (
          |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
          |    list_reduce(list_transform(range(1, 65), i ->
          |      a.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y) /
          |    (sqrt(list_reduce(list_transform(range(1, 65), i ->
          |      a.e[CAST(i AS INT)] * a.e[CAST(i AS INT)]), (x, y) -> x + y)) *
          |     sqrt(list_reduce(list_transform(range(1, 65), i ->
          |      b.e[CAST(i AS INT)] * b.e[CAST(i AS INT)]), (x, y) -> x + y)))
          |    AS cosine_sim
          |  FROM v2 a JOIN v2 b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
          |)
          |SELECT id_a, id_b, cosine_sim FROM p2
          |WHERE cosine_sim >= 0.3 ORDER BY id_a, id_b""".stripMargin,
      "t11_multimodal_meta" ->
        """SELECT doc_id, 'text/plain' AS media_type,
          |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
          |  CAST(16 + (unicode(substr(text, 1, 1)) & 63) AS BIGINT) AS width,
          |  CAST(16 + (unicode(substr(text, length(text), 1)) & 63) AS BIGINT) AS height
          |FROM documents ORDER BY doc_id""".stripMargin,
      "t12_events_json" ->
        """SELECT event_type, COUNT(*) AS n_events,
          |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
          |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
          |    / CAST(COUNT(*) AS DOUBLE) AS avg_k
          |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
      // t160: the SCD2 merge replayed branch-by-branch — closed rows,
      // still-open rows, hard-deleted rows, changed-version inserts
      // and new-key inserts union to the engine's snapshot relation;
      // scd_ids are md5(key || '|' || stamp) hex on both engines
      "t160_scd2_snapshot" ->
        """WITH src AS (
          |  SELECT o_orderkey AS id, o_orderstatus AS status,
          |    CAST(datediff('day', DATE '1970-01-01',
          |      CAST(o_orderdate AS DATE)) AS BIGINT) AS updated_at
          |  FROM orders
          |), b1 AS (
          |  SELECT * FROM src WHERE id % 4 <> 3
          |), b2 AS (
          |  SELECT id,
          |    CASE WHEN id % 5 = 0 THEN 'X' ELSE status END AS status,
          |    CASE WHEN id % 5 = 0 THEN updated_at + 30
          |         ELSE updated_at END AS updated_at
          |  FROM src WHERE id % 11 <> 7
          |), snap1 AS (
          |  SELECT id, status, updated_at,
          |    md5(CAST(id AS VARCHAR) || '|' || CAST(updated_at AS VARCHAR))
          |      AS dbt_scd_id,
          |    updated_at AS dbt_updated_at,
          |    updated_at AS dbt_valid_from,
          |    CAST(NULL AS BIGINT) AS dbt_valid_to
          |  FROM b1
          |), changed AS (
          |  SELECT b.id, b.status, b.updated_at
          |  FROM b2 b JOIN snap1 s ON b.id = s.id
          |  WHERE b.updated_at > s.dbt_updated_at
          |), newkeys AS (
          |  SELECT b.id, b.status, b.updated_at
          |  FROM b2 b LEFT JOIN snap1 s ON b.id = s.id WHERE s.id IS NULL
          |), inserts AS (
          |  SELECT id, status, updated_at,
          |    md5(CAST(id AS VARCHAR) || '|' || CAST(updated_at AS VARCHAR))
          |      AS dbt_scd_id,
          |    updated_at AS dbt_updated_at,
          |    updated_at AS dbt_valid_from,
          |    CAST(NULL AS BIGINT) AS dbt_valid_to
          |  FROM (SELECT * FROM changed UNION ALL SELECT * FROM newkeys)
          |), closed AS (
          |  SELECT s.id, s.status, s.updated_at, s.dbt_scd_id,
          |    s.dbt_updated_at, s.dbt_valid_from,
          |    c.updated_at AS dbt_valid_to
          |  FROM snap1 s JOIN changed c ON s.id = c.id
          |), stillopen AS (
          |  SELECT s.* FROM snap1 s
          |  LEFT JOIN changed c ON s.id = c.id WHERE c.id IS NULL
          |), live AS (
          |  SELECT so.* FROM stillopen so
          |  WHERE EXISTS (SELECT 1 FROM b2 b WHERE b.id = so.id)
          |), gone AS (
          |  SELECT so.id, so.status, so.updated_at, so.dbt_scd_id,
          |    so.dbt_updated_at, so.dbt_valid_from,
          |    CAST(30000 AS BIGINT) AS dbt_valid_to
          |  FROM stillopen so
          |  WHERE NOT EXISTS (SELECT 1 FROM b2 b WHERE b.id = so.id)
          |)
          |SELECT * FROM closed
          |UNION ALL SELECT * FROM live
          |UNION ALL SELECT * FROM gone
          |UNION ALL SELECT * FROM inserts
          |ORDER BY id, dbt_valid_from""".stripMargin,
      // t162: the t143 store's band rows re-derived (same sig + band
      // key CTEs), bucketized at bkey % 64, collapsed to the one-row
      // gauge; short docs are excluded the way the engine's index
      // build excludes them (len(ts) >= 3); the one-shot store has
      // zero duplicate rows, so dup_ppm replays exactly as 0
      "t162_band_stats" ->
        s"""WITH ${minhashCtes(64, 16, 0.5)}, rws AS (
           |  SELECT b.doc_id, b.band, b.bkey, b.bkey % 64 AS bb
           |  FROM bandkey b JOIN toks t ON b.doc_id = t.doc_id
           |  WHERE b.doc_id % 10 = 0 AND len(t.ts) >= 3
           |), pb AS (
           |  SELECT bb, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM rws GROUP BY 1
           |), dct AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct
           |  FROM (SELECT DISTINCT doc_id, band, bkey FROM rws)
           |), a AS (
           |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
           |    CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
           |    CAST(MAX(cnt) AS BIGINT) AS max_bucket
           |  FROM pb
           |)
           |SELECT CAST(64 AS BIGINT) AS buckets, n_buckets_used,
           |  n_rows, n_distinct, max_bucket,
           |  (max_bucket * 1000000) // GREATEST(n_rows, 1)
           |    AS max_share_ppm,
           |  (max_bucket * 64 * 1000000) // GREATEST(n_rows, 1)
           |    AS skew_x1e6,
           |  ((n_rows - n_distinct) * 1000000) // GREATEST(n_rows, 1)
           |    AS dup_ppm
           |FROM a, dct""".stripMargin,
      // t169: eligibility = NOT a near-dup pair endpoint (the same
      // pairs CTE the component memo builds from); Hamilton quotas in
      // exact BIGINT over the eligible population; both epoch ranks
      // replay the shared id mix with epoch salts 1·2654435761 and
      // 2·2654435761 — every floor/xor is the engine's own arithmetic
      "t169_holdout_refresh" ->
        s"""WITH ${minhashCtes(64, 16, 0.5)}, members AS (
           |  SELECT DISTINCT id_a AS doc_id FROM pairs
           |  UNION SELECT DISTINCT id_b AS doc_id FROM pairs
           |), elig AS (
           |  -- NULL sources leave the population HERE, matching the
           |  -- Spark side's eligibility filter: DuckDB's GROUP BY
           |  -- keeps a NULL group, so without this the Hamilton
           |  -- totals (n, leftover) would be computed over a
           |  -- population the engine never allocates from
           |  SELECT d.doc_id, d.source FROM documents d
           |  WHERE d.source IS NOT NULL AND NOT EXISTS (
           |    SELECT 1 FROM members m WHERE m.doc_id = d.doc_id)
           |), hist AS (
           |  SELECT source, COUNT(*) AS n_eligible FROM elig GROUP BY 1
           |), tot AS (
           |  SELECT SUM(n_eligible) AS n FROM hist
           |), a0 AS (
           |  SELECT source, n_eligible,
           |    (n_eligible * 200) // n AS base,
           |    (n_eligible * 200) % n AS rem,
           |    200 - SUM((n_eligible * 200) // n) OVER () AS leftover,
           |    ROW_NUMBER() OVER (ORDER BY (n_eligible * 200) % n DESC,
           |      source) AS seat_rank
           |  FROM hist CROSS JOIN tot
           |), alloc AS (
           |  SELECT source, n_eligible,
           |    base + CASE WHEN seat_rank <= leftover THEN 1 ELSE 0 END
           |      AS alloc
           |  FROM a0
           |), rk AS (
           |  SELECT doc_id, source,
           |    ROW_NUMBER() OVER (PARTITION BY source
           |      ORDER BY ${idMixSql("xor(doc_id, 2654435761)")}, doc_id)
           |      AS rank_prev,
           |    ROW_NUMBER() OVER (PARTITION BY source
           |      ORDER BY ${idMixSql("xor(doc_id, 5308871522)")}, doc_id)
           |      AS rank_new
           |  FROM elig
           |)
           |SELECT r.doc_id, r.source,
           |  CASE WHEN rank_prev <= alloc AND rank_new <= alloc
           |         THEN 'held'
           |       WHEN rank_new <= alloc THEN 'admitted'
           |       ELSE 'evicted' END AS status,
           |  CASE WHEN rank_new <= alloc
           |       THEN CAST(rank_new AS BIGINT) END AS rank_new,
           |  CAST(alloc AS BIGINT) AS alloc,
           |  CAST(n_eligible AS BIGINT) AS n_eligible
           |FROM rk r JOIN alloc a USING (source)
           |WHERE rank_prev <= alloc OR rank_new <= alloc
           |ORDER BY r.doc_id""".stripMargin,
      // t168: the t162 replay restricted to the stride-4 bucket
      // lattice (bb % 4 = 0 — 16 of 64 buckets), then the sampled
      // gauge's exact lower bounds and stride-scaled estimators;
      // every floor is a single integer division both engines replay
      "t168_band_stats_sampled" ->
        s"""WITH ${minhashCtes(64, 16, 0.5)}, rws AS (
           |  SELECT b.doc_id, b.band, b.bkey, b.bkey % 64 AS bb
           |  FROM bandkey b JOIN toks t ON b.doc_id = t.doc_id
           |  WHERE b.doc_id % 10 = 0 AND len(t.ts) >= 3
           |), sampled AS (
           |  SELECT * FROM rws WHERE bb % 4 = 0
           |), pb AS (
           |  SELECT bb, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM sampled GROUP BY 1
           |), dct AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_sampled
           |  FROM (SELECT DISTINCT doc_id, band, bkey FROM sampled)
           |), a AS (
           |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows_sampled,
           |    CAST(COUNT(*) AS BIGINT) AS n_buckets_sampled,
           |    CAST(MAX(cnt) AS BIGINT) AS max_bucket_lb
           |  FROM pb
           |)
           |SELECT CAST(64 AS BIGINT) AS buckets,
           |  CAST(4 AS BIGINT) AS stride,
           |  n_buckets_sampled, n_rows_sampled, n_distinct_sampled,
           |  max_bucket_lb,
           |  (n_rows_sampled * 64) // 16 AS est_rows,
           |  (max_bucket_lb * 64 * 1000000)
           |    // GREATEST((n_rows_sampled * 64) // 16, 1)
           |    AS est_skew_x1e6,
           |  n_rows_sampled - n_distinct_sampled AS dup_rows_lb,
           |  ((n_rows_sampled - n_distinct_sampled) * 1000000)
           |    // GREATEST(n_rows_sampled, 1) AS est_dup_ppm
           |FROM a, dct""".stripMargin,
      // t161: the line rules counted directly on the rendered lines —
      // counting before or after the newline join is the same count,
      // which is the point of line-FRACTION rules; prefixes/suffixes
      // replay the engine's rendering arithmetic exactly
      "t161_gopher_lines" ->
        """WITH lines AS (
          |  SELECT doc_id // 5 AS gid,
          |    (CASE WHEN doc_id % 7 <> 0 THEN '- ' ELSE '' END) || text ||
          |    (CASE WHEN doc_id % 4 = 0 THEN '...' ELSE '' END) AS line
          |  FROM documents
          |), g AS (
          |  SELECT gid, CAST(COUNT(*) AS BIGINT) AS n_lines,
          |    CAST(SUM(CASE WHEN line LIKE '- %' OR line LIKE '* %'
          |      OR line LIKE '• %' THEN 1 ELSE 0 END) AS BIGINT)
          |      AS bullet_lines,
          |    CAST(SUM(CASE WHEN line LIKE '%...' OR line LIKE '%…'
          |      THEN 1 ELSE 0 END) AS BIGINT) AS ellipsis_lines
          |  FROM lines GROUP BY 1
          |)
          |SELECT gid, n_lines, bullet_lines, ellipsis_lines,
          |  (bullet_lines * 1000000) // GREATEST(n_lines, 1)
          |    AS bullet_ppm,
          |  (ellipsis_lines * 1000000) // GREATEST(n_lines, 1)
          |    AS ellipsis_ppm,
          |  bullet_lines * 10 <= n_lines * 9 AS ok_bullet,
          |  ellipsis_lines * 10 <= n_lines * 3 AS ok_ellipsis,
          |  (bullet_lines * 10 <= n_lines * 9)
          |    AND (ellipsis_lines * 10 <= n_lines * 3) AS keep
          |FROM g ORDER BY gid""".stripMargin,
      // t171: the t167 replay restricted to the stride-4 bucket
      // lattice, then the sampled gauge's exact lower bounds and
      // stride-scaled estimators (one-shot store → dup mass 0)
      "t171_invidx_stats_sampled" -> {
        val fnv = "list_reduce(list_prepend(" +
          "CAST(14695981039346656037 AS HUGEINT), " +
          "list_transform(string_split(term, ''), " +
          "ch -> CAST(unicode(ch) AS HUGEINT))), " +
          "(h, b) -> (CAST(xor(CAST(h AS UBIGINT), CAST(b AS UBIGINT)) " +
          "AS HUGEINT) * 1099511628211) % 18446744073709551616)"
        s"""WITH p AS (
           |  SELECT term, doc_id FROM (
           |    SELECT doc_id,
           |      unnest(${graft.functions.TextFunctions.Sql.tokens("text")})
           |        AS term
           |    FROM documents)
           |  GROUP BY term, doc_id
           |), bk AS (
           |  SELECT term, doc_id, CAST($fnv % 64 AS BIGINT) AS bucket
           |  FROM p
           |), sampled AS (
           |  SELECT * FROM bk WHERE bucket % 4 = 0
           |), pb AS (
           |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM sampled GROUP BY 1
           |), dct AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_sampled
           |  FROM (SELECT DISTINCT term, doc_id FROM sampled)
           |), a AS (
           |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows_sampled,
           |    CAST(COUNT(*) AS BIGINT) AS n_buckets_sampled,
           |    CAST(MAX(cnt) AS BIGINT) AS max_bucket_lb
           |  FROM pb
           |)
           |SELECT CAST(64 AS BIGINT) AS buckets,
           |  CAST(4 AS BIGINT) AS stride,
           |  n_buckets_sampled, n_rows_sampled, n_distinct_sampled,
           |  max_bucket_lb,
           |  (n_rows_sampled * 64) // 16 AS est_rows,
           |  (max_bucket_lb * 64 * 1000000)
           |    // GREATEST((n_rows_sampled * 64) // 16, 1)
           |    AS est_skew_x1e6,
           |  n_rows_sampled - n_distinct_sampled AS dup_rows_lb,
           |  ((n_rows_sampled - n_distinct_sampled) * 1000000)
           |    // GREATEST(n_rows_sampled, 1) AS est_dup_ppm
           |FROM a, dct""".stripMargin
      },
      // t167: per-(term, doc) postings re-derived, bucketed by the
      // FNV-1a fold replayed in HUGEINT mod-2^64 steps (signed-long
      // bucket == unsigned residue % 64 because 2^64 ≡ 0 mod 64);
      // one-shot store → dup_ppm replays 0
      "t167_invidx_stats" -> {
        val fnv = "list_reduce(list_prepend(" +
          "CAST(14695981039346656037 AS HUGEINT), " +
          "list_transform(string_split(term, ''), " +
          "ch -> CAST(unicode(ch) AS HUGEINT))), " +
          "(h, b) -> (CAST(xor(CAST(h AS UBIGINT), CAST(b AS UBIGINT)) " +
          "AS HUGEINT) * 1099511628211) % 18446744073709551616)"
        s"""WITH p AS (
           |  SELECT term, doc_id FROM (
           |    SELECT doc_id,
           |      unnest(${graft.functions.TextFunctions.Sql.tokens("text")})
           |        AS term
           |    FROM documents)
           |  GROUP BY term, doc_id
           |), bk AS (
           |  SELECT term, doc_id, CAST($fnv % 64 AS BIGINT) AS bucket
           |  FROM p
           |), pb AS (
           |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM bk GROUP BY 1
           |), a AS (
           |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
           |    CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
           |    CAST(MAX(cnt) AS BIGINT) AS max_bucket
           |  FROM pb
           |)
           |SELECT CAST(64 AS BIGINT) AS buckets, n_buckets_used,
           |  n_rows, n_rows AS n_distinct, max_bucket,
           |  (max_bucket * 1000000) // GREATEST(n_rows, 1)
           |    AS max_share_ppm,
           |  (max_bucket * 64 * 1000000) // GREATEST(n_rows, 1)
           |    AS skew_x1e6,
           |  CAST(0 AS BIGINT) AS dup_ppm
           |FROM a""".stripMargin
      },
      // t165: the t113 winnow replay restated as the store gauge —
      // the one-shot store's fps are the distinct selected
      // fingerprints, so n_distinct == n_rows and dup_ppm replays 0
      "t165_winnow_stats" ->
        s"""WITH ${winnowCtes(4)}, wfp AS (
           |  SELECT DISTINCT s.fp AS fp FROM wsel WHERE doc_id % 10 = 0
           |), rws AS (
           |  SELECT fp, fp % 64 AS fpb FROM wfp
           |), pb AS (
           |  SELECT fpb, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM rws GROUP BY 1
           |), a AS (
           |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
           |    CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
           |    CAST(MAX(cnt) AS BIGINT) AS max_bucket
           |  FROM pb
           |)
           |SELECT CAST(64 AS BIGINT) AS buckets, n_buckets_used,
           |  n_rows, n_rows AS n_distinct, max_bucket,
           |  (max_bucket * 1000000) // GREATEST(n_rows, 1)
           |    AS max_share_ppm,
           |  (max_bucket * 64 * 1000000) // GREATEST(n_rows, 1)
           |    AS skew_x1e6,
           |  CAST(0 AS BIGINT) AS dup_ppm
           |FROM a""".stripMargin,
      // t170: the t165 replay restricted to the stride-4 bucket
      // lattice, then the sampled gauge's exact lower bounds and
      // stride-scaled estimators (one-shot store → dup mass 0)
      "t170_winnow_stats_sampled" ->
        s"""WITH ${winnowCtes(4)}, wfp AS (
           |  SELECT DISTINCT s.fp AS fp FROM wsel WHERE doc_id % 10 = 0
           |), sampled AS (
           |  SELECT fp, fp % 64 AS fpb FROM wfp WHERE (fp % 64) % 4 = 0
           |), pb AS (
           |  SELECT fpb, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM sampled GROUP BY 1
           |), dct AS (
           |  SELECT CAST(COUNT(DISTINCT fp) AS BIGINT)
           |    AS n_distinct_sampled
           |  FROM sampled
           |), a AS (
           |  SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows_sampled,
           |    CAST(COUNT(*) AS BIGINT) AS n_buckets_sampled,
           |    CAST(MAX(cnt) AS BIGINT) AS max_bucket_lb
           |  FROM pb
           |)
           |SELECT CAST(64 AS BIGINT) AS buckets,
           |  CAST(4 AS BIGINT) AS stride,
           |  n_buckets_sampled, n_rows_sampled, n_distinct_sampled,
           |  max_bucket_lb,
           |  (n_rows_sampled * 64) // 16 AS est_rows,
           |  (max_bucket_lb * 64 * 1000000)
           |    // GREATEST((n_rows_sampled * 64) // 16, 1)
           |    AS est_skew_x1e6,
           |  n_rows_sampled - n_distinct_sampled AS dup_rows_lb,
           |  ((n_rows_sampled - n_distinct_sampled) * 1000000)
           |    // GREATEST(n_rows_sampled, 1) AS est_dup_ppm
           |FROM a, dct""".stripMargin,
      // t166: the t148 build+ingest replayed per part (each batch's
      // DISTINCT bottom-k appends), collapsed to the store gauge —
      // duplicate mass is exactly the hashes in BOTH parts' bottom-k
      "t166_kmv_stats" ->
        s"""WITH toks AS (
           |  SELECT doc_id, source,
           |    string_split_regex(trim(text), '\\s+') AS ts
           |  FROM documents
           |), g AS (
           |  SELECT doc_id % 3 = 0 AS part, source AS grp,
           |    unnest(CASE WHEN len(ts) < 3 THEN CAST([] AS VARCHAR[])
           |    ELSE list_transform(range(1, len(ts) - 1), i ->
           |      ts[CAST(i AS INT)] || ' ' || ts[CAST(i AS INT)+1]
           |        || ' ' || ts[CAST(i AS INT)+2])
           |    END) AS tk
           |  FROM toks
           |), hh AS (
           |  SELECT DISTINCT part, grp,
           |    (${polyHashSql("tk")} * 2654435761 + 123456789)
           |      % 4294967296 AS h
           |  FROM g
           |), sk AS (
           |  SELECT part, grp, h FROM (
           |    SELECT part, grp, h,
           |      ROW_NUMBER() OVER (PARTITION BY part, grp ORDER BY h)
           |        AS rn
           |    FROM hh)
           |  WHERE rn <= 64
           |), gd AS (
           |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_g,
           |    CAST(COUNT(DISTINCT h) AS BIGINT) AS nd_g
           |  FROM sk GROUP BY 1
           |)
           |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
           |  CAST(SUM(n_g) AS BIGINT) AS n_rows,
           |  CAST(SUM(nd_g) AS BIGINT) AS n_distinct,
           |  CAST(SUM(CASE WHEN nd_g < 64 THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_exact_groups,
           |  CAST(SUM(CASE WHEN nd_g < 64 THEN 0 ELSE 1 END) AS BIGINT)
           |    AS n_estimated_groups,
           |  (CAST(SUM(n_g) - SUM(nd_g) AS BIGINT) * 1000000)
           |    // GREATEST(CAST(SUM(n_g) AS BIGINT), 1) AS dup_ppm,
           |  (CAST(SUM(n_g) - SUM(LEAST(nd_g, 64)) AS BIGINT) * 1000000)
           |    // GREATEST(CAST(SUM(n_g) AS BIGINT), 1) AS reclaim_ppm
           |FROM gd""".stripMargin,
      // t164: the KS distance replayed at the union of jump points —
      // the one-shot full-corpus histogram IS the fit+ingest store
      // (histograms add), so the gate needs no store replay
      "t164_quantile_drift" ->
        """WITH ref0 AS (
          |  SELECT CAST(n_chars AS BIGINT) AS score,
          |    CAST(COUNT(*) AS BIGINT) AS rc
          |  FROM documents GROUP BY 1
          |), cur0 AS (
          |  SELECT CAST(n_chars + doc_id % 7 AS BIGINT) AS score,
          |    CAST(COUNT(*) AS BIGINT) AS cc
          |  FROM documents GROUP BY 1
          |), m AS (
          |  SELECT COALESCE(r.score, c.score) AS score,
          |    COALESCE(rc, 0) AS rc, COALESCE(cc, 0) AS cc
          |  FROM ref0 r FULL OUTER JOIN cur0 c ON r.score = c.score
          |), cum AS (
          |  SELECT score,
          |    SUM(rc) OVER w AS crf, SUM(cc) OVER w AS ccf
          |  FROM m
          |  WINDOW w AS (ORDER BY score
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |), t AS (
          |  SELECT CAST(SUM(rc) AS BIGINT) AS n_ref,
          |    CAST(SUM(cc) AS BIGINT) AS n_cur,
          |    CAST(COUNT(*) AS BIGINT) AS n_scores
          |  FROM m
          |)
          |SELECT n_ref, n_cur, n_scores,
          |  (SELECT CAST(MAX(ABS((crf * 1000000) // GREATEST(t.n_ref, 1)
          |     - (ccf * 1000000) // GREATEST(t.n_cur, 1))) AS BIGINT)
          |   FROM cum) AS ks_ppm
          |FROM t""".stripMargin,
      // t172: t164's KS replay split by source — every batch source
      // gets ALL reference jump points (cross join, then union +
      // re-group, the engine's merge), its own CDF pair, and one MAX;
      // every floor is the same single integer division
      "t172_source_quality_drift" ->
        """WITH ref0 AS (
          |  SELECT CAST(n_chars AS BIGINT) AS score,
          |    CAST(COUNT(*) AS BIGINT) AS rc
          |  FROM documents GROUP BY 1
          |), cur0 AS (
          |  SELECT source, CAST(n_chars + doc_id % 7 AS BIGINT) AS score,
          |    CAST(COUNT(*) AS BIGINT) AS cc
          |  FROM documents GROUP BY 1, 2
          |), srcs AS (
          |  SELECT DISTINCT source FROM cur0
          |), m AS (
          |  SELECT source, score,
          |    CAST(SUM(rc) AS BIGINT) AS rc, CAST(SUM(cc) AS BIGINT) AS cc
          |  FROM (
          |    SELECT s.source, r.score, r.rc, 0 AS cc
          |    FROM srcs s CROSS JOIN ref0 r
          |    UNION ALL
          |    SELECT source, score, 0 AS rc, cc FROM cur0
          |  ) GROUP BY 1, 2
          |), cum AS (
          |  SELECT source, score,
          |    SUM(rc) OVER w AS crf, SUM(cc) OVER w AS ccf
          |  FROM m
          |  WINDOW w AS (PARTITION BY source ORDER BY score
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          |), t AS (
          |  SELECT source, CAST(SUM(rc) AS BIGINT) AS n_ref,
          |    CAST(SUM(cc) AS BIGINT) AS n_cur,
          |    CAST(COUNT(*) AS BIGINT) AS n_scores
          |  FROM m GROUP BY 1
          |)
          |SELECT t.source, n_ref, n_cur, n_scores,
          |  CAST(MAX(ABS((crf * 1000000) // GREATEST(n_ref, 1)
          |    - (ccf * 1000000) // GREATEST(n_cur, 1))) AS BIGINT)
          |    AS ks_ppm
          |FROM cum c JOIN t ON c.source IS NOT DISTINCT FROM t.source
          |GROUP BY 1, 2, 3, 4""".stripMargin,
      // t173: the line census replays over the SAME (gid, rank, line)
      // relation the page render produces — doc lines ranked by
      // doc_id within the page, the constant footer last (its rank
      // only orders; the footer is always stripped) — then the same
      // distinct-doc census, the same < 2 verdict, and the kept text
      // re-agg'd in rank order
      "t173_line_boilerplate" ->
        """WITH lines AS (
          |  SELECT doc_id // 5 AS gid, CAST(doc_id % 5 AS BIGINT) AS pos,
          |    text AS line, lower(trim(text)) AS norm
          |  FROM documents
          |  UNION ALL
          |  SELECT DISTINCT doc_id // 5, CAST(2147483647 AS BIGINT),
          |    '(c) corpus footer', '(c) corpus footer'
          |  FROM documents
          |), census AS (
          |  SELECT norm, CAST(COUNT(DISTINCT gid) AS BIGINT) AS line_docs
          |  FROM lines GROUP BY 1
          |), f AS (
          |  SELECT l.gid, l.pos, l.line, c.line_docs < 2 AS keep
          |  FROM lines l JOIN census c USING (norm)
          |), g AS (
          |  SELECT gid, CAST(COUNT(*) AS BIGINT) AS n_lines,
          |    CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
          |      AS n_kept,
          |    COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10)
          |      ORDER BY pos), '') AS kept_text
          |  FROM f GROUP BY 1
          |)
          |SELECT gid, n_lines, n_kept, kept_text,
          |  ((n_lines - n_kept) * 1000000) // GREATEST(n_lines, 1)
          |    AS stripped_ppm
          |FROM g""".stripMargin,
      // t163: the 2-D water-filling replayed in exact integer
      // arithmetic — stopword-ppm bins, bin-descending cumulative
      // token mass per source, budget = src_tokens // ((srcN % 4)+2),
      // taken = clamp(budget − mass_above, 0, cell)
      "t163_mixture_budget" ->
        s"""WITH pd AS (
           |  SELECT source,
           |    GREATEST(${T.nTokens("text")}, 1) AS nt,
           |    ${T.dictHits("text", TextFunctions.Stopwords)} AS hits
           |  FROM documents
           |), pb AS (
           |  SELECT source, nt,
           |    LEAST(9, ((hits * 1000000) // nt) // 100000) AS bin
           |  FROM pd
           |), cells AS (
           |  SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |    CAST(SUM(nt) AS BIGINT) AS cell_tokens
           |  FROM pb GROUP BY 1, 2
           |), bud AS (
           |  SELECT source, CAST(SUM(cell_tokens) AS BIGINT) AS src_tokens,
           |    CAST(SUM(cell_tokens) AS BIGINT)
           |      // (CAST(SUBSTR(source, 4) AS BIGINT) % 4 + 2) AS budget
           |  FROM cells GROUP BY 1
           |), lad AS (
           |  SELECT c.source, bin, n_docs, cell_tokens,
           |    CAST(SUM(cell_tokens) OVER (PARTITION BY c.source
           |      ORDER BY bin DESC
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |      AS BIGINT) AS cum_tokens,
           |    src_tokens, budget
           |  FROM cells c JOIN bud b ON c.source = b.source
           |), t AS (
           |  SELECT source, bin, n_docs, cell_tokens, cum_tokens,
           |    src_tokens, budget,
           |    GREATEST(0, LEAST(cell_tokens,
           |      budget - (cum_tokens - cell_tokens))) AS taken_tokens
           |  FROM lad
           |)
           |SELECT source, bin, n_docs, cell_tokens, cum_tokens,
           |  src_tokens, budget, taken_tokens,
           |  (taken_tokens * 1000000) // GREATEST(cell_tokens, 1)
           |    AS fill_ppm,
           |  CASE WHEN taken_tokens = cell_tokens THEN 'full'
           |       WHEN taken_tokens > 0 THEN 'partial'
           |       ELSE 'none' END AS status
           |FROM t ORDER BY source, bin DESC""".stripMargin,
    )
  }
}
