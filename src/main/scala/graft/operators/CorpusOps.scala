package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, TextFunctions}

/** Corpus-curation operators a large-scale training-data pipeline
  * needs beyond dedup/similarity (builder brief; no reference
  * counterpart — the reference delegates all data processing to the
  * warehouse): repetition metrics, PII scan/redaction, benchmark
  * decontamination, deterministic stratified sampling, and sequence
  * packing.
  *
  * Scale design rules shared with [[Dedup]]: per-row work stays inside
  * whole-stage codegen (built-in functions + native expressions, no
  * UDFs), shuffles carry 8-byte fingerprints or per-doc counters
  * rather than text, small reference sets are broadcast, and window
  * partitions are bounded (per-document or per-shard, never global).
  * Every operator has a DuckDB-dialect oracle rendering in
  * [[graft.queries.TrainingData]].
  */
object CorpusOps {

  // ---------------------------------------------------------------
  // Repetition / boilerplate metrics
  // ---------------------------------------------------------------

  /** Non-distinct word n-grams (n >= 2) as "a b ... n" strings; empty
    * array when the document has fewer than n tokens. Distinctness is
    * what [[Dedup.shingles]] provides; repetition/vocabulary scoring
    * needs the multiset — the native [[graft.functions.NGrams]]
    * expression in multiset mode (one fused codegen'd pass; the
    * lambda-chain form it replaced evaluated interpretively).
    * Callers must have called `GraftFunctions.register`.
    */
  private def multisetGrams(ts: Column, n: Int): Column =
    call_function("ngrams", ts, lit(n), lit(false))

  /** Per-document repetition metrics (the filters published for web
    * corpora — duplicate-word fraction and most-frequent-n-gram mass):
    *
    *   - `n_tokens`
    *   - `uniq_frac` — |distinct tokens| / |tokens|
    *   - `top_unigram_frac` — occurrences of the modal token / n_tokens
    *   - `top_bigram_frac` — occurrences of the modal bigram / total
    *     bigrams (0.0 when the doc has < 2 tokens)
    *
    * Plan shape: MAP-ONLY. Every metric is a pure function of one
    * row's token array, so the whole operator is a single codegen'd
    * pass ([[graft.functions.RepetitionStats]] — exact integer modal
    * and distinct counts, divided once at the end so the oracle
    * reproduces them bit-for-bit). The previous dataflow exploded
    * grams and shuffled the corpus's distinct-gram multiset twice
    * (plus two joins back) for the same answer — at 100 TB that was
    * a corpus shuffle for per-row work; PlanShapeSpec now asserts
    * this plan has no Exchange at all.
    */
  def repetitionMetrics(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("doc_id"),
        call_function("repetition_stats",
          TextFunctions.tokens(col(textCol))).as("st"))
      .select(col("doc_id"),
        col("st.n_tokens").as("n_tokens"),
        (col("st.n_distinct").cast("double") /
          col("st.n_tokens").cast("double")).as("uniq_frac"),
        (col("st.uni_mx").cast("double") /
          col("st.n_tokens").cast("double")).as("top_unigram_frac"),
        when(col("st.bi_tot") === 0L, lit(0.0))
          .otherwise(col("st.bi_mx").cast("double") /
            col("st.bi_tot").cast("double")).as("top_bigram_frac"))
  }

  // ---------------------------------------------------------------
  // PII scan / redaction
  // ---------------------------------------------------------------

  /** RE2-compatible patterns (no lookarounds) so the identical regexes
    * run in the DuckDB oracle and in Spark's codegen'd regexp_count /
    * regexp_replace.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhonePattern = "\\+?\\d[\\d -]{6,}\\d"

  /** Word-boundary alternation over a custom sensitive-term
    * dictionary. */
  def termPattern(terms: Seq[String]): String =
    terms.map(java.util.regex.Pattern.quote).mkString("\\b(?:", "|", ")\\b")

  /** Total PII matches (all categories) in a text column — the
    * redaction-volume metric a curation report tracks. Map-only.
    */
  def piiMatchCount(t: Column, terms: Seq[String]): Column = {
    val base = regexp_count(t, lit(EmailPattern)) +
      regexp_count(t, lit(Ipv4Pattern)) + regexp_count(t, lit(PhonePattern))
    (if (terms.isEmpty) base
     else base + regexp_count(t, lit(termPattern(terms)))).cast("long")
  }

  /** The redaction chain: emails → IPs → phones → dictionary terms,
    * each category replaced by its placeholder token. Map-only.
    */
  def redact(t: Column, terms: Seq[String]): Column = {
    val noPii = regexp_replace(
      regexp_replace(
        regexp_replace(t, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")
    if (terms.isEmpty) noPii
    else regexp_replace(noPii, termPattern(terms), "<TERM>")
  }

  /** Per-document PII scan + redaction: counts per category (emails,
    * IPv4 addresses, phone-shaped digit runs, custom dictionary
    * terms) and the fully redacted text. Map-only — four regex counts
    * and one replace chain per row, all inside whole-stage codegen;
    * embarrassingly parallel at any corpus size.
    *
    * Terms are quoted literally (dictionary entries are data, not
    * regex).
    */
  def piiScan(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String]): DataFrame = {
    val t = col(textCol)
    val tp = termPattern(terms)
    docs.select(col(idCol).as("doc_id"),
      regexp_count(t, lit(EmailPattern)).cast("long").as("n_emails"),
      regexp_count(t, lit(Ipv4Pattern)).cast("long").as("n_ipv4"),
      regexp_count(t, lit(PhonePattern)).cast("long").as("n_phones"),
      regexp_count(t, lit(tp)).cast("long").as("n_terms"),
      redact(t, terms).as("redacted"))
  }

  // ---------------------------------------------------------------
  // Benchmark decontamination
  // ---------------------------------------------------------------

  /** N-gram-overlap decontamination (the published training-set
    * hygiene step): flag every training document sharing at least one
    * word n-gram with a benchmark/eval set.
    *
    * Returns one row per training document: (doc_id, n_shingles,
    * n_hits, contaminated) where n_hits counts the doc's distinct
    * shingles that appear anywhere in the benchmark set.
    *
    * Scale design: the benchmark shingle set is distinct 64-bit
    * fingerprints of an eval corpus — thousands of docs, MBs — and is
    * **broadcast**, so the training side is a map-side semi-join over
    * the 100 TB corpus followed by one partial-aggregated count per
    * doc; no shuffle ever carries shingle strings.
    */
  /** Per-doc distinct shingle fingerprints: (doc_id, shingle). */
  private def shingleFps(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    GraftFunctions.register(df.sparkSession)
    // no ScanGuard here: the r15 guard on this site measured NEUTRAL
    // in six same-window A/B runs at sf0.1 (off/on within ±noise on
    // t19/t56/t83; the driver's independent r15 window read t83
    // SLOWER with it) — the shingle pass is cheap enough per row that
    // the extra full-text exchange cancels the parallelization at any
    // layout where the guard would fire, and at production layouts it
    // was the identity anyway. Contrast exactPhraseDecontaminate,
    // where per-row work is |probes|·contains() and the guard is a
    // measured 5×.
    df
      .select(col(idCol).as("doc_id"),
        explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(col("doc_id"), call_function("fnv64", col("g")).as("shingle"))
  }

  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val benchSet = shingleFps(bench, idCol, textCol, n).select("shingle").distinct()
    val hits = shingleFps(train, idCol, textCol, n)
      .join(broadcast(benchSet), "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    train
      .select(col(idCol).as("doc_id"),
        size(Dedup.shingles(col(textCol), n)).cast("long").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("contaminated", (col("n_hits") > 0).cast("long"))
  }

  /** Ids of training docs sharing at least one word n-gram with the
    * benchmark set — the drop-list form of [[decontaminate]] for use
    * inside a curation pipeline (anti-join the result out). Same plan
    * shape: broadcast bench fingerprints, map-side semi-join.
    */
  def contaminatedIds(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val benchSet = shingleFps(bench, idCol, textCol, n).select("shingle").distinct()
    shingleFps(train, idCol, textCol, n)
      .join(broadcast(benchSet), "shingle")
      .select(col("doc_id").as(idCol)).distinct()
  }

  /** BENCHMARK-SIDE contamination report — the eval-integrity audit
    * that answers, per held-out benchmark document: how much of it
    * leaked into the training corpus? [[decontaminate]] flags
    * TRAINING docs to drop; this reports the BENCHMARK's exposure —
    * the number the eval card publishes ("x% of benchmark n-grams
    * appear in the corpus") and the basis for deciding whether a
    * benchmark is still usable at all. Per bench doc: its distinct
    * n-gram count, how many of those grams appear anywhere in the
    * corpus, how many distinct corpus docs share ≥1 gram, and the
    * largest per-doc overlap. Zero-exposure bench docs surface with
    * zeros, never vanish.
    *
    * Scale shape: the benchmark's (doc, gram) relation is broadcast
    * (benchmarks are small by definition); the corpus side is one
    * shingle pass joined map-side against it, so the corpus never
    * shuffles on grams. The matched-pair relation — bounded by
    * |bench grams| × contaminating docs — is barriered on bench_id,
    * and both aggregations (pairwise shared counts, distinct leaked
    * grams) reuse that one exchange: hash partitioning on bench_id
    * satisfies both group-bys' clustering. All-BIGINT output.
    */
  def contaminationReport(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val bR = shingleFps(bench, idCol, textCol, n)
      .select(col("doc_id").as("bench_id"), col("shingle"))
    val pair = Dedup.barrier(
      shingleFps(train, idCol, textCol, n).join(broadcast(bR), "shingle"),
      col("bench_id"))
    val pairCounts = pair.groupBy("bench_id", "doc_id")
      .agg(count(lit(1)).as("shared"))
    val stats = pairCounts.groupBy("bench_id").agg(
      count(lit(1)).as("n_contam_docs"), max("shared").as("max_shared"))
    val hitGrams = pair.groupBy("bench_id")
      .agg(countDistinct(col("shingle")).as("n_hit_grams"))
    bench.select(col(idCol).as("bench_id"),
        size(Dedup.shingles(col(textCol), n)).cast("long").as("n_grams"))
      .join(stats, Seq("bench_id"), "left")
      .join(hitGrams, Seq("bench_id"), "left")
      .select(col("bench_id"), col("n_grams"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        coalesce(col("n_contam_docs"), lit(0L)).as("n_contam_docs"),
        coalesce(col("max_shared"), lit(0L)).as("max_shared"))
  }

  /** Bloom-filter parameters for [[bloomDecontaminate]]: filter size
    * in bits (2²⁰ → 16384 64-bit words = a 128 KB broadcast; sized so
    * the fixture's ~12k set bits give a per-shingle FP rate around
    * 1e-4 — small enough that doc-level flags stay meaningful, large
    * enough that the fixture still exhibits a few deterministic FPs
    * for the one-sidedness check) and the two probe LCGs over the
    * 31-bit shingle PolyHash (Knuth / xxhash-prime multipliers;
    * products stay < 2⁶³ because base < 2³¹).
    */
  val BloomBits = 1 << 20
  private val BloomProbe1 = (2654435761L, 123456789L)
  private val BloomProbe2 = (2246822519L, 3266489917L)

  /** Bloom-filter decontamination — the constant-memory scale path
    * for [[decontaminate]]: the benchmark's shingle set is folded
    * into a [[BloomBits]]-bit Bloom filter (2 probes per shingle,
    * bit_or into ≤ 16384 64-bit words), and each training shingle is
    * tested by two broadcast word-lookups. One-sided by
    * construction: NO false negatives (every truly shared shingle
    * hits — the Bloom invariant), a deterministic false-positive
    * rate from hash geometry (`exact_hit` rides along so the gate
    * and spec can see exactly which flags are FPs; with the fixture
    * load factor the FP rate is ~2%). Against [[decontaminate]]'s
    * broadcast shingle SET, the win is at 100 TB-scale benchmarks:
    * the broadcast is 128 KB of words regardless of benchmark size,
    * where the exact set grows with the benchmark vocabulary. All
    * arithmetic BIGINT (PolyHash + LCG probes, masks via shiftleft,
    * membership via `word & mask`, never a shift of the
    * possibly-negative word), so the DuckDB oracle replays filter
    * bits, probes, and every flag exactly.
    *
    * Plan shape: filter build is one distinct + one ≤ 1024-row
    * aggregate; training docs take two broadcast hash joins and a
    * per-doc partial-aggregated count — map-only until the doc_id
    * regroup, no corpus shuffle keyed on shingles.
    */
  def bloomDecontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int, withExact: Boolean = true): DataFrame = {
    val words = bloomWords(bench, textCol, n)
    val base = bloomFlag(train, words, idCol, textCol, n)
    // the exact companion re-runs the exact broadcast-set path —
    // the very cost the Bloom filter exists to avoid. Test-SF/audit
    // luxury (the t56 gate and the FP accounting); production
    // pipelines at benchmark scale pass withExact = false and pay
    // only the 128 KB word broadcast.
    if (!withExact) base
    else {
      val exact = contaminatedIds(train, bench, idCol, textCol, n)
        .select(col(idCol).as("doc_id"), lit(1L).as("exact_hit"))
      base.join(exact, Seq("doc_id"), "left")
        .withColumn("exact_hit", coalesce(col("exact_hit"), lit(0L)))
    }
  }

  private def bloomProbe(h: Column, p: (Long, Long)): Column =
    (h * p._1 + p._2) % 4294967296L % BloomBits

  private def bloomMask(pos: String): Column =
    expr(s"shiftleft(cast(1 as bigint), cast($pos % 64 as int))")

  /** The benchmark side's Bloom words (w → 64-bit word) — the shared
    * front of [[bloomDecontaminate]] and the persisted registry
    * ([[buildBloomRegistry]]).
    */
  private def bloomWords(bench: DataFrame, textCol: String,
      n: Int): DataFrame = {
    GraftFunctions.register(bench.sparkSession)
    val benchHashes = bench
      .select(explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(call_function("poly_hash", col("g")).as("hb"))
      .distinct()
    // barrier before the per-probe renames: both membership joins
    // broadcast this relation, and the renamed projections would
    // otherwise be distinct subtrees — the filter build would run
    // (and re-tokenize the benchmark) once per probe
    Dedup.barrier(
      benchHashes
        .select(explode(array(bloomProbe(col("hb"), BloomProbe1),
          bloomProbe(col("hb"), BloomProbe2))).as("pos"))
        .select(expr("pos div 64").as("w"), bloomMask("pos").as("mask"))
        .groupBy("w").agg(expr("bit_or(mask)").as("word")),
      col("w"))
  }

  /** The training-side membership probe against an ALREADY-BUILT
    * words relation — the shared back half of [[bloomDecontaminate]]
    * and [[decontaminateFromRegistry]].
    */
  private def bloomFlag(train: DataFrame, words: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    GraftFunctions.register(train.sparkSession)
    def probe(h: Column, p: (Long, Long)): Column = bloomProbe(h, p)
    def mask(pos: String): Column = bloomMask(pos)
    val trainG = train
      .select(col(idCol).as("doc_id"),
        explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(col("doc_id"), call_function("poly_hash", col("g")).as("hb"))
      .withColumn("p1", probe(col("hb"), BloomProbe1))
      .withColumn("p2", probe(col("hb"), BloomProbe2))
    val hits = trainG
      .join(broadcast(words.select(col("w").as("w1"), col("word").as("word1"))),
        expr("p1 div 64") === col("w1"), "left")
      .join(broadcast(words.select(col("w").as("w2"), col("word").as("word2"))),
        expr("p2 div 64") === col("w2"), "left")
      .withColumn("hit",
        ((coalesce(col("word1"), lit(0L)).bitwiseAND(mask("p1")) =!= 0) &&
          (coalesce(col("word2"), lit(0L)).bitwiseAND(mask("p2")) =!= 0))
          .cast("long"))
      .groupBy("doc_id").agg(sum(col("hit")).as("n_hits"))
    train.select(col(idCol).as("doc_id"),
        size(Dedup.shingles(col(textCol), n)).cast("long").as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_hits", coalesce(col("n_hits"), lit(0L)))
      .withColumn("flagged", (col("n_hits") > 0).cast("long"))
  }

  /** Persisted Bloom decontamination registry — the production shape
    * of [[bloomDecontaminate]]: benchmark/canary sets are REGISTERED
    * once (a 2-probe Bloom over their n-gram hashes, stored as
    * (w → 64-bit word) rows — ~BloomBits/8 bytes total) and every
    * training batch thereafter checks membership against the frozen
    * registry without the benchmark text ever being re-read or even
    * retained. Ingestion appends new benchmarks' word rows; Bloom
    * words merge by BITWISE OR (associative, commutative), so the
    * read-time OR-fold makes build-then-ingest equal the one-shot
    * filter whatever the batch cut, replays are absorbed, and
    * [[compactBloomRegistry]] merely reclaims rows.
    */
  def buildBloomRegistry(bench: DataFrame, textCol: String, path: String,
      n: Int): Unit = {
    val spark = bench.sparkSession
    spark.range(1).select(lit(n).as("n"), lit(BloomBits).as("m"))
      .write.mode("overwrite").parquet(s"$path/meta")
    bloomWords(bench, textCol, n)
      .write.mode("overwrite").parquet(s"$path/words")
  }

  private def bloomRegistryMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): Int = {
    val m = spark.read.parquet(s"$path/meta")
      .select(col("n").cast("int"), col("m").cast("long")).collect()(0)
    require(m.getLong(1) == BloomBits,
      s"$path was built with m=${m.getLong(1)} bits; this build uses " +
        s"$BloomBits — rebuild the registry")
    m.getInt(0)
  }

  /** Register another benchmark into a persisted
    * [[buildBloomRegistry]] registry (words OR-merge at read time).
    */
  def ingestBloomBatch(spark: org.apache.spark.sql.SparkSession,
      path: String, bench: DataFrame, textCol: String): Unit = {
    val n = bloomRegistryMeta(spark, path)
    bloomWords(bench, textCol, n)
      .write.mode("append").parquet(s"$path/words")
  }

  /** Compact a persisted Bloom registry: one groupBy-OR rewrite,
    * swapped in atomically. */
  def compactBloomRegistry(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val p = s"$path/words"
    val dir = new org.apache.hadoop.fs.Path(p)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    graft.core.FsOps.recoverRetired(fs, dir)
    val staging = new org.apache.hadoop.fs.Path(p + "__staging")
    spark.read.schema("w BIGINT, word BIGINT").parquet(p)
      .groupBy("w").agg(expr("bit_or(word)").as("word"))
      .write.mode("overwrite").parquet(staging.toString)
    graft.core.FsOps.swapInDir(fs, dir, staging)
  }

  /** Registry health gauge — the one-row audit read BEFORE trusting
    * [[decontaminateFromRegistry]]'s verdicts: the OR-folded fill
    * ratio (set bits / m) and the expected false-positive rate of the
    * 2-probe filter, fp ≈ fill², both in exact ppm. A registry whose
    * fill creeps toward saturation flags clean documents as
    * contaminated — this is the rebuild/resize trigger, the Bloom
    * twin of [[graft.operators.Similarity.ivfStalenessReport]].
    * bit_count is exact on both engines (64-bit two's complement),
    * so the gauge is oracle-gated like everything else.
    *
    * Scale shape: the words relation is ≤ BloomBits/64 rows by
    * construction — the whole audit is index-sized.
    */
  def bloomRegistryStats(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    bloomRegistryMeta(spark, path) // schema/size guard
    spark.read.schema("w BIGINT, word BIGINT").parquet(s"$path/words")
      .groupBy("w").agg(expr("bit_or(word)").as("word"))
      .agg(count(lit(1)).as("n_words"),
        sum(expr("CAST(bit_count(word) AS BIGINT)")).as("bits_set"))
      .select(lit(BloomBits.toLong).as("m_bits"), col("n_words"),
        col("bits_set"),
        expr(s"(bits_set * 1000000) div ${BloomBits}L").as("fill_ppm"))
      .withColumn("fp_ppm",
        expr("(fill_ppm * fill_ppm) div 1000000"))
  }

  /** Decontaminate a training batch against the FROZEN registry:
    * OR-fold the stored words (the exact merge), pin the ≤
    * BloomBits/64-row relation, run the shared membership probe.
    * Output matches [[bloomDecontaminate]] at withExact = false.
    */
  def decontaminateFromRegistry(spark: org.apache.spark.sql.SparkSession,
      path: String, train: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val n = bloomRegistryMeta(spark, path)
    val words = spark.read.schema("w BIGINT, word BIGINT")
      .parquet(s"$path/words")
      .groupBy("w").agg(expr("bit_or(word)").as("word"))
      .localCheckpoint()
    bloomFlag(train, words, idCol, textCol, n)
  }

  // ---------------------------------------------------------------
  // Vocabulary / top-k n-gram counting
  // ---------------------------------------------------------------

  /** Corpus-wide top-k n-grams by occurrence count — vocabulary
    * construction / corpus profiling. The classic word-count shape:
    * explode grams, hash-aggregate with map-side partial counts (the
    * zipfian head collapses before the shuffle, so the exchange
    * carries one (gram, partial-count) row per distinct gram per
    * task), then `TakeOrderedAndProject` for the global top-k —
    * per-partition heaps of size k, never a full global sort. Ties at
    * the k boundary break deterministically (count desc, gram asc) so
    * the result is engine-independent.
    */
  def topNgrams(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val ts = TextFunctions.tokens(col(textCol))
    val grams = if (n == 1) ts else multisetGrams(ts, n)
    docs.select(explode(grams).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(k)
  }

  /** Count-min probe LCGs (depth 4) over the 31-bit gram PolyHash —
    * multipliers < 2³², base < 2³¹, so products stay < 2⁶³ in BIGINT
    * on both engines. Shared verbatim with the DuckDB oracle.
    */
  val CmProbes: Seq[(Long, Long)] = Seq(
    (2654435761L, 123456789L), (2246822519L, 3266489917L),
    (2971215073L, 433494437L), (2654435769L, 97L))

  /** Count-min frequency sketch over the corpus word n-gram stream,
    * reported against the true top-k: depth-[[CmProbes]] × `width`
    * BIGINT counters (each gram's occurrence count adds into one
    * bucket per row), point estimates = min over rows — the classic
    * CM guarantee, ONE-SIDED like the Bloom filter: est ≥ true
    * always (never an undercount), overshoot bounded by the
    * collision mass. Completes the sketch family: KMV (distinct,
    * bottom-k), HLL (distinct, fixed memory), Bloom (membership),
    * CM (frequency). All-integer, so the DuckDB oracle replays
    * counters AND estimates exactly, with the true counts alongside.
    *
    * Scale shape: one gram aggregate (the same zipfian-head map-side
    * combine as [[topNgrams]], barriered — it feeds the counters,
    * the true top-k, AND the estimate lookup), then the counter
    * relation is ≤ depth·width rows and the top-k probe joins it
    * broadcast. At 100 TB the sketch is depth·width longs of
    * mergeable-by-SUM state — per-shard counters add, the same
    * incremental-union story as the HLL registers (by max) and KMV
    * (by bottom-k merge).
    */
  /** One struct per CM probe row: (j, bucket_j) for the gram whose
    * PolyHash sits in column `h`.
    */
  private def cmProbeCols(width: Int): Seq[Column] =
    CmProbes.zipWithIndex.map { case ((a, b), j) =>
      struct(lit(j.toLong).as("j"),
        ((col("h") * a + b) % 4294967296L % width).as("bucket"))
    }

  /** The (gram, cnt, h) aggregate the CM paths share. */
  private def gramCounts(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val ts = TextFunctions.tokens(col(textCol))
    val grams = if (n == 1) ts else multisetGrams(ts, n)
    docs.select(explode(grams).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .withColumn("h", call_function("poly_hash", col("gram")))
  }

  private def cmCountersFromCounts(gcnt: DataFrame, width: Int): DataFrame =
    gcnt.select(col("cnt"), explode(array(cmProbeCols(width): _*)).as("p"))
      .groupBy(col("p.j").as("j"), col("p.bucket").as("bucket"))
      .agg(sum(col("cnt")).as("c"))

  /** Standalone CM counter relation (j, bucket, c) for a corpus —
    * the mergeable-by-SUM state form
    * [[graft.streaming.EventStreams.cmSketchStream]] appends per
    * micro-batch.
    */
  def cmCounters(docs: DataFrame, textCol: String, n: Int,
      width: Int = 1024): DataFrame =
    cmCountersFromCounts(gramCounts(docs, textCol, n), width)

  def cmSketchTopK(docs: DataFrame, textCol: String, n: Int, k: Int,
      width: Int = 1024): DataFrame = {
    val gcnt = Dedup.barrier(gramCounts(docs, textCol, n), col("gram"))
    val probeCols = cmProbeCols(width)
    val counters = cmCountersFromCounts(gcnt, width)
    val top = gcnt.orderBy(col("cnt").desc, col("gram").asc).limit(k)
    top.select(col("gram"), col("cnt"),
        explode(array(probeCols: _*)).as("p"))
      .join(broadcast(counters),
        col("p.j") === col("j") && col("p.bucket") === col("bucket"))
      .groupBy("gram", "cnt")
      .agg(min(col("c")).as("est_cnt"))
      .orderBy(col("cnt").desc, col("gram").asc)
  }

  /** Per-source corpus report card — the datasheet/data-card stats a
    * training-data pipeline publishes with every corpus release: doc
    * and token volumes, exact-duplicate incidence (by content
    * digest), language composition (modal language + distinct
    * count), and integer shape ratios. All-integer (counts and `div`
    * ratios), so the DuckDB oracle replays every cell.
    *
    * Scale shape: one pass computes per-doc (source, lang, n_tokens,
    * n_chars, digest); everything aggregates per source with map-side
    * combine except the exact distinct-digest count, which shuffles
    * 40-byte digests per source — exact by choice for an audit
    * artifact (the sketch alternative is [[hllDistinctSketch]]'s
    * registers per source at fixed memory). The modal-language
    * election is a window over the tiny (source, lang) histogram.
    */
  def corpusReport(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, langCol: String): DataFrame = {
    val perDoc = Dedup.barrier(
      docs.select(col(sourceCol).as("source"), col(langCol).as("lang"),
        size(TextFunctions.tokens(col(textCol))).cast("long").as("nt"),
        length(col(textCol)).cast("long").as("nc"),
        sha2(col(textCol), 256).as("dg")),
      col("source"))
    val base = perDoc.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("nt")).as("n_tokens"),
      sum(col("nc")).as("n_chars"),
      countDistinct(col("dg")).as("n_distinct_texts"),
      countDistinct(col("lang")).as("n_langs"))
    val wLang = Window.partitionBy("source")
      .orderBy(col("cnt").desc, col("lang").asc)
    val modal = perDoc.groupBy("source", "lang")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(wLang))
      .filter(col("rn") === 1)
      .select(col("source"), col("lang").as("modal_lang"))
    base.join(modal, "source")
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_chars"),
        (col("n_docs") - col("n_distinct_texts")).as("n_exact_dup_docs"),
        col("n_langs"), col("modal_lang"),
        expr("n_tokens div n_docs").as("avg_doc_tokens"),
        expr("n_chars div greatest(n_tokens, 1)").as("avg_token_len"))
  }

  // ---------------------------------------------------------------
  // Distinct-count sketching (KMV)
  // ---------------------------------------------------------------

  /** KMV (k-minimum-values) distinct-count sketch over the corpus
    * word n-gram vocabulary: hash every n-gram into a fixed integer
    * space,
    * keep the k smallest distinct hashes, and estimate
    * |distinct| ≈ (k−1)·M / u_k (u_k = k-th smallest, M = hash-space
    * size) — the classic bottom-k sketch. Everything is deterministic
    * BIGINT arithmetic (31-bit PolyHash spread by an LCG into 2³²),
    * so the DuckDB oracle replays the sketch EXACTLY — hash values,
    * k-set, and estimate — and the fixture's exact distinct count is
    * emitted alongside for an accuracy check.
    *
    * Scale shape: map-side partial aggregation collapses duplicate
    * hashes before the exchange, the distinct shuffle carries 8-byte
    * hashes, and the global bottom-k is `TakeOrderedAndProject`
    * (size-k heaps per partition). At 100 TB the same plan holds —
    * and because bottom-k sets are mergeable, per-partition sketches
    * can also be unioned incrementally without re-reading history
    * (the exact_distinct companion column is a test-SF luxury, not
    * part of the production sketch). A 64/128-bit hash drops in
    * without changing the plan; 2³² is used so BOTH engines stay in
    * overflow-free int64 arithmetic.
    */
  def kmvDistinctSketch(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val ts = TextFunctions.tokens(col(textCol))
    val grams = if (n == 1) ts else multisetGrams(ts, n)
    val hashes = docs
      .select(explode(grams).as("tk"))
      .select(((call_function("poly_hash", col("tk")) * 2654435761L + 123456789L)
        % 4294967296L).as("h"))
      .distinct()
    val kmin = hashes.orderBy("h").limit(k)
    kmin.agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_min"))
      .crossJoin(broadcast(hashes.agg(count(lit(1)).as("exact_distinct"))))
      .select(
        lit(k.toLong).as("k"),
        col("n_kept"),
        col("kth_min"),
        // fewer than k distinct values -> the sketch IS the exact set
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"(${k - 1} * 4294967296) div greatest(kth_min, 1)"))
          .as("est_distinct"),
        col("exact_distinct"))
  }

  /** HyperLogLog distinct-count sketch over the corpus word n-gram
    * vocabulary — the fixed-memory companion to the bottom-k
    * [[kmvDistinctSketch]]: hash every n-gram into 2³² (same 31-bit
    * PolyHash + LCG spread, so both sketches share one hash stream),
    * route it to one of m = 2^p registers by its low p bits, and keep
    * per register the max rank ρ = (leading zeros of the remaining
    * 32−p bits) + 1. The estimate is the classic harmonic mean
    * α_m·m²/Σ2^(−ρ_j); Σ is carried as the exact integer
    * Σ2^(maxρ − ρ_j) (`z_scaled`, every term a power of two), so the
    * only floating arithmetic is the final α_m multiply/divide —
    * (+,·,/) are correctly-rounded IEEE, bit-identical in any
    * engine, and the DuckDB oracle replays registers AND estimate
    * exactly. The small-range linear-counting correction
    * (m·ln(m/V)) is deliberately NOT applied: `ln` is not
    * bit-portable across engines; `n_zero_regs` is emitted so a
    * consumer can apply their own. Fixture vocabularies sit far
    * above the 2.5m correction cutoff.
    *
    * Scale shape: registers are a groupBy(bucket).max whose map-side
    * combine collapses every partition to ≤ m rows before its
    * exchange; the final fold is one m-row agg. Registers are
    * mergeable by max, so per-shard sketches union incrementally
    * without re-reading history. As shipped, the register stream and
    * the `exact_distinct` companion (a test-SF luxury for the
    * accuracy check, as in KMV) both read one shared distinct-hash
    * relation so its exchange is reused rather than tokenizing the
    * corpus twice; a companion-free production sketch groups the raw
    * gram stream directly — one streaming pass and m longs of state,
    * no vocabulary-wide shuffle anywhere.
    */
  /** The corpus word n-gram hash stream shared by the sketch family:
    * 31-bit PolyHash spread by the LCG into 2³².
    */
  private def gramHashes(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val ts = TextFunctions.tokens(col(textCol))
    val grams = if (n == 1) ts else multisetGrams(ts, n)
    docs.select(explode(grams).as("tk"))
      .select(((call_function("poly_hash", col("tk")) * 2654435761L + 123456789L)
        % 4294967296L).as("h"))
  }

  /** (bucket, r) HLL registers from a hash relation: ρ via the msb
    * position of the register remainder — bin() renders without
    * leading zeros in BOTH engines, so length(bin(rem)) is msb+1 and
    * ρ = remBits + 1 − length(bin(rem)); rem = 0 pins the max rank.
    */
  private def hllRegs(hashes: DataFrame, p: Int): DataFrame = {
    val m = 1 << p
    val remBits = 32 - p
    hashes
      .select((col("h") % m).as("bucket"), expr(s"h div $m").as("rem"))
      .select(col("bucket"),
        when(col("rem") === 0, lit(remBits + 1))
          .otherwise(lit(remBits + 1) - length(bin(col("rem")))).as("rho"))
      .groupBy("bucket")
      .agg(max(col("rho")).as("r"))
  }

  /** HLL registers over a corpus — the MERGEABLE state form: a
    * ≤ 2^p-row (bucket, r) relation where r is a max-semilattice, so
    * shard/batch registers union by groupBy(bucket).max into exactly
    * the whole-corpus registers (what
    * [[graft.streaming.EventStreams.hllSketchStream]] maintains per
    * micro-batch). Computed straight off the raw gram stream — the
    * production form; the register max partial-aggregates map-side.
    */
  def hllRegisters(docs: DataFrame, textCol: String, n: Int, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"precision $p outside [4,16]")
    hllRegs(gramHashes(docs, textCol, n), p)
  }

  /** The HLL estimate row from a (bucket, r) register relation —
    * split from [[hllDistinctSketch]] so stream-maintained register
    * state yields the identical estimate columns.
    */
  def hllEstimateFromRegisters(regs: DataFrame, p: Int): DataFrame = {
    val m = 1 << p
    val maxRho = 32 - p + 1
    // every literal cast to double explicitly: bare 0.7213 parses as
    // DECIMAL in both Spark and DuckDB, and decimal division follows
    // engine-specific precision rules — doubles are IEEE-identical
    val alpha = s"cast(0.7213 as double) / (cast(1.0 as double) " +
      s"+ cast(1.079 as double) / cast($m as double))"
    regs
      .agg(count(lit(1)).as("n_filled"),
        // coalesce: SUM over ZERO register rows is NULL, and an empty
        // corpus/stream state must still yield the well-defined
        // all-zero-registers row (z = m·2^maxRho), not NULLs
        coalesce(
          sum(expr(s"shiftleft(cast(1 as bigint), cast($maxRho - r as int))")),
          lit(0L)).as("z_filled"))
      .select(
        lit(p.toLong).as("p"),
        lit(m.toLong).as("m"),
        (lit(m.toLong) - col("n_filled")).as("n_zero_regs"),
        (col("z_filled") +
          (lit(m.toLong) - col("n_filled")) * lit(1L << maxRho)).as("z_scaled"))
      .select(col("p"), col("m"), col("n_zero_regs"), col("z_scaled"),
        expr(s"cast(floor($alpha * cast(${m.toLong * m} as double)" +
          s" * cast(${1L << maxRho} as double)" +
          " / cast(z_scaled as double)) as bigint)").as("est_distinct"))
  }

  def hllDistinctSketch(docs: DataFrame, textCol: String, n: Int, p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"precision $p outside [4,16]")
    // the register max over the raw gram stream equals the max over
    // DISTINCT hashes, and the exact_distinct companion needs the
    // distinct relation anyway — computing both from one shared
    // distinct lets the planner reuse its exchange instead of
    // tokenizing the corpus twice (companion-free production HLL
    // is [[hllRegisters]] over the raw stream)
    val hashes = gramHashes(docs, textCol, n).distinct()
    hllEstimateFromRegisters(hllRegs(hashes, p), p)
      .crossJoin(broadcast(hashes.agg(
        count(lit(1)).as("exact_distinct"))))
  }

  /** Distinct-count SET OPERATIONS between two corpora via bottom-k
    * (KMV) sketches over their word n-gram vocabularies: estimates of
    * |A|, |B|, |A∪B|, and |A∩B| from two k-minimum-values sketches —
    * the classic sketch algebra (union = bottom-k of the merged
    * sketches; intersection via ρ/k·|A∪B| where ρ counts members of
    * the combined bottom-k present in BOTH side sketches). The same
    * hash stream as [[kmvDistinctSketch]]/[[hllDistinctSketch]], all
    * arithmetic BIGINT (ρ ≤ k and est_union < k·2³² keep the
    * ρ·est product far from overflow), so the DuckDB oracle replays
    * sketches, ρ, and every estimate exactly; exact union/intersect
    * companions ride along for the accuracy check. When the combined
    * bottom-k holds fewer than k values the sketches ARE the exact
    * vocabularies, and the estimators degrade to the exact counts —
    * same convention as KMV.
    *
    * Scale shape: one pass per corpus builds the distinct hash
    * stream (map-side-combined distinct), each bottom-k is
    * `TakeOrderedAndProject` (size-k partition heaps); everything
    * after operates on ≤ 2k-row relations. At 100 TB the sketches are
    * the only state that crosses corpus boundaries — compare any two
    * snapshots/shards/datasets without co-shuffling their
    * vocabularies (the exact companions are the test-SF luxury, same
    * as KMV).
    */
  def kmvSetOps(docsA: DataFrame, docsB: DataFrame, textCol: String,
      n: Int, k: Int): DataFrame = {
    val ha = gramHashes(docsA, textCol, n).distinct()
    val hb = gramHashes(docsB, textCol, n).distinct()
    // barrier each k-row sketch: sa/sb feed THREE consumers (merged
    // bottom-k, the membership join, the side stats) — the exchange
    // is reused, so each TakeOrdered runs once instead of per consumer
    val sa = Dedup.barrier(ha.orderBy("h").limit(k), col("h"))
    val sb = Dedup.barrier(hb.orderBy("h").limit(k), col("h"))
    val merged = sa.union(sb).distinct().orderBy("h").limit(k)
    val statsU = merged
      .join(sa.select(col("h"), lit(1).as("in_a")), Seq("h"), "left")
      .join(sb.select(col("h"), lit(1).as("in_b")), Seq("h"), "left")
      .agg(count(lit(1)).as("n_u"), max(col("h")).as("uk_u"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
          .as("rho"))
    val statsA = sa.agg(count(lit(1)).as("n_a"), max(col("h")).as("uk_a"))
    val statsB = sb.agg(count(lit(1)).as("n_b"), max(col("h")).as("uk_b"))
    val exacts = ha.select(col("h"), lit(1).as("ea"))
      .join(hb.select(col("h"), lit(1).as("eb")), Seq("h"), "full_outer")
      .agg(count(lit(1)).as("exact_union"),
        sum(when(col("ea") === 1 && col("eb") === 1, 1L).otherwise(0L))
          .as("exact_intersect"))
    // integer `div` throughout: Spark's `/` on longs is DOUBLE division
    def kmvEst(nKept: String, ukMin: String): String =
      s"(CASE WHEN $nKept < $k THEN $nKept " +
        s"ELSE ${(k - 1).toLong * 4294967296L} div greatest($ukMin, 1) END)"
    statsU
      .crossJoin(broadcast(statsA))
      .crossJoin(broadcast(statsB))
      .crossJoin(broadcast(exacts))
      .select(
        lit(k.toLong).as("k"),
        expr(kmvEst("n_a", "uk_a")).cast("long").as("est_a"),
        expr(kmvEst("n_b", "uk_b")).cast("long").as("est_b"),
        expr(kmvEst("n_u", "uk_u")).cast("long").as("est_union"),
        col("rho"),
        expr(s"CASE WHEN n_u < $k THEN rho " +
          s"ELSE (rho * ${kmvEst("n_u", "uk_u")}) div $k END")
          .cast("long").as("est_intersect"),
        col("exact_union"), col("exact_intersect"))
  }

  /** Cross-group quantile normalization of an integer score — the
    * batch-effect correction that makes per-source quality/length
    * scores comparable before a global threshold is applied: every
    * document's score maps to the GLOBAL score at its within-group
    * quantile, norm = min{ s : cumG(s) ≥ ⌈q·N / n_g⌉ } with q the
    * upper cumulative count of the doc's score inside its group (ties
    * map together, the standard discrete quantile-function
    * convention). All arithmetic is cumulative integer counts plus
    * one ceiling division (38-digit decimals for q·N, HUGEINT in the
    * oracle), replayed exactly.
    *
    * Scale shape: the corpus collapses to COMPRESSED SCORE HISTOGRAMS
    * first ((group, score) counts — the [[qualityPrune]] move); both
    * cumulative counts ride [[Prefix.shardedCum]]'s two-phase sharded
    * prefix sum (a high-precision score column makes the histograms
    * corpus-sized, so no single window partition may carry one), and
    * the quantile lookup (a ≥-join against the broadcast global
    * cumulative histogram) and target arithmetic run on
    * histogram-sized relations; the corpus itself is touched twice
    * (score projection + the map-side join back on (group, score)).
    */
  def quantileNormalize(docs: DataFrame, idCol: String, groupCol: String,
      scoreCol: String): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      col(groupCol).as("grp"), col(scoreCol).cast("long").as("score"))
    // histogram-sized, three consumers — pinned
    val gh = base.groupBy("grp", "score").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    // both cumulatives ride Prefix's two-phase sharded prefix sum: a
    // high-precision score column makes the histograms corpus-sized
    // (the t150/t155 round-13 finding), so neither a global nor a
    // per-group window partition may carry them whole
    val cumg = Prefix.shardedCum(gh, "score", Seq("cnt" -> "q"),
      partCols = Seq("grp"))
    val ng = gh.groupBy("grp").agg(sum("cnt").as("n_g"))
    val global = gh.groupBy("score").agg(sum("cnt").as("gcnt"))
      .localCheckpoint() // histogram-sized, three consumers
    val gcum = Prefix.shardedCum(global, "score", Seq("gcnt" -> "gcum"))
      .select(col("score").as("gs"), col("gcum"))
    val tot = global.agg(sum("gcnt").as("n_tot"))
    val tgt = cumg.join(broadcast(ng), "grp").crossJoin(broadcast(tot))
      .withColumn("target", expr(
        "CAST((CAST(q AS DECIMAL(38,0)) * n_tot + n_g - 1) div n_g AS LONG)"))
    // quantile lookup: min{gs : gcum(gs) ≥ target} via the sharded
    // ceiling search — the former broadcast ≥-join compared (and
    // OUTPUT) |targets|·|gcum| rows, O(D²) in distinct scores (the
    // r15 profile: 3,933 histogram rows → 1.06 M joined rows at
    // sf0.1). gcum is strictly increasing over gs, so the row with
    // the minimal qualifying gcum carries exactly min(gs).
    val lookup = Prefix.shardedCeilLookup(gcum, "gcum", Seq("gs"),
        tgt.select("grp", "score", "q", "n_g", "target"), "target")
      .filter(col("gs").isNotNull) // the ≥-join was inner
      .select(col("grp"), col("score"), col("q"), col("n_g"),
        col("gs").as("norm_score"))
    base.join(lookup, Seq("grp", "score"))
      .select("doc_id", "grp", "score", "q", "n_g", "norm_score")
  }

  /** Persisted quantile-map lifecycle — the fit/transform split of
    * score calibration ([[quantileNormalize]] is fit-and-transform on
    * one relation; production wants the sklearn shape: FIT the
    * reference CDF once, TRANSFORM every later batch against the
    * FROZEN map): the store is the compressed (score → count)
    * histogram of the reference corpus — distinct-scores-sized, the
    * smallest faithful representation of a quantile function — and a
    * batch row's calibrated value is its percentile under that
    * reference, ref_cum(s) = #\{reference ≤ s\} in exact ppm.
    *
    * Ingestion is histogram ADDITION (count histograms merge by sum),
    * so streamed reference ingestion equals the one-shot fit whatever
    * the micro-batch cut, replays only add rows the read-side
    * re-aggregation collapses, and [[compactQuantileMap]] merely
    * reclaims (groupBy-sum + atomic swap).
    *
    * Transform scale shape: the batch compresses to its DISTINCT
    * scores first, the ≤-lookup (largest reference score ≤ s, via one
    * struct MAX over a broadcast of the reference cum relation) runs
    * on distinct-values × distinct-values — the [[quantileNormalize]]
    * discipline — and rows get their percentile back through one
    * score equi-join. Nothing corpus-sized meets the inequality.
    */
  def fitQuantileMap(docs: DataFrame, scoreCol: String,
      path: String): Unit = {
    val spark = docs.sparkSession
    spark.range(1).select(lit(scoreCol).as("score_col"))
      .write.mode("overwrite").parquet(s"$path/meta")
    docs.select(col(scoreCol).cast("long").as("score"))
      .groupBy("score").agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(s"$path/hist")
  }

  /** The store's fitted score column — guard every later touch so a
    * batch carrying a DIFFERENT score column can't silently pour an
    * unrelated distribution into the histogram (the
    * [[bloomRegistryMeta]] discipline: meta mismatch raises, never
    * corrupts).
    */
  private def quantileMapMeta(spark: org.apache.spark.sql.SparkSession,
      path: String, scoreCol: String): Unit = {
    val fitted = spark.read.parquet(s"$path/meta")
      .select(col("score_col")).collect()(0).getString(0)
    require(fitted == scoreCol,
      s"$path was fitted on score column '$fitted'; this batch carries " +
        s"'$scoreCol' — refusing to mix distributions (refit or rename)")
  }

  /** Append a new reference batch's histogram into a persisted
    * [[fitQuantileMap]] store (histograms add — see the lifecycle
    * scaladoc). The stored score_col must match the batch's — a
    * mismatch raises instead of silently corrupting the histogram.
    */
  def ingestQuantileBatch(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, scoreCol: String): Unit = {
    quantileMapMeta(spark, path, scoreCol)
    batch.select(col(scoreCol).cast("long").as("score"))
      .groupBy("score").agg(count(lit(1)).as("cnt"))
      .write.mode("append").parquet(s"$path/hist")
  }

  /** REFIT a persisted quantile map against a fresh reference corpus —
    * the remediation [[quantileMapDrift]] (t164) triggers: the gauge
    * detects KS drift, this recalibrates. The band/winnow stores got
    * their re-bucketing remediation in the same spirit; the quantile
    * map's is a full histogram rebuild, because a quantile function
    * has no incremental repair — the old reference mass IS the
    * staleness. The new histogram builds into a staging dir and
    * [[graft.core.FsOps.swapInDir]] makes it live in ONE swap (a
    * reader never sees half a CDF; a crash between renames is
    * recovered from `__retired` on the next touch). The meta guard
    * still applies — refit recalibrates the SAME score column; a
    * different column is a new store, not a refit.
    */
  def refitQuantileMap(spark: org.apache.spark.sql.SparkSession,
      path: String, corpus: DataFrame, scoreCol: String): Unit = {
    quantileMapMeta(spark, path, scoreCol)
    val p = s"$path/hist"
    val dir = new org.apache.hadoop.fs.Path(p)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    graft.core.FsOps.recoverRetired(fs, dir)
    val staging = new org.apache.hadoop.fs.Path(p + "__staging")
    corpus.select(col(scoreCol).cast("long").as("score"))
      .groupBy("score").agg(count(lit(1)).as("cnt"))
      .write.mode("overwrite").parquet(staging.toString)
    graft.core.FsOps.swapInDir(fs, dir, staging)
  }

  /** Compact a persisted quantile map: one groupBy-sum rewrite of the
    * histogram, swapped in atomically. */
  def compactQuantileMap(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val p = s"$path/hist"
    val dir = new org.apache.hadoop.fs.Path(p)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    graft.core.FsOps.recoverRetired(fs, dir)
    val staging = new org.apache.hadoop.fs.Path(p + "__staging")
    spark.read.schema("score BIGINT, cnt BIGINT").parquet(p)
      .groupBy("score").agg(sum("cnt").as("cnt"))
      .write.mode("overwrite").parquet(staging.toString)
    graft.core.FsOps.swapInDir(fs, dir, staging)
  }

  /** Quantile-map staleness gauge — the "when do we refit" read for
    * the [[fitQuantileMap]] store (the calibration twin of
    * [[graft.operators.Similarity.ivfStalenessReport]] and
    * [[bloomRegistryStats]]): the frozen reference CDF serves every
    * [[percentileFromMap]] transform between refits, and this gauge
    * measures how far a CURRENT batch's score distribution has
    * drifted from it — the exact Kolmogorov–Smirnov statistic in ppm
    * (max |CDF_ref − CDF_cur| over the union of jump points, where a
    * step-CDF supremum is always attained). Rising ks_ppm means the
    * store's percentiles mis-calibrate the batches it transforms;
    * this is the refit trigger.
    *
    * Scale shape: both sides compress to distinct-score histograms
    * first (map-side combinable), the full-outer merge runs on the
    * distinct-scores relation, both CDFs ride ONE
    * [[Prefix.shardedCum]] two-phase sharded prefix pass (the
    * jump-point relation scales with distinct scores), and the
    * verdict is one MAX.
    */
  def quantileMapDrift(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, scoreCol: String): DataFrame = {
    quantileMapMeta(spark, path, scoreCol)
    val ref = spark.read.schema("score BIGINT, cnt BIGINT")
      .parquet(s"$path/hist")
      .groupBy("score").agg(sum("cnt").as("rc"))
    val cur = batch.select(col(scoreCol).cast("long").as("score"))
      .groupBy("score").agg(count(lit(1)).as("cc"))
    val merged = ref.join(cur, Seq("score"), "full_outer")
      .select(col("score"), coalesce(col("rc"), lit(0L)).as("rc"),
        coalesce(col("cc"), lit(0L)).as("cc"))
      .localCheckpoint() // distinct-scores-sized, two consumers
    val tot = merged.agg(sum("rc").as("n_ref"), sum("cc").as("n_cur"),
      count(lit(1)).as("n_scores"))
    // both CDFs in ONE two-phase sharded prefix pass (Prefix): the
    // merged jump-point relation scales with distinct scores, so no
    // unpartitioned window may carry it
    Prefix.shardedCum(merged, "score",
        Seq("rc" -> "crf", "cc" -> "ccf"))
      .crossJoin(broadcast(tot))
      .select(col("n_ref"), col("n_cur"), col("n_scores"),
        abs(expr("(crf * 1000000) div greatest(n_ref, 1)") -
          expr("(ccf * 1000000) div greatest(n_cur, 1)")).as("d"))
      .groupBy("n_ref", "n_cur", "n_scores")
      .agg(max("d").as("ks_ppm"))
  }

  /** PER-SOURCE quality-drift gauge (t172) — [[quantileMapDrift]]'s
    * KS discipline applied to the classifier plane's real failure
    * mode: a corpus-level ks_ppm can stay green while ONE source's
    * score distribution walks away from the calibration store (a
    * crawl snapshot changes, one feed rots), and every
    * [[percentileFromMap]] transform of that source mis-calibrates.
    * One row per batch source: the exact Kolmogorov–Smirnov distance
    * (ppm) between the frozen reference CDF and that source's
    * current score CDF, over the union of jump points — rising
    * ks_ppm on a source is the [[refitQuantileMap]] /
    * drop-the-source trigger, closing the scoring→refit loop per
    * source the way t164 closed it per corpus.
    *
    * Scale shape: the batch compresses to a (source, score)
    * histogram (map-side combinable); the reference histogram
    * BROADCASTS under a cross join with the |sources|-row relation
    * (histogram × sources, never corpus-shaped); the merge is a
    * union + re-group — no outer join, so NULL sources form their
    * own group in both engines by GROUP BY semantics alone; both
    * CDFs per source ride ONE source-partitioned
    * [[Prefix.shardedCum]] pass; totals join back null-safely
    * (`<=>`) over |sources| rows.
    */
  def quantileMapDriftBySource(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, scoreCol: String,
      sourceCol: String): DataFrame = {
    quantileMapMeta(spark, path, scoreCol)
    val ref = spark.read.schema("score BIGINT, cnt BIGINT")
      .parquet(s"$path/hist")
      .groupBy("score").agg(sum("cnt").as("rc"))
      .localCheckpoint() // histogram-sized; re-read per source via broadcast
    val cur = batch.select(col(sourceCol).as("source"),
        col(scoreCol).cast("long").as("score"))
      .groupBy("source", "score").agg(count(lit(1)).as("cc"))
      .localCheckpoint() // (source, score)-histogram-sized, two consumers
    val sources = cur.select("source").distinct()
    val merged = sources.crossJoin(broadcast(ref))
      .select(col("source"), col("score"), col("rc"), lit(0L).as("cc"))
      .unionByName(cur.select(col("source"), col("score"),
        lit(0L).as("rc"), col("cc")))
      .groupBy("source", "score")
      .agg(sum("rc").as("rc"), sum("cc").as("cc"))
      .localCheckpoint() // jump-point relation, consumed by cum + totals
    val tot = merged.groupBy("source").agg(sum("rc").as("n_ref"),
      sum("cc").as("n_cur"), count(lit(1)).as("n_scores"))
    val cum = Prefix.shardedCum(merged, "score",
      Seq("rc" -> "crf", "cc" -> "ccf"), partCols = Seq("source"))
    cum.join(broadcast(tot), cum("source") <=> tot("source"))
      .select(cum("source"), col("n_ref"), col("n_cur"), col("n_scores"),
        abs(expr("(crf * 1000000) div greatest(n_ref, 1)") -
          expr("(ccf * 1000000) div greatest(n_cur, 1)")).as("d"))
      .groupBy("source", "n_ref", "n_cur", "n_scores")
      .agg(max("d").as("ks_ppm"))
  }

  /** Percentile-transform a batch against the FROZEN reference map:
    * (id, score, ref_cum, pct_ppm) per batch row. See the lifecycle
    * scaladoc for the shape argument.
    */
  def percentileFromMap(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    quantileMapMeta(spark, path, scoreCol)
    val hist = spark.read.schema("score BIGINT, cnt BIGINT")
      .parquet(s"$path/hist")
      .groupBy("score").agg(sum("cnt").as("cnt"))
      .localCheckpoint() // two consumers: cum relation + total
    // reference CDF via the two-phase sharded prefix sum — the store
    // histogram scales with distinct reference scores
    val cum = Prefix.shardedCum(hist, "score", Seq("cnt" -> "rc"))
      .select(col("score").as("rs"), col("rc"))
    val nRef = hist.agg(sum("cnt").as("n_ref"))
    val rows = batch.select(col(idCol).as("doc_id"),
      col(scoreCol).cast("long").as("score"))
    // a NULL batch score (or an unparseable cast) never equi-joins
    // back in `rows.join(lookup, "score")`, so the pre-r15 broadcast
    // ≤-join dropped it silently; keep that contract by excluding
    // nulls from the lookup (shardedFloorLookup raises on NULL
    // compared values by design)
    val scores = rows.select("score").filter(col("score").isNotNull).distinct()
    // predecessor search: max{rs : rs ≤ score} with its rc, via the
    // sharded floor lookup — the former broadcast ≤-join compared
    // (and OUTPUT) |batch scores|·|reference scores| rows, O(D²) in
    // distinct scores on both sides
    val lookup = Prefix.shardedFloorLookup(cum, "rs", Seq("rc"),
        scores, "score")
      .select(col("score"), coalesce(col("rc"), lit(0L)).as("ref_cum"))
    rows.join(lookup, "score")
      .crossJoin(broadcast(nRef))
      .select(col("doc_id"), col("score"), col("ref_cum"),
        expr("(ref_cum * 1000000) div greatest(n_ref, 1)").as("pct_ppm"))
  }

  /** Adjacent-bigram collocation mining by LIFT — the phrase-induction
    * pass a tokenizer/vocabulary pipeline runs to promote multiword
    * units: for every adjacent token pair seen at least `minCount`
    * times, lift = P(ab)/(P(a)·P(b)) = n_ab·N_tok²/(N_bi·n_a·n_b),
    * emitted in 1e6 fixed point. PMI's log is transcendental (libm-
    * dependent across engines); lift carries the identical ranking
    * and stays integer-exact — scored as TWO chained integer floors
    * (s1 = n_ab·N_tok·1e6 div (n_a·N_bi); lift = s1·N_tok div n_b)
    * so no intermediate product exceeds 38-digit decimals even at
    * N_tok ~1e14 (the single-floor form's n_ab·N_tok²·1e6 numerator
    * needs >38 digits past N_tok ~3e9 and Spark would silently null
    * it under non-ANSI mode). The two-step floor is the CONTRACT —
    * the oracle replays the same two divisions bit-for-bit; vs the
    * single floor it understates lift by < 1 part in s1 (≥ ~1e6 for
    * any promoted pair). Corpora outside the proven-exact envelope
    * (N_tok ≥ 1e15, or a degenerate N_bi·1e6 < N_tok) raise instead
    * of overflowing silently — the guard is folded into the consumed
    * n_tok column so it cannot be pruned away.
    *
    * Scale shape: two map-side-combinable count aggregations (token
    * and bigram vocabularies — shuffles keyed on the word/gram, never
    * the document), the bigram relation pinned once for its two
    * consumers (total mass + filtered join), then two vocab-keyed
    * equi-joins and a broadcast of the 1-row totals. The minCount cut
    * bounds the emitted relation the way every heavy-hitter pass
    * does.
    */
  def collocationLift(docs: DataFrame, textCol: String,
      minCount: Long = 5L): DataFrame = {
    require(minCount >= 1)
    GraftFunctions.register(docs.sparkSession)
    val ts = TextFunctions.tokens(col(textCol))
    val uni = Dedup.barrier(
      docs.select(explode(ts).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n_w")),
      col("w")).localCheckpoint()
    val nTok = uni.agg(sum("n_w").as("n_tok"))
    val biAll = Dedup.barrier(
      docs.select(explode(multisetGrams(ts, 2)).as("g"))
        .groupBy("g").agg(count(lit(1)).as("n_ab")),
      col("g")).localCheckpoint()
    val nBi = biAll.agg(sum("n_ab").as("n_bi"))
    biAll.filter(col("n_ab") >= minCount)
      .withColumn("w1", element_at(split(col("g"), " "), 1))
      .withColumn("w2", element_at(split(col("g"), " "), 2))
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_a")), "w1")
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_b")), "w2")
      .crossJoin(broadcast(nTok))
      .crossJoin(broadcast(nBi))
      // overflow guard folded into the consumed column (a side guard
      // column would be pruned): with n_tok < 1e15 and n_bi*1e6 >=
      // n_tok, step 1's products stay <= 1e36 and s1 <= 1e12, so
      // step 2's s1*n_tok stays <= 1e27 — all inside DECIMAL(38,0).
      .withColumn("n_tok", expr(
        "CASE WHEN n_tok >= 1000000000000000" +
          " OR CAST(n_bi AS DECIMAL(38,0)) * 1000000 < n_tok" +
          " THEN CAST(raise_error('collocationLift: corpus outside the" +
          " integer-exact envelope (n_tok >= 1e15 or n_bi*1e6 < n_tok)')" +
          " AS BIGINT) ELSE n_tok END"))
      .withColumn("s1", expr(
        "(CAST(n_ab AS DECIMAL(38,0)) * n_tok * 1000000)" +
          " div (CAST(n_a AS DECIMAL(38,0)) * n_bi)"))
      .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
        expr("CAST((CAST(s1 AS DECIMAL(38,0)) * n_tok) div n_b AS LONG)")
          .as("lift_x1e6"))
  }

  /** Pairwise per-GROUP KMV overlap matrix — the set-overlap
    * companion of [[sourceDivergence]] (which compares unigram
    * DISTRIBUTIONS): one bottom-k sketch of each group's distinct
    * n-gram vocabulary, then the [[kmvSetOps]] estimators for EVERY
    * group pair — the "which sources crawl the same material" audit a
    * mixture designer reads before collapsing redundant crawls, at
    * |groups|·k longs of state instead of co-shuffling vocabularies.
    *
    * Scale shape: ONE corpus scan builds the per-group sketches (a
    * (group, h) distinct + per-group bottom-k rank, both shuffling
    * compact longs keyed by group); the sketch relation is
    * localCheckpoint-pinned (|groups|·k rows) and every pairwise
    * stage runs on sketches only — group count is bounded (sources
    * are O(100) at any corpus size), so the pair fan-out is
    * index-sized, never corpus-sized. Estimates are the exact
    * integer-division KMV arithmetic both engines replay.
    */
  def kmvGroupOverlap(docs: DataFrame, textCol: String, groupCol: String,
      n: Int, k: Int): DataFrame = {
    // |groups|·k rows; pinned — consumed by both pair sides and the
    // per-group stats
    val sk = kmvGroupSketch(docs, textCol, groupCol, n, k).localCheckpoint()
    kmvOverlapFromSketches(sk, k)
  }

  /** Per-group bottom-k KMV sketch rows (grp, h) — the shared front
    * of [[kmvGroupOverlap]] and the persisted sketch store
    * ([[buildKmvStore]]): one corpus scan, a (group, gram-hash)
    * distinct, and the per-group bottom-k rank — compact longs keyed
    * by group the whole way.
    */
  private[graft] def kmvGroupSketch(docs: DataFrame, textCol: String,
      groupCol: String, n: Int, k: Int): DataFrame = {
    require(n > 0 && k > 1)
    GraftFunctions.register(docs.sparkSession)
    val ts = TextFunctions.tokens(col(textCol))
    val grams = if (n == 1) ts else multisetGrams(ts, n)
    val gh = docs.select(col(groupCol).as("grp"), explode(grams).as("tk"))
      .select(col("grp"),
        ((call_function("poly_hash", col("tk")) * 2654435761L + 123456789L)
          % 4294967296L).as("h"))
      .distinct()
    val wg = Window.partitionBy("grp").orderBy("h")
    gh.withColumn("rn", row_number().over(wg))
      .filter(col("rn") <= k)
      .select(col("grp"), col("h"))
  }

  /** The pairwise-estimator back half of [[kmvGroupOverlap]] over an
    * ALREADY bottom-k (grp, h) sketch relation — shared by the
    * in-query operator and the persisted store's
    * [[kmvOverlapFromStore]], so one arithmetic carries both and the
    * t115/t148 oracles gate the same estimators.
    */
  def kmvOverlapFromSketches(sk: DataFrame, k: Int): DataFrame = {
    require(k > 1)
    val names = sk.select(col("grp")).distinct()
    val stats = sk.groupBy("grp").agg(
      count(lit(1)).as("n_g"), max("h").as("uk_g"))
    def kmvEst(nKept: String, ukMin: String): String =
      s"(CASE WHEN $nKept < $k THEN $nKept " +
        s"ELSE ${(k - 1).toLong * 4294967296L} div greatest($ukMin, 1) END)"
    // every sketch row fans out to its pairs with each OTHER group —
    // a broadcast of the tiny name list, |groups|·k·|groups| rows max
    val aSide = sk.select(col("grp").as("ga"), col("h"), lit(1).as("in_a"),
        lit(0).as("in_b"))
      .join(broadcast(names.select(col("grp").as("gb"))), col("ga") < col("gb"))
    val bSide = sk.select(col("grp").as("gb"), col("h"), lit(0).as("in_a"),
        lit(1).as("in_b"))
      .join(broadcast(names.select(col("grp").as("ga"))), col("ga") < col("gb"))
    val perPairH = aSide.unionByName(bSide)
      .groupBy("ga", "gb", "h")
      .agg(max("in_a").as("in_a"), max("in_b").as("in_b"))
    val wp = Window.partitionBy("ga", "gb").orderBy("h")
    val merged = perPairH.withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= k)
    val pairStats = merged.groupBy("ga", "gb").agg(
      count(lit(1)).as("n_u"), max("h").as("uk_u"),
      sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L))
        .as("rho"))
    pairStats
      .join(broadcast(stats.select(col("grp").as("ga"),
        col("n_g").as("n_a"), col("uk_g").as("uk_a"))), "ga")
      .join(broadcast(stats.select(col("grp").as("gb"),
        col("n_g").as("n_b"), col("uk_g").as("uk_b"))), "gb")
      .select(col("ga").as("source_a"), col("gb").as("source_b"),
        lit(k.toLong).as("k"),
        expr(kmvEst("n_a", "uk_a")).cast("long").as("est_a"),
        expr(kmvEst("n_b", "uk_b")).cast("long").as("est_b"),
        expr(kmvEst("n_u", "uk_u")).cast("long").as("est_union"),
        col("rho"),
        expr(s"CASE WHEN n_u < $k THEN rho " +
          s"ELSE (rho * ${kmvEst("n_u", "uk_u")}) div $k END")
          .cast("long").as("est_intersect"))
  }

  private val KmvStoreSchema = "h BIGINT, grp STRING"

  /** Persisted per-group KMV sketch store — the vocabulary-overlap
    * audit ([[kmvGroupOverlap]], t115) as a MAINTAINED artifact
    * instead of a per-run corpus scan: |groups|·k longs on disk,
    * partitioned by group, with (n, k) frozen in meta. The point at
    * 100 TB: overlap questions arrive far more often than corpora
    * change, and the store answers them from index-sized state —
    * ingestion appends only the BATCH's sketch (cost tracks the
    * batch), correctness rides KMV's exact merge law
    * bottomK(A ∪ B) = bottomK(bottomK(A) ∪ bottomK(B)), so
    * build-then-ingest equals the one-shot build over the union
    * BIT-FOR-BIT after re-selection (the t148 oracle replays the
    * one-shot SQL against the split-built store). Appends only add
    * rows — [[kmvOverlapFromStore]] re-selects bottom-k per group at
    * read time, so replayed batches are admission-idempotent and
    * [[compactKmvStore]] merely reclaims (the [[graft.operators.Dedup.compactBandIndex]]
    * discipline: distinct + re-rank, atomic swap).
    */
  def buildKmvStore(docs: DataFrame, textCol: String, groupCol: String,
      path: String, n: Int, k: Int): Unit = {
    val spark = docs.sparkSession
    spark.range(1).select(lit(n).as("n"), lit(k).as("k"))
      .write.mode("overwrite").parquet(s"$path/meta")
    kmvGroupSketch(docs, textCol, groupCol, n, k)
      .repartition(col("grp"))
      .write.mode("overwrite").partitionBy("grp")
      .parquet(s"$path/sketches")
  }

  private def kmvStoreMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): (Int, Int) = {
    val m = spark.read.parquet(s"$path/meta").select("n", "k")
      .collect()(0)
    (m.getInt(0), m.getInt(1))
  }

  /** Append a NEW batch's per-group sketches into a persisted
    * [[buildKmvStore]] store, with the STORED (n, k). See the store
    * scaladoc for the merge law that makes this exact.
    */
  def ingestKmvBatch(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, textCol: String,
      groupCol: String): Unit = {
    val (n, k) = kmvStoreMeta(spark, path)
    kmvGroupSketch(batch, textCol, groupCol, n, k)
      .repartition(col("grp"))
      .write.mode("append").partitionBy("grp")
      .parquet(s"$path/sketches")
  }

  /** Compact a persisted KMV store: distinct + per-group bottom-k
    * re-rank (appends accumulate rows past k), swapped in atomically.
    */
  def compactKmvStore(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val (_, k) = kmvStoreMeta(spark, path)
    val p = s"$path/sketches"
    val dir = new org.apache.hadoop.fs.Path(p)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    graft.core.FsOps.recoverRetired(fs, dir)
    val wg = Window.partitionBy("grp").orderBy("h")
    val staging = new org.apache.hadoop.fs.Path(p + "__staging")
    spark.read.schema(KmvStoreSchema).parquet(p).distinct()
      .withColumn("rn", row_number().over(wg))
      .filter(col("rn") <= k)
      .select(col("grp"), col("h"))
      .repartition(col("grp"))
      .write.mode("overwrite").partitionBy("grp")
      .parquet(staging.toString)
    graft.core.FsOps.swapInDir(fs, dir, staging)
  }

  /** KMV-store health gauge — the one-row audit completing the gauge
    * family on the sketch store: how many groups the store holds, how
    * many answer EXACTLY (distinct hashes < k — their "estimates" are
    * plain counts), the exact-duplicate row mass replayed ingests
    * accumulate, and the rows compaction would reclaim (appends keep
    * each batch's bottom-k, so a group's live rows can exceed k;
    * [[compactKmvStore]] re-ranks back to k). dup_ppm rising says
    * replays are padding the probed partitions; reclaim_ppm says a
    * compaction is worth its rewrite.
    *
    * Scale shape: ONE (grp)-keyed aggregation of the sketch relation
    * (≤ |groups|·k·|batches| rows by construction — index-sized),
    * then a 1-row collapse; nothing corpus-sized exists here at all.
    */
  def kmvStoreStats(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val (_, k) = kmvStoreMeta(spark, path)
    spark.read.schema(KmvStoreSchema).parquet(s"$path/sketches")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_g"), count_distinct(col("h")).as("nd_g"))
      .agg(count(lit(1)).as("n_groups"), sum("n_g").as("n_rows"),
        sum("nd_g").as("n_distinct"),
        sum(least(col("nd_g"), lit(k.toLong))).as("kept"),
        sum(when(col("nd_g") < k.toLong, 1L).otherwise(0L))
          .as("n_exact_groups"))
      .select(col("n_groups"), col("n_rows"), col("n_distinct"),
        col("n_exact_groups"),
        (col("n_groups") - col("n_exact_groups")).as("n_estimated_groups"),
        expr("((n_rows - n_distinct) * 1000000) div greatest(n_rows, 1)")
          .as("dup_ppm"),
        expr("((n_rows - kept) * 1000000) div greatest(n_rows, 1)")
          .as("reclaim_ppm"))
  }

  /** The overlap matrix answered FROM the store: re-select bottom-k
    * per group (KMV's exact merge over whatever appends accumulated),
    * pin the |groups|·k relation, and run the shared
    * [[kmvOverlapFromSketches]] estimators — no corpus anywhere in
    * the plan.
    */
  def kmvOverlapFromStore(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val (_, k) = kmvStoreMeta(spark, path)
    val wg = Window.partitionBy("grp").orderBy("h")
    val sk = spark.read.schema(KmvStoreSchema)
      .parquet(s"$path/sketches")
      .distinct()
      .withColumn("rn", row_number().over(wg))
      .filter(col("rn") <= k)
      .select(col("grp"), col("h"))
      .localCheckpoint()
    kmvOverlapFromSketches(sk, k)
  }

  // ---------------------------------------------------------------
  // Document chunking
  // ---------------------------------------------------------------

  /** Split each document into `chunk`-token windows every `stride`
    * tokens (overlap = chunk − stride) — the standard preprocessing
    * step for fixed-context training and embedding pipelines. Pure
    * map-side: tokenize, posexplode the start offsets, slice — no
    * shuffle, no state, trivially parallel at any scale. The final
    * window of a document is allowed to be short (standard practice);
    * `chunk_tokens` carries its actual length.
    */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
      chunk: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunk >= stride, "need 0 < stride <= chunk")
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("ts"))
      .withColumn("n_tokens", size(col("ts")).cast("long"))
      .select(col("doc_id"), col("ts"), col("n_tokens"),
        posexplode(sequence(lit(0L), greatest(col("n_tokens") - 1L, lit(0L)),
          lit(stride.toLong))).as(Seq("chunk_no", "start_tok")))
      .select(col("doc_id"), col("chunk_no").cast("long").as("chunk_no"),
        col("start_tok"),
        array_join(slice(col("ts"), (col("start_tok") + 1L).cast("int"), lit(chunk)), " ")
          .as("chunk_text"),
        least(lit(chunk.toLong), col("n_tokens") - col("start_tok")).as("chunk_tokens"))
  }

  // ---------------------------------------------------------------
  // Span-level exact dedup (duplicated-span attrition)
  // ---------------------------------------------------------------

  /** Per-document duplicated-span statistics — the segment-granularity
    * form of exact substring dedup (Lee et al. ACL'22 remove exact
    * matches at 50-token granularity; this reports the per-doc
    * duplicated fraction a curation pass thresholds to drop
    * boilerplate-heavy documents). Documents are cut into
    * NON-overlapping `k`-token spans ([[chunkDocs]] with
    * stride = chunk = k; the short tail span counts too); a span whose
    * text occurs more than once corpus-wide (any document, including
    * twice within one) is "duplicated".
    *
    * Scale shape: tokenize/explode is map-side; the only shuffles are
    * the span-frequency groupBy on the span's 64-bit FNV fingerprint
    * (~8 B/span, never the text — collisions ~|spans|²/2⁶⁴, and the
    * oracle gate would catch one) and the per-doc re-aggregation.
    * The frequency join reuses the fingerprint shuffle partitioning.
    * `dup_frac` is a single int/int IEEE division — no accumulation,
    * bit-identical in the DuckDB oracle.
    */
  def spanDupStats(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val spans = chunkDocs(docs, idCol, textCol, chunk = k, stride = k)
      .select(col("doc_id"),
        call_function("fnv64", col("chunk_text")).as("fp"))
    val freq = spans.groupBy("fp").agg(count(lit(1)).as("gf"))
    spans.join(freq, "fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        count(when(col("gf") > 1, lit(1))).as("n_dup_spans"))
      .withColumn("dup_frac",
        col("n_dup_spans").cast("double") / col("n_spans").cast("double"))
  }

  /** MAXIMAL duplicated-range detection at SLIDING granularity — the
    * exact-substring face of [[spanDupStats]] (Lee et al. ACL'22 find
    * duplicated substrings at any alignment; the fixed-stride span
    * statistics miss a copy that straddles a span boundary, sliding
    * windows cannot). A position `i` in a document is COVERED iff the
    * `l`-token gram starting there occurs >= 2 times corpus-wide
    * (any document, within-doc repeats included). Covered windows
    * `[i, i+l)` are coalesced into maximal ranges — two hits merge
    * while the gap between starts is <= l (overlap or touch, i.e. the
    * union is contiguous) — giving per doc the duplicated-token mass
    * an exact-substring curation pass would cut and the ranges a
    * rewrite would operate on. Output: (doc_id, n_tokens,
    * n_dup_spans, dup_tokens), zeros for clean/short docs — all
    * BIGINT, oracle-exact.
    *
    * Scale shape: the sliding explode emits one SKINNY (doc_id, pos,
    * fp) row per token — ~24 B/token, the price of any-alignment
    * sensitivity (the fixed-stride form emits 1/k as many rows; both
    * shapes shuffle fingerprints, never text). Frequency is one
    * map-side-combinable count on the 8-byte fp; the hit join reuses
    * that fp partitioning; coalescing is one per-doc window over HIT
    * positions only (bounded by doc length, usually a tiny fraction
    * of it) plus a per-doc aggregate. Collisions ~|grams|²/2⁶⁴ flag a
    * clean range — and would hash-mismatch the oracle gate, which
    * counts on gram TEXT.
    */
  def maximalDupRanges(docs: DataFrame, idCol: String, textCol: String,
      l: Int = 8): DataFrame = {
    require(l > 0)
    GraftFunctions.register(docs.sparkSession)
    val base = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("ts"))
      .withColumn("n_tokens", size(col("ts")).cast("long"))
    val grams = base
      .select(col("doc_id"),
        explode(when(col("n_tokens") >= l,
            sequence(lit(0L), col("n_tokens") - lit(l.toLong)))
          .otherwise(array().cast("array<bigint>"))).as("pos"),
        col("ts"))
      .select(col("doc_id"), col("pos"),
        call_function("fnv64",
          array_join(slice(col("ts"), (col("pos") + 1L).cast("int"), lit(l)),
            " ")).as("fp"))
    val hot = grams.groupBy("fp").agg(count(lit(1)).as("gf"))
      .filter(col("gf") >= 2).select("fp")
    val hits = grams.join(hot, "fp").select("doc_id", "pos")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val ranges = hits
      .withColumn("newr",
        when(lag("pos", 1).over(w).isNull, lit(1L))
          .when(col("pos") - lag("pos", 1).over(w) > l, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("gid", sum("newr").over(w))
      .groupBy("doc_id", "gid")
      .agg(min("pos").as("s"), max("pos").as("e"))
    val agg = ranges.groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("e") - col("s") + lit(l.toLong)).as("dup_tokens"))
    base.select("doc_id", "n_tokens")
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
  }

  /** Span-level exact dedup as a TRANSFORM — the rewrite counterpart
    * of [[spanDupStats]] (Lee et al. ACL'22 exact substring dedup:
    * remove every duplicated segment, keeping one canonical copy
    * corpus-wide). Documents are cut into NON-overlapping `k`-token
    * spans (short tail included); each distinct span text elects its
    * canonical occurrence — the lexicographically smallest
    * (doc_id, span index) — and every OTHER occurrence is dropped.
    * The surviving spans are re-joined in original order into
    * `new_text` (empty when a fully-duplicated document loses all its
    * spans). Output: (doc_id, n_spans, n_kept, new_text).
    *
    * Scale shape: the election shuffles only (doc_id, idx, fp) —
    * 8-byte FNV span fingerprints, never span text (a collision would
    * flip a keep decision and hash-mismatch the oracle gate, so the
    * compression is itself under test). The keep-decision join reuses
    * the fingerprint shuffle partitioning; the per-doc kept-index
    * aggregation carries two longs per span. The single corpus-sized
    * movement is the final doc_id co-partition join that brings each
    * doc's token array to its kept-index row for the map-side rebuild
    * — one text shuffle total (vs two for piping span text through
    * the election), and it drops to zero when the corpus is at rest
    * bucketed by the id column ([[graft.exec.Bucketing]]), the layout
    * a 100 TB curation pass would use anyway. Every shuffle keys on
    * fp or doc_id; nothing ever goes all-pairs.
    *
    * The canonical election compares the packed key
    * doc_id·2²⁰ + idx (identical arithmetic in the DuckDB oracle),
    * valid while a document has < 2²⁰ spans (8M tokens at k = 8) and
    * doc_id < 2⁴³ — both loose at any realistic sharding.
    */
  def spanDedupRewrite(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    // injectivity guard folded into the consumed key (the t133 sid
    // lesson): outside the documented envelope the packed election
    // key would silently MERGE spans across documents — raise instead
    val packed = when(
      col("doc_id") < 0L || col("doc_id") >= lit(1L << 43) ||
        col("idx") < 0L || col("idx") >= lit(1L << 20),
      raise_error(lit("spanDedupRewrite: packed election key needs" +
        " doc_id in [0,2^43) and span idx in [0,2^20)")).cast("long"))
      .otherwise(col("doc_id") * lit(1048576L) + col("idx"))
    val spans = chunkDocs(docs, idCol, textCol, chunk = k, stride = k)
      .select(col("doc_id"), col("chunk_no").as("idx"),
        call_function("fnv64", col("chunk_text")).as("fp"))
    val elect = spans.groupBy("fp").agg(
      count(lit(1)).as("gf"), min(packed).as("can"))
    val keep = col("gf") === 1L || packed === col("can")
    val kept = spans.join(elect, "fp")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        count(when(keep, lit(1))).as("n_kept"),
        sort_array(collect_list(when(keep, col("idx")))).as("kept_idx"))
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("ts"))
      .join(kept, "doc_id")
      .select(col("doc_id"), col("n_spans"), col("n_kept"),
        array_join(
          transform(col("kept_idx"), i =>
            array_join(
              slice(col("ts"), (i * k + 1L).cast("int"), lit(k)), " ")),
          " ").as("new_text"))
  }

  // ---------------------------------------------------------------
  // Hashed-feature linear classifier inference
  // ---------------------------------------------------------------

  /** Linear classifier inference over hashed bag-of-words features —
    * the fastText-style quality/domain scorer a curation pipeline runs
    * against every document (e.g. CCNet/LLaMA wiki-reference filters).
    * Each token hashes into one of `weights.length` buckets
    * (feature hashing, Weinberger et al. ICML'09); the document score
    * is `bias + Σ weights(polyHash(token) mod F)` — exact integer
    * arithmetic, so the score is order-independent and bit-identical
    * in the DuckDB oracle (a float dot product would be
    * fold-order-sensitive). `keep` is `score >= threshold`.
    *
    * Scale shape: entirely map-side — the model rides the plan as a
    * literal array (the broadcast degenerate case: F·8 bytes), token
    * hashing is one compiled [[graft.functions.PolyHashArray]] loop,
    * and the bucket-weight sum is a native `aggregate` over longs. No
    * shuffle, no join, no state; at 100 TB this is a single pass at
    * scan speed, exactly like the other per-row scorers (t01/t29).
    * Real-model weights are floats; quantizing them to scaled longs
    * (as the PQ/BM25 paths do) preserves ranking while keeping the
    * exactness contract.
    */
  def hashedLinearScore(docs: DataFrame, idCol: String, textCol: String,
      weights: Seq[Long], bias: Long, threshold: Long): DataFrame = {
    require(weights.nonEmpty, "need at least one feature bucket")
    GraftFunctions.register(docs.sparkSession)
    val f = weights.length
    val wArr = array(weights.map(lit): _*)
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("ts"))
      .select(col("doc_id"),
        size(col("ts")).cast("long").as("n_tokens"),
        call_function("poly_hash_array", col("ts"), lit(false)).as("hs"))
      .select(col("doc_id"), col("n_tokens"),
        (lit(bias) + aggregate(col("hs"), lit(0L), (acc, h) =>
          acc + element_at(wArr, pmod(h, lit(f.toLong)).cast("int") + 1)))
          .as("score"))
      .withColumn("keep", col("score") >= threshold)
  }

  /** Score-calibration report for a classifier-based filter — the
    * diagnostic read before trusting [[hashedLinearScore]] weights to
    * prune a corpus: documents are cut into `bins` equal-population
    * score bins (quantile bins, ties unified: every doc with the
    * same score lands in the same bin, so no id tie-break enters the
    * arithmetic) and each bin reports its population, its
    * positive-label count, the score range, and the realized
    * positive rate in integer ppm. A well-ordered score shows
    * pos_ppm rising monotonically with the bin; a flat profile says
    * the classifier ranks noise.
    *
    * Scale shape: the corpus collapses to a (score → count,
    * pos_count) histogram first (map-side combinable; the shuffle
    * carries distinct scores, not documents — the qualityPrune
    * histogram-quantile discipline), the cumulative bin walk windows
    * over that compressed histogram only, and the per-bin rollup is
    * an aggregation of histogram rows. The label column rides the
    * same scan as the text (one corpus pass); no corpus-wide sort or
    * per-document window exists in the plan, and the histogram
    * cumulative itself rides [[Prefix.shardedCum]]'s two-phase
    * sharded prefix sum (distinct scores scale with the corpus).
    */
  def scoreCalibrationReport(docs: DataFrame, idCol: String,
      textCol: String, weights: Seq[Long], positive: Column,
      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    val scored = hashedLinearScore(docs, idCol, textCol, weights,
      bias = 0L, threshold = 0L)
    // histogram join keyed on doc_id recovers the label without a
    // second text read: Spark prunes the probe side to (id, __pos)
    val labeled = scored.select(col("doc_id"), col("score"))
      .join(docs.select(col(idCol).as("doc_id"),
        positive.cast("boolean").as("__pos")), "doc_id")
    val hist = labeled.groupBy("score").agg(
        count(lit(1)).as("cnt"),
        sum(when(col("__pos"), 1L).otherwise(0L)).as("pos_cnt"))
      .localCheckpoint() // histogram-sized, three consumers
    val total = hist.agg(sum("cnt").as("n_total"))
    // cumulative bin walk on the two-phase sharded prefix sum: the
    // score histogram scales with distinct scores, never one window
    Prefix.shardedCum(hist, "score", Seq("cnt" -> "cum"))
      .crossJoin(broadcast(total))
      .withColumn("bin",
        least(expr(s"((cum - 1) * $bins) div n_total"),
          lit((bins - 1).toLong)))
      .groupBy("bin").agg(
        sum("cnt").as("n_docs"),
        sum("pos_cnt").as("n_pos"),
        min("score").as("lo_score"),
        max("score").as("hi_score"))
      .withColumn("pos_ppm", expr("(n_pos * 1000000) div n_docs"))
  }

  /** Preference-pair export (DPO / reward-model training data): per
    * group, rank items by (score DESC, id) and pair the i-th best
    * with the i-th worst — pair_no = i — keeping pairs whose score
    * gap is at least `minGap`. The classic construction for turning a
    * pointwise quality score into pairwise preferences with maximal
    * separation; an odd group's middle row pairs with itself and is
    * excluded, as is everything beyond `maxPairs` per group.
    *
    * Scale shape: ONE shuffle. Both sides of a pair are recovered
    * WITHOUT a self-join: each row knows its pair index
    * (least(rank, n+1-rank)) and side (rank == pair index), so the
    * pair assembles as a two-row groupBy on (group, pair_no) — a
    * refinement of the ranking window's partition keys, satisfied by
    * the same exchange. A rank self-join here would re-derive the
    * scored relation per side (the exchange-reuse hazard) and shuffle
    * the corpus twice.
    */
  def preferencePairs(scored: DataFrame, idCol: String, scoreCol: String,
      groupCols: Seq[String], maxPairs: Int, minGap: Long): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    require(maxPairs > 0, s"maxPairs must be positive, got $maxPairs")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*)
      .orderBy(col("score_").desc, col("id_"))
    val wn = Window.partitionBy(g: _*)
    scored
      .select(g ++ Seq(col(idCol).as("id_"), col(scoreCol).as("score_")): _*)
      .withColumn("rb", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("pair_no", least(col("rb"), col("n") + lit(1L) - col("rb")))
      .filter(col("pair_no") <= lit(maxPairs.toLong) &&
        col("pair_no") <= expr("n div 2"))
      .withColumn("is_chosen", col("rb") === col("pair_no"))
      .groupBy(g :+ col("pair_no"): _*)
      .agg(
        min(when(col("is_chosen"), col("id_"))).as("chosen_id"),
        min(when(!col("is_chosen"), col("id_"))).as("rejected_id"),
        min(when(col("is_chosen"), col("score_"))).as("chosen_score"),
        min(when(!col("is_chosen"), col("score_"))).as("rejected_score"))
      .withColumn("gap", col("chosen_score") - col("rejected_score"))
      .filter(col("gap") >= minGap)
  }

  /** Tokenizer fertility / compression report per group — the
    * go/no-go read on a tokenizer before committing a training run:
    * per (e.g. lang, source) stratum, the whitespace word count, the
    * REAL BPE token count ([[graft.functions.Bpe]], the frozen merge
    * table), the character count, and two integer-ppm ratios —
    * fertility (BPE tokens per word; high fertility on a language
    * means the tokenizer fragments it and the model pays more compute
    * per sentence) and compression (chars per BPE token).
    *
    * Scale shape: the BPE count is a codegen'd map-only expression;
    * the report is ONE map-side-combinable aggregation on the group
    * keys (4 longs of state per group), so the corpus is read once
    * and the shuffle carries |groups| rows.
    */
  def tokenizerFertility(docs: DataFrame, textCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    GraftFunctions.register(docs.sparkSession)
    val g = groupCols.map(col)
    docs.select(g ++ Seq(
        TextFunctions.nTokens(col(textCol)).as("words"),
        GraftFunctions.bpeTokenCount(textCol).as("bpe"),
        length(col(textCol)).cast("long").as("chars")): _*)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_docs"),
        sum("words").as("total_words"),
        sum("bpe").as("total_bpe_tokens"),
        sum("chars").as("total_chars"))
      .withColumn("fertility_ppm",
        expr("(total_bpe_tokens * 1000000) div greatest(total_words, 1)"))
      .withColumn("chars_per_token_ppm",
        expr("(total_chars * 1000000) div greatest(total_bpe_tokens, 1)"))
  }

  /** Per-group percentile normalization of a quality score — the step
    * that makes ONE pruning threshold meaningful across heterogeneous
    * sources: a raw classifier score of 0 can be the 90th percentile
    * of a clean source and the 10th of a noisy one, so per-source
    * percentile rank (not the raw score) is what a cross-source
    * filter compares. Ties share a percentile (RANK, not row_number —
    * no id tie-break enters the arithmetic); pctl_ppm =
    * (rank-1)·10⁶ div (n-1), with a single-row group pinned to 0.
    *
    * Scale shape: one window exchange on the group keys; everything
    * after is per-row arithmetic. Group cardinality is per-source
    * corpus size — at 100 TB partition the window input by source
    * shard if a single source dominates (same key refinement the
    * packing ops use).
    */
  def scorePercentiles(scored: DataFrame, idCol: String, scoreCol: String,
      groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "need at least one grouping column")
    val g = groupCols.map(col)
    val w = Window.partitionBy(g: _*).orderBy(col(scoreCol))
    val wn = Window.partitionBy(g: _*)
    scored
      .select(g ++ Seq(col(idCol), col(scoreCol)): _*)
      .withColumn("rk", rank().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("pctl_ppm",
        when(col("n") > 1, expr("((rk - 1) * 1000000) div (n - 1)"))
          .otherwise(lit(0L)))
      .drop("rk", "n")
  }

  /** T5-style span-corruption example construction (Raffel et al.
    * 2020 §3.1.4) — the denoising-pretraining export: positions are
    * masked by the shared deterministic id-hash (ratePct per token),
    * CONTIGUOUS masked runs collapse to one sentinel, and each
    * document yields (input with `<extra_id_k>` sentinels, target =
    * sentinel-prefixed masked spans). Re-running the pipeline
    * regenerates byte-identical examples — the property a resumable
    * pretraining data build needs. (The closing `<extra_id_n>`
    * terminator some implementations append is omitted; the target
    * ends with its last span.)
    *
    * Scale shape: the t92 sessionize shape on the token axis — one
    * shuffle on doc_id; the mask flags are per-position hash bits
    * (map-side), run ids are a lag + running sum inside the per-doc
    * window, and both output strings assemble in ONE per-doc
    * aggregation. Never an O(len²) per-doc fold.
    */
  def spanCorruption(docs: DataFrame, idCol: String, textCol: String,
      ratePct: Int = 15): DataFrame = {
    require(ratePct > 0 && ratePct < 100,
      s"ratePct must be in (0, 100), got $ratePct")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol)))
          .as(Seq("pos", "tok")))
      // composite position key: the spanDedup doc_id·2^20+idx packing
      .withColumn("masked",
        idMix(col("doc_id") * lit(1048576L) + col("pos")) % 100 < ratePct)
      .withColumn("run_start",
        col("masked") &&
          !coalesce(lag(col("masked"), 1).over(w), lit(false)))
      .withColumn("run_id", sum(when(col("run_start"), 1L).otherwise(0L))
        .over(run))
      .withColumn("in_frag",
        when(!col("masked"), col("tok"))
          .when(col("run_start"),
            concat(lit("<extra_id_"), (col("run_id") - 1).cast("string"),
              lit(">"))))
      .withColumn("tgt_frag",
        when(col("run_start"),
          concat(lit("<extra_id_"), (col("run_id") - 1).cast("string"),
            lit("> "), col("tok")))
          .when(col("masked"), col("tok")))
    toks.groupBy("doc_id").agg(
      concat_ws(" ", transform(
        array_sort(collect_list(when(col("in_frag").isNotNull,
          struct(col("pos"), col("in_frag"))))),
        x => x.getField("in_frag"))).as("input_text"),
      concat_ws(" ", transform(
        array_sort(collect_list(when(col("tgt_frag").isNotNull,
          struct(col("pos"), col("tgt_frag"))))),
        x => x.getField("tgt_frag"))).as("target_text"),
      max(col("run_id")).as("n_spans"),
      sum(when(col("masked"), 1L).otherwise(0L)).as("n_masked"))
  }

  /** Next-segment-prediction pair construction (the BERT NSP recipe,
    * deterministic): documents split into fixed-size token segments
    * ([[chunkDocs]], stride = chunk); every segment with a successor
    * becomes an anchor, and the shared id-hash of its packed
    * (doc·2²⁰ + seg) key decides the pair — even: the TRUE next
    * segment (is_next = 1); odd: a deterministic pseudo-random
    * partner segment (is_next = 0), resolved exactly like the t90
    * random tier: the min packed key of the first non-empty hash
    * bucket at or cyclically after ((h div 2) + 1) mod `negBuckets`,
    * with the degenerate same-document draw filtered.
    *
    * Scale shape: the segment relation is checkpoint-pinned (three
    * consumers: anchors, successors, the bucket table — each would
    * otherwise re-tokenize the corpus); the positive side is one
    * (doc, seg+1) equi-join; the negative side joins a
    * `negBuckets`-row broadcast. Output is id-level (trainer joins
    * texts back by (doc, seg) when materializing).
    */
  def segmentPairs(docs: DataFrame, idCol: String, textCol: String,
      chunk: Int = 32, negBuckets: Int = 64): DataFrame = {
    require(chunk > 0, s"chunk must be positive, got $chunk")
    val segs = chunkDocs(docs, idCol, textCol, chunk, chunk)
      .select(col("doc_id"), col("chunk_no"))
      .localCheckpoint()
    // the packed key is UNPACKED below (partner_doc = pcomp div 2^20)
    // — out-of-envelope ids would not just collide, they would emit
    // corrupted partner ids; guard folded into the consumed key
    val comp = when(
      col("doc_id") < 0L || col("doc_id") >= lit(1L << 43) ||
        col("chunk_no") < 0L || col("chunk_no") >= lit(1L << 20),
      raise_error(lit("segmentPairs: packed segment key needs doc_id" +
        " in [0,2^43) and chunk_no in [0,2^20)")).cast("long"))
      .otherwise(col("doc_id") * lit(1048576L) + col("chunk_no"))
    val anchors = segs
      .join(segs.select(col("doc_id"),
        (col("chunk_no") - 1L).as("chunk_no")), Seq("doc_id", "chunk_no"),
        "left_semi")
      .withColumn("h", idMix(comp))
    val pos = anchors.filter(col("h") % 2 === 0)
      .select(col("doc_id"), col("chunk_no").as("seg_no"),
        col("doc_id").as("partner_doc"),
        (col("chunk_no") + 1L).as("partner_seg"),
        lit(true).as("is_next"))
    val bmin = segs
      .withColumn("bucket", idMix(comp) % negBuckets)
      .groupBy("bucket").agg(min(comp).as("pcomp"))
    val neg = anchors.filter(col("h") % 2 =!= 0)
      .withColumn("target", (expr("h div 2") + 1L) % negBuckets)
      .crossJoin(broadcast(bmin))
      .withColumn("cyc",
        (col("bucket") - col("target") + negBuckets) % negBuckets)
      .groupBy(col("doc_id"), col("chunk_no").as("seg_no"))
      .agg(min_by(col("pcomp"), col("cyc")).as("pcomp"))
      .select(col("doc_id"), col("seg_no"),
        expr("pcomp div 1048576").as("partner_doc"),
        (col("pcomp") % 1048576L).as("partner_seg"),
        lit(false).as("is_next"))
      .filter(col("partner_doc") =!= col("doc_id"))
    pos.unionAll(neg)
  }

  /** Vocabulary coverage curve — the diminishing-returns diagnostic
    * a scaling decision reads: for deterministic sample fractions
    * 10%, 20%, …, 100% (the shared [[sampleBucket]] hash subsets, so
    * each fraction NESTS inside the next — a true growth curve, not
    * ten independent samples), how many of the corpus's distinct
    * word n-grams does the sample cover. Computed in ONE gram pass:
    * a gram is covered at fraction p iff the MINIMUM sample bucket
    * over its documents is < p, so the whole curve falls out of the
    * ≤100-row histogram of per-gram minimum buckets.
    *
    * Scale shape: explode grams map-side, shuffle 8-byte fnv64
    * fingerprints (the t04 collision-freedom discipline — the oracle
    * replays gram text), one min-agg per gram, then everything runs
    * on the 100-row histogram. Output: (pct, grams_covered,
    * coverage_ppm of the full distinct-gram count).
    */
  def coverageCurve(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val g = docs.select(sampleBucket(col(idCol)).as("bucket"),
        explode(multisetGrams(TextFunctions.tokens(col(textCol)), n))
          .as("gram"))
      .select(col("bucket"), call_function("fnv64", col("gram")).as("f"))
      .groupBy("f").agg(min("bucket").as("minb"))
    val hist = g.groupBy("minb").agg(count(lit(1)).as("cnt"))
    val total = hist.agg(sum("cnt").as("n_grams"))
    val pcts = docs.sparkSession.range(1, 11)
      .select((col("id") * 10).as("pct"))
    pcts.join(hist, col("minb") < col("pct"), "left")
      .groupBy("pct").agg(coalesce(sum("cnt"), lit(0L)).as("grams_covered"))
      .crossJoin(broadcast(total))
      .select(col("pct"), col("grams_covered"),
        expr("(grams_covered * 1000000) div n_grams").as("coverage_ppm"))
  }

  // ---------------------------------------------------------------
  // Deterministic stratified sampling
  // ---------------------------------------------------------------

  /** Full-width deterministic id mix → [0, 2^32): the ONE id-hash
    * every sampling / split / cap / ordering operator keys on. Both
    * 32-bit lanes of the id feed the result (lo is mixed, hi is
    * injected between the two multiply rounds), so — unlike a
    * `id mod p` pre-fold — no two distinct ids ever share the hash by
    * construction of the fold: there is no input period. The shape is
    * the classic xor-shift/multiply avalanche (two rounds of
    * `x ^= x >> 16; x *= 0x45d9f3b` plus a final fold), with every
    * multiply operand masked to 32 bits first so products stay below
    * 2^59 — pure BIGINT arithmetic with no overflow in either engine,
    * replayed verbatim by the DuckDB oracle (`&`, `>>`, `xor`).
    * Deterministic: re-running the pipeline selects the same rows —
    * the property a reproducible training mix needs.
    */
  def idMix(id: Column): Column = {
    val lo = id.bitwiseAND(lit(4294967295L))
    val hi = shiftright(id, 32).bitwiseAND(lit(4294967295L))
    val s0 = lo.bitwiseXOR(lit(123456789L))
    val h1 = s0.bitwiseXOR(shiftright(s0, 16))
      .multiply(lit(73244475L)).bitwiseAND(lit(4294967295L))
    val h2 = h1.bitwiseXOR(hi)
    val h3 = h2.bitwiseXOR(shiftright(h2, 16))
      .multiply(lit(73244475L)).bitwiseAND(lit(4294967295L))
    h3.bitwiseXOR(shiftright(h3, 16))
  }

  /** Scalar twin of [[idMix]] — the identical fold as plain Long
    * arithmetic, for keyed-state streaming faces that must replay the
    * deterministic draw row-by-row (a Column can't run inside
    * flatMapGroupsWithState). Property-tested equal to the Column
    * form.
    */
  def idMixLong(id: Long): Long = {
    val lo = id & 4294967295L
    val hi = (id >> 32) & 4294967295L
    val s0 = lo ^ 123456789L
    val h1 = ((s0 ^ (s0 >> 16)) * 73244475L) & 4294967295L
    val h2 = h1 ^ hi
    val h3 = ((h2 ^ (h2 >> 16)) * 73244475L) & 4294967295L
    h3 ^ (h3 >> 16)
  }

  /** Sampling bucket in [0, 100): the low two decimal digits of
    * [[idMix]] (whose final xor-fold pushes high-bit entropy into the
    * low bits, so the bucket sees the whole id).
    */
  def sampleBucket(id: Column): Column = idMix(id) % 100L

  /** Deterministic stratified sampling: keep a row iff its hash
    * bucket falls under the per-stratum rate (percent). Map-only
    * filter — no shuffle, no RNG state, trivially resumable; the
    * standard way to rebalance language/source mix in a training
    * corpus.
    */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Int], defaultRate: Int = 100): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate): Column) {
      case (acc, (k, v)) => when(col(stratumCol) === k, v).otherwise(acc)
    }
    docs.withColumn("strat_bucket", sampleBucket(col(idCol)))
      .filter(col("strat_bucket") < rate.cast("long"))
  }

  /** Weighted priority sampling (Duffield–Lund–Thorup): a
    * deterministic size-k weighted-without-replacement sample with
    * per-item Horvitz–Thompson weight estimates — the subsample any
    * weighted corpus statistic (total tokens per source, quality
    * mass) can be estimated from unbiasedly. Each item draws
    * u = ([[idMix]](id)+1)/2³² ∈ (0, 1] and gets priority
    * q = w/u, computed as the integer (w·2³²) div ([[idMix]]+1) —
    * already in WEIGHT units (the 2³² factors cancel), products stay
    * < 2⁶⁰ for any weight the corpus tables carry, and BOTH engines
    * replay the integer division bit-for-bit — no pow/ln call whose
    * rounding could diverge. The k largest priorities are the sample;
    * τ = the (k+1)-th priority (0 when the corpus has ≤ k weighted
    * items, where the sample is exhaustive and no adjustment
    * applies); each survivor's Horvitz–Thompson adjusted weight is
    * max(w, τ) — sum it over the sample to estimate ANY weighted
    * corpus total unbiasedly.
    *
    * Scale shape: priorities are a map-side projection; the global
    * top-(k+1) is TakeOrderedAndProject — a bounded per-partition
    * heap, never a corpus sort — so the driver merges k·partitions
    * rows; τ and the final adjustment run over the checkpointed
    * (k+1)-row sample only (the corpus is scanned exactly once).
    */
  def prioritySample(docs: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val pri = docs.filter(col(weightCol) > 0)
      .select(col(idCol).as("doc_id"),
        col(weightCol).cast("long").as("weight"))
      // weight·2³² must stay inside Long: a weight ≥ 2³¹ would silently
      // wrap and corrupt the sample order, so it fails loudly instead
      // (raise_error, the executor-side analogue of require).
      .withColumn("weight",
        when(col("weight") >= lit(1L << 31), raise_error(concat(
          lit("prioritySample: weight >= 2^31 overflows the priority " +
            "computation: "), col("weight").cast("string"))))
          .otherwise(col("weight")))
      .withColumn("u1", idMix(col("doc_id")) + lit(1L))
      .withColumn("priority", expr("(weight * 4294967296) div u1"))
      .drop("u1")
    // k+1 rows; pinned so the τ aggregate and the final selection
    // share one corpus scan
    val topk1 = pri.orderBy(col("priority").desc, col("doc_id"))
      .limit(k + 1).localCheckpoint()
    val tau = topk1
      .agg(count(lit(1)).as("m"), min("priority").as("mn"))
      .select(when(col("m") === (k + 1).toLong, col("mn"))
        .otherwise(lit(0L)).as("tau"))
    topk1.orderBy(col("priority").desc, col("doc_id")).limit(k)
      .crossJoin(broadcast(tau))
      .withColumn("adj_weight", greatest(col("weight"), col("tau")))
      .select(col("doc_id"), col("weight"), col("priority"),
        col("adj_weight"))
  }

  /** Systematic PPS (probability-proportional-to-size) sampling — the
    * survey-sampling companion of [[prioritySample]] (DLT priority
    * order): lay every positive-weight document on the cumulative
    * weight line in the deterministic (shard, [[idMix]], id) order and
    * take the k evenly-spaced pointers j·W/k — a document is drawn
    * once per pointer inside its weight interval, so
    * n_copies = ⌊k·cum_after/W⌋ − ⌊k·cum_before/W⌋ and
    * Σ n_copies = k EXACTLY (telescoping). Inclusion probability
    * π = min(1, k·w/W) rides along in ppm for Horvitz–Thompson
    * estimation; a mega-weight document (w > W/k) is drawn with
    * multiplicity, which is systematic PPS's correct with-replacement
    * degeneracy, not a bug. All floors are single integer divisions
    * both engines replay.
    *
    * Scale shape: the [[tokenBudgetPack]] two-phase prefix sum — one
    * barrier shuffle on the shard key, shard totals broadcast back,
    * per-shard window cumsum; no global sort, no driver state.
    * Products stay in Long for k·W < 2⁶³ (guarded).
    */
  def systematicPpsSample(docs: DataFrame, idCol: String,
      weightCol: String, k: Int, shards: Int = 64): DataFrame = {
    require(k > 0 && shards > 0)
    val base = Dedup.barrier(
      docs.filter(col(weightCol) > 0)
        .select(col(idCol).as("doc_id"),
          col(weightCol).cast("long").as("weight"))
        .withColumn("ord", idMix(col("doc_id")))
        .withColumn("shard", col("ord") % shards),
      col("shard")).localCheckpoint()
    val wShard = Window.orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    // |shards| rows — the single-partition window is broadcast-sized
    val alloc = base.groupBy("shard").agg(sum("weight").as("__sh_w"))
      .select(col("shard"),
        coalesce(sum("__sh_w").over(wShard), lit(0L)).as("__before"))
    // guard covers every product below: k·cum ≤ k·W and the ppm
    // remainder term (cum mod W)·1e6 < W·1e6 — at a corpus where W
    // approaches 2⁶³/1e6, pre-scale the weight column (div 1024)
    // the guard is folded INTO __W (a pruned side column would never
    // evaluate): every consumer of __W trips it first
    val tot = base.agg(sum("weight").as("__W0"))
      .select(
        when(col("__W0") >= lit(Long.MaxValue / math.max(k, 1000000)),
          raise_error(lit("systematicPpsSample: k*W or W*1e6 overflows " +
            "Long — pre-scale the weight column")).cast("long"))
          .otherwise(col("__W0")).as("__W"))
    val wDoc = Window.partitionBy("shard").orderBy("ord", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(alloc), Seq("shard"))
      .crossJoin(broadcast(tot))
      .withColumn("cum_after", col("__before") + sum("weight").over(wDoc))
      .withColumn("cum_before", col("cum_after") - col("weight"))
      .withColumn("n_copies", expr(
        s"($k * cum_after) div __W - ($k * cum_before) div __W"))
      .filter(col("n_copies") > 0)
      // exact ⌊k·w·1e6/W⌋ without the triple product:
      // = (k·w div W)·1e6 + ((k·w mod W)·1e6) div W
      .withColumn("pi_x1e6", least(lit(1000000L), expr(
        s"(($k * weight) div __W) * 1000000 + " +
          s"((($k * weight) % __W) * 1000000) div __W")))
      .select("doc_id", "weight", "cum_before", "n_copies", "pi_x1e6")
  }

  /** Freshness-weighted systematic PPS sample — the recency-biased
    * replay-buffer draw: each row's weight halves per `halfLifeUs` of
    * age relative to the newest row (weight_x1e6 = 1e6 >> age_halflives,
    * capped at `maxShift` — an exact integer shift, no exp()), then
    * the [[systematicPpsSample]] pointer walk draws k rows with exact
    * Horvitz–Thompson probabilities. Fresh interactions dominate, the
    * tail stays reachable (maxShift ≤ 19 keeps the floored weight
    * ≥ 1; at 20+ the 1e6 fixed point floors to 0 and the tail would
    * vanish), everything replays bit-for-bit.
    *
    * Scale shape: one broadcast max-timestamp scalar + a map-side
    * weight projection on top of the PPS two-phase prefix sum.
    */
  def freshnessSample(events: DataFrame, idCol: String, tsUsCol: String,
      halfLifeUs: Long, k: Int, maxShift: Int = 19): DataFrame = {
    require(halfLifeUs > 0 && maxShift >= 0 && maxShift <= 19,
      s"maxShift must be in [0, 19] so weights stay >= 1, got $maxShift")
    val mx = events.agg(max(col(tsUsCol)).as("__mx"))
    val weighted = events.crossJoin(broadcast(mx))
      .withColumn("__age_hl",
        least(expr(s"(__mx - $tsUsCol) div $halfLifeUs"), lit(maxShift.toLong)))
      .withColumn("freshness_x1e6",
        expr("1000000 div (1 << __age_hl)"))
    systematicPpsSample(weighted, idCol, "freshness_x1e6", k)
  }

  /** Per-domain document cap — the RefinedWeb/Gopher-style host
    * balancing pass: keep at most `cap` documents per domain, chosen
    * by the deterministic full-width id-hash ([[idMix]], the
    * un-bucketed [[sampleBucket]]) so re-running selects the
    * identical subset and no domain's crawl order biases what
    * survives. The survivors carry their within-domain rank.
    *
    * Scale shape: one window whose `rank <= cap` filter Spark rewrites
    * to a WindowGroupLimit — every map partition keeps only its `cap`
    * smallest (hash, id) rows PER DOMAIN before the shuffle, so a
    * mega-domain (the classic skew case: one host owning 1% of a
    * 100 TB crawl) ships ≤ cap·partitions rows to its reducer instead
    * of its whole partition. No corpus-wide sort exists in the plan.
    */
  def domainCap(docs: DataFrame, idCol: String, domainCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    val ord = idMix(col(idCol))
    val w = Window.partitionBy(domainCol).orderBy(col("cap_ord"), col(idCol))
    docs.withColumn("cap_ord", ord)
      .withColumn("domain_rank", row_number().over(w).cast("long"))
      .filter(col("domain_rank") <= cap)
      .drop("cap_ord")
  }

  /** Per-document salient terms by TF-IDF — keyword extraction for
    * corpus exploration and topic-balance analysis. IDF is the linear
    * N/df form so the score (tf·N/df) is two IEEE operations on exact
    * integers — no log, no accumulation — and the DuckDB oracle
    * reproduces it bit-for-bit; ordering ties break on the term text.
    *
    * Scale shape: tokenize/explode map-side; tf is a (doc, term)
    * aggregation, df reuses tf's output (one row per doc-term, so
    * df = COUNT(*) per term — no second pass over the corpus); the
    * 1-row corpus count is a broadcast; top-k per doc is a
    * rank-pushdown window (WindowGroupLimit keeps per-partition
    * heaps, never materializing full per-doc term lists).
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score").desc, col("term"))
    tf.join(df, "term")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * col("n_docs").cast("double") /
          col("df").cast("double"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf", "df", "score")
  }

  /** Deterministic mixture sampling — the "data mixing" pass that
    * down-samples each stratum toward target proportions (e.g. 50%
    * web / 30% code / 20% reference of a `totalTarget`-doc budget).
    * Per-stratum keep-rate = min(1, wₛ·T / nₛ); a doc survives iff
    * full-width id-hash ([[idMix]], the un-bucketed
    * [[sampleBucket]]) falls below rate·2³². Strata without a weight
    * default to 0 and are dropped.
    *
    * Scale shape: stratum counts are one map-side-combinable
    * aggregation; the per-stratum thresholds (a tiny relation) ride a
    * broadcast join back onto the corpus; survival is a map-side
    * filter. No RNG state — re-running yields the identical corpus,
    * and expected stratum sizes concentrate at wₛ·T (hash-uniform
    * over ids). The threshold arithmetic is a fixed left-to-right
    * IEEE sequence replayed verbatim by the DuckDB oracle.
    */
  def mixtureSample(docs: DataFrame, idCol: String, stratumCol: String,
      weights: Map[String, Double], totalTarget: Long): DataFrame = {
    val w = weights.foldLeft(lit(0.0): Column) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    val thresholds = docs.groupBy(stratumCol)
      .agg(count(lit(1)).as("__n"))
      .select(col(stratumCol),
        floor(least(lit(1.0),
          w * lit(totalTarget.toDouble) / col("__n").cast("double"))
          * lit(4294967296.0)).cast("long").as("__thr"))
    val h = idMix(col(idCol))
    docs.join(broadcast(thresholds), Seq(stratumCol))
      .filter(h < col("__thr"))
      .drop("__thr")
  }

  /** Square-root (temperature α = 0.5) rebalancing — the standard
    * multilingual/multi-domain smoothing: keep each stratum's docs at
    * rate min(1, scale/√nₛ), so surviving stratum sizes concentrate
    * at ~scale·√nₛ — giant domains compress hard, small domains pass
    * through whole, relative order preserved. α is FIXED at 0.5
    * because IEEE-754 requires sqrt correctly rounded (both engines
    * agree bit-for-bit) while pow carries no such guarantee — the
    * general-α temperature rate could silently diverge from the
    * oracle in the last ulp right at a threshold boundary.
    *
    * Scale shape: identical to [[mixtureSample]] — one stratum-count
    * aggregation, a tiny broadcast threshold relation, a map-side
    * hash filter. Deterministic: re-running selects the same rows.
    */
  def sqrtTemperatureSample(docs: DataFrame, idCol: String,
      stratumCol: String, scale: Double): DataFrame = {
    require(scale > 0.0, s"scale must be positive, got $scale")
    val thresholds = docs.groupBy(stratumCol)
      .agg(count(lit(1)).as("__n"))
      .select(col(stratumCol),
        floor(least(lit(1.0),
          lit(scale) / sqrt(col("__n").cast("double")))
          * lit(4294967296.0)).cast("long").as("__thr"))
    val h = idMix(col(idCol))
    docs.join(broadcast(thresholds), Seq(stratumCol))
      .filter(h < col("__thr"))
      .drop("__thr")
  }

  /** Multi-epoch upsampling — the data-mixing primitive that REPEATS
    * small high-value sources (the published recipe: a pretraining
    * mix runs curated corpora for several epochs while the web crawl
    * runs once). Each source gets a TOKEN target: the source is
    * replicated for `floor(target / available)` full epochs (capped
    * at `maxEpochs` — the over-repetition guard, since repeating
    * data too many times measurably hurts models), and the remainder
    * becomes one FRACTIONAL epoch whose members are chosen by the
    * shared deterministic id-hash ([[idMix]]) at rate
    * remainder/available — the [[mixtureSample]] arithmetic, so a
    * target below one epoch degrades to plain deterministic
    * downsampling. Sources without a target are dropped. Output is
    * one row per (document, epoch) with the epoch index — the
    * expanded stream a packer/shuffler consumes downstream.
    *
    * Scale shape: per-source available tokens is one map-side-
    * combinable aggregation; the (source, full-epochs, fractional
    * threshold) relation is broadcast back; replication is a map-side
    * `explode(sequence(...))` — each input row expands to its own
    * epochs with no shuffle and no RNG state. The fractional rate is
    * the fixed IEEE sequence FLOOR(LEAST(1, rem/avail)·2³²) both
    * engines evaluate identically.
    */
  def epochUpsample(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, targetTokens: Map[String, Long],
      maxEpochs: Int = 10): DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs must be positive, got $maxEpochs")
    targetTokens.values.foreach(v => require(v >= 0L, "negative token target"))
    val target = targetTokens.foldLeft(lit(0L): Column) {
      case (acc, (k, v)) => when(col(sourceCol) === k, lit(v)).otherwise(acc)
    }
    val stats = docs
      .select(col(sourceCol), TextFunctions.nTokens(col(textCol)).as("__nt"))
      .groupBy(sourceCol).agg(sum("__nt").as("__avail"))
      .withColumn("__target", target)
      .filter(col("__avail") > 0L)
      .withColumn("__full",
        least(lit(maxEpochs.toLong), expr("__target div __avail")))
      .withColumn("__rem",
        when(col("__full") < maxEpochs,
          col("__target") - col("__full") * col("__avail"))
          .otherwise(lit(0L)))
      .withColumn("__thr",
        floor(least(lit(1.0),
          col("__rem").cast("double") / col("__avail").cast("double"))
          * lit(4294967296.0)).cast("long"))
      .select(col(sourceCol), col("__full"), col("__thr"))
    val totalEp = col("__full") + when(col("__thr") > 0L, 1L).otherwise(0L)
    docs.join(broadcast(stats), Seq(sourceCol))
      .withColumn("epoch", explode(
        when(totalEp >= 1L, sequence(lit(1L), totalEp))
          .otherwise(lit(Array.empty[Long]))))
      .filter(col("epoch") <= col("__full") ||
        idMix(col(idCol)) < col("__thr"))
      .select(col(idCol), col(sourceCol), col("epoch"))
  }

  /** Corpus drift report between two snapshots — the dataset-
    * versioning audit a training pipeline runs before switching
    * snapshots: membership churn (added / removed / changed /
    * unchanged documents by id, change = content digest mismatch) and
    * vocabulary drift (distinct-token counts per snapshot, the shared
    * count, and their exact Jaccard at 1e6 fixed point). One row per
    * metric, all BIGINT — the datasheet diff, not a sample.
    *
    * Scale shape: membership is id-keyed digest joins (full-outer on
    * id, shuffles carry 8-byte ids + 32-byte digests, never text);
    * vocabulary is two distinct-token aggs plus a semi-join of the
    * two skinny vocab relations. Nothing quadratic, nothing
    * collected.
    */
  def corpusDrift(prev: DataFrame, cur: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def keyed(df: DataFrame, side: String) =
      df.select(col(idCol).as("doc_id"),
        sha2(col(textCol), 256).as(s"dg_$side"))
    // no barrier: the joined relation feeds exactly ONE global
    // aggregate whose map-side partials collapse each partition to a
    // row — a repartition here would be a pure extra shuffle
    val joined = keyed(prev, "p")
      .join(keyed(cur, "c"), Seq("doc_id"), "full_outer")
    val membership = joined.agg(
      count(col("dg_p")).as("docs_prev"),
      count(col("dg_c")).as("docs_cur"),
      sum(when(col("dg_p").isNull, 1L).otherwise(0L)).as("added"),
      sum(when(col("dg_c").isNull, 1L).otherwise(0L)).as("removed"),
      sum(when(col("dg_p").isNotNull && col("dg_c").isNotNull &&
        col("dg_p") =!= col("dg_c"), 1L).otherwise(0L)).as("changed"),
      sum(when(col("dg_p") === col("dg_c"), 1L).otherwise(0L)).as("unchanged"))
    def vocab(df: DataFrame) = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("term")).distinct()
    val vp = Dedup.barrier(vocab(prev), col("term"))
    val vc = Dedup.barrier(vocab(cur), col("term"))
    val vocabCounts = vp.agg(count(lit(1)).as("vocab_prev"))
      .crossJoin(vc.agg(count(lit(1)).as("vocab_cur")))
      .crossJoin(vp.join(vc, Seq("term"), "left_semi")
        .agg(count(lit(1)).as("vocab_shared")))
      // empty-vs-empty snapshots are identical → Jaccard 1 by
      // convention (a bare div would surface NULL and break the
      // all-BIGINT datasheet contract)
      .withColumn("vocab_jaccard_x1e6",
        when(col("vocab_prev") + col("vocab_cur") - col("vocab_shared") > 0,
          expr("(vocab_shared * 1000000L) div " +
            "(vocab_prev + vocab_cur - vocab_shared)"))
          .otherwise(lit(1000000L)))
    // wide 1-row → long (metric, value) via stack: stays in-plan, no
    // driver collect
    val cols = membership.columns ++ vocabCounts.columns
    membership.crossJoin(vocabCounts).selectExpr(
      s"stack(${cols.length}, " +
        cols.map(c => s"'$c', $c").mkString(", ") +
        ") as (metric, value)")
  }

  /** LEAKAGE-SAFE train/val/test splits — the published failure mode
    * of naive per-document splitting: near-duplicate pairs straddle
    * the train/test boundary and the test set silently leaks into
    * training. Here the split key is the near-dup CLUSTER (connected
    * components over banded MinHash pairs, [[Dedup.connectedComponents]]),
    * so every member of a duplicate cluster lands in the SAME split;
    * singletons key on their own id. Split assignment is the
    * [[assignSplits]] hash arithmetic over the group key — exact,
    * deterministic, oracle-replayable end to end (pairs, components,
    * bucket folds).
    *
    * Scale shape: the pair generation and O(log D) component rounds
    * are the audited t06/t24 plans; the split itself is a map-side
    * hash of the broadcast-joined group key. Expected split fractions
    * hold over CLUSTERS rather than docs (a giant cluster moves
    * wholesale — that is the point).
    *
    * `compOpt` lets consumers over one corpus share one precomputed
    * (node, comp) closure — it is a deterministic function of the
    * corpus, so sharing is oracle-invisible (the centroid-sharing
    * argument).
    */
  def leakageSafeSplits(docs: DataFrame, idCol: String, textCol: String,
      valPct: Int = 10, testPct: Int = 10, n: Int = 3, numPerms: Int = 64,
      bands: Int = 16, threshold: Double = 0.5,
      compOpt: Option[DataFrame] = None): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100)
    val comp = compOpt.getOrElse {
      val pairs = Dedup.minhashLsh(docs, idCol, textCol, n, numPerms,
        bands, threshold).select("id_a", "id_b")
      Dedup.connectedComponents(pairs, "id_a", "id_b")
    }.select(col("node").as(idCol), col("comp").as("__root"))
    docs.join(comp, Seq(idCol), "left")
      .withColumn("group_key", coalesce(col("__root"), col(idCol)))
      .withColumn("split", splitOf(col("group_key"), valPct, testPct))
      .drop("__root")
  }

  /** Group-k-fold cross-validation assignment — [[leakageSafeSplits]]
    * generalized from one (train, val, test) draw to k rotating
    * folds: every document's near-dup CLUSTER (component root, or own
    * id for singletons) lands in fold = [[idMix]](group) mod k, so a
    * cluster moves between folds wholesale and no fold's validation
    * half sees a near-duplicate of another fold's training half — the
    * grouped-CV contract (sklearn's GroupKFold, with deterministic
    * hash assignment instead of ordering).
    *
    * Scale shape: identical to [[leakageSafeSplits]] — the component
    * relation (shared/memoized across the session) left-joins the
    * corpus on id and the fold is one map-side hash.
    */
  def groupKFold(docs: DataFrame, idCol: String, textCol: String, k: Int,
      n: Int = 3, numPerms: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, compOpt: Option[DataFrame] = None): DataFrame = {
    require(k > 1, s"k must be at least 2, got $k")
    val comp = compOpt.getOrElse {
      val pairs = Dedup.minhashLsh(docs, idCol, textCol, n, numPerms,
        bands, threshold).select("id_a", "id_b")
      Dedup.connectedComponents(pairs, "id_a", "id_b")
    }.select(col("node").as(idCol), col("comp").as("__root"))
    docs.join(comp, Seq(idCol), "left")
      .withColumn("group_key", coalesce(col("__root"), col(idCol)))
      .withColumn("fold", idMix(col("group_key")) % k)
      .drop("__root")
  }

  /** SOFT DEDUP — the loss-weighting alternative to dropping
    * near-duplicates: every document stays in the corpus but carries
    * `weight = 1/cluster_size` (1e6 fixed point), so a document
    * duplicated k times contributes the same total training signal
    * as a unique one. The published rationale: hard dedup throws
    * away benign re-hosted copies' context windows entirely, while
    * down-weighting preserves them at de-duplicated effective mass —
    * the trainer multiplies per-example loss by the weight. Clusters
    * are the same banded-MinHash connected components the hard-dedup
    * path uses ([[Dedup.connectedComponents]]); singletons weigh
    * 1e6 (1.0).
    *
    * Scale shape: pair generation and the O(log D) component rounds
    * are the audited t06/t24 plans; cluster sizes are one
    * cluster-keyed aggregation whose output joins back on the same
    * cluster key (both sides arrive partitioned by it — no third
    * shuffle); the weight is a map-side exact floor division.
    */
  def softDedupWeights(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numPerms: Int = 64, bands: Int = 16,
      threshold: Double = 0.5,
      compOpt: Option[DataFrame] = None): DataFrame = {
    val comp = compOpt.getOrElse {
      val pairs = Dedup.minhashLsh(docs, idCol, textCol, n, numPerms,
        bands, threshold).select("id_a", "id_b")
      Dedup.connectedComponents(pairs, "id_a", "id_b")
    }.select(col("node").as(idCol), col("comp").as("__c"))
    val withC = Dedup.barrier(
      docs.select(col(idCol)).join(comp, Seq(idCol), "left")
        .withColumn("cluster_id", coalesce(col("__c"), col(idCol)))
        .drop("__c"),
      col("cluster_id"))
    val sizes = withC.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    withC.join(sizes, "cluster_id")
      .withColumn("weight_x1e6", expr("1000000 div cluster_size"))
      .select(col(idCol), col("cluster_id"), col("cluster_size"),
        col("weight_x1e6"))
  }

  /** Token-budget mixture sampling — the data-recipe primitive "take
    * documents from each source, in a deterministic shuffled order,
    * until that source's TOKEN budget is spent" (training mixtures
    * are token-budgeted, not doc-budgeted; [[mixtureSample]] is the
    * per-document-fraction form). A document is kept iff the running
    * token total up to and including it stays within its source's
    * budget; the first overflowing document and everything after it
    * in the order are dropped — a strict prefix of the sampling
    * order, so the selection is stable as the corpus grows past the
    * budget. Sources absent from `budgets` get budget 0 and drop.
    *
    * Scale design: a per-source running sum as one window is one
    * partition per source — unusable when a source is half the
    * corpus. The sampling order is instead SHARD-MAJOR: docs hash
    * into `shards` sub-shards per source (the same [[idMix]] id-hash
    * as [[mixtureSample]] orders docs within a shard), a
    * tiny (source, shard, tokens) aggregate prefix-sums the shard
    * totals, and each document's corpus-order cumulative is its
    * shard's prefix plus the within-shard running sum — a window
    * partitioned by (source, shard), `shards`-way parallel with
    * bounded partitions. One skinny shuffle of (id, source, tokens)
    * co-locates the shards (and both the shard aggregate and the
    * doc window reuse that partitioning); the shard-prefix relation
    * rides back on a broadcast. The corpus text is never shuffled.
    */
  def tokenBudgetSample(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budgets: Map[String, Long],
      shards: Int = 64): DataFrame = {
    require(shards > 0)
    // materialize the skinny tokenized relation ONCE: both phases
    // (shard totals, per-doc window) must see every row, and exchange
    // reuse between differently-pruned consumers is not something the
    // optimizer guarantees (the join side carries extra not-null
    // predicates and a wider projection than the aggregate side, so
    // the two barrier-exchange copies stop being plan-identical and
    // the corpus would be scanned and tokenized twice). The barrier
    // pins (source, shard) partitioning so the checkpointed relation
    // feeds the per-doc window with no further shuffle; the
    // localCheckpoint holds ~25 B/row — 0.1% of a text corpus — and
    // at cluster scale becomes a checkpoint to reliable storage (same
    // note as [[Dedup.connectedComponents]]).
    val base = Dedup.barrier(
      docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
          TextFunctions.nTokens(col(textCol)).as("n_tokens"))
        .withColumn("ord", idMix(col("doc_id")))
        .withColumn("shard", col("ord") % shards),
      col("source"), col("shard")).localCheckpoint()
    // shard prefix totals: sources × shards rows, broadcast-sized at
    // any corpus scale
    val wShard = Window.partitionBy("source").orderBy("shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val alloc = base.groupBy("source", "shard")
      .agg(sum("n_tokens").as("__sh_tokens"))
      .select(col("source"), col("shard"),
        coalesce(sum("__sh_tokens").over(wShard), lit(0L)).as("__before"))
    val budget = budgets.foldLeft(lit(0L): Column) {
      case (acc, (k, v)) => when(col("source") === k, lit(v)).otherwise(acc)
    }
    val wDoc = Window.partitionBy("source", "shard").orderBy("ord", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(alloc), Seq("source", "shard"))
      .withColumn("cum_tokens", col("__before") + sum("n_tokens").over(wDoc))
      .filter(col("cum_tokens") <= budget)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_tokens"))
  }

  /** Realized split-fraction report for [[leakageSafeSplits]] /
    * [[assignSplits]] output — the audit that makes a skewed draw
    * VISIBLE instead of silent: because split fractions hold over
    * CLUSTERS (a near-dup mega-cluster moves wholesale, by design),
    * the realized per-document fractions can land far from the
    * valPct/testPct targets, and a training run should know before
    * it starts. One row per realized split: document and group
    * counts, exact 1e6-fixed-point document/group fractions, the
    * target fraction, and the absolute document-fraction deviation.
    *
    * Scale shape: one (split, group_key) aggregation collapses the
    * corpus to a |clusters|-sized relation; the 1-row totals ride a
    * broadcast back. All-BIGINT arithmetic the oracle replays.
    */
  def splitFractions(splits: DataFrame, valPct: Int = 10,
      testPct: Int = 10): DataFrame = {
    require(valPct >= 0 && testPct >= 0 && valPct + testPct <= 100)
    import splits.sparkSession.implicits._
    // Left-join the realized counts onto the STATIC split set: a split
    // left entirely empty by a mega-cluster draw — the worst skew this
    // audit exists to surface — must appear with n_docs=0 and dev equal
    // to its full target fraction, not silently vanish from the report.
    val per = Seq("train", "val", "test").toDF("split")
      .join(splits.groupBy("split").agg(
          count(lit(1)).as("__nd"),
          countDistinct(col("group_key")).as("__ng")),
        Seq("split"), "left")
      .select(col("split"),
        coalesce(col("__nd"), lit(0L)).as("n_docs"),
        coalesce(col("__ng"), lit(0L)).as("n_groups"))
    val tot = per.agg(sum("n_docs").as("__td"), sum("n_groups").as("__tg"))
    val target = (when(col("split") === "val", lit(valPct.toLong))
      .when(col("split") === "test", lit(testPct.toLong))
      .otherwise(lit((100 - valPct - testPct).toLong))) * lit(10000L)
    per.crossJoin(broadcast(tot))
      .withColumn("docs_frac_x1e6", expr("n_docs * 1000000 div __td"))
      .withColumn("groups_frac_x1e6", expr("n_groups * 1000000 div __tg"))
      .withColumn("target_frac_x1e6", target)
      .withColumn("dev_x1e6",
        abs(col("docs_frac_x1e6") - col("target_frac_x1e6")))
      .select("split", "n_docs", "n_groups", "docs_frac_x1e6",
        "groups_frac_x1e6", "target_frac_x1e6", "dev_x1e6")
  }

  /** Corpus snapshot diff — the data-versioning audit between two
    * snapshots of one corpus: per document id, `added` (new only),
    * `removed` (old only), `changed` (both, different content) or
    * `unchanged`. Content equality is decided on 256-bit digests so
    * the full-outer join moves ~40 B/row, never text — at 100 TB the
    * diff is the id-keyed shuffle of two digest relations (on a
    * cluster both sides read straight from snapshot manifests).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val o = oldSnap.select(col(idCol).as("doc_id"),
      sha2(col(textCol), 256).as("__ho"))
    val n = newSnap.select(col(idCol).as("doc_id"),
      sha2(col(textCol), 256).as("__hn"))
    o.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("__ho").isNull, lit("added"))
          .when(col("__hn").isNull, lit("removed"))
          .when(col("__ho") =!= col("__hn"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  /** Top-k tokens per group — the per-source vocabulary head a corpus
    * card prints: token counts keyed (group, token), ranked inside
    * each group by (count desc, token). Spark rewrites the rank ≤ k
    * filter to a WindowGroupLimit, so every map partition keeps only
    * its k best rows per group BEFORE the shuffle — no group's full
    * vocabulary ever ships.
    */
  def topTokensPerGroup(docs: DataFrame, textCol: String,
      groupCol: String, k: Int = 3): DataFrame = {
    require(k > 0)
    val counts = docs.select(col(groupCol).as("grp"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("grp", "token").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("grp")
      .orderBy(col("cnt").desc, col("token"))
    counts.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("grp").as("source"), col("rank"), col("token"), col("cnt"))
  }

  /** Distinctive terms per group (corpus-linguistics "keyness", the
    * log-free twin of TF-IDF's selection pressure): the top-k tokens
    * of each source RANKED BY LIFT AGAINST THE REST OF THE CORPUS —
    * share-in-group over share-in-everything-else — not by raw count
    * (raw counts surface the same stopword head everywhere; see
    * [[topTokensPerGroup]] for that read). The rest-of-corpus
    * denominator EXCLUDES the group's own mass, so a source that IS
    * most of the corpus still gets a meaningful contrast. This is
    * the "what is this source actually about" read a mixture
    * designer takes next to [[sourceDivergence]]'s one-number
    * distance — the terms that CAUSE the divergence.
    *
    * Integer-exact: lift_x1e6 = (n_gw·(n_tok−n_g)·1e6) div
    * (n_g·(n_w−n_gw+1)) — one DECIMAL(38,0) floor; the +1 on the
    * rest-count is add-one smoothing on the CONTRAST side only, so a
    * group-exclusive token (n_w = n_gw) ranks finite-and-first
    * instead of dividing by zero; the oracle replays the same +1.
    * Inside n_tok < 1e15 the numerator stays ≤ 1e36 — the same
    * envelope guard as [[collocationLift]], folded into the consumed
    * column so pruning can't skip it.
    *
    * Scale shape: ONE tokenize pass → the (group, token) count
    * relation (map-side combinable, vocab-keyed — never doc-keyed),
    * pinned for its three consumers (group totals, corpus word
    * totals, the scored join); totals ride back as broadcasts; the
    * minCount heavy-hitter cut bounds the ranked relation and the
    * per-group top-k realizes as a WindowGroupLimit (partitions
    * pre-prune before the rank shuffle).
    */
  def keynessTerms(docs: DataFrame, textCol: String, groupCol: String,
      minCount: Long = 5L, k: Int = 5): DataFrame = {
    require(minCount >= 1 && k > 0)
    val gw = Dedup.barrier(
      docs.select(col(groupCol).as("source"),
          explode(TextFunctions.tokens(col(textCol))).as("token"))
        .groupBy("source", "token").agg(count(lit(1)).as("n_gw")),
      col("source"), col("token")).localCheckpoint()
    val grpTot = gw.groupBy("source").agg(sum("n_gw").as("n_g"))
    val wordTot = gw.groupBy("token").agg(sum("n_gw").as("n_w"))
    val tot = grpTot.agg(sum("n_g").as("n_tok"))
    val scored = gw.filter(col("n_gw") >= minCount)
      .join(broadcast(grpTot), "source")
      .join(wordTot, "token")
      .crossJoin(broadcast(tot))
      .withColumn("n_tok", expr(
        "CASE WHEN n_tok >= 1000000000000000" +
          " THEN CAST(raise_error('keynessTerms: corpus outside the" +
          " integer-exact envelope (n_tok >= 1e15)') AS BIGINT)" +
          " ELSE n_tok END"))
      .withColumn("lift_x1e6", expr(
        "CAST((CAST(n_gw AS DECIMAL(38,0)) * (n_tok - n_g) * 1000000)" +
          " div (CAST(n_g AS DECIMAL(38,0)) * (n_w - n_gw + 1)) AS LONG)"))
    val w = Window.partitionBy("source")
      .orderBy(col("lift_x1e6").desc, col("token"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("source", "rank", "token", "n_gw", "n_w", "lift_x1e6")
  }

  /** Zipf head-mass curve — how much of the token stream the top-k
    * vocabulary covers, for k on a ladder (10, 100, 1000, …): the
    * read that sizes a vocabulary or a stop-list (English-like
    * corpora put ~40–50% of mass in the top 100). Exact integers:
    * token counts, the (cnt desc, token) head via a BOUNDED top-max(k)
    * (TakeOrderedAndProject per-partition heaps — never a vocabulary
    * sort), cumulative mass per ladder step, ppm floors.
    */
  def vocabMassCurve(docs: DataFrame, textCol: String,
      ks: Seq[Int] = Seq(10, 100, 1000)): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ > 0) && ks == ks.sorted)
    val counts = docs.select(
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum("cnt").as("n_tok"),
      count(lit(1)).as("n_vocab"))
    // bounded head, two consumers (one per ladder step family) — pin
    val head = counts.orderBy(col("cnt").desc, col("w")).limit(ks.max)
      .localCheckpoint()
    val w = Window.orderBy(col("cnt").desc, col("w"))
    val ranked = head.withColumn("r", row_number().over(w))
    val steps = ks.map { k =>
      ranked.filter(col("r") <= k)
        .agg(lit(k.toLong).as("k"), sum("cnt").as("head_mass"))
    }.reduce(_ unionByName _)
    steps.crossJoin(broadcast(tot))
      .select(col("k"), col("head_mass"), col("n_tok"), col("n_vocab"),
        expr("(head_mass * 1000000) div greatest(n_tok, 1)")
          .as("mass_ppm"))
  }

  /** Join-key skew diagnostics — the report to read BEFORE a big
    * shuffle melts one reducer: the `topK` heaviest keys of a
    * relation with their row counts, corpus share in ppm, and the
    * SUGGESTED SALT FACTOR ⌈cnt·partitions/n_rows⌉ — the number of
    * salt buckets that brings that key's per-bucket load down to the
    * average partition's (1 = no salting needed). AQE's skew-join
    * handles sort-merge joins at runtime; this is the planning-time
    * read for aggregations, windows, and broadcast decisions AQE
    * can't rewrite.
    *
    * Scale shape: one map-side-combinable count aggregation, a
    * bounded top-k (TakeOrdered per-partition heaps, never a key-space
    * sort), and broadcast 1-row totals. All integer ceilings.
    */
  def keySkewReport(df: DataFrame, keyCol: String, topK: Int = 10,
      partitions: Int = 32): DataFrame = {
    require(topK > 0 && partitions > 0)
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum("cnt").as("n_rows"),
      count(lit(1)).as("n_keys"))
    val top = counts.orderBy(col("cnt").desc, col("key")).limit(topK)
      .localCheckpoint()
    val w = Window.orderBy(col("cnt").desc, col("key"))
    top.crossJoin(broadcast(tot))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("share_ppm", expr("(cnt * 1000000) div n_rows"))
      .withColumn("suggested_salt", expr(
        s"greatest(1, (cnt * $partitions + n_rows - 1) div n_rows)"))
      .select("rank", "key", "cnt", "n_rows", "n_keys", "share_ppm",
        "suggested_salt")
  }

  /** Near-dup cluster-size histogram — the dedup landscape in one
    * relation: for each cluster size (1 = the unclustered singletons),
    * how many clusters exist, how many documents they hold, and that
    * mass in ppm of the corpus. The first thing to read before
    * choosing soft-dedup weights or a per-cluster cap: one mega-
    * cluster at 30% corpus mass and a long singleton tail ask for
    * different interventions than uniform pair-duplication.
    *
    * Scale shape: the component relation (duplicate-set-sized)
    * collapses to per-cluster sizes, then to the |distinct sizes|
    * histogram; the corpus contributes only its count (broadcast 1-row)
    * for the singleton row and the ppm denominators.
    */
  def clusterSizeHistogram(docs: DataFrame, idCol: String,
      comp: DataFrame): DataFrame = {
    val sizes = comp.groupBy("comp").agg(count(lit(1)).as("sz"))
    val hist = sizes.groupBy("sz").agg(count(lit(1)).as("n_clusters"))
    val nTotal = docs.agg(count(lit(1)).as("__n"))
    val nClustered = sizes.agg(coalesce(sum("sz"), lit(0L)).as("__c"))
    val singletons = nTotal.crossJoin(broadcast(nClustered))
      .select(lit(1L).as("sz"), (col("__n") - col("__c")).as("n_clusters"))
      .filter(col("n_clusters") > 0)
    hist.select(col("sz").cast("long").as("sz"), col("n_clusters"))
      .unionByName(singletons)
      .crossJoin(broadcast(nTotal))
      .select(col("sz").as("cluster_size"), col("n_clusters"),
        (col("sz") * col("n_clusters")).as("n_docs"),
        expr("(sz * n_clusters * 1000000) div greatest(__n, 1)")
          .as("docs_ppm"))
  }

  /** Split × source representativeness audit — does every split see
    * every source at the corpus's own mix? One row per (split,
    * source) CELL of the static {train,val,test} × realized-source
    * cross (empty cells surface with n_docs = 0 — the [[splitFractions]]
    * lesson applied to the contingency table): the cell count, both
    * marginals, the expected per-source fraction (= the split's
    * overall document share) and the realized one, and their absolute
    * ppm deviation — all single integer floors.
    *
    * Scale shape: the corpus collapses to the (split, source) cell
    * relation first (one map-side-combinable aggregation); marginals,
    * the static cross, and the deviation arithmetic all run on the
    * |splits|·|sources| relation with broadcast joins.
    */
  def splitSourceBalance(splits: DataFrame, docs: DataFrame,
      idCol: String, sourceCol: String): DataFrame = {
    import docs.sparkSession.implicits._
    val d = docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"))
    val cell0 = splits.select(col("doc_id"), col("split"))
      .join(d, "doc_id")
      .groupBy("split", "source").agg(count(lit(1)).as("__n"))
      // |splits|·|sources| rows, five consumers — pinned
      .localCheckpoint()
    val cross = Seq("train", "val", "test").toDF("split")
      .crossJoin(cell0.select("source").distinct())
    val cell = cross.join(cell0, Seq("split", "source"), "left")
      .select(col("split"), col("source"),
        coalesce(col("__n"), lit(0L)).as("n_docs"))
    val bySrc = cell.groupBy("source").agg(sum("n_docs").as("source_total"))
    val bySplit = cell.groupBy("split").agg(sum("n_docs").as("split_total"))
    val tot = cell.agg(sum("n_docs").as("n_total"))
    cell.join(broadcast(bySrc), "source")
      .join(broadcast(bySplit), "split")
      .crossJoin(broadcast(tot))
      .withColumn("expected_x1e6",
        expr("(split_total * 1000000) div n_total"))
      .withColumn("actual_x1e6",
        expr("(n_docs * 1000000) div greatest(source_total, 1)"))
      .withColumn("dev_x1e6", abs(col("actual_x1e6") - col("expected_x1e6")))
      .select("split", "source", "n_docs", "source_total", "split_total",
        "expected_x1e6", "actual_x1e6", "dev_x1e6")
  }

  /** Per-source n-gram NOVELTY of a new snapshot against a reference
    * corpus — the "is this crawl bringing anything new" audit that
    * complements [[snapshotDiff]] (doc-level churn) and
    * [[sourceDivergence]] (distribution distance) with content-level
    * freshness: for each source in the new snapshot, its distinct
    * n-gram vocabulary, how many of those grams the reference has
    * NEVER seen, and the novelty in exact ppm. A mixture designer
    * cuts re-crawls whose novelty reads near zero before any dedup
    * pass spends compute on them.
    *
    * Scale shape: each side tokenizes once; membership moves as
    * fnv64 longs keyed on the gram hash (the t04/t83
    * collision-freedom discipline — the oracle joins gram TEXT, so a
    * collision would fail the gate); one left join + one source
    * collapse. Output is |sources| rows.
    */
  def gramNovelty(reference: DataFrame, newDocs: DataFrame,
      textCol: String, sourceCol: String, n: Int = 3): DataFrame = {
    require(n > 0)
    GraftFunctions.register(newDocs.sparkSession)
    val ov = reference
      .select(explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(call_function("fnv64", col("g")).as("h")).distinct()
      .withColumn("__old", lit(1))
    val nv = newDocs.select(col(sourceCol).as("source"),
        explode(Dedup.shingles(col(textCol), n)).as("g"))
      .select(col("source"), call_function("fnv64", col("g")).as("h"))
      .distinct()
    nv.join(ov, Seq("h"), "left")
      .groupBy("source").agg(count(lit(1)).as("n_grams"),
        sum(when(col("__old").isNull, 1L).otherwise(0L)).as("n_novel"))
      .select(col("source"), col("n_grams"), col("n_novel"),
        expr("(n_novel * 1000000) div n_grams").as("novelty_ppm"))
  }

  /** Naive-split near-dup leakage audit — the measurement that
    * MOTIVATES [[leakageSafeSplits]]: assign the cluster-blind
    * per-document hash split ([[assignSplits]] — the split a pipeline
    * without dedup awareness ships), confirm near-dup pairs at the
    * family parameters, and count pairs per canonical
    * (split_a ≤ split_b) cell with a leaked flag and the exact ppm
    * share. Every off-diagonal pair is an eval example whose
    * near-twin is trainable — the contamination number a curation
    * review asks for FIRST, before the cluster-aware splitter is
    * adopted (diagonal cells are ordinary in-split duplication,
    * dedup's job, not leakage).
    *
    * Scale shape: pairs come from the shared LSH front end (pass
    * `candOpt` — zero extra corpus scans in-session); the split
    * assignment is one map-side hash joined onto pair endpoints by
    * id; the cell relation is ≤ |splits|² rows, pinned once for its
    * two consumers (cells + the 1-row total that rides back as a
    * broadcast).
    */
  def splitLeakage(docs: DataFrame, idCol: String, textCol: String,
      valPct: Int = 10, testPct: Int = 10, n: Int = 3, numPerms: Int = 64,
      bands: Int = 16, threshold: Double = 0.5,
      candOpt: Option[Dedup.LshCandidates] = None): DataFrame = {
    val pairs = Dedup.minhashLsh(docs, idCol, textCol, n, numPerms,
      bands, threshold, candOpt = candOpt).select("id_a", "id_b")
    val sp = assignSplits(docs, idCol, valPct, testPct)
      .select(col("doc_id"), col("split"))
    leakageCells(pairs, sp)
  }

  /** The (split_a ≤ split_b) cell collapse shared by [[splitLeakage]]
    * (text near-dups) and [[semanticSplitLeakage]] (embedding
    * near-dups) — one arithmetic, two confirmation channels.
    */
  private def leakageCells(pairs: DataFrame, sp: DataFrame): DataFrame = {
    val cells = pairs
      .join(sp.select(col("doc_id").as("id_a"), col("split").as("sa")), "id_a")
      .join(sp.select(col("doc_id").as("id_b"), col("split").as("sb")), "id_b")
      .select(least(col("sa"), col("sb")).as("split_a"),
        greatest(col("sa"), col("sb")).as("split_b"))
      .groupBy("split_a", "split_b").agg(count(lit(1)).as("n_pairs"))
      .localCheckpoint()
    val tot = cells.agg(sum("n_pairs").as("n_total"))
    cells.crossJoin(broadcast(tot))
      .select(col("split_a"), col("split_b"), col("n_pairs"),
        (col("split_a") =!= col("split_b")).as("leaked"),
        expr("(n_pairs * 1000000) div n_total").as("share_ppm"))
  }

  /** SEMANTIC split-leakage audit — the embedding twin of
    * [[splitLeakage]]: eval contamination through paraphrase and
    * re-encoding, which a text-level MinHash structurally cannot see
    * (SemDeDup's motivating case), measured as cosine-near-dup pairs
    * (sign-LSH buckets at the data-sized plane count, exact cosine
    * verify at `threshold`) landing in canonical (split_a ≤ split_b)
    * cells under the SAME cluster-blind hash split t137 audits. Read
    * both: text leakage says "the eval set has verbatim twins in
    * train"; semantic leakage says "the eval set is paraphrased in
    * train" — the second number is the one embedding-model and
    * LLM-eval owners actually fear.
    *
    * Scale shape: pair generation is the t13 bucketed plan (per-bucket
    * joins, never all-pairs); the split lookup is two id equi-joins;
    * the cell relation is ≤ |splits|² rows, pinned for its two
    * consumers.
    */
  def semanticSplitLeakage(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.5, valPct: Int = 10,
      testPct: Int = 10): DataFrame = {
    val pairs = Similarity.lshNearDupPairsAuto(emb, idCol, vecCol,
      threshold).select("id_a", "id_b")
    leakageCells(pairs,
      assignSplits(emb, idCol, valPct, testPct)
        .select(col("doc_id"), col("split")))
  }

  /** Cross-source near-dup attribution matrix — WHO copies WHOM, at
    * confirmed-pair granularity: every near-dup pair (the family LSH
    * parameters) lands in its canonical (source_a ≤ source_b) cell
    * with the pair count and each cell's ppm share — the
    * syndication/mirror map a mixture designer reads next to the
    * KMV vocabulary overlap ([[kmvGroupOverlap]] says "these sources
    * SOUND alike"; this says "these sources share literal documents",
    * pair-confirmed). Off-diagonal mass is cross-source duplication —
    * the mass dedup transfers between sources; diagonal mass is
    * in-source templating.
    *
    * Scale shape: pairs ride the shared LSH front end (`candOpt`);
    * the source lookup is two id equi-joins of a two-column
    * projection; the cell relation is ≤ |sources|² rows, pinned for
    * its two consumers.
    */
  def sourceOverlapPairs(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, n: Int = 3, numPerms: Int = 64, bands: Int = 16,
      threshold: Double = 0.5,
      candOpt: Option[Dedup.LshCandidates] = None): DataFrame = {
    val pairs = Dedup.minhashLsh(docs, idCol, textCol, n, numPerms,
      bands, threshold, candOpt = candOpt).select("id_a", "id_b")
    val src = docs.select(col(idCol).as("doc_id"),
      col(sourceCol).as("source"))
    val cells = pairs
      .join(src.select(col("doc_id").as("id_a"), col("source").as("sa")),
        "id_a")
      .join(src.select(col("doc_id").as("id_b"), col("source").as("sb")),
        "id_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_pairs"))
      .localCheckpoint()
    val tot = cells.agg(sum("n_pairs").as("n_total"))
    cells.crossJoin(broadcast(tot))
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        (col("source_a") =!= col("source_b")).as("cross_source"),
        expr("(n_pairs * 1000000) div n_total").as("share_ppm"))
  }

  /** Exact token-budget sharding — the packing pass an SFT/pretrain
    * exporter runs to cut a corpus into fixed-token shards: every
    * document gets the EXACT corpus-wide running token count before
    * it (doc_id order), its shard = cum_before div budget, its offset
    * inside the shard, and a spans_boundary flag (the documents a
    * sequence packer must split or pad around).
    *
    * The global running sum is the scale hazard here — a naive
    * `Window.orderBy(doc_id)` serializes the corpus through ONE task.
    * This is the classic two-phase scan instead: doc_ids bucket by
    * `span`, the within-bucket running sums ride a PARTITIONED window
    * (parallel), and only the per-bucket totals — |docs|/span rows,
    * the compressed-histogram discipline [[quantileNormalize]]
    * argues — pass through the small ordered window before riding
    * back as a broadcast. Exactness is unchanged: offset(bucket) +
    * local running sum IS the global prefix sum. Pick `span` ~
    * sqrt(|docs|) at the extreme; the default keeps the bucket
    * relation thousands of times smaller than the corpus.
    *
    * Contract: doc_id must be non-negative (integer `div`/`%` versus
    * the oracle's floor division diverge below zero — same note as
    * every ppm floor here).
    */
  def tokenBudgetShards(docs: DataFrame, idCol: String, textCol: String,
      budget: Long, span: Long = 4096L): DataFrame = {
    require(budget > 0 && span > 0)
    // barrier on bucket: the slim (doc_id, n_tokens, bucket) relation
    // feeds TWO consumers (within-bucket windows + bucket totals) —
    // the shared exchange means one corpus scan/tokenize, and both
    // consumers need exactly this partitioning anyway
    // the isNotNull pre-filter is load-bearing: the offsets join later
    // INFERS isnotnull(bucket) on one consumer of the barrier exchange
    // and not the other, which breaks canonical equality and costs a
    // second corpus scan+tokenize; filtering here makes both exchange
    // children identical so the stage (and the scan) is reused
    val base = Dedup.barrier(
      docs.select(col(idCol).as("doc_id"),
          TextFunctions.nTokens(col(textCol)).as("n_tokens"))
        // negative ids would make div (truncating) and the oracle's
        // floor division silently disagree on the bucket — enforce
        // the documented non-negative contract loudly instead
        .withColumn("bucket", when(col("doc_id") < 0L,
          raise_error(lit("tokenBudgetShards: doc ids must be" +
            " non-negative")).cast("long"))
          .otherwise(expr(s"doc_id div $span")))
        .filter(col("bucket").isNotNull),
      col("bucket"))
    val wIn = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = base.withColumn("cum_local",
      coalesce(sum("n_tokens").over(wIn), lit(0L)))
    val wB = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    // bucket totals derive from the WINDOWED relation (last running
    // sum + its row), not from a second aggregate over the scan — a
    // partial-agg pushdown below the shuffle gives that aggregate a
    // DIFFERENT exchange child and defeats exchange reuse, costing a
    // second corpus scan+tokenize; this way both consumers sit above
    // the one barrier exchange and the scan runs once
    val offsets = local
      .groupBy("bucket")
      .agg(max(col("cum_local") + col("n_tokens")).as("__bt"))
      .withColumn("bucket_offset", coalesce(sum("__bt").over(wB), lit(0L)))
      .select(col("bucket"), col("bucket_offset"))
    local.join(broadcast(offsets), "bucket")
      .withColumn("cum_before", col("bucket_offset") + col("cum_local"))
      .select(col("doc_id"), col("n_tokens"), col("cum_before"),
        expr(s"cum_before div $budget").as("shard"),
        expr(s"cum_before % $budget").as("offset_in_shard"),
        (expr(s"cum_before % $budget") + col("n_tokens") > budget)
          .as("spans_boundary"))
  }

  /** Dedup survivorship by source — which sources is near-dup dedup
    * gutting? Joins the corpus against a canonical-election relation
    * ([[canonicalSelect]]'s output: clustered docs with their
    * `canonical` flag): a document survives iff it is unclustered or
    * its cluster's canonical. Per source: totals, clustered count,
    * survivors, and the exact ppm survival rate — the audit a mixture
    * designer reads before re-weighting, because templated sources
    * lose most of their mass to dedup while organic ones keep it.
    *
    * Scale shape: one id equi-join of the corpus projection against
    * the (duplicate-set-sized) canonical relation, then one source
    * aggregation; rides the session's memoized component closure at
    * the query layer, so no new LSH pass.
    */
  def dedupSurvivorship(docs: DataFrame, idCol: String,
      sourceCol: String, canonical: DataFrame): DataFrame = {
    val c = canonical.select(col("doc_id"), col("canonical"))
    docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"))
      .join(c, Seq("doc_id"), "left")
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("canonical").isNotNull, 1L).otherwise(0L))
          .as("n_clustered"),
        sum(when(col("canonical").isNull || col("canonical"), 1L)
          .otherwise(0L)).as("n_survivors"))
      .withColumn("survival_x1e6",
        expr("(n_survivors * 1000000) div greatest(n_docs, 1)"))
  }

  /** Language-metadata agreement matrix — is the `lang` COLUMN
    * trustworthy? Crawled corpora carry declared languages (HTTP
    * headers, HTML lang attributes, upstream tags) that routinely
    * disagree with the text; a mixture designed on the column when
    * the content says otherwise mislabels training data wholesale.
    * Cells are (declared, predicted-by-[[graft.functions.TextFunctions.langId]])
    * with counts and row-normalized ppm — the confusion matrix whose
    * off-diagonal mass is the metadata-error rate, per declared
    * language (a single disagreement NUMBER would hide which label
    * is rotten).
    *
    * Scale shape: map-only prediction, one |langs|²-cell aggregation,
    * broadcast row totals.
    */
  def langAgreement(docs: DataFrame, textCol: String,
      langCol: String): DataFrame = {
    val cells = docs.select(col(langCol).as("declared"),
        TextFunctions.langId(col(textCol)).as("predicted"))
      .groupBy("declared", "predicted").agg(count(lit(1)).as("n_docs"))
      .localCheckpoint()
    val rows = cells.groupBy("declared").agg(sum("n_docs").as("__row"))
    cells.join(broadcast(rows), "declared")
      .select(col("declared"), col("predicted"), col("n_docs"),
        (col("declared") === col("predicted")).as("agree"),
        expr("(n_docs * 1000000) div __row").as("row_ppm"))
  }

  /** Effective token budget per source AFTER dedup — the number a
    * mixture designer actually plans against: raw token counts
    * overstate a source exactly by its duplication, so per source
    * this reports raw docs/tokens, canonical survivors, the tokens
    * THEY carry, and the effective ratio in exact ppm. Reads next to
    * [[dedupSurvivorship]] (doc-level survival) with the budget
    * stated in the unit that matters — tokens.
    *
    * Scale shape: one corpus pass (token count is a map-only size()),
    * one left equi-join onto the canonical election (pass the shared
    * session memo — zero extra LSH work in-session), one source
    * collapse.
    */
  def effectiveTokens(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, canonical: DataFrame): DataFrame = {
    val c = canonical.select(col("doc_id"), col("canonical"))
    docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        size(TextFunctions.tokens(col(textCol))).cast("long")
          .as("n_tokens"))
      .join(c, Seq("doc_id"), "left")
      .groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("raw_tokens"),
        sum(when(col("canonical").isNull || col("canonical"), 1L)
          .otherwise(0L)).as("n_survivors"),
        sum(when(col("canonical").isNull || col("canonical"),
          col("n_tokens")).otherwise(0L)).as("effective_tokens"))
      .withColumn("effective_x1e6",
        expr("(effective_tokens * 1000000) div greatest(raw_tokens, 1)"))
  }

  /** Per-stage attrition of [[curationRecipe]], read from `observe`
    * accumulators populated by the materializing actions (no
    * per-stage count() jobs re-running pipeline prefixes).
    */
  final case class RecipeReport(input: Long, afterDedup: Long,
      afterCap: Long, afterTemperature: Long, afterBudget: Long,
      trainDocs: Long)

  /** The built recipe: run one action on `curated` (a write at
    * 100 TB; count() in tests), then read `report()`.
    */
  final class RecipeStaged private[CorpusOps] (
      val curated: DataFrame, mkReport: () => RecipeReport) {
    def report(): RecipeReport = mkReport()
  }

  /** END-TO-END GOVERNANCE RECIPE — the dataset-curation tier
    * composed as one declarative dataflow, one level above
    * [[Curation]]'s content-quality tier:
    *
    *   1. normalized exact dedup ([[Dedup.normalizedExact]]) — one
    *      canonical copy per case/punctuation/whitespace-equivalent
    *      text;
    *   2. leakage-safe splits ([[leakageSafeSplits]]) — near-dup
    *      clusters assigned to train/val/test wholesale;
    *   3. per-domain cap ([[domainCap]]) — host balancing, computed
    *      across splits so the cap choice cannot depend on the split
    *      draw;
    *   4. √-temperature rebalancing ([[sqrtTemperatureSample]]);
    *   5. per-domain token budgets ([[tokenBudgetSample]]);
    *   6. curriculum ordering of the surviving TRAIN split
    *      ([[curriculumOrder]] — scores/bins computed over train
    *      survivors only, the set the trainer will actually stream).
    *
    * Output: one row per surviving document — id, domain, split,
    * within-domain rank, token count, cumulative budget position, and
    * (train docs only, else null) the curriculum order index.
    *
    * Scale shape: each stage family reads the corpus text ONCE — the
    * three stage boundaries where a relation feeds two downstream
    * consumers (the deduped corpus: pair generation + the split join;
    * the tempered corpus: the token-budget window + the final join;
    * the budget survivors: curriculum scoring + the output join) are
    * pinned with localCheckpoint, so no stage's lineage ever re-runs
    * an upstream tokenize (at cluster scale these become checkpoints
    * to reliable storage, the [[Dedup.connectedComponents]] note; the
    * checkpointed relations are the post-attrition survivors, a small
    * fraction of corpus bytes). The final action reads only
    * checkpointed intermediates — RecipeSpec locks the no-rescan
    * shape. Stage counts ride CollectMetrics accumulators on the
    * same actions.
    */
  def curationRecipe(docs: DataFrame, idCol: String, textCol: String,
      domainCol: String, valPct: Int = 10, testPct: Int = 10,
      n: Int = 3, numPerms: Int = 64, bands: Int = 16,
      threshold: Double = 0.5, cap: Int = 20, tempScale: Double = 4.0,
      budgets: Map[String, Long] = Map.empty, shards: Int = 8,
      nBins: Int = 4, bucketBits: Int = 6): RecipeStaged = {
    import org.apache.spark.sql.Observation
    val obsInput = Observation()
    val obsDedup = Observation()
    val obsCap = Observation()
    val obsTemp = Observation()
    val obsBudget = Observation()
    val obsTrain = Observation()
    def counted(df: DataFrame, obs: Observation): DataFrame =
      df.observe(obs, count(lit(1)).as("n"))

    // stage 1: dedup. The barrier makes the two normalizedExact
    // consumers (digest groupBy + semi-join left) reuse one exchange
    // (the Curation pattern), so obsInput counts once; the
    // localCheckpoint pins the deduped survivors for stage 2's two
    // consumers (minhash pair generation runs EAGERLY inside the
    // connected-components fixed point; the split join runs in the
    // final action) without re-running the dedup lineage.
    val base = Dedup.barrier(counted(docs, obsInput), col(idCol))
    val deduped = counted(
      Dedup.normalizedExact(base, idCol, textCol), obsDedup)
      .localCheckpoint()
    // stages 2-4: splits, cap, temperature. The capped relation is
    // bounded at cap·|domains| rows, so its checkpoint is trivially
    // small — and it pins the two sqrtTemperatureSample consumers
    // (stratum-count aggregate + threshold join) to one execution,
    // keeping obsCap single-counted.
    val split = leakageSafeSplits(deduped, idCol, textCol, valPct,
      testPct, n, numPerms, bands, threshold)
    val capped = counted(domainCap(split, idCol, domainCol, cap), obsCap)
      .localCheckpoint()
    val tempered = counted(
      sqrtTemperatureSample(capped, idCol, domainCol, tempScale), obsTemp)
      .localCheckpoint()
    // stage 5: token budget — the skinny survivor set joins back onto
    // the checkpointed tempered relation to recover split/text
    val kept = tokenBudgetSample(tempered, idCol, textCol, domainCol,
        budgets, shards)
      .select(col("doc_id").as(idCol), col("n_tokens"), col("cum_tokens"))
    val sel = counted(tempered.join(kept, Seq(idCol)), obsBudget)
      .localCheckpoint()
    // stage 6: curriculum over the train split only. obsTrain rides
    // the ORDERED relation (one row per train doc), which occurs
    // exactly once in the final plan — the train filter branch itself
    // feeds curriculum scoring through two aggregate consumers, where
    // an accumulator could double-count under failed exchange reuse.
    val train = sel.filter(col("split") === "train")
    val ordered = counted(
      curriculumOrder(train, idCol, textCol, nBins, bucketBits)
        .select(col("doc_id").as(idCol), col("order_idx")), obsTrain)
    val out = sel.join(ordered, Seq(idCol), "left")
      .select(col(idCol), col(domainCol), col("split"), col("domain_rank"),
        col("n_tokens"), col("cum_tokens"), col("order_idx"))
    new RecipeStaged(out, () => {
      def nOf(obs: Observation): Long = obs.get.get("n") match {
        case Some(v) => v.asInstanceOf[Long]
        case None => throw new IllegalStateException(
          "recipe observation produced no metrics: its stage never " +
            "executed in any materializing action")
      }
      // an empty train split lets the outer join's right subtree be
      // rewritten away wholesale; the only count that branch could
      // have contributed is 0 (the Curation nOrZero convention)
      val trainDocs = obsTrain.get.getOrElse("n", 0L).asInstanceOf[Long]
      RecipeReport(nOf(obsInput), nOf(obsDedup), nOf(obsCap),
        nOf(obsTemp), nOf(obsBudget), trainDocs)
    })
  }

  // ---------------------------------------------------------------
  // Sequence packing
  // ---------------------------------------------------------------

  /** Greedy concat-then-chunk sequence packing: documents are
    * concatenated in id order within a shard and cut into
    * `budget`-token training sequences (the standard packing used to
    * fill fixed-length context windows). Each document gets the
    * sequence number and token offset where it starts.
    *
    * Scale design: the running token sum is a window partitioned by
    * `shards` deterministic shards — NEVER a global ordering. A shard
    * is one worker's packing stream; at cluster scale `shards` is
    * O(cores) so every window partition is 1/shards of the corpus and
    * the shuffle carries (id, n_tokens) pairs only. Integer `div`/`%`
    * keep the arithmetic exact in both engines.
    */
  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, shards: Int): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol).as("doc_id"),
        (col(idCol) % shards).cast("long").as("shard"),
        TextFunctions.nTokens(col(textCol)).as("n_tokens"))
      .withColumn("start_tok", sum("n_tokens").over(w) - col("n_tokens"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        expr(s"start_tok div $budget").as("seq_no"),
        (col("start_tok") % budget).as("seq_offset"))
  }

  /** Packing-efficiency audit over [[packSequences]] — the report a
    * pipeline owner reads before burning GPU-hours on a packed
    * corpus: per shard, how many fixed-`budget` sequences the concat
    * stream cuts, the padding wasted in each shard's final partial
    * sequence, how many documents straddle a sequence boundary (and
    * the total number of boundary crossings — a long document can
    * straddle several), and the realized fill rate in parts-per-
    * million (integer, so both engines agree bit-for-bit).
    *
    * Scale shape: one per-shard aggregation over the packing
    * projection, partitioned on the same `shard` key the packing
    * window already hash-distributed — Catalyst reuses that exchange,
    * so the audit adds NO new shuffle; every derived column is
    * arithmetic over the shard totals. The crossing count guards the
    * n_tokens=0 row with greatest(n_tokens,1) so the dividend stays
    * non-negative — Spark's `div` truncates toward zero while
    * DuckDB's `//` floors, and they only agree on non-negative
    * operands.
    */
  def packingReport(docs: DataFrame, idCol: String, textCol: String,
      budget: Int, shards: Int): DataFrame = {
    packSequences(docs, idCol, textCol, budget, shards)
      .groupBy("shard").agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        sum(when(col("seq_offset") + col("n_tokens") > budget, 1L)
          .otherwise(0L)).as("split_docs"),
        sum(expr(
          s"(seq_offset + greatest(n_tokens, 1) - 1) div $budget"))
          .as("boundary_crossings"))
      .withColumn("n_seqs",
        expr(s"(total_tokens + ${budget - 1}) div $budget"))
      .withColumn("pad_tokens",
        col("n_seqs") * budget - col("total_tokens"))
      .withColumn("fill_ppm",
        when(col("n_seqs") > 0,
          expr(s"(total_tokens * 1000000) div (n_seqs * $budget)"))
          .otherwise(lit(1000000L)))
      .select(col("shard"), col("n_docs"), col("total_tokens"),
        col("n_seqs"), col("pad_tokens"), col("split_docs"),
        col("boundary_crossings"), col("fill_ppm"))
  }

  /** Length-bucketed batching — the padding-minimizing batch
    * assembly used for SFT / eval serving, where sequences are NOT
    * concatenated (each document is its own example padded to its
    * batch's max): within a deterministic shard, documents sort by
    * (token length, id) and consecutive runs of `batchSize` form a
    * batch, so every batch holds near-equal lengths and pays
    * max−len padding only inside a run. Output: one row per document
    * with its batch, the batch's max length, and the padding the
    * document costs — Σ pad_tokens is the figure the naive id-order
    * batching is judged against.
    *
    * Scale shape: both windows partition on `shard` (O(cores)
    * deterministic shards, each 1/shards of the corpus — never a
    * global sort): ranking shuffles (id, n_tokens) pairs once, and
    * the per-(shard, batch) max is a partial-aggregable second
    * window over the SAME distribution (batch is a prefix-function
    * of the rank), so Catalyst plans one exchange total.
    */
  def lengthBucketBatches(docs: DataFrame, idCol: String,
      textCol: String, batchSize: Int, shards: Int): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    val rankW = Window.partitionBy("shard")
      .orderBy(col("n_tokens"), col("doc_id"))
    val batchW = Window.partitionBy("shard", "batch_no")
    docs.select(col(idCol).as("doc_id"),
        (col(idCol) % shards).cast("long").as("shard"),
        TextFunctions.nTokens(col(textCol)).as("n_tokens"))
      .withColumn("rn", row_number().over(rankW).cast("long"))
      .withColumn("batch_no", expr(s"(rn - 1) div $batchSize"))
      .withColumn("batch_max", max("n_tokens").over(batchW))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("batch_no"), col("batch_max"),
        (col("batch_max") - col("n_tokens")).as("pad_tokens"))
  }

  // ---------------------------------------------------------------
  // Language-model-flavoured quality scoring & retrieval
  // ---------------------------------------------------------------

  /** Unigram-LM fluency score — the cheap perplexity proxy used to
    * rank web documents before an expensive model-based filter: the
    * MEAN CORPUS PROBABILITY of a document's tokens,
    * score = (Σ_token cnt(token)) / (n_tokens · total_tokens) where
    * cnt is the corpus-wide unigram count. Boilerplate/templated text
    * made of very common tokens scores high; rare-token noise scores
    * low. The numerator is a pure INTEGER sum (Σ over the doc's
    * distinct terms of tf·cnt), so the only float op is one final
    * division — no accumulation-order drift, and the DuckDB oracle is
    * bit-exact by construction.
    *
    * Scale shape: one explode + (doc, term) map-side-combinable count
    * (shared with tf-idf), corpus counts are a second agg over those
    * skinny rows (never a second corpus pass), the 1-row token total
    * broadcasts, and the per-doc reduce carries three longs. No text
    * is shuffled beyond the term keys themselves.
    */
  def unigramMeanProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val cnt = tf.groupBy("term").agg(sum("tf").as("cnt"))
    val total = cnt.agg(sum("cnt").as("total_tokens"))
    tf.join(cnt, "term")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"), sum(col("tf") * col("cnt")).as("hit_mass"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_tokens"), col("hit_mass"),
        (col("hit_mass").cast("double") /
          (col("n_tokens").cast("double") * col("total_tokens").cast("double")))
          .as("mean_prob"))
  }

  /** Bigram-LM fluency score — the next rung above [[unigramMeanProb]]
    * on the cheap-perplexity ladder (the CCNet-style "score web text
    * by a small LM trained on the corpus itself" filter): each
    * document's MEAN SMOOTHED BIGRAM PROBABILITY under the corpus
    * bigram model, p(b|a) = (c(a b) + 1) / (c(a ·) + V) with add-one
    * smoothing over the V-token vocabulary. Word salad whose adjacent
    * pairs never co-occur elsewhere scores near the smoothing floor;
    * templated prose scores high.
    *
    * Determinism: every per-bigram probability is the INTEGER
    * floor-division (Scale·(c₂+1)) div (c₁+V) — one exact int64 op —
    * and the per-doc reduce sums those longs (order-independent), so
    * the DuckDB oracle replays scores bit-for-bit; the only float op
    * is the final display division by Scale.
    *
    * Scale shape: one gram pass (the codegen'd multiset-NGrams
    * expression) feeding a (doc, gram) map-side-combinable count;
    * corpus bigram counts c₂ and head counts c₁ are SECOND-LEVEL aggs
    * over those skinny rows, never another corpus pass; the 1-row
    * vocabulary size broadcasts; the scoring join keys on the gram
    * string only. Docs with < 2 tokens surface with n_bigrams = 0 and
    * a 0 score rather than disappearing.
    *
    * Bound: Scale·(c₂+1) must fit int64, i.e. no single bigram may
    * exceed ~9.2e9 corpus occurrences at Scale = 1e9; for larger
    * corpora lower Scale (the probability payload is ≤ Scale
    * regardless, since c₂ ≤ c₁).
    */
  def bigramMeanProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val Scale = 1000000000L
    val ids = docs.select(col(idCol).as("doc_id"),
      TextFunctions.nTokens(col(textCol)).as("n_tokens"))
    val dg = docs.select(col(idCol).as("doc_id"),
        explode(multisetGrams(TextFunctions.tokens(col(textCol)), 2)).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("occ"))
    val c2 = dg.groupBy("gram").agg(sum("occ").as("c2"))
    val c1 = c2.groupBy(substring_index(col("gram"), " ", 1).as("head"))
      .agg(sum("c2").as("c1"))
    val vocab = docs.select(
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .agg(count_distinct(col("term")).as("v"))
    val parts = dg.join(c2, "gram")
      .withColumn("head", substring_index(col("gram"), " ", 1))
      .join(c1, "head")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"),
        (col("occ") * expr(s"($Scale * (c2 + 1)) div (c1 + v)")).as("part"))
      .groupBy("doc_id").agg(sum("part").as("sum_scaled"))
    ids.join(parts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        greatest(col("n_tokens") - 1L, lit(0L)).as("n_bigrams"),
        coalesce(col("sum_scaled"), lit(0L)).as("sum_scaled"))
      .withColumn("mean_prob_scaled",
        when(col("n_bigrams") > 0, expr("sum_scaled div n_bigrams"))
          .otherwise(lit(0L)))
      .withColumn("score",
        col("mean_prob_scaled").cast("double") / lit(Scale.toDouble))
  }

  /** Trigram stupid-backoff LM score (Brants et al., EMNLP'07 —
    * "Large Language Models in Machine Translation") — the top rung
    * of the cheap-perplexity ladder and the shape of the actual CCNet
    * filter: the model trains on a REFERENCE sub-corpus (`refFilter`,
    * e.g. the clean in-language slice) and scores EVERY document, so
    * unseen n-grams genuinely back off. Per trigram position
    * (w1 w2 w3):
    *
    *   S = c(w1w2w3)/c(w1w2)          seen trigram
    *     = 0.4 · c(w2w3)/c(w2)        else seen bigram
    *     = 0.16 · c(w3)/N             else seen unigram
    *     = 0                          out-of-vocabulary
    *
    * with the canonical α = 0.4 kept EXACT as the rational 2/5
    * (0.16 = 4/25): each branch is one int64 floor-division —
    * (Scale·c3) div c12, (2·Scale·c23) div (5·c(w2)),
    * (4·Scale·c(w3)) div (25·N) — no float enters until the final
    * display division, so the oracle replays scores bit-for-bit.
    * A seen trigram implies its head bigram is seen (c12 ≥ c3 > 0),
    * so no branch divides by zero or null.
    *
    * Scale shape: the three reference count tables are skinny
    * gram-keyed aggregations (bi/uni are barrier-pinned — each has
    * TWO join consumers and would otherwise re-tokenize the reference
    * per consumer); the scoring stream joins (doc, trigram, occ) rows
    * against them on gram keys only — text never shuffles; the 1-row
    * token total broadcasts. Bound: Scale·(c+1) must stay below 2⁶³,
    * i.e. no single reference n-gram beyond ~4.6e9 occurrences at
    * Scale = 1e9 (α doubles the factor) — lower Scale for larger
    * reference corpora, as in [[bigramMeanProb]].
    */
  def trigramBackoffScore(docs: DataFrame, idCol: String, textCol: String,
      refFilter: Column): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    val Scale = 1000000000L
    val ids = docs.select(col(idCol).as("doc_id"),
      TextFunctions.nTokens(col(textCol)).as("n_tokens"))
    val ref = docs.filter(refFilter)
    val tri = ref.select(
        explode(multisetGrams(TextFunctions.tokens(col(textCol)), 3)).as("g3"))
      .groupBy("g3").agg(count(lit(1)).as("c3"))
    // checkpoint-pin bi (2 join consumers) and uni (2 joins + the
    // token total): a shared exchange is NOT reused here because each
    // consumer pushes its own rename/pruning into the subtree, so
    // without the pin the reference re-tokenizes once per consumer
    // (ExplainAudit showed 5 extra reference scans)
    val bi = ref.select(
        explode(multisetGrams(TextFunctions.tokens(col(textCol)), 2)).as("g2"))
      .groupBy("g2").agg(count(lit(1)).as("c2")).localCheckpoint()
    val uni = ref.select(
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1")).localCheckpoint()
    val totals = uni.agg(sum("c1").as("n_total"))
    val dg = docs.select(col(idCol).as("doc_id"),
        explode(multisetGrams(TextFunctions.tokens(col(textCol)), 3)).as("g3"))
      .groupBy("doc_id", "g3").agg(count(lit(1)).as("occ"))
      .withColumn("ws", split(col("g3"), " "))
      .withColumn("w12", concat_ws(" ",
        col("ws").getItem(0), col("ws").getItem(1)))
      .withColumn("w23", concat_ws(" ",
        col("ws").getItem(1), col("ws").getItem(2)))
      .withColumn("w2", col("ws").getItem(1))
      .withColumn("w3", col("ws").getItem(2))
      .drop("ws")
    val parts = dg
      .join(tri, Seq("g3"), "left")
      .join(bi.select(col("g2").as("w12"), col("c2").as("c12")),
        Seq("w12"), "left")
      .join(bi.select(col("g2").as("w23"), col("c2").as("c23")),
        Seq("w23"), "left")
      .join(uni.select(col("w").as("w2"), col("c1").as("cw2")),
        Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("c1").as("cw3")),
        Seq("w3"), "left")
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), (col("occ") *
        when(col("c3").isNotNull, expr(s"(${Scale}L * c3) div c12"))
          .when(col("c23").isNotNull,
            expr(s"(${2 * Scale}L * c23) div (5 * cw2)"))
          .when(col("cw3").isNotNull,
            expr(s"(${4 * Scale}L * cw3) div (25 * n_total)"))
          .otherwise(lit(0L))).as("part"))
      .groupBy("doc_id").agg(sum("part").as("sum_scaled"))
    ids.join(parts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        greatest(col("n_tokens") - 2L, lit(0L)).as("n_trigrams"),
        coalesce(col("sum_scaled"), lit(0L)).as("sum_scaled"))
      .withColumn("mean_prob_scaled",
        when(col("n_trigrams") > 0, expr("sum_scaled div n_trigrams"))
          .otherwise(lit(0L)))
      .withColumn("score",
        col("mean_prob_scaled").cast("double") / lit(Scale.toDouble))
  }

  /** Gopher-rule quality gate (Rae et al. 2021, §A1.1 — the published
    * heuristic bundle web corpora are pre-filtered with, word-level
    * subset): each rule surfaces as its own boolean so a corpus owner
    * can see WHICH gate a document failed, plus the conjunction:
    *
    *   - `ok_word_count`  — 50 ≤ words ≤ 100,000
    *   - `ok_mean_len`    — mean word length in [3, 10] chars
    *   - `ok_symbol`      — symbol (#, …) to word ratio ≤ 0.1
    *   - `ok_alpha`       — ≥ 80% of words contain a letter
    *   - `ok_stopwords`   — ≥ 2 stop-word occurrences
    *
    * The line-level Gopher rules (bullet/ellipsis line starts,
    * duplicate lines) are out of scope for the single-line fixture
    * text — the span/dedup operators cover their intent.
    *
    * Determinism: every threshold is an integer cross-multiplication
    * (3n ≤ chars ≤ 10n; 10·symbols ≤ n; 5·alpha ≥ 4n) — no float
    * division anywhere, so the oracle replays each verdict exactly.
    *
    * Scale shape: map-only — one projection over the corpus, no
    * shuffle, trivially resumable; the natural first pass of any
    * curation pipeline.
    */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = TextFunctions.tokens(col(textCol))
    docs.select(col(idCol).as("doc_id"), ws.as("ws"),
        TextFunctions.dictHits(col(textCol), TextFunctions.Stopwords)
          .as("stop_hits"),
        regexp_count(col(textCol), lit("[#…]")).cast("long").as("symbols"))
      .select(col("doc_id"),
        size(col("ws")).cast("long").as("n_words"),
        aggregate(transform(col("ws"), w => length(w).cast("long")),
          lit(0L), (a, b) => a + b).as("word_chars"),
        size(filter(col("ws"), w => w.rlike("[A-Za-z]")))
          .cast("long").as("alpha_words"),
        col("stop_hits"), col("symbols"))
      .withColumn("ok_word_count",
        col("n_words") >= 50L && col("n_words") <= 100000L)
      .withColumn("ok_mean_len",
        col("word_chars") >= col("n_words") * 3L &&
        col("word_chars") <= col("n_words") * 10L)
      .withColumn("ok_symbol", col("symbols") * 10L <= col("n_words"))
      .withColumn("ok_alpha", col("alpha_words") * 5L >= col("n_words") * 4L)
      .withColumn("ok_stopwords", col("stop_hits") >= 2L)
      .withColumn("keep",
        col("ok_word_count") && col("ok_mean_len") && col("ok_symbol") &&
        col("ok_alpha") && col("ok_stopwords"))
  }

  /** Exact-phrase decontamination — the canary-string check run
    * ALONGSIDE the shingle/Bloom passes ([[decontaminate]],
    * [[bloomDecontaminate]]): each benchmark document contributes one
    * verbatim probe phrase (its first `probeWords` words), and a
    * training document is contaminated iff it CONTAINS any probe as
    * an exact substring — the form benchmark canaries and repeated
    * eval prompts actually take, which shingle overlap can dilute
    * below threshold on long documents.
    *
    * Scale shape: the probes collapse to ONE sorted-array row that
    * broadcasts; scoring is a single codegen'd map pass
    * (size(filter(probes, contains))) over the corpus — no shuffle
    * touches corpus text, mirroring the t56 Bloom shape. |bench| must
    * fit a broadcast row (thousands of probes), the standard
    * benchmark-suite size.
    */
  def exactPhraseDecontaminate(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, probeWords: Int = 8): DataFrame = {
    // both sides do heavy per-row string work in their scan stage
    // (bench: tokenize; train: |probes| contains() per document) —
    // guard low-split scans so it parallelizes (r15: t98's two
    // single-task 2 s stages → 32-way, 4.4 s → 1.1 s at sf0.1)
    val probes = ScanGuard.lowSplit(bench, idCol)
      .select(TextFunctions.tokens(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= probeWords)
      .select(concat_ws(" ", slice(col("ws"), 1, probeWords)).as("probe"))
      .agg(sort_array(collect_set(col("probe"))).as("probes"))
    ScanGuard.lowSplit(train, idCol).crossJoin(broadcast(probes))
      .select(col(idCol).as("doc_id"),
        size(filter(col("probes"), p => col(textCol).contains(p)))
          .cast("long").as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0L)
  }

  /** Pairwise source-divergence map — which sources are statistically
    * redundant and which add coverage: the L1 (total-variation ×2)
    * distance between every two sources' unigram distributions, in
    * 1e6 fixed point. [[corpus drift|t79]] compares two SNAPSHOTS of
    * one corpus; this compares every source pair inside one snapshot
    * — the matrix a mixture designer reads before collapsing near-
    * identical crawls.
    *
    * Determinism: per-source probabilities are integer ppm floors
    * ((c·10⁶) div n); the L1 decomposes exactly as
    * Σ_shared |p_a − p_b| + (S_a − shared_a) + (S_b − shared_b)
    * where S is the source's total ppm mass (≈10⁶ minus floor dust) —
    * so words missing from one side contribute their full mass
    * without materializing the vocabulary union.
    *
    * Scale shape: one tokenize pass → (source, word) counts
    * (map-side-combinable); the ppm relation self-joins on the WORD
    * key only (per word the pair fan-out is |sources|², a constant);
    * per-source totals are a |sources|-row broadcast. No corpus text
    * ever shuffles.
    */
  def sourceDivergence(docs: DataFrame, textCol: String,
      sourceCol: String): DataFrame = {
    val cnt = docs.select(col(sourceCol).as("source"),
        explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("source").agg(sum("c").as("n"))
    // checkpoint-pin ppm: it feeds the masses agg AND both sides of
    // the pair join, and per-consumer pruning defeats exchange reuse
    // (the corpus would otherwise tokenize once per consumer); the
    // pinned relation is vocabulary-sized per source, never the corpus
    val ppm = cnt.join(broadcast(tot), "source")
      .select(col("source"), col("w"),
        expr("(c * 1000000) div n").as("ppm"))
      .localCheckpoint()
    val mass = ppm.groupBy("source").agg(sum("ppm").as("s_mass"))
    val shared = ppm.as("a")
      .join(ppm.as("b"),
        col("a.w") === col("b.w") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(sum(abs(col("a.ppm") - col("b.ppm"))).as("shared_absdiff"),
        sum(col("a.ppm")).as("shared_a"),
        sum(col("b.ppm")).as("shared_b"),
        count(lit(1)).as("shared_vocab"))
    shared
      .join(broadcast(mass.select(col("source").as("source_a"),
        col("s_mass").as("mass_a"))), "source_a")
      .join(broadcast(mass.select(col("source").as("source_b"),
        col("s_mass").as("mass_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("shared_vocab"),
        (col("shared_absdiff") + (col("mass_a") - col("shared_a")) +
          (col("mass_b") - col("shared_b"))).as("l1_ppm"))
  }

  /** Largest-remainder (Hamilton) eval-set apportionment — build an
    * exactly-`totalN`-document eval set whose strata match the corpus
    * proportions as closely as integer counts allow: each stratum's
    * quota is n_s·totalN/N, every stratum gets the floor, and the
    * leftover seats go to the largest remainders (ties broken on the
    * stratum key — the classic apportionment that provably minimizes
    * total rounding deviation). Within a stratum the selected
    * documents are the `alloc` smallest by the shared deterministic
    * id-hash ([[idMix]]) — re-running selects the identical set.
    *
    * Determinism: quotas are exact BIGINT products (n_s·totalN ≤
    * N·totalN — bound documented), base/remainder are one div/mod,
    * and the seat ranking is an integer sort. No float enters.
    *
    * Scale shape: the corpus collapses to a |strata|-row histogram
    * (map-side combinable); apportionment runs entirely on that tiny
    * relation (one window) and BROADCASTS back; selection is one
    * per-stratum window ranking (hash, id) — the t72 cap shape with a
    * per-stratum limit.
    */
  def hamiltonEvalSet(docs: DataFrame, idCol: String, stratumCol: String,
      totalN: Int): DataFrame = {
    require(totalN > 0, s"totalN must be positive, got $totalN")
    val hist = docs.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_s"))
    val tot = hist.agg(sum("n_s").as("n"))
    val wRem = Window.orderBy(col("rem").desc, col("stratum"))
    val alloc = hist.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_s"),
        expr(s"(n_s * ${totalN}L) div n").as("base"),
        expr(s"(n_s * ${totalN}L) % n").as("rem"),
        expr(s"${totalN}L - sum((n_s * ${totalN}L) div n) over ()")
          .as("leftover"))
      .withColumn("seat_rank", row_number().over(wRem).cast("long"))
      .select(col("stratum"), col("n_s"),
        (col("base") + when(col("seat_rank") <= col("leftover"), 1L)
          .otherwise(0L)).as("alloc"))
    val wSel = Window.partitionBy("stratum")
      .orderBy(col("sel_ord"), col("doc_id"))
    docs.select(col(idCol).as("doc_id"), col(stratumCol).as("stratum"))
      .withColumn("sel_ord", idMix(col("doc_id")))
      .withColumn("sel_rank", row_number().over(wSel).cast("long"))
      .join(broadcast(alloc), "stratum")
      .filter(col("sel_rank") <= col("alloc"))
      .select(col("doc_id"), col("stratum"), col("sel_rank"),
        col("alloc"), col("n_s"))
  }

  /** Deterministic per-source holdout REFRESH — the eval-slice
    * rotation a long-running training pipeline needs: a held-out set
    * goes stale (it stops measuring the live distribution, and every
    * model-selection decision overfits it a little more), so each
    * refresh epoch must replace part of it WITHOUT moving the
    * per-source budgets and WITHOUT leaking near-duplicates of
    * training documents into eval.
    *
    * Three disciplines compose, all exact-arithmetic and
    * oracle-replayable:
    *  - **Leakage guard** ([[canonicalSelect]]'s component relation,
    *    the t78 rule): only documents with NO near-duplicate anywhere
    *    in the corpus are eligible — any clustered doc left in eval
    *    has a paraphrase in train by construction, the contamination
    *    t83/t137 alarm on.
    *  - **Fixed budget** ([[hamiltonEvalSet]]'s Hamilton
    *    apportionment, t103): `totalN` seats split over sources by
    *    exact integer quota + largest-remainder over the ELIGIBLE
    *    population, so both epochs draw the same per-source alloc.
    *  - **Reservoir-style rotation** ([[idMix]] with an epoch salt):
    *    epoch e ranks each source's eligible docs by
    *    idMix(doc_id XOR e·2654435761) — a fresh deterministic
    *    uniform draw per epoch, so each refresh keeps an
    *    alloc²/n_eligible-expected core and rotates the rest, and
    *    re-running any epoch reproduces its holdout bit-for-bit
    *    (the reservoir property a training-data audit needs: no
    *    stored state, the corpus + epoch number IS the holdout).
    *
    * Emits one row per doc in either epoch's holdout: status `held`
    * (both), `admitted` (new only), `evicted` (prev only) — per
    * source, admitted count == evicted count exactly (same alloc),
    * the invariant the spec pins.
    *
    * Scale shape: eligibility is one anti-join against the
    * duplicate-set-sized component relation; both epoch ranks ride
    * ONE source-keyed exchange (two sorts, no second shuffle — the
    * [[hamiltonEvalSet]] selection shape); the |sources|-row
    * apportionment windows are bounded; allocations broadcast back.
    */
  def holdoutRefresh(docs: DataFrame, idCol: String, sourceCol: String,
      components: DataFrame, compIdCol: String, totalN: Int,
      prevEpoch: Long, epoch: Long): DataFrame = {
    require(totalN > 0, s"totalN must be positive, got $totalN")
    require(prevEpoch != epoch, "refresh needs two distinct epochs")
    def salt(e: Long): Long = e * 2654435761L
    // pinned: the scan + anti-join runs ONCE and its result feeds both
    // the histogram (map-side partial agg, a |sources|·partitions-row
    // exchange) and the rank windows (the single corpus-sized shuffle
    // in the plan — exchange REUSE can't carry this instead, because
    // column pruning gives the histogram branch a narrower exchange
    // child and canonical equality breaks, re-running the scan). The
    // isNotNull filter defines the ELIGIBLE POPULATION — NULL-source
    // docs never hold seats — and the t169 oracle's elig CTE applies
    // the same predicate, so both engines compute the Hamilton
    // totals over the identical population (a filter on only one
    // side would shift every quota on a corpus with NULL sources).
    val eligible =
      docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"))
        .filter(col("source").isNotNull)
        .join(components.select(col(compIdCol).as("doc_id")),
          Seq("doc_id"), "left_anti")
        .localCheckpoint()
    val hist = eligible.groupBy("source").agg(count(lit(1)).as("n_eligible"))
    val tot = hist.agg(sum("n_eligible").as("n"))
    val wRem = Window.orderBy(col("rem").desc, col("source"))
    val alloc = hist.crossJoin(broadcast(tot))
      .select(col("source"), col("n_eligible"),
        expr(s"(n_eligible * ${totalN}L) div n").as("base"),
        expr(s"(n_eligible * ${totalN}L) % n").as("rem"),
        expr(s"${totalN}L - sum((n_eligible * ${totalN}L) div n) over ()")
          .as("leftover"))
      .withColumn("seat_rank", row_number().over(wRem).cast("long"))
      .select(col("source"), col("n_eligible"),
        (col("base") + when(col("seat_rank") <= col("leftover"), 1L)
          .otherwise(0L)).as("alloc"))
    val wPrev = Window.partitionBy("source")
      .orderBy(col("ord_prev"), col("doc_id"))
    val wNew = Window.partitionBy("source")
      .orderBy(col("ord_new"), col("doc_id"))
    eligible
      .withColumn("ord_prev",
        idMix(col("doc_id").bitwiseXOR(lit(salt(prevEpoch)))))
      .withColumn("ord_new",
        idMix(col("doc_id").bitwiseXOR(lit(salt(epoch)))))
      .withColumn("rank_prev", row_number().over(wPrev).cast("long"))
      .withColumn("rank_new", row_number().over(wNew).cast("long"))
      .join(broadcast(alloc), "source")
      .withColumn("in_prev", col("rank_prev") <= col("alloc"))
      .withColumn("in_new", col("rank_new") <= col("alloc"))
      .filter(col("in_prev") || col("in_new"))
      .select(col("doc_id"), col("source"),
        when(col("in_prev") && col("in_new"), "held")
          .when(col("in_new"), "admitted")
          .otherwise("evicted").as("status"),
        when(col("in_new"), col("rank_new")).as("rank_new"),
        col("alloc"), col("n_eligible"))
  }

  /** Per-source quality pruning — keep the top `keepFrac` of each
    * source's documents by an integer quality score, ties at the
    * threshold included (so at least ceil(n·keepFrac) docs per source
    * survive). The score is the unigram-LM signal of
    * [[unigramMeanProb]] in exact integer form — `hit_mass div
    * n_tokens`, mean corpus-frequency mass per token — so the oracle
    * replays thresholds bit-for-bit. This is the corpus-curation
    * "keep the best X% per domain" primitive (quality-classifier
    * pruning with per-domain quantiles).
    *
    * Scale shape: the exact per-source quantile is computed WITHOUT
    * sorting the corpus. Scores compress to a (source, score)
    * histogram (the shuffle carries distinct score values per source,
    * not documents); the cumulative threshold walk windows over that
    * compressed histogram; and the one-row-per-source thresholds
    * BROADCAST back for what is effectively a map-side filter of the
    * scored corpus — the q43 histogram-quantile trick applied
    * per group. No corpus-wide sort or window exists in the plan.
    */
  def qualityPrune(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, keepFrac: Double = 0.25): DataFrame = {
    // barrier: scored feeds THREE consumers (histogram, per-source
    // counts, final filter); without it Catalyst inlines and re-runs
    // the full tokenize+aggregate lineage once per consumer — the
    // same hazard Dedup.sigBands documents
    val scored = Dedup.barrier(
      unigramMeanProb(docs, idCol, textCol)
        .join(docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source")),
          "doc_id")
        .select(col("doc_id"), col("source"),
          expr("hit_mass div n_tokens").as("score")),
      col("doc_id"))
    val hist = scored.groupBy("source", "score").agg(count(lit(1)).as("cnt"))
    val nper = scored.groupBy("source").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("source").orderBy(col("score").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // threshold = max score whose score-descending cumulative count
    // reaches the per-source target — the tightest score cut whose
    // ≥-set is big enough
    val thr = hist.withColumn("cum", sum("cnt").over(w))
      .join(nper, "source")
      .filter(col("cum") >= ceil(col("n") * lit(keepFrac)).cast("long"))
      .groupBy("source").agg(max("score").as("thr"))
    scored.join(broadcast(thr), "source")
      .filter(col("score") >= col("thr"))
      .select(col("doc_id"), col("source"), col("score"))
  }

  /** Canonical-representative selection: after near-dup clustering,
    * WHICH copy do we keep? The standard disposition is "the
    * best-quality member" — boilerplate mirrors and truncated copies
    * lose to the fullest original — so each MinHash cluster
    * ([[Dedup.minhashLsh]] → [[Dedup.connectedComponents]]) elects
    * the member with the highest integer quality score (the
    * [[unigramMeanProb]] signal in [[qualityPrune]]'s exact-integer
    * form, `hit_mass div n_tokens`), ties to the smallest doc_id.
    * Output: every CLUSTERED doc with its cluster, score, and
    * verdict — unclustered docs have no duplicate to lose to and are
    * implicitly kept (same row contract as the t24 cluster dump).
    *
    * Scale shape: clustering and scoring are the two existing
    * pipelines unchanged; the election adds one join keyed on doc_id
    * (clustered docs are a small minority of the corpus, broadcast-
    * able after the components converge) and one window over
    * cluster_id partitions, which are duplicate-set-sized — never
    * corpus-sized. Scores come from the full-corpus unigram counts,
    * so the metric is the same one t29/t37 gate, not a per-cluster
    * re-derivation.
    */
  def canonicalSelect(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numPerms: Int = 64, bands: Int = 16,
      threshold: Double = 0.5,
      compOpt: Option[DataFrame] = None): DataFrame = {
    val comps = compOpt.getOrElse {
      val pairs = Dedup.minhashLsh(docs, idCol, textCol, n, numPerms,
        bands, threshold).select("id_a", "id_b")
      Dedup.connectedComponents(pairs, "id_a", "id_b")
    }.select(col("node").as("doc_id"), col("comp").as("cluster_id"))
    val scored = unigramMeanProb(docs, idCol, textCol)
      .select(col("doc_id"), expr("hit_mass div n_tokens").as("score"))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("score").desc, col("doc_id").asc)
    comps.join(scored, "doc_id")
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("cluster_id"), col("score"),
        (col("rn") === 1).as("canonical"))
  }

  /** BM25 top-k retrieval over the corpus for a (small) query set —
    * the standard lexical-retrieval scorer for quality-ranking and
    * targeted corpus slicing. Per query term:
    * idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)), with the LINEAR idf
    * N/df (same exact-integer-ratio choice as [[tfidfTopTerms]], so
    * the oracle replays scores bit-for-bit). Per-term partials are
    * floored to millionths (a deterministic IEEE op) and summed as
    * LONGS — floating addition never happens in an
    * accumulation-order-dependent position, and ranking ties break on
    * the integer score then doc_id.
    *
    * Scale shape: query terms broadcast and semi-filter the token
    * stream BEFORE the (doc, term) aggregation, so tf/df are computed
    * only for matching terms; df reuses tf's output; avgdl comes from
    * a map-side doc-length aggregate (1 broadcast row); the final
    * top-k is a rank-pushdown window per query (WindowGroupLimit
    * keeps per-partition heaps — k rows per input partition reach the
    * shuffle, so the handful of query partitions never see the full
    * posting lists).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, String)], k1: Double, b: Double, k: Int): DataFrame = {
    val qterms = queryTerms(docs.sparkSession, queries)
    val (tf, stats) = queryTf(docs, idCol, textCol, qterms)
    bm25Score(tf, qterms, stats, k1, b, k)
  }

  /** The query-term-restricted term-frequency relation
    * (doc_id, dl, term, tf) plus 1-row corpus stats — the shared
    * preamble of every one-shot lexical scorer.
    */
  private def queryTf(docs: DataFrame, idCol: String, textCol: String,
      qterms: DataFrame): (DataFrame, DataFrame) = {
    // no ScanGuard here: the r15 guard on this site measured NEUTRAL
    // in six same-window A/B runs at sf0.1 (t28/t30/t69/t77 off vs on
    // within ±noise, and the driver's independent r15 window read t77
    // SLOWER with it) — tokenize-per-row is cheap enough that the
    // extra full-text exchange cancels the gain wherever the guard
    // would fire, and at production layouts it was the identity
    val d = docs
    val dl = d.select(col(idCol).as("doc_id"),
      TextFunctions.nTokens(col(textCol)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_tokens"))
    val tf = d.select(col(idCol).as("doc_id"),
        TextFunctions.nTokens(col(textCol)).as("dl"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .join(broadcast(qterms.select("term").distinct()), "term")
      .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
    (tf, stats)
  }

  /** Query (query_id, term) pairs — the tokenization both the
    * one-shot scorer and the persisted index share.
    */
  private def queryTerms(spark: org.apache.spark.sql.SparkSession,
      queries: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    queries.toDF("query_id", "qtext")
      .select(col("query_id"),
        explode(TextFunctions.tokens(col("qtext"))).as("term"))
      .distinct()
  }

  /** The BM25 ranking stage shared VERBATIM by [[bm25TopK]] and
    * [[searchInvertedIndex]] — one arithmetic, so the persisted-index
    * search is row-for-row the one-shot scorer by construction. `tf`
    * is (doc_id, dl, term, tf) restricted to query terms; `stats` a
    * 1-row (n_docs, total_tokens) relation.
    */
  private def bm25Score(tf: DataFrame, qterms: DataFrame, stats: DataFrame,
      k1: Double, b: Double, k: Int): DataFrame = {
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("total_tokens").cast("double") / col("n_docs").cast("double")
    val idf = col("n_docs").cast("double") / col("df").cast("double")
    val tfc = col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_scaled").desc, col("doc_id"))
    tf.join(df_, "term")
      .join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        floor(idf * tfc * lit(1e6)).as("part_scaled"))
      .groupBy("query_id", "doc_id")
      .agg(sum("part_scaled").as("score_scaled"), count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_terms"),
        (col("score_scaled").cast("double") / 1e6).as("score"))
  }

  /** TF-IDF dot-product ranking over the same restricted `tf`
    * relation [[bm25Score]] consumes — the second lexical channel of
    * [[hybridRetrievalTopK]]. Linear idf (N/df, the [[tfidfTopTerms]]
    * convention) keeps each partial score to two IEEE ops on exact
    * integers before the scaled floor, so the oracle replays scores
    * and ranking bit-for-bit. Unlike BM25 it has no length
    * normalization — the two channels genuinely disagree, which is
    * what makes fusing them worthwhile.
    */
  private def tfidfScore(tf: DataFrame, qterms: DataFrame, stats: DataFrame,
      k: Int): DataFrame = {
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = col("n_docs").cast("double") / col("df").cast("double")
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_scaled").desc, col("doc_id"))
    tf.join(df_, "term")
      .join(broadcast(qterms), "term")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        floor(idf * col("tf").cast("double") * lit(1e6)).as("part_scaled"))
      .groupBy("query_id", "doc_id")
      .agg(sum("part_scaled").as("score_scaled"), count(lit(1)).as("n_terms"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_terms"),
        (col("score_scaled").cast("double") / 1e6).as("score"))
  }

  /** TF-IDF retrieval top-k — the standalone face of the second
    * hybrid channel (same preamble as [[bm25TopK]]).
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, String)], k: Int): DataFrame = {
    val spark = docs.sparkSession
    val qterms = queryTerms(spark, queries)
    val (tf, stats) = queryTf(docs, idCol, textCol, qterms)
    tfidfScore(tf, qterms, stats, k)
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of N ranked
    * retrieval channels: fused(q, d) = Σ_channels 1/(kConst + rank).
    * Ranking-agnostic — it reads only ranks, never scores, so sparse
    * and dense channels with incomparable score scales fuse cleanly.
    * Each reciprocal is the integer floor-division Scale div
    * (kConst + rank), so the fused score is an order-independent long
    * sum the oracle replays exactly.
    *
    * Scale shape: channels are already top-k-per-query relations
    * (tiny: |queries|·k rows each), so the union + fuse agg + rank
    * window all run on skinny ranked rows — the corpus never appears.
    */
  def rrfFuse(channels: Seq[DataFrame], kConst: Int, k: Int): DataFrame = {
    require(channels.nonEmpty, "rrfFuse needs at least one channel")
    require(kConst >= 0, s"kConst must be non-negative, got $kConst")
    val Scale = 1000000000L
    val w = Window.partitionBy("query_id")
      .orderBy(col("rrf_scaled").desc, col("doc_id"))
    channels.map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_.unionByName(_))
      .select(col("query_id"), col("doc_id"),
        expr(s"$Scale div (${kConst.toLong} + rank)").as("part"))
      .groupBy("query_id", "doc_id")
      .agg(sum("part").as("rrf_scaled"), count(lit(1)).as("n_channels"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"), col("n_channels"),
        (col("rrf_scaled").cast("double") / 1e9).as("rrf_score"))
  }

  /** Conjunctive boolean relevance — the classic query-independent
    * ground truth for retrieval evaluation: a document is relevant to
    * a query iff it contains EVERY query term. Derivable in pure SQL,
    * so it gives [[rankingMetrics]] an oracle-replayable truth set
    * that is independent of any scorer under test.
    *
    * Scale shape: per-doc DISTINCT terms semi-filtered by the
    * broadcast query vocabulary, a (query, doc) matched-count agg
    * with map-side combine, the |q|-row term-count relation broadcast
    * back. Only docs sharing at least one query term ever reach the
    * agg.
    */
  def conjunctiveRelevance(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, String)]): DataFrame = {
    val qt = queryTerms(docs.sparkSession, queries)
    val qn = qt.groupBy("query_id").agg(count(lit(1)).as("qn"))
    docs.select(col(idCol).as("doc_id"),
        explode(array_distinct(TextFunctions.tokens(col(textCol)))).as("term"))
      .join(broadcast(qt), "term")
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("matched"))
      .join(broadcast(qn), "query_id")
      .filter(col("matched") === col("qn"))
      .select("query_id", "doc_id")
  }

  /** Retrieval evaluation IN the engine — per-query precision@k,
    * recall@k, and MRR of a ranked relation against a relevance set,
    * the measurement loop a retrieval pipeline tunes against (probe
    * depths, fusion constants, index parameters). All metrics are
    * exact scaled-integer floor divisions (hits·1e6 div k, hits·1e6
    * div n_rel, 1e6 div first_relevant_rank), so the oracle replays
    * them bit-for-bit; queries with no relevant doc in the top-k
    * surface with zeroed metrics rather than disappearing.
    *
    * Scale shape: everything after the ranking⋈truth join runs on
    * |queries|-sized relations; the join itself keys on
    * (query_id, doc_id) over top-k rows only — the corpus never
    * appears.
    */
  def rankingMetrics(ranking: DataFrame, truth: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val Scale = 1000000L
    // base on BOTH sides: a query the ranker returned nothing for but
    // that has relevant docs must surface with zeroed metrics — keying
    // on the ranking alone would silently inflate averaged metrics
    val base = ranking.select("query_id")
      .union(truth.select("query_id")).distinct()
    val rel = truth.groupBy("query_id").agg(count(lit(1)).as("n_rel"))
    val hits = ranking.filter(col("rank") <= k)
      .join(truth, Seq("query_id", "doc_id"))
      .groupBy("query_id")
      .agg(count(lit(1)).as("hits"), min("rank").as("first_rel"))
    base.join(rel, Seq("query_id"), "left")
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("first_rel"))
      .select(col("query_id"), col("n_rel"), col("hits"),
        expr(s"(hits * ${Scale}L) div ${k.toLong}L").as("precision_scaled"),
        when(col("n_rel") > 0, expr(s"(hits * ${Scale}L) div n_rel"))
          .otherwise(lit(0L)).as("recall_scaled"),
        coalesce(expr(s"${Scale}L div first_rel"), lit(0L)).as("mrr_scaled"))
      .withColumn("precision_at_k",
        col("precision_scaled").cast("double") / 1e6)
      .withColumn("recall_at_k", col("recall_scaled").cast("double") / 1e6)
      .withColumn("mrr", col("mrr_scaled").cast("double") / 1e6)
  }

  /** Conjunctive relevance from an already-restricted `tf` relation —
    * tf is one row per (doc, query term), so matched-term counts need
    * no second corpus pass (the shared-tf discipline
    * [[hybridRetrievalTopK]] set).
    */
  private def conjunctiveRelevanceFromTf(tf: DataFrame,
      qterms: DataFrame): DataFrame = {
    val qn = qterms.groupBy("query_id").agg(count(lit(1)).as("qn"))
    tf.select("doc_id", "term")
      .join(broadcast(qterms), "term")
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("matched"))
      .join(broadcast(qn), "query_id")
      .filter(col("matched") === col("qn"))
      .select("query_id", "doc_id")
  }

  /** BM25 retrieval evaluated against conjunctive relevance in ONE
    * corpus pass: ranking and truth both derive from the same
    * barriered query-term tf relation, then [[rankingMetrics]] runs
    * on |queries|-sized relations. Identical arithmetic to composing
    * the standalone operators (the spec pins it).
    */
  def evaluateBm25(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, String)], k1: Double, b: Double, k: Int): DataFrame = {
    val qterms = queryTerms(docs.sparkSession, queries)
    val (tf0, stats) = queryTf(docs, idCol, textCol, qterms)
    val tf = Dedup.barrier(tf0, col("doc_id"))
    rankingMetrics(bm25Score(tf, qterms, stats, k1, b, k),
      conjunctiveRelevanceFromTf(tf, qterms), k)
  }

  /** Hybrid lexical retrieval: BM25 and TF-IDF channels fused by
    * [[rrfFuse]]. The corpus tokenizes ONCE — both channels score the
    * same barriered query-term `tf` relation (exchange reuse keeps the
    * tokenize+explode subtree single-executed per action), so the
    * second channel costs only its ranking arithmetic, not another
    * corpus pass.
    */
  def hybridRetrievalTopK(docs: DataFrame, idCol: String, textCol: String,
      queries: Seq[(Long, String)], k1: Double, b: Double, k: Int,
      kConst: Int = 60): DataFrame = {
    val spark = docs.sparkSession
    val qterms = queryTerms(spark, queries)
    val (tf0, stats) = queryTf(docs, idCol, textCol, qterms)
    val tf = Dedup.barrier(tf0, col("doc_id"))
    rrfFuse(Seq(bm25Score(tf, qterms, stats, k1, b, k),
      tfidfScore(tf, qterms, stats, k)), kConst, k)
  }

  /** Term-bucket count for the persisted inverted index, and the one
    * bucket function (pmod of the term's FNV-1a hash) shared by the
    * build (a Catalyst expression over the corpus) and the search
    * (a driver-side fold over the handful of query terms). ALL
    * postings of a term land in ONE bucket, so per-term df survives
    * pruning intact.
    */
  val IndexBuckets = 64

  private[operators] def termBucket(term: String, buckets: Int): Long =
    java.lang.Math.floorMod(
      graft.functions.Fnv64.eval(term.getBytes("UTF-8")), buckets.toLong)

  /** Bucket count of a persisted index, from its build-frozen `conf`
    * relation. `conf` is written by [[buildInvertedIndex]] and
    * [[rebucketInvertedIndex]] ONLY — appends never touch it, so the
    * meta-swap crash window ([[repairInvertedIndexMeta]]'s reason to
    * exist) can never lose the layout, and every reader (search,
    * phrase, append, both gauges) prunes and estimates with the
    * count the store was actually laid out with — a caller-supplied
    * count that disagreed with the layout would silently miss
    * postings. A legacy index without `conf` reads as the historical
    * default (64 — the only count any pre-conf build ever used).
    */
  def invertedIndexBuckets(spark: org.apache.spark.sql.SparkSession,
      path: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$path/conf")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) IndexBuckets
    else spark.read.parquet(p.toString).collect().head
      .getAs[Int]("buckets")
  }

  private def writeIndexConf(spark: org.apache.spark.sql.SparkSession,
      path: String, buckets: Int): Unit =
    spark.range(1).select(lit(buckets).as("buckets"))
      .write.mode("overwrite").parquet(s"$path/conf")

  /** Read-back schema for the postings relation — the bucket id lives
    * in the directory name and partition-value inference would type
    * it INT; LONG keeps it aligned with the Spark-side pmod.
    * `positions` are the 0-based token indices of the term's
    * occurrences, sorted — the positional-postings payload phrase
    * search consumes (BM25 ignores it; tf = size(positions) rides
    * separately so scoring never deserializes the arrays).
    */
  private val PostingsSchema =
    "term STRING, doc_id LONG, dl LONG, tf LONG, positions ARRAY<BIGINT>, bucket LONG"

  /** The bucketed postings relation of a corpus — shared by
    * [[buildInvertedIndex]] and [[appendToInvertedIndex]] so the two
    * write byte-compatible rows.
    */
  private def postingsRows(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.nTokens(col(textCol)).as("dl"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos").cast("long"))).as("positions"))

  private def withTermBucket(rows: DataFrame, buckets: Int): DataFrame =
    rows.withColumn("bucket",
      pmod(call_function("fnv64", col("term")), lit(buckets.toLong)))

  /** Inverted-index health gauge — the retrieval member of the gauge
    * family: the postings store's bucket-fill skew (hot TERMS pile
    * rows into few term-hash buckets, so a query touching a hot
    * bucket reads far more than n_rows/buckets — the same failure
    * mode [[graft.operators.Dedup.bandIndexStats]] watches on band
    * keys) and the duplicate (term, doc) posting mass replayed
    * appends accumulate — which for THIS store is a correctness
    * alarm, not just a cost one: BM25 consumes tf per posting row, so
    * duplicated rows double-count a document's term frequency.
    * Same one-row contract as the other gauges.
    */
  def invertedIndexStats(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = {
    val buckets = invertedIndexBuckets(spark, path)
    val rows = spark.read.schema(PostingsSchema).parquet(s"$path/postings")
    val perBucket = rows.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val dist = rows.select("term", "doc_id").distinct()
      .agg(count(lit(1)).as("n_distinct"))
    perBucket
      .agg(sum("cnt").as("n_rows"), count(lit(1)).as("n_buckets_used"),
        max("cnt").as("max_bucket"))
      .crossJoin(broadcast(dist))
      .select(lit(buckets.toLong).as("buckets"), col("n_buckets_used"),
        col("n_rows"), col("n_distinct"), col("max_bucket"),
        expr("(max_bucket * 1000000) div greatest(n_rows, 1)")
          .as("max_share_ppm"),
        expr(s"(max_bucket * ${buckets}L * 1000000L) " +
          "div greatest(n_rows, 1)").as("skew_x1e6"),
        expr("((n_rows - n_distinct) * 1000000) div greatest(n_rows, 1)")
          .as("dup_ppm"))
  }

  /** SAMPLED inverted-index gauge —
    * [[graft.operators.Dedup.bandIndexStatsSampled]]'s discipline over
    * the postings store: the deterministic stride lattice
    * (bucket % stride == 0, a partition filter), exact LOWER bounds
    * over the sampled buckets, stride-scaled estimators, stride-1
    * degeneracy to [[invertedIndexStats]]. Completes the sampled
    * family across every linear-scan store gauge (band t168, winnow
    * t170, postings t171). Like the band/winnow gauges, the bucket
    * count comes from the STORE (the `conf` relation), never the
    * caller — a supplied count that disagreed with the layout would
    * silently skew the stride lattice and every estimator.
    */
  def invertedIndexStatsSampled(spark: org.apache.spark.sql.SparkSession,
      path: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val buckets = invertedIndexBuckets(spark, path)
    val stride = math.max(1L, (buckets / math.max(k, 1)).toLong)
    val sampleSize = (buckets - 1) / stride + 1
    val rows = spark.read.schema(PostingsSchema).parquet(s"$path/postings")
      .filter(col("bucket") % stride === 0L)
    val perBucket = rows.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val dist = rows.select("term", "doc_id").distinct()
      .agg(count(lit(1)).as("n_distinct_sampled"))
    perBucket
      .agg(sum("cnt").as("n_rows_sampled"),
        count(lit(1)).as("n_buckets_sampled"),
        max("cnt").as("max_bucket_lb"))
      .crossJoin(broadcast(dist))
      .select(lit(buckets.toLong).as("buckets"), lit(stride).as("stride"),
        col("n_buckets_sampled"), col("n_rows_sampled"),
        col("n_distinct_sampled"), col("max_bucket_lb"),
        expr(s"(n_rows_sampled * ${buckets}L) div ${sampleSize}L")
          .as("est_rows"),
        expr(s"(max_bucket_lb * ${buckets}L * 1000000L) div " +
          s"greatest((n_rows_sampled * ${buckets}L) div ${sampleSize}L, 1)")
          .as("est_skew_x1e6"),
        (col("n_rows_sampled") - col("n_distinct_sampled"))
          .as("dup_rows_lb"),
        expr("((n_rows_sampled - n_distinct_sampled) * 1000000) div " +
          "greatest(n_rows_sampled, 1)").as("est_dup_ppm"))
  }

  /** Build a persisted, TERM-BUCKETED inverted index under `path`:
    * `postings` (term, doc_id, dl, tf) written
    * `partitionBy(bucket = pmod(fnv64(term), buckets))`, a 1-row
    * `meta` (n_docs, total_tokens), and a 1-row build-frozen `conf`
    * (buckets). LAYOUT IS THE INDEX, the same
    * discipline as the cell-partitioned IVF-PQ store: a query's terms
    * determine their buckets by pure arithmetic, so a search reads
    * ONLY the touched buckets' posting files — at 100 TB the corpus
    * tokenizes once here, and every retrieval after that scans
    * |query terms|/buckets of the postings instead of re-tokenizing
    * anything. Doc length is denormalized onto each posting row (one
    * long) so scoring needs no doc-side join at query time.
    *
    * Scale shape: one tokenize+explode pass, one (term, doc) count
    * with map-side combine, one `repartition(bucket)` clustering
    * write (a bucket's rows land in few files). Nothing here is
    * query-dependent — the index serves ANY term set.
    *
    * `buckets = 0` (the default) AUTO-SIZES the layout from the
    * corpus: the postings relation is pinned and its exact row count
    * picks [[graft.operators.Dedup.autoBuckets]] against the
    * per-bucket row budget. The chosen count is FROZEN in the
    * store's `conf` relation — every later reader prunes with it,
    * so a store and its probes can never disagree on the modulus.
    */
  def buildInvertedIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, buckets: Int = 0,
      rowsPerBucket: Long = Dedup.DefaultRowsPerBucket): Unit = {
    require(buckets >= 0)
    val spark = docs.sparkSession
    GraftFunctions.register(spark)
    val rows0 = postingsRows(docs, idCol, textCol)
    val (rows, b) =
      if (buckets > 0) (rows0, buckets)
      else {
        val pinned = rows0.localCheckpoint()
        (pinned, Dedup.autoBuckets(pinned.count(), rowsPerBucket))
      }
    writeIndexConf(spark, path, b)
    docs.select(col(idCol).as("doc_id"),
        TextFunctions.nTokens(col(textCol)).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("total_tokens"))
      .write.mode("overwrite").parquet(s"$path/meta")
    withTermBucket(rows, b)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
  }

  /** PHRASE retrieval over a persisted [[buildInvertedIndex]] index —
    * the positional-postings consumer: a document matches phrase
    * `t_0 … t_{m-1}` at base position `p` iff for EVERY offset `j`
    * the posting of `t_j` contains `p + j` (the classic positional
    * adjacency check; duplicates and order in the phrase are honored
    * by offset). Returns each query's top `k` documents by exact
    * phrase-occurrence count (ties to smaller doc_id) — the retrieval
    * primitive BM25's bag-of-words scoring cannot express.
    *
    * Scale shape: like [[searchInvertedIndex]] the scan statically
    * prunes to the phrase terms' buckets and the phrase relation
    * rides broadcasts; candidate volume is |first-term occurrences| ×
    * m rows per document that shares the phrase's vocabulary, bounded
    * by the query terms' posting sizes — never corpus-shaped. The
    * adjacency check is an array membership against the posting's
    * sorted positions; the support count and the per-query top-k are
    * the usual map-side-combinable aggregate + rank-pushdown window.
    */
  def phraseSearch(spark: org.apache.spark.sql.SparkSession, path: String,
      phrases: Seq[(Long, String)], k: Int): DataFrame = {
    import spark.implicits._
    val buckets = invertedIndexBuckets(spark, path)
    val qphr = phrases.toDF("query_id", "qtext")
      .select(col("query_id"),
        posexplode(TextFunctions.tokens(col("qtext"))).as(Seq("j", "term")))
      .select(col("query_id"), col("j").cast("long").as("j"), col("term"))
    val qbuckets = qphr.select("term").distinct().collect()
      .map(r => termBucket(r.getString(0), buckets)).distinct.toSeq
    // layout guard: an index persisted before positional postings has
    // no positions column — the pinned schema would null-fill it and
    // every phrase would return ZERO hits with no error (and an
    // appended-onto mixed index would silently lose the pre-upgrade
    // half). Footer-only probe; rebuild the index to migrate.
    require(spark.read.parquet(s"$path/postings")
        .schema.fieldNames.contains("positions"),
      s"$path/postings has no positions column - the index predates " +
        "positional postings; rebuild it with buildInvertedIndex")
    // barrier: the phrase-joined postings feed BOTH the base-position
    // explode and the adjacency join — the repartition exchange makes
    // the pruned scan + broadcast join reusable instead of planning
    // (and reading the bucket files for) it twice
    val withJ = Dedup.barrier(
      spark.read.schema(PostingsSchema).parquet(s"$path/postings")
        .filter(col("bucket").isin(qbuckets: _*))
        .join(broadcast(qphr), "term")
        .select(col("query_id"), col("j"), col("doc_id"), col("positions")),
      col("doc_id"))
    val base = withJ.filter(col("j") === 0L)
      .select(col("query_id"), col("doc_id"),
        explode(col("positions")).as("p"))
    val mRel = qphr.groupBy("query_id").agg(count(lit(1)).as("m"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("n_hits").desc, col("doc_id"))
    base.join(withJ, Seq("query_id", "doc_id"))
      .filter(array_contains(col("positions"), col("p") + col("j")))
      .groupBy(col("query_id"), col("doc_id"), col("p"))
      .agg(count(lit(1)).as("sup"))
      .join(broadcast(mRel), "query_id")
      .filter(col("sup") === col("m"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_hits"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "n_hits")
  }

  /** Ingest a NEW document batch into a persisted
    * [[buildInvertedIndex]] index: tokenize and count ONLY the batch,
    * append its postings into their term buckets, and fold its
    * (n_docs, total_tokens) into the meta row — after which
    * [[searchInvertedIndex]] scores over the merged corpus exactly as
    * if the index had been rebuilt (tf/df/dl are per-doc or per-term
    * facts that simply union; the BatchedSpec differential pins
    * build(all) == build(head) + append(tail) row-for-row). Cost
    * tracks the BATCH, never the indexed corpus — the retrieval twin
    * of [[graft.operators.Similarity.appendToIvfPqIndex]].
    *
    * Failure ordering: postings append FIRST, meta swap second — a
    * crash between them leaves the new docs retrievable with
    * slightly-stale corpus stats (scores off by the unmerged batch's
    * contribution to n_docs/avgdl), the benign leftover; the reverse
    * order would rescale every score while the new docs stay
    * invisible. Appends are plain parquet appends and therefore NOT
    * replay-idempotent — ingest each batch once (doc_id makes
    * duplicates detectable). Recovery: delete the batch's doc_ids
    * from postings and re-ingest.
    */
  def appendToInvertedIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, batch: DataFrame, idCol: String, textCol: String,
      autoRebucket: Boolean = true,
      rowsPerBucket: Long = Dedup.DefaultRowsPerBucket): Unit = {
    GraftFunctions.register(spark)
    val buckets = invertedIndexBuckets(spark, path)
    // cold start (streaming ingestion's first micro-batch): freeze
    // the layout the first batch appends under, so every later
    // append/search/gauge prunes with the same modulus
    val confPath = new org.apache.hadoop.fs.Path(s"$path/conf")
    if (!confPath.getFileSystem(spark.sessionState.newHadoopConf())
        .exists(confPath))
      writeIndexConf(spark, path, buckets)
    withTermBucket(postingsRows(batch, idCol, textCol), buckets)
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$path/postings")
    val batchStats = batch.select(col(idCol).as("doc_id"),
        TextFunctions.nTokens(col(textCol)).as("dl"))
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("total_tokens"))
    // cold start (streaming ingestion's first micro-batch): the batch
    // IS the corpus, no prior meta to merge. Existence goes through
    // the HADOOP filesystem of the index path — java.nio would report
    // false for every hdfs://-, s3a://- or file:-style location and
    // silently reset meta to batch-only stats on each append
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val merged =
      if (!fs.exists(metaPath)) batchStats
      else spark.read.parquet(s"$path/meta")
        .unionByName(batchStats)
        .agg(sum("n_docs").as("n_docs"),
          sum("total_tokens").as("total_tokens"))
    // staged swap: meta feeds its own merge, so an in-place overwrite
    // would truncate its input mid-plan; the stage is RENAMED over the
    // old meta (one delete + one same-fs move — no window where the
    // only copy is half-written). A crash between delete and rename
    // leaves meta absent with the complete stage beside it —
    // [[repairInvertedIndexMeta]] rebuilds meta from postings alone.
    val stage = new org.apache.hadoop.fs.Path(s"$path/meta_stage")
    merged.write.mode("overwrite").parquet(stage.toString)
    graft.core.FsOps.deleteOrThrow(fs, metaPath)
    graft.core.FsOps.renameOrThrow(fs, stage, metaPath)
    // detect→remediate, closed in the lifecycle op: a fixed-budget
    // sampled gauge read, and a whole-store re-bucket only when the
    // hottest sampled bucket exceeds the per-bucket row budget
    if (autoRebucket) autoRebucketInvertedIndex(spark, path, rowsPerBucket)
  }

  /** Re-bucket a persisted inverted index — the remediation the
    * postings gauge's alarm calls for, completing the family
    * ([[graft.operators.Dedup.rebucketBandIndex]] /
    * `rebucketWinnowIndex` got theirs in round 13). The WHOLE store
    * (conf + meta + postings, re-laid-out under the new modulus) is
    * rebuilt under `path__staging` and swapped in as ONE rename pair,
    * so the layout and its `conf` can never disagree. Posting ROWS
    * are preserved VERBATIM — no distinct: duplicated (term, doc)
    * rows are a correctness ALARM here (BM25 consumes tf per row;
    * the gauge's dup_ppm is how an operator finds a replayed
    * ingest), and a re-layout must never silently change scores.
    */
  def rebucketInvertedIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, newBuckets: Int): Unit = {
    require(newBuckets > 0)
    GraftFunctions.register(spark)
    val dir = new org.apache.hadoop.fs.Path(path)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    graft.core.FsOps.recoverRetired(fs, dir)
    val staging = s"${path}__staging"
    spark.range(1).select(lit(newBuckets).as("buckets"))
      .write.mode("overwrite").parquet(s"$staging/conf")
    spark.read.parquet(s"$path/meta")
      .write.mode("overwrite").parquet(s"$staging/meta")
    spark.read.schema(PostingsSchema).parquet(s"$path/postings")
      .drop("bucket")
      .withColumn("bucket",
        pmod(call_function("fnv64", col("term")), lit(newBuckets.toLong)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$staging/postings")
    graft.core.FsOps.swapInDir(fs, dir,
      new org.apache.hadoop.fs.Path(staging))
  }

  /** Gauge-triggered re-bucket of a persisted inverted index — the
    * [[graft.operators.Dedup.autoRebucketBandIndex]] policy over the
    * postings gauge: fixed-budget sampled read, per-bucket row
    * budget as the trigger, re-bucket to at least a doubling.
    * Retrieval results are bucket-count-invariant (per-term df is
    * exact in any layout — a term's postings all live in its one
    * bucket), so the trigger is pure COST policy.
    */
  def autoRebucketInvertedIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, rowsPerBucket: Long = Dedup.DefaultRowsPerBucket,
      gaugeK: Int = 8): Boolean = {
    val r = invertedIndexStatsSampled(spark, path, gaugeK).collect().head
    val maxLb = Dedup.nullSafeLong(r, "max_bucket_lb")
    val buckets = Dedup.nullSafeLong(r, "buckets")
    if (maxLb <= rowsPerBucket ||
        buckets >= Dedup.MaxStoreBuckets.toLong) false
    else {
      val target = math.min(Dedup.MaxStoreBuckets.toLong, math.max(
        Dedup.autoBuckets(Dedup.nullSafeLong(r, "est_rows"),
          rowsPerBucket).toLong,
        buckets * 2)).toInt
      rebucketInvertedIndex(spark, path, target)
      true
    }
  }

  /** Rebuild a persisted index's `meta` row from its postings — the
    * recovery path for a crash that lost meta mid-swap (every
    * document owns at least one posting row, even an empty text's
    * single empty-string token, so (doc_id, dl) pairs reconstruct the
    * corpus stats exactly).
    */
  def repairInvertedIndexMeta(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(spark.sessionState.newHadoopConf())
    val stage = new org.apache.hadoop.fs.Path(s"$path/meta_stage")
    spark.read.schema(PostingsSchema).parquet(s"$path/postings")
      .select("doc_id", "dl").distinct()
      .agg(count(lit(1)).as("n_docs"), sum("dl").as("total_tokens"))
      .write.mode("overwrite").parquet(stage.toString)
    graft.core.FsOps.deleteOrThrow(fs, metaPath)
    graft.core.FsOps.renameOrThrow(fs, stage, metaPath)
  }

  /** BM25 retrieval over a persisted [[buildInvertedIndex]] index —
    * identical arithmetic to [[bm25TopK]] (the shared [[bm25Score]]
    * stage; the differential spec pins row-for-row equality), with
    * zero corpus tokenization at query time. The query terms' bucket
    * ids are computed driver-side (a pure function of the query —
    * the legitimate driver work, mirroring how the queries themselves
    * arrive as driver data) and pushed as a STATIC `IN` filter on the
    * partition column, so only the touched buckets' posting files are
    * listed and read (PlanShapeSpec pins the PartitionFilters on the
    * scan); the term filter then rides a broadcast join. Per-term df
    * is computed over the pruned postings — exact, because a term's
    * postings all live in its one bucket.
    */
  def searchInvertedIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, queries: Seq[(Long, String)], k1: Double, b: Double,
      k: Int): DataFrame = {
    val buckets = invertedIndexBuckets(spark, path)
    val qterms = queryTerms(spark, queries)
    // the bucket list derives from the SAME Spark tokenization the
    // scorer uses (collected — it is query-sized driver data anyway):
    // a driver-side trim/split re-tokenization disagrees at the edges
    // (String.trim strips all ctrl chars where Spark's trim strips
    // spaces; String.split drops trailing empty tokens where Spark
    // keeps them) and a dropped edge-token's bucket would silently
    // prune postings the one-shot scorer counts
    val qbuckets = qterms.select("term").distinct().collect()
      .map(r => termBucket(r.getString(0), buckets)).distinct.toSeq
    val postings = spark.read.schema(PostingsSchema)
      .parquet(s"$path/postings")
      .filter(col("bucket").isin(qbuckets: _*))
    val tf = postings
      .join(broadcast(qterms.select("term").distinct()), "term")
      .select("doc_id", "dl", "term", "tf")
    val stats = spark.read.parquet(s"$path/meta")
    bm25Score(tf, qterms, stats, k1, b, k)
  }

  // ---------------------------------------------------------------
  // Tokenizer training (BPE merge learning)
  // ---------------------------------------------------------------

  /** Apply one BPE merge (l, r) → lr to a symbol array, left-to-right
    * greedy non-overlapping — the exact application rule
    * [[graft.functions.Bpe]] uses when counting, expressed as a fold
    * so both sides of the train/count loop share semantics.
    */
  private def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Learn a BPE merges table from the corpus — the training step
    * whose output feeds [[graft.functions.Bpe]]-style token counting.
    * Classic algorithm (Sennrich et al. ACL'16): pre-tokenize, count
    * word frequencies ONCE (the only corpus-scale pass), split words
    * into characters, then repeatedly (a) count adjacent symbol pairs
    * weighted by word frequency, (b) take the most frequent pair
    * (ties: count desc, then pair text asc — deterministic), and
    * (c) merge it greedily left-to-right in every word.
    *
    * Scale shape: the corpus pass is one map-side-combinable word
    * count; every round then runs over the WORD VOCABULARY (Zipf-
    * compressed — orders of magnitude smaller than the corpus), with
    * the pair/trigram counts map-side-combinable aggs and the
    * candidate fetch a small TakeOrdered. Each round's vocab is
    * localCheckpoint-ed so lineage stays flat (at cluster scale a
    * checkpoint table plays this role).
    *
    * BATCHED rounds: up to `batchSize` merges are learned per Spark
    * round, but ONLY a prefix that is provably identical to running
    * that many sequential rounds — the driver walks candidates in
    * (count desc, pair asc) order and stops at the first pair that
    * (a) shares a symbol with an earlier pick (its count may have
    * changed), (b) does not strictly out-count the trigram-derived
    * upper bound on pairs CREATED by earlier picks, or (c) follows a
    * pick whose merged symbol string already exists in the vocab
    * (the one channel by which an old pair's count can rise). A 50k-
    * merge tokenizer therefore spends its rounds where BPE is
    * genuinely sequential (created pairs dominating) and batches
    * through the flat tail. `onRound` fires once per Spark round
    * (test instrumentation). Returns (rank, left, right, pair_count)
    * in learned order — bit-identical to batchSize = 1.
    */
  def learnBpeMerges(docs: DataFrame, textCol: String, numMerges: Int,
      batchSize: Int = 8, onRound: Int => Unit = _ => ()): Seq[(Int, String, String, Long)] = {
    val vocab0 = docs
      .select(explode(TextFunctions.bpeTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(split(col("w"), "").as("syms"), col("freq"))
      .filter(size(col("syms")) > 1)
    var vocab = vocab0.localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    // rounds iterate over the pinned vocab only (the corpus tokenize
    // above keeps AQE) — static plans at the vocab's own width when
    // it is small (IterDriver), AQE untouched when big
    IterDriver.maybeStaticRoundsByWidth(docs.sparkSession, vocab) {
    while (merges.size < numMerges && !exhausted) {
      onRound(merges.size)
      val want = math.min(math.max(batchSize, 1), numMerges - merges.size)
      // one vocab-scale pass produces, per candidate pair: its count,
      // an upper bound on any pair a merge of it would CREATE (the
      // max trigram count containing it — created pairs (x,lr)/(lr,y)
      // arise only from trigrams (x,l,r)/(l,r,y)), and whether the
      // merged symbol string already exists in the vocab
      val pairs = vocab
        .select(col("freq"),
          explode(arrays_zip(
            slice(col("syms"), lit(1), size(col("syms")) - 1).as("l"),
            slice(col("syms"), lit(2), size(col("syms")) - 1).as("r"))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
      val tris = vocab.filter(size(col("syms")) > 2)
        .select(col("freq"),
          explode(arrays_zip(
            slice(col("syms"), lit(1), size(col("syms")) - 2).as("x"),
            slice(col("syms"), lit(2), size(col("syms")) - 2).as("y"),
            slice(col("syms"), lit(3), size(col("syms")) - 2).as("z"))).as("t"))
        .groupBy(col("t.x").as("x"), col("t.y").as("y"), col("t.z").as("z"))
        .agg(sum("freq").as("tc"))
      val leftBound = tris.groupBy(col("y").as("l"), col("z").as("r"))
        .agg(max("tc").as("lb"))
      val rightBound = tris.groupBy(col("x").as("l"), col("y").as("r"))
        .agg(max("tc").as("rb"))
      val existing = vocab.select(explode(col("syms")).as("sym")).distinct()
      val cand = pairs
        .join(leftBound, Seq("l", "r"), "left")
        .join(rightBound, Seq("l", "r"), "left")
        .join(existing, concat(col("l"), col("r")) === col("sym"), "left")
        .select(col("l"), col("r"), col("cnt"),
          greatest(coalesce(col("lb"), lit(0L)),
            coalesce(col("rb"), lit(0L))).as("adj"),
          col("sym").isNotNull.as("lr_exists"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(math.max(want * 4, 16)).collect()
      // driver walk in (cnt desc, pair asc) order: the batch prefix is
      // provably what `want` sequential rounds would pick, because
      // between picks (a) non-picked old pair counts can only FALL
      // (they rise only via a created symbol colliding with an
      // existing one — the lr_exists stop), (b) created pairs start
      // from zero and stay <= createdBound < every later pick's count,
      // and (c) picks are symbol-disjoint so their own counts and
      // applications are independent
      val used = scala.collection.mutable.Set.empty[String]
      val batch = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var createdBound = 0L
      var stop = false
      var i = 0
      while (!stop && i < cand.length && batch.size < want) {
        val (l, r, cnt, adj, lrExists) = (cand(i).getString(0), cand(i).getString(1),
          cand(i).getLong(2), cand(i).getLong(3), cand(i).getBoolean(4))
        if (cnt < 2) stop = true
        else if (batch.nonEmpty && (used(l) || used(r) || cnt <= createdBound))
          stop = true
        else {
          batch += ((l, r, cnt))
          used += l; used += r
          createdBound = math.max(createdBound, adj)
          // a merged symbol colliding with an existing one lets later
          // old-pair counts RISE mid-round — sound only sequentially
          if (lrExists) stop = true
        }
        i += 1
      }
      if (batch.isEmpty) exhausted = true
      else {
        batch.foreach { case (l, r, cnt) =>
          merges += ((merges.size, l, r, cnt))
        }
        val applied = batch.foldLeft(col("syms")) { case (acc, (l, r, _)) =>
          applyMerge(acc, l, r)
        }
        vocab = vocab
          .select(applied.as("syms"), col("freq"))
          .filter(size(col("syms")) > 1)
          .localCheckpoint(true)
      }
    }
    }
    merges.toSeq
  }

  // ---------------------------------------------------------------
  // Train/val/test split
  // ---------------------------------------------------------------

  /** Deterministic train/val/test assignment + global shuffle key —
    * the last step before a corpus ships to a trainer. The split
    * reuses [[sampleBucket]]'s id-hash [[idMix]] (val = buckets
    * [0, valPct), test = [valPct, valPct+testPct), train = the rest)
    * so membership is a pure function of the id: re-runs, backfills
    * and late-arriving shards land in the same split without any
    * coordination. `shuffle_key` is the un-bucketed 32-bit hash —
    * sorting any shard by it yields the deterministic global training
    * order without a global sort ever executing.
    *
    * Scale shape: map-only (no shuffle, no state); both columns are
    * BIGINT-exact arithmetic the oracle replays verbatim.
    */
  /** The ONE split-hash arithmetic ([[sampleBucket]]'s un-bucketed
    * fold) and val/test/train bucket chain — shared by
    * [[assignSplits]] and [[leakageSafeSplits]] so the two split
    * faces cannot de-synchronize.
    */
  private def splitHash(key: Column): Column = idMix(key)

  private def splitOf(key: Column, valPct: Int, testPct: Int): Column = {
    val bucket = splitHash(key) % 100
    when(bucket < valPct, lit("val"))
      .when(bucket < valPct + testPct, lit("test"))
      .otherwise(lit("train"))
  }

  def assignSplits(docs: DataFrame, idCol: String,
      valPct: Int, testPct: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      splitOf(col(idCol), valPct, testPct).as("split"),
      splitHash(col(idCol)).as("shuffle_key"))

  /** Curriculum ordering — the deterministic training-stream export:
    * every document gets a contiguous global `order_idx` realizing
    * the order (quality bin DESC, shuffle_key, doc_id) — high-quality
    * documents first (the standard easy→hard curriculum), shuffled
    * within each bin by the same id-hash [[assignSplits]] uses, so
    * the stream order is reproducible from ids alone. `bin` is the
    * score's position among `nBins` equal-width slices of the
    * [min, max] score range (broadcast two-value stats; integer
    * arithmetic, degenerate max = min → one bin).
    *
    * The global index is computed WITHOUT a global sort or a
    * single-partition window — the two-phase distributed ranking
    * pattern: (1) a (bin, bucket)-keyed count histogram (bucket = the
    * shuffle_key's top `bucketBits` bits, a monotone prefix of the
    * within-bin order, so bucket order IS key order), cumulated into
    * per-group offsets over a ≤ nBins·2^bucketBits-row relation
    * (tiny — its single-partition window is over the histogram, not
    * the corpus); (2) offsets broadcast back and added to a
    * row_number windowed per (bin, bucket) — partitions are
    * corpus/2^bucketBits-sized, the knob that keeps them
    * executor-memory-bounded at 100 TB. The DuckDB oracle computes
    * the same index as ONE naive global ROW_NUMBER, so the gate
    * proves the distributed two-phase ranking equals the total
    * order it claims to realize.
    */
  def curriculumOrder(docs: DataFrame, idCol: String, textCol: String,
      nBins: Int = 4, bucketBits: Int = 6): DataFrame = {
    require(nBins >= 1 && bucketBits >= 0 && bucketBits <= 31)
    val scored = Dedup.barrier(
      unigramMeanProb(docs, idCol, textCol)
        .select(col("doc_id"), expr("hit_mass div n_tokens").as("score")),
      col("doc_id"))
    val mm = scored.agg(min(col("score")).as("mn"), max(col("score")).as("mx"))
    // barrier: keyed feeds the histogram AND the final join; without
    // it the tokenize+score lineage re-runs per consumer
    val keyed = Dedup.barrier(
      scored.crossJoin(broadcast(mm))
        .select(col("doc_id"), col("score"),
          expr(s"((score - mn) * $nBins) div (mx - mn + 1)").as("bin"),
          idMix(col("doc_id")).as("shuffle_key"))
        .withColumn("bucket",
          expr(s"shuffle_key div ${1L << (32 - bucketBits)}")),
      col("doc_id"))
    val hist = keyed.groupBy("bin", "bucket").agg(count(lit(1)).as("cnt"))
    val wOff = Window.orderBy(col("bin").desc, col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = hist.withColumn("cum", sum(col("cnt")).over(wOff))
      .select(col("bin"), col("bucket"), (col("cum") - col("cnt")).as("off"))
    val wIn = Window.partitionBy("bin", "bucket")
      .orderBy(col("shuffle_key"), col("doc_id"))
    keyed.join(broadcast(offs), Seq("bin", "bucket"))
      .select(col("doc_id"), col("score"), col("bin"), col("shuffle_key"),
        (col("off") + row_number().over(wIn)).cast("long").as("order_idx"))
  }

  /** PROPORTIONAL SOURCE INTERLEAVING — the serialization order that
    * turns a multi-source mixture into one stream WITHOUT long
    * same-source runs (the training-dynamics failure mode of
    * concatenating sources: a model sees a million contiguous code
    * documents, then a million of web). Classic stride scheduling:
    * each document's position key is its source-consumption fraction
    * `((rn−1) · 2²⁰) div nₛ` (rn = the doc's deterministic
    * within-source rank by the shared id-hash, nₛ = source size), so
    * walking keys ascending consumes every source at a rate
    * proportional to its share — a source with 10% of the corpus
    * appears ~every 10th document. Ties (key granularity 2²⁰) break
    * on the id-hash, which mixes sources inside a tie bucket rather
    * than clumping them. Returns a contiguous global `order_idx`
    * realizing (key, hash, id).
    *
    * Scale shape: NO global sort and no per-source global sort —
    * both ranking passes use the [[curriculumOrder]] two-phase
    * pattern (bucket = the monotone high bits of the sort key, a
    * tiny cumulated histogram broadcasts per-group offsets, within-
    * group row_number over corpus/2^bucketBits-bounded partitions).
    * Phase A buckets (source, hash-prefix) for the within-source
    * rank; phase B buckets the interleave key's prefix for the
    * global index. One barrier exchange per phase feeds both that
    * phase's histogram and its window (hash partitioning on the
    * bucket key satisfies both). The DuckDB oracle computes both
    * ranks as naive global ROW_NUMBERs, so the gate proves the
    * distributed two-phase ranking realizes the exact total order.
    */
  def interleaveOrder(docs: DataFrame, idCol: String, sourceCol: String,
      bucketBits: Int = 6): DataFrame = {
    require(bucketBits >= 0 && bucketBits <= 20)
    val base = Dedup.barrier(
      docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"))
        .withColumn("h", idMix(col("doc_id")))
        .withColumn("b1", expr(s"h div ${1L << (32 - bucketBits)}")),
      col("source"), col("b1"))
    // phase A: within-source rank in (h, doc_id) order
    val hist1 = base.groupBy("source", "b1").agg(count(lit(1)).as("cnt"))
    val w1 = Window.partitionBy("source").orderBy("b1")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val off1 = hist1.withColumn("cum", sum("cnt").over(w1))
      .select(col("source"), col("b1"), (col("cum") - col("cnt")).as("off1"))
    val wIn1 = Window.partitionBy("source", "b1").orderBy("h", "doc_id")
    val ns = base.groupBy("source").agg(count(lit(1)).as("ns"))
    val ranked = base.join(broadcast(off1), Seq("source", "b1"))
      .withColumn("rn", (col("off1") + row_number().over(wIn1)).cast("long"))
      .join(broadcast(ns), "source")
      .withColumn("key", expr(s"((rn - 1) * ${1L << 20}) div ns"))
    // phase B: global index over (key, h, doc_id)
    val keyed = Dedup.barrier(
      ranked.withColumn("b2", expr(s"key div ${1L << (20 - bucketBits)}")),
      col("b2"))
    val hist2 = keyed.groupBy("b2").agg(count(lit(1)).as("cnt"))
    val w2 = Window.orderBy("b2")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val off2 = hist2.withColumn("cum", sum("cnt").over(w2))
      .select(col("b2"), (col("cum") - col("cnt")).as("off2"))
    val wIn2 = Window.partitionBy("b2").orderBy("key", "h", "doc_id")
    keyed.join(broadcast(off2), Seq("b2"))
      .select(col("doc_id"), col("source"), col("rn"), col("key"),
        (col("off2") + row_number().over(wIn2)).cast("long").as("order_idx"))
  }

  /** In-engine classifier TRAINING: batch perceptron over hashed
    * bag-of-words features — the training face of
    * [[hashedLinearScore]] (which consumes exactly the weight layout
    * this emits). Features are token PolyHash mod F counts; labels
    * ±1 from `positive`; each round scores every document against
    * the current weights, and the per-bucket gradient Σ y·x over the
    * MISCLASSIFIED set (y·score ≤ 0 — with zero init, round 1 is the
    * classic everything-misclassified step) adds into the weights.
    * Everything is BIGINT — counts, scores, gradients — so the DuckDB
    * oracle replays all `rounds` unrolled rounds weight-for-weight.
    *
    * Scale shape: the feature relation builds once (one tokenize
    * pass, barriered on doc_id) and every round is two aggregations
    * over it — a per-doc score sum (weights ride as an F-entry
    * literal array, the broadcast degenerate case) and a per-bucket
    * gradient join co-partitioned on the barrier key. The driver
    * collects F longs per round (bounded, the same legitimate
    * iterative-driver pattern as Lloyd/BPE). At 100 TB each round is
    * two passes over a skinny (doc, bucket, cnt) relation — no
    * per-sample sequential dependence anywhere.
    */
  def perceptronTrain(docs: DataFrame, idCol: String, textCol: String,
      positive: Column, f: Int = 64, rounds: Int = 3): DataFrame = {
    require(f >= 1 && rounds >= 1)
    GraftFunctions.register(docs.sparkSession)
    val spark = docs.sparkSession
    val feats = Dedup.barrier(
      docs.select(col(idCol).as("doc_id"),
          when(positive, 1L).otherwise(-1L).as("y"),
          explode(TextFunctions.tokens(col(textCol))).as("tk"))
        .select(col("doc_id"), col("y"),
          pmod(call_function("poly_hash", col("tk")), lit(f.toLong)).as("bucket"))
        .groupBy("doc_id", "y", "bucket").agg(count(lit(1)).as("cnt")),
      col("doc_id")).localCheckpoint()
    val w = Array.fill(f)(0L)
    // rounds iterate over the pinned feature relation only — static
    // plans at its own width when it is small (IterDriver; the AQE
    // per-stage jobs were the round cost), AQE untouched when big
    IterDriver.maybeStaticRoundsByWidth(spark, feats) {
      for (_ <- 1 to rounds) {
        val wArr = array(w.map(lit): _*)
        val mis = feats
          .groupBy("doc_id", "y")
          .agg(sum(col("cnt") *
            element_at(wArr, col("bucket").cast("int") + 1)).as("score"))
          .filter(col("y") * col("score") <= 0)
          .select("doc_id")
        val grad = feats.join(mis, "doc_id")
          .groupBy("bucket")
          .agg(sum(col("y") * col("cnt")).as("g"))
          .collect()
        grad.foreach(r => w(r.getLong(0).toInt) += r.getLong(1))
      }
    }
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      (0 until f).map(b =>
        org.apache.spark.sql.Row(b.toLong, w(b))).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("bucket",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("weight",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Materialize the training stream: write `docs` as order-ranged
    * parquet shards — the export step after curation and
    * [[curriculumOrder]], turning a logical global order into files
    * a trainer can consume sequentially. `repartitionByRange` on the
    * order column gives each shard a CONTIGUOUS, DISJOINT order
    * range (the range exchange is exactly the partitioning step of a
    * distributed sort — sampled bounds, no global single point), and
    * `sortWithinPartitions` orders rows inside each shard, so
    * reading shards by ascending range replays the total order.
    * Returns the shard manifest (file, rows, min/max order) read
    * back from what was actually written — the manifest IS the
    * verification that ranges tile.
    *
    * Scale shape: one range exchange over the export relation; at
    * 100 TB shard count is corpus/shard-size and AQE's sampled range
    * bounds keep shards balanced (`maxRecordsPerFile` is the
    * belt-and-braces file-size cap on skewed ranges).
    */
  def exportShards(docs: DataFrame, orderCol: String, nShards: Int,
      outPath: String, maxRecordsPerFile: Long = 0L): DataFrame = {
    require(nShards >= 1)
    val writer = docs.repartitionByRange(nShards, col(orderCol))
      .sortWithinPartitions(orderCol)
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
      writer.option("maxRecordsPerFile", maxRecordsPerFile)
    else writer).parquet(outPath)
    docs.sparkSession.read.parquet(outPath)
      .groupBy(input_file_name().as("shard"))
      .agg(count(lit(1)).as("rows"),
        min(col(orderCol)).as("min_order"),
        max(col(orderCol)).as("max_order"))
      .orderBy("min_order")
  }

  // ---------------------------------------------------------------
  // Hashed importance reweighting (DSIR-style)
  // ---------------------------------------------------------------

  /** Importance reweighting over hashed bigram features — the DSIR
    * recipe (Xie et al., "Data Selection for Language Models via
    * Importance Resampling", NeurIPS 2023): estimate a target and a
    * raw feature distribution over hashed n-grams, score every
    * document by how target-like its features are, and keep the
    * documents that lean target. Published DSIR scores with float
    * log-likelihood ratios; this implementation uses add-1-smoothed
    * SCALED INTEGER ratios — w(b) = ((cnt_target(b)+1)·scale) div
    * (cnt_raw(b)+1) — so every per-bucket weight, per-document mass,
    * and the final verdict are exact BIGINT arithmetic the DuckDB
    * oracle replays bit-for-bit (the same quantization contract as
    * the t45 classifier and the PQ/BM25 scaled-long paths; ranking is
    * preserved because x ↦ x·scale div y is monotone in x/y).
    *
    * Per document: `n_grams` bigrams, `ratio_mass` = Σ w(bucket of
    * gram), `avg_w` = ratio_mass div n_grams, and `keep` = avg_w ≥
    * the corpus-wide mean gram weight (docs at least as target-like
    * as the average occurrence). Documents with < 2 tokens carry
    * n_grams = 0, avg_w = 0, keep = false.
    *
    * Scale shape: bigrams come from the fused [[graft.functions.NGrams]]
    * + [[graft.functions.PolyHashArray]] codegen pass (no per-gram
    * string churn off the scan); the bucket-count shuffle is map-side
    * combinable down to ≤ `buckets` rows per partition; the weight
    * table (≤ `buckets` rows of two longs) BROADCASTS back onto the
    * gram stream; the per-doc reduce is map-side combinable; and the
    * corpus mean is a 1-row broadcast. Nothing corpus-sized shuffles
    * except the (doc_id, bucket-weight) partial sums — at 100 TB this
    * is two scans and two skinny aggregations, the same shape as t29.
    */
  def importanceReweight(docs: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 1024,
      scale: Long = 1048576L): DataFrame = {
    require(buckets > 0, "need at least one feature bucket")
    GraftFunctions.register(docs.sparkSession)
    val grams = docs.select(col(idCol).as("doc_id"),
        targetPred.as("is_target"),
        explode(call_function("poly_hash_array",
          multisetGrams(TextFunctions.tokens(col(textCol)), 2),
          lit(false))).as("h"))
      .select(col("doc_id"), col("is_target"),
        pmod(col("h"), lit(buckets.toLong)).as("b"))
    // barrier: the gram stream feeds both the bucket histogram and
    // the per-doc mass join; without it the tokenize+hash lineage
    // re-runs per consumer (the Dedup.sigBands hazard)
    val g = Dedup.barrier(grams, col("doc_id"))
    val weights = g.groupBy("b")
      .agg(sum(when(col("is_target"), 1L).otherwise(0L)).as("cnt_t"),
        count(lit(1)).as("cnt_r"))
      .select(col("b"),
        expr(s"(cnt_t + 1) * ${scale}L div (cnt_r + 1)").as("w"),
        col("cnt_r"))
    val mean = weights
      .agg(expr("sum(w * cnt_r) div sum(cnt_r)").as("mean_w"))
    val mass = g.join(broadcast(weights.select("b", "w")), "b")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"), sum("w").as("ratio_mass"))
    docs.select(col(idCol).as("doc_id"))
      .join(mass, Seq("doc_id"), "left")
      .crossJoin(broadcast(mean))
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("ratio_mass"), lit(0L)).as("ratio_mass"),
        coalesce(expr("ratio_mass div n_grams"), lit(0L)).as("avg_w"),
        (coalesce(expr("ratio_mass div n_grams"), lit(0L))
          >= col("mean_w")).as("keep"))
  }

  /** SFT chat-template rendering with LOSS-MASK spans — the export
    * step that turns sessionized interaction logs into supervised
    * fine-tuning rows. Each (user, 30-min-gap session) becomes ONE
    * training example: the turns are rendered in time order as
    *
    *   `<|role|>event_type:value_cents<|end|>` ...
    *
    * and the loss mask lists the character spans of the ASSISTANT
    * turns' content (role tag and end tag excluded) — the spans an
    * SFT trainer computes loss over, serialized `start-end;start-end`
    * in turn order, with `loss_chars` their total width.
    *
    * Determinism: timestamps stay in the exact µs integer envelope
    * ([[graft.Tables.eventsNanos]] discipline), values are scaled to
    * integer cents by one pure-double FLOOR, and every offset is an
    * exact integer running sum of rendered-fragment lengths, so the
    * rendered string and mask are bit-identical across engines.
    *
    * Scale shape: ONE shuffle on the session partition key (`userCol`).
    * The sessionize window partitions by user; the offset window's
    * (user, session) keys are a refinement of that clustering, so
    * Catalyst inserts only a re-sort, and the final per-session
    * aggregate is likewise satisfied by the same exchange — asserted
    * in PlanShapeSpec. Per-group state is one session's fragments
    * (human-interaction-sized, bounded), never a user's full history.
    *
    * @param userRoles event types rendered with the `user` role (loss
    *   masked OUT); every other type renders as `assistant` (loss ON).
    */
  def sftChatRender(events: DataFrame, userCol: String, tsUsCol: String,
      ordCol: String, typeCol: String, valueCol: String,
      userRoles: Seq[String], gapUs: Long = 1800L * 1000000L): DataFrame = {
    val wUser = Window.partitionBy("user_id").orderBy("tsu", "ord")
    val run = wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = events
      .select(col(userCol).as("user_id"), col(tsUsCol).as("tsu"),
        col(ordCol).as("ord"), col(typeCol).as("etype"),
        floor(col(valueCol) * 100 + lit(0.5)).cast("long").as("cents"))
      .withColumn("role",
        when(col("etype").isInCollection(userRoles), "user")
          .otherwise("assistant"))
      .withColumn("new_s",
        when(lag(col("tsu"), 1).over(wUser).isNull ||
          col("tsu") - lag(col("tsu"), 1).over(wUser) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(run))
      .withColumn("frag", concat(lit("<|"), col("role"), lit("|>"),
        col("etype"), lit(":"), col("cents").cast("string"), lit("<|end|>")))
    val wSess = Window.partitionBy("user_id", "session_id")
      .orderBy("tsu", "ord")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // assistant-turn content span: [off_end - len(frag) + len("<|assistant|>"),
    //                               off_end - len("<|end|>"))
    val spanStart = col("off_end") - length(col("frag")) + lit(13)
    val spanEnd = col("off_end") - lit(7)
    sess
      .withColumn("off_end",
        sum(length(col("frag")).cast("long")).over(wSess))
      .groupBy("user_id", "session_id")
      .agg(
        concat_ws("", transform(
          array_sort(collect_list(struct(col("tsu"), col("ord"),
            col("frag")))),
          x => x.getField("frag"))).as("rendered"),
        count(lit(1)).as("n_turns"),
        sum(when(col("role") === "assistant", 1L).otherwise(0L))
          .as("n_loss_turns"),
        concat_ws(";", transform(
          array_sort(collect_list(when(col("role") === "assistant",
            struct(col("tsu"), col("ord"),
              concat(spanStart.cast("string"), lit("-"),
                spanEnd.cast("string")).as("span"))))),
          x => x.getField("span"))).as("loss_mask"),
        coalesce(sum(when(col("role") === "assistant",
          spanEnd - spanStart)), lit(0L)).as("loss_chars"))
  }

  /** Line-level Gopher repetition rules — the published bundle's
    * LINE-wise half ([[gopherRules]] implements the five word-level
    * rules; these are the two the fixture's single-line text couldn't
    * exercise until rendered multi-line): a document is removed when
    * more than 90% of its lines START with a bullet, or more than 30%
    * END with an ellipsis. Both fractions are single integer
    * cross-multiplications (bullet·10 ≤ lines·9, ellipsis·10 ≤
    * lines·3) — no floats, so the verdicts replay bit-exact.
    * Bullet markers: `- `, `* `, `• `; ellipsis: `...` or `…`.
    *
    * Scale shape: one map-only pass — split on newline, two
    * short-circuiting array filters, per-row arithmetic; nothing
    * shuffles and the whole row stays inside codegen.
    */
  def gopherLineRules(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n")
    docs.select(col(idCol),
        size(lines).cast("long").as("n_lines"),
        size(filter(lines, l => l.startsWith("- ") || l.startsWith("* ") ||
          l.startsWith("• "))).cast("long").as("bullet_lines"),
        size(filter(lines, l => l.endsWith("...") || l.endsWith("…")))
          .cast("long").as("ellipsis_lines"))
      .withColumn("bullet_ppm",
        expr("(bullet_lines * 1000000) div greatest(n_lines, 1)"))
      .withColumn("ellipsis_ppm",
        expr("(ellipsis_lines * 1000000) div greatest(n_lines, 1)"))
      .withColumn("ok_bullet", col("bullet_lines") * 10L <= col("n_lines") * 9L)
      .withColumn("ok_ellipsis",
        col("ellipsis_lines") * 10L <= col("n_lines") * 3L)
      .withColumn("keep", col("ok_bullet") && col("ok_ellipsis"))
  }

  /** Line-frequency boilerplate strip — the C4/CCNet line-dedup rule:
    * a normalized line (lower + trim) occurring in at least `minDocs`
    * DISTINCT documents is boilerplate (navigation, footers, legal
    * chrome) and every occurrence is removed; each document returns
    * its line count, kept count, the kept text reassembled in
    * original line order, and the stripped fraction in exact ppm.
    *
    * Scale shape: the explode is map-side; the line-frequency census
    * is one keyed groupBy on the normalized line (map-side combined —
    * the shuffle carries distinct lines, not occurrences, after the
    * per-doc distinct); occurrences recover their verdict by joining
    * the census back on the same key (corpus-scaled — never
    * broadcast); reassembly is one groupBy on the doc id with an
    * array_sort over (pos, line) — per-document data, no corpus
    * window, no global sort anywhere.
    */
  def stripBoilerplateLines(docs: DataFrame, idCol: String,
      textCol: String, minDocs: Int): DataFrame = {
    require(minDocs >= 2,
      s"minDocs must be >= 2 (1 would strip everything), got $minDocs")
    val lines = docs
      .select(col(idCol).as("__bp_doc"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("norm", lower(trim(col("line"))))
    val census = lines.select("__bp_doc", "norm").distinct()
      .groupBy("norm").agg(count(lit(1)).as("line_docs"))
    lines.join(census, "norm")
      .withColumn("keep", col("line_docs") < minDocs)
      .groupBy(col("__bp_doc").as(idCol))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(array_sort(collect_list(
            when(col("keep"), struct(col("pos"), col("line"))))),
          x => x.getField("line")), "\n").as("kept_text"))
      .withColumn("stripped_ppm",
        expr("((n_lines - n_kept) * 1000000) div greatest(n_lines, 1)"))
  }

  /** 2-D mixture allocator — the JOINT (source × quality-bin)
    * token-budget design that [[tokenBudgetSample]] (budgets by
    * source, t39) and [[qualityPrune]] (prunes by quality, t37)
    * each do only half of: per source, spend the source's token
    * budget on its HIGHEST-quality bins first (integer water-filling
    * down the bin ladder), so the mixture designer reads, per cell,
    * how many tokens the recipe takes and where each source's water
    * level lands. Quality axis: stopword density in exact ppm
    * (dictHits·1e6 div tokens — one of the t01 quality features),
    * laddered into `bins` equal ppm bands; bin `bins−1` is the
    * stopword-densest (most natural-language-like) and fills first.
    *
    * Budgets are data-proportional: budget(s) = src_tokens div
    * divisor(s) — a fixed absolute budget stops exercising the ladder
    * the moment the corpus grows, while a divisor keeps the water
    * level mid-distribution at every scale (the oracle replays the
    * same integer division off the same aggregate). Sources without a
    * divisor are out of the mixture and emit no cells. Only realized
    * cells emit (a GROUP BY, not a static cross — empty cells carry
    * no tokens and no decision).
    *
    * Per cell: doc/token mass, the bin-descending cumulative mass,
    * the source totals and budget, taken_tokens = clamp(budget −
    * mass_above, 0, cell_tokens), its fill ratio in exact ppm, and
    * the full/partial/none verdict. Exactly one cell per source is
    * `partial` unless the budget lands on a bin boundary — the
    * broadcast threshold a map-side doc filter consumes (the t72/t74
    * shape: the ≤|sources|·bins cell relation is the only state).
    *
    * Scale shape: ONE tokenize pass collapses the corpus to ≤
    * |sources|·bins cells (map-side combinable); totals, the window,
    * and all arithmetic run on that index-sized relation with
    * broadcast joins. Nothing row-sized survives the first
    * aggregation.
    */
  def mixtureBudgetCells(docs: DataFrame, textCol: String,
      sourceCol: String, divisors: Map[String, Long],
      bins: Int = 10): DataFrame = {
    require(divisors.nonEmpty && divisors.values.forall(_ >= 1L),
      "divisors must be >= 1")
    import docs.sparkSession.implicits._
    mixtureBudgetCellsCore(docs, textCol, sourceCol, bins,
      _.join(broadcast(divisors.toSeq.toDF("source", "divisor")), "source"))
  }

  /** [[mixtureBudgetCells]] with the divisor DERIVED from the source
    * name (a `divisor` expression over the `source` column) instead of
    * an enumerated map — the closed-universe map silently drops any
    * source it doesn't list (inner join), which diverges from an
    * oracle that computes a divisor for EVERY source. A null or < 1
    * derived divisor raises loudly (folded into the consumed column)
    * rather than mis-budgeting.
    */
  def mixtureBudgetCellsBy(docs: DataFrame, textCol: String,
      sourceCol: String, divisor: Column, bins: Int = 10): DataFrame =
    mixtureBudgetCellsCore(docs, textCol, sourceCol, bins,
      _.withColumn("divisor",
        when(divisor.isNull || divisor < 1L,
          raise_error(concat(lit("mixtureBudgetCellsBy: derived divisor" +
            " is null or < 1 for source '"), col("source"), lit("'"))))
          .otherwise(divisor)))

  private def mixtureBudgetCellsCore(docs: DataFrame, textCol: String,
      sourceCol: String, bins: Int,
      withDivisor: DataFrame => DataFrame): DataFrame = {
    require(bins > 0 && 1000000 % bins == 0,
      s"bins must divide 1e6, got $bins")
    val binW = 1000000 / bins
    val perDoc = docs.select(col(sourceCol).as("source"),
        greatest(TextFunctions.nTokens(col(textCol)), lit(1L)).as("nt"),
        TextFunctions.dictHits(col(textCol), TextFunctions.Stopwords)
          .as("hits"))
      .select(col("source"), col("nt"),
        least(lit((bins - 1).toLong),
          expr(s"((hits * 1000000) div nt) div $binW")).as("bin"))
    val cells = perDoc.groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("cell_tokens"))
      .localCheckpoint() // index-sized, two consumers (totals + ladder)
    val budgets = withDivisor(cells.groupBy("source")
        .agg(sum("cell_tokens").as("src_tokens")))
      .select(col("source"), col("src_tokens"),
        expr("src_tokens div divisor").as("budget"))
    val ladder = Window.partitionBy("source").orderBy(col("bin").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.join(broadcast(budgets), "source")
      .withColumn("cum_tokens", sum("cell_tokens").over(ladder))
      .withColumn("taken_tokens", greatest(lit(0L), least(
        col("cell_tokens"),
        col("budget") - (col("cum_tokens") - col("cell_tokens")))))
      .select(col("source"), col("bin"), col("n_docs"),
        col("cell_tokens"), col("cum_tokens"), col("src_tokens"),
        col("budget"), col("taken_tokens"),
        expr("(taken_tokens * 1000000) div greatest(cell_tokens, 1)")
          .as("fill_ppm"),
        when(col("taken_tokens") === col("cell_tokens"), lit("full"))
          .when(col("taken_tokens") > 0L, lit("partial"))
          .otherwise(lit("none")).as("status"))
  }
}
