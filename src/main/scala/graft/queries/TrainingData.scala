package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{GraftFunctions, TextFunctions}
import graft.operators.{Dedup, Multimodal, Similarity}

/** Training-data pipeline queries over the `documents` / `embeddings`
  * / `events` fixtures: dedup, similarity search, text analysis,
  * multimodal plumbing. These are first-class operators of the engine
  * (builder brief), each wired to a DuckDB oracle where the semantics
  * are SQL-expressible; the hash-based ops (MinHash, SimHash, LSH
  * buckets) get rows-only checks and ScalaTest coverage instead.
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

  /** MinHash+LSH near-dup pairs (rows-only check; recall vs exact
    * Jaccard asserted in ScalaTest).
    */
  def dedupMinhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(Tables.documents(spark, dir), "doc_id", "text",
        n = 3, numPerms = 64, bands = 16, threshold = 0.05)
      .orderBy("id_a", "id_b")

  /** SimHash near-dup pairs (rows-only check). */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(Tables.documents(spark, dir), "doc_id", "text",
        maxHamming = 6)
      .orderBy("id_a", "id_b")

  /** Exact brute-force cosine top-3 neighbors per embedding. */
  def annBruteTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(Tables.embeddings(spark, dir), "vec_id", "embedding", 3)
      .orderBy("vec_id", "rank")

  /** LSH-bucketed approximate top-3 (rows-only; recall in ScalaTest). */
  def annLshTopK(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(Tables.embeddings(spark, dir), "vec_id", "embedding",
        k = 3, dim = 64, planes = 8)
      .orderBy("vec_id", "rank")

  /** Embedding near-duplicate pairs (cosine >= 0.5). */
  def embNearDup(spark: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(Tables.embeddings(spark, dir), "vec_id", "embedding", 0.5)
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
  )

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
    )
  }
}
