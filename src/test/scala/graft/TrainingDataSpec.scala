package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dedup, Multimodal, Similarity}
import graft.functions.{Fnv64, PolyHash}

/** Operator-level tests for the training-data pipeline at sf0.001
  * (500 docs / 500 embeddings — fast, deterministic).
  */
class TrainingDataSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("PolyHash matches its interpreted/codegen contract") {
    assert(PolyHash.eval("") == 0L)
    assert(PolyHash.eval("a") == 'a'.toLong)
    assert(PolyHash.eval("ab") == ('a'.toLong * 31 + 'b'.toLong) % 2147483647L)
  }

  test("Fnv64 is the standard FNV-1a") {
    // Known vector: fnv1a-64("a") = 0xaf63dc4c8601ec8c
    assert(Fnv64.eval("a".getBytes("UTF-8")) == 0xaf63dc4c8601ec8cL)
  }

  test("exact dedup keeps one row per distinct text") {
    val docs = Tables.documents(spark, dir)
    val deduped = Dedup.exact(docs, "doc_id", "text")
    val distinctTexts = docs.select("text").distinct().count()
    assert(deduped.count() == distinctTexts)
  }

  test("minhash LSH recalls high-similarity jaccard pairs") {
    val docs = Tables.documents(spark, dir)
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.7, 100000)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 3, 64, 16, 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall over ${exact.size} pairs")
    assert(lsh.subsetOf(exact), "LSH pairs are jaccard-verified, so no false positives")
  }

  test("simhash of identical texts is identical, near-dups are close") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "completely different words entirely unrelated text corpus")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs((1L, 2L)) == 0L)
    assert(pairs.get((1L, 3L)).exists(_ <= 16L))
    assert(!pairs.keySet.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("brute-force ANN: top-1 neighbor of a vector's twin is the twin") {
    val emb = Tables.embeddings(spark, dir)
    val topk = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 3)
    // cosine(v, v') where v' = v must rank first: duplicate a vector
    import org.apache.spark.sql.functions._
    val dup = emb.limit(1).withColumn("vec_id", lit(999999L))
    val got = Similarity.bruteForceTopK(emb.union(dup), "vec_id", "embedding", 1)
      .filter(col("vec_id") === 999999L).select("neighbor_id").collect()
    val origId = emb.limit(1).select("vec_id").collect()(0).getLong(0)
    assert(got.head.getLong(0) == origId)
    assert(topk.groupBy("vec_id").count().filter(col("count") =!= 3).count() == 0)
  }

  test("LSH ANN buckets have positive recall vs brute force") {
    val emb = Tables.embeddings(spark, dir)
    import org.apache.spark.sql.functions._
    val exact1 = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 1)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh1 = Similarity.lshTopK(emb, "vec_id", "embedding", 1, 64, 4)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact1 & lsh1).size.toDouble / exact1.size
    assert(recall > 0.1, s"sign-LSH(4 planes) top-1 recall $recall")
  }

  test("multimodal payload plumbing round-trips sizes and features") {
    val docs = Tables.documents(spark, dir)
    val feats = Multimodal.extractFeatures(
      Multimodal.withPayload(docs, "doc_id", "text"), "doc_id")
    import org.apache.spark.sql.functions._
    assert(feats.count() == docs.count())
    // n_bytes equals text length for the ascii fixture corpus
    val joined = feats.join(docs, "doc_id")
      .filter(col("n_bytes") =!= length(col("text")).cast("long"))
    assert(joined.count() == 0)
    val row = feats.orderBy("doc_id").limit(1).collect()(0)
    assert(row.getSeq[Double](row.fieldIndex("feature")).length == 8)
  }
}
