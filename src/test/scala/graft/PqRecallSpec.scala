package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** PQ-ADC retrieval quality: approximate top-k against the exact
  * squared-L2 top-k on the fixture, at the shipped m=8/ksub=64
  * configuration (measured 0.33 here vs 0.13 at the coarser m=4/
  * ksub=16 — recall scales with m*log2(ksub) bits). The floor
  * catches regressions in the encode/LUT plumbing (a broken code
  * join sends recall to ~0, chance is ~0.01); it does not certify
  * state-of-the-art recall, which needs k-means codebooks.
  */
class PqRecallSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("ADC top-5 overlaps exact L2 top-5 well above chance") {
    val emb = Tables.embeddings(spark, dir)
    val qids = Seq(0L, 7L, 42L)
    val adc = Similarity.pqAdcTopK(emb, "vec_id", "embedding", qids, k = 5, m = 8, ksub = 64)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // exact squared-L2 top-5 per query (the metric ADC approximates)
    val e = transform(col("embedding"), x => x.cast("double"))
    val v = emb.select(col("vec_id"), e.as("e"))
    val q = v.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val d2 = Similarity.dot(col("qe"), col("qe")) -
      lit(2.0) * Similarity.dot(col("qe"), col("e")) +
      Similarity.dot(col("e"), col("e"))
    val w = Window.partitionBy("qid").orderBy(col("d2"), col("vec_id"))
    val exact = q.crossJoin(v).filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"), d2.as("d2"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (adc & exact).size.toDouble / exact.size
    info(f"ADC top-5 recall vs exact L2: $recall%.2f")
    // chance level for 5 of 499: ~0.01; the coarse codebook should
    // land far above it
    assert(recall >= 0.2, f"ADC recall collapsed: $recall%.2f")
  }

  test("binary sign-bit words pack as documented; Hamming self-distance is zero") {
    import spark.implicits._
    // dims 0..63: sign pattern +,-,+,- ... -> bits 0,2,4,... of each
    // 32-bit word = 0x55555555
    val alt = (0 until 64).map(i => if (i % 2 == 0) 1.0f else -1.0f).toArray
    val allPos = Array.fill(64)(0.5f)
    val df = Seq((1L, alt), (2L, allPos)).toDF("vec_id", "embedding")
    val words = df.select(col("vec_id"),
        graft.operators.Similarity.binaryWords("embedding", 64).as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(words(1L) == Seq(0x55555555L, 0x55555555L), words(1L).toString)
    assert(words(2L) == Seq(0xffffffffL, 0xffffffffL), words(2L).toString)
    // Hamming between the two patterns = 32 zero-bits flipped
    val h = (words(1L), words(2L)).zipped
      .map((a, b) => java.lang.Long.bitCount(a ^ b)).sum
    assert(h == 32)
  }

  test("binary top-5 with exact refine overlaps exact cosine top-5 well above chance") {
    val emb = Tables.embeddings(spark, dir)
    val qids = Seq(0L, 7L, 42L)
    val bin = Similarity.binaryTopK(emb, "vec_id", "embedding", qids,
        k = 5, rerank = 16)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 5)
      .filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bin & exact).size.toDouble / exact.size
    info(f"binary+refine top-5 recall vs exact cosine: $recall%.2f")
    // 1 bit per dim keeps far more angular signal than chance (~0.01);
    // the exact refine means every returned rank is cosine-true over
    // the candidate set
    assert(recall >= 0.2, f"binary recall collapsed: $recall%.2f")
  }

  test("persisted IVF-binary search stays above chance and hamming-orders its candidates") {
    val emb = Tables.embeddings(spark, dir)
    val qids = Seq(0L, 7L, 42L)
    val path = java.nio.file.Files.createTempDirectory("graft_ivfbin_recall")
      .resolve("index").toString
    Similarity.buildIvfBinaryIndex(emb, "vec_id", "embedding", path, minNlist = 16)
    val rows = Similarity.searchIvfBinaryIndex(spark, path,
        emb.filter(col("vec_id").isin(qids: _*)), emb, "vec_id", "embedding",
        k = 5, rerank = 16, nprobe = 2)
      .collect()
    assert(rows.length == qids.size * 5)
    val got = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 5)
      .filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & exact).size.toDouble / exact.size
    info(f"IVF-binary (nprobe 2, rerank 16) top-5 recall: $recall%.2f")
    // probing loses cells on top of the 1-bit loss; chance is ~0.01
    assert(recall >= 0.1, f"IVF-binary recall collapsed: $recall%.2f")
    // ranks are cosine-ordered within each query
    rows.groupBy(_.getLong(0)).values.foreach { qr =>
      val byRank = qr.sortBy(_.getLong(1)).map(_.getDouble(5))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }
}
