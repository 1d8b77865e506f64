package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusOps, Dedup}

/** Auto-sized / auto-re-bucketed persisted stores (round 15): bucket
  * counts derive from corpus row mass at BUILD time, and the
  * lifecycle ops (`ingest*` / `appendToInvertedIndex`) close the
  * detect→remediate loop by reading the SAMPLED gauge after each
  * batch and re-bucketing past the per-bucket row budget. The core
  * invariant throughout: bucket count is pure LAYOUT — admission
  * verdicts, BM25 scores and phrase hits are bit-identical across
  * any re-layout.
  */
class StoreAutoSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  private def dir = "/root/testdata/sf0.001"
  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).resolve("idx").toString

  test("autoBuckets: historical floor, power-of-two ceil, hard cap, " +
      "overflow-safe ceil-div") {
    assert(Dedup.autoBuckets(0) == 64)
    assert(Dedup.autoBuckets(1) == 64)
    assert(Dedup.autoBuckets(64L * Dedup.DefaultRowsPerBucket) == 64)
    assert(Dedup.autoBuckets(64L * Dedup.DefaultRowsPerBucket + 1) == 128)
    // ceil(1000 / 10) = 100 -> next pow2 = 128
    assert(Dedup.autoBuckets(1000, rowsPerBucket = 10) == 128)
    // exact power of two stays put: 256 buckets of exactly 10 rows
    assert(Dedup.autoBuckets(2560, rowsPerBucket = 10) == 256)
    assert(Dedup.autoBuckets(Long.MaxValue, rowsPerBucket = 1) ==
      Dedup.MaxStoreBuckets)
    assert(Dedup.autoBuckets(Long.MaxValue) == Dedup.MaxStoreBuckets)
    intercept[IllegalArgumentException](Dedup.autoBuckets(10, 0))
  }

  test("buildBandIndex auto-sizes: default budget keeps the historical " +
      "64 at test scale; a tiny budget grows a pow2 layout with " +
      "identical verdicts") {
    val docs = Tables.documents(spark, dir)
    val idx = docs.filter(col("doc_id") % 3 === 0)
    val probe = docs.filter(col("doc_id") % 3 =!= 0)
    val s64 = tmp("graft_auto_band64")
    Dedup.buildBandIndex(idx, "doc_id", "text", s64)
    val b64 = Dedup.bandIndexStats(spark, s64).collect().head
      .getAs[Long]("buckets")
    assert(b64 == 64L, s"test-scale corpus must keep the default: $b64")
    val sBig = tmp("graft_auto_bandbig")
    Dedup.buildBandIndex(idx, "doc_id", "text", sBig, rowsPerBucket = 32)
    val bBig = Dedup.bandIndexStats(spark, sBig).collect().head
      .getAs[Long]("buckets")
    assert(bBig > 64L && (bBig & (bBig - 1)) == 0L,
      s"tiny budget must grow a pow2 layout: $bBig")
    def verdicts(p: String) = Dedup.searchBandIndex(spark, p, probe,
      "doc_id", "text").orderBy("batch_id").collect().toSeq
    assert(verdicts(sBig) == verdicts(s64),
      "bucket count changed admission verdicts")
  }

  test("buildWinnowIndex auto-sizes the fps layout the same way") {
    val docs = Tables.documents(spark, dir)
    val idx = docs.filter(col("doc_id") % 3 === 0)
    val probe = docs.filter(col("doc_id") % 3 =!= 0)
    val s64 = tmp("graft_auto_win64")
    Dedup.buildWinnowIndex(idx, "doc_id", "text", s64)
    assert(Dedup.winnowIndexStats(spark, s64).collect().head
      .getAs[Long]("buckets") == 64L)
    val sBig = tmp("graft_auto_winbig")
    Dedup.buildWinnowIndex(idx, "doc_id", "text", sBig, rowsPerBucket = 32)
    val bBig = Dedup.winnowIndexStats(spark, sBig).collect().head
      .getAs[Long]("buckets")
    assert(bBig > 64L && (bBig & (bBig - 1)) == 0L, s"got $bBig")
    def verdicts(p: String) = Dedup.searchWinnowIndex(spark, p, probe,
      "doc_id", "text").orderBy("batch_id").collect().toSeq
    assert(verdicts(sBig) == verdicts(s64))
  }

  test("a grown band store re-buckets ITSELF on ingest; the opted-out " +
      "control keeps its layout; verdicts bit-identical") {
    val docs = Tables.documents(spark, dir)
    val seed = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 === 1)
    val probe = docs.filter(col("doc_id") % 3 === 2)
    val auto = tmp("graft_autoreb_band")
    val ctrl = tmp("graft_autoreb_bandctl")
    Dedup.buildBandIndex(seed, "doc_id", "text", auto, buckets = 64)
    Dedup.buildBandIndex(seed, "doc_id", "text", ctrl, buckets = 64)
    Dedup.ingestBandBatch(spark, auto, batch, "doc_id", "text",
      autoRebucket = true, rowsPerBucket = 32)
    Dedup.ingestBandBatch(spark, ctrl, batch, "doc_id", "text",
      autoRebucket = false)
    val bAuto = Dedup.bandIndexStats(spark, auto).collect().head
      .getAs[Long]("buckets")
    val bCtrl = Dedup.bandIndexStats(spark, ctrl).collect().head
      .getAs[Long]("buckets")
    assert(bAuto >= 128L, s"grown store must have re-bucketed: $bAuto")
    assert(bCtrl == 64L, s"opted-out ingest must not re-layout: $bCtrl")
    def verdicts(p: String) = Dedup.searchBandIndex(spark, p, probe,
      "doc_id", "text").orderBy("batch_id").collect().toSeq
    val va = verdicts(auto)
    assert(va.nonEmpty && va == verdicts(ctrl),
      "auto re-bucket changed admission verdicts")
    // under-budget stores never churn: a second auto ingest at the
    // DEFAULT budget must be a no-op on the layout
    assert(!Dedup.autoRebucketBandIndex(spark, ctrl))
  }

  test("a grown winnow store re-buckets itself on ingest identically") {
    val docs = Tables.documents(spark, dir)
    val seed = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 === 1)
    val probe = docs.filter(col("doc_id") % 3 === 2)
    val auto = tmp("graft_autoreb_win")
    val ctrl = tmp("graft_autoreb_winctl")
    Dedup.buildWinnowIndex(seed, "doc_id", "text", auto, buckets = 64)
    Dedup.buildWinnowIndex(seed, "doc_id", "text", ctrl, buckets = 64)
    Dedup.ingestWinnowBatch(spark, auto, batch, "doc_id", "text",
      autoRebucket = true, rowsPerBucket = 32)
    Dedup.ingestWinnowBatch(spark, ctrl, batch, "doc_id", "text",
      autoRebucket = false)
    assert(Dedup.winnowIndexStats(spark, auto).collect().head
      .getAs[Long]("buckets") >= 128L)
    assert(Dedup.winnowIndexStats(spark, ctrl).collect().head
      .getAs[Long]("buckets") == 64L)
    def verdicts(p: String) = Dedup.searchWinnowIndex(spark, p, probe,
      "doc_id", "text").orderBy("batch_id").collect().toSeq
    val va = verdicts(auto)
    assert(va.nonEmpty && va == verdicts(ctrl))
    assert(!Dedup.autoRebucketWinnowIndex(spark, ctrl))
  }

  test("inverted index: conf freezes the layout; rebucketInvertedIndex " +
      "preserves posting rows VERBATIM (dup mass included) and leaves " +
      "BM25 + phrase results bit-identical") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"), (2L, "alpha beta epsilon"),
      (3L, "gamma delta alpha"), (4L, "beta beta gamma"),
      (5L, "delta epsilon alpha beta")).toDF("doc_id", "text")
    val replay = docs.filter(col("doc_id") <= 2)
    val idx = tmp("graft_auto_inv")
    CorpusOps.buildInvertedIndex(docs, "doc_id", "text", idx)
    assert(CorpusOps.invertedIndexBuckets(spark, idx) == 64)
    // a replayed append leaves duplicate (term, doc) rows — the
    // correctness ALARM a re-layout must carry through untouched
    CorpusOps.appendToInvertedIndex(spark, idx, replay, "doc_id", "text",
      autoRebucket = false)
    val queries = Seq(1L -> "alpha beta", 2L -> "gamma")
    def bm25() = CorpusOps.searchInvertedIndex(spark, idx, queries,
      k1 = 1.2, b = 0.75, k = 10).orderBy("query_id", "rank")
      .collect().toSeq
    def phrase() = CorpusOps.phraseSearch(spark, idx,
      Seq(1L -> "alpha beta"), k = 10).orderBy("query_id", "rank")
      .collect().toSeq
    def gauge() = CorpusOps.invertedIndexStats(spark, idx).collect().head
    val (sBefore, pBefore, gBefore) = (bm25(), phrase(), gauge())
    assert(gBefore.getAs[Long]("dup_ppm") > 0L,
      s"replayed append must register dup mass: $gBefore")
    CorpusOps.rebucketInvertedIndex(spark, idx, newBuckets = 256)
    assert(CorpusOps.invertedIndexBuckets(spark, idx) == 256)
    val gAfter = gauge()
    assert(gAfter.getAs[Long]("buckets") == 256L)
    assert(gAfter.getAs[Long]("n_rows") == gBefore.getAs[Long]("n_rows") &&
      gAfter.getAs[Long]("n_distinct") == gBefore.getAs[Long]("n_distinct"),
      s"re-bucket must preserve rows verbatim: $gBefore -> $gAfter")
    assert(sBefore.nonEmpty && bm25() == sBefore,
      "re-bucket changed BM25 results")
    assert(pBefore.nonEmpty && phrase() == pBefore,
      "re-bucket changed phrase results")
    // meta survives the swap byte-for-byte
    val meta = spark.read.parquet(s"$idx/meta").collect().head
    assert(meta.getAs[Long]("n_docs") == 7L, s"meta lost in swap: $meta")
  }

  test("appendToInvertedIndex auto-rebuckets a grown store; a " +
      "cold-start append freezes conf; search matches a one-shot build") {
    val docs = Tables.documents(spark, dir)
    val seed = docs.filter(col("doc_id") % 3 === 0)
    val batch = docs.filter(col("doc_id") % 3 === 1)
    val queries = Seq(1L -> "the data", 2L -> "of a")
    val auto = tmp("graft_autoreb_inv")
    CorpusOps.buildInvertedIndex(seed, "doc_id", "text", auto,
      buckets = 64)
    CorpusOps.appendToInvertedIndex(spark, auto, batch, "doc_id", "text",
      autoRebucket = true, rowsPerBucket = 64)
    val bAuto = CorpusOps.invertedIndexBuckets(spark, auto)
    assert(bAuto >= 128, s"grown postings store must re-bucket: $bAuto")
    val oneShot = tmp("graft_autoreb_invref")
    CorpusOps.buildInvertedIndex(
      docs.filter(col("doc_id") % 3 =!= 2), "doc_id", "text", oneShot,
      buckets = 64)
    def search(p: String) = CorpusOps.searchInvertedIndex(spark, p,
      queries, k1 = 1.2, b = 0.75, k = 10).orderBy("query_id", "rank")
      .collect().toSeq
    val got = search(auto)
    assert(got.nonEmpty && got == search(oneShot),
      "auto re-bucketed store diverged from the one-shot build")
    // cold start: the first append on an empty path freezes conf at
    // the default so every later reader prunes with the same modulus
    val cold = tmp("graft_cold_inv")
    CorpusOps.appendToInvertedIndex(spark, cold, seed, "doc_id", "text",
      autoRebucket = false)
    val confPath = new org.apache.hadoop.fs.Path(s"$cold/conf")
    assert(confPath.getFileSystem(spark.sessionState.newHadoopConf())
      .exists(confPath), "cold-start append must write conf")
    assert(CorpusOps.invertedIndexBuckets(spark, cold) == 64)
  }
}
