package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Salted skew-join: row-level parity with the unsalted join on a
  * pathologically skewed key distribution, for inner and left joins,
  * with the broadcast threshold disabled so the salted path is the
  * genuine shuffle join it exists for.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def withNoBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // 90% of fact rows hit ONE key; dim has multiple rows per key so
  // the join fans out and any salting mistake shows up in row counts
  private lazy val fact = (1 to 20000).map { i =>
    (if (i % 10 != 0) 1L else (i % 100).toLong, s"payload$i")
  }.toDF("k", "payload")
  private lazy val dim = (0L to 99L).flatMap(k =>
    Seq((k, s"a$k"), (k, s"b$k"))).toDF("k", "attr")

  test("inner salted join matches the plain join row-for-row") {
    withNoBroadcast {
      val plain = fact.join(dim, Seq("k"), "inner")
      val salted = Skew.saltedJoin(fact, dim, "k", salts = 8, joinType = "inner")
      assert(salted.columns.toSeq == plain.columns.toSeq)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    }
  }

  test("left salted join preserves unmatched rows exactly once") {
    withNoBroadcast {
      val sparseDim = dim.filter(col("k") < 50)
      val plain = fact.join(sparseDim, Seq("k"), "left")
      val salted = Skew.saltedJoin(fact, sparseDim, "k", salts = 8, joinType = "left")
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    }
  }

  test("the hot key is spread across several salt partitions") {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(8L)))
    val spread = salted.filter(col("k") === 1L)
      .select("__salt").distinct().count()
    assert(spread >= 4, s"hot key only reached $spread of 8 salts")
  }

  // t114's fp inverted-index join meets its designed skew defense: a
  // deliberately boilerplate-heavy corpus (one shared paragraph in
  // every doc) makes a handful of fingerprints corpus-frequent; the
  // maxDocFreq stop-gram cut must bound the largest join bucket to
  // the ceiling (never the corpus), and t127's keySkewReport over the
  // same fp relation must flag exactly those fingerprints first —
  // the triage-then-cut loop a pipeline operator runs at 100 TB.
  test("winnow overlap: stop-gram cut bounds the boilerplate fp bucket; " +
      "keySkewReport flags it first") {
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit " +
      "sed do eiusmod tempor incididunt ut labore et dolore magna aliqua"
    val nDocs = 200
    val docs = (1 to nDocs).map(i =>
      (i.toLong, s"$boiler unique$i tail$i words$i body$i close$i"))
      .toDF("doc_id", "text")
    val fps = graft.operators.Dedup.winnowFingerprints(docs, "doc_id", "text")
      .select(col("doc_id").as("id"), col("fp")).distinct()
      .localCheckpoint()
    // the raw relation IS pathologically skewed: boilerplate fps hit
    // every doc (the quadratic bucket the cut exists to prevent)
    val maxDfRaw = fps.groupBy("fp").agg(count(lit(1)).as("df"))
      .agg(max("df")).collect().head.getLong(0)
    assert(maxDfRaw == nDocs.toLong,
      s"fixture failed to produce corpus-frequent fps (max df $maxDfRaw)")
    // keySkewReport triage on the fp relation surfaces them first,
    // with the hot-key share and a salt suggestion
    val top = graft.operators.CorpusOps.keySkewReport(fps, "fp",
      topK = 5, partitions = 32).collect()
    assert(top.head.getAs[Long]("cnt") == nDocs.toLong,
      s"rank-1 skew key is not a boilerplate fp: ${top.head}")
    assert(top.head.getAs[Long]("suggested_salt") > 1L,
      "corpus-frequent fp must suggest salting")
    // the stop-gram cut: with maxDocFreq = 20 every surviving fp's
    // bucket is <= 20 rows, so the pair join's per-bucket fan-out is
    // <= 20^2 instead of 200^2 — and the boilerplate-only pairs are
    // gone entirely (unique tails share nothing)
    val cut = 20
    val pairs = graft.operators.Dedup.winnowOverlapPairs(docs, "doc_id",
      "text", maxDocFreq = cut)
    assert(pairs.isEmpty,
      "boilerplate-only overlap must vanish under the stop-gram cut")
    val survivingMaxDf = fps
      .withColumn("df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fp")))
      .filter(col("df") <= cut)
      .agg(coalesce(max("df"), lit(0L))).collect().head.getLong(0)
    assert(survivingMaxDf <= cut.toLong,
      s"stop-gram cut leaked a bucket of $survivingMaxDf > $cut")
    // and WITHOUT the cut the same corpus pairs quadratically — the
    // defense is load-bearing, not decorative
    val uncut = graft.operators.Dedup.winnowOverlapPairs(docs, "doc_id",
      "text", maxDocFreq = nDocs)
    assert(uncut.count() == nDocs.toLong * (nDocs - 1) / 2,
      "uncut boilerplate corpus must pair all-with-all")
  }
}
