package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup}

class CurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  test("curation attrition is monotone and near-dup losers are gone") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (curated, r) = Curation.curate(docs, "doc_id", "text",
      Curation.Config(minTokens = 5, minQuality = 0.2, nearDupThreshold = 0.7))
    assert(r.input >= r.afterQuality)
    assert(r.afterQuality >= r.afterLang)
    assert(r.afterLang >= r.afterExact)
    assert(r.afterExact >= r.afterNearDup)
    assert(curated.count() == r.afterNearDup)
    // no surviving near-dup pairs at the configured threshold
    val residual = Dedup.minhashLsh(curated, "doc_id", "text",
      n = 3, numPerms = 64, bands = 16, threshold = 0.7)
    assert(residual.count() == 0)
  }

  test("simhash near-dup strategy removes exact-jaccard in-bound losers") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (curated, r) = Curation.curate(docs, "doc_id", "text",
      Curation.Config(minTokens = 5, minQuality = 0.2,
        nearDupStrategy = "simhash", nearDupThreshold = 0.5, maxHamming = 3))
    assert(r.afterExact >= r.afterNearDup)
    assert(curated.count() == r.afterNearDup)
    // no surviving pairs within the operator's contract
    val residual = Dedup.simhashNearDups(curated, "doc_id", "text",
      n = 3, maxHamming = 3, threshold = 0.5)
    assert(residual.count() == 0)
  }

  test("single-action report matches independently computed stage counts") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val cfg = Curation.Config(minTokens = 5, minQuality = 0.2, nearDupThreshold = 0.7)
    // one materializing action populates every stage counter...
    val staged = Curation.curateStaged(docs, "doc_id", "text", cfg)
    staged.curated.count()
    val r = staged.report()
    // ...and each counter must equal the count from an independent
    // job. Any re-execution of an observed subtree (e.g. exchange
    // reuse failing across the dedup self-join branches) would double
    // an accumulator and fail here.
    assert(r.input == docs.count())
    val q = Curation.annotate(docs, "text")
      .filter(col("n_tokens") >= 5 && col("quality") >= 0.2)
    assert(r.afterQuality == q.count())
    assert(r.afterLang == q.count()) // keepLangs empty = no-op stage
    assert(r.afterExact == Dedup.exact(q, "doc_id", "text").count())
    assert(r.afterNearDup == staged.curated.count())
  }

  test("language filter keeps only requested languages") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val annotated = Curation.annotate(docs, "text")
    import org.apache.spark.sql.functions.col
    val langs = annotated.select("pred_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.nonEmpty)
    val (curated, _) = Curation.curate(docs, "doc_id", "text",
      Curation.Config(minTokens = 0, minQuality = 0.0, keepLangs = Set("en")))
    val got = Curation.annotate(curated, "text").select("pred_lang").distinct()
      .collect().map(_.getString(0)).toSet
    assert(got.subsetOf(Set("en")))
  }
}
