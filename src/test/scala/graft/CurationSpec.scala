package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusOps, Curation, Dedup}

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

  test("zero near-dup pairs: the pruned losers branch reports 0, " +
      "main-stream counts stay strict") {
    import spark.implicits._
    // four fully-distinct docs -> no near-dup pairs at any threshold;
    // the anti-join's right subtree (and obsLosers with it) is
    // eliminated by the empty-side join rewrite, which must read as
    // losers=0, not an error — while every main-stream stage still
    // reports its real count.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven"),
      (3L, "red orange yellow green blue indigo"),
      (4L, "north south east west up down over"))
      .toDF("doc_id", "text")
    val (curated, r) = Curation.curate(docs, "doc_id", "text",
      Curation.Config(minTokens = 1, minQuality = 0.0,
        nearDupThreshold = 0.7))
    assert(r.input == 4L)
    assert(r.afterExact == 4L)
    assert(r.afterNearDup == 4L)
    assert(curated.count() == 4L)
  }

  test("normalizedExactDedup collapses case/punct twins in the exact stage") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "Alpha Beta  Gamma delta epsilon zeta ."), // normalizes onto 1
      (3L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val cfg = Curation.Config(minTokens = 1, minQuality = 0.0,
      nearDupThreshold = 0.99)
    val (rawKept, _) = Curation.curate(docs, "doc_id", "text", cfg)
    assert(rawKept.count() == 3, "byte-exact keeps the perturbed twin")
    val (normKept, r) = Curation.curate(docs, "doc_id", "text",
      cfg.copy(normalizedExactDedup = true))
    assert(normKept.select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 3L))
    assert(r.afterExact == 2L)
  }

  test("dup-range stage drops boilerplate-heavy docs, matches the " +
      "standalone operator, and is off by default") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def toks(prefix: String, n: Int): String =
      (1 to n).map(i => s"$prefix$i").mkString(" ")
    // the template: 16 tokens shared by docs 1..3. docs 1/2 are
    // MOSTLY template (16 of 22 tokens duplicated > 0.5) but not
    // near-dups of each other (unique remainders differ); doc 3
    // carries the template inside 60 unique tokens (frac ~0.21).
    val template = toks("tpl", 16)
    val docs = Seq(
      (1L, template + " " + toks("a", 6)),
      (2L, template + " " + toks("b", 6)),
      (3L, toks("c", 30) + " " + template + " " + toks("d", 30)),
      (4L, toks("e", 40)))
      .toDF("doc_id", "text")
    val cfg = Curation.Config(minTokens = 5, minQuality = 0.0,
      nearDupThreshold = 0.9, maxDupRangeFrac = 0.5)
    val (curated, r) = Curation.curate(docs, "doc_id", "text", cfg)
    val kept = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 4L),
      s"template-heavy docs must fall to the dup-range gate: $kept")
    assert(r.afterNearDup == 4 && r.afterDupRange == 2,
      s"report: ${r.afterNearDup} -> ${r.afterDupRange}")
    // stage == standalone operator anti-join over the same survivors
    val standalone = CorpusOps.maximalDupRanges(docs, "doc_id", "text", l = 8)
      .filter(col("dup_tokens").cast("double") >
        col("n_tokens").cast("double") * 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(standalone == Set(1L, 2L))
    // disabled by default: the same corpus keeps all four docs
    val (_, off) = Curation.curate(docs, "doc_id", "text",
      cfg.copy(maxDupRangeFrac = 0.0))
    assert(off.afterDupRange == off.afterNearDup && off.afterDupRange == 4)
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

  test("span-rewrite stage rewrites survivors exactly like standalone t44") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val cfg = Curation.Config(minTokens = 5, minQuality = 0.2,
      nearDupThreshold = 0.7, spanRewriteK = 8)
    val staged = Curation.curateStaged(docs, "doc_id", "text", cfg)
    staged.curated.count()
    val r = staged.report()
    // the rewrite stage drops no documents — only text changes
    assert(staged.curated.count() == r.afterNearDup)
    assert(staged.curated.columns.toSeq == Curation.annotate(docs, "text").columns.toSeq,
      "rewrite must preserve the curated schema")
    // differential: each survivor's text must equal the standalone
    // spanDedupRewrite over exactly the surviving corpus (the stage
    // elects canonicals among survivors, not the raw pile)
    val survivors = Curation.curateStaged(docs, "doc_id", "text",
      cfg.copy(spanRewriteK = 0)).curated
    val expect = CorpusOps.spanDedupRewrite(survivors, "doc_id", "text", 8)
      .select(col("doc_id"), col("new_text"))
    val mismatches = staged.curated.select(col("doc_id"), col("text"))
      .join(expect, "doc_id")
      .filter(col("text") =!= col("new_text")).count()
    assert(mismatches == 0, "stage text != standalone rewrite")
    // the fixture corpus has cross-doc duplicated spans, so at least
    // one survivor must actually have been rewritten
    val unchanged = staged.curated.select(col("doc_id"), col("text"))
      .join(docs.select(col("doc_id"), col("text").as("orig")), "doc_id")
      .filter(col("text") === col("orig")).count()
    assert(unchanged < r.afterNearDup, "no document was rewritten")
  }

  test("semantic-dedup stage drops exactly the t40 kept=false verdicts") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val emb = Tables.embeddings(spark, dir)
    val cfg = Curation.Config(minTokens = 5, minQuality = 0.2,
      nearDupThreshold = 0.7)
    val (curated, r) = Curation.curate(docs, "doc_id", "text", cfg,
      embeddings = Some(emb))
    assert(r.afterNearDup >= r.afterSemantic)
    assert(curated.count() == r.afterSemantic)
    // differential: the stage must remove exactly the near-dup
    // survivors whose standalone semDedup verdict is kept=false
    val (baseline, rb) = Curation.curate(docs, "doc_id", "text", cfg)
    val losers = graft.operators.Similarity
      .semDedup(emb, "vec_id", "embedding", 16, 0.3)
      .filter(!col("kept")).select(col("vec_id").as("doc_id"))
    val expect = baseline.join(losers, Seq("doc_id"), "left_anti").count()
    assert(r.afterSemantic == expect, "stage == standalone verdict anti-join")
    assert(r.afterSemantic < rb.afterSemantic,
      "fixture must drop something; without embeddings the stage is a no-op")
    assert(rb.afterSemantic == rb.afterNearDup)
  }

  test("full pipeline: repetition, PII, decontam and sampling stages compose") {
    import org.apache.spark.sql.functions.col
    val spark0 = spark
    import spark0.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.filter(col("doc_id") % 7 === 0)
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    val cfg = Curation.Config(minTokens = 5, minQuality = 0.2,
      minUniqFrac = 0.3, redactPii = true, piiTerms = Seq("customer"),
      nearDupThreshold = 0.7, decontamShingleSize = 4,
      sampleRates = Map("en" -> 50))
    val staged = Curation.curateStaged(train, "doc_id", "text", cfg, Some(bench))
    staged.curated.count()
    val r = staged.report()
    // monotone attrition through every enabled stage
    assert(r.input >= r.afterQuality)
    assert(r.afterQuality >= r.afterRepetition)
    assert(r.afterRepetition >= r.afterLang)
    assert(r.afterLang >= r.afterExact)
    assert(r.afterExact >= r.afterNearDup)
    assert(r.afterNearDup >= r.afterDecontam)
    assert(r.afterDecontam >= r.afterSample)
    assert(r.afterSample == staged.curated.count())
    // stages actually fired on this fixture (non-vacuous)
    assert(r.afterDecontam < r.afterNearDup, "decontamination removed nothing")
    assert(r.afterSample < r.afterDecontam, "sampling removed nothing")
    assert(r.piiMatches > 0, "PII term redaction matched nothing")
    // the curated text is redacted and decontaminated
    assert(staged.curated.filter(col("text").contains("customer")).count() == 0)
    val resid = operators.CorpusOps.contaminatedIds(
      staged.curated, bench, "doc_id", "text", 4)
    assert(resid.count() == 0, "contaminated docs survived")
  }

  test("single-action report matches independent counts with all stages on") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.filter(col("doc_id") % 7 === 0)
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    val cfg = Curation.Config(minTokens = 5, minQuality = 0.2,
      minUniqFrac = 0.3, redactPii = true, piiTerms = Seq("customer"),
      nearDupThreshold = 0.7, decontamShingleSize = 4,
      sampleRates = Map("en" -> 50))
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val staged = Curation.curateStaged(train, "doc_id", "text", cfg, Some(bench),
      embeddings = Some(emb))
    staged.curated.count()
    val r = staged.report()
    // independently recompute the map-only stages; any double-fired
    // CollectMetrics (broken exchange reuse around the new barriers)
    // fails here
    assert(r.input == train.count())
    val q = Curation.annotate(train, "text")
      .filter(col("n_tokens") >= 5 && col("quality") >= 0.2)
    assert(r.afterQuality == q.count())
    import org.apache.spark.sql.functions.{array_distinct, size => asize}
    val rep = q.filter(
      asize(array_distinct(graft.functions.TextFunctions.tokens(col("text"))))
        .cast("double") /
        asize(graft.functions.TextFunctions.tokens(col("text"))).cast("double")
        >= 0.3)
    assert(r.afterRepetition == rep.count())
    assert(r.afterLang == rep.count()) // keepLangs empty = no-op
    // the semantic stage sits between near-dup and decontam, with all
    // neighbors on: the attrition chain must stay monotone and its
    // counter exact (anti-join of the near-dup survivors against the
    // standalone verdicts)
    assert(r.afterNearDup >= r.afterSemantic &&
      r.afterSemantic >= r.afterDecontam && r.afterDecontam >= r.afterSample)
    val semLosers = graft.operators.Similarity
      .semDedup(emb, "vec_id", "embedding", 16, cfg.semDedupThreshold)
      .filter(!col("kept")).select(col("vec_id").as("doc_id"))
    val nearDupSurvivors = Curation.curateStaged(train, "doc_id", "text",
      cfg.copy(sampleRates = Map.empty), None, None).curated
    assert(r.afterSemantic ==
      nearDupSurvivors.join(semLosers, Seq("doc_id"), "left_anti").count())
  }

  test("clusterNearDups keeps one doc per component; pair mode keeps local minima") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // A (1) shares the front 3/4 of C (3), B (2) the back 3/4:
    // jaccard(A,C) = jaccard(B,C) = 7/10 >= 0.5, but
    // jaccard(A,B) = 4/10 < 0.5 — a chain A–C–B with no A–B edge.
    val c = (1 to 12).map(i => s"c$i")
    val docs = Seq(
      (1L, c.take(9).mkString(" ")),
      (2L, c.drop(3).mkString(" ")),
      (3L, c.mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = operators.Dedup.minhashLsh(docs, "doc_id", "text",
      n = 3, numPerms = 64, bands = 16, threshold = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L), (2L, 3L)), s"LSH must surface the chain, got $pairs")

    val cfg = Curation.Config(minTokens = 0, minQuality = 0.0, nearDupThreshold = 0.5)
    val (pairMode, pairReport) = Curation.curate(docs, "doc_id", "text", cfg)
    // pair mode: 3 is the higher id of both pairs -> only 3 dropped
    assert(pairMode.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(pairReport.afterNearDup == 2)

    val (clusterMode, clusterReport) = Curation.curate(docs, "doc_id", "text",
      cfg.copy(clusterNearDups = true))
    // cluster mode: {1,2,3} is ONE component -> canonical min id only
    assert(clusterMode.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L))
    assert(clusterReport.afterNearDup == 1)
    assert(clusterReport.afterExact == 3)
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
