package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusOps, Dedup}

/** End-to-end governance recipe ([[CorpusOps.curationRecipe]]) and
  * the split-fraction audit ([[CorpusOps.splitFractions]]).
  */
class RecipeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("recipe report counts match independently recomputed stages") {
    val docs = Tables.documents(spark, dir)
    val staged = CorpusOps.curationRecipe(docs, "doc_id", "text", "source",
      budgets = Map("src0" -> 100000L, "src1" -> 500L, "src2" -> 40L))
    val n = staged.curated.count()
    val r = staged.report()
    // each stage recomputed as a standalone pipeline — if an observe
    // accumulator double-counted under a failed exchange reuse, these
    // equalities break
    assert(r.input == docs.count())
    val dd = Dedup.normalizedExact(docs, "doc_id", "text")
    assert(r.afterDedup == dd.count())
    val split = CorpusOps.leakageSafeSplits(dd, "doc_id", "text")
    val capped = CorpusOps.domainCap(split, "doc_id", "source", 20)
    assert(r.afterCap == capped.count())
    val temp = CorpusOps.sqrtTemperatureSample(capped, "doc_id", "source", 4.0)
    assert(r.afterTemperature == temp.count())
    assert(r.afterBudget == n)
    assert(r.trainDocs ==
      staged.curated.filter(col("split") === "train").count())
    assert(r.input >= r.afterDedup && r.afterDedup >= r.afterCap &&
      r.afterCap >= r.afterTemperature &&
      r.afterTemperature >= r.afterBudget && r.afterBudget >= r.trainDocs)
  }

  test("recipe train split carries a contiguous curriculum order; " +
      "other splits carry null") {
    val docs = Tables.documents(spark, dir)
    val staged = CorpusOps.curationRecipe(docs, "doc_id", "text", "source",
      budgets = Map("src0" -> 100000L, "src1" -> 500L, "src2" -> 40L))
    val out = staged.curated
    assert(out.filter(col("split") =!= "train" &&
      col("order_idx").isNotNull).count() == 0)
    val idxs = out.filter(col("split") === "train")
      .select("order_idx").collect().map(_.getLong(0)).sorted.toSeq
    assert(idxs == (1L to idxs.length).toSeq,
      s"train order_idx not contiguous from 1: ${idxs.take(10)}")
    assert(idxs.nonEmpty, "fixture produced an empty train split")
  }

  test("recipe final action reads only checkpointed intermediates — " +
      "no corpus rescan, no cartesian product") {
    val docs = Tables.documents(spark, dir)
    val staged = CorpusOps.curationRecipe(docs, "doc_id", "text", "source",
      budgets = Map("src0" -> 100000L, "src1" -> 500L, "src2" -> 40L))
    staged.curated.count()
    val plan = staged.curated.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"),
      s"final recipe action re-read the corpus from files:\n${plan.take(1500)}")
    assert(!plan.contains("CartesianProduct"), plan.take(1200))
  }

  test("split fractions surface a planted mega-cluster imbalance") {
    import spark.implicits._
    // one 80-doc near-dup mega-cluster (identical text) + 20 distinct
    // singletons: the cluster moves into ONE split wholesale, so the
    // realized per-document fractions must deviate visibly from the
    // 80/10/10 target no matter which split the cluster's group key
    // hashes into
    val mega = (0 until 80).map(i => (i.toLong,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
    val singles = (0 until 20).map { i =>
      (100L + i, s"u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g u${i}h")
    }
    val docs = (mega ++ singles).toDF("doc_id", "text")
    val splits = CorpusOps.leakageSafeSplits(docs, "doc_id", "text")
    val rep = CorpusOps.splitFractions(splits).collect()
    assert(rep.map(_.getAs[Long]("n_docs")).sum == 100L)
    assert(rep.map(_.getAs[Long]("n_groups")).sum == 21L,
      "expected 1 mega-cluster + 20 singleton groups")
    val maxDev = rep.map(_.getAs[Long]("dev_x1e6")).max
    assert(maxDev >= 150000L,
      s"mega-cluster imbalance not surfaced: max dev = $maxDev")
  }

  test("split fractions are exact fixed-point shares of docs and groups") {
    import spark.implicits._
    val docs = (0 until 40).map { i =>
      (i.toLong, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f")
    }.toDF("doc_id", "text")
    val splits = CorpusOps.leakageSafeSplits(docs, "doc_id", "text")
    val rep = CorpusOps.splitFractions(splits).collect()
    rep.foreach { r =>
      assert(r.getAs[Long]("docs_frac_x1e6") ==
        r.getAs[Long]("n_docs") * 1000000L / 40L)
      assert(r.getAs[Long]("dev_x1e6") ==
        math.abs(r.getAs[Long]("docs_frac_x1e6") -
          r.getAs[Long]("target_frac_x1e6")))
    }
  }

  test("split fractions surface empty splits with zero counts and full-target dev") {
    import spark.implicits._
    // force everything into one split: a single group key lands in
    // exactly one of train/val/test, leaving the other two EMPTY —
    // the report must still carry all three rows
    val splits = (0 until 10).map(i => (i.toLong, 42L))
      .toDF("doc_id", "group_key")
      .withColumn("split", org.apache.spark.sql.functions.lit("train"))
    val rep = CorpusOps.splitFractions(splits).collect()
      .map(r => r.getAs[String]("split") -> r).toMap
    assert(rep.keySet == Set("train", "val", "test"))
    assert(rep("train").getAs[Long]("n_docs") == 10L)
    Seq("val", "test").foreach { s =>
      assert(rep(s).getAs[Long]("n_docs") == 0L)
      assert(rep(s).getAs[Long]("n_groups") == 0L)
      assert(rep(s).getAs[Long]("docs_frac_x1e6") == 0L)
      assert(rep(s).getAs[Long]("dev_x1e6") ==
        rep(s).getAs[Long]("target_frac_x1e6"),
        "an empty split's deviation is its full target fraction")
    }
  }
}
