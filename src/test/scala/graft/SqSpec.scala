package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** Int8 scalar-quantization invariants + retrieval quality, the SQ
  * counterpart of [[PqRecallSpec]] (the engine-differential gate is
  * t47/t48 in [[graft.queries.TrainingData]]).
  */
class SqSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("sqEncode: codes in ±127 with the max component saturated, " +
      "maxabs >= 1, recon_err in [0, d*(maxabs/127 + 1)/1e6]") {
    val enc = Similarity.sqEncode(Tables.embeddings(spark, dir),
      "vec_id", "embedding").cache()
    val n = enc.count()
    assert(n > 0)
    val absMax = array_max(transform(col("codes"), c => abs(c)))
    assert(enc.filter(absMax > 127 || col("maxabs") < 1 ||
      col("recon_err") < 0).count() == 0)
    // the max-|component| entry always quantizes to exactly ±127
    // ((maxabs*127) div maxabs); a scale bug breaks this immediately
    assert(enc.filter(absMax === 127).count() == n)
    // per-component floor error < maxabs/127 + 1 scaled units
    val bound = size(col("codes")).cast("double") *
      (col("maxabs").cast("double") / 127.0 + 1.0) / 1e6
    assert(enc.filter(col("recon_err") > bound).count() == 0)
    enc.unpersist()
  }

  test("sqTopK top-5 agrees with the exact dot-product top-5") {
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, dir)
    val qids = Seq(0L, 7L, 42L)
    val sq = Similarity.sqTopK(emb, "vec_id", "embedding", qids, k = 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val e = transform(col("embedding"), x => x.cast("double"))
    val v = emb.select(col("vec_id"), e.as("e"))
    val q = v.filter(col("vec_id").isin(qids: _*))
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val w = Window.partitionBy("qid").orderBy(col("d").desc, col("vec_id"))
    val exact = q.crossJoin(v).filter(col("qid") =!= col("vec_id"))
      .select(col("qid"), col("vec_id"),
        Similarity.dot(col("qe"), col("e")).as("d"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val recall = (sq & exact).size.toDouble / exact.size
    info(f"SQ top-5 recall vs exact dot: $recall%.2f")
    // int8 quantization error is ~1/127 relative — far tighter than
    // PQ's coarse codebook; chance for 5 of 499 is ~0.01
    assert(recall >= 0.6, f"SQ recall collapsed: $recall%.2f")
  }

  test("sqTopK fails LOUDLY when the adot envelope would overflow BIGINT") {
    import spark.implicits._
    // d*127*|µq|inf*|µx|inf with components ~1e8 at d=4:
    // (1e6*1e8)^2 * 127 * 4 >> 2^63 — silent wraparound territory
    val huge = Seq(
      (0L, Array(1.0e8f, -2.0e8f, 3.0e8f, 4.0e8f)),
      (1L, Array(2.0e8f, 1.0e8f, -1.0e8f, 3.0e8f)),
      (2L, Array(0.5e8f, 0.25e8f, 1.0e8f, -2.0e8f)))
      .toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.sqTopK(huge, "vec_id", "embedding", Seq(0L), k = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++
        messages(e.getCause))
    assert(messages(ex).exists(_.contains("sqTopK adot overflow")),
      s"expected the overflow guard, got: ${messages(ex).take(3)}")
    // and in-range inputs are untouched by the guard
    val ok = Tables.embeddings(spark, dir)
    assert(Similarity.sqTopK(ok, "vec_id", "embedding", Seq(0L), k = 2)
      .count() == 2)
  }
}
