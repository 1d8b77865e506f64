package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k (exact, O(n²·d) — the correct
  * answer and the oracle for recall measurements). Scale path:
  * random-hyperplane LSH bucketing, which turns the quadratic
  * all-pairs join into per-bucket joins.
  */
object Similarity {

  /** Sequential-fold dot product via the native codegen'd
    * [[graft.functions.VecDot]] expression — same left-to-right
    * addition order as the DuckDB oracle's `list_reduce`, so cosine
    * values are bit-identical across engines, but ~50× faster than
    * the interpreted higher-order-function form in all-pairs loops.
    */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Vectors with their norms precomputed once — the pairwise stage
    * then does ONE dot per pair instead of three. cosine =
    * dot/(na·nb) keeps the exact oracle arithmetic (the norms are the
    * same sqrt-of-self-dot values, just not recomputed per pair).
    */
  private def withNorm(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val e = transform(col(vecCol), x => x.cast("double"))
    emb.select(col(idCol).as("id"), e.as("e"), norm(e).as("n"))
  }

  /** Exact top-k neighbors per vector by cosine similarity.
    *
    * At cluster scale the small side is broadcast in blocks; locally
    * AQE broadcasts the whole relation. O(n²·d) by design — this is
    * the exactness baseline and recall oracle for [[lshTopK]].
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val v = withNorm(emb, idCol, vecCol)
    val pairs = v.as("a").join(v.as("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("vec_id"), col("b.id").as("neighbor_id"),
        (dot(col("a.e"), col("b.e")) / (col("a.n") * col("b.n"))).as("cosine_sim"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("vec_id", "rank", "neighbor_id", "cosine_sim")
  }

  /** Sign-random-projection bucket key: `planes` hyperplane sign bits
    * packed into a long, via the native codegen'd
    * [[graft.functions.LshBucket]] expression (deterministic
    * Rademacher hyperplanes, oracle-expressible in DuckDB SQL).
    * Cosine-close vectors collide with high probability; each bucket
    * is then searched exactly.
    */
  def lshBucket(vecCol: Column, planes: Int): Column =
    call_function("lsh_bucket",
      transform(vecCol, x => x.cast("double")), lit(planes))

  /** Approximate top-k: bucket by sign-random-projection, exact search
    * within each bucket. Recall < 1 by construction; the scale win is
    * that the join is per-bucket instead of all-pairs. Multi-probe
    * (xor-ing single bits) would raise recall at the same plan shape.
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      planes: Int = 8): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val e = transform(col(vecCol), x => x.cast("double"))
    val v = emb.select(col(idCol).as("id"), e.as("e"), norm(e).as("n"),
      call_function("lsh_bucket", e, lit(planes)).as("bucket"))
    val pairs = v.as("a")
      .join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("vec_id"), col("b.id").as("neighbor_id"),
        (dot(col("a.e"), col("b.e")) / (col("a.n") * col("b.n"))).as("cosine_sim"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("vec_id", "rank", "neighbor_id", "cosine_sim")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, id_a < id_b.
    *
    * All-pairs — exact but O(n²·d); the oracle/baseline only. The
    * scale default is [[lshNearDupPairs]].
    */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = withNorm(emb, idCol, vecCol)
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot(col("a.e"), col("b.e")) / (col("a.n") * col("b.n"))).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }

  /** Embedding near-duplicate pairs at scale: LSH-bucket first, exact
    * cosine verify within each bucket — the join is per-bucket
    * instead of all-pairs, so shuffle and compare volume scale with
    * bucket occupancy, not n². Contract: surfaces a qualifying pair
    * iff its two vectors share a bucket (probability (1 − θ/π)^planes
    * for angle θ; multi-probe raises recall at the same plan shape).
    * The bucket function is oracle-expressible, so the DuckDB gate
    * checks the contract exactly.
    */
  def lshNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 8): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val e = transform(col(vecCol), x => x.cast("double"))
    val v = emb.select(col(idCol).as("id"), e.as("e"), norm(e).as("n"),
      call_function("lsh_bucket", e, lit(planes)).as("bucket"))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (dot(col("a.e"), col("b.e")) / (col("a.n") * col("b.n"))).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }
}
