package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Baseline: brute-force cosine top-k (exact, O(n²·d) — the correct
  * answer and the oracle for recall measurements). Scale path:
  * random-hyperplane LSH bucketing, which turns the quadratic
  * all-pairs join into per-bucket joins.
  */
object Similarity {

  /** Sequential-fold dot product — matches the DuckDB oracle's
    * `list_reduce` addition order exactly, so cosine values are
    * bit-identical across engines.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Pre-normalized embedding (double) — factor the norm out once so
    * the pairwise stage is a plain dot product.
    */
  private def normalized(df: DataFrame, idCol: String, vecCol: String) = {
    val asDouble = transform(col(vecCol), x => x.cast("double"))
    df.select(col(idCol).as("id"),
      transform(asDouble, x => x / norm(asDouble)).as("e"))
  }

  /** Exact top-k neighbors per vector by cosine similarity.
    *
    * Per-pair cosine is computed with the un-normalized sequential
    * formula (dot/(|a||b|)) to stay bit-compatible with the oracle.
    * At cluster scale the small side is broadcast in blocks; locally
    * AQE broadcasts the whole relation.
    */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    val v = emb.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("e"))
    val pairs = v.as("a").join(v.as("b"), col("a.id") =!= col("b.id"))
      .select(col("a.id").as("vec_id"), col("b.id").as("neighbor_id"),
        cosine(col("a.e"), col("b.e")).as("cosine_sim"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("vec_id", "rank", "neighbor_id", "cosine_sim")
  }

  /** Deterministic pseudo-random hyperplanes: plane p, dim d weight
    * derived from an LCG of (p, d). Values in [-1, 1).
    */
  private[operators] def planeWeight(p: Int, d: Int): Double = {
    var s = p.toLong * 2654435761L + d.toLong * 40503L + 42L
    s = s * 6364136223846793005L + 1442695040888963407L
    s = s * 6364136223846793005L + 1442695040888963407L
    (s >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /** Sign-random-projection bucket key: `planes` hyperplane sign bits
    * packed into a long. Cosine-close vectors collide with high
    * probability; each bucket is then searched exactly.
    */
  def lshBucket(vecCol: Column, dim: Int, planes: Int): Column = {
    val bits = (0 until planes).map { p =>
      val proj = (0 until dim).map(d =>
        element_at(vecCol, d + 1).cast("double") * lit(planeWeight(p, d)))
        .reduce(_ + _)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: bucket by sign-random-projection, exact search
    * within each bucket. Recall < 1 by construction; the scale win is
    * that the join is per-bucket instead of all-pairs. Multi-probe
    * (xor-ing single bits) would raise recall at the same plan shape.
    */
  def lshTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int,
      dim: Int, planes: Int = 8): DataFrame = {
    val v = emb.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("e"),
      lshBucket(col(vecCol), dim, planes).as("bucket"))
    val pairs = v.as("a")
      .join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") =!= col("b.id"))
      .select(col("a.id").as("vec_id"), col("b.id").as("neighbor_id"),
        cosine(col("a.e"), col("b.e")).as("cosine_sim"))
    val w = Window.partitionBy("vec_id")
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    pairs.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("vec_id", "rank", "neighbor_id", "cosine_sim")
  }

  /** Embedding near-duplicate pairs: cosine >= threshold, id_a < id_b. */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = emb.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("e"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        cosine(col("a.e"), col("b.e")).as("cosine_sim"))
      .filter(col("cosine_sim") >= threshold)
  }
}
