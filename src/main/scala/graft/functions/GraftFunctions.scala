package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.expr

/** Registry for graft's native Catalyst expressions.
  *
  * Registration goes through the session's FunctionRegistry (public
  * API surface); callers then build Columns with `expr("...")` or the
  * typed helpers here. Idempotent per session.
  */
object GraftFunctions {
  private val registered = ConcurrentHashMap.newKeySet[String]()

  def register(spark: SparkSession): Unit =
    if (registered.add(spark.sessionState.toString)) {
      val reg = spark.sessionState.functionRegistry
      reg.createOrReplaceTempFunction(
        "poly_hash", exprs => PolyHash(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "fnv64", exprs => Fnv64(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "fnv64_array", exprs => Fnv64Array(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "spread64", exprs => Spread64(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "poly_hash_array", exprs => {
          val spread = exprs(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
              v.toString.toBoolean
            case other => throw new IllegalArgumentException(
              s"poly_hash_array spread must be a literal, got $other")
          }
          PolyHashArray(exprs.head, spread)
        }, "built-in")
      reg.createOrReplaceTempFunction(
        "ngrams", exprs => {
          val n = exprs(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
              v.toString.toInt
            case other => throw new IllegalArgumentException(
              s"ngrams n must be a literal, got $other")
          }
          // optional 3rd arg: distinct (default true — dedup shingles);
          // false yields the positional multiset (vocab/repetition)
          val distinct = exprs.lift(2) match {
            case None => true
            case Some(org.apache.spark.sql.catalyst.expressions.Literal(v, _)) =>
              v.toString.toBoolean
            case Some(other) => throw new IllegalArgumentException(
              s"ngrams distinct must be a literal, got $other")
          }
          NGrams(exprs.head, n, distinct)
        }, "built-in")
      reg.createOrReplaceTempFunction(
        "repetition_stats", exprs => RepetitionStats(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "sorted_inter_count",
        exprs => SortedInterCount(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction(
        "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
      reg.createOrReplaceTempFunction(
        "simhash64", exprs => SimHash64(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "minhash_sig", exprs => {
          val n = exprs(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
              v.toString.toInt
            case other => throw new IllegalArgumentException(
              s"minhash_sig numPerms must be a literal, got $other")
          }
          MinHashSig(exprs.head, n)
        }, "built-in")
      reg.createOrReplaceTempFunction(
        "lsh_bucket", exprs => {
          val n = exprs(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
              v.toString.toInt
            case other => throw new IllegalArgumentException(
              s"lsh_bucket planes must be a literal, got $other")
          }
          LshBucket(exprs.head, n)
        }, "built-in")
      reg.createOrReplaceTempFunction(
        "bpe_token_count", exprs => BpeTokenCount(exprs.head), "built-in")
      reg.createOrReplaceTempFunction(
        "winnow_select", exprs => {
          val w = exprs(1) match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
              v.toString.toInt
            case other => throw new IllegalArgumentException(
              s"winnow_select w must be a literal, got $other")
          }
          WinnowSelect(exprs.head, w)
        }, "built-in")
    }

  /** Oracle-parity polynomial fingerprint (see [[PolyHash]]). */
  def polyHash(c: String): Column = expr(s"poly_hash($c)")

  /** 64-bit FNV-1a hash (see [[Fnv64]]). */
  def fnv64(c: String): Column = expr(s"fnv64($c)")

  /** Real merges-table BPE token count (see [[BpeTokenCount]]). */
  def bpeTokenCount(c: String): Column = expr(s"bpe_token_count($c)")
}
