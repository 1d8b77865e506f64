package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed equi-joins — the manual complement to AQE's
  * skew-join splitting (which only fires when runtime stats see the
  * skew; salting is the up-front fix when the hot keys are known or
  * the join feeds an operator AQE can't re-plan).
  *
  * The skewed side gets a deterministic salt in [0, salts); the other
  * side is replicated once per salt value; the join key becomes
  * (key, salt), spreading each hot key over `salts` reducer
  * partitions. Result semantics are salt-invariant: every
  * skewed-side row meets the full other-side key group exactly once
  * whatever its salt, so correctness never depends on the salt
  * function (SkewSpec asserts row-level parity with the unsalted
  * join). Cost model: the replicated side's shuffle volume multiplies
  * by `salts` — use it on the SMALL side of a skewed big-small join,
  * or on a pre-aggregated/projected slice of a big side.
  */
object Skew {

  /** Deterministic per-row salt: hash of the key column mixed with
    * the row's partition-stable id — spreads identical keys across
    * salts while staying reproducible under task retry (both inputs
    * are recomputation-stable for a fixed partition layout).
    */
  private def saltCol(key: Column, salts: Int): Column =
    pmod(xxhash64(key, monotonically_increasing_id()), lit(salts.toLong))

  /** Salted equi-join: `skewed` join `other` on `key`. Supported
    * joinType: "inner" or "left" (the replicated side must be the
    * right side so unmatched-row semantics stay exact).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(joinType == "inner" || joinType == "left",
      s"saltedJoin supports inner/left, got $joinType")
    val salted = skewed.withColumn("__salt", saltCol(col(key), salts))
    val replicated = other.withColumn("__salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
