package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Smoke-level checks for the declared query set; exact value parity
  * is owned by the DuckDB differential gate (tools/verify_local.py).
  */
class RelationalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("every registered query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val n = df.count()
      assert(n >= 0, s"$name failed")
      // every core relational query must return data at every SF.
      // Exceptions that are legitimately empty on this data (and
      // still hash-match the oracle): q14/q15 (every nation has
      // suppliers, every customer has orders), threshold-based pair
      // queries at sf0.001.
      if (name.startsWith("q") && name != "q14_except" && name != "q15_anti_join")
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("oracle keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q43 histogram quantiles land within one bin width of q24 exact") {
    import org.apache.spark.sql.functions.col
    val exact = queries.RelationalExt.q24(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = queries.RelationalExt2.q43(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(exact.keySet == approx.keySet)
    for ((s, (m, p90)) <- exact) {
      assert(math.abs(approx(s)._1 - m) <= 250.0,
        s"$s p50: sketch ${approx(s)._1} vs exact $m")
      assert(math.abs(approx(s)._2 - p90) <= 250.0,
        s"$s p90: sketch ${approx(s)._2} vs exact $p90")
    }
  }
}
