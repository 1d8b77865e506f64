package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.exec.Bucketing

/** Co-located bucketed joins: the write pays the shuffle once, every
  * subsequent join on the bucket key plans with NO Exchange. The
  * broadcast threshold is disabled for the assertion so the plan is
  * the genuine big-big sort-merge path, not a broadcast shortcut.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("same-bucketed tables join with zero exchanges and correct rows") {
    val orders = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "bkt_orders", "o_orderkey", 8)
    Bucketing.writeBucketed(lineitem, "bkt_lineitem", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark, "bkt_orders", "bkt_lineitem", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(1500)}")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        "expected the big-big join path")
      // bucket metadata must not change the join's semantics
      assert(joined.count() ==
        orders.join(lineitem, "o_orderkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    }
  }
}
