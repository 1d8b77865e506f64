package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Salted skew-join: row-level parity with the unsalted join on a
  * pathologically skewed key distribution, for inner and left joins,
  * with the broadcast threshold disabled so the salted path is the
  * genuine shuffle join it exists for.
  */
class SkewSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  private def withNoBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // 90% of fact rows hit ONE key; dim has multiple rows per key so
  // the join fans out and any salting mistake shows up in row counts
  private lazy val fact = (1 to 20000).map { i =>
    (if (i % 10 != 0) 1L else (i % 100).toLong, s"payload$i")
  }.toDF("k", "payload")
  private lazy val dim = (0L to 99L).flatMap(k =>
    Seq((k, s"a$k"), (k, s"b$k"))).toDF("k", "attr")

  test("inner salted join matches the plain join row-for-row") {
    withNoBroadcast {
      val plain = fact.join(dim, Seq("k"), "inner")
      val salted = Skew.saltedJoin(fact, dim, "k", salts = 8, joinType = "inner")
      assert(salted.columns.toSeq == plain.columns.toSeq)
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    }
  }

  test("left salted join preserves unmatched rows exactly once") {
    withNoBroadcast {
      val sparseDim = dim.filter(col("k") < 50)
      val plain = fact.join(sparseDim, Seq("k"), "left")
      val salted = Skew.saltedJoin(fact, sparseDim, "k", salts = 8, joinType = "left")
      assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    }
  }

  test("the hot key is spread across several salt partitions") {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(8L)))
    val spread = salted.filter(col("k") === 1L)
      .select("__salt").distinct().count()
    assert(spread >= 4, s"hot key only reached $spread of 8 salts")
  }
}
