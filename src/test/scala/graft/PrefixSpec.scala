package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Prefix

/** The sharded order-lookup helpers ([[Prefix.shardedCeilLookup]] /
  * [[Prefix.shardedFloorLookup]]) must return row-for-row what the
  * quadratic inequality joins they replaced returned — these suites
  * pin that equivalence on histograms that span many buckets (tiny
  * targetBuckets forces cross-bucket resolution through the
  * suffix/prefix pass).
  */
class PrefixSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.session
  import spark.implicits._

  private def cumRel(part: String, n: Int, seed: Long) = {
    // strictly increasing cum per part (counts >= 1), irregular keys
    val rnd = new scala.util.Random(seed)
    var c = 0L
    (1 to n).map { i =>
      c += 1 + rnd.nextInt(5)
      (part, i.toLong * 7 - 3, c)
    }
  }

  test("shardedCeilLookup equals the naive >= join + min, cross-bucket") {
    val cum = (cumRel("a", 200, 1) ++ cumRel("b", 57, 2))
      .toDF("grp", "key", "cum")
    val rnd = new scala.util.Random(7)
    val targets = (1 to 300).map { i =>
      (if (i % 3 == 0) "b" else "a", i.toLong, rnd.nextInt(800).toLong)
    }.toDF("grp", "tid", "tgt")
    val naive = targets.join(cum, Seq("grp"))
      .filter(col("cum") >= col("tgt"))
      .groupBy("grp", "tid", "tgt").agg(min("key").as("key"))
      .select("grp", "tid", "tgt", "key")
    val fast = Prefix.shardedCeilLookup(cum, "cum", Seq("key"),
        targets, "tgt", partCols = Seq("grp"), targetBuckets = 8)
      .filter(col("key").isNotNull)
      .select("grp", "tid", "tgt", "key")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    // targets beyond the max cum must drop exactly like the inner join
    assert(fast.count() == naive.count())
  }

  test("shardedFloorLookup equals the naive <= join + max struct") {
    val cum = cumRel("x", 150, 3).map { case (_, k, c) => (k, c) }
      .toDF("rs", "rc")
    val targets = (-5L to 1200L by 11L).toDF("score")
    val naive = targets.join(cum, col("rs") <= col("score"), "left")
      .groupBy("score").agg(max(struct(col("rs"), col("rc"))).as("m"))
      .select(col("score"), col("m.rc").as("rc"))
    val fast = Prefix.shardedFloorLookup(cum, "rs", Seq("rc"),
        targets, "score", targetBuckets = 8)
      .select("score", "rc")
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("payload rides the extremum row, multiple payload columns") {
    val cum = Seq((10L, 100L, "p10"), (20L, 250L, "p20"), (30L, 900L, "p30"))
      .toDF("key", "cum", "tag")
    val out = Prefix.shardedCeilLookup(cum, "cum", Seq("key", "tag"),
        Seq(99L, 250L, 901L).toDF("tgt"), "tgt", targetBuckets = 2)
      .orderBy("tgt").collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      .toSeq == Seq(
        (99L, Some(10L), Some("p10")),
        (250L, Some(20L), Some("p20")),
        (901L, None, None)))
  }

  test("null compared values raise loudly") {
    val cum = Seq((10L, 100L)).toDF("key", "cum")
    val bad = Seq(Some(5L), None).toDF("tgt")
    val ex = intercept[Exception] {
      Prefix.shardedCeilLookup(cum, "cum", Seq("key"), bad, "tgt").collect()
    }
    assert(ex.getMessage != null)
  }
}
