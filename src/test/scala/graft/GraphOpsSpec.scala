package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.GraphOps

/** Hand-computed checks for the graph-centrality operators: edge
  * derivation semantics (distinctness, stop-gram cap, symmetry) and
  * the scaled-integer PageRank against a scalar reference loop run
  * in-test with the identical arithmetic.
  */
class GraphOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("domainAffinityEdges: distinct shared grams, symmetric, stop-gram capped") {
    // grams are word trigrams. 'common one two' appears in a and b
    // (twice in a's doc — distinctness must collapse it); the
    // 'all all all' gram appears in a, b, c and dies to maxDf = 2;
    // d shares nothing.
    val docs = Seq(
      ("a", "common one two common one two"), // trigram set: {common one two, one two common, two common one}
      ("a", "all all all"),
      ("b", "common one two"),
      ("b", "all all all"),
      ("c", "all all all"),
      ("d", "nothing shared here"))
      .toDF("source", "text")
    val e = GraphOps.domainAffinityEdges(docs, "source", "text", n = 3, maxDf = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // a's long doc also contains 'one two common' and 'two common one'
    // which b lacks; only 'common one two' is shared and eligible.
    assert(e == Set(("a", "b", 1L), ("b", "a", 1L)), e.toString)
  }

  test("pageRank matches a scalar reference loop with identical integer arithmetic") {
    val nodes = Seq("a", "b", "c", "d").toDF("node")
    // a <-> b heavily, b -> c lightly; d dangling
    val edges = Seq(("a", "b", 3L), ("b", "a", 3L), ("b", "c", 1L))
      .toDF("src", "dst", "weight")
    val iters = 5
    val got = GraphOps.pageRank(nodes, edges, iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // scalar reference: same Scale, same floor divisions, same order
    val scale = GraphOps.RankScale
    val n = 4L
    val base = (15L * scale / 100L) / n
    val out = Map("a" -> 3L, "b" -> 4L)
    val es = Seq(("a", "b", 3L), ("b", "a", 3L), ("b", "c", 1L))
    var r = Map("a" -> scale / n, "b" -> scale / n, "c" -> scale / n, "d" -> scale / n)
    for (_ <- 1 to iters) {
      val contrib = es.groupBy(_._2).map { case (dst, in) =>
        dst -> in.map { case (src, _, w) => (r(src) * w) / out(src) }.sum
      }
      val dang = r.collect { case (v, rv) if !out.contains(v) => rv }.sum
      r = r.keys.map { v =>
        v -> (base + 85L * (contrib.getOrElse(v, 0L) + dang / n) / 100L)
      }.toMap
    }
    assert(got == r, s"got $got expected $r")
    // the hub outranks the spoke, the spoke outranks the orphan
    assert(got("a") > got("c") && got("c") > got("d"))
    // total mass stays bounded by Scale (floor divisions only leak)
    assert(got.values.sum <= GraphOps.RankScale)
  }

  test("domainPageRank keeps isolated domains as dangling nodes") {
    val docs = Seq(
      ("x", "alpha beta gamma delta"),
      ("y", "alpha beta gamma other"),
      ("z", "totally unrelated words here"))
      .toDF("source", "text")
    val out = GraphOps.domainPageRank(docs, "source", "text",
      n = 3, maxDf = 10, iters = 3).collect()
    assert(out.map(_.getString(0)).toSet == Set("x", "y", "z"))
    val ranks = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    // x and y share 'alpha beta gamma'; z shares nothing and holds
    // only redistributed base + dangling mass
    assert(ranks("x") > ranks("z") && ranks("y") > ranks("z"))
  }
}
