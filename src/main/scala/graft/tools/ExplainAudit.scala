package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Physical-plan audit: prints `explain(formatted)` for each query
  * and greps the plan for the scale-critical properties — parquet
  * filter pushdown, column pruning (ReadSchema), broadcast joins on
  * dim tables, whole-stage codegen coverage.
  * Run: sbt "runMain graft.tools.ExplainAudit [sfDir] [queryName ...]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (name <- names; fn <- SparkEntry.queries.get(name)) {
      val df = fn(spark, sfDir)
      // execute df's OWN QueryExecution so AQE finalizes: codegen
      // spans and reused exchanges only exist in the FINAL plan (a
      // write/count would build a separate execution and leave this
      // one initial)
      df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val pushed = "PushedFilters: \\[[^\\]]+\\]".r.findAllIn(plan)
        .filterNot(_.contains("[]")).size
      val broadcasts = "BroadcastHashJoin".r.findAllIn(plan).size
      val sortMerge = "SortMergeJoin".r.findAllIn(plan).size
      val codegenSpans = "codegen id : (\\d+)".r.findAllMatchIn(plan)
        .map(_.group(1)).toSet.size
      val scans = "Scan parquet".r.findAllIn(plan).size
      val readSchemas = "ReadSchema: struct<([^>]*)>".r.findAllMatchIn(plan)
        .map(_.group(1).count(_ == ',') + 1).toSeq
      // scale red flags: nested-loop joins of ANY join type (LeftAnti
      // / FullOuter / ExistenceJoin variants are just as quadratic as
      // Inner — allowlisting three types silently reported them as
      // zero), excluding only the benign condition-free cross joins
      // (1-row bounds/stats broadcasts, Join condition: None in the
      // detail block), any cartesian product, and the exchange count
      val bnlj = plan.split("\n\n").count { block =>
        block.linesIterator.toSeq.headOption.exists(
          _.matches("\\(\\d+\\) BroadcastNestedLoopJoin.*")) &&
          !block.contains("Join condition: None")
      }
      val cartesian = "CartesianProduct".r.findAllIn(plan).size
      // formatted mode puts the partitioning in a detail line; count
      // shuffle exchanges by their numbered operator headers
      val exchanges = "\\(\\d+\\) Exchange\\b".r.findAllIn(plan).size
      println(s"$name: scans=$scans pushedFilterScans=$pushed " +
        s"broadcastJoins=$broadcasts sortMergeJoins=$sortMerge " +
        s"nestedLoopJoins=$bnlj cartesian=$cartesian " +
        s"exchanges=$exchanges " +
        s"codegenSpans=$codegenSpans readCols=${readSchemas.mkString("/")}")
      if (args.length > 1) println(plan)
    }
    spark.stop()
  }
}
