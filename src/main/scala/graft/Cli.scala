package graft

import org.apache.spark.sql.SparkSession

import graft.exec.ModelExecutor
import graft.project.ProjectLoader

/** Command-line surface mirroring the reference CLI groups
  * (cli/main.py): `build` a project, `run-sql` for ad-hoc
  * jinja-SQL execution, `inherit` to run the metadata pipeline.
  *
  * Usage:
  *   sbt "runMain graft.Cli build <projectDir>"
  *   sbt "runMain graft.Cli run-sql <projectDir> <sql>"
  *   sbt "runMain graft.Cli inherit <projectDir>"
  */
object Cli {
  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "build" :: dir :: Nil =>
      val spark = session()
      val project = ProjectLoader.load(dir)
      val executor = new ModelExecutor(spark, project)
      val order = executor.buildAll()
      order.foreach(uid => println(s"built $uid"))
      spark.stop()

    case "run-sql" :: dir :: sql :: Nil =>
      val spark = session()
      val project = ProjectLoader.load(dir)
      val executor = new ModelExecutor(spark, project)
      executor.buildAll()
      // reference caps display at 50 rows (cli/main.py:1650-1656)
      executor.executeSql(sql).show(50, truncate = false)
      spark.stop()

    case "inherit" :: dir :: Nil =>
      val spark = session()
      val project = ProjectLoader.load(dir)
      val executor = new ModelExecutor(spark, project)
      executor.buildAll()
      val settings = graft.core.EngineSettings(addProgenitorToMeta = true)
      var manifest = executor.manifest
      val pipeline = graft.core.Transforms.Pipeline()
        .andThen("inherit", (m, n) =>
          graft.core.Inheritance.inheritUpstreamColumnKnowledge(m, n, settings))
      val result = pipeline.run(manifest)
      for (node <- result.manifest.nodes.values if node.resourceType == "model";
           c <- node.columns.values if c.description.exists(_.nonEmpty))
        println(s"${node.name}.${c.name}: ${c.description.get}")
      spark.stop()

    case "lint" :: dir :: Nil =>
      val spark = session()
      val project = ProjectLoader.load(dir)
      val executor = new ModelExecutor(spark, project)
      executor.buildAll()
      val violations = graft.core.Lint.lintManifest(
        executor.manifest, spark = Some(spark))
      for ((uid, vs) <- violations.toSeq.sortBy(_._1); v <- vs)
        println(s"$uid:${v.line}:${v.col} [${v.ruleId}] ${v.message}")
      spark.stop()
      if (violations.values.exists(_.exists(_.severity == "error"))) sys.exit(1)

    case "diff" :: dir :: Nil =>
      val spark = session()
      val project = ProjectLoader.load(dir)
      val executor = new ModelExecutor(spark, project)
      executor.buildAll()
      val settings = graft.core.EngineSettings()
      for (node <- executor.manifest.models.toSeq.sortBy(_.uniqueId)
           if node.columns.nonEmpty) {
        val dbCols = graft.core.Introspection.getColumns(spark, node.name, settings)
        val result = graft.core.Diff.compareNode(node, dbCols)
        for (c <- result.changes)
          println(s"[${c.severity}] ${c.description}")
        if (result.changes.nonEmpty) {
          val plan = graft.core.Migration.planFor(node.name, result)
          plan.steps.foreach(s => println(s"  ddl> ${s.sql}"))
        }
      }
      spark.stop()

    case _ =>
      System.err.println("usage: graft.Cli build|run-sql|inherit|lint|diff <projectDir> [sql]")
      sys.exit(2)
  }
}
