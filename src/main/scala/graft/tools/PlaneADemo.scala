package graft.tools

import scala.collection.immutable.ListMap

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.core._

/** End-to-end Plane-A walkthrough against live Spark tables: register
  * fixture relations, declare a small manifest, introspect schemas,
  * run the reconciliation pipeline, and inherit docs down the DAG.
  * Run: sbt "runMain graft.tools.PlaneADemo [sfDir]"
  */
object PlaneADemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plane-a-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)

    val settings = EngineSettings(addProgenitorToMeta = true)

    // A dbt-style mini project: source -> staging view -> mart.
    val source = NodeMeta(
      uniqueId = "source.project.main.orders", name = "orders",
      resourceType = "source",
      columns = ListMap(
        "o_orderkey" -> ColumnMeta("o_orderkey", Some("Primary key of the order")),
        "o_custkey" -> ColumnMeta("o_custkey", Some("Ordering customer"),
          tags = Seq("fk")),
        "o_totalprice" -> ColumnMeta("o_totalprice", Some("Total order price"))))
    val stg = NodeMeta(
      uniqueId = "model.project.stg_orders", name = "orders", resourceType = "model",
      deps = Seq("source.project.main.orders"))
    var manifest = Manifest(Seq(source, stg))

    // 1. Introspect the live relation (Plane B is the warehouse).
    val introspected = Introspection.getColumns(spark, "orders", settings)
    println(s"introspected orders => ${introspected.values.map(c => s"${c.name}:${c.dataType}").mkString(", ")}")

    // 2. Reconcile: inject DB columns, sort DB-order, sync dtypes.
    val pipeline = Transforms.Pipeline()
      .andThen("inject", (_, n) => Transforms.injectMissingColumns(n, introspected, settings))
      .andThen("sort", (_, n) => Transforms.sortColumnsAsInDatabase(n, introspected, settings))
      .andThen("sync-types", (_, n) => Transforms.synchronizeDataTypes(n, introspected, settings))
      .andThen("inherit", (m, n) => Inheritance.inheritUpstreamColumnKnowledge(m, n, settings))
    val result = pipeline.run(manifest)
    manifest = result.manifest

    result.steps.foreach(s => println(f"step ${s.name}%-12s ${s.seconds}%.3fs mutated=${s.mutated}"))
    val stgOut = manifest.get("model.project.stg_orders").get
    stgOut.columns.values.foreach { c =>
      println(s"stg_orders.${c.name} type=${c.dataType.getOrElse("?")} " +
        s"desc=${c.description.getOrElse("")} tags=${c.tags.mkString(",")} " +
        s"progenitor=${c.meta.getOrElse("osmosis_progenitor", "-")}")
    }
    spark.stop()
  }
}
