package graft.core

import java.nio.file.{Files, Path}

import scala.collection.immutable.ListMap

import org.scalatest.funsuite.AnyFunSuite

/** Tests for the YAML plane: path templating, round-trip I/O with
  * preserved sections, node→YAML sync, restructuring, validation.
  */
class YamlPlaneSpec extends AnyFunSuite {

  def tmpRoot(): Path = Files.createTempDirectory("graft_yaml")

  val settings: EngineSettings = EngineSettings(
    vars = Map("dbt_osmosis_default_path" -> "{parent}/{model}.yml"))

  def model(name: String, path: String, cols: (String, String)*): NodeMeta =
    NodeMeta(s"model.p.$name", name, "model", schema = "analytics",
      path = path, columns = ListMap(cols.map { case (n, d) =>
        n -> ColumnMeta(n, description = Some(d).filter(_.nonEmpty))
      }: _*))

  test("path templating renders {model}/{parent}/{schema}/{node.*} vars") {
    val root = tmpRoot()
    val n = model("orders", "models/marts/orders.sql")
    assert(PathManagement.targetYamlPath(root, n, settings) ==
      root.resolve("models/marts/marts/orders.yml"))
    val s2 = EngineSettings(vars = Map(
      "dbt_osmosis_default_path" -> "/{node.schema}/{node.name}.yml"))
    assert(PathManagement.targetYamlPath(root, n, s2) ==
      root.resolve("models/analytics/orders.yml"))
  }

  test("path traversal outside the project root is rejected") {
    val root = tmpRoot()
    val n = model("orders", "models/orders.sql")
    val bad = EngineSettings(vars = Map(
      "dbt_osmosis_default_path" -> "/../../../etc/{model}.yml"))
    assertThrows[PathManagement.PathResolutionError](
      PathManagement.targetYamlPath(root, n, bad))
  }

  test("yaml round-trip preserves unmanaged top-level sections") {
    val root = tmpRoot()
    val p = root.resolve("schema.yml")
    Files.writeString(p,
      """version: 2
        |x-custom-anchor:
        |  owner: data-team
        |models:
        |  - name: orders
        |    columns:
        |      - name: order_id
        |        description: Order PK
        |""".stripMargin)
    val doc = YamlIO.read(p)
    assert(doc.preserved.contains("x-custom-anchor"))
    YamlIO.write(p, doc)
    val text = Files.readString(p)
    assert(text.contains("x-custom-anchor"))
    assert(text.contains("owner: data-team"))
    assert(text.contains("Order PK"))
  }

  test("sync merges node columns into yaml, preserving jinja docs and extra keys") {
    val root = tmpRoot()
    val p = root.resolve("orders.yml")
    Files.writeString(p,
      """version: 2
        |models:
        |  - name: orders
        |    columns:
        |      - name: order_id
        |        description: '{{ doc("order_id_doc") }}'
        |        tests: [unique]
        |""".stripMargin)
    YamlIO.invalidate()
    val n = model("orders", "models/orders.sql",
      "order_id" -> "Rendered description", "amount" -> "Order amount")
    val doc = SyncOperations.syncNodeToDoc(YamlIO.read(p), n)
    val models = doc.managed("models").asInstanceOf[Seq[Map[String, Any]]]
    val cols = models.head("columns").asInstanceOf[Seq[Map[String, Any]]]
    val orderId = cols.find(_("name") == "order_id").get
    assert(orderId("description").toString.contains("{{ doc(")) // jinja preserved
    assert(orderId("tests") == Seq("unique")) // unmanaged key kept
    assert(cols.exists(c => c("name") == "amount" &&
      c("description") == "Order amount"))
  }

  test("sync fails closed on duplicate entries") {
    val root = tmpRoot()
    val p = root.resolve("dup.yml")
    Files.writeString(p,
      """models:
        |  - name: orders
        |  - name: orders
        |""".stripMargin)
    YamlIO.invalidate()
    assertThrows[SyncOperations.DuplicateEntryError](
      SyncOperations.syncNodeToDoc(YamlIO.read(p), model("orders", "models/orders.sql")))
  }

  test("source sync nests under sources[].tables[]") {
    val n = NodeMeta("source.p.raw.events", "events", "source",
      schema = "raw", fqn = Seq("p", "raw", "events"),
      columns = ListMap("ts" -> ColumnMeta("ts", Some("Event time"))))
    val doc = SyncOperations.syncNodeToDoc(
      YamlIO.YamlDoc(ListMap.empty, ListMap.empty), n)
    val sources = doc.managed("sources").asInstanceOf[Seq[Map[String, Any]]]
    assert(sources.head("name") == "raw")
    val tables = sources.head("tables").asInstanceOf[Seq[Map[String, Any]]]
    assert(tables.head("name") == "events")
  }

  test("restructure moves entries to their target files and empties old ones") {
    val root = tmpRoot()
    Files.createDirectories(root.resolve("models/marts"))
    val oldFile = root.resolve("models/all.yml")
    Files.writeString(oldFile,
      """version: 2
        |models:
        |  - name: orders
        |    description: The orders model
        |""".stripMargin)
    YamlIO.invalidate()
    val n = model("orders", "models/marts/orders.sql")
      .copy(patchPath = Some("models/all.yml"), description = "The orders model")
    val manifest = Manifest(Seq(n))
    val plan = Restructuring.draftPlan(root, manifest, settings)
    assert(!plan.isEmpty)
    assert(plan.ops.head.targetFile == root.resolve("models/marts/marts/orders.yml"))
    val updated = Restructuring.applyPlan(root, plan, manifest, settings)
    assert(Files.exists(root.resolve("models/marts/marts/orders.yml")))
    val moved = Files.readString(root.resolve("models/marts/marts/orders.yml"))
    assert(moved.contains("name: orders"))
    assert(!Files.exists(oldFile) ||
      !Files.readString(oldFile).contains("name: orders"))
    assert(updated.get("model.p.orders").get.patchPath
      .contains("models/marts/marts/orders.yml"))
  }

  test("validation passes resolvable SQL and fails unresolvable columns") {
    val spark = graft.TestSpark.session
    graft.Tables.registerAll(spark, "/root/testdata/sf0.001")
    assert(Validation.validateSql(spark, "SELECT o_orderkey FROM orders").isEmpty)
    val err = Validation.validateSql(spark, "SELECT no_such_col FROM orders")
    assert(err.exists(_.contains("no_such_col")))
  }
}
