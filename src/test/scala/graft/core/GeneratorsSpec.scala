package graft.core

import scala.collection.immutable.ListMap

import org.scalatest.funsuite.AnyFunSuite

class GeneratorsSpec extends AnyFunSuite {

  test("snake_case conversion handles camel, spaces, and symbols") {
    assert(Staging.toSnakeCase("CustomerID") == "customer_id")
    assert(Staging.toSnakeCase("First Name") == "first_name")
    assert(Staging.toSnakeCase("order-date") == "order_date")
    assert(Staging.toSnakeCase("already_snake") == "already_snake")
  }

  test("staging generation emits renames and YAML spec") {
    val src = NodeMeta("source.p.raw.Orders", "Orders", "source",
      schema = "raw", fqn = Seq("p", "raw", "Orders"),
      columns = ListMap(
        "OrderID" -> ColumnMeta("OrderID", Some("The PK"), Some("BIGINT")),
        "amount" -> ColumnMeta("amount")))
    val gen = Staging.generateStagingModel(src)
    assert(gen.name == "stg_Orders")
    assert(gen.sql.contains("source('raw', 'Orders')"))
    assert(gen.sql.contains("OrderID as order_id"))
    assert(gen.sql.contains("        amount\n")) // no rename needed
    val cols = gen.yamlEntry("columns").asInstanceOf[Seq[Map[String, Any]]]
    assert(cols.head("name") == "order_id")
    assert(cols.head("description") == "The PK")
  }

  test("voice learning profiles style from documented nodes") {
    val m = Manifest(Seq(NodeMeta("model.a", "a", "model",
      description = "Aggregates customer orders.",
      columns = ListMap(
        "x" -> ColumnMeta("x", Some("Unique identifier for a customer.")),
        "y" -> ColumnMeta("y", Some("Unique identifier for an order."))))))
    val profile = VoiceLearning.analyze(m)
    assert(profile.nDescriptions == 3)
    assert(profile.usesSentenceCase == 1.0)
    assert(profile.endsWithPeriod == 1.0)
    assert(profile.commonPhrases.exists(_._1 == "unique identifier"))
  }

  test("voice learning: tone, terminology, and prompt rendering") {
    val m = Manifest(Seq(NodeMeta("model.a", "a", "model",
      description = "Contains the customer order history with timestamp columns.",
      columns = ListMap(
        "id" -> ColumnMeta("id", Some("Unique id key.")),
        "u" -> ColumnMeta("u", Some("Tracks the customer id across systems.")),
        "t" -> ColumnMeta("t", Some("Timestamp of the event; timestamp is UTC."))))))
    val p = VoiceLearning.analyze(m)
    assert(p.toneMarkers("imperative") >= 2) // contains / tracks
    assert(p.toneMarkers("technical") >= 2) // id / timestamp
    // 'id' beats 'identifier'/'key' and 'timestamp' beats 'datetime'
    assert(p.terminologyPreferences.contains("id") ||
      p.terminologyPreferences.contains("timestamp"))
    val ctx = p.toPromptContext()
    assert(ctx.contains("Target description length"))
    assert(ctx.contains("Model Description Examples"))
    assert(ctx.contains("Column Description Examples"))
    assert(VoiceLearning.analyze(Manifest(Seq.empty[NodeMeta])).toPromptContext()
      == "No style information available.")
  }

  test("style examples: targeted from similar nodes, general otherwise") {
    val documented = NodeMeta("model.c", "customer_payments", "model",
      description = "Payment facts per customer.",
      columns = ListMap("customer_id" ->
        ColumnMeta("customer_id", Some("Customer FK."))))
    val target = NodeMeta("model.t", "customer_orders", "model",
      columns = ListMap("customer_id" -> ColumnMeta("customer_id")))
    val m = Manifest(Seq(documented, target))
    val targeted = VoiceLearning.extractStyleExamples(m, Some(target))
    assert(targeted("model_descriptions").exists(_.contains("customer_payments")))
    assert(targeted("column_descriptions").exists(_.contains("Customer FK.")))
    val general = VoiceLearning.extractStyleExamples(m, None)
    assert(general("model_descriptions").exists(_.startsWith("# Example 1")))
  }

  test("similar documented nodes ranked by shared columns") {
    val target = NodeMeta("model.t", "customer_orders", "model",
      columns = ListMap("customer_id" -> ColumnMeta("customer_id")))
    val close = NodeMeta("model.c", "customer_payments", "model",
      columns = ListMap("customer_id" -> ColumnMeta("customer_id", Some("Documented"))))
    val far = NodeMeta("model.f", "inventory", "model",
      columns = ListMap("sku" -> ColumnMeta("sku", Some("Documented"))))
    val got = VoiceLearning.similarDocumentedNodes(Manifest(Seq(target, close, far)), target, 1)
    assert(got.head.uniqueId == "model.c")
  }

  test("external formatter is non-fatal and bounded") {
    val ok = Formatting.runExternalFormatter(Seq("true"),
      Seq(java.nio.file.Paths.get("/dev/null")))
    assert(ok.ran && ok.exitCode == 0)
    val missing = Formatting.runExternalFormatter(Seq("definitely-not-a-binary-xyz"),
      Seq(java.nio.file.Paths.get("/dev/null")))
    assert(missing.exitCode != 0) // captured, not thrown
    val none = Formatting.runExternalFormatter(Nil, Nil)
    assert(!none.ran)
  }
}
