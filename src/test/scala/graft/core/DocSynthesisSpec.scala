package graft.core

import scala.collection.immutable.ListMap

import org.scalatest.funsuite.AnyFunSuite

import DocSynthesis._

/** LLM doc-synthesis scaffolding tests with a mock client — mirrors
  * the reference's tests/core/test_llm.py surface (spec parsing,
  * retry, redaction, truncation) plus transforms.py's orchestration
  * (windowing, bulk switch, topological reuse). No network anywhere.
  */
class DocSynthesisSpec extends AnyFunSuite {

  private class ScriptedClient(responses: String*) extends LlmClient {
    val calls = scala.collection.mutable.ArrayBuffer[String]()
    private var i = -1
    def complete(sys: String, user: String): String = {
      calls += user
      i = math.min(i + 1, responses.length - 1)
      responses(i)
    }
  }

  private val settings = EngineSettings()

  private def node(name: String, cols: Seq[(String, String)],
      deps: Seq[String] = Nil, desc: String = ""): NodeMeta =
    NodeMeta(s"model.p.$name", name, "model", deps = deps, description = desc,
      columns = ListMap(cols.map { case (n, d) =>
        n -> ColumnMeta(n, description = Some(d).filter(_.nonEmpty))
      }: _*))

  test("model spec parses plain JSON and markdown-fenced JSON") {
    val json = """{"description": "A test model", "columns": [
                 |  {"name": "id", "description": "Unique identifier"},
                 |  {"name": "name", "description": "User name"}]}""".stripMargin
    val spec = parseModelSpec(json)
    assert(spec.description.contains("A test model"))
    assert(spec.columns == Seq(ColumnSpec("id", "Unique identifier"),
      ColumnSpec("name", "User name")))
    val fenced = parseModelSpec("```json\n" + json + "\n```")
    assert(fenced == spec)
  }

  test("model spec fails loud on invalid JSON and empty responses") {
    val bad = intercept[LlmResponseError](parseModelSpec("This is not valid JSON"))
    assert(bad.message.contains("invalid JSON"))
    val empty = intercept[LlmResponseError](parseModelSpec("   "))
    assert(empty.message.contains("empty response"))
  }

  test("retry: backs off on RateLimited, honors retry-after, gives up") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Double]()
    var n = 0
    val out = callWithRetry(() => {
      n += 1
      if (n < 3) throw RateLimited() else "ok"
    }, maxRetries = 5, initialDelay = 1.0, sleeper = sleeps += _)
    assert(out == "ok" && sleeps.toSeq == Seq(1.0, 2.0)) // exponential
    sleeps.clear()
    callWithRetry(() => {
      sleeps.size match {
        case 0 => throw RateLimited(Some(7.5))
        case _ => "ok"
      }
    }, sleeper = sleeps += _)
    assert(sleeps.toSeq == Seq(7.5)) // Retry-After wins over computed delay
    assertThrows[LlmResponseError](
      callWithRetry(() => throw RateLimited(), maxRetries = 2, sleeper = _ => ()))
    // non-rate-limit errors propagate immediately
    assertThrows[IllegalArgumentException](
      callWithRetry(() => throw new IllegalArgumentException("boom"), sleeper = _ => ()))
  }

  test("credential redaction and SQL truncation") {
    val red = redactCredentials(
      "SELECT 1 -- api_key=abc123 password: hunter2 sk-live_0123456789abcdef")
    assert(!red.contains("abc123") && !red.contains("hunter2") &&
      !red.contains("0123456789abcdef"))
    val sql = "SELECT " + ("x," * 100)
    val cut = truncateSql(sql, Some(20))
    assert(cut.startsWith(sql.take(20)) && cut.contains("truncated"))
    assert(truncateSql(sql, None) == sql)
  }

  test("upstream docs window: caps columns per dep and total lines") {
    val bigDep = node("up", (1 to 40).map(i => s"c$i" -> s"doc $i"))
    val m = Manifest(Seq(bigDep, node("down", Seq("a" -> ""), deps = Seq("model.p.up"))))
    val docs = collectUpstreamDocs(m, m.get("model.p.down").get, settings.placeholders)
    assert(docs.exists(_.contains("omitting additional columns")))
    assert(docs.count(_.startsWith("- c")) <= 21)
    // many deps → total window bounded with a remaining-nodes note
    val deps = (1 to 30).map(i => node(s"d$i", (1 to 10).map(j => s"k$j" -> s"v$j")))
    val m2 = Manifest(deps :+ node("sink", Seq("a" -> ""),
      deps = deps.map(_.uniqueId)))
    val docs2 = collectUpstreamDocs(m2, m2.get("model.p.sink").get, settings.placeholders)
    assert(docs2.exists(_.startsWith("# remaining nodes are:")))
    // the cap is checked after each dep completes (reference
    // semantics), so the window is 100 + one dep's lines + the note
    assert(docs2.length <= 100 + 12)
    // no documented upstream → explicit placeholder
    val lonely = Manifest(Seq(node("solo", Seq("a" -> ""))))
    assert(collectUpstreamDocs(lonely, lonely.get("model.p.solo").get,
      settings.placeholders) == Seq("(no upstream documentation found)"))
  }

  test("bulk switch: >10 missing columns → ONE bulk request") {
    val cols = (1 to 12).map(i => s"c$i" -> "")
    val spec = "{\"description\": \"bulk\", \"columns\": [" +
      (1 to 12).map(i => s"""{"name": "c$i", "description": "d$i"}""").mkString(",") + "]}"
    val client = new ScriptedClient(spec)
    val m = Manifest(Seq(node("m", cols)))
    val out = synthesizeNode(m, m.get("model.p.m").get, settings, client)
    assert(client.calls.size == 1, "bulk path must make exactly one request")
    assert(out.description == "bulk")
    assert(out.columns("c7").description.contains("d7"))
  }

  test("individual path fills only empty/placeholder descriptions") {
    val client = new ScriptedClient("generated text")
    val m = Manifest(Seq(node("m",
      Seq("keep" -> "already documented", "fill" -> "", "ph" -> "Not documented"),
      desc = "Pending further documentation")))
    val out = synthesizeNode(m, m.get("model.p.m").get, settings, client)
    // 1 table doc + 2 column docs (keep untouched)
    assert(client.calls.size == 3)
    assert(out.description == "generated text")
    assert(out.columns("keep").description.contains("already documented"))
    assert(out.columns("fill").description.contains("generated text"))
    assert(out.columns("ph").description.contains("generated text"))
  }

  test("NL->SQL strips fences; NL->model parses the full spec contract") {
    val sqlClient = new ScriptedClient(
      "```sql\nSELECT o_orderkey FROM {{ ref('orders') }}\n```")
    val sql = generateSqlFromNl(sqlClient, "order keys",
      Seq("orders" -> Seq("o_orderkey")))
    assert(sql == "SELECT o_orderkey FROM {{ ref('orders') }}")
    assert(sqlClient.calls.head.contains("orders(o_orderkey)"))
    val modelClient = new ScriptedClient(
      """```json
        |{"model_name": "fct_orders", "description": "Order facts",
        | "sql": "SELECT 1", "materialized": "incremental",
        | "columns": [{"name": "o_orderkey", "description": "PK"}]}
        |```""".stripMargin)
    val spec = generateModelFromNl(modelClient, "build an orders fact")
    assert(spec.modelName == "fct_orders" && spec.materialized == "incremental")
    assert(spec.columns == Seq(ColumnSpec("o_orderkey", "PK")))
    // invalid materialization falls back to view
    val weird = generateModelFromNl(new ScriptedClient(
      """{"model_name": "m", "sql": "SELECT 1", "materialized": "exotic"}"""), "x")
    assert(weird.materialized == "view")
  }

  test("semantic analysis fills sparse columns, skips documented ones") {
    val sem = """{"semantic_type": "foreign_key",
                | "business_meaning": "links order to customer",
                | "inferred_relationship": "customers.customer_id",
                | "description": "Customer FK.",
                | "tags": ["join-key"], "meta": {"domain": "sales"}}""".stripMargin
    val client = new ScriptedClient(sem)
    val m = Manifest(Seq(node("m", Seq(
      "customer_id" -> "",
      "well_documented" -> ("x" * 60)))))
    val out = DocSynthesis.applySemanticAnalysis(
      m, m.get("model.p.m").get, settings, client)
    assert(client.calls.size == 1, "documented column must be skipped")
    val c = out.columns("customer_id")
    assert(c.description.contains("Customer FK."))
    assert(c.tags.contains("join-key"))
    assert(c.meta("semantic_type") == "foreign_key")
    assert(c.meta("foreign_key") == "customers.customer_id")
    assert(c.meta("domain") == "sales")
    assert(out.columns("well_documented").meta.isEmpty)
    // a garbage response leaves the column untouched, no exception
    val out2 = DocSynthesis.applySemanticAnalysis(
      m, m.get("model.p.m").get, settings, new ScriptedClient("nope"))
    assert(out2.columns("customer_id").description.isEmpty)
  }

  test("staging spec: client transformations applied, fallback on garbage") {
    val src = NodeMeta("source.p.raw.orders", "orders", "source",
      fqn = Seq("p", "raw", "orders"),
      columns = ListMap(
        "OrderID" -> ColumnMeta("OrderID", dataType = Some("BIGINT")),
        "amt" -> ColumnMeta("amt", dataType = Some("STRING"))))
    val resp = """{"staging_name": "stg_orders", "description": "Cleansed orders",
                 | "materialization": "view", "columns": [
                 |  {"original_name": "OrderID", "new_name": "order_id"},
                 |  {"original_name": "amt", "new_name": "amount",
                 |   "expression": "CAST(amt AS DECIMAL(18,2))",
                 |   "description": "Order amount"}]}""".stripMargin
    val client = new ScriptedClient(resp)
    val spec = Staging.generateStagingSpecWithClient(client, src)
    assert(spec.stagingName == "stg_orders")
    assert(spec.columns(1).expression.contains("CAST(amt AS DECIMAL(18,2))"))
    val sql = Staging.renderStagingSql(spec, "raw")
    assert(sql.contains("{{ source('raw', 'orders') }}"))
    assert(sql.contains("OrderID as order_id"))
    assert(sql.contains("CAST(amt AS DECIMAL(18,2)) as amount"))
    // garbage → deterministic snake_case fallback
    val fb = Staging.generateStagingSpecWithClient(new ScriptedClient("nope"), src)
    assert(fb.stagingName == "stg_orders")
    assert(fb.columns.map(_.newName) == Seq("order_id", "amt"))
  }

  test("doc improvement suggestions carry calibrated confidence") {
    val client = new ScriptedClient("A better description.")
    val bare = suggestDocumentationImprovement(client, "column", None, "c")
    assert(bare.confidence == 0.5 && bare.text == "A better description.")
    val rich = suggestDocumentationImprovement(client, "table",
      currentDescription = None, name = "t", sqlContent = Some("SELECT 1"),
      upstreamDocs = Seq("- id: PK"), styleContext = Some("terse"))
    assert(math.abs(rich.confidence - 0.95) < 1e-9) // 0.5+0.2+0.15+0.1
    val contested = suggestDocumentationImprovement(client, "column",
      currentDescription = Some("Existing docs"), name = "c")
    assert(math.abs(contested.confidence - 0.4) < 1e-9)
    assert(contested.reasoning.contains("existing description"))
    assertThrows[IllegalArgumentException](
      suggestDocumentationImprovement(client, "index", None, "x"))
  }

  test("topological reuse: downstream inherits synthesized docs, saving requests") {
    val up = node("up", Seq("id" -> ""))
    val down = node("down", Seq("id" -> ""), deps = Seq("model.p.up"))
    val client = new ScriptedClient("synthesized doc")
    val m = synthesizeAll(Manifest(Seq(up, down)), settings, client)
    // up: table + column = 2 calls; down: inherits `id` from up's fresh
    // doc, so only its table description is requested = 1 call.
    assert(client.calls.size == 3,
      s"expected 3 calls (inheritance reuse), got ${client.calls.size}")
    assert(m.get("model.p.down").get.columns("id").description
      .contains("synthesized doc"))
  }
}
