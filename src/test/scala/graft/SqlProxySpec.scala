package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.exec.ModelExecutor
import graft.project.ProjectLoader
import graft.serve.SqlProxy

/** HTTP SQL proxy (A45): query execution with Jinja compilation,
  * manifest-backed schema serving, and the ALTER TABLE comment
  * middleware — exercised over a real loopback socket.
  */
class SqlProxySpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  private val mapper = new ObjectMapper()
  private val client = HttpClient.newHttpClient()

  lazy val (executor, proxy) = {
    import spark.implicits._
    Seq((1, "north"), (2, "south")).toDF("region_id", "region_name")
      .createOrReplaceTempView("region_lookup")
    val e = new ModelExecutor(spark, ProjectLoader.load("fixtures/jaffle"))
    e.buildAll()
    (e, new SqlProxy(e).start())
  }

  private def post(path: String, body: String) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${proxy.boundPort}$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), mapper.readTree(resp.body()))
  }

  private def get(path: String) = {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${proxy.boundPort}$path"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), mapper.readTree(resp.body()))
  }

  test("plain SQL round-trips rows and columns") {
    val (code, json) = post("/query",
      """{"sql": "SELECT customer_id, number_of_orders FROM customers WHERE customer_id = 1"}""")
    assert(code == 200)
    assert(json.get("columns").get(0).asText() == "customer_id")
    assert(json.get("rows").size() == 1)
    assert(json.get("rows").get(0).get(1).asLong() == 3L)
  }

  test("jinja SQL is compiled before execution") {
    val (code, json) = post("/query",
      """{"sql": "SELECT COUNT(*) AS n FROM {{ ref('customers') }}"}""")
    assert(code == 200)
    assert(json.get("columns").get(0).asText() == "n")
    assert(json.get("rows").get(0).get(0).asLong() > 0)
  }

  test("limit caps the returned rows") {
    val (_, json) = post("/query",
      """{"sql": "SELECT * FROM orders", "limit": 3}""")
    assert(json.get("rows").size() == 3)
  }

  test("bad SQL returns a structured 400, not a dropped connection") {
    val (code, json) = post("/query", """{"sql": "SELECT FROM nope syntax"}""")
    assert(code == 400)
    assert(json.get("error").asText().nonEmpty)
  }

  test("ALTER TABLE MODIFY COLUMN COMMENT updates the in-memory manifest only") {
    val before = executor.manifest.nodes("model.jaffle.customers")
      .columns("customer_id").description
    val (code, json) = post("/query",
      """{"sql": "ALTER TABLE main.customers MODIFY COLUMN customer_id BIGINT COMMENT 'proxy-written doc';"}""")
    assert(code == 200 && json.get("intercepted").asBoolean())
    val after = executor.manifest.nodes("model.jaffle.customers")
      .columns("customer_id").description
    assert(after.contains("proxy-written doc") && after != before)
    // schema endpoint reflects the session-scoped update
    val (_, schema) = get("/schema")
    assert(schema.get("main").get("customers").get("customer_id")
      .get("description").asText() == "proxy-written doc")
    // and nothing was written to disk: the YAML still has the original
    val yaml = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/jaffle/models/schema.yml")))
    assert(!yaml.contains("proxy-written doc"))
  }

  test("ALTER TABLE COMMENT= updates the node description") {
    val (code, json) = post("/query",
      """{"sql": "ALTER TABLE main.orders COMMENT = 'orders fact table';"}""")
    assert(code == 200 && json.get("intercepted").asBoolean())
    assert(executor.manifest.nodes("model.jaffle.orders")
      .description == "orders fact table")
  }

  test("root serves the workbench page; unknown paths 404") {
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${proxy.boundPort}/"))
        .GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 200)
    assert(resp.headers().firstValue("Content-Type").orElse("").startsWith("text/html"))
    assert(resp.body().contains("graft workbench"))
    // the page is wired to the JSON endpoints it ships beside,
    // including the profiling pane
    assert(resp.body().contains("/schema") && resp.body().contains("/query"))
    assert(resp.body().contains("/profile") && resp.body().contains("[profile]"))
    val (code, json) = get("/nope")
    assert(code == 404 && json.get("error") != null)
  }

  test("POST /profile serves the one-pass relation profile (A46)") {
    val (code, json) = post("/profile", """{"relation": "region_lookup"}""")
    assert(code == 200, json.toString)
    assert(json.get("relation").asText() == "region_lookup")
    val cols = json.get("columns")
    assert(cols.size() == 2)
    val byName = (0 until cols.size()).map(cols.get)
      .map(c => c.get("column").asText() -> c).toMap
    val id = byName("region_id")
    assert(id.get("n_rows").asLong() == 2L)
    assert(id.get("n_nulls").asLong() == 0L)
    assert(id.get("approx_distinct").asLong() == 2L)
    assert(id.get("min").asText() == "1" && id.get("max").asText() == "2")
    assert(byName("region_name").get("min").asText() == "north")
    // a bogus relation comes back structured, not as a dropped socket
    val (bad, err) = post("/profile", """{"relation": "no_such_table"}""")
    assert(bad == 400 && err.get("error") != null)
  }

  test("POST /profile deep=true serves the ydata-grade profile (A46)") {
    val (code, json) = post("/profile",
      """{"relation": "region_lookup", "deep": true}""")
    assert(code == 200, json.toString)
    assert(json.get("deep").asBoolean())
    val cols = json.get("columns")
    val byName = (0 until cols.size()).map(cols.get)
      .map(c => c.get("column").asText() -> c).toMap
    val id = byName("region_id")
    // base stats ride along unchanged
    assert(id.get("n_rows").asLong() == 2L)
    assert(id.get("approx_distinct").asLong() == 2L)
    // numeric extras: mean/stddev/quantiles/zeros/negatives
    assert(math.abs(id.get("mean").asDouble() - 1.5) < 1e-9)
    assert(id.get("quantiles").size() == 5)
    assert(id.get("zeros").asLong() == 0L)
    assert(id.get("negatives").asLong() == 0L)
    assert(id.get("histogram").size() > 0)
    // string extras: length stats + top values; no numeric block
    val nm = byName("region_name")
    assert(nm.get("len_min").asLong() == 5L)
    assert(nm.get("top_values").size() == 2)
    assert(nm.get("mean") == null && nm.get("histogram") == null)
  }

  test("POST /ai op=doc synthesizes docs into the in-memory manifest (A46)") {
    val (code, json) = post("/ai", """{"op": "doc", "table": "customers"}""")
    assert(code == 200, json.toString)
    assert(json.get("table").asText() == "customers")
    assert(json.get("description").asText().nonEmpty)
    val cols = json.get("columns")
    assert(cols.size() > 0)
    assert(cols.get("customer_id") != null)
    // applied to the live manifest (no YAML writes), like the comment
    // middleware
    val n = executor.manifest.nodes.values.find(_.name == "customers").get
    assert(n.columns.values.exists(_.description.exists(_.nonEmpty)))
    // the workbench page carries the pane wiring
    val resp = client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:${proxy.boundPort}/"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
    assert(resp.body().contains("[ai doc]") && resp.body().contains("/ai"))
  }

  test("POST /ai op=sql drafts SQL from natural language; bad ops are structured 400s") {
    val (code, json) = post("/ai",
      """{"op": "sql", "query": "how many orders per customer"}""")
    assert(code == 200, json.toString)
    assert(json.get("sql").asText().nonEmpty)
    val (bad, err) = post("/ai", """{"op": "nope"}""")
    assert(bad == 400 && err.get("error") != null)
    val (bad2, err2) = post("/ai", """{"op": "doc", "table": "no_such"}""")
    assert(bad2 == 400 && err2.get("error").asText().contains("no_such"))
  }

  test("concurrent queries are served in parallel by the handler pool") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(Future.sequence((1 to 6).toList.map { i =>
      Future(post("/query",
        s"""{"sql": "SELECT COUNT(*) AS n FROM orders WHERE order_id % 7 <> $i"}"""))
    }), 60.seconds)
    assert(results.forall(_._1 == 200))
    assert(results.forall(_._2.get("rows").get(0).get(0).asLong() > 0))
  }

  test("the MaxLimit guard caps /query collects whatever the client asks") {
    val (code, json) = post("/query",
      s"""{"sql": "SELECT id FROM range(${proxy.MaxLimit * 3})", "limit": 999999999}""")
    assert(code == 200)
    assert(json.get("rows").size() == proxy.MaxLimit)
  }

  test("POST /cancel kills a tagged in-flight query") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // ~10^12 products: far beyond the test timeout if left running
    val slow = Future(post("/query",
      """{"sql": "SELECT SUM(a.id * b.id) AS s FROM range(1000000) a CROSS JOIN range(1000000) b", "tag": "slow-1"}"""))
    // cancel until the handler responds (covers the race where the
    // cancel lands before the first job is submitted)
    var done = false
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!done && System.nanoTime() < deadline) {
      val (cc, cj) = post("/cancel", """{"tag": "slow-1"}""")
      assert(cc == 200 && cj.get("cancelled").asText() == "slow-1")
      Thread.sleep(200)
      done = slow.isCompleted
    }
    val (code, json) = Await.result(slow, 5.seconds)
    assert(code == 400, s"cancelled query must error, got $code $json")
    assert(json.get("error").asText().nonEmpty)
  }

  test("schema endpoint serves schema -> table -> column -> type/description") {
    val (code, schema) = get("/schema")
    assert(code == 200)
    val cust = schema.get("main").get("customers")
    assert(cust != null && cust.has("customer_id"))
    // no dtype recorded in the fixture YAML -> UNKNOWN, like the reference
    assert(cust.get("number_of_orders").get("type").asText() == "UNKNOWN")
    // described staging column serves its description
    val stg = schema.get("main").get("stg_customers")
    assert(stg.get("customer_id").get("description").asText() ==
      "Unique identifier for a customer")
  }
}
