package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.compile.{DbtCompiler, Jinja}
import graft.core.{EngineSettings, Inheritance}
import graft.exec.ModelExecutor
import graft.project.ProjectLoader

/** End-to-end slice (SURVEY §7 phase 1): load the jaffle fixture
  * project, seed CSVs, compile Jinja models, build in topological
  * order, and validate results + metadata flow.
  */
class ProjectBuildSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  lazy val project: ProjectLoader.Project = ProjectLoader.load("fixtures/jaffle")
  lazy val executor: ModelExecutor = {
    // the warehouse-owned source relation exists before the build
    // (the executor would otherwise register an empty placeholder)
    import spark.implicits._
    Seq((1, "north"), (2, "south")).toDF("region_id", "region_name")
      .createOrReplaceTempView("region_lookup")
    val e = new ModelExecutor(spark, project)
    e.buildAll()
    e
  }

  test("loader discovers seeds, models, docs, and materializations") {
    val m = project.manifest
    assert(m.nodes.keySet.exists(_.startsWith("seed.jaffle.raw_customers")))
    val stg = m.nodes("model.jaffle.stg_customers")
    assert(stg.materialized == "view") // folder-scoped config
    assert(m.nodes("model.jaffle.customers").materialized == "table")
    assert(stg.columns("customer_id").description.contains("Unique identifier for a customer"))
    assert(stg.columns("customer_id").tags == Seq("pk"))
  }

  test("jinja for-loop pivot compiles and runs (orders model)") {
    executor // force build
    val orders = spark.table("orders")
    assert(orders.columns.contains("credit_card_amount"))
    assert(orders.count() == 10)
    import org.apache.spark.sql.functions._
    val total = orders.agg(sum("amount").cast("double")).collect()(0).getDouble(0)
    assert(math.abs(total - 174.0) < 1e-9) // 17400 cents / 100
  }

  test("versioned ref resolves v1 vs latest") {
    executor
    val compiledCustomers = executor.manifest.nodes("model.jaffle.customers")
    assert(compiledCustomers.compiledCode.get.contains("from stg_customers"))
    assert(!compiledCustomers.compiledCode.get.contains("stg_customers_v2"))
    // unversioned ref in a scratch query resolves to the latest (v2)
    val c = DbtCompiler.compile("select * from {{ ref('stg_customers') }}",
      executor.manifest, project.vars)
    assert(c.sql.contains("stg_customers_v2"))
  }

  test("customers model aggregates correctly end-to-end") {
    executor
    val row = spark.sql(
      """SELECT first_order, number_of_orders,
        |       CAST(customer_lifetime_value AS DOUBLE)
        |FROM customers WHERE customer_id = 1""".stripMargin).collect()(0)
    assert(row.get(0).toString == "2018-01-01")
    assert(row.getLong(1) == 3L)
    // orders 1,5,10 → payments 1000+1700+3000 cents = 57.0 dollars
    assert(math.abs(row.getDouble(2) - 57.0) < 1e-9)
  }

  test("in-file config overrides and captures options") {
    val stgPayments = executor.manifest.nodes("model.jaffle.stg_payments")
    assert(stgPayments.materialized == "view")
    assert(stgPayments.config.get("dbt_osmosis_output_to_lower").contains(true))
  }

  test("executeSql compiles ad-hoc jinja against the manifest") {
    executor
    val df = executor.executeSql(
      "select count(*) as n from {{ ref('stg_payments') }} where amount > {{ var('min_amount', 10) }}")
    assert(df.collect()(0).getLong(0) == 7L)
  }

  test("inheritance flows docs from staging into downstream models") {
    executor
    val settings = EngineSettings(addProgenitorToMeta = true)
    val customers = executor.manifest.nodes("model.jaffle.customers")
    val inherited = Inheritance.inheritUpstreamColumnKnowledge(
      executor.manifest, customers, settings)
    assert(inherited.columns("customer_id").description
      .contains("Unique identifier for a customer"))
    assert(inherited.columns("customer_id").meta("osmosis_progenitor")
      == "model.jaffle.stg_customers")
    assert(inherited.columns("customer_id").tags.contains("pk"))
  }

  test("source() resolves to the warehouse relation and records the dep") {
    executor
    val regions = spark.table("regions").orderBy("region_id").collect()
    assert(regions.map(_.getString(1)).toSeq == Seq("NORTH", "SOUTH"))
    val node = executor.manifest.nodes("model.jaffle.regions")
    assert(node.deps.contains("source.jaffle.warehouse.region_lookup"))
  }

  test("missing source relations get empty typed placeholders") {
    val freshSpark = spark.newSession()
    val p = ProjectLoader.load("fixtures/jaffle")
    val e = new ModelExecutor(freshSpark, p)
    e.buildAll() // no region_lookup registered in this session
    assert(freshSpark.table("regions").count() == 0)
    assert(freshSpark.table("regions").columns.toSeq == Seq("region_id", "region_name"))
  }

  test("jinja engine corner cases") {
    val env = Jinja.Env(vars = Map("xs" -> Seq("a", "b")))
    assert(Jinja.renderTemplate("{% for x in xs %}{{ x }}{% if not loop.last %},{% endif %}{% endfor %}", env) == "a,b")
    assert(Jinja.renderTemplate("{% set y = 2 + 3 %}{{ y }}", env) == "5")
    assert(Jinja.renderTemplate("{% if 'a' in xs %}yes{% else %}no{% endif %}", env) == "yes")
    assert(Jinja.renderTemplate("{{ 'up' ~ 'down' }}", env) == "updown")
    assert(Jinja.renderTemplate("{#- gone -#}x", env) == "x")
  }
}
