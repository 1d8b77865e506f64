package graft

import scala.collection.immutable.ListMap

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{ColumnMeta, Manifest, NodeMeta}
import graft.exec.TestRunner

/** Generic data-test execution against real relations (sf0.001). */
class TestRunnerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  lazy val runner: TestRunner = {
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    new TestRunner(spark)
  }

  test("unique and not_null pass on a key, fail on a non-key") {
    assert(runner.runTest("nation", Some("n_nationkey"), "unique").passed)
    assert(runner.runTest("nation", Some("n_nationkey"), "not_null").passed)
    val dup = runner.runTest("orders", Some("o_custkey"), "unique")
    assert(!dup.passed && dup.violations > 0, "customers place many orders")
  }

  test("accepted_values distinguishes closed and open domains") {
    val ok = runner.runTest("orders", Some("o_orderstatus"), "accepted_values",
      Map("values" -> Seq("F", "O", "P")))
    assert(ok.passed)
    val bad = runner.runTest("orders", Some("o_orderstatus"), "accepted_values",
      Map("values" -> Seq("F")))
    assert(!bad.passed && bad.violations > 0)
    // nested dbt >= 1.9 arguments shape accepted via runNodeTests
  }

  test("relationships: FK integrity holds against parent, fails against subset") {
    val ok = runner.runTest("orders", Some("o_custkey"), "relationships",
      Map("to" -> "ref('customer')", "field" -> "c_custkey"))
    assert(ok.passed, s"every order has a customer: $ok")
    spark.table("customer").filter("c_custkey <= 10")
      .createOrReplaceTempView("customer_subset")
    val broken = runner.runTest("orders", Some("o_custkey"), "relationships",
      Map("to" -> "customer_subset", "field" -> "c_custkey"))
    assert(!broken.passed && broken.violations > 0)
  }

  test("unique_combination_of_columns and error surfacing") {
    val ok = runner.runTest("orders", None, "unique_combination_of_columns",
      Map("combination_of_columns" -> Seq("o_orderkey", "o_custkey")))
    assert(ok.passed)
    // the synthetic fixture reuses line numbers within an order —
    // a real violation the test must surface
    val dup = runner.runTest("lineitem", None, "unique_combination_of_columns",
      Map("combination_of_columns" -> Seq("l_orderkey", "l_linenumber")))
    assert(!dup.passed && dup.violations > 0)
    val err = runner.runTest("lineitem", Some("nope"), "not_null")
    assert(!err.passed && err.error.isDefined)
  }

  test("malformed empty-map test entry reports a failure, never throws") {
    val node = NodeMeta("model.nation", "nation", "model",
      columns = ListMap("n_nationkey" ->
        ColumnMeta("n_nationkey", tests = Seq(Map.empty[String, Any]))))
    val rs = runner.runNodeTests(node) // `tests: [{}]` in YAML
    assert(rs.size == 1)
    assert(!rs.head.passed)
    assert(rs.head.error.exists(_.contains("malformed")),
      s"expected a malformed-entry error, got: ${rs.head}")
  }

  test("standard YAML tests: keys survive the project loader and execute") {
    val root = java.nio.file.Files.createTempDirectory("graft_tests")
    java.nio.file.Files.createDirectories(root.resolve("models"))
    java.nio.file.Files.createDirectories(root.resolve("seeds"))
    java.nio.file.Files.writeString(root.resolve("dbt_project.yml"), "name: tdemo\n")
    java.nio.file.Files.writeString(root.resolve("seeds/people_seed.csv"),
      "id,status\n1,active\n2,active\n2,retired\n")
    java.nio.file.Files.writeString(root.resolve("models/people.sql"),
      "select id, status from {{ ref('people_seed') }}\n")
    java.nio.file.Files.writeString(root.resolve("models/people.yml"),
      """version: 2
        |models:
        |  - name: people
        |    columns:
        |      - name: id
        |        tests: [unique, not_null]
        |      - name: status
        |        data_tests:
        |          - accepted_values:
        |              values: [active, retired]
        |""".stripMargin)
    val project = graft.project.ProjectLoader.load(root.toString)
    val ex = new graft.exec.ModelExecutor(spark, project)
    ex.buildAll()
    val results = new TestRunner(spark).runAll(ex.manifest)
    assert(results.size == 3, s"expected 3 declared tests, got $results")
    val byTest = results.map(r => r.test -> r.passed).toMap
    assert(!byTest("unique"), "id 2 is duplicated — unique must fail")
    assert(byTest("not_null") && byTest("accepted_values"))
  }

  test("singular tests: compiled SELECTs whose rows are failures") {
    val root = java.nio.file.Files.createTempDirectory("graft_singular")
    java.nio.file.Files.createDirectories(root.resolve("models"))
    java.nio.file.Files.createDirectories(root.resolve("seeds"))
    java.nio.file.Files.createDirectories(root.resolve("tests"))
    java.nio.file.Files.writeString(root.resolve("dbt_project.yml"), "name: sdemo\n")
    java.nio.file.Files.writeString(root.resolve("seeds/acct_seed.csv"),
      "id,balance\n1,10\n2,-5\n3,0\n")
    java.nio.file.Files.writeString(root.resolve("models/accounts.sql"),
      "select id, balance from {{ ref('acct_seed') }}\n")
    // fails: one negative balance exists
    java.nio.file.Files.writeString(root.resolve("tests/no_negative_balance.sql"),
      "select * from {{ ref('accounts') }} where balance < 0\n")
    // passes: ids are unique per construction
    java.nio.file.Files.writeString(root.resolve("tests/no_huge_balance.sql"),
      "select * from {{ ref('accounts') }} where balance > {{ var('cap', 1000) }}\n")
    val project = graft.project.ProjectLoader.load(root.toString)
    val ex = new graft.exec.ModelExecutor(spark, project)
    ex.buildAll()
    val results = new TestRunner(spark).runSingularTests(ex.manifest)
    assert(results.size == 2, results.toString)
    val byName = results.map(r => r.nodeName -> r).toMap
    assert(!byName("no_negative_balance").passed)
    assert(byName("no_negative_balance").violations == 1)
    assert(byName("no_huge_balance").passed)
    // runAll includes them alongside the declared generic tests
    assert(new TestRunner(spark).runAll(ex.manifest).size == 2)
  }

  test("runNodeTests collects declared tests from column meta") {
    val node = NodeMeta("model.p.nation", "nation", "model",
      columns = ListMap(
        "n_nationkey" -> ColumnMeta("n_nationkey",
          meta = ListMap("tests" -> Seq("unique", "not_null"))),
        "n_regionkey" -> ColumnMeta("n_regionkey",
          meta = ListMap("data_tests" -> Seq(Map("relationships" ->
            Map("arguments" -> Map("to" -> "ref('region')", "field" -> "r_regionkey"))))))))
    val results = runner.runNodeTests(node)
    assert(results.size == 3)
    assert(results.forall(_.passed), results.filterNot(_.passed).toString)
    val all = runner.runAll(Manifest(Seq(node)))
    assert(all.size == 3)
  }
}
