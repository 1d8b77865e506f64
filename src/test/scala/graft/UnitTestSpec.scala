package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.exec.{ModelExecutor, UnitTestRunner}
import graft.project.ProjectLoader

/** dbt `unit_tests:` execution (given/expect mock-input tests):
  * fixtures substitute for refs/sources, the model renders once, and
  * the result compares column-subset against expect — plus the jaffle
  * fixture carrying unit_tests end-to-end through the loader.
  */
class UnitTestSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session

  private def runner(root: String): (UnitTestRunner, ProjectLoader.Project) = {
    val project = ProjectLoader.load(root)
    val executor = new ModelExecutor(spark, project)
    executor.buildAll()
    (new UnitTestRunner(spark, project, executor), project)
  }

  private def writeProject(root: java.nio.file.Path, modelSql: String,
      schemaYml: String, seedCsv: String = "id,val\n1,a\n2,b\n"): Unit = {
    Files.createDirectories(root.resolve("models"))
    Files.createDirectories(root.resolve("seeds"))
    Files.writeString(root.resolve("dbt_project.yml"),
      "name: utdemo\nversion: '1.0'\n")
    Files.writeString(root.resolve("seeds/src_seed.csv"), seedCsv)
    Files.writeString(root.resolve("models/m.sql"), modelSql)
    Files.writeString(root.resolve("models/schema.yml"), schemaYml)
  }

  test("jaffle fixture: unit_tests load and pass end-to-end") {
    val (r, project) = runner("fixtures/jaffle")
    assert(project.unitTests.map(_.name) ==
      Seq("stg_orders_renames", "customers_aggregates_orders"))
    val results = r.runAll()
    assert(results.forall(_.passed),
      results.filterNot(_.passed).mkString("\n"))
    // the fixture substituted for the seed: two mocked rows, not the
    // seed's corpus — proven by the pass itself (expect has 2 rows
    // with ids the seed does not contain)
  }

  test("failing expectation reports missing/unexpected rows and a diff") {
    val root = Files.createTempDirectory("graft_ut_fail")
    writeProject(root,
      "select id, upper(val) as uval from {{ ref('src_seed') }}",
      """unit_tests:
        |  - name: upcases
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        rows:
        |          - {id: 1, val: x}
        |    expect:
        |      rows:
        |        - {id: 1, uval: WRONG}
        |""".stripMargin)
    val (r, _) = runner(root.toString)
    val res = r.runAll()
    assert(res.size == 1 && !res.head.passed)
    assert(res.head.missing == 1 && res.head.unexpected == 1,
      res.head.toString)
    assert(res.head.diff.exists(d => d.contains("WRONG") && d.contains("X")),
      s"diff must show both sides: ${res.head.diff}")
  }

  test("column-subset match; omitted fixture columns become typed NULLs") {
    val root = Files.createTempDirectory("graft_ut_subset")
    writeProject(root,
      "select id, val, id * 10 as tens from {{ ref('src_seed') }}",
      """unit_tests:
        |  - name: subset
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        rows:
        |          - {id: 3}
        |    expect:
        |      rows:
        |        - {tens: 30, val: null}
        |""".stripMargin)
    val (r, _) = runner(root.toString)
    val res = r.runAll()
    assert(res.size == 1 && res.head.passed, res.head.toString)
  }

  test("a fixture naming an unknown input column fails loudly") {
    val root = Files.createTempDirectory("graft_ut_badcol")
    writeProject(root,
      "select id from {{ ref('src_seed') }}",
      """unit_tests:
        |  - name: typo
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        rows:
        |          - {idd: 1}
        |    expect:
        |      rows:
        |        - {id: 1}
        |""".stripMargin)
    val (r, _) = runner(root.toString)
    val res = r.runAll()
    assert(!res.head.passed && res.head.error.exists(_.contains("idd")),
      res.head.toString)
  }

  test("expect rows: [] asserts an empty result; ordered compare is positional") {
    val root = Files.createTempDirectory("graft_ut_empty")
    writeProject(root,
      "select id, val from {{ ref('src_seed') }} where id > 100",
      """unit_tests:
        |  - name: filtered_out
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        rows:
        |          - {id: 1, val: a}
        |    expect:
        |      rows: []
        |""".stripMargin)
    val (r, _) = runner(root.toString)
    assert(r.runAll().head.passed)

    val root2 = Files.createTempDirectory("graft_ut_ordered")
    writeProject(root2,
      "select id, val from {{ ref('src_seed') }} order by id desc",
      """unit_tests:
        |  - name: ordered_desc
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        rows:
        |          - {id: 1, val: a}
        |          - {id: 2, val: b}
        |    expect:
        |      ordered: true
        |      rows:
        |        - {id: 2, val: b}
        |        - {id: 1, val: a}
        |""".stripMargin)
    val (r2, _) = runner(root2.toString)
    assert(r2.runAll().head.passed)
    // the same rows in ascending order must FAIL under ordered
    val root3 = Files.createTempDirectory("graft_ut_ordered_bad")
    writeProject(root3,
      "select id, val from {{ ref('src_seed') }} order by id desc",
      """unit_tests:
        |  - name: ordered_wrong
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        rows:
        |          - {id: 1, val: a}
        |          - {id: 2, val: b}
        |    expect:
        |      ordered: true
        |      rows:
        |        - {id: 1, val: a}
        |        - {id: 2, val: b}
        |""".stripMargin)
    val (r3, _) = runner(root3.toString)
    assert(!r3.runAll().head.passed)
  }

  test("csv empty cells are NULL; dict-format '' stays an empty string") {
    val root = Files.createTempDirectory("graft_ut_csvnull")
    writeProject(root,
      """select id, case when val is null then '<null>'
        |  when val = '' then '<empty>' else val end as tag
        |from {{ ref('src_seed') }}
        |""".stripMargin,
      """unit_tests:
        |  - name: csv_empty_cell_is_null
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        format: csv
        |        rows: |
        |          id,val
        |          1,
        |          2,x
        |    expect:
        |      rows:
        |        - {id: 1, tag: '<null>'}
        |        - {id: 2, tag: x}
        |  - name: dict_empty_string_stays_string
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        rows:
        |          - {id: 3, val: ''}
        |    expect:
        |      rows:
        |        - {id: 3, tag: '<empty>'}
        |""".stripMargin)
    val (r, _) = runner(root.toString)
    val res = r.runAll()
    assert(res.size == 2 && res.forall(_.passed),
      res.filterNot(_.passed).mkString("\n"))
  }

  test("fixture: references and unsupported formats fail loudly at load") {
    // a `fixture:` file reference must not parse to ZERO rows — an
    // empty mock plus `expect: rows: []` would be a silent false PASS
    val root = Files.createTempDirectory("graft_ut_fixture")
    writeProject(root,
      "select id from {{ ref('src_seed') }}",
      """unit_tests:
        |  - name: uses_fixture_file
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        format: csv
        |        fixture: my_fixture
        |    expect:
        |      rows: []
        |""".stripMargin)
    val e = intercept[IllegalArgumentException](
      ProjectLoader.load(root.toString))
    assert(e.getMessage.contains("fixture"), e.getMessage)

    val root2 = Files.createTempDirectory("graft_ut_sqlfmt")
    writeProject(root2,
      "select id from {{ ref('src_seed') }}",
      """unit_tests:
        |  - name: sql_format
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        format: sql
        |        rows: select 1 as id
        |    expect:
        |      rows: []
        |""".stripMargin)
    val e2 = intercept[IllegalArgumentException](
      ProjectLoader.load(root2.toString))
    assert(e2.getMessage.contains("unsupported"), e2.getMessage)
  }

  test("overrides: vars rebind and macros.is_incremental forces the " +
      "incremental branch with a mocked `this`") {
    val root = Files.createTempDirectory("graft_ut_ovr")
    writeProject(root,
      """{{ config(materialized='incremental', unique_key='id') }}
        |select id, val from {{ ref('src_seed') }}
        |where val = '{{ var("want", "a") }}'
        |{% if is_incremental() %}
        |  and id not in (select id from {{ this }})
        |{% endif %}
        |""".stripMargin,
      """unit_tests:
        |  - name: incr_skips_seen
        |    model: m
        |    overrides:
        |      vars: {want: b}
        |      macros: {is_incremental: true}
        |    given:
        |      - input: ref('src_seed')
        |        rows:
        |          - {id: 1, val: b}
        |          - {id: 2, val: b}
        |          - {id: 3, val: a}
        |      - input: this
        |        rows:
        |          - {id: 1, val: b}
        |    expect:
        |      rows:
        |        - {id: 2, val: b}
        |""".stripMargin)
    val (r, _) = runner(root.toString)
    val res = r.runAll()
    assert(res.head.passed, res.head.toString)
  }
}
