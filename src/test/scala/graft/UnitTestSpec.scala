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

  test("missing fixture files and unknown formats fail loudly at load") {
    // a broken fixture reference must not parse to ZERO rows — an
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
        |        fixture: no_such_fixture
        |    expect:
        |      rows: []
        |""".stripMargin)
    val e = intercept[IllegalArgumentException](
      ProjectLoader.load(root.toString))
    assert(e.getMessage.contains("no_such_fixture"), e.getMessage)

    val root2 = Files.createTempDirectory("graft_ut_badfmt")
    writeProject(root2,
      "select id from {{ ref('src_seed') }}",
      """unit_tests:
        |  - name: xml_format
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        format: xml
        |        rows: <id>1</id>
        |    expect:
        |      rows: []
        |""".stripMargin)
    val e2 = intercept[IllegalArgumentException](
      ProjectLoader.load(root2.toString))
    assert(e2.getMessage.contains("unsupported"), e2.getMessage)

    // dict has no file form in dbt — a dict `fixture:` is a mistake
    val root3 = Files.createTempDirectory("graft_ut_dictfx")
    writeProject(root3,
      "select id from {{ ref('src_seed') }}",
      """unit_tests:
        |  - name: dict_fixture
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        fixture: my_rows
        |    expect:
        |      rows: []
        |""".stripMargin)
    val e3 = intercept[IllegalArgumentException](
      ProjectLoader.load(root3.toString))
    assert(e3.getMessage.contains("csv/sql"), e3.getMessage)
  }

  test("format sql: given runs as a query; expect compares the query's " +
      "result on its own columns") {
    val root = Files.createTempDirectory("graft_ut_sqlfx")
    writeProject(root,
      "select id, upper(val) as uval from {{ ref('src_seed') }}",
      """unit_tests:
        |  - name: sql_given_and_expect
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        format: sql
        |        rows: select 7 as id, 'x' as val union all select 8, 'y'
        |    expect:
        |      format: sql
        |      rows: select 7 as id, 'X' as uval union all select 8, 'Y'
        |  - name: sql_expect_catches_mismatch
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        format: sql
        |        rows: select 7 as id, 'x' as val
        |    expect:
        |      format: sql
        |      rows: select 7 as id, 'WRONG' as uval
        |""".stripMargin)
    val (r, _) = runner(root.toString)
    val res = r.runAll()
    assert(res(0).passed, res(0).toString)
    assert(!res(1).passed && res(1).missing == 1 && res(1).unexpected == 1,
      res(1).toString)
  }

  test("fixture: files load from tests/fixtures (csv and sql)") {
    val root = Files.createTempDirectory("graft_ut_fxfiles")
    writeProject(root,
      "select id, upper(val) as uval from {{ ref('src_seed') }}",
      """unit_tests:
        |  - name: file_fixtures
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        format: csv
        |        fixture: seed_rows
        |    expect:
        |      format: sql
        |      fixture: expected_rows
        |""".stripMargin)
    val fxDir = root.resolve("tests/fixtures")
    Files.createDirectories(fxDir)
    Files.writeString(fxDir.resolve("seed_rows.csv"),
      "id,val\n5,p\n6,\n")
    // the csv empty cell is NULL -> upper(NULL) is NULL
    Files.writeString(fxDir.resolve("expected_rows.sql"),
      "select 5 as id, 'P' as uval union all " +
        "select 6, cast(null as string)")
    val (r, _) = runner(root.toString)
    val res = r.runAll()
    assert(res.size == 1 && res.head.passed, res.head.toString)
  }

  test("overrides.macros stubs project-defined macros and builtins; " +
      "overrides.env_vars layer over the process env") {
    val root = Files.createTempDirectory("graft_ut_macro_ovr")
    writeProject(root,
      """select id, {{ fee() }} as fee,
        |  '{{ env_var("GRAFT_UT_NOT_SET", "dflt") }}' as envv
        |from {{ ref('src_seed') }} where id = 1
        |""".stripMargin,
      """unit_tests:
        |  - name: stubbed
        |    model: m
        |    overrides:
        |      macros:
        |        fee: 42
        |      env_vars:
        |        GRAFT_UT_NOT_SET: injected
        |    given:
        |      - input: ref('src_seed')
        |        rows:
        |          - {id: 1, val: a}
        |    expect:
        |      rows:
        |        - {id: 1, fee: 42, envv: injected}
        |  - name: unstubbed
        |    model: m
        |    given:
        |      - input: ref('src_seed')
        |        rows:
        |          - {id: 1, val: a}
        |    expect:
        |      rows:
        |        - {id: 1, fee: 7, envv: dflt}
        |""".stripMargin)
    Files.createDirectories(root.resolve("macros"))
    // the project DEFINES fee() — the override must still win (pinned
    // names beat template-defined macros in the unit-test env)
    Files.writeString(root.resolve("macros/fee.sql"),
      "{% macro fee() %}7{% endmacro %}")
    val (r, _) = runner(root.toString)
    val res = r.runAll()
    assert(res.forall(_.passed), res.filterNot(_.passed).mkString("\n"))
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
