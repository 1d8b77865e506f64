package graft.core

import scala.collection.immutable.ListMap

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Introspection.IntrospectedColumn

class AnalysisSpec extends AnyFunSuite {

  def node(cols: (String, String)*): NodeMeta =
    NodeMeta("model.m", "m", "model", columns = ListMap(cols.map { case (n, t) =>
      n -> ColumnMeta(n, dataType = if (t.isEmpty) None else Some(t))
    }: _*))

  def db(cols: (String, String)*): ListMap[String, IntrospectedColumn] =
    ListMap(cols.zipWithIndex.map { case ((n, t), i) => n -> IntrospectedColumn(n, t, i) }: _*)

  test("fuzzy wratio basics: identity, near-identity, rename-shape") {
    assert(Fuzzy.wratio("customer_id", "customer_id") == 100.0)
    assert(Fuzzy.wratio("customer_id", "customer_identifier") >= 85.0)
    assert(Fuzzy.wratio("user_id", "usr_id") >= 85.0)
    assert(Fuzzy.wratio("amount", "order_date") < 60.0)
  }

  test("diff detects added/removed/renamed/type-changed") {
    val n = node("customer_id" -> "BIGINT", "old_name" -> "VARCHAR", "price" -> "DOUBLE")
    val d = db("customer_id" -> "BIGINT", "old_name_2" -> "VARCHAR",
      "price" -> "DECIMAL(10,2)", "brand_new" -> "DATE")
    val result = Diff.compareNode(n, d)
    assert(result.changes.collect { case r: Diff.ColumnRenamed => (r.oldName, r.newName) } ==
      Seq(("old_name", "old_name_2")))
    assert(result.changes.collect { case a: Diff.ColumnAdded => a.column } == Seq("brand_new"))
    assert(result.changes.collect { case t: Diff.TypeChanged => t.severity } == Seq(Diff.Breaking))
  }

  test("type-change severity classification matrix") {
    assert(Diff.classifyTypeChange("INTEGER", "integer") == Diff.Safe)
    assert(Diff.classifyTypeChange("int", "bigint") == Diff.Safe) // widening
    assert(Diff.classifyTypeChange("bigint", "smallint") == Diff.Moderate) // narrowing
    assert(Diff.classifyTypeChange("varchar(100)", "varchar(50)") == Diff.Moderate)
    assert(Diff.classifyTypeChange("varchar(50)", "varchar(100)") == Diff.Safe)
    assert(Diff.classifyTypeChange("DECIMAL(18,3)", "DECIMAL(18,2)") == Diff.Moderate)
    assert(Diff.classifyTypeChange("varchar", "int") == Diff.Breaking)
    assert(Diff.classifyTypeChange("timestamp", "datetime") == Diff.Safe)
  }

  test("migration plan orders rename -> add -> type -> drop with rollback") {
    val n = node("keep" -> "BIGINT", "old" -> "VARCHAR", "shrink" -> "bigint")
    val d = db("keep" -> "BIGINT", "renamed_old" -> "VARCHAR", "shrink" -> "int",
      "added" -> "DATE")
    val diff = Diff.compareNode(n, d, fuzzyThreshold = 60.0)
    val plan = Migration.planFor("tbl", diff)
    val sqls = plan.steps.map(_.sql)
    assert(sqls.head.contains("RENAME COLUMN"))
    assert(sqls.exists(_.contains("ADD COLUMN `added` DATE")))
    assert(sqls.last.contains("CHANGE COLUMN") || sqls.last.contains("DROP COLUMN"))
    assert(plan.rollbackScript.contains("RENAME COLUMN `renamed_old` TO `old`"))
  }

  test("migration DDL dialect matrix: quoting and per-dialect syntax") {
    val n = node("old" -> "VARCHAR", "shrink" -> "bigint")
    val d = db("renamed_old" -> "VARCHAR", "shrink" -> "int", "added" -> "DATE")
    val diff = Diff.compareNode(n, d, fuzzyThreshold = 60.0)
    def plan(dialect: String) = Migration.planFor("tbl", diff, dialect = dialect)

    // duckdb (the oracle engine): double-quoted idents, ALTER ... TYPE
    val duck = plan("duckdb").steps.map(_.sql)
    assert(duck.exists(_ == "ALTER TABLE \"tbl\" RENAME COLUMN \"old\" TO \"renamed_old\""))
    assert(duck.exists(_ == "ALTER TABLE \"tbl\" ADD COLUMN \"added\" DATE"))
    assert(duck.exists(_ == "ALTER TABLE \"tbl\" ALTER COLUMN \"shrink\" TYPE int"))
    // snowflake: double quotes, SET DATA TYPE
    val snow = plan("snowflake").steps.map(_.sql)
    assert(snow.exists(_.contains("ALTER COLUMN \"shrink\" SET DATA TYPE int")))
    // spark: backticks, CHANGE COLUMN
    val spk = plan("spark").steps.map(_.sql)
    assert(spk.exists(_ == "ALTER TABLE `tbl` CHANGE COLUMN `shrink` `shrink` int"))
    // sqlserver: bracket quoting, sp_rename, bare ALTER COLUMN type
    val mssql = plan("mssql").steps.map(_.sql) // alias -> sqlserver
    assert(mssql.exists(_ == "EXEC sp_rename '[tbl].old', 'renamed_old', 'COLUMN'"))
    assert(mssql.exists(_ == "ALTER TABLE [tbl] ALTER COLUMN [shrink] int"))
    // databricks: rename needs manual migration and is marked breaking
    val dbx = plan("databricks")
    val rn = dbx.steps.find(_.changeType == "column_renamed").get
    assert(rn.sql.startsWith("-- RENAME NOT SUPPORTED"))
    assert(rn.severity == Diff.Breaking)
    // postgres aliases: postgresql / redshift collapse onto postgres
    assert(Migration.normalizeDialect("postgresql") == "postgres")
    assert(Migration.normalizeDialect("Redshift") == "postgres")
    val pg = plan("postgres").steps.map(_.sql)
    assert(pg.exists(_ == "ALTER TABLE \"tbl\" ALTER COLUMN \"shrink\" TYPE int"))
    // bigquery: backticks with SET DATA TYPE
    val bq = plan("bigquery").steps.map(_.sql)
    assert(bq.exists(_ == "ALTER TABLE `tbl` ALTER COLUMN `shrink` SET DATA TYPE int"))
  }

  test("migration plan JSON export round-trips and sql script is transactional") {
    val n = node("old" -> "VARCHAR")
    val d = db("renamed_old" -> "VARCHAR", "added" -> "DATE")
    val diff = Diff.compareNode(n, d, fuzzyThreshold = 60.0)
    val plan = Migration.planFor("main.tbl", diff, dialect = "duckdb")
    assert(plan.table == "main.tbl")
    assert(plan.steps.map(_.sql).exists(_.contains("\"main\".\"tbl\"")),
      "dotted table names quote each part")
    val parsed = Migration.fromJson(plan.toJson)
    assert(parsed == plan, s"JSON round-trip drifted:\n$parsed\nvs\n$plan")
    // export formats hit disk
    val dir = java.nio.file.Files.createTempDirectory("graft_mig")
    for (fmt <- Seq("sql", "json", "markdown")) {
      val p = dir.resolve(s"plan.$fmt")
      Migration.exportPlan(plan, p, fmt)
      assert(java.nio.file.Files.size(p) > 0)
    }
    assert(Migration.fromJson(
      java.nio.file.Files.readString(dir.resolve("plan.json"))) == plan)
    val script = plan.sqlScript
    assert(script.startsWith("-- Migration Plan for main.tbl"))
    assert(script.contains("BEGIN;") && script.contains("COMMIT;"))
    assert(script.contains("-- Rollback Script"))
  }

  test("lint flags star, case, aliases, quoting, long lines") {
    val sql =
      """SELECT * FROM orders o
        |select `plain_name`, amount FROM payments WHERE amount > 10 AND payment_method = 'x' OR TRUE AND FALSE OR amount < 99999999
        |""".stripMargin
    val vs = Lint.lint(sql)
    val ids = vs.map(_.ruleId).toSet
    assert(ids.contains("select-star"))
    assert(ids.contains("short-alias"))
    assert(ids.contains("keyword-case")) // lowercase 'select' among UPPER majority
    assert(ids.contains("unneeded-quoted-identifier"))
    assert(ids.contains("line-length"))
  }

  test("lint per-rule enable/disable config, disabled wins, aliases accepted") {
    val sql = "select * from orders o -- lower keywords, star, short alias"
    // enabled filter: only the named rules fire
    val only = Lint.lint(sql, Lint.Config(enabledRules = Some(Seq("select-star"))))
    assert(only.nonEmpty && only.forall(_.ruleId == "select-star"))
    // disabled filter removes a rule
    val no = Lint.lint(sql, Lint.Config(disabledRules = Seq("select-star")))
    assert(!no.exists(_.ruleId == "select-star"))
    assert(no.exists(_.ruleId == "short-alias"), "other rules still fire")
    // disabled wins over enabled (reference
    // test_disabled_rules_win_over_enabled_rules)
    val both = Lint.lint(sql, Lint.Config(
      enabledRules = Some(Seq("select-star")), disabledRules = Seq("select-star")))
    assert(both.isEmpty)
    // reference rule ids alias onto ours
    val aliased = Lint.lint("SELECT `plain` FROM orders o", Lint.Config(
      disabledRules = Seq("table-alias", "quoted-identifier")))
    assert(!aliased.exists(v =>
      v.ruleId == "short-alias" || v.ruleId == "unneeded-quoted-identifier"))
  }

  test("lint fix payloads: keyword-case recase and quoted-identifier unquote apply") {
    val sql = "SELECT `plain_name` FROM t\nwhere x = 1 AND y = 2"
    val vs = Lint.lint(sql)
    val kw = vs.filter(_.ruleId == "keyword-case")
    assert(kw.nonEmpty && kw.forall(v => v.fix.isDefined && v.snippet.isDefined))
    assert(kw.exists(v => v.snippet.contains("where") && v.fix.contains("WHERE")))
    val fixed = Lint.applyFixes(sql, vs)
    assert(fixed.contains("WHERE x = 1 AND y = 2"))
    assert(fixed.contains("SELECT plain_name FROM t"), s"unquote applied: $fixed")
    // fixed SQL is clean for those rules
    val after = Lint.lint(fixed)
    assert(!after.exists(v =>
      v.ruleId == "keyword-case" || v.ruleId == "unneeded-quoted-identifier"))
    // stale violations (wrong snippet at position) are skipped, not misapplied
    val stale = Seq(Lint.Violation("keyword-case", "", "convention", 1, 1,
      fix = Some("WRONG"), snippet = Some("nomatch")))
    assert(Lint.applyFixes(sql, stale) == sql)
  }

  test("lint model/project drivers: not-found, no-sql, compile-first, fqn filter") {
    val compiled = NodeMeta("model.p.good", "good", "model",
      fqn = Seq("p", "marts", "good"),
      rawCode = "select * from {{ ref('x') }}",
      compiledCode = Some("select * from x_tbl"))
    val uncompiled = NodeMeta("model.p.jinja", "jinja", "model",
      fqn = Seq("p", "staging", "jinja"),
      rawCode = "select 1 from {{ ref('y') }}")
    val empty = NodeMeta("model.p.hollow", "hollow", "model")
    val m = Manifest(Seq(compiled, uncompiled, empty))

    assert(Lint.lintModel(m, "nope").exists(_.ruleId == "model-not-found"))
    assert(Lint.lintModel(m, "hollow").exists(_.ruleId == "model-sql-not-found"))
    // compiled SQL is linted (star comes from the compiled text)
    assert(Lint.lintModel(m, "good").exists(_.ruleId == "select-star"))
    // uncompiled jinja is reported, not parsed as SQL
    assert(Lint.lintModel(m, "jinja").exists(_.ruleId == "compile-error"))
    // fqn filter narrows the project sweep (reference fqn selector)
    val all = Lint.lintManifest(m)
    assert(all.keySet == Set("model.p.good", "model.p.jinja"))
    val marts = Lint.lintManifest(m, fqnFilter = Seq("marts"))
    assert(marts.keySet == Set("model.p.good"))
    val byName = Lint.lintManifest(m, fqnFilter = Seq("jinja"))
    assert(byName.keySet == Set("model.p.jinja"))
  }

  test("lint ignores keywords inside string literals and comments") {
    val sql = "SELECT a FROM t WHERE b = 'select * from x' -- select * comment"
    val vs = Lint.lint(sql)
    assert(!vs.exists(_.ruleId == "select-star"))
  }

  test("AST select-star: bare star flagged with context, count(*) and t.* are not") {
    val spark = graft.TestSpark.session
    def stars(sql: String) =
      Lint.lint(sql, spark = Some(spark)).filter(_.ruleId == "select-star")
    // bare star at top level
    assert(stars("SELECT * FROM orders").nonEmpty)
    // count(*) is not a projection star
    assert(stars("SELECT COUNT(*) AS n FROM orders").isEmpty)
    // qualified star not flagged (reference flags only exp.Star)
    assert(stars("SELECT o.* FROM orders o").isEmpty)
    // star inside a CTE is reported with the CTE's name
    val cte = stars("WITH cte_x AS (SELECT * FROM orders) SELECT o_orderkey FROM cte_x")
    assert(cte.exists(_.message.contains("CTE 'cte_x'")))
    assert(!cte.exists(_.message.contains("top level")))
    // star in a scalar subquery is context-tagged too
    val sub = stars(
      "SELECT o_orderkey FROM orders WHERE EXISTS (SELECT * FROM customer)")
    assert(sub.exists(_.message.contains("subquery")))
  }

  test("AST alias rule: relation aliases only, CTE names exempt") {
    val spark = graft.TestSpark.session
    def aliases(sql: String) =
      Lint.lint(sql, spark = Some(spark)).filter(_.ruleId == "short-alias")
    assert(aliases("SELECT o.o_orderkey FROM orders o").nonEmpty)
    assert(aliases("SELECT ord.o_orderkey FROM orders ord").isEmpty)
    // a short CTE NAME is not a table alias
    assert(aliases("WITH t AS (SELECT o_orderkey FROM orders) SELECT o_orderkey FROM t")
      .isEmpty)
  }

  test("literal masking survives '' escapes and double-quoted strings") {
    // the '' escape means the literal runs to the LAST quote — the
    // select * inside must not fire
    assert(!Lint.lint("SELECT a FROM t WHERE b = 'it''s select * from x'")
      .exists(_.ruleId == "select-star"))
    assert(!Lint.lint("SELECT a FROM t WHERE b = \"select * from x\"")
      .exists(_.ruleId == "select-star"))
  }

  test("AI test suggester parses JSON forms and falls back on failure") {
    val node = NodeMeta("model.p.m", "m", "model", rawCode = "SELECT 1",
      columns = ListMap(
        "user_id" -> ColumnMeta("user_id"),
        "status" -> ColumnMeta("status")))
    val existing = Seq(TestSuggestions.ExistingTest("model.p.x", "order_id", "unique"))
    class One(resp: String) extends DocSynthesis.LlmClient {
      def complete(s: String, u: String): String = resp
    }
    val ok = TestSuggestions.suggestWithClient(Manifest(Seq(node)), node, existing,
      new One("""{"user_id": ["unique", {"test_type": "not_null", "reason": "PK"}],
                |"status": ["accepted_values"], "ghost_col": ["unique"]}""".stripMargin))
    assert(ok.map(s => (s.column, s.test)).toSet ==
      Set(("user_id", "unique"), ("user_id", "not_null"), ("status", "accepted_values")))
    assert(ok.find(s => s.test == "not_null").exists(_.reason == "PK"))
    // garbage response → pattern/heuristic fallback, never an exception
    val fb = TestSuggestions.suggestWithClient(Manifest(Seq(node)), node, existing,
      new One("I cannot help with that"))
    assert(fb.nonEmpty &&
      fb.forall(s => s.reason.contains("mined") || s.reason.contains("heuristic")))
  }

  test("parse errors reported via the Spark parser") {
    val spark = graft.TestSpark.session
    val vs = Lint.lint("SELEC broken FROM", spark = Some(spark))
    assert(vs.exists(_.ruleId == "parse-error"))
    assert(Lint.lint("SELECT 1", spark = Some(spark)).forall(_.ruleId != "parse-error"))
  }

  test("discovery coverage and prioritization") {
    val documented = NodeMeta("model.a", "a", "model", description = "Well documented",
      columns = ListMap("x" -> ColumnMeta("x", Some("All good"))))
    val gappy = NodeMeta("model.b", "b", "model", deps = Seq("source.s.t"),
      columns = ListMap(
        "x" -> ColumnMeta("x"),
        "y" -> ColumnMeta("y", Some("Not documented"))))
    val leaf = NodeMeta("model.c", "c", "model", deps = Seq("model.b"))
    val m = Manifest(Seq(documented, gappy, leaf))
    val cov = Discovery.coverage(m)
    assert(cov.documentedColumns == 1 && cov.totalColumns == 3)
    val gaps = Discovery.prioritizedGaps(m)
    assert(gaps.head._1.uniqueId == "model.b") // fan-out + source bonus
    assert(Discovery.undocumentedColumns(m).map(_.column).toSet == Set("x", "y"))
  }

  test("test suggestions: mined frequencies beat heuristics") {
    val m = Manifest(Seq(node("user_id" -> "BIGINT", "status" -> "VARCHAR")))
    val mined = Seq(
      TestSuggestions.ExistingTest("model.other", "account_id", "unique"),
      TestSuggestions.ExistingTest("model.other", "account_id", "unique"),
      TestSuggestions.ExistingTest("model.other2", "order_id", "relationships"))
    val suggestions = TestSuggestions.suggest(m, mined)
    val forUserId = suggestions.filter(_.column == "user_id")
    assert(forUserId.map(_.test).contains("unique"))
    assert(forUserId.find(_.test == "unique").get.confidence > 0.5)
    val forStatus = suggestions.filter(_.column == "status")
    assert(forStatus.exists(_.test.startsWith("accepted_values")))
    assert(forStatus.forall(_.confidence == 0.5)) // heuristic fallback
  }

  test("profileRelation: one-pass per-column stats with hand-computed values") {
    val spark = graft.TestSpark.session
    import spark.implicits._
    Seq((1L, Some("a"), 1.5), (2L, None, -2.0), (3L, Some("b"), 1.5))
      .toDF("id", "tag", "score").createOrReplaceTempView("profile_demo")
    val p = Introspection.profileRelation(spark, "profile_demo")
      .map(c => c.column -> c).toMap
    assert(p.keySet == Set("id", "tag", "score"))
    assert(p("id").nRows == 3 && p("id").nNulls == 0)
    assert(p("id").min.contains("1") && p("id").max.contains("3"))
    assert(p("tag").nNulls == 1)
    assert(p("tag").min.contains("a") && p("tag").max.contains("b"))
    assert(p("score").min.contains("-2.0") && p("score").max.contains("1.5"))
    // HLL is exact at this cardinality
    assert(p("id").approxDistinct == 3 && p("tag").approxDistinct == 2)
    assert(p("score").approxDistinct == 2)
  }

  test("profileRelationDeep: moments, quantiles, top-k, histogram — hand-computed") {
    val spark = graft.TestSpark.session
    import spark.implicits._
    Seq(
      (1L, Some("a"), 0.0, 7.0),
      (2L, Some("a"), -2.0, 7.0),
      (3L, Some("b"), 4.0, 7.0),
      (4L, None, 6.0, 7.0),
      (5L, Some("a"), 10.0, 7.0))
      .toDF("id", "tag", "score", "const")
      .createOrReplaceTempView("profile_deep_demo")
    val p = Introspection.profileRelationDeep(spark, "profile_deep_demo",
      topK = 2, bins = 4, topKMaxDistinct = 3)
      .map(d => d.base.column -> d).toMap
    // numeric moments: mean (0-2+4+6+10)/5 = 3.6; sample variance 22.8
    assert(math.abs(p("score").mean.get - 3.6) < 1e-9)
    assert(math.abs(p("score").stddev.get - math.sqrt(22.8)) < 1e-9)
    assert(p("score").zeros.contains(1L) && p("score").negatives.contains(1L))
    // histogram over [-2, 10] in 4 bins of width 3:
    // [-2,1): {0,-2}  [1,4): {}  [4,7): {4,6}  [7,10]: {10}
    assert(p("score").histogram.map(_.n) == Seq(2L, 0L, 2L, 1L))
    assert(p("score").histogram.head.lo == -2.0)
    assert(p("score").histogram.last.hi == 10.0)
    // id has 5 distinct > topKMaxDistinct=3 — ineligible for top-k by
    // the cardinality gate (the near-unique-column shuffle guard);
    // its histogram still lands: [1,5] in 4 bins → 1,1,1,{4,5}
    assert(p("id").topValues.isEmpty)
    assert(p("id").histogram.map(_.n) == Seq(1L, 1L, 1L, 2L))
    // tag: top-2 by count then value; nulls excluded from the census
    assert(p("tag").topValues ==
      Seq(Introspection.TopValue("a", 3L), Introspection.TopValue("b", 1L)))
    assert(p("tag").lenMin.contains(1L) && p("tag").lenMax.contains(1L))
    assert(p("tag").lenAvg.contains(1.0))
    // constant numeric: degenerate [min,max] → no histogram; its one
    // distinct value IS the top value (rendered via the string cast)
    assert(p("const").histogram.isEmpty)
    assert(p("const").topValues == Seq(Introspection.TopValue("7.0", 5L)))
    // quantile vector is the 5-point p05..p95, monotone, in range
    val q = p("score").quantiles.get
    assert(q.size == 5 && q == q.sorted && q.head >= -2.0 && q.last <= 10.0)
    // stat families stay type-gated
    assert(p("tag").mean.isEmpty && p("score").lenMin.isEmpty)
    assert(p("tag").histogram.isEmpty)
    // base stats match the one-pass profile on the same relation
    assert(p("score").base.nRows == 5 && p("tag").base.nNulls == 1)
  }
}
