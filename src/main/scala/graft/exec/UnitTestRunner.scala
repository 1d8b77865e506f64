package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructField, StructType}

import graft.compile.DbtCompiler
import graft.core.{UnitTestInput, UnitTestMeta}
import graft.project.ProjectLoader.Project

/** dbt `unit_tests:` execution (given/expect mock-input tests — the
  * one user-shipped dbt artifact the build plane previously parsed
  * but ignored; reference core/schema/parser.py:19 manages the YAML
  * key, dbt-core owns the runtime semantics this implements):
  *
  *  1. every `given` fixture materializes as a temp view whose schema
  *     is CAST against the real input relation's schema (dbt's
  *     type-derivation rule: fixture literals only need to parse;
  *     the input decides the types; columns the fixture omits become
  *     typed NULLs);
  *  2. the model's raw SQL re-compiles with those refs/sources
  *     REDIRECTED to the mock views (same Jinja render, swapped
  *     inputs; `overrides.vars` merge over project vars,
  *     `overrides.env_vars` layer over the process env for env_var(),
  *     `overrides.macros.is_incremental` forces incremental mode,
  *     any OTHER `overrides.macros` name stubs that macro — builtin
  *     or project-defined — to the given constant for every call,
  *     `input: this` mocks the model's own pre-existing relation;
  *     `format: sql` fixtures run as queries whose results ARE the
  *     mock/expected relations);
  *  3. the rendered result compares against `expect` on EXACTLY the
  *     columns the expect rows name (column-subset match), as
  *     multisets unless `expect.ordered` asks for positional order.
  *
  * Divergence from dbt-core, documented: an input the test does not
  * mock reads the real built relation (dbt errors); this is strictly
  * more useful for wide models and collapses to dbt behavior when
  * every input is given.
  *
  * Scale shape: fixtures are hand-written rows (driver-side by
  * nature); the rendered model runs the same distributed plan the
  * build plane would, only over broadcast-sized inputs. The multiset
  * compare is two `exceptAll` counts — no collect of the result
  * beyond the bounded diff sample.
  */
final class UnitTestRunner(spark: SparkSession, project: Project,
    executor: ModelExecutor) {

  final case class UnitTestResult(
      name: String, model: String, passed: Boolean,
      missing: Long, unexpected: Long,
      error: Option[String] = None, diff: Option[String] = None)

  /** `ref('x')` / `ref('x', v=2)` / `source('s','t')` / `this` →
    * the relation (temp view) name the compiled model would read.
    */
  private def resolveInput(input: String, modelName: String): String = {
    val t = input.trim
    val quoted = "'([^']+)'".r.findAllMatchIn(t).map(_.group(1)).toSeq
    if (t == "this") modelName
    else if (t.startsWith("ref")) {
      val version = "(?:v|version)\\s*=\\s*([\\w.]+)".r
        .findFirstMatchIn(t).map(_.group(1))
        .orElse(quoted.lift(1))
      DbtCompiler.resolveRef(executor.manifest, quoted.head, version)
        .map(_.name).getOrElse(throw new IllegalArgumentException(
          s"unit-test input not found: $t"))
    } else if (t.startsWith("source")) {
      executor.manifest.nodes.values.find(n => n.resourceType == "source" &&
          n.uniqueId.endsWith(s".${quoted(0)}.${quoted(1)}"))
        .map(_.name).getOrElse(quoted(1))
    } else throw new IllegalArgumentException(
      s"unit-test input must be ref(...), source(...), or this: $t")
  }

  /** One scalar fixture literal as SQL text (pre-cast). Empty
    * strings stay empty-string literals: dbt's empty-cell→NULL rule
    * applies only to csv-format fixtures, and the loader already
    * nulls those cells at parse time (ProjectLoader.utRows) — a
    * dict-format `{val: ''}` must reach the model as `''`, or a
    * model distinguishing `''` from NULL could never be unit-tested.
    */
  private def sqlLit(v: Any): String = v match {
    case null => "NULL"
    case b: Boolean => b.toString
    case n @ (_: Int | _: Long | _: Double | _: Float |
              _: java.math.BigDecimal | _: BigDecimal) => n.toString
    case s => "'" + s.toString.replace("'", "''") + "'"
  }

  /** Materialize one fixture as a temp view typed against the real
    * input's schema (missing columns → typed NULLs; a fixture column
    * the input doesn't have fails loudly — a typo'd fixture must not
    * silently vanish from the comparison).
    */
  private def mockView(in: UnitTestInput, base: String,
      view: String): Unit = {
    val schema = spark.table(base).schema
    val known = schema.map(f => f.name).toSet
    val bad = in.rows.flatMap(_.keys).distinct.filterNot(known)
    require(bad.isEmpty,
      s"unit-test fixture for $base names unknown column(s): " +
        bad.mkString(", "))
    val selects =
      if (in.rows.isEmpty)
        Seq(schema.map(f =>
          s"CAST(NULL AS ${f.dataType.sql}) AS `${f.name}`")
          .mkString("SELECT ", ", ", " WHERE false"))
      else in.rows.map { r =>
        schema.map { f =>
          val v = r.get(f.name).map(sqlLit).getOrElse("NULL")
          s"CAST($v AS ${f.dataType.sql}) AS `${f.name}`"
        }.mkString("SELECT ", ", ", "")
      }
    spark.sql(selects.mkString("\nUNION ALL\n")).createOrReplaceTempView(view)
  }

  /** Expect rows as a DataFrame typed against the ACTUAL result's
    * column types, restricted to the columns the expect rows name.
    */
  private def expectDf(rows: Seq[Map[String, Any]],
      actual: DataFrame): (DataFrame, Seq[String]) = {
    val cols = rows.flatMap(_.keys).distinct
    val missing = cols.filterNot(actual.columns.contains)
    require(missing.isEmpty,
      s"expect names column(s) the model does not emit: " +
        missing.mkString(", "))
    val types: Map[String, DataType] =
      actual.schema.map(f => f.name -> f.dataType).toMap
    val sql = rows.map { r =>
      cols.map { c =>
        s"CAST(${r.get(c).map(sqlLit).getOrElse("NULL")} AS " +
          s"${types(c).sql}) AS `$c`"
      }.mkString("SELECT ", ", ", "")
    }.mkString("\nUNION ALL\n")
    (spark.sql(sql), cols)
  }

  def run(ut: UnitTestMeta): UnitTestResult =
    try {
      val node = executor.manifest.models.find(_.name == ut.model)
        .getOrElse(throw new IllegalArgumentException(
          s"unit test '${ut.name}': model not found: ${ut.model}"))
      val overrideVars = ut.overrides.get("vars") match {
        case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
        case _ => Map.empty[String, Any]
      }
      val macroOv = ut.overrides.get("macros") match {
        case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
        case _ => Map.empty[String, Any]
      }
      // `overrides.env_vars` — the third member of dbt's overrides
      // matrix: layered over the process environment for env_var()
      val envOv = ut.overrides.get("env_vars") match {
        case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
          .map { case (k, v) => k -> v.toString }
        case _ => Map.empty[String, String]
      }
      val utEnv: Map[String, String] = sys.env ++ envOv
      val forceIncremental = macroOv.get("is_incremental")
        .exists(b => b == true || b.toString == "true")
      // every other name stubs that macro to a constant (dbt's
      // generic unit-test macro override; is_incremental stays a
      // context flag because it also selects the `this` relation)
      val macroStubs = macroOv - "is_incremental"
      val safe = ut.name.replaceAll("[^A-Za-z0-9_]", "_")
      val prologued = (sql: String) =>
        project.macroPrologue + (if (project.macroPrologue.isEmpty) ""
                                 else "\n") + sql
      // a sql-format fixture is itself a (Jinja-rendered) query whose
      // result IS the mock — run it and pin the view on the result
      // (dbt: the query defines columns and types, no cast against
      // the real input)
      val sqlFixtureDf = (fixtureSql: String) => spark.sql(
        DbtCompiler.compile(prologued(fixtureSql), executor.manifest,
          project.vars ++ overrideVars, envVars = utEnv,
          macroOverrides = macroStubs).sql)
      var thisMock: Option[String] = None
      val overrides = ut.given.zipWithIndex.map { case (g, i) =>
        val base = resolveInput(g.input, node.name)
        val view = s"__ut_${safe}_$i"
        g.sql match {
          case Some(fixtureSql) =>
            sqlFixtureDf(fixtureSql).createOrReplaceTempView(view)
          case None => mockView(g, base, view)
        }
        if (g.input.trim == "this") thisMock = Some(view)
        base -> view
      }.toMap
      val compiled = DbtCompiler.compile(prologued(node.rawCode),
        executor.manifest, project.vars ++ overrideVars, envVars = utEnv,
        incremental = forceIncremental || thisMock.isDefined,
        thisRelation = thisMock.orElse(Some(node.name)),
        relationOverrides = overrides,
        macroOverrides = macroStubs)
      val actual = spark.sql(compiled.sql)
      // `expect` in sql format: the query's result is the expected
      // multiset, compared on exactly the columns IT emits (cast to
      // the actual result's types, the same discipline expectDf
      // applies to literal rows)
      val sqlExpect: Option[(DataFrame, Seq[String])] = ut.expectSql.map {
        es =>
          val df = sqlFixtureDf(es)
          val cols = df.columns.toSeq
          val missing = cols.filterNot(actual.columns.contains)
          require(missing.isEmpty,
            s"expect names column(s) the model does not emit: " +
              missing.mkString(", "))
          val types: Map[String, DataType] =
            actual.schema.map(f => f.name -> f.dataType).toMap
          (df.select(cols.map(c => df(c).cast(types(c)).as(c)): _*), cols)
      }
      if (sqlExpect.isEmpty && ut.expect.isEmpty) {
        // `expect: rows: []` — the model must emit nothing
        val n = actual.count()
        return UnitTestResult(ut.name, ut.model, passed = n == 0,
          missing = 0, unexpected = n,
          diff = if (n == 0) None
                 else Some(s"expected empty, got ${n} row(s)"))
      }
      val (expected, cols) = sqlExpect.getOrElse(expectDf(ut.expect, actual))
      val got = actual.select(cols.map(col): _*)
      if (ut.expectOrdered) {
        val a = got.collect().toSeq
        val e = expected.collect().toSeq
        val ok = a == e
        UnitTestResult(ut.name, ut.model, passed = ok,
          missing = if (ok) 0 else e.size, unexpected = if (ok) 0 else a.size,
          diff = if (ok) None else Some(
            s"expected(ordered)=${e.take(5).mkString("; ")} " +
              s"got=${a.take(5).mkString("; ")}"))
      } else {
        val missingRows = expected.exceptAll(got)
        val unexpectedRows = got.exceptAll(expected)
        val nMiss = missingRows.count()
        val nUnex = unexpectedRows.count()
        val diff =
          if (nMiss == 0 && nUnex == 0) None
          else Some(
            s"missing=${missingRows.take(5).toSeq.mkString("; ")} " +
              s"unexpected=${unexpectedRows.take(5).toSeq.mkString("; ")}")
        UnitTestResult(ut.name, ut.model,
          passed = nMiss == 0 && nUnex == 0, missing = nMiss,
          unexpected = nUnex, diff = diff)
      }
    } catch {
      case e: Exception =>
        UnitTestResult(ut.name, ut.model, passed = false,
          missing = -1, unexpected = -1, error = Some(e.getMessage))
    }

  /** Run every declared unit test (never throws — dbt test-run
    * semantics: broken tests report as errored failures).
    */
  def runAll(): Seq[UnitTestResult] = project.unitTests.map(run)
}
