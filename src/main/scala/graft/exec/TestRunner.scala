package graft.exec

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Manifest, NodeMeta}

/** Generic data-test execution over built relations: the dbt test
  * quartet (`unique`, `not_null`, `accepted_values`, `relationships`)
  * plus `unique_combination_of_columns`, evaluated as Spark
  * aggregations. A test FAILS when its violation query returns rows —
  * dbt semantics — and the runner reports the violation count per
  * test.
  *
  * Complements A40/A44: suggestions mine which tests to declare,
  * validation checks their YAML shape, this runs them. Each test is
  * one aggregation over the relation — at 100 TB these are the same
  * scan-heavy-but-shuffle-light plans as q07-style distinct counts
  * (unique = groupBy(key) HAVING count>1, relationships = left-anti
  * join against the parent, both AQE-friendly).
  */
final class TestRunner(spark: SparkSession) {

  final case class TestResult(
      nodeName: String, column: Option[String], test: String,
      passed: Boolean, violations: Long, error: Option[String] = None)

  private def rel(name: String): DataFrame = spark.table(name)

  /** Violation rows for one generic test. */
  private def violationsFor(nodeName: String, column: Option[String],
      testName: String, args: Map[String, Any]): DataFrame = testName match {
    case "not_null" =>
      rel(nodeName).filter(col(column.get).isNull)
    case "unique" =>
      rel(nodeName).filter(col(column.get).isNotNull)
        .groupBy(column.get).count().filter(col("count") > 1)
    case "accepted_values" =>
      val values = args.get("values") match {
        case Some(s: Seq[_]) => s.map(_.toString)
        case _ => throw new IllegalArgumentException("accepted_values needs values")
      }
      rel(nodeName).filter(col(column.get).isNotNull &&
        !col(column.get).cast("string").isin(values: _*))
    case "relationships" =>
      val to = args.get("to").map(_.toString)
        .getOrElse(throw new IllegalArgumentException("relationships needs to"))
      val field = args.get("field").map(_.toString)
        .getOrElse(throw new IllegalArgumentException("relationships needs field"))
      // accept ref('x') / source('s','t') / bare relation names
      val parent = "'([^']+)'\\)?$".r.findFirstMatchIn(to.trim.stripSuffix(")"))
        .map(_.group(1)).getOrElse(to)
      rel(nodeName).filter(col(column.get).isNotNull)
        .select(col(column.get).as("__child_key"))
        .join(rel(parent).select(col(field).as("__child_key")).distinct(),
          Seq("__child_key"), "left_anti")
    case "unique_combination_of_columns" =>
      val cols = args.get("combination_of_columns") match {
        case Some(s: Seq[_]) => s.map(_.toString)
        case _ => throw new IllegalArgumentException(
          "unique_combination_of_columns needs combination_of_columns")
      }
      rel(nodeName).groupBy(cols.map(col): _*).count().filter(col("count") > 1)
    case other =>
      throw new IllegalArgumentException(s"unknown generic test: $other")
  }

  /** Run one declared test; never throws — configuration/analysis
    * errors surface as failed results with the message.
    */
  def runTest(nodeName: String, column: Option[String], testName: String,
      args: Map[String, Any] = Map.empty): TestResult =
    try {
      val n = violationsFor(nodeName, column, testName, args).count()
      TestResult(nodeName, column, testName, passed = n == 0, violations = n)
    } catch {
      case e: Exception =>
        TestResult(nodeName, column, testName, passed = false, violations = -1,
          error = Some(e.getMessage))
    }

  /** Nested `arguments` unwrapping (dbt >= 1.9 test config shape). */
  private def argsOf(config: Any): Map[String, Any] = config match {
    case m: Map[_, _] =>
      val mm = m.asInstanceOf[Map[String, Any]]
      mm.get("arguments") match {
        case Some(a: Map[_, _]) => a.asInstanceOf[Map[String, Any]]
        case _ => mm
      }
    case _ => Map.empty
  }

  /** Collect and run every test declared on a node's columns — the
    * standard YAML `tests:`/`data_tests:` keys (carried on
    * [[graft.core.ColumnMeta.tests]] by the project loader), plus the
    * same keys inside column `meta` for programmatic callers.
    */
  def runNodeTests(node: NodeMeta): Seq[TestResult] = {
    val declared = for {
      c <- node.columns.values.toSeq
      tests = c.tests ++ (c.meta.get("tests").orElse(c.meta.get("data_tests")) match {
        case Some(s: Seq[_]) => s
        case _ => Nil
      })
      t <- tests
    } yield t match {
      case name: String => runTest(node.name, Some(c.name), name)
      case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[String, Any]]
        mm.headOption match {
          case Some((name, config)) =>
            runTest(node.name, Some(c.name), name, argsOf(config))
          case None => // `tests: [{}]` — report, never throw
            TestResult(node.name, Some(c.name), "<empty>", passed = false,
              violations = -1, error = Some("malformed test entry: empty map"))
        }
      case other =>
        TestResult(node.name, Some(c.name), other.toString, passed = false,
          violations = -1, error = Some(s"malformed test entry: $other"))
    }
    declared
  }

  def runAll(manifest: Manifest): Seq[TestResult] =
    manifest.models.toSeq.sortBy(_.uniqueId).flatMap(runNodeTests) ++
      runSingularTests(manifest)

  /** dbt singular tests (.sql files under tests/): arbitrary compiled SELECTs
    * whose rows ARE the failures. Same never-throws contract as the
    * generic runner — a broken test reports as an errored FAIL, it
    * does not crash the run.
    */
  def runSingularTests(manifest: Manifest): Seq[TestResult] =
    manifest.nodes.values.filter(_.resourceType == "test")
      .toSeq.sortBy(_.uniqueId).map { n =>
        n.compiledCode match {
          case Some(sql) =>
            try {
              val v = spark.sql(sql).count()
              TestResult(n.name, None, "singular", passed = v == 0, violations = v)
            } catch {
              case e: Exception =>
                TestResult(n.name, None, "singular", passed = false,
                  violations = 0, error = Some(e.getMessage))
            }
          case None =>
            TestResult(n.name, None, "singular", passed = false,
              violations = 0, error = Some("test not compiled"))
        }
      }
}
