package graft.core

import scala.collection.immutable.ListMap

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Introspection.IntrospectedColumn

class TransformsSpec extends AnyFunSuite {

  val settings: EngineSettings = EngineSettings()

  def node(cols: ColumnMeta*): NodeMeta =
    NodeMeta(uniqueId = "model.m", name = "m", resourceType = "model",
      columns = ListMap(cols.map(c => c.name -> c): _*))

  def db(cols: (String, String)*): ListMap[String, IntrospectedColumn] =
    ListMap(cols.zipWithIndex.map { case ((n, t), i) =>
      n -> IntrospectedColumn(n, t, i)
    }: _*)

  test("inject adds DB-only columns with dtype, in DB order after existing") {
    val n = node(ColumnMeta("a"))
    val out = Transforms.injectMissingColumns(n, db("a" -> "BIGINT", "b" -> "VARCHAR"), settings)
    assert(out.columns.keySet == Set("a", "b"))
    assert(out.columns("b").dataType.contains("VARCHAR"))
  }

  test("inject respects output-to-upper for names and types") {
    val n = node(ColumnMeta("a"))
    val out = Transforms.injectMissingColumns(n, db("a" -> "BIGINT", "b" -> "varchar"),
      settings.copy(outputToUpper = true))
    assert(out.columns.contains("B"))
    assert(out.columns("B").dataType.contains("VARCHAR"))
  }

  test("inject case-insensitive compare avoids duplicating A vs a") {
    val n = node(ColumnMeta("A"))
    val out = Transforms.injectMissingColumns(n, db("a" -> "BIGINT"),
      settings.copy(outputToLower = true))
    assert(out.columns.size == 1)
  }

  test("remove drops YAML-only columns but is a no-op on empty introspection") {
    val n = node(ColumnMeta("a"), ColumnMeta("stale"))
    val out = Transforms.removeColumnsNotInDatabase(n, db("a" -> "BIGINT"), settings)
    assert(out.columns.keySet == Set("a"))
    val unchanged = Transforms.removeColumnsNotInDatabase(n, ListMap.empty, settings)
    assert(unchanged.columns.keySet == Set("a", "stale"))
  }

  test("sort by database ordinal, unknown columns last") {
    val n = node(ColumnMeta("c"), ColumnMeta("ghost"), ColumnMeta("a"), ColumnMeta("b"))
    val out = Transforms.sortColumnsAsInDatabase(n,
      db("a" -> "T", "b" -> "T", "c" -> "T"), settings)
    assert(out.columns.keys.toSeq == Seq("a", "b", "c", "ghost"))
  }

  test("sort alphabetically honors final case mode") {
    val n = node(ColumnMeta("b"), ColumnMeta("A"))
    val out = Transforms.sortColumnsAlphabetically(n, settings)
    assert(out.columns.keys.toSeq == Seq("A", "b")) // 'A' < 'b' in ASCII
  }

  test("sync types copies warehouse type and preserves lowercase style") {
    val n = node(
      ColumnMeta("a", dataType = Some("varchar")),
      ColumnMeta("b", dataType = Some("INTEGER")),
      ColumnMeta("c"))
    val out = Transforms.synchronizeDataTypes(n,
      db("a" -> "STRING", "b" -> "BIGINT", "c" -> "DOUBLE"), settings)
    assert(out.columns("a").dataType.contains("string")) // lowercase style kept
    assert(out.columns("b").dataType.contains("BIGINT"))
    assert(out.columns("c").dataType.contains("DOUBLE"))
  }

  test("per-column skip-add-data-types via column meta") {
    val n = node(ColumnMeta("a", dataType = Some("OLD"),
      meta = ListMap("skip-add-data-types" -> true)))
    val out = Transforms.synchronizeDataTypes(n, db("a" -> "NEW"), settings)
    assert(out.columns("a").dataType.contains("OLD"))
  }

  test("pipeline runs steps in topological order and counts mutations") {
    val a = NodeMeta("model.a", "a", "model")
    val b = NodeMeta("model.b", "b", "model", deps = Seq("model.a"))
    val m = Manifest(Seq(a, b))
    val p = Transforms.Pipeline()
      .andThen("tag", (_, n) => n.copy(tags = n.tags :+ "seen"))
      .andThen("noop", (_, n) => n)
    val result = p.run(m)
    assert(result.steps.map(_.mutated) == Seq(2, 0))
    assert(result.manifest.nodes.values.forall(_.tags.contains("seen")))
  }

  test("settings resolver precedence: column meta over node meta over vars") {
    val n = NodeMeta("model.m", "m", "model",
      meta = Map("sort-by" -> "alphabetical"),
      columns = ListMap("c" -> ColumnMeta("c", meta = ListMap("sort_by" -> "database"))))
    val s = settings.copy(vars = Map("sort-by" -> "vars-level"))
    assert(SettingsResolver.resolveString("sort-by", None, s, Some(n), Some("c"))
      .contains("database")) // column meta wins, snake_case accepted
    assert(SettingsResolver.resolveString("sort-by", None, s, Some(n), None)
      .contains("alphabetical")) // node meta next
    assert(SettingsResolver.resolveString("sort-by", None, s, None, None)
      .contains("vars-level")) // project vars last
  }

  test("normalize_column_name adapter semantics") {
    assert(Introspection.normalizeColumnName("`col`", "spark") == "col")
    assert(Introspection.normalizeColumnName("\"Quoted\"", "snowflake") == "\"Quoted\"")
    assert(Introspection.normalizeColumnName("plain", "snowflake") == "PLAIN")
    assert(Introspection.normalizeColumnName("[sqlserver]", "sqlserver") == "sqlserver")
  }
}
