package graft.core

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import scala.collection.immutable.ListMap

/** Property tests for the pure functions the reference only
  * example-tests (SURVEY §5): normalization, version equivalence,
  * type-change classification, tag union, topological sort, fuzzy
  * ratios.
  */
class PropertySpec extends AnyFunSuite {

  /** Sample-based property check over plain ScalaCheck generators
    * (scalatestplus bridge is not on the offline classpath).
    */
  def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (1 to n).foreach(_ => gen.sample.foreach(f))
  def forAll[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    (1 to 100).foreach(_ => for (a <- ga.sample; b <- gb.sample) f(a, b))

  val ident: Gen[String] = for {
    head <- Gen.alphaLowerChar
    tail <- Gen.listOfN(7, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
  } yield (head :: tail).mkString

  test("normalize_column_name is idempotent for spark mode") {
    forAll(ident) { s =>
      val once = Introspection.normalizeColumnName(s, "spark")
      assert(Introspection.normalizeColumnName(once, "spark") == once)
    }
  }

  test("snowflake mode uppercases unquoted, preserves quoted") {
    forAll(ident) { s =>
      assert(Introspection.normalizeColumnName(s, "snowflake") == s.toUpperCase)
      val quoted = "\"" + s + "\""
      assert(Introspection.normalizeColumnName(quoted, "snowflake") == quoted)
    }
  }

  test("version equivalence: int, string, and decimal forms agree") {
    forAll(Gen.choose(1L, 9999L)) { v =>
      import graft.compile.DbtCompiler.normalizeVersion
      assert(normalizeVersion(v) == normalizeVersion(v.toString))
      assert(normalizeVersion(v) == normalizeVersion(v.toDouble))
      assert(normalizeVersion(s"$v.0") == normalizeVersion(v))
    }
  }

  test("type-change classification: reflexive safe, widening-narrowing asymmetry") {
    val types = Seq("int", "bigint", "smallint", "varchar(50)", "varchar(100)",
      "double", "decimal(18,2)", "decimal(18,3)", "date", "timestamp", "boolean")
    for (t <- types) assert(Diff.classifyTypeChange(t, t) == Diff.Safe)
    for {
      a <- types; b <- types if a != b
      fwd = Diff.classifyTypeChange(a, b)
      bwd = Diff.classifyTypeChange(b, a)
    } {
      // breaking is symmetric (cross-family both ways)
      if (fwd == Diff.Breaking) assert(bwd == Diff.Breaking, s"$a<->$b")
      // within-family: at most one direction can be the narrowing one
      if (fwd == Diff.Moderate) assert(bwd == Diff.Safe, s"$a<->$b")
    }
  }

  test("order-preserving union: keeps order, dedupes, superset semantics") {
    forAll(Gen.listOf(ident), Gen.listOf(ident)) { (a: List[String], b: List[String]) =>
      val u = Inheritance.orderPreservingUnion(a, b)
      assert(u.distinct == u)
      assert(u.toSet == (a.toSet ++ b.toSet))
      // primary order preserved as a subsequence
      val posOfA = a.distinct.map(u.indexOf)
      assert(posOfA == posOfA.sorted)
    }
  }

  test("topological sort respects every edge and is a permutation") {
    val nodesGen: Gen[Seq[NodeMeta]] = Gen.choose(1, 12).flatMap { n =>
      // DAG by construction: node i may only depend on j < i
      Gen.sequence[Seq[NodeMeta], NodeMeta]((0 until n).map { i =>
        Gen.someOf(0 until i).map { deps =>
          NodeMeta(s"model.n$i", s"n$i", "model",
            deps = deps.map(j => s"model.n$j").toSeq)
        }
      })
    }
    forAll(nodesGen) { nodes =>
      val sorted = NodeFilters.topologicalSort(scala.util.Random.shuffle(nodes))
      assert(sorted.map(_.uniqueId).sorted == nodes.map(_.uniqueId).sorted)
      val pos = sorted.map(_.uniqueId).zipWithIndex.toMap
      for (n <- nodes; d <- n.deps) assert(pos(d) < pos(n.uniqueId), s"$d before ${n.uniqueId}")
    }
  }

  test("fuzzy ratios are bounded, symmetric-ish, and 100 on identity") {
    forAll(ident, ident) { (a: String, b: String) =>
      val w = Fuzzy.wratio(a, b)
      assert(w >= 0.0 && w <= 100.0)
      assert(Fuzzy.wratio(a, a) == 100.0)
      assert(math.abs(Fuzzy.ratio(a, b) - Fuzzy.ratio(b, a)) < 1e-9)
    }
  }

  test("case variants always include the lower and upper forms") {
    forAll(ident) { s =>
      val v = Inheritance.caseVariants(s)
      assert(v.contains(s.toLowerCase) && v.contains(s.toUpperCase))
    }
  }

  test("schema validation flags what sync would fail on") {
    val dup = YamlIO.YamlDoc(ListMap("models" -> Seq(
      Map[String, Any]("name" -> "m"), Map[String, Any]("name" -> "m"))), ListMap.empty)
    assert(SchemaValidation.validate(dup).exists(_.rule == "duplicate-entry"))
    val noname = YamlIO.YamlDoc(ListMap("models" -> Seq(
      Map[String, Any]("description" -> "x"))), ListMap.empty)
    assert(SchemaValidation.validate(noname).exists(_.rule == "entry-name"))
    val badTest = YamlIO.YamlDoc(ListMap("models" -> Seq(
      Map[String, Any]("name" -> "m", "columns" -> Seq(
        Map[String, Any]("name" -> "c", "tests" -> Seq(
          Map[String, Any]("a" -> 1, "b" -> 2))))))), ListMap.empty)
    assert(SchemaValidation.validate(badTest).exists(_.rule == "test-config"))
    val clean = YamlIO.YamlDoc(ListMap("version" -> 2, "models" -> Seq(
      Map[String, Any]("name" -> "m", "columns" -> Seq(
        Map[String, Any]("name" -> "c", "tests" -> Seq("unique")))))), ListMap.empty)
    assert(SchemaValidation.validate(clean).isEmpty)
  }

  test("deep test-config validation: per-test argument contracts") {
    def doc(tests: Any) = YamlIO.YamlDoc(ListMap("version" -> 2, "models" -> Seq(
      Map[String, Any]("name" -> "m", "columns" -> Seq(
        Map[String, Any]("name" -> "c", "tests" -> tests))))), ListMap.empty)
    def rules(tests: Any) = SchemaValidation.validate(doc(tests)).map(_.rule).toSet
    assert(rules(Seq("made_up_test")).contains("unknown-test"))
    assert(rules(Seq(Map("relationships" -> Map("to" -> "ref('x')"))))
      .contains("missing-relationship-field")) // field missing
    // dbt's nested arguments shape is accepted
    assert(!rules(Seq(Map("relationships" -> Map("arguments" ->
      Map("to" -> "ref('x')", "field" -> "id")))))
      .contains("missing-relationship-field"))
    assert(rules(Seq(Map("accepted_values" -> Map[String, Any]())))
      .contains("missing-accepted-values"))
    assert(rules(Seq(Map("accepted_values" -> Map("values" -> Nil))))
      .contains("empty-accepted-values"))
    assert(rules(Seq(Map("unique_combination_of_columns" ->
      Map("combination_of_columns" -> Seq("a")))))
      .contains("insufficient-combination-columns"))
    assert(rules("not-a-list").contains("invalid-tests-type"))
    // resource-level data_tests are validated too
    val resDoc = YamlIO.YamlDoc(ListMap("version" -> 2, "models" -> Seq(
      Map[String, Any]("name" -> "m",
        "data_tests" -> Seq(Map("accepted_values" -> Map[String, Any]()))))), ListMap.empty)
    assert(SchemaValidation.validate(resDoc).exists(_.rule == "missing-accepted-values"))
  }

  test("meta/tags typing and structure validators") {
    val bad = YamlIO.YamlDoc(ListMap("version" -> 2, "models" -> Seq(
      Map[String, Any]("name" -> "m", "meta" -> "oops", "tags" -> Seq(1, 2),
        "columns" -> Seq(Map[String, Any]("name" -> "c", "tags" -> "x"))))), ListMap.empty)
    val rules = SchemaValidation.validate(bad).map(_.rule)
    assert(rules.count(_ == "invalid-tags-type") == 2)
    assert(rules.contains("invalid-meta-type"))
    val empty = YamlIO.YamlDoc(ListMap.empty, ListMap.empty)
    val er = SchemaValidation.validate(empty).map(_.rule).toSet
    assert(er.contains("missing-version") && er.contains("no-resources"))
    // auto-fix sets version to 2
    val (fixed, applied) = SchemaValidation.autoFix(
      YamlIO.YamlDoc(ListMap("models" -> Seq(Map[String, Any]("name" -> "m"))), ListMap.empty))
    assert(fixed.managed("version") == 2 && applied.nonEmpty)
  }

  test("typed entry/column contracts: non-map entries and non-string names report") {
    def rules(managed: (String, Any)*) =
      SchemaValidation.validate(
        YamlIO.YamlDoc(ListMap(("version" -> 2) +: managed: _*), ListMap.empty))
        .map(_.rule).toSet
    // a bare string where a model map belongs
    assert(rules("models" -> Seq("just_a_name")).contains("invalid-entry-type"))
    // a numeric name
    assert(rules("models" -> Seq(Map[String, Any]("name" -> 42)))
      .contains("invalid-entry-name"))
    // models: not even a list
    assert(rules("models" -> "oops").contains("invalid-section-type"))
    // columns: scalar instead of list; non-map column; numeric column name
    assert(rules("models" -> Seq(Map[String, Any]("name" -> "m", "columns" -> "id")))
      .contains("invalid-columns-type"))
    assert(rules("models" -> Seq(Map[String, Any]("name" -> "m",
      "columns" -> Seq("id")))).contains("invalid-column-type"))
    assert(rules("models" -> Seq(Map[String, Any]("name" -> "m",
      "columns" -> Seq(Map[String, Any]("name" -> 7)))))
      .contains("invalid-column-name"))
  }

  test("source table contracts: presence, types, and deep test args") {
    def doc(src: Map[String, Any]) =
      YamlIO.YamlDoc(ListMap("version" -> 2, "sources" -> Seq(src)), ListMap.empty)
    def rules(src: Map[String, Any]) =
      SchemaValidation.validate(doc(src)).map(_.rule).toSet
    assert(rules(Map("name" -> "raw")).contains("missing-source-tables"))
    assert(rules(Map("name" -> "raw", "tables" -> "t"))
      .contains("invalid-source-tables-type"))
    assert(rules(Map("name" -> "raw", "tables" -> Seq("t")))
      .contains("invalid-source-table-type"))
    assert(rules(Map("name" -> "raw", "tables" -> Seq(Map[String, Any]("loaded_at" -> "x"))))
      .contains("missing-source-table-name"))
    assert(rules(Map("name" -> "raw", "tables" -> Seq(Map[String, Any]("name" -> 1))))
      .contains("invalid-source-table-name"))
    // table-level and column-level test args validated like models
    val deep = Map[String, Any]("name" -> "raw", "tables" -> Seq(Map[String, Any](
      "name" -> "events",
      "data_tests" -> Seq(Map("accepted_values" -> Map[String, Any]())),
      "columns" -> Seq(Map[String, Any]("name" -> "id",
        "tests" -> Seq(Map("relationships" -> Map("to" -> "ref('x')"))))))))
    val rs = rules(deep)
    assert(rs.contains("missing-accepted-values"))
    assert(rs.contains("missing-relationship-field"))
    // a healthy source yields nothing
    assert(SchemaValidation.validate(doc(Map("name" -> "raw", "tables" -> Seq(
      Map[String, Any]("name" -> "events", "columns" -> Seq(
        Map[String, Any]("name" -> "id", "tests" -> Seq("unique")))))))).isEmpty)
  }

  test("formatting and cross-file duplicate detection") {
    val fmt = SchemaValidation.validateFormatting(
      "version: 2 \nmodels:\r\n\n\n\n  - name: m\n").map(_.rule).toSet
    assert(fmt == Set("trailing-whitespace", "excessive-blank-lines",
      "crlf-line-endings"))
    assert(SchemaValidation.validateFormatting("version: 2\nmodels: []\n").isEmpty)

    def doc(managed: (String, Any)*) =
      YamlIO.YamlDoc(ListMap(managed: _*), ListMap.empty)
    val p1 = java.nio.file.Paths.get("models/a.yml")
    val p2 = java.nio.file.Paths.get("models/b.yml")
    val dups = SchemaValidation.validateCrossFile(Seq(
      p1 -> doc("models" -> Seq(Map[String, Any]("name" -> "orders")),
        "sources" -> Seq(Map[String, Any]("name" -> "raw", "tables" -> Seq(
          Map[String, Any]("name" -> "events"))))),
      p2 -> doc("models" -> Seq(Map[String, Any]("name" -> "orders"),
        Map[String, Any]("name" -> "customers")),
        "sources" -> Seq(Map[String, Any]("name" -> "raw", "tables" -> Seq(
          Map[String, Any]("name" -> "events")))))))
    val byRule = dups.groupBy(_.rule)
    assert(byRule.contains("cross-file-duplicate-model"))
    assert(byRule.contains("cross-file-duplicate-source-table"))
    assert(dups.forall(_.severity == "error"))
    assert(dups.exists(f => f.message.contains("'orders'") && f.path.contains("a.yml")
      && f.path.contains("b.yml")))
    // same name twice in ONE file is the per-file rule's job, not this one
    val single = SchemaValidation.validateCrossFile(Seq(
      p1 -> doc("models" -> Seq(Map[String, Any]("name" -> "m"),
        Map[String, Any]("name" -> "m")))))
    assert(single.isEmpty)
    // unmanaged top-level keys warn when the validator is opted in
    val withExtra = YamlIO.YamlDoc(ListMap("version" -> 2,
      "models" -> Seq(Map[String, Any]("name" -> "m"))),
      ListMap("exposures" -> Nil))
    assert(SchemaValidation.unmanagedKeysWarned(withExtra)
      .exists(f => f.rule == "unmanaged-top-level-keys" && f.path.contains("exposures")))
  }

  test("versioned-model validation: v shapes, duplicates, latest, selectors") {
    def doc(model: Map[String, Any]) =
      YamlIO.YamlDoc(ListMap("version" -> 2, "models" -> Seq(model)), ListMap.empty)
    def rules(model: Map[String, Any]) =
      SchemaValidation.validate(doc(model)).map(_.rule).toSet
    assert(rules(Map("name" -> "m", "latest_version" -> 2))
      .contains("invalid-latest-version")) // latest without versions
    assert(rules(Map("name" -> "m", "versions" -> "nope"))
      .contains("invalid-versions-type"))
    assert(rules(Map("name" -> "m", "versions" -> Seq(Map[String, Any]("columns" -> Nil))))
      .contains("missing-model-version"))
    assert(rules(Map("name" -> "m", "versions" -> Seq(Map[String, Any]("v" -> true))))
      .contains("invalid-model-version"))
    assert(rules(Map("name" -> "m", "versions" -> Seq(
      Map[String, Any]("v" -> 2), Map[String, Any]("v" -> 2.0))))
      .contains("duplicate-model-version"))
    assert(rules(Map("name" -> "m", "latest_version" -> 3,
      "versions" -> Seq(Map[String, Any]("v" -> 1), Map[String, Any]("v" -> 2))))
      .contains("invalid-latest-version"))
    // selectors: exclude requires include all/*
    assert(rules(Map("name" -> "m", "versions" -> Seq(Map[String, Any]("v" -> 1,
      "columns" -> Seq(Map[String, Any]("include" -> Seq("a"), "exclude" -> Seq("b")))))))
      .contains("invalid-version-column-selector"))
    assert(rules(Map("name" -> "m", "versions" -> Seq(Map[String, Any]("v" -> 1,
      "columns" -> Seq(Map[String, Any]("exclude" -> Seq("b")))))))
      .contains("invalid-version-column-selector")) // include missing
    // at most one selector per version block
    assert(rules(Map("name" -> "m", "versions" -> Seq(Map[String, Any]("v" -> 1,
      "columns" -> Seq(
        Map[String, Any]("include" -> "*"),
        Map[String, Any]("include" -> "all"))))))
      .contains("invalid-version-column-selector"))
    // a fully valid versioned model produces no findings
    assert(SchemaValidation.validate(doc(Map("name" -> "m", "latest_version" -> 2,
      "versions" -> Seq(
        Map[String, Any]("v" -> 1, "columns" -> Seq(Map[String, Any]("name" -> "c"))),
        Map[String, Any]("v" -> "2", "columns" -> Seq(
          Map[String, Any]("include" -> "*", "exclude" -> Seq("secret")),
          Map[String, Any]("name" -> "c", "tests" -> Seq("unique")))))))).isEmpty)
  }
}
