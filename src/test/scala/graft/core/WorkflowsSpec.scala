package graft.core

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.exec.ModelExecutor
import graft.project.ProjectLoader

/** The scoped `yaml organize` / `yaml document` workflows: organize
  * moves YAML to its configured target paths WITHOUT changing
  * documentation; document inherits documentation WITHOUT moving
  * files. Each runs against a throwaway copy of the jaffle fixture.
  */
class WorkflowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.session

  /** description of `col` on model `model` in a raw YamlDoc, None if
    * absent or empty */
  private def colDesc(doc: YamlIO.YamlDoc, model: String, col: String): Option[String] = {
    val models = doc.full("models").asInstanceOf[Seq[Any]]
      .map(_.asInstanceOf[Map[String, Any]])
    for {
      m <- models.find(_("name") == model)
      cs = m.getOrElse("columns", Seq.empty).asInstanceOf[Seq[Any]]
        .map(_.asInstanceOf[Map[String, Any]])
      c <- cs.find(_("name") == col)
      d <- c.get("description").map(_.toString) if d.nonEmpty
    } yield d
  }

  private def copyFixture(): Path = {
    val src = java.nio.file.Paths.get("fixtures/jaffle")
    val dst = Files.createTempDirectory("graft_wf")
    val s = Files.walk(src)
    try s.forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    } finally s.close()
    dst
  }

  test("organize moves YAML to per-model paths without touching docs") {
    val root = copyFixture()
    val project = ProjectLoader.load(root.toString)
    // "{model}.yml" renders relative to each model's own directory
    val settings = EngineSettings(
      vars = Map("dbt_osmosis_default_path" -> "{model}.yml"))
    val r = Workflows.organize(root, project.manifest, settings)
    assert(r.findings.forall(_._2.severity != "error"), r.findings.toString)
    assert(r.written.nonEmpty, "organize wrote nothing")
    // staging models land next to their SQL, split per model
    val stg = root.resolve("models/staging/stg_customers.yml")
    assert(Files.exists(stg), "expected per-model YAML at the target path")
    // documentation content is untouched: the same description text,
    // and the downstream customers entry still has NO description
    // (document/refactor would inherit one)
    val stgDoc = Files.readString(stg)
    assert(stgDoc.contains("Unique identifier for a customer"))
    val customersYml = root.resolve("models/customers.yml")
    assert(Files.exists(customersYml))
    assert(colDesc(YamlIO.read(customersYml), "customers", "customer_id").isEmpty,
      "organize must NOT inherit documentation")
    YamlIO.invalidate()
  }

  test("yaml flags parse: repeatable --fqn, --dry-run, --check, unknown rejected") {
    import graft.Cli
    assert(Cli.parseYamlFlags(
      List("--fqn", "staging", "--fqn", "marts.a", "--dry-run", "--check")) ==
      Right(Cli.YamlFlags(Seq("staging", "marts.a"), dryRun = true, check = true)))
    assert(Cli.parseYamlFlags(Nil) == Right(Cli.YamlFlags()))
    assert(Cli.parseYamlFlags(List("--bogus")).isLeft)
    assert(Cli.parseYamlFlags(List("--fqn")).isLeft, "--fqn needs a value")
    assert(Cli.parseYamlFlags(List("--fqn")) ==
      Left("option '--fqn' requires a value"))
    assert(Cli.parseYamlFlags(List("--fqn", "--dry-run")) ==
      Left("option '--fqn' requires a value"),
      "a following flag must not be swallowed as the value")
  }

  test("organize --dry-run touches nothing; real runs converge to a no-op") {
    val root = copyFixture()
    val settings = EngineSettings(
      vars = Map("dbt_osmosis_default_path" -> "{model}.yml"))
    val dry = Workflows.organize(root,
      ProjectLoader.load(root.toString).manifest, settings, dryRun = true)
    assert(dry.written.isEmpty, "dry run must not write")
    assert(dry.planned.nonEmpty, "dry run must report the would-write set")
    assert(dry.mutated, "dry run must still detect the pending mutation")
    assert(!Files.exists(root.resolve("models/staging/stg_customers.yml")),
      "dry run moved files on disk")
    // real run mutates; a SECOND real run finds everything in place
    // and reports no mutation — the --check contract
    val real = Workflows.organize(root,
      ProjectLoader.load(root.toString).manifest, settings)
    assert(real.mutated && real.written.nonEmpty)
    YamlIO.invalidate()
    val again = Workflows.organize(root,
      ProjectLoader.load(root.toString).manifest, settings)
    assert(!again.mutated,
      s"converged project reported mutation: wrote ${again.written}")
    YamlIO.invalidate()
  }

  test("organize --fqn scopes the restructure to matching models") {
    val root = copyFixture()
    val settings = EngineSettings(
      vars = Map("dbt_osmosis_default_path" -> "{model}.yml"))
    val r = Workflows.organize(root,
      ProjectLoader.load(root.toString).manifest, settings,
      fqns = Seq("staging"))
    assert(r.findings.forall(_._2.severity != "error"), r.findings.toString)
    // staging models moved to per-model files...
    assert(Files.exists(root.resolve("models/staging/stg_customers.yml")))
    // ...but the out-of-scope root-level model was left alone
    assert(!Files.exists(root.resolve("models/customers.yml")),
      "--fqn staging must not restructure models outside the pattern")
    assert(Files.exists(root.resolve("models/schema.yml")))
    YamlIO.invalidate()
  }

  test("document --dry-run reports inheritance without writing it") {
    val root = copyFixture()
    import spark.implicits._
    Seq((1, "north"), (2, "south")).toDF("region_id", "region_name")
      .createOrReplaceTempView("region_lookup")
    val project = ProjectLoader.load(root.toString)
    val executor = new ModelExecutor(spark, project)
    executor.buildAll()
    val settings = EngineSettings(addProgenitorToMeta = true)
    val r = Workflows.document(spark, root, executor.manifest, settings,
      dryRun = true)
    assert(r.written.isEmpty && r.planned.nonEmpty && r.mutated)
    // the inherited description exists in the returned manifest but
    // NOT on disk
    assert(colDesc(YamlIO.read(root.resolve("models/schema.yml")),
      "customers", "customer_id").isEmpty,
      "dry run leaked an inherited description to disk")
    YamlIO.invalidate()
  }

  test("yaml flag matrix parses: toggles, repeatable keys, positional models") {
    import graft.Cli
    val parsed = Cli.parseYamlFlags(List(
      "stg_customers", "--auto-apply", "--synthesize", "-F",
      "--skip-add-columns", "--skip-add-data-types", "--skip-add-tags",
      "--skip-merge-meta", "--skip-inheritance-for-meta-keys", "k1",
      "--skip-inheritance-for-meta-keys", "k2",
      "--add-inheritance-for-specified-keys", "policy_tags",
      "--add-progenitor-to-meta", "--numeric-precision-and-scale",
      "--string-length", "--output-to-lower", "customers"))
    assert(parsed.isRight, parsed.toString)
    val f = parsed.toOption.get
    assert(f.models == Seq("stg_customers", "customers"))
    assert(f.autoApply && f.synthesize && f.forceInheritDescriptions)
    assert(f.skipAddColumns && f.skipAddDataTypes && f.skipAddTags && f.skipMergeMeta)
    assert(f.skipInheritanceForMetaKeys == Seq("k1", "k2"))
    assert(f.addInheritanceForSpecifiedKeys == Seq("policy_tags"))
    assert(f.addProgenitorToMeta && f.numericPrecisionAndScale &&
      f.stringLength && f.outputToLower && !f.outputToUpper)
    // the matrix folds into the same settings the per-node chain reads
    val s = f.applyTo(EngineSettings())
    assert(s.forceInheritDescriptions && s.skipAddTags && s.skipMergeMeta)
    assert(s.skipInheritanceForMetaKeys == Seq("k1", "k2"))
    assert(s.addInheritanceForSpecifiedKeys == Seq("policy_tags"))
    assert(s.numericPrecisionAndScale && s.stringLength && s.outputToLower)
    // skip-add-* ride the vars level of the resolution chain
    assert(SettingsResolver.resolveBool("skip-add-columns", fallback = false, s))
    assert(SettingsResolver.resolveBool("skip-add-data-types", fallback = false, s))
    // and a vars level set by the CLI still loses to node-level config
    assert(Cli.parseYamlFlags(List("--skip-inheritance-for-meta-keys")).isLeft)
  }

  test("positional model selectors scope document to the named node") {
    val root = copyFixture()
    import spark.implicits._
    Seq((1, "north"), (2, "south")).toDF("region_id", "region_name")
      .createOrReplaceTempView("region_lookup")
    val project = ProjectLoader.load(root.toString)
    val executor = new ModelExecutor(spark, project)
    executor.buildAll()
    val settings = EngineSettings(addProgenitorToMeta = true)
    val r = Workflows.document(spark, root, executor.manifest, settings,
      models = Seq("stg_customers"))
    assert(r.findings.forall(_._2.severity != "error"), r.findings.toString)
    // out-of-scope downstream model was not documented
    assert(colDesc(YamlIO.read(root.resolve("models/schema.yml")),
      "customers", "customer_id").isEmpty,
      "selector must keep customers out of scope")
    YamlIO.invalidate()
  }

  test("document --synthesize fills docs inheritance can't reach") {
    val root = copyFixture()
    import spark.implicits._
    Seq((1, "north"), (2, "south")).toDF("region_id", "region_name")
      .createOrReplaceTempView("region_lookup")
    val project = ProjectLoader.load(root.toString)
    val executor = new ModelExecutor(spark, project)
    executor.buildAll()
    val settings = EngineSettings(addProgenitorToMeta = true)
    val r = Workflows.document(spark, root, executor.manifest, settings,
      synthesizeWith = Some(DocSynthesis.HeuristicClient))
    assert(r.findings.forall(_._2.severity != "error"), r.findings.toString)
    val doc = YamlIO.read(root.resolve("models/schema.yml"))
    // inherited doc still wins over synthesis
    assert(colDesc(doc, "customers", "customer_id")
      .contains("Unique identifier for a customer"))
    // a column no ancestor documents gets the deterministic synthesis
    val synthesized = colDesc(doc, "customers", "number_of_orders")
    assert(synthesized.exists(_.nonEmpty),
      s"number_of_orders must be synthesized, got $synthesized")
    assert(synthesized.exists(_.toLowerCase.contains("number")), synthesized.toString)
    YamlIO.invalidate()
  }

  test("document inherits docs in place without moving files") {
    val root = copyFixture()
    import spark.implicits._
    Seq((1, "north"), (2, "south")).toDF("region_id", "region_name")
      .createOrReplaceTempView("region_lookup")
    val project = ProjectLoader.load(root.toString)
    val executor = new ModelExecutor(spark, project)
    executor.buildAll()
    val settings = EngineSettings(addProgenitorToMeta = true)
    val r = Workflows.document(spark, root, executor.manifest, settings)
    assert(r.findings.forall(_._2.severity != "error"), r.findings.toString)
    assert(r.written.nonEmpty, "document wrote nothing")
    // no restructure: the shared schema.yml stays where it was
    assert(Files.exists(root.resolve("models/schema.yml")))
    assert(!Files.exists(root.resolve("models/customers.yml")))
    // downstream customers.customer_id now carries the staged doc
    assert(colDesc(YamlIO.read(root.resolve("models/schema.yml")),
      "customers", "customer_id")
      .contains("Unique identifier for a customer"))
    YamlIO.invalidate()
  }
}
