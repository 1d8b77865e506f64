package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

/** End-to-end CLI integration: the reference's
  * `demo_duckdb/integration_tests.sh` safety net (organize →
  * document → refactor through the REAL binary on a temp project
  * copy, asserting exit codes and on-disk outcomes) re-expressed over
  * `graft.Cli`. Each command runs as its own JVM via the test
  * classpath — the genuine `main`, `sys.exit` codes and all — so a
  * CLI-level regression (arg parsing, session wiring, exit-code
  * contract, YAML writes) fails here even when every unit suite is
  * green.
  */
class CliIntegrationSpec extends AnyFunSuite {

  private def copyFixture(): Path = {
    val src = java.nio.file.Paths.get("fixtures/jaffle")
    val dst = Files.createTempDirectory("graft_cli_e2e")
    val s = Files.walk(src)
    try s.forEach { p =>
      val t = dst.resolve(src.relativize(p).toString)
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    } finally s.close()
    dst
  }

  /** Run `graft.Cli args…` in a fresh JVM with this test JVM's
    * classpath and module options; returns (exitCode, stdout+stderr).
    */
  private def cli(args: String*): (Int, String) = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val moduleOpts = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.toArray.map(_.toString)
      .sliding(2).collect { case Array("--add-opens", v) => Seq("--add-opens", v) }
      .flatten.toSeq
    val cmd = Seq(javaBin) ++ moduleOpts ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-cp", System.getProperty("java.class.path"), "graft.Cli") ++ args
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    pb.environment().put("SPARK_GRAFT_CPUS", "4")
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val code = proc.waitFor()
    (code, out)
  }

  test("organize -> document -> refactor -> lint -> diff -> run-sql on one project") {
    val root = copyFixture()
    val dir = root.toString

    def written(out: String): Seq[Path] = out.linesIterator.collect {
      case l if l.startsWith("wrote ") => root.resolve(l.stripPrefix("wrote ").trim)
    }.toSeq

    // organize --auto-apply: YAML moves to the configured per-model
    // paths ({node.schema}/{node.name}.yml relative to each node's
    // folder, the fixture's +dbt-osmosis template), exit 0
    val (c1, o1) = cli("organize", dir, "--auto-apply")
    assert(c1 == 0, s"organize failed:\n$o1")
    val w1 = written(o1)
    val stgYml = w1.find(_.getFileName.toString == "stg_customers.yml")
    assert(stgYml.exists(Files.exists(_)),
      s"organize must move staging YAML to its template target:\n$o1")

    // document: inherited docs land on disk, exit 0
    val (c2, o2) = cli("document", dir)
    assert(c2 == 0, s"document failed:\n$o2")
    val custYml = written(o2).find(_.getFileName.toString == "customers.yml")
      .getOrElse(w1.find(_.getFileName.toString == "customers.yml")
        .getOrElse(fail(s"no customers.yml written:\n$o1\n$o2")))
    val docYaml = Files.readString(custYml)
    assert(docYaml.contains("Unique identifier for a customer"),
      s"document must inherit the staged description into $custYml:\n$docYaml")

    // refactor --auto-apply: full pipeline converges, exit 0
    val (c3, o3) = cli("refactor", dir, "--auto-apply")
    assert(c3 == 0, s"refactor failed:\n$o3")
    assert(o3.contains("step"), s"refactor must report pipeline steps:\n$o3")
    // a converged project passes --check (exit 0 = nothing to change)
    val (c4, o4) = cli("refactor", dir, "--auto-apply", "--check")
    assert(c4 == 0, s"second refactor must be a no-op, got $c4:\n$o4")

    // lint: violations print as uid:line:col [rule] message
    val (c5, o5) = cli("lint", dir)
    assert(c5 == 0, s"lint must pass on the fixture:\n$o5")

    // diff: built schema vs YAML — converged project, no error exit
    val (c6, o6) = cli("diff", dir)
    assert(c6 == 0, s"diff failed:\n$o6")

    // run-sql: ad-hoc jinja SQL against the built project
    val (c7, o7) = cli("run-sql", dir,
      "SELECT COUNT(*) AS n FROM {{ ref('customers') }}")
    assert(c7 == 0, s"run-sql failed:\n$o7")
    assert(o7.contains("n") && o7.split("\n").exists(_.matches(".*\\b\\d+\\b.*")),
      s"run-sql must print the result table:\n$o7")
  }
}
