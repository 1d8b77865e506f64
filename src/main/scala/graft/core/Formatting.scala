package graft.core

import java.nio.file.Path

import scala.sys.process._
import scala.util.Try

/** External formatter hook (A33; core/formatting.py:35-135): run a
  * user-configured command (prettier-style) once over the YAML files a
  * run wrote. Non-fatal on failure, bounded runtime.
  */
object Formatting {

  final case class FormatResult(exitCode: Int, output: String, ran: Boolean)

  def runExternalFormatter(command: Seq[String], files: Seq[Path],
      cwd: Option[Path] = None, timeoutSeconds: Int = 120): FormatResult = {
    if (command.isEmpty || files.isEmpty) return FormatResult(0, "", ran = false)
    val full = command ++ files.map(_.toString)
    val out = new StringBuilder
    val logger = ProcessLogger(s => out.append(s).append('\n'),
      s => out.append(s).append('\n'))
    Try {
      val proc = cwd.fold(full.run(logger))(d => Process(full, d.toFile).run(logger))
      val exited = scala.concurrent.Await.result(
        scala.concurrent.Future(proc.exitValue())(
          scala.concurrent.ExecutionContext.global),
        scala.concurrent.duration.Duration(timeoutSeconds, "s"))
      FormatResult(exited, out.toString, ran = true)
    }.recover { case e =>
      FormatResult(-1, s"formatter failed (non-fatal): ${e.getMessage}", ran = true)
    }.get
  }
}
