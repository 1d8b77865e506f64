package graft.core

import scala.concurrent.{Await, Future}
import scala.concurrent.duration._
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession

/** Model validation (A43; core/validation.py:136-286): compile each
  * model and run analysis-only validation — Catalyst's analyzer
  * resolves relations/columns/types without executing, the Spark
  * equivalent of the reference's EXPLAIN dry-run, with a per-model
  * timeout standing in for its SIGALRM guard.
  */
object Validation {

  final case class Result(nodeId: String, status: String, error: Option[String])

  def validateSql(spark: SparkSession, sql: String,
      timeout: Duration = 30.seconds): Option[String] = {
    import scala.concurrent.ExecutionContext.Implicits.global
    Try(Await.result(Future {
      spark.sql(sql).queryExecution.analyzed
    }, timeout)) match {
      case Success(_) => None
      case Failure(e) => Some(e.getMessage.linesIterator.take(3).mkString(" "))
    }
  }

  /** Validate every compiled model in the manifest. */
  def validateModels(spark: SparkSession, manifest: Manifest,
      timeout: Duration = 30.seconds): Seq[Result] =
    manifest.models.toSeq.sortBy(_.uniqueId).map { node =>
      node.compiledCode match {
        case None => Result(node.uniqueId, "skipped", Some("not compiled"))
        case Some(sql) => validateSql(spark, sql, timeout) match {
          case None => Result(node.uniqueId, "passed", None)
          case Some(err) => Result(node.uniqueId, "failed", Some(err))
        }
      }
    }
}
