package graft.serve

import graft.exec.ModelExecutor

/** The ALTER-TABLE-comment middleware shared by every proxy transport
  * (HTTP [[SqlProxy]] and the MySQL wire [[MysqlFace]]) — the
  * reference applies the identical regex interception inside its
  * mysql-mimic session (`sql/proxy.py:37-110`): comment statements
  * update the IN-MEMORY manifest only (no YAML writes) and answer an
  * empty result.
  */
private[serve] object CommentMiddleware {

  private val AlterColumnComment =
    """(?is)\s*(?:/\*.*?\*/\s*)?ALTER\s+TABLE\s+(?:([^\s.]+)\.)?([^\s.]+)\s+MODIFY\s+COLUMN\s+(\S+)\s+.*?COMMENT\s+'([^']*)'\s*;?\s*""".r

  private val AlterTableComment =
    """(?is)\s*(?:/\*.*?\*/\s*)?ALTER\s+TABLE\s+(?:([^\s.]+)\.)?([^\s.]+)\s+COMMENT\s*=\s*'([^']*)'\s*;?\s*""".r

  /** Some(()) when the statement was intercepted and applied. */
  def intercept(executor: ModelExecutor, sql: String): Option[Unit] = sql match {
    case AlterColumnComment(schema, table, column, comment) =>
      matchingNodes(executor, Option(schema), table).foreach { n =>
        n.columns.get(column).foreach { c =>
          executor.updateNode(n.copy(columns =
            n.columns.updated(column, c.copy(description = Some(comment)))))
        }
      }
      Some(())
    case AlterTableComment(schema, table, comment) =>
      matchingNodes(executor, Option(schema), table).foreach { n =>
        executor.updateNode(n.copy(description = comment))
      }
      Some(())
    case _ => None
  }

  private def matchingNodes(executor: ModelExecutor, schema: Option[String],
      table: String) =
    executor.manifest.nodes.values.filter { n =>
      n.name == table && schema.forall(_ == n.schema)
    }
}
