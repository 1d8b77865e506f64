package graft.core

/** Migration planning (A38; core/migration.py:235-489): turn a schema
  * diff into ordered DDL with rollback, for the Spark/Delta dialect
  * (the engine's native target) plus the quoting styles the reference
  * supports for export.
  */
object Migration {

  final case class Step(
      order: Int,
      sql: String,
      rollback: Option[String],
      severity: Diff.Severity,
      description: String)

  final case class Plan(table: String, steps: Seq[Step]) {
    def hasBreaking: Boolean = steps.exists(_.severity == Diff.Breaking)
    def sqlScript: String = steps.map(s => s.sql + ";").mkString("\n")
    def rollbackScript: String =
      steps.reverse.flatMap(_.rollback).map(_ + ";").mkString("\n")
    def markdown: String = {
      val rows = steps.map(s =>
        s"| ${s.order} | ${s.severity} | `${s.sql}` | ${s.description} |")
      ("| # | severity | ddl | description |" +: "|---|---|---|---|" +: rows).mkString("\n")
    }
  }

  private def quote(ident: String): String = s"`$ident`"

  /** Build the ordered plan: renames first (so adds/drops see final
    * names), then adds, then type changes, then drops — the
    * reference's ordering (core/migration.py:366-391).
    */
  def planFor(table: String, diff: Diff.DiffResult,
      allowBreaking: Boolean = false): Plan = {
    val t = quote(table)
    var order = 0
    def next(): Int = { order += 1; order }

    val renameSteps = diff.changes.collect { case r: Diff.ColumnRenamed =>
      Step(next(),
        s"ALTER TABLE $t RENAME COLUMN ${quote(r.oldName)} TO ${quote(r.newName)}",
        Some(s"ALTER TABLE $t RENAME COLUMN ${quote(r.newName)} TO ${quote(r.oldName)}"),
        r.severity, r.description)
    }
    val addSteps = diff.changes.collect { case a: Diff.ColumnAdded =>
      Step(next(),
        s"ALTER TABLE $t ADD COLUMN ${quote(a.column)} ${a.dataType.getOrElse("STRING")}",
        Some(s"ALTER TABLE $t DROP COLUMN ${quote(a.column)}"),
        a.severity, a.description)
    }
    val typeSteps = diff.changes.collect {
      case tc: Diff.TypeChanged if allowBreaking || tc.severity != Diff.Breaking =>
        Step(next(),
          s"ALTER TABLE $t ALTER COLUMN ${quote(tc.column)} TYPE ${tc.newType}",
          Some(s"ALTER TABLE $t ALTER COLUMN ${quote(tc.column)} TYPE ${tc.oldType}"),
          tc.severity, tc.description)
    }
    val dropSteps = diff.changes.collect {
      case rm: Diff.ColumnRemoved if allowBreaking || rm.severity != Diff.Breaking =>
        Step(next(),
          s"ALTER TABLE $t DROP COLUMN ${quote(rm.column)}",
          rm.dataType.map(dt =>
            s"ALTER TABLE $t ADD COLUMN ${quote(rm.column)} $dt"),
          rm.severity, rm.description)
    }
    Plan(table, renameSteps ++ addSteps ++ typeSteps ++ dropSteps)
  }
}
