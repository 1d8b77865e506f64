package graft.core

/** Migration planning (A38; core/migration.py:235-639): turn a schema
  * diff into ordered DDL with rollback, across the reference's
  * dialect map (core/migration.py:344-364) with per-dialect
  * identifier quoting (core/migration.py:580-620), plus SQL /
  * markdown / JSON exports (core/migration.py:105-232, 454-489).
  * Spark/Delta stays the engine's native default dialect.
  */
object Migration {

  /** Dialect normalization (reference `_detect_dialect`,
    * core/migration.py:344-364): aliases collapse onto the seven
    * canonical dialects; unknown names pass through lower-cased and
    * take the fallback DDL syntax.
    */
  val DialectAliases: Map[String, String] = Map(
    "snowflake" -> "snowflake",
    "postgres" -> "postgres",
    "postgresql" -> "postgres",
    "redshift" -> "postgres",
    "bigquery" -> "bigquery",
    "duckdb" -> "duckdb",
    "databricks" -> "databricks",
    "spark" -> "spark",
    "sqlserver" -> "sqlserver",
    "mssql" -> "sqlserver")

  def normalizeDialect(credentialsType: String): String = {
    val lc = credentialsType.toLowerCase
    DialectAliases.getOrElse(lc, lc)
  }

  /** Per-dialect identifier quoting; dotted names quote each part
    * (already-quoted parts pass through, reference
    * core/migration.py:580-620).
    */
  def quoteIdent(ident: String, dialect: String): String = {
    val (open, close) = dialect match {
      case "snowflake" | "postgres" | "duckdb" => ("\"", "\"")
      case "sqlserver" => ("[", "]")
      case _ => ("`", "`") // bigquery, spark, databricks, fallback
    }
    ident.split('.').map { part =>
      if (part.startsWith(open) && part.endsWith(close)) part
      else s"$open$part$close"
    }.mkString(".")
  }

  final case class Step(
      order: Int,
      sql: String,
      rollback: Option[String],
      severity: Diff.Severity,
      description: String,
      changeType: String = "")

  final case class Plan(table: String, steps: Seq[Step], dialect: String = "spark") {
    def hasBreaking: Boolean = steps.exists(_.severity == Diff.Breaking)
    def safeSteps: Seq[Step] = steps.filter(_.severity != Diff.Breaking)
    def breakingSteps: Seq[Step] = steps.filter(_.severity == Diff.Breaking)

    /** Transactional script + rollback trailer (reference `to_sql`,
      * core/migration.py:105-160).
      */
    def sqlScript: String = {
      val header = Seq(
        s"-- Migration Plan for $table",
        s"-- Dialect: $dialect",
        s"-- Steps: ${steps.size} (${breakingSteps.size} breaking)",
        "", "BEGIN;", "")
      val body = steps.flatMap { s =>
        Seq(s"-- Step ${s.order}: ${s.description}") ++
          (if (s.severity == Diff.Breaking)
             Seq("-- WARNING: BREAKING CHANGE - REVIEW REQUIRED") else Nil) ++
          Seq(s.sql + ";", "")
      }
      val rollbackLines = steps.reverse.flatMap(s =>
        s.rollback.toSeq.flatMap(r =>
          Seq(s"-- Rollback Step ${s.order}: ${s.description}", r + ";", "")))
      (header ++ body ++ Seq("COMMIT;", "") ++
        (if (rollbackLines.nonEmpty)
           Seq("-- Rollback Script", "", "BEGIN;", "") ++ rollbackLines ++
             Seq("COMMIT;")
         else Nil)).mkString("\n")
    }

    def rollbackScript: String =
      steps.reverse.flatMap(_.rollback).map(_ + ";").mkString("\n")

    def markdown: String = {
      val rows = steps.map(s =>
        s"| ${s.order} | ${s.severity} | `${s.sql}` | ${s.description} |")
      ("| # | severity | ddl | description |" +: "|---|---|---|---|" +: rows).mkString("\n")
    }

    /** JSON export (reference `to_dict` + `export_plan` JSON format,
      * core/migration.py:207-232,454-489). Round-trips via
      * [[Migration.fromJson]].
      */
    def toJson: String = {
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.createObjectNode()
      root.put("table", table)
      root.put("dialect", dialect)
      val summary = root.putObject("summary")
      summary.put("total_steps", steps.size)
      summary.put("safe_steps", safeSteps.size)
      summary.put("breaking_steps", breakingSteps.size)
      val arr = root.putArray("steps")
      steps.foreach { s =>
        val o = arr.addObject()
        o.put("order", s.order)
        o.put("description", s.description)
        o.put("sql", s.sql)
        s.rollback match {
          case Some(r) => o.put("rollback_sql", r)
          case None => o.putNull("rollback_sql")
        }
        o.put("is_breaking", s.severity == Diff.Breaking)
        o.put("severity", s.severity.toString)
        o.put("change_type", s.changeType)
      }
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
    }
  }

  /** Parse a [[Plan.toJson]] payload back into a Plan (severity names
    * round-trip through `Diff.Severity.toString`).
    */
  def fromJson(json: String): Plan = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(json)
    require(root != null && root.isObject, "migration plan JSON: not an object")
    def severity(name: String): Diff.Severity = name match {
      case "Safe" => Diff.Safe
      case "Moderate" => Diff.Moderate
      case "Breaking" => Diff.Breaking
      case other => throw new IllegalArgumentException(s"unknown severity '$other'")
    }
    val stepsNode = root.get("steps")
    val steps = (0 until (if (stepsNode == null) 0 else stepsNode.size)).map { i =>
      val s = stepsNode.get(i)
      Step(
        order = s.get("order").asInt,
        sql = s.get("sql").asText,
        rollback = Option(s.get("rollback_sql")).filter(!_.isNull).map(_.asText),
        severity = severity(s.get("severity").asText),
        description = s.get("description").asText,
        changeType = Option(s.get("change_type")).map(_.asText).getOrElse(""))
    }
    Plan(root.get("table").asText, steps,
      Option(root.get("dialect")).map(_.asText).getOrElse("spark"))
  }

  /** Write a plan to disk in the requested format: "sql", "json", or
    * "markdown" (reference `export_plan`, core/migration.py:454-489).
    */
  def exportPlan(plan: Plan, outputPath: java.nio.file.Path,
      format: String = "sql"): Unit = {
    val content = format match {
      case "sql" => plan.sqlScript
      case "json" => plan.toJson
      case "markdown" => plan.markdown
      case other => throw new IllegalArgumentException(s"Unsupported format: $other")
    }
    Option(outputPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.writeString(outputPath, content)
  }

  // ------------------------------------------------------------------
  // Per-dialect DDL (reference _plan_column_* methods,
  // core/migration.py:425-578)

  private def renameDdl(dialect: String, t: String, rawOld: String, rawNew: String):
      (String, String, Boolean) = {
    val o = quoteIdent(rawOld, dialect)
    val n = quoteIdent(rawNew, dialect)
    val rollback = s"ALTER TABLE $t RENAME COLUMN $n TO $o"
    dialect match {
      case "sqlserver" =>
        (s"EXEC sp_rename '$t.$rawOld', '$rawNew', 'COLUMN'",
          s"EXEC sp_rename '$t.$rawNew', '$rawOld', 'COLUMN'", false)
      case "databricks" =>
        // Delta column rename needs column mapping enabled; flag for
        // manual migration like the reference (migration.py:501-505)
        (s"-- RENAME NOT SUPPORTED: Manual migration required for $t.$o -> $n",
          rollback, true)
      case _ =>
        (s"ALTER TABLE $t RENAME COLUMN $o TO $n", rollback, false)
    }
  }

  private def typeChangeDdl(dialect: String, t: String, col: String,
      newType: String, oldType: String): (String, String) = {
    val c = quoteIdent(col, dialect)
    dialect match {
      case "snowflake" | "bigquery" =>
        (s"ALTER TABLE $t ALTER COLUMN $c SET DATA TYPE $newType",
          s"ALTER TABLE $t ALTER COLUMN $c SET DATA TYPE $oldType")
      case "sqlserver" =>
        (s"ALTER TABLE $t ALTER COLUMN $c $newType",
          s"ALTER TABLE $t ALTER COLUMN $c $oldType")
      case "spark" =>
        (s"ALTER TABLE $t CHANGE COLUMN $c $c $newType",
          s"ALTER TABLE $t CHANGE COLUMN $c $c $oldType")
      case _ => // postgres, duckdb, databricks, fallback
        (s"ALTER TABLE $t ALTER COLUMN $c TYPE $newType",
          s"ALTER TABLE $t ALTER COLUMN $c TYPE $oldType")
    }
  }

  /** Build the ordered plan: renames first (so adds/drops see final
    * names), then adds, then type changes, then drops — the
    * reference's ordering (core/migration.py:366-391).
    */
  def planFor(table: String, diff: Diff.DiffResult,
      allowBreaking: Boolean = false, dialect: String = "spark"): Plan = {
    val d = normalizeDialect(dialect)
    val t = quoteIdent(table, d)
    var order = 0
    def next(): Int = { order += 1; order }

    val renameSteps = diff.changes.collect { case r: Diff.ColumnRenamed =>
      val (sql, rollback, breaking) = renameDdl(d, t, r.oldName, r.newName)
      Step(next(), sql, Some(rollback),
        if (breaking) Diff.Breaking else r.severity, r.description,
        changeType = "column_renamed")
    }
    val addSteps = diff.changes.collect { case a: Diff.ColumnAdded =>
      val c = quoteIdent(a.column, d)
      Step(next(),
        s"ALTER TABLE $t ADD COLUMN $c ${a.dataType.getOrElse("STRING")}",
        Some(s"ALTER TABLE $t DROP COLUMN $c"),
        a.severity, a.description, changeType = "column_added")
    }
    val typeSteps = diff.changes.collect {
      case tc: Diff.TypeChanged if allowBreaking || tc.severity != Diff.Breaking =>
        val (sql, rollback) = typeChangeDdl(d, t, tc.column, tc.newType, tc.oldType)
        Step(next(), sql, Some(rollback), tc.severity, tc.description,
          changeType = "type_changed")
    }
    val dropSteps = diff.changes.collect {
      case rm: Diff.ColumnRemoved if allowBreaking || rm.severity != Diff.Breaking =>
        val c = quoteIdent(rm.column, d)
        Step(next(),
          s"ALTER TABLE $t DROP COLUMN $c",
          rm.dataType.map(dt => s"ALTER TABLE $t ADD COLUMN $c $dt"),
          rm.severity, rm.description, changeType = "column_removed")
    }
    Plan(table, renameSteps ++ addSteps ++ typeSteps ++ dropSteps, d)
  }
}
