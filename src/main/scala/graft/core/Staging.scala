package graft.core

/** Deterministic staging-model generation (A47; core/staging.py,
  * core/generators.py): given a source table's introspected columns,
  * emit the canonical staging SELECT (snake_case renames, one column
  * per line) plus its schema-YAML spec — the same shape the reference
  * produces from dbt-core-interface generators.
  */
object Staging {

  /** Convert an arbitrary column name to snake_case. */
  def toSnakeCase(name: String): String = {
    val cleaned = name.trim
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2")
      .replaceAll("[^A-Za-z0-9]+", "_")
    cleaned.toLowerCase.stripPrefix("_").stripSuffix("_")
  }

  final case class GeneratedStaging(name: String, sql: String,
      yamlEntry: Map[String, Any])

  /** Staging SQL: `source` CTE + `renamed` CTE with explicit column
    * list; renames applied only where the snake_case form differs.
    */
  def generateStagingModel(source: NodeMeta): GeneratedStaging = {
    val sourceName = source.fqn.lift(1).getOrElse(source.schema)
    val selects = source.columns.values.toSeq.map { c =>
      val snake = toSnakeCase(c.name)
      if (snake == c.name) s"        ${c.name}"
      else s"        ${c.name} as $snake"
    }
    val sql =
      s"""with source as (
         |    select * from {{ source('$sourceName', '${source.name}') }}
         |),
         |renamed as (
         |    select
         |${selects.mkString(",\n")}
         |    from source
         |)
         |select * from renamed
         |""".stripMargin
    val columns = source.columns.values.toSeq.map { c =>
      Map[String, Any]("name" -> toSnakeCase(c.name)) ++
        c.description.filter(_.nonEmpty).map("description" -> _).toMap ++
        c.dataType.map("data_type" -> _).toMap
    }
    GeneratedStaging(
      name = s"stg_${source.name}",
      sql = sql,
      yamlEntry = Map(
        "name" -> s"stg_${source.name}",
        "description" -> s"Staged ${source.name} records",
        "columns" -> columns))
  }

  // ---- LLM-refined staging specs (core/llm.py:1313-1613) ----

  final case class ColumnTransformation(
      originalName: String, newName: String,
      expression: Option[String], description: String)

  final case class StagingModelSpec(
      sourceName: String, stagingName: String, description: String,
      columns: Seq[ColumnTransformation], materialization: String)

  /** LLM-backed staging spec: the client proposes renames, cast/clean
    * expressions, and descriptions per column
    * (`{staging_name, description, materialization, columns:
    * [{original_name, new_name, expression, description}]}`); ANY
    * failure falls back to the deterministic snake_case spec, so this
    * path can never do worse than [[generateStagingModel]].
    */
  def generateStagingSpecWithClient(client: DocSynthesis.LlmClient,
      source: NodeMeta): StagingModelSpec = {
    val fallback = {
      val det = generateStagingModel(source)
      StagingModelSpec(source.name, det.name,
        s"Staging model for ${source.name}",
        source.columns.values.toSeq.map(c => ColumnTransformation(
          c.name, toSnakeCase(c.name), None, c.description.getOrElse(""))),
        "view")
    }
    try {
      val raw = DocSynthesis.callWithRetry(() => client.complete(
        "Design a staging model for the source table. Reply ONLY with JSON " +
          "{\"staging_name\", \"description\", \"materialization\", \"columns\": " +
          "[{\"original_name\", \"new_name\", \"expression\", \"description\"}]}.",
        s"""Source ${source.name} (${source.resourceType})
           |Description: ${source.description}
           |Columns:
           |${source.columns.values.map(c =>
              s"- ${c.name}: ${c.dataType.getOrElse("unknown")}").mkString("\n")}""".stripMargin))
      if (raw == null || raw.trim.isEmpty) fallback
      else {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = mapper.readTree(DocSynthesis.stripFences(raw))
        if (root == null || !root.isObject) fallback
        else {
          def str(n: com.fasterxml.jackson.databind.JsonNode, k: String, d: String) =
            Option(n.get(k)).filter(_.isTextual).map(_.asText).getOrElse(d)
          val cols = Option(root.get("columns")).filter(_.isArray).map { arr =>
            (0 until arr.size).flatMap { i =>
              val c = arr.get(i)
              val orig = str(c, "original_name", str(c, "name", ""))
              if (orig.isEmpty) None
              else Some(ColumnTransformation(
                orig, str(c, "new_name", orig),
                Option(c.get("expression")).filter(_.isTextual).map(_.asText),
                str(c, "description", "")))
            }
          }.getOrElse(Nil)
          if (cols.isEmpty) fallback
          else StagingModelSpec(source.name,
            str(root, "staging_name", s"stg_${source.name}"),
            str(root, "description", s"Staging model for ${source.name}"),
            cols, str(root, "materialization", "view"))
        }
      }
    } catch { case _: Exception => fallback }
  }

  /** Render a staging spec to SQL: source CTE + renamed CTE, applying
    * each transformation's expression (aliased) or rename.
    */
  def renderStagingSql(spec: StagingModelSpec, sourceGroup: String): String = {
    val selects = spec.columns.map { t =>
      t.expression match {
        case Some(e) => s"        $e as ${t.newName}"
        case None if t.newName == t.originalName => s"        ${t.originalName}"
        case None => s"        ${t.originalName} as ${t.newName}"
      }
    }
    s"""with source as (
       |    select * from {{ source('$sourceGroup', '${spec.sourceName}') }}
       |),
       |renamed as (
       |    select
       |${selects.mkString(",\n")}
       |    from source
       |)
       |select * from renamed
       |""".stripMargin
  }
}
