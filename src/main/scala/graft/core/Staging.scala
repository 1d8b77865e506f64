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
}
