package graft.core

import java.nio.file.{Path, Paths}

/** YAML path templating + resolution (A9;
  * core/path_management.py:124-260): resolve the target schema-YAML
  * file for a node from the `+dbt-osmosis:` config / vars routing /
  * global default, with `{model}/{parent}/{schema}/{node.*}` format
  * variables and path-traversal guards.
  */
object PathManagement {

  final case class PathResolutionError(message: String) extends RuntimeException(message)

  /** Render `{var}` / `{node.attr}` template placeholders. */
  private[core] def renderTemplate(tpl: String, node: NodeMeta, parent: String): String = {
    val nodeAttr = "\\{node\\.([a-zA-Z_]+)\\}".r
    val withNode = nodeAttr.replaceAllIn(tpl, m => m.group(1) match {
      case "name" => node.name
      case "schema" => node.schema
      case "database" => node.database
      case "resource_type" => node.resourceType
      case "package_name" => node.packageName
      case other => throw PathResolutionError(
        s"Unable to render YAML path template for '${node.uniqueId}': " +
          s"missing template attribute 'node.$other'")
    })
    "\\{([a-zA-Z_]+)\\}".r.replaceAllIn(withNode, m => m.group(1) match {
      case "model" => node.name
      case "parent" => parent
      case "schema" => node.schema
      case other => throw PathResolutionError(
        s"Unable to render YAML path template for '${node.uniqueId}': " +
          s"missing template key '$other'")
    })
  }

  /** Template resolution order (core/path_management.py:124-177):
    * node config/meta (`dbt-osmosis` key via the settings chain) →
    * vars-based routing → global `dbt_osmosis_default_path` var.
    */
  def pathTemplate(node: NodeMeta, settings: EngineSettings): Option[String] =
    SettingsResolver.resolveString("dbt-osmosis", None, settings, Some(node))
      .orElse(SettingsResolver.resolveString("dbt-osmosis-path", None, settings, Some(node)))
      .orElse(settings.vars.get("dbt_osmosis_default_path").collect { case s: String => s })

  /** Current YAML location: patch path for models/seeds, own path for
    * sources (core/path_management.py:181-200).
    */
  def currentYamlPath(projectRoot: Path, node: NodeMeta): Option[Path] =
    node.resourceType match {
      case "model" | "seed" =>
        node.patchPath.map(p => projectRoot.resolve(p.split("://").last))
      case "source" => Some(projectRoot.resolve(node.path))
      case _ => None
    }

  /** Target YAML location (core/path_management.py:201-260): rendered
    * template, rooted at the model dir for absolute templates /
    * sources, at the node's folder otherwise; `.yml` appended;
    * resolved path MUST stay inside the project root.
    */
  def targetYamlPath(projectRoot: Path, node: NodeMeta, settings: EngineSettings,
      modelPaths: Seq[String] = Seq("models")): Path = {
    val nodePath = projectRoot.resolve(if (node.path.nonEmpty) node.path else "models/_")
    val parent = Option(nodePath.getParent).map(_.getFileName.toString).getOrElse("")

    pathTemplate(node, settings) match {
      case None => projectRoot.resolve(node.path)
      case Some(tpl) =>
        var rendered = renderTemplate(tpl, node, parent)
        val base: Path =
          if (node.resourceType == "source") projectRoot.resolve(modelPaths.head)
          else if (rendered.startsWith("/")) {
            rendered = rendered.stripPrefix("/") // first slash only (traversal guard)
            projectRoot.resolve(modelPaths.head)
          } else nodePath.getParent
        if (!rendered.endsWith(".yml") && !rendered.endsWith(".yaml")) rendered += ".yml"
        val target = base.resolve(rendered).normalize()
        if (!target.startsWith(projectRoot.normalize()))
          throw PathResolutionError(
            s"Security violation: target YAML path '$target' is outside project root '$projectRoot'")
        target
    }
  }
}
