package graft.core

/** Engine settings + the per-column/node resolution chain (A8).
  *
  * Reference precedence (core/introspection.py:834-864): column meta →
  * node meta → node config extras → node config.meta → explicit CLI
  * settings → project-level settings → fallback. Keys are accepted in
  * kebab-case, snake_case, `dbt-osmosis-` prefixed, and inside a
  * `dbt-osmosis-options` object.
  */
final case class EngineSettings(
    addProgenitorToMeta: Boolean = false,
    useUnrenderedDescriptions: Boolean = false,
    skipInheritDescriptions: Boolean = false,
    skipAddTags: Boolean = false,
    skipMergeMeta: Boolean = false,
    forceInheritDescriptions: Boolean = false,
    addInheritanceForSpecifiedKeys: Seq[String] = Nil,
    skipInheritanceForMetaKeys: Seq[String] = Nil,
    numericPrecisionAndScale: Boolean = false,
    stringLength: Boolean = false,
    outputToLower: Boolean = false,
    outputToUpper: Boolean = false,
    sortBy: String = "database",
    prefix: Option[String] = None,
    /** Adapter-style case folding: "spark" preserves case. */
    credentialsType: String = "spark",
    /** Project-level setting overrides (dbt-osmosis.yml analog). */
    vars: Map[String, Any] = Map.empty,
    placeholders: Set[String] = EngineSettings.DefaultPlaceholders)

object EngineSettings {
  /** Reference placeholder descriptions (core/settings.py:133-139). */
  val DefaultPlaceholders: Set[String] = Set(
    "",
    "Pending further documentation",
    "No description for this column",
    "Not documented",
    "Undefined")
}

object SettingsResolver {

  /** All accepted spellings of a setting name. */
  private[core] def keyVariants(name: String): Seq[String] = {
    val kebab = name.replace('_', '-')
    val snake = name.replace('-', '_')
    Seq(name, kebab, snake, s"dbt-osmosis-$kebab", s"dbt_osmosis_$snake").distinct
  }

  private def lookup(m: Map[String, Any], name: String): Option[Any] = {
    val variants = keyVariants(name)
    val direct = variants.collectFirst { case v if m.contains(v) => m(v) }
    direct.orElse {
      m.get("dbt-osmosis-options").orElse(m.get("dbt_osmosis_options")) match {
        case Some(opts: Map[_, _]) =>
          val om = opts.asInstanceOf[Map[String, Any]]
          variants.collectFirst { case v if om.contains(v) => om(v) }
        case _ => None
      }
    }
  }

  /** Resolve `name` for (node, column) through the precedence chain. */
  def resolve(name: String, settings: EngineSettings,
      node: Option[NodeMeta] = None, column: Option[String] = None): Option[Any] = {
    val columnMeta: Map[String, Any] = (for {
      n <- node; c <- column; cm <- n.columns.get(c)
    } yield (cm.meta: Map[String, Any])).getOrElse(Map.empty)
    val nodeMeta = node.map(_.meta).getOrElse(Map.empty)
    val nodeConfig = node.map(_.config).getOrElse(Map.empty)
    val nodeConfigMeta = nodeConfig.get("meta") match {
      case Some(m: Map[_, _]) => m.asInstanceOf[Map[String, Any]]
      case _ => Map.empty[String, Any]
    }
    lookup(columnMeta, name)
      .orElse(lookup(nodeMeta, name))
      .orElse(lookup(nodeConfig, name))
      .orElse(lookup(nodeConfigMeta, name))
      .orElse(lookup(settings.vars, name))
  }

  def resolveBool(name: String, fallback: Boolean, settings: EngineSettings,
      node: Option[NodeMeta] = None, column: Option[String] = None): Boolean =
    resolve(name, settings, node, column) match {
      case Some(b: Boolean) => b
      case Some(s: String) => s.equalsIgnoreCase("true")
      case _ => fallback
    }

  def resolveSeq(name: String, fallback: Seq[String], settings: EngineSettings,
      node: Option[NodeMeta] = None, column: Option[String] = None): Seq[String] =
    resolve(name, settings, node, column) match {
      case Some(s: Seq[_]) => s.map(_.toString)
      case Some(s: String) => Seq(s)
      case _ => fallback
    }

  def resolveString(name: String, fallback: Option[String], settings: EngineSettings,
      node: Option[NodeMeta] = None, column: Option[String] = None): Option[String] =
    resolve(name, settings, node, column) match {
      case Some(s: String) => Some(s)
      case _ => fallback
    }
}
