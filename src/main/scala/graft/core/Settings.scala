package graft.core

/** Engine settings + the per-column/node resolution chain (A8).
  *
  * Reference precedence (core/introspection.py:826-1007), highest
  * first:
  *   1. column meta (prefixed → direct → options)
  *   2. node meta (prefixed → direct → options)
  *   3. node config extras (prefixed → options; NO direct keys)
  *   4. node config.meta (prefixed → direct → options)
  *   5. node unrendered_config (prefixed → options; NO direct keys)
  *   6. explicit engine settings (the typed fallback the caller passes)
  *   7. supplementary `dbt-osmosis.yml` at the project root
  *   8. project vars (`dbt-osmosis:`/`dbt_osmosis:` section → top-level)
  *   9. fallback default.
  * Keys are accepted in kebab-case, snake_case, `dbt-osmosis-`
  * prefixed, and inside a `dbt-osmosis-options` object.
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
    /** Fusion-compatible YAML dialect: per-column meta/tags nest
      * inside `config:` instead of the classic top-level keys.
      * Auto-detected from an existing Fusion manifest (A3,
      * core/config.py:95-145) or set explicitly.
      */
    fusionCompat: Boolean = false,
    /** Project vars (dbt_project.yml `vars:` analog; may carry a
      * `dbt-osmosis:`/`dbt_osmosis:` section).
      */
    vars: Map[String, Any] = Map.empty,
    /** Contents of the supplementary `dbt-osmosis.yml` file at the
      * project root (core/introspection.py:670-772) — resolved AFTER
      * node-level sources but BEFORE project vars.
      */
    supplementary: Map[String, Any] = Map.empty,
    placeholders: Set[String] = EngineSettings.DefaultPlaceholders)

object EngineSettings {
  /** Reference placeholder descriptions (core/settings.py:133-139). */
  val DefaultPlaceholders: Set[String] = Set(
    "",
    "Pending further documentation",
    "No description for this column",
    "Not documented",
    "Undefined")

  /** Load the supplementary `dbt-osmosis.yml` from a project root
    * (empty map when absent; malformed YAML raises — fail loud, the
    * reference raises ConfigurationError too).
    */
  def loadSupplementary(projectRoot: java.nio.file.Path): Map[String, Any] = {
    val p = projectRoot.resolve("dbt-osmosis.yml")
    if (!java.nio.file.Files.isRegularFile(p)) Map.empty
    else YamlIO.read(p).full
  }

  /** Settings with the supplementary file merged in from disk. */
  def withSupplementary(settings: EngineSettings,
      projectRoot: java.nio.file.Path): EngineSettings =
    settings.copy(supplementary = loadSupplementary(projectRoot))
}

object SettingsResolver {

  private def kebab(name: String): String = name.replace('_', '-')
  private def snake(name: String): String = name.replace('-', '_')

  /** All accepted spellings of a setting name (kept for callers). */
  private[core] def keyVariants(name: String): Seq[String] =
    Seq(name, kebab(name), snake(name),
      s"dbt-osmosis-${kebab(name)}", s"dbt_osmosis_${snake(name)}").distinct

  private def prefixedLookup(m: Map[String, Any], name: String): Option[Any] =
    m.get(s"dbt-osmosis-${kebab(name)}")
      .orElse(m.get(s"dbt_osmosis_${snake(name)}"))

  private def directLookup(m: Map[String, Any], name: String): Option[Any] =
    m.get(kebab(name)).orElse(m.get(snake(name)))

  private def optionsLookup(m: Map[String, Any], name: String): Option[Any] =
    Seq("dbt-osmosis-options", "dbt_osmosis_options").view.flatMap { key =>
      m.get(key) match {
        case Some(opts: Map[_, _]) =>
          directLookup(opts.asInstanceOf[Map[String, Any]], name)
        case _ => None
      }
    }.headOption

  /** One source in the chain: prefixed → (direct, when allowed) →
    * options object (core/introspection.py:891-916 `dict_value`).
    */
  private def lookup(m: Map[String, Any], name: String,
      directKeys: Boolean = true): Option[Any] =
    prefixedLookup(m, name)
      .orElse(if (directKeys) directLookup(m, name) else None)
      .orElse(optionsLookup(m, name))

  /** Project-vars source (core/introspection.py:552-663): a
    * `dbt-osmosis:`/`dbt_osmosis:` section first (direct → options
    * within it), then prefixed/direct top-level vars.
    */
  private def varsLookup(vars: Map[String, Any], name: String): Option[Any] = {
    val section = Seq("dbt-osmosis", "dbt_osmosis").view.flatMap { key =>
      vars.get(key) match {
        case Some(s: Map[_, _]) =>
          val sm = s.asInstanceOf[Map[String, Any]]
          directLookup(sm, name).orElse(optionsLookup(sm, name))
        case _ => None
      }
    }.headOption
    section.orElse(lookup(vars, name))
  }

  private def asMap(v: Any): Map[String, Any] = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case _ => Map.empty
  }

  private val Defaults = EngineSettings()

  /** Typed accessors for the engine-settings fields addressable by
    * name — level 6 of the chain. A typed value counts as EXPLICIT
    * (and therefore beats the supplementary file and project vars,
    * reference core/introspection.py:263-292) only when it differs
    * from the dataclass default, exactly like the reference's
    * non-default check.
    */
  private val TypedAccessors: Map[String, EngineSettings => Any] = Map(
    "add-progenitor-to-meta" -> (_.addProgenitorToMeta),
    "use-unrendered-descriptions" -> (_.useUnrenderedDescriptions),
    "skip-inherit-descriptions" -> (_.skipInheritDescriptions),
    "skip-add-tags" -> (_.skipAddTags),
    "skip-merge-meta" -> (_.skipMergeMeta),
    "force-inherit-descriptions" -> (_.forceInheritDescriptions),
    "add-inheritance-for-specified-keys" -> (_.addInheritanceForSpecifiedKeys),
    "skip-inheritance-for-meta-keys" -> (_.skipInheritanceForMetaKeys),
    "numeric-precision-and-scale" -> (_.numericPrecisionAndScale),
    "string-length" -> (_.stringLength),
    "output-to-lower" -> (_.outputToLower),
    "output-to-upper" -> (_.outputToUpper),
    "sort-by" -> (_.sortBy),
    "prefix" -> (_.prefix),
    "fusion-compat" -> (_.fusionCompat))

  private def explicitTyped(name: String, settings: EngineSettings): Option[Any] =
    TypedAccessors.get(kebab(name)).flatMap { acc =>
      val v = acc(settings)
      if (v != acc(Defaults)) Some(v) else None
    }

  /** Resolve `name` for (node, column) through the full precedence
    * chain (see [[EngineSettings]] scaladoc): node-level sources
    * (levels 1-5), then a NON-DEFAULT typed engine setting (level 6 —
    * explicit configuration beats the project files), then the
    * supplementary file and project vars (7-8). Callers' fallbacks in
    * `resolveBool`/`Seq`/`String` are level 9.
    */
  def resolve(name: String, settings: EngineSettings,
      node: Option[NodeMeta] = None, column: Option[String] = None): Option[Any] = {
    // column config.meta merges OVER column meta (dbt >= 1.10 shape;
    // reference _get_effective_column_meta, introspection.py:316-323)
    val columnMeta: Map[String, Any] = (for {
      n <- node; c <- column; cm <- n.columns.get(c)
    } yield (cm.meta: Map[String, Any]) ++ asMap(cm.config.getOrElse("meta", null)))
      .getOrElse(Map.empty)
    val nodeMeta = node.map(_.meta).getOrElse(Map.empty)
    val nodeConfig = node.map(_.config).getOrElse(Map.empty)
    val nodeConfigMeta = asMap(nodeConfig.getOrElse("meta", null))
    val unrendered = node.map(_.unrenderedConfig).getOrElse(Map.empty)
    lookup(columnMeta, name)
      .orElse(lookup(nodeMeta, name))
      .orElse(lookup(nodeConfig, name, directKeys = false))
      .orElse(lookup(nodeConfigMeta, name))
      .orElse(lookup(unrendered, name, directKeys = false))
      .orElse(explicitTyped(name, settings))
      .orElse(lookup(settings.supplementary, name))
      .orElse(varsLookup(settings.vars, name))
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
