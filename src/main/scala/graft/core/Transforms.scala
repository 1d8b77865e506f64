package graft.core

import scala.collection.immutable.ListMap

import org.apache.spark.sql.SparkSession

import graft.core.Introspection.IntrospectedColumn

/** Schema-reconciliation transforms (A19–A26): reconcile a node's
  * documented columns against the live (Spark) schema, mirroring
  * core/transforms.py semantics. All pure NodeMeta → NodeMeta given an
  * introspected column map; the Spark-backed entry points fetch that
  * map via [[Introspection]].
  */
object Transforms {

  private def caseModes(node: NodeMeta, settings: EngineSettings): (Boolean, Boolean) = (
    SettingsResolver.resolveBool("output-to-upper", settings.outputToUpper, settings, Some(node)),
    SettingsResolver.resolveBool("output-to-lower", settings.outputToLower, settings, Some(node)))

  /** A20 inject: DB − YAML set difference appended, with case-fold
    * compare when an output case mode is on, optional dtype stamping,
    * comment → description (core/transforms.py:321-399).
    */
  def injectMissingColumns(node: NodeMeta, incoming: ListMap[String, IntrospectedColumn],
      settings: EngineSettings): NodeMeta = {
    if (SettingsResolver.resolveBool("skip-add-columns", fallback = false, settings, Some(node)))
      return node
    val (toUpper, toLower) = caseModes(node, settings)
    val caseInsensitive = toUpper || toLower
    val cred = settings.credentialsType
    val current = node.columns.values.map { c =>
      val n = Introspection.normalizeColumnName(c.name, cred)
      if (caseInsensitive) n.toLowerCase else n
    }.toSet

    var columns = node.columns
    for ((incomingName, meta) <- incoming) {
      val compare = if (caseInsensitive) incomingName.toLowerCase else incomingName
      if (!current.contains(compare)) {
        val finalName =
          if (toUpper) incomingName.toUpperCase
          else if (toLower) incomingName.toLowerCase
          else incomingName
        val dtype =
          if (SettingsResolver.resolveBool("skip-add-data-types", fallback = false, settings, Some(node))) None
          else Some(
            if (toUpper) meta.dataType.toUpperCase
            else if (toLower) meta.dataType.toLowerCase
            else meta.dataType)
        columns = columns.updated(finalName, ColumnMeta(
          name = finalName,
          description = Some(meta.comment.getOrElse("")),
          dataType = dtype))
      }
    }
    node.copy(columns = columns)
  }

  /** A21 remove: YAML − DB set difference dropped
    * (core/transforms.py:402-455). No-op when introspection found
    * nothing (safety against dropping everything).
    */
  def removeColumnsNotInDatabase(node: NodeMeta, incoming: ListMap[String, IntrospectedColumn],
      settings: EngineSettings): NodeMeta = {
    if (incoming.isEmpty) return node
    val (toUpper, toLower) = caseModes(node, settings)
    val caseInsensitive = toUpper || toLower
    val cred = settings.credentialsType
    val incomingKeys =
      if (caseInsensitive) incoming.keySet.map(_.toLowerCase) else incoming.keySet
    val keep = node.columns.filter { case (key, c) =>
      val n = Introspection.normalizeColumnName(c.name, cred)
      incomingKeys.contains(if (caseInsensitive) n.toLowerCase else n)
    }
    node.copy(columns = keep)
  }

  /** A22 sort by warehouse ordinal, unknown columns last
    * (core/transforms.py:458-508).
    */
  def sortColumnsAsInDatabase(node: NodeMeta, incoming: ListMap[String, IntrospectedColumn],
      settings: EngineSettings): NodeMeta = {
    if (incoming.isEmpty) return node
    val (toUpper, toLower) = caseModes(node, settings)
    val caseInsensitive = toUpper || toLower
    val cred = settings.credentialsType
    val byLower = incoming.map { case (k, v) =>
      Introspection.normalizeColumnName(k, cred).toLowerCase -> v
    }
    def position(name: String): Int = {
      val normalized = Introspection.normalizeColumnName(name, cred)
      val inc = if (caseInsensitive) byLower.get(normalized.toLowerCase)
                else incoming.get(normalized)
      inc.map(_.index).getOrElse(99999)
    }
    node.copy(columns = ListMap(node.columns.toSeq.sortBy { case (k, _) => position(k) }: _*))
  }

  /** A23 sort alphabetically by final-cased name (core/transforms.py:511-555). */
  def sortColumnsAlphabetically(node: NodeMeta, settings: EngineSettings): NodeMeta = {
    val (toUpper, toLower) = caseModes(node, settings)
    def key(name: String): String =
      if (toUpper) name.toUpperCase else if (toLower) name.toLowerCase else name
    node.copy(columns = ListMap(node.columns.toSeq.sortBy { case (k, _) => key(k) }: _*))
  }

  /** A24 dispatch on the sort-by setting (core/transforms.py:558-580). */
  def sortColumnsAsConfigured(node: NodeMeta, incoming: ListMap[String, IntrospectedColumn],
      settings: EngineSettings): NodeMeta =
    SettingsResolver.resolveString("sort-by", Some(settings.sortBy), settings, Some(node)).get match {
      case "database" => sortColumnsAsInDatabase(node, incoming, settings)
      case "alphabetical" => sortColumnsAlphabetically(node, settings)
      case other => throw new IllegalArgumentException(
        s"Invalid sort-by value: $other for node: ${node.uniqueId}")
    }

  /** A25 sync data types from the warehouse, honoring per-column
    * skip + case-output modes and preserving an existing lowercase
    * style (core/transforms.py:583-644).
    */
  def synchronizeDataTypes(node: NodeMeta, incoming: ListMap[String, IntrospectedColumn],
      settings: EngineSettings): NodeMeta = {
    if (SettingsResolver.resolveBool("skip-add-data-types", fallback = false, settings, Some(node)))
      return node
    val cred = settings.credentialsType
    val incomingLower = incoming.map { case (k, v) => k.toLowerCase -> v }
    val columns = node.columns.map { case (name, column) =>
      if (SettingsResolver.resolveBool("skip-add-data-types",
          fallback = false, settings, Some(node), Some(name))) {
        name -> column
      } else {
        val lower = SettingsResolver.resolveBool("output-to-lower",
          settings.outputToLower, settings, Some(node), Some(name))
        val upper = SettingsResolver.resolveBool("output-to-upper",
          settings.outputToUpper, settings, Some(node), Some(name))
        val normalized = Introspection.normalizeColumnName(name, cred)
        val inc = incoming.get(normalized)
          .orElse(if (lower || upper) incomingLower.get(normalized.toLowerCase) else None)
        inc match {
          case Some(ic) if ic.dataType.nonEmpty =>
            val isLowerStyle = column.dataType.exists(dt => dt == dt.toLowerCase && dt.nonEmpty)
            val dt =
              if (upper) ic.dataType.toUpperCase
              else if (lower || isLowerStyle) ic.dataType.toLowerCase
              else ic.dataType
            name -> column.copy(dataType = Some(dt))
          case _ => name -> column
        }
      }
    }
    node.copy(columns = columns)
  }

  // --- Spark-backed drivers over candidate nodes -------------------

  /** Table name a node materializes to (for introspection). */
  def relationFor(node: NodeMeta): String = node.name

  def withIntrospection(spark: SparkSession, settings: EngineSettings)(
      f: (NodeMeta, ListMap[String, IntrospectedColumn]) => NodeMeta): NodeMeta => NodeMeta =
    node => f(node, Introspection.getColumns(spark, relationFor(node), settings, Some(node)))

  // --- A26 pipeline combinator -------------------------------------

  final case class StepResult(name: String, seconds: Double, mutated: Int)

  final case class PipelineResult(manifest: Manifest, steps: Seq[StepResult])

  /** Chainable transform pipeline with per-step timing, applied over
    * topologically sorted candidates (core/transforms.py:53-214 and
    * the fan-out pattern at :226-231). Driver-side sequential: the
    * work is metadata-sized; model *execution* is the distributed part.
    */
  final case class Pipeline(steps: Seq[(String, (Manifest, NodeMeta) => NodeMeta)]) {
    def andThen(name: String, op: (Manifest, NodeMeta) => NodeMeta): Pipeline =
      copy(steps = steps :+ (name -> op))

    def run(manifest: Manifest,
        filter: NodeFilters.NodeFilter = NodeFilters.NodeFilter()): PipelineResult = {
      var m = manifest
      val results = steps.map { case (name, op) =>
        val t0 = System.nanoTime()
        var mutated = 0
        val ordered = NodeFilters.topologicalSort(NodeFilters.candidates(m, filter))
        for (node <- ordered) {
          val current = m.get(node.uniqueId).get
          val next = op(m, current)
          if (next != current) { mutated += 1; m = m.updated(next) }
        }
        StepResult(name, (System.nanoTime() - t0) / 1e9, mutated)
      }
      PipelineResult(m, results)
    }
  }

  object Pipeline {
    def apply(): Pipeline = Pipeline(Seq.empty)
  }
}
