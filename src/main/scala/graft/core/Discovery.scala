package graft.core

/** Documentation-coverage discovery (A39; core/discovery.py): find
  * undocumented/poorly-documented models and columns, compute coverage
  * %, and priority-score the gaps so teams fix the highest-leverage
  * docs first.
  */
object Discovery {

  /** Generic phrases that count as "documented but useless"
    * (reference's generic-description heuristics).
    */
  val GenericDescriptions: Set[String] =
    EngineSettings.DefaultPlaceholders ++ Set("TODO", "tbd", "TBD", "...")

  final case class ColumnGap(nodeId: String, column: String, kind: String)
  final case class Coverage(
      totalModels: Int, documentedModels: Int,
      totalColumns: Int, documentedColumns: Int) {
    def modelPct: Double =
      if (totalModels == 0) 100.0 else 100.0 * documentedModels / totalModels
    def columnPct: Double =
      if (totalColumns == 0) 100.0 else 100.0 * documentedColumns / totalColumns
  }

  def isDocumented(desc: Option[String]): Boolean =
    desc.exists(d => d.trim.nonEmpty && !GenericDescriptions.contains(d.trim))

  def undocumentedColumns(manifest: Manifest): Seq[ColumnGap] =
    manifest.models.toSeq.flatMap { n =>
      n.columns.values.collect {
        case c if c.description.forall(_.trim.isEmpty) =>
          ColumnGap(n.uniqueId, c.name, "missing")
        case c if !isDocumented(c.description) =>
          ColumnGap(n.uniqueId, c.name, "generic")
      }
    }

  def coverage(manifest: Manifest): Coverage = {
    val models = manifest.models.toSeq
    Coverage(
      totalModels = models.size,
      documentedModels = models.count(n => isDocumented(Some(n.description))),
      totalColumns = models.map(_.columns.size).sum,
      documentedColumns = models.map(_.columns.values.count(c => isDocumented(c.description))).sum)
  }

  /** Priority score (core/discovery.py:479-521): base gap score +
    * min(30, 3·fan-out) + 15 if feeding from sources + 5 for wide
    * models, clamped to [0, 100].
    */
  def priorityScore(manifest: Manifest, node: NodeMeta): Int = {
    val undocumented = node.columns.values.count(c => !isDocumented(c.description))
    val base = if (node.columns.isEmpty) 0
      else (40.0 * undocumented / node.columns.size).toInt +
        (if (!isDocumented(Some(node.description))) 10 else 0)
    val fanOut = manifest.nodes.values.count(_.deps.contains(node.uniqueId))
    val fanOutBonus = math.min(30, 3 * fanOut)
    val sourceBonus = if (node.deps.exists(_.startsWith("source."))) 15 else 0
    val wideBonus = if (node.columns.size > 20) 5 else 0
    math.min(100, math.max(0, base + fanOutBonus + sourceBonus + wideBonus))
  }

  /** Gap report ordered by descending priority. */
  def prioritizedGaps(manifest: Manifest): Seq[(NodeMeta, Int)] =
    manifest.models.toSeq
      .filter(n => n.columns.values.exists(c => !isDocumented(c.description)) ||
        !isDocumented(Some(n.description)))
      .map(n => n -> priorityScore(manifest, n))
      .sortBy { case (n, score) => (-score, n.uniqueId) }
}
