package graft.core

import java.nio.file.Path

import org.apache.spark.sql.SparkSession

/** The two scoped entry points the reference ships NEXT to the
  * flagship `yaml refactor` (cli/main.py: `yaml organize` at :492-530,
  * `yaml document` at :532-570): organize = move YAML to its
  * configured target paths WITHOUT touching documentation; document =
  * inject missing columns + inherit upstream docs WITHOUT moving
  * files. `graft.Cli refactor` composes both plus the full transform
  * pipeline; these run each half on its own, which is how teams adopt
  * the tool incrementally (layout first, docs later — or vice versa).
  *
  * Both end in the same fail-closed sync: structural validation
  * (per-file chain + cross-file duplicates, A44) gates the atomic
  * YamlIO commit — nothing reaches disk on an error finding.
  */
object Workflows {

  final case class SyncResult(
      manifest: Manifest,
      findings: Seq[(Path, SchemaValidation.Finding)],
      written: Seq[Path],
      /** dry run only: the files a real run WOULD have written. */
      planned: Seq[Path] = Nil,
      /** whether the run changed (or, dry, would change) the project —
        * the reference `--check` exit-code contract. */
      mutated: Boolean = false)

  /** Validate synced files, then commit atomically — or, on a dry
    * run, report the would-write set and drop the buffers. On any
    * error finding, nothing is written either way.
    */
  private def validateAndCommit(projectRoot: Path, manifest: Manifest,
      synced: Seq[Path], dryRun: Boolean, extraMutated: Boolean): SyncResult = {
    val findings = synced.flatMap(p => SchemaValidation.validate(YamlIO.read(p))
      .map(f => p -> f)) ++
      SchemaValidation.validateCrossFile(synced.map(p => p -> YamlIO.read(p)))
        .map(f => projectRoot -> f)
    if (findings.exists(_._2.severity == "error")) {
      YamlIO.invalidate()
      SyncResult(manifest, findings, Nil, mutated = extraMutated)
    } else if (dryRun) {
      val planned = YamlIO.pending()
      YamlIO.invalidate()
      SyncResult(manifest, findings, Nil, planned = planned,
        mutated = extraMutated || planned.nonEmpty)
    } else {
      val written = YamlIO.commit()
      SyncResult(manifest, findings, written,
        mutated = extraMutated || written.nonEmpty)
    }
  }

  private def syncableNodes(manifest: Manifest,
      filter: NodeFilters.NodeFilter): Seq[NodeMeta] =
    NodeFilters.candidates(manifest, filter)
      .filter(n => n.resourceType == "model" || n.resourceType == "seed")

  /** `yaml organize`: restructure YAML docs to their configured
    * target paths (path templates, per-file grouping) and sync node
    * entries — documentation content is left exactly as it is (no
    * inheritance, no column injection beyond what sync preserves).
    * Needs no warehouse session: this is a pure metadata move.
    */
  def organize(projectRoot: Path, manifest0: Manifest,
      settings: EngineSettings, fqns: Seq[String] = Nil,
      dryRun: Boolean = false,
      /** positional model selectors (reference's `models` argument):
        * exact file, directory prefix, or node name. */
      models: Seq[String] = Nil,
      includeExternal: Boolean = false,
      /** Called with the drafted move count when a non-empty
        * restructure plan is about to apply (reference
        * apply_restructure_plan's confirm gate): false skips the
        * moves but the node sync still runs — declining a
        * restructure must not silently drop the rest of organize.
        */
      confirmMoves: Int => Boolean = _ => true): SyncResult = {
    val filter = NodeFilters.NodeFilter(fqnPrefixes = fqns, pathPatterns = models,
      includeExternal = includeExternal)
    val plan0 = Restructuring.draftPlan(projectRoot, manifest0, settings, filter)
    val plan =
      if (plan0.ops.nonEmpty && !dryRun && !confirmMoves(plan0.ops.size))
        plan0.copy(ops = Nil)
      else plan0
    if (dryRun) {
      // stage the restructure AND the sync purely in memory: pending()
      // then reports the complete would-write set — target files and
      // stripped old files alike, exactly what the real run commits
      val (manifest, _) = Restructuring.applyPlan(projectRoot, plan, manifest0,
        settings, dryRun = true)
      val synced = SyncOperations.syncNodes(projectRoot,
        syncableNodes(manifest, filter), settings)
      val r = validateAndCommit(projectRoot, manifest, synced,
        dryRun = true, extraMutated = plan.ops.nonEmpty)
      r.copy(planned = (plan.ops.map(_.targetFile) ++ r.planned).distinct.sorted)
    } else {
      val (manifest, moved) = Restructuring.applyPlan(projectRoot, plan, manifest0,
        settings)
      val synced = SyncOperations.syncNodes(projectRoot,
        syncableNodes(manifest, filter), settings)
      val r = validateAndCommit(projectRoot, manifest, synced,
        dryRun = false, extraMutated = plan.ops.nonEmpty)
      // applyPlan commits the restructure moves itself; surface the
      // FULL touched set (targets + stripped old files) in `written`
      r.copy(written =
        (moved ++ plan.ops.map(_.targetFile) ++ r.written).distinct.sorted)
    }
  }

  /** `yaml document`: pull documentation down the DAG — inject
    * columns the warehouse has but the YAML lacks, inherit
    * descriptions/tags/meta from ancestors, and sync — WITHOUT moving
    * any file. Requires built relations (column introspection reads
    * the warehouse schema, A4).
    */
  def document(spark: SparkSession, projectRoot: Path, manifest0: Manifest,
      settings: EngineSettings, fqns: Seq[String] = Nil,
      dryRun: Boolean = false,
      /** positional model selectors (reference's `models` argument). */
      models: Seq[String] = Nil,
      /** `--synthesize`: fill still-missing docs via the client after
        * inheritance (reference synthesize_missing_documentation,
        * cli/main.py:484-486 / 643-645). */
      synthesizeWith: Option[DocSynthesis.LlmClient] = None,
      includeExternal: Boolean = false): SyncResult = {
    val filter = NodeFilters.NodeFilter(fqnPrefixes = fqns, pathPatterns = models,
      includeExternal = includeExternal)
    def cols(n: NodeMeta) =
      Introspection.getColumns(spark, Transforms.relationFor(n), settings, Some(n))
    val base = Transforms.Pipeline()
      .andThen("inject", (_, n) => Transforms.injectMissingColumns(n, cols(n), settings))
      .andThen("inherit", (m, n) => Inheritance.inheritUpstreamColumnKnowledge(m, n, settings))
    val pipeline = synthesizeWith.fold(base)(client => base.andThen("synthesize",
      (m, n) => DocSynthesis.synthesizeNode(m, n, settings, client)))
    val result = pipeline.run(manifest0, filter)
    // "without moving files": a documented node syncs into its
    // EXISTING patch file (pinned via a per-node path option rendered
    // relative to its SQL dir); undocumented nodes use the configured
    // template if one exists, and are skipped otherwise (nowhere to
    // write without inventing a layout — that is organize's job)
    val nodes = syncableNodes(result.manifest, filter).flatMap { n =>
      n.patchPath match {
        case Some(pp) =>
          val cur = projectRoot.resolve(pp.split("://").last)
          val sqlParent = projectRoot.resolve(n.path).getParent
          val rel = sqlParent.relativize(cur).toString
          Some(n.copy(meta = n.meta + ("dbt-osmosis" -> rel)))
        case None if PathManagement.pathTemplate(n, settings).isDefined => Some(n)
        case None => None
      }
    }
    val synced = SyncOperations.syncNodes(projectRoot, nodes, settings)
    validateAndCommit(projectRoot, result.manifest, synced, dryRun,
      extraMutated = false)
  }
}
