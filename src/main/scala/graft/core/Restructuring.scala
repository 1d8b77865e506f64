package graft.core

import java.nio.file.{Files, Path}

import scala.collection.immutable.ListMap

/** YAML restructuring (A28/A29; core/restructuring.py): compute where
  * each node's YAML *should* live vs where it *does* live, draft a
  * per-target-file plan, and apply it — merging entries into target
  * files, stripping them from superseded files, deleting emptied
  * files.
  */
object Restructuring {

  final case class RestructureOp(
      targetFile: Path,
      nodes: Seq[NodeMeta],
      supersededPaths: Map[String, Seq[Path]]) // nodeId -> old files

  final case class Plan(ops: Seq[RestructureOp]) {
    def isEmpty: Boolean = ops.isEmpty
  }

  /** Draft: nodes whose current YAML path differs from the target
    * path, deduped by target file (core/restructuring.py:175-238).
    */
  def draftPlan(projectRoot: Path, manifest: Manifest, settings: EngineSettings,
      filter: NodeFilters.NodeFilter = NodeFilters.NodeFilter()): Plan = {
    val moves = for {
      node <- NodeFilters.candidates(manifest, filter)
      if node.resourceType != "source" // sources restructure via bootstrap
      target = PathManagement.targetYamlPath(projectRoot, node, settings)
      current = PathManagement.currentYamlPath(projectRoot, node)
      if !current.map(_.normalize).contains(target.normalize)
    } yield (target, node, current.toSeq)

    val ops = moves.groupBy(_._1).toSeq.sortBy(_._1.toString).map {
      case (target, group) =>
        RestructureOp(target,
          group.map(_._2),
          group.map(m => m._2.uniqueId -> m._3).toMap)
    }
    Plan(ops)
  }

  /** Apply: per op — read target, merge node entries in, buffer;
    * strip the moved entries from their old files; drop emptied files
    * and empty parent dirs; commit all writes atomically
    * (core/restructuring.py:254-291,351-479).
    *
    * Returns the updated manifest AND every path the apply touched —
    * target files and stripped old files alike — so callers can
    * report the full write set (the strips were previously invisible
    * to `organize`'s wrote/would-write output). With `dryRun` the
    * changes stay buffered in [[YamlIO]] (nothing committed, second
    * element empty): the caller's pending()/invalidate() cycle then
    * sees plan and sync buffers together.
    */
  def applyPlan(projectRoot: Path, plan: Plan, manifest: Manifest,
      settings: EngineSettings, dryRun: Boolean = false): (Manifest, Seq[Path]) = {
    var m = manifest
    for (op <- plan.ops) {
      val doc0 = YamlIO.read(op.targetFile)
      var doc = doc0
      for (node <- SyncOperations.syncOrder(op.nodes)) {
        doc = SyncOperations.syncNodeToDoc(doc, node)
        m = m.updated(node.copy(patchPath =
          Some(projectRoot.relativize(op.targetFile).toString)))
      }
      // buffer only real changes (no-op moves must not dirty files —
      // `--check` treats every write as a mutation)
      if (doc != doc0) YamlIO.buffer(op.targetFile, doc)

      // strip superseded entries from old files
      for ((nodeId, oldPaths) <- op.supersededPaths; oldPath <- oldPaths
           if oldPath.normalize != op.targetFile.normalize) {
        val node = manifest.get(nodeId).get
        val old = YamlIO.read(oldPath)
        val section = if (node.resourceType == "seed") "seeds" else "models"
        val entries = old.managed.getOrElse(section, Nil) match {
          case s: Seq[_] => s.collect { case e: Map[_, _] => e.asInstanceOf[Map[String, Any]] }
          case _ => Nil
        }
        // entries are written under the BASE name (versioned models
        // share one entry with a versions[] block — SyncOperations
        // .entryName), so the strip must match the same key or a
        // moved foo_v2/foo_v3 model would leave a stale 'foo' entry
        // behind and every organize re-plans the same move
        val remaining = entries.filterNot(
          _.get("name").contains(SyncOperations.entryName(node)))
        if (remaining.size != entries.size) {
          val managed =
            if (remaining.isEmpty) old.managed - section
            else old.managed.updated(section, remaining)
          YamlIO.buffer(oldPath, old.copy(managed = ListMap(managed.toSeq: _*)))
        }
      }
    }
    if (dryRun) return (m, Nil)
    val written = YamlIO.commit()

    // delete files whose managed payload vanished and nothing preserved
    for (path <- written if Files.exists(path)) {
      val doc = YamlIO.read(path)
      val payload = doc.managed - "version"
      if (payload.isEmpty && doc.preserved.isEmpty) {
        Files.delete(path)
        YamlIO.invalidate()
        Option(path.getParent).foreach { dir =>
          if (Files.isDirectory(dir) && !Files.list(dir).iterator().hasNext)
            Files.delete(dir)
        }
      }
    }
    (m, written)
  }
}
