package graft.core

import scala.collection.mutable

/** Candidate selection + deterministic scheduling over the manifest
  * DAG. Reference: core/node_filters.py (A10 filter at :113-150,
  * A11 Kahn topological sort at :61-110).
  */
object NodeFilters {

  final case class NodeFilter(
      packageName: Option[String] = None,
      /** FQN segment-prefix patterns, e.g. "staging.stg_customers". */
      fqnPrefixes: Seq[String] = Nil,
      /** File-path patterns: exact file, directory prefix, or name. */
      pathPatterns: Seq[String] = Nil,
      /** Exclude cross-project (dbt-loom-injected) nodes from the
        * candidate set unless [[includeExternal]] — the reference's
        * package gate (node_filters.py:128) re-expressed on the
        * injection marker, which is what actually distinguishes an
        * external node here.
        */
      includeExternal: Boolean = false)

  /** FQN prefix match: pattern segments must equal the head of the
    * node's fqn (sans package/root segment). Reference :21-33.
    */
  private[core] def fqnMatches(fqn: Seq[String], pattern: String): Boolean = {
    val segments = pattern.split('.')
    val tail = if (fqn.size > 1) fqn.tail else fqn // drop package segment
    segments.zip(tail).forall { case (p, f) => p == f } &&
      segments.length <= tail.size
  }

  private[core] def pathMatches(node: NodeMeta, pattern: String): Boolean = {
    val candidates = Seq(Some(node.path), node.patchPath).flatten
    candidates.exists { p =>
      p == pattern || p.startsWith(pattern.stripSuffix("/") + "/") ||
        p.split('/').lastOption.contains(pattern) ||
        node.name == pattern
    }
  }

  /** Select models/seeds/sources eligible for transforms: in-package,
    * non-ephemeral, matching any provided fqn/path patterns.
    */
  def candidates(manifest: Manifest, filter: NodeFilter = NodeFilter()): Seq[NodeMeta] =
    manifest.nodes.values.iterator.filter { n =>
      (n.resourceType == "model" || n.resourceType == "seed" || n.resourceType == "source") &&
        !n.isEphemeral &&
        (filter.includeExternal || !n.isLoomInjected) &&
        filter.packageName.forall(_ == n.packageName) &&
        (filter.fqnPrefixes.isEmpty || filter.fqnPrefixes.exists(fqnMatches(n.fqn, _))) &&
        (filter.pathPatterns.isEmpty || filter.pathPatterns.exists(pathMatches(n, _)))
    }.toSeq

  /** Kahn topological sort restricted to the given nodes; edges are
    * deps within the set. Deterministic (ready queue kept sorted).
    * Throws on cycles, as the reference errors out.
    */
  def topologicalSort(nodes: Seq[NodeMeta]): Seq[NodeMeta] = {
    val byId = nodes.map(n => n.uniqueId -> n).toMap
    val inDegree = mutable.Map(nodes.map(n =>
      n.uniqueId -> n.deps.count(byId.contains)): _*)
    val dependents = mutable.Map.empty[String, mutable.ListBuffer[String]]
    for (n <- nodes; d <- n.deps if byId.contains(d))
      dependents.getOrElseUpdate(d, mutable.ListBuffer.empty) += n.uniqueId

    val ready = mutable.SortedSet.empty[String]
    inDegree.foreach { case (uid, d) => if (d == 0) ready += uid }
    val out = mutable.ListBuffer.empty[NodeMeta]
    while (ready.nonEmpty) {
      val uid = ready.head
      ready -= uid
      out += byId(uid)
      for (dep <- dependents.getOrElse(uid, Nil)) {
        inDegree(dep) -= 1
        if (inDegree(dep) == 0) ready += dep
      }
    }
    if (out.size != nodes.size)
      throw new IllegalStateException(
        s"cycle detected among: ${inDegree.filter(_._2 > 0).keys.toSeq.sorted.mkString(", ")}")
    out.toSeq
  }

  /** Ancestor tree: node + upstream DAG flattened into generation
    * buckets {0 -> [self], 1 -> [parents], ...}, DFS with visited-set
    * cycle guard, depth cap 100, sorted generations.
    * Reference: core/inheritance.py:290-339.
    */
  def ancestorTree(manifest: Manifest, node: NodeMeta, maxDepth: Int = 100): Map[Int, Seq[String]] = {
    val tree = mutable.Map(0 -> mutable.ListBuffer(node.uniqueId))
    val visited = mutable.Set(node.uniqueId)

    def walk(n: NodeMeta, depth: Int): Unit = {
      if (depth > maxDepth) return
      for (dep <- n.deps
           if dep.startsWith("model.") || dep.startsWith("seed.") || dep.startsWith("source.")
           if !visited.contains(dep)) {
        visited += dep
        manifest.get(dep).foreach { member =>
          tree.getOrElseUpdate(depth, mutable.ListBuffer.empty) += dep
          walk(member, depth + 1)
        }
      }
    }
    walk(node, 1)
    tree.view.mapValues(_.toSeq.sorted).toMap
  }
}
