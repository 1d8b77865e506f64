package graft.core

/** Documentation voice/style learning (A41; core/voice_learning.py):
  * aggregate stylistic signals from a project's existing descriptions
  * — length statistics, common phrases, terminology, tone markers —
  * and retrieve similar documented nodes for few-shot examples. Feeds
  * the (pluggable) doc-synthesis extension.
  */
object VoiceLearning {

  final case class StyleProfile(
      nDescriptions: Int,
      meanLength: Double,
      medianLength: Int,
      usesSentenceCase: Double, // fraction starting upper-case
      endsWithPeriod: Double,
      commonPhrases: Seq[(String, Int)], // top bigrams
      terminology: Seq[(String, Int)]) // recurring domain words

  private val StopSet: Set[String] =
    graft.functions.TextFunctions.Stopwords.toSet

  private def descriptions(manifest: Manifest): Seq[String] = (for {
    node <- manifest.nodes.values.toSeq
    desc <- node.description +: node.columns.values.toSeq.flatMap(_.description)
    if Discovery.isDocumented(Some(desc))
  } yield desc.trim).filter(_.nonEmpty)

  def analyze(manifest: Manifest, topK: Int = 10): StyleProfile = {
    val docs = descriptions(manifest)
    if (docs.isEmpty) return StyleProfile(0, 0.0, 0, 0.0, 0.0, Nil, Nil)
    val lengths = docs.map(_.length).sorted
    val tokensPerDoc = docs.map(_.toLowerCase.split("[^a-z0-9_]+").filter(_.nonEmpty).toSeq)

    val bigrams = tokensPerDoc.flatMap(ts => ts.sliding(2).filter(_.size == 2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size).toSeq
      .filter(_._2 > 1).sortBy { case (p, n) => (-n, p) }.take(topK)
    val terms = tokensPerDoc.flatten
      .filterNot(StopSet).filter(_.length > 3)
      .groupBy(identity).view.mapValues(_.size).toSeq
      .filter(_._2 > 1).sortBy { case (t, n) => (-n, t) }.take(topK)

    StyleProfile(
      nDescriptions = docs.size,
      meanLength = lengths.sum.toDouble / docs.size,
      medianLength = lengths(lengths.size / 2),
      usesSentenceCase = docs.count(d => d.head.isUpper).toDouble / docs.size,
      endsWithPeriod = docs.count(_.endsWith(".")).toDouble / docs.size,
      commonPhrases = bigrams,
      terminology = terms)
  }

  /** Similar documented nodes for few-shot context: rank by shared
    * column names + name similarity (reference similar-node retrieval).
    */
  def similarDocumentedNodes(manifest: Manifest, target: NodeMeta,
      k: Int = 3): Seq[NodeMeta] =
    manifest.models.toSeq
      .filter(n => n.uniqueId != target.uniqueId &&
        n.columns.values.exists(c => Discovery.isDocumented(c.description)))
      .map { n =>
        val shared = (n.columns.keySet & target.columns.keySet).size
        val nameSim = Fuzzy.wratio(n.name, target.name)
        (n, shared * 10 + nameSim)
      }
      .sortBy { case (n, score) => (-score, n.uniqueId) }
      .take(k).map(_._1)
}
