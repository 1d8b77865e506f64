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
      terminology: Seq[(String, Int)], // recurring domain words
      /** Tone counts (voice_learning.py:194-238): imperative /
        * passive / concise / detailed / technical.
        */
      toneMarkers: Map[String, Int] = Map.empty,
      /** preferred term → the alternative it beats
        * (voice_learning.py:154-191).
        */
      terminologyPreferences: Map[String, String] = Map.empty,
      modelDescriptionSamples: Seq[String] = Nil,
      columnDescriptionSamples: Seq[String] = Nil) {

    /** Render for an LLM prompt (voice_learning.py:48-89): style
      * guidelines + few-shot examples.
      */
    def toPromptContext(maxExamples: Int = 3): String = {
      val sections = scala.collection.mutable.ArrayBuffer[String]()
      if (nDescriptions > 0)
        sections += f"- Target description length: ~${meanLength}%.0f chars (median $medianLength)"
      if (commonPhrases.nonEmpty)
        sections += s"- Common phrases: ${commonPhrases.take(5).map(_._1).mkString(", ")}"
      if (terminologyPreferences.nonEmpty) {
        sections += "- Terminology preferences:"
        terminologyPreferences.take(3).foreach { case (pref, alt) =>
          sections += s"  - Use '$pref' instead of '$alt'"
        }
      }
      if (modelDescriptionSamples.nonEmpty) {
        sections += "\n# Model Description Examples:"
        modelDescriptionSamples.take(maxExamples).zipWithIndex.foreach { case (e, i) =>
          sections += s"${i + 1}. $e"
        }
      }
      if (columnDescriptionSamples.nonEmpty) {
        sections += "\n# Column Description Examples:"
        columnDescriptionSamples.take(maxExamples).zipWithIndex.foreach { case (e, i) =>
          sections += s"${i + 1}. $e"
        }
      }
      if (sections.isEmpty) "No style information available."
      else sections.mkString("\n")
    }
  }

  /** Tone indicators (voice_learning.py:194-238). */
  private[core] def detectToneMarkers(descriptions: Seq[String]): Map[String, Int] = {
    val imperativeVerbs = Seq("contains", "represents", "stores", "holds", "tracks", "records")
    val passivePatterns = Seq("is used to", "is a", "contains a", "represents a")
    val techTerms = Seq("id", "key", "fk", "pk", "timestamp", "json", "uuid", "integer", "varchar")
    var m = Map("imperative" -> 0, "passive" -> 0, "concise" -> 0,
      "detailed" -> 0, "technical" -> 0)
    def inc(k: String): Unit = m += k -> (m(k) + 1)
    for (d <- descriptions if d.trim.nonEmpty) {
      val lower = d.toLowerCase
      val wc = d.split("\\s+").length
      if (wc <= 5) inc("concise") else if (wc >= 15) inc("detailed")
      if (imperativeVerbs.exists(lower.contains)) inc("imperative")
      if (passivePatterns.exists(lower.contains)) inc("passive")
      if (techTerms.exists(lower.contains)) inc("technical")
    }
    m
  }

  /** Terminology preferences: which of each variation family the
    * project actually uses (voice_learning.py:154-191).
    */
  private[core] def detectTerminology(descriptions: Seq[String]): Map[String, String] = {
    val variations = Seq(
      Seq("user", "customer", "client", "account"),
      Seq("id", "identifier", "key"),
      Seq("email", "email address", "e-mail"),
      Seq("timestamp", "datetime", "created at", "updated at"),
      Seq("foreign key", "reference", "ref"),
      Seq("primary key", "main id", "unique identifier"))
    val all = descriptions.mkString(" ").toLowerCase
    def count(t: String): Int = all.sliding(t.length).count(_ == t)
    (for {
      family <- variations
      preferred = family.head
      pc = count(preferred)
      alt <- family.tail
      if pc > count(alt) && pc >= 2
    } yield preferred -> alt).toMap
  }

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
    val modelDescs = manifest.nodes.values.toSeq.map(_.description)
      .filter(d => Discovery.isDocumented(Some(d)))
    val colDescs = manifest.nodes.values.toSeq
      .flatMap(_.columns.values.flatMap(_.description))
      .filter(d => Discovery.isDocumented(Some(d)))
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
      terminology = terms,
      toneMarkers = detectToneMarkers(docs),
      terminologyPreferences = detectTerminology(colDescs),
      modelDescriptionSamples = modelDescs.take(10),
      columnDescriptionSamples = colDescs.take(20))
  }

  /** Few-shot style examples for LLM prompts
    * (voice_learning.py:367-410): similar-node targeted when a target
    * is given, general project samples otherwise.
    */
  def extractStyleExamples(manifest: Manifest, target: Option[NodeMeta],
      maxExamples: Int = 3): Map[String, Seq[String]] = target match {
    case Some(t) =>
      val similar = similarDocumentedNodes(manifest, t, maxExamples)
      Map(
        "model_descriptions" -> similar
          .filter(n => Discovery.isDocumented(Some(n.description)))
          .map(n => s"# ${n.name}\n${n.description}"),
        "column_descriptions" -> similar.flatMap(_.columns.values.take(3))
          .flatMap(c => c.description.filter(d => Discovery.isDocumented(Some(d)))
            .map(d => s"- ${c.name}: $d")))
    case None =>
      val profile = analyze(manifest)
      Map(
        "model_descriptions" -> profile.modelDescriptionSamples.take(maxExamples)
          .zipWithIndex.map { case (d, i) => s"# Example ${i + 1}\n$d" },
        "column_descriptions" -> profile.columnDescriptionSamples.take(maxExamples)
          .map(d => s"- $d"))
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
