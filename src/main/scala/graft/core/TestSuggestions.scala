package graft.core

/** Test-pattern mining + heuristic suggestion (A40;
  * core/test_suggestions.py): bucket columns by name pattern and
  * dtype, count which generic tests teams attach to each bucket, and
  * suggest tests for undocumented columns from the mined frequencies
  * (falling back to built-in heuristics when the project has no
  * history).
  */
object TestSuggestions {

  final case class ExistingTest(nodeId: String, column: String, test: String)
  final case class Suggestion(nodeId: String, column: String, test: String,
      confidence: Double, reason: String)

  /** Name-pattern buckets (reference's pattern table: `*_id`,
    * `*_date`, `is_*`, ...).
    */
  val NamePatterns: Seq[(String, String => Boolean)] = Seq(
    "primary_id" -> (n => n == "id" || n.endsWith("_id") && n.startsWith("id") == false),
    "foreign_key" -> (_.endsWith("_key")),
    "date" -> (n => n.endsWith("_date") || n.endsWith("_at") || n == "date"),
    "boolean_flag" -> (n => n.startsWith("is_") || n.startsWith("has_")),
    "status" -> (n => n == "status" || n.endsWith("_status")),
    "email" -> (_.contains("email")),
    "amount" -> (n => n.endsWith("amount") || n.endsWith("price") || n.endsWith("total")))

  /** Built-in heuristics: bucket → suggested generic tests. */
  val Heuristics: Map[String, Seq[String]] = Map(
    "primary_id" -> Seq("unique", "not_null"),
    "foreign_key" -> Seq("not_null"),
    "date" -> Seq("not_null"),
    "boolean_flag" -> Seq("not_null", "accepted_values:[true,false]"),
    "status" -> Seq("not_null", "accepted_values"),
    "email" -> Seq("not_null", "unique"),
    "amount" -> Seq("not_null"))

  def bucketOf(column: String): Option[String] = {
    val lower = column.toLowerCase
    NamePatterns.collectFirst { case (bucket, p) if p(lower) => bucket }
  }

  /** Frequency-mine existing tests: bucket → test → count, with top-k
    * per bucket (reference Counter + top-k,
    * core/test_suggestions.py:152-342).
    */
  def minePatterns(existing: Seq[ExistingTest], topK: Int = 3): Map[String, Seq[(String, Int)]] =
    existing
      .flatMap(t => bucketOf(t.column).map(b => (b, t.test)))
      .groupBy(_._1)
      .view.mapValues(ts =>
        ts.groupBy(_._2).view.mapValues(_.size).toSeq
          .sortBy { case (test, n) => (-n, test) }.take(topK))
      .toMap

  /** LLM-backed suggester (core/test_suggestions.py:345-586) behind
    * the same pluggable client as doc synthesis: prompt carries the
    * model SQL, column list, and the project's MINED patterns (so the
    * model learns house conventions); the response is a JSON object
    * `{column: [test | {test_type, reason, config}]}`. Any failure —
    * transport, empty response, unparseable JSON — falls back to the
    * pattern/heuristic path, matching the reference's behavior.
    */
  def suggestWithClient(manifest: Manifest, node: NodeMeta,
      existing: Seq[ExistingTest], client: DocSynthesis.LlmClient): Seq[Suggestion] = {
    val minedContext = minePatterns(existing).map { case (b, fs) =>
      s"$b: ${fs.map { case (t, n) => s"$t($n)" }.mkString(", ")}"
    }.mkString("\n")
    val user =
      s"""Model ${node.name}
         |SQL:
         |${DocSynthesis.redactCredentials(node.compiledCode.getOrElse(node.rawCode))}
         |Columns: ${node.columns.keys.mkString(", ")}
         |Project test patterns:
         |$minedContext""".stripMargin
    try {
      val raw = DocSynthesis.callWithRetry(() => client.complete(
        "Suggest dbt generic tests per column. Reply ONLY with JSON " +
          "{column: [test-name | {\"test_type\": .., \"reason\": .., \"config\": {..}}]}.",
        user))
      if (raw == null || raw.trim.isEmpty)
        throw DocSynthesis.LlmResponseError("LLM returned an empty response")
      val text = DocSynthesis.stripFences(raw)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val root = mapper.readTree(text)
      if (root == null || !root.isObject)
        throw DocSynthesis.LlmResponseError("not an object")
      val out = scala.collection.mutable.ListBuffer.empty[Suggestion]
      root.fields().forEachRemaining { e =>
        val colName = e.getKey
        if (node.columns.contains(colName) && e.getValue.isArray) {
          (0 until e.getValue.size).foreach { i =>
            val v = e.getValue.get(i)
            if (v.isTextual)
              out += Suggestion(node.uniqueId, colName, v.asText, 0.8, "AI suggested")
            else if (v.isObject && v.has("test_type"))
              out += Suggestion(node.uniqueId, colName, v.get("test_type").asText, 0.8,
                Option(v.get("reason")).filter(_.isTextual).map(_.asText)
                  .getOrElse("AI suggested"))
          }
        }
      }
      out.toSeq
    } catch {
      case _: Exception =>
        // fall back to the pattern/heuristic path (reference :455-462),
        // restricted to this node but mined over the full manifest
        val m = if (manifest.get(node.uniqueId).isDefined) manifest
                else Manifest(Seq(node))
        suggest(m, existing).filter(_.nodeId == node.uniqueId)
    }
  }

  /** Suggest tests for columns lacking them: mined frequencies first
    * (confidence = relative frequency), then heuristics (0.5).
    */
  def suggest(manifest: Manifest, existing: Seq[ExistingTest]): Seq[Suggestion] = {
    val mined = minePatterns(existing)
    val tested = existing.map(t => (t.nodeId, t.column, t.test)).toSet
    for {
      node <- manifest.models.toSeq
      column <- node.columns.values.toSeq
      bucket <- bucketOf(column.name).toSeq
      (test, confidence, reason) <- mined.get(bucket) match {
        case Some(freqs) if freqs.nonEmpty =>
          val total = freqs.map(_._2).sum.toDouble
          freqs.map { case (t, n) => (t, n / total, s"mined from $bucket usage ($n/$total)") }
        case _ =>
          Heuristics.getOrElse(bucket, Nil).map(t => (t, 0.5, s"heuristic for $bucket"))
      }
      if !tested.contains((node.uniqueId, column.name, test))
    } yield Suggestion(node.uniqueId, column.name, test, confidence, reason)
  }
}
