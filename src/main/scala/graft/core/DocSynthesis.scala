package graft.core

import scala.collection.immutable.ListMap

/** LLM documentation synthesis scaffolding (A42; reference
  * core/llm.py:537-720 + core/transforms.py:647-850).
  *
  * Everything network-shaped is behind [[DocSynthesis.LlmClient]] —
  * one `complete(system, user)` method — so the orchestration
  * (context windowing, bulk-vs-individual strategy, topological
  * knowledge reuse, retry policy, credential redaction, response
  * parsing) is fully testable with a mock client and carries no
  * provider dependency. Wiring a real provider is a deployment
  * concern, exactly as the reference gates it behind an extra.
  */
object DocSynthesis {

  /** Minimal chat-completion client surface. */
  trait LlmClient {
    def complete(systemPrompt: String, userPrompt: String): String
  }

  final case class LlmResponseError(message: String) extends RuntimeException(message)

  /** Retryable rate-limit signal; `retryAfterSeconds` mirrors an HTTP
    * Retry-After header when the provider supplies one.
    */
  final case class RateLimited(retryAfterSeconds: Option[Double] = None)
      extends RuntimeException("rate limited")

  /** Exponential-backoff retry (reference core/llm.py:68-130): retries
    * only [[RateLimited]], honoring `retryAfterSeconds` over the
    * computed delay; other errors propagate immediately. The sleeper
    * is injected for testability.
    */
  def callWithRetry[A](f: () => A, maxRetries: Int = 5, initialDelay: Double = 1.0,
      sleeper: Double => Unit = s => Thread.sleep((s * 1000).toLong)): A = {
    var attempt = 0
    var delay = initialDelay
    while (true) {
      try return f()
      catch {
        case r: RateLimited =>
          attempt += 1
          if (attempt > maxRetries)
            throw LlmResponseError(s"rate limited after $maxRetries retries")
          sleeper(r.retryAfterSeconds.getOrElse(delay))
          delay *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Strip credential-looking substrings before text reaches a prompt
    * or a log line (reference core/llm.py:133-170).
    */
  def redactCredentials(text: String): String =
    if (text == null || text.isEmpty) text
    else text
      .replaceAll("(?i)(api[_-]?key\\s*[=:]\\s*)\\S+", "$1[REDACTED]")
      .replaceAll("(?i)(password\\s*[=:]\\s*)\\S+", "$1[REDACTED]")
      .replaceAll("(?i)(secret\\s*[=:]\\s*)\\S+", "$1[REDACTED]")
      .replaceAll("(?i)(token\\s*[=:]\\s*)\\S+", "$1[REDACTED]")
      .replaceAll("\\bsk-[A-Za-z0-9_-]{8,}", "[REDACTED]")

  /** Bound the SQL shipped in a prompt (reference truncates via
    * OSMOSIS_LLM_MAX_SQL_CHARS at core/llm.py:388,511).
    */
  def truncateSql(sql: String, maxChars: Option[Int]): String = maxChars match {
    case Some(m) if sql.length > m =>
      sql.take(m) + s"\n-- (truncated ${sql.length - m} chars)"
    case _ => sql
  }

  /** Upstream documentation context with the reference's windowing
    * (core/transforms.py:647-690): at most ~20 columns per upstream
    * node, at most ~100 lines total with a remaining-nodes note, and
    * a placeholder line when nothing is documented.
    */
  def collectUpstreamDocs(manifest: Manifest, node: NodeMeta,
      placeholders: Set[String]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String](
      "# The following is not exhaustive, but provides some context.")
    val deps = node.deps
    var truncated = false
    for ((uid, i) <- deps.zipWithIndex if !truncated) {
      manifest.get(uid).foreach { dep =>
        out += s"$uid: # ${dep.description.replace("\n", " ")}"
        var emitted = 0
        val it = dep.columns.valuesIterator
        var elided = false
        while (it.hasNext && !elided) {
          val c = it.next()
          c.description.filter(d => d.nonEmpty && !placeholders(d)).foreach { d =>
            out += s"- ${c.name}: |\n  ${d.replace("\n", "\n  ")}"
          }
          emitted += 1
          if (emitted > 20 && it.hasNext) {
            out += "- (omitting additional columns for brevity)"
            elided = true
          }
        }
      }
      if (out.length > 100 && i < deps.length - 1) {
        out += s"# remaining nodes are: ${deps.drop(i).mkString(", ")}"
        truncated = true
      }
    }
    if (out.length == 1) Seq("(no upstream documentation found)") else out.toSeq
  }

  final case class ColumnSpec(name: String, description: String)
  final case class ModelSpec(description: Option[String], columns: Seq[ColumnSpec])

  /** Strip optional markdown fences around a JSON payload. */
  private[core] def stripFences(s: String): String = {
    val t = s.trim
    if (t.startsWith("```")) {
      val body = t.dropWhile(_ != '\n').drop(1)
      val end = body.lastIndexOf("```")
      (if (end >= 0) body.substring(0, end) else body).trim
    } else t
  }

  /** Parse the bulk-synthesis JSON contract
    * `{"description": ..., "columns": [{"name","description"}]}`
    * (reference core/llm.py:537-593). Uses the Jackson shipped with
    * Spark — no extra dependency.
    */
  def parseModelSpec(raw: String): ModelSpec = {
    if (raw == null || raw.trim.isEmpty)
      throw LlmResponseError("LLM returned an empty response")
    val text = stripFences(raw)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root =
      try mapper.readTree(text)
      catch { case e: Exception =>
        throw LlmResponseError(s"LLM returned invalid JSON: ${e.getMessage}")
      }
    if (root == null || !root.isObject)
      throw LlmResponseError("LLM returned invalid JSON: not an object")
    val desc = Option(root.get("description")).filter(_.isTextual).map(_.asText)
    val cols = Option(root.get("columns")).filter(_.isArray).map { arr =>
      (0 until arr.size).flatMap { i =>
        val c = arr.get(i)
        for {
          n <- Option(c.get("name")).filter(_.isTextual).map(_.asText)
          d <- Option(c.get("description")).filter(_.isTextual).map(_.asText)
        } yield ColumnSpec(n, d)
      }
    }.getOrElse(Nil)
    ModelSpec(desc, cols)
  }

  private def nodeSql(node: NodeMeta): String =
    node.compiledCode.getOrElse(
      s"SELECT ${node.columns.keys.mkString(", ")} FROM ${node.schema}.${node.name}")

  /** Bulk spec generation: one request documents the whole model. */
  def generateModelSpec(client: LlmClient, node: NodeMeta, upstreamDocs: Seq[String],
      maxSqlChars: Option[Int] = None): ModelSpec = {
    val sys = "You are a data documentation assistant. Reply ONLY with JSON " +
      "{\"description\": string, \"columns\": [{\"name\": string, \"description\": string}]}."
    val user =
      s"""SQL:
         |${truncateSql(redactCredentials(nodeSql(node)), maxSqlChars)}
         |Upstream docs:
         |${upstreamDocs.mkString("\n")}
         |Existing context:
         |NodeId=${node.uniqueId}
         |TableDescription=${node.description}""".stripMargin
    parseModelSpec(callWithRetry(() => client.complete(sys, user)))
  }

  /** Single table-description generation. */
  def generateTableDoc(client: LlmClient, node: NodeMeta, upstreamDocs: Seq[String],
      maxSqlChars: Option[Int] = None): String = {
    val out = callWithRetry(() => client.complete(
      "Write a concise table description. Reply with prose only.",
      s"""Table ${node.name}
         |SQL:
         |${truncateSql(redactCredentials(nodeSql(node)), maxSqlChars)}
         |Upstream docs:
         |${upstreamDocs.mkString("\n")}""".stripMargin))
    if (out == null || out.trim.isEmpty)
      throw LlmResponseError("LLM returned an empty response")
    out.trim
  }

  /** Single column-description generation. */
  def generateColumnDoc(client: LlmClient, node: NodeMeta, column: ColumnMeta,
      upstreamDocs: Seq[String]): String = {
    val out = callWithRetry(() => client.complete(
      "Write a concise column description. Reply with prose only.",
      s"""Column ${column.name}
         |DataType=${column.dataType.getOrElse("unknown")}
         |ColumnParent=${node.uniqueId}
         |TableDescription=${node.description}
         |Upstream docs:
         |${upstreamDocs.mkString("\n")}""".stripMargin))
    if (out == null || out.trim.isEmpty)
      throw LlmResponseError("LLM returned an empty response")
    out.trim
  }

  private def undocumented(c: ColumnMeta, placeholders: Set[String]): Boolean =
    c.description.forall(d => d.isEmpty || placeholders(d))

  /** Threshold above which one bulk request replaces per-column
    * requests (reference core/transforms.py:846-850).
    */
  val BulkThreshold: Int = 10

  /** Synthesize missing docs for one node: inherit upstream knowledge
    * first (so already-known descriptions never hit the client), then
    * bulk-synthesize when more than [[BulkThreshold]] columns remain
    * undocumented, else fill the node description plus each column
    * individually. Only empty/placeholder descriptions are replaced.
    */
  def synthesizeNode(manifest: Manifest, node: NodeMeta, settings: EngineSettings,
      client: LlmClient, maxSqlChars: Option[Int] = None): NodeMeta = {
    val inherited = Inheritance.inheritUpstreamColumnKnowledge(manifest, node, settings)
    if (inherited.columns.isEmpty) return inherited
    val missing = inherited.columns.values.count(undocumented(_, settings.placeholders))
    val docs = collectUpstreamDocs(manifest, inherited, settings.placeholders)
    if (missing > BulkThreshold) {
      val spec = generateModelSpec(client, inherited, docs, maxSqlChars)
      val desc =
        if (inherited.description.isEmpty || settings.placeholders(inherited.description))
          spec.description.getOrElse(inherited.description)
        else inherited.description
      val byName = spec.columns.map(c => c.name -> c.description).toMap
      val cols = inherited.columns.map { case (n, c) =>
        n -> (if (undocumented(c, settings.placeholders) && byName.contains(c.name))
          c.copy(description = Some(byName(c.name))) else c)
      }
      inherited.copy(description = desc, columns = ListMap(cols.toSeq: _*))
    } else {
      val desc =
        if (inherited.description.isEmpty || settings.placeholders(inherited.description))
          generateTableDoc(client, inherited, docs, maxSqlChars)
        else inherited.description
      val withDesc = inherited.copy(description = desc)
      val cols = withDesc.columns.map { case (n, c) =>
        n -> (if (undocumented(c, settings.placeholders))
          c.copy(description = Some(generateColumnDoc(client, withDesc, c, docs)))
        else c)
      }
      withDesc.copy(columns = ListMap(cols.toSeq: _*))
    }
  }

  /** Synthesize across candidate models in topological order, folding
    * each synthesized node back into the manifest so downstream nodes
    * INHERIT freshly synthesized upstream docs instead of re-asking
    * the client (reference core/transforms.py:823-830 — "minimizes
    * synthesis requests, in some cases by an order of magnitude").
    */
  def synthesizeAll(manifest: Manifest, settings: EngineSettings, client: LlmClient,
      filter: NodeFilters.NodeFilter = NodeFilters.NodeFilter(),
      maxSqlChars: Option[Int] = None): Manifest = {
    val ordered = NodeFilters.topologicalSort(NodeFilters.candidates(manifest, filter))
    ordered.foldLeft(manifest) { (m, n) =>
      m.updated(synthesizeNode(m, m.get(n.uniqueId).getOrElse(n), settings, client, maxSqlChars))
    }
  }
}
