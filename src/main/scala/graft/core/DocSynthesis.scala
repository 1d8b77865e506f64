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

  /** Deterministic offline client backing CLI `--synthesize` when no
    * provider is configured (the reference hard-requires its OpenAI
    * extra there, cli/main.py:420-424; zero-egress we degrade to a
    * name/dtype templater so the whole orchestration path — bulk
    * threshold, topological reuse, placeholder policy, YAML write —
    * still runs end-to-end). Replies key off the synthesis prompts'
    * own shapes: JSON for the bulk model-spec request, prose for the
    * table/column requests. A real provider replaces this by
    * implementing [[LlmClient]]; nothing else changes.
    */
  object HeuristicClient extends LlmClient {
    private[core] def humanize(name: String): String = {
      val words = name.split("[_\\s]+").filter(_.nonEmpty).map(_.toLowerCase)
      val expanded = words.map {
        case "id" => "identifier"
        case "qty" => "quantity"
        case "amt" => "amount"
        case "ts" => "timestamp"
        case "num" | "nbr" => "number"
        case w => w
      }
      expanded.mkString(" ").capitalize
    }

    private def firstMatch(re: scala.util.matching.Regex, s: String): Option[String] =
      re.findFirstMatchIn(s).map(_.group(1))

    def complete(systemPrompt: String, userPrompt: String): String =
      if (systemPrompt.contains("Reply ONLY with JSON") &&
        systemPrompt.contains("columns")) {
        // bulk model spec: columns are recoverable only from the
        // introspection-fallback SELECT; otherwise document the table
        // and let the per-column path fill the rest on the next pass
        val table = firstMatch("NodeId=\\S*?\\.(\\S+)".r, userPrompt)
          .getOrElse("table")
        val cols = firstMatch("(?s)SQL:\\s*SELECT (.*?) FROM ".r, userPrompt)
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Nil)
        val colJson = cols.map(c =>
          s"""{"name": "$c", "description": "${humanize(c)}."}""").mkString(", ")
        s"""{"description": "${humanize(table)}.", "columns": [$colJson]}"""
      } else if (userPrompt.startsWith("Column ")) {
        val name = firstMatch("Column (\\S+)".r, userPrompt).getOrElse("column")
        val dtype = firstMatch("DataType=(\\S+)".r, userPrompt)
          .filter(_ != "unknown").map(d => s" ($d)").getOrElse("")
        s"${humanize(name)}$dtype."
      } else {
        val name = firstMatch("(?m)^(?:Table|table) (\\S+)".r, userPrompt)
          .getOrElse("table")
        s"${humanize(name)}."
      }
  }

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
        out += s"# remaining nodes are: ${deps.drop(i + 1).mkString(", ")}"
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

  // ---- NL → SQL / NL → model (core/llm.py:1105-1300) ----

  /** Extract SQL from a possibly-markdown-fenced response: content of
    * the first ```sql block, or the whole trimmed text.
    */
  private[core] def extractSql(raw: String): String = {
    val t = raw.trim
    if (!t.startsWith("```")) t
    else {
      val lines = t.linesIterator.toSeq
      val body = lines.dropWhile(l => !l.toLowerCase.startsWith("```sql"))
      val inner =
        if (body.nonEmpty) body.drop(1).takeWhile(!_.startsWith("```"))
        else lines.drop(1).takeWhile(!_.startsWith("```"))
      inner.mkString("\n").trim
    }
  }

  private def sourcesContext(availableSources: Seq[(String, Seq[String])]): String =
    if (availableSources.isEmpty) "(none listed)"
    else availableSources.map { case (n, cols) =>
      s"- $n(${cols.mkString(", ")})"
    }.mkString("\n")

  /** Natural language → SQL with dbt refs (llm.py:1105-1157). */
  def generateSqlFromNl(client: LlmClient, query: String,
      availableSources: Seq[(String, Seq[String])] = Nil,
      schemaContext: Option[String] = None): String = {
    val out = callWithRetry(() => client.complete(
      "Translate the request into a single SQL query using dbt " +
        "{{ ref('...') }} / {{ source('...','...') }} relations. Reply with SQL only.",
      s"""Request: ${redactCredentials(query)}
         |Available relations:
         |${sourcesContext(availableSources)}
         |${schemaContext.map(c => s"Schema context:\n$c").getOrElse("")}""".stripMargin))
    if (out == null || out.trim.isEmpty)
      throw LlmResponseError("LLM returned an empty response")
    extractSql(out)
  }

  final case class NlModelSpec(
      modelName: String, description: String, sql: String,
      materialized: String, columns: Seq[ColumnSpec])

  /** Natural language → complete dbt model spec (llm.py:1159-1300):
    * `{model_name, description, sql, materialized, columns[]}`.
    */
  def generateModelFromNl(client: LlmClient, query: String,
      availableSources: Seq[(String, Seq[String])] = Nil,
      schemaContext: Option[String] = None): NlModelSpec = {
    val raw = callWithRetry(() => client.complete(
      "Design a dbt model for the request. Reply ONLY with JSON " +
        "{\"model_name\", \"description\", \"sql\", \"materialized\", " +
        "\"columns\": [{\"name\", \"description\"}]}.",
      s"""Request: ${redactCredentials(query)}
         |Available relations:
         |${sourcesContext(availableSources)}
         |${schemaContext.map(c => s"Schema context:\n$c").getOrElse("")}""".stripMargin))
    if (raw == null || raw.trim.isEmpty)
      throw LlmResponseError("LLM returned an empty response")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root =
      try mapper.readTree(stripFences(raw))
      catch { case e: Exception =>
        throw LlmResponseError(s"LLM returned invalid JSON: ${e.getMessage}")
      }
    if (root == null || !root.isObject)
      throw LlmResponseError("LLM returned invalid JSON: not an object")
    def str(k: String, dflt: String = ""): String =
      Option(root.get(k)).filter(_.isTextual).map(_.asText).getOrElse(dflt)
    val mat = str("materialized", "view")
    val validMat = Set("table", "view", "incremental", "ephemeral")
    val cols = Option(root.get("columns")).filter(_.isArray).map { arr =>
      (0 until arr.size).flatMap { i =>
        val c = arr.get(i)
        for {
          n <- Option(c.get("name")).filter(_.isTextual).map(_.asText)
        } yield ColumnSpec(n,
          Option(c.get("description")).filter(_.isTextual).map(_.asText).getOrElse(""))
      }
    }.getOrElse(Nil)
    NlModelSpec(str("model_name", "generated_model"), str("description"),
      extractSql(str("sql")), if (validMat(mat)) mat else "view", cols)
  }

  // ---- semantic analysis (core/llm.py:790-857, transforms.py:853-990) ----

  final case class SemanticAnalysis(
      semanticType: String,
      businessMeaning: String,
      inferredRelationship: Option[String],
      description: Option[String],
      tags: Seq[String],
      meta: Map[String, String])

  /** Analyze one column's business semantics via the client:
    * `{semantic_type, business_meaning, inferred_relationship,
    * description, tags[], meta{}}`.
    */
  def analyzeColumnSemantics(client: LlmClient, node: NodeMeta, column: ColumnMeta,
      upstreamColumns: Seq[(String, String)] = Nil): SemanticAnalysis = {
    val raw = callWithRetry(() => client.complete(
      "Infer the column's business semantics. Reply ONLY with JSON " +
        "{\"semantic_type\", \"business_meaning\", \"inferred_relationship\", " +
        "\"description\", \"tags\": [..], \"meta\": {..}}.",
      s"""Column ${column.name} (type ${column.dataType.getOrElse("unknown")})
         |Table ${node.name}
         |Model context: ${node.description}
         |Upstream columns:
         |${upstreamColumns.take(20).map { case (n, d) => s"- $n: $d" }.mkString("\n")}""".stripMargin))
    if (raw == null || raw.trim.isEmpty)
      throw LlmResponseError("LLM returned an empty response")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root =
      try mapper.readTree(stripFences(raw))
      catch { case e: Exception =>
        throw LlmResponseError(s"LLM returned invalid JSON: ${e.getMessage}")
      }
    if (root == null || !root.isObject)
      throw LlmResponseError("LLM returned invalid JSON: not an object")
    def strOpt(k: String): Option[String] =
      Option(root.get(k)).filter(_.isTextual).map(_.asText).filter(_.nonEmpty)
    val tags = Option(root.get("tags")).filter(_.isArray).map { arr =>
      (0 until arr.size).flatMap(i =>
        Option(arr.get(i)).filter(_.isTextual).map(_.asText))
    }.getOrElse(Nil)
    val meta = Option(root.get("meta")).filter(_.isObject).map { m =>
      val out = scala.collection.mutable.ListBuffer.empty[(String, String)]
      m.fields().forEachRemaining(e =>
        if (e.getValue.isTextual) out += e.getKey -> e.getValue.asText)
      out.toMap
    }.getOrElse(Map.empty[String, String])
    SemanticAnalysis(
      strOpt("semantic_type").getOrElse("unknown"),
      strOpt("business_meaning").getOrElse(""),
      strOpt("inferred_relationship"),
      strOpt("description"), tags, meta)
  }

  /** Apply semantic analysis across a node's columns (reference
    * transforms.py:854-990): skip columns already documented with > 50
    * chars, otherwise fill description and merge suggested tags/meta.
    * Any per-column failure leaves that column untouched.
    */
  def applySemanticAnalysis(manifest: Manifest, node: NodeMeta,
      settings: EngineSettings, client: LlmClient): NodeMeta = {
    val upstream = node.deps.flatMap(manifest.get).flatMap(_.columns.values)
      .flatMap(c => c.description.filter(d => !settings.placeholders(d))
        .map(d => c.name -> d))
    val cols = node.columns.map { case (name, c) =>
      if (c.description.exists(_.length > 50)) name -> c
      else try {
        val sem = analyzeColumnSemantics(client, node, c, upstream)
        var out = c
        sem.description.filter(_ => out.description.forall(d =>
          d.isEmpty || settings.placeholders(d))).foreach(d =>
          out = out.copy(description = Some(d)))
        if (sem.tags.nonEmpty)
          out = out.copy(tags = Inheritance.orderPreservingUnion(out.tags, sem.tags))
        if (sem.meta.nonEmpty || sem.semanticType != "unknown") {
          var m = ListMap(out.meta.toSeq: _*)
          if (sem.semanticType != "unknown" && !m.contains("semantic_type"))
            m += "semantic_type" -> sem.semanticType
          sem.inferredRelationship.foreach(r =>
            if (!m.contains("foreign_key")) m += "foreign_key" -> r)
          sem.meta.foreach { case (k, v) => if (!m.contains(k)) m += k -> v }
          out = out.copy(meta = m)
        }
        name -> out
      } catch { case _: Exception => name -> c }
    }
    node.copy(columns = ListMap(cols.toSeq: _*))
  }

  final case class DocumentationSuggestion(
      text: String, confidence: Double, reasoning: String)

  /** Suggest an improved description with confidence scoring
    * (core/llm.py:1878-1990): base 0.5, +0.2 with style information,
    * +0.15 with non-empty upstream docs, +0.1 for tables with SQL
    * context, −0.1 when overwriting an existing description (the
    * model has to beat a human), capped to [0, 0.95].
    */
  def suggestDocumentationImprovement(client: LlmClient, target: String,
      currentDescription: Option[String], name: String,
      sqlContent: Option[String] = None, upstreamDocs: Seq[String] = Nil,
      styleContext: Option[String] = None): DocumentationSuggestion = {
    require(target == "column" || target == "table", s"bad target $target")
    var confidence = 0.5
    val reasons = scala.collection.mutable.ArrayBuffer[String]()
    if (styleContext.exists(_.nonEmpty)) { confidence += 0.2; reasons += "style context" }
    if (upstreamDocs.exists(_.trim.nonEmpty)) { confidence += 0.15; reasons += "upstream docs" }
    if (target == "table" && sqlContent.exists(_.nonEmpty)) {
      confidence += 0.1; reasons += "sql context"
    }
    if (currentDescription.exists(_.trim.nonEmpty)) {
      confidence -= 0.1; reasons += "existing description to beat"
    }
    confidence = math.max(0.0, math.min(0.95, confidence))
    val text = callWithRetry(() => client.complete(
      s"Improve the $target description. Reply with prose only.",
      s"""$target $name
         |Current description: ${currentDescription.getOrElse("(none)")}
         |${sqlContent.map(s => s"SQL:\n${truncateSql(redactCredentials(s), Some(2000))}").getOrElse("")}
         |${styleContext.map(c => s"Project style:\n$c").getOrElse("")}
         |Upstream docs:
         |${upstreamDocs.mkString("\n")}""".stripMargin))
    if (text == null || text.trim.isEmpty)
      throw LlmResponseError("LLM returned an empty response")
    DocumentationSuggestion(text.trim, confidence,
      if (reasons.isEmpty) "base confidence only" else reasons.mkString(", "))
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
