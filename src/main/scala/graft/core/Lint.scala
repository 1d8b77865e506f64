package graft.core

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession

import graft.compile.Jinja

/** SQL lint rules (A36; core/sql_lint.py): keyword-case consistency,
  * line length, select-star, short table aliases, unneeded quoted
  * identifiers, plus parse errors surfaced as violations.
  *
  * With a SparkSession, select-star and alias rules are AST-level —
  * the parsed `LogicalPlan` is walked (reference uses sqlglot the same
  * way, core/sql_lint.py:359-433), so `count(*)` and qualified `t.*`
  * are NOT flagged, star inside a CTE is reported with the CTE's
  * name, and only genuine relation/subquery aliases trip the alias
  * rule. Without a session the rules fall back to the text heuristics.
  */
object Lint {

  final case class Violation(
      ruleId: String, message: String, severity: String,
      line: Int, col: Int = 0, fix: Option[String] = None,
      snippet: Option[String] = None)

  val Keywords: Set[String] = Set(
    "select", "from", "where", "group", "by", "order", "having", "limit",
    "join", "inner", "left", "right", "full", "outer", "cross", "on", "as",
    "and", "or", "not", "in", "exists", "between", "like", "is", "null",
    "case", "when", "then", "else", "end", "union", "intersect", "except",
    "distinct", "with", "over", "partition", "cast", "insert", "update", "delete")

  /** The configurable rule set; "parse-error"/"compile-error" are not
    * rules and cannot be disabled. Reference rule ids are accepted as
    * aliases so a reference config ports verbatim
    * (core/sql_lint.py:484-527).
    */
  val RuleIds: Set[String] = Set("keyword-case", "line-length",
    "select-star", "short-alias", "unneeded-quoted-identifier")
  private val RuleAliases: Map[String, String] = Map(
    "table-alias" -> "short-alias",
    "quoted-identifier" -> "unneeded-quoted-identifier")
  private def canonicalRule(id: String): String = RuleAliases.getOrElse(id, id)

  final case class Config(
      keywordCase: String = "consistent", // consistent | upper | lower
      maxLineLength: Int = 100,
      minAliasLength: Int = 3,
      /** None = all rules; Some(ids) = only those rules (reference
        * SQLLinter enabled_rules, core/sql_lint.py:487).
        */
      enabledRules: Option[Seq[String]] = None,
      /** Disabled AFTER the enabled filter — disabled wins on overlap
        * (reference core/sql_lint.py:509-522 and its test
        * `disabled_rules_win_over_enabled_rules`).
        */
      disabledRules: Seq[String] = Nil) {
    def ruleEnabled(id: String): Boolean = {
      val canon = canonicalRule(id)
      enabledRules.forall(_.exists(e => canonicalRule(e) == canon)) &&
        !disabledRules.exists(d => canonicalRule(d) == canon)
    }
  }

  private val KeywordRe = ("(?i)\\b(" + Keywords.mkString("|") + ")\\b").r
  private val QuotedIdentRe = "`([A-Za-z_][A-Za-z0-9_]*)`".r
  private val AliasRe = "(?i)\\b(?:from|join)\\s+([\\w.]+)\\s+(?:as\\s+)?(\\w+)".r
  private val SelectStarRe = "(?i)select\\s+(\\*|\\w+\\.\\*)".r

  /** Strip string literals and comments so rules don't fire inside
    * them. Handles `''` doubled-quote escapes, backslash escapes, and
    * double-quoted strings (Spark treats `"` as a string quote by
    * default) — `'it''s where'` masks through the tail.
    */
  private[core] def maskLiterals(sql: String): String = {
    val sb = new StringBuilder(sql)
    def maskRange(from: Int, until: Int): Unit =
      for (i <- from until until if sb(i) != '\n') sb(i) = ' '
    var i = 0
    while (i < sb.length) {
      sb(i) match {
        case q @ ('\'' | '"') =>
          var j = i + 1
          var closed = false
          while (j < sb.length && !closed) {
            if (sb(j) == '\\' && j + 1 < sb.length) j += 2
            else if (sb(j) == q) {
              if (j + 1 < sb.length && sb(j + 1) == q) j += 2 // '' escape
              else { closed = true; j += 1 }
            } else j += 1
          }
          maskRange(i, j); i = j
        case '-' if i + 1 < sb.length && sb(i + 1) == '-' =>
          val end = sb.indexOf("\n", i)
          val stop = if (end < 0) sb.length else end
          maskRange(i, stop); i = stop
        case _ => i += 1
      }
    }
    sb.toString
  }

  private def lineColOf(sql: String, offset: Int): (Int, Int) = {
    val upTo = sql.take(offset)
    val line = upTo.count(_ == '\n') + 1
    val col = offset - math.max(0, upTo.lastIndexOf('\n') + 1) + 1
    (line, col)
  }

  /** AST-level select-star + alias rules over a parsed LogicalPlan
    * (reference walks the sqlglot AST the same way,
    * core/sql_lint.py:359-433). Only a BARE `*` in a projection or
    * aggregation trips select-star — `count(*)` and qualified `t.*`
    * do not — and the violation message carries its context (top
    * level vs a named CTE vs a subquery), which the reference's
    * regex-era rules could not distinguish.
    */
  private def astRules(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      config: Config): Seq[Violation] = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedStar
    import org.apache.spark.sql.catalyst.expressions.{Expression, NamedExpression, SubqueryExpression}
    import org.apache.spark.sql.catalyst.plans.logical._
    val out = scala.collection.mutable.ListBuffer.empty[Violation]

    def originLine(e: Expression): Int = e.origin.line.getOrElse(1)

    def bareStar(exprs: Seq[NamedExpression], ctx: String): Unit =
      exprs.foreach {
        case s: UnresolvedStar if s.target.isEmpty =>
          if (config.ruleEnabled("select-star"))
            out += Violation("select-star",
              s"SELECT * at $ctx makes column lineage and pruning opaque",
              "warning", originLine(s))
        case _ => ()
      }

    def walkExprSubqueries(p: LogicalPlan, ctx: String): Unit =
      p.expressions.foreach(_.foreach {
        case sub: SubqueryExpression => walk(sub.plan, "subquery")
        case _ => ()
      })

    def walk(plan: LogicalPlan, ctx: String): Unit = plan match {
      case w: UnresolvedWith =>
        // cteRelations tuple arity differs across Spark minors — take
        // the (name, aliasedPlan) prefix positionally. The CTE's own
        // SubqueryAlias carries its name, not a user-written table
        // alias, so walk its child.
        w.cteRelations.foreach { t =>
          (t.productElement(0), t.productElement(1)) match {
            case (name: String, rel: SubqueryAlias) => walk(rel.child, s"CTE '$name'")
            case _ => ()
          }
        }
        walk(w.child, ctx)
      case p: Project =>
        bareStar(p.projectList, ctx)
        walkExprSubqueries(p, ctx)
        p.children.foreach(walk(_, ctx))
      case a: Aggregate =>
        bareStar(a.aggregateExpressions, ctx)
        walkExprSubqueries(a, ctx)
        a.children.foreach(walk(_, ctx))
      case s: SubqueryAlias =>
        val alias = s.alias
        if (alias.length < config.minAliasLength && !alias.startsWith("__") &&
            config.ruleEnabled("short-alias"))
          out += Violation("short-alias",
            s"Table alias '$alias' is shorter than ${config.minAliasLength} characters",
            "convention", s.origin.line.getOrElse(1),
            s.origin.startPosition.getOrElse(0) + 1, snippet = Some(alias))
        walk(s.child, ctx)
      case other =>
        walkExprSubqueries(other, ctx)
        other.children.foreach(walk(_, ctx))
    }
    walk(plan, "top level")
    out.toSeq
  }

  def lint(sql: String, config: Config = Config(),
      spark: Option[SparkSession] = None): Seq[Violation] = {
    val out = scala.collection.mutable.ListBuffer.empty[Violation]
    val masked = maskLiterals(sql)

    // parse errors (compile-first, like the reference's lint_model);
    // a successful parse switches select-star/alias to the AST rules
    var astHandled = false
    spark.foreach { s =>
      Try(s.sessionState.sqlParser.parsePlan(sql)) match {
        case Failure(e) =>
          out += Violation("parse-error", e.getMessage.linesIterator.next(), "error", 1)
        case Success(plan) =>
          out ++= astRules(plan, config)
          astHandled = true
      }
    }

    // keyword case (fix payload = the recased keyword, reference
    // KeywordCapitalizationRule, core/sql_lint.py:176-307)
    if (config.ruleEnabled("keyword-case")) {
      val kws = KeywordRe.findAllMatchIn(masked).toSeq
      val uppers = kws.count(m => m.matched == m.matched.toUpperCase)
      val lowers = kws.count(m => m.matched == m.matched.toLowerCase)
      val wanted = config.keywordCase match {
        case "upper" => Some("upper")
        case "lower" => Some("lower")
        case _ => // consistent: majority wins
          if (uppers > 0 && lowers > 0) Some(if (uppers >= lowers) "upper" else "lower")
          else None
      }
      wanted.foreach { w =>
        kws.foreach { m =>
          val isUpper = m.matched == m.matched.toUpperCase
          val isLower = m.matched == m.matched.toLowerCase
          if ((w == "upper" && !isUpper) || (w == "lower" && !isLower)) {
            val (line, colNo) = lineColOf(sql, m.start)
            out += Violation("keyword-case",
              s"Keyword '${m.matched}' should be ${w}case", "convention", line, colNo,
              Some(if (w == "upper") m.matched.toUpperCase else m.matched.toLowerCase),
              snippet = Some(m.matched))
          }
        }
      }
    }

    // line length
    if (config.ruleEnabled("line-length"))
      sql.linesIterator.zipWithIndex.foreach { case (l, i) =>
        if (l.length > config.maxLineLength)
          out += Violation("line-length",
            s"Line exceeds ${config.maxLineLength} characters (${l.length})",
            "info", i + 1)
      }

    // select-star + short aliases: text fallback when no parsed plan
    if (!astHandled) {
      if (config.ruleEnabled("select-star"))
        SelectStarRe.findAllMatchIn(masked).foreach { m =>
          val (line, colNo) = lineColOf(sql, m.start)
          out += Violation("select-star",
            "SELECT * makes column lineage and pruning opaque", "warning", line, colNo)
        }
      if (config.ruleEnabled("short-alias"))
        AliasRe.findAllMatchIn(masked).foreach { m =>
          val alias = m.group(2)
          if (alias.length < config.minAliasLength && !Keywords.contains(alias.toLowerCase)) {
            val (line, colNo) = lineColOf(sql, m.start(2))
            out += Violation("short-alias",
              s"Table alias '$alias' is shorter than ${config.minAliasLength} characters",
              "convention", line, colNo, snippet = Some(alias))
          }
        }
    }

    // unneeded quoted identifiers (fix payload = the bare identifier)
    if (config.ruleEnabled("unneeded-quoted-identifier"))
      QuotedIdentRe.findAllMatchIn(masked).foreach { m =>
        if (!Keywords.contains(m.group(1).toLowerCase)) {
          val (line, colNo) = lineColOf(sql, m.start)
          out += Violation("unneeded-quoted-identifier",
            s"Identifier ${m.matched} does not need quoting", "info", line, colNo,
            Some(m.group(1)), snippet = Some(m.matched))
        }
      }

    out.toSeq.sortBy(v => (v.line, v.col))
  }

  /** Apply fix-it payloads: each violation carrying both a `snippet`
    * and a `fix` is rewritten in place (verified against the snippet
    * at its 1-based line/col before touching anything — a stale
    * violation is skipped, never misapplied). Applied bottom-up so
    * earlier offsets stay valid.
    */
  def applyFixes(sql: String, violations: Seq[Violation]): String = {
    val lines = sql.split("\n", -1).toBuffer
    val fixable = violations
      .filter(v => v.fix.isDefined && v.snippet.isDefined && v.line >= 1 && v.col >= 1)
      .sortBy(v => (-v.line, -v.col))
    for (v <- fixable; fix <- v.fix; snip <- v.snippet
         if v.line <= lines.length) {
      val l = lines(v.line - 1)
      val start = v.col - 1
      if (start + snip.length <= l.length &&
          l.substring(start, start + snip.length) == snip)
        lines(v.line - 1) = l.substring(0, start) + fix + l.substring(start + snip.length)
    }
    lines.mkString("\n")
  }

  /** Segment-wise FQN match (reference `_is_fqn_match`): every filter
    * pattern's dot-separated segments must prefix-match the node's fqn
    * segments (or equal the node name).
    */
  private[core] def fqnMatches(node: NodeMeta, patterns: Seq[String]): Boolean =
    patterns.isEmpty || patterns.exists { p =>
      val segs = p.split('.').toSeq
      node.name == p || segs.forall(node.fqn.contains) ||
        node.fqn.containsSlice(segs)
    }

  /** Lint every model in a manifest (compiled code preferred —
    * compile-first semantics mirroring the reference project driver,
    * core/sql_lint.py:580-696: lint the SQL the warehouse will see,
    * not raw Jinja). A model whose SQL never compiled gets a
    * `compile-error` violation instead of parse noise. `fqnFilter`
    * narrows the candidate set like the reference's fqn selector.
    */
  def lintManifest(manifest: Manifest, config: Config = Config(),
      spark: Option[SparkSession] = None,
      fqnFilter: Seq[String] = Nil): Map[String, Seq[Violation]] =
    manifest.models
      .filter(n => fqnMatches(n, fqnFilter))
      .filter(n => n.compiledCode.exists(_.nonEmpty) || n.rawCode.nonEmpty)
      .map { n =>
        val vs = n.compiledCode match {
          case Some(code) => lint(code, config, spark)
          case None if Jinja.hasJinja(n.rawCode) =>
            // raw Jinja never compiled: report it rather than feeding
            // template syntax to the SQL parser (reference
            // `_lint_dbt_sql` compile-error path)
            Seq(Violation("compile-error",
              s"Model '${n.name}' has uncompiled Jinja; run compile first",
              "error", 1))
          case None => lint(n.rawCode, config, spark)
        }
        n.uniqueId -> vs
      }.toMap

  /** Lint one model by name (reference `lint_model`,
    * core/sql_lint.py:625-668): not-found and no-SQL are reported as
    * violations, never thrown.
    */
  def lintModel(manifest: Manifest, modelName: String,
      config: Config = Config(),
      spark: Option[SparkSession] = None): Seq[Violation] =
    manifest.models.find(_.name == modelName) match {
      case None =>
        Seq(Violation("model-not-found",
          s"Model '$modelName' not found", "error", 1))
      case Some(n) if n.rawCode.isEmpty && n.compiledCode.forall(_.isEmpty) =>
        Seq(Violation("model-sql-not-found",
          s"Model '$modelName' does not have SQL to lint", "error", 1))
      case Some(n) =>
        lintManifest(Manifest(Seq(n)), config, spark).values.headOption
          .getOrElse(Nil)
    }
}
