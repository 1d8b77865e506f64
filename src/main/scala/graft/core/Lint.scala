package graft.core

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession

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
      line: Int, col: Int = 0, fix: Option[String] = None)

  val Keywords: Set[String] = Set(
    "select", "from", "where", "group", "by", "order", "having", "limit",
    "join", "inner", "left", "right", "full", "outer", "cross", "on", "as",
    "and", "or", "not", "in", "exists", "between", "like", "is", "null",
    "case", "when", "then", "else", "end", "union", "intersect", "except",
    "distinct", "with", "over", "partition", "cast", "insert", "update", "delete")

  final case class Config(
      keywordCase: String = "consistent", // consistent | upper | lower
      maxLineLength: Int = 100,
      minAliasLength: Int = 3)

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
        if (alias.length < config.minAliasLength && !alias.startsWith("__"))
          out += Violation("short-alias",
            s"Table alias '$alias' is shorter than ${config.minAliasLength} characters",
            "info", s.origin.line.getOrElse(1), s.origin.startPosition.getOrElse(0) + 1)
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

    // keyword case
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
            s"Keyword '${m.matched}' should be ${w}case", "warning", line, colNo,
            Some(if (w == "upper") m.matched.toUpperCase else m.matched.toLowerCase))
        }
      }
    }

    // line length
    sql.linesIterator.zipWithIndex.foreach { case (l, i) =>
      if (l.length > config.maxLineLength)
        out += Violation("line-length",
          s"Line exceeds ${config.maxLineLength} characters (${l.length})",
          "warning", i + 1)
    }

    // select-star + short aliases: text fallback when no parsed plan
    if (!astHandled) {
      SelectStarRe.findAllMatchIn(masked).foreach { m =>
        val (line, colNo) = lineColOf(sql, m.start)
        out += Violation("select-star",
          "SELECT * makes column lineage and pruning opaque", "warning", line, colNo)
      }
      AliasRe.findAllMatchIn(masked).foreach { m =>
        val alias = m.group(2)
        if (alias.length < config.minAliasLength && !Keywords.contains(alias.toLowerCase)) {
          val (line, colNo) = lineColOf(sql, m.start(2))
          out += Violation("short-alias",
            s"Table alias '$alias' is shorter than ${config.minAliasLength} characters",
            "info", line, colNo)
        }
      }
    }

    // unneeded quoted identifiers
    QuotedIdentRe.findAllMatchIn(masked).foreach { m =>
      if (!Keywords.contains(m.group(1).toLowerCase)) {
        val (line, colNo) = lineColOf(sql, m.start)
        out += Violation("unneeded-quoted-identifier",
          s"Identifier ${m.matched} does not need quoting", "info", line, colNo,
          Some(m.group(1)))
      }
    }

    out.toSeq.sortBy(v => (v.line, v.col))
  }

  /** Lint every model in a manifest (compiled code preferred, mirroring
    * the compile-first project driver, core/sql_lint.py:477-724).
    */
  def lintManifest(manifest: Manifest, config: Config = Config(),
      spark: Option[SparkSession] = None): Map[String, Seq[Violation]] =
    manifest.models.map(n =>
      n.uniqueId -> lint(n.compiledCode.getOrElse(n.rawCode), config, spark)).toMap
}
