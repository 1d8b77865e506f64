package graft.core

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.SparkSession

/** SQL lint rules (A36; core/sql_lint.py): keyword-case consistency,
  * line length, select-star, short table aliases, unneeded quoted
  * identifiers, plus parse errors surfaced as violations. Text rules
  * run on the raw SQL; parse validation goes through Spark's own
  * parser (`sessionState.sqlParser.parsePlan`), so anything Catalyst
  * would reject is flagged with the parser's message.
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

  /** Strip string literals and comments so rules don't fire inside them. */
  private[core] def maskLiterals(sql: String): String = {
    val sb = new StringBuilder(sql)
    def maskRange(from: Int, until: Int): Unit =
      for (i <- from until until if sb(i) != '\n') sb(i) = ' '
    var i = 0
    while (i < sb.length) {
      sb(i) match {
        case '\'' =>
          val end = sb.indexOf("'", i + 1)
          val stop = if (end < 0) sb.length else end + 1
          maskRange(i, stop); i = stop
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

  def lint(sql: String, config: Config = Config(),
      spark: Option[SparkSession] = None): Seq[Violation] = {
    val out = scala.collection.mutable.ListBuffer.empty[Violation]
    val masked = maskLiterals(sql)

    // parse errors (compile-first, like the reference's lint_model)
    spark.foreach { s =>
      Try(s.sessionState.sqlParser.parsePlan(sql)) match {
        case Failure(e) =>
          out += Violation("parse-error", e.getMessage.linesIterator.next(), "error", 1)
        case Success(_) =>
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

    // select-star
    SelectStarRe.findAllMatchIn(masked).foreach { m =>
      val (line, colNo) = lineColOf(sql, m.start)
      out += Violation("select-star",
        "SELECT * makes column lineage and pruning opaque", "warning", line, colNo)
    }

    // short table aliases
    AliasRe.findAllMatchIn(masked).foreach { m =>
      val alias = m.group(2)
      if (alias.length < config.minAliasLength && !Keywords.contains(alias.toLowerCase)) {
        val (line, colNo) = lineColOf(sql, m.start(2))
        out += Violation("short-alias",
          s"Table alias '$alias' is shorter than ${config.minAliasLength} characters",
          "info", line, colNo)
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
