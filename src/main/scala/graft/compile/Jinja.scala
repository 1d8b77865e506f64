package graft.compile

import scala.collection.mutable

/** Minimal Jinja renderer for dbt-style SQL templates (A34 compile
  * path; reference renders via dbt's Jinja at
  * core/sql_operations.py:27-57). Supports the constructs the
  * reference's own demo models exercise:
  *
  *  - `{{ expr }}` output, `{%- ... -%}` whitespace trim markers
  *  - `{% set name = expr %}`
  *  - `{% for x in expr %} ... {% endfor %}` (with `loop.last`/`loop.index`)
  *  - `{% if expr %} ... {% elif %} ... {% else %} ... {% endif %}`
  *  - `{# comments #}`
  *  - literals: strings, numbers, booleans, lists; `==`, `!=`, `not`,
  *    `and`, `or`, `in`, `~` concat, attribute/index access
  *  - function calls with positional + keyword args, dispatched to the
  *    caller-provided function table (`ref`, `source`, `var`,
  *    `env_var`, `config`, ...)
  */
object Jinja {

  final case class JinjaError(message: String) extends RuntimeException(message)

  type Func = (Seq[Any], Map[String, Any]) => Any

  final case class Env(
      vars: Map[String, Any] = Map.empty,
      functions: Map[String, Func] = Map.empty,
      /** Names whose env function wins even over a template-defined
        * macro of the same name (normal Jinja resolution is the
        * reverse). dbt unit-test `overrides.macros` needs this: the
        * override must stub a macro the project prologue DEFINES, and
        * the `{% macro %}` registration would otherwise shadow it.
        */
      pinned: Set[String] = Set.empty)

  /** True when the text contains any Jinja tokens (reference
    * `has_jinja`, core/sql_operations.py:21-24).
    */
  def hasJinja(text: String): Boolean =
    text.contains("{{") || text.contains("{%") || text.contains("{#")

  // ------------------------------------------------------------------
  // Lexing: split into text and tag segments, handling trim markers.
  private sealed trait Seg
  private final case class Text(s: String) extends Seg
  private final case class Output(expr: String, trimL: Boolean, trimR: Boolean) extends Seg
  private final case class Stmt(body: String, trimL: Boolean, trimR: Boolean) extends Seg

  private val TagRe = """(?s)\{\{-?.*?-?\}\}|\{%-?.*?-?%\}|\{#-?.*?-?#\}""".r

  private def lex(template: String): Seq[Seg] = {
    val segs = mutable.ListBuffer.empty[Seg]
    var last = 0
    for (m <- TagRe.findAllMatchIn(template)) {
      if (m.start > last) segs += Text(template.substring(last, m.start))
      val raw = m.matched
      val inner = raw.substring(2, raw.length - 2)
      val trimL = inner.startsWith("-")
      val trimR = inner.endsWith("-")
      val body = inner.stripPrefix("-").stripSuffix("-").trim
      raw.take(2) match {
        case "{{" => segs += Output(body, trimL, trimR)
        case "{%" => segs += Stmt(body, trimL, trimR)
        case "{#" => // comment: acts like a trimming no-op
          segs += Stmt("comment", trimL, trimR)
        case _ =>
      }
      last = m.end
    }
    if (last < template.length) segs += Text(template.substring(last))
    segs.toSeq
  }

  // ------------------------------------------------------------------
  // Expression evaluator (precedence-climbing over a token stream).
  private final class ExprParser(input: String, scope: mutable.Map[String, Any], env: Env) {
    private var pos = 0

    private def ws(): Unit = while (pos < input.length && input(pos).isWhitespace) pos += 1
    private def peek: Char = if (pos < input.length) input(pos) else '\u0000'
    private def eof: Boolean = { ws(); pos >= input.length }

    private def ident(): String = {
      ws()
      val start = pos
      while (pos < input.length && (input(pos).isLetterOrDigit || input(pos) == '_')) pos += 1
      input.substring(start, pos)
    }

    private def tryKeyword(kw: String): Boolean = {
      ws()
      val save = pos
      val got = ident()
      if (got == kw) true else { pos = save; false }
    }

    def parse(): Any = { val v = parseOr(); ws(); v }

    private def parseOr(): Any = {
      var left = parseAnd()
      while (tryKeyword("or")) left = truthy(left) || truthy(parseAnd())
      left
    }
    private def parseAnd(): Any = {
      var left = parseNot()
      while (tryKeyword("and")) {
        val l = truthy(left); val r = truthy(parseNot())
        left = l && r
      }
      left
    }
    private def parseNot(): Any =
      if (tryKeyword("not")) !truthy(parseNot()) else parseCompare()

    private def parseCompare(): Any = {
      val left = parseConcat()
      ws()
      if (input.startsWith("==", pos)) { pos += 2; valueEq(left, parseConcat()) }
      else if (input.startsWith("!=", pos)) { pos += 2; !valueEq(left, parseConcat()) }
      else if (tryKeyword("in")) {
        val right = parseConcat()
        right match {
          case s: Seq[_] => s.exists(valueEq(_, left))
          case s: String => s.contains(left.toString)
          case m: Map[_, _] => m.asInstanceOf[Map[Any, Any]].keys.exists(valueEq(_, left))
          case _ => false
        }
      } else left
    }

    private def parseConcat(): Any = {
      var left = parseAdd()
      ws()
      while (peek == '~') { pos += 1; left = render(left) + render(parseAdd()); ws() }
      left
    }

    private def parseAdd(): Any = {
      var left = parsePrimaryChain()
      ws()
      while (peek == '+' || (peek == '-' && !input.startsWith("-%", pos))) {
        val op = peek; pos += 1
        val right = parsePrimaryChain()
        left = (num(left), num(right)) match {
          case (Some(a), Some(b)) => if (op == '+') a + b else a - b
          case _ if op == '+' => render(left) + render(right)
          case _ => throw JinjaError(s"cannot apply $op")
        }
        ws()
      }
      left
    }

    private def parsePrimaryChain(): Any = {
      var v = parsePrimary()
      var continue = true
      while (continue) {
        ws()
        if (peek == '.') {
          pos += 1
          val attr = ident()
          v = attrOf(v, attr)
        } else if (peek == '[') {
          pos += 1
          val idx = parse()
          ws()
          if (peek == ']') pos += 1 else throw JinjaError("expected ]")
          v = indexOf(v, idx)
        } else continue = false
      }
      v
    }

    private def parsePrimary(): Any = {
      ws()
      peek match {
        case '\'' | '"' =>
          val quote = peek; pos += 1
          val sb = new StringBuilder
          while (pos < input.length && input(pos) != quote) {
            if (input(pos) == '\\' && pos + 1 < input.length) { sb += input(pos + 1); pos += 2 }
            else { sb += input(pos); pos += 1 }
          }
          pos += 1
          sb.toString
        case '[' =>
          pos += 1
          val items = mutable.ListBuffer.empty[Any]
          ws()
          if (peek == ']') { pos += 1; return items.toSeq }
          var more = true
          while (more) {
            items += parse(); ws()
            if (peek == ',') { pos += 1 } else more = false
          }
          ws(); if (peek == ']') pos += 1 else throw JinjaError("expected ]")
          items.toSeq
        case '(' =>
          pos += 1
          val v = parse(); ws()
          if (peek == ')') pos += 1 else throw JinjaError("expected )")
          v
        case c if c.isDigit || (c == '-' && pos + 1 < input.length && input(pos + 1).isDigit) =>
          val start = pos
          if (peek == '-') pos += 1
          while (pos < input.length && (input(pos).isDigit || input(pos) == '.')) pos += 1
          val s = input.substring(start, pos)
          if (s.contains('.')) s.toDouble else s.toLong
        case _ =>
          val name = ident()
          if (name.isEmpty) throw JinjaError(s"parse error at '${input.drop(pos).take(20)}'")
          ws()
          if (peek == '(') {
            pos += 1
            val (args, kwargs) = parseArgs()
            // template-defined macros (stored in scope as Func) shadow
            // engine functions, matching Jinja's name resolution —
            // EXCEPT pinned names (unit-test macro overrides), where
            // the env function must beat the project's definition
            (if (env.pinned(name)) None else scope.get(name)) match {
              case Some(f: ((Seq[Any], Map[String, Any]) => Any) @unchecked)
                  if f.isInstanceOf[Function2[_, _, _]] =>
                f(args, kwargs)
              case _ => env.functions.get(name) match {
                case Some(f) => f(args, kwargs)
                case None => throw JinjaError(s"unknown function: $name")
              }
            }
          } else name match {
            case "true" | "True" => true
            case "false" | "False" => false
            case "none" | "None" => null
            case _ =>
              scope.getOrElse(name, env.vars.getOrElse(name,
                throw JinjaError(s"undefined variable: $name")))
          }
      }
    }

    private def parseArgs(): (Seq[Any], Map[String, Any]) = {
      val args = mutable.ListBuffer.empty[Any]
      val kwargs = mutable.LinkedHashMap.empty[String, Any]
      ws()
      if (peek == ')') { pos += 1; return (args.toSeq, kwargs.toMap) }
      var more = true
      while (more) {
        ws()
        // lookahead for `name=` keyword form (but not `==`)
        val save = pos
        val name = ident()
        ws()
        if (name.nonEmpty && peek == '=' && !input.startsWith("==", pos)) {
          pos += 1
          kwargs(name) = parse()
        } else {
          pos = save
          args += parse()
        }
        ws()
        if (peek == ',') { pos += 1 } else more = false
      }
      ws(); if (peek == ')') pos += 1 else throw JinjaError("expected )")
      (args.toSeq, kwargs.toMap)
    }
  }

  private def attrOf(v: Any, attr: String): Any = v match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].getOrElse(attr, null)
    case _ => throw JinjaError(s"no attribute $attr on $v")
  }
  private def indexOf(v: Any, idx: Any): Any = (v, idx) match {
    case (s: Seq[_], i: Long) => s(i.toInt)
    case (m: Map[_, _], k) => m.asInstanceOf[Map[Any, Any]].getOrElse(k, null)
    case _ => throw JinjaError(s"cannot index $v")
  }

  private def num(v: Any): Option[Double] = v match {
    case l: Long => Some(l.toDouble)
    case d: Double => Some(d)
    case i: Int => Some(i.toDouble)
    case _ => None
  }

  private def truthy(v: Any): Boolean = v match {
    case null => false
    case b: Boolean => b
    case s: String => s.nonEmpty
    case s: Seq[_] => s.nonEmpty
    case m: Map[_, _] => m.nonEmpty
    case l: Long => l != 0
    case d: Double => d != 0
    case _ => true
  }

  private def valueEq(a: Any, b: Any): Boolean = (num(a), num(b)) match {
    case (Some(x), Some(y)) => x == y
    case _ => a == b
  }

  /** Render a value into output text (Jinja `{{ }}` semantics). */
  def render(v: Any): String = v match {
    case null => ""
    case l: Long => l.toString
    case d: Double => if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
    case s: Seq[_] => s.map(render).mkString("[", ", ", "]")
    case other => other.toString
  }

  def evalExpr(expr: String, scope: mutable.Map[String, Any], env: Env): Any =
    new ExprParser(expr, scope, env).parse()

  // ------------------------------------------------------------------
  // Block-structured interpretation.
  def renderTemplate(template: String, env: Env): String = {
    val segs = lex(template)
    val out = new StringBuilder
    val scope = mutable.Map.empty[String, Any]

    // apply whitespace-trim markers by post-processing neighbors
    val trimmed = applyTrim(segs)

    def exec(i0: Int, end: Set[String]): (Int, Option[String]) = {
      var i = i0
      while (i < trimmed.length) {
        trimmed(i) match {
          case Text(s) => out ++= s; i += 1
          case Output(e, _, _) => out ++= render(evalExpr(e, scope, env)); i += 1
          case Stmt(body, _, _) =>
            val keyword = body.takeWhile(c => c.isLetter)
            if (end.contains(keyword)) return (i, Some(keyword))
            keyword match {
              case "comment" => i += 1
              case "macro" =>
                // {% macro name(a, b='dflt') %}body{% endmacro %} —
                // the body is captured as source and re-rendered per
                // call with the bound args layered over the defining
                // scope (lexical closure, Jinja semantics).
                val sig = body.stripPrefix("macro").trim
                val lp = sig.indexOf('(')
                val rp = sig.lastIndexOf(')')
                if (lp < 0 || rp < lp) throw JinjaError(s"malformed macro signature: $sig")
                val mname = sig.take(lp).trim
                val paramsStr = sig.substring(lp + 1, rp)
                // split on TOP-LEVEL commas only: defaults may contain
                // commas inside nested calls, lists, or quoted strings
                def splitParams(s: String): Seq[String] = {
                  val out = mutable.ListBuffer.empty[String]
                  var depth = 0
                  var quote: Char = 0
                  var start = 0
                  var i = 0
                  while (i < s.length) {
                    val ch = s(i)
                    if (quote != 0) { if (ch == quote) quote = 0 }
                    else ch match {
                      case '\'' | '"' => quote = ch
                      case '(' | '[' | '{' => depth += 1
                      case ')' | ']' | '}' => depth -= 1
                      case ',' if depth == 0 => out += s.substring(start, i); start = i + 1
                      case _ =>
                    }
                    i += 1
                  }
                  out += s.substring(start)
                  out.toSeq
                }
                val params: Seq[(String, Option[String])] =
                  if (paramsStr.trim.isEmpty) Nil
                  else splitParams(paramsStr).map { p =>
                    val kv = p.split("=", 2)
                    (kv(0).trim, kv.lift(1).map(_.trim))
                  }
                var depth = 1
                var j = i + 1
                while (depth > 0 && j < trimmed.length) {
                  trimmed(j) match {
                    case Stmt(b, _, _) if b.startsWith("macro") => depth += 1
                    case Stmt(b, _, _) if b.startsWith("endmacro") => depth -= 1
                    case _ =>
                  }
                  if (depth > 0) j += 1
                }
                val src = trimmed.slice(i + 1, j).map {
                  case Text(s) => s
                  case Output(e, _, _) => s"{{ $e }}"
                  case Stmt(b, _, _) => s"{% $b %}"
                }.mkString
                val fn: Func = (args: Seq[Any], kwargs: Map[String, Any]) => {
                  val bound = params.zipWithIndex.map { case ((pname, dflt), idx) =>
                    pname -> args.lift(idx).orElse(kwargs.get(pname))
                      .getOrElse(dflt.map(d => evalExpr(d, scope, env)).getOrElse(
                        throw JinjaError(s"macro $mname: missing argument '$pname'")))
                  }.toMap
                  renderTemplate(src,
                    env.copy(vars = env.vars ++ scope.toMap ++ bound)).trim
                }
                scope(mname) = fn
                i = j + 1
              case "set" =>
                val rest = body.stripPrefix("set").trim
                val eq = rest.indexOf('=')
                val name = rest.take(eq).trim
                scope(name) = evalExpr(rest.drop(eq + 1).trim, scope, env)
                i += 1
              case "for" =>
                val rest = body.stripPrefix("for").trim
                val inIdx = rest.indexOf(" in ")
                val varName = rest.take(inIdx).trim
                val items = evalExpr(rest.drop(inIdx + 4).trim, scope, env) match {
                  case s: Seq[_] => s
                  case m: Map[_, _] => m.asInstanceOf[Map[Any, Any]].keys.toSeq
                  case other => throw JinjaError(s"cannot iterate $other")
                }
                val bodyStart = i + 1
                var bodyEnd = bodyStart
                if (items.isEmpty) {
                  // skip to matching endfor (no nested-for fixtures needed,
                  // but handle nesting by depth counting)
                  var depth = 1
                  var j = bodyStart
                  while (depth > 0 && j < trimmed.length) {
                    trimmed(j) match {
                      case Stmt(b, _, _) if b.startsWith("for") => depth += 1
                      case Stmt(b, _, _) if b.startsWith("endfor") => depth -= 1
                      case _ =>
                    }
                    if (depth > 0) j += 1
                  }
                  i = j + 1
                } else {
                  for ((item, idx) <- items.zipWithIndex) {
                    scope(varName) = item
                    scope("loop") = Map(
                      "index" -> (idx + 1).toLong, "index0" -> idx.toLong,
                      "first" -> (idx == 0), "last" -> (idx == items.size - 1),
                      "length" -> items.size.toLong)
                    val (e, _) = exec(bodyStart, Set("endfor"))
                    bodyEnd = e
                  }
                  scope -= "loop"
                  i = bodyEnd + 1
                }
              case "if" =>
                var cond = truthy(evalExpr(body.stripPrefix("if").trim, scope, env))
                var taken = false
                var j = i + 1
                var done = false
                while (!done) {
                  if (cond && !taken) {
                    val (e, kw) = exec(j, Set("elif", "else", "endif"))
                    taken = true
                    j = e
                    kw match {
                      case Some("endif") => done = true
                      case _ => // skip remaining branches
                        var depth = 1
                        var k = j
                        while (depth > 0) {
                          trimmed(k) match {
                            case Stmt(b, _, _) if b.startsWith("if") => depth += 1
                            case Stmt(b, _, _) if b.startsWith("endif") => depth -= 1
                            case _ =>
                          }
                          if (depth > 0) k += 1
                        }
                        j = k
                        done = true
                    }
                  } else {
                    // skip this branch's body without output
                    var depth = 0
                    var k = j
                    var stop = false
                    while (!stop) {
                      trimmed(k) match {
                        case Stmt(b, _, _) if b.startsWith("if") && depth >= 0 => depth += 1; k += 1
                        case Stmt(b, _, _) if b.startsWith("endif") =>
                          if (depth == 0) { stop = true } else { depth -= 1; k += 1 }
                        case Stmt(b, _, _) if depth == 0 &&
                            (b.startsWith("elif") || b.startsWith("else")) =>
                          stop = true
                        case _ => k += 1
                      }
                    }
                    trimmed(k) match {
                      case Stmt(b, _, _) if b.startsWith("elif") =>
                        cond = truthy(evalExpr(b.stripPrefix("elif").trim, scope, env))
                        j = k + 1
                      case Stmt(b, _, _) if b.startsWith("else") =>
                        cond = true
                        j = k + 1
                      case _ => // endif
                        j = k
                        done = true
                    }
                  }
                }
                i = j + 1
              case other => throw JinjaError(s"unsupported statement: $other")
            }
        }
      }
      (i, None)
    }
    exec(0, Set.empty)
    out.toString
  }

  /** Apply `-` trim markers: a left-trim removes trailing whitespace
    * of the preceding text; a right-trim removes leading whitespace of
    * the following text. `{% %}` statements additionally swallow the
    * newline that follows them (Jinja trim_blocks-lite keeps SQL tidy;
    * plain spacing is cosmetic for SQL, so this stays simple).
    */
  private def applyTrim(segs: Seq[Seg]): Seq[Seg] = {
    val arr = segs.toArray
    for (i <- arr.indices) arr(i) match {
      case Output(_, trimL, trimR) => trim(arr, i, trimL, trimR)
      case Stmt(_, trimL, trimR) => trim(arr, i, trimL, trimR)
      case _ =>
    }
    arr.toSeq
  }

  private def trim(arr: Array[Seg], i: Int, trimL: Boolean, trimR: Boolean): Unit = {
    if (trimL && i > 0) arr(i - 1) match {
      case Text(s) => arr(i - 1) = Text(s.replaceAll("\\s+$", ""))
      case _ =>
    }
    if (trimR && i < arr.length - 1) arr(i + 1) match {
      case Text(s) => arr(i + 1) = Text(s.replaceAll("^\\s+", ""))
      case _ =>
    }
  }
}
