package graft.functions

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Real merges-table BPE token counting (the number a training
  * pipeline budgets with), as opposed to the pre-tokenizer segment
  * count in [[TextFunctions.nBpeTokens]].
  *
  * The tokenizer is the standard byte-pair-encoding inference loop
  * (ref: cli/main.py token-budget surface; algorithm is the published
  * GPT-2 `bpe()` procedure): pre-tokenize with [[TextFunctions
  * .BpePattern]], split each pre-token into characters, then
  * repeatedly merge the adjacent symbol pair with the lowest merge
  * rank (all non-overlapping occurrences, leftmost first) until no
  * pair in the word is in the merges table. The count of final
  * symbols across all pre-tokens is the token count.
  *
  * The merges table ([[Bpe.Merges]]) was learned offline with a
  * standard BPE trainer (most-frequent pair, deterministic
  * lexicographic tie-break) over the fixture corpus and embedded as a
  * constant, the same way a production pipeline ships a tokenizer's
  * merges file. It is capped at 48 rules so tokenization stays
  * non-trivial on the fixture vocabulary (median word is 2-4 tokens,
  * not 1) — the oracle would be vacuous if every word collapsed to a
  * single symbol.
  *
  * Oracle parity (the whole merge loop replays in DuckDB SQL —
  * [[Bpe.oracleSql]]): a valid BPE merges table has the property that
  * every rule's two symbols are single characters or products of
  * strictly earlier rules, so no merge can make a LOWER-ranked pair
  * newly adjacent (a new adjacency always involves the just-created
  * symbol, whose rules rank later). Applying rules strictly in rank
  * order, each as ONE greedy left-to-right pass, is therefore
  * equivalent to the min-rank loop (a greedy pass removes every
  * (x,y) adjacency, and merges never recreate one: a new adjacency
  * always involves the just-created symbol, whose rules rank later).
  * Each rank-r step is a `list_reduce` fold over the chr(1)-split
  * symbol string — merge when the accumulator ends with `SEP x` and
  * the next element is `y` — the EXACT left-to-right greedy
  * semantics of [[tokensInWord]]'s merge pass, including runs of the
  * same pair ("aaaaa" -> "aa","aa","a", leftover LAST — a global
  * `replace` fixpoint gets odd runs wrong: "aa","a","aa"). Word
  * boundaries are doubled separators, which split into empty
  * elements; an empty element can never equal `y` and leaves the
  * accumulator ending in a bare SEP, so merges never cross
  * pre-token boundaries.
  */
object Bpe {
  /** Merge rules in rank order, "x y" per entry (learned offline from
    * the sf0.01 fixture corpus; see object Scaladoc).
    */
  val Merges: Array[String] = Array(
    "e r", "i n", "o w", "o r", "s t", "m er",
    "a t", "l u", "a r", "p ar", "j o", "jo in",
    "a s", "as h", "h ash", "r ow", "at c", "atc h",
    "b atch", "a n", "c an", "s can", "c o", "c u",
    "co lu", "colu m", "colum n", "cu st", "cust o", "custo mer",
    "f i", "fi l", "fil t", "filt er", "a l", "al l",
    "m all", "s mall", "g e", "l ow", "mer ge", "s low",
    "c t", "ct or", "d er", "e ctor", "or der", "v ector")

  private val pairs: Array[(String, String)] = Merges.map { m =>
    val sp = m.indexOf(' ')
    (m.substring(0, sp), m.substring(sp + 1))
  }

  private val rank: java.util.HashMap[String, Integer] = {
    val h = new java.util.HashMap[String, Integer]()
    pairs.zipWithIndex.foreach { case ((x, y), i) => h.put(x + "" + y, i) }
    h
  }

  private val pretokenizer: Pattern = Pattern.compile(TextFunctions.BpePattern)

  /** Word-level memo: the corpus vocabulary is tiny relative to token
    * volume, so nearly every lookup hits. Bounded; cleared (not LRU)
    * at the cap — correctness never depends on it.
    */
  private val memo = new ConcurrentHashMap[String, Integer]()
  private val MemoCap = 1 << 16

  private def tokensInWord(w: String): Int = {
    val cached = memo.get(w)
    if (cached != null) return cached.intValue()
    var syms = new Array[String](w.length)
    var i = 0
    while (i < w.length) { syms(i) = String.valueOf(w.charAt(i)); i += 1 }
    var n = syms.length
    var done = n <= 1
    while (!done) {
      var best = Int.MaxValue
      var j = 0
      while (j < n - 1) {
        val r = rank.get(syms(j) + "" + syms(j + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (x, y) = pairs(best)
        val out = new Array[String](n)
        var k = 0
        j = 0
        while (j < n) {
          if (j < n - 1 && syms(j) == x && syms(j + 1) == y) {
            out(k) = x + y; k += 1; j += 2
          } else {
            out(k) = syms(j); k += 1; j += 1
          }
        }
        syms = out
        n = k
        if (n <= 1) done = true
      }
    }
    if (memo.size() >= MemoCap) memo.clear()
    memo.put(w, Integer.valueOf(n))
    n
  }

  /** Total BPE token count of a document. Control chars below U+0009
    * are stripped first (they would otherwise land in the
    * "other"-run pre-token bucket and collide with the oracle's
    * chr(1) symbol separator).
    */
  def count(text: String): Long = {
    var cleaned = text
    var hasCtl = false
    var i = 0
    while (i < text.length && !hasCtl) {
      if (text.charAt(i) < '\u0009') hasCtl = true
      i += 1
    }
    if (hasCtl) {
      val sb = new java.lang.StringBuilder(text.length)
      i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        if (c >= '\u0009') sb.append(c)
        i += 1
      }
      cleaned = sb.toString
    }
    val m = pretokenizer.matcher(cleaned)
    var total = 0L
    while (m.find()) total += tokensInWord(m.group())
    total
  }

  /** DuckDB replay of the full tokenizer for table `tbl` (see object
    * Scaladoc for the equivalence argument). Each rank applies as a
    * `list_reduce` greedy fold over the chr(1)-split symbols — the
    * split's leading empty element (the string always starts with a
    * separator) is the fold's natural sentinel accumulator, and the
    * rebuilt string keeps the exact separator layout, so the
    * token-count arithmetic below is unchanged.
    */
  def oracleSql(tbl: String): String = {
    val pat = TextFunctions.BpePattern.replace("'", "''")
    val values = pairs.zipWithIndex
      .map { case ((x, y), i) => s"(${i + 1}, '$x', '$y')" }
      .mkString(", ")
    val step =
      s"""list_reduce(string_split(st.s, chr(1)), (acc, el) ->
         |      CASE WHEN el = m.y AND ends_with(acc, chr(1) || m.x)
         |           THEN acc || el ELSE acc || chr(1) || el END)""".stripMargin
    s"""WITH RECURSIVE merges(rank, x, y) AS (
       |  VALUES $values
       |), words AS (
       |  SELECT doc_id,
       |    regexp_extract_all(regexp_replace(text, '[\\x00-\\x08]', '', 'g'),
       |                       '$pat') AS ws
       |  FROM $tbl
       |), init AS (
       |  SELECT doc_id,
       |    coalesce(list_aggregate(list_transform(ws,
       |      w -> chr(1) ||
       |           list_aggregate(regexp_extract_all(w, '.'), 'string_agg', chr(1))
       |           || chr(1)), 'string_agg', ''), '') AS s,
       |    len(ws) AS nwords
       |  FROM words
       |), state AS (
       |  SELECT doc_id, 0 AS r, s, nwords FROM init
       |  UNION ALL
       |  SELECT st.doc_id, st.r + 1, $step, st.nwords
       |  FROM state st JOIN merges m ON m.rank = st.r + 1
       |)
       |SELECT doc_id,
       |  CAST(length(s) - length(replace(s, chr(1), '')) - nwords AS BIGINT)
       |    AS n_bpe_real
       |FROM state WHERE r = ${pairs.length}
       |ORDER BY doc_id""".stripMargin
  }
}

/** `bpe_token_count(text)`: codegen'd scalar wrapper over
  * [[Bpe.count]] — the merge loop runs in one static JVM call per
  * row, inside whole-stage codegen, so the operator is map-only and
  * embarrassingly parallel at any corpus size.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  override def nullSafeEval(input: Any): Any =
    Bpe.count(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Bpe.count($c.toString());")

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}
