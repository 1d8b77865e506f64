package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline
  * (SURVEY §7 phase 4): tokenization, quality scoring, language-ID.
  *
  * Everything here is a composition of codegen'd built-in functions —
  * no UDFs — so the whole document pipeline stays inside whole-stage
  * codegen and scales linearly over a 100 TB corpus (embarrassingly
  * parallel per-row work, no shuffle).
  *
  * Each helper has a DuckDB-dialect twin in [[TextFunctions.Sql]] so
  * the operators built on top are oracle-checkable.
  */
object TextFunctions {
  /** Whitespace tokenization of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def nTokens(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-style pre-tokenization pattern (GPT-2-ish): contraction
    * suffixes, letter runs, digit runs, then runs of other
    * non-whitespace. Restricted to RE2-compatible constructs (no
    * lookarounds) so the IDENTICAL pattern runs in DuckDB's
    * regexp_extract_all for oracle parity.
    */
  val BpePattern: String =
    "'(?:[sdmt]|ll|ve|re)|\\p{L}+|\\p{N}+|[^\\s\\p{L}\\p{N}]+"

  /** Sub-word-ish token segments under [[BpePattern]]. Group 0 is
    * passed explicitly — Spark's regexp_extract_all defaults to
    * group 1, which does not exist for a non-capturing pattern.
    */
  def bpeTokens(c: Column): Column =
    regexp_extract_all(c, lit(BpePattern), lit(0))

  def nBpeTokens(c: Column): Column = size(bpeTokens(c)).cast("long")

  /** Occurrences (not distinct) of tokens from `dict` in the text. */
  def dictHits(c: Column, dict: Seq[String]): Column = {
    val lits = array(dict.map(lit): _*)
    size(filter(tokens(lower(c)), t => array_contains(lits, t))).cast("long")
  }

  /** Punctuation characters in the raw text. */
  def punctCount(c: Column): Column =
    regexp_count(c, lit("[.,!?;:]")).cast("long")

  /** English-ish stopwords (public, standard list prefix). */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "was", "for", "on", "with", "as", "at", "by", "be", "this")

  /** Language marker words for the n-gram/stopword language-ID
    * heuristic. Ties resolve in declaration order (en, es, de, fr) —
    * the same CASE ordering is emitted in the oracle SQL.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "was", "that", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "dans", "pour"))

  /** Predicted language: argmax of marker-hit counts, first-wins ties. */
  def langId(c: Column): Column = {
    val scores = LangMarkers.map { case (lang, dict) => lang -> dictHits(c, dict) }
    scores.init.zipWithIndex.foldRight(lit(scores.last._1): Column) {
      case (((lang, score), i), els) =>
        val laterScores = scores.drop(i + 1).map(_._2)
        when(laterScores.foldLeft(lit(true): Column)((acc, s) => acc && score >= s), lang)
          .otherwise(els)
    }
  }

  /** Composite quality score in [0,1]:
    * 0.4·min(1, n_tokens/100) + 0.3·stopword_ratio + 0.3·(1 − punct_ratio).
    * Pure double arithmetic in a fixed order — bit-identical in the
    * DuckDB oracle rendering.
    */
  def qualityScore(c: Column): Column = {
    val nt = nTokens(c)
    lit(0.4) * least(lit(1.0), nt.cast("double") / 100.0) +
      lit(0.3) * (dictHits(c, Stopwords).cast("double") / nt.cast("double")) +
      lit(0.3) * (lit(1.0) - punctCount(c).cast("double") / length(c).cast("long").cast("double"))
  }

  /** DuckDB-dialect renderings of the formulas above (oracle side). */
  object Sql {
    def tokens(c: String): String = s"string_split_regex(trim($c), '\\s+')"
    def nTokens(c: String): String = s"len(${tokens(c)})"
    def dictHits(c: String, dict: Seq[String]): String = {
      val inList = dict.map(w => s"'$w'").mkString(", ")
      s"len(list_filter(${tokens(s"lower($c)")}, x -> x IN ($inList)))"
    }
    def punctCount(c: String): String =
      s"len(regexp_extract_all($c, '[.,!?;:]'))"
    def nBpeTokens(c: String): String = {
      // DuckDB non-E string literals keep backslashes verbatim — only
      // the contraction apostrophe needs doubling
      val pat = BpePattern.replace("'", "''")
      s"len(regexp_extract_all($c, '$pat'))"
    }
    def qualityScore(c: String): String = {
      val nt = nTokens(c)
      s"0.4 * least(1.0, CAST($nt AS DOUBLE) / 100.0) + " +
        s"0.3 * (CAST(${dictHits(c, Stopwords)} AS DOUBLE) / CAST($nt AS DOUBLE)) + " +
        s"0.3 * (1.0 - CAST(${punctCount(c)} AS DOUBLE) / CAST(length($c) AS DOUBLE))"
    }
    def langId(c: String): String = {
      val scores = LangMarkers.map { case (lang, dict) => lang -> dictHits(c, dict) }
      val cases = scores.init.zipWithIndex.map { case ((lang, s), i) =>
        val cond = scores.drop(i + 1).map(_._2).map(o => s"$s >= $o").mkString(" AND ")
        s"WHEN $cond THEN '$lang'"
      }
      s"CASE ${cases.mkString(" ")} ELSE '${scores.last._1}' END"
    }
    /** Oracle twin of [[PolyHash]]. */
    def polyHash(c: String): String =
      s"list_reduce(list_transform(string_split($c, ''), ch -> CAST(unicode(ch) AS BIGINT)), " +
        s"(a, b) -> (a * 31 + b) % 2147483647)"
  }
}
