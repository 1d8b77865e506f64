package graft.core

/** Fuzzy string similarity for rename detection (A37's WRatio ≥ 85
  * greedy matching, core/diff.py:450-478). Reimplemented from the
  * published fuzzywuzzy/RapidFuzz algorithm description: a weighted
  * composite of indel ratio, partial ratio, and token-sort/set ratios.
  * Pure functions — usable driver-side or wrapped in an Expression if
  * rename detection ever needs to run over millions of columns.
  */
object Fuzzy {

  /** Indel distance (Levenshtein with substitutions counted as
    * insert+delete, i.e. LCS-based).
    */
  private def indelDistance(a: String, b: String): Int = {
    if (a.isEmpty) return b.length
    if (b.isEmpty) return a.length
    val prev = new Array[Int](b.length + 1)
    val curr = new Array[Int](b.length + 1)
    for (j <- 0 to b.length) prev(j) = j
    for (i <- 1 to a.length) {
      curr(0) = i
      for (j <- 1 to b.length) {
        curr(j) =
          if (a(i - 1) == b(j - 1)) prev(j - 1)
          else math.min(prev(j) + 1, curr(j - 1) + 1)
      }
      Array.copy(curr, 0, prev, 0, b.length + 1)
    }
    prev(b.length)
  }

  /** Basic similarity: 100 · (1 − indel/(|a|+|b|)). */
  def ratio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 100.0
    100.0 * (1.0 - indelDistance(a, b).toDouble / (a.length + b.length))
  }

  /** Best ratio of the shorter string against any same-length window
    * of the longer string.
    */
  def partialRatio(a: String, b: String): Double = {
    val (s, l) = if (a.length <= b.length) (a, b) else (b, a)
    if (s.isEmpty) return if (l.isEmpty) 100.0 else 0.0
    if (s.length == l.length) return ratio(s, l)
    (0 to (l.length - s.length)).map(i => ratio(s, l.substring(i, i + s.length))).max
  }

  private def tokens(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  def tokenSortRatio(a: String, b: String): Double =
    ratio(tokens(a).sorted.mkString(" "), tokens(b).sorted.mkString(" "))

  def tokenSetRatio(a: String, b: String): Double = {
    val ta = tokens(a).toSet
    val tb = tokens(b).toSet
    val inter = (ta & tb).toSeq.sorted.mkString(" ")
    val diffA = (ta -- tb).toSeq.sorted.mkString(" ")
    val diffB = (tb -- ta).toSeq.sorted.mkString(" ")
    val combinedA = if (diffA.isEmpty) inter else if (inter.isEmpty) diffA else s"$inter $diffA"
    val combinedB = if (diffB.isEmpty) inter else if (inter.isEmpty) diffB else s"$inter $diffB"
    Seq(ratio(inter, combinedA), ratio(inter, combinedB), ratio(combinedA, combinedB)).max
  }

  /** Weighted composite (WRatio): plain+token ratios for similar
    * lengths; partial ratios scaled by 0.9 (or 0.6 for very different
    * lengths) otherwise.
    */
  def wratio(a: String, b: String): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val base = ratio(a, b)
    val lenRatio = math.max(a.length, b.length).toDouble / math.min(a.length, b.length)
    if (lenRatio < 1.5)
      Seq(base, tokenSortRatio(a, b) * 0.95, tokenSetRatio(a, b) * 0.95).max
    else {
      val scale = if (lenRatio < 8.0) 0.9 else 0.6
      Seq(base,
        partialRatio(a, b) * scale,
        tokenSortRatio(a, b) * 0.95 * scale,
        tokenSetRatio(a, b) * 0.95 * scale).max
    }
  }

  /** Greedy best-match extraction (reference `process.extractOne`):
    * highest score wins; ties broken by candidate order.
    */
  def extractOne(query: String, candidates: Seq[String], cutoff: Double): Option[(String, Double)] = {
    val scored = candidates.map(c => c -> wratio(query, c))
    scored.sortBy(-_._2).headOption.filter(_._2 >= cutoff)
  }
}
