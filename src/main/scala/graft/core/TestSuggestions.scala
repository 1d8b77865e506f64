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
