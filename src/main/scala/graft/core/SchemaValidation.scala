package graft.core

/** YAML structural validation (A44; core/schema/validation.py): a
  * validator chain over parsed schema docs producing severity-tagged
  * findings, with auto-fixable flags. Runs before writes so malformed
  * docs fail closed rather than round-tripping garbage.
  */
object SchemaValidation {

  final case class Finding(
      rule: String, severity: String, path: String, message: String,
      autoFixable: Boolean = false)

  type Validator = YamlIO.YamlDoc => Seq[Finding]

  private def asSeqMap(v: Any): Seq[Map[String, Any]] = v match {
    case s: Seq[_] => s.collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
    case _ => Nil
  }

  /** Every model/seed/source entry must carry a name. */
  val entriesHaveNames: Validator = doc =>
    for {
      section <- Seq("models", "seeds", "sources")
      (entry, i) <- asSeqMap(doc.managed.getOrElse(section, Nil)).zipWithIndex
      if !entry.get("name").exists(_.toString.nonEmpty)
    } yield Finding("entry-name", "error", s"$section[$i]",
      s"entry in '$section' is missing a name")

  /** No duplicate entry names within a section. */
  val noDuplicateEntries: Validator = doc =>
    for {
      section <- Seq("models", "seeds")
      entries = asSeqMap(doc.managed.getOrElse(section, Nil))
      (name, group) <- entries.flatMap(_.get("name").map(_.toString))
        .groupBy(identity).toSeq.sortBy(_._1)
      if group.size > 1
    } yield Finding("duplicate-entry", "error", section,
      s"'$name' appears ${group.size} times in '$section'")

  /** Columns must be a list of maps each with a name; no dup columns. */
  val columnsWellFormed: Validator = doc =>
    (for {
      section <- Seq("models", "seeds")
      entry <- asSeqMap(doc.managed.getOrElse(section, Nil))
      entryName = entry.getOrElse("name", "?").toString
      cols = asSeqMap(entry.getOrElse("columns", Nil))
    } yield {
      val missing = cols.zipWithIndex.collect {
        case (c, i) if !c.get("name").exists(_.toString.nonEmpty) =>
          Finding("column-name", "error", s"$section/$entryName/columns[$i]",
            "column missing a name")
      }
      val dups = cols.flatMap(_.get("name").map(_.toString))
        .groupBy(identity).filter(_._2.size > 1).keys.toSeq.sorted.map(n =>
          Finding("duplicate-column", "error", s"$section/$entryName",
            s"column '$n' declared more than once"))
      missing ++ dups
    }).flatten

  /** Version must be 2 when present (dbt schema contract). */
  val versionIsTwo: Validator = doc =>
    doc.managed.get("version") match {
      case Some(v) if v.toString != "2" =>
        Seq(Finding("schema-version", "warning", "version",
          s"expected version 2, found $v", autoFixable = true))
      case _ => Nil
    }

  /** Test configs must be strings or single-key maps (dbt generic
    * test shorthand).
    */
  val testsWellFormed: Validator = doc =>
    for {
      section <- Seq("models", "seeds")
      entry <- asSeqMap(doc.managed.getOrElse(section, Nil))
      entryName = entry.getOrElse("name", "?").toString
      col <- asSeqMap(entry.getOrElse("columns", Nil))
      tests = col.getOrElse("tests", Nil) match {
        case s: Seq[_] => s
        case other if other != Nil => Seq(other)
        case _ => Nil
      }
      (t, i) <- tests.zipWithIndex
      ok = t match {
        case _: String => true
        case m: Map[_, _] => m.size == 1
        case _ => false
      }
      if !ok
    } yield Finding("test-config", "error",
      s"$section/$entryName/${col.getOrElse("name", "?")}/tests[$i]",
      s"test entry must be a string or single-key map, found: $t")

  val DefaultChain: Seq[Validator] = Seq(
    entriesHaveNames, noDuplicateEntries, columnsWellFormed,
    versionIsTwo, testsWellFormed)

  def validate(doc: YamlIO.YamlDoc,
      chain: Seq[Validator] = DefaultChain): Seq[Finding] =
    chain.flatMap(_(doc))
}
