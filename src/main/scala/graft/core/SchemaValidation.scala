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

  // ---- deep validators (core/schema/validation.py:226-1334) ----

  /** Structure: version present (fixable) and at least one managed
    * resource section (validation.py:275-327).
    */
  val structureWellFormed: Validator = doc => {
    val missingVersion =
      if (!doc.managed.contains("version"))
        Seq(Finding("missing-version", "error", "version",
          "missing required 'version' field", autoFixable = true))
      else Nil
    val sections = Seq("models", "seeds", "sources")
    val noResources =
      if (!sections.exists(s => asSeqMap(doc.managed.getOrElse(s, Nil)).nonEmpty))
        Seq(Finding("no-resources", "error", "",
          s"YAML file must contain at least one of: ${sections.mkString(", ")}"))
      else Nil
    missingVersion ++ noResources
  }

  /** Known generic tests (validation.py:336-343). */
  val ValidTests: Set[String] = Set(
    "unique", "not_null", "unique_combination_of_columns",
    "relationships", "accepted_values")

  private def isStringList(v: Any): Boolean = v match {
    case s: Seq[_] => s.forall(_.isInstanceOf[String])
    case _ => false
  }

  /** Both legacy flat test args and dbt's nested `arguments` shape
    * (validation.py:618-649). Returns None (with a finding) when the
    * config is not a map.
    */
  private def testArguments(name: String, config: Any, path: String,
      out: scala.collection.mutable.ListBuffer[Finding]): Option[Map[String, Any]] =
    config match {
      case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[String, Any]]
        mm.get("arguments") match {
          case Some(a: Map[_, _]) => Some(a.asInstanceOf[Map[String, Any]])
          case Some(other) =>
            out += Finding("invalid-test-arguments", "error", path,
              s"$name test 'arguments' must be a map, got $other")
            None
          case None => Some(mm)
        }
      case other =>
        out += Finding("invalid-test-config-type", "error", path,
          s"$name test configuration must be a map, got $other")
        None
    }

  private def validateTestList(tests: Any, path: String,
      out: scala.collection.mutable.ListBuffer[Finding]): Unit = tests match {
    case list: Seq[_] =>
      list.zipWithIndex.foreach {
        case (s: String, _) =>
          if (!ValidTests(s))
            out += Finding("unknown-test", "warning", path, s"Unknown test '$s'")
        case (m: Map[_, _], i) =>
          val mm = m.asInstanceOf[Map[String, Any]]
          if (mm.size != 1)
            out += Finding("invalid-test-config", "warning", s"$path[$i]",
              "test configuration should have exactly one key")
          else {
            val (name, config) = mm.head
            name match {
              case "relationships" =>
                testArguments(name, config, s"$path[$i]", out).foreach { args =>
                  Seq("to", "field").foreach { f =>
                    if (!args.contains(f))
                      out += Finding("missing-relationship-field", "error", s"$path[$i]",
                        s"relationships test missing required field '$f'")
                  }
                }
              case "accepted_values" =>
                testArguments(name, config, s"$path[$i]", out).foreach { args =>
                  args.get("values") match {
                    case None =>
                      out += Finding("missing-accepted-values", "error", s"$path[$i]",
                        "accepted_values test missing required 'values' field")
                    case Some(v: Seq[_]) if v.isEmpty =>
                      out += Finding("empty-accepted-values", "warning", s"$path[$i]",
                        "'values' list is empty")
                    case Some(_: Seq[_]) => ()
                    case Some(other) =>
                      out += Finding("invalid-accepted-values-type", "error", s"$path[$i]",
                        s"'values' field must be a list, got $other")
                  }
                }
              case "unique_combination_of_columns" =>
                testArguments(name, config, s"$path[$i]", out).foreach { args =>
                  args.get("combination_of_columns") match {
                    case None =>
                      out += Finding("missing-combination-columns", "error", s"$path[$i]",
                        "unique_combination_of_columns test missing required " +
                          "'combination_of_columns' field")
                    case Some(v: Seq[_]) if v.size < 2 =>
                      out += Finding("insufficient-combination-columns", "warning",
                        s"$path[$i]",
                        "'combination_of_columns' should have at least 2 columns")
                    case Some(_: Seq[_]) => ()
                    case Some(other) =>
                      out += Finding("invalid-combination-type", "error", s"$path[$i]",
                        s"'combination_of_columns' must be a list, got $other")
                  }
                }
              case _ => ()
            }
          }
        case (other, i) =>
          out += Finding("invalid-test-type", "error", s"$path[$i]",
            s"test must be a string or map, got $other")
      }
    case null | None | Nil => ()
    case other =>
      out += Finding("invalid-tests-type", "error", path,
        s"tests must be a list, got $other")
  }

  /** Deep test-config shapes at resource and column level, including
    * `data_tests`/`tests` keys and per-test argument contracts
    * (validation.py:330-780).
    */
  val testConfigsDeep: Validator = doc => {
    val out = scala.collection.mutable.ListBuffer.empty[Finding]
    for {
      section <- Seq("models", "seeds")
      entry <- asSeqMap(doc.managed.getOrElse(section, Nil))
      entryName = entry.getOrElse("name", "?").toString
    } {
      entry.get("data_tests").orElse(entry.get("tests")).foreach(
        validateTestList(_, s"$section/$entryName/tests", out))
      asSeqMap(entry.getOrElse("columns", Nil)).foreach { col =>
        val colName = col.getOrElse("name", "?").toString
        col.get("data_tests").orElse(col.get("tests")).foreach(
          validateTestList(_, s"$section/$entryName/$colName/tests", out))
      }
      // versioned blocks carry the same shapes
      asSeqMap(entry.getOrElse("versions", Nil)).foreach { v =>
        val vName = s"$entryName.v${v.getOrElse("v", "?")}"
        v.get("data_tests").orElse(v.get("tests")).foreach(
          validateTestList(_, s"$section/$vName/tests", out))
        asSeqMap(v.getOrElse("columns", Nil)).foreach { col =>
          col.get("data_tests").orElse(col.get("tests")).foreach(
            validateTestList(_,
              s"$section/$vName/${col.getOrElse("name", "?")}/tests", out))
        }
      }
    }
    out.toSeq
  }

  /** meta must be a map, tags a list of strings — at entry and column
    * level.
    */
  val metaAndTagsTyped: Validator = doc => {
    val out = scala.collection.mutable.ListBuffer.empty[Finding]
    def check(m: Map[String, Any], path: String): Unit = {
      m.get("meta").foreach {
        case _: Map[_, _] => ()
        case other => out += Finding("invalid-meta-type", "error", s"$path/meta",
          s"'meta' must be a map, got $other")
      }
      m.get("tags").foreach {
        case t if isStringList(t) => ()
        case other => out += Finding("invalid-tags-type", "error", s"$path/tags",
          s"'tags' must be a list of strings, got $other")
      }
    }
    for {
      section <- Seq("models", "seeds", "sources")
      entry <- asSeqMap(doc.managed.getOrElse(section, Nil))
      entryName = entry.getOrElse("name", "?").toString
    } {
      check(entry, s"$section/$entryName")
      asSeqMap(entry.getOrElse("columns", Nil)).foreach(c =>
        check(c, s"$section/$entryName/${c.getOrElse("name", "?")}"))
    }
    out.toSeq
  }

  /** Versioned-model shapes (validation.py:786-935): versions is a
    * list of maps with scalar non-bool `v`, no duplicate versions
    * (numeric equivalence), latest_version declared, and
    * include/exclude column selectors well-formed.
    */
  val versionsWellFormed: Validator = doc => {
    val out = scala.collection.mutable.ListBuffer.empty[Finding]
    for {
      entry <- asSeqMap(doc.managed.getOrElse("models", Nil))
      modelName = entry.getOrElse("name", "?").toString
    } {
      val latest = entry.get("latest_version")
      entry.get("versions") match {
        case None =>
          latest.foreach { lv =>
            out += Finding("invalid-latest-version", "error", s"models/$modelName",
              s"latest version '$lv' must be one of the declared versions")
          }
        case Some(versions: Seq[_]) =>
          var seen = List.empty[Any]
          versions.zipWithIndex.foreach {
            case (m: Map[_, _], i) =>
              val v = m.asInstanceOf[Map[String, Any]]
              v.get("v") match {
                case None =>
                  out += Finding("missing-model-version", "error",
                    s"models/$modelName/versions[$i]", "missing required 'v' field")
                case Some(_: Boolean) =>
                  out += Finding("invalid-model-version", "error",
                    s"models/$modelName/versions[$i]",
                    "'v' must be an int, float, or string, got a boolean")
                case Some(value) if value.isInstanceOf[Int] ||
                    value.isInstanceOf[Long] || value.isInstanceOf[Double] ||
                    value.isInstanceOf[String] || value.isInstanceOf[java.math.BigDecimal] =>
                  if (seen.exists(s => SyncOperations.versionValuesMatch(s, value)))
                    out += Finding("duplicate-model-version", "error",
                      s"models/$modelName/versions[$i]",
                      s"duplicate version '$value'")
                  seen ::= value
                case Some(other) =>
                  out += Finding("invalid-model-version", "error",
                    s"models/$modelName/versions[$i]",
                    s"'v' must be an int, float, or string, got $other")
              }
              // include/exclude selectors in version columns (at most
              // one per version block, validation.py:493-505)
              val selectors = asSeqMap(v.getOrElse("columns", Nil))
                .filter(c => !c.get("name").exists(_.isInstanceOf[String]))
              if (selectors.size > 1)
                out += Finding("invalid-version-column-selector", "error",
                  s"models/$modelName/versions[$i]/columns",
                  "at most one include/exclude column selector per version")
              selectors.foreach { sel =>
                  val p = s"models/$modelName/versions[$i]/columns"
                  sel.get("include") match {
                    case None =>
                      out += Finding("invalid-version-column-selector", "error", p,
                        "column selector must define 'include'")
                    case Some(s: String) if s == "all" || s == "*" => ()
                    case Some(l) if isStringList(l) => ()
                    case Some(other) =>
                      out += Finding("invalid-version-column-selector", "error", p,
                        s"'include' must be 'all', '*', or a list of strings, got $other")
                  }
                  sel.get("exclude").foreach { ex =>
                    if (!isStringList(ex))
                      out += Finding("invalid-version-column-selector", "error", p,
                        s"'exclude' must be a list of strings, got $ex")
                    else if (!sel.get("include").exists {
                      case s: String => s == "all" || s == "*"
                      case _ => false
                    })
                      out += Finding("invalid-version-column-selector", "error", p,
                        "'exclude' can only be specified when include is 'all' or '*'")
                  }
                }
            case (other, i) =>
              out += Finding("invalid-model-version-entry", "error",
                s"models/$modelName/versions[$i]",
                s"version entry must be a map, got $other")
          }
          latest.foreach { lv =>
            val scalar = !lv.isInstanceOf[Boolean] && (lv.isInstanceOf[Int] ||
              lv.isInstanceOf[Long] || lv.isInstanceOf[Double] || lv.isInstanceOf[String])
            if (!scalar)
              out += Finding("invalid-latest-version", "error", s"models/$modelName",
                s"latest_version must be an int, float, or string, got $lv")
            else if (!seen.exists(s => SyncOperations.versionValuesMatch(s, lv)))
              out += Finding("invalid-latest-version", "error", s"models/$modelName",
                s"latest version '$lv' must be one of the declared versions")
          }
        case Some(other) =>
          out += Finding("invalid-versions-type", "error", s"models/$modelName",
            s"versions must be a list, got $other")
      }
    }
    out.toSeq
  }

  /** Entries must be maps and names strings (reference
    * INVALID_MODEL_TYPE / INVALID_MODEL_NAME and the seed/source
    * equivalents, validation.py:955-1140) — `asSeqMap` silently drops
    * non-map entries elsewhere in the chain, so this is the validator
    * that REPORTS them.
    */
  val entriesTyped: Validator = doc => {
    val out = scala.collection.mutable.ListBuffer.empty[Finding]
    for (section <- Seq("models", "seeds", "sources")) {
      doc.managed.getOrElse(section, Nil) match {
        case entries: Seq[_] =>
          entries.zipWithIndex.foreach {
            case (m: Map[_, _], i) =>
              m.asInstanceOf[Map[String, Any]].get("name").foreach {
                case _: String => ()
                case other =>
                  out += Finding("invalid-entry-name", "error", s"$section[$i]",
                    s"name must be a string, got $other")
              }
            case (other, i) =>
              out += Finding("invalid-entry-type", "error", s"$section[$i]",
                s"entry in '$section' must be a map, got $other")
          }
        case Nil => ()
        case other =>
          out += Finding("invalid-section-type", "error", section,
            s"'$section' must be a list, got $other")
      }
    }
    out.toSeq
  }

  /** Columns must be a LIST of MAPS with string names (reference
    * INVALID_COLUMNS_TYPE / INVALID_COLUMN_TYPE / INVALID_COLUMN_NAME,
    * validation.py:458-523). `columnsWellFormed` covers missing names
    * and duplicates; this covers the type contracts.
    */
  val columnsTyped: Validator = doc => {
    val out = scala.collection.mutable.ListBuffer.empty[Finding]
    for {
      section <- Seq("models", "seeds")
      entry <- asSeqMap(doc.managed.getOrElse(section, Nil))
      entryName = entry.getOrElse("name", "?").toString
    } entry.get("columns").foreach {
      case cols: Seq[_] =>
        cols.zipWithIndex.foreach {
          case (m: Map[_, _], _) =>
            m.asInstanceOf[Map[String, Any]].get("name").foreach {
              case _: String => ()
              case other =>
                out += Finding("invalid-column-name", "error",
                  s"$section/$entryName/columns",
                  s"column name must be a string, got $other")
            }
          case (other, i) =>
            out += Finding("invalid-column-type", "error",
              s"$section/$entryName/columns[$i]",
              s"column must be a map, got $other")
        }
      case other =>
        out += Finding("invalid-columns-type", "error", s"$section/$entryName",
          s"columns must be a list, got $other")
    }
    out.toSeq
  }

  /** Source table contracts (reference SourceValidator,
    * validation.py:996-1090): tables present (warning), a list of
    * maps with string names; table-level tests and columns share the
    * deep test validators.
    */
  val sourcesWellFormed: Validator = doc => {
    val out = scala.collection.mutable.ListBuffer.empty[Finding]
    for {
      (source, i) <- asSeqMap(doc.managed.getOrElse("sources", Nil)).zipWithIndex
      sourceName = source.getOrElse("name", s"sources[$i]").toString
    } source.get("tables") match {
      case None =>
        out += Finding("missing-source-tables", "warning", s"sources/$sourceName",
          s"Source '$sourceName' has no tables defined")
      case Some(tables: Seq[_]) =>
        tables.zipWithIndex.foreach {
          case (m: Map[_, _], ti) =>
            val table = m.asInstanceOf[Map[String, Any]]
            table.get("name") match {
              case None =>
                out += Finding("missing-source-table-name", "error",
                  s"sources/$sourceName/tables[$ti]",
                  "table is missing required 'name' field")
              case Some(_: String) =>
                val tName = table("name").toString
                table.get("data_tests").orElse(table.get("tests")).foreach(
                  validateTestList(_, s"sources/$sourceName/$tName/tests", out))
                asSeqMap(table.getOrElse("columns", Nil)).foreach { col =>
                  col.get("data_tests").orElse(col.get("tests")).foreach(
                    validateTestList(_,
                      s"sources/$sourceName/$tName/${col.getOrElse("name", "?")}/tests",
                      out))
                }
              case Some(other) =>
                out += Finding("invalid-source-table-name", "error",
                  s"sources/$sourceName/tables[$ti]",
                  s"table name must be a string, got $other")
            }
          case (other, ti) =>
            out += Finding("invalid-source-table-type", "error",
              s"sources/$sourceName/tables[$ti]",
              s"table must be a map, got $other")
        }
      case Some(other) =>
        out += Finding("invalid-source-tables-type", "error",
          s"sources/$sourceName", s"'tables' must be a list, got $other")
    }
    out.toSeq
  }

  /** Top-level keys dbt-osmosis preserves but does not manage get a
    * visibility warning (reference UNMANAGED_TOP_LEVEL_KEYS,
    * validation.py:1290-1300).
    */
  val unmanagedKeysWarned: Validator = doc =>
    if (doc.preserved.nonEmpty)
      Seq(Finding("unmanaged-top-level-keys", "warning",
        doc.preserved.keys.toSeq.sorted.mkString(", "),
        "these top-level keys are preserved but not validated or mutated"))
    else Nil

  val DefaultChain: Seq[Validator] = Seq(
    structureWellFormed, entriesTyped, entriesHaveNames, noDuplicateEntries,
    columnsWellFormed, columnsTyped, versionIsTwo, testsWellFormed,
    testConfigsDeep, metaAndTagsTyped, versionsWellFormed, sourcesWellFormed)

  /** Raw-text formatting checks (reference FormattingValidator,
    * validation.py:1141-1203): trailing whitespace per line (warning,
    * fixable), >2 consecutive blank lines (info, fixable), CRLF line
    * endings (info, fixable).
    */
  def validateFormatting(raw: String): Seq[Finding] = {
    val out = scala.collection.mutable.ListBuffer.empty[Finding]
    raw.split("\n", -1).zipWithIndex.foreach { case (l, i) =>
      if (l.stripSuffix("\r").endsWith(" "))
        out += Finding("trailing-whitespace", "warning", s"line ${i + 1}",
          s"Line ${i + 1} has trailing whitespace", autoFixable = true)
    }
    if (raw.contains("\n\n\n"))
      out += Finding("excessive-blank-lines", "info", "",
        "File has excessive blank lines (more than 2 consecutive)",
        autoFixable = true)
    if (raw.contains("\r"))
      out += Finding("crlf-line-endings", "info", "",
        "File contains CRLF line endings (should be LF)", autoFixable = true)
    out.toSeq
  }

  /** Cross-FILE duplicate detection over a whole project's schema
    * docs: the per-file `noDuplicateEntries` cannot see a model
    * declared in two different YAML files (dbt fails the parse with a
    * duplicate-resource error, so this surfaces it before a write
    * makes it worse). Sources dedup on (source, table).
    */
  def validateCrossFile(
      docs: Seq[(java.nio.file.Path, YamlIO.YamlDoc)]): Seq[Finding] = {
    val out = scala.collection.mutable.ListBuffer.empty[Finding]
    def dupsOf(names: Seq[(String, java.nio.file.Path)], kind: String): Unit =
      names.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (name, occ) =>
        val files = occ.map(_._2).distinct
        if (files.size > 1)
          out += Finding(s"cross-file-duplicate-$kind", "error",
            files.mkString(", "),
            s"$kind '$name' is declared in ${files.size} files")
      }
    def names(section: String): Seq[(String, java.nio.file.Path)] = for {
      (path, doc) <- docs
      entry <- asSeqMap(doc.managed.getOrElse(section, Nil))
      name <- entry.get("name").collect { case s: String => s }
    } yield name -> path
    dupsOf(names("models"), "model")
    dupsOf(names("seeds"), "seed")
    val tables = for {
      (path, doc) <- docs
      src <- asSeqMap(doc.managed.getOrElse("sources", Nil))
      srcName <- src.get("name").collect { case s: String => s }.toSeq
      table <- asSeqMap(src.getOrElse("tables", Nil))
      tName <- table.get("name").collect { case s: String => s }.toSeq
    } yield s"$srcName.$tName" -> path
    dupsOf(tables, "source-table")
    out.toSeq
  }

  def validate(doc: YamlIO.YamlDoc,
      chain: Seq[Validator] = DefaultChain): Seq[Finding] =
    chain.flatMap(_(doc))

  /** Apply the auto-fixable findings (validation.py's auto_fix mode):
    * missing/invalid `version` is set to 2. Returns the fixed doc and
    * the findings that were addressed.
    */
  def autoFix(doc: YamlIO.YamlDoc): (YamlIO.YamlDoc, Seq[Finding]) = {
    val fixable = validate(doc).filter(_.autoFixable)
    val fixed =
      if (fixable.exists(f => f.rule == "schema-version" || f.rule == "missing-version"))
        doc.copy(managed = scala.collection.immutable.ListMap(
          (doc.managed.updated("version", 2)).toSeq: _*))
      else doc
    (fixed, fixable)
  }
}
