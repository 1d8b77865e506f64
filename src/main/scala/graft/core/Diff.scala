package graft.core

import scala.collection.immutable.ListMap

import graft.core.Introspection.IntrospectedColumn

/** Schema diff between YAML-documented columns and the live warehouse
  * schema (A37; core/diff.py:244-565): added / removed / renamed
  * (fuzzy WRatio ≥ threshold, greedy) / type-changed with severity
  * classification.
  */
object Diff {

  sealed trait Severity { def rank: Int }
  case object Safe extends Severity { val rank = 0 }
  case object Moderate extends Severity { val rank = 1 }
  case object Breaking extends Severity { val rank = 2 }

  sealed trait SchemaChange {
    def node: String
    def severity: Severity
    def description: String
  }
  final case class ColumnAdded(node: String, column: String, dataType: Option[String])
      extends SchemaChange {
    val severity: Severity = Safe
    def description = s"Column '$column' added to $node"
  }
  final case class ColumnRemoved(node: String, column: String, dataType: Option[String])
      extends SchemaChange {
    val severity: Severity = Moderate
    def description = s"Column '$column' removed from database in $node"
  }
  final case class ColumnRenamed(node: String, oldName: String, newName: String,
      similarity: Double, dataType: Option[String]) extends SchemaChange {
    val severity: Severity = Safe
    def description = s"Column '$oldName' renamed to '$newName' in $node"
  }
  final case class TypeChanged(node: String, column: String, oldType: String,
      newType: String, severity: Severity) extends SchemaChange {
    def description = s"Column '$column' type changed $oldType -> $newType in $node"
  }

  final case class DiffResult(node: String, changes: Seq[SchemaChange]) {
    def hasBreaking: Boolean = changes.exists(_.severity == Breaking)
  }

  /** Conservative normalization for type equality: lowercase, strip
    * whitespace (core/diff.py:482-484).
    */
  def normalizeType(t: String): String = t.toLowerCase.split("\\s+").mkString

  private val TypeFamilies: Map[String, Set[String]] = Map(
    "integer" -> Set("int", "integer", "smallint", "bigint", "tinyint"),
    "float" -> Set("float", "double", "real", "doubleprecision"),
    "text" -> Set("text", "varchar", "char", "character", "string", "clob"),
    "boolean" -> Set("bool", "boolean", "bit"),
    "timestamp" -> Set("timestamp", "datetime", "timestamptz"),
    "date" -> Set("date"),
    "numeric" -> Set("numeric", "decimal", "number", "dec"))

  private def parseType(t: String): (String, Option[Int], Option[Int]) = {
    val m = "(\\w+)(?:\\((\\d+)(?:,(\\d+))?\\))?".r.findPrefixMatchOf(t.toLowerCase)
    m.map(g => (g.group(1),
      Option(g.group(2)).map(_.toInt), Option(g.group(3)).map(_.toInt)))
      .getOrElse((t.toLowerCase, None, None))
  }

  /** Precision/scale/int-rank narrowing check (core/diff.py:528-565). */
  private[core] def isNarrowing(oldT: String, newT: String): Boolean = {
    val (ob, op, os) = parseType(oldT)
    val (nb, np, ns) = parseType(newT)
    if (ob == nb) {
      if (op.isDefined && np.isDefined && np.get < op.get) return true
      if (os.isDefined && ns.isDefined && ns.get < os.get) return true
    }
    val order = Seq("bigint", "int", "integer", "smallint", "tinyint")
    if (order.contains(ob) && order.contains(nb))
      return order.indexOf(ob) < order.indexOf(nb)
    false
  }

  /** Severity of a type change: equal → SAFE; same family → SAFE
    * unless narrowing → MODERATE; cross-family → BREAKING
    * (core/diff.py:486-526).
    */
  def classifyTypeChange(oldType: String, newType: String): Severity = {
    val o = normalizeType(oldType)
    val n = normalizeType(newType)
    if (o == n) return Safe
    val sameFamily = TypeFamilies.values.exists(fam =>
      fam.exists(o.contains) && fam.exists(n.contains))
    if (sameFamily) { if (isNarrowing(o, n)) Moderate else Safe }
    else Breaking
  }

  /** Compare one node's documented columns vs the database schema. */
  def compareNode(node: NodeMeta, dbColumns: ListMap[String, IntrospectedColumn],
      fuzzyThreshold: Double = 85.0): DiffResult = {
    val yamlCols = node.columns
    val added0 = dbColumns.keys.filterNot(yamlCols.contains).toSeq
    val removed0 = yamlCols.keys.filterNot(dbColumns.contains).toSeq

    // rename detection: greedy over sorted removed, best WRatio match
    // among remaining added (core/diff.py:429-479)
    var available = added0.sorted
    val renames = removed0.sorted.flatMap { oldName =>
      Fuzzy.extractOne(oldName, available, fuzzyThreshold).map { case (newName, score) =>
        available = available.filterNot(_ == newName)
        ColumnRenamed(node.name, oldName, newName, score,
          dbColumns.get(newName).map(_.dataType))
      }
    }
    val renamedOld = renames.map(_.oldName).toSet
    val renamedNew = renames.map(_.newName).toSet

    val added = added0.filterNot(renamedNew).map(c =>
      ColumnAdded(node.name, c, dbColumns.get(c).map(_.dataType)))
    val removed = removed0.filterNot(renamedOld).map(c =>
      ColumnRemoved(node.name, c, yamlCols(c).dataType))

    val typeChanges = yamlCols.collect {
      case (name, col) if dbColumns.contains(name) &&
          col.dataType.exists(dt =>
            normalizeType(dt) != normalizeType(dbColumns(name).dataType)) =>
        val oldT = col.dataType.get
        val newT = dbColumns(name).dataType
        TypeChanged(node.name, name, oldT, newT, classifyTypeChange(oldT, newT))
    }.toSeq

    DiffResult(node.name, added ++ removed ++ renames ++ typeChanges)
  }
}
