package graft.core

import java.nio.file.Path

import scala.collection.immutable.ListMap

import org.apache.spark.sql.SparkSession

/** Missing-source bootstrap (A30; core/path_management.py:288-481):
  * for source schemas the project declares (via
  * vars.dbt-osmosis.sources routing) but the manifest lacks, list the
  * live relations, introspect each, and write source YAML; for
  * existing sources, add net-new database tables.
  */
object SourceBootstrap {

  /** Declared source routes: source name → YAML path template. */
  def declaredSources(settings: EngineSettings): Map[String, String] =
    settings.vars.get("dbt-osmosis") match {
      case Some(m: Map[_, _]) =>
        m.asInstanceOf[Map[String, Any]].get("sources") match {
          case Some(s: Map[_, _]) => s.asInstanceOf[Map[String, Any]].collect {
            case (k, v: String) => k -> v
            case (k, v: Map[_, _]) =>
              k -> v.asInstanceOf[Map[String, Any]].getOrElse("path", s"$k.yml").toString
          }
          case _ => Map.empty
        }
      case _ => Map.empty
    }

  /** Create source nodes for live tables missing from the manifest;
    * returns the updated manifest plus the touched YAML paths.
    */
  def createMissingSources(spark: SparkSession, projectRoot: Path,
      manifest: Manifest, settings: EngineSettings,
      tablesForSource: String => Seq[String],
      packageName: String = "project"): (Manifest, Seq[Path]) = {
    var m = manifest
    val touched = scala.collection.mutable.ListBuffer.empty[Path]
    for ((srcName, pathTpl) <- declaredSources(settings).toSeq.sortBy(_._1)) {
      val newNodes = for {
        tbl <- tablesForSource(srcName)
        uid = s"source.$packageName.$srcName.$tbl"
        if m.get(uid).isEmpty
      } yield {
        val cols = Introspection.getColumns(spark, tbl, settings)
        NodeMeta(
          uniqueId = uid, name = tbl, resourceType = "source",
          schema = srcName, packageName = packageName,
          fqn = Seq(packageName, srcName, tbl),
          path = pathTpl.stripSuffix(".yml") + ".yml",
          columns = ListMap(cols.values.toSeq.map(c =>
            c.name -> ColumnMeta(c.name, dataType = Some(c.dataType))): _*))
      }
      if (newNodes.nonEmpty) {
        newNodes.foreach(n => m = m.updated(n))
        val yamlPath = projectRoot.resolve("models").resolve(
          pathTpl.stripSuffix(".yml") + ".yml")
        var doc = YamlIO.read(yamlPath)
        newNodes.foreach(n => doc = SyncOperations.syncNodeToDoc(doc, n))
        YamlIO.buffer(yamlPath, doc)
        touched += yamlPath
      }
    }
    YamlIO.commit()
    (m, touched.toSeq)
  }
}
