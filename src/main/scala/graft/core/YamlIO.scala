package graft.core

import java.nio.file.{Files, Path, StandardCopyOption}

import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.{DumperOptions, Yaml}

/** Round-trip YAML I/O for schema files (A31/A32;
  * core/schema/reader.py, writer.py): managed sections
  * (version/models/sources/seeds/unit_tests/data_tests) are parsed and
  * rewritten; ALL other top-level keys are preserved verbatim across a
  * write — the reference's actual preservation guarantee
  * (core/schema/parser.py:49-65). Writes are atomic
  * (temp file + size validation + ATOMIC_MOVE), reads go through an
  * LRU(256) buffer cache with dirty pinning.
  *
  * Divergence from the reference (documented, SURVEY §7 risk 1):
  * in-section comments/anchors are not preserved — snakeyaml has no
  * round-trip mode; unmanaged keys pass through structurally.
  */
object YamlIO {

  val ManagedKeys: Seq[String] =
    Seq("version", "models", "sources", "seeds", "unit_tests", "data_tests")

  final case class YamlDoc(
      managed: ListMap[String, Any],
      preserved: ListMap[String, Any]) {
    def full: ListMap[String, Any] = managed ++ preserved
  }

  private val MaxCacheEntries = 256
  private final case class CacheEntry(doc: YamlDoc, var dirty: Boolean)
  private val cache = new java.util.LinkedHashMap[Path, CacheEntry](64, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[Path, CacheEntry]): Boolean =
      size() > MaxCacheEntries && !e.getValue.dirty // dirty entries pinned
  }

  private def newYaml(): Yaml = {
    val opts = new DumperOptions
    opts.setDefaultFlowStyle(DumperOptions.FlowStyle.BLOCK)
    opts.setIndent(2)
    opts.setIndicatorIndent(0)
    opts.setWidth(120)
    new Yaml(opts)
  }

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      ListMap(m.asScala.toSeq.map { case (k, value) => k.toString -> toScala(value) }: _*)
    case l: java.util.List[_] => l.asScala.toSeq.map(toScala)
    case other => other
  }

  private def toJava(v: Any): Any = v match {
    case m: Map[_, _] =>
      val out = new java.util.LinkedHashMap[String, Any]()
      m.foreach { case (k, value) => out.put(k.toString, toJava(value)) }
      out
    case s: Seq[_] => s.map(toJava).asJava
    case other => other
  }

  def partition(doc: Map[String, Any]): YamlDoc = YamlDoc(
    managed = ListMap(doc.toSeq.filter { case (k, _) => ManagedKeys.contains(k) }: _*),
    preserved = ListMap(doc.toSeq.filterNot { case (k, _) => ManagedKeys.contains(k) }: _*))

  /** Cached read; missing file → empty doc. */
  def read(path: Path): YamlDoc = cache.synchronized {
    Option(cache.get(path)).map(_.doc).getOrElse {
      val doc =
        if (!Files.exists(path)) YamlDoc(ListMap.empty, ListMap.empty)
        else toScala(newYaml().load[Any](Files.readString(path))) match {
          case m: Map[_, _] => partition(m.asInstanceOf[Map[String, Any]])
          case _ => YamlDoc(ListMap.empty, ListMap.empty)
        }
      cache.put(path, CacheEntry(doc, dirty = false))
      doc
    }
  }

  /** Buffer an updated doc (pins the cache entry until committed). */
  def buffer(path: Path, doc: YamlDoc): Unit = cache.synchronized {
    cache.put(path, CacheEntry(doc, dirty = true))
  }

  /** Atomic write: dump managed+preserved, write to a unique temp
    * file, validate non-empty, ATOMIC_MOVE into place
    * (core/schema/writer.py:90-106,170-210).
    */
  def write(path: Path, doc: YamlDoc): Unit = {
    Option(path.getParent).foreach(Files.createDirectories(_))
    val text = newYaml().dump(toJava(doc.full))
    val tmp = Files.createTempFile(path.getParent, s".${path.getFileName}", ".tmp")
    try {
      Files.writeString(tmp, text)
      if (Files.size(tmp) == 0 && text.nonEmpty)
        throw new IllegalStateException(s"validation failed writing $path")
      Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
    cache.synchronized { cache.put(path, CacheEntry(doc, dirty = false)) }
  }

  /** Paths of dirty (buffered, uncommitted) docs — the would-write
    * set a dry run reports instead of committing.
    */
  def pending(): Seq[Path] = cache.synchronized {
    cache.asScala.toSeq.collect { case (p, e) if e.dirty => p }.sorted
  }

  /** Commit all dirty buffered docs; returns the written paths. */
  def commit(): Seq[Path] = cache.synchronized {
    val dirty = cache.asScala.toSeq.collect { case (p, e) if e.dirty => p -> e }
    dirty.foreach { case (p, e) => write(p, e.doc) }
    dirty.map(_._1)
  }

  def invalidate(): Unit = cache.synchronized(cache.clear())
}
