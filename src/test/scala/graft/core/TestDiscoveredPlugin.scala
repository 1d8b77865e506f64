package graft.core

/** ServiceLoader-discovered test plugin (wired via
  * src/test/resources/META-INF/services/graft.core.ColumnCandidatePlugin):
  * contributes a `<name>_svc` variant, exercising the classpath
  * discovery path end-to-end.
  */
final class TestDiscoveredPlugin extends ColumnCandidatePlugin {
  override def getCandidates(name: String, node: NodeMeta,
      settings: EngineSettings): Seq[String] = Seq(name + "_svc")
}
