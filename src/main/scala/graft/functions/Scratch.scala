package graft.functions

/** Fixed, per-(name, input-dir) scratch locations for queries that
  * materialize at-rest artifacts (sinks under test, stream state,
  * checkpoints, oracle-readable index dumps). A FIXED path keyed by
  * the inputs replaces per-call temp dirs: repeated verify/bench runs
  * reuse (or wipe) the same location instead of leaking disk
  * unboundedly.
  */
object Scratch {

  /** Deterministic path for (name, dir) — no filesystem side effects,
    * so oracle SQL bindings can derive the same location. */
  def pathOf(name: String, dir: String): String = {
    val key = java.lang.Integer.toHexString(dir.hashCode)
    java.nio.file.Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft_scratch", s"${name}_$key").toString
  }

  /** Stable location — for callers that write with mode("overwrite"),
    * which clears the previous run's content itself. */
  def stable(name: String, dir: String): String = {
    val p = java.nio.file.Paths.get(pathOf(name, dir))
    java.nio.file.Files.createDirectories(p)
    p.toString
  }

  /** Wiped location — for append sinks and stream checkpoints, where
    * stale content would duplicate rows or silently skip the ingest. */
  def fresh(name: String, dir: String): String = {
    val p = java.nio.file.Paths.get(pathOf(name, dir))
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      // Files.walk holds directory handles until closed — collect the
      // paths under Using so a long-lived JVM doesn't leak one per run.
      val paths = scala.util.Using.resource(java.nio.file.Files.walk(p)) {
        _.iterator().asScala.toSeq
      }
      paths.reverse.foreach(java.nio.file.Files.delete)
    }
    java.nio.file.Files.createDirectories(p)
    p.toString
  }
}
