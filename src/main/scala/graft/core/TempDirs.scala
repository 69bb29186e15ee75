package graft.core

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Session-scoped staging-dir registry.
  *
  * Operators that exercise a real write→read artifact tier (persisted
  * dictionaries in [[graft.rdf.Dict]], schema-evolution snapshots in
  * [[graft.sources.SchemaEvolution]]) stage parquet under a temp dir.
  * Creating a fresh dir per invocation leaks disk across repeated
  * Verify/Bench runs and charges the staging WRITE to every timed call
  * (ADVICE r7) — so staging goes through this registry instead:
  * [[stagedFor]] memoizes one write per key (later calls are a pure
  * read of the already-written artifact, matching production where the
  * artifact exists before the query), and a JVM shutdown hook removes
  * every registered dir on exit.
  */
object TempDirs {

  private val dirs = new java.util.concurrent.ConcurrentLinkedQueue[Path]()
  private val keyed = scala.collection.concurrent.TrieMap.empty[Any, Holder]

  private final class Holder(prefix: String, write: String => Unit) {
    lazy val path: String = {
      val p = create(prefix)
      write(p)
      p
    }
  }

  Runtime.getRuntime.addShutdownHook(new Thread(() => deleteAll()))

  /** New registered temp dir (removed on JVM exit). */
  def create(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    dirs.add(p)
    p.toString
  }

  /** Memoized staging dir: `write` runs ONCE per key (racing callers
    * share the single winner, as in [[DfCache]]); the returned path is
    * the already-written artifact thereafter.
    */
  def stagedFor(key: Any, prefix: String)(write: String => Unit): String = {
    val h = new Holder(prefix, write)
    keyed.putIfAbsent(key, h).getOrElse(h).path
  }

  private def deleteAll(): Unit = {
    dirs.forEach { root =>
      try {
        Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => { try Files.delete(p) catch { case _: Throwable => () } })
      } catch { case _: Throwable => () }
    }
    dirs.clear()
    keyed.clear()
  }
}
