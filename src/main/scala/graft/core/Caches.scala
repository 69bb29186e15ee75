package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Per-key persisted-DataFrame cache with central eviction.
  *
  * Dict / TpchGraph / Dedup memoize session-scoped persisted frames
  * (dictionaries, triple views, shingle arrays). Long-lived sessions
  * touching many dirs would otherwise accumulate MEMORY_AND_DISK blocks
  * and retain references to stopped sessions (ADVICE r2) — so every
  * cache registers here and harness mains call [[Caches.clearAll]] on
  * teardown.
  */
final class DfCache[K] {
  private val m = scala.collection.concurrent.TrieMap.empty[K, DataFrame]
  Caches.register(this)

  def getOrElseUpdate(k: K)(build: => DataFrame): DataFrame =
    m.getOrElseUpdate(k, build.persist(StorageLevel.MEMORY_AND_DISK))

  def clear(): Unit = {
    m.values.foreach { df =>
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
    }
    m.clear()
  }
}

object Caches {
  private val all =
    new java.util.concurrent.ConcurrentLinkedQueue[DfCache[_]]()

  private[core] def register(c: DfCache[_]): Unit = all.add(c)

  /** Unpersist and forget every cached frame (harness teardown hook). */
  def clearAll(): Unit = all.forEach(_.clear())
}
