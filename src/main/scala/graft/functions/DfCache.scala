package graft.functions

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped cache of persisted DataFrames (materialized
  * intermediate tables reused across queries, e.g. the dedup shingle
  * table or the chunk weights).
  *
  * Entries of stopped sessions are evicted on every access so a
  * long-lived JVM that cycles SparkSessions doesn't pin dead sessions
  * or their cached blocks, and LIVE sessions are LRU-bounded at
  * [[MaxPerSession]] entries so a service iterating many corpus dirs
  * can't accumulate persisted frames without limit (each corpus dir
  * contributes a handful of keys; the bound is ~6 dirs' worth).
  * `clear()` unpersists everything (tests).
  */
object DfCache {
  /** Per-live-session entry bound; least-recently-used entries are
    * unpersisted and dropped once a session exceeds it. */
  val MaxPerSession = 64

  private val cache = TrieMap.empty[(SparkSession, String), DataFrame]
  private val tick = new AtomicLong()
  private val lastUsed = TrieMap.empty[(SparkSession, String), Long]

  // stop-time twin of the evict-on-access pass below: the last
  // stopped session of a JVM has no next access to evict it
  SessionEvict.register(() =>
    cache.keys.filter(_._1.sparkContext.isStopped).foreach(drop))

  private def drop(k: (SparkSession, String)): Unit = {
    cache.remove(k).foreach(df =>
      try df.unpersist() catch { case _: Throwable => () })
    lastUsed.remove(k)
  }

  def getOrElseUpdate(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    SessionEvict.hook(s)
    // fast path: a hit only touches bookkeeping under the lock — it
    // never queues behind another key's in-flight build
    val hit = synchronized {
      cache.keys.filter(_._1.sparkContext.isStopped).foreach(drop)
      lastUsed((s, key)) = tick.incrementAndGet()
      cache.get((s, key))
    }
    hit.getOrElse(synchronized {
      val df = cache.getOrElseUpdate((s, key), build.persist(StorageLevel.MEMORY_AND_DISK))
      val mine = cache.keys.filter(_._1 eq s).toSeq
      if (mine.size > MaxPerSession)
        mine.filterNot(_._2 == key).sortBy(k => lastUsed.getOrElse(k, 0L))
          .take(mine.size - MaxPerSession).foreach(drop)
      df
    })
  }

  private[graft] def sizeFor(s: SparkSession): Int =
    cache.keys.count(_._1 eq s)
  private[graft] def contains(s: SparkSession, key: String): Boolean =
    cache.contains((s, key))

  def clear(): Unit = synchronized {
    cache.values.foreach(df => try df.unpersist() catch { case _: Throwable => () })
    cache.clear()
    lastUsed.clear()
  }
}
