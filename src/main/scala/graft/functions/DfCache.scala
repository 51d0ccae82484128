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
  *
  * Locking: the global lock covers only map bookkeeping (eviction
  * sweep, LRU stamp, memo insertion) — never a build. Builds run
  * under the PER-KEY memo's own monitor (a lazy val), so a hit, or a
  * build of a DIFFERENT key, never queues behind an in-flight build
  * (some builds run eager Spark jobs — Dedup.components executes its
  * whole label-propagation loop inside one). Two callers of the SAME
  * key still serialize, which is the point of the memo.
  */
object DfCache {
  /** Per-live-session entry bound; least-recently-used entries are
    * unpersisted and dropped once a session exceeds it. */
  val MaxPerSession = 64

  /** One cache slot: the build thunk runs at most once, under this
    * memo's monitor only. `built` lets eviction unpersist exactly the
    * frames that were actually materialized; the LRU trim SKIPS
    * in-flight entries (built == null) — dropping one would orphan
    * the persisted frame its build is about to produce (nothing to
    * unpersist at drop time, no map entry left to unpersist it
    * later), so a long build under key churn waits for the next trim
    * after it completes instead. */
  private final class Memo(build: () => DataFrame) {
    @volatile private[DfCache] var built: DataFrame = _
    private var result: Option[scala.util.Try[DataFrame]] = None
    /** Run (or await) the build under this memo's monitor, recording
      * the outcome so it runs AT MOST once — success or failure. A
      * plain lazy val retries a failed init with the ORIGINAL caller's
      * captured thunk, so a waiter blocked behind a throwing build
      * would replay it after the entry was already removed; if the
      * replay succeeded, the persisted frame would be orphaned
      * (no map entry left to ever unpersist it) and the next caller
      * would persist a duplicate (ADVICE r10). The Boolean reports
      * whether THIS call executed the thunk: the builder rethrows its
      * own failure, a waiter observing one re-enters with its own
      * thunk instead. */
    def run(): (scala.util.Try[DataFrame], Boolean) = synchronized {
      result match {
        case Some(r) => (r, false)
        case None =>
          val r = scala.util.Try {
            val d = build().persist(StorageLevel.MEMORY_AND_DISK)
            built = d
            d
          }
          result = Some(r)
          (r, true)
      }
    }
  }

  private val cache = TrieMap.empty[(SparkSession, String), Memo]
  private val tick = new AtomicLong()
  private val lastUsed = TrieMap.empty[(SparkSession, String), Long]

  // stop-time twin of the evict-on-access pass below: the last
  // stopped session of a JVM has no next access to evict it
  SessionEvict.register(() =>
    cache.keys.filter(_._1.sparkContext.isStopped).foreach(drop))

  private def drop(k: (SparkSession, String)): Unit = {
    cache.remove(k).foreach { m =>
      val d = m.built
      if (d != null) try d.unpersist() catch { case _: Throwable => () }
    }
    lastUsed.remove(k)
  }

  @annotation.tailrec
  def getOrElseUpdate(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    SessionEvict.hook(s)
    val k = (s, key)
    // bookkeeping only under the global lock: sweep stopped sessions,
    // stamp recency, insert the (unevaluated) memo, trim LRU overflow
    val memo = synchronized {
      cache.keys.filter(_._1.sparkContext.isStopped).foreach(drop)
      lastUsed(k) = tick.incrementAndGet()
      val m = cache.getOrElseUpdate(k, new Memo(() => build))
      val mine = cache.keys.filter(_._1 eq s).toSeq
      if (mine.size > MaxPerSession)
        // never trim this key or an in-flight build (see Memo)
        mine.filter(kk => kk._2 != key && cache.get(kk).forall(_.built != null))
          .sortBy(kk => lastUsed.getOrElse(kk, 0L))
          .take(mine.size - MaxPerSession).foreach(drop)
      m
    }
    // build (or read) outside the global lock, under the per-key
    // monitor. A THROWING build removes its own entry (a never-built
    // memo would otherwise squat an LRU slot); the memo records the
    // failure, so the BUILDER rethrows while a WAITER that merely
    // observed it re-enters with its OWN thunk — never replaying the
    // builder's captured one (the r10 orphaned-persist race).
    memo.run() match {
      case (scala.util.Success(d), _) => d
      case (scala.util.Failure(t), wasBuilder) =>
        synchronized {
          if (cache.get(k).exists(_ eq memo)) { cache.remove(k); lastUsed.remove(k) }
        }
        if (wasBuilder) throw t
        else getOrElseUpdate(s, key)(build)
    }
  }

  private[graft] def sizeFor(s: SparkSession): Int =
    cache.keys.count(_._1 eq s)
  private[graft] def contains(s: SparkSession, key: String): Boolean =
    cache.contains((s, key))

  def clear(): Unit = synchronized {
    cache.values.foreach { m =>
      val d = m.built
      if (d != null) try d.unpersist() catch { case _: Throwable => () }
    }
    cache.clear()
    lastUsed.clear()
  }
}
