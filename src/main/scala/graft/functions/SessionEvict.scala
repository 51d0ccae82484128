package graft.functions

import java.util.concurrent.CopyOnWriteArrayList

import scala.collection.concurrent.TrieMap

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Stop-time eviction for the session-keyed memo caches (DfCache,
  * IvfIndex.built, PqIndex.built/builtRes).
  *
  * Each memo already evicts stopped-session entries on ACCESS, but a
  * long-lived JVM that stops its LAST session never accesses a memo
  * again, so that session, its cached frames, and the codebook arrays
  * would stay pinned until process exit. This hook runs every
  * registered evictor when a SparkContext ends (SparkContext.stop
  * marks isStopped before posting ApplicationEnd and drains the
  * listener bus on stop, so the evictors' isStopped filters see the
  * dying context as stopped).
  */
object SessionEvict {
  private val evictors = new CopyOnWriteArrayList[Runnable]
  private val hookedCtx = TrieMap.empty[SparkContext, Boolean]

  /** Register a drop-my-stopped-entries action (idempotent callers
    * should register once, at memo-object init). */
  def register(evictStopped: Runnable): Unit = evictors.add(evictStopped)

  /** Ensure the session's context runs all evictors at stop. One
    * listener per context, however many sessions share it. A stopped
    * context is a no-op (addSparkListener would throw on its dead
    * listener bus — the caller's evict-on-access pass handles those
    * entries), and a registration failure rolls back so a later live
    * context isn't mistaken for hooked. */
  def hook(s: SparkSession): Unit = {
    val sc = s.sparkContext
    if (!sc.isStopped && hookedCtx.putIfAbsent(sc, true).isEmpty)
      try sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          evictors.forEach(_.run())
          hookedCtx.remove(sc)
        }
      }) catch { case _: IllegalStateException => hookedCtx.remove(sc) }
  }

  private[graft] def hookedCount: Int = hookedCtx.size
}
