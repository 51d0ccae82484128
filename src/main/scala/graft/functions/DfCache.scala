package graft.functions

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped cache of persisted DataFrames (materialized
  * intermediate tables reused across queries, e.g. the dedup shingle
  * table or the chunk weights).
  *
  * Entries of stopped sessions are evicted on every access so a
  * long-lived JVM that cycles SparkSessions doesn't pin dead sessions
  * or their cached blocks. `clear()` unpersists everything (tests).
  */
object DfCache {
  private val cache = TrieMap.empty[(SparkSession, String), DataFrame]

  def getOrElseUpdate(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    cache.keys.filter(_._1.sparkContext.isStopped).foreach(cache.remove)
    cache.getOrElseUpdate((s, key), build.persist(StorageLevel.MEMORY_AND_DISK))
  }

  def clear(): Unit = {
    cache.values.foreach(df => try df.unpersist() catch { case _: Throwable => () })
    cache.clear()
  }
}
