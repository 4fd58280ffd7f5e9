package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry for intermediate tables that multiple
  * catalog queries share (shingle sets, LSH bucket tables). Round 1
  * persisted these inline per query, which (a) re-cached the same plan
  * on every catalog run ("Asked to cache already cached data" warnings
  * in the driver log) and (b) never released them. The registry
  * persists a given (session, key) once, hands the SAME DataFrame to
  * every subsequent query in the session, and releases everything via
  * [[release]] — called by Bench/Verify before session stop, and safe
  * to call between queries.
  *
  * Keys include the session's identity so a stopped-and-recreated
  * session (test suites) never sees another session's cached plans.
  */
object GraftCaches {
  private val entries =
    scala.collection.concurrent.TrieMap.empty[(Int, String), DataFrame]

  private def sessionKey(s: SparkSession, key: String): (Int, String) =
    (System.identityHashCode(s), key)

  /** Get the cached DataFrame for `key`, persisting `build` on first
    * use. MEMORY_AND_DISK: at cluster scale these are checkpoints, on
    * local[32] an in-memory persist. */
  def getOrPersist(s: SparkSession, key: String)(build: => DataFrame): DataFrame =
    entries.getOrElseUpdate(sessionKey(s, key),
      build.persist(StorageLevel.MEMORY_AND_DISK))

  /** Unpersist and forget every cache owned by `s`. */
  def release(s: SparkSession): Unit = {
    val id = System.identityHashCode(s)
    entries.keys.filter(_._1 == id).foreach { k =>
      entries.remove(k).foreach(_.unpersist(false))
    }
  }

  /** Unpersist and forget everything (all sessions). */
  def releaseAll(): Unit = {
    entries.keys.foreach(k => entries.remove(k).foreach(_.unpersist(false)))
  }
}
