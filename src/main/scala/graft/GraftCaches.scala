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
  * Keys use the session's `sessionUUID` — unique for the JVM's
  * lifetime, so a stopped-and-recreated session (test suites) can
  * never collide with another session's cached plans (identity
  * hash codes, used in round 2, can be reused by the allocator).
  * Entries owned by a session whose SparkContext has stopped are
  * swept on every access, so a caller that forgets [[release]]
  * leaks at most until the next cache lookup, not for the JVM
  * lifetime.
  */
object GraftCaches {
  private val entries =
    scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame]

  /** Weakly-held per-session UUID (Spark's own `sessionUUID` is
    * `private[sql]`). Unlike the identity hash codes round 2 keyed on,
    * a UUID is unique for the JVM lifetime — the allocator can hand a
    * dead session's identity hash to a new object, which would return
    * a cached DataFrame bound to a stopped session. */
  private val sessionIds =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  private def uuidOf(s: SparkSession): String =
    sessionIds.computeIfAbsent(s, _ => java.util.UUID.randomUUID().toString)

  private def sessionKey(s: SparkSession, key: String): (String, String) =
    (uuidOf(s), key)

  /** Drop entries bound to a dead session. Their blocks died with the
    * context, so forgetting the handle is the whole cleanup. */
  private def sweepStopped(): Unit =
    entries.filter(_._2.sparkSession.sparkContext.isStopped)
      .keys.foreach(entries.remove)

  /** Get the cached DataFrame for `key`, persisting `build` on first
    * use. MEMORY_AND_DISK: at cluster scale these are checkpoints, on
    * local[32] an in-memory persist. */
  def getOrPersist(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    sweepStopped()
    entries.getOrElseUpdate(sessionKey(s, key),
      build.persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** Get the cached DataFrame for `key`, building once WITHOUT the
    * extra persist — for frames that already self-materialize (eager
    * `localCheckpoint`), where an added persist would double-store
    * the blocks. Release semantics: `release`'s unpersist is a no-op
    * on these; the checkpoint blocks are freed by the ContextCleaner
    * once the registry drops the reference. */
  def getOrBuild(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    sweepStopped()
    entries.getOrElseUpdate(sessionKey(s, key), build)
  }

  /** Unpersist and forget every cache owned by `s`. */
  def release(s: SparkSession): Unit = {
    val id = uuidOf(s)
    entries.keys.filter(_._1 == id).foreach { k =>
      entries.remove(k).foreach { df =>
        if (!df.sparkSession.sparkContext.isStopped) df.unpersist(false)
      }
    }
    sweepStopped()
  }

  /** Live entry count — test hook for lifecycle hygiene. */
  private[graft] def size: Int = entries.size

  /** Unpersist and forget everything (all sessions). */
  def releaseAll(): Unit = {
    entries.keys.foreach(k => entries.remove(k).foreach { df =>
      if (!df.sparkSession.sparkContext.isStopped) df.unpersist(false)
    })
  }
}
