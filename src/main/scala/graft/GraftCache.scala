package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped registry of persisted frames.
  *
  * Operators that persist shared intermediates (the exploded shingle
  * frame, dedup03's verified pair set, …) route the persist through this
  * registry so that:
  *
  *   1. Repeated calls within one session SHARE one persisted copy
  *      instead of pinning a fresh one per call (before this, a 74-query
  *      bench pinned the shingle frame — larger than the corpus — once
  *      per dedup query, an unbounded storage leak in a long-lived
  *      session).
  *   2. A long-lived session has an explicit release hook
  *      ([[release]] / [[releaseKey]]) to drop everything the engine has
  *      pinned; `Verify` and `Bench` call it before shutdown.
  *
  * Keys are semantic names qualified by the data directory and session
  * identity, so different inputs (or different sessions in one JVM)
  * never share cache entries.
  */
object GraftCache {

  private val frames = new ConcurrentHashMap[String, DataFrame]()

  /** The shared persisted frame for `key`, building (and persisting) it
    * on first use. MEMORY_AND_DISK by default: at 100 TB the frame
    * spills instead of OOMing. Thread-safe — concurrent queries in one
    * session (see ConcurrencySpec) get the same instance.
    */
  def getOrPersist(
      key: String,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK)(
      build: => DataFrame): DataFrame =
    frames.computeIfAbsent(key, _ => build.persist(level))

  /** Register an already-persisted frame under `key` for later
    * [[release]]; an evicted previous occupant is unpersisted (its
    * consumers have materialized by the time a replacement exists).
    */
  def register(key: String, df: DataFrame): DataFrame = {
    val old = frames.put(key, df)
    if (old != null && !(old eq df)) old.unpersist(blocking = false)
    df
  }

  /** Unpersist and forget one key (no-op if absent). */
  def releaseKey(key: String): Unit = {
    val df = frames.remove(key)
    if (df != null) df.unpersist(blocking = false)
  }

  /** Unpersist and forget everything the engine has pinned. */
  def release(): Unit = {
    val it = frames.keySet().iterator()
    while (it.hasNext) { releaseKey(it.next()) }
  }

  /** Number of live registered frames (spec hook). */
  def size: Int = frames.size()
}
