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

  /** Memoizing holder: the map's computeIfAbsent only ALLOCATES this
    * (never runs user code inside the map's bin lock), and the build
    * runs once under the holder's own monitor via `lazy val`. This
    * matters because builders compose: dedup03's verified-pair builder
    * calls getOrPersist for the shingle frame — a nested
    * computeIfAbsent on one ConcurrentHashMap would violate its
    * no-reentrant-update contract ("Recursive update" / livelock).
    * Holder monitors can't deadlock: the dependency graph between
    * cache keys is acyclic.
    */
  private final class Pinned(build: () => DataFrame, level: Option[StorageLevel]) {
    // Tracks successful builds so release paths never re-run (and
    // re-throw from) a failed or never-forced builder: releaseKey must
    // unpersist what exists, not resurrect what never built.
    @volatile private var built: DataFrame = null
    lazy val df: DataFrame = {
      val d = level.fold(build())(l => build().persist(l))
      built = d
      d
    }
    def builtOrNull: DataFrame = built
  }

  private val frames = new ConcurrentHashMap[String, Pinned]()

  /** The shared persisted frame for `key`, building (and persisting) it
    * on first use. MEMORY_AND_DISK by default: at 100 TB the frame
    * spills instead of OOMing. Thread-safe — concurrent queries in one
    * session (see ConcurrencySpec) get the same instance — and
    * reentrant: a builder may itself call getOrPersist for another key.
    */
  def getOrPersist(
      key: String,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK)(
      build: => DataFrame): DataFrame =
    frames.computeIfAbsent(key, _ => new Pinned(() => build, Some(level))).df

  /** Register an already-persisted frame under `key` for later
    * [[release]]; an evicted previous occupant is unpersisted (its
    * consumers have materialized by the time a replacement exists).
    */
  def register(key: String, df: DataFrame): DataFrame = {
    val holder = new Pinned(() => df, None) // caller already pinned it
    holder.df
    val old = frames.put(key, holder)
    if (old != null) {
      val prev = old.builtOrNull
      if (prev != null && !(prev eq df)) prev.unpersist(blocking = false)
    }
    df
  }

  /** Unpersist and forget one key (no-op if absent or never built). */
  def releaseKey(key: String): Unit = {
    val holder = frames.remove(key)
    if (holder != null) {
      val d = holder.builtOrNull
      if (d != null) d.unpersist(blocking = false)
    }
  }

  /** Auxiliary caches (driver-held sketches, codebooks) that must drop
    * with the frame registry: a stale sketch over a since-rewritten
    * input is the one failure mode its no-false-negative argument can't
    * rule out, so anything keyed on (dir, session) registers a clear
    * hook here and [[release]] fires them all.
    */
  private val releaseHooks =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]()

  def onRelease(hook: () => Unit): Unit = releaseHooks.add(hook)

  /** Unpersist and forget everything the engine has pinned, then fire
    * the auxiliary-cache release hooks.
    */
  def release(): Unit = {
    val it = frames.keySet().iterator()
    while (it.hasNext) { releaseKey(it.next()) }
    releaseHooks.forEach(h => h())
  }

  /** Number of live registered frames (spec hook). */
  def size: Int = frames.size()

  private val sessionTags =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]())
  private val sessionCounter = new java.util.concurrent.atomic.AtomicLong()

  /** A JVM-unique tag for a session, for qualifying cache keys.
    * `System.identityHashCode` is NOT unique — a GC'd session's hash
    * can be reused by a later one, which would hand out frames bound to
    * a stopped session; the monotonic counter cannot collide. NOTE:
    * registered frames strongly reference their session, so a
    * long-lived JVM that creates many short-lived sessions must call
    * [[release]] (or [[releaseKey]] per key) when a session retires —
    * the registry cannot observe session stop on its own.
    */
  def sessionTag(spark: org.apache.spark.sql.SparkSession): String =
    sessionTags.computeIfAbsent(spark,
      _ => s"s${sessionCounter.incrementAndGet()}")
}
