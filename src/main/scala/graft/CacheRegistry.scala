package graft

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Deterministic release for operator-internal `persist()`s.
  *
  * Several operators (IVF search, LSH ANN, SimHash pair generation, the
  * near-dup inverted index, CMS) persist a shared subplan that more than
  * one consumer of the *returned* DataFrame will re-read. The returned
  * plan is lazy, so the operator itself has no safe point to unpersist —
  * doing so before the caller materializes would drop the cache it just
  * paid for. Every such persist is therefore registered here, giving any
  * caller (tests, notebooks, long-lived sessions) a deterministic
  * [[release]] that unpersists exactly the operator-internal caches and
  * nothing else the session may have cached for its own reasons.
  * `spark.catalog.clearCache()` (what Bench does between queries) remains
  * a superset; release() is the targeted form the ADVICE asked for.
  */
object CacheRegistry {
  private val tracked = mutable.ListBuffer.empty[DataFrame]
  private val memos = mutable.ListBuffer
    .empty[java.util.concurrent.ConcurrentHashMap[String, DataFrame]]
  private val memoHooked = mutable.Set.empty[String]
  // Per-session identity tokens: a WeakHashMap keyed on the session
  // OBJECT (reference identity, never hashCode — two live sessions can
  // collide on hashCode, and sessions sharing a SparkContext must not
  // share a token) mapping to a monotonically unique id. Weak keys let
  // a dead session's map entry be collected; the token string itself is
  // captured by the listener so eviction still works after collection.
  private val sessionTokens =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]()
  private var nextToken = 0L

  /** The unique, collision-free memo-key prefix for a session — every
    * memo key must lead with `sessionToken(session) + "|"` so
    * [[trackMemo]]'s per-session eviction drops exactly that session's
    * entries.
    */
  def sessionToken(session: org.apache.spark.sql.SparkSession): String =
    synchronized {
      val existing = sessionTokens.get(session)
      if (existing != null) existing
      else {
        nextToken += 1
        val t = s"s${nextToken}x${System.identityHashCode(session)}"
        sessionTokens.put(session, t)
        t
      }
    }

  /** Register a persisted DataFrame; returns it unchanged for chaining.
    * Entries whose cache was already reclaimed elsewhere (storageLevel
    * back to NONE — e.g. Bench's clearCache between queries) are purged
    * on every registration, so callers that never invoke [[release]]
    * don't accumulate stale logical plans on the driver heap across a
    * long session.
    */
  def track(df: DataFrame): DataFrame = synchronized {
    tracked.filterInPlace(d =>
      d.storageLevel != org.apache.spark.storage.StorageLevel.NONE)
    tracked += df
    df
  }

  def trackedCount: Int = synchronized(tracked.size)

  /** Register a per-process localCheckpoint memo (the pretrainPacked /
    * retrievalTiers device: a ConcurrentHashMap whose keys lead with
    * `${sessionToken(session)}|`). Two lifetimes are managed:
    * [[release]] clears every memo outright, and a per-session listener
    * drops that session's entries when its SparkContext ends — so a
    * stopped test session's materialized frames are not pinned on the
    * driver heap for the rest of the JVM. (The checkpoint BLOCKS die
    * with the session's block manager; what leaks without this is the
    * driver-side plan references keyed by a dead session's token.)
    * Keys use [[sessionToken]] (reference-identity, monotonic) rather
    * than session.hashCode, so two live sessions can never collide and
    * eviction can never drop another session's entries.
    */
  def trackMemo(session: org.apache.spark.sql.SparkSession,
                memo: java.util.concurrent.ConcurrentHashMap[String, DataFrame])
      : Unit = synchronized {
    if (!memos.exists(_ eq memo)) memos += memo
    val t = sessionToken(session)
    if (!memoHooked.contains(t)) {
      memoHooked += t
      session.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd)
              : Unit = dropMemoSession(t)
        })
    }
  }

  private def dropMemoSession(t: String): Unit = synchronized {
    val prefix = s"$t|"
    memos.foreach(_.keySet.removeIf(_.startsWith(prefix)))
    memoHooked -= t
  }

  private[graft] def memoEntryCount: Int =
    synchronized(memos.map(_.size).sum)

  /** Unpersist every registered cache, clear every registered memo, and
    * forget them. Safe to call at any eager boundary;
    * already-unpersisted entries (e.g. after a session clearCache) are a
    * no-op.
    */
  def release(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
    memos.foreach(_.clear())
  }
}
