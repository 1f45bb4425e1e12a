package graft.core

import org.apache.spark.sql.DataFrame

/** Session-lifetime registry of internally persisted DataFrames (LSH
  * signature projections, shared edge/cc tables) so long-lived sessions can
  * release the pinned MEMORY_AND_DISK blocks: batch mains call [[clearAll]]
  * before `spark.stop()`, interactive users whenever inputs change on disk.
  *
  * Two properties keep a long-lived session from slow-leaking pinned
  * blocks (repeated operator calls each persist a fresh intermediate, and
  * Spark's CacheManager holds strong references, so dropping OUR reference
  * would not release anything — a WeakReference registry frees nothing):
  *
  *  - entries are dedup'd by CANONICALIZED PLAN, not object identity: the
  *    same operator re-invoked on the same input registers nothing new
  *    (Spark's CacheManager reuses the cached blocks for plan-equal frames
  *    anyway — "Asked to cache already cached data");
  *  - the registry is BOUNDED ([[maxEntries]], LRU): past the cap the
  *    oldest intermediate is unpersisted and dropped. An evicted frame
  *    still referenced by a live plan stays CORRECT — Spark recomputes the
  *    stage — it just loses the cache barrier, the right trade for state
  *    that would otherwise pin blocks forever.
  */
object CacheRegistry {

  /** Upper bound on simultaneously pinned intermediates; tune per session
    * (each entry is a small projection — ids + signatures/keys). */
  @volatile var maxEntries: Int = 64

  private val frames = scala.collection.mutable.LinkedHashMap
    .empty[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, DataFrame]

  private def planKey(df: DataFrame) =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]
      .queryExecution.analyzed.canonicalized

  def register(df: DataFrame): DataFrame = synchronized {
    val key = planKey(df)
    if (frames.contains(key)) frames.remove(key).foreach(frames.put(key, _)) // LRU touch
    else {
      frames.put(key, df)
      while (frames.size > maxEntries) {
        val (k, old) = frames.head
        try old.unpersist(blocking = false)
        catch { case _: Throwable => () }
        frames.remove(k)
      }
    }
    df
  }

  def clearAll(): Unit = synchronized {
    frames.valuesIterator.foreach { df =>
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
    }
    frames.clear()
  }
}
