package graft.core

import org.apache.spark.sql.DataFrame

/** Session-lifetime registry of internally persisted DataFrames (LSH
  * signature projections, shared edge/cc tables) so long-lived sessions can
  * release the pinned MEMORY_AND_DISK blocks: batch mains call [[clearAll]]
  * before `spark.stop()`, interactive users whenever inputs change on disk.
  *
  * Registration is idempotent per frame; clearing unpersists lazily
  * (non-blocking) and empties the registry.
  */
object CacheRegistry {

  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  def register(df: DataFrame): DataFrame = synchronized {
    if (!frames.exists(_ eq df)) frames += df // idempotent per frame instance
    df
  }

  def clearAll(): Unit = synchronized {
    frames.foreach { df =>
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // session may already be stopped
    }
    frames.clear()
  }
}
