package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for DataFrames that operators persist across their internal
  * stages (MinHash signatures reused by candidate + verify, connected-
  * component labels). The frames must stay cached while the returned
  * lazy result is consumed, so the operator cannot unpersist them
  * itself; instead it registers them here and the session owner calls
  * [[clear]] once the results are materialized. Verify/Bench do this
  * per query — without it, repeated calls in a long-lived session
  * accumulate MEMORY_AND_DISK partitions indefinitely.
  */
object Caches {

  private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Register an already-persisted frame for later release. */
  def track(df: DataFrame): DataFrame = synchronized { tracked += df; df }

  /** Persist at MEMORY_AND_DISK and register for later release. */
  def persist(df: DataFrame): DataFrame = track(df.persist(StorageLevel.MEMORY_AND_DISK))

  /** Remove a frame the operator unpersisted itself (loop intermediates). */
  def untrack(df: DataFrame): Unit = synchronized { tracked -= df }

  /** Unpersist every tracked frame (async eviction) and forget them. */
  def clear(): Unit = synchronized {
    tracked.foreach(_.unpersist(blocking = false))
    tracked.clear()
  }
}
