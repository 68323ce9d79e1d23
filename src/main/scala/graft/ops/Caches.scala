package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for DataFrames that operators persist across their internal
  * stages (MinHash signatures reused by candidate + verify, connected-
  * component labels). The frames must stay cached while the returned
  * lazy result is consumed, so the operator cannot unpersist them
  * itself; instead it registers them here and the session owner
  * releases them once the results are materialized. Verify/Bench do
  * this per query — without it, repeated calls in a long-lived session
  * accumulate MEMORY_AND_DISK partitions indefinitely.
  *
  * Ownership is scoped, not JVM-global: [[open]] returns a [[Scope]]
  * that owns every frame persisted from the calling thread until its
  * `release()`, so concurrent queries in one JVM (Verify's 4-thread
  * pool, any future multi-tenant session) cannot evict each other's
  * intermediates. Threads that never open a scope share the root scope,
  * which [[clear]] drains — the old single-caller behavior.
  */
object Caches {

  /** A releasable set of persisted frames owned by one logical caller. */
  final class Scope private[Caches] (parent: Option[Scope]) {
    private val tracked = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    private[Caches] def add(df: DataFrame): Unit = synchronized { tracked += df }
    private[Caches] def remove(df: DataFrame): Unit = synchronized { tracked -= df }
    /** Unpersist every frame this scope owns (async eviction); if the
      * scope is still the calling thread's current one, pop back to the
      * enclosing scope.
      */
    def release(): Unit = {
      synchronized {
        tracked.foreach(_.unpersist(blocking = false))
        tracked.clear()
      }
      if (current.get() eq this) parent.foreach(current.set)
    }
  }

  private val rootScope = new Scope(None)

  // inheritable so a worker thread spawned mid-scope keeps its parent's
  // ownership; pool threads created up front inherit the root scope and
  // open their own per task
  private val current = new InheritableThreadLocal[Scope] {
    override def initialValue(): Scope = rootScope
  }

  /** Open a scope that owns subsequent persists on this thread; its
    * `release()` unpersists them and restores the enclosing scope.
    */
  def open(): Scope = {
    val s = new Scope(Some(current.get()))
    current.set(s)
    s
  }

  /** Register an already-persisted frame with the current scope. */
  def track(df: DataFrame): DataFrame = { current.get().add(df); df }

  /** Persist at MEMORY_AND_DISK and register with the current scope. */
  def persist(df: DataFrame): DataFrame = track(df.persist(StorageLevel.MEMORY_AND_DISK))

  /** Remove a frame the operator unpersisted itself (loop intermediates). */
  def untrack(df: DataFrame): Unit = current.get().remove(df)

  /** Release the calling thread's current scope — only frames persisted
    * under it, never another scope's.
    */
  def clear(): Unit = current.get().release()
}
