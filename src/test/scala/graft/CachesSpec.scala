package graft

import java.util.concurrent.CountDownLatch

import org.apache.spark.storage.StorageLevel

import graft.ops.Caches

/** Scope isolation for the persisted-intermediate registry: a scope's
  * release must evict only its own frames, never a concurrent caller's.
  */
class CachesSpec extends SparkSpec {

  test("releasing one scope leaves a concurrent scope's frames persisted") {
    import spark.implicits._
    // distinct data on the two frames: identical plans would share one
    // CacheManager entry, and unpersisting either would evict both —
    // that is plan-identity dedup, not a scope leak
    val fa = (1 to 100).toDF("a")
    val fb = (101 to 200).toDF("b")
    val aPersisted = new CountDownLatch(1)
    val bReleased = new CountDownLatch(1)
    @volatile var aLevelDuring: StorageLevel = StorageLevel.NONE
    val ta = new Thread(() => {
      val scope = Caches.open()
      try {
        Caches.persist(fa)
        fa.count()
        aPersisted.countDown()
        bReleased.await() // B has released its scope by now
        aLevelDuring = fa.storageLevel
      } finally scope.release()
    })
    val tb = new Thread(() => {
      val scope = Caches.open()
      Caches.persist(fb)
      fb.count()
      aPersisted.await() // A's frame is persisted and tracked
      scope.release()
      bReleased.countDown()
    })
    ta.start(); tb.start()
    ta.join(30000); tb.join(30000)
    assert(aLevelDuring != StorageLevel.NONE,
      "scope B's release evicted scope A's frame")
    assert(fa.storageLevel == StorageLevel.NONE, "A's own release must evict")
    assert(fb.storageLevel == StorageLevel.NONE, "B's release must evict its frame")
  }

  test("release restores the enclosing scope for subsequent persists") {
    import spark.implicits._
    val outer = Caches.open()
    try {
      val inner = Caches.open()
      val fInner = (1 to 10).toDF("x")
      Caches.persist(fInner)
      inner.release()
      assert(fInner.storageLevel == StorageLevel.NONE)
      // after inner release, persists land in the outer scope again
      val fOuter = (1 to 10).toDF("y")
      Caches.persist(fOuter)
      outer.release()
      assert(fOuter.storageLevel == StorageLevel.NONE)
    } finally outer.release()
  }
}
