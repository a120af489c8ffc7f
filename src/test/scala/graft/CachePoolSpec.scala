package graft

import java.util.concurrent.CountDownLatch

import org.apache.spark.storage.StorageLevel

/** Scope semantics for builder-persisted intermediates: one query's
  * release must not drop a concurrent query's caches (the r7 audit's
  * global-drain hazard), while unscoped callers keep the original
  * serial releaseAll contract.
  */
class CachePoolSpec extends SparkSpec {

  test("scoped release: a closing scope keeps a concurrent scope's caches live") {
    @volatile var t1Frame: org.apache.spark.sql.DataFrame = null
    @volatile var levelWhileT2Released: StorageLevel = null
    val t1Tracked = new CountDownLatch(1)
    val t2Done = new CountDownLatch(1)
    val t1 = new Thread(() => CachePool.scoped {
      val df = CachePool.track(spark.range(100).toDF("x"))
      df.count()
      t1Frame = df
      t1Tracked.countDown()
      t2Done.await()
      // observed AFTER t2's scope fully closed — under the old global
      // drain this cache would already be gone
      levelWhileT2Released = df.storageLevel
    })
    val t2 = new Thread(() => {
      CachePool.scoped {
        t1Tracked.await()
        val df = CachePool.track(spark.range(50).toDF("y"))
        df.count()
      }
      t2Done.countDown()
    })
    t1.start(); t2.start()
    t1.join(60000); t2.join(60000)
    assert(levelWhileT2Released != null && levelWhileT2Released.useMemory,
      "t2's scope close dropped t1's in-flight cache")
    assert(t1Frame.storageLevel == StorageLevel.NONE,
      "t1's own scope close must release its frame")
  }

  test("unscoped tracking keeps the serial releaseAll contract") {
    val df = CachePool.track(spark.range(10).toDF("x"))
    df.count()
    assert(df.storageLevel.useMemory)
    CachePool.releaseAll()
    assert(df.storageLevel == StorageLevel.NONE)
  }
}
