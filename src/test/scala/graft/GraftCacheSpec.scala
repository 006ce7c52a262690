package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

class GraftCacheSpec extends SparkSpec {

  private def freshKey(tag: String) = s"spec.$tag.${System.nanoTime()}"

  test("getOrPersist builds once and returns the same persisted instance") {
    import spark.implicits._
    val builds = new AtomicInteger(0)
    val key = freshKey("once")
    def get() = GraftCache.getOrPersist(key) {
      builds.incrementAndGet()
      Seq(1, 2, 3).toDF("x")
    }
    val a = get()
    val b = get()
    assert(builds.get() == 1)
    assert(a eq b)
    assert(a.storageLevel.useMemory || a.storageLevel.useDisk)
    GraftCache.releaseKey(key)
    assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("concurrent getOrPersist never double-builds (one copy per key)") {
    import spark.implicits._
    val builds = new AtomicInteger(0)
    val key = freshKey("conc")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[org.apache.spark.sql.DataFrame] {
          def call(): org.apache.spark.sql.DataFrame =
            GraftCache.getOrPersist(key) {
              builds.incrementAndGet()
              Seq(1L).toDF("x")
            }
        })
      }
      val frames = futures.map(_.get())
      assert(builds.get() == 1)
      assert(frames.forall(_ eq frames.head))
    } finally pool.shutdown()
    GraftCache.releaseKey(key)
  }

  test("register evicts and unpersists the previous occupant") {
    import spark.implicits._
    val key = freshKey("evict")
    val first = Seq(1).toDF("x").persist()
    first.count()
    GraftCache.register(key, first)
    val second = Seq(2).toDF("x").persist()
    GraftCache.register(key, second)
    assert(first.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "evicted frame must be unpersisted")
    assert(second.storageLevel.useMemory || second.storageLevel.useDisk)
    GraftCache.releaseKey(key)
  }

  test("a failed builder does not poison release paths") {
    import spark.implicits._
    val key = freshKey("poison")
    intercept[IllegalStateException] {
      GraftCache.getOrPersist(key) { throw new IllegalStateException("boom") }
    }
    // release/releaseKey must not re-run (and re-throw from) the failed
    // builder — a poisoned key would otherwise abort Bench/Verify's
    // final release() and swallow the bench JSON line.
    GraftCache.releaseKey(key)
    GraftCache.release()
    // And the key is usable again afterwards.
    val ok = GraftCache.getOrPersist(key) { Seq(1).toDF("x") }
    assert(ok.count() == 1)
    GraftCache.releaseKey(key)
  }

  test("release drops everything and the dedup cache rebuilds cleanly") {
    // Warm the real shingle cache, release, and re-run a consumer:
    // results must be identical after a cold rebuild.
    val before = graft.operators.Dedup.dedup02NgramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    GraftCache.release()
    assert(GraftCache.size == 0)
    val after = graft.operators.Dedup.dedup02NgramJaccard(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(after == before)
  }
}
