package graft

import org.apache.spark.storage.StorageLevel

import graft.operators.TextOps

/** The tracked-cache contract (round-4 advice): operator-internal persists
  * go through GraftCache so callers have a release handle — without one,
  * every near-dup invocation leaks cache blocks for the session lifetime. */
class GraftCacheSpec extends SparkSpec {

  test("persist caches the frame and release drops every tracked frame") {
    import spark.implicits._
    GraftCache.release() // isolate from other suites sharing the session
    val a = GraftCache.persist((1 to 10).toDF("n"))
    val b = GraftCache.persist((1 to 10).toDF("m"))
    assert(a.storageLevel !== StorageLevel.NONE)
    assert(b.storageLevel !== StorageLevel.NONE)
    assert(GraftCache.trackedCount === 2)
    GraftCache.release()
    assert(GraftCache.trackedCount === 0)
    assert(a.storageLevel === StorageLevel.NONE)
    assert(b.storageLevel === StorageLevel.NONE)
  }

  test("release is safe on an empty registry and frames stay usable after") {
    import spark.implicits._
    GraftCache.release()
    GraftCache.release() // idempotent, no-throw
    val f = GraftCache.persist((1 to 5).toDF("n"))
    GraftCache.release()
    // unpersisted ≠ invalidated: the frame recomputes on next use
    assert(f.count() === 5)
  }

  test("minhashNearDups registers its persisted intermediates for release") {
    import spark.implicits._
    GraftCache.release()
    val docs = Seq(
      ("d1", "the quick brown fox jumps over the lazy dog again and again"),
      ("d2", "the quick brown fox jumps over the lazy dog again and again"),
      ("d3", "completely different words describing some other topic entirely")
    ).toDF("doc_id", "text")
    val pairs = TextOps.minhashNearDups(docs, "doc_id", "text", 0.8)
    assert(pairs.count() >= 1) // d1~d2
    // toked + banded were persisted through the registry, not raw persist()
    assert(GraftCache.trackedCount === 2)
    GraftCache.release()
    assert(GraftCache.trackedCount === 0)
  }
}
