package graft

/** Lifecycle semantics of the keyed shared caches — the contract Bench,
  * Verify and the d4/d6/x23 families rely on: shared entries are built
  * once per key, survive the per-query releaseAll, and die at the pass
  * boundary's releaseShared.
  */
class CacheRegistrySpec extends SparkSpec {

  import spark.implicits._

  test("memoShared builds once per key and survives releaseAll") {
    var builds = 0
    def build() = { builds += 1; Seq(1, 2, 3).toDF("x") }
    val a = CacheRegistry.memoShared("spec:frame")(build())
    val b = CacheRegistry.memoShared("spec:frame")(build())
    assert(builds == 1, "second lookup must reuse the first build")
    assert(a eq b, "same DataFrame instance returned")
    CacheRegistry.releaseAll()
    CacheRegistry.memoShared("spec:frame")(build())
    assert(builds == 1, "releaseAll must not evict shared entries")
    CacheRegistry.releaseShared()
    CacheRegistry.memoShared("spec:frame")(build())
    assert(builds == 2, "releaseShared must evict, forcing a rebuild")
    CacheRegistry.releaseShared()
  }

  test("memoSharedValue shares driver-side artifacts with the same lifecycle") {
    var builds = 0
    def train() = { builds += 1; Seq((0, "a", "b", 7L)) }
    val m1 = CacheRegistry.memoSharedValue("spec:merges")(train())
    val m2 = CacheRegistry.memoSharedValue("spec:merges")(train())
    assert(builds == 1 && (m1 eq m2))
    CacheRegistry.releaseAll()
    CacheRegistry.memoSharedValue("spec:merges")(train())
    assert(builds == 1, "releaseAll must not evict shared values")
    CacheRegistry.releaseShared()
    CacheRegistry.memoSharedValue("spec:merges")(train())
    assert(builds == 2, "releaseShared must clear shared values too")
    CacheRegistry.releaseShared()
  }

  test("persistTracked frames are released by releaseAll, not leaked") {
    val df = CacheRegistry.persistTracked(Seq(1).toDF("x"))
    df.count()
    assert(df.storageLevel.useMemory, "tracked frame must be persisted")
    CacheRegistry.releaseAll()
    // unpersist is async; the tracked list itself must be empty so a
    // second releaseAll is a no-op rather than a double-unpersist
    CacheRegistry.releaseAll()
  }
}
