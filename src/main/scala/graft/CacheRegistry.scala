package graft

import org.apache.spark.sql.DataFrame

/** Deterministic lifecycle for operator-internal persist() calls.
  *
  * Operators that cache an intermediate (e.g. the MinHash signatures read by
  * three plan branches) register the persisted frame here; harness code
  * (Bench between queries, Verify after each dump) calls `releaseAll()` once
  * the result is materialized. Without this, cached MEMORY_AND_DISK blocks
  * are reclaimed only nondeterministically by the ContextCleaner, so
  * repeated bench/verify passes accumulate storage memory and skew later
  * query timings.
  */
object CacheRegistry {
  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val shared = scala.collection.mutable.LinkedHashMap.empty[String, DataFrame]

  /** Persist `df` and track it for the next `releaseAll()`. */
  def persistTracked(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    frames += p
    p
  }

  /** Keyed persist shared ACROSS queries: queries that rebuild the same
    * deterministic intermediate (the d4 near-dup pair list and d6 group
    * labels feeding d6/d7/g1) reuse one cached copy instead of re-running
    * the similarity-join chain per query. Shared entries survive
    * `releaseAll()` — the per-query release that keeps query timings and
    * correctness dumps independent — and are dropped by `releaseShared()`
    * when the harness finishes a pass. Callers embed the applicationId in
    * the key so no frame outlives its SparkSession.
    */
  def memoShared(key: String)(build: => DataFrame): DataFrame = {
    // Double-checked: the build (a whole plan-construction chain, possibly
    // with its own persistTracked calls) runs OUTSIDE the monitor so a slow
    // build never blocks other registry users. If two threads race, the
    // first insert wins and the loser's persist is released — builds are
    // deterministic, so either frame is correct.
    synchronized(shared.get(key)) match {
      case Some(df) => df
      case None =>
        val built = build.persist()
        synchronized {
          shared.get(key) match {
            case Some(winner) =>
              // Spark's CacheManager keys cache entries by the NORMALIZED
              // plan (QueryExecution.normalized, compared via sameResult),
              // and deterministic builds normalize equal — then the loser's
              // persist() was a no-op on the winner's entry, and an
              // unpersist here would evict the SHARED data and silently
              // defeat the memo exactly when contended. Only when the
              // racing builds normalize DIFFERENTLY does the loser hold its
              // own cache entry that no release path tracks, so it must be
              // dropped now or it leaks storage memory until the
              // ContextCleaner runs. The guard uses the CacheManager's own
              // identity — analyzed.canonicalized can differ (e.g. fresh
              // exprIds) where normalized.sameResult still matches, and
              // unpersisting on the weaker identity would evict shared data.
              if (!built.queryExecution.normalized.sameResult(
                  winner.queryExecution.normalized))
                built.unpersist(blocking = false)
              winner
            case None =>
              shared.update(key, built)
              built
          }
        }
    }
  }

  /** Unpersist every unkeyed tracked frame (non-blocking); shared keyed
    * frames stay for cross-query reuse until `releaseShared()`.
    */
  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
  }

  private val sharedValues =
    scala.collection.mutable.LinkedHashMap.empty[String, Any]

  /** Keyed memo for small driver-side artifacts shared across queries —
    * e.g. the ≤10-row BPE merge table x23 trains and x24 re-trains from
    * the same corpus frequencies. Same lifecycle as memoShared: survives
    * releaseAll, cleared by releaseShared.
    */
  def memoSharedValue[A](key: String)(build: => A): A = {
    // Same double-checked shape as memoShared: the build can be a
    // multi-job loop (x23's BPE training), so it must not run while
    // holding the registry monitor.
    synchronized(sharedValues.get(key)) match {
      case Some(v) => v.asInstanceOf[A]
      case None =>
        val v = build
        synchronized(sharedValues.getOrElseUpdate(key, v)).asInstanceOf[A]
    }
  }

  /** Unpersist the keyed shared frames too — harness end-of-pass hygiene. */
  def releaseShared(): Unit = synchronized {
    shared.values.foreach(_.unpersist(blocking = false))
    shared.clear()
    sharedValues.clear()
  }

  /** Every live shared key (frames + driver-side values) — lets a harness
    * diff the registry around a query to learn which keys that query
    * publishes.
    */
  def sharedKeys: Set[String] = synchronized {
    shared.keySet.toSet ++ sharedValues.keySet
  }

  /** Release exactly `keys`, leaving other shared entries cached — the
    * surgical form of `releaseShared()` for retries that must re-time one
    * query's own build without dropping upstream frames the pass
    * convention says it reuses.
    */
  def releaseSharedKeys(keys: Set[String]): Unit = synchronized {
    keys.foreach { k =>
      shared.remove(k).foreach(_.unpersist(blocking = false))
      sharedValues.remove(k)
    }
  }
}
