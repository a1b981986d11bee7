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

  /** Persist `df` and track it for the next `releaseAll()`. */
  def persistTracked(df: DataFrame): DataFrame = synchronized {
    val p = df.persist()
    frames += p
    p
  }

  /** Unpersist every tracked frame (non-blocking) and clear the registry. */
  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
  }
}
