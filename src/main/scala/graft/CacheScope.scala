package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Query-scoped persist tracking — the fix for suite-long cache churn.
  *
  * `DataFrame.persist` registers the plan in the session's
  * CacheManager, which holds a STRONG reference until `unpersist()`:
  * a per-query helper frame persisted inside an operator and never
  * released stays in the block manager for the life of the session.
  * Over a few hundred queries those leaks accumulate until they evict
  * the deliberate session-scoped materialized views
  * ([[graft.operators.Dedup.sharedSigs]], Graph's edge cache) — which
  * is why a query that runs warm in ~2 s can cost 4–5× that late in a
  * long bench session.
  *
  * Contract: operators wrap PER-QUERY persists in [[scopedPersist]]
  * (never the session-scoped shared caches — those are meant to live);
  * harnesses ([[Verify]], [[Bench]]) call [[drain]] once per query
  * AFTER its action completes, releasing every tracked cache in one
  * sweep. Library users embedding individual operators get the same
  * contract: call `CacheScope.drain()` between queries, or accept
  * session-lifetime caching (the pre-drain behavior).
  *
  * Unpersist is non-blocking and tolerant of frames already released
  * mid-query (e.g. d18's sweep discards losing configurations early).
  */
object CacheScope {
  private val live = new ConcurrentLinkedQueue[DataFrame]()

  implicit final class ScopedPersist(private val df: DataFrame)
      extends AnyVal {
    /** Persist and register for the next [[drain]]. */
    def scopedPersist(
        level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
      val p = df.persist(level)
      live.add(p)
      p
    }
  }

  /** Identity snapshot of the currently-tracked frames — pair with
    * [[drainSince]] so a nested cache boundary (an Estimator.fit
    * running inside a caller's query) releases only the frames IT
    * registered, never an enclosing query's still-live persists. */
  def snapshot(): java.util.Set[DataFrame] = {
    val s = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[DataFrame, java.lang.Boolean]())
    live.forEach(df => s.add(df))
    s
  }

  /** Release only the frames registered AFTER `snap` was taken;
    * frames in the snapshot stay tracked for their owner's drain.
    * NOTE: this isolates an ENCLOSING caller, not a concurrent one —
    * frames another thread registers between snapshot and drain are
    * indistinguishable from the snapshot-taker's own and get released
    * with them. Callers composing fits concurrently need external
    * coordination (the registry carries no ownership tags). */
  def drainSince(snap: java.util.Set[DataFrame]): Int = {
    var n = 0
    val it = live.iterator()
    while (it.hasNext) {
      val df = it.next()
      if (!snap.contains(df)) {
        it.remove()
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () }
        n += 1
      }
    }
    n
  }

  /** Release every tracked per-query cache; returns how many. */
  def drain(): Int = {
    var n = 0
    var df = live.poll()
    while (df != null) {
      try df.unpersist(blocking = false)
      catch { case _: Throwable => () } // stopped session: nothing to free
      n += 1
      df = live.poll()
    }
    n
  }

  /** Test hook: tracked-but-undrained frame count. */
  private[graft] def liveCount: Int = live.size
}
