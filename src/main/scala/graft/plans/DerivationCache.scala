package graft.plans

import org.apache.spark.sql.SparkSession

/** Memoized derived values (localCheckpoint'ed DataFrames or tuples of
  * them) keyed by (session, fixture dir) — the single-process stand-in
  * for the persisted intermediates a production pipeline writes once
  * per corpus snapshot (IVF index, near-dup pair graph, percentile
  * stats table). Contract: the derivation must be RNG-free and the dir
  * immutable, so a cached value is bit-identical to a recomputation
  * (certified for the pair graph in LawsSpec); the caller
  * localCheckpoints inside `f` so reuse never replays lineage.
  *
  * Entries for STOPPED sessions are evicted on every access: their
  * localCheckpoint blocks died with the session's block manager, so
  * keeping them would both leak the reference and serve unreadable
  * frames to a key that can never be queried again.
  */
final class DerivationCache[V] {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]()

  def getOrCompute(s: SparkSession, dir: String)(f: => V): V = {
    cache.keySet().removeIf(k => k._1.sparkContext.isStopped)
    cache.computeIfAbsent((s, dir), _ => f)
  }
}
