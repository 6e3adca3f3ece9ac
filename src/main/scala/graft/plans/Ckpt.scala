package graft.plans

import org.apache.spark.sql.DataFrame

/** Checkpoint shim closing the plan-audit blind spot: an eager
  * `localCheckpoint()` inside a query's construction executes its
  * upstream stages immediately, so the DataFrame the audit walks
  * starts at the checkpointed RDD — any single-partition funnel ABOVE
  * the checkpoint is invisible to PlanAuditSpec. Every
  * multiply-consumed derivation in `graft.operators` therefore
  * checkpoints through `ckpt()`: identical to `localCheckpoint()` in
  * production, but PlanAuditSpec flips [[auditMode]] on so the full
  * pre-checkpoint plan reaches the audit (and [[DerivationCache]]
  * skips caching, keeping the shared-session caches free of
  * uncheckpointed frames).
  */
object Ckpt {

  @volatile private var audit: Boolean = false
  private val flips = new java.util.concurrent.atomic.AtomicLong(0)
  private val holder = new java.util.concurrent.atomic.AtomicReference[Thread](null)

  /** True while some thread holds the [[withAudit]] scope. Read-only:
    * the flag can only change through `withAudit`, which enforces a
    * single holder, and every memoization site guards with
    * [[auditEpoch]] — so even if suites ever run parallel in one JVM,
    * a build racing an audit flip can return an uncheckpointed frame
    * to ITS caller but can never LASTINGLY poison a shared cache (a
    * frame built across a flip is evicted by its builder; a third
    * thread can still cache-hit it in the instants before that
    * eviction runs — transient, self-healing, and impossible under the
    * current forked-sequential suites). */
  def auditMode: Boolean = audit

  /** Monotonic flip counter. Memoization sites capture it BEFORE a
    * build and refuse to cache if it moved — a flip mid-build means
    * `ckpt()` may have no-opped inside the build, so the frame is
    * correct to return but not safe to share. */
  def auditEpoch: Long = flips.get

  /** Run `f` with checkpoints disabled (plan-audit mode). Single
    * holder enforced: a second concurrent audit throws instead of
    * silently overlapping scopes. */
  def withAudit[T](f: => T): T = {
    val me = Thread.currentThread()
    if (!holder.compareAndSet(null, me))
      throw new IllegalStateException(
        s"Ckpt audit scope already held by thread ${holder.get()}")
    // ORDER MATTERS on both edges: the flag changes BEFORE the epoch
    // bumps. A builder samples (epoch, flag) at entry and re-reads the
    // epoch after computing — if it saw the epoch pre-bump it must
    // also have seen the flag mid-transition value that makes its own
    // behavior safe (entry: flag already true → builder returns
    // uncached; exit: flag already false → ckpt() worked normally).
    // Bumping first would let a builder capture the post-bump epoch
    // while the flag still reads stale, caching an uncheckpointed
    // frame that the unchanged epoch can never evict.
    audit = true
    flips.incrementAndGet()
    try f
    finally {
      audit = false
      flips.incrementAndGet()
      holder.set(null)
    }
  }

  implicit final class CkptOps(private val df: DataFrame) extends AnyVal {
    def ckpt(): DataFrame = if (auditMode) df else df.localCheckpoint()
  }
}
