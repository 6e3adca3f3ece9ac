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

  /** JVM-global audit switch. THREADING CONTRACT: flipped only by
    * PlanAuditSpec, whose suites run forked-sequential (build.sbt does
    * not enable testForkedParallel) — so no concurrent
    * DerivationCache.getOrCompute can observe the flag mid-flip and
    * memoize an uncheckpointed frame. If test parallelism is ever
    * enabled in one JVM, make this a per-call parameter or share a
    * lock with DerivationCache before trusting the caches. */
  @volatile var auditMode: Boolean = false

  implicit final class CkptOps(private val df: DataFrame) extends AnyVal {
    def ckpt(): DataFrame = if (auditMode) df else df.localCheckpoint()
  }
}
