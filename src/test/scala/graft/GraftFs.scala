package graft

import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test-scoped Hadoop FileSystem registered under the distinct scheme
  * `graftfs://` (VERDICT r12 #1): every recovery-surface law has only
  * ever executed with `file://` behind the Hadoop API, so a
  * scheme-dependent assumption — a path silently re-resolved through a
  * default-FS fallback, a `java.io.File` walk that survived the port, a
  * rename or listStatus call that only works on the local FS object —
  * would pass every law and still fail on hdfs:// or s3a://. This
  * wrapper delegates to [[RawLocalFileSystem]] (bytes land on local
  * disk) but presents a NON-file scheme, so any such assumption
  * surfaces as an unresolvable path or a scheme-mismatch error instead
  * of silently passing.
  *
  * The op counter exists so a law can assert the wrapper was actually
  * exercised — a green run whose paths quietly re-resolved to file://
  * would otherwise prove nothing.
  *
  * FAULT INJECTION (VERDICT r13 #2): the scheme wrapper proved the
  * recovery code scheme-clean, but the guard arms that exist FOR
  * filesystem failures — rename returning false mid-pairing, create
  * crashing mid-ensemble, delete throwing mid-retention, mkdirs
  * returning false before the pairing record — were only ever crossed
  * by hand-deleting markers in tests. [[GraftFs.armFault]] scripts one
  * fault: the next call to the named op on a path containing the given
  * fragment either RETURNS FALSE (rename / mkdirs — the arms the
  * pairing guards key on) or THROWS a
  * [[java.io.FileNotFoundException]] (create / open / delete; an
  * IOException subclass — also the exact signature the
  * replica-invalidation contract keys on; delete is in the THROWING
  * group deliberately: the retention-pass law exercises a delete that
  * dies, not one that politely declines). A non-sticky fault fires
  * exactly once and disarms itself; a sticky one fires until
  * [[GraftFs.disarm]] — the replica second-invalidation law needs
  * repeated failure.
  * Laws assert `faultsFired` moved, so a fault that never matched
  * (refactored path names) fails loudly instead of passing vacuously.
  *
  * What this does and does NOT prove: it proves the persist/restore/
  * compaction code is scheme-clean and that every guard/fallback arm
  * behaves under an injected fault at its exact call site. It does NOT
  * emulate object-store semantics — rename here is atomic and
  * listStatus is immediately consistent, so eventual-consistency or
  * non-atomic-rename failure modes (pre-Nov-2020 S3) remain out of
  * scope; see NOTES.md.
  */
object GraftFs {
  /** Calls observed through the wrapper since JVM start. */
  val ops = new AtomicLong(0)

  /** Times the currently/last armed fault fired. */
  val faultsFired = new AtomicLong(0)

  /** When [[recordCreates]] is on, every path a create lands on is
    * recorded here — the curation-run resume laws assert a resumed run
    * WRITES nothing under its completed stage dirs (their frontiers
    * are read back, never rewritten), which the op counter alone
    * cannot distinguish from reads. */
  val createdPaths = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  @volatile var recordCreates = false
  private[graft] def noteCreate(p: Path): Unit =
    if (recordCreates) createdPaths.add(p.toString)

  final case class FaultSpec(op: String, pathPart: String, sticky: Boolean)

  @volatile private var fault: Option[FaultSpec] = None

  /** Arm one fault: the next `op` ("rename" | "mkdirs" — return false;
    * "create" | "open" | "delete" — throw FileNotFoundException) whose
    * path contains `pathPart` fails. Resets `faultsFired`. */
  def armFault(op: String, pathPart: String, sticky: Boolean = false): Unit =
    synchronized {
      // same monitor as shouldFail (review r14 pass 2): without it a
      // straggler executor task could match the PREVIOUS law's
      // still-armed fault between the counter reset and the new arm,
      // making the next `faultsFired == 1` assertion count the wrong
      // fault's firing
      faultsFired.set(0)
      fault = Some(FaultSpec(op, pathPart, sticky))
    }

  def disarm(): Unit = synchronized { fault = None }

  /** True iff the armed fault matches — records the firing and (if
    * non-sticky) disarms. The boolean-signalling call sites turn true
    * into `false` return values; the throwing sites raise.
    * SYNCHRONIZED: parquet jobs hit matching paths from several local
    * executor threads near-simultaneously, and a check-then-act race
    * would let a non-sticky fault fire twice — flaking every
    * `faultsFired == 1` law assertion. */
  private[graft] def shouldFail(op: String, p: Path): Boolean = synchronized {
    fault match {
      case Some(f) if f.op == op && p.toString.contains(f.pathPart) =>
        if (!f.sticky) fault = None
        faultsFired.incrementAndGet()
        true
      case _ => false
    }
  }

  private[graft] def failThrow(op: String, p: Path): Unit =
    if (shouldFail(op, p))
      throw new java.io.FileNotFoundException(
        s"GraftFs injected fault: $op $p")

  val scheme = "graftfs"

  /** Register the scheme on a session's Hadoop configuration. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration
      .set(s"fs.$scheme.impl", classOf[GraftFs].getName)
}

class GraftFs extends RawLocalFileSystem {
  import GraftFs.ops
  override def getScheme: String = GraftFs.scheme
  override def getUri: URI = URI.create(s"${GraftFs.scheme}:///")

  // Count the calls the recovery surface depends on (walks, markers,
  // snapshot writes, the pairing record's create+rename, the retention
  // deletes). Delegation is unconditional — the wrapper must never
  // change behavior, only observe it — EXCEPT when a law has armed a
  // fault on the specific (op, path) being attempted.
  override def listStatus(p: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    ops.incrementAndGet(); super.listStatus(p)
  }
  override def getFileStatus(p: Path): org.apache.hadoop.fs.FileStatus = {
    ops.incrementAndGet(); super.getFileStatus(p)
  }
  override def create(p: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    ops.incrementAndGet()
    GraftFs.failThrow("create", p)
    GraftFs.noteCreate(p)
    super.create(p, permission, overwrite, bufferSize, replication, blockSize, progress)
  }
  // RawLocalFileSystem overrides the permission-free 6-arg create and
  // the 1-arg mkdirs DIRECTLY (they do not funnel through the
  // permission variants), and FileSystem's convenience overloads —
  // fs.create(path, overwrite), fs.mkdirs(path) — resolve to them; a
  // wrapper that only overrides the permission variants observes
  // nothing on those call sites (round-14 finding: the first fault
  // laws passed vacuously until these landed).
  override def create(p: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    ops.incrementAndGet()
    GraftFs.failThrow("create", p)
    GraftFs.noteCreate(p)
    super.create(p, overwrite, bufferSize, replication, blockSize, progress)
  }
  override def mkdirs(p: Path): Boolean = {
    ops.incrementAndGet()
    if (GraftFs.shouldFail("mkdirs", p)) false
    else super.mkdirs(p)
  }
  override def open(p: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    ops.incrementAndGet()
    GraftFs.failThrow("open", p)
    super.open(p, bufferSize)
  }
  override def rename(src: Path, dst: Path): Boolean = {
    ops.incrementAndGet()
    if (GraftFs.shouldFail("rename", src)) false
    else super.rename(src, dst)
  }
  override def delete(p: Path, recursive: Boolean): Boolean = {
    ops.incrementAndGet()
    GraftFs.failThrow("delete", p)
    super.delete(p, recursive)
  }
  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    ops.incrementAndGet()
    if (GraftFs.shouldFail("mkdirs", p)) false
    else super.mkdirs(p, permission)
  }
}
