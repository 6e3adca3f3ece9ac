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
  * What this does and does NOT prove: it proves the persist/restore/
  * compaction code is scheme-clean (no default-FS fallbacks, no local
  * shortcuts, FileSystem resolved per path). It does NOT emulate
  * object-store semantics — rename here is atomic and listStatus is
  * immediately consistent, so eventual-consistency or non-atomic-rename
  * failure modes (pre-Nov-2020 S3) remain out of scope; see NOTES.md.
  */
object GraftFs {
  /** Calls observed through the wrapper since JVM start. */
  val ops = new AtomicLong(0)

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
  // change behavior, only observe it.
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
    super.create(p, permission, overwrite, bufferSize, replication, blockSize, progress)
  }
  override def open(p: Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    ops.incrementAndGet(); super.open(p, bufferSize)
  }
  override def rename(src: Path, dst: Path): Boolean = {
    ops.incrementAndGet(); super.rename(src, dst)
  }
  override def delete(p: Path, recursive: Boolean): Boolean = {
    ops.incrementAndGet(); super.delete(p, recursive)
  }
  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    ops.incrementAndGet(); super.mkdirs(p, permission)
  }
}
