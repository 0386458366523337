package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** A local filesystem that FORBIDS rename on any commit-log path — the
  * r10 verdict #4 shim.  `rename` involving `_txlog/` throws, so a
  * single rename-dependent step in the commit protocol fails the spec
  * loudly; everything else delegates to the local store.  Renames
  * OUTSIDE the log (Spark's output committer moving staged data files
  * into `data/<uuid>/`) stay allowed because the table format never
  * relies on their atomicity: data files are invisible until a commit
  * references them, so a copy+delete "rename" torn mid-way leaves only
  * an unreferenced orphan (the crashed-writer contract TxLogSpec pins).
  * The only atomic primitive the LOG itself consumes is
  * conditional-create, which [[graft.core.TxLog]] routes through the
  * hard-link claim for schemes registered in `linkClaimSchemes`. */
class NoRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "norename"
  override def getUri: URI = URI.create("norename:///")

  private def inLog(p: Path): Boolean =
    p.toUri.getPath.split('/').contains("_txlog")

  // RawLocalFileSystem's statuses load permissions LAZILY via
  // java.nio.file.Paths.get(uri), which rejects any scheme but "file" —
  // return eager statuses (default permissions) so LocatedFileStatus
  // construction and friends never touch that path.
  private def eager(s: org.apache.hadoop.fs.FileStatus)
      : org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(s.getLen, s.isDirectory,
      s.getReplication, s.getBlockSize, s.getModificationTime, s.getPath)

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    eager(super.getFileStatus(f))

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(eager)

  override def rename(src: Path, dst: Path): Boolean = {
    if (inLog(src) || inLog(dst))
      throw new UnsupportedOperationException(
        s"norename://: rename is not available on log paths ($src -> $dst)")
    super.rename(src, dst)
  }
}
