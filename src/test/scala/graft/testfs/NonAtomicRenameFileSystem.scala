package graft.testfs

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}

/** A Hadoop FileSystem modeling the OBJECT-STORE contract the caslog
  * commit protocol targets (scheme `naf`, backed by the local disk):
  *
  *   - `rename` is NON-ATOMIC copy-then-delete — exactly what
  *     S3-class stores do under the hood — and crash-injectable
  *     BETWEEN the copy and the delete ([[NafCrash]]), so a test can
  *     leave both source and destination on disk mid-"rename";
  *   - single-object create keeps the local semantics; the caslog
  *     protocol additionally assumes object-PUT visibility is
  *     all-or-nothing (true of S3/GCS/Azure) — the specs never crash
  *     mid-write, so the assumption is documented, not simulated.
  *
  * [[graft.StoreCaslogSpec]] drives the full store-journal lifecycle
  * over this FS to prove the caslog committed path needs no atomic
  * rename anywhere. */
class NonAtomicRenameFileSystem extends RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("naf:///")

  // RawLocalFileSystem's FileStatus loads permissions LAZILY via
  // `new java.io.File(status.getPath.toUri)`, which rejects any scheme
  // but "file" — return statuses with the permission pinned so the lazy
  // path never runs under the naf scheme.
  private def solid(st: org.apache.hadoop.fs.FileStatus) =
    new org.apache.hadoop.fs.FileStatus(
      st.getLen, st.isDirectory, st.getReplication, st.getBlockSize,
      st.getModificationTime, st.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getDirDefault,
      "", "", st.getPath)

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    solid(super.getFileStatus(f))

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(solid)

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) false
    else {
      NafCrash.hit("rename-before-copy")
      FileUtil.copy(this, src, this, dst, false, true, getConf)
      NafCrash.hit("rename-after-copy")
      delete(src, true)
      true
    }
  }
}

/** Crash-injection switchboard for [[NonAtomicRenameFileSystem]]:
  * `at = Some("rename-after-copy")` makes the NEXT rename die with the
  * copy landed and the source still present — the exact window where a
  * copy+delete "rename" silently breaks protocols that assumed
  * atomicity. `renames` counts rename calls for no-rename assertions. */
object NafCrash {
  @volatile var at: Option[String] = None
  @volatile var renames: Long = 0L
  def hit(point: String): Unit = {
    if (point == "rename-before-copy") renames += 1
    if (at.contains(point))
      throw new java.io.IOException(s"injected crash at $point")
  }
  def reset(): Unit = { at = None; renames = 0L }
}
