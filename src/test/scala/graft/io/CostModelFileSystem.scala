package graft.io

import java.util.concurrent.atomic.AtomicLong
import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.RawLocalFileSystem

/** Test FileSystem with S3 rename semantics COSTED: on S3-family
  * stores a "rename" is a server-side COPY + DELETE, so its cost is
  * the byte size of what moves. This shim (scheme `costfs://`, local
  * FS underneath) meters every rename's bytes into a global counter,
  * turning the direct layout's "zero data bytes moved" claim from a
  * (path,len,mtime) identity assert into a COST assert an object-store
  * deployment would feel — and exercising scheme-qualified URI paths
  * through the whole snapshot stack (the reference runs on MinIO via
  * `s3a://`; no S3 jar ships here, so the cost model is the testable
  * half of that capability).
  *
  * Register per test: `conf.set("fs.costfs.impl", classOf[...].getName)`.
  */
class CostModelFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "costfs"
  override def getUri: java.net.URI = java.net.URI.create("costfs:///")

  // RawLocalFileSystem's DeprecatedRawLocalFileStatus lazily loads
  // permissions via `new java.io.File(path.toUri)`, which rejects any
  // scheme but "file" — return plain eager FileStatus copies instead
  // (permissions are irrelevant to the cost model)
  private def strip(s: org.apache.hadoop.fs.FileStatus): org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(s.getLen, s.isDirectory, s.getReplication,
      s.getBlockSize, s.getModificationTime, s.getPath)

  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus =
    strip(super.getFileStatus(f))

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(strip)

  override def rename(src: Path, dst: Path): Boolean = {
    val n = bytesUnder(src)
    val ok = super.rename(src, dst)
    if (ok) CostModelFileSystem.bytesRenamed.addAndGet(n)
    ok
  }

  private def bytesUnder(p: Path): Long =
    if (!exists(p)) 0L
    else {
      val st = getFileStatus(p)
      if (st.isFile) st.getLen
      else listStatus(p).map(s => bytesUnder(s.getPath)).sum
    }
}

object CostModelFileSystem {
  /** Total bytes "copied" by renames since the last reset — what an
    * S3-family store would bill for the same operations. */
  val bytesRenamed = new AtomicLong(0L)
}
