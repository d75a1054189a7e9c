package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}

/** The filesystem atomicity primitives the snapshot layer's commit
  * protocol is built on, shared by [[SnapshotTables]] (per-table
  * version CAS) and [[LakeCommits]] (catalog-level commit-log CAS) so
  * both lines of commits have IDENTICAL semantics.
  *
  * See the concurrency notes on [[SnapshotTables]] for why local-FS
  * exclusive create must go through POSIX O_EXCL rather than Hadoop's
  * check-then-create, and what the S3A caveat is.
  */
private[graft] object AtomicFs {

  /** Exclusive create — the commit CAS. Returns false ONLY when `p`
    * already exists (another writer won). Any other I/O failure after
    * a successful exclusive create is a genuine error: this writer's
    * partial file is removed (so it cannot wedge the slot for
    * everyone) and the exception propagates — it must not be
    * misreported as a lost race. */
  def createExclusive(f: FileSystem, p: Path, content: String): Boolean =
    if (f.getScheme == "file") {
      // POSIX O_EXCL (CREATE_NEW) — a truly atomic local CAS. Hadoop's
      // local create(overwrite=false) is check-THEN-create: two racing
      // writers can both pass the check and both "win".
      val local = java.nio.file.Paths.get(p.toUri.getPath)
      java.nio.file.Files.createDirectories(local.getParent)
      try {
        java.nio.file.Files.write(local, content.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case e: java.io.IOException =>
          try java.nio.file.Files.deleteIfExists(local)
          catch { case _: java.io.IOException => () }
          throw e
      }
    } else {
      val out =
        try f.create(p, false)
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => null
          // some FileSystems predate the typed exception and signal an
          // existing file as a plain IOException — treat as lost race
          // only when the file demonstrably exists
          case _: java.io.IOException if f.exists(p) => null
        }
      if (out == null) false
      else
        try {
          try out.write(content.getBytes("UTF-8"))
          finally out.close()
          true
        } catch {
          // CONDITIONAL-PUT stores (S3 If-None-Match — the s3g wire
          // FS) only learn about the losing race when the buffered
          // object uploads at close(): that is a lost CAS, and the
          // loser's object never landed — nothing to delete (deleting
          // here would kill the WINNER's file)
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case e: java.io.IOException =>
            try f.delete(p, false)
            catch { case _: java.io.IOException => () }
            throw e
        }
    }

  def readSmall(f: FileSystem, p: Path): String = {
    val in = f.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** Overwrite a small metadata file WITHOUT a torn-read window: write
    * to a unique sibling temp, then move it over the destination. On
    * the local FS the move is POSIX-atomic (ATOMIC_MOVE); elsewhere it
    * degrades to delete+rename — a reader can then briefly see the
    * file absent (and fall back to its documented no-file behavior)
    * but can never see half the content. */
  def replaceSmall(f: FileSystem, p: Path, content: String): Unit = {
    val tmp = new Path(p.getParent, s".${p.getName}.tmp-${java.util.UUID.randomUUID}")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8"))
    finally out.close()
    if (f.getScheme == "file") {
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(p.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      if (f.exists(p)) f.delete(p, false)
      if (!f.rename(tmp, p)) {
        f.delete(tmp, false)
        throw new java.io.IOException(s"rename $tmp -> $p failed")
      }
    }
  }
}
