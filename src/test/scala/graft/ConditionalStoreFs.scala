package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Local filesystem with CONDITIONAL-WRITE object-store semantics — the
  * harness [[graft.operators.ManifestTable.putIfAbsentCommitPublish]] is
  * proven against, registered under the `condfs:` scheme. Models a store
  * whose connector supports native write preconditions (S3 If-None-Match,
  * GCS generation-0, ABFS ETag creates):
  *
  *   - `create(f, overwrite = false)` is a CONDITIONAL PUT: bytes land in a
  *     hidden sibling and the commit point at close is a create-exclusive
  *     hard link — arbitrated atomically at the kernel, exactly one of any
  *     number of racing PUTs of the same key succeeds, the rest throw
  *     [[org.apache.hadoop.fs.FileAlreadyExistsException]] AT CLOSE (where
  *     a real precondition failure surfaces);
  *   - `create(f, overwrite = true)` stays a last-writer-wins PUT, atomic
  *     at close (object-store visibility: never a partial object);
  *   - `rename()` is inherited clobbering-copy semantics — the point of
  *     the conditional path is that commits never rely on rename at all.
  */
class ConditionalStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "condfs"
  override def getUri: URI = URI.create("condfs:///")

  // both create entry points must be covered (see NonAtomicStoreFs: the
  // 6-arg non-permission variant is a sibling, not a delegate)
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    putStream(f, overwrite, bufferSize, replication, blockSize, progress)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    putStream(f, overwrite, bufferSize, replication, blockSize, progress)

  private def putStream(f: Path, overwrite: Boolean, bufferSize: Int,
                        replication: Short, blockSize: Long,
                        progress: Progressable): FSDataOutputStream = {
    val tmp = new Path(f.getParent, s".put-${java.util.UUID.randomUUID()}")
    val out = super.create(tmp, true, bufferSize, replication,
      blockSize, progress)
    new FSDataOutputStream(new java.io.OutputStream {
      override def write(b: Int): Unit = out.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def flush(): Unit = out.flush()
      override def close(): Unit = {
        out.close()
        finishPut(tmp, f, overwrite)
      }
    }, null)
  }

  private def finishPut(tmp: Path, dst: Path, overwrite: Boolean): Unit = {
    val s = java.nio.file.Paths.get(makeQualified(tmp).toUri.getPath)
    val d = java.nio.file.Paths.get(makeQualified(dst).toUri.getPath)
    if (overwrite)
      java.nio.file.Files.move(s, d,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    else {
      // the precondition: create-exclusive at the kernel — of N racing
      // PUTs exactly one links, the others fail here, atomically
      try java.nio.file.Files.createLink(d, s)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          java.nio.file.Files.deleteIfExists(s)
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            s"$dst already exists (write precondition failed)")
      }
      java.nio.file.Files.deleteIfExists(s)
    }
  }
}
