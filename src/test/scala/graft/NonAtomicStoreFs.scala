package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Local filesystem with OBJECT-STORE mutation semantics — the harness the
  * lease-lock commit publisher is proven against, registered under the
  * `objfs:` scheme via `fs.objfs.impl`:
  *
  *   - `create()` is a PUT: the overwrite flag is silently ignored (S3 has
  *     no create-exclusive mode), and the object appears ATOMICALLY AT
  *     CLOSE — writes land in a hidden sibling that moves into place when
  *     the stream closes, so a concurrent reader sees the old object or
  *     the complete new one, NEVER a partial write (real S3/GCS/ABFS
  *     visibility; without this the harness fails commits for a reason no
  *     real object store exhibits — an empty just-created manifest);
  *   - file `rename()` is copy + delete and SILENTLY REPLACES an existing
  *     destination — no conditional semantics whatsoever (the "rename is a
  *     fake" property that makes plain exists()+rename commits unsafe
  *     there). Directory renames delegate to the local implementation
  *     (Spark's output committer path, not under test).
  *
  * Reads are strongly consistent (S3 has been read-after-write consistent
  * since 2020) — together with PUT atomicity, exactly the model
  * [[graft.operators.ManifestTable.leaseCommitPublish]] documents.
  */
class NonAtomicStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "objfs"
  override def getUri: URI = URI.create("objfs:///")

  // BOTH create entry points must be covered: RawLocalFileSystem's
  // non-permission 6-arg create is a sibling of the permission variant,
  // not a delegate of it, so FileSystem.create(path, bool) bypasses a
  // 7-arg-only override — the first version of this harness made exactly
  // that mistake and its PUTs were visible (and empty) at create time,
  // which no real object store exhibits.
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    putStream(f, bufferSize, replication, blockSize, progress)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    putStream(f, bufferSize, replication, blockSize, progress)

  private def putStream(f: Path, bufferSize: Int, replication: Short,
                        blockSize: Long,
                        progress: Progressable): FSDataOutputStream = {
    val tmp = new Path(f.getParent,
      s".put-${java.util.UUID.randomUUID()}")
    val out = super.create(tmp, true, bufferSize, replication,
      blockSize, progress)
    new FSDataOutputStream(new java.io.OutputStream {
      override def write(b: Int): Unit = out.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def flush(): Unit = out.flush()
      override def close(): Unit = {
        out.close()
        finishPut(tmp, f)
      }
    }, null)
  }

  /** The PUT's commit point: one atomic last-writer-wins move. */
  private def finishPut(tmp: Path, dst: Path): Unit = {
    val s = java.nio.file.Paths.get(makeQualified(tmp).toUri.getPath)
    val d = java.nio.file.Paths.get(makeQualified(dst).toUri.getPath)
    java.nio.file.Files.move(s, d,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    if (getFileStatus(src).isDirectory) return super.rename(src, dst)
    val in = super.open(src, 8192)
    val data = try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
    val out = create(dst, true)
    try out.write(data) finally out.close()
    delete(src, false)
    true
  }
}
