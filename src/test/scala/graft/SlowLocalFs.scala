package graft

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}

/** Local filesystem with a fixed latency (and an optional failure) injected
  * into `open()` — a driver-side stand-in for object-store GET round-trips,
  * registered under the `slowfs:` scheme via
  * `fs.slowfs.impl = classOf[SlowLocalFs].getName`. Used to assert that
  * cold Bloom-sidecar probes load from a bounded pool (wall-clock well under
  * the serial per-open floor) and that transient IO errors are retried
  * rather than negative-cached.
  */
class SlowLocalFs extends RawLocalFileSystem {
  override def getScheme: String = "slowfs"
  override def getUri: URI = URI.create("slowfs:///")
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    SlowLocalFs.opens.incrementAndGet()
    if (SlowLocalFs.failOpens)
      throw new java.io.IOException("injected transient open failure")
    Thread.sleep(SlowLocalFs.OpenDelayMs)
    super.open(f, bufferSize)
  }
}

object SlowLocalFs {
  val OpenDelayMs = 25L
  val opens = new AtomicInteger(0)
  @volatile var failOpens = false
}
