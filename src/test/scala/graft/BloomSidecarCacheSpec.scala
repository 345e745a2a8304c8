package graft

import org.apache.spark.util.sketch.BloomFilter

import graft.operators.ManifestTable

/** The driver-side sidecar loading path under production conditions: cold
  * probes must not serialize one filesystem round-trip per file (at
  * thousands of files per touched bucket the FIRST tick over a store would
  * pay minutes of driver latency on an object store), warm probes must not
  * touch the filesystem at all, and the failure-caching rule must split
  * PERMANENT corruption (a torn-write sidecar: re-reading the same immutable
  * bytes can never succeed — cache the miss) from TRANSIENT IO errors (a
  * throttled open must not disable a file's pruning for the driver's
  * lifetime — retry uncached). All through `slowfs:`, a local filesystem
  * with object-store-like open latency and injectable failures.
  */
class BloomSidecarCacheSpec extends SparkSpec {

  private def slowRoot(): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.slowfs.impl", classOf[SlowLocalFs].getName)
    val dir = java.nio.file.Files.createTempDirectory("graft_slowbloom")
    java.nio.file.Files.createDirectories(dir.resolve("_blooms"))
    s"slowfs:$dir"
  }

  private def writeSidecar(root: String, relFile: String,
                           keys: Seq[String]): Unit = {
    val local = root.stripPrefix("slowfs:")
    val bf = BloomFilter.create(math.max(keys.size.toLong, 16L), 0.01)
    keys.foreach(bf.putString)
    val out = new java.io.FileOutputStream(s"$local/_blooms/$relFile.bloom")
    try bf.writeTo(out) finally out.close()
  }

  test("cold sidecar probes load from a bounded pool — wall-clock well " +
    "under the serial per-open floor — and warm probes never reopen") {
    val root = slowRoot()
    val files = (0 until 48).map(i => s"f$i.parquet")
    files.zipWithIndex.foreach { case (f, i) =>
      writeSidecar(root, f, Seq(s"key$i"))
    }
    val t0 = System.nanoTime()
    val loaded = ManifestTable.readBlooms(spark, root, files)
    val coldMs = (System.nanoTime() - t0) / 1e6
    assert(loaded.size == 48 && loaded.values.forall(_.nonEmpty),
      "cold probe lost sidecars")
    // behavior unchanged by the concurrency: every filter still answers
    // for its own keys (no cross-file mixups from the pooled loads)
    files.zipWithIndex.foreach { case (f, i) =>
      assert(loaded(f).get.mightContainString(s"key$i"),
        s"$f lost its key through the pooled load")
    }
    // 48 opens x 25 ms = 1200 ms serial; the 16-thread pool should land
    // around 3 waves (~75 ms) + overhead. Half the serial floor is the
    // conservative sub-linearity assertion (16x parallel in practice).
    val serialFloorMs = 48 * SlowLocalFs.OpenDelayMs
    assert(coldMs < serialFloorMs / 2.0,
      f"cold 48-file probe took $coldMs%.0f ms — not sub-linear vs the " +
        f"$serialFloorMs ms serial floor; pooled loading broken")

    // warm probes are pure cache: delete the backing files, count opens —
    // the answers must survive and the filesystem must never be touched
    val local = root.stripPrefix("slowfs:")
    files.foreach(f => java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$local/_blooms/$f.bloom")))
    val opensBefore = SlowLocalFs.opens.get()
    val warm = ManifestTable.readBlooms(spark, root, files)
    assert(warm.values.forall(_.nonEmpty), "warm probe lost cached sidecars")
    assert(SlowLocalFs.opens.get() == opensBefore,
      "warm probe reopened sidecar files — cache not serving")
  }

  test("a corrupt sidecar is negative-cached after one full read; a " +
    "transient open failure is retried uncached") {
    val root = slowRoot()
    val local = root.stripPrefix("slowfs:")

    // corrupt: readable in full, undecodable. One probe caches the miss —
    // the file is immutable in the store protocol, so even a later valid
    // rewrite at the same name (which the protocol forbids) is not seen:
    // that's the cache contract, not a bug, and it bounds the re-read cost
    // of a torn write at ONE read instead of one per probe forever.
    val corrupt = "corrupt.parquet"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$local/_blooms/$corrupt.bloom"),
      "this is not a bloom filter".getBytes("UTF-8"))
    assert(ManifestTable.readBloom(spark, root, corrupt).isEmpty,
      "corrupt sidecar decoded")
    writeSidecar(root, corrupt, Seq("k"))
    val opensBefore = SlowLocalFs.opens.get()
    assert(ManifestTable.readBloom(spark, root, corrupt).isEmpty,
      "corrupt-sidecar verdict not cached")
    assert(SlowLocalFs.opens.get() == opensBefore,
      "corrupt sidecar re-read on every probe — decode failure not cached")

    // transient: an injected open error keeps the file (None) but caches
    // nothing; the next probe retries and succeeds
    val flaky = "flaky.parquet"
    writeSidecar(root, flaky, Seq("fk"))
    SlowLocalFs.failOpens = true
    try assert(ManifestTable.readBloom(spark, root, flaky).isEmpty,
      "probe succeeded through an injected open failure")
    finally SlowLocalFs.failOpens = false
    val retried = ManifestTable.readBloom(spark, root, flaky)
    assert(retried.nonEmpty && retried.get.mightContainString("fk"),
      "transient open failure was negative-cached — pruning permanently " +
        "disabled for the file")
  }
}
