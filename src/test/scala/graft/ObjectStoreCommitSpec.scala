package graft

import org.apache.hadoop.fs.Path

import graft.operators.{CommitConflictException, ManifestTable}

/** The object-store conditional commit ([[ManifestTable.leaseCommitPublish]]
  * — the Delta-on-S3 LogStore role). Everything runs over `objfs:`, a
  * filesystem whose rename SILENTLY REPLACES the target and whose create
  * ignores the overwrite flag ([[NonAtomicStoreFs]]) — on it, the legacy
  * exists()+rename publisher loses manifests to every same-version race,
  * so these tests prove the scheme-dispatched lease path actually engages
  * and actually serializes.
  */
class ObjectStoreCommitSpec extends SparkSpec {

  private def conf = spark.sparkContext.hadoopConfiguration

  private def objRoot(prefix: String): String = {
    conf.set("fs.objfs.impl", classOf[NonAtomicStoreFs].getName)
    conf.set("graft.commit.nonatomic.schemes", "objfs")
    conf.setLong("graft.commit.lease.settle.ms", 25L)
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    s"objfs:$dir"
  }

  private def readAll(fs: org.apache.hadoop.fs.FileSystem,
                      p: Path): Array[Byte] = {
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { bos.write(buf, 0, n); n = in.read(buf) }
      bos.toByteArray
    } finally in.close()
  }

  test("sanity: objfs rename really does clobber its target silently") {
    val root = objRoot("graft_objfs_sanity")
    val fs = new Path(root).getFileSystem(conf)
    assert(fs.isInstanceOf[NonAtomicStoreFs], "objfs scheme not registered")
    def put(p: Path, s: String): Unit = {
      val out = fs.create(p, false)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    put(new Path(s"$root/a"), "A")
    put(new Path(s"$root/b"), "B")
    assert(fs.rename(new Path(s"$root/a"), new Path(s"$root/b")),
      "objfs rename refused an existing target — harness is NOT " +
        "object-store-like and these tests prove nothing")
    assert(new String(readAll(fs, new Path(s"$root/b")), "UTF-8") == "A",
      "clobbering rename did not move the bytes")
  }

  test("same-version race on objfs: the loser throws and the winner's " +
    "manifest survives byte-for-byte") {
    val root = objRoot("graft_objrace1")
    val fs = new Path(root).getFileSystem(conf)
    ManifestTable.commitReplace(spark, root, Seq.empty, Seq("w/base.parquet"))
    ManifestTable.commitReplace(spark, root, Seq.empty, Seq("w/winner.parquet"))
    val tmp = new Path(s"$root/_manifests/.tmp-race-loser")
    val out = fs.create(tmp, false)
    try out.write("#token=loser\nw/loser.parquet\n".getBytes("UTF-8"))
    finally out.close()
    val target = new Path(s"$root/_manifests/v${"%020d".format(2L)}.manifest")
    val winnerBytes = readAll(fs, target)
    intercept[CommitConflictException] {
      ManifestTable.defaultCommitPublish(fs, tmp, target)
    }
    assert(java.util.Arrays.equals(winnerBytes, readAll(fs, target)),
      "losing committer mutated the winner's manifest — on a clobbering " +
        "rename FS this means the lease path did not engage")
    assert(ManifestTable.liveFiles(spark, root).toSet ==
      Set("w/base.parquet", "w/winner.parquet"))
  }

  test("concurrent retrying committers on objfs lose no update and leave " +
    "no lock or temp behind") {
    val root = objRoot("graft_objrace2")
    val nThreads = 3
    val perThread = 3
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        try {
          (0 until perThread).foreach { c =>
            var committed = false
            var attempts = 0
            while (!committed) {
              attempts += 1
              require(attempts <= 200, "livelocked committer")
              try {
                ManifestTable.commitReplace(spark, root, Seq.empty,
                  Seq(s"w/t${t}_c$c.parquet"))
                committed = true
              } catch { case _: CommitConflictException => () }
            }
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"committer thread died: ${errors.peek()}")
    val expected = (for (t <- 0 until nThreads; c <- 0 until perThread)
      yield s"w/t${t}_c$c.parquet").toSet
    assert(ManifestTable.liveFiles(spark, root).toSet == expected,
      "an update was lost under concurrent commits on the object store")
    assert(ManifestTable.versions(spark, root) ==
      (1L to (nThreads * perThread).toLong),
      "committed versions are not contiguous")
    val fs = new Path(root).getFileSystem(conf)
    val leftovers = fs.listStatus(new Path(s"$root/_manifests")).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith(".tmp-") || n.endsWith(".lock"))
    assert(leftovers.isEmpty,
      s"commits leaked temp manifests or lock files: $leftovers")
  }

  test("a crashed committer's expired lease is broken; a live foreign " +
    "lease blocks until the acquire budget expires") {
    val root = objRoot("graft_objlease")
    val fs = new Path(root).getFileSystem(conf)
    ManifestTable.commitReplace(spark, root, Seq.empty, Seq("w/v1.parquet"))
    val target2 = new Path(s"$root/_manifests/v${"%020d".format(2L)}.manifest")
    val lock = new Path(target2.getParent, target2.getName + ".lock")
    def plantLock(ageMs: Long): Unit = {
      val out = fs.create(lock, true)
      try out.write(
        s"dead-committer\n${System.currentTimeMillis() - ageMs}"
          .getBytes("UTF-8"))
      finally out.close()
    }
    // expired (default lease 60 s, stamp 10 min old): broken and committed
    plantLock(600000L)
    val v = ManifestTable.commitReplace(spark, root, Seq.empty,
      Seq("w/v2.parquet"))
    assert(v == 2L && !fs.exists(lock), "expired lease not broken/released")
    // live foreign lease on v3: the committer must wait, then give up
    // loudly once the (shrunk) acquire budget runs out
    val lock3 = new Path(s"$root/_manifests/" +
      s"v${"%020d".format(3L)}.manifest.lock")
    val out = fs.create(lock3, true)
    try out.write(s"live-holder\n${System.currentTimeMillis()}"
      .getBytes("UTF-8"))
    finally out.close()
    conf.setLong("graft.commit.lease.timeout.ms", 300L)
    try {
      val e = intercept[IllegalStateException] {
        ManifestTable.commitReplace(spark, root, Seq.empty,
          Seq("w/v3.parquet"))
      }
      assert(e.getMessage.contains("lease"),
        s"expected a lease-timeout failure, got: ${e.getMessage}")
      assert(ManifestTable.currentVersion(spark, root).contains(2L),
        "a blocked committer moved the version anyway")
    } finally conf.setLong("graft.commit.lease.timeout.ms", 600000L)
  }

  // ---- the putIfAbsent publisher ([[ConditionalStoreFs]], `condfs:`) ----

  /** `condfs:` root. The scheme is ALSO declared rename-non-atomic, and
    * the lease settle window is set to ten minutes: if the lease path
    * engaged anywhere, these tests would hang — finishing fast IS the
    * proof that the conditional-create dispatch wins and that no clock or
    * settle-window assumption is involved.
    */
  private def condRoot(prefix: String): String = {
    conf.set("fs.condfs.impl", classOf[ConditionalStoreFs].getName)
    conf.set("graft.commit.conditional.schemes", "condfs")
    conf.set("graft.commit.nonatomic.schemes", "objfs,condfs")
    conf.setLong("graft.commit.lease.settle.ms", 600000L)
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    s"condfs:$dir"
  }

  private def noLocksEver(fs: org.apache.hadoop.fs.FileSystem,
                          root: String): Unit = {
    val leftovers = fs.listStatus(new Path(s"$root/_manifests")).toSeq
      .map(_.getPath.getName)
      .filter(n => n.startsWith(".tmp-") || n.endsWith(".lock") ||
        n.startsWith(".put-"))
    assert(leftovers.isEmpty,
      s"conditional commits left locks/temps behind (lease path engaged?): " +
        leftovers)
  }

  test("condfs same-version race: exactly one PUT wins at the store's " +
    "precondition, the loser throws, no lock object is ever created") {
    val root = condRoot("graft_cond1")
    val fs = new Path(root).getFileSystem(conf)
    assert(fs.isInstanceOf[ConditionalStoreFs], "condfs scheme not registered")
    ManifestTable.commitReplace(spark, root, Seq.empty, Seq("w/base.parquet"))
    ManifestTable.commitReplace(spark, root, Seq.empty, Seq("w/winner.parquet"))
    val tmp = new Path(s"$root/_manifests/.tmp-race-loser")
    val out = fs.create(tmp, true)
    try out.write("#token=loser\nw/loser.parquet\n".getBytes("UTF-8"))
    finally out.close()
    val target = new Path(s"$root/_manifests/v${"%020d".format(2L)}.manifest")
    val winnerBytes = readAll(fs, target)
    intercept[CommitConflictException] {
      ManifestTable.defaultCommitPublish(fs, tmp, target)
    }
    assert(java.util.Arrays.equals(winnerBytes, readAll(fs, target)),
      "losing committer mutated the winner's manifest through the " +
        "conditional PUT")
    assert(ManifestTable.liveFiles(spark, root).toSet ==
      Set("w/base.parquet", "w/winner.parquet"))
    // the hand-staged loser temp is OURS to clean (commitDropping owns temp
    // cleanup in the real flow — the concurrent test below proves it);
    // what must never exist on condfs is a lock or an in-flight PUT
    fs.delete(tmp, false)
    noLocksEver(fs, root)
  }

  test("condfs concurrent retrying committers lose no update, leave no " +
    "lock, and never consult a clock or settle window") {
    val root = condRoot("graft_cond2")
    val started = System.nanoTime()
    val nThreads = 3
    val perThread = 3
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        try {
          (0 until perThread).foreach { c =>
            var committed = false
            var attempts = 0
            while (!committed) {
              attempts += 1
              require(attempts <= 200, "livelocked committer")
              try {
                ManifestTable.commitReplace(spark, root, Seq.empty,
                  Seq(s"w/t${t}_c$c.parquet"))
                committed = true
              } catch { case _: CommitConflictException => () }
            }
          }
        } catch { case e: Throwable => errors.add(e) }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"committer thread died: ${errors.peek()}")
    val expected = (for (t <- 0 until nThreads; c <- 0 until perThread)
      yield s"w/t${t}_c$c.parquet").toSet
    assert(ManifestTable.liveFiles(spark, root).toSet == expected,
      "an update was lost under concurrent conditional commits")
    assert(ManifestTable.versions(spark, root) ==
      (1L to (nThreads * perThread).toLong),
      "committed versions are not contiguous")
    val fs = new Path(root).getFileSystem(conf)
    noLocksEver(fs, root)
    // 9 commits under a 600 s settle window: a single lease engagement
    // would alone exceed this bound
    assert((System.nanoTime() - started) < 300L * 1e9,
      "conditional commits took so long the lease path must have engaged")
  }

  test("ambiguous 'exist' IOExceptions are resolved by probing the target, " +
    "never guessed: absent → rethrown, ours → success, foreign → conflict") {
    import java.io.IOException
    import org.apache.hadoop.fs.{FSDataOutputStream, RawLocalFileSystem}
    import org.apache.hadoop.fs.permission.FsPermission
    import org.apache.hadoop.util.Progressable
    val base = new Path(
      java.nio.file.Files.createTempDirectory("graft_condamb").toString)
    // a connector whose conditional create fails with a message that merely
    // CONTAINS "exist" — the three shapes the substring match used to
    // misclassify as conflicts
    def fsWith(behavior: String): org.apache.hadoop.fs.FileSystem = {
      val fs = new RawLocalFileSystem() {
        // both create entry points (the ConditionalStoreFs lesson: the
        // non-permission variant is a sibling, not a delegate)
        override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                            replication: Short, blockSize: Long,
                            progress: Progressable): FSDataOutputStream =
          if (!overwrite && f.getName.endsWith(".manifest"))
            flaky(f, () => super.create(f, overwrite, bufferSize,
              replication, blockSize, progress))
          else super.create(f, overwrite, bufferSize, replication,
            blockSize, progress)
        override def create(f: Path, permission: FsPermission,
                            overwrite: Boolean, bufferSize: Int,
                            replication: Short, blockSize: Long,
                            progress: Progressable): FSDataOutputStream =
          if (!overwrite && f.getName.endsWith(".manifest"))
            flaky(f, () => super.create(f, permission, overwrite, bufferSize,
              replication, blockSize, progress))
          else super.create(f, permission, overwrite, bufferSize,
            replication, blockSize, progress)
        private def flaky(f: Path,
                          real: () => FSDataOutputStream): FSDataOutputStream =
          behavior match {
            case "absent-error" => // transport error, nothing materialized
              throw new IOException(s"parent of $f does not exist")
            case "error-after-put" => // PUT lands, THEN the error surfaces
              val out = real()
              new FSDataOutputStream(new java.io.OutputStream {
                override def write(b: Int): Unit = out.write(b)
                override def write(b: Array[Byte], off: Int, len: Int): Unit =
                  out.write(b, off, len)
                override def close(): Unit = {
                  out.close()
                  throw new IOException(
                    "connector retry noticed the object already exists")
                }
              }, null)
            case "foreign-exists" => // a rival's manifest really is there
              throw new IOException("key exists check failed")
          }
      }
      fs.initialize(java.net.URI.create("file:///"), conf)
      fs
    }
    def stage(fs: org.apache.hadoop.fs.FileSystem, name: String,
              bytes: String): Path = {
      val p = new Path(base, name)
      val out = fs.create(p, true)
      try out.write(bytes.getBytes("UTF-8")) finally out.close()
      p
    }

    // (a) target ABSENT: the "does not exist" error is not a conflict —
    // rethrow it verbatim (a conflict here would make the tick's handler
    // delete this attempt's data files on no evidence)
    val fsA = fsWith("absent-error")
    val tmpA = stage(fsA, ".tmp-a", "#token=a\nw/a.parquet\n")
    val tgtA = new Path(base, "va.manifest")
    val eA = intercept[IOException] {
      ManifestTable.putIfAbsentCommitPublish(fsA, tmpA, tgtA)
    }
    assert(!eA.isInstanceOf[CommitConflictException] &&
      eA.getMessage.contains("does not exist"),
      s"absent-target error was reclassified: $eA")
    assert(!fsA.exists(tgtA))

    // (b) the PUT materialized OUR bytes before the error surfaced: the
    // commit happened — success, not a conflict (which would delete data
    // files a committed manifest references)
    val fsB = fsWith("error-after-put")
    val tmpB = stage(fsB, ".tmp-b", "#token=b\nw/b.parquet\n")
    val tgtB = new Path(base, "vb.manifest")
    ManifestTable.putIfAbsentCommitPublish(fsB, tmpB, tgtB)
    assert(new String(readAll(fsB, tgtB), "UTF-8")
      .contains("w/b.parquet"), "committed bytes are not ours")
    assert(!fsB.exists(tmpB), "temp not cleaned after resolved success")

    // (c) a FOREIGN manifest is really there: conflict, rival untouched
    val fsC = fsWith("foreign-exists")
    val tmpC = stage(fsC, ".tmp-c", "#token=c\nw/c.parquet\n")
    val tgtC = stage(fsC, "vc.manifest", "#token=rival\nw/rival.parquet\n")
    intercept[CommitConflictException] {
      ManifestTable.putIfAbsentCommitPublish(fsC, tmpC, tgtC)
    }
    assert(new String(readAll(fsC, tgtC), "UTF-8").contains("rival"),
      "conflict resolution mutated the rival's manifest")
  }
}
