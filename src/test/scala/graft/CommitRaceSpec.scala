package graft

import org.apache.hadoop.fs.Path

import graft.operators.ManifestTable

/** The racing-committer window. The format assumes one writer per store for
  * HOUSEKEEPING, but the commit itself must be conditional: of two
  * committers that both observed version N, exactly one installs N+1 and
  * the other THROWS — on local filesystems via the hard-link publisher
  * (link(2) is create-exclusive at the kernel, so there is no
  * exists()+rename window at all). A violated single-writer assumption is
  * therefore always LOUD; a silently lost manifest — the failure mode a
  * plain POSIX rename allows, where the second rename replaces the first
  * committer's snapshot — cannot happen.
  */
class CommitRaceSpec extends SparkSpec {

  test("publishing onto an existing manifest version throws and leaves " +
    "the winner's bytes untouched") {
    val root = java.nio.file.Files.createTempDirectory("graft_race1").toString
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ManifestTable.commitReplace(spark, root, Seq.empty, Seq("w/base.parquet"))
    // the winner installs v2 first...
    ManifestTable.commitReplace(spark, root, Seq.empty, Seq("w/winner.parquet"))
    // ...then the loser — which had already staged its own v2 manifest
    // before the winner's commit landed — attempts to install at the SAME
    // version
    val tmp = new Path(s"$root/_manifests/.tmp-race-loser")
    val out = fs.create(tmp, false)
    try out.write("#token=loser\nw/loser.parquet\n".getBytes("UTF-8"))
    finally out.close()
    val target = new Path(s"$root/_manifests/v${"%020d".format(2L)}.manifest")
    val winnerBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(fs.makeQualified(target).toUri.getPath))
    intercept[IllegalStateException] {
      ManifestTable.defaultCommitPublish(fs, tmp, target)
    }
    assert(java.util.Arrays.equals(winnerBytes,
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(fs.makeQualified(target).toUri.getPath))),
      "losing committer mutated the winner's manifest")
    assert(ManifestTable.liveFiles(spark, root).toSet ==
      Set("w/base.parquet", "w/winner.parquet"),
      "snapshot lost a committed file to the race")
  }

  test("concurrent retrying committers lose no update: every added file " +
    "reaches the final snapshot, versions stay contiguous") {
    val root = java.nio.file.Files.createTempDirectory("graft_race2").toString
    val nThreads = 4
    val perThread = 4
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
              } catch {
                // a lost race is the CONTRACT: re-read the new current
                // version and retry — never silent, never lost
                case _: IllegalStateException => ()
              }
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
      "an update was lost under concurrent commits")
    assert(ManifestTable.versions(spark, root) ==
      (1L to (nThreads * perThread).toLong),
      "committed versions are not contiguous")
    // no temp leaks: a lost race must clean up its staged manifest
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leftovers = fs.listStatus(new Path(s"$root/_manifests")).toSeq
      .map(_.getPath.getName).filter(_.startsWith(".tmp-"))
    assert(leftovers.isEmpty, s"lost races leaked temp manifests: $leftovers")
  }
}
