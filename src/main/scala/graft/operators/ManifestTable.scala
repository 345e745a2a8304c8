package graft.operators

import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.collection.mutable.ListBuffer

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal snapshot-manifest table format: the dependency-free analog of
  * the single-statement transactional upserts the reference gets from
  * Postgres (`aggregators/base.py:155-238` — one INSERT .. ON CONFLICT is
  * atomic; a partition-dir swap on object storage is not).
  *
  * Layout under `root/`:
  * {{{
  *   _manifests/v00000000000000000001.manifest   one line per LIVE data file
  *   data/p_date=2024-01-01/part-...-<uuid>.parquet
  * }}}
  *
  * Protocol (write side):
  *   1. publish: move freshly-written files into `data/` under their
  *      partition dirs. File names carry Spark's per-job UUID, so versions
  *      never collide and published-but-uncommitted files are invisible.
  *   2. commit: write the next manifest to a temp name, then one atomic
  *      `rename` — the ONLY mutation readers can observe. A crash anywhere
  *      before it leaves the previous snapshot fully intact (orphan files
  *      only; `vacuum` reclaims them).
  *
  * Read side: the manifest IS the file listing — no recursive directory
  * listing, which at 100 TB (millions of files on object storage) is itself
  * the scan-planning bottleneck this format removes. Readers pin a snapshot:
  * a concurrent commit cannot make them see a torn mix of versions.
  *
  * Single writer assumed (the reference's collectors are single-flow too).
  * On HDFS-like filesystems the version-numbered rename additionally detects
  * a racing committer (rename onto an existing manifest fails); local POSIX
  * rename and object stores do not give that guarantee — see
  * [[commitReplace]].
  *
  * `vacuum` retains the last [[RetainSnapshots]] snapshots, so a reader
  * pinned to the previous version survives a concurrent commit + vacuum.
  */
object ManifestTable {

  private val ManifestDirName = "_manifests"

  def dataDir(root: String): String = s"$root/data"

  private def fsOf(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, version: Long): Path =
    new Path(s"$root/$ManifestDirName/v${"%020d".format(version)}.manifest")

  /** Latest committed version, if any manifest exists. */
  def currentVersion(spark: SparkSession, root: String): Option[Long] =
    versions(spark, root).lastOption

  /** All committed versions, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val dir = new Path(s"$root/$ManifestDirName")
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".manifest") =>
        n.stripPrefix("v").stripSuffix(".manifest").toLong
      }.sorted
  }

  /** Data files of snapshot `version`, as paths relative to `data/`. */
  def filesOf(spark: SparkSession, root: String, version: Long): Seq[String] = {
    val fs = fsOf(spark, root)
    val in = fs.open(manifestPath(root, version))
    try {
      scala.io.Source.fromInputStream(in, "UTF-8")
        .getLines().map(_.trim).filter(_.nonEmpty).toList
    } finally in.close()
  }

  /** Live data files of the latest snapshot, as paths relative to `data/`
    * (e.g. `p_date=2024-01-01/part-00000-<uuid>.parquet`).
    */
  def liveFiles(spark: SparkSession, root: String): Seq[String] =
    currentVersion(spark, root) match {
      case None    => Seq.empty
      case Some(v) => filesOf(spark, root, v)
    }

  /** Read the latest snapshot. Explicit file list + basePath keeps partition
    * inference (`p_date=...` dirs) while never listing directories.
    */
  def read(spark: SparkSession, root: String): DataFrame = {
    val files = liveFiles(spark, root)
    require(files.nonEmpty, s"no committed snapshot at $root")
    spark.read.option("basePath", dataDir(root))
      .parquet(files.map(f => s"${dataDir(root)}/$f"): _*)
  }

  /** Step 1 of a commit: move every parquet file under `stagedDir`
    * (a normal partitioned Spark write) into `data/`, preserving the
    * partition-relative layout. Returns the relative paths moved. Crash-safe:
    * moved files are not in any manifest yet, so readers cannot see them.
    */
  def publishFiles(spark: SparkSession, root: String, stagedDir: String): Seq[String] = {
    val fs = fsOf(spark, root)
    val staged = fs.makeQualified(new Path(stagedDir))
    val moved = ListBuffer.empty[String]
    if (fs.exists(staged)) {
      val it = fs.listFiles(staged, true)
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) {
          val rel = staged.toUri.relativize(f.getPath.toUri).getPath
          val dest = new Path(s"${dataDir(root)}/$rel")
          fs.mkdirs(dest.getParent)
          require(fs.rename(f.getPath, dest), s"publish failed: $rel")
          moved += rel
        }
      }
      fs.delete(staged, true)
    }
    moved.toList
  }

  /** Step 2: atomically commit the next snapshot = previous live files minus
    * those under `replacedPartitions` (directory prefixes like
    * `p_date=2024-01-01`; an empty prefix replaces everything), plus
    * `addedFiles`. Returns the committed version.
    */
  def commitReplace(spark: SparkSession, root: String,
                    replacedPartitions: Seq[String],
                    addedFiles: Seq[String]): Long = {
    val fs = fsOf(spark, root)
    val prev = currentVersion(spark, root)
    val kept = liveFiles(spark, root).filterNot { f =>
      replacedPartitions.exists(p => p.isEmpty || f.startsWith(p + "/"))
    }
    val next = prev.getOrElse(0L) + 1
    val tmp = new Path(s"$root/$ManifestDirName/.tmp-${UUID.randomUUID()}")
    fs.mkdirs(tmp.getParent)
    val out = fs.create(tmp, false)
    try out.write(((kept ++ addedFiles).mkString("\n") + "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // the commit point: one atomic rename. Racing-committer detection relies
    // on rename failing when the destination exists — true on HDFS, NOT on
    // RawLocalFileSystem (POSIX rename replaces) or object stores (S3A rename
    // is non-atomic); the exists() pre-check narrows but cannot close that
    // window. Single writer is the format's stated assumption — on an object
    // store a real deployment needs an external lock/LogStore, as Delta does.
    val target = manifestPath(root, next)
    require(!fs.exists(target), s"commit conflict at version $next of $root")
    require(fs.rename(tmp, target), s"commit conflict at version $next of $root")
    next
  }

  /** Snapshots every vacuum retains: the latest plus this many predecessors'
    * worth of history. 2 keeps the current AND previous snapshot alive, so a
    * reader that pinned version N before a writer committed N+1 (and
    * vacuumed) still finds every file its scan planned — the same reason
    * Delta/Iceberg retain old versions for a window instead of reclaiming
    * eagerly. Raise it (or vacuum less often) when readers can lag by more
    * than one commit.
    */
  val RetainSnapshots = 2

  /** Reclaim data files referenced by NO retained snapshot — crash leftovers
    * from a publish that never committed, or files whose every referencing
    * manifest has aged out of the retention window (see [[RetainSnapshots]]).
    * Manifests older than the window are expired (deleted) first, which is
    * what makes their exclusively-owned files unreferenced. Writer-side
    * housekeeping — run between ticks, not concurrently with a publish.
    * Returns data files deleted.
    */
  def vacuum(spark: SparkSession, root: String,
             retainLast: Int = RetainSnapshots): Long = {
    require(retainLast >= 1, "must retain at least the current snapshot")
    val fs = fsOf(spark, root)
    val data = fs.makeQualified(new Path(dataDir(root)))
    if (!fs.exists(data)) return 0L
    val all = versions(spark, root)
    val (expired, retained) = all.splitAt((all.size - retainLast).max(0))
    expired.foreach(v => fs.delete(manifestPath(root, v), false))
    val referenced = retained.flatMap(v => filesOf(spark, root, v)).toSet
    var removed = 0L
    val it = fs.listFiles(data, true)
    val doomed = ListBuffer.empty[Path]
    while (it.hasNext) {
      val f = it.next()
      val rel = data.toUri.relativize(f.getPath.toUri).getPath
      if (f.getPath.getName.endsWith(".parquet") && !referenced.contains(rel))
        doomed += f.getPath
    }
    doomed.foreach { p => if (fs.delete(p, false)) removed += 1 }
    // staged-but-never-published leftovers from a crashed writer
    val staging = new Path(s"$root/_staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    removed
  }
}
