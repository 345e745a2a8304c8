package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Queries materialize through
  * the noop sink — `.count()` would let Catalyst prune unused aggregate
  * expressions and under-measure.
  *
  * Each query is timed over SPARK_GRAFT_BENCH_ITERS iterations (default 3)
  * and reports the MEDIAN: single-shot timings on a shared 32-thread JVM
  * swing several-fold on GC/compilation/scheduling luck (observed 2s vs 14s
  * for the same map-side query), which made the regression tripwire fire on
  * noise. The median of 3 is stable to one outlier in either direction.
  *
  * `spark.catalog.clearCache()` runs between iterations and between
  * queries: the dedup pipeline persists intermediate frames, and without
  * the clear (a) iteration 1 populates the cache and iterations 2-3 are
  * served from it — the median would measure warm-cache reads and the
  * regression tripwire could not see cold-path regressions in cached
  * subtrees — and (b) cached blocks accumulate across the multi-query run,
  * taxing every later query with eviction churn.
  *
  * Optional args narrow the run to the named queries (fast iteration).
  *
  * Run-integrity guard: the round-5 driver bench executed during a
  * sustained HOST-level load burst (container idle, load-average ~14) and
  * published three phantom regression flags; the in-run isolated retry
  * retries during the same burst, so it cannot clear one. A fixed
  * DATA-INDEPENDENT calibration workload (hash+sum over a 200M range —
  * pure CPU, no I/O, no state) is therefore timed at run START and END
  * against the quiet floor recorded as `"calibration"` in
  * `scripts/bench_baseline.json`; if the START sample exceeds 1.8x its
  * phase floor (or the END sample 1.5x its own — the two phases differ
  * structurally, see the floor-parsing comment) the whole run is stamped
  * `"tainted": true`, its regression flags are
  * suppressed (a contended run can neither publish flags nor pass for a
  * clean baseline), and the calibration samples are emitted for the
  * record. Before the timed run starts, an over-threshold START probe
  * additionally triggers a bounded quiet-window WAIT (60 s sleeps, up to
  * SPARK_GRAFT_BENCH_QUIET_TRIES, default 10): a run that starts tainted
  * can only produce a tainted artifact, so waiting out a short burst is
  * strictly better than burning the window (round 11's official record
  * was lost exactly this way).
  *
  * Regression tripwire: if `scripts/bench_baseline.json` exists, the
  * per-query MIN across iterations is compared against the baseline's
  * recorded min and >2x slowdowns are reported on stderr (and in the JSON
  * as `regressions`); set SPARK_GRAFT_BENCH_STRICT=1 to exit non-zero on
  * any. Min, not median, is the flagged statistic because the bench box is
  * shared: an external CPU spike during the run slows SOME iterations
  * (observed 2s -> 31s on untouched queries under load-average 15), while
  * a genuine plan regression slows ALL of them — including the best. A
  * first-pass flag additionally earns the query one isolated retry round
  * at the end of the run; only flags that survive isolation are reported.
  * The retry itself is gated on a GENUINELY quiet probe (1.15x of the
  * end-phase floor, re-checked before every retried query, from a shared
  * 2x wait budget), and the phase ends with a DATA-PATH window check —
  * the three fastest unflagged baseline queries re-timed against their
  * same-environment mins, since the CPU probe cannot see disk/memory
  * contention. A surviving flag whose retry never saw a quiet CPU probe,
  * or whose retry phase measured the reference queries uniformly over
  * 1.3x their floors, is emitted under `"unconfirmed"` rather than
  * `"regressions"` — round 12's three phantom flags were exactly flags
  * retried inside a ~1.4x drift window that the old 1.5x gate waved
  * through, and round 13's first runs reproduced the same shape with a
  * quiet CPU probe and a degraded data path. `unconfirmed` is NOT an
  * indefinite escape hatch: full-suite untainted runs record which queries
  * flagged in `scripts/bench_flags.json`, and a flag unconfirmed in this
  * run that also flagged in the immediately-preceding recorded run
  * ESCALATES to a certified regression (see [[escalateFlags]]); under
  * SPARK_GRAFT_BENCH_STRICT=1 even a first-time unconfirmed flag exits
  * non-zero (code 4).
  * The reported per-query numbers stay MEDIANS (the honest typical cost);
  * `mins` is emitted alongside for the tripwire. Re-record the baseline by
  * running this main and copying the JSON line into
  * `scripts/bench_baseline.json` (optionally folding `mins` to the
  * elementwise minimum over several runs — a tighter quiet-machine floor).
  * The baseline is ENVIRONMENT-scoped: each round runs in a fresh VM whose
  * CPU/memory/disk balance varies (round 8: CPU probe 30% FASTER than the
  * recorded floor while every shuffle-bound query read uniformly ~1.4x
  * slower — hardware drift, not contention or plan changes), so when a new
  * environment makes the old mins systematically unreachable, re-record
  * from quiet same-environment runs rather than letting every future run
  * flag phantom regressions.
  */
object Bench {
  /** Bounded quiet-window wait shared by the start gate and the retry
    * phase: probes until the reading is at or under `ratio`x `floor` or the
    * wait budget runs out. `waits` is a MUTABLE budget holder (a 1-element
    * array) so several call sites — one per retried query — draw from ONE
    * shared pool rather than each getting a fresh allowance (a sustained
    * burst must exhaust the phase, not be re-granted per query). Returns
    * the last probe value and whether the quiet bar was met. Factored out
    * (and parameterized on the probe/sleep) so the gating logic itself is
    * unit-testable without a SparkSession: `BenchQuietSpec` injects a
    * synthetic burst and asserts the wait outlasts it.
    */
  private[graft] def awaitQuiet(
      probe: () => Double, floor: Double, ratio: Double,
      waits: Array[Int], sleepMs: Long, phase: String): (Double, Boolean) = {
    var cal = probe()
    while (cal > ratio * floor && waits(0) > 0) {
      waits(0) -= 1
      System.err.println(
        f"[bench] $phase calibration $cal%.3fs exceeds $ratio%.2fx floor " +
          f"$floor%.3fs — waiting ${sleepMs / 1000}s (${waits(0)} waits left)")
      if (sleepMs > 0) Thread.sleep(sleepMs)
      cal = probe()
    }
    (cal, cal <= ratio * floor)
  }

  /** The cross-run flag-escalation rule (pure; unit-tested): given the
    * ledger of consecutive flagged runs, an `unconfirmed` flag whose query
    * already flagged in the immediately-preceding run escalates to
    * certified — two consecutive appearances are no longer window luck.
    * Returns (escalated, still-unconfirmed, next ledger). The next ledger
    * keeps ONLY queries flagged this run (anything that cleared resets to
    * zero by omission).
    */
  private[graft] def escalateFlags(prevStreak: Map[String, Int],
                                   confirmed: Seq[String],
                                   unconfirmed: Seq[String])
      : (Seq[String], Seq[String], Map[String, Int]) = {
    val escalated = unconfirmed.filter(n => prevStreak.getOrElse(n, 0) >= 1)
    val next = (confirmed ++ unconfirmed)
      .map(n => n -> (prevStreak.getOrElse(n, 0) + 1)).toMap
    (escalated, unconfirmed.filterNot(escalated.contains), next)
  }

  /** Median of reading/floor over the reference samples — the retry
    * phase's DATA-PATH window assessment (pure; unit-tested).
    */
  private[graft] def refWindowRatio(samples: Seq[(Double, Double)]): Option[Double] = {
    val rs = samples.collect { case (t, fl) if t > 0 && fl > 0 => t / fl }
    if (rs.isEmpty) None else Some(rs.sorted.apply(rs.size / 2))
  }

  /** Fixed CPU-bound probe (~1 s quiet on 32 threads): inflates with
    * host contention, independent of the data and of any query change.
    */
  private def calibrate(spark: SparkSession): Double = {
    val t0 = System.nanoTime()
    // bit_count bounds the sum at 64 * 2e8 — no ANSI long overflow
    spark.range(0, 200000000L, 1, 32)
      .selectExpr("bit_count(xxhash64(id)) AS h").selectExpr("sum(h)")
      .write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only: Option[Set[String]] = if (args.nonEmpty) Some(args.toSet) else None
    val queries = SparkEntry.queries.filter(kv => only.forall(_.contains(kv._1)))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm every query once at the smallest SF sibling of the bench dir:
    // first executions pay janino codegen compilation + JIT warm-up
    // (measured 10-40x on the expression-heavy kernels), which would
    // otherwise be charged to whichever query runs first.
    val warmDir = {
      val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sibling.isDirectory && sibling.getPath != new java.io.File(sfDir).getPath)
        sibling.getPath
      else sfDir
    }
    queries.foreach { case (name, fn) =>
      try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
      catch {
        // fatal errors (OOM etc.) must propagate; a query broken at warm-up
        // must be loud, not silently deferred to the timed run
        case NonFatal(e) =>
          System.err.println(s"[bench] warm-up $name failed: ${e.getMessage}")
      }
    }
    // warm-up persists must not leak into the timed run (see scaladoc)
    spark.catalog.clearCache()
    // The baseline's quiet reference may be a scalar ("calibration": 0.232,
    // hand-recorded — used for both phases) or the two-sample array this
    // main itself emits ("calibration":[0.158,0.382]). The phases are NOT
    // interchangeable: the END probe runs after ~100 queries of heap/JIT
    // wear and reads ~2.5x the fresh-JVM START probe on a provably idle
    // host (observed across three rounds: start 0.06-0.16 s, end
    // 0.28-0.46 s), so each sample compares against its own phase's quiet
    // reference — START vs min(samples), END vs max(samples). A scalar
    // baseline keeps the old single-floor behavior.
    val calFloors: Option[(Double, Double)] = {
      val f = new java.io.File("scripts/bench_baseline.json")
      if (!f.isFile) None
      else {
        val txt = scala.io.Source.fromFile(f).mkString
        // a scalar floor is a fresh-JVM start-phase measurement (the only
        // kind a hand-recorder takes); scaling its END floor by 2/1.5 makes
        // the END check exactly the legacy 2x-of-scalar bar — without it,
        // the structural END elevation would taint every run under an old
        // baseline file
        val scalar = "\"calibration\"\\s*:\\s*([0-9.Ee+-]+)".r
          .findFirstMatchIn(txt)
          .map(m => (m.group(1).toDouble, m.group(1).toDouble * 2.0 / 1.5))
        val array = "\"calibration\"\\s*:\\s*\\[([0-9.Ee+,\\s-]+)\\]".r
          .findFirstMatchIn(txt)
          .map { m =>
            val xs = m.group(1).split(",").map(_.trim.toDouble)
            // positional, not (min, max): the array is [start, end] and the
            // phases must stay paired — a quiet re-record where warmed JIT
            // closes the structural gap (end <= start) would otherwise swap
            // the floors and loosen the END contention bar exactly where
            // contention shows first
            (xs.head, xs.last)
          }
        val floors = scalar.orElse(array)
        if (floors.isEmpty)
          System.err.println(
            "[bench] WARNING: scripts/bench_baseline.json has no parseable " +
              "\"calibration\" floor — the host-contention taint guard is DISARMED " +
              "for this run; re-record the baseline with a calibration entry")
        floors
      }
    }
    // first calibration sample ALSO warms the probe's codegen, so sample it
    // twice and keep the second — the first execution pays one-off janino
    // compilation that would otherwise read as contention
    calibrate(spark)
    var cal0 = calibrate(spark)
    // Quiet-window gate: a run that STARTS over the taint threshold can
    // only ever produce a tainted artifact (round 11 burned its one
    // official window that way), so rather than spending ~25 minutes on a
    // record nobody can use, wait out the contention — bounded — and
    // re-probe. The probe is pure CPU, so an elevated reading is the host,
    // not this JVM; waiting costs nothing but wall-clock and converts a
    // guaranteed-tainted run into a certifiable one whenever the burst is
    // shorter than the budget. SPARK_GRAFT_BENCH_QUIET_TRIES=0 disables.
    val quietTries =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_QUIET_TRIES", "10").toInt
    calFloors.foreach { case (startFl, _) =>
      cal0 = awaitQuiet(() => calibrate(spark), startFl, 1.8,
        Array(quietTries), 60000L, "start")._1
    }
    // a failed query must not masquerade as a fast one: report -1 and log
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    val results = queries.toSeq.map { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9 }
        catch {
          case NonFatal(e) =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            -1.0
        }
        finally {
          spark.catalog.clearCache()
          // ContextCleaner can only reclaim shuffle files / broadcasts once
          // their JVM objects are collected; with a large heap the natural
          // full GC may not come for many queries, and the accumulated
          // shuffle state measurably degrades later iterations (observed
          // 4s -> 13s monotonic escalation on the heaviest dedup queries).
          System.gc()
        }
      }
      if (iters > 1)
        System.err.println(f"[bench] $name iters: ${times.map(t => f"$t%.2f").mkString(", ")}")
      val (median, tmin) =
        if (times.contains(-1.0)) (-1.0, -1.0)
        else (times.sorted.apply(times.size / 2), times.min)
      (name, median, tmin)
    }
    // regression tripwire vs the recorded per-query baseline MINS (same SF
    // only; falls back to the flat medians of a pre-`mins` baseline file)
    val baseMins: Map[String, Double] = {
      val f = new java.io.File("scripts/bench_baseline.json")
      if (!f.isFile) Map.empty
      else {
        val txt = scala.io.Source.fromFile(f).mkString
        val sfOk = "\"sf\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(txt)
          .forall(_.group(1) == sfDir)
        if (!sfOk) Map.empty
        else {
          val entry = "\"(q_[A-Za-z0-9_]+)\"\\s*:\\s*([0-9.Ee+-]+)".r
          val section = "\"mins\"\\s*:\\s*\\{([^}]*)\\}".r
            .findFirstMatchIn(txt).map(_.group(1)).getOrElse(txt)
          entry.findAllMatchIn(section)
            .map(m => m.group(1) -> m.group(2).toDouble).toMap
        }
      }
    }
    // Two clauses: the 2x ratio (with a 1 s absolute floor so trivial
    // queries don't flag on millisecond jitter), OR an absolute +5 s move
    // regardless of ratio — a heavy query drifting 15 s -> 24 s (1.6x) is
    // the regression that actually matters at the suite's tail and sailed
    // through the ratio-only rule in round 8.
    def flaggedIn(mins: Map[String, Double]): Seq[String] =
      results.collect {
        case (name, _, _) if mins.get(name).exists(t => t > 0
          && baseMins.get(name).exists(b => b > 0
            && ((t > 2 * b && t - b > 1.0) || t - b > 5.0))) => name
      }
    val mins0 = results.map { case (n, _, m) => n -> m }.toMap
    // A first-pass flag can be a transient load spike on this shared box
    // that happened to cover all iterations of one query (observed: 3x on
    // untouched queries under load-average 15, vanishing in isolation).
    // Flagged queries therefore get one ISOLATED retry round at the end of
    // the run — round 3's manual re-run procedure, automated. A genuine
    // plan regression is slow in isolation too and still flags.
    val (retriedMins: Map[String, Double], noisyRetries: Set[String]) =
      flaggedIn(mins0) match {
        case Seq() => (Map.empty[String, Double], Set.empty[String])
        case flagged =>
          // The retry exists to separate host bursts from plan regressions,
          // so it must not re-time INSIDE the burst that caused the flag
          // (observed: a mid-run burst put one heavy query's median at 2.2x
          // its own min, and the immediate retry still read 1.3x — flagged
          // as a regression in an otherwise-untainted run). Round 12 showed
          // the old single 1.5x-of-end-floor gate is not enough: a window
          // elevated to ~1.4x passes straight through and the retry can't
          // clear drift flags. The retry phase therefore (a) demands a
          // GENUINELY quiet probe — 1.15x of the end-phase floor, well
          // under the drift band — (b) re-probes before EVERY retried
          // query, since a window can degrade mid-phase, and (c) draws all
          // waits from one shared 2x-sized budget so a sustained burst
          // exhausts the phase rather than being re-granted per query. A
          // flag whose retry never saw a quiet probe is routed to
          // `unconfirmed` (visible in the JSON, NOT certified): certifying
          // it would repeat round 12's phantom-flag failure, and a genuine
          // plan regression re-flags in the next quiet window anyway.
          val budget = Array(quietTries * 2)
          val noisy = scala.collection.mutable.Set[String]()
          val retried = flagged.flatMap { name =>
            val quiet = calFloors.forall { case (_, endFl) =>
              awaitQuiet(() => calibrate(spark), endFl, 1.15, budget,
                60000L, s"retry[$name]")._2
            }
            if (!quiet) noisy += name
            System.err.println(
              s"[bench] retrying flagged $name in isolation" +
                (if (quiet) "" else " (window still noisy — unconfirmable)"))
            val times = (1 to iters).map { _ =>
              val t0 = System.nanoTime()
              try { queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
                    (System.nanoTime() - t0) / 1e9 }
              catch { case NonFatal(_) => -1.0 }
              finally spark.catalog.clearCache()
            }.filter(_ >= 0)
            times.minOption.map(m => name -> math.min(m, mins0(name)))
          }.toMap
          // DATA-PATH window assessment: the CPU probe is blind to disk/
          // memory-bandwidth contention (observed: a mid-run degraded
          // window read cpu-quiet while every sub-second query sat at
          // 1.6-2.2x its same-environment floor, and two heavy flags
          // survived a "quiet" retry). Time the three fastest UNFLAGGED
          // baseline queries once each: in a genuinely quiet window they
          // read ~1.0-1.2x their mins; uniform elevation beyond 1.3x means
          // the WINDOW is degraded, so surviving flags route to
          // `unconfirmed` rather than certifying — the uniform-vs-
          // concentrated test a human runs on the artifact, automated at
          // retry time. Trade, documented: a regression in a truly GLOBAL
          // path (one that slows the references too) defers to the totals
          // and the next quiet window rather than certifying here.
          val refSamples = baseMins.toSeq
            .filter { case (n, fl) =>
              fl > 0.2 && !flagged.contains(n) && queries.contains(n) }
            .sortBy(_._2).take(3)
            .map { case (n, fl) =>
              val t0 = System.nanoTime()
              val t = try {
                queries(n)(spark, sfDir).write.format("noop")
                  .mode("overwrite").save()
                (System.nanoTime() - t0) / 1e9
              }
              catch { case NonFatal(_) => -1.0 }
              finally spark.catalog.clearCache()
              (t, fl)
            }
          refWindowRatio(refSamples).foreach { r =>
            if (r > 1.3) {
              System.err.println(
                f"[bench] retry-phase reference queries read $r%.2fx their " +
                  "baseline mins — data-path window degraded; surviving " +
                  "flags are reported unconfirmed")
              noisy ++= flagged
            } else System.err.println(
              f"[bench] retry-phase reference window ratio $r%.2fx (quiet)")
          }
          (retried, noisy.toSet)
      }
    val finalMins = mins0 ++ retriedMins
    val cal1 = calibrate(spark)
    // 1.8x (not 2x) start margin: a visibly contended round-7 run (uniform
    // ~1.5x slowdown across untouched queries) missed the old 2x threshold
    // by 8 ms and published as clean. The END sample gets a tighter 1.5x
    // bar against its own phase floor — contention that builds DURING the
    // run shows there first.
    val tainted = calFloors.exists { case (startFl, endFl) =>
      cal0 > 1.8 * startFl || cal1 > 1.5 * endFl
    }
    if (tainted)
      System.err.println(
        f"[bench] TAINTED run: calibration $cal0%.2fs/$cal1%.2fs vs quiet floors " +
          f"${calFloors.get._1}%.2fs/${calFloors.get._2}%.2fs — host contention " +
          "detected, regression flags suppressed")
    // A surviving flag is only CERTIFIED as a regression when its isolated
    // retry ran against a quiet probe; otherwise it is reported as
    // unconfirmed — loud enough to investigate, not strong enough to stamp.
    val (confirmedFlags, rawUnconfirmed) =
      if (tainted) (Seq.empty[String], Seq.empty[String])
      else flaggedIn(finalMins).partition(n => !noisyRetries.contains(n))
    // Cross-run escalation ledger: `unconfirmed` must not be a channel a
    // real regression can ride indefinitely by always landing in noisy
    // retry windows (round 13's q_corpus_funnel_incremental shape). Each
    // FULL-suite untainted run records which queries flagged
    // (scripts/bench_flags.json: name -> consecutive flagged runs); a flag
    // unconfirmed in THIS run whose ledger already shows a consecutive
    // prior flag escalates to a certified regression — two runs in a row
    // is no longer window luck, whatever the windows read. Narrowed runs
    // (explicit query args) neither read nor write the ledger: local
    // single-query iteration must not pre-charge the official record.
    val flagLedger = new java.io.File("scripts/bench_flags.json")
    val fullRun = only.isEmpty
    val prevStreak: Map[String, Int] =
      if (!fullRun || !flagLedger.isFile) Map.empty
      else "\"(q_[A-Za-z0-9_]+)\"\\s*:\\s*(\\d+)".r
        .findAllMatchIn(scala.io.Source.fromFile(flagLedger).mkString)
        .map(m => m.group(1) -> m.group(2).toInt).toMap
    val (escalated, unconfirmedFlags, streaks) =
      escalateFlags(prevStreak, confirmedFlags, rawUnconfirmed)
    if (fullRun && !tainted) {
      // tainted runs observed nothing; they must neither extend nor reset
      try {
        val w = new java.io.PrintWriter(flagLedger, "UTF-8")
        try w.println(streaks.toSeq.sortBy(_._1)
          .map { case (n, c) => "\"" + n + "\":" + c }
          .mkString("{", ",", "}"))
        finally w.close()
      } catch {
        case NonFatal(e) =>
          System.err.println(s"[bench] flag-ledger write failed (non-fatal): ${e.getMessage}")
      }
    }
    def describe(name: String): String =
      f"$name: ${baseMins(name)}%.2fs -> ${finalMins(name)}%.2fs (min-vs-min, retried)"
    val regressions: Seq[String] = confirmedFlags.map(describe) ++
      escalated.map(n => describe(n) +
        s" [escalated: flagged ${prevStreak(n) + 1} consecutive runs]")
    val unconfirmed: Seq[String] = unconfirmedFlags.map(describe)
    regressions.foreach(r => System.err.println(s"[bench] REGRESSION $r"))
    unconfirmed.foreach(r =>
      System.err.println(s"[bench] UNCONFIRMED (noisy retry window) $r"))
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val mins = results.map { case (k, _, _) => "\"" + k + "\":" + finalMins(k) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val regJson = regressions.map(r => "\"" + r.replace("\"", "'") + "\"")
      .mkString("[", ",", "]")
    val unconfJson = unconfirmed.map(r => "\"" + r.replace("\"", "'") + "\"")
      .mkString("[", ",", "]")
    // a -1.0 query must be loud: named in the JSON and fatal to the exit code
    // (round 7 shipped a broken query through a green rc-0 bench)
    val failed = results.collect { case (n, m, _) if m < 0 => n }
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val line = f"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"mins":$mins,"sf":"$sfDir","regressions":$regJson,"unconfirmed":$unconfJson,"failed":$failedJson,"calibration":[$cal0%.3f,$cal1%.3f],"tainted":$tainted}"""
    println(line)
    // Durable sidecar: the driver captures stdout with a bounded tail, which
    // clipped round 6's record mid-value (BENCH_r06.json "parsed": null).
    // The full line is always recoverable from this file.
    try {
      val out = new java.io.File("scripts/bench_last.json")
      val w = new java.io.PrintWriter(out, "UTF-8")
      try w.println(line) finally w.close()
    } catch {
      case NonFatal(e) =>
        System.err.println(s"[bench] sidecar write failed (non-fatal): ${e.getMessage}")
    }
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[bench] FAILED queries: ${failed.mkString(", ")}")
      sys.exit(3)
    }
    if (sys.env.get("SPARK_GRAFT_BENCH_STRICT").contains("1")) {
      if (regressions.nonEmpty) sys.exit(2)
      // strict mode treats even an unconfirmed flag as failure: deferral
      // is for the default reporting path, not for a gate someone armed
      if (unconfirmed.nonEmpty) sys.exit(4)
    }
  }
}
