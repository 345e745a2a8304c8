package graft

import org.apache.spark.sql.functions.col

import graft.operators.{CorpusStore, ManifestTable}

/** Violated single-writer assumptions must be LOUD or harmless, never a
  * silent loss. The store's contract is one writer per store for
  * housekeeping, but the pieces a racing writer can actually collide on
  * are individually guarded: commits are conditional (the loser throws and
  * retries), per-tick vacuums are listing-free and never touch another
  * writer's staging or unreferenced published files, the publish step
  * requires its staged files to still exist, and a raced-away layout
  * sidecar walks back to the previous version's identical layout. This
  * spec drives real concurrent ticks through all of it and asserts the
  * only thing that matters: nothing committed is ever lost, and every
  * failure surfaced as an exception, not as silence.
  */
class CorpusStoreConcurrencySpec extends SparkSpec {

  private def slice(tag: Int) = {
    import spark.implicits._
    (0 until 12).map { i =>
      (tag * 1000L + i,
        s"concurrency slice $tag doc $i " +
          (0 until 25).map(j => s"u${tag}_${i}_$j").mkString(" "),
        "en", "conc", 300L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("concurrent ticks to one store serialize or fail loudly — every " +
    "slice's keepers are committed, none lost, replay state intact") {
    val root = java.nio.file.Files.createTempDirectory("graft_conc").toString
    try {
      // serial creation tick fixes the layout and store namespaces
      val r0 = CorpusStore.tick(slice(0), root, tickId = Some("c0"),
        minQuality = 0.0, threshold = 0.999)
      assert(r0.nKept == 12L)
      val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val threads = (1 to 2).map { t =>
        new Thread(() => {
          try {
            val tags = if (t == 1) Seq(1, 2) else Seq(3, 4)
            tags.foreach { tag =>
              var done = false
              var attempts = 0
              while (!done) {
                attempts += 1
                require(attempts <= 10, s"tick for slice $tag livelocked")
                try {
                  val r = CorpusStore.tick(slice(tag), root,
                    tickId = Some(s"c$tag"), minQuality = 0.0,
                    threshold = 0.999)
                  // a retry can land as a marker skip (previous attempt
                  // committed + marked before failing later) or as a
                  // semantic replay (committed but unmarked) — both are
                  // the documented at-least-once outcomes; actual loss is
                  // caught by the final store assertions
                  assert(r.replaySkipped || r.nKept == 12L
                    || r.nExactNew == 0L, s"slice $tag: unexpected $r")
                  done = true
                } catch {
                  // a lost commit race (or a torn sidecar read) is the
                  // loud contract — the at-least-once caller retries
                  case _: IllegalStateException => ()
                  case _: IllegalArgumentException => ()
                }
              }
            }
          } catch { case e: Throwable => errors.add(e) }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(300000))
      assert(errors.isEmpty, s"tick thread died: ${errors.peek()}")
      // nothing lost: all five slices' docs are in the committed store
      val ids = CorpusStore.docs(spark, root)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      val expected = (for (tag <- 0 to 4; i <- 0 until 12)
        yield tag * 1000L + i).toSet
      assert(ids == expected,
        s"concurrent ticks lost ${(expected -- ids).size} docs " +
          s"(and/or invented ${(ids -- expected).size})")
      assert(CorpusStore.committedTicks(spark, root).toSet ==
        Set("c0", "c1", "c2", "c3", "c4"), "a tick lost its marker")
      // dedup state intact through the contention: replaying a slice
      // against the final store commits nothing
      val v = ManifestTable.currentVersion(spark, root)
      val rep = CorpusStore.tick(slice(2), root,
        minQuality = 0.0, threshold = 0.999)
      assert(rep.nKept == 0L &&
        ManifestTable.currentVersion(spark, root) == v,
        s"replay after concurrent ticks was not a no-op: $rep")
    } finally spark.catalog.clearCache()
  }
}
