package graft

import graft.operators.ManifestTable

/** Per-commit `#meta:` lines ([[ManifestTable.commitMeta]]) — the atomic
  * channel for version-paired state (IvfStore's model↔postings ref, the
  * corpus store's governing layout). The properties that make it safe:
  * meta rides the SAME conditional manifest install as the snapshot (so a
  * racing loser can never clobber a winner's pairing, unlike a separately
  * written sidecar), and it describes ONE commit — never carried forward.
  */
class ManifestMetaSpec extends SparkSpec {

  private def tmpRoot(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  test("meta round-trips through a commit and is scoped to its version") {
    val root = tmpRoot("graft_meta1")
    val v1 = ManifestTable.commitReplace(spark, root, Seq.empty,
      Seq("w/a.parquet"), meta = Map("model_version" -> "7", "kind" -> "tick"))
    val v2 = ManifestTable.commitReplace(spark, root, Seq.empty,
      Seq("w/b.parquet"))
    val v3 = ManifestTable.commitReplace(spark, root, Seq.empty,
      Seq("w/c.parquet"), meta = Map("model_version" -> "8"))
    assert(ManifestTable.commitMeta(spark, root, v1) ==
      Map("model_version" -> "7", "kind" -> "tick"))
    // a meta-less commit yields empty — v1's meta must NOT leak forward
    assert(ManifestTable.commitMeta(spark, root, v2).isEmpty,
      "meta lines were carried forward across commits")
    assert(ManifestTable.commitMeta(spark, root, v3) ==
      Map("model_version" -> "8"))
    // meta lines never corrupt the entry listing
    assert(ManifestTable.filesOf(spark, root, v3).toSet ==
      Set("w/a.parquet", "w/b.parquet", "w/c.parquet"))
  }

  test("meta values may contain '=' and ':' (layout JSON); keys are " +
    "validated") {
    val root = tmpRoot("graft_meta2")
    val json = """{"md5Buckets":16,"exprVersion":1}"""
    val v = ManifestTable.commitReplace(spark, root, Seq.empty,
      Seq("w/a.parquet"), meta = Map("layout" -> json))
    assert(ManifestTable.commitMeta(spark, root, v) == Map("layout" -> json))
    intercept[IllegalArgumentException] {
      ManifestTable.commitReplace(spark, root, Seq.empty,
        Seq("w/b.parquet"), meta = Map("bad=key" -> "x"))
    }
    intercept[IllegalArgumentException] {
      ManifestTable.commitReplace(spark, root, Seq.empty,
        Seq("w/b.parquet"), meta = Map("k" -> "line\nbreak"))
    }
    // failed validation committed nothing
    assert(ManifestTable.currentVersion(spark, root).contains(v))
  }

  test("commitRewriteFiles threads expectedVersion: a rewrite planned " +
    "against a moved store conflicts BEFORE committing") {
    val root = tmpRoot("graft_meta3")
    ManifestTable.commitReplace(spark, root, Seq.empty, Seq("w/a.parquet"))
    val planned = ManifestTable.currentVersion(spark, root).get
    // another writer moves the store after the rewrite was planned
    ManifestTable.commitReplace(spark, root, Seq.empty, Seq("w/b.parquet"))
    intercept[graft.operators.CommitConflictException] {
      ManifestTable.commitRewriteFiles(spark, root, Seq("w/a.parquet"),
        Seq.empty, expectedVersion = Some(planned))
    }
    // nothing landed: the store still shows both files at the racer's version
    assert(ManifestTable.currentVersion(spark, root).contains(planned + 1))
    assert(ManifestTable.liveFiles(spark, root).toSet ==
      Set("w/a.parquet", "w/b.parquet"))
  }
}
