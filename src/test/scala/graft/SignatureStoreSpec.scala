package graft

import org.apache.spark.sql.DataFrame

import graft.operators.{Dedup, ManifestTable, SignatureStore}

class SignatureStoreSpec extends SparkSpec {

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("staged consumers are byte-identical to the self-contained queries") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files.createTempDirectory("graft_sigstore").toString
    try {
      val v1 = SignatureStore.build(docs, root)
      assert(v1 == 1L)
      val staged = SignatureStore.read(spark, root)
      assert(staged.columns.toSeq ==
        "doc_id" +: "shingles" +: (0 until Dedup.NumHashes).map(j => s"sig_$j"))

      assert(sameRows(SignatureStore.minhashLshPairs(staged),
        Dedup.minhashLshPairs(docs)), "minhash pairs diverged")
      assert(sameRows(SignatureStore.ngramJaccardPairs(staged),
        Dedup.ngramJaccardPairs(docs)), "ngram pairs diverged")
      assert(sameRows(SignatureStore.dedupGroups(staged),
        Dedup.dedupGroups(docs)), "dedup groups diverged")

      // rebuild: new snapshot, previous retained for pinned readers
      val v2 = SignatureStore.build(docs, root)
      assert(v2 == 2L)
      assert(ManifestTable.versions(spark, root) == Seq(1L, 2L))
      assert(sameRows(SignatureStore.read(spark, root), staged))
    } finally spark.catalog.clearCache()
  }
}
