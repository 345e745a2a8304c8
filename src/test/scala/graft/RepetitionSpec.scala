package graft

import graft.operators.TextOps

/** Repetition stats (sorted-fold kernels) and vocabulary top-k semantics on
  * hand-built documents with known n-gram multiplicities.
  */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def stats(texts: (Long, String)*): Map[Long, (Long, Long, Long, Long)] =
    TextOps.repetitionStats(texts.toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (id, nb, top, nt, dup) => id -> ((nb, top, nt, dup)) }
      .toMap

  test("repetition stats on known n-gram multiplicities") {
    val m = stats(
      // bigrams: "a b","b a","a b","b a" -> top=2, n=4
      // trigrams: "a b a","b a b","a b a" -> n=3, duplicated occurrences=2
      (1L, "a b a b a"),
      // all distinct: top bigram 1, no duplicated trigram
      (2L, "w x y z"),
      // fully repeated: every bigram identical
      (3L, "q q q q"))
    assert(m(1L) === ((4L, 2L, 3L, 2L)))
    assert(m(2L) === ((3L, 1L, 2L, 0L)))
    assert(m(3L) === ((3L, 3L, 2L, 2L)))
  }

  test("documents shorter than the n-gram width report zeros, not nulls") {
    val m = stats((1L, "solo"), (2L, "two tokens"))
    assert(m(1L) === ((0L, 0L, 0L, 0L)))
    // one bigram, zero trigrams
    assert(m(2L) === ((1L, 1L, 0L, 0L)))
  }

  test("RunLengthStats interpreted eval matches codegen semantics") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    import org.apache.spark.sql.catalyst.InternalRow
    def run(vals: String*): (Long, Long) = {
      val arr = new GenericArrayData(vals.map(UTF8String.fromString).toArray[Any])
      val out = graft.functions.RunLengthStats(
        Literal(arr, ArrayType(StringType)))
        .eval(InternalRow.empty).asInstanceOf[InternalRow]
      (out.getLong(0), out.getLong(1))
    }
    assert(run() === ((0L, 0L)))
    assert(run("a") === ((1L, 1L)))
    assert(run("a", "b", "a") === ((2L, 1L)))
    assert(run("c", "c", "c") === ((3L, 0L)))
    // null element nulls the result
    val withNull = new GenericArrayData(
      Array[Any](UTF8String.fromString("a"), null))
    assert(graft.functions.RunLengthStats(
      org.apache.spark.sql.catalyst.expressions.Literal(
        withNull, ArrayType(StringType)))
      .eval(InternalRow.empty) === null)
  }

  test("vocabulary top-k ranks by count then token, per language") {
    val docs = Seq(
      (1L, "b b b a a c", "en"),
      (2L, "a a c", "en"),
      // 'z' and 'y' tie at 2 in de -> 'y' ranks first lexicographically
      (3L, "z z y y x", "de")
    ).toDF("doc_id", "text", "lang")
    val got = TextOps.vocabularyTopK(docs, k = 2)
      .as[(String, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("en", "a", 4L, 1L), ("en", "b", 3L, 2L),
      ("de", "y", 2L, 1L), ("de", "z", 2L, 2L)))
  }
}
