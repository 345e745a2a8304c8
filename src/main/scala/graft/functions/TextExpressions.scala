package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native (codegen'd) n-gram multiplicity kernel for the repetition
  * filters: sorts a string array by binary order and run-length walks it in
  * one pass, returning `struct(max_run, singletons)` — the occurrence count
  * of the most frequent value and the number of values occurring exactly
  * once.
  *
  * The declarative form (two `aggregate()` folds with struct accumulators
  * over `array_sort`) is semantically identical but evaluated through
  * interpreted lambda dispatch with a row allocation per element — measured
  * up to MINUTES on its first sf0.1 execution while the JIT warms, ~3 s
  * warm. This expression emits one tight loop; only value equality matters
  * for run-lengths, so binary sort order is safe regardless of collation.
  *
  * A null element nulls the result (same as NULL propagation through the
  * fold's comparison chain). Registered as SQL function `graft_run_stats`
  * via [[TextExpressions.register]].
  */
case class RunLengthStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_run_stats requires array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("max_run", LongType, nullable = false),
    StructField("singletons", LongType, nullable = false)))

  private def elemsNullable: Boolean = child.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullable: Boolean = child.nullable || elemsNullable

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      buf(i) = arr.getUTF8String(i)
      i += 1
    }
    java.util.Arrays.sort(buf.asInstanceOf[Array[AnyRef]])
    var run = 0L; var maxRun = 0L; var singletons = 0L
    i = 0
    while (i < n) {
      if (i == 0 || !buf(i).equals(buf(i - 1))) {
        if (run == 1L) singletons += 1L
        run = 1L
      } else run += 1L
      if (run > maxRun) maxRun = run
      i += 1
    }
    if (run == 1L) singletons += 1L
    new GenericInternalRow(Array[Any](maxRun, singletons))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val buf = ctx.freshName("buf")
      val run = ctx.freshName("run")
      val maxRun = ctx.freshName("maxRun")
      val singles = ctx.freshName("singles")
      val utf8 = classOf[UTF8String].getName
      // element-null check only emitted when the schema allows null elements
      // (ev.isNull is only assignable then — same contract as graft_dot)
      val nullCheck =
        if (elemsNullable) s"if ($arr.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      val guardOpen = if (elemsNullable) s"if (!${ev.isNull}) {" else ""
      val guardClose = if (elemsNullable) "}" else ""
      s"""
         |int $n = $arr.numElements();
         |$utf8[] $buf = new $utf8[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $buf[$i] = $arr.getUTF8String($i);
         |}
         |$guardOpen
         |java.util.Arrays.sort($buf);
         |long $run = 0L; long $maxRun = 0L; long $singles = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($i == 0 || !$buf[$i].equals($buf[$i - 1])) {
         |    if ($run == 1L) $singles++;
         |    $run = 1L;
         |  } else {
         |    $run++;
         |  }
         |  if ($run > $maxRun) $maxRun = $run;
         |}
         |if ($run == 1L) $singles++;
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] { java.lang.Long.valueOf($maxRun), java.lang.Long.valueOf($singles) });
         |$guardClose
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_run_stats"
}

/** Native MinHash kernel: ONE pass over the shingle array computing all
  * `numHashes` seeded-md5 minima, replacing `numHashes` interpreted
  * `transform(...) → array_min(...)` chains (each re-traversing the array
  * through lambda dispatch — measured 109 s COLD for the 16-sig family at
  * sf0.1 while the interpreter/JIT warms, vs ~2 s warm). The per-shingle
  * md5 work is inherent; this removes the 16 redundant traversals and the
  * interpreted dispatch entirely: codegen emits one call to the
  * scalac-compiled [[MinHashKernel.compute]], which the JVM JITs like any
  * hot method — no janino-compiled inner loop, no cold cliff.
  *
  * EXACT semantics of the declarative form it replaces, byte for byte:
  * sig_j = min over non-null shingles s of md5hex(j + ":" + s), null when
  * the array is empty or all-null (array_min ignores null elements);
  * lexicographic hex min == unsigned-byte digest min (fixed width).
  */
case class MinHashSignatures(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if numHashes > 0 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash requires array<string> and numHashes > 0, got ${t.simpleString}")
  }

  // element j is null for a shingle-less document — same as array_min(empty)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.MinHashKernel.compute($arr, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

object MinHashKernel {
  private val Hex = "0123456789abcdef".toCharArray

  // seed prefixes "j:" as UTF-8, cached for the plausible seed range
  private val Prefixes: Array[Array[Byte]] =
    (0 until 64).map(j => s"$j:".getBytes("UTF-8")).toArray

  private def hex(d: Array[Byte]): UTF8String = {
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf).toByte
      out(2 * i + 1) = Hex(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** Unsigned lexicographic compare of two 16-byte digests. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff; val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val mins = new Array[Array[Byte]](numHashes)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // null elements ignored, like array_min
        val s = arr.getUTF8String(i).getBytes
        var j = 0
        while (j < numHashes) {
          md.reset()
          md.update(if (j < Prefixes.length) Prefixes(j)
                    else s"$j:".getBytes("UTF-8"))
          md.update(s)
          val d = md.digest()
          if (mins(j) == null || less(d, mins(j))) mins(j) = d
          j += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](numHashes)
    var j = 0
    while (j < numHashes) {
      if (mins(j) != null) out(j) = hex(mins(j))
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object TextExpressions {
  val runStatsInfo = new ExpressionInfo(classOf[RunLengthStats].getName, "graft_run_stats")
  val minhashInfo = new ExpressionInfo(classOf[MinHashSignatures].getName, "graft_minhash")

  /** Register `graft_run_stats` + `graft_minhash` on an existing session
    * (idempotent). `graft_minhash(shingles[, numHashes])` — the optional
    * second argument must be an integer literal (it sizes the signature
    * array at plan time); default 16.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_run_stats"), runStatsInfo,
      { exprs: Seq[Expression] => RunLengthStats(exprs.head) })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_minhash"), minhashInfo,
      { exprs: Seq[Expression] =>
        val n = exprs.lift(1).map {
          case e if e.foldable => e.eval() match {
            case n: Number => n.intValue()
            case other => throw new IllegalArgumentException(
              s"graft_minhash: numHashes must be an integer literal, got $other")
          }
          case e => throw new IllegalArgumentException(
            s"graft_minhash: numHashes must be a literal (plan-time constant), got ${e.sql}")
        }.getOrElse(16)
        MinHashSignatures(exprs.head, n) })
  }

  /** Register Spark's internal Bloom kernels (`BloomFilterAggregate`,
    * `BloomFilterMightContain` — the runtime row-level-filtering pair,
    * codegen'd) as `graft_bloom_agg(hash, items, bits)` /
    * `graft_might_contain(bf, hash)`: the builtin registry does not expose
    * them, and re-implementing a distributed Bloom build would duplicate a
    * battle-tested kernel for no semantic gain.
    */
  def registerBloom(spark: SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      { exprs: Seq[Expression] =>
        new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)) })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      { exprs: Seq[Expression] => BloomFilterMightContain(exprs(0), exprs(1)) })
  }
}
