package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Native (codegen'd) vector kernels. The declarative form —
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — is evaluated per element
  * through interpreted lambda dispatch with array allocation; this
  * `BinaryExpression` emits a tight primitive loop instead (~10× on the ANN
  * hot path) while keeping the exact left-to-right IEEE-754 fold order, so
  * results stay bit-identical to the HOF form and the DuckDB oracles.
  *
  * Registered as SQL function `graft_dot` via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions`) or
  * [[VectorExpressions.register]] on an existing session.
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires array<double> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  private def elemsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  /** A null *element* nulls the whole product — same as the declarative
    * `aggregate(zip_with(...))` form and DuckDB list arithmetic, where NULL
    * propagates through * and +. Treating it as 0.0 would be a silent wrong
    * value.
    */
  override def nullable: Boolean =
    left.nullable || right.nullable || elemsNullable(left) || elemsNullable(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val la = a.asInstanceOf[ArrayData]
    val ra = b.asInstanceOf[ArrayData]
    val n = math.min(la.numElements(), ra.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      acc = acc + la.getDouble(i) * ra.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (la, ra) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      // element-null check only emitted when the schema allows null elements;
      // ev.isNull is only assignable when `nullable` is true, which the
      // override above guarantees in exactly those cases
      val nullCheck =
        if (elemsNullable(left) || elemsNullable(right))
          s"if ($la.isNullAt($i) || $ra.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($la.numElements(), $ra.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc = $acc + $la.getDouble($i) * $ra.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Integer scoring kernel for the staged scalar-quantized ANN path:
  * `graft_dot_i8(w, codes)` = left-to-right fold of `w[i] * (double) codes[i]`
  * over an `array<double>` weight vector and an `array<tinyint>` code
  * vector. This is the whole point of storing int8 codes — the search scan
  * reads ONE BYTE per dimension and never materializes a dequantized
  * `array<double>` corpus; the affine dequantization collapses into the
  * per-query weights and a scalar correction term (see
  * `Similarity.annQuantized`). Same codegen'd-tight-loop rationale and null
  * semantics as [[DotProduct]].
  */
case class DotProductI8(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(ByteType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot_i8 requires (array<double>, array<tinyint>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = DoubleType

  private def elemsNullable(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  override def nullable: Boolean =
    left.nullable || right.nullable || elemsNullable(left) || elemsNullable(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val la = a.asInstanceOf[ArrayData]
    val ra = b.asInstanceOf[ArrayData]
    val n = math.min(la.numElements(), ra.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      acc = acc + la.getDouble(i) * ra.getByte(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (la, ra) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val nullCheck =
        if (elemsNullable(left) || elemsNullable(right))
          s"if ($la.isNullAt($i) || $ra.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = java.lang.Math.min($la.numElements(), $ra.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullCheck
         |  $acc = $acc + $la.getDouble($i) * (double) $ra.getByte($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot_i8"
}

object VectorExpressions {
  val dotInfo = new ExpressionInfo(classOf[DotProduct].getName, "graft_dot")
  val dotI8Info = new ExpressionInfo(classOf[DotProductI8].getName, "graft_dot_i8")

  /** Register `graft_dot` + `graft_dot_i8` on an existing session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dot"), dotInfo,
      { exprs: Seq[Expression] => DotProduct(exprs(0), exprs(1)) })
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_dot_i8"), dotI8Info,
      { exprs: Seq[Expression] => DotProductI8(exprs(0), exprs(1)) })
  }
}

/** SparkSessionExtensions hook: `--conf
  * spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (FunctionIdentifier("graft_dot"), VectorExpressions.dotInfo,
        { exprs: Seq[Expression] => DotProduct(exprs(0), exprs(1)) }))
    ext.injectFunction(
      (FunctionIdentifier("graft_dot_i8"), VectorExpressions.dotI8Info,
        { exprs: Seq[Expression] => DotProductI8(exprs(0), exprs(1)) }))
    ext.injectFunction(
      (FunctionIdentifier("graft_run_stats"), TextExpressions.runStatsInfo,
        { exprs: Seq[Expression] => RunLengthStats(exprs.head) }))
    ext.injectFunction(
      (FunctionIdentifier("graft_minhash"), TextExpressions.minhashInfo,
        { exprs: Seq[Expression] =>
          val n = exprs.lift(1)
            .map(e => e.eval().asInstanceOf[Number].intValue())
            .getOrElse(16)
          MinHashSignatures(exprs.head, n) }))
  }
}
