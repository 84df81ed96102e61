package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{functions => F, graftshim}

/** Double-precision dot product of two float arrays as a native
  * Catalyst expression with a tight generated loop.
  *
  * Why not built-ins: `aggregate(zip_with(...))` is CodegenFallback —
  * interpreted per ROW it costs ~35us/pair (round-2 planeDots note),
  * and an unrolled `element_at` sum fuses into a whole-stage method so
  * large the JVM refuses to JIT it, leaving the stage in the bytecode
  * interpreter at ~22us/row (measured on the embedding near-dup pair
  * scan at sf0.1: 0.9s of join + 13s of dot). A 6-line loop in
  * doGenCode is JIT-friendly, allocation-free, and identical in
  * summation order (left-to-right over positions, products widened to
  * double) — so results are bit-equal to the zip_with/aggregate form
  * the oracle queries were validated against.
  *
  * Null semantics mirror `aggregate(zip_with(a, b, _ * _), 0.0, _ + _)`:
  * null array -> null; length mismatch -> null (zip_with pads with
  * nulls, which poison the sum); any null element -> null.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "float_vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  /** Column API for [[FloatVectorDot]]. */
  def dotF(a: Column, b: Column): Column =
    graftshim.columnOf(FloatVectorDot(
      graftshim.expressionOf(a), graftshim.expressionOf(b)))

  /** Ratio that yields NULL on a zero denominator instead of the ANSI
    * DIVIDE_BY_ZERO error (Spark 4 defaults to ANSI mode): cosine of a
    * zero vector is undefined, and one empty-document embedding must
    * not abort a corpus-wide scan. NULL sims drop out of `>= threshold`
    * filters and sort last in top-k rankings.
    */
  def safeRatio(num: Column, den: Column): Column =
    F.when(den === 0.0, F.lit(null).cast("double")).otherwise(num / den)

  /** Double-precision cosine similarity of two float arrays — one
    * codegen'd pass per dot, norms in double; NULL for zero vectors.
    */
  def cosineF(a: Column, b: Column): Column =
    safeRatio(dotF(a, b), F.sqrt(dotF(a, a)) * F.sqrt(dotF(b, b)))
}
