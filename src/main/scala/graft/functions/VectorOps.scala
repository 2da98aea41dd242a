package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math (SURVEY §2.10): the
  * higher-order-function cosine (zip_with + aggregate) walks the arrays
  * three times and allocates an intermediate array per row; these
  * expressions run one fused loop with whole-stage codegen and zero
  * allocation — the tier-(b) custom-Expression path the similarity
  * operators use on the 100 TB hot loop.
  *
  * Accepted input: array<float> or array<double> on either side (the
  * repo's native embeddings column is array<float>); element reads are
  * specialized per type, accumulation is always double. Any other type is
  * an analysis-time error, never silent garbage. (ExpectsInputTypes is not
  * implementable outside org.apache.spark.sql — AbstractDataType is
  * private[sql] — so validation goes through checkInputDataTypes.)
  */
trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _)  => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<float>/array<double> arguments, " +
          s"got ${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  /** Read element i of an ArrayData as double, specialized on the declared
    * element type (resolved once at plan time, not per row). */
  protected def leftIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  protected def rightIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  protected def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
  /** Codegen fragment reading element `i` as double. */
  protected def getter(arr: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
}

case class DotProduct(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = leftIsFloat; val rf = rightIsFloat
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += get(x, i, lf) * get(y, i, rf); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${getter(x, i, leftIsFloat)} * ${getter(y, i, rightIsFloat)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Single-pass cosine similarity: one loop accumulates dot, |a|², |b|².
  * Accumulation order per accumulator matches the sequential HOF form, so
  * results are bit-identical to aggregate(zip_with(...)) — asserted in
  * VectorOpsSpec. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = leftIsFloat; val rf = rightIsFloat
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = get(x, i, lf); val yv = get(y, i, rf)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = ${getter(x, i, leftIsFloat)};
         |  double $yv = ${getter(y, i, rightIsFloat)};
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  import org.apache.spark.sql.functions.call_function

  /** Register the expressions in the session's function registry (the
    * Column↔Expression bridge is private[sql] in Spark 4, so Columns are
    * built by name via call_function). Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
  }

  def vecDot(spark: org.apache.spark.sql.SparkSession,
             a: Column, b: Column): Column = {
    register(spark); call_function("vec_dot", a, b)
  }

  def vecCosine(spark: org.apache.spark.sql.SparkSession,
                a: Column, b: Column): Column = {
    register(spark); call_function("vec_cosine", a, b)
  }
}
