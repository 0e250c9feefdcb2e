package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for embedding dot products.
  *
  * The composable form (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * allocates an intermediate array and runs interpreted lambda calls
  * per element; on a 100 TB ANN scan the dot product IS the inner
  * loop, so it gets a fused, codegen'd implementation: one pass, no
  * allocation, stays inside WholeStageCodegen (~10× over the HOF
  * form measured at sf0.1).
  *
  * Accepts array<float> or array<double> on either side; result is
  * double. Per SURVEY.md §7.1 this is one of the few places where the
  * built-in operator surface genuinely can't express the semantics
  * efficiently (preference order (b): custom Expression).
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // both children must be array<float> or array<double>; checked so
  // the SQL surface (GraftExtensions `vec_dot`) rejects misuse at
  // analysis instead of ClassCastException-ing on the executor
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType | FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires ARRAY<FLOAT> or ARRAY<DOUBLE> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements())
      throw new IllegalArgumentException(
        s"vec_dot: dimension mismatch (${x.numElements()} vs ${y.numElements()})")
    val n = x.numElements()
    val lf = isFloat(left); val rf = isFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (isFloat(left)) "getFloat" else "getDouble"
    val rGet = if (isFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "vec_dot: dimension mismatch (" + $a.numElements() + " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Fused dot product (codegen'd); inputs array<float|double>. */
  def vec_dot(a: Column, b: Column): Column =
    column(VectorDot(expression(a), expression(b)))

  /** L2 norm via the fused dot. */
  def vec_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot(a, a))

  /** Cosine similarity from fused dots (callers should precompute
    * norms when one side is reused across many pairs).
    */
  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
}
