package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native expressions for IVF cell assignment / probing and sign-LSH
  * sketches.
  *
  * The composable forms build the codebook as K×dim (or P×dim) literal
  * `array(lit...)` trees — 1000+ literal nodes per plan. That costs
  * seconds of codegen compilation per query and evaluates through
  * interpreted struct/array machinery. These expressions hold the
  * codebook/planes as plain JVM arrays (shipped with the serialized
  * plan) and run a primitive loop per row: small trees, no per-row
  * allocation beyond the output.
  *
  * CodegenFallback is deliberate: the per-row work is an O(K·dim)
  * numeric loop that dwarfs interpreted dispatch, and a tiny tree keeps
  * the surrounding projection inside WholeStageCodegen.
  *
  * Tie semantics mirror the struct-ordering formulations they replace:
  * equal scores resolve to the HIGHER cell index (array_max /
  * reverse(array_sort) on struct(s, cell) both break ties upward).
  */
private[functions] object VecArrays {
  /** Read element i of an array<float|double> column as double. */
  def get(arr: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)

  def isFloatArray(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** dot(row, centroid)/||centroid|| for one codebook row. */
  def centroidSim(arr: ArrayData, isFloat: Boolean, c: Array[Double], invNorm: Double): Double = {
    val n = c.length
    require(arr.numElements() == n,
      s"cell sim: dimension mismatch (${arr.numElements()} vs $n)")
    var s = 0.0
    var i = 0
    while (i < n) { s += get(arr, isFloat, i) * c(i); i += 1 }
    s * invNorm
  }
}

/** argmax-by-cosine cell id of an embedding against a codebook (the
  * row's own norm is constant across cells and cancels out).
  */
case class CellArgmax(child: Expression, codebook: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  @transient private lazy val isFloat = VecArrays.isFloatArray(child)
  @transient private lazy val invNorms =
    codebook.map(c => 1.0 / math.sqrt(c.map(x => x * x).sum))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var best = Double.NegativeInfinity
    var idx = 0
    var k = 0
    while (k < codebook.length) {
      val s = VecArrays.centroidSim(arr, isFloat, codebook(k), invNorms(k))
      if (s >= best) { best = s; idx = k } // >= : ties go to the higher cell
      k += 1
    }
    idx
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The `n` nearest cells (by cosine vs codebook) for probe fan-out,
  * ordered best-first; ties break to the higher cell index.
  */
case class CellTopCells(child: Expression, codebook: Array[Array[Double]], n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val isFloat = VecArrays.isFloatArray(child)
  @transient private lazy val invNorms =
    codebook.map(c => 1.0 / math.sqrt(c.map(x => x * x).sum))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val k = codebook.length
    val sims = new Array[Double](k)
    var i = 0
    while (i < k) {
      sims(i) = VecArrays.centroidSim(arr, isFloat, codebook(i), invNorms(i))
      i += 1
    }
    val order = Array.range(0, k).sortBy(c => (-sims(c), -c))
    new GenericArrayData(order.take(math.min(n, k)).map(c => c: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sign-LSH sketch: bit p = (v · plane_p >= 0), packed into an int. */
case class SignSketch(child: Expression, planes: Array[Array[Double]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType

  @transient private lazy val isFloat = VecArrays.isFloatArray(child)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var code = 0
    var p = 0
    while (p < planes.length) {
      val w = planes(p)
      require(arr.numElements() == w.length,
        s"sign sketch: dimension mismatch (${arr.numElements()} vs ${w.length})")
      var s = 0.0
      var i = 0
      while (i < w.length) { s += VecArrays.get(arr, isFloat, i) * w(i); i += 1 }
      if (s >= 0) code |= (1 << p)
      p += 1
    }
    code
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object IvfFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def cell_argmax(emb: Column, codebook: Array[Array[Double]]): Column =
    column(CellArgmax(expression(emb), codebook))

  def cell_top_cells(emb: Column, codebook: Array[Array[Double]], n: Int): Column =
    column(CellTopCells(expression(emb), codebook, n))

  def sign_sketch(emb: Column, planes: Array[Array[Double]]): Column =
    column(SignSketch(expression(emb), planes))
}
