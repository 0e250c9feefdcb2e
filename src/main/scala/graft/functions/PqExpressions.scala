package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, BinaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native expressions for product-quantization (PQ) ANN — the
  * compressed-domain scan that makes corpus-wide similarity search
  * viable at 100 TB: each vector is stored as M small codes (here
  * 8 bytes/vector vs 256 for a 64-dim float array), queries scan the
  * code column with a per-query lookup table (ADC: asymmetric distance
  * computation, M array reads + adds per pair), and only the few
  * surviving candidates ever touch the full embedding column again.
  *
  * Same design rules as IvfExpressions: sub-codebooks ride along as
  * plain JVM arrays (driver metadata, M·K·dsub doubles — not literal
  * trees), CodegenFallback because the per-row numeric loop dwarfs
  * interpreted dispatch, and all arithmetic is double-precision
  * sequential folds so results are deterministic and oracle-mirrorable.
  */
private[functions] object PqArrays {
  /** codebooks(m)(k) = centroid k of subspace m (dsub doubles each);
    * every subspace must have the same K and dsub.
    */
  def validate(codebooks: Array[Array[Array[Double]]]): Unit = {
    require(codebooks.nonEmpty && codebooks(0).nonEmpty, "pq: empty codebooks")
    val k = codebooks(0).length
    val d = codebooks(0)(0).length
    require(codebooks.forall(cb => cb.length == k && cb.forall(_.length == d)),
      "pq: ragged codebooks (every subspace needs the same K and dsub)")
  }
}

/** PQ encoding: the input vector is split into M contiguous subvectors
  * (dsub = codebooks(m)(k).length each); code m is the index of the
  * L2-nearest centroid in subspace m's codebook. Ties go to the LOWER
  * index (strict `<`), mirroring `ORDER BY dist, k` argmin in SQL.
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  PqArrays.validate(codebooks)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  @transient private lazy val isFloat = VecArrays.isFloatArray(child)
  private def dsub = codebooks(0)(0).length

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = codebooks.length
    require(arr.numElements() == m * dsub,
      s"pq_encode: dimension mismatch (${arr.numElements()} vs ${m * dsub})")
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val off = s * dsub
      var best = Double.PositiveInfinity
      var bestK = 0
      var k = 0
      while (k < cb.length) {
        val c = cb(k)
        var d2 = 0.0
        var i = 0
        while (i < dsub) {
          val diff = VecArrays.get(arr, isFloat, off + i) - c(i)
          d2 += diff * diff
          i += 1
        }
        if (d2 < best) { best = d2; bestK = k } // < : ties keep the lower code
        k += 1
      }
      out(s) = bestK
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table: lut[m*K + k] = dot(q_m, centroid_{m,k}).
  * Computed once per query row; scoring a corpus vector is then M
  * array reads + adds (PqAdc) instead of a full-dimension dot.
  */
case class PqLut(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  PqArrays.validate(codebooks)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val isFloat = VecArrays.isFloatArray(child)
  private def dsub = codebooks(0)(0).length

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = codebooks.length
    val kk = codebooks(0).length
    require(arr.numElements() == m * dsub,
      s"pq_lut: dimension mismatch (${arr.numElements()} vs ${m * dsub})")
    val out = new Array[Any](m * kk)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val off = s * dsub
      var k = 0
      while (k < kk) {
        val c = cb(k)
        var d = 0.0
        var i = 0
        while (i < dsub) { d += VecArrays.get(arr, isFloat, off + i) * c(i); i += 1 }
        out(s * kk + k) = d
        k += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score: sum over subspaces of lut[m*K + codes[m]] — the PQ
  * approximation of dot(query, vector). M and K are derived from the
  * operand shapes (K = |lut| / |codes|). Summation is an ascending-m
  * sequential fold (the SQL mirror uses `sum(... ORDER BY m)`).
  */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(lutAny: Any, codesAny: Any): Any = {
    val lut = lutAny.asInstanceOf[ArrayData]
    val codes = codesAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    require(m > 0 && lut.numElements() % m == 0,
      s"pq_adc: lut size ${lut.numElements()} not a multiple of code count $m")
    val kk = lut.numElements() / m
    var s = 0.0
    var i = 0
    while (i < m) {
      val code = codes.getInt(i)
      require(code >= 0 && code < kk, s"pq_adc: code $code out of range [0,$kk)")
      s += lut.getDouble(i * kk + code)
      i += 1
    }
    s
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def pq_encode(emb: Column, codebooks: Array[Array[Array[Double]]]): Column =
    column(PqEncode(expression(emb), codebooks))

  def pq_lut(emb: Column, codebooks: Array[Array[Array[Double]]]): Column =
    column(PqLut(expression(emb), codebooks))

  def pq_adc(lut: Column, codes: Column): Column =
    column(PqAdc(expression(lut), expression(codes)))
}
