package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Greedy Maximal-Marginal-Relevance selection as ONE native
  * expression.
  *
  * Why an expression and not composed array lambdas: the greedy is
  * inherently sequential (step t's scores depend on steps 1..t-1), and
  * a per-step `withColumn`/HOF unroll nests the selection expression
  * ~6× per step — Catalyst inlines it per reference, so both the
  * optimized plan and the interpreted evaluation grow EXPONENTIALLY in
  * k (measured: 197 copies of the step-1 subtree at k = 2, runaway at
  * k = 3; the join-based unroll alternative re-referenced the
  * retrieval subplan 485 times). Here the loop is a plain O(k·poolN²)
  * Scala scan per QUERY row over pool-bounded arrays — the
  * CellArgmax/MinHashSigMd5 argument: tiny tree, one eval, and the
  * surrounding projection stays codegen-friendly (CodegenFallback on
  * this node only).
  *
  * Inputs: `cands` array<struct<nid:long, sim:double>> (the query's
  * retrieval pool, sims pre-rounded), `pairs`
  * array<struct<nid_a:long, nid_b:long, csim:double>> (in-pool
  * pairwise sims; null/missing treated as no-penalty, matching
  * array_max's null-skip). Output: array<struct<nid:long, step:int,
  * sim:double>> — the k selections in pick order; pools shorter than
  * k yield shorter selections.
  *
  * Determinism: ties on mmr break to the LOWER nid; the arithmetic is
  * two exact IEEE mults and a subtract over pre-rounded sims, so a SQL
  * replay (the ann_mmr_topk oracle) reproduces the pick sequence
  * bit-for-bit.
  */
case class MmrSelect(left: Expression, right: Expression,
                     k: Int, lambda: Double)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("nid", LongType), StructField("step", IntegerType),
    StructField("sim", DoubleType))), containsNull = false)

  // fail at analysis, not mid-job: the eval reads fields by ordinal
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    def fieldTypes(dt: DataType): Option[Seq[DataType]] = dt match {
      case ArrayType(st: StructType, _) => Some(st.fields.map(_.dataType).toSeq)
      case _ => None
    }
    (fieldTypes(left.dataType), fieldTypes(right.dataType)) match {
      case (Some(Seq(LongType, DoubleType)),
            Some(Seq(LongType, LongType, DoubleType))) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"mmr_select expects array<struct<long,double>> candidates and " +
        s"array<struct<long,long,double>> pairs, got ${left.dataType} / ${right.dataType}")
    }
  }

  // a null pairs side (single-candidate pool: the pair join found
  // nothing) must still evaluate — override the null-propagating eval
  override def eval(input: InternalRow): Any = {
    val candsVal = left.eval(input)
    if (candsVal == null) return null
    val pairsVal = right.eval(input)

    val cands = candsVal.asInstanceOf[ArrayData]
    val n = cands.numElements()
    val nids = new Array[Long](n)
    val sims = new Array[Double](n)
    val simNull = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      val row = cands.getStruct(i, 2)
      nids(i) = row.getLong(0)
      simNull(i) = row.isNullAt(1)
      if (!simNull(i)) sims(i) = row.getDouble(1)
      i += 1
    }
    // pairwise sims: poolN² entries, keyed (nid_a, nid_b)
    val csim = new java.util.HashMap[(Long, Long), Double]()
    if (pairsVal != null) {
      val pairs = pairsVal.asInstanceOf[ArrayData]
      var j = 0
      while (j < pairs.numElements()) {
        val row = pairs.getStruct(j, 3)
        if (!row.isNullAt(0) && !row.isNullAt(1) && !row.isNullAt(2))
          csim.put((row.getLong(0), row.getLong(1)), row.getDouble(2))
        j += 1
      }
    }
    val picked = new Array[Boolean](n)
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](k)
    val selNids = new scala.collection.mutable.ArrayBuffer[Long](k)
    var t = 1
    while (t <= k) {
      var bestIdx = -1
      var bestMmr = 0.0
      var c = 0
      while (c < n) {
        if (!picked(c) && !simNull(c)) {
          // penalty: max csim vs the selected set (missing/none -> 0,
          // the array_max-over-empty coalesce semantics)
          var pen = Double.NegativeInfinity
          var s = 0
          while (s < selNids.length) {
            val v = csim.get((nids(c), selNids(s)))
            if (v != null && v > pen) pen = v
            s += 1
          }
          if (pen == Double.NegativeInfinity) pen = 0.0
          val mmr = lambda * sims(c) - (1 - lambda) * pen
          if (bestIdx < 0 || mmr > bestMmr ||
              (mmr == bestMmr && nids(c) < nids(bestIdx))) {
            bestIdx = c; bestMmr = mmr
          }
        }
        c += 1
      }
      if (bestIdx < 0) t = k + 1 // pool exhausted
      else {
        picked(bestIdx) = true
        selNids += nids(bestIdx)
        out += InternalRow(nids(bestIdx), t, sims(bestIdx))
        t += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MmrFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def mmr_select(cands: Column, pairs: Column, k: Int, lambda: Double): Column =
    column(MmrSelect(expression(cands), expression(pairs), k, lambda))
}
