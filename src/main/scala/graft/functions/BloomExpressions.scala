package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter, as a native
  * expression. The filter ships with the serialized plan as a compact
  * byte array (the standard Bloom size story: ~1.2 bytes/item at 3%
  * fpp, vs tens of bytes/item for the exact string set), and is
  * deserialized once per executor thread via the transient lazy val —
  * per row the probe is two xxhash64-style hashes and k bit tests.
  *
  * This is the same shape Spark's own InjectRuntimeFilter uses for
  * runtime row-level join pruning (`BloomFilterMightContain`), lifted
  * to a user-facing function because that expression is internal and
  * only planner-injected.
  *
  * CodegenFallback is deliberate (house rule for the native kernels):
  * the tiny tree keeps the surrounding projection in WholeStageCodegen
  * and the probe itself dwarfs interpreted dispatch.
  *
  * False-positive semantics: `true` means MAYBE present — callers must
  * exact-verify survivors (see DeconOps.bloomDecontaminate). `false`
  * is definite absence; rows filtered out need no verification.
  */
case class BloomProbe(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    TextExpressions.requireType("bloom_probe", child, StringType)
  override def dataType: DataType = BooleanType

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def nullSafeEval(input: Any): Any =
    // mightContainBinary over the raw UTF-8 bytes — the same encoding
    // DataFrameStatFunctions.bloomFilter used to insert string rows,
    // so build and probe hash identically with zero copies
    bloom.mightContainBinary(input.asInstanceOf[UTF8String].getBytes)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  def bloom_probe(c: Column, bloom: BloomFilter): Column = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    column(BloomProbe(expression(c), bos.toByteArray))
  }
}
