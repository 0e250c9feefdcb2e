package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash as a per-row native expression.
  *
  * SimHash is a per-document function: the explode-words → 64 vote
  * aggregates → reassemble formulation costs a full shuffle of every
  * token; this computes the same value in one pass over the row — no
  * shuffle at all. At 100 TB that turns near-dup signatures into a
  * pure map-side projection.
  *
  * The per-word hash is the low 64 bits of MD5 (little-endian bytes
  * 8..15 — bit-for-bit what DuckDB's `md5_number_lower` returns) and
  * is part of the operator's CONTRACT, not an implementation detail:
  * simhash fingerprints get persisted and compared across systems, so
  * an engine-portable, standardized hash beats a faster private one
  * (xxhash64 measured ~2× faster here, but no other engine can
  * reproduce the fingerprints). Vote rule: bit b of the result is set
  * iff >= half the words have bit b set (ties round up).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  // SQL-registered (GraftExtensions): checked input types turn a
  // wrong-typed argument into an AnalysisException instead of an
  // executor-side ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    TextExpressions.requireType("simhash64", child, StringType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(UTF8String.fromString(" "), -1)
    val md = SimHash64.md5.get()
    val votes = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      md.reset()
      val d = md.digest(words(i).getBytes)
      // little-endian long of digest bytes 8..15 = md5_number_lower
      var h = 0L
      var k = 15
      while (k >= 8) { h = (h << 8) | (d(k) & 0xFFL); k -= 1 }
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash64 {
  // MessageDigest is stateful and not thread-safe; one per task thread
  private val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

/** Generator (UDTF-shaped, SURVEY.md §2.10): all ordered pairs (a < b)
  * from an array<long> — posting-list pair expansion for the
  * inverted-index Jaccard join, without interpreted nested-lambda
  * struct building. Input arrays are bounded by the caller's maxDF, so
  * output is at most maxDF·(maxDF-1)/2 rows per input row.
  */
case class ArrayPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val value = child.eval(input)
    if (value == null) return Iterator.empty
    val arr = value.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val ids = new Array[Long](n)
    var i = 0
    while (i < n) { ids(i) = arr.getLong(i); i += 1 }
    java.util.Arrays.sort(ids)
    new Iterator[InternalRow] {
      private var a = 0
      private var b = 1
      override def hasNext: Boolean = a < n - 1
      override def next(): InternalRow = {
        val row = InternalRow(ids(a), ids(b))
        b += 1
        if (b >= n) { a += 1; b = a + 1 }
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Generator over array<struct<id:long, sz:long>> posting lists:
  * emits (id_a, id_b, sz_a, sz_b) for every ordered pair (a < b by id).
  * Carrying each doc's set size through the posting list lets the
  * Jaccard pipeline aggregate pairs straight to a result — no join
  * back to a sizes table (two fewer shuffles/broadcasts than the
  * classic formulation).
  */
case class PostingPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("sz_a", LongType, nullable = false),
    StructField("sz_b", LongType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val value = child.eval(input)
    if (value == null) return Iterator.empty
    val arr = value.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return Iterator.empty
    val entries = new Array[(Long, Long)](n)
    var i = 0
    while (i < n) {
      val s = arr.getStruct(i, 2)
      entries(i) = (s.getLong(0), s.getLong(1))
      i += 1
    }
    java.util.Arrays.sort(entries, Ordering.by((e: (Long, Long)) => e._1))
    new Iterator[InternalRow] {
      private var a = 0
      private var b = 1
      override def hasNext: Boolean = a < n - 1
      override def next(): InternalRow = {
        val row = InternalRow(entries(a)._1, entries(b)._1, entries(a)._2, entries(b)._2)
        b += 1
        if (b >= n) { a += 1; b = a + 1 }
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Per-row 64-bit SimHash of space-tokenized text. */
  def simhash64(text: Column): Column = column(SimHash64(expression(text)))

  /** Generator: ordered pairs (id_a < id_b) from an array<long>. */
  def array_pairs(ids: Column): Column = column(ArrayPairs(expression(ids)))

  /** Generator: ordered pairs with carried set sizes from an
    * array<struct<id,sz>> posting list.
    */
  def posting_pairs(entries: Column): Column = column(PostingPairs(expression(entries)))
}
