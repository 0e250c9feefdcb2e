package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the shingling/MinHash hot path.
  *
  * The composable forms (sequence → transform → slice → concat_ws →
  * xxhash64 → array_distinct, and 32 × transform for MinHash) run as
  * interpreted higher-order lambdas with per-shingle string allocation;
  * at sf0.1 they dominated the dedup queries (~3s of a 6s query just
  * building shingles). On a 100 TB corpus the shingle pass touches
  * every byte once — it must be a tight loop.
  *
  * Both are CodegenFallback: the per-row work (an O(bytes) loop) dwarfs
  * the interpreted dispatch, so fallback costs ~nothing while keeping
  * the implementation auditable.
  *
  * Hash family: xxhash64 over each word's UTF-8 bytes (seed 42, Spark's
  * default), windows combined by hash chaining — fixed constants, fully
  * deterministic across runs/partitionings (SURVEY.md §7.3).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  // SQL-registered (GraftExtensions): checked input types turn a
  // wrong-typed argument into an AnalysisException instead of an
  // executor-side ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    TextExpressions.requireType("shingle_hashes", child, StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(UTF8String.fromString(" "), -1)
    val m = words.length - n + 1
    val wordHash = new Array[Long](words.length)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      wordHash(i) = XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset, w.numBytes, 42L)
      i += 1
    }
    if (m <= 0) {
      // doc shorter than the window: its shingle set is {hash(whole
      // text)} — identical short docs still match (Jaccard 1) while
      // different short docs stay distinct (no degenerate collisions)
      var h = 42L
      var j = 0
      while (j < words.length) { h = XXH64.hashLong(wordHash(j), h); j += 1 }
      return new GenericArrayData(Array[Any](h))
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < m) {
      var h = 42L
      var j = 0
      while (j < n) { h = XXH64.hashLong(wordHash(i + j), h); j += 1 }
      seen.add(h)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Fused MinHash signature: k minima over k seeded re-hashes of the
  * input array<long>, in one pass (vs k interpreted `transform`s).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires ARRAY<BIGINT> input (shingle hashes), got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val nElems = arr.numElements()
    // Defensive: ShingleHashes never emits an empty array (short docs
    // get a 1-element whole-text hash; null text stays null), but any
    // other empty-set producer gets null rather than an all-MaxValue
    // sentinel that would collide in every LSH band.
    if (nElems == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < nElems) {
      val h = arr.getLong(i)
      var s = 0
      while (s < k) {
        val hs = XXH64.hashLong(h, s.toLong)
        if (hs < mins(s)) mins(s) = hs
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(l => l: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Engine-portable MinHash signature: k minima of universal-hash mixes
  * of the low 31 bits of each distinct shingle's `md5_number_lower`.
  *
  * This is the MIRRORABLE counterpart of ShingleHashes→MinHashSig
  * (xxhash64 family, ~2× faster, private to this engine): every step
  * here is replayable in ANSI SQL —
  *   base  = md5_number_lower(shingle) & 2147483647   (31-bit)
  *   h_i   = (a_i * base + b_i) % 2147483647          (i = 0..k-1)
  *   sig_i = min over the doc's distinct shingles of h_i
  * with a_i = 1 + (2654435761*(i+1)) % 2147483646 (see companion) —
  * fixed Knuth/Numerical-Recipes multipliers, all arithmetic < 2^62 so
  * BIGINT-exact in any engine (and ANSI-overflow-safe here). DuckDB
  * replays base as `md5_number_lower(s) & 2147483647` (little-endian
  * digest bytes 8..15, the SimHash64 convention).
  *
  * Shingle semantics match the d02 oracle: distinct n-word shingles;
  * docs shorter than n words contribute {whole text}. NULL text → NULL
  * signature. One O(bytes) pass per row, no shuffle.
  */
case class MinHashSigMd5(child: Expression, n: Int, k: Int)
    extends UnaryExpression with CodegenFallback {

  // fail at construction, not as a per-row executor crash: the mix
  // tables are fixed at MaxK entries
  require(n >= 1, s"minhash_sig_md5: shingle width n must be >= 1, got $n")
  require(k >= 1 && k <= MinHashSigMd5.MaxK,
    s"minhash_sig_md5: k must be in [1, ${MinHashSigMd5.MaxK}], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    TextExpressions.requireType("minhash_sig_md5", child, StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val words = text.split(space, -1)
    val m = words.length - n + 1
    val shingles = new java.util.LinkedHashSet[UTF8String]()
    if (m <= 0) shingles.add(text)
    else {
      var i = 0
      while (i < m) {
        shingles.add(UTF8String.concatWs(space, words.slice(i, i + n).toIndexedSeq: _*))
        i += 1
      }
    }
    val md = MinHashSigMd5.md5.get()
    val mins = Array.fill(k)(Long.MaxValue)
    val it = shingles.iterator()
    while (it.hasNext) {
      md.reset()
      val d = md.digest(it.next().getBytes)
      // little-endian long of digest bytes 8..15 = md5_number_lower
      var h = 0L
      var b = 15
      while (b >= 8) { h = (h << 8) | (d(b) & 0xFFL); b -= 1 }
      val x = h & MinHashSigMd5.Mask31
      var i = 0
      while (i < k) {
        val v = (MinHashSigMd5.A(i) * x + MinHashSigMd5.B(i)) % MinHashSigMd5.P
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    new GenericArrayData(mins.map(v => v: Any))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigMd5 {
  /** 2^31 - 1 (Mersenne prime) — mix arithmetic stays under 2^62. */
  val P = 2147483647L
  val Mask31 = 2147483647L
  val MaxK = 64
  /** a_i ∈ [1, P-1], b_i ∈ [0, P-1]: fixed multiplicative-mix tables,
    * reproduced verbatim by the oracle SQL (range(k) + the same
    * formulas). 2654435761 = Knuth's 2^32/φ; 1013904223 = Numerical
    * Recipes' LCG increment.
    */
  val A: Array[Long] = Array.tabulate(MaxK)(i => 1L + (2654435761L * (i + 1)) % (P - 1))
  val B: Array[Long] = Array.tabulate(MaxK)(i => (1013904223L * (i + 1)) % P)
  private val md5: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))
}

/** All n-word shingle STRINGS of a space-tokenized text, duplicates
  * kept (occurrence counting — unlike ShingleHashes, which emits the
  * distinct hash set for Jaccard). The composable
  * transform(sequence, i -> concat_ws(element_at…)) form runs
  * interpreted per element with per-access bounds checks — ~2.9s of a
  * 3s bigram-count query at sf0.1; this is one UTF8String pass.
  * Texts shorter than n words yield an empty array (no degenerate
  * whole-text n-gram — counting wants real n-grams only).
  */
case class WordNgrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    TextExpressions.requireType("word_ngrams", child, StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    val m = words.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      out(i) = UTF8String.concatWs(space, words.slice(i, i + n).toIndexedSeq: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  /** Shared analysis-time input check for the SQL-registered kernels. */
  private[functions] def requireType(fn: String, child: Expression,
                                     expected: DataType): TypeCheckResult =
    if (child.dataType == expected) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$fn requires ${expected.catalogString} input, got ${child.dataType.catalogString}")
}

object TextFunctions {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** Distinct hashes of n-word shingles of a space-tokenized text. */
  def shingle_hashes(text: Column, n: Int): Column =
    column(ShingleHashes(expression(text), n))

  /** MinHash signature (k minima over seeded re-hashes). */
  def minhash_sig(shingleHashes: Column, k: Int): Column =
    column(MinHashSig(expression(shingleHashes), k))

  /** All n-word shingle strings (duplicates kept, for counting). */
  def word_ngrams(text: Column, n: Int): Column =
    column(WordNgrams(expression(text), n))

  /** Engine-portable MinHash signature (md5-derived, SQL-replayable). */
  def minhash_sig_md5(text: Column, n: Int, k: Int): Column =
    column(MinHashSigMd5(expression(text), n, k))
}
