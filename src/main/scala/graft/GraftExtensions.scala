package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType
import graft.functions.{MinHashSig, ShingleHashes, SimHash64, VectorDot, WordNgrams}

/** Session extension entry point (SURVEY.md §7.1: extensions are the
  * sanctioned hook for custom Catalyst code). Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` —
  * registers the native kernels for SQL use alongside the Column API in
  * graft.functions.*: a SQL-only user gets the same similarity / text /
  * dedup primitives the DataFrame queries are built on.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: size argument must be an INT literal, got $other")
  }

  private def arity(exprs: Seq[Expression], n: Int, fn: String): Unit =
    require(exprs.length == n, s"$fn requires exactly $n arguments, got ${exprs.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 2, "vec_dot")
        VectorDot(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 1, "simhash64")
        SimHash64(exprs.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 2, "shingle_hashes")
        ShingleHashes(exprs.head, intLit(exprs(1), "shingle_hashes"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_ngrams"),
      new ExpressionInfo(classOf[WordNgrams].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 2, "word_ngrams")
        WordNgrams(exprs.head, intLit(exprs(1), "word_ngrams"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => {
        arity(exprs, 2, "minhash_sig")
        MinHashSig(exprs.head, intLit(exprs(1), "minhash_sig"))
      }))
  }
}
