package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.VectorDot

/** Session extension entry point (SURVEY.md §7.1: extensions are the
  * sanctioned hook for custom Catalyst code). Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` —
  * registers the native functions for SQL use alongside the Column API
  * in graft.functions.VectorFunctions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"vec_dot requires exactly 2 arguments (array, array), got ${exprs.length}")
        VectorDot(exprs.head, exprs(1))
      }))
  }
}
