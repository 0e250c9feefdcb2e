package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality gates: declarative row-level constraints evaluated in
  * ONE scan, reported as a compact per-constraint summary. A curation
  * pipeline runs these between stages (post-ingest, post-transform,
  * pre-train) and fails fast on violations instead of training on
  * silently-broken data.
  *
  * Scale shape: all constraints fold into a single partial-aggregated
  * pass (`sum(violates)` per constraint + one `count`), so N
  * constraints cost one table scan and a 1-row exchange regardless of
  * N or table size. The per-constraint report rows are exploded from
  * that single aggregate row driver-free.
  */
object ValidateOps {

  /** Evaluate `constraints` (name → predicate that must hold per row)
    * over `df`. Output: one row per constraint —
    * (check_name, n_rows, n_violations, ok) — in input order.
    * NULL predicate results count as violations (a constraint that
    * cannot be evaluated on a row did not hold on it).
    */
  def checkConstraints(df: DataFrame,
                       constraints: Seq[(String, Column)]): DataFrame = {
    require(constraints.nonEmpty, "no constraints given")
    val aggs = count(lit(1)).as("n_rows") +:
      constraints.zipWithIndex.map { case ((_, pred), i) =>
        sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v_$i")
      }
    val reports = constraints.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i).as("idx"), lit(name).as("check_name"),
        col(s"__v_$i").as("n_violations"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(col("n_rows"), explode(array(reports: _*)).as("c"))
      .select(col("c.check_name"), col("n_rows"),
        col("c.n_violations"), (col("c.n_violations") === 0L).as("ok"),
        col("c.idx"))
      .orderBy(col("idx")).drop("idx")
  }

  /** The rows violating one constraint — the drill-down after a failed
    * gate. Same single-scan shape as any filter.
    */
  def violations(df: DataFrame, pred: Column): DataFrame =
    df.filter(!coalesce(pred, lit(false)))
}
