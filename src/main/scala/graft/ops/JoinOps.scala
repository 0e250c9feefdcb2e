package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join parity (SURVEY.md §2.4; `dumbo/lib/__init__.py :: JoinReducer`,
  * `dumbo/decor.py :: primary/secondary`, `examples/join.py`).
  *
  * dumbo's only join is the tagged reduce-side equi-join: primary
  * (dimension) values sort first within each key and are buffered in
  * memory, secondary (fact) rows stream past them. That "primary fits
  * in memory" assumption is exactly Spark's broadcast-hash-join
  * criterion, so the faithful scale mapping is `broadcast(primary)`;
  * when the primary is NOT small Catalyst falls back to sort-merge —
  * which is dumbo's reduce-side join generalized. Either way we gain
  * outer/semi/anti variants for free.
  */
object JoinOps {

  /** J1 tagged equi-join. `broadcastPrimary = true` encodes dumbo's
    * small-primary assumption explicitly; AQE may still override.
    */
  def taggedJoin(secondary: DataFrame, primary: DataFrame, keys: Seq[String],
                 how: String = "inner", broadcastPrimary: Boolean = true): DataFrame = {
    val dim = if (broadcastPrimary) broadcast(primary) else primary
    secondary.join(dim, keys, how)
  }

  /** J2 MultiMapper: one logical job, per-source mapper. dumbo dispatches
    * on the task's input path; we apply each source's transform and union
    * by name — each branch keeps its own pushdown/pruning.
    */
  def multiSourceDispatch(sources: Seq[(DataFrame, DataFrame => DataFrame)]): DataFrame =
    sources.map { case (df, f) => f(df) }.reduce(_.unionByName(_))

  /** C9 path tagging (`-addpath`): key each row with its input file. */
  def withInputPath(df: DataFrame, as: String = "input_path"): DataFrame =
    df.withColumn(as, input_file_name())

  /** J3 secondary sort: partition on group keys only, order values by
    * subkeys within the group — dumbo's KeyFieldBasedPartitioner idiom.
    * Returned co-located + sorted, ready for per-partition streaming.
    */
  def secondarySort(df: DataFrame, groupKeys: Seq[String], subKeys: Seq[Column]): DataFrame =
    df.repartition(groupKeys.map(col): _*)
      .sortWithinPartitions(groupKeys.map(col) ++ subKeys: _*)
}
