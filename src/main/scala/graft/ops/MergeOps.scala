package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot maintenance: apply a changeset (upserts + deletes) to a
  * base snapshot — the MERGE INTO semantics every periodically-
  * refreshed dataset needs (CDC ingestion, slowly-changing dims,
  * incremental corpus refresh before re-training).
  *
  * Scale shape: ONE hash shuffle of base ∪ changes on the key (the
  * union is cheap — no join, no second shuffle), then a per-key
  * window picks the winner. Equivalent full-outer-join formulations
  * shuffle both inputs separately AND materialize the join; the
  * union+window form is strictly less data movement and is the
  * standard compact-on-read merge. Multiple change rows for one key
  * resolve deterministically by `versionCol` (highest wins, changeset
  * beats base on ties).
  */
object MergeOps {

  /** Merge `changes` into `base`: a change row replaces the base row
    * with its key; a change row with `deleteCol` = true removes it;
    * unmatched change rows insert. Both inputs must share the schema
    * (plus the optional delete/version columns on `changes`).
    *
    * @param versionCol optional monotone version on `changes` used to
    *   resolve multiple changes per key (highest wins); omit when the
    *   changeset has at most one row per key.
    */
  def upsert(base: DataFrame, changes: DataFrame, keyCols: Seq[String],
             deleteCol: Option[String] = None,
             versionCol: Option[String] = None): DataFrame = {
    val dataCols = base.columns
    val del = deleteCol.getOrElse("__del")
    val ver = versionCol.getOrElse("__ver")
    val b = base
      .withColumn(del, lit(false))
      .withColumn(ver, lit(Long.MinValue))
      .withColumn("__src", lit(0))
    val c = changes
      .withColumn(del, deleteCol.map(col).getOrElse(lit(false)))
      .withColumn(ver, versionCol.map(col(_).cast("long")).getOrElse(lit(0L)))
      .withColumn("__src", lit(1))
      .select(b.columns.map(col).toSeq: _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(ver).desc, col("__src").desc)
    b.unionByName(c)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && !col(del))
      .select(dataCols.map(col).toSeq: _*)
  }

  /** Changeset between two snapshots of the same schema: the rows one
    * would feed back into [[upsert]] to turn `old` into `next` —
    * inserts/updates (rows of `next` absent or different in `old`) and
    * deletes (keys of `old` absent from `next`, flagged `is_delete`).
    * Two-sided anti semantics via one full-outer join on the key.
    */
  def diffSnapshots(old: DataFrame, next: DataFrame,
                    keyCols: Seq[String]): DataFrame = {
    val dataCols = next.columns
    val o = old.select(dataCols.map(c => col(c).as(s"__o_$c")).toSeq: _*)
    val joinCond = keyCols.map(k => col(k) <=> col(s"__o_$k")).reduce(_ && _)
    val changedOrNew = next.join(o, joinCond, "left")
      .filter(dataCols.filterNot(keyCols.contains)
        .map(c => !(col(c) <=> col(s"__o_$c"))).reduce(_ || _) ||
        keyCols.map(c => col(s"__o_$c").isNull).reduce(_ && _))
      .select(dataCols.map(col).toSeq: _*)
      .withColumn("is_delete", lit(false))
    val deleted = old.join(next.select(keyCols.map(col).toSeq: _*)
        .withColumn("__hit", lit(1)), keyCols, "left")
      .filter(col("__hit").isNull)
      .select(dataCols.map(col).toSeq: _*)
      .withColumn("is_delete", lit(true))
    changedOrNew.unionByName(deleted)
  }

  // -------------------------------------- incremental aggregate state

  /** Per-key mergeable aggregate state (n_rows, sum_<v>, min_<v>,
    * max_<v> per value column) — the building block of incremental
    * aggregation: every emitted measure is associative, so states from
    * disjoint batches MERGE into the state of their union without
    * touching raw rows again (means derive as sum/n at read time;
    * non-mergeable measures like exact distinct need their own sketch).
    */
  def aggState(df: DataFrame, keys: Seq[String],
               values: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        values.flatMap(v => Seq(
          sum(col(v)).as(s"sum_$v"),
          min(col(v)).as(s"min_$v"),
          max(col(v)).as(s"max_$v"))): _*)

  /** Merge a new batch's aggregate state into the snapshot STATE
    * (both sides must be `aggState` outputs, never raw rows) —
    * incremental aggregate maintenance. The shuffle carries
    * key-cardinality STATE rows from both sides, never the corpus: at
    * 100 TB the snapshot's raw rows are long gone, and keeping corpus
    * statistics current costs O(batch + |keys|) per ingest instead of
    * a full recompute. Result ≡ `aggState(snapshot_rows ∪ batch_rows)`
    * (the associativity law OpsSpec pins).
    */
  def mergeAggState(snapshotState: DataFrame, batchState: DataFrame,
                    keys: Seq[String], values: Seq[String]): DataFrame =
    snapshotState.unionByName(batchState)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n_rows")).as("n_rows"),
        values.flatMap(v => Seq(
          sum(col(s"sum_$v")).as(s"sum_$v"),
          min(col(s"min_$v")).as(s"min_$v"),
          max(col(s"max_$v")).as(s"max_$v"))): _*)
}
