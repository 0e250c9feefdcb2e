package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism shaping shared by the CPU-heavy map-side operators. */
object Par {

  /** Fan narrow, CPU-heavy map work out to the session's full
    * parallelism when the upstream plan has FEWER partitions than
    * that — and do nothing otherwise.
    *
    * Why: per-token explodes (n-gram windows, shingles, chunking) put
    * their cost in the map side, and the map side's task count is the
    * INPUT SPLIT count. A small parquet input (one file, one row
    * group) plans as one task, so the entire explode runs on 1 of N
    * cores — measured on dedup_spans at sf0.1: 11 s of a 12.5 s run
    * in two single-task stages. At the 100 TB design point the scan
    * has far more splits than cores and this helper is a no-op — the
    * repartition only fires when the input is too small to saturate
    * the cluster, where shuffling it is by definition cheap.
    *
    * The partition probe uses the INITIAL physical plan (planning
    * only, no job); with AQE the final count can differ, but the
    * initial count is exactly the split count the map stage would run
    * with, which is the quantity that matters here.
    */
  private[graft] def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
