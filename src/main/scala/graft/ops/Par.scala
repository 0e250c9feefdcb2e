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
    * The partition probe (`df.rdd`) is planning-only — PROVIDED the
    * plan is narrow. On a plan that already contains an exchange
    * (join/aggregate/window/sort/repartition), materializing the RDD
    * under AQE would RUN the upstream stages at construction time; and
    * such plans don't need fanning anyway — their output parallelism
    * is the session's shuffle-partition count. So exchange-shaped
    * inputs return unchanged, probe-free. (The probe does mean a
    * narrow input is physically planned twice — construction-time
    * cost only.) With AQE the final partition count can differ from
    * the probe's initial-plan count, but the initial count is exactly
    * the split count the map stage would run with, which is the
    * quantity that matters here.
    */
  private[graft] def fanOut(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    val wide = df.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Window | _: Sort | _: Distinct |
           _: GlobalLimit | _: RepartitionOperation => true
      case _ => false
    }
    if (wide) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
