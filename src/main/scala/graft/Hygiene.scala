package graft
import org.apache.spark.sql.SparkSession

/** Session state hygiene shared by the multi-query harnesses (Bench,
  * Verify): several operators pin blocks with eager
  * `localCheckpoint(true)` (staged scans, distinct-value cums, BPE
  * merge tables) — correct inside one query, whose caller may still
  * consume the checkpointed frame, but across 100+ queries in one JVM
  * the pinned blocks accumulate until late queries run against a
  * heap-pressured executor (the round-4 artifact measured exactly
  * this: read-family "warm" slower than cold). Each harness builds a
  * fresh DataFrame per invocation, so dropping every persisted RDD and
  * cached relation between queries is safe there. NOT for library
  * callers — it sweeps the whole SparkContext.
  */
object Hygiene {
  /** Drop all cached relations and persisted RDDs; optionally block
    * until the blocks are gone and nudge the collector (Bench wants
    * deterministic memory state before the next timer starts; Verify
    * just wants the pins gone eventually).
    */
  def clearAll(spark: SparkSession, blocking: Boolean = false,
               gc: Boolean = false): Unit = {
    try {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.valuesIterator
        .foreach(_.unpersist(blocking))
    } catch { case _: Throwable => }
    if (gc) System.gc()
  }
}
