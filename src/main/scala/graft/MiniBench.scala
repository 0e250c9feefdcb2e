package graft
import org.apache.spark.sql.SparkSession
/** Scratch probe (reused across rounds — round-7 continuation shape:
  * formatted-plan dump of the eval family, checking the corpus scan
  * count and that every Window sits over the distinct-score frame).
  * Usage: runMain graft.MiniBench <sfDir> <queryName>...
  */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // naive TIMESTAMP(MICROS) must read as session-tz TIMESTAMP (not
      // NTZ) so event-time ops and epoch casts keep rounds-1-5 semantics
      // and scan-level pushdown (Tables normalizes as a fallback)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args(0)
    args.drop(1).foreach { name =>
      println(s"========== $name ==========")
      println(Queries.queryMap(name)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
