package graft
import org.apache.spark.sql.SparkSession
// scratch runner (reused across rounds): dump selected query plans
object PlanNew {
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
    val d = "/root/testdata/sf0.01"
    val out = new StringBuilder
    for (n <- args.toSeq) {
      val df = SparkEntry.queries(n)(spark, d)
      df.collect() // finalize AQE so the dumped plan is the executed one
      out.append("===== " + n + "\n")
      out.append(df.queryExecution.executedPlan.toString + "\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/plans_new4.txt"), out.toString)
    println("plans written")
    spark.stop()
  }
}
