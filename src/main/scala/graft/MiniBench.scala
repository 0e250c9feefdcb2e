package graft
import org.apache.spark.sql.SparkSession
object MiniBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // naive TIMESTAMP(MICROS) must read as session-tz TIMESTAMP (not
      // NTZ) so event-time ops and epoch casts keep rounds-1-5 semantics
      // and scan-level pushdown (Tables normalizes as a fallback)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val out = new StringBuilder
    for (n <- Seq("dedup_spans")) {
      val df = SparkEntry.queries(n)(spark, d)
      val t0 = System.nanoTime()
      val rows = df.count()
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      df.count()
      val warm = (System.nanoTime() - t1) / 1e9
      out.append(f"===== $n rows=$rows cold=$cold%.2f warm=$warm%.2f\n")
      out.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode) + "\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/plans_spans.txt"), out.toString)
    println("MINI plans written")
    spark.stop()
  }
}
