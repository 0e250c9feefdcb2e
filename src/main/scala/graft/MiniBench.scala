package graft
import org.apache.spark.sql.SparkSession
object MiniBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
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
    for (n <- Seq("q81_approx_winsorize", "q82_kmv_distinct",
                  "sample_temperature")) {
      val df = SparkEntry.queries(n)(spark, d)
      out.append("===== " + n + "\n")
      out.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode) + "\n")
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/plans_new4.txt"), out.toString)
    println("MINI plans written")
    spark.stop()
  }
}
