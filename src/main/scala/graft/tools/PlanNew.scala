package graft
import org.apache.spark.sql.SparkSession
// scratch runner (reused across round-3 checks): dump selected queries
object PlanNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.001", "0.1")) {
      SparkEntry.queries("q67_robust_outliers")(spark, s"/root/testdata/sf$sf")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"/tmp/verify_q67_$sf/q67_robust_outliers")
    }
    println("dumped")
    spark.stop()
  }
}
