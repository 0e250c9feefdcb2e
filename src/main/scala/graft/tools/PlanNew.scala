package graft
import org.apache.spark.sql.SparkSession
// scratch runner (reused across round-3 checks): dump selected queries
object PlanNew {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    SparkEntry.queries("text_unigram_lm")(spark, d).coalesce(1)
      .write.mode("overwrite").parquet("/tmp/verify_r3b/text_unigram_lm")
    println("dumped")
    spark.stop()
  }
}
