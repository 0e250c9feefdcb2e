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
    SparkEntry.queries("text_bpe_merges")(spark, d).coalesce(1)
      .write.mode("overwrite").parquet("/tmp/verify_bpe/text_bpe_merges")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/bpe_oracle.sql"),
      graft.ops.BpeOps.mergesOracleSql(3))
    println("dumped")
    spark.stop()
  }
}
