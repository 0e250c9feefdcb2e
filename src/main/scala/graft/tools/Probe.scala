package graft
import org.apache.spark.sql.SparkSession
// scratch runner (round-6 seventh session): lshRecallReport under the
// PRODUCTION audit config — constant absolute sample size as the
// corpus grows (fraction ∝ 1/N), vs the graded fixed fraction whose
// truth-pair cost is quadratic in the scaled fixture's replica count.
// Usage: runMain graft.Probe <sfDir> <fraction> [reps]
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args(0)
    val fraction = args(1).toDouble
    val reps = if (args.length > 2) args(2).toInt else 2
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val times = (0 until reps).map { _ =>
      val docs = graft.io.Tables.documents(spark, d)
      val t0 = System.nanoTime()
      exec(graft.ops.DedupOps.lshRecallReport(docs, "text", "doc_id",
        sampleFraction = fraction))
      val s = (System.nanoTime() - t0) / 1e9
      Hygiene.clearAll(spark)
      s
    }
    val row = graft.ops.DedupOps.lshRecallReport(
      graft.io.Tables.documents(spark, d), "text", "doc_id",
      sampleFraction = fraction).collect()(0)
    println(s"""{"sf":"$d","fraction":$fraction,"times":[${times.mkString(",")}],""" +
      s""""n_true":${row.getLong(0)},"n_cand":${row.getLong(1)},"n_hits":${row.getLong(2)}}""")
    spark.stop()
  }
}
