package graft
import org.apache.spark.sql.SparkSession
// scratch runner (round-6 seventh session): the two sampled audit ops
// under the PRODUCTION config — constant absolute sample size as the
// corpus grows (fraction ∝ 1/N), vs the graded fixed fraction.
// Usage: runMain graft.Probe <recall|knn> <sfDir> <fraction> [reps]
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
    val mode = args(0)
    val d = args(1)
    val fraction = args(2).toDouble
    val reps = if (args.length > 3) args(3).toInt else 2
    def build(): org.apache.spark.sql.DataFrame = mode match {
      case "recall" => graft.ops.DedupOps.lshRecallReport(
        graft.io.Tables.documents(spark, d), "text", "doc_id",
        sampleFraction = fraction)
      case "knn" => graft.ops.SimOps.knnLabelAccuracy(
        graft.io.Tables.embeddings(spark, d), "vec_id", "embedding",
        "label", sampleFraction = fraction)
      case "knnivf" => graft.ops.SimOps.knnLabelAccuracy(
        graft.io.Tables.embeddings(spark, d), "vec_id", "embedding",
        "label", sampleFraction = fraction,
        ivfCells = Some(sys.env.getOrElse("PROBE_CELLS", "16").toInt))
      case m => sys.error(s"unknown probe mode $m")
    }
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val times = (0 until reps).map { _ =>
      val t0 = System.nanoTime()
      exec(build())
      val s = (System.nanoTime() - t0) / 1e9
      Hygiene.clearAll(spark)
      s
    }
    val n = build().collect().length
    println(s"""{"mode":"$mode","sf":"$d","fraction":$fraction,""" +
      s""""times":[${times.mkString(",")}],"rows":$n}""")
    spark.stop()
  }
}
