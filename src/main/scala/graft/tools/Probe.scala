package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
// scratch runner (round-6 continuation): robustOutliers pin-free
// two-window prototype vs the production checkpoint+broadcast
// formulation — output diff and warm timings on the graded fixture
object Probe {
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
    val ev = graft.io.Tables.events(spark, d)
    def windowVariant(): org.apache.spark.sql.DataFrame = {
      val v = col("value").cast("double")
      val w = Window.partitionBy(col("event_type"))
      ev.withColumn("__med", percentile(v, lit(0.5)).over(w))
        .withColumn("__mad", percentile(abs(v - col("__med")), lit(0.5)).over(w))
        .withColumn("rz", try_divide(v - col("__med"), col("__mad")))
        .filter(abs(col("rz")) > lit(3.0))
        .drop("__med", "__mad")
    }
    def prod(): org.apache.spark.sql.DataFrame =
      graft.ops.LibOps.robustOutliers(ev, Seq("event_type"), "value", 3.0)
    def exec(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      Hygiene.clearAll(spark, blocking = true, gc = true)
      s
    }
    // output diff (rz rounded 6 both sides to dodge try_divide ulp)
    val a = prod().select(col("event_id"), round(col("rz"), 6).as("rz"))
    val b = windowVariant().select(col("event_id"), round(col("rz"), 6).as("rz"))
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"PROBE diff=$diff")
    Hygiene.clearAll(spark, blocking = true, gc = true)
    val pc = exec(prod()); val pw = exec(prod())
    val wc = exec(windowVariant()); val ww = exec(windowVariant())
    println(f"PROBE prod cold=$pc%.2f warm=$pw%.2f | window cold=$wc%.2f warm=$ww%.2f")
    spark.stop()
  }
}
