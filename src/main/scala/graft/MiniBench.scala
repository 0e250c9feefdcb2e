package graft
import org.apache.spark.sql.SparkSession
/** Scratch probe (reused across rounds — round-6 continuation shape:
  * semanticDedup under the production scaling law numCells ∝ N, which
  * the fixed-parameter graded query cannot show: its cap valve
  * disables pairing once cells outgrow maxCell).
  * Usage: runMain graft.MiniBench <sfDir> <numCells> [maxCell]
  */
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
    val d = args(0)
    val numCells = args(1).toInt
    val maxCell = if (args.length > 2) args(2).toInt else 512
    def exec(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def run(): (Double, Long) = {
      val e = graft.io.Tables.embeddings(spark, d)
      val t0 = System.nanoTime()
      val df = graft.ops.SimOps.semanticDedup(e, "vec_id", "embedding",
        numCells = numCells, iters = 2, tau = 0.40, maxCell = maxCell)
      exec(df)
      val secs = (System.nanoTime() - t0) / 1e9
      val dups = df.filter(org.apache.spark.sql.functions.col("is_dup")).count()
      Hygiene.clearAll(spark, blocking = true, gc = true)
      (secs, dups)
    }
    val (cold, dupsC) = run()
    val (warm, dupsW) = run()
    println(f"MINI semantic sf=$d cells=$numCells cap=$maxCell " +
      f"cold=$cold%.2f warm=$warm%.2f dups=$dupsC/$dupsW")
    spark.stop()
  }
}
