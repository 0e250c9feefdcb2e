package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** One-off probe (round 14): does Observation.get return after a
  * PARQUET WRITE action (the staging write every GraphOps round already
  * pays)? The convergence early-exit rides observe-on-write; if the
  * listener did not fire for write commands, Observation.get would
  * block forever — probe before building on it.
  */
object ObsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val obs = Observation()
    val df = spark.range(100)
      .select(col("id"), (col("id") % 7).as("label"), (col("id") % 3 === 0).as("chg"))
      .observe(obs, count(when(col("chg"), lit(1))).as("n_changed"))
      .select(col("id"), col("label"))
    val dir = java.nio.file.Files.createTempDirectory("obsprobe").toString
    df.write.mode("overwrite").parquet(s"$dir/out")
    // a watchdog so a never-firing listener prints FAIL instead of hanging
    val t = new Thread(() => {
      Thread.sleep(30000)
      println("OBSPROBE: TIMEOUT — observation never fired for the write action")
      System.exit(3)
    })
    t.setDaemon(true)
    t.start()
    val m = obs.get
    println(s"OBSPROBE: ok metrics=$m (expect n_changed=34)")
    spark.stop()
  }
}
