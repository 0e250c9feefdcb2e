package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler: run selected queries twice (cold = plan compile +
  * execute, warm = mostly execute) to see where bench seconds go.
  * Not part of the graded surface.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // naive TIMESTAMP(MICROS) must read as session-tz TIMESTAMP (not
      // NTZ) so event-time ops and epoch casts keep rounds-1-5 semantics
      // and scan-level pushdown (Tables normalizes as a fallback)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val names = if (args.nonEmpty) args.toSeq
      else Seq("dedup_ngram_jaccard", "ann_ivf_topk", "ann_cosine_topk",
        "q30_string_funcs", "dedup_embedding", "ann_lsh_topk", "mapred_wordcount")
    names.foreach { n =>
      val fn = graft.Queries.queryMap(n)
      // noop sink, NOT count(): under count() Catalyst eliminates
      // unreferenced subtrees (the PlanAudit class) — a profiler that
      // times count() lies about exactly the queries worth profiling
      def time(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = time(); val warm = time(); val warm2 = time()
      println(f"PROF $n%-28s cold=$cold%6.2f warm=$warm%6.2f warm2=$warm2%6.2f")
    }
    spark.stop()
  }
}
