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
    // SPARK_GRAFT_AB_PROTO=delta runs the same alternating protocol
    // on the BATCH-SIZED-publish path (DeltaState.foreachBatchStoreFolds
    // concurrentStores S/C — round 13's A/B): the same seven state
    // shapes, fact indexes as DeltaFoldSpecs and aggregate state as
    // MergeFoldSpecs, all folding off one pinned batch per trigger
    val proto = sys.env.getOrElse("SPARK_GRAFT_AB_PROTO", "fold")
    import graft.streaming.DeltaState
    import graft.streaming.DeltaState.{DeltaFoldSpec, MergeFoldSpec, NamedDeltaStore}
    def mhIdx(df: DataFrame) = DedupOps.minhashIndex(df, "text", "doc_id")
    def shIdx(df: DataFrame) = DedupOps.simhashIndex(df, "text", "doc_id")
    def segIdx(df: DataFrame) = DedupOps.simhashSegmentIndex(shIdx(df), "doc_id")
    def groupSum(keys: Seq[String], v: String)(df: DataFrame) =
      df.groupBy(keys.map(col): _*).agg(sum(col(v)).as(v)).filter(col(v) =!= 0)
    def deltaStores(root: String) = Seq(
      NamedDeltaStore(s"$root/mh_index", mhIdx(corpus),
        DeltaFoldSpec(add = mhIdx)),
      NamedDeltaStore(s"$root/sh_index", shIdx(corpus),
        DeltaFoldSpec(add = shIdx)),
      NamedDeltaStore(s"$root/seg_index", segIdx(corpus),
        DeltaFoldSpec(add = segIdx)),
      NamedDeltaStore(s"$root/mh_stats",
        DedupOps.minhashBucketStats(mhIdx(corpus)),
        MergeFoldSpec(partial = b => DedupOps.minhashBucketStats(mhIdx(b)),
          merge = groupSum(Seq("band_idx", "band_hash"), "bucket_n"))),
      NamedDeltaStore(s"$root/seg_stats",
        DedupOps.simhashSegmentStats(segIdx(corpus)),
        MergeFoldSpec(partial = b => DedupOps.simhashSegmentStats(segIdx(b)),
          merge = groupSum(Seq("seg_idx", "seg_val"), "bucket_n"))),
      NamedDeltaStore(s"$root/span_index",
        DedupOps.spanIndex(corpus, "text", "doc_id"),
        MergeFoldSpec(partial = b => DedupOps.spanIndex(b, "text", "doc_id"),
          merge = groupSum(Seq("fp"), "occ"))),
      NamedDeltaStore(s"$root/psi_state", hist(corpus),
        MergeFoldSpec(partial = hist, merge = groupSum(Seq("bin"), "n"))))
    def run(concurrent: Boolean, i: Int): Double = {
      val root = s"/tmp/graft_ab_state_${pid}_${if (concurrent) "c" else "s"}_$i"
      graft.io.FsOps.rm(spark, root)
      val t = timed {
        if (proto == "delta")
          DeltaState.foreachBatchStoreFolds(src, deltaStores(root),
            concurrentStores = concurrent)
        else
          StreamingOps.foreachBatchFoldMulti(src, root, specs,
            concurrentFolds = concurrent)
      }
      graft.io.FsOps.rm(spark, root)
      graft.io.FsOps.rm(spark, root + "_ckpt")
      if (proto == "delta")
        graft.io.FsOps.rm(spark, s"$root/mh_index_ckpt")
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
    // true median: average the two middle samples for even rep counts
    // — sorted(reps/2) was the MAX at the default reps=2 (round-12
    // advice; the number feeds BASELINE.md's ratio claim)
    def median(a: Array[Double]): Double = {
      val s = a.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    println(f"FOLDAB sf=$sfDir proto=$proto stores=7 reps=$reps (alternating S/C)")
    println(f"FOLDAB sequential=${seqT.map(t => f"$t%.2f").mkString(",")} median=${median(seqT)}%.2f")
    println(f"FOLDAB concurrent=${conT.map(t => f"$t%.2f").mkString(",")} median=${median(conT)}%.2f")
    graft.io.FsOps.rm(spark, stageDir)
    spark.stop()
  }
}
