package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
// scratch runner (round 4): measure LSH recall + simhash hamming on the
// exact >=0.8-Jaccard ground-truth pairs, per sf — the facts the
// dedup_minhash/dedup_simhash oracles rest on
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // naive TIMESTAMP(MICROS) must read as session-tz TIMESTAMP (not
      // NTZ) so event-time ops and epoch casts keep rounds-1-5 semantics
      // and scan-level pushdown (Tables normalizes as a fallback)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.DedupOps
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val docs = graft.io.Tables.documents(spark, s"/root/testdata/sf$sf")
      // exact ground truth: all pairs with unrounded jaccard >= 0.8,
      // UNPRUNED (maxDF = MaxValue): the d02 oracle is unpruned, so the
      // recall measurement must be against true pairs, not a maxDF
      // subset (review-pass finding, round 4)
      val exact = DedupOps.ngramJaccardPairs(docs, "text", "doc_id",
          maxDF = Int.MaxValue, roundJaccard = false)
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"), col("jaccard"))
      // LSH candidates from the fixed family
      val sig = DedupOps.minhashSignature(docs, "text")
        .select(col("doc_id"), col("minhash_sig"))
      val cands = DedupOps.minhashCandidates(
        DedupOps.minhashBands(sig, "doc_id"), "doc_id")
      val missed = exact.join(cands, Seq("id_a", "id_b"), "left_anti")
      // simhash hamming on the ground-truth pairs
      val sh = DedupOps.simhash(docs, "text", "doc_id")
      val withH = exact
        .join(sh.select(col("doc_id").as("id_a"), col("simhash").as("h_a")), "id_a")
        .join(sh.select(col("doc_id").as("id_b"), col("simhash").as("h_b")), "id_b")
        .withColumn("hamming", bit_count(col("h_a").bitwiseXOR(col("h_b"))))
      val hDist = withH.groupBy("hamming").count().orderBy("hamming")
        .collect().map(r => s"${r.getInt(0)}:${r.getLong(1)}").mkString(" ")
      // false-positive check: hamming<=3 pairs NOT in the exact >=0.8 set
      val segs = sh.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map { s0 =>
          struct(lit(s0).as("seg_idx"),
            shiftright(col("simhash"), s0 * 16).bitwiseAND(lit(0xFFFFL)).as("seg_val"))
        }: _*)).as("seg"))
        .select(col("doc_id"), col("simhash"), col("seg.seg_idx"), col("seg.seg_val"))
      val l = segs.select(col("seg_idx"), col("seg_val"),
        col("doc_id").as("id_a"), col("simhash").as("sh_a"))
      val r2 = segs.select(col("seg_idx"), col("seg_val"),
        col("doc_id").as("id_b"), col("simhash").as("sh_b"))
      val hpairs = l.join(r2, Seq("seg_idx", "seg_val"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), col("sh_a"), col("sh_b")).distinct()
        .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
        .filter(col("hamming") <= 3)
      val fp = hpairs.join(exact, Seq("id_a", "id_b"), "left_anti").count()
      // bucket-size headroom vs the maxBucket=256 caps (informational:
      // the d03 oracle mirrors the cap, so parity no longer depends on
      // staying under it — but the headroom says how much of the
      // corpus the capped paths actually cover)
      val maxSeg = segs.groupBy("seg_idx", "seg_val").count()
        .agg(max("count")).head().getLong(0)
      val maxBand = DedupOps.minhashBands(sig, "doc_id")
        .groupBy("band_idx", "band_hash").count()
        .agg(max("count")).head().getLong(0)
      println(s"SF=$sf exactPairs=${exact.count()} lshMissed=${missed.count()} " +
        s"hammingDist[$hDist] ham<=3 pairs=${hpairs.count()} falsePos=$fp " +
        s"maxSegBucket=$maxSeg maxBandBucket=$maxBand")
    }
    spark.stop()
  }
}
