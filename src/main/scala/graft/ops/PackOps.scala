package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequence packing for training-batch construction (SURVEY.md §2.11):
  * stream documents in deterministic id order and cut a new bin every
  * `budget` tokens — bin = floor(exclusive-prefix-sum(tokens) /
  * budget). This is the parallel formulation of token-budget chunking
  * (a doc may straddle a boundary); true greedy bin-packing is
  * inherently sequential and not what a distributed pipeline wants.
  *
  * The global running sum is the scale hazard: `Window.orderBy(id)`
  * with no partition key collapses the corpus into ONE task. This
  * implementation is a two-level prefix sum instead: docs are bucketed
  * by id range (fixed width — correctness never depends on density,
  * only balance does), the in-bucket cumsum is an ordinary partitioned
  * window, bucket totals cascade through one tiny single-partition
  * window over |buckets| rows (~corpus/width — driver-scale), and the
  * offsets broadcast back. All integer arithmetic, fully deterministic.
  */
object PackOps {

  def packBudget(df: DataFrame, idCol: String, tokenCol: String,
                 budget: Long, bucketWidth: Long = 4096L): DataFrame = {
    require(budget > 0 && bucketWidth > 0, "packBudget: budget and bucketWidth must be positive")
    val bucketed = df
      // integer `div`, not floor(double /): exact for any id magnitude
      .withColumn("bucket", expr(s"`$idCol` div ${bucketWidth}L"))
      .withColumn("cum_in_bucket",
        sum(col(tokenCol).cast("long")).over(
          Window.partitionBy(col("bucket")).orderBy(col(idCol))))
    // |buckets| rows: the only unpartitioned window runs over
    // corpus/bucketWidth rows, not the corpus
    val offsets = bucketed.groupBy(col("bucket"))
      .agg(sum(col(tokenCol).cast("long")).as("bucket_total"))
      .withColumn("bucket_offset",
        coalesce(sum(col("bucket_total")).over(
          Window.orderBy(col("bucket"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("bucket_offset"))
    bucketed.join(broadcast(offsets), "bucket")
      .withColumn("cum", col("bucket_offset") + col("cum_in_bucket"))
      // integer `div` again: exact at any corpus size (floor(double /)
      // would drift past 2^53 total tokens)
      .withColumn("bin", expr(s"(cum - cast(`$tokenCol` as bigint)) div ${budget}L"))
      .drop("bucket", "cum_in_bucket", "bucket_offset")
  }

  /** Packing-efficiency report — the data card that justifies (or
    * kills) sequence packing for a corpus: per document-length bucket,
    * how many padded training sequences per-doc batching would emit
    * (each doc split into ceil(tokens/maxLen) sequences, the last one
    * padded) versus the packed lower bound (ceil(bucket tokens /
    * maxLen) bins), and the padding share that packing reclaims.
    * Skewed short-doc corpora show pad_pct near 1 — exactly the
    * evidence that decides the dataloader design.
    *
    * Scale shape: everything before the final aggregate is row-local
    * integer arithmetic (`div`-based ceils — exact at any magnitude,
    * no float rounding anywhere), then ONE partial-aggregated pass
    * over buckets-cardinality groups. Zero-token docs emit zero
    * sequences and no padding.
    *
    * Output per bucket: (bucket, n_docs, tokens, n_seqs, pad_slots,
    * pad_pct, bins_packed, saved_pct = 1 − bins_packed/n_seqs).
    */
  def packEfficiency(df: DataFrame, tokenCol: String, maxLen: Int,
                     bucketWidth: Int): DataFrame = {
    require(maxLen > 0 && bucketWidth > 0,
      s"packEfficiency: maxLen=$maxLen bucketWidth=$bucketWidth must be positive")
    val t = col(tokenCol).cast("long")
    val perDoc = df
      .select(expr(s"cast(`$tokenCol` as bigint) div ${bucketWidth}L")
          .cast("int").as("bucket"),
        t.as("__t"),
        expr(s"(cast(`$tokenCol` as bigint) + ${maxLen - 1}L) div ${maxLen}L")
          .as("__seqs"))
    perDoc.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__t")).as("tokens"),
        sum(col("__seqs")).as("n_seqs"))
      .withColumn("pad_slots", col("n_seqs") * maxLen - col("tokens"))
      .withColumn("pad_pct",
        round(try_divide(col("pad_slots").cast("double"),
          (col("n_seqs") * maxLen).cast("double")), 4))
      .withColumn("bins_packed",
        expr(s"(tokens + ${maxLen - 1}L) div ${maxLen}L"))
      .withColumn("saved_pct",
        round(lit(1.0) - try_divide(col("bins_packed").cast("double"),
          col("n_seqs").cast("double")), 4))
  }
}
