package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops._
import graft.QHelp._

/** Multimodal (binary media column) family. */
private[graft] object QueriesMedia {


  // ---------------------------------------------------------- multimodal

  /** media_meta — binary media column + typed metadata; the
    * SQL-expressible slice is oracled.
    */
  private val m01 = Q(
    "media_meta",
    (s, d) => MediaOps.attachMedia(docs(s, d))
      .select(col("doc_id"),
        length(col("media")).cast("int").as("byte_len"),
        floor(length(col("media")) / 64).cast("int").as("n_frames"))
      .orderBy(col("doc_id")),
    Some("""
      SELECT doc_id,
             CAST(length(text) AS INTEGER)      AS byte_len,
             CAST(length(text) // 64 AS INTEGER) AS n_frames
      FROM documents ORDER BY doc_id"""))


  /** media_features — stubbed decode + frame sampling via
    * mapPartitions (per-partition decoder init). The stub's arithmetic
    * (byte sum / mean / 64-byte framing over the UTF-8 payload) is
    * deterministic, and the testdata documents are pure ASCII (checked:
    * octet_length == length at every SF), so DuckDB can mirror it with
    * per-char `ord` — the oracle proves every row flows through the
    * mapPartitions batch path with intact arithmetic, which is exactly
    * the plumbing the stub exists to exercise.
    */
  private val m02 = Q(
    "media_features",
    (s, d) => MediaOps.extractFeatures(s, MediaOps.attachMedia(docs(s, d)))
      .toDF()
      .select(col("doc_id"), col("byte_len"), round(col("mean_byte"), 4).as("mean_byte"),
        col("checksum"), col("n_frames"))
      .orderBy(col("doc_id")),
    Some("""
      WITH b AS (
        SELECT doc_id,
               CAST(length(text) AS INTEGER) AS byte_len,
               CAST(coalesce(list_sum(list_transform(range(1, length(text) + 1),
                    i -> ord(text[i:i]))), 0) AS BIGINT) AS bsum
        FROM documents)
      SELECT doc_id, byte_len,
             round(CASE WHEN byte_len = 0 THEN 0.0
                        ELSE bsum::DOUBLE / byte_len END, 4) AS mean_byte,
             bsum AS checksum,
             CAST(byte_len // 64 AS INTEGER) AS n_frames
      FROM b ORDER BY doc_id"""))


  /** media_resize — stubbed resize/re-encode stage (§2.11 multimodal):
    * binary in → smaller binary out with rewritten typed metadata, via
    * per-partition batches. FULLY ORACLED as of round 10 (was the
    * suite's lone rows-only entry for seven rounds): attachMedia's
    * metadata is now plain integer arithmetic, so DuckDB replays the
    * whole metadata chain — source dims, pixel-ratio byte budget
    * (floor division, the min/max clamps, the empty-payload branch for
    * NULL-text docs) — and the byte_len of every stub-resized payload
    * is hash-graded. The payload BYTES remain stub territory (stride
    * sampling stands in for a real codec), but the Spark-side
    * contract — mapPartitions batch path, binary in/out, output size
    * proportional to target dims — is now arithmetic-verified per row.
    */
  private val m03 = Q(
    "media_resize",
    (s, d) => MediaOps.resizeMedia(s, MediaOps.attachMedia(docs(s, d)), 64, 64)
      .select(col("doc_id"), col("width"), col("height"),
        length(col("media")).cast("int").as("byte_len"))
      .orderBy(col("doc_id")),
    Some("""
      WITH m AS (
        SELECT doc_id,
               CAST(coalesce(length(text), 0) AS BIGINT) AS len,
               (doc_id * 40503 + 17) % 1280 + 64 AS w,
               (doc_id * 69069 + 5) % 720 + 64 AS h
        FROM documents)
      SELECT doc_id,
             CAST(64 AS INTEGER) AS width,
             CAST(64 AS INTEGER) AS height,
             CAST(CASE WHEN len = 0 THEN 0
                       ELSE greatest(1, least(len, (len * 4096) // (w * h)))
                  END AS INTEGER) AS byte_len
      FROM m ORDER BY doc_id"""))

  val qs: Seq[Q] = Seq(m01, m02, m03)
}
