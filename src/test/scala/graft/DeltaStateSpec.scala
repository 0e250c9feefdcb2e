package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.streaming.{DeltaState, StreamingOps}
import graft.streaming.DeltaState.DeltaFoldSpec

/** The batch-sized-publish protocol (round 11's lead task): delta
  * ingest, crash/replay/divergence cases, compaction, retention, and
  * the equivalence with the full-rewrite versioned-snapshot protocol.
  */
class DeltaStateSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString + "/s"

  // a per-doc-fact "index": (id, sig) rows; adds derive sig from the
  // batch, dels tombstone by id — the simhash/minhash/span fold shape
  private def spec: DeltaFoldSpec = DeltaFoldSpec(
    add = b => b.filter($"op" === "add").select($"id", ($"id" * 7).as("sig")),
    del = Some(b => b.filter($"op" === "del").select($"id")))

  private def batchDf(adds: Seq[Long], dels: Seq[Long]): DataFrame =
    adds.map(i => (i, "add")).toDF("id", "op")
      .unionByName(dels.map(i => (i, "del")).toDF("id", "op"))

  private def stateRows(dir: String): Seq[(Long, Long)] =
    DeltaState.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq

  private def idx(ids: Seq[Long]): Seq[(Long, Long)] =
    ids.map(i => (i, i * 7)).sorted

  test("delta folds land on the rewrite protocol's state; base untouched per batch") {
    val dir = tmp("ds_core")
    DeltaState.init(spark, dir, (0L until 50L).map(i => (i, i * 7)).toDF("id", "sig"))
    def baseFiles(): Seq[String] =
      graft.io.FsOps.ls(spark, s"$dir/base/v0").sorted
    val before = baseFiles()
    // batch 0: add 100–109, retract 0–4 (dels hit the BASE)
    DeltaState.applyDeltaBatch(spark, dir, 0L,
      batchDf(100L until 110L, 0L until 5L), spec)
    // batch 1: add 110–119, retract 100–101 (dels hit a DELTA's adds)
    DeltaState.applyDeltaBatch(spark, dir, 1L,
      batchDf(110L until 120L, 100L until 102L), spec)
    // the batch-sized-write contract: the base's file list is
    // byte-identical after two ingest batches — nothing state-sized
    // was rewritten on the ingest path
    assert(baseFiles() == before, "ingest touched the base")
    val want = idx((5L until 50L) ++ (102L until 120L))
    assert(stateRows(dir) == want, "delta resolution != expected state")
    // equivalence with the full-rewrite protocol: the same two batches
    // through foreachBatchFold's fold shape (delete-then-union)
    val rwDir = tmp("ds_rw")
    (0L until 50L).map(i => (i, i * 7)).toDF("id", "sig")
      .write.mode("overwrite").parquet(s"$rwDir/v0")
    val fold = (state: DataFrame, b: DataFrame) =>
      state.join(b.filter($"op" === "del").select($"id"), Seq("id"), "left_anti")
        .unionByName(b.filter($"op" === "add")
          .select($"id", ($"id" * 7).as("sig")))
    StreamingOps.applyFoldBatch(spark, rwDir, 0L,
      batchDf(100L until 110L, 0L until 5L), fold)
    StreamingOps.applyFoldBatch(spark, rwDir, 1L,
      batchDf(110L until 120L, 100L until 102L), fold)
    val rw = spark.read
      .parquet(s"$rwDir/v${StreamingOps.latestCommitted(spark, rwDir)}")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(rw == want && stateRows(dir) == rw,
      "delta protocol and full-rewrite protocol diverged")
    graft.io.FsOps.rm(spark, dir)
    graft.io.FsOps.rm(spark, rwDir)
  }

  test("replays no-op, partials are invisible, divergence refuses loudly") {
    val dir = tmp("ds_replay")
    DeltaState.init(spark, dir, Seq((0L, 0L)).toDF("id", "sig"))
    DeltaState.applyDeltaBatch(spark, dir, 0L, batchDf(Seq(10L), Nil), spec)
    val once = stateRows(dir)
    // replay of the same batch id rewrites identical bytes — the
    // resolved state cannot move (an append sink would duplicate)
    DeltaState.applyDeltaBatch(spark, dir, 0L, batchDf(Seq(10L), Nil), spec)
    assert(stateRows(dir) == once, "replayed delta batch changed the state")
    // crash mid-write: delta data without _COMMIT is invisible to the
    // read AND to the next-expected position
    batchDf(Seq(99L), Nil).filter($"op" === "add")
      .select($"id", ($"id" * 7).as("sig"))
      .write.mode("overwrite").parquet(s"$dir/delta/b1/add")
    assert(stateRows(dir) == once, "uncommitted partial leaked into the read")
    // the redo of batch 1 overwrites the partial and commits
    DeltaState.applyDeltaBatch(spark, dir, 1L, batchDf(Seq(11L), Nil), spec)
    assert(stateRows(dir) == (once ++ Seq((11L, 77L))).sorted)
    // a skipped batch id (state behind checkpoint) refuses loudly
    val err = intercept[IllegalArgumentException] {
      DeltaState.applyDeltaBatch(spark, dir, 7L, batchDf(Seq(12L), Nil), spec)
    }
    assert(err.getMessage.contains("diverged"))
    graft.io.FsOps.rm(spark, dir)
  }

  test("compact folds deltas into a new base; replay-after-compact no-ops; retention holds") {
    val dir = tmp("ds_compact")
    DeltaState.init(spark, dir, Seq((0L, 0L)).toDF("id", "sig"))
    DeltaState.applyDeltaBatch(spark, dir, 0L,
      batchDf(Seq(10L, 11L), Seq(0L)), spec)
    DeltaState.applyDeltaBatch(spark, dir, 1L, batchDf(Seq(12L), Nil), spec)
    val pre = stateRows(dir)
    // a reader resolving the PRE-compaction snapshot (base v0 + deltas)
    val reader = DeltaState.read(spark, dir)
    DeltaState.compact(spark, dir)
    assert(DeltaState.latestBase(spark, dir) == 2L)
    assert(stateRows(dir) == pre, "compaction changed the state")
    // reader grace: folded deltas are retained one cycle, so the
    // pre-compaction reader still completes
    assert(reader.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      == pre, "pre-compaction reader lost files at compact")
    // a replayed batch racing the compaction (its delta folded and its
    // id below the new base) must no-op, not re-apply
    DeltaState.applyDeltaBatch(spark, dir, 1L, batchDf(Seq(12L), Nil), spec)
    assert(stateRows(dir) == pre, "replay-after-compact re-applied a delta")
    // next cycle: two more batches, compact again — the first cycle's
    // folded deltas sweep now, and bases keep the last-2 window
    DeltaState.applyDeltaBatch(spark, dir, 2L, batchDf(Seq(13L), Nil), spec)
    DeltaState.applyDeltaBatch(spark, dir, 3L, batchDf(Nil, Seq(10L)), spec)
    DeltaState.compact(spark, dir)
    assert(stateRows(dir) == idx(Seq(11L, 12L, 13L)))
    assert(DeltaState.committedBases(spark, dir).sorted == Seq(2L, 4L),
      "base retention window should keep the last 2 bases")
    assert(DeltaState.committedDeltas(spark, dir).sorted == Seq(2L, 3L),
      "previous cycle's folded deltas should sweep at the next compact")
    graft.io.FsOps.rm(spark, dir)
  }

  test("overlay ≡ read: base.antiJoin(tombs) ∪ resolvedAdds lands on the resolved state") {
    // the batch-scale view for bucketed-base consumers: composing the
    // overlay against the base externally must equal read()'s own
    // resolution — asserted so the two views cannot drift
    val dir = tmp("ds_overlay")
    val base = (0L until 30L).map(i => (i, i * 7)).toDF("id", "sig")
    DeltaState.init(spark, dir, base)
    // batch 0 adds 100–104 and retracts base ids 0–2; batch 1 retracts
    // the batch-0 add 100 (overlay-internal resolution) and adds 105
    DeltaState.applyDeltaBatch(spark, dir, 0L,
      batchDf(100L until 105L, 0L until 3L), spec)
    DeltaState.applyDeltaBatch(spark, dir, 1L,
      batchDf(Seq(105L), Seq(100L)), spec)
    val (adds, tombs) = DeltaState.overlay(spark, dir)
    val composed = base.join(tombs.get, Seq("id"), "left_anti")
      .unionByName(adds)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(composed == stateRows(dir), "overlay composition != read()")
    assert(composed == idx((3L until 30L) ++ (101L until 106L)))
    graft.io.FsOps.rm(spark, dir)
  }

  test("foreachBatchDeltaFold streams multi-batch, resumes, and compacts on schedule") {
    val stage = java.nio.file.Files.createTempDirectory("ds_feed").toString
    val dir = tmp("ds_stream")
    val feed1 = batchDf(100L until 110L, Seq(1L))
    val feed2 = batchDf(110L until 115L, Seq(100L))
    feed1.coalesce(1).write.mode("overwrite").parquet(stage)
    val schema = spark.read.parquet(stage).schema
    def src = spark.readStream.schema(schema).parquet(stage)
    val init = (0L until 10L).map(i => (i, i * 7)).toDF("id", "sig")
    // leg 1 (batch 0), then the second file lands and leg 2 resumes
    // off the kept checkpoint — only the new file folds; compactEvery=2
    // triggers the compaction at batch 1
    DeltaState.foreachBatchDeltaFold(src, init, dir, spec, compactEvery = 2)
    feed2.coalesce(1).write.mode("append").parquet(stage)
    val fin = DeltaState.foreachBatchDeltaFold(src, init, dir, spec,
      resume = true, compactEvery = 2)
    val got = fin.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == idx((0L until 10L).filterNot(_ == 1L) ++
      (101L until 115L)), "streamed delta folds != expected state")
    // the scheduled compaction ran at batch 1: base advanced past v0
    assert(DeltaState.latestBase(spark, dir) == 2L,
      "compactEvery=2 should have compacted after batch 1")
    graft.io.FsOps.rm(spark, stage)
    graft.io.FsOps.rm(spark, dir)
    graft.io.FsOps.rm(spark, dir + "_ckpt")
  }
}
