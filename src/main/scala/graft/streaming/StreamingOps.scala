package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Structured Streaming variants of the event-time queries
  * (SURVEY.md §2.9 stretch — the reference has no streaming at all;
  * our batch window queries share the same Catalyst expressions, so
  * the streaming form is the identical transform under `readStream`).
  *
  * At scale: watermarking bounds state; the windowed aggregate state
  * store is keyed by (window, extra keys) and pruned as the watermark
  * passes window ends.
  */
object StreamingOps {

  /** readStream over a parquet directory with an explicit schema (a
    * streaming source may not infer). ts arrives as TIMESTAMP(NANOS)
    * → LongType under nanosAsLong; normalize exactly like the batch
    * reader (graft.io.Tables.events).
    */
  def eventsStream(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val raw = spark.readStream.schema(schema).parquet(dir)
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }

  /** Custom per-key streaming state (§2.9: `mapGroupsWithState`):
    * running per-user event count + last-seen epoch second. The state
    * store holds one small record per user; with a timeout configured
    * it is evicted on inactivity — bounded state at any scale.
    */
  def statefulUserCounts(spark: SparkSession, events: DataFrame) = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events.select(col("user_id").as[Long], col("ts").cast("long").as[Long])
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Long)]) =>
          val (prevN, prevLast) = state.getOption.getOrElse((0L, 0L))
          var n = prevN; var last = prevLast
          rows.foreach { case (_, ts) => n += 1; if (ts > last) last = ts }
          state.update((n, last))
          (user, n, last)
      }
      .toDF("user_id", "n_events", "last_seen")
  }

  /** Tumbling-window counts with a watermark: the streaming twin of
    * q14_window_tumbling.
    */
  def tumblingCounts(events: DataFrame, width: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("window.start").cast("long").as("window_start"),
        col("event_type"), col("cnt"), col("sum_value"))
}
