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
