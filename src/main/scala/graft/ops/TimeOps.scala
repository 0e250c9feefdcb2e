package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowing (SURVEY.md §2.9). The reference has no
  * event-time concept at all ("Hadoop Streaming" is a pipe protocol) —
  * this is capability superset, expressed with Catalyst's native
  * `window`/`session_window` expressions, which work identically in
  * batch and Structured Streaming, so the same query can later be run
  * with `readStream` + `withWatermark` unchanged.
  *
  * Window starts are emitted as epoch-second longs: parquet carries ns
  * timestamps, Spark µs — a raw timestamp column would never
  * hash-match the oracle (FIXTURES.md §C).
  */
object TimeOps {

  def tumbling(df: DataFrame, ts: String, width: String, extraKeys: Seq[String],
               aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(ts), width) +: extraKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start").cast("long"))
      .drop("window")

  def sliding(df: DataFrame, ts: String, width: String, slide: String,
              extraKeys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(ts), width, slide) +: extraKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start").cast("long"))
      .drop("window")

  /** Session windows: gap-merged per key. A new session starts when the
    * gap to the previous event is >= `gap` (Spark's session end is
    * last-event-ts + gap, half-open).
    */
  def session(df: DataFrame, ts: String, gap: String, keys: Seq[String],
              aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(ts), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start").cast("long"))
      .drop("session_window")
}
