package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet readers for the driver testdata tables (TESTDATA.md).
  *
  * Capability parity with the reference's sources (SURVEY.md §2.2):
  * dumbo reads line/sequencefile datasets from a directory
  * (`dumbo/backends/streaming.py` inputformat handling); our engine is
  * parquet-first so scans get column pruning + predicate pushdown for
  * free — at 100 TB the scan is the dominant cost and a columnar format
  * with pushdown is the only viable layout.
  *
  * No schema is forced here: parquet carries it, and letting Spark use
  * the file footer keeps vectorized reading enabled.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  /** events.ts is TIMESTAMP(NANOS) in parquet, which Spark's vectorized
    * reader rejects. With `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set in Verify/Bench/tests) it arrives as a Long of nanoseconds;
    * convert to a proper TimestampType by truncating to µs — exactly
    * what a native ns→µs read would do.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      // integer `div`, not `/`: double division loses sub-µs precision
      // on 2024-era epoch-nano magnitudes (> 2^53)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** Multiple `-input` paths → one dataset (SURVEY.md §2.2 S6):
    * dumbo unions repeated -input dirs; we union by name so differing
    * column orders across sources are safe.
    */
  def multiInput(spark: SparkSession, paths: Seq[String]): DataFrame =
    paths.map(spark.read.parquet(_)).reduce(_.unionByName(_))
}
