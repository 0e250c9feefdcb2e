package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Record codecs (SURVEY.md §2.2 S4/S8): dumbo's `code` text format
  * (repr-encoded records, `dumbo/util.py :: dumpcode/loadcode`) and the
  * `encodepipe`/`decodepipe` CLI verbs translate to JSON-line codecs —
  * the schema-carrying text interchange Spark handles natively and at
  * scale (one narrow projection each way, no shuffle).
  */
object Codec {

  /** encodepipe: any DataFrame → one JSON string per record. */
  def encodeJson(df: DataFrame): Dataset[String] = {
    import df.sparkSession.implicits._
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("json")).as[String]
  }

  /** decodepipe: JSON lines + schema → typed DataFrame. */
  def decodeJson(lines: Dataset[String], schema: StructType): DataFrame =
    lines.toDF("value").select(from_json(col("value"), schema).as("rec")).select("rec.*")

  /** `-parser` convention (schema-on-read inside the mapper): parse a
    * raw text column into typed fields with a regex, NCDC-example
    * style.
    */
  def parseWithRegex(df: DataFrame, textCol: String, pattern: String,
                     fields: Seq[String]): DataFrame =
    fields.zipWithIndex.foldLeft(df) { case (acc, (f, i)) =>
      acc.withColumn(f, regexp_extract(col(textCol), pattern, i + 1))
    }
}
