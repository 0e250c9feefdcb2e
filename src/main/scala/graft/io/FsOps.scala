package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Filesystem + sink utilities (SURVEY.md §2.2 S7/S9): the
  * `dumbo cat/ls/exists/rm/put/get` CLI verbs (`dumbo/cmd.py`) and the
  * `-overwrite`/`-delinputs` job options, over the Hadoop FileSystem
  * API so they work on HDFS/S3A/local alike.
  */
object FsOps {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** `dumbo ls` */
  def ls(spark: SparkSession, path: String): Seq[String] =
    fs(spark, path).listStatus(new Path(path)).toSeq.map(_.getPath.toString)

  /** `dumbo exists` */
  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  /** `dumbo rm -rf` */
  def rm(spark: SparkSession, path: String): Boolean =
    fs(spark, path).delete(new Path(path), true)

  /** Create an empty marker file (the commit markers of the streaming
    * state protocols — `_COMMIT` under a delta batch dir). Overwrites
    * an existing marker: markers carry no payload, so re-touching on a
    * replay is idempotent by construction.
    */
  def touch(spark: SparkSession, path: String): Unit =
    fs(spark, path).create(new Path(path), true).close()

  /** `dumbo put` / `dumbo get` */
  def put(spark: SparkSession, local: String, dest: String): Unit =
    fs(spark, dest).copyFromLocalFile(new Path(local), new Path(dest))
  def get(spark: SparkSession, src: String, local: String): Unit =
    fs(spark, src).copyToLocalFile(new Path(src), new Path(local))

  /** `dumbo cat | head` — sample rows without a full materialization. */
  def cat(df: DataFrame, n: Int = 20): Seq[Row] = df.limit(n).collect().toSeq

  /** Sink with dumbo's `-overwrite` and `-delinputs` semantics: write
    * parquet (overwrite mode = rm-output-first), then optionally delete
    * the inputs only after a successful write. `compression` is the
    * `-compressoutput` surface (S5): any codec Spark's parquet sink
    * accepts — snappy (default), zstd, gzip, lz4, none.
    */
  def writeParquet(spark: SparkSession, df: DataFrame, out: String,
                   overwrite: Boolean = true, delInputs: Seq[String] = Nil,
                   compression: Option[String] = None): Unit = {
    val w = df.write.mode(if (overwrite) "overwrite" else "errorifexists")
    compression.fold(w)(c => w.option("compression", c)).parquet(out)
    delInputs.foreach(rm(spark, _))
  }
}
