package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Sorted data layout — the data-skipping primitive. Writing a table
  * `repartitionByRange + sortWithinPartitions` on its hot filter key
  * makes every parquet row group's min/max statistics TIGHT and the
  * key ranges of files DISJOINT: a pushed-down range predicate then
  * skips all but the few row groups that actually overlap, so a
  * selective query reads O(matching data), not O(table). At 100 TB
  * this is the difference between a 10-second point-range query and a
  * full scan; the one-time range-shuffle at write amortizes over every
  * subsequent selective read (same trade as [[Bucketing]], keyed for
  * ranges instead of hash equality).
  *
  * The range partitioner samples the key distribution, so skew in the
  * layout key yields balanced files without manual salting.
  */
object Layout {

  /** Write `df` range-partitioned into `numParts` files and sorted by
    * `sortCols` within each — globally range-clustered parquet.
    */
  def writeSorted(df: DataFrame, path: String, numParts: Int,
                  sortCols: Seq[Column]): Unit =
    df.repartitionByRange(numParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(path)

  /** Per-row-group (path, rows, min, max) stats of a long column over
    * every parquet file under `path` — the evidence a skipping claim
    * rests on: tight disjoint ranges = prunable layout. Driver-side
    * footer reads only (no data pages), bounded by file count.
    */
  def rowGroupStats(spark: SparkSession, path: String,
                    col: String): Seq[(String, Long, Long, Long)] = {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(path).getFileSystem(conf)
    val files = fs.listStatus(new Path(path)).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") || p.getName.startsWith("part-"))
    files.toSeq.flatMap { p =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(p, conf))
      try {
        import scala.jdk.CollectionConverters._
        reader.getFooter.getBlocks.asScala.toSeq.map { block =>
          val c = block.getColumns.asScala
            .find(_.getPath.toDotString == col)
            .getOrElse(sys.error(s"column $col not found in ${p.getName}"))
          val stats = c.getStatistics
          (p.getName, block.getRowCount,
            stats.genericGetMin.asInstanceOf[Number].longValue(),
            stats.genericGetMax.asInstanceOf[Number].longValue())
        }
      } finally reader.close()
    }
  }
}
