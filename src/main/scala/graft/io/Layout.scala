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

  /** A parquet data file (not a _SUCCESS marker, checksum, or
    * partition subdirectory name) — shared by every listing here.
    */
  private def isDataFile(name: String): Boolean =
    name.endsWith(".parquet") || name.startsWith("part-")

  /** Write `df` range-partitioned into `numParts` files and sorted by
    * `sortCols` within each — globally range-clustered parquet.
    */
  def writeSorted(df: DataFrame, path: String, numParts: Int,
                  sortCols: Seq[Column]): Unit =
    df.repartitionByRange(numParts, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .write.mode("overwrite").parquet(path)

  /** Z-order (Morton) layout — multi-dimensional data skipping, the
    * Delta/Iceberg `Z-ORDER BY` capability: a single-key sorted layout
    * (`writeSorted`) gives tight min/max on ONE column and leaves
    * every other column's file ranges full-width; interleaving the
    * bits of two range-bucketed keys clusters rows into space-filling-
    * curve tiles, so BOTH columns get narrow per-file ranges and a
    * 2-dim box predicate prunes on either (or both) dimensions. The
    * write pays one range shuffle on the Morton key; every later
    * selective read skips row groups via footer stats — same
    * amortization argument as `writeSorted`, extended to 2-dim
    * predicates.
    */
  object ZOrder {
    import org.apache.spark.sql.functions._

    /** Spread the low 16 bits of `b` so bit i lands at position 2i —
      * the classic Morton bit-twiddle as a codegen'd arithmetic chain.
      */
    private def spread16(b: Column): Column = {
      val s1 = b.bitwiseOR(shiftleft(b, 8)).bitwiseAND(lit(0x00FF00FFL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
      s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
    }

    /** 32-bit Morton key of two columns range-bucketed to 16 bits each
      * over their [lo, hi] — row-local arithmetic, codegen'd.
      */
    def mortonKey(x: Column, xLo: Double, xHi: Double,
                  y: Column, yLo: Double, yHi: Double): Column = {
      def bucket(c: Column, lo: Double, hi: Double): Column =
        if (hi == lo) lit(0L)
        else least(greatest(
          floor((c.cast("double") - lo) / (hi - lo) * 65536.0), lit(0.0)),
          lit(65535.0)).cast("long")
      spread16(bucket(x, xLo, xHi))
        .bitwiseOR(shiftleft(spread16(bucket(y, yLo, yHi)), 1))
    }

    /** Write `df` clustered on the Morton key of (`xCol`, `yCol`) into
      * `numParts` files. The column ranges come from one bounded
      * min/max aggregate (4 values to the driver — the detectDim
      * trade; pass a production job its known ranges via `mortonKey`
      * directly to skip it).
      */
    def writeZOrdered(df: DataFrame, path: String, numParts: Int,
                      xCol: String, yCol: String): Unit = {
      require(!df.columns.contains("__z"),
        "writeZOrdered: input already has a __z column")
      val r = df.agg(
        org.apache.spark.sql.functions.min(df(xCol).cast("double")),
        org.apache.spark.sql.functions.max(df(xCol).cast("double")),
        org.apache.spark.sql.functions.min(df(yCol).cast("double")),
        org.apache.spark.sql.functions.max(df(yCol).cast("double"))).head()
      if (r.isNullAt(0) || r.isNullAt(2)) {
        // empty input (or all-null keys): no range to bucket — write
        // the data as-is, matching writeSorted's empty-input behavior
        df.write.mode("overwrite").parquet(path)
        return
      }
      val z = mortonKey(df(xCol), r.getDouble(0), r.getDouble(1),
        df(yCol), r.getDouble(2), r.getDouble(3))
      df.withColumn("__z", z)
        .repartitionByRange(numParts, org.apache.spark.sql.functions.col("__z"))
        .sortWithinPartitions(org.apache.spark.sql.functions.col("__z"))
        .drop("__z")
        .write.mode("overwrite").parquet(path)
    }
  }

  /** Small-file compaction — the operational sibling of the layout
    * writers: long-running ingest leaves directories of thousands of
    * tiny part files, and at 100 TB the per-file open/footer/seek
    * overhead (plus NameNode/listing pressure) dominates selective
    * reads. Compaction rewrites the directory into
    * ceil(totalBytes / targetBytes) balanced files via one round-robin
    * shuffle. Returns the target file count. Driver work is one
    * listing (bounded by file count); data moves once.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
              targetBytes: Long = 128L * 1024 * 1024): Int = {
    import org.apache.hadoop.fs.Path
    require(targetBytes > 0, s"compact: targetBytes=$targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(inPath).getFileSystem(conf)
    // recursive: Hive-partitioned layouts keep data files in key=value
    // subdirectories, which a top-level listing would total as 0 bytes
    val it = fs.listFiles(new Path(inPath), true)
    var total = 0L
    while (it.hasNext) {
      val f = it.next()
      if (isDataFile(f.getPath.getName)) total += f.getLen
    }
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(parts)
      .write.mode("overwrite").parquet(outPath)
    parts
  }

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
      .filter(p => isDataFile(p.getName))
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
