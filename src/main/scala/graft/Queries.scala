package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables

/** Named query registry — the graded surface (SURVEY.md §7.4).
  *
  * Each entry pairs a Spark DataFrame query over the testdata tables
  * with (when SQL-expressible) an ANSI-SQL oracle the driver runs in
  * DuckDB on the same parquet. Oracle-parity rules (SURVEY.md §7.3 /
  * FIXTURES.md §C): identical column aliases on both sides, round()
  * double aggregates, deterministic ORDER BY with tiebreakers, cast
  * away engine-specific integer widths, truncate timestamps to epoch
  * seconds when they must be emitted.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Queries {

  /** q01 — pricing summary (TPC-H Q1 shape; SURVEY.md §2.5 A1/A4 + §2.3).
    * Reference capability: mapper filter + reducer aggregation with a
    * combiner (dumbo/lib :: sumreducer, statsreducer). Spark-first:
    * scan→filter→partial agg→final agg, all codegen'd; the filter and
    * the 7-column projection push into the parquet scan. At 100 TB the
    * single shuffle carries only (flag,status) partial aggregates.
    */
  private val q01 = Q(
    "q01_pricing_summary",
    (s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .filter($"l_shipdate" <= lit("1998-09-01"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
          round(avg($"l_quantity"), 4).as("avg_qty"),
          round(avg($"l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2)                            AS sum_qty,
             round(sum(l_extendedprice), 2)                       AS sum_base_price,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2)  AS sum_disc_price,
             round(avg(l_quantity), 4)                            AS avg_qty,
             round(avg(l_discount), 4)                            AS avg_disc,
             count(*)                                             AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  val all: Seq[Q] = Seq(q01)

  def queryMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleMap: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql.trim)).toMap
}
