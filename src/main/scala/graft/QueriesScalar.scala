package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops._
import graft.QHelp._

/** Scalar-function surface + semi/anti joins (SURVEY.md §2.8, J-family). */
private[graft] object QueriesScalar {


  // ------------------------------------------------------ scalar surface

  /** q17 — json extraction (§2.8; events.props payload). */
  private val q17 = Q(
    "q17_json_extract",
    (s, d) => {
      import s.implicits._
      ev(s, d)
        // try_cast mirrors the oracle's TRY_CAST: a non-numeric payload
        // yields NULL instead of an ANSI-mode cast error
        .withColumn("k", expr("try_cast(get_json_object(props, '$.k') AS int)"))
        .groupBy($"event_type")
        .agg(sum($"k").as("sum_k"), count(lit(1)).as("cnt"))
        .orderBy($"event_type")
    },
    Some("""
      SELECT event_type,
             CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
             count(*) AS cnt
      FROM events GROUP BY event_type ORDER BY event_type"""))


  /** q18 — date functions (§2.8): per-month order aggregates. */
  private val q18 = Q(
    "q18_date_agg",
    (s, d) => {
      import s.implicits._
      ord(s, d)
        .groupBy(year($"o_orderdate").as("o_year"), month($"o_orderdate").as("o_month"))
        .agg(count(lit(1)).as("cnt"), round(sum($"o_totalprice"), 2).as("sum_price"))
        .orderBy($"o_year", $"o_month")
    },
    Some("""
      SELECT CAST(year(o_orderdate) AS INTEGER)  AS o_year,
             CAST(month(o_orderdate) AS INTEGER) AS o_month,
             count(*) AS cnt, round(sum(o_totalprice), 2) AS sum_price
      FROM orders GROUP BY 1, 2 ORDER BY 1, 2"""))


  /** q19/q20 — semi/anti joins (§2.4 superset; EXISTS / NOT EXISTS). */
  private val q19 = Q(
    "q19_join_semi",
    (s, d) => {
      import s.implicits._
      cust(s, d)
        .join(ord(s, d).filter($"o_orderpriority" === "1-URGENT"),
          $"c_custkey" === $"o_custkey", "left_semi")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""))


  private val q20 = Q(
    "q20_join_anti",
    (s, d) => {
      import s.implicits._
      cust(s, d)
        .join(ord(s, d).filter($"o_orderpriority" === "1-URGENT"),
          $"c_custkey" === $"o_custkey", "left_anti")
        .select($"c_custkey", $"c_name")
        .orderBy($"c_custkey")
    },
    Some("""
      SELECT c_custkey, c_name FROM customer c
      WHERE NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')
      ORDER BY c_custkey"""))


  /** q21 — 3-way fact join (TPC-H Q3 shape): revenue by market segment. */
  private val q21 = Q(
    "q21_revenue_by_segment",
    (s, d) => {
      import s.implicits._
      li(s, d)
        .join(ord(s, d), $"l_orderkey" === $"o_orderkey")
        .join(cust(s, d), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(round(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("revenue"),
             count(lit(1)).as("n_lines"))
        .orderBy($"c_mktsegment")
    },
    Some("""
      SELECT c_mktsegment,
             round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
             count(*) AS n_lines
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))


  /** q22 — C4/A5 itertwice: frequency-of-frequencies, two chained
    * passes fused into one plan (no inter-pass materialization).
    */
  private val q22 = Q(
    "q22_count_of_counts",
    (s, d) => TextOps.countOfCounts(docs(s, d)).orderBy(col("cnt")),
    Some("""
      SELECT cnt, count(*) AS n_words FROM (
        SELECT word, count(*) AS cnt FROM (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents) a
        GROUP BY word) b
      GROUP BY cnt ORDER BY cnt"""))


  /** q23 — C9 path tagging (`-addpath`): rows keyed by input file. */
  private val q23 = Q(
    "q23_path_tagging",
    (s, d) => JoinOps.withInputPath(docs(s, d))
      .groupBy(regexp_extract(col("input_path"), "[^/]+$", 0).as("file_name"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("file_name")),
    Some("""
      SELECT 'documents.parquet' AS file_name, count(*) AS cnt FROM documents"""))

  val qs: Seq[Q] = Seq(q17, q18, q19, q20, q21, q22, q23)
}
