package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops._
import graft.QHelp._

/** Core aggregation / join / set-op queries (SURVEY.md §2.5–§2.7). */
private[graft] object QueriesCore {


  // ------------------------------------------------------------ core aggs

  /** q01 — pricing summary (TPC-H Q1 shape; SURVEY.md §2.5 A1/A4 + §2.3).
    * One shuffle carrying only (flag,status) partial aggregates; filter
    * and 7-column projection push into the parquet scan.
    */
  private val q01 = Q(
    "q01_pricing_summary",
    (s, d) => {
      import s.implicits._
      li(s, d)
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


  /** q02 — wordcount, the reference's canonical example (C1+C3+C2;
    * `examples/wordcount.py`). Partial counts map-side = the combiner.
    */
  private val q02 = Q(
    "q02_wordcount",
    (s, d) => TextOps.wordCount(docs(s, d)).orderBy(col("word")),
    Some("""
      SELECT word, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
      GROUP BY word ORDER BY word"""))


  /** q03 — J1 tagged join chain: fact orders against broadcast dims
    * (dumbo's "primary fits in memory" = broadcast-hash join).
    */
  private val q03 = Q(
    "q03_join_nation_revenue",
    (s, d) => {
      import s.implicits._
      ord(s, d)
        .join(cust(s, d), $"o_custkey" === $"c_custkey")
        .join(broadcast(nat(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(reg(s, d)), $"n_regionkey" === $"r_regionkey")
        .groupBy($"r_name", $"n_name")
        .agg(round(sum($"o_totalprice"), 2).as("total_price"),
             count(lit(1)).as("order_cnt"))
        .orderBy($"r_name", $"n_name")
    },
    Some("""
      SELECT r_name, n_name,
             round(sum(o_totalprice), 2) AS total_price,
             count(*)                    AS order_cnt
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""))


  /** q04 — T1/T2 per-key top-k (nlargestreducer): top-3 orders per
    * customer; window partial-sorts per partition, no global sort.
    */
  private val q04 = Q(
    "q04_topk_per_group",
    (s, d) => {
      import s.implicits._
      LibOps.topKPerKey(ord(s, d), Seq("o_custkey"),
          Seq($"o_totalprice".desc, $"o_orderkey".asc), 3, rankCol = "rnk")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice", $"rnk")
        .orderBy($"o_custkey", $"rnk")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
        FROM orders) t
      WHERE rnk <= 3 ORDER BY o_custkey, rnk"""))


  /** q05 — A3/A4 statsreducer: per-key (n, mean, std, min, max). */
  private val q05 = Q(
    "q05_stats_per_key",
    (s, d) => {
      import s.implicits._
      LibOps.statsByKey(li(s, d), Seq("l_returnflag"), "l_quantity")
        .select($"l_returnflag", $"n", round($"mean", 4).as("mean"),
                round($"std", 4).as("std"), $"min_v", $"max_v")
        .orderBy($"l_returnflag")
    },
    Some("""
      SELECT l_returnflag, count(*) AS n,
             round(avg(l_quantity), 4)        AS mean,
             round(stddev_pop(l_quantity), 4) AS std,
             min(l_quantity) AS min_v, max(l_quantity) AS max_v
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))


  /** q06 — A2 sumsreducer: element-wise sums of several columns. */
  private val q06 = Q(
    "q06_sums_multi",
    (s, d) => {
      import s.implicits._
      LibOps.sumsByKey(li(s, d), Seq("l_returnflag", "l_linestatus"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        .select($"l_returnflag", $"l_linestatus",
          round($"sum_l_quantity", 2).as("sum_l_quantity"),
          round($"sum_l_extendedprice", 2).as("sum_l_extendedprice"),
          round($"sum_l_discount", 2).as("sum_l_discount"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2)      AS sum_l_quantity,
             round(sum(l_extendedprice), 2) AS sum_l_extendedprice,
             round(sum(l_discount), 2)      AS sum_l_discount
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))


  /** q07 — A5 count-distinct (two MR passes in dumbo, one aggregate
    * here; HLL variant exposed as LibOps.approxCountDistinctByKey).
    */
  private val q07 = Q(
    "q07_count_distinct",
    (s, d) => LibOps.countDistinctByKey(ev(s, d), Seq("event_type"), "user_id")
      .orderBy(col("event_type")),
    Some("""
      SELECT event_type, count(DISTINCT user_id) AS n_distinct
      FROM events GROUP BY event_type ORDER BY event_type"""))


  /** q08 — J3 secondary sort: first 5 events per user in ts order. */
  private val q08 = Q(
    "q08_secondary_sort",
    (s, d) => {
      import s.implicits._
      LibOps.topKPerKey(ev(s, d), Seq("user_id"),
          Seq($"ts".asc, $"event_id".asc), 5, rankCol = "rn")
        .select($"user_id", $"rn", $"event_id", $"event_type")
        .orderBy($"user_id", $"rn")
    },
    Some("""
      SELECT user_id, rn, event_id, event_type FROM (
        SELECT user_id, event_id, event_type,
               CAST(row_number() OVER (PARTITION BY user_id
                 ORDER BY ts, event_id) AS INTEGER) AS rn
        FROM events) t
      WHERE rn <= 5 ORDER BY user_id, rn"""))


  /** q09 — T4/T5 global sort + limit (dumbo: 1-reducer total order +
    * `dumbo cat | head`; Spark range-partitions the sort).
    */
  private val q09 = Q(
    "q09_global_sort_limit",
    (s, d) => {
      import s.implicits._
      ord(s, d).orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .limit(100)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    },
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""))


  /** q10 — S6/J2 multi-input union with per-source dispatch. */
  private val q10 = Q(
    "q10_union_multi_input",
    (s, d) => {
      val src = docs(s, d)
      JoinOps.multiSourceDispatch(Seq(
          (src, (df: DataFrame) => df.filter(col("source") === "src0")),
          (src, (df: DataFrame) => df.filter(col("source") === "src1"))))
        .groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("lang"))
    },
    Some("""
      SELECT lang, count(*) AS cnt FROM (
        SELECT * FROM documents WHERE source = 'src0'
        UNION ALL
        SELECT * FROM documents WHERE source = 'src1') t
      GROUP BY lang ORDER BY lang"""))


  /** q11/q12 — set ops (§2.7; capability superset, dumbo has union only). */
  private val q11 = Q(
    "q11_intersect",
    (s, d) => {
      import s.implicits._
      val o = ord(s, d)
      o.filter($"o_orderstatus" === "F").select($"o_custkey".as("custkey"))
        .intersect(o.filter($"o_orderstatus" === "O").select($"o_custkey".as("custkey")))
        .orderBy($"custkey")
    },
    Some("""
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
      ORDER BY custkey"""))


  private val q12 = Q(
    "q12_except",
    (s, d) => {
      import s.implicits._
      val o = ord(s, d)
      o.filter($"o_orderstatus" === "F").select($"o_custkey".as("custkey"))
        .except(o.filter($"o_orderstatus" === "P").select($"o_custkey".as("custkey")))
        .orderBy($"custkey")
    },
    Some("""
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
      ORDER BY custkey"""))


  /** q54 — UNION with distinct semantics (§2.7 completes the set-op
    * family next to q10's UNION ALL, q11 INTERSECT, q12 EXCEPT).
    */
  private val q54 = Q(
    "q54_union_distinct",
    (s, d) => {
      import s.implicits._
      val o = ord(s, d)
      o.filter($"o_orderstatus" === "F").select($"o_custkey".as("custkey"))
        .union(o.filter($"o_orderstatus" === "P").select($"o_custkey".as("custkey")))
        .distinct()
        .orderBy($"custkey")
    },
    Some("""
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
      UNION
      SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'P'
      ORDER BY custkey"""))


  /** q13 — rollup (§2.5 superset): subtotals per region/nation. */
  private val q13 = Q(
    "q13_rollup",
    (s, d) => {
      import s.implicits._
      cust(s, d)
        .join(broadcast(nat(s, d)), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(reg(s, d)), $"n_regionkey" === $"r_regionkey")
        .rollup($"r_name", $"n_name")
        .agg(count(lit(1)).as("n_cust"), round(sum($"c_acctbal"), 2).as("sum_bal"))
        .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
    },
    Some("""
      SELECT r_name, n_name, count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP(r_name, n_name)
      ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"""))

  val qs: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12, q54, q13)
}
