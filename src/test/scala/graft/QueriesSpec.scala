package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + shape checks for every registered query on sf0.001.
  * Exact-value correctness is gated by the driver's DuckDB oracle
  * (tools/check_oracle.py locally); these tests pin structural facts
  * that must hold regardless of scale factor.
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("every registered query runs and returns rows on sf0.001") {
    Queries.all.foreach { q =>
      val n = q.fn(spark, d).count()
      assert(n > 0, s"${q.name} returned 0 rows")
    }
  }

  test("every oracled query name exists in the query map") {
    Queries.oracleMap.keySet.foreach { k =>
      assert(Queries.queryMap.contains(k), s"oracle for unknown query $k")
    }
  }

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 pricing summary has the 6 (flag,status) groups") {
    val rows = Queries.queryMap("q01_pricing_summary")(spark, d).collect()
    assert(rows.length == 6)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length == 6)
  }

  test("typed mapred wordcount agrees with DataFrame wordcount") {
    val a = Queries.queryMap("q02_wordcount")(spark, d).collect().map(r => (r.getString(0), r.getLong(1)))
    val b = Queries.queryMap("mapred_wordcount")(spark, d).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq)
  }

  test("topk query never exceeds k rows per key") {
    val df = Queries.queryMap("q04_topk_per_group")(spark, d)
    val over = df.groupBy("o_custkey").count().filter(org.apache.spark.sql.functions.col("count") > 3)
    assert(over.count() == 0)
  }

  test("sliding windows hold exactly 4x the events") {
    import org.apache.spark.sql.functions._
    val total = Queries.queryMap("q15_window_sliding")(spark, d)
      .agg(sum("cnt")).collect()(0).getLong(0)
    val events = graft.io.Tables.events(spark, d).count()
    assert(total == 4 * events)
  }

  test("approx sketches stay near their exact counterparts") {
    // the engine-native HLL convenience (graded contract: q82's KMV);
    // retired from the query surface in round 6, still unit-proven here
    import org.apache.spark.sql.functions._
    val approx = graft.ops.LibOps.approxCountDistinctByKey(
        graft.io.Tables.events(spark, d), Seq("event_type"), "user_id")
      .orderBy(col("event_type")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.io.Tables.events(spark, d)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n) <= math.max(2L, (n * 0.1).toLong),
        s"HLL estimate $a too far from exact $n for $k")
    }
    // the approx-percentile convenience the old q32 also carried (its
    // graded counterparts are q81/q83's histogram quantiles): sketch
    // median within 10% of the exact percentile
    val ev = graft.io.Tables.events(spark, d)
    val row = ev.agg(
      percentile_approx(col("value"), lit(0.5), lit(1000)).as("a"),
      percentile(col("value"), lit(0.5)).as("e")).collect()(0)
    val (a, e) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(a - e) <= math.abs(e) * 0.1 + 1e-9,
      s"approx median $a too far from exact $e")
  }

  test("hash split is exhaustive, deterministic, and roughly 80/10/10") {
    val rows = Queries.queryMap("q47_hash_split")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = graft.io.Tables.documents(spark, d).count()
    assert(rows.values.sum == total)        // every doc in exactly one split
    assert(rows("train") > rows("valid") && rows("train") > rows("test"))
  }

  test("session windows partition all events") {
    import org.apache.spark.sql.functions._
    val total = Queries.queryMap("q16_session_window")(spark, d)
      .agg(sum("n_events")).collect()(0).getLong(0)
    val events = graft.io.Tables.events(spark, d).count()
    assert(total == events)
  }
}
