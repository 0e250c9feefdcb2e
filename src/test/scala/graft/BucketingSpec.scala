package graft

import org.scalatest.funsuite.AnyFunSuite

/** Proof of the co-located-join path (SURVEY.md §4 / COVERAGE scale
  * notes): both sides bucketed on the join key → the sort-merge join
  * reads pre-shuffled buckets and the plan contains NO shuffle
  * exchange. At 100 TB this is how repeated fact-fact joins amortize
  * their shuffle to write time.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    try {
      graft.io.Tables.lineitem(spark, d)
        .select($"l_orderkey", $"l_quantity")
        .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      graft.io.Tables.orders(spark, d)
        .select($"o_orderkey", $"o_totalprice")
        .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"), $"l_orderkey" === $"o_orderkey")
      // disable broadcast so the test exercises the SMJ bucket path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange hashpartitioning"),
          s"bucketed join should not shuffle:\n$plan")
        assert(joined.count() == graft.io.Tables.lineitem(spark, d).count())
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
