package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops._
import graft.QHelp._

/** Event-time window queries (SURVEY.md §2.9). */
private[graft] object QueriesTime {


  // ------------------------------------------------------- time windows

  /** q14 — tumbling 1h windows (batch event-time; §2.9). */
  private val q14 = Q(
    "q14_window_tumbling",
    (s, d) => {
      import s.implicits._
      TimeOps.tumbling(ev(s, d), "ts", "1 hour", Seq("event_type"),
          Seq(count(lit(1)).as("cnt"), round(sum($"value"), 2).as("sum_value")))
        .select($"window_start", $"event_type", $"cnt", $"sum_value")
        .orderBy($"window_start", $"event_type")
    },
    Some("""
      SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
             event_type, count(*) AS cnt, round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))


  /** q15 — sliding 1h/15min windows; each event lands in exactly 4. */
  private val q15 = Q(
    "q15_window_sliding",
    (s, d) => {
      import s.implicits._
      TimeOps.sliding(ev(s, d), "ts", "1 hour", "15 minutes", Seq.empty,
          Seq(count(lit(1)).as("cnt")))
        .select($"window_start", $"cnt")
        .orderBy($"window_start")
    },
    Some("""
      SELECT ws AS window_start, count(*) AS cnt FROM (
        SELECT CAST(floor(epoch(ts) / 900) * 900 AS BIGINT) - 900 * i.i AS ws
        FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) i) t
      GROUP BY ws ORDER BY ws"""))


  /** q16 — session windows, 30min gap, per user (§2.9). Oracle is the
    * classic gaps-and-islands rewrite; Spark's session is half-open so
    * a gap of exactly the threshold starts a new session (>=).
    */
  private val q16 = Q(
    "q16_session_window",
    (s, d) => {
      import s.implicits._
      TimeOps.session(ev(s, d), "ts", "30 minutes", Seq("user_id"),
          Seq(count(lit(1)).as("n_events"), round(sum($"value"), 2).as("sum_value")))
        .select($"user_id", $"session_start", $"n_events", $"sum_value")
        .orderBy($"user_id", $"session_start", $"n_events")
    },
    Some(sessionOracleSql(", round(sum(value), 2) AS sum_value")))

  val qs: Seq[Q] = Seq(q14, q15, q16)
}
