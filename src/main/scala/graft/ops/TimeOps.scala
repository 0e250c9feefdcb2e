package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time windowing (SURVEY.md §2.9). The reference has no
  * event-time concept at all ("Hadoop Streaming" is a pipe protocol) —
  * this is capability superset, expressed with Catalyst's native
  * `window`/`session_window` expressions, which work identically in
  * batch and Structured Streaming, so the same query can later be run
  * with `readStream` + `withWatermark` unchanged.
  *
  * Window starts are emitted as epoch-second longs: parquet carries ns
  * timestamps, Spark µs — a raw timestamp column would never
  * hash-match the oracle (FIXTURES.md §C).
  */
object TimeOps {

  def tumbling(df: DataFrame, ts: String, width: String, extraKeys: Seq[String],
               aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(ts), width) +: extraKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start").cast("long"))
      .drop("window")

  def sliding(df: DataFrame, ts: String, width: String, slide: String,
              extraKeys: Seq[String], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(ts), width, slide) +: extraKeys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start").cast("long"))
      .drop("window")

  /** Session windows: gap-merged per key. A new session starts when the
    * gap to the previous event is >= `gap` (Spark's session end is
    * last-event-ts + gap, half-open).
    */
  def session(df: DataFrame, ts: String, gap: String, keys: Seq[String],
              aggs: Seq[Column]): DataFrame =
    df.groupBy(session_window(col(ts), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start").cast("long"))
      .drop("session_window")

  /** Weekly cohort-retention matrix — the classic activity analysis
    * (cohort = ISO week of a user's FIRST event; one row per
    * (cohort_week, week_offset) with the active-user count and the
    * retention percentage against the cohort's own week-0 size).
    *
    * Scale shape: a per-user min aggregate (user-cardinality rows,
    * partial-aggregated) and a (user, week) distinct — both shuffle on
    * the user key, so the join between them co-partitions with no
    * extra exchange; everything after runs over cohort×offset rows
    * (weeks², tiny) — the week-0 size comes from a window PARTITIONED
    * BY cohort over that tiny frame, so the user-level subtree appears
    * in the plan exactly once (a filter-and-rejoin formulation plants
    * it twice). The raw event stream is never joined — only its two
    * user-level reductions. Offsets divide day-diffs of
    * week-truncated dates by 7, exact integers in any engine.
    */
  def retentionCohorts(df: DataFrame, userCol: String,
                       ts: String): DataFrame = {
    Seq("cohort_week", "activity_week", "week_offset", "n_active",
        "pct_retained", "__cohort_n").foreach(c =>
      require(!df.columns.contains(c),
        s"retentionCohorts: input already has a $c column"))
    val week = date_trunc("week", col(ts)).cast("date")
    val firsts = df.groupBy(col(userCol))
      .agg(min(week).as("cohort_week"))
    val activity = df.select(col(userCol), week.as("activity_week"))
      .distinct()
    val counts = activity.join(firsts, userCol)
      .withColumn("week_offset",
        (datediff(col("activity_week"), col("cohort_week")) / lit(7))
          .cast("int"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    val cohortN = max(when(col("week_offset") === 0, col("n_active")))
      .over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("cohort_week")))
    counts
      .withColumn("pct_retained",
        round(col("n_active").cast("double") / cohortN * 100.0, 4))
  }

  /** Point-in-time-correct feature assembly — the feature-store join
    * that builds a training set WITHOUT label leakage: each label row
    * (user, label time) aggregates that user's events STRICTLY BEFORE
    * the label time within a trailing `windowHours` window. The
    * strict `<` is the whole point — an `<=` (or a naive per-user
    * join with no time bound) trains on the label itself, the classic
    * leakage bug this operator makes structurally impossible.
    *
    * Scale shape: an equi-join on the user key (both sides hash-
    * partition on user — co-partitioned, sort-merge; with a
    * user-bucketed layout, q57's shape, the shuffle disappears) with
    * the time range as an in-join residual; the trailing window
    * bounds matched rows per label. Never a cartesian, never a
    * corpus-wide window. Sums run in DECIMAL so partial order cannot
    * flip a rounding boundary (the q59 practice); label times emit as
    * epoch-second longs (the §2.9 convention).
    *
    * Output: one row per label — (labelIdCol, userCol, ts_s, n_prior,
    * sum_prior); labels with no prior events keep n_prior = 0,
    * sum_prior = 0.0 (left join).
    */
  def pointInTimeFeatures(labels: DataFrame, events: DataFrame,
                          userCol: String, tsCol: String, valueCol: String,
                          labelIdCol: String, windowHours: Int): DataFrame = {
    require(windowHours > 0, s"pointInTimeFeatures: windowHours=$windowHours")
    val l = labels.select(col(labelIdCol).as("label_id"),
      col(userCol).as("__u"), col(tsCol).as("__lts"))
    val f = events.select(col(userCol).as("__fu"),
      col(tsCol).as("__fts"), col(valueCol).as("__fv"))
    val win = expr(s"INTERVAL $windowHours HOURS")
    l.join(f, col("__u") === col("__fu") &&
        col("__fts") < col("__lts") && col("__fts") >= col("__lts") - win,
        "left")
      .groupBy(col("label_id"), col("__u"), col("__lts"))
      .agg(count(col("__fts")).as("n_prior"),
        coalesce(round(sum(col("__fv").cast("decimal(18,6)")), 2)
          .cast("double"), lit(0.0)).as("sum_prior"))
      .select(col("label_id"), col("__u").as(userCol),
        col("__lts").cast("long").as("ts_s"), col("n_prior"),
        col("sum_prior"))
  }
}
