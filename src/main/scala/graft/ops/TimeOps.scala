package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Rolling active users — the DAU/WAU engagement report: per
    * activity day, the distinct users active that day (DAU), the
    * distinct users active in the trailing `windowDays` (WAU), and
    * the stickiness ratio DAU/WAU. Distinct-over-a-sliding-window
    * cannot be summed from daily counts (the same user spans days),
    * so each (user, day) presence row EXPANDS to the `windowDays`
    * report days it covers — a bounded ×windowDays fan-out of the
    * users×days presence table — and distinct-counts per report day.
    *
    * Scale shape: one (user, day) distinct pass over the events (the
    * only corpus-sized stage, user-keyed), then the expansion and two
    * days-sized aggregates; no windows at all. Report days are the
    * days with >= 1 event (inner join on DAU days).
    */
  def rollingActiveUsers(df: DataFrame, userCol: String, tsCol: String,
                         windowDays: Int): DataFrame = {
    require(windowDays > 0, s"rollingActiveUsers: windowDays=$windowDays")
    val presence = df.filter(col(userCol).isNotNull)
      .select(col(userCol).as("__u"), to_date(col(tsCol)).as("__day"))
      .distinct()
    val dau = presence.groupBy(col("__day").as("day"))
      .agg(count(lit(1)).as("dau"))
    val wau = presence.select(col("__u"),
        explode(sequence(col("__day"),
          date_add(col("__day"), windowDays - 1))).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .withColumn("stickiness",
        round(col("dau").cast("double") / col("wau"), 4))
  }

  /** Multi-touch attribution with linear time decay — the events
    * sibling of last-touch attribution: each conversion distributes
    * credit over the user's qualifying touchpoints (touch strictly
    * before the conversion, within the attribution window), weighted
    * by recency. The decay is LINEAR in µs — `raw = window − Δt`, an
    * exact BIGINT — so per-conversion normalization divides exact
    * integers and the weights are bit-equal in any engine (an
    * exponential decay would rank identically but sum in
    * engine-dependent float order). Weights sum to 1 per conversion
    * (touch exactly at the window edge carries raw = 0; a conversion
    * whose every touch sits on the edge yields NULL weights via
    * try_divide).
    *
    * Scale shape: one user-keyed equi-join (conversions × touches,
    * both sides hash-partition on the user — co-partitioned; the
    * trailing window bounds matches per conversion) and ONE
    * conversion-partitioned window for the normalizing sum
    * (partition = one conversion's touches, window-bounded). The
    * q85 epoch-µs comparison convention.
    *
    * Output per (conversion, touchpoint): (conv_id, touch_id,
    * touch_type, lag_us, weight).
    */
  def attributionWeights(df: DataFrame, userCol: String, tsCol: String,
                         idCol: String, typeCol: String, convType: String,
                         touchTypes: Seq[String],
                         windowHours: Int): DataFrame = {
    require(windowHours > 0,
      s"attributionWeights: windowHours=$windowHours")
    require(touchTypes.nonEmpty && !touchTypes.contains(convType),
      s"attributionWeights: touchTypes must be non-empty and exclude $convType")
    val winUs = windowHours.toLong * 3600L * 1000000L
    val conv = df.filter(col(typeCol) === convType && col(userCol).isNotNull)
      .select(col(userCol).as("__u"), col(idCol).as("conv_id"),
        unix_micros(col(tsCol)).as("__cts"))
    val touch = df
      .filter(col(typeCol).isin(touchTypes: _*) && col(userCol).isNotNull)
      .select(col(userCol).as("__u"), col(idCol).as("touch_id"),
        col(typeCol).as("touch_type"), unix_micros(col(tsCol)).as("__tts"))
    conv.join(touch, Seq("__u"))
      .filter(col("__tts") < col("__cts") &&
        col("__tts") >= col("__cts") - winUs)
      .withColumn("__raw", lit(winUs) - (col("__cts") - col("__tts")))
      .withColumn("weight", try_divide(col("__raw").cast("double"),
        sum(col("__raw")).over(Window.partitionBy(col("conv_id")))
          .cast("double")))
      .select(col("conv_id"), col("touch_id"), col("touch_type"),
        (col("__cts") - col("__tts")).as("lag_us"), col("weight"))
  }

  /** Ordered funnel analysis — the classic conversion report: how many
    * users reach step 1, then step 2 STRICTLY AFTER their first step-1
    * event, then step 3 after that, and so on. "Reach" is
    * first-occurrence semantics: a user's step-k time is the earliest
    * event of that type after their step-(k−1) reach time, so a
    * click that precedes every view does not convert.
    *
    * Scale shape: one user-keyed `min` aggregate per step, each
    * equi-joined to the previous step's (user, reach-time) table —
    * every frame after the first aggregate is users-cardinality and
    * all of them hash-partition on the user key, so the chain
    * co-partitions with no extra exchange. The event table is scanned
    * once per step, but each scan carries a pushed `event_type =`
    * filter and a 3-column projection — at 100 TB that is |steps|
    * cheap pruned scans, the right trade against the alternative
    * (one shuffle materializing every user's full sorted event array,
    * which a power-law user distribution turns into stragglers).
    * Timestamps compare as epoch-µs longs on both engine and oracle
    * (the q85/st03 precision convention). The only unpartitioned
    * window runs over |steps| rows. `withinHours` bounds each
    * conversion: step k must land within that many hours AFTER the
    * step-(k−1) reach (half-open above: > prev, <= prev + window) —
    * the standard attribution window; None means unbounded.
    *
    * Output: one row per step — (step_idx, step, n_users, pct_prev =
    * n_users / previous step's n_users, NULL for step 1).
    */
  def funnel(df: DataFrame, userCol: String, tsCol: String,
             typeCol: String, steps: Seq[String],
             withinHours: Option[Int] = None): DataFrame = {
    val wide = funnelReaches(df, userCol, tsCol, typeCol, steps, withinHours)
    // ONE 1-row aggregate over the wide reach frame (count(t_k) =
    // users who reached step k; left joins kept every step-1 user),
    // stacked to per-step rows by a bounded inline array
    val aggd = wide.agg(
      count(col("t1")).as("c1"),
      steps.indices.tail.map(i => count(col(s"t${i + 1}")).as(s"c${i + 1}")): _*)
    val counts = aggd.select(explode(array(steps.indices.map(i =>
        struct(lit(i + 1).as("step_idx"), lit(steps(i)).as("step"),
          col(s"c${i + 1}").as("n_users"))): _*)).as("s"))
      .select(col("s.step_idx"), col("s.step"), col("s.n_users"))
    // |steps| rows: the unpartitioned lag window is bounded by the
    // funnel definition, never by the data. try_divide: an empty
    // previous step yields NULL conversion, not an ANSI error.
    counts.withColumn("pct_prev",
      round(try_divide(col("n_users").cast("double"),
        lag(col("n_users"), 1).over(Window.orderBy(col("step_idx")))), 4))
  }

  /** Per-user funnel reach times — the row-level basis of [[funnel]]
    * (same step semantics): one row per user who reached step 1, with
    * `t1..tk` epoch-µs reach times (NULL once the user drops out).
    * The conversion-latency substrate: lags between consecutive
    * reach columns are exactly the time-to-convert distribution.
    *
    * Scale shape: per-step user-keyed min aggregates chained by
    * co-partitioned user equi-joins (the [[funnel]] shape), then the
    * wide frame assembles via |steps|−1 more user-keyed left joins —
    * every post-scan frame is users-cardinality and shares the user
    * hash partitioning, so the chain adds no data-sized exchanges.
    */
  def funnelReaches(df: DataFrame, userCol: String, tsCol: String,
                    typeCol: String, steps: Seq[String],
                    withinHours: Option[Int] = None): DataFrame = {
    require(steps.nonEmpty, "funnel: steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"funnel: duplicate step in ${steps.mkString(",")}")
    require(withinHours.forall(_ > 0),
      s"funnel: withinHours must be positive, got $withinHours")
    // NULL users cannot funnel (every later step inner-joins on the
    // user key); filtering them HERE also unifies the step-1 subtree
    // across its two plantings — the wide frame's root and the
    // step-2 chain otherwise infer different isnotnull(user) filters
    // and the step-1 scan+aggregate plans twice (the trendingTerms
    // inference lesson, plan-verified)
    val e = df.filter(col(userCol).isNotNull)
      .select(col(userCol).as("__u"), col(typeCol).as("__t"),
        unix_micros(col(tsCol)).as("__us"))
    val first = e.filter(col("__t") === steps.head)
      .groupBy(col("__u")).agg(min(col("__us")).as("__reach"))
    val bound: Column => Column = prev => withinHours match {
      case Some(hrs) => col("__us") > prev &&
        col("__us") <= prev + lit(hrs.toLong * 3600L * 1000000L)
      case None => col("__us") > prev
    }
    val reaches = steps.tail.scanLeft(first) { (prev, step) =>
      e.filter(col("__t") === step)
        .join(prev.select(col("__u"), col("__reach").as("__p")), "__u")
        .filter(bound(col("__p")))
        .groupBy(col("__u")).agg(min(col("__us")).as("__reach"))
    }
    val named = reaches.zipWithIndex.map { case (r, i) =>
      r.select(col("__u"), col("__reach").as(s"t${i + 1}")) }
    named.reduce((a, b) => a.join(b, Seq("__u"), "left"))
      .withColumnRenamed("__u", userCol)
  }

  /** Next-event transition matrix — P(next event type | event type)
    * from each user's time-ordered event stream (the Markov-chain
    * view of product analytics; also the sanity check behind
    * "sessions end in errors more often after X").
    *
    * Scale shape: ONE user-partitioned window (`lead` over the
    * per-user sort — partition size is a user's own event count,
    * never the corpus), then a types²-bounded aggregate and a
    * types-partitioned share window over that tiny frame. Ordering
    * ties break on `tieCol` (the event id) so the successor of two
    * same-µs events is deterministic in any engine. NULL users are
    * dropped up front (matching funnelReaches/rollingActiveUsers/
    * attributionWeights): "the successor of an anonymous event" has
    * no Markov meaning, and without the filter all NULL-user rows
    * would form ONE window partition — fabricated transitions AND a
    * potentially corpus-sized partition that breaks the scale shape
    * above.
    *
    * Output: (from_type, to_type, n_trans, pct_from) — pct_from is
    * the row-normalized transition probability, rounded to 4.
    */
  def transitionMatrix(df: DataFrame, userCol: String, tsCol: String,
                       tieCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val counts = df
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol))
      .filter(col(userCol).isNotNull)
      .withColumn("__next", lead(col(typeCol), 1).over(w))
      .filter(col("__next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("__next").as("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    counts.withColumn("pct_from",
      round(col("n_trans").cast("double") /
        sum(col("n_trans")).over(Window.partitionBy(col("from_type"))), 4))
  }

  /** Rolling z-score anomaly detection on event rates — the
    * monitoring gate between pipeline runs ("did the click rate
    * spike?"), sibling of `LibOps.psiReport` (distribution drift) but
    * over TIME: hourly event counts per type on a dense hour spine,
    * each hour scored against the mean/std of its own trailing
    * `trailing`-hour window.
    *
    * Scale shape: one partial-aggregated (type, hour) count pass over
    * the events — the ONLY corpus-sized stage; the spine (types ×
    * `nHours` rows, a time-range constant) joins to it and every
    * window after is partitioned by type over spine rows. The spine
    * is dense (missing hours count 0) so the ROWS frame really is
    * trailing wall-clock hours. Mean/std derive from exact BIGINT
    * window sums (Σcnt, Σcnt² — order-free, unlike a windowed DOUBLE
    * sum whose addition order differs between engines), with the
    * float formula applied identically on engine and oracle; exact
    * up to per-hour counts of ~6×10⁸ (cnt²·trailing < 2⁶³), far
    * above any real per-hour rate; `s1·s1` needs Σcnt < ~3×10⁹ (its
    * square < 2⁶³), the binding bound. A zero-variance lookback is
    * detected by the EXACT integer identity trailing·s2 = s1² — not
    * by the float `varr` reaching 0.0, which for per-hour means above
    * ~4×10⁶ (s1² > 2⁵³) can cancel to a small negative, turning
    * sqrt into NaN and `NaN > thresh` into TRUE in Spark — and yields
    * NULL z, which reports non-anomalous; the residual float varr is
    * clamped at 0 as a second belt.
    *
    * Output: one row per (event_type, h) with h >= trailing —
    * (event_type, h, cnt, z rounded to 4, is_anomaly).
    */
  def rateAnomaly(df: DataFrame, tsCol: String, typeCol: String,
                  startTs: String, nHours: Int, trailing: Int,
                  zThresh: Double): DataFrame = {
    require(nHours > 0 && trailing > 0 && trailing < nHours,
      s"rateAnomaly: need 0 < trailing < nHours, got $trailing/$nHours")
    val HourUs = 3600L * 1000000L
    val startUs = unix_micros(to_timestamp(lit(startTs)))
    val h = expr(s"(unix_micros(`$tsCol`) - unix_micros(to_timestamp('$startTs'))) div ${HourUs}L")
    val counts = df
      // bound on raw µs, NOT on h: `div` truncates toward zero, so a
      // pre-start event inside the first hour would otherwise land in
      // h = 0 (and floor-dividing engines would disagree on negatives)
      // explicit NULL-type filter: the dense left join below infers
      // isnotnull on its build side's key but not on the spine's
      // planting of this same aggregate — without the shared explicit
      // filter the two subtrees differ and the count pass plans twice
      // (the trendingTerms lesson)
      .filter(col(typeCol).isNotNull &&
        unix_micros(col(tsCol)) >= startUs &&
        unix_micros(col(tsCol)) < startUs + lit(nHours.toLong * HourUs))
      .groupBy(col(typeCol).as("event_type"), h.cast("int").as("h"))
      .agg(count(lit(1)).as("cnt"))
    // dense spine WITHOUT a second corpus scan: the sparse (type,
    // hour) counts roll up to one nHours-bounded map per type (event
    // types are domain-bounded; a distinct-types spine + left join
    // would re-scan the corpus — Catalyst collapses Distinct-over-
    // Aggregate straight onto the scan, plan-verified), and the dense
    // hour axis explodes from a transform over that map: missing
    // hours emit 0. A type with zero in-range events has no rate to
    // monitor and is absent, matching the oracle's spine-from-counts.
    val perType = counts.groupBy(col("event_type"))
      .agg(map_from_arrays(collect_list(col("h")),
        collect_list(col("cnt"))).as("__m"))
    val dense = perType
      .select(col("event_type"),
        posexplode(transform(sequence(lit(0), lit(nHours - 1)),
          i => coalesce(element_at(col("__m"), i), lit(0L)))))
      .select(col("event_type"), col("pos").cast("int").as("h"),
        col("col").as("cnt"))
    // the window reuses the per-type hash partitioning the map rollup
    // just established — no further exchange
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(-trailing, -1)
    val scored = dense
      .withColumn("s1", sum(col("cnt")).over(w))
      .withColumn("s2", sum(col("cnt") * col("cnt")).over(w))
      .filter(col("h") >= trailing)
    val n = lit(trailing.toDouble)
    val m = col("s1").cast("double") / n
    val varr = (col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double") / n) / n
    // exact integer zero-variance gate (the oracle's predicate):
    // trailing·Σcnt² = (Σcnt)² ⟺ all trailing counts equal
    val zeroVar = lit(trailing.toLong) * col("s2") === col("s1") * col("s1")
    val z = when(zeroVar, lit(null).cast("double"))
      .otherwise(try_divide(col("cnt").cast("double") - m,
        sqrt(greatest(varr, lit(0.0)))))
    scored
      .withColumn("z", z)
      .select(col("event_type"), col("h"), col("cnt"),
        round(col("z"), 4).as("z"),
        coalesce(abs(col("z")) > zThresh, lit(false)).as("is_anomaly"))
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
