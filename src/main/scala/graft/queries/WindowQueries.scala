package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.EventAnalytics
import graft.sources.Tables

/** Event-time window aggregations over the `events` table — the batch
  * equivalents of the Structured Streaming surface in
  * `graft.streaming.EventStreams` (same `window`/`session_window` calls run
  * under `readStream` there; SURVEY.md §2.9 declares this the engine's
  * streaming extension).
  *
  * Oracle-parity note: events.ts is nanosecond-precision parquet; Spark
  * truncates to microseconds while DuckDB keeps TIMESTAMP_NS — so raw `ts`
  * values must never be emitted, only bucketed/derived values (window starts,
  * counts, epoch-second diffs).
  */
object WindowQueries {
  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    // Tumbling 1-hour window per event_type; window() keeps the plan
    // streaming-compatible (same expression works under readStream).
    "w1_tumbling_window" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.events
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v_total"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("v_total"))
        .orderBy("window_start", "event_type")
    }),

    // Sliding 1-hour window every 30 minutes: each event lands in 2 windows.
    "w2_sliding_window" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.events
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("v_total"))
        .select(col("w.start").as("window_start"), col("n"), col("v_total"))
        .orderBy("window_start")
    }),

    // Ranking window function: the busiest event type per 1-hour window
    // (row_number over the per-window counts, tie-broken by type name).
    "w4_window_rank" -> ((s, dir) => {
      val t = Tables(s, dir)
      val counts = t.events
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"))
      val rankW = org.apache.spark.sql.expressions.Window
        .partitionBy("window_start").orderBy(desc("n"), col("event_type"))
      counts
        .withColumn("rn", row_number().over(rankW))
        .filter(col("rn") === 1)
        .select(col("window_start"), col("event_type").as("top_event_type"), col("n"))
        .orderBy("window_start")
    }),

    // w4's hourly top-event rank routed through the native bounded-heap
    // top-k operator (k=1 per hour bucket) — the rank window's sort is
    // replaced by a streaming heap; identical rows, same oracle as w4.
    // Key-cardinality contract: keys = hour buckets, structurally bounded.
    "w8_rank_native" -> ((s, dir) => {
      val t = Tables(s, dir)
      val counts = t.events
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("event_type"), col("n"))
      graft.plans.TopKPerKey.topKPerKey(counts, Seq("window_start"),
          Seq(desc("n"), col("event_type")), 1)
        .select(col("window_start"), col("event_type").as("top_event_type"), col("n"))
        .orderBy("window_start")
    }),

    // Analytic window functions: per-customer running spend (cumulative sum
    // over a tie-broken order) and days since the previous order (lag).
    // Identical ORDER BY on both sides makes the running double sum
    // accumulate in the same sequence — bit-equal, not just close.
    "w5_lag_cumsum" -> ((s, dir) => {
      val t = Tables(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("o_custkey").orderBy(col("o_orderdate"), col("o_orderkey"))
      t.orders.select(
        col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)), 2).as("cum_spend"),
        datediff(col("o_orderdate"), lag(col("o_orderdate"), 1).over(w))
          .cast("long").as("days_since_prev"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Session windows (30-minute gap) per user, rolled up to per-user session
    // stats so the output is precision-safe.
    "w3_session_window" -> ((s, dir) => {
      val t = Tables(s, dir)
      t.events
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("session_events"))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_sessions"),
          sum("session_events").as("n_events"),
          max("session_events").as("max_session_events"))
        .orderBy("user_id")
    }),

    // ------------------------------------------------------------------ w6
    // Ordered funnel over the event log (engine extension): users whose
    // events complete view → click → purchase strictly in order. Each step
    // is a filtered keyed agg + an equi-join against the previous step's
    // ≤|users| frame — no windows over the raw log.
    "w6_funnel" -> ((s, dir) => {
      val t = Tables(s, dir)
      EventAnalytics.funnel(t.events, "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .orderBy("step")
    }),

    // ------------------------------------------------------------------ w7
    // Cohort retention (engine extension): cohort = first-activity day;
    // distinct users active per (cohort_day, day_offset).
    "w7_retention" -> ((s, dir) => {
      val t = Tables(s, dir)
      EventAnalytics.retention(t.events, "user_id", "ts")
        .select(col("cohort_day").cast("string").as("cohort_day"),
          col("day_offset").cast("long").as("day_offset"), col("users"))
        .orderBy("cohort_day", "day_offset")
    }),

    // ------------------------------------------------------------------ w8
    // Rate-anomaly detection: z-score of each hourly event count against
    // its type's distribution, flagged at |z| > 2. The analytic windows
    // run over the AGGREGATED hourly frame (|types|×|hours| rows), never
    // the raw log — at 100 TB the raw scan reduces map-side into hourly
    // partials first, and only the small hourly frame is re-partitioned by
    // type for the stats pass.
    "w8_anomaly" -> ((s, dir) => {
      val t = Tables(s, dir)
      val hourly = t.events
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("n"))
      val byType = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
      hourly
        .withColumn("z", (col("n") - avg("n").over(byType))
          / stddev_samp("n").over(byType))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum(when(abs(col("z")) > 2, 1L).otherwise(0L)).as("n_anomalies"),
          round(max("z"), 4).as("max_z"))
        .orderBy("event_type")
    }),

    // ----------------------------------------------------------------- w10
    // Path analysis: the most common 3-step event sequences across user
    // journeys — per-user lead windows (one keyed shuffle; per-user sorts
    // bounded by activity) feeding a path-count TakeOrdered top-10.
    "w10_event_paths" -> ((s, dir) => {
      val t = Tables(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t.events
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("e2", lead("event_type", 1).over(w))
        .withColumn("e3", lead("event_type", 2).over(w))
        .filter(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), col("path")).limit(10)
    }),

    // ----------------------------------------------------------------- w11
    // Conversion latency: per converting user, seconds from first view to
    // the funnel's purchase completion; reported as count + mean/min/max.
    // Reuses the funnel's per-step completion frames (≤|users| rows each).
    "w11_time_to_convert" -> ((s, dir) => {
      val t = Tables(s, dir)
      val steps = EventAnalytics.funnelSteps(t.events, "user_id", "event_type",
        "ts", Seq("view", "click", "purchase"))
      val t1 = steps.head.select(col("user_id"), col("__t").as("t_start"))
      val t3 = steps.last.select(col("user_id"), col("__t").as("t_conv"))
      t1.join(t3, "user_id")
        .select(((unix_micros(col("t_conv")) - unix_micros(col("t_start")))
          / 1e6).as("secs"))
        .agg(count(lit(1)).as("n_converted"),
          round(avg("secs"), 2).as("avg_secs"),
          round(min("secs"), 2).as("min_secs"),
          round(max("secs"), 2).as("max_secs"))
    }),

    // ----------------------------------------------------------------- w12
    // Last-touch attribution: each purchase credits the user's most recent
    // PRECEDING non-purchase event (`last(..., ignoreNulls)` over a
    // rows-bounded window ending 1 row back — the carry-forward idiom,
    // one keyed shuffle+sort, no self-join); purchases with no prior touch
    // are unattributable and drop, mirroring inner-join semantics.
    "w12_attribution" -> ((s, dir) => {
      val t = Tables(s, dir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      t.events
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
        .withColumn("touch",
          last(when(col("event_type") =!= "purchase", col("event_type")),
            ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase" && col("touch").isNotNull)
        .groupBy("touch")
        .agg(count(lit(1)).as("n_purchases"),
          round(sum("value"), 2).as("attributed_value"))
        .orderBy("touch")
    }),

    // ----------------------------------------------------------------- w13
    // Stream-stream join gate (round-11 verdict task 3): the batch twin of
    // EventStreams.attributionJoin — every click joined to the same user's
    // purchases within the following hour. The IDENTICAL DataFrame code
    // compiles under readStream with both sides watermarked and the
    // event-time range condition bounding each side's buffered state (the
    // standard watermarked stream-stream join recipe); the stream==batch
    // equivalence spec certifies the streaming wiring, this gate
    // oracle-checks the join semantics. Scale: an equi-join on user_id
    // (partitionable keyed shuffle) with the range predicate applied
    // post-match — never a time-cross-product.
    "w13_stream_join" -> ((s, dir) => {
      val t = Tables(s, dir)
      graft.streaming.EventStreams.attributionJoin(t.events)
        .orderBy("user_id", "click_id", "purchase_id")
    }),

    // ----------------------------------------------------------------- pl6
    // Composed event-analytics pipeline: sessionization + ordered funnel +
    // cohort retention + rate-anomaly detection over one event log, rolled
    // into a (section, metric, value) report — the product-analytics twin
    // of pl5's curation funnel. Every branch is an already-oracle-checked
    // shape (w3/w6/w7/w8); the pipeline verifies their composition.
    "pl6_events_pipeline" -> ((s, dir) => {
      val t = Tables(s, dir)
      val events = t.events
      def row(section: String, metric: String, agg1: DataFrame): DataFrame =
        agg1.select(lit(section).as("section"), lit(metric).as("metric"),
          col("value"))
      val funnelRows = EventAnalytics
        .funnelSteps(events, "user_id", "event_type", "ts",
          Seq("view", "click", "purchase"))
        .zipWithIndex.map { case (df, i) =>
          row("funnel", s"step${i + 1}_users", df.agg(count(lit(1)).as("value")))
        }
      val sessions = row("sessions", "n_sessions",
        events.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("value")))
      val ret = EventAnalytics.retention(events, "user_id", "ts")
      val cohorts = row("retention", "n_cohorts",
        ret.agg(countDistinct(col("cohort_day")).as("value")))
      val d7 = row("retention", "d7_users",
        ret.filter(col("day_offset") === 7)
          .agg(coalesce(sum("users"), lit(0L)).as("value")))
      val hourly = events
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("n"))
      val byType = org.apache.spark.sql.expressions.Window.partitionBy("event_type")
      val anomalies = row("anomaly", "n_anomalies",
        hourly
          .withColumn("z", (col("n") - avg("n").over(byType))
            / stddev_samp("n").over(byType))
          .agg(sum(when(abs(col("z")) > 2, 1L).otherwise(0L)).as("value")))
      (funnelRows :+ sessions :+ cohorts :+ d7 :+ anomalies)
        .reduce(_ unionByName _)
        .orderBy("section", "metric")
    }),

    // ------------------------------------------------------------------ w9
    // Time-series gap filling: a generated hour spine × observed types,
    // left-joined against hourly counts so silent hours materialize as
    // zero rows (resample semantics). The spine is TINY by construction
    // (time range ÷ granularity — here ~720 rows), so the cross join is a
    // broadcast fan-out, never data-sized; the only data-sized work is the
    // map-side-reduced hourly aggregation.
    "w9_gapfill" -> ((s, dir) => {
      val t = Tables(s, dir)
      val hourly = t.events
        .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val spine = t.events
        .agg(date_trunc("hour", min("ts")).as("h0"),
          date_trunc("hour", max("ts")).as("h1"))
        .select(explode(sequence(col("h0"), col("h1"),
          expr("interval 1 hour"))).as("h"))
      val types = t.events.select("event_type").distinct()
      spine.crossJoin(types)
        .join(hourly, Seq("h", "event_type"), "left")
        .na.fill(0L, Seq("n"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_hours"),
          sum(when(col("n") === 0, 1L).otherwise(0L)).as("n_gap_hours"),
          sum("n").as("n_events"))
        .orderBy("event_type")
    })
  )

  def oracles: Map[String, String] = Map(
    "w1_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts)::TIMESTAMP AS window_start, event_type,
         count(*) AS n, round(sum(value),2) AS v_total
         FROM events GROUP BY 1,2 ORDER BY 1,2""",
    "w2_sliding_window" ->
      """WITH slid AS (
           SELECT time_bucket(INTERVAL '1 hour', ts)::TIMESTAMP AS window_start, value FROM events
           UNION ALL
           SELECT (time_bucket(INTERVAL '1 hour', ts - INTERVAL '30 minutes') + INTERVAL '30 minutes')::TIMESTAMP AS window_start, value FROM events)
         SELECT window_start, count(*) AS n, round(sum(value),2) AS v_total
         FROM slid GROUP BY 1 ORDER BY 1""",
    "w4_window_rank" -> windowRankSql,
    // w8 selects the identical rows through the bounded-heap operator.
    "w8_rank_native" -> windowRankSql,
    "w5_lag_cumsum" ->
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING), 2) AS cum_spend,
        |  date_diff('day', lag(o_orderdate) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey), o_orderdate) AS days_since_prev
        |FROM orders ORDER BY 1, 2""".stripMargin,
    "w3_session_window" ->
      """WITH flagged AS (
           SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
           FROM events),
         sessions AS (
           SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
           FROM flagged),
         per_session AS (
           SELECT user_id, session_id, count(*) AS session_events
           FROM sessions GROUP BY 1,2)
         SELECT user_id, count(*) AS n_sessions,
           CAST(sum(session_events) AS BIGINT) AS n_events,
           max(session_events) AS max_session_events
         FROM per_session GROUP BY 1 ORDER BY 1""",
    "w6_funnel" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |  WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT 1 AS step, 'view' AS step_type, (SELECT count(*) FROM s1) AS users
        |UNION ALL
        |SELECT 2, 'click', (SELECT count(*) FROM s2)
        |UNION ALL
        |SELECT 3, 'purchase', (SELECT count(*) FROM s3)
        |ORDER BY step""".stripMargin,
    "w7_retention" ->
      """WITH cohorts AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1)
        |SELECT CAST(c.d0 AS VARCHAR) AS cohort_day,
        |  CAST(date_diff('day', c.d0, CAST(e.ts AS DATE)) AS BIGINT) AS day_offset,
        |  count(DISTINCT e.user_id) AS users
        |FROM events e JOIN cohorts c ON e.user_id = c.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "w8_anomaly" ->
      """WITH hourly AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS h, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |scored AS (
        |  SELECT event_type,
        |    (n - avg(n) OVER (PARTITION BY event_type))
        |      / stddev_samp(n) OVER (PARTITION BY event_type) AS z
        |  FROM hourly)
        |SELECT event_type, count(*) AS n_hours,
        |  CAST(sum(CASE WHEN abs(z) > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
        |  round(max(z), 4) AS max_z
        |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin,
    "w10_event_paths" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    lead(event_type, 1) OVER w AS e2,
        |    lead(event_type, 2) OVER w AS e3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
        |FROM seq WHERE e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin,
    "w11_time_to_convert" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |d AS (
        |  SELECT (epoch_us(s3.t) - epoch_us(s1.t)) / 1e6 AS secs
        |  FROM s1 JOIN s3 ON s1.user_id = s3.user_id)
        |SELECT count(*) AS n_converted, round(avg(secs), 2) AS avg_secs,
        |  round(min(secs), 2) AS min_secs, round(max(secs), 2) AS max_secs
        |FROM d""".stripMargin,
    "w12_attribution" ->
      """WITH touched AS (
        |  SELECT event_type, value,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |               IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM events)
        |SELECT touch, count(*) AS n_purchases,
        |  round(sum(value), 2) AS attributed_value
        |FROM touched WHERE event_type = 'purchase' AND touch IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "w13_stream_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |  c.ts AS click_ts, p.ts AS purchase_ts
        |FROM events c
        |JOIN events p ON p.user_id = c.user_id
        |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '1 hour'
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |ORDER BY c.user_id, click_id, purchase_id""".stripMargin,
    "pl6_events_pipeline" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
        |  WHERE e.event_type = 'click' GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
        |  WHERE e.event_type = 'purchase' GROUP BY 1),
        |flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |              >= INTERVAL '30 minutes' THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |sessions AS (
        |  SELECT user_id,
        |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                           ROWS UNBOUNDED PRECEDING) AS session_id
        |  FROM flagged),
        |sess AS (SELECT user_id, session_id FROM sessions GROUP BY 1, 2),
        |cohorts AS (
        |  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY 1),
        |ret AS (
        |  SELECT c.d0 AS cohort_day,
        |    date_diff('day', c.d0, CAST(e.ts AS DATE)) AS day_offset,
        |    count(DISTINCT e.user_id) AS users
        |  FROM events e JOIN cohorts c ON e.user_id = c.user_id
        |  GROUP BY 1, 2),
        |hourly2 AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS h, event_type,
        |    count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |scored AS (
        |  SELECT (n - avg(n) OVER (PARTITION BY event_type))
        |      / stddev_samp(n) OVER (PARTITION BY event_type) AS z
        |  FROM hourly2)
        |SELECT * FROM (
        |  SELECT 'funnel' AS section, 'step1_users' AS metric,
        |    (SELECT count(*) FROM s1) AS value
        |  UNION ALL SELECT 'funnel', 'step2_users', (SELECT count(*) FROM s2)
        |  UNION ALL SELECT 'funnel', 'step3_users', (SELECT count(*) FROM s3)
        |  UNION ALL SELECT 'sessions', 'n_sessions', (SELECT count(*) FROM sess)
        |  UNION ALL SELECT 'retention', 'n_cohorts',
        |    (SELECT count(DISTINCT cohort_day) FROM ret)
        |  UNION ALL SELECT 'retention', 'd7_users',
        |    (SELECT CAST(COALESCE(sum(users), 0) AS BIGINT) FROM ret
        |     WHERE day_offset = 7)
        |  UNION ALL SELECT 'anomaly', 'n_anomalies',
        |    (SELECT CAST(sum(CASE WHEN abs(z) > 2 THEN 1 ELSE 0 END) AS BIGINT)
        |     FROM scored)
        |) ORDER BY section, metric""".stripMargin,
    "w9_gapfill" ->
      """WITH hourly AS (
        |  SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |bounds AS (
        |  SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
        |  FROM events),
        |spine AS (
        |  SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds),
        |types AS (SELECT DISTINCT event_type FROM events),
        |filled AS (
        |  SELECT s.h, t.event_type, COALESCE(hourly.n, 0) AS n
        |  FROM spine s CROSS JOIN types t
        |  LEFT JOIN hourly ON hourly.h = s.h AND hourly.event_type = t.event_type)
        |SELECT event_type, count(*) AS n_hours,
        |  CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_hours,
        |  CAST(sum(n) AS BIGINT) AS n_events
        |FROM filled GROUP BY 1 ORDER BY 1""".stripMargin
  )

  /** Shared by w4 (window form) and w8 (native bounded-heap form): the
    * rank plan is a physical choice, the result set is the contract. */
  private def windowRankSql: String =
    """WITH counts AS (
      |  SELECT time_bucket(INTERVAL '1 hour', ts)::TIMESTAMP AS window_start,
      |    event_type, count(*) AS n
      |  FROM events GROUP BY 1,2),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY window_start
      |    ORDER BY n DESC, event_type) AS rn
      |  FROM counts)
      |SELECT window_start, event_type AS top_event_type, n
      |FROM ranked WHERE rn = 1 ORDER BY window_start""".stripMargin
}
