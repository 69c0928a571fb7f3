package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Kernel
import graft.operators.SessionEncoder

/** Sessionization queries over the `events` table. */
object SessionQueries {

  private def t(s: SparkSession, dir: String, n: String) = Kernel.table(s, dir, n)

  val GapSeconds = 1800.0 // 30 min

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-entity session index — the 100 TB shape (no global ordering)
    "q_sessionize" -> ((s, dir) =>
      SessionEncoder.transform(t(s, dir, "events"), Seq("user_id"), "ts", GapSeconds)
        .select(col("event_id"), col("user_id"), col("session_id"))),

    // reference-parity global session numbering (verify-scale only)
    "q_sessionize_global" -> ((s, dir) =>
      SessionEncoder.globalSessionId(t(s, dir, "events"), Seq("user_id"), "ts", GapSeconds)
        .select(col("event_id"), col("user_id"), col("session_id"))),

    // as-of join: each click enriched with the latest error AT-OR-BEFORE
    // its timestamp for the same user — the point-in-time-correct
    // training join; one union-window pass, verified against DuckDB's
    // NATIVE ASOF LEFT JOIN
    "q_asof_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.AsofJoin.asof(
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts")),
        ev.filter(col("event_type") === "error"),
        on = Seq("user_id"), tsCol = "ts",
        payload = Seq("event_id" -> "ref_event_id", "value" -> "ref_value"),
        rightTie = Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("ref_event_id"),
          col("ref_value"))
    }),

    // forward direction: each click joined to the EARLIEST error
    // at-or-after (pandas merge_asof direction='forward'); DuckDB's
    // ASOF JOIN with the inequality flipped is the reference
    "q_asof_forward" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.AsofJoin.asof(
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts")),
        ev.filter(col("event_type") === "error"),
        on = Seq("user_id"), tsCol = "ts",
        payload = Seq("event_id" -> "ref_event_id"),
        rightTie = Seq("event_id"), direction = "forward")
        .select(col("event_id"), col("user_id"), col("ref_event_id"))
    }),

    // tolerance: matches staler than 24h read as NO match (merge_asof
    // tolerance semantics) — 24h is binding on this fixture (median
    // match gap ~36h, so a large share of matches must null out)
    "q_asof_tolerance" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.AsofJoin.asof(
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts")),
        ev.filter(col("event_type") === "error"),
        on = Seq("user_id"), tsCol = "ts",
        payload = Seq("event_id" -> "ref_event_id", "value" -> "ref_value"),
        rightTie = Seq("event_id"), toleranceUs = Some(86400000000L))
        .select(col("event_id"), col("user_id"), col("ref_event_id"),
          col("ref_value"))
    }),

    // trailing-window rolling features: count + decimal-routed value sum
    // over the last 6h per user AS OF each event (RANGE frame ends at the
    // current row — point-in-time correct, no future leakage)
    "q_rolling" -> ((s, dir) =>
      graft.operators.TimeFeatures.rolling(
        t(s, dir, "events"), Seq("user_id"), "ts", windowUs = 21600000000L,
        aggs = Seq(
          "roll_n" -> count(lit(1)),
          "roll_sum" -> sum(col("value")
            .cast(org.apache.spark.sql.types.DecimalType(12, 2)))))
        .select(col("event_id"), col("user_id"), col("roll_n"),
          col("roll_sum")
            .cast(org.apache.spark.sql.types.DoubleType).as("roll_sum"))),

    // fixed 24h-bucket resampling per user (timestamps surfaced as epoch
    // micros — cross-engine timestamp transport stays integer)
    "q_resample" -> ((s, dir) =>
      graft.operators.TimeFeatures.resample(
        t(s, dir, "events"), Seq("user_id"), "ts",
        bucketUs = 86400000000L, valueCol = "value")
        .select(col("user_id"),
          unix_micros(col("bucket_start")).as("bucket_us"),
          col("n_events"), col("value_sum"),
          unix_micros(col("first_ts")).as("first_us"),
          unix_micros(col("last_ts")).as("last_us"))),

    // inter-arrival features (r8): per-key gap + event index
    "q_inter_arrival" -> ((s, dir) =>
      graft.operators.TimeFeatures.interArrival(
        t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts")),
        Seq("user_id"), "ts", Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("gap_us"),
          col("event_seq"))),

    // per-key forward fill (r9): clicks' values nulled deterministically,
    // then repaired from each user's most recent non-null observation
    "q_fill_forward" -> ((s, dir) =>
      graft.operators.TimeFeatures.fillForward(
        t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts"),
          col("event_type"),
          when(col("event_type") === "click", lit(null))
            .otherwise(col("value")).as("value")),
        Seq("user_id"), "ts", Seq("event_id"), Seq("value"))
        .select(col("event_id"), col("user_id"), col("value"),
          col("value_ffill"))),

    // per-key lag features (r9): the autoregressive block, lags 1 and 3
    "q_lag_features" -> ((s, dir) =>
      graft.operators.TimeFeatures.lagFeatures(
        t(s, dir, "events").select(col("event_id"), col("user_id"),
          col("ts"), col("value")),
        Seq("user_id"), "ts", Seq("event_id"), "value", Seq(1, 3))
        .select(col("event_id"), col("user_id"), col("value_lag_1"),
          col("value_lag_3"))),

    // nearest-direction as-of (r8): closest error event either side of
    // each click, ties toward backward (pandas merge_asof nearest)
    "q_asof_nearest" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      graft.operators.AsofJoin.asof(
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts")),
        ev.filter(col("event_type") === "error"),
        on = Seq("user_id"), tsCol = "ts",
        payload = Seq("event_id" -> "ref_event_id"),
        rightTie = Seq("event_id"), direction = "nearest")
        .select(col("event_id"), col("user_id"), col("ref_event_id"))
    }),

    // per-group z-score (r8): group moments via one DECIMAL-routed
    // aggregate joined back (no window sort); zero-variance groups emit 0
    "q_group_zscore" -> ((s, dir) =>
      graft.operators.GroupNormalize.zscore(
        t(s, dir, "events").select(col("event_id"), col("user_id"),
          col("value")), Seq("user_id"), "value")
        .select(col("event_id"), col("user_id"), round(col("z"), 6).as("z"))),

    // per-key EWMA (r8): the order-dependent fold as a running-frame
    // window aggregate (functions.Ewma); (ts, event_id) total order, null
    // values excluded up front so both engines fold the same sequence —
    // the oracle replays the IDENTICAL recurrence with list_reduce over
    // per-row prefix lists, so the doubles are bit-identical pre-round
    "q_ewma" -> ((s, dir) => {
      val ev = t(s, dir, "events").filter(col("value").isNotNull)
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      // NO rounding: the stream fold is replayed bit-identically by the
      // oracle (same IEEE ops in the same order), and round() itself is
      // the cross-engine hazard — Spark rounds the shortest decimal repr,
      // DuckDB the binary double, which disagree exactly AT .5 boundaries
      // (6 of 100k rows at sf0.1). Raw doubles compare exactly.
      graft.operators.TimeFeatures.ewma(ev, Seq("user_id"), "ts",
          Seq("event_id"), "value", alpha = 0.3)
        .select(col("event_id"), col("user_id"), col("ewma"))
    }),

    // session-level rollup: events per session, duration, value sum
    "q_session_stats" -> ((s, dir) => {
      val sess = SessionEncoder.transform(t(s, dir, "events"), Seq("user_id"), "ts", GapSeconds)
      sess.groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
          (unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
            .as("duration_us"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
            .cast(org.apache.spark.sql.types.DoubleType).as("value_sum"))
    })
  )

  private val boundarySql =
    s"""SELECT event_id, user_id, ts, value,
       |  CASE WHEN lag(ts) OVER w IS NULL
       |    OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
       |       > ${(GapSeconds * 1e6).toLong}
       |    THEN 1 ELSE 0 END AS boundary
       |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)""".stripMargin

  val oracle: Map[String, String] = Map(
    // DuckDB's native ASOF LEFT JOIN is the reference semantics. ASOF
    // leaves ties on (user_id, ts) among right rows UNDEFINED, while the
    // Spark operator deterministically keeps the max rightTie (event_id) —
    // so the right CTEs pre-dedupe to the max event_id per (user_id, ts),
    // which is a no-op when the fixture has no tied error timestamps and
    // pins the tie semantics when it does (ADVICE r7).
    "q_asof_join" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |r AS (SELECT event_id, user_id, ts, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'error') WHERE rn = 1)
        |SELECT l.event_id, l.user_id,
        |  r.event_id AS ref_event_id, r.value AS ref_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin,

    "q_inter_arrival" ->
      """SELECT event_id, user_id,
        |  epoch_us(CAST(ts AS TIMESTAMP))
        |    - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us,
        |  CAST(row_number() OVER w AS BIGINT) AS event_seq
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    "q_fill_forward" ->
      """SELECT event_id, user_id,
        |  CASE WHEN event_type = 'click' THEN NULL ELSE value END AS value,
        |  last_value(CASE WHEN event_type = 'click' THEN NULL ELSE value END
        |    IGNORE NULLS) OVER w AS value_ffill
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_lag_features" ->
      """SELECT event_id, user_id,
        |  lag(value, 1) OVER w AS value_lag_1,
        |  lag(value, 3) OVER w AS value_lag_3
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin,

    // nearest = closer of the two deduped one-sided ASOF matches, ties
    // toward backward; backward dedupes tied rights to MAX event_id and
    // forward to MIN (each frame's deterministic end in the operator)
    "q_asof_nearest" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |rb AS (SELECT event_id, user_id, ts FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'error') WHERE rn = 1),
        |rf AS (SELECT event_id, user_id, ts FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id ASC) AS rn
        |    FROM events WHERE event_type = 'error') WHERE rn = 1),
        |b AS (SELECT l.event_id, l.user_id, l.ts AS lts,
        |    r.ts AS bts, r.event_id AS bid
        |  FROM l ASOF LEFT JOIN rb r
        |    ON l.user_id = r.user_id AND l.ts >= r.ts),
        |f AS (SELECT l.event_id, r.ts AS fts, r.event_id AS fid
        |  FROM l ASOF LEFT JOIN rf r
        |    ON l.user_id = r.user_id AND l.ts <= r.ts)
        |SELECT b.event_id, b.user_id,
        |  CASE WHEN bts IS NOT NULL AND (fts IS NULL
        |      OR epoch_us(CAST(lts AS TIMESTAMP)) - epoch_us(CAST(bts AS TIMESTAMP))
        |        <= epoch_us(CAST(fts AS TIMESTAMP)) - epoch_us(CAST(lts AS TIMESTAMP)))
        |    THEN bid
        |    WHEN fts IS NOT NULL THEN fid END AS ref_event_id
        |FROM b JOIN f USING (event_id)""".stripMargin,

    "q_group_zscore" ->
      """WITH st AS (SELECT user_id AS k, count(value) AS n,
        |    CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sx,
        |    CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
        |      AS DOUBLE) AS sxx
        |  FROM events GROUP BY 1)
        |SELECT e.event_id, e.user_id,
        |  round(CASE WHEN e.value IS NULL THEN NULL
        |    WHEN st.n <= 1
        |      OR sqrt(greatest((sxx - sx * sx / n) / (n - 1.0), 0.0)) <= 0.0
        |      THEN 0.0
        |    ELSE (e.value - sx / n)
        |      / sqrt(greatest((sxx - sx * sx / n) / (n - 1.0), 0.0))
        |  END, 6) AS z
        |FROM events e JOIN st ON e.user_id IS NOT DISTINCT FROM st.k""".stripMargin,

    "q_ewma" ->
      """WITH e AS (SELECT event_id, user_id, ts, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_id, user_id,
        |  list_reduce(pre, (acc, x) -> acc * (1.0 - 0.3) + x * 0.3) AS ewma
        |FROM (SELECT event_id, user_id,
        |    list(v) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre
        |  FROM e)""".stripMargin,

    "q_rolling" ->
      """SELECT event_id, user_id,
        |  CAST(count(*) OVER w AS BIGINT) AS roll_n,
        |  CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS roll_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
        |  RANGE BETWEEN 21600000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_resample" ->
      """WITH b AS (SELECT user_id, ts, value,
        |    CAST(floor(epoch_us(CAST(ts AS TIMESTAMP)) / 86400000000) AS BIGINT) AS bk
        |  FROM events)
        |SELECT user_id, bk * 86400000000 AS bucket_us,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE), 2) AS value_sum,
        |  min(epoch_us(CAST(ts AS TIMESTAMP))) AS first_us,
        |  max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us
        |FROM b GROUP BY user_id, bk""".stripMargin,

    "q_asof_forward" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |r AS (SELECT event_id, user_id, ts FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'error') WHERE rn = 1)
        |SELECT l.event_id, l.user_id, r.event_id AS ref_event_id
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts <= r.ts""".stripMargin,

    "q_asof_tolerance" ->
      """WITH l AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'click'),
        |r AS (SELECT event_id, user_id, ts, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, ts
        |      ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'error') WHERE rn = 1),
        |j AS (
        |  SELECT l.event_id, l.user_id, l.ts AS lts, r.ts AS rts,
        |    r.event_id AS ref_event_id, r.value AS ref_value
        |  FROM l ASOF LEFT JOIN r
        |    ON l.user_id = r.user_id AND l.ts >= r.ts)
        |SELECT event_id, user_id,
        |  CASE WHEN epoch_us(CAST(lts AS TIMESTAMP)) - epoch_us(CAST(rts AS TIMESTAMP))
        |         <= 86400000000 THEN ref_event_id END AS ref_event_id,
        |  CASE WHEN epoch_us(CAST(lts AS TIMESTAMP)) - epoch_us(CAST(rts AS TIMESTAMP))
        |         <= 86400000000 THEN ref_value END AS ref_value
        |FROM j""".stripMargin,

    "q_sessionize" ->
      s"""WITH b AS ($boundarySql)
         |SELECT event_id, user_id,
         |  CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
         |FROM b""".stripMargin,

    "q_sessionize_global" ->
      s"""WITH b AS ($boundarySql),
         |s AS (
         |  SELECT event_id, user_id,
         |    CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS local
         |  FROM b)
         |SELECT event_id, user_id,
         |  dense_rank() OVER (ORDER BY user_id, local) - 1 AS session_id
         |FROM s""".stripMargin,

    "q_session_stats" ->
      s"""WITH b AS ($boundarySql),
         |s AS (
         |  SELECT event_id, user_id, ts, value,
         |    CAST(sum(boundary) OVER (PARTITION BY user_id ORDER BY ts
         |      ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
         |  FROM b)
         |SELECT user_id, session_id, count(*) AS n_events,
         |  epoch_us(CAST(max(ts) AS TIMESTAMP)) - epoch_us(CAST(min(ts) AS TIMESTAMP))
         |    AS duration_us,
         |  CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
         |FROM s GROUP BY user_id, session_id""".stripMargin
  )
}
