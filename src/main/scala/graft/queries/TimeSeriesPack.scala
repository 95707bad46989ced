package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.features.WindowOps._
import graft.queries.Rx.{r4, r6}
import graft.regimes.Transitions

/** Time-series window operators over the `events` panel
  * (SURVEY §2.5 W1-W8, W12-W14, W17; §2.4 G5, G7).
  *
  * `events` stands in for the reference's (symbol, timestamp) OHLCV panel
  * (FIXTURES.md §2): partition key = `user_id`, order = event time,
  * value column = `value`.
  *
  * Scale design: every query is one shuffle on the partition key followed
  * by per-partition sorts — the canonical window spec is shared so
  * Catalyst collapses all frames into a single Window physical node.
  * Event time surfaces as `unix_micros` bigints (ns-precision parquet is
  * truncated to µs on read; the oracle uses `epoch_us` to match), and
  * orderings tie-break on `event_id` for cross-engine determinism.
  */
object TimeSeriesPack extends QueryPack {

  /** Shared projection: events + µs event time. */
  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("t", unix_micros(col("ts")))

  private val OracleEv =
    "SELECT event_id, epoch_us(ts) AS t, user_id, event_type, value FROM events"

  private val OracleWin =
    "WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)"

  def queries: Seq[Q] = Seq(

    // W1/W3: pct_change(1) + diff(1) per user (utils.py:20, lstm_forecasting.py:60).
    Q("w1_returns",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        ev(s, dir)
          .withColumn("ret", r6($"value" / nullif(lag($"value", 1).over(w), lit(0.0)) - 1.0))
          .withColumn("dv", r6(diff($"value", w)))
          .select($"user_id", $"event_id", $"t", $"ret", $"dv")
      },
      Some(s"""WITH e AS ($OracleEv)
              |SELECT user_id, event_id, t,
              |  round(value / nullif(lag(value, 1) OVER w, 0) - 1 + 1e-9, 6) AS ret,
              |  round(value - lag(value, 1) OVER w + 1e-9, 6) AS dv
              |FROM e $OracleWin""".stripMargin)),

    // W2: k-row momentum, k ∈ {24, 168} (utils.py:22, market_analysis.py:266-267).
    Q("w2_momentum",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        ev(s, dir)
          .withColumn("mom24", r6(pctChange(nullif($"value", lit(0.0)), 24, w)))
          .withColumn("mom168", r6(pctChange(nullif($"value", lit(0.0)), 168, w)))
          .select($"user_id", $"event_id", $"t", $"mom24", $"mom168")
      },
      Some(s"""WITH e AS ($OracleEv)
              |SELECT user_id, event_id, t,
              |  round(nullif(value, 0) / lag(nullif(value, 0), 24) OVER w - 1 + 1e-9, 6) AS mom24,
              |  round(nullif(value, 0) / lag(nullif(value, 0), 168) OVER w - 1 + 1e-9, 6) AS mom168
              |FROM e $OracleWin""".stripMargin)),

    // W4/W5: trailing rolling mean/std, min_periods=1 and pandas-strict
    // min_periods=k variants (short_term.py:40-41).
    Q("w4_rolling",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        ev(s, dir)
          .withColumn("ma24", r4(rollMean($"value", 24, w)))
          .withColumn("sd24", r4(rollStd($"value", 24, w)))
          .withColumn("ma24_strict", r4(rollMeanStrict($"value", 24, w)))
          .select($"user_id", $"event_id", $"t", $"ma24", $"sd24", $"ma24_strict")
      },
      Some(s"""WITH e AS ($OracleEv)
              |SELECT user_id, event_id, t,
              |  round(avg(value) OVER w24 + 1e-9, 4) AS ma24,
              |  round(stddev_samp(value) OVER w24 + 1e-9, 4) AS sd24,
              |  round(CASE WHEN count(value) OVER w24 >= 24
              |        THEN avg(value) OVER w24 END + 1e-9, 4) AS ma24_strict
              |FROM e
              |WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id),
              |  w24 AS (PARTITION BY user_id ORDER BY t, event_id
              |          ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)""".stripMargin)),

    // W7/W8: value ratio to trailing mean + trend strength (short_term.py:42-45).
    Q("w7_ratio_trend",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        val ret = col("value") / nullif(lag(col("value"), 1).over(w), lit(0.0)) - 1.0
        ev(s, dir)
          .withColumn("vratio24", r4(ratioToRollMean($"value", 24, w)))
          .withColumn("ret", ret)
          .withColumn("trend24", r4(trendStrength($"ret", 24, w)))
          .select($"user_id", $"event_id", $"t", $"vratio24", $"trend24")
      },
      Some(s"""WITH e AS ($OracleEv),
              |r AS (
              |  SELECT user_id, event_id, t, value,
              |    value / nullif(lag(value, 1) OVER w, 0) - 1 AS ret
              |  FROM e $OracleWin)
              |SELECT user_id, event_id, t,
              |  round(value / nullif(avg(value) OVER w24, 0) + 1e-9, 4) AS vratio24,
              |  round(abs(avg(sign(ret)) OVER w24) + 1e-9, 4) AS trend24
              |FROM r
              |WINDOW w24 AS (PARTITION BY user_id ORDER BY t, event_id
              |               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)""".stripMargin)),

    // Time-RANGE frame (engine completeness): trailing 24 h by actual
    // event time, not row count — the correct frame for irregular
    // series (the reference's hourly grid lets it use row frames;
    // events are irregular, so both variants matter). Since round 10
    // the query computes the feature for a DATE SLICE the way a
    // backfill job would: read slice + 24 h lookback from the
    // date-partitioned layout (the `day` predicate is directory-level
    // PartitionFilters pruning — with p2 the second query proving the
    // layout; the raw µs predicate still prunes row groups inside
    // boundary days), window over that bounded input, keep only the
    // slice. Every kept row's trailing frame lies inside the lookback,
    // so results equal the unbounded computation restricted to the
    // slice — which is exactly what the oracle replays.
    Q("w4b_time_range",
      (s, dir) => {
        import s.implicits._
        import graft.io.EventsLayout
        val loUs = 1704844800000000L // 2024-01-10 UTC
        val hiUs = 1705708800000000L // 2024-01-20 UTC
        val lbUs = loUs - 86400000000L // slice minus the 24 h frame
        val w = Window.partitionBy($"user_id").orderBy($"t")
          .rangeBetween(-86400000000L, 0) // 24 h in µs
        EventsLayout.read(s, dir)
          .filter($"day" >= lit(EventsLayout.dayOfUs(lbUs)) &&
                  $"day" < lit(EventsLayout.dayOfUs(hiUs)))
          .filter($"ts" >= lbUs && $"ts" < hiUs)
          .withColumn("t", $"ts")
          .withColumn("ma_24h", r4(avg($"value").over(w)))
          .withColumn("n_24h", count(lit(1)).over(w))
          .filter($"t" >= loUs)
          .select($"user_id", $"event_id", $"t", $"ma_24h", $"n_24h")
      },
      Some("""WITH e AS (
              |  SELECT event_id, epoch_us(ts) AS t, user_id, value
              |  FROM events
              |  WHERE epoch_us(ts) >= 1704844800000000 - 86400000000
              |    AND epoch_us(ts) < 1705708800000000),
              |win AS (
              |  SELECT user_id, event_id, t,
              |    round(avg(value) OVER w24 + 1e-9, 4) AS ma_24h,
              |    count(*) OVER w24 AS n_24h
              |  FROM e
              |  WINDOW w24 AS (PARTITION BY user_id ORDER BY t
              |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW))
              |SELECT user_id, event_id, t, ma_24h, n_24h
              |FROM win WHERE t >= 1704844800000000""".stripMargin)),

    // W17: forward/backward fill through engineered nulls
    // (lstm_forecasting.py:108 ffill().bfill()).
    Q("w17_fill",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        ev(s, dir)
          .withColumn("v_sparse", when($"event_type" === "view", $"value"))
          .withColumn("v_filled",
            r6(coalesce(ffill($"v_sparse", w), bfill($"v_sparse", w))))
          .select($"user_id", $"event_id", $"t", $"v_filled")
      },
      Some(s"""WITH e AS ($OracleEv),
              |sp AS (
              |  SELECT user_id, event_id, t,
              |    CASE WHEN event_type = 'view' THEN value END AS v_sparse
              |  FROM e)
              |SELECT user_id, event_id, t,
              |  round(coalesce(
              |    last_value(v_sparse IGNORE NULLS) OVER
              |      (PARTITION BY user_id ORDER BY t, event_id
              |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
              |    first_value(v_sparse IGNORE NULLS) OVER
              |      (PARTITION BY user_id ORDER BY t, event_id
              |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) + 1e-9, 6) AS v_filled
              |FROM sp""".stripMargin)),

    // W12: gaps-and-islands sessionization — the signature operator
    // (short_term.py:82-111). One row per event_type change per user.
    Q("w12_islands",
      (s, dir) => {
        Transitions.transitions(
          ev(s, dir), Seq("user_id"), "t", "event_id", "event_type",
          (start, end) => r6((end - start) / lit(3600e6)))
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events),
             |d AS (
             |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
             |                   OR event_type <> lag(event_type) OVER w
             |            THEN 1 ELSE 0 END AS chg
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |i AS (
             |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
             |                           ROWS UNBOUNDED PRECEDING) AS island
             |  FROM d),
             |g AS (
             |  SELECT user_id, island, event_type AS from_label,
             |    min(t) AS start_ord
             |  FROM i GROUP BY user_id, island, event_type),
             |x AS (
             |  SELECT user_id, from_label, start_ord,
             |    lead(from_label) OVER w2 AS to_label,
             |    lead(start_ord) OVER w2 AS end_time
             |  FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY island))
             |SELECT user_id, from_label, to_label,
             |  start_ord AS start_time, end_time,
             |  round((end_time - start_time) / 3600e6 + 1e-9, 6) AS duration
             |FROM x WHERE to_label IS NOT NULL""".stripMargin)),

    // G5: transition probability matrix P(to|from) over the islands output
    // (short_term.py:114-120).
    Q("g5_transition_probs",
      (s, dir) => {
        val trans = Transitions.transitions(
          ev(s, dir), Seq("user_id"), "t", "event_id", "event_type",
          (start, end) => (end - start).cast("double"))
        Transitions.transitionProbabilities(trans, "from_label", "to_label")
          .withColumn("prob", r6(col("prob")))
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events),
             |d AS (
             |  SELECT *, CASE WHEN lag(event_type) OVER w IS NULL
             |                   OR event_type <> lag(event_type) OVER w
             |            THEN 1 ELSE 0 END AS chg
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |i AS (
             |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
             |                           ROWS UNBOUNDED PRECEDING) AS island
             |  FROM d),
             |g AS (
             |  SELECT user_id, island, event_type AS from_label, min(t) AS start_ord
             |  FROM i GROUP BY user_id, island, event_type),
             |x AS (
             |  SELECT user_id, from_label,
             |    lead(from_label) OVER (PARTITION BY user_id ORDER BY island) AS to_label
             |  FROM g),
             |tr AS (SELECT from_label, to_label FROM x WHERE to_label IS NOT NULL),
             |c AS (SELECT from_label, to_label, count(*) AS n FROM tr GROUP BY 1, 2)
             |SELECT from_label, to_label, n,
             |  CAST(sum(n) OVER (PARTITION BY from_label) AS BIGINT) AS n_from,
             |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY from_label) + 1e-9, 6) AS prob
             |FROM c""".stripMargin)),

    // G7: exact whole-column percentiles per group — the coarse-regime
    // thresholds (utils.py:23-24; np.percentile linear interpolation).
    Q("g7_percentile",
      (s, dir) => {
        import s.implicits._
        ev(s, dir).groupBy($"event_type")
          .agg(r6(percentile($"value", lit(0.8))).as("p80"),
               r6(percentile($"value", lit(0.9))).as("p90"),
               r6(percentile($"value", lit(0.5))).as("p50"))
      },
      Some("""SELECT event_type,
             |  round(quantile_cont(value, 0.8) + 1e-9, 6) AS p80,
             |  round(quantile_cont(value, 0.9) + 1e-9, 6) AS p90,
             |  round(quantile_cont(value, 0.5) + 1e-9, 6) AS p50
             |FROM events GROUP BY event_type""".stripMargin)),

    // Gap-based session windows (engine completeness; streaming-ready —
    // `session_window` works identically under Structured Streaming):
    // a session closes after 30 min of inactivity per user. Oracle =
    // the gaps-and-islands rewrite on inter-event gaps — with `>=`:
    // Spark's session_window is half-open [t, t+gap), so an event
    // landing EXACTLY on the 30:00 boundary starts a new session.
    Q("w19_session_windows",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
          .agg(count(lit(1)).as("n_events"), r4(sum($"value")).as("sum_value"))
          .select($"user_id", unix_micros($"sw.start").as("session_start"),
            $"n_events", $"sum_value")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events),
             |g AS (
             |  SELECT *, CASE WHEN lag(t) OVER w IS NULL
             |                   OR t - lag(t) OVER w >= 1800000000
             |            THEN 1 ELSE 0 END AS new_session
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |sids AS (
             |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
             |    ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM g)
             |SELECT user_id, min(t) AS session_start,
             |  count(*) AS n_events, round(sum(value) + 1e-9, 4) AS sum_value
             |FROM sids GROUP BY user_id, sid""".stripMargin)),

    // Range (point-in-interval) join: each purchase joined to the
    // 30-min session interval containing it — the BUCKETED rewrite
    // (equi-join on (user, time bucket) + residual containment filter),
    // never a cross join with a range predicate. Oracle: DuckDB plain
    // inequality join over the islands-rewrite sessions.
    Q("rj_point_interval",
      (s, dir) => {
        import s.implicits._
        val sessions = Tables.events(s, dir)
          .groupBy($"user_id", session_window($"ts", "30 minutes"))
          .agg(min(unix_micros($"ts")).as("session_start"),
            max(unix_micros($"ts")).as("session_end"))
          .select($"user_id", $"session_start", $"session_end")
        val purchases = ev(s, dir).filter($"event_type" === "purchase")
          .select($"user_id", $"event_id", $"t")
        graft.joins.RangeJoin.pointInInterval(purchases, sessions,
            Seq("user_id"), "t", "session_start", "session_end",
            bucketWidth = 3600000000L) // 1 h buckets in µs
          .select($"user_id", $"event_id", $"t",
            $"session_start", $"session_end")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, event_type
             |          FROM events),
             |g AS (
             |  SELECT *, CASE WHEN lag(t) OVER w IS NULL
             |                   OR t - lag(t) OVER w >= 1800000000
             |            THEN 1 ELSE 0 END AS new_session
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |sids AS (
             |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
             |    ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM g),
             |iv AS (SELECT user_id, min(t) AS session_start,
             |              max(t) AS session_end
             |       FROM sids GROUP BY user_id, sid),
             |p AS (SELECT user_id, event_id, t FROM e
             |      WHERE event_type = 'purchase')
             |SELECT p.user_id, p.event_id, p.t,
             |  iv.session_start, iv.session_end
             |FROM p JOIN iv ON p.user_id = iv.user_id
             |  AND p.t >= iv.session_start AND p.t <= iv.session_end""".stripMargin)),

    // Interval-OVERLAP join: concurrent sessions across user pairs —
    // both interval sides bucketed, equi-join on the bucket, each pair
    // emitted exactly once via the intersection-left-edge bucket rule
    // (no distinct, no cross join). Oracle: DuckDB inequality self-join
    // over the islands-rewrite sessions.
    Q("rj2_interval_overlap",
      (s, dir) => {
        import s.implicits._
        val sessions = Tables.events(s, dir)
          .filter($"user_id" < 10)
          .groupBy($"user_id", session_window($"ts", "30 minutes"))
          .agg(min(unix_micros($"ts")).as("s_start"),
            max(unix_micros($"ts")).as("s_end"))
          .select($"user_id", $"s_start", $"s_end")
        val a = sessions.select($"user_id".as("user_a"),
          $"s_start".as("a_start"), $"s_end".as("a_end"))
        val b = sessions.select($"user_id".as("user_b"),
          $"s_start".as("b_start"), $"s_end".as("b_end"))
        graft.joins.RangeJoin.intervalOverlap(a, b, Seq.empty,
            "a_start", "a_end", "b_start", "b_end",
            bucketWidth = 3600000000L) // 1 h buckets in µs
          .filter($"user_a" < $"user_b")
          .groupBy($"user_a", $"user_b")
          .agg(count(lit(1)).as("n_overlaps"),
            sum(least($"a_end", $"b_end") - greatest($"a_start", $"b_start"))
              .as("overlap_us"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events
             |          WHERE user_id < 10),
             |g AS (
             |  SELECT *, CASE WHEN lag(t) OVER w IS NULL
             |                   OR t - lag(t) OVER w >= 1800000000
             |            THEN 1 ELSE 0 END AS new_session
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |sids AS (
             |  SELECT *, sum(new_session) OVER (PARTITION BY user_id
             |    ORDER BY t, event_id ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM g),
             |iv AS (SELECT user_id, min(t) AS s_start, max(t) AS s_end
             |       FROM sids GROUP BY user_id, sid)
             |SELECT a.user_id AS user_a, b.user_id AS user_b,
             |  count(*) AS n_overlaps,
             |  CAST(sum(least(a.s_end, b.s_end)
             |           - greatest(a.s_start, b.s_start)) AS BIGINT) AS overlap_us
             |FROM iv a JOIN iv b
             |  ON a.user_id < b.user_id
             |  AND a.s_start <= b.s_end AND b.s_start <= a.s_end
             |GROUP BY 1, 2""".stripMargin)),

    // As-of (backward) join: each purchase matched to the most recent
    // prior-or-equal view of the same user — union+window rewrite (one
    // shuffle + sort; no range cross-join). Oracle: DuckDB ASOF JOIN.
    Q("aj_asof",
      (s, dir) => {
        import s.implicits._
        val e = ev(s, dir)
        val purchases = e.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id", $"t", $"value")
        val views = e.filter($"event_type" === "view")
          .select($"user_id", $"t", $"value")
        graft.joins.AsOfJoin.backward(purchases, views,
            Seq("user_id"), "t", "t", Seq("value"))
          .select($"user_id", $"event_id", $"t",
            $"asof_ord".as("view_t"),
            r6($"asof_value").as("view_value"),
            ($"t" - $"asof_ord").as("gap_us"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t, value
             |          FROM events),
             |p AS (SELECT user_id, event_id, t, value FROM e
             |      WHERE event_type = 'purchase'),
             |v AS (SELECT user_id, t, value FROM e WHERE event_type = 'view')
             |SELECT p.user_id, p.event_id, p.t,
             |  v.t AS view_t,
             |  round(v.value + 1e-9, 6) AS view_value,
             |  p.t - v.t AS gap_us
             |FROM p ASOF LEFT JOIN v
             |  ON p.user_id = v.user_id AND p.t >= v.t""".stripMargin)),

    // As-of join with a match tolerance (pandas merge_asof(tolerance=)
    // semantics, round 11): a view older than 1 h is NO match — the
    // purchase keeps its row with NULL view columns. Same one-shuffle
    // union+window plan as aj_asof; the gate is a post-projection.
    // Oracle: DuckDB ASOF JOIN + a CASE on the gap (ASOF has no native
    // tolerance), nulling the same all-or-nothing payload.
    Q("aj2_asof_tolerance",
      (s, dir) => {
        import s.implicits._
        val e = ev(s, dir)
        val purchases = e.filter($"event_type" === "purchase")
          .select($"user_id", $"event_id", $"t", $"value")
        val views = e.filter($"event_type" === "view")
          .select($"user_id", $"t", $"value")
        graft.joins.AsOfJoin.backwardWithin(purchases, views,
            Seq("user_id"), "t", "t", Seq("value"),
            tolerance = 3600000000L) // 1 h in µs
          .select($"user_id", $"event_id", $"t",
            $"asof_ord".as("view_t"),
            r6($"asof_value").as("view_value"),
            ($"t" - $"asof_ord").as("gap_us"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t, value
             |          FROM events),
             |p AS (SELECT user_id, event_id, t, value FROM e
             |      WHERE event_type = 'purchase'),
             |v AS (SELECT user_id, t, value FROM e WHERE event_type = 'view')
             |SELECT p.user_id, p.event_id, p.t,
             |  CASE WHEN p.t - v.t <= 3600000000 THEN v.t END AS view_t,
             |  CASE WHEN p.t - v.t <= 3600000000
             |       THEN round(v.value + 1e-9, 6) END AS view_value,
             |  CASE WHEN p.t - v.t <= 3600000000 THEN p.t - v.t END AS gap_us
             |FROM p ASOF LEFT JOIN v
             |  ON p.user_id = v.user_id AND p.t >= v.t""".stripMargin)),

    // W14: daily tumbling-window resample + per-day proportions
    // (lstm_analysis.py:27-28 groupby(Grouper(freq='D'), regime) unstacked).
    Q("w14_daily",
      (s, dir) => {
        import s.implicits._
        // read the date-partitioned layout: the tumbling-day key is the
        // partition column itself — no per-row date_trunc, and the same
        // layout P2 prunes (EventsLayout). Day surfaces as µs since
        // epoch via integer day arithmetic (timezone-independent).
        val daily = graft.io.EventsLayout.read(s, dir)
          .groupBy($"day", $"event_type")
          .agg(count(lit(1)).as("n"), r4(sum($"value")).as("sum_value"))
        val wDay = Window.partitionBy($"day")
        daily.withColumn("share", r6($"n" / sum($"n").over(wDay)))
          .withColumn("day",
            datediff($"day", lit("1970-01-01")).cast("long") * 86400000000L)
      },
      Some("""WITH d AS (
             |  SELECT epoch_us(date_trunc('day', ts)) AS day, event_type,
             |    count(*) AS n, round(sum(value) + 1e-9, 4) AS sum_value
             |  FROM events GROUP BY 1, 2)
             |SELECT day, event_type, n, sum_value,
             |  round(CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY day) + 1e-9, 6) AS share
             |FROM d""".stripMargin)),

    // W21 (beyond-reference): maximum drawdown per user — the classic
    // risk statistic: running peak via an expanding-window max, then
    // the largest peak-to-trough gap. Pure window algebra over the one
    // user-keyed shuffle every W-operator shares.
    Q("w21_drawdown",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, dir)
          .select($"user_id", $"t", $"event_id", $"value")
          .withColumn("peak", max($"value").over(w))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n"),
            r6(max($"peak" - $"value")).as("max_drawdown"),
            r6(max($"value")).as("peak_value"))
      },
      Some(s"""WITH e AS ($OracleEv),
             |p AS (SELECT user_id, value,
             |        max(value) OVER (PARTITION BY user_id ORDER BY t, event_id
             |          ROWS UNBOUNDED PRECEDING) AS peak
             |      FROM e)
             |SELECT user_id, count(*) AS n,
             |  round(max(peak - value) + 1e-9, 6) AS max_drawdown,
             |  round(max(value) + 1e-9, 6) AS peak_value
             |FROM p GROUP BY 1""".stripMargin)),

    // W22 (beyond-reference): lag-1 autocorrelation of value per user
    // — the serial-dependence statistic (is the panel mean-reverting or
    // trending?). One lag window + one corr aggregate on the shared
    // user-keyed partitioning; per-row (value, lag) pairs are exact, so
    // only the corr aggregate needs the r4 cross-engine rounding.
    Q("w22_autocorr",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        ev(s, dir)
          .select($"user_id", $"t", $"event_id", $"value")
          .withColumn("prev", lag($"value", 1).over(w))
          .filter($"prev".isNotNull)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_pairs"),
            r4(corr($"value", $"prev")).as("autocorr_1"))
          .filter($"n_pairs" >= 2)
      },
      Some(s"""WITH e AS ($OracleEv),
             |l AS (SELECT user_id, value,
             |        lag(value) OVER (PARTITION BY user_id ORDER BY t, event_id)
             |          AS prev
             |      FROM e)
             |SELECT user_id, count(*) AS n_pairs,
             |  round(corr(value, prev) + 1e-9, 4) AS autocorr_1
             |FROM l WHERE prev IS NOT NULL
             |GROUP BY 1 HAVING count(*) >= 2""".stripMargin)),

    // Sortino ratio — w25's risk tier completed with the
    // downside-only denominator practitioners prefer over Sharpe
    // (upside volatility is not risk): per user over daily returns,
    // mean return / downside deviation, where the downside deviation
    // is √(Σ min(r,0)² / n) over ALL n observations (the standard
    // target-0 convention — zeros for up days INCLUDED in the mean of
    // squares). One user-keyed shuffle: the lag window and all three
    // aggregates share the partitioning. Ratio computed from
    // r6-rounded numerator/denominator (the w27 convention).
    Q("w33_sortino",
      (s, dir) => {
        import s.implicits._
        val daily = ev(s, dir)
          .groupBy($"user_id", ($"t".cast("long") / lit(86400000000L))
            .cast("long").as("day"))
          .agg(r6(sum($"value")).as("y"))
        val w = Window.partitionBy($"user_id").orderBy($"day")
        val lagy = lag($"y", 1).over(w)
        daily
          .withColumn("r", when(lagy.isNull || lagy === 0, lit(null))
            .otherwise($"y" / lagy - 1))
          .filter($"r".isNotNull)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n"),
            r6(avg($"r")).as("mean_r"),
            r6(sqrt(avg(least($"r", lit(0.0)) * least($"r", lit(0.0)))))
              .as("downside_dev"))
          .filter($"n" >= 10)
          .select($"user_id", $"n", $"mean_r", $"downside_dev",
            r6(when($"downside_dev" > 0, $"mean_r" / $"downside_dev"))
              .as("sortino"))
      },
      Some(s"""WITH e AS ($OracleEv),
             |d AS (SELECT user_id, t // 86400000000 AS day,
             |        round(sum(value) + 1e-9, 6) AS y
             |      FROM e GROUP BY 1, 2),
             |l AS (SELECT user_id, y,
             |        lag(y) OVER (PARTITION BY user_id ORDER BY day) AS ly
             |      FROM d),
             |r AS (SELECT user_id,
             |        CASE WHEN ly IS NULL OR ly = 0 THEN NULL
             |             ELSE y / ly - 1 END AS r
             |      FROM l),
             |a AS (
             |  SELECT user_id, count(*) AS n,
             |    round(avg(r) + 1e-9, 6) AS mean_r,
             |    round(sqrt(avg(least(r, 0.0) * least(r, 0.0))) + 1e-9, 6)
             |      AS downside_dev
             |  FROM r WHERE r IS NOT NULL
             |  GROUP BY 1 HAVING count(*) >= 10)
             |SELECT user_id, n, mean_r, downside_dev,
             |  round(CASE WHEN downside_dev > 0
             |        THEN mean_r / downside_dev END + 1e-9, 6) AS sortino
             |FROM a""".stripMargin)),

    // Drawdown DURATION (time under water) — w21 measures drawdown
    // DEPTH; this measures how long recoveries take: per user, the
    // longest and the current run of consecutive days below the
    // running maximum. Pure integer algebra after the r6 daily
    // canonicalization (the under/at-high comparison reads rounded
    // values on both engines, and streaks are gaps-and-islands
    // counts), so the output is exact — no float rounding in the
    // statistic itself. One user Exchange+Sort carries both window
    // passes.
    Q("w31_underwater",
      (s, dir) => {
        import s.implicits._
        val daily = ev(s, dir)
          .groupBy($"user_id", ($"t".cast("long") / lit(86400000000L))
            .cast("long").as("day"))
          .agg(r6(sum($"value")).as("y"))
        val w = Window.partitionBy($"user_id").orderBy($"day")
        val run = daily
          .withColumn("runmax", max($"y").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("under", ($"y" < $"runmax").cast("long"))
          // island id: bumps at every at-high day, constant through a
          // underwater streak
          .withColumn("grp", sum(lit(1L) - $"under").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
        val streaks = run.groupBy($"user_id", $"grp")
          .agg(sum($"under").as("streak"), max($"day").as("grp_end"))
        val lastDay = daily.groupBy($"user_id").agg(max($"day").as("last_day"))
        streaks.join(lastDay, "user_id")
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_islands"),
            max($"streak").as("max_underwater_days"),
            max(when($"grp_end" === $"last_day", $"streak"))
              .as("cur_underwater_days"))
      },
      Some(s"""WITH e AS ($OracleEv),
             |d AS (SELECT user_id, t // 86400000000 AS day,
             |        round(sum(value) + 1e-9, 6) AS y
             |      FROM e GROUP BY 1, 2),
             |r AS (
             |  SELECT user_id, day, y,
             |    max(y) OVER w AS runmax
             |  FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |u AS (
             |  SELECT user_id, day,
             |    CASE WHEN y < runmax THEN 1 ELSE 0 END AS under
             |  FROM r),
             |g AS (
             |  SELECT user_id, day, under,
             |    sum(1 - under) OVER (PARTITION BY user_id ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
             |  FROM u),
             |s AS (
             |  SELECT user_id, grp, CAST(sum(under) AS BIGINT) AS streak,
             |    max(day) AS grp_end
             |  FROM g GROUP BY 1, 2),
             |ld AS (SELECT user_id, max(day) AS last_day FROM d GROUP BY 1)
             |SELECT s.user_id, count(*) AS n_islands,
             |  max(streak) AS max_underwater_days,
             |  max(CASE WHEN grp_end = last_day THEN streak END)
             |    AS cur_underwater_days
             |FROM s JOIN ld ON ld.user_id = s.user_id
             |GROUP BY 1""".stripMargin)),

    // Autocorrelation FUNCTION — w22 generalized to the lag set a
    // seasonality screen actually reads (1, 2, 3, 7 on the daily
    // series): all four lag columns ride ONE user-keyed
    // Exchange+Sort (same window), and the four corr aggregates share
    // the same partitioning — one fact shuffle total. Per-lag pair
    // counts differ (corr skips null lag pairs identically on both
    // engines), so each ac_k is its own corr over the valid pairs.
    Q("w29_acf",
      (s, dir) => {
        import s.implicits._
        val daily = ev(s, dir)
          .groupBy($"user_id", ($"t".cast("long") / lit(86400000000L))
            .cast("long").as("day"))
          .agg(r6(sum($"value")).as("y"))
        val w = Window.partitionBy($"user_id").orderBy($"day")
        daily
          .withColumn("l1", lag($"y", 1).over(w))
          .withColumn("l2", lag($"y", 2).over(w))
          .withColumn("l3", lag($"y", 3).over(w))
          .withColumn("l7", lag($"y", 7).over(w))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_days"),
            r4(corr($"y", $"l1")).as("ac1"),
            r4(corr($"y", $"l2")).as("ac2"),
            r4(corr($"y", $"l3")).as("ac3"),
            r4(corr($"y", $"l7")).as("ac7"))
          .filter($"n_days" >= 10)
      },
      Some(s"""WITH e AS ($OracleEv),
             |d AS (SELECT user_id, t // 86400000000 AS day,
             |        round(sum(value) + 1e-9, 6) AS y
             |      FROM e GROUP BY 1, 2),
             |l AS (SELECT user_id, y,
             |        lag(y, 1) OVER w AS l1, lag(y, 2) OVER w AS l2,
             |        lag(y, 3) OVER w AS l3, lag(y, 7) OVER w AS l7
             |      FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day))
             |SELECT user_id, count(*) AS n_days,
             |  round(corr(y, l1) + 1e-9, 4) AS ac1,
             |  round(corr(y, l2) + 1e-9, 4) AS ac2,
             |  round(corr(y, l3) + 1e-9, 4) AS ac3,
             |  round(corr(y, l7) + 1e-9, 4) AS ac7
             |FROM l GROUP BY 1 HAVING count(*) >= 10""".stripMargin)),

    // Holt linear-trend exponential smoothing (α=0.5, β=0.3) per user
    // over the daily series — the forecasting step beyond q6's linear
    // fit. The coupled (level, trend) recurrence runs as a codegen'd
    // `aggregate` fold over the per-user sorted day array (the f1
    // idiom): ONE user-keyed shuffle total, state is two doubles, no
    // per-step window or self-join. The oracle replays the identical
    // recurrence as a recursive CTE. Daily sums are r6-rounded BEFORE
    // the fold on both engines, so every fold step computes from
    // identical doubles and the recurrence stays bit-equal end to end.
    Q("h1_holt",
      (s, dir) => {
        import s.implicits._
        val daily = ev(s, dir)
          .groupBy($"user_id", ($"t".cast("long") / lit(86400000000L))
            .cast("long").as("day"))
          .agg(r6(sum($"value")).as("y"))
        daily.groupBy($"user_id")
          .agg(sort_array(collect_list(struct($"day", $"y"))).as("ys"))
          .select($"user_id", size($"ys").cast("long").as("n_days"),
            aggregate($"ys",
              struct(lit(0).as("n"), lit(0.0).as("l"), lit(0.0).as("b")),
              (acc, x) => {
                val nl = lit(0.5) * x("y") + lit(0.5) * (acc("l") + acc("b"))
                when(acc("n") === 0,
                  struct(lit(1).as("n"), x("y").as("l"), lit(0.0).as("b")))
                .otherwise(struct((acc("n") + lit(1)).as("n"), nl.as("l"),
                  (lit(0.3) * (nl - acc("l")) + lit(0.7) * acc("b")).as("b")))
              }).as("st"))
          .select($"user_id", $"n_days",
            r6($"st.l").as("level"), r6($"st.b").as("trend"),
            r6($"st.l" + $"st.b").as("forecast"))
      },
      Some("""WITH RECURSIVE d AS (
             |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             |    round(sum(value) + 1e-9, 6) AS y
             |  FROM events GROUP BY 1, 2),
             |o AS (SELECT *, row_number() OVER (PARTITION BY user_id
             |        ORDER BY day) AS rn FROM d),
             |h AS (
             |  SELECT user_id, rn, y AS l, CAST(0.0 AS DOUBLE) AS b
             |  FROM o WHERE rn = 1
             |  UNION ALL
             |  SELECT o.user_id, o.rn,
             |    0.5 * o.y + 0.5 * (h.l + h.b) AS l,
             |    0.3 * ((0.5 * o.y + 0.5 * (h.l + h.b)) - h.l) + 0.7 * h.b AS b
             |  FROM h JOIN o ON o.user_id = h.user_id AND o.rn = h.rn + 1)
             |SELECT user_id, rn AS n_days,
             |  round(l + 1e-9, 6) AS level, round(b + 1e-9, 6) AS trend,
             |  round(l + b + 1e-9, 6) AS forecast
             |FROM h
             |QUALIFY rn = max(rn) OVER (PARTITION BY user_id)""".stripMargin)),

    // Kalman filter, local-level model (the h1 idiom with an ADAPTIVE
    // gain): per-key state is (level, posterior variance) and each
    // step computes predict variance p+Q, gain k = (p+Q)/(p+Q+R),
    // level update l + k·(y−l) — the optimal linear filter for
    // level-plus-noise series, converging to a steady-state gain
    // instead of h1's fixed smoothing constants (Q=0.1, R=1 in noise
    // units). Same scale shape as h1: ONE user-keyed fold over the
    // sorted day array, state three doubles; the oracle replays the
    // identical recurrence as a recursive CTE, daily sums r6-rounded
    // BEFORE the fold on both engines so every step is bit-equal.
    Q("w28_kalman",
      (s, dir) => {
        import s.implicits._
        val daily = ev(s, dir)
          .groupBy($"user_id", ($"t".cast("long") / lit(86400000000L))
            .cast("long").as("day"))
          .agg(r6(sum($"value")).as("y"))
        daily.groupBy($"user_id")
          .agg(sort_array(collect_list(struct($"day", $"y"))).as("ys"))
          .select($"user_id", size($"ys").cast("long").as("n_days"),
            aggregate($"ys",
              struct(lit(0).as("n"), lit(0.0).as("l"), lit(0.0).as("p"),
                lit(0.0).as("k")),
              (acc, x) => {
                val pp = acc("p") + lit(0.1)
                val k = pp / (pp + lit(1.0))
                when(acc("n") === 0,
                  struct(lit(1).as("n"), x("y").as("l"), lit(1.0).as("p"),
                    lit(0.0).as("k")))
                .otherwise(struct((acc("n") + lit(1)).as("n"),
                  (acc("l") + k * (x("y") - acc("l"))).as("l"),
                  ((lit(1.0) - k) * pp).as("p"),
                  k.as("k")))
              }).as("st"))
          .select($"user_id", $"n_days",
            r6($"st.l").as("level"), r6($"st.p").as("pvar"),
            r6($"st.k").as("gain"))
      },
      Some("""WITH RECURSIVE d AS (
             |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             |    round(sum(value) + 1e-9, 6) AS y
             |  FROM events GROUP BY 1, 2),
             |o AS (SELECT *, row_number() OVER (PARTITION BY user_id
             |        ORDER BY day) AS rn FROM d),
             |h AS (
             |  SELECT user_id, rn, y AS l, CAST(1.0 AS DOUBLE) AS p,
             |    CAST(0.0 AS DOUBLE) AS k
             |  FROM o WHERE rn = 1
             |  UNION ALL
             |  SELECT o.user_id, o.rn,
             |    h.l + ((h.p + 0.1) / ((h.p + 0.1) + 1.0)) * (o.y - h.l) AS l,
             |    (1.0 - (h.p + 0.1) / ((h.p + 0.1) + 1.0)) * (h.p + 0.1) AS p,
             |    (h.p + 0.1) / ((h.p + 0.1) + 1.0) AS k
             |  FROM h JOIN o ON o.user_id = h.user_id AND o.rn = h.rn + 1)
             |SELECT user_id, rn AS n_days,
             |  round(l + 1e-9, 6) AS level, round(p + 1e-9, 6) AS pvar,
             |  round(k + 1e-9, 6) AS gain
             |FROM h
             |QUALIFY rn = max(rn) OVER (PARTITION BY user_id)""".stripMargin)),

    // CAPM-style beta/alpha/R² per user vs the cross-sectional market
    // factor: per-user daily closes (the f4 argmax idiom — min/max
    // struct, no window pass), the market = r6-rounded equal-weight
    // mean close per day broadcast back to the panel, then the
    // regr_slope/regr_intercept/regr_r2 aggregate family per user.
    // Two keyed shuffles total ((user, day) bars + user regression);
    // the day-level factor frame is calendar-bounded, hence broadcast.
    // Closes and factor are r6-rounded BEFORE the regression so both
    // engines regress identical doubles; the regression outputs are
    // r4 (summation order differs inside the covariance sums).
    Q("w24_beta",
      (s, dir) => {
        import s.implicits._
        val daily = ev(s, dir)
          .select($"user_id",
            ($"t".cast("long") / lit(86400000000L)).cast("long").as("day"),
            $"t", $"event_id", $"value")
          .groupBy($"user_id", $"day")
          .agg(r6(max(struct($"t", $"event_id", $"value"))("value")).as("close"))
        val mkt = daily.groupBy($"day").agg(r6(avg($"close")).as("mkt"))
        daily.join(broadcast(mkt), "day")
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_days"),
            r4(regr_slope($"close", $"mkt")).as("beta"),
            r4(regr_intercept($"close", $"mkt")).as("alpha"),
            r4(regr_r2($"close", $"mkt")).as("r2"))
          .filter($"n_days" >= 2)
      },
      Some(s"""WITH e AS ($OracleEv),
             |d AS (SELECT user_id, t // 86400000000 AS day,
             |        round(last(value ORDER BY t, event_id) + 1e-9, 6) AS close
             |      FROM e GROUP BY 1, 2),
             |m AS (SELECT day, round(avg(close) + 1e-9, 6) AS mkt
             |      FROM d GROUP BY 1)
             |SELECT d.user_id, count(*) AS n_days,
             |  round(regr_slope(d.close, m.mkt) + 1e-9, 4) AS beta,
             |  round(regr_intercept(d.close, m.mkt) + 1e-9, 4) AS alpha,
             |  round(regr_r2(d.close, m.mkt) + 1e-9, 4) AS r2
             |FROM d JOIN m USING (day)
             |GROUP BY 1 HAVING count(*) >= 2""".stripMargin)),

    // Spearman rank correlation (value vs volume) per user — the
    // robust complement to g9's Pearson. Average ranks for ties come
    // from the rank-asc/rank-desc identity
    //   avg_rank = (rank_asc + (n + 1 - rank_desc)) / 2
    // instead of a tie-count window keyed by (user, value): every
    // window here partitions by user_id ALONE, so Catalyst plans ONE
    // Exchange with per-partition sorts — a (user, value)-keyed count
    // window would have added a second full shuffle just to resolve
    // ties. Ranks are integers (cross-engine exact; halves are exact
    // doubles), so only the final corr needs the r4 rounding.
    Q("w23_spearman",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
        val base = ev(s, dir)
          .select($"user_id", $"value",
            get_json_object($"props", "$.k").cast("double").as("vol"))
          .filter($"vol".isNotNull)
        val n = count(lit(1)).over(w)
        def avgRank(c: org.apache.spark.sql.Column) =
          (rank().over(w.orderBy(c)) +
            (n + lit(1) - rank().over(w.orderBy(c.desc)))) / lit(2.0)
        base
          .withColumn("rv", avgRank($"value"))
          .withColumn("rq", avgRank($"vol"))
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n"), r4(corr($"rv", $"rq")).as("spearman"))
          .filter($"n" >= 2)
      },
      Some("""WITH e AS (SELECT user_id, value,
             |    CAST(json_extract_string(props, '$.k') AS DOUBLE) AS vol
             |  FROM events),
             |f AS (SELECT * FROM e WHERE vol IS NOT NULL),
             |r AS (SELECT user_id,
             |    (rank() OVER (PARTITION BY user_id ORDER BY value)
             |     + (count(*) OVER (PARTITION BY user_id) + 1
             |        - rank() OVER (PARTITION BY user_id ORDER BY value DESC)))
             |      / CAST(2.0 AS DOUBLE) AS rv,
             |    (rank() OVER (PARTITION BY user_id ORDER BY vol)
             |     + (count(*) OVER (PARTITION BY user_id) + 1
             |        - rank() OVER (PARTITION BY user_id ORDER BY vol DESC)))
             |      / CAST(2.0 AS DOUBLE) AS rq
             |  FROM f)
             |SELECT user_id, count(*) AS n,
             |  round(corr(rv, rq) + 1e-9, 4) AS spearman
             |FROM r GROUP BY 1 HAVING count(*) >= 2""".stripMargin)),

    // Historical VaR(95) + Expected Shortfall per user over daily
    // close returns — the canonical tail-risk pair. ES is the mean of
    // returns at or below the VaR cutoff, with the cutoff r6-rounded
    // BEFORE the comparison on both engines (the f5 med/mad pattern),
    // so tail membership is decided on identical doubles. Shuffle
    // story: daily bars (1), returns window + percentile on the same
    // user partitioning, then the per-user cutoff frame (user-dim
    // sized) broadcast back for the tail scan — no fact re-shuffle.
    Q("w25_var_es",
      (s, dir) => {
        import s.implicits._
        val daily = ev(s, dir)
          .select($"user_id",
            ($"t".cast("long") / lit(86400000000L)).cast("long").as("day"),
            $"t", $"event_id", $"value")
          .groupBy($"user_id", $"day")
          .agg(r6(max(struct($"t", $"event_id", $"value"))("value")).as("close"))
        val w = Window.partitionBy($"user_id").orderBy($"day")
        val rets = daily
          .withColumn("prev", lag($"close", 1).over(w))
          .filter($"prev".isNotNull && $"prev" =!= 0.0)
          .select($"user_id", r6($"close" / $"prev" - lit(1.0)).as("ret"))
        val cut = rets.groupBy($"user_id")
          .agg(r6(percentile($"ret", lit(0.05))).as("var95"))
        rets.join(broadcast(cut), "user_id")
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n"),
            min($"var95").as("var95"),
            r4(avg(when($"ret" <= $"var95", $"ret"))).as("es95"))
          .filter($"n" >= 20)
      },
      Some(s"""WITH e AS ($OracleEv),
             |d AS (SELECT user_id, t // 86400000000 AS day,
             |        round(last(value ORDER BY t, event_id) + 1e-9, 6) AS close
             |      FROM e GROUP BY 1, 2),
             |r AS (SELECT user_id,
             |        round(close / lag(close) OVER w - 1.0 + 1e-9, 6) AS ret,
             |        lag(close) OVER w AS prev
             |      FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day)),
             |f AS (SELECT user_id, ret FROM r
             |      WHERE prev IS NOT NULL AND prev <> 0),
             |v AS (SELECT user_id,
             |        round(quantile_cont(ret, 0.05) + 1e-9, 6) AS var95
             |      FROM f GROUP BY 1)
             |SELECT f.user_id, count(*) AS n, min(v.var95) AS var95,
             |  round(avg(ret) FILTER (ret <= v.var95) + 1e-9, 4) AS es95
             |FROM f JOIN v USING (user_id)
             |GROUP BY 1 HAVING count(*) >= 20""".stripMargin)),

    // Classic additive decomposition y = trend + seasonal + residual
    // per user over the daily series: trend = centered 7-day moving
    // average (full windows only), weekly seasonal = mean of the
    // detrended values per day-of-week, residual = the rest. Trend
    // and seasonal are r4-rounded BEFORE entering downstream
    // arithmetic — window/group aggregates sum in engine-specific
    // order (DuckDB's segment-tree window vs Spark's sliding
    // aggregator), so each tier re-canonicalizes; the residual is
    // then per-row arithmetic on identical doubles. Two shuffles
    // (user for the daily bars + trend window; (user, dow) for the
    // seasonal window).
    Q("w26_decompose",
      (s, dir) => {
        import s.implicits._
        val daily = ev(s, dir)
          .groupBy($"user_id", ($"t".cast("long") / lit(86400000000L))
            .cast("long").as("day"))
          .agg(r6(sum($"value")).as("y"))
        val wt = Window.partitionBy($"user_id").orderBy($"day")
          .rowsBetween(-3, 3)
        val trended = daily
          .withColumn("trend",
            when(count($"y").over(wt) === 7, r4(avg($"y").over(wt))))
          .withColumn("detr", $"y" - $"trend")
        val ws = Window.partitionBy($"user_id", ($"day" % 7).as("dow"))
        trended
          .withColumn("seasonal",
            when($"detr".isNotNull, r4(avg($"detr").over(ws))))
          .select($"user_id", $"day", $"y", $"trend", $"seasonal",
            r6($"detr" - $"seasonal").as("residual"))
      },
      Some(s"""WITH e AS ($OracleEv),
             |d AS (SELECT user_id, t // 86400000000 AS day,
             |        round(sum(value) + 1e-9, 6) AS y
             |      FROM e GROUP BY 1, 2),
             |tr AS (SELECT user_id, day, y,
             |        CASE WHEN count(y) OVER w7 = 7
             |          THEN round(avg(y) OVER w7 + 1e-9, 4) END AS trend
             |      FROM d
             |      WINDOW w7 AS (PARTITION BY user_id ORDER BY day
             |        ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
             |dt AS (SELECT *, y - trend AS detr FROM tr),
             |se AS (SELECT *,
             |        CASE WHEN detr IS NOT NULL THEN
             |          round(avg(detr) OVER (PARTITION BY user_id, day % 7)
             |            + 1e-9, 4) END AS seasonal
             |      FROM dt)
             |SELECT user_id, day, y, trend, seasonal,
             |  round(detr - seasonal + 1e-9, 6) AS residual
             |FROM se""".stripMargin)),

    // AR(1) mean-reversion per user: φ = regr_slope(y_t, y_{t-1}) on
    // daily closes, half-life = −ln 2 / ln φ (defined only for
    // 0 < φ < 1 — a non-mean-reverting series reports NULL), and the
    // equilibrium level intercept / (1 − φ) — the Ornstein–Uhlenbeck
    // discretization pairs-trading screens run. One user-keyed
    // shuffle: the lag window and the regression aggregate share the
    // partitioning. φ/intercept are r4 (covariance-sum order);
    // half-life and equilibrium derive from the ROUNDED φ on both
    // engines, so the nonlinear ln/division amplification stays
    // cross-engine exact.
    Q("w27_halflife",
      (s, dir) => {
        import s.implicits._
        val daily = ev(s, dir)
          .groupBy($"user_id", ($"t".cast("long") / lit(86400000000L))
            .cast("long").as("day"))
          .agg(r6(sum($"value")).as("y"))
        val w = Window.partitionBy($"user_id").orderBy($"day")
        daily
          .withColumn("prev", lag($"y", 1).over(w))
          .filter($"prev".isNotNull)
          .groupBy($"user_id")
          .agg(count(lit(1)).as("n_pairs"),
            r4(regr_slope($"y", $"prev")).as("phi"),
            r4(regr_intercept($"y", $"prev")).as("c0"))
          .filter($"n_pairs" >= 10)
          .select($"user_id", $"n_pairs", $"phi", $"c0",
            r6(when($"phi" > 0 && $"phi" < 1,
              -log(lit(2.0)) / log($"phi"))).as("halflife_days"),
            r6(when($"phi" =!= 1.0, $"c0" / (lit(1.0) - $"phi")))
              .as("equilibrium"))
      },
      Some(s"""WITH e AS ($OracleEv),
             |d AS (SELECT user_id, t // 86400000000 AS day,
             |        round(sum(value) + 1e-9, 6) AS y
             |      FROM e GROUP BY 1, 2),
             |l AS (SELECT user_id, y,
             |        lag(y) OVER (PARTITION BY user_id ORDER BY day) AS prev
             |      FROM d),
             |r AS (SELECT user_id, count(*) AS n_pairs,
             |        round(regr_slope(y, prev) + 1e-9, 4) AS phi,
             |        round(regr_intercept(y, prev) + 1e-9, 4) AS c0
             |      FROM l WHERE prev IS NOT NULL
             |      GROUP BY 1 HAVING count(*) >= 10)
             |SELECT user_id, n_pairs, phi, c0,
             |  round(CASE WHEN phi > 0 AND phi < 1
             |        THEN -ln(CAST(2.0 AS DOUBLE)) / ln(phi) END + 1e-9, 6)
             |    AS halflife_days,
             |  round(CASE WHEN phi <> 1.0
             |        THEN c0 / (CAST(1.0 AS DOUBLE) - phi) END + 1e-9, 6)
             |    AS equilibrium
             |FROM r""".stripMargin)),

    // W34 (round 12): rank-family TIE semantics — o5_rank_funcs checks
    // the family over a TOTAL order (no ties possible); this one
    // orders by the value alone, so tied values must share rank /
    // dense_rank / percent_rank and cume_dist must count peers
    // inclusively — the cross-engine contract a total order can't
    // exercise — plus cume_dist itself (absent from o5) and ntile(4)
    // on a total-ordered second spec (event_id tie-break; ntile is
    // undefined under ties). One partition key, two window specs
    // sharing one Exchange; hash-checked row by row.
    Q("w34_rank_family",
      (s, dir) => {
        import s.implicits._
        val base = Tables.events(s, dir)
          .filter($"user_id" < 30 && $"event_type" === "purchase")
          .select($"event_id", $"user_id", r6($"value").as("value"))
        val byVal = Window.partitionBy($"user_id").orderBy($"value")
        val total = Window.partitionBy($"user_id")
          .orderBy($"value", $"event_id")
        base.select($"event_id", $"user_id", $"value",
            rank().over(byVal).as("rnk"),
            dense_rank().over(byVal).as("drnk"),
            r6(percent_rank().over(byVal)).as("prnk"),
            r6(cume_dist().over(byVal)).as("cdist"),
            ntile(4).over(total).as("quartile"))
          .orderBy($"user_id", $"value", $"event_id")
      },
      Some("""WITH b AS (
             |  SELECT event_id, user_id, round(value + 1e-9, 6) AS value
             |  FROM events
             |  WHERE user_id < 30 AND event_type = 'purchase')
             |SELECT event_id, user_id, value,
             |  CAST(rank() OVER wv AS INT) AS rnk,
             |  CAST(dense_rank() OVER wv AS INT) AS drnk,
             |  round(percent_rank() OVER wv + 1e-9, 6) AS prnk,
             |  round(cume_dist() OVER wv + 1e-9, 6) AS cdist,
             |  CAST(ntile(4) OVER wt AS INT) AS quartile
             |FROM b
             |WINDOW wv AS (PARTITION BY user_id ORDER BY value),
             |       wt AS (PARTITION BY user_id ORDER BY value, event_id)
             |ORDER BY user_id, value, event_id""".stripMargin)),

    // W35 (round-17): Lo–MacKinlay variance-ratio test (1988) — the
    // canonical random-walk diagnostic the autocorr (w22) / half-life
    // (w27) tier was missing: under a random walk the variance of
    // q-period differences is q× the 1-period variance, so
    // VR(q) = Var(Δ_q)/(q·Var(Δ_1)) ≈ 1; VR < 1 flags mean reversion,
    // VR > 1 momentum. Overlapping 4-period differences (the paper's
    // estimator), population variances, and the homoskedastic z-stat
    // z = (VR−1)·√(3qn/(2(2q−1)(q−1))) = (VR−1)·√(2n/7) at q=4.
    // Ratio and z computed from r6-rounded variances and the
    // r4-rounded VR (the w27/w33 convention — cross-engine float
    // discipline at every derived step). ONE user-keyed exchange: the
    // lag window and the variance aggregate share the partitioning.
    Q("w35_variance_ratio",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        val d = ev(s, dir)
          .select($"user_id", $"t", $"event_id", $"value")
          .withColumn("r1", $"value" - lag($"value", 1).over(w))
          .withColumn("rq", $"value" - lag($"value", 4).over(w))
        val g = d.groupBy($"user_id")
          .agg(count($"r1").as("n1"), count($"rq").as("n4"),
            r6(var_pop($"r1")).as("var1"), r6(var_pop($"rq")).as("var4"))
          .filter($"n1" >= 16 && $"var1" > 0)
        val vr = r4($"var4" / (lit(4.0) * $"var1"))
        g.select($"user_id", $"n1", $"n4", $"var1", $"var4",
          vr.as("vr4"),
          r4((vr - lit(1.0)) *
            sqrt($"n4".cast("double") * lit(2.0) / lit(7.0))).as("z4"))
      },
      Some(s"""WITH e AS ($OracleEv),
             |d AS (
             |  SELECT user_id, value,
             |    value - lag(value, 1) OVER w AS r1,
             |    value - lag(value, 4) OVER w AS rq
             |  FROM e $OracleWin),
             |g AS (
             |  SELECT user_id, count(r1) AS n1, count(rq) AS n4,
             |    round(var_pop(r1) + 1e-9, 6) AS var1,
             |    round(var_pop(rq) + 1e-9, 6) AS var4
             |  FROM d GROUP BY 1
             |  HAVING count(r1) >= 16
             |     AND round(var_pop(r1) + 1e-9, 6) > 0),
             |v AS (
             |  SELECT *, round(var4 / (4.0 * var1) + 1e-9, 4) AS vr4
             |  FROM g)
             |SELECT user_id, n1, n4, var1, var4, vr4,
             |  round((vr4 - 1.0) * sqrt(n4 * 2.0 / 7.0) + 1e-9, 4) AS z4
             |FROM v""".stripMargin)))
}
