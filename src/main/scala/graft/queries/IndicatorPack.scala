package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.features.{Ewm, Indicators}
import graft.features.WindowOps._
import graft.queries.Rx.{r4, r6}
import graft.regimes.Regimes

/** Indicator + regime tier (SURVEY §2.5 W9-W11, §2.2 P5, §2.4 G2/G13, §2.3 J4).
  *
  * The events panel plays the OHLCV role: `value` = close, and the
  * numeric `props.k` JSON field = volume (also exercising the JSON
  * scalar family of §2.8).
  *
  * The EWM oracle uses DuckDB `list_reduce` over a running window list —
  * O(n²) in the oracle but bit-identical to the engine's linear
  * `mapPartitions` recursion because both evaluate α·x + (1−α)·y in the
  * same operation order.
  */
object IndicatorPack extends QueryPack {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("t", unix_micros(col("ts")))

  private val OracleEv =
    "SELECT event_id, epoch_us(ts) AS t, user_id, event_type, value, props FROM events"

  def queries: Seq[Q] = Seq(

    // EWMA volatility (the RiskMetrics recursion σ²ₜ = λσ²ₜ₋₁ +
    // (1−λ)r²ₜ) — the W9 EWM machinery applied to squared returns,
    // with λ = 15/16 = 0.9375 chosen DYADIC so α = 2^-4 is exactly
    // representable and the recursion is bit-equal cross-engine with
    // no rounding games (α = 0.06 would already differ in the last
    // ulp between `2/(2/0.06)` formulations). Same single
    // Exchange+Sort as every EwmAgg window; first-return rows (null
    // lag) are excluded before the fold on both engines.
    Q("w30_ewma_vol",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        val lagv = lag($"value", 1).over(w)
        ev(s, dir).select($"user_id", $"event_id", $"t", $"value")
          .withColumn("r", when(lagv.isNull || lagv === 0, lit(null))
            .otherwise($"value" / lagv - 1))
          .filter($"r".isNotNull)
          .withColumn("ewvar", graft.features.EwmAgg.ewm($"r" * $"r", 31.0)
            .over(Window.partitionBy($"user_id").orderBy($"t", $"event_id")
              .rowsBetween(Window.unboundedPreceding, 0)))
          .select($"user_id", $"event_id", $"t",
            r6(sqrt($"ewvar")).as("ewma_vol"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value
             |          FROM events),
             |l AS (
             |  SELECT user_id, event_id, t, value,
             |    lag(value) OVER (PARTITION BY user_id
             |      ORDER BY t, event_id) AS lv
             |  FROM e),
             |r AS (
             |  SELECT user_id, event_id, t,
             |    CASE WHEN lv IS NULL OR lv = 0 THEN NULL
             |         ELSE value / lv - 1 END AS r
             |  FROM l),
             |f AS (SELECT * FROM r WHERE r IS NOT NULL),
             |x AS (
             |  SELECT user_id, event_id, t,
             |    list(r * r) OVER w AS xs
             |  FROM f WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
             |                      ROWS BETWEEN UNBOUNDED PRECEDING
             |                        AND CURRENT ROW))
             |SELECT user_id, event_id, t,
             |  round(sqrt(list_reduce(xs,
             |    (acc, x) -> 0.0625 * x + 0.9375 * acc)) + 1e-9, 6)
             |    AS ewma_vol
             |FROM x""".stripMargin)),

    // W9: pandas ewm(span, adjust=False).mean() + the MACD(12,26,9)
    // composition (lstm_forecasting.py:151-164).
    Q("w9_ewm_macd",
      (s, dir) => {
        import s.implicits._
        val base = ev(s, dir).select($"user_id", $"event_id", $"t", $"value")
        Indicators.withMacd(base, Seq("user_id"), Seq("t", "event_id"), "value")
          .select($"user_id", $"event_id", $"t",
            r6($"macd").as("macd"), r6($"macd_signal").as("macd_signal"),
            r6($"macd_hist").as("macd_hist"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events),
             |l AS (
             |  SELECT user_id, event_id, t,
             |    list(value) OVER w AS xs
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
             |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |m AS (
             |  SELECT user_id, event_id, t,
             |    list_reduce(xs, (acc, x) -> 2.0/13.0 * x + (1.0 - 2.0/13.0) * acc)
             |      - list_reduce(xs, (acc, x) -> 2.0/27.0 * x + (1.0 - 2.0/27.0) * acc)
             |      AS macd
             |  FROM l),
             |ml AS (
             |  SELECT user_id, event_id, t, macd,
             |    list(macd) OVER w AS ms
             |  FROM m WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
             |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |sg AS (
             |  SELECT user_id, event_id, t, macd,
             |    list_reduce(ms, (acc, x) -> 2.0/10.0 * x + (1.0 - 2.0/10.0) * acc) AS macd_signal
             |  FROM ml)
             |SELECT user_id, event_id, t,
             |  round(macd + 1e-9, 6) AS macd,
             |  round(macd_signal + 1e-9, 6) AS macd_signal,
             |  round(macd - macd_signal + 1e-9, 6) AS macd_hist
             |FROM sg""".stripMargin)),

    // W10: RSI(14) (lstm_forecasting.py:130-148).
    Q("w10_rsi",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        ev(s, dir)
          .withColumn("rsi", r6(Indicators.rsi($"value", 14, w)))
          .select($"user_id", $"event_id", $"t", $"rsi")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events),
             |d AS (
             |  SELECT user_id, event_id, t,
             |    value - lag(value, 1) OVER (PARTITION BY user_id ORDER BY t, event_id) AS delta
             |  FROM e),
             |g AS (
             |  SELECT user_id, event_id, t,
             |    CASE WHEN delta > 0 THEN delta ELSE 0.0 END AS gain,
             |    CASE WHEN delta < 0 THEN -delta ELSE 0.0 END AS loss
             |  FROM d),
             |a AS (
             |  SELECT user_id, event_id, t,
             |    avg(gain) OVER w14 AS avg_gain, avg(loss) OVER w14 AS avg_loss
             |  FROM g WINDOW w14 AS (PARTITION BY user_id ORDER BY t, event_id
             |                        ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
             |SELECT user_id, event_id, t,
             |  round(coalesce(100.0 - 100.0 / (1.0 + avg_gain / nullif(avg_loss, 0.0)), 50.0)
             |        + 1e-9, 6) AS rsi
             |FROM a""".stripMargin)),

    // W11: Bollinger %B + width with the reference's ÷0 fallbacks
    // (lstm_forecasting.py:166-184).
    Q("w11_bollinger",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        ev(s, dir)
          .withColumn("bb_position", r6(Indicators.bollingerPosition($"value", 20, 2.0, w)))
          .withColumn("bb_width", r6(Indicators.bollingerWidth($"value", 20, w)))
          .select($"user_id", $"event_id", $"t", $"bb_position", $"bb_width")
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events),
             |b AS (
             |  SELECT user_id, event_id, t, value,
             |    avg(value) OVER w20 AS ma,
             |    stddev_samp(value) OVER w20 AS sd
             |  FROM e WINDOW w20 AS (PARTITION BY user_id ORDER BY t, event_id
             |                        ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
             |SELECT user_id, event_id, t,
             |  round(coalesce((value - (ma - 2.0 * sd)) / nullif(4.0 * sd, 0.0),
             |                 0.5) + 1e-9, 6) AS bb_position,
             |  round(coalesce(sd / nullif(ma, 0.0), 0.0) + 1e-9, 6) AS bb_width
             |FROM b""".stripMargin)),

    // EP3 prepare_features: the reference's full 16-feature LSTM input
    // frame as one composed plan (FeatureEngineering.prepare) — every
    // rolling/EWM/indicator family at once, with the reference's clips,
    // zero-MA substitution, MACD max-normalization and
    // ffill/bfill/fillna(0) scrub. high=low=close on this table, so
    // price_range degenerates to 0 (the plumbing, clip and scrub are
    // still exercised).
    Q("w20_features16",
      (s, dir) => {
        import s.implicits._
        val base = ev(s, dir)
          .withColumn("volume", get_json_object($"props", "$.k").cast("double"))
          .withColumn("high", $"value").withColumn("low", $"value")
        val feat = graft.features.FeatureEngineering.prepare(
          base, Seq("user_id"), Seq("t", "event_id"),
          "value", "high", "low", "volume")
        feat.select($"user_id" +: $"event_id" +: $"t" +:
          graft.features.FeatureEngineering.featureNames
            .map(c => r6(col(c)).as(c)): _*)
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS t, value,
             |    CAST(json_extract_string(props, '$.k') AS DOUBLE) AS volume
             |  FROM events),
             |l AS (
             |  SELECT *, list(value) OVER wcum AS xs FROM e
             |  WINDOW wcum AS (PARTITION BY user_id ORDER BY t, event_id
             |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |m AS (
             |  SELECT *,
             |    list_reduce(xs, (acc, x) -> 2.0/13.0 * x + (1.0 - 2.0/13.0) * acc)
             |      - list_reduce(xs, (acc, x) -> 2.0/27.0 * x + (1.0 - 2.0/27.0) * acc)
             |      AS macd0
             |  FROM l),
             |ml AS (
             |  SELECT *, list(macd0) OVER wcum AS ms FROM m
             |  WINDOW wcum AS (PARTITION BY user_id ORDER BY t, event_id
             |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             |mh AS (
             |  SELECT *,
             |    list_reduce(ms, (acc, x) -> 2.0/10.0 * x + (1.0 - 2.0/10.0) * acc)
             |      AS sig0
             |  FROM ml),
             |f1 AS (
             |  SELECT *, macd0 - sig0 AS hist0,
             |    value / nullif(lag(value) OVER win, 0) - 1 AS returns,
             |    ln(nullif(value, 0)) - lag(ln(nullif(value, 0))) OVER win
             |      AS log_returns,
             |    volume / nullif(lag(volume) OVER win, 0) - 1 AS vchg0,
             |    value - lag(value) OVER win AS delta
             |  FROM mh WINDOW win AS (PARTITION BY user_id ORDER BY t, event_id)),
             |f2 AS (
             |  SELECT *,
             |    stddev_samp(returns) OVER w5 AS vola5,
             |    stddev_samp(returns) OVER w24 AS vola24,
             |    avg(returns) OVER w5 AS tr5,
             |    avg(returns) OVER w24 AS tr24,
             |    avg(volume) OVER w24 AS vma0,
             |    stddev_samp(volume) OVER w24 AS vstd,
             |    avg(CASE WHEN delta > 0 THEN delta ELSE 0.0 END) OVER w14 AS avg_gain,
             |    avg(CASE WHEN delta < 0 THEN -delta ELSE 0.0 END) OVER w14 AS avg_loss,
             |    avg(value) OVER w20 AS bma,
             |    stddev_samp(value) OVER w20 AS bsd,
             |    max(abs(macd0)) OVER wk AS mmx,
             |    max(abs(sig0)) OVER wk AS smx,
             |    max(abs(hist0)) OVER wk AS hmx,
             |    avg(volume) OVER wk AS gvmean
             |  FROM f1
             |  WINDOW
             |    w5 AS (PARTITION BY user_id ORDER BY t, event_id
             |           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
             |    w24 AS (PARTITION BY user_id ORDER BY t, event_id
             |            ROWS BETWEEN 23 PRECEDING AND CURRENT ROW),
             |    w14 AS (PARTITION BY user_id ORDER BY t, event_id
             |            ROWS BETWEEN 13 PRECEDING AND CURRENT ROW),
             |    w20 AS (PARTITION BY user_id ORDER BY t, event_id
             |            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
             |    wk AS (PARTITION BY user_id)),
             |f3 AS (
             |  SELECT *, CASE WHEN vma0 = 0 THEN gvmean ELSE vma0 END AS vma
             |  FROM f2),
             |f4 AS (
             |  SELECT user_id, event_id, t,
             |    returns,
             |    log_returns,
             |    vola5 AS volatility_5h,
             |    vola24 AS volatility_24h,
             |    tr5 AS trend_5h,
             |    tr24 AS trend_24h,
             |    (value - value) / nullif(value, 0) AS price_range,
             |    CASE WHEN volume / nullif(vma, 0) IS NULL THEN NULL
             |      ELSE least(greatest(volume / nullif(vma, 0), 0.0), 10.0) END
             |      AS volume_intensity,
             |    CASE WHEN vchg0 IS NULL THEN NULL
             |      ELSE least(greatest(vchg0, -10.0), 10.0) END AS volume_change,
             |    CASE WHEN vstd / nullif(vma, 0) IS NULL THEN NULL
             |      ELSE least(greatest(vstd / nullif(vma, 0), 0.0), 10.0) END
             |      AS volume_volatility,
             |    least(greatest(coalesce(
             |      100.0 - 100.0 / (1.0 + avg_gain / nullif(avg_loss, 0.0)), 50.0),
             |      0.0), 100.0) AS rsi,
             |    least(greatest(CASE WHEN mmx = 0 THEN macd0 ELSE macd0 / mmx END,
             |      -1.0), 1.0) AS macd,
             |    least(greatest(CASE WHEN smx = 0 THEN sig0 ELSE sig0 / smx END,
             |      -1.0), 1.0) AS macd_signal,
             |    least(greatest(CASE WHEN hmx = 0 THEN hist0 ELSE hist0 / hmx END,
             |      -1.0), 1.0) AS macd_hist,
             |    least(greatest(coalesce(
             |      (value - (bma - 2.0 * bsd)) / nullif(4.0 * bsd, 0.0), 0.5),
             |      0.0), 1.0) AS bb_position,
             |    least(greatest(coalesce(bsd / nullif(bma, 0.0), 0.0), 0.0), 5.0)
             |      AS bb_width
             |  FROM f3)
             |SELECT user_id, event_id, t,
             |  round(coalesce(
             |    last_value(returns IGNORE NULLS) OVER wf,
             |    first_value(returns IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6)
             |    AS returns,
             |  round(coalesce(
             |    last_value(log_returns IGNORE NULLS) OVER wf,
             |    first_value(log_returns IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6)
             |    AS log_returns,
             |  round(coalesce(
             |    last_value(volatility_5h IGNORE NULLS) OVER wf,
             |    first_value(volatility_5h IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6)
             |    AS volatility_5h,
             |  round(coalesce(
             |    last_value(volatility_24h IGNORE NULLS) OVER wf,
             |    first_value(volatility_24h IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6)
             |    AS volatility_24h,
             |  round(coalesce(
             |    last_value(trend_5h IGNORE NULLS) OVER wf,
             |    first_value(trend_5h IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6)
             |    AS trend_5h,
             |  round(coalesce(
             |    last_value(trend_24h IGNORE NULLS) OVER wf,
             |    first_value(trend_24h IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6)
             |    AS trend_24h,
             |  round(coalesce(
             |    last_value(price_range IGNORE NULLS) OVER wf,
             |    first_value(price_range IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6)
             |    AS price_range,
             |  round(coalesce(
             |    last_value(volume_intensity IGNORE NULLS) OVER wf,
             |    first_value(volume_intensity IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6)
             |    AS volume_intensity,
             |  round(coalesce(
             |    last_value(volume_change IGNORE NULLS) OVER wf,
             |    first_value(volume_change IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6)
             |    AS volume_change,
             |  round(coalesce(
             |    last_value(volume_volatility IGNORE NULLS) OVER wf,
             |    first_value(volume_volatility IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6)
             |    AS volume_volatility,
             |  round(coalesce(
             |    last_value(rsi IGNORE NULLS) OVER wf,
             |    first_value(rsi IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6) AS rsi,
             |  round(coalesce(
             |    last_value(macd IGNORE NULLS) OVER wf,
             |    first_value(macd IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6) AS macd,
             |  round(coalesce(
             |    last_value(macd_signal IGNORE NULLS) OVER wf,
             |    first_value(macd_signal IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6)
             |    AS macd_signal,
             |  round(coalesce(
             |    last_value(macd_hist IGNORE NULLS) OVER wf,
             |    first_value(macd_hist IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6)
             |    AS macd_hist,
             |  round(coalesce(
             |    last_value(bb_position IGNORE NULLS) OVER wf,
             |    first_value(bb_position IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6)
             |    AS bb_position,
             |  round(coalesce(
             |    last_value(bb_width IGNORE NULLS) OVER wf,
             |    first_value(bb_width IGNORE NULLS) OVER wb, 0.0) + 1e-9, 6)
             |    AS bb_width
             |FROM f4
             |WINDOW
             |  wf AS (PARTITION BY user_id ORDER BY t, event_id
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |  wb AS (PARTITION BY user_id ORDER BY t, event_id
             |         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)""".stripMargin)),

    // P5 + G2: the 5-class short-term regime classifier + distribution
    // (short_term.py:50-80, market_analysis.py:32-48). Close = value,
    // volume = props.k (JSON scalar extraction, §2.8).
    Q("p5_regime_dist",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        val base = ev(s, dir)
          .withColumn("volume", get_json_object($"props", "$.k").cast("double"))
        Regimes.shortTermFeatures(base, "value", "volume", w)
          .withColumn("regime", Regimes.shortTermRegime())
          .groupBy($"regime").agg(count(lit(1)).as("n"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS t, value,
             |    CAST(json_extract_string(props, '$.k') AS DOUBLE) AS volume
             |  FROM events),
             |f1 AS (
             |  SELECT *, value / lag(value, 1) OVER w - 1 AS hourly_returns,
             |    value / lag(value, 24) OVER w - 1 AS daily_returns
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |f2 AS (
             |  SELECT *,
             |    CASE WHEN count(hourly_returns) OVER w24 >= 24
             |         THEN stddev_samp(hourly_returns) OVER w24 * sqrt(24.0) END AS volatility,
             |    sign(daily_returns) AS trend_direction
             |  FROM f1 WINDOW w24 AS (PARTITION BY user_id ORDER BY t, event_id
             |                         ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
             |f3 AS (
             |  SELECT *,
             |    CASE WHEN count(trend_direction) OVER w24 >= 24
             |         THEN abs(avg(trend_direction) OVER w24) END AS trend_strength
             |  FROM f2 WINDOW w24 AS (PARTITION BY user_id ORDER BY t, event_id
             |                         ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
             |r AS (
             |  SELECT CASE
             |    WHEN (daily_returns > 0.01 AND trend_strength > 0.6)
             |         AND NOT coalesce(volatility > 0.02, false) THEN 'stable_bull'
             |    WHEN (daily_returns > 0.01 AND trend_strength > 0.6)
             |         AND coalesce(volatility > 0.02, false) THEN 'volatile_bull'
             |    WHEN (daily_returns < -0.01 AND trend_strength > 0.6)
             |         AND NOT coalesce(volatility > 0.02, false) THEN 'stable_bear'
             |    WHEN (daily_returns < -0.01 AND trend_strength > 0.6)
             |         AND coalesce(volatility > 0.02, false) THEN 'volatile_bear'
             |    ELSE 'consolidation' END AS regime
             |  FROM f3)
             |SELECT regime, count(*) AS n FROM r GROUP BY regime""".stripMargin)),

    // W13: regime-transition flags (short_term.py:107-111) over the
    // 5-class labels: volatility-increase = target regime contains
    // "volatile"; trend-change = bull↔bear cross either direction.
    // Flags cast to int on both sides (stable across the driver's
    // arrow/duckdb type coercion).
    Q("w13_flags",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        val base = ev(s, dir)
          .withColumn("volume", get_json_object($"props", "$.k").cast("double"))
        val labeled = Regimes.shortTermFeatures(base, "value", "volume", w)
          .withColumn("regime", Regimes.shortTermRegime())
        val trans = graft.regimes.Transitions.transitions(
          labeled, Seq("user_id"), "t", "event_id", "regime",
          (start, end) => r6((end - start) / lit(3600e6)))
        graft.regimes.Transitions.withFlags(trans)
          .select($"user_id", $"from_label", $"to_label",
            $"start_time", $"end_time", $"duration",
            $"is_volatility_increase".cast("int").as("is_volatility_increase"),
            $"is_trend_change".cast("int").as("is_trend_change"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS t, value,
             |    CAST(json_extract_string(props, '$.k') AS DOUBLE) AS volume
             |  FROM events),
             |f1 AS (
             |  SELECT *, value / lag(value, 1) OVER w - 1 AS hourly_returns,
             |    value / lag(value, 24) OVER w - 1 AS daily_returns
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |f2 AS (
             |  SELECT *,
             |    CASE WHEN count(hourly_returns) OVER w24 >= 24
             |         THEN stddev_samp(hourly_returns) OVER w24 * sqrt(24.0) END AS volatility,
             |    sign(daily_returns) AS trend_direction
             |  FROM f1 WINDOW w24 AS (PARTITION BY user_id ORDER BY t, event_id
             |                         ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
             |f3 AS (
             |  SELECT *,
             |    CASE WHEN count(trend_direction) OVER w24 >= 24
             |         THEN abs(avg(trend_direction) OVER w24) END AS trend_strength
             |  FROM f2 WINDOW w24 AS (PARTITION BY user_id ORDER BY t, event_id
             |                         ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
             |r AS (
             |  SELECT user_id, event_id, t, CASE
             |    WHEN (daily_returns > 0.01 AND trend_strength > 0.6)
             |         AND NOT coalesce(volatility > 0.02, false) THEN 'stable_bull'
             |    WHEN (daily_returns > 0.01 AND trend_strength > 0.6)
             |         AND coalesce(volatility > 0.02, false) THEN 'volatile_bull'
             |    WHEN (daily_returns < -0.01 AND trend_strength > 0.6)
             |         AND NOT coalesce(volatility > 0.02, false) THEN 'stable_bear'
             |    WHEN (daily_returns < -0.01 AND trend_strength > 0.6)
             |         AND coalesce(volatility > 0.02, false) THEN 'volatile_bear'
             |    ELSE 'consolidation' END AS regime
             |  FROM f3),
             |d AS (
             |  SELECT *, CASE WHEN lag(regime) OVER w IS NULL
             |                   OR regime <> lag(regime) OVER w
             |            THEN 1 ELSE 0 END AS chg
             |  FROM r WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |i AS (
             |  SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
             |                           ROWS UNBOUNDED PRECEDING) AS island
             |  FROM d),
             |g AS (
             |  SELECT user_id, island, regime AS from_label, min(t) AS start_ord
             |  FROM i GROUP BY user_id, island, regime),
             |x AS (
             |  SELECT user_id, from_label, start_ord,
             |    lead(from_label) OVER w2 AS to_label,
             |    lead(start_ord) OVER w2 AS end_time
             |  FROM g WINDOW w2 AS (PARTITION BY user_id ORDER BY island))
             |SELECT user_id, from_label, to_label,
             |  start_ord AS start_time, end_time,
             |  round((end_time - start_time) / 3600e6 + 1e-9, 6) AS duration,
             |  CASE WHEN contains(to_label, 'volatile') THEN 1 ELSE 0 END
             |    AS is_volatility_increase,
             |  CASE WHEN (contains(from_label, 'bull') AND contains(to_label, 'bear'))
             |         OR (contains(from_label, 'bear') AND contains(to_label, 'bull'))
             |       THEN 1 ELSE 0 END AS is_trend_change
             |FROM x WHERE to_label IS NOT NULL""".stripMargin)),

    // G13: detector confidence metrics per key (short_term.py:73-78).
    Q("g13_confidence",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        val base = ev(s, dir)
          .withColumn("volume", get_json_object($"props", "$.k").cast("double"))
        val feats = Regimes.shortTermFeatures(base, "value", "volume", w)
        Regimes.confidence(feats, Seq("user_id"))
          .select($"user_id", r4($"trend_confidence").as("trend_confidence"),
            r4($"volatility_stability").as("volatility_stability"),
            r4($"volume_support").as("volume_support"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS t, value,
             |    CAST(json_extract_string(props, '$.k') AS DOUBLE) AS volume
             |  FROM events),
             |f1 AS (
             |  SELECT *, value / lag(value, 1) OVER w - 1 AS hourly_returns,
             |    value / lag(value, 24) OVER w - 1 AS daily_returns
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |f2 AS (
             |  SELECT *,
             |    CASE WHEN count(hourly_returns) OVER w24 >= 24
             |         THEN stddev_samp(hourly_returns) OVER w24 * sqrt(24.0) END AS volatility,
             |    CASE WHEN count(volume) OVER w24 >= 24
             |         THEN avg(volume) OVER w24 END AS volume_ma,
             |    sign(daily_returns) AS trend_direction
             |  FROM f1 WINDOW w24 AS (PARTITION BY user_id ORDER BY t, event_id
             |                         ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
             |f3 AS (
             |  SELECT *, volume / volume_ma AS volume_ratio,
             |    CASE WHEN count(trend_direction) OVER w24 >= 24
             |         THEN abs(avg(trend_direction) OVER w24) END AS trend_strength
             |  FROM f2 WINDOW w24 AS (PARTITION BY user_id ORDER BY t, event_id
             |                         ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
             |SELECT user_id,
             |  round(avg(trend_strength) + 1e-9, 4) AS trend_confidence,
             |  round(1.0 - stddev_samp(volatility) / avg(volatility) + 1e-9, 4)
             |    AS volatility_stability,
             |  round(avg(CASE WHEN volume_ratio > 1 THEN 1.0 ELSE 0.0 END) + 1e-9, 4)
             |    AS volume_support
             |FROM f3 GROUP BY user_id""".stripMargin)),

    // J4 + coarse regime (utils.py:4-33): per-key percentile thresholds
    // broadcast-joined back onto the panel, 3-class codes, distribution
    // per key.
    Q("j4_coarse_regime",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        Regimes.coarseRegime(ev(s, dir), Seq("user_id"), "value", w)
          .groupBy($"user_id", $"regime_code").agg(count(lit(1)).as("n"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events),
             |f1 AS (
             |  SELECT *, value / lag(value, 1) OVER w - 1 AS ret,
             |    value / lag(value, 24) OVER w - 1 AS mom
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)),
             |f2 AS (
             |  SELECT *,
             |    CASE WHEN count(ret) OVER w24 >= 24
             |         THEN stddev_samp(ret) OVER w24 END AS vol
             |  FROM f1 WINDOW w24 AS (PARTITION BY user_id ORDER BY t, event_id
             |                         ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)),
             |thr AS (
             |  SELECT user_id, quantile_cont(vol, 0.8) AS vol_thr,
             |    quantile_cont(abs(mom), 0.9) AS mom_thr
             |  FROM f2 GROUP BY user_id),
             |r AS (
             |  SELECT f2.user_id,
             |    CASE
             |      WHEN (mom < -mom_thr) OR (mom < 0 AND vol >= vol_thr) THEN 1
             |      WHEN (mom > mom_thr) OR (mom > 0 AND vol >= vol_thr) THEN 0
             |      ELSE 2 END AS regime_code
             |  FROM f2 JOIN thr ON f2.user_id = thr.user_id)
             |SELECT user_id, regime_code, count(*) AS n
             |FROM r GROUP BY user_id, regime_code""".stripMargin)))
}
