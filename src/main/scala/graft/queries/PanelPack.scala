package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.analytics.{Analytics, Metrics}
import graft.features.WindowOps._
import graft.queries.Rx.{r4, r6}
import graft.regimes.Transitions
import graft.sequence.Sequences

/** Panel analytics + sequence prep + metrics
  * (SURVEY §2.4 G1/G10/G12/G14, §2.3 J3/J5, §2.5 W15-W16, §2.6 O2,
  * §2.2 P2-P3, §2.7 set ops). */
object PanelPack extends QueryPack {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir).withColumn("t", unix_micros(col("ts")))

  private val OracleEv =
    "SELECT event_id, epoch_us(ts) AS t, user_id, event_type, value, props FROM events"

  /** g15's aggregate, factored so GoldenPinSpec pins the SAME code path
    * on a frozen fixture (sketch internals have no second engine; the
    * sketches are deterministic for fixed input + partitioning).
    *
    * Two hash aggregates + a 5-row join, NOT one agg: mixing
    * countDistinct (Expand plan) with the TypedImperative percentile
    * aggregates forces the whole aggregation onto the sort-based
    * interpreted path (~2.5s); split, each side stays a codegen'd
    * hash aggregate (~0.5s combined). */
  private[graft] def g15Agg(e: DataFrame): DataFrame = {
    import e.sparkSession.implicits._
    val cds = e.groupBy($"event_type").agg(
      countDistinct($"user_id").as("exact_users"),
      approx_count_distinct($"user_id", 0.02).as("approx_users"))
    val pcts = e.groupBy($"event_type").agg(
      Rx.r4(percentile($"value", lit(0.5))).as("exact_p50"),
      Rx.r4(percentile_approx($"value", lit(0.5), lit(10000))).as("approx_p50"))
    cds.join(pcts, "event_type")
  }

  def queries: Seq[Q] = Seq(

    // G1: the 13-feature per-symbol aggregate as ONE groupBy over a
    // windowed frame (market_analysis.py:250-273 loops symbols; we don't).
    // skew/kurt: Spark = population g1/g2; DuckDB sample-corrects skew
    // (convert) and offers kurtosis_pop directly.
    Q("g1_symbol_features",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        val base = ev(s, dir)
          .withColumn("volume", get_json_object($"props", "$.k").cast("double"))
          .withColumn("ret", pctChange($"value", 1, w))
          .withColumn("mom24", pctChange($"value", 24, w))
          .withColumn("mom168", pctChange($"value", 168, w))
          .withColumn("vratio", ratioToRollMean($"volume", 24, w))
        Analytics.symbolFeatures(base, Seq("user_id"), "event_type", "value", "volume")
          .select($"user_id", r4($"volatility").as("volatility"),
            r4($"annual_return").as("annual_return"),
            r4($"ret_skew").as("ret_skew"), r4($"ret_kurt").as("ret_kurt"),
            r4($"volume_trend").as("volume_trend"),
            r4($"volume_volatility").as("volume_volatility"),
            $"n_labels", r4($"momentum_1d").as("momentum_1d"),
            r4($"momentum_1w").as("momentum_1w"),
            r4($"price_range").as("price_range"),
            r4($"volume_price_corr").as("volume_price_corr"), $"n_rows")
      },
      Some(s"""WITH e AS (
              |  SELECT user_id, event_id, epoch_us(ts) AS t, value, event_type,
              |    CAST(json_extract_string(props, '$$.k') AS DOUBLE) AS volume
              |  FROM events),
              |f AS (
              |  SELECT *,
              |    value / lag(value, 1) OVER w - 1 AS ret,
              |    value / lag(value, 24) OVER w - 1 AS mom24,
              |    value / lag(value, 168) OVER w - 1 AS mom168,
              |    volume / nullif(avg(volume) OVER w24, 0) AS vratio
              |  FROM e
              |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id),
              |    w24 AS (PARTITION BY user_id ORDER BY t, event_id
              |            ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
              |SELECT user_id,
              |  round(stddev_samp(ret) * sqrt(252.0) + 1e-9, 4) AS volatility,
              |  round(avg(ret) * 252.0 + 1e-9, 4) AS annual_return,
              |  round(skewness(ret) * (count(ret) - 2)
              |        / sqrt(count(ret) * (count(ret) - 1.0)) + 1e-9, 4) AS ret_skew,
              |  round(kurtosis_pop(ret) + 1e-9, 4) AS ret_kurt,
              |  round(avg(vratio) + 1e-9, 4) AS volume_trend,
              |  round(stddev_samp(vratio) + 1e-9, 4) AS volume_volatility,
              |  count(DISTINCT event_type) AS n_labels,
              |  round(avg(mom24) + 1e-9, 4) AS momentum_1d,
              |  round(avg(mom168) + 1e-9, 4) AS momentum_1w,
              |  round(avg(abs(ret)) + 1e-9, 4) AS price_range,
              |  round(corr(volume, value) + 1e-9, 4) AS volume_price_corr,
              |  count(*) AS n_rows
              |FROM f GROUP BY user_id""".stripMargin)),

    // G12: z-score with POPULATION std (sklearn StandardScaler ddof=0,
    // market_analysis.py:287-293) — windowed, no self-join.
    Q("g12_zscore",
      (s, dir) => {
        import s.implicits._
        val wAll = Window.partitionBy($"user_id")
        ev(s, dir)
          .withColumn("z", r4(Analytics.zscore($"value", wAll)))
          .select($"user_id", $"event_id", $"t", $"z")
      },
      Some(s"""WITH e AS ($OracleEv)
              |SELECT user_id, event_id, t,
              |  round((value - avg(value) OVER (PARTITION BY user_id))
              |        / stddev_pop(value) OVER (PARTITION BY user_id) + 1e-9, 4) AS z
              |FROM e""".stripMargin)),

    // G11: mean imputation (`features.fillna(features.mean())`,
    // market_analysis.py:285) — one agg + broadcast fill, no window and
    // no shuffle of the fact table. Nulls injected deterministically
    // (event_id % 17) since the raw panel has none.
    Q("g11_impute",
      (s, dir) => {
        import s.implicits._
        val masked = ev(s, dir)
          .select($"user_id", $"event_id", $"t",
            when($"event_id" % 17 === 0, lit(null).cast("double"))
              .otherwise($"value").as("v_masked"))
        Analytics.imputeMean(masked, Seq("v_masked"))
          .select($"user_id", $"event_id", $"t",
            r6($"v_masked").as("v_imputed"),
            ($"event_id" % 17 === 0).cast("int").as("was_null"))
      },
      Some(s"""WITH e AS ($OracleEv),
              |m AS (
              |  SELECT user_id, event_id, t,
              |    CASE WHEN event_id % 17 = 0 THEN NULL ELSE value END AS v_masked
              |  FROM e),
              |a AS (SELECT avg(v_masked) AS mv FROM m)
              |SELECT user_id, event_id, t,
              |  round(coalesce(v_masked, mv) + 1e-9, 6) AS v_imputed,
              |  CASE WHEN event_id % 17 = 0 THEN 1 ELSE 0 END AS was_null
              |FROM m, a""".stripMargin)),

    // J3: long→wide pivot (market_analysis.py:76-87 regime pivot shape).
    Q("j3_pivot",
      (s, dir) => {
        import s.implicits._
        ev(s, dir).groupBy($"user_id")
          .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0)
      },
      Some("""SELECT user_id,
             |  count(*) FILTER (event_type = 'click') AS click,
             |  count(*) FILTER (event_type = 'error') AS error,
             |  count(*) FILTER (event_type = 'purchase') AS purchase,
             |  count(*) FILTER (event_type = 'signup') AS signup,
             |  count(*) FILTER (event_type = 'view') AS view
             |FROM events GROUP BY user_id""".stripMargin)),

    // J7: wide→long unpivot (pandas melt / DataFrame.unpivot) — the
    // inverse of J3, closing the reshape family. Zero-count cells from
    // the filled wide frame survive as explicit 0 rows.
    Q("j7_unpivot",
      (s, dir) => {
        import s.implicits._
        val types = Seq("click", "error", "purchase", "signup", "view")
        val wide = ev(s, dir).groupBy($"user_id")
          .pivot("event_type", types).agg(count(lit(1)))
          .na.fill(0)
        wide.unpivot(Array($"user_id"), types.map(col).toArray,
          "event_type", "n")
      },
      Some("""WITH u AS (SELECT DISTINCT user_id FROM events),
             |t(event_type) AS (VALUES
             |  ('click'),('error'),('purchase'),('signup'),('view')),
             |c AS (SELECT user_id, event_type, count(*) AS n
             |      FROM events GROUP BY 1, 2)
             |SELECT u.user_id, t.event_type, coalesce(c.n, 0) AS n
             |FROM u CROSS JOIN t
             |LEFT JOIN c ON c.user_id = u.user_id
             |           AND c.event_type = t.event_type""".stripMargin)),

    // J5 + G10: correlation matrix as unordered key pairs — daily value
    // sums per event_type, aligned on day, pairwise-complete Pearson
    // (market_analysis.py:74-89 + 310-318).
    Q("g10_corr_pairs",
      (s, dir) => {
        import s.implicits._
        val daily = ev(s, dir)
          .groupBy(unix_micros(date_trunc("day", $"ts")).as("day"), $"event_type")
          .agg(sum($"value").as("v"))
        Analytics.pairwiseCorr(daily, "day", "event_type", "v")
          .select($"key_a", $"key_b", r4($"corr").as("corr"), $"n")
      },
      Some("""WITH d AS (
             |  SELECT epoch_us(date_trunc('day', ts)) AS day, event_type,
             |    sum(value) AS v
             |  FROM events GROUP BY 1, 2)
             |SELECT a.event_type AS key_a, b.event_type AS key_b,
             |  round(corr(a.v, b.v) + 1e-9, 4) AS corr, count(*) AS n
             |FROM d a JOIN d b ON a.day = b.day AND a.event_type < b.event_type
             |GROUP BY 1, 2""".stripMargin)),

    // G14 (1/2): confusion matrix — prediction = previous event_type
    // (deterministic stand-in for the classifier head).
    Q("g14_confusion",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        val preds = ev(s, dir)
          .withColumn("pred", lag($"event_type", 1).over(w))
          .filter($"pred".isNotNull)
        Metrics.confusion(preds, "event_type", "pred",
          Seq("click", "error", "purchase", "signup", "view"))
      },
      Some("""WITH p AS (
             |  SELECT event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id) AS pred
             |  FROM events),
             |f AS (SELECT * FROM p WHERE pred IS NOT NULL)
             |SELECT event_type AS label,
             |  count(*) FILTER (pred = 'click') AS click,
             |  count(*) FILTER (pred = 'error') AS error,
             |  count(*) FILTER (pred = 'purchase') AS purchase,
             |  count(*) FILTER (pred = 'signup') AS signup,
             |  count(*) FILTER (pred = 'view') AS view
             |FROM f GROUP BY event_type""".stripMargin)),

    // G14 (2/2): accuracy + per-class precision/recall/F1 from one
    // confusion reduction.
    Q("g14_f1",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        val preds = ev(s, dir)
          .withColumn("pred", lag($"event_type", 1).over(w))
          .filter($"pred".isNotNull)
        Metrics.perClassF1(preds, "event_type", "pred")
          .select($"label", $"tp", $"fp", $"fn",
            r6($"accuracy").as("accuracy"), r6($"precision").as("precision"),
            r6($"recall").as("recall"), r6($"f1").as("f1"))
      },
      Some("""WITH p AS (
             |  SELECT event_type AS t,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id) AS pred
             |  FROM events),
             |f AS (SELECT * FROM p WHERE pred IS NOT NULL),
             |acc AS (
             |  SELECT CAST(count(*) FILTER (t = pred) AS DOUBLE) / count(*) AS accuracy
             |  FROM f),
             |cls AS (SELECT DISTINCT t AS label FROM f),
             |st AS (
             |  SELECT label,
             |    (SELECT count(*) FROM f WHERE t = label AND pred = label) AS tp,
             |    (SELECT count(*) FROM f WHERE pred = label AND t <> label) AS fp,
             |    (SELECT count(*) FROM f WHERE t = label AND pred <> label) AS fn
             |  FROM cls)
             |SELECT label, tp, fp, fn,
             |  round(accuracy + 1e-9, 6) AS accuracy,
             |  round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0) + 1e-9, 6) AS precision,
             |  round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0) + 1e-9, 6) AS recall,
             |  round(2.0 * tp / nullif(2 * tp + fp + fn, 0) + 1e-9, 6) AS f1
             |FROM st, acc""".stripMargin)),

    // W15: sliding 30-row sequence materialization (lstm_forecasting.py:
    // 186-192) — surfaced via order-sensitive scalars of the array.
    Q("w15_sequences",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        ev(s, dir)
          .withColumn("seq", Sequences.slidingSequence($"value", 30, w))
          .filter($"seq".isNotNull)
          .select($"user_id", $"event_id", $"t",
            size($"seq").as("seq_n"),
            r4(aggregate($"seq", lit(0.0), (acc, x) => acc + x)).as("seq_sum"),
            r6(element_at($"seq", 1)).as("seq_first"),
            r6(element_at($"seq", 30)).as("seq_last"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events),
             |l AS (
             |  SELECT user_id, event_id, t,
             |    list(value) OVER (PARTITION BY user_id ORDER BY t, event_id
             |                      ROWS BETWEEN 29 PRECEDING AND CURRENT ROW) AS seq
             |  FROM e)
             |SELECT user_id, event_id, t,
             |  len(seq) AS seq_n,
             |  round(list_reduce(list_prepend(0.0, seq), (acc, x) -> acc + x) + 1e-9, 4)
             |    AS seq_sum,
             |  round(seq[1] + 1e-9, 6) AS seq_first,
             |  round(seq[30] + 1e-9, 6) AS seq_last
             |FROM l WHERE len(seq) = 30""".stripMargin)),

    // W16: ordered 70/15/15 split with int-truncation semantics
    // (lstm_forecasting.py:210-218) — counts per split bucket.
    Q("w16_split",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
        ev(s, dir)
          .withColumn("bucket", Sequences.orderedSplit(w))
          .groupBy($"user_id", $"bucket").agg(count(lit(1)).as("n"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t FROM events),
             |r AS (
             |  SELECT user_id,
             |    row_number() OVER (PARTITION BY user_id ORDER BY t, event_id) AS rn,
             |    count(*) OVER (PARTITION BY user_id) AS n
             |  FROM e),
             |b AS (
             |  SELECT user_id,
             |    -- CAST to DOUBLE: the reference truncates int(n*0.7) in
             |    -- binary floating point (90*0.7 = 62.999... -> 62); a bare
             |    -- 0.7 literal is DECIMAL in DuckDB and would yield 63.
             |    CASE WHEN rn <= floor(n * CAST(0.7 AS DOUBLE)) THEN 'train'
             |         WHEN rn <= floor(n * CAST(0.7 AS DOUBLE))
             |                    + floor(n * CAST(0.15 AS DOUBLE)) THEN 'val'
             |         ELSE 'test' END AS bucket
             |  FROM r)
             |SELECT user_id, bucket, count(*) AS n FROM b GROUP BY 1, 2""".stripMargin)),

    // G4/O2: top-5 most-common transitions with deterministic tie-break
    // (market_analysis.py:172-173 nlargest(5)).
    Q("o2_top_transitions",
      (s, dir) => {
        import s.implicits._
        val trans = Transitions.transitions(
          ev(s, dir), Seq("user_id"), "t", "event_id", "event_type",
          (start, end) => (end - start).cast("double"))
        trans.groupBy($"from_label", $"to_label").agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), $"from_label", $"to_label")
          .limit(5)
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
             |  FROM g)
             |SELECT from_label, to_label, count(*) AS n
             |FROM x WHERE to_label IS NOT NULL
             |GROUP BY 1, 2 ORDER BY n DESC, from_label, to_label LIMIT 5""".stripMargin)),

    // S6: the period report's numeric content as one oracle-checked row
    // (market_analysis.py:824-841 / period_comparison_stats.txt) —
    // n_transitions, avg regime duration in days, symbols with a
    // transition, avg daily volume, and the top transition with the
    // deterministic (count desc, labels asc) tie-break. The rendered
    // text (Sinks.periodReport) formats exactly this tuple.
    Q("s6_period_report",
      (s, dir) => {
        import s.implicits._
        val e = ev(s, dir)
        val trans = Transitions.transitions(
          e, Seq("user_id"), "t", "event_id", "event_type",
          (start, end) => (end - start).cast("double") / lit(86400.0e6))
        val stats = trans.agg(
          count(lit(1)).as("n_transitions"),
          r4(avg($"duration")).as("avg_duration_days"),
          countDistinct($"user_id").as("n_symbols"))
        val daily = e
          .groupBy(floor($"t" / lit(86400.0e6)).as("__day"))
          .agg(sum($"value").as("__dv"))
          .agg(r4(avg($"__dv")).as("avg_daily_volume"))
        val top = trans.groupBy($"from_label", $"to_label")
          .agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), $"from_label", $"to_label").limit(1)
          .select($"from_label".as("top_from"), $"to_label".as("top_to"),
            $"n".as("top_n"))
        stats.crossJoin(broadcast(daily)).crossJoin(broadcast(top))
      },
      Some("""WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS t, value FROM events),
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
             |    lead(from_label) OVER wi AS to_label,
             |    CAST(lead(start_ord) OVER wi - start_ord AS DOUBLE)
             |      / 86400000000.0 AS duration
             |  FROM g WINDOW wi AS (PARTITION BY user_id ORDER BY island)),
             |tr AS (SELECT * FROM x WHERE to_label IS NOT NULL),
             |st AS (
             |  SELECT count(*) AS n_transitions,
             |    round(avg(duration) + 1e-9, 4) AS avg_duration_days,
             |    count(DISTINCT user_id) AS n_symbols
             |  FROM tr),
             |dv AS (
             |  SELECT round(avg(v) + 1e-9, 4) AS avg_daily_volume FROM (
             |    SELECT floor(t / 86400000000.0) AS day, sum(value) AS v
             |    FROM e GROUP BY 1)),
             |tp AS (
             |  SELECT from_label AS top_from, to_label AS top_to,
             |    count(*) AS top_n
             |  FROM tr GROUP BY 1, 2
             |  ORDER BY top_n DESC, top_from, top_to LIMIT 1)
             |SELECT * FROM st, dv, tp""".stripMargin)),

    // P2 + P3: time-range + membership anti-filter, aggregated — the
    // filters sit on raw scan columns so they push into parquet
    // (market_analysis.py:674-678, 225-227).
    Q("p2_filtered_agg",
      (s, dir) => {
        import s.implicits._
        import graft.io.EventsLayout
        // date-partitioned layout: the `day` predicate prunes whole
        // directories (PartitionFilters — the scan never lists files
        // outside the window), and the RAW µs predicate still prunes
        // row groups inside the boundary days; 2024-01-10..20 UTC
        EventsLayout.read(s, dir)
          .filter($"day" >= lit(EventsLayout.dayOfUs(1704844800000000L)) &&
                  $"day" < lit(EventsLayout.dayOfUs(1705708800000000L)))
          .filter($"ts" >= 1704844800000000L && $"ts" < 1705708800000000L)
          .filter(!$"event_type".isin("error"))
          .groupBy($"event_type")
          .agg(count(lit(1)).as("n"), r4(sum($"value")).as("sum_value"))
      },
      Some("""SELECT event_type, count(*) AS n,
             |  round(sum(value) + 1e-9, 4) AS sum_value
             |FROM events
             |WHERE epoch_us(ts) >= 1704844800000000
             |  AND epoch_us(ts) < 1705708800000000
             |  AND event_type NOT IN ('error')
             |GROUP BY event_type""".stripMargin)),

    // Approximate aggregates (100 TB completeness — the reference has
    // none, SURVEY §2.4 note): HLL++ distinct + quantile sketch. Sketch
    // internals differ across engines → rows-only check; the accuracy
    // contract vs exact values is asserted in ApproxSpec.
    Q("g15_approx",
      (s, dir) => g15Agg(Tables.events(s, dir)),
      None),

    // g15's invariant side-oracle (round-12, VERDICT item 3): the
    // sketch INTERNALS are engine-specific (hence rows-only + pin),
    // but both exact columns are plain SQL — DuckDB recomputes them —
    // and the sketches carry published accuracy contracts the oracle
    // can assert as booleans: HLL++ at rsd 0.02 within ±10% (5σ) of
    // the exact distinct count, percentile_approx at accuracy 10000
    // within 5% relative (+0.05 absolute floor) of the exact median.
    // A sketch regression (wrong p, dropped registers, a broken
    // quantile buffer) goes RED cross-engine.
    Q("g15i_approx_inv",
      (s, dir) => {
        import s.implicits._
        g15Agg(Tables.events(s, dir))
          .select($"event_type", $"exact_users", $"exact_p50",
            (abs($"approx_users" - $"exact_users")
              <= lit(0.1) * $"exact_users").as("hll_ok"),
            (abs($"approx_p50" - $"exact_p50")
              <= lit(0.05) * abs($"exact_p50") + lit(0.05)).as("p50_ok"))
      },
      Some("""SELECT event_type,
             |  count(DISTINCT user_id) AS exact_users,
             |  round(quantile_cont(value, 0.5) + 1e-9, 4) AS exact_p50,
             |  true AS hll_ok, true AS p50_ok
             |FROM events GROUP BY 1""".stripMargin)),

    // §2.7 set ops: INTERSECT / EXCEPT over per-type user sets.
    Q("set_ops",
      (s, dir) => {
        import s.implicits._
        val e = ev(s, dir)
        val purchasers = e.filter($"event_type" === "purchase").select($"user_id").distinct()
        val errorers = e.filter($"event_type" === "error").select($"user_id").distinct()
        purchasers.intersect(errorers).withColumn("op", lit("both"))
          .unionByName(purchasers.except(errorers).withColumn("op", lit("purchase_only")))
      },
      Some("""SELECT user_id, 'both' AS op FROM (
             |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
             |  INTERSECT
             |  SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
             |UNION ALL
             |SELECT user_id, 'purchase_only' AS op FROM (
             |  SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
             |  EXCEPT
             |  SELECT DISTINCT user_id FROM events WHERE event_type = 'error')""".stripMargin)))
}
