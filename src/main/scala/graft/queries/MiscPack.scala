package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.queries.Rx.{r4, r6}
import graft.text.TextOps

/** Breadth pack: remaining §2.8 scalar families (string / datetime /
  * array) and grouping/positional-window completeness, each as an
  * oracle-checked query. */
object MiscPack extends QueryPack {

  def queries: Seq[Q] = Seq(

    // Skew-safe path as a DECLARED query: event_type is the panel's
    // genuinely hot key (a handful of values over every row), the exact
    // shape AQE's sort-merge skew split does NOT cover when the
    // aggregation itself is the skew. Both Salting primitives run:
    // two-phase (key, salt) aggregation, then the salted join of the
    // full panel against the per-type stats (small side replicated
    // n×, hot rows spread over n reducers). Semantics are
    // salt-invariant, so a plain oracle checks the result; the float
    // gate (value > avg) is rounded identically on both engines.
    Q("j8_salted_skew",
      (s, dir) => {
        import s.implicits._
        import graft.joins.Salting
        val e = Tables.events(s, dir)
          .select($"event_id", $"event_type", $"value")
        val stats = Salting
          .saltedSumCount(e, Seq("event_type"), "value", "event_id", 32)
          .withColumn("avg_value", r6($"sum_value" / $"cnt"))
        val above = Salting.saltedJoin(e,
            stats.select($"event_type", $"avg_value"),
            "event_type", "event_id", 32)
          .filter($"value" > $"avg_value")
          .groupBy($"event_type").agg(count(lit(1)).as("n_above"))
        stats.join(above, Seq("event_type"), "left")
          .select($"event_type", $"cnt", r4($"sum_value").as("sum_value"),
            $"avg_value", coalesce($"n_above", lit(0L)).as("n_above"))
      },
      Some("""WITH st AS (
             |  SELECT event_type, count(*) AS cnt, sum(value) AS sv
             |  FROM events GROUP BY 1),
             |sta AS (
             |  SELECT event_type, cnt, round(sv + 1e-9, 4) AS sum_value,
             |    round(sv / cnt + 1e-9, 6) AS avg_value FROM st),
             |ab AS (
             |  SELECT e.event_type, count(*) AS n_above
             |  FROM events e JOIN sta ON e.event_type = sta.event_type
             |  WHERE e.value > sta.avg_value GROUP BY 1)
             |SELECT sta.event_type, sta.cnt, sta.sum_value, sta.avg_value,
             |  COALESCE(ab.n_above, 0) AS n_above
             |FROM sta LEFT JOIN ab ON sta.event_type = ab.event_type""".stripMargin)),

    // Bucketed co-located fact-fact join as a DECLARED query: both
    // sides read the BucketedLayout (lineitem + orders hash-bucketed on
    // the order key), so the join needs no Exchange on either input and
    // the per-order aggregate — grouping keys ⊇ bucket key — reuses the
    // same distribution: scan → join → agg → top-k as ONE shuffle-free
    // pipeline (BucketedLayoutSpec pins zero Exchange under disabled
    // broadcast). At 100 TB this is the layout that turns the engine's
    // largest shuffle (q12/q18's fact-fact order-key join) into a
    // metadata decision. Bucketing is semantics-neutral, so a plain
    // flat-scan oracle checks the result.
    Q("j9_bucketed_join",
      (s, dir) => {
        import s.implicits._
        import graft.io.BucketedLayout
        val li = BucketedLayout.lineitem(s, dir)
          .select($"l_orderkey", $"l_extendedprice", $"l_discount")
        val o = BucketedLayout.orders(s, dir)
          .select($"o_orderkey", $"o_orderpriority")
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .groupBy($"o_orderkey", $"o_orderpriority")
          .agg(count(lit(1)).as("n_items"),
            r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")))
              .as("revenue"))
          .orderBy(desc("revenue"), $"o_orderkey").limit(50)
      },
      Some("""SELECT o_orderkey, o_orderpriority, count(*) AS n_items,
             |  round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS revenue
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY 1, 2
             |ORDER BY revenue DESC, o_orderkey LIMIT 50""".stripMargin)),

    // Z-ordered 2-D selective scan as a DECLARED query: the layout
    // clusters BOTH l_extendedprice and l_quantity along the Morton
    // curve, so this price-band × quantity-band predicate prunes most
    // files from footer min/max stats alone (ZOrderLayoutSpec measures
    // it; a single-column sort would cluster only one dimension). Both
    // range predicates reach the scan as PushedFilters, so what the
    // file-level curve doesn't skip, row-group stats do. The layout is
    // semantics-neutral — a flat-scan oracle checks the result.
    Q("z1_zorder_range",
      (s, dir) => {
        import s.implicits._
        graft.io.ZOrderLayout.lineitem(s, dir)
          .filter($"l_extendedprice".between(20000.0, 30000.0) &&
            $"l_quantity".between(10.0, 20.0))
          .groupBy($"l_returnflag")
          .agg(count(lit(1)).as("n_items"),
            r4(avg($"l_discount")).as("avg_disc"),
            r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount")))
              .as("revenue"))
      },
      Some("""SELECT l_returnflag, count(*) AS n_items,
             |  round(avg(l_discount) + 1e-9, 4) AS avg_disc,
             |  round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS revenue
             |FROM lineitem
             |WHERE l_extendedprice BETWEEN 20000 AND 30000
             |  AND l_quantity BETWEEN 10 AND 20
             |GROUP BY 1""".stripMargin)),

    // Dynamic partition pruning as a DECLARED query: the
    // date-partitioned events layout joined to a FILTERED calendar dim
    // on the partition column itself. Catalyst can't fold the join
    // into a static predicate, so the weekend filter reaches the scan
    // as a DynamicPruningExpression — the fact side lists only the
    // weekend day-directories at runtime (DppSpec pins the plan shape;
    // at 100 TB this is the difference between scanning 2/7 of the
    // table and all of it whenever the date predicate lives in a dim).
    // The calendar is a static 120-day range around the data (a
    // calendar dim is static by nature); dow via pure integer
    // arithmetic — (epoch_day + 3) % 7, 0 = Monday — on both engines.
    Q("dpp1_dynamic_pruning",
      (s, dir) => {
        import s.implicits._
        val fact = graft.io.EventsLayout.read(s, dir)
        val dim = s.range(19693L, 19813L) // 2023-12-02 .. 2024-03-30
          .select($"id".as("day_num"),
            date_add(lit(java.sql.Date.valueOf("1970-01-01")),
              $"id".cast("int")).as("day"),
            (($"id" + 3) % 7).as("dow"))
          .filter($"dow" >= 5) // weekend
          .select($"day", $"day_num")
        fact.join(dim, Seq("day"))
          .groupBy($"day_num")
          .agg(count(lit(1)).as("n"), r4(sum($"value")).as("sum_value"))
      },
      Some("""WITH e AS (
             |  SELECT epoch_us(ts) // 86400000000 AS day_num, value FROM events),
             |dim AS (SELECT range AS day_num FROM range(19693, 19813)
             |        WHERE (range + 3) % 7 >= 5)
             |SELECT e.day_num, count(*) AS n,
             |  round(sum(value) + 1e-9, 4) AS sum_value
             |FROM e JOIN dim USING (day_num)
             |GROUP BY 1""".stripMargin)),

    // CUBE (full grouping-sets completeness beyond q8's ROLLUP).
    // Entity resolution (record linkage / MDM — the classic big-data
    // workload the dedup tier's CONTENT hashing doesn't cover: match
    // RECORDS by fuzzy key): blocking pass (nation × 17-char name
    // prefix — bounded blocks, the standard ER prefix-blocking key)
    // → pairwise edit-distance scoring inside blocks only
    // (joins.FuzzyJoin: codegen'd levenshtein, never all-pairs)
    // → component canonicalization over the match edges
    // (graph.Components, 2 min-label rounds — blocks can't chain, so
    // round 2 == round 1 is the fixpoint; FuzzyJoinSpec pins it)
    // → entity-size census. At 100 TB the block key bounds pair
    // fan-out to Σ block_size² and everything else is key-keyed aggs.
    Q("er1_entity_resolution",
      (s, dir) => {
        import s.implicits._
        val c = Tables.customer(s, dir)
          .select($"c_custkey".as("id"), $"c_name".as("name"),
            $"c_nationkey".as("nat"))
        val pairs = graft.joins.FuzzyJoin.selfMatch(
          c, "id", "name",
          block = Seq($"nat", substring($"name", 1, 17)), maxDist = 1)
        val edges = pairs.select($"a_id".as("src"), $"b_id".as("dst"))
          .unionByName(pairs.select($"b_id".as("src"), $"a_id".as("dst")))
        val labels = graft.graph.Components.run(edges, k = 2)
        val ent = c.join(labels.withColumnRenamed("node", "id"),
            Seq("id"), "left")
          .select($"id", coalesce($"label", $"id").as("entity_id"))
        ent.groupBy($"entity_id").agg(count(lit(1)).as("n_records"))
          .groupBy($"n_records".as("cluster_size"))
          .agg(count(lit(1)).as("n_entities"),
            sum($"n_records").as("n_customers"))
          .orderBy($"cluster_size")
      },
      Some(s"""WITH c AS (SELECT c_custkey AS id, c_name AS name,
             |            c_nationkey AS nat FROM customer),
             |p AS (
             |  SELECT a.id AS a_id, b.id AS b_id
             |  FROM c a JOIN c b
             |    ON a.nat = b.nat
             |    AND substr(a.name, 1, 17) = substr(b.name, 1, 17)
             |    AND a.id < b.id
             |  WHERE levenshtein(a.name, b.name) <= 1),
             |edges AS MATERIALIZED (SELECT a_id AS src, b_id AS dst FROM p
             |          UNION ALL SELECT b_id, a_id FROM p),
             |${graft.graph.Components.oracleSqlSuffix(2)},
             |ent AS (
             |  SELECT c.id, COALESCE(l.label, c.id) AS entity_id
             |  FROM c LEFT JOIN l_2 l ON l.node = c.id),
             |sz AS (SELECT entity_id, count(*) AS n_records
             |       FROM ent GROUP BY 1)
             |SELECT n_records AS cluster_size, count(*) AS n_entities,
             |  CAST(sum(n_records) AS BIGINT) AS n_customers
             |FROM sz GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Entity resolution, pass 2 (round-12, VERDICT item 5): er1's
    // single prefix block misses any fuzzy pair whose difference falls
    // INSIDE the blocked prefix — the standard recall gap multi-pass
    // blocking exists to close (the ER literature's two-pass scheme:
    // candidates = union over independent blocking keys). er2 runs
    // TWO passes over customer — (nation, 17-char prefix) as er1, plus
    // (nation, 4-char SUFFIX), which catches edit positions the prefix
    // key blocks away (e.g. custkey 2345 vs 12345: names differ at the
    // ten-thousands digit, prefix-17 separates them, suffix-4 pairs
    // them) — unions the candidate edges, canonicalizes components
    // (fixed K=3 min-label rounds, replayed verbatim by the oracle so
    // labels are identical cross-engine by construction), then applies
    // the SURVIVORSHIP rule: latest-wins attribute merge (max-id
    // record's attributes carried by a single max-struct aggregate —
    // the cdc2_merge idiom, never per-column mixing of different
    // records). Scale: both block keys are high-entropy (suffix
    // digits), so Σ block² stays near-linear in records; everything
    // downstream is key-keyed aggregation.
    Q("er2_entity_survivorship",
      (s, dir) => {
        import s.implicits._
        val c = Tables.customer(s, dir)
          .select($"c_custkey".as("id"), $"c_name".as("name"),
            $"c_nationkey".as("nat"), $"c_mktsegment".as("seg"),
            $"c_acctbal".as("bal"))
        val pa = graft.joins.FuzzyJoin.selfMatch(
            c, "id", "name",
            block = Seq($"nat", substring($"name", 1, 17)), maxDist = 1)
          .select($"a_id", $"b_id")
        val pb = graft.joins.FuzzyJoin.selfMatch(
            c, "id", "name",
            block = Seq($"nat", substring($"name", 15, 4)), maxDist = 1)
          .select($"a_id", $"b_id")
        val pairs = pa.unionByName(pb).distinct()
        val edges = pairs.select($"a_id".as("src"), $"b_id".as("dst"))
          .unionByName(pairs.select($"b_id".as("src"), $"a_id".as("dst")))
        val labels = graft.graph.Components.run(edges, k = 3)
        val ent = c.join(labels.withColumnRenamed("node", "id"),
            Seq("id"), "left")
          .select($"id", coalesce($"label", $"id").as("entity_id"),
            $"name", $"seg", $"bal")
        ent.groupBy($"entity_id")
          .agg(count(lit(1)).as("n_records"),
            max(struct($"id", $"name", $"seg", $"bal")).as("s"))
          .select($"entity_id", $"n_records", $"s.id".as("surv_id"),
            $"s.name".as("surv_name"), $"s.seg".as("surv_segment"),
            $"s.bal".as("surv_acctbal"))
      },
      Some(s"""WITH c AS (SELECT c_custkey AS id, c_name AS name,
             |            c_nationkey AS nat, c_mktsegment AS seg,
             |            c_acctbal AS bal FROM customer),
             |pa AS (
             |  SELECT a.id AS a_id, b.id AS b_id
             |  FROM c a JOIN c b
             |    ON a.nat = b.nat
             |    AND substr(a.name, 1, 17) = substr(b.name, 1, 17)
             |    AND a.id < b.id
             |  WHERE levenshtein(a.name, b.name) <= 1),
             |pb AS (
             |  SELECT a.id AS a_id, b.id AS b_id
             |  FROM c a JOIN c b
             |    ON a.nat = b.nat
             |    AND substr(a.name, 15, 4) = substr(b.name, 15, 4)
             |    AND a.id < b.id
             |  WHERE levenshtein(a.name, b.name) <= 1),
             |pr AS (SELECT * FROM pa UNION SELECT * FROM pb),
             |edges AS MATERIALIZED (SELECT a_id AS src, b_id AS dst FROM pr
             |          UNION ALL SELECT b_id, a_id FROM pr),
             |${graft.graph.Components.oracleSqlSuffix(3)},
             |ent AS (
             |  SELECT c.id, COALESCE(l.label, c.id) AS entity_id,
             |    c.name, c.seg, c.bal
             |  FROM c LEFT JOIN l_3 l ON l.node = c.id),
             |sv AS (SELECT entity_id, count(*) AS n_records,
             |         max(id) AS surv_id
             |       FROM ent GROUP BY 1)
             |SELECT sv.entity_id, sv.n_records, sv.surv_id,
             |  e.name AS surv_name, e.seg AS surv_segment,
             |  e.bal AS surv_acctbal
             |FROM sv JOIN ent e ON e.id = sv.surv_id""".stripMargin)),

    Q("q9_cube",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir)
          .cube($"o_orderstatus", $"o_orderpriority")
          .agg(count(lit(1)).as("cnt"), r4(sum($"o_totalprice")).as("sum_price"))
      },
      Some("""SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
             |  round(sum(o_totalprice) + 1e-9, 4) AS sum_price
             |FROM orders
             |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)),

    // Positional window values: first/last/nth in an ordered frame.
    Q("w18_positional",
      (s, dir) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id")
          .orderBy(unix_micros($"ts"), $"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(s, dir)
          .withColumn("first_v", r6(first($"value").over(w)))
          .withColumn("last_v", r6(last($"value").over(w)))
          .withColumn("third_v", r6(nth_value($"value", 3).over(w)))
          .groupBy($"user_id", $"first_v", $"last_v", $"third_v")
          .agg(count(lit(1)).as("n"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events),
             |p AS (
             |  SELECT user_id,
             |    round(first_value(value) OVER w + 1e-9, 6) AS first_v,
             |    round(last_value(value) OVER w + 1e-9, 6) AS last_v,
             |    round(nth_value(value, 3) OVER w + 1e-9, 6) AS third_v
             |  FROM e
             |  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
             |SELECT user_id, first_v, last_v, third_v, count(*) AS n
             |FROM p GROUP BY 1, 2, 3, 4""".stripMargin)),

    // §2.8 string family: case mapping, substring, replace, position,
    // prefix/suffix/contains predicates, edit distance.
    Q("t5_strings",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir).select($"doc_id",
          upper(substring($"text", 1, 12)).as("head_upper"),
          length(regexp_replace($"text", "data", "DATA")).as("len_replaced"),
          instr($"text", "join").as("join_pos"),
          $"text".startsWith("the").as("starts_the"),
          $"text".endsWith(" ").as("ends_space"),
          $"text".contains("window").as("has_window"),
          levenshtein(substring($"text", 1, 20), lit("the fast key order s")).as("edit_dist"))
      },
      Some("""SELECT doc_id,
             |  upper(substr(text, 1, 12)) AS head_upper,
             |  length(replace(text, 'data', 'DATA')) AS len_replaced,
             |  CAST(instr(text, 'join') AS INT) AS join_pos,
             |  starts_with(text, 'the') AS starts_the,
             |  suffix(text, ' ') AS ends_space,
             |  contains(text, 'window') AS has_window,
             |  CAST(levenshtein(substr(text, 1, 20), 'the fast key order s') AS INT)
             |    AS edit_dist
             |FROM documents""".stripMargin)),

    // §2.8 datetime family: component extraction + arithmetic.
    // Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday → +1.
    Q("t6_datetime",
      (s, dir) => {
        import s.implicits._
        Tables.orders(s, dir).select($"o_orderkey",
          year($"o_orderdate").as("y"),
          month($"o_orderdate").as("m"),
          dayofweek($"o_orderdate").as("dow"),
          unix_micros(to_timestamp(date_add($"o_orderdate", 30))).as("plus30d"),
          datediff(to_date(lit("2002-01-01")), to_date($"o_orderdate")).as("days_to_2002"),
          quarter($"o_orderdate").as("q"))
      },
      Some("""SELECT o_orderkey,
             |  CAST(year(o_orderdate) AS INT) AS y,
             |  CAST(month(o_orderdate) AS INT) AS m,
             |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
             |  epoch_us(o_orderdate + INTERVAL 30 DAY) AS plus30d,
             |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')
             |       AS INT) AS days_to_2002,
             |  CAST(quarter(o_orderdate) AS INT) AS q
             |FROM orders""".stripMargin)),

    // SQL-surface parity (SURVEY §4.2): the engine's registered
    // functions (GraftExtensions) drive a query written ENTIRELY in
    // spark.sql — a reference user's SQL notebook works verbatim. Each
    // graft_* name lowers to the same native expression tree the Column
    // API builds, so the oracle is the same SQL the Column-path queries
    // t3/t4 verify.
    Q("sql1_text_fns",
      (s, dir) => {
        graft.GraftExtensions.register(s)
        Tables.documents(s, dir).createOrReplaceTempView("sql1_docs")
        s.sql("""SELECT doc_id,
                |  graft_token_count(text) AS bpeish_tokens,
                |  size(graft_tokens(text)) AS ws_tokens,
                |  graft_fingerprint(text) AS fingerprint,
                |  round(graft_clip(CAST(n_chars AS DOUBLE) / 1000.0, 0.1, 0.9)
                |        + 1e-9, 6) AS len_clip
                |FROM sql1_docs""".stripMargin)
      },
      Some("""SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
             |       AS INT) AS bpeish_tokens,
             |  len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
             |  md5(array_to_string(list_sort(list_distinct(
             |    string_split_regex(trim(regexp_replace(lower(text),
             |      '[^a-z0-9\s]', '', 'g')), '\s+'))), ' ')) AS fingerprint,
             |  round(least(greatest(CAST(n_chars AS DOUBLE) / 1000.0, 0.1), 0.9)
             |        + 1e-9, 6) AS len_clip
             |FROM documents""".stripMargin)),

    // SQL-surface parity for the vector family: graft_dot / graft_cosine
    // resolve to the codegen'd DotProduct fold (left-to-right, same
    // operand order as the DuckDB list_reduce mirror — see s1).
    Q("sql2_vector_fns",
      (s, dir) => {
        graft.GraftExtensions.register(s)
        Tables.embeddings(s, dir)
          .selectExpr("vec_id", "CAST(embedding AS ARRAY<DOUBLE>) AS v")
          .createOrReplaceTempView("sql2_emb")
        s.sql("""SELECT a.vec_id,
                |  round(graft_dot(a.v, a.v) + 1e-9, 6) AS norm2,
                |  round(graft_cosine(a.v, b.v) + 1e-9, 6) AS cos_next
                |FROM sql2_emb a JOIN sql2_emb b ON b.vec_id = a.vec_id + 1""".stripMargin)
      },
      Some("""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
             |          FROM embeddings),
             |d AS (
             |  SELECT a.vec_id,
             |    list_reduce(list_prepend(0.0,
             |      list_transform(range(1, len(a.v) + 1), i -> a.v[i] * a.v[i])),
             |      (acc, x) -> acc + x) AS d_aa,
             |    list_reduce(list_prepend(0.0,
             |      list_transform(range(1, len(b.v) + 1), i -> b.v[i] * b.v[i])),
             |      (acc, x) -> acc + x) AS d_bb,
             |    list_reduce(list_prepend(0.0,
             |      list_transform(range(1, len(a.v) + 1), i -> a.v[i] * b.v[i])),
             |      (acc, x) -> acc + x) AS d_ab
             |  FROM e a JOIN e b ON b.vec_id = a.vec_id + 1)
             |SELECT vec_id, round(d_aa + 1e-9, 6) AS norm2,
             |  round((d_ab / nullif(sqrt(d_aa), 0)) / nullif(sqrt(d_bb), 0)
             |        + 1e-9, 6) AS cos_next
             |FROM d""".stripMargin)),

    // SQL-surface parity for the bounded-heap top-k aggregate:
    // graft_topk(sort_key, payload, k) grouped and exploded entirely in
    // SQL. Heap semantics (ascending struct sort key) mirror the o6
    // Column-API path; the oracle is the row_number form.
    Q("sql4_topk_agg",
      (s, dir) => {
        graft.GraftExtensions.register(s)
        Tables.documents(s, dir).createOrReplaceTempView("sql4_docs")
        s.sql("""WITH t AS (
                |  SELECT lang,
                |    graft_topk(struct(-n_chars, doc_id),
                |               struct(doc_id, n_chars), 3) AS tk
                |  FROM sql4_docs GROUP BY lang)
                |SELECT lang, pos + 1 AS rank,
                |  kv.value.doc_id AS doc_id, kv.value.n_chars AS n_chars
                |FROM t LATERAL VIEW posexplode(tk) AS pos, kv""".stripMargin)
      },
      Some("""WITH r AS (
             |  SELECT lang, doc_id, n_chars,
             |    row_number() OVER (PARTITION BY lang
             |      ORDER BY n_chars DESC, doc_id) AS rank
             |  FROM documents)
             |SELECT lang, rank, doc_id, n_chars FROM r WHERE rank <= 3""".stripMargin)),

    // SQL-surface parity for the sketch tier: graft_hll(key, p) — the
    // portable HLL as a NATIVE TypedImperativeAggregate whose buffer IS
    // the m-byte register array (true CRDT merge → map-side combine
    // ships one m-byte buffer per partition, vs the Column path's ≤m
    // register rows). HllAggSpec pins struct-equality against the
    // hll1 Column path; the oracle is hll1's unchanged.
    Q("sql5_hll_agg",
      (s, dir) => {
        graft.GraftExtensions.register(s)
        Tables.events(s, dir).createOrReplaceTempView("sql5_events")
        s.sql("""SELECT h.m, h.v_nonzero, h.zsum40,
                |  round(h.estimate + 1e-9, 4) AS estimate
                |FROM (SELECT graft_hll(event_id, 12) AS h
                |      FROM sql5_events)""".stripMargin)
      },
      Some(graft.sketch.Hll.oracleSql("events", "event_id", p = 12))),

    // The grouped form of sql5 for free: a native aggregate composes
    // with GROUP BY like any built-in — per-type distinct estimates,
    // combine state = one m-byte buffer per (partition, group). Same
    // oracle as hll2's Column path.
    Q("sql6_hll_grouped",
      (s, dir) => {
        graft.GraftExtensions.register(s)
        Tables.events(s, dir).createOrReplaceTempView("sql6_events")
        s.sql("""SELECT event_type, h.m, h.v_nonzero, h.zsum40,
                |  round(h.estimate + 1e-9, 4) AS estimate
                |FROM (SELECT event_type, graft_hll(user_id, 12) AS h
                |      FROM sql6_events GROUP BY event_type)""".stripMargin)
      },
      Some(graft.sketch.Hll.groupedOracleSql(
        "events", "event_type", "event_type", "user_id", p = 12))),

    // SQL-surface parity for the custom window aggregate: `ewm(x, span)
    // OVER w` — the EwmAgg DeclarativeAggregate reached through the SQL
    // parser's window path (w9 verifies the same math via the Column
    // API).
    Q("sql3_window_agg",
      (s, dir) => {
        graft.GraftExtensions.register(s)
        Tables.events(s, dir).createOrReplaceTempView("sql3_events")
        s.sql("""SELECT user_id, event_id, unix_micros(ts) AS t,
                |  round(ewm(value, 12.0) OVER (PARTITION BY user_id
                |    ORDER BY unix_micros(ts), event_id) + 1e-9, 6) AS ewm12
                |FROM sql3_events""".stripMargin)
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS t, value FROM events),
             |l AS (
             |  SELECT user_id, event_id, t, list(value) OVER w AS xs
             |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
             |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT user_id, event_id, t,
             |  round(list_reduce(xs,
             |    (acc, x) -> 2.0/13.0 * x + (1.0 - 2.0/13.0) * acc) + 1e-9, 6)
             |    AS ewm12
             |FROM l""".stripMargin)),

    // §2.8 array family over tokenized text: sort/distinct/slice/
    // contains/position.
    Q("t7_arrays",
      (s, dir) => {
        import s.implicits._
        Tables.documents(s, dir)
          .select($"doc_id", TextOps.tokens($"text").as("toks"))
          .select($"doc_id",
            size($"toks").as("n"),
            size(array_distinct($"toks")).as("n_distinct"),
            element_at(array_sort(array_distinct($"toks")), 1).as("first_sorted"),
            concat_ws("-", slice($"toks", 1, 3)).as("head3"),
            array_contains($"toks", "data").as("has_data"),
            array_position($"toks", "join").cast("int").as("join_idx"))
      },
      Some("""WITH d AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
             |          FROM documents)
             |SELECT doc_id,
             |  len(toks) AS n,
             |  len(list_distinct(toks)) AS n_distinct,
             |  list_sort(list_distinct(toks))[1] AS first_sorted,
             |  array_to_string(toks[1:3], '-') AS head3,
             |  list_contains(toks, 'data') AS has_data,
             |  CAST(coalesce(list_position(toks, 'join'), 0) AS INT) AS join_idx
             |FROM d""".stripMargin)),

    // G25 (round 12): ROLLUP with GROUPING_ID — extends q8_rollup
    // (which checks rollup VALUES) with the level-identity contract:
    // grouping_id() disambiguates subtotal rows from genuine NULL
    // group keys and is replayed by DuckDB's GROUPING() bitmask, so
    // the subtotal STRUCTURE is hash-checked, not inferred from NULLs
    // (the reference's pandas pipeline has no grouping-sets family at
    // all — SURVEY §2.5). Spark's rollup stays a single Expand + one
    // aggregate; the day key follows the epoch-µs convention so
    // dtypes are engine-identical.
    Q("g25_rollup",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir)
          .select($"event_type",
            unix_micros(date_trunc("day", $"ts")).as("day"), $"value")
          .rollup($"event_type", $"day")
          .agg(count(lit(1)).as("n"), r6(sum($"value")).as("sum_value"),
            grouping_id($"event_type", $"day").cast("int").as("lvl"))
          .orderBy($"lvl", $"event_type", $"day")
      },
      Some("""WITH e AS (SELECT event_type,
             |    epoch_us(date_trunc('day', ts)) AS day, value FROM events)
             |SELECT event_type, day,
             |  count(*) AS n, round(sum(value) + 1e-9, 6) AS sum_value,
             |  CAST(GROUPING(event_type, day) AS INT) AS lvl
             |FROM e
             |GROUP BY ROLLUP (event_type, day)
             |ORDER BY lvl, event_type, day""".stripMargin)))
}
