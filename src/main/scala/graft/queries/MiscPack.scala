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

    // CUBE (full grouping-sets completeness beyond q8's ROLLUP).
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
             |FROM d""".stripMargin)))
}
