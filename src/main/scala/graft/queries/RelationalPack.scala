package graft.queries

import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.queries.Rx.{r4, r6}

/** Relational core: scans, multi-joins, hash aggregation, top-k
  * (SURVEY §2.1 S1, §2.3 J-series, §2.4 G-aggs, §2.6 O2).
  *
  * Scale notes (100 TB design stance):
  *  - dimension tables (region/nation/customer/supplier/part) are
  *    broadcast explicitly — no shuffle of the fact table on a dim join;
  *  - top-k is `orderBy(...).limit(k)` which Spark plans as
  *    TakeOrderedAndProject (per-partition heaps + driver merge, no
  *    global sort);
  *  - aggregates are plain `groupBy.agg` → partial (map-side) + final
  *    hash aggregation, one shuffle on the group key.
  */
object RelationalPack extends QueryPack {

  def queries: Seq[Q] = Seq(

    // G-agg over the fact table: the reference's per-group multi-aggregate
    // shape (market_analysis.py:250-273 re-keyed to lineitem).
    Q("q1_pricing",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_shipdate" <= to_timestamp(lit("2001-09-02")))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            r4(sum($"l_quantity")).as("sum_qty"),
            r4(avg($"l_extendedprice")).as("avg_price"),
            r4(avg($"l_discount")).as("avg_disc"),
            r4(avg($"l_extendedprice" * (lit(1.0) - $"l_discount") * (lit(1.0) + $"l_tax")))
              .as("avg_charge"),
            count(lit(1)).as("cnt"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity) + 1e-9, 4) AS sum_qty,
             |  round(avg(l_extendedprice) + 1e-9, 4) AS avg_price,
             |  round(avg(l_discount) + 1e-9, 4) AS avg_disc,
             |  round(avg(l_extendedprice * (1 - l_discount) * (1 + l_tax)) + 1e-9, 4) AS avg_charge,
             |  count(*) AS cnt
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '2001-09-02'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // Join + agg + top-k: customer ⋈ orders ⋈ lineitem, revenue per order.
    // customer is the small side → broadcast; lineitem never shuffles on
    // the dim key.
    Q("q3_topk",
      (s, dir) => {
        import s.implicits._
        val cut = to_timestamp(lit("1998-03-15"))
        val cust = Tables.customer(s, dir).filter($"c_mktsegment" === "BUILDING")
          .select($"c_custkey")
        val ord = Tables.orders(s, dir).filter($"o_orderdate" < cut)
          .select($"o_orderkey", $"o_custkey", $"o_orderdate")
        val li = Tables.lineitem(s, dir).filter($"l_shipdate" > cut)
          .select($"l_orderkey", $"l_extendedprice", $"l_discount")
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(cust), $"o_custkey" === $"c_custkey")
          .groupBy($"l_orderkey")
          .agg(r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"),
               min($"o_orderdate").as("o_orderdate"))
          .orderBy(desc("revenue"), $"l_orderkey")
          .limit(10)
      },
      Some("""SELECT l_orderkey,
             |  round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS revenue,
             |  min(o_orderdate) AS o_orderdate
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-03-15'
             |  AND l_shipdate > TIMESTAMP '1998-03-15'
             |GROUP BY l_orderkey
             |ORDER BY revenue DESC, l_orderkey
             |LIMIT 10""".stripMargin)),

    // Multi-hop star join over all four dims + region filter (TPC-H Q5
    // shape): every dim broadcast, fact scans stay pruned to 4 columns.
    Q("q5_starjoin",
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir)
          .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
        val ord = Tables.orders(s, dir)
          .filter($"o_orderdate" >= to_timestamp(lit("1996-01-01")) &&
                  $"o_orderdate" < to_timestamp(lit("1997-01-01")))
          .select($"o_orderkey", $"o_custkey")
        val cust = Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
        val supp = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
        val nat = Tables.nation(s, dir).select($"n_nationkey", $"n_name", $"n_regionkey")
        val reg = Tables.region(s, dir).select($"r_regionkey")
        // orders/customer are fact-sized at 100 TB → shuffle joins (AQE may
        // still broadcast them at small SF); supplier/nation/region are
        // genuinely small → explicit broadcast.
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey")
          .join(broadcast(supp), $"l_suppkey" === $"s_suppkey" &&
                                 $"c_nationkey" === $"s_nationkey")
          .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
          .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
          .groupBy($"n_name")
          .agg(r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"),
               count(lit(1)).as("cnt"))
      },
      Some("""SELECT n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS revenue,
             |  count(*) AS cnt
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-01-01'
             |GROUP BY n_name""".stripMargin)),

    // Scalar-subquery shape (TPC-H Q17): lineitems below 20% of their
    // part's average quantity — expressed as agg + broadcast join (the
    // scalable decorrelation Catalyst would produce).
    Q("q17_scalar_subq",
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir)
          .select($"l_partkey", $"l_quantity", $"l_extendedprice")
        val avgQty = li.groupBy($"l_partkey")
          .agg(avg($"l_quantity").as("avg_qty"))
        li.join(broadcast(avgQty), Seq("l_partkey"))
          .filter($"l_quantity" < lit(0.2) * $"avg_qty")
          .agg(r4(sum($"l_extendedprice") / 7.0).as("avg_yearly"),
               count(lit(1)).as("cnt"))
      },
      Some("""SELECT round(sum(l_extendedprice) / 7.0 + 1e-9, 4) AS avg_yearly,
             |  count(*) AS cnt
             |FROM lineitem l1
             |WHERE l_quantity < 0.2 * (
             |  SELECT avg(l_quantity) FROM lineitem l2
             |  WHERE l2.l_partkey = l1.l_partkey)""".stripMargin)),

    // Correlated-EXISTS over two FACT tables (TPC-H Q4 shape): orders
    // with at least one line shipped >90 days after the order date.
    // Decorrelates to a left-semi join with a non-equi residual — at
    // 100 TB both sides shuffle on l_orderkey/o_orderkey (no broadcast
    // possible); the semi join keeps the probe side un-duplicated so
    // the count never double-counts multi-line orders.
    Q("q4_exists",
      (s, dir) => {
        import s.implicits._
        val ord = Tables.orders(s, dir)
          .filter($"o_orderdate" >= to_timestamp(lit("1997-01-01")) &&
                  $"o_orderdate" < to_timestamp(lit("1998-01-01")))
          .select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
        val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_shipdate")
        ord.join(li,
            $"l_orderkey" === $"o_orderkey" &&
              $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 90 DAYS"),
            "left_semi")
          .groupBy($"o_orderpriority")
          .agg(count(lit(1)).as("order_count"))
      },
      Some("""SELECT o_orderpriority, count(*) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1998-01-01'
             |  AND EXISTS (
             |    SELECT 1 FROM lineitem
             |    WHERE l_orderkey = o_orderkey
             |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
             |GROUP BY o_orderpriority""".stripMargin)),

    // Cross-nation volume shipping (TPC-H Q7 shape): the SAME dim table
    // joined twice under different roles (supplier nation vs customer
    // nation) with an asymmetry predicate — broadcast both aliases,
    // group by the role pair + year.
    Q("q7_nations",
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir)
          .filter($"l_shipdate" >= to_timestamp(lit("1997-01-01")) &&
                  $"l_shipdate" < to_timestamp(lit("1999-01-01")))
          .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount",
            year($"l_shipdate").as("l_year"))
        val ord = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
        val cust = Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
        val supp = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
        val natS = Tables.nation(s, dir)
          .select($"n_nationkey".as("sn_key"), $"n_name".as("supp_nation"))
        val natC = Tables.nation(s, dir)
          .select($"n_nationkey".as("cn_key"), $"n_name".as("cust_nation"))
        li.join(ord, $"l_orderkey" === $"o_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey")
          .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
          .join(broadcast(natS), $"s_nationkey" === $"sn_key")
          .join(broadcast(natC), $"c_nationkey" === $"cn_key")
          .filter($"supp_nation" < $"cust_nation")
          .groupBy($"supp_nation", $"cust_nation", $"l_year")
          .agg(r4(sum($"l_extendedprice" * (lit(1.0) - $"l_discount"))).as("revenue"),
               count(lit(1)).as("cnt"))
      },
      Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             |  year(l_shipdate) AS l_year,
             |  round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS revenue,
             |  count(*) AS cnt
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation sn ON s_nationkey = sn.n_nationkey
             |JOIN nation cn ON c_nationkey = cn.n_nationkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1999-01-01'
             |  AND sn.n_name < cn.n_name
             |GROUP BY 1, 2, 3""".stripMargin)),

    // Conditional-aggregate ratio (TPC-H Q14 shape): promo revenue share
    // in a ship-date window — sum(CASE)/sum over a broadcast part join.
    Q("q14_promo",
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir)
          .filter($"l_shipdate" >= to_timestamp(lit("1997-01-01")) &&
                  $"l_shipdate" < to_timestamp(lit("1997-04-01")))
          .select($"l_partkey", $"l_extendedprice", $"l_discount")
        val pt = Tables.part(s, dir).select($"p_partkey", $"p_type")
        li.join(broadcast(pt), $"l_partkey" === $"p_partkey")
          .agg(
            r4(sum(when($"p_type" === "PROMO",
                $"l_extendedprice" * (lit(1.0) - $"l_discount"))
              .otherwise(lit(0.0))) * 100.0 /
              sum($"l_extendedprice" * (lit(1.0) - $"l_discount")))
              .as("promo_revenue_pct"),
            count(lit(1)).as("cnt"))
      },
      Some("""SELECT
             |  round(100.0 * sum(CASE WHEN p_type = 'PROMO'
             |      THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             |    / sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4)
             |    AS promo_revenue_pct,
             |  count(*) AS cnt
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin)),

    // TPC-H q6 shape: fully-pushed filtered aggregate, no join — every
    // predicate lands in PushedFilters and the scan reads 4 columns.
    Q("q6_forecast",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .filter($"l_shipdate" >= to_timestamp(lit("1997-01-01")) &&
                  $"l_shipdate" < to_timestamp(lit("1998-01-01")) &&
                  $"l_discount" >= 0.05 && $"l_discount" <= 0.07 &&
                  $"l_quantity" < 24.0)
          .agg(r4(sum($"l_extendedprice" * $"l_discount")).as("revenue"),
            count(lit(1)).as("cnt"))
      },
      Some("""SELECT round(sum(l_extendedprice * l_discount) + 1e-9, 4) AS revenue,
             |  count(*) AS cnt
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |  AND l_discount BETWEEN 0.05 AND 0.07
             |  AND l_quantity < 24""".stripMargin)),

    // TPC-H q10 shape: returned-item revenue per customer, top 20 —
    // fact-fact shuffle join (lineitem×orders), customer joined on the
    // shuffled key (AQE picks broadcast when it fits), nation broadcast,
    // TakeOrderedAndProject for the cut. Rank by the ROUNDED revenue
    // with a custkey tie-break (cross-engine float ordering contract).
    Q("q10_returns",
      (s, dir) => {
        import s.implicits._
        val li = Tables.lineitem(s, dir).filter($"l_returnflag" === "R")
          .select($"l_orderkey",
            ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
        val o = Tables.orders(s, dir)
          .filter($"o_orderdate" >= to_timestamp(lit("1997-01-01")) &&
                  $"o_orderdate" < to_timestamp(lit("1997-07-01")))
          .select($"o_orderkey", $"o_custkey")
        val c = Tables.customer(s, dir)
          .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")
        val n = Tables.nation(s, dir).select($"n_nationkey", $"n_name")
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .join(c, $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
          .agg(r4(sum($"rev")).as("revenue"), count(lit(1)).as("n_items"))
          .orderBy(desc("revenue"), $"c_custkey").limit(20)
      },
      Some("""SELECT c_custkey, c_name, c_acctbal, n_name,
             |  round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS revenue,
             |  count(*) AS n_items
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |WHERE l_returnflag = 'R'
             |  AND o_orderdate >= TIMESTAMP '1997-01-01'
             |  AND o_orderdate < TIMESTAMP '1997-07-01'
             |GROUP BY 1, 2, 3, 4
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H q12 shape: case-conditional counts per line status (the
    // testdata schema has no l_shipmode; l_linestatus stands in) — one
    // fact-fact join, all-integer outputs.
    Q("q12_priority",
      (s, dir) => {
        import s.implicits._
        val hi = Seq("1-URGENT", "2-HIGH")
        val li = Tables.lineitem(s, dir)
          .filter($"l_shipdate" >= to_timestamp(lit("1997-01-01")) &&
                  $"l_shipdate" < to_timestamp(lit("1998-01-01")))
          .select($"l_orderkey", $"l_linestatus")
        val o = Tables.orders(s, dir).select($"o_orderkey", $"o_orderpriority")
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .groupBy($"l_linestatus")
          .agg(
            sum(when($"o_orderpriority".isin(hi: _*), 1L).otherwise(0L))
              .as("high_line_count"),
            sum(when(!$"o_orderpriority".isin(hi: _*), 1L).otherwise(0L))
              .as("low_line_count"))
          .orderBy($"l_linestatus")
      },
      Some("""SELECT l_linestatus,
             |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             |  AND l_shipdate < TIMESTAMP '1998-01-01'
             |GROUP BY l_linestatus
             |ORDER BY l_linestatus""".stripMargin)),

    // HAVING-subquery join (TPC-H Q18 shape): orders whose lines sum past
    // a quantity threshold, decorated with the customer. The IN-subquery
    // decorrelates to aggregate → filter → fact-fact equi-join: at 100 TB
    // both lineitem and orders shuffle on the order key (no broadcast
    // side exists); the HAVING filter runs map-side-partial first, so the
    // join's build input is already reduced to qualifying keys. customer
    // is unfiltered here — fact-sized at scale — so it joins post-agg on
    // the (already top-k-bounded at most 100-row) probe side via AQE.
    Q("q18_bigorders",
      (s, dir) => {
        import s.implicits._
        val big = Tables.lineitem(s, dir).select($"l_orderkey", $"l_quantity")
          .groupBy($"l_orderkey")
          .agg(sum($"l_quantity").as("tq"))
          .filter($"tq" > 150.0)
        val ord = Tables.orders(s, dir)
          .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_totalprice")
        val cust = Tables.customer(s, dir).select($"c_custkey", $"c_name")
        ord.join(big, $"o_orderkey" === $"l_orderkey")
          .join(cust, $"o_custkey" === $"c_custkey")
          .select($"c_name", $"c_custkey", $"o_orderkey", $"o_orderdate",
            $"o_totalprice", r4($"tq").as("total_qty"))
          .orderBy(desc("o_totalprice"), $"o_orderkey")
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             |  round(b.tq + 1e-9, 4) AS total_qty
             |FROM orders
             |JOIN (SELECT l_orderkey, sum(l_quantity) AS tq
             |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150) b
             |  ON o_orderkey = b.l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY o_totalprice DESC, o_orderkey
             |LIMIT 100""".stripMargin)),

    // TPC-H Q21 shape (the hardest decorrelation in the suite): a
    // fact-fact EXISTS + NOT EXISTS pair with an inequality on the
    // correlated key, decorrelated to one left_semi and one left_anti
    // join — no subquery re-execution per row, both joins shuffle on
    // l_orderkey so AQE can plan them off the same exchange. "Late" is
    // expressed via return flags on this schema: suppliers SOLELY
    // responsible for a returned line in a multi-supplier finalized
    // order.
    Q("q21_soleblame",
      (s, dir) => {
        import s.implicits._
        val l = Tables.lineitem(s, dir).select($"l_orderkey", $"l_suppkey",
          $"l_returnflag")
        val fOrders = Tables.orders(s, dir)
          .filter($"o_orderstatus" === "F").select($"o_orderkey")
        val returned = l.filter($"l_returnflag" === "R")
          .join(fOrders, $"l_orderkey" === $"o_orderkey").drop("o_orderkey")
        val semi = returned.join(
          l.select($"l_orderkey".as("bk"), $"l_suppkey".as("bs")),
          $"l_orderkey" === $"bk" && $"l_suppkey" =!= $"bs", "left_semi")
        val anti = semi.join(
          l.filter($"l_returnflag" === "R")
            .select($"l_orderkey".as("ck"), $"l_suppkey".as("cs")),
          $"l_orderkey" === $"ck" && $"l_suppkey" =!= $"cs", "left_anti")
        anti.join(broadcast(Tables.supplier(s, dir)
            .select($"s_suppkey", $"s_name")), $"l_suppkey" === $"s_suppkey")
          .groupBy($"s_name").agg(count(lit(1)).as("numwait"))
          .orderBy(desc("numwait"), $"s_name")
          .limit(10)
      },
      Some("""SELECT s_name, count(*) AS numwait
             |FROM lineitem l1
             |JOIN orders o ON o.o_orderkey = l1.l_orderkey
             |             AND o.o_orderstatus = 'F'
             |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
             |WHERE l1.l_returnflag = 'R'
             |  AND EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey
             |                AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey
             |                    AND l3.l_suppkey <> l1.l_suppkey
             |                    AND l3.l_returnflag = 'R')
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin)),

    // TPC-H Q13 shape: outer-join count distribution. The per-customer
    // count must KEEP zero-order customers (left join + count of the
    // right key), then a second tiny aggregate histograms the counts.
    // Scale: one fact-fact shuffle join on custkey + two hash aggs; the
    // second agg's key space is the max order count — trivially small.
    Q("q13_custdist",
      (s, dir) => {
        import s.implicits._
        val ord = Tables.orders(s, dir)
          .filter($"o_orderpriority" =!= "1-URGENT")
          .select($"o_orderkey", $"o_custkey")
        Tables.customer(s, dir).select($"c_custkey")
          .join(ord, $"c_custkey" === $"o_custkey", "left")
          .groupBy($"c_custkey")
          .agg(count($"o_orderkey").as("c_count"))
          .groupBy($"c_count")
          .agg(count(lit(1)).as("custdist"))
          .orderBy(desc("custdist"), desc("c_count"))
      },
      Some("""WITH c_orders AS (
             |  SELECT c_custkey, count(o_orderkey) AS c_count
             |  FROM customer LEFT JOIN orders
             |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
             |  GROUP BY c_custkey)
             |SELECT c_count, count(*) AS custdist
             |FROM c_orders GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q20 shape: nested IN with a correlated HAVING — suppliers
    // who moved > 60 units of some PROMO part in 1996. Decorrelated the
    // way Catalyst would: broadcast-semi the part filter into the
    // lineitem scan, aggregate (suppkey, partkey), then semi-join
    // supplier — the fact table is touched once and never re-scanned
    // per supplier.
    Q("q20_potpromo",
      (s, dir) => {
        import s.implicits._
        val promo = Tables.part(s, dir)
          .filter($"p_type" === "PROMO").select($"p_partkey")
        val qualified = Tables.lineitem(s, dir)
          .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01")) &&
                  $"l_shipdate" < to_timestamp(lit("1997-01-01")))
          .select($"l_partkey", $"l_suppkey", $"l_quantity")
          .join(broadcast(promo), $"l_partkey" === $"p_partkey", "left_semi")
          .groupBy($"l_suppkey", $"l_partkey")
          .agg(sum($"l_quantity").as("qty"))
          .filter($"qty" > 60.0)
          .select($"l_suppkey")
        Tables.supplier(s, dir)
          .join(qualified, $"s_suppkey" === $"l_suppkey", "left_semi")
          .select($"s_suppkey", $"s_name", r4($"s_acctbal").as("s_acctbal"))
          .orderBy($"s_name")
      },
      Some("""SELECT s_suppkey, s_name, round(s_acctbal + 1e-9, 4) AS s_acctbal
             |FROM supplier
             |WHERE s_suppkey IN (
             |  SELECT l_suppkey FROM lineitem
             |  WHERE l_partkey IN (SELECT p_partkey FROM part
             |                      WHERE p_type = 'PROMO')
             |    AND l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate <  TIMESTAMP '1997-01-01'
             |  GROUP BY l_suppkey, l_partkey
             |  HAVING sum(l_quantity) > 60)
             |ORDER BY s_name""".stripMargin)),

    // TPC-H Q22 shape: a global scalar subquery gating the input
    // (balance above the positive-balance average), an anti-join
    // (customers with no urgent order), and substring-derived grouping.
    // The scalar is one aggregate broadcast as a 1-row frame (the J4
    // idiom) — never a collected driver constant baked into the plan.
    // The threshold is rounded (r4, mirrored in the oracle) so the
    // filter gate is independent of double summation order: a balance
    // within 1 ulp of the raw average cannot flip in/out per engine.
    Q("q22_global_scalar",
      (s, dir) => {
        import s.implicits._
        val cust = Tables.customer(s, dir)
        val avgBal = cust.filter($"c_acctbal" > 0.0)
          .agg(r4(avg($"c_acctbal")).as("ab"))
        val eligible = cust.crossJoin(broadcast(avgBal))
          .filter($"c_acctbal" > $"ab")
          .select($"c_custkey", $"c_acctbal",
            substring($"c_name", 16, 2).as("cc"))
        val urgent = Tables.orders(s, dir)
          .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
        eligible.join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"cc")
          .agg(count(lit(1)).as("n_cust"), r4(sum($"c_acctbal")).as("total_bal"))
          .orderBy($"cc")
      },
      Some("""WITH avg_bal AS (
             |  SELECT round(avg(c_acctbal) + 1e-9, 4) AS ab
             |  FROM customer WHERE c_acctbal > 0.0),
             |eligible AS (
             |  SELECT c_custkey, c_acctbal, substr(c_name, 16, 2) AS cc
             |  FROM customer, avg_bal WHERE c_acctbal > ab)
             |SELECT cc, count(*) AS n_cust,
             |  round(sum(c_acctbal) + 1e-9, 4) AS total_bal
             |FROM eligible e
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = e.c_custkey
             |                    AND o.o_orderpriority = '1-URGENT')
             |GROUP BY cc ORDER BY cc""".stripMargin)),

    // TPC-H Q2 shape: the correlated min-equality subquery ("cheapest
    // supplier per part"), decorrelated the way Catalyst plans it — one
    // per-(part, supplier) cost aggregate, a window-min per part, an
    // equality filter — never a per-part re-scan. Cost is min() of
    // per-row doubles (no summation-order dependence), so the argmin
    // equality is engine-exact; dims broadcast.
    Q("q2_argmin",
      (s, dir) => {
        import s.implicits._
        val cost = Tables.lineitem(s, dir)
          .select($"l_partkey", $"l_suppkey",
            ($"l_extendedprice" / $"l_quantity").as("unit"))
          .groupBy($"l_partkey", $"l_suppkey")
          .agg(min($"unit").as("supply_cost"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy($"l_partkey")
        val best = cost
          .withColumn("__mc", min($"supply_cost").over(w))
          .filter($"supply_cost" === $"__mc")
        best
          .join(broadcast(Tables.part(s, dir).filter($"p_size" === 5)
            .select($"p_partkey", $"p_name")), $"l_partkey" === $"p_partkey")
          .join(broadcast(Tables.supplier(s, dir)), $"l_suppkey" === $"s_suppkey")
          .select($"p_partkey", $"p_name", $"s_suppkey", $"s_name",
            r4($"s_acctbal").as("s_acctbal"), r6($"supply_cost").as("supply_cost"))
          .orderBy(desc("s_acctbal"), $"p_partkey", $"s_suppkey")
          .limit(100)
      },
      Some("""WITH cost AS (
             |  SELECT l_partkey, l_suppkey,
             |    min(l_extendedprice / l_quantity) AS supply_cost
             |  FROM lineitem GROUP BY 1, 2),
             |best AS (
             |  SELECT * FROM (
             |    SELECT c.*, min(supply_cost) OVER (PARTITION BY l_partkey) AS mc
             |    FROM cost c)
             |  WHERE supply_cost = mc)
             |SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name,
             |  round(s.s_acctbal + 1e-9, 4) AS s_acctbal,
             |  round(b.supply_cost + 1e-9, 6) AS supply_cost
             |FROM best b
             |JOIN part p ON p.p_partkey = b.l_partkey AND p.p_size = 5
             |JOIN supplier s ON s.s_suppkey = b.l_suppkey
             |ORDER BY s_acctbal DESC, p_partkey, s_suppkey
             |LIMIT 100""".stripMargin)),

    // TPC-H Q11 shape: grouped value vs a fraction of the global total
    // (HAVING sum > f × Σ). The global side reuses the grouped
    // aggregate (rounded group values summed once more — no second
    // fact-table pass) and broadcasts as a 1-row threshold; both the
    // group values and the threshold are rounded so the gate is
    // independent of double summation order. Q11's fixed fraction is
    // scale-DEpendent (more parts → smaller shares), so the fraction
    // here is 1.5/num_groups — "1.5× the mean share", a tail that
    // exists at every SF.
    Q("q11_share",
      (s, dir) => {
        import s.implicits._
        val grouped = Tables.lineitem(s, dir)
          .select($"l_partkey",
            ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("v"))
          .groupBy($"l_partkey").agg(r4(sum($"v")).as("value"))
        val threshold = grouped
          .agg(r4(avg($"value") * lit(1.5)).as("threshold"))
        grouped.crossJoin(broadcast(threshold))
          .filter($"value" > $"threshold")
          .select($"l_partkey", $"value")
          .orderBy(desc("value"), $"l_partkey")
      },
      Some("""WITH g AS (
             |  SELECT l_partkey,
             |    round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4) AS value
             |  FROM lineitem GROUP BY 1),
             |t AS (SELECT round(avg(value) * CAST(1.5 AS DOUBLE) + 1e-9, 4)
             |        AS threshold FROM g)
             |SELECT l_partkey, value FROM g, t
             |WHERE value > threshold
             |ORDER BY value DESC, l_partkey""".stripMargin)),

    // TPC-H Q15 shape: top supplier by quarterly revenue — a revenue
    // aggregate reused by BOTH the max scalar and the equality filter
    // (the "view" of Q15), max broadcast as a 1-row frame. Revenue is
    // rounded before max/equality so ties and the gate are
    // engine-stable; returns every supplier achieving the max.
    Q("q15_top_supplier",
      (s, dir) => {
        import s.implicits._
        val rev = Tables.lineitem(s, dir)
          .filter($"l_shipdate" >= to_timestamp(lit("1996-01-01")) &&
                  $"l_shipdate" < to_timestamp(lit("1996-04-01")))
          .select($"l_suppkey",
            ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("v"))
          .groupBy($"l_suppkey").agg(r4(sum($"v")).as("total_revenue"))
        val mx = rev.agg(max($"total_revenue").as("__mx"))
        rev.crossJoin(broadcast(mx))
          .filter($"total_revenue" === $"__mx")
          .join(broadcast(Tables.supplier(s, dir)),
            $"l_suppkey" === $"s_suppkey")
          .select($"s_suppkey", $"s_name", $"total_revenue")
          .orderBy($"s_suppkey")
      },
      Some("""WITH rev AS (
             |  SELECT l_suppkey,
             |    round(sum(l_extendedprice * (1 - l_discount)) + 1e-9, 4)
             |      AS total_revenue
             |  FROM lineitem
             |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |    AND l_shipdate <  TIMESTAMP '1996-04-01'
             |  GROUP BY 1)
             |SELECT s.s_suppkey, s.s_name, r.total_revenue
             |FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
             |WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
             |ORDER BY s.s_suppkey""".stripMargin)),

    // TPC-H Q16 shape: count-DISTINCT suppliers per part attribute
    // group, with a NOT IN supplier exclusion (negative-balance
    // suppliers as the "complaints" stand-in). The part↔supplier
    // relation derives from lineitem (no partsupp table in the driver
    // data): distinct pairs first (map-side pre-aggregation), then the
    // anti-join against the (tiny, broadcast) excluded suppliers, then
    // one count-distinct aggregate. All-integer: engine-exact.
    Q("q16_partcount",
      (s, dir) => {
        import s.implicits._
        val pairs = Tables.lineitem(s, dir)
          .select($"l_partkey", $"l_suppkey").distinct()
        val excluded = Tables.supplier(s, dir)
          .filter($"s_acctbal" < 0.0).select($"s_suppkey")
        val parts = Tables.part(s, dir)
          .filter($"p_brand" =!= "Brand#15" &&
            $"p_size".isin(1, 5, 10, 15, 20, 25, 30, 35))
          .select($"p_partkey", $"p_brand", $"p_type", $"p_size")
        pairs
          .join(broadcast(excluded), $"l_suppkey" === $"s_suppkey", "left_anti")
          .join(broadcast(parts), $"l_partkey" === $"p_partkey")
          .groupBy($"p_brand", $"p_type", $"p_size")
          .agg(countDistinct($"l_suppkey").as("supplier_cnt"))
          .orderBy(desc("supplier_cnt"), $"p_brand", $"p_type", $"p_size")
      },
      Some("""SELECT p_brand, p_type, p_size,
             |  count(DISTINCT l_suppkey) AS supplier_cnt
             |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
             |JOIN part ON p_partkey = l_partkey
             |WHERE p_brand <> 'Brand#15'
             |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
             |                        WHERE s_acctbal < 0.0)
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)),

    // Arbitrary GROUPING SETS (beyond q8's rollup / q9's cube): the
    // Dataset.groupingSets API plans ONE scan + Expand (each row fans out
    // to its grouping combinations before the partial aggregate) — no
    // self-union of per-level aggregates, one shuffle total.
    Q("q19_gsets",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .select($"l_returnflag", $"l_linestatus", $"l_quantity")
          .groupingSets(
            Seq(Seq($"l_returnflag", $"l_linestatus"), Seq($"l_returnflag"), Seq()),
            $"l_returnflag", $"l_linestatus")
          .agg(r4(sum($"l_quantity")).as("sum_qty"), count(lit(1)).as("cnt"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  round(sum(l_quantity) + 1e-9, 4) AS sum_qty, count(*) AS cnt
             |FROM lineitem
             |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
             |                        (l_returnflag), ())""".stripMargin)),

    // Per-group top-k through the bounded-heap aggregate (TopKAgg): top
    // 3 customers by account balance per market segment. The oracle is
    // the row_number window the operator replaces — proving the heap
    // form is result-identical while shuffling O(keys × k) instead of
    // O(rows).
    Q("o6_topk_per_group",
      (s, dir) => {
        import s.implicits._
        val cust = Tables.customer(s, dir)
          .select($"c_mktsegment", $"c_custkey", $"c_name", r4($"c_acctbal").as("acctbal"))
        graft.operators.TopK.perKey(cust, Seq("c_mktsegment"),
            Seq(negate($"acctbal"), $"c_custkey"), 3)
          .select($"c_mktsegment", $"c_custkey", $"c_name", $"acctbal", $"rank")
      },
      Some("""WITH r AS (
             |  SELECT c_mktsegment, c_custkey, c_name,
             |    round(c_acctbal + 1e-9, 4) AS acctbal,
             |    row_number() OVER (PARTITION BY c_mktsegment
             |      ORDER BY round(c_acctbal + 1e-9, 4) DESC, c_custkey) AS rank
             |  FROM customer)
             |SELECT c_mktsegment, c_custkey, c_name, acctbal, rank
             |FROM r WHERE rank <= 3""".stripMargin)),

    // Ranking-function family (engine completeness — SURVEY §2.5 notes
    // the reference uses none): rank/dense_rank/percent_rank/ntile over
    // a deterministic total order.
    Q("o5_rank_funcs",
      (s, dir) => {
        import s.implicits._
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"o_orderpriority")
          .orderBy($"o_totalprice".desc, $"o_orderkey")
        Tables.orders(s, dir)
          .withColumn("rnk", rank().over(w))
          .withColumn("drnk", dense_rank().over(w))
          .withColumn("prank", r6(percent_rank().over(w)))
          .withColumn("quartile", ntile(4).over(w))
          .filter($"rnk" <= 3)
          .select($"o_orderpriority", $"o_orderkey", r4($"o_totalprice").as("price"),
            $"rnk", $"drnk", $"prank", $"quartile")
      },
      Some("""WITH r AS (
             |  SELECT o_orderpriority, o_orderkey, o_totalprice,
             |    rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
             |    round(percent_rank() OVER w + 1e-9, 6) AS prank,
             |    ntile(4) OVER w AS quartile
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_orderpriority
             |               ORDER BY o_totalprice DESC, o_orderkey))
             |SELECT o_orderpriority, o_orderkey,
             |  round(o_totalprice + 1e-9, 4) AS price, rnk, drnk, prank, quartile
             |FROM r WHERE rnk <= 3""".stripMargin)),

    // Rollup (grouping-sets family — engine completeness; absent in the
    // reference per SURVEY §2.4 note).
    Q("q8_rollup",
      (s, dir) => {
        import s.implicits._
        Tables.lineitem(s, dir)
          .rollup($"l_returnflag", $"l_linestatus")
          .agg(count(lit(1)).as("cnt"), r4(sum($"l_quantity")).as("sum_qty"))
      },
      Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt,
             |  round(sum(l_quantity) + 1e-9, 4) AS sum_qty
             |FROM lineitem
             |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin)),

    // G8: global descriptive stats (market_analysis.py:620-624 shape).
    Q("g8_stats",
      (s, dir) => {
        import s.implicits._
        Tables.events(s, dir).agg(
          count(lit(1)).as("n"),
          r4(avg($"value")).as("avg_value"),
          r4(stddev_samp($"value")).as("std_value"),
          r4(min($"value")).as("min_value"),
          r4(max($"value")).as("max_value"),
          countDistinct($"user_id").as("n_users"))
      },
      Some("""SELECT count(*) AS n,
             |  round(avg(value) + 1e-9, 4) AS avg_value,
             |  round(stddev_samp(value) + 1e-9, 4) AS std_value,
             |  round(min(value) + 1e-9, 4) AS min_value,
             |  round(max(value) + 1e-9, 4) AS max_value,
             |  count(DISTINCT user_id) AS n_users
             |FROM events""".stripMargin)),

    // Semi + anti joins (SURVEY §2.3 "absent in the reference" —
    // engine-completeness ops): customers with ≥1 urgent order vs none.
    Q("j_semi_anti",
      (s, dir) => {
        import s.implicits._
        val cust = Tables.customer(s, dir).select($"c_custkey", $"c_mktsegment")
        val urgent = Tables.orders(s, dir)
          .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
        val withUrgent = cust.join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
          .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_with_urgent"))
        val noUrgent = cust.join(urgent, $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_without_urgent"))
        withUrgent.join(noUrgent, Seq("c_mktsegment"), "full_outer")
          .na.fill(0, Seq("n_with_urgent", "n_without_urgent"))
      },
      Some("""WITH w AS (
             |  SELECT c_mktsegment, count(*) AS n_with_urgent FROM customer
             |  WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |                AND o_orderpriority = '1-URGENT')
             |  GROUP BY c_mktsegment),
             |wo AS (
             |  SELECT c_mktsegment, count(*) AS n_without_urgent FROM customer
             |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |                    AND o_orderpriority = '1-URGENT')
             |  GROUP BY c_mktsegment)
             |SELECT coalesce(w.c_mktsegment, wo.c_mktsegment) AS c_mktsegment,
             |  coalesce(n_with_urgent, 0) AS n_with_urgent,
             |  coalesce(n_without_urgent, 0) AS n_without_urgent
             |FROM w FULL OUTER JOIN wo ON w.c_mktsegment = wo.c_mktsegment""".stripMargin)),

    // Market-basket association rules (beyond-reference): co-purchase
    // pairs with support ≥ 3 co-orders, scored by lift
    // P(ab)/(P(a)P(b)) and confidence P(b|a) — the item-to-item
    // recommendation primitive. Scale shape: the pair generator
    // self-joins WITHIN the order key only, so pair instances are
    // bounded by Σ per-order fanout² (~6 pairs per ~4-line order, i.e.
    // linear in orders, never all item pairs); the item-support side
    // is the part DIMENSION (≪ facts) and broadcasts; the order count
    // rides the 1-row scalar idiom. All counts stay integers until the
    // final lift/confidence divisions (products < 2^53, so the doubles
    // are exact on both engines before r6).
    Q("r1_item_pairs",
      (s, dir) => {
        import s.implicits._
        // the deduped basket frame feeds FOUR consumers (order count,
        // item support, both self-join sides) — persist so the
        // distinct's shuffle is paid once, not per reference (at
        // deployment scale this is the materialized basket table)
        val li = graft.io.PersistRegistry.trackPersist(
          Tables.lineitem(s, dir)
            .select($"l_orderkey", $"l_partkey").distinct())
        val nOrders = li.agg(
          countDistinct($"l_orderkey").as("n_orders"))
        val supp = li.groupBy($"l_partkey").agg(count(lit(1)).as("n_item"))
        li.as("a").join(li.as("b"),
            $"a.l_orderkey" === $"b.l_orderkey" &&
              $"a.l_partkey" < $"b.l_partkey")
          .groupBy($"a.l_partkey".as("pa"), $"b.l_partkey".as("pb"))
          .agg(count(lit(1)).as("n_ab"))
          .filter($"n_ab" >= 3)
          .join(broadcast(supp.select($"l_partkey".as("pa"),
            $"n_item".as("n_a"))), "pa")
          .join(broadcast(supp.select($"l_partkey".as("pb"),
            $"n_item".as("n_b"))), "pb")
          .crossJoin(broadcast(nOrders))
          .select($"pa", $"pb", $"n_ab", $"n_a", $"n_b",
            r6(($"n_ab" * $"n_orders").cast("double") / ($"n_a" * $"n_b"))
              .as("lift"),
            r6($"n_ab".cast("double") / $"n_a").as("conf_ab"))
          .orderBy(desc("lift"), $"pa", $"pb")
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
             |no AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM li),
             |s AS (SELECT l_partkey, count(*) AS n_item FROM li GROUP BY 1),
             |p AS (
             |  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n_ab
             |  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
             |    AND a.l_partkey < b.l_partkey
             |  GROUP BY 1, 2 HAVING count(*) >= 3)
             |SELECT pa, pb, n_ab, sa.n_item AS n_a, sb.n_item AS n_b,
             |  round(CAST(n_ab * n_orders AS DOUBLE)
             |    / (sa.n_item * sb.n_item) + 1e-9, 6) AS lift,
             |  round(CAST(n_ab AS DOUBLE) / sa.n_item + 1e-9, 6) AS conf_ab
             |FROM p JOIN s sa ON sa.l_partkey = pa
             |JOIN s sb ON sb.l_partkey = pb, no
             |ORDER BY lift DESC, pa, pb""".stripMargin)))
}
