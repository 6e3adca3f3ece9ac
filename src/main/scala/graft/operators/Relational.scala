package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational surface (SURVEY §2B "core relational"): scans,
  * filter/project, all join shapes, aggregation incl. rollup/cube/
  * grouping sets, sort/limit/top-k, set ops.
  *
  * Scale notes (100 TB): every query here is a declarative plan —
  * Catalyst pushes filters/projections into the parquet scan, AQE picks
  * shuffle partition counts and converts to broadcast joins at runtime.
  * Dimension tables (region/nation) are explicitly broadcast; fact-fact
  * joins (lineitem⋈orders) shuffle on the join key, which is the correct
  * plan at any scale.
  */
object Relational {

  /** TPC-H Q1 shape: the flagship aggregation (SURVEY §7 minimum slice).
    * sum(l_quantity) is exact (integer-valued doubles); money sums are
    * rounded to cents so DuckDB's summation order can't flip the hash.
    */
  def pricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2001-06-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val qs: Seq[Q] = Seq(
    Q("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-06-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)(pricingSummary),

    // Filter + projection: predicate and column set both reach the scan
    // (PushedFilters / ReadSchema in .explain).
    Q("q02_filter_scan",
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '2000-01-01'
        |  AND l_shipdate < TIMESTAMP '2000-07-01'
        |  AND l_quantity >= 48
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("2000-01-01").cast("timestamp")
          && col("l_shipdate") < lit("2000-07-01").cast("timestamp")
          && col("l_quantity") >= 48)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // TPC-H Q3 shape: 3-way join, agg, top-k. customer filter prunes the
    // build side; orders⋈lineitem shuffles on orderkey (scales linearly).
    Q("q03_top_revenue",
      """SELECT o.o_orderkey, o.o_orderdate,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l.l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY o.o_orderkey, o.o_orderdate
        |ORDER BY revenue DESC, o_orderkey
        |LIMIT 10""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },

    // Left-semi join (EXISTS): order priority counts for orders having a
    // heavy lineitem.
    Q("q04_semi_join",
      """SELECT o.o_orderpriority, count(*) AS n
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
        |GROUP BY o.o_orderpriority
        |ORDER BY o.o_orderpriority""".stripMargin) { (s, d) =>
      val heavy = Tables.lineitem(s, d).filter(col("l_quantity") >= 49)
      Tables.orders(s, d)
        .join(heavy, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    },

    // TPC-H Q5 shape: 6-way star join; region/nation broadcast (tiny at
    // any SF), supplier-nation co-membership condition.
    Q("q05_region_revenue",
      """SELECT n.n_name,
        |  round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY n.n_name
        |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      val cus = Tables.customer(s, d)
      val ord = Tables.orders(s, d).filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      val li = Tables.lineitem(s, d)
      val sup = Tables.supplier(s, d)
      val nat = Tables.nation(s, d)
      val reg = Tables.region(s, d)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cus, col("o_custkey") === col("c_custkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // TPC-H Q6 shape: pure scan-side filter + single global agg — the
    // whole query is one parquet scan stage, no shuffle beyond the final
    // partial/final agg.
    Q("q06_forecast_revenue",
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
        |  count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01'
        |  AND l_shipdate < TIMESTAMP '2000-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp")
          && col("l_shipdate") < lit("2000-01-01").cast("timestamp")
          && col("l_discount").between(0.05, 0.07)
          && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          count(lit(1)).as("n"))
    },

    // Left outer join + per-key agg: every customer, with order stats.
    Q("q07_left_join",
      """SELECT c.c_custkey,
        |  count(o.o_orderkey) AS n_orders,
        |  round(coalesce(sum(o.o_totalprice), 0), 2) AS total_spent
        |FROM customer c
        |LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey
        |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(coalesce(sum(col("o_totalprice")), lit(0)), 2).as("total_spent"))
        .orderBy(col("c_custkey"))
    },

    // Full outer join of two aggregates keyed on nationkey.
    Q("q08_full_outer_join",
      """WITH cn AS (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1),
        |     sn AS (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT coalesce(cn.k, sn.k) AS nationkey, cn.n_cust, sn.n_supp
        |FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
        |ORDER BY nationkey""".stripMargin) { (s, d) =>
      val cn = Tables.customer(s, d).groupBy(col("c_nationkey").as("ck"))
        .agg(count(lit(1)).as("n_cust"))
      val sn = Tables.supplier(s, d).groupBy(col("s_nationkey").as("sk"))
        .agg(count(lit(1)).as("n_supp"))
      cn.join(sn, col("ck") === col("sk"), "full_outer")
        .select(coalesce(col("ck"), col("sk")).as("nationkey"), col("n_cust"), col("n_supp"))
        .orderBy(col("nationkey"))
    },

    // Left-anti join (NOT EXISTS): customers that never ordered.
    Q("q09_anti_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // Right outer join: all nations (right side preserved) with supplier
    // account totals; nations with no suppliers surface as NULL.
    Q("q10_right_join",
      """SELECT n.n_nationkey, n.n_name,
        |  count(s.s_suppkey) AS n_supp,
        |  round(coalesce(sum(s.s_acctbal), 0), 2) AS total_bal
        |FROM supplier s RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_nationkey, n.n_name
        |ORDER BY n.n_nationkey""".stripMargin) { (s, d) =>
      Tables.supplier(s, d)
        .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"), "right")
        .groupBy(col("n_nationkey"), col("n_name"))
        .agg(count(col("s_suppkey")).as("n_supp"),
          round(coalesce(sum(col("s_acctbal")), lit(0)), 2).as("total_bal"))
        .orderBy(col("n_nationkey"))
    },

    // Cross join (explicitly requested cartesian — only ever on tiny
    // inputs; planner uses broadcast nested loop).
    Q("q11_cross_join",
      """SELECT a.r_name AS r1, b.r_name AS r2
        |FROM region a CROSS JOIN region b
        |ORDER BY r1, r2""".stripMargin) { (s, d) =>
      val a = Tables.region(s, d).select(col("r_name").as("r1"))
      val b = Tables.region(s, d).select(col("r_name").as("r2"))
      a.crossJoin(b).orderBy("r1", "r2")
    },

    // Aggregate function coverage: min/max exact, stddev rounded.
    Q("q12_agg_stats",
      """SELECT l_returnflag,
        |  min(l_extendedprice) AS min_price,
        |  max(l_extendedprice) AS max_price,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(stddev_samp(l_extendedprice), 2) AS sd_price,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          round(avg(col("l_extendedprice")), 2).as("avg_price"),
          round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    },

    // count(distinct): exact distinct via shuffle-on-key (scales; the
    // approx HLL variant is q54, rows-only).
    Q("q13_count_distinct",
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS nd_part,
        |  count(DISTINCT l_suppkey) AS nd_supp
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"))
        .orderBy(col("l_returnflag"))
    },

    // ROLLUP: hierarchical subtotals (null grouping rows ordered NULLS
    // FIRST to match Spark's asc default).
    Q("q14_rollup",
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    Q("q15_cube",
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).cube(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))
    },

    Q("q16_grouping_sets",
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).createOrReplaceTempView("q16_lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
          |FROM q16_lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
    },

    // Sort + limit: planned as TakeOrderedAndProject (no full sort
    // materialization — per-partition top-k then merge on the driver).
    Q("q21_sort_limit",
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    },

    // UNION (distinct) of two predicates.
    Q("q22_union",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |UNION
        |SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val a = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val b = Tables.customer(s, d).filter(col("c_acctbal") > 9000).select("c_custkey")
      a.unionByName(b).distinct().orderBy("c_custkey")
    },

    Q("q23_intersect",
      """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val a = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val b = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
      a.intersect(b).orderBy("c_custkey")
    },

    Q("q24_except",
      """SELECT c_custkey FROM customer
        |EXCEPT
        |SELECT o_custkey FROM orders
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      val a = Tables.customer(s, d).select("c_custkey")
      val b = Tables.orders(s, d).select(col("o_custkey").as("c_custkey"))
      a.except(b).orderBy("c_custkey")
    },

    Q("q25_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).select("l_returnflag", "l_linestatus")
        .dropDuplicates()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // approx_count_distinct (HLL++): the sketch differs from DuckDB's,
    // so the oracled output is the documented invariant (SURVEY §5.1):
    // the exact distinct count plus a flag asserting the HLL estimate
    // landed within its configured error envelope (rsd=0.02 → 5% is
    // 2.5σ). Spark computes both sides for real; DuckDB recomputes the
    // exact count and the invariant's expected value (TRUE).
    Q("q54_approx_distinct",
      """SELECT event_type,
        |  count(DISTINCT user_id) AS exact_users,
        |  TRUE AS hll_ok
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d).groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("approx_users") - col("exact_users"))
            <= col("exact_users") * 0.05).as("hll_ok"))
        .orderBy(col("event_type"))
    }
  )
}
