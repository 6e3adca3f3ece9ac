package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY §2B): ranking, analytic (lag/lead),
  * running/frame aggregates, ntile, per-group top-k.
  *
  * Scale notes: a window is one shuffle on partitionBy keys + an in-
  * partition sort. Partition keys here (nationkey, custkey, brand) have
  * high-enough cardinality to spread at 100 TB; none of the frames
  * require whole-partition buffering beyond Spark's spillable window
  * buffer. Every orderBy includes a unique tiebreak column so results
  * are total-ordered and hash-stable across engines.
  */
object Windows {

  val qs: Seq[Q] = Seq(
    Q("q17_window_rank",
      """SELECT c_custkey, c_nationkey,
        |  CAST(row_number() OVER w AS INTEGER) AS rn,
        |  CAST(rank() OVER w AS INTEGER) AS rnk,
        |  CAST(dense_rank() OVER w AS INTEGER) AS drnk,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_nationkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"))
        .orderBy(col("c_nationkey"), col("rn"))
    },

    // Distribution window functions: percent_rank/cume_dist emit
    // floor-scaled basis points (the ratios are small-integer divisions
    // — bit-identical across engines), nth_value over the running frame
    // anchors each row to its partition's 3rd member.
    Q("q91_window_dist",
      """SELECT c_custkey, c_nationkey,
        |  CAST(floor(10000 * percent_rank() OVER w) AS BIGINT) AS pr_bp,
        |  CAST(floor(10000 * cume_dist() OVER w) AS BIGINT) AS cd_bp,
        |  nth_value(c_custkey, 3) OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal DESC, c_custkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_key
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_nationkey, c_custkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.customer(s, d)
        .select(col("c_custkey"), col("c_nationkey"),
          floor(lit(10000) * percent_rank().over(w)).as("pr_bp"),
          floor(lit(10000) * cume_dist().over(w)).as("cd_bp"),
          nth_value(col("c_custkey"), 3).over(wf).as("third_key"))
        .orderBy(col("c_nationkey"), col("c_custkey"))
    },

    // Running (cumulative) sum + lag/lead. The running sum is evaluated
    // in frame order on both engines, but still rounded defensively.
    Q("q18_window_running",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
        |  lag(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_order,
        |  lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_order
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          round(sum(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2).as("running_total"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // Sliding ROWS frame (moving average) + first/last value in frame.
    // The moving average is computed over exact integer cents: a 2-row
    // frame of cent values averages to an exact half-cent, which lands
    // exactly on the round-half boundary where Spark (shortest-repr
    // HALF_UP) and DuckDB (binary half-away) disagree — floor(avg(cents))
    // is boundary-free on both engines.
    Q("q19_window_frames",
      """SELECT o_custkey, o_orderkey,
        |  CAST(floor(avg(CAST(round(o_totalprice * 100) AS BIGINT))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) AS BIGINT) AS mov_avg3_cents,
        |  first_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_order,
        |  last_value(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val ord = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val whole = ord.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
        .select(col("o_custkey"), col("o_orderkey"),
          floor(avg(col("cents")).over(ord.rowsBetween(-2, Window.currentRow)))
            .as("mov_avg3_cents"),
          first(col("o_orderkey")).over(whole).as("first_order"),
          last(col("o_orderkey")).over(whole).as("last_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // RANGE frame over a numeric ordering column: count of orders within
    // 10000 of the current price, per status.
    Q("q20_window_range",
      """SELECT o_orderstatus, o_orderkey,
        |  count(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
        |    RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_in_range
        |FROM orders
        |WHERE o_custkey < 100
        |ORDER BY o_orderstatus, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_totalprice"))
        .rangeBetween(-10000, Window.currentRow)
      Tables.orders(s, d).filter(col("o_custkey") < 100)
        .select(col("o_orderstatus"), col("o_orderkey"),
          count(lit(1)).over(w).as("n_in_range"))
        .orderBy(col("o_orderstatus"), col("o_orderkey"))
    },

    // Per-group top-k: classic row_number <= k pattern. At scale this is
    // one shuffle on the group key; no global sort.
    Q("q20b_topk_per_group",
      """SELECT p_brand, CAST(rn AS INTEGER) AS rn, p_partkey, p_retailprice
        |FROM (SELECT p_brand, p_partkey, p_retailprice,
        |        row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rn
        |      FROM part) t
        |WHERE rn <= 3
        |ORDER BY p_brand, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(s, d)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
        .select(col("p_brand"), col("rn"), col("p_partkey"), col("p_retailprice"))
        .orderBy(col("p_brand"), col("rn"))
    }
  )
}
