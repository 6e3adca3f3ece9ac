package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Iterative graph analytics on the order graph (customers ↔ suppliers
  * linked by lineitems; node ids namespaced 2k / 2k+1 so the two key
  * spaces never collide). Complements q70's connected components with a
  * weighted iterative computation.
  *
  * PageRank here is FIXED-POINT INTEGER arithmetic (ranks in 1e-9
  * units, damping 0.85 as ×85 div 100): integer division is exact and
  * identical in every engine, so three unrolled iterations hash-match
  * the DuckDB oracle bit-for-bit — no float summation-order drift. The
  * same trick is how you make a distributed PageRank reproducible
  * across cluster sizes and partitionings at 100 TB: every per-edge
  * contribution is a deterministic integer, so partial-sum order can't
  * change the result.
  *
  * Scale shape: edges are built once and localCheckpoint'ed (lineage
  * would otherwise re-run the lineitem join every iteration — see
  * NOTES.md); each iteration is one shuffle on dst with map-side
  * partial sums; ranks re-partition on the same id key each round so
  * AQE reuses the layout. Undirected edges mean no dangling-mass
  * special case.
  */
object GraphOps {

  private val Scale = 1000000000L // rank unit = 1e-9

  val qs: Seq[Q] = Seq(
    Q("q98_pagerank",
      """WITH e0 AS (SELECT DISTINCT o.o_custkey * 2 AS src, l.l_suppkey * 2 + 1 AS dst
        |            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
        |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        |nodes AS (SELECT DISTINCT src AS id FROM e),
        |st AS (SELECT 1000000000 // count(*) AS r_init,
        |              15000000000 // (100 * count(*)) AS base FROM nodes),
        |r0 AS (SELECT id, r_init AS rank FROM nodes CROSS JOIN st),
        |r1 AS (SELECT nodes.id, st.base + coalesce(c.s, 0) AS rank
        |       FROM nodes CROSS JOIN st LEFT JOIN (
        |         SELECT e.dst AS id, sum((r.rank * 85) // (100 * d.deg)) AS s
        |         FROM e JOIN r0 r ON e.src = r.id JOIN deg d ON d.src = e.src
        |         GROUP BY e.dst) c ON nodes.id = c.id),
        |r2 AS (SELECT nodes.id, st.base + coalesce(c.s, 0) AS rank
        |       FROM nodes CROSS JOIN st LEFT JOIN (
        |         SELECT e.dst AS id, sum((r.rank * 85) // (100 * d.deg)) AS s
        |         FROM e JOIN r1 r ON e.src = r.id JOIN deg d ON d.src = e.src
        |         GROUP BY e.dst) c ON nodes.id = c.id),
        |r3 AS (SELECT nodes.id, st.base + coalesce(c.s, 0) AS rank
        |       FROM nodes CROSS JOIN st LEFT JOIN (
        |         SELECT e.dst AS id, sum((r.rank * 85) // (100 * d.deg)) AS s
        |         FROM e JOIN r2 r ON e.src = r.id JOIN deg d ON d.src = e.src
        |         GROUP BY e.dst) c ON nodes.id = c.id)
        |SELECT id, CAST(rank AS BIGINT) AS rank FROM r3
        |ORDER BY rank DESC, id LIMIT 20""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
      val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      val e0 = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
        .distinct()
      val eSym = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      // out-degree rides the edge table: built once, checkpointed once —
      // no per-iteration deg join. (count(*) over a window keyed like
      // the groupBy would be a second shuffle; the self-join agg shape
      // lets both sides share the src partitioning.)
      val deg = eSym.groupBy("src").agg(count(lit(1)).as("deg"))
      val edges = eSym.join(deg, "src").localCheckpoint()
      val nodes = edges.select(col("src").as("id")).distinct().localCheckpoint()
      val n = nodes.count()
      val base = 15L * Scale / (100L * n)
      // ranks (one row per node) is orders of magnitude smaller than
      // edges — broadcast it each round and leave the edge table in
      // place; the only shuffle per iteration is the map-side-combined
      // sum on dst. Lineage stays linear (each rank df is consumed by
      // exactly one successor), so no per-iteration checkpoint is
      // needed; on a real cluster with huge node counts the broadcast
      // becomes a shuffle join on the reused src partitioning.
      var ranks = nodes.withColumn("rank", lit(Scale / n))
      for (_ <- 1 to 3) {
        val contrib = edges.join(broadcast(ranks), col("src") === col("id"))
          .select(col("dst").as("id"),
            expr("(rank * 85) div (100 * deg)").as("c"))
          .groupBy("id").agg(sum(col("c")).as("s"))
        ranks = nodes.join(contrib, Seq("id"), "left")
          .select(col("id"), (lit(base) + coalesce(col("s"), lit(0L))).as("rank"))
      }
      ranks.orderBy(col("rank").desc, col("id")).limit(20)
        .select(col("id"), col("rank"))
    }
  )
}
